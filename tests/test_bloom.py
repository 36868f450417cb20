"""Int64Bloom: no false negatives ever, FP rate near design, vectorized."""

import numpy as np

from sql_etl_pipeline_ray.stages.bloom import Int64Bloom


def test_no_false_negatives():
    rng = np.random.default_rng(1)
    keys = rng.integers(-(2**62), 2**62, 200_000).astype(np.int64)
    b = Int64Bloom(keys)
    assert b.contains(keys).all()


def test_false_positive_rate_near_design():
    rng = np.random.default_rng(2)
    keys = np.unique(rng.integers(0, 2**60, 100_000).astype(np.int64))
    b = Int64Bloom(keys, bits_per_key=10)
    probes = rng.integers(2**61, 2**62, 100_000).astype(np.int64)  # disjoint
    fp = b.contains(probes).mean()
    assert fp < 0.03, fp  # design ~1% at 10 bits/key


def test_empty_and_single():
    b = Int64Bloom(np.zeros(0, np.int64))
    assert not b.contains(np.array([1, 2, 3], np.int64)).any()
    assert len(b.contains(np.zeros(0, np.int64))) == 0
    b1 = Int64Bloom(np.array([7], np.int64))
    assert b1.contains(np.array([7], np.int64)).all()
