"""Cardinality sketches: HyperLogLog for approximate COUNT(DISTINCT).

The reference computes exact distincts in SQL (COUNT(DISTINCT ...)); the
engine's exact path is the two-level groupby (``monthly_sales_trends``).
At 100 TB an exact distinct of a high-cardinality key is a full shuffle of
every distinct value — the published answer is a mergeable sketch
(Flajolet et al., HyperLogLog, AofA 2007): per-batch register arrays whose
elementwise MAX merges associatively, so the shuffle carries
``2^p`` one-byte registers per group per batch instead of the values.

Everything is numpy-vectorized: register index = top ``p`` hash bits,
rho = leading-zero count of the rest, per-batch scatter-max via
``np.maximum.at``.  Standard bias correction for the small-range regime
(linear counting) keeps the error near the theoretical 1.04/sqrt(2^p).
"""

from __future__ import annotations

import numpy as np

from .bloom import _splitmix64


def hll_partial(values: np.ndarray, p: int = 12) -> np.ndarray:
    """One batch's HLL register array (uint8[2^p]) for int64 values."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if not len(values):
        return regs
    h = _splitmix64(values.astype(np.int64).view(np.uint64))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64(1 << (p - 1))  # sentinel bit
    # rho = leading zeros of `rest` + 1, capped by the sentinel
    rho = np.zeros(len(h), dtype=np.uint8)
    probe = rest
    # vectorized CLZ via halving probes (6 steps for 64-bit)
    shift = np.uint64(32)
    acc = np.zeros(len(h), dtype=np.uint64)
    while shift > 0:
        mask = probe < (np.uint64(1) << (np.uint64(64) - shift))
        acc = np.where(mask, acc + shift, acc)
        probe = np.where(mask, probe << shift, probe)
        shift >>= np.uint64(1)
    rho = (acc + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_merge(reg_arrays) -> np.ndarray:
    """Merge partial register arrays (associative elementwise max)."""
    out = None
    for r in reg_arrays:
        r = np.asarray(r, dtype=np.uint8)
        out = r.copy() if out is None else np.maximum(out, r)
    return out if out is not None else np.zeros(0, np.uint8)


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected HLL cardinality estimate.

    Computed to be ORDER-INDEPENDENT and SQL-replayable: the harmonic
    denominator ``sum 2^-M`` is accumulated as the exact integer
    ``S = sum 2^(64-M)`` (so it never depends on float summation order the
    way ``np.sum(2.0**-regs)`` does), then the estimate is
    ``alpha * (2^(64+2p) / S)`` with one IEEE rounding per step — DuckDB
    reproduces every operation bitwise (HUGEINT sum, one CAST, one
    division, one multiply), which is what lets ``monthly_uniques_hll``
    carry an exact value oracle despite being an approximate sketch.
    The linear-counting branch uses ``math.log`` (libm), verified
    bit-identical to DuckDB ``ln`` over all 2^p possible inputs in
    ``tests/test_sketch.py``."""
    import math

    m = len(regs)
    if m == 0:
        return 0.0
    alpha = 0.7213 / (1 + 1.079 / m)
    counts = np.bincount(regs.astype(np.int64), minlength=65)
    S = sum(int(c) << (64 - r) for r, c in enumerate(counts.tolist()) if c)
    est = alpha * (float((1 << 64) * m * m) / float(S))
    zeros = int(counts[0])
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)  # linear counting, small range
    return float(est)
