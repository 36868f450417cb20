"""Mergeable sketches: HyperLogLog for approximate COUNT(DISTINCT) and a
bottom-k (KMV) sample sketch for approximate quantiles.

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


def hll_idx_rho(values: np.ndarray, p: int = 12) -> tuple[np.ndarray, np.ndarray]:
    """Per-value HLL register coordinates: (register index int64,
    rho uint8).  Factored out so per-KEY sketches (the aggregate lake's
    distinct-count state) can scatter into a (keys × 2^p) matrix with the
    identical hash/rho math the flat sketch — and its SQL oracle — use."""
    h = _splitmix64(values.astype(np.int64).view(np.uint64))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    probe = (h << np.uint64(p)) | np.uint64(1 << (p - 1))  # sentinel bit
    # rho = leading zeros + 1, capped by the sentinel; vectorized CLZ via
    # halving probes (6 steps for 64-bit)
    shift = np.uint64(32)
    acc = np.zeros(len(h), dtype=np.uint64)
    while shift > 0:
        mask = probe < (np.uint64(1) << (np.uint64(64) - shift))
        acc = np.where(mask, acc + shift, acc)
        probe = np.where(mask, probe << shift, probe)
        shift >>= np.uint64(1)
    return idx, (acc + 1).astype(np.uint8)


def hll_partial(values: np.ndarray, p: int = 12) -> np.ndarray:
    """One batch's HLL register array (uint8[2^p]) for int64 values."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if not len(values):
        return regs
    idx, rho = hll_idx_rho(values, p)
    np.maximum.at(regs, idx, rho)
    return regs


def bottomk_partial(
    ids: np.ndarray, values: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """One batch's bottom-k sample sketch: the ≤k (hash, value) pairs with
    the smallest ``splitmix64(id)``.

    Keeping the k smallest hashes of a FIXED hash function is the KMV /
    bottom-k sketch (Bar-Yossef et al., RANDOM 2002; Cohen & Kaplan,
    PODC 2007): the global bottom-k set is a uniform size-k sample
    without replacement of the distinct ids, and merging two sketches is
    just "concat, keep k smallest" — associative and commutative, so any
    batch/block split of the input yields the IDENTICAL final sample.
    Deterministic (no RNG state), which is what lets an approximate
    quantile carry an exact SQL oracle: DuckDB replays the same hash and
    takes the same ORDER BY h LIMIT k."""
    if not len(ids):
        return np.empty(0, np.uint64), values[:0]
    h = _splitmix64(ids.astype(np.int64).view(np.uint64))
    if len(h) > k:
        sel = np.argpartition(h, k)[:k]
        return h[sel], values[sel]
    return h, values


def bottomk_merge(
    partials: list[tuple[np.ndarray, np.ndarray]], k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Merge bottom-k partials: concat, keep the k smallest hashes,
    returned hash-sorted.  splitmix64 is a bijection on uint64 and ids
    are unique, so there are no hash ties and the result is unique."""
    if not partials:
        return np.empty(0, np.uint64), np.empty(0, np.float64)
    h = np.concatenate([p[0] for p in partials])
    v = np.concatenate([p[1] for p in partials])
    if len(h) > k:
        sel = np.argpartition(h, k)[:k]
        h, v = h[sel], v[sel]
    order = np.argsort(h)
    return h[order], v[order]


def bottomk_quantiles(
    sample_values: np.ndarray, qs: list[tuple[int, int]]
) -> np.ndarray:
    """Quantile estimates from a bottom-k sample by an INTEGER rank rule
    shared verbatim with the SQL oracle: for q = qn/qd over n sample
    rows, take the value at 1-based rank ``max(ceil(qn*n/qd), 1)`` of the
    value-sorted sample — all-integer ceil ``(qn*n + qd - 1) // qd``, so
    no float q*n can straddle an ulp differently on the two engines."""
    v = np.sort(sample_values, kind="stable")
    n = len(v)
    out = np.empty(len(qs), dtype=v.dtype if n else np.float64)
    for i, (qn, qd) in enumerate(qs):
        rk = max((qn * n + qd - 1) // qd, 1)
        out[i] = v[rk - 1] if n else np.nan
    return out


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
