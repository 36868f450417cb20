"""Vectorized Bloom filter over int64 keys.

The membership structure for broadcast existence tests whose probe stream
is MISS-dominated: a definite-miss answer costs k byte loads into a
compact bit array (10 bits/key at ~1% false positives), and the rare
maybe-hits are verified exactly against the sorted key array — so the
combined test is exact (Bloom filters have no false negatives) while the
broadcast payload shrinks ~6x vs shipping raw int64 keys.

Used by the replay's phase-2 winner filter when the LSN span is too wide
for the dense bitmap (``pipelines/replay.py:make_winner_filter``): ~95% of
log rows are losers there, so almost every probe short-circuits in the
Bloom.  NOT used for the orphan/anti-join checks in analytics — those
probe streams are HIT-dominated (most lineitems have their order), where a
Bloom's maybe-set is nearly every row and saves nothing; the scale path
there is a shuffle join.

All operations are numpy-vectorized over key arrays; no per-key Python.
"""

from __future__ import annotations

import numpy as np

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer — a well-mixed 64-bit hash, vectorized."""
    x = (x + _GOLDEN).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x *= _MIX1
    x ^= x >> np.uint64(27)
    x *= _MIX2
    x ^= x >> np.uint64(31)
    return x


class Int64Bloom:
    """Bloom filter for int64 keys: ~``bits_per_key`` bits each, k probes
    by double hashing (h1 + i*h2 mod m).  No false negatives ever; false
    positive rate ≈ 0.6185^bits_per_key (~1% at 10 bits/key)."""

    def __init__(self, keys: np.ndarray, bits_per_key: int = 10):
        n = max(len(keys), 1)
        self.m = np.uint64(max(64, n * bits_per_key))
        self.k = max(1, int(round(bits_per_key * 0.6931)))
        self.bits = np.zeros((int(self.m) >> 3) + 1, dtype=np.uint8)
        if len(keys):
            h1, h2 = self._hash_pair(keys)
            for i in range(self.k):
                pos = (h1 + np.uint64(i) * h2) % self.m
                # bitwise_or.at: fancy-index |= drops duplicate byte writes
                np.bitwise_or.at(
                    self.bits, pos >> np.uint64(3),
                    (np.uint64(1) << (pos & np.uint64(7))).astype(np.uint8),
                )

    @staticmethod
    def _hash_pair(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        u = keys.astype(np.int64).view(np.uint64)
        h1 = _splitmix64(u)
        h2 = _splitmix64(u ^ _GOLDEN) | np.uint64(1)  # odd → full-period step
        return h1, h2

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized maybe-membership: False is DEFINITE absence."""
        if not len(keys):
            return np.zeros(0, dtype=bool)
        h1, h2 = self._hash_pair(keys)
        out = np.ones(len(keys), dtype=bool)
        for i in range(self.k):
            pos = (h1 + np.uint64(i) * h2) % self.m
            bit = (self.bits[pos >> np.uint64(3)] >> (pos & np.uint64(7))) & 1
            out &= bit.astype(bool)
            if not out.any():
                break
        return out
