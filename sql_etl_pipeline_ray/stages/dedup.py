"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The reference only drops exact duplicate rows (``src/data_validator.py:
329-335``); a training-data pipeline needs the near-dup family too.  All
stages follow the scale pattern: per-batch vectorized signature computation
(``map_batches``), then a groupby ONLY over small signature columns (never
over content), then candidate verification.

Scale notes:
- exact: shuffle volume = one 64-hex digest per row, not the content.
- MinHash/LSH: shuffle volume = bands × ~48 bytes per doc (the literal
  band-value tuple travels as the bucket key); candidate pairs are
  verified with exact Jaccard before reporting (no false positives).
- hashing is DuckDB-reproducible by construction (md5_number_lower +
  int64-exact universal hashes), so even the approximate operators carry
  exact SQL value oracles.
- connected components are NOT computed here — callers get verified pairs
  and can run iterative min-label propagation if they need clusters.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..scale import autoscale_pool, partitions_for_bytes
from .hashagg import hash_agg

_MINHASH_P = (1 << 31) - 1  # Mersenne prime modulus — see minhash_coefficients

# Verification tiers (minhash + ngram share them via _verify_candidates):
#   1. pairs ≤ VERIFY_BROADCAST_MAX      → driver kernel (tiny candidate
#      sets; no task overhead).
#   2. more pairs, but the candidate DOCS' texts fit a broadcast
#      (≤ VERIFY_TEXTS_MAX_BYTES)        → texts ray.put once, pairs
#      verified DISTRIBUTED (_broadcast_verify_pairs: plain tasks below
#      VERIFY_TASK_MAX_PAIRS, an actor pool above — the pool amortizes the
#      per-worker shingle-set build across many pair blocks, but costs
#      spin-up latency a small verify never earns back).
#      The pair count does NOT bound the broadcast — only the distinct
#      candidate ids do — so boilerplate-heavy corpora with millions of
#      candidate pairs over thousands of docs stay on this path.
#   3. candidate texts too big to broadcast → distributed hash-join
#      (_join_verify_pairs), the true corpus-scale fallback.
#
# Candidate pairs reach the tiers RAW (per-partition-deduped only): a pair
# surfacing via several bands/partitions duplicates a few percent of rows
# (measured 5.6% at sf0.1), so tiers 1-2 just verify the dups and collapse
# the rare survivors — cheaper than the full pair-shuffle _pair_dedupe
# previously spent before every verify.  Tier 3 still pre-dedupes: its
# cost is two hash joins proportional to the pair count.
VERIFY_BROADCAST_MAX = 200_000
VERIFY_TEXTS_MAX_BYTES = 256 << 20
VERIFY_TASK_MAX_PAIRS = 2_000_000


def _pair_dedupe(
    ds: ray.data.Dataset, a_col: str, b_col: str, num_partitions: int
) -> ray.data.Dataset:
    """Distributed drop_duplicates on a pair Dataset: one vectorized
    ``drop_duplicates`` per pair-hash PARTITION (never one Python call per
    duplicate pair, never a driver-side collect)."""

    def add_pk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_pp"] = (
            df[a_col].to_numpy(np.int64) * 1_000_003 + df[b_col].to_numpy(np.int64)
        ) % num_partitions
        return df

    def dd(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates([a_col, b_col]).drop(columns=["_pp"])

    return (
        ds.map_batches(add_pk, batch_format="pandas")
        .groupby("_pp")
        .map_groups(dd, batch_format="pandas")
    )


def _candidate_ids(cand: ray.data.Dataset, a_col: str, b_col: str) -> np.ndarray:
    """Distinct doc ids participating in candidate pairs, computed with a
    per-batch unique (driver receives only the bounded id partials, never
    the pair rows)."""

    def batch_ids(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "i": np.unique(
                    np.concatenate(
                        [df[a_col].to_numpy(np.int64), df[b_col].to_numpy(np.int64)]
                    )
                )
            }
        )

    parts = cand.map_batches(batch_ids, batch_format="pandas").to_pandas()
    return np.unique(parts["i"].to_numpy(np.int64))


def _picked_texts(
    docs: ray.data.Dataset, ids_ref, id_col: str, text_col: str
) -> tuple[ray.data.Dataset, int]:
    """ONE docs scan → the candidate docs' ``(id, text)`` rows, kept
    distributed (materialized on the workers, never the driver), plus
    their total text chars — the would-be broadcast payload — from a
    per-block sum over the (small) picked set.  Replaces the former two
    full corpus scans (a bytes probe, then a separate pick pass)."""

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        m = np.isin(df[id_col].to_numpy(), ray.get(ids_ref))
        return df.loc[m, [id_col, text_col]]

    picked = (
        docs.select_columns([id_col, text_col])
        .map_batches(pick, batch_format="pandas")
        .materialize()
    )

    def nb(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"nb": [int(df[text_col].str.len().sum()) if len(df) else 0]}
        )

    nbytes = int(picked.map_batches(nb, batch_format="pandas").sum("nb") or 0)
    return picked, nbytes


def _broadcast_verify_pairs(
    cand: ray.data.Dataset,
    n_cand: int,
    texts_ref,
    a_col: str,
    b_col: str,
    set_fn,
    threshold: float,
    out_col: str = "jaccard",
) -> ray.data.Dataset:
    """Tier-2 verify: candidate texts broadcast ONCE (``ray.put``, one
    plasma object shared by every worker on a node), candidate PAIRS
    verified distributed with the same exact set-intersection kernel the
    driver tier uses, so all tiers return identical rows.

    Scoring runs as plain TASKS below ``VERIFY_TASK_MAX_PAIRS`` — each
    task re-derives the shingle sets from the broadcast (sub-second at
    any broadcastable size) and pays no pool spin-up, measured 1.65 s vs
    2.29 s for the pool on a 300k-pair verify.  Above the cutoff an actor
    pool amortizes the set build across the many pair blocks."""

    def score(sets: dict, df: pd.DataFrame) -> pd.DataFrame:
        a = df[a_col].to_numpy(np.int64)
        b = df[b_col].to_numpy(np.int64)
        n = len(df)
        ni = np.fromiter(
            (len(sets[x] & sets[y]) for x, y in zip(a, b)), np.float64, n
        )
        nu = np.fromiter(
            (len(sets[x] | sets[y]) for x, y in zip(a, b)), np.float64, n
        )
        with np.errstate(invalid="ignore", divide="ignore"):
            j = np.where(nu > 0, ni / nu, 0.0)
        out = pd.DataFrame({a_col: a, b_col: b, out_col: _rha6(j)})
        return out[j >= threshold]  # filter on the unrounded value

    if n_cand <= VERIFY_TASK_MAX_PAIRS:

        def verify_task(df: pd.DataFrame) -> pd.DataFrame:
            texts = ray.get(texts_ref)
            return score({i: set_fn(t) for i, t in texts.items()}, df)

        return cand.map_batches(verify_task, batch_format="pandas")

    class Verify:
        def __init__(self):
            texts = ray.get(texts_ref)
            self.sets = {i: set_fn(t) for i, t in texts.items()}

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            return score(self.sets, df)

    return cand.map_batches(Verify, batch_format="pandas", concurrency=autoscale_pool())


def _verify_candidates(
    cand_ds: ray.data.Dataset,
    n_cand: int,
    docs: ray.data.Dataset,
    id_col: str,
    text_col: str,
    a_col: str,
    b_col: str,
    set_fn,
    threshold: float,
    num_partitions: int,
    broadcast_max: int,
    texts_max_bytes: int,
    out_col: str = "jaccard",
) -> pd.DataFrame:
    """Shared three-tier exact verification (module-header comment) of a
    RAW candidate-pair Dataset against the docs' shingle sets.  Returns
    the verified pairs as a driver frame — verified near-dups are rare by
    construction, so the result is driver-safe at any corpus size the
    candidates themselves survived."""
    ids_ref = ray.put(_candidate_ids(cand_ds, a_col, b_col))
    picked, nbytes = _picked_texts(docs, ids_ref, id_col, text_col)

    if nbytes > texts_max_bytes:
        # tier 3: texts outgrow a broadcast → hash-join fallback; join
        # volume is proportional to the pair count, so pre-dedupe pays here
        def jac(x: str, y: str) -> float:
            sx, sy = set_fn(x), set_fn(y)
            return len(sx & sy) / len(sx | sy)

        out = _join_verify_pairs(
            _pair_dedupe(cand_ds, a_col, b_col, num_partitions),
            docs, id_col, text_col, a_col, b_col,
            jac, threshold, num_partitions, out_col,
        ).to_pandas()  # verified pairs are rare — driver-safe
    else:
        docs_pdf = picked.to_pandas()  # bounded by texts_max_bytes
        if n_cand <= broadcast_max:
            # tier 1: driver kernel over the (deduped) candidate frame
            cand = (
                cand_ds.to_pandas()
                .drop_duplicates([a_col, b_col])
                .reset_index(drop=True)
            )
            sets = {
                i: set_fn(t)
                for i, t in zip(docs_pdf[id_col], docs_pdf[text_col])
            }
            a = cand[a_col].to_numpy(np.int64)
            b = cand[b_col].to_numpy(np.int64)
            ni = np.fromiter(
                (len(sets[x] & sets[y]) for x, y in zip(a, b)),
                np.float64,
                len(cand),
            )
            nu = np.fromiter(
                (len(sets[x] | sets[y]) for x, y in zip(a, b)),
                np.float64,
                len(cand),
            )
            with np.errstate(invalid="ignore", divide="ignore"):
                j = np.where(nu > 0, ni / nu, 0.0)
            out = pd.DataFrame({a_col: a, b_col: b, out_col: _rha6(j)})[
                j >= threshold
            ]
        else:
            # tier 2: broadcast texts, distributed scoring; the few-percent
            # duplicated candidates are scored twice and collapsed below
            texts_ref = ray.put(
                dict(zip(docs_pdf[id_col], docs_pdf[text_col]))
            )
            out = _broadcast_verify_pairs(
                cand_ds, n_cand, texts_ref, a_col, b_col,
                set_fn, threshold, out_col,
            ).to_pandas()  # verified pairs are rare — driver-safe
            out = out.drop_duplicates([a_col, b_col])
    return out.sort_values([a_col, b_col]).reset_index(drop=True)


def _join_verify_pairs(
    cand: ray.data.Dataset,
    docs: ray.data.Dataset,
    id_col: str,
    text_col: str,
    a_col: str,
    b_col: str,
    jac_fn,
    threshold: float,
    num_partitions: int,
    out_col: str = "jaccard",
) -> ray.data.Dataset:
    """Distributed candidate verification — the scale path when the
    candidate set is too large to broadcast as a driver text dict.

    Two hash joins attach each side's text to the pair rows (the anti-join
    shape of the reference's orphan check, sql/etl_transformations.sql:
    200-210), then the SAME exact-Jaccard kernel the broadcast path uses
    runs per batch.  Shuffle volume = candidate pairs x text — heavy, but
    distributed and streaming; the driver never holds texts or pairs."""

    def renamer(mapping: dict[str, str]):
        # Dataset.rename_columns requires Arrow blocks; a zero-copy Arrow
        # map_batches rename works for pandas-backed inputs too
        def r(t: pa.Table) -> pa.Table:
            return t.rename_columns([mapping.get(c, c) for c in t.column_names])

        return r

    ta = docs.select_columns([id_col, text_col]).map_batches(
        renamer({id_col: a_col, text_col: "_ta"}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    tb = docs.select_columns([id_col, text_col]).map_batches(
        renamer({id_col: b_col, text_col: "_tb"}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # Cap join partitions at available CPUs: Ray 2.49's hash-shuffle Join
    # schedules aggregator actors per partition, and a partition count far
    # above the session's CPUs was observed to deadlock a long-lived
    # 4-CPU session (64-partition Join backpressured for 100 minutes with
    # zero blocks out; the identical call completes in seconds when the
    # aggregator pool fits).  Per-partition work only shrinks with more
    # partitions, so the cap never increases task memory.
    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    jp = int(max(2, min(num_partitions, ncpu)))
    joined = cand.join(
        ta, join_type="inner", num_partitions=jp, on=(a_col,)
    ).join(tb, join_type="inner", num_partitions=jp, on=(b_col,))

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        vals = np.fromiter(
            (jac_fn(x, y) for x, y in zip(df["_ta"], df["_tb"])),
            np.float64,
            len(df),
        )
        out = pd.DataFrame(
            {
                a_col: df[a_col].to_numpy(np.int64),
                b_col: df[b_col].to_numpy(np.int64),
                out_col: _rha6(vals),
            }
        )
        return out[vals >= threshold]  # filter on the unrounded value

    return joined.map_batches(verify, batch_format="pandas")


def minhash_coefficients(num_hashes: int = 64, seed: int = 42):
    """Seeded universal-hash family ``(a*x + b) mod (2^31-1)``.

    Single source of truth shared by ``ShingleMinHash`` and the SQL oracle
    (``__ray_entry__.oracle_sql`` inlines these as literals): base shingle
    hashes are 32-bit, ``a < 2^31-1``, so ``a*x + b < 2^63`` — every term is
    exact in int64 on BOTH numpy and DuckDB BIGINT, no overflow, no wrap."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MINHASH_P, num_hashes, dtype=np.int64)
    b = rng.integers(0, _MINHASH_P, num_hashes, dtype=np.int64)
    return a, b


def _rha6(x: np.ndarray) -> np.ndarray:
    """Round half AWAY from zero to 6 decimals — DuckDB ``ROUND(x, 6)``
    semantics (numpy's default is banker's).  Jaccard ratios CAN land on
    exact decimal ties (any union size divisible by 2^7, e.g. 1/128 =
    0.0078125), so the rounding rule must match the oracle's exactly;
    same discipline as ``pipelines/analytics.py:_rha``."""
    x = np.asarray(x, dtype=np.float64)
    return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6


def _md5_lower32(s: str) -> int:
    """Lowest 32 bits of DuckDB ``md5_number_lower`` (little-endian int of
    digest bytes 8..16) — i.e. digest bytes 8..12 LE.  Using the exact
    DuckDB definition makes every hash-derived operator SQL-oracle-able."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:12], "little")


def _md5_lower64(s: str) -> int:
    """DuckDB ``md5_number_lower(s)``: little-endian int of digest[8:16]."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")


class ShingleMinHash:
    """Per-batch MinHash signatures over word k-shingles.

    Universal-hash family ``(a*x + b) mod (2^31-1)`` over 32-bit md5 base
    hashes with seeded coefficients — built once per actor; signatures are
    exact functions of the text, so reruns and retries are deterministic
    AND the whole construction is reproducible in SQL (DuckDB
    ``md5_number_lower`` + BIGINT arithmetic), which is what lets
    ``dedup_minhash_pairs`` carry an exact value-hash oracle despite being
    an approximate algorithm.

    Tokenization matches the n-gram-Jaccard operator (and DuckDB
    ``string_split(text, ' ')``): docs with fewer than ``shingle_k``
    space-separated words have no shingles and never pair."""

    def __init__(self, num_hashes: int = 64, shingle_k: int = 3, seed: int = 42,
                 text_col: str = "text"):
        self.a, self.b = minhash_coefficients(num_hashes, seed)
        self.k = shingle_k
        self.num_hashes = num_hashes
        self.text_col = text_col

    def shingles(self, text: str) -> np.ndarray:
        # split(" ") (not split()) to match DuckDB string_split(text,' ')
        words = (text or "").split(" ")
        if len(words) < self.k:
            return np.empty(0, dtype=np.int64)
        grams = {
            " ".join(words[i : i + self.k]) for i in range(len(words) - self.k + 1)
        }
        return np.fromiter((_md5_lower32(g) for g in grams), dtype=np.int64)

    def signature(self, text: str) -> np.ndarray | None:
        sh = self.shingles(text)
        if len(sh) == 0:
            return None  # shorter than k words — no signature, never pairs
        # (num_hashes, n_shingles) universal hashes -> row-wise min;
        # a*x + b < 2^63 so int64 arithmetic is exact (no silent wrap)
        hv = (self.a[:, None] * sh[None, :] + self.b[:, None]) % _MINHASH_P
        return hv.min(axis=1)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        # Deliberately PER-DOC: the (num_hashes × ~70) per-doc hash matrix
        # is L2-resident, so the whole universal-hash fold runs out of
        # cache; a slice-vectorized variant (one big matrix + segmented
        # min per 2048-doc slice) was measured SLOWER on a 400k-doc corpus
        # (20-24.5 s vs 14.7-14.9 s interleaved) — its hundreds of MB of
        # temporaries stream through RAM, and unlike SimHasher's word
        # cache there is no cross-doc shingle reuse to amortize.
        rows = [
            (doc_id, sig)
            for doc_id, t in zip(df["doc_id"], df[self.text_col])
            if (sig := self.signature(t)) is not None
        ]
        out = pd.DataFrame({"doc_id": np.asarray([r[0] for r in rows], dtype=np.int64)})
        out["sig"] = [r[1] for r in rows]
        return out


def _band_key_cols(num_hashes: int, bands: int) -> tuple[int, list[str]]:
    rows_per_band = num_hashes // bands
    return rows_per_band, [f"bk{i}" for i in range((rows_per_band + 1) // 2)]


def minhash_band_rows(
    docs: ray.data.Dataset,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    text_col: str = "text",
) -> ray.data.Dataset:
    """The PERSISTABLE LSH band-bucket table: one ``(band_id, doc_id,
    bk0..bkN)`` row per doc per band — the band's literal value tuple
    packed LOSSLESSLY into int64 pairs (every minhash < 2^31, so
    k = v[2i]*2^31 + v[2i+1] is exact; the same candidate set as the SQL
    oracle's string_agg tuple, zero collision risk).  Int keys keep the
    explode, the bucket sort and the self-merge fully vectorized where a
    per-doc per-band string join would build millions of Python tuples.

    This is what a continuously-ingesting corpus WRITES ONCE per ingest
    (e.g. ``.write_parquet`` next to the lake) and feeds back to
    ``incremental_minhash_pairs(existing_bands=...)`` per increment, so
    the ingested side is never re-shingled.  Rows are a pure function of
    (text, num_hashes, bands, shingle_k, seed) — persist those parameters
    with the table; a mismatch silently yields disjoint buckets."""
    hasher = ShingleMinHash(num_hashes, shingle_k, text_col=text_col)
    rows_per_band, key_cols = _band_key_cols(num_hashes, bands)

    def to_bands(df: pd.DataFrame) -> pd.DataFrame:
        sig_df = hasher(df)
        n = len(sig_df)
        if n == 0:
            cols = {"band_id": [], "doc_id": []}
            cols.update({kc: [] for kc in key_cols})
            return pd.DataFrame(cols).astype(np.int64)
        S = np.stack(sig_df["sig"].to_numpy())  # (n, num_hashes) int64
        B = S.reshape(n, bands, rows_per_band)
        out = {
            "band_id": np.tile(np.arange(bands, dtype=np.int64), n),
            "doc_id": np.repeat(sig_df["doc_id"].to_numpy(np.int64), bands),
        }
        for i, kc in enumerate(key_cols):
            lo = B[:, :, 2 * i]
            hi = (
                B[:, :, 2 * i + 1]
                if 2 * i + 1 < rows_per_band
                else np.zeros_like(lo)
            )
            out[kc] = (lo * np.int64(1 << 31) + hi).reshape(-1)
        return pd.DataFrame(out)

    return docs.map_batches(to_bands, batch_format="pandas")


def _band_gp_tagger(num_partitions: int, side: int | None = None):
    """Append the bucket-partition id (and optionally a side tag) to band
    rows.  ``_gp`` derives from (band_id, first band value) — and the
    first value is recoverable from the packed key (bk0 >> 31), so
    persisted band tables need not store it."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_gp"] = (
            df["band_id"].to_numpy(np.int64) * 131
            + (df["bk0"].to_numpy(np.int64) >> 31)
        ) % num_partitions
        if side is not None:
            df["_side"] = np.int8(side)
        return df

    return f


def minhash_lsh_pairs(
    docs: ray.data.Dataset,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.8,
    text_col: str = "text",
    num_partitions: int | None = None,
    verify_broadcast_max: int = VERIFY_BROADCAST_MAX,
    verify_texts_max_bytes: int = VERIFY_TEXTS_MAX_BYTES,
) -> pd.DataFrame:
    """Near-duplicate pairs via MinHash banding + exact Jaccard verify.

    Pipeline: signatures (actor pool) → explode to (band_id, band_hash,
    doc_id) rows (``minhash_band_rows``) → groupby buckets → candidate
    pairs → verify with exact shingle Jaccard via the three-tier scheme
    at the top of this module (driver kernel / broadcast-texts
    distributed / hash-join).  ``num_partitions`` defaults to
    input-scaled (callers with on-disk bytes pass ``partitions_for_bytes``;
    the fallback floor is 2x cluster CPUs)."""
    hasher = ShingleMinHash(num_hashes, shingle_k, text_col=text_col)
    num_partitions = num_partitions or partitions_for_bytes(None)
    _, key_cols = _band_key_cols(num_hashes, bands)

    buckets = minhash_band_rows(
        docs, num_hashes, bands, shingle_k, text_col
    ).map_batches(_band_gp_tagger(num_partitions), batch_format="pandas")

    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # within-partition self-merge on the bucket key: C-speed quadratic
        # expansion per bucket, no per-bucket Python calls
        m = g.merge(g, on=["band_id"] + key_cols)
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        return (
            m[["doc_id_x", "doc_id_y"]]
            .drop_duplicates()
            .rename(columns={"doc_id_x": "a", "doc_id_y": "b"})
        )

    # RAW candidates (within-partition deduped by part_pairs; a pair can
    # still surface via bands in different partitions — the shared verify
    # collapses those, see the tier comment at the top of the module)
    cand_ds = (
        buckets.groupby("_gp").map_groups(part_pairs, batch_format="pandas")
    ).materialize()
    n_cand = cand_ds.count()
    if n_cand == 0:
        return pd.DataFrame(columns=["a", "b", "jaccard"])

    return _verify_candidates(
        cand_ds, n_cand, docs, "doc_id", text_col, "a", "b",
        lambda t: set(hasher.shingles(t).tolist()),
        jaccard_threshold, num_partitions,
        verify_broadcast_max, verify_texts_max_bytes,
    )


def incremental_minhash_pairs(
    new_docs: ray.data.Dataset,
    existing_docs: ray.data.Dataset,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.8,
    text_col: str = "text",
    num_partitions: int | None = None,
    existing_bands: ray.data.Dataset | None = None,
    verify_broadcast_max: int = VERIFY_BROADCAST_MAX,
    verify_texts_max_bytes: int = VERIFY_TEXTS_MAX_BYTES,
) -> pd.DataFrame:
    """INCREMENTAL near-dup gate: MinHash+LSH pairs between an incoming
    increment (``new_docs``) and the already-ingested corpus
    (``existing_docs``) — the near-dup sibling of ``incremental_dedup``,
    and the check a continuously-ingesting 100-TB corpus runs per CDC
    increment instead of re-LSH-ing everything from scratch.

    Signatures are per-doc (independent of which side a doc is on), so the
    cross-side candidate set is EXACTLY the full-corpus LSH candidate set
    restricted to (existing, new) pairs — that identity is both the
    correctness property the tests pin and what makes the operator
    SQL-oracle-able with the same md5-rebased banding replay as
    ``minhash_lsh_pairs``.  Both sides' band rows meet in ONE tagged
    union (like ``incremental_dedup`` — no broadcast of either side);
    only cross-side pairs are generated inside each bucket partition, so
    within-corpus duplicates (already handled at their own ingest time)
    never inflate the candidate set.

    ``existing_bands``: the ingested corpus's PERSISTED band table
    (``minhash_band_rows`` output, e.g. re-read from Parquet written at
    ingest time, same num_hashes/bands/shingle_k/seed).  With it, the
    existing side is never re-shingled — per-increment cost is
    O(increment texts + both sides' band rows + candidate verify), which
    is what makes the operator honestly incremental at corpus scale.
    Without it, the existing side's bands are derived in-flight from
    ``existing_docs`` (correct, but O(corpus) hashing per call).
    ``existing_docs`` is still required either way: the exact-Jaccard
    verify reads the CANDIDATE docs' texts from it (a narrow pick of the
    rare candidates, never a full re-shingle).

    Requires doc_ids unique ACROSS sides (they address one logical
    corpus).  Returns verified pairs ``(existing_id, new_id, jaccard)``
    sorted; a new doc appearing in ≥1 row is a near-dup of ingested
    content and would be skipped/flagged by the caller's admit policy.
    """
    hasher = ShingleMinHash(num_hashes, shingle_k, text_col=text_col)
    num_partitions = num_partitions or partitions_for_bytes(None)
    _, key_cols = _band_key_cols(num_hashes, bands)

    if existing_bands is None:
        existing_bands = minhash_band_rows(
            existing_docs, num_hashes, bands, shingle_k, text_col
        )
    buckets = existing_bands.map_batches(
        _band_gp_tagger(num_partitions, side=0), batch_format="pandas"
    ).union(
        minhash_band_rows(
            new_docs, num_hashes, bands, shingle_k, text_col
        ).map_batches(_band_gp_tagger(num_partitions, side=1), batch_format="pandas")
    )
    empty = pd.DataFrame(
        {
            "existing_id": pd.Series(dtype=np.int64),
            "new_id": pd.Series(dtype=np.int64),
            "jaccard": pd.Series(dtype=np.float64),
        }
    )

    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # CROSS-side self-merge only: existing × new within each bucket
        gx = g[g["_side"] == 0]
        gy = g[g["_side"] == 1]
        if not len(gx) or not len(gy):
            return empty[["existing_id", "new_id"]]
        m = gx.merge(gy, on=["band_id"] + key_cols)
        return (
            m[["doc_id_x", "doc_id_y"]]
            .drop_duplicates()
            .rename(columns={"doc_id_x": "existing_id", "doc_id_y": "new_id"})
        )

    cand_ds = (
        buckets.groupby("_gp").map_groups(part_pairs, batch_format="pandas")
    ).materialize()
    n_cand = cand_ds.count()
    if n_cand == 0:
        return empty

    union_docs = existing_docs.select_columns(["doc_id", text_col]).union(
        new_docs.select_columns(["doc_id", text_col])
    )
    return _verify_candidates(
        cand_ds, n_cand, union_docs, "doc_id", text_col,
        "existing_id", "new_id",
        lambda t: set(hasher.shingles(t).tolist()),
        jaccard_threshold, num_partitions,
        verify_broadcast_max, verify_texts_max_bytes,
    )


class SimHasher:
    """64-bit SimHash over word unigrams (per-actor state: none heavy, but
    kept as a class for the actor-pool pattern and seeding discipline).

    Word hash = DuckDB ``md5_number_lower`` and tokenization =
    ``string_split(text, ' ')`` distinct, so the whole signature — and
    therefore the chunk-bucketed near-dup pair set — is reproducible
    bit-for-bit in SQL (the ``dedup_simhash_pairs`` oracle)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self._shifts = np.arange(64, dtype=np.uint64)
        self._cache: dict[str, int] = {}  # word → md5_lower64, per worker

    def simhash(self, text: str) -> int:
        """64-bit simhash as a SIGNED python int (int64-storable).
        Single-doc reference kernel; the batch path below must agree."""
        acc = np.zeros(64, dtype=np.int64)
        shifts = self._shifts
        # split(" ") (not split()) to match DuckDB string_split(text,' ')
        for w in set((text or "").split(" ")):
            h = np.uint64(_md5_lower64(w))
            bits = (h >> shifts) & np.uint64(1)
            acc += np.where(bits == 1, 1, -1)
        v = int(np.sum((acc > 0).astype(np.uint64) << shifts, dtype=np.uint64))
        return v - (1 << 64) if v >= (1 << 63) else v

    # docs per internal slice — Ray feeds WHOLE blocks as one batch, and a
    # full-block (n_words × 64) sign matrix reaches gigabytes; a bounded
    # slice keeps the matrices tens of MB while still amortizing dispatch
    _CHUNK_DOCS = 2048

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        # slice-vectorized: md5 once per word occurrence via a per-worker
        # cache (word reuse across docs is the norm — boilerplate,
        # stopwords); per-doc ±1 bit accumulation is one segmented reduce
        # over a (n_words × 64) sign matrix per ~2048-doc slice instead
        # of a Python loop per word per doc.
        if not len(df):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype=np.int64),
                    "simhash": pd.Series(dtype=np.int64),
                }
            )
        texts = df[self.text_col].to_numpy()
        cache = self._cache
        sig_parts: list[np.ndarray] = []
        for s0 in range(0, len(df), self._CHUNK_DOCS):
            doc_words = [
                set((t or "").split(" ")) for t in texts[s0 : s0 + self._CHUNK_DOCS]
            ]
            counts = np.fromiter(
                (len(w) for w in doc_words), np.int64, len(doc_words)
            )
            total = int(counts.sum())
            if len(cache) > 4_000_000:  # bound per-worker memory on huge vocabs
                cache.clear()
            word_h = np.fromiter(
                (
                    cache[w] if w in cache else cache.setdefault(w, _md5_lower64(w))
                    for ws in doc_words
                    for w in ws
                ),
                np.uint64,
                total,
            )
            bits = (
                (word_h[:, None] >> self._shifts[None, :]) & np.uint64(1)
            ).astype(np.int8)
            contrib = (bits * 2 - 1).astype(np.int32)  # bit set → +1, clear → −1
            # ''.split(' ') == [''] so every doc has ≥1 word — reduceat-safe
            starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
            acc = np.add.reduceat(contrib, starts, axis=0)
            sig_parts.append(
                ((acc > 0).astype(np.uint64) << self._shifts[None, :]).sum(axis=1)
            )
        sig = np.concatenate(sig_parts)
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "simhash": sig.view(np.int64)}
        )


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount over uint64 (numpy <2 has no bit_count ufunc)."""
    return np.unpackbits(
        np.ascontiguousarray(x).view(np.uint8).reshape(len(x), 8), axis=1
    ).sum(axis=1).astype(np.int64)


def simhash_near_dups(
    docs: ray.data.Dataset,
    max_hamming: int = 3,
    text_col: str = "text",
    num_partitions: int | None = None,
) -> pd.DataFrame:
    """Near-dup pairs by SimHash, fully distributed, Manku-style multi-block
    banding (Manku, Jain & Das Sarma, "Detecting Near-Duplicates for Web
    Crawling", WWW 2007 — public): the 64-bit hash splits into 6 blocks
    (11,11,11,11,10,10 bits) and each doc emits one bucket row per
    C(6,3)=20 block-triple, keyed on the ~32 concatenated bits of that
    triple.  A pair within hamming distance d ≤ 3 has its differing bits
    in at most 3 blocks, so at least one triple is clean on both sides
    (pigeonhole) — candidate generation is COMPLETE for d ≤ 3, identical
    in output to the naive 4×16-bit chunk scheme, but the bucket key
    carries ~32 bits instead of 16: expected bucket size stays O(1) at
    billions of docs, where 16-bit buckets degenerate to corpus/65536
    members each and the in-bucket quadratic pair-gen explodes (measured:
    a low-entropy 400k-doc corpus stalled the 16-bit scheme >10 min; this
    scheme finishes in seconds on the same input).  The hash travels with
    the row — ~32 bytes/row × 20 rows/doc, never text; candidate pairs
    are generated AND hamming-verified vectorized inside each partition's
    ``map_groups`` call, duplicates collapsed by one pair-key groupby.

    Residual skew note: docs with IDENTICAL simhashes (exact dups or
    boilerplate) still co-bucket in every table — inherent to any
    signature scheme; run ``exact_dedup`` first if exact-dup mass is
    large.  Banding also presumes near-uniform signature BITS: a
    low-entropy corpus (measured: a 60-word vocabulary) biases the
    per-bit votes so hard that even 32-bit band keys collapse into
    mega-buckets (1.9B candidates at 400k docs) — if the vocabulary is
    tiny relative to the corpus, near-dup semantics by simhash are
    ill-posed and an exact or Jaccard method should be used."""
    num_partitions = num_partitions or partitions_for_bytes(None)
    sims = docs.map_batches(SimHasher(text_col), batch_format="pandas")

    # 6 blocks × C(6,3) tables; offsets/widths fixed so signatures and
    # bucket keys are reproducible run-to-run
    offs = np.array([0, 11, 22, 33, 44, 54], dtype=np.uint64)
    lens = np.array([11, 11, 11, 11, 10, 10], dtype=np.uint64)
    from itertools import combinations

    triples = list(combinations(range(6), 3))

    def to_buckets(df: pd.DataFrame) -> pd.DataFrame:
        h = df["simhash"].to_numpy()
        ids = df["doc_id"].to_numpy()
        hu = h.view(np.uint64)
        blocks = [
            ((hu >> offs[b]) & ((np.uint64(1) << lens[b]) - np.uint64(1)))
            for b in range(6)
        ]
        parts = []
        for t, (i, j, k) in enumerate(triples):
            key = (
                blocks[i]
                | (blocks[j] << lens[i])
                | (blocks[k] << (lens[i] + lens[j]))
            ).astype(np.int64)
            parts.append(
                pd.DataFrame(
                    {
                        # multiplier coprime to any realistic partition
                        # count so (table, key) combos spread
                        "_gp": (t * 131 + key) % num_partitions,
                        "chunk_id": np.int64(t),
                        "chunk_key": key,
                        "doc_id": ids,
                        "simhash": h,
                    }
                )
            )
        return pd.concat(parts, ignore_index=True)

    buckets = sims.map_batches(to_buckets, batch_format="pandas")
    empty = pd.DataFrame(
        {
            "a": pd.Series(dtype=np.int64),
            "b": pd.Series(dtype=np.int64),
            "hamming": pd.Series(dtype=np.int64),
        }
    )

    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized self-merge per PARTITION of the bucket space (one
        # Python call per partition, not per 16-bit bucket), hamming
        # verified on the merged columns in one popcount pass
        m = g.merge(g, on=["chunk_id", "chunk_key"])
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        if not len(m):
            return empty
        d = _popcount64(
            m["simhash_x"].to_numpy().view(np.uint64)
            ^ m["simhash_y"].to_numpy().view(np.uint64)
        )
        keep = d <= max_hamming
        out = pd.DataFrame(
            {
                "a": m["doc_id_x"].to_numpy()[keep],
                "b": m["doc_id_y"].to_numpy()[keep],
                "hamming": d[keep],
            }
        )
        # same pair via two chunks landing in this partition
        return out.drop_duplicates(["a", "b"])

    verified = buckets.groupby("_gp").map_groups(part_pairs, batch_format="pandas")
    # a pair found via chunks in DIFFERENT partitions appears once per
    # partition — collapse on the driver (verified pairs are rare)
    out = verified.to_pandas().drop_duplicates(["a", "b"])
    if len(out) == 0:
        return empty
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def exact_dedup(
    docs: ray.data.Dataset, text_col: str = "text", num_partitions: int | None = None
) -> ray.data.Dataset:
    """Exact dedup, min-doc_id wins: digest the content per batch, ONE
    row shuffle keyed on the digest partition, keep first per digest.

    The keyed-upsert cousin of the CDC fold (D1 in SURVEY.md §2.8).
    Grouping is by digest-hash PARTITION, not per digest: one vectorized
    ``drop_duplicates`` per partition instead of one Python call per
    distinct content (the per-group-call anti-pattern — at corpus scale
    that is billions of calls).  The full row (text included) crosses the
    shuffle once — unavoidable when the output is the surviving rows and
    winners are corpus-sized (too big to broadcast back); when only the
    winner IDS are needed, use ``duplicate_text_stats``-style digest-only
    rows (40 bytes/row) instead.  ``num_partitions`` bounds each
    materialized group at ~corpus/partitions — callers at scale pass an
    input-scaled count (``scale.partitions_for_bytes``)."""
    num_partitions = num_partitions or partitions_for_bytes(None)

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        hs = [hashlib.sha256((t or "").encode()).hexdigest() for t in df[text_col]]
        df["_h"] = hs
        df["_gp"] = np.fromiter(
            (int(h[:12], 16) % num_partitions for h in hs), np.int64, len(hs)
        )
        return df

    def keep_min_part(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values("doc_id")
            .drop_duplicates("_h", keep="first")
            .drop(columns=["_h", "_gp"])
        )

    return (
        docs.map_batches(add_hash, batch_format="pandas")
        .groupby("_gp")
        .map_groups(keep_min_part, batch_format="pandas")
    )


def incremental_dedup(
    new_docs: ray.data.Dataset,
    existing_docs: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """CDC-flavored INCREMENTAL exact dedup: admit only the rows of
    ``new_docs`` whose content digest is absent from ``existing_docs``,
    collapsing duplicate content *within* the new batch to the min id —
    the dedup a continuously-ingesting corpus runs per increment instead
    of re-deduping 100 TB from scratch.

    Shape: digest both sides per batch (sha256 travels, never text is
    compared), tag, union, ONE digest-partition groupby — an anti-join
    with no driver set and no broadcast of the existing corpus; the
    existing side can also be a pre-digested manifest column, in which
    case the whole left scan is a narrow one-column read.  The group key
    is a digest-hash PARTITION (vectorized transform-min + drop_duplicates
    per partition), never one Python call per distinct content."""
    num_partitions = num_partitions or partitions_for_bytes(None)

    def tag(side: int):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            hs = [
                hashlib.sha256((t or "").encode()).hexdigest()
                for t in df[text_col]
            ]
            out = pd.DataFrame(
                {
                    "_h": hs,
                    "_gp": np.fromiter(
                        (int(h[:12], 16) % num_partitions for h in hs),
                        np.int64,
                        len(hs),
                    ),
                    id_col: df[id_col].to_numpy(),
                    "_side": np.int8(side),
                }
            )
            if side == 1:
                out[text_col] = df[text_col].to_numpy()
            else:
                out[text_col] = ""
            return out

        return f

    both = existing_docs.select_columns([id_col, text_col]).map_batches(
        tag(0), batch_format="pandas"
    ).union(
        new_docs.select_columns([id_col, text_col]).map_batches(
            tag(1), batch_format="pandas"
        )
    )

    def keep_new_part(g: pd.DataFrame) -> pd.DataFrame:
        has_old = g.groupby("_h")["_side"].transform("min").eq(0)
        fresh = g[(g["_side"] == 1) & ~has_old]
        return fresh.sort_values(id_col).drop_duplicates("_h", keep="first")[
            [id_col, text_col]
        ]

    return both.groupby("_gp").map_groups(keep_new_part, batch_format="pandas")


def duplicate_text_stats(
    docs: ray.data.Dataset, text_col: str = "text", num_partitions: int | None = None
) -> pa.Table:
    """D2 duplicate *detection* report: how many digests appear >1 time.

    A digest lives in exactly one hash partition, so each partition's
    (distinct, duplicated, extra-row) triple is exact and the driver sums
    only P rows — the earlier design sort-aggregated per digest AND
    pulled every distinct digest to the driver (corpus-scale at 100 TB)."""
    num_partitions = num_partitions or partitions_for_bytes(None)

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        hs = [hashlib.sha256((t or "").encode()).hexdigest() for t in df[text_col]]
        return pd.DataFrame(
            {
                "_h": hs,
                "_gp": np.fromiter(
                    (int(h[:12], 16) % num_partitions for h in hs),
                    np.int64,
                    len(hs),
                ),
            }
        )

    def part_stats(g: pd.DataFrame) -> pd.DataFrame:
        vc = g["_h"].value_counts()
        dup = vc[vc > 1]
        return pd.DataFrame(
            {
                "distinct_texts": [len(vc)],
                "duplicated_texts": [len(dup)],
                "duplicate_rows": [int(dup.sum() - len(dup)) if len(dup) else 0],
            }
        )

    totals = (
        docs.map_batches(add_hash, batch_format="pandas")
        .groupby("_gp")
        .map_groups(part_stats, batch_format="pandas")
        .sum(["distinct_texts", "duplicated_texts", "duplicate_rows"])
    )
    return pa.table(
        {
            "distinct_texts": pa.array([int(totals["sum(distinct_texts)"])], pa.int64()),
            "duplicated_texts": pa.array(
                [int(totals["sum(duplicated_texts)"])], pa.int64()
            ),
            "duplicate_rows": pa.array([int(totals["sum(duplicate_rows)"])], pa.int64()),
        }
    )


def _md5_lower63(s: str) -> int:
    """``md5_number_lower % 2^63`` — the top bit masked off so the value
    is BIGINT-storable in both numpy and DuckDB (exact SQL replay)."""
    return _md5_lower64(s) & ((1 << 63) - 1)


def hot_passage_stats(
    docs: ray.data.Dataset,
    window_k: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """SUBSTRING-level duplication report: for each doc, how many of its
    ``window_k``-word rolling windows also appear in ≥ ``min_docs`` docs
    total — the cross-document boilerplate/duplicated-passage signal that
    document-level dedup (exact or near) cannot see (public antecedents:
    suffix-array substring dedup in Lee et al., "Deduplicating Training
    Data Makes Language Models Better", ACL 2022, approximated here at
    fixed window length; C4/RefinedWeb repeated-line removal).

    Scale shape (two linear shuffles, no driver state, no text shuffle):
    per-doc DISTINCT window hashes (63-bit md5 — SQL-replayable, travels
    as 16 B/row) → window-hash-partition groupby where each hash's global
    doc count is a vectorized ``transform('size')`` (rows are per-doc
    distinct, so count == distinct docs) → per-doc rollup via one
    ``hash_agg`` exchange on doc_id.  Unlike a broadcast-hot-set design,
    nothing assumes the duplicated-window set is small — a boilerplate-
    heavy corpus ships the same 16 B/row regardless.

    Returns one row per doc with ≥1 window: ``(doc_id, n_windows, n_hot,
    hot_frac)``; docs shorter than ``window_k`` words have no windows and
    no row.  ``hot_frac`` near 1 marks template/boilerplate docs worth
    dropping; window-level positions (for surgical passage removal) are
    a caller-side second pass over just the flagged docs."""
    num_partitions = num_partitions or partitions_for_bytes(None)

    def to_windows(df: pd.DataFrame) -> pd.DataFrame:
        ids: list[int] = []
        whs: list[int] = []
        for doc_id, t in zip(df[id_col], df[text_col]):
            # split(" ") (not split()) to match DuckDB string_split(text,' ')
            words = (t or "").split(" ")
            if len(words) < window_k:
                continue
            seen = {
                _md5_lower63(" ".join(words[i : i + window_k]))
                for i in range(len(words) - window_k + 1)
            }
            ids.extend([doc_id] * len(seen))
            whs.extend(seen)
        wh = np.asarray(whs, dtype=np.int64)
        return pd.DataFrame(
            {
                id_col: np.asarray(ids, dtype=np.int64),
                "wh": wh,
                "_gp": wh % num_partitions,
            }
        )

    wins = docs.select_columns([id_col, text_col]).map_batches(
        to_windows, batch_format="pandas"
    )

    def annotate(part: pd.DataFrame) -> pd.DataFrame:
        # every row of a window hash lives in this partition and rows are
        # per-doc distinct → transform-size IS the global distinct-doc count
        nd = part.groupby("wh")["wh"].transform("size").to_numpy(np.int64)
        return pd.DataFrame(
            {
                id_col: part[id_col].to_numpy(np.int64),
                "hot": (nd >= min_docs).astype(np.int64),
            }
        )

    flags = wins.groupby("_gp").map_groups(annotate, batch_format="pandas")
    agg = hash_agg(
        flags,
        [id_col],
        {"n_windows": ("hot", "size"), "n_hot": ("hot", "sum")},
        num_partitions,
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["hot_frac"] = _rha6(
            df["n_hot"].to_numpy(np.float64) / df["n_windows"].to_numpy(np.float64)
        )
        return df

    return agg.map_batches(finish, batch_format="pandas")


def strip_hot_passages(
    docs: ray.data.Dataset,
    window_k: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """SUBSTRING-level dedup TRANSFORM: remove from every doc the tokens
    covered by any ``window_k``-word window that appears in ≥ ``min_docs``
    docs — the surgical-removal sibling of ``hot_passage_stats`` (which
    only reports), approximating Lee et al.'s suffix-array substring
    dedup at fixed window length: shared license blocks, headers and
    templates vanish while each doc's unique prose survives.

    Scale shape (three linear shuffles, nothing broadcast, no driver
    state): window OCCURRENCE rows (doc_id, pos, 63-bit hash — 24 B/row,
    one per token) → window-hash partitions mark hot windows (distinct-doc
    count ≥ min_docs) and emit only the HOT occurrences' (doc_id, pos) —
    rare by construction — → those rows tagged-union with the doc texts
    into doc-hash partitions where each doc drops its covered token
    positions in one vectorized mask.  Every doc comes back exactly once:
    unaffected docs (including those shorter than the window) pass
    through unchanged; a fully-covered doc returns an empty string.
    """
    num_partitions = num_partitions or partitions_for_bytes(None)

    def to_occ(df: pd.DataFrame) -> pd.DataFrame:
        ids: list[int] = []
        poss: list[int] = []
        whs: list[int] = []
        for doc_id, t in zip(df[id_col], df[text_col]):
            # split(" ") (not split()) to match DuckDB string_split(text,' ')
            words = (t or "").split(" ")
            if len(words) < window_k:
                continue
            for i in range(len(words) - window_k + 1):
                ids.append(doc_id)
                poss.append(i)
                whs.append(_md5_lower63(" ".join(words[i : i + window_k])))
        wh = np.asarray(whs, dtype=np.int64)
        return pd.DataFrame(
            {
                id_col: np.asarray(ids, dtype=np.int64),
                "pos": np.asarray(poss, dtype=np.int64),
                "wh": wh,
                "_gp": wh % num_partitions,
            }
        )

    occ = docs.select_columns([id_col, text_col]).map_batches(
        to_occ, batch_format="pandas"
    )

    def hot_occurrences(part: pd.DataFrame) -> pd.DataFrame:
        # a window hash lives wholly in this partition → its distinct-doc
        # count is exact here; only hot occurrences leave (rare rows)
        nd = part.drop_duplicates([id_col, "wh"]).groupby("wh").size()
        hot = nd[nd >= min_docs].index
        keep = part[part["wh"].isin(hot)]
        return pd.DataFrame(
            {
                id_col: keep[id_col].to_numpy(np.int64),
                "text": "",
                "pos": keep["pos"].to_numpy(np.int64),
                "_gp2": keep[id_col].to_numpy(np.int64) % num_partitions,
            }
        )

    hots = occ.groupby("_gp").map_groups(hot_occurrences, batch_format="pandas")

    def tag_texts(df: pd.DataFrame) -> pd.DataFrame:
        # pos = -1 marks the text row in the tagged union
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(np.int64),
                "text": df[text_col].to_numpy(),
                "pos": np.int64(-1),
                "_gp2": df[id_col].to_numpy(np.int64) % num_partitions,
            }
        )

    texts = docs.select_columns([id_col, text_col]).map_batches(
        tag_texts, batch_format="pandas"
    )
    offs = np.arange(window_k, dtype=np.int64)

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        t = g[g["pos"] < 0]
        h = g[g["pos"] >= 0]
        starts = {
            did: grp["pos"].to_numpy(np.int64)
            for did, grp in h.groupby(id_col, sort=False)
        }
        out_texts: list[str] = []
        for did, txt in zip(t[id_col], t["text"]):
            s = starts.get(did)
            if s is None:
                out_texts.append(txt)
                continue
            words = (txt or "").split(" ")
            mask = np.zeros(len(words), dtype=bool)
            idx = (s[:, None] + offs[None, :]).ravel()
            mask[idx[idx < len(words)]] = True
            out_texts.append(" ".join(w for w, m in zip(words, mask) if not m))
        return pd.DataFrame(
            {id_col: t[id_col].to_numpy(np.int64), "text": out_texts}
        )

    return (
        texts.union(hots).groupby("_gp2").map_groups(rebuild, batch_format="pandas")
    )


def ngram_jaccard_pairs(
    docs: ray.data.Dataset,
    shingle_k: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
    verify_broadcast_max: int = VERIFY_BROADCAST_MAX,
    verify_texts_max_bytes: int = VERIFY_TEXTS_MAX_BYTES,
) -> ray.data.Dataset:
    """EXACT n-gram Jaccard near-dup pairs via a PREFIX-FILTERED all-pairs
    similarity join (the non-approximate sibling of ``minhash_lsh_pairs``;
    SQL-oracled — the filter is lossless, so the result set is unchanged).

    Prefix-filtering principle (SSJoin/PPJoin, Chaudhuri et al. ICDE'06,
    Xiao et al. WWW'08): under any global total order on grams, two docs
    with Jaccard ≥ τ must share a gram within each doc's first
    ``n − ⌈τ·n⌉ + 1`` grams (the smallest shared gram sits that early in
    BOTH sorted sets).  Ordering grams rarest-first means hot stop-phrase
    trigrams — the quadratic killer of a plain inverted-index join —
    almost never enter a prefix, so candidate generation explodes only
    rare grams.  Measured at sf0.1 (5k docs, shared boilerplate): plain
    inverted index 175 s, prefix-filtered 10.4 s, identical output.

    Pipeline (3 linear shuffles of the gram table, no joins):
    per-doc distinct gram digests → doc-frequency annotate inside
    gram-hash partitions (each gram lives wholly in one) → per-doc prefix
    selection inside doc-hash partitions (vectorized rank-vs-cutoff) →
    candidate pairs by self-merge on prefix grams → exact verification of
    the rare candidates against a broadcast text lookup, or — above
    ``verify_broadcast_max`` candidates — the distributed
    ``_join_verify_pairs`` hash-join path (no driver text dict).  Digest
    collisions (~n²/2⁶⁴) are negligible at any realistic gram count."""
    num_partitions = num_partitions or partitions_for_bytes(None)

    def shingle_set(text: str) -> set[int]:
        # split(" ") (not split()) to match DuckDB string_split(text,' ')
        words = (text or "").split(" ")
        if len(words) < shingle_k:
            return set()
        return {
            int.from_bytes(
                hashlib.blake2b(
                    " ".join(words[i : i + shingle_k]).encode(), digest_size=8
                ).digest(),
                "big",
            )
            >> 1
            for i in range(len(words) - shingle_k + 1)
        }

    def to_grams(df: pd.DataFrame) -> pd.DataFrame:
        ids: list[int] = []
        hashes: list[int] = []
        for doc_id, text in zip(df[id_col], df[text_col]):
            for h in shingle_set(text):
                ids.append(doc_id)
                hashes.append(h)
        ha = np.asarray(hashes, dtype=np.int64)
        return pd.DataFrame(
            {
                id_col: np.asarray(ids, dtype=np.int64),
                "g": ha,
                "_gp": ha % num_partitions,
            }
        )

    grams = docs.map_batches(to_grams, batch_format="pandas")

    def add_df(part: pd.DataFrame) -> pd.DataFrame:
        # every row of a gram is in this partition → transform-size IS the
        # global doc frequency; re-key rows by doc for the prefix stage
        out = part[[id_col, "g"]].copy()
        out["df"] = part.groupby("g")["g"].transform("size")
        out["_gp2"] = out[id_col] % num_partitions
        return out

    by_doc = grams.groupby("_gp").map_groups(add_df, batch_format="pandas")

    def prefixes(part: pd.DataFrame) -> pd.DataFrame:
        # global order = (doc frequency asc, gram asc); prefix length
        # p_d = n_d − ⌈τ·n_d⌉ + 1.  The ceiling is biased DOWN by an
        # epsilon before np.ceil: float τ·n can land an ulp above the
        # exact rational value (τ=0.55, n=100 → 55.00000000000001,
        # ceil 56 instead of 55), which would SHORTEN the prefix and
        # silently drop true pairs.  A longer prefix is always lossless
        # (more candidates, verified exactly); a shorter one is not.
        part = part.sort_values([id_col, "df", "g"], kind="mergesort")
        rank = part.groupby(id_col, sort=False).cumcount().to_numpy()
        n = part.groupby(id_col, sort=False)["g"].transform("size").to_numpy()
        p_d = n - np.ceil(threshold * n - 1e-9).astype(np.int64) + 1
        keep = rank < p_d
        out = part.loc[keep, [id_col, "g"]].copy()
        out["n"] = n[keep]  # carry set size for the length filter
        out["r"] = rank[keep]  # gram's position — the positional filter
        out["_gp"] = out["g"].to_numpy() % num_partitions
        return out

    pfx = by_doc.groupby("_gp2").map_groups(prefixes, batch_format="pandas")

    def cand_pairs(part: pd.DataFrame) -> pd.DataFrame:
        m = part[[id_col, "g", "n", "r"]].merge(
            part[[id_col, "g", "n", "r"]], on="g"
        )
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        # length filter (also lossless): J <= min(n)/max(n), so a size
        # ratio below tau can never reach the threshold.  Epsilon-biased
        # toward KEEPING, for the same float-rounding hazard as the
        # prefix cutoff (τ·max can exceed the exact rational product).
        nx, ny = m["n_x"].to_numpy(), m["n_y"].to_numpy()
        m = m[np.minimum(nx, ny) >= threshold * np.maximum(nx, ny) - 1e-9]
        # positional filter (PPJoin, Xiao et al. WWW'08 — also lossless):
        # a match at sorted positions (i, j) bounds the overlap by
        # min(i, j) + 1 + min(nx−i−1, ny−j−1), and J ≥ τ needs overlap
        # ≥ ⌈τ·(nx+ny)/(1+τ)⌉.  The bound holds for EVERY match row of a
        # true pair (it upper-bounds the true overlap), so filtering each
        # row and deduping keeps exactly the pairs a full verify would.
        # At low τ the prefixes are long and the bound rarely kills
        # (sf0.1/τ=0.5: 310k → 309k candidates); it earns its keep at the
        # high-τ settings where prefixes are a few grams and a late match
        # cannot reach the overlap requirement.
        nx, ny = m["n_x"].to_numpy(), m["n_y"].to_numpy()
        rx, ry = m["r_x"].to_numpy(), m["r_y"].to_numpy()
        alpha = np.ceil(threshold * (nx + ny) / (1.0 + threshold) - 1e-9)
        ubound = np.minimum(rx, ry) + 1 + np.minimum(nx - rx - 1, ny - ry - 1)
        m = m[ubound >= alpha]
        return (
            m[[f"{id_col}_x", f"{id_col}_y"]]
            .drop_duplicates()
            .rename(columns={f"{id_col}_x": "doc_a", f"{id_col}_y": "doc_b"})
        )

    # RAW candidates (deduped within each gram partition by cand_pairs; a
    # pair sharing prefix grams in different partitions duplicates — the
    # shared verify collapses those, see the module-header tier comment)
    cand_ds = (
        pfx.groupby("_gp").map_groups(cand_pairs, batch_format="pandas")
    ).materialize()
    n_cand = cand_ds.count()
    # empty results go through from_arrow: an empty from_pandas Dataset
    # drops its column schema on the to_pandas round-trip
    empty_tbl = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }
    )
    if n_cand == 0:
        return ray.data.from_arrow(empty_tbl)

    out = _verify_candidates(
        cand_ds, n_cand, docs, id_col, text_col, "doc_a", "doc_b",
        shingle_set, threshold, num_partitions,
        verify_broadcast_max, verify_texts_max_bytes,
    )
    if not len(out):
        return ray.data.from_arrow(empty_tbl)
    return ray.data.from_pandas(out)


def connected_components(pairs: pd.DataFrame, a_col: str = "doc_a", b_col: str = "doc_b") -> pd.DataFrame:
    """Near-dup CLUSTERS from verified pairs: iterative min-label
    propagation to a fixed point (each node's cluster = min id reachable).

    Runs driver-side over the verified-pair edge list — pairs are rare by
    construction (LSH/IVF candidates already verified), so the edge list is
    tiny relative to the corpus even at 100 TB; if it ever isn't, the same
    min-label iteration maps onto repeated groupby-min over an edge
    Dataset.  Returns (doc_id, cluster_id≔min member id) for every node
    that appears in any pair."""
    label: dict = {}
    for x in pd.concat([pairs[a_col], pairs[b_col]]).unique():
        label[x] = x
    edges = list(zip(pairs[a_col], pairs[b_col]))

    def find(x):
        root = x
        while label[root] != root:
            root = label[root]
        while label[x] != root:  # path compression
            label[x], x = root, label[x]
        return root

    for a, b in edges:  # union by min root
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            label[hi] = lo
    out = pd.DataFrame(
        {"doc_id": list(label), "cluster_id": [find(x) for x in label]}
    ).sort_values(["cluster_id", "doc_id"]).reset_index(drop=True)
    return out


def connected_components_distributed(
    edges: ray.data.Dataset,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    num_partitions: int | None = None,
    max_iters: int = 50,
) -> ray.data.Dataset:
    """Connected components over an edge DATASET — the scale path promised
    by ``connected_components``'s docstring, for when the verified-pair
    edge list itself no longer fits one machine.

    Pregel-style iterative min-label propagation on RAW RAY TASKS (the
    documented case for dropping below the Dataset API: an iterative
    algorithm with per-round partitioned state).  Edges are hash-routed
    ONCE by ``src % P`` — both directions are emitted, so a node's whole
    neighborhood is local to its partition — and labels stay co-partitioned
    in the object store.  Each round is then P local merge-joins (pandas,
    in-task) + one P×P message exchange of (dst, label) frames + P local
    min-merges; no per-round Dataset.join (whose hash-shuffle actor pool
    re-spins EVERY round — the previous design spent seconds per round on
    operator spin-up alone) and no per-round full-table sort.

    Labels are min-monotone, so the global label SUM strictly decreases
    until the fixed point; the convergence check is one int64 sum per
    round.  Rounds = graph diameter; ``max_iters`` guards pathological
    chains (raises rather than returning unconverged labels).  Driver
    holds only object refs: O(blocks × P + P²) per round, never edge or
    label payloads.

    Returns a Dataset of (doc_id, cluster_id := min id reachable), equal
    to ``connected_components`` on the same pairs."""
    import pyarrow.compute as pc

    def to_sym(t: pa.Table) -> pa.Table:
        a = pc.cast(t.column(a_col), pa.int64()).combine_chunks()
        b = pc.cast(t.column(b_col), pa.int64()).combine_chunks()
        return pa.table(
            {
                "src": pa.chunked_array([a, b]),
                "dst": pa.chunked_array([b, a]),
            }
        )

    sym = edges.map_batches(to_sym, batch_format="pyarrow", zero_copy_batch=True)
    blocks = [
        (ref, meta.num_rows)
        for bundle in sym.iter_internal_ref_bundles()
        for ref, meta in bundle.blocks
        if meta.num_rows
    ]
    block_refs = [r for r, _ in blocks]
    if num_partitions is None:
        # Scale the partition count with EDGE VOLUME (known for free from
        # block metadata): ~2M symmetric edge rows (~32 MB of int64 pairs)
        # per partition per round.  Tiny verified edge lists — the normal
        # case, near-dups are a sliver of the corpus — then run at P=1,
        # skipping the P×P exchange fan-out entirely, while huge edge
        # lists still spread state.
        total_sym_rows = sum(n for _, n in blocks)
        num_partitions = -(-total_sym_rows // 2_000_000)
    # P² message objects fly per round — cap the fan-out; the verified
    # edge list is a tiny fraction of the corpus, so 64 partitions bound
    # per-partition state long past the driver-overflow point.
    P = max(1, min(int(num_partitions), 64))
    if not block_refs:
        return ray.data.from_arrow(
            pa.table(
                {"doc_id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())}
            )
        )

    splits = [_cc_split.options(num_returns=P).remote(r, P) for r in block_refs]
    if P == 1:
        splits = [[s] for s in splits]
    edges_p = [_cc_concat.remote(*[s[i] for s in splits]) for i in range(P)]
    seeded = [
        _cc_seed.options(num_returns=2).remote(e) for e in edges_p
    ]
    labels_p = [s[0] for s in seeded]
    prev_sum = sum(ray.get([s[1] for s in seeded]))
    converged = False
    for _ in range(max_iters):
        outs = [
            _cc_msgs.options(num_returns=P).remote(edges_p[i], labels_p[i], P)
            for i in range(P)
        ]
        if P == 1:
            outs = [[o] for o in outs]
        merged = [
            _cc_merge.options(num_returns=2).remote(
                labels_p[j], *[outs[i][j] for i in range(P)]
            )
            for j in range(P)
        ]
        labels_p = [m[0] for m in merged]
        cur_sum = sum(ray.get([m[1] for m in merged]))
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # exhausting max_iters means the labels are NOT a fixed point —
        # returning them silently would hand back wrong clusters (e.g. a
        # duplicate chain with diameter > max_iters).  Fail loudly; the
        # caller can rerun with a higher budget.
        raise RuntimeError(
            f"connected_components_distributed did not converge within "
            f"max_iters={max_iters} rounds (graph diameter exceeds the "
            f"iteration budget); rerun with a larger max_iters"
        )
    return ray.data.from_arrow_refs(
        [_cc_out.remote(l) for l in labels_p]
    ).sort(["cluster_id", "doc_id"])  # label table is O(nodes-in-pairs), sort is cheap


_CC_EMPTY = pa.schema([("node", pa.int64()), ("label", pa.int64())])


@ray.remote
def _cc_split(block, P: int):
    """Route one symmetric edge block into P (src % P) sub-tables."""
    t = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
    src = t.column("src").to_numpy(zero_copy_only=False)
    gp = src % P
    order = np.argsort(gp, kind="stable")
    sorted_t = t.take(order)
    bounds = np.searchsorted(gp[order], np.arange(P + 1))
    out = tuple(
        sorted_t.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(P)
    )
    return out if P > 1 else out[0]


@ray.remote
def _cc_concat(*tables):
    ts = [t for t in tables if t.num_rows]
    if not ts:
        return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    return pa.concat_tables(ts).combine_chunks()


@ray.remote
def _cc_seed(edges_tbl: pa.Table):
    """Round 0 folded in: label(u) = min(u, min neighbor) — u's whole
    neighborhood is local (both edge directions were emitted)."""
    if not edges_tbl.num_rows:
        return _CC_EMPTY.empty_table(), 0
    df = edges_tbl.to_pandas()
    lab = df.groupby("src", sort=False)["dst"].min()
    node = lab.index.to_numpy(np.int64)
    label = np.minimum(node, lab.to_numpy(np.int64))
    return pa.table({"node": node, "label": label}), int(label.sum())


@ray.remote
def _cc_msgs(edges_tbl: pa.Table, labels_tbl: pa.Table, P: int):
    """One round's outgoing messages: for each local edge (src, dst) send
    label(src) to dst's partition, pre-grouped to per-target min."""
    if not edges_tbl.num_rows or not labels_tbl.num_rows:
        empties = tuple(_CC_EMPTY.empty_table() for _ in range(P))
        return empties if P > 1 else empties[0]
    e = edges_tbl.to_pandas()
    l = labels_tbl.to_pandas()
    m = e.merge(l, left_on="src", right_on="node", how="inner")
    # combine to per-dst min BEFORE shipping (message combiner)
    g = m.groupby("dst", sort=False)["label"].min()
    dst = g.index.to_numpy(np.int64)
    lb = g.to_numpy(np.int64)
    gp = dst % P
    order = np.argsort(gp, kind="stable")
    bounds = np.searchsorted(gp[order], np.arange(P + 1))
    dst, lb = dst[order], lb[order]
    out = tuple(
        pa.table(
            {
                "node": dst[bounds[i] : bounds[i + 1]],
                "label": lb[bounds[i] : bounds[i + 1]],
            }
        )
        for i in range(P)
    )
    return out if P > 1 else out[0]


@ray.remote
def _cc_merge(labels_tbl: pa.Table, *msg_tbls):
    """Fold incoming min-labels into the partition's label table."""
    frames = [labels_tbl.to_pandas()] + [
        t.to_pandas() for t in msg_tbls if t.num_rows
    ]
    allm = pd.concat(frames, ignore_index=True)
    g = allm.groupby("node", sort=False)["label"].min()
    node = g.index.to_numpy(np.int64)
    label = g.to_numpy(np.int64)
    return pa.table({"node": node, "label": label}), int(label.sum())


@ray.remote
def _cc_out(labels_tbl: pa.Table) -> pa.Table:
    return pa.table(
        {"doc_id": labels_tbl.column("node"), "cluster_id": labels_tbl.column("label")}
    )



# Losers up to this count travel as ONE sorted int64 broadcast (8 B each →
# ≤ 32 MB in plasma, read zero-copy by every filter task); above it the
# anti-join switches to the tagged-union key-hash exchange so no single
# object ever has to hold the loser set.
LOSER_BROADCAST_MAX = 4_000_000


def near_dedup_keep(
    docs: ray.data.Dataset,
    pairs: ray.data.Dataset,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
    loser_broadcast_max: int = LOSER_BROADCAST_MAX,
) -> ray.data.Dataset:
    """Near-duplicate REMOVAL: given verified near-dup ``pairs`` (from
    ``minhash_lsh_pairs`` / ``ngram_jaccard_pairs`` / the embedding
    family), keep exactly ONE representative per duplicate cluster — the
    min doc id, the same canonical-winner rule ``exact_dedup`` uses — and
    drop the rest from ``docs``.  This is the operator a user actually
    runs; the pair/cluster stages are its internals surfaced for audit.

    Shape: pairs → distributed min-label components (per-round state is
    partitioned, never driver-resident) → the LOSER id set (cluster
    members that are not their cluster's min).  Dup clusters are a sliver
    of any real corpus, so the normal path broadcasts the sorted loser
    ids once via ``ray.put`` and every batch filters with one
    ``np.searchsorted`` membership probe — zero shuffle of the corpus.
    If the loser count exceeds ``loser_broadcast_max`` (boilerplate-heavy
    crawls), it falls back to a tagged-union anti-join on ``id % P``
    partitions — the ``incremental_dedup`` exchange, corpus ships once.
    Reference analogue: the orphan anti-join idiom
    ``sql/etl_transformations.sql:200-210``."""
    import pyarrow.compute as pc

    clusters = connected_components_distributed(
        pairs, num_partitions=num_partitions
    )

    def losers_only(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t.column("doc_id"), t.column("cluster_id"))
        return pa.table({id_col: t.filter(keep).column("doc_id")})

    losers = clusters.map_batches(
        losers_only, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n_losers = losers.count()

    if n_losers <= loser_broadcast_max:
        loser_arr = np.sort(
            losers.to_pandas()[id_col].to_numpy(np.int64)
        ) if n_losers else np.empty(0, np.int64)
        ref = ray.put(loser_arr)

        def gate(t: pa.Table) -> pa.Table:
            arr = ray.get(ref)
            if arr.size == 0:
                return t
            ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(arr, ids)
            hit = (pos < arr.size) & (arr[np.minimum(pos, arr.size - 1)] == ids)
            return t.filter(pa.array(~hit))

        return docs.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)

    # Corpus-scale loser set: tagged-union anti-join, id-hash partitions.
    num_partitions = num_partitions or partitions_for_bytes(None)
    doc_cols = [c for c in docs.schema().names]

    def tag(side: int):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({id_col: df[id_col].to_numpy(np.int64)})
            out["_gp"] = out[id_col].to_numpy(np.int64) % num_partitions
            out["_side"] = np.int8(side)
            for c in doc_cols:
                if c != id_col:
                    out[c] = df[c].to_numpy() if side == 1 else None
            return out

        return f

    both = losers.map_batches(tag(0), batch_format="pandas").union(
        docs.map_batches(tag(1), batch_format="pandas")
    )

    def keep_part(g: pd.DataFrame) -> pd.DataFrame:
        bad = g.loc[g["_side"] == 0, id_col].to_numpy(np.int64)
        mine = g[g["_side"] == 1]
        return mine[~mine[id_col].isin(bad)][doc_cols]

    return both.groupby("_gp").map_groups(keep_part, batch_format="pandas")
