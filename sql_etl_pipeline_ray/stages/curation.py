"""Corpus-curation operators a training-data pipeline runs LAST, after
dedup/quality filtering: deterministic train/val/test splitting, a
deterministic global shuffle, and token-budget sequence packing (the
concat-and-chunk layout GPT-style pretraining uses).

All three are pure functions of the data — seeded integer hash coins and
exact integer prefix sums, never ``random_sample``/``random_shuffle`` —
so retries, re-runs and any partitioning give bit-identical results, and
each carries an exact DuckDB oracle in ``__ray_entry__``.

Scale notes:
- split: embarrassingly parallel map, zero shuffle.
- shuffle: one range-partitioned sort on an 8-byte key (the canonical
  Ray Data ``sort``); at 100 TB you'd write one file per ``shard`` so
  the output is resumable per shard.
- packing: a distributed prefix sum — coarse per-bucket token totals
  (tiny groupby) → driver exclusive-prefix over buckets (|buckets|
  rows) → per-bucket vectorized cumsum (``map_groups``).  No global
  sort, no driver materialization of the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

# odd 64-bit multipliers → bijective mod 2^64 (a perfect, tie-free
# pseudo-random permutation of the id space); wrap-around multiply is
# numpy uint64 semantics and HUGEINT-% in the SQL oracle.  Ids must stay
# below 2^63 for the oracle's single HUGEINT multiply — any realistic
# doc_id is.
_SPLIT_MULT = np.uint64(0x9E3779B97F4A7C15)
_SHUFFLE_MULT = np.uint64(0xBF58476D1CE4E5B9)


def split_of_ids(
    ids: np.ndarray, val_pct: int = 10, test_pct: int = 10
) -> np.ndarray:
    """Vectorized split assignment for int ids: ``bucket = (id * GOLDEN)
    mod 2^64 mod 10000`` with integer-threshold cuts.  Shared by
    ``train_val_test_split`` and the composed curation pipeline so the
    coin has one definition (mirrored literally in the SQL oracles)."""
    bucket = (ids.astype(np.uint64) * _SPLIT_MULT) % np.uint64(10000)
    bucket = bucket.astype(np.int64)
    return np.where(
        bucket < test_pct * 100,
        "test",
        np.where(bucket < (test_pct + val_pct) * 100, "val", "train"),
    )


def train_val_test_split(
    docs: ray.data.Dataset,
    id_col: str = "doc_id",
    val_pct: int = 10,
    test_pct: int = 10,
) -> ray.data.Dataset:
    """Assign every row to train/val/test by a seeded integer hash coin
    (``split_of_ids``) — disjoint, exhaustive, stable across runs/retries/
    partitioning, and exactly replayable in SQL.  Percentages are whole
    points."""

    def assign(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        split = split_of_ids(ids, val_pct, test_pct)
        return pa.table(
            {
                id_col: t.column(id_col),
                "split": pa.array(split.tolist(), pa.string()),
            }
        )

    return docs.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def deterministic_shuffle(
    docs: ray.data.Dataset, id_col: str = "doc_id", num_shards: int = 256
) -> ray.data.Dataset:
    """Deterministic global shuffle: order by the bijective hash key
    ``(id * MIX) mod 2^64`` (stored signed int64; no ties because the
    multiplier is odd), with a ``shard`` = top byte of the key for
    resumable per-shard output.  Unlike ``Dataset.random_shuffle`` the
    permutation is a pure function of the ids — reruns, retries and the
    SQL oracle all agree on the exact order.  ``num_shards`` must be a
    power of two (the shard is a bit-slice of the key)."""
    if num_shards & (num_shards - 1) or num_shards <= 0:
        raise ValueError("num_shards must be a power of two")
    shard_shift = np.int64(64 - int(num_shards).bit_length() + 1)

    def key(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        k = (ids * _SHUFFLE_MULT).view(np.int64)  # signed view, order-defining
        shard = (k >> shard_shift) & np.int64(num_shards - 1)
        return pa.table(
            {id_col: t.column(id_col), "shuffle_key": k, "shard": shard}
        )

    return docs.map_batches(
        key, batch_format="pyarrow", zero_copy_batch=True
    ).sort("shuffle_key")


def chunk_documents(
    docs: ray.data.Dataset,
    chunk_tokens: int = 256,
    overlap: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Split long documents into fixed-token windows with overlap — the
    row-EXPANDING (flat-map) curation op: context-window chunking before
    embedding or packing.  Chunk count is the closed form
    ``1 + max(0, (n − C + stride − 1) // stride)`` with ``stride = C −
    overlap`` (pure integer arithmetic, floor division — identical in
    numpy and DuckDB), so the expansion is exactly SQL-replayable via a
    ``generate_series`` list comprehension.  Per-doc token slicing is
    inherent to the op (same cost class as shingling); everything else is
    batch-vectorized."""
    stride = chunk_tokens - overlap

    def chunks(df: pd.DataFrame) -> pd.DataFrame:
        recs = []
        for doc_id, text in zip(df[id_col], df[text_col]):
            toks = (text or "").split(" ")
            n = len(toks)
            nch = 1 + max(0, (n - chunk_tokens + stride - 1) // stride)
            for i in range(nch):
                s = i * stride
                ct = toks[s : s + chunk_tokens]
                recs.append((doc_id, i, s, len(ct), " ".join(ct)))
        return pd.DataFrame(
            recs,
            columns=[id_col, "chunk_id", "start_tok", "n_tokens", "chunk_text"],
        ).astype(
            {id_col: np.int64, "chunk_id": np.int64, "start_tok": np.int64,
             "n_tokens": np.int64}
        )

    return docs.map_batches(chunks, batch_format="pandas")


def pack_sequences(
    docs: ray.data.Dataset,
    budget: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_size: int = 1024,
    part_col: str | None = None,
) -> ray.data.Dataset:
    """Concat-and-chunk sequence packing: lay all documents end-to-end in
    ``id_col`` order and cut the token stream every ``budget`` tokens;
    each doc reports its ``stream_offset`` and the ``seq_id`` (chunk) its
    first token lands in.  Token count = space-split field count,
    matching DuckDB ``len(string_split(text, ' '))``.  With ``part_col``
    the stream restarts per partition value (e.g. one token stream per
    train/val/test split) — the SQL twin's ``PARTITION BY``.

    The global offset is a distributed prefix sum BY KEY (no global
    sort): coarse per-bucket (``id // bucket_size``) token totals via a
    tiny groupby, exclusive prefix over the bucket totals on the driver
    (|buckets| integers), then a per-bucket vectorized cumsum in
    ``map_groups``.  Exact int64 arithmetic throughout — any partitioning
    yields identical offsets.  Size ``bucket_size`` so |buckets| =
    |docs| / bucket_size stays driver-sized (~10^6): at 10^11 docs use
    bucket_size ~10^5; the result is invariant to the choice."""
    from ray.data.aggregate import Sum

    parts = [part_col] if part_col else []

    def counts(t: pa.Table) -> pa.Table:
        s = pd.Series(t.column(text_col).to_pandas()).fillna("")
        n = (s.str.count(" ") + 1).to_numpy(np.int64)  # len(split(" "))
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {
            id_col: ids,
            "n_tokens": n,
            "bucket": ids // np.int64(bucket_size),
        }
        for p in parts:
            cols[p] = t.column(p)
        return pa.table(cols)

    toks = docs.map_batches(
        counts, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # consumed twice: bucket totals + per-bucket cumsum

    if toks.count() == 0:
        # a fully-filtered corpus is legal (e.g. a strict quality gate):
        # return the declared schema, not a KeyError from a column-less
        # empty aggregate frame
        schema = toks.schema()
        fields = [
            (id_col, pa.int64()),
            ("n_tokens", pa.int64()),
            ("stream_offset", pa.int64()),
            ("seq_id", pa.int64()),
        ] + [
            (p, schema.field(p).type if schema and p in schema.names else pa.string())
            for p in parts
        ]
        return ray.data.from_arrow(pa.schema(fields).empty_table())

    btot = (
        toks.groupby(parts + ["bucket"])
        .aggregate(Sum("n_tokens", alias_name="tot"))
        .to_pandas()
        .sort_values(parts + ["bucket"])
    )
    # exclusive prefix over bucket totals, restarting per part value
    # (transform keeps index alignment with btot's row order)
    excl = (
        btot.groupby(parts)["tot"].transform(
            lambda s: s.cumsum().shift(fill_value=0)
        )
        if parts
        else btot["tot"].cumsum().shift(fill_value=0)
    )
    keys = (
        list(zip(*([btot[p] for p in parts] + [btot["bucket"]])))
        if parts
        else btot["bucket"].tolist()
    )
    base = dict(zip(keys, np.asarray(excl, dtype=np.int64)))
    base_ref = ray.put(base)

    def within(g: pd.DataFrame) -> pd.DataFrame:
        k = (
            tuple(g[p].iloc[0] for p in parts) + (int(g["bucket"].iloc[0]),)
            if parts
            else int(g["bucket"].iloc[0])
        )
        off0 = ray.get(base_ref)[k]
        g = g.sort_values(id_col)
        n = g["n_tokens"].to_numpy(np.int64)
        start = off0 + np.cumsum(n) - n
        out = {
            id_col: g[id_col].to_numpy(np.int64),
            "n_tokens": n,
            "stream_offset": start,
            "seq_id": start // np.int64(budget),
        }
        for p in parts:
            out[p] = g[p].to_numpy()
        return pd.DataFrame(out)

    return (
        toks.groupby(parts + ["bucket"])
        .map_groups(within, batch_format="pandas")
        .sort(id_col)
    )


def token_budget_select(
    stats: ray.data.Dataset,
    budget_tokens: int,
    score_col: str = "quality_score",
    tokens_col: str = "token_count",
    id_col: str = "doc_id",
    bucket_size: int = 1024,
) -> ray.data.Dataset:
    """Keep the best documents until a GLOBAL token budget is spent:
    select rows in ``(score DESC, id ASC)`` order while the running sum
    of ``tokens_col`` stays ≤ ``budget_tokens`` — the standard curation
    step for hitting a pretraining token target, exactly the SQL window
    ``SUM(tokens) OVER (ORDER BY score DESC, id) <= budget``.

    No global sort.  Three bounded steps:

    1. Score histogram: per-batch partial ``(score, Σtokens)`` rows →
       one tiny groupby — shuffle is one 16-byte row per DISTINCT score
       (same bounded-histogram idiom as ``orders_value_percentiles``).
       The driver's descending cumsum over it finds the boundary score
       s*: everything above s* fits, nothing below it does.
    2. Rows with score > s* stream through a vectorized filter.
    3. Only the s* TIER needs ordered arithmetic: a distributed prefix
       sum by id-range buckets (the ``pack_sequences`` machinery —
       bucket totals, driver exclusive-prefix, per-bucket cumsum) gates
       the tier at the remaining budget.  Worst case (every doc the
       same score) the tier is the corpus, but each ``map_groups``
       group is still ≤ ``bucket_size`` docs.

    Scores are compared on an exact integer grid (score·10⁴ — callers
    pass 4-decimal-rounded scores, so distinct scores stay distinct),
    which keeps the boundary decision bit-stable across engines.
    ``stats`` should be the narrow (id, tokens, score) frame — tokens
    of text, not the text — so materializing it twice costs ~24 B/doc."""
    from ray.data.aggregate import Sum

    def keyed(t: pa.Table) -> pa.Table:
        sc = np.round(
            t.column(score_col).to_numpy(zero_copy_only=False) * 10000.0
        ).astype(np.int64)
        return t.append_column("score_int", pa.array(sc, pa.int64()))

    # narrow columns only; two passes below read this, not the corpus
    stats = stats.map_batches(keyed, batch_format="pyarrow").materialize()

    hist = (
        stats.groupby("score_int")
        .aggregate(Sum(tokens_col, alias_name="tok"))
        .to_pandas()  # one row per DISTINCT score — bounded histogram
        .sort_values("score_int", ascending=False)
    )
    if not len(hist):
        return stats.drop_columns(["score_int"])
    cum = hist["tok"].cumsum()
    fits = cum <= budget_tokens
    if fits.all():
        return stats.drop_columns(["score_int"])  # budget covers everything
    bi = int(np.argmin(fits.to_numpy()))  # first score tier that overflows
    s_star = int(hist["score_int"].iloc[bi])
    remaining = int(budget_tokens - (cum.iloc[bi - 1] if bi else 0))

    kept_above = stats.filter(
        expr=f"score_int > {s_star}"
    ).drop_columns(["score_int"])
    if remaining <= 0:
        return kept_above

    tier = stats.filter(expr=f"score_int == {s_star}")

    def bucketed(t: pa.Table) -> pa.Table:
        b = t.column(id_col).to_numpy() // np.int64(bucket_size)
        return t.append_column("bucket", pa.array(b, pa.int64()))

    tier = tier.map_batches(bucketed, batch_format="pyarrow")
    btot = (
        tier.groupby("bucket")
        .aggregate(Sum(tokens_col, alias_name="tot"))
        .to_pandas()
        .sort_values("bucket")
    )
    excl = btot["tot"].cumsum().shift(fill_value=0)
    base_ref = ray.put(
        dict(zip(btot["bucket"].tolist(), np.asarray(excl, np.int64)))
    )

    def gate(g: pd.DataFrame) -> pd.DataFrame:
        off0 = ray.get(base_ref)[int(g["bucket"].iloc[0])]
        g = g.sort_values(id_col)
        cumt = off0 + g[tokens_col].to_numpy(np.int64).cumsum()
        return g[cumt <= remaining].drop(columns=["bucket", "score_int"])

    tier_kept = tier.groupby("bucket").map_groups(gate, batch_format="pandas")
    return kept_above.union(tier_kept)
