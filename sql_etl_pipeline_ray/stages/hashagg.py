"""Hash-partitioned exact aggregation (shared helper).

Ray's ``groupby(key).aggregate(...)`` sort-shuffles every row by the full
grouping key — a global sort per aggregate.  ``hash_agg`` exchanges rows
ONCE on ``hash(part_key) % num_partitions`` and aggregates inside each
partition with a pandas named-agg groupby (C hash aggregation, no global
sort).  Measured on the sf0.1 lineitem-per-partkey rollup: 4.1 s → 2.0 s
for the stage; Ray 2.49's HASH_SHUFFLE strategy measured 14 s on the same
stage (aggregator-actor overhead).

Exactness contract: callers keep money as int64 cents and counts as ints,
so per-partition accumulation order cannot change results; float columns
must be integer-valued or otherwise order-safe (callers document this).

``num_partitions`` must scale with input bytes (the ``_join_partitions``
pattern) — each partition materializes as one pandas frame in one task.

Partition-key hashing: int64/int32 keys partition as ``key % P`` (numpy
``%`` is non-negative for a positive modulus); string/other keys hash
through ``pd.util.hash_array`` (vectorized SipHash-like, stable within a
run) — both pure numpy/pandas per batch, no Python-per-row work.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

__all__ = ["hash_agg", "partition_ids"]


def partition_ids(col: pa.ChunkedArray | pa.Array, num_partitions: int) -> np.ndarray:
    """Vectorized partition id per row for an arrow column (int fast path,
    hashed fallback for strings/other types)."""
    if pa.types.is_integer(col.type):
        k = col.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        return (k % num_partitions).astype(np.int64)
    vals = col.to_pandas().to_numpy()
    h = pd.util.hash_array(vals, categorize=False)
    return (h % np.uint64(num_partitions)).astype(np.int64)


# fn -> (partial named-agg specs per out_col, merge fn per partial, finisher)
# sum/count/size merge by sum; min/max by min/max; mean decomposes to
# (sum, count) with one final division.  Everything else (nunique,
# first/last, quantiles, ...) is not decomposable into bounded partials
# and routes through the full-row exchange.
_DECOMPOSABLE = {"sum", "count", "size", "min", "max", "mean"}


def hash_agg(
    ds: ray.data.Dataset,
    keys: list[str],
    agg_spec: dict[str, tuple[str, str]],
    num_partitions: int,
    part_key: str | None = None,
    map_side_combine: bool = True,
) -> ray.data.Dataset:
    """One-exchange grouped aggregation; see module docstring.

    ``agg_spec`` is pandas named-agg form: ``{out_col: (in_col, fn)}``.
    ``part_key`` picks the partition column (default ``keys[0]``) — any
    grouping key works since the final grouping happens inside the
    partition, where every row of a key is co-located.

    ``map_side_combine`` (default on): when every aggregate decomposes
    (sum/count/size/min/max, mean via sum+count), each input BATCH
    pre-aggregates to one partial row per key before the exchange, and
    the partition-side merge folds partials.  The shuffle then carries
    O(keys × blocks) rows instead of O(rows) — on low-cardinality keys
    at cluster scale that is orders of magnitude less wire volume; the
    result is bit-identical under the module's exactness contract
    (int64-cent domains, so partial sums are exact and mean's single
    final division sees the same operands).  Non-decomposable specs
    fall back to the full-row exchange automatically."""
    pk = part_key or keys[0]
    fns = {fn for (_c, fn) in agg_spec.values()}
    if map_side_combine and fns <= _DECOMPOSABLE:
        return _hash_agg_combined(ds, keys, agg_spec, num_partitions, pk)

    def add_gp(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_gp", pa.array(partition_ids(t.column(pk), num_partitions))
        )

    def run(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns=["_gp"]).groupby(keys, sort=False).agg(**agg_spec)
        return out.reset_index()

    return (
        ds.map_batches(add_gp, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_gp")
        .map_groups(run, batch_format="pandas")
    )


def _hash_agg_combined(
    ds: ray.data.Dataset,
    keys: list[str],
    agg_spec: dict[str, tuple[str, str]],
    num_partitions: int,
    pk: str,
) -> ray.data.Dataset:
    """Partial-aggregate per batch, exchange partials, merge per
    partition (see ``hash_agg``).  Partial column naming: ``{out}__p``
    (single partial) or ``{out}__s``/``{out}__n`` (mean's sum+count)."""
    partial_spec: dict[str, tuple[str, str]] = {}
    merge_spec: dict[str, tuple[str, str]] = {}
    means: list[str] = []
    for out, (col, fn) in agg_spec.items():
        if fn == "mean":
            partial_spec[f"{out}__s"] = (col, "sum")
            partial_spec[f"{out}__n"] = (col, "count")
            merge_spec[f"{out}__s"] = (f"{out}__s", "sum")
            merge_spec[f"{out}__n"] = (f"{out}__n", "sum")
            means.append(out)
        else:
            partial_spec[f"{out}__p"] = (col, fn)
            merge = "sum" if fn in ("count", "size") else fn
            merge_spec[out] = (f"{out}__p", merge)

    def partial(t: pa.Table) -> pa.Table:
        # Adaptive per batch: a 4k-row probe estimates key density.  A
        # repeat-heavy batch pre-aggregates (the shuffle then carries
        # keys-per-block rows); a near-unique-key batch (measured: the
        # per-order rollup reduced 600k rows to 582k partials — all CPU,
        # no volume win) skips the groupby and re-expresses raw rows in
        # the partial SCHEMA (sum/min/max = value, count = is_valid,
        # size = 1) as zero-copy arrow column selection.  Both forms
        # merge identically downstream, so mixed batches are fine.
        import pyarrow.compute as pc

        probe = t.slice(0, 4096).select(keys)
        dense = (
            len(probe.group_by(keys).aggregate([])) <= 0.75 * len(probe)
            if len(probe)
            else False
        )
        if dense:
            out = (
                t.to_pandas()
                .groupby(keys, sort=False)
                .agg(**partial_spec)
                .reset_index()
            )
            out["_gp"] = partition_ids(
                pa.Array.from_pandas(out[pk]), num_partitions
            )
            return pa.Table.from_pandas(out, preserve_index=False)
        cols: dict[str, Any] = {k: t.column(k) for k in keys}
        for pname, (col, fn) in partial_spec.items():
            if fn in ("sum", "min", "max"):
                cols[pname] = t.column(col)
            elif fn == "count":
                c = t.column(col)
                cols[pname] = (
                    pc.cast(pc.is_valid(c), pa.int64())
                    if c.null_count
                    else pa.array(np.ones(len(t), dtype=np.int64))
                )
            else:  # size
                cols[pname] = pa.array(np.ones(len(t), dtype=np.int64))
        cols["_gp"] = pa.array(partition_ids(t.column(pk), num_partitions))
        return pa.table(cols)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.drop(columns=["_gp"])
            .groupby(keys, sort=False)
            .agg(**merge_spec)
            .reset_index()
        )
        for m in means:
            out[m] = out[f"{m}__s"] / out[f"{m}__n"]
            out = out.drop(columns=[f"{m}__s", f"{m}__n"])
        return out[keys + list(agg_spec)]

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_gp")
        .map_groups(merge, batch_format="pandas")
    )
