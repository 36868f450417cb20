"""Aggregate-state ingest: a keyed ROLLUP lake maintained at replay time.

The LWW merge keeps each key's latest row; this pipeline keeps each key's
running AGGREGATE — events carry numeric deltas and the lake holds, per
(repo, path), the exact sum / min / max / count of every delta applied
plus the last applied LSN.  It is the reference's materialized-rollup
idea (``mv_monthly_sales``, ``sql/etl_transformations.sql:281-296``)
pushed to where a streaming CDC consumer actually maintains it: at
ingest, incrementally, exactly-once (the Kafka-Streams / rollup-ingestion
model — aggregates ARE the table, the raw events are never stored).

Semantics:

- ``op`` 'I'/'U': add the event's value columns into the key's aggregate
  (I vs U is not distinguished — addition has no insert/update split).
- ``op`` 'D': RESET — the key's accumulated state is discarded; the key
  is absent from the lake until a later event re-adds it.  Resets make
  the fold order-sensitive, so per-key LSN order decides which events
  survive (everything after the key's last reset), exactly like the LWW
  fold's pick-latest.
- Value columns are int64 deltas (exact at any scale — the engine's
  int-cents discipline; floats would drift under reordered partial sums
  and could never be oracle-exact).

Exactly-once matters MORE here than for LWW: re-applying an event is not
idempotent (sums double-count), so correctness leans directly on the
whole-partition-epoch manifests + per-partition checkpoint pruning — a
retried commit re-derives identical bytes, a resumed run prunes applied
LSNs, and a re-run of the same log is a no-op.  The double-replay test
pins this.

Scale shape: one key-hash exchange of NARROW rows (lsn, op code, key,
int64 deltas — there is no content column in a metrics stream), then a
per-partition vectorized fold: one sort, segment boundaries, reset
masking, ``np.add/minimum/maximum.reduceat`` — no per-key Python.  A
map-side combiner is deliberately ABSENT: with resets, a per-batch
partial over a non-contiguous LSN subset of a key is unsound (a later
batch's reset can land inside the combined span), and without resets the
rows are already ~40 B — the exchange ships less than the LWW pipeline's
phase 1 does per event.

Reference analogues: the upsert loader (``sql/etl_transformations.sql:9-38``)
for the keyed-commit shape; the monthly rollup (``:281-296``) for the
maintained-aggregate idea; COUNT/SUM/MIN/MAX grouped aggregates
(``src/sql_query_executor.py:85-99``) for the aggregate set.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from ..config import SinkConfig
from ..hashing import key_hash
from ..schemas import KEY_COLUMNS, PART_COLUMN
from ..sources.change_log import read_change_log, scan_change_log
from ..stages.exchange import run_exchange
from ..stages.merge import KEY_HASH_COL, _segment_last_mask
from ..state import manifest as mf
from .replay import ReplayResult, _commit_with_metrics

_OPS = pa.array(["I", "U", "D"])


def aggregate_schema(value_cols: list[str]) -> pa.Schema:
    fields = [
        pa.field("repo", pa.string(), nullable=False),
        pa.field("path", pa.string(), nullable=False),
    ]
    for c in value_cols:
        fields += [
            pa.field(f"{c}_sum", pa.int64()),
            pa.field(f"{c}_min", pa.int64()),
            pa.field(f"{c}_max", pa.int64()),
        ]
    fields += [
        pa.field("n_events", pa.int64(), nullable=False),
        pa.field("last_lsn", pa.int64(), nullable=False),
    ]
    return pa.schema(fields)


def _make_agg_router(
    num_partitions: int, value_cols: list[str], checkpoints: dict[int, int] | None
):
    """Normalize + route: trim keys, validate, int64-cast deltas, key-hash
    partition, checkpoint row prune.  Invalid events (bad op, null
    lsn/key, null delta on a non-reset) are dropped — the reference's
    warn-only validation flow (``src/etl_pipeline.py:163-167``); run the
    standalone validate audit for reject forensics."""
    ckpt_arr = None
    if checkpoints:
        ckpt_arr = np.full(num_partitions, -1, dtype=np.int64)
        for p, l in checkpoints.items():
            ckpt_arr[p] = l

    def route(batch: pa.Table) -> pa.Table:
        n = len(batch)
        valid = np.ones(n, dtype=bool)
        lsn = batch.column("lsn")
        valid &= pc.is_valid(lsn).to_numpy(zero_copy_only=False)
        op = batch.column("op")
        valid &= pc.fill_null(
            pc.is_in(op, value_set=_OPS), False
        ).to_numpy(zero_copy_only=False)
        for k in KEY_COLUMNS:
            col = batch.column(k)
            valid &= pc.is_valid(col).to_numpy(zero_copy_only=False)
        is_d = pc.fill_null(pc.equal(op, "D"), False).to_numpy(
            zero_copy_only=False
        )
        vals = {}
        for c in value_cols:
            col = batch.column(c).cast(pa.int64())
            # a reset's deltas are ignored; an add with a null delta is
            # invalid (there is nothing to add)
            valid &= (
                pc.is_valid(col).to_numpy(zero_copy_only=False) | is_d
            )
            vals[c] = col
        rejects = int(n - valid.sum())
        cols = {
            "lsn": lsn.cast(pa.int64()),
            "op": op,
            "repo": pc.utf8_trim_whitespace(batch.column("repo").cast(pa.string())),
            "path": pc.utf8_trim_whitespace(batch.column("path").cast(pa.string())),
        }
        for c in value_cols:
            cols[c] = pc.fill_null(vals[c], 0)
        out = pa.table(cols)
        if rejects:
            out = out.filter(pa.array(valid))
        kh = key_hash(out.column("repo"), out.column("path"))
        parts = (kh % np.uint64(num_partitions)).astype(np.int64)
        out = out.append_column(PART_COLUMN, pa.array(parts))
        out = out.append_column(KEY_HASH_COL, pa.array(kh.view(np.int64)))
        if ckpt_arr is not None and len(out):
            prt = out.column(PART_COLUMN).to_numpy(zero_copy_only=False)
            keep = out.column("lsn").to_numpy(zero_copy_only=False) > ckpt_arr[prt]
            if not keep.all():
                out = out.filter(pa.array(keep))
        return out

    return route


def _prior_as_rows(
    part: int, args: dict, value_cols: list[str]
) -> pa.Table | None:
    """Committed aggregate state as pseudo-event rows that fold with the
    increment: a state row contributes its stored sum/min/max/count at
    ``lsn = last_lsn`` (below every increment row by the watermark
    contract, so an increment reset correctly discards it)."""
    m = args["prior_manifests"].get(part)
    if m is None:
        return None
    pdir = mf.partition_dir(args["sink_dir"], part)
    tabs = [pq.read_table(os.path.join(pdir, f)) for f in m["files"]]
    prior = pa.concat_tables(tabs, promote_options="permissive")
    if len(prior) == 0:
        return None
    cols: dict[str, Any] = {
        "lsn": prior.column("last_lsn"),
        "op": pa.array(["I"] * len(prior)),
        "repo": prior.column("repo"),
        "path": prior.column("path"),
    }
    kh = key_hash(prior.column("repo"), prior.column("path"))
    n_ev = prior.column("n_events")
    contribs = {}
    for c in value_cols:
        contribs[f"{c}__sum"] = prior.column(f"{c}_sum")
        contribs[f"{c}__min"] = prior.column(f"{c}_min")
        contribs[f"{c}__max"] = prior.column(f"{c}_max")
    return pa.table(
        {
            **cols,
            **contribs,
            "__n": n_ev,
            KEY_HASH_COL: pa.array(kh.view(np.int64)),
        }
    )


def _agg_commit_fn(part: int, tbl: pa.Table, args: dict) -> dict[str, Any]:
    """Fold one partition: sort by (kh, key, lsn), mask everything at/
    below each key's last reset, segment-reduce, merge prior state,
    exactly-once commit."""
    value_cols = args["value_cols"]
    events_in = len(tbl)
    # widen raw events to contribution columns (sum=min=max=delta, n=1),
    # then append prior state rows (already in contribution form)
    if len(tbl):
        cols = {
            "lsn": tbl.column("lsn"),
            "op": tbl.column("op"),
            "repo": tbl.column("repo"),
            "path": tbl.column("path"),
        }
        for c in value_cols:
            v = tbl.column(c)
            cols[f"{c}__sum"] = v
            cols[f"{c}__min"] = v
            cols[f"{c}__max"] = v
        cols["__n"] = pa.array(np.ones(len(tbl), np.int64))
        cols[KEY_HASH_COL] = tbl.column(KEY_HASH_COL)
        wide = pa.table(cols)
    else:
        wide = None
    prior = _prior_as_rows(part, args, value_cols)
    state_rows = len(prior) if prior is not None else 0
    parts = [t for t in (wide, prior) if t is not None and len(t)]
    out_schema = pa.ipc.read_schema(pa.BufferReader(args["out_schema"]))
    if not parts:
        final = out_schema.empty_table()
        stats = _agg_stats(part, args, events_in, 0, 0, 0, tbl)
        return _commit_with_metrics(part, final, stats, args)
    merged = pa.concat_tables(parts, promote_options="permissive")
    merged = merged.sort_by(
        [(KEY_HASH_COL, "ascending")]
        + [(k, "ascending") for k in KEY_COLUMNS]
        + [("lsn", "ascending")]
    )
    n = len(merged)
    _, seg = _segment_last_mask(merged)
    pos = np.arange(n, dtype=np.int64)
    seg_starts = np.flatnonzero(np.concatenate(([True], seg[1:] != seg[:-1])))
    is_d = pc.equal(merged.column("op"), "D").to_numpy(zero_copy_only=False)
    dpos = np.where(is_d, pos, np.int64(-1))
    last_d = np.maximum.reduceat(dpos, seg_starts)
    keep = (pos > last_d[seg]) & ~is_d
    kept = merged.filter(pa.array(keep))
    k = len(kept)
    if k == 0:
        final = out_schema.empty_table()
        stats = _agg_stats(
            part, args, events_in, state_rows, 0, int((last_d >= 0).sum()), tbl
        )
        return _commit_with_metrics(part, final, stats, args)
    seg_k = seg[keep]
    starts_k = np.flatnonzero(np.concatenate(([True], seg_k[1:] != seg_k[:-1])))
    first_idx = np.flatnonzero(keep)[starts_k]
    counts = np.diff(np.append(starts_k, k))
    out_cols: dict[str, Any] = {
        "repo": merged.column("repo").take(pa.array(first_idx)),
        "path": merged.column("path").take(pa.array(first_idx)),
    }
    for c in value_cols:
        s = kept.column(f"{c}__sum").to_numpy(zero_copy_only=False)
        mn = kept.column(f"{c}__min").to_numpy(zero_copy_only=False)
        mx = kept.column(f"{c}__max").to_numpy(zero_copy_only=False)
        out_cols[f"{c}_sum"] = pa.array(np.add.reduceat(s, starts_k))
        out_cols[f"{c}_min"] = pa.array(np.minimum.reduceat(mn, starts_k))
        out_cols[f"{c}_max"] = pa.array(np.maximum.reduceat(mx, starts_k))
    nn = kept.column("__n").to_numpy(zero_copy_only=False)
    out_cols["n_events"] = pa.array(np.add.reduceat(nn, starts_k))
    lsn_k = kept.column("lsn").to_numpy(zero_copy_only=False)
    # within a segment rows are lsn-ascending → the group's last row
    ends_k = np.append(starts_k[1:], k) - 1
    out_cols["last_lsn"] = pa.array(lsn_k[ends_k])
    arrays = []
    for f in out_schema:
        col = out_cols[f.name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        arrays.append(col.cast(f.type))
    final = pa.Table.from_arrays(arrays, schema=out_schema)
    # keys whose last event is a reset vanish: segments with a reset that
    # have no surviving rows
    seg_with_d = np.unique(seg[is_d])
    seg_alive = np.unique(seg_k)
    reset_gone = int(len(np.setdiff1d(seg_with_d, seg_alive, assume_unique=True)))
    stats = _agg_stats(
        part, args, events_in, state_rows, len(final), reset_gone, tbl
    )
    return _commit_with_metrics(part, final, stats, args)


def _agg_stats(part, args, events_in, state_rows, live, deleted, tbl):
    lsn_max = -1
    lsn_min = -1
    if len(tbl):
        lv = tbl.column("lsn").to_numpy(zero_copy_only=False)
        lsn_max, lsn_min = int(lv.max()), int(lv.min())
    prior_m = args["prior_manifests"].get(part)
    if prior_m is not None:
        lsn_max = max(lsn_max, int(prior_m["max_lsn"]))
    return {
        "events_in": int(events_in),
        "keys_seen": int(live),
        "deleted_keys": int(deleted),
        "orphan_events_applied": 0,
        "orphan_deletes": 0,
        "max_lsn": int(lsn_max),
        "min_lsn": int(lsn_min),
        "live_rows": int(live),
        "state_rows": int(state_rows),
        "mode": "aggregate",
    }


def replay_aggregate(
    log_dir: str,
    out_dir: str,
    value_cols: list[str],
    num_partitions: int | None = None,
    resume: bool = False,
    sink: SinkConfig | None = None,
) -> ReplayResult:
    """Replay a metrics change log into a keyed aggregate lake.

    Full run folds the whole log; ``resume=True`` prunes events at/below
    each partition's checkpoint and merges the committed aggregates (the
    associative ⊕; an increment reset discards prior state exactly like a
    late D discards earlier adds).  Deterministic fold + manifest CAS ⇒
    a retried/re-run commit is byte-identical (exactly-once, which
    ADDITIVE state strictly requires — double-applying is not idempotent
    the way pick-latest is)."""
    t0 = time.time()
    sink = sink or SinkConfig(out_dir=out_dir)
    if sink.out_dir != out_dir:
        raise ValueError(
            f"sink.out_dir={sink.out_dir!r} disagrees with out_dir={out_dir!r}"
        )
    if sink.keep_tombstones or sink.merge_on_read:
        raise ValueError(
            "aggregate lakes support neither keep_tombstones nor "
            "merge_on_read (state is a rollup, not row versions)"
        )
    manifests = mf.read_all_manifests(out_dir)
    if not resume and manifests:
        # a FULL aggregate replay over an existing lake would double-count
        # every already-applied event — refuse (LWW can afford a fresh
        # fold; addition cannot)
        raise ValueError(
            f"aggregate lake at {out_dir} has committed state; re-running "
            "without resume would double-count. Pass resume=True (or point "
            "at a fresh out_dir)."
        )
    ckpts = mf.checkpoints(manifests) if resume else None
    min_lsn = None
    if ckpts:
        width = next(iter(manifests.values()))["stats"].get(
            "num_partitions", max(manifests) + 1
        )
        if len(ckpts) >= width:
            min_lsn = min(ckpts.values())
    scan = scan_change_log(log_dir, min_lsn=min_lsn)
    for c in value_cols:
        if c not in scan.schema.names:
            raise ValueError(
                f"value column {c!r} not found in the change log "
                f"(schema: {scan.schema.names})"
            )
    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    if resume and manifests:
        num_partitions = next(iter(manifests.values()))["stats"].get(
            "num_partitions", max(manifests) + 1
        )
    else:
        num_partitions = num_partitions or max(
            ncpu, scan.total_bytes // (256 << 20)
        )
    num_actors = max(1, min(num_partitions, ncpu))
    num_blocks = max(4 * ncpu, scan.total_bytes // (64 << 20))
    out_schema = aggregate_schema(value_cols)
    commit_args = {
        "out_schema": out_schema.serialize().to_pybytes(),
        "sink_dir": out_dir,
        "prior_manifests": manifests if resume else {},
        "prior_epochs": {p: m["epoch"] for p, m in manifests.items()},
        "num_partitions": num_partitions,
        "compression": sink.compression,
        "cluster_by_key": sink.cluster_by_key,
        "keep_epochs": sink.keep_epochs,
        "keep_tombstones": False,
        "value_cols": list(value_cols),
    }
    ds = read_change_log(scan, num_blocks=num_blocks)
    router = _make_agg_router(num_partitions, list(value_cols), ckpts)
    metrics_rows = run_exchange(
        ds, router, _agg_commit_fn, commit_args, num_partitions, num_actors,
        batch_size=None,
    )
    metrics = pd.DataFrame(metrics_rows)
    summary = {
        "mode": "aggregate",
        "events_in": int(metrics["events_in"].sum()) if len(metrics) else 0,
        "live_rows": int(metrics["live_rows"].sum()) if len(metrics) else 0,
        "partitions_committed": len(metrics),
        "num_partitions": num_partitions,
        "value_cols": list(value_cols),
        "duration_s": round(time.time() - t0, 4),
    }
    os.makedirs(out_dir, exist_ok=True)
    if scan.max_lsn >= 0:
        summary["log_hwm"] = mf.write_log_hwm(out_dir, int(scan.max_lsn))
    with open(os.path.join(out_dir, "run_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    return ReplayResult(metrics=metrics, summary=summary)
