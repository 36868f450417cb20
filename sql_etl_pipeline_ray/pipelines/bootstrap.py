"""Initial snapshot bootstrap: seed an EMPTY lake from a full-table
snapshot, then stream the change log on top with ``replay(resume=True)``.

The standard CDC deployment story (Debezium's "initial snapshot", the
reference's full-extract-then-incremental split — ``src/etl_pipeline.py``'s
full run vs its stubbed watermark mode): a consistent read of the source
table is taken at some log position ``snapshot_lsn``, loaded in bulk, and
the binlog tail is applied from that position forward.  The bulk load is
NOT a replay — snapshot rows are final state already (unique keys, no
folding needed) — so this path skips the LWW merge entirely:

    read snapshot → one key-hash exchange → per-partition
    (verify unique keys, order by key, sha256) → exactly-once commit
    with checkpoint = snapshot_lsn

After bootstrap, every partition's manifest carries ``max_lsn =
snapshot_lsn``: a following ``replay(log_dir, out_dir, resume=True)``
prunes everything at/below the snapshot position (file-level via footer
stats, row-level via the checkpoint array) and folds only genuinely new
events against the snapshot state — the normal incremental path.

Snapshot LSN positions:

- If the snapshot carries an ``lsn`` column (per-row positions from the
  source's consistent read), rows keep it.  Positions must be ≤
  ``snapshot_lsn`` and unique per key partition (validated; the engine's
  unique-LSN contract is what makes resume's equal-LSN dedupe safe).
- Otherwise rows get synthetic positions: a partition-strided descent
  from the watermark (partition ``p``'s rows sit at ``snapshot_lsn - p -
  P*k`` in key order) — globally unique and ≤ ``snapshot_lsn`` by
  construction, but dependent on the partition layout (documented:
  synthetic positions are engine-assigned, not source positions).

Every partition 0..P-1 commits a manifest (empty partitions commit empty
state at the snapshot checkpoint) so the follow-up resume keeps
file-level pruning enabled — partial-manifest lakes disable it.
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
import ray
import ray.data

from ..config import SinkConfig
from ..hashing import key_hash, sha256_column, table_digest
from ..schemas import PART_COLUMN
from ..state import manifest as mf
from ..stages.exchange import run_exchange
from ..stages.merge import KEY_HASH_COL
from .replay import ReplayResult, _commit_with_metrics, output_schema_for

KEY_COLS = ["repo", "path"]


def _make_snapshot_router(num_partitions: int, has_lsn: bool):
    """Batch fn: trim keys, hash-route; provisional per-row ``lsn`` (the
    key hash) when the snapshot has none — the exchange's duplicate-feed
    spans are keyed on lsn values, so rows must carry SOMETHING unique and
    deterministic before finalize assigns real positions."""

    def route(batch: pa.Table) -> pa.Table:
        for col in KEY_COLS:
            idx = batch.schema.get_field_index(col)
            if idx < 0:
                raise ValueError(f"snapshot is missing key column {col!r}")
            arr = batch.column(col)
            if arr.null_count:
                raise ValueError(
                    f"snapshot has {arr.null_count} null {col!r} values — "
                    "a snapshot row must have a complete key"
                )
            batch = batch.set_column(
                idx,
                batch.schema.field(idx),
                pc.utf8_trim_whitespace(arr.cast(pa.string())),
            )
        kh = key_hash(batch.column("repo"), batch.column("path"))
        parts = (kh % np.uint64(num_partitions)).astype(np.int64)
        batch = batch.append_column(PART_COLUMN, pa.array(parts))
        batch = batch.append_column(KEY_HASH_COL, pa.array(kh.view(np.int64)))
        if not has_lsn:
            batch = batch.append_column("lsn", pa.array(kh.view(np.int64)))
        return batch

    return route


def _bootstrap_commit_fn(part: int, tbl: pa.Table, args: dict) -> dict[str, Any]:
    """Finalize one partition: unique-key check, key order, LSN positions,
    sha256, exactly-once commit at checkpoint = snapshot_lsn."""
    out_schema = pa.ipc.read_schema(pa.BufferReader(args["out_schema"]))
    snapshot_lsn = args["snapshot_lsn"]
    tbl = tbl.sort_by([(k, "ascending") for k in KEY_COLS])
    n = len(tbl)
    if n > 1:
        same = np.ones(n - 1, dtype=bool)
        for k in KEY_COLS:
            col = tbl.column(k).combine_chunks()
            same &= pc.equal(col.slice(1), col.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            )
        if same.any():
            dup_i = int(np.flatnonzero(same)[0])
            raise ValueError(
                f"partition {part}: snapshot has {int(same.sum())} duplicate "
                f"key(s), e.g. ({tbl.column('repo')[dup_i]}, "
                f"{tbl.column('path')[dup_i]}) — a consistent snapshot has "
                "exactly one row per key"
            )
    if args["has_lsn"]:
        lsn = tbl.column("lsn").cast(pa.int64())
        lsn_np = lsn.to_numpy(zero_copy_only=False)
        if n and int(lsn_np.max()) > snapshot_lsn:
            raise ValueError(
                f"partition {part}: snapshot row lsn {int(lsn_np.max())} "
                f"exceeds snapshot_lsn={snapshot_lsn} — positions must be "
                "at/below the snapshot watermark"
            )
        if len(np.unique(lsn_np)) != n:
            raise ValueError(
                f"partition {part}: duplicate snapshot lsn positions "
                "(the unique-LSN contract is what keeps resume exact)"
            )
    else:
        # globally unique synthetic positions ≤ snapshot_lsn: partition-
        # strided descent from the watermark (partition p's rows occupy
        # snapshot_lsn - p, snapshot_lsn - p - P, ... in key order), so no
        # two rows anywhere share a position
        P = args["num_partitions"]
        lsn = pa.array(
            snapshot_lsn - part - P * np.arange(n - 1, -1, -1, dtype=np.int64),
            pa.int64(),
        )
    i = tbl.schema.get_field_index("lsn")
    tbl = tbl.set_column(i, pa.field("lsn", pa.int64(), nullable=False), lsn)
    tbl = tbl.append_column("content_sha256", sha256_column(tbl.column("content")))
    arrays = []
    for field in out_schema:
        if field.name == "op":
            arrays.append(pa.array(["I"] * n, pa.string()))
        elif field.name in tbl.column_names:
            arrays.append(tbl.column(field.name).cast(field.type))
        else:
            arrays.append(pa.nulls(n, field.type))
    final = pa.Table.from_arrays(arrays, schema=out_schema)
    stats = {
        "events_in": 0,
        "keys_seen": n,
        "deleted_keys": 0,
        "orphan_events_applied": 0,
        "orphan_deletes": 0,
        # checkpoint semantics: this partition has applied EVERYTHING at or
        # below the snapshot watermark (that is the snapshot's contract),
        # so resume prunes the already-snapshotted log prefix
        "max_lsn": int(args["snapshot_lsn"]),
        "min_lsn": int(lsn[0].as_py()) if n else -1,
        "live_rows": n,
        "state_rows": n,
        "snapshot_rows": n,
    }
    return _commit_with_metrics(part, final, stats, args)


def bootstrap_snapshot(
    snapshot: str | ray.data.Dataset,
    out_dir: str,
    snapshot_lsn: int,
    num_partitions: int = 16,
    sink: SinkConfig | None = None,
) -> ReplayResult:
    """Bulk-load a consistent snapshot into an EMPTY lake at position
    ``snapshot_lsn``; follow with ``replay(log_dir, out_dir, resume=True)``
    to stream changes from that position forward.

    ``snapshot``: a Parquet path or a Dataset with at least the key
    columns (``repo``, ``path``); ``commit``/``lang``/``content`` and any
    extra columns are carried through (extras become evolved lake
    columns).  An optional ``lsn`` column supplies per-row source
    positions (≤ ``snapshot_lsn``, unique); otherwise synthetic positions
    are assigned.
    """
    t0 = time.time()
    if mf.read_all_manifests(out_dir):
        raise ValueError(
            f"lake at {out_dir} already has committed state — bootstrap "
            "seeds an EMPTY lake; use replay(resume=True) to apply changes "
            "to an existing one"
        )
    sink = sink or SinkConfig(out_dir=out_dir)
    if sink.out_dir != out_dir:
        raise ValueError(
            f"sink.out_dir={sink.out_dir!r} disagrees with out_dir={out_dir!r}"
        )
    ds = (
        ray.data.read_parquet(snapshot)
        if isinstance(snapshot, str)
        else snapshot
    )
    snap_schema = ds.schema().base_schema
    has_lsn = "lsn" in snap_schema.names
    # lake schema: snapshot columns in event order + op (tombstone lakes)
    # + extras — same derivation replay uses, so the follow-up resume sees
    # an identical layout
    event_fields = [pa.field("lsn", pa.int64(), nullable=False)]
    event_fields.append(pa.field("op", pa.string(), nullable=False))
    for f in snap_schema:
        if f.name not in ("lsn", "op"):
            event_fields.append(f)
    out_schema = output_schema_for(
        pa.schema(event_fields), keep_op=sink.keep_tombstones
    )

    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    num_actors = max(1, min(num_partitions, ncpu))
    commit_args = {
        "out_schema": out_schema.serialize().to_pybytes(),
        "sink_dir": out_dir,
        "prior_manifests": {},
        "prior_epochs": {},
        "num_partitions": num_partitions,
        "compression": sink.compression,
        "cluster_by_key": sink.cluster_by_key,
        "keep_epochs": sink.keep_epochs,
        "keep_tombstones": sink.keep_tombstones,
        "snapshot_lsn": int(snapshot_lsn),
        "has_lsn": has_lsn,
    }
    metrics_rows = run_exchange(
        ds,
        _make_snapshot_router(num_partitions, has_lsn),
        _bootstrap_commit_fn,
        commit_args,
        num_partitions,
        num_actors,
        batch_size=None,
    )
    # empty partitions still need a committed checkpoint at snapshot_lsn:
    # the follow-up resume's file-level pruning requires EVERY partition
    # to have one, and new keys hashing there must see lsn > snapshot_lsn
    committed = {r["part"] for r in metrics_rows}
    empty = out_schema.empty_table()
    for part in range(num_partitions):
        if part not in committed:
            stats = {
                "events_in": 0, "keys_seen": 0, "deleted_keys": 0,
                "orphan_events_applied": 0, "orphan_deletes": 0,
                "max_lsn": int(snapshot_lsn), "min_lsn": -1,
                "live_rows": 0, "state_rows": 0, "snapshot_rows": 0,
            }
            metrics_rows.append(
                _commit_with_metrics(part, empty, stats, commit_args)
            )
    metrics = pd.DataFrame(metrics_rows)
    summary = {
        "mode": "bootstrap",
        "snapshot_lsn": int(snapshot_lsn),
        "partitions_committed": len(metrics),
        "snapshot_rows": int(metrics["live_rows"].sum()),
        "live_rows": int(metrics["live_rows"].sum()),
        "duration_s": round(time.time() - t0, 4),
        "num_partitions": num_partitions,
    }
    os.makedirs(out_dir, exist_ok=True)
    summary["log_hwm"] = mf.write_log_hwm(out_dir, int(snapshot_lsn))
    with open(os.path.join(out_dir, "run_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    return ReplayResult(metrics=metrics, summary=summary)
