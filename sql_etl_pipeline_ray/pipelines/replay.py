"""The headline pipeline: CDC change-log replay → lake upsert.

Physical plan (SURVEY.md §4):

    read_parquet(change_log, LSN-pruned)              # stateless tasks
      → map_batches(normalize+combine, pyarrow, zc)   # stateless tasks
      → groupby(_part).map_groups(partition_task)     # THE one shuffle
            sort by (key, lsn), fold last-writer-wins,
            merge prior committed state (resume),
            sha256, exactly-once parquet commit + manifest + metrics
      → tiny per-partition metrics table → run summary

The fold-and-commit happens INSIDE the per-partition task so each partition
commits atomically and independently (resumable output; a failed run skips
finished partitions).  The returned Dataset is only the small metrics
table, so nothing materializes the lake on the driver.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ..config import ReplayConfig, SinkConfig
from ..hashing import table_digest
from ..schemas import CHANGE_EVENT_SCHEMA, KEY_COLUMNS, PART_COLUMN, REPO_FILES_SCHEMA
from ..sources.change_log import LogScan, read_change_log, scan_change_log
from ..stages.merge import EVENTS_COL, HAD_INSERT_COL, finalize_partition
from ..stages.normalize import make_normalizer
from ..state import manifest as mf


def output_schema_for(event_schema: pa.Schema) -> pa.Schema:
    """Lake schema = REPO_FILES_SCHEMA with event-side widenings applied
    (e.g. lang → large_string) plus evolved extra columns appended."""
    canonical_event = {f.name for f in CHANGE_EVENT_SCHEMA}
    fields = []
    for f in REPO_FILES_SCHEMA:
        if f.name in event_schema.names and f.name not in ("lsn",):
            fields.append(pa.field(f.name, event_schema.field(f.name).type, f.nullable))
        else:
            fields.append(f)
    extras = [f for f in event_schema if f.name not in canonical_event]
    return pa.schema(fields + extras)


@dataclass
class ReplayResult:
    metrics: pd.DataFrame
    summary: dict[str, Any] = field(default_factory=dict)


def _prior_state_as_events(out_dir: str, part: int, m: dict, schema: pa.Schema) -> pa.Table:
    """Committed partition state → synthetic events for the merge fold.

    Rows re-enter as op='I' at their stored LSN (all ≤ checkpoint, so any
    newer event wins; a newer delete tombstones them).  ``_events=0`` keeps
    lineage counters counting only NEW events; ``_had_insert=True`` because
    committed rows were live."""
    tables = [
        pq.read_table(os.path.join(mf.partition_dir(out_dir, part), f)) for f in m["files"]
    ]
    prior = pa.concat_tables(tables, promote_options="permissive")
    n = len(prior)
    cols: dict[str, pa.ChunkedArray | pa.Array] = {}
    for f in schema:
        if f.name == "op":
            cols["op"] = pa.array(["I"] * n, pa.string())
        elif f.name in prior.column_names:
            col = prior.column(f.name)
            cols[f.name] = col.cast(f.type) if col.type != f.type else col
        else:
            cols[f.name] = pa.nulls(n, f.type)
    t = pa.table(cols)
    t = t.append_column(PART_COLUMN, pa.array([part] * n, pa.int64()))
    t = t.append_column(EVENTS_COL, pa.array([0] * n, pa.int64()))
    t = t.append_column(HAD_INSERT_COL, pa.array([True] * n))
    return t


def replay(
    log_dir: str,
    out_dir: str,
    cfg: ReplayConfig | None = None,
    sink: SinkConfig | None = None,
    resume: bool = False,
) -> ReplayResult:
    """Run a full or incremental (``resume=True``) replay.

    Full replay ignores prior lake state (fresh fold of the whole log) but
    still bumps epochs so commits atomically supersede old state.  Resume
    prunes events at/below each partition's checkpoint LSN and merges the
    committed state — the reference's incremental mode done right
    (``src/etl_pipeline.py:364-373`` + the stubbed watermark,
    ``:238-245``).
    """
    cfg = cfg or ReplayConfig()
    sink = sink or SinkConfig(out_dir=out_dir)
    t0 = time.time()

    manifests = mf.read_all_manifests(out_dir)
    ckpts = mf.checkpoints(manifests) if resume else None
    min_lsn = min(ckpts.values()) if ckpts else None
    extra_schemas = []
    if resume and manifests:
        for part, m in manifests.items():
            fields = [
                pa.field(name, _parse_type(tstr)) for name, tstr in m["schema_fingerprint"]
            ]
            extra_schemas.append(
                pa.schema([f for f in fields if f.name not in ("content_sha256",)])
            )

    scan = scan_change_log(log_dir, min_lsn=min_lsn, extra_schemas=extra_schemas)
    event_schema = scan.schema
    out_schema = output_schema_for(event_schema)

    normalizer = make_normalizer(
        event_schema,
        cfg.num_partitions,
        checkpoints=ckpts,
        combine=cfg.combine_before_shuffle,
    )

    resume_manifests = manifests if resume else {}
    prior_epochs = {part: m["epoch"] for part, m in manifests.items()}
    sink_dir, compression = sink.out_dir, sink.compression

    def partition_task(group: pa.Table) -> pa.Table:
        part = int(group.column(PART_COLUMN)[0].as_py())
        if part in resume_manifests:
            prior = _prior_state_as_events(
                sink_dir, part, resume_manifests[part], event_schema
            )
            group = pa.concat_tables([group, prior], promote_options="permissive")
        t_start = time.time()
        final, stats = finalize_partition(group, out_schema)
        digest = table_digest(final, list(KEY_COLUMNS))
        epoch = prior_epochs.get(part, -1) + 1
        m = mf.commit_partition(
            sink_dir, part, epoch, final, stats, digest, compression=compression
        )
        metrics = {
            **stats,
            "part": part,
            "epoch": epoch,
            "duration_s": round(time.time() - t_start, 4),
            "bytes_written": os.path.getsize(
                os.path.join(mf.partition_dir(sink_dir, part), m["files"][0])
            ),
        }
        mf.write_metrics(sink_dir, part, metrics)
        return pa.Table.from_pylist([metrics])

    ds = read_change_log(scan, concurrency=cfg.read_concurrency)
    ds = ds.map_batches(
        normalizer,
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        zero_copy_batch=True,
    )
    metrics_rows = (
        ds.groupby(PART_COLUMN)
        .map_groups(partition_task, batch_format="pyarrow")
        .take_all()
    )
    metrics = pd.DataFrame(metrics_rows)

    summary = {
        "mode": "resume" if resume else "full",
        "files_scanned": len(scan.files),
        "files_pruned": scan.pruned_files,
        "partitions_committed": len(metrics),
        "partitions_skipped": len(resume_manifests) - len(
            set(metrics["part"]) & set(resume_manifests)
        )
        if len(metrics)
        else len(resume_manifests),
        "events_in": int(metrics["events_in"].sum()) if len(metrics) else 0,
        "live_rows": int(metrics["live_rows"].sum()) if len(metrics) else 0,
        "deleted_keys": int(metrics["deleted_keys"].sum()) if len(metrics) else 0,
        "orphan_events_applied": int(metrics["orphan_events_applied"].sum())
        if len(metrics)
        else 0,
        "orphan_deletes": int(metrics["orphan_deletes"].sum()) if len(metrics) else 0,
        "duration_s": round(time.time() - t0, 4),
        "num_partitions": cfg.num_partitions,
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "run_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    return ReplayResult(metrics=metrics, summary=summary)


def _parse_type(tstr: str) -> pa.DataType:
    simple = {
        "string": pa.string(),
        "large_string": pa.large_string(),
        "int64": pa.int64(),
        "int32": pa.int32(),
        "double": pa.float64(),
        "float": pa.float32(),
        "bool": pa.bool_(),
        "binary": pa.binary(),
        "large_binary": pa.large_binary(),
        "timestamp[us]": pa.timestamp("us"),
    }
    if tstr not in simple:
        raise ValueError(f"unsupported manifest type: {tstr}")
    return simple[tstr]


def read_lake(out_dir: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Read the committed lake (manifest-listed files ONLY)."""
    manifests = mf.read_all_manifests(out_dir)
    files = mf.manifest_data_files(out_dir, manifests)
    if not files:
        return ray.data.from_arrow(REPO_FILES_SCHEMA.empty_table())
    # partitioning=None: the part=K dirs are the sink's layout, not a hive
    # column — do not resurrect them into the schema.
    return ray.data.read_parquet(files, columns=columns, partitioning=None)


def lake_table(out_dir: str) -> pa.Table:
    """Driver-side Arrow view of the lake — small/test scales only."""
    manifests = mf.read_all_manifests(out_dir)
    files = mf.manifest_data_files(out_dir, manifests)
    if not files:
        return REPO_FILES_SCHEMA.empty_table()
    return pa.concat_tables(
        [pq.read_table(f) for f in files], promote_options="permissive"
    ).sort_by([(k, "ascending") for k in KEY_COLUMNS])
