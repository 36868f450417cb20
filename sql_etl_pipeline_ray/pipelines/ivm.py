"""Incremental view maintenance (IVM) over the lake changefeed.

The reference maintains derived analytics tables by full recompute
(``src/sql_query_executor.py`` re-runs every aggregate per call;
``docs/TECHNICAL_GUIDE.md`` documents a scheduled full refresh).  At
10^10-event scale a full recompute per refresh is the wrong cost model:
a derived table whose aggregates form an abelian group (count, sum —
anything with an inverse) can be maintained from the *changefeed* alone,
touching only the changed keys.

This module closes that loop with the classic IVM formulation:

    MV(to_epoch) = MV(from_epoch) ⊕ delta(changefeed(from→to))

where ``delta`` maps each change event to signed aggregate contributions
(I: +row, D: −old row, U: +new −old) and ⊕ is a groupby-sum.  The old
values come from ``lake_diff(..., include_before=True)`` — the
before/after-image feed (Debezium convention).

Everything is streaming Dataset ops: the changefeed is per-partition
(no shuffle), the delta is a per-batch partial aggregation, and ⊕ is one
small groupby over |distinct repos| rows.  Nothing driver-side scales
with the corpus.

The maintained view here — per-repo file count + total content bytes —
is the lake-native analogue of the reference's ``inventory`` rollups
(``src/sql_query_executor.py:390-401``: per-category counts and value
sums), chosen because both aggregates are invertible.  Non-invertible
aggregates (min/max, distinct) need the full-recompute path
(``pipelines/rollup.py``) — that split is the documented contract.
"""

from __future__ import annotations

import hashlib
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..config import ReplayConfig, SinkConfig
from ..state import manifest as mf
from .replay import lake_diff, read_lake, replay

# Aggregate column names shared by the full view, the delta, and the
# oracle SQL (driver compares by sorted column name).
MV_COLS = ["repo", "n_files", "total_bytes"]


def _finish(grouped: ray.data.Dataset) -> ray.data.Dataset:
    """groupby-sum output → canonical MV column names, live rows only."""

    def rename(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "repo": t.column("repo"),
                "n_files": t.column("sum(n_files)"),
                "total_bytes": t.column("sum(total_bytes)"),
            }
        )
        # a repo whose last file was deleted sums to zero rows — drop it,
        # matching what a recompute over the lake would produce
        return out.filter(pc.greater(out.column("n_files"), 0))

    return grouped.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def repo_stats(lake: ray.data.Dataset) -> ray.data.Dataset:
    """Full recompute of the view: per-repo live-file count + content bytes.

    Per-batch partial aggregation (|repos|-sized partials) before the
    groupby, so the shuffle moves partials, not rows."""

    def partial(t: pa.Table) -> pa.Table:
        lens = pc.cast(pc.binary_length(t.column("content")), pa.int64())
        g = pa.table(
            {
                "repo": t.column("repo"),
                "n_files": pa.array(np.ones(len(t), np.int64)),
                "total_bytes": pc.fill_null(lens, 0),
            }
        ).group_by("repo").aggregate([("n_files", "sum"), ("total_bytes", "sum")])
        return g.rename_columns(["repo", "n_files", "total_bytes"])

    partials = lake.select_columns(["repo", "content"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return _finish(
        partials.groupby("repo").sum(["n_files", "total_bytes"])
    )


def changefeed_delta(feed: ray.data.Dataset) -> ray.data.Dataset:
    """Before/after-image changefeed → signed per-repo aggregate deltas.

    Vectorized per batch: ops contribute (I: +1/+len, U: 0/len−prev_len,
    D: −1/−prev_len).  Output is |repos|-sized partials per batch, summed
    by ``apply_delta``'s groupby."""

    def partial(t: pa.Table) -> pa.Table:
        op = t.column("op").to_numpy(zero_copy_only=False)
        after = pc.fill_null(
            pc.cast(pc.binary_length(t.column("content")), pa.int64()), 0
        ).to_numpy(zero_copy_only=False)
        before = pc.fill_null(
            pc.cast(pc.binary_length(t.column("prev_content")), pa.int64()), 0
        ).to_numpy(zero_copy_only=False)
        has_new = op != "D"
        has_old = op != "I"
        g = pa.table(
            {
                "repo": t.column("repo"),
                "n_files": pa.array(
                    (op == "I").astype(np.int64) - (op == "D").astype(np.int64)
                ),
                "total_bytes": pa.array(
                    np.where(has_new, after, 0) - np.where(has_old, before, 0)
                ),
            }
        ).group_by("repo").aggregate([("n_files", "sum"), ("total_bytes", "sum")])
        return g.rename_columns(["repo", "n_files", "total_bytes"])

    return feed.select_columns(["op", "repo", "content", "prev_content"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )


def apply_delta(
    mv: ray.data.Dataset, delta: ray.data.Dataset
) -> ray.data.Dataset:
    """MV ⊕ delta: union the view rows (already group elements) with the
    signed deltas and groupby-sum.  One shuffle over ~|repos| rows."""
    return _finish(
        mv.select_columns(MV_COLS)
        .union(delta.select_columns(MV_COLS))
        .groupby("repo")
        .sum(["n_files", "total_bytes"])
    )


# ---------------------------------------------------------------------------
# End-to-end demo over the documents table (driver query + SQL oracle).
# ---------------------------------------------------------------------------


def _derive_two_phase_events(n_docs: int):
    """documents rows → change events with PHASED LSNs.

    Unlike the flagship layout (per-doc contiguous LSNs), phases are LSN
    bands so an LSN-prefix split leaves every key mid-life:

      I @ lsn =          doc_id + 1   content = text       (band 1)
      U @ lsn = n_docs + doc_id + 1   content = text [rev2] (band 2)
      D @ lsn = 2n    + doc_id + 1   only when doc_id % 10 == 0 (band 2)

    Replaying band 1, snapshotting, then resuming over band 2 yields a
    changefeed rich in U (every surviving doc) and D (every 10th) —
    exactly the feed shape IVM has to handle.  Final state matches the
    flagship: doc_id % 10 != 0 at [rev2] content."""

    def derive(batch: pa.Table) -> pa.Table:
        doc_id = batch.column("doc_id")
        ids = pc.cast(doc_id, pa.string())
        path = pc.binary_join_element_wise(
            pa.array(["doc_"] * len(batch)), ids, pa.array([".txt"] * len(batch)), ""
        )

        def ev(band, op, commit_prefix, content):
            n = len(batch)
            return pa.table(
                {
                    "lsn": pc.add(
                        doc_id, pa.scalar(band * n_docs + 1, pa.int64())
                    ),
                    "op": pa.array([op] * n, pa.string()),
                    "repo": batch.column("source"),
                    "path": path,
                    "commit": pc.binary_join_element_wise(
                        pa.array([commit_prefix] * n), ids, ""
                    ),
                    "lang": batch.column("lang"),
                    "content": content,
                }
            )

        inserts = ev(0, "I", "c1-", batch.column("text"))
        rev2 = pc.binary_join_element_wise(
            batch.column("text"), pa.array([" [rev2]"] * len(batch)), ""
        )
        updates = ev(1, "U", "c2-", rev2)
        ids_np = (
            doc_id.to_numpy()
            if isinstance(doc_id, pa.Array)
            else doc_id.combine_chunks().to_numpy()
        )
        del_mask = pa.array(ids_np % 10 == 0)
        deletes = ev(2, "D", "c2-", pa.nulls(len(batch), pa.string())).filter(
            del_mask
        )
        return pa.concat_tables([inserts, updates, deletes])

    return derive


def mv_repo_stats_incremental(
    sf_dir: str, work_dir: str | None = None, num_partitions: int = 16
) -> pd.DataFrame:
    """Two-epoch CDC → IVM demo over the driver's documents table.

    1. replay the insert band → lake snapshot at epoch E1; compute the
       view once (full recompute — the bootstrap).
    2. resume-replay the update/delete band → epoch E2 (keep_epochs=2 so
       E1 survives for the diff).
    3. ``lake_diff(E1→E2, include_before=True)`` → signed deltas →
       ``apply_delta`` — the view reaches E2 WITHOUT rereading the lake.

    Tests pin step-3's result equal to a full recompute at E2; the SQL
    oracle derives the same stats from ``documents`` directly."""
    tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
    work = work_dir or f"/tmp/cdc_ivm/{tag}"
    log_dir = os.path.join(work, "log")
    lake_dir = os.path.join(work, "lake")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source"],
    )
    # band stride must bound every doc_id (ids need not be contiguous)
    n_docs = int(docs.max("doc_id")) + 1
    events = docs.map_batches(
        _derive_two_phase_events(n_docs),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    split = n_docs  # band-1 (insert) LSNs are 1..n_docs

    def band(lo: int, hi: int | None):
        def keep(t: pa.Table) -> pa.Table:
            lsn = t.column("lsn")
            m = pc.greater(lsn, lo)
            if hi is not None:
                m = pc.and_(m, pc.less_equal(lsn, hi))
            return t.filter(m)

        return keep

    cfg = ReplayConfig(num_partitions=num_partitions)
    sink2 = SinkConfig(out_dir=lake_dir, keep_epochs=2)

    # phase A: inserts only → epoch E1
    events.map_batches(
        band(0, split), batch_format="pyarrow", zero_copy_batch=True
    ).write_parquet(os.path.join(log_dir, "band1"))
    replay(os.path.join(log_dir, "band1"), lake_dir, cfg)
    e1 = max(
        m["epoch"] for m in mf.read_all_manifests(lake_dir).values()
    )
    mv1 = repo_stats(read_lake(lake_dir))

    # phase B: updates + deletes land as new buckets → resume → epoch E2.
    # Band-2 LSNs all exceed every phase-A checkpoint, so resume pruning
    # passes them through; band-1 files are skipped by footer stats.
    events.map_batches(
        band(split, None), batch_format="pyarrow", zero_copy_batch=True
    ).write_parquet(os.path.join(log_dir, "band2"))
    replay(log_dir, lake_dir, cfg, sink=sink2, resume=True)

    feed = lake_diff(lake_dir, from_epoch=e1, include_before=True)
    mv2 = apply_delta(mv1, changefeed_delta(feed))
    return (
        mv2.to_pandas().sort_values("repo").reset_index(drop=True)
    )
