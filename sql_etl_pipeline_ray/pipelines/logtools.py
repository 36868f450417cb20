"""Change-log maintenance tools: layout conversion + log compaction.

Two operations a long-lived CDC installation needs on the LOG itself
(the lake-side equivalents — compaction, GC, point reads — live in
``replay.py`` / ``state/manifest.py``):

- :func:`convert_log_to_sidestore` migrates an inline log to the content
  side-store layout (``sources/datagen.ChangeLogSpec.layout`` docs) so an
  existing feed can adopt phase-2 late materialization without
  re-emitting events.  One Ray task per log file (file count scales with
  data), idempotent (temp write → atomic rename, content derived purely
  from the input bytes).

- :func:`compact_change_log` rewrites a log keeping only each key's
  WINNING event — the Kafka-compacted-topic idea for bootstrap cost:
  a new consumer replays |keys| events instead of |history|.  Replaying
  the compacted log yields the exact final lake state of the original
  (delete winners are kept as tombstones by default so downstream state
  built from the full log still converges; drop them with
  ``keep_tombstones=False`` when every consumer bootstraps fresh).
  Winner selection is the same max-LSN-per-key rule the replay's LWW
  fold applies (ties impossible: LSNs are unique), computed as a
  map-side-combined :func:`~..stages.hashagg.hash_agg` over the narrow
  ``(repo, path, lsn)`` projection — content never enters the shuffle —
  followed by a winner-filtered second pass that writes surviving full
  rows.  The winner filter is the replay's own broadcast
  bitmap/searchsorted structure, built off-driver.

Reference analogue: the reference keeps staging tables trimmed with
batch DELETEs (``sql/etl_transformations.sql:246-258``); compaction is
that idea applied to the event stream itself.
"""

from __future__ import annotations

import glob
import os
import tempfile
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ..sources.change_log import read_change_log, scan_change_log
from ..sources.datagen import _CONTENT_RG_ROWS
from ..stages.hashagg import hash_agg
from .replay import _build_winner_filter_task, winner_membership


def _convert_one(src: str, meta_rg_rows: int, content_rg_rows: int) -> dict:
    """Rewrite one inline log file as meta + lsn-sorted content sibling."""
    t = pq.read_table(src)
    if "content_null" in t.column_names:
        return {"file": src, "skipped": True}  # already side-store
    content = t.column("content")
    meta = t.drop_columns(["content"]).append_column(
        "content_null", pc.is_null(content).combine_chunks()
    )
    side = (
        t.select(["lsn", "content"])
        .filter(pc.is_valid(content))
        .sort_by([("lsn", "ascending")])
    )
    sib = src[: -len(".parquet")] + ".content.parquet"
    # Sibling FIRST, meta second — the order is load-bearing: the meta
    # rename destroys the only inline copy of the content, so it must be
    # the LAST step.  A crash after the sibling lands leaves the inline
    # file plus a stray sibling, which the scan ignores (inline files
    # carry their own content) and a re-run overwrites.  The reverse
    # order loses every content byte of the file to a crash between the
    # two renames (meta in place, no sibling, inline bytes gone).
    for path, tbl, rg in ((sib, side, content_rg_rows), (src, meta, meta_rg_rows)):
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
        os.close(fd)
        pq.write_table(tbl, tmp, row_group_size=rg)
        os.replace(tmp, path)
    return {
        "file": src,
        "skipped": False,
        "events": len(t),
        "content_rows": len(side),
    }


def convert_log_to_sidestore(
    log_dir: str,
    meta_rg_rows: int = 131_072,
    content_rg_rows: int | None = None,
) -> dict[str, Any]:
    """Convert an inline log IN PLACE to the side-store layout.

    Per file: the meta replaces the original (same rows/order, content
    column swapped for the ``content_null`` marker) and the lsn-sorted
    content sibling appears next to it.  Atomic per file; a crash mid-run
    leaves a mixed log that every reader still handles (the scan treats
    inline and side-store files independently), and re-running converges
    (already-converted files are skipped).
    """
    files = sorted(
        f
        for f in glob.glob(
            os.path.join(log_dir, "**", "*.parquet"), recursive=True
        )
        if not f.endswith(".content.parquet")
    )
    crg = content_rg_rows or _CONTENT_RG_ROWS
    rows = (
        ray.data.from_items(
            [{"file": f} for f in files], override_num_blocks=max(1, len(files))
        )
        .map(lambda r: _convert_one(r["file"], meta_rg_rows, crg))
        .take_all()
    )
    return {
        "files_converted": sum(1 for r in rows if not r["skipped"]),
        "files_skipped": sum(1 for r in rows if r["skipped"]),
        "events": int(sum(r.get("events") or 0 for r in rows)),
    }


def compact_change_log(
    log_dir: str,
    out_dir: str,
    keep_tombstones: bool = True,
    num_partitions: int | None = None,
    overwrite: bool = False,
) -> dict[str, Any]:
    """Rewrite ``log_dir`` into ``out_dir`` keeping only winning events
    (see module docstring).  Returns event counts.

    Logs carrying op='P' partial updates are refused: a patch winner is
    only meaningful with its base + patch stack (the replay's
    ``_patch_winners`` set), so "one event per key" does not exist for
    them — replay to a lake and bootstrap from the snapshot instead.
    """
    scan = scan_change_log(log_dir)
    if scan.side_content:
        raise ValueError(
            "compact_change_log reads inline logs; convert AFTER compacting"
        )
    if os.path.isdir(out_dir) and os.listdir(out_dir):
        # write_parquet APPENDS — a silent re-run would duplicate every
        # winner row (harmless to the LWW replay, which dedupes
        # byte-identical equal-LSN rows, but it doubles the log and lies
        # about events_out).  Make the restart intent explicit.
        if not overwrite:
            raise ValueError(
                f"compaction output {out_dir} is not empty; pass "
                "overwrite=True to replace it (re-runs must not append)"
            )
        import shutil

        shutil.rmtree(out_dir)
    ds = read_change_log(scan)
    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    P = num_partitions or max(ncpu, scan.total_bytes // (256 << 20))

    narrow = ds.select_columns(["repo", "path", "lsn", "op"])
    if "P" in set(narrow.unique("op")):
        raise ValueError(
            "log contains op='P' partial updates; a compacted log cannot "
            "represent patch stacks — replay to a lake and use "
            "snapshot_bootstrap for new consumers instead"
        )
    # partition on path (high cardinality) — "repo" would funnel the hot
    # repo's keys into one partition
    win = hash_agg(
        narrow.select_columns(["repo", "path", "lsn"]),
        ["repo", "path"],
        {"win_lsn": ("lsn", "max")},
        int(P),
        part_key="path",
    )

    def lsn_only(t: pa.Table) -> pa.Table:
        arr = np.sort(t.column("win_lsn").to_numpy(zero_copy_only=False))
        return pa.table({"blob": [arr.tobytes()]})

    blobs = win.map_batches(
        lsn_only, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    arrays = [np.frombuffer(b["blob"], dtype=np.int64) for b in blobs]
    winners_ref = _build_winner_filter_task.remote(
        *[ray.put(np.sort(a)) for a in arrays]
    )
    ray.wait([winners_ref], num_returns=1)

    def keep_winners(t: pa.Table) -> pa.Table:
        payload = ray.get(winners_ref)
        hit = winner_membership(
            payload, t.column("lsn").to_numpy(zero_copy_only=False)
        )
        t = t.filter(pa.array(hit))
        if not keep_tombstones and len(t):
            t = t.filter(
                pc.invert(pc.equal(t.column("op").cast(pa.string()), "D"))
            )
        return t

    os.makedirs(out_dir, exist_ok=True)
    # the reader infers hive columns from the bucket directories
    # (lsn_bucket=k/); only real event columns belong in the output
    event_cols = [n for n in ds.schema().names if n in set(scan.schema.names)]
    compacted = ds.map_batches(
        keep_winners, batch_format="pyarrow", zero_copy_batch=True
    ).select_columns(event_cols)
    compacted.write_parquet(out_dir)
    n_out = scan_change_log(out_dir)
    return {
        "events_in": int(sum(sum(v) for v in (scan.row_groups or {}).values())),
        "events_out": int(sum(sum(v) for v in (n_out.row_groups or {}).values())),
        "num_partitions": int(P),
        "keep_tombstones": keep_tombstones,
    }


def _fsck_one(meta_file: str) -> dict:
    """Cross-check one meta file against its content sibling."""
    sib = meta_file[: -len(".parquet")] + ".content.parquet"
    out = {"file": meta_file, "errors": []}
    if not os.path.exists(sib):
        out["errors"].append("missing content sibling")
        return out
    m = pq.read_table(meta_file, columns=["lsn", "content_null"])
    # Phase-2 late materialization prunes sibling row groups by their
    # lsn column statistics; a group without them is fetched
    # unconditionally (replay._attach_side_content), which is correct
    # but defeats the layout — surface it so operators re-write the file.
    cmeta = pq.ParquetFile(sib)
    lsn_idx = cmeta.schema_arrow.get_field_index("lsn")
    statless = sum(
        1
        for i in range(cmeta.metadata.num_row_groups)
        if cmeta.metadata.row_group(i).column(lsn_idx).statistics is None
    )
    if statless:
        out["errors"].append(
            f"{statless} content row groups lack lsn statistics "
            "(late-materialization pruning disabled for them)"
        )
    c = pq.read_table(sib, columns=["lsn", "content"])
    clsn = c.column("lsn").to_numpy(zero_copy_only=False)
    if len(clsn) and not (clsn[1:] >= clsn[:-1]).all():
        out["errors"].append("content sibling not sorted by lsn")
        clsn = np.sort(clsn)
    if c.column("content").null_count:
        out["errors"].append(
            f"{c.column('content').null_count} null content rows in sibling"
        )
    need = m.filter(
        pc.invert(pc.fill_null(m.column("content_null"), True))
    ).column("lsn").to_numpy(zero_copy_only=False)
    pos = np.searchsorted(clsn, need)
    inb = pos < len(clsn)
    found = inb.copy()
    found[inb] = clsn[pos[inb]] == need[inb]
    missing = int((~found).sum())
    if missing:
        out["errors"].append(
            f"{missing} meta rows flag content present but the sibling "
            "has no row at their lsn"
        )
    # orphans (sibling rows no meta row references) are harmless for
    # replay but indicate writer drift — report, don't fail
    mlsn = np.sort(m.column("lsn").to_numpy(zero_copy_only=False))
    cpos = np.searchsorted(mlsn, clsn)
    cinb = cpos < len(mlsn)
    cfound = cinb.copy()
    cfound[cinb] = mlsn[cpos[cinb]] == clsn[cinb]
    out["orphan_content_rows"] = int((~cfound).sum())
    out["meta_rows"] = len(m)
    out["content_rows"] = len(c)
    return out


def fsck_sidestore_log(log_dir: str) -> dict[str, Any]:
    """Audit a side-store log: every meta row that claims content must
    resolve in its lsn-sorted sibling (the exact precondition phase-2
    late materialization relies on), siblings must be sorted and
    null-free.  One Ray task per meta file; returns an error report
    (``ok`` = no errors anywhere).  Inline files in a mixed log are
    skipped — they carry their own content."""
    scan = scan_change_log(log_dir)
    metas = sorted(scan.side_content or {})
    if not metas:
        return {"ok": True, "files_checked": 0, "errors": {}}
    rows = (
        ray.data.from_items(
            [{"file": f} for f in metas], override_num_blocks=len(metas)
        )
        .map(lambda r: {"res": _fsck_one(r["file"])})
        .take_all()
    )
    errors = {r["res"]["file"]: r["res"]["errors"] for r in rows if r["res"]["errors"]}
    return {
        "ok": not errors,
        "files_checked": len(metas),
        "errors": errors,
        "orphan_content_rows": int(
            sum(r["res"].get("orphan_content_rows") or 0 for r in rows)
        ),
    }
