"""Transaction-consistent multi-table CDC replay.

The reference is a MULTI-table pipeline — its ETL loop walks five source
tables (``src/etl_pipeline.py:66-72``) and its upserts target four DW
tables with foreign keys between them (``sql/etl_transformations.sql:9-193``,
fact rows resolving dim surrogate keys at ``:151-152``).  A single-table
replay cannot give its users the property the DW relies on: readers see a
FK-consistent view (an order's customer row exists and is at least as new
as the order).  This module adds that property to the engine, the way a
log-based CDC consumer gets it in the wild (the Debezium transaction-
metadata model, public docs): one multiplexed WAL carries every table's
events, each stamped with the transaction that produced it, and consumers
(a) never apply half a transaction and (b) expose new state to readers
only at transaction-aligned, all-tables-at-once snapshots.

Feed contract (two extra columns on the normal change-event schema —
schema unification already treats them as evolved extras, so the same
Parquet scan machinery applies):

- ``tbl``  (string)  — which logical table the event belongs to.
- ``txn``  (int64)   — commit-ordered transaction id, NONDECREASING in
  ``lsn`` (WAL order: a transaction's events become visible at its commit
  record, so commits serialize and interleaving is impossible).  The
  demux VERIFIES this from footer stats and fails loudly when violated.

Pipeline = three composed pieces, each reusing the engine as-is:

1. **Transaction watermark** (``txn_watermark``): the highest transaction
   H that is provably COMPLETE in the log.  A WAL consumer cannot know the
   final transaction is complete until it sees the next commit record, so
   unsealed logs publish ``H = max(txn) - 1`` (one-transaction lag — the
   same reason real consumers hold the tail); ``sealed=True`` declares the
   producer closed the log cleanly and publishes everything.  Computed
   from Parquet footer statistics; only row groups STRADDLING the boundary
   decode (two narrow columns of the tail groups).

2. **Demux at the edge** (``demux_txn_log``): one Ray task per log bucket
   splits rows with ``txn <= H`` into per-table LSN-bucketed Parquet
   staging — the ``sources/textlog.py`` convert-once pattern (idempotent
   temp-write + atomic rename, complete buckets skipped on re-run).  The
   torn tail is re-demuxed when H advances; because ``txn`` is
   nondecreasing in ``lsn``, every newly admitted row has ``lsn`` above
   everything previously staged, so a replay that already consumed the old
   bucket resumes past it on the per-partition checkpoints untouched.

3. **Replay + atomic publish** (``replay_txn``): the standard ``replay``
   runs per table (each lake keeps its own manifests/checkpoints/deltas),
   then ONE snapshot file commits the cross-table state: a CAS'd
   ``snapshot-<seq>.json`` recording every table's per-partition epochs,
   and a pointer swapped by atomic rename.  Transactional readers
   (``read_txn_tables``) resolve tables through the pointer with
   EXACT-epoch pins (``read_lake(pinned_epochs=...)``) — a crash between
   table replays, or between replays and publish, leaves the pointer at
   the previous consistent snapshot, and commits made after a snapshot
   can never leak into reads of it (unlike an ``asof_epoch`` bound, which
   a lagging partition counter could satisfy with newer state).

Scale shape: the demux is one streaming map over the log (footer-pruned,
no shuffle — per-table ordering is inherited from the WAL); each table's
replay is the normal two-phase exchange; the publish is O(tables ×
partitions) metadata.  Nothing here adds a data-proportional driver step.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..config import ReplayConfig, SinkConfig
from ..state import manifest as mf
from ..state.manifest import _atomic_write_bytes, _create_exclusive_bytes
from .replay import ReplayResult, read_lake, replay

DEMUX_MANIFEST = "_demux.json"
SNAPSHOT_POINTER = "_txn_snapshot.json"
_TBL_RE = re.compile(r"^[A-Za-z0-9_][A-Za-z0-9_.-]*$")


# ---------------------------------------------------------------------------
# transaction watermark
# ---------------------------------------------------------------------------


def _file_txn_stats(path: str) -> dict[str, Any]:
    """Footer-only per-file stats; straddling row groups resolved exactly
    by decoding just (lsn, txn) for those groups."""
    pf = pq.ParquetFile(path)
    sch = pf.schema_arrow
    if "txn" not in sch.names or "tbl" not in sch.names:
        raise ValueError(
            f"{path}: transactional replay needs 'tbl' and 'txn' columns "
            f"(got {sch.names})"
        )
    t_idx = sch.get_field_index("txn")
    l_idx = sch.get_field_index("lsn")
    groups = []
    for i in range(pf.metadata.num_row_groups):
        ts = pf.metadata.row_group(i).column(t_idx).statistics
        ls = pf.metadata.row_group(i).column(l_idx).statistics
        if ts is None or ls is None:
            groups.append(None)  # stats-less: decode this group
        else:
            groups.append((ts.min, ts.max, ls.min, ls.max))
    return {"path": path, "groups": groups}


def _boundary_from_stats(
    stats: list[dict[str, Any]], txn_hwm: int
) -> tuple[int, int]:
    """(publish_lsn, min_excluded_lsn) for ``txn <= txn_hwm``.

    Exact: row groups wholly inside/outside the boundary resolve from
    footer min/max; straddlers (and stats-less groups) decode two int64
    columns of just those groups."""
    publish_lsn = -1
    min_excl = None
    for st in stats:
        pf = None
        for i, g in enumerate(st["groups"]):
            if g is not None:
                tmin, tmax, lmin, lmax = g
                if tmax <= txn_hwm:
                    publish_lsn = max(publish_lsn, lmax)
                    continue
                if tmin > txn_hwm:
                    min_excl = lmin if min_excl is None else min(min_excl, lmin)
                    continue
            if pf is None:
                pf = pq.ParquetFile(st["path"])
            t = pf.read_row_group(i, columns=["lsn", "txn"])
            txn = t.column("txn").to_numpy()
            lsn = t.column("lsn").to_numpy()
            kept = lsn[txn <= txn_hwm]
            excl = lsn[txn > txn_hwm]
            if len(kept):
                publish_lsn = max(publish_lsn, int(kept.max()))
            if len(excl):
                m = int(excl.min())
                min_excl = m if min_excl is None else min(min_excl, m)
    return publish_lsn, (min_excl if min_excl is not None else -1)


def txn_watermark(log_dir: str, sealed: bool = False) -> dict[str, Any]:
    """The highest provably-complete transaction and its LSN boundary.

    Verifies the feed contract: every event of a transaction ``<= H`` must
    sit below every event of a transaction ``> H`` in LSN (txn
    nondecreasing in lsn).  A violation means the feed is not in WAL
    commit order and transaction atomicity cannot be guaranteed — raise
    rather than publish a torn snapshot."""
    import glob as _glob

    files = sorted(
        _glob.glob(os.path.join(log_dir, "**", "*.parquet"), recursive=True)
    )
    if not files:
        return {"txn_hwm": -1, "publish_lsn": -1, "max_txn": -1, "files": 0}
    stats = [_file_txn_stats(f) for f in files]
    max_txn = -1
    for st in stats:
        for i, g in enumerate(st["groups"]):
            if g is not None:
                max_txn = max(max_txn, g[1])
            else:
                t = pq.ParquetFile(st["path"]).read_row_group(i, columns=["txn"])
                if len(t):
                    max_txn = max(max_txn, int(t.column("txn").to_numpy().max()))
    txn_hwm = max_txn if sealed else max_txn - 1
    publish_lsn, min_excl = _boundary_from_stats(stats, txn_hwm)
    if min_excl != -1 and publish_lsn != -1 and min_excl <= publish_lsn:
        raise ValueError(
            f"log violates WAL commit order: an event of txn > {txn_hwm} at "
            f"lsn {min_excl} precedes an event of a complete txn at lsn "
            f"{publish_lsn}; txn must be nondecreasing in lsn"
        )
    return {
        "txn_hwm": int(txn_hwm),
        "publish_lsn": int(publish_lsn),
        "max_txn": int(max_txn),
        "files": len(files),
    }


# ---------------------------------------------------------------------------
# demux: multiplexed WAL → per-table staging
# ---------------------------------------------------------------------------


@ray.remote
def _demux_file(src: str, staging_root: str, rel_stem: str, txn_hwm: int) -> dict:
    """Split one log bucket into per-table staging buckets (txn <= hwm).

    Deterministic content per (src, txn_hwm) and atomic rename, so retries
    and re-runs overwrite with identical bytes — the textlog conversion
    contract.  Row order within a bucket is preserved from the WAL."""
    tbl = pq.read_table(src)
    txn = tbl.column("txn").to_numpy(zero_copy_only=False)
    capped = bool((txn > txn_hwm).any())
    kept = tbl.filter(pa.array(txn <= txn_hwm)) if capped else tbl
    tables: list[str] = []
    rows_kept = 0
    if len(kept) == 0:
        return {
            "tables": tables, "rows_in": len(tbl), "rows_kept": 0,
            "capped": capped,
        }
    names = kept.column("tbl").to_numpy(zero_copy_only=False)
    drop = [c for c in ("tbl", "txn") if c in kept.column_names]
    order = np.argsort(names, kind="stable")
    sorted_names = names[order]
    bounds = np.flatnonzero(
        np.r_[True, sorted_names[1:] != sorted_names[:-1], True]
    )
    for b0, b1 in zip(bounds[:-1], bounds[1:]):
        name = str(sorted_names[b0])
        if not _TBL_RE.match(name):
            raise ValueError(f"unsafe table name in log: {name!r}")
        idx = np.sort(order[b0:b1])  # WAL order within the table
        sub = kept.take(pa.array(idx)).drop_columns(drop)
        dst = os.path.join(staging_root, name, rel_stem + ".parquet")
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        tmp = dst + f".inprogress-{os.getpid()}"
        pq.write_table(sub, tmp, compression="zstd", row_group_size=128 * 1024)
        os.replace(tmp, dst)
        tables.append(name)
        rows_kept += len(sub)
    return {
        "tables": sorted(tables),
        "rows_in": len(tbl),
        "rows_kept": rows_kept,
        "capped": capped,
    }


def demux_txn_log(
    log_dir: str, staging_root: str, sealed: bool = False
) -> dict[str, Any]:
    """Incrementally split the multiplexed WAL into per-table staging logs.

    Idempotent and resumable via ``_demux.json``: a bucket already written
    complete (no rows held back) is skipped forever; a bucket that was
    CAPPED (held back a then-incomplete transaction) is re-demuxed when
    the watermark advances past it.  Safe for replays that already
    consumed the old bucket: admitted-late rows carry LSNs above
    everything previously staged (txn nondecreasing in lsn, verified), so
    checkpoint-based resume picks up exactly the new rows."""
    import glob as _glob

    wm = txn_watermark(log_dir, sealed=sealed)
    os.makedirs(staging_root, exist_ok=True)
    mpath = os.path.join(staging_root, DEMUX_MANIFEST)
    from ..state.commitstore import store_for

    state = {"files": {}}
    mb = store_for(mpath).get(mpath)
    if mb is not None:
        state = json.loads(mb)
    files = sorted(
        _glob.glob(os.path.join(log_dir, "**", "*.parquet"), recursive=True)
    )
    pending: list[tuple[str, Any]] = []
    skipped = 0
    for src in files:
        rel = os.path.relpath(src, log_dir)
        stem = os.path.splitext(rel)[0]
        rec = state["files"].get(rel)
        if rec is not None and (
            not rec["capped"] or rec["txn_hwm"] >= wm["txn_hwm"]
        ):
            skipped += 1
            continue
        pending.append(
            (rel, _demux_file.remote(src, staging_root, stem, wm["txn_hwm"]))
        )
    for rel, ref in pending:
        res = ray.get(ref)
        state["files"][rel] = {
            "capped": res["capped"],
            "txn_hwm": wm["txn_hwm"],
            "tables": res["tables"],
        }
    state["txn_hwm"] = wm["txn_hwm"]
    state["publish_lsn"] = wm["publish_lsn"]
    _atomic_write_bytes(mpath, json.dumps(state, indent=1).encode())
    tables = sorted({t for r in state["files"].values() for t in r["tables"]})
    return {
        **wm,
        "files_demuxed": len(pending),
        "files_skipped": skipped,
        "tables": tables,
        "staging_root": staging_root,
    }


# ---------------------------------------------------------------------------
# replay + atomic cross-table publish
# ---------------------------------------------------------------------------


def _table_lake_dir(out_root: str, tbl: str) -> str:
    return os.path.join(out_root, "tables", tbl)


def read_txn_snapshot(out_root: str) -> dict[str, Any] | None:
    from ..state.commitstore import store_for

    p = os.path.join(out_root, SNAPSHOT_POINTER)
    b = store_for(p).get(p)
    return None if b is None else json.loads(b)


def _publish(out_root: str, snapshot: dict[str, Any]) -> dict[str, Any]:
    """Commit the cross-table snapshot: CAS'd history file, then pointer.

    The exclusive-create on ``snapshot-<seq>.json`` serializes concurrent
    publishers exactly like the per-partition epoch CAS — a retry with
    identical content commits idempotently, a conflicting writer fails
    BEFORE the pointer can move (``state/manifest.py:commit_partition``'s
    two-step discipline)."""
    prev = read_txn_snapshot(out_root)
    seq = (prev["seq"] + 1) if prev else 0
    snapshot = {**snapshot, "seq": seq}
    payload = json.dumps(snapshot, indent=1, sort_keys=True).encode()
    hist = os.path.join(out_root, f"txn_snapshot-{seq}.json")
    if not _create_exclusive_bytes(hist, payload):
        from ..state.commitstore import store_for

        if store_for(hist).get(hist) != payload:
            raise mf.ConcurrentCommitError(
                f"txn snapshot seq {seq} was published by another writer "
                "with different content"
            )
    _atomic_write_bytes(os.path.join(out_root, SNAPSHOT_POINTER), payload)
    return snapshot


def row_count_guard(max_drop_frac: float = 0.5):
    """A stock WAP audit: refuse to publish when any table's row count
    collapsed versus the previous published snapshot (the classic
    fat-finger mass-delete gate).  Growth and small shrinkage pass;
    a table dropping below ``(1 - max_drop_frac)`` of its published
    count raises and the pointer never moves."""

    def audit(
        staged: dict[str, ray.data.Dataset],
        previous: dict[str, ray.data.Dataset] | None,
    ) -> None:
        if previous is None:
            return
        for tbl, ds in staged.items():
            if tbl not in previous:
                continue
            before = previous[tbl].count()
            after = ds.count()
            if before > 0 and after < before * (1.0 - max_drop_frac):
                raise ValueError(
                    f"audit failed: table {tbl!r} would shrink "
                    f"{before} → {after} rows (more than "
                    f"{max_drop_frac:.0%}); refusing to publish"
                )

    return audit


def replay_txn(
    log_dir: str,
    out_root: str,
    cfg: ReplayConfig | None = None,
    sealed: bool = False,
    keep_epochs: int = 2,
    sink_kwargs: dict[str, Any] | None = None,
    audit: Any | None = None,
) -> dict[str, Any]:
    """Demux → per-table replay → AUDIT → atomic cross-table publish.

    ``audit`` makes this a write-audit-publish (WAP) pipeline, the
    lakehouse staging pattern: after every table has committed its new
    epochs but BEFORE the snapshot pointer moves, ``audit(staged,
    previous)`` runs over the exact would-be-published state (pinned-epoch
    Datasets) and the currently-published state (None on the first
    publish).  An audit that raises aborts the publish — transactional
    readers stay on the previous snapshot; the staged epochs are not
    rolled back but simply never referenced, and the next successful run
    supersedes them (``keep_epochs`` GC sweeps their files).  Re-running
    after fixing the feed converges as usual.  ``row_count_guard`` is a
    stock audit; any callable with the same signature works (validation
    rules over the Datasets, fsck, referential checks between tables).

    Re-entrant end to end: the demux skips complete buckets, each table's
    replay resumes from its own checkpoints (first run = full replay), and
    the publish is a CAS.  A crash anywhere leaves transactional readers
    on the previous snapshot; re-running converges.

    ``keep_epochs`` defaults to 2 (not the sink's 1) because a published
    epoch must survive the NEXT replay's commits until the pointer moves —
    with 1, the new epoch's lazy GC would delete files the current
    snapshot still names.  Readers needing deeper history (several
    published snapshots back) raise it further."""
    if keep_epochs < 2:
        raise ValueError(
            "transactional lakes need keep_epochs >= 2: the published "
            "snapshot's files must survive the next replay's commit"
        )
    # Pin self-heal, BEFORE any table commits (and hence before any lazy
    # GC can run): a crash between _publish and the txn_snapshot pin
    # write below leaves the published epochs held only by
    # "txn_pending" — which THIS run overwrites with its own epochs
    # pre-publish.  Two unlucky crashes in a row and later commits' GC
    # could delete manifests the live published pointer still resolves.
    # Re-deriving the "txn_snapshot" pin from the published pointer
    # itself closes the window unconditionally: whatever the pointer
    # names is pinned, no matter where the previous run died.
    published = read_txn_snapshot(out_root)
    if published is not None:
        for tbl, pins in published.get("tables", {}).items():
            mf.write_gc_pins(
                _table_lake_dir(out_root, tbl), "txn_snapshot",
                {int(p): int(e) for p, e in pins.items()},
            )
    staging = os.path.join(out_root, "_staging")
    demux = demux_txn_log(log_dir, staging, sealed=sealed)

    def one_table(tbl: str) -> ReplayResult:
        lake = _table_lake_dir(out_root, tbl)
        resume = bool(mf.read_all_manifests(lake))
        sink = SinkConfig(
            out_dir=lake, keep_epochs=keep_epochs, **(sink_kwargs or {})
        )
        return replay(
            os.path.join(staging, tbl), lake, cfg, sink=sink, resume=resume
        )

    # Tables replay SEQUENTIALLY, deliberately: driver-thread-concurrent
    # Dataset executions were A/B'd on a 20M-event 4-table WAL at 32 cpus
    # (3 interleaved pairs) and measured SLOWER — par 20.4/20.7/22.9 s vs
    # seq 16.4/17.8/19.3 s for replays+publish.  Each replay's exchange
    # already saturates the cluster, so overlapping them just makes the
    # actor pools and the object store fight; the per-replay pipeline
    # floor is smaller than the contention cost.  A table failure aborts
    # the run BEFORE the publish step — crash consistency holds either
    # way, sequencing just makes the partial state simpler to reason
    # about (tables before the failure are committed-but-unpublished).
    results: dict[str, ReplayResult] = {
        t: one_table(t) for t in demux["tables"]
    }
    epochs: dict[str, dict[str, int]] = {
        tbl: {
            str(p): int(m["epoch"])
            for p, m in mf.read_all_manifests(_table_lake_dir(out_root, tbl)).items()
        }
        for tbl in demux["tables"]
    }
    if audit is not None:
        staged = {
            tbl: read_lake(
                _table_lake_dir(out_root, tbl),
                pinned_epochs={int(p): int(e) for p, e in pins.items()},
            )
            for tbl, pins in epochs.items()
        }
        previous = None
        if read_txn_snapshot(out_root) is not None:
            previous = read_txn_tables(out_root)
        audit(staged, previous)  # raises → pointer never moves
    # Reference-based retention: GC-pin the epochs this publish will
    # name BEFORE the pointer moves ("txn_pending"), then consolidate to
    # the "txn_snapshot" pin after.  Count-based keep_epochs alone is
    # not a guarantee — N consecutive committed-but-unpublished runs
    # (failed audits, crash-before-publish loops) advance partitions
    # past the window and lazy GC would delete manifests the published
    # pointer still resolves, breaking the "readers stay on the
    # previous snapshot" contract.  Crash anywhere in this sequence
    # only ever OVER-pins (released by the next successful publish).
    for tbl, pins in epochs.items():
        mf.write_gc_pins(
            _table_lake_dir(out_root, tbl), "txn_pending",
            {int(p): int(e) for p, e in pins.items()},
        )
    snapshot = _publish(
        out_root,
        {
            "txn_hwm": demux["txn_hwm"],
            "publish_lsn": demux["publish_lsn"],
            "tables": epochs,
        },
    )
    for tbl, pins in epochs.items():
        lake = _table_lake_dir(out_root, tbl)
        mf.write_gc_pins(
            lake, "txn_snapshot", {int(p): int(e) for p, e in pins.items()}
        )
        mf.write_gc_pins(lake, "txn_pending", None)
    return {
        "snapshot": snapshot,
        "demux": demux,
        "replays": {t: r.summary for t, r in results.items()},
    }


def read_txn_tables(
    out_root: str, tables: list[str] | None = None
) -> dict[str, ray.data.Dataset]:
    """Transaction-consistent read: every table exactly at the published
    snapshot's per-partition epochs.  Commits made after the publish (a
    replay in progress, a crashed run that got through some tables) are
    invisible by construction."""
    snap = read_txn_snapshot(out_root)
    if snap is None:
        raise ValueError(f"no transactional snapshot published under {out_root}")
    names = tables if tables is not None else sorted(snap["tables"])
    out: dict[str, ray.data.Dataset] = {}
    for tbl in names:
        if tbl not in snap["tables"]:
            raise ValueError(f"table {tbl!r} is not in the published snapshot")
        pins = {int(p): int(e) for p, e in snap["tables"][tbl].items()}
        out[tbl] = read_lake(_table_lake_dir(out_root, tbl), pinned_epochs=pins)
    return out
