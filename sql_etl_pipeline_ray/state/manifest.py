"""Exactly-once Parquet sink state: per-partition manifests + checkpoints.

The reference's recovery story is "staging tables as recovery point" plus a
high-water-mark timestamp (``docs/TECHNICAL_GUIDE.md:62-66``,
``sql/etl_transformations.sql:235-258`` — designed but stubbed to full load
at ``src/etl_pipeline.py:238-245``).  We make it real:

- Each hash partition commits independently: data file written to a temp
  name then atomically ``os.replace``d, then a manifest JSON atomically
  ``os.replace``d.  Readers trust ONLY manifest-listed files; orphan temp
  files from failed attempts are ignored and cleaned lazily.
- The manifest records ``max_lsn`` — the per-partition checkpoint.  Resume
  prunes events ``lsn <= max_lsn`` for that partition and folds the new
  events against the committed state.
- The merge fold is deterministic, so a retried task re-derives identical
  bytes and a duplicate rename is harmless (idempotent under task retry —
  this is what makes the sink exactly-once rather than at-least-once).

All storage I/O on the commit path goes through
``state/commitstore.CommitStore`` — the five-op object-store contract
(get / atomic put / conditional put / list / delete, NO rename, NO
hardlink) — so the protocol is deployable on S3/GCS unchanged; the POSIX
rename/link tricks live inside ``PosixStore`` as one realization of that
contract, and the fault-injecting ``ObjectStoreEmulator`` proves the
engine survives crash windows and CAS races using only those five ops.
"""

from __future__ import annotations

import json
import os
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq

from .commitstore import store_for

MANIFEST_NAME = "manifest.json"


class ConcurrentCommitError(RuntimeError):
    """Another writer committed this (partition, epoch) with DIFFERENT
    content — an optimistic-concurrency conflict between two replay
    processes targeting the same lake, not a harmless retry duplicate
    (those carry the same digest and commit idempotently).  The losing
    writer must abort; re-running with ``resume=True`` folds its events
    on top of the winner's committed state."""


def partition_dir(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, f"part={part}")


def _atomic_write_bytes(path: str, data: bytes) -> None:
    """Atomically-visible full-object write via the governing store."""
    store_for(path).put(path, data)


HWM_NAME = "_log_hwm.json"


def write_log_hwm(out_dir: str, log_hwm: int) -> int:
    """Stamp the lake-level LOG high-water mark: the max LSN the just-
    finished SUCCESSFUL replay scanned (footer stats over the whole log).

    Per-partition checkpoints cannot prove catch-up — a partition whose
    last routed event came early carries a low ``max_lsn`` forever, and a
    resume that routes it nothing never recommits it — so monitors need
    this one lake-level number: every partition is caught up to it after
    a successful run by construction (a run applies ALL scanned events).

    Advisory metadata, monotone (an older/concurrent run can only raise
    it), written atomically AFTER all partitions commit — a crash before
    the stamp merely over-reports lag, never under-reports it.  Returns
    the value now on disk."""
    cur = read_log_hwm(out_dir)
    new = max(int(log_hwm), cur)
    if new > cur:
        _atomic_write_bytes(
            os.path.join(out_dir, HWM_NAME),
            json.dumps({"log_hwm": new}).encode(),
        )
    return new


def read_log_hwm(out_dir: str) -> int:
    """The stamped log high-water mark, or -1 (pre-hwm lake / never run)."""
    p = os.path.join(out_dir, HWM_NAME)
    try:
        b = store_for(p).get(p)
        return -1 if b is None else int(json.loads(b)["log_hwm"])
    except (ValueError, KeyError):
        return -1


GC_PINS_NAME = "_gc_pins.json"


def read_gc_pins(out_dir: str) -> dict[str, dict[str, int]]:
    """The lake's external-reference GC pin registry: ``{pin_name:
    {partition: epoch}}``.  Missing/corrupt file = no pins."""
    p = os.path.join(out_dir, GC_PINS_NAME)
    try:
        b = store_for(p).get(p)
        if b is None:
            return {}
        d = json.loads(b)
        return d if isinstance(d, dict) else {}
    except ValueError:
        return {}


def write_gc_pins(
    out_dir: str, name: str, pins: dict[int, int] | None
) -> None:
    """Register (or, with ``pins=None``, release) a named set of
    per-partition epoch pins that commit-time lazy GC and ``vacuum``
    must retain REGARDLESS of the ``keep_epochs`` window.

    This is reference-based retention for epochs an EXTERNAL pointer
    still names — the transactional snapshot (``pipelines/txn.py``)
    pins the epochs its published pointer resolves to, so repeated
    committed-but-unpublished runs (failed WAP audits, crash-before-
    publish loops) can never advance a partition far enough for GC to
    delete the snapshot manifests/files transactional readers are
    contractually promised.  Count-based retention alone cannot give
    that guarantee: ``keep_epochs=N`` dies to N consecutive unpublished
    commits.

    Single-writer per name (publishers are already CAS-serialized);
    the write is atomic, so readers/GC see the old or new registry,
    never a torn one."""
    reg = read_gc_pins(out_dir)
    if pins is None:
        if name not in reg:
            return
        del reg[name]
    else:
        reg[name] = {str(p): int(e) for p, e in pins.items()}
    _atomic_write_bytes(
        os.path.join(out_dir, GC_PINS_NAME),
        json.dumps(reg, indent=1, sort_keys=True).encode(),
    )


def _pinned_epochs(out_dir: str, part: int) -> set[int]:
    """Epochs of partition ``part`` pinned by any registered external
    reference (exempt from GC)."""
    pins: set[int] = set()
    for ref in read_gc_pins(out_dir).values():
        e = ref.get(str(part))
        if e is not None:
            pins.add(int(e))
    return pins


def _create_exclusive_bytes(path: str, data: bytes) -> bool:
    """Create ``path`` with ``data`` iff it does not exist — the
    conditional put (``If-None-Match: *``) that serializes concurrent
    committers of the same (partition, epoch).  Returns False when
    another writer created the object first."""
    return store_for(path).put_if_absent(path, data)


def commit_partition(
    out_dir: str,
    part: int,
    epoch: int,
    table: pa.Table,
    stats: dict[str, Any],
    digest: str,
    compression: str = "zstd",
    keep_epochs: int = 1,
    chain_files: list[str] | None = None,
    chain_rows: int = 0,
    row_group_rows: int | None = None,
) -> dict[str, Any]:
    """Atomically commit one partition's full state for an epoch.

    Always whole-partition epochs, never appends (SURVEY.md §7 known-hard
    #1): the data file for epoch E fully replaces epoch E-1's; the manifest
    swap is the commit point.

    ``chain_files`` switches to a MERGE-ON-READ DELTA commit
    (``SinkConfig.merge_on_read``): ``table`` holds only the increment's
    winner rows (op column retained, delete winners as op='D' tombstone
    rows) and the manifest's ``files`` lists the prior state's whole
    chain PLUS the new delta file, newest last.  Readers fold the chain
    per key by max LSN (the same LWW kernel the writer uses), so the
    folded view is row-identical to a copy-on-write commit of the same
    events.  The manifest gains ``kind: "delta"``; ``rows`` counts
    PHYSICAL chain rows (``chain_rows`` + the delta), not live keys —
    the live count is unknowable without a fold, by design.  ``digest``
    must be the DELTA table's digest (it tags the new file's name and is
    what the concurrent-writer CAS compares); the chained prior files
    stay referenced by the new manifest, so commit-time lazy GC and
    ``vacuum`` keep them alive automatically.  The commit-point and CAS
    semantics are byte-for-byte the base path's.

    ``keep_epochs``: how many epochs' data files survive GC (default 1 =
    current only).  A reader that loaded the previous manifest just before
    the swap still holds the OLD file name — with ``keep_epochs=1`` lazy
    GC deletes that file immediately and the in-flight read crashes.
    ``keep_epochs=2`` gives concurrent readers a one-epoch grace window
    (at the cost of up to 2× lake disk between commits) — the right
    setting for lakes served while a ``tail_change_log`` loop commits.
    Readers always see exactly one consistent epoch (the manifest is the
    single commit point); this knob only controls how long superseded
    files linger for reads already in flight.

    Concurrent WRITERS (two replay processes on one lake, both targeting
    epoch E) are serialized by a compare-and-swap on the snapshot
    manifest: the data filename carries the content digest, so distinct
    writers never collide on a data file, and exclusive-create of
    ``manifest-e{E}.json`` picks exactly one winner.  A loser with the
    SAME digest is a retry duplicate and commits idempotently (adopting
    the winner's manifest bytes); a loser with a different digest raises
    ``ConcurrentCommitError`` before the current pointer moves — its
    orphan data file is swept by GC.
    """
    pdir = partition_dir(out_dir, part)
    store = store_for(out_dir)
    os.makedirs(pdir, exist_ok=True)
    # digest-tagged name: retries of the deterministic fold reuse the name
    # (identical bytes — overwrite is harmless); a concurrent writer with
    # different content writes a different file, so the manifest CAS below
    # can never leave a winner's manifest pointing at a loser's bytes
    fname = f"data-e{epoch}-{digest[:12]}.parquet"
    fpath = os.path.join(pdir, fname)
    # One full-object put, the way an object store ingests it (readers
    # only ever open files a committed manifest names, so visibility
    # atomicity is what matters; durability is the manifest commit
    # point's job — durable=False skips the POSIX-only fsync)
    sink_buf = pa.BufferOutputStream()
    pq.write_table(table, sink_buf, compression=compression,
                   row_group_size=row_group_rows)
    store.put(fpath, sink_buf.getvalue(), durable=False)
    manifest = {
        "part": part,
        "epoch": epoch,
        "max_lsn": stats.get("max_lsn", -1),
        "files": list(chain_files or []) + [fname],
        "rows": chain_rows + len(table) if chain_files else len(table),
        "digest": digest,
        "schema_fingerprint": [(f.name, str(f.type)) for f in table.schema],
        "stats": stats,
    }
    if chain_files:
        manifest["kind"] = "delta"
        manifest["delta_rows"] = len(table)
    payload = json.dumps(manifest, indent=1).encode()
    # Snapshot manifest FIRST, current-pointer second: the epoch manifest
    # (`manifest-e{N}.json`) is what time-travel reads resolve against, the
    # plain `manifest.json` stays the single commit point for current-state
    # readers.  Writing the snapshot first means a crash between the two
    # writes leaves the lake at epoch N-1 with a harmless orphan snapshot
    # (superseded on retry, GC'd with its data file).  Exclusive create =
    # the concurrent-writer CAS: exactly one writer owns epoch N.
    snap_path = os.path.join(pdir, f"manifest-e{epoch}.json")
    if not store.put_if_absent(snap_path, payload):
        existing = (store.get(snap_path) or b"{}").decode()
        winner = json.loads(existing)
        if winner.get("digest") != digest:
            raise ConcurrentCommitError(
                f"partition {part} epoch {epoch} was committed by another "
                f"writer with different content (digest {winner.get('digest')!r}"
                f" != {digest!r}); aborting before the current pointer moves."
                " Re-run this replay with resume=True to fold its events on"
                " top of the committed state."
            )
        # Same digest = deterministic retry duplicate.  Adopt the winner's
        # manifest bytes so snapshot and pointer can never diverge (stats
        # payloads may differ across attempts even when content doesn't).
        payload = existing.encode()
    # return the JSON-normalized form either way, so retry winners and
    # losers hand back byte-identical manifests
    manifest = json.loads(payload)
    store.put(os.path.join(pdir, MANIFEST_NAME), payload)
    # Lazy GC: epoch files (data + snapshot manifests) older than the grace
    # window are unreferenced by any manifest a reader could still be
    # acting on; remove them.  Time-travel reach == keep_epochs, by design:
    # a snapshot manifest never outlives the data file it lists.  Data
    # files are additionally swept by REFERENCE: a file inside the window
    # that no retained snapshot lists (a losing concurrent writer's
    # orphan) goes too.  Epochs in the external pin registry
    # (``write_gc_pins`` — e.g. the txn snapshot pointer) are exempt
    # no matter how far below the floor they fall.
    floor = epoch - max(1, keep_epochs) + 1
    pinned = _pinned_epochs(out_dir, part)
    listing = store.list_dir(pdir)
    referenced: set[str] = set(manifest["files"])
    for f in listing:
        if f.startswith("manifest-e") and f.endswith(".json"):
            try:
                e = int(f[len("manifest-e"):-len(".json")])
            except ValueError:
                continue
            if (floor <= e < epoch) or e in pinned:
                try:
                    b = store.get(os.path.join(pdir, f))
                    if b is not None:
                        referenced.update(json.loads(b).get("files", []))
                except ValueError:
                    pass
    for f in listing:
        if f.startswith("data-e") and f.endswith(".parquet"):
            if f in referenced:
                continue
            try:
                # name is data-e{N}-{digesttag}.parquet (legacy: no tag)
                e = int(f[len("data-e"):-len(".parquet")].split("-", 1)[0])
            except ValueError:
                continue
            if e > epoch:
                continue  # a newer writer's in-flight epoch: not ours to GC
        elif f.startswith("manifest-e") and f.endswith(".json"):
            try:
                e = int(f[len("manifest-e"):-len(".json")])
            except ValueError:
                continue
            if e >= floor or e in pinned:
                continue
        else:
            continue
        store.delete(os.path.join(pdir, f))
    return manifest


def write_metrics(out_dir: str, part: int, metrics: dict[str, Any]) -> None:
    """Per-partition lineage/metrics JSON next to the manifest (the
    reference's etl_log row, ``sql/etl_transformations.sql:313-323``)."""
    _atomic_write_bytes(
        os.path.join(partition_dir(out_dir, part), "metrics.json"),
        json.dumps(metrics, indent=1).encode(),
    )


def read_manifest(
    out_dir: str, part: int, asof_epoch: int | None = None
) -> dict[str, Any] | None:
    """Current manifest, or — with ``asof_epoch`` — the snapshot manifest
    with the largest epoch ≤ ``asof_epoch`` (partitions commit
    independently, so a lake "as of epoch E" is each partition at its own
    latest epoch not beyond E).  Raises if that snapshot has been GC'd
    (epochs start at 0, so a partition with any history always had one)."""
    pdir = partition_dir(out_dir, part)
    store = store_for(out_dir)
    if asof_epoch is None:
        b = store.get(os.path.join(pdir, MANIFEST_NAME))
        return None if b is None else json.loads(b)
    retained = sorted(
        int(f[len("manifest-e"):-len(".json")])
        for f in store.list_dir(pdir)
        if f.startswith("manifest-e") and f.endswith(".json")
    )
    if not retained:
        # No snapshot manifests at all: either an un-committed partition
        # (no current manifest either → absent in every epoch) or a lake
        # written before snapshot manifests existed.
        if store.get(os.path.join(pdir, MANIFEST_NAME)) is not None:
            raise ValueError(
                f"partition {part} has no snapshot manifests — lake was "
                "committed by a pre-time-travel build; re-commit to enable "
                "asof_epoch reads"
            )
        return None
    eligible = [e for e in retained if e <= asof_epoch]
    if not eligible:
        raise ValueError(
            f"snapshot epoch {asof_epoch} of partition {part} is no longer "
            f"retained (earliest retained epoch is {retained[0]}; raise "
            "SinkConfig.keep_epochs to extend time-travel reach)"
        )
    b = store.get(os.path.join(pdir, f"manifest-e{eligible[-1]}.json"))
    return json.loads(b)


def read_manifest_exact(out_dir: str, part: int, epoch: int) -> dict[str, Any]:
    """The snapshot manifest of ``part`` at EXACTLY ``epoch``.

    Transactional readers need this rather than ``asof_epoch``: partitions
    commit with independent epoch counters, so "largest epoch ≤ E" can
    resolve a partition whose counter LAGS the pin to a commit made AFTER
    the pin was taken (e.g. a partition at epoch 0 when a cross-table
    snapshot pinned epoch 3 lake-wide, then committed again at epoch 1 —
    still ≤ 3, but newer state).  An exact pin cannot.  Raises when the
    snapshot is missing (GC'd: raise ``SinkConfig.keep_epochs``)."""
    p = os.path.join(partition_dir(out_dir, part), f"manifest-e{epoch}.json")
    b = store_for(out_dir).get(p)
    if b is None:
        raise ValueError(
            f"partition {part} has no retained snapshot at epoch {epoch} "
            "(GC'd or never committed); raise SinkConfig.keep_epochs so "
            "published epochs outlive the next commit"
        )
    return json.loads(b)


def manifests_at(
    out_dir: str, epochs: dict[int, int]
) -> dict[int, dict[str, Any]]:
    """Resolve a pinned {partition: epoch} map to its exact manifests."""
    return {
        int(p): read_manifest_exact(out_dir, int(p), int(e))
        for p, e in epochs.items()
    }


def read_all_manifests(
    out_dir: str, asof_epoch: int | None = None
) -> dict[int, dict[str, Any]]:
    out: dict[int, dict[str, Any]] = {}
    for d in store_for(out_dir).list_dir(out_dir):
        if d.startswith("part="):
            m = read_manifest(out_dir, int(d.split("=", 1)[1]), asof_epoch)
            if m is not None:
                out[m["part"]] = m
    return out


def manifest_data_files(out_dir: str, manifests: dict[int, dict[str, Any]]) -> list[str]:
    """The committed lake = exactly the manifest-listed files."""
    files = []
    for part, m in sorted(manifests.items()):
        for f in m["files"]:
            files.append(os.path.join(partition_dir(out_dir, part), f))
    return files


def lake_kind(manifests: dict[int, dict[str, Any]]) -> str:
    """Which fold maintains this lake: "aggregate" (keyed ⊕-mergeable
    state — manifests carry the sticky ``value_cols`` /
    ``distinct_cols`` / ``quantile_cols`` stats written by
    ``pipelines/aggregate.py``) or "document" (LWW row state — replay
    and derived lakes).  Maintenance verbs (compact, fsck) dispatch on
    this so every lake kind gets the same surface."""
    for m in manifests.values():
        st = m.get("stats", {})
        if (
            st.get("value_cols")
            or "distinct_cols" in st
            or "quantile_cols" in st
        ):
            return "aggregate"
    return "document"


def checkpoints(manifests: dict[int, dict[str, Any]]) -> dict[int, int]:
    """Per-partition applied-LSN high-water marks (the resume watermark —
    reference analogue ``get_last_processed_timestamp``,
    ``sql/etl_transformations.sql:235-258``)."""
    return {part: m["max_lsn"] for part, m in manifests.items()}


def vacuum(out_dir: str, keep_epochs: int = 1) -> dict[str, int]:
    """Standalone lake GC: delete everything no retained manifest references.

    Commit-time GC already sweeps lazily; ``vacuum`` covers what that
    can't — a lake that stopped committing (crashed runs leave
    ``.inprogress`` temps and losing-writer orphans around forever) or a
    retention tightened after the fact (``keep_epochs`` smaller than the
    one the files were committed with).  Per partition, the retained set
    is the current manifest's files plus every snapshot manifest within
    the ``keep_epochs`` window; anything else with a parseable epoch at
    or below the current one goes, as do temp files.  Partitions without
    a current manifest (an in-flight first commit) lose only temps —
    never data a racing writer may be about to reference.  Safe to run
    at any time; concurrent readers inside the retention window are
    unaffected.  Returns removal counts."""
    removed = {"tmp": 0, "data": 0, "manifests": 0}
    store = store_for(out_dir)
    for d in store.list_dir(out_dir):
        if not d.startswith("part="):
            continue
        pdir = os.path.join(out_dir, d)
        listing = store.list_dir(pdir)
        for f in listing:
            if f.endswith(".inprogress") or f.endswith(".tmp"):
                try:
                    os.unlink(os.path.join(pdir, f))
                    removed["tmp"] += 1
                except OSError:
                    pass
        cur_b = store.get(os.path.join(pdir, MANIFEST_NAME))
        if cur_b is None:
            continue
        cur = json.loads(cur_b)
        epoch = cur["epoch"]
        floor = epoch - max(1, keep_epochs) + 1
        try:
            part_no = int(d[len("part="):])
        except ValueError:
            part_no = -1
        pinned = _pinned_epochs(out_dir, part_no)
        referenced: set[str] = set(cur.get("files", []))
        for f in listing:
            if f.startswith("manifest-e") and f.endswith(".json"):
                try:
                    e = int(f[len("manifest-e"):-len(".json")])
                except ValueError:
                    continue
                if (floor <= e <= epoch) or e in pinned:
                    try:
                        b = store.get(os.path.join(pdir, f))
                        if b is not None:
                            referenced.update(json.loads(b).get("files", []))
                    except ValueError:
                        pass
        for f in listing:
            if f.startswith("data-e") and f.endswith(".parquet"):
                if f in referenced:
                    continue
                try:
                    e = int(f[len("data-e"):-len(".parquet")].split("-", 1)[0])
                except ValueError:
                    continue
                if e > epoch:
                    continue  # possibly a newer in-flight writer's file
                kind = "data"
            elif f.startswith("manifest-e") and f.endswith(".json"):
                try:
                    e = int(f[len("manifest-e"):-len(".json")])
                except ValueError:
                    continue
                if e >= floor or e in pinned:
                    continue
                kind = "manifests"
            else:
                continue
            store.delete(os.path.join(pdir, f))
            removed[kind] += 1
    return removed
