"""The headline pipeline: CDC change-log replay → lake upsert.

Three exchange strategies (``ReplayConfig.exchange``):

- ``late`` (default, the 100-TB design — late materialization):
    Phase 1 shuffles ONLY ``(lsn, op, repo, path)`` — column-pruned at the
    Parquet reader, with ``op`` re-encoded to a 1-byte code, the partition
    id passed as slice-boundary metadata rather than a per-row column, and
    the partial-agg columns shipped only for combiner-folded rows — through
    the actor exchange and picks the winning LSN per key (last-writer-wins
    fold, tombstones excluded).  ``run_summary`` records the measured
    exchange volume per phase (``p1_routed_mb``/``p2_routed_mb``).  Phase 2 re-reads
    the log (and prior lake state on resume), filters rows by winning-LSN
    membership (a broadcast sorted int64 array + searchsorted per batch),
    and routes ONLY the surviving ~final rows to committer actors.  The
    wide ``content`` payload never enters a shuffle — shuffle volume is
    proportional to keys, not bytes (SURVEY.md §7 known-hard #4).
- ``actor``: single-phase — full rows routed to merge actors that fold and
  commit (simpler; fine when rows are narrow).
- ``groupby``: pure Dataset-API ``groupby(part).map_groups`` (kept for
  comparison; Ray's generic shuffle re-sorts the whole payload and
  measured 15-40× slower on content-heavy rows).

All strategies produce byte-identical lakes (asserted by tests) and share
the exactly-once manifest sink, per-partition checkpoints and lineage
metrics.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ..config import ReplayConfig, SinkConfig
from ..hashing import (
    KEY_HASH_VERSION,
    key_hash,
    partition_ids,
    sha256_column,
    table_digest,
)
from ..schemas import (
    CHANGE_EVENT_SCHEMA,
    KEY_COLUMNS,
    OP_CODES,
    PART_COLUMN,
    REPO_FILES_SCHEMA,
    VALID_OPS,
    conform_batch,
    encode_op,
    op_equal,
)
from ..sources.change_log import read_change_log, scan_change_log
from ..stages.exchange import make_feeder
from ..stages.merge import (
    EVENTS_COL,
    HAD_INSERT_COL,
    KEY_HASH_COL,
    SORT_KEYS,
    finalize_partition,
    fold_latest,
)
from ..stages.normalize import (
    REJECT_REASON_COL,
    event_validity,
    make_normalizer,
    reject_error,
)
from ..state import manifest as mf

PHASE1_COLUMNS = ["lsn", "op", "repo", "path"]

# Engine-internal bool column: content presence for phase 1's narrow read,
# derived from Parquet footer null_count stats (appended only for row
# groups that actually hold content nulls — see _rg_content_valid).
CONTENT_VALID_COL = "_content_valid"


def output_schema_for(event_schema: pa.Schema, keep_op: bool = False) -> pa.Schema:
    """Lake schema = REPO_FILES_SCHEMA with event-side widenings applied
    (e.g. lang → large_string) plus evolved extra columns appended.

    ``keep_op`` (tombstone lakes, SinkConfig.keep_tombstones): every row
    additionally carries the winning event's ``op`` — 'D' rows ARE the
    persisted tombstones readers filter by."""
    canonical_event = {f.name for f in CHANGE_EVENT_SCHEMA}
    fields = []
    for f in REPO_FILES_SCHEMA:
        if f.name in event_schema.names and f.name not in ("lsn",):
            fields.append(pa.field(f.name, event_schema.field(f.name).type, f.nullable))
        else:
            fields.append(f)
    if keep_op:
        fields.append(pa.field("op", pa.string()))
    extras = [f for f in event_schema if f.name not in canonical_event]
    return pa.schema(fields + extras)


@dataclass
class ReplayResult:
    metrics: pd.DataFrame
    summary: dict[str, Any] = field(default_factory=dict)


# ---------------------------------------------------------------------------
# shared helpers (module-level so cloudpickle ships them by reference)
# ---------------------------------------------------------------------------


def _commit_with_metrics(
    part: int, final: pa.Table, stats: dict, args: dict,
    chain_files: list[str] | None = None, chain_rows: int = 0,
) -> dict[str, Any]:
    t_start = time.time()
    if args.get("cluster_by_key") and len(final):
        # Write-time clustering (SinkConfig.cluster_by_key): key-sorted
        # files give repo/path row-group statistics real pruning power for
        # filtered readers; see the config docstring for the trade.
        final = final.sort_by([(k, "ascending") for k in KEY_COLUMNS])
    stats = dict(stats)
    stats["num_partitions"] = args["num_partitions"]
    stats["key_hash_version"] = KEY_HASH_VERSION
    # sticky per lake: resume validates it against SinkConfig (see replay)
    stats["keep_tombstones"] = bool(args.get("keep_tombstones", False))
    digest = table_digest(final, list(KEY_COLUMNS))
    epoch = args["prior_epochs"].get(part, -1) + 1
    m = mf.commit_partition(
        args["sink_dir"], part, epoch, final, stats, digest,
        compression=args["compression"],
        keep_epochs=args.get("keep_epochs", 1),
        chain_files=chain_files,
        chain_rows=chain_rows,
        row_group_rows=args.get("row_group_rows"),
    )
    metrics = {
        **stats,
        "part": part,
        "epoch": epoch,
        "duration_s": round(time.time() - t_start, 4),
        # files[-1] is the file THIS commit wrote (a delta commit's chain
        # lists the untouched prior files first — those bytes were not
        # written now, which is the whole point of merge-on-read)
        "bytes_written": os.path.getsize(
            os.path.join(mf.partition_dir(args["sink_dir"], part), m["files"][-1])
        ),
    }
    mf.write_metrics(args["sink_dir"], part, metrics)
    return metrics


def _prior_state_as_events(
    out_dir: str, part: int, m: dict, schema: pa.Schema
) -> pa.Table:
    """Committed partition state → synthetic events for the merge fold.

    Rows re-enter at their stored LSN: op='I' for plain lakes (all rows
    are live; any newer event wins, a newer delete tombstones them), or
    the STORED op for tombstone lakes (SinkConfig.keep_tombstones) — the
    persisted 'D' row must keep out-deleting late lower-LSN events.
    ``_events=0`` keeps lineage counters counting only NEW events;
    ``_had_insert=True`` keeps re-entered state out of the orphan
    counters regardless of its stored op."""
    tables = [
        pq.read_table(os.path.join(mf.partition_dir(out_dir, part), f))
        for f in m["files"]
    ]
    prior = pa.concat_tables(tables, promote_options="permissive")
    n = len(prior)
    cols: dict[str, Any] = {}
    for f in schema:
        if f.name == "op" and "op" not in prior.column_names:
            cols["op"] = pa.array(["I"] * n, pa.string())
        elif f.name == "op":
            # a merge-on-read CHAIN mixes op-less base files with op-bearing
            # delta files — the permissive concat null-fills the base rows'
            # op, and a null op would break the fold's tiebreak.  Base rows
            # are live state: re-enter as 'I' (same contract as the op-less
            # branch above); delta rows keep their stored op so persisted
            # 'D' tombstones out-delete late lower-LSN events.
            col = prior.column("op")
            if col.type != f.type:
                col = col.cast(f.type)
            cols["op"] = pc.fill_null(col, "I") if col.null_count else col
        elif f.name in prior.column_names:
            col = prior.column(f.name)
            cols[f.name] = col.cast(f.type) if col.type != f.type else col
        else:
            cols[f.name] = pa.nulls(n, f.type)
    t = pa.table(cols)
    t = t.append_column(EVENTS_COL, pa.array([0] * n, pa.int64()))
    t = t.append_column(HAD_INSERT_COL, pa.array([True] * n))
    kh = key_hash(t.column("repo"), t.column("path")).view(np.int64)
    return t.append_column(KEY_HASH_COL, pa.array(kh))


def _fold_chain_table(tbl: pa.Table, keep_tombstones: bool) -> pa.Table:
    """Fold a concatenated merge-on-read chain (base + delta files) to the
    row set a copy-on-write commit of the same events would hold: max-LSN
    winner per (repo, path) via the writer's own LWW kernel, null ``op``
    (op-less base files of a plain lake) treated as live 'I' state, delete
    winners dropped unless ``keep_tombstones``.  Engine-internal fold
    columns never leak out."""
    if len(tbl) == 0:
        return tbl
    if "op" not in tbl.column_names:
        tbl = tbl.append_column("op", pa.array(["I"] * len(tbl), pa.string()))
    elif tbl.column("op").null_count:
        i = tbl.schema.get_field_index("op")
        tbl = tbl.set_column(
            i, tbl.schema.field(i), pc.fill_null(tbl.column("op"), "I")
        )
    folded = fold_latest(tbl, keep_tombstones=keep_tombstones, compose_patches=True)
    drop = [
        c for c in (EVENTS_COL, HAD_INSERT_COL, KEY_HASH_COL)
        if c in folded.column_names
    ]
    return folded.drop_columns(drop) if drop else folded


def _read_chain_folded(
    pdir: str,
    files: list[str],
    keep_tombstones: bool,
    prefold_filter: Any | None = None,
    columns: list[str] | None = None,
) -> pa.Table:
    """Read one partition's manifest file chain and fold it to final state.

    ``prefold_filter`` is a pyarrow.dataset expression over the KEY
    COLUMNS ONLY — key predicates keep or drop whole key groups, so they
    commute with the per-key fold and can push into every file's Parquet
    scan (this is what keeps ``lake_get`` a point read on a chained
    partition).  Non-key predicates must NOT be passed here: filtering a
    loser row's content before the fold would resurrect older versions.

    ``columns`` prunes the per-file read; the fold's own needs (the key
    columns, ``lsn``, ``op``) are always added, and columns a chain file
    predates (schema evolution, op-less plain bases) are skipped per file
    — the permissive concat null-fills them.
    """
    want = None
    if columns is not None:
        want = set(columns) | set(KEY_COLUMNS) | {"lsn", "op"}
    tables = []
    for f in files:
        path = os.path.join(pdir, f)
        pf_schema = pq.ParquetFile(path).schema_arrow
        cols = (
            [c for c in pf_schema.names if c in want]
            if want is not None
            else None
        )
        tables.append(pq.read_table(path, columns=cols, filters=prefold_filter))
    tbl = pa.concat_tables(tables, promote_options="permissive")
    return _fold_chain_table(tbl, keep_tombstones=keep_tombstones)


def _chained_parts(manifests: dict[int, dict]) -> set[int]:
    """Partitions whose current manifest is a merge-on-read delta chain."""
    return {
        p
        for p, m in manifests.items()
        if m.get("kind") == "delta" or len(m.get("files", [])) > 1
    }


def _commit_delta_fn(part: int, tbl: pa.Table, args: dict) -> dict[str, Any]:
    """Phase-2 finalize, merge-on-read mode: the routed rows are the
    INCREMENT's winner rows (delete winners included).  Commit them as a
    delta file chained onto the partition's committed state — the prior
    state is never read — unless the chain would exceed
    ``SinkConfig.max_delta_files``, in which case compact inline: this
    committer reads its OWN chain from the lake (partition-local I/O, no
    cross-partition traffic), folds, and writes a fresh base."""
    chain = args["prior_chains"][part]
    stats = dict(args["stats_per_part"][part])
    # The partition checkpoint must stay monotonic: under fan-in feeds
    # (watermark_prune=False) an increment's max LSN can trail the chain's.
    stats["max_lsn"] = max(int(chain["max_lsn"]), int(stats.get("max_lsn", -1)))
    delta_schema = pa.ipc.read_schema(pa.BufferReader(args["delta_schema"]))
    # keep_tombstones=True ALWAYS for the delta rows themselves: a delete
    # winner must persist as an op='D' row or the read fold could never
    # drop the base row it supersedes.
    delta, _ = finalize_partition(tbl, delta_schema, keep_tombstones=True)
    n_deltas = len(chain["files"]) - 1 + 1  # existing deltas + this one
    if n_deltas > int(args.get("max_delta_files", 8)):
        pdir = mf.partition_dir(args["sink_dir"], part)
        prior = _read_chain_folded(
            pdir, chain["files"], keep_tombstones=True
        )
        merged = pa.concat_tables([prior, delta], promote_options="permissive")
        keep_tomb = bool(args.get("keep_tombstones", False))
        base = _fold_chain_table(merged, keep_tombstones=keep_tomb)
        out_schema = pa.ipc.read_schema(pa.BufferReader(args["out_schema"]))
        base = conform_batch(base, out_schema)
        stats["compacted_chain"] = len(chain["files"]) + 1
        stats["live_rows"] = len(base) - (
            int(
                pc.sum(
                    pc.cast(op_equal(base.column("op"), "D"), pa.int64())
                ).as_py()
                or 0
            )
            if keep_tomb and len(base)
            else 0
        )
        stats["state_rows"] = len(base)
        return _commit_with_metrics(part, base, stats, args)
    stats["kind"] = "delta"
    return _commit_with_metrics(
        part, delta, stats, args,
        chain_files=chain["files"], chain_rows=int(chain["rows"]),
    )


def _fold_commit_fn(part: int, tbl: pa.Table, args: dict) -> dict[str, Any]:
    """Finalize for the single-phase 'actor' mode: merge prior state, fold
    last-writer-wins, commit exactly-once."""
    out_schema = pa.ipc.read_schema(pa.BufferReader(args["out_schema"]))
    if part in args["prior_manifests"]:
        event_schema = pa.schema(
            [f for f in tbl.schema if not f.name.startswith("_")]
        )
        prior = _prior_state_as_events(
            args["sink_dir"], part, args["prior_manifests"][part], event_schema
        )
        tbl = pa.concat_tables([tbl, prior], promote_options="permissive")
    final, stats = finalize_partition(
        tbl, out_schema, keep_tombstones=args.get("keep_tombstones", False)
    )
    return _commit_with_metrics(part, final, stats, args)


def _patch_winners(part: int, tbl: pa.Table, events_in: int, keep_tomb: bool) -> dict[str, Any]:
    """Phase-1 winner-set computation when op='P' partial updates are
    present: a key's extraction set is no longer one row — it is the base
    full image (last non-P event, whatever its op) PLUS every patch above
    it, because phase 2 must ship all of them for the committer's
    composition (``merge._compose_patches_exact``).  Patch-free keys keep
    the existing single-winner semantics (D winners drop from the
    extraction set on plain lakes exactly as before)."""
    from ..stages.merge import _segment_last_mask

    t = tbl.sort_by(SORT_KEYS)
    n = len(t)
    last, seg = _segment_last_mask(t)
    starts = np.flatnonzero(np.concatenate(([True], seg[1:] != seg[:-1])))
    idx = np.arange(n, dtype=np.int64)
    is_p = op_equal(t.column("op"), "P").to_numpy(zero_copy_only=False)
    is_d = op_equal(t.column("op"), "D").to_numpy(zero_copy_only=False)
    lsn = t.column("lsn").to_numpy(zero_copy_only=False)
    base_idx = np.maximum.reduceat(np.where(~is_p, idx, -1), starts)
    tmpl = np.flatnonzero(last)
    seg_last_p = is_p[tmpl]  # segment's max-LSN row is a patch
    pseg = seg_last_p[seg]
    winners = np.zeros(n, dtype=bool)
    winners |= pseg & (idx >= base_idx[seg])  # base (if any) + patches
    patchless_tmpl = tmpl[~seg_last_p]
    if keep_tomb:
        winners[patchless_tmpl] = True
    else:
        winners[patchless_tmpl[~is_d[patchless_tmpl]]] = True
    win_lsn = lsn[winners]
    if HAD_INSERT_COL in t.column_names:
        hi_col = t.column(HAD_INSERT_COL)
        if hi_col.null_count:
            hi_col = pc.coalesce(hi_col, op_equal(t.column("op"), "I"))
        hi = hi_col.to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        hi = op_equal(t.column("op"), "I").to_numpy(zero_copy_only=False).astype(np.int64)
    had_insert = np.bincount(seg, weights=hi) > 0
    deleted = is_d[tmpl] & ~seg_last_p  # final state = tombstone
    stats = {
        "events_in": events_in,
        "keys_seen": int(len(tmpl)),
        "deleted_keys": int(deleted.sum()),
        "orphan_events_applied": int((~deleted & ~had_insert).sum()),
        "orphan_deletes": int((deleted & ~had_insert).sum()),
        "max_lsn": int(lsn.max()),
        "min_lsn": int(lsn.min()),
        "live_rows": int(len(tmpl)) - int(deleted.sum()),
        "state_rows": int(winners.sum()),
        "patched_keys": int(seg_last_p.sum()),
    }
    return {"part": part, "stats": stats, "winners_ref": ray.put(np.sort(win_lsn))}


def _winners_fn(part: int, tbl: pa.Table, args: dict) -> dict[str, Any]:
    """Phase-1 finalize: last-writer-wins over the key/LSN projection.

    The ROW_NUMBER()=1 pick-latest idiom computed without ever touching the
    content payload: ONE unstable argsort on the key hash alone (a second
    sort key is unnecessary — the winner is the group's max-LSN row, found
    by an O(n) segmented max, and LSNs are unique by contract so no
    tiebreak exists; replacing the former ``np.lexsort((lsn, kh))`` with a
    plain ``np.argsort(kh)`` measured 0.8-2.0s → 0.35s per 2.34M-row
    partition — the largest single term of the phase-1 finalize wall at
    300M events).  Grouping by the 64-bit key hash alone is exact iff no
    two distinct keys collide within the partition; that is verified
    EXACTLY — a run holding two distinct (repo,path) keys exposes a
    differing adjacent pair under ANY within-run ordering, so one
    vectorized string compare of neighbours catches every collision
    (profiled 4x cheaper than the count_distinct-over-concatenated-keys
    check it replaces) — and the vanishingly-rare collision case falls
    back to the full sorted fold."""
    if len(tbl) == 0:
        return {
            "part": part,
            "stats": {
                "events_in": 0, "keys_seen": 0, "deleted_keys": 0,
                "orphan_events_applied": 0, "orphan_deletes": 0,
                "max_lsn": -1, "min_lsn": -1, "live_rows": 0,
            },
            "winners_ref": ray.put(np.zeros(0, np.int64)),
        }
    if KEY_HASH_COL in tbl.column_names and not tbl.column(KEY_HASH_COL).null_count:
        kh = tbl.column(KEY_HASH_COL).to_numpy(zero_copy_only=False)
    else:
        # robustness for hash-less callers: recompute from the key strings
        # — same deterministic mapping the router used.  (Shipping _kh and
        # reading it here is the measured-faster steady state: the
        # recompute-at-finalize variant cost p1_fn_s_sum 42 -> 64 s at
        # 100M events.)
        kh = key_hash(tbl.column("repo"), tbl.column("path")).view(np.int64)
    lsn_arr = tbl.column("lsn").to_numpy(zero_copy_only=False)
    order = np.argsort(kh)  # grouping only; within-group order irrelevant
    khs = kh[order]
    same_kh = khs[1:] == khs[:-1]
    collision = False
    if same_kh.any():
        comb = pc.binary_join_element_wise(
            tbl.column("repo"), tbl.column("path"), "\x00"
        ).combine_chunks()
        cs = comb.take(pa.array(order))
        if isinstance(cs, pa.ChunkedArray):
            cs = cs.combine_chunks()
        neighbour_diff = pc.not_equal(
            cs.slice(1), cs.slice(0, len(cs) - 1)
        ).to_numpy(zero_copy_only=False)
        collision = bool(np.any(neighbour_diff & same_kh))
    # _events/_had_insert ship only for combiner-folded rows (see
    # _make_phase1_process): absent column = no batch folded; null entries
    # = this row never folded = one event with had-insert ≡ (op == 'I').
    if EVENTS_COL in tbl.column_names:
        events_in = int(pc.sum(pc.fill_null(tbl.column(EVENTS_COL), 1)).as_py())
    else:
        events_in = len(tbl)
    keep_tomb = bool(args.get("keep_tombstones", False))
    if bool(pc.any(op_equal(tbl.column("op"), "P")).as_py()):
        # partial updates: the winner SET per key is base + patch stack
        return _patch_winners(part, tbl, events_in, keep_tomb)

    def exact_fold():
        # exact sorted fold: handles hash collisions AND equal-LSN ties
        # (op-order tiebreak per merge.py's documented contract)
        folded = fold_latest(tbl, keep_tombstones=True)
        is_del = op_equal(folded.column("op"), "D").to_numpy(zero_copy_only=False)
        had_insert = folded.column(HAD_INSERT_COL).to_numpy(zero_copy_only=False)
        kept = folded if keep_tomb else folded.filter(pa.array(~is_del))
        win_lsn = kept.column("lsn").to_numpy(zero_copy_only=False)
        return is_del, had_insert, win_lsn, len(folded)

    if collision:
        is_del, had_insert, win_lsn, keys_seen = exact_fold()
    else:
        new_grp = np.concatenate(([True], ~same_kh))
        starts = np.flatnonzero(new_grp)
        # winner = the group's max-LSN row, located by value (LSNs are
        # globally unique, so exactly one row per group matches its max)
        l_sorted = lsn_arr[order]
        gmax = np.maximum.reduceat(l_sorted, starts)
        counts = np.diff(np.append(starts, len(l_sorted)))
        win_idx = order[l_sorted == np.repeat(gmax, counts)]
        if len(win_idx) != len(starts):
            # max-LSN tie inside a key group.  Unique LSNs are the
            # steady-state contract, but a crash-window re-run of a fan-in
            # round legitimately feeds an event AND its own committed
            # prior row at the same composite LSN — resolve through the
            # exact sorted fold's deterministic op tiebreak instead of
            # failing the round.
            is_del, had_insert, win_lsn, keys_seen = exact_fold()
            row_del = None  # signal: stats below use the exact-fold values
        else:
            row_del = op_equal(tbl.column("op"), "D").to_numpy(zero_copy_only=False)
        if row_del is not None:
            if HAD_INSERT_COL in tbl.column_names:
                hi_col = tbl.column(HAD_INSERT_COL)
                if hi_col.null_count:
                    hi_col = pc.coalesce(hi_col, op_equal(tbl.column("op"), "I"))
                row_had_i = hi_col.to_numpy(zero_copy_only=False)
            else:
                row_had_i = op_equal(tbl.column("op"), "I").to_numpy(
                    zero_copy_only=False
                )
            had_insert = np.maximum.reduceat(
                row_had_i[order].astype(np.int8), starts
            ).astype(bool)
            is_del = row_del[win_idx]
            win_lsn = lsn_arr[win_idx] if keep_tomb else lsn_arr[win_idx][~is_del]
            keys_seen = len(win_idx)
    stats = {
        "events_in": events_in,
        "keys_seen": int(keys_seen),
        "deleted_keys": int(is_del.sum()),
        "orphan_events_applied": int((~is_del & ~had_insert).sum()),
        "orphan_deletes": int((is_del & ~had_insert).sum()),
        "max_lsn": int(pc.max(tbl.column("lsn")).as_py()),
        "min_lsn": int(pc.min(tbl.column("lsn")).as_py()),
        # live = non-deleted keys; state = rows phase 2 must extract
        # (includes D winners on tombstone lakes)
        "live_rows": int(len(win_lsn)) - (int(is_del.sum()) if keep_tomb else 0),
        "state_rows": int(len(win_lsn)),
    }
    # winners stay in the OBJECT STORE (ray.put from this actor): the
    # driver receives only the ref, never an O(live rows) array — at
    # 5x10^8 live keys the old driver-side concat was a ~4 GB allocation
    return {"part": part, "stats": stats, "winners_ref": ray.put(np.sort(win_lsn))}


def _commit_extracted_fn(part: int, tbl: pa.Table, args: dict) -> dict[str, Any]:
    """Phase-2 finalize: the routed rows ARE the final state — dedupe by
    LSN (a winner can arrive from both the log and prior lake files when
    the checkpoint didn't prune a bucket), order by key, sha256, commit."""
    out_schema = pa.ipc.read_schema(pa.BufferReader(args["out_schema"]))
    stats = args["stats_per_part"][part]
    # (lsn, op) sort + keep-LAST of each equal-LSN run: the same op-order
    # tiebreak ('D' < 'I' < 'U', last wins) phase 1's fold applies, so a
    # crash-window duplicate (event + its own committed prior row) or a
    # contract-violating same-LSN pair commits the row phase 1 counted
    tbl = tbl.sort_by([("lsn", "ascending"), ("op", "ascending")])
    lsns = tbl.column("lsn").to_numpy(zero_copy_only=False)
    if len(lsns):
        keep = np.concatenate((np.diff(lsns) != 0, [True]))
        if not keep.all():
            tbl = tbl.filter(pa.array(keep))
    expected = stats.get("state_rows", stats["live_rows"])
    if len(tbl) != expected:
        raise ValueError(
            f"partition {part}: extracted {len(tbl)} rows, phase-1 expected {expected}"
        )
    if args.get("merge_on_read") and part in args.get("prior_chains", {}):
        return _commit_delta_fn(part, tbl, args)
    final, _ = finalize_partition(
        tbl, out_schema, keep_tombstones=args.get("keep_tombstones", False)
    )
    return _commit_with_metrics(part, final, stats, args)


# ---------------------------------------------------------------------------
# late-materialization strategy
# ---------------------------------------------------------------------------


def _make_phase1_process(
    num_partitions: int,
    checkpoints: dict[int, int] | None,
    combine: bool = False,
    combine_mode: str = "adaptive",
    strict: bool = False,
    allow_patches: bool = True,
):
    ckpt_arr = None
    if checkpoints:
        ckpt_arr = np.full(num_partitions, -1, dtype=np.int64)
        for part, lsn in checkpoints.items():
            ckpt_arr[part] = lsn

    def process(batch: pa.Table) -> pa.Table:
        # Content presence for the narrow read: the fused feed appends a
        # CONTENT_VALID_COL bool only for row groups whose footer stats say
        # nulls exist (or whose file lacks the column) — absent column /
        # null entries mean "content proven present" (clean fast path).
        if CONTENT_VALID_COL in batch.column_names:
            content_valid = (
                pc.fill_null(batch.column(CONTENT_VALID_COL), True)
                .to_numpy(zero_copy_only=False)
                .astype(bool)
            )
            batch = batch.drop_columns([CONTENT_VALID_COL])
        else:
            content_valid = True
        for col in ("repo", "path", "op"):
            if batch.schema.field(col).type != pa.string():
                i = batch.schema.get_field_index(col)
                batch = batch.set_column(
                    i, pa.field(col, pa.string()), batch.column(col).cast(pa.string())
                )
        # SAME predicate as the single-phase normalizer (event_validity):
        # the strategies must reject identical rows or they pick different
        # winners on dirty logs and the byte-identical-lakes contract breaks.
        valid, reasons = event_validity(batch, content_valid=content_valid)
        nrej = 0
        if valid is not None:
            if strict:
                raise reject_error(reasons, valid)
            nrej = int((~valid).sum())
            batch = batch.filter(pa.array(valid))
        if not allow_patches and len(batch) and bool(
            pc.any(op_equal(batch.column("op"), "P")).as_py()
        ):
            # Patch composition is only sound on feeds append-only in LSN
            # (a patch can never be replayed INTO an already-composed
            # stack); watermark_prune=False declares the feed is NOT —
            # fail loudly, no partition has committed.
            raise ValueError(
                "op='P' partial-update events require an append-only-LSN "
                "feed; this replay runs with watermark_prune=False "
                "(fan-in / out-of-order mode), where composing a patch "
                "stack is lossy. Route patches through an append-only "
                "source."
            )
        for col in ("repo", "path"):
            i = batch.schema.get_field_index(col)
            batch = batch.set_column(
                i, batch.schema.field(i), pc.utf8_trim_whitespace(batch.column(col))
            )
        kh = key_hash(batch.column("repo"), batch.column("path"))
        parts = (kh % np.uint64(num_partitions)).astype(np.int64)
        if ckpt_arr is not None and len(batch):
            lsn = batch.column("lsn").to_numpy(zero_copy_only=False)
            keep = lsn > ckpt_arr[parts]
            if not keep.all():
                batch = batch.filter(pa.array(keep))
                parts = parts[keep]
                kh = kh[keep]
        n = len(batch)
        # op ships as a 1-byte code (order mirrors the string tiebreak
        # order); _events/_had_insert ship ONLY for combiner-folded rows —
        # a never-folded row is exactly one event whose had-insert flag is
        # op == 'I', so consumers derive both (fold_latest/_winners_fn
        # fill the nulls a permissive concat of folded + unfolded batches
        # produces).  Net: 17 B/row off the phase-1 shuffle.
        oi = batch.schema.get_field_index("op")
        batch = batch.set_column(
            oi, pa.field("op", pa.int8()), encode_op(batch.column("op"))
        )
        batch = batch.append_column(PART_COLUMN, pa.array(parts))
        # _kh DOES ship (8 B/row): dropping it and recomputing at finalize
        # was tried and measured p1_fn_s_sum 42 -> 64 s at 100M events —
        # re-hashing the heavily-chunked concat'd string columns under
        # 32-way finalize contention costs far more than the bytes save.
        batch = batch.append_column(KEY_HASH_COL, pa.array(kh.view(np.int64)))
        if combine and n:
            # Adaptive skew valve: collapse to latest-per-key within this
            # batch so a hot key ships one row per batch, not one per event
            # — but ONLY when the batch actually holds repeated keys.  The
            # fold costs a full per-batch sort (~600ms/1M rows), which is
            # pure overhead on low-duplication batches (a uniform 5M-key
            # log dedups ~9% per 1M-row batch); a genuinely hot key makes
            # duplicates survive even a 1/16 stride sample (a key with k
            # events keeps ~k/16 sampled copies), so the sampled dup ratio
            # separates skew (fold pays) from uniform traffic (skip).
            if combine_mode == "always":
                batch = fold_latest(batch, keep_tombstones=True)
            elif combine_mode != "never":
                sample = kh.view(np.int64)[::16]
                if (
                    len(sample)
                    and 1.0 - np.unique(sample).size / len(sample) > 0.25
                ):
                    batch = fold_latest(batch, keep_tombstones=True)
        # reject count rides to the feeder's ack row as schema metadata
        return batch.replace_schema_metadata({b"rejected": str(nrej).encode()})

    return process


def _make_prior_phase1_process(num_partitions: int, keep_tombstones: bool = False):
    """Prior lake rows → phase-1 records at their stored LSN, _events=0
    (lineage counts only NEW events).

    Plain lakes re-enter as op='I' (every stored row is live).  Tombstone
    lakes (``keep_tombstones``) re-enter with their STORED op so a
    persisted 'D' keeps out-deleting late lower-LSN events; their
    ``_had_insert=True`` ships explicitly so re-entered 'U'/'D' state
    never pollutes the orphan counters."""

    def process(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if keep_tombstones and "op" in batch.column_names:
            from ..schemas import encode_op

            op_arr = encode_op(batch.column("op").cast(pa.string()))
            if isinstance(op_arr, pa.ChunkedArray):
                op_arr = op_arr.combine_chunks()
        else:
            # op code 'I' — matches phase 1's int8 encoding, and makes
            # the derived had-insert flag (op == 'I') correctly True
            # for established prior rows, so the column need not ship
            op_arr = pa.array(np.full(n, OP_CODES["I"], dtype=np.int8))
        t = pa.table(
            {
                "lsn": batch.column("lsn"),
                "op": op_arr,
                "repo": batch.column("repo").cast(pa.string()),
                "path": batch.column("path").cast(pa.string()),
            }
        )
        kh = key_hash(t.column("repo"), t.column("path"))
        parts = (kh % np.uint64(num_partitions)).astype(np.int64)
        t = t.append_column(PART_COLUMN, pa.array(parts))
        t = t.append_column(KEY_HASH_COL, pa.array(kh.view(np.int64)))
        # _events=0 MUST ship: prior rows are state, not new events, and
        # the consumer-side null fill is 1 (the new-event default).
        t = t.append_column(EVENTS_COL, pa.array(np.zeros(n, dtype=np.int64)))
        if keep_tombstones:
            t = t.append_column(HAD_INSERT_COL, pa.array(np.ones(n, dtype=bool)))
        return t

    return process


# Winner-set membership representation: a dense LSN bitmap beats binary
# search when the LSN span is bounded — searchsorted costs log2(|winners|)
# cache-missy probes per row over the whole log (measured ~4s of the
# phase-2 feed at 100M events), while the bitmap is one L2-resident byte
# load per row (100M-LSN span = 12.5 MB).  Cap the bitmap at 64 MiB
# (512M-LSN span).  Sparse/wide LSN spaces (e.g. timestamp LSNs) use a
# Bloom filter as the fast path — ~95% of phase-2 probes are losers, and a
# definite-miss costs k byte loads into a 10-bits/key array — with the
# rare maybe-hits (winners + ~1% FPs) verified exactly by searchsorted, so
# the answer stays exact while per-row cost drops from log2(|winners|)
# probes to O(1).
_MAX_BITMAP_BYTES = 64 << 20


def make_winner_filter(winners: np.ndarray):
    """Build the broadcast winner set: ('bitmap', lo, bits) when the span
    allows, else ('bloom', filter, sorted_winners).  Consumed by
    ``winner_membership(payload, lsn_array) -> bool mask``."""
    if len(winners) and (int(winners[-1]) - int(winners[0])) // 8 < _MAX_BITMAP_BYTES:
        lo = int(winners[0])
        off = winners - lo
        bits = np.zeros((int(off[-1]) >> 3) + 1, dtype=np.uint8)
        # bitwise_or.at, NOT bits[idx] |= v: fancy-index assignment keeps
        # only one write per duplicate byte index
        np.bitwise_or.at(bits, off >> 3, (1 << (off & 7)).astype(np.uint8))
        return ("bitmap", lo, bits)
    if len(winners):
        from ..stages.bloom import Int64Bloom

        return ("bloom", Int64Bloom(winners), winners)
    return ("sorted", winners)


def make_winner_filter_multi(arrays: list[np.ndarray]):
    """Merged winner filter from PER-PARTITION sorted winner arrays.

    The bitmap path ORs each partition's offsets into one shared bit
    array — peak memory = bitmap + the largest single partition, never
    the concatenated whole; only the (rare) sparse-LSN bloom/sorted path
    pays a full concat+sort, and that runs in a worker task
    (``_build_winner_filter_task``), not on the driver."""
    arrays = [a for a in arrays if len(a)]
    if not arrays:
        return ("sorted", np.zeros(0, np.int64))
    lo = min(int(a[0]) for a in arrays)
    hi = max(int(a[-1]) for a in arrays)
    if (hi - lo) // 8 < _MAX_BITMAP_BYTES:
        bits = np.zeros(((hi - lo) >> 3) + 1, dtype=np.uint8)
        for a in arrays:
            off = a - lo
            np.bitwise_or.at(bits, off >> 3, (1 << (off & 7)).astype(np.uint8))
        return ("bitmap", lo, bits)
    return make_winner_filter(np.sort(np.concatenate(arrays)))


@ray.remote
def _build_winner_filter_task(*winner_arrays):
    """Off-driver winner-filter build: phase-1 actors ``ray.put`` their
    per-partition winner arrays and the driver passes only the REFS here
    (Ray resolves them as args), so the one O(live-rows) allocation on
    the replay hot path happens in a worker, and the driver's peak RSS
    stays flat in the number of live keys.  The task's return ref is
    handed straight to the phase-2 feed tasks."""
    return make_winner_filter_multi(list(winner_arrays))


def winner_membership(payload, lsn: np.ndarray) -> np.ndarray:
    # Raw log rows can carry NULL lsn (dropped by phase 1, but phase 2
    # re-reads the unfiltered log): numpy surfaces those as float64 NaN,
    # which can never be a winner — mask them and work on exact ints.
    valid = None
    if lsn.dtype.kind == "f":
        valid = ~np.isnan(lsn)
        lsn = np.where(valid, lsn, 0).astype(np.int64)
    if payload[0] == "bitmap":
        _, lo, bits = payload
        hi = lo + (len(bits) << 3) - 1
        in_range = (lsn >= lo) & (lsn <= hi)
        off = (lsn - lo) * in_range  # clamp out-of-range to a safe index
        hit = (((bits[off >> 3] >> (off & 7)) & 1) != 0) & in_range
    elif payload[0] == "bloom":
        _, bloom, winners = payload
        maybe = bloom.contains(lsn)
        hit = np.zeros(len(lsn), dtype=bool)
        if maybe.any():
            # exact verify of the rare maybe-hits (no false negatives, so
            # bloom-miss rows are DEFINITELY losers and skip this)
            cand = lsn[maybe]
            idx = np.minimum(np.searchsorted(winners, cand), len(winners) - 1)
            hit[maybe] = winners[idx] == cand
    else:
        winners = payload[1]
        if not len(winners):
            return np.zeros(len(lsn), dtype=bool)
        idx = np.minimum(np.searchsorted(winners, lsn), len(winners) - 1)
        hit = winners[idx] == lsn
    return hit if valid is None else hit & valid


def _make_conform_winners(
    event_schema: pa.Schema,
    num_partitions: int,
    prior: bool,
    verify_content: bool = False,
    checkpoints: dict[int, int] | None = None,
):
    """Conform + route-key an ALREADY winner-filtered batch (phase-2 tail).

    ``verify_content`` is the exactness backstop for phase 1's optimistic
    content gate (``_rg_content_valid``): winners are fully decoded here,
    so a null-content I/U row that slipped past the footer-stats heuristic
    is caught BEFORE any partition commits.  The check touches only winner
    rows (~live fraction of the log), two kernels per batch.

    ``checkpoints`` prunes log rows at/below the partition's committed
    watermark, EXACTLY as phase 1 did before winner selection.  This is
    not just symmetry: on resume, a winner's LSN often equals a
    pre-checkpoint event's LSN (the prior state row re-enters at the LSN
    of the event that produced it), so the raw event passes the
    winner-membership filter too.  Pre-patch that duplicate was
    byte-identical to the prior row and the committer's equal-LSN dedupe
    could keep either; an op='P' event is NOT identical to the composed
    row it produced — keeping the raw patch would erase the columns the
    composition had inherited (caught by
    tests/test_patch.py::test_patch_stack_split_across_cow_resume)."""
    ckpt_arr = None
    if checkpoints:
        ckpt_arr = np.full(num_partitions, -1, dtype=np.int64)
        for p_, l_ in checkpoints.items():
            ckpt_arr[p_] = l_

    def process(batch: pa.Table) -> pa.Table:
        if prior:
            n = len(batch)
            if "op" in batch.column_names:
                # tombstone lake: the stored op IS the row's state (a 'D'
                # row must re-commit as a tombstone, not resurrect as 'I')
                ops = batch.column("op").cast(pa.string())
                batch = batch.drop_columns(["op"]).append_column("op", ops)
            else:
                batch = batch.append_column("op", pa.array(["I"] * n, pa.string()))
        batch = conform_batch(batch, event_schema)
        if verify_content and not prior and len(batch):
            bad = pc.and_(
                pc.invert(
                    pc.is_in(
                        batch.column("op"), value_set=pa.array(["D", "P"])
                    )
                ),
                pc.is_null(batch.column("content")),
            )
            n_bad = pc.sum(bad.cast(pa.int64())).as_py() or 0
            if n_bad:
                raise ValueError(
                    f"{n_bad} winning I/U event(s) carry null content: this "
                    "log mixes content-bearing deletes with null-content "
                    "upserts in the same row group, defeating the footer-"
                    "stats content gate.  No partition has committed.  "
                    "Re-run with ReplayConfig(content_check='decode') for "
                    "the exact per-row gate."
                )
        for col in ("repo", "path"):
            i = batch.schema.get_field_index(col)
            batch = batch.set_column(
                i, batch.schema.field(i), pc.utf8_trim_whitespace(batch.column(col))
            )
        kh = key_hash(batch.column("repo"), batch.column("path"))
        parts = (kh % np.uint64(num_partitions)).astype(np.int64)
        if ckpt_arr is not None and not prior and len(batch):
            lsn = batch.column("lsn").to_numpy(zero_copy_only=False)
            keep = lsn > ckpt_arr[parts]
            if not keep.all():
                batch = batch.filter(pa.array(keep))
                parts = parts[keep]
                kh = kh[keep]
        batch = batch.append_column(PART_COLUMN, pa.array(parts))
        batch = batch.append_column(KEY_HASH_COL, pa.array(kh.view(np.int64)))
        return batch

    return process


def _make_extract_process(
    event_schema: pa.Schema,
    num_partitions: int,
    winners_ref,
    prior: bool,
):
    """Phase-2: keep only winning-LSN rows, conform, route."""
    conform = _make_conform_winners(event_schema, num_partitions, prior)

    def process(batch: pa.Table) -> pa.Table:
        payload = ray.get(winners_ref)  # zero-copy numpy view from plasma
        lsn = batch.column("lsn").to_numpy(zero_copy_only=False)
        hit = winner_membership(payload, lsn)
        return conform(batch.filter(pa.array(hit)))

    return process


def _fragment_tasks(
    scan, target_rows: int, side_whole_files: bool = False
) -> list[dict]:
    """Pack each file's row groups into ~``target_rows``-row read tasks.

    Footer metadata only (collected once in ``scan_change_log``).  Row-group
    granularity is exactly how ``read_parquet`` splits work too — this just
    moves the split plan to the driver so the fused feed below can decode
    inside the task.
    """
    items: list[dict] = []
    side = getattr(scan, "side_content", None) or {}
    for f in scan.files:
        rgs = (scan.row_groups or {}).get(f)
        if rgs is None:  # scan built without metadata (not via scan_change_log)
            rgs = [
                pq.ParquetFile(f).metadata.row_group(i).num_rows
                for i in range(pq.ParquetFile(f).metadata.num_row_groups)
            ]
        if side_whole_files and f in side:
            # side-store meta in the CONTENT-FETCHING phase: ONE fragment
            # per file.  Meta rows are shuffled within the bucket, so each
            # sub-file fragment's winners span the whole bucket and every
            # fragment would re-read the same hot content row groups
            # (measured: 2 fragments/bucket doubled tail content reads,
            # 5.2 GB fetched where 2.6 GB sufficed at 100M events).  File
            # count scales with data, so read parallelism holds.  Phase 1
            # keeps row-group-packed fragments — it never touches content,
            # and halving its task count measured +2.3 s at 100M events.
            items.append({"file": f, "rg_start": 0, "rg_end": len(rgs)})
            continue
        start, rows = 0, 0
        for i, n in enumerate(rgs):
            rows += n
            if rows >= target_rows:
                items.append({"file": f, "rg_start": start, "rg_end": i + 1})
                start, rows = i + 1, 0
        if start < len(rgs):
            items.append({"file": f, "rg_start": start, "rg_end": len(rgs)})
    return items


def _rg_content_valid(
    pf: pq.ParquetFile, rg: int, t: pa.Table, force_decode: bool = False
) -> np.ndarray | bool | None:
    """Content presence for one phase-1 row group WITHOUT decoding content
    in the common cases.  ``t`` is the already-decoded narrow projection.

    Footer ``null_count`` alone can't gate the check: delete tombstones
    legitimately carry null content, so real CDC logs have nulls in every
    row group and a naive ``null_count == 0`` fast path never fires
    (measured: it forced a content decode per row group and doubled the
    100M-event replay wall).  Instead compare against the row group's
    decoded op column:

    - ``null_count == 0`` → every row has content → all valid (None).
    - ``null_count >  #D-rows`` → some I/U row is PROVABLY null → decode
      content for this row group only (cost proportional to corruption).
    - ``0 < null_count <= #D-rows`` → ambiguous: the nulls are almost
      certainly the tombstones'.  Return ``True`` ("optimistically valid,
      UNVERIFIED") — phase 2, which decodes full rows anyway, re-checks the
      WINNERS exactly and fails loudly on the pathological log where a
      delete ships content while an upsert in the same row group ships
      null (see _make_conform_winners).  The lake can never silently
      commit a row the single-phase normalizer would have rejected.

    A file with no content column at all conforms to all-null downstream,
    so its rows are all content-invalid.  Side-store META files
    (ChangeLogSpec.layout="sidestore") carry the EXACT per-row nullity in
    their ``content_null`` bool column — one cheap bool decode, no
    optimism needed."""
    schema = pf.schema_arrow
    if "content_null" in schema.names:
        col = pf.read_row_group(
            rg, columns=["content_null"], use_threads=False
        ).column("content_null")
        return (
            pc.invert(pc.fill_null(col, True))
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
    if "content" not in schema.names:
        return np.zeros(len(t), dtype=bool)
    md = pf.metadata.row_group(rg)
    ci = next(
        (
            i
            for i in range(md.num_columns)
            if md.column(i).path_in_schema == "content"
        ),
        None,
    )
    st = md.column(ci).statistics if ci is not None else None
    if not force_decode and st is not None and st.has_null_count:
        if st.null_count == 0:
            return None
        n_exempt = pc.sum(
            pc.is_in(t.column("op"), value_set=pa.array(["D", "P"])).cast(
                pa.int64()
            )
        ).as_py()
        if st.null_count <= (n_exempt or 0):
            return True  # ambiguous: optimistic, verified on winners in p2
    col = pf.read_row_group(rg, columns=["content"], use_threads=False).column(
        "content"
    )
    return pc.is_valid(col).combine_chunks().to_numpy(zero_copy_only=False)


def _write_quarantine(quarantine_dir: str, frag: dict, tables: list[pa.Table]) -> None:
    """Dead-letter sink: one Parquet file per fragment that held rejects.

    The name is a pure function of the fragment (source file + row-group
    range), and the content is a pure function of the log bytes — so a
    retried task, or a whole re-run over the same log, rewrites the SAME
    file instead of appending duplicates (idempotent, like the lake sink:
    temp write → atomic rename)."""
    import hashlib as _hl

    os.makedirs(quarantine_dir, exist_ok=True)
    tag = _hl.sha1(frag["file"].encode()).hexdigest()[:10]
    stem = os.path.splitext(os.path.basename(frag["file"]))[0]
    fname = f"rej-{tag}-{stem}-rg{frag['rg_start']}-{frag['rg_end']}.parquet"
    fpath = os.path.join(quarantine_dir, fname)
    tmp = fpath + ".inprogress"
    pq.write_table(
        pa.concat_tables(tables, promote_options="permissive"), tmp,
        compression="zstd",
    )
    os.replace(tmp, fpath)


def _attach_side_content(
    side: dict, kept: list[pa.Table], rejects: list[pa.Table]
) -> tuple[list[pa.Table], list[pa.Table], int]:
    """Late materialization: fetch ONLY the content row groups that hold
    the surviving rows' LSNs from the file's ``*.content.parquet``
    sibling (sorted by lsn, small row groups), and attach ``content`` in
    place of the meta ``content_null`` marker.

    On update-heavy logs winners concentrate in the log tail (the chance
    an early event is its key's LAST shrinks exponentially with the
    updates-per-key rate), so most early content row groups are never
    read — this is the whole point of the side-store layout.  Returns
    (kept', rejects', compressed_content_bytes_read)."""
    tabs = kept + rejects
    lsns = [
        t.column("lsn").to_numpy(zero_copy_only=False)
        for t in tabs
        if len(t)
    ]
    need = (
        np.unique(np.concatenate(lsns)) if lsns else np.zeros(0, np.int64)
    )
    cpf = pq.ParquetFile(side["path"])
    ctype = cpf.schema_arrow.field("content").type
    nbytes = 0
    if need.size:
        # A row group without lsn statistics (lo is None) can never be
        # proven irrelevant — fetch it unconditionally.  Engine-written
        # siblings always carry stats, but convert_log_to_sidestore
        # accepts foreign parquet; silently skipping a stat-less group
        # would hand winners NULL content with no error.
        sel = [
            i
            for i, (lo, hi) in enumerate(side["rg_lsn"])
            if lo is None
            or np.searchsorted(need, lo, "left")
            < np.searchsorted(need, hi, "right")
        ]
        ctabs = (
            [cpf.read_row_groups(sel, columns=["lsn", "content"],
                                 use_threads=False)]
            if sel
            else []
        )
        nbytes = int(sum(side["rg_bytes"][i] for i in sel))
    else:
        ctabs = []
    if ctabs:
        ctab = pa.concat_tables(ctabs)
        clsn = ctab.column("lsn").to_numpy(zero_copy_only=False)
        ccontent = ctab.column("content").combine_chunks()
    else:
        clsn = np.zeros(0, np.int64)
        ccontent = pa.nulls(0, ctype)

    def attach(t: pa.Table) -> pa.Table:
        if "content_null" in t.column_names:
            t = t.drop_columns(["content_null"])
        n = len(t)
        if n == 0 or len(clsn) == 0:
            return t.append_column("content", pa.nulls(n, ctype))
        tl = t.column("lsn").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(clsn, tl)
        inb = pos < len(clsn)
        found = inb.copy()
        found[inb] = clsn[pos[inb]] == tl[inb]
        vals = ccontent.take(pa.array(np.where(found, pos, 0)))
        content = pc.if_else(
            pa.array(found), vals, pa.scalar(None, type=ctype)
        )
        return t.append_column("content", content)

    return [attach(t) for t in kept], [attach(t) for t in rejects], nbytes


def _make_fused_feed(
    process_fn,
    actors: list,
    num_partitions: int,
    columns: list[str] | None,
    winners_ref=None,
    check_content: str | None = None,
    quarantine_dir: str | None = None,
    side_content: dict | None = None,
):
    """One task = read a few row groups -> (optional winner filter) ->
    process -> route.  Replaces ``read_parquet(...).map_batches(feeder)``
    for the late strategy's two feeds.

    Why not the stock reader pipeline: with ``read_parquet`` the decoded
    block either transits the object store or (fused) is sliced into
    row-batches that COPY each content payload to task heap before the
    winner filter can drop 95% of it; decoding the row group in-task and
    filtering IMMEDIATELY means loser rows' content never leaves the
    decoder's heap and is freed per row group.  Interleaved A/B on a
    100M-event log at 32 cpus: 10.3s vs 12.3-15.8s for the stock phase-2
    feed.  Still the Dataset API end to end — the fragment list is itself
    a Dataset, so streaming backpressure, retries and scheduling stay with
    Ray Data; this is the documented "custom datasource" shape, with the
    filter pushed inside the read task (the winner bitmap can't be
    expressed as a serializable ``read_parquet`` filter without shipping
    the whole winner set per task).
    """
    feeder = make_feeder(process_fn, actors, num_partitions)

    def feed(batch: pa.Table) -> pa.Table:
        payload = ray.get(winners_ref) if winners_ref is not None else None
        kept: list[pa.Table] = []
        quarantined = 0
        content_bytes = 0
        for row in batch.to_pylist():
            side = (side_content or {}).get(row["file"])
            pf = pq.ParquetFile(row["file"])
            rejects: list[pa.Table] = []
            file_kept: list[pa.Table] = []
            for rg in range(row["rg_start"], row["rg_end"]):
                t = pf.read_row_group(rg, columns=columns, use_threads=False)
                if check_content and check_content != "off":
                    cv = _rg_content_valid(
                        pf, rg, t, force_decode=(check_content == "decode")
                    )
                    if isinstance(cv, np.ndarray):
                        t = t.append_column(CONTENT_VALID_COL, pa.array(cv))
                if quarantine_dir is not None:
                    # full-fidelity dead-letter capture happens HERE, in the
                    # wide phase-2 read (this row group is decoded anyway) —
                    # the rejects can never be winners, so the filter below
                    # drops them from the lake path regardless.  Side-store
                    # meta rows supply content nullity out-of-band; reject
                    # payloads are fetched with the winners below.
                    if side is not None and "content_null" in t.column_names:
                        cvq = (
                            pc.invert(pc.fill_null(t.column("content_null"), True))
                            .combine_chunks()
                            .to_numpy(zero_copy_only=False)
                        )
                        v, reasons = event_validity(t, content_valid=cvq)
                    else:
                        v, reasons = event_validity(t)
                    if v is not None:
                        r = t.filter(pa.array(~v)).append_column(
                            REJECT_REASON_COL, pa.array(list(reasons[~v]))
                        )
                        rejects.append(r)
                        quarantined += len(r)
                if payload is not None:
                    hit = winner_membership(
                        payload, t.column("lsn").to_numpy(zero_copy_only=False)
                    )
                    if not hit.any():
                        continue
                    t = t.filter(pa.array(hit))
                file_kept.append(t)
            if side is not None and payload is not None:
                # phase-2 late materialization: winners (and any rejects)
                # get their payloads from the lsn-sorted content sibling,
                # reading only the row groups their LSNs land in
                file_kept, rejects, nb = _attach_side_content(
                    side, file_kept, rejects
                )
                content_bytes += nb
            if rejects:
                _write_quarantine(quarantine_dir, row, rejects)
            kept.extend(file_kept)
        if not kept:
            return pa.table({
                "routed": [0], "rejected": [quarantined],
                "content_bytes": [content_bytes],
            })
        ack = feeder(pa.concat_tables(kept, promote_options="permissive"))
        if quarantined:
            rej = int(ack.column("rejected")[0].as_py()) + quarantined
            ack = ack.set_column(
                ack.schema.get_field_index("rejected"),
                "rejected",
                pa.array([rej], pa.int64()),
            )
        ack = ack.append_column(
            "content_bytes", pa.array([content_bytes] * len(ack), pa.int64())
        )
        return ack

    return feed


def _run_fused_feed(items: list[dict], feed) -> int:
    """Drive the fused feed with streaming backpressure and return the
    summed ack counters (rejects; side-store content bytes read).

    The acks are summed DRIVER-side over ``take_all()`` — one tiny row per
    fragment task, ~4×CPUs of them.  ``Dataset.sum()`` would plan an
    all-to-all Aggregate operator after the feed (measured +21s on a
    100M-event replay) for what is a few-KB reduction."""
    rows = (
        ray.data.from_items(items, override_num_blocks=len(items))
        .map_batches(feed, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .take_all()
    )
    return {
        "rejected": int(sum(r["rejected"] for r in rows)),
        "content_bytes": int(sum(r.get("content_bytes") or 0 for r in rows)),
    }


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
    (``src/etl_pipeline.py:364-373`` + the stubbed watermark ``:238-245``).
    """
    cfg = cfg or ReplayConfig()
    if cfg.quarantine_dir is not None and cfg.exchange != "late":
        # The dead-letter sink's idempotence contract (retries/re-runs
        # rewrite, never duplicate) needs the late strategy's deterministic
        # fragment identity; the other exchanges read through Ray blocks
        # whose boundaries aren't stable across runs.  Fail loudly rather
        # than silently skip the capture.
        raise ValueError(
            "quarantine_dir requires exchange='late' (the default); "
            f"exchange={cfg.exchange!r} cannot capture rejects idempotently"
        )
    if (
        sink is not None
        and sink.merge_on_read
        and cfg.exchange != "late"
    ):
        # Delta commits ride phase 2's extracted-winner path; the 'actor'
        # and 'groupby' comparison modes fold prior state in one pass and
        # would silently degrade MOR back to copy-on-write.
        raise ValueError(
            "SinkConfig.merge_on_read requires exchange='late' (the "
            f"default); exchange={cfg.exchange!r} has no delta commit path"
        )
    if sink is not None and sink.out_dir != out_dir:
        # Two sources of truth for the lake location is a silent-misroute
        # footgun (the manifests land where ``sink`` points while resume
        # reads where ``out_dir`` points).  Require agreement.
        raise ValueError(
            f"sink.out_dir={sink.out_dir!r} disagrees with out_dir="
            f"{out_dir!r}; pass SinkConfig(out_dir=<same path>, ...)"
        )
    sink = sink or SinkConfig(out_dir=out_dir)
    t0 = time.time()

    manifests = mf.read_all_manifests(out_dir)
    if resume and manifests:
        versions = {
            m["stats"].get("key_hash_version", 1) for m in manifests.values()
        }
        if versions != {KEY_HASH_VERSION}:
            stored = sorted(versions)
            # Partition layout is key_hash % P: under a different hash the
            # same key routes elsewhere, so per-partition checkpoint pruning
            # mis-applies and a moved key's old copy survives in its former
            # partition file — silent duplicates.  Refuse; a FULL replay
            # rebuilds every partition under the current mapping.
            raise ValueError(
                f"lake was committed with key_hash_version={stored} but this "
                f"engine routes with version {KEY_HASH_VERSION}; resume "
                "would migrate keys across partitions and duplicate rows. "
                "Re-run WITHOUT resume to rebuild the lake."
            )
    if resume and manifests:
        stored_tomb = {
            m["stats"].get("keep_tombstones", False) for m in manifests.values()
        }
        if stored_tomb != {sink.keep_tombstones}:
            # Mixing modes silently changes merge semantics: resuming a
            # tombstone lake without the flag would re-enter 'D' rows as
            # live 'I' state; resuming a plain lake WITH it can't supply
            # the tombstones late events need to lose against.
            raise ValueError(
                f"lake was committed with keep_tombstones={sorted(stored_tomb)} "
                f"but SinkConfig.keep_tombstones={sink.keep_tombstones}; "
                "resume must keep the lake's setting"
            )
    mor = bool(sink.merge_on_read and resume and manifests)
    if resume and manifests and not mor and not sink.keep_tombstones:
        chained = sorted(_chained_parts(manifests))
        if chained:
            # A copy-on-write resume bulk-reads prior state with a fixed
            # column list; a PLAIN lake's base files carry no ``op``
            # column while its chained delta files do, so that read
            # cannot see the chain's tombstones and a deleted key would
            # resurrect.  (Tombstone lakes chain-resume fine either way —
            # every file carries op.)  Refuse; compaction restores the
            # single-file layout.
            raise ValueError(
                f"lake has merge-on-read delta chains on partitions "
                f"{chained[:8]}{'…' if len(chained) > 8 else ''}; a plain "
                "lake cannot resume copy-on-write over a chain. Resume "
                "with SinkConfig(merge_on_read=True) or run "
                "compact_lake() first."
            )
    # Watermark pruning is valid only for logs append-only in LSN
    # (cfg.watermark_prune; fan-in feeds interleave per-source LSN spaces
    # and turn it off — correctness then comes from fold idempotence +
    # persisted tombstones).
    ckpts = mf.checkpoints(manifests) if (resume and cfg.watermark_prune) else None
    # File-level pruning is safe ONLY when every partition has a committed
    # checkpoint: after a partial crash (some partitions never committed),
    # the survivors' high-water marks must not prune files that still hold
    # the missing partitions' events — a missing partition's checkpoint is
    # effectively -1, so no file can be skipped.  Row-level per-partition
    # pruning below is always safe (missing partitions default to -1).
    min_lsn = None
    if ckpts:
        expected_n = next(iter(manifests.values()))["stats"].get(
            "num_partitions", max(manifests) + 1
        )
        if len(ckpts) >= expected_n:
            min_lsn = min(ckpts.values())
    prior_files: list[str] = []
    if resume and manifests:
        prior_files = mf.manifest_data_files(out_dir, manifests)
    extra_schemas = []
    for f in prior_files:
        s = pq.ParquetFile(f).schema_arrow
        extra_schemas.append(
            pa.schema([fl for fl in s if fl.name not in ("content_sha256",)])
        )

    scan = scan_change_log(log_dir, min_lsn=min_lsn, extra_schemas=extra_schemas)
    event_schema = scan.schema
    out_schema = output_schema_for(event_schema, keep_op=sink.keep_tombstones)

    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    # Blocks scale with data (~64 MiB each) but never below 4 waves per
    # CPU: with exactly one block per core the slowest block gates the
    # whole phase (measured as an ~12s Amdahl serial term on a 10M-event
    # log — 1->8 cpu speedup was 2.8x; four waves of quarter-size blocks
    # let the scheduler smooth the tail).  Partitions stay ~256 MiB of
    # input each; shuffle fragment count is blocks × partitions — both
    # proportional to data so the exchange never degenerates into tens of
    # thousands of tiny transfers.
    num_blocks = max(4 * ncpu, scan.total_bytes // (64 << 20))
    if resume and manifests:
        num_partitions = next(iter(manifests.values()))["stats"].get(
            "num_partitions", max(manifests) + 1
        )
    else:
        num_partitions = cfg.num_partitions or max(
            ncpu, scan.total_bytes // (256 << 20)
        )
        if cfg.num_partitions is None:
            # round UP to a multiple of the actor pool so finalize rounds
            # are balanced (3 partitions on 2 actors = one actor does 2)
            pool = max(1, min(num_partitions, ncpu))
            num_partitions = -(-num_partitions // pool) * pool
    num_actors = max(1, min(num_partitions, ncpu))

    resume_manifests = manifests if resume else {}
    prior_epochs = {part: m["epoch"] for part, m in manifests.items()}
    commit_args = {
        "out_schema": out_schema.serialize().to_pybytes(),
        "sink_dir": sink.out_dir,
        "prior_manifests": resume_manifests,
        "prior_epochs": prior_epochs,
        "num_partitions": num_partitions,
        "compression": sink.compression,
        "cluster_by_key": sink.cluster_by_key,
        "keep_epochs": sink.keep_epochs,
        "keep_tombstones": sink.keep_tombstones,
        "row_group_rows": sink.row_group_rows,
    }
    if mor:
        # Merge-on-read: prior state never re-reads — neither phase feeds
        # it.  Committers get each partition's chain metadata (files,
        # physical rows, checkpoint) to chain deltas / bound the chain;
        # delta files keep ``op`` regardless of the lake's tombstone mode.
        commit_args["merge_on_read"] = True
        commit_args["max_delta_files"] = sink.max_delta_files
        commit_args["delta_schema"] = output_schema_for(
            event_schema, keep_op=True
        ).serialize().to_pybytes()
        commit_args["prior_chains"] = {
            part: {
                "files": list(m.get("files", [])),
                "rows": int(m.get("rows", 0)),
                "max_lsn": int(m.get("max_lsn", -1)),
            }
            for part, m in manifests.items()
        }

    phase_times: dict[str, float] = {}
    if cfg.exchange == "late":
        metrics_rows = _replay_late(
            scan, [] if mor else prior_files, cfg, commit_args, num_blocks,
            num_partitions, num_actors, event_schema, ckpts, phase_times,
        )
    elif cfg.exchange == "actor":
        from ..stages.exchange import run_exchange

        normalizer = make_normalizer(
            event_schema, num_partitions, checkpoints=ckpts,
            combine=cfg.combine_before_shuffle,
            strict=not cfg.drop_invalid,
            allow_patches=cfg.watermark_prune,
        )
        ds = read_change_log(scan, num_blocks=num_blocks, concurrency=cfg.read_concurrency)
        metrics_rows = run_exchange(
            ds, normalizer, _fold_commit_fn, commit_args, num_partitions,
            num_actors, cfg.batch_size,
            compact_fn=(lambda t: fold_latest(t, keep_tombstones=True)),
        )
    elif cfg.exchange == "groupby":
        if not cfg.allow_comparison_modes:
            raise ValueError(
                "exchange='groupby' is a comparison-only mode (measured "
                "15-40x slower than 'late' on content-heavy logs); set "
                "ReplayConfig(allow_comparison_modes=True) to run it in a "
                "correctness cross-check"
            )
        metrics_rows = _replay_groupby(
            scan, cfg, commit_args, num_blocks, num_partitions, event_schema, ckpts
        )
    else:
        raise ValueError(f"unknown exchange: {cfg.exchange}")

    metrics = pd.DataFrame(metrics_rows)
    committed_parts = set(metrics["part"]) if len(metrics) else set()
    summary = {
        "mode": "resume" if resume else "full",
        "exchange": cfg.exchange,
        "files_scanned": len(scan.files),
        "files_pruned": scan.pruned_files,
        "partitions_committed": len(metrics),
        "partitions_skipped": len(set(resume_manifests) - committed_parts),
        "events_in": int(metrics["events_in"].sum()) if len(metrics) else 0,
        "live_rows": int(metrics["live_rows"].sum()) if len(metrics) else 0,
        "deleted_keys": int(metrics["deleted_keys"].sum()) if len(metrics) else 0,
        "orphan_events_applied": int(metrics["orphan_events_applied"].sum())
        if len(metrics)
        else 0,
        "orphan_deletes": int(metrics["orphan_deletes"].sum()) if len(metrics) else 0,
        "duration_s": round(time.time() - t0, 4),
        "num_partitions": num_partitions,
        "num_blocks": int(num_blocks),
        **phase_times,
    }
    if mor:
        summary["merge_on_read"] = True
        summary["partitions_delta_committed"] = (
            int((metrics["kind"] == "delta").sum())
            if "kind" in metrics
            else 0
        )
        summary["partitions_compacted_inline"] = (
            int(metrics["compacted_chain"].notna().sum())
            if "compacted_chain" in metrics
            else 0
        )
        summary["bytes_written"] = (
            int(metrics["bytes_written"].sum()) if len(metrics) else 0
        )
    os.makedirs(out_dir, exist_ok=True)
    # Every partition is now caught up to the scan's footer-stat max LSN
    # (this run applied ALL scanned events) — stamp the lake-level high
    # water so lake_lag can prove catch-up without reading data.  Written
    # last: a crash earlier only over-reports lag.
    summary["log_hwm"] = mf.write_log_hwm(out_dir, scan.max_lsn)
    with open(os.path.join(out_dir, "run_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    return ReplayResult(metrics=metrics, summary=summary)


def _collect_finalize_timings(actors, phase_times: dict, tag: str) -> None:
    """Fold the exchange actors' per-partition finalize breakdowns into the
    run summary: the max is the straggler that gates the phase wall, the
    sum over max-per-actor gap exposes host contention (identical work
    running slower when every core is busy)."""
    per_part = {}
    for t in ray.get([a.finalize_timings.remote() for a in actors]):
        per_part.update(t)
    if not per_part:
        return
    fn_s = [v["fn_s"] for v in per_part.values()]
    concat_s = [v["concat_s"] for v in per_part.values()]
    phase_times[f"{tag}_fn_s_sum"] = round(sum(fn_s), 3)
    phase_times[f"{tag}_fn_s_max"] = round(max(fn_s), 3)
    phase_times[f"{tag}_concat_s_sum"] = round(sum(concat_s), 3)
    phase_times[f"{tag}_concat_s_max"] = round(max(concat_s), 3)
    # total bytes routed through this exchange = the phase's would-be
    # network volume on a multi-node cluster (Arrow buffer bytes summed
    # actor-side at add time)
    phase_times[f"{tag}_routed_mb"] = round(
        sum(v.get("bytes", 0) for v in per_part.values()) / 2**20, 3
    )
    slowest = max(per_part, key=lambda p: per_part[p]["fn_s"])
    phase_times[f"{tag}_fn_max_part"] = int(slowest)
    phase_times[f"{tag}_fn_max_rows"] = int(per_part[slowest]["rows"])


def _replay_late(
    scan, prior_files, cfg, commit_args, num_blocks, num_partitions, num_actors,
    event_schema, ckpts, phase_times: dict | None = None,
) -> list[dict]:
    if phase_times is None:
        phase_times = {}
    _t0 = time.time()
    from ..stages.exchange import ExchangeActor, make_feeder
    import ray.cloudpickle as pickle

    # ---- phase 1: winner selection over (lsn, op, repo, path) only ----
    # Task granularity mirrors the old num_blocks heuristic (~4 waves/cpu,
    # ~64 MiB of input each) but as row-group-packed fragment tasks for the
    # fused in-task reader; the fragment count scales with DATA, so at
    # cluster scale the item list stays ~4 × cluster CPUs, not per-row.
    total_rows = sum(sum(v) for v in (scan.row_groups or {}).values())
    target_rows = max(1, total_rows // num_blocks) if total_rows else 1
    frag_items = _fragment_tasks(scan, target_rows) if scan.files else []
    side_content = getattr(scan, "side_content", None) or {}
    frag_items_p2 = (
        _fragment_tasks(
            scan, target_rows,
            side_whole_files=(cfg.sidestore_fragmenting != "latency"),
        )
        if scan.files and side_content
        else frag_items
    )
    if side_content and cfg.content_sidestore == "reject":
        raise ValueError(
            "this change log uses the content side-store layout and "
            "ReplayConfig(content_sidestore='reject') forbids reading it"
        )
    actors = [
        ExchangeActor.remote(
            pickle.dumps(lambda t: fold_latest(t, keep_tombstones=True)),
        )
        for _ in range(num_actors)
    ]
    phase_times["events_rejected"] = 0
    if frag_items:
        feed1 = _make_fused_feed(
            _make_phase1_process(
                num_partitions, ckpts, combine=cfg.phase1_combine,
                combine_mode=cfg.phase1_combine_mode,
                strict=not cfg.drop_invalid,
                allow_patches=cfg.watermark_prune,
            ),
            actors,
            num_partitions,
            columns=PHASE1_COLUMNS,
            check_content=cfg.content_check,
        )
        phase_times["events_rejected"] = _run_fused_feed(frag_items, feed1)[
            "rejected"
        ]
    # Merge-on-read needs delete winners IN the winner set: they commit as
    # delta tombstone rows (phase 2 must extract them), exactly like a
    # tombstone lake's — so winner selection keeps them in both modes.
    keep_tomb = bool(
        commit_args.get("keep_tombstones", False)
        or commit_args.get("merge_on_read", False)
    )
    if prior_files:
        dsp = ray.data.read_parquet(
            prior_files,
            columns=["repo", "path", "lsn"] + (["op"] if keep_tomb else []),
            override_num_blocks=num_actors,
        )
        feedp = make_feeder(
            _make_prior_phase1_process(num_partitions, keep_tombstones=keep_tomb),
            actors, num_partitions,
        )
        dsp.map_batches(
            feedp, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=cfg.batch_size or 1_000_000,
        ).count()
    phase_times["phase1_feed_s"] = round(time.time() - _t0, 3)
    _t0 = time.time()
    fn_ser = pickle.dumps(_winners_fn)
    phase1 = [
        r
        for rows in ray.get(
            [
                a.finalize.remote(fn_ser, {"keep_tombstones": keep_tomb})
                for a in actors
            ]
        )
        for r in rows
    ]
    if not phase1:
        for a in actors:
            ray.kill(a)
        return []
    # Resume no-op skip: a partition whose phase-1 input was ONLY prior
    # state (zero new events) is untouched — keep its manifest as-is.
    phase1 = [
        r
        for r in phase1
        if not (
            r["stats"]["events_in"] == 0
            and r["part"] in commit_args["prior_manifests"]
        )
    ]
    if not phase1:
        for a in actors:
            ray.kill(a)
        return []
    stats_per_part = {r["part"]: r["stats"] for r in phase1}
    # Build the merged winner filter OFF the driver: per-partition winner
    # arrays were ray.put by the phase-1 actors (which OWN those objects),
    # so the merge task must complete before the actors are killed.
    winners_ref = _build_winner_filter_task.remote(
        *[r["winners_ref"] for r in phase1]
    )
    _collect_finalize_timings(actors, phase_times, "p1")
    ray.wait([winners_ref], num_returns=1)
    for a in actors:
        ray.kill(a)
    phase_times["phase1_finalize_s"] = round(time.time() - _t0, 3)
    _t0 = time.time()

    # ---- phase 2: extract winner rows, route to committers ----
    extract_args = {**commit_args, "stats_per_part": stats_per_part}
    actors2 = [ExchangeActor.remote() for _ in range(num_actors)]
    if frag_items:
        # Fused in-task read: decode a row group, drop the ~95% loser rows
        # IMMEDIATELY, concat only winners across the task's row groups,
        # conform + route once.  Loser content never transits the object
        # store and is freed per row group — the stock reader pipeline
        # either pinned whole decoded blocks through the ack barrier
        # (batch_size=None: measured 5x slower at 100M events) or paid a
        # full content memcpy in the row-batch coalesce (batch_size=1M:
        # measured 12.3-15.8s vs 10.3s fused, interleaved min).
        feed2 = _make_fused_feed(
            _make_conform_winners(
                event_schema, num_partitions, prior=False,
                verify_content=(cfg.content_check != "off"),
                checkpoints=ckpts,
            ),
            actors2,
            num_partitions,
            columns=None,
            winners_ref=winners_ref,
            quarantine_dir=cfg.quarantine_dir,
            side_content=side_content,
        )
        res2 = _run_fused_feed(frag_items_p2, feed2)
        quarantined = res2["rejected"]
        if cfg.quarantine_dir is not None:
            phase_times["events_quarantined"] = quarantined
        if side_content:
            # late-materialization receipts: compressed content bytes the
            # selective fetch actually read vs the sibling files' total
            phase_times["p2_content_bytes_read"] = res2["content_bytes"]
            phase_times["p2_content_bytes_total"] = int(
                sum(v["bytes"] for v in side_content.values())
            )
    if prior_files:
        dsp2 = ray.data.read_parquet(prior_files, override_num_blocks=num_actors)
        feedp2 = make_feeder(
            _make_extract_process(event_schema, num_partitions, winners_ref, prior=True),
            actors2,
            num_partitions,
        )
        dsp2.map_batches(
            feedp2, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=cfg.batch_size,
        ).count()
    phase_times["phase2_feed_s"] = round(time.time() - _t0, 3)
    _t0 = time.time()
    fn2_ser = pickle.dumps(_commit_extracted_fn)
    metrics_rows = [
        r
        for rows in ray.get([a.finalize.remote(fn2_ser, extract_args) for a in actors2])
        for r in rows
    ]
    _collect_finalize_timings(actors2, phase_times, "p2")
    for a in actors2:
        ray.kill(a)

    phase_times["phase2_commit_s"] = round(time.time() - _t0, 3)
    # Partitions phase 1 saw but phase 2 routed nothing for (all keys
    # deleted) still need a commit superseding any prior state.
    committed = {m["part"] for m in metrics_rows}
    for part, st in stats_per_part.items():
        if part not in committed:
            empty = pa.schema(
                list(event_schema) + [pa.field(KEY_HASH_COL, pa.int64())]
            ).empty_table()
            metrics_rows.append(_commit_extracted_fn(part, empty, extract_args))
    return metrics_rows


def _replay_groupby(
    scan, cfg, commit_args, num_blocks, num_partitions, event_schema, ckpts
) -> list[dict]:
    normalizer = make_normalizer(
        event_schema, num_partitions, checkpoints=ckpts,
        combine=cfg.combine_before_shuffle,
        strict=not cfg.drop_invalid,
        allow_patches=cfg.watermark_prune,
    )

    def partition_task(group: pa.Table) -> pa.Table:
        part = int(group.column(PART_COLUMN)[0].as_py())
        return pa.Table.from_pylist([_fold_commit_fn(part, group, commit_args)])

    ds = read_change_log(scan, num_blocks=num_blocks, concurrency=cfg.read_concurrency)
    ds = ds.map_batches(
        normalizer, batch_format="pyarrow", batch_size=cfg.batch_size,
        zero_copy_batch=True,
    )
    return (
        ds.groupby(PART_COLUMN).map_groups(partition_task, batch_format="pyarrow").take_all()
    )


def read_lake(
    out_dir: str,
    columns: list[str] | None = None,
    filter: Any | None = None,
    asof_epoch: int | None = None,
    pinned_epochs: dict[int, int] | None = None,
    _parts: set[int] | None = None,
    include_tombstones: bool = False,
    _key_filter: bool = False,
) -> ray.data.Dataset:
    """Read the committed lake (manifest-listed files ONLY).

    ``columns`` prunes the projection and ``filter`` (a
    ``pyarrow.dataset`` expression, e.g. ``pc.field("lang") == "py"``)
    pushes the predicate into the Parquet scan — row groups whose
    statistics exclude the predicate are skipped before a byte of data is
    decoded, so a selective lake query reads only what it returns.

    ``asof_epoch`` is a time-travel read: each partition resolves to its
    snapshot manifest at the largest epoch ≤ ``asof_epoch`` (partitions
    commit independently).  Reach equals ``SinkConfig.keep_epochs`` — a
    GC'd snapshot raises rather than silently serving newer data.

    ``_parts`` (internal, used by ``lake_get``) restricts the read to the
    named hash partitions — callers must guarantee every row they want
    lives there (partition routing is ``key_hash % P``).

    Tombstone lakes (``SinkConfig.keep_tombstones``) persist op='D' rows;
    by default those are filtered at the scan (pushed as a Parquet
    predicate, detected from the manifests — no extra I/O for plain
    lakes).  ``include_tombstones=True`` returns them (op + null
    content).

    Merge-on-read lakes (``SinkConfig.merge_on_read``): partitions whose
    manifest chains delta files are folded at read — one task per chained
    partition reads its chain and applies the writer's LWW kernel, so the
    result is row-identical to the copy-on-write lake.  On those
    partitions ``filter`` applies POST-fold (a pre-fold value predicate
    could drop a winner and resurrect an older version) unless
    ``_key_filter=True`` asserts the expression touches key columns only
    (key predicates keep/drop whole key groups, so they commute with the
    fold and push into the chain scan — ``lake_get`` uses this).
    Unchained partitions keep the plain pushdown path.

    ``pinned_epochs`` ({partition: epoch}) resolves each named partition to
    EXACTLY that snapshot epoch — the transactional-read primitive (a
    cross-table snapshot pins per-partition epochs at publish time; see
    ``pipelines/txn.py``).  Unlike ``asof_epoch``'s largest-≤ rule it can
    never be satisfied by a commit made after the pin (partitions epoch
    independently, so a lagging counter could pass an ``asof`` bound).
    Partitions absent from the map were absent at publish and are not
    read.  Mutually exclusive with ``asof_epoch``."""
    if pinned_epochs is not None:
        if asof_epoch is not None:
            raise ValueError("pinned_epochs and asof_epoch are mutually exclusive")
        manifests = mf.manifests_at(out_dir, pinned_epochs)
    else:
        manifests = mf.read_all_manifests(out_dir, asof_epoch=asof_epoch)
    if _parts is not None:
        manifests = {p: m for p, m in manifests.items() if p in _parts}
    chained = _chained_parts(manifests)
    if chained and any(
        manifests[p]["stats"].get("mode") == "aggregate" for p in chained
    ):
        # aggregate chains fold with the ⊕ kernel (reset-aware partial
        # aggregates), not the LWW max-LSN kernel this reader applies
        raise ValueError(
            "this is a merge-on-read AGGREGATE lake; read it with "
            "pipelines.aggregate.read_aggregate_lake (or compact it with "
            "compact_aggregate_lake first)"
        )
    if chained:
        return _read_lake_chained(
            out_dir, manifests, chained, columns=columns, filter=filter,
            include_tombstones=include_tombstones, key_filter=_key_filter,
        )
    files = mf.manifest_data_files(out_dir, manifests)
    if not files:
        # empty lake: a filter over zero rows is a no-op
        return ray.data.from_arrow(REPO_FILES_SCHEMA.empty_table())
    has_tombstones = any(
        m["stats"].get("keep_tombstones", False) for m in manifests.values()
    )
    if has_tombstones and not include_tombstones:
        import pyarrow.dataset as _pads

        live = _pads.field("op") != "D"
        filter = live if filter is None else (filter & live)
    kwargs: dict[str, Any] = {}
    if filter is not None:
        kwargs["filter"] = filter
    # Partition files can disagree on schema after a partial-evolution
    # resume (a resume whose new events touch only some partitions recommits
    # those with evolved columns; untouched partitions keep their old files
    # — by design, they are exactly-once no-ops).  Ray 2.49's reader infers
    # the schema from ONE file, which SILENTLY DROPS evolved columns from a
    # plain read and raises KeyError on a projection naming one — so detect
    # mixedness from the manifests' schema fingerprints (no I/O) and, only
    # then, pass the footer-unified schema explicitly.  columns= and
    # schema= don't compose in this Ray version, so the mixed+projection
    # case selects after the read.
    fingerprints = {
        json.dumps(m.get("schema_fingerprint")) for m in manifests.values()
    }
    if len(fingerprints) > 1:
        unified = pa.unify_schemas(
            [pq.ParquetFile(f).schema_arrow for f in files],
            promote_options="permissive",
        )
        ds = ray.data.read_parquet(
            files, partitioning=None, schema=unified, **kwargs
        )
        return ds.select_columns(columns) if columns is not None else ds
    # The part=K dirs are the sink's layout, not a hive column — do not
    # resurrect them into the schema.  partitioning=None does that, but Ray
    # 2.49's reader crashes on partitioning=None + columns together
    # (UnboundLocalError in parquet_datasource), so with an explicit column
    # list we rely on the projection excluding the hive column instead.
    if columns is not None:
        return ray.data.read_parquet(files, columns=columns, **kwargs)
    return ray.data.read_parquet(files, partitioning=None, **kwargs)


def _read_lake_chained(
    out_dir: str,
    manifests: dict[int, dict],
    chained: set[int],
    columns: list[str] | None,
    filter: Any | None,
    include_tombstones: bool,
    key_filter: bool,
) -> ray.data.Dataset:
    """``read_lake`` over a lake with merge-on-read delta chains: one fold
    task per chained partition (its chain is partition-local, sized like
    the finalize task that committed it), the plain pushdown read for
    everything else, both conformed to one unified schema and unioned.
    See ``read_lake`` for the filter-placement contract."""
    import pyarrow.dataset as pads

    simple_m = {p: m for p, m in manifests.items() if p not in chained}
    simple_files = mf.manifest_data_files(out_dir, simple_m)
    chain_paths = {
        p: (mf.partition_dir(out_dir, p), list(manifests[p]["files"]))
        for p in sorted(chained)
    }
    lake_tomb = any(
        m["stats"].get("keep_tombstones", False) for m in manifests.values()
    )
    all_files = simple_files + [
        os.path.join(d, f) for d, fs in chain_paths.values() for f in fs
    ]
    unified = pa.unify_schemas(
        [pq.ParquetFile(f).schema_arrow for f in all_files],
        promote_options="permissive",
    )
    if "op" in unified.names and not lake_tomb and not include_tombstones:
        # a plain lake's logical schema has no op column — the delta
        # files' op is merge bookkeeping, consumed by the fold
        unified = pa.schema([f for f in unified if f.name != "op"])
    if columns is not None:
        by_name = {f.name: f for f in unified}
        target = pa.schema([by_name[c] for c in columns])
    else:
        target = unified
    target_ser = target.serialize().to_pybytes()
    prefold = filter if (filter is not None and key_filter) else None
    postfold = filter if (filter is not None and not key_filter) else None

    descs = [
        {"pdir": d, "files": fs} for d, fs in chain_paths.values()
    ]

    def fold_desc(df: pd.DataFrame) -> pa.Table:
        tgt = pa.ipc.read_schema(pa.BufferReader(target_ser))
        outs = []
        for _, row in df.iterrows():
            t = _read_chain_folded(
                row["pdir"], list(row["files"]), keep_tombstones=True,
                prefold_filter=prefold, columns=columns,
            )
            if len(t) and not include_tombstones and "op" in t.column_names:
                t = t.filter(pc.invert(op_equal(t.column("op"), "D")))
            if postfold is not None and len(t):
                t = t.filter(postfold)
            outs.append(conform_batch(t, tgt))
        return pa.concat_tables(outs) if outs else tgt.empty_table()

    folded = ray.data.from_items(descs).map_batches(
        fold_desc, batch_format="pandas", batch_size=1
    )
    if not simple_files:
        return folded

    kwargs: dict[str, Any] = {}
    simple_filter = filter
    if lake_tomb and not include_tombstones:
        live = pads.field("op") != "D"
        simple_filter = live if simple_filter is None else (simple_filter & live)
    if simple_filter is not None:
        kwargs["filter"] = simple_filter
    sub = pa.unify_schemas(
        [pq.ParquetFile(f).schema_arrow for f in simple_files],
        promote_options="permissive",
    )

    def conform_simple(t: pa.Table) -> pa.Table:
        tgt = pa.ipc.read_schema(pa.BufferReader(target_ser))
        if (
            "op" in tgt.names
            and ("op" not in t.column_names or t.column("op").null_count)
        ):
            # op-less base rows are live state: surface as 'I', not null
            # (only reachable with include_tombstones on a plain lake)
            col = (
                pc.fill_null(t.column("op").cast(pa.string()), "I")
                if "op" in t.column_names
                else pa.array(["I"] * len(t), pa.string())
            )
            t = (
                t.set_column(t.schema.get_field_index("op"), pa.field("op", pa.string()), col)
                if "op" in t.column_names
                else t.append_column("op", col)
            )
        return conform_batch(t, tgt)

    simple = ray.data.read_parquet(
        simple_files, partitioning=None, schema=sub, **kwargs
    ).map_batches(conform_simple, batch_format="pyarrow", zero_copy_batch=True)
    return simple.union(folded)


def plan_point_read(
    out_dir: str,
    keys: list[tuple[str, str]],
    asof_epoch: int | None = None,
) -> dict[str, Any]:
    """Metadata-only routing plan for a point read: which hash partitions
    (and which of their committed files) can contain the given
    ``(repo, path)`` keys.  Reads manifests only — no Parquet I/O — so on
    a 100-TB lake the plan is O(partitions) JSON reads and the data read
    it feeds touches ≤ ``len(keys)`` partitions out of all of them.

    Refuses a lake committed under a different ``key_hash_version``: the
    routing below would look in the wrong partition and silently return
    "absent" for keys that exist (same hazard class as the resume guard
    at the top of ``replay``)."""
    manifests = mf.read_all_manifests(out_dir, asof_epoch=asof_epoch)
    if manifests:
        versions = {
            m["stats"].get("key_hash_version", 1) for m in manifests.values()
        }
        if versions != {KEY_HASH_VERSION}:
            raise ValueError(
                f"lake committed with key_hash_version={sorted(versions)} "
                f"but this engine routes with version {KEY_HASH_VERSION}; "
                "a point read would probe the wrong partition. Rebuild the "
                "lake (full replay or rescale_lake) first."
            )
    num_partitions = (
        next(iter(manifests.values()))["stats"].get(
            "num_partitions", max(manifests) + 1
        )
        if manifests
        else 0
    )
    plan: dict[str, Any] = {
        "num_partitions": num_partitions,
        "parts": [],
        "files": [],
        "total_partitions": len(manifests),
    }
    if not manifests or not keys:
        return plan
    uniq = sorted(set(keys))
    repos = pa.array([r for r, _ in uniq], pa.string())
    paths = pa.array([p for _, p in uniq], pa.string())
    parts = sorted(set(partition_ids(repos, paths, num_partitions).tolist()))
    # a routed partition absent from the manifests simply holds no rows
    # (e.g. an asof_epoch older than its first commit) — skip, don't fail
    plan["parts"] = [p for p in parts if p in manifests]
    plan["files"] = mf.manifest_data_files(
        out_dir, {p: manifests[p] for p in plan["parts"]}
    )
    return plan


def lake_get(
    out_dir: str,
    keys: list[tuple[str, str]],
    columns: list[str] | None = None,
    asof_epoch: int | None = None,
) -> pa.Table:
    """Keyed point read: the live row for each requested ``(repo, path)``
    key (absent keys — never inserted, or deleted — yield no row).

    The scale shape, in order of pruning power:

    1. ``plan_point_read`` routes each key to its hash partition from
       manifest metadata alone — only the ≤ ``len(keys)`` touched
       partitions are read, however many the lake has.
    2. The touched files are scanned with ``repo IN … AND path IN …``
       pushed into the Parquet scan; on a ``cluster_by_key`` lake the
       key-sorted row groups make this prune to the handful of groups
       whose [min,max] straddle a requested key.
    3. The pushed filter is a CROSS-PRODUCT superset (repo set × path
       set); the exact pair match runs after it.  The superset result is
       bounded by rows sharing a requested repo AND a requested path —
       point-read sized, so the exact match is a driver-side vectorized
       merge on the already-tiny table (annotated: post-filter frame,
       not data-scale).

    Respects ``asof_epoch`` (point-in-time point read).  Returns rows
    sorted by ``(repo, path)`` for determinism."""
    plan = plan_point_read(out_dir, keys, asof_epoch=asof_epoch)
    out_schema = REPO_FILES_SCHEMA
    if not plan["files"]:
        empty = out_schema.empty_table()
        return empty.select(columns) if columns is not None else empty
    uniq = sorted(set(keys))
    repo_set = sorted({r for r, _ in uniq})
    path_set = sorted({p for _, p in uniq})
    expr = pc.field("repo").isin(repo_set) & pc.field("path").isin(path_set)
    # exact match needs the key columns regardless of the projection
    read_cols = (
        sorted(set(columns) | {"repo", "path"}) if columns is not None else None
    )
    ds = read_lake(
        out_dir,
        columns=read_cols,
        filter=expr,
        asof_epoch=asof_epoch,
        _parts=set(plan["parts"]),
        # key-only predicate: commutes with the merge-on-read chain fold,
        # so chained partitions stay point-read sized too
        _key_filter=True,
    )
    tbl = pa.concat_tables(
        ray.get(ds.to_arrow_refs()), promote_options="permissive"
    )
    if len(tbl):
        df = tbl.to_pandas()  # point-read sized (superset of matches)
        want = pd.DataFrame(uniq, columns=["repo", "path"])
        df = df.merge(want, on=["repo", "path"], how="inner")
        df = df.sort_values(["repo", "path"], kind="stable").reset_index(drop=True)
        tbl = pa.Table.from_pandas(df, schema=tbl.schema, preserve_index=False)
    if columns is not None:
        tbl = tbl.select(columns)
    return tbl


def lake_schema_diff(
    out_dir: str, from_epoch: int, to_epoch: int | None = None
) -> dict[str, Any]:
    """Schema drift between two lake snapshots from MANIFEST METADATA
    only (the per-partition (name, type) fingerprints each commit
    records) — no Parquet footer or data reads, so it is free at any
    lake size.  Each epoch's schema is the permissive union across
    partitions (partitions evolve independently under resume); the
    report lists added / removed columns and type changes (widenings
    like string → large_string).  ``to_epoch=None`` means the current
    snapshot.  Raises on a GC'd ``from_epoch`` rather than silently
    diffing newer state (same contract as ``read_lake(asof_epoch=)``)."""
    a = mf.read_all_manifests(out_dir, asof_epoch=from_epoch)
    b = mf.read_all_manifests(out_dir, asof_epoch=to_epoch)
    sa = {
        f.name: str(f.type)
        for f in _schema_from_fingerprints(list(a.values()))
    }
    sb = {
        f.name: str(f.type)
        for f in _schema_from_fingerprints(list(b.values()))
    }
    return {
        "from_epoch": from_epoch,
        "to_epoch": to_epoch if to_epoch is not None else max(
            (m["epoch"] for m in b.values()), default=-1
        ),
        "added": {n: sb[n] for n in sorted(set(sb) - set(sa))},
        "removed": {n: sa[n] for n in sorted(set(sa) - set(sb))},
        "changed": {
            n: [sa[n], sb[n]]
            for n in sorted(set(sa) & set(sb))
            if sa[n] != sb[n]
        },
        "unchanged": sum(
            1 for n in set(sa) & set(sb) if sa[n] == sb[n]
        ),
    }


def repair_partition(
    log_dir: str,
    out_dir: str,
    part: int,
    compression: str = "zstd",
    keep_epochs: int = 1,
) -> dict[str, Any]:
    """Surgical rebuild of ONE partition from the full change log — the
    fix for what ``fsck_lake --deep`` finds (tampered/corrupt data file,
    or a lost manifest), without re-replaying the other P-1 partitions.

    The damaged partition's checkpoint is exactly what cannot be
    trusted, so the scan takes the WHOLE log (no LSN pruning) and keeps
    only rows routing to ``part`` under the lake's committed width and
    hash version — a map-side filter, so the shuffle-free cost is one
    full log read of the key/LSN columns plus one partition's fold.
    The fold is the normal ``finalize_partition`` over the partition's
    complete event history (no prior-state merge — prior state is the
    thing being repaired), committed exactly-once at the next epoch via
    the same manifest machinery as replay.  Works for a MISSING
    partition too (epoch restarts at 0)."""
    manifests = mf.read_all_manifests(out_dir)
    if not manifests:
        raise ValueError(f"no committed lake at {out_dir!r}")
    versions = {m["stats"].get("key_hash_version", 1) for m in manifests.values()}
    if versions != {KEY_HASH_VERSION}:
        raise ValueError(
            f"lake committed with key_hash_version={sorted(versions)}; "
            f"this engine routes with {KEY_HASH_VERSION} — a repair would "
            "rebuild the wrong key set. Full replay required."
        )
    num_partitions = next(iter(manifests.values()))["stats"].get(
        "num_partitions", max(manifests) + 1
    )
    if not (0 <= part < num_partitions):
        raise ValueError(f"part {part} outside 0..{num_partitions - 1}")
    # schema union from the HEALTHY partitions' footers only — the
    # damaged partition's files may be unreadable
    healthy_files = [
        os.path.join(mf.partition_dir(out_dir, p), f)
        for p, m in manifests.items()
        if p != part
        for f in m["files"]
    ]
    extra_schemas = [
        pa.schema(
            [
                fl
                for fl in pq.ParquetFile(f).schema_arrow
                if fl.name not in ("content_sha256",)
            ]
        )
        for f in healthy_files
    ]
    scan = scan_change_log(log_dir, min_lsn=None, extra_schemas=extra_schemas)
    event_schema = scan.schema
    keep_tomb = any(
        m["stats"].get("keep_tombstones", False) for m in manifests.values()
    )
    out_schema = output_schema_for(event_schema, keep_op=keep_tomb)

    def pick(batch: pa.Table) -> pa.Table:
        for col in ("repo", "path", "op"):
            if batch.schema.field(col).type != pa.string():
                i = batch.schema.get_field_index(col)
                batch = batch.set_column(
                    i, pa.field(col, pa.string()), batch.column(col).cast(pa.string())
                )
        valid, _ = event_validity(batch)
        if valid is not None:
            batch = batch.filter(pa.array(valid))
        for col in ("repo", "path"):
            i = batch.schema.get_field_index(col)
            batch = batch.set_column(
                i, batch.schema.field(i), pc.utf8_trim_whitespace(batch.column(col))
            )
        kh = key_hash(batch.column("repo"), batch.column("path"))
        keep = (kh % np.uint64(num_partitions)).astype(np.int64) == part
        batch = batch.filter(pa.array(keep))
        batch = conform_batch(batch, event_schema)
        return batch.append_column(
            KEY_HASH_COL, pa.array(kh[keep].view(np.int64))
        )

    picked = read_change_log(scan).map_batches(
        pick, batch_format="pyarrow", zero_copy_batch=True
    )
    # one partition's complete history — the same size a single replay
    # finalize task holds, assembled here for the one-partition fold
    tables = [t for t in ray.get(picked.to_arrow_refs()) if len(t)]
    history = (
        pa.concat_tables(tables, promote_options="permissive")
        if tables
        else conform_batch(event_schema.empty_table(), event_schema).append_column(
            KEY_HASH_COL, pa.array([], pa.int64())
        )
    )
    final, stats = finalize_partition(history, out_schema, keep_tombstones=keep_tomb)
    args = {
        "sink_dir": out_dir,
        "num_partitions": num_partitions,
        "prior_epochs": {
            p: m["epoch"] for p, m in manifests.items()
        },
        "compression": compression,
        "keep_epochs": keep_epochs,
        "keep_tombstones": keep_tomb,
    }
    metrics = _commit_with_metrics(part, final, stats, args)
    return {
        "part": part,
        "rows": len(final),
        "epoch": metrics["epoch"],
        "events_in": metrics["events_in"],
    }


def lake_lag(log_dir: str, out_dir: str) -> dict[str, Any]:
    """Replication-lag report from METADATA ONLY (manifests + Parquet
    footers — no event data is read, so it is safe to run every minute
    against a 100-TB log): how far the committed lake trails the log.

    Catch-up is judged against the lake-level ``log_hwm`` stamp (the max
    LSN the last successful replay scanned — see
    ``state/manifest.py:write_log_hwm`` for why per-partition checkpoints
    cannot prove it).  ``pending_rows_upper_bound`` counts rows of row
    groups whose footer max-LSN exceeds the applied high water — an upper
    bound because a group can straddle the watermark; the exact number
    requires reading data (that's ``read_lake_with_pending``'s job, not a
    monitor's)."""
    import glob as _glob

    manifests = mf.read_all_manifests(out_dir)
    ck = mf.checkpoints(manifests)
    min_ckpt = min(ck.values(), default=-1)
    # pre-hwm lakes fall back to the max checkpoint — a lower bound on the
    # true applied high water (≤ the last run's scan max), so lag can only
    # be over-reported, never hidden
    applied_hwm = max(mf.read_log_hwm(out_dir), max(ck.values(), default=-1))
    files = sorted(
        _glob.glob(os.path.join(log_dir, "**", "*.parquet"), recursive=True)
    )
    log_max = -1
    log_rows = 0
    pending_files = 0
    pending_rows_ub = 0
    for f in files:
        pf = pq.ParquetFile(f)
        lsn_idx = pf.schema_arrow.get_field_index("lsn")
        md = pf.metadata
        log_rows += md.num_rows
        file_pending = False
        for i in range(md.num_row_groups):
            st = md.row_group(i).column(lsn_idx).statistics
            if st is None:
                # no stats → assume pending (safe over-count)
                pending_rows_ub += md.row_group(i).num_rows
                file_pending = True
                continue
            log_max = max(log_max, st.max)
            if st.max > applied_hwm:
                pending_rows_ub += md.row_group(i).num_rows
                file_pending = True
        pending_files += int(file_pending)
    return {
        "partitions": len(manifests),
        "min_checkpoint_lsn": min_ckpt,
        "max_checkpoint_lsn": max(ck.values(), default=-1),
        "applied_hwm": applied_hwm,
        "log_max_lsn": log_max,
        "lsn_lag": max(0, log_max - applied_hwm),
        "log_files": len(files),
        "log_rows": log_rows,
        "pending_files": pending_files,
        "pending_rows_upper_bound": pending_rows_ub,
        # the row-bound term covers stats-less row groups (counted fully
        # pending above): a log whose footers carry no lsn statistics
        # must never claim catch-up off log_max's -1 sentinel
        "caught_up": log_max <= applied_hwm and pending_rows_ub == 0,
    }


def read_lake_with_pending(log_dir: str, out_dir: str) -> ray.data.Dataset:
    """Freshness read (the lambda view): committed lake state merged with
    the UN-REPLAYED log tail, computed on read — nothing commits, the
    next ``replay(resume=True)`` is unaffected.  This is how a reader
    gets current-as-of-now state between replay epochs instead of waiting
    for the next commit.

    Equals ``lake_table`` after a full replay BY CONSTRUCTION — it runs
    the same machinery: ``scan_change_log`` footer pruning + the same
    per-partition checkpoint row prune, the shared ``event_validity``
    predicate and key trim, ``key_hash % P`` routing under the lake's
    committed width/hash-version, and ``finalize_partition`` over prior
    state re-entered as synthetic 'I' events (the resume fold).  Pinned
    by ``tests/test_replay.py`` against a one-shot replay.

    Scale shape: the tail is by definition the pending increment
    (bounded by replay cadence), so only TOUCHED partitions re-fold —
    each as one task holding that partition's prior rows + tail slice;
    untouched partitions stream straight from their committed files with
    no fold and no hash.  Cost ≈ read(lake) + fold(increment), not
    re-replay(everything)."""
    manifests = mf.read_all_manifests(out_dir)
    if not manifests:
        raise ValueError(
            f"no committed lake at {out_dir!r}; run replay() first — a "
            "pending-merge read needs committed state to merge into"
        )
    versions = {m["stats"].get("key_hash_version", 1) for m in manifests.values()}
    if versions != {KEY_HASH_VERSION}:
        raise ValueError(
            f"lake committed with key_hash_version={sorted(versions)} but "
            f"this engine routes with {KEY_HASH_VERSION}; the tail would "
            "merge into the wrong partitions"
        )
    num_partitions = next(iter(manifests.values()))["stats"].get(
        "num_partitions", max(manifests) + 1
    )
    ckpts = mf.checkpoints(manifests)
    min_lsn = min(ckpts.values()) if len(ckpts) >= num_partitions else None
    ckpt_arr = np.full(num_partitions, -1, dtype=np.int64)
    for part, lsn in ckpts.items():
        ckpt_arr[part] = lsn

    prior_files = mf.manifest_data_files(out_dir, manifests)
    extra_schemas = [
        pa.schema(
            [
                fl
                for fl in pq.ParquetFile(f).schema_arrow
                if fl.name not in ("content_sha256",)
            ]
        )
        for f in prior_files
    ]
    scan = scan_change_log(log_dir, min_lsn=min_lsn, extra_schemas=extra_schemas)
    event_schema = scan.schema
    out_schema = output_schema_for(event_schema)

    def norm_route(batch: pa.Table) -> pa.Table:
        for col in ("repo", "path", "op"):
            if batch.schema.field(col).type != pa.string():
                i = batch.schema.get_field_index(col)
                batch = batch.set_column(
                    i, pa.field(col, pa.string()), batch.column(col).cast(pa.string())
                )
        valid, _ = event_validity(batch)
        if valid is not None:
            batch = batch.filter(pa.array(valid))
        for col in ("repo", "path"):
            i = batch.schema.get_field_index(col)
            batch = batch.set_column(
                i, batch.schema.field(i), pc.utf8_trim_whitespace(batch.column(col))
            )
        kh = key_hash(batch.column("repo"), batch.column("path"))
        parts = (kh % np.uint64(num_partitions)).astype(np.int64)
        if len(batch):
            lsn = batch.column("lsn").to_numpy(zero_copy_only=False)
            keep = lsn > ckpt_arr[parts]
            if not keep.all():
                batch = batch.filter(pa.array(keep))
                parts = parts[keep]
                kh = kh[keep]
        batch = conform_batch(batch, event_schema)
        batch = batch.append_column(PART_COLUMN, pa.array(parts))
        return batch.append_column(KEY_HASH_COL, pa.array(kh.view(np.int64)))

    tail = read_change_log(scan).map_batches(
        norm_route, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    touched = set(int(p) for p in tail.unique(PART_COLUMN)) if tail.count() else set()

    event_schema_ipc = event_schema.serialize().to_pybytes()
    out_schema_ipc = out_schema.serialize().to_pybytes()
    part_manifests = {p: manifests[p] for p in touched if p in manifests}

    def fold_part(g: pa.Table) -> pa.Table:
        ev_schema = pa.ipc.read_schema(pa.BufferReader(event_schema_ipc))
        o_schema = pa.ipc.read_schema(pa.BufferReader(out_schema_ipc))
        part = int(g.column(PART_COLUMN)[0].as_py())
        g = g.drop_columns([PART_COLUMN])
        if part in part_manifests:
            prior = _prior_state_as_events(
                out_dir, part, part_manifests[part], ev_schema
            )
            g = pa.concat_tables([g, prior], promote_options="permissive")
        final, _ = finalize_partition(g, o_schema)
        return final

    folded = tail.groupby(PART_COLUMN).map_groups(
        fold_part, batch_format="pyarrow"
    )

    chained = _chained_parts(manifests)
    base_files = [
        os.path.join(mf.partition_dir(out_dir, p), f)
        for p, m in manifests.items()
        if p not in touched and p not in chained
        for f in m["files"]
    ]

    def conform(t: pa.Table) -> pa.Table:
        # tombstone lake: committed 'D' rows are not part of the LIVE view
        # (touched partitions drop them in the fold; base must match)
        if "op" in t.column_names:
            t = t.filter(pc.invert(op_equal(t.column("op"), "D")))
        o_schema = pa.ipc.read_schema(pa.BufferReader(out_schema_ipc))
        return conform_batch(t, o_schema)

    arms = [folded] if touched else []
    # untouched merge-on-read chains still need the read-side fold
    # (touched chains fold inside fold_part via _prior_state_as_events)
    chained_untouched = chained - touched
    if chained_untouched:
        arms.append(
            read_lake(out_dir, _parts=chained_untouched).map_batches(
                conform, batch_format="pyarrow", zero_copy_batch=True
            )
        )
    if base_files:
        unified = pa.unify_schemas(
            [pq.ParquetFile(f).schema_arrow for f in base_files],
            promote_options="permissive",
        )
        arms.append(
            ray.data.read_parquet(
                base_files, partitioning=None, schema=unified
            ).map_batches(conform, batch_format="pyarrow", zero_copy_batch=True)
        )
    if not arms:
        return folded
    out = arms[0]
    for a in arms[1:]:
        out = out.union(a)
    return out


def rescale_lake(
    src_dir: str,
    dst_dir: str,
    num_partitions: int,
    compression: str = "zstd",
    keep_epochs: int = 1,
) -> dict[str, Any]:
    """Rewrite a committed lake to a different partition count (the
    compaction/maintenance operation for a whole-partition-epoch sink).

    A long-lived lake accumulates layout debt: a replay sized for last
    year's volume may have left 4096 near-empty partitions (small-file
    problem) or 8 overstuffed ones (task-heap problem).  The sink never
    appends — each epoch rewrites whole partitions — so "compaction" here
    means re-hashing every row to a new partition count.  Streams via
    ``read_lake`` → route ``key_hash % M_new`` → per-partition commit with
    the same exactly-once manifest machinery as replay; each output file
    is key-clustered (sorted by repo/path) so row-group stats prune for
    filtered readers.

    Resume-after-rescale correctness: the new per-partition checkpoint is
    ``min`` over ALL source partitions' ``max_lsn``.  Any old partition
    can own keys that route to any new partition, so a scalar watermark
    per new partition must be ≤ every contributing source watermark; with
    the global min, every event at/below it was provably applied.  Events
    between the min and their source partition's watermark replay again on
    the next ``resume=True`` — harmless, because the LWW fold is
    idempotent: a replayed update loses to (or ties with) the state row it
    already produced, and a replayed delete above the watermark re-wins.
    Cost: one lake rewrite now + a slightly longer first resume if source
    watermarks diverged.

    Writes to a NEW directory (atomic cutover by path swap at the caller's
    leisure; in-place rescale would leave stale ``part=K`` dirs from the
    old layout racing the new manifests).  Refuses a partially-committed
    source (a missing partition's events were never applied, so no safe
    watermark exists — finish or re-run the replay first).
    """
    if os.path.abspath(src_dir) == os.path.abspath(dst_dir):
        raise ValueError("rescale_lake writes to a NEW directory; src == dst")
    manifests = mf.read_all_manifests(src_dir)
    if not manifests:
        raise ValueError(f"no committed lake at {src_dir}")
    src_parts = next(iter(manifests.values()))["stats"].get(
        "num_partitions", max(manifests) + 1
    )
    if len(manifests) < src_parts:
        raise ValueError(
            f"source lake is partially committed ({len(manifests)}/"
            f"{src_parts} partitions have manifests) — no safe resume "
            "watermark exists; complete the replay before rescaling"
        )
    if any(m["stats"].get("keep_tombstones", False) for m in manifests.values()):
        # A rescale streams the LIVE rows only; dropping tombstones (and
        # the scalar-watermark resume math below) breaks the fan-in
        # lake's out-of-order merge contract.  Not supported yet.
        raise ValueError(
            "rescale_lake does not support tombstone lakes "
            "(SinkConfig.keep_tombstones): the rewrite would drop the "
            "tombstones a fan-in resume depends on. GC tombstones after "
            "all sources pass them (pipelines.fanin.gc_tombstones), then "
            "rebuild at the new width with a full fan-in replay."
        )
    min_ckpt = min(m["max_lsn"] for m in manifests.values())
    ds = read_lake(src_dir)
    lake_schema = ds.schema().base_schema

    M = np.uint64(num_partitions)

    def route(batch: pa.Table) -> pa.Table:
        kh = key_hash(batch.column("repo"), batch.column("path"))
        parts = (kh % M).astype(np.int64)
        return batch.append_column(PART_COLUMN, pa.array(parts))

    args = {
        "sink_dir": dst_dir,
        "num_partitions": num_partitions,
        "prior_epochs": {
            p: m["epoch"] for p, m in mf.read_all_manifests(dst_dir).items()
        },
        "compression": compression,
        "keep_epochs": keep_epochs,
        "cluster_by_key": True,
    }

    def commit_group(group: pa.Table) -> pa.Table:
        part = int(group.column(PART_COLUMN)[0].as_py())
        final = group.drop_columns([PART_COLUMN])
        stats = {
            "max_lsn": min_ckpt,
            "events": 0,
            "rows": len(final),
            "rescaled_from": src_parts,
        }
        return pa.Table.from_pylist([_commit_with_metrics(part, final, stats, args)])

    metrics_rows = (
        ds.map_batches(route, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(PART_COLUMN)
        .map_groups(commit_group, batch_format="pyarrow")
        .take_all()
    )
    # Partitions no key routed to still need manifests: an unmanifested
    # partition reads as "never committed" and disables resume's
    # file-level pruning (its checkpoint defaults to -1).
    committed = {int(r["part"]) for r in metrics_rows}
    for part in range(num_partitions):
        if part not in committed:
            empty = lake_schema.empty_table()
            metrics_rows.append(
                _commit_with_metrics(
                    part,
                    empty,
                    {
                        "max_lsn": min_ckpt,
                        "events": 0,
                        "rows": 0,
                        "rescaled_from": src_parts,
                    },
                    args,
                )
            )
    return {
        "partitions": num_partitions,
        "rows": int(sum(int(r.get("rows", 0) or 0) for r in metrics_rows)),
        "min_checkpoint": int(min_ckpt),
        "rescaled_from": int(src_parts),
    }


@ray.remote
def _compact_partition_task(
    out_dir: str, part: int, manifest: dict, args_ser: bytes
) -> dict[str, Any]:
    import ray.cloudpickle as pickle

    args = pickle.loads(args_ser)
    pdir = mf.partition_dir(out_dir, part)
    keep_tomb = bool(manifest["stats"].get("keep_tombstones", False))
    folded = _read_chain_folded(
        pdir, manifest["files"], keep_tombstones=keep_tomb
    )
    if not keep_tomb and "op" in folded.column_names:
        folded = folded.drop_columns(["op"])  # restore the plain base layout
    stats = {
        "max_lsn": int(manifest.get("max_lsn", -1)),
        "events_in": 0,
        "live_rows": len(folded)
        - (
            int(pc.sum(pc.cast(op_equal(folded.column("op"), "D"), pa.int64())).as_py() or 0)
            if keep_tomb and len(folded)
            else 0
        ),
        "compacted_chain": len(manifest["files"]),
        "state_rows": len(folded),
    }
    return _commit_with_metrics(part, folded, stats, args)


def compact_lake(
    out_dir: str,
    min_chain: int = 2,
    keep_epochs: int = 1,
    parts: list[int] | None = None,
) -> dict[str, Any]:
    """Fold merge-on-read delta chains back into single base files — the
    asynchronous compaction half of ``SinkConfig.merge_on_read`` (the
    inline half is ``max_delta_files``).

    One Ray task per chained partition: read its own chain (no
    cross-partition traffic, the task holds exactly the state the
    committing finalize task held), fold with the writer's LWW kernel,
    drop tombstone rows and the ``op`` bookkeeping column on plain lakes,
    and commit the result as the partition's next epoch through the same
    exactly-once manifest CAS as replay — so a crashed or concurrent
    compaction is safe, and time-travel to pre-compaction epochs keeps
    working within ``keep_epochs``.  The checkpoint (``max_lsn``) is
    carried over unchanged: compaction applies no events, and a
    concurrent ``replay(resume=True)`` racing it is serialized per
    partition by the epoch CAS (the loser raises ``ConcurrentCommitError``
    and re-runs over the winner's state).

    ``min_chain``: only partitions whose manifest lists at least this many
    files are touched (2 = any chain; pass ``parts`` to force specific
    partitions).  Returns per-partition counts.  Read amplification
    restored: after compaction the partition is a plain file again —
    predicate pushdown and fold-free reads come back.
    """
    import ray.cloudpickle as pickle

    manifests = mf.read_all_manifests(out_dir)
    if not manifests:
        raise ValueError(f"no committed lake at {out_dir}")
    todo = {
        p: m
        for p, m in manifests.items()
        if len(m.get("files", [])) >= max(2, min_chain)
        and (parts is None or p in set(parts))
    }
    if not todo:
        return {"partitions_compacted": 0, "rows": 0, "files_folded": 0}
    sample = next(iter(manifests.values()))
    args = {
        "sink_dir": out_dir,
        "num_partitions": sample["stats"].get(
            "num_partitions", max(manifests) + 1
        ),
        "prior_epochs": {p: m["epoch"] for p, m in manifests.items()},
        "compression": "zstd",
        "keep_epochs": keep_epochs,
        "cluster_by_key": False,
        "keep_tombstones": sample["stats"].get("keep_tombstones", False),
    }
    args_ser = pickle.dumps(args)
    results = ray.get(
        [
            _compact_partition_task.remote(out_dir, p, m, args_ser)
            for p, m in sorted(todo.items())
        ]
    )
    return {
        "partitions_compacted": len(results),
        "rows": int(sum(r.get("state_rows", r.get("live_rows", 0)) for r in results)),
        "files_folded": int(sum(len(m["files"]) for m in todo.values())),
    }


_TYPE_FROM_STR = {
    "string": pa.string(),
    "large_string": pa.large_string(),
    "int64": pa.int64(),
    "int32": pa.int32(),
    "int16": pa.int16(),
    "int8": pa.int8(),
    "uint64": pa.uint64(),
    "double": pa.float64(),
    "float": pa.float32(),
    "bool": pa.bool_(),
    "binary": pa.binary(),
    "large_binary": pa.large_binary(),
    "timestamp[us]": pa.timestamp("us"),
    "timestamp[ms]": pa.timestamp("ms"),
    "timestamp[ns]": pa.timestamp("ns"),
    "date32[day]": pa.date32(),
}


def _schema_from_fingerprints(manifests: list[dict[str, Any]]) -> pa.Schema:
    """Union Arrow schema reconstructed from manifest fingerprints — no
    data/footer reads.  The engine's lake types are all simple (the map
    above); an exotic type would mean a foreign writer, so fail loudly."""
    schemas = []
    for m in manifests:
        fields = []
        for name, ts in m.get("schema_fingerprint") or []:
            t = _TYPE_FROM_STR.get(ts)
            if t is None:
                raise ValueError(
                    f"unrecognized type {ts!r} in manifest fingerprint for "
                    f"partition {m.get('part')}"
                )
            fields.append(pa.field(name, t))
        schemas.append(pa.schema(fields))
    return pa.unify_schemas(schemas, promote_options="permissive")


def lake_diff(
    out_dir: str,
    from_epoch: int,
    to_epoch: int | None = None,
    include_before: bool = False,
) -> ray.data.Dataset:
    """Changefeed between two lake snapshots: the I/U/D events that turn
    the ``from_epoch`` state into the ``to_epoch`` (default current) state.

    This is the read side of CDC — downstream consumers (cache
    invalidation, search-index refresh, derived-table incremental
    maintenance) subscribe to "what changed since the snapshot I last
    processed" instead of re-reading the lake.  Both snapshots share the
    sink's partition layout, so the diff is embarrassingly parallel: one
    task per partition reads that partition's two epoch files and joins
    them in memory — NO shuffle at any scale, and partitions whose
    manifests show the same epoch are skipped without reading a byte.

    Change detection compares ``lsn``: the fold is deterministic, so equal
    (key, lsn) implies an identical row, and any re-won key carries a new
    winning LSN even when the content bytes happen to match.  Emitted
    rows: op='I' (key only in new), 'U' (both, lsn differs; new row
    values), 'D' (key only in old; the tombstone's own LSN is not stored,
    so 'D' carries the last known row's values and lsn).  Events sort
    under (repo, path) within a partition; a global order is meaningless
    across independent keys (same contract as the change log itself).

    ``include_before=True`` switches to a before/after-image contract (the
    Debezium convention, which sum-style incremental view maintenance
    needs — see ``pipelines/ivm.py``): every non-key column gains a
    ``prev_``-prefixed sibling holding the ``from_epoch`` value.  Main
    columns then always hold NEW-state values (null for 'D' beyond the
    key), ``prev_*`` hold OLD-state values (null for 'I')."""
    old_m = mf.read_all_manifests(out_dir, asof_epoch=from_epoch)
    new_m = (
        mf.read_all_manifests(out_dir)
        if to_epoch is None
        else mf.read_all_manifests(out_dir, asof_epoch=to_epoch)
    )
    lake_tomb = any(
        m["stats"].get("keep_tombstones", False)
        for m in list(old_m.values()) + list(new_m.values())
    )
    descs = []
    for part in sorted(set(old_m) | set(new_m)):
        om, nm = old_m.get(part), new_m.get(part)
        if om is not None and nm is not None and om["epoch"] == nm["epoch"]:
            continue  # identical snapshot: provably no diff, skip the read
        pdir = mf.partition_dir(out_dir, part)
        descs.append(
            {
                "part": part,
                "old_files": [os.path.join(pdir, f) for f in (om or {}).get("files", [])],
                "new_files": [os.path.join(pdir, f) for f in (nm or {}).get("files", [])],
                # merge-on-read chains fold to the copy-on-write row set
                # before diffing (multiple versions per key otherwise
                # explode the key join)
                "old_fold": bool(om and len(om.get("files", [])) > 1),
                "new_fold": bool(nm and len(nm.get("files", [])) > 1),
            }
        )

    # One output schema for every task, derived from the snapshots'
    # manifest fingerprints (no data reads): evolution means old/new epoch
    # files can disagree on columns, and per-task schemas would make the
    # result Dataset's blocks un-unionable.  A stored ``op`` column (delta
    # chains, tombstone lakes) is merge bookkeeping, not row data — and it
    # would collide with the diff's own leading ``op`` — so it never
    # enters the row schema.
    involved = [m for m in list(old_m.values()) + list(new_m.values())]
    union_schema = pa.schema(
        [f for f in _schema_from_fingerprints(involved) if f.name != "op"]
    )
    out_fields = [pa.field("op", pa.string())] + list(union_schema)
    if include_before:
        out_fields += [
            pa.field("prev_" + f.name, f.type)
            for f in union_schema
            if f.name not in ("repo", "path")
        ]
    out_schema = pa.schema(out_fields)
    schema_ser = out_schema.serialize().to_pybytes()
    n_row_fields = len(union_schema)

    def _read_conform(
        files: list[str], schema: pa.Schema, fold: bool = False
    ) -> pa.Table:
        if not files:
            return schema.empty_table()
        t = pa.concat_tables(
            [pq.read_table(f) for f in files], promote_options="permissive"
        )
        if fold:
            # delta chain → the row set a copy-on-write commit would hold
            t = _fold_chain_table(t, keep_tombstones=lake_tomb)
        cols = []
        for f in schema:
            if f.name in t.column_names:
                c = t.column(f.name)
                cols.append(c.cast(f.type) if c.type != f.type else c)
            else:
                cols.append(pa.nulls(len(t), f.type))
        return pa.table(dict(zip(schema.names, cols)))

    def diff_partition(batch: pd.DataFrame) -> pa.Table:
        schema = pa.ipc.read_schema(pa.BufferReader(schema_ser))
        # snapshot-row fields: minus leading 'op', minus trailing prev_*
        row_schema = pa.schema(list(schema)[1 : 1 + n_row_fields])
        value_fields = [
            f for f in row_schema if f.name not in ("repo", "path")
        ]
        outs = []
        # metadata loop: one iteration per PARTITION descriptor, not per row
        for _, row in batch.iterrows():
            old = _read_conform(
                list(row["old_files"]), row_schema, fold=bool(row["old_fold"])
            )
            new = _read_conform(
                list(row["new_files"]), row_schema, fold=bool(row["new_fold"])
            )
            m = (
                old.select(["repo", "path", "lsn"]).to_pandas()
                .merge(
                    new.select(["repo", "path", "lsn"]).to_pandas(),
                    on=["repo", "path"],
                    how="outer",
                    suffixes=("_old", "_new"),
                    indicator=True,
                )
            )
            # positional row ids let Arrow .take() assemble the output
            # without a pandas round-trip of the content payload
            old_pos = pd.Series(
                np.arange(len(old)),
                index=pd.MultiIndex.from_frame(
                    old.select(["repo", "path"]).to_pandas()
                ),
            )
            new_pos = pd.Series(
                np.arange(len(new)),
                index=pd.MultiIndex.from_frame(
                    new.select(["repo", "path"]).to_pandas()
                ),
            )
            for op, mask in (
                ("I", m["_merge"] == "right_only"),
                (
                    "U",
                    (m["_merge"] == "both") & (m["lsn_old"] != m["lsn_new"]),
                ),
                ("D", m["_merge"] == "left_only"),
            ):
                keys = m.loc[mask, ["repo", "path"]]
                if not len(keys):
                    continue
                mi = pd.MultiIndex.from_frame(keys)
                new_rows = (
                    new.take(pa.array(new_pos.loc[mi].to_numpy()))
                    if op in ("I", "U")
                    else None
                )
                old_rows = (
                    old.take(pa.array(old_pos.loc[mi].to_numpy()))
                    if op in ("U", "D")
                    else None
                )
                if not include_before:
                    rows = new_rows if op != "D" else old_rows
                    rows = rows.add_column(
                        0, "op", pa.array([op] * len(rows), pa.string())
                    )
                    outs.append(rows)
                    continue
                n = len(keys)
                keysrc = new_rows if new_rows is not None else old_rows
                cols = {
                    "op": pa.array([op] * n, pa.string()),
                    "repo": keysrc.column("repo"),
                    "path": keysrc.column("path"),
                }
                for f in value_fields:
                    cols[f.name] = (
                        new_rows.column(f.name)
                        if new_rows is not None
                        else pa.nulls(n, f.type)
                    )
                for f in value_fields:
                    cols["prev_" + f.name] = (
                        old_rows.column(f.name)
                        if old_rows is not None
                        else pa.nulls(n, f.type)
                    )
                outs.append(
                    pa.table({name: cols[name] for name in schema.names})
                )
        if not outs:
            return schema.empty_table()
        out = pa.concat_tables(outs)
        return out.sort_by(
            [("repo", "ascending"), ("path", "ascending"), ("op", "ascending")]
        )

    if not descs:
        return ray.data.from_arrow(out_schema.empty_table())
    return ray.data.from_items(descs).map_batches(
        diff_partition, batch_format="pandas", batch_size=1
    )


def lake_table(
    out_dir: str,
    asof_epoch: int | None = None,
    include_tombstones: bool = False,
) -> pa.Table:
    """Driver-side Arrow view of the lake — small/test scales only."""
    manifests = mf.read_all_manifests(out_dir, asof_epoch=asof_epoch)
    chained = _chained_parts(manifests)
    tables = []
    for p, m in sorted(manifests.items()):
        pdir = mf.partition_dir(out_dir, p)
        if p in chained:
            # merge-on-read chain: fold to the copy-on-write row set
            tables.append(
                _read_chain_folded(pdir, m["files"], keep_tombstones=True)
            )
        else:
            tables.extend(
                pq.read_table(os.path.join(pdir, f)) for f in m["files"]
            )
    if not tables:
        return REPO_FILES_SCHEMA.empty_table()
    t = pa.concat_tables(tables, promote_options="permissive").sort_by(
        [(k, "ascending") for k in KEY_COLUMNS]
    )
    if not include_tombstones and "op" in t.column_names:
        t = t.filter(pc.invert(op_equal(t.column("op"), "D")))
    if chained and "op" in t.column_names and not any(
        m["stats"].get("keep_tombstones", False) for m in manifests.values()
    ) and not include_tombstones:
        t = t.drop_columns(["op"])  # plain lake logical schema has no op
    return t


@ray.remote
def _fsck_partition_deep(
    out_dir: str, part: int, manifest: dict, num_partitions: int
) -> list[str]:
    """Deep per-partition audit (one Ray task per partition): re-derive
    every manifest claim from the data bytes themselves."""
    issues: list[str] = []
    pdir = mf.partition_dir(out_dir, part)
    tables = []
    for f in manifest["files"]:
        try:
            tables.append(pq.read_table(os.path.join(pdir, f)))
        except Exception as e:  # unreadable file — fatal for this partition
            return [f"part {part}: data file {f} unreadable: {e}"]
    tbl = (
        pa.concat_tables(tables, promote_options="permissive")
        if tables
        else None
    )
    if tbl is None:
        return issues
    # a delta manifest's digest covers the file THIS commit wrote (the
    # chain's newest — it is what the concurrent-writer CAS compared);
    # older chain files are covered by their own epochs' snapshot digests
    digest_tbl = tables[-1] if manifest.get("kind") == "delta" else tbl
    if table_digest(digest_tbl, list(KEY_COLUMNS)) != manifest["digest"]:
        issues.append(
            f"part {part}: content digest mismatch (data bytes do not "
            "match the committed manifest digest)"
        )
    if len(tbl):
        # every row must hash-route to its own partition — catches rows
        # written under a different partition count / key-hash version
        pids = partition_ids(
            tbl.column("repo"), tbl.column("path"), num_partitions
        )
        if (pids != part).any():
            issues.append(
                f"part {part}: {(pids != part).sum()} rows route to other "
                f"partitions under num_partitions={num_partitions} "
                "(foreign rows — wrong hash version or corrupted rescale)"
            )
        # per-row invariant: content_sha256 == sha256(content); null-safe
        # (tombstone rows carry null content AND null sha — both-null is a
        # match, a null on one side only is not)
        if "content" in tbl.column_names and "content_sha256" in tbl.column_names:
            want = sha256_column(tbl.column("content"))
            got = tbl.column("content_sha256").combine_chunks()
            ok = pc.or_(
                pc.fill_null(pc.equal(got, want), False),
                pc.and_(pc.is_null(got), pc.is_null(want)),
            )
            if not pc.all(ok).as_py():
                issues.append(f"part {part}: content_sha256 rows do not match content")
        # the checkpoint watermark bounds every surviving row's LSN
        # (aggregate-lake state rows carry last_lsn instead of lsn)
        lsn_col = "lsn" if "lsn" in tbl.column_names else (
            "last_lsn" if "last_lsn" in tbl.column_names else None
        )
        if lsn_col is not None:
            mx = pc.max(tbl.column(lsn_col)).as_py()
            if mx is not None and mx > manifest.get("max_lsn", -1):
                issues.append(
                    f"part {part}: row {lsn_col} {mx} exceeds manifest "
                    f"max_lsn {manifest.get('max_lsn')} (checkpoint would "
                    "skip events)"
                )
        # aggregate-lake semantic invariants (maintenance parity with the
        # document fsck): sums/min/max well-ordered with positive counts,
        # HLL register width matches the lake's sticky hll_p, bottom-k
        # sample lists within the sticky k bound and aligned pairwise.
        # Chained delta rows are exempt from the min≤max check — their
        # identity-encoded tombstones carry (int64-max, int64-min).
        st = manifest.get("stats", {})
        is_chain = manifest.get("kind") == "delta"
        for c in st.get("value_cols") or []:
            if f"{c}_min" not in tbl.column_names:
                continue
            if not is_chain:
                n_ev = tbl.column("n_events")
                bad = pc.or_(
                    pc.greater(tbl.column(f"{c}_min"), tbl.column(f"{c}_max")),
                    pc.less_equal(n_ev, 0),
                )
                nbad = int(pc.sum(pc.cast(bad, pa.int64())).as_py() or 0)
                if nbad:
                    issues.append(
                        f"part {part}: {nbad} aggregate rows violate "
                        f"{c}_min <= {c}_max with n_events > 0"
                    )
        for c in st.get("distinct_cols") or []:
            if f"{c}_hll" in tbl.column_names:
                width = tbl.schema.field(f"{c}_hll").type.byte_width
                want_m = 1 << int(st.get("hll_p", 12))
                if width != want_m:
                    issues.append(
                        f"part {part}: {c}_hll register width {width} != "
                        f"2^hll_p = {want_m} (sketch identity broken)"
                    )
        for c in st.get("quantile_cols") or []:
            if f"{c}_bk_h" in tbl.column_names:
                bk_k = int(st.get("bottomk_k", 128))
                hl = pc.list_value_length(tbl.column(f"{c}_bk_h"))
                vl = pc.list_value_length(tbl.column(f"{c}_bk_v"))
                misaligned = int(pc.sum(pc.cast(
                    pc.not_equal(hl, vl), pa.int64())).as_py() or 0)
                over = int(pc.sum(pc.cast(
                    pc.greater(hl, bk_k), pa.int64())).as_py() or 0)
                if misaligned or over:
                    issues.append(
                        f"part {part}: bottom-k lists for {c} broken "
                        f"({misaligned} misaligned pairs, {over} rows over "
                        f"k={bk_k})"
                    )
    return issues


def fsck_lake(out_dir: str, deep: bool = False) -> dict[str, Any]:
    """Lake integrity audit — does the committed state actually match its
    manifests?  The verification arm of the exactly-once contract (readers
    trust only manifest-listed files, so a lie in a manifest is silent
    until something re-reads the bytes).

    Shallow checks (metadata only — parquet FOOTERS, never data pages, so
    this is cheap at any lake size): manifests parse and self-identify,
    listed files exist and are non-empty, footer row counts and schema
    match the manifest, ``num_partitions`` / ``key_hash_version`` agree
    across partitions, part ids are in range; orphan data files and
    leftover ``.inprogress`` temps are counted (informational — lazy GC's
    job, never an error).

    ``deep=True`` adds one Ray task per partition that re-reads the data
    and re-derives every claim: the order-independent content digest, the
    per-row ``content_sha256`` invariant, hash-routing of every row to its
    own partition (catches a wrong-key-hash or corrupted-rescale lake) and
    the ``max_lsn`` watermark bound.  Cost = one full lake scan, fully
    parallel.

    Returns ``{"ok", "partitions", "files", "issues", "orphan_files",
    "temp_files", "deep"}``; ``ok`` is False iff ``issues`` is non-empty.
    """
    issues: list[str] = []
    manifests = mf.read_all_manifests(out_dir)
    orphans = 0
    temps = 0
    n_files = 0
    widths = {m["stats"].get("num_partitions") for m in manifests.values()}
    if len(widths) > 1:
        issues.append(f"num_partitions disagrees across manifests: {sorted(widths)}")
    versions = {m["stats"].get("key_hash_version", 1) for m in manifests.values()}
    if len(versions) > 1:
        issues.append(
            f"key_hash_version disagrees across manifests: {sorted(versions)}"
        )
    num_partitions = next(iter(widths), None)
    if num_partitions is not None and len(manifests) < num_partitions:
        missing = sorted(set(range(num_partitions)) - set(manifests))
        # a replay commits EVERY partition (empty ones included), so a
        # gap means lost manifests/dirs, not an empty key range
        issues.append(
            f"missing partitions (committed width {num_partitions}): "
            f"{missing[:16]}{'…' if len(missing) > 16 else ''}"
        )
    for part, m in sorted(manifests.items()):
        pdir = mf.partition_dir(out_dir, part)
        if m.get("part") != part:
            issues.append(
                f"part {part}: manifest self-identifies as part {m.get('part')}"
            )
        if num_partitions is not None and part >= num_partitions:
            issues.append(
                f"part {part}: id out of range for num_partitions={num_partitions}"
            )
        footer_rows = 0
        is_delta = m.get("kind") == "delta"
        for f in m["files"]:
            fp = os.path.join(pdir, f)
            if not os.path.exists(fp):
                issues.append(f"part {part}: manifest-listed file missing: {f}")
                continue
            n_files += 1
            if os.path.getsize(fp) == 0:
                issues.append(f"part {part}: zero-byte data file: {f}")
                continue
            try:
                md = pq.read_metadata(fp)
            except Exception as e:
                issues.append(f"part {part}: unreadable parquet footer {f}: {e}")
                continue
            footer_rows += md.num_rows
            # a delta manifest's fingerprint describes the file IT wrote
            # (the chain's newest); older chain files legitimately carry
            # earlier schemas (op-less plain bases, pre-evolution columns)
            if is_delta and f != m["files"][-1]:
                continue
            # Parquet round-trips list columns with the spec's "element"
            # child name while in-memory Arrow uses "item" — same type,
            # different str() — so canonicalize before comparing or every
            # quantile-state (list<int64>) lake reads as schema drift.
            def _canon(ts: str) -> str:
                return ts.replace("list<item: ", "list<element: ")

            file_fields = {
                (fld.name, _canon(str(fld.type)))
                for fld in pq.read_schema(fp)
            }
            want_fields = {
                (n, _canon(t)) for n, t in m.get("schema_fingerprint", [])
            }
            if want_fields and file_fields != want_fields:
                issues.append(
                    f"part {part}: file schema drifted from manifest "
                    f"fingerprint in {f}"
                )
        if footer_rows != m.get("rows"):
            issues.append(
                f"part {part}: footer rows {footer_rows} != manifest rows "
                f"{m.get('rows')}"
            )
        # informational: files on disk not referenced by ANY retained
        # snapshot manifest (lazy-GC candidates), and crashed-write temps
        referenced: set[str] = set(m["files"])
        if os.path.isdir(pdir):
            for f in os.listdir(pdir):
                if f.startswith("manifest-e") and f.endswith(".json"):
                    try:
                        with open(os.path.join(pdir, f)) as fh:
                            referenced.update(json.load(fh).get("files", []))
                    except (OSError, json.JSONDecodeError):
                        issues.append(f"part {part}: corrupt snapshot manifest {f}")
            for f in os.listdir(pdir):
                if f.endswith(".inprogress"):
                    temps += 1
                elif f.endswith(".parquet") and f not in referenced:
                    orphans += 1
    if deep and manifests and num_partitions:
        deep_issues = ray.get(
            [
                _fsck_partition_deep.remote(out_dir, part, m, num_partitions)
                for part, m in sorted(manifests.items())
            ]
        )
        for batch in deep_issues:
            issues.extend(batch)
    return {
        "ok": not issues,
        "partitions": len(manifests),
        "files": n_files,
        "issues": issues,
        "orphan_files": orphans,
        "temp_files": temps,
        "deep": deep,
        # maintenance receipts: which fold maintains this lake, and how
        # much merge-on-read chain is outstanding (CLI `compact`'s input)
        "lake_kind": mf.lake_kind(manifests),
        "chained_partitions": sum(
            1 for m in manifests.values() if m.get("kind") == "delta"
        ),
        "chain_files_total": sum(
            len(m["files"]) - 1
            for m in manifests.values()
            if m.get("kind") == "delta"
        ),
    }


def tail_change_log(
    log_dir: str,
    out_dir: str,
    cfg: ReplayConfig | None = None,
    poll_interval_s: float = 2.0,
    max_polls: int | None = None,
    stop_after_idle: int = 3,
) -> list[dict[str, Any]]:
    """Micro-batch streaming ingest: poll the change-log directory and
    resume-replay whatever landed since the last committed checkpoint
    (§2.10 — the reference's documented log-based CDC aspiration,
    docs/TECHNICAL_GUIDE.md:184-189, as a running tail loop).

    Each poll is a full exactly-once ``replay(resume=True)``: new LSN
    buckets are picked up by checkpoint pruning, an idle poll commits
    nothing and is a no-op, and killing the loop at any point loses nothing
    (the next poll resumes from manifests).  Stops after ``stop_after_idle``
    consecutive no-op polls or ``max_polls`` total."""
    summaries: list[dict[str, Any]] = []
    idle = 0
    polls = 0
    while True:
        res = replay(log_dir, out_dir, cfg, resume=True)
        summaries.append(res.summary)
        polls += 1
        if res.summary["partitions_committed"] == 0:
            idle += 1
        else:
            idle = 0
        if max_polls is not None and polls >= max_polls:
            break
        if idle >= stop_after_idle:
            break
        time.sleep(poll_interval_s)
    return summaries
