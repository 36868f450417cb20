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


def aggregate_schema(
    value_cols: list[str],
    distinct_cols: list[str] | None = None,
    hll_p: int = 12,
    quantile_cols: list[str] | None = None,
) -> pa.Schema:
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
    for c in distinct_cols or []:
        # per-key HLL registers: approximate COUNT(DISTINCT c) state,
        # mergeable by elementwise max (MOR chains fold it like sums)
        fields.append(pa.field(f"{c}_hll", pa.binary(1 << hll_p)))
    for c in quantile_cols or []:
        # per-key bottom-k (KMV) sample: the ≤k (splitmix64(lsn), value)
        # pairs with the smallest hashes — a uniform without-replacement
        # sample of the key's applied events, mergeable by concat-keep-k
        # (MOR chains fold it like sums); quantiles extract at read by
        # the shared integer rank rule (stages/sketch.py)
        fields.append(pa.field(f"{c}_bk_h", pa.list_(pa.int64())))
        fields.append(pa.field(f"{c}_bk_v", pa.list_(pa.int64())))
    fields += [
        pa.field("n_events", pa.int64(), nullable=False),
        pa.field("last_lsn", pa.int64(), nullable=False),
    ]
    return pa.schema(fields)


def _fsb_to_matrix(col: pa.ChunkedArray | pa.Array, m: int) -> np.ndarray:
    """fixed_size_binary column → (n, m) uint8 matrix, zero-copy per chunk."""
    if isinstance(col, pa.ChunkedArray):
        chunks = col.chunks
    else:
        chunks = [col]
    mats = []
    for ch in chunks:
        if len(ch) == 0:
            continue
        buf = ch.buffers()[1]
        off = ch.offset * m
        mats.append(
            np.frombuffer(buf, dtype=np.uint8, count=len(ch) * m, offset=off
                          ).reshape(len(ch), m)
        )
    if not mats:
        return np.zeros((0, m), dtype=np.uint8)
    return mats[0] if len(mats) == 1 else np.concatenate(mats)


def _matrix_to_fsb(mat: np.ndarray) -> pa.Array:
    """(n, m) uint8 matrix → fixed_size_binary(m) array, one buffer."""
    n, m = mat.shape
    return pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(m), n, [None, pa.py_buffer(np.ascontiguousarray(mat).tobytes())]
    )


def _flatten_list_col(col) -> tuple[np.ndarray, np.ndarray]:
    """List column → (flat int64 values, row id per element)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # null rows behave as empty lists
    col = col.fill_null([])
    offsets = col.offsets.to_numpy(zero_copy_only=False)
    values = col.values.to_numpy(zero_copy_only=False)
    # a sliced ListArray's values buffer spans the parent; re-window
    values = values[offsets[0]:offsets[-1]]
    offsets = offsets - offsets[0]
    rows = np.repeat(
        np.arange(len(col), dtype=np.int64), np.diff(offsets)
    )
    return values.astype(np.int64, copy=False), rows


def _bottomk_lists(
    grp: np.ndarray, h: np.ndarray, v: np.ndarray, n_groups: int, k: int
) -> tuple[pa.Array, pa.Array]:
    """Per-group bottom-k merge, fully vectorized: one lexsort by
    (group, hash), a rank-within-group mask, list offsets from bincount."""
    order = np.lexsort((h, grp))
    grp_s, h_s, v_s = grp[order], h[order], v[order]
    starts = np.flatnonzero(np.concatenate(([True], grp_s[1:] != grp_s[:-1])))
    seg = np.cumsum(np.concatenate(([True], grp_s[1:] != grp_s[:-1]))) - 1
    rank = np.arange(len(grp_s), dtype=np.int64) - starts[seg]
    keep = rank < k
    gk, hk, vk = grp_s[keep], h_s[keep], v_s[keep]
    counts = np.bincount(gk, minlength=n_groups)
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
    # hashes sort UNSIGNED (the SQL oracle's UBIGINT order) but store as
    # int64 bit patterns (Parquet list<int64>)
    return (
        pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(hk.view(np.int64))
        ),
        pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(vk.astype(np.int64))
        ),
    )


def _make_agg_router(
    num_partitions: int, value_cols: list[str],
    checkpoints: dict[int, int] | None,
    distinct_cols: list[str] | None = None,
    late_filter: tuple[str, int] | None = None,
    quantile_cols: list[str] | None = None,
    forbid_resets: bool = False,
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
        if late_filter is not None:
            # event-time lateness (the Flink allowed-lateness model): an
            # event whose timestamp falls below the FINALIZED watermark
            # (stored_wm - allowed_lateness, computed driver-side) belongs
            # to a window the lake already considers closed — applying it
            # would silently change a published window.  Dropped here;
            # the driver pre-counts them into summary["late_events"].
            col, thr = late_filter
            ts = pc.fill_null(batch.column(col).cast(pa.int64()), thr)
            keep = pc.greater_equal(ts, pa.scalar(thr, pa.int64()))
            batch = batch.filter(keep)
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
        if forbid_resets and bool(is_d.any()):
            # reset_free is a DECLARED contract the valve's full
            # pre-aggregation depends on — enforce it, never trust it
            raise ValueError(
                f"reset_free=True but the feed carries {int(is_d.sum())} "
                "op='D' reset events; reset-free pre-aggregation would "
                "be wrong — replay without reset_free"
            )
        vals = {}
        carried = list(dict.fromkeys(
            list(value_cols) + list(distinct_cols or [])
            + list(quantile_cols or [])
        ))
        for c in carried:
            col = batch.column(c).cast(pa.int64())
            # a reset's deltas are ignored; an add with a null delta is
            # invalid (there is nothing to add/count)
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
        for c in carried:
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


HAD_RESET_COL = "had_reset"
_MIN_IDENT = np.iinfo(np.int64).max
_MAX_IDENT = np.iinfo(np.int64).min


def fold_aggregate_chain(
    tables: list[pa.Table], value_cols: list[str],
    distinct_cols: list[str] | None = None,
    quantile_cols: list[str] | None = None,
    bottomk_k: int = 128,
) -> pa.Table:
    """Fold a merge-on-read chain (base + deltas, oldest first) into the
    partition's aggregate state.

    Per key, in chain order: a delta row with ``had_reset`` REPLACES the
    accumulator (the delta already aggregated everything after the
    increment's last reset — including the post-reset adds, so the reset
    row itself is KEPT, unlike the event fold's discarded 'D' rows);
    otherwise it ⊕-merges.  Tombstone deltas (a key reset away entirely)
    carry the ⊕-identity (sum 0, min int64-max, max int64-min, n 0) so
    the reduction stays uniform; keys whose total count is 0 are dropped
    at the end."""
    seq_tabs = []
    for i, t in enumerate(tables):
        if HAD_RESET_COL not in t.column_names:
            t = t.append_column(
                HAD_RESET_COL, pa.array(np.zeros(len(t), dtype=bool))
            )
        seq_tabs.append(
            t.append_column("__seq", pa.array(np.full(len(t), i, np.int64)))
        )
    chain = pa.concat_tables(seq_tabs, promote_options="permissive")
    hll_m = None
    if distinct_cols:
        hll_m = chain.schema.field(f"{distinct_cols[0]}_hll").type.byte_width
    if len(chain) == 0:
        return aggregate_schema(
            value_cols, distinct_cols, (hll_m or 4096).bit_length() - 1,
            quantile_cols,
        ).empty_table()
    chain = chain.sort_by(
        [(k, "ascending") for k in KEY_COLUMNS] + [("__seq", "ascending")]
    )
    n = len(chain)
    same = np.ones(n - 1, dtype=bool)
    for k in KEY_COLUMNS:
        col = chain.column(k).combine_chunks()
        same &= pc.equal(col.slice(1), col.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
    starts = np.flatnonzero(np.concatenate(([True], ~same)))
    seg = np.cumsum(np.concatenate(([True], ~same))) - 1
    pos = np.arange(n, dtype=np.int64)
    reset = chain.column(HAD_RESET_COL).to_numpy(zero_copy_only=False).astype(bool)
    rpos = np.where(reset, pos, np.int64(-1))
    last_r = np.maximum.reduceat(rpos, starts)
    keep = pos >= np.where(last_r[seg] >= 0, last_r[seg], 0)
    kept = chain.filter(pa.array(keep))
    k = len(kept)
    seg_k = seg[keep]
    starts_k = np.flatnonzero(np.concatenate(([True], seg_k[1:] != seg_k[:-1])))
    first_idx = np.flatnonzero(keep)[starts_k]
    ends_k = np.append(starts_k[1:], k) - 1
    out_cols: dict[str, Any] = {
        "repo": chain.column("repo").take(pa.array(first_idx)),
        "path": chain.column("path").take(pa.array(first_idx)),
    }
    for c in value_cols:
        s = kept.column(f"{c}_sum").to_numpy(zero_copy_only=False)
        mn = kept.column(f"{c}_min").to_numpy(zero_copy_only=False)
        mx = kept.column(f"{c}_max").to_numpy(zero_copy_only=False)
        out_cols[f"{c}_sum"] = pa.array(np.add.reduceat(s, starts_k))
        out_cols[f"{c}_min"] = pa.array(np.minimum.reduceat(mn, starts_k))
        out_cols[f"{c}_max"] = pa.array(np.maximum.reduceat(mx, starts_k))
    for c in distinct_cols or []:
        # register max is the HLL merge — same reduceat shape, axis 0
        mat = _fsb_to_matrix(kept.column(f"{c}_hll"), hll_m)
        out_cols[f"{c}_hll"] = _matrix_to_fsb(
            np.maximum.reduceat(mat, starts_k, axis=0)
        )
    if quantile_cols:
        G = len(starts_k)
        counts_k = np.diff(np.append(starts_k, k))
        grp_per_row = np.repeat(np.arange(G, dtype=np.int64), counts_k)
        for c in quantile_cols:
            hflat, hrows = _flatten_list_col(kept.column(f"{c}_bk_h"))
            vflat, _ = _flatten_list_col(kept.column(f"{c}_bk_v"))
            lh, lv = _bottomk_lists(
                grp_per_row[hrows], hflat.view(np.uint64), vflat, G,
                bottomk_k,
            )
            out_cols[f"{c}_bk_h"] = lh
            out_cols[f"{c}_bk_v"] = lv
    nn = kept.column("__n" if "__n" in kept.column_names else "n_events").to_numpy(
        zero_copy_only=False
    )
    n_events = np.add.reduceat(nn, starts_k)
    lsn_k = kept.column("last_lsn").to_numpy(zero_copy_only=False)
    out_cols["n_events"] = pa.array(n_events)
    out_cols["last_lsn"] = pa.array(lsn_k[ends_k])
    out_schema = aggregate_schema(
        value_cols, distinct_cols,
        (hll_m.bit_length() - 1) if hll_m else 12,
        quantile_cols,
    )
    arrays = []
    for f in out_schema:
        col = out_cols[f.name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        arrays.append(col.cast(f.type))
    folded = pa.Table.from_arrays(arrays, schema=out_schema)
    alive = n_events > 0
    return folded.filter(pa.array(alive)) if not alive.all() else folded


def _prior_as_rows(
    part: int, args: dict, value_cols: list[str],
    distinct_cols: list[str] | None = None,
    quantile_cols: list[str] | None = None,
) -> pa.Table | None:
    """Committed aggregate state as pseudo-event rows that fold with the
    increment: a state row contributes its stored sum/min/max/count at
    ``lsn = last_lsn`` (below every increment row by the watermark
    contract, so an increment reset correctly discards it).  Chained
    (merge-on-read) partitions fold the chain first."""
    m = args["prior_manifests"].get(part)
    if m is None:
        return None
    pdir = mf.partition_dir(args["sink_dir"], part)
    tabs = [pq.read_table(os.path.join(pdir, f)) for f in m["files"]]
    if m.get("kind") == "delta":
        # the lake's configured k, NOT the signature default — folding
        # a chained prior at a smaller k would silently truncate each
        # key's KMV sample and break the bottom-k quantile state
        prior = fold_aggregate_chain(
            tabs, value_cols, distinct_cols, quantile_cols,
            int(args.get("bottomk_k", 128)),
        )
    else:
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
    for c in distinct_cols or []:
        contribs[f"{c}_hll"] = prior.column(f"{c}_hll")
    for c in quantile_cols or []:
        contribs[f"{c}_bk_h"] = prior.column(f"{c}_bk_h")
        contribs[f"{c}_bk_v"] = prior.column(f"{c}_bk_v")
    return pa.table(
        {
            **cols,
            **contribs,
            "__n": n_ev,
            KEY_HASH_COL: pa.array(kh.view(np.int64)),
        }
    )


def make_reset_barrier_compact():
    """Exchange-actor memory valve for the DEFAULT aggregate feed (resets
    allowed): per key in the buffered subset, drop adds below the key's
    max reset LSN and all reset rows but that max one.

    EXACT under arbitrary arrival order — both drops are invariants of
    the final fold: an add below a reset dies there regardless of what
    else arrives (the retained reset row keeps the barrier for rows in
    other slices), and only a key's max-LSN reset matters (the max of a
    union is unchanged by dropping non-max elements of a subset).

    This is also the exactness FRONTIER with resets in play: the fold is
    not a semilattice — a partial aggregate of adds cannot be split by a
    reset LSN that arrives later, so pre-aggregating adds mid-stream
    would be wrong under reordered arrival.  Memory for a hot key is
    bounded by its adds since its last reset (the realistic hot counter
    resets periodically); for declared reset-free feeds use
    ``reset_free=True``, whose valve pre-aggregates fully."""

    def compact(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return tbl
        tbl = tbl.sort_by(
            [(KEY_HASH_COL, "ascending")]
            + [(k, "ascending") for k in KEY_COLUMNS]
            + [("lsn", "ascending")]
        )
        n = len(tbl)
        _, seg = _segment_last_mask(tbl)
        pos = np.arange(n, dtype=np.int64)
        seg_starts = np.flatnonzero(
            np.concatenate(([True], seg[1:] != seg[:-1]))
        )
        is_d = pc.equal(tbl.column("op"), "D").to_numpy(zero_copy_only=False)
        dpos = np.where(is_d, pos, np.int64(-1))
        last_d = np.maximum.reduceat(dpos, seg_starts)
        ld = last_d[seg]
        keep = (pos > ld) | (is_d & (pos == ld))
        return tbl.filter(pa.array(keep)) if not keep.all() else tbl

    return compact


def make_reset_free_compact(
    value_cols: list[str],
    distinct_cols: list[str] | None = None,
    quantile_cols: list[str] | None = None,
    hll_p: int = 12,
    bottomk_k: int = 128,
):
    """Exchange-actor memory valve for DECLARED reset-free feeds
    (``replay_aggregate(reset_free=True)``; the router raises on any
    op='D', so the declaration is enforced, not trusted): fully
    pre-aggregate the buffered subset per key into contribution rows —
    sum/min/max/count form a commutative monoid, HLL registers a max
    semilattice and the bottom-k KMV sample a semilattice under
    "bottom-k of union", so without resets partial ⊕ in ANY arrival
    order is exact for every supported state kind.  Actor memory drops
    from O(events) to O(live keys per actor) however skewed the keys.

    Output rows carry ``{c}__sum/__min/__max`` + ``__n`` + ``{c}_hll``
    + ``{c}_bk_h/_bk_v`` (the same contribution schema
    ``_prior_as_rows`` uses) at the key's max LSN; ``_agg_commit_fn``
    folds them mixed with later raw rows via the ``__n``-validity
    discriminator.  Raw quantile values hash by their OWN row LSN at
    compaction time (before the per-row LSN is folded away), exactly as
    the commit fold would.  Re-compaction composes (the fn accepts
    mixed input)."""
    distinct_cols = list(distinct_cols or [])
    quantile_cols = list(quantile_cols or [])
    hll_m = 1 << int(hll_p)
    bk_k = int(bottomk_k)

    def compact(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return tbl
        from ..stages.bloom import _splitmix64
        from ..stages.sketch import hll_idx_rho

        tbl = tbl.sort_by(
            [(KEY_HASH_COL, "ascending")]
            + [(k, "ascending") for k in KEY_COLUMNS]
            + [("lsn", "ascending")]
        )
        n = len(tbl)
        _, seg = _segment_last_mask(tbl)
        seg_starts = np.flatnonzero(
            np.concatenate(([True], seg[1:] != seg[:-1]))
        )
        G = len(seg_starts)
        ends = np.append(seg_starts[1:], n) - 1
        has_contrib = "__n" in tbl.column_names
        cols: dict[str, Any] = {
            "lsn": tbl.column("lsn").take(pa.array(ends)),
            "op": pa.array(["I"] * G),
            "repo": tbl.column("repo").take(pa.array(seg_starts)),
            "path": tbl.column("path").take(pa.array(seg_starts)),
        }
        if has_contrib:
            nn = pc.fill_null(tbl.column("__n"), 1).cast(pa.int64())
        else:
            nn = pa.array(np.ones(n, np.int64))
        for c in value_cols:
            raw = (
                tbl.column(c).cast(pa.int64())
                if c in tbl.column_names
                else pa.nulls(n, pa.int64())
            )
            if has_contrib:
                s = pc.coalesce(tbl.column(f"{c}__sum"), raw)
                mn = pc.coalesce(tbl.column(f"{c}__min"), raw)
                mx = pc.coalesce(tbl.column(f"{c}__max"), raw)
            else:
                s = mn = mx = raw
            s = s.to_numpy(zero_copy_only=False)
            mn = mn.to_numpy(zero_copy_only=False)
            mx = mx.to_numpy(zero_copy_only=False)
            cols[f"{c}__sum"] = pa.array(np.add.reduceat(s, seg_starts))
            cols[f"{c}__min"] = pa.array(np.minimum.reduceat(mn, seg_starts))
            cols[f"{c}__max"] = pa.array(np.maximum.reduceat(mx, seg_starts))
        for c in distinct_cols:
            regs = np.zeros((G, hll_m), dtype=np.uint8)
            if c in tbl.column_names:
                dv = tbl.column(c)
                mask = pc.is_valid(dv).to_numpy(zero_copy_only=False)
                if mask.any():
                    idx, rho = hll_idx_rho(
                        dv.to_numpy(zero_copy_only=False)[mask]
                        .astype(np.int64),
                        int(hll_p),
                    )
                    np.maximum.at(
                        regs.reshape(-1), seg[mask] * hll_m + idx, rho
                    )
            if f"{c}_hll" in tbl.column_names:
                hv = tbl.column(f"{c}_hll")
                hmask = pc.is_valid(hv).to_numpy(zero_copy_only=False)
                if hmask.any():
                    mat = _fsb_to_matrix(
                        tbl.filter(pa.array(hmask)).column(f"{c}_hll"),
                        hll_m,
                    )
                    np.maximum.at(regs, seg[hmask], mat)
            cols[f"{c}_hll"] = _matrix_to_fsb(regs)
        if quantile_cols:
            lsns = tbl.column("lsn").to_numpy(zero_copy_only=False)
            for c in quantile_cols:
                grps, hs, vs = [], [], []
                if c in tbl.column_names:
                    qv = tbl.column(c)
                    mask = pc.is_valid(qv).to_numpy(zero_copy_only=False)
                    if mask.any():
                        h = _splitmix64(
                            lsns[mask].view(np.uint64)
                        ).view(np.int64)
                        grps.append(seg[mask])
                        hs.append(h)
                        vs.append(
                            qv.to_numpy(zero_copy_only=False)[mask]
                            .astype(np.int64)
                        )
                if f"{c}_bk_h" in tbl.column_names:
                    hflat, hrows = _flatten_list_col(tbl.column(f"{c}_bk_h"))
                    vflat, _ = _flatten_list_col(tbl.column(f"{c}_bk_v"))
                    if len(hflat):
                        grps.append(seg[hrows])
                        hs.append(hflat)
                        vs.append(vflat)
                if grps:
                    lh, lv = _bottomk_lists(
                        np.concatenate(grps),
                        np.concatenate(hs).view(np.uint64).astype(np.uint64),
                        np.concatenate(vs), G, bk_k,
                    )
                else:
                    off = pa.array(np.zeros(G + 1, np.int32))
                    lh = pa.ListArray.from_arrays(off, pa.array([], pa.int64()))
                    lv = pa.ListArray.from_arrays(off, pa.array([], pa.int64()))
                cols[f"{c}_bk_h"] = lh
                cols[f"{c}_bk_v"] = lv
        cols["__n"] = pa.array(
            np.add.reduceat(nn.to_numpy(zero_copy_only=False), seg_starts)
        )
        cols[KEY_HASH_COL] = tbl.column(KEY_HASH_COL).take(pa.array(seg_starts))
        return pa.table(cols)

    return compact


def _agg_commit_fn(part: int, tbl: pa.Table, args: dict) -> dict[str, Any]:
    """Fold one partition: sort by (kh, key, lsn), mask everything at/
    below each key's last reset, segment-reduce, merge prior state,
    exactly-once commit.

    Merge-on-read (``SinkConfig.merge_on_read``): a resume commits ONLY
    the increment's partial aggregates as a delta file chained onto the
    committed state — the prior state is never read (write amplification
    ∝ increment, the replay MOR contract ported to the additive fold).
    Sound because ⊕ is associative between resets and each delta records
    per key whether the increment RESET it (``had_reset`` → the read fold
    replaces instead of merging; a key reset away entirely ships an
    identity-encoded tombstone row).  Chains past ``max_delta_files``
    compact inline (this committer folds its OWN chain — partition-local
    I/O)."""
    value_cols = args["value_cols"]
    distinct_cols = args.get("distinct_cols") or []
    quantile_cols = args.get("quantile_cols") or []
    bk_k = int(args.get("bottomk_k", 128))
    hll_p = int(args.get("hll_p", 12))
    hll_m = 1 << hll_p
    events_in = len(tbl)
    prior_m = args["prior_manifests"].get(part)
    mor = bool(args.get("merge_on_read")) and prior_m is not None
    # chain bound matches the replay MOR rule (_commit_delta_fn): existing
    # deltas + this one > max_delta_files → compact inline via a COW
    # commit (prior chain folded below)
    if mor and len(prior_m["files"]) > int(args.get("max_delta_files", 8)):
        mor = False
    # widen raw events to contribution columns (sum=min=max=delta, n=1),
    # then append prior state rows (already in contribution form).  When
    # the reset-free exchange valve engaged, the buffer is a MIX of raw
    # rows and valve-produced contribution rows — __n validity is the
    # discriminator (raw rows never carry it).
    if len(tbl):
        valve_mixed = "__n" in tbl.column_names
        cols = {
            "lsn": tbl.column("lsn"),
            "op": tbl.column("op"),
            "repo": tbl.column("repo"),
            "path": tbl.column("path"),
        }
        for c in value_cols:
            v = (
                tbl.column(c).cast(pa.int64())
                if c in tbl.column_names
                else pa.nulls(len(tbl), pa.int64())
            )
            if valve_mixed:
                cols[f"{c}__sum"] = pc.coalesce(tbl.column(f"{c}__sum"), v)
                cols[f"{c}__min"] = pc.coalesce(tbl.column(f"{c}__min"), v)
                cols[f"{c}__max"] = pc.coalesce(tbl.column(f"{c}__max"), v)
            else:
                cols[f"{c}__sum"] = v
                cols[f"{c}__min"] = v
                cols[f"{c}__max"] = v
        for c in distinct_cols:
            cols[f"{c}__dv"] = (
                tbl.column(c)
                if c in tbl.column_names
                else pa.nulls(len(tbl), pa.int64())
            )
            if f"{c}_hll" in tbl.column_names:  # valve contribution rows
                cols[f"{c}_hll"] = tbl.column(f"{c}_hll")
        for c in quantile_cols:
            cols[f"{c}__qv"] = (
                tbl.column(c)
                if c in tbl.column_names
                else pa.nulls(len(tbl), pa.int64())
            )
            if f"{c}_bk_h" in tbl.column_names:  # valve contribution rows
                cols[f"{c}_bk_h"] = tbl.column(f"{c}_bk_h")
                cols[f"{c}_bk_v"] = tbl.column(f"{c}_bk_v")
        cols["__n"] = (
            pc.fill_null(tbl.column("__n"), 1).cast(pa.int64())
            if valve_mixed
            else pa.array(np.ones(len(tbl), np.int64))
        )
        cols[KEY_HASH_COL] = tbl.column(KEY_HASH_COL)
        wide = pa.table(cols)
        events_in = int(pc.sum(cols["__n"]).as_py() or 0) if valve_mixed else events_in
    else:
        wide = None
    prior = (
        None if mor
        else _prior_as_rows(
            part, args, value_cols, distinct_cols, quantile_cols
        )
    )
    state_rows = len(prior) if prior is not None else 0
    parts = [t for t in (wide, prior) if t is not None and len(t)]
    out_schema = pa.ipc.read_schema(pa.BufferReader(args["out_schema"]))
    if not parts:
        if mor:
            # empty increment for a chained partition: nothing to commit —
            # the chain stays exactly as it was (no epoch bump, no empty
            # delta to accumulate across idle resumes)
            stats = _agg_stats(part, args, 0, 0, 0, 0, tbl)
            return {
                **stats,
                "part": part,
                "epoch": int(prior_m["epoch"]),
                "duration_s": 0.0,
                "bytes_written": 0,
            }
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
        stats = _agg_stats(
            part, args, events_in, state_rows, 0, int((last_d >= 0).sum()), tbl
        )
        if mor:
            # every increment key was reset away: a tombstone-only delta
            gone_all = np.flatnonzero(last_d >= 0)
            lsn_all = merged.column("lsn").to_numpy(zero_copy_only=False)
            ng = len(gone_all)
            tomb_cols: dict[str, Any] = {
                "repo": merged.column("repo").take(pa.array(seg_starts[gone_all])),
                "path": merged.column("path").take(pa.array(seg_starts[gone_all])),
            }
            for c in value_cols:
                tomb_cols[f"{c}_sum"] = pa.array(np.zeros(ng, np.int64))
                tomb_cols[f"{c}_min"] = pa.array(np.full(ng, _MIN_IDENT, np.int64))
                tomb_cols[f"{c}_max"] = pa.array(np.full(ng, _MAX_IDENT, np.int64))
            for c in distinct_cols:
                tomb_cols[f"{c}_hll"] = _matrix_to_fsb(
                    np.zeros((ng, hll_m), np.uint8)
                )
            for c in quantile_cols:
                off = pa.array(np.zeros(ng + 1, np.int32))
                tomb_cols[f"{c}_bk_h"] = pa.ListArray.from_arrays(
                    off, pa.array([], pa.int64()))
                tomb_cols[f"{c}_bk_v"] = pa.ListArray.from_arrays(
                    off, pa.array([], pa.int64()))
            tomb_cols["n_events"] = pa.array(np.zeros(ng, np.int64))
            tomb_cols["last_lsn"] = pa.array(lsn_all[last_d[gone_all]])
            tomb_cols[HAD_RESET_COL] = pa.array(np.ones(ng, bool))
            delta_schema = pa.schema(
                list(out_schema) + [pa.field(HAD_RESET_COL, pa.bool_())]
            )
            tomb = pa.table(
                {f.name: tomb_cols[f.name] for f in delta_schema}
            ).cast(delta_schema)
            stats["kind"] = "delta"
            return _commit_with_metrics(
                part, tomb, stats, args,
                chain_files=prior_m["files"], chain_rows=int(prior_m["rows"]),
            )
        final = out_schema.empty_table()
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
    for c in distinct_cols:
        from ..stages.sketch import hll_idx_rho

        G = len(starts_k)
        regs = np.zeros((G, hll_m), dtype=np.uint8)
        grp = np.repeat(np.arange(G, dtype=np.int64), counts)
        dv = kept.column(f"{c}__dv") if f"{c}__dv" in kept.column_names else None
        if dv is not None:
            raw_mask = pc.is_valid(dv).to_numpy(zero_copy_only=False)
            if raw_mask.any():
                vals_np = dv.to_numpy(zero_copy_only=False)[raw_mask]
                idx, rho = hll_idx_rho(vals_np.astype(np.int64), hll_p)
                np.maximum.at(
                    regs.reshape(-1), grp[raw_mask] * hll_m + idx, rho
                )
        if f"{c}_hll" in kept.column_names:
            hv = kept.column(f"{c}_hll")
            hmask = pc.is_valid(hv).to_numpy(zero_copy_only=False)
            if hmask.any():
                mat = _fsb_to_matrix(
                    kept.filter(pa.array(hmask)).column(f"{c}_hll"), hll_m
                )
                np.maximum.at(regs, grp[hmask], mat)
        out_cols[f"{c}_hll"] = _matrix_to_fsb(regs)
    if quantile_cols:
        from ..stages.bloom import _splitmix64

        G = len(starts_k)
        grp_per_row = np.repeat(np.arange(G, dtype=np.int64), counts)
        lsn_rows = kept.column("lsn").to_numpy(zero_copy_only=False)
        for c in quantile_cols:
            grps, hs, vs = [], [], []
            if f"{c}__qv" in kept.column_names:
                qv = kept.column(f"{c}__qv")
                raw_mask = pc.is_valid(qv).to_numpy(zero_copy_only=False)
                if raw_mask.any():
                    h = _splitmix64(
                        lsn_rows[raw_mask].view(np.uint64)
                    ).view(np.int64)
                    grps.append(grp_per_row[raw_mask])
                    hs.append(h)
                    vs.append(
                        qv.to_numpy(zero_copy_only=False)[raw_mask]
                        .astype(np.int64)
                    )
            if f"{c}_bk_h" in kept.column_names:
                hflat, hrows = _flatten_list_col(kept.column(f"{c}_bk_h"))
                vflat, _ = _flatten_list_col(kept.column(f"{c}_bk_v"))
                if len(hflat):
                    grps.append(grp_per_row[hrows])
                    hs.append(hflat)
                    vs.append(vflat)
            if grps:
                lh, lv = _bottomk_lists(
                    np.concatenate(grps),
                    np.concatenate(hs).view(np.uint64).astype(np.uint64),
                    np.concatenate(vs), G, bk_k,
                )
            else:
                off = pa.array(np.zeros(G + 1, np.int32))
                lh = pa.ListArray.from_arrays(off, pa.array([], pa.int64()))
                lv = pa.ListArray.from_arrays(off, pa.array([], pa.int64()))
            out_cols[f"{c}_bk_h"] = lh
            out_cols[f"{c}_bk_v"] = lv
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
    gone = np.setdiff1d(seg_with_d, seg_alive, assume_unique=True)
    reset_gone = int(len(gone))
    stats = _agg_stats(
        part, args, events_in, state_rows, len(final), reset_gone, tbl
    )
    if mor:
        # delta = surviving increment aggregates, flagged with whether the
        # increment reset the key, plus identity-encoded tombstones for
        # keys it reset away entirely (the read fold must kill their base)
        seg_has_d = np.zeros(int(seg[-1]) + 1, dtype=bool)
        seg_has_d[seg[is_d]] = True
        delta = final.append_column(
            HAD_RESET_COL, pa.array(seg_has_d[seg_k[starts_k]])
        )
        if reset_gone:
            g_first = seg_starts[gone]
            g_lastd = last_d[gone]
            lsn_all = merged.column("lsn").to_numpy(zero_copy_only=False)
            tomb_cols: dict[str, Any] = {
                "repo": merged.column("repo").take(pa.array(g_first)),
                "path": merged.column("path").take(pa.array(g_first)),
            }
            for c in value_cols:
                tomb_cols[f"{c}_sum"] = pa.array(np.zeros(reset_gone, np.int64))
                tomb_cols[f"{c}_min"] = pa.array(
                    np.full(reset_gone, _MIN_IDENT, np.int64)
                )
                tomb_cols[f"{c}_max"] = pa.array(
                    np.full(reset_gone, _MAX_IDENT, np.int64)
                )
            for c in distinct_cols:
                tomb_cols[f"{c}_hll"] = _matrix_to_fsb(
                    np.zeros((reset_gone, hll_m), np.uint8)
                )
            for c in quantile_cols:
                off = pa.array(np.zeros(reset_gone + 1, np.int32))
                tomb_cols[f"{c}_bk_h"] = pa.ListArray.from_arrays(
                    off, pa.array([], pa.int64()))
                tomb_cols[f"{c}_bk_v"] = pa.ListArray.from_arrays(
                    off, pa.array([], pa.int64()))
            tomb_cols["n_events"] = pa.array(np.zeros(reset_gone, np.int64))
            tomb_cols["last_lsn"] = pa.array(lsn_all[g_lastd])
            tomb_cols[HAD_RESET_COL] = pa.array(np.ones(reset_gone, bool))
            tomb = pa.table(
                {f.name: tomb_cols[f.name] for f in delta.schema}
            ).cast(delta.schema)
            delta = pa.concat_tables([delta, tomb])
        stats["kind"] = "delta"
        return _commit_with_metrics(
            part, delta, stats, args,
            chain_files=prior_m["files"], chain_rows=int(prior_m["rows"]),
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
        "value_cols": list(args["value_cols"]),
        "distinct_cols": list(args.get("distinct_cols") or []),
        "hll_p": int(args.get("hll_p", 12)),
        "quantile_cols": list(args.get("quantile_cols") or []),
        "bottomk_k": int(args.get("bottomk_k", 128)),
    }


def _skew_share(timings: list[dict]) -> float:
    """Hottest partition's share of routed exchange bytes (pre-valve)."""
    per_part = [
        int(t.get("bytes", 0))
        for per_actor in timings
        for t in per_actor.values()
    ]
    total = sum(per_part)
    return round(max(per_part) / total, 4) if total else 0.0


def replay_aggregate(
    log_dir: str,
    out_dir: str,
    value_cols: list[str],
    num_partitions: int | None = None,
    resume: bool = False,
    sink: SinkConfig | None = None,
    distinct_cols: list[str] | None = None,
    hll_p: int = 12,
    event_time: tuple[str, int] | None = None,
    quantile_cols: list[str] | None = None,
    bottomk_k: int = 128,
    reset_free: bool = False,
    compact_threshold_rows: int = 16_000_000,
) -> ReplayResult:
    """Replay a metrics change log into a keyed aggregate lake.

    Full run folds the whole log; ``resume=True`` prunes events at/below
    each partition's checkpoint and merges the committed aggregates (the
    associative ⊕; an increment reset discards prior state exactly like a
    late D discards earlier adds).  Deterministic fold + manifest CAS ⇒
    a retried/re-run commit is byte-identical (exactly-once, which
    ADDITIVE state strictly requires — double-applying is not idempotent
    the way pick-latest is).

    ``event_time=(col, allowed_lateness)`` adds event-time window
    FINALIZATION (windowed rollups put the window id in the key; see the
    flagship derivation): the lake persists an event-time watermark
    (max ``col`` applied, ``_event_watermark.json``), and a resume drops
    increment events with ``col < watermark - allowed_lateness`` — their
    window closed when the watermark passed it, and a closed window's
    published value must never move (the allowed-lateness contract of
    stream processors).  Dropped-late counts surface as
    ``summary["late_events"]``; both the column and the lateness are in
    the column's own integer units."""
    t0 = time.time()
    sink = sink or SinkConfig(out_dir=out_dir)
    if sink.out_dir != out_dir:
        raise ValueError(
            f"sink.out_dir={sink.out_dir!r} disagrees with out_dir={out_dir!r}"
        )
    if sink.keep_tombstones:
        raise ValueError(
            "aggregate lakes do not support keep_tombstones (state is a "
            "rollup, not row versions; resets are folded, not persisted)"
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
    for c in list(value_cols) + list(distinct_cols or []) + list(
        quantile_cols or []
    ):
        if c not in scan.schema.names:
            raise ValueError(
                f"value column {c!r} not found in the change log "
                f"(schema: {scan.schema.names})"
            )
    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    if resume and manifests:
        st0 = next(iter(manifests.values()))["stats"]
        stored_v = st0.get("value_cols", list(value_cols))
        stored_d = st0.get("distinct_cols", list(distinct_cols or []))
        stored_q = st0.get("quantile_cols", list(quantile_cols or []))
        if (
            list(stored_v) != list(value_cols)
            or list(stored_d) != list(distinct_cols or [])
            or list(stored_q) != list(quantile_cols or [])
        ):
            # the aggregate set is part of the lake's identity: a resume
            # with different columns would silently merge mismatched
            # states (a new column has no prior contributions to ⊕, and
            # min/max have no representable "absent" in the row).  Evolve
            # by replaying fresh into a new lake.
            raise ValueError(
                f"lake aggregates {stored_v}+{stored_d} but this run asks "
                f"for {list(value_cols)}+{list(distinct_cols or [])}; "
                "aggregate column sets cannot change on resume — replay "
                "into a fresh out_dir"
            )
        # sketch parameters are part of the lake's identity too: a
        # different hll_p commits registers of a different
        # fixed_size_binary width (MOR: into the existing chain) and a
        # different bottomk_k silently changes the KMV sample bound
        stored_p = int(st0.get("hll_p", hll_p))
        stored_k = int(st0.get("bottomk_k", bottomk_k))
        if stored_d and stored_p != int(hll_p):
            raise ValueError(
                f"lake HLL precision hll_p={stored_p} but this run asks "
                f"for hll_p={int(hll_p)}; sketch parameters cannot change "
                "on resume — replay into a fresh out_dir"
            )
        if stored_q and stored_k != int(bottomk_k):
            raise ValueError(
                f"lake bottom-k sample size bottomk_k={stored_k} but this "
                f"run asks for bottomk_k={int(bottomk_k)}; sketch "
                "parameters cannot change on resume — replay into a "
                "fresh out_dir"
            )
        num_partitions = st0.get("num_partitions", max(manifests) + 1)
    else:
        num_partitions = num_partitions or max(
            ncpu, scan.total_bytes // (256 << 20)
        )
    num_actors = max(1, min(num_partitions, ncpu))
    num_blocks = max(4 * ncpu, scan.total_bytes // (64 << 20))
    out_schema = aggregate_schema(
        value_cols, distinct_cols, hll_p, quantile_cols
    )
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
        "distinct_cols": list(distinct_cols or []),
        "hll_p": int(hll_p),
        "quantile_cols": list(quantile_cols or []),
        "bottomk_k": int(bottomk_k),
        "merge_on_read": bool(sink.merge_on_read and resume),
        "max_delta_files": sink.max_delta_files,
    }
    late_filter = None
    late_events = 0
    if event_time is not None:
        et_col, lateness = event_time
        if et_col not in scan.schema.names:
            raise ValueError(
                f"event_time column {et_col!r} not in the change log "
                f"(schema: {scan.schema.names})"
            )
        stored_wm = _read_event_watermark(out_dir)
        if resume and stored_wm is not None:
            thr = int(stored_wm) - int(lateness)
            late_filter = (et_col, thr)
            # observability pre-count: one streaming pass over two narrow
            # columns (late drops must never be silent).  Checkpoint-pruned
            # rows (already applied) are excluded from the count.
            pre = read_change_log(scan)
            import pyarrow.dataset as _pads  # noqa: F401

            def count_late(b: pa.Table) -> pa.Table:
                ts = pc.fill_null(b.column(et_col).cast(pa.int64()), thr)
                lsn_np = b.column("lsn").to_numpy(zero_copy_only=False)
                late = pc.less(ts, pa.scalar(thr, pa.int64())).to_numpy(
                    zero_copy_only=False
                )
                if ckpts:
                    kh = key_hash(
                        pc.utf8_trim_whitespace(b.column("repo").cast(pa.string())),
                        pc.utf8_trim_whitespace(b.column("path").cast(pa.string())),
                    )
                    prt = (kh % np.uint64(num_partitions)).astype(np.int64)
                    ck = np.full(num_partitions, -1, dtype=np.int64)
                    for p_, l_ in ckpts.items():
                        ck[p_] = l_
                    late &= lsn_np > ck[prt]
                return pa.table({"late": [int(late.sum())]})

            late_events = sum(
                r["late"] for r in pre.map_batches(
                    count_late, batch_format="pyarrow"
                ).take_all()
            )
    ds = read_change_log(scan, num_blocks=num_blocks)
    router = _make_agg_router(
        num_partitions, list(value_cols), ckpts, list(distinct_cols or []),
        late_filter=late_filter, quantile_cols=list(quantile_cols or []),
        forbid_resets=bool(reset_free),
    )
    # Hot-key memory valve (skew safety): the exchange buffers raw routed
    # rows, so one key owning half the stream would otherwise grow one
    # actor's heap to O(events).  reset_free feeds pre-aggregate fully
    # (O(live keys)); feeds with resets get the exact reset-barrier
    # filter (memory ∝ adds since each key's last reset) — full partial
    # aggregation under reordered resets is provably not exact, see
    # make_reset_barrier_compact.
    if reset_free:
        compact_fn = make_reset_free_compact(
            list(value_cols), list(distinct_cols or []),
            list(quantile_cols or []), int(hll_p), int(bottomk_k),
        )
    else:
        compact_fn = make_reset_barrier_compact()
    timings: list[dict] = []
    metrics_rows = run_exchange(
        ds, router, _agg_commit_fn, commit_args, num_partitions, num_actors,
        batch_size=None,
        compact_fn=compact_fn,
        compact_threshold_rows=compact_threshold_rows,
        timings_out=timings,
    )
    metrics = pd.DataFrame(metrics_rows)
    total_ev = int(metrics["events_in"].sum()) if len(metrics) else 0
    summary = {
        "mode": "aggregate",
        "events_in": total_ev,
        "live_rows": int(metrics["live_rows"].sum()) if len(metrics) else 0,
        "partitions_committed": len(metrics),
        "num_partitions": num_partitions,
        "value_cols": list(value_cols),
        "duration_s": round(time.time() - t0, 4),
        # skew receipt: the hottest partition's share of ROUTED exchange
        # bytes (pre-valve, so it reports the feed's true skew) — the
        # number that says whether one partition is the wall
        "skew_max_share": _skew_share(timings),
        "valve": "reset_free" if reset_free else "reset_barrier",
        "valve_compactions": int(
            sum(
                t.get("compactions", 0)
                for per_actor in timings
                for t in per_actor.values()
            )
        ),
    }
    os.makedirs(out_dir, exist_ok=True)
    if event_time is not None:
        summary["late_events"] = int(late_events)
        summary["event_watermark"] = _advance_event_watermark(
            out_dir, log_dir, event_time[0]
        )
    if scan.max_lsn >= 0:
        summary["log_hwm"] = mf.write_log_hwm(out_dir, int(scan.max_lsn))
    with open(os.path.join(out_dir, "run_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    return ReplayResult(metrics=metrics, summary=summary)


@ray.remote
def _fold_chain_task(
    pdir: str, files: list[str], value_cols: list[str],
    distinct_cols: list[str] | None = None,
    quantile_cols: list[str] | None = None,
    bottomk_k: int = 128,
) -> pa.Table:
    tabs = [pq.read_table(os.path.join(pdir, f)) for f in files]
    return fold_aggregate_chain(
        tabs, value_cols, distinct_cols, quantile_cols, bottomk_k
    )


def read_aggregate_lake(out_dir: str) -> ray.data.Dataset:
    """Read a committed aggregate lake; merge-on-read chains are folded
    per partition with the writer's ⊕ kernel (one Ray task per chained
    partition; unchained partitions stream straight from their files)."""
    manifests = mf.read_all_manifests(out_dir)
    chained = {p for p, m in manifests.items() if m.get("kind") == "delta"}
    value_cols = _value_cols_from(manifests)
    distinct_cols = _distinct_cols_from(manifests)
    quantile_cols, bk_k = _quantile_cols_from(manifests)
    plain_files = mf.manifest_data_files(
        out_dir, {p: m for p, m in manifests.items() if p not in chained}
    )
    parts = []
    if plain_files:
        parts.append(ray.data.read_parquet(plain_files, partitioning=None))
    if chained:
        refs = [
            _fold_chain_task.remote(
                mf.partition_dir(out_dir, p), manifests[p]["files"],
                value_cols, distinct_cols, quantile_cols, bk_k,
            )
            for p in sorted(chained)
        ]
        parts.append(ray.data.from_arrow_refs(refs))
    if not parts:
        return ray.data.from_arrow(aggregate_schema(value_cols or []).empty_table())
    ds = parts[0]
    for extra in parts[1:]:
        ds = ds.union(extra)
    return ds


def _value_cols_from(manifests: dict[int, dict]) -> list[str]:
    for m in manifests.values():
        vc = m["stats"].get("value_cols")
        if vc:
            return list(vc)
    return []


def _distinct_cols_from(manifests: dict[int, dict]) -> list[str]:
    for m in manifests.values():
        if "distinct_cols" in m["stats"]:
            return list(m["stats"]["distinct_cols"])
    return []


def _quantile_cols_from(manifests: dict[int, dict]) -> tuple[list[str], int]:
    for m in manifests.values():
        if "quantile_cols" in m["stats"]:
            return (
                list(m["stats"]["quantile_cols"]),
                int(m["stats"].get("bottomk_k", 128)),
            )
    return [], 128


def compact_aggregate_lake(
    out_dir: str, min_chain: int = 2, keep_epochs: int = 1
) -> dict[str, Any]:
    """Fold merge-on-read chains back into single base files (exactly-once
    commits at the next epoch; checkpoint/watermark carried unchanged).
    The aggregate-lake counterpart of ``replay.compact_lake`` — the ⊕
    fold replaces the LWW fold; same maintenance surface (CLI
    ``compact`` auto-dispatches on the lake kind)."""
    from ..hashing import table_digest

    manifests = mf.read_all_manifests(out_dir)
    value_cols = _value_cols_from(manifests)
    distinct_cols = _distinct_cols_from(manifests)
    quantile_cols, bk_k = _quantile_cols_from(manifests)
    todo = {
        p: m for p, m in manifests.items()
        if m.get("kind") == "delta" and len(m["files"]) >= min_chain
    }
    compacted = 0
    for p, m in sorted(todo.items()):
        pdir = mf.partition_dir(out_dir, p)
        folded = ray.get(
            _fold_chain_task.remote(
                pdir, m["files"], value_cols, distinct_cols,
                quantile_cols, bk_k,
            )
        )
        stats = dict(m["stats"])
        stats["live_rows"] = len(folded)
        stats["state_rows"] = len(folded)
        stats["compacted_chain"] = len(m["files"])
        stats.pop("kind", None)
        args = {
            "sink_dir": out_dir,
            "prior_epochs": {p: m["epoch"]},
            "num_partitions": stats.get("num_partitions", max(manifests) + 1),
            "compression": "zstd",
            "cluster_by_key": False,
            "keep_epochs": keep_epochs,
            "keep_tombstones": False,
        }
        _commit_with_metrics(p, folded, stats, args)
        compacted += 1
    return {"partitions_compacted": compacted, "out_dir": out_dir,
            "lake_kind": "aggregate"}


def aggregate_get(
    out_dir: str, keys: list[tuple[str, str]]
) -> pa.Table:
    """Keyed point read of the rollup lake: each key's current aggregate
    row (absent keys absent).  Routing is manifest-metadata-only via
    ``plan_point_read`` (≤ ``len(keys)`` partitions read out of any lake
    size, the ``lake_get`` serving-path contract); chained partitions
    fold ONLY the requested keys' rows (key filter pushed into the chain
    scan — key predicates commute with the ⊕ fold exactly as they do with
    the LWW fold)."""
    import pyarrow.dataset as pads

    from .replay import plan_point_read

    plan = plan_point_read(out_dir, keys)
    manifests = mf.read_all_manifests(out_dir)
    value_cols = _value_cols_from(manifests)
    distinct_cols = _distinct_cols_from(manifests)
    quantile_cols, bk_k = _quantile_cols_from(manifests)
    repos = sorted({r for r, _ in keys})
    paths = sorted({p for _, p in keys})
    expr = pads.field("repo").isin(repos) & pads.field("path").isin(paths)
    out: list[pa.Table] = []
    for part in plan["parts"]:
        m = manifests[part]
        pdir = mf.partition_dir(out_dir, part)
        tabs = [
            pq.read_table(os.path.join(pdir, f), filters=expr)
            for f in m["files"]
        ]
        t = (
            fold_aggregate_chain(
                tabs, value_cols, distinct_cols, quantile_cols, bk_k
            )
            if m.get("kind") == "delta"
            else pa.concat_tables(tabs, promote_options="permissive")
        )
        out.append(t)
    if not out:
        return aggregate_schema(
            value_cols, distinct_cols, 12, quantile_cols
        ).empty_table()
    full = pa.concat_tables(out, promote_options="permissive")
    # the isin pushdown is a superset (repo × path cross product); exact
    # pair match on the point-read-sized result
    want = set(keys)
    mask = [
        (r, p) in want
        for r, p in zip(
            full.column("repo").to_pylist(), full.column("path").to_pylist()
        )
    ]
    return full.filter(pa.array(mask, pa.bool_()))


EVENT_WATERMARK = "_event_watermark.json"


def _read_event_watermark(out_dir: str) -> int | None:
    p = os.path.join(out_dir, EVENT_WATERMARK)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(json.load(f)["watermark"])


def _advance_event_watermark(out_dir: str, log_dir: str, col: str) -> int:
    """Monotonically advance the persisted event-time watermark to the max
    of the column across the log — FOOTER STATS ONLY (no data read); stats-
    less row groups decode just that column.  Late (dropped) events cannot
    regress it: max is max."""
    import glob as _glob

    wm = _read_event_watermark(out_dir)
    mx = wm if wm is not None else None
    for f in _glob.glob(os.path.join(log_dir, "**", "*.parquet"), recursive=True):
        pf = pq.ParquetFile(f)
        if col not in pf.schema_arrow.names:
            continue
        idx = pf.schema_arrow.get_field_index(col)
        for i in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(i).column(idx).statistics
            if st is not None and st.max is not None:
                v = st.max
                if hasattr(v, "timestamp"):
                    v = int(v.timestamp() * 1_000_000)
                v = int(v)
            else:
                t = pf.read_row_group(i, columns=[col])
                if len(t) == 0:
                    continue
                import pyarrow.compute as _pc

                v = int(_pc.max(t.column(col).cast(pa.int64())).as_py())
            mx = v if mx is None else max(mx, v)
    mx = -1 if mx is None else int(mx)
    from ..state.manifest import _atomic_write_bytes

    _atomic_write_bytes(
        os.path.join(out_dir, EVENT_WATERMARK),
        json.dumps({"watermark": mx, "column": col}).encode(),
    )
    return mx
