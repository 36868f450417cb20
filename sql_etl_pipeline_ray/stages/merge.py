"""Last-writer-wins merge — the heart of the CDC engine.

Semantics match the reference's keyed upsert + pick-latest idioms:

- ``INSERT ... ON CONFLICT (key) DO UPDATE SET ...``
  (``sql/etl_transformations.sql:27-38``): every I/U event carries the full
  row and sets the key's state; the *latest* event wins.  The reference's
  "latest" is statement execution order; ours is the explicit monotonic LSN
  — stronger and deterministic under any shuffle order.
- ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY version DESC) = 1``
  (``sql/complex_queries.sql:27``): realized as a per-partition vectorized
  sort + segment-boundary pick, never a Python loop over rows.
- Deletes tombstone the key (soft-delete aspiration,
  ``docs/TECHNICAL_GUIDE.md:182``); the final table holds no tombstones.

Ordering: ties on LSN are impossible by construction (globally unique LSN);
if an upstream ever produced one, the deterministic tiebreak is op order
'D' < 'I' < 'U' ascending with last-wins, i.e. an upsert beats a delete at
the same LSN.  All ordering is per-key inside one hash partition — no
global order and no ``preserve_order`` dependence.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..hashing import sha256_column
from ..schemas import KEY_COLUMNS, OP_CODES, op_equal

# Engine-internal columns added by the normalize stage / combiner.
EVENTS_COL = "_events"  # events folded into this row (partial-agg count)
HAD_INSERT_COL = "_had_insert"  # key has seen an 'I' op (orphan audit)
KEY_HASH_COL = "_kh"  # uint64-as-int64 key hash, computed once in normalize

# Sorting hash-first makes the heavy per-partition sort an integer sort —
# the string key columns are only compared on hash ties (same key or a
# collision), which halves fold time on content-heavy logs.
SORT_KEYS = [(KEY_HASH_COL, "ascending")] + [
    (k, "ascending") for k in KEY_COLUMNS
] + [
    ("lsn", "ascending"),
    ("op", "ascending"),
]


def _segment_last_mask(tbl: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """For a table sorted by key: (last-row-of-key mask, segment id per row)."""
    n = len(tbl)
    if n == 0:
        return np.zeros(0, dtype=bool), np.zeros(0, dtype=np.int64)
    if KEY_HASH_COL in tbl.column_names:
        # adjacent-row int-hash equality prunes the string compares; the
        # string columns still confirm (a collision must not merge keys)
        kh = tbl.column(KEY_HASH_COL).to_numpy(zero_copy_only=False)
        same = kh[1:] == kh[:-1]
    else:
        same = np.ones(n - 1, dtype=bool)
    for k in KEY_COLUMNS:
        col = tbl.column(k).combine_chunks()
        eq = pc.equal(col.slice(1), col.slice(0, n - 1))
        same &= eq.to_numpy(zero_copy_only=False)
    starts = np.concatenate(([True], ~same))
    seg = np.cumsum(starts) - 1
    last = np.concatenate((~same, [True]))
    return last, seg


def _fold_latest_fast(tbl: pa.Table, keep_tombstones: bool) -> pa.Table | None:
    """Int-only fold: one ``np.argsort(key_hash)`` + a segmented max-LSN
    winner pick + one ``take`` of the winner rows — never sorts or moves
    the string columns of loser rows.

    Exactness: within an equal-hash run, hash equality is promoted to key
    equality by comparing the (repo, path) strings of ADJACENT sorted rows
    only — any second distinct key inside a run manifests at some adjacent
    pair under any within-run ordering (the same trick ``_winners_fn`` in
    replay.py uses; profiled ~4× cheaper than the full multi-column sort
    this replaces: 545 → ~150 ms per 1M-row combiner fold).  Equal-(key,
    lsn) ties at the group max are impossible by contract (globally unique
    LSN); both a detected collision and a detected max-tie return ``None``
    → caller falls back to the exact string-sorted path with its 'op'
    tiebreak.

    Output is bit-identical to the slow path: winners taken in ascending
    key-hash order, which is the slow path's sort order when every hash
    run is a single key (the only case this path handles).
    """
    kh = tbl.column(KEY_HASH_COL).to_numpy(zero_copy_only=False)
    lsn = tbl.column("lsn").to_numpy(zero_copy_only=False)
    if lsn.dtype.kind not in "iu" or kh.dtype.kind not in "iu":
        return None  # nulls surfaced as float NaN — exact path handles them
    # Unstable single-key argsort: grouping only needs equal hashes
    # contiguous, the winner is located by VALUE (the group's max LSN),
    # and collision detection is order-independent (a run holding two
    # distinct keys exposes a differing adjacent pair under any ordering)
    # — so the former np.lexsort((lsn, kh)) second sort pass is pure
    # overhead (measured 2-6x slower than argsort on 1-2M-row folds).
    order = np.argsort(kh)
    khs = kh[order]
    same_kh = khs[1:] == khs[:-1]
    if same_kh.any():
        pair_lo = np.flatnonzero(same_kh)
        comb = pc.binary_join_element_wise(
            tbl.column("repo"), tbl.column("path"), "\x00"
        )
        if isinstance(comb, pa.ChunkedArray):
            comb = comb.combine_chunks()
        eq = pc.equal(
            comb.take(pa.array(order[pair_lo])),
            comb.take(pa.array(order[pair_lo + 1])),
        )
        all_eq = pc.all(eq).as_py()
        if all_eq is not True:  # None (nulls) or False (hash collision)
            return None
    new_grp = np.concatenate(([True], ~same_kh))
    starts = np.flatnonzero(new_grp)
    lsns = lsn[order]
    gmax = np.maximum.reduceat(lsns, starts)
    counts = np.diff(np.append(starts, len(lsns)))
    win_idx = order[lsns == np.repeat(gmax, counts)]
    if len(win_idx) != len(starts):
        # max-LSN tie within a key (or colliding tie) — the exact path's
        # 'op' tiebreak decides.  (Ties BELOW the max no longer divert to
        # the exact path as the old adjacent-LSN check did; they cannot
        # change the winner, the event count, or the had-insert flag.)
        return None
    seg = np.cumsum(new_grp) - 1
    ev = tbl.column(EVENTS_COL).to_numpy(zero_copy_only=False)
    events = np.bincount(seg, weights=ev[order]).astype(np.int64)
    hi = tbl.column(HAD_INSERT_COL).to_numpy(zero_copy_only=False)
    had = np.bincount(seg, weights=hi[order].astype(np.int64)) > 0
    out = tbl.take(pa.array(win_idx))
    i = out.schema.get_field_index(EVENTS_COL)
    out = out.set_column(i, out.schema.field(i), pa.array(events))
    i = out.schema.get_field_index(HAD_INSERT_COL)
    out = out.set_column(i, out.schema.field(i), pa.array(had))
    if not keep_tombstones:
        out = out.filter(pc.invert(op_equal(out.column("op"), "D")))
    return out


def _has_patches(tbl: pa.Table) -> bool:
    """One kernel pass: any op='P' row in the batch?  Gates the patch
    machinery so patch-free logs (the common case) pay a single equality
    scan and keep every existing fast path."""
    if "op" not in tbl.column_names or len(tbl) == 0:
        return False
    return bool(pc.any(op_equal(tbl.column("op"), "P")).as_py())


def _compose_patches_exact(tbl: pa.Table, keep_tombstones: bool) -> pa.Table:
    """Patch-aware exact fold: one row per key = its latest FULL image
    (last non-P event, the "base") composed with every patch above it,
    column-wise last-non-null.

    Semantics (see schemas.VALID_OPS):
    - base I/U: its values, overwritten by each higher patch's non-null
      columns in LSN order.
    - base D: the image resets to all-null before patches apply (a delete
      destroys the row; patches above re-create it partially).  Composed
      op becomes 'U' — a full image whose nulls are real.
    - no base at all (orphan-patch key): patches compose into ONE op='P'
      row.  'P' persists in tombstone lakes and merge-on-read deltas —
      it tells a later fold (read-side chain fold, resume re-entry) that
      the row is still partial and must compose with any base below it.
    - keys without patches pass through EXACTLY as the patchless fold
      would emit them (same bytes — pinned by tests), so mixing patched
      and unpatched keys changes nothing for the latter.

    Requires an append-only-LSN feed (guarded in replay): composing a
    stack is lossy — a late patch with an LSN between two already-composed
    events can never be applied in its true position afterwards.
    """
    tbl = tbl.sort_by(SORT_KEYS)
    n = len(tbl)
    last, seg = _segment_last_mask(tbl)
    starts = np.flatnonzero(np.concatenate(([True], seg[1:] != seg[:-1])))
    idx = np.arange(n, dtype=np.int64)
    is_p = op_equal(tbl.column("op"), "P").to_numpy(zero_copy_only=False)
    is_d = op_equal(tbl.column("op"), "D").to_numpy(zero_copy_only=False)
    # base = last non-P row per segment (-1: all-P orphan stack)
    base_idx = np.maximum.reduceat(np.where(~is_p, idx, -1), starts)
    tmpl_idx = np.flatnonzero(last)  # winner template: the max-LSN row
    seg_last_p = is_p[tmpl_idx]
    # patched segments: last row is a patch (all-P segments included)
    patched = seg_last_p
    # rows feeding the composition: every patch above the base, plus the
    # base itself UNLESS it is a delete (a delete's stored columns are
    # not part of the re-created image)
    kept = (idx > base_idx[seg]) | (
        (idx == base_idx[seg]) & ~is_d
    )
    out = tbl.filter(pa.array(last))
    compose_cols = [
        c
        for c in tbl.column_names
        if c
        not in (*KEY_COLUMNS, "lsn", "op", EVENTS_COL, HAD_INSERT_COL, KEY_HASH_COL)
    ]
    for name in compose_cols:
        col = tbl.column(name)
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        pick = np.maximum.reduceat(np.where(kept & valid, idx, -1), starts)
        # unpatched segments keep their template value bit-for-bit
        pick = np.where(patched, pick, tmpl_idx)
        ind = pa.array(pick, mask=(pick < 0))
        composed = col.take(ind)
        i = out.schema.get_field_index(name)
        out = out.set_column(i, out.schema.field(i), composed)
    # composed op: orphan stack stays 'P'; a based stack becomes a full
    # image 'U'; unpatched segments keep their template op
    op_col = out.column("op")
    if pa.types.is_integer(op_col.type):
        u_val = pa.scalar(OP_CODES["U"], op_col.type)
        p_val = pa.scalar(OP_CODES["P"], op_col.type)
    else:
        u_val, p_val = pa.scalar("U"), pa.scalar("P")
    orphan = patched & (base_idx < 0)  # base_idx is already per-segment
    new_op = pc.if_else(
        pa.array(patched & ~orphan), u_val, op_col
    )
    new_op = pc.if_else(pa.array(orphan), p_val, new_op)
    i = out.schema.get_field_index("op")
    out = out.set_column(i, out.schema.field(i), new_op)
    # partial-agg columns aggregate over the WHOLE segment
    if EVENTS_COL in tbl.column_names:
        ev = tbl.column(EVENTS_COL).to_numpy(zero_copy_only=False)
        i = out.schema.get_field_index(EVENTS_COL)
        out = out.set_column(
            i, out.schema.field(i),
            pa.array(np.bincount(seg, weights=ev).astype(np.int64)),
        )
    if HAD_INSERT_COL in tbl.column_names:
        hi = tbl.column(HAD_INSERT_COL).to_numpy(zero_copy_only=False).astype(np.int64)
        i = out.schema.get_field_index(HAD_INSERT_COL)
        out = out.set_column(
            i, out.schema.field(i), pa.array(np.bincount(seg, weights=hi) > 0)
        )
    if not keep_tombstones:
        out = out.filter(pc.invert(op_equal(out.column("op"), "D")))
    return out


def fold_latest(
    tbl: pa.Table, keep_tombstones: bool, compose_patches: bool = False
) -> pa.Table:
    """Collapse an event table to the max-LSN event per (repo, path).

    Vectorized: an int-only lexsort fast path (``_fold_latest_fast``) with
    an exact fallback — one Arrow sort + numpy segment reduction.
    Aggregates the engine-internal ``_events`` (sum) and ``_had_insert``
    (any) columns when present so partial folds compose (combiner before
    the shuffle, final fold after — the classic partial-aggregation
    pattern).

    With ``keep_tombstones=True`` this is the COMBINER (a delete must keep
    winning until the final fold); with ``False`` it is the final fold and
    tombstoned keys are dropped.

    ``compose_patches`` governs op='P' partial updates and MUST match the
    caller's context:

    - ``True`` — the caller holds a key's COMPLETE event set (per-partition
      finalize over log+prior, merge-on-read chain fold) or a contiguous
      LSN suffix of it (a resume increment under append-only feeds): the
      patch stack composes into the final image
      (``_compose_patches_exact``).
    - ``False`` (default) — partial/subset folds (the pre-shuffle combiner,
      the exchange actors' memory-pressure compaction): composing an
      arbitrary LSN SUBSET is unsound (a full image composed from a
      subset would mask patches interleaved in other subsets), so non-P
      rows fold normally — dropping a non-P row below the subset's
      latest non-P stays globally safe — and P rows pass through
      untouched.
    """
    if len(tbl) == 0:
        return tbl
    # Synthesize the partial-agg columns when fed a raw event table (i.e.
    # outside the normalize stage) so folds compose either way.  A row
    # that reaches here with a NULL in either column came from a permissive
    # concat of folded (column present) and never-folded (column absent)
    # batches — phase 1 ships the columns only for combiner-folded rows,
    # since an unfolded row is by definition exactly one event whose
    # had-insert flag is just op == 'I'.
    if EVENTS_COL not in tbl.column_names:
        tbl = tbl.append_column(EVENTS_COL, pa.array(np.ones(len(tbl), dtype=np.int64)))
    elif tbl.column(EVENTS_COL).null_count:
        i = tbl.schema.get_field_index(EVENTS_COL)
        tbl = tbl.set_column(
            i, tbl.schema.field(i), pc.fill_null(tbl.column(EVENTS_COL), 1)
        )
    if HAD_INSERT_COL not in tbl.column_names:
        tbl = tbl.append_column(HAD_INSERT_COL, op_equal(tbl.column("op"), "I"))
    elif tbl.column(HAD_INSERT_COL).null_count:
        i = tbl.schema.get_field_index(HAD_INSERT_COL)
        tbl = tbl.set_column(
            i,
            tbl.schema.field(i),
            pc.coalesce(tbl.column(HAD_INSERT_COL), op_equal(tbl.column("op"), "I")),
        )
    if (
        KEY_HASH_COL not in tbl.column_names
        or tbl.column(KEY_HASH_COL).null_count
    ):
        # Recompute on nulls too (a permissive concat with a hash-less
        # table null-fills the column): a null hash would silently split
        # its key's group and yield two winners for one key.
        from ..hashing import key_hash

        kh = key_hash(tbl.column("repo"), tbl.column("path")).view(np.int64)
        if KEY_HASH_COL in tbl.column_names:
            i = tbl.schema.get_field_index(KEY_HASH_COL)
            tbl = tbl.set_column(i, tbl.schema.field(i), pa.array(kh))
        else:
            tbl = tbl.append_column(KEY_HASH_COL, pa.array(kh))
    if _has_patches(tbl):
        if compose_patches:
            return _compose_patches_exact(tbl, keep_tombstones)
        # subset fold: P rows pass through untouched (see docstring); the
        # non-P rows fold normally — recursion takes the patch-free path
        pmask = op_equal(tbl.column("op"), "P")
        p_rows = tbl.filter(pmask)
        rest = tbl.filter(pc.invert(pmask))
        if len(rest) == 0:
            return tbl
        folded = fold_latest(rest, keep_tombstones=keep_tombstones)
        return pa.concat_tables([folded, p_rows], promote_options="permissive")
    fast = _fold_latest_fast(tbl, keep_tombstones)
    if fast is not None:
        return fast
    tbl = tbl.sort_by(SORT_KEYS)
    last, seg = _segment_last_mask(tbl)
    agg_cols = {}
    if EVENTS_COL in tbl.column_names:
        ev = tbl.column(EVENTS_COL).to_numpy(zero_copy_only=False)
        agg_cols[EVENTS_COL] = np.bincount(seg, weights=ev).astype(np.int64)
    if HAD_INSERT_COL in tbl.column_names:
        hi = tbl.column(HAD_INSERT_COL).to_numpy(zero_copy_only=False).astype(np.int64)
        agg_cols[HAD_INSERT_COL] = np.bincount(seg, weights=hi) > 0
    out = tbl.filter(pa.array(last))
    for name, values in agg_cols.items():
        idx = out.schema.get_field_index(name)
        out = out.set_column(idx, out.schema.field(idx), pa.array(values))
    if not keep_tombstones:
        out = out.filter(pc.invert(op_equal(out.column("op"), "D")))
    return out


def finalize_partition(
    tbl: pa.Table, output_schema: pa.Schema, keep_tombstones: bool = False
) -> tuple[pa.Table, dict]:
    """Final fold for one hash partition (+ optional prior state already
    concatenated in as synthetic events at their stored LSN).

    Returns ``(final_rows, stats)`` where final_rows matches
    ``output_schema`` (repo, path, commit, lang, content, lsn,
    content_sha256, evolved extras) and stats carries the per-partition
    lineage counters (the reference's etl_log analogue,
    ``sql/etl_transformations.sql:313-323``).

    With ``keep_tombstones=True`` (SinkConfig.keep_tombstones) delete
    winners are PERSISTED as op='D' rows (null content / null sha) instead
    of dropped, and ``output_schema`` is expected to carry the ``op``
    column — the non-append-only (fan-in) merge depends on the tombstone's
    LSN staying in the lake.  ``stats["live_rows"]`` stays the live count;
    ``stats["state_rows"]`` is the committed row count incl. tombstones.
    """
    n_in = len(tbl)
    events_in = n_in
    if EVENTS_COL in tbl.column_names and n_in:
        # null _events = never-folded row = exactly one event (see fold_latest)
        events_in = int(pc.sum(pc.fill_null(tbl.column(EVENTS_COL), 1)).as_py())
    # compose_patches: finalize always holds the key's complete event set
    # (log + prior state) or a contiguous increment suffix — the two
    # contexts where patch composition is sound (see fold_latest)
    folded = fold_latest(tbl, keep_tombstones=True, compose_patches=True)
    is_del = op_equal(folded.column("op"), "D") if len(folded) else pa.array([], pa.bool_())
    had_insert = (
        folded.column(HAD_INSERT_COL).to_numpy(zero_copy_only=False)
        if HAD_INSERT_COL in folded.column_names and len(folded)
        else np.ones(len(folded), dtype=bool)
    )
    del_np = is_del.to_numpy(zero_copy_only=False) if len(folded) else np.zeros(0, bool)
    stats = {
        "events_in": events_in,
        "keys_seen": len(folded),
        "deleted_keys": int(del_np.sum()),
        "orphan_events_applied": int((~del_np & ~had_insert).sum()),
        "orphan_deletes": int((del_np & ~had_insert).sum()),
        "max_lsn": int(pc.max(tbl.column("lsn")).as_py()) if n_in else -1,
        "min_lsn": int(pc.min(tbl.column("lsn")).as_py()) if n_in else -1,
    }
    if keep_tombstones:
        live = folded  # tombstones persist; sha256(null content) -> null
    else:
        live = folded.filter(pc.invert(is_del)) if len(folded) else folded
    live = live.append_column("content_sha256", sha256_column(live.column("content")))
    arrays = []
    for field in output_schema:
        if field.name in live.column_names:
            col = live.column(field.name)
            if col.type != field.type:
                col = col.cast(field.type)
            arrays.append(col)
        else:
            arrays.append(pa.nulls(len(live), field.type))
    final = pa.Table.from_arrays(arrays, schema=output_schema)
    stats["state_rows"] = len(final)
    stats["live_rows"] = len(final) - (stats["deleted_keys"] if keep_tombstones else 0)
    return final, stats
