"""Normalize/validate stage: stateless ``map_batches`` over zero-copy Arrow.

Maps the reference's per-table pandas transforms + warn-only validation
pass (``src/etl_pipeline.py:149-189``, ``src/data_validator.py:313-359``)
onto one vectorized Arrow batch function that:

1. conforms the batch to the unified (evolution-aware) schema,
2. validates hard invariants (op ∈ {I,U,D}, non-null repo/path/lsn,
   content present on I/U) — invalid rows are dropped (warn-only flow,
   ``src/etl_pipeline.py:163-167``; the separate ``stages.validate`` audit
   reports them),
3. trims whitespace on key columns (reference default transform,
   ``src/etl_pipeline.py:331-344``),
4. assigns the hash-partition id on (repo, path),
5. applies the per-partition LSN checkpoint filter (resume),
6. optionally pre-folds latest-per-key within the batch (combiner —
   partial aggregation before the shuffle; tombstones kept).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..hashing import key_hash
from ..schemas import PART_COLUMN, VALID_OPS, conform_batch
from .merge import EVENTS_COL, HAD_INSERT_COL, KEY_HASH_COL, fold_latest

# Reason column attached to quarantined (dead-lettered) events.
REJECT_REASON_COL = "_reject_reason"

# Reason codes, in attribution priority order (a row failing several
# invariants reports the first).
REASON_NULL_LSN = "null_lsn"
REASON_NULL_KEY = "null_key"
REASON_BAD_OP = "bad_op"
REASON_NULL_CONTENT = "null_content"


def event_validity(
    batch: pa.Table, content_valid: np.ndarray | bool | None = None
) -> tuple[np.ndarray | None, np.ndarray | None]:
    """Vectorized hard-invariant check shared by EVERY exchange strategy.

    One predicate, one place: op ∈ {I,U,D,P}, non-null lsn/repo/path, and
    content present on I/U (a delete legitimately carries no content, and
    a partial update's null content means "unchanged").
    Divergence here is how replay strategies stop being byte-identical on
    dirty logs — the late strategy's phase 1 must reject exactly the rows
    the single-phase normalizer would, or the two pick different winners.

    ``content_valid`` lets the caller supply content presence out-of-band:
    the late strategy's phase 1 reads only ``(lsn, op, repo, path)`` and
    derives content nullity from Parquet footer ``null_count`` statistics
    (decoding content just to null-check it would forfeit the narrow-read
    design).  ``True`` means "caller proved every row has content";
    ``None`` means "derive it from the batch" (all-null when the column is
    absent — a file missing ``content`` conforms to nulls downstream, so
    its I/U rows can never commit content and are invalid).

    Returns ``(valid_mask, reason_codes)`` as numpy arrays, or
    ``(None, None)`` when every row passes (the clean-log fast path — no
    allocation beyond the masks).
    """
    n = len(batch)
    if n == 0:
        return None, None

    def _np(arr):
        return pc.fill_null(arr, False).to_numpy(zero_copy_only=False)

    op = batch.column("op")
    ok_lsn = _np(pc.is_valid(batch.column("lsn")))
    ok_key = _np(pc.is_valid(batch.column("repo"))) & _np(
        pc.is_valid(batch.column("path"))
    )
    ok_op = _np(pc.is_in(op, value_set=pa.array(VALID_OPS)))
    if content_valid is True:
        ok_content = None
    else:
        if content_valid is None:
            if "content" in batch.column_names:
                content_valid = _np(pc.is_valid(batch.column("content")))
            else:
                content_valid = np.zeros(n, dtype=bool)
        # D carries no content by nature; P's null content means
        # "unchanged" (partial update) — both are content-exempt
        ok_content = (
            content_valid
            | _np(pc.equal(op, pa.scalar("D")))
            | _np(pc.equal(op, pa.scalar("P")))
        )
    valid = ok_lsn & ok_key & ok_op
    if ok_content is not None:
        valid &= ok_content
    if valid.all():
        return None, None
    reasons = np.full(n, REASON_NULL_CONTENT, dtype=object)
    reasons[~ok_op] = REASON_BAD_OP
    reasons[~ok_key] = REASON_NULL_KEY
    reasons[~ok_lsn] = REASON_NULL_LSN
    return valid, reasons


def reject_error(reasons: np.ndarray, valid: np.ndarray) -> ValueError:
    """Build the strict-mode (``drop_invalid=False``) failure: a reason
    histogram so the operator knows WHAT is malformed before any commit."""
    kinds, counts = np.unique(reasons[~valid], return_counts=True)
    hist = ", ".join(f"{k}={c}" for k, c in zip(kinds, counts))
    return ValueError(
        f"{int((~valid).sum())} invalid change events ({hist}); "
        "set ReplayConfig(drop_invalid=True) to drop them, or add a "
        "quarantine_dir to capture them as a dead-letter table"
    )


def empty_strings_to_null(
    batch: pa.Table, columns: list[str] | None = None, trim: bool = True
) -> pa.Table:
    """Cleanse mutation: trim string columns and convert ``''`` to NULL —
    the reference's ``replace('', None)`` cleanse pass
    (``src/data_validator.py:329-359``), vectorized as Arrow kernels for
    use inside ``map_batches``.  ``columns=None`` applies to every
    string-typed column."""
    for name in columns or batch.column_names:
        i = batch.schema.get_field_index(name)
        col = batch.column(i)
        if not pa.types.is_string(col.type) and not pa.types.is_large_string(col.type):
            continue
        if trim:
            col = pc.utf8_trim_whitespace(col)
        col = pc.if_else(
            pc.equal(col, pa.scalar("", col.type)), pa.scalar(None, col.type), col
        )
        batch = batch.set_column(i, batch.schema.field(i).with_nullable(True), col)
    return batch


def make_normalizer(
    target_schema: pa.Schema,
    num_partitions: int,
    checkpoints: dict[int, int] | None = None,
    combine: bool = True,
    strict: bool = False,
    allow_patches: bool = True,
):
    """Build the batch fn for ``ds.map_batches(fn, batch_format='pyarrow')``.

    ``checkpoints`` is tiny (num_partitions entries) so closure capture
    ships it once per task via the object store — the broadcast-small-side
    pattern, not a per-batch re-ship.
    """
    ckpt_arr = None
    if checkpoints:
        ckpt_arr = np.full(num_partitions, -1, dtype=np.int64)
        for part, lsn in checkpoints.items():
            ckpt_arr[part] = lsn

    def normalize(batch: pa.Table) -> pa.Table:
        batch = conform_batch(batch, target_schema)
        valid, reasons = event_validity(batch)
        if valid is not None:
            if strict:
                raise reject_error(reasons, valid)
            batch = batch.filter(pa.array(valid))
        if not allow_patches and len(batch) and bool(
            pc.any(pc.equal(batch.column("op"), pa.scalar("P"))).as_py()
        ):
            # mirrors the late strategy's guard: patches require an
            # append-only-LSN feed (see replay.py _make_phase1_process)
            raise ValueError(
                "op='P' partial-update events require an append-only-LSN "
                "feed; this replay runs with watermark_prune=False"
            )
        for col in ("repo", "path"):
            idx = batch.schema.get_field_index(col)
            batch = batch.set_column(
                idx, batch.schema.field(idx), pc.utf8_trim_whitespace(batch.column(col))
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
        batch = batch.append_column(PART_COLUMN, pa.array(parts, type=pa.int64()))
        batch = batch.append_column(KEY_HASH_COL, pa.array(kh.view(np.int64)))
        batch = batch.append_column(EVENTS_COL, pa.array(np.ones(n, dtype=np.int64)))
        batch = batch.append_column(
            HAD_INSERT_COL, pc.equal(batch.column("op"), pa.scalar("I"))
        )
        if combine:
            batch = fold_latest(batch, keep_tombstones=True)
        # Reject count rides as schema metadata so the exchange feeder can
        # surface it in its ack rows without widening the batch contract.
        nrej = int((~valid).sum()) if valid is not None else 0
        return batch.replace_schema_metadata({b"rejected": str(nrej).encode()})

    return normalize
