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
        op = batch.column("op")
        valid = pc.is_in(op, value_set=pa.array(VALID_OPS))
        for col in ("repo", "path", "lsn"):
            valid = pc.and_(valid, pc.is_valid(batch.column(col)))
        content_ok = pc.or_(
            pc.equal(op, pa.scalar("D")), pc.is_valid(batch.column("content"))
        )
        valid = pc.and_(valid, content_ok)
        if not pc.all(valid).as_py():
            batch = batch.filter(pc.fill_null(valid, False))
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
        return batch

    return normalize
