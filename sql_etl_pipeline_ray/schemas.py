"""Canonical Arrow schemas for the CDC engine.

The reference declares fixed DDL schemas (``sql/schema.sql``); we declare
explicit ``pyarrow.Schema`` constants instead.  The base table shape comes
from BASELINE.json ``input_hint``:
``(repo:string, path:string, commit:string, lang:string, content:string)``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# The lake table the pipeline maintains: one row per live (repo, path).
# ``lsn`` (the winning event's LSN) and ``content_sha256`` are engine-added
# lineage columns; the reference's analogue is the ``load_timestamp`` /
# ``updated_date`` audit columns on its DW tables (sql/schema.sql:110-112).
REPO_FILES_SCHEMA = pa.schema(
    [
        pa.field("repo", pa.string(), nullable=False),
        pa.field("path", pa.string(), nullable=False),
        pa.field("commit", pa.string()),
        pa.field("lang", pa.string()),
        pa.field("content", pa.string()),
        pa.field("lsn", pa.int64(), nullable=False),
        pa.field("content_sha256", pa.string()),
    ]
)

# Change-event log: the binlog-tail analogue of the reference's
# timestamp-incremental extract (src/etl_pipeline.py:231-236).  ``op`` is
# 'I' | 'U' | 'D'; ``lsn`` is a globally unique, monotonic commit sequence.
CHANGE_EVENT_SCHEMA = pa.schema(
    [
        pa.field("lsn", pa.int64(), nullable=False),
        pa.field("op", pa.string(), nullable=False),
        pa.field("repo", pa.string(), nullable=False),
        pa.field("path", pa.string(), nullable=False),
        pa.field("commit", pa.string()),
        pa.field("lang", pa.string()),
        pa.field("content", pa.string()),
    ]
)

# 'P' is a PARTIAL update (patch): null non-key columns mean "unchanged" —
# the Debezium/Mongo partial-image shape.  The merge composes a key's
# latest full image (last non-P event) with every patch above it,
# column-wise last-non-null (stages/merge.py compose_patches).  Patches
# require a feed append-only in LSN (ReplayConfig.watermark_prune): a
# patch can never be replayed INTO an already-composed stack, so fan-in
# feeds reject them.  A patch cannot set a column TO null (null means
# unchanged by definition); content may legitimately be null on P like D.
VALID_OPS = ("I", "U", "D", "P")

# Phase-1 of the late exchange ships ``op`` as a 1-byte code instead of the
# raw string column (5 B/row: 1 data byte + a 4-byte offset).  The code
# order MIRRORS the string order ('D' < 'I' < 'P' < 'U'), so every
# ascending sort / last-wins tiebreak on op is encoding-agnostic.  (Equal-
# LSN ties are contract violations resolved deterministically; the D-low
# rule — an upsert beats a delete at the same LSN — is unchanged.)
OP_CODES = {"D": 0, "I": 1, "P": 2, "U": 3}
# value_set for pc.index_in: position == code.
OP_CODE_ORDER = pa.array(["D", "I", "P", "U"])


def op_equal(col: pa.ChunkedArray | pa.Array, op: str):
    """``op == <op>`` boolean mask for either encoding (string or code)."""
    if pa.types.is_integer(col.type):
        return pc.equal(col, pa.scalar(OP_CODES[op], col.type))
    return pc.equal(col, pa.scalar(op))


def encode_op(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """String op column → int8 codes (no-op if already encoded)."""
    if pa.types.is_integer(col.type):
        return col
    return pc.index_in(col, value_set=OP_CODE_ORDER).cast(pa.int8())

# Columns that identify a row (the upsert conflict key — the reference's
# ON CONFLICT (customer_id) analogue, sql/etl_transformations.sql:27).
KEY_COLUMNS = ("repo", "path")

# Engine-internal column carrying the hash-partition id through the shuffle.
PART_COLUMN = "_part"


def unify_event_schemas(schemas: list[pa.Schema]) -> pa.Schema:
    """Unify change-event file schemas (schema evolution).

    Handles the two evolution shapes we support mid-stream:
    add-column (missing columns null-filled) and type-widen
    (int32→int64, string→large_string) via Arrow permissive promotion.
    The result is guaranteed to contain every CHANGE_EVENT_SCHEMA field.
    """
    base = [CHANGE_EVENT_SCHEMA]
    unified = pa.unify_schemas(base + list(schemas), promote_options="permissive")
    # Keep canonical columns first, evolved extras after, for stable layout.
    canonical = [f.name for f in CHANGE_EVENT_SCHEMA]
    extras = [n for n in unified.names if n not in canonical]
    return pa.schema([unified.field(n) for n in canonical + extras])


def conform_batch(tbl: pa.Table, target: pa.Schema) -> pa.Table:
    """Cast a batch to ``target``: add missing columns as nulls, cast types.

    This is the per-batch half of schema evolution — every batch leaving the
    normalize stage has the same (unified) schema, so downstream group/concat
    operations never see schema drift.
    """
    n = len(tbl)
    arrays = []
    for field in target:
        if field.name in tbl.column_names:
            col = tbl.column(field.name)
            if col.type != field.type:
                col = col.cast(field.type)
            arrays.append(col)
        else:
            arrays.append(pa.nulls(n, field.type))
    return pa.Table.from_arrays(arrays, schema=target)
