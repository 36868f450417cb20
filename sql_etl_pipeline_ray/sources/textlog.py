"""CSV / JSONL change-log ingestion: convert once at the edge.

The reference world is full of delimited text (its generator and result
writer both speak CSV — ``src/sample_data_generator.py:326-327``,
``src/sql_query_executor.py:533-540``), but every engine guarantee the
replay relies on is columnar: footer-stats LSN pruning, row-group-granular
fused reads, the content null gate, narrow phase-1 projection.  Text
formats have none of that, so instead of a second (degraded) replay path
we convert text buckets to the canonical LSN-bucketed Parquet staging once
and run the normal ``replay`` over the result — the same "bulk load to
staging, then transform" shape as the reference (SURVEY.md S3).

Properties:

- One Ray task per source file (buckets are generation-bounded); each task
  reads the whole text file, conforms it to the unified event schema
  (evolved extra columns are kept; ``lsn`` is cast to int64), and writes
  ``<stem>.parquet`` with 128Ki-row groups — the layout ``scan_change_log``
  plans against.
- Idempotent + resumable: temp-write then atomic rename, and an existing
  output file is skipped, so a crashed or repeated conversion never
  duplicates and only pays for missing files.
- CSV nulls: a delete's ``content`` is null; CSV cannot distinguish null
  from the empty string, so conversion reads empty strings as null
  (``strings_can_be_null``) — the lossless direction for CDC semantics
  (an I/U row with truly-empty content is not representable in CSV; JSONL
  round-trips nulls exactly and is the preferred text format).
- Embedded newlines/commas/quotes in ``content`` are handled by standard
  CSV quoting (``newlines_in_values``).
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.csv as pacsv
import pyarrow.json as pajson
import pyarrow.parquet as pq
import ray

from ..schemas import CHANGE_EVENT_SCHEMA, unify_event_schemas

TEXT_EXTENSIONS = (".csv", ".jsonl", ".ndjson")


def _read_text_file(path: str) -> pa.Table:
    if path.endswith(".csv"):
        return pacsv.read_csv(
            path,
            parse_options=pacsv.ParseOptions(newlines_in_values=True),
            convert_options=pacsv.ConvertOptions(
                strings_can_be_null=True,
                # pin the canonical columns so inference can't drift (e.g.
                # an all-digit repo column must stay string)
                column_types={f.name: f.type for f in CHANGE_EVENT_SCHEMA},
            ),
        )
    return pajson.read_json(path)


def _conform(tbl: pa.Table) -> pa.Table:
    """Canonical columns first at canonical types, evolved extras after —
    the same unification the Parquet scan applies."""
    target = unify_event_schemas([tbl.schema])
    arrays = []
    for f in target:
        if f.name in tbl.column_names:
            col = tbl.column(f.name)
            arrays.append(col.cast(f.type) if col.type != f.type else col)
        else:
            arrays.append(pa.nulls(len(tbl), f.type))
    return pa.Table.from_arrays(arrays, schema=target)


@ray.remote
def _convert_file(src: str, dst: str, row_group_size: int) -> int:
    tbl = _conform(_read_text_file(src))
    tmp = dst + ".inprogress"
    pq.write_table(tbl, tmp, compression="zstd", row_group_size=row_group_size)
    os.replace(tmp, dst)
    return len(tbl)


def convert_text_log(
    src_dir: str, out_dir: str, row_group_size: int = 128 * 1024
) -> dict:
    """Convert every CSV/JSONL bucket under ``src_dir`` to Parquet staging
    under ``out_dir`` (mirroring relative paths).  Returns a summary dict;
    already-converted files are skipped (resumable)."""
    files = sorted(
        f
        for ext in TEXT_EXTENSIONS
        for f in glob.glob(os.path.join(src_dir, "**", f"*{ext}"), recursive=True)
    )
    os.makedirs(out_dir, exist_ok=True)
    pending = []
    skipped = 0
    for src in files:
        rel = os.path.relpath(src, src_dir)
        stem = os.path.splitext(rel)[0]
        dst = os.path.join(out_dir, stem + ".parquet")
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        if os.path.exists(dst):
            skipped += 1
            continue
        pending.append(_convert_file.remote(src, dst, row_group_size))
    rows = sum(ray.get(pending)) if pending else 0
    return {
        "files_found": len(files),
        "files_converted": len(pending),
        "files_skipped": skipped,
        "rows_converted": rows,
        "out_dir": out_dir,
    }
