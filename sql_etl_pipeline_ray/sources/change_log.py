"""Change-log source: schema-unified, LSN-pruned Parquet scan.

The reference's incremental extract narrows a SQL WHERE clause
(``WHERE updated_date > :last_ts``, ``src/etl_pipeline.py:231-236``).  Our
log is LSN-bucketed Parquet; pruning happens at two levels:

1. FILE level (here, driver-side, metadata only): a bucket file whose
   row-group LSN statistics are wholly ``<= min(checkpoint LSNs)`` cannot
   contribute to any partition — skipped before a byte of data is read.
2. ROW level (normalize stage): per-partition ``lsn > checkpoint[part]``
   filter, vectorized.

Schema evolution is resolved up front from Parquet FOOTERS only (cheap at
any scale — no data read): all file schemas are unified permissively
(add-column → nulls, int32→int64 / string→large_string widen), and every
batch is conformed to the unified schema in the normalize stage so
downstream stages never see schema drift (SURVEY.md §7 known-hard #7).
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ..schemas import unify_event_schemas


@dataclass
class LogScan:
    files: list[str]
    schema: pa.Schema  # unified
    pruned_files: int
    total_bytes: int = 0
    # rows per row group for each kept file (footer metadata, no data read)
    # — lets the replay feeds plan row-group-granular read tasks without a
    # second metadata pass.
    row_groups: dict[str, list[int]] | None = None
    # max LSN across ALL files (including pruned ones) from footer stats —
    # the log high-water mark a successful replay stamps into the lake so
    # monitors (lake_lag) can prove catch-up without reading data.  -1 when
    # the log is empty or footers carry no lsn statistics.
    max_lsn: int = -1
    # content side-store layout (ChangeLogSpec.layout="sidestore"): per
    # META file, its sibling ``*.content.parquet`` descriptor —
    # {"path", "rg_lsn": [(min, max)...], "rg_bytes": [...], "bytes"} —
    # collected from footers only.  Empty for inline logs.
    side_content: dict | None = None


def scan_change_log(
    log_dir: str, min_lsn: int | None = None, extra_schemas: list[pa.Schema] | None = None
) -> LogScan:
    """Footer-only scan: unified schema + file-level LSN pruning."""
    files = sorted(glob.glob(os.path.join(log_dir, "**", "*.parquet"), recursive=True))
    content_siblings = {f for f in files if f.endswith(".content.parquet")}
    files = [f for f in files if f not in content_siblings]
    schemas, kept, pruned = [], [], 0
    row_groups: dict[str, list[int]] = {}
    side_content: dict[str, dict] = {}
    scan_max = -1
    for f in files:
        pf = pq.ParquetFile(f)
        fschema = pf.schema_arrow
        if "content_null" in fschema.names:
            # side-store meta file: the event schema it CONTRIBUTES is the
            # logical one — content (typed from the sibling) instead of
            # the physical content_null marker
            sib = f[: -len(".parquet")] + ".content.parquet"
            if sib not in content_siblings:
                raise ValueError(
                    f"side-store meta file {f} has no content sibling {sib}"
                )
            cpf = pq.ParquetFile(sib)
            cidx = cpf.schema_arrow.get_field_index("lsn")
            rg_lsn, rg_bytes = [], []
            for i in range(cpf.metadata.num_row_groups):
                st = cpf.metadata.row_group(i).column(cidx).statistics
                rg_lsn.append(
                    (st.min, st.max) if st is not None else (None, None)
                )
                rg = cpf.metadata.row_group(i)
                rg_bytes.append(
                    sum(
                        rg.column(c).total_compressed_size
                        for c in range(rg.num_columns)
                    )
                )
            side_content[f] = {
                "path": sib,
                "rg_lsn": rg_lsn,
                "rg_bytes": rg_bytes,
                "bytes": os.path.getsize(sib),
            }
            fschema = pa.schema(
                [fl for fl in fschema if fl.name != "content_null"]
                + [cpf.schema_arrow.field("content")]
            )
        schemas.append(fschema)
        lsn_idx = pf.schema_arrow.get_field_index("lsn")
        maxes = [
            pf.metadata.row_group(i).column(lsn_idx).statistics.max
            for i in range(pf.metadata.num_row_groups)
            if pf.metadata.row_group(i).column(lsn_idx).statistics is not None
        ]
        if maxes:
            scan_max = max(scan_max, max(maxes))
        if min_lsn is not None and maxes and max(maxes) <= min_lsn:
            pruned += 1
            continue
        kept.append(f)
        row_groups[f] = [
            pf.metadata.row_group(i).num_rows
            for i in range(pf.metadata.num_row_groups)
        ]
    unified = unify_event_schemas(schemas + list(extra_schemas or []))
    total = sum(os.path.getsize(f) for f in kept) + sum(
        side_content[f]["bytes"] for f in kept if f in side_content
    )
    return LogScan(
        files=kept, schema=unified, pruned_files=pruned, total_bytes=total,
        row_groups=row_groups, max_lsn=scan_max,
        side_content={k: v for k, v in side_content.items() if k in set(kept)},
    )


def read_change_log(
    scan: LogScan, num_blocks: int | None = None, concurrency: int | None = None
) -> ray.data.Dataset:
    """Streaming Parquet read over the surviving files.

    ``num_blocks`` deliberately overrides Ray's default splitting (which
    targets ~200 blocks regardless of size): the downstream sort exchange
    creates blocks × partitions fragments, so block count must scale with
    DATA, not with a fixed parallelism target — measured 45s → 4s on a 2M
    event replay from this alone.

    The change log needs every event column, so no projection here —
    analytics readers over the lake DO prune columns.
    """
    if scan.side_content:
        # meta files carry no content column — a plain read would conform
        # content to all-null and silently corrupt any consumer that needs
        # payloads.  The late-exchange replay is the side-store reader.
        raise ValueError(
            "this change log uses the content side-store layout; only "
            "replay(exchange='late') can read it (read_change_log would "
            "see null content)"
        )
    if not scan.files:
        return ray.data.from_arrow(scan.schema.empty_table())
    kwargs = {}
    if num_blocks:
        kwargs["override_num_blocks"] = num_blocks
    if concurrency:
        kwargs["concurrency"] = concurrency
    return ray.data.read_parquet(scan.files, **kwargs)
