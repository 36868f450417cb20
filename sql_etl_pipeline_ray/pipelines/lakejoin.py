"""Partition-wise lake join: co-partitioned lakes join WITHOUT a shuffle.

At 100-TB scale the all-to-all exchange is the cost center of any join;
two lakes that share this engine's hash-partition layout (same
``num_partitions``, same ``key_hash_version``) are already co-located
key-for-key, so joining them needs ZERO data movement: one Ray task per
partition reads both sides' partition p (chain-folding merge-on-read
deltas to the live row set), joins on the key columns with pandas' C
hash join, and streams the result out as a Dataset block.  This is the
lakehouse "storage-partitioned join" (Spark SPJ / Iceberg bucket join)
realized on the engine's own layout — derived lakes
(``pipelines/derive.py``) and rescaled lakes (``replay.rescale_lake``)
adopt the source layout precisely so reads like this stay shuffle-free.

Mismatched layouts fail loudly with ``rescale_lake`` guidance rather
than silently degrading to a shuffle — at scale that degradation is the
difference between a metadata-bounded join and an exabyte exchange, so
it must be an explicit operator choice, not a fallback.

Reference analogue: the staging⋈final enrichment joins
(``sql/etl_transformations.sql:27-63``), executed layout-aware.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ..schemas import KEY_COLUMNS
from ..state import manifest as mf
from .replay import _read_chain_folded


def _layout(out_dir: str) -> tuple[dict[int, dict], int, int]:
    m = mf.read_all_manifests(out_dir)
    if not m:
        raise ValueError(f"lake {out_dir} has no committed state")
    st = next(iter(m.values()))["stats"]
    return (
        m,
        int(st.get("num_partitions", max(m) + 1)),
        int(st.get("key_hash_version", 1)),
    )


def _read_part(
    out_dir: str,
    part: int,
    m: dict | None,
    columns: list[str] | None,
    bounds=None,
) -> pd.DataFrame:
    if m is None:
        return pd.DataFrame()
    pdir = mf.partition_dir(out_dir, part)
    t = _read_chain_folded(
        pdir, m["files"], keep_tombstones=False,
        prefold_filter=bounds, columns=columns,
    )
    if "op" in t.column_names:
        t = t.drop_columns(["op"])
    df = t.to_pandas()
    if columns is not None:
        keep = [c for c in df.columns if c in set(columns) | set(KEY_COLUMNS)]
        df = df[keep]
    return df


def _range_expr(lo: tuple | None, hi: tuple | None):
    """Key-tuple range predicate ``lo < (repo, path) <= hi`` as a pyarrow
    dataset expression (open end = None).  Key predicates commute with
    the LWW fold (``replay._read_chain_folded``'s prefold contract), so
    this pushes into every chain file's Parquet scan and — on a
    ``cluster_by_key`` lake — prunes to the row groups that overlap the
    range."""
    import pyarrow.dataset as pads

    r, p = pads.field("repo"), pads.field("path")
    expr = None
    if lo is not None:
        e = (r > lo[0]) | ((r == lo[0]) & (p > lo[1]))
        expr = e
    if hi is not None:
        e = (r < hi[0]) | ((r == hi[0]) & (p <= hi[1]))
        expr = e if expr is None else (expr & e)
    return expr


def _slice_splits(
    dirs_manifests: list[tuple[str, dict | None]], part: int, slice_rows: int
) -> list[tuple[str, str]]:
    """Split keys for one partition so each key range folds ≤ roughly
    ``slice_rows`` physical rows (summed over BOTH sides' chain files).
    Derived from row-group key statistics — metadata only, no data read.
    Any tuple is a valid split point (range-partitioning the key space
    never depends on splits being actual keys), so truncated Parquet
    string statistics are fine.  Returns [] when one slice suffices or
    statistics are missing."""
    groups: list[tuple[str, str, int]] = []
    for d, m in dirs_manifests:
        if m is None:
            continue
        pdir = mf.partition_dir(d, part)
        for f in m["files"]:
            pf = pq.ParquetFile(os.path.join(pdir, f))
            sch = pf.schema_arrow
            try:
                ir = sch.names.index("repo")
                ip = sch.names.index("path")
            except ValueError:
                return []
            md = pf.metadata
            for i in range(md.num_row_groups):
                rg = md.row_group(i)
                sr, sp = rg.column(ir).statistics, rg.column(ip).statistics
                if sr is None or sp is None or sr.max is None:
                    return []
                groups.append((sr.max, sp.max, rg.num_rows))
    total = sum(g[2] for g in groups)
    if total <= slice_rows or len(groups) < 2:
        return []
    groups.sort(key=lambda g: (g[0], g[1]))
    splits: list[tuple[str, str]] = []
    acc = 0
    for repo_max, path_max, rows in groups[:-1]:
        acc += rows
        if acc >= slice_rows:
            key = (repo_max, path_max)
            if not splits or key > splits[-1]:
                splits.append(key)
                acc = 0
    return splits


def join_lakes(
    a_dir: str,
    b_dir: str,
    how: str = "inner",
    columns_a: list[str] | None = None,
    columns_b: list[str] | None = None,
    rsuffix: str = "_b",
    slice_rows: int = 2_000_000,
) -> ray.data.Dataset:
    """Join two co-partitioned lakes on the key columns (module docstring).

    ``how`` ∈ {"inner", "left"} (left = every live row of ``a``, nulls
    where ``b`` has no matching key).  ``columns_a``/``columns_b`` prune
    each side's read (keys always included); ``b``'s non-key columns that
    collide with ``a``'s are suffixed with ``rsuffix``.

    MEMORY ENVELOPE: a task never materializes a whole partition.  Each
    partition is split into key-tuple ranges of roughly ``slice_rows``
    physical rows (row-group statistics, metadata only); every slice
    folds + joins ONLY its range — the key predicate commutes with the
    LWW fold and pushes into each file's Parquet scan, so on
    ``cluster_by_key`` lakes a slice reads just the row groups that
    overlap its range.  Peak task heap is O(slice_rows), however large
    the partition grew; output stays one block per slice.  Lakes without
    key statistics fall back to one slice per partition (the r4
    whole-partition behavior)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how={how!r}: only 'inner' and 'left' joins")
    ma, pa_n, va = _layout(a_dir)
    mb, pb_n, vb = _layout(b_dir)
    if pa_n != pb_n or va != vb:
        raise ValueError(
            f"lakes are not co-partitioned (num_partitions {pa_n} vs "
            f"{pb_n}, key_hash_version {va} vs {vb}); a partition-wise "
            "join would mispair keys.  rescale_lake(...) one side to the "
            "other's partition count first — silently shuffling instead "
            "would hide an exabyte-scale exchange at 100 TB."
        )
    # b's column universe, for stable left-join schemas on b-less partitions
    b_cols = [n for n, _t in next(iter(mb.values()))["schema_fingerprint"]]
    keys = list(KEY_COLUMNS)
    # b's Arrow types, read once from a committed file footer (the last
    # chain file carries the evolved schema).  Left joins need them so a
    # partition where b is ABSENT builds its placeholder frame typed, and
    # so unmatched rows null-fill as typed ArrowDtype NA instead of
    # upcasting ints to float64 — otherwise blocks drift to per-partition
    # object/float schemas (the None-vs-NaN FutureWarning path).
    p0 = next(iter(mb))
    b_types = {
        f.name: f.type
        for f in pq.read_schema(
            os.path.join(mf.partition_dir(b_dir, p0), mb[p0]["files"][-1])
        )
    }

    def one_slice(batch: pa.Table) -> pa.Table:
        out = []
        for row in batch.to_pylist():
            p = int(row["part"])
            lo = (row["lo_repo"], row["lo_path"]) if row["lo_repo"] is not None else None
            hi = (row["hi_repo"], row["hi_path"]) if row["hi_repo"] is not None else None
            bounds = _range_expr(lo, hi)
            a = _read_part(a_dir, p, ma.get(p), columns_a, bounds)
            if not len(a):
                continue
            b = _read_part(b_dir, p, mb.get(p), columns_b, bounds)
            if not len(b):
                if how == "inner":
                    continue
                want_b = [
                    c
                    for c in (columns_b or b_cols)
                    if c in b_cols and c not in keys and c != "op"
                ]
                b = pd.DataFrame(
                    {
                        **{k: pd.Series(dtype=a[k].dtype) for k in keys},
                        **{
                            c: pd.Series(
                                dtype=pd.ArrowDtype(b_types[c])
                                if c in b_types
                                else object
                            )
                            for c in want_b
                        },
                    }
                )
            if how == "left":
                for c in b.columns:
                    if c not in keys and c in b_types:
                        b[c] = b[c].astype(pd.ArrowDtype(b_types[c]))
            ren = {
                c: f"{c}{rsuffix}"
                for c in b.columns
                if c not in keys and c in a.columns
            }
            j = a.merge(b.rename(columns=ren), on=keys, how=how)
            out.append(pa.Table.from_pandas(j, preserve_index=False))
        if not out:
            return pa.table({})
        return pa.concat_tables(out, promote_options="permissive")

    parts = sorted(set(ma) & set(mb)) if how == "inner" else sorted(ma)

    def make_slices(row: dict) -> list[dict]:
        p = int(row["part"])
        splits = _slice_splits(
            [(a_dir, ma.get(p)), (b_dir, mb.get(p))], p, slice_rows
        )
        return [
            {
                "part": p,
                "lo_repo": lo[0] if lo else None,
                "lo_path": lo[1] if lo else None,
                "hi_repo": hi[0] if hi else None,
                "hi_path": hi[1] if hi else None,
            }
            for lo, hi in zip(
                [None] + splits, splits + [None]
            )
        ]

    # Slice planning is a parallel METADATA pass (parquet footers only);
    # the take_all collects one descriptor per slice — bounded by the
    # slice count, never by data.
    slices = (
        ray.data.from_items(
            [{"part": p} for p in parts],
            override_num_blocks=max(1, len(parts)),
        )
        .flat_map(make_slices)
        .take_all()
    )
    if not slices:
        return ray.data.from_items([]).map_batches(
            one_slice, batch_format="pyarrow", batch_size=None
        )
    return ray.data.from_items(
        slices, override_num_blocks=len(slices)
    ).map_batches(one_slice, batch_format="pyarrow", batch_size=None)
