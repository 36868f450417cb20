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
    out_dir: str, part: int, m: dict | None, columns: list[str] | None
) -> pd.DataFrame:
    if m is None:
        return pd.DataFrame()
    pdir = mf.partition_dir(out_dir, part)
    t = _read_chain_folded(
        pdir, m["files"], keep_tombstones=False, columns=columns
    )
    if "op" in t.column_names:
        t = t.drop_columns(["op"])
    df = t.to_pandas()
    if columns is not None:
        keep = [c for c in df.columns if c in set(columns) | set(KEY_COLUMNS)]
        df = df[keep]
    return df


def join_lakes(
    a_dir: str,
    b_dir: str,
    how: str = "inner",
    columns_a: list[str] | None = None,
    columns_b: list[str] | None = None,
    rsuffix: str = "_b",
) -> ray.data.Dataset:
    """Join two co-partitioned lakes on the key columns (module docstring).

    ``how`` ∈ {"inner", "left"} (left = every live row of ``a``, nulls
    where ``b`` has no matching key).  ``columns_a``/``columns_b`` prune
    each side's read (keys always included); ``b``'s non-key columns that
    collide with ``a``'s are suffixed with ``rsuffix``.
    """
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

    def one_part(batch: pa.Table) -> pa.Table:
        out = []
        for row in batch.to_pylist():
            p = int(row["part"])
            a = _read_part(a_dir, p, ma.get(p), columns_a)
            if not len(a):
                continue
            b = _read_part(b_dir, p, mb.get(p), columns_b)
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
    return ray.data.from_items(
        [{"part": p} for p in parts], override_num_blocks=max(1, len(parts))
    ).map_batches(one_part, batch_format="pyarrow", batch_size=None)
