"""Materialized rollup with incremental refresh (SURVEY.md §2.5 A9).

The reference maintains ``mv_monthly_sales`` as a PostgreSQL materialized
view refreshed wholesale (``sql/etl_transformations.sql:281-296,306``).
Here the rollup is a month-partitioned Parquet directory maintained by the
same exactly-once idiom as the lake sink: each ``year=Y/month=M`` partition
is rebuilt independently (write temp → atomic rename), so "refresh" can be
INCREMENTAL — re-aggregate only the months whose inputs changed — and a
failed refresh never leaves a torn partition.
"""

from __future__ import annotations

import os
import shutil
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data
from ray.data.aggregate import Count, Sum

from .analytics import _cents, _rha


def _orders_with_month(sf_dir: str) -> ray.data.Dataset:
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderdate", "o_totalprice"],
    )

    def add_month(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate")
        return pa.table(
            {
                "year": pc.cast(pc.year(d), pa.int64()),
                "month": pc.cast(pc.month(d), pa.int64()),
                "cents": _cents(t.column("o_totalprice")),
            }
        )

    return orders.map_batches(add_month, batch_format="pyarrow", zero_copy_batch=True)


def _aggregate(ds: ray.data.Dataset) -> ray.data.Dataset:
    # money as exact int64 cents: Sum is order-independent, and the mean is
    # ONE division at the end (cents / (n*100.0)) mirroring the oracle
    return ds.groupby(["year", "month"]).aggregate(
        Count(alias_name="total_orders"),
        Sum("cents", alias_name="cents"),
    )


def refresh_monthly_sales(
    sf_dir: str,
    out_dir: str,
    months: list[tuple[int, int]] | None = None,
) -> list[tuple[int, int]]:
    """Build (months=None) or incrementally refresh the rollup.

    ``months`` limits BOTH the scan (predicate on the month-derived column
    before the groupby — at scale the orders input is month-partitioned and
    this becomes file pruning) and the rewrite, so refreshing one month
    touches one partition directory.  Returns the (year, month) partitions
    rewritten."""
    ds = _orders_with_month(sf_dir)
    if months is not None:
        wanted = {y * 100 + m for (y, m) in months}

        def keep(t: pa.Table) -> pa.Table:
            ym = pc.add(pc.multiply(t.column("year"), 100), t.column("month"))
            return t.filter(pc.is_in(ym, value_set=pa.array(sorted(wanted))))

        ds = ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    agg = _aggregate(ds).to_pandas()  # one row per month — tiny by construction
    cents = agg.pop("cents").to_numpy(dtype=np.int64)
    n = agg["total_orders"].to_numpy(dtype=np.int64)
    agg["revenue"] = _rha(cents / 100.0, 2)
    agg["avg_order_value"] = _rha(cents / (n * 100.0), 2)

    written: list[tuple[int, int]] = []
    for (y, m), grp in agg.groupby(["year", "month"]):
        part_dir = os.path.join(out_dir, f"year={int(y)}", f"month={int(m)}")
        os.makedirs(part_dir, exist_ok=True)
        tmp = os.path.join(part_dir, f".tmp-{uuid.uuid4().hex}")
        pq.write_table(pa.Table.from_pandas(grp, preserve_index=False), tmp)
        os.replace(tmp, os.path.join(part_dir, "rollup.parquet"))
        written.append((int(y), int(m)))
    return written


def read_monthly_sales(out_dir: str) -> pa.Table:
    files = sorted(
        os.path.join(r, f)
        for r, _, fs in os.walk(out_dir)
        for f in fs
        if f.endswith(".parquet")
    )
    return pa.concat_tables([pq.read_table(f) for f in files])


def mv_monthly_sales(sf_dir: str) -> pa.Table:
    """queries() entry: full build into a scratch dir, read back.  The
    refresh path (incremental month subset) is exercised by tests."""
    out = f"/tmp/mv_monthly_sales_{os.getpid()}"
    shutil.rmtree(out, ignore_errors=True)
    refresh_monthly_sales(sf_dir, out)
    t = read_monthly_sales(out)
    shutil.rmtree(out, ignore_errors=True)
    return t
