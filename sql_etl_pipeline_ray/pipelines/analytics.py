"""Analytics layer: the reference's query capabilities, Ray-Data-first.

The reference pushes five CTE + window-function + JOIN analytics queries
into PostgreSQL (``src/sql_query_executor.py:78-510``) and keeps the upsert
/ dedup idioms in SQL (``sql/etl_transformations.sql``,
``sql/complex_queries.sql``).  Here each capability is a named pipeline
function over the driver's TPC-H-ish Parquet tables, expressed as Dataset
transforms:

- grouped aggregates        → ``groupby().aggregate(...)``  (A1-A4)
- big-big joins             → ``Dataset.join`` (hash join)   (J1, J2)
- small-side joins          → ``ray.put`` broadcast + map-side lookup (J3-J5)
- anti-joins                → broadcast key set + filter     (J6)
- window functions          → per-group ``map_groups`` / sorted
                              single-partition pass on SMALL aggregates
                              (W1-W8; the reference never windows raw events)
- top-k per group           → ``groupby().map_groups(head k)`` (J9)
- global sort + limit       → ``sort().limit()``             (O1, O2)
- UNION ALL quality report  → small unions                   (U1, A7)
- LWW / latest-version      → the CDC fold applied to the events table
                              (D3, W1 — the ON CONFLICT DO UPDATE idiom)

Each function takes ``sf_dir`` and returns a Dataset / Arrow table whose
column names match its DuckDB oracle in ``__ray_entry__.oracle_sql``.

Scale notes are inline: every broadcast states its size assumption, every
shuffle is deliberate, and per-batch work is Arrow/pandas-vectorized.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data
from ray.data.aggregate import Count, Mean, Sum

from ..scale import autoscale_pool
from ..stages.hashagg import hash_agg

# DuckDB ROUND() rounds half away from zero; match it exactly.
_ROUND = {"round_mode": "half_towards_infinity"}


def _t(sf_dir: str, name: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Column-pruned Parquet read (prune at the read, SURVEY.md §4)."""
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{name}.parquet"), columns=columns
    )


def _small(sf_dir: str, name: str, columns: list[str] | None = None) -> pa.Table:
    """Driver-side read of a SMALL dimension table (for broadcast)."""
    return pq.read_table(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def _join_partitions(sf_dir: str, *tables: str) -> int:
    """Hash-join partition count scaled to the input: ~128 MiB of on-disk
    bytes per partition across the joined tables, floor 8 (keeps every core
    busy at test scale), cap 512 (bounds shuffle-fragment count).  At 100×
    the data this grows linearly instead of funnelling everything through a
    fixed 8-16 partitions."""
    total = sum(
        os.path.getsize(os.path.join(sf_dir, f"{t}.parquet")) for t in tables
    )
    return int(min(512, max(8, total // (128 << 20) + 1)))


def _by_key_partitions(
    ds: ray.data.Dataset,
    key_col: str,
    part_fn,
    num_partitions: int,
) -> ray.data.Dataset:
    """Key-partitioned vectorized group processing.

    ``groupby(key).map_groups(fn)`` calls ``fn`` once per GROUP — one
    Python-level pandas call per customer/user is the per-row-loop
    anti-pattern one level up.  This helper hash-partitions on an int key
    and calls ``part_fn`` once per PARTITION with every key's rows
    co-located, so the per-group work happens inside ``part_fn`` as
    vectorized pandas (sort + shift/diff + groupby-agg, all C).  Python
    call count = partitions (scales with data via ``_join_partitions``),
    not groups.
    """

    def add_gp(t: pa.Table) -> pa.Table:
        k = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("_gp", pa.array(k % num_partitions))

    def run(g: pd.DataFrame) -> pd.DataFrame:
        return part_fn(g.drop(columns=["_gp"]))

    return (
        ds.map_batches(add_gp, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_gp")
        .map_groups(run, batch_format="pandas")
    )


# Hash-partitioned exact aggregation — one exchange on key % P plus a
# per-partition pandas hash groupby, instead of Ray's global sort per
# aggregate.  Shared implementation + rationale: ``stages/hashagg.py``.
_hash_agg = hash_agg


def _round2(tbl: pa.Table, cols: list[str]) -> pa.Table:
    for c in cols:
        i = tbl.schema.get_field_index(c)
        tbl = tbl.set_column(i, c, pc.round(tbl.column(c), 2, **_ROUND))
    return tbl


def _cents(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """2-decimal money column → exact int64 cents.

    Summing doubles is order-dependent: Ray's partial+final aggregation and
    DuckDB's scan-order accumulation can differ by 1 ulp, and exactly at a
    ``.005`` boundary ``ROUND(..., 2)`` then diverges (the round-1 hash
    failures in customer_order_metrics / rfm / per_order_allocation).
    Prices in this data carry 2 decimals, so ``round(x*100)`` is an exact
    integer far from the 0.5 rounding cliff; int64 sums are associative, so
    any aggregation order yields the same value on both engines, and the
    single final division mirrors the oracle's IEEE ops exactly."""
    return pc.cast(pc.round(pc.multiply(col, pa.scalar(100.0))), pa.int64())


# ---------------------------------------------------------------------------
# CDC idioms over the driver's `events` table (SQL-oracled LWW semantics)
# ---------------------------------------------------------------------------


def _latest_per_user(ds: ray.data.Dataset, num_partitions: int) -> ray.data.Dataset:
    """Latest event per user_id ordered by event_id — the pick-latest window
    (``ROW_NUMBER() OVER (PARTITION BY ... ORDER BY ... DESC) = 1``,
    sql/complex_queries.sql:27) as partial fold + key-partitioned fold.

    The map_batches pre-fold is the combiner (shrinks the shuffle); the
    final fold runs once per key-hash PARTITION via ``_by_key_partitions``
    (one vectorized sort + drop_duplicates per partition — NOT one Python
    ``map_groups`` call per user, the per-group anti-pattern)."""

    def batch_latest(df: pd.DataFrame) -> pd.DataFrame:
        return df.loc[df.groupby("user_id")["event_id"].idxmax()]

    def part_latest(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["user_id", "event_id"], kind="mergesort").drop_duplicates(
            "user_id", keep="last"
        )

    pre = ds.map_batches(batch_latest, batch_format="pandas")
    return _by_key_partitions(pre, "user_id", part_latest, num_partitions)


def cdc_lww_latest_event(sf_dir: str) -> ray.data.Dataset:
    """Last-writer-wins current state of the events stream keyed by user."""
    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value"])
    return _latest_per_user(ds, _join_partitions(sf_dir, "events"))


def cdc_lww_with_deletes(sf_dir: str) -> ray.data.Dataset:
    """LWW where a trailing 'error' event tombstones the key (D3 delete
    semantics: latest op wins; tombstoned keys absent from final state)."""
    out = cdc_lww_latest_event(sf_dir)
    return out.filter(expr="event_type != 'error'")


def cdc_incremental_highwater(sf_dir: str) -> ray.data.Dataset:
    """Incremental extract: only events past the high-water mark (the
    reference's ``WHERE updated_date > :last_ts``,
    src/etl_pipeline.py:231-236), then LWW state of that increment."""
    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value"])
    watermark = ds.max("event_id") // 2
    inc = ds.filter(expr=f"event_id > {watermark}")
    return _latest_per_user(inc, _join_partitions(sf_dir, "events"))


# ---------------------------------------------------------------------------
# Customer metrics (reference customer-analytics query,
# src/sql_query_executor.py:78-150)
# ---------------------------------------------------------------------------


def customer_order_metrics(sf_dir: str) -> ray.data.Dataset:
    """A1/A2/J1: per-customer order aggregates, LEFT JOIN so customers with
    no orders appear with COALESCE'd zeros (src/sql_query_executor.py:92-93).

    Shuffle plan: one groupby on o_custkey (pre-aggregated by Ray's
    partial+final under the hood), then a hash join customer⋈agg.  Money is
    summed as exact int64 cents (see ``_cents``) so the rounded outputs are
    aggregation-order-independent and hash-identical to the oracle."""
    orders = _t(sf_dir, "orders", ["o_custkey", "o_totalprice", "o_orderdate"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "tp_cents": _cents(t.column("o_totalprice")),
                "o_orderdate": t.column("o_orderdate"),
            }
        )

    agg = _hash_agg(
        orders.map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True),
        ["o_custkey"],
        {
            "total_orders": ("tp_cents", "size"),
            "lv_cents": ("tp_cents", "sum"),
            "first_order_date": ("o_orderdate", "min"),
            "last_order_date": ("o_orderdate", "max"),
        },
        _join_partitions(sf_dir, "orders"),
    )
    cust = _t(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])
    joined = cust.join(
        agg,
        join_type="left_outer",
        num_partitions=_join_partitions(sf_dir, "customer", "orders"),
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.drop_columns([c for c in ("o_custkey",) if c in t.column_names])
        cnt = pc.fill_null(pc.cast(t.column("total_orders"), pa.int64()), 0)
        cents_f = pc.cast(
            pc.fill_null(pc.cast(t.column("lv_cents"), pa.int64()), 0), pa.float64()
        )
        lifetime = pc.round(pc.divide(cents_f, pa.scalar(100.0)), 2, **_ROUND)
        # avg = cents / (count * 100.0) — mirrors the oracle's op order;
        # count clamped to ≥1 inside the division (cents is 0 there anyway)
        # so no div-by-zero ever evaluates, then masked to 0 by if_else
        cnt_f = pc.max_element_wise(pc.cast(cnt, pa.float64()), pa.scalar(1.0))
        avg = pc.if_else(
            pc.greater(cnt, pa.scalar(0, pa.int64())),
            pc.round(
                pc.divide(cents_f, pc.multiply(cnt_f, pa.scalar(100.0))), 2, **_ROUND
            ),
            pa.scalar(0.0),
        )
        i = t.schema.get_field_index("total_orders")
        t = t.set_column(i, "total_orders", cnt)
        i = t.schema.get_field_index("lv_cents")
        t = t.set_column(i, pa.field("lifetime_value", pa.float64()), lifetime)
        return t.append_column("avg_order_value", avg)

    return joined.map_batches(finish, batch_format="pyarrow")


def customer_ltv_ranked(sf_dir: str) -> pa.Table:
    """W1-W3 + O1: row_number / rank-within-segment / NTILE(10) decile over
    customer lifetime value, top 100 (src/sql_query_executor.py:104-134).

    Windows run on the ALREADY-AGGREGATED customer frame (one row per
    customer): per-segment ranks via groupby.map_groups (distributed),
    then the global windows via a DISTRIBUTED sort + limit — only the 100
    result rows ever reach the driver.  ROW_NUMBER over the top-100 is its
    global rank by construction, and NTILE(10) is a pure function of
    (global rank, total row count), so neither needs the full frame
    materialized (the round-1 version's driver-side to_pandas of every
    customer — wrong shape at 100×)."""
    metrics = customer_order_metrics(sf_dir)

    def seg_rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["lifetime_value", "c_custkey"], ascending=[False, True])
        g["segment_rank"] = (
            g["lifetime_value"].rank(method="min", ascending=False).astype(np.int64)
        )
        # DENSE_RANK twin (ref sql/complex_queries.sql:190-191)
        g["segment_dense_rank"] = (
            g["lifetime_value"].rank(method="dense", ascending=False).astype(np.int64)
        )
        return g

    ranked = metrics.groupby("c_mktsegment").map_groups(
        seg_rank, batch_format="pandas"
    ).materialize()  # consumed twice below (count + sort); one row/customer
    n = ranked.count()
    df = (
        ranked.sort(["lifetime_value", "c_custkey"], descending=[True, False])
        .limit(100)
        .to_pandas()
    )
    r = np.arange(1, len(df) + 1, dtype=np.int64)
    df["ltv_row_number"] = r
    # NTILE(k) from (rank, n) alone: first n%k tiles hold n//k+1 rows
    tiles = 10
    base, rem = divmod(n, tiles)
    big_span = rem * (base + 1)
    in_big = r <= big_span
    with np.errstate(divide="ignore", invalid="ignore"):
        df["ltv_decile"] = np.where(
            in_big,
            np.ceil(r / max(base + 1, 1)),
            rem + np.ceil((r - big_span) / max(base, 1)),
        ).astype(np.int64)
    return pa.Table.from_pandas(df, preserve_index=False)


# ---------------------------------------------------------------------------
# Monthly trends (reference sales-trends query, src/sql_query_executor.py:234-319)
# ---------------------------------------------------------------------------


def monthly_sales_trends(sf_dir: str) -> pa.Table:
    """A3/A4 + W4-W6: per-month revenue, COUNT(DISTINCT customers), then
    LAG MoM growth, LAG-12 YoY growth (ref sql/complex_queries.sql:167-173),
    3-month rolling average, cumulative YTD revenue.

    Exact COUNT(DISTINCT) via two-level aggregation (no sketches in the
    reference): groupby(month, customer) → groupby(month).  Windows run on
    the tiny month-level frame, sorted, in one pass.  Revenue aggregates as
    int64 cents (``_cents``) so every derived window value is a function of
    exact integers — hash-identical to the oracle in any aggregation
    order."""
    orders = _t(sf_dir, "orders", ["o_custkey", "o_totalprice", "o_orderdate"])

    def add_month(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate")
        return pa.table(
            {
                "o_year": pc.cast(pc.year(d), pa.int64()),
                "o_month": pc.cast(pc.month(d), pa.int64()),
                "o_custkey": t.column("o_custkey"),
                "rev_cents": _cents(t.column("o_totalprice")),
            }
        )

    with_month = orders.map_batches(add_month, batch_format="pyarrow")

    # Both COUNT(DISTINCT) levels in ONE exchange: partition by customer,
    # so a customer's (year, month) duplicates are fully local — each
    # partition emits exact per-month partials (its distinct-customer
    # count, order count, cents), and the cross-partition fold is a tiny
    # P × |months| frame (P scales ~input/128 MiB, months ~10²: driver-
    # side sum is bounded and exact int64).
    def month_partials(g: pd.DataFrame) -> pd.DataFrame:
        lvl1 = g.groupby(["o_year", "o_month", "o_custkey"], sort=False).agg(
            orders_count=("rev_cents", "size"), rev_cents=("rev_cents", "sum")
        )
        lvl2 = (
            lvl1.reset_index()
            .groupby(["o_year", "o_month"], sort=False)
            .agg(
                unique_customers=("o_custkey", "size"),
                orders_count=("orders_count", "sum"),
                rev_cents=("rev_cents", "sum"),
            )
        )
        return lvl2.reset_index()

    partials = _by_key_partitions(
        with_month, "o_custkey", month_partials, _join_partitions(sf_dir, "orders")
    )
    df = (
        partials.to_pandas()
        .groupby(["o_year", "o_month"], as_index=False)[
            ["unique_customers", "orders_count", "rev_cents"]
        ]
        .sum()
        .sort_values(["o_year", "o_month"])
        .reset_index(drop=True)
    )
    cents = df["rev_cents"].to_numpy(dtype=np.int64)
    rev_d = cents / 100.0  # same op as the oracle's rev_cents / 100.0
    df["revenue"] = _rha(rev_d, 2)
    for col, n in (("mom_growth_pct", 1), ("yoy_growth_pct", 12)):
        lag = np.full(len(rev_d), np.nan)
        lag[n:] = rev_d[:-n] if n else rev_d
        with np.errstate(invalid="ignore", divide="ignore"):
            df[col] = _rha(
                np.where(np.isnan(lag) | (lag == 0), np.nan, (rev_d - lag) / lag * 100),
                2,
            )
    # rolling mean over exact integer cents: sums stay exact, the single
    # division then /100.0 mirrors DuckDB's AVG(rev_cents) OVER ... / 100.0
    roll = pd.Series(cents, dtype=np.float64).rolling(3, min_periods=1).mean()
    df["rolling_3m_avg"] = _rha(roll.to_numpy() / 100.0, 2)
    cum = df.groupby("o_year")["rev_cents"].cumsum().to_numpy(dtype=np.int64)
    df["cum_revenue_ytd"] = _rha(cum / 100.0, 2)
    df["orders_count"] = df["orders_count"].astype(np.int64)
    return pa.Table.from_pandas(df.drop(columns=["rev_cents"]), preserve_index=False)


# ---------------------------------------------------------------------------
# Product performance (reference product-performance query,
# src/sql_query_executor.py:152-232) — broadcast join + partial agg
# ---------------------------------------------------------------------------


def product_performance(sf_dir: str) -> pa.Table:
    """J2/J3 + O1: lineitem revenue per part, top 100 by revenue, with
    part attributes attached (sql/etl_transformations.sql:151-152 dim-key
    lookup idiom; reference query src/sql_query_executor.py:152-232).

    The sort keys (rev_u, l_partkey) come straight out of the aggregate,
    so the dimension attach happens AFTER the limit: sort+limit runs on
    the bare (partkey, qty, rev, lines) rollup and only the 100 winning
    part keys are read back with a parquet predicate-pushdown filter —
    no broadcast of `part`, no actor pool, O(k) attach work at ANY corpus
    scale (the round-2 design attached attributes to every part row
    before sorting)."""
    li = _t(
        sf_dir,
        "lineitem",
        ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def add_revenue(t: pa.Table) -> pa.Table:
        # price*(1-disc) as EXACT int64 in 1e-4-dollar units: both factors
        # carry 2 decimals, so cents(price) * (100 - cents(disc)) is an
        # integer and the Sum is order-independent (see _cents).
        rev_u = pc.multiply(
            _cents(t.column("l_extendedprice")),
            pc.subtract(pa.scalar(100, pa.int64()), _cents(t.column("l_discount"))),
        )
        # prune to the exchange columns: price/discount never shuffle
        return pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "l_quantity": t.column("l_quantity"),
                "rev_u": rev_u,
            }
        )

    agg = _hash_agg(
        li.map_batches(add_revenue, batch_format="pyarrow", zero_copy_batch=True),
        ["l_partkey"],
        {
            "total_qty": ("l_quantity", "sum"),
            "rev_u": ("rev_u", "sum"),
            "num_lines": ("rev_u", "size"),
        },
        _join_partitions(sf_dir, "lineitem"),
    )
    df = (
        agg.sort(["rev_u", "l_partkey"], descending=[True, False])
        .limit(100)
        .to_pandas()
    )
    # Attach part attributes to the 100 winners only: row-group-pruned
    # driver read of exactly those keys (the winner set is O(k), so this
    # stays a driver-side lookup at any scale).
    part_hit = pq.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_name", "p_brand", "p_retailprice"],
        filters=pc.field("p_partkey").isin(df["l_partkey"].to_numpy()),
    ).to_pandas()
    idx = part_hit.set_index("p_partkey").reindex(df["l_partkey"].values)
    for c in ("p_name", "p_brand", "p_retailprice"):
        df[c] = idx[c].values
    # single division mirrors the oracle's ROUND(SUM(u)/10000.0, 2)
    df["revenue"] = _rha(df.pop("rev_u").to_numpy(dtype=np.int64) / 10000.0, 2)
    df["total_qty"] = df["total_qty"].round(2)
    df = df[["l_partkey", "total_qty", "revenue", "num_lines", "p_name", "p_brand", "p_retailprice"]]
    return pa.Table.from_pandas(df, preserve_index=False)


def region_revenue_rollup(sf_dir: str) -> pa.Table:
    """J3/J4: orders rolled up to region.  customer is FACT-scale at 100×,
    so it is never broadcast: orders pre-aggregate per custkey (the
    combiner — one row per customer leaves the shuffle), ``Dataset.join``
    attaches c_nationkey, and only the genuinely tiny nation→region name
    map (25 rows) broadcasts.  Money flows as exact int64 cents."""
    orders = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "cents": _cents(t.column("o_totalprice")),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    per_cust = _hash_agg(
        orders,
        ["o_custkey"],
        {"n_orders": ("cents", "size"), "cents": ("cents", "sum")},
        _join_partitions(sf_dir, "orders"),
    )
    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    joined = per_cust.join(
        cust,
        join_type="inner",
        num_partitions=_join_partitions(sf_dir, "orders", "customer"),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    nation = _small(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    region = _small(sf_dir, "region", ["r_regionkey", "r_name"])
    r_name = dict(
        zip(region.column("r_regionkey").to_pylist(), region.column("r_name").to_pylist())
    )
    n2rname_ref = ray.put(
        {
            nk: r_name[rk]
            for nk, rk in zip(
                nation.column("n_nationkey").to_pylist(),
                nation.column("n_regionkey").to_pylist(),
            )
        }
    )

    class ToRegion:
        def __init__(self):
            self.map = ray.get(n2rname_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "r_name": df["c_nationkey"].map(self.map),
                    "n_orders": df["n_orders"],
                    "cents": df["cents"],
                }
            )

    agg = (
        joined.map_batches(
            ToRegion, batch_format="pandas", concurrency=autoscale_pool()
        )
        .groupby("r_name")
        .aggregate(
            Sum("n_orders", alias_name="orders_count"),
            Sum("cents", alias_name="cents"),
        )
    )
    df = agg.to_pandas().sort_values("r_name").reset_index(drop=True)
    df["orders_count"] = df["orders_count"].astype(np.int64)
    df["total_revenue"] = _rha(df.pop("cents").to_numpy(dtype=np.int64) / 100.0, 2)
    return pa.Table.from_pandas(df, preserve_index=False)


def category_share(sf_dir: str) -> pa.Table:
    """A6/J4: revenue share-of-total per brand — global total computed once
    and applied to the (tiny) grouped result (`SUM(COUNT(*)) OVER ()`
    share idiom, docs/TECHNICAL_GUIDE.md:393).

    part is 1/5th of lineitem's key space in TPC-H — at 100× a
    part→brand dict is multi-GB per worker, so nothing is broadcast:
    lineitem pre-aggregates per l_partkey (the combiner — one row per
    part leaves the shuffle), ``Dataset.join`` attaches p_brand, and the
    per-brand rollup is a second tiny groupby (the same rework
    ``region_revenue_rollup`` got in round 2)."""
    li = _t(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])

    def to_units(t: pa.Table) -> pa.Table:
        # 1e-4-dollar integer units: order-independent Sum (see _cents)
        cents = _cents(t.column("l_extendedprice"))
        disc_h = pc.cast(
            pc.round(pc.multiply(t.column("l_discount"), pa.scalar(100.0))),
            pa.int64(),
        )
        return pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "rev_u": pc.multiply(
                    cents, pc.subtract(pa.scalar(100, pa.int64()), disc_h)
                ),
            }
        )

    per_part = _hash_agg(
        li.map_batches(to_units, batch_format="pyarrow", zero_copy_batch=True),
        ["l_partkey"],
        {"rev_u": ("rev_u", "sum")},
        _join_partitions(sf_dir, "lineitem"),
    )
    part = _t(sf_dir, "part", ["p_partkey", "p_brand"])
    per_brand = (
        per_part.join(
            part,
            join_type="inner",
            num_partitions=_join_partitions(sf_dir, "lineitem", "part"),
            on=("l_partkey",),
            right_on=("p_partkey",),
        )
        .groupby("p_brand")
        .aggregate(Sum("rev_u", alias_name="rev_u"))
        .to_pandas()
    )
    u = per_brand.pop("rev_u").to_numpy(dtype=np.int64)
    total = float(u.sum())  # exact int64 total, one conversion
    per_brand["revenue"] = _rha(u / 10000.0, 2)
    per_brand["revenue_share_pct"] = _rha(u.astype(np.float64) / total * 100.0, 4)
    per_brand = per_brand.sort_values("p_brand").reset_index(drop=True)
    per_brand = per_brand[["p_brand", "revenue", "revenue_share_pct"]]
    return pa.Table.from_pandas(per_brand, preserve_index=False)


def top3_parts_per_brand(sf_dir: str) -> ray.data.Dataset:
    """J9 (lateral top-N per group): top-3 parts by retail price per brand
    via groupby.map_groups — within-group sort+head, never a global sort."""
    part = _t(sf_dir, "part", ["p_partkey", "p_name", "p_brand", "p_retailprice"])

    def top3(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(
            ["p_retailprice", "p_partkey"], ascending=[False, True]
        ).head(3)

    return part.groupby("p_brand").map_groups(top3, batch_format="pandas")


def orders_filter_window(sf_dir: str) -> pa.Table:
    """M8-M10: status + time-window filters pushed INTO the Parquet scan —
    row groups outside the window never decode (prune at the read), then a
    grouped count/sum."""
    import pyarrow.dataset as pads

    d = pads.field("o_orderdate")
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderdate", "o_totalprice", "o_orderpriority"],
        filter=(pads.field("o_orderstatus") != "F")
        & (d >= pa.scalar(pd.Timestamp("1997-01-01")))
        & (d < pa.scalar(pd.Timestamp("1998-01-01"))),
    )

    def keep_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": t.column("o_orderpriority"),
                "cents": _cents(t.column("o_totalprice")),
            }
        )

    filtered = orders.map_batches(keep_cents, batch_format="pyarrow", zero_copy_batch=True)
    agg = filtered.groupby("o_orderpriority").aggregate(
        Count(alias_name="orders_count"), Sum("cents", alias_name="cents")
    )
    df = agg.to_pandas().sort_values("o_orderpriority").reset_index(drop=True)
    df["total_value"] = _rha(df.pop("cents").to_numpy(dtype=np.int64) / 100.0, 2)
    return pa.Table.from_pandas(df, preserve_index=False)


def string_normalize_customers(sf_dir: str) -> ray.data.Dataset:
    """M1/M6/M7 scalar-string parity: lower, concat, regex strip-to-digits,
    abs — all pyarrow.compute kernels inside one map_batches (the
    reference's customers transform, src/etl_pipeline.py:247-263 /
    CONCAT-LOWER-REGEXP_REPLACE twin in sql/etl_transformations.sql:13-25)."""
    cust = _t(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment", "c_acctbal"])

    def norm(t: pa.Table) -> pa.Table:
        name = t.column("c_name")
        out = pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "name_lower": pc.utf8_lower(name),
                "cust_digits": pc.replace_substring_regex(name, r"[^0-9]", ""),
                "display_name": pc.binary_join_element_wise(
                    name,
                    pc.utf8_lower(t.column("c_mktsegment")),
                    " / ",
                ),
                "acctbal_abs": pc.abs(t.column("c_acctbal")),
            }
        )
        return out

    return cust.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)


def per_order_allocation(sf_dir: str) -> ray.data.Dataset:
    """W8 (the reference's one window-over-raw-rows:
    ``tax * line/SUM(line) OVER (PARTITION BY order)``,
    sql/etl_transformations.sql:117-127): per-line share of order total and
    equal split, via grouped totals hash-joined back to the lines.  Line
    prices become exact int64 cents first (``_cents``), so the per-order
    totals — and therefore both rounded ratios — are independent of Ray's
    aggregation order and bit-identical to the oracle's."""
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_extendedprice"]).map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_linenumber": t.column("l_linenumber"),
                "cents": _cents(t.column("l_extendedprice")),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # Group-count is huge (one per order), so per-group Python calls would
    # dominate.  ONE shuffle total: hash-partition lines by order key
    # (``_by_key_partitions``), then per PARTITION a vectorized pandas
    # transform computes each order's total/count and the shares in C —
    # the previous groupby-aggregate + hash-join-back design moved
    # lineitem through TWO all-to-alls for the same result.  Float ops
    # keep the exact sequence of the old arrow kernel ((cents/total)*100,
    # total/(n*100.0), arrow round-half-away) so the oracle hash is
    # unchanged.
    def part_alloc(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby("l_orderkey", sort=False)["cents"]
        tot = grp.transform("sum").to_numpy(np.float64)
        n = grp.transform("size").to_numpy(np.float64)
        cents = g["cents"].to_numpy(np.float64)
        share = pc.round(pa.array(cents / tot * 100.0), 4, **_ROUND)
        split = pc.round(pa.array(tot / (n * 100.0)), 4, **_ROUND)
        return pd.DataFrame(
            {
                "l_orderkey": g["l_orderkey"].to_numpy(),
                "l_linenumber": g["l_linenumber"].to_numpy(),
                "line_share_pct": share.to_numpy(),
                "equal_split": split.to_numpy(),
            }
        )

    return _by_key_partitions(
        li, "l_orderkey", part_alloc, _join_partitions(sf_dir, "lineitem")
    )


def union_quality_report(sf_dir: str) -> pa.Table:
    """U1/A7/J6: UNION ALL of data-quality checks
    (sql/etl_transformations.sql:200-228), incl. an ANTI-JOIN orphan check
    via a broadcast key set (at scale: a Bloom filter of o_orderkey).

    ONE pass over lineitem computes all three lineitem checks: the neg-qty
    and orphan counters ride the duplicate-PK shuffle as extra (kind, key)
    rows, so the table is scanned once and there is a single groupby
    instead of three sequential pipelines; the final counts stream out as
    per-batch partial sums (nothing group-sized reaches the driver)."""
    li = _t(
        sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"]
    )
    orders = _t(sf_dir, "orders", ["o_orderdate"])

    null_dates = orders.map_batches(
        lambda t: t.filter(pc.is_null(t.column("o_orderdate"))),
        batch_format="pyarrow",
    ).count()

    # Orphan check: broadcast ONE sorted int64 key array (8 bytes/order —
    # plasma-shared, zero-copy numpy view per actor), vectorized
    # searchsorted membership per batch.  At 100× the orders key column
    # outgrows a broadcast → switch to Dataset.join(left_outer) + null
    # filter (or a Bloom filter) — same check, shuffle-based existence.
    order_keys = np.sort(
        _small(sf_dir, "orders", ["o_orderkey"]).column("o_orderkey").to_numpy()
    )
    keys_ref = ray.put(order_keys)

    class LineitemChecks:
        """kind 0 rows: (composite PK, within-batch count) partials for the
        duplicate check; kind 1/2 rows: per-batch neg-qty / orphan counts."""

        def __init__(self):
            self.keys = ray.get(keys_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
            ln = t.column("l_linenumber").to_numpy(zero_copy_only=False)
            if len(ln) and ln.max() >= 256:
                # the ok*256+ln composite bijection assumes linenumber < 256
                # (TPC-H: 1..7); widen the multiplier if a source breaks it
                raise ValueError("l_linenumber >= 256 breaks PK packing")
            pk, counts = np.unique(
                ok.astype(np.int64) * 256 + ln.astype(np.int64),
                return_counts=True,
            )
            qty = t.column("l_quantity").to_numpy(zero_copy_only=False)
            neg = int((qty <= 0.0).sum())
            if len(self.keys):
                idx = np.minimum(np.searchsorted(self.keys, ok), len(self.keys) - 1)
                orphan = int((self.keys[idx] != ok).sum())
            else:
                orphan = len(ok)
            return pa.table(
                {
                    "kind": np.concatenate(
                        [np.zeros(len(pk), np.int8), np.array([1, 2], np.int8)]
                    ),
                    "key": np.concatenate([pk, np.zeros(2, np.int64)]),
                    "n": np.concatenate(
                        [counts.astype(np.int64), np.array([neg, orphan], np.int64)]
                    ),
                }
            )

    # The dup check needs a GLOBAL count per composite PK.  A
    # groupby(kind,key).aggregate over ~|lineitem| distinct keys is a
    # sort-based all-to-all; instead hash-partition the (kind,key,n)
    # partials by key (``_gp = key % P``) and let each partition finalize
    # vectorized (np.unique + add.at) — same single exchange of the same
    # partial rows, no global sort, P output rows.
    partials = li.map_batches(
        LineitemChecks, batch_format="pyarrow", concurrency=autoscale_pool()
    )
    num_gp = _join_partitions(sf_dir, "lineitem")

    def add_gp(t: pa.Table) -> pa.Table:
        k = t.column("key").to_numpy(zero_copy_only=False)
        return t.append_column("_gp", pa.array(k % num_gp))

    def finalize_part(g: pd.DataFrame) -> pd.DataFrame:
        kind = g["kind"].to_numpy()
        n = g["n"].to_numpy()
        k0 = kind == 0
        uniq, inv = np.unique(g["key"].to_numpy()[k0], return_inverse=True)
        tot = np.zeros(len(uniq), np.int64)
        np.add.at(tot, inv, n[k0])
        return pd.DataFrame(
            {
                "dup": [int((tot > 1).sum())],
                "neg": [int(n[kind == 1].sum())],
                "orph": [int(n[kind == 2].sum())],
            }
        )

    totals = (
        partials.map_batches(add_gp, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_gp")
        .map_groups(finalize_part, batch_format="pandas")
        .sum(["dup", "neg", "orph"])
    )
    dup_pk = int(totals["sum(dup)"])
    neg_qty = int(totals["sum(neg)"])
    orphans = int(totals["sum(orph)"])
    return pa.table(
        {
            "check_name": [
                "duplicate_lineitem_pk",
                "negative_or_zero_qty",
                "null_order_date",
                "orphan_lineitems",
            ],
            "issue_count": pa.array(
                [dup_pk, neg_qty, null_dates, orphans], pa.int64()
            ),
        }
    )


# ---------------------------------------------------------------------------
# window / join extensions (SURVEY.md §2.4 J7-J8, §2.5 A5, §2.6 W7, §2.10)
# ---------------------------------------------------------------------------


def string_agg_nations_per_region(sf_dir: str) -> pa.Table:
    """A5 (STRING_AGG): ordered, comma-joined nation names per region.

    Both sides are tiny dimensions → computed via broadcast driver-side
    Arrow join + per-group sorted join (the list-type intermediate idiom)."""
    nation = _small(sf_dir, "nation", ["n_name", "n_regionkey"]).to_pandas()
    region = _small(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    merged = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    agg = (
        merged.sort_values("n_name")
        .groupby("r_name", sort=True)["n_name"]
        .agg(lambda s: ",".join(s))
        .reset_index()
        .rename(columns={"n_name": "nations"})
    )
    return pa.Table.from_pandas(agg, preserve_index=False)


def first_last_order_value(sf_dir: str) -> ray.data.Dataset:
    """W7 (FIRST_VALUE/LAST_VALUE over the full frame): each customer's
    first and last order price by date (ties broken by orderkey).  One
    vectorized pass per key-hash PARTITION (sort + groupby first/last),
    not one Python call per customer — see ``_by_key_partitions``."""
    orders = _t(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice", "o_orderkey"])

    def fl(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort")
        agg = g.groupby("o_custkey", sort=True).agg(
            first_order_value=("o_totalprice", "first"),
            last_order_value=("o_totalprice", "last"),
            orders_count=("o_totalprice", "size"),
        )
        agg["orders_count"] = agg["orders_count"].astype(np.int64)
        return agg.reset_index()

    return _by_key_partitions(
        orders, "o_custkey", fl, _join_partitions(sf_dir, "orders")
    )


def consecutive_day_customers(sf_dir: str) -> pa.Table:
    """J7 (self-join shape): customers with orders on two consecutive
    days — sorted per-partition date-diff instead of an orders⋈orders
    self join (which would shuffle orders twice).  Vectorized per
    key-hash partition: dedupe (customer, day), sort, one shift/diff
    pass over the whole partition."""
    orders = _t(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def has_consecutive(g: pd.DataFrame) -> pd.DataFrame:
        d = (
            g.assign(day=g["o_orderdate"].dt.normalize())
            .drop_duplicates(["o_custkey", "day"])
            .sort_values(["o_custkey", "day"], kind="mergesort")
        )
        same = d["o_custkey"].eq(d["o_custkey"].shift())
        diff1 = d["day"].diff() == pd.Timedelta(days=1)
        hits = d.loc[same & diff1, "o_custkey"].unique()
        return pd.DataFrame({"o_custkey": np.sort(hits)})

    flags = _by_key_partitions(
        orders, "o_custkey", has_consecutive, _join_partitions(sf_dir, "orders")
    ).to_pandas()
    out = flags.sort_values("o_custkey").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def product_affinity_pairs(sf_dir: str) -> pa.Table:
    """J8 (within-order cross join): part pairs co-occurring in an order,
    top 20 by count — pair generation by vectorized self-merge inside
    order-hash PARTITIONS (never a global cross join, never one Python
    call per order), then a grouped sum over pair keys."""
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    num_partitions = _join_partitions(sf_dir, "lineitem")

    def add_gp(t: pa.Table) -> pa.Table:
        k = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("_gp", pa.array(k % num_partitions))

    def part_pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["l_orderkey", "l_partkey"]].drop_duplicates()
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        if not len(m):
            return pd.DataFrame(
                {
                    "p1": pd.Series(dtype=np.int64),
                    "p2": pd.Series(dtype=np.int64),
                    "n_part": pd.Series(dtype=np.int64),
                }
            )
        c = (
            m.groupby(["l_partkey_x", "l_partkey_y"], sort=False)
            .size()
            .reset_index(name="n_part")
        )
        return c.rename(columns={"l_partkey_x": "p1", "l_partkey_y": "p2"})

    # Pair-count merge + top-20: a (p1, p2) pair lives in exactly one
    # p1-hash partition after ``_hash_agg``, so a partition-local top-20
    # (same total order) followed by a driver top-20 over P × 20 winner
    # rows is exact — the sweep caught Ray's sort-aggregate stalling >120 s
    # on the ~1.2M distinct pair keys this produces at sf0.1.
    def topk_part(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["together", "p1", "p2"], ascending=[False, True, True]
        ).head(20)

    pair_counts = (
        _hash_agg(
            li.map_batches(add_gp, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("_gp")
            .map_groups(part_pairs, batch_format="pandas"),
            ["p1", "p2"],
            {"together": ("n_part", "sum")},
            num_partitions,
        )
        .map_batches(topk_part, batch_format="pandas")
        .to_pandas()
    )
    out = (
        pair_counts.sort_values(["together", "p1", "p2"], ascending=[False, True, True])
        .head(20)
        .reset_index(drop=True)
    )
    out["together"] = out["together"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def events_hourly_tumbling(sf_dir: str) -> pa.Table:
    """§2.10 streaming-shaped: tumbling 1-hour windows per event_type —
    derive the window key vectorized, then a grouped aggregate (the
    documented batch expression of an event-time window)."""
    ev = _t(sf_dir, "events", ["ts", "event_type", "value"])

    def add_window(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t.column("ts"), unit="hour")
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "window_start": hour,
                "cents": _cents(t.column("value")),
            }
        )

    agg = (
        ev.map_batches(add_window, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("cents", alias_name="cents"))
        .to_pandas()
        .sort_values(["event_type", "window_start"])
        .reset_index(drop=True)
    )
    agg["total_value"] = _rha(agg.pop("cents").to_numpy(dtype=np.int64) / 100.0, 2)
    return pa.Table.from_pandas(agg, preserve_index=False)


def events_sessionized(sf_dir: str) -> pa.Table:
    """§2.10 session windows: per-user sessions split on >30-minute gaps.

    One vectorized pass per key-hash partition: sort by (user, ts), a
    session starts where the user changes OR the gap exceeds 30 minutes
    (shift/diff/cumsum — no per-user Python); the oracle expresses the
    same with LAG + cumulative SUM."""
    ev = _t(sf_dir, "events", ["user_id", "ts", "event_id"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        new_user = g["user_id"].ne(g["user_id"].shift())
        gap = g["ts"].diff() > pd.Timedelta(minutes=30)
        sid = (new_user | gap).cumsum()
        agg = g.groupby(sid).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("event_id", "count"),
        )
        agg["n_events"] = agg["n_events"].astype(np.int64)
        return agg.reset_index(drop=True)

    out = (
        _by_key_partitions(ev, "user_id", sessions, _join_partitions(sf_dir, "events"))
        .to_pandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(
        out[["user_id", "session_start", "session_end", "n_events"]],
        preserve_index=False,
    )


def part_size_tiers(sf_dir: str) -> pa.Table:
    """M5 (the reference's 3-way CASE stock-status ladder,
    src/etl_pipeline.py:309-329): nested ``pc.if_else`` — NOT the
    reference's row-wise ``df.apply`` — tiering parts by size, then a
    grouped count/avg per tier."""
    part = _t(sf_dir, "part", ["p_size", "p_retailprice"])

    def tier(t: pa.Table) -> pa.Table:
        size = t.column("p_size")
        label = pc.if_else(
            pc.less_equal(size, pa.scalar(10)),
            pa.scalar("small"),
            pc.if_else(
                pc.less_equal(size, pa.scalar(30)), pa.scalar("medium"), pa.scalar("large")
            ),
        )
        return t.append_column("size_tier", label)

    agg = (
        part.map_batches(tier, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("size_tier")
        .aggregate(
            Count(alias_name="parts_count"),
            Mean("p_retailprice", alias_name="avg_price"),
        )
        .to_pandas()
        .sort_values("size_tier")
        .reset_index(drop=True)
    )
    agg["avg_price"] = agg["avg_price"].round(2)
    return pa.Table.from_pandas(agg, preserve_index=False)


def cohort_retention(sf_dir: str) -> pa.Table:
    """J5/A4 (the reference's cohort analysis, sql/complex_queries.sql:
    227-273): customers grouped by first-order month, counted per months-
    since-cohort.  Cohort assignment happens INSIDE the per-customer group
    (min month of the group) — the aggregate-to-aggregate join the
    reference does with a CTE join happens here as a single customer-keyed
    fold, so nothing is broadcast and the shuffles stay key-proportional."""
    orders = _t(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def add_month(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate")
        m = pc.add(
            pc.multiply(pc.cast(pc.year(d), pa.int64()), pa.scalar(12, pa.int64())),
            pc.cast(pc.month(d), pa.int64()),
        )
        return t.append_column("order_month", m)

    with_month = orders.map_batches(add_month, batch_format="pyarrow", zero_copy_batch=True)

    # ONE exchange on the customer key does everything: a customer's rows
    # are partition-local, so the (customer, month) DISTINCT, the
    # cohort=min(month) fold and the (cohort, months_since) counting all
    # run vectorized inside the partition — no separate sort-aggregate
    # for the distinct, no per-customer broadcast dict.  Each partition
    # emits ≤ |months|² partial-count rows; the cross-partition fold is a
    # tiny P × |cells| driver sum (exact ints), like monthly_sales_trends.
    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["o_custkey", "order_month"]].drop_duplicates()
        cohort = g.groupby("o_custkey")["order_month"].transform("min").to_numpy(
            np.int64
        )
        months = g["order_month"].to_numpy(np.int64)
        cells = (
            pd.DataFrame(
                {"cohort_month": cohort, "months_since": months - cohort}
            )
            .value_counts()
            .rename("active_customers")
        )
        return cells.reset_index()

    pairs = _by_key_partitions(
        with_month, "o_custkey", per_partition, _join_partitions(sf_dir, "orders")
    )
    out = (
        pairs.to_pandas()
        .groupby(["cohort_month", "months_since"], as_index=False)[
            "active_customers"
        ]
        .sum()
        .sort_values(["cohort_month", "months_since"])
        .reset_index(drop=True)
    )
    out["active_customers"] = out["active_customers"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


# ---------------------------------------------------------------------------
# The reference's remaining two flagship analytics queries (of five):
# RFM customer segmentation (src/sql_query_executor.py:417-510) and
# inventory optimization (src/sql_query_executor.py:321-415), re-mapped onto
# the TPC-H-ish tables.  Thresholds are adapted to this data's magnitudes;
# the CASE-ladder structure, LEFT-JOIN-with-status-filter semantics, COALESCE
# defaults (999-day recency, zero monetary) and two-CTE join shape are the
# reference's.
# ---------------------------------------------------------------------------


def _rha(x: np.ndarray, nd: int) -> np.ndarray:
    """Round half AWAY from zero (DuckDB/PostgreSQL ROUND), not numpy's
    banker's rounding — keeps pandas-path outputs hash-identical to SQL."""
    p = 10.0 ** nd
    ax = np.floor(np.abs(np.asarray(x, dtype=np.float64)) * p + 0.5) / p
    return np.sign(x) * ax


def _orders_anchor(sf_dir: str) -> pd.Timestamp:
    """Deterministic 'CURRENT_DATE' stand-in: global MAX(o_orderdate).

    One column-pruned scan + tree-reduce max; the reference uses wall-clock
    CURRENT_DATE (src/sql_query_executor.py:426,335) which is
    non-deterministic, so both our Ray side and the DuckDB oracle anchor on
    the data instead."""
    return pd.Timestamp(_t(sf_dir, "orders", ["o_orderdate"]).max("o_orderdate"))


def rfm_segmentation(sf_dir: str) -> ray.data.Dataset:
    """RFM segmentation (reference flagship query 5,
    src/sql_query_executor.py:417-510): recency/frequency/monetary scoring
    with 1-5 CASE ladders, rfm_string concat, and the nine-segment ladder
    (Champions .. Lost Customers).

    Shuffle plan: ONE groupby over orders.  The reference's
    LEFT JOIN + WHERE (status NOT IN ('Cancelled') OR status IS NULL) is
    replicated without a second pass by masking cancelled ('F') rows to null
    inside map_batches *before* the groupby, so one aggregation yields both
    "any orders?" (Count) and the filtered R/F/M stats; customers whose
    orders are ALL cancelled then drop out exactly as the reference's WHERE
    makes them vanish, while order-less customers survive the left join with
    COALESCE'd zeros."""
    anchor = _orders_anchor(sf_dir)
    orders = _t(
        sf_dir,
        "orders",
        ["o_custkey", "o_totalprice", "o_orderdate", "o_orderstatus"],
    )

    def mask(t: pa.Table) -> pa.Table:
        ok = pc.not_equal(t.column("o_orderstatus"), pa.scalar("F"))
        # dates as epoch-µs int64: Ray's hash aggregation mangles NULL-laden
        # timestamp columns into object blocks (worker crash downstream);
        # integers with nulls aggregate cleanly and convert back in finish.
        # Money as exact int64 cents (``_cents``) — order-independent sums.
        od_us = pc.cast(t.column("o_orderdate"), pa.int64())
        return pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "valid": pc.cast(ok, pa.int64()),
                "tp_cents": pc.if_else(
                    ok, _cents(t.column("o_totalprice")), pa.scalar(None, pa.int64())
                ),
                "od": pc.if_else(ok, od_us, pa.scalar(None, pa.int64())),
            }
        )

    # pandas null conventions downstream: all-null cents sums to 0 (Ray:
    # null) and all-null od maxes to NaN — finish() coalesces both the
    # same way, and money stays exact (int cents < 2^53 in float64).
    agg = _hash_agg(
        orders.map_batches(mask, batch_format="pyarrow", zero_copy_batch=True),
        ["o_custkey"],
        {
            "frequency": ("valid", "sum"),
            "monetary_cents": ("tp_cents", "sum"),
            "last_order_date": ("od", "max"),
            "first_order_date": ("od", "min"),
        },
        _join_partitions(sf_dir, "orders"),
    )
    cust = _t(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])
    joined = cust.join(
        agg,
        join_type="left_outer",
        num_partitions=_join_partitions(sf_dir, "customer", "orders"),
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[c for c in ("o_custkey",) if c in df.columns])
        had_orders = df["frequency"].notna()
        # all-cancelled customers vanish (reference WHERE semantics)
        df = df[~(had_orders & (df["frequency"] == 0))].copy()
        freq = df["frequency"].fillna(0).astype(np.int64)
        cents = df["monetary_cents"].fillna(0).to_numpy(dtype=np.float64)
        monetary = cents / 100.0  # exact mirror of the oracle's cents/100.0
        freq_np = freq.to_numpy()
        avg_val = np.where(
            freq_np > 0, cents / (np.maximum(freq_np, 1) * 100.0), 0.0
        )
        last = pd.to_datetime(df["last_order_date"], unit="us")
        recency = (anchor - last).dt.days.fillna(999).astype(np.int64)
        r = np.select(
            [recency <= 30, recency <= 120, recency <= 240, recency <= 400],
            [5, 4, 3, 2], 1,
        )
        f = np.select([freq >= 13, freq >= 11, freq >= 9, freq >= 7], [5, 4, 3, 2], 1)
        m = np.select(
            [monetary >= 3_300_000, monetary >= 2_700_000,
             monetary >= 2_300_000, monetary >= 1_600_000],
            [5, 4, 3, 2], 1,
        )
        seg = np.select(
            [
                (r >= 4) & (f >= 4) & (m >= 4),
                (r >= 3) & (f >= 3) & (m >= 3),
                (r >= 4) & (f <= 2),
                (r >= 3) & (f >= 3) & (m <= 2),
                (r >= 3) & (f <= 2) & (m >= 3),
                (r <= 2) & (f >= 3) & (m >= 3),
                (r <= 2) & (f >= 2) & (m <= 2),
                (r <= 2) & (f <= 2),
            ],
            [
                "Champions", "Loyal Customers", "New Customers",
                "Potential Loyalists", "Big Spenders", "At Risk",
                "Cannot Lose Them", "Lost Customers",
            ],
            "Others",
        )
        return pd.DataFrame(
            {
                "c_custkey": df["c_custkey"].to_numpy(),
                "c_name": df["c_name"].to_numpy(),
                "original_segment": df["c_mktsegment"].to_numpy(),
                "recency_days": recency.to_numpy(),
                "frequency": freq.to_numpy(),
                "monetary_value": _rha(monetary, 2),
                "avg_order_value": _rha(avg_val, 2),
                "recency_score": r.astype(np.int64),
                "frequency_score": f.astype(np.int64),
                "monetary_score": m.astype(np.int64),
                "rfm_total": (r + f + m).astype(np.int64),
                "rfm_string": np.char.add(
                    np.char.add(r.astype(str), f.astype(str)), m.astype(str)
                ),
                "customer_segment_rfm": seg,
                # via to_datetime: the join can hand these over as OBJECT
                # columns (python datetimes + None), which Arrow rejects
                "last_order_date": last.to_numpy(),
                "first_order_date": pd.to_datetime(
                    df["first_order_date"], unit="us"
                ).to_numpy(),
            }
        )

    return joined.map_batches(finish, batch_format="pandas")


def inventory_optimization(sf_dir: str) -> ray.data.Dataset:
    """Inventory optimization (reference flagship query 4,
    src/sql_query_executor.py:321-415): 90-day sales-velocity CTE joined to
    an inventory-summary CTE, stock-status + recommendation CASE ladders.

    The TPC-H-ish testdata has no inventory table, so the inventory side is
    a DETERMINISTIC synthetic stand-in derived from p_partkey (identical
    closed-form in the DuckDB oracle) — the query shape (two aggregate CTEs,
    LEFT JOIN, ladders, COALESCE 999) is what's under test.

    Shuffle plan: the 90-day window is a small, TIME-BOUNDED slice of
    orders, so the predicate pushes into the orders read (row groups
    outside the window skip via stats) and the surviving (orderkey,
    orderdate) pairs broadcast as two sorted arrays — lineitem attaches the
    date with one vectorized searchsorted per batch, so the big side never
    enters a join shuffle (interleaved A/B at sf0.1: see BASELINE.md).
    Guard: a window above ~32M rows (~0.5 GB of key+date per worker)
    outgrows the broadcast and falls back to the hash join — same result,
    shuffle-based.  Then one hash agg on l_partkey and a part-sized LEFT
    JOIN."""
    import pyarrow.dataset as pads

    anchor = _orders_anchor(sf_dir)
    start = anchor - pd.Timedelta(days=90)
    items = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_quantity"])
    win_filter = (pads.field("o_orderdate") >= pa.scalar(start)) & (
        pads.field("o_orderstatus") != "F"
    )
    win = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate"],
        filter=win_filter,
    )
    agg_spec = {
        # l_quantity is integer-valued → float sums exact in any order
        "order_frequency": ("l_quantity", "size"),
        "total_sold_90days": ("l_quantity", "sum"),
        "last_sale_date": ("o_orderdate", "max"),
    }
    if win.count() <= 32_000_000:
        wtbl = win.to_pandas()
        order = np.argsort(wtbl["o_orderkey"].to_numpy())
        win_ref = ray.put(
            (
                wtbl["o_orderkey"].to_numpy()[order],
                wtbl["o_orderdate"].to_numpy()[order],
            )
        )

        class AttachWindowDate:
            """Map-side window join: sorted-key searchsorted + date gather."""

            def __init__(self):
                self.keys, self.dates = ray.get(win_ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
                if len(self.keys):
                    idx = np.minimum(
                        np.searchsorted(self.keys, ok), len(self.keys) - 1
                    )
                    hit = self.keys[idx] == ok
                else:
                    hit = np.zeros(len(ok), dtype=bool)
                sub = t.filter(pa.array(hit))
                dates = (
                    self.dates[idx[hit]]
                    if len(self.keys)
                    else self.dates[:0]
                )
                return pa.table(
                    {
                        "l_partkey": sub.column("l_partkey"),
                        "l_quantity": sub.column("l_quantity"),
                        "o_orderdate": pa.array(dates),
                    }
                )

        joined_items = items.map_batches(
            AttachWindowDate,
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=autoscale_pool(),
        )
        vel = _hash_agg(
            joined_items, ["l_partkey"], agg_spec,
            _join_partitions(sf_dir, "lineitem"),
        )
    else:  # window outgrew the broadcast — shuffle-based join, same result
        vel = _hash_agg(
            items.join(
                win,
                join_type="inner",
                num_partitions=_join_partitions(sf_dir, "lineitem", "orders"),
                on=("l_orderkey",),
                right_on=("o_orderkey",),
            ),
            ["l_partkey"],
            agg_spec,
            _join_partitions(sf_dir, "lineitem", "orders"),
        )
    parts = _t(sf_dir, "part", ["p_partkey", "p_name", "p_brand", "p_retailprice"])
    joined = parts.join(
        vel,
        join_type="left_outer",
        num_partitions=_join_partitions(sf_dir, "part"),
        on=("p_partkey",),
        right_on=("l_partkey",),
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        pk = df["p_partkey"].to_numpy()
        total_stock = (pk * 37) % 500
        available = total_stock - (pk * 11) % 100
        reorder = (pk * 13) % 120
        sold = df["total_sold_90days"].fillna(0).to_numpy()
        freq = df["order_frequency"].fillna(0).astype(np.int64)
        last = pd.to_datetime(df["last_sale_date"])
        dsls = (anchor - last).dt.days.fillna(999).astype(np.int64).to_numpy()
        velocity = np.where(sold > 0, _rha(sold / 90.0, 2), 0.0)
        doi = np.where(
            (sold > 0) & (available > 0),
            _rha(available / np.where(sold > 0, sold / 90.0, 1.0), 1),
            np.nan,
        )
        status = np.select(
            [
                available <= 0,
                available <= reorder,
                dsls > 90,
                (available > sold * 2) & (sold > 0),
            ],
            ["Out of Stock", "Low Stock", "Slow Moving", "Overstock"],
            "Normal",
        )
        rec = np.select(
            [
                (available <= 0) & (sold > 0),
                (available <= reorder) & (sold > 0),
                (available > sold * 2) & (sold > 0),
                dsls > 90,
            ],
            [
                "URGENT: Restock immediately", "Reorder soon",
                "Reduce inventory", "Review product performance",
            ],
            "Monitor regularly",
        )
        return pd.DataFrame(
            {
                "product_id": pk,
                "product_name": df["p_name"].to_numpy(),
                "category": df["p_brand"].to_numpy(),
                "price": _rha(df["p_retailprice"].to_numpy(), 2),
                "order_frequency": freq.to_numpy(),
                "total_sold_90days": sold,
                "daily_sales_velocity": velocity,
                "total_stock": total_stock,
                "available_stock": available,
                "days_of_inventory": doi,
                "avg_reorder_level": reorder,
                "warehouse_count": 1 + pk % 3,
                "days_since_last_sale": dsls,
                "stock_status": status,
                "recommendation": rec,
            }
        )

    return joined.map_batches(finish, batch_format="pandas")


def dim_date_seed(sf_dir: str) -> ray.data.Dataset:
    """Date-dimension seeding (sql/etl_transformations.sql:93-97
    generate_series 2020-2030; trimmed to 2020-2021 here): the §2.9
    EXTRACT/TO_CHAR scalar surface — date_key YYYYMMDD, year/quarter/month/
    week/doy/isodow/is_weekend — computed distributed from ray.data.range."""
    start = pd.Timestamp("2020-01-01")
    n_days = (pd.Timestamp("2021-12-31") - start).days + 1

    def make(df: pd.DataFrame) -> pd.DataFrame:
        d = start + pd.to_timedelta(df["id"].to_numpy(), unit="D")
        iso = d.isocalendar()
        return pd.DataFrame(
            {
                "date_key": d.strftime("%Y%m%d").astype(np.int64),
                "full_date": d,
                "year": d.year.astype(np.int64),
                "quarter": d.quarter.astype(np.int64),
                "month": d.month.astype(np.int64),
                "week_of_year": iso.week.astype(np.int64),
                "day_of_year": d.dayofyear.astype(np.int64),
                "day_of_week": iso.day.astype(np.int64),
                "is_weekend": iso.day >= 6,
            }
        )

    return ray.data.range(n_days, override_num_blocks=4).map_batches(
        make, batch_format="pandas"
    )


def events_sliding_window(sf_dir: str) -> pa.Table:
    """§2.10 hopping (sliding) windows: 1-hour windows hopping every 30
    minutes — each event lands in exactly two windows.  Expressed as a
    vectorized explode (append the batch twice with the two window starts)
    before one grouped aggregate; no per-row loop, shuffle volume = 2× the
    pruned (ts, value) projection, never the full event row."""
    ev = _t(sf_dir, "events", ["ts", "value"])

    def explode(t: pa.Table) -> pa.Table:
        half = pc.floor_temporal(t.column("ts"), multiple=30, unit="minute")
        prev = pc.subtract(half, pa.scalar(pd.Timedelta(minutes=30)))
        v = _cents(t.column("value"))  # int64 cents: order-independent Sum
        return pa.table(
            {
                "window_start": pa.chunked_array(
                    prev.chunks + half.chunks
                    if isinstance(half, pa.ChunkedArray)
                    else [prev, half]
                ),
                "cents": pa.chunked_array(
                    v.chunks + v.chunks if isinstance(v, pa.ChunkedArray) else [v, v]
                ),
            }
        )

    agg = (
        ev.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("window_start")
        .aggregate(Count(alias_name="events_count"), Sum("cents", alias_name="cents"))
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    agg["value_sum"] = _rha(agg.pop("cents").to_numpy(dtype=np.int64) / 100.0, 2)
    return pa.Table.from_pandas(agg, preserve_index=False)


def region_nation_rollup(sf_dir: str) -> pa.Table:
    """Multi-level rollup (GROUP BY ROLLUP(region, nation)): nation detail
    + per-region subtotal + grand total in one result.  Computed as ONE
    fine-grained distributed groupby; the coarser levels re-aggregate the
    (tiny, one row per nation) result driver-side — re-aggregation of a
    partial aggregate, never a second scan."""
    nat = _small(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    reg = _small(sf_dir, "region", ["r_regionkey", "r_name"])
    cust = _t(sf_dir, "customer", ["c_nationkey", "c_acctbal"]).map_batches(
        lambda t: pa.table(
            {
                "c_nationkey": t.column("c_nationkey"),
                "cents": _cents(t.column("c_acctbal")),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    fine = (
        cust.groupby("c_nationkey")
        .aggregate(Count(alias_name="customers"), Sum("cents", alias_name="acctbal_sum"))
        .to_pandas()
    )
    n2r = dict(zip(nat.column("n_nationkey").to_pylist(), nat.column("n_regionkey").to_pylist()))
    n2name = dict(zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist()))
    r2name = dict(zip(reg.column("r_regionkey").to_pylist(), reg.column("r_name").to_pylist()))
    fine["r_name"] = fine["c_nationkey"].map(n2r).map(r2name)
    fine["n_name"] = fine["c_nationkey"].map(n2name)
    detail = fine[["r_name", "n_name", "customers", "acctbal_sum"]]
    sub = (
        detail.groupby("r_name", as_index=False)[["customers", "acctbal_sum"]]
        .sum()
        .assign(n_name=None)
    )
    total = pd.DataFrame(
        {
            "r_name": [None],
            "n_name": [None],
            "customers": [detail["customers"].sum()],
            "acctbal_sum": [detail["acctbal_sum"].sum()],
        }
    )
    out = pd.concat([detail, sub, total], ignore_index=True)[
        ["r_name", "n_name", "customers", "acctbal_sum"]
    ]
    out["customers"] = out["customers"].astype(np.int64)
    # re-aggregated int64 cents are exact at every rollup level
    out["acctbal_sum"] = _rha(out["acctbal_sum"].to_numpy(dtype=np.int64) / 100.0, 2)
    return pa.Table.from_pandas(out, preserve_index=False)


def orders_priority_pivot(sf_dir: str) -> pa.Table:
    """Pivot / conditional aggregation: orders count per year × priority as
    one row per year with one column per priority bucket — the
    SUM(CASE WHEN ...) idiom vectorized as Arrow masks inside one
    map_batches + a single grouped aggregate."""
    orders = _t(sf_dir, "orders", ["o_orderdate", "o_orderpriority"])
    buckets = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    names = ["urgent", "high", "medium", "not_specified", "low"]

    def widen(t: pa.Table) -> pa.Table:
        cols = {"year": pc.cast(pc.year(t.column("o_orderdate")), pa.int64())}
        pr = t.column("o_orderpriority")
        for b, nm in zip(buckets, names):
            cols[nm] = pc.cast(pc.equal(pr, pa.scalar(b)), pa.int64())
        return pa.table(cols)

    agg = (
        orders.map_batches(widen, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("year")
        .aggregate(*[Sum(nm, alias_name=nm) for nm in names])
        .to_pandas()
        .sort_values("year")
        .reset_index(drop=True)
    )
    for nm in names:
        agg[nm] = agg[nm].astype(np.int64)
    return pa.Table.from_pandas(agg, preserve_index=False)


def customers_without_orders(sf_dir: str) -> ray.data.Dataset:
    """J6 anti-join, explicit: lapsed customers — no order since 2000-01-01
    (the reference's orphan-check idiom, sql/etl_transformations.sql:
    200-210, LEFT JOIN ... IS NULL, crossed with its recency filter).

    Plan: filter orders to the window FIRST, ONE distributed distinct over
    the surviving keys (a groupby that collapses to ≤|customers| rows),
    broadcast the sorted key array once via ``ray.put``, then a vectorized
    not-in filter over customers — no big-big shuffle join for an
    existence check."""
    import pyarrow.dataset as pads

    # window predicate pushed into the scan: row groups wholly before the
    # cutoff never decode
    recent = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey"],
        filter=pads.field("o_orderdate") >= pa.scalar(pd.Timestamp("2000-01-01")),
    )
    keys = (
        recent.groupby("o_custkey")
        .aggregate(Count(alias_name="_n"))
        .to_pandas()["o_custkey"]
        .to_numpy()
    )
    keys_ref = ray.put(np.sort(keys))

    def keep(t: pa.Table) -> pa.Table:
        k = ray.get(keys_ref)
        ck = t.column("c_custkey").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(k, ck)
        idx_c = np.minimum(idx, len(k) - 1) if len(k) else idx
        has = (k[idx_c] == ck) if len(k) else np.zeros(len(ck), bool)
        return t.filter(pa.array(~has))

    cust = _t(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment", "c_acctbal"])
    return cust.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def products_profit_margin(sf_dir: str) -> ray.data.Dataset:
    """M2 (the reference's products transform, src/etl_pipeline.py:265-277 /
    sql/etl_transformations.sql:45-58): INITCAP'd product name plus a
    div-zero-guarded profit margin.

    The testdata has no cost column, so cost is a DETERMINISTIC synthetic
    in cents derived from p_partkey (same closed form in the oracle) —
    the transform under test is the INITCAP (``pc.utf8_title``, vectorized,
    NOT the reference's row-wise .title() apply) and the guarded ratio.
    All money flows as exact int64 cents (see ``_cents``)."""
    part = _t(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"])

    def transform(t: pa.Table) -> pa.Table:
        pk = t.column("p_partkey").to_numpy(zero_copy_only=False)
        price_c = _cents(t.column("p_retailprice")).to_numpy(zero_copy_only=False)
        cost_c = (pk * 37) % 9000 + 500
        price_f = price_c.astype(np.float64)
        cost_f = cost_c.astype(np.float64)
        margin = np.where(
            price_c > 0,
            _rha((price_f - cost_f) / np.maximum(price_f, 1.0) * 100, 2),
            0.0,
        )
        return pa.table(
            {
                "p_partkey": t.column("p_partkey"),
                "product_name_title": pc.utf8_title(t.column("p_name")),
                "price": _rha(price_f / 100.0, 2),
                "cost": _rha(cost_f / 100.0, 2),
                "profit_margin_pct": margin,
            }
        )

    return part.map_batches(transform, batch_format="pyarrow", zero_copy_batch=True)


def docs_cleanse(sf_dir: str) -> ray.data.Dataset:
    """M7 cleanse MUTATIONS (the reference's clean_dataframe,
    src/data_validator.py:329-392): trim, ``'' → NULL``, lowercase
    normalization, digits-only extraction — the reference applies these to
    emails/phones; here the same kernels run over the documents table.
    Uses the reusable ``empty_strings_to_null`` cleanse stage."""
    from ..stages.normalize import empty_strings_to_null

    docs = _t(sf_dir, "documents", ["doc_id", "text", "lang", "source"])

    def cleanse(t: pa.Table) -> pa.Table:
        t = empty_strings_to_null(t, ["text", "lang"])
        src = t.column("source")
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "text_clean": t.column("text"),
                "lang_clean": pc.utf8_lower(t.column("lang")),
                "source_norm": pc.utf8_lower(pc.utf8_trim_whitespace(src)),
                "source_digits": pc.replace_substring_regex(src, r"[^0-9]", ""),
            }
        )

    return docs.map_batches(cleanse, batch_format="pyarrow", zero_copy_batch=True)


def string_agg_distinct_segments(sf_dir: str) -> pa.Table:
    """A5 DISTINCT variant (STRING_AGG(DISTINCT ...),
    sql/complex_queries.sql:307): distinct market segments per nation,
    sorted and comma-joined.  The distinct collapse is a DISTRIBUTED
    two-level groupby (nation, segment) — only unique pairs reach the
    per-nation string join, so the string_agg itself touches ≤ |nations| ×
    |segments| rows at any scale."""
    cust = _t(sf_dir, "customer", ["c_nationkey", "c_mktsegment"])
    distinct = cust.groupby(["c_nationkey", "c_mktsegment"]).aggregate(
        Count(alias_name="_n")
    )

    def join_segs(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_nationkey": [g["c_nationkey"].iloc[0]],
                "segments": [",".join(sorted(g["c_mktsegment"]))],
            }
        )

    out = (
        distinct.groupby("c_nationkey")
        .map_groups(join_segs, batch_format="pandas")
        .to_pandas()
        .sort_values("c_nationkey")
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def orders_value_percentiles(sf_dir: str) -> pa.Table:
    """Exact distributed percentiles (p25/50/75/90/99) of order value per
    priority — the holistic-aggregate family the reference approximates
    with sorted LIMIT queries (``src/sql_query_executor.py:134``).

    Plan: per-batch partial histogram over exact int64 cents (``_cents``)
    → ``groupby((priority, cents)).sum`` — the shuffle carries one row per
    DISTINCT (priority, value), not per order — → driver-side rank
    extraction over the compacted counts.  2-decimal money bounds the
    distinct-cents domain (≲ price-range × 100 rows however many orders
    exist), so the driver sees a histogram, never the data; an unbounded
    domain would swap the last step for fixed-width bins + a second
    refinement pass.  Rank formula matches DuckDB ``quantile_disc``:
    1-based rank ``ceil(q*n)`` with the same IEEE double multiply.
    """
    qs = [0.25, 0.5, 0.75, 0.9, 0.99]
    orders = _t(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def partial_hist(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o_orderpriority": t.column("o_orderpriority").to_pandas(),
                "cents": _cents(t.column("o_totalprice")).to_numpy(),
            }
        )
        g = (
            df.groupby(["o_orderpriority", "cents"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = (
        orders.map_batches(partial_hist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["o_orderpriority", "cents"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    out: list[tuple[str, float, float]] = []
    for pri, g in hist.groupby("o_orderpriority", sort=True):
        g = g.sort_values("cents")
        cum = g["cnt"].to_numpy(dtype=np.int64).cumsum()
        vals = g["cents"].to_numpy(dtype=np.int64)
        n = int(cum[-1])
        for q in qs:
            rank = max(int(np.ceil(np.float64(q) * n)), 1)
            v = vals[int(np.searchsorted(cum, rank, side="left"))]
            out.append((pri, q, v / 100.0))
    res = pd.DataFrame(out, columns=["o_orderpriority", "quantile", "value"])
    return pa.Table.from_pandas(res, preserve_index=False)


# LSN sentinel for an SCD2 version that is still current (open interval).
SCD2_OPEN_LSN = np.int64(2**63 - 1)


def events_scd2_history(sf_dir: str) -> ray.data.Dataset:
    """Slowly-Changing-Dimension Type 2 history from the changefeed: every
    event becomes a VERSION row of its key with a half-open validity
    interval ``[valid_from_lsn, valid_to_lsn)`` — the warehouse-side twin
    of the replay fold (replay keeps only the winner; SCD2 keeps the full
    lineage, the reference's ROW_NUMBER version-ranking idiom
    `sql/complex_queries.sql` generalized to all versions).

    Shape: ONE key-hash exchange (``_by_key_partitions`` on user_id), then
    per-partition vectorized sort + shift — version numbers are a grouped
    cumcount and ``valid_to`` is the next event's LSN scattered back with
    a last-of-key mask (open versions get the max-int64 sentinel rather
    than NULL so the interval algebra stays pure int64).  No per-group
    Python, no window materialization; partitions scale with input bytes.
    """
    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "event_id"], kind="mergesort").reset_index(
            drop=True
        )
        g = df.groupby("user_id", sort=False)
        version = (g.cumcount() + 1).to_numpy(np.int64)
        is_last = (g.cumcount(ascending=False) == 0).to_numpy()
        nxt = np.roll(df["event_id"].to_numpy(np.int64), -1)
        valid_to = np.where(is_last, SCD2_OPEN_LSN, nxt)
        return pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "version": version,
                "event_type": df["event_type"].to_numpy(object),
                "value": df["value"].to_numpy(np.float64),
                "valid_from_lsn": df["event_id"].to_numpy(np.int64),
                "valid_to_lsn": valid_to,
                "is_current": is_last,
            }
        )

    return _by_key_partitions(
        ds, "user_id", part, _join_partitions(sf_dir, "events")
    )


SCD2_ASOF_FRAC = 0.6  # point-in-time read at 60% of the max LSN


def events_scd2_asof(sf_dir: str) -> ray.data.Dataset:
    """Point-in-time state of the event stream AS OF an LSN watermark —
    the read side of ``events_scd2_history`` (version valid at L ⇔ latest
    event with LSN ≤ L), and the query-level twin of the lake's
    ``read_lake(asof_epoch=)`` time travel.

    The watermark is derived, not hardcoded: L = floor(max(event_id) ×
    0.6) via one cheap column-pruned max, then the filter pushes into the
    scan and the pick-latest fold (``_latest_per_user``) runs on the
    surviving prefix only.  floor(max × 0.6) is one correctly-rounded
    multiply on both engines, so the oracle derives the identical L."""
    lsn_max = _t(sf_dir, "events", ["event_id"]).max("event_id")
    asof = int(np.floor(np.float64(lsn_max) * SCD2_ASOF_FRAC))
    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value"])
    ds = ds.filter(expr=f"event_id <= {asof}")
    return _latest_per_user(ds, _join_partitions(sf_dir, "events"))


MAD_K = 3  # flag |v - median| > K * MAD


def events_props_rollup(sf_dir: str) -> pa.Table:
    """Semi-structured extraction: pull the integer ``k`` field out of
    the JSON ``props`` column (vectorized compiled-regex fast path with
    a row-wise ``json.loads`` fallback for adversarial rows —
    ``stages/text.py:json_int_column``) and roll up count + exact-cents
    value per k.  The JSON never shuffles: extraction happens map-side
    and only the (k, count, cents) partials move.  Oracled via DuckDB
    ``json_extract``."""
    from ..stages.text import json_int_column

    ev = _t(sf_dir, "events", ["props", "value"])

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        k = json_int_column(df["props"], "k")
        cents = np.round(df["value"].to_numpy() * 100.0).astype(np.int64)
        out = pd.DataFrame({"k": k, "cents": cents})
        out = out[out["k"].notna()]
        # per-batch partial: only distinct-k rows enter the exchange
        g = out.groupby("k", sort=False).agg(
            n_events=("cents", "size"), cents=("cents", "sum")
        )
        return g.reset_index().astype({"k": np.int64})

    agg = (
        ev.map_batches(extract, batch_format="pandas")
        .groupby("k")
        .aggregate(Sum("n_events", alias_name="n_events"), Sum("cents", alias_name="cents"))
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    agg["n_events"] = agg["n_events"].astype(np.int64)
    agg["sum_value"] = agg.pop("cents").to_numpy(np.int64) / 100.0
    return pa.Table.from_pandas(agg, preserve_index=False)


def events_value_outliers(sf_dir: str) -> ray.data.Dataset:
    """Per-key robust outlier detection: flag events whose value deviates
    more than ``MAD_K`` × MAD from their user's median — the holistic
    (median-of-medians) per-key shape, the robust sibling of z-scores
    (reference data-quality checks are row-rule-based; this is the
    grouped statistical gate a 100-TB pipeline runs instead).

    ONE key-hash exchange (``_by_key_partitions``), then two vectorized
    grouped-median transforms per partition — never a Python call per
    user.  Exactness across engines: values quantize to exact int cents,
    and every median interpolation over integers — pandas' (a+b)/2,
    DuckDB quantile_cont's a+(b-a)·0.5 — lands on the quarter-integer
    grid where both formulas are exact IEEE, so medians, MADs and the
    K·MAD comparison replay bit-for-bit; the two final /100 divisions
    are the only (identical) roundings."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "value"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        vc = np.floor(df["value"].to_numpy(np.float64) * 100.0 + 0.5)
        df = df.assign(_vc=vc)
        med = df.groupby("user_id", sort=False)["_vc"].transform("median")
        dev = (df["_vc"] - med).abs()
        mad = dev.groupby(df["user_id"], sort=False).transform("median")
        keep = (mad.to_numpy() > 0) & (dev.to_numpy() > MAD_K * mad.to_numpy())
        out = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "event_id": df["event_id"].to_numpy(np.int64),
                "value": df["value"].to_numpy(np.float64),
                "median_value": med.to_numpy(np.float64) / 100.0,
                "mad": mad.to_numpy(np.float64) / 100.0,
            }
        )
        return out[keep]

    return _by_key_partitions(
        ds, "user_id", part, _join_partitions(sf_dir, "events")
    )
