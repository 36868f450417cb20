"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library code it calls) calls ``ray.init`` / ``ray.shutdown``.

- ``entry()``       — flagship CDC replay over sf0.001 documents.
- ``queries()``     — one callable per implemented operator (SURVEY.md §2).
- ``oracle_sql()``  — DuckDB-equivalent SQL per query (same column names).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from sql_etl_pipeline_ray.pipelines import analytics as A
from sql_etl_pipeline_ray.pipelines.flagship import run_flagship


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: documents → derived
    change log → full CDC replay (normalize → shuffle → LWW fold →
    exactly-once sink) → final lake Dataset."""
    return run_flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # --- CDC core (the north-star capability) ---
        "cdc_replay": lambda sf: run_flagship(sf),
        "cdc_lww_latest_event": A.cdc_lww_latest_event,
        "cdc_lww_with_deletes": A.cdc_lww_with_deletes,
        "cdc_incremental_highwater": A.cdc_incremental_highwater,
        # --- analytics parity (SURVEY.md §2.2-2.8) ---
        "customer_order_metrics": A.customer_order_metrics,
        "customer_ltv_ranked": A.customer_ltv_ranked,
        "monthly_sales_trends": A.monthly_sales_trends,
        "product_performance": A.product_performance,
        "region_revenue_rollup": A.region_revenue_rollup,
        "category_share": A.category_share,
        "top3_parts_per_brand": A.top3_parts_per_brand,
        "orders_filter_window": A.orders_filter_window,
        "string_normalize_customers": A.string_normalize_customers,
        "per_order_allocation": A.per_order_allocation,
        "union_quality_report": A.union_quality_report,
    }


_CUSTOMER_METRICS_SQL = """
SELECT c.c_custkey, c.c_name, c.c_mktsegment,
       COALESCE(o.cnt, 0) AS total_orders,
       ROUND(COALESCE(o.sum_tp, 0), 2) AS lifetime_value,
       ROUND(COALESCE(o.avg_tp, 0), 2) AS avg_order_value,
       o.min_d AS first_order_date,
       o.max_d AS last_order_date
FROM customer c LEFT JOIN (
  SELECT o_custkey, COUNT(*) AS cnt, SUM(o_totalprice) AS sum_tp,
         AVG(o_totalprice) AS avg_tp, MIN(o_orderdate) AS min_d,
         MAX(o_orderdate) AS max_d
  FROM orders GROUP BY o_custkey) o
ON c.c_custkey = o.o_custkey
"""


def oracle_sql() -> dict[str, str]:
    return {
        "cdc_replay": """
            SELECT source AS repo,
                   'doc_' || CAST(doc_id AS VARCHAR) || '.txt' AS path,
                   'c2-' || CAST(doc_id AS VARCHAR) AS "commit",
                   lang,
                   text || ' [rev2]' AS content,
                   CAST(3 * doc_id + 2 AS BIGINT) AS lsn,
                   sha256(text || ' [rev2]') AS content_sha256
            FROM documents
            WHERE doc_id % 10 <> 0
        """,
        "cdc_lww_latest_event": """
            SELECT event_id, ts, user_id, event_type, value FROM events
            QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
        """,
        "cdc_lww_with_deletes": """
            SELECT * FROM (
              SELECT event_id, ts, user_id, event_type, value FROM events
              QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
            ) WHERE event_type <> 'error'
        """,
        "cdc_incremental_highwater": """
            SELECT event_id, ts, user_id, event_type, value
            FROM events
            WHERE event_id > (SELECT CAST(FLOOR(MAX(event_id) / 2) AS BIGINT) FROM events)
            QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
        """,
        "customer_order_metrics": _CUSTOMER_METRICS_SQL,
        "customer_ltv_ranked": f"""
            WITH m AS ({_CUSTOMER_METRICS_SQL})
            SELECT *,
              RANK() OVER (PARTITION BY c_mktsegment ORDER BY lifetime_value DESC)
                AS segment_rank,
              ROW_NUMBER() OVER (ORDER BY lifetime_value DESC, c_custkey)
                AS ltv_row_number,
              NTILE(10) OVER (ORDER BY lifetime_value DESC, c_custkey)
                AS ltv_decile
            FROM m
            ORDER BY lifetime_value DESC, c_custkey
            LIMIT 100
        """,
        "monthly_sales_trends": """
            WITH per_cust AS (
              SELECT EXTRACT(year FROM o_orderdate) AS o_year,
                     EXTRACT(month FROM o_orderdate) AS o_month,
                     o_custkey, COUNT(*) AS orders_count,
                     SUM(o_totalprice) AS revenue
              FROM orders GROUP BY 1, 2, 3),
            m AS (
              SELECT o_year, o_month, COUNT(*) AS unique_customers,
                     SUM(orders_count) AS orders_count, SUM(revenue) AS revenue
              FROM per_cust GROUP BY 1, 2)
            SELECT o_year, o_month, unique_customers, orders_count,
              ROUND(revenue, 2) AS revenue,
              ROUND(CASE WHEN LAG(revenue) OVER w IS NULL OR LAG(revenue) OVER w = 0
                    THEN NULL
                    ELSE (revenue - LAG(revenue) OVER w) / LAG(revenue) OVER w * 100
                    END, 2) AS mom_growth_pct,
              ROUND(AVG(revenue) OVER (ORDER BY o_year, o_month
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS rolling_3m_avg,
              ROUND(SUM(revenue) OVER (PARTITION BY o_year ORDER BY o_month
                    ROWS UNBOUNDED PRECEDING), 2) AS cum_revenue_ytd
            FROM m WINDOW w AS (ORDER BY o_year, o_month)
            ORDER BY o_year, o_month
        """,
        "product_performance": """
            SELECT l.l_partkey,
                   ROUND(SUM(l_quantity), 2) AS total_qty,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   COUNT(*) AS num_lines,
                   p.p_name, p.p_brand, p.p_retailprice
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY l.l_partkey, p.p_name, p.p_brand, p.p_retailprice
            ORDER BY SUM(l_extendedprice * (1 - l_discount)) DESC, l.l_partkey
            LIMIT 100
        """,
        "region_revenue_rollup": """
            SELECT r.r_name, COUNT(*) AS orders_count,
                   ROUND(SUM(o.o_totalprice), 2) AS total_revenue
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name ORDER BY r.r_name
        """,
        "category_share": """
            WITH b AS (
              SELECT p.p_brand, SUM(l_extendedprice * (1 - l_discount)) AS revenue
              FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
              GROUP BY p.p_brand)
            SELECT p_brand, ROUND(revenue, 2) AS revenue,
                   ROUND(revenue / SUM(revenue) OVER () * 100, 4) AS revenue_share_pct
            FROM b ORDER BY p_brand
        """,
        "top3_parts_per_brand": """
            SELECT p_partkey, p_name, p_brand, p_retailprice FROM part
            QUALIFY ROW_NUMBER() OVER (
              PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) <= 3
        """,
        "orders_filter_window": """
            SELECT o_orderpriority, COUNT(*) AS orders_count,
                   ROUND(SUM(o_totalprice), 2) AS total_value
            FROM orders
            WHERE o_orderstatus <> 'F'
              AND o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate < TIMESTAMP '1998-01-01'
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "string_normalize_customers": """
            SELECT c_custkey,
                   LOWER(c_name) AS name_lower,
                   REGEXP_REPLACE(c_name, '[^0-9]', '', 'g') AS cust_digits,
                   c_name || ' / ' || LOWER(c_mktsegment) AS display_name,
                   ABS(c_acctbal) AS acctbal_abs
            FROM customer
        """,
        "per_order_allocation": """
            SELECT l_orderkey, l_linenumber,
              ROUND(l_extendedprice /
                    SUM(l_extendedprice) OVER (PARTITION BY l_orderkey) * 100, 4)
                AS line_share_pct,
              ROUND(SUM(l_extendedprice) OVER (PARTITION BY l_orderkey) /
                    COUNT(*) OVER (PARTITION BY l_orderkey), 4) AS equal_split
            FROM lineitem
        """,
        "union_quality_report": """
            SELECT 'duplicate_lineitem_pk' AS check_name, COUNT(*) AS issue_count
            FROM (SELECT l_orderkey, l_linenumber FROM lineitem
                  GROUP BY 1, 2 HAVING COUNT(*) > 1)
            UNION ALL
            SELECT 'negative_or_zero_qty', COUNT(*) FROM lineitem WHERE l_quantity <= 0
            UNION ALL
            SELECT 'null_order_date', COUNT(*) FROM orders WHERE o_orderdate IS NULL
            UNION ALL
            SELECT 'orphan_lineitems', COUNT(*)
            FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderkey IS NULL
        """,
    }
