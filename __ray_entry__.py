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
from sql_etl_pipeline_ray.pipelines import training_data as T
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
        # --- window / join / streaming extensions ---
        "string_agg_nations_per_region": A.string_agg_nations_per_region,
        "first_last_order_value": A.first_last_order_value,
        "consecutive_day_customers": A.consecutive_day_customers,
        "product_affinity_pairs": A.product_affinity_pairs,
        "events_hourly_tumbling": A.events_hourly_tumbling,
        "events_sessionized": A.events_sessionized,
        "part_size_tiers": A.part_size_tiers,
        "cohort_retention": A.cohort_retention,
        # --- training-data ops (documents / embeddings) ---
        "doc_token_stats": T.doc_token_stats,
        "doc_quality_score": T.doc_quality_score,
        "doc_lang_id": T.doc_lang_id,
        "doc_fingerprint": T.doc_fingerprint,
        "doc_fingerprint_rolling": T.doc_fingerprint_rolling,
        "dedup_exact": T.dedup_exact,
        "dedup_stats": T.dedup_stats,
        "dedup_minhash_pairs": T.dedup_minhash_pairs,
        "dedup_simhash_pairs": T.dedup_simhash_pairs,
        "ann_cosine_topk": T.ann_cosine_topk,
        "ann_ivf_topk": T.ann_ivf_topk,
        "embedding_norms": T.embedding_norms,
        "multimodal_features": T.multimodal_features,
        "docs_systematic_sample": T.docs_systematic_sample,
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
        "string_agg_nations_per_region": """
            SELECT r.r_name, STRING_AGG(n.n_name, ',' ORDER BY n.n_name) AS nations
            FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name ORDER BY r.r_name
        """,
        "first_last_order_value": """
            SELECT DISTINCT o_custkey,
              FIRST_VALUE(o_totalprice) OVER w AS first_order_value,
              LAST_VALUE(o_totalprice) OVER w AS last_order_value,
              COUNT(*) OVER (PARTITION BY o_custkey) AS orders_count
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        """,
        "consecutive_day_customers": """
            WITH days AS (
              SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS d FROM orders)
            SELECT DISTINCT o_custkey FROM (
              SELECT o_custkey, d,
                     LAG(d) OVER (PARTITION BY o_custkey ORDER BY d) AS prev_d
              FROM days)
            WHERE d - prev_d = 1
            ORDER BY o_custkey
        """,
        "product_affinity_pairs": """
            WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            pairs AS (
              SELECT a.l_partkey AS p1, b.l_partkey AS p2
              FROM op a JOIN op b
                ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
            SELECT p1, p2, COUNT(*) AS together FROM pairs GROUP BY p1, p2
            ORDER BY together DESC, p1, p2 LIMIT 20
        """,
        "events_hourly_tumbling": """
            SELECT event_type, date_trunc('hour', ts) AS window_start,
                   COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
            FROM events GROUP BY 1, 2 ORDER BY event_type, window_start
        """,
        "events_sessionized": """
            WITH g AS (
              SELECT user_id, ts, event_id,
                CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS new_sess
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s AS (
              SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
              FROM g)
            SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
                   COUNT(*) AS n_events
            FROM s GROUP BY user_id, sid ORDER BY user_id, session_start
        """,
        "part_size_tiers": """
            SELECT CASE WHEN p_size <= 10 THEN 'small'
                        WHEN p_size <= 30 THEN 'medium'
                        ELSE 'large' END AS size_tier,
                   COUNT(*) AS parts_count,
                   ROUND(AVG(p_retailprice), 2) AS avg_price
            FROM part GROUP BY 1 ORDER BY size_tier
        """,
        "cohort_retention": """
            WITH om AS (
              SELECT o_custkey,
                     EXTRACT(year FROM o_orderdate) * 12
                       + EXTRACT(month FROM o_orderdate) AS order_month
              FROM orders),
            cohorts AS (
              SELECT o_custkey, MIN(order_month) AS cohort_month FROM om
              GROUP BY o_custkey)
            SELECT c.cohort_month,
                   om.order_month - c.cohort_month AS months_since,
                   COUNT(DISTINCT om.o_custkey) AS active_customers
            FROM om JOIN cohorts c ON om.o_custkey = c.o_custkey
            GROUP BY 1, 2 ORDER BY cohort_month, months_since
        """,
        "doc_token_stats": r"""
            SELECT doc_id,
              LENGTH(text) AS n_chars,
              CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                   ELSE LENGTH(REGEXP_REPLACE(TRIM(text), '\s+', ' ', 'g'))
                        - LENGTH(REGEXP_REPLACE(TRIM(text), '\s', '', 'g')) + 1
              END AS token_count,
              LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[.!?,;:]', '', 'g'))
                AS punct_count,
              ROUND((LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[0-9]', '', 'g')))
                    * 1.0 / GREATEST(LENGTH(text), 1), 6) AS digit_ratio,
              ROUND((LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[A-Z]', '', 'g')))
                    * 1.0 / GREATEST(LENGTH(text), 1), 6) AS upper_ratio,
              ROUND(LENGTH(REGEXP_REPLACE(TRIM(text), '\s', '', 'g')) * 1.0 /
                    GREATEST(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                         ELSE LENGTH(REGEXP_REPLACE(TRIM(text), '\s+', ' ', 'g'))
                              - LENGTH(REGEXP_REPLACE(TRIM(text), '\s', '', 'g')) + 1
                    END, 1), 6) AS mean_token_len
            FROM documents
        """,
        "doc_quality_score": r"""
            WITH s AS (
              SELECT doc_id,
                CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                     ELSE LENGTH(REGEXP_REPLACE(TRIM(text), '\s+', ' ', 'g'))
                          - LENGTH(REGEXP_REPLACE(TRIM(text), '\s', '', 'g')) + 1
                END AS token_count,
                ROUND((LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[0-9]', '', 'g')))
                      * 1.0 / GREATEST(LENGTH(text), 1), 6) AS digit_ratio,
                ROUND((LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[A-Z]', '', 'g')))
                      * 1.0 / GREATEST(LENGTH(text), 1), 6) AS upper_ratio,
                LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[.!?,;:]', '', 'g'))
                  AS punct_count
              FROM documents)
            SELECT doc_id, token_count,
              ROUND(LEAST(token_count, 100) - 50.0 * digit_ratio
                    - 30.0 * upper_ratio + LEAST(punct_count, 10), 4)
                AS quality_score,
              (token_count >= 5 AND digit_ratio < 0.3
               AND (LEAST(token_count, 100) - 50.0 * digit_ratio
                    - 30.0 * upper_ratio + LEAST(punct_count, 10)) > 10)
                AS passes_quality
            FROM s
        """,
        "doc_fingerprint": """
            SELECT doc_id, sha256(text) AS sha256_hex, md5(text) AS md5_hex
            FROM documents
        """,
        "dedup_exact": """
            SELECT doc_id, text, lang, source, n_chars FROM documents
            QUALIFY ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1
        """,
        "dedup_stats": """
            WITH c AS (SELECT text, COUNT(*) AS n FROM documents GROUP BY text)
            SELECT COUNT(*) AS distinct_texts,
                   COUNT(*) FILTER (WHERE n > 1) AS duplicated_texts,
                   COALESCE(SUM(n - 1) FILTER (WHERE n > 1), 0) AS duplicate_rows
            FROM c
        """,
        "ann_cosine_topk": """
            WITH q AS (
              SELECT vec_id AS query_id, embedding AS qe FROM embeddings
              WHERE vec_id < 3),
            sims AS (
              SELECT q.query_id, e.vec_id,
                     list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                            CAST(q.qe AS DOUBLE[])) AS sim
              FROM embeddings e, q)
            SELECT query_id, vec_id, ROUND(sim, 4) AS cosine_sim,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, vec_id) AS rank
            FROM sims
            QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY sim DESC, vec_id) <= 10
            ORDER BY query_id, rank
        """,
        "embedding_norms": """
            SELECT vec_id,
              ROUND(SQRT(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                                 x -> x * x))), 4) AS l2_norm,
              len(embedding) AS dim
            FROM embeddings
        """,
        "multimodal_features": """
            SELECT doc_id AS media_id,
              CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                   ELSE 'video' END AS media_type,
              strlen(text) AS payload_bytes
            FROM documents
        """,
        "docs_systematic_sample": """
            SELECT * FROM documents WHERE doc_id % 10 = 3
        """,
    }
