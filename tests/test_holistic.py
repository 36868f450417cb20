"""Holistic aggregates: exact distributed quantiles + exact top-k terms.

Edge cases the sf-dir parity run can't hit: random value distributions
(rank formula vs DuckDB on data WITH duplicates), top-k tie determinism,
and empty/token-free documents.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def _write_orders(tmp_path, cents: np.ndarray, pri: np.ndarray) -> str:
    t = pa.table(
        {
            "o_orderpriority": pa.array(pri),
            "o_totalprice": pa.array(cents / 100.0),
        }
    )
    pq.write_table(t, tmp_path / "orders.parquet")
    return str(tmp_path)


def test_percentiles_match_duckdb_on_random_with_dups(tmp_path):
    from sql_etl_pipeline_ray.pipelines.analytics import orders_value_percentiles

    rng = np.random.default_rng(7)
    # heavy duplication: only 40 distinct cent values over 3000 rows, so
    # quantile ranks routinely land INSIDE runs of equal values
    cents = rng.integers(100, 5000, size=3000) * 25
    pri = rng.choice(["A", "B"], size=3000)
    sf = _write_orders(tmp_path, cents, pri)

    got = orders_value_percentiles(sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf}/orders.parquet')"
    )
    want = con.execute(
        """
        WITH c AS (SELECT o_orderpriority,
                          CAST(round(o_totalprice * 100) AS BIGINT) AS cents
                   FROM orders)
        SELECT o_orderpriority,
               unnest([0.25, 0.5, 0.75, 0.9, 0.99]) AS quantile,
               unnest(quantile_disc(cents, [0.25, 0.5, 0.75, 0.9, 0.99]))
                 / 100.0 AS value
        FROM c GROUP BY o_orderpriority ORDER BY o_orderpriority, quantile
        """
    ).df()
    pd.testing.assert_frame_equal(got, want)


def test_percentiles_single_row_group(tmp_path):
    from sql_etl_pipeline_ray.pipelines.analytics import orders_value_percentiles

    sf = _write_orders(tmp_path, np.array([1234]), np.array(["Z"]))
    got = orders_value_percentiles(sf).to_pandas()
    assert (got["value"] == 12.34).all() and len(got) == 5


def test_top_terms_tie_break_and_empty_docs(tmp_path):
    from sql_etl_pipeline_ray.pipelines import training_data as T

    docs = pa.table(
        {
            "doc_id": pa.array(range(6), pa.int64()),
            # zebra and apple tie at 3; '' and '!!!' tokenize to nothing
            "text": pa.array(
                [
                    "zebra apple zebra",
                    "apple zebra apple",
                    "banana",
                    "",
                    "!!!",
                    "Banana BANANA",
                ]
            ),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    got = T.top_terms(str(tmp_path), k=2)
    # banana=3, apple=3, zebra=3 → (cnt DESC, term ASC) keeps apple, banana
    assert list(got["term"]) == ["apple", "banana"]
    assert list(got["cnt"]) == [3, 3]
    assert got["cnt"].dtype == np.int64


def test_top_terms_bounded_matches_exact_under_truncation(tmp_path):
    """Tiny summary_k forces real truncation in every batch; the proven-
    complete candidate + recount plan must still equal the exact result."""
    from sql_etl_pipeline_ray.pipelines import training_data as T

    rng = np.random.default_rng(3)
    # zipf-ish corpus: head terms dominate, long random tail gets truncated
    vocab = [f"t{i}" for i in range(400)]
    weights = 1.0 / np.arange(1, 401)
    weights /= weights.sum()
    texts = [
        " ".join(rng.choice(vocab, size=60, p=weights)) for _ in range(300)
    ]
    docs = pa.table(
        {"doc_id": pa.array(range(300), pa.int64()), "text": pa.array(texts)}
    )
    pq.write_table(docs, tmp_path / "documents.parquet")

    exact = T.top_terms(str(tmp_path), k=20)
    bounded = T.top_terms_bounded(str(tmp_path), k=20, summary_k=32)
    pd.testing.assert_frame_equal(bounded, exact)


def test_top_terms_bounded_falls_back_on_flat_distribution(tmp_path):
    """A perfectly flat distribution defeats the completeness bound; the
    operator must return the exact answer via the fallback, not a guess."""
    from sql_etl_pipeline_ray.pipelines import training_data as T

    texts = [f"u{i} u{i + 1000}" for i in range(500)]  # every term once
    docs = pa.table(
        {"doc_id": pa.array(range(500), pa.int64()), "text": pa.array(texts)}
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    exact = T.top_terms(str(tmp_path), k=10)
    bounded = T.top_terms_bounded(str(tmp_path), k=10, summary_k=8)
    pd.testing.assert_frame_equal(bounded, exact)


def test_value_outliers_median_mad_random_vs_duckdb(tmp_path):
    """Random per-user value distributions (even AND odd group sizes, ties,
    planted spikes) — the grouped median/MAD gate must match DuckDB row
    for row including the interpolated medians."""
    from sql_etl_pipeline_ray.pipelines.analytics import events_value_outliers

    rng = np.random.default_rng(11)
    n = 3000
    user = rng.integers(0, 40, n).astype(np.int64)
    cents = rng.integers(100, 20000, n)
    spikes = rng.random(n) < 0.02
    cents = np.where(spikes, cents * 50, cents)
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(user),
            "value": pa.array(cents / 100.0),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    got = (
        events_value_outliers(str(tmp_path))
        .to_pandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    import __ray_entry__ as E

    want = (
        con.execute(E.oracle_sql()["events_value_outliers"])
        .df()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    assert len(got) > 0  # the planted spikes must trip the gate
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)
