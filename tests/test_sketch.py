"""HyperLogLog sketch: merge associativity and error bounds."""

import numpy as np
import pytest

from sql_etl_pipeline_ray.stages.sketch import hll_estimate, hll_merge, hll_partial


@pytest.mark.parametrize("n", [50, 1_000, 50_000, 500_000])
def test_hll_error_within_bounds(n):
    rng = np.random.default_rng(n)
    vals = rng.integers(-(2**62), 2**62, n).astype(np.int64)
    est = hll_estimate(hll_partial(vals))
    true = len(np.unique(vals))
    assert abs(est - true) / true < 0.05, (n, est, true)


def test_hll_merge_equals_single_pass():
    rng = np.random.default_rng(9)
    vals = rng.integers(0, 2**60, 100_000).astype(np.int64)
    whole = hll_partial(vals)
    parts = [hll_partial(c) for c in np.array_split(vals, 7)]
    assert np.array_equal(hll_merge(parts), whole)


def test_hll_duplicates_dont_inflate():
    vals = np.repeat(np.arange(1000, dtype=np.int64), 500)  # 500k rows, 1k uniq
    est = hll_estimate(hll_partial(vals))
    assert abs(est - 1000) / 1000 < 0.05, est


def test_hll_empty():
    assert hll_estimate(hll_partial(np.zeros(0, np.int64))) == 0.0


def test_monthly_uniques_query_close_to_exact():
    import duckdb

    import sql_etl_pipeline_ray.pipelines.training_data as T

    sf = "/root/testdata/sf0.001"
    got = T.monthly_uniques_hll(sf).to_pandas().set_index("ym")
    exact = duckdb.sql(
        f"""SELECT EXTRACT(year FROM o_orderdate)*100 + EXTRACT(month FROM o_orderdate) AS ym,
                   COUNT(DISTINCT o_custkey) AS n
            FROM '{sf}/orders.parquet' GROUP BY 1"""
    ).df().set_index("ym")
    assert set(got.index) == set(exact.index)
    exact = exact.reindex(got.index)
    # tiny months (tens of uniques at sf0.001) can lose a couple of
    # register collisions — allow an absolute floor on top of the 6%
    diff = (got["unique_customers_approx"] - exact["n"]).abs()
    tol = np.maximum(3.0, 0.06 * exact["n"])
    assert (diff <= tol).all(), (diff / exact["n"]).max()


def test_libm_log_matches_duckdb_ln_on_all_linear_counting_inputs():
    """hll_estimate's linear-counting branch uses math.log; the SQL oracle
    uses DuckDB ln.  The input domain is finite (m / zeros for zeros in
    1..m-1) — pin bit-equality over ALL of it so the oracle can never
    drift by a ulp."""
    import math

    import duckdb

    m = 4096
    rows = duckdb.sql(
        f"SELECT v, ln({float(m)} / v) FROM (SELECT UNNEST(generate_series(1, {m - 1})) v)"
    ).fetchall()
    assert all(l == math.log(m / v) for v, l in rows)
