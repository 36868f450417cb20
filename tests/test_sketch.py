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


def test_bottomk_merge_is_batch_invariant():
    """The final bottom-k sample must be IDENTICAL for any split of the
    input into batches (associative merge) — this is what makes the
    sketch's SQL oracle exact despite Ray's nondeterministic batching."""
    from sql_etl_pipeline_ray.stages.sketch import bottomk_merge, bottomk_partial

    rng = np.random.default_rng(7)
    ids = rng.permutation(20_000).astype(np.int64)
    vals = rng.normal(size=len(ids))
    k = 512
    whole = bottomk_merge([bottomk_partial(ids, vals, k)], k)
    for nsplit in (2, 7, 64):
        parts = [
            bottomk_partial(i, v, k)
            for i, v in zip(np.array_split(ids, nsplit), np.array_split(vals, nsplit))
        ]
        split = bottomk_merge(parts, k)
        np.testing.assert_array_equal(whole[0], split[0])
        np.testing.assert_array_equal(whole[1], split[1])


def test_bottomk_quantile_rank_error_bound():
    """The estimated quantile's TRUE rank fraction must sit within a few
    standard errors (sqrt(q(1-q)/k)) of q — the KMV sample guarantee."""
    from sql_etl_pipeline_ray.stages.sketch import (
        bottomk_merge, bottomk_partial, bottomk_quantiles,
    )

    rng = np.random.default_rng(11)
    n, k = 200_000, 4096
    ids = np.arange(n, dtype=np.int64)
    vals = rng.lognormal(mean=1.0, sigma=1.5, size=n)  # heavy-tailed
    _, sample = bottomk_merge([bottomk_partial(ids, vals, k)], k)
    assert len(sample) == k
    qs = [(1, 2), (9, 10), (99, 100)]
    est = bottomk_quantiles(sample, qs)
    srt = np.sort(vals)
    for (qn, qd), e in zip(qs, est):
        q = qn / qd
        true_rank = np.searchsorted(srt, e, side="right") / n
        se = np.sqrt(q * (1 - q) / k)
        assert abs(true_rank - q) <= 5 * se + 1.0 / k, (q, true_rank, se)


def test_bottomk_quantiles_tiny_and_empty():
    from sql_etl_pipeline_ray.stages.sketch import bottomk_quantiles

    one = bottomk_quantiles(np.array([3.5]), [(1, 2), (99, 100)])
    np.testing.assert_array_equal(one, [3.5, 3.5])
    assert np.isnan(bottomk_quantiles(np.array([]), [(1, 2)])).all()


def test_events_quantile_sketch_close_to_exact():
    import duckdb

    import sql_etl_pipeline_ray.pipelines.training_data as T

    sf = "/root/testdata/sf0.001"
    got = T.events_value_quantile_sketch(sf).to_pandas()
    exact = duckdb.sql(
        f"SELECT quantile_disc(value, [0.5, 0.9, 0.99]) FROM '{sf}/events.parquet'"
    ).fetchone()[0]
    n = duckdb.sql(f"SELECT COUNT(*) FROM '{sf}/events.parquet'").fetchone()[0]
    # sf0.001 events (~1k rows) fit inside k=4096 -> the "sample" is the
    # whole table and the sketch must be EXACT at the rank rule's grid
    assert n <= 4096
    vals = duckdb.sql(
        f"SELECT value FROM '{sf}/events.parquet' ORDER BY value"
    ).df()["value"].to_numpy()
    for q, e in zip(got["q"], got["value_approx"]):
        rk = max(int(np.ceil(q * n - 1e-9)), 1)
        assert e == vals[rk - 1], (q, e)


def test_grouped_quantile_sketch_close_to_exact():
    import duckdb

    import sql_etl_pipeline_ray.pipelines.training_data as T

    sf = "/root/testdata/sf0.01"
    got = T.events_type_value_quantiles(sf).to_pandas()
    # three q rows per event_type
    assert (got.groupby("event_type").size() == 3).all()
    exact = duckdb.sql(
        f"""SELECT event_type, quantile_disc(value, 0.5) AS p50
            FROM '{sf}/events.parquet' GROUP BY event_type"""
    ).df().set_index("event_type")["p50"]
    p50 = got[got["q"] == 0.5].set_index("event_type")["value_approx"]
    # k=1024 per group -> se ~ 1.6% of rank; allow 10% value slack on
    # these smooth-ish distributions
    rel = ((p50 - exact.reindex(p50.index)).abs() / exact.reindex(p50.index))
    assert (rel < 0.10).all(), rel
