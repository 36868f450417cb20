"""Unit tests for the temporal join primitives (pipelines/temporal.py).

Edge cases the sf-level oracle parity test can't isolate: right-side ties
at the same timestamp, left rows with no match, the composite-int64 fast
path vs the pandas fallback in range_join_count, and hot-key skew.
"""

import numpy as np
import pandas as pd
import ray.data

from sql_etl_pipeline_ray.pipelines.temporal import asof_join, range_join_count


def _ts(*secs):
    return pd.to_datetime(np.array(secs, dtype="int64"), unit="s").values


def _left(keys, secs):
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "lid": np.arange(len(keys), dtype=np.int64),
                "k": np.array(keys, dtype=np.int64),
                "lt": _ts(*secs),
            }
        )
    )


def _right(keys, secs, vals):
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "rid": np.arange(len(keys), dtype=np.int64) + 100,
                "k": np.array(keys, dtype=np.int64),
                "rt": _ts(*secs),
                "v": np.array(vals, dtype=np.float64),
            }
        )
    )


def _asof_pd(left, right, num_partitions=3, tiebreak="rid"):
    out = asof_join(
        left, right, key="k", left_on="lt", right_on="rt",
        num_partitions=num_partitions, right_tiebreak=tiebreak,
    ).to_pandas()
    return out.sort_values("lid").reset_index(drop=True)


def test_asof_backward_basic_and_miss():
    left = _left([1, 1, 2], [100, 50, 100])
    right = _right([1, 1, 2], [60, 90, 200], [1.0, 2.0, 3.0])
    out = _asof_pd(left, right)
    # lid0 (k=1,t=100): latest rt<=100 is 90 -> v=2.0
    # lid1 (k=1,t=50): no rt<=50 -> NaN
    # lid2 (k=2,t=100): right only at 200 -> NaN
    assert out["v"].tolist()[0] == 2.0
    assert np.isnan(out["v"].iloc[1]) and np.isnan(out["v"].iloc[2])


def test_asof_equal_ts_inclusive_and_tiebreak():
    left = _left([7], [100])
    # two right rows at exactly t=100 — backward asof is inclusive and the
    # tiebreak must pick max rid (the later one, v=9.0)
    right = _right([7, 7], [100, 100], [4.0, 9.0])
    out = _asof_pd(left, right)
    assert out["v"].tolist() == [9.0]


def test_asof_hot_key_all_one_partition():
    # 500 left rows on ONE key — exercises the skew path (single partition)
    n = 500
    left = _left([3] * n, list(range(1000, 1000 + n)))
    right = _right([3] * 5, [1000, 1100, 1200, 1300, 1400], [1, 2, 3, 4, 5])
    out = _asof_pd(left, right, num_partitions=4)
    # row at t=1250 sees the right row at 1200 -> v=3
    assert out.loc[out["lt"] == _ts(1250)[0], "v"].iloc[0] == 3.0
    assert len(out) == n


def _range_pd(left, right, window_s, num_partitions=3):
    out = range_join_count(
        left, right, key="k", left_on="lt", right_on="rt",
        window_us=window_s * 1_000_000, num_partitions=num_partitions,
    ).to_pandas()
    return out.sort_values("lid").reset_index(drop=True)


def test_range_count_exclusive_open_lower_closed_upper():
    left = _left([1], [100])
    # rt=100 excluded (strictly after), rt=160 included (<= +60), rt=161 out
    right = _right([1, 1, 1], [100, 160, 161], [0, 0, 0])
    out = _range_pd(left, right.select_columns(["k", "rt"]), window_s=60)
    assert out["n_in_window"].tolist() == [1]
    assert out["first_in_window"].iloc[0] == _ts(160)[0]


def test_range_count_no_match_is_zero_nat():
    left = _left([1, 2], [100, 100])
    right = _right([1], [500], [0.0])
    out = _range_pd(left, right.select_columns(["k", "rt"]), window_s=60)
    assert out["n_in_window"].tolist() == [0, 0]
    assert out["first_in_window"].isna().all()


def test_range_fallback_matches_fast_path():
    # keys above the 2^21 composite budget force the pandas fallback;
    # the same data under small keys uses the searchsorted fast path —
    # both must agree.
    rng = np.random.default_rng(7)
    n, m = 60, 300
    lsec = rng.integers(0, 5000, n).tolist()
    rsec = rng.integers(0, 5000, m).tolist()
    lkey = rng.integers(0, 4, n)
    rkey = rng.integers(0, 4, m)
    big = 1 << 40  # overflows the 21-bit key budget
    fast = _range_pd(
        _left(lkey, lsec),
        _right(rkey, rsec, [0.0] * m).select_columns(["k", "rt"]),
        window_s=120,
    )
    slow = _range_pd(
        _left(lkey + big, lsec),
        _right(rkey + big, rsec, [0.0] * m).select_columns(["k", "rt"]),
        window_s=120,
    )
    assert fast["n_in_window"].tolist() == slow["n_in_window"].tolist()
    a = fast["first_in_window"].reset_index(drop=True)
    b = slow["first_in_window"].reset_index(drop=True)
    assert ((a == b) | (a.isna() & b.isna())).all()
