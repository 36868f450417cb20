"""Materialized-rollup incremental refresh (A9) + micro-batch tail loop."""

import os

import pandas as pd
import pytest

from sql_etl_pipeline_ray.config import ReplayConfig
from sql_etl_pipeline_ray.pipelines.replay import lake_table, replay, tail_change_log
from sql_etl_pipeline_ray.pipelines.rollup import (
    read_monthly_sales,
    refresh_monthly_sales,
)
from sql_etl_pipeline_ray.sources.datagen import ChangeLogSpec, write_change_log

SF = "/root/testdata/sf0.001"


def _canon(t):
    df = t.to_pandas()
    return df.sort_values(["year", "month"]).reset_index(drop=True)


def test_incremental_refresh_matches_full(tmp_path):
    out = str(tmp_path / "mv")
    written = refresh_monthly_sales(SF, out)
    full = _canon(read_monthly_sales(out))
    assert len(written) == len(full)

    # stale two month partitions, then refresh ONLY those months
    stale = written[:2]
    for y, m in stale:
        os.remove(os.path.join(out, f"year={y}", f"month={m}", "rollup.parquet"))
    untouched = os.path.join(
        out, f"year={written[2][0]}", f"month={written[2][1]}", "rollup.parquet"
    )
    mtime_before = os.path.getmtime(untouched)
    rewritten = refresh_monthly_sales(SF, out, months=stale)
    assert sorted(rewritten) == sorted(stale)
    assert os.path.getmtime(untouched) == mtime_before  # others untouched
    pd.testing.assert_frame_equal(_canon(read_monthly_sales(out)), full)


def test_tail_catches_up_with_growing_log(tmp_path):
    spec = ChangeLogSpec(n_keys=400, n_events=4000, num_buckets=8)
    full_log = str(tmp_path / "log")
    write_change_log(spec, full_log)

    growing = str(tmp_path / "growing")
    os.makedirs(growing)
    for k in range(4):
        os.symlink(
            os.path.join(full_log, f"lsn_bucket={k}"),
            os.path.join(growing, f"lsn_bucket={k}"),
        )
    lake = str(tmp_path / "lake")
    s1 = tail_change_log(
        growing, lake, ReplayConfig(num_partitions=4),
        poll_interval_s=0.0, max_polls=1,
    )
    assert s1[-1]["partitions_committed"] > 0

    for k in range(4, 8):  # "binlog grows" between polls
        os.symlink(
            os.path.join(full_log, f"lsn_bucket={k}"),
            os.path.join(growing, f"lsn_bucket={k}"),
        )
    s2 = tail_change_log(
        growing, lake, ReplayConfig(num_partitions=4),
        poll_interval_s=0.0, stop_after_idle=1,
    )
    assert s2[-1]["partitions_committed"] == 0  # ended idle (caught up)

    oneshot = str(tmp_path / "oneshot")
    replay(full_log, oneshot, ReplayConfig(num_partitions=4))
    a = lake_table(lake).to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    b = (
        lake_table(oneshot).to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])


def test_tail_picks_up_schema_evolution(tmp_path):
    """Schema evolution lands WHILE tailing: buckets after the evolution
    point add ``size_bytes`` and widen ``lang``; the resumed micro-batches
    must unify with the narrower committed lake and match the oracle."""
    import pyarrow as pa

    from sql_etl_pipeline_ray.sources.datagen import generate_change_log, replay_oracle

    spec = ChangeLogSpec(
        n_keys=300, n_events=3000, num_buckets=6, evolve_after_frac=0.5
    )
    full_log = str(tmp_path / "log")
    write_change_log(spec, full_log)

    growing = str(tmp_path / "growing")
    os.makedirs(growing)
    for k in range(3):  # pre-evolution prefix only
        os.symlink(
            os.path.join(full_log, f"lsn_bucket={k}"),
            os.path.join(growing, f"lsn_bucket={k}"),
        )
    lake = str(tmp_path / "lake")
    tail_change_log(
        growing, lake, ReplayConfig(num_partitions=4),
        poll_interval_s=0.0, max_polls=1,
    )
    t = lake_table(lake)
    assert "size_bytes" not in t.column_names  # narrow schema committed

    for k in range(3, 6):  # evolved buckets land
        os.symlink(
            os.path.join(full_log, f"lsn_bucket={k}"),
            os.path.join(growing, f"lsn_bucket={k}"),
        )
    tail_change_log(
        growing, lake, ReplayConfig(num_partitions=4),
        poll_interval_s=0.0, stop_after_idle=1,
    )
    t2 = lake_table(lake)
    assert "size_bytes" in t2.column_names

    want = replay_oracle(generate_change_log(spec))
    got = t2.to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    want = want.sort_values(["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(want.columns)], want[sorted(want.columns)], check_dtype=False
    )
