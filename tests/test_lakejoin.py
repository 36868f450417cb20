"""Partition-wise (shuffle-free) lake join (pipelines/lakejoin.py)."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sql_etl_pipeline_ray.config import ReplayConfig, SinkConfig
from sql_etl_pipeline_ray.pipelines.derive import refresh_derived_lake
from sql_etl_pipeline_ray.pipelines.lakejoin import join_lakes
from sql_etl_pipeline_ray.pipelines.replay import lake_table, replay
from sql_etl_pipeline_ray.sources.datagen import ChangeLogSpec, write_change_log


def _mk_lake(tmp_path, name, spec, parts=4, prefix_buckets=None, mor=False):
    log = str(tmp_path / f"log_{name}")
    lake = str(tmp_path / f"lake_{name}")
    files = sorted(write_change_log(spec, log))
    src = log
    if prefix_buckets is not None:
        src = str(tmp_path / f"log_{name}_pre")
        os.makedirs(src)
        for f in files[:prefix_buckets]:
            d = os.path.join(src, os.path.basename(os.path.dirname(f)))
            os.makedirs(d)
            os.link(f, os.path.join(d, "events.parquet"))
    replay(src, lake, ReplayConfig(num_partitions=parts),
           sink=SinkConfig(out_dir=lake, keep_epochs=2))
    if mor:
        replay(log, lake, ReplayConfig(num_partitions=parts),
               sink=SinkConfig(out_dir=lake, keep_epochs=2,
                               merge_on_read=True),
               resume=True)
    return lake


def _df(lake):
    return lake_table(lake).to_pandas()


def test_join_matches_pandas_reference(tmp_path):
    spec = ChangeLogSpec(n_events=8000, n_keys=500, seed=73, delete_frac=0.1)
    a = _mk_lake(tmp_path, "a", spec)
    dst = str(tmp_path / "derived")

    def fn(df):
        out = df[["repo", "path"]].copy()
        out["n_chars"] = df["content"].str.len().astype("int64")
        return out

    refresh_derived_lake(a, dst, fn, keep_epochs=2)
    got = (
        join_lakes(a, dst, how="inner", columns_b=["n_chars"])
        .to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    da, db = _df(a), _df(dst)
    want = (
        da.merge(db[["repo", "path", "n_chars"]], on=["repo", "path"])
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False,
    )


def test_left_join_and_pruning_and_suffix(tmp_path):
    spec = ChangeLogSpec(n_events=8000, n_keys=500, seed=79, num_buckets=8)
    a = _mk_lake(tmp_path, "a2", spec)
    # b: only the log prefix — older values, and some keys missing entirely
    b = _mk_lake(tmp_path, "b2", spec, prefix_buckets=3)
    got = (
        join_lakes(
            a, b, how="left",
            columns_a=["commit", "lsn"], columns_b=["commit", "lsn"],
        )
        .to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    da, db = _df(a), _df(b)
    want = (
        da[["repo", "path", "commit", "lsn"]]
        .merge(
            db[["repo", "path", "commit", "lsn"]]
            .rename(columns={"commit": "commit_b", "lsn": "lsn_b"}),
            on=["repo", "path"], how="left",
        )
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )
    assert len(got) == len(da)          # every live a row survives
    assert got["lsn_b"].isna().any()    # some keys truly missing in b
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False,
    )


def test_join_folds_mor_chains(tmp_path):
    spec = ChangeLogSpec(n_events=6000, n_keys=400, seed=83, num_buckets=6)
    a = _mk_lake(tmp_path, "a3", spec)
    # b: same events, committed with a merge-on-read tail (delta chains)
    b = _mk_lake(tmp_path, "b3", spec, prefix_buckets=3, mor=True)
    got = (
        join_lakes(a, b, how="inner",
                   columns_a=["lsn"], columns_b=["lsn"])
        .to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    # both lakes hold the same final state -> lsn == lsn_b for every key
    assert len(got) == len(_df(a))
    assert (got["lsn"] == got["lsn_b"]).all()


def test_join_refuses_mismatched_layout(tmp_path):
    spec = ChangeLogSpec(n_events=2000, n_keys=200, seed=89)
    a = _mk_lake(tmp_path, "a4", spec, parts=4)
    b = _mk_lake(tmp_path, "b4", spec, parts=8)
    with pytest.raises(ValueError, match="co-partitioned"):
        join_lakes(a, b)
    # rescale_lake restores joinability
    from sql_etl_pipeline_ray.pipelines.replay import rescale_lake

    b4 = str(tmp_path / "b4_rescaled")
    rescale_lake(b, b4, num_partitions=4)
    j = join_lakes(a, b4, columns_a=["lsn"], columns_b=["lsn"]).to_pandas()
    assert len(j) == len(_df(a))
    assert (j["lsn"] == j["lsn_b"]).all()
