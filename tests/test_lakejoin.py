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


def _mk_lake(tmp_path, name, spec, parts=4, prefix_buckets=None, mor=False,
             **sink_kw):
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
           sink=SinkConfig(out_dir=lake, keep_epochs=2, **sink_kw))
    if mor:
        replay(log, lake, ReplayConfig(num_partitions=parts),
               sink=SinkConfig(out_dir=lake, keep_epochs=2,
                               merge_on_read=True, **sink_kw),
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
    # typed null-fill contract: b's int column stays integral (Arrow NA),
    # never upcast to float64 NaN / object per-partition drift
    assert pd.api.types.is_integer_dtype(got["lsn_b"].dtype), got["lsn_b"].dtype
    # normalize the pandas-reference NaN to NA for value comparison
    want = want.convert_dtypes(dtype_backend="pyarrow")
    got = got.convert_dtypes(dtype_backend="pyarrow")
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


def test_left_join_b_empty_partitions_keep_one_schema(tmp_path):
    """Regression (ADVICE r4): partitions where b has NO rows used to
    build the placeholder frame with object dtypes — per-block schema
    drift in the returned Dataset.  All blocks must share one typed
    Arrow schema, derived from b's committed footer."""
    spec = ChangeLogSpec(n_events=4000, n_keys=300, seed=91)
    a = _mk_lake(tmp_path, "a5", spec)
    da = _df(a)
    keep_repo, keep_path = da.iloc[0][["repo", "path"]]
    # b: the same log filtered to ONE key, so 3 of 4 partitions have no
    # committed state at all and the placeholder-frame path runs
    lb_src = str(tmp_path / "log_a5")
    lb = str(tmp_path / "log_b5")
    import glob

    for f in sorted(glob.glob(os.path.join(lb_src, "**", "*.parquet"),
                              recursive=True)):
        t = pq.read_table(f)
        import pyarrow.compute as pc

        m = pc.and_(pc.equal(t.column("repo"), keep_repo),
                    pc.equal(t.column("path"), keep_path))
        ft = t.filter(m)
        if not len(ft):
            continue
        d = os.path.join(lb, os.path.basename(os.path.dirname(f)))
        os.makedirs(d, exist_ok=True)
        pq.write_table(ft, os.path.join(d, "events.parquet"))
    lake_b = str(tmp_path / "lake_b5")
    replay(lb, lake_b, ReplayConfig(num_partitions=4),
           sink=SinkConfig(out_dir=lake_b, keep_epochs=2))
    ds = join_lakes(a, lake_b, how="left", columns_a=["lsn"],
                    columns_b=["lsn"])
    # single unified Arrow schema across ALL blocks (would raise or
    # show object/float drift pre-fix)
    schemas = {
        str(b.schema)
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=None)
    }
    assert len(schemas) == 1, schemas
    got = ds.to_pandas()
    assert len(got) == len(da)
    assert pd.api.types.is_integer_dtype(got["lsn_b"].dtype)
    hit = got[(got["repo"] == keep_repo) & (got["path"] == keep_path)]
    assert len(hit) == 1 and int(hit["lsn_b"].iloc[0]) == int(hit["lsn"].iloc[0])
    assert got["lsn_b"].isna().sum() == len(da) - 1


def test_sliced_join_bounds_rows_per_task_and_matches(tmp_path):
    """Memory envelope (VERDICT r4 #3): with ``slice_rows`` far below a
    partition's row count the join runs as key-range slices — no task
    ever folds a whole partition — and the result is row-identical to
    the whole-partition path, on plain AND merge-on-read chained lakes,
    clustered or not."""
    spec = ChangeLogSpec(n_events=9000, n_keys=900, seed=97, num_buckets=6)
    # row_group_rows=64 + cluster_by_key give the planner fine-grained,
    # genuinely selective statistics boundaries to slice on
    a = _mk_lake(tmp_path, "a6", spec, parts=2,
                 cluster_by_key=True, row_group_rows=64)
    b = _mk_lake(tmp_path, "b6", spec, parts=2, prefix_buckets=3, mor=True,
                 cluster_by_key=True, row_group_rows=64)
    big = (
        join_lakes(a, b, how="left", columns_a=["lsn"], columns_b=["lsn"],
                   slice_rows=10_000_000)
        .to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    ds = join_lakes(a, b, how="left", columns_a=["lsn"], columns_b=["lsn"],
                    slice_rows=120)
    blocks = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    # truly sliced: many blocks, and each one far below a partition's rows
    assert len(blocks) > 4
    per_part = len(big) / 2
    assert max(len(t) for t in blocks) < per_part
    got = (
        pa.concat_tables([t for t in blocks if len(t)],
                         promote_options="permissive")
        .to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    got = got.convert_dtypes(dtype_backend="pyarrow")
    big2 = big.convert_dtypes(dtype_backend="pyarrow")
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  big2[sorted(big2.columns)],
                                  check_dtype=False)


def test_sliced_join_inner_with_pruned_reads(tmp_path):
    """Inner join under slicing on cluster_by_key lakes (row-group stats
    give the range predicate pruning power) still matches pandas."""
    spec = ChangeLogSpec(n_events=6000, n_keys=600, seed=101)
    log = str(tmp_path / "log_c")
    lake_a = str(tmp_path / "lake_ca")
    lake_b = str(tmp_path / "lake_cb")
    from sql_etl_pipeline_ray.sources.datagen import write_change_log as _w

    _w(spec, log)
    for lk in (lake_a, lake_b):
        replay(log, lk, ReplayConfig(num_partitions=2),
               sink=SinkConfig(out_dir=lk, keep_epochs=2,
                               cluster_by_key=True, row_group_rows=64))
    got = (
        join_lakes(lake_a, lake_b, how="inner", columns_a=["lsn"],
                   columns_b=["lsn"], slice_rows=100)
        .to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    da = _df(lake_a)
    assert len(got) == len(da)
    assert (got["lsn"] == got["lsn_b"]).all()
