"""Incremental view maintenance over the before/after-image changefeed.

Pins the IVM invariant MV(E2) = MV(E1) ⊕ delta(changefeed(E1→E2)) equal
to a full recompute at E2, and the `include_before` feed contract
(prev_* = from-epoch values; null for I / main values null for D).
"""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sql_etl_pipeline_ray.config import ReplayConfig, SinkConfig
from sql_etl_pipeline_ray.pipelines.ivm import (
    apply_delta,
    changefeed_delta,
    mv_repo_stats_incremental,
    repo_stats,
)
from sql_etl_pipeline_ray.pipelines.replay import (
    lake_diff,
    lake_table,
    read_lake,
    replay,
)
from sql_etl_pipeline_ray.sources.datagen import ChangeLogSpec, write_change_log
from sql_etl_pipeline_ray.state import manifest as mf

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def two_epoch_lake(tmp_path_factory):
    """Datagen log (random I/U/D mix) replayed in two halves."""
    import glob
    import shutil

    base = tmp_path_factory.mktemp("ivm")
    log = str(base / "log")
    write_change_log(
        ChangeLogSpec(n_keys=180, n_events=1400, num_buckets=6), log
    )
    partial = str(base / "partial")
    os.makedirs(partial)
    for k in range(3):
        shutil.copytree(
            os.path.join(log, f"lsn_bucket={k}"),
            os.path.join(partial, f"lsn_bucket={k}"),
        )
    out = str(base / "lake")
    sink = SinkConfig(out_dir=out, keep_epochs=4)
    replay(partial, out, ReplayConfig(num_partitions=5), sink=sink)
    e1 = max(m["epoch"] for m in mf.read_all_manifests(out).values())
    replay(log, out, ReplayConfig(num_partitions=5), sink=sink, resume=True)
    return out, e1


def test_include_before_feed_contract(two_epoch_lake):
    out, e1 = two_epoch_lake
    snap0 = (
        lake_table(out, asof_epoch=e1).to_pandas().set_index(["repo", "path"])
    )
    snap1 = lake_table(out).to_pandas().set_index(["repo", "path"])
    feed = lake_diff(out, from_epoch=e1, include_before=True).to_pandas()
    assert len(feed)
    assert {"prev_lsn", "prev_content"} <= set(feed.columns)
    seen_ops = set(feed["op"])
    assert "U" in seen_ops  # the mix must actually exercise updates
    for _, r in feed.iterrows():
        key = (r["repo"], r["path"])
        if r["op"] == "I":
            assert pd.isna(r["prev_lsn"]) and pd.isna(r["prev_content"])
            assert r["content"] == snap1.loc[key, "content"]
            assert key not in snap0.index
        elif r["op"] == "U":
            assert r["prev_lsn"] == snap0.loc[key, "lsn"]
            assert r["prev_content"] == snap0.loc[key, "content"]
            assert r["lsn"] == snap1.loc[key, "lsn"]
            assert r["content"] == snap1.loc[key, "content"]
        else:  # D: key gone from snap1; before-image carries the old row
            assert pd.isna(r["lsn"]) and pd.isna(r["content"])
            assert r["prev_lsn"] == snap0.loc[key, "lsn"]
            assert r["prev_content"] == snap0.loc[key, "content"]
            assert key not in snap1.index


def test_ivm_matches_full_recompute_on_random_mix(two_epoch_lake):
    """The real IVM invariant, over a feed with all three ops."""
    out, e1 = two_epoch_lake
    mv1 = repo_stats(read_lake(out, asof_epoch=e1))
    feed = lake_diff(out, from_epoch=e1, include_before=True)
    got = (
        apply_delta(mv1, changefeed_delta(feed))
        .to_pandas()
        .sort_values("repo")
        .reset_index(drop=True)
    )
    want = (
        repo_stats(read_lake(out))
        .to_pandas()
        .sort_values("repo")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_mv_repo_stats_incremental_oracle(tmp_path):
    import duckdb

    got = mv_repo_stats_incremental(SF_DIR, work_dir=str(tmp_path / "w"))
    want = duckdb.sql(
        f"""
        SELECT source AS repo, COUNT(*)::BIGINT AS n_files,
               SUM(strlen(text) + 7)::BIGINT AS total_bytes
        FROM read_parquet('{SF_DIR}/documents.parquet')
        WHERE doc_id % 10 <> 0 GROUP BY source ORDER BY repo
        """
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_mv_drops_fully_deleted_repo(tmp_path):
    """A repo whose last file is deleted must vanish from the maintained
    view, exactly as it would from a recompute."""
    log1 = str(tmp_path / "log" / "b1")
    log2 = str(tmp_path / "log" / "b2")
    os.makedirs(log1)
    os.makedirs(log2)

    def ev(lsn, op, repo, path, content):
        return {
            "lsn": lsn, "op": op, "repo": repo, "path": path,
            "commit": f"c{lsn}", "lang": "py", "content": content,
        }

    pq.write_table(
        pa.Table.from_pylist(
            [
                ev(1, "I", "gone", "a.py", "x" * 10),
                ev(2, "I", "stay", "b.py", "y" * 20),
            ]
        ),
        os.path.join(log1, "part-0.parquet"),
    )
    pq.write_table(
        pa.Table.from_pylist(
            [
                ev(3, "D", "gone", "a.py", None),
                ev(4, "U", "stay", "b.py", "z" * 5),
            ]
        ),
        os.path.join(log2, "part-0.parquet"),
    )
    out = str(tmp_path / "lake")
    sink = SinkConfig(out_dir=out, keep_epochs=3)
    cfg = ReplayConfig(num_partitions=2)
    replay(log1, out, cfg, sink=sink)
    e1 = max(m["epoch"] for m in mf.read_all_manifests(out).values())
    mv1 = repo_stats(read_lake(out))
    replay(str(tmp_path / "log"), out, cfg, sink=sink, resume=True)
    feed = lake_diff(out, from_epoch=e1, include_before=True)
    got = (
        apply_delta(mv1, changefeed_delta(feed))
        .to_pandas()
        .sort_values("repo")
        .reset_index(drop=True)
    )
    assert list(got["repo"]) == ["stay"]
    assert got.loc[0, "n_files"] == 1
    assert got.loc[0, "total_bytes"] == 5
