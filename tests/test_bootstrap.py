"""Initial-snapshot bootstrap: direct bulk load at a watermark, then
incremental replay on top (pipelines/bootstrap.py)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sql_etl_pipeline_ray.config import ReplayConfig
from sql_etl_pipeline_ray.pipelines.bootstrap import bootstrap_snapshot
from sql_etl_pipeline_ray.pipelines.replay import (
    fsck_lake,
    lake_table,
    replay,
)
from sql_etl_pipeline_ray.state import manifest as mf


def snap_df(n=60, with_lsn=True):
    df = pd.DataFrame(
        {
            "repo": [f"r{i % 3}" for i in range(n)],
            "path": [f"f{i}" for i in range(n)],
            "commit": [f"s{i}" for i in range(n)],
            "lang": ["py"] * n,
            "content": [f"v1-{i}" for i in range(n)],
        }
    )
    if with_lsn:
        df["lsn"] = np.arange(n, dtype=np.int64)
    return df


def write_snap(tmp_path, df, name="snap.parquet"):
    p = str(tmp_path / name)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), p)
    return p


def write_log(tmp_path, rows):
    d = str(tmp_path / "log")
    os.makedirs(d, exist_ok=True)
    df = pd.DataFrame(
        rows, columns=["lsn", "op", "repo", "path", "commit", "lang", "content"]
    )
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False), os.path.join(d, "b0.parquet")
    )
    return d


def test_bootstrap_then_incremental_replay(tmp_path):
    snap = write_snap(tmp_path, snap_df(60))
    lake = str(tmp_path / "lake")
    res = bootstrap_snapshot(snap, lake, snapshot_lsn=60, num_partitions=8)
    assert res.summary["snapshot_rows"] == 60
    assert res.summary["partitions_committed"] == 8  # incl. empty parts
    # all 8 partitions carry the snapshot checkpoint
    assert set(mf.checkpoints(mf.read_all_manifests(lake)).values()) == {60}
    log = write_log(
        tmp_path,
        [(61, "U", "r0", "f0", "c", "py", "v2-0"),
         (62, "D", "r1", "f1", None, None, None),
         (63, "I", "r9", "f999", "c", "py", "new")],
    )
    replay(log, lake, ReplayConfig(num_partitions=8), resume=True)
    t = lake_table(lake).to_pandas().set_index("path")
    assert len(t) == 60  # -1 delete +1 insert
    assert t.loc["f0", "content"] == "v2-0" and t.loc["f0", "lsn"] == 61
    assert "f1" not in t.index
    assert t.loc["f999", "content"] == "new"
    # untouched keys keep their snapshot content AND source position
    assert t.loc["f59", "content"] == "v1-59" and t.loc["f59", "lsn"] == 59
    assert fsck_lake(lake)["ok"]


def test_bootstrap_synthetic_positions_globally_unique(tmp_path):
    snap = write_snap(tmp_path, snap_df(60, with_lsn=False))
    lake = str(tmp_path / "lake")
    bootstrap_snapshot(snap, lake, snapshot_lsn=5000, num_partitions=4)
    t = lake_table(lake).to_pandas()
    assert len(t) == 60
    assert t["lsn"].is_unique and t["lsn"].max() <= 5000


def test_bootstrap_rejects_duplicate_keys(tmp_path):
    df = snap_df(20)
    df.loc[1, ["repo", "path"]] = ["r0", "f0"]
    snap = write_snap(tmp_path, df)
    with pytest.raises(Exception, match="duplicate key"):
        bootstrap_snapshot(snap, str(tmp_path / "lake"), snapshot_lsn=20,
                           num_partitions=4)


def test_bootstrap_rejects_positions_above_watermark(tmp_path):
    df = snap_df(20)
    df.loc[3, "lsn"] = 999
    snap = write_snap(tmp_path, df)
    with pytest.raises(Exception, match="snapshot_lsn"):
        bootstrap_snapshot(snap, str(tmp_path / "lake"), snapshot_lsn=20,
                           num_partitions=4)


def test_bootstrap_refuses_nonempty_lake(tmp_path):
    snap = write_snap(tmp_path, snap_df(10))
    lake = str(tmp_path / "lake")
    bootstrap_snapshot(snap, lake, snapshot_lsn=10, num_partitions=2)
    with pytest.raises(ValueError, match="already has committed state"):
        bootstrap_snapshot(snap, lake, snapshot_lsn=10, num_partitions=2)


def test_bootstrap_extra_columns_flow_to_lake(tmp_path):
    df = snap_df(10)
    df["size_bytes"] = np.arange(10, dtype=np.int64) * 7
    snap = write_snap(tmp_path, df)
    lake = str(tmp_path / "lake")
    bootstrap_snapshot(snap, lake, snapshot_lsn=10, num_partitions=2)
    t = lake_table(lake).to_pandas().set_index("path")
    assert t.loc["f3", "size_bytes"] == 21
    # sha256 computed over snapshot content
    import hashlib

    assert t.loc["f3", "content_sha256"] == hashlib.sha256(b"v1-3").hexdigest()
