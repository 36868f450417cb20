"""Log maintenance tools (pipelines/logtools.py): in-place side-store
conversion and Kafka-style log compaction."""

from __future__ import annotations

import glob
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from sql_etl_pipeline_ray.config import ReplayConfig
from sql_etl_pipeline_ray.pipelines.logtools import (
    compact_change_log,
    convert_log_to_sidestore,
)
from sql_etl_pipeline_ray.pipelines.replay import lake_table, replay
from sql_etl_pipeline_ray.sources.change_log import scan_change_log
from sql_etl_pipeline_ray.sources.datagen import (
    ChangeLogSpec,
    generate_change_log,
    replay_oracle,
    write_change_log,
)


def _state(lake):
    df = lake_table(lake).to_pandas()
    return df.sort_values(["repo", "path"]).reset_index(drop=True)


def _oracle_state(spec):
    return (
        replay_oracle(generate_change_log(spec))
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )


def test_convert_to_sidestore_replays_identically(tmp_path):
    spec = ChangeLogSpec(n_events=15000, n_keys=900, seed=31)
    log = str(tmp_path / "log")
    write_change_log(spec, log)
    base = str(tmp_path / "base")
    replay(log, base, ReplayConfig(num_partitions=8))
    r = convert_log_to_sidestore(log)
    assert r["files_converted"] == spec.num_buckets and r["files_skipped"] == 0
    assert r["events"] == spec.n_events
    scan = scan_change_log(log)
    assert len(scan.side_content) == spec.num_buckets
    conv = str(tmp_path / "conv")
    res = replay(log, conv, ReplayConfig(num_partitions=8))
    pd.testing.assert_frame_equal(_state(base), _state(conv))
    assert 0 < res.summary["p2_content_bytes_read"] <= res.summary[
        "p2_content_bytes_total"
    ]
    # idempotent: a re-run skips every file
    r2 = convert_log_to_sidestore(log)
    assert r2["files_converted"] == 0 and r2["files_skipped"] == spec.num_buckets


def test_mixed_layout_log_replays(tmp_path):
    """A crash mid-conversion leaves inline + side-store files side by
    side; the scan and both replay phases handle the mix."""
    spec = ChangeLogSpec(n_events=8000, n_keys=600, seed=37, num_buckets=4)
    log = str(tmp_path / "log")
    files = write_change_log(spec, log)
    from sql_etl_pipeline_ray.pipelines.logtools import _convert_one

    for f in sorted(files)[:2]:
        _convert_one(f, 131_072, 1024)
    scan = scan_change_log(log)
    assert len(scan.side_content) == 2
    lake = str(tmp_path / "lake")
    replay(log, lake, ReplayConfig(num_partitions=4))
    got = _state(lake)
    want = _oracle_state(spec)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)]
    )


def test_compaction_replays_to_same_lake(tmp_path):
    spec = ChangeLogSpec(n_events=20000, n_keys=1000, seed=41,
                         delete_frac=0.15)
    log, comp = str(tmp_path / "log"), str(tmp_path / "comp")
    write_change_log(spec, log)
    r = compact_change_log(log, comp, num_partitions=6)
    assert r["events_in"] == spec.n_events
    # one winning event per key ever touched
    assert r["events_out"] <= spec.n_keys
    base, lake = str(tmp_path / "base"), str(tmp_path / "lake")
    replay(log, base, ReplayConfig(num_partitions=8))
    replay(comp, lake, ReplayConfig(num_partitions=8))
    pd.testing.assert_frame_equal(_state(base), _state(lake))
    # tombstone-free variant: same live state on a fresh lake, fewer rows
    comp2, lake2 = str(tmp_path / "comp2"), str(tmp_path / "lake2")
    r2 = compact_change_log(log, comp2, keep_tombstones=False,
                            num_partitions=6)
    assert r2["events_out"] < r["events_out"]
    replay(comp2, lake2, ReplayConfig(num_partitions=8))
    pd.testing.assert_frame_equal(_state(base), _state(lake2))


def test_compaction_then_sidestore_composes(tmp_path):
    spec = ChangeLogSpec(n_events=9000, n_keys=700, seed=43)
    log, comp = str(tmp_path / "log"), str(tmp_path / "comp")
    write_change_log(spec, log)
    compact_change_log(log, comp, num_partitions=4)
    convert_log_to_sidestore(comp)
    lake = str(tmp_path / "lake")
    replay(comp, lake, ReplayConfig(num_partitions=4))
    got, want = _state(lake), _oracle_state(spec)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)]
    )


def test_compaction_refuses_patch_logs(tmp_path):
    spec = ChangeLogSpec(n_events=4000, n_keys=300, seed=47, patch_frac=0.3)
    log = str(tmp_path / "log")
    write_change_log(spec, log)
    with pytest.raises(ValueError, match="partial updates"):
        compact_change_log(log, str(tmp_path / "c"))


def test_fsck_sidestore_log(tmp_path):
    from sql_etl_pipeline_ray.pipelines.logtools import fsck_sidestore_log

    spec = ChangeLogSpec(n_events=6000, n_keys=400, seed=53,
                         layout="sidestore", num_buckets=3)
    log = str(tmp_path / "log")
    write_change_log(spec, log)
    r = fsck_sidestore_log(log)
    assert r["ok"] and r["files_checked"] == 3
    assert r["orphan_content_rows"] == 0
    # corrupt one sibling: drop its last row group's rows
    sib = sorted(glob.glob(os.path.join(log, "**", "*.content.parquet"),
                           recursive=True))[0]
    t = pq.read_table(sib)
    pq.write_table(t.slice(0, max(1, len(t) - 50)), sib)
    r2 = fsck_sidestore_log(log)
    assert not r2["ok"]
    msg = next(iter(r2["errors"].values()))[0]
    assert "sibling has no row" in msg
    # a missing sibling is a hard error too
    os.remove(sib)
    # scan_change_log raises on missing siblings before fsck can run
    with pytest.raises(ValueError, match="no content sibling"):
        fsck_sidestore_log(log)


def test_compaction_rerun_requires_overwrite(tmp_path):
    spec = ChangeLogSpec(n_events=3000, n_keys=200, seed=97)
    log, comp = str(tmp_path / "log"), str(tmp_path / "comp")
    write_change_log(spec, log)
    r1 = compact_change_log(log, comp, num_partitions=2)
    with pytest.raises(ValueError, match="overwrite"):
        compact_change_log(log, comp, num_partitions=2)
    r2 = compact_change_log(log, comp, num_partitions=2, overwrite=True)
    assert r2["events_out"] == r1["events_out"]  # replaced, not appended
