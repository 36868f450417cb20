"""Content side-store log layout (ChangeLogSpec.layout="sidestore"):
meta files + lsn-sorted content siblings, late-materialized phase 2."""

from __future__ import annotations

import glob
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from sql_etl_pipeline_ray.config import ReplayConfig, SinkConfig
from sql_etl_pipeline_ray.pipelines.replay import lake_table, replay
from sql_etl_pipeline_ray.sources.change_log import (
    read_change_log,
    scan_change_log,
)
from sql_etl_pipeline_ray.sources.datagen import (
    ChangeLogSpec,
    generate_change_log,
    replay_oracle,
    write_change_log,
)


def _state(lake):
    return (
        lake_table(lake)
        .to_pandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )


def test_sidestore_layout_and_scan(tmp_path):
    spec = ChangeLogSpec(n_events=8000, n_keys=500, seed=5, layout="sidestore")
    log = str(tmp_path / "log")
    write_change_log(spec, log)
    metas = sorted(glob.glob(os.path.join(log, "**", "events.parquet"),
                             recursive=True))
    sides = sorted(glob.glob(os.path.join(log, "**", "*.content.parquet"),
                             recursive=True))
    assert len(metas) == spec.num_buckets == len(sides)
    # meta has no content, has the nullity marker; sibling is lsn-sorted
    ms = pq.ParquetFile(metas[0]).schema_arrow
    assert "content" not in ms.names and "content_null" in ms.names
    ct = pq.read_table(sides[0])
    lsn = ct.column("lsn").to_numpy()
    assert (lsn[1:] >= lsn[:-1]).all() and ct.column("content").null_count == 0
    scan = scan_change_log(log)
    assert set(scan.side_content) == set(metas)
    assert "content" in scan.schema.names
    assert "content_null" not in scan.schema.names
    with pytest.raises(ValueError, match="side-store"):
        read_change_log(scan)


def test_sidestore_replay_matches_inline_and_oracle(tmp_path):
    kw = dict(n_events=20000, n_keys=1200, seed=9, delete_frac=0.12)
    inline, side = ChangeLogSpec(**kw), ChangeLogSpec(**kw, layout="sidestore")
    li, ls = str(tmp_path / "li"), str(tmp_path / "ls")
    write_change_log(inline, li)
    write_change_log(side, ls)
    lake_i, lake_s = str(tmp_path / "lakei"), str(tmp_path / "lakes")
    replay(li, lake_i, ReplayConfig(num_partitions=8))
    r = replay(ls, lake_s, ReplayConfig(num_partitions=8))
    a, b = _state(lake_i), _state(lake_s)
    pd.testing.assert_frame_equal(a, b)
    want = (
        replay_oracle(generate_change_log(inline))
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        b[sorted(b.columns)], want[sorted(want.columns)]
    )
    # late-materialization receipts present and honest
    s = r.summary
    assert 0 < s["p2_content_bytes_read"] <= s["p2_content_bytes_total"]


def test_sidestore_resume_and_schema_evolution(tmp_path):
    spec = ChangeLogSpec(n_events=12000, n_keys=800, seed=13, num_buckets=6,
                         evolve_after_frac=0.5, layout="sidestore")
    log = str(tmp_path / "log")
    files = write_change_log(spec, log)
    sub = str(tmp_path / "sub")
    os.makedirs(sub)
    for f in sorted(files)[:3]:
        d = os.path.join(sub, os.path.basename(os.path.dirname(f)))
        os.makedirs(d)
        os.link(f, os.path.join(d, "events.parquet"))
        os.link(f[:-len(".parquet")] + ".content.parquet",
                os.path.join(d, "events.content.parquet"))
    lr = str(tmp_path / "lr")
    replay(sub, lr, ReplayConfig(num_partitions=8))
    replay(log, lr, ReplayConfig(num_partitions=8), resume=True)
    l1 = str(tmp_path / "l1")
    replay(log, l1, ReplayConfig(num_partitions=8))
    pd.testing.assert_frame_equal(_state(lr), _state(l1))
    assert "size_bytes" in _state(l1).columns  # evolution came through
    want = (
        replay_oracle(generate_change_log(spec))
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )
    got = _state(l1)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False,
    )


def test_sidestore_reject_policy_and_quarantine(tmp_path):
    import numpy as np
    import pyarrow as pa

    spec = ChangeLogSpec(n_events=4000, n_keys=300, seed=21,
                         layout="sidestore")
    log = str(tmp_path / "log")
    write_change_log(spec, log)
    with pytest.raises(ValueError, match="side-store"):
        replay(log, str(tmp_path / "x"),
               ReplayConfig(num_partitions=4, content_sidestore="reject"))
    # dirty side-store log: an I event whose content is null -> meta
    # content_null captures it; quarantine records the reject
    bad = pa.table({
        "lsn": pa.array([10_000_000], pa.int64()),
        "op": pa.array(["I"]),
        "repo": pa.array(["r"]),
        "path": pa.array(["bad.py"]),
        "commit": pa.array(["c"]),
        "lang": pa.array(["x"]),
        "content_null": pa.array([True]),
    })
    d = os.path.join(log, "lsn_bucket=99")
    os.makedirs(d)
    pq.write_table(bad, os.path.join(d, "events.parquet"))
    pq.write_table(
        pa.table({"lsn": pa.array([], pa.int64()),
                  "content": pa.array([], pa.string())}),
        os.path.join(d, "events.content.parquet"),
    )
    qdir = str(tmp_path / "quarantine")
    lake = str(tmp_path / "lake")
    r = replay(log, lake, ReplayConfig(num_partitions=4, quarantine_dir=qdir))
    assert r.summary["events_rejected"] == 1
    cap = pq.read_table(glob.glob(os.path.join(qdir, "*.parquet"))[0])
    assert cap.num_rows == 1
    assert "bad.py" in cap.column("path").to_pylist()
    # the good rows still committed exactly
    want = (
        replay_oracle(generate_change_log(spec))
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )
    got = _state(lake)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)]
    )


def test_random_partial_conversion_property(tmp_path):
    """Property: converting ANY subset of a log's files to the side-store
    layout leaves the replay result identical (mixed-layout logs are the
    normal state of an in-progress migration)."""
    import numpy as np

    from sql_etl_pipeline_ray.pipelines.logtools import _convert_one
    from sql_etl_pipeline_ray.sources.datagen import replay_oracle

    rng = np.random.default_rng(71)
    spec = ChangeLogSpec(n_events=9000, n_keys=500, seed=61, num_buckets=6,
                         delete_frac=0.1)
    want = (
        replay_oracle(generate_change_log(spec))
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )
    for case in range(3):
        log = str(tmp_path / f"log{case}")
        files = write_change_log(spec, log)
        pick = [f for f in files if rng.random() < 0.5]
        for f in pick:
            _convert_one(f, 131_072, 512)
        lake = str(tmp_path / f"lake{case}")
        replay(log, lake, ReplayConfig(num_partitions=4))
        got = _state(lake)
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], want[sorted(want.columns)]
        )


def test_statless_content_row_groups_fetched_and_fscked(tmp_path):
    """Regression (ADVICE r4): a content sibling whose row groups lack
    lsn statistics (foreign writer via convert_log_to_sidestore) must be
    fetched unconditionally — silently skipping it hands winners NULL
    content — and fsck_sidestore_log must surface the missing stats."""
    from sql_etl_pipeline_ray.pipelines.logtools import fsck_sidestore_log

    kw = dict(n_events=6000, n_keys=400, seed=21, delete_frac=0.1)
    inline, side = ChangeLogSpec(**kw), ChangeLogSpec(**kw, layout="sidestore")
    li, ls = str(tmp_path / "li"), str(tmp_path / "ls")
    write_change_log(inline, li)
    write_change_log(side, ls)
    # strip statistics from every content sibling, preserving sort + rows
    for sib in glob.glob(os.path.join(ls, "**", "*.content.parquet"),
                         recursive=True):
        t = pq.read_table(sib)
        pq.write_table(t, sib, row_group_size=256, write_statistics=False)
    scan = scan_change_log(ls)
    assert all(
        lo is None
        for s in scan.side_content.values()
        for lo, _hi in s["rg_lsn"]
    )
    lake_i, lake_s = str(tmp_path / "lakei"), str(tmp_path / "lakes")
    replay(li, lake_i, ReplayConfig(num_partitions=4))
    replay(ls, lake_s, ReplayConfig(num_partitions=4))
    a, b = _state(lake_i), _state(lake_s)
    assert b["content"].notna().all()
    pd.testing.assert_frame_equal(a, b)
    rep = fsck_sidestore_log(ls)
    assert not rep["ok"]
    assert any("lsn statistics" in e
               for errs in rep["errors"].values() for e in errs)


def test_convert_compact_crash_composition_property(tmp_path, monkeypatch):
    """Property (VERDICT r4 #8): random interleavings of convert →
    log-compaction → partial re-convert → replay, with crashes injected
    BETWEEN a conversion's two file renames, always replay to the exact
    inline-layout oracle state.  Also pins the rename ORDER: a crash
    window must leave the inline file intact (stray sibling), never a
    content-less meta (data loss)."""
    import numpy as np

    from sql_etl_pipeline_ray.pipelines.logtools import (
        _convert_one,
        compact_change_log,
        convert_log_to_sidestore,
    )

    spec = ChangeLogSpec(n_events=8000, n_keys=450, seed=67, num_buckets=6,
                         delete_frac=0.12)
    want = (
        replay_oracle(generate_change_log(spec))
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )

    def crash_convert(f, when):
        """Run one conversion that dies between (when=2) or before
        (when=1) its renames."""
        calls = {"n": 0}
        real = os.replace

        def bomb(src, dst):
            calls["n"] += 1
            if calls["n"] >= when:
                raise RuntimeError("injected crash between renames")
            return real(src, dst)

        monkeypatch.setattr(os, "replace", bomb)
        try:
            with pytest.raises(RuntimeError, match="injected crash"):
                _convert_one(f, 131_072, 256)
        finally:
            monkeypatch.setattr(os, "replace", real)

    for case in range(3):
        rng = np.random.default_rng(500 + case)
        log = str(tmp_path / f"log{case}")
        write_change_log(spec, log)
        for rnd in range(2):
            files = sorted(
                f
                for f in glob.glob(os.path.join(log, "**", "*.parquet"),
                                   recursive=True)
                if not f.endswith(".content.parquet")
            )
            inline = [
                f for f in files
                if "content" in pq.read_schema(f).names
            ]
            # crash some conversions mid-flight
            for f in inline:
                r = rng.random()
                if r < 0.25:
                    crash_convert(f, when=1 + int(rng.random() < 0.5))
                    # the inline file must still carry its content: the
                    # crash may leave a stray sibling, never a torn meta
                    assert "content" in pq.read_schema(f).names
                elif r < 0.6:
                    _convert_one(f, 131_072, 256)
            # the mixed log must scan clean and replay exactly
            scan = scan_change_log(log)
            # log compaction is inline-only by contract ("convert AFTER
            # compacting") — compose it whenever the log is still inline
            if not scan.side_content and rng.random() < 0.7:
                nxt = str(tmp_path / f"log{case}_r{rnd}")
                compact_change_log(log, nxt, keep_tombstones=True)
                log = nxt
        # converge any half-converted state, then randomly re-convert all
        if rng.random() < 0.5:
            convert_log_to_sidestore(log)
        lake = str(tmp_path / f"lake{case}")
        replay(log, lake, ReplayConfig(num_partitions=4))
        got = _state(lake)
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], want[sorted(want.columns)]
        )
