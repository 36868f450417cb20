"""Multi-source fan-in replay: composite (lsn, source) LWW order, persisted
tombstones, vector-clock resume, tombstone GC, and the guards."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sql_etl_pipeline_ray.config import ReplayConfig, SinkConfig
from sql_etl_pipeline_ray.pipelines.fanin import (
    composite_lsn,
    gc_tombstones,
    read_fanin_manifest,
    replay_fanin,
    tombstone_gc_threshold,
)
from sql_etl_pipeline_ray.pipelines.replay import (
    fsck_lake,
    lake_table,
    read_lake,
    replay,
    rescale_lake,
)

COLS = ["lsn", "op", "repo", "path", "commit", "lang", "content"]


def write_bucket(d, name, rows):
    os.makedirs(os.path.join(d, name), exist_ok=True)
    df = pd.DataFrame(rows, columns=COLS)
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        os.path.join(d, name, "events.parquet"),
    )


def pandas_fanin_oracle(source_events: list[list[tuple]]) -> pd.DataFrame:
    """Single-process fold under the composite (lsn, source_idx) order."""
    k = len(source_events)
    rows = []
    for idx, evs in enumerate(source_events):
        for r in evs:
            d = dict(zip(COLS, r))
            d["lsn"] = composite_lsn(d["lsn"], idx, k)
            rows.append(d)
    df = pd.DataFrame(rows).sort_values("lsn")
    latest = df.groupby(["repo", "path"], as_index=False).last()
    live = latest[latest["op"] != "D"]
    return (
        live[["repo", "path", "content", "lsn"]]
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )


def lake_live(lake) -> pd.DataFrame:
    t = lake_table(lake).to_pandas()
    return (
        t[["repo", "path", "content", "lsn"]]
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )


def two_source_logs(tmp_path, n_keys=40):
    """Overlapping key space with cross-source ties:
    src a: I@3d+1 (all), D@3d+3 (d%5==0)
    src b: U@3d+2 (all), U@3d+3 (d%4==0)  — same SOURCE lsn as a's D for
    d%20==0: composite tiebreak (b wins, key survives)."""
    A, B = str(tmp_path / "srcA"), str(tmp_path / "srcB")
    ev_a, ev_b = [], []
    for d in range(n_keys):
        key = f"k{d:03d}"
        ev_a.append((3 * d + 1, "I", "r0", key, f"ca{d}", "py", f"a{d}"))
        if d % 5 == 0:
            ev_a.append((3 * d + 3, "D", "r0", key, None, None, None))
        ev_b.append((3 * d + 2, "U", "r0", key, f"cb{d}", "py", f"b{d}"))
        if d % 4 == 0:
            ev_b.append((3 * d + 3, "U", "r0", key, f"cb2{d}", "py", f"b2-{d}"))
    write_bucket(A, "lsn_bucket=0", [e for e in ev_a if e[0] <= 3 * n_keys // 2])
    write_bucket(A, "lsn_bucket=1", [e for e in ev_a if e[0] > 3 * n_keys // 2])
    write_bucket(B, "lsn_bucket=0", [e for e in ev_b if e[0] <= 3 * n_keys // 2])
    write_bucket(B, "lsn_bucket=1", [e for e in ev_b if e[0] > 3 * n_keys // 2])
    return A, B, [ev_a, ev_b]


def test_one_shot_matches_pandas_oracle(tmp_path):
    A, B, evs = two_source_logs(tmp_path)
    lake = str(tmp_path / "lake")
    res = replay_fanin([A, B], lake, ReplayConfig(num_partitions=4),
                       source_names=["a", "b"])
    assert res.summary["fanin_sources"] == 2
    got = lake_live(lake)
    want = pandas_fanin_oracle(evs)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # cross-source tie at equal source-LSN: b (idx 1) out-ranks a (idx 0),
    # so every d%20==0 key SURVIVES a's delete with b's second content
    assert got[got["path"] == "k000"]["content"].iloc[0] == "b2-0"
    # lineage column rides along
    full = lake_table(lake).to_pandas()
    assert set(full["source"]) <= {"a", "b"}


def test_incremental_rounds_equal_oneshot(tmp_path):
    A, B, evs = two_source_logs(tmp_path)
    # one-shot reference
    lake1 = str(tmp_path / "lake_oneshot")
    replay_fanin([A, B], lake1, ReplayConfig(num_partitions=4),
                 source_names=["a", "b"])
    # incremental: feed A bucket 0 + B bucket 0, then the rest
    A2, B2 = str(tmp_path / "srcA2"), str(tmp_path / "srcB2")
    for src, dst in ((A, A2), (B, B2)):
        os.makedirs(dst, exist_ok=True)
        os.symlink(
            os.path.join(src, "lsn_bucket=0"), os.path.join(dst, "lsn_bucket=0")
        )
    lake2 = str(tmp_path / "lake_inc")
    replay_fanin([A2, B2], lake2, ReplayConfig(num_partitions=4),
                 source_names=["a", "b"])
    for src, dst in ((A, A2), (B, B2)):
        os.symlink(
            os.path.join(src, "lsn_bucket=1"), os.path.join(dst, "lsn_bucket=1")
        )
    replay_fanin([A2, B2], lake2, ReplayConfig(num_partitions=4),
                 source_names=["a", "b"])
    pd.testing.assert_frame_equal(lake_live(lake1), lake_live(lake2))


def test_late_arrival_below_watermark(tmp_path):
    """The case scalar-watermark resume CANNOT do: a lagging source
    delivers events below another source's committed composite LSN —
    a late update for a deleted key must lose to the tombstone, and a
    late insert for an untouched key must still appear."""
    A, B = str(tmp_path / "srcA"), str(tmp_path / "srcB")
    write_bucket(A, "lsn_bucket=0", [(1, "I", "r", "k1", "c", "py", "a1")])
    # B races ahead: delete k1 at B-lsn 9 (composite 19), insert k9
    write_bucket(B, "lsn_bucket=0", [
        (8, "I", "r", "k9", "c", "py", "b9"),
        (9, "D", "r", "k1", None, None, None),
    ])
    lake = str(tmp_path / "lake")
    replay_fanin([A, B], lake, ReplayConfig(num_partitions=2),
                 source_names=["a", "b"])
    # A catches up with LOW source-LSNs (composite 4 and 6 < 19)
    write_bucket(A, "lsn_bucket=1", [
        (2, "U", "r", "k1", "c", "py", "late-update"),   # must stay deleted
        (3, "I", "r", "k2", "c", "py", "late-insert"),   # must appear
    ])
    replay_fanin([A, B], lake, ReplayConfig(num_partitions=2),
                 source_names=["a", "b"])
    live = lake_live(lake)
    assert set(live["path"]) == {"k2", "k9"}
    tomb = lake_table(lake, include_tombstones=True).to_pandas()
    k1 = tomb[tomb["path"] == "k1"]
    assert list(k1["op"]) == ["D"] and k1["content"].isna().all()


def test_crash_window_rerun_is_idempotent(tmp_path):
    """Crash between replay-commit and fan-in-manifest write: rolling the
    manifest back and re-running the round must reproduce the same lake."""
    A, B, _ = two_source_logs(tmp_path)
    lake = str(tmp_path / "lake")
    replay_fanin([A, B], lake, ReplayConfig(num_partitions=4),
                 source_names=["a", "b"])
    before = read_fanin_manifest(lake)
    want = lake_live(lake)
    # simulate the crash: forget one of b's applied buckets
    import json

    rolled = dict(before)
    rolled["applied"] = {
        s: [b for b in bs if not (s == "b" and b.endswith("=1/events.parquet"))]
        for s, bs in before["applied"].items()
    }
    with open(os.path.join(lake, "_fanin.json"), "w") as f:
        json.dump(rolled, f)
    res = replay_fanin([A, B], lake, ReplayConfig(num_partitions=4),
                       source_names=["a", "b"])
    assert res is not None  # the round re-ran
    pd.testing.assert_frame_equal(lake_live(lake), want)
    assert read_fanin_manifest(lake)["applied"] == before["applied"]


def test_gc_tombstones_and_threshold(tmp_path):
    A, B, _ = two_source_logs(tmp_path)
    lake = str(tmp_path / "lake")
    replay_fanin([A, B], lake, ReplayConfig(num_partitions=4),
                 source_names=["a", "b"])
    tomb_before = lake_table(lake, include_tombstones=True).to_pandas()
    n_tomb = (tomb_before["op"] == "D").sum()
    assert n_tomb > 0
    live_before = lake_live(lake)
    thr = tombstone_gc_threshold(lake)
    out = gc_tombstones(lake)
    assert out["threshold"] == thr
    assert out["tombstones_dropped"] == n_tomb  # all below threshold here
    after = lake_table(lake, include_tombstones=True).to_pandas()
    assert (after["op"] == "D").sum() == 0
    pd.testing.assert_frame_equal(lake_live(lake), live_before)
    # fsck still clean after the GC rewrite (manifest CAS, digest, sha)
    rep = fsck_lake(lake, deep=True)
    assert rep["issues"] == [], rep["issues"]


def test_fsck_deep_clean_on_tombstone_lake(tmp_path):
    A, B, _ = two_source_logs(tmp_path)
    lake = str(tmp_path / "lake")
    replay_fanin([A, B], lake, ReplayConfig(num_partitions=4),
                 source_names=["a", "b"])
    rep = fsck_lake(lake, deep=True)
    assert rep["issues"] == [], rep["issues"]


def test_guards(tmp_path):
    A, B, _ = two_source_logs(tmp_path)
    lake = str(tmp_path / "lake")
    replay_fanin([A, B], lake, ReplayConfig(num_partitions=4),
                 source_names=["a", "b"])
    # sticky source list
    with pytest.raises(ValueError, match="sticky"):
        replay_fanin([B, A], lake, source_names=["b", "a"])
    # resume must keep the tombstone setting
    with pytest.raises(ValueError, match="keep_tombstones"):
        replay(A, lake, ReplayConfig(num_partitions=4), resume=True)
    # rescale refuses tombstone lakes
    with pytest.raises(ValueError, match="tombstone"):
        rescale_lake(lake, str(tmp_path / "lake2"), 8)


def test_read_lake_filter_composes_with_tombstone_filter(tmp_path):
    A, B, _ = two_source_logs(tmp_path)
    lake = str(tmp_path / "lake")
    replay_fanin([A, B], lake, ReplayConfig(num_partitions=4),
                 source_names=["a", "b"])
    import pyarrow.dataset as pads

    got = read_lake(lake, filter=pads.field("path") == "k001").to_pandas()
    assert list(got["path"].unique()) == ["k001"]
    assert (got["op"] != "D").all()
    cols = read_lake(lake, columns=["repo", "path"]).schema().names
    assert cols == ["repo", "path"]
    n_live = read_lake(lake).count()
    n_all = read_lake(lake, include_tombstones=True).count()
    assert n_all > n_live
