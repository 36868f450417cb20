"""Merge-on-read delta commits (``SinkConfig.merge_on_read``).

The contract under test: an incremental replay that commits delta files
chained onto the partition's committed state is READ-EQUIVALENT to the
copy-on-write lake — row for row, sha256 for sha256 — while writing only
O(increment) bytes; compaction (inline via ``max_delta_files`` or
standalone ``compact_lake``) folds chains back to plain base files with
no visible change to readers.
"""

import glob
import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sql_etl_pipeline_ray.config import ReplayConfig, SinkConfig
from sql_etl_pipeline_ray.pipelines.replay import (
    compact_lake,
    fsck_lake,
    lake_diff,
    lake_get,
    lake_table,
    read_lake,
    read_lake_with_pending,
    replay,
)
from sql_etl_pipeline_ray.sources.datagen import (
    ChangeLogSpec,
    replay_oracle,
    write_change_log,
)
from sql_etl_pipeline_ray.state import manifest as mf

SPEC = ChangeLogSpec(
    n_keys=300, n_events=2000, num_buckets=6, delete_frac=0.15
)


@pytest.fixture(scope="module")
def log_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("morlog"))
    write_change_log(SPEC, d)
    return d


def read_log_files(d):
    files = sorted(glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True))
    return pa.concat_tables(
        [pq.read_table(f) for f in files], promote_options="permissive"
    )


def partial_log(log_dir, dst, buckets):
    os.makedirs(dst)
    for k in buckets:
        shutil.copytree(
            os.path.join(log_dir, f"lsn_bucket={k}"),
            os.path.join(dst, f"lsn_bucket={k}"),
        )
    return dst


def lake_frame(out_dir, **kw):
    t = lake_table(out_dir, **kw)
    return (
        t.to_pandas()
        .sort_values(["repo", "path"], kind="stable")
        .reset_index(drop=True)
    )


def assert_matches_oracle(out_dir, events_tbl):
    got = lake_frame(out_dir)
    want = replay_oracle(events_tbl)
    got = got[want.columns].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def chain_lengths(out_dir):
    return {
        p: len(m["files"]) for p, m in mf.read_all_manifests(out_dir).items()
    }


def test_mor_resume_equals_cow(log_dir, tmp_path):
    out = str(tmp_path / "lake")
    partial = partial_log(log_dir, str(tmp_path / "plog"), range(3))
    replay(partial, out, ReplayConfig(num_partitions=8))
    base_files = {
        (p, f)
        for p, m in mf.read_all_manifests(out).items()
        for f in m["files"]
    }
    res = replay(
        log_dir, out, ReplayConfig(num_partitions=8),
        sink=SinkConfig(out_dir=out, merge_on_read=True), resume=True,
    )
    assert res.summary["merge_on_read"] is True
    assert res.summary["partitions_delta_committed"] >= 1
    manifests = mf.read_all_manifests(out)
    deltas = {p: m for p, m in manifests.items() if m.get("kind") == "delta"}
    assert deltas, "expected at least one delta chain"
    # the base files were NOT rewritten: every prior file is still the
    # first link of its partition's chain
    for p, f in base_files:
        assert f in manifests[p]["files"]
        assert manifests[p]["files"][0] == f or len(manifests[p]["files"]) == 1
    # physical rows bookkeeping: manifest rows == sum of chain footers
    for p, m in deltas.items():
        pdir = mf.partition_dir(out, p)
        assert m["rows"] == sum(
            pq.read_metadata(os.path.join(pdir, f)).num_rows
            for f in m["files"]
        )
    # folded read == the copy-on-write result == the oracle
    assert_matches_oracle(out, read_log_files(log_dir))
    # streaming read agrees with the driver-side fold
    ds_frame = (
        read_lake(out)
        .to_pandas()
        .sort_values(["repo", "path"], kind="stable")
        .reset_index(drop=True)
    )
    lf = lake_frame(out)
    pd.testing.assert_frame_equal(
        ds_frame[lf.columns], lf, check_dtype=False
    )


def test_mor_multiple_increments_chain_and_checkpoints(log_dir, tmp_path):
    out = str(tmp_path / "lake")
    p1 = partial_log(log_dir, str(tmp_path / "p1"), range(2))
    p2 = partial_log(log_dir, str(tmp_path / "p2"), range(4))
    sink = lambda: SinkConfig(out_dir=out, merge_on_read=True)  # noqa: E731
    replay(p1, out, ReplayConfig(num_partitions=4))
    ck0 = mf.checkpoints(mf.read_all_manifests(out))
    replay(p2, out, ReplayConfig(num_partitions=4), sink=sink(), resume=True)
    ck1 = mf.checkpoints(mf.read_all_manifests(out))
    replay(log_dir, out, ReplayConfig(num_partitions=4), sink=sink(), resume=True)
    ck2 = mf.checkpoints(mf.read_all_manifests(out))
    for p in ck0:
        assert ck0[p] <= ck1.get(p, ck0[p]) <= ck2.get(p, ck1.get(p, ck0[p]))
    assert max(chain_lengths(out).values()) >= 3  # base + 2 deltas somewhere
    assert_matches_oracle(out, read_log_files(log_dir))
    # caught-up MOR resume is a no-op (no new chains)
    lens = chain_lengths(out)
    res = replay(
        log_dir, out, ReplayConfig(num_partitions=4), sink=sink(), resume=True
    )
    assert res.summary["partitions_committed"] == 0
    assert chain_lengths(out) == lens


def test_mor_inline_compaction_bounds_chain(log_dir, tmp_path):
    out = str(tmp_path / "lake")
    p1 = partial_log(log_dir, str(tmp_path / "p1"), range(2))
    p2 = partial_log(log_dir, str(tmp_path / "p2"), range(4))
    sink = SinkConfig(out_dir=out, merge_on_read=True, max_delta_files=1)
    replay(p1, out, ReplayConfig(num_partitions=4))
    replay(p2, out, ReplayConfig(num_partitions=4), sink=sink, resume=True)
    assert max(chain_lengths(out).values()) == 2  # one delta allowed
    res = replay(
        log_dir, out, ReplayConfig(num_partitions=4), sink=sink, resume=True
    )
    # every touched chained partition compacted inline rather than chaining
    assert res.summary["partitions_compacted_inline"] >= 1
    manifests = mf.read_all_manifests(out)
    for p, m in manifests.items():
        assert len(m["files"]) <= 2
        if m.get("kind") != "delta":
            assert len(m["files"]) == 1
    assert_matches_oracle(out, read_log_files(log_dir))


def test_compact_lake_restores_plain_files(log_dir, tmp_path):
    out = str(tmp_path / "lake")
    p1 = partial_log(log_dir, str(tmp_path / "p1"), range(3))
    replay(p1, out, ReplayConfig(num_partitions=4))
    replay(
        log_dir, out, ReplayConfig(num_partitions=4),
        sink=SinkConfig(out_dir=out, merge_on_read=True), resume=True,
    )
    before = lake_frame(out)
    ck_before = mf.checkpoints(mf.read_all_manifests(out))
    rep = compact_lake(out)
    assert rep["partitions_compacted"] >= 1
    manifests = mf.read_all_manifests(out)
    assert all(len(m["files"]) == 1 for m in manifests.values())
    assert all(m.get("kind") != "delta" for m in manifests.values())
    # checkpoints carried over unchanged — compaction applies no events
    assert mf.checkpoints(manifests) == ck_before
    after = lake_frame(out)
    pd.testing.assert_frame_equal(after, before, check_dtype=False)
    assert_matches_oracle(out, read_log_files(log_dir))
    # old chain files were swept by commit-time GC (keep_epochs=1)
    for p in manifests:
        pdir = mf.partition_dir(out, p)
        data = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
        assert len(data) == 1, data
    # a COW resume now works again (chains gone) and is a no-op
    res = replay(log_dir, out, ReplayConfig(num_partitions=4), resume=True)
    assert res.summary["partitions_committed"] == 0


def test_cow_resume_on_chained_plain_lake_refused(log_dir, tmp_path):
    out = str(tmp_path / "lake")
    p1 = partial_log(log_dir, str(tmp_path / "p1"), range(3))
    replay(p1, out, ReplayConfig(num_partitions=4))
    replay(
        log_dir, out, ReplayConfig(num_partitions=4),
        sink=SinkConfig(out_dir=out, merge_on_read=True), resume=True,
    )
    with pytest.raises(ValueError, match="merge-on-read delta chains"):
        replay(log_dir, out, ReplayConfig(num_partitions=4), resume=True)


def test_mor_point_read_and_deletes(log_dir, tmp_path):
    out = str(tmp_path / "lake")
    p1 = partial_log(log_dir, str(tmp_path / "p1"), range(3))
    replay(p1, out, ReplayConfig(num_partitions=4))
    replay(
        log_dir, out, ReplayConfig(num_partitions=4),
        sink=SinkConfig(out_dir=out, merge_on_read=True), resume=True,
    )
    events = read_log_files(log_dir)
    want = replay_oracle(events)
    old = replay_oracle(read_log_files(p1))
    # a key whose content CHANGED across the increment (delta overrides base)
    merged = old.merge(want, on=["repo", "path"], suffixes=("_old", "_new"))
    changed = merged[merged["lsn_old"] != merged["lsn_new"]]
    assert len(changed), "fixture must update at least one existing key"
    r, p = changed.iloc[0]["repo"], changed.iloc[0]["path"]
    got = lake_get(out, [(r, p)])
    assert len(got) == 1
    assert got.column("content_sha256")[0].as_py() == (
        changed.iloc[0]["content_sha256_new"]
    )
    # a key deleted by the increment yields no row
    gone = old.merge(want, on=["repo", "path"], how="left", indicator=True,
                     suffixes=("_old", "_new"))
    gone = gone[gone["_merge"] == "left_only"]
    if len(gone):
        r, p = gone.iloc[0]["repo"], gone.iloc[0]["path"]
        assert len(lake_get(out, [(r, p)])) == 0


def test_mor_lake_diff_folds_chains(log_dir, tmp_path):
    out = str(tmp_path / "lake")
    p1 = partial_log(log_dir, str(tmp_path / "p1"), range(3))
    replay(p1, out, ReplayConfig(num_partitions=4),
           sink=SinkConfig(out_dir=out, keep_epochs=2))
    replay(
        log_dir, out, ReplayConfig(num_partitions=4),
        sink=SinkConfig(out_dir=out, merge_on_read=True, keep_epochs=2),
        resume=True,
    )
    diff = (
        lake_diff(out, from_epoch=0)
        .to_pandas()
        .sort_values(["repo", "path"], kind="stable")
    )
    old = replay_oracle(read_log_files(p1))
    new = replay_oracle(read_log_files(log_dir))
    m = old.merge(new, on=["repo", "path"], how="outer", indicator=True,
                  suffixes=("_old", "_new"))
    want_i = int((m["_merge"] == "right_only").sum())
    want_d = int((m["_merge"] == "left_only").sum())
    want_u = int(((m["_merge"] == "both") & (m["lsn_old"] != m["lsn_new"])).sum())
    counts = diff["op"].value_counts().to_dict()
    assert counts.get("I", 0) == want_i
    assert counts.get("D", 0) == want_d
    assert counts.get("U", 0) == want_u


def test_mor_time_travel_pre_delta_epoch(log_dir, tmp_path):
    out = str(tmp_path / "lake")
    p1 = partial_log(log_dir, str(tmp_path / "p1"), range(3))
    replay(p1, out, ReplayConfig(num_partitions=4),
           sink=SinkConfig(out_dir=out, keep_epochs=2))
    replay(
        log_dir, out, ReplayConfig(num_partitions=4),
        sink=SinkConfig(out_dir=out, merge_on_read=True, keep_epochs=2),
        resume=True,
    )
    got = lake_frame(out, asof_epoch=0)
    want = replay_oracle(read_log_files(p1))
    got = got[want.columns].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_mor_fsck_clean(log_dir, tmp_path):
    out = str(tmp_path / "lake")
    p1 = partial_log(log_dir, str(tmp_path / "p1"), range(3))
    replay(p1, out, ReplayConfig(num_partitions=4))
    replay(
        log_dir, out, ReplayConfig(num_partitions=4),
        sink=SinkConfig(out_dir=out, merge_on_read=True), resume=True,
    )
    rep = fsck_lake(out, deep=True)
    assert rep["ok"], rep["issues"]


def test_mor_tombstone_lake_and_cow_interop(log_dir, tmp_path):
    # MOR on a tombstone (fan-in-style) lake, then a COW resume over the
    # chain — every file carries op, so both directions must work
    out = str(tmp_path / "lake")
    cow = str(tmp_path / "cow")
    p1 = partial_log(log_dir, str(tmp_path / "p1"), range(2))
    p2 = partial_log(log_dir, str(tmp_path / "p2"), range(4))
    replay(p1, out, ReplayConfig(num_partitions=4),
           sink=SinkConfig(out_dir=out, keep_tombstones=True))
    replay(
        p2, out, ReplayConfig(num_partitions=4),
        sink=SinkConfig(out_dir=out, keep_tombstones=True, merge_on_read=True),
        resume=True,
    )
    assert max(chain_lengths(out).values()) >= 2
    # COW resume over the chained tombstone lake
    replay(
        log_dir, out, ReplayConfig(num_partitions=4),
        sink=SinkConfig(out_dir=out, keep_tombstones=True), resume=True,
    )
    replay(log_dir, cow, ReplayConfig(num_partitions=4),
           sink=SinkConfig(out_dir=cow, keep_tombstones=True))
    got = lake_frame(out, include_tombstones=True)
    want = lake_frame(cow, include_tombstones=True)
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_mor_schema_evolution_through_delta(tmp_path):
    log = str(tmp_path / "log")
    write_change_log(
        ChangeLogSpec(
            n_keys=200, n_events=1500, num_buckets=6, delete_frac=0.1,
            evolve_after_frac=0.6,
        ),
        log,
    )
    out = str(tmp_path / "lake")
    p1 = partial_log(log, str(tmp_path / "p1"), range(3))  # pre-evolution
    replay(p1, out, ReplayConfig(num_partitions=4))
    assert "size_bytes" not in lake_table(out).column_names
    replay(
        log, out, ReplayConfig(num_partitions=4),
        sink=SinkConfig(out_dir=out, merge_on_read=True), resume=True,
    )
    got = lake_frame(out)
    want = replay_oracle(read_log_files(log))
    assert "size_bytes" in got.columns  # evolved column visible through the fold
    got = got[want.columns].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_mor_read_lake_with_pending(log_dir, tmp_path):
    out = str(tmp_path / "lake")
    p1 = partial_log(log_dir, str(tmp_path / "p1"), range(2))
    p2 = partial_log(log_dir, str(tmp_path / "p2"), range(4))
    replay(p1, out, ReplayConfig(num_partitions=4))
    replay(
        p2, out, ReplayConfig(num_partitions=4),
        sink=SinkConfig(out_dir=out, merge_on_read=True), resume=True,
    )
    # pending = buckets 4..5, committed state = chained lake
    got = (
        read_lake_with_pending(log_dir, out)
        .to_pandas()
        .sort_values(["repo", "path"], kind="stable")
        .reset_index(drop=True)
    )
    want = replay_oracle(read_log_files(log_dir))
    got = got[want.columns].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_mor_write_amplification_is_increment_sized(tmp_path):
    # Same lake, same small increment, both resume modes: copy-on-write
    # rewrites every touched partition in full, merge-on-read writes only
    # the increment's winner rows — the bytes must show it.
    log = str(tmp_path / "log")
    write_change_log(
        ChangeLogSpec(
            n_keys=2000, n_events=8000, num_buckets=20, delete_frac=0.05,
            content_pad=40,
        ),
        log,
    )
    out = str(tmp_path / "lake")
    p1 = partial_log(log, str(tmp_path / "p1"), range(19))  # 95% of the log
    replay(p1, out, ReplayConfig(num_partitions=4))
    cow = str(tmp_path / "cow_lake")
    shutil.copytree(out, cow)
    res_mor = replay(
        log, out, ReplayConfig(num_partitions=4),
        sink=SinkConfig(out_dir=out, merge_on_read=True), resume=True,
    )
    res_cow = replay(
        log, cow, ReplayConfig(num_partitions=4), resume=True
    )
    cow_bytes = int(res_cow.metrics["bytes_written"].sum())
    assert res_mor.summary["bytes_written"] < 0.6 * cow_bytes, (
        res_mor.summary["bytes_written"], cow_bytes
    )
    assert_matches_oracle(out, read_log_files(log))
    # and the two modes' folded views are identical
    pd.testing.assert_frame_equal(
        lake_frame(out), lake_frame(cow), check_dtype=False
    )
