"""op='P' partial-update (patch) events: null non-key columns mean
"unchanged"; the merge composes each key's latest full image with every
patch above it (``merge._compose_patches_exact``).  Pins: distributed
replay vs the single-process oracle, resume with the patch stack split
across runs (copy-on-write AND merge-on-read), orphan / post-delete
patches, combiner subset-safety, the fan-in append-only guard, and
tombstone-lake composition.
"""

import glob
import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from sql_etl_pipeline_ray.config import ReplayConfig, SinkConfig
from sql_etl_pipeline_ray.pipelines.replay import lake_table, replay
from sql_etl_pipeline_ray.sources.datagen import (
    ChangeLogSpec,
    generate_change_log,
    replay_oracle,
    write_change_log,
)
from sql_etl_pipeline_ray.stages.merge import fold_latest

SPEC = ChangeLogSpec(
    n_keys=250, n_events=2500, num_buckets=6, delete_frac=0.12, patch_frac=0.35
)


@pytest.fixture(scope="module")
def log_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("patchlog"))
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


def assert_matches_oracle(out_dir, events_tbl, **lake_kw):
    got = lake_table(out_dir, **lake_kw).to_pandas()
    want = replay_oracle(events_tbl)
    got = (
        got[want.columns]
        .sort_values(["repo", "path"], kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True), check_dtype=False)


def _events_table(rows):
    cols = {
        "lsn": pa.array([r[0] for r in rows], pa.int64()),
        "op": pa.array([r[1] for r in rows], pa.string()),
        "repo": pa.array([r[2] for r in rows], pa.string()),
        "path": pa.array([r[3] for r in rows], pa.string()),
        "commit": pa.array([r[4] for r in rows], pa.string()),
        "lang": pa.array([r[5] for r in rows], pa.string()),
        "content": pa.array([r[6] for r in rows], pa.string()),
    }
    return pa.table(cols)


def test_full_patch_replay_matches_oracle(log_dir, tmp_path):
    out = str(tmp_path / "lake")
    replay(log_dir, out, ReplayConfig(num_partitions=8))
    events = read_log_files(log_dir)
    assert (
        pc.sum(pc.equal(events.column("op"), pa.scalar("P")).cast(pa.int64())).as_py()
        > 100
    ), "fixture must actually contain patches"
    assert_matches_oracle(out, events)


def test_patch_replay_combiner_modes_identical(log_dir, tmp_path):
    # the combiner passes P rows through un-composed (subset folds are
    # unsound on patch stacks); forcing it on/off must not change the lake
    frames = []
    for mode in ("always", "never"):
        out = str(tmp_path / f"lake_{mode}")
        replay(
            log_dir, out,
            ReplayConfig(num_partitions=8, phase1_combine_mode=mode),
        )
        frames.append(
            lake_table(out)
            .to_pandas()
            .sort_values(["repo", "path"], kind="stable")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(frames[0], frames[1], check_dtype=False)


def test_patch_stack_split_across_cow_resume(log_dir, tmp_path):
    # base images commit in run 1; later patches arrive as an increment —
    # the resume must compose new patches over the COMMITTED image
    out = str(tmp_path / "lake")
    p1 = partial_log(log_dir, str(tmp_path / "p1"), range(3))
    replay(p1, out, ReplayConfig(num_partitions=8))
    replay(log_dir, out, ReplayConfig(num_partitions=8), resume=True)
    assert_matches_oracle(out, read_log_files(log_dir))


def test_patch_stack_split_across_mor_resume(log_dir, tmp_path):
    # same split, merge-on-read: an all-patch increment must commit as an
    # op='P' delta row and compose with the base at READ time
    out = str(tmp_path / "lake")
    p1 = partial_log(log_dir, str(tmp_path / "p1"), range(3))
    replay(p1, out, ReplayConfig(num_partitions=8))
    replay(
        log_dir, out, ReplayConfig(num_partitions=8),
        sink=SinkConfig(out_dir=out, merge_on_read=True), resume=True,
    )
    assert_matches_oracle(out, read_log_files(log_dir))
    # and compaction folds the chain to the same state
    from sql_etl_pipeline_ray.pipelines.replay import compact_lake

    compact_lake(out)
    assert_matches_oracle(out, read_log_files(log_dir))


def test_orphan_and_post_delete_patches(tmp_path):
    events = _events_table([
        # key A: insert, patch commit (content unchanged)
        (1, "I", "r1", "a.py", "c1", "py", "print(1)\n"),
        (2, "P", "r1", "a.py", "c2", None, None),
        # key B: insert, delete, patch → partially re-created (nulls real)
        (3, "I", "r1", "b.py", "c3", "py", "print(2)\n"),
        (4, "D", "r1", "b.py", "c4", "py", None),
        (5, "P", "r1", "b.py", "c5", None, None),
        # key C: orphan patch (no base ever)
        (6, "P", "r1", "c.py", "c6", "go", None),
        # key D: patch then a full update supersedes the stack
        (7, "I", "r1", "d.py", "c7", "py", "v1\n"),
        (8, "P", "r1", "d.py", "c8", None, None),
        (9, "U", "r1", "d.py", "c9", "py", "v2\n"),
    ])
    log = str(tmp_path / "log" / "lsn_bucket=0")
    os.makedirs(log)
    pq.write_table(events, os.path.join(log, "events.parquet"))
    out = str(tmp_path / "lake")
    replay(str(tmp_path / "log"), out, ReplayConfig(num_partitions=2))
    got = (
        lake_table(out)
        .to_pandas()
        .set_index("path")
        .sort_index()
    )
    # A: patched commit, inherited content/lang
    assert got.loc["a.py", "commit"] == "c2"
    assert got.loc["a.py", "content"] == "print(1)\n"
    assert got.loc["a.py", "lang"] == "py"
    assert got.loc["a.py", "lsn"] == 2
    # B: delete reset the image — only the patch's columns survive
    assert got.loc["b.py", "commit"] == "c5"
    assert pd.isna(got.loc["b.py", "content"])
    assert pd.isna(got.loc["b.py", "lang"])
    assert pd.isna(got.loc["b.py", "content_sha256"])
    # C: orphan patch → live partial row
    assert got.loc["c.py", "commit"] == "c6"
    assert got.loc["c.py", "lang"] == "go"
    # D: the full update wiped the patch history
    assert got.loc["d.py", "commit"] == "c9"
    assert got.loc["d.py", "content"] == "v2\n"
    oracle = replay_oracle(events).set_index("path").sort_index()
    pd.testing.assert_frame_equal(
        got[oracle.columns], oracle, check_dtype=False
    )


def test_patches_refused_on_fanin_feeds(tmp_path):
    events = _events_table([
        (1, "I", "r1", "a.py", "c1", "py", "x\n"),
        (2, "P", "r1", "a.py", "c2", None, None),
    ])
    log = str(tmp_path / "log" / "lsn_bucket=0")
    os.makedirs(log)
    pq.write_table(events, os.path.join(log, "events.parquet"))
    with pytest.raises(Exception, match="append-only"):
        replay(
            str(tmp_path / "log"), str(tmp_path / "lake"),
            ReplayConfig(num_partitions=2, watermark_prune=False),
        )


def test_patch_tombstone_lake_and_evolution(tmp_path):
    # tombstone lake: composed rows persist op ('U' for based stacks, 'P'
    # for orphan stacks); evolution: size_bytes stays null on patch rows
    # and composes like any other column
    log = str(tmp_path / "log")
    spec = ChangeLogSpec(
        n_keys=200, n_events=2000, num_buckets=6, delete_frac=0.1,
        patch_frac=0.3, evolve_after_frac=0.5,
    )
    write_change_log(spec, log)
    out = str(tmp_path / "lake")
    replay(log, out, ReplayConfig(num_partitions=8),
           sink=SinkConfig(out_dir=out, keep_tombstones=True))
    events = read_log_files(log)
    got = lake_table(out).to_pandas()  # live view (tombstones filtered)
    want = replay_oracle(events)
    got = (
        got[want.columns]
        .sort_values(["repo", "path"], kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True), check_dtype=False)
    ops = set(
        lake_table(out, include_tombstones=True).to_pandas()["op"].unique()
    )
    assert "D" in ops  # tombstones persisted
    # resume over the tombstone lake with more patches stays exact
    # (composed rows re-enter at their stored op)
    replay(log, out, ReplayConfig(num_partitions=8),
           sink=SinkConfig(out_dir=out, keep_tombstones=True), resume=True)
    got2 = lake_table(out).to_pandas()
    got2 = (
        got2[want.columns]
        .sort_values(["repo", "path"], kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got2, want.reset_index(drop=True), check_dtype=False)


def test_patch_mor_three_increments_with_evolution(tmp_path):
    # patches + deletes + schema evolution over THREE merge-on-read
    # increments: delta chains hold op='P' partial rows that compose with
    # bases two epochs down; the read fold must still equal the oracle
    spec = ChangeLogSpec(
        n_keys=220, n_events=2600, num_buckets=8, delete_frac=0.15,
        patch_frac=0.4, evolve_after_frac=0.5,
    )
    log = str(tmp_path / "log")
    write_change_log(spec, log)
    p1 = partial_log(log, str(tmp_path / "p1"), range(3))
    p2 = partial_log(log, str(tmp_path / "p2"), range(6))
    out = str(tmp_path / "lake")
    sink = SinkConfig(out_dir=out, merge_on_read=True)
    replay(p1, out, ReplayConfig(num_partitions=6))
    replay(p2, out, ReplayConfig(num_partitions=6), sink=sink, resume=True)
    replay(log, out, ReplayConfig(num_partitions=6), sink=sink, resume=True)
    assert_matches_oracle(out, read_log_files(log))
    from sql_etl_pipeline_ray.pipelines.replay import fsck_lake

    assert fsck_lake(out, deep=True)["ok"]


def test_fold_latest_subset_mode_preserves_patches():
    # compose=False (combiner context) must pass P rows through untouched
    t = _events_table([
        (1, "I", "r", "k", "c1", "py", "a\n"),
        (2, "U", "r", "k", "c2", "py", "b\n"),
        (3, "P", "r", "k", "c3", None, None),
        (4, "P", "r", "k", "c4", None, None),
    ])
    folded = fold_latest(t, keep_tombstones=True)
    ops = sorted(folded.column("op").to_pylist())
    assert ops == ["P", "P", "U"]  # both patches intact, I folded away
    # compose=True collapses to the final image
    composed = fold_latest(t, keep_tombstones=True, compose_patches=True)
    assert len(composed) == 1
    assert composed.column("commit")[0].as_py() == "c4"
    assert composed.column("content")[0].as_py() == "b\n"
    assert composed.column("lsn")[0].as_py() == 4
    assert composed.column("op")[0].as_py() == "U"
