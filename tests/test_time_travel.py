"""Time-travel (snapshot) reads over the exactly-once lake.

Each commit writes a per-epoch snapshot manifest (`manifest-e{N}.json`)
beside the current-pointer `manifest.json`; `read_lake(asof_epoch=E)`
resolves every partition to its largest epoch ≤ E.  Reach equals
`SinkConfig.keep_epochs` — asking past the GC horizon raises instead of
silently serving newer data.
"""

import glob
import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sql_etl_pipeline_ray.config import ReplayConfig, SinkConfig
from sql_etl_pipeline_ray.pipelines.replay import lake_table, read_lake, replay
from sql_etl_pipeline_ray.sources.datagen import (
    ChangeLogSpec,
    generate_change_log,
    replay_oracle,
    write_change_log,
)
from sql_etl_pipeline_ray.state import manifest as mf


@pytest.fixture(scope="module")
def log_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tt_changelog"))
    write_change_log(ChangeLogSpec(n_keys=200, n_events=1500, num_buckets=5), d)
    return d


def _read_log(d):
    files = sorted(glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True))
    return pa.concat_tables(
        [pq.read_table(f) for f in files], promote_options="permissive"
    )


def _partial_log(log_dir, dst, n_buckets):
    os.makedirs(dst)
    for k in range(n_buckets):
        shutil.copytree(
            os.path.join(log_dir, f"lsn_bucket={k}"),
            os.path.join(dst, f"lsn_bucket={k}"),
        )
    return dst


def _assert_frames_equal(got: pd.DataFrame, want: pd.DataFrame):
    want = want.reset_index(drop=True)
    got = got[want.columns].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_asof_epoch_reads_old_snapshot(log_dir, tmp_path):
    out = str(tmp_path / "lake")
    partial = _partial_log(log_dir, str(tmp_path / "partial"), 3)
    sink = SinkConfig(out_dir=out, keep_epochs=3)
    replay(partial, out, ReplayConfig(num_partitions=6), sink=sink)
    replay(log_dir, out, ReplayConfig(num_partitions=6), sink=sink, resume=True)
    # current state = full log; epoch-0 snapshot = partial log
    _assert_frames_equal(
        lake_table(out).to_pandas(), replay_oracle(_read_log(log_dir))
    )
    _assert_frames_equal(
        lake_table(out, asof_epoch=0).to_pandas(),
        replay_oracle(_read_log(partial)),
    )
    # the streaming reader resolves the same snapshot
    got = (
        read_lake(out, asof_epoch=0)
        .to_pandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    _assert_frames_equal(got, replay_oracle(_read_log(partial)))


def test_asof_epoch_mixed_partition_epochs(log_dir, tmp_path):
    """A resume that touches only some partitions leaves the others at an
    older epoch; asof resolution is per-partition (largest epoch ≤ E)."""
    out = str(tmp_path / "lake")
    partial = _partial_log(log_dir, str(tmp_path / "partial"), 4)
    sink = SinkConfig(out_dir=out, keep_epochs=4)
    replay(partial, out, ReplayConfig(num_partitions=6), sink=sink)
    replay(log_dir, out, ReplayConfig(num_partitions=6), sink=sink, resume=True)
    epochs = {p: m["epoch"] for p, m in mf.read_all_manifests(out).items()}
    # asof the MAX current epoch must equal the plain current read even if
    # some partitions never reached that epoch number
    _assert_frames_equal(
        lake_table(out, asof_epoch=max(epochs.values())).to_pandas(),
        lake_table(out).to_pandas(),
    )


def test_asof_epoch_past_gc_horizon_raises(log_dir, tmp_path):
    out = str(tmp_path / "lake")
    partial = _partial_log(log_dir, str(tmp_path / "partial"), 3)
    # default keep_epochs=1: the resume's commit GCs epoch-0 files
    replay(partial, out, ReplayConfig(num_partitions=4))
    replay(log_dir, out, ReplayConfig(num_partitions=4), resume=True)
    with pytest.raises(ValueError, match="no longer retained"):
        lake_table(out, asof_epoch=0)


def test_asof_snapshot_survives_gc_within_window(log_dir, tmp_path):
    """keep_epochs=2: after two commits the epoch-0 snapshot is still
    readable and its data files still exist on disk."""
    out = str(tmp_path / "lake")
    partial = _partial_log(log_dir, str(tmp_path / "partial"), 2)
    sink = SinkConfig(out_dir=out, keep_epochs=2)
    replay(partial, out, ReplayConfig(num_partitions=4), sink=sink)
    snap0 = lake_table(out, asof_epoch=0)
    replay(log_dir, out, ReplayConfig(num_partitions=4), sink=sink, resume=True)
    again = lake_table(out, asof_epoch=0)
    assert snap0.equals(again)


def _apply_diff(snap0: pd.DataFrame, diff: pd.DataFrame) -> pd.DataFrame:
    """Reference application of a changefeed: delete D keys, upsert I/U."""
    state = snap0.set_index(["repo", "path"])
    cols = [c for c in diff.columns if c != "op"]
    for op in ("D", "I", "U"):
        rows = diff[diff["op"] == op]
        if not len(rows):
            continue
        keys = pd.MultiIndex.from_frame(rows[["repo", "path"]])
        if op == "D":
            state = state.drop(index=keys)
        else:
            incoming = rows[cols].set_index(["repo", "path"])
            left = state.drop(index=keys, errors="ignore")
            if len(left):
                # pandas deprecation (GH#40893): all-NA columns must be
                # excluded BEFORE concat to keep dtype inference from the
                # populated side (pre-evolution rows have no size_bytes)
                allna = [
                    c for c in left.columns
                    if c in incoming.columns and left[c].isna().all()
                ]
                left = left.drop(columns=allna)
            state = pd.concat([left, incoming])
    return state.reset_index().sort_values(["repo", "path"]).reset_index(drop=True)


def test_lake_diff_replays_snapshot_forward(log_dir, tmp_path):
    from sql_etl_pipeline_ray.pipelines.replay import lake_diff

    out = str(tmp_path / "lake")
    partial = _partial_log(log_dir, str(tmp_path / "partial"), 3)
    sink = SinkConfig(out_dir=out, keep_epochs=4)
    replay(partial, out, ReplayConfig(num_partitions=6), sink=sink)
    replay(log_dir, out, ReplayConfig(num_partitions=6), sink=sink, resume=True)
    snap0 = lake_table(out, asof_epoch=0).to_pandas()
    snap1 = lake_table(out).to_pandas()
    diff = lake_diff(out, from_epoch=0).to_pandas()
    assert set(diff["op"]) <= {"I", "U", "D"}
    rebuilt = _apply_diff(snap0, diff)
    cols = list(snap1.columns)
    pd.testing.assert_frame_equal(
        rebuilt[cols].reset_index(drop=True),
        snap1.reset_index(drop=True),
        check_dtype=False,
    )
    # sanity: I keys absent in snap0, D keys absent in snap1
    k0 = set(map(tuple, snap0[["repo", "path"]].itertuples(index=False)))
    k1 = set(map(tuple, snap1[["repo", "path"]].itertuples(index=False)))
    ins = diff[diff["op"] == "I"][["repo", "path"]]
    dels = diff[diff["op"] == "D"][["repo", "path"]]
    assert all(tuple(r) not in k0 for r in ins.itertuples(index=False))
    assert all(tuple(r) not in k1 for r in dels.itertuples(index=False))


def test_lake_diff_same_epoch_is_empty(log_dir, tmp_path):
    from sql_etl_pipeline_ray.pipelines.replay import lake_diff

    out = str(tmp_path / "lake")
    sink = SinkConfig(out_dir=out, keep_epochs=2)
    replay(log_dir, out, ReplayConfig(num_partitions=4), sink=sink)
    cur_epoch = max(m["epoch"] for m in mf.read_all_manifests(out).values())
    d = lake_diff(out, from_epoch=cur_epoch)
    assert d.count() == 0


def test_lake_diff_across_schema_evolution(tmp_path):
    """Epoch 0 predates the evolved column; the diff's union schema still
    carries it, with nulls for old-side (D) rows."""
    from sql_etl_pipeline_ray.pipelines.replay import lake_diff
    from sql_etl_pipeline_ray.sources.datagen import ChangeLogSpec, write_change_log

    log = str(tmp_path / "log")
    write_change_log(
        ChangeLogSpec(
            n_keys=150, n_events=1200, num_buckets=4, evolve_after_frac=0.5
        ),
        log,
    )
    partial = str(tmp_path / "partial")
    os.makedirs(partial)
    for k in range(2):  # pre-evolution prefix
        shutil.copytree(
            os.path.join(log, f"lsn_bucket={k}"),
            os.path.join(partial, f"lsn_bucket={k}"),
        )
    out = str(tmp_path / "lake")
    sink = SinkConfig(out_dir=out, keep_epochs=3)
    replay(partial, out, ReplayConfig(num_partitions=4), sink=sink)
    replay(log, out, ReplayConfig(num_partitions=4), sink=sink, resume=True)
    diff = lake_diff(out, from_epoch=0).to_pandas()
    assert "size_bytes" in diff.columns
    snap0 = lake_table(out, asof_epoch=0).to_pandas()
    snap1 = lake_table(out).to_pandas()
    if "size_bytes" not in snap0.columns:
        snap0["size_bytes"] = pd.NA
    rebuilt = _apply_diff(snap0, diff)
    cols = list(snap1.columns)
    pd.testing.assert_frame_equal(
        rebuilt[cols].reset_index(drop=True),
        snap1.reset_index(drop=True),
        check_dtype=False,
    )


def test_lake_schema_diff_reports_evolution(tmp_path):
    """Metadata-only drift report: the resume past the evolution point
    adds size_bytes and widens lang — visible from manifests alone."""
    from sql_etl_pipeline_ray.pipelines.replay import lake_schema_diff

    log = str(tmp_path / "log")
    write_change_log(
        ChangeLogSpec(
            n_keys=150, n_events=1200, num_buckets=4, evolve_after_frac=0.5
        ),
        log,
    )
    partial = str(tmp_path / "partial")
    os.makedirs(partial)
    for k in range(2):  # pre-evolution prefix
        shutil.copytree(
            os.path.join(log, f"lsn_bucket={k}"),
            os.path.join(partial, f"lsn_bucket={k}"),
        )
    out = str(tmp_path / "lake")
    sink = SinkConfig(out_dir=out, keep_epochs=3)
    replay(partial, out, ReplayConfig(num_partitions=4), sink=sink)
    replay(log, out, ReplayConfig(num_partitions=4), sink=sink, resume=True)

    d = lake_schema_diff(out, from_epoch=0)
    assert d["from_epoch"] == 0 and d["to_epoch"] == 1
    assert "size_bytes" in d["added"]
    assert d["changed"].get("lang") == ["string", "large_string"]
    assert not d["removed"]
    assert d["unchanged"] >= 5  # repo/path/commit/content/lsn/sha at least

    # same-epoch diff is empty
    d0 = lake_schema_diff(out, from_epoch=0, to_epoch=0)
    assert not d0["added"] and not d0["changed"] and not d0["removed"]

    # past the GC horizon -> raises, never silently diffs newer state
    mf.vacuum(out, keep_epochs=1)
    with pytest.raises(Exception):
        lake_schema_diff(out, from_epoch=0)
