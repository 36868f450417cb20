"""Exactly-once guarantees under retry and hard crash."""

import os
import signal
import subprocess
import sys
import time

import pandas as pd
import pyarrow as pa
import ray

from sql_etl_pipeline_ray.config import ReplayConfig
from sql_etl_pipeline_ray.pipelines.replay import lake_table, replay
from sql_etl_pipeline_ray.sources.datagen import (
    ChangeLogSpec,
    generate_change_log,
    replay_oracle,
    write_change_log,
)
from sql_etl_pipeline_ray.stages.exchange import ExchangeActor


def test_duplicate_feed_delivery_is_deduped():
    """A retried feed task re-sends identical (part, lsn-span, rows)
    sub-tables; the actor must apply them once."""
    a = ExchangeActor.remote()
    tbl = pa.table({"lsn": [1, 2, 3], "x": ["a", "b", "c"]})
    assert ray.get(a.add.remote(0, tbl)) == 3
    assert ray.get(a.add.remote(0, tbl)) == 0  # duplicate span dropped
    import ray.cloudpickle as pickle

    rows = ray.get(a.finalize.remote(pickle.dumps(lambda p, t, args: len(t)), {}))
    assert rows == [3]
    ray.kill(a)


_KILL_CHILD = """
import sys
sys.path.insert(0, "/root/repo")
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
import ray.data
ray.data.DataContext.get_current().enable_progress_bars = False
from sql_etl_pipeline_ray.config import ReplayConfig
from sql_etl_pipeline_ray.pipelines.replay import replay
print("STARTING", flush=True)
replay(sys.argv[1], sys.argv[2], ReplayConfig(num_partitions=8))
print("FINISHED", flush=True)
"""


def test_sigkill_mid_replay_then_resume_matches_oracle(tmp_path):
    """Hard-kill a replay subprocess mid-run, then resume over the same log
    in-process: committed partitions are reused, missing ones rebuilt, and
    the final lake matches the oracle exactly (manifest-gated readers never
    see torn state).  If the child wins the race and finishes, resume is a
    no-op and the assertion still holds."""
    spec = ChangeLogSpec(n_keys=2000, n_events=60_000, num_buckets=12)
    log = str(tmp_path / "log")
    write_change_log(spec, log)
    lake = str(tmp_path / "lake")
    script = str(tmp_path / "child.py")
    with open(script, "w") as f:
        f.write(_KILL_CHILD)
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # child owns its own local session
    proc = subprocess.Popen(
        [sys.executable, script, log, lake],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, env=env,
    )
    # wait for the run to actually start, then kill it mid-flight
    line = proc.stdout.readline()
    assert "STARTING" in line
    time.sleep(3.0)
    proc.send_signal(signal.SIGKILL)
    proc.wait()

    replay(log, lake, ReplayConfig(num_partitions=8), resume=True)
    got = (
        lake_table(lake).to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    want = (
        replay_oracle(generate_change_log(spec))
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(want.columns)], want[sorted(want.columns)], check_dtype=False
    )


def test_keep_epochs_grace_window(tmp_path):
    """keep_epochs=2 retains the previous epoch's data file through a
    commit (in-flight readers of the old manifest can finish); the default
    keep_epochs=1 removes it.  Readers always see only the new manifest."""
    import glob as _glob

    from sql_etl_pipeline_ray.config import ReplayConfig, SinkConfig
    from sql_etl_pipeline_ray.pipelines.replay import lake_table, replay
    from sql_etl_pipeline_ray.sources.datagen import ChangeLogSpec, write_change_log

    log = str(tmp_path / "log")
    write_change_log(ChangeLogSpec(n_events=1500, n_keys=200, num_buckets=2), log)

    graced = str(tmp_path / "graced")
    sink = SinkConfig(out_dir=graced, keep_epochs=2)
    replay(log, graced, ReplayConfig(num_partitions=2), sink=sink)  # epoch 0
    replay(log, graced, ReplayConfig(num_partitions=2), sink=sink)  # epoch 1
    def epochs_present(d):
        return sorted(
            int(os.path.basename(f)[len("data-e"):].split("-", 1)[0].split(".")[0])
            for f in _glob.glob(os.path.join(d, "part=0", "data-e*.parquet"))
        )

    assert epochs_present(graced) == [0, 1]
    # a third commit expires epoch 0 (window slides)
    replay(log, graced, ReplayConfig(num_partitions=2), sink=sink)  # epoch 2
    assert epochs_present(graced) == [1, 2]
    # readers see exactly the committed epoch (manifest-listed file only)
    assert len(lake_table(graced)) > 0

    plain = str(tmp_path / "plain")
    replay(log, plain, ReplayConfig(num_partitions=2))
    replay(log, plain, ReplayConfig(num_partitions=2))
    assert epochs_present(plain) == [1]


def test_commit_retry_same_digest_is_idempotent(tmp_path):
    """A deterministic retry (same digest) of an already-committed
    (partition, epoch) commits harmlessly and adopts the winner's
    manifest — snapshot and pointer can never diverge."""
    from sql_etl_pipeline_ray.state import manifest as mf

    out = str(tmp_path / "lake")
    t = pa.table({"repo": ["r"], "path": ["p"], "lsn": [1], "content": ["x"]})
    m1 = mf.commit_partition(out, 0, 0, t, {"max_lsn": 1, "attempt": 1}, "d" * 16)
    m2 = mf.commit_partition(out, 0, 0, t, {"max_lsn": 1, "attempt": 2}, "d" * 16)
    assert m2 == m1  # second attempt adopted the winner's manifest verbatim
    import glob as _glob

    files = _glob.glob(os.path.join(out, "part=0", "data-e0-*.parquet"))
    assert len(files) == 1
    with open(os.path.join(out, "part=0", "manifest.json")) as f:
        cur = f.read()
    with open(os.path.join(out, "part=0", "manifest-e0.json")) as f:
        snap = f.read()
    assert cur == snap


def test_concurrent_commit_different_content_raises(tmp_path):
    """Two writers racing the same (partition, epoch) with different
    content: one wins, the loser raises before the pointer moves, and the
    loser's orphan data file is swept by the next commit's GC."""
    import glob as _glob

    import pytest as _pytest

    from sql_etl_pipeline_ray.state import manifest as mf

    out = str(tmp_path / "lake")
    ta = pa.table({"repo": ["r"], "path": ["p"], "lsn": [1], "content": ["a"]})
    tb = pa.table({"repo": ["r"], "path": ["p"], "lsn": [2], "content": ["b"]})
    mf.commit_partition(out, 0, 0, ta, {"max_lsn": 1}, "aaaa" * 4)
    with _pytest.raises(mf.ConcurrentCommitError):
        mf.commit_partition(out, 0, 0, tb, {"max_lsn": 2}, "bbbb" * 4)
    # winner's state intact
    m = mf.read_manifest(out, 0)
    assert m["digest"] == "aaaa" * 4 and m["max_lsn"] == 1
    # loser's orphan file exists until the next commit sweeps it
    orphans = _glob.glob(os.path.join(out, "part=0", "data-e0-bbbb*.parquet"))
    assert len(orphans) == 1
    mf.commit_partition(out, 0, 1, ta, {"max_lsn": 1}, "aaaa" * 4)
    assert not _glob.glob(os.path.join(out, "part=0", "data-e0-bbbb*.parquet"))


def test_replay_loses_race_to_preexisting_epoch(tmp_path):
    """Replay-level integration: if another writer committed the epoch this
    replay targets (with different content), the replay fails loudly
    instead of silently clobbering the winner."""
    import json as _json

    import pytest as _pytest

    from sql_etl_pipeline_ray.state import manifest as mf

    log = str(tmp_path / "log")
    write_change_log(ChangeLogSpec(n_events=800, n_keys=100, num_buckets=2), log)
    out = str(tmp_path / "lake")
    replay(log, out, ReplayConfig(num_partitions=2))  # epoch 0
    # simulate a faster concurrent writer winning epoch 1 on partition 0
    pdir = mf.partition_dir(out, 0)
    fake = dict(mf.read_manifest(out, 0))
    fake["epoch"] = 1
    fake["digest"] = "someoneelse"
    with open(os.path.join(pdir, "manifest-e1.json"), "w") as f:
        f.write(_json.dumps(fake))
    with _pytest.raises(Exception) as ei:
        replay(log, out, ReplayConfig(num_partitions=2))  # targets epoch 1
    assert "ConcurrentCommitError" in str(ei.getrepr()) or isinstance(
        ei.value, mf.ConcurrentCommitError
    )


def test_vacuum_sweeps_orphans_keeps_retained(tmp_path):
    """vacuum removes temps, losing-writer orphans and beyond-retention
    epochs, and leaves the retained window fully readable."""
    import glob as _glob

    from sql_etl_pipeline_ray.config import SinkConfig
    from sql_etl_pipeline_ray.pipelines.replay import lake_table
    from sql_etl_pipeline_ray.state import manifest as mf

    log = str(tmp_path / "log")
    write_change_log(ChangeLogSpec(n_events=1200, n_keys=150, num_buckets=2), log)
    out = str(tmp_path / "lake")
    sink = SinkConfig(out_dir=out, keep_epochs=5)  # retain everything...
    for _ in range(3):  # epochs 0,1,2 all retained
        replay(log, out, ReplayConfig(num_partitions=2), sink=sink)
    pdir = mf.partition_dir(out, 0)
    # plant crash debris: a temp and a losing-writer orphan for epoch 2
    open(os.path.join(pdir, "data-e9.parquet.inprogress"), "w").close()
    open(os.path.join(pdir, "data-e2-deadbeef0000.parquet"), "w").close()
    before = lake_table(out).to_pandas()

    # tighten retention to 2 epochs after the fact
    removed = mf.vacuum(out, keep_epochs=2)
    assert removed["tmp"] == 1
    assert removed["data"] >= 2  # orphan + epoch-0 files (2 partitions share counts)
    assert removed["manifests"] >= 1
    assert not os.path.exists(os.path.join(pdir, "data-e2-deadbeef0000.parquet"))
    # current state unchanged; previous epoch still time-travel readable
    pd.testing.assert_frame_equal(lake_table(out).to_pandas(), before)
    assert len(lake_table(out, asof_epoch=1)) > 0
    # epoch 0 is gone
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mf.read_manifest(out, 0, asof_epoch=0)
    # idempotent second run removes nothing
    assert mf.vacuum(out, keep_epochs=2) == {"tmp": 0, "data": 0, "manifests": 0}
