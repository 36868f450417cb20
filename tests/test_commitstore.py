"""CommitStore: the object-store commit contract (state/commitstore.py).

Three layers of evidence that exactly-once survives object storage:
1. contract unit tests over both implementations (POSIX + emulator),
2. fault-injected engine runs on emulator-governed lakes — crash windows
   around the manifest CAS and pointer put, CAS races lost to a
   fabricated concurrent writer — asserting the protocol's promised
   outcome for each window,
3. the FULL exactly-once / merge-on-read / transactional test files
   re-run with every commit op routed through the emulator
   (``SPRAY_COMMIT_STORE=emulated`` in a nested pytest, so Ray workers
   resolve the emulator too).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pandas as pd
import pyarrow as pa
import pytest

from sql_etl_pipeline_ray.config import ReplayConfig
from sql_etl_pipeline_ray.pipelines.replay import lake_table, replay
from sql_etl_pipeline_ray.sources.datagen import (
    ChangeLogSpec,
    generate_change_log,
    replay_oracle,
    write_change_log,
)
from sql_etl_pipeline_ray.state import commitstore as cs
from sql_etl_pipeline_ray.state import manifest as mf


@pytest.fixture(params=["posix", "emulated"])
def store(request, tmp_path):
    root = str(tmp_path / "store_root")
    os.makedirs(root, exist_ok=True)
    if request.param == "posix":
        yield cs.PosixStore(), root
    else:
        cs.install_emulator(root)
        yield cs.store_for(root), root
    cs.clear_cache()


def test_contract_put_get_list_delete(store):
    st, root = store
    k = os.path.join(root, "a", "obj.json")
    assert st.get(k) is None
    st.put(k, b"v1")
    assert st.get(k) == b"v1"
    st.put(k, b"v2")                       # atomic overwrite
    assert st.get(k) == b"v2"
    assert "obj.json" in st.list_dir(os.path.join(root, "a"))
    assert st.list_dir(os.path.join(root, "missing")) == []
    st.delete(k)
    assert st.get(k) is None
    st.delete(k)                           # delete-missing is a no-op


def test_contract_conditional_put(store):
    st, root = store
    k = os.path.join(root, "cas.json")
    assert st.put_if_absent(k, b"first") is True
    assert st.put_if_absent(k, b"second") is False
    assert st.get(k) == b"first"           # loser never overwrites
    st.delete(k)
    assert st.put_if_absent(k, b"third") is True


def _mk_lake(tmp_path, n_events=6000, seed=31, parts=4):
    spec = ChangeLogSpec(n_events=n_events, n_keys=400, seed=seed,
                         delete_frac=0.1)
    log = str(tmp_path / "log")
    write_change_log(spec, log)
    want = (
        replay_oracle(generate_change_log(spec))
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )
    return spec, log, want


def _state(lake):
    return (
        lake_table(lake).to_pandas()
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )


def test_emulated_full_replay_matches_oracle(tmp_path):
    """A lake governed by the emulator (control file resolved inside Ray
    worker processes) replays to the exact oracle state."""
    _spec, log, want = _mk_lake(tmp_path)
    lake = str(tmp_path / "lake")
    cs.install_emulator(lake)
    replay(log, lake, ReplayConfig(num_partitions=4))
    got = _state(lake)
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  want[sorted(want.columns)])


def test_crash_before_manifest_cas_then_resume(tmp_path):
    """Injected crash in the window after the data-object put but before
    the manifest conditional-put (for one partition): the run fails, the
    lake shows no trace of the torn commit, and a disarmed re-run
    converges to the oracle; vacuum sweeps the orphan data object."""
    _spec, log, want = _mk_lake(tmp_path)
    lake = str(tmp_path / "lake")
    cs.install_emulator(lake, faults=[
        {"op": "put_if_absent", "match": "part=2/manifest-e0",
         "action": "crash_before"},
    ])
    with pytest.raises(Exception, match="injected crash"):
        replay(log, lake, ReplayConfig(num_partitions=4))
    # partition 2 must have NO manifest (torn commit invisible) though
    # its orphan data object may exist
    assert mf.read_manifest(lake, 2) is None
    cs.set_faults(lake, None)
    replay(log, lake, ReplayConfig(num_partitions=4), resume=True)
    got = _state(lake)
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  want[sorted(want.columns)])
    # orphans from the torn attempt are sweepable, and sweeping changes
    # nothing the manifests reference
    mf.vacuum(lake, keep_epochs=1)
    got2 = _state(lake)
    pd.testing.assert_frame_equal(got2, got)


def test_crash_between_cas_and_pointer_then_resume(tmp_path):
    """Crash AFTER the snapshot-manifest CAS but BEFORE the current
    pointer moves: the epoch manifest exists, the pointer doesn't — the
    documented harmless-orphan window.  A re-run must adopt the
    committed snapshot idempotently (same digest) and finish."""
    _spec, log, want = _mk_lake(tmp_path)
    lake = str(tmp_path / "lake")
    cs.install_emulator(lake, faults=[
        {"op": "put", "match": "part=1/manifest.json",
         "action": "crash_before"},
    ])
    with pytest.raises(Exception, match="injected crash"):
        replay(log, lake, ReplayConfig(num_partitions=4))
    pdir = mf.partition_dir(lake, 1)
    assert mf.read_manifest(lake, 1) is None          # pointer never moved
    assert any(f.startswith("manifest-e0") for f in os.listdir(pdir))
    cs.set_faults(lake, None)
    replay(log, lake, ReplayConfig(num_partitions=4), resume=True)
    got = _state(lake)
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  want[sorted(want.columns)])


def test_lost_cas_race_raises_concurrent_commit(tmp_path):
    """A fabricated concurrent writer wins the manifest CAS with
    CONFLICTING content: the engine must abort with
    ConcurrentCommitError before its pointer moves."""
    lake = str(tmp_path / "lake")
    cs.install_emulator(lake, faults=[
        {"op": "put_if_absent", "match": "manifest-e0",
         "action": "lose_race"},
    ])
    t = pa.table({"repo": ["r"], "path": ["p"], "lsn": [1]})
    with pytest.raises(mf.ConcurrentCommitError):
        mf.commit_partition(lake, 0, 0, t, {"max_lsn": 1}, "aaaa" * 4)
    assert mf.read_manifest(lake, 0) is None


def test_lost_cas_race_duplicate_commits_idempotently(tmp_path):
    """The concurrent winner wrote IDENTICAL bytes (deterministic retry
    twin): the loser adopts it and the commit succeeds."""
    lake = str(tmp_path / "lake")
    cs.install_emulator(lake, faults=[
        {"op": "put_if_absent", "match": "manifest-e0",
         "action": "lose_race_duplicate"},
    ])
    t = pa.table({"repo": ["r"], "path": ["p"], "lsn": [1]})
    m = mf.commit_partition(lake, 0, 0, t, {"max_lsn": 1}, "aaaa" * 4)
    assert m["digest"] == "aaaa" * 4
    assert mf.read_manifest(lake, 0)["digest"] == "aaaa" * 4


def test_txn_publish_crash_window_on_emulator(tmp_path):
    """Cross-table publish on an emulator-governed root: crash the
    snapshot-pointer put; readers stay on the previous snapshot; a
    re-run publishes."""
    from sql_etl_pipeline_ray.pipelines.txn import (
        read_txn_snapshot, replay_txn,
    )

    rows = []
    for t in range(8):
        base = 4 * t
        rows.append(dict(lsn=base + 1, op="I", repo="r", path=f"f{t}",
                         commit=f"c{base}", lang="x", content=f"v{t}",
                         tbl="files", txn=t))
    import pyarrow.parquet as pq

    log = str(tmp_path / "log")
    os.makedirs(log)
    tbl = pa.Table.from_pylist(rows)
    pq.write_table(tbl, os.path.join(log, "bucket-000.parquet"))
    from sql_etl_pipeline_ray.pipelines.txn import SNAPSHOT_POINTER

    out = str(tmp_path / "out")
    cs.install_emulator(out, faults=[
        {"op": "put", "match": SNAPSHOT_POINTER, "action": "crash_before"},
    ])
    with pytest.raises(cs.InjectedFault):
        replay_txn(log, out, sealed=True)
    assert read_txn_snapshot(out) is None     # pointer never moved
    cs.set_faults(out, None)
    res = replay_txn(log, out, sealed=True)
    assert res["snapshot"]["seq"] == 0
    assert read_txn_snapshot(out)["seq"] == 0


def test_full_exactly_once_suite_on_emulator():
    """The VERDICT r4 acceptance gate: test_exactly_once.py, test_mor.py
    and test_txn.py all green with EVERY commit op routed through the
    object-store emulator.  Runs as a nested pytest so the env override
    is set before that session's ray.init (worker processes inherit
    it)."""
    env = dict(os.environ, SPRAY_COMMIT_STORE="emulated")
    proc = subprocess.run(
        [sys.executable, "-m", "pytest",
         "tests/test_exactly_once.py", "tests/test_mor.py",
         "tests/test_txn.py", "-x", "-q", "-p", "no:cacheprovider"],
        env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
        capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, proc.stdout[-4000:] + proc.stderr[-2000:]


def test_two_real_concurrent_writers_cas_and_converge(tmp_path):
    """REAL process-level concurrency on one emulator-governed lake: two
    replay processes race every partition's epoch-0 CAS with DIFFERENT
    content.  Contract: per partition exactly one writer wins, the
    loser aborts with ConcurrentCommitError BEFORE its pointer moves
    (never a torn mix), and a follow-up resume over the union log
    converges to the LWW oracle regardless of who won where."""
    import pyarrow.parquet as pq

    keys = [(f"r{i % 7}", f"k{i}") for i in range(200)]

    def write_log(d, lsn0, tag):
        os.makedirs(d, exist_ok=True)
        t = pa.table({
            "lsn": pa.array([lsn0 + i for i in range(len(keys))], pa.int64()),
            "op": pa.array(["I"] * len(keys)),
            "repo": pa.array([k[0] for k in keys]),
            "path": pa.array([k[1] for k in keys]),
            "commit": pa.array([f"{tag}{i}" for i in range(len(keys))]),
            "lang": pa.array(["x"] * len(keys)),
            "content": pa.array([f"{tag}:{i}" for i in range(len(keys))]),
        })
        pq.write_table(t, os.path.join(d, "b0.parquet"))

    log_a, log_b = str(tmp_path / "log_a"), str(tmp_path / "log_b")
    union = str(tmp_path / "union")
    write_log(log_a, 1, "a")
    write_log(log_b, 1001, "b")
    os.makedirs(union)
    os.link(os.path.join(log_a, "b0.parquet"), os.path.join(union, "a.parquet"))
    os.link(os.path.join(log_b, "b0.parquet"), os.path.join(union, "b.parquet"))
    lake = str(tmp_path / "lake")
    cs.install_emulator(lake)

    script = r"""
import sys
import ray, ray.data
ray.init(num_cpus=2, include_dashboard=False, logging_level="ERROR")
ray.data.DataContext.get_current().enable_progress_bars = False
from sql_etl_pipeline_ray.config import ReplayConfig
from sql_etl_pipeline_ray.pipelines.replay import replay
from sql_etl_pipeline_ray.state.manifest import ConcurrentCommitError
try:
    replay(sys.argv[1], sys.argv[2], ReplayConfig(num_partitions=4))
except Exception as e:
    # the conflict surfaces wrapped in Ray's task error
    if "ConcurrentCommitError" in type(e).__name__ + str(e):
        sys.exit(3)
    raise
finally:
    ray.shutdown()
sys.exit(0)
"""
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen([sys.executable, "-c", script, lg, lake],
                         env=env, cwd=repo,
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for lg in (log_a, log_b)
    ]
    rcs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode in (0, 3), err[-3000:].decode()
        rcs.append(p.returncode)
    # per partition exactly one epoch-0 winner exists and is readable
    from sql_etl_pipeline_ray.pipelines.replay import lake_table, replay
    from sql_etl_pipeline_ray.config import ReplayConfig

    m = mf.read_all_manifests(lake)
    assert m, "no partition committed at all"
    assert all(man["epoch"] == 0 for man in m.values())
    assert len(lake_table(lake).to_pandas()) == len(keys)
    # resume over the union converges to the LWW oracle (B wins: higher
    # LSNs), whatever mix of winners the race produced
    replay(union, lake, ReplayConfig(num_partitions=4), resume=True)
    df = (lake_table(lake).to_pandas()
          .sort_values(["repo", "path"]).reset_index(drop=True))
    assert len(df) == len(keys)
    assert df["content"].str.startswith("b:").all()
    from sql_etl_pipeline_ray.pipelines.replay import fsck_lake

    rep = fsck_lake(lake, deep=True)
    assert rep["ok"], rep["issues"]


def test_crash_during_gc_delete_leaves_lake_readable(tmp_path):
    """Crash while lazy GC deletes superseded epoch files (AFTER the
    pointer moved): the commit is already durable — the lake reads the
    new epoch; the stranded old files are plain orphans a disarmed
    vacuum sweeps."""
    lake = str(tmp_path / "lake")
    cs.install_emulator(lake)
    t1 = pa.table({"repo": ["r"], "path": ["p"], "lsn": [1]})
    t2 = pa.table({"repo": ["r"], "path": ["p"], "lsn": [2]})
    mf.commit_partition(lake, 0, 0, t1, {"max_lsn": 1}, "aaaa" * 4)
    cs.set_faults(lake, [
        {"op": "delete", "match": "data-e0", "action": "crash_before"},
    ])
    with pytest.raises(cs.InjectedFault):
        mf.commit_partition(lake, 0, 1, t2, {"max_lsn": 2}, "bbbb" * 4,
                            keep_epochs=1)
    # pointer moved before GC: the new epoch is the visible state
    m = mf.read_manifest(lake, 0)
    assert m["epoch"] == 1 and m["digest"] == "bbbb" * 4
    # the stranded epoch-0 data file is an orphan; vacuum sweeps it
    cs.set_faults(lake, None)
    pdir = mf.partition_dir(lake, 0)
    assert any(f.startswith("data-e0") for f in os.listdir(pdir))
    removed = mf.vacuum(lake, keep_epochs=1)
    assert removed["data"] >= 1
    assert not any(f.startswith("data-e0") for f in os.listdir(pdir))
    assert mf.read_manifest(lake, 0)["digest"] == "bbbb" * 4
