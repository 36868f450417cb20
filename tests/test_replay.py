"""Golden replay tests: engine vs single-process oracle, idempotence, resume.

The correctness gate from BASELINE.json: after full replay the final table
is row-for-row identical to the reference replay semantics with per-row
``sha256(content)`` equality.
"""

import glob
import json
import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sql_etl_pipeline_ray.config import ReplayConfig
from sql_etl_pipeline_ray.sources.datagen import (
    ChangeLogSpec,
    generate_change_log,
    replay_oracle,
    write_change_log,
)
from sql_etl_pipeline_ray.pipelines.replay import lake_table, read_lake, replay
from sql_etl_pipeline_ray.state import manifest as mf


@pytest.fixture(scope="module")
def log_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("changelog"))
    write_change_log(ChangeLogSpec(n_keys=300, n_events=2000, num_buckets=6), d)
    return d


def read_log_files(d):
    files = sorted(glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True))
    return pa.concat_tables([pq.read_table(f) for f in files], promote_options="permissive")


def compare_to_oracle(out_dir, events_tbl):
    got = lake_table(out_dir).to_pandas()
    want = replay_oracle(events_tbl)
    got = got[want.columns].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_full_replay_matches_oracle(log_dir, tmp_path):
    out = str(tmp_path / "lake")
    res = replay(log_dir, out, ReplayConfig(num_partitions=8))
    compare_to_oracle(out, read_log_files(log_dir))
    assert res.summary["events_in"] == 2000
    assert res.summary["live_rows"] == len(replay_oracle(read_log_files(log_dir)))


def test_replay_idempotent_same_digests(log_dir, tmp_path):
    out = str(tmp_path / "lake")
    replay(log_dir, out, ReplayConfig(num_partitions=4))
    d1 = {p: m["digest"] for p, m in mf.read_all_manifests(out).items()}
    replay(log_dir, out, ReplayConfig(num_partitions=4))  # full re-run
    d2 = {p: m["digest"] for p, m in mf.read_all_manifests(out).items()}
    assert d1 == d2
    compare_to_oracle(out, read_log_files(log_dir))


def test_resume_from_checkpoint(log_dir, tmp_path):
    # replay buckets 0..2 as "first run", then resume over the full log
    out = str(tmp_path / "lake")
    partial = str(tmp_path / "partial_log")
    os.makedirs(partial)
    for k in range(3):
        shutil.copytree(
            os.path.join(log_dir, f"lsn_bucket={k}"),
            os.path.join(partial, f"lsn_bucket={k}"),
        )
    replay(partial, out, ReplayConfig(num_partitions=8))
    res = replay(log_dir, out, ReplayConfig(num_partitions=8), resume=True)
    # file-level pruning is bounded by the global-min checkpoint (a
    # partition whose last event came early lowers it), so expect at least
    # one fully-applied bucket pruned; row-level filters handle the rest
    assert res.summary["files_pruned"] >= 1
    compare_to_oracle(out, read_log_files(log_dir))


def test_resume_is_noop_when_caught_up(log_dir, tmp_path):
    out = str(tmp_path / "lake")
    replay(log_dir, out, ReplayConfig(num_partitions=4))
    d1 = {p: m["digest"] for p, m in mf.read_all_manifests(out).items()}
    res = replay(log_dir, out, ReplayConfig(num_partitions=4), resume=True)
    # nothing new: every file pruned, no partitions recommitted
    assert res.summary["partitions_committed"] == 0
    d2 = {p: m["digest"] for p, m in mf.read_all_manifests(out).items()}
    assert d1 == d2


def test_resume_refuses_foreign_key_hash_version(log_dir, tmp_path):
    """Partition layout is key_hash % P: resuming a lake committed under a
    different hash mapping would migrate keys across partitions (duplicate
    rows, mis-applied checkpoints) — must fail loudly, full replay only."""
    out = str(tmp_path / "lake")
    replay(log_dir, out, ReplayConfig(num_partitions=4))
    # doctor one manifest to an alien version
    pdir = os.path.join(out, "part=0")
    with open(os.path.join(pdir, "manifest.json")) as f:
        m = json.load(f)
    m["stats"]["key_hash_version"] = 999
    with open(os.path.join(pdir, "manifest.json"), "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="key_hash_version"):
        replay(log_dir, out, ReplayConfig(num_partitions=4), resume=True)
    # full (non-resume) replay over the same lake still works
    res = replay(log_dir, out, ReplayConfig(num_partitions=4))
    assert res.summary["partitions_committed"] == 4


def test_combiner_off_same_result(log_dir, tmp_path):
    out = str(tmp_path / "lake")
    replay(log_dir, out, ReplayConfig(num_partitions=4, combine_before_shuffle=False))
    compare_to_oracle(out, read_log_files(log_dir))


def test_hot_key_skew_replay(tmp_path):
    # one hot repo holding ~80% of keys still spreads across partitions
    d = str(tmp_path / "log")
    spec = ChangeLogSpec(n_keys=400, n_events=3000, hot_repo_share=0.8, num_buckets=4)
    write_change_log(spec, d)
    out = str(tmp_path / "lake")
    res = replay(d, out, ReplayConfig(num_partitions=8))
    compare_to_oracle(out, generate_change_log(spec))
    # hash(repo, path) salting: hot repo must not collapse into one partition
    parts_used = (res.metrics["live_rows"] > 0).sum()
    assert parts_used >= 6
    largest = res.metrics["events_in"].max() / res.metrics["events_in"].sum()
    assert largest < 0.5


def test_orphans_audited(tmp_path):
    d = str(tmp_path / "log")
    spec = ChangeLogSpec(n_keys=200, n_events=1500, orphan_frac=0.2, num_buckets=2)
    write_change_log(spec, d)
    out = str(tmp_path / "lake")
    res = replay(d, out, ReplayConfig(num_partitions=4))
    assert res.summary["orphan_events_applied"] + res.summary["orphan_deletes"] > 0
    compare_to_oracle(out, generate_change_log(spec))


def test_manifests_only_source_of_truth(log_dir, tmp_path):
    out = str(tmp_path / "lake")
    replay(log_dir, out, ReplayConfig(num_partitions=4))
    # drop an orphan temp file into a partition dir; readers must ignore it
    junk = os.path.join(out, "part=0", "data-e99.parquet.inprogress")
    with open(junk, "wb") as f:
        f.write(b"garbage")
    compare_to_oracle(out, read_log_files(log_dir))
    m = mf.read_manifest(out, 0)
    assert m["epoch"] == 0 and len(m["files"]) == 1


def test_metrics_and_summary_written(log_dir, tmp_path):
    out = str(tmp_path / "lake")
    res = replay(log_dir, out, ReplayConfig(num_partitions=4))
    assert os.path.exists(os.path.join(out, "run_summary.json"))
    with open(os.path.join(out, "part=0", "metrics.json")) as f:
        m = json.load(f)
    for k in ("events_in", "live_rows", "max_lsn", "duration_s", "bytes_written"):
        assert k in m
    assert res.summary["events_in"] == sum(res.metrics["events_in"])
    # exchange-volume observability: both phases report routed Arrow bytes
    assert res.summary["p1_routed_mb"] > 0
    assert res.summary["p2_routed_mb"] > 0


def test_read_lake_streaming(log_dir, tmp_path):
    out = str(tmp_path / "lake")
    replay(log_dir, out, ReplayConfig(num_partitions=4))
    ds = read_lake(out, columns=["repo", "path", "lsn"])
    assert ds.count() == len(replay_oracle(read_log_files(log_dir)))
    assert set(ds.schema().names) == {"repo", "path", "lsn"}


def test_read_lake_filter_pushdown(log_dir, tmp_path):
    import pyarrow.dataset as pads

    out = str(tmp_path / "lake")
    replay(log_dir, out, ReplayConfig(num_partitions=4))
    want = replay_oracle(read_log_files(log_dir))
    want_py = want[want["lang"] == "py"]
    ds = read_lake(out, columns=["repo", "path", "lang"], filter=pads.field("lang") == "py")
    got = ds.to_pandas()
    assert len(got) == len(want_py) > 0
    assert set(got["lang"]) == {"py"}


def test_all_exchange_strategies_identical(log_dir, tmp_path):
    """late / actor / groupby must produce byte-identical lake digests."""
    digests = {}
    for mode in ("late", "actor", "groupby"):
        out = str(tmp_path / f"lake_{mode}")
        replay(
            log_dir,
            out,
            ReplayConfig(
                num_partitions=8, exchange=mode, allow_comparison_modes=True
            ),
        )
        digests[mode] = {
            p: m["digest"] for p, m in mf.read_all_manifests(out).items()
        }
    assert digests["late"] == digests["actor"] == digests["groupby"]


def test_late_resume_with_deletes_superseding_all_keys(tmp_path):
    """A resume whose new events delete every key in a partition must
    commit an EMPTY epoch superseding prior state (late-mode edge)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d1 = str(tmp_path / "log1")
    os.makedirs(d1 + "/lsn_bucket=0")
    t1 = pa.table(
        {
            "lsn": [1, 2],
            "op": ["I", "I"],
            "repo": ["r1", "r2"],
            "path": ["a", "b"],
            "commit": ["c1", "c2"],
            "lang": ["py", "py"],
            "content": ["x", "y"],
        }
    )
    pq.write_table(t1, d1 + "/lsn_bucket=0/events.parquet")
    out = str(tmp_path / "lake")
    replay(d1, out, ReplayConfig(num_partitions=2))
    assert lake_table(out).num_rows == 2
    d2 = str(tmp_path / "log2")
    shutil.copytree(d1, d2)
    os.makedirs(d2 + "/lsn_bucket=1")
    t2 = pa.table(
        {
            "lsn": [3, 4],
            "op": ["D", "D"],
            "repo": ["r1", "r2"],
            "path": ["a", "b"],
            "commit": ["c1", "c2"],
            "lang": ["py", "py"],
            "content": [None, None],
        }
    )
    pq.write_table(t2, d2 + "/lsn_bucket=1/events.parquet")
    res = replay(d2, out, ReplayConfig(num_partitions=2), resume=True)
    assert lake_table(out).num_rows == 0
    assert res.summary["deleted_keys"] == 2


def test_hot_single_key_combiner(tmp_path):
    """One (repo, path) receives 90% of all events (the single-hot-KEY skew
    the phase-1 combiner is the valve for).  Combiner on/off must produce
    identical lakes, and both must match the oracle."""
    import numpy as np

    n, hot_frac = 20_000, 0.9
    rng = np.random.default_rng(7)
    hot = rng.random(n) < hot_frac
    key_id = np.where(hot, 0, rng.integers(1, 50, n))
    lsn = np.arange(n, dtype=np.int64)
    op = np.where(lsn % 17 == 3, "D", np.where(key_id == 0, "U", "I"))
    # give the hot key a real initial insert (fancy-index assignment into a
    # copy was a silent no-op before)
    hot_idx = np.flatnonzero(key_id == 0)[:1]
    op[hot_idx] = "I"
    tbl = pa.table(
        {
            "lsn": lsn,
            "op": pa.array(op.tolist(), pa.string()),
            "repo": pa.array([f"org/r{k % 5}" for k in key_id], pa.string()),
            "path": pa.array([f"f{k}.py" for k in key_id], pa.string()),
            "commit": pa.array([f"{k:040x}" for k in key_id], pa.string()),
            "lang": pa.array(["py"] * n, pa.string()),
            "content": pa.array(
                [None if o == "D" else f"body {k} {l}" for o, k, l in zip(op, key_id, lsn)],
                pa.string(),
            ),
        }
    )
    d = str(tmp_path / "log" / "lsn_bucket=0")
    os.makedirs(d)
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    log = str(tmp_path / "log")

    lakes = {}
    for combine in (True, False):
        out = str(tmp_path / f"lake_{combine}")
        replay(log, out, ReplayConfig(num_partitions=4, phase1_combine=combine))
        compare_to_oracle(out, tbl)
        lakes[combine] = {p: m["digest"] for p, m in mf.read_all_manifests(out).items()}
    assert lakes[True] == lakes[False]


def test_resume_after_partial_crash_rebuilds_missing_partition(tmp_path):
    """Crash simulation: a run that committed only SOME partitions (e.g.
    killed mid-commit) must not let the surviving partitions' high
    checkpoints file-prune events that the missing partition still needs."""
    d = str(tmp_path / "log")
    write_change_log(ChangeLogSpec(n_keys=400, n_events=4000, num_buckets=8), d)
    out = str(tmp_path / "lake")
    replay(d, out, ReplayConfig(num_partitions=4))
    # simulate a crash that lost partition 2's commit entirely
    import shutil as sh

    sh.rmtree(os.path.join(out, "part=2"))
    res = replay(d, out, ReplayConfig(num_partitions=4), resume=True)
    assert res.summary["partitions_committed"] >= 1
    compare_to_oracle(out, read_log_files(d))


def test_winner_filter_bitmap_and_sorted_paths():
    """The phase-2 winner membership test must be exact in both
    representations: dense-span bitmap and wide-span sorted fallback."""
    import numpy as np

    from sql_etl_pipeline_ray.pipelines.replay import (
        make_winner_filter,
        winner_membership,
    )

    rng = np.random.default_rng(3)
    winners = np.sort(rng.choice(1_000_000, size=5_000, replace=False).astype(np.int64))
    probe = np.concatenate([winners[::7], rng.integers(-10, 1_100_000, 20_000)])
    truth = np.isin(probe, winners)

    dense = make_winner_filter(winners)
    assert dense[0] == "bitmap"
    assert np.array_equal(winner_membership(dense, probe), truth)

    # wide span (timestamp-like LSNs) falls back to bloom + exact verify —
    # still EXACT despite the bloom's false positives
    wide = winners * 10_000_000_000
    probe_w = np.concatenate([wide[::7], rng.integers(0, wide[-1] + 5, 20_000)])
    f = make_winner_filter(wide)
    assert f[0] == "bloom"
    assert np.array_equal(winner_membership(f, probe_w), np.isin(probe_w, wide))

    # empty winner set: nothing matches
    empty = make_winner_filter(np.zeros(0, np.int64))
    assert not winner_membership(empty, probe).any()


def test_winner_filter_null_lsn_rows():
    """Phase 2 re-reads the raw log, so batches can carry NULL lsn rows
    (numpy float64 + NaN) — membership must treat them as non-winners in
    both representations."""
    import numpy as np

    from sql_etl_pipeline_ray.pipelines.replay import (
        make_winner_filter,
        winner_membership,
    )

    winners = np.array([2, 5, 9], dtype=np.int64)
    lsn = np.array([2.0, np.nan, 5.0, 7.0, np.nan], dtype=np.float64)
    want = np.array([True, False, True, False, False])
    assert np.array_equal(winner_membership(make_winner_filter(winners), lsn), want)
    assert np.array_equal(winner_membership(("sorted", winners), lsn), want)


def test_winner_filter_multi_matches_single():
    """The off-driver merged filter (per-partition sorted arrays OR'd into
    one bitmap, or concat+sorted for wide spans) must be membership-
    equivalent to the single-array build on the union of the parts."""
    import numpy as np

    from sql_etl_pipeline_ray.pipelines.replay import (
        make_winner_filter,
        make_winner_filter_multi,
        winner_membership,
    )

    rng = np.random.default_rng(9)
    winners = np.sort(rng.choice(800_000, size=6_000, replace=False).astype(np.int64))
    # split into uneven per-partition slices by hash (overlapping spans)
    parts = [np.sort(winners[winners % 5 == k]) for k in range(5)]
    parts.append(np.zeros(0, np.int64))  # an empty partition is fine
    probe = np.concatenate([winners[::11], rng.integers(-5, 900_000, 30_000)])
    truth = winner_membership(make_winner_filter(winners), probe)

    merged = make_winner_filter_multi(parts)
    assert merged[0] == "bitmap"
    assert np.array_equal(winner_membership(merged, probe), truth)

    # wide span -> bloom path via concat+sort, still exact
    wide_parts = [p * 10_000_000_000 for p in parts]
    merged_w = make_winner_filter_multi(wide_parts)
    assert merged_w[0] == "bloom"
    probe_w = probe * 10_000_000_000
    assert np.array_equal(
        winner_membership(merged_w, probe_w),
        winner_membership(make_winner_filter(winners * 10_000_000_000), probe_w),
    )

    # all-empty input
    assert not winner_membership(make_winner_filter_multi([]), probe).any()


def test_cluster_by_key_sorted_files_same_lake(log_dir, tmp_path):
    """SinkConfig(cluster_by_key=True) must write key-sorted partition
    files (row-group stats become useful to filtered readers) with the
    SAME lake content as the default hash-ordered sink."""
    from sql_etl_pipeline_ray.config import SinkConfig
    from sql_etl_pipeline_ray.state import manifest as mf
    import pyarrow.parquet as pq_

    plain, clustered = str(tmp_path / "plain"), str(tmp_path / "clustered")
    replay(log_dir, plain, ReplayConfig(num_partitions=4))
    replay(
        log_dir, clustered, ReplayConfig(num_partitions=4),
        sink=SinkConfig(out_dir=clustered, cluster_by_key=True),
    )
    a = lake_table(plain)
    b = lake_table(clustered)
    assert a.equals(b)  # lake_table sorts by key — content identical
    files = mf.manifest_data_files(clustered, mf.read_all_manifests(clustered))
    checked = 0
    for f in files:
        t = pq_.read_table(f, columns=["repo", "path"])
        if len(t) < 2:
            continue
        keys = list(zip(t.column("repo").to_pylist(), t.column("path").to_pylist()))
        assert keys == sorted(keys), f"{f} not key-sorted"
        checked += 1
    assert checked > 0


def test_bucket_missing_canonical_column_null_fills(tmp_path):
    """A log bucket that predates a canonical column (here: no 'lang')
    must replay cleanly — conform null-fills it — and a later bucket that
    has the column wins per key as usual."""
    spec = ChangeLogSpec(n_keys=100, n_events=600, num_buckets=2, seed=13)
    events = generate_change_log(spec)
    half = len(events) // 2
    old_bucket = events.slice(0, half).drop_columns(["lang"])
    new_bucket = events.slice(half)
    d = str(tmp_path / "log")
    os.makedirs(d)
    pq.write_table(old_bucket, os.path.join(d, "bucket-000.parquet"))
    pq.write_table(new_bucket, os.path.join(d, "bucket-001.parquet"))
    out = str(tmp_path / "lake")
    res = replay(d, out, ReplayConfig(num_partitions=4))
    assert res.summary["events_in"] == 600
    got = lake_table(out).to_pandas()
    # oracle over the same shape: lang nulled for the first half
    ev = events.to_pandas()
    ev.loc[: half - 1, "lang"] = None
    want = replay_oracle(pa.Table.from_pandas(ev, preserve_index=False))
    got = got[want.columns].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, want.reset_index(drop=True), check_dtype=False
    )
    # keys whose winner came from the old bucket carry null lang
    assert got["lang"].isna().any() and got["lang"].notna().any()


def test_read_lake_mixed_partition_schemas_after_partial_evolution(tmp_path):
    """A resume whose new (evolved) events touch only SOME partitions
    leaves the lake with mixed-schema partition files (untouched
    partitions are exactly-once no-ops).  read_lake must surface the
    union schema — Ray's reader otherwise silently drops the evolved
    column on a plain read and raises on a projection naming it."""
    log = str(tmp_path / "log")
    write_change_log(ChangeLogSpec(n_events=1000, n_keys=150, num_buckets=2, seed=7), log)
    out = str(tmp_path / "lake")
    replay(log, out, ReplayConfig(num_partitions=4))
    b2 = pa.table(
        {
            "lsn": pa.array([10_000_000], pa.int64()), "op": ["I"],
            "repo": ["zzz/solo"], "path": ["only.py"], "commit": ["c"],
            "lang": ["py"], "content": ["x"],
            "size_bytes": pa.array([1], pa.int64()),
        }
    )
    pq.write_table(b2, os.path.join(log, "bucket-extra.parquet"))
    res = replay(log, out, ReplayConfig(num_partitions=4), resume=True)
    assert 0 < res.summary["partitions_committed"] < 4  # genuinely mixed
    n = len(lake_table(out))
    ds = read_lake(out)
    assert "size_bytes" in ds.schema().names
    assert ds.count() == n
    proj = read_lake(out, columns=["repo", "size_bytes"])
    got = proj.to_pandas()
    assert len(got) == n
    assert got["size_bytes"].notna().sum() == 1


def test_resume_preserves_evolved_prior_values_in_mixed_lake(tmp_path):
    """Second resume over a mixed-schema lake: a prior row whose evolved
    column lives only in SOME partition files must re-enter the fold with
    its value intact (a reader that drops the column would null it
    silently — the conform stage would hide the loss as null-fill)."""

    def one_event(lsn, repo, path, **extra):
        cols = {
            "lsn": pa.array([lsn], pa.int64()), "op": ["I"], "repo": [repo],
            "path": [path], "commit": ["c"], "lang": ["py"], "content": ["x"],
        }
        for k, v in extra.items():
            cols[k] = pa.array([v], pa.int64())
        return pa.table(cols)

    log = str(tmp_path / "log")
    write_change_log(ChangeLogSpec(n_events=1000, n_keys=150, num_buckets=2, seed=7), log)
    out = str(tmp_path / "lake")
    replay(log, out, ReplayConfig(num_partitions=4))
    pq.write_table(
        one_event(10_000_000, "zzz/solo", "only.py", size_bytes=7),
        os.path.join(log, "bucket-extra.parquet"),
    )
    replay(log, out, ReplayConfig(num_partitions=4), resume=True)  # mixed lake
    # second key chosen to hash into solo's partition so that partition
    # recommits and the evolved prior row re-enters through phase 2
    pq.write_table(
        one_event(20_000_000, "zzz/other", "other0.py"),
        os.path.join(log, "bucket-extra2.parquet"),
    )
    replay(log, out, ReplayConfig(num_partitions=4), resume=True)
    lt = lake_table(out).to_pandas().set_index("path")
    assert lt.loc["only.py", "size_bytes"] == 7
    assert pd.isna(lt.loc["other0.py", "size_bytes"])


def _pending_sorted(ds):
    df = ds.to_pandas()
    return df.sort_values(["repo", "path"]).reset_index(drop=True)


def test_read_lake_with_pending_equals_full_replay(log_dir, tmp_path):
    from sql_etl_pipeline_ray.pipelines.replay import read_lake_with_pending

    # commit only the first half of the log, leave the rest as pending tail
    out = str(tmp_path / "lake")
    partial = str(tmp_path / "partial_log")
    os.makedirs(partial)
    for k in range(3):
        shutil.copytree(
            os.path.join(log_dir, f"lsn_bucket={k}"),
            os.path.join(partial, f"lsn_bucket={k}"),
        )
    replay(partial, out, ReplayConfig(num_partitions=8))
    before = {p: m["digest"] for p, m in mf.read_all_manifests(out).items()}

    merged = _pending_sorted(read_lake_with_pending(log_dir, out))

    # nothing committed by the read
    after = {p: m["digest"] for p, m in mf.read_all_manifests(out).items()}
    assert before == after

    # the merged view IS the fully-replayed lake
    full = str(tmp_path / "lake_full")
    replay(log_dir, full, ReplayConfig(num_partitions=8))
    want = (
        lake_table(full)
        .to_pandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    got = merged[want.columns.tolist()]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_read_lake_with_pending_empty_tail_is_lake(log_dir, tmp_path):
    from sql_etl_pipeline_ray.pipelines.replay import read_lake_with_pending

    out = str(tmp_path / "lake")
    replay(log_dir, out, ReplayConfig(num_partitions=4))
    got = _pending_sorted(read_lake_with_pending(log_dir, out))
    want = (
        lake_table(out)
        .to_pandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want, check_dtype=False)


def test_read_lake_with_pending_schema_evolution(tmp_path):
    from sql_etl_pipeline_ray.pipelines.replay import read_lake_with_pending

    # evolution kicks in at 50% of LSNs: commit the pre-evolution half,
    # let the pending tail carry the evolved column (size_bytes)
    spec = ChangeLogSpec(
        n_keys=200, n_events=1500, num_buckets=6, seed=9, evolve_after_frac=0.5
    )
    log = str(tmp_path / "log")
    write_change_log(spec, log)
    partial = str(tmp_path / "partial_log")
    os.makedirs(partial)
    for k in range(3):
        shutil.copytree(
            os.path.join(log, f"lsn_bucket={k}"),
            os.path.join(partial, f"lsn_bucket={k}"),
        )
    out = str(tmp_path / "lake")
    replay(partial, out, ReplayConfig(num_partitions=4))
    merged = _pending_sorted(read_lake_with_pending(log, out))
    assert "size_bytes" in merged.columns

    full = str(tmp_path / "lake_full")
    replay(log, full, ReplayConfig(num_partitions=4))
    want = (
        lake_table(full)
        .to_pandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        merged[want.columns.tolist()], want, check_dtype=False
    )


def test_lake_lag_footer_only_report(log_dir, tmp_path):
    from sql_etl_pipeline_ray.pipelines.replay import lake_lag

    out = str(tmp_path / "lake")
    partial = str(tmp_path / "partial_log")
    os.makedirs(partial)
    for k in range(3):
        shutil.copytree(
            os.path.join(log_dir, f"lsn_bucket={k}"),
            os.path.join(partial, f"lsn_bucket={k}"),
        )
    replay(partial, out, ReplayConfig(num_partitions=4))
    lag = lake_lag(log_dir, out)
    all_events = read_log_files(log_dir)
    assert lag["log_rows"] == len(all_events)
    assert lag["log_max_lsn"] == int(pd.Series(all_events["lsn"]).max())
    assert not lag["caught_up"] and lag["lsn_lag"] > 0
    # the partial run stamped its scan max as the applied high water; the
    # upper bound is a bound on rows above THAT
    true_pending = int((pd.Series(all_events["lsn"]) > lag["applied_hwm"]).sum())
    assert lag["pending_rows_upper_bound"] >= true_pending > 0
    assert lag["pending_files"] >= 3  # the three un-replayed buckets

    # catch up -> lag report flips
    replay(log_dir, out, ReplayConfig(num_partitions=4), resume=True)
    lag2 = lake_lag(log_dir, out)
    assert lag2["caught_up"] and lag2["lsn_lag"] == 0


def test_lake_get_point_read(log_dir, tmp_path):
    from sql_etl_pipeline_ray.pipelines.replay import lake_get, plan_point_read

    out = str(tmp_path / "lake")
    replay(log_dir, out, ReplayConfig(num_partitions=8))
    events = read_log_files(log_dir).to_pandas()
    want = replay_oracle(read_log_files(log_dir))
    live = want.set_index(["repo", "path"]).sort_index()
    dead = sorted(
        set(zip(events.repo, events.path)) - set(live.index)
    )  # keys whose last event deleted them

    # single live key: exactly its oracle row, touched ONE partition
    k0 = live.index[7]
    plan = plan_point_read(out, [k0])
    assert plan["total_partitions"] == 8 and len(plan["parts"]) == 1
    got = lake_get(out, [k0]).to_pandas()
    assert len(got) == 1
    row = live.loc[k0]
    assert got.loc[0, "content"] == row["content"]
    assert got.loc[0, "lsn"] == row["lsn"]
    assert got.loc[0, "content_sha256"] == row["content_sha256"]

    # deleted + never-inserted keys yield no rows (not stale versions)
    assert len(lake_get(out, [dead[0], ("no/such", "repo.py")])) == 0

    # multi-key batch with mixed live/dead: exactly the live subset,
    # sorted by (repo, path); cross-product superset must not leak —
    # request keys spanning several repos and paths
    some = [live.index[i] for i in (0, 3, 11, 55, 200)] + dead[:2]
    got = lake_get(out, some).to_pandas()
    exp = live.loc[[k for k in some if k in live.index]].reset_index()
    exp = exp.sort_values(["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[exp.columns.tolist()], exp, check_dtype=False
    )
    # requested pairs only — no (repo_i, path_j) cross-match rows
    assert set(zip(got.repo, got.path)) <= set(some)

    # projection keeps working (key columns added internally, then cut)
    got = lake_get(out, [k0], columns=["content", "lsn"])
    assert got.column_names == ["content", "lsn"] and len(got) == 1

    # empty lake
    assert len(lake_get(str(tmp_path / "nolake"), [k0])) == 0


def test_lake_get_on_evolved_lake(tmp_path):
    """Point reads against a mixed-schema lake (partial-evolution resume)
    surface evolved columns through the union-schema read path."""
    from sql_etl_pipeline_ray.pipelines.replay import lake_get

    log = str(tmp_path / "log")
    write_change_log(
        ChangeLogSpec(
            n_keys=120, n_events=900, num_buckets=4, evolve_after_frac=0.5
        ),
        log,
    )
    out = str(tmp_path / "lake")
    replay(log, out, ReplayConfig(num_partitions=4))
    want = replay_oracle(read_log_files(log)).set_index(["repo", "path"])
    assert "size_bytes" in want.columns
    # a key whose live row carries the evolved column, and one without
    with_sb = want[want["size_bytes"].notna()].index[0]
    without = want[want["size_bytes"].isna()].index[0]
    got = lake_get(out, [with_sb, without]).to_pandas().set_index(["repo", "path"])
    assert got.loc[with_sb, "size_bytes"] == want.loc[with_sb, "size_bytes"]
    assert pd.isna(got.loc[without, "size_bytes"])
    assert got.loc[with_sb, "content"] == want.loc[with_sb, "content"]


def test_lake_lag_statless_footers_never_claim_catchup(tmp_path):
    """A foreign log whose Parquet footers carry NO lsn statistics must
    report NOT caught up (its rows count as pending), never a false
    all-clear off the -1 sentinel."""
    from sql_etl_pipeline_ray.pipelines.replay import lake_lag

    lake = str(tmp_path / "lake")
    os.makedirs(lake)
    foreign = str(tmp_path / "foreign_log")
    os.makedirs(foreign)
    t = pa.table({"lsn": [1, 2, 3], "repo": ["a"] * 3, "path": ["p"] * 3})
    pq.write_table(
        t, os.path.join(foreign, "x.parquet"),
        write_statistics=False,
    )
    lag = lake_lag(foreign, lake)
    assert not lag["caught_up"]
    assert lag["pending_rows_upper_bound"] == 3
