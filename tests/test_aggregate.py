"""Aggregate-state ingest (pipelines/aggregate.py): keyed rollup lake.

Oracle: single-process dict fold — per key, sum/min/max/count of deltas
with lsn above the key's last reset.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sql_etl_pipeline_ray.pipelines.aggregate import replay_aggregate
from sql_etl_pipeline_ray.pipelines.replay import read_lake


def _gen(n: int, keys: int, seed: int, reset_rate: float = 0.03) -> list[tuple]:
    rng = np.random.default_rng(seed)
    k = rng.integers(0, keys, n)
    d = rng.random(n) < reset_rate
    v = rng.integers(-50, 200, n)
    return [
        (i + 1, "D" if d[i] else ("I" if i % 2 else "U"),
         f"r{k[i] % 5}", f"k{k[i]}", None if d[i] else int(v[i]))
        for i in range(n)
    ]


def _write(rows: list[tuple], log_dir: str, buckets: int = 4) -> None:
    os.makedirs(log_dir, exist_ok=True)
    per = (len(rows) + buckets - 1) // buckets
    for b in range(buckets):
        chunk = rows[b * per:(b + 1) * per]
        if not chunk:
            continue
        pq.write_table(
            pa.table({
                "lsn": pa.array([r[0] for r in chunk], pa.int64()),
                "op": pa.array([r[1] for r in chunk]),
                "repo": pa.array([r[2] for r in chunk]),
                "path": pa.array([r[3] for r in chunk]),
                "delta": pa.array([r[4] for r in chunk], pa.int64()),
            }),
            os.path.join(log_dir, f"b{b:02d}.parquet"),
            row_group_size=64,
        )


def _oracle(rows: list[tuple]) -> dict[tuple, tuple]:
    state: dict[tuple, list] = {}
    for lsn, op, repo, path, v in sorted(rows):
        key = (repo, path)
        if op == "D":
            state.pop(key, None)
        else:
            s = state.get(key)
            if s is None:
                state[key] = [v, v, v, 1, lsn]
            else:
                s[0] += v
                s[1] = min(s[1], v)
                s[2] = max(s[2], v)
                s[3] += 1
                s[4] = lsn
    return {k: tuple(v) for k, v in state.items()}


def _lake_state(out_dir: str) -> dict[tuple, tuple]:
    df = read_lake(out_dir).to_pandas()
    return {
        (r.repo, r.path): (r.delta_sum, r.delta_min, r.delta_max,
                           r.n_events, r.last_lsn)
        for r in df.itertuples()
    }


def test_full_replay_matches_oracle(tmp_path):
    rows = _gen(4000, 300, seed=7)
    log = str(tmp_path / "log")
    _write(rows, log)
    res = replay_aggregate(log, str(tmp_path / "lake"), ["delta"],
                           num_partitions=8)
    want = _oracle(rows)
    assert _lake_state(str(tmp_path / "lake")) == want
    assert res.summary["live_rows"] == len(want)


def test_resume_equals_one_shot(tmp_path):
    rows = _gen(3000, 200, seed=11)
    full, prefix = str(tmp_path / "full"), str(tmp_path / "prefix")
    _write(rows, full, buckets=6)
    _write(rows[:1500], prefix, buckets=3)
    lake1 = str(tmp_path / "one_shot")
    replay_aggregate(full, lake1, ["delta"], num_partitions=8)
    lake2 = str(tmp_path / "incremental")
    replay_aggregate(prefix, lake2, ["delta"], num_partitions=8)
    replay_aggregate(full, lake2, ["delta"], resume=True)
    assert _lake_state(lake1) == _lake_state(lake2)


def test_reset_across_increments(tmp_path):
    """A reset in increment 2 discards state committed by increment 1,
    then later adds rebuild from zero."""
    rows = [
        (1, "I", "r", "k", 10),
        (2, "I", "r", "k", 5),
        (3, "D", "r", "k", None),
        (4, "I", "r", "k", 7),
        (5, "U", "r", "k", 2),
    ]
    log1, log2 = str(tmp_path / "l1"), str(tmp_path / "l2")
    _write(rows[:2], log1, buckets=1)
    lake = str(tmp_path / "lake")
    replay_aggregate(log1, lake, ["delta"], num_partitions=4)
    assert _lake_state(lake)[("r", "k")] == (15, 5, 10, 2, 2)
    # increment arrives as additional buckets of the same dir
    _write(rows[2:], os.path.join(log1, "more"), buckets=1)
    replay_aggregate(log1, lake, ["delta"], resume=True)
    assert _lake_state(lake)[("r", "k")] == (9, 2, 7, 2, 5)


def test_trailing_reset_removes_key(tmp_path):
    rows = [(1, "I", "r", "a", 4), (2, "I", "r", "b", 6), (3, "D", "r", "a", None)]
    log = str(tmp_path / "log")
    _write(rows, log, buckets=1)
    lake = str(tmp_path / "lake")
    replay_aggregate(log, lake, ["delta"], num_partitions=4)
    st = _lake_state(lake)
    assert ("r", "a") not in st and st[("r", "b")] == (6, 6, 6, 1, 2)


def test_double_replay_is_exactly_once(tmp_path):
    """Re-running over the same log must NOT double-count (the property
    additive state uniquely depends on)."""
    rows = _gen(1000, 80, seed=3)
    log = str(tmp_path / "log")
    _write(rows, log)
    lake = str(tmp_path / "lake")
    replay_aggregate(log, lake, ["delta"], num_partitions=4)
    first = _lake_state(lake)
    replay_aggregate(log, lake, ["delta"], resume=True)
    assert _lake_state(lake) == first == _oracle(rows)


def test_full_rerun_refused_on_committed_lake(tmp_path):
    rows = _gen(100, 10, seed=1)
    log = str(tmp_path / "log")
    _write(rows, log, buckets=1)
    lake = str(tmp_path / "lake")
    replay_aggregate(log, lake, ["delta"], num_partitions=2)
    with pytest.raises(ValueError, match="double-count"):
        replay_aggregate(log, lake, ["delta"])


def test_invalid_events_dropped(tmp_path):
    rows = [(1, "I", "r", "a", 4), (2, "X", "r", "a", 1),
            (3, "I", "r", "a", None), (4, "U", "r", "a", 6)]
    log = str(tmp_path / "log")
    _write(rows, log, buckets=1)
    lake = str(tmp_path / "lake")
    replay_aggregate(log, lake, ["delta"], num_partitions=2)
    # bad op and null delta dropped; adds at lsn 1 and 4 survive
    assert _lake_state(lake)[("r", "a")] == (10, 4, 6, 2, 4)


def test_missing_value_column_raises(tmp_path):
    rows = [(1, "I", "r", "a", 4)]
    log = str(tmp_path / "log")
    _write(rows, log, buckets=1)
    with pytest.raises(ValueError, match="value column"):
        replay_aggregate(log, str(tmp_path / "lake"), ["nope"])


def _mor_sink(lake):
    from sql_etl_pipeline_ray.config import SinkConfig
    return SinkConfig(out_dir=lake, merge_on_read=True, keep_epochs=2)


def test_mor_resume_equals_cow(tmp_path):
    """A merge-on-read resume folds to the same state as copy-on-write,
    while writing only the increment."""
    from sql_etl_pipeline_ray.pipelines.aggregate import read_aggregate_lake

    rows = _gen(4000, 250, seed=21)
    full, prefix = str(tmp_path / "full"), str(tmp_path / "pre")
    _write(rows, full, buckets=8)
    _write(rows[:3000], prefix, buckets=6)
    cow, mor = str(tmp_path / "cow"), str(tmp_path / "mor")
    for lake in (cow, mor):
        replay_aggregate(prefix, lake, ["delta"], num_partitions=4)
    replay_aggregate(full, cow, ["delta"], resume=True)
    replay_aggregate(full, mor, ["delta"], resume=True, sink=_mor_sink(mor))
    want = _oracle(rows)
    got_cow = _lake_state(cow)
    df = read_aggregate_lake(mor).to_pandas()
    got_mor = {
        (r.repo, r.path): (r.delta_sum, r.delta_min, r.delta_max,
                           r.n_events, r.last_lsn)
        for r in df.itertuples()
    }
    assert got_cow == want
    assert got_mor == want
    # the MOR lake actually chained (some partition has >1 file)
    from sql_etl_pipeline_ray.state import manifest as mf2
    kinds = {m.get("kind") for m in mf2.read_all_manifests(mor).values()}
    assert "delta" in kinds


def test_mor_reset_in_delta_kills_base_key(tmp_path):
    from sql_etl_pipeline_ray.pipelines.aggregate import read_aggregate_lake

    rows1 = [(1, "I", "r", "a", 5), (2, "I", "r", "b", 9)]
    rows2 = [(3, "D", "r", "a", None),                 # reset away entirely
             (4, "D", "r", "b", None), (5, "I", "r", "b", 2)]  # reset + re-add
    log = str(tmp_path / "log")
    _write(rows1, log, buckets=1)
    lake = str(tmp_path / "lake")
    replay_aggregate(log, lake, ["delta"], num_partitions=2)
    _write(rows2, os.path.join(log, "inc"), buckets=1)
    replay_aggregate(log, lake, ["delta"], resume=True, sink=_mor_sink(lake))
    df = read_aggregate_lake(lake).to_pandas()
    st = {(r.repo, r.path): (r.delta_sum, r.n_events) for r in df.itertuples()}
    assert st == {("r", "b"): (2, 1)}


def test_mor_chain_compacts_inline_and_standalone(tmp_path):
    from sql_etl_pipeline_ray.config import SinkConfig
    from sql_etl_pipeline_ray.pipelines.aggregate import (
        compact_aggregate_lake, read_aggregate_lake)
    from sql_etl_pipeline_ray.state import manifest as mf2

    log = str(tmp_path / "log")
    lake = str(tmp_path / "lake")
    rows = [(1, "I", "r", "k", 1)]
    _write(rows, log, buckets=1)
    replay_aggregate(log, lake, ["delta"], num_partitions=1)
    sink = SinkConfig(out_dir=lake, merge_on_read=True, keep_epochs=2,
                      max_delta_files=3)
    # three increments chain (base + 3 deltas); the fourth would be a
    # 4th delta > max_delta_files=3, so it compacts inline to a fresh base
    for i in range(4):
        _write([(2 + i, "I", "r", "k", 10 ** (i + 1))],
               os.path.join(log, f"inc{i}"), buckets=1)
        replay_aggregate(log, lake, ["delta"], resume=True, sink=sink)
    m = mf2.read_all_manifests(lake)[0]
    assert m.get("kind") != "delta" and len(m["files"]) == 1  # compacted
    st = _lake_state(lake)
    assert st[("r", "k")] == (11111, 1, 10000, 5, 5)
    # chain again, then standalone compact
    _write([(10, "I", "r", "k", 7)], os.path.join(log, "inc9"), buckets=1)
    replay_aggregate(log, lake, ["delta"], resume=True, sink=sink)
    assert mf2.read_all_manifests(lake)[0].get("kind") == "delta"
    out = compact_aggregate_lake(lake)
    assert out["partitions_compacted"] == 1
    assert mf2.read_all_manifests(lake)[0].get("kind") != "delta"
    assert _lake_state(lake)[("r", "k")] == (11118, 1, 10000, 6, 10)
    # the folded view equals the plain read now
    df = read_aggregate_lake(lake).to_pandas()
    assert len(df) == 1 and df.iloc[0].delta_sum == 11118


def test_read_lake_refuses_chained_aggregate(tmp_path):
    from sql_etl_pipeline_ray.pipelines.replay import read_lake as rl

    rows1 = [(1, "I", "r", "a", 5)]
    log = str(tmp_path / "log")
    _write(rows1, log, buckets=1)
    lake = str(tmp_path / "lake")
    replay_aggregate(log, lake, ["delta"], num_partitions=1)
    _write([(2, "I", "r", "a", 3)], os.path.join(log, "inc"), buckets=1)
    replay_aggregate(log, lake, ["delta"], resume=True, sink=_mor_sink(lake))
    with pytest.raises(ValueError, match="read_aggregate_lake"):
        rl(lake).count()


def _gen_dv(n: int, keys: int, dvals: int, seed: int, reset_rate=0.02):
    rng = np.random.default_rng(seed)
    k = rng.integers(0, keys, n)
    d = rng.random(n) < reset_rate
    v = rng.integers(0, 100, n)
    u = rng.integers(0, dvals, n)
    return [
        (i + 1, "D" if d[i] else "I", f"r{k[i] % 3}", f"k{k[i]}",
         None if d[i] else int(v[i]), None if d[i] else int(u[i]))
        for i in range(n)
    ]


def _write_dv(rows, log_dir, buckets=4):
    os.makedirs(log_dir, exist_ok=True)
    per = (len(rows) + buckets - 1) // buckets
    for b in range(buckets):
        chunk = rows[b * per:(b + 1) * per]
        if not chunk:
            continue
        pq.write_table(
            pa.table({
                "lsn": pa.array([r[0] for r in chunk], pa.int64()),
                "op": pa.array([r[1] for r in chunk]),
                "repo": pa.array([r[2] for r in chunk]),
                "path": pa.array([r[3] for r in chunk]),
                "delta": pa.array([r[4] for r in chunk], pa.int64()),
                "uid": pa.array([r[5] for r in chunk], pa.int64()),
            }),
            os.path.join(log_dir, f"b{b:02d}.parquet"), row_group_size=64)


def _hll_oracle(rows) -> dict[tuple, bytes]:
    """Brute per-key register recompute over post-last-reset uids."""
    from sql_etl_pipeline_ray.stages.sketch import hll_partial

    live: dict[tuple, list] = {}
    for lsn, op, repo, path, v, u in sorted(rows):
        key = (repo, path)
        if op == "D":
            live.pop(key, None)
        else:
            live.setdefault(key, []).append(u)
    return {
        k: hll_partial(np.array(us, np.int64), p=8).tobytes()
        for k, us in live.items()
    }


def _hll_lake(out_dir, reader=None) -> dict[tuple, bytes]:
    from sql_etl_pipeline_ray.pipelines.aggregate import read_aggregate_lake

    ds = (reader or read_aggregate_lake)(out_dir)
    df = ds.to_pandas()
    return {(r.repo, r.path): bytes(r.uid_hll) for r in df.itertuples()}


def test_distinct_state_matches_brute_registers(tmp_path):
    rows = _gen_dv(3000, 120, dvals=40, seed=5)
    log = str(tmp_path / "log")
    _write_dv(rows, log)
    lake = str(tmp_path / "lake")
    replay_aggregate(log, lake, ["delta"], num_partitions=4,
                     distinct_cols=["uid"], hll_p=8)
    assert _hll_lake(lake) == _hll_oracle(rows)


def test_distinct_state_resume_and_mor_equal_one_shot(tmp_path):
    rows = _gen_dv(2400, 100, dvals=64, seed=9)
    full, pre = str(tmp_path / "full"), str(tmp_path / "pre")
    _write_dv(rows, full, buckets=6)
    _write_dv(rows[:1200], pre, buckets=3)
    one = str(tmp_path / "one")
    replay_aggregate(full, one, ["delta"], num_partitions=4,
                     distinct_cols=["uid"], hll_p=8)
    want = _hll_lake(one)
    for mode in ("cow", "mor"):
        lake = str(tmp_path / mode)
        replay_aggregate(pre, lake, ["delta"], num_partitions=4,
                         distinct_cols=["uid"], hll_p=8)
        sink = _mor_sink(lake) if mode == "mor" else None
        replay_aggregate(full, lake, ["delta"], resume=True, sink=sink,
                         distinct_cols=["uid"], hll_p=8)
        assert _hll_lake(lake) == want == _hll_oracle(rows)


def test_distinct_estimate_near_exact(tmp_path):
    """The estimate off the per-key registers tracks the exact distinct
    count within HLL's error envelope at p=8 (~6.5% std error)."""
    from sql_etl_pipeline_ray.stages.sketch import hll_estimate

    rows = _gen_dv(6000, 6, dvals=500, seed=13, reset_rate=0.0)
    log = str(tmp_path / "log")
    _write_dv(rows, log)
    lake = str(tmp_path / "lake")
    replay_aggregate(log, lake, ["delta"], num_partitions=2,
                     distinct_cols=["uid"], hll_p=8)
    exact: dict[tuple, set] = {}
    for _l, op, repo, path, _v, u in rows:
        exact.setdefault((repo, path), set()).add(u)
    for key, regs in _hll_lake(lake).items():
        est = hll_estimate(np.frombuffer(regs, np.uint8))
        true = len(exact[key])
        assert abs(est - true) / true < 0.25, (key, est, true)


def test_resume_refuses_changed_aggregate_set(tmp_path):
    rows = _gen(200, 20, seed=2)
    log = str(tmp_path / "log")
    _write(rows, log, buckets=1)
    lake = str(tmp_path / "lake")
    replay_aggregate(log, lake, ["delta"], num_partitions=2)
    with pytest.raises(ValueError, match="cannot change on resume"):
        replay_aggregate(log, lake, ["delta"], resume=True,
                         distinct_cols=["delta"])


def test_aggregate_get_point_read_and_deep_fsck(tmp_path):
    from sql_etl_pipeline_ray.pipelines.aggregate import aggregate_get
    from sql_etl_pipeline_ray.pipelines.replay import fsck_lake

    rows = _gen(1500, 120, seed=17)
    log = str(tmp_path / "log")
    _write(rows, log)
    lake = str(tmp_path / "lake")
    replay_aggregate(log, lake, ["delta"], num_partitions=4)
    want = _oracle(rows)
    some = sorted(want)[:3]
    got = aggregate_get(lake, some)
    st = {(r.repo, r.path): (r.delta_sum, r.delta_min, r.delta_max,
                             r.n_events, r.last_lsn)
          for r in got.to_pandas().itertuples()}
    assert st == {k: want[k] for k in some}
    # absent key → absent row
    assert len(aggregate_get(lake, [("zzz", "nope")])) == 0
    # deep fsck is green on an aggregate lake (schema-defensive checks)
    rep = fsck_lake(lake, deep=True)
    assert rep["ok"], rep
    # ... and on a CHAINED aggregate lake, with point reads folding chains
    _write(rows[:200], os.path.join(log, "inc"), buckets=1)  # no new lsns
    _write([(100000, "I", some[0][0], some[0][1], 5)],
           os.path.join(log, "inc2"), buckets=1)
    replay_aggregate(log, lake, ["delta"], resume=True, sink=_mor_sink(lake))
    rep2 = fsck_lake(lake, deep=True)
    assert rep2["ok"], rep2
    got2 = aggregate_get(lake, [some[0]]).to_pandas().iloc[0]
    w = want[some[0]]
    assert (got2.delta_sum, got2.n_events, got2.last_lsn) == (
        w[0] + 5, w[3] + 1, 100000)


def _write_ts(rows, log_dir, buckets=2):
    """rows: (lsn, op, path, delta, ts_us)"""
    os.makedirs(log_dir, exist_ok=True)
    per = (len(rows) + buckets - 1) // buckets
    for b in range(buckets):
        chunk = rows[b * per:(b + 1) * per]
        if not chunk:
            continue
        pq.write_table(pa.table({
            "lsn": pa.array([r[0] for r in chunk], pa.int64()),
            "op": pa.array([r[1] for r in chunk]),
            "repo": pa.array(["w"] * len(chunk)),
            "path": pa.array([r[2] for r in chunk]),
            "delta": pa.array([r[3] for r in chunk], pa.int64()),
            "ts": pa.array([r[4] for r in chunk], pa.int64()),
        }), os.path.join(log_dir, f"b{b:02d}.parquet"), row_group_size=32)


def test_event_time_lateness_finalizes_windows(tmp_path):
    """Windowed rollup (window id in the key): after the watermark passes,
    an event for a closed window is dropped on resume; within allowed
    lateness it still applies."""
    log, lake = str(tmp_path / "log"), str(tmp_path / "lake")
    # phase 1: windows 0 and 1 (ts in [0, 2000)); watermark → 1900
    p1 = [(1, "I", "k|w0", 10, 100), (2, "I", "k|w0", 5, 900),
          (3, "I", "k|w1", 7, 1500), (4, "I", "k|w1", 2, 1900)]
    _write_ts(p1, log, buckets=1)
    r1 = replay_aggregate(log, lake, ["delta"], num_partitions=2,
                          event_time=("ts", 500))
    assert r1.summary["event_watermark"] == 1900
    assert r1.summary["late_events"] == 0
    # phase 2: one event within lateness (ts=1450 >= 1900-500), one too
    # late (ts=800 < 1400 — window 0 is FINAL), one new window
    p2 = [(10, "I", "k|w1", 100, 1450),
          (11, "I", "k|w0", 999, 800),
          (12, "I", "k|w2", 3, 2500)]
    _write_ts(p2, os.path.join(log, "inc"), buckets=1)
    r2 = replay_aggregate(log, lake, ["delta"], resume=True,
                          event_time=("ts", 500))
    assert r2.summary["late_events"] == 1
    assert r2.summary["event_watermark"] == 2500
    st = {p: s for (rp, p), (s, *_rest) in _lake_state(lake).items()}
    # w0 unchanged (late event dropped), w1 gained 100, w2 born
    assert st == {"k|w0": 15, "k|w1": 109, "k|w2": 3}


def test_event_time_full_replay_applies_everything(tmp_path):
    """Lateness only bites on RESUME — a full replay of a complete log
    applies every event regardless of timestamps (there is no prior
    watermark to violate)."""
    log, lake = str(tmp_path / "log"), str(tmp_path / "lake")
    rows = [(1, "I", "k|w0", 10, 100), (2, "I", "k|w1", 7, 9000),
            (3, "I", "k|w0", 5, 50)]
    _write_ts(rows, log, buckets=1)
    r = replay_aggregate(log, lake, ["delta"], num_partitions=2,
                         event_time=("ts", 100))
    assert r.summary["late_events"] == 0
    st = {p: s for (rp, p), (s, *_r) in _lake_state(lake).items()}
    assert st == {"k|w0": 15, "k|w1": 7}


def _bk_oracle(rows, k=16) -> dict[tuple, tuple]:
    """Brute per-key bottom-k sample over post-last-reset events:
    (sorted-hash tuple, values-in-hash-order tuple)."""
    from sql_etl_pipeline_ray.stages.bloom import _splitmix64

    live: dict[tuple, list] = {}
    for lsn, op, repo, path, v in sorted(rows):
        key = (repo, path)
        if op == "D":
            live.pop(key, None)
        else:
            live.setdefault(key, []).append((lsn, v))
    out = {}
    for key, evs in live.items():
        lsns = np.array([l for l, _ in evs], np.int64)
        vals = np.array([v for _, v in evs], np.int64)
        h = _splitmix64(lsns.view(np.uint64))
        order = np.argsort(h)[:k]
        out[key] = (tuple(h[order].view(np.int64)), tuple(vals[order]))
    return out


def _bk_lake(out_dir) -> dict[tuple, tuple]:
    from sql_etl_pipeline_ray.pipelines.aggregate import read_aggregate_lake

    df = read_aggregate_lake(out_dir).to_pandas()
    return {
        (r.repo, r.path): (tuple(r.delta_bk_h), tuple(r.delta_bk_v))
        for r in df.itertuples()
    }


def test_bottomk_state_matches_brute(tmp_path):
    rows = _gen(3000, 60, seed=41)  # ~50 events/key, > k=16
    log = str(tmp_path / "log")
    _write(rows, log)
    lake = str(tmp_path / "lake")
    replay_aggregate(log, lake, ["delta"], num_partitions=4,
                     quantile_cols=["delta"], bottomk_k=16)
    assert _bk_lake(lake) == _bk_oracle(rows, k=16)


def test_bottomk_resume_and_mor_equal_one_shot(tmp_path):
    rows = _gen(2000, 50, seed=43)
    full, pre = str(tmp_path / "full"), str(tmp_path / "pre")
    _write(rows, full, buckets=6)
    _write(rows[:1000], pre, buckets=3)
    one = str(tmp_path / "one")
    replay_aggregate(full, one, ["delta"], num_partitions=4,
                     quantile_cols=["delta"], bottomk_k=16)
    want = _bk_lake(one)
    for mode in ("cow", "mor"):
        lake = str(tmp_path / mode)
        replay_aggregate(pre, lake, ["delta"], num_partitions=4,
                         quantile_cols=["delta"], bottomk_k=16)
        sink = _mor_sink(lake) if mode == "mor" else None
        replay_aggregate(full, lake, ["delta"], resume=True, sink=sink,
                         quantile_cols=["delta"], bottomk_k=16)
        assert _bk_lake(lake) == want == _bk_oracle(rows, k=16)


def test_bottomk_quantiles_near_exact(tmp_path):
    """Quantiles extracted from the per-key sample track the exact ones
    (k=256 over ~1000 events/key)."""
    from sql_etl_pipeline_ray.stages.sketch import bottomk_quantiles

    rows = _gen(6000, 6, seed=47, reset_rate=0.0)
    log = str(tmp_path / "log")
    _write(rows, log)
    lake = str(tmp_path / "lake")
    replay_aggregate(log, lake, ["delta"], num_partitions=2,
                     quantile_cols=["delta"], bottomk_k=256)
    exact: dict[tuple, list] = {}
    for _l, _op, repo, path, v in rows:
        exact.setdefault((repo, path), []).append(v)
    for key, (_h, vals) in _bk_lake(lake).items():
        est = bottomk_quantiles(np.array(vals, np.int64), [(1, 2)])[0]
        true = np.quantile(np.array(exact[key]), 0.5)
        spread = max(exact[key]) - min(exact[key])
        assert abs(est - true) <= 0.15 * spread, (key, est, true)


def test_bottomk_cow_resume_over_chained_prior_keeps_lake_k(tmp_path):
    """Regression: a NON-MOR resume over a merge-on-read delta chain
    folds the chained prior via ``_prior_as_rows`` — which must fold at
    the LAKE's configured bottomk_k, not ``fold_aggregate_chain``'s
    default 128, or every key's KMV sample silently truncates."""
    rows = _gen(9000, 6, seed=53, reset_rate=0.0)  # ~1500 events/key,
    # values span 250 distinct ints -> samples exceed 128 at k=192
    full, p1, p2 = (str(tmp_path / d) for d in ("full", "p1", "p2"))
    _write(rows, full, buckets=6)
    _write(rows[:3000], p1, buckets=2)
    _write(rows[:6000], p2, buckets=4)
    one = str(tmp_path / "one")
    replay_aggregate(full, one, ["delta"], num_partitions=2,
                     quantile_cols=["delta"], bottomk_k=192)
    want = _bk_lake(one)
    assert any(len(h) > 128 for h, _v in want.values())  # k bites
    lake = str(tmp_path / "lake")
    replay_aggregate(p1, lake, ["delta"], num_partitions=2,
                     quantile_cols=["delta"], bottomk_k=192)
    # MOR increment -> the prior becomes a delta chain
    replay_aggregate(p2, lake, ["delta"], resume=True, sink=_mor_sink(lake),
                     quantile_cols=["delta"], bottomk_k=192)
    # COW increment over the CHAINED prior -> exercises _prior_as_rows
    replay_aggregate(full, lake, ["delta"], resume=True,
                     quantile_cols=["delta"], bottomk_k=192)
    assert _bk_lake(lake) == want


def test_resume_refuses_changed_sketch_params(tmp_path):
    rows = _gen(500, 10, seed=59)
    log = str(tmp_path / "log")
    _write(rows, log)
    hl = str(tmp_path / "hll")
    replay_aggregate(log, hl, ["delta"], num_partitions=2,
                     distinct_cols=["delta"], hll_p=10)
    with pytest.raises(ValueError, match="hll_p"):
        replay_aggregate(log, hl, ["delta"], resume=True,
                         distinct_cols=["delta"], hll_p=12)
    bk = str(tmp_path / "bk")
    replay_aggregate(log, bk, ["delta"], num_partitions=2,
                     quantile_cols=["delta"], bottomk_k=16)
    with pytest.raises(ValueError, match="bottomk_k"):
        replay_aggregate(log, bk, ["delta"], resume=True,
                         quantile_cols=["delta"], bottomk_k=32)
    # same params resume fine
    replay_aggregate(log, bk, ["delta"], resume=True,
                     quantile_cols=["delta"], bottomk_k=16)


# ---------------------------------------------------------------------------
# Hot-key memory valves (VERDICT r4 #6): skewed streams, exact results
# ---------------------------------------------------------------------------


def _gen_skewed(n: int, keys: int, seed: int, hot_share: float = 0.5,
                reset_rate: float = 0.01, with_resets: bool = True):
    """~hot_share of all events hit ONE key; optional periodic resets."""
    rng = np.random.default_rng(seed)
    hot = rng.random(n) < hot_share
    k = rng.integers(1, keys, n)
    d = (rng.random(n) < reset_rate) if with_resets else np.zeros(n, bool)
    v = rng.integers(-50, 200, n)
    return [
        (i + 1, "D" if d[i] else ("I" if i % 2 else "U"),
         "rhot" if hot[i] else f"r{int(k[i]) % 5}",
         "khot" if hot[i] else f"k{int(k[i])}",
         None if d[i] else int(v[i]))
        for i in range(n)
    ]


def _assert_matches_oracle(lake, rows):
    from sql_etl_pipeline_ray.pipelines.aggregate import read_aggregate_lake

    want = _oracle(rows)
    df = read_aggregate_lake(lake).to_pandas()
    got = {
        (r.repo, r.path): (r.delta_sum, r.delta_min, r.delta_max,
                           r.n_events, r.last_lsn)
        for r in df.itertuples()
    }
    assert got == want


def test_skewed_stream_reset_barrier_valve_exact(tmp_path):
    """One key = ~50% of the stream, resets present: the reset-barrier
    valve engages (compaction receipts > 0) and the folded lake still
    matches the single-process oracle exactly."""
    rows = _gen_skewed(60_000, 200, seed=41, reset_rate=0.02)
    log, lake = str(tmp_path / "log"), str(tmp_path / "lake")
    _write(rows, log, buckets=6)
    res = replay_aggregate(
        log, lake, value_cols=["delta"], num_partitions=4,
        compact_threshold_rows=4_000,
    )
    assert res.summary["valve"] == "reset_barrier"
    assert res.summary["valve_compactions"] > 0
    assert res.summary["skew_max_share"] > 0.4   # the receipt shows the skew
    _assert_matches_oracle(lake, rows)


def test_skewed_stream_reset_free_valve_exact_and_bounded(tmp_path):
    """Declared reset-free feed: the valve pre-aggregates per key —
    exact under any arrival order (commutative monoid), and the
    finalize-side buffer stays O(live keys) however hot one key is."""
    rows = _gen_skewed(60_000, 200, seed=43, with_resets=False)
    log, lake = str(tmp_path / "log"), str(tmp_path / "lake")
    _write(rows, log, buckets=6)
    res = replay_aggregate(
        log, lake, value_cols=["delta"], num_partitions=4,
        reset_free=True, compact_threshold_rows=2_000,
    )
    assert res.summary["valve"] == "reset_free"
    assert res.summary["valve_compactions"] > 0
    # events_in survives compaction via the __n contribution counts
    assert res.summary["events_in"] == len(rows)
    _assert_matches_oracle(lake, rows)


def test_reset_free_declaration_enforced(tmp_path):
    rows = _gen_skewed(2_000, 50, seed=47, reset_rate=0.05)
    log, lake = str(tmp_path / "log"), str(tmp_path / "lake")
    _write(rows, log, buckets=2)
    with pytest.raises(Exception, match="reset_free"):
        replay_aggregate(log, lake, value_cols=["delta"],
                         num_partitions=2, reset_free=True)


def test_reset_free_valve_then_resume_increment(tmp_path):
    """Valve-compacted state composes with the resume ⊕-merge: a second
    increment over a valve-built lake still matches the oracle."""
    rows = _gen_skewed(30_000, 150, seed=53, with_resets=False)
    log1, log2 = str(tmp_path / "log1"), str(tmp_path / "log2")
    lake = str(tmp_path / "lake")
    _write(rows[:20_000], log1, buckets=3)
    _write(rows[20_000:], log2, buckets=2)
    replay_aggregate(log1, lake, value_cols=["delta"], num_partitions=4,
                     reset_free=True, compact_threshold_rows=2_000)
    replay_aggregate(log2, lake, value_cols=["delta"], num_partitions=4,
                     resume=True, reset_free=True,
                     compact_threshold_rows=2_000)
    _assert_matches_oracle(lake, rows)


def test_compact_fns_exact_over_random_splits():
    """Property: compact(any buffered subset) ∘ final fold == final fold
    of raw rows, across random splits/arrival orders — both valves."""
    import pyarrow as pa

    from sql_etl_pipeline_ray.hashing import key_hash
    from sql_etl_pipeline_ray.pipelines.aggregate import (
        make_reset_barrier_compact, make_reset_free_compact)
    from sql_etl_pipeline_ray.stages.merge import KEY_HASH_COL

    rng = np.random.default_rng(7)

    def to_tbl(chunk):
        t = pa.table({
            "lsn": pa.array([r[0] for r in chunk], pa.int64()),
            "op": pa.array([r[1] for r in chunk]),
            "repo": pa.array([r[2] for r in chunk]),
            "path": pa.array([r[3] for r in chunk]),
            "delta": pa.array(
                [0 if r[4] is None else r[4] for r in chunk], pa.int64()),
        })
        kh = key_hash(t.column("repo"), t.column("path"))
        return t.append_column(KEY_HASH_COL, pa.array(kh.view(np.int64)))

    def final_fold(tables):
        """Reference: oracle over the union of RAW rows the tables
        represent is checked via the engine replay elsewhere; here we
        check valve-compacted buffers keep the same per-key survivors'
        aggregate as the uncompacted buffer under the engine's own
        keep-after-last-reset rule."""
        merged = pa.concat_tables(tables, promote_options="permissive")
        df = merged.to_pandas().sort_values("lsn")
        state = {}
        for r in df.to_dict("records"):
            key = (r["repo"], r["path"])
            n = r.get("__n")
            if n is None or (isinstance(n, float) and np.isnan(n)):
                if r["op"] == "D":
                    state.pop(key, None)
                    continue
                s = mn = mx = int(r["delta"])
                cnt = 1
            else:
                s = int(r["delta__sum"])
                mn = int(r["delta__min"])
                mx = int(r["delta__max"])
                cnt = int(n)
            cur = state.get(key)
            if cur is None:
                state[key] = [s, mn, mx, cnt]
            else:
                cur[0] += s
                cur[1] = min(cur[1], mn)
                cur[2] = max(cur[2], mx)
                cur[3] += cnt
        return state

    barrier = make_reset_barrier_compact()
    free = make_reset_free_compact(["delta"])
    for case in range(4):
        with_resets = case % 2 == 0
        rows = _gen_skewed(3_000, 40, seed=100 + case,
                           with_resets=with_resets, reset_rate=0.05)
        order = rng.permutation(len(rows))
        shuffled = [rows[i] for i in order]
        cuts = np.sort(rng.choice(
            np.arange(1, len(rows)), size=5, replace=False))
        chunks = np.split(np.arange(len(rows)), cuts)
        tabs = [to_tbl([shuffled[i] for i in c]) for c in chunks]
        want = final_fold(tabs)
        if with_resets:
            compacted = [barrier(pa.concat_tables(tabs[:3]))] + tabs[3:]
        else:
            head = free(pa.concat_tables(tabs[:3]))
            # re-compaction composes
            head = free(pa.concat_tables([head, tabs[3]],
                                         promote_options="permissive"))
            compacted = [head] + tabs[4:]
        got = final_fold(compacted)
        assert got == want, f"case {case}"


def test_reset_free_valve_sketch_state_exact(tmp_path):
    """reset_free valve over DISTINCT (HLL) and QUANTILE (bottom-k KMV)
    state: both are semilattices without resets, so valve-engaged runs
    must produce BIT-identical lake state to a never-engaged run of the
    same log (which is itself oracle-pinned elsewhere)."""
    import pandas as pd

    from sql_etl_pipeline_ray.pipelines.aggregate import read_aggregate_lake

    rng = np.random.default_rng(59)
    n = 40_000
    hot = rng.random(n) < 0.5
    k = rng.integers(1, 80, n)
    uid = rng.integers(0, 500, n)
    v = rng.integers(-40, 150, n)
    rows = []
    for i in range(n):
        rows.append(dict(
            lsn=i + 1, op="I" if i % 2 else "U",
            repo="rhot" if hot[i] else f"r{int(k[i]) % 4}",
            path="khot" if hot[i] else f"k{int(k[i])}",
            delta=int(v[i]), uid=int(uid[i]), val=int(v[i]) * 3,
        ))
    log = str(tmp_path / "log")
    os.makedirs(log)
    per = n // 4
    for b in range(4):
        chunk = rows[b * per:(b + 1) * per]
        pq.write_table(pa.Table.from_pylist(chunk),
                       os.path.join(log, f"b{b}.parquet"),
                       row_group_size=512)

    def run(name, threshold):
        lake = str(tmp_path / name)
        res = replay_aggregate(
            log, lake, value_cols=["delta"], num_partitions=4,
            distinct_cols=["uid"], quantile_cols=["val"],
            reset_free=True, compact_threshold_rows=threshold,
        )
        df = (read_aggregate_lake(lake).to_pandas()
              .sort_values(["repo", "path"]).reset_index(drop=True))
        # bottom-k lists are set-semantics: canonicalize order
        df["bk"] = [
            tuple(sorted(zip(h, vv)))
            for h, vv in zip(df["val_bk_h"], df["val_bk_v"])
        ]
        df["hll"] = [bytes(x) for x in df["uid_hll"]]
        return res, df.drop(columns=["val_bk_h", "val_bk_v", "uid_hll"])

    res_quiet, quiet = run("lake_quiet", 10_000_000)   # never engages
    res_valve, valve = run("lake_valve", 1_500)        # engages repeatedly
    assert res_quiet.summary["valve_compactions"] == 0
    assert res_valve.summary["valve_compactions"] > 0
    pd.testing.assert_frame_equal(quiet, valve)


def test_windowed_ingest_skewed_valve_and_lateness_compose(tmp_path):
    """Windowed rollup under key skew: the hot window key triggers the
    valve mid-stream while event-time lateness still finalizes closed
    windows on resume — the two mechanisms compose (lateness filters at
    the router, BEFORE rows ever reach the valve)."""
    log, lake = str(tmp_path / "log"), str(tmp_path / "lake")
    rng = np.random.default_rng(61)
    n = 20_000
    # 60% of events hit window key k|w1; ts within [1000, 2000)
    rows = []
    for i in range(n):
        hot = rng.random() < 0.6
        w = "k|w1" if hot else f"k|w{int(rng.integers(2, 30))}"
        rows.append((i + 1, "I", w, int(rng.integers(1, 9)),
                     int(rng.integers(1000, 2000))))
    _write_ts(rows, log, buckets=4)
    r1 = replay_aggregate(log, lake, ["delta"], num_partitions=2,
                          event_time=("ts", 100), reset_free=True,
                          compact_threshold_rows=1_000)
    assert r1.summary["valve_compactions"] > 0
    assert r1.summary["skew_max_share"] > 0.4
    wm = r1.summary["event_watermark"]
    # resume: one in-lateness event for the hot key, one too-late, both
    # for already-seen windows, plus a fresh window
    p2 = [(n + 1, "I", "k|w1", 1000, wm - 50),
          (n + 2, "I", "k|w2", 999, wm - 500),
          (n + 3, "I", "k|w_new", 3, wm + 100)]
    _write_ts(p2, os.path.join(log, "inc"), buckets=1)
    r2 = replay_aggregate(log, lake, ["delta"], resume=True,
                          event_time=("ts", 100), reset_free=True,
                          compact_threshold_rows=1_000)
    assert r2.summary["late_events"] == 1
    st = {p: (s, nev) for (rp, p), (s, mn, mx, nev, ll) in
          _lake_state(lake).items()}
    want_sum: dict[str, int] = {}
    want_n: dict[str, int] = {}
    for _lsn, _op, p, d, _ts in rows:
        want_sum[p] = want_sum.get(p, 0) + d
        want_n[p] = want_n.get(p, 0) + 1
    want_sum["k|w1"] += 1000
    want_n["k|w1"] += 1
    want_sum["k|w_new"] = 3
    want_n["k|w_new"] = 1
    assert st == {p: (want_sum[p], want_n[p]) for p in want_sum}
