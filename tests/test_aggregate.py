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
