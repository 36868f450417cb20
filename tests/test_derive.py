"""Incrementally maintained derived tables (pipelines/derive.py)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sql_etl_pipeline_ray.config import ReplayConfig, SinkConfig
from sql_etl_pipeline_ray.pipelines.derive import refresh_derived_lake
from sql_etl_pipeline_ray.pipelines.replay import read_lake, replay


def _replay(log, src, resume=False):
    # keep 2 epochs so the derive's pinned snapshot survives the next
    # src commit (the incremental-refresh retention contract)
    replay(log, src, ReplayConfig(num_partitions=4),
           sink=SinkConfig(out_dir=src, keep_epochs=2), resume=resume)


def _write_log(rows, log_dir, buckets=2):
    os.makedirs(log_dir, exist_ok=True)
    rows = sorted(rows)
    per = (len(rows) + buckets - 1) // buckets
    for b in range(buckets):
        chunk = rows[b * per:(b + 1) * per]
        if not chunk:
            continue
        pq.write_table(pa.table({
            "lsn": pa.array([r[0] for r in chunk], pa.int64()),
            "op": pa.array([r[1] for r in chunk]),
            "repo": pa.array(["r"] * len(chunk)),
            "path": pa.array([r[2] for r in chunk]),
            "commit": pa.array(["c"] * len(chunk)),
            "lang": pa.array(["x"] * len(chunk)),
            "content": pa.array([r[3] for r in chunk]),
        }), os.path.join(log_dir, f"b{b:02d}.parquet"))


def _fn(df):
    df = df.copy()
    df["shout"] = df["content"].str.upper()
    df["n"] = df["content"].str.len()
    return df[["repo", "path", "shout", "n"]]


def _derived_state(dst):
    df = read_lake(dst).to_pandas()
    if len(df) == 0:
        return {}
    return {p: (s, n) for p, s, n in zip(df["path"], df["shout"], df["n"])}


def _expect(live: dict[str, str]):
    return {p: (c.upper(), len(c)) for p, c in live.items()}


def test_initial_build_and_incremental_refresh(tmp_path):
    log = str(tmp_path / "log")
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    rows = [(i + 1, "I", f"k{i}", f"text {i}") for i in range(40)]
    _write_log(rows, log)
    _replay(log, src)
    r1 = refresh_derived_lake(src, dst, _fn)
    assert r1["partitions_refreshed"] == 4
    assert _derived_state(dst) == _expect({f"k{i}": f"text {i}" for i in range(40)})

    # increment touches a few keys: updates, a delete, a new key
    inc = [(100, "U", "k3", "updated three"),
           (101, "D", "k7", None),
           (102, "I", "k99", "brand new")]
    _write_log(inc, os.path.join(log, "inc"), buckets=1)
    _replay(log, src, resume=True)
    r2 = refresh_derived_lake(src, dst, _fn)
    # only the touched partitions recompute, and only the changed rows
    assert r2["changed_rows"] == 2 and r2["deleted_rows"] == 1
    assert r2["partitions_refreshed"] + r2["partitions_skipped"] == 4
    live = {f"k{i}": f"text {i}" for i in range(40) if i != 7}
    live["k3"] = "updated three"
    live["k99"] = "brand new"
    assert _derived_state(dst) == _expect(live)


def test_refresh_is_idempotent_and_skips_unchanged(tmp_path):
    log, src, dst = (str(tmp_path / d) for d in ("log", "src", "dst"))
    _write_log([(i + 1, "I", f"k{i}", f"t{i}") for i in range(10)], log)
    replay(log, src, ReplayConfig(num_partitions=2))
    refresh_derived_lake(src, dst, _fn)
    before = _derived_state(dst)
    r = refresh_derived_lake(src, dst, _fn)
    assert r["partitions_refreshed"] == 0 and r["partitions_skipped"] == 2
    assert _derived_state(dst) == before


def test_incremental_equals_full_recompute(tmp_path):
    import numpy as np

    rng = np.random.default_rng(31)
    log, src = str(tmp_path / "log"), str(tmp_path / "src")
    keys = [f"k{i}" for i in range(60)]
    rows = [(i + 1, "I", keys[i % 60], f"v{i}") for i in range(200)]
    _write_log(rows, log, buckets=3)
    _replay(log, src)
    inc_dst = str(tmp_path / "inc")
    refresh_derived_lake(src, inc_dst, _fn)
    # a messy increment: random updates and deletes
    inc = []
    for j in range(50):
        k = keys[int(rng.integers(0, 60))]
        if rng.random() < 0.2:
            inc.append((300 + j, "D", k, None))
        else:
            inc.append((300 + j, "U", k, f"upd{j}"))
    _write_log(inc, os.path.join(log, "inc"), buckets=1)
    _replay(log, src, resume=True)
    refresh_derived_lake(src, inc_dst, _fn)
    # full recompute into a fresh dst
    full_dst = str(tmp_path / "full")
    refresh_derived_lake(src, full_dst, _fn)
    assert _derived_state(inc_dst) == _derived_state(full_dst)


def test_fn_version_and_key_guards(tmp_path):
    log, src, dst = (str(tmp_path / d) for d in ("log", "src", "dst"))
    _write_log([(1, "I", "a", "x")], log, buckets=1)
    replay(log, src, ReplayConfig(num_partitions=1))
    refresh_derived_lake(src, dst, _fn, fn_version="v1")
    with pytest.raises(ValueError, match="fn_version"):
        refresh_derived_lake(src, dst, _fn, fn_version="v2")

    def bad_fn(df):
        return df.iloc[:0][["repo", "path"]]

    _write_log([(2, "U", "a", "y")], os.path.join(log, "i"), buckets=1)
    replay(log, src, ReplayConfig(num_partitions=1), resume=True)
    with pytest.raises(Exception, match="row count"):
        refresh_derived_lake(src, dst, bad_fn, fn_version="v1")


def test_gcd_pin_degrades_to_full_rebuild_but_converges(tmp_path):
    """Source retained only 1 epoch: the pinned snapshot is GC'd by the
    next commit, so touched partitions rebuild fully — more work, same
    final state."""
    log, src, dst = (str(tmp_path / d) for d in ("log", "src", "dst"))
    _write_log([(i + 1, "I", f"k{i}", f"t{i}") for i in range(20)], log)
    replay(log, src, ReplayConfig(num_partitions=2))  # keep_epochs=1
    refresh_derived_lake(src, dst, _fn)
    _write_log([(100, "U", "k3", "new3")], os.path.join(log, "i"), buckets=1)
    replay(log, src, ReplayConfig(num_partitions=2), resume=True)
    r = refresh_derived_lake(src, dst, _fn)
    assert r["partitions_rebuilt_full"] >= 1
    live = {f"k{i}": f"t{i}" for i in range(20)}
    live["k3"] = "new3"
    assert _derived_state(dst) == _expect(live)


def test_mor_refresh_equals_cow_and_reads_fold(tmp_path):
    """Merge-on-read derived refresh: delta files chain (fn rows + delete
    tombstones), plain read_lake folds them, final state equals the
    copy-on-write refresh; compact_lake restores plain files."""
    from sql_etl_pipeline_ray.pipelines.replay import compact_lake
    from sql_etl_pipeline_ray.state import manifest as mf2

    log, src = str(tmp_path / "log"), str(tmp_path / "src")
    rows = [(i + 1, "I", f"k{i}", f"t{i}") for i in range(30)]
    _write_log(rows, log)
    _replay(log, src)
    cow, morl = str(tmp_path / "cow"), str(tmp_path / "mor")
    for d in (cow, morl):
        refresh_derived_lake(src, d, _fn, keep_epochs=2)
    inc = [(100, "U", "k3", "NEWTHREE"), (101, "D", "k8", None),
           (102, "I", "k77", "fresh")]
    _write_log(inc, os.path.join(log, "i"), buckets=1)
    _replay(log, src, resume=True)
    refresh_derived_lake(src, cow, _fn, keep_epochs=2)
    refresh_derived_lake(src, morl, _fn, keep_epochs=2, merge_on_read=True)
    assert _derived_state(cow) == _derived_state(morl)
    kinds = {m.get("kind") for m in mf2.read_all_manifests(morl).values()}
    assert "delta" in kinds
    # deleted key really gone through the fold
    assert "k8" not in _derived_state(morl)
    # compaction restores plain files; state unchanged
    before = _derived_state(morl)
    compact_lake(morl)
    assert {m.get("kind") for m in mf2.read_all_manifests(morl).values()} == {None}
    assert _derived_state(morl) == before


def test_mor_chain_bound_compacts_inline(tmp_path):
    from sql_etl_pipeline_ray.state import manifest as mf2

    log, src, dst = (str(tmp_path / d) for d in ("log", "src", "dst"))
    _write_log([(1, "I", "k", "v0")], log, buckets=1)
    _replay(log, src)
    refresh_derived_lake(src, dst, _fn, keep_epochs=2)
    for i in range(4):
        _write_log([(10 + i, "U", "k", f"v{i + 1}")],
                   os.path.join(log, f"i{i}"), buckets=1)
        _replay(log, src, resume=True)
        refresh_derived_lake(src, dst, _fn, keep_epochs=2,
                             merge_on_read=True, max_delta_files=3)
    m = mf2.read_all_manifests(dst)
    # the partition holding k compacted inline when the chain hit the bound
    part = [p for p, mm in m.items() if mm["rows"] or mm.get("kind")][0]
    assert len(m[part]["files"]) <= 4
    assert _derived_state(dst)["k"] == ("V4", 2)


def test_mor_tombstone_beats_max_lsn_derived_row(tmp_path):
    """Regression: when the DELETED key's own derived row holds the
    partition's max LSN, the MOR tombstone must still win the chain fold
    (it is written strictly above max(new_lsn, prior_lsn), never tying —
    a tie would lose the 'D' < 'U' op tiebreak and resurrect the key)."""
    log, src, dst = (str(tmp_path / d) for d in ("log", "src", "dst"))
    # one partition so A@5 and B@10 share it; B holds the max LSN
    _write_log([(5, "I", "A", "alpha"), (10, "I", "B", "bravo")],
               log, buckets=1)
    replay(log, src, ReplayConfig(num_partitions=1),
           sink=SinkConfig(out_dir=src, keep_epochs=2))
    refresh_derived_lake(src, dst, _fn, keep_epochs=2)
    # delete B at lsn 11 — no new live rows, so new_lsn < prior_lsn
    _write_log([(11, "D", "B", None)], os.path.join(log, "i"), buckets=1)
    replay(log, src, ReplayConfig(num_partitions=1),
           sink=SinkConfig(out_dir=src, keep_epochs=2), resume=True)
    refresh_derived_lake(src, dst, _fn, keep_epochs=2, merge_on_read=True)
    assert _derived_state(dst) == _expect({"A": "alpha"})
    # and a genuine re-insert after the delete still comes back
    _write_log([(12, "I", "B", "back")], os.path.join(log, "i2"), buckets=1)
    replay(log, src, ReplayConfig(num_partitions=1),
           sink=SinkConfig(out_dir=src, keep_epochs=2), resume=True)
    refresh_derived_lake(src, dst, _fn, keep_epochs=2, merge_on_read=True)
    assert _derived_state(dst) == _expect({"A": "alpha", "B": "back"})


def test_derive_mor_random_sequences_property(tmp_path):
    """Property (the advisor-bug class): for ANY op sequence over a small
    key space and ANY refresh schedule (mixed COW/MOR), the derived lake
    equals fn() over the source oracle state — deletes must never
    resurrect and re-inserts must always surface, regardless of which
    key holds the partition's max LSN at each refresh."""
    import numpy as np

    rng = np.random.default_rng(67)
    for case in range(6):
        keys = [f"k{i}" for i in range(4)]
        n = int(rng.integers(6, 18))
        rows, alive = [], {}
        for lsn in range(1, n + 1):
            k = keys[int(rng.integers(0, len(keys)))]
            if k in alive and rng.random() < 0.4:
                rows.append((lsn, "D", k, None))
                alive.pop(k)
            else:
                v = f"v{case}_{lsn}"
                rows.append((lsn, "I" if k not in alive else "U", k, v))
                alive[k] = v
        # refresh schedule: 2-3 cut points, random mor choice each
        cuts = sorted(set(
            int(c) for c in rng.integers(1, n + 1, size=int(rng.integers(1, 3)))
        ) | {n})
        log = str(tmp_path / f"log{case}")
        src = str(tmp_path / f"src{case}")
        dst = str(tmp_path / f"dst{case}")
        prev = 0
        for j, cut in enumerate(cuts):
            chunk = rows[prev:cut]
            prev = cut
            if not chunk:
                continue
            _write_log(chunk, os.path.join(log, f"c{j}"), buckets=1)
            replay(log, src, ReplayConfig(num_partitions=1),
                   sink=SinkConfig(out_dir=src, keep_epochs=2),
                   resume=(j > 0))
            refresh_derived_lake(
                src, dst, _fn, keep_epochs=2,
                merge_on_read=bool(rng.random() < 0.6),
            )
        assert _derived_state(dst) == _expect(alive), (case, rows, cuts)
