"""Transaction-consistent multi-table replay (pipelines/txn.py).

Feed model: one multiplexed WAL whose events carry (tbl, txn), txn
nondecreasing in lsn.  Oracle: a single-process dict replay per table over
the same admitted-transaction set.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sql_etl_pipeline_ray.pipelines.replay import read_lake
from sql_etl_pipeline_ray.pipelines.txn import (
    demux_txn_log,
    read_txn_snapshot,
    read_txn_tables,
    replay_txn,
    txn_watermark,
)
from sql_etl_pipeline_ray.state import manifest as mf


def _events(n_txn: int, torn_tail: bool = False) -> list[dict]:
    """txn t emits: I/U on table 'files' for key f<t%7>, and I on table
    'meta' for key m<t> (deleted again by txn t+3 when t % 5 == 0).
    4 LSNs reserved per txn; txn nondecreasing in lsn by construction."""
    rows = []
    for t in range(n_txn):
        base = 4 * t
        rows.append(dict(lsn=base + 1, op="I" if t < 7 else "U", tbl="files",
                         repo="r", path=f"f{t % 7}", content=f"files:{t}", txn=t))
        rows.append(dict(lsn=base + 2, op="I", tbl="meta",
                         repo="r", path=f"m{t}", content=f"meta:{t}", txn=t))
        if t % 5 == 0 and t >= 3:
            rows.append(dict(lsn=base + 3, op="D", tbl="meta",
                             repo="r", path=f"m{t - 3}", content=None, txn=t))
    if torn_tail:
        # the final txn is mid-flight: only its first event made the log
        rows = [r for r in rows if not (r["txn"] == n_txn - 1 and r["lsn"] % 4 != 1)]
    return rows


def _write_log(rows: list[dict], log_dir: str, buckets: int = 3) -> None:
    os.makedirs(log_dir, exist_ok=True)
    rows = sorted(rows, key=lambda r: r["lsn"])
    per = (len(rows) + buckets - 1) // buckets
    for b in range(buckets):
        chunk = rows[b * per:(b + 1) * per]
        if not chunk:
            continue
        tbl = pa.table({
            "lsn": pa.array([r["lsn"] for r in chunk], pa.int64()),
            "op": pa.array([r["op"] for r in chunk]),
            "repo": pa.array([r["repo"] for r in chunk]),
            "path": pa.array([r["path"] for r in chunk]),
            "commit": pa.array([f"c{r['lsn']}" for r in chunk]),
            "lang": pa.array(["x"] * len(chunk)),
            "content": pa.array([r["content"] for r in chunk]),
            "tbl": pa.array([r["tbl"] for r in chunk]),
            "txn": pa.array([r["txn"] for r in chunk], pa.int64()),
        })
        pq.write_table(tbl, os.path.join(log_dir, f"bucket-{b:03d}.parquet"),
                       row_group_size=16)


def _oracle(rows: list[dict], txn_hwm: int) -> dict[str, dict[str, str]]:
    state: dict[str, dict[str, str]] = {}
    for r in sorted(rows, key=lambda x: x["lsn"]):
        if r["txn"] > txn_hwm:
            continue
        t = state.setdefault(r["tbl"], {})
        if r["op"] == "D":
            t.pop(r["path"], None)
        else:
            t[r["path"]] = r["content"]
    return state


def _lake_state(ds) -> dict[str, str]:
    df = ds.to_pandas()
    if len(df) == 0:
        return {}
    return dict(zip(df["path"], df["content"]))


def test_watermark_unsealed_holds_last_txn(tmp_path):
    rows = _events(10, torn_tail=True)
    log = str(tmp_path / "log")
    _write_log(rows, log)
    wm = txn_watermark(log)
    assert wm["max_txn"] == 9
    assert wm["txn_hwm"] == 8
    # publish_lsn = max lsn of txn <= 8
    assert wm["publish_lsn"] == max(r["lsn"] for r in rows if r["txn"] <= 8)
    sealed = txn_watermark(log, sealed=True)
    assert sealed["txn_hwm"] == 9


def test_watermark_rejects_non_monotone_txn(tmp_path):
    rows = _events(6)
    rows[0]["txn"] = 5  # a "later" txn's event below earlier ones
    log = str(tmp_path / "log")
    _write_log(rows, log, buckets=1)
    with pytest.raises(ValueError, match="WAL commit order"):
        txn_watermark(log)


def test_replay_txn_matches_oracle_and_drops_torn_tail(tmp_path):
    rows = _events(12, torn_tail=True)
    log, out = str(tmp_path / "log"), str(tmp_path / "out")
    _write_log(rows, log)
    res = replay_txn(log, out)
    assert res["snapshot"]["txn_hwm"] == 10
    tables = read_txn_tables(out)
    want = _oracle(rows, txn_hwm=10)
    assert set(tables) == set(want) == {"files", "meta"}
    for t in want:
        assert _lake_state(tables[t]) == want[t]
    # the torn txn's lone staged event never reached any lake
    assert "f4" not in want["files"] or want["files"]["f4"] != "files:11"


def test_replay_txn_sealed_applies_everything(tmp_path):
    rows = _events(8)
    log, out = str(tmp_path / "log"), str(tmp_path / "out")
    _write_log(rows, log)
    replay_txn(log, out, sealed=True)
    tables = read_txn_tables(out)
    want = _oracle(rows, txn_hwm=7)
    for t in want:
        assert _lake_state(tables[t]) == want[t]


def test_incremental_growth_resumes_and_converges(tmp_path):
    all_rows = _events(20)
    log, out = str(tmp_path / "log"), str(tmp_path / "out")
    # first 2/3 of the WAL, torn (the then-last txn incomplete)
    first = [r for r in all_rows if r["txn"] <= 13 and not (r["txn"] == 13 and r["lsn"] % 4 != 1)]
    _write_log(first, log, buckets=2)
    r1 = replay_txn(log, out)
    assert r1["snapshot"]["txn_hwm"] == 12
    # the WAL grows: rewrite bucket files to the full set (append-only in
    # lsn: new buckets carry the suffix)
    suffix = [r for r in all_rows if r["lsn"] > max(x["lsn"] for x in first)]
    _write_log(suffix, os.path.join(log, "later"), buckets=2)
    # the torn txn-13 remainder lives in the new buckets; bucket-0/1 of the
    # original dir still hold the old prefix — torn bucket re-demuxes
    r2 = replay_txn(log, out, sealed=True)
    assert r2["snapshot"]["txn_hwm"] == 19
    want = _oracle(all_rows, txn_hwm=19)
    tables = read_txn_tables(out)
    for t in want:
        assert _lake_state(tables[t]) == want[t]
    # second demux skipped the complete buckets
    assert r2["demux"]["files_skipped"] >= 1


def test_crash_between_tables_keeps_readers_consistent(tmp_path):
    """Simulate a crash after one table's replay but before publish: the
    pointer still names the old epochs, so transactional readers see the
    OLD state of BOTH tables even though one lake has newer commits."""
    rows = _events(10)
    log, out = str(tmp_path / "log"), str(tmp_path / "out")
    _write_log([r for r in rows if r["txn"] <= 5], log)
    replay_txn(log, out, sealed=True)
    snap1 = read_txn_snapshot(out)
    before = {t: _lake_state(d) for t, d in read_txn_tables(out).items()}

    # grow the WAL, then run ONLY the demux + the 'files' table replay
    # (the crash point: 'meta' never replays, publish never happens)
    _write_log([r for r in rows if r["txn"] > 5],
               os.path.join(log, "later"), buckets=1)
    from sql_etl_pipeline_ray.config import SinkConfig
    from sql_etl_pipeline_ray.pipelines.replay import replay
    demux = demux_txn_log(log, os.path.join(out, "_staging"), sealed=True)
    lake = os.path.join(out, "tables", "files")
    replay(os.path.join(out, "_staging", "files"), lake,
           sink=SinkConfig(out_dir=lake, keep_epochs=2), resume=True)

    # un-published commits are invisible to transactional readers...
    assert read_txn_snapshot(out) == snap1
    mid = {t: _lake_state(d) for t, d in read_txn_tables(out).items()}
    assert mid == before
    # ...but the raw lake HAS moved (this is exactly the torn state a
    # non-transactional reader would see)
    assert _lake_state(read_lake(lake)) != before["files"]

    # re-running converges and publishes atomically
    res = replay_txn(log, out, sealed=True)
    assert res["snapshot"]["seq"] == snap1["seq"] + 1
    want = _oracle(rows, txn_hwm=9)
    after = {t: _lake_state(d) for t, d in read_txn_tables(out).items()}
    for t in want:
        assert after[t] == want[t]


def test_pinned_epochs_beat_asof_on_lagging_partition(tmp_path):
    """The case exact pins exist for: after publish, a later replay bumps
    partition epochs; pinned reads return the published state while the
    same numeric bound under asof semantics would leak newer commits on
    partitions whose epoch counter lags the lake-wide max."""
    rows = _events(10)
    log, out = str(tmp_path / "log"), str(tmp_path / "out")
    _write_log([r for r in rows if r["txn"] <= 5], log)
    replay_txn(log, out, sealed=True)
    want = _oracle([r for r in rows if r["txn"] <= 5], txn_hwm=5)
    _write_log([r for r in rows if r["txn"] > 5],
               os.path.join(log, "later"), buckets=1)
    replay_txn(log, out, sealed=True)
    # read through snapshot seq 0 (the historical snapshot file)
    with open(os.path.join(out, "txn_snapshot-0.json")) as f:
        snap0 = json.load(f)
    for tbl, pins in snap0["tables"].items():
        ds = read_lake(os.path.join(out, "tables", tbl),
                       pinned_epochs={int(p): int(e) for p, e in pins.items()})
        assert _lake_state(ds) == want[tbl]


def test_rerun_is_idempotent(tmp_path):
    rows = _events(9)
    log, out = str(tmp_path / "log"), str(tmp_path / "out")
    _write_log(rows, log)
    r1 = replay_txn(log, out)
    r2 = replay_txn(log, out)
    assert r2["demux"]["files_demuxed"] == 0
    assert r1["snapshot"]["tables"] == r2["snapshot"]["tables"]
    want = _oracle(rows, txn_hwm=7)
    tables = read_txn_tables(out)
    for t in want:
        assert _lake_state(tables[t]) == want[t]


def test_keep_epochs_guard():
    with pytest.raises(ValueError, match="keep_epochs"):
        replay_txn("/nonexistent", "/tmp/never", keep_epochs=1)


def test_manifest_exact_epoch_raises_on_gcd(tmp_path):
    with pytest.raises(ValueError, match="no retained snapshot"):
        mf.read_manifest_exact(str(tmp_path), 0, 3)


def test_wap_audit_blocks_publish_and_rerun_converges(tmp_path):
    """Write-audit-publish: a failing audit aborts before the pointer
    moves (readers keep the old snapshot); the stock row_count_guard
    trips on a mass-delete increment; a later passing run publishes."""
    from sql_etl_pipeline_ray.pipelines.txn import row_count_guard

    rows = _events(10)
    log, out = str(tmp_path / "log"), str(tmp_path / "out")
    _write_log(rows, log)
    replay_txn(log, out, sealed=True, audit=row_count_guard(0.5))
    snap1 = read_txn_snapshot(out)
    before = {t: _lake_state(d) for t, d in read_txn_tables(out).items()}

    # increment: delete EVERY meta key (a fat-finger mass delete)
    max_lsn = max(r["lsn"] for r in rows)
    wipe = [dict(lsn=max_lsn + i + 1, op="D", tbl="meta", repo="r",
                 path=f"m{t}", content=None, txn=10 + i)
            for i, t in enumerate(range(10))]
    _write_log(wipe, os.path.join(log, "wipe"), buckets=1)
    with pytest.raises(ValueError, match="refusing to publish"):
        replay_txn(log, out, sealed=True, audit=row_count_guard(0.5))
    # pointer unmoved; transactional readers unaffected
    assert read_txn_snapshot(out) == snap1
    assert {t: _lake_state(d) for t, d in read_txn_tables(out).items()} == before

    # the same state publishes fine when the operator accepts the drop
    res = replay_txn(log, out, sealed=True, audit=row_count_guard(1.0))
    assert res["snapshot"]["seq"] == snap1["seq"] + 1
    after = read_txn_tables(out)
    assert _lake_state(after["meta"]) == {}
    assert _lake_state(after["files"]) == before["files"]


def test_wap_audit_sees_staged_and_previous(tmp_path):
    rows = _events(8)
    log, out = str(tmp_path / "log"), str(tmp_path / "out")
    _write_log(rows, log)
    seen = {}

    def probe(staged, previous):
        seen["staged"] = sorted(staged)
        seen["previous"] = previous

    replay_txn(log, out, sealed=True, audit=probe)
    assert seen["staged"] == ["files", "meta"]
    assert seen["previous"] is None  # first publish
    _write_log([dict(lsn=100, op="I", tbl="files", repo="r", path="fX",
                     content="x", txn=50)], os.path.join(log, "g"), buckets=1)

    def probe2(staged, previous):
        assert previous is not None
        # staged contains the new key, previous does not
        assert "fX" in _lake_state(staged["files"])
        assert "fX" not in _lake_state(previous["files"])

    replay_txn(log, out, sealed=True, audit=probe2)


def test_published_snapshot_survives_repeated_unpublished_commits(tmp_path):
    """Regression: keep_epochs=2 alone dies to two consecutive
    committed-but-unpublished runs (failed WAP audits) — partitions
    advance to e+2 and lazy GC would delete the epoch-e manifests the
    published pointer still pins.  The GC pin registry
    (reference-based retention, ``mf.write_gc_pins``) must keep the
    published snapshot readable through any number of failed runs."""
    from sql_etl_pipeline_ray.pipelines.txn import row_count_guard

    rows = _events(10)
    log, out = str(tmp_path / "log"), str(tmp_path / "out")
    _write_log(rows, log)
    replay_txn(log, out, sealed=True, audit=row_count_guard(0.5))
    snap1 = read_txn_snapshot(out)
    before = {t: _lake_state(d) for t, d in read_txn_tables(out).items()}

    # two consecutive bad increments, each failing the audit AFTER its
    # tables committed new epochs (every partition advances twice)
    max_lsn = max(r["lsn"] for r in rows)
    for round_no in range(2):
        wipe = [dict(lsn=max_lsn + 100 * round_no + i + 1, op="D",
                     tbl="meta", repo="r", path=f"m{t}", content=None,
                     txn=20 + 10 * round_no + i)
                for i, t in enumerate(range(10))]
        # also touch 'files' so both tables recommit
        wipe.append(dict(lsn=max_lsn + 100 * round_no + 50, op="D",
                         tbl="files", repo="r", path="f0", content=None,
                         txn=20 + 10 * round_no + 9))
        _write_log(wipe, os.path.join(log, f"wipe{round_no}"), buckets=1)
        with pytest.raises(ValueError, match="refusing to publish"):
            replay_txn(log, out, sealed=True, audit=row_count_guard(0.1))
    # pointer unmoved AND the pinned epochs still resolve end to end
    assert read_txn_snapshot(out) == snap1
    assert {t: _lake_state(d) for t, d in read_txn_tables(out).items()} == before
    # a vacuum must not break the published snapshot either
    for tbl in ("files", "meta"):
        mf.vacuum(os.path.join(out, "tables", tbl), keep_epochs=2)
    assert {t: _lake_state(d) for t, d in read_txn_tables(out).items()} == before
    # and a later passing run still publishes + re-pins
    res = replay_txn(log, out, sealed=True, audit=row_count_guard(1.0))
    assert res["snapshot"]["seq"] == snap1["seq"] + 1
    pins = mf.read_gc_pins(os.path.join(out, "tables", "meta"))
    assert "txn_snapshot" in pins and "txn_pending" not in pins


def test_crash_between_publish_and_pin_write_self_heals(tmp_path, monkeypatch):
    """Regression (ADVICE r4): a run dying between ``_publish`` and the
    txn_snapshot pin write leaves the freshly-published epochs held only
    by "txn_pending" — which the NEXT run overwrites with its own epochs
    before publishing.  If that next run then dies pre-publish, later
    commits' lazy GC could collect manifests the live published pointer
    still resolves.  ``replay_txn`` must self-heal the pin registry from
    the published pointer at startup."""
    import sql_etl_pipeline_ray.pipelines.txn as txn_mod

    rows = _events(10)
    log, out = str(tmp_path / "log"), str(tmp_path / "out")
    _write_log(rows, log)
    replay_txn(log, out, sealed=True)
    max_lsn = max(r["lsn"] for r in rows)

    def increment(round_no):
        inc = [dict(lsn=max_lsn + 100 * round_no + i + 1, op="U",
                    tbl="meta", repo="r", path=f"m{t}",
                    content=f"meta:v{round_no}:{t}",
                    txn=50 + 10 * round_no + i)
               for i, t in enumerate(range(7, 10))]
        inc.append(dict(lsn=max_lsn + 100 * round_no + 50, op="U",
                        tbl="files", repo="r", path="f0",
                        content=f"files:v{round_no}",
                        txn=50 + 10 * round_no + 9))
        _write_log(inc, os.path.join(log, f"inc{round_no}"), buckets=1)

    # run 2: publishes snapshot E2 — then we simulate its crash in the
    # window AFTER the pointer moved but BEFORE pin consolidation, by
    # rewinding the registry to the mid-sequence state {txn_snapshot:
    # E1 (stale), txn_pending: E2}.
    snap1 = read_txn_snapshot(out)
    stale_pins = {
        tbl: dict(mf.read_gc_pins(os.path.join(out, "tables", tbl))
                  ["txn_snapshot"])
        for tbl in ("files", "meta")
    }
    increment(0)
    replay_txn(log, out, sealed=True)
    snap2 = read_txn_snapshot(out)
    assert snap2["seq"] == snap1["seq"] + 1
    published_state = {t: _lake_state(d)
                       for t, d in read_txn_tables(out).items()}
    for tbl in ("files", "meta"):
        lake = os.path.join(out, "tables", tbl)
        mf.write_gc_pins(
            lake, "txn_pending",
            {int(p): int(e) for p, e in snap2["tables"][tbl].items()})
        mf.write_gc_pins(
            lake, "txn_snapshot",
            {int(p): int(e) for p, e in stale_pins[tbl].items()})

    # runs 3 and 4: each commits fresh epochs on both tables, then dies
    # between the txn_pending overwrite and the publish CAS
    def boom(*a, **k):
        raise RuntimeError("injected crash before publish")

    monkeypatch.setattr(txn_mod, "_publish", boom)
    for round_no in (1, 2):
        increment(round_no)
        with pytest.raises(RuntimeError, match="injected crash"):
            replay_txn(log, out, sealed=True)
    monkeypatch.undo()

    # the published pointer is unmoved and must still resolve end to end
    # (pre-fix: E2 lost its pin at run 3's txn_pending overwrite, and
    # run 4's commits GC'd it — read_txn_tables raises)
    assert read_txn_snapshot(out)["seq"] == snap2["seq"]
    for tbl in ("files", "meta"):
        mf.vacuum(os.path.join(out, "tables", tbl), keep_epochs=2)
    got = {t: _lake_state(d) for t, d in read_txn_tables(out).items()}
    assert got == published_state
