"""Dirty-log handling: dead-letter quarantine, strict mode, and the
cross-strategy byte-identity contract under malformed events.

The reference's validation flow is warn-only (``src/etl_pipeline.py:163-167``,
``src/data_validator.py:313-359``): invalid rows are reported and skipped,
never fatal.  We make the skip auditable — every rejected event is captured
with full fidelity plus a ``_reject_reason`` column — and offer a strict
mode (``drop_invalid=False``) that fails BEFORE any partition commits.
"""

import glob
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sql_etl_pipeline_ray.config import ReplayConfig
from sql_etl_pipeline_ray.pipelines.replay import lake_table, replay
from sql_etl_pipeline_ray.sources.datagen import (
    ChangeLogSpec,
    generate_change_log,
    replay_oracle,
    write_change_log,
)

SPEC = ChangeLogSpec(n_keys=300, n_events=2000, num_buckets=6)
MAX_LSN = SPEC.n_events


def _dirty_rows(clean: pa.Table) -> pa.Table:
    """Six invalid events (one per reason class and then some) plus ONE
    legal delete with null content — a tombstone legitimately carries no
    content and must survive validation."""
    return pa.table(
        {
            "lsn": pa.array(
                [None, MAX_LSN + 2, MAX_LSN + 3, MAX_LSN + 4, MAX_LSN + 5,
                 MAX_LSN + 6, MAX_LSN + 7],
                pa.int64(),
            ),
            "op": ["U", "X", "U", "I", "U", "I", "D"],
            "repo": ["r0", "r0", None, "r0", "r0", "r0",
                     clean.column("repo")[0].as_py()],
            "path": ["p", "p", "p", None, "p", "p",
                     clean.column("path")[0].as_py()],
            "commit": ["c"] * 7,
            "lang": ["py"] * 7,
            "content": ["x", "x", "x", "x", None, None, None],
        }
    )


@pytest.fixture(scope="module")
def dirty_log(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dirty_log"))
    write_change_log(SPEC, d)
    clean = generate_change_log(SPEC)
    pq.write_table(_dirty_rows(clean), os.path.join(d, "dirty.parquet"))
    return d, clean


def _oracle(clean: pa.Table) -> pd.DataFrame:
    # clean events + the one LEGAL dirty row (the D tombstone deletes key 0)
    legal = _dirty_rows(clean).slice(6, 1)
    return replay_oracle(
        pa.concat_tables([clean, legal], promote_options="permissive")
    )


def _final(out: str) -> pd.DataFrame:
    return (
        lake_table(out)
        .to_pandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )


def test_quarantine_captures_rejects_and_lake_matches_oracle(dirty_log, tmp_path):
    log, clean = dirty_log
    out, qdir = str(tmp_path / "lake"), str(tmp_path / "quarantine")
    res = replay(log, out, ReplayConfig(num_partitions=8, quarantine_dir=qdir))
    want = _oracle(clean)
    got = _final(out)[want.columns].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True), check_dtype=False)
    assert res.summary["events_rejected"] == 6
    assert res.summary["events_quarantined"] == 6
    qt = pa.concat_tables(
        [pq.read_table(f) for f in glob.glob(os.path.join(qdir, "*.parquet"))],
        promote_options="permissive",
    )
    assert len(qt) == 6
    reasons = sorted(qt.column("_reject_reason").to_pylist())
    assert reasons == sorted(
        ["null_lsn", "bad_op", "null_key", "null_key", "null_content",
         "null_content"]
    )


def test_quarantine_rerun_is_idempotent(dirty_log, tmp_path):
    log, _ = dirty_log
    out, qdir = str(tmp_path / "lake"), str(tmp_path / "quarantine")
    replay(log, out, ReplayConfig(num_partitions=8, quarantine_dir=qdir))
    files1 = sorted(glob.glob(os.path.join(qdir, "*.parquet")))
    replay(log, out, ReplayConfig(num_partitions=8, quarantine_dir=qdir))
    files2 = sorted(glob.glob(os.path.join(qdir, "*.parquet")))
    assert files1 == files2  # deterministic names: rewritten, not duplicated
    total = sum(pq.ParquetFile(f).metadata.num_rows for f in files2)
    assert total == 6


def test_all_strategies_identical_on_dirty_log(dirty_log, tmp_path):
    """The round-3 unification check: phase 1's narrow read derives content
    nullity from footer stats, so the late strategy rejects EXACTLY the rows
    the single-phase normalizer does — without it the strategies pick
    different winners on null-content updates."""
    log, _ = dirty_log
    lakes = {}
    for ex in ("late", "actor", "groupby"):
        out = str(tmp_path / f"lake_{ex}")
        replay(
            log, out,
            ReplayConfig(
                num_partitions=8, exchange=ex,
                allow_comparison_modes=(ex == "groupby"),
            ),
        )
        lakes[ex] = _final(out)
    pd.testing.assert_frame_equal(lakes["late"], lakes["actor"], check_dtype=False)
    pd.testing.assert_frame_equal(lakes["late"], lakes["groupby"], check_dtype=False)


def test_strict_mode_raises_before_any_commit(dirty_log, tmp_path):
    log, _ = dirty_log
    for ex in ("late", "actor"):
        out = str(tmp_path / f"lake_{ex}")
        with pytest.raises(Exception, match="invalid change events"):
            replay(
                log, out,
                ReplayConfig(num_partitions=8, exchange=ex, drop_invalid=False),
            )
        # fail-fast: nothing may have committed
        assert not glob.glob(os.path.join(out, "part=*", "manifest.json"))


def test_quarantine_requires_late_exchange(tmp_path):
    with pytest.raises(ValueError, match="requires exchange='late'"):
        replay(
            str(tmp_path / "log"), str(tmp_path / "lake"),
            ReplayConfig(exchange="actor", quarantine_dir=str(tmp_path / "q")),
        )


def test_clean_log_reports_zero_rejects(tmp_path):
    log = str(tmp_path / "log")
    write_change_log(ChangeLogSpec(n_keys=50, n_events=400, num_buckets=2), log)
    out = str(tmp_path / "lake")
    res = replay(log, out, ReplayConfig(num_partitions=4))
    assert res.summary["events_rejected"] == 0
    assert "events_quarantined" not in res.summary
