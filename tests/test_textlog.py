"""CSV / JSONL change-log ingestion: convert-to-staging then normal replay
must produce the exact oracle lake (including null-content deletes and
embedded newlines/commas/quotes in content)."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.csv as pacsv

from sql_etl_pipeline_ray.config import ReplayConfig
from sql_etl_pipeline_ray.pipelines.replay import lake_table, replay
from sql_etl_pipeline_ray.sources.datagen import (
    ChangeLogSpec,
    generate_change_log,
    replay_oracle,
)
from sql_etl_pipeline_ray.sources.textlog import convert_text_log

SPEC = ChangeLogSpec(n_events=4000, n_keys=300, seed=21, delete_frac=0.15)


def _buckets(events: pa.Table, n: int):
    """Split the event table into n contiguous-LSN buckets (like the
    parquet writer's layout)."""
    step = -(-len(events) // n)
    return [events.slice(i * step, step) for i in range(n)]


def _lake_vs_oracle(lake_dir: str, events: pa.Table):
    got = (
        lake_table(lake_dir)
        .to_pandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    want = replay_oracle(events).sort_values(["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[sorted(got.columns)], want[sorted(want.columns)])
    return len(got)


def test_csv_log_replays_to_oracle_lake(tmp_path):
    events = generate_change_log(SPEC)
    src = tmp_path / "csvlog"
    os.makedirs(src)
    for i, b in enumerate(_buckets(events, 4)):
        pacsv.write_csv(b, str(src / f"bucket-{i:03d}.csv"))
    summary = convert_text_log(str(src), str(tmp_path / "staging"))
    assert summary["files_converted"] == 4
    assert summary["rows_converted"] == len(events)
    replay(str(tmp_path / "staging"), str(tmp_path / "lake"), ReplayConfig(num_partitions=4))
    rows = _lake_vs_oracle(str(tmp_path / "lake"), events)
    assert rows > 0


def test_jsonl_log_replays_to_oracle_lake(tmp_path):
    events = generate_change_log(SPEC)
    src = tmp_path / "jlog"
    os.makedirs(src)
    for i, b in enumerate(_buckets(events, 3)):
        b.to_pandas().to_json(
            str(src / f"bucket-{i:03d}.jsonl"), orient="records", lines=True
        )
    convert_text_log(str(src), str(tmp_path / "staging"))
    replay(str(tmp_path / "staging"), str(tmp_path / "lake"), ReplayConfig(num_partitions=4))
    _lake_vs_oracle(str(tmp_path / "lake"), events)


def test_convert_is_idempotent_and_resumable(tmp_path):
    events = generate_change_log(SPEC)
    src = tmp_path / "csvlog"
    os.makedirs(src)
    for i, b in enumerate(_buckets(events, 4)):
        pacsv.write_csv(b, str(src / f"bucket-{i:03d}.csv"))
    out = str(tmp_path / "staging")
    s1 = convert_text_log(str(src), out)
    # delete one output: a re-run converts ONLY the missing file
    os.unlink(os.path.join(out, "bucket-001.parquet"))
    s2 = convert_text_log(str(src), out)
    assert s1["files_converted"] == 4
    assert s2["files_converted"] == 1 and s2["files_skipped"] == 3
    replay(out, str(tmp_path / "lake"), ReplayConfig(num_partitions=4))
    _lake_vs_oracle(str(tmp_path / "lake"), events)


def test_csv_evolved_extra_column_survives(tmp_path):
    """A bucket with an evolved extra column keeps it through conversion +
    replay (the parquet scan unifies schemas; earlier buckets null-fill)."""
    events = generate_change_log(SPEC)
    b = _buckets(events, 2)
    evolved = b[1].append_column(
        "size_bytes", pa.array([len(x) if x else 0 for x in b[1].column("content").to_pylist()], pa.int64())
    )
    src = tmp_path / "csvlog"
    os.makedirs(src)
    pacsv.write_csv(b[0], str(src / "bucket-000.csv"))
    pacsv.write_csv(evolved, str(src / "bucket-001.csv"))
    convert_text_log(str(src), str(tmp_path / "staging"))
    replay(str(tmp_path / "staging"), str(tmp_path / "lake"), ReplayConfig(num_partitions=4))
    lake = lake_table(str(tmp_path / "lake"))
    assert "size_bytes" in lake.column_names


def test_csv_adversarial_content_roundtrip(tmp_path):
    """Quotes, commas, CRLF, unicode, and leading/trailing spaces in
    content must survive the CSV round trip byte-exactly (keys are
    trimmed by the engine, content must NOT be)."""
    events = pa.table(
        {
            "lsn": pa.array([1, 2, 3, 4], pa.int64()),
            "op": ["I", "I", "I", "U"],
            "repo": ["org/r1", "org/r2", "org/r3", "org/r1"],
            "path": ["a.py", "b.py", "c.py", "a.py"],
            "commit": ["c1", "c2", "c3", "c4"],
            "lang": ["py", "py", "py", "py"],
            "content": [
                'say "hello", twice\r\nline2',
                "naïve — ünïcödé ✓ 中文",
                "  leading and trailing  ",
                "a,b,c\n,d",
            ],
        }
    )
    src = tmp_path / "csvlog"
    os.makedirs(src)
    pacsv.write_csv(events, str(src / "b0.csv"))
    convert_text_log(str(src), str(tmp_path / "staging"))
    replay(str(tmp_path / "staging"), str(tmp_path / "lake"), ReplayConfig(num_partitions=2))
    got = lake_table(str(tmp_path / "lake")).to_pandas().set_index("path")["content"]
    assert got["a.py"] == "a,b,c\n,d"  # U@4 wins over I@1
    assert got["b.py"] == "naïve — ünïcödé ✓ 中文"
    assert got["c.py"] == "  leading and trailing  "
