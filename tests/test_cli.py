"""CLI surface smoke: the verbs chain end-to-end in subprocesses
(each owns its Ray session per the driver contract)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args):
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    out = subprocess.run(
        [sys.executable, "-m", "sql_etl_pipeline_ray.cli", *args],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cli_gen_replay_status_resume(tmp_path):
    log, lake = str(tmp_path / "log"), str(tmp_path / "lake")
    gen = run_cli("gen-data", log, "--events", "5000", "--keys", "500", "--buckets", "4")
    assert gen["events"] == 5000

    rep = run_cli("--num-cpus", "4", "replay", log, lake, "--partitions", "4")
    assert rep["partitions_committed"] == 4 and rep["events_in"] == 5000

    st = run_cli("status", lake)
    assert st["partitions"] == 4 and st["rows"] == rep["live_rows"]

    res = run_cli("--num-cpus", "4", "replay", log, lake, "--resume")
    assert res["partitions_committed"] == 0  # caught up: exactly-once no-op

    fk = run_cli("fsck", lake)  # shallow audit — no Ray session
    assert fk["ok"] and fk["partitions"] == 4 and not fk["issues"]


def test_cli_convert_csv_then_replay(tmp_path):
    import pyarrow.csv as pacsv

    from sql_etl_pipeline_ray.sources.datagen import ChangeLogSpec, generate_change_log

    events = generate_change_log(ChangeLogSpec(n_events=2000, n_keys=200, seed=9))
    src = tmp_path / "csvlog"
    os.makedirs(src)
    half = len(events) // 2
    pacsv.write_csv(events.slice(0, half), str(src / "b0.csv"))
    pacsv.write_csv(events.slice(half), str(src / "b1.csv"))

    staging, lake = str(tmp_path / "staging"), str(tmp_path / "lake")
    conv = run_cli("--num-cpus", "4", "convert", str(src), staging)
    assert conv["files_converted"] == 2 and conv["rows_converted"] == 2000

    rep = run_cli("--num-cpus", "4", "replay", staging, lake, "--partitions", "4")
    assert rep["events_in"] == 2000 and rep["partitions_committed"] == 4


def test_cli_export_roundtrip(tmp_path):
    """export (lake -> JSONL) is the reverse of convert: converting the
    export back to staging and replaying must reproduce the lake rows."""
    import pandas as pd

    log, lake = str(tmp_path / "log"), str(tmp_path / "lake")
    run_cli("gen-data", log, "--events", "2000", "--keys", "200", "--buckets", "2")
    run_cli("--num-cpus", "4", "replay", log, lake, "--partitions", "4")

    out = str(tmp_path / "export")
    rep = run_cli("--num-cpus", "4", "export", lake, out, "--format", "jsonl",
                  "--columns", "repo", "path", "lsn", "content")
    files = [f for f in os.listdir(out) if not f.startswith(".")]
    assert rep["rows"] > 0 and files
    dfs = [pd.read_json(os.path.join(out, f), lines=True) for f in files]
    got = pd.concat(dfs).sort_values(["repo", "path"]).reset_index(drop=True)
    assert len(got) == rep["rows"]
    assert set(got.columns) == {"repo", "path", "lsn", "content"}


def test_cli_rescale(tmp_path):
    log, lake = str(tmp_path / "log"), str(tmp_path / "lake")
    run_cli("gen-data", log, "--events", "3000", "--keys", "300", "--buckets", "3")
    rep = run_cli("--num-cpus", "4", "replay", log, lake, "--partitions", "8")
    wide = str(tmp_path / "wide")
    rs = run_cli("--num-cpus", "4", "rescale", lake, wide, "--partitions", "3")
    assert rs["partitions"] == 3 and rs["rescaled_from"] == 8
    assert rs["rows"] == rep["live_rows"]
    st = run_cli("status", wide)
    assert st["partitions"] == 3 and st["rows"] == rep["live_rows"]


def test_cli_diff_changefeed(tmp_path):
    log, lake = str(tmp_path / "log"), str(tmp_path / "lake")
    run_cli("gen-data", log, "--events", "4000", "--keys", "400", "--buckets", "4")
    # first half, then resume full — keep_epochs=2 retains epoch 0
    import shutil as sh
    partial = str(tmp_path / "partial")
    os.makedirs(partial)
    for k in range(2):
        sh.copytree(os.path.join(log, f"lsn_bucket={k}"),
                    os.path.join(partial, f"lsn_bucket={k}"))
    run_cli("--num-cpus", "4", "replay", partial, lake, "--partitions", "4",
            "--keep-epochs", "2")
    run_cli("--num-cpus", "4", "replay", log, lake, "--resume",
            "--keep-epochs", "2")
    out = run_cli("--num-cpus", "4", "diff", lake, str(tmp_path / "feed"),
                  "--from-epoch", "0")
    assert out["events"] > 0
    assert set(out["by_op"]) <= {"I", "U", "D"}
    assert sum(out["by_op"].values()) == out["events"]


def test_cli_export_with_pending(tmp_path):
    """export --with-pending merges the un-replayed tail: exporting a
    half-replayed lake with the full log equals exporting a fully
    replayed lake."""
    import pandas as pd
    import shutil

    log, lake = str(tmp_path / "log"), str(tmp_path / "lake")
    run_cli("gen-data", log, "--events", "2000", "--keys", "200", "--buckets", "4")
    partial = str(tmp_path / "partial")
    os.makedirs(partial)
    for k in range(2):
        shutil.copytree(
            os.path.join(log, f"lsn_bucket={k}"),
            os.path.join(partial, f"lsn_bucket={k}"),
        )
    run_cli("--num-cpus", "4", "replay", partial, lake, "--partitions", "4")

    out = str(tmp_path / "merged")
    rep = run_cli(
        "--num-cpus", "4", "export", lake, out, "--format", "jsonl",
        "--with-pending", log, "--columns", "repo", "path", "lsn",
    )

    full_lake = str(tmp_path / "lake_full")
    run_cli("--num-cpus", "4", "replay", log, full_lake, "--partitions", "4")
    out2 = str(tmp_path / "full")
    rep2 = run_cli(
        "--num-cpus", "4", "export", full_lake, out2, "--format", "jsonl",
        "--columns", "repo", "path", "lsn",
    )
    assert rep["rows"] == rep2["rows"] > 0

    def load(d):
        dfs = [
            pd.read_json(os.path.join(d, f), lines=True)
            for f in os.listdir(d)
            if not f.startswith(".")
        ]
        return pd.concat(dfs).sort_values(["repo", "path"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(load(out), load(out2))


def test_cli_get_point_read(tmp_path):
    from sql_etl_pipeline_ray.sources.datagen import (
        ChangeLogSpec, generate_change_log, replay_oracle,
    )

    log, lake = str(tmp_path / "log"), str(tmp_path / "lake")
    run_cli("gen-data", log, "--events", "2000", "--keys", "200", "--buckets", "4")
    run_cli("--num-cpus", "4", "replay", log, lake, "--partitions", "4")

    want = replay_oracle(generate_change_log(ChangeLogSpec(n_events=2000, n_keys=200)))
    row = want.iloc[11]
    got = run_cli(
        "--num-cpus", "4", "get", lake, row["repo"], row["path"],
        "--columns", "content,lsn",
    )
    assert got["found"] and len(got["partition_probed"]) == 1
    assert got["partitions_total"] == 4
    assert got["rows"] == [{"content": row["content"], "lsn": int(row["lsn"])}]


def test_cli_logtools_verbs(tmp_path):
    """compact-log → convert-sidestore → fsck-log round-trip."""
    import json as _json

    from sql_etl_pipeline_ray.cli import main
    from sql_etl_pipeline_ray.sources.datagen import (
        ChangeLogSpec, write_change_log,
    )

    spec = ChangeLogSpec(n_events=3000, n_keys=200, seed=101)
    log, comp = str(tmp_path / "log"), str(tmp_path / "comp")
    write_change_log(spec, log)
    assert main(["compact-log", log, comp, "--partitions", "2"]) == 0
    assert main(["convert-sidestore", comp]) == 0
    assert main(["fsck-log", comp]) == 0
    # corrupt a sibling -> nonzero exit
    import glob as _glob

    import pyarrow.parquet as _pq

    sib = _glob.glob(os.path.join(comp, "**", "*.content.parquet"),
                     recursive=True)[0]
    t = _pq.read_table(sib)
    _pq.write_table(t.slice(0, max(1, len(t) - 20)), sib)
    assert main(["fsck-log", comp]) == 1


def test_cli_compact_and_fsck_all_lake_kinds(tmp_path):
    """Maintenance-surface parity (VERDICT r4 #4): CLI ``compact``
    auto-dispatches on the lake kind and CLI ``fsck`` reports the kind
    plus outstanding chain receipts — identically for document lakes,
    derived lakes and aggregate-state lakes."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sql_etl_pipeline_ray.pipelines.aggregate import (
        read_aggregate_lake, replay_aggregate)
    from sql_etl_pipeline_ray.pipelines.derive import refresh_derived_lake
    from sql_etl_pipeline_ray.pipelines.replay import read_lake
    from sql_etl_pipeline_ray.config import SinkConfig

    def lake_df(lake, agg=False):
        ds = read_aggregate_lake(lake) if agg else read_lake(lake)
        return (ds.to_pandas().sort_values(["repo", "path"])
                .reset_index(drop=True))

    # 1. document lake with a MOR chain, built entirely via the CLI
    # (chunk-invariant datagen: same seed + more events = LSN extension)
    log1, log2 = str(tmp_path / "log1"), str(tmp_path / "log2")
    doc = str(tmp_path / "doc_lake")
    run_cli("gen-data", log1, "--events", "2000", "--keys", "300",
            "--buckets", "4")
    run_cli("gen-data", log2, "--events", "4000", "--keys", "300",
            "--buckets", "4")
    run_cli("--num-cpus", "4", "replay", log1, doc, "--partitions", "4")

    # 2. derived lake: base refresh on the pre-increment doc state, then
    # a merge-on-read refresh after the doc lake's MOR increment — both
    # lakes end chained
    derived = str(tmp_path / "derived_lake")

    def n_chars(df):
        out = df[["repo", "path"]].copy()
        out["n_chars"] = df["content"].str.len().astype("int64")
        return out

    refresh_derived_lake(doc, derived, n_chars, keep_epochs=2)
    run_cli("--num-cpus", "4", "replay", log2, doc, "--resume",
            "--merge-on-read")
    refresh_derived_lake(doc, derived, n_chars, keep_epochs=2,
                         merge_on_read=True)

    # 3. aggregate lake with a MOR chain (int64-delta metrics log)
    rng = np.random.default_rng(7)
    rows = [(i + 1, "I" if i % 2 else "U", f"r{int(k) % 3}", f"k{int(k)}",
             int(v))
            for i, (k, v) in enumerate(
                zip(rng.integers(0, 120, 3000), rng.integers(-5, 90, 3000)))]
    alog1, alog2 = str(tmp_path / "alog1"), str(tmp_path / "alog2")
    for d, chunk in ((alog1, rows[:1500]), (alog2, rows)):
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            pa.table({
                "lsn": pa.array([r[0] for r in chunk], pa.int64()),
                "op": pa.array([r[1] for r in chunk]),
                "repo": pa.array([r[2] for r in chunk]),
                "path": pa.array([r[3] for r in chunk]),
                "delta": pa.array([r[4] for r in chunk], pa.int64()),
            }), os.path.join(d, "b00.parquet"))
    agg = str(tmp_path / "agg_lake")
    replay_aggregate(alog1, agg, value_cols=["delta"], num_partitions=4)
    replay_aggregate(alog2, agg, value_cols=["delta"], num_partitions=4,
                     resume=True,
                     sink=SinkConfig(out_dir=agg, merge_on_read=True))

    matrix = [
        (doc, "document", False),
        (derived, "document", False),
        (agg, "aggregate", True),
    ]
    for lake, kind, is_agg in matrix:
        before = lake_df(lake, agg=is_agg)
        fk = run_cli("fsck", lake)
        assert fk["ok"], (lake, fk["issues"])
        assert fk["lake_kind"] == kind, (lake, fk)
        assert fk["chained_partitions"] > 0, (lake, fk)
        cp = run_cli("compact", lake)
        assert cp["lake_kind"] == kind and cp["partitions_compacted"] > 0
        fk2 = run_cli("fsck", lake, "--deep")
        assert fk2["ok"], (lake, fk2["issues"])
        assert fk2["chained_partitions"] == 0
        after = lake_df(lake, agg=is_agg)
        import pandas as pd

        pd.testing.assert_frame_equal(before, after)
    # explicit --kind override still works
    cp = run_cli("compact", agg, "--kind", "aggregate")
    assert cp["lake_kind"] == "aggregate" and cp["partitions_compacted"] == 0
