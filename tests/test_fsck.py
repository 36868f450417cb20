"""Lake integrity audit (fsck_lake): a committed lake passes shallow and
deep checks; every tampering mode is detected by the matching check."""

import json
import os

import pyarrow.parquet as pq

from sql_etl_pipeline_ray.config import ReplayConfig
from sql_etl_pipeline_ray.pipelines.replay import fsck_lake, replay
from sql_etl_pipeline_ray.sources.datagen import ChangeLogSpec, write_change_log
from sql_etl_pipeline_ray.state import manifest as mf


def _lake(tmp_path, **spec_kw):
    log = str(tmp_path / "log")
    lake = str(tmp_path / "lake")
    write_change_log(
        ChangeLogSpec(n_events=4000, n_keys=400, num_buckets=2, **spec_kw), log
    )
    replay(log, lake, ReplayConfig(num_partitions=4))
    return lake


def test_clean_lake_passes_shallow_and_deep(tmp_path):
    lake = _lake(tmp_path)
    rep = fsck_lake(lake)
    assert rep["ok"], rep["issues"]
    assert rep["partitions"] == 4 and rep["files"] >= 4
    assert rep["temp_files"] == 0
    deep = fsck_lake(lake, deep=True)
    assert deep["ok"], deep["issues"]
    assert deep["deep"] is True


def test_missing_file_and_temp_leftover_detected(tmp_path):
    lake = _lake(tmp_path)
    m = mf.read_manifest(lake, 0)
    pdir = mf.partition_dir(lake, 0)
    os.remove(os.path.join(pdir, m["files"][0]))
    # a crashed-write temp is informational, not an error
    open(os.path.join(pdir, "data-e9-deadbeef.parquet.inprogress"), "w").close()
    rep = fsck_lake(lake)
    assert not rep["ok"]
    assert any("missing" in i for i in rep["issues"])
    assert rep["temp_files"] == 1


def test_manifest_row_count_lie_detected(tmp_path):
    lake = _lake(tmp_path)
    pdir = mf.partition_dir(lake, 1)
    mp = os.path.join(pdir, "manifest.json")
    with open(mp) as f:
        m = json.load(f)
    m["rows"] += 7
    with open(mp, "w") as f:
        json.dump(m, f)
    rep = fsck_lake(lake)
    assert not rep["ok"]
    assert any("footer rows" in i for i in rep["issues"])


def test_deep_detects_tampered_content(tmp_path):
    """Rewrite one data file with altered content but the same row count:
    shallow passes (footer metadata intact), deep catches both the table
    digest and the per-row sha256 invariant."""
    lake = _lake(tmp_path)
    m = mf.read_manifest(lake, 2)
    fp = os.path.join(mf.partition_dir(lake, 2), m["files"][0])
    t = pq.read_table(fp)
    col = t.column("content").to_pylist()
    col[0] = (col[0] or "") + " TAMPERED"
    t = t.set_column(t.schema.get_field_index("content"), "content", [col])
    pq.write_table(t, fp, compression="zstd")
    assert fsck_lake(lake)["ok"]  # shallow can't see it
    deep = fsck_lake(lake, deep=True)
    assert not deep["ok"]
    assert any("digest mismatch" in i for i in deep["issues"])
    assert any("content_sha256" in i for i in deep["issues"])


def test_deep_detects_foreign_rows(tmp_path):
    """Move partition 3's file under partition 0's manifest: rows that
    hash-route elsewhere are flagged (wrong rescale / hash version)."""
    lake = _lake(tmp_path)
    m0 = mf.read_manifest(lake, 0)
    m3 = mf.read_manifest(lake, 3)
    src = os.path.join(mf.partition_dir(lake, 3), m3["files"][0])
    dst = os.path.join(mf.partition_dir(lake, 0), m0["files"][0])
    os.replace(src, dst)
    deep = fsck_lake(lake, deep=True)
    assert not deep["ok"]
    assert any("route to other partitions" in i for i in deep["issues"])


def test_repair_partition_fixes_tampered_and_missing(tmp_path):
    """fsck finds it, repair_partition rebuilds exactly that partition
    from the full log, fsck passes again and the lake equals the oracle."""
    import pandas as pd

    from sql_etl_pipeline_ray.pipelines.replay import lake_table, repair_partition
    from sql_etl_pipeline_ray.sources.datagen import generate_change_log, replay_oracle

    lake = _lake(tmp_path)
    spec = ChangeLogSpec(n_events=4000, n_keys=400, num_buckets=2)
    want = replay_oracle(generate_change_log(spec))

    # tamper partition 2's content (deep fsck catches it)
    m = mf.read_manifest(lake, 2)
    fp = os.path.join(mf.partition_dir(lake, 2), m["files"][0])
    t = pq.read_table(fp)
    col = t.column("content").to_pylist()
    col[0] = (col[0] or "") + " TAMPERED"
    t = t.set_column(t.schema.get_field_index("content"), "content", [col])
    pq.write_table(t, fp, compression="zstd")
    assert not fsck_lake(lake, deep=True)["ok"]

    rep = repair_partition(str(tmp_path / "log"), lake, 2)
    assert rep["part"] == 2 and rep["epoch"] == m["epoch"] + 1
    deep = fsck_lake(lake, deep=True)
    assert deep["ok"], deep["issues"]
    got = lake_table(lake).to_pandas()[want.columns.tolist()].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # a LOST partition (manifest + files gone) rebuilds from epoch 0
    import shutil

    shutil.rmtree(mf.partition_dir(lake, 1))
    assert not fsck_lake(lake)["ok"]
    rep = repair_partition(str(tmp_path / "log"), lake, 1)
    assert rep["epoch"] == 0 and rep["rows"] > 0
    assert fsck_lake(lake, deep=True)["ok"]
    got = lake_table(lake).to_pandas()[want.columns.tolist()].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # out-of-range partition refuses
    import pytest

    with pytest.raises(ValueError):
        repair_partition(str(tmp_path / "log"), lake, 99)


def test_deep_fsck_aggregate_semantics(tmp_path):
    """Deep fsck on an aggregate lake checks the state's own invariants
    (min<=max & n>0, HLL width vs hll_p, bottom-k bounds) — and catches
    a corrupted register column."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sql_etl_pipeline_ray.pipelines.aggregate import replay_aggregate
    from sql_etl_pipeline_ray.pipelines.replay import fsck_lake
    from sql_etl_pipeline_ray.state import manifest as mf

    rng = np.random.default_rng(17)
    rows = [dict(lsn=i + 1, op="I", repo=f"r{i % 3}", path=f"k{int(x)}",
                 delta=int(v), uid=int(u), val=int(v) * 2)
            for i, (x, v, u) in enumerate(zip(
                rng.integers(0, 40, 3000),
                rng.integers(-9, 90, 3000),
                rng.integers(0, 200, 3000)))]
    log = str(tmp_path / "log")
    os.makedirs(log)
    pq.write_table(pa.Table.from_pylist(rows), os.path.join(log, "b0.parquet"))
    lake = str(tmp_path / "lake")
    replay_aggregate(log, lake, ["delta"], num_partitions=2,
                     distinct_cols=["uid"], quantile_cols=["val"])
    rep = fsck_lake(lake, deep=True)
    assert rep["ok"], rep["issues"]
    assert rep["lake_kind"] == "aggregate"
    # corrupt one partition: swap min/max on a row (keeps the digest
    # check from masking it by ALSO rewriting the manifest digest)
    m = mf.read_manifest(lake, 0)
    pdir = mf.partition_dir(lake, 0)
    fp = os.path.join(pdir, m["files"][-1])
    t = pq.read_table(fp)
    mn = t.column("delta_min").to_pylist()
    mx = t.column("delta_max").to_pylist()
    mn[0], mx[0] = max(mn[0], mx[0]) + 1, min(mn[0], mx[0])
    t = t.set_column(t.schema.get_field_index("delta_min"), "delta_min",
                     pa.array(mn, pa.int64()))
    t = t.set_column(t.schema.get_field_index("delta_max"), "delta_max",
                     pa.array(mx, pa.int64()))
    pq.write_table(t, fp)
    rep2 = fsck_lake(lake, deep=True)
    assert not rep2["ok"]
    assert any("delta_min <= delta_max" in i for i in rep2["issues"])
