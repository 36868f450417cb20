"""Lake rescale: re-hash a committed lake to a new partition count.

The sink writes whole-partition epochs, so compaction == rescale (4096
near-empty parts → 64, or 8 overstuffed → 256).  Correctness contract:
content identical to the source, and `resume=True` over the rescaled lake
lands on the same final state as a one-shot replay (the new per-partition
checkpoint is the global min of source watermarks — see the
`rescale_lake` docstring for why that is the only safe scalar).
"""

import glob
import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sql_etl_pipeline_ray.config import ReplayConfig
from sql_etl_pipeline_ray.pipelines.replay import (
    lake_table,
    read_lake,
    replay,
    rescale_lake,
)
from sql_etl_pipeline_ray.sources.datagen import (
    ChangeLogSpec,
    replay_oracle,
    write_change_log,
)
from sql_etl_pipeline_ray.state import manifest as mf


@pytest.fixture(scope="module")
def log_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("rs_changelog"))
    write_change_log(ChangeLogSpec(n_keys=250, n_events=2000, num_buckets=5), d)
    return d


def _read_log(d):
    files = sorted(glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True))
    return pa.concat_tables(
        [pq.read_table(f) for f in files], promote_options="permissive"
    )


def _frames_equal(got, want):
    want = want.reset_index(drop=True)
    got = got[want.columns].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("new_parts", [3, 16])
def test_rescale_preserves_content(log_dir, tmp_path, new_parts):
    src = str(tmp_path / "src")
    dst = str(tmp_path / f"dst{new_parts}")
    replay(log_dir, src, ReplayConfig(num_partitions=8))
    summary = rescale_lake(src, dst, new_parts)
    assert summary["partitions"] == new_parts
    _frames_equal(lake_table(dst).to_pandas(), lake_table(src).to_pandas())
    # every partition has a manifest (empty ones included) so resume's
    # file-level pruning stays armed
    manifests = mf.read_all_manifests(dst)
    assert set(manifests) == set(range(new_parts))
    assert all(
        m["stats"]["num_partitions"] == new_parts for m in manifests.values()
    )


def test_rescale_files_are_key_clustered(log_dir, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    replay(log_dir, src, ReplayConfig(num_partitions=8))
    rescale_lake(src, dst, 4)
    for part, m in mf.read_all_manifests(dst).items():
        for f in m["files"]:
            t = pq.read_table(os.path.join(mf.partition_dir(dst, part), f))
            if len(t) < 2:
                continue
            df = t.select(["repo", "path"]).to_pandas()
            assert (
                df.sort_values(["repo", "path"]).reset_index(drop=True).equals(
                    df.reset_index(drop=True)
                )
            )


def test_resume_after_rescale_matches_oneshot(log_dir, tmp_path):
    """The headline contract: replay half, rescale to a different width,
    resume the full log ONTO the rescaled lake, equal a one-shot replay."""
    partial = str(tmp_path / "partial")
    os.makedirs(partial)
    for k in range(3):
        shutil.copytree(
            os.path.join(log_dir, f"lsn_bucket={k}"),
            os.path.join(partial, f"lsn_bucket={k}"),
        )
    src = str(tmp_path / "src")
    replay(partial, src, ReplayConfig(num_partitions=8))
    dst = str(tmp_path / "rescaled")
    rescale_lake(src, dst, 5)
    res = replay(log_dir, dst, ReplayConfig(num_partitions=5), resume=True)
    _frames_equal(
        lake_table(dst).to_pandas(), replay_oracle(_read_log(log_dir))
    )
    assert res.summary["live_rows"] == len(replay_oracle(_read_log(log_dir)))


def test_rescale_idempotent_rerun(log_dir, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    replay(log_dir, src, ReplayConfig(num_partitions=8))
    rescale_lake(src, dst, 4)
    d1 = {p: m["digest"] for p, m in mf.read_all_manifests(dst).items()}
    rescale_lake(src, dst, 4)  # re-run bumps epochs, content identical
    d2 = {p: m["digest"] for p, m in mf.read_all_manifests(dst).items()}
    assert d1 == d2


def test_rescale_guards(log_dir, tmp_path):
    src = str(tmp_path / "src")
    replay(log_dir, src, ReplayConfig(num_partitions=4))
    with pytest.raises(ValueError, match="src == dst"):
        rescale_lake(src, src, 8)
    with pytest.raises(ValueError, match="no committed lake"):
        rescale_lake(str(tmp_path / "nowhere"), str(tmp_path / "d"), 8)
    # partially-committed source: drop one partition's manifest
    broken = str(tmp_path / "broken")
    shutil.copytree(src, broken)
    os.unlink(os.path.join(mf.partition_dir(broken, 0), mf.MANIFEST_NAME))
    with pytest.raises(ValueError, match="partially committed"):
        rescale_lake(broken, str(tmp_path / "d2"), 8)


def test_rescale_preserves_evolved_schema(tmp_path):
    log = str(tmp_path / "log")
    write_change_log(
        ChangeLogSpec(
            n_keys=120, n_events=1000, num_buckets=4, evolve_after_frac=0.5
        ),
        log,
    )
    src = str(tmp_path / "src")
    replay(log, src, ReplayConfig(num_partitions=6))
    dst = str(tmp_path / "dst")
    rescale_lake(src, dst, 3)
    got = lake_table(dst).to_pandas()
    assert "size_bytes" in got.columns
    _frames_equal(got, lake_table(src).to_pandas())
