"""Typed engine configuration.

The reference configures via env vars parsed in ``config/config.py:39-68``
(BATCH_SIZE, MAX_WORKERS, MAX_RETRIES, NULL_THRESHOLD, incremental column);
we use an explicit dataclass passed to the pipeline builders, with env-var
overrides only where the bench/driver contract requires them.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass
class ReplayConfig:
    """Configuration for a CDC replay run."""

    # Number of hash partitions for the (repo, path) shuffle.  At 100 TB this
    # is sized so one partition's final state fits a worker's heap
    # (total_bytes / ~256 MiB); at test scale a few dozen keeps task overhead
    # low while still exercising the multi-partition paths.
    num_partitions: int = 32

    # Rows per batch through the normalize stage.  Content rows can be wide
    # (multi-KB strings), so this is rows, bounded by block bytes via
    # DataContext.target_max_block_size rather than here.
    batch_size: int | None = None

    # Drop events that fail hard validation (bad op, null key) instead of
    # raising.  Mirrors the reference's warn-only validation flow
    # (src/etl_pipeline.py:163-167): invalid data is reported, not fatal.
    drop_invalid: bool = True

    # Pre-fold combiner: collapse to latest-per-key within each batch before
    # the shuffle (partial aggregation — cuts shuffle volume when a batch
    # holds several versions of one key).
    combine_before_shuffle: bool = True

    # Parallelism hint for read tasks; None lets Ray Data decide.
    read_concurrency: int | None = None


@dataclass
class SinkConfig:
    """Exactly-once Parquet sink layout."""

    out_dir: str = "/tmp/cdc_lake"
    compression: str = "zstd"
    # Write one file per partition per epoch; partitions are the resume unit.
    # (SURVEY.md §7 M3: temp write → atomic rename → manifest CAS.)


def bench_cpus() -> int:
    """Parallelism level for bench runs (driver contract: RAY_GRAFT_CPUS)."""
    return int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def bench_sf_dir() -> str:
    """Input dir for bench runs (driver contract: GRAFT_SF_DIR)."""
    return os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
