"""Run monitoring / lineage rollups (reference etl_log + monitoring query,
``sql/etl_transformations.sql:313-361``).

Lineage lives as per-partition ``metrics.json`` next to each manifest plus
a ``run_summary.json`` per run — tiny driver-side JSON, so the rollup is a
plain pandas aggregation (the reference's monitoring rollup is likewise a
query over its small etl_log table)."""

from __future__ import annotations

import glob
import json
import os

import pandas as pd


def load_partition_metrics(lake_dir: str) -> pd.DataFrame:
    rows = []
    for f in sorted(glob.glob(os.path.join(lake_dir, "part=*", "metrics.json"))):
        with open(f) as fh:
            rows.append(json.load(fh))
    return pd.DataFrame(rows)


def metrics_rollup(lake_dir: str) -> dict:
    """Run-level rollup: totals, skew indicators, throughput."""
    df = load_partition_metrics(lake_dir)
    if df.empty:
        return {"partitions": 0}
    events = df["events_in"].sum()
    return {
        "partitions": int(len(df)),
        "events_in": int(events),
        "live_rows": int(df["live_rows"].sum()),
        "deleted_keys": int(df["deleted_keys"].sum()),
        "orphan_events": int(
            df["orphan_events_applied"].sum() + df["orphan_deletes"].sum()
        ),
        "bytes_written": int(df["bytes_written"].sum()),
        "max_partition_events": int(df["events_in"].max()),
        # skew indicator: biggest partition's share of events (salting /
        # key-hash health check, SURVEY.md §4 skew row)
        "skew_max_share": round(float(df["events_in"].max() / max(events, 1)), 4),
        "slowest_partition_s": float(df["duration_s"].max()),
        "total_partition_s": round(float(df["duration_s"].sum()), 3),
    }


# Named-pipeline registry (reference ST3: the named SQL-query registry,
# src/sql_query_executor.py:26-76 — ours is named Python pipeline builders).
def registry() -> dict:
    from . import analytics as A
    from . import training_data as T
    from .flagship import run_flagship

    reg = {"cdc_replay": run_flagship}
    for mod in (A, T):
        for name in dir(mod):
            fn = getattr(mod, name)
            if callable(fn) and not name.startswith("_") and getattr(fn, "__module__", "") == mod.__name__:
                reg[name] = fn
    return reg
