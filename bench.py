#!/usr/bin/env python
"""Benchmark harness (driver contract).

Plain run: one JSON line —
  {"metric": ..., "value": <headline replay sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "events": E, "events_per_sec": ...}

``--scaling``: runs the plain bench twice in FRESH processes at
``RAY_GRAFT_CPUS=8`` and ``32`` (the sandbox proxy for N vs 4N Ray nodes)
on the SAME input and reports both plus scaling efficiency
(T_hi/T_lo) / (cpus_hi/cpus_lo).

Headline pipeline: CDC change-log replay (datagen-synthesized log scaled by
sf; generated once and cached under /tmp, so both scaling runs and repeat
rounds measure replay, not generation; one untimed read warms the page
cache first).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

# N vs 4N parallelism proxy.  2→8 (not 8→32) because this sandbox VM's
# MEMORY subsystem saturates at ~8 concurrent processes (measured: 12 GB/s
# at 1 proc, 56 GB/s aggregate at 8, DEGRADING to 37 GB/s at 32) — real
# cluster nodes each bring their own memory controllers, so the CPU-count
# proxy is only faithful inside the machine's bandwidth envelope.  The 8→32
# numbers + the bandwidth-ceiling measurement are recorded in BASELINE.md.
SCALING_CPUS = tuple(
    int(x) for x in os.environ.get("RAY_GRAFT_SCALING_CPUS", "2,8").split(",")
)


def host_calibration() -> dict:
    """~2s single-thread memory-bandwidth probe, reported with every bench
    JSON.  This VM's host contention swings measured wall time by 2-4x
    between sessions (single-thread read bandwidth observed anywhere from
    2.4 to 12 GB/s on the same code); recording the host's speed alongside
    each number lets cross-round comparisons normalize for it."""
    import numpy as np

    a = np.zeros(1 << 27, dtype=np.uint8)  # 128 MiB
    reps = 8
    t0 = time.time()
    for _ in range(reps):
        a.sum()
    dt = time.time() - t0
    return {"host_read_bw_gbps": round(reps * a.nbytes / dt / 1e9, 2)}


def sf_from_dir(sf_dir: str) -> float:
    name = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


def ensure_bench_log(sf: float) -> tuple[str, int]:
    """Generate (once) the synthetic change log for this scale."""
    from sql_etl_pipeline_ray.sources.datagen import ChangeLogSpec, write_change_log

    # Sized so the replay's parallel work dominates fixed pipeline latency —
    # that is what the two-cluster-size scaling criterion measures.  100M
    # events (~9 GB Parquet) at sf=0.1.  content_pad=64 puts ~0.2-1.5 KB of
    # content on each event (FIXTURES.md says 0.1-16 KB) — with the
    # previous ~100-byte rows the replay was dominated by narrow-column
    # overheads that don't represent the real workload's decode/hash/
    # compress compute.  64 buckets × 128Ki-row groups keep read
    # parallelism ≥ 2 waves at 32 cpus.
    n_events = max(100_000, int(1_000_000_000 * sf))
    spec = ChangeLogSpec(
        n_keys=max(10_000, n_events // 20),
        n_events=n_events,
        num_buckets=64,
        hot_repo_share=0.3,
        content_pad=64,
    )
    log_dir = f"/tmp/cdc_bench/log_e{n_events}"
    marker = os.path.join(log_dir, "_COMPLETE")
    if not os.path.exists(marker):
        shutil.rmtree(log_dir, ignore_errors=True)
        write_change_log(spec, log_dir, processes=8)
        with open(marker, "w") as f:
            f.write("ok")
    return log_dir, n_events


def run_bench() -> dict:
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_from_dir(sf_dir)

    import ray

    ray.init(
        address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR"
    )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False

    from sql_etl_pipeline_ray.config import ReplayConfig
    from sql_etl_pipeline_ray.pipelines import analytics as A
    from sql_etl_pipeline_ray.pipelines.flagship import run_flagship
    from sql_etl_pipeline_ray.pipelines.replay import replay

    log_dir, n_events = ensure_bench_log(sf)
    # Warm the OS page cache so we measure compute+shuffle, not first read
    # (the sf tables too: the first query otherwise pays the cold read —
    # flagship measured 10.5 s cold vs 4.9-5.5 s warm at sf0.1).
    for d in (log_dir, sf_dir):
        for root, _, files in os.walk(d):
            for f in files:
                with open(os.path.join(root, f), "rb") as fh:
                    while fh.read(1 << 22):
                        pass

    out_dir = f"/tmp/cdc_bench/lake_{ncpu}"
    # Headline = min of 2 reps: this VM shows multi-×10-second contention
    # bursts (a 78.8 s outlier was recorded in a session whose adjacent
    # solo reps read 26.7/29.3 s), and a single-shot headline would pin a
    # burst into the round's record.  Both walls are reported
    # (replay_all_sec) so the spread stays visible.
    # (scaling mode keeps 1 rep per process — run_scaling already takes a
    # min over 3 interleaved fresh-process reps per cpu level)
    n_reps = 1 if os.environ.get("BENCH_ONLY_REPLAY") else 2
    replay_all = []
    for _ in range(n_reps):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.time()
        res = replay(log_dir, out_dir, ReplayConfig())  # adaptive blocks/partitions
        replay_all.append(round(time.time() - t0, 3))
    t_replay = min(replay_all)

    queries: dict[str, float] = {"cdc_replay": round(t_replay, 3)}

    if os.environ.get("BENCH_ONLY_REPLAY"):  # scaling mode: headline only
        result = {
            "metric": "cdc_replay_wall_sec",
            "value": round(t_replay, 3),
            "unit": "sec",
            "queries": queries,
            "sf": sf,
            "num_cpus": ncpu,
            "events": n_events,
            "events_per_sec": round(n_events / t_replay, 1),
            "live_rows": res.summary["live_rows"],
            "replay_all_sec": replay_all,
            **host_calibration(),
        }
        ray.shutdown()
        return result

    def timed(name, fn):
        # min-of-2 per query for the same reason as the headline: this VM
        # throws random ~10 s contention stalls that land on 1-2 queries
        # per run (different victims each time).  Actor pools are
        # per-execution in Ray Data, so the second rep re-pays pool
        # startup — the min measures the engine, not a warmer pool.
        walls = []
        for _ in range(2):
            t = time.time()
            out = fn(sf_dir)
            # consume lazily-built results
            if hasattr(out, "count") and not isinstance(out, (int, float)):
                out.count()
            walls.append(time.time() - t)
        queries[name] = round(min(walls), 3)

    timed("cdc_flagship_documents", lambda d: run_flagship(d))
    timed("cdc_lww_latest_event", A.cdc_lww_latest_event)
    timed("customer_order_metrics", A.customer_order_metrics)
    timed("monthly_sales_trends", lambda d: A.monthly_sales_trends(d))
    timed("product_performance", lambda d: A.product_performance(d))
    timed("per_order_allocation", A.per_order_allocation)
    timed("union_quality_report", lambda d: A.union_quality_report(d))
    timed("rfm_segmentation", A.rfm_segmentation)
    timed("inventory_optimization", A.inventory_optimization)
    timed("events_sliding_window", lambda d: A.events_sliding_window(d))
    # round-2 additions (round-1 entries above keep their names so the
    # driver's per-query series stays comparable across rounds)
    from sql_etl_pipeline_ray.pipelines import temporal as TJ
    from sql_etl_pipeline_ray.pipelines import training_data as T

    timed("events_asof_enrich", TJ.events_asof_enrich)
    timed("orders_value_percentiles", A.orders_value_percentiles)
    timed("top_terms", T.top_terms)
    # round-2 late additions: md5-rebased near-dup hashing + the composed
    # curation flow (quality gate -> dedup -> split -> per-split packing)
    timed("dedup_minhash_pairs", T.dedup_minhash_pairs)
    timed("docs_curation_pipeline", T.docs_curation_pipeline)
    # round-3 additions: the incremental near-dup gate and the
    # substring-duplication report (both window-hash shuffle shapes)
    timed("dedup_minhash_incremental", T.dedup_minhash_incremental)
    timed("docs_hot_passages", T.docs_hot_passages)
    # unigram-LM scoring: two linear passes + one vocab-sized exchange
    timed("docs_unigram_logprob", T.docs_unigram_logprob)
    # round-3 wrap-up additions: streaming regex scrub, the two-exchange
    # tf-idf, and end-to-end near-dup removal (pairs -> CC -> anti-join)
    timed("docs_pii_redact", T.docs_pii_redact)
    timed("docs_top_tfidf_terms", T.docs_top_tfidf_terms)
    timed("docs_dedup_near", T.docs_dedup_near)
    # bottom-k quantile sketch: one linear pass, ≤k rows per block shuffled
    timed("events_value_quantile_sketch", T.events_value_quantile_sketch)
    # round-3 final additions: LSH ANN, token-budget curation gate, and
    # the real-decode multimodal frame sampler
    timed("ann_lsh_topk", T.ann_lsh_topk)
    timed("docs_token_budget_select", T.docs_token_budget_select)
    timed("multimodal_frame_sample", T.multimodal_frame_sample)
    # transaction-consistent multi-table replay: demux + two lake replays
    # + atomic snapshot publish + pinned-epoch reads, end to end
    from sql_etl_pipeline_ray.pipelines.flagship import (
        run_aggregate_distinct_flagship,
        run_aggregate_flagship,
        run_txn_flagship,
    )

    timed("cdc_multitable", run_txn_flagship)
    # aggregate-state ingest: narrow exchange + reset-aware reduceat fold
    timed("cdc_aggregate_ingest", run_aggregate_flagship)
    # + per-key HLL distinct state (register scatter-max in the fold)
    timed("cdc_aggregate_distinct", run_aggregate_distinct_flagship)
    # + per-key bottom-k quantile state (lexsort + rank mask in the fold)
    from sql_etl_pipeline_ray.pipelines.flagship import (
        run_aggregate_quantiles_flagship,
    )

    timed("cdc_aggregate_quantiles", run_aggregate_quantiles_flagship)
    # the composed product story: replay → live lake → dedup + token gate
    # → per-language corpus totals (one SQL oracle end to end)
    from sql_etl_pipeline_ray.pipelines.flagship import (
        run_cdc_to_corpus,
        run_derived_flagship,
    )

    timed("cdc_to_corpus", run_cdc_to_corpus)
    # incrementally maintained derived table (build -> resume -> refresh)
    timed("cdc_derived_lake", run_derived_flagship)
    # event-time windowed rollup with allowed lateness (two-phase)
    from sql_etl_pipeline_ray.pipelines.flagship import run_windowed_flagship

    timed("cdc_windowed_ingest", run_windowed_flagship)
    # round-4 additions: the sampling family at scale (stratified = two
    # streaming passes with a broadcast per-lang floor; weighted/mixture =
    # one hash-coin pass each), so the sampler designs carry scale
    # receipts alongside their sf0.01 driver rows
    # log compaction flagship: winner hash_agg + filtered rewrite + replay
    from sql_etl_pipeline_ray.pipelines.flagship import run_compacted_flagship

    timed("cdc_log_compaction", run_compacted_flagship)
    timed("docs_stratified_sample", T.docs_stratified_sample)
    timed("docs_weighted_sample", T.docs_weighted_sample)
    timed("docs_mixture_sample", T.docs_mixture_sample)
    # round-5 rows: skew-valve aggregate ingest (reset-free valve engaged
    # mid-stream), sliced left lake join, real merge-table BPE encode
    from sql_etl_pipeline_ray.pipelines.flagship import (
        run_aggregate_skewed_flagship,
        run_lakejoin_left_flagship,
    )

    timed("cdc_aggregate_skewed", run_aggregate_skewed_flagship)
    timed("cdc_lake_join_left", run_lakejoin_left_flagship)
    timed("doc_bpe_encoded", T.doc_bpe_encoded)
    timed("docs_token_budget_bpe", T.docs_token_budget_bpe)

    # Incremental-ingest scenario: a caught-up-minus-one-bucket lake takes
    # the last LSN bucket (~1/64 of the log) as an increment, once
    # copy-on-write (touched partitions rewritten) and once merge-on-read
    # (delta files chained; SinkConfig.merge_on_read).  The base lake is
    # built untimed and cloned via hardlinks per rep (commits only ever
    # os.replace NEW files, so hardlink clones never alias writes).
    from sql_etl_pipeline_ray.config import SinkConfig

    inc_bytes: dict[str, int] = {}

    def _hardlink_clone(src: str, dst: str) -> None:
        shutil.rmtree(dst, ignore_errors=True)
        for root, _dirs, files in os.walk(src):
            rel = os.path.relpath(root, src)
            os.makedirs(os.path.join(dst, rel), exist_ok=True)
            for f in files:
                os.link(os.path.join(root, f), os.path.join(dst, rel, f))

    # numeric sort: the increment must be the HIGHEST-LSN bucket (resume's
    # watermark pruning contractually assumes an append-only LSN feed)
    buckets = sorted(
        (d for d in os.listdir(log_dir) if d.startswith("lsn_bucket=")),
        key=lambda d: int(d.split("=")[1]),
    )
    prefix_log = f"/tmp/cdc_bench/log_prefix_{ncpu}"
    shutil.rmtree(prefix_log, ignore_errors=True)
    os.makedirs(prefix_log)
    for d in buckets[:-1]:
        os.symlink(os.path.join(log_dir, d), os.path.join(prefix_log, d))
    inc_base = f"/tmp/cdc_bench/inc_base_{ncpu}"
    shutil.rmtree(inc_base, ignore_errors=True)
    replay(prefix_log, inc_base, ReplayConfig())  # untimed base build
    # min-of-2 INTERLEAVED reps per mode, like every other row: this VM's
    # host-contention bursts are multi-×10-second, and a single-shot row
    # once recorded mor at 31.7 s vs cow 10.1 s — inverting the true
    # relationship (interleaved A/Bs: mor ~2× FASTER).  The bytes numbers
    # are deterministic; walls need the min.
    inc_walls: dict[str, list[float]] = {"cow": [], "mor": []}
    for _rep in range(2):
        for mode in ("cow", "mor"):
            lk = f"/tmp/cdc_bench/inc_{mode}_{ncpu}"
            _hardlink_clone(inc_base, lk)
            t0 = time.time()
            r = replay(
                log_dir, lk, ReplayConfig(),
                sink=SinkConfig(out_dir=lk, merge_on_read=(mode == "mor")),
                resume=True,
            )
            inc_walls[mode].append(time.time() - t0)
            inc_bytes[mode] = int(r.metrics["bytes_written"].sum())
    for mode in ("cow", "mor"):
        queries[f"cdc_incremental_{mode}"] = round(min(inc_walls[mode]), 3)

    result = {
        "metric": "cdc_replay_wall_sec",
        "value": round(t_replay, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": ncpu,
        "events": n_events,
        "events_per_sec": round(n_events / t_replay, 1),
        "live_rows": res.summary["live_rows"],
        "replay_all_sec": replay_all,
        # exchange network volume per phase (Arrow bytes measured
        # actor-side) — the scale-relevant number a wall clock can't show
        "p1_routed_mb": res.summary.get("p1_routed_mb"),
        "p2_routed_mb": res.summary.get("p2_routed_mb"),
        # incremental write amplification: bytes committed applying the
        # same 1/64-of-log increment, copy-on-write vs merge-on-read
        "inc_bytes_written_cow": inc_bytes.get("cow"),
        "inc_bytes_written_mor": inc_bytes.get("mor"),
        **host_calibration(),
    }
    ray.shutdown()
    return result


def run_scaling(reps: int = 3) -> None:
    """Interleaved repetitions, min per level: the sandbox VM shows 2-4x
    run-to-run variance from host contention (kernel/steal time), so the
    minimum approximates uncontended performance at each parallelism.

    ``RAY_GRAFT_SCALING_CPUS`` may name MORE than two levels (e.g.
    "2,8,32"): each run interleaves all levels, and the report carries
    one efficiency per adjacent pair — the north rule's N→4N pair plus
    the upper pair that shows where the single-box memory-bandwidth
    envelope bends."""
    levels = sorted(set(SCALING_CPUS))
    times: dict[int, list[float]] = {n: [] for n in levels}
    events = 0
    host_bw: list[float] = []
    for _ in range(reps):
        for ncpu in levels:
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), BENCH_ONLY_REPLAY="1")
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                check=True,
            )
            r = json.loads(proc.stdout.strip().splitlines()[-1])
            times[ncpu].append(r["value"])
            events = r["events"]
            if "host_read_bw_gbps" in r:
                host_bw.append(r["host_read_bw_gbps"])
    best = {n: min(ts) for n, ts in times.items()}
    out: dict = {"metric": "cdc_replay_scaling", "events": events}
    for n in levels:
        out[f"sec_{n}cpu"] = best[n]
        out[f"events_per_sec_{n}cpu"] = round(events / best[n], 1)
    pair_eff = {
        f"{lo}to{hi}": round((best[lo] / best[hi]) / (hi / lo), 3)
        for lo, hi in zip(levels, levels[1:])
    }
    # headline efficiency = the first adjacent pair (the documented N→4N)
    out["scaling_efficiency"] = next(iter(pair_eff.values()))
    if len(pair_eff) > 1:
        out["scaling_efficiency_per_pair"] = pair_eff
    for n in levels:
        out[f"all_sec_{n}cpu"] = times[n]
    out["host_read_bw_gbps_per_run"] = host_bw
    print(json.dumps(out))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
