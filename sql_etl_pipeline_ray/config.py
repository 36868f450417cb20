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

    # Number of hash partitions for the (repo, path) shuffle.  None →
    # adaptive: max(cluster CPUs, input_bytes / 256 MiB), so one partition's
    # state fits a worker's heap at any scale while small runs don't drown
    # in per-task overhead.  Shuffle fragment count is read_blocks ×
    # partitions — keeping both proportional to data (not hardcoded high)
    # is what keeps the sort exchange from degenerating into tens of
    # thousands of tiny object transfers.
    num_partitions: int | None = None

    # Rows per batch through the normalize/feed stage.  Large batches matter:
    # every batch costs one ack round-trip per touched partition, so tiny
    # batches turn the exchange latency-bound (measured 115s → 29s on a 40M
    # event replay going from ~10k-row to 1M-row batches).  Content rows can
    # be wide (multi-KB strings) — lower this when content_pad/row size is
    # large, or cap block bytes via DataContext.target_max_block_size.
    batch_size: int | None = 1_000_000

    # Drop events that fail hard validation (bad op, null lsn/key, null
    # content on I/U) instead of raising.  Mirrors the reference's warn-only
    # validation flow (src/etl_pipeline.py:163-167): invalid data is
    # reported (run_summary "events_rejected"), not fatal.  False = strict
    # mode — the replay raises with a reason histogram BEFORE any partition
    # commits, in every exchange strategy.
    drop_invalid: bool = True

    # Late-strategy content-presence validation (I/U events must carry
    # content; tombstones need not).  Phase 1 reads only (lsn, op, repo,
    # path), so content nullity comes from Parquet footer stats:
    # - "auto" (default): null_count==0 → proven valid; null_count > the
    #   row group's D count → decode content for THAT row group only;
    #   otherwise optimistic (the nulls are the tombstones'), with an exact
    #   verify over the decoded WINNERS in phase 2 that fails loudly
    #   before any commit if the optimism was wrong.
    # - "decode": always decode the content null mask in phase 1 — exact
    #   up front; for logs that mix content-bearing deletes with
    #   null-content upserts.
    # - "off": skip the content invariant entirely (null-content upserts
    #   commit with null content; diverges from the single-phase
    #   normalizer's validation — comparison/escape hatch only).
    content_check: str = "auto"

    # Content side-store logs (ChangeLogSpec.layout="sidestore": meta
    # files + lsn-sorted ``*.content.parquet`` siblings).  "auto" reads
    # them with late materialization — phase 2 fetches only the content
    # row groups that hold surviving LSNs (the run summary reports
    # p2_content_bytes_read vs p2_content_bytes_total); "reject" refuses
    # side-store logs (operators that mandate the inline layout).  Only
    # the late exchange can read side-store logs either way.
    content_sidestore: str = "auto"

    # Side-store phase-2 fragmenting tradeoff, measured at 100M events:
    # "bytes" (default) = one fragment per meta file — each content row
    # group is read at most once (2.79 GB fetched), the right choice when
    # storage bandwidth is the constraint (remote object stores); but
    # winner-heavy tail buckets serialize into single tasks.  "latency" =
    # row-group-packed fragments — restores intra-file parallelism on the
    # winner-dense tail (local-disk walls ~2 s better) at the cost of
    # each fragment re-fetching the hot content row groups its winners
    # land in (5.16 GB fetched, ~1.85x duplication).
    sidestore_fragmenting: str = "bytes"

    # Dead-letter sink: when set, the late strategy's phase-2 read (which
    # decodes full rows anyway) captures every rejected event — full
    # fidelity plus a ``_reject_reason`` column — as Parquet under this
    # directory, one file per read fragment with a deterministic name
    # (task retries and re-runs overwrite, never duplicate).  The run
    # summary reports "events_quarantined"; use a fresh directory per log
    # so stale capture files from earlier inputs can't linger.
    quarantine_dir: str | None = None

    # Pre-fold combiner: collapse to latest-per-key within each batch before
    # the shuffle (partial aggregation — cuts shuffle volume when a batch
    # holds several versions of one key).  Default OFF: the combiner costs a
    # full per-batch sort, which only pays when keys repeat within a batch
    # (high-update-rate logs / small key universes); enable it for those.
    combine_before_shuffle: bool = False

    # Late-strategy phase-1 combiner: pre-fold latest-per-key WITHIN each
    # batch (narrow key/LSN projection only) before routing to the winner
    # actors — it caps a hot key's per-partition phase-1 volume at one row
    # per (key, batch) instead of one per event: the explicit skew valve
    # for a single (repo, path) receiving a large share of all updates.
    # ADAPTIVE: the fold costs a per-batch sort (~600ms/1M rows), pure
    # overhead on low-duplication batches, so it only runs when a stride-
    # sampled duplicate-ratio estimate says the batch is duplicate-heavy
    # (pipelines/replay.py).  Exactness is preserved either way — winners
    # are identical folded or not; the combiner only reduces routed volume.
    phase1_combine: bool = True

    # Combiner decision mode: "adaptive" (stride-sampled dup ratio decides
    # per batch), "always" (unconditional per-batch fold — the pre-adaptive
    # behavior, useful for A/B), "never".  Only consulted when
    # phase1_combine is True.
    phase1_combine_mode: str = "adaptive"

    # Parallelism hint for read tasks; None lets Ray Data decide.
    read_concurrency: int | None = None

    # Resume-time watermark pruning (skip files whose footer max-LSN and
    # rows whose LSN sit at/below the per-partition checkpoints).  A pure
    # OPTIMIZATION whose validity rests on the log being append-only in
    # LSN; a multi-source fan-in feed (pipelines/fanin.py) interleaves
    # per-source LSN spaces, so a late source legitimately delivers
    # events BELOW another source's committed watermark — those must not
    # be pruned.  Correctness with pruning off comes from the LWW fold
    # being idempotent (re-applying an already-committed event re-picks
    # the same winner) plus persisted tombstones (SinkConfig.
    # keep_tombstones) so a late lower-LSN event can never resurrect a
    # deleted key.
    watermark_prune: bool = True

    # Exchange implementation for the (repo, path) hash shuffle:
    # - "late":    two-phase late materialization (default — phase 1
    #              shuffles only (lsn, op, repo, path) to pick winning LSNs,
    #              phase 2 re-reads the log and routes ONLY surviving rows;
    #              content never enters a shuffle.  Measured 6.5x faster
    #              than "actor" on a 20M-event log at 8 cpus: 19.5s vs
    #              126s, because "actor" ships every event's content
    #              through the exchange while "late" ships ~live_rows/20th)
    # - "actor":   single-phase: route normalized FULL rows straight to the
    #              stateful merge-actor pool (simpler; competitive only
    #              when rows are narrow or nearly all events survive)
    # - "groupby": ds.groupby(part).map_groups (pure Dataset API path,
    #              kept ONLY as a correctness cross-check; Ray's generic
    #              shuffle re-sorts the whole payload, measured 15-40x
    #              slower on content-heavy rows).  Guarded: selecting it
    #              raises unless allow_comparison_modes=True so the
    #              documented anti-pattern can't ship as a production path.
    exchange: str = "late"

    # Opt-in for the measured-slow comparison exchange ("groupby").  Tests
    # set this to cross-check that all strategies produce byte-identical
    # lakes; production entry points (CLI, bench) never do.
    allow_comparison_modes: bool = False


@dataclass
class SinkConfig:
    """Exactly-once Parquet sink layout."""

    out_dir: str = "/tmp/cdc_lake"
    compression: str = "zstd"
    # Write one file per partition per epoch; partitions are the resume unit.
    # (SURVEY.md §7 M3: temp write → atomic rename → manifest CAS.)

    # Epoch-file grace window for concurrent readers: how many epochs'
    # data files survive lazy GC at commit (1 = current only, the
    # default).  A reader that loaded the previous manifest just before a
    # commit still holds the old file name; keep_epochs=2 lets that read
    # finish (costing up to 2x lake disk between commits) — set it for
    # lakes served while a tail_change_log loop commits.
    keep_epochs: int = 1

    # Write-time clustering: sort each partition file by (repo, path)
    # before commit.  Rows otherwise land in key-HASH order (random w.r.t.
    # the real keys), so Parquet row-group statistics on repo/path are
    # useless to a filtered reader; clustered files let
    # ``read_lake(filter=pads.field("repo") == ...)`` skip row groups at
    # the scan, and similar keys compress better.  Costs one string sort
    # per partition at commit (pay-at-write for read pruning) — default
    # OFF to keep the ingest-bound headline unburdened; turn on for lakes
    # that serve selective key-range queries.
    cluster_by_key: bool = False

    # Persist delete tombstones: the lake keeps op='D' rows (null content,
    # null content_sha256) at the delete's LSN, and every row carries an
    # ``op`` column.  Required whenever the feed is NOT append-only in
    # LSN (multi-source fan-in): without the tombstone, a late event with
    # a lower LSN than an applied delete would resurrect the key on the
    # next resume fold.  ``read_lake``/``lake_table`` filter tombstones
    # out by default (``include_tombstones=True`` to see them);
    # ``gc_tombstones`` drops tombstones once every source's watermark
    # has passed them.  The flag is sticky per lake — a resume must use
    # the same setting the lake was committed with (guarded in replay).
    keep_tombstones: bool = False

    # Merge-on-read delta commits: an incremental run (resume=True)
    # commits ONLY the increment's folded winner rows — op retained,
    # delete winners persisted as op='D' tombstone rows — as a delta
    # file CHAINED onto the partition's committed files, instead of
    # reading and rewriting the whole partition (copy-on-write).  Write
    # amplification per resume drops from O(partition state) to
    # O(increment), and the prior state is never read at commit time at
    # all; readers fold base+deltas per partition by (key, max LSN) with
    # the writer's own LWW kernel, so the folded view is row-identical
    # to the copy-on-write lake (pinned in tests/test_mor.py).  The
    # trade is read-side: a chained partition loses predicate pushdown
    # for non-key filters (filters apply post-fold) and each read pays
    # the fold until the chain is compacted.  ``max_delta_files`` bounds
    # the chain: a resume that would push a partition's chain past it
    # compacts INLINE instead (that partition's committer reads its own
    # chain locally and writes a fresh base — still no cross-partition
    # traffic); ``pipelines.replay.compact_lake`` / CLI ``compact``
    # force compaction at any time.  Not sticky: MOR and COW resumes may
    # alternate freely on tombstone lakes; a PLAIN lake with live chains
    # refuses a COW resume (its base files carry no op column, so the
    # bulk prior-state feed cannot see the chained tombstones) until
    # compacted.
    merge_on_read: bool = False
    max_delta_files: int = 8

    # Parquet row-group size (rows) for committed data files; None =
    # pyarrow's default (1Mi rows).  Row groups are the pruning quantum:
    # filtered reads, point lookups and the partition-wise join's
    # key-range slicing (``pipelines/lakejoin.py``) can skip no finer
    # than one group, so lakes serving selective reads want smaller
    # groups (e.g. 64k-256k rows) — especially with ``cluster_by_key``,
    # where sorted keys make group statistics genuinely selective.  The
    # trade is more page/dictionary headers and slightly worse
    # compression per group.
    row_group_rows: int | None = None


def bench_cpus() -> int:
    """Parallelism level for bench runs (driver contract: RAY_GRAFT_CPUS)."""
    return int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def bench_sf_dir() -> str:
    """Input dir for bench runs (driver contract: GRAFT_SF_DIR)."""
    return os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
