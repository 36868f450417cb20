"""Flagship demo pipeline: documents table → change log → CDC replay.

Derives a deterministic change-event log from the driver's ``documents``
table with a derivation simple enough to mirror in ANSI SQL (so the DuckDB
oracle can verify the ENTIRE engine end-to-end — reader, normalize,
shuffle, LWW fold, exactly-once sink):

  per doc (repo=source, path='doc_<id>.txt'):
    I @ lsn=3*doc_id+1  content = text              commit = 'c1-<id>'
    U @ lsn=3*doc_id+2  content = text || ' [rev2]' commit = 'c2-<id>'
    D @ lsn=3*doc_id+3  only when doc_id % 10 == 0

  ⇒ final state: every doc with doc_id % 10 != 0, at its [rev2] content.

The richer generator (skew, shuffled order, orphans, evolution) lives in
``sources.datagen`` and is exercised by the pytest golden tests; this one
trades richness for SQL-expressibility.
"""

from __future__ import annotations

import hashlib
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from ..config import ReplayConfig
from .bootstrap import bootstrap_snapshot
from .fanin import replay_fanin
from .replay import read_lake, replay


def _derive_events(batch: pa.Table) -> pa.Table:
    """documents rows → 2-3 change events per doc (vectorized, zero-copy in)."""
    doc_id = batch.column("doc_id")
    ids = pc.cast(doc_id, pa.string())
    path = pc.binary_join_element_wise(
        pa.array(["doc_"] * len(batch)), ids, pa.array([".txt"] * len(batch)), ""
    )
    base = pc.multiply(doc_id, pa.scalar(3, pa.int64()))

    def ev(lsn_off, op, commit_prefix, content):
        n = len(batch)
        return pa.table(
            {
                "lsn": pc.add(base, pa.scalar(lsn_off, pa.int64())),
                "op": pa.array([op] * n, pa.string()),
                "repo": batch.column("source"),
                "path": path,
                "commit": pc.binary_join_element_wise(
                    pa.array([commit_prefix] * n), ids, ""
                ),
                "lang": batch.column("lang"),
                "content": content,
            }
        )

    inserts = ev(1, "I", "c1-", batch.column("text"))
    rev2 = pc.binary_join_element_wise(
        batch.column("text"), pa.array([" [rev2]"] * len(batch)), ""
    )
    updates = ev(2, "U", "c2-", rev2)
    # pyarrow 16 has no modulo kernel; numpy on the zero-copy int column
    ids_np = doc_id.to_numpy() if isinstance(doc_id, pa.Array) else doc_id.combine_chunks().to_numpy()
    del_mask = pa.array(ids_np % 10 == 0)
    deletes = ev(3, "D", "c2-", pa.nulls(len(batch), pa.string())).filter(del_mask)
    return pa.concat_tables([inserts, updates, deletes])


def build_change_log(sf_dir: str, log_dir: str) -> None:
    """Materialize the derived change log as Parquet (the replay input)."""
    shutil.rmtree(log_dir, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source"],
    )
    ds.map_batches(_derive_events, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
        log_dir
    )


def run_flagship(
    sf_dir: str, work_dir: str | None = None, num_partitions: int = 16
) -> ray.data.Dataset:
    """Full engine over the derived log; returns the final lake Dataset."""
    # pid in the default work dir: the rmtree+rebuild below is not safe
    # against ANOTHER process running the flagship over the same sf_dir
    # (observed: a concurrent pytest session yanked the log mid-feed).
    tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
    work = work_dir or f"/tmp/cdc_flagship/{tag}-{os.getpid()}"
    log_dir = os.path.join(work, "log")
    lake_dir = os.path.join(work, "lake")
    shutil.rmtree(lake_dir, ignore_errors=True)
    build_change_log(sf_dir, log_dir)
    replay(log_dir, lake_dir, ReplayConfig(num_partitions=num_partitions))
    return read_lake(lake_dir)


def _derive_patch_events(batch: pa.Table) -> pa.Table:
    """documents rows → I / P / (D) events exercising partial updates:

      I @ lsn=3*doc_id+1  full row, commit='c1-<id>', content=text
      P @ lsn=3*doc_id+2  commit='p2-<id>' ONLY (lang/content null=unchanged)
      D @ lsn=3*doc_id+3  when doc_id % 10 == 0

    ⇒ final state: every doc_id % 10 != 0 at its ORIGINAL text and lang
    with the PATCHED commit id — SQL-trivial, so the DuckDB oracle checks
    the whole compose path end-to-end."""
    doc_id = batch.column("doc_id")
    n = len(batch)
    ids = pc.cast(doc_id, pa.string())
    path = pc.binary_join_element_wise(
        pa.array(["doc_"] * n), ids, pa.array([".txt"] * n), ""
    )
    base = pc.multiply(doc_id, pa.scalar(3, pa.int64()))

    def ev(lsn_off, op, commit_prefix, lang, content):
        return pa.table(
            {
                "lsn": pc.add(base, pa.scalar(lsn_off, pa.int64())),
                "op": pa.array([op] * n, pa.string()),
                "repo": batch.column("source"),
                "path": path,
                "commit": pc.binary_join_element_wise(
                    pa.array([commit_prefix] * n), ids, ""
                ),
                "lang": lang,
                "content": content,
            }
        )

    inserts = ev(1, "I", "c1-", batch.column("lang"), batch.column("text"))
    patches = ev(
        2, "P", "p2-", pa.nulls(n, pa.string()), pa.nulls(n, pa.string())
    )
    ids_np = doc_id.to_numpy() if isinstance(doc_id, pa.Array) else doc_id.combine_chunks().to_numpy()
    deletes = ev(
        3, "D", "c2-", batch.column("lang"), pa.nulls(n, pa.string())
    ).filter(pa.array(ids_np % 10 == 0))
    return pa.concat_tables([inserts, patches, deletes])


def run_patch_flagship(
    sf_dir: str, work_dir: str | None = None, num_partitions: int = 8
) -> ray.data.Dataset:
    """Partial-update end-to-end: full-image inserts, op='P' patches that
    change ONLY the commit id (null = unchanged), deletes — the merge
    composes base+patch per key (``merge._compose_patches_exact``)."""
    tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
    work = work_dir or f"/tmp/cdc_patch/{tag}-{os.getpid()}"
    log_dir = os.path.join(work, "log")
    lake_dir = os.path.join(work, "lake")
    shutil.rmtree(log_dir, ignore_errors=True)
    shutil.rmtree(lake_dir, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source"],
    )
    ds.map_batches(
        _derive_patch_events, batch_format="pyarrow", zero_copy_batch=True
    ).write_parquet(log_dir)
    replay(log_dir, lake_dir, ReplayConfig(num_partitions=num_partitions))
    return read_lake(lake_dir)


def run_mor_flagship(
    sf_dir: str,
    work_dir: str | None = None,
    num_partitions: int = 8,
    split_frac: float = 0.6,
) -> ray.data.Dataset:
    """Merge-on-read end-to-end: full replay of the log's low-LSN prefix,
    then an incremental MOR resume of the suffix — delta files chained, no
    compaction — and the READ-SIDE fold serves the final state.  Final
    state is identical to ``run_flagship``'s by construction, so the same
    DuckDB oracle verifies the whole delta-commit + fold path
    (``SinkConfig.merge_on_read``; see tests/test_mor.py for the
    equivalence and write-amplification pins)."""
    from ..config import SinkConfig

    tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
    work = work_dir or f"/tmp/cdc_mor/{tag}-{os.getpid()}"
    log_dir = os.path.join(work, "log")
    lo_dir = os.path.join(work, "log_lo")
    lake_dir = os.path.join(work, "lake")
    shutil.rmtree(lake_dir, ignore_errors=True)
    build_change_log(sf_dir, log_dir)
    # split threshold from footer-cheap metadata (one narrow column read)
    max_id = pc.max(
        pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
        ).column("doc_id")
    ).as_py()
    thresh = 3 * int(max_id * split_frac)
    shutil.rmtree(lo_dir, ignore_errors=True)
    ds = ray.data.read_parquet(log_dir)
    ds.map_batches(
        lambda t: t.filter(
            pc.less_equal(t.column("lsn"), pa.scalar(thresh, pa.int64()))
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).write_parquet(lo_dir)
    replay(lo_dir, lake_dir, ReplayConfig(num_partitions=num_partitions))
    replay(
        log_dir, lake_dir, ReplayConfig(num_partitions=num_partitions),
        sink=SinkConfig(out_dir=lake_dir, merge_on_read=True),
        resume=True,
    )
    return read_lake(lake_dir)


def _build_split_log(sf_dir: str, log_dir: str, ops: list[str]) -> None:
    """One SOURCE's slice of the derived log: only the events whose op is
    in ``ops`` (each slice stays monotone in its own LSN space)."""
    shutil.rmtree(log_dir, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source"],
    )

    def derive_slice(batch: pa.Table) -> pa.Table:
        ev = _derive_events(batch)
        return ev.filter(pc.is_in(ev.column("op"), pa.array(ops)))

    ds.map_batches(
        derive_slice, batch_format="pyarrow", zero_copy_batch=True
    ).write_parquet(log_dir)


def run_bootstrap_flagship(
    sf_dir: str, work_dir: str | None = None, num_partitions: int = 8
) -> ray.data.Dataset:
    """Initial-snapshot bootstrap then incremental CDC on top.

    Snapshot = every document at its rev1 content, taken at watermark
    ``M = max(doc_id)`` with per-row source positions ``lsn = doc_id``
    (all ≤ M, unique).  The change log then delivers, per doc, an update
    to rev2 at ``M + 1 + 2*doc_id`` and (for doc_id % 10 == 0) a delete
    at ``M + 2 + 2*doc_id`` — all strictly above the watermark, so
    ``replay(resume=True)`` folds them against the bulk-loaded state.
    Final live rows: rev2 content at ``lsn = M + 1 + 2*doc_id`` for every
    doc with doc_id % 10 != 0.
    """
    tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
    work = work_dir or f"/tmp/cdc_bootstrap/{tag}-{os.getpid()}"
    lake_dir = os.path.join(work, "lake")
    log_dir = os.path.join(work, "log")
    shutil.rmtree(lake_dir, ignore_errors=True)
    shutil.rmtree(log_dir, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)
    docs = os.path.join(sf_dir, "documents.parquet")
    # snapshot watermark from one column of footer-light metadata read
    m = int(pc.max(pq.read_table(docs, columns=["doc_id"]).column("doc_id")).as_py())

    def snap_rows(batch: pa.Table) -> pa.Table:
        doc_id = batch.column("doc_id")
        ids = pc.cast(doc_id, pa.string())
        n = len(batch)
        return pa.table(
            {
                "repo": batch.column("source"),
                "path": pc.binary_join_element_wise(
                    pa.array(["doc_"] * n), ids, pa.array([".txt"] * n), ""
                ),
                "commit": pc.binary_join_element_wise(pa.array(["c1-"] * n), ids, ""),
                "lang": batch.column("lang"),
                "content": batch.column("text"),
                "lsn": doc_id.cast(pa.int64()),
            }
        )

    snapshot = ray.data.read_parquet(
        docs, columns=["doc_id", "text", "lang", "source"]
    ).map_batches(snap_rows, batch_format="pyarrow", zero_copy_batch=True)
    bootstrap_snapshot(snapshot, lake_dir, snapshot_lsn=m, num_partitions=num_partitions)

    def cdc_events(batch: pa.Table) -> pa.Table:
        ev = _derive_events(batch)  # I/U/D at 3d+1 / 3d+2 / 3d+3
        # re-position above the snapshot watermark: U → M+1+2d, D → M+2+2d;
        # drop the I events (the snapshot already holds rev1)
        keep = pc.invert(pc.equal(ev.column("op"), pa.scalar("I")))
        ev = ev.filter(keep)
        old = ev.column("lsn")  # 3d+2 (U) or 3d+3 (D) → d = (lsn-2)//3 etc.
        is_u = pc.equal(ev.column("op"), pa.scalar("U"))
        d = pc.divide(
            pc.subtract(old, pc.if_else(is_u, pa.scalar(2, pa.int64()), pa.scalar(3, pa.int64()))),
            pa.scalar(3, pa.int64()),
        )
        new_lsn = pc.add(
            pc.add(pa.scalar(m, pa.int64()), pc.multiply(d, pa.scalar(2, pa.int64()))),
            pc.if_else(is_u, pa.scalar(1, pa.int64()), pa.scalar(2, pa.int64())),
        )
        i = ev.schema.get_field_index("lsn")
        return ev.set_column(i, pa.field("lsn", pa.int64()), new_lsn)

    ray.data.read_parquet(
        docs, columns=["doc_id", "text", "lang", "source"]
    ).map_batches(cdc_events, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
        log_dir
    )
    replay(log_dir, lake_dir, ReplayConfig(num_partitions=num_partitions), resume=True)
    return read_lake(lake_dir)


def run_fanin_flagship(
    sf_dir: str, work_dir: str | None = None, num_partitions: int = 8
) -> ray.data.Dataset:
    """Multi-source fan-in over the same derived log, fed OUT OF ORDER.

    The derivation is split into two sources with independent LSN spaces:
    source ``alpha`` emits the I events, source ``beta`` the U and D
    events.  Beta delivers FIRST (round 1 commits updates and delete
    tombstones); alpha's inserts arrive in round 2 — every one of them
    BELOW beta's committed watermark, the exact case a scalar-watermark
    resume cannot handle.  The fan-in machinery (composite
    ``lsn' = lsn*2 + src``, pruning off, persisted tombstones, vector
    clock — ``pipelines/fanin.py``) must converge to the same live state
    regardless: U wins every key at composite ``6*doc_id+5``; deleted
    docs (doc_id % 10 == 0) stay deleted because the late insert folds
    against the persisted tombstone at ``6*doc_id+7``.
    """
    tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
    work = work_dir or f"/tmp/cdc_fanin/{tag}-{os.getpid()}"
    alpha, beta = os.path.join(work, "src_alpha"), os.path.join(work, "src_beta")
    lake_dir = os.path.join(work, "lake")
    staging = os.path.join(work, "staging")
    for d in (lake_dir, staging):
        shutil.rmtree(d, ignore_errors=True)
    cfg = ReplayConfig(num_partitions=num_partitions)
    # round 1: beta only (alpha exists but has no buckets yet)
    shutil.rmtree(alpha, ignore_errors=True)
    os.makedirs(alpha, exist_ok=True)
    _build_split_log(sf_dir, beta, ["U", "D"])
    replay_fanin(
        [alpha, beta], lake_dir, cfg, staging_dir=staging,
        source_names=["alpha", "beta"],
    )
    # round 2: alpha's inserts arrive late, below beta's watermark
    _build_split_log(sf_dir, alpha, ["I"])
    replay_fanin(
        [alpha, beta], lake_dir, cfg, staging_dir=staging,
        source_names=["alpha", "beta"],
    )
    return read_lake(lake_dir)


def _derive_txn_events(batch: pa.Table) -> pa.Table:
    """documents rows → one multi-statement TRANSACTION per doc, spanning
    two logical tables (the multiplexed-WAL shape ``pipelines/txn.py``
    consumes; reference analogue: the multi-table ETL loop
    ``src/etl_pipeline.py:66-72`` + FK-joined upserts
    ``sql/etl_transformations.sql:151-152``):

      txn=d:  I 'files' @ 4d+1  (doc_<d>.txt, text,        commit f1-<d>)
              I 'meta'  @ 4d+2  (meta_<d>.json, json blob,  commit m1-<d>)
              U 'files' @ 4d+3  (text || ' [rev2]',         commit f2-<d>)
              D 'meta'  @ 4d+4  when d % 10 == 0

    Unsealed publish ⇒ the highest txn (max doc_id) is held back whole —
    the one-transaction WAL lag ``txn_watermark`` documents."""
    doc_id = batch.column("doc_id")
    n = len(batch)
    ids = pc.cast(doc_id, pa.string())
    base = pc.multiply(doc_id, pa.scalar(4, pa.int64()))

    def ev(off, op, tblname, path, commit_prefix, content):
        return pa.table(
            {
                "lsn": pc.add(base, pa.scalar(off, pa.int64())),
                "op": pa.array([op] * n, pa.string()),
                "repo": batch.column("source"),
                "path": path,
                "commit": pc.binary_join_element_wise(
                    pa.array([commit_prefix] * n), ids, ""
                ),
                "lang": batch.column("lang"),
                "content": content,
                "tbl": pa.array([tblname] * n, pa.string()),
                "txn": doc_id,
            }
        )

    fpath = pc.binary_join_element_wise(
        pa.array(["doc_"] * n), ids, pa.array([".txt"] * n), ""
    )
    mpath = pc.binary_join_element_wise(
        pa.array(["meta_"] * n), ids, pa.array([".json"] * n), ""
    )
    mjson = pc.binary_join_element_wise(
        pa.array(['{"doc": '] * n), ids, pa.array(["}"] * n), ""
    )
    rev2 = pc.binary_join_element_wise(
        batch.column("text"), pa.array([" [rev2]"] * n), ""
    )
    parts = [
        ev(1, "I", "files", fpath, "f1-", batch.column("text")),
        ev(2, "I", "meta", mpath, "m1-", mjson),
        ev(3, "U", "files", fpath, "f2-", rev2),
    ]
    ids_np = (
        doc_id.to_numpy()
        if isinstance(doc_id, pa.Array)
        else doc_id.combine_chunks().to_numpy()
    )
    del_mask = pa.array(ids_np % 10 == 0)
    parts.append(
        ev(4, "D", "meta", mpath, "m2-", pa.nulls(n, pa.string())).filter(del_mask)
    )
    return pa.concat_tables(parts)


def run_txn_flagship(
    sf_dir: str, work_dir: str | None = None, num_partitions: int = 8
) -> ray.data.Dataset:
    """Transaction-consistent multi-table replay end to end: multiplexed
    WAL → txn watermark (UNSEALED: the final transaction is held back) →
    per-table demux → two independent lake replays → atomic cross-table
    snapshot → exact-epoch transactional read.  Returns both tables
    unioned under a ``tbl`` discriminator so one DuckDB oracle verifies
    the whole path, torn-tail rule included."""
    from .txn import read_txn_tables, replay_txn

    tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
    work = work_dir or f"/tmp/cdc_txn/{tag}-{os.getpid()}"
    log_dir = os.path.join(work, "log")
    root = os.path.join(work, "out")
    shutil.rmtree(log_dir, ignore_errors=True)
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)
    ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source"],
    ).map_batches(
        _derive_txn_events, batch_format="pyarrow", zero_copy_batch=True
    ).write_parquet(log_dir)
    replay_txn(log_dir, root, ReplayConfig(num_partitions=num_partitions))
    tables = read_txn_tables(root)

    def tag_tbl(name):
        def fn(t: pa.Table) -> pa.Table:
            return t.add_column(0, "tbl", pa.array([name] * len(t), pa.string()))

        return fn

    return tables["files"].map_batches(
        tag_tbl("files"), batch_format="pyarrow"
    ).union(
        tables["meta"].map_batches(tag_tbl("meta"), batch_format="pyarrow")
    )


def _derive_metric_events(batch: pa.Table) -> pa.Table:
    """events rows → an additive metrics change log (aggregate ingest):
    key = (event_type, user), delta = exact cents, a sprinkling of resets.

      lsn = event_id
      op  = 'D' (reset) when event_id % 97 == 0, else 'I'
      cents = CAST(FLOOR(value * 100) AS BIGINT)   -- exact in IEEE f64

    SQL-trivial, so the DuckDB oracle replays the whole reset-aware fold
    (sum/min/max/count above each key's last reset)."""
    import numpy as np

    eid = batch.column("event_id")
    n = len(batch)
    eid_np = (
        eid.to_numpy() if isinstance(eid, pa.Array)
        else eid.combine_chunks().to_numpy()
    )
    is_d = eid_np % 97 == 0
    val = batch.column("value").to_numpy() if isinstance(
        batch.column("value"), pa.Array
    ) else batch.column("value").combine_chunks().to_numpy()
    cents = np.floor(val * 100.0).astype(np.int64)
    return pa.table(
        {
            "lsn": eid,
            "op": pa.array(np.where(is_d, "D", "I").astype(object)),
            "repo": batch.column("event_type"),
            "path": pc.binary_join_element_wise(
                pa.array(["u"] * n),
                pc.cast(batch.column("user_id"), pa.string()),
                "",
            ),
            "cents": pa.array(np.where(is_d, None, cents), pa.int64()),
        }
    )


def run_aggregate_flagship(
    sf_dir: str, work_dir: str | None = None, num_partitions: int = 8
) -> ray.data.Dataset:
    """Aggregate-state ingest end to end: derive an additive metrics log
    from the events table, replay it into a keyed rollup lake
    (``pipelines/aggregate.py``), return the lake."""
    from .aggregate import replay_aggregate

    tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
    work = work_dir or f"/tmp/cdc_agg/{tag}-{os.getpid()}"
    log_dir = os.path.join(work, "log")
    lake_dir = os.path.join(work, "lake")
    shutil.rmtree(log_dir, ignore_errors=True)
    shutil.rmtree(lake_dir, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)
    ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "event_type", "user_id", "value"],
    ).map_batches(
        _derive_metric_events, batch_format="pyarrow", zero_copy_batch=True
    ).write_parquet(log_dir)
    replay_aggregate(log_dir, lake_dir, ["cents"], num_partitions=num_partitions)
    return read_lake(lake_dir)


def _derive_distinct_events(batch: pa.Table) -> pa.Table:
    """events rows → an additive metrics log keyed per EVENT TYPE with a
    distinct-count column: lsn=event_id, op='I' (no resets — keeps the
    SQL oracle to the plain per-group HLL replay), cents deltas, and
    ``uid`` (the user id whose per-key distinct count the lake maintains
    as HLL register state)."""
    import numpy as np

    n = len(batch)
    val = batch.column("value")
    val_np = (
        val.to_numpy() if isinstance(val, pa.Array)
        else val.combine_chunks().to_numpy()
    )
    return pa.table(
        {
            "lsn": batch.column("event_id"),
            "op": pa.array(["I"] * n, pa.string()),
            "repo": pa.array(["evt"] * n, pa.string()),
            "path": batch.column("event_type"),
            "cents": pa.array(np.floor(val_np * 100.0).astype(np.int64)),
            "uid": batch.column("user_id"),
        }
    )


def run_aggregate_distinct_flagship(
    sf_dir: str, work_dir: str | None = None, num_partitions: int = 4
) -> pa.Table:
    """Aggregate ingest with DISTINCT-COUNT state: the lake maintains,
    per event type, exact cents sum/min/max/count PLUS the HyperLogLog
    registers of distinct users — approximate COUNT(DISTINCT) as
    first-class, mergeable ingest state (``distinct_cols``).  The
    returned table projects the registers to the estimate with the same
    exact-integer harmonic sum the SQL oracle replays."""
    from ..stages.sketch import hll_estimate
    from .aggregate import read_aggregate_lake, replay_aggregate

    tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
    work = work_dir or f"/tmp/cdc_aggd/{tag}-{os.getpid()}"
    log_dir = os.path.join(work, "log")
    lake_dir = os.path.join(work, "lake")
    shutil.rmtree(log_dir, ignore_errors=True)
    shutil.rmtree(lake_dir, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)
    ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "event_type", "user_id", "value"],
    ).map_batches(
        _derive_distinct_events, batch_format="pyarrow", zero_copy_batch=True
    ).write_parquet(log_dir)
    replay_aggregate(
        log_dir, lake_dir, ["cents"],
        num_partitions=num_partitions,
        distinct_cols=["uid"], hll_p=12,
    )
    import numpy as np

    # result is one row per event TYPE (a handful) — driver-side projection
    tbl = read_aggregate_lake(lake_dir).to_arrow_refs()
    import ray as _ray

    parts = [t for t in _ray.get(tbl) if len(t)]
    if not parts:
        from .aggregate import aggregate_schema

        base = aggregate_schema(["cents"], ["uid"], 12)
        names = [f.name for f in base if f.name != "uid_hll"]
        return pa.schema(
            [base.field(nm) for nm in names]
            + [pa.field("uid_distinct", pa.float64())]
        ).empty_table()
    full = pa.concat_tables(parts)
    regs = full.column("uid_hll")
    ests = []
    for i in range(len(full)):
        r = np.frombuffer(regs[i].as_py(), dtype=np.uint8)
        est = hll_estimate(r)
        # round half AWAY from zero (DuckDB ROUND), not Python banker's
        ests.append(np.floor(est * 10 + 0.5) / 10)
    out = full.drop_columns(["uid_hll"]).append_column(
        "uid_distinct", pa.array(np.array(ests, np.float64))
    )
    return out


def run_cdc_to_corpus(sf_dir: str, min_tokens: int = 5) -> pa.Table:
    """The product story end to end: CDC replay → live lake → curated
    training corpus, in one composed pipeline.

    1. Derive the change log and replay it (``run_flagship``) — the lake
       holds each doc's LATEST content ([rev2]) with tenth docs deleted.
    2. Curate the LIVE lake (not the raw table — deleted docs must not
       train, stale revisions must not train): token stats over
       ``content`` (``stages/text.py:TokenStats``), exact dedup on
       content with min-doc wins (``stages/dedup.py:exact_dedup``), a
       minimum-length gate.
    3. Roll up per language: docs kept, exact token/char totals.

    Every stage is SQL-mirrorable, so the DuckDB oracle replays the WHOLE
    composition — replay semantics, token arithmetic, dedup survivorship
    and the grouped totals — as one query."""
    import numpy as np

    from ..stages.dedup import exact_dedup
    from ..stages.text import TokenStats

    lake = run_flagship(sf_dir)

    def with_doc_id(df):
        df = df.copy()
        df["doc_id"] = (
            df["path"].str.extract(r"(\d+)", expand=False).astype(np.int64)
        )
        return df[["doc_id", "lang", "content"]]

    docs = lake.map_batches(with_doc_id, batch_format="pandas")
    deduped = exact_dedup(docs, text_col="content")
    token_stats = TokenStats("content")

    def partial_rollup(df):
        # token stats + gate + per-batch partial aggregation in one stage:
        # the shuffle then carries O(blocks × languages) rows and the final
        # reduce is driver-trivial at any corpus size (language cardinality
        # is tiny).  TokenStats keys by doc_id, so lang re-attaches
        # positionally (same batch, same row order).
        ts = token_stats(df)
        ts["lang"] = df["lang"].to_numpy()
        ts = ts[ts["token_count"] >= min_tokens]
        return ts.groupby("lang", as_index=False).agg(
            docs_kept=("doc_id", "size"),
            tokens_total=("token_count", "sum"),
            chars_total=("n_chars", "sum"),
        )

    partials = deduped.map_batches(
        partial_rollup, batch_format="pandas"
    ).to_pandas()
    agg = (
        partials.groupby("lang", as_index=False)
        .sum()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    for c in ("docs_kept", "tokens_total", "chars_total"):
        agg[c] = agg[c].astype(np.int64)
    return pa.Table.from_pandas(agg, preserve_index=False)


def run_derived_flagship(
    sf_dir: str, work_dir: str | None = None, num_partitions: int = 8,
    split_frac: float = 0.6,
) -> ray.data.Dataset:
    """Incrementally maintained derived table end to end: replay the log's
    low-LSN prefix → build the derived lake (UPPER(content) + length) →
    resume-replay the suffix → REFRESH the derived lake (only changed
    partitions / keys recompute) → return it.  Final state equals a full
    recompute by the convergence contract, so one SQL oracle (the
    transform over the live [rev2] docs) verifies the whole incremental
    path."""
    from ..config import SinkConfig
    from .derive import refresh_derived_lake

    tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
    work = work_dir or f"/tmp/cdc_derived/{tag}-{os.getpid()}"
    log_dir = os.path.join(work, "log")
    lo_dir = os.path.join(work, "log_lo")
    src_dir = os.path.join(work, "src")
    dst_dir = os.path.join(work, "dst")
    shutil.rmtree(src_dir, ignore_errors=True)
    shutil.rmtree(dst_dir, ignore_errors=True)
    build_change_log(sf_dir, log_dir)
    max_id = pc.max(
        pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
        ).column("doc_id")
    ).as_py()
    thresh = 3 * int(max_id * split_frac)
    shutil.rmtree(lo_dir, ignore_errors=True)
    os.makedirs(lo_dir, exist_ok=True)
    ds = ray.data.read_parquet(log_dir)
    ds.filter(expr=f"lsn <= {thresh}").write_parquet(lo_dir)

    def fn(df):
        df = df.copy()
        df["shout"] = df["content"].str.upper()
        df["n"] = df["content"].str.len().astype("int64")
        return df[["repo", "path", "lang", "shout", "n"]]

    cfg = ReplayConfig(num_partitions=num_partitions)
    sink = SinkConfig(out_dir=src_dir, keep_epochs=2)
    replay(lo_dir, src_dir, cfg, sink=sink)
    refresh_derived_lake(src_dir, dst_dir, fn, fn_version="shout-v1")
    replay(log_dir, src_dir, cfg, sink=sink, resume=True)
    refresh_derived_lake(src_dir, dst_dir, fn, fn_version="shout-v1")
    return read_lake(dst_dir)


_LATE_US = 2 * 24 * 3600 * 1_000_000  # allowed lateness: 2 days, in µs


def _derive_windowed_events(batch: pa.Table) -> pa.Table:
    """events rows → an hourly-windowed metrics log: the WINDOW ID lives
    in the key (path = event_type|h<hour bucket>), which is how streaming
    engines shard windowed state; ``ts`` (epoch µs) rides along for the
    event-time watermark."""
    import numpy as np

    n = len(batch)
    val = batch.column("value")
    val_np = (
        val.to_numpy() if isinstance(val, pa.Array)
        else val.combine_chunks().to_numpy()
    )
    ts_us = batch.column("ts").cast(pa.int64())
    ts_np = (
        ts_us.to_numpy() if isinstance(ts_us, pa.Array)
        else ts_us.combine_chunks().to_numpy()
    )
    hour = ts_np // 3_600_000_000
    return pa.table(
        {
            "lsn": batch.column("event_id"),
            "op": pa.array(["I"] * n, pa.string()),
            "repo": pa.array(["evt"] * n, pa.string()),
            "path": pc.binary_join_element_wise(
                batch.column("event_type"),
                pa.array(["|h"] * n),
                pa.array(hour.astype(str).astype(object)),
                "",
            ),
            "cents": pa.array(np.floor(val_np * 100.0).astype(np.int64)),
            "ts": pa.array(ts_np),
        }
    )


def run_windowed_flagship(
    sf_dir: str, work_dir: str | None = None, num_partitions: int = 4,
    split_frac: float = 0.6,
) -> ray.data.Dataset:
    """Event-time windowed rollup with ALLOWED LATENESS end to end: replay
    the log's LSN prefix (the watermark advances to the prefix's max event
    time), then resume with the suffix — suffix events whose timestamp
    fell more than the lateness behind the watermark belong to FINALIZED
    windows and are dropped; everything else applies.  One SQL oracle
    replays the split, the watermark, the lateness cut and the windowed
    sums."""
    from .aggregate import read_aggregate_lake, replay_aggregate

    tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
    work = work_dir or f"/tmp/cdc_windowed/{tag}-{os.getpid()}"
    log_dir = os.path.join(work, "log")
    lo_dir = os.path.join(work, "log_lo")
    lake_dir = os.path.join(work, "lake")
    for d in (log_dir, lo_dir, lake_dir):
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)
    os.makedirs(lo_dir, exist_ok=True)
    ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "event_type", "value"],
    ).map_batches(
        _derive_windowed_events, batch_format="pyarrow", zero_copy_batch=True
    ).write_parquet(log_dir)
    max_id = pc.max(
        pq.read_table(
            os.path.join(sf_dir, "events.parquet"), columns=["event_id"]
        ).column("event_id")
    ).as_py()
    split = int(max_id * split_frac)
    ray.data.read_parquet(log_dir).filter(expr=f"lsn <= {split}").write_parquet(
        lo_dir
    )
    et = ("ts", _LATE_US)
    replay_aggregate(lo_dir, lake_dir, ["cents"],
                     num_partitions=num_partitions, event_time=et)
    replay_aggregate(log_dir, lake_dir, ["cents"], resume=True, event_time=et)
    return read_aggregate_lake(lake_dir)


def run_aggregate_mor_flagship(
    sf_dir: str, work_dir: str | None = None, num_partitions: int = 8,
    split_frac: float = 0.6,
) -> ray.data.Dataset:
    """Aggregate ingest, merge-on-read end to end: full replay of the
    metrics log's LSN prefix, then a MOR resume of the suffix (delta =
    the increment's partial aggregates + ⊕-identity tombstones, prior
    state never re-read), served by the read-side chain fold — same
    final state as the one-shot ``run_aggregate_flagship``, so the same
    DuckDB oracle verifies the whole delta + fold path."""
    from ..config import SinkConfig
    from .aggregate import read_aggregate_lake, replay_aggregate

    tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
    work = work_dir or f"/tmp/cdc_aggmor/{tag}-{os.getpid()}"
    log_dir = os.path.join(work, "log")
    lo_dir = os.path.join(work, "log_lo")
    lake_dir = os.path.join(work, "lake")
    for d in (log_dir, lo_dir, lake_dir):
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)
    os.makedirs(lo_dir, exist_ok=True)
    ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "event_type", "user_id", "value"],
    ).map_batches(
        _derive_metric_events, batch_format="pyarrow", zero_copy_batch=True
    ).write_parquet(log_dir)
    max_id = pc.max(
        pq.read_table(
            os.path.join(sf_dir, "events.parquet"), columns=["event_id"]
        ).column("event_id")
    ).as_py()
    split = int(max_id * split_frac)
    ray.data.read_parquet(log_dir).filter(expr=f"lsn <= {split}").write_parquet(
        lo_dir
    )
    sink = SinkConfig(out_dir=lake_dir, merge_on_read=True, keep_epochs=2)
    replay_aggregate(lo_dir, lake_dir, ["cents"],
                     num_partitions=num_partitions, sink=sink)
    replay_aggregate(log_dir, lake_dir, ["cents"], resume=True, sink=sink)
    return read_aggregate_lake(lake_dir)


def run_aggregate_quantiles_flagship(
    sf_dir: str, work_dir: str | None = None, num_partitions: int = 4,
    k: int = 1024,
) -> pa.Table:
    """Aggregate ingest with per-key QUANTILE state: the lake maintains,
    per event type, the bottom-k (KMV) sample of (splitmix64(event_id),
    cents) pairs — approximate quantiles as first-class, mergeable ingest
    state (``quantile_cols``).  The read projects the samples to
    p50/p90/p99 by the shared integer rank rule, so the SQL oracle
    replays the hash, the sample AND the extraction exactly."""
    from ..stages.sketch import bottomk_quantiles
    from .aggregate import read_aggregate_lake, replay_aggregate

    tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
    work = work_dir or f"/tmp/cdc_aggq/{tag}-{os.getpid()}"
    log_dir = os.path.join(work, "log")
    lake_dir = os.path.join(work, "lake")
    shutil.rmtree(log_dir, ignore_errors=True)
    shutil.rmtree(lake_dir, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)
    ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "event_type", "user_id", "value"],
    ).map_batches(
        _derive_distinct_events, batch_format="pyarrow", zero_copy_batch=True
    ).write_parquet(log_dir)
    replay_aggregate(
        log_dir, lake_dir, ["cents"],
        num_partitions=num_partitions,
        quantile_cols=["cents"], bottomk_k=k,
    )
    import numpy as np
    import ray as _ray

    parts = [t for t in _ray.get(read_aggregate_lake(lake_dir).to_arrow_refs())
             if len(t)]
    qs = [(1, 2), (9, 10), (99, 100)]
    rows = {"repo": [], "path": [], "q": [], "cents_approx": []}
    for t in parts:
        hs = t.column("cents_bk_h")
        vs = t.column("cents_bk_v")
        for i in range(len(t)):
            # the sample arrives hash-sorted; quantiles rank by VALUE
            vals = np.array(vs[i].as_py(), np.int64)
            out = bottomk_quantiles(vals, qs)
            for (qn, qd), val in zip(qs, out):
                rows["repo"].append(t.column("repo")[i].as_py())
                rows["path"].append(t.column("path")[i].as_py())
                rows["q"].append(qn / qd)
                rows["cents_approx"].append(int(val))
    import pandas as pd

    df = pd.DataFrame(rows).sort_values(["path", "q"]).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def run_sidestore_flagship(
    sf_dir: str, work_dir: str | None = None, num_partitions: int = 16
) -> ray.data.Dataset:
    """cdc_replay over the content side-store log layout: derive the log,
    convert it in place (``logtools.convert_log_to_sidestore`` — meta
    files + lsn-sorted content siblings), replay with phase-2 late
    materialization.  Final state identical to ``run_flagship``'s by
    construction, so the same DuckDB oracle verifies the whole
    layout + selective-content-fetch path (tests/test_sidestore.py,
    tests/test_logtools.py pin the equivalence)."""
    from .logtools import convert_log_to_sidestore

    tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
    work = work_dir or f"/tmp/cdc_sidestore/{tag}-{os.getpid()}"
    log_dir = os.path.join(work, "log")
    lake_dir = os.path.join(work, "lake")
    shutil.rmtree(lake_dir, ignore_errors=True)
    build_change_log(sf_dir, log_dir)
    convert_log_to_sidestore(log_dir)
    replay(log_dir, lake_dir, ReplayConfig(num_partitions=num_partitions))
    return read_lake(lake_dir)


def run_compacted_flagship(
    sf_dir: str, work_dir: str | None = None, num_partitions: int = 16
) -> ray.data.Dataset:
    """cdc_replay through log COMPACTION: derive the log, compact it to
    one winning event per key (``logtools.compact_change_log`` — the
    Kafka-compacted-topic bootstrap-cost bound), replay the compacted
    log.  The compacted replay's final lake equals the full-history
    replay's, so the cdc_replay oracle verifies the compactor's winner
    selection end to end."""
    from .logtools import compact_change_log

    tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
    work = work_dir or f"/tmp/cdc_compact/{tag}-{os.getpid()}"
    log_dir = os.path.join(work, "log")
    comp_dir = os.path.join(work, "compacted")
    lake_dir = os.path.join(work, "lake")
    shutil.rmtree(lake_dir, ignore_errors=True)
    shutil.rmtree(comp_dir, ignore_errors=True)
    build_change_log(sf_dir, log_dir)
    compact_change_log(log_dir, comp_dir, num_partitions=num_partitions)
    replay(comp_dir, lake_dir, ReplayConfig(num_partitions=num_partitions))
    return read_lake(lake_dir)


def run_lakejoin_flagship(
    sf_dir: str, work_dir: str | None = None, num_partitions: int = 16
) -> ray.data.Dataset:
    """Partition-wise lake join end to end: replay the flagship lake,
    maintain a derived shadow (n_chars = len(content)) in the SAME
    hash-partition layout, then join the two lakes shuffle-free
    (``pipelines/lakejoin.join_lakes``) — the storage-partitioned-join
    path, verified by one SQL oracle over the composed result."""
    from .derive import refresh_derived_lake
    from .lakejoin import join_lakes

    tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
    work = work_dir or f"/tmp/cdc_lakejoin/{tag}-{os.getpid()}"
    log_dir = os.path.join(work, "log")
    lake_dir = os.path.join(work, "lake")
    dst_dir = os.path.join(work, "derived")
    shutil.rmtree(lake_dir, ignore_errors=True)
    shutil.rmtree(dst_dir, ignore_errors=True)
    build_change_log(sf_dir, log_dir)
    from ..config import SinkConfig

    replay(log_dir, lake_dir, ReplayConfig(num_partitions=num_partitions),
           sink=SinkConfig(out_dir=lake_dir, keep_epochs=2))
    refresh_derived_lake(lake_dir, dst_dir, _derived_n_chars, keep_epochs=2)
    return join_lakes(lake_dir, dst_dir, how="inner", columns_b=["n_chars"])


def _derived_n_chars(df):
    """Module-level derive fn (pickles by reference into Ray tasks)."""
    out = df[["repo", "path"]].copy()
    out["n_chars"] = df["content"].str.len().astype("int64")
    return out


def run_lakejoin_left_flagship(
    sf_dir: str, work_dir: str | None = None, num_partitions: int = 16
) -> ray.data.Dataset:
    """Partition-wise LEFT join under key-range slicing: lake b holds
    only every third document's keys (all events of docs with
    doc_id % 3 == 0, selected by the lsn↔doc_id arithmetic), so most a
    rows null-fill — exercising the typed-Arrow-NA placeholder path —
    and ``slice_rows`` far below the partition size forces the sliced
    (memory-bounded) join plan.  One SQL oracle replays the whole
    composition."""
    import glob as _glob

    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    from .lakejoin import join_lakes

    tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
    work = work_dir or f"/tmp/cdc_lakejoin_left/{tag}-{os.getpid()}"
    log_dir = os.path.join(work, "log")
    log_b = os.path.join(work, "log_b")
    lake_a = os.path.join(work, "lake_a")
    lake_b = os.path.join(work, "lake_b")
    for d in (log_b, lake_a, lake_b):
        shutil.rmtree(d, ignore_errors=True)
    build_change_log(sf_dir, log_dir)
    from ..config import SinkConfig

    replay(log_dir, lake_a, ReplayConfig(num_partitions=num_partitions),
           sink=SinkConfig(out_dir=lake_a, keep_epochs=2))
    os.makedirs(log_b, exist_ok=True)
    for i, f in enumerate(sorted(_glob.glob(
            os.path.join(log_dir, "**", "*.parquet"), recursive=True))):
        t = _pq.read_table(f)
        doc = _pc.divide(t.column("lsn"), 3)
        ft = t.filter(_pc.equal(_pc.subtract(
            doc, _pc.multiply(_pc.divide(doc, 3), 3)), 0))
        if len(ft):
            _pq.write_table(ft, os.path.join(log_b, f"b{i:03d}.parquet"))
    replay(log_b, lake_b, ReplayConfig(num_partitions=num_partitions),
           sink=SinkConfig(out_dir=lake_b, keep_epochs=2))
    return join_lakes(lake_a, lake_b, how="left",
                      columns_a=["lsn"], columns_b=["lsn"],
                      slice_rows=256)


def run_aggregate_skewed_flagship(
    sf_dir: str, work_dir: str | None = None, num_partitions: int = 8
) -> ray.data.Dataset:
    """Aggregate ingest under EXTREME key skew with the hot-key memory
    valve engaged: the metrics log keys every event by its event TYPE
    alone (a handful of keys; the hottest owns a large share), the feed
    is declared ``reset_free`` (router-enforced), and the compaction
    threshold sits far below the hot key's row count so the exchange
    valve pre-aggregates mid-stream.  The driver row therefore verifies
    the VALVE's arithmetic, not just the quiet path.  Summary receipts:
    ``skew_max_share``, ``valve_compactions`` (asserted > 0 when the
    feed is big enough to cross the threshold)."""
    from .aggregate import read_aggregate_lake, replay_aggregate

    tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
    work = work_dir or f"/tmp/cdc_agg_skew/{tag}-{os.getpid()}"
    log_dir = os.path.join(work, "log")
    lake_dir = os.path.join(work, "lake")
    shutil.rmtree(log_dir, ignore_errors=True)
    shutil.rmtree(lake_dir, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)
    ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "event_type", "value"],
    ).map_batches(
        _derive_type_keyed_events, batch_format="pyarrow",
        zero_copy_batch=True,
    ).write_parquet(log_dir)
    threshold = 512
    res = replay_aggregate(
        log_dir, lake_dir, ["cents"], num_partitions=num_partitions,
        reset_free=True, compact_threshold_rows=threshold,
    )
    if res.summary["events_in"] > 4 * threshold:
        assert res.summary["valve_compactions"] > 0, res.summary
    return read_aggregate_lake(lake_dir)


def _derive_type_keyed_events(batch: pa.Table) -> pa.Table:
    """events rows → a reset-free metrics log keyed per event TYPE —
    deliberately skewed (few keys, Zipfian types)."""
    import numpy as np

    n = len(batch)
    val = batch.column("value")
    val_np = (
        val.to_numpy() if isinstance(val, pa.Array)
        else val.combine_chunks().to_numpy()
    )
    return pa.table(
        {
            "lsn": batch.column("event_id"),
            "op": pa.array(["I"] * n, pa.string()),
            "repo": pa.array(["evt"] * n, pa.string()),
            "path": batch.column("event_type"),
            "cents": pa.array(np.floor(val_np * 100.0).astype(np.int64)),
        }
    )
