"""Multi-source change-log fan-in: N binlog tails → ONE lake table.

Real CDC deployments tail several source databases/shards into one lake
(the reference runs one extractor per source table and funnels them into
one staging schema — ``src/etl_pipeline.py``'s per-table extract loop —
with "latest statement wins" ordering; fan-in generalizes that to
independent LSN spaces).  Each source here has its own monotonic LSN; no
global order exists across sources, so this module DEFINES one,
deterministically:

    global order = (lsn, source_index)          — encoded as the
    composite LSN   lsn' = lsn * K + source_idx   (K = number of sources)

Totally ordered, unique (per-source LSNs are unique), order-preserving
within each source — and the whole engine then runs UNCHANGED on lsn':
the LWW fold, winner selection, checkpoints, manifests, lineage.

What cannot be reused blindly is RESUME.  The merged feed is NOT
append-only in lsn': a lagging source legitimately delivers events BELOW
another source's committed watermark.  Three mechanisms make the
incremental path exact anyway:

- **watermark pruning off** (``ReplayConfig.watermark_prune=False``):
  the checkpoint prune is only an optimization for append-only logs; a
  fan-in resume feeds every event of the new buckets and relies on the
  LWW fold's idempotence (re-applying an already-applied event re-picks
  the same winner).
- **persisted tombstones** (``SinkConfig.keep_tombstones=True``): the
  lake keeps op='D' rows at the delete's composite LSN, so a late event
  with a LOWER composite LSN folds against the tombstone and loses — it
  can never resurrect a deleted key.
- **a vector clock, not a scalar watermark**: ``_fanin.json`` records
  per-source applied-through bucket lists; each incremental round feeds
  exactly the new buckets of every source.  Rounds are idempotent, so a
  crash between the replay commit and the manifest write re-runs the
  round harmlessly.

Tombstones are GC'd once UNREACHABLE: a tombstone at composite LSN T can
be dropped when every source's next event must exceed T (see
``gc_tombstones``).
"""

from __future__ import annotations

import dataclasses
import glob
import json
import os
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from ..config import ReplayConfig, SinkConfig
from ..state import manifest as mf
from .replay import ReplayResult, replay

# composite encode: lsn' = lsn * K + source_idx.  Guard the int64 budget —
# 10^10 events per source at K=8 sources is still 3 decimal orders below
# the 2^62 line this enforces.
_MAX_SOURCE_LSN_FACTOR = 1 << 62

FANIN_MANIFEST = "_fanin.json"


def composite_lsn(lsn: int, source_idx: int, n_sources: int) -> int:
    """The fan-in total order, as one int64 the whole engine sorts on."""
    return lsn * n_sources + source_idx


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, FANIN_MANIFEST)


def read_fanin_manifest(out_dir: str) -> dict[str, Any] | None:
    p = _manifest_path(out_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _write_fanin_manifest(out_dir: str, m: dict[str, Any]) -> None:
    os.makedirs(out_dir, exist_ok=True)
    tmp = _manifest_path(out_dir) + ".inprogress"
    with open(tmp, "w") as f:
        json.dump(m, f, indent=1, sort_keys=True)
    os.replace(tmp, _manifest_path(out_dir))  # atomic on POSIX


def _source_buckets(log_dir: str) -> list[str]:
    """Bucket files of one source log, as paths RELATIVE to the log dir
    (the unit of the vector clock — a bucket is either fully applied or
    not yet seen; sources append whole buckets)."""
    files = sorted(
        glob.glob(os.path.join(log_dir, "**", "*.parquet"), recursive=True)
    )
    return [os.path.relpath(f, log_dir) for f in files]


@ray.remote
def _convert_bucket(
    src_path: str, dst_path: str, source_idx: int, source_name: str, k: int
) -> int:
    """Stamp one source bucket with the composite LSN + source lineage.

    Idempotent (temp write + atomic rename, deterministic content) and
    embarrassingly parallel — the convert step is a flat map over new
    buckets, no shuffle.  Returns the bucket's row count."""
    t = pq.read_table(src_path)
    lsn = t.column("lsn")
    mx = pc.max(lsn).as_py()
    if mx is not None and mx >= _MAX_SOURCE_LSN_FACTOR // k:
        raise ValueError(
            f"source lsn {mx} too large to composite-encode at K={k} "
            "(lsn * K + idx must stay an int64)"
        )
    comp = pc.add(pc.multiply(lsn, pa.scalar(k, pa.int64())),
                  pa.scalar(source_idx, pa.int64()))
    i = t.schema.get_field_index("lsn")
    t = t.set_column(i, pa.field("lsn", pa.int64()), comp.cast(pa.int64()))
    if "source" in t.column_names:
        raise ValueError(
            "source log already carries a 'source' column — fan-in owns "
            "that lineage column"
        )
    t = t.append_column("source", pa.array([source_name] * len(t), pa.string()))
    os.makedirs(os.path.dirname(dst_path), exist_ok=True)
    tmp = dst_path + ".inprogress"
    pq.write_table(t, tmp)
    os.replace(tmp, dst_path)
    return len(t)


def convert_new_buckets(
    log_dirs: list[str],
    staging_dir: str,
    applied: dict[str, list[str]],
    round_no: int,
    source_names: list[str],
) -> tuple[str | None, dict[str, list[str]], int]:
    """Convert every not-yet-applied bucket of every source into ONE round
    directory (the unit replay consumes).  Returns (round_dir | None,
    buckets-per-source converted this round, event count)."""
    k = len(log_dirs)
    todo: list[tuple[int, str]] = []
    for idx, d in enumerate(log_dirs):
        seen = set(applied.get(source_names[idx], []))
        todo.extend(
            (idx, rel) for rel in _source_buckets(d) if rel not in seen
        )
    if not todo:
        return None, {}, 0
    round_dir = os.path.join(staging_dir, f"round_{round_no:05d}")
    refs = []
    for idx, rel in todo:
        # unique flat name per (source, bucket): replay globs recursively,
        # so layout only needs uniqueness, not hive dirs
        flat = rel.replace(os.sep, "__").replace("=", "-")
        dst = os.path.join(round_dir, f"src{idx}__{flat}")
        refs.append(
            _convert_bucket.remote(
                os.path.join(log_dirs[idx], rel), dst, idx,
                source_names[idx], k,
            )
        )
    rows = sum(ray.get(refs))
    new_applied: dict[str, list[str]] = {}
    for idx, rel in todo:
        new_applied.setdefault(source_names[idx], []).append(rel)
    return round_dir, new_applied, rows


def replay_fanin(
    log_dirs: list[str],
    out_dir: str,
    cfg: ReplayConfig | None = None,
    staging_dir: str | None = None,
    source_names: list[str] | None = None,
) -> ReplayResult | None:
    """Replay N source change logs into one lake under the composite
    (lsn, source) LWW order.  Incremental: each call converts and feeds
    only the buckets that appeared since the last call (per source — the
    vector clock), exactly-once end to end.  Returns None when every
    source is already applied (a true no-op: no staging write, no replay).
    """
    k = len(log_dirs)
    if k < 1:
        raise ValueError("need at least one source log")
    source_names = source_names or [f"src{i}" for i in range(k)]
    if len(set(source_names)) != k or len(source_names) != k:
        raise ValueError("source_names must be unique, one per log dir")
    # staging lives NEXT TO the lake, not inside it — fsck's orphan sweep
    # and the manifest reader own everything under out_dir
    staging_dir = staging_dir or out_dir.rstrip("/") + "_fanin_staging"

    fm = read_fanin_manifest(out_dir)
    if fm is None:
        fm = {"sources": source_names, "applied": {}, "rounds": 0}
    elif fm["sources"] != source_names:
        # source identity IS the composite encoding (lsn' = lsn*K + idx):
        # reordering / adding sources re-maps every historical LSN
        raise ValueError(
            f"lake was fan-in committed with sources={fm['sources']}; "
            f"got {source_names} — source list and order are sticky"
        )

    round_dir, new_applied, _rows = convert_new_buckets(
        log_dirs, staging_dir, fm["applied"], fm["rounds"], source_names
    )
    if round_dir is None:
        return None

    cfg = cfg or ReplayConfig()
    if cfg.watermark_prune:
        cfg = dataclasses.replace(cfg, watermark_prune=False)
    sink = SinkConfig(out_dir=out_dir, keep_tombstones=True)
    has_lake = bool(mf.read_all_manifests(out_dir))
    res = replay(round_dir, out_dir, cfg, sink=sink, resume=has_lake)

    for src, buckets in new_applied.items():
        fm["applied"].setdefault(src, []).extend(buckets)
    fm["rounds"] += 1
    # per-source applied-through high water (source-LSN space) — the
    # tombstone GC threshold derives from these
    hwm = fm.setdefault("source_hwm", {})
    for idx, d in enumerate(log_dirs):
        name = source_names[idx]
        mx = hwm.get(name, -1)
        for rel in new_applied.get(name, []):
            pf = pq.ParquetFile(os.path.join(d, rel))
            li = pf.schema_arrow.get_field_index("lsn")
            for rg in range(pf.metadata.num_row_groups):
                st = pf.metadata.row_group(rg).column(li).statistics
                if st is not None and st.max is not None:
                    mx = max(mx, st.max)
        hwm[name] = mx
    _write_fanin_manifest(out_dir, fm)
    res.summary["fanin_round"] = fm["rounds"] - 1
    res.summary["fanin_sources"] = k
    return res


def tombstone_gc_threshold(out_dir: str) -> int:
    """Largest composite LSN T such that EVERY possible future event
    exceeds T: a source's next event has source-LSN > its applied high
    water W_s, hence composite ≥ (W_s+1)*K + s.  Tombstones strictly
    below min_s((W_s+1)*K + s) can never lose to — or beat — anything
    that still arrives, so they are dead weight."""
    fm = read_fanin_manifest(out_dir)
    if fm is None:
        raise ValueError(f"no fan-in manifest at {out_dir}")
    k = len(fm["sources"])
    hwm = fm.get("source_hwm", {})
    if len(hwm) < k:
        return 0  # a source has never delivered — nothing is provably dead
    return min((hwm[s] + 1) * k + i for i, s in enumerate(fm["sources"]))


def gc_tombstones(out_dir: str, compression: str = "zstd") -> dict[str, Any]:
    """Drop unreachable tombstones (composite LSN < the vector-clock
    threshold) from every partition that holds any, re-committing those
    partitions exactly-once at their next epoch.  Live rows, watermarks
    and the manifest contract are untouched — this is the fan-in lake's
    compaction primitive."""
    from ..hashing import table_digest

    thr = tombstone_gc_threshold(out_dir)
    manifests = mf.read_all_manifests(out_dir)
    dropped_total = 0
    parts_rewritten = 0
    for part, m in sorted(manifests.items()):
        if not m["stats"].get("keep_tombstones", False):
            raise ValueError("gc_tombstones needs a tombstone lake")
        chained = m.get("kind") == "delta" or len(m.get("files", [])) > 1
        if not chained and m["stats"].get("deleted_keys", 0) == 0:
            continue
        pdir = mf.partition_dir(out_dir, part)
        tbl = pa.concat_tables(
            [pq.read_table(os.path.join(pdir, f)) for f in m["files"]],
            promote_options="permissive",
        )
        if chained:
            # merge-on-read chain: fold to the single-version row set first
            # (a delta manifest's counters describe its increment, not the
            # chain — recompute from the fold below); the rewrite also
            # collapses the chain into a plain base file.
            from .replay import _fold_chain_table

            tbl = _fold_chain_table(tbl, keep_tombstones=True)
        dead = pc.and_(
            pc.equal(tbl.column("op"), pa.scalar("D")),
            pc.less(tbl.column("lsn"), pa.scalar(thr, pa.int64())),
        )
        n_dead = int(pc.sum(dead.cast(pa.int64())).as_py() or 0)
        if n_dead == 0 and not chained:
            continue
        kept = tbl.filter(pc.invert(dead))
        n_tomb = int(
            pc.sum(pc.equal(kept.column("op"), pa.scalar("D")).cast(pa.int64())).as_py()
            or 0
        )
        stats = dict(m["stats"])
        stats["deleted_keys"] = n_tomb
        stats["state_rows"] = len(kept)
        stats["keys_seen"] = len(kept)
        digest = table_digest(kept, ["repo", "path"])
        mf.commit_partition(
            out_dir, part, m["epoch"] + 1, kept, stats, digest,
            compression=compression,
        )
        dropped_total += n_dead
        parts_rewritten += 1
    return {
        "threshold": thr,
        "tombstones_dropped": dropped_total,
        "partitions_rewritten": parts_rewritten,
    }
