"""Incrementally maintained DERIVED tables: dst = fn(row) over a lake.

The read side of CDC, closed into a loop: downstream tables (search-index
shadows, redacted/enriched copies, feature tables) should not re-read a
100-TB lake because 0.1% of it changed.  ``refresh_derived_lake`` keeps a
row-wise transform of a source lake up to date by processing only what
changed since the last refresh — the row-wise sibling of the aggregate
IVM in ``pipelines/ivm.py`` (reference analogue: the staging→final
transform step re-run per load, ``src/etl_pipeline.py:149-189``, made
incremental).

Mechanics — partition-local end to end, NO shuffle at any scale:

- The derived lake adopts the source's hash-partition layout (keys are
  preserved 1:1 by contract), so "what changed in source partition p"
  maps exactly onto "what to rewrite in derived partition p".
- The refresh state (``_derive.json``) pins EXACT per-partition source
  epochs — not an ``asof`` bound, which a lagging partition counter could
  satisfy with a commit made after the pin (the same hazard the
  transactional snapshots avoid; see ``read_lake(pinned_epochs=…)``).
- Per changed partition, one Ray task: read the pinned OLD keys+lsn
  (three narrow columns), the current NEW state, and the derived
  partition's prior rows; changed keys = lsn differs or key is new,
  deleted keys = gone from new.  The task drops prior derived rows for
  (changed ∪ deleted), applies ``fn`` to the changed NEW rows only, and
  commits the partition at its next epoch (digest-tagged, CAS — the
  exactly-once discipline every sink in this engine shares).
- Unchanged partitions (pinned epoch == current epoch) are skipped
  without reading a byte.

Cost model (measured at 5M keys / 32 partitions): the refresh saves
TRANSFORM compute (fn runs on changed rows only) and skips untouched
partitions entirely — but a touched partition still reads its new state
and prior derived rows in full and rewrites the partition (copy-on-write
commit).  A tiny UNIFORM increment therefore stays read-bound (every
partition touched); the wins come from expensive transforms and
partition-localized increments.  ``merge_on_read=True`` removes the
write side of that cost too: the refresh commits only fn(changed rows)
plus delete tombstones as a chained delta (prior derived rows are never
read), and because derived rows carry the source's winning LSN the
standard LWW chain fold serves reads and ``compact_lake`` restores plain
files.

Crash/retry: state pins advance only after every commit; a re-run with
stale pins recomputes the same diff and commits byte-identical content
(digest idempotence), converging regardless of where the previous run
died.

``fn`` contract: a pandas batch function, row-wise and KEY-PRESERVING —
output must have the same row count with ``repo``/``path`` unchanged
(validated); aggregation belongs to ``pipelines/ivm.py`` / ``rollup.py``.
``fn_version`` names the transform: a refresh under a different version
than the lake was built with is refused (half-old/half-new derived rows
would be silent corruption); bump the version and rebuild into a fresh
dst to change the transform.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..hashing import table_digest
from ..schemas import KEY_COLUMNS
from ..state import manifest as mf
from ..state.manifest import _atomic_write_bytes
from .replay import _fold_chain_table

DERIVE_MANIFEST = "_derive.json"


def _read_state(
    files: list[str], fold: bool, lake_tomb: bool, columns: list[str] | None
) -> pa.Table:
    if not files:
        return pa.table({})
    tabs = [pq.read_table(f, columns=None if fold else columns) for f in files]
    t = pa.concat_tables(tabs, promote_options="permissive")
    if fold:
        t = _fold_chain_table(t, keep_tombstones=lake_tomb)
    if "op" in t.column_names:
        import pyarrow.compute as pc

        from ..schemas import op_equal

        t = t.filter(pc.invert(op_equal(t.column("op"), "D")))
        t = t.drop_columns(["op"])
    if columns is not None:
        t = t.select([c for c in columns if c in t.column_names])
    return t


@ray.remote
def _refresh_part(
    part: int,
    old_files: list[str],
    old_fold: bool,
    new_files: list[str],
    new_fold: bool,
    lake_tomb: bool,
    dst_dir: str,
    dst_prior: dict | None,
    fn_ser: bytes,
    args: dict,
) -> dict[str, Any]:
    import ray.cloudpickle as pickle

    fn = pickle.loads(fn_ser)
    mor = bool(args.get("merge_on_read")) and dst_prior is not None
    if mor and len(dst_prior["files"]) > int(args.get("max_delta_files", 8)):
        mor = False  # inline compaction via the COW path below
    key_cols = list(KEY_COLUMNS)
    old = _read_state(old_files, old_fold, lake_tomb, key_cols + ["lsn"])
    new = _read_state(new_files, new_fold, lake_tomb, None)
    new_keys = new.select(key_cols + ["lsn"]).to_pandas() if len(new) else (
        pd.DataFrame(columns=key_cols + ["lsn"])
    )
    old_keys = old.to_pandas() if len(old) else pd.DataFrame(
        columns=key_cols + ["lsn"]
    )
    m = old_keys.merge(
        new_keys, on=key_cols, how="outer", suffixes=("_old", "_new"),
        indicator=True,
    )
    changed = m[
        (m["_merge"] == "right_only")
        | ((m["_merge"] == "both") & (m["lsn_old"] != m["lsn_new"]))
    ][key_cols]
    deleted = m[m["_merge"] == "left_only"][key_cols]
    drop_keys = pd.concat([changed, deleted], ignore_index=True)

    # prior derived rows minus everything that changed or died (the
    # merge-on-read path never reads them — that is its whole point)
    prior_tabs = []
    if dst_prior is not None and not mor:
        pdir = mf.partition_dir(dst_dir, part)
        prior_tabs = [
            pq.read_table(os.path.join(pdir, f)) for f in dst_prior["files"]
        ]
    prior = (
        pa.concat_tables(prior_tabs, promote_options="permissive")
        if prior_tabs
        else None
    )
    if prior is not None and "op" in prior.column_names:
        # a previously-chained dst read for a COW commit (inline
        # compaction): fold to the live row set first
        from .replay import _fold_chain_table as _fold

        prior = _fold(prior, keep_tombstones=False)
    keep_df = None
    if prior is not None and len(prior):
        pdf = prior.to_pandas()
        if len(drop_keys):
            idx = pd.MultiIndex.from_frame(pdf[key_cols])
            gone = pd.MultiIndex.from_frame(drop_keys)
            pdf = pdf[~idx.isin(gone)]
        keep_df = pdf

    # fn over the changed keys' NEW rows only
    derived_df = None
    if len(changed):
        ndf = new.to_pandas()
        nidx = pd.MultiIndex.from_frame(ndf[key_cols])
        sel = ndf[nidx.isin(pd.MultiIndex.from_frame(changed))]
        sel = sel.reset_index(drop=True)
        out = fn(sel)
        if "lsn" in out.columns:
            raise ValueError(
                "derive fn must not output an 'lsn' column — the engine "
                "appends the source row's winning LSN itself"
            )
        if len(out) != len(sel):
            raise ValueError(
                f"derive fn changed the row count ({len(sel)} → {len(out)}); "
                "row-wise transforms must be 1:1 (aggregation belongs to "
                "ivm/rollup)"
            )
        for k in key_cols:
            if not (out[k].to_numpy() == sel[k].to_numpy()).all():
                raise ValueError(f"derive fn must preserve key column {k!r}")
        out = out.copy()
        # source winning LSN rides along: lineage, and the version key the
        # merge-on-read chain fold orders by
        out["lsn"] = sel["lsn"].to_numpy()
        derived_df = out
    new_lsn = new_keys["lsn"].max() if len(new_keys) else -1
    prior_lsn = dst_prior["max_lsn"] if dst_prior else -1
    if mor:
        # delta = fn(changed rows) as op='U' + op='D' tombstones for
        # deleted keys at STRICTLY ABOVE every previously-derived row's
        # winning LSN (max(new_lsn, prior_lsn) + 1).  max() alone is not
        # enough: when the deleted key's own derived row holds the
        # partition's max LSN the tombstone would TIE it, and the LWW op
        # tiebreak ('D' < 'I'/'U', last-wins) resurrects the key.  The
        # bump stays correct against the future too: a later re-insert of
        # the key carries its source winning LSN, which source LWW
        # guarantees is above the delete — and on an exact tie with the
        # bumped tombstone the 'U' wins, which is the right outcome.
        max_seen = int(max(int(new_lsn) if pd.notna(new_lsn) else -1,
                           prior_lsn))
        tomb_lsn = max_seen + 1
        parts_df = []
        if derived_df is not None:
            d = derived_df.copy()
            d["op"] = "U"
            parts_df.append(d)
        if len(deleted):
            t = deleted.copy().reset_index(drop=True)
            t["lsn"] = tomb_lsn
            t["op"] = "D"
            parts_df.append(t)
        delta_df = (
            pd.concat(parts_df, ignore_index=True).sort_values(key_cols)
            if parts_df else pd.DataFrame(columns=key_cols + ["lsn", "op"])
        )
        delta = pa.Table.from_pandas(
            delta_df.reset_index(drop=True), preserve_index=False
        )
        stats = {
            "events_in": int(len(changed) + len(deleted)),
            "keys_seen": -1, "deleted_keys": int(len(deleted)),
            "orphan_events_applied": 0, "orphan_deletes": 0,
            # max_lsn tracks the tombstone bump so the NEXT refresh's
            # prior_lsn keeps its own tombstones strictly above these
            "max_lsn": tomb_lsn if len(deleted) else max_seen,
            "min_lsn": -1, "live_rows": int(len(delta)),
            "state_rows": int(len(delta)), "mode": "derived",
            "num_partitions": args["num_partitions"],
            "key_hash_version": args["key_hash_version"],
            "keep_tombstones": False, "kind": "delta",
        }
        epoch = dst_prior["epoch"] + 1
        digest = table_digest(delta, list(KEY_COLUMNS))
        mf.commit_partition(
            dst_dir, part, epoch, delta, stats, digest,
            compression=args["compression"], keep_epochs=args["keep_epochs"],
            chain_files=dst_prior["files"],
            chain_rows=int(dst_prior.get("rows", 0)),
        )
        return {
            "part": part, "epoch": epoch, "changed": int(len(changed)),
            "deleted": int(len(deleted)), "rows": int(len(delta)),
        }
    final_df = pd.concat(
        [d for d in (keep_df, derived_df) if d is not None],
        ignore_index=True,
    ) if (keep_df is not None or derived_df is not None) else None
    if final_df is None or len(final_df) == 0:
        final = pa.table({k: pa.array([], pa.string()) for k in key_cols})
    else:
        final_df = final_df.sort_values(key_cols).reset_index(drop=True)
        final = pa.Table.from_pandas(final_df, preserve_index=False)
    stats = {
        "events_in": int(len(changed) + len(deleted)),
        "keys_seen": int(len(final)),
        "deleted_keys": int(len(deleted)),
        "orphan_events_applied": 0,
        "orphan_deletes": 0,
        "max_lsn": int(max(int(new_lsn) if pd.notna(new_lsn) else -1, prior_lsn)),
        "min_lsn": -1,
        "live_rows": int(len(final)),
        "state_rows": int(len(final)),
        "mode": "derived",
        "num_partitions": args["num_partitions"],
        "key_hash_version": args["key_hash_version"],
        "keep_tombstones": False,
    }
    epoch = (dst_prior["epoch"] + 1) if dst_prior else 0
    digest = table_digest(final, list(KEY_COLUMNS))
    mf.commit_partition(
        dst_dir, part, epoch, final, stats, digest,
        compression=args["compression"], keep_epochs=args["keep_epochs"],
    )
    return {
        "part": part, "epoch": epoch, "changed": int(len(changed)),
        "deleted": int(len(deleted)), "rows": int(len(final)),
    }


def refresh_derived_lake(
    src_dir: str,
    dst_dir: str,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    fn_version: str = "v1",
    compression: str = "zstd",
    keep_epochs: int = 1,
    merge_on_read: bool = False,
    max_delta_files: int = 8,
) -> dict[str, Any]:
    """Bring ``dst`` up to date with ``src`` (see module docstring).

    Re-entrant: partitions whose pinned source epoch equals the current
    one are skipped; everything else recomputes deterministically and
    commits idempotently."""
    from .replay import KEY_HASH_VERSION

    t0 = time.time()
    src_m = mf.read_all_manifests(src_dir)
    if not src_m:
        raise ValueError(f"source lake {src_dir} has no committed state")
    versions = {m["stats"].get("key_hash_version", 1) for m in src_m.values()}
    if versions != {KEY_HASH_VERSION}:
        raise ValueError(
            f"source lake key_hash_version={sorted(versions)} does not match "
            f"engine version {KEY_HASH_VERSION}"
        )
    lake_tomb = any(
        m["stats"].get("keep_tombstones", False) for m in src_m.values()
    )
    num_partitions = next(iter(src_m.values()))["stats"].get(
        "num_partitions", max(src_m) + 1
    )
    spath = os.path.join(dst_dir, DERIVE_MANIFEST)
    state: dict[str, Any] = {"pins": {}, "src_dir": src_dir, "fn_version": fn_version}
    if os.path.exists(spath):
        with open(spath) as f:
            state = json.load(f)
        if state.get("fn_version") != fn_version:
            raise ValueError(
                f"derived lake was built with fn_version="
                f"{state.get('fn_version')!r} but this refresh passes "
                f"{fn_version!r}; mixed-transform rows would be silent "
                "corruption — rebuild into a fresh dst"
            )
        if os.path.realpath(state.get("src_dir", src_dir)) != os.path.realpath(
            src_dir
        ):
            raise ValueError(
                f"derived lake tracks {state.get('src_dir')!r}, not {src_dir!r}"
            )
    pins = {int(p): int(e) for p, e in state.get("pins", {}).items()}
    dst_m = mf.read_all_manifests(dst_dir)
    import sys

    import ray.cloudpickle as pickle

    # by-VALUE serialization: a module-level fn from the CALLER's module
    # would pickle by reference and fail to import on the workers; register
    # non-engine modules by value so user transforms just work (closures
    # and engine fns are unaffected)
    mod = getattr(fn, "__module__", None)
    if mod and mod != "__main__" and not mod.startswith("sql_etl_pipeline_ray"):
        try:
            pickle.cloudpickle.register_pickle_by_value(sys.modules[mod])
        except Exception:
            pass
    fn_ser = pickle.dumps(fn)
    args = {
        "num_partitions": num_partitions,
        "key_hash_version": KEY_HASH_VERSION,
        "compression": compression,
        "keep_epochs": keep_epochs,
        "merge_on_read": bool(merge_on_read),
        "max_delta_files": int(max_delta_files),
    }
    refs = []
    skipped = 0
    rebuilt = 0
    for part, m in sorted(src_m.items()):
        if pins.get(part) == m["epoch"]:
            skipped += 1
            continue
        pdir = mf.partition_dir(src_dir, part)
        old_files, old_fold = [], False
        if part in pins:
            try:
                om = mf.read_manifest_exact(src_dir, part, pins[part])
                old_files = [os.path.join(pdir, f) for f in om["files"]]
                old_fold = len(om["files"]) > 1
            except ValueError:
                # the pinned snapshot was GC'd (source keep_epochs smaller
                # than the refresh lag): degrade to a full rebuild of this
                # partition — correct, just not incremental.  Sources that
                # want guaranteed-incremental refreshes retain epochs ≥
                # refresh lag (the txn lakes' keep_epochs≥2 rule).
                rebuilt += 1
        refs.append(
            _refresh_part.remote(
                part,
                old_files, old_fold,
                [os.path.join(pdir, f) for f in m["files"]],
                len(m["files"]) > 1,
                lake_tomb,
                dst_dir,
                dst_m.get(part),
                fn_ser,
                args,
            )
        )
    results = ray.get(refs)
    os.makedirs(dst_dir, exist_ok=True)
    new_pins = {str(p): int(m["epoch"]) for p, m in src_m.items()}
    _atomic_write_bytes(
        spath,
        json.dumps(
            {"pins": new_pins, "src_dir": src_dir, "fn_version": fn_version},
            indent=1,
        ).encode(),
    )
    return {
        "partitions_refreshed": len(results),
        "partitions_skipped": skipped,
        "partitions_rebuilt_full": rebuilt,
        "changed_rows": sum(r["changed"] for r in results),
        "deleted_rows": sum(r["deleted"] for r in results),
        "duration_s": round(time.time() - t0, 4),
    }
