"""Actor-pool hash exchange: the engine's shuffle.

Why not ``groupby().map_groups``: Ray Data's generic shuffles (sort-based
AND hash-based) serialize and re-sort the full row payload.  On a CDC log
whose rows are mostly large ``content`` strings, that measured 15-40×
slower than the useful work (40M events: ~200s shuffle vs ~5s fold).  The
exchange we actually need is only *routing* — no ordering — so we route
sub-tables through the object store straight to a pool of stateful actors
(the north-star's "stateful actor-pool stage"), each of which buffers the
partitions it owns and then runs a finalize function per partition.

The actor is GENERIC: ``add`` routes, ``finalize`` runs a cloudpickled
``fn(part, table, args) -> result`` per owned partition.  The replay
pipeline uses it twice (winner selection over key/LSN columns, then
commit of extracted winner rows — late materialization), and the direct
single-phase mode uses it once with a fold-and-commit fn.

Safety properties:

- Routing is deterministic: ``partition = key_hash % P``, ``actor =
  partition % A``.
- Delivery is acknowledged: a feed task blocks on its ``add`` acks before
  finishing, so when the feeding Dataset is fully consumed every event has
  been APPLIED at its actor; only then does the driver call ``finalize``.
- Duplicate-safe: a retried feed task re-sends the same deterministic
  sub-tables; the actor dedupes on ``(partition, first_lsn, last_lsn,
  rows)`` — LSNs are globally unique, so an identical span is the same
  data.
- Plasma-safe: each received slice is deep-copied ONCE into actor heap
  (an IPC round-trip, replacing the old actor-side re-sort + ``take``),
  so the object store drains incrementally — holding zero-copy views
  would pin the whole shuffle payload in plasma until finalize and force
  spilling at scale.
- Memory-bounded: an optional compaction fn collapses the buffer once it
  crosses a row threshold (the merge's tombstone-keeping partial fold), so
  state approaches O(live keys per actor), not O(events).
- Actor loss loses buffered (uncommitted) state → the run fails and a
  re-run resumes from committed manifests (the exactly-once sink makes
  replays idempotent).
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np
import pyarrow as pa
import ray

from ..schemas import PART_COLUMN


def _deep_copy(tbl: pa.Table) -> pa.Table:
    """Copy a table into process-heap buffers via an IPC round-trip."""
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, tbl.schema) as w:
        w.write_table(tbl)
    return pa.ipc.open_stream(sink.getvalue()).read_all()


@ray.remote(num_cpus=0)
class ExchangeActor:
    """Owns a set of hash partitions: buffers routed sub-tables, optionally
    compacts, and runs a per-partition finalize function.

    ``num_cpus=0`` is deliberate: the pool must coexist with the feeding
    map tasks (reserving CPUs for idle-buffering actors would starve the
    feed stage and deadlock the pipeline); the heavy finalize work happens
    after the feed stage has released the CPUs.
    """

    def __init__(
        self,
        compact_fn_ser: bytes | None = None,
        compact_threshold_rows: int = 16_000_000,
        copy_on_add: bool = True,
    ):
        # Compaction bounds actor memory at extreme scale, but it runs
        # inside add() (the actor is single-threaded), stalling every
        # pending ack — a 4M threshold caused feed tasks to spend 58s
        # blocked on a 40M-event replay.  Keep the threshold well above
        # the expected per-partition row count; it is a memory safety
        # valve, not a steady-state path.
        self.buffers: dict[int, list[pa.Table]] = {}
        self.buffered_rows: dict[int, int] = {}
        self.routed_bytes: dict[int, int] = {}
        self.seen_spans: set[tuple[int, int, int, int]] = set()
        self.compactions: dict[int, int] = {}
        self.compact_threshold = compact_threshold_rows
        # Governs only the direct add() entry point (tests / custom
        # callers): False buffers the caller's table as-is (a zero-copy
        # plasma view when called remotely — pins its backing object until
        # finalize).  The feeder path (add_many) always makes exactly one
        # heap copy per received slice; see add_many.
        self.copy_on_add = copy_on_add
        self.compact_fn: Callable | None = None
        if compact_fn_ser is not None:
            import ray.cloudpickle as pickle

            self.compact_fn = pickle.loads(compact_fn_ser)

    def add_many(self, tbl: pa.Table, parts: list[int], lengths: list[int]) -> int:
        """Apply one routed multi-partition table (this actor's share of a
        feed batch, rows grouped by partition in ``parts`` order with
        ``lengths`` rows each).  One RPC + one plasma object per
        (batch, actor) instead of per (batch, partition) — interleaved
        min-of-3 measured the phase-1 feed at 8.9s vs 10.8s (and far
        better medians) on a 100M-event log at 64 partitions / 32
        actors.

        The feeder already sorted the batch by (actor, partition), so the
        partition layout arrives as plain offsets: no per-row partition
        column ships through plasma (8 B/row saved) and no actor-side
        re-sort + ``take`` copy of an already-sorted table (the old
        ``split_by_partition``).  ONE deep copy of the whole slice into
        actor heap replaces that take — same single memcpy, zero sort —
        and plasma still drains incrementally.  Buffering zero-copy views
        instead was considered and rejected: it would pin the entire
        routed phase in the object store until finalize and force
        spilling at scale (~25 GB of narrow phase-1 rows at 300M events
        vs a ~30%-of-RAM store)."""
        tbl = _deep_copy(tbl)
        applied = 0
        off = 0
        for part, n in zip(parts, lengths):
            applied += self._buffer(int(part), tbl.slice(off, n))
            off += n
        return applied

    def add(self, part: int, tbl: pa.Table) -> int:
        """Single-partition add (direct callers / tests); the feeder path
        is ``add_many``.  ``copy_on_add`` governs only this entry point."""
        return self._buffer(part, _deep_copy(tbl) if self.copy_on_add else tbl)

    def _buffer(self, part: int, tbl: pa.Table) -> int:
        span = (
            part,
            int(tbl.column("lsn")[0].as_py()) if len(tbl) else -1,
            int(tbl.column("lsn")[-1].as_py()) if len(tbl) else -1,
            len(tbl),
        )
        if span in self.seen_spans:  # retried feed task — drop duplicate
            return 0
        self.seen_spans.add(span)
        self.buffers.setdefault(part, []).append(tbl)
        self.buffered_rows[part] = self.buffered_rows.get(part, 0) + len(tbl)
        # Observability: Arrow buffer bytes actually routed to this actor —
        # on a real cluster this is the exchange's network volume, so the
        # run summary can PROVE what a wire-format change saves.
        self.routed_bytes[part] = self.routed_bytes.get(part, 0) + tbl.nbytes
        if self.compact_fn is not None and self.buffered_rows[part] >= self.compact_threshold:
            merged = pa.concat_tables(self.buffers[part], promote_options="permissive")
            compacted = self.compact_fn(merged)
            self.buffers[part] = [compacted]
            self.buffered_rows[part] = len(compacted)
            self.compactions[part] = self.compactions.get(part, 0) + 1
        return len(tbl)

    def finalize(self, fn_ser: bytes, args: dict[str, Any]) -> list[Any]:
        """Run ``fn(part, concatenated_table, args)`` for each owned
        partition; returns the list of results (buffer is released)."""
        import time

        import ray.cloudpickle as pickle

        fn = pickle.loads(fn_ser)
        out = []
        self.timings = {}
        for part in sorted(self.buffers):
            t0 = time.monotonic()
            tbl = pa.concat_tables(self.buffers[part], promote_options="permissive")
            t1 = time.monotonic()
            out.append(fn(part, tbl, args))
            self.timings[part] = {
                "concat_s": round(t1 - t0, 3),
                "fn_s": round(time.monotonic() - t1, 3),
                "rows": len(tbl),
                "chunks": len(self.buffers[part]),
                "bytes": self.routed_bytes.get(part, 0),
                "compactions": self.compactions.get(part, 0),
            }
        self.buffers.clear()
        self.buffered_rows.clear()
        self.routed_bytes.clear()
        self.compactions.clear()
        return out

    def finalize_timings(self) -> dict[int, dict]:
        """Per-partition wall breakdown of the last finalize — the
        observability hook for diagnosing straggler partitions (skew) and
        host contention without re-running under a profiler."""
        return getattr(self, "timings", {})


def make_feeder(process_fn, actors: list, num_partitions: int):
    """Build the map_batches feed fn: process → split by ACTOR → route →
    ack.

    Rows sort once by the composite (owning actor, partition) key, so each
    actor receives ONE contiguous multi-partition slice per batch (its
    partitions already grouped — the actor-side re-split is a boundary
    scan over sorted ids).  Routing per actor rather than per partition
    cuts RPCs, acks and plasma objects by partitions/actors× (see
    ``ExchangeActor.add_many`` for the measured win).

    Runs inside Ray Data's streaming executor, so the read keeps its
    backpressure; the per-batch return is a one-row ack count (the tiny
    dataset the driver consumes to drive the pipeline)."""
    num_actors = len(actors)
    # numpy's stable argsort radix-sorts integers with one pass per byte, so
    # the composite (actor, partition) key — bounded by actors×partitions —
    # sorts 3.7× faster as int16 than as int64 (8.0ms vs 29.8ms per 524Ki
    # rows).  Fall back to int64 only when the key range genuinely needs it
    # (cluster-scale partition counts).
    _key_dtype = (
        np.int16 if num_actors * num_partitions < np.iinfo(np.int16).max else np.int64
    )

    def feed(batch: pa.Table) -> pa.Table:
        batch = process_fn(batch)
        # Optional dead-letter accounting: the process fn reports how many
        # rows it rejected via schema metadata (see normalize/phase-1), and
        # the ack row carries it to the driver's run summary.
        md = batch.schema.metadata or {}
        rej = int(md.get(b"rejected", b"0"))
        parts = batch.column(PART_COLUMN).to_numpy(zero_copy_only=False)
        # The partition id ships as boundary metadata on the sorted slice,
        # never as a per-row column (8 B/row of shuffle bytes).
        batch = batch.drop_columns([PART_COLUMN])
        if len(parts) == 0:
            return pa.table({"routed": [0], "rejected": [rej]})
        key = ((parts % num_actors) * np.int64(num_partitions) + parts).astype(
            _key_dtype
        )
        order = np.argsort(key, kind="stable")
        sorted_tbl = batch.take(pa.array(order))
        ks = key[order]
        # runs of the composite key = per-(actor, partition) row ranges
        rb = np.flatnonzero(np.diff(ks)) + 1
        run_starts = np.concatenate(([0], rb))
        run_ends = np.concatenate((rb, [len(ks)]))
        run_key = ks[run_starts].astype(np.int64)
        run_actor = run_key // num_partitions
        run_part = run_key % num_partitions
        ab = np.flatnonzero(np.diff(run_actor)) + 1
        a_lo = np.concatenate(([0], ab))
        a_hi = np.concatenate((ab, [len(run_actor)]))
        acks = []
        for i0, i1 in zip(a_lo, a_hi):
            row0 = int(run_starts[i0])
            acks.append(
                actors[int(run_actor[i0])].add_many.remote(
                    sorted_tbl.slice(row0, int(run_ends[i1 - 1]) - row0),
                    run_part[i0:i1].tolist(),
                    (run_ends[i0:i1] - run_starts[i0:i1]).tolist(),
                )
            )
        ray.get(acks)  # delivery barrier: events applied before task exits
        return pa.table({"routed": [len(sorted_tbl)], "rejected": [rej]})

    return feed


def run_exchange(
    ds,
    process_fn,
    finalize_fn,
    finalize_args: dict[str, Any],
    num_partitions: int,
    num_actors: int,
    batch_size: int | None,
    compact_fn=None,
    compact_threshold_rows: int = 16_000_000,
    timings_out: list | None = None,
) -> list[Any]:
    """Feed a Dataset through the actor exchange and finalize.

    Returns the flattened per-partition finalize results.  With
    ``timings_out`` (a caller-owned list), appends each actor's
    per-partition finalize timings dict — concat/fn wall, rows, routed
    bytes and memory-valve compaction counts — the skew/straggler
    observability hook."""
    import ray.cloudpickle as pickle

    compact_ser = pickle.dumps(compact_fn) if compact_fn is not None else None
    actors = [
        ExchangeActor.remote(compact_ser, compact_threshold_rows)
        for _ in range(num_actors)
    ]
    feed = make_feeder(process_fn, actors, num_partitions)
    ds.map_batches(
        feed, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
    ).count()  # consume: drives the feed with streaming backpressure
    fn_ser = pickle.dumps(finalize_fn)
    results = ray.get([a.finalize.remote(fn_ser, finalize_args) for a in actors])
    if timings_out is not None:
        timings_out.extend(
            ray.get([a.finalize_timings.remote() for a in actors])
        )
    for a in actors:
        ray.kill(a)
    return [r for rows in results for r in rows]
