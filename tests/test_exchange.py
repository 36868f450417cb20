"""Direct unit tests for the actor-pool hash exchange: boundary-routed
partitions, retried-feed idempotence, and the compaction valve.

These paths are otherwise exercised only end-to-end through replay; the
routing contract (partition ids as slice boundaries, not a per-row
column) is pinned here at the API level.
"""

import numpy as np
import pyarrow as pa
import ray
import ray.cloudpickle as pickle

from sql_etl_pipeline_ray.schemas import PART_COLUMN
from sql_etl_pipeline_ray.stages.exchange import ExchangeActor, make_feeder


# NOTE: finalize fns are built as lambdas INSIDE each test — cloudpickle
# serializes module-level functions by reference, and the worker processes
# cannot import the tests module.
COLLECT_FN_SRC = lambda: (  # noqa: E731 - factory keeps each test self-contained
    lambda part, tbl, args: {
        "part": part,
        "rows": len(tbl),
        "lsns": sorted(tbl.column("lsn").to_pylist()),
    }
)


def _batch(lsns, parts):
    return pa.table(
        {
            "lsn": pa.array(lsns, pa.int64()),
            "val": pa.array([f"v{x}" for x in lsns]),
            PART_COLUMN: pa.array(parts, pa.int64()),
        }
    )


def test_feeder_routes_every_row_to_its_partition():
    num_partitions, num_actors = 7, 3
    actors = [ExchangeActor.remote() for _ in range(num_actors)]
    feed = make_feeder(lambda t: t, actors, num_partitions)
    rng = np.random.default_rng(7)
    sent = {}
    for _ in range(4):  # several batches, random partition mix
        lsns = [int(x) for x in rng.choice(10**6, 50, replace=False)]
        parts = [int(x) for x in rng.integers(0, num_partitions, 50)]
        for l, p in zip(lsns, parts):
            sent.setdefault(p, []).append(l)
        feed(_batch(lsns, parts))
    fn = pickle.dumps(COLLECT_FN_SRC())
    got = [
        r for rows in ray.get([a.finalize.remote(fn, {}) for a in actors]) for r in rows
    ]
    for a in actors:
        ray.kill(a)
    assert {g["part"] for g in got} == set(sent)
    for g in got:
        assert g["lsns"] == sorted(sent[g["part"]])
        # the actor assignment contract: partition % num_actors
        # (checked implicitly by finalize returning it from that actor)


def test_shipped_slices_carry_no_partition_column():
    """The feeder must drop _part before shipping — partition identity is
    boundary metadata, not 8 B/row of shuffle payload."""
    actors = [ExchangeActor.remote()]
    feed = make_feeder(lambda t: t, actors, 4)
    feed(_batch([1, 2, 3], [0, 1, 2]))

    schema_fn = lambda part, tbl, args: {  # noqa: E731
        "part": part, "cols": tbl.column_names,
    }
    rows = ray.get(actors[0].finalize.remote(pickle.dumps(schema_fn), {}))
    ray.kill(actors[0])
    assert rows and all(PART_COLUMN not in r["cols"] for r in rows)


def test_retried_feed_batch_is_deduplicated():
    """A retried feed task re-sends identical spans; the actor must apply
    them once (span identity: partition + lsn range + row count)."""
    actors = [ExchangeActor.remote()]
    feed = make_feeder(lambda t: t, actors, 2)
    b = _batch([10, 11, 12, 13], [0, 1, 0, 1])
    feed(b)
    feed(b)  # simulated task retry
    fn = pickle.dumps(COLLECT_FN_SRC())
    got = ray.get(actors[0].finalize.remote(fn, {}))
    ray.kill(actors[0])
    assert sorted(g["rows"] for g in got) == [2, 2]
    assert sorted(sum((g["lsns"] for g in got), [])) == [10, 11, 12, 13]


def test_compaction_bounds_buffered_rows():
    """Above the row threshold the compact fn collapses the buffer (here:
    keep the max-lsn row), so actor state stays O(compacted), not O(sent)."""
    compact = pickle.dumps(
        lambda t: t.sort_by([("lsn", "descending")]).slice(0, 1)
    )
    actors = [ExchangeActor.remote(compact, 10)]
    feed = make_feeder(lambda t: t, actors, 1)
    for i in range(5):
        feed(_batch(list(range(i * 4, i * 4 + 4)), [0] * 4))
    fn = pickle.dumps(COLLECT_FN_SRC())
    got = ray.get(actors[0].finalize.remote(fn, {}))
    ray.kill(actors[0])
    assert len(got) == 1
    # every span was applied exactly once and compaction kept the max
    assert got[0]["lsns"][-1] == 19
    assert got[0]["rows"] < 20
