"""Unit tests for the last-writer-wins fold (FIXTURES.md §4 truth table)."""

import pyarrow as pa
import pyarrow.compute as pc

from sql_etl_pipeline_ray.schemas import REPO_FILES_SCHEMA
from sql_etl_pipeline_ray.stages.merge import finalize_partition, fold_latest


def events(rows):
    cols = {
        "lsn": [r[0] for r in rows],
        "op": [r[1] for r in rows],
        "repo": [r[2] for r in rows],
        "path": [r[3] for r in rows],
        "commit": ["c"] * len(rows),
        "lang": ["py"] * len(rows),
        "content": [r[4] if len(r) > 4 else f"v{r[0]}" for r in rows],
    }
    return pa.table(cols)


def state_of(tbl):
    final, stats = finalize_partition(tbl, REPO_FILES_SCHEMA)
    return {
        (r["repo"], r["path"]): r["lsn"] for r in final.to_pylist()
    }, final, stats


def test_update_out_of_order_latest_lsn_wins():
    # I@1, U@5, U@3 → state of LSN 5, regardless of arrival order
    tbl = events([(1, "I", "a", "x"), (5, "U", "a", "x"), (3, "U", "a", "x")])
    st, final, _ = state_of(tbl)
    assert st == {("a", "x"): 5}


def test_delete_tombstones():
    st, final, stats = state_of(events([(1, "I", "a", "x"), (2, "D", "a", "x")]))
    assert st == {}
    assert stats["deleted_keys"] == 1


def test_orphan_delete_counted():
    st, final, stats = state_of(events([(9, "D", "a", "zz")]))
    assert st == {}
    assert stats["orphan_deletes"] == 1


def test_reinsert_after_delete():
    st, _, _ = state_of(
        events([(1, "I", "a", "x"), (2, "D", "a", "x"), (7, "I", "a", "x")])
    )
    assert st == {("a", "x"): 7}


def test_orphan_update_applied_and_counted():
    st, _, stats = state_of(events([(4, "U", "a", "never-inserted")]))
    assert st == {("a", "never-inserted"): 4}
    assert stats["orphan_events_applied"] == 1


def test_sha256_matches_content():
    import hashlib

    tbl = events([(1, "I", "a", "x", "hello world")])
    final, _ = finalize_partition(tbl, REPO_FILES_SCHEMA)
    assert (
        final.column("content_sha256")[0].as_py()
        == hashlib.sha256(b"hello world").hexdigest()
    )


def test_combiner_composes_with_final_fold():
    # folding twice (combine with tombstones, then final) == folding once
    tbl = events(
        [
            (1, "I", "a", "x"),
            (2, "U", "a", "x"),
            (3, "D", "a", "x"),
            (4, "I", "b", "y"),
            (5, "U", "b", "y"),
        ]
    )
    once, _ = finalize_partition(tbl, REPO_FILES_SCHEMA)
    half1 = fold_latest(tbl.slice(0, 3), keep_tombstones=True)
    half2 = fold_latest(tbl.slice(3), keep_tombstones=True)
    twice, _ = finalize_partition(
        pa.concat_tables([half1, half2]), REPO_FILES_SCHEMA
    )
    assert once.sort_by("repo").equals(twice.sort_by("repo"))


def test_multi_key_fold_vectorized_boundaries():
    tbl = events(
        [
            (1, "I", "a", "x"),
            (2, "I", "a", "y"),
            (3, "U", "a", "x"),
            (4, "I", "b", "x"),
            (5, "D", "a", "y"),
        ]
    )
    st, final, stats = state_of(tbl)
    assert st == {("a", "x"): 3, ("b", "x"): 4}
    assert stats["live_rows"] == 2
    assert stats["deleted_keys"] == 1
    # lsn column reflects winning event
    assert pc.max(final.column("lsn")).as_py() == 4


def test_fold_latest_max_lsn_tie_uses_exact_tiebreak():
    """A duplicate LSN at a key's max violates the unique-LSN contract; the
    fast path must step aside and the exact sorted path's 'op' tiebreak
    must decide deterministically (SORT_KEYS ends with op ASCENDING and
    last-row-wins, so 'U' > 'I' > 'D' at an equal (key, lsn)) — pinned so
    the argsort fast path never silently picks an arbitrary winner on
    corrupt input."""
    tbl = events([(1, "I", "a", "x"), (5, "U", "a", "x"), (5, "D", "a", "x")])
    out = fold_latest(tbl, keep_tombstones=True)
    assert len(out) == 1
    assert out.column("lsn")[0].as_py() == 5
    assert out.column("op")[0].as_py() == "U"


def test_fold_latest_below_max_tie_stays_fast_and_exact():
    """Ties BELOW the group max can't change the winner — the fold must
    return the unique max-LSN row whichever internal path runs."""
    tbl = events([(2, "U", "a", "x"), (2, "I", "a", "x"), (9, "U", "a", "x")])
    out = fold_latest(tbl, keep_tombstones=True)
    assert len(out) == 1
    assert out.column("lsn")[0].as_py() == 9
    assert out.column("op")[0].as_py() == "U"


def test_winners_fn_resolves_max_lsn_tie_via_exact_fold():
    """A max-LSN tie inside a key group (crash-window fan-in re-run: an
    event plus its own committed prior row at the same composite LSN) is
    resolved by the exact sorted fold's op tiebreak, not an error — and
    the winner count stays one per key."""
    import numpy as np

    from sql_etl_pipeline_ray.pipelines.replay import _winners_fn
    from sql_etl_pipeline_ray.stages.merge import (
        EVENTS_COL,
        HAD_INSERT_COL,
        KEY_HASH_COL,
    )

    tbl = events([(3, "U", "a", "x"), (3, "U", "a", "x")])
    tbl = tbl.append_column(KEY_HASH_COL, pa.array(np.array([7, 7], np.int64)))
    tbl = tbl.append_column(EVENTS_COL, pa.array([1, 1], pa.int64()))
    tbl = tbl.append_column(HAD_INSERT_COL, pa.array([True, True]))
    out = _winners_fn(0, tbl, {})
    assert out["stats"]["keys_seen"] == 1
    assert out["stats"]["live_rows"] == 1
    # tie between 'U' and a delete: ascending-op, last wins → 'U' survives
    tbl2 = events([(3, "D", "a", "x"), (3, "U", "a", "x")])
    tbl2 = tbl2.append_column(KEY_HASH_COL, pa.array(np.array([7, 7], np.int64)))
    tbl2 = tbl2.append_column(EVENTS_COL, pa.array([1, 1], pa.int64()))
    tbl2 = tbl2.append_column(HAD_INSERT_COL, pa.array([True, True]))
    out2 = _winners_fn(0, tbl2, {})
    assert out2["stats"]["keys_seen"] == 1
    assert out2["stats"]["live_rows"] == 1
    assert out2["stats"]["deleted_keys"] == 0


def test_op_code_order_mirrors_string_order():
    """The int8 encoding phase 1 ships relies on code order == string order
    ('D' < 'I' < 'P' < 'U') so the exact fold's ascending-op tiebreak is
    encoding-agnostic."""
    from sql_etl_pipeline_ray.schemas import OP_CODES

    by_code = sorted(OP_CODES, key=OP_CODES.get)
    assert by_code == sorted(OP_CODES) == ["D", "I", "P", "U"]


def test_fold_latest_int8_op_tiebreak_matches_string():
    """fold_latest on an int8-encoded op column picks the same winner as on
    strings, including the exact path's op tiebreak at a duplicate max LSN."""
    from sql_etl_pipeline_ray.schemas import OP_CODES, encode_op

    tbl = events([(1, "I", "a", "x"), (5, "U", "a", "x"), (5, "D", "a", "x")])
    i = tbl.schema.get_field_index("op")
    enc = tbl.set_column(i, pa.field("op", pa.int8()), encode_op(tbl.column("op")))
    out = fold_latest(enc, keep_tombstones=True)
    assert len(out) == 1
    assert out.column("lsn")[0].as_py() == 5
    assert out.column("op")[0].as_py() == OP_CODES["U"]
    # and tombstone dropping works on codes too
    dead = events([(1, "I", "b", "y"), (2, "D", "b", "y")])
    denc = dead.set_column(i, pa.field("op", pa.int8()), encode_op(dead.column("op")))
    assert len(fold_latest(denc, keep_tombstones=False)) == 0


def test_fold_latest_fills_null_partial_agg_columns():
    """Phase 1 ships _events/_had_insert only for combiner-folded rows; a
    permissive concat of folded + never-folded batches leaves nulls that
    MUST read as 'one event, had_insert == (op == I)'."""
    from sql_etl_pipeline_ray.stages.merge import EVENTS_COL, HAD_INSERT_COL

    folded = fold_latest(
        events([(1, "I", "a", "x"), (2, "U", "a", "x")]), keep_tombstones=True
    )
    raw = events([(3, "U", "a", "x"), (4, "I", "b", "y")])  # no agg columns
    mixed = pa.concat_tables([folded, raw], promote_options="permissive")
    assert mixed.column(EVENTS_COL).null_count == 2
    out = fold_latest(mixed, keep_tombstones=True).sort_by("repo")
    assert out.column("lsn").to_pylist() == [3, 4]
    # (a,x): 2 folded events + 1 null-filled; (b,y): 1 null-filled
    assert out.column(EVENTS_COL).to_pylist() == [3, 1]
    assert out.column(HAD_INSERT_COL).to_pylist() == [True, True]
    # had_insert derivation: a null row whose op is 'U' must NOT count as I
    raw_u = events([(9, "U", "c", "z")])
    mixed2 = pa.concat_tables([folded, raw_u], promote_options="permissive")
    out2 = fold_latest(mixed2, keep_tombstones=True).sort_by("repo")
    assert out2.column(HAD_INSERT_COL).to_pylist() == [True, False]


def test_fold_compose_property():
    """Property: for ANY event table and ANY split, folding the parts with
    tombstones kept and then finalizing equals finalizing the whole —
    the algebraic contract that makes the combiner safe to fire on any
    subset of batches (hypothesis-driven shapes: op mixes, key reuse,
    orphan updates/deletes, singleton and empty splits)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(st.data())
    def run(data):
        n = data.draw(st.integers(min_value=1, max_value=40))
        keys = data.draw(
            st.lists(
                st.tuples(st.sampled_from(["r1", "r2"]),
                          st.sampled_from(["a", "b", "c", "d"])),
                min_size=n, max_size=n,
            )
        )
        ops = data.draw(st.lists(st.sampled_from(["I", "U", "D"]), min_size=n, max_size=n))
        lsns = data.draw(st.permutations(list(range(1, n + 1))))
        tbl = events(
            [(lsns[i], ops[i], keys[i][0], keys[i][1]) for i in range(n)]
        )
        split = data.draw(st.integers(min_value=0, max_value=n))
        once, stats_once = finalize_partition(tbl, REPO_FILES_SCHEMA)
        parts = [tbl.slice(0, split), tbl.slice(split)]
        folded = [fold_latest(p, keep_tombstones=True) for p in parts if len(p)]
        twice, stats_twice = finalize_partition(
            pa.concat_tables(folded, promote_options="permissive"), REPO_FILES_SCHEMA
        )
        assert once.sort_by("path").equals(twice.sort_by("path"))
        for k in ("events_in", "keys_seen", "deleted_keys",
                  "orphan_events_applied", "orphan_deletes", "live_rows"):
            assert stats_once[k] == stats_twice[k], k

    run()
