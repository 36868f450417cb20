"""Temporal joins Ray Data lacks natively: as-of join and range join.

Beyond-reference custom operators (the reference engine has no temporal
join at all; its nearest idiom is the LAG/LEAD window family,
``sql/complex_queries.sql:167-190``).  Both are built as compositions the
brief prescribes for operators the Dataset API can't express directly:
hash co-partition both sides by the join key (union with a side marker —
Ray has no two-dataset co-partition primitive), then ONE vectorized pass
per partition.

Partitioning assumption (documented per the custom-operator contract):
all rows of one join key land in one partition, so per-partition state is
O(rows of that partition's keys); a pathologically hot key concentrates
its rows in one partition — the range join's pair output is additionally
bounded by the window, and the as-of join stays O(n log n) per partition
regardless of skew.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .analytics import _join_partitions, _t

# range-join composite encoding budgets: user << TS_BITS | (ts - base)
_TS_BITS = 42  # ~139 years of microseconds
_KEY_BITS = 63 - _TS_BITS  # ~2M distinct keys


def _tag_union(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    num_partitions: int,
) -> ray.data.Dataset:
    """Union the two sides under one schema (side-absent columns → nulls)
    with ``_side`` (0=left, 1=right) and ``_gp`` (key hash partition)."""
    l_schema = left.schema()
    r_schema = right.schema()
    l_names = list(l_schema.names)
    all_fields = list(zip(l_schema.names, l_schema.types)) + [
        (n, t) for n, t in zip(r_schema.names, r_schema.types) if n not in l_names
    ]

    def conform(side: int):
        def fn(t: pa.Table) -> pa.Table:
            cols = {}
            for name, typ in all_fields:
                if name in t.column_names:
                    cols[name] = t.column(name).cast(typ)
                else:
                    cols[name] = pa.nulls(len(t), typ)
            out = pa.table(cols)
            out = out.append_column(
                "_side", pa.array(np.full(len(t), side, np.int8))
            )
            k = t.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
            return out.append_column("_gp", pa.array(k % num_partitions))

        return fn

    return left.map_batches(
        conform(0), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.map_batches(conform(1), batch_format="pyarrow", zero_copy_batch=True)
    )


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    left_on: str,
    right_on: str,
    num_partitions: int,
    right_tiebreak: str | None = None,
) -> ray.data.Dataset:
    """Distributed backward as-of join: each left row picks the right row
    of the same ``key`` with the greatest ``right_on`` <= ``left_on``.

    Composition: co-partition by key hash, then ``pd.merge_asof`` (a
    vectorized C merge over sorted frames) once per PARTITION — no
    per-key Python, no global sort.  When several right rows share
    (key, right_on), ``right_tiebreak`` picks the max deterministically
    (mirroring a ROW_NUMBER()-DESC=1 pre-dedup in SQL).
    """
    r_names = [n for n in right.schema().names]
    both = _tag_union(left, right, key, num_partitions)

    def run(g: pd.DataFrame) -> pd.DataFrame:
        L = g[g["_side"] == 0].drop(
            columns=["_side", "_gp"] + [c for c in r_names if c != key]
        )
        R = g[g["_side"] == 1][r_names]
        if right_tiebreak is not None:
            R = R.sort_values(
                [key, right_on, right_tiebreak], kind="mergesort"
            ).drop_duplicates([key, right_on], keep="last")
        out = pd.merge_asof(
            L.sort_values(left_on, kind="mergesort"),
            R.sort_values(right_on, kind="mergesort"),
            left_on=left_on,
            right_on=right_on,
            by=key,
            direction="backward",
        )
        if right_tiebreak is not None and right_tiebreak not in L.columns:
            out = out.drop(columns=[right_tiebreak], errors="ignore")
        return out

    return both.groupby("_gp").map_groups(run, batch_format="pandas")


def range_join_count(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    left_on: str,
    right_on: str,
    window_us: int,
    num_partitions: int,
) -> ray.data.Dataset:
    """Distributed range join, aggregated: for each left row, the count
    and first timestamp of right rows with the same ``key`` and
    ``left_on < right_on <= left_on + window``.

    Per partition the right side is sorted once by a composite
    ``key << 42 | (ts - base)`` int64 and each left row's window becomes
    two vectorized ``np.searchsorted`` probes — O((n+m) log m) with NO
    pair materialization, immune to hot-key blowup.  Falls back to a
    pandas equi-merge + range filter when the composite doesn't fit
    (>2M distinct keys or >139-year span) — that path materializes the
    per-key pairs and is the one to time-bucket if a key is ever hot.
    """
    r_names = [n for n in right.schema().names]
    both = _tag_union(left, right, key, num_partitions)

    def run(g: pd.DataFrame) -> pd.DataFrame:
        L = g[g["_side"] == 0].drop(
            columns=["_side", "_gp"] + [c for c in r_names if c != key]
        )
        R = g[g["_side"] == 1][[key, right_on]]
        if len(L) == 0:
            out = L.copy()
            out["n_in_window"] = pd.Series(dtype=np.int64)
            out["first_in_window"] = pd.Series(dtype="datetime64[us]")
            return out
        lk = L[key].to_numpy(np.int64)
        lt = L[left_on].to_numpy("datetime64[us]").view(np.int64)
        rk = R[key].to_numpy(np.int64) if len(R) else np.zeros(0, np.int64)
        rt = (
            R[right_on].to_numpy("datetime64[us]").view(np.int64)
            if len(R)
            else np.zeros(0, np.int64)
        )
        base = int(min(lt.min(), rt.min())) if len(rt) else int(lt.min())
        kmax = int(max(lk.max(), rk.max())) if len(rk) else int(lk.max())
        kmin = int(min(lk.min(), rk.min())) if len(rk) else int(lk.min())
        span = int(lt.max() - base) + window_us
        if kmax < (1 << _KEY_BITS) and span < (1 << _TS_BITS) and kmin >= 0:
            rc = np.sort((rk << _TS_BITS) | (rt - base)) if len(rk) else rk
            lo = np.searchsorted(rc, (lk << _TS_BITS) | (lt - base), side="right")
            hi = np.searchsorted(
                rc, (lk << _TS_BITS) | (lt - base + window_us), side="right"
            )
            n = (hi - lo).astype(np.int64)
            first = np.full(len(L), np.datetime64("NaT", "us"))
            hit = n > 0
            if hit.any():
                first_enc = rc[lo[hit]]
                first[hit] = (
                    (first_enc & ((1 << _TS_BITS) - 1)) + base
                ).view("datetime64[us]")
        else:  # composite overflow — exact pandas fallback (see docstring)
            m = L[[key, left_on]].reset_index().merge(R, on=key, how="left")
            in_win = (m[right_on] > m[left_on]) & (
                m[right_on] <= m[left_on] + pd.Timedelta(microseconds=window_us)
            )
            m = m[in_win]
            agg = m.groupby("index").agg(
                n_in_window=(right_on, "size"), first_in_window=(right_on, "min")
            )
            n = np.zeros(len(L), np.int64)
            first = np.full(len(L), np.datetime64("NaT", "us"))
            if len(agg):
                # vectorized scatter: agg is indexed by L's original row
                # labels, so get_indexer maps each agg row to its L slot
                pos = pd.Index(L.index).get_indexer(agg.index)
                n[pos] = agg["n_in_window"].to_numpy(np.int64)
                first[pos] = (
                    agg["first_in_window"].to_numpy().astype("datetime64[us]")
                )
        out = L.copy()
        out["n_in_window"] = n
        out["first_in_window"] = pd.Series(first, index=L.index)
        return out

    return both.groupby("_gp").map_groups(run, batch_format="pandas")


# ---------------------------------------------------------------------------
# queries() entries over the driver's events table
# ---------------------------------------------------------------------------


def events_asof_enrich(sf_dir: str) -> pd.DataFrame:
    """Each 'purchase' event enriched with the same user's most recent
    'click' at or before it (NULLs when the user never clicked before).
    The SQL twin is DuckDB's ASOF LEFT JOIN."""
    ev = _t(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value"])
    left = ev.filter(expr="event_type == 'purchase'").drop_columns(["event_type"])
    right = (
        ev.filter(expr="event_type == 'click'")
        .drop_columns(["event_type"])
        .rename_columns(
            {"ts": "click_ts", "value": "click_value", "event_id": "click_event_id"}
        )
    )
    out = asof_join(
        left,
        right,
        key="user_id",
        left_on="ts",
        right_on="click_ts",
        num_partitions=_join_partitions(sf_dir, "events"),
        right_tiebreak="click_event_id",
    ).to_pandas()
    # the co-partition union null-fills left-only ints on right rows, which
    # floats them in pandas — restore the exact driver-facing dtypes
    out["event_id"] = out["event_id"].astype(np.int64)
    out["user_id"] = out["user_id"].astype(np.int64)
    return (
        out[["event_id", "user_id", "ts", "value", "click_ts", "click_value"]]
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def events_signup_followups(sf_dir: str) -> pd.DataFrame:
    """Range join: for each 'signup', how many events the user generated
    in the following 30 minutes and when the first one landed."""
    ev = _t(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    left = ev.filter(expr="event_type == 'signup'").drop_columns(["event_type"])
    right = ev.select_columns(["user_id", "ts"]).rename_columns({"ts": "ev_ts"})
    out = range_join_count(
        left,
        right,
        key="user_id",
        left_on="ts",
        right_on="ev_ts",
        window_us=30 * 60 * 1_000_000,
        num_partitions=_join_partitions(sf_dir, "events"),
    ).to_pandas()
    out["event_id"] = out["event_id"].astype(np.int64)
    out["user_id"] = out["user_id"].astype(np.int64)
    out["n_in_window"] = out["n_in_window"].astype(np.int64)
    return (
        out[["event_id", "user_id", "ts", "n_in_window", "first_in_window"]]
        .sort_values("event_id")
        .reset_index(drop=True)
    )
