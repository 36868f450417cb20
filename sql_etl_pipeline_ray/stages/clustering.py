"""Embedding clustering: grouped vector centroids + distributed k-means.

Beyond-reference operators for the training-data family (the reference
engine has no vector ops at all; its nearest idiom is the grouped
aggregate family, ``sql/complex_queries.sql:17-60``).

Determinism design: float vector sums are order-dependent (Ray's partial
aggregation vs any sequential reference differ by ulps), so BOTH
operators aggregate vectors in **fixed-point int64** (value × 2²⁰,
rounded half-away like DuckDB ``round``) — int sums are associative, so
any partitioning/iteration order yields bit-identical centroids, which
makes the k-means reproducible cluster-for-cluster and the centroid
query exactly SQL-oracle-able (same trick as the money-cents
aggregation, ``pipelines/analytics.py:_cents``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# 2^20 fixed-point scale: float32 inputs carry 24 significant bits, so
# quantization error is ≤ 2^-21 per element — far below any cluster-
# boundary gap in practice, and identical on every engine.
_FP = 1 << 20


def _quantize(vecs: np.ndarray) -> np.ndarray:
    """float vectors → int64 fixed-point, rounding half away from zero
    (DuckDB ``round`` semantics, via the Arrow kernel both sides trust)."""
    flat = pa.array(vecs.astype(np.float64).ravel())
    q = pc.cast(
        pc.round(pc.multiply(flat, pa.scalar(float(_FP))),
                 round_mode="half_towards_infinity"),
        pa.int64(),
    )
    return q.to_numpy().reshape(vecs.shape)


def _stack(col: pd.Series) -> np.ndarray:
    return np.vstack(col.to_numpy())


def label_centroids(emb: ray.data.Dataset) -> pa.Table:
    """Mean embedding per label, exact: per-batch partial int64 sums per
    (label, dim) — the shuffle carries labels × dims rows per block, never
    vectors — then one final division ``sum / (FP * n)`` whose operands are
    bit-identical to the SQL oracle's.  Output long-form (label, dim
    1-based, centroid) for direct SQL comparison."""
    from ray.data.aggregate import Sum

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        q = _quantize(_stack(df["embedding"]))
        labels, inv = np.unique(df["label"].to_numpy(), return_inverse=True)
        sums = np.zeros((len(labels), q.shape[1]), np.int64)
        np.add.at(sums, inv, q)
        counts = np.bincount(inv, minlength=len(labels))
        k, d = sums.shape
        return pd.DataFrame(
            {
                "label": np.repeat(labels, d),
                "dim": np.tile(np.arange(1, d + 1, dtype=np.int64), k),
                "s": sums.ravel(),
                "n": np.repeat(counts.astype(np.int64), d),
            }
        )

    agg = (
        emb.map_batches(partials, batch_format="pandas")
        .groupby(["label", "dim"])
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )
    out = pd.DataFrame(
        {
            "label": agg["label"].astype(np.int32),
            "dim": agg["dim"].astype(np.int64),
            # single division, same operands as the oracle's
            # SUM(q) / (1048576.0 * COUNT(*))
            "centroid": agg["s"].to_numpy(np.int64)
            / (float(_FP) * agg["n"].to_numpy(np.int64)),
        }
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def kmeans_parallel_init(
    emb: ray.data.Dataset,
    k: int = 8,
    rounds: int = 3,
    oversample: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> np.ndarray:
    """Deterministic k-means|| over-seeding (Bahmani et al., VLDB 2012):
    the quality init for distributed k-means, replacing the min-id seed
    without ever collecting the corpus.

    Per round, ONE ``map_batches`` pass over the (materialized) input
    computes each point's min squared distance to the current candidate
    set (broadcast, tiny), and emits (a) the batch's int64 sum of the
    *quantized* distances — folded into the potential ``phi`` used by the
    NEXT round, so each round is a single pass — and (b) the points
    sampled with probability ``min(1, l*d2/phi)``.  The sample decision is
    an integer compare ``hash54(id, round) < floor(2^54 * l * d2q / phi)``
    — both sides are pure functions of the data, NOT of partitioning or
    scheduling, so the chosen candidates (and everything downstream) are
    bit-reproducible under any blocking, unlike textbook RNG-per-task
    sampling.  A final pass weights each candidate by the number of
    points nearest to it, then a driver-side weighted Lloyd's (over the
    ~``rounds*l + 1`` candidates only) reduces to k centers.

    Cost: ``rounds + 1`` scans, each shipping back O(blocks + samples)
    rows; candidates ≈ ``rounds * l`` stay driver-sized by construction.
    """
    from .bloom import _splitmix64

    l = oversample if oversample is not None else 2 * k
    emb = emb.materialize()

    # candidate 0: the min-id vector (block-local min-1 + driver merge)
    first = (
        emb.map_batches(lambda df: df.nsmallest(1, id_col), batch_format="pandas")
        .to_pandas()
        .nsmallest(1, id_col)
    )
    cand = _stack(first[vec_col]).astype(np.float64)

    phi = None  # potential vs candidates, lagging one round (single pass)
    for r in range(rounds):
        cref = ray.put(cand)
        salt = np.uint64(_splitmix64(np.array([seed + r], dtype=np.uint64))[0])
        phi_prev = phi

        def scan(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return pd.DataFrame(
                    {
                        "kind": pd.Series(dtype=object),
                        "val": pd.Series(dtype=np.int64),
                        "vec": pd.Series(dtype=object),
                    }
                )
            C = ray.get(cref)
            X = _stack(df[vec_col]).astype(np.float64)
            d2 = (X * X).sum(1)[:, None] - 2.0 * X @ C.T + (C * C).sum(1)[None, :]
            dmin = np.maximum(d2.min(axis=1), 0.0)
            # quantized distances: the potential phi is an exact int sum,
            # identical under any partitioning
            d2q = np.floor(dmin * _FP + 0.5).astype(np.int64)
            rows = [pd.DataFrame({"kind": ["phi"], "val": [d2q.sum()], "vec": [b""]})]
            if phi_prev is not None and phi_prev > 0:
                ids = df[id_col].to_numpy(np.int64).view(np.uint64)
                coin = (_splitmix64(ids ^ salt) >> np.uint64(10)).astype(np.int64)
                thr = np.minimum(
                    float(1 << 54), np.floor((1 << 54) * l * (d2q / phi_prev))
                ).astype(np.int64)
                pick = coin < thr
                if pick.any():
                    rows.append(
                        pd.DataFrame(
                            {
                                "kind": "cand",
                                "val": df[id_col].to_numpy(np.int64)[pick],
                                "vec": [
                                    v.tobytes()
                                    for v in _stack(df.loc[pick, vec_col]).astype(
                                        np.float64
                                    )
                                ],
                            }
                        )
                    )
            return pd.concat(rows, ignore_index=True)

        out = emb.map_batches(scan, batch_format="pandas").to_pandas()
        phi = int(out.loc[out["kind"] == "phi", "val"].sum())
        picked = out[out["kind"] == "cand"].sort_values("val")  # by id: stable
        if len(picked):
            new = np.vstack(
                [np.frombuffer(b, dtype=np.float64) for b in picked["vec"]]
            )
            cand = np.vstack([cand, new])

    # weight pass: points nearest to each candidate
    cref = ray.put(cand)

    def weigh(df: pd.DataFrame) -> pd.DataFrame:
        C = ray.get(cref)
        if not len(df):
            return pd.DataFrame(
                {
                    "c": np.arange(len(C), dtype=np.int64),
                    "w": np.zeros(len(C), np.int64),
                }
            )
        X = _stack(df[vec_col]).astype(np.float64)
        d2 = (X * X).sum(1)[:, None] - 2.0 * X @ C.T + (C * C).sum(1)[None, :]
        w = np.bincount(np.argmin(d2, axis=1), minlength=len(C)).astype(np.int64)
        return pd.DataFrame({"c": np.arange(len(C), dtype=np.int64), "w": w})

    wsum = (
        emb.map_batches(weigh, batch_format="pandas")
        .to_pandas()
        .groupby("c")["w"]
        .sum()
        .reindex(range(len(cand)), fill_value=0)
        .to_numpy(np.int64)
    )

    # driver-side weighted Lloyd's over the tiny candidate set:
    # deterministic init = heaviest k candidates (ties -> earliest)
    order = np.lexsort((np.arange(len(cand)), -wsum))
    cents = cand[np.sort(order[:k])].copy()
    for _ in range(100):
        d2 = (
            (cand * cand).sum(1)[:, None]
            - 2.0 * cand @ cents.T
            + (cents * cents).sum(1)[None, :]
        )
        a = np.argmin(d2, axis=1)
        new = cents.copy()
        for c in range(k):
            m = a == c
            tw = wsum[m].sum()
            if tw > 0:
                new[c] = (cand[m] * wsum[m, None]).sum(0) / tw
        if np.array_equal(new, cents):
            break
        cents = new
    return cents


def kmeans(
    emb: ray.data.Dataset,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    converge: bool = True,
    init: str | np.ndarray = "min_id",
) -> pd.DataFrame:
    """Distributed Lloyd's k-means with deterministic, order-independent
    iterations.

    Per iteration: broadcast the k×d centroid matrix (``ray.put`` once,
    read per task), one ``map_batches`` pass emits per-batch partial
    (count, int64 fixed-point sum) per cluster — blocks × k tiny rows to
    the driver, never vectors — then the driver folds them and divides
    once.  Int sums make every iteration bit-identical under ANY
    partitioning, so the result is reproducible cluster-for-cluster
    (pinned in ``tests/test_clustering.py`` against a single-process
    reference).  Assignment is vectorized ``argmin_c |x|² − 2x·C + |C|²``;
    ties break to the lowest cluster index on both paths.

    Init: the k lowest-``id_col`` vectors (deterministic; see
    ``kmeans_parallel_init`` for the quality-seeking scale init).  Empty
    clusters keep their previous centroid.  The input is materialized
    once — ``iters`` passes re-reading storage would pay the scan
    ``iters`` times; if the table exceeds cluster memory, drop
    ``.materialize()`` and accept re-scans (the object store spills
    either way).

    ``converge=True`` stops early when an iteration leaves every centroid
    bit-identical (then assignments are a pure function of centroids, so
    no further iteration can change anything); ``iters`` becomes the max.
    The check is a driver-side compare of the k×d array — O(k·d), free
    relative to a pass over the data.
    """
    emb = emb.materialize()
    if isinstance(init, np.ndarray):
        cents = init.astype(np.float64).copy()
    elif init == "parallel":
        cents = kmeans_parallel_init(emb, k, id_col=id_col, vec_col=vec_col)
    else:
        # init = the k lowest-id vectors, WITHOUT a global sort:
        # block-local min-k then a driver merge of blocks × k candidates
        # (the top_terms pattern) — same deterministic result, no shuffle.
        seed_rows = (
            emb.map_batches(
                lambda df: df.nsmallest(k, id_col), batch_format="pandas"
            )
            .to_pandas()
            .nsmallest(k, id_col)
            .sort_values(id_col)
        )
        cents = _stack(seed_rows[vec_col]).astype(np.float64)

    for _ in range(iters):
        cref = ray.put(cents)

        def partial_fit(df: pd.DataFrame) -> pd.DataFrame:
            C = ray.get(cref)
            X = _stack(df[vec_col]).astype(np.float64)
            d2 = (X * X).sum(1)[:, None] - 2.0 * X @ C.T + (C * C).sum(1)[None, :]
            a = np.argmin(d2, axis=1)  # ties → lowest index
            q = _quantize(X)
            sums = np.zeros((len(C), X.shape[1]), np.int64)
            np.add.at(sums, a, q)
            counts = np.bincount(a, minlength=len(C)).astype(np.int64)
            kk, d = sums.shape
            return pd.DataFrame(
                {
                    "c": np.arange(kk, dtype=np.int64),
                    "n": counts,
                    "s": list(sums),
                }
            )

        parts = emb.map_batches(partial_fit, batch_format="pandas").to_pandas()
        counts = np.zeros(len(cents), np.int64)
        sums = np.zeros_like(cents, dtype=np.int64)
        for c, g in parts.groupby("c"):
            counts[c] = g["n"].sum()
            sums[c] = np.sum(np.vstack(g["s"].to_numpy()), axis=0)
        nonempty = counts > 0
        new_cents = cents.copy()
        new_cents[nonempty] = sums[nonempty] / (float(_FP) * counts[nonempty, None])
        if converge and np.array_equal(new_cents, cents):
            break  # fixed point: assignments can no longer change
        cents = new_cents

    cref = ray.put(cents)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        C = ray.get(cref)
        X = _stack(df[vec_col]).astype(np.float64)
        d2 = (X * X).sum(1)[:, None] - 2.0 * X @ C.T + (C * C).sum(1)[None, :]
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "cluster": np.argmin(d2, axis=1).astype(np.int64),
            }
        )

    out = (
        emb.map_batches(assign, batch_format="pandas")
        .to_pandas()
        .sort_values(id_col)
        .reset_index(drop=True)
    )
    out[id_col] = out[id_col].astype(np.int64)
    return out


# ---------------------------------------------------------------------------
# Integer-exact (driver-legible) k-means family
# ---------------------------------------------------------------------------
#
# The float k-means above is bit-reproducible across PARTITIONINGS, but a
# SQL oracle recomputing its float distances hits last-ulp divergence
# (different summation orders) that can flip an argmin on a near-tie.
# The ``*_q`` family removes float from every DISCRETE decision: vectors
# quantize to int64 fixed-point once (the same round-half-away × 2^20 the
# centroid oracle already replays bit-exactly in SQL), centroids LIVE as
# int64 (updated with an exact integer round-half-away division), and
# assignment/seeding compare pure-integer squared distances.  Every label,
# every seed choice, every iteration is then a decidable integer function
# of the data — DuckDB replays it bit-for-bit, which is what makes the
# kmeans/IVF/LSH query entries hash-checkable by the correctness driver
# instead of rows-only.  Approximation quality is unaffected: quantization
# error is ≤ 2^-21 per element on unit-norm vectors.


def _int_round_div(s: np.ndarray, n: np.ndarray) -> np.ndarray:
    """Exact ``round_half_away(s / n)`` on int64 (n > 0) — the SQL twin is
    ``(2*s + n) // (2*n)`` for s ≥ 0 and ``-((2*(-s) + n) // (2*n))``
    below zero (floor division on nonnegative operands both ways)."""
    s = s.astype(np.int64)
    n = n.astype(np.int64)
    pos = (2 * s + n) // (2 * n)
    neg = -((2 * (-s) + n) // (2 * n))
    return np.where(s >= 0, pos, neg)


def _qd2(qx: np.ndarray, qc: np.ndarray) -> np.ndarray:
    """(n, k) int64 squared distances between quantized rows and
    centroids.  Computed via the exact expansion in int64 — no float
    anywhere, so comparisons are total and SQL-identical."""
    # |x|^2 - 2 x.c + |c|^2, all int64; magnitudes stay < 2^50 for
    # unit-norm embeddings at 2^20 scale (headroom checked in tests)
    x2 = (qx * qx).sum(axis=1)
    c2 = (qc * qc).sum(axis=1)
    return x2[:, None] - 2 * (qx @ qc.T) + c2[None, :]


def kmeans_q_fit(
    emb: ray.data.Dataset,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init_qcents: np.ndarray | None = None,
    dim_slice: tuple[int, int] | None = None,
) -> tuple[np.ndarray, pd.DataFrame]:
    """Integer-exact distributed Lloyd's: returns ``(qcents, assign)``
    where ``qcents`` is the final (k, d) int64 centroid matrix and
    ``assign`` the (id, cluster) DataFrame under those centroids.

    Same streaming shape as :func:`kmeans` — broadcast centroids, one
    ``map_batches`` pass per iteration emitting per-batch (cluster, dim)
    int64 partials, driver fold — but the centroid update is the exact
    integer division ``round_half_away(sum / n)``, so the state after
    every iteration is an integer function of the data alone.  Fixed
    ``iters`` on both engine and oracle (no early break: integer Lloyd's
    can in principle 2-cycle, and a fixed unroll is what the SQL twin
    replays; a reached fixed point makes the remaining iterations
    no-ops on both sides anyway).  Init: quantized vectors of the k
    lowest ids, or ``init_qcents`` (e.g. :func:`farthest_first_q`).
    ``dim_slice=(lo, hi)`` restricts the metric to quantized dimensions
    ``[lo, hi)`` — the product-quantization subspace trainer
    (``similarity.ann_pq_topk_q``) runs one integer k-means per subspace
    through this.
    """
    lo, hi = dim_slice if dim_slice is not None else (None, None)

    def _q(df_col) -> np.ndarray:
        qx = _quantize(_stack(df_col))
        return qx[:, lo:hi] if dim_slice is not None else qx

    emb = emb.materialize()
    if init_qcents is None:
        seed_rows = (
            emb.map_batches(
                lambda df: df.nsmallest(k, id_col), batch_format="pandas"
            )
            .to_pandas()
            .nsmallest(k, id_col)
            .sort_values(id_col)
        )
        qcents = _q(seed_rows[vec_col])
    else:
        qcents = init_qcents.astype(np.int64).copy()
        k = len(qcents)

    for _ in range(iters):
        cref = ray.put(qcents)

        def partial_fit(df: pd.DataFrame) -> pd.DataFrame:
            C = ray.get(cref)
            qx = _q(df[vec_col])
            a = np.argmin(_qd2(qx, C), axis=1)  # ties -> lowest cluster
            sums = np.zeros((len(C), qx.shape[1]), np.int64)
            np.add.at(sums, a, qx)
            counts = np.bincount(a, minlength=len(C)).astype(np.int64)
            return pd.DataFrame(
                {
                    "c": np.arange(len(C), dtype=np.int64),
                    "n": counts,
                    "s": list(sums),
                }
            )

        parts = emb.map_batches(partial_fit, batch_format="pandas").to_pandas()
        counts = np.zeros(k, np.int64)
        sums = np.zeros_like(qcents)
        for c, g in parts.groupby("c"):
            counts[c] = g["n"].sum()
            sums[c] = np.sum(np.vstack(g["s"].to_numpy()), axis=0)
        nonempty = counts > 0
        new = qcents.copy()
        new[nonempty] = _int_round_div(
            sums[nonempty], counts[nonempty, None]
        )
        qcents = new

    cref = ray.put(qcents)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        C = ray.get(cref)
        qx = _q(df[vec_col])
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(np.int64),
                "cluster": np.argmin(_qd2(qx, C), axis=1).astype(np.int64),
            }
        )

    out = (
        emb.map_batches(assign, batch_format="pandas")
        .to_pandas()
        .sort_values(id_col)
        .reset_index(drop=True)
    )
    return qcents, out


def farthest_first_q(
    emb: ray.data.Dataset,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic farthest-first (Gonzalez k-center) seeding on the
    INTEGER metric: start from the min-id vector; each step adds the
    point maximizing its quantized squared distance to the chosen set
    (ties -> lowest id).  k-1 streaming passes, each a block-local
    (max-d2, min-id) reduction over the broadcast chosen set — the
    SQL-replayable stand-in for RNG-seeded k-means++ / k-means|| when a
    bit-checkable oracle is required (the RNG inits stay available via
    :func:`kmeans_parallel_init`)."""
    emb = emb.materialize()
    first = (
        emb.map_batches(lambda df: df.nsmallest(1, id_col), batch_format="pandas")
        .to_pandas()
        .nsmallest(1, id_col)
    )
    chosen = _quantize(_stack(first[vec_col]))
    for _ in range(k - 1):
        cref = ray.put(chosen)

        def far(df: pd.DataFrame) -> pd.DataFrame:
            C = ray.get(cref)
            qx = _quantize(_stack(df[vec_col]))
            dmin = _qd2(qx, C).min(axis=1)
            ids = df[id_col].to_numpy(np.int64)
            # block-local winner: max distance, ties -> lowest id
            order = np.lexsort((ids, -dmin))
            w = order[0]
            return pd.DataFrame(
                {
                    "d2": [np.int64(dmin[w])],
                    id_col: [ids[w]],
                    "vec": [qx[w].tobytes()],
                }
            )

        cand = emb.map_batches(far, batch_format="pandas").to_pandas()
        cand = cand.sort_values(["d2", id_col], ascending=[False, True])
        chosen = np.vstack(
            [chosen, np.frombuffer(cand.iloc[0]["vec"], dtype=np.int64)]
        )
    return chosen
