"""Embedding clustering: fixed-point determinism + k-means correctness."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from sql_etl_pipeline_ray.stages import clustering as CL

SF = "/root/testdata/sf0.001"


def _local_kmeans(X: np.ndarray, ids: np.ndarray, k: int, iters: int):
    """Single-process reference doing the SAME fixed-point ops."""
    order = np.argsort(ids)
    cents = X[order[:k]].astype(np.float64)
    for _ in range(iters):
        d2 = (
            (X * X).sum(1)[:, None]
            - 2.0 * X @ cents.T
            + (cents * cents).sum(1)[None, :]
        )
        a = np.argmin(d2, axis=1)
        q = CL._quantize(X)
        sums = np.zeros((k, X.shape[1]), np.int64)
        np.add.at(sums, a, q)
        counts = np.bincount(a, minlength=k).astype(np.int64)
        ne = counts > 0
        cents[ne] = sums[ne] / (float(CL._FP) * counts[ne, None])
    d2 = (
        (X * X).sum(1)[:, None]
        - 2.0 * X @ cents.T
        + (cents * cents).sum(1)[None, :]
    )
    return np.argmin(d2, axis=1)


def test_kmeans_matches_single_process_reference():
    t = pq.read_table(f"{SF}/embeddings.parquet")
    X = np.vstack(t.column("embedding").to_pylist()).astype(np.float64)
    ids = t.column("vec_id").to_numpy()
    want = _local_kmeans(X, ids, k=8, iters=5)

    # many small blocks → partial sums fold in a different order than the
    # reference; fixed-point int sums must make that invisible
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet", override_num_blocks=7)
    got = CL.kmeans(ds, k=8, iters=5)
    assert len(got) == len(X)
    np.testing.assert_array_equal(
        got.sort_values("vec_id")["cluster"].to_numpy(), want[np.argsort(ids)]
    )


def test_kmeans_groups_are_tighter_than_random():
    t = pq.read_table(f"{SF}/embeddings.parquet")
    X = np.vstack(t.column("embedding").to_pylist()).astype(np.float64)
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    got = CL.kmeans(ds, k=8, iters=5).sort_values("vec_id")
    a = got["cluster"].to_numpy()
    assert 2 <= len(np.unique(a))  # not collapsed to one cluster

    def wcss(assign):
        tot = 0.0
        for c in np.unique(assign):
            xs = X[assign == c]
            tot += ((xs - xs.mean(0)) ** 2).sum()
        return tot

    rng = np.random.default_rng(0)
    assert wcss(a) < wcss(rng.integers(0, 8, len(X)))


def test_label_centroids_exactness_under_blocking(tmp_path):
    # two different block layouts must give BIT-identical centroids
    ds1 = ray.data.read_parquet(f"{SF}/embeddings.parquet", override_num_blocks=1)
    ds2 = ray.data.read_parquet(f"{SF}/embeddings.parquet", override_num_blocks=11)
    a = CL.label_centroids(ds1).to_pandas()
    b = CL.label_centroids(ds2).to_pandas()
    pd.testing.assert_frame_equal(a, b)  # exact, no tolerance


def test_kmeans_converge_stop_matches_fixed_iters():
    # converged centroids are a fixed point: stopping early must not
    # change the final assignment vs running all iterations
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    a = CL.kmeans(ds, k=8, iters=50, converge=True).sort_values("vec_id")
    b = CL.kmeans(ds, k=8, iters=50, converge=False).sort_values("vec_id")
    np.testing.assert_array_equal(a["cluster"].to_numpy(), b["cluster"].to_numpy())


def test_kmeans_parallel_init_partition_invariant():
    ds1 = ray.data.read_parquet(f"{SF}/embeddings.parquet", override_num_blocks=1)
    ds2 = ray.data.read_parquet(f"{SF}/embeddings.parquet", override_num_blocks=9)
    c1 = CL.kmeans_parallel_init(ds1, k=8)
    c2 = CL.kmeans_parallel_init(ds2, k=8)
    np.testing.assert_array_equal(c1, c2)  # bit-identical under blocking
    assert c1.shape[0] == 8


def test_kmeans_parallel_init_beats_min_id_wcss():
    t = pq.read_table(f"{SF}/embeddings.parquet")
    X = np.vstack(t.column("embedding").to_pylist()).astype(np.float64)

    def wcss(assign):
        tot = 0.0
        for c in np.unique(assign):
            xs = X[assign == c]
            tot += ((xs - xs.mean(0)) ** 2).sum()
        return tot

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    pp = CL.kmeans(ds, k=8, iters=10, init="parallel").sort_values("vec_id")
    base = CL.kmeans(ds, k=8, iters=10).sort_values("vec_id")
    # over-seeded init should never be dramatically worse; usually better
    assert wcss(pp["cluster"].to_numpy()) <= 1.05 * wcss(base["cluster"].to_numpy())


# ---------------------------------------------------------------------------
# integer-exact (driver-legible) family: kmeans_q_fit / farthest_first_q
# ---------------------------------------------------------------------------


def _qref_kmeans(qx, ids, k, iters, init=None):
    """Single-process reference of the INTEGER Lloyd's."""
    order = np.argsort(ids)
    C = qx[order[:k]].copy() if init is None else init.copy()
    for _ in range(iters):
        a = np.argmin(CL._qd2(qx, C), axis=1)
        new = C.copy()
        for c in range(len(C)):
            m = a == c
            if m.sum():
                new[c] = CL._int_round_div(qx[m].sum(0), np.int64(m.sum()))
        C = new
    return C, np.argmin(CL._qd2(qx, C), axis=1)


def test_kmeans_q_matches_reference_and_blocking_invariant():
    t = pq.read_table(f"{SF}/embeddings.parquet")
    df = t.to_pandas().sort_values("vec_id").reset_index(drop=True)
    qx = CL._quantize(CL._stack(df["embedding"]))
    ids = df["vec_id"].to_numpy(np.int64)
    Cref, aref = _qref_kmeans(qx, ids, k=8, iters=5)
    for blocks in (1, 7):
        ds = ray.data.read_parquet(f"{SF}/embeddings.parquet").repartition(blocks)
        C, assign = CL.kmeans_q_fit(ds, k=8, iters=5)
        assert np.array_equal(C, Cref)
        assert np.array_equal(assign["cluster"].to_numpy(), aref)


def test_int_round_div_matches_half_away():
    s = np.array([3, 1, 1, -3, -1, 0, 7, -7], np.int64)
    n = np.array([2, 2, 3, 2, 2, 5, 2, 2], np.int64)
    want = np.array([2, 1, 0, -2, -1, 0, 4, -4], np.int64)
    assert np.array_equal(CL._int_round_div(s, n), want)


def test_qd2_headroom_int64():
    """Unit-norm 64-dim embeddings at 2^20 scale stay far inside int64:
    |qx| <= 2^20 per dim, so d2 <= 64 * (2^21)^2 = 2^53 and the dot
    magnitudes in the cosine path stay < 2^53 (exact in float64 too)."""
    t = pq.read_table(f"{SF}/embeddings.parquet")
    qx = CL._quantize(CL._stack(t.to_pandas()["embedding"]))
    assert np.abs(qx).max() < (1 << 21)
    d2 = CL._qd2(qx[:64], qx[64:128])
    assert d2.max() < (1 << 53) and d2.min() >= 0


def test_farthest_first_q_deterministic_and_spread():
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    s1 = CL.farthest_first_q(ds, k=8)
    s2 = CL.farthest_first_q(ds.repartition(5), k=8)
    assert np.array_equal(s1, s2)  # partition-invariant
    # seeds are pairwise far apart: min pairwise distance among seeds
    # beats the min pairwise distance of the first 8 vectors (min-id init)
    t = pq.read_table(f"{SF}/embeddings.parquet")
    qx = CL._quantize(CL._stack(
        t.to_pandas().sort_values("vec_id")["embedding"]))

    def min_pair_d2(C):
        d = CL._qd2(C, C).astype(np.float64)
        np.fill_diagonal(d, np.inf)
        return d.min()

    assert min_pair_d2(s1) > min_pair_d2(qx[:8])
