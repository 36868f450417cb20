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
