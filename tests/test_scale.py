"""Scale-parameterization tests: data-responsive shuffle widths, the
join-based candidate-verify fallback, tiled bucket kernels, non-dyadic
prefix-filter thresholds, and convergence guards — the round-3 fixes for
the round-2 "green at sf0.1 but wrong shape at 100 TB" findings."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from sql_etl_pipeline_ray import scale
from sql_etl_pipeline_ray.stages import dedup as D
from sql_etl_pipeline_ray.stages import similarity as SIM


# ---- sizing helpers -------------------------------------------------------


def test_partitions_scale_with_bytes():
    # responsive to input size: 100x the bytes -> ~100x the partitions
    floor = scale.partitions_for_bytes(None)
    assert floor == 2 * scale.cluster_cpus()
    one_gib = scale.partitions_for_bytes(1 << 30, floor=4)
    hundred_gib = scale.partitions_for_bytes(100 << 30, floor=4)
    assert hundred_gib > one_gib >= 4
    assert hundred_gib == min(scale.MAX_PARTITIONS, (100 << 30) // (64 << 20) + 1)
    # capped so fragment counts stay bounded
    assert scale.partitions_for_bytes(1 << 50) == scale.MAX_PARTITIONS


def test_autoscale_pool_range():
    lo, hi = scale.autoscale_pool()
    assert lo == 2 and hi == scale.cluster_cpus() and hi >= lo


def test_ivf_cluster_count_scales_with_rows():
    small = ray.data.range(49)
    big = ray.data.range(250_000)
    assert SIM._ivf_cluster_count(small, None, floor=8) == (8, 49)  # floor
    assert SIM._ivf_cluster_count(big, None, floor=8) == (500, 250_000)
    assert SIM._ivf_cluster_count(big, 16, floor=8) == (16, 250_000)


def test_ivf_probe_count_scales_with_corpus():
    # tiny corpus: probe every cell (IVF degenerates to the exact scan)
    assert SIM._ivf_probe_count(22, 500) == 22
    # big corpus: scan-volume target, not a fixed 4
    assert SIM._ivf_probe_count(1000, 1_000_000) == 15
    # unknown row count: conservative fallback
    assert SIM._ivf_probe_count(1000, None) == max(4, 1000 // 64)


# ---- tiled bucket kernel (memory-bounded oversized IVF buckets) -----------


def test_tiled_cosine_pairs_matches_dense_kernel():
    rng = np.random.default_rng(7)
    m = rng.normal(size=(57, 16))
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    ids = rng.permutation(57).astype(np.int64) * 3  # unordered, gappy ids
    thr = 0.2

    # dense reference (the pre-tiling kernel)
    s = mn @ mn.T
    ii, jj = np.nonzero(s >= thr)
    keep = ids[ii] < ids[jj]
    want = set(zip(ids[ii][keep], ids[jj][keep]))

    for tile in (7, 16, 57, 1000):  # several tiles, one tile, oversize
        got = SIM._tiled_cosine_pairs(ids, mn, thr, tile_rows=tile)
        assert set(zip(got["vec_a"], got["vec_b"])) == want
        assert (got["vec_a"] < got["vec_b"]).all()
        assert not got.duplicated(["vec_a", "vec_b"]).any()


# ---- non-dyadic thresholds through the prefix filter (ADVICE r2) ----------


def _dup_corpus():
    texts = []
    texts.append(" ".join(f"tok{i}" for i in range(40)))
    # J = 28/48 ≈ 0.583: above 0.55 — exercises the non-dyadic threshold
    # with a TRUE pair, the ADVICE hazard scenario
    texts.append(" ".join([f"tok{i}" for i in range(30)] + [f"alt{i}" for i in range(10)]))
    # n = 100 grams exactly (102 tokens): 0.55*100 floats to 55.000...01
    texts.append(" ".join(f"big{i}" for i in range(102)))
    texts.append(
        " ".join([f"big{i}" for i in range(80)] + [f"oth{i}" for i in range(22)])
    )  # shared grams 78, union 122 -> J ≈ 0.639
    # unrelated doc
    texts.append(" ".join(f"zzz{i}" for i in range(40)))
    return pd.DataFrame({"doc_id": [1, 2, 3, 4, 5], "text": texts})


def _brute_jaccard(df, k, thr):
    import hashlib

    def sset(t):
        w = t.split(" ")
        return {
            " ".join(w[i : i + k]) for i in range(len(w) - k + 1)
        } if len(w) >= k else set()

    out = []
    rows = list(df.itertuples(index=False))
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            sa, sb = sset(rows[i].text), sset(rows[j].text)
            if sa and sb and len(sa & sb) / len(sa | sb) >= thr:
                out.append((rows[i].doc_id, rows[j].doc_id))
    return sorted(out)


@pytest.mark.parametrize("thr", [0.55, 0.3, 0.5])
def test_ngram_jaccard_non_dyadic_threshold_lossless(thr):
    # τ·n landing an ulp above the exact rational value must not shorten
    # the prefix (τ=0.55, n=100 -> ceil must be 55, not 56)
    df = _dup_corpus()
    out = D.ngram_jaccard_pairs(ray.data.from_pandas(df), shingle_k=3, threshold=thr)
    assert out.schema().names == ["doc_a", "doc_b", "jaccard"]
    got = out.to_pandas()
    want = _brute_jaccard(df, 3, thr)
    # Ray's to_pandas drops columns on EMPTY datasets — normalize
    pairs = sorted(zip(got["doc_a"], got["doc_b"])) if len(got) else []
    assert pairs == want


def test_prefix_ceiling_exact_at_float_hazard():
    # the concrete ADVICE example: threshold*n = 55.000000000000007
    n = np.array([100], dtype=np.int64)
    p = n - np.ceil(0.55 * n - 1e-9).astype(np.int64) + 1
    assert p[0] == 46  # n - 55 + 1, NOT n - 56 + 1


# ---- join-based candidate verification fallback ---------------------------


def _near_dup_docs():
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = []
    for i in range(8):
        words = base.split()
        words[1] = f"word{i}"
        rows.append((i * 2, " ".join(words)))
        rows.append((i * 2 + 1, " ".join(words)))  # exact dup partner
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def test_minhash_join_verify_matches_broadcast():
    df = _near_dup_docs()
    ds = ray.data.from_pandas(df)
    broad = D.minhash_lsh_pairs(ds, jaccard_threshold=0.5)
    # tier 2: pair count over the driver cap, texts still broadcastable
    tier2 = D.minhash_lsh_pairs(ds, jaccard_threshold=0.5, verify_broadcast_max=0)
    # tier 3: texts "too big" to broadcast → hash-join fallback
    joined = D.minhash_lsh_pairs(
        ds, jaccard_threshold=0.5, verify_broadcast_max=0,
        verify_texts_max_bytes=0,
    )
    pd.testing.assert_frame_equal(
        broad.reset_index(drop=True), tier2.reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        broad.reset_index(drop=True), joined.reset_index(drop=True)
    )
    assert len(broad) > 0  # the comparison is not vacuous


def test_ngram_join_verify_matches_broadcast():
    df = _near_dup_docs()
    ds = ray.data.from_pandas(df)
    broad = D.ngram_jaccard_pairs(ds, threshold=0.5).to_pandas()
    tier2 = D.ngram_jaccard_pairs(
        ds, threshold=0.5, verify_broadcast_max=0
    ).to_pandas()
    joined = D.ngram_jaccard_pairs(
        ds, threshold=0.5, verify_broadcast_max=0, verify_texts_max_bytes=0
    ).to_pandas()
    pd.testing.assert_frame_equal(
        broad.reset_index(drop=True), tier2.reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        broad.reset_index(drop=True), joined.reset_index(drop=True)
    )
    assert len(broad) > 0


# ---- convergence guard (ADVICE r2) ----------------------------------------


def test_connected_components_distributed_raises_when_unconverged():
    # a 12-node chain has diameter 11 — max_iters=2 cannot reach the
    # fixed point and silently-wrong labels must not be returned
    edges = pd.DataFrame({"doc_a": range(11), "doc_b": range(1, 12)})
    with pytest.raises(RuntimeError, match="did not converge"):
        D.connected_components_distributed(
            ray.data.from_pandas(edges), max_iters=2
        ).materialize()


def test_connected_components_distributed_converges_on_chain():
    edges = pd.DataFrame({"doc_a": range(11), "doc_b": range(1, 12)})
    out = (
        D.connected_components_distributed(ray.data.from_pandas(edges), max_iters=50)
        .to_pandas()
    )
    assert (out["cluster_id"] == 0).all() and len(out) == 12


# ---- hash_agg (shared one-exchange aggregation helper) ---------------------


def test_hash_agg_matches_pandas_groupby_int_and_string_keys():
    import numpy as np

    from sql_etl_pipeline_ray.stages.hashagg import hash_agg

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 200, 5_000),
            "s": rng.choice(["alpha", "beta", "gamma", "delta"], 5_000),
            "v": rng.integers(-50, 50, 5_000),
        }
    )
    ds = ray.data.from_pandas(df)

    # int partition key, multi-key grouping
    got = (
        hash_agg(ds, ["k", "s"], {"total": ("v", "sum"), "n": ("v", "size")}, 7)
        .to_pandas()
        .sort_values(["k", "s"])
        .reset_index(drop=True)
    )
    want = (
        df.groupby(["k", "s"], as_index=False)
        .agg(total=("v", "sum"), n=("v", "size"))
        .sort_values(["k", "s"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # string partition key (pd.util.hash_array path)
    got_s = (
        hash_agg(ds, ["s"], {"total": ("v", "sum")}, 5)
        .to_pandas()
        .sort_values("s")
        .reset_index(drop=True)
    )
    want_s = (
        df.groupby("s", as_index=False)
        .agg(total=("v", "sum"))
        .sort_values("s")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_s, want_s, check_dtype=False)


def test_hash_agg_map_side_combine_matches_full_row_exchange():
    """The map-side partial-agg path (r4) is result-identical to the
    full-row exchange across dense keys (batches pre-aggregate), sparse
    keys (batches pass raw-as-partials), mean decomposition, and nulls;
    non-decomposable specs (nunique) route through the fallback."""
    import numpy as np

    from sql_etl_pipeline_ray.stages.hashagg import hash_agg

    rng = np.random.default_rng(11)
    n = 20_000
    df = pd.DataFrame(
        {
            "dense": rng.integers(0, 12, n),          # repeat-heavy
            "sparse": rng.permutation(n),              # unique per batch
            "v": rng.integers(-100, 100, n),
            "f": rng.integers(0, 1000, n).astype(np.float64),
        }
    )
    df.loc[df.index % 37 == 0, "f"] = np.nan
    spec = {
        "total": ("v", "sum"), "lo": ("v", "min"), "hi": ("v", "max"),
        "rows": ("v", "size"), "nn": ("f", "count"), "avg": ("v", "mean"),
    }
    for key in ("dense", "sparse"):
        ds = ray.data.from_pandas(df).repartition(8)
        a = (
            hash_agg(ds, [key], spec, 5)
            .to_pandas().sort_values(key).reset_index(drop=True)
        )
        b = (
            hash_agg(ds, [key], spec, 5, map_side_combine=False)
            .to_pandas().sort_values(key).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        want = (
            df.groupby(key, as_index=False).agg(**spec)
            .sort_values(key).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, want, check_dtype=False)
    # non-decomposable -> fallback, still correct
    got = (
        hash_agg(ray.data.from_pandas(df), ["dense"],
                 {"u": ("sparse", "nunique")}, 3)
        .to_pandas().sort_values("dense").reset_index(drop=True)
    )
    want = (
        df.groupby("dense", as_index=False).agg(u=("sparse", "nunique"))
        .sort_values("dense").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
