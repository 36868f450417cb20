"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — per-batch numpy matmul against a
BROADCAST query matrix (``ray.put`` once, fetched in ``__init__`` of the
actor-pool stage), per-batch partial top-k, tiny driver-side merge.  The
scale path is IVF: a seeded k-means-lite codebook (trained on a sample,
driver-side, then broadcast) assigns each vector to a centroid; queries
probe only the nearest ``nprobe`` centroid buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..scale import autoscale_pool, partitions_for_bytes


def _to_matrix(col: pd.Series) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix.

    ``np.stack`` over the object ndarray iterates in C and upcasts ONCE in
    bulk — the old per-element ``np.asarray(v, float64)`` allocated 200k
    tiny arrays per 200k rows (measured 8.6 s vs 0.16 s + one astype).
    Every embedding stage (brute-force, IVF assign/probe, bucket pairs,
    codebook sampling) funnels through here."""
    vals = col.to_numpy() if hasattr(col, "to_numpy") else col
    try:
        return np.stack(vals).astype(np.float64, copy=False)
    except (ValueError, TypeError):  # ragged rows / nulls — per-row path
        return np.stack([np.asarray(v, dtype=np.float64) for v in vals])


def _ivf_cluster_count(
    emb: ray.data.Dataset, n_clusters: int | None, floor: int
) -> tuple[int, int | None]:
    """(IVF codebook size, row count) — k ≈ √n when not given explicitly.

    A fixed cluster count makes bucket size n/k grow linearly with data —
    each bucket materializes in ONE ``map_groups`` task and its pairwise
    kernel is O(|bucket|²), so k must scale with n.  k ≈ √n balances the
    two IVF cost terms (assignment O(n·k·d) vs per-bucket O((n/k)²·d)).
    ``count()`` is metadata-only for fresh parquet reads and materialized
    datasets (the callers here); the floor keeps small/test corpora on
    their round-2 behavior."""
    try:
        n = emb.count()
    except Exception:
        n = None
    if n_clusters is not None:
        return n_clusters, n
    if not n:
        return floor, n
    return int(min(65_536, max(floor, round(np.sqrt(n))))), n


def _ivf_probe_count(n_clusters: int, n: int | None, scan_rows: int = 15_000) -> int:
    """Derived ``nprobe``: enough cells to scan ~``scan_rows`` rows
    (≈1.5% of a 1M corpus, and a recall-saturating absolute floor below
    that).  A FIXED probe count over a √n codebook scans a vanishing
    fraction as data grows and silently trades recall for speed (measured
    recall@10: 0.54 at 4/1000 probes on 1M clustered vectors vs 0.99 at
    the derived 15); on tiny corpora the same rule probes every cell, so
    IVF degenerates to the exact scan instead of fragmenting the top-k
    across cells (measured 0.40 recall at 4/22 probes on 500 vectors)."""
    if not n:
        return max(4, n_clusters // 64)
    per_cell = max(1, n // n_clusters)
    return int(min(n_clusters, max(4, -(-scan_rows // per_cell))))


def _tiled_cosine_pairs(
    ids: np.ndarray,
    mn: np.ndarray,
    threshold: float,
    tile_rows: int = 4096,
) -> pd.DataFrame:
    """Exact within-bucket cosine pair generation with BOUNDED memory: the
    similarity matrix is computed in ``tile_rows``-square blocks (≤128 MB
    of float64 at the default) instead of one |bucket|² allocation, so an
    oversized/skewed IVF bucket degrades to more iterations — never to an
    OOM.  Output is identical to the single-matmul version: each unordered
    pair is visited in exactly one (i-tile ≤ j-tile) block and emitted
    min-id-first."""
    starts = list(range(0, len(ids), tile_rows))
    out_a, out_b, out_c = [], [], []
    for ti, i0 in enumerate(starts):
        mi = mn[i0 : i0 + tile_rows]
        for j0 in starts[ti:]:
            s = mi @ mn[j0 : j0 + tile_rows].T
            ii, jj = np.nonzero(s >= threshold)
            va, vb = ids[i0 + ii], ids[j0 + jj]
            c = s[ii, jj]
            if i0 == j0:
                keep = va < vb
                a, b, c = va[keep], vb[keep], c[keep]
            else:
                keep = va != vb  # duplicate ids never pair (matches dense kernel)
                va, vb, c = va[keep], vb[keep], c[keep]
                a, b = np.minimum(va, vb), np.maximum(va, vb)
            out_a.append(a)
            out_b.append(b)
            out_c.append(c)
    return pd.DataFrame(
        {
            "vec_a": np.concatenate(out_a) if out_a else np.zeros(0, np.int64),
            "vec_b": np.concatenate(out_b) if out_b else np.zeros(0, np.int64),
            "cosine": np.round(
                np.concatenate(out_c) if out_c else np.zeros(0, np.float64), 6
            ),
        }
    )


def _codebook_sample(
    emb: ray.data.Dataset,
    vec_col: str,
    sample_fraction: float,
    max_rows: int,
    seed: int,
    id_col: str = "vec_id",
) -> np.ndarray:
    """Bounded, DETERMINISTIC codebook training sample (L2-normalized).

    The sample is a hash coin on the row id — a pure function of the DATA,
    so the codebook (and every IVF result built on it) is identical across
    runs, retries and block layouts.  ``Dataset.random_sample(seed=...)``
    is NOT: the same seeded call on the same parquet input was measured
    returning different row sets between executions in one process (its
    randomness keys on execution state, not content), which made the
    ivf-blocked near-dup pair set drift run to run.  The fraction keeps
    the sample spread across blocks; ``limit(max_rows)`` bounds what the
    driver ever materializes regardless of input size."""
    thr = np.uint64(max(1, int(sample_fraction * float(1 << 32))))
    mult = np.uint64(2654435761)
    off = np.uint64(seed * 0x9E3779B9 & 0xFFFFFFFF)

    def coin(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        keep = ((ids * mult + off) % np.uint64(1 << 32)) < thr
        return t.filter(pa.array(keep))

    df = (
        emb.map_batches(coin, batch_format="pyarrow", zero_copy_batch=True)
        .limit(max_rows)
        .to_pandas()
        .sort_values(id_col)  # pin row order independent of block arrival
    )
    sample = _to_matrix(df[vec_col])
    return sample / np.maximum(np.linalg.norm(sample, axis=1)[:, None], 1e-12)


class CosineTopK:
    """Per-batch brute-force cosine scores + partial top-k.

    The query matrix ships once via ``ray.put``; each actor pulls it in
    ``__init__`` (zero-copy numpy view from the object store)."""

    def __init__(self, query_ref, k: int):
        q = ray.get(query_ref)  # (nq, dim) float64, L2-normalized
        self.q = q
        self.k = k

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        m = _to_matrix(df["embedding"])
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        m = m / norms[:, None]
        sims = m @ self.q.T  # (batch, nq)
        out = []
        for qi in range(self.q.shape[0]):
            s = sims[:, qi]
            top = np.argsort(-s, kind="stable")[: self.k]
            out.append(
                pd.DataFrame(
                    {
                        "query_id": qi,
                        "vec_id": df["vec_id"].to_numpy()[top],
                        "cosine_sim": s[top],
                    }
                )
            )
        return pd.concat(out, ignore_index=True)


def brute_force_topk(
    embeddings: ray.data.Dataset, queries: np.ndarray, k: int = 10
) -> pd.DataFrame:
    """Exact top-k neighbors for each query vector.

    Per-batch partial top-k (the combiner) keeps the driver merge at
    O(num_batches × k) rows — the full similarity matrix never leaves the
    workers."""
    qn = queries / np.maximum(np.linalg.norm(queries, axis=1)[:, None], 1e-12)
    qref = ray.put(qn)
    partials = embeddings.map_batches(
        CosineTopK, batch_format="pandas", concurrency=autoscale_pool(),
        fn_constructor_args=(qref, k),
    ).to_pandas()
    out = (
        partials.sort_values(
            ["query_id", "cosine_sim", "vec_id"], ascending=[True, False, True]
        )
        .groupby("query_id", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    out["cosine_sim"] = out["cosine_sim"].round(4)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out


def kmeans_lite(
    sample: np.ndarray, n_clusters: int, iters: int = 8, seed: int = 42
) -> np.ndarray:
    """Seeded mini k-means for the IVF codebook (numpy only, driver-side
    over a SAMPLE — the full dataset never materializes)."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(n_clusters, len(sample)), replace=False)
    work = sample.astype(np.float32)  # codebook quality is tie-insensitive
    cents = work[idx].copy()
    k = len(cents)
    # Seeded mini-batch Lloyd: each iteration assigns a bounded slice, so
    # the driver-side build is CONSTANT time in both sample size and k
    # growth (the full-sample f64 assign was 20 s at k=1000 / 65k rows —
    # 8 iters of a 65536x64 @ 64x1000 matmul on single-threaded BLAS);
    # centroid update is one scatter-add pass, not a Python loop over k
    # boolean masks.  Samples at or below the batch bound (every small /
    # test corpus) see the exact full-batch behavior.
    batch = 16_384
    for _ in range(iters):
        sub = (
            work[rng.choice(len(work), batch, replace=False)]
            if len(work) > batch
            else work
        )
        assign = np.argmax(sub @ cents.T, axis=1)
        sums = np.zeros((k, sub.shape[1]), dtype=np.float32)
        np.add.at(sums, assign, sub)
        counts = np.bincount(assign, minlength=k)
        nonempty = counts > 0
        means = sums[nonempty] / counts[nonempty, None]
        norms = np.linalg.norm(means, axis=1)
        ok = norms > 0
        upd = np.flatnonzero(nonempty)[ok]
        cents[upd] = means[ok] / norms[ok, None]
    return cents.astype(np.float64)


class IVFAssign:
    """Assign each vector to its nearest codebook centroid (broadcast)."""

    def __init__(self, cents_ref):
        self.cents = ray.get(cents_ref)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        m = _to_matrix(df["embedding"])
        norms = np.maximum(np.linalg.norm(m, axis=1), 1e-12)
        mn = m / norms[:, None]
        df = df[["vec_id"]].copy()
        df["cluster"] = np.argmax(mn @ self.cents.T, axis=1).astype(np.int64)
        return df


def ivf_topk(
    embeddings: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    n_clusters: int | None = None,
    nprobe: int | None = None,
    sample_fraction: float = 0.25,
    max_sample_rows: int = 65_536,
    seed: int = 42,
) -> pd.DataFrame:
    """Approximate top-k: probe only the ``nprobe`` closest IVF buckets.

    Fully distributed: each batch assigns its vectors to centroids
    (broadcast codebook), keeps only rows in a query's probed buckets,
    and emits a per-batch PARTIAL top-k; the driver merges
    queries x k x num_batches partial rows — the classic partial-top-k
    merge, so the embeddings dataset is never materialized.  Recall is
    tested against the brute-force baseline; at 100 TB the bucket
    assignment is a persisted column and each query touches
    nprobe/n_clusters of the data.  ``n_clusters=None`` derives ~√n from
    a metadata-cheap count (floor 16) so bucket size stays sublinear in
    the corpus instead of growing as n/16; ``nprobe=None`` derives a
    scan-volume-targeted probe count (``_ivf_probe_count``)."""
    n_clusters, n_rows = _ivf_cluster_count(embeddings, n_clusters, floor=16)
    if nprobe is None:
        nprobe = _ivf_probe_count(n_clusters, n_rows)
    sample = _codebook_sample(
        embeddings, "embedding", sample_fraction, max_sample_rows, seed
    )
    cents = kmeans_lite(sample, n_clusters, seed=seed)
    qn = queries / np.maximum(np.linalg.norm(queries, axis=1)[:, None], 1e-12)
    probe = np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe]
    state_ref = ray.put((cents, qn, probe))

    class ProbeScore:
        def __init__(self):
            self.cents, self.qn, self.probe = ray.get(state_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            m = _to_matrix(df["embedding"])
            m = m / np.maximum(np.linalg.norm(m, axis=1), 1e-12)[:, None]
            cl = np.argmax(m @ self.cents.T, axis=1)
            ids = df["vec_id"].to_numpy()
            parts = []
            for qi in range(len(self.qn)):
                mask = np.isin(cl, self.probe[qi])
                if not mask.any():
                    continue
                s = m[mask] @ self.qn[qi]
                kk = min(k, len(s))
                top = np.argpartition(-s, kk - 1)[:kk]
                parts.append(
                    pd.DataFrame(
                        {"query_id": qi, "vec_id": ids[mask][top], "cosine_sim": s[top]}
                    )
                )
            if not parts:
                return pd.DataFrame(
                    {
                        "query_id": pd.Series(dtype=np.int64),
                        "vec_id": pd.Series(dtype=np.int64),
                        "cosine_sim": pd.Series(dtype=np.float64),
                    }
                )
            return pd.concat(parts, ignore_index=True)

    partial = embeddings.map_batches(
        ProbeScore, batch_format="pandas", concurrency=autoscale_pool()
    ).to_pandas()  # <= queries x k x num_batches rows — tiny by construction
    out = []
    for qi in range(len(qn)):
        g = partial[partial["query_id"] == qi].sort_values(
            ["cosine_sim", "vec_id"], ascending=[False, True], kind="mergesort"
        )[:k]
        out.append(
            pd.DataFrame(
                {
                    "query_id": qi,
                    "vec_id": g["vec_id"].to_numpy(),
                    "cosine_sim": np.round(g["cosine_sim"].to_numpy(), 4),
                    "rank": np.arange(1, len(g) + 1),
                }
            )
        )
    return pd.concat(out, ignore_index=True)


def embedding_near_dups(
    emb: ray.data.Dataset,
    all_ids: np.ndarray,
    all_vecs: np.ndarray,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Embedding-cosine near-duplicate pairs: brute-force exact variant.

    The comparison matrix is normalized once on the driver and broadcast via
    ``ray.put``; each batch does one float64 matmul against it and emits
    (vec_a < vec_b) pairs with cosine ≥ threshold.  Compute is O(n²·d) but
    fully data-parallel over the left side.

    Scale notes: brute force assumes the broadcast side fits in worker
    memory (n·d·8 bytes; ~0.5 GB at 1M×64).  Beyond that, block candidates
    first — IVF (``ivf_topk``'s assignment stage) or LSH on random
    hyperplanes (``SimHasher``'s trick applied to embeddings) — and run this
    exact kernel per block."""
    norms = np.linalg.norm(all_vecs, axis=1, keepdims=True)
    nm = all_vecs / np.where(norms == 0, 1.0, norms)
    ref = ray.put((np.asarray(all_ids), nm))

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        bids, bm = ray.get(ref)
        a = _to_matrix(df[vec_col])
        an = np.linalg.norm(a, axis=1, keepdims=True)
        a = a / np.where(an == 0, 1.0, an)
        s = a @ bm.T
        aids = df[id_col].to_numpy()
        ii, jj = np.nonzero(s >= threshold)
        va, vb = aids[ii], bids[jj]
        keep = va < vb
        return pd.DataFrame(
            {
                "vec_a": va[keep],
                "vec_b": vb[keep],
                "cosine": np.round(s[ii, jj][keep], 6),
            }
        )

    return emb.map_batches(pairs, batch_format="pandas")


def incremental_embedding_near_dups(
    new_emb: ray.data.Dataset,
    existing_emb: ray.data.Dataset,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """INCREMENTAL embedding near-dup gate: cosine pairs between an
    incoming increment (``new_emb``) and the already-ingested corpus
    (``existing_emb``) — the vector sibling of
    ``dedup.incremental_minhash_pairs``, closing the incremental family.

    The broadcast side is the INCREMENT, not the corpus: the new vectors
    normalize once into one ``ray.put`` matrix (an increment is small by
    definition — m·d·8 bytes), and the ingested corpus streams through in
    batches, each doing one matmul against it.  One linear corpus scan,
    NO shuffle, no corpus-sized broadcast — per-increment cost is
    O(corpus·m·d) flops streaming, which is the right shape when m ≪ n;
    for corpus-scale increments run the full ``embedding_near_dups_ivf``
    instead.  Requires vec_ids unique across sides.

    Returns (existing_id, new_id, cosine) rows with cosine ≥ threshold —
    exactly the full-corpus brute pair set restricted to cross-side pairs
    (same normalize-then-matmul kernel as ``embedding_near_dups``)."""
    new_df = new_emb.select_columns([id_col, vec_col]).to_pandas()  # bounded: the increment
    nm = _to_matrix(new_df[vec_col])
    norms = np.linalg.norm(nm, axis=1, keepdims=True)
    nm = nm / np.where(norms == 0, 1.0, norms)
    ref = ray.put((new_df[id_col].to_numpy(), nm))

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        bids, bm = ray.get(ref)
        a = _to_matrix(df[vec_col])
        an = np.linalg.norm(a, axis=1, keepdims=True)
        a = a / np.where(an == 0, 1.0, an)
        s = a @ bm.T
        aids = df[id_col].to_numpy()
        ii, jj = np.nonzero(s >= threshold)
        return pd.DataFrame(
            {
                "existing_id": aids[ii],
                "new_id": bids[jj],
                "cosine": np.round(s[ii, jj], 6),
            }
        )

    return existing_emb.map_batches(pairs, batch_format="pandas")


def embedding_near_dups_ivf(
    emb: ray.data.Dataset,
    threshold: float = 0.3,
    n_clusters: int | None = None,
    sample_fraction: float = 0.5,
    max_sample_rows: int = 65_536,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tile_rows: int = 4096,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Embedding near-dup pairs, IVF-blocked — the SCALE path for
    ``embedding_near_dups``.

    Vectors are bucketed by their TOP-2 k-means centroids (multi-probe —
    one broadcast codebook, each vector lands in two buckets), then the
    exact pairwise kernel runs WITHIN each bucket via
    ``groupby(cluster).map_groups`` and duplicate pairs (found in both
    shared buckets) are collapsed by a final pair-key groupby — compute
    drops from O(n²) to Σ O(|bucket|²) at 2× storage.  Still approximate:
    a pair sharing NO bucket is missed (recall vs the brute-force baseline
    asserted in tests; tune n_clusters/probes for the recall-cost trade).
    ``n_clusters=None`` derives ~√n (floor 8 — test-scale corpora keep
    their round-2 buckets) so bucket size stays √n-ish instead of n/8;
    inside a bucket the pairwise kernel is TILED (``_tiled_cosine_pairs``)
    so a skewed bucket costs iterations, never an OOM."""
    n_clusters, _ = _ivf_cluster_count(emb, n_clusters, floor=8)
    num_partitions = num_partitions or partitions_for_bytes(None)
    sample = _codebook_sample(emb, vec_col, sample_fraction, max_sample_rows, seed)
    cents_ref = ray.put(kmeans_lite(sample, n_clusters, seed=seed))

    class AssignKeepVec:
        def __init__(self):
            self.cents = ray.get(cents_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            m = _to_matrix(df[vec_col])
            mn = m / np.maximum(np.linalg.norm(m, axis=1), 1e-12)[:, None]
            sims = mn @ self.cents.T
            top2 = np.argsort(-sims, axis=1)[:, :2]
            out = pd.concat(
                [df[[id_col, vec_col]].copy(), df[[id_col, vec_col]].copy()],
                ignore_index=True,
            )
            out["cluster"] = np.concatenate(
                [top2[:, 0], top2[:, 1]]
            ).astype(np.int64)
            return out

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = _to_matrix(g[vec_col])
        m = m / np.maximum(np.linalg.norm(m, axis=1), 1e-12)[:, None]
        return _tiled_cosine_pairs(
            g[id_col].to_numpy(), m, threshold, tile_rows=tile_rows
        )

    def add_pk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_gp"] = (
            df["vec_a"].to_numpy(np.int64) * 31 + df["vec_b"].to_numpy(np.int64)
        ) % num_partitions
        return df

    def dedupe_part(g: pd.DataFrame) -> pd.DataFrame:
        # one vectorized drop_duplicates per pair-hash PARTITION, not one
        # Python call per duplicate pair
        return g.drop_duplicates(["vec_a", "vec_b"]).drop(columns=["_gp"])

    return (
        emb.map_batches(
            AssignKeepVec, batch_format="pandas", concurrency=autoscale_pool()
        )
        .groupby("cluster")
        .map_groups(bucket_pairs, batch_format="pandas")
        .map_batches(add_pk, batch_format="pandas")
        .groupby("_gp")
        .map_groups(dedupe_part, batch_format="pandas")
    )


def _lsh_planes(d: int, n_bits: int, n_tables: int, seed: int) -> np.ndarray:
    """The fixed random-hyperplane matrix (d × L·b) — a pure function of
    (d, n_bits, n_tables, seed), so signatures computed at ingest time
    and at probe time agree by construction."""
    return np.random.default_rng(seed).standard_normal((d, n_tables * n_bits))


def _lsh_pack(m: np.ndarray, planes: np.ndarray, n_bits: int, n_tables: int) -> np.ndarray:
    """(n, d) L2-normalized rows → (n, L) packed int64 table keys."""
    bits = (m @ planes) > 0
    weights = 1 << np.arange(n_bits, dtype=np.int64)
    return bits.reshape(len(m), n_tables, n_bits).astype(np.int64) @ weights


def lsh_signatures(
    embeddings: ray.data.Dataset,
    n_bits: int = 6,
    n_tables: int = 32,
    seed: int = 42,
    sig_col: str = "lsh_sig",
) -> ray.data.Dataset:
    """Append the persisted LSH signature column (``list<int64>`` of
    length ``n_tables``) — write this ONCE at ingest and every later
    ``lsh_topk`` probe skips the d × L·b matmul per row (measured: the
    matmul is the dominant probe cost at few queries, see BASELINE.md).
    Same (n_bits, n_tables, seed) must be used at probe time; signatures
    are a pure function of the vector and those parameters."""

    def add_sig(df: pd.DataFrame) -> pd.DataFrame:
        m = _to_matrix(df["embedding"])
        m = m / np.maximum(np.linalg.norm(m, axis=1), 1e-12)[:, None]
        planes = _lsh_planes(m.shape[1], n_bits, n_tables, seed)
        sig = _lsh_pack(m, planes, n_bits, n_tables)
        out = df.copy()
        out[sig_col] = list(sig)
        return out

    return embeddings.map_batches(add_sig, batch_format="pandas")


def lsh_topk(
    embeddings: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    n_bits: int = 6,
    n_tables: int = 32,
    seed: int = 42,
    sig_col: str = "lsh_sig",
) -> pd.DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH (Charikar,
    STOC 2002) — the LSH-bucketed sibling of ``ivf_topk`` with NO
    training pass: ``n_tables`` independent signatures of ``n_bits``
    sign bits each; a row is a candidate for a query iff they collide
    in ANY table (classic Indyk-Motwani OR-of-ANDs), and candidates are
    scored exactly with a per-batch partial top-k.

    vs IVF: no codebook sample/k-means (good when the corpus changes
    faster than a codebook should), per-row cost is one (d × L·b)
    matmul, and the collision probability (1-θ/π)^b per table is known
    in closed form instead of depending on cluster geometry.  The
    signature columns persist naturally (int32 per table) — at 100 TB
    you'd write them once at ingest and probe by signature equality.
    Tune (n_bits, n_tables) to the corpus's neighbor angles: collision
    prob per table is (1-θ/π)^n_bits, so tight near-dup corpora
    (cos ≥ 0.9, θ ≤ 0.45) want LONG signatures (n_bits 14-16, n_tables
    ~8 — selective buckets, n/2^b candidates each), while the synthetic
    test embeddings' true neighbors sit near θ ≈ 1.25 and need SHORT
    ones (the 6/32 defaults, expected recall ≈ 0.9).  Deterministic for
    a fixed seed; recall pinned vs brute force in tests.

    If the batch already carries a ``sig_col`` column (written at ingest
    by ``lsh_signatures`` with the same parameters), the per-row
    signature matmul is skipped — the persisted-index probe path."""
    d = queries.shape[1]
    planes = _lsh_planes(d, n_bits, n_tables, seed)
    qn = queries / np.maximum(np.linalg.norm(queries, axis=1)[:, None], 1e-12)
    qsig = _lsh_pack(qn, planes, n_bits, n_tables)  # (Q, L)
    state_ref = ray.put((planes, qn, qsig))

    class LshScore:
        def __init__(self):
            self.planes, self.qn, self.qsig = ray.get(state_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            m = _to_matrix(df["embedding"])
            m = m / np.maximum(np.linalg.norm(m, axis=1), 1e-12)[:, None]
            if sig_col in df.columns:  # persisted-index probe path
                sig = np.stack(df[sig_col].to_numpy()).astype(np.int64)
            else:
                sig = _lsh_pack(m, self.planes, n_bits, n_tables)
            ids = df["vec_id"].to_numpy()
            parts = []
            for qi in range(len(self.qn)):
                # collide in ANY table → candidate (vectorized OR)
                mask = (sig == self.qsig[qi]).any(axis=1)
                if not mask.any():
                    continue
                s = m[mask] @ self.qn[qi]
                kk = min(k, len(s))
                top = np.argpartition(-s, kk - 1)[:kk]
                parts.append(
                    pd.DataFrame(
                        {"query_id": qi, "vec_id": ids[mask][top], "cosine_sim": s[top]}
                    )
                )
            if not parts:
                return pd.DataFrame(
                    {
                        "query_id": pd.Series(dtype=np.int64),
                        "vec_id": pd.Series(dtype=np.int64),
                        "cosine_sim": pd.Series(dtype=np.float64),
                    }
                )
            return pd.concat(parts, ignore_index=True)

    partial = embeddings.map_batches(
        LshScore, batch_format="pandas", concurrency=autoscale_pool()
    ).to_pandas()  # <= queries x k x num_batches rows — tiny by construction
    out = []
    for qi in range(len(qn)):
        g = partial[partial["query_id"] == qi].sort_values(
            ["cosine_sim", "vec_id"], ascending=[False, True], kind="mergesort"
        )[:k]
        out.append(
            pd.DataFrame(
                {
                    "query_id": qi,
                    "vec_id": g["vec_id"].to_numpy(),
                    "cosine_sim": np.round(g["cosine_sim"].to_numpy(), 4),
                    "rank": np.arange(1, len(g) + 1),
                }
            )
        )
    return pd.concat(out, ignore_index=True)


# ---------------------------------------------------------------------------
# Integer-exact (driver-legible) deterministic index variants
# ---------------------------------------------------------------------------
#
# The RNG-seeded IVF/LSH paths above are deterministic ACROSS RUNS but not
# replayable by a SQL oracle (PCG64 draws, float32 mini-batch Lloyd's).
# These ``*_q`` variants make the whole index an integer function of the
# data: vectors quantize to int64 fixed-point (round-half-away x 2^20 —
# the convention DuckDB's ``round`` reproduces bit-exactly), the coarse
# quantizer is the integer Lloyd's of ``stages/clustering.kmeans_q_fit``,
# LSH planes are integer differences of anchor vectors, and cosine is
# computed through ONE float path both engines share bit-for-bit:
# ``CAST(int_dot AS DOUBLE) / sqrt(CAST(na2 AS DOUBLE) * CAST(nb2 AS
# DOUBLE))`` (int64→double conversion, one multiply, one sqrt, one divide
# — all IEEE-754 correctly rounded, so numpy and DuckDB agree exactly).
# Orderings and thresholds compare those bit-identical values, so top-k
# membership, ranks and pair sets are hash-checkable by the correctness
# driver — no float tie luck involved.


def _exact_cos(dot: np.ndarray, na2: np.ndarray, nb2: np.ndarray) -> np.ndarray:
    """Bit-reproducible cosine from integer dot/norms (see block note)."""
    return dot.astype(np.float64) / np.sqrt(
        na2.astype(np.float64) * nb2.astype(np.float64)
    )


def _round_half_away(x: np.ndarray, digits: int) -> np.ndarray:
    import pyarrow.compute as pc

    return (
        pc.round(pa.array(np.asarray(x, np.float64)), digits,
                 round_mode="half_towards_infinity")
        .to_numpy(zero_copy_only=False)
    )


def _lowest_id_qvecs(
    emb: ray.data.Dataset, n: int, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray]:
    """(ids, quantized vectors) of the n lowest ids — block-local
    nsmallest + driver merge, never a global sort."""
    from .clustering import _quantize, _stack

    rows = (
        emb.map_batches(lambda df: df.nsmallest(n, id_col), batch_format="pandas")
        .to_pandas()
        .nsmallest(n, id_col)
        .sort_values(id_col)
    )
    return rows[id_col].to_numpy(np.int64), _quantize(_stack(rows[vec_col]))


def ivf_topk_q(
    emb: ray.data.Dataset,
    n_queries: int = 3,
    k: int = 10,
    n_clusters: int = 16,
    iters: int = 3,
    nprobe: int = 6,
) -> pd.DataFrame:
    """IVF top-k with the integer coarse quantizer: buckets = final
    ``kmeans_q_fit`` assignment, probe = the ``nprobe``
    integer-nearest centroids per query (queries are the ``n_queries``
    lowest-id vectors), candidates score with the bit-reproducible
    cosine, top-k ordered by (cosine DESC, vec_id ASC).  Distributed
    exactly like :func:`ivf_topk` (broadcast state, per-batch partial
    top-k, tiny driver merge)."""
    from .clustering import _qd2, _quantize, _stack, kmeans_q_fit

    qcents, _ = kmeans_q_fit(emb, k=n_clusters, iters=iters)
    qids, qq = _lowest_id_qvecs(emb, n_queries)
    d2 = _qd2(qq, qcents)
    # nprobe nearest centroids, ties -> lowest cluster index
    probe = np.argsort(d2, axis=1, kind="stable")[:, :nprobe]
    qn2 = (qq * qq).sum(axis=1)
    state = ray.put((qcents, qq, probe, qn2))

    class ProbeScoreQ:
        def __init__(self):
            self.qcents, self.qq, self.probe, self.qn2 = ray.get(state)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            qx = _quantize(_stack(df["embedding"]))
            cl = np.argmin(_qd2(qx, self.qcents), axis=1)
            ids = df["vec_id"].to_numpy(np.int64)
            x2 = (qx * qx).sum(axis=1)
            parts = []
            for qi in range(len(self.qq)):
                mask = np.isin(cl, self.probe[qi])
                if not mask.any():
                    continue
                dot = qx[mask] @ self.qq[qi]
                cos = _exact_cos(dot, x2[mask], self.qn2[qi])
                kk = min(k, len(cos))
                sel = np.lexsort((ids[mask], -cos))[:kk]
                parts.append(pd.DataFrame({
                    "query_id": qi, "vec_id": ids[mask][sel],
                    "cosine_sim": cos[sel],
                }))
            if not parts:
                return pd.DataFrame({
                    "query_id": pd.Series(dtype=np.int64),
                    "vec_id": pd.Series(dtype=np.int64),
                    "cosine_sim": pd.Series(dtype=np.float64),
                })
            return pd.concat(parts, ignore_index=True)

    partial = emb.map_batches(
        ProbeScoreQ, batch_format="pandas", concurrency=autoscale_pool()
    ).to_pandas()
    out = []
    for qi in range(len(qq)):
        g = partial[partial["query_id"] == qi].sort_values(
            ["cosine_sim", "vec_id"], ascending=[False, True], kind="mergesort"
        )[:k]
        out.append(pd.DataFrame({
            "query_id": np.int64(qi),
            "vec_id": g["vec_id"].to_numpy(np.int64),
            "cosine_sim": _round_half_away(g["cosine_sim"].to_numpy(), 4),
            "rank": np.arange(1, len(g) + 1),
        }))
    return pd.concat(out, ignore_index=True)


def lsh_topk_q(
    emb: ray.data.Dataset,
    n_queries: int = 3,
    k: int = 10,
    n_planes: int = 4,
) -> pd.DataFrame:
    """LSH top-k with data-derived integer hyperplanes: plane m is the
    quantized difference of anchor vectors 2m and 2m+1 (the 2*n_planes
    lowest ids), a vector's bucket is the sign bitmap of its integer
    dots with the planes, and a query probes every bucket within
    Hamming distance 1 of its own.  Candidates score with the
    bit-reproducible cosine; top-k by (cosine DESC, vec_id ASC)."""
    from .clustering import _quantize, _stack

    aids, av = _lowest_id_qvecs(emb, 2 * n_planes)
    planes = av[0::2] - av[1::2]  # (n_planes, d) int64
    qids, qq = _lowest_id_qvecs(emb, n_queries)
    weights = (np.int64(1) << np.arange(n_planes, dtype=np.int64))
    qbuck = ((qq @ planes.T) > 0).astype(np.int64) @ weights
    qn2 = (qq * qq).sum(axis=1)
    state = ray.put((planes, qq, qbuck, qn2, weights))

    class LshScoreQ:
        def __init__(self):
            (self.planes, self.qq, self.qbuck, self.qn2,
             self.weights) = ray.get(state)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            qx = _quantize(_stack(df["embedding"]))
            buck = ((qx @ self.planes.T) > 0).astype(np.int64) @ self.weights
            ids = df["vec_id"].to_numpy(np.int64)
            x2 = (qx * qx).sum(axis=1)
            parts = []
            # vectorized popcount: buckets live in [0, 2^n_planes)
            table = np.array(
                [bin(i).count("1") for i in range(1 << len(self.planes))],
                dtype=np.int64,
            )
            for qi in range(len(self.qq)):
                ham = table[np.bitwise_xor(buck, self.qbuck[qi])]
                mask = ham <= 1
                if not mask.any():
                    continue
                dot = qx[mask] @ self.qq[qi]
                cos = _exact_cos(dot, x2[mask], self.qn2[qi])
                kk = min(k, len(cos))
                sel = np.lexsort((ids[mask], -cos))[:kk]
                parts.append(pd.DataFrame({
                    "query_id": qi, "vec_id": ids[mask][sel],
                    "cosine_sim": cos[sel],
                }))
            if not parts:
                return pd.DataFrame({
                    "query_id": pd.Series(dtype=np.int64),
                    "vec_id": pd.Series(dtype=np.int64),
                    "cosine_sim": pd.Series(dtype=np.float64),
                })
            return pd.concat(parts, ignore_index=True)

    partial = emb.map_batches(
        LshScoreQ, batch_format="pandas", concurrency=autoscale_pool()
    ).to_pandas()
    out = []
    for qi in range(len(qq)):
        g = partial[partial["query_id"] == qi].sort_values(
            ["cosine_sim", "vec_id"], ascending=[False, True], kind="mergesort"
        )[:k]
        out.append(pd.DataFrame({
            "query_id": np.int64(qi),
            "vec_id": g["vec_id"].to_numpy(np.int64),
            "cosine_sim": _round_half_away(g["cosine_sim"].to_numpy(), 4),
            "rank": np.arange(1, len(g) + 1),
        }))
    return pd.concat(out, ignore_index=True)


def embedding_near_dups_ivf_q(
    emb: ray.data.Dataset,
    threshold: float = 0.3,
    n_clusters: int = 8,
    iters: int = 3,
) -> pd.DataFrame:
    """IVF-blocked near-dup pairs on the integer coarse quantizer:
    within-bucket exact pairs at cosine similarity ≥ ``threshold`` (the
    same convention as :func:`embedding_near_dups`), compared on the
    bit-reproducible value.  Buckets
    ship through a ``groupby(cluster).map_groups`` — the partitioning
    assumption is the usual IVF one, k ≈ √n keeps per-bucket work
    O((n/k)²) bounded."""
    from .clustering import _qd2, _quantize, _stack, kmeans_q_fit

    qcents, _ = kmeans_q_fit(emb, k=n_clusters, iters=iters)
    cref = ray.put(qcents)
    cut = float(threshold)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        qx = _quantize(_stack(df["embedding"]))
        return pd.DataFrame({
            "cluster": np.argmin(_qd2(qx, ray.get(cref)), axis=1),
            "vec_id": df["vec_id"].to_numpy(np.int64),
            "qvec": [v.tobytes() for v in qx],
        })

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({
                "vec_a": pd.Series(dtype=np.int64),
                "vec_b": pd.Series(dtype=np.int64),
                "cosine": pd.Series(dtype=np.float64),
            })
        g = g.sort_values("vec_id")
        ids = g["vec_id"].to_numpy(np.int64)
        qx = np.vstack([np.frombuffer(b, dtype=np.int64) for b in g["qvec"]])
        n2 = (qx * qx).sum(axis=1)
        dot = qx @ qx.T
        cos = _exact_cos(dot, n2[:, None], n2[None, :])
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = cos[ia, ib] >= cut
        return pd.DataFrame({
            "vec_a": ids[ia[keep]],
            "vec_b": ids[ib[keep]],
            "cosine": _round_half_away(cos[ia, ib][keep], 6),
        })

    out = (
        emb.map_batches(tag, batch_format="pandas")
        .groupby("cluster")
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    if not len(out):
        # stable schema when every bucket is pair-free (Ray drops the
        # schema of an all-empty map_groups)
        return pd.DataFrame({
            "vec_a": pd.Series(dtype=np.int64),
            "vec_b": pd.Series(dtype=np.int64),
            "cosine": pd.Series(dtype=np.float64),
        })
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


def ann_pq_topk_q(
    emb: ray.data.Dataset,
    n_queries: int = 3,
    k: int = 10,
    m: int = 8,
    kc: int = 16,
    iters: int = 3,
    dim: int = 64,
    rerank: int = 50,
) -> pd.DataFrame:
    """Product-quantization ANN, integer-exact end to end.

    The 100-TB storage story for embeddings: each d-dim vector compresses
    to ``m`` uint8 codes (one integer-k-means codeword id per subspace —
    64 float32 dims → 8 bytes, 32× smaller), and queries scan CODES, not
    vectors, via the classic asymmetric-distance computation: per query,
    an (m × kc) table of integer squared distances from the query's
    subvector to every codeword, then ``dist(v) = Σ_s table[s, code_s(v)]``
    — pure int64 arithmetic, so ranking ties and all are bit-identical
    in the DuckDB oracle (Jégou et al., "Product Quantization for
    Nearest Neighbor Search", TPAMI 2011 — the public-domain method,
    realized on this engine's integer-exact k-means).

    Codebooks train as ``m`` independent :func:`clustering.kmeans_q_fit`
    runs with ``dim_slice`` (min-id init, fixed iters — the SQL-unrollable
    recipe); the per-subspace ASSIGNMENTS are the codes, so encoding is
    the training by-product here (at scale: persist the code columns at
    ingest, the way ``lsh_signatures`` persists sign bitmaps).

    ``rerank``: the production PQ pattern — the code scan shortlists
    ``rerank`` candidates by ADC (ties → lowest id), then ONE pass over
    the data re-scores just those candidates with the exact integer
    squared distance on the full quantized vectors (at scale: ``rerank``
    point reads).  Both stages are pure int64, so the final (query_id,
    vec_id, qd2, rank) output is bit-identical in the DuckDB oracle."""
    from .clustering import _qd2, kmeans_q_fit

    sub = dim // m
    qcents_s, codes_cols, ids = [], [], None
    for s in range(m):
        qc, assign = kmeans_q_fit(
            emb, k=kc, iters=iters, dim_slice=(s * sub, (s + 1) * sub)
        )
        qcents_s.append(qc)
        codes_cols.append(assign["cluster"].to_numpy())
        if ids is None:
            ids = assign["vec_id"].to_numpy(np.int64)
    codes = np.stack(codes_cols, axis=1)  # (n, m) small ints
    qids, qq = _lowest_id_qvecs(emb, n_queries)
    shortlists = {}
    for qi in range(len(qq)):
        dist = np.zeros(len(ids), dtype=np.int64)
        for s in range(m):
            table = _qd2(
                qq[qi : qi + 1, s * sub : (s + 1) * sub], qcents_s[s]
            )[0]
            dist += table[codes[:, s]]
        shortlists[qi] = ids[np.lexsort((ids, dist))[:rerank]]
    # exact-rerank pass: broadcast the candidate sets, one scan, integer d2
    from .clustering import _quantize, _stack

    cand_all = np.unique(np.concatenate(list(shortlists.values())))
    state = ray.put((cand_all, qq))

    def rescore(df: pd.DataFrame) -> pd.DataFrame:
        cands, qqv = ray.get(state)
        vids = df["vec_id"].to_numpy(np.int64)
        mask = np.isin(vids, cands)
        if not mask.any():
            return pd.DataFrame({
                "vec_id": pd.Series(dtype=np.int64),
                "query_id": pd.Series(dtype=np.int64),
                "qd2": pd.Series(dtype=np.int64),
            })
        qx = _quantize(_stack(df.loc[mask, "embedding"]))
        d2 = _qd2(qx, qqv)  # (n_cand_in_batch, n_queries)
        n, nq = d2.shape
        return pd.DataFrame({
            "vec_id": np.repeat(vids[mask], nq),
            "query_id": np.tile(np.arange(nq, dtype=np.int64), n),
            "qd2": d2.ravel(),
        })

    scored = emb.map_batches(rescore, batch_format="pandas").to_pandas()
    out = []
    for qi in range(len(qq)):
        sl = set(shortlists[qi].tolist())
        g = scored[
            (scored["query_id"] == qi) & scored["vec_id"].isin(sl)
        ].sort_values(["qd2", "vec_id"], kind="mergesort")[:k]
        out.append(pd.DataFrame({
            "query_id": np.int64(qi),
            "vec_id": g["vec_id"].to_numpy(np.int64),
            "qd2": g["qd2"].to_numpy(np.int64),
            "rank": np.arange(1, len(g) + 1),
        }))
    return pd.concat(out, ignore_index=True)
