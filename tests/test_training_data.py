"""Training-data operator tests: near-dup oracles, ANN recall, multimodal
plumbing, fingerprint determinism — the non-SQL-expressible ops get their
correctness pinned here instead of the DuckDB oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from sql_etl_pipeline_ray.stages import dedup as D
from sql_etl_pipeline_ray.stages import multimodal as MM
from sql_etl_pipeline_ray.stages import similarity as SIM
from sql_etl_pipeline_ray.stages.text import Fingerprint, LangId, TokenStats

SF = "/root/testdata/sf0.001"


def _corpus_with_near_dups():
    base = [
        "the quick brown fox jumps over the lazy dog while rain falls on the plain",
        "completely different text about database engines and vectorized execution plans",
        "streaming shuffle backpressure actor pool arrow buffers zero copy batches",
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi",
    ]
    docs = []
    for i, t in enumerate(base):
        docs.append((i * 10, t))
        # near-dup: one word changed
        docs.append((i * 10 + 1, t.replace(t.split()[2], "REPLACED")))
        # exact dup
        docs.append((i * 10 + 2, t))
    return pd.DataFrame(docs, columns=["doc_id", "text"])


def brute_force_jaccard_pairs(df, k=3, threshold=0.5):
    h = D.ShingleMinHash(shingle_k=k)
    out = []
    rows = list(df.itertuples(index=False))
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            sa = set(h.shingles(rows[i].text).tolist())
            sb = set(h.shingles(rows[j].text).tolist())
            jac = len(sa & sb) / max(1, len(sa | sb))
            if jac >= threshold:
                out.append((rows[i].doc_id, rows[j].doc_id))
    return sorted(out)


def test_minhash_lsh_finds_near_dups_no_false_positives():
    df = _corpus_with_near_dups()
    ds = ray.data.from_pandas(df)
    got = D.minhash_lsh_pairs(ds, jaccard_threshold=0.5)
    got_pairs = sorted(zip(got["a"], got["b"]))
    want = brute_force_jaccard_pairs(df)
    # verified pairs are a subset of truth (LSH may miss, never invent)
    assert set(got_pairs) <= set(want)
    # exact dups must always be found (identical signatures in every band)
    assert (0, 2) in got_pairs and (10, 12) in got_pairs
    # near-dups (1 word changed) should be caught at this threshold
    recall = len(set(got_pairs) & set(want)) / len(want)
    assert recall >= 0.7, f"recall {recall}: {got_pairs} vs {want}"


def test_simhash_exact_dups_distance_zero():
    df = _corpus_with_near_dups()
    got = D.simhash_near_dups(ray.data.from_pandas(df), max_hamming=3)
    pairs = set(zip(got["a"], got["b"]))
    assert (0, 2) in pairs and (10, 12) in pairs
    d0 = got[(got["a"] == 0) & (got["b"] == 2)]["hamming"].iloc[0]
    assert d0 == 0


def test_incremental_minhash_cross_side_identity():
    """incremental_minhash_pairs == full-corpus minhash_lsh_pairs
    restricted to (existing, new) cross-side pairs — signatures are
    per-doc, so the split cannot change banding."""
    df = _corpus_with_near_dups()
    existing = df[df["doc_id"] % 2 == 0]
    new = df[df["doc_id"] % 2 == 1]
    got = D.incremental_minhash_pairs(
        ray.data.from_pandas(new),
        ray.data.from_pandas(existing),
        jaccard_threshold=0.5,
    )
    full = D.minhash_lsh_pairs(ray.data.from_pandas(df), jaccard_threshold=0.5)
    want = set()
    for a, b, j in zip(full["a"], full["b"], full["jaccard"]):
        # orient (existing=even, new=odd); drop same-side pairs
        if a % 2 == 0 and b % 2 == 1:
            want.add((a, b, j))
        elif a % 2 == 1 and b % 2 == 0:
            want.add((b, a, j))
    assert set(zip(got["existing_id"], got["new_id"], got["jaccard"])) == want
    # the planted near-dup (i*10, i*10+1) is a cross-side pair — found
    assert (0, 1) in set(zip(got["existing_id"], got["new_id"]))


def test_incremental_minhash_persisted_bands_equal_recompute(tmp_path):
    """Feeding the ingested side's PERSISTED band table (written at ingest
    time, round-tripped through Parquet) gives identical pairs to deriving
    bands from the texts in-flight — the honest-incremental path."""
    df = _corpus_with_near_dups()
    existing = df[df["doc_id"] % 2 == 0]
    new = df[df["doc_id"] % 2 == 1]
    band_dir = str(tmp_path / "bands")
    D.minhash_band_rows(ray.data.from_pandas(existing)).write_parquet(band_dir)
    got = D.incremental_minhash_pairs(
        ray.data.from_pandas(new),
        ray.data.from_pandas(existing),
        jaccard_threshold=0.5,
        existing_bands=ray.data.read_parquet(band_dir),
    )
    want = D.incremental_minhash_pairs(
        ray.data.from_pandas(new),
        ray.data.from_pandas(existing),
        jaccard_threshold=0.5,
    )
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 0


def test_incremental_minhash_disjoint_sides_empty():
    df = _corpus_with_near_dups()
    # increment shares nothing with the corpus → empty, schema stable
    new = pd.DataFrame(
        {"doc_id": [900], "text": ["unrelated words nowhere else present at all"]}
    )
    got = D.incremental_minhash_pairs(
        ray.data.from_pandas(new),
        ray.data.from_pandas(df[df["doc_id"] % 2 == 0]),
        jaccard_threshold=0.5,
    )
    assert list(got.columns) == ["existing_id", "new_id", "jaccard"]
    assert len(got) == 0


def _brute_hot_passages(df, window_k, min_docs):
    wins = {}
    for r in df.itertuples(index=False):
        words = r.text.split(" ")
        s = {
            " ".join(words[i : i + window_k])
            for i in range(len(words) - window_k + 1)
        }
        if s:
            wins[r.doc_id] = s
    from collections import Counter

    cnt = Counter(w for s in wins.values() for w in s)
    rows = []
    for doc_id, s in sorted(wins.items()):
        n_hot = sum(1 for w in s if cnt[w] >= min_docs)
        rows.append((doc_id, len(s), n_hot))
    return rows


def test_hot_passage_stats_matches_brute_force():
    boiler = "this license text is repeated verbatim across many files here"
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                f"unique alpha content one {boiler}",
                f"{boiler} and some unique beta tail words",
                "totally unrelated gamma document with its own words only",
                f"unique delta head {boiler} unique delta tail",
                "shrt",  # 1 word < window_k → no row
            ],
        }
    )
    got = (
        D.hot_passage_stats(ray.data.from_pandas(df), window_k=4, min_docs=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _brute_hot_passages(df, 4, 2)
    assert list(zip(got["doc_id"], got["n_windows"], got["n_hot"])) == want
    # the boilerplate-carrying docs have hot windows; the unique doc none
    by_id = dict(zip(got["doc_id"], got["n_hot"]))
    assert by_id[1] > 0 and by_id[2] > 0 and by_id[4] > 0 and by_id[3] == 0
    assert 5 not in by_id  # shorter than the window → no windows, no row
    # hot_frac is the rounded ratio
    assert np.allclose(
        got["hot_frac"], (got["n_hot"] / got["n_windows"]).round(6), atol=1e-9
    )


def test_incremental_embedding_cross_side_identity():
    """incremental_embedding_near_dups == brute full-corpus pairs
    restricted to cross-parity, reoriented (existing, new)."""
    rng = np.random.default_rng(7)
    n, d = 60, 8
    vecs = rng.normal(size=(n, d))
    vecs[11] = vecs[10] + 0.01 * rng.normal(size=d)  # planted cross-side dup
    ids = np.arange(n, dtype=np.int64)
    df = pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})
    ds = ray.data.from_pandas(df)
    full = SIM.embedding_near_dups(ds, ids, vecs, threshold=0.3).to_pandas()
    want = set()
    for a, b in zip(full["vec_a"], full["vec_b"]):
        if a % 2 != b % 2:
            want.add((a, b) if a % 2 == 0 else (b, a))
    new = ray.data.from_pandas(df[df["vec_id"] % 2 == 1])
    existing = ray.data.from_pandas(df[df["vec_id"] % 2 == 0])
    got = SIM.incremental_embedding_near_dups(new, existing, threshold=0.3).to_pandas()
    assert set(zip(got["existing_id"], got["new_id"])) == want
    assert (10, 11) in want  # the planted pair is cross-side and found


def test_strip_hot_passages_removes_only_shared_windows():
    boiler = "this license text is repeated verbatim across many files here"
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                f"unique alpha content one {boiler}",
                f"{boiler} and some unique beta tail words",
                "totally unrelated gamma document with its own words only",
                boiler,  # fully covered → empty string
                "shrt",  # shorter than the window → untouched
            ],
        }
    )
    got = (
        D.strip_hot_passages(ray.data.from_pandas(df), window_k=4, min_docs=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    out = dict(zip(got["doc_id"], got["text"]))
    assert len(out) == 5  # every doc comes back exactly once
    # the boilerplate block vanishes; each doc's unique tokens survive
    assert out[1] == "unique alpha content one"
    # doc 2's unique tail survives, the shared block is gone
    assert out[2] == "and some unique beta tail words"
    assert out[3] == df["text"][2]  # untouched: no shared windows
    assert out[4] == ""  # fully covered
    assert out[5] == "shrt"  # no windows → pass-through
    for t in out.values():
        assert "license" not in t and "verbatim" not in t


def test_exact_dedup_min_doc_id_wins():
    df = _corpus_with_near_dups()
    out = D.exact_dedup(ray.data.from_pandas(df)).to_pandas()
    # exact dup (i*10+2) removed, near-dup (i*10+1) kept
    assert sorted(out["doc_id"]) == [0, 1, 10, 11, 20, 21, 30, 31]


def test_ivf_recall_vs_brute_force():
    import pyarrow.parquet as pq

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    t = pq.read_table(f"{SF}/embeddings.parquet")
    q = np.stack(
        [np.asarray(v, np.float64) for v in t.column("embedding").to_pylist()[:2]]
    )
    bf = SIM.brute_force_topk(ds, q, k=10)
    ivf = SIM.ivf_topk(ds, q, k=10, n_clusters=8, nprobe=4)
    for qi in (0, 1):
        a = set(bf[bf["query_id"] == qi]["vec_id"])
        b = set(ivf[ivf["query_id"] == qi]["vec_id"])
        assert len(a & b) / 10 >= 0.5, f"IVF recall too low for q{qi}"
    # self-similarity: the query vector itself is rank 1 with sim 1.0
    assert bf[(bf["query_id"] == 0) & (bf["rank"] == 1)]["vec_id"].iloc[0] == 0
    assert bf[(bf["query_id"] == 0) & (bf["rank"] == 1)]["cosine_sim"].iloc[0] == 1.0


def test_multimodal_plumbing_roundtrip():
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    media = MM.synthesize_media_table(docs)
    assert media.schema.field("payload").type == pa.large_binary()
    out = MM.multimodal_features(ray.data.from_arrow(media)).to_pandas()
    assert len(out) == len(docs)
    # all three synthesized modalities take a REAL decode path
    assert out["decoded_real"].all()
    # media_id 0 is an image: features are real pixel stats of the
    # deterministic gradient (blue channel constant 0 -> mean=std=0)
    f0 = np.asarray(out[out["media_id"] == 0]["features"].iloc[0])
    assert f0[2] == 0.0 and f0[5] == 0.0
    # the stub path stays reachable for undecodable codecs and is
    # deterministic: same payload -> same features
    d0 = MM.DecodeAndFeaturize()
    stub = pa.table(
        {
            "media_id": pa.array([9], pa.int64()),
            "media_type": ["image"],
            "payload": pa.array([b"\xff\xd8JPEGish"], pa.large_binary()),
        }
    )
    s1 = d0(stub).to_pandas()
    assert not s1["decoded_real"].iloc[0]
    np.testing.assert_array_equal(
        s1["features"].iloc[0], d0(stub).to_pandas()["features"].iloc[0]
    )
    assert (out["payload_bytes"] > 0).all()


def test_fingerprint_rolling_deterministic():
    df = pd.DataFrame({"doc_id": [1, 2], "text": ["hello world", "hello world"]})
    fp = Fingerprint()
    out1, out2 = fp(df), fp(df)
    assert (out1["rolling_hash"] == out2["rolling_hash"]).all()
    assert out1["rolling_hash"].iloc[0] == out1["rolling_hash"].iloc[1]
    assert out1["sha256_hex"].iloc[0] == out1["sha256_hex"].iloc[1]


def test_lang_id_markers():
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "the cat and the dog is in to the house",
                "der hund und die katze ist nicht hier",
                "zzz qqq xxx",
            ],
            "lang": ["en", "de", "xx"],
        }
    )
    out = LangId()(df)
    assert list(out["detected_lang"]) == ["en", "de", "unknown"]


def test_token_stats_edge_cases():
    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["", "  a  b  ", "one"]})
    out = TokenStats()(df)
    assert list(out["token_count"]) == [0, 2, 1]


def test_ivf_near_dups_recall_vs_brute():
    """The sampled-codebook multi-probe library path keeps its higher
    recall floor (the queries() entry moved to the driver-legible
    integer-quantizer variant in r4 — covered by
    test_ivf_q_near_dups_recall_vs_brute)."""
    import __ray_entry__ as E

    brute = E.queries()["dedup_embedding_cosine"]("/root/testdata/sf0.001").to_pandas()
    ds = ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    ivf = SIM.embedding_near_dups_ivf(ds, threshold=0.3).to_pandas()
    bset = set(zip(brute["vec_a"], brute["vec_b"]))
    iset = set(zip(ivf["vec_a"], ivf["vec_b"]))
    assert iset <= bset  # no false positives: within-bucket kernel is exact
    assert len(iset) / max(len(bset), 1) >= 0.5  # blocked recall floor


def test_connected_components_clusters():
    import pandas as pd

    from sql_etl_pipeline_ray.stages.dedup import connected_components

    pairs = pd.DataFrame({"doc_a": [1, 2, 7, 9], "doc_b": [2, 3, 8, 1]})
    out = connected_components(pairs)
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got == {1: 1, 2: 1, 3: 1, 9: 1, 7: 7, 8: 7}


def test_dedup_clusters_group_exact_dups_together():
    import __ray_entry__ as E

    out = E.queries()["dedup_clusters"]("/root/testdata/sf0.001")
    # every cluster id is the min doc id of its members
    assert (out.groupby("cluster_id")["doc_id"].min() == out["cluster_id"].unique()).all()
    assert len(out) > 0


def test_connected_components_distributed_matches_union_find():
    import pandas as pd
    import ray

    from sql_etl_pipeline_ray.stages.dedup import (
        connected_components,
        connected_components_distributed,
    )

    # long chain (forces several propagation rounds), a triangle with a
    # cross edge, an isolated pair, and duplicate edges
    pairs = pd.DataFrame(
        {
            "doc_a": [10, 11, 12, 13, 14, 5, 6, 5, 100, 10],
            "doc_b": [11, 12, 13, 14, 15, 6, 7, 7, 101, 11],
        }
    )
    want = connected_components(pairs)
    got = (
        connected_components_distributed(ray.data.from_pandas(pairs), num_partitions=3)
        .to_pandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_dedup_clusters_distributed_matches_driver_side():
    import pandas as pd

    import __ray_entry__ as E

    want = E.queries()["dedup_clusters"]("/root/testdata/sf0.001").reset_index(drop=True)
    got = (
        E.queries()["dedup_clusters_distributed"]("/root/testdata/sf0.001")
        .to_pandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_connected_components_distributed_empty_edges():
    import ray
    import pyarrow as pa

    from sql_etl_pipeline_ray.stages.dedup import connected_components_distributed

    empty = ray.data.from_arrow(
        pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
    )
    out = connected_components_distributed(empty)
    assert out.count() == 0


def test_train_val_test_split_disjoint_exhaustive_stable():
    import ray

    from sql_etl_pipeline_ray.stages.curation import train_val_test_split

    df = pd.DataFrame({"doc_id": np.arange(10_000, dtype=np.int64)})
    out = train_val_test_split(ray.data.from_pandas(df)).to_pandas()
    assert len(out) == 10_000 and out["doc_id"].is_unique
    frac = out["split"].value_counts(normalize=True)
    assert 0.07 < frac["test"] < 0.13 and 0.07 < frac["val"] < 0.13
    # stable under different partitioning
    out2 = train_val_test_split(
        ray.data.from_pandas(df).repartition(7)
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True), out2
    )


def test_deterministic_shuffle_is_permutation_with_tie_free_keys():
    import ray

    from sql_etl_pipeline_ray.stages.curation import deterministic_shuffle

    df = pd.DataFrame({"doc_id": np.arange(5_000, dtype=np.int64)})
    out = deterministic_shuffle(ray.data.from_pandas(df)).to_pandas()
    assert sorted(out["doc_id"]) == list(range(5_000))
    assert out["shuffle_key"].is_unique  # odd multiplier -> bijective
    assert out["shuffle_key"].is_monotonic_increasing  # sorted output
    assert out["shard"].between(0, 255).all()
    # actually shuffled: head of output is not the head of the input
    assert list(out["doc_id"].head(50)) != list(range(50))


def test_pack_sequences_prefix_sum_invariants():
    import ray

    from sql_etl_pipeline_ray.stages.curation import pack_sequences

    rng = np.random.default_rng(7)
    texts = [" ".join(["w"] * int(n)) for n in rng.integers(1, 400, 300)]
    df = pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64), "text": texts})
    out = pack_sequences(
        ray.data.from_pandas(df), budget=512, bucket_size=64
    ).to_pandas()
    n = df["text"].str.count(" ").to_numpy(np.int64) + 1
    want_off = np.cumsum(n) - n
    assert (out["n_tokens"].to_numpy() == n).all()
    assert (out["stream_offset"].to_numpy() == want_off).all()
    assert (out["seq_id"].to_numpy() == want_off // 512).all()
    assert out["seq_id"].is_monotonic_increasing


def test_incremental_dedup_semantics():
    import ray

    from sql_etl_pipeline_ray.stages.dedup import incremental_dedup

    existing = pd.DataFrame({"doc_id": [0, 2], "text": ["seen before", "also seen"]})
    new = pd.DataFrame(
        {
            "doc_id": [1, 3, 5, 7],
            "text": ["seen before", "brand new", "brand new", "another new"],
        }
    )
    out = (
        incremental_dedup(ray.data.from_pandas(new), ray.data.from_pandas(existing))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # 1 dropped (already ingested), 5 dropped (dup of 3 within increment)
    assert list(out["doc_id"]) == [3, 7]


def test_curation_pipeline_packs_within_each_split():
    import __ray_entry__ as E

    out = E.queries()["docs_curation_pipeline"]("/root/testdata/sf0.001").to_pandas()
    assert set(out["split"].unique()) <= {"train", "val", "test"}
    for _, g in out.groupby("split"):
        g = g.sort_values("doc_id")
        n = g["n_tokens"].to_numpy()
        off = g["stream_offset"].to_numpy()
        assert off[0] == 0 and (off[1:] == (off + n)[:-1]).all()
        assert (g["seq_id"].to_numpy() == off // 2048).all()


def test_chunk_documents_coverage_and_overlap():
    import ray

    from sql_etl_pipeline_ray.stages.curation import chunk_documents

    texts = {
        0: " ".join(f"t{i}" for i in range(700)),  # 3 chunks (448+256 >= 700)
        1: " ".join(f"t{i}" for i in range(256)),  # exactly one
        2: "short doc",                             # one small chunk
        3: "",                                      # [''] -> one chunk
    }
    df = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    out = (
        chunk_documents(ray.data.from_pandas(df), chunk_tokens=256, overlap=32)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
    )
    assert list(out[out["doc_id"] == 1]["chunk_id"]) == [0]
    g0 = out[out["doc_id"] == 0]
    assert list(g0["start_tok"]) == [0, 224, 448]
    toks = texts[0].split(" ")
    for _, r in g0.iterrows():
        # every chunk is the exact slice; consecutive chunks overlap by 32
        assert r["chunk_text"] == " ".join(toks[r["start_tok"]:r["start_tok"] + 256])
    # full coverage: union of [start, start+n) is [0, 700)
    covered = set()
    for _, r in g0.iterrows():
        covered.update(range(r["start_tok"], r["start_tok"] + r["n_tokens"]))
    assert covered == set(range(700))
    assert len(out[out["doc_id"] == 3]) == 1  # empty text -> one '' chunk


def test_connected_components_distributed_random_graphs():
    """Property test: on arbitrary random edge lists the distributed
    min-label propagation must equal the driver union-find exactly."""
    import pandas as pd
    import ray
    from hypothesis import given, settings, strategies as st

    from sql_etl_pipeline_ray.stages.dedup import (
        connected_components,
        connected_components_distributed,
    )

    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 40), st.integers(0, 40)),
            min_size=1,
            max_size=60,
        )
    )
    def check(edges):
        pairs = pd.DataFrame(edges, columns=["doc_a", "doc_b"])
        want = connected_components(pairs)
        got = (
            connected_components_distributed(
                ray.data.from_pandas(pairs), num_partitions=2
            )
            .to_pandas()
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    check()


def test_simhash_batch_path_matches_single_doc_kernel():
    """Property test: the vectorized batch path (segmented reduceat over a
    cached distinct-word hash table) must be bit-identical to the per-doc
    reference kernel — including empty / whitespace-only texts, where
    ``''.split(' ') == ['']`` contributes the hash of the empty string."""
    from hypothesis import given, settings, strategies as st

    word = st.text(alphabet="ab xyz", min_size=0, max_size=8)

    @settings(max_examples=20, deadline=None)
    @given(st.lists(word, min_size=1, max_size=30))
    def check(texts):
        h = D.SimHasher()
        df = pd.DataFrame(
            {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
        )
        got = h(df)["simhash"].to_numpy()
        want = np.array([h.simhash(t) for t in texts], dtype=np.int64)
        assert (got == want).all()
        assert got.dtype == np.int64

    check()
    # empty batch keeps the declared schema
    empty = D.SimHasher()(pd.DataFrame({"doc_id": [], "text": []}))
    assert list(empty.columns) == ["doc_id", "simhash"]
    assert empty["simhash"].dtype == np.int64


def test_simhash_banding_complete_for_hamming_3():
    """Completeness pin for the Manku C(6,3) banding: the distributed pair
    set must equal the brute-force all-pairs hamming filter at d<=3 —
    a pair with <=3 differing bits always has one clean block triple."""
    df = _corpus_with_near_dups()
    # add adversarial docs: signatures differing from doc 0's text by a
    # few words (small hamming), plus unrelated ones
    extra = []
    base = df.loc[df.doc_id == 0, "text"].iloc[0]
    for k, repl in enumerate(["rain", "fox", "dog"]):
        extra.append((1000 + k, base.replace(repl, f"W{k}")))
    df = pd.concat(
        [df, pd.DataFrame(extra, columns=["doc_id", "text"])], ignore_index=True
    )
    h = D.SimHasher()
    sig = {r.doc_id: h.simhash(r.text) for r in df.itertuples(index=False)}

    def ham(a, b):
        return bin((sig[a] ^ sig[b]) & ((1 << 64) - 1)).count("1")

    ids = sorted(sig)
    want = sorted(
        (a, b, ham(a, b))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if ham(a, b) <= 3
    )
    got = D.simhash_near_dups(ray.data.from_pandas(df), max_hamming=3)
    got_t = sorted(zip(got["a"], got["b"], got["hamming"]))
    assert got_t == want, (got_t, want)


def test_pack_sequences_empty_input_keeps_schema():
    """A fully-filtered corpus (e.g. a strict quality gate rejecting every
    doc) must yield an EMPTY packed dataset with the declared schema, not
    a KeyError from a column-less aggregate frame — found by running
    docs_curation_pipeline on a synthetic corpus with no stopwords."""
    from sql_etl_pipeline_ray.stages.curation import pack_sequences

    empty = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "split": pa.array([], pa.string()),
            }
        )
    )
    out = pack_sequences(empty, part_col="split")
    assert out.count() == 0
    assert set(out.schema().names) == {
        "doc_id", "n_tokens", "stream_offset", "seq_id", "split",
    }


def _write_docs(tmp_path, rows):
    import os
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows)),
            "source": pa.array(["s"] * len(rows)),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "documents.parquet"))
    return str(tmp_path)


def test_decontaminate_controlled(tmp_path):
    from sql_etl_pipeline_ray.pipelines.training_data import docs_decontaminate

    sf = _write_docs(
        tmp_path,
        [
            (0, "a b c d e f"),            # bench (0 % 97 == 0)
            (1, "x y c d e f z"),          # shares 4-gram "c d e f" -> 1 hit
            (2, "q w r t y u"),            # clean
            (3, "a b c d x b c d e y"),    # shares "a b c d" and "b c d e"
        ],
    )
    out = docs_decontaminate(sf, ngram=4)
    got = dict(zip(out["doc_id"], out["n_bench_grams"]))
    assert got == {1: 1, 3: 2}


def test_bm25_scores_ranking_and_bounds(tmp_path):
    from sql_etl_pipeline_ray.pipelines.training_data import bm25_scores

    sf = _write_docs(
        tmp_path,
        [
            (1, "data data data query pad pad pad"),
            (2, "data pad pad pad pad pad pad"),
            (3, "pad pad pad pad pad pad pad"),   # no query terms -> excluded
            (4, "merge query data pad pad pad pad"),
        ],
    )
    out = bm25_scores(sf, topn=10)
    assert set(out["doc_id"]) == {1, 2, 4}
    assert (out["bm25"] > 0).all()
    scores = dict(zip(out["doc_id"], out["bm25"]))
    # more distinct matched terms (all three) beats one repeated term at
    # equal doc length; repeated term beats single occurrence
    assert scores[4] > scores[1] > scores[2]
    # deterministic order: score desc, doc_id asc
    assert list(out["bm25"]) == sorted(out["bm25"], reverse=True)


def test_per_source_sample_fixed_k_and_partition_invariant(tmp_path):
    import os
    import pyarrow.parquet as pq
    from sql_etl_pipeline_ray.pipelines.training_data import (
        SAMPLE_COIN_MULT,
        docs_per_source_sample,
    )

    rng = np.random.default_rng(7)
    n = 400
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(["w"] * n),
            "lang": pa.array(["en"] * n),
            "source": pa.array([f"s{i % 7}" for i in range(n)]),
            "n_chars": pa.array(np.ones(n, dtype=np.int64)),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "documents.parquet"))
    out = docs_per_source_sample(str(tmp_path), k=3)
    # exactly k per source
    assert out.groupby("source").size().eq(3).all()
    # matches the single-process definition: k smallest coins per source
    df = t.to_pandas()
    df["coin"] = df["doc_id"].to_numpy(np.uint64) * np.uint64(SAMPLE_COIN_MULT)
    want = (
        df.sort_values(["source", "coin", "doc_id"])
        .groupby("source")
        .head(3)[["doc_id", "source"]]
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, want)


def test_unigram_logprob_oov_floor_and_ranking(tmp_path):
    from sql_etl_pipeline_ray.pipelines.training_data import (
        docs_unigram_logprob,
    )

    # "common" appears 12x, "rare" once; with top_v=1 only "common" is in
    # the model and every other token scores the OOV floor (0.5 counts) —
    # strictly below the rarest IN-vocab token.
    sf = _write_docs(
        tmp_path,
        [
            (1, "common common common common common common"),
            (2, "common common common common common rare"),
            (3, "common zz qq vv bb nn"),
        ],
    )
    out = (
        docs_unigram_logprob(sf, top_v=1)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert (out["n_tokens"] == 6).all()
    # all-common doc scores highest; OOV-heavy doc scores lowest
    assert (
        out.loc[1, "mean_logprob"]
        > out.loc[2, "mean_logprob"]
        > out.loc[3, "mean_logprob"]
    )
    # doc 1 is exactly ln(12/18) (quantized to micro-nats)
    import math

    micro = float(np.copysign(np.floor(abs(math.log(12 / 18.0)) * 1e6 + 0.5), -1))
    want = np.copysign(np.floor(abs(micro / 1e6) * 1e6 + 0.5), -1) / 1e6
    assert out.loc[1, "mean_logprob"] == want


def test_pii_redact_patterns_order_and_counts():
    from sql_etl_pipeline_ray.stages.text import PiiRedact

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "reach me at jo.doe+x@mail.example.org today",
                "server 10.0.0.1 and 192.168.1.255 are down",
                "call 555-123-4567 or 555.987.6543",
                "plain text with no pii at all",
            ],
        }
    )
    out = PiiRedact()(df).set_index("doc_id")
    assert out.loc[1, "clean_text"] == "reach me at [EMAIL] today"
    assert out.loc[2, "clean_text"] == "server [IP] and [IP] are down"
    assert out.loc[3, "clean_text"] == "call [PHONE] or [PHONE]"
    assert out.loc[4, "clean_text"] == "plain text with no pii at all"
    assert list(out["n_redactions"]) == [1, 2, 2, 0]
    # email digits are consumed BEFORE the numeric patterns run
    df2 = pd.DataFrame({"doc_id": [9], "text": ["x 555-123-4567@x.co y"]})
    o2 = PiiRedact()(df2)
    assert o2.loc[0, "clean_text"] == "x [EMAIL] y"
    assert o2.loc[0, "n_redactions"] == 1


def test_weighted_sample_matches_single_process_and_prefers_weight(tmp_path):
    import os
    import pyarrow.parquet as pq
    from sql_etl_pipeline_ray.pipelines.training_data import (
        SAMPLE_COIN_MULT,
        docs_weighted_sample,
    )

    n = 300
    rng = np.random.default_rng(3)
    w = rng.integers(1, 1000, n).astype(np.int64)
    w[42] = 10_000_000  # heavy doc must be sampled at any reasonable k
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(["w"] * n),
            "lang": pa.array(["en"] * n),
            "source": pa.array([f"s{i % 3}" for i in range(n)]),
            "n_chars": pa.array(w),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "documents.parquet"))
    out = docs_weighted_sample(str(tmp_path), k=20)
    assert len(out) == 20
    assert 42 in set(out["doc_id"])
    # exact match vs the single-process definition
    u = (np.arange(n).astype(np.uint64) * np.uint64(SAMPLE_COIN_MULT)).astype(
        np.float64
    ) + 1.0
    prio = w * 18446744073709551616.0 / u
    df = pd.DataFrame({"doc_id": np.arange(n), "priority": prio})
    want = set(
        df.sort_values(["priority", "doc_id"], ascending=[False, True])
        .head(20)["doc_id"]
        .astype(np.int64)
    )
    assert set(out["doc_id"]) == want
    # returned priorities are the bit-exact recomputation
    got = out.sort_values("doc_id").reset_index(drop=True)
    want_p = prio[got["doc_id"].to_numpy()]
    assert (got["priority"].to_numpy() == want_p).all()


def test_quality_quantile_gate_threshold_semantics(tmp_path):
    from sql_etl_pipeline_ray.pipelines.training_data import (
        _rha_signed,
        docs_quality_quantile_gate,
    )
    from sql_etl_pipeline_ray.stages.text import QualityScore

    # varied-quality docs: different lengths, digits, uppercase
    rows = []
    rng = np.random.default_rng(5)
    for i in range(200):
        nw = int(rng.integers(1, 40))
        words = ["ok"] * nw
        if i % 3 == 0:
            words += ["123456"] * (i % 5)
        if i % 7 == 0:
            words += ["LOUD"]
        rows.append((i, " ".join(words)))
    sf = _write_docs(tmp_path, rows)
    out = docs_quality_quantile_gate(sf, q=0.5).to_pandas()

    df = pd.DataFrame({"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]})
    sc = QualityScore()(df)
    isc = _rha_signed(sc["quality_score"].to_numpy(np.float64), 1e4).astype(np.int64)
    srt = np.sort(isc)
    thr = srt[max(int(np.ceil(0.5 * len(srt))), 1) - 1]
    want = set(sc["doc_id"].to_numpy()[isc >= thr])
    assert set(out["doc_id"]) == want
    # gate keeps at least half, and strictly filters something
    assert len(out) >= 100 and len(out) < 200


def test_mixture_sample_sqrt_temperature_rates(tmp_path):
    import os
    import pyarrow.parquet as pq
    from sql_etl_pipeline_ray.pipelines.training_data import (
        MIXTURE_COIN_MULT,
        docs_mixture_sample,
    )

    langs = ["en"] * 400 + ["de"] * 100 + ["fr"] * 25
    n = len(langs)
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(["w"] * n),
            "lang": pa.array(langs),
            "source": pa.array(["s"] * n),
            "n_chars": pa.array(np.ones(n, dtype=np.int64)),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "documents.parquet"))
    out = docs_mixture_sample(str(tmp_path)).to_pandas()
    kept = out.groupby("lang").size()
    # smallest language survives whole (thr = 10000 keeps every coin)
    assert kept["fr"] == 25
    # exact-mirror check vs the integer-threshold definition
    thr = {
        "en": int(np.floor(np.sqrt(25 / 400.0) * 10000.0)),
        "de": int(np.floor(np.sqrt(25 / 100.0) * 10000.0)),
        "fr": 10000,
    }
    coin = (np.arange(n).astype(np.uint64) * np.uint64(MIXTURE_COIN_MULT)) % np.uint64(
        10000
    )
    want = {
        lang: int(
            np.sum((np.array(langs) == lang) & (coin < np.uint64(thr[lang])))
        )
        for lang in thr
    }
    assert kept.to_dict() == want
    # sqrt flattening: en kept-fraction ~0.25, de ~0.5 (integer-threshold exact)
    assert abs(kept["en"] / 400 - 0.25) < 0.05
    assert abs(kept["de"] / 100 - 0.5) < 0.08


def _near_dedup_fixture(tmp_path):
    # two near-dup clusters ({1,2,3} chained, {10,11}) + uniques {5, 20}
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, base + " tail"),
        (3, base + " tail extra"),
        (5, "completely different text with no overlap at all here"),
        (10, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (11, "alpha beta gamma delta epsilon zeta eta theta iota kappa x"),
        (20, "another unique document about ray data streaming engines"),
    ]
    return _write_docs(tmp_path, rows)


def test_near_dedup_keep_broadcast_and_antijoin_paths(tmp_path):
    import ray.data
    from sql_etl_pipeline_ray.stages import dedup as D
    from sql_etl_pipeline_ray.pipelines.training_data import docs_dedup_near

    sf = _near_dedup_fixture(tmp_path)
    out = docs_dedup_near(sf).to_pandas()
    # min id of each cluster survives; uniques survive
    assert set(out["doc_id"]) == {1, 5, 10, 20}
    # survivor rows carry the doc columns, not just ids
    assert set(out.columns) == {"doc_id", "lang", "source"}

    # anti-join fallback (loser_broadcast_max=0 forces it) = same result
    docs = ray.data.read_parquet(f"{sf}/documents.parquet").select_columns(
        ["doc_id", "lang", "source"]
    )
    pairs = D.ngram_jaccard_pairs(
        ray.data.read_parquet(f"{sf}/documents.parquet").select_columns(
            ["doc_id", "text"]
        ),
        shingle_k=3,
        threshold=0.5,
        num_partitions=4,
    )
    out2 = D.near_dedup_keep(
        docs, pairs, num_partitions=4, loser_broadcast_max=0
    ).to_pandas()
    assert set(out2["doc_id"]) == {1, 5, 10, 20}
    assert sorted(out2.columns.tolist()) == sorted(out.columns.tolist())


def test_near_dedup_keep_no_pairs_keeps_everything(tmp_path):
    import ray.data
    from sql_etl_pipeline_ray.stages import dedup as D

    sf = _write_docs(tmp_path, [(i, f"unique text number {i} nothing shared") for i in range(8)])
    docs = ray.data.read_parquet(f"{sf}/documents.parquet").select_columns(
        ["doc_id", "source"]
    )
    pairs = ray.data.from_pandas(
        pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                      "doc_b": pd.Series([], dtype="int64")})
    )
    out = D.near_dedup_keep(docs, pairs, num_partitions=2).to_pandas()
    assert set(out["doc_id"]) == set(range(8))


def test_tfidf_top_terms_hand_computed(tmp_path):
    from sql_etl_pipeline_ray.pipelines.training_data import docs_top_tfidf_terms

    # 4 docs; "rare" appears only in doc 0, "common" in all docs
    sf = _write_docs(
        tmp_path,
        [
            (0, "rare common shared shared"),
            (1, "common shared alpha"),
            (2, "common beta beta"),
            (3, "common gamma"),
        ],
    )
    out = docs_top_tfidf_terms(sf, k=2).to_pandas()
    n = 4

    def idf_micro(df):
        return int(np.floor(np.log((n + 1.0) / (df + 1.0)) * 1e6 + 0.5))

    d0 = out[out["doc_id"] == 0].sort_values("tfidf", ascending=False)
    # doc 0: shared tf=2 df=2 vs rare tf=1 df=1 vs common tf=1 df=4
    want_scores = {
        "shared": 2 * idf_micro(2) / 1e6,
        "rare": 1 * idf_micro(1) / 1e6,
        "common": 1 * idf_micro(4) / 1e6,
    }
    top2 = sorted(want_scores.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert list(d0["term"]) == [t for t, _ in top2]
    assert list(d0["tfidf"]) == [s for _, s in top2]
    # every doc returns at most k rows and df is globally consistent
    assert out.groupby("doc_id").size().max() <= 2
    assert (out.loc[out["term"] == "common", "df"] == 4).all()


def test_decontaminate_strip_and_admit_increment(tmp_path):
    from sql_etl_pipeline_ray.pipelines.training_data import (
        docs_admit_near_increment,
        docs_decontaminate_strip,
    )

    # bench doc is id 0 (0 % 97 == 0); doc 5 shares its 4-gram, doc 7 clean
    sf = _write_docs(
        tmp_path,
        [
            (0, "held out benchmark question about physics"),
            (5, "train doc echoing held out benchmark question verbatim"),
            (7, "a perfectly clean training document with fresh words"),
            (97, "another benchmark row entirely its own"),
        ],
    )
    out = docs_decontaminate_strip(sf, ngram=4).to_pandas()
    # bench docs (0, 97) excluded; contaminated 5 dropped; clean 7 kept
    assert set(out["doc_id"]) == {7}

    # near-dup admit: 1 (odd) near-dups even 2 -> rejected; 3 clean -> admitted
    import os

    base = "the quick brown fox jumps over the lazy dog again and again"
    d2 = os.path.join(str(tmp_path), "inc")
    os.makedirs(d2, exist_ok=True)
    sf2 = _write_docs(
        d2,
        [
            (1, base + " tail"),
            (2, base),
            (3, "entirely new increment content nothing like the corpus"),
        ],
    )
    adm = docs_admit_near_increment(sf2).to_pandas()
    assert set(adm["doc_id"]) == {3}


def test_ppm_roundtrip_and_malformed():
    img = MM.synth_image(7, 13, 9)
    enc = MM.encode_ppm(img)
    np.testing.assert_array_equal(MM.decode_ppm(enc), img)
    # header variants: comments and extra whitespace
    with_comment = b"P6\n# a comment\n13   9\n# more\n255\n" + img.tobytes()
    np.testing.assert_array_equal(MM.decode_ppm(with_comment), img)
    import pytest

    for bad in [b"P5\n1 1\n255\n\x00\x00\x00",          # wrong magic
                b"P6\n2 2\n255\n\x00\x00\x00",           # truncated raster
                b"P6\n1 1\n65535\n\x00\x00",              # wide maxval
                b"P6\n"]:                                  # truncated header
        with pytest.raises(ValueError):
            MM.decode_ppm(bad)


def test_resize_nearest_known_values():
    # 2x2 distinct-color image -> 4x4: each source pixel becomes a 2x2 block
    img = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 0]]], np.uint8
    )
    up = MM.resize_nearest(img, 4, 4)
    assert up.shape == (4, 4, 3)
    np.testing.assert_array_equal(up[:2, :2], np.broadcast_to(img[0, 0], (2, 2, 3)))
    np.testing.assert_array_equal(up[2:, 2:], np.broadcast_to(img[1, 1], (2, 2, 3)))
    # downscale back recovers the original
    np.testing.assert_array_equal(MM.resize_nearest(up, 2, 2), img)


def test_decode_featurize_real_vs_stub_paths():
    docs = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                     "text": ["aa", "bb", "cc", "dd"]})
    media = MM.synthesize_media_table(docs)
    out = MM.DecodeAndFeaturize()(media)
    df = out.to_pandas()
    assert df["decoded_real"].all()  # PPM, WAV and P6-stream all real
    # real features: blue channel of synth_image(0,...) is constant 0 ->
    # mean_b == 0, std_b == 0; aspect = w/h
    f0 = df.loc[0, "features"]
    assert f0[2] == 0.0 and f0[5] == 0.0
    assert f0[6] == (0 % 48 + 8) / (0 % 32 + 8)
    # stub features deterministic and in [0, 1]
    f1 = df.loc[1, "features"]
    assert all(0.0 <= x <= 1.0 for x in f1)
    again = MM.DecodeAndFeaturize()(media).to_pandas().loc[1, "features"]
    np.testing.assert_array_equal(f1, again)


def test_resize_stage_images_only():
    docs = pa.table({"doc_id": pa.array([0, 1, 3], pa.int64()),
                     "text": ["aa", "bb", "dd"]})
    media = MM.synthesize_media_table(docs)
    out = MM.ResizeImages(out_h=16, out_w=16)(media).to_pandas()
    img_rows = out[out["media_type"] == "image"]
    assert (img_rows["width"] == 16).all() and (img_rows["height"] == 16).all()
    for p in img_rows["payload"]:
        assert MM.decode_ppm(p).shape == (16, 16, 3)
    other = out[out["media_type"] != "image"]
    # non-image rows pass through byte-identical (here: the WAV payload)
    assert other["payload"].iloc[0] == bytes(
        media.column("payload")[1].as_py()
    )


def test_wav_roundtrip_and_malformed():
    import pytest

    s = MM.synth_audio(5)
    enc = MM.encode_wav(s, 16000)
    dec, rate = MM.decode_wav(enc)
    assert rate == 16000
    np.testing.assert_array_equal(dec, s)
    # extra RIFF chunk before data is skipped, not fatal
    import struct
    hdr, data = enc[:36], enc[36:]
    padded = hdr + b"LIST" + struct.pack("<I", 4) + b"INFO" + data
    dec2, _ = MM.decode_wav(padded)
    np.testing.assert_array_equal(dec2, s)
    for bad in [b"RIFX" + enc[4:],                      # wrong magic
                enc[:40],                                 # truncated data
                enc.replace(b"\x01\x00\x01\x00", b"\x01\x00\x02\x00", 1)]:  # stereo
        with pytest.raises(ValueError):
            MM.decode_wav(bad)


def test_audio_features_known_signal():
    # constant +1/-1 alternating square wave: rms=peak=1 (scaled), zcr=1
    s = (np.tile([32767, -32768], 800)).astype(np.int16)
    f = MM.audio_features(s, 16000)
    assert f[0] == 1600 / 16000
    assert abs(f[1] - 1.0) < 1e-4 and abs(f[2] - 1.0) < 1e-4
    assert f[3] == 1.0


def test_video_stream_roundtrip_and_frame_sample():
    vid = MM.synth_video(8)  # 8 % 4 + 2 = 2 frames
    frames = MM.decode_ppm_stream(vid)
    assert len(frames) == 2
    assert frames[0].shape == (MM.VIDEO_FRAME_H, MM.VIDEO_FRAME_W, 3)
    # frames differ (blue channel seeded by frame idx)
    assert not np.array_equal(frames[0], frames[1])

    docs = pa.table({"doc_id": pa.array([2, 5, 0], pa.int64()),
                     "text": ["v", "v", "img"]})
    media = MM.synthesize_media_table(docs)
    out = MM.FrameSampleVideos(stride=2)(media).to_pandas()
    # doc 2 -> 4 frames -> idx 0,2 ; doc 5 -> 3 frames -> idx 0,2 ; doc 0 dropped
    assert sorted(zip(out["media_id"], out["frame_idx"])) == [
        (2, 0), (2, 2), (5, 0), (5, 2)
    ]
    for p in out["payload"]:
        assert MM.decode_ppm(p).shape == (6, 8, 3)


def test_featurizer_routes_all_three_modalities():
    docs = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                     "text": ["a", "b", "c"]})
    out = MM.DecodeAndFeaturize()(MM.synthesize_media_table(docs)).to_pandas()
    assert out["decoded_real"].all()
    vid = out[out["media_type"] == "video"]["features"].iloc[0]
    assert vid[7] == 2 % 4 + 2  # frame count rides in f[7]
    aud = out[out["media_type"] == "audio"]["features"].iloc[0]
    assert aud[0] == ((1 % 50 + 10) * 16) / 16000  # duration seconds


def _budget_oracle(df, budget):
    o = df.sort_values(["quality_score", "doc_id"], ascending=[False, True])
    keep = o[o["token_count"].cumsum() <= budget]
    return set(keep["doc_id"])


def test_token_budget_select_matches_window_cumsum_oracle():
    from sql_etl_pipeline_ray.stages.curation import token_budget_select

    rng = np.random.default_rng(3)
    n = 5000
    # few distinct scores -> big boundary tier (stresses the tier path)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "token_count": rng.integers(1, 50, n).astype(np.int64),
            "quality_score": np.round(rng.choice([1.25, 7.5, 33.0], n), 4),
        }
    )
    total = int(df["token_count"].sum())
    for frac in (0.0001, 0.3, 0.62, 0.999, 1.5):
        budget = int(total * frac)
        got = token_budget_select(
            ray.data.from_pandas(df), budget, bucket_size=128
        ).to_pandas()
        assert set(got["doc_id"]) == _budget_oracle(df, budget), frac
        assert got["token_count"].sum() <= budget or frac > 1


def test_token_budget_select_boundary_exact():
    from sql_etl_pipeline_ray.stages.curation import token_budget_select

    # all the same score: pure tier path, keep doc_ids 0..k in id order
    df = pd.DataFrame(
        {
            "doc_id": np.arange(10, dtype=np.int64),
            "token_count": np.full(10, 7, np.int64),
            "quality_score": np.full(10, 5.0),
        }
    )
    got = token_budget_select(ray.data.from_pandas(df), 22).to_pandas()
    assert sorted(got["doc_id"]) == [0, 1, 2]  # 3*7=21 <= 22 < 28
    # zero budget -> nothing; full budget -> everything
    assert token_budget_select(ray.data.from_pandas(df), 0).count() == 0
    assert token_budget_select(ray.data.from_pandas(df), 70).count() == 10
    # NEGATIVE scores flow through the filter expression correctly
    neg = pd.DataFrame(
        {
            "doc_id": np.arange(100, dtype=np.int64),
            "token_count": np.full(100, 3, np.int64),
            "quality_score": np.round(np.linspace(-25.5, 10.0, 100), 4),
        }
    )
    got = token_budget_select(ray.data.from_pandas(neg), 60).to_pandas()
    assert set(got["doc_id"]) == _budget_oracle(neg, 60)
    assert (got["quality_score"] > 0).all()  # best 20 of the ramp


def test_lsh_recall_vs_brute_force():
    import pyarrow.parquet as pq

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    t = pq.read_table(f"{SF}/embeddings.parquet")
    q = np.stack(
        [np.asarray(v, np.float64) for v in t.column("embedding").to_pylist()[:2]]
    )
    bf = SIM.brute_force_topk(ds, q, k=10)
    lsh = SIM.lsh_topk(ds, q, k=10)
    for qi in (0, 1):
        a = set(bf[bf["query_id"] == qi]["vec_id"])
        b = set(lsh[lsh["query_id"] == qi]["vec_id"])
        assert len(a & b) / 10 >= 0.5, f"LSH recall too low for q{qi}"
    # the query vector itself collides in every table -> always found
    assert lsh[(lsh["query_id"] == 0) & (lsh["rank"] == 1)]["vec_id"].iloc[0] == 0
    assert lsh[(lsh["query_id"] == 0) & (lsh["rank"] == 1)]["cosine_sim"].iloc[0] == 1.0
    # determinism: a second run returns the identical frame
    pd.testing.assert_frame_equal(lsh, SIM.lsh_topk(ds, q, k=10))


def test_lsh_persisted_signatures_equal_inflight(tmp_path):
    """Signatures written at ingest (Parquet round-trip) make lsh_topk
    return the IDENTICAL frame to computing them in-flight."""
    import pyarrow.parquet as pq

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    t = pq.read_table(f"{SF}/embeddings.parquet")
    q = np.stack(
        [np.asarray(v, np.float64) for v in t.column("embedding").to_pylist()[:2]]
    )
    sig_dir = str(tmp_path / "sigged")
    SIM.lsh_signatures(ds).write_parquet(sig_dir)
    sigged = ray.data.read_parquet(sig_dir)
    assert "lsh_sig" in sigged.schema().names
    got = SIM.lsh_topk(sigged, q, k=10)
    want = SIM.lsh_topk(ds, q, k=10)
    pd.testing.assert_frame_equal(
        got.sort_values(["query_id", "rank"]).reset_index(drop=True),
        want.sort_values(["query_id", "rank"]).reset_index(drop=True),
    )


def test_ivf_q_recall_vs_brute_force():
    """Integer-quantizer IVF (the driver-legible ann_ivf_topk path):
    recall@10 vs brute force and blocking invariance."""
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    t = pq.read_table(f"{SF}/embeddings.parquet")
    q = np.stack(
        [np.asarray(v, np.float64) for v in t.column("embedding").to_pylist()[:3]]
    )
    bf = SIM.brute_force_topk(ds, q, k=10)
    ivf = SIM.ivf_topk_q(ds, n_queries=3, k=10)
    for qi in (0, 1, 2):
        a = set(bf[bf["query_id"] == qi]["vec_id"])
        b = set(ivf[ivf["query_id"] == qi]["vec_id"])
        assert len(a & b) / 10 >= 0.5, f"IVF-q recall too low for q{qi}"
    # self at rank 1, cos 1.0, and blocking invariance
    assert ivf[(ivf["query_id"] == 1) & (ivf["rank"] == 1)]["vec_id"].iloc[0] == 1
    assert ivf[(ivf["query_id"] == 1) & (ivf["rank"] == 1)]["cosine_sim"].iloc[0] == 1.0
    pd.testing.assert_frame_equal(
        ivf, SIM.ivf_topk_q(ds.repartition(7), n_queries=3, k=10)
    )


def test_lsh_q_recall_vs_brute_force():
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    t = pq.read_table(f"{SF}/embeddings.parquet")
    q = np.stack(
        [np.asarray(v, np.float64) for v in t.column("embedding").to_pylist()[:3]]
    )
    bf = SIM.brute_force_topk(ds, q, k=10)
    lsh = SIM.lsh_topk_q(ds, n_queries=3, k=10)
    for qi in (0, 1, 2):
        a = set(bf[bf["query_id"] == qi]["vec_id"])
        b = set(lsh[lsh["query_id"] == qi]["vec_id"])
        assert len(a & b) / 10 >= 0.4, f"LSH-q recall too low for q{qi}"
    pd.testing.assert_frame_equal(
        lsh, SIM.lsh_topk_q(ds.repartition(5), n_queries=3, k=10)
    )


def test_ivf_q_near_dups_recall_vs_brute():
    """Integer-quantizer blocked near-dup pairs vs the brute-force pair
    set (same cosine >= threshold convention)."""
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = t.column("vec_id").to_numpy()
    m = np.stack([np.asarray(v, np.float64) for v in t.column("embedding").to_pylist()])
    mn = m / np.linalg.norm(m, axis=1)[:, None]
    s = mn @ mn.T
    ia, ib = np.nonzero(np.triu(s >= 0.3, k=1))
    bset = set(zip(ids[ia], ids[ib]))
    got = SIM.embedding_near_dups_ivf_q(ds, threshold=0.3)
    iset = set(zip(got["vec_a"], got["vec_b"]))
    assert iset <= bset  # within-bucket pairs are a subset of brute
    assert len(iset) / max(len(bset), 1) >= 0.3  # blocked recall floor
    # blocking invariance
    got2 = SIM.embedding_near_dups_ivf_q(ds.repartition(6), threshold=0.3)
    pd.testing.assert_frame_equal(got, got2)


def test_pq_recall_and_blocking_invariance():
    """Integer-exact product-quantization ANN (the driver-legible
    ann_pq_topk path): ADC shortlist + exact integer rerank recovers
    >= 0.7 of the brute-force top-10, and the whole pipeline is
    partition-invariant."""
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    t = pq.read_table(f"{SF}/embeddings.parquet")
    q = np.stack(
        [np.asarray(v, np.float64) for v in t.column("embedding").to_pylist()[:3]]
    )
    bf = SIM.brute_force_topk(ds, q, k=10)
    pqk = SIM.ann_pq_topk_q(ds, n_queries=3, k=10, m=16, kc=16, rerank=50)
    for qi in (0, 1, 2):
        a = set(bf[bf["query_id"] == qi]["vec_id"])
        b = set(pqk[pqk["query_id"] == qi]["vec_id"])
        assert len(a & b) / 10 >= 0.7, f"PQ recall too low for q{qi}"
    # self at rank 1 with distance 0
    r1 = pqk[(pqk["query_id"] == 2) & (pqk["rank"] == 1)]
    assert r1["vec_id"].iloc[0] == 2 and r1["qd2"].iloc[0] == 0
    pd.testing.assert_frame_equal(
        pqk, SIM.ann_pq_topk_q(ds.repartition(7), n_queries=3, k=10,
                               m=16, kc=16, rerank=50)
    )
