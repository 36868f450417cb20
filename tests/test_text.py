

def test_bpe_pretoken_regex_agrees_with_duckdb_re2():
    """The doc_bpe_tokens oracle replays BPE_PRETOKEN_PATTERN in DuckDB
    RE2 — pin that both regex engines count the same matches on
    adversarial inputs (contractions, quotes, unicode, whitespace runs,
    code)."""
    import re

    import duckdb

    from sql_etl_pipeline_ray.stages.text import BPE_PRETOKEN_PATTERN

    rx = re.compile(BPE_PRETOKEN_PATTERN)
    cases = [
        "def f_0_v1996():\n    return offset stream(actor)\n",
        "It's   the 3rd test-case, isn't it? 100%!",
        "", " ", "   \t\n ", "a", "'", "''", "'s", "x's",
        "don't CAN'T won't o'clock rock'n'roll",
        "snake_case camelCase kebab-case x86_64",
        "unicode café naïve 東京 — em–dash … ellipsis",
        "a'b'c'd 'leading trailing' mixed'", "1'000'000",
        "!!!???...,,,;;;:::", "\t\t\t", "a b",  # nbsp is \s in both
    ]
    for t in cases:
        py = len(rx.findall(t))
        dk = duckdb.sql(
            "SELECT len(regexp_extract_all(?, ?))",
            params=[t, BPE_PRETOKEN_PATTERN],
        ).fetchone()[0]
        assert py == dk, (t, py, dk)


def test_bpe_pretoken_stats_kernel():
    import pandas as pd

    from sql_etl_pipeline_ray.stages.text import BpePretokenStats

    df = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["It's a test.", "", "  x  "]}
    )
    out = BpePretokenStats()(df)
    # "It's a test." -> It / 's / ' a' / ' test' / '.' = 5
    assert out["bpe_token_count"].tolist() == [5, 0, 3]  # ws, x, ws
    assert out["ws_token_count"].tolist() == [3, 0, 1]
    assert out.loc[0, "chars_per_token"] == round(12 / 5, 6)


def test_json_int_column_fast_and_fallback_paths():
    import numpy as np
    import pandas as pd

    from sql_etl_pipeline_ray.stages.text import json_int_column

    s = pd.Series(
        [
            '{"k": 42}',            # fast path
            '{"k":-7,"x":1}',       # negative, no spaces
            '{"x": {"k": 5}, "k": 9}',  # nested decoy + real top-level
            '{"k": "33"}',          # quoted -> json fallback -> not an int
            '{"k": true}',          # bool is not an int
            '{"k": 1.5}',           # float is not an int
            '{"x": 1}',             # key missing
            "not json at all",      # malformed
            None,                   # null row
            '{ "k" : 100 }',        # whitespace everywhere
        ]
    )
    out = json_int_column(s, "k")
    want = [42, -7, 9, pd.NA, pd.NA, pd.NA, pd.NA, pd.NA, pd.NA, 100]
    got = [v if not pd.isna(v) else pd.NA for v in out]
    assert all(
        (g is pd.NA and w is pd.NA) or g == w for g, w in zip(got, want)
    ), got


def test_gopher_signals_kernel_and_gate():
    """GopherSignals: hand-computable signals on crafted docs, and the
    gate boolean fires each rule independently."""
    import pandas as pd

    from sql_etl_pipeline_ray.stages.text import GopherSignals

    good = "the quick brown fox jumps over the lazy dog and then " \
           "it runs far away from the noisy busy town at dusk"  # 22 words
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                good,                         # passes every rule
                "short text here",            # < MIN_WORDS
                " ".join(["the"] * 30),       # repetition: max_word_ratio=1
                " ".join(f"w{i}" for i in range(30)),  # no stopwords
            ],
        }
    )
    out = GopherSignals()(df).set_index("doc_id")
    assert bool(out.loc[0, "passes_gopher"])
    assert not out.loc[1, "passes_gopher"] and out.loc[1, "word_count"] == 3
    assert not out.loc[2, "passes_gopher"]
    assert out.loc[2, "max_word_ratio"] == 1.0
    # 29 bigrams, 1 distinct -> (29-1)/29, rounded half-away to 6dp
    assert out.loc[2, "dup_2gram_frac"] == round(28 / 29, 6)
    assert not out.loc[3, "passes_gopher"]
    assert out.loc[3, "stopword_ratio"] == 0.0
    # word model: split(' ') — mean word length excludes the separators
    assert out.loc[0, "word_count"] == 22
    total_chars = len(good) - (22 - 1)
    assert out.loc[0, "mean_word_len"] == round(total_chars / 22, 6)


def test_gopher_gate_splits_synthetic_corpus():
    """The shipped thresholds must actually split the synthetic corpus
    (a gate that passes or rejects everything is a dead operator)."""
    from sql_etl_pipeline_ray.pipelines.training_data import docs_gopher_gate

    out = docs_gopher_gate("/root/testdata/sf0.001").to_pandas()
    rate = out["passes_gopher"].mean()
    assert 0.05 < rate < 0.99, rate


# ---------------------------------------------------------------------------
# Real merge-table BPE (stages/text.bpe_merge_table / BpeEncode)
# ---------------------------------------------------------------------------


def test_bpe_merge_table_deterministic_and_multilevel():
    from sql_etl_pipeline_ray.stages.text import bpe_merge_table

    m1, m2 = bpe_merge_table(64), bpe_merge_table(64)
    assert m1 == m2 and len(m1) == 64
    # multi-level: some merges consume tokens produced by earlier merges
    produced = {a + b for a, b in m1}
    assert any(a in produced or b in produced for a, b in m1)


def test_bpe_foldl_equals_iterative_lowest_rank():
    """Property: rank-order foldl == iterative lowest-rank merging (the
    equivalence the SQL oracle's recursive replay relies on)."""
    import random
    import re

    from sql_etl_pipeline_ray.stages.text import (
        BPE_PRETOKEN_PATTERN, bpe_encode_word, bpe_merge_table)

    merges = bpe_merge_table(64)
    ranks = {p: i for i, p in enumerate(merges)}

    def iterative(word):
        s = list(word)
        while len(s) > 1:
            best, bi = None, None
            for i in range(len(s) - 1):
                r = ranks.get((s[i], s[i + 1]))
                if r is not None and (best is None or r < best):
                    best, bi = r, i
            if best is None:
                break
            s = s[:bi] + [s[bi] + s[bi + 1]] + s[bi + 2:]
        return s

    rng = random.Random(3)
    alpha = "abcdefghij eor tn()_:.123'"
    pat = re.compile(BPE_PRETOKEN_PATTERN)
    for _ in range(2000):
        w = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 14)))
        for pre in pat.findall(w):
            assert bpe_encode_word(pre, ranks, 64) == iterative(pre), pre


def test_bpe_encode_stage_roundtrip_and_cache():
    import pandas as pd

    from sql_etl_pipeline_ray.stages.text import BpeEncode

    enc = BpeEncode()
    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["the engine returns the table", "", None,
                 "the engine returns the table"],
    })
    out = enc(df)
    # concatenating the tokens reproduces the exact input text
    assert out["bpe_tokens"][0].replace("\x1f", "") == df["text"][0]
    assert out["bpe_token_count"][1] == 0 and out["bpe_tokens"][1] == ""
    assert out["bpe_token_count"][2] == 0
    # identical docs encode identically (and exercise the cache)
    assert out["bpe_tokens"][3] == out["bpe_tokens"][0]
    assert len(enc._cache) > 0
    # real merging happened: fewer tokens than characters
    assert out["bpe_token_count"][0] < len(df["text"][0])
