

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
