"""Text-analysis stages for large-scale training-data pipelines.

All stages are actor-pool ``map_batches`` classes: constant state (compiled
regexes, stopword tables, language profiles) is built ONCE per actor in
``__init__``; ``__call__`` is fully vectorized pandas/numpy per batch.
These extend the reference's string-kernel surface (SURVEY.md §2.9) to the
operations a 100-TB text pipeline needs: token counting, quality scoring,
language ID, and document fingerprinting.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

STOPWORDS_EN = frozenset(
    "the a an and or of to in is are was were be been it this that with as "
    "for on at by from not".split()
)

# Tiny per-language marker vocabularies for the n-gram/stopword heuristic
# language-ID (no external models in this container).
_LANG_MARKERS = {
    "en": {"the", "and", "of", "is", "to", "in"},
    "de": {"der", "die", "das", "und", "ist", "nicht"},
    "fr": {"le", "la", "les", "et", "est", "dans"},
    "es": {"el", "la", "los", "y", "es", "en"},
}


class TokenStats:
    """Token count + quality-scoring signals per document.

    Quality heuristics follow the common published recipe (length bounds,
    punctuation/uppercase/digit ratios, stopword presence); every signal is
    an exact, SQL-mirrorable expression so the DuckDB oracle can verify it.
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        s = df[self.text_col].fillna("")
        trimmed = s.str.strip()
        n_chars = s.str.len().astype(np.int64)
        # tokens = runs of non-whitespace in the trimmed string
        token_count = np.where(
            trimmed.str.len() == 0, 0, trimmed.str.count(r"\s+") + 1
        ).astype(np.int64)
        punct_count = s.str.count(r"[.!?,;:]").astype(np.int64)
        digit_count = s.str.count(r"[0-9]").astype(np.int64)
        upper_count = s.str.count(r"[A-Z]").astype(np.int64)
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_chars": n_chars,
                "token_count": token_count,
                "punct_count": punct_count,
                "digit_ratio": (digit_count / n_chars.clip(lower=1)).round(6),
                "upper_ratio": (upper_count / n_chars.clip(lower=1)).round(6),
                "mean_token_len": (
                    trimmed.str.replace(r"\s+", "", regex=True).str.len()
                    / np.maximum(token_count, 1)
                ).round(6),
            }
        )
        return out


def json_int_column(s: pd.Series, key: str) -> pd.Series:
    """Extract an integer field from a JSON string column, vectorized.

    Fast path: one compiled-regex ``str.extract`` per batch — exact for
    flat objects with unquoted integer values (this corpus's shape).
    Rows the regex misses but that do mention the key (nested objects,
    the value quoted, whitespace oddities) fall back to ``json.loads``
    row-by-row — the RARE path, so the kernel stays vectorized on real
    data while remaining correct on adversarial rows.  Missing key /
    null / malformed JSON → <NA>."""
    import json as _json
    import re as _re

    pat = rf'"{_re.escape(key)}"\s*:\s*(-?\d+)\s*[,}}]'
    fast = s.str.extract(pat, expand=False)
    # the regex has no notion of depth — a nested object's same-named
    # field would shadow the top-level one, so only FLAT rows (exactly
    # one '{') may take the fast path; nested rows go to json.loads
    flat = s.str.count(r"\{") == 1
    fast = fast.where(flat)
    out = pd.array(fast, dtype="Int64")
    retry = fast.isna() & s.notna() & s.str.contains(
        f'"{_re.escape(key)}"', regex=False
    )
    if retry.any():
        for i in np.flatnonzero(retry.to_numpy()):
            try:
                v = _json.loads(s.iloc[i]).get(key)
                if isinstance(v, bool) or not isinstance(v, int):
                    continue
                out[i] = v
            except (ValueError, AttributeError):
                continue
    return pd.Series(out, index=s.index)


# GPT-2-style pretokenizer (Radford et al. 2019, public regex), ASCII
# word/number classes so Python re and DuckDB RE2 agree codepoint-for-
# codepoint (verified over adversarial strings in tests/test_text.py):
# contraction suffixes, space-prefixed letter runs, digit runs, symbol
# runs, whitespace runs.
BPE_PRETOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|\s+"
)


class BpePretokenStats:
    """BPE-ish token counting: the number of pretokenizer matches — the
    unit actual BPE vocabularies are trained over, and a far better
    length signal for LLM data budgeting than whitespace tokens (code
    and punctuation-dense text split much finer).  Regex compiled once
    per actor; counting is one vectorized ``str.count`` per batch."""

    def __init__(self, text_col: str = "text"):
        import re

        self.text_col = text_col
        self.pattern = re.compile(BPE_PRETOKEN_PATTERN)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        s = df[self.text_col].fillna("")
        bpe = s.str.count(self.pattern).astype(np.int64)
        trimmed = s.str.strip()
        ws = np.where(
            trimmed.str.len() == 0, 0, trimmed.str.count(r"\s+") + 1
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "bpe_token_count": bpe,
                "ws_token_count": ws,
                # chars per BPE token ≈ compression ratio of the corpus
                "chars_per_token": (
                    s.str.len().astype(np.int64) / np.maximum(bpe, 1)
                ).round(6),
            }
        )


# ---------------------------------------------------------------------------
# Real merge-table BPE encoding (char-level, deterministic)
# ---------------------------------------------------------------------------

# Deterministic in-repo seed corpus for merge-table training: code-ish
# English so the learned merges look like real subwords over the synthetic
# documents table.  Training on a CONSTANT (not the input corpus) keeps the
# merge table identical between the Ray encoder and the SQL oracle without
# either having to retrain per scale factor.
BPE_SEED_CORPUS = (
    "def process_batch(batch): return batch.filter(lambda row: row.valid)\n"
    "the quick brown fox jumps over the lazy dog while the engine streams\n"
    "for part in partitions: commit(part, epoch, table, stats, digest)\n"
    "import numpy as np; values = np.zeros(128, dtype=np.int64)\n"
    "select repo, path, count(*) as n from events group by repo, path\n"
    "a change event reader emits insert update delete events keyed by\n"
    "the merge fold is deterministic so a retried task re derives the\n"
    "same bytes and a duplicate rename is harmless under task retry\n"
    "replaying the change log converges to the exact final table state\n"
    "with content sha256 equality verified for every surviving row\n"
) * 2


def bpe_merge_table(n_merges: int = 64) -> list[tuple[str, str]]:
    """Train a char-level BPE merge table on ``BPE_SEED_CORPUS`` —
    classic Sennrich-style training (count adjacent symbol pairs over
    pretoken frequencies, merge the most frequent, repeat), with a
    lexicographic tie-break so the table is bit-deterministic.  ~64
    merges is enough to exercise multi-level merges (single chars →
    bigrams → subwords) while keeping the SQL oracle's recursive replay
    cheap."""
    import re as _re
    from collections import Counter

    pat = _re.compile(BPE_PRETOKEN_PATTERN)
    words = Counter(pat.findall(BPE_SEED_CORPUS))
    seqs = {w: list(w) for w in words}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, c in words.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += c
        if not pairs:
            break
        # tie-break: highest count, then lexicographically largest pair
        best = max(pairs, key=lambda p: (pairs[p], p))
        merges.append(best)
        a, b = best
        for w, s in seqs.items():
            i, out = 0, []
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int],
                    n_merges: int) -> list[str]:
    """Encode one pretoken by applying merges in rank order (foldl).
    Equivalent to the iterative lowest-rank-pair algorithm: a merge can
    only create adjacencies for HIGHER-rank rules (a rule containing the
    merged token was necessarily learned after it), so rank order never
    misses an opportunity."""
    s = list(word)
    if len(s) < 2:
        return s
    present = True
    for rank in range(n_merges):
        if not present:
            break
        i, out, hit = 0, [], False
        while i < len(s):
            if (
                i < len(s) - 1
                and ranks.get((s[i], s[i + 1])) == rank
            ):
                out.append(s[i] + s[i + 1])
                i += 2
                hit = True
            else:
                out.append(s[i])
                i += 1
        if hit:
            s = out
        if len(s) < 2:
            break
    return s


class BpeEncode:
    """Actor-pool stage: REAL merge-table BPE encoding (not just the
    pretokenizer).  The merge table, rank dict and pretokenizer regex
    build once per actor; encoding caches pretoken→tokens per actor
    (Zipfian pretoken reuse makes the cache hit rate very high).
    Outputs the exact token sequence (joined with ``\\x1f``) plus the
    real token count — SQL-oracled by replaying the same merge table
    with a recursive CTE over a delimiter representation.

    Reference analogue: the closest thing the reference has is
    LENGTH()-based truncation checks (``src/data_transformer.py``);
    token-exact budgeting is a training-data-pipeline requirement."""

    SEP = "\x1f"

    def __init__(self, text_col: str = "text", n_merges: int = 64):
        import re as _re

        self.text_col = text_col
        self.n_merges = n_merges
        self.pattern = _re.compile(BPE_PRETOKEN_PATTERN)
        merges = bpe_merge_table(n_merges)
        self.ranks = {pair: i for i, pair in enumerate(merges)}
        self._cache: dict[str, list[str]] = {}

    def _encode(self, tok: str) -> list[str]:
        hit = self._cache.get(tok)
        if hit is None:
            hit = bpe_encode_word(tok, self.ranks, self.n_merges)
            if len(self._cache) < 1_000_000:
                self._cache[tok] = hit
        return hit

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        counts = np.zeros(len(df), dtype=np.int64)
        joined: list[str] = []
        for i, text in enumerate(df[self.text_col].fillna("")):
            toks: list[str] = []
            for pre in self.pattern.findall(text):
                toks.extend(self._encode(pre))
            counts[i] = len(toks)
            joined.append(self.SEP.join(toks))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "bpe_token_count": counts,
                "bpe_tokens": joined,
            }
        )


class QualityScore:
    """Composite 0-100 quality score with pass/fail gate.

    The scoring thresholds mirror published text-quality filters (Gopher /
    C4-style length and symbol-ratio rules) reduced to deterministic
    arithmetic so results are oracle-checkable."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.stats = TokenStats(text_col)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        st = self.stats(df)
        score = (
            np.minimum(st["token_count"], 100).astype(np.float64)  # length credit
            - 50.0 * st["digit_ratio"]
            - 30.0 * st["upper_ratio"]
            + np.minimum(st["punct_count"], 10)
        ).round(4)
        st["quality_score"] = score
        st["passes_quality"] = (
            (st["token_count"] >= 5) & (st["digit_ratio"] < 0.3) & (score > 10)
        )
        return st[["doc_id", "token_count", "quality_score", "passes_quality"]]


class LangId:
    """Stopword-marker language ID heuristic (stateful: marker tables and
    the tokenizer regex are compiled once per actor).

    Deliberately per-row, with receipts: the explode+groupby
    vectorization (the ``RepetitionStats`` pattern) was built and A/B'd
    at 100k docs — 4.2 s vs 1.3 s for this loop, 3× SLOWER, because
    regex tokenization dominates and pandas ``str.findall`` alone
    (1.77 s, list-Series construction + the ``[:200]`` slice pass)
    costs more than this entire path; the downstream explode / lower /
    drop_duplicates / marker-join added another 2 s.  The per-row body
    is a compiled ``findall`` plus six C-level frozenset intersections
    over ≤200 words — there is no Python-per-token work to vectorize
    away.  Outputs were verified identical before reverting."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word_re = re.compile(r"[a-zA-Z']+")
        self.markers = {k: frozenset(v) for k, v in _LANG_MARKERS.items()}

    def _score_one(self, text: str) -> str:
        words = set(w.lower() for w in self.word_re.findall(text or "")[:200])
        best, best_hits = "unknown", 0
        for lang, marks in self.markers.items():
            hits = len(words & marks)
            if hits > best_hits:
                best, best_hits = lang, hits
        return best

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "detected_lang": df[self.text_col].map(self._score_one),
                "lang": df["lang"],
            }
        )


class RepetitionStats:
    """Gopher-style repetition signals per document: the fraction of word
    2-grams that are repeats (1 − distinct/total) and the highest single-
    word frequency share — the standard filters for loopy/boilerplate text.

    Vectorized across the whole batch: one token explode (np.repeat index +
    concatenated splits), pandas groupby counts — no per-document Python.
    Tokenization is ``split(" ")`` and rounding half-away, matching the
    DuckDB oracle expression for expression."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        s = df[self.text_col].fillna("")
        splits = s.str.split(" ")
        n = splits.str.len().to_numpy(np.int64)  # words per doc (>=1)
        toks = np.concatenate(splits.to_numpy()) if len(df) else np.array([], object)
        doc = np.repeat(np.arange(len(df), dtype=np.int64), n)

        wf = pd.DataFrame({"d": doc, "t": toks})
        per_word = wf.groupby(["d", "t"], sort=False).size()
        maxc = per_word.groupby(level=0).max().reindex(
            range(len(df)), fill_value=0
        ).to_numpy(np.int64)

        # 2-grams: adjacent token pairs within a doc (mask out boundaries)
        same_doc = doc[:-1] == doc[1:] if len(doc) > 1 else np.array([], bool)
        g = pd.DataFrame(
            {
                "d": doc[:-1][same_doc],
                "g": pd.Series(toks[:-1][same_doc]) + " " + pd.Series(toks[1:][same_doc]),
            }
        )
        d2 = (
            g.groupby("d")["g"].nunique().reindex(range(len(df)), fill_value=0)
            .to_numpy(np.int64)
        )
        total2 = np.maximum(n - 1, 0)
        with np.errstate(invalid="ignore", divide="ignore"):
            dup_frac = np.where(
                total2 > 0, (total2 - d2) * 1.0 / total2, 0.0
            )
        rha6 = lambda x: np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "dup_2gram_frac": rha6(dup_frac),
                "max_word_ratio": rha6(maxc * 1.0 / n),
            }
        )


class StopwordStats:
    """Stopword count/ratio per document — the standard fluency signal in
    published text-quality filters (alongside TokenStats' symbol ratios).

    One compiled whole-word alternation regex, applied via a single
    vectorized ``str.count`` pass per batch; DuckDB mirrors it with
    ``regexp_extract_all`` so the output is SQL-oracled."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        # sorted for a deterministic pattern; \b keeps whole words only
        self.pattern = r"\b(?:" + "|".join(sorted(STOPWORDS_EN)) + r")\b"

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        s = df[self.text_col].fillna("")
        trimmed = s.str.strip()
        token_count = np.where(
            trimmed.str.len() == 0, 0, trimmed.str.count(r"\s+") + 1
        ).astype(np.int64)
        stop_count = s.str.lower().str.count(self.pattern).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "token_count": token_count,
                "stopword_count": stop_count,
                "stopword_ratio": (
                    stop_count / np.maximum(token_count, 1)
                ).round(6),
            }
        )


class GopherSignals:
    """Gopher-style composite quality gate (Rae et al. 2021 §A1.1 — the
    published rule family: word-count window, mean-word-length window,
    stopword floor, repetition ceilings), reduced to deterministic
    ``split(' ')``/regex arithmetic so every signal AND the final boolean
    replay exactly in SQL.

    One batch pass computes all five signals (the repetition kernel is
    shared with :class:`RepetitionStats`); thresholds are class constants
    mirrored verbatim in the DuckDB oracle.  All ratio comparisons happen
    on the 6-dp half-away-rounded values — the identical doubles both
    engines produce — so boundary docs gate the same way on both sides.
    """

    MIN_WORDS, MAX_WORDS = 15, 10_000
    MIN_MEAN_LEN, MAX_MEAN_LEN = 3.0, 10.0
    MIN_STOPWORD_RATIO = 0.03
    MAX_DUP_2GRAM = 0.10
    MAX_WORD_RATIO = 0.20

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.rep = RepetitionStats(text_col)
        # whole-word stopword alternation, compiled once per actor
        self.stop_re = re.compile(
            r"\b(?:" + "|".join(sorted(STOPWORDS_EN)) + r")\b"
        )

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        rha6 = lambda x: np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6
        s = df[self.text_col].fillna("")
        # split(' ') token model (matches RepetitionStats and the oracle's
        # string_split): #separators == n-1 exactly, so the non-space char
        # total is len(text) - (n-1) with no second scan.
        n = s.str.split(" ").str.len().to_numpy(np.int64)
        mean_len = rha6((s.str.len().to_numpy(np.int64) - (n - 1)) / n)
        stop = s.str.lower().str.count(self.stop_re).to_numpy(np.int64)
        stop_ratio = rha6(stop / np.maximum(n, 1))
        rep = self.rep(df)
        dup2 = rep["dup_2gram_frac"].to_numpy()
        maxw = rep["max_word_ratio"].to_numpy()
        passes = (
            (n >= self.MIN_WORDS)
            & (n <= self.MAX_WORDS)
            & (mean_len >= self.MIN_MEAN_LEN)
            & (mean_len <= self.MAX_MEAN_LEN)
            & (stop_ratio >= self.MIN_STOPWORD_RATIO)
            & (dup2 <= self.MAX_DUP_2GRAM)
            & (maxw <= self.MAX_WORD_RATIO)
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "word_count": n,
                "mean_word_len": mean_len,
                "stopword_ratio": stop_ratio,
                "dup_2gram_frac": dup2,
                "max_word_ratio": maxw,
                "passes_gopher": passes,
            }
        )


class Fingerprint:
    """Content fingerprints: sha256/md5 hex (oracle-checkable in DuckDB)
    plus a polynomial rolling hash (Karp-Rabin) over the raw bytes."""

    MOD = (1 << 61) - 1
    BASE = 257

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def _rolling(self, text: str) -> int:
        h = 0
        for b in (text or "").encode()[:4096]:
            h = (h * self.BASE + b) % self.MOD
        return h

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        texts = df[self.text_col].fillna("")
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "sha256_hex": [hashlib.sha256(t.encode()).hexdigest() for t in texts],
                "md5_hex": [hashlib.md5(t.encode()).hexdigest() for t in texts],
                "rolling_hash": np.fromiter(
                    (self._rolling(t) for t in texts), dtype=np.int64, count=len(texts)
                ),
            }
        )


# (pattern, replacement) applied IN ORDER — email first so its digits are
# gone before the looser numeric patterns run; every pattern is RE2-safe
# (no backrefs/lookaround) so a SQL oracle's regexp engine agrees exactly.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
)


class PiiRedact:
    """PII scrubbing (emails / IPv4 / phone numbers) — the redaction pass a
    training-data pipeline runs before anything else sees raw text.
    Stateful actor-pool stage: patterns compile once per actor; per batch
    it's vectorized pandas str kernels (one count + one replace pass per
    pattern, sequential so counts reflect what each pattern actually saw).
    Returns (doc_id, clean_text, n_redactions)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.pats = [(re.compile(p), repl) for p, repl in PII_PATTERNS]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        s = df[self.text_col].astype(str)
        n = np.zeros(len(df), dtype=np.int64)
        for pat, repl in self.pats:
            n += s.str.count(pat).to_numpy(np.int64)
            s = s.str.replace(pat, repl, regex=True)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "clean_text": s.to_numpy(object),
                "n_redactions": n,
            }
        )
