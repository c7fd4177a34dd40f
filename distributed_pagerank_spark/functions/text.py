"""Text-analysis column functions for training-data pipelines.

All hot-path functions are pure ``pyspark.sql.functions`` column
expressions — JVM-side, whole-stage-codegen'd, no Python per row — so they
run at parquet-scan speed over 100 TB document tables. The winnowing
fingerprint (inherently iterative) is the one Arrow-vectorized Pandas UDF.

Each function has an exact ANSI-SQL twin (see ``__spark_entry__.py``
``oracle_sql``) so the driver can verify results against DuckDB.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Small whole-word stopword marker sets per language for the n-gram-free
# language-ID heuristic. Deliberately tiny and fixed: the rule must be
# reproducible in ANSI SQL for the oracle twin.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "que", "de", "es"],
}

STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})


def token_count(text: Column | str) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    c = F.col(text) if isinstance(text, str) else text
    trimmed = F.trim(c)
    return F.when(c.isNull() | (trimmed == ""), F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_ish_token_count(text: Column | str) -> Column:
    """Sub-word-ish token count: splits on whitespace AND word/non-word
    boundaries (a cheap regex proxy for BPE tokenizers — counts runs of
    letters, digits, or single punctuation marks)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))


def _marker_count(c: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(pat), 0))


def lang_id(text: Column | str) -> Column:
    """Heuristic language ID: argmax of per-language stopword-marker hits,
    ties broken by fixed language order (en, de, fr, es), 'und' when no
    marker matches."""
    c = F.col(text) if isinstance(text, str) else text
    counts = {lang: _marker_count(c, ws) for lang, ws in LANG_MARKERS.items()}
    best = F.greatest(*counts.values())
    expr = F.lit("und")
    # reversed so earlier languages win ties (last when() checked first)
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when(counts[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(c.isNull() | (best == 0), F.lit("und")).otherwise(expr)


def punct_ratio(text: Column | str) -> Column:
    """Punctuation characters / total characters (0 for empty)."""
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c)
    p = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(p.cast("double") / n)


def stopword_ratio(text: Column | str) -> Column:
    """Stopword tokens / total tokens (0 for empty)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = token_count(c)
    stops = _marker_count(c, STOPWORDS)
    return F.when(toks == 0, F.lit(0.0)).otherwise(stops.cast("double") / toks)


def quality_score(text: Column | str) -> Column:
    """Composite quality in [0,1]: length saturation + low punctuation +
    stopword presence. Deterministic arithmetic, SQL-twinnable."""
    c = F.col(text) if isinstance(text, str) else text
    length_part = F.least(token_count(c).cast("double") / 100.0, F.lit(1.0))
    score = (
        0.4 * length_part
        + 0.3 * (1.0 - punct_ratio(c))
        + 0.3 * F.least(stopword_ratio(c) * 5.0, F.lit(1.0))
    )
    return F.when(c.isNull(), F.lit(0.0)).otherwise(score)


def normalized_fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 of the normalized text (lowercase,
    punctuation stripped, whitespace collapsed). Exact-dedup key."""
    c = F.col(text) if isinstance(text, str) else text
    norm = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(c), r"[^\w\s]", ""), r"\s+", " ")
    )
    return F.md5(norm)


def _let(expr: Column, body) -> Column:
    """Bind ``expr`` as a lambda variable: ``body`` receives a Column that
    Spark evaluates ONCE per row, however many times the body references
    it. Higher-order functions run interpreted (outside whole-stage
    codegen, so no common-subexpression elimination) — a subtree embedded
    k places inside a lambda is otherwise recomputed k times *per array
    element*; e.g. the pre-fix ``top_ngram_fraction`` re-split the whole
    document for every n-gram of every distinct n-gram (~400 s for 5k
    docs at sf0.1; ~2 s bound)."""
    return F.get(F.transform(F.array(expr), body), 0)


def _all_word_ngrams(c: Column, n: int) -> Column:
    """ALL word n-grams (with repeats, in order) as array<string> —
    JVM-side: split + transform over a sliding index range; no Python."""

    def build(toks: Column) -> Column:
        n_sh = F.size(toks) - (n - 1)
        # NB: F.sequence(0, -1) DESCENDS — guard the too-short case explicitly
        idx = F.when(n_sh <= 0, F.array().cast("array<int>")).otherwise(
            F.sequence(F.lit(0), n_sh - 1)
        )
        return F.transform(
            idx, lambda i: F.concat_ws(" ", *[F.get(toks, i + j) for j in range(n)])
        )

    return _let(F.split(F.trim(c), r"\s+"), build)


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles as array<string> (JVM-side)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.array_distinct(_all_word_ngrams(c, n))


def duplicate_line_fraction(text: Column | str) -> Column:
    """Gopher/MassiveText-style repetition signal: the fraction of
    non-blank (trimmed) lines that are repeats of another line in the
    same document. 0.0 for null/empty documents. Pure column expression
    — runs at scan speed; no shuffle, no Python."""
    c = F.col(text) if isinstance(text, str) else text
    lines = F.filter(
        F.transform(F.split(c, "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )

    def frac(ls: Column) -> Column:
        n = F.size(ls)
        return F.when(n <= 0, F.lit(0.0)).otherwise(
            (n - F.size(F.array_distinct(ls))).cast("double") / n
        )

    return F.when(c.isNull(), F.lit(0.0)).otherwise(_let(lines, frac))


def duplicate_ngram_fraction(text: Column | str, n: int = 3) -> Column:
    """Fraction of word n-grams that are repeats of an n-gram already
    seen in the document (0.0 when the document has no n-grams). The
    classic boilerplate/loop detector over crawled text."""
    c = F.col(text) if isinstance(text, str) else text

    def frac(grams: Column) -> Column:
        m = F.size(grams)
        return F.when(m <= 0, F.lit(0.0)).otherwise(
            (m - F.size(F.array_distinct(grams))).cast("double") / m
        )

    return F.when(c.isNull(), F.lit(0.0)).otherwise(
        _let(_all_word_ngrams(c, n), frac)
    )


def top_ngram_fraction(text: Column | str, n: int = 2) -> Column:
    """Fraction of all word n-grams occupied by the single most frequent
    one (0.0 when the document has no n-grams). High values flag
    keyword-stuffed / template documents. O(m log m) per document and
    fully JVM-side: sort the gram array once, then a single aggregate()
    fold finds the longest run of equal neighbours (= the max frequency).
    Documents are bounded, the corpus is not, so the expensive axis stays
    the parallel one."""
    c = F.col(text) if isinstance(text, str) else text

    def top_frac(grams: Column) -> Column:
        m = F.size(grams)
        best = _let(
            F.array_sort(grams),
            lambda sg: F.aggregate(
                sg,
                F.struct(
                    F.lit("").alias("prev"),
                    F.lit(0).alias("run"),
                    F.lit(0).alias("best"),
                ),
                lambda acc, x: F.struct(
                    x.alias("prev"),
                    F.when(x == acc["prev"], acc["run"] + 1)
                    .otherwise(F.lit(1))
                    .alias("run"),
                    F.greatest(
                        acc["best"],
                        F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
                    ).alias("best"),
                ),
                lambda acc: acc["best"],
            ),
        )
        return F.when(m <= 0, F.lit(0.0)).otherwise(best.cast("double") / m)

    return F.when(c.isNull(), F.lit(0.0)).otherwise(
        _let(_all_word_ngrams(c, n), top_frac)
    )


@F.pandas_udf(T.ArrayType(T.LongType()))
def winnow_fingerprints(texts: pd.Series) -> pd.Series:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    rolling polynomial hash over UNICODE-CODE-POINT k-grams (k=8), keep
    the min hash of every window of w=16 — a position-robust near-dup
    sketch. Code points (not utf-8 bytes) are the hash alphabet so the
    exact computation is expressible in ANSI SQL (``ord(substr(...))``)
    for the oracle twin.

    Arrow-vectorized (one Python call per batch); the per-string loop is
    C-speed numpy."""
    import numpy as np

    # MOD is a Mersenne prime < 2^31; cp < 2^21, so h*BASE+cp < 2^40 —
    # safe in uint64 without Python-int fallback.
    K, W, MOD, BASE = 8, 16, (1 << 31) - 1, 257
    out = []
    for t in texts:
        if t is None or len(t) < K:
            out.append([])
            continue
        # utf-32 little-endian = one uint32 per code point
        b = np.frombuffer(t.lower().encode("utf-32-le"), dtype=np.uint32)
        m = len(b) - K + 1
        if m <= 0:
            out.append([])
            continue
        # rolling hash of all k-grams, vectorized: sum cp[i+j]*BASE^(K-1-j)
        h = np.zeros(m, dtype=np.uint64)
        for j in range(K):
            h = (h * BASE + b[j : j + m]) % MOD
        if m <= W:
            out.append([int(h.min())])
            continue
        # min per sliding window of W via stride trick
        sw = np.lib.stride_tricks.sliding_window_view(h, W)
        mins = sw.min(axis=1)
        out.append([int(x) for x in np.unique(mins)])
    return pd.Series(out)
