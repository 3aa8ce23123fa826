"""Text-analysis operators: tokenization, quality scoring, language
ID, fingerprinting (BASELINE.json extension surface).

All hot-path logic is built-in Spark SQL (split / array lambdas /
md5) — no Python UDFs — so these run JVM-side at 100 TB. The
`documents` testdata table is the canonical input (doc_id, text,
lang, source, n_chars).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# Tiny per-language marker lexicons for the heuristic language ID.
# Real corpora would use char n-gram profiles; the operator shape
# (score per language -> argmax) is the same.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "la", "los", "y", "es"),
    "zh": ("的", "是", "在", "了", "和"),
}

STOPWORDS = ("the", "a", "of", "and", "is", "in", "to")

TOKEN_SPLIT = r"\s+"


def tokens(text: Column) -> Column:
    """Whitespace tokenization of lowercased text (array<string>)."""
    return F.split(F.lower(F.trim(text)), TOKEN_SPLIT)


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def distinct_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def stopword_ratio(text: Column) -> Column:
    """Fraction of tokens that are stopwords — a quality signal."""
    toks = tokens(text)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return n_stop.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def type_token_ratio(text: Column) -> Column:
    """Distinct/total token ratio — low values flag repetitive docs."""
    toks = tokens(text)
    return F.size(F.array_distinct(toks)).cast("double") / F.greatest(
        F.size(toks), F.lit(1)
    ).cast("double")


def quality_score(text: Column) -> Column:
    """Composite quality score in [0, 1]: favors mid-length docs with
    lexical diversity and a natural stopword rate. Deterministic,
    monotone pieces — the exact weights are a policy choice.
    """
    n = token_count(text).cast("double")
    length_part = F.least(n / F.lit(100.0), F.lit(1.0))
    diversity_part = type_token_ratio(text)
    stop = stopword_ratio(text)
    stop_part = F.lit(1.0) - F.abs(stop - F.lit(0.3))
    return F.round(
        F.lit(0.4) * length_part + F.lit(0.4) * diversity_part + F.lit(0.2) * stop_part, 4
    )


def lang_score(text: Column, lang: str) -> Column:
    """Marker-hit ratio for one language."""
    toks = tokens(text)
    markers = LANG_MARKERS[lang]
    hits = F.size(F.filter(toks, lambda t: t.isin(*markers)))
    return F.round(hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double"), 4)


def detect_language(text: Column) -> Column:
    """Argmax language over marker scores; 'und' when all zero.

    Built as a fold over a struct array (score, lang) — max_by
    semantics without a shuffle or UDF.
    """
    toks = tokens(text)
    n = F.greatest(F.size(toks), F.lit(1)).cast("double")
    scored = F.array(
        *[
            F.struct(
                (F.size(F.filter(toks, lambda t: t.isin(*marks))).cast("double") / n).alias(
                    "score"
                ),
                F.lit(lang).alias("lang"),
            )
            for lang, marks in LANG_MARKERS.items()
        ]
    )
    best = F.array_max(scored)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text: Column) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct token set (catches shuffled/reordered duplicates that
    byte-hashing misses).
    """
    canonical = F.array_join(F.array_sort(F.array_distinct(tokens(text))), " ")
    return F.md5(canonical)


def with_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stage tokenization: attach ``_toks`` and ``_dtoks`` as
    materialized columns.

    Every downstream stat references these ATTRIBUTES instead of
    re-inlining the split/distinct expression tree. Higher-order array
    functions are CodegenFallback (no common-subexpression
    elimination), so computing the token array once per row instead of
    once per derived column is ~8× less work — the difference between
    a usable and an unusable per-row cost at 100 TB.
    """
    return df.withColumn("_toks", tokens(F.col(text_col))).withColumn(
        "_dtoks", F.array_distinct(F.col("_toks"))
    )


def staged_stats_columns() -> dict[str, Column]:
    """Stat columns over staged ``_toks``/``_dtoks`` (see with_tokens)."""
    toks, dtoks = F.col("_toks"), F.col("_dtoks")
    n = F.greatest(F.size(toks), F.lit(1)).cast("double")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    stop_ratio = n_stop.cast("double") / n
    ttr = F.size(dtoks).cast("double") / n
    quality = (
        F.lit(0.4) * F.least(F.size(toks).cast("double") / F.lit(100.0), F.lit(1.0))
        + F.lit(0.4) * ttr
        + F.lit(0.2) * (F.lit(1.0) - F.abs(stop_ratio - F.lit(0.3)))
    )
    return {
        "n_tokens": F.size(toks).cast("long"),
        "n_distinct_tokens": F.size(dtoks).cast("long"),
        "stopword_ratio": F.round(stop_ratio, 4),
        "type_token_ratio": F.round(ttr, 4),
        "quality": F.round(quality, 4),
        "fingerprint": F.md5(F.array_join(F.array_sort(dtoks), " ")),
    }


def staged_detect_language() -> Column:
    """detect_language over the staged ``_toks`` column."""
    toks = F.col("_toks")
    n = F.greatest(F.size(toks), F.lit(1)).cast("double")
    scored = F.array(
        *[
            F.struct(
                (F.size(F.filter(toks, lambda t: t.isin(*marks))).cast("double") / n).alias(
                    "score"
                ),
                F.lit(lang).alias("lang"),
            )
            for lang, marks in LANG_MARKERS.items()
        ]
    )
    best = F.array_max(scored)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full text-analysis column block (staged)."""
    staged = with_tokens(df, text_col)
    cols = staged_stats_columns()
    cols["detected_lang"] = staged_detect_language()
    return staged.withColumns(cols).drop("_toks", "_dtoks")


def bigrams(text: Column) -> Column:
    """Word bigrams of lowercased text (array<string>; empty for
    docs under two tokens).

    Built as zip_with over two slices of the token array — NOT as
    per-index `get(toks, i)` lambdas: higher-order functions are
    CodegenFallback with no common-subexpression elimination, so an
    inlined `toks` subtree inside the lambda re-splits the text on
    EVERY element access (O(tokens²·len) per doc — measured 17 s
    for 12.5k avg-54-token docs at the r12 ×25 probe, vs sub-second
    with this shape: the slices evaluate the split a constant
    number of times per row)."""
    toks = tokens(text)
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))


def dup_ratio_of(grams: Column) -> Column:
    """1 - distinct/total over an ALREADY-PROJECTED gram array —
    callers stage `bigrams()` through a projection first so the
    expensive array build isn't re-evaluated per consumer
    (higher-order fns are CodegenFallback: no CSE)."""
    n = F.size(grams)
    return F.when(
        n > 0,
        F.round(F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") / n, 4),
    ).otherwise(F.lit(0.0))


def dup_bigram_ratio(text: Column) -> Column:
    """Fraction of word bigrams that are repeats of an earlier bigram
    in the same document (1 - distinct/total) — the Gopher-style
    within-document repetition signal; high values flag degenerate
    boilerplate/spam docs. Pure array lambdas, map-only. Prefer
    bigrams() + dup_ratio_of() through a projection when the gram
    array has other consumers."""
    return dup_ratio_of(bigrams(text))


def word_ngrams(toks: Column, n: int) -> Column:
    """Word n-grams over an ALREADY-PROJECTED token array
    (array<string>; empty for docs under n tokens).

    F.slice accepts a Column start, so the whole construction is one
    transform over a sequence — JVM-side, no Python. Callers stage the
    token array through a projection first (CodegenFallback: no CSE).
    """
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def bm25_term_score(
    tf: Column, df: Column, dl: Column, n_docs: Column, avgdl: Column,
    k1: float = 1.2, b: float = 0.75,
) -> Column:
    """Per-(doc, term) BM25 contribution (Robertson/Sparck Jones,
    the +1 IDF variant used by Lucene so scores stay positive):

        idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1)
        s = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    All inputs are columns so corpus stats (N, avgdl, df) join in as
    broadcast literals — the per-doc side never shuffles for them.
    """
    idf = F.log(
        (n_docs.cast("double") - df.cast("double") + F.lit(0.5))
        / (df.cast("double") + F.lit(0.5))
        + F.lit(1.0)
    )
    tfd = tf.cast("double")
    norm = tfd + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * dl.cast("double") / avgdl.cast("double")
    )
    return idf * tfd * F.lit(k1 + 1.0) / norm
