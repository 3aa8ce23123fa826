"""Text-analysis query family (BASELINE.json extension surface) over
the `documents` table. Backed by operators/text.py; every hot path is
built-in SQL (split / array lambdas / md5), no Python UDFs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from g_etl_spark.operators import text as T
from g_etl_spark.queries import register
from g_etl_spark.tables import load

_TOKS = r"string_split_regex(lower(trim(text)), '\s+')"
_STOP_IN = "('the','a','of','and','is','in','to')"


@register(
    "q40_text_stats",
    oracle=f"""
    SELECT doc_id,
           len({_TOKS})                                         AS n_tokens,
           len(list_distinct({_TOKS}))                          AS n_distinct_tokens,
           round(CAST(len(list_filter({_TOKS}, t -> t IN {_STOP_IN})) AS DOUBLE)
                 / greatest(len({_TOKS}), 1), 4)                AS stopword_ratio,
           round(CAST(len(list_distinct({_TOKS})) AS DOUBLE)
                 / greatest(len({_TOKS}), 1), 4)                AS type_token_ratio,
           md5(array_to_string(list_sort(list_distinct({_TOKS})), ' ')) AS fingerprint
    FROM documents
    ORDER BY doc_id
    """,
)
def q40_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, lexical-diversity + stopword quality signals,
    and the order-insensitive document fingerprint. Tokenization is
    staged once per row (operators/text.with_tokens) — the stats read
    materialized array attributes, not re-inlined split() trees."""
    d = T.with_tokens(load(spark, sf_dir, "documents"))
    cols = T.staged_stats_columns()
    return d.select(
        "doc_id",
        cols["n_tokens"].alias("n_tokens"),
        cols["n_distinct_tokens"].alias("n_distinct_tokens"),
        cols["stopword_ratio"].alias("stopword_ratio"),
        cols["type_token_ratio"].alias("type_token_ratio"),
        cols["fingerprint"].alias("fingerprint"),
    ).orderBy("doc_id")


@register(
    "q41_quality_by_source",
    oracle=f"""
    WITH scored AS (
        SELECT source,
               round(0.4 * least(CAST(len({_TOKS}) AS DOUBLE) / 100.0, 1.0)
                   + 0.4 * (CAST(len(list_distinct({_TOKS})) AS DOUBLE)
                            / greatest(len({_TOKS}), 1))
                   + 0.2 * (1.0 - abs(CAST(len(list_filter({_TOKS}, t -> t IN {_STOP_IN})) AS DOUBLE)
                                      / greatest(len({_TOKS}), 1) - 0.3)), 4) AS quality
        FROM documents
    )
    SELECT source,
           count(*)                  AS n_docs,
           round(avg(quality), 3)    AS avg_quality,
           round(min(quality), 4)    AS min_quality,
           round(max(quality), 4)    AS max_quality
    FROM scored
    GROUP BY source
    ORDER BY source
    """,
)
def q41_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score rolled up per source — the
    keep/drop/route signal of a training-data pipeline."""
    d = T.with_tokens(load(spark, sf_dir, "documents"))
    scored = d.select("source", T.staged_stats_columns()["quality"].alias("quality"))
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("quality"), 3).alias("avg_quality"),
            F.round(F.min("quality"), 4).alias("min_quality"),
            F.round(F.max("quality"), 4).alias("max_quality"),
        )
        .orderBy("source")
    )


@register(
    "q42_token_frequencies",
    oracle=f"""
    SELECT token, count(*) AS n, count(DISTINCT doc_id) AS n_docs
    FROM (SELECT doc_id, unnest({_TOKS}) AS token FROM documents)
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 25
    """,
)
def q42_token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequencies: UNNEST→rows (reference §2.7 array
    family, `UNNEST(list)` aab/002:17-19) + top-k.

    Scale: explode multiplies rows ~50×; the groupBy's map-side
    combine collapses per-partition token counts before the shuffle,
    so the exchange carries |vocab|·partitions rows, not token count.
    """
    d = load(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("doc_id").alias("n_docs"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(25)
    )


_SCORE = {
    lang: (
        f"round(CAST(len(list_filter({_TOKS}, t -> t IN "
        f"({', '.join(repr(m) for m in marks)}))) AS DOUBLE)"
        f" / greatest(len({_TOKS}), 1), 4)"
    )
    for lang, marks in T.LANG_MARKERS.items()
}


@register(
    "q43_language_id",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang AS labeled_lang,
               {_SCORE['en']} AS s_en, {_SCORE['de']} AS s_de,
               {_SCORE['fr']} AS s_fr, {_SCORE['es']} AS s_es,
               {_SCORE['zh']} AS s_zh
        FROM documents
    ),
    detected AS (
        SELECT doc_id, labeled_lang, s_en,
               CASE WHEN greatest(s_en, s_de, s_fr, s_es, s_zh) = 0 THEN 'und'
                    WHEN s_zh = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'zh'
                    WHEN s_fr = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'fr'
                    WHEN s_es = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'es'
                    WHEN s_en = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'en'
                    ELSE 'de' END AS detected_lang
        FROM scored
    )
    SELECT labeled_lang, detected_lang, count(*) AS n,
           round(avg(s_en), 4) AS avg_en_score
    FROM detected
    GROUP BY labeled_lang, detected_lang
    ORDER BY labeled_lang, detected_lang
    """,
)
def q43_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID (marker-lexicon argmax) cross-tabbed
    against the labeled lang column. Argmax = array_max over
    (score, lang) structs — ties break toward the lexicographically
    greatest language in both engines.
    """
    d = T.with_tokens(load(spark, sf_dir, "documents"))
    en_marks = T.LANG_MARKERS["en"]
    n = F.greatest(F.size("_toks"), F.lit(1)).cast("double")
    s_en = F.round(
        F.size(F.filter(F.col("_toks"), lambda t: t.isin(*en_marks))).cast("double") / n, 4
    )
    return (
        d.select(
            F.col("lang").alias("labeled_lang"),
            T.staged_detect_language().alias("detected_lang"),
            s_en.alias("s_en"),
        )
        .groupBy("labeled_lang", "detected_lang")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("s_en"), 4).alias("avg_en_score"))
        .orderBy("labeled_lang", "detected_lang")
    )


_BPE_PATTERN = "[a-z]+|[0-9]|[^a-z0-9\\s]"


@register(
    "q44_token_counting",
    oracle=f"""
    SELECT lang,
           CAST(sum(len({_TOKS})) AS BIGINT)                                   AS ws_tokens,
           CAST(sum(len(regexp_extract_all(lower(text), '{_BPE_PATTERN}'))) AS BIGINT) AS bpe_tokens,
           CAST(sum(length(text)) AS BIGINT)                                   AS n_chars,
           round(avg(CAST(len(regexp_extract_all(lower(text), '{_BPE_PATTERN}')) AS DOUBLE)
                     / greatest(len({_TOKS}), 1)), 3)                          AS bpe_per_word
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def q44_token_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways (BASELINE.json text-analysis surface):
    whitespace tokens and a BPE-ish regex lexer (letter runs, single
    digits, punctuation singletons — the GPT-style pre-tokenizer
    shape). Both are JVM regex ops; the ratio estimates tokens-per-
    word for budget planning."""
    d = load(spark, sf_dir, "documents")
    ws = F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    bpe = F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(_BPE_PATTERN), F.lit(0)))
    return (
        d.groupBy("lang")
        .agg(
            F.sum(ws).cast("long").alias("ws_tokens"),
            F.sum(bpe).cast("long").alias("bpe_tokens"),
            F.sum(F.length("text")).cast("long").alias("n_chars"),
            F.round(
                F.avg(bpe.cast("double") / F.greatest(ws, F.lit(1)).cast("double")), 3
            ).alias("bpe_per_word"),
        )
        .orderBy("lang")
    )


@register(
    "q45_winnowing_fingerprints",
    oracle=r"""
    WITH norm AS (
        SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
        FROM documents WHERE doc_id < 200
    ),
    grams AS (
        SELECT doc_id, t,
               CASE WHEN length(t) >= 8
                    THEN list_transform(range(1, length(t) - 8 + 2),
                                        i -> md5(substr(t, CAST(i AS INTEGER), 8)))
                    ELSE [md5(t)] END AS hashes
        FROM norm
    ),
    wins AS (
        SELECT doc_id,
               CASE WHEN len(hashes) >= 4
                    THEN list_transform(range(0, len(hashes) - 4 + 1),
                                        j -> list_aggregate(hashes[j+1:j+4], 'min'))
                    ELSE hashes END AS windows
        FROM grams
    )
    SELECT doc_id,
           CAST(len(list_distinct(windows)) AS BIGINT)          AS n_fingerprints,
           md5(array_to_string(list_sort(list_distinct(windows)), '')) AS fingerprint_md5
    FROM wins
    ORDER BY doc_id
    """,
)
def q45_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (the rolling-hash scheme of
    Schleimer/Wilkerson/Aiken): char 8-grams → hash → min per sliding
    window of 4 → distinct selected hashes. Staged projections keep
    each array pass evaluated once (CodegenFallback, no CSE)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    k, w = 8, 4
    t = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    staged = (
        d.select("doc_id", t.alias("_t"))
        .select(
            "doc_id",
            F.when(
                F.length("_t") >= k,
                F.transform(
                    F.sequence(F.lit(1), F.length("_t") - k + 1),
                    lambda i: F.md5(F.col("_t").substr(i, F.lit(k))),
                ),
            )
            .otherwise(F.array(F.md5(F.col("_t"))))
            .alias("_hashes"),
        )
        .select(
            "doc_id",
            F.when(
                F.size("_hashes") >= w,
                F.transform(
                    F.sequence(F.lit(0), F.size("_hashes") - w),
                    lambda j: F.array_min(F.slice(F.col("_hashes"), j + 1, w)),
                ),
            )
            .otherwise(F.col("_hashes"))
            .alias("_windows"),
        )
    )
    return staged.select(
        "doc_id",
        F.size(F.array_distinct("_windows")).cast("long").alias("n_fingerprints"),
        F.md5(F.array_join(F.array_sort(F.array_distinct("_windows")), "")).alias(
            "fingerprint_md5"
        ),
    ).orderBy("doc_id")


# Deterministic PII-bearing corpus: emails/phone-ish tokens injected
# in-query so the scrubber has real work in both engines.
_PII_CORPUS = """
    SELECT doc_id,
           text || ' contact user' || CAST(doc_id AS VARCHAR)
                || '@example.com or +46-70-' || CAST(1000000 + doc_id AS VARCHAR) AS text,
           source
    FROM documents WHERE doc_id < 300
"""


@register(
    "q46_pii_redaction",
    oracle=f"""
    WITH corpus AS ({_PII_CORPUS}),
    red AS (
        SELECT doc_id, source,
               regexp_replace(
                   regexp_replace(text, '[a-z0-9._]+@[a-z0-9.-]+', '<EMAIL>', 'g'),
                   '\\+?[0-9][0-9-]{{6,}}', '<PHONE>', 'g') AS redacted,
               len(regexp_extract_all(text, '[a-z0-9._]+@[a-z0-9.-]+'))   AS n_emails,
               len(regexp_extract_all(text, '\\+?[0-9][0-9-]{{6,}}'))     AS n_phones
        FROM corpus
    )
    SELECT source,
           count(*)                          AS n_docs,
           CAST(sum(n_emails) AS BIGINT)     AS emails_redacted,
           CAST(sum(n_phones) AS BIGINT)     AS phones_redacted,
           md5(array_to_string(list_sort(list(md5(redacted))), '')) AS redacted_digest
    FROM red
    GROUP BY source
    ORDER BY source
    """,
)
def q46_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (training-data hygiene): email/phone patterns
    redacted with regexp_replace, redaction counts audited, and a
    content digest proving byte-identical scrubbed output in both
    engines. Pure JVM regex — linear, no UDF."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    corpus = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +46-70-"),
            (F.col("doc_id") + 1000000).cast("string"),
        ).alias("text"),
        "source",
    )
    email_re = "[a-z0-9._]+@[a-z0-9.-]+"
    phone_re = r"\+?[0-9][0-9-]{6,}"
    red = corpus.select(
        "source",
        F.regexp_replace(
            F.regexp_replace("text", email_re, "<EMAIL>"), phone_re, "<PHONE>"
        ).alias("redacted"),
        F.size(F.regexp_extract_all("text", F.lit(email_re), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(phone_re), F.lit(0))).alias("n_phones"),
    )
    return (
        red.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_emails").cast("long").alias("emails_redacted"),
            F.sum("n_phones").cast("long").alias("phones_redacted"),
            F.md5(F.array_join(F.array_sort(F.collect_list(F.md5("redacted"))), "")).alias(
                "redacted_digest"
            ),
        )
        .orderBy("source")
    )


_QUALITY_SQL = f"""
    round(0.4 * least(CAST(len({_TOKS}) AS DOUBLE) / 100.0, 1.0)
        + 0.4 * (CAST(len(list_distinct({_TOKS})) AS DOUBLE)
                 / greatest(len({_TOKS}), 1))
        + 0.2 * (1.0 - abs(CAST(len(list_filter({_TOKS}, t -> t IN {_STOP_IN})) AS DOUBLE)
                           / greatest(len({_TOKS}), 1) - 0.3)), 4)
"""


@register(
    "q58_quality_filter_chain",
    oracle=f"""
    WITH scored AS (
        SELECT source, lang, n_chars,
               len({_TOKS}) AS n_tokens,
               CAST(len(list_filter({_TOKS}, t -> t IN {_STOP_IN})) AS DOUBLE)
                   / greatest(len({_TOKS}), 1) AS stop_ratio,
               {_QUALITY_SQL} AS quality
        FROM documents
    ),
    kept AS (
        SELECT * FROM scored
        WHERE n_tokens BETWEEN 30 AND 1000
          AND stop_ratio <= 0.6
          AND quality >= 0.55
    )
    SELECT s.source,
           s.n_docs,
           COALESCE(k.n_kept, 0) AS n_kept,
           round(COALESCE(k.n_kept, 0) / CAST(s.n_docs AS DOUBLE), 4) AS keep_rate,
           k.avg_quality_kept
    FROM (SELECT source, count(*) AS n_docs FROM scored GROUP BY 1) s
    LEFT JOIN (SELECT source, count(*) AS n_kept,
                      round(avg(quality), 4) AS avg_quality_kept
               FROM kept GROUP BY 1) k USING (source)
    ORDER BY s.source
    """,
)
def q58_quality_filter_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style heuristic filter CHAIN: length window + stopword-rate
    cap + composite quality floor, with per-source survival
    accounting (the keep-rate report a corpus build reviews before
    committing the filter policy).

    Scale: the whole chain is map-only column math fused into the
    scan stage; only the per-source rollup shuffles. Filters short-
    circuit in one pass — no per-filter materialization.
    """
    d = load(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    scored = d.select(
        "source",
        F.size(toks).alias("n_tokens"),
        T.stopword_ratio(F.col("text")).alias("stop_ratio"),
        T.quality_score(F.col("text")).alias("quality"),
    )
    kept = scored.filter(
        F.col("n_tokens").between(30, 1000)
        & (F.col("stop_ratio") <= 0.6)
        & (F.col("quality") >= 0.55)
    )
    per_src = scored.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    kept_src = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.round(F.avg("quality"), 4).alias("avg_quality_kept"),
    )
    return (
        per_src.join(kept_src, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
            F.round(
                F.coalesce("n_kept", F.lit(0.0)) / F.col("n_docs").cast("double"), 4
            ).alias("keep_rate"),
            "avg_quality_kept",
        )
        .orderBy("source")
    )


@register(
    "q59_repetition_filter",
    oracle=f"""
    WITH grams AS (
        SELECT doc_id, source,
               CASE WHEN len({_TOKS}) >= 2
                    THEN list_transform(range(1, len({_TOKS})),
                                        i -> {_TOKS}[i] || ' ' || {_TOKS}[i+1])
                    ELSE [] END AS g
        FROM documents
    ),
    scored AS (
        SELECT doc_id, source, len(g) AS n_bigrams,
               CASE WHEN len(g) > 0
                    THEN round(1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / len(g), 4)
                    ELSE 0.0 END AS dup_ratio
        FROM grams
    )
    SELECT doc_id, source, n_bigrams, dup_ratio
    FROM scored
    WHERE dup_ratio > 0.05
    ORDER BY doc_id
    """,
)
def q59_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition filter: flag docs
    whose duplicated-bigram fraction exceeds 0.05
    (operators/text.bigrams + dup_ratio_of) — degenerate boilerplate / spam
    detection.

    Scale: pure array lambdas in the scan stage (map-only); the only
    shuffle is the final order.
    """
    d = load(spark, sf_dir, "documents")
    # stage the gram array ONCE (projection barrier: higher-order fns
    # are CodegenFallback, no CSE), then derive count + ratio from it
    staged = d.select(
        "doc_id", "source", T.bigrams(F.col("text")).alias("_grams")
    )
    scored = staged.select(
        "doc_id",
        "source",
        F.size("_grams").cast("long").alias("n_bigrams"),
        T.dup_ratio_of(F.col("_grams")).alias("dup_ratio"),
    )
    return scored.filter(F.col("dup_ratio") > 0.05).orderBy("doc_id")


# BM25 constants — fixed so Spark and the oracle share literals.
_BM25_TERMS = ("dup", "spark", "join")
_BM25_K1, _BM25_B = 1.2, 0.75
_BM25_IN = "('" + "', '".join(_BM25_TERMS) + "')"


@register(
    "q74_bm25_topk",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, len({_TOKS}) AS dl, {_TOKS} AS t FROM documents
    ),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM base),
    tf AS (
        SELECT doc_id, dl, token, count(*) AS tf
        FROM (SELECT doc_id, dl,
                     unnest(list_filter(t, x -> x IN {_BM25_IN})) AS token
              FROM base)
        GROUP BY doc_id, dl, token
    ),
    dft AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
    scored AS (
        SELECT tf.doc_id,
               sum(
                   ln((CAST(stats.n_docs AS DOUBLE) - CAST(dft.df AS DOUBLE) + 0.5)
                      / (CAST(dft.df AS DOUBLE) + 0.5) + 1.0)
                   * CAST(tf.tf AS DOUBLE) * ({_BM25_K1} + 1.0)
                   / (CAST(tf.tf AS DOUBLE)
                      + {_BM25_K1} * (1.0 - {_BM25_B}
                                      + {_BM25_B} * CAST(tf.dl AS DOUBLE)
                                        / CAST(stats.avgdl AS DOUBLE)))
               ) AS bm25,
               count(*) AS n_terms
        FROM tf JOIN dft ON tf.token = dft.token CROSS JOIN stats
        GROUP BY tf.doc_id
    )
    SELECT doc_id, round(bm25, 4) AS bm25, n_terms
    FROM scored
    ORDER BY round(bm25, 4) DESC, doc_id
    LIMIT 10
    """,
)
def q74_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval: top-10 documents for a fixed term set
    (≙ the reference's ranked full-text lookup surface; scoring is
    the Lucene +1-IDF BM25 variant, operators/text.bm25_term_score).

    Scale: the token array is filtered to query terms BEFORE explode,
    so row multiplication is bounded by query-term hits, not document
    length. Corpus stats (N, avgdl — one row) and per-term df
    (|terms| rows) broadcast back; the only fact-sized shuffle is the
    groupBy(doc_id), and top-10 is a TakeOrdered, not a global sort.
    """
    d = load(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.size(T.tokens(F.col("text"))).alias("dl"),
        T.tokens(F.col("text")).alias("t"),
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        base.select(
            "doc_id",
            "dl",
            F.explode(
                F.filter(F.col("t"), lambda x: x.isin(*_BM25_TERMS))
            ).alias("token"),
        )
        .groupBy("doc_id", "dl", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dft = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dft), "token")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.sum(
                T.bm25_term_score(
                    F.col("tf"), F.col("df"), F.col("dl"),
                    F.col("n_docs"), F.col("avgdl"),
                    k1=_BM25_K1, b=_BM25_B,
                )
            ).alias("bm25"),
            F.count(F.lit(1)).alias("n_terms"),
        )
    )
    return (
        scored.select("doc_id", F.round("bm25", 4).alias("bm25"), "n_terms")
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(10)
    )


# Decontamination constants (eval slice + n-gram order + threshold).
_DECON_N = 5
_DECON_MOD = 25  # doc_id % 25 == 0 -> held-out eval slice
_DECON_THRESH = 0.05


@register(
    "q75_decontamination",
    oracle=f"""
    WITH grams AS (
        SELECT DISTINCT doc_id, g
        FROM (
            SELECT doc_id,
                   array_to_string(t[i.i : i.i + {_DECON_N - 1}], ' ') AS g
            FROM (SELECT doc_id, {_TOKS} AS t FROM documents),
                 LATERAL (SELECT unnest(generate_series(
                     1, greatest(len(t) - {_DECON_N - 1}, 0))) AS i) AS i
        )
    ),
    eval_grams AS (
        SELECT DISTINCT g FROM grams WHERE doc_id % {_DECON_MOD} = 0
    ),
    per_doc AS (
        SELECT t.doc_id,
               count(*)  AS n_grams,
               count(e.g) AS n_contaminated
        FROM (SELECT * FROM grams WHERE doc_id % {_DECON_MOD} <> 0) t
        LEFT JOIN eval_grams e ON t.g = e.g
        GROUP BY t.doc_id
    )
    SELECT doc_id, n_grams, n_contaminated,
           round(CAST(n_contaminated AS DOUBLE) / n_grams, 4) AS contamination,
           CAST(n_contaminated AS DOUBLE) / n_grams >= {_DECON_THRESH} AS flagged
    FROM per_doc
    ORDER BY doc_id
    """,
)
def q75_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination: fraction of each training doc's
    distinct word 5-grams that appear anywhere in the held-out eval
    slice (doc_id % 25 == 0) — the standard benchmark-leakage check a
    training-data pipeline runs before shipping a corpus.

    Scale: the eval slice is small BY CONSTRUCTION (benchmarks are
    thousands of docs, the corpus is billions), so its distinct gram
    universe broadcasts; training grams stream through a map-side
    broadcast left join and collapse in one groupBy(doc_id). Docs
    shorter than n tokens have no grams and drop out on both sides.
    """
    d = load(spark, sf_dir, "documents")
    staged = d.select("doc_id", T.tokens(F.col("text")).alias("t"))
    grams = staged.select(
        "doc_id",
        F.explode(
            F.array_distinct(T.word_ngrams(F.col("t"), _DECON_N))
        ).alias("g"),
    )
    eval_grams = (
        grams.filter(F.col("doc_id") % _DECON_MOD == 0).select("g").distinct()
    )
    train = grams.filter(F.col("doc_id") % _DECON_MOD != 0)
    per_doc = (
        train.join(
            # unhinted: the eval-split gram set grows with the corpus
            # (a fixed fraction of documents) — AQE broadcasts when
            # it fits; a forced broadcast OOMs at 100 TB
            eval_grams.withColumn("_hit", F.lit(1)), "g", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("_hit").alias("n_contaminated"),
        )
    )
    ratio = F.col("n_contaminated").cast("double") / F.col("n_grams")
    return per_doc.select(
        "doc_id",
        "n_grams",
        "n_contaminated",
        F.round(ratio, 4).alias("contamination"),
        (ratio >= _DECON_THRESH).alias("flagged"),
    ).orderBy("doc_id")


@register(
    "q85_bigram_logprob",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    bg AS (
        SELECT doc_id, t[i+1] AS w1, t[i+2] AS w2
        FROM (SELECT doc_id, t,
                     unnest(range(0, greatest(len(t) - 1, 0))) AS i
              FROM toks)
    ),
    c1 AS (SELECT w1, count(*) AS n1 FROM bg GROUP BY w1),
    cb AS (SELECT w1, w2, count(*) AS nb FROM bg GROUP BY w1, w2),
    v AS (SELECT count(DISTINCT tok) AS vocab
          FROM (SELECT unnest(t) AS tok FROM toks)),
    scored AS (
        SELECT bg.doc_id,
               ln((CAST(cb.nb AS DOUBLE) + 1.0)
                  / (CAST(c1.n1 AS DOUBLE) + vocab)) AS lp
        FROM bg JOIN cb USING (w1, w2) JOIN c1 USING (w1), v
    )
    SELECT doc_id, count(*) AS n_bigrams, round(avg(lp), 4) AS avg_logprob
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
)
def q85_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean log-probability under an add-one-smoothed
    bigram LM trained on the corpus itself — the CCNet-style
    perplexity quality signal (low avg_logprob = unusual/degenerate
    text) without an external model artifact: lp(w1 w2) =
    ln((c(w1,w2)+1) / (c(w1)+V)), where c(w1) counts bigram-first
    occurrences so the conditional marginalizes exactly.

    Scale: two count aggregates over the exploded bigram relation
    (shuffles on the gram keys), the vocab scalar broadcasts, and the
    scoring join reuses the bigram-key partitioning; the bigram
    relation is persisted once, not recomputed per consumer.
    """
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", T.tokens(F.col("text")).alias("_t"))
    pair = F.when(
        F.size("_t") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("_t") - 2),
            lambda i: F.struct(
                F.get("_t", i).alias("w1"), F.get("_t", i + 1).alias("w2")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    from pyspark.storagelevel import StorageLevel

    bg = (
        toks.select("doc_id", pair.alias("_bg"))
        .select("doc_id", F.explode("_bg").alias("_p"))
        .select("doc_id", F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    cb = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("nb"))
    vocab = (
        toks.select(F.explode("_t").alias("tok"))
        .agg(F.countDistinct("tok").alias("vocab"))
    )
    lp = F.log(
        (F.col("nb").cast("double") + F.lit(1.0))
        / (F.col("n1").cast("double") + F.col("vocab"))
    )
    return (
        bg.join(cb, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", lp.alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("lp"), 4).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


@register(
    "q96_boilerplate_grams",
    oracle="""
    WITH toks AS (
        SELECT doc_id, source, string_split(trim(text), ' ') AS ws
        FROM documents
    ),
    doc_grams AS (
        SELECT DISTINCT doc_id, source,
               unnest(list_transform(range(1, len(ws)),
                                     i -> ws[i] || ' ' || ws[i + 1])) AS gram
        FROM toks
    ),
    src_docs AS (
        SELECT source, count(DISTINCT doc_id) AS n_docs FROM doc_grams GROUP BY source
    ),
    gram_df AS (
        SELECT source, gram, count(DISTINCT doc_id) AS df
        FROM doc_grams GROUP BY source, gram
    ),
    boiler AS (
        SELECT g.source, g.gram
        FROM gram_df g JOIN src_docs s ON g.source = s.source
        WHERE g.df * 5 >= s.n_docs
    ),
    per_doc AS (
        SELECT d.doc_id, d.source,
               count(*) AS total_grams,
               count(b.gram) AS boiler_grams
        FROM doc_grams d
        LEFT JOIN boiler b ON d.source = b.source AND d.gram = b.gram
        GROUP BY d.doc_id, d.source
    )
    SELECT p.source,
           count(*)                                    AS n_docs,
           (SELECT count(*) FROM boiler b WHERE b.source = p.source) AS n_boiler_grams,
           round(avg(CAST(boiler_grams AS DOUBLE) / total_grams), 4) AS avg_boiler_frac
    FROM per_doc p
    GROUP BY p.source
    ORDER BY p.source
    """,
)
def q96_boilerplate_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-source boilerplate detection (the RefinedWeb/CCNet
    repeated-line filter, at gram granularity since this corpus has
    no line structure): a bigram present in >=20% of a source's
    documents is template boilerplate (threshold calibrated to this
    corpus's bigram df distribution — max df is 32%); report per source how much of
    each document it covers.

    Scale (measured at 500k docs / 75M gram rows, ×100 probe of the
    FULL pipeline): per-doc gram uniqueness is a MAP-SIDE
    array_distinct BEFORE the explode — the equivalent row-level
    distinct() was the dominant wide shuffle — and the per-source doc
    count reads the raw table, not the gram fan-out: 112 s → 78 s.
    Persisting the exploded relation for its two consumers was TRIED
    AND REJECTED on measurement (108 s): materializing 75M gram rows
    costs more than recomputing the map-side gram construction, which
    is scan-parallel and shuffle-free. The boiler set joins back
    broadcast-sized; at 100 TB the gram dictionary per source is
    bounded by template size, not corpus size.
    """
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.split(F.trim("text"), " ").alias("ws")
    )
    # guard: a 1-token doc has no bigram — sequence(0, -1) would
    # DESCEND in Spark while the oracle's range(1,1) is empty
    grams = F.when(
        F.size("ws") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("ws") - 2),
            lambda i: F.concat_ws(
                " ", F.element_at("ws", i + 1), F.element_at("ws", i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    doc_grams = d.select(
        "doc_id", "source", F.explode(F.array_distinct(grams)).alias("gram")
    )
    # docs-per-source: the oracle derives it from doc_grams, i.e. only
    # docs with >=1 bigram count. size(ws) >= 2 is that same set by
    # construction (a >=2-token doc always yields >=1 bigram), so the
    # engines agree even for 0/1-token docs — while keeping the count
    # on the raw scan, not the gram fan-out.
    src_docs = (
        d.filter(F.size("ws") >= 2)
        .groupBy("source")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
    )
    gram_df = doc_grams.groupBy("source", "gram").agg(
        F.countDistinct("doc_id").alias("df")
    )
    boiler = (
        gram_df.join(F.broadcast(src_docs), "source")
        .filter(F.col("df") * 5 >= F.col("n_docs"))
        .select("source", "gram")
    )
    n_boiler = boiler.groupBy("source").agg(F.count(F.lit(1)).alias("n_boiler_grams"))
    per_doc = (
        doc_grams.join(
            boiler.withColumn("is_boiler", F.lit(1)), ["source", "gram"], "left"
        )
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("total_grams"),
            F.count("is_boiler").alias("boiler_grams"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.avg(F.col("boiler_grams").cast("double") / F.col("total_grams")), 4
            ).alias("avg_boiler_frac"),
        )
        .join(F.broadcast(n_boiler), "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_boiler_grams", F.lit(0)).alias("n_boiler_grams"),
            "avg_boiler_frac",
        )
        .orderBy("source")
    )


@register(
    "q103_inverted_index",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS t FROM documents
    ),
    positioned AS (
        SELECT doc_id, t[i] AS term, CAST(i - 1 AS BIGINT) AS pos
        FROM toks, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) u
    ),
    postings AS (
        SELECT term, doc_id,
               count(*)                                   AS tf,
               array_to_string(list_sort(list(pos)), ',') AS positions
        FROM positioned
        GROUP BY term, doc_id
    )
    SELECT term,
           count(*)                                      AS df,
           CAST(sum(tf) AS BIGINT)                       AS cf,
           array_to_string(list_transform(
               list_sort(list([doc_id, tf])), x -> x[1]), ',') AS doc_list
    FROM postings
    GROUP BY term
    HAVING count(*) * 4 >= 3 * (SELECT count(*) FROM documents)
    ORDER BY df DESC, term
    """,
)
def q103_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction — the IR substrate beneath BM25
    (q74 computes scores; this MATERIALIZES the index): per term, the
    document frequency, collection frequency, and the doc-id posting
    list; per (term, doc), positions for phrase queries (asserted via
    the grouped tf/position layer both engines aggregate through).

    Restricted to near-universal terms (df >= 75% of the corpus, a
    broadcast scalar; the corpus vocabulary tops out at 80% df) to keep the cross-engine compare on the posting
    LIST representation compact; the build shape is identical at any
    df cutoff.

    Scale: one posexplode fan-out (corpus tokens), one (term, doc)
    aggregation, one term aggregation — the canonical two-level
    index build; posting lists are collected per TERM (bounded by
    df), never globally. At 100 TB you'd range-partition terms and
    write the postings bucketed by term so query-time lookups are
    pruned scans; `warehouse.write_bucketed` is that layout.
    """
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    positioned = d.select(
        "doc_id", F.posexplode(toks).alias("pos", "term")
    ).select("doc_id", "term", F.col("pos").cast("long").alias("pos"))
    postings = positioned.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf"),
        F.array_join(F.sort_array(F.collect_list("pos")), ",").alias("positions"),
    )
    return (
        postings.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("cf"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.array("doc_id", "tf"))),
                    lambda x: F.element_at(x, 1),
                ),
                ",",
            ).alias("doc_list"),
        )
        .crossJoin(F.broadcast(d.agg(F.count(F.lit(1)).alias("n_total"))))
        .filter(F.col("df") * 4 >= 3 * F.col("n_total"))
        .drop("n_total")
        .orderBy(F.desc("df"), "term")
    )


@register(
    "q121_reciprocal_rank_fusion",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, len({_TOKS}) AS dl, {_TOKS} AS t FROM documents
    ),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM base),
    tf AS (
        SELECT doc_id, dl, token, count(*) AS tf
        FROM (SELECT doc_id, dl,
                     unnest(list_filter(t, x -> x IN {_BM25_IN})) AS token
              FROM base)
        GROUP BY doc_id, dl, token
    ),
    dft AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
    scored AS (
        SELECT tf.doc_id,
               sum(
                   ln((CAST(stats.n_docs AS DOUBLE) - CAST(dft.df AS DOUBLE) + 0.5)
                      / (CAST(dft.df AS DOUBLE) + 0.5) + 1.0)
                   * CAST(tf.tf AS DOUBLE) * ({_BM25_K1} + 1.0)
                   / (CAST(tf.tf AS DOUBLE)
                      + {_BM25_K1} * (1.0 - {_BM25_B}
                                      + {_BM25_B} * CAST(tf.dl AS DOUBLE)
                                        / CAST(stats.avgdl AS DOUBLE)))
               ) AS bm25
        FROM tf JOIN dft ON tf.token = dft.token CROSS JOIN stats
        GROUP BY tf.doc_id
    ),
    bm AS (
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY round(bm25, 4) DESC, doc_id)
                    AS BIGINT) AS r
        FROM scored
        QUALIFY r <= 50
    ),
    q AS (
        SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        FROM embeddings WHERE vec_id = 0
    ),
    cs AS (
        SELECT e.vec_id,
               round(list_aggregate(list_transform(range(1, 65),
                                                   i -> CAST(e.embedding[i] AS DOUBLE) * q.qv[i]),
                                    'sum')
                     / (sqrt(list_aggregate(list_transform(e.embedding,
                                                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                                            'sum'))
                        * sqrt(list_aggregate(list_transform(q.qv, x -> x * x), 'sum'))),
                     3) AS cosine
        FROM embeddings e, q
    ),
    cr AS (
        SELECT vec_id AS doc_id,
               CAST(row_number() OVER (ORDER BY cosine DESC, vec_id)
                    AS BIGINT) AS r
        FROM cs
        QUALIFY r <= 50
    )
    SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
           round(COALESCE(1.0 / (60 + b.r), 0) + COALESCE(1.0 / (60 + c.r), 0), 6)
               AS rrf,
           b.r AS bm25_rank,
           c.r AS cosine_rank
    FROM bm b FULL OUTER JOIN cr c ON b.doc_id = c.doc_id
    ORDER BY rrf DESC, doc_id
    LIMIT 10
    """,
)
def q121_reciprocal_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion (Cormack et al.,
    SIGIR 2009): the BM25 keyword list (q74's scorer) and the dense
    cosine list (q60's scorer, vec_id = doc_id) each contribute
    1/(60 + rank); the fused top-10 is the standard
    lexical+semantic RAG retriever. Ranks are integers, so the fused
    score is a sum of two exact rationals — no float-order hazard.

    Scale: each list is a TakeOrdered top-50 (per-partition heaps, no
    global sort); rank assignment happens AFTER the limit, on 50
    rows, so the global row_number window never sees a corpus-sized
    relation. The fusion join is 50x50 at most.
    """
    from pyspark.sql import Window

    from g_etl_spark.operators import similarity as S
    from g_etl_spark.queries.similarity import _query_vector

    d = load(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.size(T.tokens(F.col("text"))).alias("dl"),
        T.tokens(F.col("text")).alias("t"),
    )
    stats = base.agg(F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl"))
    tf = (
        base.select(
            "doc_id",
            "dl",
            F.explode(F.filter(F.col("t"), lambda x: x.isin(*_BM25_TERMS))).alias(
                "token"
            ),
        )
        .groupBy("doc_id", "dl", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dft = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dft), "token")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.sum(
                T.bm25_term_score(
                    F.col("tf"), F.col("df"), F.col("dl"),
                    F.col("n_docs"), F.col("avgdl"),
                    k1=_BM25_K1, b=_BM25_B,
                )
            ).alias("bm25")
        )
    )
    bm_order = [F.round("bm25", 4).desc(), F.col("doc_id").asc()]
    bm_top = scored.orderBy(*bm_order).limit(50)
    bm = bm_top.withColumn(
        "r", F.row_number().over(Window.orderBy(*bm_order)).cast("long")
    ).select("doc_id", "r")

    e = load(spark, sf_dir, "embeddings")
    qv = _query_vector(spark, sf_dir)
    if qv is None:
        cr = spark.createDataFrame([], "doc_id bigint, r bigint")
    else:
        cs_order = [F.col("cosine").desc(), F.col("vec_id").asc()]
        cr = (
            S.cosine_topk(e, qv, k=50)
            .withColumn(
                "r", F.row_number().over(Window.orderBy(*cs_order)).cast("long")
            )
            .select(F.col("vec_id").alias("doc_id"), "r")
        )

    b, c = bm.alias("b"), cr.alias("c")
    fused = b.join(c, F.col("b.doc_id") == F.col("c.doc_id"), "full_outer").select(
        F.coalesce(F.col("b.doc_id"), F.col("c.doc_id")).alias("doc_id"),
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("b.r")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("c.r")), F.lit(0.0)),
            6,
        ).alias("rrf"),
        F.col("b.r").alias("bm25_rank"),
        F.col("c.r").alias("cosine_rank"),
    )
    return fused.orderBy(F.desc("rrf"), "doc_id").limit(10)


@register(
    "q122_source_entropy_kl",
    oracle="""
    WITH tok AS (
        SELECT source, unnest(string_split(trim(text), ' ')) AS t
        FROM documents
    ),
    src_tot AS (
        SELECT source, CAST(count(*) AS DOUBLE) AS n FROM tok GROUP BY source
    ),
    corp_tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM tok),
    src_cnt AS (
        SELECT source, t, CAST(count(*) AS DOUBLE) AS c
        FROM tok GROUP BY source, t
    ),
    corp_cnt AS (SELECT t, CAST(count(*) AS DOUBLE) AS c FROM tok GROUP BY t)
    SELECT s.source,
           CAST(st.n AS BIGINT)     AS n_tokens,
           CAST(count(*) AS BIGINT) AS vocab,
           round(-sum((s.c / st.n) * log2(s.c / st.n)), 4) AS entropy_bits,
           round(sum((s.c / st.n) * log2((s.c / st.n) / (cc.c / ct.n))), 4)
               AS kl_vs_corpus
    FROM src_cnt s
    JOIN src_tot st USING (source)
    JOIN corp_cnt cc ON s.t = cc.t
    CROSS JOIN corp_tot ct
    GROUP BY s.source, st.n
    ORDER BY s.source
    """,
)
def q122_source_entropy_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-distribution diagnostics: Shannon entropy
    (diversity) and KL divergence vs the corpus mixture (skew) — the
    information-theoretic source scorecard used for mixture weighting
    and low-diversity (template/spam) source detection.

    Scale: two term-key aggregates (per-source and corpus term
    counts) joined on the term key — the same shuffle key, so AQE
    reuses partitioning — then one per-source fold. Totals broadcast.
    Both sums are corpus-vocab-bounded per source; round(4) absorbs
    float-summation-order differences (~1e-13) across engines.
    """
    d = load(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(F.split(F.trim("text"), " ")).alias("t"))
    src_tot = tok.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    corp_tot = tok.agg(F.count(F.lit(1)).cast("double").alias("cn"))
    src_cnt = tok.groupBy("source", "t").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    corp_cnt = tok.groupBy("t").agg(F.count(F.lit(1)).cast("double").alias("cc"))
    p = F.col("c") / F.col("n")
    q = F.col("cc") / F.col("cn")
    return (
        src_cnt.join(F.broadcast(src_tot), "source")
        .join(corp_cnt, "t")
        .crossJoin(F.broadcast(corp_tot))
        .groupBy("source", "n")
        .agg(
            F.count(F.lit(1)).alias("vocab"),
            F.round(-F.sum(p * F.log2(p)), 4).alias("entropy_bits"),
            F.round(F.sum(p * F.log2(p / q)), 4).alias("kl_vs_corpus"),
        )
        .select(
            "source",
            F.col("n").cast("long").alias("n_tokens"),
            "vocab",
            "entropy_bits",
            "kl_vs_corpus",
        )
        .orderBy("source")
    )


@register(
    "q128_tfidf_doc_similarity",
    oracle=f"""
    WITH tf AS (
        SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf
        FROM (SELECT doc_id, unnest({_TOKS}) AS token FROM documents)
        GROUP BY doc_id, token
    ),
    df AS (
        SELECT token, count(*) AS df FROM tf GROUP BY token
    ),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
    w AS (
        SELECT t.doc_id, t.token, t.tf * ln((SELECT n_docs FROM n) / d.df) AS w
        FROM tf t JOIN df d USING (token)
        WHERE d.df <= 100
    ),
    norms AS (
        SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id
    ),
    dots AS (
        SELECT w1.doc_id AS doc_a, w2.doc_id AS doc_b, sum(w1.w * w2.w) AS dot
        FROM w w1 JOIN w w2 ON w1.token = w2.token AND w1.doc_id < w2.doc_id
        GROUP BY w1.doc_id, w2.doc_id
    )
    SELECT doc_a, doc_b,
           round(d.dot / (na.nrm * nb.nrm), 6) AS sim
    FROM dots d
    JOIN norms na ON na.doc_id = d.doc_a
    JOIN norms nb ON nb.doc_id = d.doc_b
    ORDER BY round(d.dot / (na.nrm * nb.nrm), 6) DESC, doc_a, doc_b
    LIMIT 20
    """,
)
def q128_tfidf_doc_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF cosine similarity between documents via the sparse
    term-partitioned dot product: top-20 most similar pairs. The
    lexical sibling of the embedding dedup family (q54/q61) and the
    pairwise complement of BM25 retrieval (q74) — the classic
    "similar docs without a model" curation signal.

    Terms with df > 100 are pruned before pairing (IDF≈0 terms
    contribute noise and quadratic fan-out; pruning is part of the
    operator contract, applied identically in the oracle). The
    ordering key is quantized (round 6) BEFORE the top-k in both
    engines, doc-id tiebreak, so rank membership can't flip on a
    summation-order ulp (q102's rule).

    Scale: this is the textbook sparse all-pairs scheme — the join
    fans out per TERM with cost Σ df², and the df cap bounds each
    term's fan-out at 100² regardless of corpus size; weights/norms are
    two map-side-combined aggs, and the final agg shuffles on the
    (doc_a, doc_b) pair key. At 100 TB the df cap is the knob that
    keeps Σ df² linear-ish in corpus size (standard PPJoin-family
    reasoning, same honesty note as q55).
    """
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.count()
    w = (
        tf.join(df.filter(F.col("df") <= 100), "token")
        .withColumn("w", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")))
        .select("doc_id", "token", "w")
    )
    norms = w.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    w1, w2 = w.alias("w1"), w.alias("w2")
    dots = (
        w1.join(
            w2,
            (F.col("w1.token") == F.col("w2.token"))
            & (F.col("w1.doc_id") < F.col("w2.doc_id")),
        )
        .groupBy(
            F.col("w1.doc_id").alias("doc_a"), F.col("w2.doc_id").alias("doc_b")
        )
        .agg(F.sum(F.col("w1.w") * F.col("w2.w")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nb"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn("sim", F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6))
        .orderBy(F.desc("sim"), "doc_a", "doc_b")
        .select("doc_a", "doc_b", "sim")
        .limit(20)
    )


@register(
    "q129_sequence_packing",
    oracle=f"""
    WITH RECURSIVE docs AS (
        SELECT source, doc_id, len({_TOKS}) AS n_tok,
               row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        FROM documents
    ),
    pack AS (
        SELECT source, doc_id, rn, n_tok,
               CAST(0 AS BIGINT) AS bin, n_tok AS fill
        FROM docs WHERE rn = 1
        UNION ALL
        SELECT d.source, d.doc_id, d.rn, d.n_tok,
               CASE WHEN p.fill + d.n_tok <= 512 THEN p.bin ELSE p.bin + 1 END,
               CASE WHEN p.fill + d.n_tok <= 512 THEN p.fill + d.n_tok ELSE d.n_tok END
        FROM pack p JOIN docs d ON d.source = p.source AND d.rn = p.rn + 1
    )
    SELECT source, bin, count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS tokens,
           min(doc_id) AS first_doc
    FROM pack
    GROUP BY source, bin
    ORDER BY source, bin
    """,
)
def q129_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for LLM training: greedy next-fit of
    documents (in doc_id order, per source) into 512-token context
    bins — each bin reports its doc count, token fill, and first
    doc. Packing is THE step between a curated corpus and a token
    batch; next-fit in a fixed order is the deterministic baseline
    (oversized docs get their own bin and the next doc starts
    fresh, matching the oracle's recursive carry).

    The carry (bin, fill) makes this inherently sequential WITHIN a
    source, so Spark runs it as applyInPandas per source group — a
    linear pandas scan per group, Arrow-batched. The oracle walks
    the same order with a recursive CTE.

    Scale: parallelism = number of sources (shards); a real corpus
    packs within (source, shard-of-doc_id-range) salt keys so no
    group exceeds executor memory, which changes bin ids only
    ACROSS shard boundaries — the standard trade documented for
    per-partition packers. State is O(1) per group beyond the
    group's own rows; no shuffle after the one groupBy exchange.
    """
    import pandas as pd

    d = load(spark, sf_dir, "documents")
    docs = d.select(
        "source", "doc_id", F.size(T.tokens(F.col("text"))).alias("n_tok")
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins = []
        b, fill = 0, 0
        for t in pdf["n_tok"]:
            if fill and fill + t > 512:
                b, fill = b + 1, 0
            fill += int(t)
            bins.append(b)
        pdf["bin"] = pd.Series(bins, dtype="int64")
        g = (
            pdf.groupby("bin", as_index=False)
            .agg(
                source=("source", "first"),
                n_docs=("doc_id", "count"),
                tokens=("n_tok", "sum"),
                first_doc=("doc_id", "min"),
            )
        )
        return g[["source", "bin", "n_docs", "tokens", "first_doc"]]

    out_schema = (
        "source string, bin bigint, n_docs bigint, tokens bigint, first_doc bigint"
    )
    return (
        docs.groupBy("source")
        .applyInPandas(pack, schema=out_schema)
        .orderBy("source", "bin")
    )


@register(
    "q130_bpe_pair_counts",
    oracle=f"""
    WITH words AS (
        SELECT unnest({_TOKS}) AS w FROM documents
    ),
    pairs AS (
        SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                                     i -> substr(w, i, 2))) AS pair
        FROM words WHERE len(w) >= 2
    )
    SELECT pair, count(*) AS n
    FROM pairs
    GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT 30
    """,
)
def q130_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent character-pair frequencies within words — the inner
    loop of BPE tokenizer training (the top pair is the next merge
    candidate). Top-30 by corpus count. Tokenizer training is a
    first-class corpus op for an LLM pipeline; this is its hot
    kernel expressed as pure SQL arrays (no Python).

    Scale: map-only fan-out (≈word_len pairs per word) into a
    map-side-combined count on a key space bounded by |alphabet|² —
    the shuffle carries at most a few thousand distinct pairs per
    partition no matter the corpus size, which is why pair counting
    (unlike pair MERGING, which is iterative) parallelizes
    trivially. An iterative BPE trainer would loop this kernel,
    re-splitting words against the merge table broadcast each
    round.
    """
    d = load(spark, sf_dir, "documents")
    words = d.select(F.explode(T.tokens(F.col("text"))).alias("w")).filter(
        F.length("w") >= 2
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(30)
    )


@register(
    "q132_zipf_fit",
    oracle=f"""
    WITH counts AS (
        SELECT token, CAST(count(*) AS DOUBLE) AS n
        FROM (SELECT unnest({_TOKS}) AS token FROM documents)
        GROUP BY token
    ),
    ranked AS (
        SELECT ln(CAST(row_number() OVER (ORDER BY n DESC, token) AS DOUBLE)) AS x,
               ln(n) AS y
        FROM counts
        ORDER BY n DESC, token
        LIMIT 1000
    )
    SELECT CAST(count(*) AS BIGINT) AS n_tokens,
           round((sum(x * y) - sum(x) * sum(y) / count(*))
                 / (sum(x * x) - sum(x) * sum(x) / count(*)), 4) AS zipf_slope,
           round((sum(y) - ((sum(x * y) - sum(x) * sum(y) / count(*))
                            / (sum(x * x) - sum(x) * sum(x) / count(*))) * sum(x))
                 / count(*), 4) AS intercept
    FROM ranked
    """,
)
def q132_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus token distribution: OLS slope of
    ln(frequency) on ln(rank) over the top-1000 tokens (natural text
    ≈ -1; a far-off slope flags templated/boilerplate or synthetic
    corpora — a cheap whole-corpus health check used alongside the
    per-doc quality filters q41/q58).

    Composition of q42's frequency rollup and q115's closed-form OLS
    moments; the regression runs over a bounded 1000-row aggregate,
    so the single-partition rank window is safe by construction.

    Scale: token counts are map-side combined (|vocab|·partitions
    shuffle rows); the top-1000 is a TakeOrdered; the OLS moments
    fold in one partial agg over 1000 rows. Nothing after the first
    shuffle scales with corpus size.
    """
    d = load(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(T.tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    top = counts.orderBy(F.desc("n"), "token").limit(1000)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("n"), "token")
    ranked = top.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log("n").alias("y"),
    )
    m = ranked.agg(
        F.count(F.lit(1)).alias("c"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("c")) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / F.col("c")
    )
    return m.select(
        F.col("c").cast("long").alias("n_tokens"),
        F.round(slope, 4).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("c"), 4).alias(
            "intercept"
        ),
    )


@register(
    "q133_cooccurrence_pmi",
    oracle=f"""
    WITH dt AS (
        SELECT DISTINCT doc_id, token
        FROM (SELECT doc_id, unnest({_TOKS}) AS token FROM documents)
    ),
    tok_n AS (SELECT token, count(*) AS n FROM dt GROUP BY token),
    n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS nd FROM dt),
    pair_n AS (
        SELECT a.token AS tok_a, b.token AS tok_b, count(*) AS n_ab
        FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.token < b.token
        GROUP BY a.token, b.token
        HAVING count(*) >= 5
    )
    SELECT tok_a, tok_b, CAST(n_ab AS BIGINT) AS n_ab,
           round(ln(n_ab * (SELECT nd FROM n)
                    / (CAST(na.n AS DOUBLE) * nb.n)), 6) AS pmi
    FROM pair_n
    JOIN tok_n na ON na.token = tok_a
    JOIN tok_n nb ON nb.token = tok_b
    ORDER BY round(ln(n_ab * (SELECT nd FROM n)
                      / (CAST(na.n AS DOUBLE) * nb.n)), 6) DESC, tok_a, tok_b
    LIMIT 20
    """,
)
def q133_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of token pairs co-occurring in a
    document (doc-level presence, min support 5): top-20 collocations
    — the classic phrase/multiword-expression miner (word2vec-era
    PMI matrix), complementing the frequency (q42) and similarity
    (q128) views of the same corpus.

    PMI = ln(P(a,b) / (P(a)P(b))) with doc-presence probabilities;
    the ordering key is quantized before the top-k (q102's rule),
    token tiebreak.

    Scale: the pair generation is a doc-keyed self-join — fan-out
    Σ_docs (distinct tokens per doc)², bounded by document length
    not corpus size, so it scales linearly in docs (same bound as
    q101's per-order wedge fan-out); marginals and the N scalar ride
    broadcast joins onto the bounded pair aggregate. The min-support
    HAVING prunes the long tail before the marginal joins.
    """
    d = load(spark, sf_dir, "documents")
    dt = d.select(
        "doc_id", F.explode(T.tokens(F.col("text"))).alias("token")
    ).distinct()
    tok_n = dt.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    nd = dt.select("doc_id").distinct().count()
    a, b = dt.alias("a"), dt.alias("b")
    pair_n = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.token") < F.col("b.token")),
        )
        .groupBy(F.col("a.token").alias("tok_a"), F.col("b.token").alias("tok_b"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 5)
    )
    na = tok_n.select(F.col("token").alias("tok_a"), F.col("n").alias("na"))
    nb = tok_n.select(F.col("token").alias("tok_b"), F.col("n").alias("nb"))
    return (
        pair_n.join(na, "tok_a")
        .join(nb, "tok_b")
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    F.col("n_ab") * F.lit(float(nd))
                    / (F.col("na").cast("double") * F.col("nb"))
                ),
                6,
            ),
        )
        .orderBy(F.desc("pmi"), "tok_a", "tok_b")
        .select("tok_a", "tok_b", F.col("n_ab").cast("long").alias("n_ab"), "pmi")
        .limit(20)
    )


@register(
    "q134_linear_quality_scores",
    oracle=f"""
    WITH scored AS (
        SELECT source,
               list_aggregate(
                   list_transform({_TOKS},
                       t -> CAST(CAST('0x' || substr(md5(t), 1, 8) AS UBIGINT) AS BIGINT)
                            / 4294967296.0 - 0.5),
                   'sum') / greatest(len({_TOKS}), 1) AS score
        FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
           round(avg(score), 6) AS avg_score
    FROM scored
    GROUP BY source
    ORDER BY source
    """,
)
def q134_linear_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering at scan speed: a hashed
    bag-of-words linear classifier (the fastText/CCNet quality-model
    shape) applied to every document — each token hashes into a
    weight table and the doc score is the mean token weight; docs
    with positive score pass. Here the "model" is a deterministic
    hash-derived weight (md5 32-bit → uniform in [-0.5, 0.5)) so the
    oracle can replay it exactly; a real model swaps in a broadcast
    weight array with the identical plan.

    Scale: the entire classifier is ONE array-lambda projection per
    row (md5 + arithmetic, JVM-side, no explode, no shuffle) — the
    token sum happens inside the row, so the only exchange is the
    per-source rollup. This is the property that makes model-based
    filtering affordable at 100 TB: inference cost is the scan
    itself; with a learned model the weight lookup is an
    element_at into a broadcast array instead of the hash.
    """
    d = load(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    weight = lambda t: (  # noqa: E731
        F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
        / F.lit(4294967296.0)
        - F.lit(0.5)
    )
    score = F.aggregate(
        F.transform(toks, weight), F.lit(0.0), lambda acc, x: acc + x
    ) / F.greatest(F.size(toks), F.lit(1))
    return (
        d.select("source", score.alias("score"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("score") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_keep"),
            F.round(F.avg("score"), 6).alias("avg_score"),
        )
        .orderBy("source")
    )


@register(
    "q138_ngram_novelty",
    oracle=f"""
    WITH dg AS (
        SELECT DISTINCT doc_id, g
        FROM (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, len({_TOKS}) - 2),
                          i -> {_TOKS}[i] || ' ' || {_TOKS}[i+1] || ' ' || {_TOKS}[i+2])) AS g
            FROM documents
            WHERE len({_TOKS}) >= 3)
    ),
    gdf AS (SELECT g, count(*) AS df FROM dg GROUP BY g),
    nov AS (
        SELECT dg.doc_id,
               avg(CASE WHEN gdf.df = 1 THEN 1.0 ELSE 0.0 END) AS novelty
        FROM dg JOIN gdf USING (g)
        GROUP BY dg.doc_id
    )
    SELECT d.source,
           count(*) AS n_docs,
           round(avg(n.novelty), 6) AS avg_novelty,
           CAST(sum(CASE WHEN n.novelty < 0.5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_derivative
    FROM nov n JOIN documents d USING (doc_id)
    GROUP BY d.source
    ORDER BY d.source
    """,
)
def q138_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: the share of a doc's distinct
    word 3-grams that appear in NO other document (df = 1), rolled
    up per source with a count of low-novelty ("derivative") docs —
    the corpus-level memorization/near-copy signal used to spot
    template farms and cross-posted content, sharpening the binary
    dedup verdicts (q50-q57) into a continuous score.

    Scale: 3-gram fan-out is ~token-count per doc (bounded by doc
    length); the df aggregate is map-side combined on the gram key;
    the join back to docs reuses the gram partitioning. Same
    Σ-per-doc-bounded shape as q96's boilerplate detector — nothing
    quadratic, nothing corpus-wide beyond two keyed shuffles.
    """
    d = load(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    grams = F.transform(
        F.sequence(F.lit(1), F.size(F.col("ws")) - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at(F.col("ws"), i),
            F.element_at(F.col("ws"), i + 1),
            F.element_at(F.col("ws"), i + 2),
        ),
    )
    dg = (
        d.select("doc_id", toks.alias("ws"))
        .filter(F.size("ws") >= 3)
        .select("doc_id", F.explode(grams).alias("g"))
        .distinct()
    )
    gdf = dg.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    nov = (
        dg.join(gdf, "g")
        .groupBy("doc_id")
        .agg(
            F.avg(F.when(F.col("df") == 1, 1.0).otherwise(0.0)).alias("novelty")
        )
    )
    return (
        nov.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("novelty"), 6).alias("avg_novelty"),
            F.sum(F.when(F.col("novelty") < 0.5, 1).otherwise(0))
            .cast("long")
            .alias("n_derivative"),
        )
        .orderBy("source")
    )


@register(
    "q156_doc_entropy",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS w FROM documents),
    cnt AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY doc_id, w),
    tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY doc_id),
    ent AS (
        SELECT c.doc_id, t.n AS n_tokens,
               round(-sum((c.c / CAST(t.n AS DOUBLE))
                          * log2(c.c / CAST(t.n AS DOUBLE))), 4) AS entropy
        FROM cnt c JOIN tot t USING (doc_id)
        GROUP BY c.doc_id, t.n
    )
    SELECT doc_id, n_tokens, entropy FROM ent
    WHERE n_tokens >= 10
    ORDER BY entropy, doc_id
    LIMIT 10
    """,
)
def q156_doc_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram Shannon entropy, bottom-10 — the
    repetitive-document quality signal (low word entropy = degenerate
    boilerplate/spam) complementing the dup-bigram ratio (q59) and
    perplexity (q85): H = -Σ p log2 p over the doc's own word
    distribution.

    The ordering key is the ROUNDED entropy with doc_id tiebreak, so
    the bottom-10 cut is engine-stable (per-doc sums are ≤ doc-length
    terms — no corpus-scale float accumulation anywhere).

    Scale: explode → (doc, word) counts → per-doc agg; both
    aggregations shuffle on doc_id so AQE coalesces them into one
    exchange's worth of work, and per-doc state is bounded by doc
    vocabulary. The bottom-10 is a TakeOrdered heap, not a sort.
    """
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w"),
    )
    cnt = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    wdoc = Window.partitionBy("doc_id")
    staged = cnt.withColumn("n", F.sum("c").over(wdoc))
    p = F.col("c") / F.col("n").cast("double")
    ent = staged.groupBy(
        "doc_id", F.col("n").cast("long").alias("n_tokens")
    ).agg(F.round(-F.sum(p * F.log2(p)), 4).alias("entropy"))
    return (
        ent.filter(F.col("n_tokens") >= 10)
        .select("doc_id", "n_tokens", "entropy")
        .orderBy("entropy", "doc_id")
        .limit(10)
    )


@register(
    "q178_calibration_bins",
    oracle="""
    WITH scored AS (
        SELECT 1.0 / (1.0 + exp(-(CAST(n_chars AS DOUBLE) / 100.0 - 3.0)))
                   AS p,
               CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
        FROM documents
    )
    SELECT CAST(least(CAST(floor(p * 10) AS BIGINT), 9) AS INT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(p), 6) AS avg_pred,
           round(avg(y), 6) AS frac_pos,
           round(abs(avg(p) - avg(y)), 6) AS gap
    FROM scored
    GROUP BY bin
    ORDER BY bin
    """,
)
def q178_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins for a probabilistic classifier — the
    calibration audit every model-based quality filter (q134's shape)
    needs before its scores gate a 100 TB corpus: bucket predictions
    into 10 equal-width probability bins and compare mean predicted
    probability against the empirical positive rate per bin (the
    per-bin |gap| is the ECE integrand). The probe model is a fixed
    deterministic logistic of document length predicting lang='en',
    so both engines replay it exactly; a real model swaps in a score
    column with the identical plan.

    Scale: scoring is a map-side scalar per row; the only exchange is
    the 10-bin combining agg — calibration costs one scan regardless
    of corpus size. Bin 9 absorbs p=1.0 via least(...,9) so the bin
    function is total.
    """
    d = load(spark, sf_dir, "documents")
    p = 1.0 / (
        1.0 + F.exp(-(F.col("n_chars").cast("double") / 100.0 - 3.0))
    )
    scored = d.select(
        p.alias("p"),
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
    )
    return (
        scored.groupBy(
            F.least(F.floor(F.col("p") * 10), F.lit(9))
            .cast("int")
            .alias("bin")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg("p"), 6).alias("avg_pred"),
            F.round(F.avg("y"), 6).alias("frac_pos"),
            F.round(F.abs(F.avg("p") - F.avg("y")), 6).alias("gap"),
        )
        .orderBy("bin")
    )


@register(
    "q187_readability_scores",
    oracle=f"""
    WITH feats AS (
        SELECT source,
               CAST(len({_TOKS}) AS DOUBLE) AS words,
               CAST(greatest(
                   length(regexp_replace(text, '[.!?]+', '#', 'g'))
                   - length(replace(regexp_replace(text, '[.!?]+', '#', 'g'),
                                    '#', '')), 1) AS DOUBLE) AS sentences,
               CAST(greatest(
                   length(regexp_replace(lower(text), '[aeiouy]+', '#', 'g'))
                   - length(replace(regexp_replace(lower(text), '[aeiouy]+',
                                                   '#', 'g'), '#', '')), 1)
                   AS DOUBLE) AS syllables
        FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(206.835 - 1.015 * (words / sentences)
                     - 84.6 * (syllables / words)), 4) AS avg_flesch,
           round(avg(words / sentences), 4) AS avg_words_per_sentence,
           round(avg(syllables / words), 4) AS avg_syllables_per_word
    FROM feats
    GROUP BY source
    ORDER BY source
    """,
)
def q187_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per source — the classic readability
    heuristic (206.835 - 1.015·words/sentence - 84.6·syllables/word)
    that data-quality pipelines report next to q41's surface stats
    and q58's filter chain. Syllables are approximated as maximal
    vowel-group runs and sentences as [.!?]+ runs (floored at 1), the
    standard cheap estimators — both counted by the same
    replace-then-measure trick in both engines so the arithmetic is
    identical.

    Scale: three regexp projections + one combining agg; entirely
    map-side JVM regex, no explode (the token array is only
    measured, never unnested), one |sources|-row exchange. Readability
    scoring at 100 TB is scan-bound, exactly like q134's classifier.
    """
    d = load(spark, sf_dir, "documents")

    def runs(col, pat):
        marked = F.regexp_replace(col, pat, "#")
        return (
            F.length(marked) - F.length(F.regexp_replace(marked, "#", ""))
        ).cast("double")

    feats = d.select(
        "source",
        F.size(T.tokens(F.col("text"))).cast("double").alias("words"),
        F.greatest(runs(F.col("text"), r"[.!?]+"), F.lit(1.0)).alias(
            "sentences"
        ),
        F.greatest(
            runs(F.lower(F.col("text")), r"[aeiouy]+"), F.lit(1.0)
        ).alias("syllables"),
    )
    wps = F.col("words") / F.col("sentences")
    spw = F.col("syllables") / F.col("words")
    return (
        feats.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.avg(206.835 - 1.015 * wps - 84.6 * spw), 4).alias(
                "avg_flesch"
            ),
            F.round(F.avg(wps), 4).alias("avg_words_per_sentence"),
            F.round(F.avg(spw), 4).alias("avg_syllables_per_word"),
        )
        .orderBy("source")
    )


@register(
    "q191_vocab_coverage",
    oracle=f"""
    WITH tok AS (
        SELECT unnest({_TOKS}) AS token FROM documents
    ),
    counts AS (
        SELECT token, CAST(count(*) AS DOUBLE) AS c FROM tok GROUP BY token
    ),
    ranked AS (
        SELECT c, row_number() OVER (ORDER BY c DESC, token ASC) AS r,
               sum(c) OVER (ORDER BY c DESC, token ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum
        FROM counts
    ),
    tot AS (SELECT sum(c) AS t, count(*) AS vocab FROM counts)
    SELECT ks.k,
           round(max(CASE WHEN ranked.r <= ks.k THEN ranked.cum END)
                 / max(tot.t), 6) AS coverage,
           CAST(max(tot.vocab) AS BIGINT) AS vocab_size
    FROM ranked CROSS JOIN tot
    CROSS JOIN (SELECT unnest([5, 10, 20, 50]) AS k) ks
    GROUP BY ks.k
    ORDER BY ks.k
    """,
)
def q191_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: what fraction of all token
    occurrences does a top-k vocabulary capture, for k in {5, 10,
    20, 50} — the tokenizer-budget diagnostic behind vocab-size
    choices (pairs with q132's Zipf fit: a steep Zipf exponent means
    small k already covers most mass; the OOV rate is 1 − coverage).
    Rank ties break lexicographically so both engines agree.

    Scale: one explode + combining count collapses the corpus to
    |vocab| rows; at 100 TB |vocab| of natural text is ~1e6-1e8 rows,
    so the descending rank AND the cumulative share both run as the
    operators/ranking TWO-PASS recipe (bucket-partitioned windows
    only — the r7-verdict retrofit; descending via negated count,
    the q273/q285 convention). The 4-row k set cross-joins in as a
    broadcast.
    """
    from g_etl_spark.operators.ranking import (
        global_cumsum_twopass,
        global_rank_twopass,
        log2_bucket,
    )

    d = load(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(T.tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .withColumn("negc", -F.col("c"))
    )
    ranked = global_cumsum_twopass(
        global_rank_twopass(
            counts, ["negc", "token"], -log2_bucket(F.col("c")), out="r"
        ),
        "c",
        ["negc", "token"],
        -log2_bucket(F.col("c")),
        out="cum",
    ).select("c", "r", "cum")
    tot = counts.agg(
        F.sum("c").alias("t"), F.count(F.lit(1)).cast("long").alias("vocab")
    )
    ks = load(spark, sf_dir, "documents").sparkSession.createDataFrame(
        [(5,), (10,), (20,), (50,)], "k int"
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.round(
                F.max(F.when(F.col("r") <= F.col("k"), F.col("cum")))
                / F.max("t"),
                6,
            ).alias("coverage"),
            F.max("vocab").alias("vocab_size"),
        )
        .orderBy("k")
    )


_CHUNK_C = 16  # chunk length (tokens)
_CHUNK_S = 12  # stride (tokens); overlap = C - S


@register(
    "q208_chunk_overlap_manifest",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents
    ),
    c AS (
        SELECT doc_id, toks, len(toks) AS n,
               CASE WHEN len(toks) <= {_CHUNK_C} THEN 1
                    ELSE CAST(floor((len(toks) - {_CHUNK_C} + {_CHUNK_S} - 1)
                                    / {_CHUNK_S}.0) AS BIGINT) + 1
               END AS n_chunks
        FROM t
    ),
    x AS (
        SELECT doc_id, toks, n,
               unnest(range(n_chunks)) AS chunk_idx
        FROM c
    )
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(chunk_idx * {_CHUNK_S} + 1 AS INT) AS start_tok,
           CAST(len(toks[(chunk_idx * {_CHUNK_S} + 1)
                         :(chunk_idx * {_CHUNK_S} + {_CHUNK_C})]) AS INT)
               AS chunk_len,
           md5(array_to_string(
               toks[(chunk_idx * {_CHUNK_S} + 1)
                    :(chunk_idx * {_CHUNK_S} + {_CHUNK_C})], ' '))
               AS chunk_md5
    FROM x
    ORDER BY doc_id, chunk_idx
    """,
)
def q208_chunk_overlap_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking manifest (RAG / context-window prep):
    split each document into 16-token chunks at stride 12 (4-token
    overlap so no boundary sentence is lost),
    emitting one manifest row per chunk with its 1-based start
    offset, actual length (the tail chunk is shorter), and the md5
    of the chunk text — the id a downstream embedding/dedup stage
    keys on (q57 dedups such chunks; q129 packs them). Chunk count
    per doc: 1 if n<=C else ceil((n-C)/S)+1, integer-exact in both
    engines.

    Scale: tokenize once (one split per doc), then a sequence+explode
    fan-out of ~n/S rows per doc — linear in corpus tokens, entirely
    JVM-side (split/slice/concat_ws/md5 in whole-stage codegen, no
    UDF, no shuffle at all: the manifest is embarrassingly parallel
    and the output sort is presentation-only). At 100 TB this is a
    map-only stage writing partitioned manifest files.
    """
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim("text"), " ").alias("toks")
    )
    n = F.size("toks")
    n_chunks = F.when(n <= _CHUNK_C, F.lit(1)).otherwise(
        F.floor((n - _CHUNK_C + _CHUNK_S - 1) / F.lit(float(_CHUNK_S))) + 1
    )
    x = d.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), n_chunks.cast("int") - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * _CHUNK_S + 1
    chunk = F.slice("toks", start, _CHUNK_C)
    return x.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        start.cast("int").alias("start_tok"),
        F.size(chunk).cast("int").alias("chunk_len"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_idx")


@register(
    "q228_mixture_allocation",
    oracle="""
    WITH src AS MATERIALIZED (
        SELECT source, CAST(sum(n_chars) AS BIGINT) AS toks
        FROM documents GROUP BY 1
    ),
    w AS (
        SELECT source, toks, sqrt(CAST(toks AS DOUBLE)) AS w FROM src
    ),
    tot AS (
        SELECT sum(w) AS sw, CAST(sum(toks) AS BIGINT) AS budget FROM w
    ),
    firstpass AS MATERIALIZED (
        SELECT w.source, w.toks, w.w,
               w.w / tot.sw * tot.budget AS desired,
               2.0 * w.toks AS cap,
               least(w.w / tot.sw * tot.budget, 2.0 * w.toks) AS a1,
               w.w / tot.sw * tot.budget > 2.0 * w.toks AS capped,
               tot.budget AS budget, tot.sw AS sw
        FROM w CROSS JOIN tot
    ),
    leftover AS (
        SELECT max(budget) - sum(a1) AS l,
               sum(CASE WHEN NOT capped THEN w ELSE 0 END) AS sw_unc
        FROM firstpass
    )
    SELECT f.source, f.toks,
           round(f.w / f.sw, 6) AS target_share,
           round(least(f.a1 + CASE WHEN f.capped OR l.sw_unc = 0 THEN 0
                                   ELSE f.w / l.sw_unc * l.l END, f.cap), 1)
               AS alloc_tokens,
           round(least(f.a1 + CASE WHEN f.capped OR l.sw_unc = 0 THEN 0
                                   ELSE f.w / l.sw_unc * l.l END, f.cap)
                 / f.toks, 4) AS epochs,
           f.capped
    FROM firstpass f CROSS JOIN leftover l
    ORDER BY f.source
    """,
)
def q228_mixture_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data mixture allocator (the Llama/Gopher data-mixing
    computation, q84's resampler turned into a BUDGET): per-source
    token counts, temperature-0.5 target shares (w = sqrt(T) damps
    the head source), a 2-epoch repetition cap per source, and one
    proportional redistribution pass of the capped surplus to the
    uncapped sources — emitting each source's token allocation and
    implied epoch count. This is the planning step that precedes
    q84's row-level sampling; epochs > 1 quantifies deliberate
    repetition (the Muennighoff scaling-law knob).

    Scale: ONE combining agg to the |sources|-row relation; shares,
    caps, and the waterfill pass are arithmetic on that bounded
    relation with two broadcast scalar attaches. Single-pass
    redistribution is documented (a full waterfill iterates until no
    new source caps; at |sources| rows that loop is driver-trivial
    but one pass is already exact here because redistribution
    re-caps).
    """
    d = load(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(F.sum("n_chars").alias("toks"))
    w = src.select("source", "toks", F.sqrt(F.col("toks").cast("double")).alias("w"))
    tot = w.agg(F.sum("w").alias("sw"), F.sum("toks").alias("budget"))
    fp = w.crossJoin(F.broadcast(tot)).select(
        "source",
        "toks",
        "w",
        "sw",
        "budget",
        (F.col("w") / F.col("sw") * F.col("budget")).alias("desired"),
        (2.0 * F.col("toks")).alias("cap"),
        F.least(F.col("w") / F.col("sw") * F.col("budget"), 2.0 * F.col("toks")).alias(
            "a1"
        ),
        (F.col("w") / F.col("sw") * F.col("budget") > 2.0 * F.col("toks")).alias(
            "capped"
        ),
    )
    leftover = fp.agg(
        (F.max("budget") - F.sum("a1")).alias("l"),
        F.sum(F.when(~F.col("capped"), F.col("w")).otherwise(0.0)).alias("sw_unc"),
    )
    final_alloc = F.least(
        F.col("a1")
        + F.when((F.col("capped")) | (F.col("sw_unc") == 0), 0.0).otherwise(
            F.col("w") / F.col("sw_unc") * F.col("l")
        ),
        F.col("cap"),
    )
    return (
        fp.crossJoin(F.broadcast(leftover))
        .select(
            "source",
            "toks",
            F.round(F.col("w") / F.col("sw"), 6).alias("target_share"),
            F.round(final_alloc, 1).alias("alloc_tokens"),
            F.round(final_alloc / F.col("toks"), 4).alias("epochs"),
            "capped",
        )
        .orderBy("source")
    )


@register(
    "q229_pr_curve_sweep",
    oracle=f"""
    WITH scored AS MATERIALIZED (
        SELECT round(
                   list_aggregate(
                       list_transform({_TOKS},
                           t -> CAST(CAST('0x' || substr(md5(t), 1, 8) AS UBIGINT)
                                     AS BIGINT) / 4294967296.0 - 0.5),
                       'sum') / greatest(len({_TOKS}), 1), 6) AS score,
               lang = 'en' AS y
        FROM documents
    ),
    th AS (SELECT (unnest(range(21)) - 10) / 100.0 AS t),
    cells AS (
        SELECT th.t,
               CAST(sum(CASE WHEN s.score >= th.t AND s.y THEN 1 ELSE 0 END)
                    AS BIGINT) AS tp,
               CAST(sum(CASE WHEN s.score >= th.t AND NOT s.y THEN 1 ELSE 0 END)
                    AS BIGINT) AS fp,
               CAST(sum(CASE WHEN s.score < th.t AND s.y THEN 1 ELSE 0 END)
                    AS BIGINT) AS fn
        FROM th CROSS JOIN scored s
        GROUP BY th.t
    )
    SELECT round(t, 2) AS threshold, tp, fp, fn,
           CAST(tp + fp AS BIGINT) AS n_pred,
           round(tp / greatest(CAST(tp + fp AS DOUBLE), 1.0), 6) AS precision_,
           round(tp / greatest(CAST(tp + fn AS DOUBLE), 1.0), 6) AS recall_,
           round(2.0 * tp / greatest(CAST(2 * tp + fp + fn AS DOUBLE), 1.0), 6)
               AS f1
    FROM cells
    ORDER BY threshold
    """,
)
def q229_pr_curve_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operating-point sweep of the q134 hashed quality classifier
    against the is-English label: precision / recall / F1 at 21
    thresholds — the curve that picks a production cutoff, where
    q177's AUC only summarizes ranking (and on this uncorrelated
    hash-model the flat curve IS the correct finding: the harness
    reports chance-level precision at every threshold; zero-division
    cells use the max(.,1) guard identically in both engines).

    Scale: scores are q134's scan-speed projection (rounded at 6
    BEFORE thresholding so the comparison never rides on float
    summation order); the sweep is a 21-way broadcast fan-out of a
    2-value label relation collapsing straight into a 21-row
    combining agg — the same bounded-grid shape as q178's
    calibration bins. One corpus pass, one 21-cell exchange.
    """
    from g_etl_spark.operators import text as T

    d = load(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    weight = lambda t: (  # noqa: E731
        F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
        / F.lit(4294967296.0)
        - F.lit(0.5)
    )
    score = F.round(
        F.aggregate(F.transform(toks, weight), F.lit(0.0), lambda acc, x: acc + x)
        / F.greatest(F.size(toks), F.lit(1)),
        6,
    )
    scored = d.select(score.alias("score"), (F.col("lang") == "en").alias("y"))
    th = spark.range(21).select(((F.col("id") - 10) / 100.0).alias("t"))
    cells = (
        scored.crossJoin(F.broadcast(th))
        .groupBy("t")
        .agg(
            F.sum(F.when((F.col("score") >= F.col("t")) & F.col("y"), 1).otherwise(0)).alias("tp"),
            F.sum(F.when((F.col("score") >= F.col("t")) & ~F.col("y"), 1).otherwise(0)).alias("fp"),
            F.sum(F.when((F.col("score") < F.col("t")) & F.col("y"), 1).otherwise(0)).alias("fn"),
        )
    )
    return cells.select(
        F.round("t", 2).alias("threshold"),
        "tp",
        "fp",
        "fn",
        (F.col("tp") + F.col("fp")).alias("n_pred"),
        F.round(F.col("tp") / F.greatest((F.col("tp") + F.col("fp")).cast("double"), F.lit(1.0)), 6).alias("precision_"),
        F.round(F.col("tp") / F.greatest((F.col("tp") + F.col("fn")).cast("double"), F.lit(1.0)), 6).alias("recall_"),
        F.round(2.0 * F.col("tp") / F.greatest((2 * F.col("tp") + F.col("fp") + F.col("fn")).cast("double"), F.lit(1.0)), 6).alias("f1"),
    ).orderBy("threshold")


@register(
    "q233_ctfidf_source_keywords",
    oracle=f"""
    WITH tok AS (
        SELECT source, unnest({_TOKS}) AS t FROM documents
    ),
    tf AS MATERIALIZED (
        SELECT source, t, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2
    ),
    cls AS (SELECT source, CAST(sum(tf) AS BIGINT) AS cn FROM tf GROUP BY 1),
    n_cls AS (SELECT CAST(count(*) AS BIGINT) AS a FROM cls),
    df AS (SELECT t, CAST(count(*) AS BIGINT) AS cf FROM tf GROUP BY t),
    scored AS (
        SELECT tf.source, tf.t, tf.tf,
               round((CAST(tf.tf AS DOUBLE) / cls.cn)
                     * ln(1.0 + CAST((SELECT a FROM n_cls) AS DOUBLE) / df.cf), 8)
                   AS ctfidf
        FROM tf JOIN cls USING (source) JOIN df USING (t)
    ),
    ranked AS (
        SELECT source, t, tf, ctfidf,
               row_number() OVER (PARTITION BY source
                                  ORDER BY ctfidf DESC, t) AS rk
        FROM scored
        QUALIFY rk <= 3
    )
    SELECT source, CAST(rk AS INT) AS rk, t AS term, tf, ctfidf
    FROM ranked
    ORDER BY source, rk
    """,
)
def q233_ctfidf_source_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-based TF-IDF keyword extraction (the BERTopic c-TF-IDF
    formula): treat each SOURCE as one class-document, score every
    term by (tf/class_len) x ln(1 + A/cf) where A = #classes and
    cf = #classes containing the term, and emit each source's top-3
    distinctive terms — the labeling step that names the clusters
    q97/q220 produce, distinct from q128 (doc-pair similarity) and
    q74 (query retrieval). Scores round at 8 BEFORE the rank
    (q162's contract) with term tie-break.

    Scale: one token fan-out into a (source, term)-keyed combining
    agg (the corpus exchange); class lengths and class-frequency are
    rollups OF that aggregate; the top-3 window runs per source over
    |vocab| rows. At web scale the vocab agg is exactly q42's
    bounded-cardinality shape.
    """
    from g_etl_spark.operators import text as T

    d = load(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(T.tokens(F.col("text"))).alias("t"))
    tf = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("tf"))
    cls = tf.groupBy("source").agg(F.sum("tf").alias("cn"))
    n_cls = cls.agg(F.count(F.lit(1)).alias("a"))
    df_ = tf.groupBy("t").agg(F.count(F.lit(1)).alias("cf"))
    scored = (
        tf.join(F.broadcast(cls), "source")
        .join(df_, "t")
        .crossJoin(F.broadcast(n_cls))
        .select(
            "source",
            "t",
            "tf",
            F.round(
                (F.col("tf").cast("double") / F.col("cn"))
                * F.log(1.0 + F.col("a").cast("double") / F.col("cf")),
                8,
            ).alias("ctfidf"),
        )
    )
    wk = Window.partitionBy("source").orderBy(F.desc("ctfidf"), "t")
    return (
        scored.withColumn("rk", F.row_number().over(wk))
        .where(F.col("rk") <= 3)
        .select("source", F.col("rk").cast("int").alias("rk"), F.col("t").alias("term"), "tf", "ctfidf")
        .orderBy("source", "rk")
    )


@register(
    "q234_pii_inventory",
    oracle=r"""
    WITH corpus AS (
        SELECT source,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or 555-123-'
                    || CAST(1000 + doc_id % 9000 AS VARCHAR)
                    || CASE WHEN doc_id % 7 = 0
                            THEN ' from 192.168.' || CAST(doc_id % 256 AS VARCHAR)
                                 || '.' || CAST((doc_id * 3) % 256 AS VARCHAR)
                            ELSE '' END
                    || CASE WHEN doc_id % 11 = 0
                            THEN ' id 880101-' || CAST(1000 + doc_id % 9000 AS VARCHAR)
                            ELSE '' END AS text
        FROM documents
    ),
    per_doc AS (
        SELECT source,
               len(regexp_extract_all(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS emails,
               len(regexp_extract_all(text,
                   '\+?\d{3}[- ]?\d{3}[- ]?\d{4}')) AS phones,
               len(regexp_extract_all(text,
                   '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}')) AS ips,
               len(regexp_extract_all(text, '\d{6}-\d{4}')) AS natl_ids
        FROM corpus
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(emails) AS BIGINT) AS emails,
           CAST(sum(phones) AS BIGINT) AS phones,
           CAST(sum(ips) AS BIGINT) AS ips,
           CAST(sum(natl_ids) AS BIGINT) AS natl_ids,
           CAST(sum(CASE WHEN emails + phones + ips + natl_ids > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
           round(sum(CASE WHEN emails + phones + ips + natl_ids > 0
                          THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 4)
               AS pii_doc_rate
    FROM per_doc
    GROUP BY source
    ORDER BY source
    """,
)
def q234_pii_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII inventory per source: counts of email / phone / IPv4 /
    national-id patterns and the fraction of documents containing
    any — the AUDIT that precedes q46's redaction (you measure
    before you scrub, and re-run after to certify zero). Same regex
    family and planted-PII corpus as q46 (emails+phones on every doc,
    IPv4 on doc_id%7, national ids on doc_id%11), applied as counts
    instead of rewrites — so every pattern column is exercised
    non-vacuously at the gate SFs.

    Scale: pure map-side regexp_extract_all + size per row (JVM
    regex inside codegen, no UDF), collapsing into a |sources|-row
    combining agg — the scan IS the audit. The pattern list extends
    by adding a column, not a pass.
    """
    d = load(spark, sf_dir, "documents")
    corpus = d.select(
        "source",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-123-"),
            (1000 + F.col("doc_id") % 9000).cast("string"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" from 192.168."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit("."),
                    ((F.col("doc_id") * 3) % 256).cast("string"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(
                    F.lit(" id 880101-"),
                    (1000 + F.col("doc_id") % 9000).cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    cnt = lambda pat: F.size(F.regexp_extract_all("text", F.lit(pat), 0))  # noqa: E731
    per_doc = corpus.select(
        "source",
        cnt(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}").alias("emails"),
        cnt(r"\+?\d{3}[- ]?\d{3}[- ]?\d{4}").alias("phones"),
        cnt(r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}").alias("ips"),
        cnt(r"\d{6}-\d{4}").alias("natl_ids"),
    )
    any_pii = (
        F.col("emails") + F.col("phones") + F.col("ips") + F.col("natl_ids") > 0
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("emails").alias("emails"),
            F.sum("phones").alias("phones"),
            F.sum("ips").alias("ips"),
            F.sum("natl_ids").alias("natl_ids"),
            F.sum(F.when(any_pii, 1).otherwise(0)).alias("docs_with_pii"),
        )
        .select(
            "source",
            "n_docs",
            "emails",
            "phones",
            "ips",
            "natl_ids",
            "docs_with_pii",
            F.round(F.col("docs_with_pii") / F.col("n_docs").cast("double"), 4).alias(
                "pii_doc_rate"
            ),
        )
        .orderBy("source")
    )


@register(
    "q243_isotonic_calibration",
    oracle=f"""
    WITH scored AS MATERIALIZED (
        SELECT round(
                   list_aggregate(
                       list_transform({_TOKS},
                           t -> CAST(CAST('0x' || substr(md5(t), 1, 8) AS UBIGINT)
                                     AS BIGINT) / 4294967296.0 - 0.5),
                       'sum') / greatest(len({_TOKS}), 1), 6) AS score,
               CAST(lang = 'en' AS INT) AS y
        FROM documents
    ),
    mm AS (SELECT min(score) AS mn, max(score) AS mx FROM scored),
    binned AS (
        SELECT CAST(least(9, floor((s.score - mm.mn) * 10.0 / (mm.mx - mm.mn)))
                    AS BIGINT) AS b,
               s.y
        FROM scored s CROSS JOIN mm
    ),
    bins AS MATERIALIZED (
        SELECT g.b,
               CAST(count(s.y) AS BIGINT) AS n,
               CAST(coalesce(sum(s.y), 0) AS BIGINT) AS pos
        FROM (SELECT unnest(range(10)) AS b) g
        LEFT JOIN binned s ON s.b = g.b
        GROUP BY g.b
    ),
    cum AS MATERIALIZED (
        SELECT b, n, pos,
               sum(n) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS cn,
               sum(pos) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS cp
        FROM bins
    ),
    -- avg(j..k) from prefix sums; minimax PAV: iso_i = max_j<=i min_k>=i avg(j,k)
    seg AS MATERIALIZED (
        SELECT j.b AS j, k.b AS k,
               (k.cp - j.cp + j.pos) / CAST(k.cn - j.cn + j.n AS DOUBLE) AS avgjk
        FROM cum j JOIN cum k ON j.b <= k.b
        WHERE k.cn - j.cn + j.n > 0
    ),
    inner_min AS (
        SELECT i.b AS i, s.j, min(s.avgjk) AS mn
        FROM cum i JOIN seg s ON s.j <= i.b AND s.k >= i.b
        GROUP BY i.b, s.j
    ),
    iso AS (
        SELECT i, max(mn) AS iso_rate FROM inner_min GROUP BY i
    )
    SELECT bins.b AS bin, bins.n, bins.pos,
           round(CASE WHEN bins.n > 0
                      THEN bins.pos / CAST(bins.n AS DOUBLE) END, 6) AS raw_rate,
           round(iso.iso_rate, 6) AS iso_rate
    FROM bins JOIN iso ON iso.i = bins.b
    ORDER BY bins.b
    """,
)
def q243_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAV) calibration of the q134 quality classifier
    against the is-English label: the pool-adjacent-violators fit
    over 10 score bins via the exact minimax identity
    iso_i = max_{j<=i} min_{k>=i} avg(y[j..k]) — q178 DIAGNOSES
    miscalibration, this produces the monotone calibrated rates a
    production scorer actually applies (and on an uncorrelated
    hash-model the fit collapses toward the base rate, which is the
    correct answer and what the flat-fit test pins).

    The minimax runs on the BOUNDED bin relation: segment averages
    come from prefix sums (10x10 upper-triangle), the inner min and
    outer max are two aggs over <=1000 cells — PAV's sequential
    pooling re-expressed as closed-form relational algebra, exact
    because segment averages are integer ratios. The corpus touch is
    one scan into the 10-cell histogram (q219's shape).

    Scale: corpus -> 10 cells in one combining agg; everything after
    is constant-size. With B bins the minimax is O(B^3) cells — at
    B=100 still trivial, and always deterministic (no iterative
    pooling order to replicate cross-engine).
    """
    from g_etl_spark.operators import text as T

    d = load(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    weight = lambda t: (  # noqa: E731
        F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
        / F.lit(4294967296.0)
        - F.lit(0.5)
    )
    score = F.round(
        F.aggregate(F.transform(toks, weight), F.lit(0.0), lambda acc, x: acc + x)
        / F.greatest(F.size(toks), F.lit(1)),
        6,
    )
    scored = d.select(score.alias("score"), (F.col("lang") == "en").cast("int").alias("y"))
    mm = scored.agg(F.min("score").alias("mn"), F.max("score").alias("mx"))
    binned = scored.crossJoin(F.broadcast(mm)).select(
        F.least(
            F.lit(9),
            F.floor((F.col("score") - F.col("mn")) * 10.0 / (F.col("mx") - F.col("mn"))),
        )
        .cast("long")
        .alias("b"),
        "y",
    )
    grid = spark.range(10).select(F.col("id").alias("b"))
    bins = (
        grid.join(binned.groupBy("b").agg(
            F.count(F.lit(1)).alias("n0"), F.sum("y").alias("p0")
        ), "b", "left")
        .select(
            "b",
            F.coalesce("n0", F.lit(0)).alias("n"),
            F.coalesce("p0", F.lit(0)).alias("pos"),
        )
    )
    wc = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    cum = bins.select(
        "b", "n", "pos", F.sum("n").over(wc).alias("cn"), F.sum("pos").over(wc).alias("cp")
    )
    j = cum.select(
        F.col("b").alias("j"), F.col("n").alias("jn"),
        F.col("pos").alias("jp"), F.col("cn").alias("jcn"), F.col("cp").alias("jcp"),
    )
    k = cum.select(
        F.col("b").alias("k"), F.col("cn").alias("kcn"), F.col("cp").alias("kcp")
    )
    seg = (
        j.join(k, F.col("j") <= F.col("k"))
        .where(F.col("kcn") - F.col("jcn") + F.col("jn") > 0)
        .select(
            "j",
            "k",
            (
                (F.col("kcp") - F.col("jcp") + F.col("jp"))
                / (F.col("kcn") - F.col("jcn") + F.col("jn")).cast("double")
            ).alias("avgjk"),
        )
    )
    i_rel = cum.select(F.col("b").alias("i"))
    inner_min = (
        i_rel.join(seg, (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")))
        .groupBy("i", "j")
        .agg(F.min("avgjk").alias("mn"))
    )
    iso = inner_min.groupBy("i").agg(F.max("mn").alias("iso_rate"))
    return (
        bins.join(iso, bins["b"] == iso["i"])
        .select(
            F.col("b").alias("bin"),
            "n",
            "pos",
            F.round(
                F.when(F.col("n") > 0, F.col("pos") / F.col("n").cast("double")), 6
            ).alias("raw_rate"),
            F.round("iso_rate", 6).alias("iso_rate"),
        )
        .orderBy("bin")
    )


@register(
    "q258_tokenizer_fertility",
    oracle=f"""
    WITH t AS (
        SELECT lang, source,
               len(regexp_extract_all(lower(trim(text)),
                   '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_tok,
               len({_TOKS}) AS n_words,
               len(trim(text)) AS n_chars
        FROM documents
    )
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           round(sum(n_tok) * 1.0 / sum(n_words), 4) AS fertility,
           round(sum(n_chars) * 1.0 / sum(n_tok), 4) AS chars_per_token
    FROM t GROUP BY lang, source ORDER BY lang, source
    """,
)
def q258_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit per (language, source): subword
    tokens per whitespace word and characters per token, under a
    GPT-2-style pre-tokenization regex (letter runs / digit runs /
    single punctuation) — the numbers a tokenizer owner watches per
    corpus slice, because high fertility on a language means that
    language pays more compute per sentence and the mixture weights
    (q228) silently shift in effective tokens. The measurement
    companion to q130 (BPE pair counting = training) and q191 (vocab
    coverage = inference OOV).

    Scale: pure map-side regex extraction + counting inside codegen
    (no explode — only the COUNT of matches survives the map), one
    combining agg on the bounded (lang, source) grid. The regex is
    anchored to character classes only, so Java regex and RE2 agree
    token-for-token.
    """
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "lang",
        "source",
        F.size(
            F.expr("regexp_extract_all(lower(trim(text)), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")
        ).alias("n_tok"),
        F.size(T.tokens(F.col("text"))).alias("n_words"),
        F.length(F.trim("text")).alias("n_chars"),
    )
    return (
        t.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.round(F.sum("n_tok") * 1.0 / F.sum("n_words"), 4).alias("fertility"),
            F.round(F.sum("n_chars") * 1.0 / F.sum("n_tok"), 4).alias(
                "chars_per_token"
            ),
        )
        .orderBy("lang", "source")
    )


@register(
    "q263_bm25_retrieval_eval",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, {_TOKS} AS t, len({_TOKS}) AS dl FROM documents
    ),
    stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl
              FROM base),
    tf AS (
        SELECT doc_id, dl, token, CAST(count(*) AS DOUBLE) AS tf
        FROM (SELECT doc_id, dl, unnest(t) AS token FROM base)
        GROUP BY doc_id, dl, token
    ),
    dft AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM tf
            GROUP BY token),
    tfj AS (SELECT tf.*, dft.df FROM tf JOIN dft USING (token)),
    qsel AS (
        SELECT doc_id AS qid, token AS qterm
        FROM (
            SELECT doc_id, token,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY df, token) AS rn
            FROM tfj WHERE doc_id % 37 = 0
        ) WHERE rn = 1
    ),
    cand AS (
        SELECT q.qid, c.doc_id,
               ln((stats.n_docs - c.df + 0.5) / (c.df + 0.5) + 1.0)
               * c.tf * ({_BM25_K1} + 1.0)
               / (c.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                  + {_BM25_B} * c.dl / stats.avgdl)) AS s
        FROM qsel q JOIN tfj c ON c.token = q.qterm CROSS JOIN stats
    ),
    ranks AS (
        SELECT o.qid,
               1 + CAST(sum(CASE WHEN c.s > o.s
                                 OR (c.s = o.s AND c.doc_id < o.qid)
                            THEN 1 ELSE 0 END) AS BIGINT) AS rnk
        FROM (SELECT qid, s FROM cand WHERE doc_id = qid) o
        JOIN cand c ON c.qid = o.qid
        GROUP BY o.qid
    )
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           round(avg(1.0 / rnk), 6) AS mrr,
           round(avg(CASE WHEN rnk = 1 THEN 1.0 ELSE 0.0 END), 6)
               AS recall_at_1,
           round(avg(CASE WHEN rnk <= 10 THEN 1.0 ELSE 0.0 END), 6)
               AS recall_at_10,
           round(avg(CAST(rnk AS DOUBLE)), 4) AS mean_rank
    FROM ranks
    """,
)
def q263_bm25_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-retrieval evaluation of the BM25 ranker (q74): every
    37th document becomes a query whose text is its RAREST term
    (min document frequency, lexicographic tie-break — the most
    distinctive single-term query the doc can issue), and the
    harness scores how the ranker places the source doc among all
    docs containing that term: MRR, recall@1/@10, mean rank. The
    retrieval sibling of q192/q199/q253 — those grade dedup
    detectors and blocking; this grades the SEARCH surface, and a
    drop in self-retrieval MRR is the canary for tokenizer or
    scoring regressions.

    Scale: the rank join is per-query bounded by df(qterm), and the
    rarest-term selection makes that df SMALL by construction (the
    q153 df-cap argument applied to retrieval); everything upstream
    is the q74/q128 tf/df relation (one explode + two combining
    aggs). No corpus x corpus stage anywhere.
    """
    d = load(spark, sf_dir, "documents")
    base = d.select("doc_id", T.tokens(F.col("text")).alias("t")).withColumn(
        "dl", F.size("t").cast("double")
    )
    tf = (
        base.select("doc_id", "dl", F.explode("t").alias("token"))
        .groupBy("doc_id", "dl", "token")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    dft = tf.groupBy("token").agg(F.count(F.lit(1)).cast("double").alias("df"))
    tfj = tf.join(dft, "token")
    wq = Window.partitionBy("doc_id").orderBy("df", "token")
    qsel = (
        tfj.where(F.col("doc_id") % 37 == 0)
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") == 1)
        .select(F.col("doc_id").alias("qid"), F.col("token").alias("qterm"))
    )
    k1, b = _BM25_K1, _BM25_B
    cand = (
        qsel.join(tfj, tfj["token"] == qsel["qterm"])
        .crossJoin(F.broadcast(stats))
        .select(
            "qid",
            "doc_id",
            (
                F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
                * F.col("tf")
                * (k1 + 1.0)
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("s"),
        )
    )
    own = cand.where(F.col("doc_id") == F.col("qid")).select(
        "qid", F.col("s").alias("qs")
    )
    ranks = (
        cand.join(own, "qid")
        .groupBy("qid")
        .agg(
            (
                1
                + F.sum(
                    F.when(
                        (F.col("s") > F.col("qs"))
                        | ((F.col("s") == F.col("qs")) & (F.col("doc_id") < F.col("qid"))),
                        1,
                    ).otherwise(0)
                )
            ).alias("rnk")
        )
    )
    return ranks.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.round(F.avg(1.0 / F.col("rnk")), 6).alias("mrr"),
        F.round(F.avg(F.when(F.col("rnk") == 1, 1.0).otherwise(0.0)), 6).alias(
            "recall_at_1"
        ),
        F.round(F.avg(F.when(F.col("rnk") <= 10, 1.0).otherwise(0.0)), 6).alias(
            "recall_at_10"
        ),
        F.round(F.avg(F.col("rnk").cast("double")), 4).alias("mean_rank"),
    )


@register(
    "q273_gains_curve",
    oracle="""
    WITH scored AS (
        SELECT doc_id, n_chars,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
               ntile(10) OVER (ORDER BY n_chars DESC, doc_id) AS decile
        FROM documents
    ),
    g AS (
        SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(pos) AS BIGINT) AS n_pos
        FROM scored GROUP BY decile
    ),
    t AS (SELECT sum(n_docs) AS tn, sum(n_pos) AS tp FROM g),
    c AS (
        SELECT decile, n_docs, n_pos,
               sum(n_docs) OVER w * 1.0 / t.tn AS cum_pop_share,
               sum(n_pos) OVER w * 1.0 / t.tp AS cum_pos_share
        FROM g, t
        WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    )
    SELECT CAST(decile AS BIGINT) AS decile, n_docs, n_pos,
           round(cum_pop_share, 4) AS cum_pop_share,
           round(cum_pos_share, 4) AS cum_pos_share,
           round(cum_pos_share / cum_pop_share, 4) AS cum_lift
    FROM c ORDER BY decile
    """,
)
def q273_gains_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift table: rank documents by a score
    (length as the quality proxy), cut into score-ordered deciles,
    and report the cumulative share of positives (English docs)
    captured per population share — the model-eval artifact a
    targeting or curriculum team reads next to q229's PR sweep
    (threshold view) and q178's calibration (probability view); a
    useless score gives lift 1.0 everywhere.

    Scale: the decile assignment is the operators/ranking TWO-PASS
    global ntile (descending score via negated key, bucket-
    partitioned windows only — the q238/q240 machinery dogfooded);
    everything after is a 10-cell rollup with a bounded cumulative
    window (q243 bounded-relation contract).
    """
    from g_etl_spark.operators.ranking import global_ntile_twopass, log2_bucket

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
        (-F.col("n_chars")).alias("neg"),
    )
    scored = global_ntile_twopass(
        d, 10, ["neg", "doc_id"], -log2_bucket(F.col("n_chars")), out="decile"
    )
    g = scored.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("pos").cast("long").alias("n_pos")
    )
    t = g.agg(F.sum("n_docs").alias("tn"), F.sum("n_pos").alias("tp"))
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    c = g.crossJoin(F.broadcast(t)).select(
        "decile",
        "n_docs",
        "n_pos",
        (F.sum("n_docs").over(w) * 1.0 / F.col("tn")).alias("cum_pop_share"),
        (F.sum("n_pos").over(w) * 1.0 / F.col("tp")).alias("cum_pos_share"),
    )
    return c.select(
        "decile",
        "n_docs",
        "n_pos",
        F.round("cum_pop_share", 4).alias("cum_pop_share"),
        F.round("cum_pos_share", 4).alias("cum_pos_share"),
        F.round(F.col("cum_pos_share") / F.col("cum_pop_share"), 4).alias("cum_lift"),
    ).orderBy("decile")


@register(
    "q293_ingestion_quality_drift",
    oracle=f"""
    WITH mx AS (SELECT max(doc_id) AS m FROM documents),
    b AS (
        SELECT least(doc_id * 10 // (mx.m + 1), 9)
                   AS ingest_decile,
               n_chars,
               len({_TOKS}) AS n_tok,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en
        FROM documents, mx
    )
    SELECT ingest_decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(n_chars), 2) AS mean_chars,
           round(avg(n_tok), 2) AS mean_tokens,
           round(avg(is_en), 4) AS en_share
    FROM b GROUP BY 1 ORDER BY 1
    """,
)
def q293_ingestion_quality_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus quality drift by ingestion batch: treat doc_id order as
    crawl order, cut it into ten ingest deciles, and track the
    quality proxies (length, token count, language mix) across them
    — the monitoring view that catches a degrading crawl or a feed
    change WHEN it entered the corpus, not after training (q219/q283
    compare two snapshots; this localizes drift along the ingestion
    axis itself).

    Scale: the decile is map-side arithmetic against one broadcast
    max (no sort, no ntile — ingest position IS the id); one
    combining agg to ten cells. The cheapest drift monitor a corpus
    can run.
    """
    d = load(spark, sf_dir, "documents")
    mx = d.agg(F.max("doc_id").alias("m"))
    b = d.crossJoin(F.broadcast(mx)).select(
        F.least(
            F.expr("doc_id * 10 div (m + 1)"), F.lit(9).cast("long")
        ).alias("ingest_decile"),
        "n_chars",
        F.size(T.tokens(F.col("text"))).alias("n_tok"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("is_en"),
    )
    return (
        b.groupBy("ingest_decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 2).alias("mean_chars"),
            F.round(F.avg("n_tok"), 2).alias("mean_tokens"),
            F.round(F.avg("is_en"), 4).alias("en_share"),
        )
        .orderBy("ingest_decile")
    )


_HEAPS_CORPUS = (
    "SELECT doc_id, text || ' w' || CAST(CAST(floor(sqrt(doc_id)) AS BIGINT)"
    " AS VARCHAR) AS text FROM documents"
)


@register(
    "q297_heaps_law_fit",
    oracle=f"""
    WITH corpus AS ({_HEAPS_CORPUS}),
    tok AS (
        SELECT doc_id, unnest({_TOKS}) AS token FROM corpus
    ),
    first_seen AS (
        SELECT token, min(doc_id) AS fd FROM tok GROUP BY token
    ),
    per_doc AS (
        SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS nt FROM corpus
    ),
    mx AS (SELECT max(doc_id) AS m FROM documents),
    cps AS (
        SELECT d, CAST(ceil(mx.m * d / 10.0) AS BIGINT) AS thr
        FROM (SELECT unnest(range(1, 11)) AS d), mx
    ),
    curve AS (
        SELECT cps.d, cps.thr,
               (SELECT CAST(sum(nt) AS BIGINT) FROM per_doc
                WHERE doc_id <= cps.thr) AS n_tokens_cum,
               (SELECT CAST(count(*) AS BIGINT) FROM first_seen
                WHERE fd <= cps.thr) AS vocab_cum
        FROM cps
    ),
    pts AS (
        SELECT d, thr, n_tokens_cum, vocab_cum,
               ln(CAST(n_tokens_cum AS DOUBLE)) AS x,
               ln(CAST(vocab_cum AS DOUBLE)) AS y
        FROM curve
    ),
    fit AS (
        SELECT (sum(x * y) - sum(x) * sum(y) / count(*))
               / (sum(x * x) - sum(x) * sum(x) / count(*)) AS beta,
               sum(y) / count(*) AS my, sum(x) / count(*) AS mx2
        FROM pts
    )
    SELECT pts.d, pts.thr, pts.n_tokens_cum, pts.vocab_cum,
           round(fit.beta, 6) AS heaps_beta,
           round(exp(fit.my - fit.beta * fit.mx2), 4) AS heaps_k
    FROM pts CROSS JOIN fit
    ORDER BY pts.d
    """,
)
def q297_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth fit V(N) = k·N^β — the companion
    of q132's Zipf fit and the capacity planner behind q191's vocab
    budget: measure cumulative distinct-token count V against
    cumulative token count N at 10 corpus-prefix checkpoints (by
    doc_id, the ingestion order), then log-log OLS for (k, β).
    Natural text sits at β≈0.4-0.6; β drifting toward 1 flags a
    corpus whose "vocabulary" never saturates (serial numbers, ids,
    mojibake) — a tokenizer red flag before training one. The
    synthetic corpus has a CLOSED 31-token vocabulary (the fit would
    be exactly 0), so a √-growth vocabulary is PLANTED — one
    'w⌊√doc_id⌋' token appended per document, identically in both
    engines (the q298 planted-corpus precedent) — giving a true
    β≈0.5 curve for the estimator to recover (pinned in tests).

    Scale: cumulative distinct WITHOUT re-scanning per checkpoint —
    V(t) = |{{tokens whose FIRST doc ≤ t}}|, so one explode+min-agg
    produces first-occurrence docs, and each checkpoint is a
    conditional count over that |vocab| rollup against a broadcast
    10-row threshold set (same trick for N(t) over the per-doc token
    counts). The OLS fit is an agg over 10 points, broadcast back.
    No window anywhere; nothing corpus-sized ever sorts.
    """
    base = load(spark, sf_dir, "documents")
    d = base.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" w"),
            F.floor(F.sqrt(F.col("doc_id"))).cast("long").cast("string"),
        ).alias("text"),
    )
    toks = T.tokens(F.col("text"))
    tok = d.select("doc_id", F.explode(toks).alias("token"))
    first_seen = tok.groupBy("token").agg(F.min("doc_id").alias("fd"))
    per_doc = d.select("doc_id", F.size(toks).cast("long").alias("nt"))
    mx = base.agg(F.max("doc_id").alias("m"))
    ds = spark.range(1, 11).select(F.col("id").cast("long").alias("d"))
    cps = ds.crossJoin(F.broadcast(mx)).select(
        "d", F.ceil(F.col("m") * F.col("d") / 10.0).cast("long").alias("thr")
    )
    v_cum = (
        first_seen.crossJoin(F.broadcast(cps))
        .groupBy("d", "thr")
        .agg(
            F.sum(F.when(F.col("fd") <= F.col("thr"), 1).otherwise(0))
            .cast("long")
            .alias("vocab_cum")
        )
    )
    n_cum = (
        per_doc.crossJoin(F.broadcast(cps))
        .groupBy("d")
        .agg(
            F.sum(F.when(F.col("doc_id") <= F.col("thr"), F.col("nt")).otherwise(0))
            .cast("long")
            .alias("n_tokens_cum")
        )
    )
    pts = (
        v_cum.join(n_cum, "d")
        .select(
            "d",
            "thr",
            "n_tokens_cum",
            "vocab_cum",
            F.log(F.col("n_tokens_cum").cast("double")).alias("x"),
            F.log(F.col("vocab_cum").cast("double")).alias("y"),
        )
    )
    cnt = F.count(F.lit(1))
    fit = pts.agg(
        (
            (F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y") / cnt)
            / (F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x") / cnt)
        ).alias("beta"),
        (F.sum("y") / cnt).alias("my"),
        (F.sum("x") / cnt).alias("mx2"),
    )
    return (
        pts.crossJoin(F.broadcast(fit))
        .select(
            "d",
            "thr",
            "n_tokens_cum",
            "vocab_cum",
            F.round(F.col("beta"), 6).alias("heaps_beta"),
            F.round(F.exp(F.col("my") - F.col("beta") * F.col("mx2")), 4).alias(
                "heaps_k"
            ),
        )
        .orderBy("d")
    )


@register(
    "q298_encoding_artifact_audit",
    oracle="""
    WITH corpus AS (
        SELECT doc_id, source,
               text
               || CASE WHEN doc_id % 37 = 0
                       THEN ' caf' || chr(195) || chr(169) ELSE '' END
               || CASE WHEN doc_id % 41 = 0 THEN chr(65533) ELSE '' END
               || CASE WHEN doc_id % 43 = 0 THEN chr(7) ELSE '' END
               || CASE WHEN doc_id % 47 = 0 THEN chr(160) ELSE '' END AS t2
        FROM documents
    ),
    flags AS (
        SELECT source,
               CASE WHEN contains(t2, chr(195) || chr(169)) THEN 1 ELSE 0 END AS f_moji,
               CASE WHEN contains(t2, chr(65533)) THEN 1 ELSE 0 END AS f_repl,
               CASE WHEN contains(t2, chr(7)) THEN 1 ELSE 0 END AS f_ctrl,
               CASE WHEN contains(t2, chr(160)) THEN 1 ELSE 0 END AS f_nbsp
        FROM corpus
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(f_moji) AS BIGINT) AS n_mojibake,
           CAST(sum(f_repl) AS BIGINT) AS n_replacement,
           CAST(sum(f_ctrl) AS BIGINT) AS n_control,
           CAST(sum(f_nbsp) AS BIGINT) AS n_nbsp,
           round(1.0 - CAST(sum(CASE WHEN f_moji + f_repl + f_ctrl + f_nbsp > 0
                                     THEN 1 ELSE 0 END) AS DOUBLE)
                       / count(*), 6) AS clean_rate
    FROM flags
    GROUP BY source
    ORDER BY source
    """,
)
def q298_encoding_artifact_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-artifact (mojibake) audit per source - the corpus
    hygiene check every web-crawl ingest runs before tokenization:
    count documents containing UTF-8-decoded-as-Latin-1 sequences
    (U+00C3 U+00A9 = mojibake e-acute), the U+FFFD replacement
    character (lossy transcoding), C0 control characters (binary
    contamination), and non-breaking spaces (tokenizer splitters
    miss them), plus the per-source clean rate. The synthetic corpus
    is clean, so artifacts are PLANTED deterministically by doc_id
    modulus - identically in both engines (the q46/q234 planted-PII
    precedent) - and a test pins each planted count exactly so no
    column is vacuously zero.

    Scale: map-only substring scans in whole-stage codegen (literal
    `contains`, no regex backtracking), one combining agg to
    |sources| rows. At 100 TB this is a free rider on any existing
    full-text pass (q40's stats scan can carry these flags).
    """
    d = load(spark, sf_dir, "documents")
    moji = chr(195) + chr(169)   # UTF-8 e-acute bytes decoded as Latin-1
    repl = chr(65533)            # U+FFFD replacement character
    ctrl = chr(7)                # C0 control (BEL)
    nbsp = chr(160)              # U+00A0 non-breaking space
    t2 = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 37 == 0, " caf" + moji).otherwise(""),
        F.when(F.col("doc_id") % 41 == 0, repl).otherwise(""),
        F.when(F.col("doc_id") % 43 == 0, ctrl).otherwise(""),
        F.when(F.col("doc_id") % 47 == 0, nbsp).otherwise(""),
    )
    flag = lambda needle: F.when(  # noqa: E731
        F.instr(F.col("t2"), needle) > 0, 1
    ).otherwise(0)
    flags = d.select("source", t2.alias("t2")).select(
        "source",
        flag(moji).alias("f_moji"),
        flag(repl).alias("f_repl"),
        flag(ctrl).alias("f_ctrl"),
        flag(nbsp).alias("f_nbsp"),
    )
    dirty = (
        F.col("f_moji") + F.col("f_repl") + F.col("f_ctrl") + F.col("f_nbsp") > 0
    )
    return (
        flags.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("f_moji").cast("long").alias("n_mojibake"),
            F.sum("f_repl").cast("long").alias("n_replacement"),
            F.sum("f_ctrl").cast("long").alias("n_control"),
            F.sum("f_nbsp").cast("long").alias("n_nbsp"),
            F.round(
                1.0
                - F.sum(F.when(dirty, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("clean_rate"),
        )
        .orderBy("source")
    )


@register(
    "q300_naive_bayes_langid",
    oracle=f"""
    WITH labeled AS (
        SELECT doc_id,
               CASE WHEN lang = 'en' THEN 'en' ELSE 'other' END AS actual,
               CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS is_test,
               {_TOKS} AS toks
        FROM documents
    ),
    train_tok AS (
        SELECT unnest(toks) AS token, actual FROM labeled WHERE is_test = 0
    ),
    counts AS (
        SELECT token,
               CAST(sum(CASE WHEN actual = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS c_en,
               CAST(sum(CASE WHEN actual = 'other' THEN 1 ELSE 0 END) AS BIGINT) AS c_ot
        FROM train_tok GROUP BY token
    ),
    tot AS (
        SELECT CAST(sum(c_en) AS BIGINT) AS n_en,
               CAST(sum(c_ot) AS BIGINT) AS n_ot,
               CAST(count(*) AS BIGINT) AS v
        FROM counts
    ),
    lp AS (
        SELECT token,
               CAST(round(ln(CAST(c_en + 1 AS DOUBLE) / CAST(n_en + v AS DOUBLE)) * 1000000) AS BIGINT) AS q_en,
               CAST(round(ln(CAST(c_ot + 1 AS DOUBLE) / CAST(n_ot + v AS DOUBLE)) * 1000000) AS BIGINT) AS q_ot
        FROM counts CROSS JOIN tot
    ),
    prior AS (
        SELECT CAST(round(ln(CAST(sum(CASE WHEN actual = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
                             / count(*)) * 1000000) AS BIGINT) AS p_en,
               CAST(round(ln(CAST(sum(CASE WHEN actual = 'other' THEN 1 ELSE 0 END) AS DOUBLE)
                             / count(*)) * 1000000) AS BIGINT) AS p_ot
        FROM labeled WHERE is_test = 0
    ),
    defaults AS (
        SELECT CAST(round(ln(1.0 / CAST(n_en + v AS DOUBLE)) * 1000000) AS BIGINT) AS d_en,
               CAST(round(ln(1.0 / CAST(n_ot + v AS DOUBLE)) * 1000000) AS BIGINT) AS d_ot
        FROM tot
    ),
    test_tok AS (
        SELECT doc_id, actual, unnest(toks) AS token
        FROM labeled WHERE is_test = 1
    ),
    scored AS (
        SELECT t.doc_id, t.actual,
               CAST(sum(coalesce(lp.q_en, defaults.d_en)) AS BIGINT) AS s_en,
               CAST(sum(coalesce(lp.q_ot, defaults.d_ot)) AS BIGINT) AS s_ot
        FROM test_tok t
        LEFT JOIN lp ON t.token = lp.token
        CROSS JOIN defaults
        GROUP BY t.doc_id, t.actual
    ),
    pred AS (
        SELECT actual,
               CASE WHEN s_en + prior.p_en >= s_ot + prior.p_ot
                    THEN 'en' ELSE 'other' END AS predicted
        FROM scored CROSS JOIN prior
    ),
    conf AS (
        SELECT actual, predicted, CAST(count(*) AS BIGINT) AS n_docs
        FROM pred GROUP BY actual, predicted
    ),
    acc AS (
        SELECT round(CAST(sum(CASE WHEN actual = predicted THEN n_docs ELSE 0 END) AS DOUBLE)
                     / sum(n_docs), 6) AS accuracy
        FROM conf
    )
    SELECT conf.actual, conf.predicted, conf.n_docs, acc.accuracy
    FROM conf CROSS JOIN acc
    ORDER BY actual, predicted
    """,
)
def q300_naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier, trained AND
    evaluated in one plan — the classic fastText-style corpus router
    (q41's n-gram langid is a fixed heuristic; this LEARNS token
    likelihoods from a labeled split): Laplace-smoothed per-class
    token log-probabilities from the 80% train split (doc_id%5!=0),
    log-posterior argmax on the held-out 20%, confusion matrix +
    accuracy out. The synthetic corpus draws every language from one
    shared ~31-token vocabulary, so the learnable signal is weak and
    accuracy sits near the class prior — the q177 convention: the
    train/score/eval HARNESS is the deliverable, not this corpus's
    verdict. Log-probabilities are QUANTIZED to integer
    micro-nats before the per-document sum, so the reduction is
    exact integer arithmetic — engine-order-independent (the q134/
    q229 rounded-score discipline) — and OOV test tokens fall back
    to the Laplace floor ln(1/(N_c+V)) via left-join coalesce.

    Scale: training is ONE combining agg over exploded train tokens
    (|vocab| rows out); scoring joins test tokens to the vocab
    relation — broadcast here, a plain hash equi-join at 100 TB —
    then one combining agg per doc. No window, no driver loop; the
    model lives in a relation, never on the driver.
    """
    d = load(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    labeled = d.select(
        "doc_id",
        F.when(F.col("lang") == "en", "en").otherwise("other").alias("actual"),
        (F.col("doc_id") % 5 == 0).alias("is_test"),
        toks.alias("toks"),
    )
    train_tok = labeled.filter(~F.col("is_test")).select(
        F.explode("toks").alias("token"), "actual"
    )
    counts = train_tok.groupBy("token").agg(
        F.sum(F.when(F.col("actual") == "en", 1).otherwise(0)).cast("long").alias("c_en"),
        F.sum(F.when(F.col("actual") == "other", 1).otherwise(0))
        .cast("long")
        .alias("c_ot"),
    )
    tot = counts.agg(
        F.sum("c_en").cast("long").alias("n_en"),
        F.sum("c_ot").cast("long").alias("n_ot"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    q = lambda col: F.round(col * 1000000.0, 0).cast("long")  # noqa: E731
    lp = counts.crossJoin(F.broadcast(tot)).select(
        "token",
        q(
            F.log(
                (F.col("c_en") + 1).cast("double") / (F.col("n_en") + F.col("v")).cast("double")
            )
        ).alias("q_en"),
        q(
            F.log(
                (F.col("c_ot") + 1).cast("double") / (F.col("n_ot") + F.col("v")).cast("double")
            )
        ).alias("q_ot"),
    )
    prior = labeled.filter(~F.col("is_test")).agg(
        q(
            F.log(
                F.sum(F.when(F.col("actual") == "en", 1).otherwise(0)).cast("double")
                / F.count(F.lit(1))
            )
        ).alias("p_en"),
        q(
            F.log(
                F.sum(F.when(F.col("actual") == "other", 1).otherwise(0)).cast("double")
                / F.count(F.lit(1))
            )
        ).alias("p_ot"),
    )
    defaults = tot.select(
        q(F.log(F.lit(1.0) / (F.col("n_en") + F.col("v")).cast("double"))).alias("d_en"),
        q(F.log(F.lit(1.0) / (F.col("n_ot") + F.col("v")).cast("double"))).alias("d_ot"),
    )
    test_tok = labeled.filter(F.col("is_test")).select(
        "doc_id", "actual", F.explode("toks").alias("token")
    )
    scored = (
        # unhinted model attach: the token log-prob map is
        # vocabulary-grain (Heaps-law unbounded on natural text) —
        # AQE broadcasts when it fits
        test_tok.join(lp, "token", "left")
        .crossJoin(F.broadcast(defaults))
        .groupBy("doc_id", "actual")
        .agg(
            F.sum(F.coalesce(F.col("q_en"), F.col("d_en"))).cast("long").alias("s_en"),
            F.sum(F.coalesce(F.col("q_ot"), F.col("d_ot"))).cast("long").alias("s_ot"),
        )
    )
    pred = scored.crossJoin(F.broadcast(prior)).select(
        "actual",
        F.when(
            F.col("s_en") + F.col("p_en") >= F.col("s_ot") + F.col("p_ot"), "en"
        )
        .otherwise("other")
        .alias("predicted"),
    )
    conf = pred.groupBy("actual", "predicted").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    acc = conf.agg(
        F.round(
            F.sum(
                F.when(F.col("actual") == F.col("predicted"), F.col("n_docs")).otherwise(
                    0
                )
            ).cast("double")
            / F.sum("n_docs"),
            6,
        ).alias("accuracy")
    )
    return conf.crossJoin(F.broadcast(acc)).orderBy("actual", "predicted")


@register(
    "q303_cohens_kappa_agreement",
    oracle=f"""
    WITH labels AS (
        SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS a,
               CASE WHEN CAST(len(list_distinct({_TOKS})) AS DOUBLE)
                         / len({_TOKS}) <= 0.46 THEN 1 ELSE 0 END AS b
        FROM documents
    ),
    conf AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(a * b) AS BIGINT) AS n11,
               CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
               CAST(sum((1 - a) * b) AS BIGINT) AS n01,
               CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
        FROM labels
    )
    SELECT n, n11, n10, n01, n00,
           round(CAST(n11 + n00 AS DOUBLE) / n, 6) AS p_observed,
           round((CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
                  + CAST(n01 + n00 AS DOUBLE) * (n10 + n00))
                 / (CAST(n AS DOUBLE) * n), 6) AS p_expected,
           round((CAST(n11 + n00 AS DOUBLE) / n
                  - (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
                     + CAST(n01 + n00 AS DOUBLE) * (n10 + n00))
                    / (CAST(n AS DOUBLE) * n))
                 / (1.0 - (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
                           + CAST(n01 + n00 AS DOUBLE) * (n10 + n00))
                          / (CAST(n AS DOUBLE) * n)), 6) AS kappa
    FROM conf
    """,
)
def q303_cohens_kappa_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa inter-annotator agreement between two document
    quality labelers — the labeling-pipeline QA gate (RLHF/eval
    labels are only as good as rater agreement; kappa corrects raw
    agreement for the agreement two biased raters get by CHANCE).
    Rater A: length heuristic (n_chars >= 300). Rater B: lexical
    redundancy (type-token ratio <= 0.46 — long docs in a closed
    vocabulary repeat tokens, so the raters correlate without
    coinciding). kappa = (p_o − p_e)/(1 − p_e) from the exact 2x2
    integer confusion; <0.2 slight ... >0.8 near-perfect (Landis &
    Koch). q229's operating-point sweep evaluates ONE labeler against
    truth; this evaluates two labelers against each other when no
    truth exists — the usual corpus situation.

    Scale: two map-side boolean labels, ONE combining agg to a single
    2x2 cell row, closed-form arithmetic after. The per-doc TTR is
    array math in whole-stage codegen — no explode, no shuffle at
    all (the plan is scan → project → agg).
    """
    d = load(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    labels = d.select(
        F.when(F.col("n_chars") >= 300, 1).otherwise(0).alias("a"),
        F.when(
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks) <= 0.46, 1
        )
        .otherwise(0)
        .alias("b"),
    )
    from g_etl_spark.operators.stats import cohens_kappa

    return cohens_kappa(labels, "a", "b")


_CTX_SIZES = (64, 128, 256, 512)


@register(
    "q326_padding_waste_table",
    oracle=f"""
    WITH lens AS (
        SELECT CAST(len({_TOKS}) AS BIGINT) AS n_tok FROM documents
    ),
    ctx AS (SELECT CAST(unnest([{", ".join(str(c) for c in _CTX_SIZES)}])
                        AS BIGINT) AS ctx)
    SELECT ctx.ctx,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           CAST(sum(CAST(ceil(CAST(n_tok AS DOUBLE) / ctx.ctx) AS BIGINT))
                AS BIGINT) AS n_sequences,
           CAST(sum(CAST(ceil(CAST(n_tok AS DOUBLE) / ctx.ctx) AS BIGINT)
                    * ctx.ctx - n_tok) AS BIGINT) AS pad_tokens,
           round(CAST(sum(CAST(ceil(CAST(n_tok AS DOUBLE) / ctx.ctx) AS BIGINT)
                          * ctx.ctx - n_tok) AS DOUBLE)
                 / sum(CAST(ceil(CAST(n_tok AS DOUBLE) / ctx.ctx) AS BIGINT)
                       * ctx.ctx), 6) AS waste_ratio
    FROM lens CROSS JOIN ctx
    GROUP BY ctx.ctx
    ORDER BY ctx.ctx
    """,
)
def q326_padding_waste_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window padding-waste table — the capacity planning
    BEFORE q129's sequence packing: if each document is padded up to
    a multiple of the context size (the naive no-packing loader),
    how many sequences and what fraction of compute is padding, for
    context sizes 64-512? waste_ratio here is the packing
    opportunity: q129's greedy packer recovers ~all of it, and this
    table says which context size makes packing worth the shuffle.
    Everything is integer token counts (ceil on an exact ratio), so
    both engines agree bit-for-bit.

    Scale: ONE map-side token count per doc (no explode — array
    length only) crossed with a broadcast 4-row context set, one
    combining agg. The whole table is a free rider on any tokenizing
    scan at 100 TB.
    """
    d = load(spark, sf_dir, "documents")
    lens = d.select(F.size(T.tokens(F.col("text"))).cast("long").alias("n_tok"))
    ctx = d.sparkSession.createDataFrame(
        [(c,) for c in _CTX_SIZES], "ctx long"
    )
    nseq = F.ceil(F.col("n_tok").cast("double") / F.col("ctx")).cast("long")
    return (
        lens.crossJoin(F.broadcast(ctx))
        .groupBy("ctx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.sum(nseq).cast("long").alias("n_sequences"),
            F.sum(nseq * F.col("ctx") - F.col("n_tok")).cast("long").alias(
                "pad_tokens"
            ),
            F.round(
                F.sum(nseq * F.col("ctx") - F.col("n_tok")).cast("double")
                / F.sum(nseq * F.col("ctx")),
                6,
            ).alias("waste_ratio"),
        )
        .orderBy("ctx")
    )


@register(
    "q327_jsd_source_matrix",
    oracle=f"""
    WITH tok AS (
        SELECT source, unnest({_TOKS}) AS token FROM documents
    ),
    dist AS (
        SELECT source, token, CAST(count(*) AS BIGINT) AS c,
               CAST(sum(count(*)) OVER (PARTITION BY source) AS BIGINT) AS n
        FROM tok GROUP BY source, token
    ),
    totals AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
               FROM dist GROUP BY source),
    shared AS (
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(sum(CAST(round(1000000000 * (
                   0.5 * (CAST(a.c AS DOUBLE) / a.n)
                       * ln((CAST(a.c AS DOUBLE) / a.n)
                            / ((CAST(a.c AS DOUBLE) / a.n
                                + CAST(b.c AS DOUBLE) / b.n) / 2))
                 + 0.5 * (CAST(b.c AS DOUBLE) / b.n)
                       * ln((CAST(b.c AS DOUBLE) / b.n)
                            / ((CAST(a.c AS DOUBLE) / a.n
                                + CAST(b.c AS DOUBLE) / b.n) / 2))
               )) AS BIGINT)) AS BIGINT) AS tq_shared,
               CAST(sum(a.c) AS BIGINT) AS sca,
               CAST(sum(b.c) AS BIGINT) AS scb
        FROM dist a JOIN dist b
          ON a.token = b.token AND a.source < b.source
        GROUP BY a.source, b.source
    ),
    skel AS (
        SELECT ta.source AS source_a, tb.source AS source_b,
               ta.n AS na, tb.n AS nb
        FROM totals ta JOIN totals tb ON ta.source < tb.source
    ),
    terms AS (
        SELECT sk.source_a, sk.source_b,
               coalesce(sh.tq_shared, 0)
             + CAST(round(1000000000 * 0.5 * ln(2) * (
                   CAST(sk.na - coalesce(sh.sca, 0) AS DOUBLE) / sk.na
                 + CAST(sk.nb - coalesce(sh.scb, 0) AS DOUBLE) / sk.nb
               )) AS BIGINT) AS tq
        FROM skel sk
        LEFT JOIN shared sh
          ON sk.source_a = sh.source_a AND sk.source_b = sh.source_b
    )
    SELECT source_a, source_b,
           round(CAST(tq AS DOUBLE) / 1000000000, 6) AS jsd_nats,
           round(sqrt(greatest(CAST(tq AS DOUBLE) / 1000000000, 0.0)
                      / ln(2)), 6) AS jsd_distance
    FROM terms
    ORDER BY source_a, source_b
    """,
)
def q327_jsd_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between the sources'
    unigram distributions — the SYMMETRIC, always-finite corpus-
    similarity matrix (q122's KL explodes on any token one source
    lacks; JSD's mixture midpoint never does), whose square root
    (base 2) is a metric in [0, 1] — the distance that drives corpus
    mixing and source clustering decisions (q228/q233 consume such
    distances). Per-token JSD terms are quantized to integer
    nano-nats before the per-pair sum (the q319 discipline), so the
    matrix is engine-exact.

    One-sided tokens (present in only one source of a pair) each
    contribute exactly 0.5·p·ln2; rather than materializing anti-join
    legs per token, their TOTAL per pair is computed integer-exactly
    from the shared-token count sums: Σ_onesided pa = (n_a − Σ_shared
    c_a)/n_a, so fully-disjoint source pairs land at JSD = ln 2 and
    partially-overlapping vocabularies get the full mixture term —
    with no engine-order-dependent double sum anywhere (the shared
    per-token terms are nano-nat-quantized; the one-sided mass is one
    double expression over exact BIGINT counts).

    Scale: one explode + combining count to |source × vocab| cells;
    shared terms come from a token equi-join over that rollup
    (Σ per-token source-pair fan, bounded by |sources|²·|vocab|); the
    pair skeleton is |sources|² rows. Never corpus × corpus.
    """
    d = load(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(T.tokens(F.col("text"))).alias("token"))
    counts = tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    totals = counts.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    dist = counts.join(F.broadcast(totals), "source")
    a = dist.select(
        F.col("source").alias("source_a"),
        "token",
        F.col("c").alias("ca"),
        (F.col("c").cast("double") / F.col("n")).alias("pa"),
    )
    b = dist.select(
        F.col("source").alias("source_b"),
        F.col("token").alias("token_b"),
        F.col("c").alias("cb"),
        (F.col("c").cast("double") / F.col("n")).alias("pb"),
    )
    m = (F.col("pa") + F.col("pb")) / 2
    term = 0.5 * F.col("pa") * F.log(F.col("pa") / m) + 0.5 * F.col(
        "pb"
    ) * F.log(F.col("pb") / m)
    shared = (
        a.join(
            b,
            (F.col("token") == F.col("token_b"))
            & (F.col("source_a") < F.col("source_b")),
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.sum(F.round(term * 1e9, 0).cast("long")).alias("tq_shared"),
            F.sum("ca").cast("long").alias("sca"),
            F.sum("cb").cast("long").alias("scb"),
        )
    )
    ta = totals.select(F.col("source").alias("source_a"), F.col("n").alias("na"))
    tb = totals.select(F.col("source").alias("source_b"), F.col("n").alias("nb"))
    skel = ta.join(tb, F.col("source_a") < F.col("source_b"))
    ln2 = 0.6931471805599453
    one_sided = F.round(
        F.lit(1e9)
        * 0.5
        * F.lit(ln2)
        * (
            (F.col("na") - F.coalesce("sca", F.lit(0))).cast("double")
            / F.col("na")
            + (F.col("nb") - F.coalesce("scb", F.lit(0))).cast("double")
            / F.col("nb")
        ),
        0,
    ).cast("long")
    tq = F.coalesce("tq_shared", F.lit(0)) + one_sided
    jsd = tq.cast("double") / 1e9
    return (
        skel.join(shared, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            F.round(jsd, 6).alias("jsd_nats"),
            F.round(
                F.sqrt(F.greatest(jsd, F.lit(0.0)) / F.lit(ln2)), 6
            ).alias("jsd_distance"),
        )
        .orderBy("source_a", "source_b")
    )


@register(
    "q330_bigram_lm_perplexity",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, source, {_TOKS} AS toks FROM documents
        WHERE len({_TOKS}) >= 2
    ),
    bigrams AS (
        SELECT doc_id, source, toks[i] AS prev, toks[i + 1] AS cur
        FROM (SELECT doc_id, source, toks,
                     unnest(range(1, len(toks))) AS i
              FROM docs)
    ),
    bg AS (
        SELECT prev, cur, CAST(count(*) AS BIGINT) AS c_ab
        FROM bigrams GROUP BY prev, cur
    ),
    ctx AS (
        SELECT prev, CAST(sum(c_ab) AS BIGINT) AS c_a FROM bg GROUP BY prev
    ),
    vocab AS (
        SELECT CAST(count(DISTINCT t) AS BIGINT) AS v
        FROM (SELECT unnest(toks) AS t FROM docs)
    ),
    model AS (
        SELECT bg.prev, bg.cur,
               CAST(round(ln(CAST(bg.c_ab + 1 AS DOUBLE)
                             / CAST(ctx.c_a + vocab.v AS DOUBLE)) * 1000000)
                    AS BIGINT) AS q_lp
        FROM bg JOIN ctx ON bg.prev = ctx.prev CROSS JOIN vocab
    ),
    per_doc AS (
        SELECT b.doc_id, b.source,
               CAST(round(CAST(-sum(m.q_lp) AS DOUBLE) / count(*)) AS BIGINT)
                   AS xent_micro
        FROM bigrams b
        JOIN model m ON b.prev = m.prev AND b.cur = m.cur
        GROUP BY b.doc_id, b.source
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(sum(xent_micro) AS DOUBLE) / count(*) / 1000000, 6)
               AS avg_xent_nats,
           round(CAST(min(xent_micro) AS DOUBLE) / 1000000, 6) AS min_xent_nats,
           round(CAST(max(xent_micro) AS DOUBLE) / 1000000, 6) AS max_xent_nats,
           round(exp(CAST(sum(xent_micro) AS DOUBLE) / count(*) / 1000000), 4)
               AS avg_perplexity
    FROM per_doc
    GROUP BY source
    ORDER BY source
    """,
)
def q330_bigram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model perplexity per source — the CCNet-style
    quality signal (CCNet filters Common Crawl by KenLM perplexity;
    the relational bigram LM is the same idea an engine can train in
    one pass): add-one-smoothed conditional probabilities
    p(b|a) = (c(ab)+1)/(c(a)+V) learned from the corpus itself, each
    document scored by its mean token cross-entropy, rolled up to
    per-source distribution stats and average perplexity. A source
    whose documents surprise the corpus LM (high perplexity) is
    boilerplate-free but possibly noisy; an unusually LOW-perplexity
    source is templated/repetitive — both tails are what a pretraining
    curator inspects (q41's heuristics and q58/q59's filters gate
    rows; this gives the distributional lens).

    Engine-exactness: per-bigram log-probs are quantized to integer
    micro-nats BEFORE the per-doc sum, and the per-doc mean is rounded
    back to integer micro-nats before the per-source rollup (the q300
    discipline, one level deeper) — no engine-order-dependent double
    sum anywhere. In-vocabulary scoring only (the model is trained on
    the same corpus it scores, so every bigram is known — the
    held-out OOV path is q300's coalesce recipe).

    Scale: bigrams are a map-side transform over the token arrays (no
    per-token shuffle until the combining count); the model is a
    |bigram-vocab| relation equi-joined back (broadcast here, plain
    hash join at 100 TB); two combining aggs end the plan. The LM
    never lives on the driver.
    """
    d = load(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    docs = d.select("doc_id", "source", toks.alias("toks")).filter(
        F.size("toks") >= 2
    )
    bigrams = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(element_at(toks, i) AS prev,"
                " element_at(toks, i + 1) AS cur))"
            )
        ).alias("b"),
    ).select("doc_id", "source", "b.prev", "b.cur")
    bg = bigrams.groupBy("prev", "cur").agg(
        F.count(F.lit(1)).cast("long").alias("c_ab")
    )
    ctx = bg.groupBy("prev").agg(F.sum("c_ab").cast("long").alias("c_a"))
    vocab = docs.select(F.explode("toks").alias("t")).agg(
        F.countDistinct("t").cast("long").alias("v")
    )
    model = (
        bg.join(ctx, "prev")
        .crossJoin(F.broadcast(vocab))
        .select(
            "prev",
            "cur",
            F.round(
                F.log(
                    (F.col("c_ab") + 1).cast("double")
                    / (F.col("c_a") + F.col("v")).cast("double")
                )
                * 1e6,
                0,
            )
            .cast("long")
            .alias("q_lp"),
        )
    )
    per_doc = (
        # unhinted model attach: the bigram table is vocab²-grain —
        # AQE broadcasts when it fits
        bigrams.join(model, ["prev", "cur"])
        .groupBy("doc_id", "source")
        .agg(
            F.round((-F.sum("q_lp")).cast("double") / F.count(F.lit(1)), 0)
            .cast("long")
            .alias("xent_micro")
        )
    )
    avg_micro = F.sum("xent_micro").cast("double") / F.count(F.lit(1))
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(avg_micro / 1e6, 6).alias("avg_xent_nats"),
            F.round(F.min("xent_micro").cast("double") / 1e6, 6).alias("min_xent_nats"),
            F.round(F.max("xent_micro").cast("double") / 1e6, 6).alias("max_xent_nats"),
            F.round(F.exp(avg_micro / 1e6), 4).alias("avg_perplexity"),
        )
        .orderBy("source")
    )


@register(
    "q331_langid_eval_metrics",
    oracle=f"""
    WITH scored AS (
        SELECT lang AS labeled_lang,
               {_SCORE['en']} AS s_en, {_SCORE['de']} AS s_de,
               {_SCORE['fr']} AS s_fr, {_SCORE['es']} AS s_es,
               {_SCORE['zh']} AS s_zh
        FROM documents
    ),
    detected AS (
        SELECT labeled_lang,
               CASE WHEN greatest(s_en, s_de, s_fr, s_es, s_zh) = 0 THEN 'und'
                    WHEN s_zh = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'zh'
                    WHEN s_fr = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'fr'
                    WHEN s_es = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'es'
                    WHEN s_en = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'en'
                    ELSE 'de' END AS detected_lang
        FROM scored
    ),
    conf AS (
        SELECT labeled_lang, detected_lang, CAST(count(*) AS BIGINT) AS n
        FROM detected GROUP BY 1, 2
    ),
    langs AS (
        SELECT labeled_lang AS lang FROM conf
        UNION
        SELECT detected_lang FROM conf
    ),
    m AS (
        SELECT l.lang,
               CAST(coalesce(sum(CASE WHEN c.labeled_lang = l.lang
                                       AND c.detected_lang = l.lang
                                      THEN c.n END), 0) AS BIGINT) AS tp,
               CAST(coalesce(sum(CASE WHEN c.detected_lang = l.lang
                                       AND c.labeled_lang <> l.lang
                                      THEN c.n END), 0) AS BIGINT) AS fp,
               CAST(coalesce(sum(CASE WHEN c.labeled_lang = l.lang
                                       AND c.detected_lang <> l.lang
                                      THEN c.n END), 0) AS BIGINT) AS fn
        FROM langs l LEFT JOIN conf c
          ON c.labeled_lang = l.lang OR c.detected_lang = l.lang
        GROUP BY l.lang
    )
    SELECT lang, tp + fn AS support, tp, fp, fn,
           round(CAST(tp AS DOUBLE) / greatest(tp + fp, 1), 4) AS precision_,
           round(CAST(tp AS DOUBLE) / greatest(tp + fn, 1), 4) AS recall_,
           round(2.0 * tp / greatest(2 * tp + fp + fn, 1), 4) AS f1
    FROM m
    ORDER BY lang
    """,
)
def q331_langid_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language precision/recall/F1 of the heuristic language
    detector against the declared labels — the one-vs-rest EVAL
    summary q43's raw confusion matrix leaves to the reader (and the
    multi-class sibling of q229's binary operating points): per
    language, support, the exact tp/fp/fn integers, and the derived
    metrics. This is the gate a corpus curator reads before trusting
    the detector to route documents (q300's learned NB and this
    heuristic are alternatives; each needs the same report card).
    F1 uses the integer identity 2tp/(2tp+fp+fn), so every metric is
    one rounded division over exact counts. The metric columns carry
    a trailing underscore (precision_/recall_) because PRECISION is a
    reserved word in DuckDB.

    Scale: the confusion rollup is one map-side combining agg to
    |langs|² cells; the per-language marginals are arithmetic on that
    bounded relation (the q303 2x2, generalized to k classes).
    """
    d = T.with_tokens(load(spark, sf_dir, "documents"))
    detected = d.select(
        F.col("lang").alias("labeled_lang"),
        T.staged_detect_language().alias("detected_lang"),
    )
    conf = detected.groupBy("labeled_lang", "detected_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    langs = (
        conf.select(F.col("labeled_lang").alias("lang"))
        .union(conf.select("detected_lang"))
        .distinct()
    )
    joined = langs.join(
        conf,
        (conf["labeled_lang"] == langs["lang"]) | (conf["detected_lang"] == langs["lang"]),
        "left",
    )
    m = joined.groupBy("lang").agg(
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("labeled_lang") == F.col("lang"))
                    & (F.col("detected_lang") == F.col("lang")),
                    F.col("n"),
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("tp"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("detected_lang") == F.col("lang"))
                    & (F.col("labeled_lang") != F.col("lang")),
                    F.col("n"),
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("fp"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("labeled_lang") == F.col("lang"))
                    & (F.col("detected_lang") != F.col("lang")),
                    F.col("n"),
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("fn"),
    )
    return m.select(
        "lang",
        (F.col("tp") + F.col("fn")).alias("support"),
        "tp",
        "fp",
        "fn",
        F.round(
            F.col("tp").cast("double") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1)),
            4,
        ).alias("precision_"),
        F.round(
            F.col("tp").cast("double") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1)),
            4,
        ).alias("recall_"),
        F.round(
            2.0
            * F.col("tp")
            / F.greatest(2 * F.col("tp") + F.col("fp") + F.col("fn"), F.lit(1)),
            4,
        ).alias("f1"),
    ).orderBy("lang")


_QL_MU = 2000.0


@register(
    "q332_dirichlet_ql_retrieval",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, {_TOKS} AS t, CAST(len({_TOKS}) AS DOUBLE) AS dl
        FROM documents
    ),
    tf AS (
        SELECT doc_id, dl, token, CAST(count(*) AS DOUBLE) AS tf
        FROM (SELECT doc_id, dl, unnest(t) AS token FROM base)
        GROUP BY doc_id, dl, token
    ),
    coll AS (SELECT CAST(sum(dl) AS DOUBLE) AS c_tokens FROM base),
    cft AS (
        SELECT token, CAST(sum(tf) AS DOUBLE) AS cf,
               CAST(count(*) AS DOUBLE) AS df
        FROM tf GROUP BY token
    ),
    qsel AS (
        SELECT doc_id AS qid, token AS qterm
        FROM (
            SELECT tf.doc_id, tf.token,
                   row_number() OVER (PARTITION BY tf.doc_id
                                      ORDER BY cft.df, tf.token) AS rn
            FROM tf JOIN cft USING (token) WHERE tf.doc_id % 41 = 0
        ) WHERE rn = 1
    ),
    cand AS (
        SELECT q.qid, c.doc_id,
               ln((c.tf + {_QL_MU} * cft.cf / coll.c_tokens)
                  / (c.dl + {_QL_MU})) AS s
        FROM qsel q
        JOIN tf c ON c.token = q.qterm
        JOIN cft ON cft.token = q.qterm
        CROSS JOIN coll
    ),
    ranks AS (
        SELECT o.qid,
               1 + CAST(sum(CASE WHEN c.s > o.s
                                 OR (c.s = o.s AND c.doc_id < o.qid)
                            THEN 1 ELSE 0 END) AS BIGINT) AS rnk
        FROM (SELECT qid, s FROM cand WHERE doc_id = qid) o
        JOIN cand c ON c.qid = o.qid
        GROUP BY o.qid
    )
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           round(avg(1.0 / rnk), 6) AS mrr,
           round(avg(CASE WHEN rnk = 1 THEN 1.0 ELSE 0.0 END), 6)
               AS recall_at_1,
           round(avg(CASE WHEN rnk <= 10 THEN 1.0 ELSE 0.0 END), 6)
               AS recall_at_10,
           round(avg(CAST(rnk AS DOUBLE)), 4) AS mean_rank
    FROM ranks
    """,
)
def q332_dirichlet_ql_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet-smoothed query-likelihood retrieval under the q263
    self-retrieval harness — the LANGUAGE-MODEL ranking family next
    to BM25 (Zhai & Lafferty's QL with Dirichlet prior is the other
    canonical lexical scorer; an engine that can only rank one way
    can't A/B its search surface): score(q,d) = ln((tf(q,d) +
    μ·p(q|C)) / (|d| + μ)) with μ=2000 and the collection model
    p(q|C) = cf(q)/|C|. Every 41st document issues its rarest term
    as the query; MRR / recall@1 / recall@10 / mean rank of the
    source doc among the docs CONTAINING the term (the inverted-index
    candidate set — non-matching docs are not scored, the standard
    postings-list shortcut). Comparing this table to q263's BM25 row
    is the ranker A/B a retrieval stack runs before switching
    scorers.

    Scale: identical shape to q263 — one explode, two combining aggs
    (tf, collection stats), a per-query candidate join bounded by
    df(rarest term). No corpus × corpus stage.
    """
    d = load(spark, sf_dir, "documents")
    base = d.select("doc_id", T.tokens(F.col("text")).alias("t")).withColumn(
        "dl", F.size("t").cast("double")
    )
    tf = (
        base.select("doc_id", "dl", F.explode("t").alias("token"))
        .groupBy("doc_id", "dl", "token")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    coll = base.agg(F.sum("dl").cast("double").alias("c_tokens"))
    cft = tf.groupBy("token").agg(
        F.sum("tf").cast("double").alias("cf"),
        F.count(F.lit(1)).cast("double").alias("df"),
    )
    wq = Window.partitionBy("doc_id").orderBy("df", "token")
    qsel = (
        tf.join(cft, "token")
        .where(F.col("doc_id") % 41 == 0)
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") == 1)
        .select(F.col("doc_id").alias("qid"), F.col("token").alias("qterm"))
    )
    qterm_stats = qsel.join(
        cft.select(F.col("token").alias("qterm"), "cf"), "qterm"
    )
    cand = (
        qterm_stats.join(tf, tf["token"] == qterm_stats["qterm"])
        .crossJoin(F.broadcast(coll))
        .select(
            "qid",
            "doc_id",
            F.log(
                (F.col("tf") + _QL_MU * F.col("cf") / F.col("c_tokens"))
                / (F.col("dl") + _QL_MU)
            ).alias("s"),
        )
    )
    own = cand.where(F.col("doc_id") == F.col("qid")).select(
        "qid", F.col("s").alias("qs")
    )
    ranks = (
        cand.join(own, "qid")
        .groupBy("qid")
        .agg(
            (
                1
                + F.sum(
                    F.when(
                        (F.col("s") > F.col("qs"))
                        | ((F.col("s") == F.col("qs")) & (F.col("doc_id") < F.col("qid"))),
                        1,
                    ).otherwise(0)
                )
            ).alias("rnk")
        )
    )
    return ranks.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.round(F.avg(1.0 / F.col("rnk")), 6).alias("mrr"),
        F.round(F.avg(F.when(F.col("rnk") == 1, 1.0).otherwise(0.0)), 6).alias(
            "recall_at_1"
        ),
        F.round(F.avg(F.when(F.col("rnk") <= 10, 1.0).otherwise(0.0)), 6).alias(
            "recall_at_10"
        ),
        F.round(F.avg(F.col("rnk").cast("double")), 4).alias("mean_rank"),
    )


@register(
    "q354_kneser_ney_perplexity",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, source, {_TOKS} AS toks
        FROM documents WHERE len({_TOKS}) >= 2
    ),
    bigrams AS (
        SELECT doc_id, source, toks[i] AS prev, toks[i + 1] AS cur
        FROM (SELECT doc_id, source, toks,
                     unnest(range(1, len(toks))) AS i
              FROM docs)
    ),
    bg AS (
        SELECT prev, cur, CAST(count(*) AS BIGINT) AS c_ab
        FROM bigrams GROUP BY prev, cur
    ),
    ctx AS (
        SELECT prev, CAST(sum(c_ab) AS BIGINT) AS c_a,
               CAST(count(*) AS BIGINT) AS n1f
        FROM bg GROUP BY prev
    ),
    cont AS (
        SELECT cur, CAST(count(*) AS BIGINT) AS n1b FROM bg GROUP BY cur
    ),
    types AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM bg),
    model AS (
        SELECT bg.prev, bg.cur,
               CAST(round(ln(
                   (bg.c_ab - 0.75) / ctx.c_a
                   + 0.75 * ctx.n1f / ctx.c_a
                     * (CAST(cont.n1b AS DOUBLE) / types.nt)
               ) * 1000000) AS BIGINT) AS q_lp
        FROM bg
        JOIN ctx ON bg.prev = ctx.prev
        JOIN cont ON bg.cur = cont.cur
        CROSS JOIN types
    ),
    per_doc AS (
        SELECT b.doc_id, b.source,
               CAST(round(CAST(-sum(m.q_lp) AS DOUBLE) / count(*)) AS BIGINT)
                   AS xent_micro
        FROM bigrams b
        JOIN model m ON b.prev = m.prev AND b.cur = m.cur
        GROUP BY b.doc_id, b.source
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(sum(xent_micro) AS DOUBLE) / count(*) / 1000000, 6)
               AS avg_xent_kn_nats,
           round(exp(CAST(sum(xent_micro) AS DOUBLE) / count(*) / 1000000), 4)
               AS avg_perplexity_kn
    FROM per_doc
    GROUP BY source
    ORDER BY source
    """,
)
def q354_kneser_ney_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney smoothed bigram perplexity per source — the
    production LM smoothing beside q330's add-one baseline (KenLM,
    the CCNet filter's actual engine, is interpolated Kneser-Ney):
    P(w|v) = max(c(vw)−D, 0)/c(v) + D·N1+(v·)/c(v) · Pcont(w) with
    discount D = 0.75 and the CONTINUATION probability
    Pcont(w) = N1+(·w)/N1+(··) — "how many contexts does w follow"
    rather than "how often does w occur", which is what stops
    high-frequency-but-single-context tokens from soaking up mass.
    All KN statistics are bigram-TYPE counts (exact integers: N1+
    forward per context, N1+ backward per word, total types); scoring
    is in-vocabulary (trained on the scored corpus, c(vw) ≥ 1 so the
    discounted term stays positive) with per-bigram log-probs
    quantized to integer micro-nats before any sum (the q330
    discipline).

    Scale: identical plan shape to q330 — map-side bigram transform,
    three combining TYPE rollups (bigram/context/continuation), one
    vocab²-grain model equi-join back (unhinted; AQE broadcasts when
    it fits), two combining aggs. The continuation table adds one
    |vocab| rollup, nothing corpus-grain beyond the scan.
    """
    d = load(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    docs = d.select("doc_id", "source", toks.alias("toks")).filter(
        F.size("toks") >= 2
    )
    bigrams = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(element_at(toks, i) AS prev,"
                " element_at(toks, i + 1) AS cur))"
            )
        ).alias("b"),
    ).select("doc_id", "source", "b.prev", "b.cur")
    bg = bigrams.groupBy("prev", "cur").agg(
        F.count(F.lit(1)).cast("long").alias("c_ab")
    )
    ctx = bg.groupBy("prev").agg(
        F.sum("c_ab").cast("long").alias("c_a"),
        F.count(F.lit(1)).cast("long").alias("n1f"),
    )
    cont = bg.groupBy("cur").agg(F.count(F.lit(1)).cast("long").alias("n1b"))
    types = bg.agg(F.count(F.lit(1)).cast("long").alias("nt"))
    p_kn = (
        (F.col("c_ab") - 0.75) / F.col("c_a")
        + 0.75 * F.col("n1f") / F.col("c_a")
        * (F.col("n1b").cast("double") / F.col("nt"))
    )
    model = (
        bg.join(ctx, "prev")  # vocab-grain rollups: unhinted, AQE decides
        .join(cont, "cur")
        .crossJoin(F.broadcast(types))
        .select(
            "prev",
            "cur",
            F.round(F.log(p_kn) * 1e6, 0).cast("long").alias("q_lp"),
        )
    )
    per_doc = (
        bigrams.join(model, ["prev", "cur"])  # vocab²-grain: unhinted
        .groupBy("doc_id", "source")
        .agg(
            F.round((-F.sum("q_lp")).cast("double") / F.count(F.lit(1)), 0)
            .cast("long")
            .alias("xent_micro")
        )
    )
    avg_micro = F.sum("xent_micro").cast("double") / F.count(F.lit(1))
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(avg_micro / 1e6, 6).alias("avg_xent_kn_nats"),
            F.round(F.exp(avg_micro / 1e6), 4).alias("avg_perplexity_kn"),
        )
        .orderBy("source")
    )


@register(
    "q363_source_loo_valuation",
    oracle=f"""
    WITH ttr AS (
        SELECT source,
               CAST(round(1e6 * len(list_distinct({_TOKS}))
                          / greatest(len({_TOKS}), 1)) AS BIGINT) AS ttr_micro
        FROM documents
    ),
    per_src AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_h,
               CAST(sum(ttr_micro) AS BIGINT) AS s_h
        FROM ttr GROUP BY source
    ),
    tot AS (
        SELECT CAST(sum(n_h) AS BIGINT) AS n, CAST(sum(s_h) AS BIGINT) AS s
        FROM per_src
    )
    SELECT p.source, p.n_h AS n_docs,
           round(CAST(p.s_h AS DOUBLE) / p.n_h / 1e6, 6) AS mean_ttr,
           round(CAST(t.s AS DOUBLE) / t.n / 1e6, 6) AS corpus_mean_ttr,
           round(CAST(t.s - p.s_h AS DOUBLE) / (t.n - p.n_h) / 1e6, 6)
               AS loo_corpus_mean,
           round(CAST(t.s - p.s_h AS DOUBLE) / (t.n - p.n_h) / 1e6
                 - CAST(t.s AS DOUBLE) / t.n / 1e6, 6) AS removal_delta
    FROM per_src p CROSS JOIN tot t
    ORDER BY removal_delta DESC, source
    """,
)
def q363_source_loo_valuation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out DATA VALUATION: for every source, what
    happens to the corpus-mean quality proxy (type-token ratio —
    repetitive/templated text scores low) if that source is removed
    — computed in closed form from SUBTRACTABLE moments
    ((S − S_h)/(N − N_h), the q288/q302 device at source grain), so
    valuing all sources costs ONE corpus pass, not |sources| reruns.
    A POSITIVE removal_delta means dropping the source raises
    corpus-mean quality — the candidate for down-weighting in
    q228/q355's mixture plans; this is the marginal-contribution
    table those allocators should consume (the 1-permutation
    truncation of data Shapley, exact for the mean metric).

    Per-doc TTR is micro-quantized to integers before every sum, so
    both engines derive each LOO mean from identical integers.

    Scale: one map-side TTR projection + one combining agg to
    |sources| cells; the LOO arithmetic is |sources| rows of integer
    subtraction. Nothing re-scans per source.
    """
    d = load(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    ttr = d.select(
        "source",
        F.round(
            1e6
            * F.size(F.array_distinct(toks))
            / F.greatest(F.size(toks), F.lit(1)),
            0,
        )
        .cast("long")
        .alias("ttr_micro"),
    )
    per_src = ttr.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_h"),
        F.sum("ttr_micro").cast("long").alias("s_h"),
    )
    tot = per_src.agg(
        F.sum("n_h").cast("long").alias("n"), F.sum("s_h").cast("long").alias("s")
    )
    full_mean = F.col("s").cast("double") / F.col("n") / 1e6
    loo_mean = (
        (F.col("s") - F.col("s_h")).cast("double")
        / (F.col("n") - F.col("n_h"))
        / 1e6
    )
    return (
        per_src.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("n_h").alias("n_docs"),
            F.round(F.col("s_h").cast("double") / F.col("n_h") / 1e6, 6).alias(
                "mean_ttr"
            ),
            F.round(full_mean, 6).alias("corpus_mean_ttr"),
            F.round(loo_mean, 6).alias("loo_corpus_mean"),
            F.round(loo_mean - full_mean, 6).alias("removal_delta"),
        )
        .orderBy(F.desc("removal_delta"), "source")
    )


_DSIR_BUCKETS = 256


def _q372_oracle() -> str:
    """q372 oracle: the same hashed-unigram importance weights —
    md5-bucketed tokens, add-one-smoothed target (lang='en') and
    overall models, per-bucket log-ratios rounded to micro-nats
    BEFORE the per-doc tf-weighted integer sum (q330's quantization
    discipline, so engine-order and libm ulps cannot differ)."""
    b = _DSIR_BUCKETS
    return f"""
    WITH toks AS (
        SELECT doc_id, lang, source,
               CAST(CAST('0x' || substr(md5(tok), 1, 8) AS UBIGINT)
                    AS BIGINT) % {b} AS bkt
        FROM (SELECT doc_id, lang, source,
                     unnest(list_filter({_TOKS}, t -> length(t) > 0)) AS tok
              FROM documents)
    ),
    doc_tf AS (
        SELECT doc_id, lang, source, bkt, count(*) AS tf
        FROM toks GROUP BY doc_id, lang, source, bkt
    ),
    all_model AS (SELECT bkt, count(*) AS c_a FROM toks GROUP BY bkt),
    t_model AS (
        SELECT bkt, count(*) AS c_t FROM toks WHERE lang = 'en' GROUP BY bkt
    ),
    totals AS (
        SELECT CAST(count(*) AS BIGINT) AS n_a,
               CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_t
        FROM toks
    ),
    model AS (
        SELECT a.bkt,
               CAST(round(ln((coalesce(t.c_t, 0) + 1.0) / (tt.n_t + {b}))
                          * 1e6) AS BIGINT) AS lt_micro,
               CAST(round(ln((a.c_a + 1.0) / (tt.n_a + {b}))
                          * 1e6) AS BIGINT) AS la_micro
        FROM all_model a
        LEFT JOIN t_model t USING (bkt)
        CROSS JOIN totals tt
    )
    SELECT d.doc_id, any_value(d.lang) AS lang, any_value(d.source) AS source,
           CAST(sum(d.tf) AS BIGINT) AS n_toks,
           CAST(sum(d.tf * (m.lt_micro - m.la_micro)) AS BIGINT)
               AS logw_micro,
           CAST(sum(d.tf * (m.lt_micro - m.la_micro)) AS BIGINT) > 0 AS keep
    FROM doc_tf d JOIN model m USING (bkt)
    GROUP BY d.doc_id
    ORDER BY d.doc_id
    """


@register("q372_dsir_importance_weights", oracle=_q372_oracle())
def q372_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection with importance resampling (Xie et
    al.): score every document by how much more likely its tokens are
    under a TARGET distribution (here the lang='en' slice — in
    production, a high-quality seed corpus) than under the overall
    raw distribution, using HASHED unigram models — the device that
    makes the estimator corpus-size-independent: tokens hash into
    {_DSIR_BUCKETS} md5 buckets, both models are bucket-count vectors
    with add-one smoothing, and the per-doc log importance weight is
    Σ_b tf(b)·(ln p_target(b) − ln p_raw(b)). Log-ratios are rounded
    to integer MICRO-NATS per bucket before the tf-weighted sum, so
    the weight is an exact integer in both engines (q330's
    discipline). `keep` is the zero-threshold selection the resampler
    would apply; the weight column feeds q84/q355's samplers for a
    rate-controlled selection.

    Scale: the model is a {_DSIR_BUCKETS}-row relation (CONSTANT-
    bounded — that is DSIR's point: the target model never grows with
    the corpus); the per-doc sum is one equi-join on the hashed
    bucket and a doc-grain agg — map-side combinable, no window, no
    corpus shuffle beyond the tf rollup it shares with every text
    query.
    """
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "source", "text")
    toks = F.split(F.lower(F.trim(F.col("text"))), T.TOKEN_SPLIT)
    tok_rows = (
        d.select("doc_id", "lang", "source", F.explode(toks).alias("tok"))
        .filter(F.length("tok") > 0)
        .select(
            "doc_id",
            "lang",
            "source",
            (
                F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
                % _DSIR_BUCKETS
            ).alias("bkt"),
        )
    )
    doc_tf = tok_rows.groupBy("doc_id", "lang", "source", "bkt").agg(
        F.count(F.lit(1)).alias("tf")
    )
    all_model = tok_rows.groupBy("bkt").agg(F.count(F.lit(1)).alias("c_a"))
    t_model = (
        tok_rows.filter(F.col("lang") == "en")
        .groupBy("bkt")
        .agg(F.count(F.lit(1)).alias("c_t"))
    )
    totals = tok_rows.agg(
        F.count(F.lit(1)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("long")
        .alias("n_t"),
    )
    model = (
        all_model.join(t_model, "bkt", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bkt",
            F.round(
                F.log(
                    (F.coalesce(F.col("c_t"), F.lit(0)) + 1.0)
                    / (F.col("n_t") + _DSIR_BUCKETS)
                )
                * 1e6,
                0,
            )
            .cast("long")
            .alias("lt_micro"),
            F.round(
                F.log((F.col("c_a") + 1.0) / (F.col("n_a") + _DSIR_BUCKETS)) * 1e6,
                0,
            )
            .cast("long")
            .alias("la_micro"),
        )
    )
    logw = F.sum(
        F.col("tf") * (F.col("lt_micro") - F.col("la_micro"))
    ).cast("long")
    return (
        doc_tf.join(model, "bkt")
        .groupBy("doc_id")
        .agg(
            F.any_value(F.col("lang")).alias("lang"),
            F.any_value(F.col("source")).alias("source"),
            F.sum("tf").cast("long").alias("n_toks"),
            logw.alias("logw_micro"),
            (logw > 0).alias("keep"),
        )
        .orderBy("doc_id")
    )


def _bpe_word_table(d: DataFrame) -> DataFrame:
    """(f, repr) word-frequency table with the double-space symbol
    layout q383's docstring derives: '  h  e  l  l  o  ' — each merge
    rewrite consumes one space per side so neighbor spacing survives
    adjacent occurrences."""
    return (
        d.select(
            F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias(
                "word"
            )
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("f"))
        .select(
            "f",
            F.concat(
                F.lit("  "), F.regexp_replace(F.col("word"), "(.)", "$1  ")
            ).alias("repr"),
        )
    )


def _bpe_pair_expr():
    # built lazily: constructing a Column requires an active session,
    # and this module imports during pytest collection without one
    return F.expr(
        "zip_with(slice(s, 1, size(s) - 1), slice(s, 2, size(s) - 1),"
        " (a, b) -> concat(a, ' ', b))"
    )


def _bpe_pair_counts(words: DataFrame) -> DataFrame:
    """Weighted adjacent-symbol pair counts of a (f, repr) table."""
    return (
        words.select("f", F.split(F.trim(F.col("repr")), "  ").alias("s"))
        .select("f", F.explode(_bpe_pair_expr()).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("f").alias("cnt"))
    )


def _bpe_apply_merge(
    df: DataFrame, best: DataFrame, keep: list[str]
) -> DataFrame:
    """Rewrite every repr by merging the 1-row `best` frame's pair
    (broadcast scalar — the pair never leaves the cluster)."""
    return df.crossJoin(F.broadcast(best.select("pair"))).select(
        *keep,
        F.replace(
            F.col("repr"),
            F.concat(
                F.lit(" "),
                F.regexp_replace(F.col("pair"), " ", "  "),
                F.lit(" "),
            ),
            F.concat(
                F.lit(" "),
                F.regexp_replace(F.col("pair"), " ", ""),
                F.lit(" "),
            ),
        ).alias("repr"),
    )


def _q383_oracle(steps: int = 5) -> str:
    ctes = ["""w0 AS (
        SELECT word, CAST(count(*) AS BIGINT) AS f,
               '  ' || regexp_replace(word, '(.)', '\\1  ', 'g') AS repr
        FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z]+'))
                     AS word
              FROM documents)
        WHERE word <> '' GROUP BY word
    )"""]
    for t in range(1, steps + 1):
        ctes.append(f"""p{t} AS (
        SELECT pair, CAST(sum(f) AS BIGINT) AS cnt FROM (
            SELECT f, unnest(list_transform(range(1, len(s)),
                             i -> s[i] || ' ' || s[i + 1])) AS pair
            FROM (SELECT f, string_split(trim(repr), '  ') AS s
                  FROM w{t - 1})
        ) GROUP BY pair
    ),
    b{t} AS (SELECT pair, cnt FROM p{t} ORDER BY cnt DESC, pair LIMIT 1),
    w{t} AS (
        SELECT w.word, w.f,
               replace(w.repr, ' ' || replace(b.pair, ' ', '  ') || ' ',
                       ' ' || replace(b.pair, ' ', '') || ' ') AS repr
        FROM w{t - 1} w, b{t} b
    )""")
    union = " UNION ALL ".join(
        f"SELECT CAST({t} AS BIGINT) AS step, pair AS merged_pair,"
        f" replace(pair, ' ', '') AS new_symbol, cnt AS pair_count"
        f" FROM b{t}"
        for t in range(1, steps + 1)
    )
    return f"WITH {', '.join(ctes)} {union} ORDER BY step"


@register("q383_bpe_merge_trainer", oracle=_q383_oracle())
def q383_bpe_merge_trainer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINER — five greedy merge rounds of
    byte-pair encoding over the document corpus (Sennrich et al.
    2016), the algorithm behind every production subword
    vocabulary. Each round counts weighted adjacent-symbol pairs on
    the word-frequency table, merges the most frequent pair
    (ties → lexicographically smaller), and rewrites every word's
    symbol sequence — q130 counts one round's pairs; this runs the
    actual training loop and emits the learned merge list in order.

    Symbol sequences are flat strings with a TWO-space separator
    and double-space sentinels at both ends, so the merge rewrite
    is a plain (JVM whole-stage) string replace of
    ' a␣␣b ' → ' ab ': each match consumes one space from each
    side, leaving the neighbor spacing intact — adjacent pair
    occurrences ('x a b a b') merge in one pass exactly like the
    reference algorithm's left-to-right non-overlapping scan,
    where a single-space layout would silently skip every second
    occurrence (shared-delimiter bug).

    Scale: the corpus collapses ONCE to the |vocab|-grain
    word-frequency table; each round is a map-side pair explode +
    hash agg over that table, a 1-row argmax (TakeOrderedAndProject)
    broadcast back, and a map-side rewrite — the table is
    localCheckpointed per round so round t never replays rounds
    1..t-1. Driver state: nothing (the best pair never leaves the
    cluster). At 100 TB the vocab table is the only shuffled
    relation, millions of rows, not the corpus.
    """
    d = load(spark, sf_dir, "documents")
    words = _bpe_word_table(d).localCheckpoint()
    outs = []
    for step in (1, 2, 3, 4, 5):
        best = (
            _bpe_pair_counts(words)
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
        )
        outs.append(
            best.select(
                F.lit(step).cast("long").alias("step"),
                F.col("pair").alias("merged_pair"),
                F.regexp_replace(F.col("pair"), " ", "").alias("new_symbol"),
                F.col("cnt").alias("pair_count"),
            )
        )
        words = _bpe_apply_merge(words, best, ["f"]).localCheckpoint()
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("step")


_RM3_ALPHA = 0.5   # feedback interpolation weight
_RM3_FB_DOCS = 10  # pseudo-relevant depth
_RM3_TOP = 15      # expansion terms emitted
_RM3_MINLEN = 3    # drop sub-3-char tokens from the feedback model


@register(
    "q394_rm3_query_expansion",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, len({_TOKS}) AS dl, {_TOKS} AS t FROM documents
    ),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM base),
    tf AS (
        SELECT doc_id, dl, token, count(*) AS tf
        FROM (SELECT doc_id, dl,
                     unnest(list_filter(t, x -> x IN {_BM25_IN})) AS token
              FROM base)
        GROUP BY doc_id, dl, token
    ),
    dft AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
    scored AS (
        SELECT tf.doc_id,
               sum(
                   ln((CAST(stats.n_docs AS DOUBLE) - CAST(dft.df AS DOUBLE) + 0.5)
                      / (CAST(dft.df AS DOUBLE) + 0.5) + 1.0)
                   * CAST(tf.tf AS DOUBLE) * ({_BM25_K1} + 1.0)
                   / (CAST(tf.tf AS DOUBLE)
                      + {_BM25_K1} * (1.0 - {_BM25_B}
                                      + {_BM25_B} * CAST(tf.dl AS DOUBLE)
                                        / CAST(stats.avgdl AS DOUBLE)))
               ) AS bm25
        FROM tf JOIN dft ON tf.token = dft.token CROSS JOIN stats
        GROUP BY tf.doc_id
    ),
    fb AS (
        SELECT doc_id FROM scored
        ORDER BY round(bm25, 4) DESC, doc_id LIMIT {_RM3_FB_DOCS}
    ),
    fbtf AS (
        SELECT b.doc_id, b.dl, token, count(*) AS tf
        FROM (SELECT doc_id, dl, unnest(t) AS token
              FROM base JOIN fb USING (doc_id)) b
        WHERE length(token) >= {_RM3_MINLEN}
        GROUP BY b.doc_id, b.dl, token
    ),
    nfb AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM fb),
    pr AS (
        SELECT token,
               sum(CAST(tf AS DOUBLE) / dl) / (SELECT k FROM nfb) AS p_r,
               CAST(count(*) AS BIGINT) AS fb_df
        FROM fbtf GROUP BY token
    )
    SELECT token,
           round({1 - _RM3_ALPHA} * (CASE WHEN token IN {_BM25_IN}
                                          THEN 1.0 / {len(_BM25_TERMS)}
                                          ELSE 0.0 END)
                 + {_RM3_ALPHA} * p_r, 6) AS rm3_weight,
           token IN {_BM25_IN} AS in_original,
           fb_df
    FROM pr
    ORDER BY rm3_weight DESC, token
    LIMIT {_RM3_TOP}
    """,
)
def q394_rm3_query_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RM3 PSEUDO-RELEVANCE-FEEDBACK query expansion (Lavrenko &
    Croft relevance models, the Anserini/Indri default) — run the
    seed query through q74's BM25, take the top-{_RM3_FB_DOCS}
    feedback documents, estimate the relevance model P(w|R) as the
    mean per-doc term frequency (uniform doc weights, length-
    normalized tf/dl), and interpolate with the original query's
    uniform distribution at α={_RM3_ALPHA}. The emitted top-
    {_RM3_TOP} weighted terms ARE the expanded query a second-pass
    retrieval runs — closing the retrieval loop the engine already
    scores (q74 BM25 → this expansion → q332's QL re-scoring), the
    classic recall lever when training-data mining needs 'more
    documents like these'.

    Scale: pass 1 is exactly q74's bounded-explode plan (terms
    filtered BEFORE explode); the feedback explode touches only
    {_RM3_FB_DOCS} documents (semi-join then full unnest of just
    those rows), so the relevance model is built from a bounded
    slice no matter the corpus; the final interpolation is
    |feedback vocab| rows. Weights are sums over ≤{_RM3_FB_DOCS}
    exact tf/dl ratios, 6-dp rounded — tie order on the rounded
    weight then token, stable cross-engine.
    """
    d = load(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.size(T.tokens(F.col("text"))).alias("dl"),
        T.tokens(F.col("text")).alias("t"),
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        base.select(
            "doc_id",
            "dl",
            F.explode(
                F.filter(F.col("t"), lambda x: x.isin(*_BM25_TERMS))
            ).alias("token"),
        )
        .groupBy("doc_id", "dl", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dft = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dft), "token")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.sum(
                T.bm25_term_score(
                    F.col("tf"), F.col("df"), F.col("dl"),
                    F.col("n_docs"), F.col("avgdl"),
                    k1=_BM25_K1, b=_BM25_B,
                )
            ).alias("bm25")
        )
    )
    fb = (
        scored.orderBy(F.desc(F.round(F.col("bm25"), 4)), F.asc("doc_id"))
        .limit(_RM3_FB_DOCS)
        .select("doc_id")
    )
    fbtf = (
        base.join(fb, "doc_id", "left_semi")
        .select("doc_id", "dl", F.explode("t").alias("token"))
        .filter(F.length("token") >= _RM3_MINLEN)
        .groupBy("doc_id", "dl", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    nfb = fb.agg(F.count(F.lit(1)).cast("double").alias("k"))
    pr = (
        fbtf.groupBy("token")
        .agg(
            F.sum(F.col("tf").cast("double") / F.col("dl")).alias("s"),
            F.count(F.lit(1)).cast("long").alias("fb_df"),
        )
        .crossJoin(F.broadcast(nfb))
        .select("token", (F.col("s") / F.col("k")).alias("p_r"), "fb_df")
    )
    in_q = F.col("token").isin(*_BM25_TERMS)
    return (
        pr.select(
            "token",
            F.round(
                (1 - _RM3_ALPHA)
                * F.when(in_q, F.lit(1.0 / len(_BM25_TERMS))).otherwise(0.0)
                + _RM3_ALPHA * F.col("p_r"),
                6,
            ).alias("rm3_weight"),
            in_q.alias("in_original"),
            "fb_df",
        )
        .orderBy(F.desc("rm3_weight"), "token")
        .limit(_RM3_TOP)
    )


def _q397_oracle(steps: int = 5) -> str:
    ctes = ["""tw0 AS (
        SELECT word, CAST(count(*) AS BIGINT) AS f,
               '  ' || regexp_replace(word, '(.)', '\\1  ', 'g') AS repr
        FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z]+'))
                     AS word
              FROM documents WHERE doc_id % 10 <> 7)
        WHERE word <> '' GROUP BY word
    ),
    hw0 AS (
        SELECT word, CAST(count(*) AS BIGINT) AS f,
               '  ' || regexp_replace(word, '(.)', '\\1  ', 'g') AS repr
        FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z]+'))
                     AS word
              FROM documents WHERE doc_id % 10 = 7)
        WHERE word <> '' GROUP BY word
    )"""]
    for t in range(1, steps + 1):
        ctes.append(f"""tp{t} AS (
        SELECT pair, CAST(sum(f) AS BIGINT) AS cnt FROM (
            SELECT f, unnest(list_transform(range(1, len(s)),
                             i -> s[i] || ' ' || s[i + 1])) AS pair
            FROM (SELECT f, string_split(trim(repr), '  ') AS s
                  FROM tw{t - 1})
        ) GROUP BY pair
    ),
    tb{t} AS (SELECT pair FROM tp{t} ORDER BY cnt DESC, pair LIMIT 1),
    tw{t} AS (
        SELECT w.word, w.f,
               replace(w.repr, ' ' || replace(b.pair, ' ', '  ') || ' ',
                       ' ' || replace(b.pair, ' ', '') || ' ') AS repr
        FROM tw{t - 1} w, tb{t} b
    ),
    hw{t} AS (
        SELECT w.word, w.f,
               replace(w.repr, ' ' || replace(b.pair, ' ', '  ') || ' ',
                       ' ' || replace(b.pair, ' ', '') || ' ') AS repr
        FROM hw{t - 1} w, tb{t} b
    )""")
    counts = ", ".join(
        f"c{t} AS (SELECT CAST(sum(f * len(string_split(trim(repr), '  ')))"
        f" AS BIGINT) AS n FROM hw{t})"
        for t in range(0, steps + 1)
    )
    rows = " UNION ALL ".join(
        f"SELECT CAST({t} AS BIGINT) AS step,"
        + ("'' AS merged_pair" if t == 0
           else f"(SELECT pair FROM tb{t}) AS merged_pair")
        + f", (SELECT n FROM c{t}) AS held_tokens,"
        f" round(100.0 * (1.0 - CAST((SELECT n FROM c{t}) AS DOUBLE)"
        f" / (SELECT n FROM c0)), 4) AS saved_pct"
        for t in range(0, steps + 1)
    )
    return f"WITH {', '.join(ctes)}, {counts} {rows} ORDER BY step"


@register("q397_bpe_encode_compression", oracle=_q397_oracle())
def q397_bpe_encode_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODER application + compression audit — closes q383's
    train→apply loop the way a real tokenizer pipeline does: train
    the 5 merges on 90% of documents (doc_id % 10 ≠ 7, the q137
    deterministic split), APPLY them in order to the HELD-OUT 10%,
    and report the held-out token count after each merge with the
    cumulative compression (saved_pct vs character-level step 0).
    This is the honest generalization measurement — merges learned
    on train must pay on unseen text, and a merge whose saved_pct
    step is ~0 has memorized train-only adjacency (the overfit
    signal a vocab-size sweep watches for, q191's curve).

    Scale: both word tables collapse their corpora once to vocab
    grain; each round reuses q383's machinery (shared helpers — one
    pair-agg on the TRAIN table, broadcast 1-row argmax, map-side
    rewrite applied to BOTH tables, localCheckpoint per round).
    Token counts are exact integer Σ f·|symbols|.
    """
    d = load(spark, sf_dir, "documents")
    train = _bpe_word_table(d.filter(F.col("doc_id") % 10 != 7)).localCheckpoint()
    held = _bpe_word_table(d.filter(F.col("doc_id") % 10 == 7)).localCheckpoint()

    def held_tokens() -> DataFrame:
        return held.agg(
            F.sum(
                F.col("f")
                * F.size(F.split(F.trim(F.col("repr")), "  "))
            ).cast("long").alias("n")
        )

    c0 = held_tokens().localCheckpoint()
    outs = [
        c0.select(
            F.lit(0).cast("long").alias("step"),
            F.lit("").alias("merged_pair"),
            F.col("n").alias("held_tokens"),
        )
    ]
    for step in (1, 2, 3, 4, 5):
        best = (
            _bpe_pair_counts(train)
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
            .localCheckpoint()
        )
        train = _bpe_apply_merge(train, best, ["f"]).localCheckpoint()
        held = _bpe_apply_merge(held, best, ["f"]).localCheckpoint()
        outs.append(
            best.select(F.col("pair").alias("merged_pair"))
            .crossJoin(held_tokens())
            .select(
                F.lit(step).cast("long").alias("step"),
                "merged_pair",
                F.col("n").alias("held_tokens"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return (
        out.crossJoin(F.broadcast(c0.select(F.col("n").alias("n0"))))
        .select(
            "step",
            "merged_pair",
            "held_tokens",
            F.round(
                100.0
                * (1.0 - F.col("held_tokens").cast("double") / F.col("n0")),
                4,
            ).alias("saved_pct"),
        )
        .orderBy("step")
    )


_Q398_ITERS = 3
_Q398_EDGE_SQL = f"""
        SELECT t[i.i] AS a, t[i.i + 1] AS b, count(*) AS w
        FROM (SELECT {_TOKS} AS t FROM documents),
             LATERAL (SELECT unnest(generate_series(
                 1, greatest(len(t) - 1, 0))) AS i) AS i
        WHERE length(t[i.i]) >= 3 AND length(t[i.i + 1]) >= 3
          AND t[i.i] <> t[i.i + 1]
        GROUP BY a, b
"""


def _q398_oracle() -> str:
    its = []
    for t in range(1, _Q398_ITERS + 1):
        its.append(f"""it{t} AS (
        SELECT e.v AS node,
               0.15e0 / (SELECT cnt FROM n)
               + 0.85e0 * sum(i.pr * e.w / d.wd) AS pr
        FROM edges e
        JOIN it{t - 1} i ON e.u = i.node
        JOIN deg d ON d.u = e.u
        GROUP BY e.v
    )""")
    return f"""
    WITH bi AS ({_Q398_EDGE_SQL}),
    edges AS (
        SELECT a AS u, b AS v, CAST(w AS DOUBLE) AS w FROM bi
        UNION ALL
        SELECT b AS u, a AS v, CAST(w AS DOUBLE) AS w FROM bi
    ),
    deg AS (SELECT u, sum(w) AS wd FROM edges GROUP BY u),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS cnt FROM deg),
    it0 AS (SELECT u AS node, 1e0 / (SELECT cnt FROM n) AS pr FROM deg),
    {', '.join(its)}
    SELECT node AS keyword, round(pr * 1000, 6) AS rank_milli
    FROM it{_Q398_ITERS}
    ORDER BY round(pr * 1000, 6) DESC, node
    LIMIT 20
    """


@register("q398_textrank_keywords", oracle=_q398_oracle())
def q398_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank KEYWORD extraction (Mihalcea & Tarau 2004) —
    weighted PageRank over the word co-occurrence graph: adjacent
    token pairs (both ≥3 chars, self-loops dropped) are undirected
    edges weighted by corpus co-occurrence count, and 3 damped
    iterations (d=0.85, uniform init) propagate importance
    pr·w(u,v)/wdeg(u). Top-20 words by rank are the corpus keywords
    — the unsupervised complement of q233's class-contrastive
    c-TF-IDF (no labels needed) and the WEIGHTED-graph variant of
    q118's unweighted PageRank. Ranks are scaled ×1000 and rounded
    at 6 dp before the ordering so float-summation order can never
    reorder the emitted list.

    Scale: the bigram edge list collapses the corpus once at
    (word-pair) grain; each iteration is one edge⋈rank equi-join +
    partial-agg sum (edges/deg/weighted-edges persisted so the
    explode materializes once, q118's discipline); vocabulary-grain
    relations everywhere — nothing corpus-grain after the first agg.
    """
    from g_etl_spark.operators import text as T

    d = load(spark, sf_dir, "documents")
    toks = d.select(T.tokens(F.col("text")).alias("t"))
    bi = (
        toks.select(
            F.explode(
                F.expr(
                    "zip_with(slice(t, 1, size(t) - 1),"
                    " slice(t, 2, size(t) - 1), (a, b) -> struct(a, b))"
                )
            ).alias("p")
        )
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .filter(
            (F.length("a") >= 3)
            & (F.length("b") >= 3)
            & (F.col("a") != F.col("b"))
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    edges = (
        bi.select(F.col("a").alias("u"), F.col("b").alias("v"), "w")
        .unionAll(bi.select(F.col("b").alias("u"), F.col("a").alias("v"), "w"))
        .persist()
    )
    deg = edges.groupBy("u").agg(F.sum("w").alias("wd")).persist()
    nn = deg.agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    pr = deg.crossJoin(F.broadcast(nn)).select(
        F.col("u").alias("node"), (F.lit(1.0) / F.col("cnt")).alias("pr")
    )
    ew = edges.join(deg, "u").persist()
    for _ in range(_Q398_ITERS):
        contrib = ew.join(pr, ew["u"] == pr["node"]).select(
            "v", (F.col("pr") * F.col("w") / F.col("wd")).alias("c")
        )
        pr = (
            contrib.groupBy("v")
            .agg(F.sum("c").alias("s"))
            .crossJoin(F.broadcast(nn))
            .select(
                F.col("v").alias("node"),
                (F.lit(0.15) / F.col("cnt") + F.lit(0.85) * F.col("s"))
                .alias("pr"),
            )
        )
    out = (
        pr.select(
            F.col("node").alias("keyword"),
            F.round(F.col("pr") * 1000, 6).alias("rank_milli"),
        )
        .orderBy(F.desc("rank_milli"), "keyword")
        .limit(20)
    )
    final = out.localCheckpoint(eager=True)
    for df in (ew, deg, edges):
        df.unpersist()
    return final.orderBy(F.desc("rank_milli"), "keyword")


_Q410_PERDOC_SQL = f"""
    docs AS (
        SELECT doc_id, source, {_TOKS} AS toks FROM documents
        WHERE len({_TOKS}) >= 2
    ),
    bigrams AS (
        SELECT doc_id, source, toks[i] AS prev, toks[i + 1] AS cur
        FROM (SELECT doc_id, source, toks,
                     unnest(range(1, len(toks))) AS i
              FROM docs)
    ),
    bg AS (
        SELECT prev, cur, CAST(count(*) AS BIGINT) AS c_ab
        FROM bigrams GROUP BY prev, cur
    ),
    ctx AS (
        SELECT prev, CAST(sum(c_ab) AS BIGINT) AS c_a FROM bg GROUP BY prev
    ),
    vocab AS (
        SELECT CAST(count(DISTINCT t) AS BIGINT) AS v
        FROM (SELECT unnest(toks) AS t FROM docs)
    ),
    model AS (
        SELECT bg.prev, bg.cur,
               CAST(round(ln(CAST(bg.c_ab + 1 AS DOUBLE)
                             / CAST(ctx.c_a + vocab.v AS DOUBLE)) * 1000000)
                    AS BIGINT) AS q_lp
        FROM bg JOIN ctx ON bg.prev = ctx.prev CROSS JOIN vocab
    ),
    per_doc AS (
        SELECT b.doc_id, b.source,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(round(CAST(-sum(m.q_lp) AS DOUBLE) / count(*)) AS BIGINT)
                   AS xent_micro
        FROM bigrams b
        JOIN model m ON b.prev = m.prev AND b.cur = m.cur
        GROUP BY b.doc_id, b.source
    )"""


def _q410_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared q410/q432 per-document bigram-LM cross-entropy
    relation (doc_id, source, n_bigrams, xent_micro) — the add-one
    corpus bigram model scored back onto each >=2-token document,
    micro-nat quantized (see q410 docstring for the algebra)."""
    d = load(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    docs = d.select("doc_id", "source", toks.alias("toks")).filter(
        F.size("toks") >= 2
    )
    bigrams = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(element_at(toks, i) AS prev,"
                " element_at(toks, i + 1) AS cur))"
            )
        ).alias("b"),
    ).select("doc_id", "source", "b.prev", "b.cur")
    bg = bigrams.groupBy("prev", "cur").agg(
        F.count(F.lit(1)).cast("long").alias("c_ab")
    )
    ctx = bg.groupBy("prev").agg(F.sum("c_ab").cast("long").alias("c_a"))
    vocab = docs.select(F.explode("toks").alias("t")).agg(
        F.countDistinct("t").cast("long").alias("v")
    )
    model = (
        bg.join(ctx, "prev")
        .crossJoin(F.broadcast(vocab))
        .select(
            "prev",
            "cur",
            F.round(
                F.log(
                    (F.col("c_ab") + 1).cast("double")
                    / (F.col("c_a") + F.col("v")).cast("double")
                )
                * 1000000
            )
            .cast("long")
            .alias("q_lp"),
        )
    )
    per_doc = (
        bigrams.join(model, ["prev", "cur"])
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(
                (-F.sum("q_lp")).cast("double") / F.count(F.lit(1))
            )
            .cast("long")
            .alias("xent_micro"),
        )
    )
    # every caller consumes per_doc at least twice (cutoff + final
    # pass); checkpoint so the bigram-model join materializes once
    return per_doc.localCheckpoint()


@register(
    "q410_perplexity_filter",
    oracle=f"""
    WITH {_Q410_PERDOC_SQL},
    cut AS (
        SELECT xent_micro AS c FROM (
            SELECT xent_micro,
                   row_number() OVER (ORDER BY xent_micro, doc_id) AS rn,
                   count(*) OVER () AS n
            FROM per_doc
        ) WHERE rn = (n + 1) // 2
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (xent_micro <= (SELECT c FROM cut))
                AS BIGINT) AS n_kept,
           round(CAST(count(*) FILTER (xent_micro <= (SELECT c FROM cut))
                      AS DOUBLE) / count(*), 4) AS keep_rate,
           CAST(sum(CASE WHEN xent_micro <= (SELECT c FROM cut)
                         THEN n_bigrams + 1 ELSE 0 END) AS BIGINT)
               AS kept_tokens,
           (SELECT c FROM cut) AS cutoff_micro
    FROM per_doc
    GROUP BY source
    ORDER BY source
    """,
)
def q410_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERPLEXITY-based quality FILTER (the CCNet recipe) — score
    every document with the corpus bigram LM (q330's add-one model,
    micro-nat quantized so the cross-engine join and cutoff compare
    on integers), set the cutoff at the exact LOWER-MEDIAN per-doc
    cross-entropy (integer order statistic, no interpolation), and
    keep the fluent half. The per-source keep-rate and surviving
    token budget are the mixture-shift readout that matters: a
    perplexity filter silently reweights sources (fluent-register
    sources survive disproportionately — CCNet's documented 'head'
    bias), and this table is where that shows up BEFORE training.
    Composes the LM family into the filter family: q330 scores,
    q410 decides; q58/q59 are the heuristic rungs this replaces.

    Scale: the LM is a |bigram-vocab| relation equi-joined back
    (never driver-side); per-doc scores collapse map-side; the
    median is a doc-grain order statistic (window over per_doc, the
    corpus already reduced ~100×); the final rollup is |sources|
    rows.
    """
    per_doc = _q410_per_doc(spark, sf_dir)
    wn = Window.orderBy("xent_micro", "doc_id")
    cut = (
        per_doc.select(
            "xent_micro",
            F.row_number().over(wn).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        )
        .filter(F.expr("rn = (n + 1) div 2"))
        .select(F.col("xent_micro").alias("cutoff_micro"))
    )
    keep = F.col("xent_micro") <= F.col("cutoff_micro")
    return (
        per_doc.crossJoin(F.broadcast(cut))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(keep.cast("int")).cast("long").alias("n_kept"),
            F.round(
                F.sum(keep.cast("int")).cast("double") / F.count(F.lit(1)),
                4,
            ).alias("keep_rate"),
            F.sum(F.when(keep, F.col("n_bigrams") + 1).otherwise(0))
            .cast("long")
            .alias("kept_tokens"),
            F.first("cutoff_micro").alias("cutoff_micro"),
        )
        .orderBy("source")
    )


@register(
    "q418_good_turing_smoothing",
    oracle=f"""
    WITH tokc AS (
        SELECT g AS t, CAST(count(*) AS BIGINT) AS r
        FROM (
            SELECT array_to_string(t[i.i : i.i + 2], ' ') AS g
            FROM (SELECT {_TOKS} AS t FROM documents),
                 LATERAL (SELECT unnest(generate_series(
                     1, greatest(len(t) - 2, 0))) AS i) AS i
        )
        GROUP BY g
    ),
    fof AS (
        SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM tokc GROUP BY r
    ),
    n AS (SELECT CAST(sum(r * n_r) AS BIGINT) AS n_tokens FROM fof)
    SELECT f.r, f.n_r,
           round((f.r + 1) * CAST(coalesce(f2.n_r, 0) AS DOUBLE)
                 / f.n_r, 6) AS r_star,
           round((f.r + 1) * CAST(coalesce(f2.n_r, 0) AS DOUBLE)
                 / f.n_r / (SELECT n_tokens FROM n), 9) AS p_gt,
           round(CAST(f.r AS DOUBLE) / (SELECT n_tokens FROM n), 9)
               AS p_mle,
           round((SELECT CAST(n_r AS DOUBLE) FROM fof WHERE r = 1)
                 / (SELECT n_tokens FROM n), 6) AS unseen_mass
    FROM fof f LEFT JOIN fof f2 ON f2.r = f.r + 1
    WHERE f.r <= 5
    ORDER BY f.r
    """,
)
def q418_good_turing_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GOOD–TURING smoothing table — the frequency-of-frequencies
    estimator the LM family was missing (q330 add-one, q354
    Kneser–Ney, q332 Dirichlet): for each observed count r ≤ 5, the
    adjusted count r* = (r+1)·N_{r+1}/N_r and the smoothed
    probability p_gt = r*/N, against the MLE r/N it discounts —
    plus the Turing unseen-mass estimate N_1/N, the probability
    budget reserved for words never seen (the quantity every
    open-vocabulary perplexity depends on, and the statistic behind
    q244's capture-recapture). Types are 3-token SHINGLES (the q153
    relation) — the fixture's unigram vocabulary is deliberately
    tiny (31 types, min count 26: no rare events), while the
    shingle space has the heavy singleton tail Good–Turing exists
    for. Low-r cells are exactly where MLE is worst and N_r
    largest — the sparsity fingerprint (q297's Heaps-law cousin).

    Scale: one token explode → vocab-grain counts → |distinct r|
    rows (dozens); the self-join on r+1 and the scalar totals are
    bounded arithmetic. Counts exact; the only doubles are the
    final divisions, 6/9-dp rounded.
    """
    from g_etl_spark.operators.dedup import shingles

    d = load(spark, sf_dir, "documents")
    tokc = (
        d.select(F.explode(shingles(F.col("text"))).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("r"))
    )
    fof = tokc.groupBy("r").agg(F.count(F.lit(1)).alias("n_r"))
    n = fof.agg(F.sum(F.col("r") * F.col("n_r")).alias("n_tokens"))
    n1 = fof.filter(F.col("r") == 1).select(
        F.col("n_r").cast("double").alias("n1")
    )
    f2 = fof.select(
        (F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r_next")
    )
    return (
        fof.join(f2, "r", "left")
        .filter(F.col("r") <= 5)
        .crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(n1))
        .select(
            F.col("r").cast("long").alias("r"),
            F.col("n_r").cast("long").alias("n_r"),
            F.round(
                (F.col("r") + 1)
                * F.coalesce(F.col("n_r_next"), F.lit(0)).cast("double")
                / F.col("n_r"),
                6,
            ).alias("r_star"),
            F.round(
                (F.col("r") + 1)
                * F.coalesce(F.col("n_r_next"), F.lit(0)).cast("double")
                / F.col("n_r")
                / F.col("n_tokens"),
                9,
            ).alias("p_gt"),
            F.round(F.col("r").cast("double") / F.col("n_tokens"), 9).alias(
                "p_mle"
            ),
            F.round(F.col("n1") / F.col("n_tokens"), 6).alias("unseen_mass"),
        )
        .orderBy("r")
    )


# ---- q424: unigram-LM tokenizer, one EM round (SentencePiece) ----------
_ULM_MAXP = 4        # max candidate piece length
_ULM_MAXW = 16       # words truncated to this many chars (bounds the DP)
_ULM_TOPV = 120      # multi-char candidate pieces kept (all chars always kept)
_ULM_BIG = 10**15    # "piece absent" sentinel cost (micro-nats)
_ULM_OUT = 20        # pieces emitted


def _ulm_lstar_sql(pos: str, dl: str, cv: str) -> str:
    """Smallest piece length l whose back-step reproduces the DP
    optimum at `pos` — exact INTEGER equality (costs are micro-nat
    BIGINTs), so the tie-break is deterministic in both engines.
    `cv(idx)` is engine-specific cost lookup text."""
    conds = []
    for l in range(1, _ULM_MAXP + 1):
        look = cv.format(idx=f"({pos} - {l}) * {_ULM_MAXP} + {l}")
        conds.append(
            f"WHEN {l} <= {pos} AND element_at({dl}, {pos} - {l} + 1)"
            f" + coalesce({look}, {_ULM_BIG})"
            f" = element_at({dl}, {pos} + 1) THEN {l}"
        )
    return "CASE " + " ".join(conds[:-1]) + f" ELSE {_ULM_MAXP} END"


def _q424_oracle_ctes() -> str:
    """Shared q424/q437 oracle CTE chain: word table -> candidate
    vocab -> integer-cost Viterbi (recursive CTEs) -> M-step usage
    and likelihoods. Callers append their own final SELECT."""
    big = _ULM_BIG
    mp = _ULM_MAXP
    fwd_terms = ", ".join(
        f"CASE WHEN {l} <= j + 1 THEN dl[j + 1 - {l} + 1]"
        f" + coalesce(cv[(j + 1 - {l}) * {mp} + {l}], {big})"
        f" ELSE {big} END"
        for l in range(1, mp + 1)
    )
    back_conds = " ".join(
        f"WHEN {l} <= pos AND dl[pos - {l} + 1]"
        f" + coalesce(cv[(pos - {l}) * {mp} + {l}], {big})"
        f" = dl[pos + 1] THEN {l}"
        for l in range(1, mp)
    )
    return f"""
    WITH RECURSIVE words AS (
        SELECT substr(word, 1, {_ULM_MAXW}) AS w,
               CAST(count(*) AS BIGINT) AS f
        FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z]+'))
                     AS word FROM documents)
        WHERE word <> '' GROUP BY substr(word, 1, {_ULM_MAXW})
    ),
    subs AS (
        SELECT f, w, i.i AS i, l.l AS l, substr(w, i.i, l.l) AS s
        FROM words,
             LATERAL (SELECT unnest(range(1, length(w) + 1)) AS i) i,
             LATERAL (SELECT unnest(range(1,
                 least({mp}, length(w) - i.i + 1) + 1)) AS l) l
    ),
    cnt AS (
        SELECT s AS piece, CAST(sum(f) AS BIGINT) AS cnt0
        FROM subs GROUP BY s
    ),
    vocab AS (
        SELECT piece, cnt0 FROM cnt WHERE length(piece) = 1
        UNION ALL
        SELECT piece, cnt0 FROM (
            SELECT piece, cnt0 FROM cnt WHERE length(piece) >= 2
            ORDER BY cnt0 DESC, piece LIMIT {_ULM_TOPV}
        )
    ),
    t0 AS (SELECT CAST(sum(cnt0) AS BIGINT) AS t FROM vocab),
    v0 AS (
        SELECT piece, cnt0,
               CAST(round(1000000 * ln(CAST(t0.t AS DOUBLE) / cnt0))
                    AS BIGINT) AS c0
        FROM vocab, t0
    ),
    wc AS (
        SELECT g.w, g.f, list(v0.c0 ORDER BY (g.i - 1) * {mp} + g.l) AS cv
        FROM (SELECT w, f, i.i AS i, l.l AS l FROM words,
                   LATERAL (SELECT unnest(range(1, {_ULM_MAXW} + 1)) AS i) i,
                   LATERAL (SELECT unnest(range(1, {mp} + 1)) AS l) l) g
        LEFT JOIN v0
          ON v0.piece = substr(g.w, g.i, g.l)
         AND length(substr(g.w, g.i, g.l)) = g.l
        GROUP BY g.w, g.f
    ),
    fwd AS (
        SELECT w, f, cv, 0 AS j, [CAST(0 AS BIGINT)] AS dl FROM wc
        UNION ALL
        SELECT w, f, cv, j + 1, list_append(dl, least({fwd_terms}))
        FROM fwd WHERE j < length(w)
    ),
    done AS (SELECT w, f, cv, dl FROM fwd WHERE j = length(w)),
    back AS (
        SELECT w, f, cv, dl, length(w) AS pos,
               CAST([] AS VARCHAR[]) AS ps
        FROM done
        UNION ALL
        SELECT w, f, cv, dl, pos - lstar,
               list_append(ps, substr(w, pos - lstar + 1, lstar))
        FROM (SELECT *, CASE {back_conds} ELSE {mp} END AS lstar
              FROM back WHERE pos > 0)
    ),
    segs AS (
        SELECT f, unnest(ps) AS piece FROM back WHERE pos = 0
    ),
    usage AS (
        SELECT piece, CAST(sum(f) AS BIGINT) AS cnt1
        FROM segs GROUP BY piece
    ),
    t1 AS (SELECT CAST(sum(cnt1) AS BIGINT) AS t FROM usage),
    v1 AS (
        SELECT u.piece, u.cnt1,
               CAST(round(1000000 * ln(CAST(t1.t AS DOUBLE) / u.cnt1))
                    AS BIGINT) AS c1
        FROM usage u, t1
    ),
    ll0 AS (SELECT CAST(sum(f * dl[length(w) + 1]) AS BIGINT) AS v
            FROM done),
    ll1 AS (SELECT CAST(sum(cnt1 * c1) AS BIGINT) AS v FROM v1)
"""


def _q424_oracle() -> str:
    return _q424_oracle_ctes() + f"""
    SELECT CAST(row_number() OVER (ORDER BY v1.cnt1 DESC, v1.piece)
                AS BIGINT) AS piece_rank,
           v1.piece,
           v0.cnt0, v0.c0 AS cost0_micro,
           v1.cnt1, v1.c1 AS cost1_micro,
           ll0.v AS ll0_micro, ll1.v AS ll1_micro,
           ll1.v <= ll0.v AS ll_improved
    FROM v1 JOIN v0 USING (piece), ll0, ll1
    ORDER BY v1.cnt1 DESC, v1.piece LIMIT {_ULM_OUT}
    """



def _ulm_subs(words: DataFrame) -> DataFrame:
    """Every (start, len ≤ _ULM_MAXP) substring of every word — the
    candidate-piece fan-out (map-side explode, w/f carried along)."""
    return words.select(
        "w",
        "f",
        F.explode(
            F.expr(
                f"flatten(transform(sequence(1, length(w)), i ->"
                f" transform(sequence(1, least({_ULM_MAXP},"
                f" length(w) - i + 1)), l ->"
                " named_struct('i', i, 'l', l, 's', substr(w, i, l)))))"
            )
        ).alias("p"),
    ).select("w", "f", "p.i", "p.l", "p.s")


def _ulm_estep(words: DataFrame, costs: DataFrame) -> DataFrame:
    """VITERBI E-step under an arbitrary (piece, cost) model: per
    word, piece costs land in a (pos,len)-keyed map and one
    `aggregate` fold builds the integer DP distance list. Returns
    (w, f, cm, dl), eagerly checkpointed (q424's device, reused by
    the q445 prune→refit pass with the pruned cost set)."""
    edges = (
        _ulm_subs(words)
        .join(F.broadcast(costs), F.col("s") == costs["piece"])
        .select(
            "w",
            "f",
            ((F.col("i") - 1) * _ULM_MAXP + F.col("l")).alias("idx"),
            "cost",
        )
    )
    wc = edges.groupBy("w", "f").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("idx"), F.col("cost")))
        ).alias("cm")
    )
    big = _ULM_BIG
    fwd_terms = ", ".join(
        f"IF({l} <= j, element_at(acc, j - {l} + 1)"
        f" + coalesce(element_at(cm, (j - {l}) * {_ULM_MAXP} + {l}),"
        f" {big}), {big})"
        for l in range(1, _ULM_MAXP + 1)
    )
    dl_sql = (
        "aggregate(sequence(1, length(w)), array(CAST(0 AS BIGINT)),"
        f" (acc, j) -> array_append(acc, least({fwd_terms})))"
    )
    return wc.select("w", "f", "cm", F.expr(dl_sql).alias("dl")).localCheckpoint()


# Session-scoped memo for the unigram-LM machinery (r13 verdict item
# #7): q424/q437/q441/q445 each need the SAME model frames and each
# registry row must stand alone, so the builder stays callable per
# query — but within one session the E-step localCheckpoint (the
# expensive part, ~2.5 s/build at sf0.01) is shared. Keyed by
# (applicationId, sf_dir); a cached entry is probed with a 1-row
# action before reuse and rebuilt on ANY failure (a restarted context
# invalidates checkpointed RDDs), so the fallback is per-query rebuild
# — standalone-ness is preserved.
_ULM_CACHE: dict[tuple, dict] = {}


def _ulm_fingerprint(sf_dir: str) -> tuple:
    """Cheap data fingerprint of the corpus the model derives from:
    (mtime_ns, size) of documents.parquet (or all parquet parts under
    it when it is a directory). Folded into the cache key so a corpus
    REWRITTEN at the same path within one application rebuilds the
    model instead of silently reusing a stale one (the liveness probe
    only checks checkpoint validity, not data freshness)."""
    import os as _os

    p = _os.path.join(sf_dir, "documents.parquet")
    try:
        if _os.path.isdir(p):
            return tuple(
                sorted(
                    (nm, st.st_mtime_ns, st.st_size)
                    for nm in _os.listdir(p)
                    if nm.endswith(".parquet")
                    for st in (_os.stat(_os.path.join(p, nm)),)
                )
            )
        st = _os.stat(p)
        return (st.st_mtime_ns, st.st_size)
    except OSError:
        return ("missing",)


def _ulm_model(spark: SparkSession, sf_dir: str) -> dict:
    key = (spark.sparkContext.applicationId, sf_dir, _ulm_fingerprint(sf_dir))
    cached = _ULM_CACHE.get(key)
    if cached is not None:
        try:
            cached["ll1"].first()  # checkpoint liveness probe (1 row)
            return cached
        except Exception:
            _ULM_CACHE.pop(key, None)
    # evict any stale entry for the same (applicationId, sf_dir) whose
    # data fingerprint no longer matches (a corpus rewritten at the
    # same path): without this the old entry's eagerly-pinned
    # localCheckpoint frames stay referenced — and therefore pinned in
    # executor storage — for the application lifetime. Dropping the
    # reference lets ContextCleaner release the checkpoint blocks;
    # unpersist() is called best-effort for the promptly-releasable
    # part.
    for stale in [k for k in _ULM_CACHE if k[:2] == key[:2] and k != key]:
        old = _ULM_CACHE.pop(stale)
        for f in old.values():
            try:
                f.unpersist()
            except Exception:
                pass
    m = _ulm_model_build(spark, sf_dir)
    # eagerly pin the small frames too (vocab-grain / 1-row): the
    # consumers re-aggregate them, and without this each consumer
    # would re-run the vocab fan-out above the shared wd checkpoint
    for k in ("words", "v0", "v1", "ll0", "ll1"):
        m[k] = m[k].localCheckpoint(eager=True)
    _ULM_CACHE[key] = m
    return m


def _ulm_model_build(spark: SparkSession, sf_dir: str) -> dict:
    """Shared q424/q437/q441/q445 unigram-LM machinery: returns the
    word table, the initial vocab costs (v0), the post-M-step
    usage/costs (v1), and the scalar likelihood frames (ll0, ll1) —
    see q424 for the algebra."""
    d = load(spark, sf_dir, "documents")
    words = (
        d.select(
            F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias(
                "word"
            )
        )
        .filter(F.col("word") != "")
        .select(F.substring("word", 1, _ULM_MAXW).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    cnt = _ulm_subs(words).groupBy(F.col("s").alias("piece")).agg(
        F.sum("f").cast("long").alias("cnt0")
    )
    vocab = cnt.filter(F.length("piece") == 1).unionByName(
        cnt.filter(F.length("piece") >= 2)
        .orderBy(F.desc("cnt0"), F.asc("piece"))
        .limit(_ULM_TOPV)
    )
    t0 = vocab.agg(F.sum("cnt0").cast("long").alias("t"))
    v0 = vocab.crossJoin(F.broadcast(t0)).select(
        "piece",
        "cnt0",
        F.expr(
            "CAST(round(1000000 * ln(CAST(t AS DOUBLE) / cnt0)) AS BIGINT)"
        ).alias("c0"),
    )
    # vocab is bounded (≤ alphabet + _ULM_TOPV rows) by construction
    wd = _ulm_estep(words, v0.select("piece", F.col("c0").alias("cost")))
    lstar = _ulm_lstar_sql(
        "acc.pos", "dl", "element_at(cm, {idx})"
    )
    back_sql = (
        f"aggregate(sequence(1, {_ULM_MAXW}),"
        " named_struct('pos', length(w),"
        " 'ps', CAST(array() AS ARRAY<STRING>)),"
        " (acc, t) -> IF(acc.pos <= 0, acc, named_struct("
        f"'pos', acc.pos - ({lstar}),"
        f" 'ps', array_append(acc.ps,"
        f" substr(w, acc.pos - ({lstar}) + 1, {lstar})))))"
        ".ps"
    )
    segs = wd.select("f", F.explode(F.expr(back_sql)).alias("piece"))
    usage = segs.groupBy("piece").agg(F.sum("f").cast("long").alias("cnt1"))
    t1 = usage.agg(F.sum("cnt1").cast("long").alias("t"))
    v1 = usage.crossJoin(F.broadcast(t1)).select(
        "piece",
        "cnt1",
        F.expr(
            "CAST(round(1000000 * ln(CAST(t AS DOUBLE) / cnt1)) AS BIGINT)"
        ).alias("c1"),
    )
    ll0 = wd.agg(
        F.sum(F.col("f") * F.expr("element_at(dl, length(w) + 1)"))
        .cast("long")
        .alias("ll0_micro")
    )
    ll1 = v1.agg(
        F.sum(F.col("cnt1") * F.col("c1")).cast("long").alias("ll1_micro")
    )
    seg_sizes = wd.select(
        "w", F.size(F.expr(back_sql)).alias("n_pieces")
    )
    return {
        "words": words,
        "v0": v0,
        "v1": v1,
        "ll0": ll0,
        "ll1": ll1,
        "seg_sizes": seg_sizes,
    }


@register("q424_unigram_lm_em_round", oracle=_q424_oracle())
def q424_unigram_lm_em_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNIGRAM-LM tokenizer, one full EM round (Kudo 2018 — the
    SentencePiece algorithm, the standard counterpart of q383's BPE
    trainer): candidate vocabulary = every character plus the top
    {_ULM_TOPV} substrings (length ≤ {_ULM_MAXP}) by corpus
    frequency; E-step = exact VITERBI segmentation of every word
    under the initial unigram probabilities; M-step = piece-usage
    counts re-normalized into the next model. All piece costs are
    integer MICRO-NATS (round(1e6·ln(T/cnt)) of exact integer
    counts), so the DP, its argmin tie-break (smallest piece length
    achieving exact integer equality), and both corpus likelihoods
    are bit-identical across engines — the integer-pinned
    likelihood compare: ll1 ≤ ll0 is Gibbs' inequality made
    auditable (the M-step MLE can only improve the cross-entropy of
    the fixed segmentation).

    The DP runs entirely inside array HOFs: per word (truncated at
    {_ULM_MAXW} chars — the bound both engines apply BEFORE
    grouping), piece costs land in a (pos,len)-keyed map and one
    `aggregate` fold builds the distance list, a second fold walks
    the backtrace — no per-position join rounds, no UDF. The oracle
    runs the same integer DP as recursive CTEs.

    Scale: the corpus collapses ONCE to the word-frequency table
    (the q383 device); candidates/vocab are |vocab|-grain with a
    bounded (≤ 26 + {_ULM_TOPV} + punctuationless) piece list that
    broadcasts by contract; the E-step is map-side per-word compute;
    the M-step is one explode(≤{_ULM_MAXW} pieces/word) + hash agg.
    At 100 TB only the word table shuffles — millions of rows, not
    the corpus.
    """
    m = _ulm_model(spark, sf_dir)
    v0, v1, ll0, ll1 = m["v0"], m["v1"], m["ll0"], m["ll1"]
    return (
        v1.join(v0, "piece")
        .crossJoin(F.broadcast(ll0))
        .crossJoin(F.broadcast(ll1))
        .select(
            F.row_number()
            .over(Window.orderBy(F.desc("cnt1"), F.asc("piece")))
            .cast("long")
            .alias("piece_rank"),
            "piece",
            "cnt0",
            F.col("c0").alias("cost0_micro"),
            "cnt1",
            F.col("c1").alias("cost1_micro"),
            "ll0_micro",
            "ll1_micro",
            (F.col("ll1_micro") <= F.col("ll0_micro")).alias("ll_improved"),
        )
        .orderBy(F.desc("cnt1"), F.asc("piece"))
        .limit(_ULM_OUT)
    )


# ---- q432: mixture-of-filters agreement audit --------------------------
@register(
    "q432_filter_agreement_matrix",
    oracle=f"""
    WITH {_Q410_PERDOC_SQL},
    cut AS (
        SELECT xent_micro AS c FROM (
            SELECT xent_micro,
                   row_number() OVER (ORDER BY xent_micro, doc_id) AS rn,
                   count(*) OVER () AS n
            FROM per_doc
        ) WHERE rn = (n + 1) // 2
    ),
    flags AS (
        SELECT d.doc_id,
               len({_TOKS}) BETWEEN 30 AND 1000
               AND CAST(len(list_filter({_TOKS}, t -> t IN {_STOP_IN}))
                        AS DOUBLE) / greatest(len({_TOKS}), 1) <= 0.6
               AND {_QUALITY_SQL} >= 0.55 AS keep_h,
               CASE WHEN len({_TOKS}) >= 2
                    THEN round(1.0 - CAST(len(list_distinct(
                             list_transform(range(1, len({_TOKS})),
                                 i -> {_TOKS}[i] || ' ' || {_TOKS}[i+1])))
                             AS DOUBLE)
                         / (len({_TOKS}) - 1), 4) <= 0.05
                    ELSE true END AS keep_r,
               coalesce(p.xent_micro <= (SELECT c FROM cut), false)
                   AS keep_p
        FROM documents d LEFT JOIN per_doc p USING (doc_id)
    ),
    cells AS (
        SELECT keep_h, keep_r, keep_p, CAST(count(*) AS BIGINT) AS n
        FROM flags GROUP BY 1, 2, 3
    ),
    k AS (
        SELECT CAST(sum(n) AS BIGINT) AS nt,
               CAST(sum(CASE WHEN keep_h = keep_r THEN n ELSE 0 END)
                    AS BIGINT) AS ag_hr,
               CAST(sum(CASE WHEN keep_h = keep_p THEN n ELSE 0 END)
                    AS BIGINT) AS ag_hp,
               CAST(sum(CASE WHEN keep_r = keep_p THEN n ELSE 0 END)
                    AS BIGINT) AS ag_rp,
               CAST(sum(CASE WHEN keep_h THEN n ELSE 0 END) AS BIGINT)
                   AS h1,
               CAST(sum(CASE WHEN keep_r THEN n ELSE 0 END) AS BIGINT)
                   AS r1,
               CAST(sum(CASE WHEN keep_p THEN n ELSE 0 END) AS BIGINT)
                   AS p1
        FROM cells
    ),
    kap AS (
        SELECT
            CAST(round(1000.0
                 * (1.0 * ag_hr / nt
                    - (1.0 * h1 * r1 + 1.0 * (nt - h1) * (nt - r1))
                      / nt / nt)
                 / (1.0 - (1.0 * h1 * r1 + 1.0 * (nt - h1) * (nt - r1))
                          / nt / nt)) AS BIGINT) AS kappa_hr_milli,
            CAST(round(1000.0
                 * (1.0 * ag_hp / nt
                    - (1.0 * h1 * p1 + 1.0 * (nt - h1) * (nt - p1))
                      / nt / nt)
                 / (1.0 - (1.0 * h1 * p1 + 1.0 * (nt - h1) * (nt - p1))
                          / nt / nt)) AS BIGINT) AS kappa_hp_milli,
            CAST(round(1000.0
                 * (1.0 * ag_rp / nt
                    - (1.0 * r1 * p1 + 1.0 * (nt - r1) * (nt - p1))
                      / nt / nt)
                 / (1.0 - (1.0 * r1 * p1 + 1.0 * (nt - r1) * (nt - p1))
                          / nt / nt)) AS BIGINT) AS kappa_rp_milli,
            nt
        FROM k
    )
    SELECT c.keep_h AS keep_heuristic, c.keep_r AS keep_repetition,
           c.keep_p AS keep_perplexity, c.n AS n_docs,
           round(100.0 * c.n / kap.nt, 2) AS share_pct,
           kap.kappa_hr_milli, kap.kappa_hp_milli, kap.kappa_rp_milli
    FROM cells c, kap
    ORDER BY keep_heuristic, keep_repetition, keep_perplexity
    """,
)
def q432_filter_agreement_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MIXTURE-OF-FILTERS agreement audit — the Venn diagram of the
    three quality-filter families before a corpus build commits to
    one: the C4-style heuristic chain (q58's keeps), the Gopher
    repetition filter (q59, kept = dup ratio ≤ 0.05; sub-2-token
    docs trivially pass), and the CCNet perplexity filter (q410's
    lower-median cutoff; docs too short to score are NOT kept by
    it — the choice a real perplexity filter makes, encoded
    identically in both engines). Output: all 2³ agreement cells
    with doc counts and shares, plus the three pairwise COHEN'S κ
    (milli-pinned, from exact integer agreement/marginal counts) —
    the statistic that separates 'filters agree because both keep
    90%' from genuine correlation. Low κ between heuristic and
    perplexity filters is the published finding (they remove
    DIFFERENT documents); this measures it on YOUR corpus, which is
    what decides whether to chain them or pick one.

    Scale: the heuristic/repetition flags are map-only array math;
    the perplexity flag reuses q410's |bigram-vocab| model join and
    doc-grain median; the agreement matrix is 8 cells and κ is
    arithmetic on one row of integer totals.
    """
    d = load(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    # gram array staged through a projection: dup_ratio_of consumes
    # it three times (q59's documented discipline — CodegenFallback
    # HOFs get no CSE)
    hflag = d.select(
        "doc_id",
        (
            F.size(toks).between(30, 1000)
            & (T.stopword_ratio(F.col("text")) <= 0.6)
            & (T.quality_score(F.col("text")) >= 0.55)
        ).alias("keep_h"),
        F.size(toks).alias("_nt"),
        T.bigrams(F.col("text")).alias("_grams"),
    ).select(
        "doc_id",
        "keep_h",
        F.when(
            F.col("_nt") >= 2, T.dup_ratio_of(F.col("_grams")) <= 0.05
        )
        .otherwise(F.lit(True))
        .alias("keep_r"),
    )
    per_doc = _q410_per_doc(spark, sf_dir)
    wn = Window.orderBy("xent_micro", "doc_id")
    cut = (
        per_doc.select(
            "xent_micro",
            F.row_number().over(wn).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        )
        .filter(F.expr("rn = (n + 1) div 2"))
        .select(F.col("xent_micro").alias("c"))
    )
    pflag = per_doc.crossJoin(F.broadcast(cut)).select(
        "doc_id", (F.col("xent_micro") <= F.col("c")).alias("keep_p")
    )
    flags = hflag.join(pflag, "doc_id", "left").select(
        "doc_id",
        "keep_h",
        "keep_r",
        F.coalesce("keep_p", F.lit(False)).alias("keep_p"),
    )
    cells = flags.groupBy("keep_h", "keep_r", "keep_p").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    k = cells.agg(
        F.sum("n").cast("long").alias("nt"),
        F.sum(F.when(F.col("keep_h") == F.col("keep_r"), F.col("n"))
              .otherwise(0)).cast("long").alias("ag_hr"),
        F.sum(F.when(F.col("keep_h") == F.col("keep_p"), F.col("n"))
              .otherwise(0)).cast("long").alias("ag_hp"),
        F.sum(F.when(F.col("keep_r") == F.col("keep_p"), F.col("n"))
              .otherwise(0)).cast("long").alias("ag_rp"),
        F.sum(F.when(F.col("keep_h"), F.col("n")).otherwise(0))
        .cast("long").alias("h1"),
        F.sum(F.when(F.col("keep_r"), F.col("n")).otherwise(0))
        .cast("long").alias("r1"),
        F.sum(F.when(F.col("keep_p"), F.col("n")).otherwise(0))
        .cast("long").alias("p1"),
    )

    def kappa(ag: str, a1: str, b1: str):
        pe = (
            1.0 * F.col(a1) * F.col(b1)
            + 1.0 * (F.col("nt") - F.col(a1)) * (F.col("nt") - F.col(b1))
        ) / F.col("nt") / F.col("nt")
        return F.round(
            1000.0 * (1.0 * F.col(ag) / F.col("nt") - pe) / (1.0 - pe)
        ).cast("long")

    kap = k.select(
        kappa("ag_hr", "h1", "r1").alias("kappa_hr_milli"),
        kappa("ag_hp", "h1", "p1").alias("kappa_hp_milli"),
        kappa("ag_rp", "r1", "p1").alias("kappa_rp_milli"),
        "nt",
    )
    return (
        cells.crossJoin(F.broadcast(kap))
        .select(
            F.col("keep_h").alias("keep_heuristic"),
            F.col("keep_r").alias("keep_repetition"),
            F.col("keep_p").alias("keep_perplexity"),
            F.col("n").alias("n_docs"),
            F.round(100.0 * F.col("n") / F.col("nt"), 2).alias(
                "share_pct"
            ),
            "kappa_hr_milli",
            "kappa_hp_milli",
            "kappa_rp_milli",
        )
        .orderBy("keep_heuristic", "keep_repetition", "keep_perplexity")
    )


# ---- q437: unigram-LM vocabulary pruning round -------------------------
_Q437_PRUNE_PCT = 40  # prune the lowest-loss X% of used multi-char pieces


def _ulm_prune_ranked(v1: DataFrame) -> DataFrame:
    """q437's loss pricing at the bounded vocab grain: every USED
    multi-char piece with all chars priced in v1 gets
    loss = cnt1 · (spell − c1) and a deterministic rank (shared by
    q437's report and q445's executed prune)."""
    multi = v1.filter(F.length("piece") >= 2).select(
        "piece", "cnt1", "c1"
    )
    chars = multi.select(
        "piece",
        F.explode(
            F.expr(
                "transform(sequence(1, length(piece)),"
                " i -> substr(piece, i, 1))"
            )
        ).alias("ch"),
    )
    cv1 = v1.select(F.col("piece").alias("ch"), F.col("c1").alias("cc1"))
    spell = (
        chars.join(cv1, "ch")
        .groupBy("piece")
        .agg(
            F.sum("cc1").cast("long").alias("spell_micro"),
            F.count(F.lit(1)).cast("long").alias("n_chars_priced"),
        )
    )
    loss = (
        multi.join(spell, "piece")
        .filter(F.col("n_chars_priced") == F.length("piece"))
        .select(
            "piece",
            "cnt1",
            "c1",
            "spell_micro",
            (F.col("cnt1") * (F.col("spell_micro") - F.col("c1"))).alias(
                "loss_micro"
            ),
        )
    )
    wr = Window.orderBy("loss_micro", "piece")
    return loss.select(
        "*",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("nm"),
    )


def _q437_oracle() -> str:
    return _q424_oracle_ctes() + f"""
    , multi AS (
        SELECT v1.piece, v1.cnt1, v1.c1
        FROM v1 WHERE length(v1.piece) >= 2
    ),
    spell AS (
        SELECT m.piece,
               CAST(sum(cv1.c1) AS BIGINT) AS spell_micro,
               CAST(count(*) AS BIGINT) AS n_chars_priced
        FROM (SELECT piece, unnest(list_transform(
                  range(1, length(piece) + 1), i -> piece[i]))
                  AS ch FROM multi) m
        JOIN v1 cv1 ON cv1.piece = m.ch
        GROUP BY m.piece
    ),
    loss AS (
        SELECT m.piece, m.cnt1, m.c1, s.spell_micro,
               m.cnt1 * (s.spell_micro - m.c1) AS loss_micro
        FROM multi m JOIN spell s USING (piece)
        WHERE s.n_chars_priced = length(m.piece)
    ),
    ranked AS (
        SELECT *, row_number() OVER (ORDER BY loss_micro, piece) AS rn,
               count(*) OVER () AS nm
        FROM loss
    )
    SELECT piece, cnt1, c1 AS cost1_micro, spell_micro, loss_micro,
           rn <= nm * {_Q437_PRUNE_PCT} // 100 AS pruned,
           CAST(nm AS BIGINT) AS n_multi_priced,
           CAST(nm * {_Q437_PRUNE_PCT} // 100 AS BIGINT) AS n_pruned
    FROM ranked
    ORDER BY loss_micro DESC, piece
    LIMIT 25
    """


@register("q437_unigram_lm_prune", oracle=_q437_oracle())
def q437_unigram_lm_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNIGRAM-LM vocabulary PRUNING — the other half of the
    SentencePiece EM loop (q424 fits; this shrinks): every USED
    multi-char piece is priced by its likelihood LOSS if removed,
    upper-bounded by the character spell-out — loss(s) = cnt1(s) ·
    (Σ_{{c∈s}} cost1(c) − cost1(s)) in exact integer micro-nats
    (the optimal re-segmentation can only beat spelling by chars,
    so the bound is sound and monotone in what pruning actually
    costs). The bottom {_Q437_PRUNE_PCT}% by loss are marked pruned
    (integer order-statistic cut, deterministic tie-break) — the
    SentencePiece shrink step with its per-piece evidence in-row.
    Pieces whose characters aren't all in the fitted model are
    excluded identically in both engines (a char never used by any
    Viterbi path has no next-model cost).

    Scale: everything after q424's machinery lives at the bounded
    vocab grain (≤{_ULM_TOPV} multi-char pieces × ≤{_ULM_MAXP}
    chars); the loss join and the percentile cut shuffle hundreds
    of rows, not the corpus.
    """
    m = _ulm_model(spark, sf_dir)
    ranked = _ulm_prune_ranked(m["v1"])
    return (
        ranked.select(
            "piece",
            "cnt1",
            F.col("c1").alias("cost1_micro"),
            "spell_micro",
            "loss_micro",
            F.expr(f"rn <= nm * {_Q437_PRUNE_PCT} div 100").alias(
                "pruned"
            ),
            F.col("nm").cast("long").alias("n_multi_priced"),
            F.expr(f"CAST(nm * {_Q437_PRUNE_PCT} div 100 AS BIGINT)").alias(
                "n_pruned"
            ),
        )
        .orderBy(F.desc("loss_micro"), "piece")
        .limit(25)
    )


# ---- q441: per-language tokenizer fertility ----------------------------
def _q441_oracle() -> str:
    return _q424_oracle_ctes() + f"""
    , seglen AS (
        SELECT w, CAST(len(ps) AS BIGINT) AS n_pieces
        FROM back WHERE pos = 0
    ),
    wl AS (
        SELECT lang, substr(word, 1, {_ULM_MAXW}) AS w,
               CAST(count(*) AS BIGINT) AS f
        FROM (SELECT lang,
                     unnest(string_split_regex(lower(text), '[^a-z]+'))
                         AS word
              FROM documents)
        WHERE word <> ''
        GROUP BY lang, substr(word, 1, {_ULM_MAXW})
    )
    SELECT wl.lang,
           CAST(sum(wl.f) AS BIGINT) AS n_words,
           CAST(count(*) AS BIGINT) AS n_distinct_words,
           CAST(round(1000.0 * sum(wl.f * sl.n_pieces) / sum(wl.f))
                AS BIGINT) AS pieces_per_word_milli,
           CAST(round(1000.0 * sum(wl.f * length(wl.w))
                      / sum(wl.f * sl.n_pieces)) AS BIGINT)
               AS chars_per_piece_milli
    FROM wl JOIN seglen sl USING (w)
    GROUP BY wl.lang
    ORDER BY wl.lang
    """


@register("q441_tokenizer_fertility_by_lang", oracle=_q441_oracle())
def q441_tokenizer_fertility_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TOKENIZER FERTILITY by language — the multilingual-equity
    audit every shared-vocabulary tokenizer owes its users: under
    q424's fitted unigram model, how many pieces does a word cost
    per language (fertility = Σf·|seg| / Σf, milli-pinned) and how
    many characters ride in each piece? High-fertility languages pay
    more sequence length for the same text — the compute-equity gap
    the multilingual-NLP literature measures — and because the vocab
    here is fitted on the pooled corpus, any language whose word
    stock diverges from the pool shows up immediately. Segmentations
    come from the SAME integer-cost Viterbi as q424 (word-grain,
    computed once); the per-language table is a (lang, word)
    frequency join over it.

    Scale: the corpus collapses once to (lang × word) and word
    grains; the fertility rollup is |langs| rows; everything
    downstream of the q424 machinery is bounded joins — no second
    corpus pass.
    """
    m = _ulm_model(spark, sf_dir)
    seg = m["seg_sizes"]
    d = load(spark, sf_dir, "documents")
    wl = (
        d.select(
            "lang",
            F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias(
                "word"
            ),
        )
        .filter(F.col("word") != "")
        .select("lang", F.substring("word", 1, _ULM_MAXW).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    return (
        wl.join(seg, "w")
        .groupBy("lang")
        .agg(
            F.sum("f").cast("long").alias("n_words"),
            F.count(F.lit(1)).cast("long").alias("n_distinct_words"),
            F.round(
                1000.0
                * F.sum(F.col("f") * F.col("n_pieces"))
                / F.sum("f")
            )
            .cast("long")
            .alias("pieces_per_word_milli"),
            F.round(
                1000.0
                * F.sum(F.col("f") * F.length("w"))
                / F.sum(F.col("f") * F.col("n_pieces"))
            )
            .cast("long")
            .alias("chars_per_piece_milli"),
        )
        .orderBy("lang")
    )


# ---- q445: unigram-LM prune EXECUTED + re-fit (bound audit) -------------
def _q445_oracle() -> str:
    big = _ULM_BIG
    mp = _ULM_MAXP
    fwd_terms = ", ".join(
        f"CASE WHEN {l} <= j + 1 THEN dl[j + 1 - {l} + 1]"
        f" + coalesce(cv[(j + 1 - {l}) * {mp} + {l}], {big})"
        f" ELSE {big} END"
        for l in range(1, mp + 1)
    )
    return _q424_oracle_ctes() + f"""
    , multi AS (
        SELECT v1.piece, v1.cnt1, v1.c1
        FROM v1 WHERE length(v1.piece) >= 2
    ),
    spell AS (
        SELECT m.piece,
               CAST(sum(cv1.c1) AS BIGINT) AS spell_micro,
               CAST(count(*) AS BIGINT) AS n_chars_priced
        FROM (SELECT piece, unnest(list_transform(
                  range(1, length(piece) + 1), i -> piece[i]))
                  AS ch FROM multi) m
        JOIN v1 cv1 ON cv1.piece = m.ch
        GROUP BY m.piece
    ),
    loss AS (
        SELECT m.piece, m.cnt1, m.c1, s.spell_micro,
               m.cnt1 * (s.spell_micro - m.c1) AS loss_micro
        FROM multi m JOIN spell s USING (piece)
        WHERE s.n_chars_priced = length(m.piece)
    ),
    ranked AS (
        SELECT *, row_number() OVER (ORDER BY loss_micro, piece) AS rn,
               count(*) OVER () AS nm
        FROM loss
    ),
    pruned AS (
        SELECT piece, loss_micro FROM ranked
        WHERE rn <= nm * {_Q437_PRUNE_PCT} // 100
    ),
    npr AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(coalesce(sum(loss_micro), 0) AS BIGINT) AS s
            FROM pruned),
    surv AS (
        SELECT v1.piece, v1.c1 FROM v1
        ANTI JOIN pruned USING (piece)
    ),
    nk AS (SELECT CAST(count(*) AS BIGINT) AS n FROM surv),
    wc2 AS (
        SELECT g.w, g.f, list(surv.c1 ORDER BY (g.i - 1) * {mp} + g.l)
                   AS cv
        FROM (SELECT w, f, i.i AS i, l.l AS l FROM words,
                   LATERAL (SELECT unnest(range(1, {_ULM_MAXW} + 1))
                            AS i) i,
                   LATERAL (SELECT unnest(range(1, {mp} + 1)) AS l) l) g
        LEFT JOIN surv
          ON surv.piece = substr(g.w, g.i, g.l)
         AND length(substr(g.w, g.i, g.l)) = g.l
        GROUP BY g.w, g.f
    ),
    fwd2 AS (
        SELECT w, f, cv, 0 AS j, [CAST(0 AS BIGINT)] AS dl FROM wc2
        UNION ALL
        SELECT w, f, cv, j + 1, list_append(dl, least({fwd_terms}))
        FROM fwd2 WHERE j < length(w)
    ),
    done2 AS (SELECT w, f, dl FROM fwd2 WHERE j = length(w)),
    ll2 AS (SELECT CAST(sum(f * dl[length(w) + 1]) AS BIGINT) AS v
            FROM done2)
    SELECT npr.n AS n_pruned, nk.n AS n_kept_pieces,
           ll1.v AS ll_ref_micro, ll2.v AS ll_pruned_micro,
           ll2.v - ll1.v AS degrade_micro,
           npr.s AS sum_loss_bound_micro,
           (ll2.v - ll1.v) <= npr.s AS bound_ok,
           npr.s - (ll2.v - ll1.v) AS bound_slack_micro
    FROM npr, nk, ll1, ll2
    """


@register("q445_unigram_lm_prune_refit", oracle=_q445_oracle())
def q445_unigram_lm_prune_refit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """UNIGRAM-LM prune EXECUTED + re-fit — the loop closure that
    turns q437's spell-out bound into an AUDITED claim (r12 verdict
    item #7): fit (q424's EM machinery), mark the bottom
    {_Q437_PRUNE_PCT}% of priced multi-char pieces by loss (q437's
    cut, exactly), then RE-RUN the Viterbi E-step with the pruned
    vocabulary (survivor costs c1 fixed) and compare corpus
    likelihoods. The output gates the whole algebra: degrade =
    ll_pruned − ll_ref must be ≤ Σ loss bounds of the pruned pieces
    (sound because the old segmentation with each pruned occurrence
    spelled out by its chars — all priced, hence all surviving — is
    a feasible segmentation costing exactly ll_ref + Σ losses, and
    Viterbi can only do better; degrade may even be NEGATIVE when
    re-segmentation under the M-step costs beats the stale E-step
    paths). bound_slack_micro records how loose the spell-out bound
    ran on this corpus — the audited margin.

    Scale: q424's economics twice (word-table grain, map-side DP
    folds, bounded broadcast vocab); the prune arithmetic is vocab-
    grain; the comparison is two scalars. No corpus pass is added —
    the E-step re-run IS the second pass a real SentencePiece shrink
    iteration performs.
    """
    m = _ulm_model(spark, sf_dir)
    v1, words, ll1 = m["v1"], m["words"], m["ll1"]
    ranked = _ulm_prune_ranked(v1)
    pruned = ranked.filter(
        F.expr(f"rn <= nm * {_Q437_PRUNE_PCT} div 100")
    ).select("piece", "loss_micro")
    pruned = pruned.localCheckpoint(eager=True)  # vocab-grain, reused 3x
    surv = v1.join(pruned, "piece", "left_anti").select(
        "piece", F.col("c1").alias("cost")
    )
    wd2 = _ulm_estep(words, surv)
    ll2 = wd2.agg(
        F.sum(F.col("f") * F.expr("element_at(dl, length(w) + 1)"))
        .cast("long")
        .alias("ll2")
    )
    npr = pruned.agg(
        F.count(F.lit(1)).cast("long").alias("n_pruned"),
        F.coalesce(F.sum("loss_micro"), F.lit(0))
        .cast("long")
        .alias("sum_loss_bound_micro"),
    )
    nk = surv.agg(F.count(F.lit(1)).cast("long").alias("n_kept_pieces"))
    return (
        npr.crossJoin(F.broadcast(nk))
        .crossJoin(F.broadcast(ll1))
        .crossJoin(F.broadcast(ll2))
        .select(
            "n_pruned",
            "n_kept_pieces",
            F.col("ll1_micro").alias("ll_ref_micro"),
            F.col("ll2").alias("ll_pruned_micro"),
            (F.col("ll2") - F.col("ll1_micro")).alias("degrade_micro"),
            "sum_loss_bound_micro",
            (
                (F.col("ll2") - F.col("ll1_micro"))
                <= F.col("sum_loss_bound_micro")
            ).alias("bound_ok"),
            (
                F.col("sum_loss_bound_micro")
                - (F.col("ll2") - F.col("ll1_micro"))
            ).alias("bound_slack_micro"),
        )
    )


# ---- q452: cross-lingual LM confusion matrix -----------------------------
@register(
    "q452_crosslingual_lm_matrix",
    oracle=f"""
    WITH docs AS MATERIALIZED (
        SELECT doc_id, lang, {_TOKS} AS toks FROM documents
        WHERE len({_TOKS}) >= 2
    ),
    bigrams AS MATERIALIZED (
        SELECT lang, toks[i] AS prev, toks[i + 1] AS cur,
               CAST(count(*) AS BIGINT) AS n
        FROM (SELECT lang, toks, unnest(range(1, len(toks))) AS i
              FROM docs)
        GROUP BY lang, prev, cur
    ),
    ctx AS MATERIALIZED (
        SELECT lang, prev, CAST(sum(n) AS BIGINT) AS c_a
        FROM bigrams GROUP BY lang, prev
    ),
    vocab AS MATERIALIZED (
        SELECT lang, CAST(count(DISTINCT t) AS BIGINT) AS v
        FROM (SELECT lang, unnest(toks) AS t FROM docs) GROUP BY lang
    ),
    langs AS (SELECT DISTINCT lang FROM docs),
    scored AS MATERIALIZED (
        -- every eval-side bigram TYPE (with its count) under every
        -- model: add-one smoothing handles unseen bigrams AND unseen
        -- contexts in one formula (c_ab=0, c_a=0 -> 1/V)
        SELECT m.lang AS model_lang, e.lang AS eval_lang, e.n,
               CAST(round(1000000 * ln(
                   (coalesce(bg.n, 0) + 1)
                   / CAST(coalesce(cx.c_a, 0) + v.v AS DOUBLE)))
                   AS BIGINT) AS q_lp
        FROM bigrams e
        CROSS JOIN langs m
        LEFT JOIN bigrams bg ON bg.lang = m.lang
                            AND bg.prev = e.prev AND bg.cur = e.cur
        LEFT JOIN ctx cx ON cx.lang = m.lang AND cx.prev = e.prev
        JOIN vocab v ON v.lang = m.lang
    ),
    mat AS MATERIALIZED (
        SELECT model_lang, eval_lang,
               CAST(sum(n) AS BIGINT) AS n_bigrams,
               CAST(round(CAST(-sum(n * q_lp) AS DOUBLE) / sum(n))
                    AS BIGINT) AS xent_micro
        FROM scored GROUP BY model_lang, eval_lang
    )
    SELECT m.model_lang, m.eval_lang, m.n_bigrams, m.xent_micro,
           m.xent_micro - s.xent_micro AS excess_vs_self_micro,
           m.xent_micro = (SELECT min(x2.xent_micro) FROM mat x2
                           WHERE x2.eval_lang = m.eval_lang)
               AS is_best_model
    FROM mat m JOIN mat s
      ON s.eval_lang = m.eval_lang AND s.model_lang = m.eval_lang
    ORDER BY m.eval_lang, m.model_lang
    """,
)
def q452_crosslingual_lm_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CROSS-LINGUAL LM confusion matrix — the language-distance
    table multilingual data curation reads before sharing tokenizers
    or mixing corpora: one add-one bigram LM per language (q330's
    device, per-lang), every language's bigram stream scored under
    EVERY model. The diagonal should win its column
    (is_best_model) — when it doesn't, two languages are near-mutual
    (shared script/loanwords) or a label set is dirty (q331's langid
    failure mode seen from the LM side); excess_vs_self_micro is the
    KL-flavored penalty for serving language e from model m — the
    number that justifies (or kills) a shared multilingual model.
    One smoothing formula covers unseen bigrams AND unseen contexts
    ((c+1)/(c_a+V) with both coalesced to 0 — q300's recipe), so the
    matrix is total: no OOV row is dropped.

    Scale: the corpus collapses once to (lang × bigram-type) counts;
    the cross-scoring is |langs| × that bounded relation (map-side
    fan-out of a vocab²-grain table, never the corpus); the matrix
    is |langs|² rows of integer micro-nats.
    """
    d = load(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    docs = d.select("lang", toks.alias("toks")).filter(
        F.size("toks") >= 2
    )
    bigrams = (
        docs.select(
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> struct(element_at(toks, i) AS prev,"
                    " element_at(toks, i + 1) AS cur))"
                )
            ).alias("b"),
        )
        .groupBy("lang", "b.prev", "b.cur")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    bigrams = bigrams.localCheckpoint(eager=True)  # vocab²-grain, reused
    ctx = bigrams.groupBy("lang", "prev").agg(
        F.sum("n").cast("long").alias("c_a")
    )
    vocab = (
        docs.select("lang", F.explode("toks").alias("t"))
        .groupBy("lang")
        .agg(F.countDistinct("t").cast("long").alias("v"))
    )
    langs = bigrams.select("lang").distinct().select(
        F.col("lang").alias("model_lang")
    )
    e = bigrams.select(
        F.col("lang").alias("eval_lang"), "prev", "cur", "n"
    )
    bg_m = bigrams.select(
        F.col("lang").alias("model_lang"),
        "prev",
        "cur",
        F.col("n").alias("c_ab"),
    )
    ctx_m = ctx.select(
        F.col("lang").alias("model_lang"), "prev", "c_a"
    )
    v_m = vocab.select(F.col("lang").alias("model_lang"), "v")
    scored = (
        e.crossJoin(F.broadcast(langs))
        .join(bg_m, ["model_lang", "prev", "cur"], "left")
        .join(ctx_m, ["model_lang", "prev"], "left")
        .join(F.broadcast(v_m), "model_lang")
        .select(
            "model_lang",
            "eval_lang",
            "n",
            F.expr(
                "CAST(round(1000000 * ln((coalesce(c_ab, 0) + 1)"
                " / CAST(coalesce(c_a, 0) + v AS DOUBLE))) AS BIGINT)"
            ).alias("q_lp"),
        )
    )
    mat = scored.groupBy("model_lang", "eval_lang").agg(
        F.sum("n").cast("long").alias("n_bigrams"),
        F.expr(
            "CAST(round(CAST(-sum(n * q_lp) AS DOUBLE) / sum(n))"
            " AS BIGINT)"
        ).alias("xent_micro"),
    )
    mat = mat.localCheckpoint(eager=True)  # |langs|² rows, reused 3x
    self_m = mat.where(
        F.col("model_lang") == F.col("eval_lang")
    ).select(
        F.col("eval_lang").alias("e2"),
        F.col("xent_micro").alias("self_xent"),
    )
    best = mat.groupBy("eval_lang").agg(
        F.min("xent_micro").alias("best_xent")
    )
    return (
        mat.join(
            F.broadcast(self_m), mat["eval_lang"] == self_m["e2"]
        )
        .join(F.broadcast(best), "eval_lang")
        .select(
            "model_lang",
            "eval_lang",
            "n_bigrams",
            "xent_micro",
            (F.col("xent_micro") - F.col("self_xent")).alias(
                "excess_vs_self_micro"
            ),
            (F.col("xent_micro") == F.col("best_xent")).alias(
                "is_best_model"
            ),
        )
        .orderBy("eval_lang", "model_lang")
    )


# ---- q453: BPE merge-depth scaling (16 merges + sizing curve) -----------
_Q453_STEPS = 16


def _q453_oracle() -> str:
    # chained rounds MUST be MATERIALIZED: w{t} is referenced by both
    # p{t+1} and w{t+1}, so inlined CTEs replay the whole prefix 2^t
    # times (fine at q383's 5 steps, fatal at 16)
    ctes = ["""w0 AS MATERIALIZED (
        SELECT word, CAST(count(*) AS BIGINT) AS f,
               '  ' || regexp_replace(word, '(.)', '\\1  ', 'g') AS repr
        FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z]+'))
                     AS word
              FROM documents)
        WHERE word <> '' GROUP BY word
    ),
    tk0 AS MATERIALIZED (
        SELECT CAST(sum(f * len(string_split(trim(repr), '  ')))
                    AS BIGINT) AS tok FROM w0
    )"""]
    for t in range(1, _Q453_STEPS + 1):
        ctes.append(f"""p{t} AS MATERIALIZED (
        SELECT pair, CAST(sum(f) AS BIGINT) AS cnt FROM (
            SELECT f, unnest(list_transform(range(1, len(s)),
                             i -> s[i] || ' ' || s[i + 1])) AS pair
            FROM (SELECT f, string_split(trim(repr), '  ') AS s
                  FROM w{t - 1})
        ) GROUP BY pair
    ),
    b{t} AS MATERIALIZED (
        SELECT pair, cnt FROM p{t} ORDER BY cnt DESC, pair LIMIT 1),
    w{t} AS MATERIALIZED (
        SELECT w.word, w.f,
               replace(w.repr, ' ' || replace(b.pair, ' ', '  ') || ' ',
                       ' ' || replace(b.pair, ' ', '') || ' ') AS repr
        FROM w{t - 1} w, b{t} b
    ),
    tk{t} AS MATERIALIZED (
        SELECT CAST(sum(f * len(string_split(trim(repr), '  ')))
                    AS BIGINT) AS tok FROM w{t}
    )""")
    union = " UNION ALL ".join(
        f"SELECT CAST({t} AS BIGINT) AS step, pair AS merged_pair,"
        f" replace(pair, ' ', '') AS new_symbol, cnt AS pair_count,"
        f" tk{t}.tok AS corpus_tokens_after,"
        f" tk{t - 1}.tok - tk{t}.tok AS tokens_saved"
        f" FROM b{t}, tk{t}, tk{t - 1}"
        for t in range(1, _Q453_STEPS + 1)
    )
    return f"WITH {', '.join(ctes)} {union} ORDER BY step"


@register("q453_bpe_merge_depth_curve", oracle=_q453_oracle())
def q453_bpe_merge_depth_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BPE MERGE-DEPTH scaling curve — q383's trainer run to
    {_Q453_STEPS} merges with the sizing evidence a vocabulary
    decision needs in-row: per merge step, the learned pair, its
    weighted count, the corpus token count AFTER the rewrite, and
    the realized tokens_saved. pair_count counts every adjacent
    occurrence while the rewrite merges the left-to-right
    NON-OVERLAPPING scan, so tokens_saved ≤ pair_count with equality
    iff no occurrence overlaps another ('a a a' has two 'a a' pairs
    but one merge) — the gap is in the data, and the cumulative
    tokens_saved trajectory is the diminishing-returns curve that
    says when to stop growing the vocab (the knee every tokenizer
    paper plots). The merge loop, two-space sentinel layout, and
    tie-breaks are exactly q383's (shared helpers); the 16-round
    oracle chain is MATERIALIZED per round — inlined CTEs would
    replay the prefix 2^t times.

    Scale: q383's economics × {_Q453_STEPS} — each round is a
    map-side pair explode + hash agg over the |vocab|-grain word
    table, a 1-row argmax broadcast back, and a map-side rewrite;
    the table is localCheckpointed per round so round t never
    replays rounds 1..t−1. Merge depth scales the round COUNT, not
    any relation's size.
    """
    d = load(spark, sf_dir, "documents")
    words = _bpe_word_table(d).localCheckpoint()
    # Degenerate-input fast path (r16): with no words there is no
    # best pair at any depth, so every step contributes 0 rows and
    # the result is the 0-row frame below BY CONSTRUCTION (best =
    # limit(1) of an empty pair table; every output row crossJoins
    # best) — but the loop would still pay {_Q453_STEPS} eager
    # localCheckpoint rounds to find that out (~2 s/round on empty
    # partitions/days at scale, measured 34 s in the empty-corpus
    # gate). Identical result, exact output schema.
    if words.isEmpty():
        return spark.createDataFrame(
            [],
            "step bigint, merged_pair string, new_symbol string, "
            "pair_count bigint, corpus_tokens_after bigint, "
            "tokens_saved bigint",
        )

    def tok_count(w):
        return w.select(
            F.sum(
                F.col("f")
                * F.size(F.split(F.trim(F.col("repr")), "  "))
            ).cast("long").alias("tok")
        )

    prev_tok = tok_count(words)
    outs = []
    for step in range(1, _Q453_STEPS + 1):
        best = (
            _bpe_pair_counts(words)
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
        )
        words = _bpe_apply_merge(words, best, ["f"]).localCheckpoint()
        cur_tok = tok_count(words)
        outs.append(
            best.select(
                F.lit(step).cast("long").alias("step"),
                F.col("pair").alias("merged_pair"),
                F.regexp_replace(F.col("pair"), " ", "").alias(
                    "new_symbol"
                ),
                F.col("cnt").alias("pair_count"),
            )
            .crossJoin(
                F.broadcast(
                    cur_tok.select(
                        F.col("tok").alias("corpus_tokens_after")
                    )
                )
            )
            .crossJoin(
                F.broadcast(prev_tok.select(F.col("tok").alias("pt")))
            )
            .select(
                "step",
                "merged_pair",
                "new_symbol",
                "pair_count",
                "corpus_tokens_after",
                (F.col("pt") - F.col("corpus_tokens_after")).alias(
                    "tokens_saved"
                ),
            )
        )
        prev_tok = cur_tok
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("step")


# ---- q454: curriculum-batch source-mixture audit -------------------------
_Q454_BATCHES = 8


@register(
    "q454_curriculum_mixture_audit",
    oracle=f"""
    WITH {_Q410_PERDOC_SQL},
    tiled AS (
        SELECT doc_id, source, xent_micro,
               ntile({_Q454_BATCHES}) OVER (ORDER BY xent_micro, doc_id)
                   AS batch
        FROM per_doc
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM per_doc),
    gshare AS (
        SELECT source, CAST(count(*) AS BIGINT) AS gn FROM per_doc
        GROUP BY source
    ),
    cells AS (
        SELECT batch, source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(round(avg(xent_micro)) AS BIGINT)
                   AS batch_mean_xent_micro
        FROM tiled GROUP BY batch, source
    ),
    bsz AS (
        SELECT batch, CAST(sum(n_docs) AS BIGINT) AS bn FROM cells
        GROUP BY batch
    )
    SELECT CAST(c.batch AS BIGINT) AS batch, c.source, c.n_docs,
           CAST(round(1000.0 * c.n_docs / bsz.bn) AS BIGINT)
               AS share_milli,
           CAST(round(1000.0 * g.gn / tot.n) AS BIGINT)
               AS global_share_milli,
           CAST(round(1000.0 * c.n_docs / bsz.bn)
                - round(1000.0 * g.gn / tot.n) AS BIGINT) AS dev_milli,
           c.batch_mean_xent_micro
    FROM cells c
    JOIN bsz USING (batch)
    JOIN gshare g ON g.source = c.source
    CROSS JOIN tot
    ORDER BY batch, c.source
    """,
)
def q454_curriculum_mixture_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CURRICULUM-BATCH mixture audit — the difficulty-source
    confound check a curriculum schedule needs before anyone trains
    on it: order the corpus by per-document LM cross-entropy (q410's
    shared difficulty signal, integer micro-nats) into
    {_Q454_BATCHES} difficulty-ascending batches via the exact
    two-pass global ntile (operators/ranking — no single-partition
    window at corpus grain), then audit each batch's SOURCE mixture
    against the global shares. A source whose text is systematically
    easy floods the early batches (dev_milli ≫ 0 there and ≪ 0
    late) — the known curriculum-learning failure where "easy first"
    silently becomes "source X first" and the model sees a skewed
    distribution exactly when it is most plastic. Per-cell mean
    difficulty rides along, so monotonicity of the curriculum itself
    is auditable in the same table.

    Scale: the difficulty signal is q410's one corpus pass + vocab²
    model join; the tiling is the two-pass global rank (partitioned
    windows only); the audit is |batches| × |sources| cells.
    """
    from g_etl_spark.operators import ranking as R

    per_doc = _q410_per_doc(spark, sf_dir)
    tiled = R.global_ntile_twopass(
        per_doc,
        _Q454_BATCHES,
        ["xent_micro", "doc_id"],
        F.floor(F.col("xent_micro") / 100000).cast("long"),
        out="batch",
    )
    tot = per_doc.agg(F.count(F.lit(1)).cast("long").alias("n"))
    gshare = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("gn")
    )
    cells = tiled.groupBy("batch", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.avg("xent_micro")).cast("long").alias(
            "batch_mean_xent_micro"
        ),
    )
    bsz = cells.groupBy("batch").agg(
        F.sum("n_docs").cast("long").alias("bn")
    )
    return (
        cells.join(F.broadcast(bsz), "batch")
        .join(F.broadcast(gshare), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("batch").cast("long").alias("batch"),
            "source",
            "n_docs",
            F.round(1000.0 * F.col("n_docs") / F.col("bn"))
            .cast("long")
            .alias("share_milli"),
            F.round(1000.0 * F.col("gn") / F.col("n"))
            .cast("long")
            .alias("global_share_milli"),
            (
                F.round(1000.0 * F.col("n_docs") / F.col("bn"))
                - F.round(1000.0 * F.col("gn") / F.col("n"))
            ).cast("long").alias("dev_milli"),
            "batch_mean_xent_micro",
        )
        .orderBy("batch", "source")
    )


# ---- q469: Luhn-validated card-number detection --------------------------
def _luhn16_sql(s: str) -> str:
    """Luhn checksum validity of a 16-digit string column — the same
    expression TEXT for both engines (fixed length unrolls the
    position loop into 16 integer terms; odd positions from the left
    are doubled at even length)."""
    terms = []
    for i in range(1, 17):
        d = f"CAST(substr({s}, {i}, 1) AS INT)"
        if i % 2 == 1:
            terms.append(
                f"(CASE WHEN 2 * {d} > 9 THEN 2 * {d} - 9"
                f" ELSE 2 * {d} END)"
            )
        else:
            terms.append(d)
    return f"(({' + '.join(terms)}) % 10 = 0)"


_Q469_CORPUS = """
    SELECT doc_id, source,
           text || ' card 453900' || lpad(CAST(doc_id AS VARCHAR), 9, '0')
                || CAST(doc_id % 10 AS VARCHAR) AS text
    FROM documents WHERE doc_id < 300
"""


@register(
    "q469_luhn_card_detection",
    oracle=f"""
    WITH corpus AS ({_Q469_CORPUS}),
    cand AS (
        SELECT doc_id, source,
               unnest(regexp_extract_all(text, '[0-9]{{16}}')) AS num
        FROM corpus
    ),
    judged AS (
        SELECT doc_id, source, num, {_luhn16_sql("num")} AS ok
        FROM cand
    )
    SELECT c.source,
           CAST(count(DISTINCT c.doc_id) AS BIGINT) AS n_docs,
           CAST(count(j.num) AS BIGINT) AS n_candidates,
           CAST(sum(CASE WHEN j.ok THEN 1 ELSE 0 END) AS BIGINT)
               AS n_luhn_valid,
           CAST(round(1000.0 * sum(CASE WHEN j.ok THEN 1 ELSE 0 END)
                      / greatest(count(j.num), 1)) AS BIGINT)
               AS valid_milli,
           md5(coalesce(array_to_string(
                   list_sort(list(j.num) FILTER (j.ok)), ','), ''))
               AS valid_digest
    FROM (SELECT DISTINCT doc_id, source FROM corpus) c
    LEFT JOIN judged j USING (doc_id, source)
    GROUP BY c.source ORDER BY c.source
    """,
)
def q469_luhn_card_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LUHN-VALIDATED card-number detection — the checksum step that
    separates a real PII hit from sixteen random digits (q46's regex
    pass alone flags both; production redaction pipelines gate on
    the check digit precisely to keep the false-positive rate from
    swamping review queues). Deterministic planted corpus (the q46
    device): every doc < 300 carries one synthetic 16-digit
    candidate whose last digit is doc_id-derived, so ~10% pass Luhn
    by construction and the validator provably REJECTS the rest —
    per source: docs, regex candidates, checksum-valid count and
    rate, and an order-independent digest of the validated numbers
    (the review-queue content, hash-pinned). The checksum is the
    fixed-length Luhn unroll — 16 integer terms, identical
    expression text in both engines, no UDF.

    Scale: regex extraction + 16 integer ops per candidate, all
    map-side in whole-stage codegen; the rollup is |sources|-grain.
    The validator composes with q46's redaction (validate, then
    redact only validated spans) without changing either plan.
    """
    d = (
        load(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 300)
        .select(
            "doc_id",
            "source",
            F.concat(
                F.col("text"),
                F.lit(" card 453900"),
                F.lpad(F.col("doc_id").cast("string"), 9, "0"),
                (F.col("doc_id") % 10).cast("string"),
            ).alias("text"),
        )
    )
    cand = d.select(
        "doc_id",
        "source",
        F.explode_outer(
            F.expr("regexp_extract_all(text, '[0-9]{16}', 0)")
        ).alias("num"),
    )
    judged = cand.withColumn(
        "ok", F.when(F.col("num").isNotNull(), F.expr(_luhn16_sql("num")))
    )
    return (
        judged.groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count("num").cast("long").alias("n_candidates"),
            F.sum(F.when(F.col("ok"), 1).otherwise(0))
            .cast("long")
            .alias("n_luhn_valid"),
            F.round(
                1000.0
                * F.sum(F.when(F.col("ok"), 1).otherwise(0))
                / F.greatest(F.count("num"), F.lit(1))
            ).cast("long").alias("valid_milli"),
            F.md5(
                F.array_join(
                    F.array_sort(
                        F.collect_list(F.when(F.col("ok"), F.col("num")))
                    ),
                    ",",
                )
            ).alias("valid_digest"),
        )
        .orderBy("source")
    )
