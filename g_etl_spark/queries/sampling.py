"""Stratified-sampling query family (corpus rebalancing surface).

Extends the engine's O4 sampling operator (reference `USING SAMPLE`,
ascii_map.py:207-231) from uniform to stratified — the shape an LLM
corpus build actually runs: cap the dominant language / thin each
source at its own rate, reproducibly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from g_etl_spark.operators import sampling as S
from g_etl_spark.queries import register
from g_etl_spark.tables import load

_QUOTA = 20

_RATES = {"en": 0.05, "zh": 0.25, "sv": 0.5}
_DEFAULT_RATE = 0.1


@register(
    "q48_stratified_quota",
    oracle=f"""
    SELECT lang, doc_id, source
    FROM (
        SELECT lang, doc_id, source,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents)
    WHERE rn <= {_QUOTA}
    ORDER BY lang, doc_id
    """,
)
def q48_stratified_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum quota sample: cap every language at {_QUOTA} docs,
    keeping each stratum's bottom-k by md5(doc_id)
    (operators/sampling.stratified_quota).

    Scale: plans as WindowGroupLimit — partial top-k per map task
    before the exchange, so a 90%-English corpus shuffles O(tasks×k)
    English rows, not all of them (asserted in tests/test_plans.py).
    """
    d = load(spark, sf_dir, "documents").select("lang", "doc_id", "source")
    return S.stratified_quota(d, "lang", "doc_id", _QUOTA).orderBy("lang", "doc_id")


@register(
    "q49_stratified_rates",
    oracle=f"""
    SELECT lang,
           count(*) AS n_sampled,
           round(avg(n_chars), 3) AS avg_chars
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
          CASE lang
            WHEN 'en' THEN '{S.rate_threshold(_RATES["en"])}'
            WHEN 'zh' THEN '{S.rate_threshold(_RATES["zh"])}'
            WHEN 'sv' THEN '{S.rate_threshold(_RATES["sv"])}'
            ELSE '{S.rate_threshold(_DEFAULT_RATE)}'
          END
    GROUP BY lang
    ORDER BY lang
    """,
)
def q49_stratified_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum rate thinning: deterministic md5-threshold keep
    rates per language (operators/sampling.stratified_rate), then a
    sanity rollup of what survived.

    Scale: the filter is map-only (no shuffle) and sits directly on
    the scan — thinning is one pass over the corpus; only the tiny
    per-language rollup shuffles.
    """
    d = load(spark, sf_dir, "documents")
    kept = S.stratified_rate(d, "lang", "doc_id", _RATES, _DEFAULT_RATE)
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.avg("n_chars"), 3).alias("avg_chars"),
        )
        .orderBy("lang")
    )
