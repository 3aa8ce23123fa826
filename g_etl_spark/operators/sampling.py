"""Stratified deterministic sampling — corpus rebalancing primitives.

A training-data pipeline rarely samples uniformly: it caps
over-represented strata (per language / source / domain) and thins
the rest at controlled rates. Both primitives here are DETERMINISTIC
(md5-keyed, same rows every run on every engine) — `rand()`-based
sampling is nondeterministic across retries and engines, which
breaks reproducible corpus builds (and oracle checks).

Design for 100 TB:

- `stratified_rate` is map-only: a per-row hash compare against a
  per-stratum threshold. No shuffle, fully pushed into the scan
  stage; thinning 100 TB costs one pass.
- `stratified_quota` is a per-stratum top-k by hash (a bottom-k
  sketch per stratum). Spark ≥3.5 plans rank-filter windows as
  WindowGroupLimit: each map task keeps only its local top-k per
  stratum BEFORE the exchange, so the shuffle carries
  O(partitions × k), not the stratum's full row count — the skewed
  giant-stratum problem solves itself (tests/test_plans.py asserts
  the WindowGroupLimit node).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def _unit_hash(id_col: Column, nibbles: int = 8) -> Column:
    """Deterministic uniform-ish draw in hex-string space: the first
    ``nibbles`` hex chars of md5(id). Lexicographic compare on the
    lowercase hex is an order-preserving proxy for the numeric value
    in any engine."""
    return F.substring(F.md5(id_col.cast("string")), 1, nibbles)


def rate_threshold(rate: float, nibbles: int = 8) -> str:
    """Hex threshold t such that P[_unit_hash < t] ≈ rate."""
    space = 16**nibbles
    return format(min(int(rate * space), space - 1), f"0{nibbles}x")


def stratified_rate(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row with a per-stratum probability, deterministically
    (md5 of the id against a per-stratum hex threshold). Map-only."""
    thresh = F.lit(rate_threshold(default_rate))
    for stratum, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(stratum_col) == stratum, F.lit(rate_threshold(rate))
        ).otherwise(thresh)
    return df.filter(_unit_hash(F.col(id_col)) < thresh)


def stratified_quota(
    df: DataFrame, stratum_col: str, id_col: str, quota: int
) -> DataFrame:
    """Cap every stratum at ``quota`` rows — the kept rows are the
    stratum's bottom-k by md5(id) (stable under reruns AND under
    adding unrelated rows: a doc's survival depends only on its own
    hash rank). Ties broken by id for full determinism."""
    h = _unit_hash(F.col(id_col), 32)
    w = Window.partitionBy(stratum_col).orderBy(h, F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= quota)
        .drop("_rn")
    )


def _unit_hash_int(id_col: Column) -> Column:
    """Deterministic draw as an INTEGER in [0, 2^32): first 8 md5 hex
    chars parsed numerically. Mirrors DuckDB's
    ``CAST(CAST('0x' || substr(md5(id),1,8) AS UBIGINT) AS BIGINT)``
    so thresholds compare identically cross-engine."""
    return F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast("long")


def mixture_resample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    weights: dict[str, float],
) -> DataFrame:
    """Downsample to the LARGEST corpus matching a target mixture.

    Given target weights w_s (must cover every stratum), the largest
    feasible output size is N = min_s(n_s / w_s); each stratum keeps
    rate_s = w_s * N / n_s of its rows, deterministically
    (md5-integer threshold, like ``stratified_rate``). The classic
    domain-mixing step of an LLM data pipeline (cf. The Pile /
    DoReMi-style fixed mixtures): the scarcest stratum relative to
    its target weight is kept whole and everything else thins to
    match.

    Everything is computed IN the plan — counts, N, and rates live in
    a stratum-sized aggregate that broadcasts back onto the fact
    rows; no driver-side collect. Scale: one tiny agg + broadcast
    join + a map-only filter over the corpus.
    """
    w = F.lit(None).cast("double")
    for s, wt in sorted(weights.items()):
        w = F.when(F.col(stratum_col) == s, F.lit(float(wt))).otherwise(w)
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("_n"))
    counts = counts.withColumn("_w", w)
    # feasible size N = min_s(n_s/w_s) attached via an empty-frame
    # window (counts is stratum-sized — the single-partition window
    # touches #strata rows, not the corpus; a crossJoin with an agg
    # of the same frame would hit Spark's self-join ambiguity)
    n_target = F.min(F.col("_n") / F.col("_w")).over(Window.partitionBy())
    rates = counts.select(
        stratum_col,
        "_n",
        F.least(F.col("_w") * n_target / F.col("_n"), F.lit(1.0)).alias("_rate"),
    )
    thresh = F.floor(F.col("_rate") * F.lit(4294967296.0)).cast("long")
    return df.join(F.broadcast(rates), stratum_col).filter(
        _unit_hash_int(F.col(id_col)) < thresh
    )
