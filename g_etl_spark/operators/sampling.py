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
