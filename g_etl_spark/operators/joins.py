"""Skew-resilient join/aggregate utilities.

AQE's skew-join split (on in session.py) handles most skew at
runtime; these explicit strategies cover the cases AQE can't — skewed
GROUP BY keys, and broadcast-ineligible skewed joins on clusters with
AQE disabled.

≙ task rubric: "skewed keys → salting or AQE skew-join". The grid
index is the engine's natural skew source (dense urban cells vs empty
wilderness), so the two-phase salted aggregate is the load-bearing
pattern here.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def auto_salt_buckets(
    df: DataFrame,
    keys: Sequence[str],
    rows_per_bucket: int = 1_000_000,
    max_buckets: int = 256,
) -> int:
    """Self-tuning salt factor (round-9): size the salt from the
    MEASURED hottest key instead of a guessed constant — one map-side
    combining count to the key rollup, then
    ceil(max_key_rows / rows_per_bucket), clamped to
    [1, max_buckets].

    The probe costs one scan of the key projection (map-side
    combining, |keys|-row exchange) — negligible next to the skewed
    join/agg it tunes, and the number it returns is the one a human
    would derive from q278's fan-out diagnostics by hand. A return of
    1 means "no salting needed" (the hottest key already fits a
    task), so callers can skip the salt column entirely.

    `rows_per_bucket` is the per-task row budget: at 100 TB pick it
    so one salted slice of the hottest key fits an executor's shuffle
    buffer (the 1M default suits ~100-byte rows / 128 MB targets).
    """
    import math

    hot = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(F.max("_n"))
        .collect()[0][0]
    )
    if not hot:
        return 1
    return max(1, min(int(max_buckets), math.ceil(hot / rows_per_bucket)))


def salted_count(
    df: DataFrame, keys: Sequence[str], salt_buckets: int | str = 16
) -> DataFrame:
    """Two-phase skew-safe COUNT: group on (key, salt) — spreading a
    hot key over ``salt_buckets`` reducers — then re-aggregate per
    key. Identical result to a direct groupBy count; bounded reducer
    input regardless of key skew.

    CAVEAT: the salt uses ``F.rand``, which is re-drawn when a task
    retries — safe ONLY for algebraic aggs (count/sum/min/max) where
    the final merge is salt-assignment-independent. Do NOT reuse this
    shape for aggs where row→bucket identity must be stable across
    retries (collect_set/list, first, any per-bucket sampling); salt
    with a deterministic hash (e.g. pmod(hash(*cols), buckets)) there.

    `salt_buckets="auto"` probes the hottest key via
    `auto_salt_buckets` and sizes the salt from the measurement.
    """
    if salt_buckets == "auto":
        salt_buckets = auto_salt_buckets(df, keys)
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, "_salt").agg(F.count(F.lit(1)).alias("_n"))
    return partial.groupBy(*keys).agg(F.sum("_n").cast("long").alias("n"))


def broadcast_salted_join(
    big: DataFrame, small: DataFrame, key: str, salt_buckets: int | str = 8
) -> DataFrame:
    """Skewed big⋈small equi-join without AQE: replicate the SMALL
    side per salt bucket, salt the big side, join on (key, salt) —
    each hot key's rows spread over ``salt_buckets`` tasks.

    Prefer plain F.broadcast(small) when the small side fits in
    memory; this shape is for the mid-size dim that broadcasts but
    whose probe side has pathological key skew.

    `salt_buckets="auto"` probes the hottest probe-side key via
    `auto_salt_buckets` and sizes the salt from the measurement."""
    if salt_buckets == "auto":
        salt_buckets = auto_salt_buckets(big, [key])
    salts = big.sparkSession.range(salt_buckets).select(
        F.col("id").cast("int").alias("_salt")
    )
    small_rep = small.crossJoin(F.broadcast(salts))
    big_salted = big.withColumn(
        "_salt", (F.rand(seed=7) * salt_buckets).cast("int")
    )
    return big_salted.join(
        F.broadcast(small_rep), on=[key, "_salt"], how="inner"
    ).drop("_salt")


def explain_has_skew_handling(df: DataFrame) -> bool:
    """True when AQE skew-join handling is available for this plan's
    session (diagnostic helper for operators that rely on it)."""
    s = df.sparkSession
    return (
        s.conf.get("spark.sql.adaptive.enabled") == "true"
        and s.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    )
