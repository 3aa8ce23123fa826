"""Rollup helpers with exact/approximate distinct counting.

At 100 TB exact COUNT(DISTINCT) over high-cardinality keys is an
expand + double shuffle; approx_count_distinct (HyperLogLog++) is one
pass with fixed sketch memory per group. The engine's stats rollup
exposes the choice; relative error defaults to 2%.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def grid_stats_rollup(index: DataFrame, exact: bool = True, rsd: float = 0.02) -> DataFrame:
    """Per-cell rollup (≙ warehouse.grid_stats) with an approximate
    variant for scale: exact=False swaps countDistinct for HLL++."""
    nd = (
        F.countDistinct("dataset_id")
        if exact
        else F.approx_count_distinct("dataset_id", rsd=rsd)
    )
    return index.groupBy("grid_cell").agg(
        F.count(F.lit(1)).alias("object_count"),
        nd.alias("dataset_count"),
        F.sort_array(F.collect_set("dataset_id")).alias("datasets"),
    )


def approx_distinct_profile(df: DataFrame, cols: list[str], rsd: float = 0.02) -> DataFrame:
    """One-pass cardinality profile of many columns (the scan you run
    before choosing join/partition keys on a new 100 TB table)."""
    return df.agg(
        *[F.approx_count_distinct(c, rsd=rsd).alias(f"{c}_approx_nd") for c in cols]
    )
