"""Reusable DataFrame→DataFrame operators.

The training-data-pipeline operator families (BASELINE.json north
star): dedup, similarity search, text analysis, multimodal columns —
plus the rollup/dedup building blocks the reference pipeline itself
uses. Each module exposes pure functions over DataFrames; the
declared queries in g_etl_spark.queries call into these.
"""
