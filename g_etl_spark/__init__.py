"""g_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference geospatial ETL stack (10gbrand/g-etl):
config-driven ingest, field-mapping normalization, hierarchical
spatial-grid indexing (spatial join -> equi join), pre-aggregated
rollups, polygon query API, and exports — plus large-scale
training-data operators (dedup, similarity search, multimodal
columns, text analysis).

Design stance (SURVEY.md §7): declare everything with the DataFrame /
SQL API and let Catalyst/Tungsten pick the physical plan. The spatial
grid index is computed with pure built-in SQL arithmetic (JVM-side,
whole-stage-codegen) rather than a Python UDF, so indexing scales to
100 TB without a Python round-trip in the hot path.
"""

__version__ = "0.1.0"
