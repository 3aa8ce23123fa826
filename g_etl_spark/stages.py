"""Transformation stages — the reference's SQL template chain as
DataFrame→DataFrame functions.

Template chain (SURVEY §3.1 step 4; sql_generator.py:206-255):

    raw → staging_004 (staging_transform)
        → staging_{pipeline}_001 (normalize)
        → mart 002 (explode_cells) / 003 (compact_cells)

Each stage cites the template it re-expresses. Geometry stays WKB;
cells are native array<long> (the reference round-trips through JSON
strings, 003:64-83 — dropped inside the engine per SURVEY §1.1,
serialized only at export).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from g_etl_spark.functions import core, geo_udfs
from g_etl_spark.mapping import DATA_KEYS, compile_mapping

GEOMETRY_ALIASES = ("geom", "geometry", "shape", "geometri")


def normalize_geometry_column(df: DataFrame) -> DataFrame:
    """Rename whichever geometry alias is present to ``geom``
    (≙ pipeline_runner.py:445-496,928-966)."""
    cols = {c.lower(): c for c in df.columns}
    for alias in GEOMETRY_ALIASES:
        if alias in cols:
            if cols[alias] != "geom":
                df = df.withColumnRenamed(cols[alias], "geom")
            return df
    raise ValueError(f"no geometry column found among {GEOMETRY_ALIASES}")


def _cell_udfs(index):
    """Resolve the indexing UDF trio for ``index`` (None → default
    quadtree module-level UDFs, reused so their codegen caches hit)."""
    if index is None:
        return {
            "cells_for_geom": geo_udfs.grid_cells_for_geom,
            "center_cell": geo_udfs.grid_center_cell,
            "compact_cells": geo_udfs.grid_compact_cells,
        }
    from g_etl_spark.functions.cellindex import get_index

    return geo_udfs.make_cell_udfs(get_index(index))


def staging_transform(df: DataFrame, index=None) -> DataFrame:
    """≙ 004_staging_transform_template.sql:23-63 — the shared
    per-dataset enrichment:

    - drop NULL-geometry rows (P1, :24-27)
    - validate/repair geometry (P3, :33)
    - metadata block (P6, :35-40): _imported_at, _geom_md5, _attr_md5,
      _json_data, _centroid_lat/_centroid_lng (P5)
    - geometry-type dispatch → grid cells + center cell (P7, :50-58)

    ``index`` selects the cell system (functions/cellindex.py):
    None/'quadtree' (default), 'h3' (real H3 hexagons, needs the h3
    lib), or a provider object. Cell ids from different systems are
    not interchangeable.

    One pass, one projection per UDF family; no shuffle at all —
    this stage is embarrassingly parallel at any scale.
    """
    udfs = _cell_udfs(index)
    attr_cols = [c for c in df.columns if c != "geom"]
    valid = (
        df.filter(F.col("geom").isNotNull())
        .withColumn("geom", geo_udfs.st_make_valid(F.col("geom")))
    )
    # geometry serialized once; downstream hashes/UDFs read attributes
    staged = valid.withColumn("_geom_wkt", geo_udfs.st_as_text(F.col("geom")))
    return staged.withColumns(
        {
            "_imported_at": F.current_timestamp(),
            "_geom_md5": F.md5(F.col("_geom_wkt")),
            "_attr_md5": core.attr_md5(*[F.col(c) for c in attr_cols]),
            "_json_data": core.json_data({c: F.col(c) for c in attr_cols}),
            "_centroid_lat": geo_udfs.centroid_lat_wgs84(F.col("geom")),
            "_centroid_lng": geo_udfs.centroid_lng_wgs84(F.col("geom")),
            "_grid_index": udfs["center_cell"](F.col("geom")),
            "_grid_cells": udfs["cells_for_geom"](F.col("geom")),
        }
    ).drop("_geom_wkt")


def normalize(
    df: DataFrame,
    field_mapping: dict[str, str | None],
    extra_numeric: dict[str, int] | None = None,
) -> DataFrame:
    """≙ aab_ext_restr/001_staging_normalisering_template.sql:10-28 —
    map raw columns to the fixed engine schema via the field-mapping
    compiler; avdelning variant adds rounded numeric columns
    (aaa_avdelning/001:18-19) via ``extra_numeric={'area': 2, ...}``.
    """
    m = compile_mapping(field_mapping)
    cols: list[Column] = [
        core.source_id_md5(m["source_id"]).alias("id"),
        m["source_id"].alias("source_id"),
        m["klass"].alias("klass"),
        m["grupp"].alias("grupp"),
        m["typ"].alias("typ"),
        m["leverantor"].alias("leverantor"),
        F.col("_grid_index").alias("grid_center"),
        F.col("_grid_cells").alias("grid_cells"),
        F.col("_json_data").alias("json_data"),
    ]
    cols += [m[k].alias(k) for k in DATA_KEYS]
    for name, decimals in (extra_numeric or {}).items():
        cols.append(core.numeric_cleanup(m[name], decimals).alias(name))
    cols += [
        F.col("geom"),
        geo_udfs.st_point_on_surface(F.col("geom")).alias("centerpoint"),
    ]
    return df.select(*cols)


def explode_cells(df: DataFrame) -> DataFrame:
    """≙ aab_ext_restr/002_mart_h3_cells_template.sql:10-21 — one row
    per (feature, cell), classification concat, empty cell sets
    dropped.

    This is THE indexing fan-out: at 100 TB the exploded index is
    written partitioned by cell prefix (warehouse.write_grid_index)
    so polygon queries prune to touched partitions.
    """
    return (
        df.filter(F.size("grid_cells") > 0)
        .withColumn("classification", core.classification(F.col("grupp"), F.col("typ")))
        .select(
            "id",
            "source_id",
            "klass",
            "grupp",
            "typ",
            "leverantor",
            "classification",
            "json_data",
            F.explode("grid_cells").alias("grid_cell"),
        )
    )


def compact_cells_stage(df: DataFrame, index=None) -> DataFrame:
    """≙ aab_ext_restr/003_mart_h3_compact_template.sql:10-16 —
    per-feature hierarchically compacted cell set (array column,
    pandas UDF; unit-tested invariant: uncompact == original).
    ``index`` must match the one used at staging_transform."""
    udfs = _cell_udfs(index)
    return df.filter(F.size("grid_cells") > 0).select(
        "id",
        "source_id",
        "klass",
        "leverantor",
        udfs["compact_cells"](F.col("grid_cells")).alias("grid_cells_compact"),
    )
