"""docs/migration.md names real APIs — keep it honest.

The migration guide is the switching path for a reference user; a
renamed function or changed signature must fail here, not in the
user's shell."""

from __future__ import annotations

import inspect
from pathlib import Path

DOC = Path(__file__).resolve().parents[1] / "docs" / "migration.md"


def test_migration_doc_exists_and_covers_entry_points():
    text = DOC.read_text()
    for anchor in (
        "PipelineRunner",
        "query_polygon",
        "PolygonServer",
        "export_cli",
        "g_etl_spark.admin",
        "docs/registry.md",
        "docs/operators.md",
    ):
        assert anchor in text, f"migration guide lost its {anchor} section"


def test_migration_doc_apis_exist():
    from g_etl_spark import admin, export, query, warehouse
    from g_etl_spark.config import load_datasets_config  # noqa: F401
    from g_etl_spark.runner import PipelineRunner
    from g_etl_spark.session import get_spark  # noqa: F401

    # pipeline surface
    assert hasattr(PipelineRunner, "run_dataset")
    assert hasattr(PipelineRunner, "run")

    # polygon query surface: the doc shows these exact parameters
    sig = inspect.signature(query.query_polygon)
    for p in ("spark", "warehouse", "polygon_wkt", "resolution", "datasets",
              "aggregation", "exact", "compact"):
        assert p in sig.parameters, f"query_polygon lost parameter {p}"
    assert callable(query.query_polygon_pandas)
    ssig = inspect.signature(query.PolygonServer.__init__)
    for p in ("spark", "warehouse", "compact"):
        assert p in ssig.parameters
    assert callable(query.query_stats_pruned)

    # warehouse surface
    for fn in ("grid_index", "grid_stats", "write_grid_stats",
               "refresh_grid_stats_incremental", "write_table", "read_table",
               "compact_grid_index"):
        assert callable(getattr(warehouse, fn)), fn

    # export surface
    for fn in ("grouped_cells", "export_parquet", "export_csv",
               "export_geojson", "export_html_map", "export_mart_tables",
               "export_gpkg", "export_flatgeobuf"):
        assert callable(getattr(export, fn)), fn

    # admin surface
    for fn in ("warehouse_inventory", "table_info", "status_report", "main"):
        assert callable(getattr(admin, fn)), fn


def test_export_and_admin_cli_flags_match_doc():
    """The CLI flags shown in the guide must parse."""
    import g_etl_spark.admin as admin
    import g_etl_spark.export_cli as ecli

    # --help paths exercise the parser without a SparkSession
    for mod, argv in ((ecli, ["--help"]), (admin, ["--help"])):
        try:
            mod.main(argv)
        except SystemExit as e:  # argparse --help exits 0
            assert e.code == 0
