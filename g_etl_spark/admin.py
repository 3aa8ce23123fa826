"""Warehouse admin/report surface — the non-interactive equivalent of
the reference's Textual TUI (src/g_etl/admin/): the same QUERIES the
explorer/h3_query screens run, exposed as functions + a plain CLI
(this engine is headless; a TUI is a frontend choice, not engine
capability).

    python -m g_etl_spark.admin --warehouse W                 # inventory
    python -m g_etl_spark.admin --warehouse W --table mart/x  # detail
    python -m g_etl_spark.admin --warehouse W --polygon "POLYGON ((...))"

≙ explorer.py:291-317 (table list + has_geometry), :375-410 (row
count, column types, 10-row sample), h3_query.py:170-218 (polygon
query → result table).
"""

from __future__ import annotations

import argparse
import os
import sys
from dataclasses import dataclass

from pyspark.sql import SparkSession

from g_etl_spark import warehouse as wh

SCHEMAS = ("raw", "staging", "mart")
GEOM_COLUMNS = {"geom", "geometry", "centerpoint"}


@dataclass
class TableEntry:
    schema: str
    name: str
    rows: int
    n_columns: int
    has_geometry: bool


def warehouse_inventory(spark: SparkSession, warehouse: str) -> list[TableEntry]:
    """≙ the explorer's table list (explorer.py:291-317): every table
    per schema with row count and a geometry flag."""
    out: list[TableEntry] = []
    for schema in SCHEMAS:
        sdir = os.path.join(warehouse, schema)
        if not os.path.isdir(sdir):
            continue
        for name in sorted(os.listdir(sdir)):
            df = wh.read_table(spark, warehouse, schema, name)
            out.append(
                TableEntry(
                    schema=schema,
                    name=name,
                    rows=df.count(),
                    n_columns=len(df.columns),
                    has_geometry=bool(GEOM_COLUMNS & set(df.columns)),
                )
            )
    return out


def table_info(spark: SparkSession, warehouse: str, schema: str, name: str, sample: int = 10):
    """≙ explorer.py:375-410: (columns [(name, dtype)], row count,
    sample rows as dicts)."""
    df = wh.read_table(spark, warehouse, schema, name)
    return df.dtypes, df.count(), [r.asDict() for r in df.limit(sample).collect()]


def status_report(spark: SparkSession, warehouse: str) -> str:
    """Text status report: inventory + grid index/stats summary +
    applied-state entries (the TUI's dashboard content)."""
    lines = [f"warehouse: {warehouse}"]
    inv = warehouse_inventory(spark, warehouse)
    for e in inv:
        g = " geo" if e.has_geometry else ""
        lines.append(f"  {e.schema}/{e.name}: {e.rows} rows, {e.n_columns} cols{g}")
    try:
        idx = wh.grid_index(spark, warehouse)
        n_cells = idx.select("grid_cell").distinct().count()
        lines.append(f"grid index: {idx.count()} rows over {n_cells} distinct cells")
    except ValueError:
        lines.append("grid index: (no grid tables)")
    state_path = os.path.join(warehouse, "_state.json")
    if os.path.exists(state_path):
        from g_etl_spark.state import StateStore

        st = StateStore(state_path)
        applied = sorted(st.applied_keys("pipeline"))
        lines.append(f"applied datasets: {', '.join(applied) if applied else '(none)'}")
    return "\n".join(lines)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="g_etl_spark.admin")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--table", help="SCHEMA/NAME for detail view")
    ap.add_argument("--polygon", help="WKT polygon query against the grid index")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from g_etl_spark.session import get_spark

    spark = get_spark("g_etl_spark_admin", master=args.master)
    if args.table:
        schema, name = args.table.split("/", 1)
        dtypes, n, rows = table_info(spark, args.warehouse, schema, name)
        print(f"{schema}/{name}: {n} rows")
        for c, t in dtypes:
            print(f"  {c}: {t}")
        for r in rows:
            print(f"  {r}")
        return 0
    if args.polygon:
        from g_etl_spark.query import query_polygon

        res = query_polygon(spark, args.warehouse, args.polygon)
        for r in res.limit(50).collect():
            print(r.asDict())
        return 0
    print(status_report(spark, args.warehouse))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
