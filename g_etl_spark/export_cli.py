"""Export CLI — ≙ `python -m g_etl.export` (export.py:524-619).

    python -m g_etl_spark.export_cli --warehouse DIR --format csv \
        [--per-table] [--limit N] [--out DIR]
"""

from __future__ import annotations

import argparse


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="g_etl_spark.export_cli")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--format", choices=["csv", "geojson", "parquet", "html"], default="csv")
    ap.add_argument("--per-table", action="store_true")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    from g_etl_spark import export
    from g_etl_spark.session import get_spark

    spark = get_spark("g_etl_spark_export")
    out = args.out or f"{args.warehouse}/export"
    if args.per_table:
        for name, dest in export.export_mart_tables(
            spark, args.warehouse, out, fmt=args.format, limit=args.limit
        ).items():
            print(f"{name}: {dest}")
        return 0
    cells = export.grouped_cells(spark, args.warehouse, limit=args.limit)
    if args.format == "csv":
        export.export_csv(cells, f"{out}/cells_csv")
    elif args.format == "geojson":
        export.export_geojson(cells, f"{out}/cells.geojson")
    elif args.format == "parquet":
        export.export_parquet(cells, f"{out}/cells_parquet")
    else:
        export.export_html_map(cells, f"{out}/map.html")
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
