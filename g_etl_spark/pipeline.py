"""CLI — ≙ `python -m g_etl.pipeline` (src/g_etl/pipeline.py:31-302).

    python -m g_etl_spark.pipeline --config datasets.yml \
        --warehouse ./warehouse [--dataset id ...] [--type plugin] \
        [--force] [--export csv|geojson|parquet] [--export-dir DIR]

Same selection flags as the reference CLI (--dataset/--type/enabled
filtering, pipeline.py:128-150) and the optional auto-export
(pipeline.py:259-275).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="g_etl_spark.pipeline")
    ap.add_argument("--config", required=True, help="datasets.yml path")
    ap.add_argument("--warehouse", required=True, help="warehouse output dir")
    ap.add_argument("--dataset", action="append", help="dataset id filter (repeatable)")
    ap.add_argument("--type", dest="plugin", help="plugin type filter")
    ap.add_argument("--all", action="store_true", help="include disabled datasets")
    ap.add_argument("--force", action="store_true", help="ignore incremental state")
    ap.add_argument("--export", choices=["csv", "geojson", "parquet"], help="auto-export mart")
    ap.add_argument("--export-dir", default=None)
    ap.add_argument("--master", default=None, help="spark master override")
    args = ap.parse_args(argv)

    from g_etl_spark.config import filter_datasets, load_datasets_config
    from g_etl_spark.runner import PipelineRunner
    from g_etl_spark.session import get_spark

    datasets = filter_datasets(
        load_datasets_config(args.config),
        ids=args.dataset,
        plugin=args.plugin,
        enabled_only=not args.all,
    )
    if not datasets:
        print("no datasets selected", file=sys.stderr)
        return 2

    spark = get_spark("g_etl_spark_pipeline", master=args.master)
    runner = PipelineRunner(spark, args.warehouse)
    results = runner.run(datasets, force=args.force)
    failed = False
    for r in results:
        line = f"{r.dataset_id}: {r.status}"
        if r.status == "ok":
            line += f" ({r.rows} index rows)"
        if r.error:
            line += f" — {r.error}"
            failed = True
        print(line)

    if args.export and not failed:
        from g_etl_spark.export import export_mart_tables

        out = args.export_dir or f"{args.warehouse}/export"
        for name, dest in export_mart_tables(
            spark, args.warehouse, out, fmt=args.export
        ).items():
            print(f"export {name}: {dest}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
