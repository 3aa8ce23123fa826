"""Round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Headline set: one representative per operator family, excluding the
deliberately-quadratic brute-force baselines (their scale paths are
benched instead).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from g_etl_spark.queries import queries as load_queries
from g_etl_spark.session import get_spark

HEADLINE = [
    "q01_pricing_summary",      # scan + wide agg
    "q03_region_revenue",       # 5-way snowflake join, broadcast dims
    "q06_ordered_distinct_lists",  # collect_set rollup
    "q21_grid_polygon_objects",  # grid polyfill broadcast join + distinct
    "q22_grid_stats",           # grid stats rollup (h3_stats analogue)
    "q42_token_frequencies",    # explode + agg
    "q40_text_stats",           # array lambdas per row
    "q52_minhash_near_dups",    # LSH dedup pipeline
    "q60_cosine_topk",          # vector scan top-k
    "q71_multimodal_decode",    # mapInPandas decode path
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("g_etl_spark_bench")
    qs = load_queries()

    # Warmup: first-scan metadata, codegen, and the Python worker pool
    # all pay one-time costs; the metric should reflect steady-state
    # query latency (the baseline DuckDB numbers are steady-state too).
    from g_etl_spark.tables import TABLE_NAMES, load

    for t in TABLE_NAMES:
        load(spark, sf_dir, t).count()
    import pyspark.sql.functions as F

    @F.pandas_udf("long")
    def _warm(s):
        return s

    spark.range(100).select(_warm("id")).count()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        best, rows = None, []
        # best-of-2: first execution pays one-time codegen/JIT per
        # query shape; steady-state latency is the comparable number
        # (the reference baseline is a warm repeated query too).
        for _ in range(2):
            t0 = time.time()
            rows = fn(spark, sf_dir).collect()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        total += best
        print(f"# {name}: {len(rows)} rows in {best:.2f}s", file=sys.stderr)

    # Hot polygon query — the reference's published benchmark shape
    # (H3_POLYGON_ANALYSIS.md:318-321: prebuilt warehouse, repeated
    # 2x2 km polygon query, ~50 ms DuckDB): index materialized once
    # (cached), then the broadcast cell join + distinct measured warm.
    import pyspark.sql.functions as F

    from g_etl_spark.functions import grid as G
    from g_etl_spark.queries.grid import QUERY_POLY_RES, QUERY_RING, _points

    indexed = (
        _points(spark, sf_dir)
        .select(
            "event_id",
            "event_type",
            G.cell(F.col("lat"), F.col("lng"), QUERY_POLY_RES).alias("cell_id"),
        )
        .cache()
    )
    indexed.count()  # materialize
    cells = G.polyfill(QUERY_RING, QUERY_POLY_RES)
    best = None
    for _ in range(5):
        t0 = time.time()
        # small cell set -> IN-set predicate (the engine's adaptive
        # choice in query.py): one codegen'd stage, no broadcast job
        n = (
            indexed.filter(F.col("cell_id").isin(cells))
            .select("event_id", "event_type", "cell_id")
            .distinct()
            .count()
        )
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    indexed.unpersist()
    timings["hot_polygon_query"] = round(best, 3)
    total += best
    print(f"# hot_polygon_query: {n} rows in {best:.3f}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
