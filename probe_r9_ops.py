"""Round-9 scale probes (run at x100 by default):

    python probe_r9_ops.py [factor]
    PROBE_ONLY=dispatch python probe_r9_ops.py

- size-aware ranking dispatch (the r8-verdict item): the q177
  collapsed-score shape at x100 (~500k distinct scores after the
  rollup) previously paid the two-pass unconditionally (11.17 s in
  the r8 probe vs 2.97 s for the plain window). With
  threshold_rows=TWOPASS_CROSSOVER_ROWS the operator must probe the
  size (early-stopping limit(n+1).count()) and take the plain-window
  plan — target is back under ~3 s plus a small probe overhead.
- dispatch probe overhead in the corpus-sized regime: the
  limit(n+1).count() must stop early and cost ~a scan of threshold+1
  rows, not a full count of the big relation.
- SRP multi-seed recall (q295/q305 knob): recall@planted-truth and
  cost as n_seeds grows — the recall-vs-depth trade recorded in
  SCALE_NOTES.

Keys are rep-shifted so replicas are distinct values, not byte-dups.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pyspark.sql.functions as F
from pyspark.sql import Window

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from g_etl_spark.operators.ranking import (
    TWOPASS_CROSSOVER_ROWS,
    global_cumsum_twopass,
    log2_bucket,
)
from g_etl_spark.session import get_spark
from g_etl_spark.tables import load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark("probe_r9_ops")
    out: dict[str, object] = {"factor": factor}

    only = os.environ.get("PROBE_ONLY", "")
    sections = {s for s in only.split(",") if s}

    def timed(name: str, fn) -> None:
        if sections and not any(name.startswith(s) for s in sections):
            return
        spark.catalog.clearCache()
        t0 = time.time()
        n = fn()
        out[name] = round(time.time() - t0, 2)
        print(f"# {name}: {n} rows in {out[name]}s", file=sys.stderr)

    reps = spark.range(factor).select(F.col("id").alias("rep"))

    # ---- dispatch on the q177 collapsed shape ---------------------
    o = load(spark, SF_DIR, "orders")
    big_o = o.crossJoin(reps).select(
        (F.floor(F.col("o_totalprice")) + F.col("rep")).cast("long").alias("score"),
    )
    # warm JIT so the first timed section doesn't absorb codegen cost
    big_o.groupBy("score").count().count()

    def by_score():
        return big_o.groupBy("score").agg(
            F.count(F.lit(1)).cast("double").alias("cnt")
        )

    def dispatch_cumsum():
        df = global_cumsum_twopass(
            by_score(),
            "cnt",
            ["score"],
            log2_bucket(F.col("score")),
            out="prior",
            inclusive=False,
            threshold_rows=TWOPASS_CROSSOVER_ROWS,
        )
        return df.count()

    def plain_window_cumsum():
        w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
        return (
            by_score()
            .select(F.coalesce(F.sum("cnt").over(w), F.lit(0.0)).alias("prior"))
            .count()
        )

    def twopass_cumsum():
        df = global_cumsum_twopass(
            by_score(),
            "cnt",
            ["score"],
            log2_bucket(F.col("score")),
            out="prior",
            inclusive=False,
        )
        return df.count()

    timed("plain_window_cumsum_sec", plain_window_cumsum)
    timed("twopass_cumsum_sec", twopass_cumsum)
    timed("dispatch_cumsum_sec", dispatch_cumsum)

    # ---- dispatch probe overhead on a corpus-sized relation -------
    # the probe must stop at threshold+1 rows; compare against a full
    # count of the same big relation
    def probe_overhead():
        return big_o.limit(TWOPASS_CROSSOVER_ROWS + 1).count()

    def full_count():
        return big_o.count()

    timed("probe_limit_count_sec", probe_overhead)
    timed("probe_full_count_sec", full_count)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
