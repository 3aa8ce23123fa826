"""Round-6 q101 variance pin: the judge flagged the 5-trial quiet-host
spread 4.9-10.9 s as the suite's largest. A/B/C in ONE session:

  A baseline          — q101 as shipped (MEMORY_AND_DESERIALIZED persist)
  B disk-only persist — edges persisted DISK_ONLY (GC-pressure test:
                        a deserialized 1.2M-row edge cache on a 128 GiB
                        heap shouldn't matter, but measure, don't guess)
  C pinned partitions — edges repartition(32, a) before persist (AQE
                        post-shuffle coalescing picks the wedge-join
                        parallelism from runtime sizes; pinning removes
                        that degree of freedom)

5 trials each, per-trial times + JVM GC deltas recorded.
python probe_r6_q101.py  ->  one JSON line to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyspark.sql.functions as F
from pyspark.storagelevel import StorageLevel

from g_etl_spark.session import get_spark
from g_etl_spark.tables import load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def gc_ms(spark):
    beans = spark.sparkContext._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))


def run(spark, mode: str) -> tuple[float, int]:
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
    l1, l2 = li.alias("l1"), li.alias("l2")
    edges = (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_partkey") < F.col("l2.l_partkey")),
        )
        .select(F.col("l1.l_partkey").alias("a"), F.col("l2.l_partkey").alias("b"))
        .distinct()
    )
    if mode == "C":
        edges = edges.repartition(32, "a")
    edges = edges.persist(
        StorageLevel.DISK_ONLY if mode == "B" else StorageLevel.MEMORY_AND_DISK_DESER
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    wedges = e1.join(e2, F.col("e1.b") == F.col("e2.a"))
    tris = wedges.join(
        e3, (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b"))
    )
    verts = edges.select(F.col("a").alias("v")).unionAll(
        edges.select(F.col("b").alias("v"))
    )
    g0, t0 = gc_ms(spark), time.time()
    edges.count(); verts.distinct().count(); tris.count()
    dt, g1 = time.time() - t0, gc_ms(spark)
    edges.unpersist()
    return round(dt, 3), g1 - g0


def main():
    spark = get_spark("probe_r6_q101")
    out = {}
    # interleave trials so slow host phases hit all modes equally
    trials = {m: [] for m in "ABC"}
    gcs = {m: [] for m in "ABC"}
    run(spark, "A")  # one warmup for codegen/JIT
    for t in range(5):
        for m in "ABC":
            spark.catalog.clearCache()
            dt, g = run(spark, m)
            trials[m].append(dt)
            gcs[m].append(g)
            print(f"# trial {t} mode {m}: {dt}s gc {g}ms", file=sys.stderr)
    for m in "ABC":
        ts = trials[m]
        out[m] = {
            "trials": ts,
            "best": min(ts),
            "spread_pct": round(100 * (max(ts) - min(ts)) / min(ts), 1),
            "gc_ms": gcs[m],
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
