"""Round-14 scale probes: the new operators at ×N replicated inputs,
wall-clock recorded in SCALE_NOTES.md. Run: python probe_r14_ops.py [factor]

Same protocol as probe_r13_ops: stage a REPLICATED sf-dir on disk
(rep-salted so replicas aren't byte-duplicates) and run the
REGISTERED query functions unchanged.

Probed (the round's scale-sensitive additions):
- q459 zorder executed    3 rank sorts + envelope pricing + 16-file
                          clustered rewrite + 3 engine-metric probes
- q460 weighted cohesion  q444 gram join + CC + weighted rollup
- q461 max-policy frontier |grid|x|chunks| sweep (q458's twin)
- q462 substring removal  q444 gram join + interval merge + HOF rebuild
- q463 morton range split broadcast binary search + |ranges| rollup
- q464 doremi reweight    vocab-grain model join + |sources| MW step
- q466 ctx-len frontier   per-shard Arrow fold x |grid| lengths
- q467 layout drift       one filtered-agg scan, 1-row observe
- q468 epoch accounting   md5 groupBy x 2 scopes
- q469 luhn detection     map-side regex + 16-term checksum
- q470/q471 K-M + logrank per-user window -> |hours|-grain tables
- q472 append debt        q459 write + delta append + 3 probes
- q474 cluster split      q444 edges + CC + md5 assignment
- q475 temperature curve  |sources| rollup x |tau| arithmetic
- q476 best-of-n curve    |distinct rewards| ECDF x |k|
- q477 compaction         two clustered writes + 6 probes
(q465 silhouette and q473 hard negatives probe at gate SF only: embeddings are a fixed
1k-row table at every sf — the |corpus|-scaling input is absent.)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyspark.sql.functions as F

from g_etl_spark.session import get_spark
from g_etl_spark.tables import load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 25

PROBES = [
    ("q459_zorder_layout_executed", ["events"]),
    ("q460_weighted_cluster_cohesion", ["documents"]),
    ("q461_watermark_frontier_max_policy", ["events"]),
    ("q462_exact_substring_removal", ["documents"]),
    ("q463_morton_range_split_serving", ["events"]),
    ("q464_doremi_domain_reweight", ["documents"]),
    ("q466_context_length_frontier", ["documents"]),
    ("q467_layout_drift_monitor", ["events"]),
    ("q468_duplication_epoch_accounting", ["documents"]),
    ("q469_luhn_card_detection", ["documents"]),
    ("q470_kaplan_meier_gaps", ["events"]),
    ("q471_logrank_cohort_test", ["events"]),
    ("q472_append_delta_pruning_debt", ["events"]),
    ("q474_cluster_aware_split", ["documents"]),
    ("q475_temperature_sampling_curve", ["documents"]),
    ("q476_best_of_n_reward_curve", ["events"]),
    ("q477_compaction_executed", ["events"]),
]


def stage(spark, tmp: str) -> None:
    reps = spark.range(FACTOR).select(F.col("id").alias("rep"))
    d = load(spark, SF_DIR, "documents")
    (
        d.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
        .write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    )
    ev = load(spark, SF_DIR, "events")
    (
        ev.crossJoin(reps)
        .select(
            (F.col("event_id") + F.col("rep") * 100_000_000).alias(
                "event_id"
            ),
            "ts",
            (F.col("user_id") + F.col("rep") * 10_000).alias("user_id"),
            "event_type",
            (F.col("value") + F.col("rep") * 0.001).alias("value"),
            "props",
        )
        .write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    )


def main() -> None:
    from g_etl_spark.queries import queries as load_queries

    spark = get_spark("probe_r14")
    qs = load_queries()
    tmp = tempfile.mkdtemp(prefix="g_etl_probe_r14_")
    try:
        t0 = time.time()
        stage(spark, tmp)
        print(f"staged x{FACTOR} tables in {time.time() - t0:.1f}s",
              flush=True)
        for name, tables in PROBES:
            t0 = time.time()
            rows = qs[name](spark, tmp).collect()
            print(
                f"{name} x{FACTOR}: {len(rows)} rows "
                f"in {time.time() - t0:.2f}s",
                flush=True,
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
