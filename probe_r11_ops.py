"""Round-11 scale probes: the new operators at ×N replicated inputs,
wall-clock recorded in SCALE_NOTES.md. Run: python probe_r11_ops.py [factor]

Unlike the r10 probes (which re-built pipelines inline and got
flagged for drift in the r10 review), these stage a REPLICATED
sf-dir on disk and run the REGISTERED query functions unchanged —
the probe exercises the exact shipped code path.

Replication is rep-salted so replicas aren't byte-duplicates:
documents/event ids offset per replica, embeddings salt coordinate 0,
events keep their timestamps (time-window semantics intact) but grow
the user universe, lineitem grows the order universe over the same
part catalog (supports scale ×N — the Apriori stressor).

Probed (the round's scale-sensitive additions):
- q383 BPE trainer        vocab-grain loop: 5 agg+rewrite rounds
- q384 greedy coverage    shrinking incidence anti-joins
- q385 Apriori triples    pair explode + pruned candidate count
- q379 k-center           k map passes + TakeOrderedAndProject
- q382 V-optimal DP       scan -> 16 moment rows -> bounded DP
- q387 range balance      values-grain boundaries + map-side assign
- q390 edit distance      user-grain ordered agg + bounded pairs
- q386 is probed at gate SF only (stream restarts dominate wall)
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
    ("q383_bpe_merge_trainer", ["documents"]),
    ("q384_greedy_max_coverage", ["documents"]),
    ("q385_apriori_triples", ["lineitem"]),
    ("q379_kcenter_coreset", ["embeddings"]),
    ("q382_voptimal_histogram", ["events"]),
    ("q387_range_partition_balance", ["events"]),
    ("q390_sequence_edit_distance", ["events"]),
    ("q395_interval_overlap_join", ["events"]),
    ("q397_bpe_encode_compression", ["documents"]),
    ("q398_textrank_keywords", ["documents"]),
    ("q400_training_data_funnel", ["documents"]),
    ("q403_mutual_best_matching", ["embeddings"]),
    ("q410_perplexity_filter", ["documents"]),
    ("q413_token_budget_waterfill", ["documents"]),
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
    e = load(spark, SF_DIR, "embeddings")
    (
        e.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
            F.expr(
                "transform(embedding, (x, i) -> CAST(x + CASE WHEN i = 0 "
                "THEN rep * 0.001 ELSE 0.0 END AS FLOAT))"
            ).alias("embedding"),
            "label",
        )
        .write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")
    )
    ev = load(spark, SF_DIR, "events")
    (
        ev.crossJoin(reps)
        .select(
            (F.col("event_id") + F.col("rep") * 100_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("rep") * 10_000).alias("user_id"),
            "event_type",
            (F.col("value") + F.col("rep") * 0.001).alias("value"),
            "props",
        )
        .write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    )
    li = load(spark, SF_DIR, "lineitem")
    (
        li.crossJoin(reps)
        .select(
            (F.col("l_orderkey") + F.col("rep") * 100_000_000).alias(
                "l_orderkey"
            ),
            *[c for c in li.columns if c != "l_orderkey"],
        )
        .write.mode("overwrite").parquet(f"{tmp}/lineitem.parquet")
    )


def main() -> None:
    from g_etl_spark.queries import queries as load_queries

    spark = get_spark("probe_r11")
    qs = load_queries()
    tmp = tempfile.mkdtemp(prefix="g_etl_probe_r11_")
    try:
        t0 = time.time()
        stage(spark, tmp)
        print(f"staged x{FACTOR} tables in {time.time() - t0:.1f}s", flush=True)
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
