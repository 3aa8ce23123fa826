"""Round-12 scale probes: the new operators at ×N replicated inputs,
wall-clock recorded in SCALE_NOTES.md. Run: python probe_r12_ops.py [factor]

Same protocol as probe_r11_ops: stage a REPLICATED sf-dir on disk
(rep-salted so replicas aren't byte-duplicates) and run the
REGISTERED query functions unchanged — the probe exercises the exact
shipped code path.

Probed (the round's scale-sensitive additions):
- q422 adaptive aHash      histogram price + ONE chosen band join
- q423 feedback re-cost    3 collapsed-key joins + lattice arithmetic
- q424 unigram-LM EM       word-table DP (HOF folds) + piece rollup
- q425 multi-epoch budget  |sources|x|epochs| λ search
- q427 sequence packing    bounded-shard applyInPandas fold
- q428 Bradley-Terry       (user x type) duels -> 25-cell MM
- q429 interleave audit    corpus hash-order window + runs test
- q430 FFD packing          second fold, same Arrow groups
- q432 filter agreement     3 filters + |bigram-vocab| LM join
- q433 layout advisor       one scan, 12-cell conditional aggs
- q437 unigram prune        q424 machinery + vocab-grain loss
- q438 DP accountant        3 bounded rollups + literal workload
- q440 GRPO advantage       |groups| moments + join back
- q426/q431/q436/q439 are probed at gate SF only (stream restarts
  dominate wall, the q386/q395 exemption); q434/q435 generate
  their own input (corpus-independent)
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
    ("q422_ahash_adaptive_near_dups", ["documents"]),
    ("q423_cardinality_feedback_recost",
     ["region", "nation", "customer", "orders"]),
    ("q424_unigram_lm_em_round", ["documents"]),
    ("q425_multi_epoch_token_budget", ["documents"]),
    ("q427_sequence_packing_audit", ["documents"]),
    ("q428_bradley_terry_preferences", ["events"]),
    ("q429_shuffle_interleave_audit", ["documents"]),
    ("q430_ffd_packing_comparison", ["documents"]),
    ("q432_filter_agreement_matrix", ["documents"]),
    ("q433_partition_layout_advisor", ["events"]),
    ("q437_unigram_lm_prune", ["documents"]),
    ("q438_dp_budget_accountant", ["events"]),
    ("q440_group_relative_advantage", ["events"]),
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
    c = load(spark, SF_DIR, "customer")
    (
        c.crossJoin(reps)
        .select(
            (F.col("c_custkey") + F.col("rep") * 10_000_000).alias(
                "c_custkey"
            ),
            *[col for col in c.columns if col != "c_custkey"],
        )
        .write.mode("overwrite").parquet(f"{tmp}/customer.parquet")
    )
    o = load(spark, SF_DIR, "orders")
    (
        o.crossJoin(reps)
        .select(
            (F.col("o_orderkey") + F.col("rep") * 100_000_000).alias(
                "o_orderkey"
            ),
            (F.col("o_custkey") + F.col("rep") * 10_000_000).alias(
                "o_custkey"
            ),
            *[col for col in o.columns
              if col not in ("o_orderkey", "o_custkey")],
        )
        .write.mode("overwrite").parquet(f"{tmp}/orders.parquet")
    )
    for t in ("region", "nation"):
        load(spark, SF_DIR, t).write.mode("overwrite").parquet(
            f"{tmp}/{t}.parquet"
        )


def main() -> None:
    from g_etl_spark.queries import queries as load_queries

    spark = get_spark("probe_r12")
    qs = load_queries()
    tmp = tempfile.mkdtemp(prefix="g_etl_probe_r12_")
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
