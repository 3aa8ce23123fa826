"""Round-13 scale probes: the new operators at ×N replicated inputs,
wall-clock recorded in SCALE_NOTES.md. Run: python probe_r13_ops.py [factor]

Same protocol as probe_r12_ops: stage a REPLICATED sf-dir on disk
(rep-salted so replicas aren't byte-duplicates) and run the
REGISTERED query functions unchanged.

Probed (the round's scale-sensitive additions):
- q442 layout executed     pricing scan + partitioned rewrite + 4 probes
- q443 Davidson ties       (user x type) duels -> 25-cell 2-round MM
- q444 maximal substrings  Σ occ(gram)² anchor join + alignment islands
- q445 prune refit         q424 machinery + SECOND word-grain E-step
- q447 position-bias BT    ordered-pair MM, gamma + strengths
- q448 decontamination     eval-gram x train-gram bucket join + islands
- q449 cycle audit         |types|³ triad join (corpus pass = q428's)
- q450 DP noisy release    bounded rollups + per-cell md5 Laplace
- q451 CC + policy rollup, q452 |langs|x bigram cross-score,
- q453 16-round BPE, q454 two-pass-ntile curriculum cells
- q446 is probed at gate SF only (pure |chunks|x|sources| arithmetic;
  its corpus pass is one rollup — the q426 exemption class)
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
    ("q442_partition_layout_executed", ["events"]),
    ("q443_davidson_tie_preferences", ["events"]),
    ("q444_maximal_shared_substrings", ["documents"]),
    ("q445_unigram_lm_prune_refit", ["documents"]),
    ("q447_position_bias_bradley_terry", ["events"]),
    ("q448_eval_decontamination_report", ["documents"]),
    ("q449_preference_cycle_audit", ["events"]),
    ("q450_dp_noisy_release", ["events"]),
    ("q451_cluster_policy_propagation", ["documents"]),
    ("q452_crosslingual_lm_matrix", ["documents"]),
    ("q453_bpe_merge_depth_curve", ["documents"]),
    ("q454_curriculum_mixture_audit", ["documents"]),
    ("q455_plackett_luce_listwise", ["events"]),
    ("q456_dedup_threshold_curve", ["documents"]),
    ("q457_session_script_replay", ["events"]),
    ("q458_watermark_delay_frontier", ["events"]),
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

    spark = get_spark("probe_r13")
    qs = load_queries()
    tmp = tempfile.mkdtemp(prefix="g_etl_probe_r13_")
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
