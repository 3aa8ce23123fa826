"""Round-10 scale probes: the new operators at ×25 replicated inputs
(rep-SALTED so replicas aren't byte-duplicates), wall-clock recorded
in SCALE_NOTES.md. Run: python probe_r10_ops.py [factor]

- multiprobe ANN (q345/q351 machinery): brute scan vs b=0/1/2 probe
  latency + candidate counts on a ×N embeddings corpus — the
  recall/cost curve's COST side beyond gate SF.
- q347 identity stitching: CC rounds + wall on ×N events.
- q353 aHash banded dedup: candidate-pair count (Σ bucket² health)
  + wall on ×N rep-salted documents.
- q346 Shapley: wall on ×N events (two corpus exchanges + bounded
  lattice arithmetic — should scale linearly).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyspark.sql.functions as F

from g_etl_spark.session import get_spark
from g_etl_spark.tables import load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 25


def timed(label, fn):
    t0 = time.time()
    out = fn()
    print(f"{label}: {out} in {time.time() - t0:.2f}s", flush=True)


def main():
    spark = get_spark("probe_r10")
    reps = spark.range(FACTOR).select(F.col("id").alias("rep"))

    # --- multiprobe ANN cost curve -----------------------------------
    from g_etl_spark.operators import similarity as S

    e = load(spark, SF_DIR, "embeddings")
    big_e = (
        e.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
            # rep-salt one coordinate so replicas differ (keeps the
            # bucket distribution realistic, not 25 byte-copies)
            F.expr(
                "transform(embedding, (x, i) -> CAST(x + CASE WHEN i = 0 "
                "THEN rep * 0.001 ELSE 0.0 END AS FLOAT))"
            ).alias("embedding"),
        )
        .localCheckpoint()
    )
    n = big_e.count()
    print(f"embeddings x{FACTOR}: {n} vectors", flush=True)
    q = [float(x) for x in e.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    timed("brute cosine_topk", lambda: len(S.cosine_topk(big_e, q, k=10).collect()))
    planes = S.random_hyperplanes(6, 64)
    bucketed = S.srp_buckets(big_e, 6, 64).localCheckpoint()
    for b in (0, 1, 2):
        probes = S.srp_probe_buckets(q, planes, n_probe_bits=b)
        cand = bucketed.filter(F.col("bucket").isin(probes))
        t0 = time.time()
        nc = cand.count()
        S.cosine_topk(cand, q, k=10).collect()
        print(
            f"multiprobe b={b}: {len(probes)} buckets, {nc} candidates, "
            f"top10 in {time.time() - t0:.2f}s",
            flush=True,
        )

    # --- q347 identity stitching at xN --------------------------------
    from g_etl_spark.operators import graph as G

    ev = load(spark, SF_DIR, "events").select("user_id", "event_id")
    big_ev = (
        ev.crossJoin(reps)
        .select(
            (F.col("user_id") + F.col("rep") * 1_000_000).alias("user_id"),
            (F.col("event_id") + F.col("rep") * 100_000_000).alias("event_id"),
        )
        .localCheckpoint()
    )
    print(f"events x{FACTOR}: {big_ev.count()} rows", flush=True)

    def stitch():
        personal = big_ev.select(
            F.col("user_id").alias("id_a"),
            (F.lit(4_000_000_000) + F.col("user_id") * 10 + F.col("event_id") % 2)
            .cast("long")
            .alias("id_b"),
        ).distinct()
        household = (
            big_ev.filter(F.col("event_id") % 5 == 0)
            .select(
                F.col("user_id").alias("id_a"),
                (F.lit(2_000_000_000) + F.floor(F.col("user_id") / 4))
                .cast("long")
                .alias("id_b"),
            )
            .distinct()
        )
        labels = G.connected_components(personal.unionAll(household).distinct())
        return labels.groupBy("component").count().count()

    timed("q347 stitching CC", stitch)

    # --- q353 aHash banded dedup at xN (rep-salted texts) -------------
    d = load(spark, SF_DIR, "documents").select("doc_id", "text")
    big_d = (
        d.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" r"), F.col("rep").cast("string")).alias(
                "text"
            ),
        )
        .localCheckpoint()
    )
    print(f"documents x{FACTOR}: {big_d.count()} rows", flush=True)
    from g_etl_spark.queries.multimodal import (
        _ahash_candidate_pairs,
        _ahash_hashes,
    )

    def ahash():
        # the SHIPPED pipeline, not a copy — probes measure q353's code
        return _ahash_candidate_pairs(_ahash_hashes(big_d)).count()

    timed("q353 aHash candidate pairs", ahash)

    # --- q346 Shapley at xN --------------------------------------------
    from g_etl_spark.queries import queries as load_queries

    full_ev = load(spark, SF_DIR, "events")
    big_full = (
        full_ev.crossJoin(reps)
        .withColumn("user_id", F.col("user_id") + F.col("rep") * 1_000_000)
        .withColumn("event_id", F.col("event_id") + F.col("rep") * 100_000_000)
        .drop("rep")
    )
    big_full.createOrReplaceTempView("_probe_events")

    def shapley():
        conv = (
            big_full.filter(F.col("event_type") == "purchase")
            .groupBy("user_id")
            .agg(F.min("ts").alias("pts"))
        )
        touched = (
            big_full.join(conv, "user_id")
            .filter(F.col("ts") < F.col("pts"))
            .groupBy("user_id")
            .agg(
                F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("bv"),
                F.max(F.when(F.col("event_type") == "click", 2).otherwise(0)).alias("bc"),
                F.max(F.when(F.col("event_type") == "signup", 4).otherwise(0)).alias("bs"),
                F.max(F.when(F.col("event_type") == "error", 8).otherwise(0)).alias("be"),
            )
        )
        masks = (
            conv.join(touched, "user_id", "left")
            .select(
                F.coalesce(
                    F.col("bv") + F.col("bc") + F.col("bs") + F.col("be"), F.lit(0)
                ).alias("mask")
            )
            .groupBy("mask")
            .count()
        )
        return masks.count()

    timed("q346 Shapley mask rollup", shapley)


if __name__ == "__main__":
    main()
