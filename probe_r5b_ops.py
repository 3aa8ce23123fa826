"""Round-5 batch-2 operator scale probes (the eval/diagnostic
family q176-q187) at 100x their bench scale, deterministic
replication — same scheme as probe_r5_ops.py. One-line JSON to
stdout; commentary to stderr.

    python probe_r5b_ops.py [factor]

Probes (base sf0.1):
- q176 ACF: the corpus collapses to |types|x|days| daily counts in
  one combining agg — the 7-lag arithmetic is scale-invariant, so
  the probe shows pure rollup throughput.
- q177 AUC: one combining agg to |distinct scores| + one window —
  measured with raw float scores (worst case: |distinct| ~ corpus)
  AND with scores quantized to cents (the documented 100 TB path:
  bounded midrank set, same formula).
- q183 Mahalanobis: the 64-way posexplode is the cost — linear
  scan-bound fan-out, d-row stats broadcast back, no corpus
  shuffle.
- q184 bootstrap: 32 deterministic weight evaluations per row,
  map-side only — the probe shows the B-replicate blow-up is
  arithmetic, not data movement (one 32-row exchange at the end).
- q185 next-event backtest: ONE user-keyed window produces all
  train+test transitions; model fit+broadcast eval never reshuffle.
- q187 readability: three regexes per row + one |sources|-row agg —
  scan-bound text scoring.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyspark.sql.functions as F
from pyspark.sql import Window

from g_etl_spark.session import get_spark
from g_etl_spark.tables import load


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe_r5b_ops")
    out: dict[str, float] = {"replication": factor}

    def timed(name: str, fn) -> None:
        spark.catalog.clearCache()
        t0 = time.time()
        n = fn()
        dt = round(time.time() - t0, 2)
        out[name] = dt
        print(f"# {name}: {n} rows in {dt}s", file=sys.stderr)

    reps = spark.range(factor).select(F.col("id").alias("rep"))

    ev = load(spark, sf_dir, "events")
    n_ev = ev.count()
    big_ev = (
        ev.crossJoin(reps)
        .withColumn("event_id", F.col("event_id") + F.col("rep") * 1_000_000)
        .withColumn("user_id", F.col("user_id") + F.col("rep") * 10_000)
        .drop("rep")
    )
    out["events"] = n_ev * factor

    def acf():
        daily = big_ev.groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        ).agg(F.count(F.lit(1)).cast("double").alias("x"))
        stats = daily.groupBy("event_type").agg(
            F.avg("x").alias("mu"),
            (
                F.sum(F.col("x") * F.col("x"))
                - F.count(F.lit(1)) * F.avg("x") * F.avg("x")
            ).alias("ss"),
        )
        lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag_k"))
        d = daily.crossJoin(F.broadcast(lags))
        dl = daily.select(
            F.col("event_type").alias("et2"),
            F.col("day").alias("day2"),
            F.col("x").alias("xlag"),
        )
        pairs = d.join(
            dl,
            (F.col("et2") == F.col("event_type"))
            & (F.col("day2") == F.date_sub(F.col("day"), F.col("lag_k"))),
        )
        return (
            pairs.join(stats, "event_type")
            .groupBy("event_type", "lag_k")
            .agg(
                (
                    F.sum(
                        (F.col("x") - F.col("mu")) * (F.col("xlag") - F.col("mu"))
                    )
                    / F.max("ss")
                ).alias("acf")
            )
            .count()
        )

    timed("acf_daily_rollup_sec", acf)

    o = load(spark, sf_dir, "orders")
    n_o = o.count()
    big_o = (
        o.crossJoin(reps)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("rep") * 10_000_000)
        .withColumn(
            "o_totalprice", F.col("o_totalprice") + F.col("rep") * 0.000001
        )
        .drop("rep")
    )
    out["orders"] = n_o * factor

    def auc(quantize: bool):
        score = (
            F.round(F.col("o_totalprice"), 2)
            if quantize
            else F.col("o_totalprice")
        )
        scored = big_o.select(
            score.alias("score"),
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
            ).otherwise(0).alias("label"),
        )
        by_score = scored.groupBy("score").agg(
            F.count(F.lit(1)).cast("double").alias("cnt"),
            F.sum("label").cast("double").alias("pos"),
        )
        w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
        ranked = by_score.select(
            "pos",
            "cnt",
            (
                F.coalesce(F.sum("cnt").over(w), F.lit(0.0))
                + (F.col("cnt") + 1) / 2
            ).alias("avg_rank"),
        )
        return ranked.agg(
            (
                (
                    F.sum(F.col("pos") * F.col("avg_rank"))
                    - F.sum("pos") * (F.sum("pos") + 1) / 2
                )
                / (F.sum("pos") * (F.sum("cnt") - F.sum("pos")))
            ).alias("auc")
        ).count()

    timed("auc_raw_scores_sec", lambda: auc(False))
    timed("auc_cent_quantized_sec", lambda: auc(True))

    def bootstrap():
        reps32 = spark.range(0, 32).select(F.col("id").alias("b"))
        w = (
            (F.col("o_orderkey") * 2654435761 + F.col("b") * 48611 + 12345)
            % 2147483647
        ) % 3
        weighted = (
            big_o.crossJoin(F.broadcast(reps32))
            .groupBy("b")
            .agg(
                F.sum(w).alias("wsum"),
                F.sum(w * F.col("o_totalprice")).alias("wtotal"),
            )
        )
        return weighted.count()

    timed("bootstrap_32rep_sec", bootstrap)

    def next_event():
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        seq = big_ev.select(
            "event_type",
            F.lead("event_type").over(w).alias("next_type"),
            F.lead("ts").over(w).alias("next_ts"),
        ).where(F.col("next_type").isNotNull())
        trans = seq.select(
            F.col("event_type").alias("prev"),
            F.col("next_type").alias("nxt"),
            F.when(
                F.col("next_ts") < F.lit("2024-01-20").cast("timestamp"), 1
            ).otherwise(0).alias("is_train"),
        )
        counts = (
            trans.where(F.col("is_train") == 1)
            .groupBy("prev", "nxt")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        rn = Window.partitionBy("prev").orderBy(F.desc("c"), F.asc("nxt"))
        model = (
            counts.withColumn("rn", F.row_number().over(rn))
            .where(F.col("rn") == 1)
            .select("prev", F.col("nxt").alias("pred"))
        )
        return (
            trans.where(F.col("is_train") == 0)
            .join(F.broadcast(model), "prev")
            .groupBy("prev", "pred")
            .agg(F.count(F.lit(1)).alias("n_test"))
            .count()
        )

    timed("next_event_backtest_sec", next_event)

    emb_factor = max(1, factor // 4)
    emb = load(spark, sf_dir, "embeddings")
    n_emb = emb.count()
    big_emb = (
        emb.crossJoin(spark.range(emb_factor).select(F.col("id").alias("rep")))
        .withColumn("vec_id", F.col("vec_id") + F.col("rep") * 1_000_000)
        .drop("rep")
    )
    out["vectors"] = n_emb * emb_factor

    def mahalanobis():
        expl = big_emb.select(
            "vec_id", F.posexplode(F.col("embedding"))
        ).select(
            "vec_id",
            (F.col("pos") + 1).alias("dim"),
            F.col("col").cast("double").alias("x"),
        )
        stats = expl.groupBy("dim").agg(
            F.avg("x").alias("mu"), F.var_samp("x").alias("v")
        )
        d2 = (
            expl.join(F.broadcast(stats), "dim")
            .groupBy("vec_id")
            .agg(
                F.sum(F.pow(F.col("x") - F.col("mu"), 2) / F.col("v")).alias(
                    "dist2"
                )
            )
        )
        return d2.orderBy(F.desc("dist2"), F.asc("vec_id")).limit(20).count()

    timed("mahalanobis_explode_sec", mahalanobis)

    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    big_docs = (
        docs.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 1_000_000)
        .drop("rep")
    )
    out["docs"] = n_docs * factor

    def readability():
        def runs(col, pat):
            marked = F.regexp_replace(col, pat, "#")
            return (
                F.length(marked)
                - F.length(F.regexp_replace(marked, "#", ""))
            ).cast("double")

        toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        feats = big_docs.select(
            "source",
            F.size(toks).cast("double").alias("words"),
            F.greatest(runs(F.col("text"), r"[.!?]+"), F.lit(1.0)).alias(
                "sentences"
            ),
            F.greatest(
                runs(F.lower(F.col("text")), r"[aeiouy]+"), F.lit(1.0)
            ).alias("syllables"),
        )
        wps = F.col("words") / F.col("sentences")
        spw = F.col("syllables") / F.col("words")
        return (
            feats.groupBy("source")
            .agg(F.avg(206.835 - 1.015 * wps - 84.6 * spw).alias("avg_flesch"))
            .count()
        )

    timed("readability_scan_sec", readability)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
