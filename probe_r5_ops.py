"""Round-5 operator scale probes: the new families at 100× their
bench scale, deterministic replication (same scheme as
scale_probe.py / probe_r4_ops.py). One-line JSON to stdout;
commentary to stderr.

    python probe_r5_ops.py [factor]

Probes (base sf0.1):
- q149 KMV source similarity: the corpus-touching distinct is the
  ONLY stage that grows; signatures stay |sources|×k, so the
  pairwise arithmetic is invariant — measured to show the sketch
  property, not just claim it.
- q153 shingle containment: replication multiplies shingle df, so
  the rare-shingle cap prunes replicated boilerplate exactly like
  q128's df cap — the bound that keeps candidate pairs Σ df², not
  corpus².
- q154 last-touch attribution: 1M events through ONE user_id
  window exchange (the no-join as-of claim).
- q157 Kaplan-Meier: corpus cost is one user-level agg; all KM
  arithmetic runs on a ≤31-row relation regardless of scale.
- q158 power iteration: two passes over 50k vectors, each
  exchanging 64 mergeable cells (distributed-PCA claim).
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
    spark = get_spark("probe_r5_ops")
    out: dict[str, float] = {"replication": factor}

    def timed(name: str, fn) -> None:
        spark.catalog.clearCache()
        t0 = time.time()
        n = fn()
        dt = round(time.time() - t0, 2)
        out[name] = dt
        print(f"# {name}: {n} rows in {dt}s", file=sys.stderr)

    reps = spark.range(factor).select(F.col("id").alias("rep"))

    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    big_docs = (
        docs.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 1_000_000)
        .withColumn(
            "text", F.concat(F.col("text"), F.lit(" rep"), F.col("rep"))
        )
        .drop("rep")
    )
    out["docs"] = n_docs * factor

    def kmv():
        h = big_docs.select(
            "source",
            F.conv(F.substring(F.md5("text"), 1, 8), 16, 10)
            .cast("long")
            .alias("h"),
        ).distinct()
        w = Window.partitionBy("source").orderBy("h")
        sig = (
            h.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 32)
            .select("source", "h")
        )
        return sig.count()

    timed("kmv_signatures_sec", kmv)

    def containment():
        toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        staged = big_docs.select("doc_id", toks.alias("t"))
        n = F.size("t") - 2
        grams = staged.filter(n > 0).select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), n),
                        lambda i: F.array_join(F.slice(F.col("t"), i, 3), " "),
                    )
                )
            ).alias("g"),
        )
        # persist barrier on grams/rsh tried and REJECTED on an
        # interleaved A/B at this scale: 56.6/48.8 s lazy vs
        # 73.6/57.9 s persisted — see the q153 docstring
        rare = (
            grams.groupBy("g")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= 20)
        )
        rsh = grams.join(rare.select("g"), "g")
        sizes = rsh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
        x, y = rsh.alias("x"), rsh.alias("y")
        inter = (
            x.join(
                y,
                (F.col("x.g") == F.col("y.g"))
                & (F.col("x.doc_id") != F.col("y.doc_id")),
            )
            .groupBy(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
            .agg(F.count(F.lit(1)).alias("common"))
        )
        return (
            inter.join(sizes.withColumnRenamed("doc_id", "a"), "a")
            .filter(
                (F.col("n_sh") >= 5)
                & (F.col("common").cast("double") / F.col("n_sh") >= 0.8)
            )
            .count()
        )

    timed("shingle_containment_sec", containment)

    ev = load(spark, sf_dir, "events")
    n_ev = ev.count()
    big_ev = (
        ev.crossJoin(reps)
        .withColumn("event_id", F.col("event_id") + F.col("rep") * 1_000_000)
        .withColumn("user_id", F.col("user_id") + F.col("rep") * 10_000)
        .drop("rep")
    )
    out["events"] = n_ev * factor

    def attribution():
        ch = F.concat(
            F.lit("ch"),
            (F.get_json_object("props", "$.k").cast("int") % 4).cast("string"),
        )
        flagged = big_ev.select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            "value",
            F.when(F.col("event_type") == "click", ch).alias("click_ch"),
        )
        w = (
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return (
            flagged.withColumn("ch", F.last("click_ch", ignorenulls=True).over(w))
            .filter(F.col("event_type") == "purchase")
            .groupBy(F.coalesce(F.col("ch"), F.lit("organic")).alias("channel"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("rev"))
            .count()
        )

    timed("attribution_window_sec", attribution)

    def survival():
        spans = big_ev.groupBy("user_id").agg(
            F.min("ts").cast("date").alias("f"),
            F.max("ts").cast("date").alias("l"),
        )
        bound = spans.agg(F.max("l").alias("endd"))
        per_user = spans.crossJoin(F.broadcast(bound)).select(
            F.datediff("l", "f").alias("lifetime"),
            (F.col("l") < F.date_sub(F.col("endd"), 3)).alias("churned"),
        )
        return (
            per_user.groupBy("lifetime")
            .agg(
                F.count(F.lit(1)).alias("n_all"),
                F.count(F.when(F.col("churned"), 1)).alias("n_death"),
            )
            .count()
        )

    timed("survival_user_agg_sec", survival)

    emb_factor = max(1, factor // 4)  # 2k base * 25 = 50k vectors
    emb = load(spark, sf_dir, "embeddings")
    n_emb = emb.count()
    big_emb = (
        emb.crossJoin(spark.range(emb_factor).select(F.col("id").alias("rep")))
        .withColumn("vec_id", F.col("vec_id") + F.col("rep") * 1_000_000)
        .drop("rep")
    )
    out["vectors"] = n_emb * emb_factor

    def power_iter():
        x = big_emb.select(
            "vec_id",
            F.transform(F.col("embedding"), lambda c: c.cast("double")).alias("x"),
        )
        ex = x.select(
            "vec_id",
            F.element_at("x", 1).alias("v0"),
            F.posexplode("x"),
        )
        z1_rows = (
            ex.groupBy("pos")
            .agg(F.sum(F.col("col") * F.col("v0")).alias("z"))
            .orderBy("pos")
            .collect()
        )
        v1 = F.array(*[F.lit(float(r["z"])) for r in z1_rows])
        y2 = x.select(
            "vec_id",
            F.aggregate(
                F.zip_with(F.col("x"), v1, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, t: acc + t,
            ).alias("y"),
        )
        return (
            x.join(y2, "vec_id")
            .select(F.posexplode("x"), F.col("y"))
            .groupBy("pos")
            .agg(F.sum(F.col("col") * F.col("y")).alias("z"))
            .count()
        )

    timed("power_iteration_sec", power_iter)

    def loghist_sketch():
        pos = big_ev.filter(F.col("value") > 0.001).select(
            "event_type",
            F.floor(F.col("value") * 1000).cast("long").alias("s"),
        )
        return (
            pos.withColumn("slen", F.length(F.col("s").cast("string")))
            .withColumn(
                "fd", F.substring(F.col("s").cast("string"), 1, 1).cast("long")
            )
            .groupBy("event_type", "slen", "fd")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .count()
        )

    timed("loghist_buckets_sec", loghist_sketch)

    def event_paths():
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        p = big_ev.select(
            F.concat(
                F.col("event_type"),
                F.lit(">"),
                F.lead("event_type", 1).over(w),
                F.lit(">"),
                F.lead("event_type", 2).over(w),
            ).alias("path")
        )
        return (
            p.filter(F.col("path").isNotNull())
            .groupBy("path")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), "path")
            .limit(10)
            .count()
        )

    timed("event_paths_sec", event_paths)

    def bitmap_retention():
        di = F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        )
        presence = big_ev.select(
            di.cast("long").alias("di"), "user_id"
        ).distinct()
        bm = presence.groupBy(
            "di", (F.col("user_id") / 62).cast("long").alias("word")
        ).agg(
            F.expr(
                "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(user_id % 62 AS INT)))"
            ).alias("b")
        )
        a, p = bm.alias("a"), bm.alias("p")
        return (
            a.join(
                p,
                (F.col("p.word") == F.col("a.word"))
                & (F.col("p.di") == F.col("a.di") - 1),
            )
            .groupBy(F.col("a.di"))
            .agg(F.sum(F.bit_count(F.col("a.b").bitwiseAND(F.col("p.b")))))
            .count()
        )

    timed("bitmap_retention_sec", bitmap_retention)

    def pq_assign():
        cast_d = lambda col: F.transform(col, lambda v: v.cast("double"))  # noqa: E731
        cb = F.broadcast(
            big_emb.filter(F.col("vec_id") < 4).select(
                F.col("vec_id").alias("c"), cast_d(F.col("embedding")).alias("ce")
            )
        )
        subs = F.broadcast(
            spark.range(0, 8).select(F.col("id").cast("int").alias("s"))
        )
        j = (
            big_emb.select("vec_id", cast_d(F.col("embedding")).alias("x"))
            .crossJoin(cb)
            .crossJoin(subs)
        )
        sq = F.zip_with(
            F.slice(F.col("x"), F.col("s") * 8 + 1, 8),
            F.slice(F.col("ce"), F.col("s") * 8 + 1, 8),
            lambda u, v: (u - v) * (u - v),
        )
        dist = F.round(F.aggregate(sq, F.lit(0.0), lambda acc, t: acc + t), 9)
        best = (
            j.select("vec_id", "s", "c", dist.alias("dist"))
            .groupBy("vec_id", "s")
            .agg(F.min(F.struct("dist", "c")).alias("b"))
        )
        return best.groupBy("s", F.col("b.c")).count().count()

    timed("pq_assignment_sec", pq_assign)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
