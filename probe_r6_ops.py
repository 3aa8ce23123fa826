"""Round-6 operator scale probes: the four new families at 100x their
bench scale, deterministic replication (same scheme as probe_r5_ops).
One JSON line to stdout; commentary to stderr.

    python probe_r6_ops.py [factor]

Probes (base sf0.1):
- q196 RFM sketch: the corpus touch is ONE purchase-keyed user agg;
  the histogram/quartile machinery runs on O(70)-bucket relations
  whose size is INVARIANT in corpus scale — measured to show the
  no-global-sort claim, vs the exact ntile sibling on the same data.
- q197 equi-depth sketch: one combining agg to |types|xO(70) cells;
  everything after is sketch-sized. Also timed vs the exact q189
  ntile sibling at the same scale.
- q198 two-pass concurrency: sessionization is the one user-keyed
  exchange; the sweep cumsum runs day-partitioned (no
  single-partition window at any scale).
- q199 minhash eval: banded candidates are Sigma bucket^2 — text is
  rep-salted (as a real corpus: replicas are NOT byte-dups, q153's
  scheme) so bucket sizes stay bounded and candidate growth linear.
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

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark("probe_r6_ops")
    out: dict[str, float] = {"factor": factor}

    def timed(name: str, fn) -> None:
        spark.catalog.clearCache()
        t0 = time.time()
        n = fn()
        out[name] = round(time.time() - t0, 2)
        print(f"# {name}: {n} rows in {out[name]}s", file=sys.stderr)

    e = load(spark, SF_DIR, "events")
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    big = (
        e.crossJoin(reps)
        .withColumn("event_id", F.col("event_id") + F.col("rep") * 1_000_000)
        .withColumn("user_id", F.col("user_id") + F.col("rep") * 10_000)
        .drop("rep")
    )
    out["events_rows"] = big.count()

    # ---- q196 RFM sketch vs exact ntile sibling -------------------
    def rfm(sketch: bool):
        def run():
            p = big.filter(F.col("event_type") == "purchase")
            bound = p.agg(F.max(F.col("ts").cast("date")).alias("endd"))
            rfm_rel = (
                p.groupBy("user_id")
                .agg(
                    F.max(F.col("ts").cast("date")).alias("lastd"),
                    F.count(F.lit(1)).alias("freq"),
                    F.floor(F.round(F.sum("value"), 4) * 1000).cast("long").alias("mons"),
                )
                .crossJoin(F.broadcast(bound))
                .select(
                    "user_id", F.datediff("endd", "lastd").alias("rec"), "freq", "mons"
                )
            )
            if not sketch:
                q = rfm_rel.select(
                    F.ntile(4).over(Window.orderBy("rec", "user_id")).alias("r_q"),
                    F.ntile(4).over(Window.orderBy(F.desc("freq"), "user_id")).alias("f_q"),
                    F.ntile(4).over(Window.orderBy(F.desc("mons"), "user_id")).alias("m_q"),
                )
                return q.groupBy("r_q", "f_q", "m_q").count().count()
            rfm_rel = rfm_rel.persist()
            n = rfm_rel.groupBy().agg(F.count(F.lit(1)).alias("n"))

            def qmap(axis, desc):
                s = F.col(axis).cast("long").cast("string")
                h = rfm_rel.groupBy(
                    F.length(s).alias("sl"), F.substring(s, 1, 1).cast("long").alias("fd")
                ).agg(F.count(F.lit(1)).alias("c"))
                x, y = h.alias("x"), h.alias("y")
                if desc:
                    better = (F.col("y.sl") > F.col("x.sl")) | (
                        (F.col("y.sl") == F.col("x.sl")) & (F.col("y.fd") > F.col("x.fd"))
                    )
                else:
                    better = (F.col("y.sl") < F.col("x.sl")) | (
                        (F.col("y.sl") == F.col("x.sl")) & (F.col("y.fd") < F.col("x.fd"))
                    )
                cb = (
                    x.join(F.broadcast(y), better, "left")
                    .groupBy(F.col("x.sl").alias("sl"), F.col("x.fd").alias("fd"))
                    .agg(F.coalesce(F.sum("y.c"), F.lit(0)).alias("cb"))
                )
                return cb.crossJoin(F.broadcast(n)).select(
                    "sl", "fd",
                    F.least(F.lit(4), F.floor(4.0 * F.col("cb") / F.col("n")).cast("long") + 1).alias("q"),
                )

            outr = rfm_rel
            for axis, desc, qn in (("rec", False, "r_q"), ("freq", True, "f_q"), ("mons", True, "m_q")):
                s = F.col(axis).cast("long").cast("string")
                outr = (
                    outr.withColumns({"_sl": F.length(s), "_fd": F.substring(s, 1, 1).cast("long")})
                    .join(F.broadcast(qmap(axis, desc).withColumnsRenamed({"sl": "_sl", "fd": "_fd", "q": qn})), ["_sl", "_fd"])
                    .drop("_sl", "_fd")
                )
            r = outr.groupBy("r_q", "f_q", "m_q").count().count()
            rfm_rel.unpersist()
            return r

        return run

    timed("q196_rfm_sketch_sec", rfm(sketch=True))
    timed("q196_exact_ntile_sibling_sec", rfm(sketch=False))

    # ---- q197 equi-depth sketch vs exact ntile sibling ------------
    def eqd_sketch():
        pos = big.filter(F.col("value") > 0.001).select(
            "event_type", "value", F.floor(F.col("value") * 1000).cast("long").alias("s")
        )
        b = (
            pos.withColumn("sl", F.length(F.col("s").cast("string")))
            .withColumn("fd", F.substring(F.col("s").cast("string"), 1, 1).cast("long"))
            .groupBy("event_type", "sl", "fd")
            .agg(F.count(F.lit(1)).alias("c"), F.min("value").alias("mnv"),
                 F.max("value").alias("mxv"), F.sum("value").alias("sv"))
        )
        x, y = b.alias("x"), b.alias("y")
        better = (F.col("y.event_type") == F.col("x.event_type")) & (
            (F.col("y.sl") < F.col("x.sl"))
            | ((F.col("y.sl") == F.col("x.sl")) & (F.col("y.fd") < F.col("x.fd")))
        )
        cb = (
            x.join(F.broadcast(y), better, "left")
            .groupBy(F.col("x.event_type").alias("event_type"), F.col("x.sl").alias("sl"), F.col("x.fd").alias("fd"))
            .agg(F.coalesce(F.sum("y.c"), F.lit(0)).alias("cbefore"))
        )
        n = b.groupBy("event_type").agg(F.sum("c").alias("n"))
        d = (
            b.join(F.broadcast(cb), ["event_type", "sl", "fd"])
            .join(F.broadcast(n), "event_type")
            .select("event_type",
                    F.least(F.lit(10), F.floor(10.0 * F.col("cbefore") / F.col("n")).cast("long") + 1).alias("bucket"),
                    "c", "mnv", "mxv", "sv")
        )
        return d.groupBy("event_type", "bucket").agg(F.sum("c").alias("n")).count()

    def eqd_exact():
        w = Window.partitionBy("event_type").orderBy("value", "event_id")
        return (
            big.select("event_type", "value", F.ntile(10).over(w).alias("bucket"))
            .groupBy("event_type", "bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .count()
        )

    timed("q197_sketch_sec", eqd_sketch)
    timed("q197_exact_ntile_sibling_sec", eqd_exact)

    # ---- q198 two-pass concurrency --------------------------------
    def twopass():
        iv = big.select("user_id", F.unix_micros("ts").alias("s"),
                        (F.unix_micros("ts") + F.lit(1_800_000_000)).alias("e"))
        order = Window.partitionBy("user_id").orderBy("s", "e")
        prev = order.rowsBetween(Window.unboundedPreceding, -1)
        run = order.rowsBetween(Window.unboundedPreceding, 0)
        isl = iv.withColumn("new_island", F.when(F.col("s") > F.max("e").over(prev), 1).otherwise(0)) \
                .withColumn("island", F.sum("new_island").over(run))
        sessions = isl.groupBy("user_id", "island").agg(F.min("s").alias("s"), F.max("e").alias("e"))
        sweep = sessions.select(
            F.explode(F.array(
                F.struct(F.col("s").alias("t"), F.lit(1).alias("delta")),
                F.struct(F.col("e").alias("t"), F.lit(-1).alias("delta")),
            )).alias("b")
        ).select("b.t", "b.delta", F.floor(F.col("b.t") / F.lit(86_400_000_000)).alias("p"))
        ps = sweep.groupBy("p").agg(F.sum("delta").alias("sd"))
        x, y = ps.alias("x"), ps.alias("y")
        offsets = (
            x.join(F.broadcast(y), F.col("y.p") < F.col("x.p"), "left")
            .groupBy(F.col("x.p").alias("p"))
            .agg(F.coalesce(F.sum("y.sd"), F.lit(0)).alias("off"))
        )
        wloc = Window.partitionBy("p").orderBy("t", "delta").rowsBetween(Window.unboundedPreceding, 0)
        running = sweep.join(F.broadcast(offsets), "p").withColumn(
            "conc", F.sum("delta").over(wloc) + F.col("off"))
        return running.agg(F.max("conc")).count()

    timed("q198_twopass_sec", twopass)

    # ---- q199 minhash eval at a rep-salted corpus -----------------
    from g_etl_spark.operators import dedup as D

    doc_factor = max(1, factor // 10)  # 5k docs x3 variants -> 150k docs at 100/10
    d = load(spark, SF_DIR, "documents").select("doc_id", "text")
    dreps = spark.range(doc_factor).select(F.col("id").alias("rep"))
    bigd = (
        d.crossJoin(dreps)
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 10_000_000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" rep"), F.col("rep")))
        .drop("rep")
    )
    corpus = (
        bigd.unionByName(bigd.select((F.col("doc_id") + 2_000_000).alias("doc_id"), "text"))
    )
    out["q199_docs"] = corpus.count()

    def minhash_eval():
        cand = D.minhash_candidates(corpus, "doc_id", "text")
        da = corpus.select(F.col("doc_id").alias("id_a"), F.col("text").alias("text_a"))
        db = corpus.select(F.col("doc_id").alias("id_b"), F.col("text").alias("text_b"))
        scored = cand.join(da, "id_a").join(db, "id_b").select(
            (D.token_set_jaccard(F.col("text_a"), F.col("text_b")) >= 0.7).alias("v"))
        return scored.groupBy("v").count().count()

    timed("q199_minhash_eval_sec", minhash_eval)


    # ---- q200 ER at 1.5M x 2 records, finer blocking key ----------
    # Blocking on nation alone is the sf-0.1 key; at 3M records the
    # docstring's "finer key" path is what must hold: block on
    # (nation, floor(acctbal/100)) and measure wall + planted recall
    # (the penny drift can cross a /100 boundary, so recall is the
    # honest number, not an assert).
    cust = load(spark, SF_DIR, "customer")
    creps = spark.range(factor).select(F.col("id").alias("rep"))
    bigc = (
        cust.crossJoin(creps)
        .withColumn("c_custkey", F.col("c_custkey") + F.col("rep") * 1_000_000)
        .withColumn("c_acctbal", F.round(F.col("c_acctbal") + F.col("rep") * 0.07, 2))
        .drop("rep")
    )
    out["er_records"] = bigc.count() * 2

    def er():
        a = bigc.select(
            F.col("c_custkey").alias("akey"), "c_name", "c_nationkey",
            "c_acctbal", "c_mktsegment",
            F.floor(F.col("c_acctbal") / 100).alias("bb"),
        )
        b = bigc.select(
            (F.col("c_custkey") + 100_000_000).alias("bkey"),
            F.when(F.col("c_custkey") % 2 == 0, F.upper("c_name")).otherwise(F.col("c_name")).alias("c_name"),
            "c_nationkey",
            F.when(F.col("c_custkey") % 3 == 0, F.round(F.col("c_acctbal") + 0.01, 2)).otherwise(F.col("c_acctbal")).alias("c_acctbal"),
            F.when(F.col("c_custkey") % 5 == 0, F.lit("UNKNOWN")).otherwise(F.col("c_mktsegment")).alias("c_mktsegment"),
        ).withColumn("bb", F.floor(F.col("c_acctbal") / 100))
        import math
        lg2 = lambda m, u: F.lit(float(math.log2(m / u)))
        aa, bbb = a.alias("a"), b.alias("b")
        score = (
            F.when(F.lower(F.col("a.c_name")) == F.lower(F.col("b.c_name")), lg2(0.95, 0.005)).otherwise(lg2(0.05, 0.995))
            + F.when(F.abs(F.col("a.c_acctbal") - F.col("b.c_acctbal")) <= 0.02, lg2(0.9, 0.05)).otherwise(lg2(0.1, 0.95))
            + F.when(F.col("a.c_mktsegment") == F.col("b.c_mktsegment"), lg2(0.85, 0.25)).otherwise(lg2(0.15, 0.75))
        )
        pairs = aa.join(
            bbb,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey")) & (F.col("a.bb") == F.col("b.bb")),
        ).select(
            F.round(score, 4).alias("score"),
            F.when(F.col("b.bkey") - 100_000_000 == F.col("a.akey"), 1).otherwise(0).alias("is_truth"),
        )
        res = pairs.filter(F.col("score") >= 8.0).agg(
            F.count(F.lit(1)).alias("links"), F.sum("is_truth").alias("hits")
        ).collect()[0]
        out["er_link_recall"] = round(res["hits"] / bigc.count(), 4) if res["hits"] else 0.0
        return res["links"]

    timed("q200_er_sec", er)

    # ---- q201 MI at 10M events ------------------------------------
    def mi():
        obs = big.groupBy(
            "event_type", (F.dayofweek(F.col("ts").cast("date")) - 1).alias("dow")
        ).agg(F.count(F.lit(1)).cast("double").alias("o"))
        return obs.count()

    timed("q201_mi_grid_sec", mi)

    # ---- q202 negative sampling at x25 order volume ---------------
    o = load(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
    f25 = max(1, factor // 4)
    oreps = spark.range(f25).select(F.col("id").alias("rep"))
    bigo = (
        o.crossJoin(oreps)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("rep") * 10_000_000)
        .withColumn("o_custkey", F.col("o_custkey") + F.col("rep") * 100_000)
        .drop("rep")
    )
    bigli = (
        li.crossJoin(oreps)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("rep") * 10_000_000)
        .drop("rep")
    )

    def negsample():
        np_ = load(spark, SF_DIR, "part").agg(F.count(F.lit(1)).alias("np"))
        pos = (
            bigo.join(bigli, bigo["o_orderkey"] == bigli["l_orderkey"])
            .select("o_custkey", "l_partkey").distinct()
        )
        users = pos.select("o_custkey").distinct()
        idx = spark.range(12).select(F.col("id").alias("i"))
        cand = (
            users.crossJoin(F.broadcast(idx)).crossJoin(F.broadcast(np_))
            .select("o_custkey", "i",
                    (((F.col("o_custkey") * 2654435761 + F.col("i") * 48611) % 2147483647) % F.col("np")).alias("cand_part"))
        )
        ca, po = cand.alias("ca"), pos.alias("po")
        neg = ca.join(po, (F.col("ca.o_custkey") == F.col("po.o_custkey")) & (F.col("ca.cand_part") == F.col("po.l_partkey")), "left_anti")
        dedup = neg.groupBy("o_custkey", "cand_part").agg(F.min("i").alias("i"))
        rk = F.row_number().over(Window.partitionBy("o_custkey").orderBy("i"))
        return dedup.select("o_custkey", rk.alias("rk")).filter(F.col("rk") <= 4).count()

    timed("q202_negsample_sec", negsample)

    # ---- q203 sketch merge at 100x rep-salted docs ----------------
    def sketch_merge():
        dd = (
            load(spark, SF_DIR, "documents")
            .crossJoin(spark.range(factor).select(F.col("id").alias("rep")))
            .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 1_000_000)
            .withColumn("source", F.concat(F.col("source"), F.lit("_"), F.col("rep") % 10))
            .drop("rep")
            .filter(F.col("n_chars") > 0)
        )
        s = F.col("n_chars").cast("string")
        b = (
            dd.select("source", F.length(s).alias("sl"), F.substring(s, 1, 1).cast("long").alias("fd"))
            .groupBy("source", "sl", "fd").agg(F.count(F.lit(1)).alias("c"))
        )
        return b.groupBy("sl", "fd").agg(F.sum("c").alias("c")).count()

    timed("q203_sketch_merge_sec", sketch_merge)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
