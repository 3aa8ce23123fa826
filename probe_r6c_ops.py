"""Round-6 third-batch operator scale probes (q204-q212) at 25-100x
their bench scale, deterministic replication (same scheme as
probe_r5_ops / probe_r6_ops). One JSON line to stdout; commentary to
stderr.

    python probe_r6c_ops.py [factor]

What each probe is evidence FOR (base sf0.1):
- q204 Misra-Gries two-pass: pass 1 is map-side (no exchange); the
  claim is a BOUNDED intermediate (cap x partitions candidates vs
  |keys|), so the probe times it against the plain exact groupBy on
  the same 15M-row input — the sketch must not COST anything here,
  it buys memory-boundedness for free.
- q205 k-core peel: x25 DISJOINT graph copies (rep-shifted part and
  order keys) — peel ROUNDS are invariant under disjoint union, so
  the probe isolates per-round cost growth with |V|,|E|.
- q206 Holt: the recurrence runs on the calendar-bounded rollup; the
  corpus touch is the one combining agg — wall should track the scan.
- q208 chunking / q209 KDE: map-only fan-out / bounded-tile kernel.
- q210 MF gradient: x25 rep-shifted users+items (ratings x25); the
  exchange is |users|x4 + |items|x4 cells.
- q211 conformal: x100 events — the per-type calibration sort is the
  documented 100TB knob (q160 sketch replaces it); measure it
  honestly at 1.5M rows/type.
- q212 repeated spans: rep-SALTED docs (prefix token per replica:
  replicas are not byte-dups, the q153/q199 scheme) for the linear
  path, AND exact-copy replicas as the adversarial worst case where
  EVERY gram is duplicated and the island merge sees the full gram
  fan-out.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pandas as pd  # noqa: E402
import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from g_etl_spark.session import get_spark  # noqa: E402
from g_etl_spark.tables import load  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
_MG_CAP = 1000


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    small = max(factor // 4, 1)
    spark = get_spark("probe_r6c_ops")
    out: dict[str, float] = {"factor": factor}

    def timed(name: str, fn) -> None:
        spark.catalog.clearCache()
        t0 = time.time()
        n = fn()
        out[name] = round(time.time() - t0, 2)
        print(f"# {name}: {n} rows in {out[name]}s", file=sys.stderr)

    reps = spark.range(factor).select(F.col("id").alias("rep"))
    reps_small = spark.range(small).select(F.col("id").alias("rep"))

    # ---- q204: MG two-pass vs plain exact groupBy (same answer) ---
    o = load(spark, SF_DIR, "orders").select("o_custkey")
    big_o = o.crossJoin(reps).drop("rep")  # keys unchanged: HH set preserved
    out["orders_rows"] = big_o.count()

    def mg_two_pass():
        n_row = big_o.agg(F.count(F.lit(1)).alias("n"))

        def mg_partition(batches):
            # vectorized mergeable-summaries fold (mirrors q204)
            summary = pd.Series(dtype="int64")
            for pdf in batches:
                summary = summary.add(pdf["o_custkey"].value_counts(), fill_value=0)
                if len(summary) > _MG_CAP:
                    cut = summary.nlargest(_MG_CAP + 1).iloc[-1]
                    summary = summary[summary > cut] - cut
            yield pd.DataFrame({"o_custkey": summary.index.astype("int64")})

        cands = big_o.mapInPandas(mg_partition, "o_custkey long").distinct()
        return (
            big_o.join(F.broadcast(cands), "o_custkey", "left_semi")
            .groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias("c"))
            .crossJoin(F.broadcast(n_row))
            .where(F.col("c") * 1000 > F.col("n"))
            .count()
        )

    def exact_groupby():
        n = big_o.count()
        return (
            big_o.groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") * 1000 > n)
            .count()
        )

    timed("q204_mg_two_pass_sec", mg_two_pass)
    timed("q204_exact_groupby_sec", exact_groupby)

    # ---- q205: k-core peel on x(factor/4) disjoint graph copies ---
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
    big_li = (
        li.crossJoin(reps_small)
        .select(
            (F.col("l_orderkey") + F.col("rep") * 10_000_000).alias("l_orderkey"),
            (F.col("l_partkey") + F.col("rep") * 1_000_000).alias("l_partkey"),
        )
    )

    def kcore():
        l1, l2 = big_li.alias("l1"), big_li.alias("l2")
        pairs = (
            l1.join(
                l2,
                (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
                & (F.col("l1.l_partkey") < F.col("l2.l_partkey")),
            )
            .groupBy(F.col("l1.l_partkey").alias("a"), F.col("l2.l_partkey").alias("b"))
            .agg(F.count(F.lit(1)).alias("w"))
            .where(F.col("w") >= 2)
            .select("a", "b")
        )
        edges = (
            pairs.select(F.col("a").alias("u"), F.col("b").alias("v"))
            .unionAll(pairs.select(F.col("b").alias("u"), F.col("a").alias("v")))
            .persist()
        )
        cur = edges.select("u").distinct().localCheckpoint(eager=True)
        n_cur = cur.count()
        rounds = 0
        for _ in range(40):
            rounds += 1
            nxt = (
                edges.join(cur.withColumnRenamed("u", "cu"), F.col("u") == F.col("cu"))
                .drop("cu")
                .join(cur.withColumnRenamed("u", "cv"), F.col("v") == F.col("cv"))
                .groupBy("u")
                .agg(F.count(F.lit(1)).alias("d"))
                .where(F.col("d") >= 3)
                .select("u")
                .localCheckpoint(eager=True)
            )
            n_nxt = nxt.count()
            cur = nxt
            if n_nxt == n_cur:
                break
            n_cur = n_nxt
        edges.unpersist()
        print(f"# q205 rounds={rounds}", file=sys.stderr)
        return n_cur

    timed("q205_kcore_sec", kcore)

    # ---- q206: Holt recurrence over the x100 orders scan ----------
    big_ord = load(spark, SF_DIR, "orders").crossJoin(reps).drop("rep")

    def holt():
        daily = big_ord.groupBy(
            F.col("o_orderpriority").alias("p"), F.col("o_orderdate").cast("date").alias("d")
        ).agg(F.sum("o_totalprice").alias("y"))
        series = daily.groupBy("p").agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("d", "y"))), lambda s: s["y"]
            ).alias("ys")
        )
        acc0 = F.struct(
            F.element_at("ys", 1).alias("l"), F.lit(0.0).alias("b"), F.lit(0.0).alias("sse")
        )

        def step(acc, y):
            l_new = 0.5 * y + 0.5 * (acc["l"] + acc["b"])
            return F.struct(
                l_new.alias("l"),
                (0.3 * (l_new - acc["l"]) + 0.7 * acc["b"]).alias("b"),
                (acc["sse"] + (y - (acc["l"] + acc["b"])) * (y - (acc["l"] + acc["b"]))).alias("sse"),
            )

        return series.select(
            "p", F.aggregate(F.slice("ys", 2, F.size("ys") - 1), acc0, step).alias("h")
        ).count()

    timed("q206_holt_sec", holt)

    # ---- q208 / q212: documents, salted + exact-copy replicas -----
    d = load(spark, SF_DIR, "documents")
    salted = (
        d.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
            F.concat(F.lit("r"), F.col("rep"), F.lit(" "), F.col("text")).alias("text"),
        )
    )
    copies = (
        d.crossJoin(reps)
        .select((F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"), "text")
    )
    out["docs_rows"] = salted.count()

    def chunks():
        dd = salted.select("doc_id", F.split(F.trim("text"), " ").alias("toks"))
        n = F.size("toks")
        n_chunks = F.when(n <= 16, F.lit(1)).otherwise(
            F.floor((n - 16 + 11) / F.lit(12.0)) + 1
        )
        x = dd.select(
            "doc_id", "toks",
            F.explode(F.sequence(F.lit(0), n_chunks.cast("int") - 1)).alias("ci"),
        )
        start = F.col("ci") * 12 + 1
        return x.select(
            "doc_id", F.md5(F.concat_ws(" ", F.slice("toks", start, 16))).alias("h")
        ).count()

    timed("q208_chunks_sec", chunks)

    def spans(docs_df):
        def run():
            t = docs_df.select(
                "doc_id", F.split(F.trim("text"), " ").alias("toks")
            ).where(F.size("toks") >= 8)
            g = t.select(
                "doc_id", F.size("toks").alias("n"),
                F.explode(F.sequence(F.lit(1), F.size("toks") - 7)).alias("pos"), "toks",
            ).select(
                "doc_id", "n", "pos",
                F.concat_ws(" ", F.slice("toks", F.col("pos"), 8)).alias("gram"),
            )
            dfreq = (
                g.groupBy("gram").agg(F.countDistinct("doc_id").alias("dd"))
                .where(F.col("dd") >= 2).select("gram")
            )
            dup = g.join(dfreq, "gram").select(
                "doc_id", "n", "pos", (F.col("pos") + 7).alias("endp")
            )
            w = Window.partitionBy("doc_id").orderBy("pos")
            isl = dup.withColumn(
                "brk",
                F.when(
                    F.lag("endp").over(w).isNull() | (F.col("pos") > F.lag("endp").over(w)), 1
                ).otherwise(0),
            ).withColumn(
                "isl_id", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
            )
            merged = isl.groupBy("doc_id", "n", "isl_id").agg(
                (F.max("endp") - F.min("pos") + 1).alias("covered")
            )
            return merged.groupBy("doc_id").count().count()

        return run

    timed("q212_spans_salted_sec", spans(salted))
    timed("q212_spans_exact_copies_sec", spans(copies))

    # ---- q209: KDE kernel over x100 events ------------------------
    e = load(spark, SF_DIR, "events")
    big_e = (
        e.crossJoin(reps)
        .withColumn("event_id", F.col("event_id") + F.col("rep") * 1_000_000)
        .drop("rep")
    )

    def kde():
        lat = F.lit(55.0) + ((F.col("event_id") * 7919) % 1000) * F.lit(0.01)
        lng = F.lit(11.0) + ((F.col("event_id") * 104729) % 1200) * F.lit(0.01)
        lat_r = F.radians(lat)
        tx = F.floor((lng + 180.0) / 360.0 * 4096).cast("long")
        ty = F.floor(
            (1.0 - F.log(F.tan(lat_r) + 1.0 / F.cos(lat_r)) / F.lit(3.141592653589793))
            / 2.0 * 4096
        ).cast("long")
        r = big_e.select(tx.alias("tx"), ty.alias("ty")).groupBy("tx", "ty").agg(
            F.count(F.lit(1)).alias("n")
        )
        kern = F.array(
            *[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"), F.lit(wt).alias("w"))
                for dx, dy, wt in [
                    (0, 0, 4), (1, 0, 2), (-1, 0, 2), (0, 1, 2), (0, -1, 2),
                    (1, 1, 1), (1, -1, 1), (-1, 1, 1), (-1, -1, 1),
                ]
            ]
        )
        s = (
            r.select("tx", "ty", "n", F.explode(kern).alias("o"))
            .groupBy(
                (F.col("tx") + F.col("o.dx")).alias("sx"),
                (F.col("ty") + F.col("o.dy")).alias("sy"),
            )
            .agg(F.sum(F.col("n") * F.col("o.w")).alias("sm"))
        )
        return s.orderBy(F.desc("sm"), "sx", "sy").limit(20).count()

    timed("q209_kde_sec", kde)

    # ---- q210: MF gradient on x(factor/4) rep-shifted ratings -----
    big_ord2 = (
        load(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
        .crossJoin(reps_small)
        .select(
            (F.col("o_orderkey") + F.col("rep") * 10_000_000).alias("o_orderkey"),
            (F.col("o_custkey") + F.col("rep") * 1_000_000).alias("o_custkey"),
        )
    )
    big_li2 = (
        load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
        .crossJoin(reps_small)
        .select(
            (F.col("l_orderkey") + F.col("rep") * 10_000_000).alias("l_orderkey"),
            (F.col("l_partkey") + F.col("rep") * 1_000_000).alias("l_partkey"),
            "l_quantity",
        )
    )

    def mf():
        r = (
            big_ord2.join(big_li2, big_ord2["o_orderkey"] == big_li2["l_orderkey"])
            .groupBy(F.col("o_custkey").alias("u"), F.col("l_partkey").alias("i"))
            .agg(F.sum("l_quantity").cast("double").alias("r"))
        )

        def p_uf(u, f):
            return ((u * F.lit(2654435761) + f * F.lit(40503)) % 1009) / 1009.0 - 0.5

        def q_if(i, f):
            return ((i * F.lit(104729) + f * F.lit(48611)) % 1009) / 1009.0 - 0.5

        pred = None
        for f in range(4):
            term = p_uf(F.col("u"), F.lit(f)) * q_if(F.col("i"), F.lit(f))
            pred = term if pred is None else pred + term
        ee = r.select("u", "i", (F.col("r") - pred).alias("err"))
        ef = ee.select("u", "i", "err", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("f"))
        gp = ef.groupBy("u", "f").agg(F.sum(F.col("err") * q_if(F.col("i"), F.col("f"))).alias("s"))
        gq = ef.groupBy("i", "f").agg(F.sum(F.col("err") * p_uf(F.col("u"), F.col("f"))).alias("s"))
        a = gp.agg(F.sum(4 * F.col("s") * F.col("s"))).collect()[0][0]
        b = gq.agg(F.sum(4 * F.col("s") * F.col("s"))).collect()[0][0]
        return round(a + b, 2)

    timed("q210_mf_gradient_sec", mf)

    # ---- q211: conformal with the per-type sort at x100 -----------
    def conformal():
        ev = big_e.select(
            "event_type", "event_id",
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("vc"),
        )
        cal = ev.where(F.col("event_id") % 2 == 0)
        tst = ev.where(F.col("event_id") % 2 == 1)
        m = cal.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_t"), F.sum("vc").alias("s")
        )
        rs = F.abs(F.col("n_t") * F.col("vc") - F.col("s"))
        w = Window.partitionBy("event_type").orderBy(rs.asc(), F.col("event_id").asc())
        q = (
            cal.join(F.broadcast(m), "event_type")
            .withColumn("rs", rs)
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == F.ceil(0.9 * (F.col("n_t") + 1)).cast("long"))
            .select("event_type", "n_t", "s", F.col("rs").alias("qhat"))
        )
        return (
            tst.join(F.broadcast(q), "event_type")
            .groupBy("event_type")
            .agg(
                F.sum(
                    F.when(F.abs(F.col("n_t") * F.col("vc") - F.col("s")) <= F.col("qhat"), 1)
                    .otherwise(0)
                ).alias("hits")
            )
            .count()
        )

    timed("q211_conformal_sec", conformal)

    # ---- q213: native session_window at x100 ----------------------
    big_u = (
        e.crossJoin(reps)
        .withColumn("user_id", F.col("user_id") + F.col("rep") * 10_000)
        .withColumn("event_id", F.col("event_id") + F.col("rep") * 1_000_000)
        .drop("rep")
    )

    def session_window():
        per = big_u.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("sw")
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias("dur_s"),
        )
        return per.groupBy(F.floor(F.col("dur_s") / 600.0).alias("b")).count().count()

    timed("q213_session_window_sec", session_window)

    # ---- q214: DBSCAN neighborhood at x10 density ------------------
    # density scales the per-bucket product QUADRATICALLY (both join
    # sides grow), so the density axis is probed at x10, not x100
    db = (
        e.crossJoin(spark.range(10).select(F.col("id").alias("rep")))
        .withColumn("event_id", F.col("event_id") + F.col("rep") * 1_000_000)
        .drop("rep")
    )

    def dbscan():
        lat = F.lit(55.0) + ((F.col("event_id") * 7919) % 1000) * F.lit(0.01)
        lng = F.lit(11.0) + ((F.col("event_id") * 104729) % 1200) * F.lit(0.01)
        pts = db.select(
            "event_id", lat.alias("lat"), lng.alias("lng"),
            F.floor(lat / 0.1).alias("bx"), F.floor(lng / 0.1).alias("by"),
        )
        offs = F.array(
            *[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                for dx, dy in [
                    (0, 0), (1, 0), (-1, 0), (0, 1), (0, -1),
                    (1, 1), (1, -1), (-1, 1), (-1, -1),
                ]
            ]
        )
        probe = pts.select(
            F.col("event_id").alias("ea"), F.col("lat").alias("la"),
            F.col("lng").alias("na"), F.explode(offs).alias("o"),
            (F.col("bx") + F.col("o.dx")).alias("nbx"),
            (F.col("by") + F.col("o.dy")).alias("nby"),
        )
        build = pts.select(
            F.col("event_id").alias("eb"), F.col("lat").alias("lb"),
            F.col("lng").alias("nb"), F.col("bx").alias("nbx"),
            F.col("by").alias("nby"),
        )
        dd2 = (F.col("la") - F.col("lb")) * (F.col("la") - F.col("lb")) + (
            F.col("na") - F.col("nb")
        ) * (F.col("na") - F.col("nb"))
        nbr = (
            probe.join(build, ["nbx", "nby"])
            .where((F.col("ea") != F.col("eb")) & (dd2 <= 0.01))
            .select("ea", "eb")
        )
        deg = nbr.groupBy("ea").agg(F.count(F.lit(1)).alias("deg"))
        return deg.where(F.col("deg") >= 4).count()

    timed("q214_dbscan_x10_sec", dbscan)

    # ---- q215 / q216 / q217: collapsed-relation families at x100 --
    def steady():
        from pyspark.sql import Window as W

        w = W.partitionBy("user_id").orderBy("ts", "event_id")
        sess = big_u.withColumn(
            "brk",
            F.when(
                F.lag("ts").over(w).isNull()
                | (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)) > 1800),
                1,
            ).otherwise(0),
        ).withColumn("sid", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        pairs = sess.select(
            F.col("event_type").alias("src"),
            F.lead("event_type")
            .over(Window.partitionBy("user_id", "sid").orderBy("ts", "event_id"))
            .alias("dst"),
        ).where(F.col("dst").isNotNull())
        return len(pairs.groupBy("src", "dst").count().collect())

    timed("q215_transition_agg_sec", steady)

    def huber():
        daily = big_ord.groupBy(
            F.col("o_orderpriority").alias("p"), F.col("o_orderdate").cast("date").alias("d")
        ).agg(F.sum("o_totalprice").alias("y"))
        wmin = Window.partitionBy("p")
        xy = daily.select(
            "p", F.datediff("d", F.min("d").over(wmin)).cast("double").alias("x"), "y"
        )
        m = xy.groupBy("p").agg(
            F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx"), F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
        return m.count()

    timed("q216_huber_moments_sec", huber)

    def lateness():
        w = (
            Window.partitionBy("event_type").orderBy("event_id")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        arr = big_e.withColumn("hwm", F.max("ts").over(w))
        return (
            arr.select(
                "event_type",
                F.when(F.col("hwm").isNull(), 0)
                .otherwise(F.greatest(F.unix_timestamp("hwm") - F.unix_timestamp("ts"), F.lit(0)))
                .alias("late_s"),
            )
            .groupBy("event_type")
            .agg(F.sum(F.when(F.col("late_s") > 600, 1).otherwise(0)).alias("l10"))
            .count()
        )

    timed("q217_lateness_sec", lateness)

    # ---- q218: CF backtest at x(factor/4) disjoint market copies --
    def recsys():
        oo = (
            load(spark, SF_DIR, "orders")
            .select("o_orderkey", "o_custkey", "o_orderdate")
            .crossJoin(reps_small)
            .select(
                (F.col("o_orderkey") + F.col("rep") * 10_000_000).alias("ok"),
                (F.col("o_custkey") + F.col("rep") * 1_000_000).alias("u"),
                (F.col("o_orderdate").cast("date") < F.lit("1999-01-01").cast("date")).alias("tr"),
            )
        )
        ll = (
            load(spark, SF_DIR, "lineitem")
            .select("l_orderkey", "l_partkey")
            .crossJoin(reps_small)
            .select(
                (F.col("l_orderkey") + F.col("rep") * 10_000_000).alias("ok"),
                (F.col("l_partkey") + F.col("rep") * 1_000_000).alias("i"),
            )
        )
        oi = oo.join(ll, "ok")
        tr_items = oi.where("tr").select("ok", "i").distinct()
        a2, b2 = tr_items.alias("a"), tr_items.alias("b")
        cooc_full = (
            a2.join(b2, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.i") != F.col("b.i")))
            .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        cooc = (
            cooc_full.withColumn(
                "nrk", F.row_number().over(Window.partitionBy("i").orderBy(F.desc("c"), "j"))
            )
            .where(F.col("nrk") <= 50)
            .drop("nrk")
        )
        tr_ui = oi.where("tr").select("u", "i").distinct().persist()
        scores = (
            tr_ui.join(cooc, "i")
            .join(
                tr_ui.select(F.col("u").alias("u2"), F.col("i").alias("j2")),
                (F.col("u") == F.col("u2")) & (F.col("j") == F.col("j2")),
                "left_anti",
            )
            .groupBy("u", "j")
            .agg(F.sum("c").alias("s"))
        )
        recs = (
            scores.withColumn(
                "rk", F.row_number().over(Window.partitionBy("u").orderBy(F.desc("s"), "j"))
            )
            .where(F.col("rk") <= 4)
        )
        n = recs.count()
        tr_ui.unpersist()
        return n

    timed("q218_recsys_sec", recsys)

    # ---- q219/q220: embedding evals at x100 ------------------------
    em = load(spark, SF_DIR, "embeddings")
    big_em = (
        em.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * 1_000_000).alias("vec_id"),
            "embedding", "label",
        )
    )

    def drift():
        ws = [0.4306243806, 0.3612487611, 0.2918731417, 0.2224975223,
              0.1531219029, 0.0837462834, 0.014370664, -0.0550049554]
        proj = None
        for dd, wv in enumerate(ws, start=1):
            term = F.element_at("embedding", dd).cast("double") * F.lit(wv)
            proj = term if proj is None else proj + term
        p = big_em.select("vec_id", proj.alias("proj"))
        mm = p.agg(F.min("proj").alias("mn"), F.max("proj").alias("mx"))
        return (
            p.crossJoin(F.broadcast(mm))
            .select(
                F.least(F.lit(9), F.floor((F.col("proj") - F.col("mn")) * 10.0
                                          / (F.col("mx") - F.col("mn")))).alias("b"),
                (F.col("vec_id") % 2 == 0).alias("r"),
            )
            .groupBy("b").agg(F.sum(F.when(F.col("r"), 1).otherwise(0)))
            .count()
        )

    timed("q219_drift_sec", drift)

    def purity():
        cb = em.where(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("c"), F.col("embedding").alias("ce")
        )
        dist = F.round(
            F.aggregate(
                F.zip_with(
                    "embedding", "ce",
                    lambda x, y: (x.cast("double") - y.cast("double"))
                    * (x.cast("double") - y.cast("double")),
                ),
                F.lit(0.0), lambda acc, v: acc + v,
            ), 9,
        )
        d = big_em.crossJoin(F.broadcast(cb)).select("vec_id", "label", "c", dist.alias("dist"))
        assign = d.withColumn(
            "rk", F.row_number().over(Window.partitionBy("vec_id").orderBy("dist", "c"))
        ).where(F.col("rk") == 1)
        return assign.groupBy("c", "label").count().count()

    timed("q220_purity_sec", purity)

    def did():
        return (
            big_e.groupBy(
                (F.col("user_id") % 2 == 1).alias("t"),
                (F.col("ts") >= F.lit("2024-01-16 00:00:00").cast("timestamp")).alias("p"),
            )
            .agg(F.count(F.lit(1)), F.sum("value"), F.sum(F.col("value") * F.col("value")))
            .count()
        )

    timed("q221_did_sec", did)

    # ---- q223: link prediction on x(factor/4) disjoint copies ------
    def linkpred():
        l1, l2 = big_li.alias("l1"), big_li.alias("l2")
        pairs = (
            l1.join(
                l2,
                (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
                & (F.col("l1.l_partkey") < F.col("l2.l_partkey")),
            )
            .groupBy(F.col("l1.l_partkey").alias("a"), F.col("l2.l_partkey").alias("b"))
            .agg(F.count(F.lit(1)).alias("w"))
            .where(F.col("w") >= 2)
            .select("a", "b")
            .persist()
        )
        edges = pairs.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
            pairs.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
        e1x, e2x = edges.alias("e1"), edges.alias("e2")
        wedges = (
            e1x.join(e2x, (F.col("e1.u") == F.col("e2.u")) & (F.col("e1.v") < F.col("e2.v")))
            .groupBy(F.col("e1.v").alias("u"), F.col("e2.v").alias("v"))
            .agg(F.count(F.lit(1)).alias("cn"))
        )
        cand = wedges.join(
            pairs, (wedges["u"] == pairs["a"]) & (wedges["v"] == pairs["b"]), "left_anti"
        )
        n = cand.join(deg.withColumnRenamed("u", "ju"), F.col("u") == F.col("ju")).count()
        pairs.unpersist()
        return n

    timed("q223_linkpred_sec", linkpred)

    # ---- q224 / q225: moment-collapse families at x100 -------------
    big_li_flat = load(spark, SF_DIR, "lineitem").select(
        "l_partkey", "l_returnflag"
    ).crossJoin(reps).drop("rep")

    def eb_rates():
        pp = big_li_flat.groupBy("l_partkey").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("h"),
        )
        rate = F.col("h").cast("double") / F.col("n")
        return pp.agg(F.avg(rate), F.sum(F.pow(rate, 2))).count()

    timed("q224_eb_sec", eb_rates)

    def cuped():
        cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
        pu = big_u.groupBy("user_id").agg(
            F.sum(F.when(F.col("ts") < cut, F.col("value")).otherwise(0.0)).alias("pre"),
            F.sum(F.when(F.col("ts") >= cut, F.col("value")).otherwise(0.0)).alias("post"),
        )
        return pu.agg(
            F.sum(F.col("pre") * F.col("post")), F.sum(F.col("pre") * F.col("pre"))
        ).count()

    timed("q225_cuped_sec", cuped)

    # ---- q229-q237: later-batch families at x100 -------------------
    def pr_sweep():
        toks = F.split(F.lower(F.trim("text")), r"\s+")
        weight = lambda t: (  # noqa: E731
            F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
            / F.lit(4294967296.0) - F.lit(0.5)
        )
        score = F.round(
            F.aggregate(F.transform(toks, weight), F.lit(0.0), lambda a2, x: a2 + x)
            / F.greatest(F.size(toks), F.lit(1)), 6,
        )
        scored = salted.withColumn("lang", F.lit("en")).select(
            score.alias("score"), (F.col("lang") == "en").alias("y")
        )
        th = spark.range(21).select(((F.col("id") - 10) / 100.0).alias("t"))
        return (
            scored.crossJoin(F.broadcast(th)).groupBy("t")
            .agg(F.sum(F.when(F.col("score") >= F.col("t"), 1).otherwise(0)))
            .count()
        )

    timed("q229_pr_sweep_sec", pr_sweep)

    def covisit():
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        gaps = big_u.select(
            "user_id", "ts", "event_id",
            F.get_json_object("props", "$.k").cast("long").alias("item"),
            F.when(
                F.lag("ts").over(w).isNull()
                | (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)) > 1800),
                1,
            ).otherwise(0).alias("brk"),
        )
        sess = gaps.withColumn(
            "sid", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        si = sess.select("user_id", "sid", "item").distinct()
        aa, bb = si.alias("a"), si.alias("b")
        return (
            aa.join(
                bb,
                (F.col("a.user_id") == F.col("b.user_id"))
                & (F.col("a.sid") == F.col("b.sid"))
                & (F.col("a.item") < F.col("b.item")),
            )
            .groupBy(F.col("a.item"), F.col("b.item")).count().count()
        )

    timed("q230_covisit_sec", covisit)

    def od_flows():
        lat = F.lit(55.0) + ((F.col("event_id") * 7919) % 1000) * F.lit(0.01)
        lng = F.lit(11.0) + ((F.col("event_id") * 104729) % 1200) * F.lit(0.01)
        lat_r = F.radians(lat)
        txc = F.floor((lng + 180.0) / 360.0 * 4096).cast("long")
        tyc = F.floor(
            (1.0 - F.log(F.tan(lat_r) + 1.0 / F.cos(lat_r)) / F.lit(3.141592653589793))
            / 2.0 * 4096
        ).cast("long")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        hops = big_u.select("user_id", "ts", "event_id", txc.alias("tx"), tyc.alias("ty")).select(
            "tx", "ty", F.lead("tx").over(w).alias("ntx"), F.lead("ty").over(w).alias("nty")
        )
        return (
            hops.where(F.col("ntx").isNotNull()
                       & ((F.col("ntx") != F.col("tx")) | (F.col("nty") != F.col("ty"))))
            .groupBy("tx", "ty", "ntx", "nty").count()
            .orderBy(F.desc("count")).limit(20).count()
        )

    timed("q232_od_flows_sec", od_flows)

    def pii_scan():
        cnt = lambda pat: F.size(F.regexp_extract_all("text", F.lit(pat), 0))  # noqa: E731
        return (
            salted.select(
                cnt(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}").alias("e"),
                cnt(r"\+?\d{3}[- ]?\d{3}[- ]?\d{4}").alias("p"),
            )
            .agg(F.sum("e"), F.sum("p")).count()
        )

    timed("q234_pii_scan_sec", pii_scan)

    def scan_llr():
        lat = F.lit(55.0) + ((F.col("event_id") * 7919) % 1000) * F.lit(0.01)
        lng = F.lit(11.0) + ((F.col("event_id") * 104729) % 1200) * F.lit(0.01)
        lat_r = F.radians(lat)
        txc = F.floor((lng + 180.0) / 360.0 * 4096).cast("long")
        tyc = F.floor(
            (1.0 - F.log(F.tan(lat_r) + 1.0 / F.cos(lat_r)) / F.lit(3.141592653589793))
            / 2.0 * 4096
        ).cast("long")
        cells = (
            big_e.select(txc.alias("tx"), tyc.alias("ty"), "event_type")
            .groupBy("tx", "ty")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("c"))
        )
        return cells.agg(F.sum("n"), F.sum("c")).count()

    timed("q236_scan_llr_sec", scan_llr)

    def holt_winters():
        daily = big_ord.groupBy(
            F.col("o_orderpriority").alias("p"), F.col("o_orderdate").cast("date").alias("d")
        ).agg(F.sum("o_totalprice").alias("y"))
        series = daily.groupBy("p").agg(
            F.transform(F.sort_array(F.collect_list(F.struct("d", "y"))), lambda s: s["y"]).alias("ys")
        )
        first7 = F.aggregate(F.slice("ys", 1, 7), F.lit(0.0), lambda a2, y: a2 + y) / 7.0
        acc0 = F.struct(
            F.lit(7).cast("long").alias("i"), first7.alias("l"), F.lit(0.0).alias("b"),
            F.transform(F.slice("ys", 1, 7), lambda y: y - first7).alias("s"),
            F.lit(0.0).alias("sse"),
        )

        def hw_step(acc, y):
            j = acc["i"] % 7
            sj = F.element_at(acc["s"], (j + 1).cast("int"))
            l_new = 0.3 * (y - sj) + 0.7 * (acc["l"] + acc["b"])
            return F.struct(
                (acc["i"] + 1).alias("i"), l_new.alias("l"),
                (0.1 * (l_new - acc["l"]) + 0.9 * acc["b"]).alias("b"),
                F.transform(
                    acc["s"],
                    lambda v, idx: F.when(idx.cast("long") == j, 0.2 * (y - l_new) + 0.8 * v).otherwise(v),
                ).alias("s"),
                (acc["sse"] + (y - (acc["l"] + acc["b"] + sj)) * (y - (acc["l"] + acc["b"] + sj))).alias("sse"),
            )

        return series.select(
            "p", F.aggregate(F.slice("ys", 8, F.size("ys") - 7), acc0, hw_step).alias("h")
        ).count()

    timed("q237_holt_winters_sec", holt_winters)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
