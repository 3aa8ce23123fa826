"""Round-8 operator scale probes at 25-100x bench scale,
deterministic replication (same scheme as probe_r5/r6/r7 files). One
JSON line to stdout; commentary to stderr.

    python probe_r8_ops.py [factor]

What each probe is evidence FOR (base sf0.1):
- two-pass prefix sum (the q177/q191 retrofit machinery,
  operators/ranking.global_cumsum_twopass): the claim is that the
  bucket-partitioned cumulative scales where the single-partition
  cumulative window serializes. Both run on the same x100 orders
  score rollup; the two-pass number should track the scan.
- q179 double two-pass rank: x(factor/4) rep-shifted part keys — the
  skew diagnostic must track |keys|, not corpus rows.
- q295 SRP-bucketed embedding dedup vs the q54 brute-force baseline
  at x(factor/4) rep-SALTED vectors (each replica's first dim is
  nudged by rep so replicas are not byte-dups and do not all share
  one bucket pair set): bucketed must scale like Σ bucket², brute
  force like n² — the measured gap is the reason q295 exists.
- q307 clamped-inventory fold: x(factor/4) rep-shifted parts — the
  per-part sequential fold must track |parts| (histories stay
  bounded), pinning the "one shuffle + local fold" claim.
- q300 Naive Bayes train+score: x(factor/4) rep-shifted docs — train
  is one combining agg over exploded tokens, score one broadcast
  join; wall must track token count linearly.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from g_etl_spark.operators import similarity as S  # noqa: E402
from g_etl_spark.operators.ranking import (  # noqa: E402
    global_cumsum_twopass,
    log2_bucket,
)
from g_etl_spark.session import get_spark  # noqa: E402
from g_etl_spark.tables import load  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    small = max(factor // 4, 1)
    spark = get_spark("probe_r8_ops")
    out: dict[str, float] = {"factor": factor}

    only = os.environ.get("PROBE_ONLY", "")
    sections = {s for s in only.split(",") if s}

    def timed(name: str, fn) -> None:
        if sections and not any(name.startswith(s) for s in sections):
            return
        spark.catalog.clearCache()
        t0 = time.time()
        n = fn()
        out[name] = round(time.time() - t0, 2)
        print(f"# {name}: {n} rows in {out[name]}s", file=sys.stderr)

    reps = spark.range(factor).select(F.col("id").alias("rep"))
    reps_small = spark.range(small).select(F.col("id").alias("rep"))

    # ---- two-pass prefix sum vs single-partition cumulative ------
    o = load(spark, SF_DIR, "orders")
    big_o = o.crossJoin(reps).select(
        (F.col("o_orderkey") + F.col("rep") * 10_000_000).alias("o_orderkey"),
        (F.floor(F.col("o_totalprice")) + F.col("rep")).cast("long").alias("score"),
        F.col("o_orderpriority"),
    )
    out["orders_rows"] = big_o.count()

    def by_score(df):
        return df.groupBy("score").agg(
            F.count(F.lit(1)).cast("double").alias("cnt")
        )

    def cumsum_twopass():
        df = global_cumsum_twopass(
            by_score(big_o),
            "cnt",
            ["score"],
            log2_bucket(F.col("score")),
            out="prior",
            inclusive=False,
        )
        return df.agg(F.sum("prior")).collect()[0][0] and df.count()

    def cumsum_global_window():
        w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
        df = by_score(big_o).select(
            F.coalesce(F.sum("cnt").over(w), F.lit(0.0)).alias("prior")
        )
        return df.count()

    timed("cumsum_twopass_sec", cumsum_twopass)
    timed("cumsum_global_window_sec", cumsum_global_window)

    # ---- q179 double two-pass rank at x small keys ----------------
    li = load(spark, SF_DIR, "lineitem")
    big_li = li.select("l_partkey").crossJoin(reps_small).select(
        (F.col("l_partkey") + F.col("rep") * 10_000_000).alias("l_partkey")
    )
    out["lineitem_rows"] = big_li.count()

    def gini_ranks():
        from g_etl_spark.operators.ranking import global_rank_twopass

        per_key = big_li.groupBy("l_partkey").agg(
            F.count(F.lit(1)).cast("double").alias("x")
        )
        asc = global_rank_twopass(
            per_key, ["x", "l_partkey"], log2_bucket(F.col("x")), out="i"
        )
        ranked = global_rank_twopass(
            asc.withColumn("negx", -F.col("x")),
            ["negx", "l_partkey"],
            -log2_bucket(F.col("x")),
            out="ri",
        )
        return ranked.agg(F.sum(F.col("i") * F.col("x")), F.max("ri")).collect()[0][1]

    timed("gini_double_rank_sec", gini_ranks)

    # ---- q295 bucketed vs q54 brute-force embedding dedup --------
    emb = load(spark, SF_DIR, "embeddings")
    big_e = emb.crossJoin(reps_small).select(
        (F.col("vec_id") + F.col("rep") * 1_000_000).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: F.when(
                i == 0, x.cast("double") + F.col("rep").cast("double") * 0.01
            ).otherwise(x.cast("double")),
        ).alias("embedding"),
    ).localCheckpoint(eager=True)
    out["vectors"] = big_e.count()

    def bucketed_dedup():
        pert = big_e.select(
            (F.col("vec_id") + 500_000_000).alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(64)),
                lambda i: F.when(
                    i <= 4, F.get(F.col("embedding"), i - 1) * 1.5
                ).otherwise(F.get(F.col("embedding"), i - 1)),
            ).alias("embedding"),
        )
        corpus = big_e.unionByName(pert)
        return S.srp_bucket_pairs(corpus, threshold=0.98, n_planes=8, dim=64).count()

    def brute_dedup():
        from g_etl_spark.operators import dedup as D

        pert = big_e.select(
            (F.col("vec_id") + 500_000_000).alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(64)),
                lambda i: F.when(
                    i <= 4, F.get(F.col("embedding"), i - 1) * 1.5
                ).otherwise(F.get(F.col("embedding"), i - 1)),
            ).alias("embedding"),
        )
        corpus = big_e.unionByName(pert)
        return D.embedding_cosine_pairs(corpus, threshold=0.98).count()

    timed("embed_dedup_bucketed_sec", bucketed_dedup)
    # like-for-like brute-vs-bucketed ratio at a brute-feasible scale
    # (x25 brute = 625M candidate pairs of CodegenFallback 64-dim
    # dots — did NOT finish in 1067s when first probed; the x(small/4)
    # rerun below gives the measured ratio, the x25 bucketed number
    # above gives the scale headline)
    tiny = max(small // 4, 1)
    big_e_tiny = big_e.filter(F.col("vec_id") < tiny * 1_000_000)
    big_e_full = big_e

    def with_corpus(df, fn):
        nonlocal big_e
        big_e = df
        try:
            return fn()
        finally:
            big_e = big_e_full

    timed("embed_dedup_bucketed_tiny_sec", lambda: with_corpus(big_e_tiny, bucketed_dedup))
    timed("embed_dedup_bruteforce_tiny_sec", lambda: with_corpus(big_e_tiny, brute_dedup))

    # ---- q307 clamped fold at x small parts -----------------------
    big_inv = li.select(
        "l_partkey", "l_shipdate", "l_orderkey", "l_linenumber",
        "l_returnflag", "l_quantity",
    ).crossJoin(reps_small).select(
        (F.col("l_partkey") + F.col("rep") * 10_000_000).alias("l_partkey"),
        "l_shipdate",
        (F.col("l_orderkey") + F.col("rep") * 100_000_000).alias("l_orderkey"),
        "l_linenumber", "l_returnflag", "l_quantity",
    )

    def inv_fold():
        delta = F.when(
            F.col("l_returnflag") == "R", F.round(F.col("l_quantity"), 0)
        ).otherwise(-F.round(F.col("l_quantity"), 0)).cast("long")
        rows = big_inv.select(
            "l_partkey",
            F.struct(
                F.col("l_shipdate"), F.col("l_orderkey"),
                F.col("l_linenumber"), delta.alias("delta"),
            ).alias("s"),
        )
        seqs = rows.groupBy("l_partkey").agg(
            F.sort_array(F.collect_list("s")).alias("seq")
        )
        init = F.expr(
            "named_struct('bal', CAST(50 AS BIGINT),"
            " 'st', CAST(0 AS BIGINT), 'ch', CAST(0 AS BIGINT))"
        )
        folded = seqs.select(
            F.aggregate(
                F.col("seq"),
                init,
                lambda acc, x: F.struct(
                    F.greatest(
                        F.least(acc["bal"] + x["delta"], F.lit(100).cast("long")),
                        F.lit(0).cast("long"),
                    ).alias("bal"),
                    (acc["st"] + F.when(acc["bal"] + x["delta"] < 0, 1).otherwise(0))
                    .cast("long").alias("st"),
                    (acc["ch"] + F.when(acc["bal"] + x["delta"] > 100, 1).otherwise(0))
                    .cast("long").alias("ch"),
                ),
            ).alias("f")
        )
        return folded.agg(F.sum("f.st")).collect()[0][0] and folded.count()

    timed("inventory_fold_sec", inv_fold)

    # ---- q300 NB train+score at x small docs ----------------------
    docs = load(spark, SF_DIR, "documents")
    big_d = docs.crossJoin(reps_small).select(
        (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" r"), F.col("rep")).alias("text"),
        "lang",
    )
    out["docs"] = big_d.count()

    def nb():
        from g_etl_spark.operators.text import TOKEN_SPLIT

        toks = F.split(F.lower(F.trim(F.col("text"))), TOKEN_SPLIT)
        labeled = big_d.select(
            "doc_id",
            F.when(F.col("lang") == "en", "en").otherwise("other").alias("actual"),
            (F.col("doc_id") % 5 == 0).alias("is_test"),
            toks.alias("toks"),
        )
        train_tok = labeled.filter(~F.col("is_test")).select(
            F.explode("toks").alias("token"), "actual"
        )
        counts = train_tok.groupBy("token").agg(
            F.sum(F.when(F.col("actual") == "en", 1).otherwise(0)).alias("c_en"),
            F.sum(F.when(F.col("actual") == "other", 1).otherwise(0)).alias("c_ot"),
        )
        tot = counts.agg(
            F.sum("c_en").alias("n_en"),
            F.sum("c_ot").alias("n_ot"),
            F.count(F.lit(1)).alias("v"),
        )
        q = lambda col: F.round(col * 1e6, 0).cast("long")  # noqa: E731
        lp = counts.crossJoin(F.broadcast(tot)).select(
            "token",
            q(F.log((F.col("c_en") + 1) / (F.col("n_en") + F.col("v")))).alias("q_en"),
            q(F.log((F.col("c_ot") + 1) / (F.col("n_ot") + F.col("v")))).alias("q_ot"),
        )
        test_tok = labeled.filter(F.col("is_test")).select(
            "doc_id", F.explode("toks").alias("token")
        )
        scored = test_tok.join(lp, "token", "left").groupBy("doc_id").agg(
            F.sum(F.coalesce("q_en", F.lit(0))).alias("s_en"),
            F.sum(F.coalesce("q_ot", F.lit(0))).alias("s_ot"),
        )
        return scored.count()

    timed("naive_bayes_sec", nb)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
