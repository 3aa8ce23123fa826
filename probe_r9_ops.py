"""Round-9 scale probes (run at x100 by default):

    python probe_r9_ops.py [factor]
    PROBE_ONLY=dispatch python probe_r9_ops.py

- size-aware ranking dispatch (the r8-verdict item): the q177
  collapsed-score shape at x100 (~500k distinct scores after the
  rollup) previously paid the two-pass unconditionally (11.17 s in
  the r8 probe vs 2.97 s for the plain window). With
  threshold_rows=TWOPASS_CROSSOVER_ROWS the operator must probe the
  size (early-stopping limit(n+1).count()) and take the plain-window
  plan — target is back under ~3 s plus a small probe overhead.
- dispatch probe overhead in the corpus-sized regime: the
  limit(n+1).count() must stop early and cost ~a scan of threshold+1
  rows, not a full count of the big relation.
- SRP multi-seed recall (q295/q305 knob): recall@planted-truth and
  cost as n_seeds grows — the recall-vs-depth trade recorded in
  SCALE_NOTES.

Keys are rep-shifted so replicas are distinct values, not byte-dups.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pyspark.sql.functions as F
from pyspark.sql import Window

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from g_etl_spark.operators.ranking import (
    TWOPASS_CROSSOVER_ROWS,
    global_cumsum_twopass,
    log2_bucket,
)
from g_etl_spark.session import get_spark
from g_etl_spark.tables import load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark("probe_r9_ops")
    out: dict[str, object] = {"factor": factor}

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

    # ---- dispatch on the q177 collapsed shape ---------------------
    o = load(spark, SF_DIR, "orders")
    big_o = o.crossJoin(reps).select(
        (F.floor(F.col("o_totalprice")) + F.col("rep")).cast("long").alias("score"),
    )
    # warm JIT so the first timed section doesn't absorb codegen cost
    big_o.groupBy("score").count().count()

    def by_score():
        return big_o.groupBy("score").agg(
            F.count(F.lit(1)).cast("double").alias("cnt")
        )

    def dispatch_cumsum():
        df = global_cumsum_twopass(
            by_score(),
            "cnt",
            ["score"],
            log2_bucket(F.col("score")),
            out="prior",
            inclusive=False,
            threshold_rows=TWOPASS_CROSSOVER_ROWS,
        )
        return df.count()

    def plain_window_cumsum():
        w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
        return (
            by_score()
            .select(F.coalesce(F.sum("cnt").over(w), F.lit(0.0)).alias("prior"))
            .count()
        )

    def twopass_cumsum():
        df = global_cumsum_twopass(
            by_score(),
            "cnt",
            ["score"],
            log2_bucket(F.col("score")),
            out="prior",
            inclusive=False,
        )
        return df.count()

    timed("plain_window_cumsum_sec", plain_window_cumsum)
    timed("twopass_cumsum_sec", twopass_cumsum)
    timed("dispatch_cumsum_sec", dispatch_cumsum)

    # ---- dispatch probe overhead on a corpus-sized relation -------
    # the probe must stop at threshold+1 rows; compare against a full
    # count of the same big relation
    def probe_overhead():
        return big_o.limit(TWOPASS_CROSSOVER_ROWS + 1).count()

    def full_count():
        return big_o.count()

    timed("probe_limit_count_sec", probe_overhead)
    timed("probe_full_count_sec", full_count)

    # ---- q328 ground-truth audit vs executing the join ------------
    small = max(factor // 4, 1)
    reps_small = spark.range(small).select(F.col("id").alias("rep"))
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey")
    o2 = load(spark, SF_DIR, "orders").select("o_orderkey")
    big_li = li.crossJoin(reps_small).select(
        (F.col("l_orderkey") + F.col("rep") * 100_000_000).alias("k")
    )
    big_o2 = o2.crossJoin(reps_small).select(
        (F.col("o_orderkey") + F.col("rep") * 100_000_000).alias("k")
    )

    def qerror_rollup_truth():
        a = big_li.groupBy("k").count().withColumnRenamed("count", "na")
        b = big_o2.groupBy("k").count().withColumnRenamed("count", "nb")
        return (
            a.join(b, "k")
            .agg(F.sum(F.col("na") * F.col("nb")).alias("actual"))
            .collect()[0]["actual"]
        )

    def qerror_join_exec():
        return big_li.join(big_o2, "k").count()

    timed("qerror_rollup_truth_sec", qerror_rollup_truth)
    timed("qerror_join_exec_sec", qerror_join_exec)

    # fan-out (many-to-many) case: lineitem self-join on partkey —
    # output is Σ n_k², where the rollup path's claim actually bites
    big_pk = load(spark, SF_DIR, "lineitem").select("l_partkey").crossJoin(
        reps_small
    ).select((F.col("l_partkey") + F.col("rep") * 10_000_000).alias("k"))

    def fanout_rollup_truth():
        a = big_pk.groupBy("k").count()
        return a.agg(F.sum(F.col("count") * F.col("count"))).collect()[0][0]

    def fanout_join_exec():
        return big_pk.join(
            big_pk.withColumnRenamed("k", "k2"), F.col("k") == F.col("k2")
        ).count()

    timed("fanout_rollup_truth_sec", fanout_rollup_truth)
    timed("fanout_join_exec_sec", fanout_join_exec)

    # ---- q330 bigram LM at scale (rep-SALTED texts) ----------------
    d = load(spark, SF_DIR, "documents").select("doc_id", "source", "text")
    big_d = d.crossJoin(reps_small).select(
        (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
        "source",
        # salt the text so replicas aren't byte-dups: prepend a
        # rep-specific token (grows vocab linearly in reps)
        F.concat(F.lit("rep"), F.col("rep").cast("string"), F.lit(" "), F.col("text")).alias("text"),
    )

    def lm_perplexity():
        import g_etl_spark.queries.text as TXT

        big_d.createOrReplaceTempView("___probe_docs")
        # run the same plan body against the scaled relation
        toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        docs = big_d.select("doc_id", "source", toks.alias("toks")).filter(
            F.size("toks") >= 2
        )
        bigrams = docs.select(
            "doc_id", "source",
            F.explode(F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(element_at(toks, i) AS prev,"
                " element_at(toks, i + 1) AS cur))"
            )).alias("b"),
        ).select("doc_id", "source", "b.prev", "b.cur")
        bg = bigrams.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c_ab"))
        ctx = bg.groupBy("prev").agg(F.sum("c_ab").alias("c_a"))
        vocab = docs.select(F.explode("toks").alias("t")).agg(
            F.countDistinct("t").alias("v")
        )
        model = bg.join(ctx, "prev").crossJoin(F.broadcast(vocab)).select(
            "prev", "cur",
            F.round(F.log((F.col("c_ab") + 1).cast("double")
                          / (F.col("c_a") + F.col("v")).cast("double")) * 1e6, 0)
            .cast("long").alias("q_lp"),
        )
        per_doc = bigrams.join(model, ["prev", "cur"]).groupBy("doc_id", "source").agg(
            F.round((-F.sum("q_lp")).cast("double") / F.count(F.lit(1)), 0)
            .cast("long").alias("x")
        )
        return per_doc.groupBy("source").agg(F.avg("x")).count()

    timed("lm_perplexity_sec", lm_perplexity)

    # ---- q337 LPA at scale: rep-shifted part keys ------------------
    li2 = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
    big_li2 = li2.crossJoin(reps_small).select(
        (F.col("l_orderkey") + F.col("rep") * 100_000_000).alias("l_orderkey"),
        (F.col("l_partkey") + F.col("rep") * 10_000_000).alias("l_partkey"),
    )

    def lpa_rounds():
        l1, l2 = big_li2.alias("l1"), big_li2.alias("l2")
        pairs = (
            l1.join(
                l2,
                (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
                & (F.col("l1.l_partkey") < F.col("l2.l_partkey")),
            )
            .groupBy(F.col("l1.l_partkey").alias("a"), F.col("l2.l_partkey").alias("b"))
            .agg(F.countDistinct("l1.l_orderkey").alias("sup"))
            .filter(F.col("sup") >= 2)
            .select("a", "b")
        )
        sym = pairs.unionAll(
            pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
        ).localCheckpoint()
        labels = sym.select(F.col("a").alias("node")).distinct().select(
            "node", F.col("node").alias("label")
        )
        for _ in range(4):
            nbr = sym.join(labels.withColumnRenamed("node", "b"), "b").select(
                F.col("a").alias("node"), "label"
            )
            counts = nbr.groupBy("node", "label").agg(F.count(F.lit(1)).alias("c"))
            labels = (
                counts.groupBy("node")
                .agg(F.min(F.struct((-F.col("c")).alias("nc"), F.col("label"))).alias("m"))
                .select("node", F.col("m.label").alias("label"))
                .localCheckpoint()
            )
        return labels.count()

    timed("lpa_4rounds_sec", lpa_rounds)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
