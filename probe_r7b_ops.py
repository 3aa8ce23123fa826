"""Round-7 second-wave operator scale probes (q261-q275 heavies) at
25-100x bench scale, deterministic replication (same scheme as
probe_r7_ops). One JSON line to stdout; commentary to stderr.

    python probe_r7b_ops.py [factor]

What each probe is evidence FOR (base sf0.1):
- q261 funnel exclusion: chained conditional window-mins over ONE
  user partitioning — wall must track the single sort of 10M events.
- q263 retrieval eval: x(factor/4) rep-SALTED docs (prefix token per
  replica, the q153/q199 scheme — replicas are not byte-dups, so df
  grows with corpus while rarest-term df stays bounded); the claim
  is per-query cost ~ df(qterm), not |corpus|.
- q266 Markov attribution: the corpus touch is one ordered-click
  window pass + a distinct agg; the 6x24 matvecs are driver-side on
  <= 42 cells — wall must track the window pass alone.
- q273 gains curve: the two-pass descending-decile cut at 10M rows —
  the q238/q240 machinery under a skewed integer score.
- q275 storage savings: fingerprint window + source join at
  x(factor/4) salted docs — one hash-partitioned window, one
  key-equi join.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from g_etl_spark.operators.ranking import (  # noqa: E402
    global_ntile_twopass,
    log2_bucket,
)
from g_etl_spark.operators.text import TOKEN_SPLIT  # noqa: E402
from g_etl_spark.session import get_spark  # noqa: E402
from g_etl_spark.tables import load  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    small = max(factor // 4, 1)
    spark = get_spark("probe_r7b_ops")
    out: dict[str, float] = {"factor": factor}

    def timed(name: str, fn) -> None:
        spark.catalog.clearCache()
        t0 = time.time()
        n = fn()
        out[name] = round(time.time() - t0, 2)
        print(f"# {name}: {n} rows in {out[name]}s", file=sys.stderr)

    reps = spark.range(factor).select(F.col("id").alias("rep"))
    reps_small = spark.range(small).select(F.col("id").alias("rep"))

    e = load(spark, SF_DIR, "events")
    big_e = (
        e.select("user_id", "ts", "event_id", "event_type")
        .crossJoin(reps)
        .select(
            (F.col("user_id") + F.col("rep") * 100_000).alias("user_id"),
            "ts",
            (F.col("event_id") + F.col("rep") * 100_000_000).alias("event_id"),
            "event_type",
        )
    )
    out["events_rows"] = big_e.count()

    # ---- q261 funnel exclusion at x100 users ---------------------
    def funnel():
        wu = Window.partitionBy("user_id")
        base = big_e.select("user_id", "event_type", F.unix_micros("ts").alias("t"))
        c = base.withColumn(
            "c_ts", F.min(F.when(F.col("event_type") == "click", F.col("t"))).over(wu)
        )
        p = c.withColumn(
            "p_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("t") > F.col("c_ts")),
                    F.col("t"),
                )
            ).over(wu),
        )
        x = p.withColumn(
            "is_err",
            F.when(
                (F.col("event_type") == "error")
                & (F.col("t") > F.col("c_ts"))
                & (F.col("t") < F.col("p_ts")),
                1,
            ).otherwise(0),
        )
        pu = x.groupBy("user_id").agg(
            F.max("p_ts").alias("p_ts"), F.sum("is_err").alias("n_err")
        )
        return pu.agg(
            F.sum(F.when(F.col("p_ts").isNotNull() & (F.col("n_err") == 0), 1)).alias(
                "clean"
            )
        ).count()

    timed("q261_funnel_exclusion_sec", funnel)

    # ---- q266 attribution corpus pass at x100 users --------------
    def markov_pass():
        cli = big_e.where(F.col("event_type") == "click").select(
            "user_id", "ts", "event_id", (F.col("user_id") % 5).cast("string").alias("ch")
        )
        conv = (
            big_e.where(F.col("event_type") == "purchase").select("user_id").distinct()
        )
        wq = Window.partitionBy("user_id").orderBy("ts", "event_id")
        seq = cli.select(
            "user_id",
            "ch",
            F.row_number().over(wq).alias("rn"),
            F.lead("ch").over(wq).alias("nxt"),
        )
        first = seq.where(F.col("rn") == 1).select(
            F.lit("S").alias("src"), F.col("ch").alias("dst")
        )
        mid = seq.where(F.col("nxt").isNotNull()).select(
            F.col("ch").alias("src"), F.col("nxt").alias("dst")
        )
        lastt = (
            seq.where(F.col("nxt").isNull())
            .join(conv.withColumn("cv", F.lit(1)), "user_id", "left")
            .select(
                F.col("ch").alias("src"),
                F.when(F.col("cv") == 1, "C").otherwise("N").alias("dst"),
            )
        )
        return (
            first.unionAll(mid)
            .unionAll(lastt)
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)))
            .count()
        )

    timed("q266_markov_corpus_pass_sec", markov_pass)

    # ---- q273 two-pass descending decile at x100 events ----------
    def gains_decile():
        d = big_e.select(
            "event_id",
            (F.col("event_id") % 1000).alias("n_chars"),
            (-(F.col("event_id") % 1000)).alias("neg"),
        )
        scored = global_ntile_twopass(
            d, 10, ["neg", "event_id"], -log2_bucket(F.col("n_chars")), out="decile"
        )
        return scored.groupBy("decile").agg(F.count(F.lit(1))).count()

    timed("q273_twopass_decile_sec", gains_decile)

    # ---- q263 retrieval eval / q275 savings on salted docs -------
    d = load(spark, SF_DIR, "documents")
    big_d = d.crossJoin(reps_small).select(
        (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
        F.concat(F.lit("r"), F.col("rep"), F.lit("x "), F.col("text")).alias("text"),
        "source",
    )
    out["docs_rows"] = big_d.count()

    def retrieval_eval():
        base = big_d.select("doc_id", F.split(F.lower(F.trim("text")), TOKEN_SPLIT).alias("t"))
        base = base.withColumn("dl", F.size("t").cast("double"))
        tf = (
            base.select("doc_id", "dl", F.explode("t").alias("token"))
            .groupBy("doc_id", "dl", "token")
            .agg(F.count(F.lit(1)).cast("double").alias("tf"))
        )
        dft = tf.groupBy("token").agg(F.count(F.lit(1)).cast("double").alias("df"))
        tfj = tf.join(dft, "token")
        wq = Window.partitionBy("doc_id").orderBy("df", "token")
        qsel = (
            tfj.where(F.col("doc_id") % 37 == 0)
            .withColumn("rn", F.row_number().over(wq))
            .where(F.col("rn") == 1)
            .select(F.col("doc_id").alias("qid"), F.col("token").alias("qterm"))
        )
        cand = qsel.join(tfj, tfj["token"] == qsel["qterm"]).select(
            "qid", "doc_id", "tf"
        )
        return cand.groupBy("qid").agg(F.count(F.lit(1))).count()

    timed("q263_retrieval_eval_sec", retrieval_eval)

    def savings():
        toks = F.split(F.lower(F.trim(F.col("text"))), TOKEN_SPLIT)
        fp = big_d.select(
            "doc_id",
            "source",
            F.length("text").alias("nb"),
            F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " ")).alias("fp"),
        )
        wfp = Window.partitionBy("fp")
        marked = fp.select(
            "source",
            "nb",
            F.when(F.col("doc_id") != F.min("doc_id").over(wfp), 1)
            .otherwise(0)
            .alias("dropped"),
        )
        return (
            marked.groupBy("source")
            .agg(F.sum("dropped"), F.sum("nb"))
            .count()
        )

    timed("q275_savings_manifest_sec", savings)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
