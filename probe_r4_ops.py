"""Round-4 operator scale probes: the new families at 100× their
bench scale, deterministic replication (same scheme as
scale_probe.py). One-line JSON to stdout; commentary to stderr.

    python probe_r4_ops.py [factor]

Probes (base = sf0.1 where the table exists there, else sf0.01):
- q136 gram matrix: 50k vectors x d=64 -> 104M local products,
  map-only + 2080-cell agg (the mergeable-moment claim).
- q134 linear quality classifier: 500k docs scored in-scan (the
  "inference cost IS the scan" claim).
- q129 sequence packing: 500k docs across sources via
  applyInPandas (per-group linear carry).
- q125 EWMA: 1M events, 20-lag window over one user_id exchange.
- q128 TF-IDF pairs: replication multiplies every df by the
  factor, so the df<=100 cap prunes the replicated vocabulary —
  measured here to show the cap bounding cost as corpora grow
  (the knob, not a free lunch: a real corpus keeps its long tail
  under the cap).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyspark.sql.functions as F

from g_etl_spark.session import get_spark
from g_etl_spark.tables import load


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe_r4_ops")
    out: dict[str, float] = {"replication": factor}

    def timed(name: str, fn) -> None:
        spark.catalog.clearCache()
        t0 = time.time()
        n = fn()
        dt = round(time.time() - t0, 2)
        out[name] = dt
        print(f"# {name}: {n} rows in {dt}s", file=sys.stderr)

    # --- replicated embeddings (vec_id-shifted copies) --------------
    emb = load(spark, sf_dir, "embeddings")
    n_emb = emb.count()
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    big_emb = (
        emb.crossJoin(reps)
        .withColumn("vec_id", F.col("vec_id") + F.col("rep") * 1_000_000)
        .drop("rep")
    )
    out["vectors"] = n_emb * factor

    def gram():
        # the SHIPPED q136 formulation (per-batch numpy GEMM); the
        # rejected pure-SQL nested transform measured 123 s at this
        # scale vs ~5 s for this path (SCALE_NOTES round 4)
        import numpy as np
        import pandas as pd

        def gram_batches(it):
            iu = np.triu_indices(64)
            for pdf in it:
                if not len(pdf):
                    continue
                m = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
                )
                g = m.T @ m
                yield pd.DataFrame(
                    {"i": iu[0] + 1, "j": iu[1] + 1, "p": g[iu]}
                )

        return (
            big_emb.select("embedding")
            .mapInPandas(gram_batches, "i long, j long, p double")
            .groupBy("i", "j")
            .agg(F.sum("p"))
            .count()
        )

    timed("gram_matrix_sec", gram)

    # --- replicated documents (doc_id-shifted, rep token appended so
    # replicas aren't byte-identical) --------------------------------
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

    from g_etl_spark.operators import text as T

    def classify():
        toks = T.tokens(F.col("text"))
        weight = lambda t: (  # noqa: E731
            F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
            / F.lit(4294967296.0)
            - F.lit(0.5)
        )
        score = F.aggregate(
            F.transform(toks, weight), F.lit(0.0), lambda a, x: a + x
        ) / F.greatest(F.size(toks), F.lit(1))
        return (
            big_docs.select("source", score.alias("s"))
            .groupBy("source")
            .agg(F.count(F.lit(1)), F.sum(F.when(F.col("s") > 0, 1).otherwise(0)))
            .count()
        )

    timed("quality_classifier_sec", classify)

    def packing():
        import pandas as pd

        d = big_docs.select(
            "source", "doc_id", F.size(T.tokens(F.col("text"))).alias("n_tok")
        )
        # shard-salted packing: parallelism = sources x 64 shards
        d = d.withColumn("shard", (F.col("doc_id") % 64).cast("int"))

        def pack(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("doc_id").reset_index(drop=True)
            b, fill, bins = 0, 0, []
            for t in pdf["n_tok"]:
                if fill and fill + t > 512:
                    b, fill = b + 1, 0
                fill += int(t)
                bins.append(b)
            pdf["bin"] = pd.Series(bins, dtype="int64")
            return (
                pdf.groupby("bin", as_index=False)
                .agg(
                    source=("source", "first"),
                    n_docs=("doc_id", "count"),
                    tokens=("n_tok", "sum"),
                )
            )[["source", "bin", "n_docs", "tokens"]]

        return (
            d.groupBy("source", "shard")
            .applyInPandas(
                pack, "source string, bin bigint, n_docs bigint, tokens bigint"
            )
            .count()
        )

    timed("sequence_packing_sec", packing)

    def tfidf_pairs():
        toks = big_docs.select(
            "doc_id", F.explode(T.tokens(F.col("text"))).alias("token")
        )
        tf = toks.groupBy("doc_id", "token").agg(
            F.count(F.lit(1)).cast("double").alias("tf")
        )
        df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
        w = (
            tf.join(df.filter(F.col("df") <= 100), "token")
            .withColumn("w", F.col("tf"))
            .select("doc_id", "token", "w")
        )
        w1, w2 = w.alias("w1"), w.alias("w2")
        return (
            w1.join(
                w2,
                (F.col("w1.token") == F.col("w2.token"))
                & (F.col("w1.doc_id") < F.col("w2.doc_id")),
            )
            .groupBy(F.col("w1.doc_id"), F.col("w2.doc_id"))
            .agg(F.sum(F.col("w1.w") * F.col("w2.w")))
            .count()
        )

    timed("tfidf_pairs_sec", tfidf_pairs)

    # --- replicated events (EWMA window) ----------------------------
    ev = load(spark, sf_dir, "events")
    n_ev = ev.count()
    big_ev = (
        ev.crossJoin(reps)
        .withColumn("event_id", F.col("event_id") + F.col("rep") * 1_000_000)
        .withColumn("user_id", F.col("user_id") + F.col("rep") * 10_000)
        .drop("rep")
    )
    out["events"] = n_ev * factor

    def ewma():
        from pyspark.sql import Window

        order = Window.partitionBy("user_id").orderBy("ts", "event_id")
        seq = big_ev.select(
            "user_id", "value", F.row_number().over(order).alias("rn")
        )
        byrn = Window.partitionBy("user_id").orderBy("rn")
        num, den = F.lit(0.0), F.lit(0.0)
        for j in range(20):
            x = F.col("value") if j == 0 else F.lag("value", j).over(byrn)
            wgt = F.pow(F.lit(0.7), F.lit(j))
            num = num + F.coalesce(x * wgt, F.lit(0.0))
            den = den + F.when(x.isNotNull(), wgt).otherwise(F.lit(0.0))
        return seq.withColumn("e", num / den).agg(F.sum("e")).count()

    timed("ewma_window_sec", ewma)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
