"""Round-7 operator scale probes at 25-100x bench scale,
deterministic replication (same scheme as probe_r5/r6 files). One
JSON line to stdout; commentary to stderr.

    python probe_r7_ops.py [factor]

What each probe is evidence FOR (base sf0.1):
- two-pass global ntile (the q238/q240 machinery): the claim is that
  the bucket-partitioned two-pass rank scales where the single-
  partition global window serializes. Both run on the same x100
  events relation (10M rows); the two-pass number should track the
  scan, the global-window number shows the defect it retires.
- q252 golden record: x(factor/4) rep-shifted clusters (members stay
  3 per cluster) — survivorship cost must track |clusters| linearly
  because the mode/rank path is per-cluster bounded.
- q254 salted join: x100 events with the planted 70%-hot key, AQE
  OFF (the environment the operator defends against) — salted vs
  plain shuffle join on the same input; the salted plan spreads the
  hot key over 8 tasks.
- q255 time-decay attribution: x(factor/4) rep-shifted users — the
  touch join is per-user bounded, so wall tracks rows, not pairs.
- q256 CDC diff: x(factor/4) rep-shifted keys — one full-outer
  equi-join; wall tracks the two scans + one exchange.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from g_etl_spark.operators.joins import broadcast_salted_join  # noqa: E402
from g_etl_spark.operators.ranking import (  # noqa: E402
    global_ntile_twopass,
    log2_bucket,
)
from g_etl_spark.session import get_spark  # noqa: E402
from g_etl_spark.tables import load  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    small = max(factor // 4, 1)
    spark = get_spark("probe_r7_ops")
    out: dict[str, float] = {"factor": factor}

    def timed(name: str, fn) -> None:
        spark.catalog.clearCache()
        t0 = time.time()
        n = fn()
        out[name] = round(time.time() - t0, 2)
        print(f"# {name}: {n} rows in {out[name]}s", file=sys.stderr)

    reps = spark.range(factor).select(F.col("id").alias("rep"))
    reps_small = spark.range(small).select(F.col("id").alias("rep"))

    # ---- two-pass global ntile vs single-partition window --------
    e = load(spark, SF_DIR, "events")
    big_e = (
        e.select("user_id", "value", "ts", "event_id")
        .crossJoin(reps)
        .select(
            (F.col("user_id") + F.col("rep") * 100_000).alias("user_id"),
            "value",
            "ts",
            (F.col("event_id") + F.col("rep") * 100_000_000).alias("event_id"),
        )
    )
    out["events_rows"] = big_e.count()

    def ntile_twopass():
        df = global_ntile_twopass(
            big_e,
            4,
            ["ts", "event_id"],
            F.floor(F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long"),
            out="look",
        )
        return df.groupBy("look").agg(F.count(F.lit(1))).count()

    def ntile_global_window():
        df = big_e.withColumn(
            "look", F.ntile(4).over(Window.orderBy("ts", "event_id"))
        )
        return df.groupBy("look").agg(F.count(F.lit(1))).count()

    timed("ntile_twopass_sec", ntile_twopass)
    timed("ntile_global_window_sec", ntile_global_window)

    # ---- q252 golden record at x small clusters ------------------
    c = load(spark, SF_DIR, "customer")
    big_c = c.crossJoin(reps_small).select(
        (F.col("c_custkey") + F.col("rep") * 10_000_000).alias("c_custkey"),
        F.concat(F.col("c_name"), F.lit("#r"), F.col("rep")).alias("c_name"),
        "c_acctbal",
        "c_mktsegment",
    )
    out["golden_clusters"] = big_c.count()

    def golden():
        base = big_c.select(
            F.col("c_custkey").alias("k"),
            F.lit(0).alias("src"),
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("bal"),
            F.col("c_mktsegment").alias("seg"),
        )
        v1 = big_c.select(
            (F.col("c_custkey") + 1_000_000_000).alias("k"),
            F.lit(1).alias("src"),
            F.lower("c_name").alias("name"),
            F.when(F.col("c_custkey") % 3 == 0, F.lit(None).cast("double"))
            .otherwise(F.col("c_acctbal") + 5.0)
            .alias("bal"),
            F.when(F.col("c_custkey") % 4 == 0, F.lit("UNKNOWN"))
            .otherwise(F.col("c_mktsegment"))
            .alias("seg"),
        )
        v2 = big_c.select(
            (F.col("c_custkey") + 2_000_000_000).alias("k"),
            F.lit(2).alias("src"),
            F.upper("c_name").alias("name"),
            (F.col("c_acctbal") - 2.5).alias("bal"),
            F.col("c_mktsegment").alias("seg"),
        )
        members = base.unionAll(v1).unionAll(v2).withColumn("ck", F.lower("name"))
        agg = members.groupBy("ck").agg(
            F.min("k").alias("canonical_key"),
            F.count(F.lit(1)).alias("n_members"),
            F.round(F.max("bal"), 2).alias("best_acctbal"),
        )
        segs = (
            members.where(F.col("seg") != "UNKNOWN")
            .groupBy("ck", "seg")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        wr = Window.partitionBy("ck").orderBy(F.desc("c"), F.asc("seg"))
        pick = segs.withColumn("r", F.row_number().over(wr)).where(F.col("r") == 1)
        return agg.join(pick.select("ck", "seg"), "ck").count()

    timed("q252_golden_record_sec", golden)

    # ---- q254 salted vs plain join under AQE OFF -----------------
    skew = big_e.select(
        F.when(F.col("user_id") % 10 < 7, F.lit(0))
        .otherwise((F.col("user_id") % 25).cast("int"))
        .alias("nk"),
        "value",
    )
    n = load(spark, SF_DIR, "nation").select(
        F.col("n_nationkey").alias("nk"), "n_name"
    )
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:

        def salted():
            return (
                broadcast_salted_join(skew, n, "nk", salt_buckets=8)
                .groupBy("n_name")
                .agg(F.sum("value"))
                .count()
            )

        def plain_shuffle():
            return (
                skew.hint("shuffle_hash")
                .join(n, "nk")
                .groupBy("n_name")
                .agg(F.sum("value"))
                .count()
            )

        timed("q254_salted_join_sec", salted)
        timed("q254_plain_shuffle_join_sec", plain_shuffle)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")

    # ---- q255 decay attribution at x small users -----------------
    small_e = (
        e.select("user_id", "ts", "event_id", "event_type", "props")
        .crossJoin(reps_small)
        .select(
            (F.col("user_id") + F.col("rep") * 100_000).alias("user_id"),
            "ts",
            (F.col("event_id") + F.col("rep") * 100_000_000).alias("event_id"),
            "event_type",
            "props",
        )
    )

    def decay():
        ev = small_e.select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            (F.get_json_object("props", "$.k").cast("long") % 5).alias("channel"),
        )
        pur = ev.where(F.col("event_type") == "purchase").select(
            "user_id", F.col("ts").alias("pts"), F.col("event_id").alias("pid")
        )
        cli = ev.where(F.col("event_type") == "click").select(
            "user_id", F.col("ts").alias("cts"), "channel"
        )
        touch = pur.join(
            cli,
            (pur["user_id"] == cli["user_id"])
            & (F.col("cts") <= F.col("pts"))
            & (F.col("cts") > F.col("pts") - F.expr("INTERVAL 24 HOURS")),
        ).select(
            "pid",
            "channel",
            F.exp(
                -(F.unix_micros("pts") - F.unix_micros("cts"))
                / F.lit(21_600_000_000.0)
            ).alias("w"),
        )
        wp = Window.partitionBy("pid")
        return (
            touch.withColumn("credit", F.col("w") / F.sum("w").over(wp))
            .groupBy("channel")
            .agg(F.sum("credit"))
            .count()
        )

    timed("q255_decay_attribution_sec", decay)

    # ---- q256 CDC diff at x small keys ---------------------------
    o = load(spark, SF_DIR, "orders")
    big_o = o.crossJoin(reps_small).select(
        (F.col("o_orderkey") + F.col("rep") * 100_000_000).alias("o_orderkey"),
        "o_totalprice",
    )
    out["cdc_rows"] = big_o.count()

    def cdc():
        today = big_o.select(F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p"))
        yesterday = (
            big_o.where(F.col("o_orderkey") % 50 != 0)
            .select(
                F.col("o_orderkey").alias("k"),
                F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") - 10.0)
                .otherwise(F.col("o_totalprice"))
                .alias("p"),
            )
            .unionAll(
                big_o.where(F.col("o_orderkey") % 41 == 0).select(
                    (F.col("o_orderkey") + 5_000_000_000).alias("k"),
                    F.col("o_totalprice").alias("p"),
                )
            )
        )
        t, y = today.alias("t"), yesterday.alias("y")
        d = t.join(y, F.col("t.k") == F.col("y.k"), "full_outer").select(
            F.when(F.col("y.k").isNull(), "insert")
            .when(F.col("t.k").isNull(), "delete")
            .when(F.col("y.p") != F.col("t.p"), "update")
            .otherwise("unchanged")
            .alias("change_type")
        )
        return d.groupBy("change_type").agg(F.count(F.lit(1))).count()

    timed("q256_cdc_diff_sec", cdc)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
