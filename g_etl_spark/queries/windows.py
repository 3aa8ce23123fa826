"""Window-function query family.

The reference corpus contains no window functions (SURVEY §2.5), but
an analytics engine replacing it needs them for the standard
event-log workloads: sessionization, top-N-per-group, running
aggregates. All JVM-side WindowExec; partition keys chosen to shuffle
once and reuse the sort.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from g_etl_spark.queries import register
from g_etl_spark.tables import load


@register(
    "q28_sessionize",
    oracle="""
    WITH gaps AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE OR
                         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    per_user AS (
        SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
        FROM gaps GROUP BY user_id
    )
    SELECT n_sessions, count(*) AS n_users,
           CAST(sum(n_events) AS BIGINT) AS total_events
    FROM per_user
    GROUP BY n_sessions
    ORDER BY n_sessions
    """,
)
def q28_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag(): a new session starts after a >30 min
    gap. One shuffle on user_id; the window sort is reused by the
    per-user aggregate.

    Scale: the canonical event-log op — state per user is one row of
    lag, so skewed users cost sort time, not memory; AQE skew-split
    applies to the exchange.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # micros, not seconds: the oracle's INTERVAL compare is full
    # precision, and a second-truncated gap would merge sessions
    # whose true gap is 1800.x s (q127 shares this rule)
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    new_session = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    per_user = (
        e.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(
            F.sum("new_session").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    return (
        per_user.groupBy("n_sessions")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("n_events").cast("long").alias("total_events"),
        )
        .orderBy("n_sessions")
    )


@register(
    "q29_top_events_per_user",
    oracle="""
    WITH ranked AS (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
        FROM events
    )
    SELECT user_id, event_id, round(value, 3) AS value
    FROM ranked
    WHERE rn <= 2 AND user_id < 50
    ORDER BY user_id, value DESC, event_id
    """,
)
def q29_top_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group via row_number — the distributed 'grouped
    top-k'. Spark pushes the rank filter into the window sort
    (WindowGroupLimit), so each partition keeps only N rows."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") <= 2) & (F.col("user_id") < 50))
        .select("user_id", "event_id", F.round("value", 3).alias("value"))
        .orderBy("user_id", F.desc("value"), "event_id")
    )


@register(
    "q30_running_daily_total",
    oracle="""
    WITH daily AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
               round(sum(value), 2) AS day_value
        FROM events GROUP BY 1, 2
    )
    SELECT day, event_type, day_value,
           round(sum(day_value) OVER (PARTITION BY event_type ORDER BY day
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_value
    FROM daily
    ORDER BY event_type, day
    """,
)
def q30_running_daily_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total over a pre-aggregated daily rollup — frame-based
    window aggregation. Aggregate first, window over the small rollup:
    the window sees |days|×|types| rows, not raw events."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type"
    ).agg(F.round(F.sum("value"), 2).alias("day_value"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "day",
        "event_type",
        "day_value",
        F.round(F.sum("day_value").over(w), 2).alias("running_value"),
    ).orderBy("event_type", "day")


@register(
    "q36_asof_join",
    oracle="""
    WITH p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click')
    SELECT c.event_id, c.user_id,
           p.event_id AS purchase_id,
           CAST(date_diff('second', p.ts, c.ts) AS BIGINT) AS secs_since_purchase
    FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
    ORDER BY c.event_id
    """,
)
def q36_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join (time-series point lookup): each click matched to
    the same user's most recent purchase at-or-before it. Spark has
    no ASOF operator; the scalable re-expression is the union+window
    trick — tag both sides, one window sort per user, carry the last
    non-null right-side attributes forward:

        sort (ts, side) per user; last(purchase_cols, ignorenulls)
        over rows unbounded-preceding..current; keep left rows.

    ONE shuffle on user_id, no inequality join, no row explosion —
    versus a naive range join whose candidate set is |clicks|×|user
    purchases|. (The DuckDB oracle uses its native ASOF JOIN, so this
    also pins semantic parity with engines that have the operator.)

    Tie rule: at equal ts the purchase sorts first (side 0 < 1),
    matching ASOF's inclusive >=; (user_id, ts) is unique in the data
    so the match is deterministic.
    """
    e = load(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"), F.lit(0).alias("side"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(None).cast("long").alias("p_id"),
        F.lit(None).cast("timestamp").alias("p_ts"), F.lit(1).alias("side"),
        F.col("event_id").alias("c_id"),
    )
    tagged = p.withColumn("c_id", F.lit(None).cast("long")).select(
        "user_id", "ts", "p_id", "p_ts", "side", "c_id"
    ).unionByName(c)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumns(
            {
                "last_p_id": F.last("p_id", ignorenulls=True).over(w),
                "last_p_ts": F.last("p_ts", ignorenulls=True).over(w),
            }
        )
        .filter(F.col("side") == 1)
        .select(
            F.col("c_id").alias("event_id"),
            "user_id",
            F.col("last_p_id").alias("purchase_id"),
            (F.col("ts").cast("long") - F.col("last_p_ts").cast("long"))
            .cast("long")
            .alias("secs_since_purchase"),
        )
        .orderBy("event_id")
    )


@register(
    "q37_range_join_bucketed",
    oracle="""
    WITH inc AS (SELECT event_id AS incident_id, user_id, ts AS t0,
                        ts + INTERVAL 24 HOUR AS t1
                 FROM events WHERE event_type = 'error'),
         hit AS (SELECT user_id, ts FROM events
                 WHERE event_type IN ('click', 'view'))
    SELECT i.incident_id, count(*) AS n_hits
    FROM inc i JOIN hit h
      ON i.user_id = h.user_id AND h.ts >= i.t0 AND h.ts < i.t1
    GROUP BY i.incident_id
    ORDER BY incident_id
    """,
)
def q37_range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big-big RANGE join via bucketing: per error event, the count of
    click/view activity in the following 24 h by the same user.

    Spark's inequality join would be a per-user cross product. The
    scale path buckets time at the window granularity: each incident
    covers exactly 2 day-buckets, each probe event 1 — so the range
    condition becomes an EQUI-join on (user_id, day_bucket) plus an
    exact refine predicate. Candidate cost is Σ per-(user, day)
    activity², never |errors|×|events|, and the join shuffles on a
    hashed key like any other equi-join (AQE skew-split applies).
    """
    e = load(spark, sf_dir, "events")
    # integer MICROS end-to-end: the oracle compares full-precision
    # timestamps, so a second-truncated t0/h_ts would disagree on
    # hits landing in the same second as the incident (sub-second
    # ordering flips) — micros make the refine predicate exact
    day = 24 * 3600 * 1_000_000
    inc = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        "user_id",
        F.unix_micros("ts").alias("t0"),
        (F.unix_micros("ts") + day).alias("t1"),
    )
    # each [t0, t0+24h) window spans bucket(t0) and bucket(t0)+1
    inc_b = inc.withColumn(
        "bucket", F.explode(F.array(F.floor(F.col("t0") / day), F.floor(F.col("t0") / day) + 1))
    )
    hit = e.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        F.unix_micros("ts").alias("h_ts"),
        F.floor(F.unix_micros("ts") / day).alias("bucket"),
    )
    return (
        inc_b.join(hit, ["user_id", "bucket"])
        .filter((F.col("h_ts") >= F.col("t0")) & (F.col("h_ts") < F.col("t1")))
        .groupBy("incident_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .orderBy("incident_id")
    )


@register(
    "q38_latest_event_per_user",
    oracle="""
    WITH ranked AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    SELECT user_id, event_id, event_type, ts_us
    FROM ranked WHERE rn = 1
    ORDER BY user_id
    """,
)
def q38_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pick-latest-per-key — the standard CDC/snapshot dedup pattern
    (keep the newest record per key). row_number + rn=1 plans as
    WindowGroupLimit in Spark: each shuffle partition retains one row
    per key during the sort, so the window state is O(keys), not
    O(rows)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us"))
        .orderBy("user_id")
    )


@register(
    "q39_exact_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4)  AS p50,
           round(quantile_cont(value, 0.9), 4)  AS p90,
           round(quantile_cont(value, 0.99), 4) AS p99,
           round(avg(value), 4)                 AS mean
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q39_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles per group (Spark
    `percentile` == DuckDB `quantile_cont` semantics). Exact
    percentiles shuffle the full value set per group — correct
    baseline; at 100 TB swap in `percentile_approx` (t-digest sketch,
    mergeable map-side) and accept bounded rank error, the same
    trade q05's HLL++ variant documents for distinct counts."""
    e = load(spark, sf_dir, "events")
    pct = F.expr("percentile(value, array(0.5D, 0.9D, 0.99D))")
    return (
        e.groupBy("event_type")
        .agg(
            F.round(pct[0], 4).alias("p50"),
            F.round(pct[1], 4).alias("p90"),
            F.round(pct[2], 4).alias("p99"),
            F.round(F.avg("value"), 4).alias("mean"),
        )
        .orderBy("event_type")
    )


@register(
    "q90_signup_purchase_funnel",
    oracle="""
    WITH s AS (
        SELECT user_id, min(ts) AS signup_ts
        FROM events WHERE event_type = 'signup' GROUP BY user_id),
    p AS (
        SELECT e.user_id, min(e.ts) AS fp
        FROM events e JOIN s USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
        GROUP BY e.user_id)
    SELECT s.user_id,
           CAST(CAST(s.signup_ts AS DATE) AS STRING) AS signup_day,
           CASE WHEN p.fp IS NOT NULL
                 AND p.fp <= s.signup_ts + INTERVAL 7 DAY
                THEN 1 ELSE 0 END AS converted_7d,
           CASE WHEN p.fp IS NOT NULL
                 AND p.fp <= s.signup_ts + INTERVAL 7 DAY
                THEN round((epoch_us(p.fp) - epoch_us(s.signup_ts))
                           / 3600000000.0, 2) END AS delay_hours
    FROM s LEFT JOIN p USING (user_id)
    ORDER BY user_id
    """,
)
def q90_signup_purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis: per user, first signup -> first subsequent
    purchase, with 7-day conversion flag and delay in hours — the
    product-analytics staple (event-sequence matching as two ordered
    min-aggregates, no MATCH_RECOGNIZE engine needed).

    Scale: both stage aggregates shuffle on user_id (the same key),
    the purchase stage semi-thins on the signup set first, and the
    final assembly is a user_id-partitioned left join — three
    same-key shuffles AQE plans as one exchange reuse; no window over
    the raw event stream.
    """
    e = load(spark, sf_dir, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("fp"))
    )
    j = s.join(p, "user_id", "left")
    converted = F.col("fp").isNotNull() & (
        F.col("fp") <= F.col("signup_ts") + F.expr("INTERVAL 7 DAYS")
    )
    delay = F.round(
        (F.unix_micros("fp") - F.unix_micros("signup_ts")) / F.lit(3600000000.0), 2
    )
    return j.select(
        "user_id",
        F.col("signup_ts").cast("date").cast("string").alias("signup_day"),
        F.when(converted, 1).otherwise(0).alias("converted_7d"),
        F.when(converted, delay).alias("delay_hours"),
    ).orderBy("user_id")


@register(
    "q104_hopping_windows",
    oracle="""
    WITH slid AS (
        SELECT e.event_type, e.value,
               date_trunc('day', e.ts) - to_days(CAST(k.k AS INTEGER)) AS win_start
        FROM events e,
             LATERAL (SELECT unnest(range(0, 7)) AS k) k
    )
    SELECT strftime(win_start, '%Y-%m-%d') AS win_start,
           event_type,
           count(*)                        AS n,
           round(sum(value), 2)            AS total_value
    FROM slid
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q104_hopping_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window aggregation (7-day window, 1-day hop) — the
    overlapping-window generator q11's tumbling daily rollup can't
    express: every event lands in SEVEN windows, produced by Spark's
    window(ts, '7 days', '1 day') Expand.

    Both engines enumerate the same membership: Spark's window slide
    is epoch-aligned at day granularity, which equals the oracle's
    date_trunc('day') minus 0..6 days.

    Scale: the ×(window/hop) fan-out happens map-side and collapses
    in the same partial aggregation as any rollup — the exchange
    carries |windows × groups| rows, not events × 7. This is also
    the batch shape of the streaming sliding-window rollup.
    """
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "7 days", "1 day").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("win_start", "event_type")
    )


@register(
    "q105_salted_skew_agg",
    oracle="""
    WITH skewed AS (
        SELECT CASE WHEN event_id % 10 < 8 THEN 'HOT' ELSE event_type END AS k,
               value
        FROM events
    )
    SELECT k, count(*) AS n, round(sum(value), 2) AS total_value
    FROM skewed
    GROUP BY k
    ORDER BY k
    """,
)
def q105_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation under the oracle: 80% of rows
    are forced onto one HOT key, then aggregated via the salted
    pattern (operators/joins.salted_count shape — group on
    (key, salt) so the hot key spreads over 16 reducers, then merge
    per key). The result is provably identical to the direct GROUP BY
    the oracle runs; what changes is the physical distribution.

    Scale: THE mitigation for skewed grid cells / group keys that
    AQE's join-split can't help (it only splits joins): reducer input
    is bounded by |partition|/buckets for any key frequency. sum and
    count are algebraic, so the rand() salt is retry-safe.
    """
    e = load(spark, sf_dir, "events")
    skewed = e.select(
        F.when(F.col("event_id") % 10 < 8, F.lit("HOT"))
        .otherwise(F.col("event_type"))
        .alias("k"),
        "value",
    )
    salted = skewed.withColumn("_salt", (F.rand(seed=42) * 16).cast("int"))
    partial = salted.groupBy("k", "_salt").agg(
        F.count(F.lit(1)).alias("_n"), F.sum("value").alias("_v")
    )
    return (
        partial.groupBy("k")
        .agg(
            F.sum("_n").cast("long").alias("n"),
            F.round(F.sum("_v"), 2).alias("total_value"),
        )
        .orderBy("k")
    )


_PSI_BUCKET = """CASE
        WHEN value < 5 THEN 0 WHEN value < 15 THEN 1 WHEN value < 35 THEN 2
        WHEN value < 70 THEN 3 WHEN value < 115 THEN 4 ELSE 5 END"""


@register(
    "q109_psi_drift",
    oracle=f"""
    WITH bucketed AS (
        SELECT CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 'base' ELSE 'cur' END AS win,
               {_PSI_BUCKET} AS bucket
        FROM events
    ),
    counts AS (
        SELECT win, bucket, count(*) AS n FROM bucketed GROUP BY win, bucket
    ),
    tot AS (SELECT win, sum(n) AS t FROM counts GROUP BY win),
    frac AS (
        SELECT c.bucket, c.win, CAST(c.n AS DOUBLE) / t.t AS p
        FROM counts c JOIN tot t ON c.win = t.win
    ),
    sides AS (
        SELECT bucket,
               max(CASE WHEN win = 'base' THEN p END) AS p_base,
               max(CASE WHEN win = 'cur' THEN p END)  AS p_cur
        FROM frac GROUP BY bucket
    )
    SELECT CAST(bucket AS BIGINT)  AS bucket,
           round(p_base, 6)        AS p_base,
           round(p_cur, 6)         AS p_cur,
           round((p_cur - p_base) * ln(p_cur / p_base), 6) AS psi_term
    FROM sides
    ORDER BY bucket
    """,
)
def q109_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitoring (Population Stability Index) —
    the data-quality gate a continuously-ingesting training pipeline
    runs between corpus snapshots: bucket the metric on FIXED edges,
    compare first-half vs second-half window shares, and emit each
    bucket's PSI term ((p_cur − p_base)·ln(p_cur/p_base); Σ > 0.2 is
    the standard "investigate" threshold).

    Fixed literal bucket edges (calibrated to this corpus's deciles)
    rather than learned quantiles keep the monitor deterministic and
    cross-engine identical — exactly how a production monitor pins
    its reference binning at baseline time.

    Scale: one scan, map-side CASE bucketing, one tiny two-key agg —
    the exchange carries windows × buckets rows. The same plan
    monitors any column at any corpus size.
    """
    e = load(spark, sf_dir, "events")
    win = F.when(
        F.col("ts") < F.lit("2024-01-16").cast("timestamp"), F.lit("base")
    ).otherwise(F.lit("cur"))
    bucket = (
        F.when(F.col("value") < 5, 0)
        .when(F.col("value") < 15, 1)
        .when(F.col("value") < 35, 2)
        .when(F.col("value") < 70, 3)
        .when(F.col("value") < 115, 4)
        .otherwise(5)
    )
    counts = (
        e.select(win.alias("win"), bucket.alias("bucket"))
        .groupBy("win", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy("win")
    frac = counts.select(
        "bucket", "win", (F.col("n").cast("double") / F.sum("n").over(tot)).alias("p")
    )
    sides = frac.groupBy("bucket").agg(
        F.max(F.when(F.col("win") == "base", F.col("p"))).alias("p_base"),
        F.max(F.when(F.col("win") == "cur", F.col("p"))).alias("p_cur"),
    )
    return sides.select(
        F.col("bucket").cast("long").alias("bucket"),
        F.round("p_base", 6).alias("p_base"),
        F.round("p_cur", 6).alias("p_cur"),
        F.round(
            (F.col("p_cur") - F.col("p_base"))
            * F.log(F.col("p_cur") / F.col("p_base")),
            6,
        ).alias("psi_term"),
    ).orderBy("bucket")


@register(
    "q114_rolling_zscore_outliers",
    oracle="""
    WITH w AS (
        SELECT event_id, user_id, value,
               avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS mu,
               stddev_samp(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS sd,
               count(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS n_hist
        FROM events
    )
    SELECT event_id, user_id,
           round(value, 3) AS value,
           round((value - mu) / sd, 3) AS z
    FROM w
    WHERE n_hist >= 10 AND sd > 1e-9 AND abs(round((value - mu) / sd, 9)) > 2.5
    ORDER BY event_id
    """,
)
def q114_rolling_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: each event scored against
    the mean/stddev of its user's PRECEDING 20 events (the frame
    excludes the current row, so an outlier can't mask itself), flag
    |z| > 2.5 with at least 10 history rows — the streaming-friendly
    outlier gate a metrics pipeline runs per entity.

    Scale: one hash-partition shuffle on user_id, then a single
    bounded-frame window pass — state per row is 20 values however
    long the history; no self-join, no global sort (the final
    orderBy is over the few flagged outliers). The deterministic
    (ts, event_id) frame order makes the result reproducible under
    retries and across engines.
    """
    frame = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    e = load(spark, sf_dir, "events")
    scored = e.select(
        "event_id",
        "user_id",
        "value",
        F.avg("value").over(frame).alias("mu"),
        F.stddev_samp("value").over(frame).alias("sd"),
        F.count("value").over(frame).alias("n_hist"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sd")
    # membership is quantized (q102's rule): the two engines compute
    # the windowed mu/sd by different algorithms, so a raw |z| within
    # an ulp of 2.5 could be flagged by one and not the other
    return (
        scored.filter(
            (F.col("n_hist") >= 10)
            & (F.col("sd") > 1e-9)
            & (F.abs(F.round(z, 9)) > 2.5)
        )
        .select(
            "event_id",
            "user_id",
            F.round("value", 3).alias("value"),
            F.round(z, 3).alias("z"),
        )
        .orderBy("event_id")
    )


@register(
    "q116_merge_intervals",
    oracle="""
    WITH iv AS (
        SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 1800000000 AS e
        FROM events
    ),
    flag AS (
        SELECT user_id, s, e,
               CASE WHEN s > max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS new_island
        FROM iv
    ),
    isl AS (
        SELECT user_id, s, e,
               sum(new_island) OVER (PARTITION BY user_id ORDER BY s, e
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS island
        FROM flag
    )
    SELECT user_id, CAST(island AS BIGINT) AS island,
           min(s) AS start_us, max(e) AS end_us,
           CAST(count(*) AS BIGINT) AS n_events
    FROM isl
    GROUP BY user_id, island
    ORDER BY user_id, island
    """,
)
def q116_merge_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-interval coalescing (the gaps-and-islands merge):
    each event opens a 30-minute activity interval; intervals that
    overlap or touch chain into one island via the classic
    running-max-end trick — `s > max(e) OVER (... 1 PRECEDING)`
    opens a new island, a prefix sum numbers them, and a groupBy
    emits the merged spans. The same shape coalesces IP sessions,
    sensor uptime, or document-span overlaps.

    Scale: one shuffle on user_id, two window passes over the same
    partitioning (Spark plans them in a single sort), one partial
    agg — integer micros end to end, so the cross-engine compare is
    exact. A first row's empty frame yields NULL -> island 0 in both
    engines.
    """
    e = load(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.lit(1_800_000_000)).alias("e"),
    )
    order = Window.partitionBy("user_id").orderBy("s", "e")
    prev = order.rowsBetween(Window.unboundedPreceding, -1)
    run = order.rowsBetween(Window.unboundedPreceding, 0)
    flagged = iv.withColumn(
        "new_island",
        F.when(F.col("s") > F.max("e").over(prev), 1).otherwise(0),
    )
    isl = flagged.withColumn(
        "island", F.sum("new_island").over(run).cast("long")
    )
    return (
        isl.groupBy("user_id", "island")
        .agg(
            F.min("s").alias("start_us"),
            F.max("e").alias("end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id", "island")
    )


@register(
    "q125_ewma_latest",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ),
    latest AS (SELECT user_id, max(rn) AS n FROM seq GROUP BY user_id)
    SELECT l.user_id,
           max(CASE WHEN s.rn = l.n THEN s.event_id END) AS event_id,
           round(sum(s.value * power(0.7, l.n - s.rn))
                 / sum(power(0.7, l.n - s.rn)), 6) AS ewma
    FROM latest l
    JOIN seq s ON s.user_id = l.user_id AND s.rn BETWEEN l.n - 19 AND l.n
    GROUP BY l.user_id, l.n
    ORDER BY l.user_id
    """,
)
def q125_ewma_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted trailing average (decay 0.7, trailing
    20 events, weights normalized) of event value per user, reported
    at each user's latest event — the standard smoothed monitoring
    signal the reference's event-log surface lacks (time-series
    extension alongside q28/q30/q114).

    The recurrence unrolls inside the bounded frame to
    sum_j 0.7^j x_{n-j} / sum_j 0.7^j (j = 0..min(n,20)-1); the
    normalizing denominator makes the short-history boundary exact
    with no special case. Spark evaluates it as 20 lag() terms over
    ONE window sort; the oracle evaluates the identical formula by
    joining each user's trailing 20 rows. Exponents stay in
    [0.7^19, 1], so both engines' doubles agree far below the
    round(6) guard.

    Scale: one shuffle on user_id; row_number and all 20 lags share
    a single WindowExec sort; per-key state is 20 rows (O(1) memory
    per user), so skewed users cost sort time, not state — the same
    property that makes this shape safe as a streaming stateful op.
    """
    e = load(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "event_id", "value", F.row_number().over(order).alias("rn")
    )
    byrn = Window.partitionBy("user_id").orderBy("rn")
    num, den = F.lit(0.0), F.lit(0.0)
    for j in range(20):
        x = F.col("value") if j == 0 else F.lag("value", j).over(byrn)
        w = F.pow(F.lit(0.7), F.lit(j))
        num = num + F.coalesce(x * w, F.lit(0.0))
        # the weight counts whenever the lagged ROW exists (rn > j),
        # matching the oracle's SUM over every row in the trailing
        # frame — SQL SUM skips NULL values only in the numerator, so
        # gating on x.isNotNull() would diverge on a NULL value
        den = den + F.when(F.col("rn") > F.lit(j), w).otherwise(F.lit(0.0))
    smoothed = seq.withColumn("ewma", F.round(num / den, 6))
    w_all = Window.partitionBy("user_id")
    return (
        smoothed.withColumn("n", F.max("rn").over(w_all))
        .filter(F.col("rn") == F.col("n"))
        .select("user_id", "event_id", "ewma")
        .orderBy("user_id")
    )


@register(
    "q126_mad_outliers",
    oracle="""
    WITH med AS (
        SELECT event_type,
               quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, e.value, m.med,
               abs(e.value - m.med) AS adev
        FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           round(max(d.med), 4) AS med,
           round(max(m.mad), 4) AS mad,
           CAST(sum(CASE WHEN abs(d.value - d.med) > 3 * 1.4826 * m.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           count(*) AS n
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    ORDER BY d.event_type
    """,
)
def q126_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event_type via the median
    absolute deviation: |x - median| > 3 * 1.4826 * MAD (the
    consistency constant scales MAD to sigma under normality).
    Median/MAD resist the contamination that wrecks the z-score
    (q114's rolling z-score is the parametric sibling).

    Spark's exact `percentile` and DuckDB's `quantile_cont` both
    linearly interpolate, so the medians agree bit-for-bit on the
    same doubles; round(4) guards the emitted floats and the
    outlier rule compares against the unrounded values in both
    engines.

    Scale: two grouped exact percentiles + one final agg = three
    shuffles on event_type (a handful of groups). Exact percentile
    buffers each group's values — correct here because cardinality
    per group is bounded by events/|event_types|; at 100 TB swap in
    percentile_approx (t-digest, mergeable partial agg) and the plan
    keeps the same shape with O(1) state. The dims (med, mad) ride
    broadcast joins back onto the fact scan.
    """
    e = load(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.max("med"), 4).alias("med"),
            F.round(F.max("mad"), 4).alias("mad"),
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("med"))
                    > F.lit(3 * 1.4826) * F.col("mad"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "q127_session_transitions",
    oracle="""
    WITH gaps AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts, event_id, event_type,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM gaps
    ),
    trans AS (
        SELECT event_type AS src,
               lead(event_type) OVER (PARTITION BY user_id, session_id
                                      ORDER BY ts, event_id) AS dst
        FROM sess
    )
    SELECT src, dst, count(*) AS n,
           round(CAST(count(*) AS DOUBLE)
                 / sum(count(*)) OVER (PARTITION BY src), 4) AS p
    FROM trans
    WHERE dst IS NOT NULL
    GROUP BY src, dst
    ORDER BY src, dst
    """,
)
def q127_session_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over event types within
    sessions (30-min gap sessionization, q28's rule): for each
    (src -> dst) adjacent pair, the count and the row-normalized
    transition probability — the standard clickstream / user-journey
    model the reference's event surface lacks.

    Scale: sessionize and lead() share ONE user_id shuffle and sort
    (session_id is a running sum over the same window order, and
    the lead partition (user_id, session_id) is a refinement of it,
    so Spark plans a single Exchange + Sort); the transition count
    is a map-side-combined agg on a |event_types|^2-bounded key
    space, and the probability normalization is a window over that
    tiny aggregate — nothing downstream of the first shuffle scales
    with row count.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # micros to match the oracle's full-precision INTERVAL compare
    # (q28's rule)
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    sess = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0),
    ).withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ws = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    trans = sess.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(ws).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    counts = trans.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    wsrc = Window.partitionBy("src")
    return counts.withColumn(
        "p", F.round(F.col("n").cast("double") / F.sum("n").over(wsrc), 4)
    ).orderBy("src", "dst")


@register(
    "q140_retention_cohorts",
    oracle="""
    WITH firsts AS (
        SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id
    ),
    weekly AS (
        SELECT DISTINCT e.user_id,
               CAST(epoch_us(f.first_ts) // 604800000000 AS BIGINT) AS cohort_week,
               CAST((epoch_us(e.ts) - epoch_us(f.first_ts)) // 604800000000 AS BIGINT)
                   AS week_offset
        FROM events e JOIN firsts f USING (user_id)
    ),
    sizes AS (
        SELECT cohort_week, count(*) AS cohort_size
        FROM weekly WHERE week_offset = 0 GROUP BY cohort_week
    )
    SELECT w.cohort_week, w.week_offset,
           count(*) AS n_active,
           round(CAST(count(*) AS DOUBLE) / max(s.cohort_size), 4) AS retention
    FROM weekly w JOIN sizes s USING (cohort_week)
    GROUP BY w.cohort_week, w.week_offset
    ORDER BY w.cohort_week, w.week_offset
    """,
)
def q140_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week
    (integer week index since epoch — identical arithmetic in both
    engines, no calendar-truncation divergence), and for each cohort
    the share still active N weeks later — THE product-analytics
    rollup over an event log, composing first-touch attribution
    (q38's latest-per-key mirrored) with distinct-user aggregation.

    Every cohort's week-0 retention is 1.0 by construction (the
    first event itself), which doubles as a built-in sanity row per
    cohort.

    Scale: one shuffle to find first_ts per user, a broadcast of
    nothing — the firsts relation joins back on user_id (hash join,
    AQE-broadcast when small), then the DISTINCT and the rollup are
    both map-side combined on (user, cohort, offset) / (cohort,
    offset) keys bounded by users × weeks, not events.
    """
    e = load(spark, sf_dir, "events")
    week_us = 7 * 24 * 3600 * 1_000_000
    firsts = e.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    weekly = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            F.floor(F.unix_micros("first_ts") / week_us)
            .cast("long")
            .alias("cohort_week"),
            F.floor(
                (F.unix_micros("ts") - F.unix_micros("first_ts")) / week_us
            )
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    sizes = (
        weekly.filter(F.col("week_offset") == 0)
        .groupBy("cohort_week")
        .agg(F.count(F.lit(1)).alias("cohort_size"))
    )
    return (
        weekly.join(sizes, "cohort_week")
        .groupBy("cohort_week", "week_offset")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.round(
                F.count(F.lit(1)).cast("double") / F.max("cohort_size"), 4
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "q146_funnel_3step",
    oracle="""
    WITH base AS (
        SELECT user_id, event_type, epoch_us(ts) AS t FROM events
    ),
    c AS (
        SELECT user_id, event_type, t,
               min(CASE WHEN event_type = 'click' THEN t END)
                   OVER (PARTITION BY user_id) AS c_ts
        FROM base
    ),
    v AS (
        SELECT user_id, event_type, t, c_ts,
               min(CASE WHEN event_type = 'view' AND t > c_ts THEN t END)
                   OVER (PARTITION BY user_id) AS v_ts
        FROM c
    ),
    p AS (
        SELECT user_id, c_ts, v_ts,
               min(CASE WHEN event_type = 'purchase' AND t > v_ts THEN t END)
                   OVER (PARTITION BY user_id) AS p_ts
        FROM v
    ),
    per_user AS (
        SELECT user_id, max(c_ts) AS c_ts, max(v_ts) AS v_ts, max(p_ts) AS p_ts
        FROM p GROUP BY user_id
    )
    SELECT
        CAST(sum(CASE WHEN c_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS step1_click,
        CAST(sum(CASE WHEN v_ts IS NOT NULL
                       AND v_ts <= c_ts + 604800000000 THEN 1 ELSE 0 END) AS BIGINT)
            AS step2_view,
        CAST(sum(CASE WHEN v_ts IS NOT NULL AND v_ts <= c_ts + 604800000000
                       AND p_ts IS NOT NULL AND p_ts <= c_ts + 604800000000
                      THEN 1 ELSE 0 END) AS BIGINT)
            AS step3_purchase
    FROM per_user
    """,
)
def q146_funnel_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-step strict-order conversion funnel (first-touch): per
    user the earliest click, the earliest view AFTER that click, the
    earliest purchase AFTER that view — counting users completing
    each step within 7 days of the click. Extends the 2-step funnel
    (q90) to the windowed multi-step shape product analytics calls
    `windowFunnel` — strict event ORDER, not mere presence.

    Scale: three window passes over ONE user_id partitioning (each
    step's anchor is a partition-wide min the next pass conditions
    on — Spark plans one Exchange + one Sort, three WindowExec), then
    a per-user collapse and a scalar rollup. No joins, no row
    explosion; skewed users cost sort time only. Integer micros end
    to end, so the cross-engine compare is exact.
    """
    e = load(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id")
    base = e.select("user_id", "event_type", F.unix_micros("ts").alias("t"))
    c = base.withColumn(
        "c_ts",
        F.min(F.when(F.col("event_type") == "click", F.col("t"))).over(wu),
    )
    v = c.withColumn(
        "v_ts",
        F.min(
            F.when(
                (F.col("event_type") == "view") & (F.col("t") > F.col("c_ts")),
                F.col("t"),
            )
        ).over(wu),
    )
    p = v.withColumn(
        "p_ts",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("t") > F.col("v_ts")),
                F.col("t"),
            )
        ).over(wu),
    )
    per_user = p.groupBy("user_id").agg(
        F.max("c_ts").alias("c_ts"),
        F.max("v_ts").alias("v_ts"),
        F.max("p_ts").alias("p_ts"),
    )
    week = 7 * 24 * 3600 * 1_000_000
    in_w = F.col("v_ts").isNotNull() & (F.col("v_ts") <= F.col("c_ts") + week)
    return per_user.agg(
        F.sum(F.when(F.col("c_ts").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("step1_click"),
        F.sum(F.when(in_w, 1).otherwise(0)).cast("long").alias("step2_view"),
        F.sum(
            F.when(
                in_w
                & F.col("p_ts").isNotNull()
                & (F.col("p_ts") <= F.col("c_ts") + week),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("step3_purchase"),
    )


@register(
    "q147_rolling_active_users",
    oracle="""
    WITH du AS (
        SELECT DISTINCT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               user_id
        FROM events
    ),
    days AS (SELECT DISTINCT day FROM du),
    contrib AS (
        SELECT du.user_id, du.day + g.o AS target_day
        FROM du CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS o) g
    ),
    wau AS (
        SELECT d.day, count(DISTINCT c.user_id) AS wau
        FROM days d JOIN contrib c ON c.target_day = d.day
        GROUP BY d.day
    ),
    dau AS (SELECT day, count(*) AS dau FROM du GROUP BY day)
    SELECT d.day, dau.dau, wau.wau,
           round(CAST(dau.dau AS DOUBLE) / wau.wau, 4) AS stickiness
    FROM days d JOIN dau USING (day) JOIN wau USING (day)
    ORDER BY d.day
    """,
)
def q147_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness per day — the
    engagement dashboard rollup. Rolling DISTINCT cannot be a
    window aggregate (distincts don't merge across frames), so the
    scalable re-expression fans each (day, user) presence out to
    the ≤7 future days it keeps the user "active" for, then counts
    distinct per target day — the standard contribution-expansion
    trick.

    Scale: the (day, user) presence relation is one distinct
    (map-side combined, bounded by users × days, not events); the
    ×7 expansion is map-only; the per-day distinct shuffles
    (user, day) pairs once. State never exceeds presence × window /
    span — at 100 TB the same query runs on the presence TABLE the
    daily rollup already materializes (warehouse pre-agg A4), and
    for approximate dashboards the HLL sketch (q113) makes the
    whole thing mergeable without the fan-out.

    Physical shape (r16, guide §2.4 "remove shuffles outright"): DAU,
    WAU and the day filter all come out of ONE aggregation over the
    offset-tagged contribution expansion —
      dau(d) = #contributions at d with offset 0 (≡ the du rows at d),
      wau(d) = countDistinct(user) over all contributions at d,
      d is a REAL day ⟺ dau(d) > 0 (every real day contributes to
      itself at offset 0; a horizon day beyond the last real day has
      only offset>0 contributions) — so the separate days/dau/wau
      relations and their three joins collapse into one Expand-based
      distinct aggregate plus a post-agg filter. The r15 form planned
      11 exchanges and scanned events twice (du → days AND contrib);
      this plans 4 (du distinct, the two-level countDistinct pair,
      the final sort) with one events scan. Row-identical: du rows
      are distinct, so the offset-0 count per day equals count(*) of
      du at that day, and the day key sets of dau/wau/days coincide.
    """
    e = load(spark, sf_dir, "events")
    day_us = 86400 * 1_000_000
    du = (
        e.select(
            F.floor(F.unix_micros("ts") / day_us).cast("long").alias("day"),
            "user_id",
        )
        .distinct()
    )
    contrib = du.select(
        "user_id",
        F.col("day").alias("src_day"),
        F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias(
            "target_day"
        ),
    )
    return (
        contrib.groupBy(F.col("target_day").alias("day"))
        .agg(
            F.count(F.when(F.col("src_day") == F.col("target_day"), 1)).alias(
                "dau"
            ),
            F.countDistinct("user_id").alias("wau"),
        )
        .filter(F.col("dau") > 0)
        .select(
            "day",
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 4).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )


@register(
    "q151_weekday_anomaly",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               dayofweek(CAST(ts AS DATE)) AS dow,
               avg(value) AS da
        FROM events GROUP BY 1, 2, 3
    ),
    prof AS (
        SELECT event_type, dow,
               avg(da) AS m, stddev_samp(da) AS s, count(*) AS n
        FROM daily GROUP BY event_type, dow
    )
    SELECT d.event_type, strftime(d.d, '%Y-%m-%d') AS day,
           round(d.da, 4) AS daily_avg,
           round((d.da - p.m) / p.s, 4) AS z_score
    FROM daily d JOIN prof p USING (event_type, dow)
    WHERE p.n >= 2 AND p.s > 1e-12
    ORDER BY abs(round((d.da - p.m) / p.s, 4)) DESC, d.event_type, d.d
    LIMIT 10
    """,
)
def q151_weekday_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline anomaly detection: each (event_type, day)'s
    mean value scored against that type's SAME-WEEKDAY profile
    (mean ± std over the month), top-10 deviations — the
    "is today weird for a Tuesday" monitor that a flat z-score
    (q114) gets wrong on weekly-periodic metrics.

    Weekday numbering is pinned cross-engine: Spark's dayofweek is
    1-based Sunday, DuckDB's 0-based Sunday, so Spark subtracts 1.
    The ranking key is the ROUNDED |z| with (type, day) tiebreak.

    Scale: the daily rollup is the only corpus-touching exchange;
    the profile is |types|×7 rows broadcast back onto it. Profile
    cells with fewer than 2 days or zero variance are excluded
    rather than dividing by ~0.
    """
    e = load(spark, sf_dir, "events")
    daily = (
        e.select(
            "event_type",
            F.col("ts").cast("date").alias("d"),
            (F.dayofweek(F.col("ts").cast("date")) - 1).alias("dow"),
            "value",
        )
        .groupBy("event_type", "d", "dow")
        .agg(F.avg("value").alias("da"))
    )
    prof = daily.groupBy("event_type", "dow").agg(
        F.avg("da").alias("m"),
        F.stddev_samp("da").alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    z = F.round((F.col("da") - F.col("m")) / F.col("s"), 4)
    return (
        daily.join(F.broadcast(prof), ["event_type", "dow"])
        .filter((F.col("n") >= 2) & (F.col("s") > 1e-12))
        .select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.round("da", 4).alias("daily_avg"),
            z.alias("z_score"),
        )
        .orderBy(F.abs(F.col("z_score")).desc(), "event_type", "day")
        .limit(10)
    )


@register(
    "q154_marketing_attribution",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type, value,
               CASE WHEN event_type = 'click'
                    THEN 'ch' || CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) % 4 AS VARCHAR)
               END AS click_ch
        FROM events
    ),
    attributed AS (
        SELECT event_type, value,
               last_value(click_ch IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS ch
        FROM flagged
    )
    SELECT coalesce(ch, 'organic') AS channel,
           count(*) AS n_purchases,
           round(sum(value), 4) AS revenue
    FROM attributed
    WHERE event_type = 'purchase'
    GROUP BY coalesce(ch, 'organic')
    ORDER BY channel
    """,
)
def q154_marketing_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase's revenue is
    credited to the channel of the user's most recent STRICTLY
    preceding click (channel = click's props.k mod 4; no preceding
    click → 'organic') — the as-of-join shape (q36) expressed as one
    ignore-nulls window so purchases and clicks never join.

    Scale: ONE exchange on user_id; last(ignorenulls) over the
    unbounded-preceding frame is O(1) running state per user in a
    single WindowExec sort, then the per-channel rollup is a
    |channels|-row partial agg. The same plan serves first-touch by
    flipping last→first.
    """
    e = load(spark, sf_dir, "events")
    ch = F.concat(
        F.lit("ch"),
        (F.get_json_object("props", "$.k").cast("int") % 4).cast("string"),
    )
    flagged = e.select(
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
    attributed = flagged.withColumn(
        "ch", F.last("click_ch", ignorenulls=True).over(w)
    )
    return (
        attributed.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.col("ch"), F.lit("organic")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 4).alias("revenue"),
        )
        .orderBy("channel")
    )


@register(
    "q155_cusum_changepoint",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, avg(value) AS v
        FROM events GROUP BY 1, 2
    ),
    m AS (SELECT event_type, avg(v) AS mu FROM daily GROUP BY event_type),
    c AS (
        SELECT daily.event_type, d,
               round(sum(v - mu) OVER (
                   PARTITION BY daily.event_type ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cusum
        FROM daily JOIN m USING (event_type)
    ),
    ranked AS (
        SELECT event_type, d, cusum,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY abs(cusum) DESC, d) AS rn
        FROM c
    )
    SELECT event_type, strftime(d, '%Y-%m-%d') AS change_day,
           cusum AS peak_cusum
    FROM ranked WHERE rn = 1
    ORDER BY event_type
    """,
)
def q155_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point candidate per event_type: cumulative sum of
    (daily mean − overall mean) over the day series; the day where
    |CUSUM| peaks is the classic single-change-point estimate (Page's
    statistic with known target) — the level-shift detector
    complementing q114's pointwise outliers and q151's seasonal ones.

    The CUSUM is ROUNDED to 6 before the argmax ranking (date
    tiebreak), so the reported peak can't flip on an ulp between
    engines.

    Scale: the daily rollup is the only corpus exchange; the per-type
    mean is a |types|-row broadcast; the cumulative window and argmax
    share one tiny per-type sort over ~days rows.
    """
    e = load(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.avg("value").alias("v"))
    )
    m = daily.groupBy("event_type").agg(F.avg("v").alias("mu"))
    wc = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = daily.join(F.broadcast(m), "event_type").withColumn(
        "cusum", F.round(F.sum(F.col("v") - F.col("mu")).over(wc), 6)
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum")).desc(), "d"
    )
    return (
        c.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("change_day"),
            F.col("cusum").alias("peak_cusum"),
        )
        .orderBy("event_type")
    )


@register(
    "q157_survival_retention",
    oracle="""
    WITH spans AS (
        SELECT user_id, CAST(min(ts) AS DATE) AS f, CAST(max(ts) AS DATE) AS l
        FROM events GROUP BY user_id
    ),
    bound AS (SELECT max(l) AS endd FROM spans),
    per_user AS (
        SELECT date_diff('day', f, l) AS lifetime,
               l < (SELECT endd FROM bound) - 3 AS churned
        FROM spans
    ),
    lt AS (
        SELECT lifetime AS t, count(*) AS n_all,
               count(CASE WHEN churned THEN 1 END) AS n_death
        FROM per_user GROUP BY lifetime
    ),
    grid AS (SELECT unnest(generate_series(0, 14)) AS t),
    g2 AS (
        SELECT g.t, coalesce(lt.n_all, 0) AS n_all,
               coalesce(lt.n_death, 0) AS d
        FROM grid g LEFT JOIN lt ON lt.t = g.t
    ),
    km AS (
        SELECT t, d,
               (SELECT count(*) FROM per_user) - coalesce(sum(n_all) OVER (
                   ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS at_risk
        FROM g2
    )
    SELECT t AS day, CAST(at_risk AS BIGINT) AS at_risk,
           CAST(d AS BIGINT) AS n_churned,
           round(exp(sum(CASE WHEN d = 0 THEN 0.0
                              ELSE ln(1.0 - CAST(d AS DOUBLE) / at_risk) END)
                     OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW)), 4) AS survival
    FROM km
    ORDER BY day
    """,
)
def q157_survival_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of user lifetime (days between
    first and last event), days 0-14: users whose last activity ends
    more than 3 days before the observation end are churn events,
    the rest are right-censored — the product-limit retention curve
    a naive "% still active" overstates because it ignores censoring.

    S(t) = Π_{u ≤ t} (1 − d_u / n_u) is evaluated as exp of a
    cumulative log-sum over the 15-day grid; every day 0-14 appears
    in the grid, so the at-risk reverse-cumulative needs no
    inequality join.

    Scale: one user-level agg (the corpus exchange), then ALL
    survival arithmetic runs on a ≤ max-lifetime-row relation —
    death/censor counts per integer day, window cumsums over ~30
    rows. The observation bound and the user total ride ONE 1-row
    broadcast aggregate — no eager driver-side count job.
    """
    e = load(spark, sf_dir, "events")
    spans = e.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("f"),
        F.max("ts").cast("date").alias("l"),
    )
    bound = spans.agg(
        F.max("l").alias("endd"), F.count(F.lit(1)).alias("total")
    )
    per_user = spans.crossJoin(F.broadcast(bound)).select(
        F.datediff("l", "f").alias("lifetime"),
        (F.col("l") < F.date_sub(F.col("endd"), 3)).alias("churned"),
    )
    lt = per_user.groupBy(F.col("lifetime").alias("t")).agg(
        F.count(F.lit(1)).alias("n_all"),
        F.count(F.when(F.col("churned"), 1)).alias("n_death"),
    )
    grid = spark.range(0, 15).select(F.col("id").alias("t"))
    g2 = (
        grid.join(lt, "t", "left")
        .crossJoin(F.broadcast(bound.select("total")))
        .select(
            "t",
            F.coalesce("n_all", F.lit(0)).alias("n_all"),
            F.coalesce("n_death", F.lit(0)).alias("d"),
            "total",
        )
    )
    wprev = (
        Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    )
    wrun = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    km = g2.withColumn(
        "at_risk",
        F.col("total") - F.coalesce(F.sum("n_all").over(wprev), F.lit(0)),
    )
    term = F.when(F.col("d") == 0, F.lit(0.0)).otherwise(
        F.log(1.0 - F.col("d").cast("double") / F.col("at_risk"))
    )
    return km.select(
        F.col("t").alias("day"),
        F.col("at_risk").cast("long").alias("at_risk"),
        F.col("d").cast("long").alias("n_churned"),
        F.round(F.exp(F.sum(term).over(wrun)), 4).alias("survival"),
    ).orderBy("day")


@register(
    "q164_conversion_time_percentiles",
    oracle="""
    WITH su AS (
        SELECT user_id, min(ts) AS st FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    pu AS (
        SELECT e.user_id,
               CAST(date_diff('microsecond', su.st, min(e.ts)) AS DOUBLE) / 1000000.0 AS secs
        FROM events e JOIN su USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts >= su.st
        GROUP BY e.user_id, su.st
    )
    SELECT count(*) AS n_converted,
           round(quantile_cont(secs, 0.25), 3) AS p25,
           round(quantile_cont(secs, 0.5), 3)  AS p50,
           round(quantile_cont(secs, 0.75), 3) AS p75,
           round(quantile_cont(secs, 0.9), 3)  AS p90
    FROM pu
    """,
)
def q164_conversion_time_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-conversion distribution: per user, seconds from first
    signup to the first purchase at-or-after it, summarized as exact
    p25/p50/p75/p90 — the activation-latency readout that pairs with
    the funnel's conversion COUNT (q146) by answering "how long".

    Scale: both sides aggregate on user_id before joining, so the
    join carries one row per user, not per event, and reuses the
    same hash partitioning (zero extra exchange under AQE). The
    exact percentiles run over |converted users| — for a quantile
    over raw events at 100 TB, q160's mergeable log-histogram is
    the drop-in.
    """
    e = load(spark, sf_dir, "events")
    su = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("st"))
    )
    pu = (
        e.filter(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .filter(F.col("ts") >= F.col("st"))
        .groupBy("user_id", "st")
        .agg(F.min("ts").alias("pt"))
        .select(
            ((F.unix_micros("pt") - F.unix_micros("st")).cast("double") / 1e6).alias(
                "secs"
            )
        )
    )
    return pu.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.percentile("secs", F.lit(0.25)), 3).alias("p25"),
        F.round(F.percentile("secs", F.lit(0.5)), 3).alias("p50"),
        F.round(F.percentile("secs", F.lit(0.75)), 3).alias("p75"),
        F.round(F.percentile("secs", F.lit(0.9)), 3).alias("p90"),
    )


@register(
    "q165_top_event_paths",
    oracle="""
    WITH p AS (
        SELECT event_type || '>' || lead(event_type, 1) OVER w
                          || '>' || lead(event_type, 2) OVER w AS path
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT path, count(*) AS n
    FROM p WHERE path IS NOT NULL
    GROUP BY path
    ORDER BY n DESC, path
    LIMIT 10
    """,
)
def q165_top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most common 3-step event paths (user-ordered event-type
    trigrams, 'a>b>c') — the path-mining readout behind funnel
    DISCOVERY: q127's Markov matrix assumes one-step memory, this
    surfaces the actual multi-step flows to pick funnel anchors
    (q146) from.

    Path strings use NULL-propagating concat (F.concat, not
    concat_ws) so incomplete tails at the end of each user's stream
    drop out identically in both engines.

    Scale: both lead() terms share ONE user_id window sort; the path
    rollup is a map-side-combining count on at most |types|³ keys
    and the top-10 is a TakeOrdered heap.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = e.select(
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
    )


@register(
    "q166_theil_sen_trend",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, avg(value) AS v
        FROM events GROUP BY 1, 2
    ),
    slopes AS (
        SELECT a.event_type,
               (b.v - a.v) / date_diff('day', a.d, b.d) AS slope
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.d < b.d
    )
    SELECT event_type, count(*) AS n_pairs,
           round(quantile_cont(slope, 0.5), 6) AS ts_slope
    FROM slopes
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q166_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per event_type: the MEDIAN of all
    pairwise day-over-day slopes of the daily-mean series — the
    outlier-resistant alternative to q115's least-squares trend (one
    corrupted day breaks OLS, but not the pairwise-slope median).

    Scale: the pairwise self-join runs on the DAILY ROLLUP, so its
    cost is |days|² per type (~465 pairs/type for a month) no matter
    how many raw events exist — the corpus is touched exactly once
    by the daily aggregate. For multi-year series the standard
    windowed Theil-Sen (pairs within a bounded day lag) keeps the
    pair count linear; same plan with a range predicate.
    """
    e = load(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.avg("value").alias("v"))
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.d") < F.col("b.d")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            (F.col("b.v") - F.col("a.v"))
            / F.datediff(F.col("b.d"), F.col("a.d"))
        ).alias("slope"),
    )
    return (
        slopes.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.percentile("slope", F.lit(0.5)), 6).alias("ts_slope"),
        )
        .orderBy("event_type")
    )


@register(
    "q167_rfm_segments",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
    bound AS (SELECT max(CAST(ts AS DATE)) AS endd FROM p),
    rfm AS (
        SELECT user_id,
               date_diff('day', CAST(max(ts) AS DATE), (SELECT endd FROM bound)) AS rec,
               count(*) AS freq,
               round(sum(value), 4) AS mon
        FROM p GROUP BY user_id
    ),
    q AS (
        SELECT user_id,
               ntile(4) OVER (ORDER BY rec, user_id) AS r_q,
               ntile(4) OVER (ORDER BY freq DESC, user_id) AS f_q,
               ntile(4) OVER (ORDER BY mon DESC, user_id) AS m_q
        FROM rfm
    )
    SELECT CAST(r_q AS BIGINT) || '-' || CAST(f_q AS BIGINT) || '-' || CAST(m_q AS BIGINT) AS segment,
           count(*) AS n_users
    FROM q
    GROUP BY 1
    ORDER BY segment
    """,
)
def q167_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) quartile segmentation of
    purchasers — the standard customer-base cut ('1-1-1' = best
    quartile on all three axes). Monetary totals round to 4 BEFORE
    the quartile ordering and every ntile orders with a user_id
    tiebreak, so quartile boundaries are engine-stable.

    Scale: one purchase-keyed user aggregate (the corpus exchange),
    then three global ntiles over the |purchasers| relation, each
    routed through the operators/ranking size-aware dispatch: below
    the measured ~500k crossover they run the plain single-partition
    window (3-4× cheaper on collapsed relations), above it the
    two-pass bucket-offset recipe with every WindowExec partitioned —
    the production choice modeled in the registry (r9 verdict item
    #6; q196 remains the window-free sketch sibling). The segment
    rollup is 64 keys either way.
    """
    from g_etl_spark.operators.ranking import (
        TWOPASS_CROSSOVER_ROWS,
        global_ntile_twopass,
        log2_bucket,
    )

    e = load(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase")
    bound = p.agg(F.max(F.col("ts").cast("date")).alias("endd"))
    rfm = (
        p.groupBy("user_id")
        .agg(
            F.max(F.col("ts").cast("date")).alias("lastd"),
            F.count(F.lit(1)).alias("freq"),
            F.round(F.sum("value"), 4).alias("mon"),
        )
        .crossJoin(F.broadcast(bound))
        .select(
            "user_id",
            F.datediff("endd", "lastd").alias("rec"),
            "freq",
            "mon",
        )
    )
    q = global_ntile_twopass(
        rfm,
        4,
        ["rec", "user_id"],
        log2_bucket(F.col("rec")),
        out="r_q",
        threshold_rows=TWOPASS_CROSSOVER_ROWS,
    ).withColumn("negf", -F.col("freq"))
    q = global_ntile_twopass(
        q,
        4,
        ["negf", "user_id"],
        -log2_bucket(F.col("freq")),
        out="f_q",
        threshold_rows=TWOPASS_CROSSOVER_ROWS,
    ).withColumn("negm", -F.col("mon"))
    q = global_ntile_twopass(
        q,
        4,
        ["negm", "user_id"],
        -log2_bucket(F.col("mon")),
        out="m_q",
        threshold_rows=TWOPASS_CROSSOVER_ROWS,
    )
    seg = F.concat_ws(
        "-",
        F.col("r_q").cast("long").cast("string"),
        F.col("f_q").cast("long").cast("string"),
        F.col("m_q").cast("long").cast("string"),
    )
    return (
        q.groupBy(seg.alias("segment"))
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("segment")
    )


@register(
    "q168_cohort_ltv_curves",
    oracle="""
    WITH first_seen AS (
        SELECT user_id,
               date_diff('day', DATE '2024-01-01', CAST(min(ts) AS DATE)) AS di0
        FROM events GROUP BY user_id
    ),
    cohorts AS (
        SELECT user_id, di0 // 7 AS cohort, di0 FROM first_seen
    ),
    sizes AS (SELECT cohort, count(*) AS n_users FROM cohorts GROUP BY cohort),
    rev AS (
        SELECT c.cohort,
               (date_diff('day', DATE '2024-01-01', CAST(e.ts AS DATE)) - c.di0) // 7 AS week_k,
               sum(e.value) AS wrev
        FROM events e JOIN cohorts c USING (user_id)
        WHERE e.event_type = 'purchase'
        GROUP BY 1, 2
    ),
    cum AS (
        SELECT cohort, week_k,
               sum(wrev) OVER (PARTITION BY cohort ORDER BY week_k
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS crev
        FROM rev
    )
    SELECT c.cohort, c.week_k, s.n_users,
           round(c.crev / s.n_users, 4) AS ltv_per_user
    FROM cum c JOIN sizes s USING (cohort)
    ORDER BY cohort, week_k
    """,
)
def q168_cohort_ltv_curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: users grouped by first-seen week; for each
    cohort, cumulative purchase revenue per cohort member by weeks
    since each user's own first event — the revenue twin of q140's
    retention matrix (how much a cohort is WORTH over time, not just
    whether it returns).

    Scale: one user-level first-seen aggregate, one
    (cohort, week) revenue rollup riding a user-keyed join that
    reuses the first agg's partitioning, then the cumulative window
    runs on the tiny cohort×week relation. The curve is mergeable
    across data arrivals: new weeks append, old cells never change
    (event-time append-only), which is what makes it a standing
    incremental rollup (A4's pattern).
    """
    e = load(spark, sf_dir, "events")
    di = lambda c: F.datediff(F.col(c).cast("date"), F.lit("2024-01-01").cast("date"))  # noqa: E731
    firsts = e.groupBy("user_id").agg(
        F.datediff(F.min("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "di0"
        )
    )
    # floor division (not double-divide + truncating cast): the
    # oracle's `//` floors, so a pre-anchor first event (negative
    # di0) must land in cohort -1 in both engines, not 0
    cohorts = firsts.select(
        "user_id", F.floor(F.col("di0") / 7).cast("long").alias("cohort"), "di0"
    )
    sizes = cohorts.groupBy("cohort").agg(F.count(F.lit(1)).alias("n_users"))
    rev = (
        e.filter(F.col("event_type") == "purchase")
        .join(cohorts, "user_id")
        .groupBy(
            "cohort",
            F.floor((di("ts") - F.col("di0")) / 7).cast("long").alias("week_k"),
        )
        .agg(F.sum("value").alias("wrev"))
    )
    wc = (
        Window.partitionBy("cohort")
        .orderBy("week_k")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = rev.withColumn("crev", F.sum("wrev").over(wc))
    return (
        cum.join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "week_k",
            "n_users",
            F.round(F.col("crev") / F.col("n_users"), 4).alias("ltv_per_user"),
        )
        .orderBy("cohort", "week_k")
    )


@register(
    "q173_max_concurrency",
    oracle="""
    WITH iv AS (
        SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 1800000000 AS e
        FROM events
    ),
    flag AS (
        SELECT user_id, s, e,
               CASE WHEN s > max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS new_island
        FROM iv
    ),
    isl AS (
        SELECT user_id, s, e,
               sum(new_island) OVER (PARTITION BY user_id ORDER BY s, e
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS island
        FROM flag
    ),
    sessions AS (
        SELECT user_id, island, min(s) AS s, max(e) AS e
        FROM isl GROUP BY user_id, island
    ),
    sweep AS (
        SELECT s AS t, 1 AS delta FROM sessions
        UNION ALL
        SELECT e AS t, -1 AS delta FROM sessions
    ),
    running AS (
        SELECT t, delta,
               sum(delta) OVER (ORDER BY t, delta
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS conc
        FROM sweep
    )
    SELECT CAST(max(conc) AS BIGINT) AS max_concurrent,
           min(CASE WHEN conc = (SELECT max(conc) FROM running) THEN t END) AS first_peak_us,
           (SELECT CAST(count(*) AS BIGINT) FROM sessions) AS n_sessions
    FROM running
    """,
)
def q173_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions (capacity planning): merge each
    user's overlapping 30-minute activity intervals into sessions
    (q116's islands), then sweep-line over ALL session boundaries —
    +1 at start, −1 at end, running sum, global max + the first
    time it is reached. Closures sort before openings at the same
    microsecond (delta −1 < +1 in the ordering), so a session ending
    exactly when another starts never double-counts.

    Scale: sessionization is the one user-keyed exchange, evaluated
    ONCE — both boundaries of a session are emitted by a single
    explode (no union of two copies of the window subtree), the
    session count folds into the same final aggregate (sum of +1
    deltas), and the peak + its first time come from one struct-max
    (max conc, then min t) — one plan, one pass, no eager driver
    jobs. The sweep runs over 2×|sessions| boundary rows, bounded by
    activity, not events. The global running sum is a single-
    partition window — at 100 TB the standard fix is a two-pass
    range-partitioned cumulative (per-partition sums, then prefix
    offsets broadcast), same arithmetic, and |boundaries| is already
    tiny relative to the corpus.
    """
    e = load(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.lit(1_800_000_000)).alias("e"),
    )
    order = Window.partitionBy("user_id").orderBy("s", "e")
    prev = order.rowsBetween(Window.unboundedPreceding, -1)
    run = order.rowsBetween(Window.unboundedPreceding, 0)
    isl = iv.withColumn(
        "new_island",
        F.when(F.col("s") > F.max("e").over(prev), 1).otherwise(0),
    ).withColumn("island", F.sum("new_island").over(run))
    sessions = isl.groupBy("user_id", "island").agg(
        F.min("s").alias("s"), F.max("e").alias("e")
    )
    sweep = sessions.select(
        F.explode(
            F.array(
                F.struct(F.col("s").alias("t"), F.lit(1).alias("delta")),
                F.struct(F.col("e").alias("t"), F.lit(-1).alias("delta")),
            )
        ).alias("b")
    ).select("b.t", "b.delta")
    wrun = Window.orderBy("t", "delta").rowsBetween(
        Window.unboundedPreceding, 0
    )
    running = sweep.withColumn("conc", F.sum("delta").over(wrun))
    peak = F.max(F.struct(F.col("conc"), (-F.col("t")).alias("nt")))
    return running.agg(
        peak.getField("conc").cast("long").alias("max_concurrent"),
        (-peak.getField("nt")).alias("first_peak_us"),
        F.sum(F.when(F.col("delta") == 1, 1)).cast("long").alias("n_sessions"),
    )


@register(
    "q174_chi2_independence",
    oracle="""
    WITH obs AS (
        SELECT event_type, dayofweek(CAST(ts AS DATE)) AS dow,
               CAST(count(*) AS DOUBLE) AS o
        FROM events GROUP BY 1, 2
    ),
    rt AS (SELECT event_type, sum(o) AS r FROM obs GROUP BY event_type),
    ct AS (SELECT dow, sum(o) AS c FROM obs GROUP BY dow),
    n AS (SELECT sum(o) AS n FROM obs),
    grid AS (
        SELECT rt.event_type, ct.dow,
               coalesce(obs.o, 0) AS o,
               rt.r * ct.c / n.n AS e
        FROM rt CROSS JOIN ct CROSS JOIN n
        LEFT JOIN obs ON obs.event_type = rt.event_type AND obs.dow = ct.dow
    )
    SELECT round(sum(pow(o - e, 2) / e), 4) AS chi2,
           CAST((SELECT count(*) FROM rt) - 1 AS BIGINT)
             * CAST((SELECT count(*) FROM ct) - 1 AS BIGINT) AS dof,
           round(sqrt(sum(pow(o - e, 2) / e) / ((SELECT max(n) FROM n)
                 * least((SELECT count(*) FROM rt) - 1,
                         (SELECT count(*) FROM ct) - 1))), 4) AS cramers_v
    FROM grid
    """,
)
def q174_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between event_type and
    weekday (+ Cramér's V effect size) — the contingency-table
    screen for "does behavior depend on the day", complementing
    q151's per-cell anomalies with a single whole-table verdict.
    Zero-count cells enter through the full row×column grid, never
    dropped.

    Scale: ONE map-side-combining count produces the |types|×7
    contingency table; margins, expectations, chi2, dof and V are
    all arithmetic on that tiny grid in a single plan (dof comes
    from countDistinct over the grid's own key columns — no eager
    driver-side counts, no extra corpus scans; the same
    one-scan-then-grid shape as q163's Benford test).
    """
    e = load(spark, sf_dir, "events")
    obs = (
        e.groupBy(
            "event_type",
            (F.dayofweek(F.col("ts").cast("date")) - 1).alias("dow"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("o"))
    )
    rt = obs.groupBy("event_type").agg(F.sum("o").alias("r"))
    ct = obs.groupBy("dow").agg(F.sum("o").alias("c"))
    n = obs.agg(F.sum("o").alias("n"))
    grid = (
        rt.crossJoin(F.broadcast(ct))
        .crossJoin(F.broadcast(n))
        .join(obs, ["event_type", "dow"], "left")
        .select(
            "event_type",
            "dow",
            F.coalesce("o", F.lit(0.0)).alias("o"),
            (F.col("r") * F.col("c") / F.col("n")).alias("e"),
            "n",
        )
    )
    chi2 = F.sum(F.pow(F.col("o") - F.col("e"), 2) / F.col("e"))
    nr1 = F.countDistinct("event_type") - 1
    nc1 = F.countDistinct("dow") - 1
    return grid.agg(
        F.round(chi2, 4).alias("chi2"),
        (nr1 * nc1).cast("long").alias("dof"),
        F.round(
            F.sqrt(chi2 / (F.max("n") * F.least(nr1, nc1))), 4
        ).alias("cramers_v"),
    )


@register(
    "q176_acf_autocorrelation",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS DOUBLE) AS x
        FROM events GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type, avg(x) AS mu,
               sum(x * x) - count(*) * avg(x) * avg(x) AS ss
        FROM daily GROUP BY event_type
    ),
    pairs AS (
        SELECT d.event_type, CAST(lags.k AS INT) AS lag_k,
               d.x, dl.x AS xlag
        FROM daily d
        CROSS JOIN (SELECT unnest(range(1, 8)) AS k) lags
        JOIN daily dl ON dl.event_type = d.event_type
                     AND dl.day = d.day - CAST(lags.k AS INT)
    )
    SELECT p.event_type, p.lag_k,
           round(sum((p.x - s.mu) * (p.xlag - s.mu)) / max(s.ss), 4) AS acf
    FROM pairs p JOIN stats s ON p.event_type = s.event_type
    GROUP BY p.event_type, p.lag_k
    ORDER BY p.event_type, p.lag_k
    """,
)
def q176_acf_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the daily event-count series, lags
    1-7 per event_type — the seasonality screen (a weekly cycle shows
    as a lag-7 peak) complementing q151's per-cell weekday anomalies
    and q155's changepoint detection with the standard ACF
    diagnostic. Classical estimator: lag-k covariance over the
    full-series centered sum of squares (denominator from ALL n
    points, numerator over the n-k overlapping pairs); gap days
    simply contribute no pair at that lag.

    Scale: the corpus collapses to |types|x|days| daily counts in one
    map-side-combining agg; everything after (per-series mean/ss, the
    7 lag alignments, the ratio) is arithmetic on that tiny rollup.
    The lag shift is a self-equi-join on (event_type, day-k) rather
    than a window lag (Spark's lag() needs a literal offset), so all
    7 lags come from ONE broadcast of the 7-row lag range against the
    daily table — the heavy scan happens exactly once, and a year of
    days x 1e4 types is still only ~4M rows into the join.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
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
            F.round(
                F.sum((F.col("x") - F.col("mu")) * (F.col("xlag") - F.col("mu")))
                / F.max("ss"),
                4,
            ).alias("acf")
        )
        .orderBy("event_type", "lag_k")
    )


@register(
    "q179_gini_key_skew",
    oracle="""
    WITH per_key AS (
        SELECT l_partkey, CAST(count(*) AS DOUBLE) AS x
        FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
        SELECT x,
               row_number() OVER (ORDER BY x ASC, l_partkey ASC) AS i,
               row_number() OVER (ORDER BY x DESC, l_partkey ASC) AS ri
        FROM per_key
    )
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(x) AS BIGINT) AS n_rows,
           round((2.0 * sum(i * x) - (count(*) + 1) * sum(x))
                 / (count(*) * sum(x)), 6) AS gini,
           round(max(CASE WHEN ri = 1 THEN x END) / sum(x), 6)
               AS top1_share,
           round(sum(CASE WHEN ri <= 10 THEN x ELSE 0 END) / sum(x), 6)
               AS top10_share,
           round(quantile_cont(x, 0.99) / quantile_cont(x, 0.5), 4)
               AS p99_over_p50
    FROM ranked
    """,
)
def q179_gini_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostics for a join/shuffle key — the operator an
    engine runs BEFORE choosing a physical strategy (salt? AQE skew
    split? broadcast?): Gini coefficient of the rows-per-key
    distribution (0 = uniform, →1 = one hot key), top-1/top-10 key
    share, and the p99/median ratio. Gini via the exact sorted-rank
    identity G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx); ranks tie-broken by
    key so both engines sort identically. This mechanizes the skew
    check q105's salted agg does by hand.

    Scale: the corpus collapses to |keys| rows in one map-side-
    combining count; both ranks run as the operators/ranking
    TWO-PASS global rank (bucket-partitioned windows only — at 1e9
    join keys a single-partition row_number would serialize the
    whole rollup through one reducer; the r7-verdict retrofit).
    The diagnostic never touches row payloads — skew profiling at
    100 TB costs one column scan.
    """
    from g_etl_spark.operators.ranking import global_rank_twopass, log2_bucket

    li = load(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_partkey").agg(
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
    ).select("x", "i", "ri")
    n = F.count(F.lit(1))
    tot = F.sum("x")
    return ranked.agg(
        n.cast("long").alias("n_keys"),
        tot.cast("long").alias("n_rows"),
        F.round(
            (2.0 * F.sum(F.col("i") * F.col("x")) - (n + 1) * tot) / (n * tot),
            6,
        ).alias("gini"),
        F.round(F.max(F.when(F.col("ri") == 1, F.col("x"))) / tot, 6).alias(
            "top1_share"
        ),
        F.round(
            F.sum(F.when(F.col("ri") <= 10, F.col("x")).otherwise(0.0)) / tot,
            6,
        ).alias("top10_share"),
        F.round(
            F.expr("percentile(x, 0.99D)") / F.expr("percentile(x, 0.5D)"), 4
        ).alias("p99_over_p50"),
    )


@register(
    "q185_next_event_accuracy",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type,
               lead(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_ts
        FROM events
    ),
    trans AS (
        SELECT event_type AS prev, next_type AS nxt,
               CASE WHEN next_ts < TIMESTAMP '2024-01-20' THEN 1 ELSE 0 END
                   AS is_train
        FROM seq WHERE next_type IS NOT NULL
    ),
    model AS (
        SELECT prev, nxt AS pred FROM (
            SELECT prev, nxt, count(*) AS c,
                   row_number() OVER (
                       PARTITION BY prev ORDER BY count(*) DESC, nxt ASC
                   ) AS rn
            FROM trans WHERE is_train = 1 GROUP BY prev, nxt
        ) WHERE rn = 1
    )
    SELECT t.prev AS prev_type, m.pred AS predicted,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN t.nxt = m.pred THEN 1 ELSE 0 END) AS BIGINT)
               AS n_correct,
           round(avg(CASE WHEN t.nxt = m.pred THEN 1.0 ELSE 0.0 END), 6)
               AS accuracy
    FROM trans t JOIN model m ON t.prev = m.prev
    WHERE t.is_train = 0
    GROUP BY t.prev, m.pred
    ORDER BY prev_type
    """,
)
def q185_next_event_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtested next-event prediction: fit q127's Markov argmax
    model on transitions completing before a time split, then score
    its top-1 accuracy on the held-out tail — the
    train/evaluate-in-one-plan shape for sequence models (the eval
    half q127 lacks). Argmax ties break lexicographically so the
    model is deterministic.

    Scale: ONE user-keyed exchange produces all transitions (a single
    lead() window); the model is a |types|²-row agg reduced to
    |types| by argmax, broadcast back onto the test transitions —
    evaluation never reshuffles the corpus. Temporal split, not
    random: leakage-safe and partition-prunable on a date-partitioned
    event log.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
        F.lead("ts").over(w).alias("next_ts"),
    ).where(F.col("next_type").isNotNull())
    trans = seq.select(
        F.col("event_type").alias("prev"),
        F.col("next_type").alias("nxt"),
        F.when(F.col("next_ts") < F.lit("2024-01-20").cast("timestamp"), 1)
        .otherwise(0)
        .alias("is_train"),
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
    hit = F.when(F.col("nxt") == F.col("pred"), 1).otherwise(0)
    return (
        trans.where(F.col("is_train") == 0)
        .join(F.broadcast(model), "prev")
        .groupBy(F.col("prev").alias("prev_type"), F.col("pred").alias("predicted"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(hit).cast("long").alias("n_correct"),
            F.round(F.avg(hit.cast("double")), 6).alias("accuracy"),
        )
        .orderBy("prev_type")
    )


@register(
    "q189_equidepth_histogram",
    oracle="""
    WITH binned AS (
        SELECT event_type, value,
               ntile(10) OVER (
                   PARTITION BY event_type ORDER BY value, event_id
               ) AS bucket
        FROM events
    )
    SELECT event_type, CAST(bucket AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(min(value), 4) AS lo,
           round(max(value), 4) AS hi,
           round(avg(value), 4) AS mean
    FROM binned
    GROUP BY event_type, bucket
    ORDER BY event_type, bucket
    """,
)
def q189_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH (equal-frequency) histogram per group — decile
    buckets each holding ~n/10 rows with their actual value ranges,
    the histogram an optimizer or drift monitor wants when the
    distribution is skewed and q131's equi-WIDTH bins would dump
    everything into two of them. ntile ties broken by event_id so
    both engines assign identical buckets.

    Scale: one keyed exchange + window sort per group, then a
    combining agg on (group, bucket) — the same single-sort shape as
    q67's deciles. At 100 TB swap ntile for percentile_approx bucket
    BOUNDS (mergeable t-digest, no global sort) and assign buckets
    map-side; this exact variant stays the correctness oracle.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    binned = e.select(
        "event_type", "value", F.ntile(10).over(w).alias("bucket")
    )
    return (
        binned.groupBy("event_type", F.col("bucket").cast("int").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
            F.round(F.avg("value"), 4).alias("mean"),
        )
        .orderBy("event_type", "bucket")
    )


@register(
    "q190_mase_forecast_eval",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, sum(value) AS y
        FROM events GROUP BY 1, 2
    ),
    shifted AS (
        SELECT event_type, day, y,
               lag(y, 7) OVER (PARTITION BY event_type ORDER BY day) AS y7,
               lag(y, 1) OVER (PARTITION BY event_type ORDER BY day) AS y1
        FROM daily
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           round(avg(abs(y - y7)), 4) AS mae_seasonal,
           round(avg(abs(y - y1)), 4) AS mae_naive,
           round(avg(abs(y - y7)) / avg(abs(y - y1)), 4) AS mase
    FROM shifted
    WHERE y7 IS NOT NULL AND y1 IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q190_mase_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE (mean absolute scaled error) of the seasonal-naive
    forecast: how much better is "same as last week" than "same as
    yesterday" per series — the scale-free forecast-accuracy metric
    that complements q04's forecast and q176's ACF (a weekly cycle
    shows as MASE < 1). Both error terms are evaluated on the same
    overlap window (rows where BOTH lags exist) so the ratio is a
    like-for-like backtest.

    Scale: the corpus collapses to the |types|x|days| daily rollup
    in one combining agg; both lags share ONE window sort per series
    and the MAEs fold into the same final aggregate. Evaluation adds
    nothing corpus-sized to the forecast pipeline.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum("value").alias("y"))
    w = Window.partitionBy("event_type").orderBy("day")
    shifted = daily.select(
        "event_type",
        "y",
        F.lag("y", 7).over(w).alias("y7"),
        F.lag("y", 1).over(w).alias("y1"),
    ).where(F.col("y7").isNotNull() & F.col("y1").isNotNull())
    mae7 = F.avg(F.abs(F.col("y") - F.col("y7")))
    mae1 = F.avg(F.abs(F.col("y") - F.col("y1")))
    return (
        shifted.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.round(mae7, 4).alias("mae_seasonal"),
            F.round(mae1, 4).alias("mae_naive"),
            F.round(mae7 / mae1, 4).alias("mase"),
        )
        .orderBy("event_type")
    )


def _digit_bucket(c):
    """Integer-exact log-bucket key (q160's recipe): a non-negative
    BIGINT column -> (decimal length, first digit). Monotone
    non-decreasing in the value, ~9 buckets per decade, and no float
    log anywhere — a bucket boundary can never flip on an ulp."""
    s = c.cast("long").cast("string")
    return F.length(s).alias("sl"), F.substring(s, 1, 1).cast("long").alias("fd")


_RFM_SKETCH_AXIS_SQL = """
        SELECT length(CAST({v} AS VARCHAR)) AS sl,
               CAST(substr(CAST({v} AS VARCHAR), 1, 1) AS BIGINT) AS fd,
               count(*) AS c
        FROM rfm GROUP BY 1, 2
"""


@register(
    "q196_rfm_segments_sketch",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
    bound AS (SELECT max(CAST(ts AS DATE)) AS endd FROM p),
    rfm AS (
        SELECT user_id,
               date_diff('day', CAST(max(ts) AS DATE), (SELECT endd FROM bound)) AS rec,
               count(*) AS freq,
               CAST(floor(round(sum(value), 4) * 1000) AS BIGINT) AS mons
        FROM p GROUP BY user_id
    ),
    n AS (SELECT count(*) AS n FROM rfm),
    rb AS (
        SELECT length(CAST(rec AS VARCHAR)) AS sl,
               CAST(substr(CAST(rec AS VARCHAR), 1, 1) AS BIGINT) AS fd,
               count(*) AS c
        FROM rfm GROUP BY 1, 2
    ),
    fb AS (
        SELECT length(CAST(freq AS VARCHAR)) AS sl,
               CAST(substr(CAST(freq AS VARCHAR), 1, 1) AS BIGINT) AS fd,
               count(*) AS c
        FROM rfm GROUP BY 1, 2
    ),
    mb AS (
        SELECT length(CAST(mons AS VARCHAR)) AS sl,
               CAST(substr(CAST(mons AS VARCHAR), 1, 1) AS BIGINT) AS fd,
               count(*) AS c
        FROM rfm GROUP BY 1, 2
    ),
    rq AS (
        SELECT sl, fd,
               least(4, CAST(floor(4.0 * (sum(c) OVER (ORDER BY sl, fd) - c)
                                   / (SELECT n FROM n)) AS BIGINT) + 1) AS q
        FROM rb
    ),
    fq AS (
        SELECT sl, fd,
               least(4, CAST(floor(4.0 * (sum(c) OVER (ORDER BY sl DESC, fd DESC) - c)
                                   / (SELECT n FROM n)) AS BIGINT) + 1) AS q
        FROM fb
    ),
    mq AS (
        SELECT sl, fd,
               least(4, CAST(floor(4.0 * (sum(c) OVER (ORDER BY sl DESC, fd DESC) - c)
                                   / (SELECT n FROM n)) AS BIGINT) + 1) AS q
        FROM mb
    ),
    seg AS (
        SELECT r.user_id, rq.q AS r_q, fq.q AS f_q, mq.q AS m_q
        FROM rfm r
        JOIN rq ON rq.sl = length(CAST(r.rec AS VARCHAR))
               AND rq.fd = CAST(substr(CAST(r.rec AS VARCHAR), 1, 1) AS BIGINT)
        JOIN fq ON fq.sl = length(CAST(r.freq AS VARCHAR))
               AND fq.fd = CAST(substr(CAST(r.freq AS VARCHAR), 1, 1) AS BIGINT)
        JOIN mq ON mq.sl = length(CAST(r.mons AS VARCHAR))
               AND mq.fd = CAST(substr(CAST(r.mons AS VARCHAR), 1, 1) AS BIGINT)
    )
    SELECT CAST(r_q AS BIGINT) || '-' || CAST(f_q AS BIGINT) || '-' || CAST(m_q AS BIGINT)
               AS segment,
           count(*) AS n_users
    FROM seg
    GROUP BY 1
    ORDER BY segment
    """,
)
def q196_rfm_segments_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation WITHOUT the global ntile — the 100 TB path
    q167's docstring names, promoted to oracle-gated code. Quartiles
    are assigned at LOG-BUCKET granularity: each axis (recency asc,
    frequency desc, monetary desc) histograms into q160's
    integer-exact (digit-length, first-digit) buckets, the bucket
    histogram's cumulative walk yields quartile labels
    q = floor(4·cum_before/n)+1, and users map to quartiles through a
    broadcast bucket→quartile join. All users sharing a bucket share
    a quartile (the sketch's granularity); boundaries never depend on
    row order, so the result is engine-stable by construction.

    Scale: ONE purchase-keyed user aggregate touches the corpus; the
    three histograms and their triangular cumulative joins run on
    ~O(70) bucket rows each (map-side broadcast), and the quartile
    assignment is three broadcast joins — no global sort, no
    single-partition WindowExec anywhere (plan-asserted), versus
    q167's three global ntile windows over |purchasers|.
    """
    e = load(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase")
    bound = p.agg(F.max(F.col("ts").cast("date")).alias("endd"))
    rfm = (
        p.groupBy("user_id")
        .agg(
            F.max(F.col("ts").cast("date")).alias("lastd"),
            F.count(F.lit(1)).alias("freq"),
            F.floor(F.round(F.sum("value"), 4) * 1000).cast("long").alias("mons"),
        )
        .crossJoin(F.broadcast(bound))
        .select(
            "user_id",
            F.datediff("endd", "lastd").alias("rec"),
            "freq",
            "mons",
        )
        .persist()
    )
    n = rfm.groupBy().agg(F.count(F.lit(1)).alias("n"))

    def quartile_map(axis: str, desc: bool) -> DataFrame:
        sl, fd = _digit_bucket(F.col(axis))
        h = rfm.groupBy(sl, fd).agg(F.count(F.lit(1)).alias("c"))
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
            "sl",
            "fd",
            F.least(
                F.lit(4),
                F.floor(4.0 * F.col("cb") / F.col("n")).cast("long") + 1,
            ).alias("q"),
        )

    out = rfm
    for axis, desc, qname in (("rec", False, "r_q"), ("freq", True, "f_q"), ("mons", True, "m_q")):
        sl, fd = _digit_bucket(F.col(axis))
        qm = quartile_map(axis, desc)
        out = (
            out.withColumns({"_sl": sl, "_fd": fd})
            .join(
                F.broadcast(qm.withColumnsRenamed({"sl": "_sl", "fd": "_fd", "q": qname})),
                ["_sl", "_fd"],
            )
            .drop("_sl", "_fd")
        )
    seg = F.concat_ws(
        "-",
        F.col("r_q").cast("string"),
        F.col("f_q").cast("string"),
        F.col("m_q").cast("string"),
    )
    return (
        out.groupBy(seg.alias("segment"))
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("segment")
    )


@register(
    "q198_max_concurrency_twopass",
    oracle="""
    WITH iv AS (
        SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 1800000000 AS e
        FROM events
    ),
    flag AS (
        SELECT user_id, s, e,
               CASE WHEN s > max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS new_island
        FROM iv
    ),
    isl AS (
        SELECT user_id, s, e,
               sum(new_island) OVER (PARTITION BY user_id ORDER BY s, e
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS island
        FROM flag
    ),
    sessions AS (
        SELECT user_id, island, min(s) AS s, max(e) AS e
        FROM isl GROUP BY user_id, island
    ),
    sweep AS (
        SELECT s AS t, 1 AS delta FROM sessions
        UNION ALL
        SELECT e AS t, -1 AS delta FROM sessions
    ),
    running AS (
        SELECT t, delta,
               sum(delta) OVER (ORDER BY t, delta
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS conc
        FROM sweep
    )
    SELECT CAST(max(conc) AS BIGINT) AS max_concurrent,
           min(CASE WHEN conc = (SELECT max(conc) FROM running) THEN t END) AS first_peak_us,
           (SELECT CAST(count(*) AS BIGINT) FROM sessions) AS n_sessions
    FROM running
    """,
)
def q198_max_concurrency_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency via the RANGE-PARTITIONED two-pass cumulative
    sum — the 100 TB path q173's docstring names, promoted to
    oracle-gated code (the oracle is q173's exact global sweep; the
    two-pass plan must reproduce it bit-for-bit). Boundaries bucket
    by calendar day of their timestamp; pass 1 sums each bucket's
    deltas and a triangular broadcast join turns those ~|days| sums
    into per-bucket prefix OFFSETS; pass 2 runs the cumulative sum
    WITHIN each bucket (a day-partitioned window, never a global
    one — plan-asserted) and adds the offset. The bucket key
    floor(t/86400e6) is non-decreasing in (t, delta)-order, so
    offset + local cumsum ≡ the global running sum at every row.

    Scale: sessionization is the one user-keyed exchange; the sweep
    relation is 2·|sessions| rows spread over |days| partitions that
    each cumsum independently — no single-partition WindowExec, the
    defect this variant retires.
    """
    e = load(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.lit(1_800_000_000)).alias("e"),
    )
    order = Window.partitionBy("user_id").orderBy("s", "e")
    prev = order.rowsBetween(Window.unboundedPreceding, -1)
    run = order.rowsBetween(Window.unboundedPreceding, 0)
    isl = iv.withColumn(
        "new_island",
        F.when(F.col("s") > F.max("e").over(prev), 1).otherwise(0),
    ).withColumn("island", F.sum("new_island").over(run))
    sessions = isl.groupBy("user_id", "island").agg(
        F.min("s").alias("s"), F.max("e").alias("e")
    )
    sweep = sessions.select(
        F.explode(
            F.array(
                F.struct(F.col("s").alias("t"), F.lit(1).alias("delta")),
                F.struct(F.col("e").alias("t"), F.lit(-1).alias("delta")),
            )
        ).alias("b")
    ).select(
        "b.t", "b.delta", F.floor(F.col("b.t") / F.lit(86_400_000_000)).alias("p")
    )
    # pass 1: per-bucket delta sums -> prefix offsets (|days| rows,
    # triangular broadcast join — window-free)
    ps = sweep.groupBy("p").agg(F.sum("delta").alias("sd"))
    x, y = ps.alias("x"), ps.alias("y")
    offsets = (
        x.join(F.broadcast(y), F.col("y.p") < F.col("x.p"), "left")
        .groupBy(F.col("x.p").alias("p"))
        .agg(F.coalesce(F.sum("y.sd"), F.lit(0)).alias("off"))
    )
    # pass 2: day-partitioned local cumsum + broadcast offset
    wloc = (
        Window.partitionBy("p")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    running = sweep.join(F.broadcast(offsets), "p").withColumn(
        "conc", F.sum("delta").over(wloc) + F.col("off")
    )
    peak = F.max(F.struct(F.col("conc"), (-F.col("t")).alias("nt")))
    return running.agg(
        peak.getField("conc").cast("long").alias("max_concurrent"),
        (-peak.getField("nt")).alias("first_peak_us"),
        F.sum(F.when(F.col("delta") == 1, 1)).cast("long").alias("n_sessions"),
    )


@register(
    "q201_mutual_information",
    oracle="""
    WITH obs AS (
        SELECT event_type, dayofweek(CAST(ts AS DATE)) AS dow,
               CAST(count(*) AS DOUBLE) AS o
        FROM events GROUP BY 1, 2
    ),
    n AS (SELECT sum(o) AS n FROM obs),
    px AS (SELECT event_type, sum(o) / (SELECT n FROM n) AS p FROM obs GROUP BY 1),
    py AS (SELECT dow, sum(o) / (SELECT n FROM n) AS p FROM obs GROUP BY 1),
    mi AS (
        SELECT sum((o.o / n.n) * log2((o.o / n.n) / (px.p * py.p))) AS mi
        FROM obs o
        JOIN px USING (event_type) JOIN py USING (dow)
        CROSS JOIN n
    ),
    hx AS (SELECT -sum(p * log2(p)) AS h FROM px),
    hy AS (SELECT -sum(p * log2(p)) AS h FROM py)
    SELECT CAST((SELECT n FROM n) AS BIGINT) AS n_events,
           round((SELECT h FROM hx), 6) AS h_type,
           round((SELECT h FROM hy), 6) AS h_dow,
           round((SELECT mi FROM mi), 6) AS mi_bits,
           round((SELECT mi FROM mi)
                 / sqrt((SELECT h FROM hx) * (SELECT h FROM hy)), 6) AS nmi
    """,
)
def q201_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event_type and weekday (in bits),
    plus marginal entropies and the sqrt-normalized NMI — the
    information-theoretic companion to q174's chi-square: chi2 says
    WHETHER behavior depends on the day, MI says HOW MANY BITS of
    type are explained by it (the feature-screening number a
    mixture/curriculum builder ranks columns by, q193's WOE/IV for
    the multi-class case).

    Scale: ONE combining corpus agg to the |types|×7 grid; marginals,
    entropies and the MI sum are arithmetic on that bounded relation
    (broadcast joins), nothing corpus-sized moves again.
    """
    e = load(spark, sf_dir, "events")
    obs = e.groupBy(
        "event_type",
        (F.dayofweek(F.col("ts").cast("date")) - 1).alias("dow"),
    ).agg(F.count(F.lit(1)).cast("double").alias("o"))
    n = obs.agg(F.sum("o").alias("n"))
    px = (
        obs.groupBy("event_type")
        .agg(F.sum("o").alias("sx"))
        .crossJoin(F.broadcast(n))
        .select("event_type", (F.col("sx") / F.col("n")).alias("p_x"))
    )
    py = (
        obs.groupBy("dow")
        .agg(F.sum("o").alias("sy"))
        .crossJoin(F.broadcast(n))
        .select("dow", (F.col("sy") / F.col("n")).alias("p_y"))
    )
    log2 = lambda c: F.log(c) / F.log(F.lit(2.0))  # noqa: E731
    joint = (
        obs.join(F.broadcast(px), "event_type")
        .join(F.broadcast(py), "dow")
        .crossJoin(F.broadcast(n))
        .select(
            (F.col("o") / F.col("n")).alias("p_xy"),
            "p_x",
            "p_y",
            "n",
        )
    )
    mi = joint.agg(
        F.max("n").alias("n"),
        F.sum(F.col("p_xy") * log2(F.col("p_xy") / (F.col("p_x") * F.col("p_y")))).alias(
            "mi"
        ),
    )
    hx = px.agg((-F.sum(F.col("p_x") * log2(F.col("p_x")))).alias("h_type"))
    hy = py.agg((-F.sum(F.col("p_y") * log2(F.col("p_y")))).alias("h_dow"))
    return (
        mi.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .select(
            F.col("n").cast("long").alias("n_events"),
            F.round("h_type", 6).alias("h_type"),
            F.round("h_dow", 6).alias("h_dow"),
            F.round("mi", 6).alias("mi_bits"),
            F.round(F.col("mi") / F.sqrt(F.col("h_type") * F.col("h_dow")), 6).alias(
                "nmi"
            ),
        )
    )


@register(
    "q206_holt_linear_forecast",
    oracle="""
    WITH RECURSIVE daily AS (
        SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS d,
               sum(o_totalprice) AS y
        FROM orders GROUP BY 1, 2
    ),
    idx AS (
        SELECT priority, y,
               row_number() OVER (PARTITION BY priority ORDER BY d) AS i,
               count(*) OVER (PARTITION BY priority) AS n
        FROM daily
    ),
    hw AS (
        SELECT priority, i, n, y AS l, CAST(0 AS DOUBLE) AS b,
               CAST(0 AS DOUBLE) AS sse
        FROM idx WHERE i = 1
        UNION ALL
        SELECT x.priority, x.i, x.n,
               0.5 * x.y + 0.5 * (h.l + h.b),
               0.3 * ((0.5 * x.y + 0.5 * (h.l + h.b)) - h.l) + 0.7 * h.b,
               h.sse + (x.y - (h.l + h.b)) * (x.y - (h.l + h.b))
        FROM hw h JOIN idx x ON x.priority = h.priority AND x.i = h.i + 1
    )
    SELECT priority, CAST(n AS BIGINT) AS n_days,
           round(l, 4) AS level, round(b, 4) AS trend,
           round(l + 7 * b, 4) AS forecast_7d,
           round(sse / (n - 1), 4) AS mse
    FROM hw WHERE i = n
    ORDER BY priority
    """,
)
def q206_holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (level + trend, alpha=0.5,
    beta=0.3) of daily revenue per order priority, with the 7-day-
    ahead forecast and one-step-ahead MSE — the trend-aware upgrade
    of q125's EWMA (level only) and the forecasting sibling of
    q190's MASE backtest. Init l1=y1, b1=0; the recurrence is
    inherently sequential, which is exactly why the implementation
    shape matters.

    Scale: the corpus collapses to the |priorities| x |days| daily
    rollup in ONE combining agg; the sequential recurrence then runs
    per group over a sort_array'd collected series inside a single
    JVM higher-order F.aggregate — no UDF, no per-row Python, no
    window over the corpus. The series array is |days| elements
    (~2.4k here, bounded by calendar length not corpus size), the
    same collapsed-relation contract as q176/q190. The oracle runs
    the identical recurrence as a recursive CTE; both engines
    evaluate the same IEEE expression tree in the same order, so
    round(.,4) compares exactly.
    """
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").cast("date").alias("d"),
    ).agg(F.sum("o_totalprice").alias("y"))
    series = daily.groupBy("priority").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("d", "y"))), lambda s: s["y"]
        ).alias("ys")
    )
    acc0 = F.struct(
        F.element_at("ys", 1).alias("l"),
        F.lit(0.0).alias("b"),
        F.lit(0.0).alias("sse"),
    )

    def step(acc, y):
        l_new = 0.5 * y + 0.5 * (acc["l"] + acc["b"])
        return F.struct(
            l_new.alias("l"),
            (0.3 * (l_new - acc["l"]) + 0.7 * acc["b"]).alias("b"),
            (acc["sse"] + (y - (acc["l"] + acc["b"])) * (y - (acc["l"] + acc["b"]))).alias(
                "sse"
            ),
        )

    fit = series.select(
        "priority",
        F.size("ys").alias("n_days"),
        F.aggregate(F.slice("ys", 2, F.size("ys") - 1), acc0, step).alias("h"),
    )
    return fit.select(
        "priority",
        F.col("n_days").cast("long").alias("n_days"),
        F.round(F.col("h.l"), 4).alias("level"),
        F.round(F.col("h.b"), 4).alias("trend"),
        F.round(F.col("h.l") + 7 * F.col("h.b"), 4).alias("forecast_7d"),
        F.round(F.col("h.sse") / (F.col("n_days") - 1), 4).alias("mse"),
    ).orderBy("priority")


@register(
    "q213_session_window_rollup",
    oracle="""
    WITH gaps AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM gaps
    ),
    per AS (
        SELECT user_id, sid,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS dur_s
        FROM sess GROUP BY 1, 2
    )
    SELECT CAST(floor(dur_s / 600.0) AS BIGINT) AS dur_bucket,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           round(avg(CAST(n_events AS DOUBLE)), 4) AS avg_events
    FROM per
    GROUP BY 1
    ORDER BY 1
    """,
)
def q213_session_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session statistics via Spark's NATIVE session_window operator
    (dynamic-gap session windows, 30-min gap): per-session event
    count and duration, rolled up into 10-minute duration buckets —
    the built-in the hand-rolled gaps-and-islands q28 predates, and
    the exact operator a streaming sessionization (q139) runs under
    watermarks. Boundary semantics pinned: session_window merges an
    event iff it lands strictly inside [start, last+gap), so a gap
    of EXACTLY 30 minutes starts a new session — the oracle's
    `>= INTERVAL 30 MINUTE` break mirrors that (q28's batch rule is
    the strict `>`, one more reason the two queries coexist).

    Scale: session_window is a single user-keyed Exchange + sort
    (SessionWindowStateStore in streaming; MergingSessionsExec in
    batch) — the same one-shuffle contract as q28, but executed by
    the engine's dedicated operator instead of two window passes;
    the duration histogram is a second agg on the collapsed
    |sessions| relation.
    """
    e = load(spark, sf_dir, "events")
    per = e.groupBy(
        "user_id", F.session_window("ts", "30 minutes").alias("sw")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias("dur_s"),
    )
    return (
        per.groupBy(F.floor(F.col("dur_s") / 600.0).alias("dur_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.round(F.avg(F.col("n_events").cast("double")), 4).alias("avg_events"),
        )
        .orderBy("dur_bucket")
    )


@register(
    "q215_markov_steady_state",
    oracle="""
    WITH gaps AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts, event_id, event_type,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM gaps
    ),
    pairs AS (
        SELECT event_type AS src,
               lead(event_type) OVER (PARTITION BY user_id, sid
                                      ORDER BY ts, event_id) AS dst
        FROM sess
    ),
    t AS MATERIALIZED (
        SELECT src, dst, CAST(count(*) AS DOUBLE) AS c
        FROM pairs WHERE dst IS NOT NULL GROUP BY 1, 2
    ),
    p AS MATERIALIZED (
        SELECT src, dst, c / sum(c) OVER (PARTITION BY src) AS p FROM t
    ),
    states AS MATERIALIZED (SELECT DISTINCT src AS s FROM t),
    pi0 AS MATERIALIZED (
        SELECT s, 1.0 / (SELECT count(*) FROM states) AS v FROM states
    ),
    """
    + ",\n    ".join(
        f"pi{i} AS MATERIALIZED (SELECT p.dst AS s, sum(pi{i - 1}.v * p.p) AS v "
        f"FROM pi{i - 1} JOIN p ON p.src = pi{i - 1}.s GROUP BY p.dst)"
        for i in range(1, 21)
    )
    + """
    SELECT s AS event_type, round(v, 6) AS steady_prob
    FROM pi20 ORDER BY s
    """,
)
def q215_markov_steady_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the within-session event-type
    Markov chain (q127's transition matrix, iterated): 20 power
    iterations pi <- pi.P from the uniform start — the long-run
    occupancy a journey model predicts, and the convergence target
    q185's one-step backtest scores against.

    Scale: the ONLY corpus-sized work is q127's transition-count agg
    (one user-keyed exchange, |types|^2-bounded output). The chain
    itself is a |types|x|types| matrix — bounded state, so the 20
    matvecs run on the driver over the collected <=49-cell matrix
    (the q158 bounded-collect precedent: parameter-server shape,
    collect is |types|^2 not corpus) and the result re-enters Spark
    as a createDataFrame. The oracle unrolls the same 20 iterations
    as MATERIALIZED chained CTEs. Probabilities round at 6 (both
    engines run the same recurrence; summation-order ulps ~1e-15).
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = e.withColumn(
        "brk",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
                > 1800
            ),
            1,
        ).otherwise(0),
    ).withColumn("sid", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    pairs = sess.select(
        F.col("event_type").alias("src"),
        F.lead("event_type")
        .over(Window.partitionBy("user_id", "sid").orderBy("ts", "event_id"))
        .alias("dst"),
    ).where(F.col("dst").isNotNull())
    t = (
        pairs.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .collect()
    )  # bounded: |types|^2 cells
    rows_out = _markov_power_iterate(t, rounds=20)
    return spark.createDataFrame(
        rows_out, "event_type string, steady_prob double"
    ).orderBy("event_type")


def _markov_power_iterate(cells, rounds: int):
    """Driver-side matvec loop over the bounded transition matrix,
    mirroring the oracle's chained CTEs exactly (same float ops)."""
    from collections import defaultdict

    row_tot: dict[str, float] = defaultdict(float)
    for r in cells:
        row_tot[r["src"]] += r["c"]
    p = [(r["src"], r["dst"], r["c"] / row_tot[r["src"]]) for r in cells]
    states = sorted(row_tot)
    pi = {s: 1.0 / len(states) for s in states}
    for _ in range(rounds):
        nxt: dict[str, float] = defaultdict(float)
        for src, dst, prob in p:
            if src in pi:
                nxt[dst] += pi[src] * prob
        pi = dict(nxt)
    return [(s, round(v, 6)) for s, v in sorted(pi.items())]


@register(
    "q217_watermark_lateness_audit",
    oracle="""
    WITH arr AS (
        SELECT event_type, event_id, ts,
               max(ts) OVER (PARTITION BY event_type ORDER BY event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS hwm
        FROM events
    ),
    lat AS (
        SELECT event_type,
               CASE WHEN hwm IS NULL THEN 0
                    ELSE greatest(CAST(date_diff('second', ts, hwm) AS BIGINT), 0)
               END AS late_s
        FROM arr
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN late_s > 600 THEN 1 ELSE 0 END) AS BIGINT)
               AS late_10m,
           CAST(sum(CASE WHEN late_s > 3600 THEN 1 ELSE 0 END) AS BIGINT)
               AS late_60m,
           CAST(max(late_s) AS BIGINT) AS max_late_s,
           round(sum(CASE WHEN late_s > 600 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS frac_late_10m
    FROM lat
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q217_watermark_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-sizing audit: replaying events in arrival order
    (event_id as the arrival proxy), how late is each event behind
    the running event-time high-water mark, and what fraction would
    a 10-minute / 60-minute watermark drop? This is the batch
    dry-run a team does BEFORE picking the withWatermark bound for
    the streaming pipelines (q91-q93, q139, q171) — drop rates at
    candidate bounds, per event type.

    Scale: one type-keyed window in arrival order computes the
    running max (the high-water mark is exactly what the streaming
    engine tracks per partition); the lateness histogram collapses
    in the same exchange's aggregation. |types| partitions bound the
    sort; at 100 TB arrival order is the ingest file order, so the
    window runs per ingest shard — the same per-partition monotonic
    scan the real watermark operator does.
    """
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    arr = e.withColumn("hwm", F.max("ts").over(w))
    late = arr.select(
        "event_type",
        F.when(F.col("hwm").isNull(), F.lit(0))
        .otherwise(
            F.greatest(
                F.unix_timestamp("hwm") - F.unix_timestamp("ts"), F.lit(0)
            )
        )
        .alias("late_s"),
    )
    return (
        late.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("late_s") > 600, 1).otherwise(0)).alias("late_10m"),
            F.sum(F.when(F.col("late_s") > 3600, 1).otherwise(0)).alias("late_60m"),
            F.max("late_s").alias("max_late_s"),
        )
        .select(
            "event_type",
            "n_events",
            "late_10m",
            "late_60m",
            "max_late_s",
            F.round(F.col("late_10m") / F.col("n_events").cast("double"), 6).alias(
                "frac_late_10m"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "q216_huber_irls_step",
    oracle="""
    WITH daily AS (
        SELECT o_orderpriority AS priority,
               CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS y
        FROM orders GROUP BY 1, 2
    ),
    xy AS (
        SELECT priority,
               CAST(date_diff('day', min(d) OVER (PARTITION BY priority), d)
                    AS DOUBLE) AS x,
               y
        FROM daily
    ),
    ols AS MATERIALIZED (
        SELECT priority, count(*) AS n,
               (sum(x * y) - sum(x) * sum(y) / count(*))
               / (sum(x * x) - sum(x) * sum(x) / count(*)) AS b0,
               sum(y) / count(*)
               - (sum(x * y) - sum(x) * sum(y) / count(*))
                 / (sum(x * x) - sum(x) * sum(x) / count(*))
                 * (sum(x) / count(*)) AS a0
        FROM xy GROUP BY priority
    ),
    res AS MATERIALIZED (
        SELECT xy.priority, xy.x, xy.y, ols.n, ols.a0, ols.b0,
               abs(xy.y - (ols.a0 + ols.b0 * xy.x)) AS ar
        FROM xy JOIN ols USING (priority)
    ),
    sc AS MATERIALIZED (
        SELECT priority, 1.345 * (sum(ar) / count(*)) AS delta FROM res GROUP BY 1
    ),
    wtd AS (
        SELECT r.priority, r.x, r.y, r.n, r.a0, r.b0,
               CASE WHEN r.ar <= sc.delta OR r.ar = 0 THEN 1.0
                    ELSE sc.delta / r.ar END AS w
        FROM res r JOIN sc USING (priority)
    )
    SELECT priority, CAST(max(n) AS BIGINT) AS n_days,
           round(max(a0), 2) AS a_ols, round(max(b0), 6) AS b_ols,
           round((sum(w * y)
                  - ((sum(w * x * y) - (sum(w * x) * sum(w * y)) / sum(w))
                     / (sum(w * x * x) - (sum(w * x) * sum(w * x)) / sum(w)))
                    * sum(w * x))
                 / sum(w), 2) AS a_huber,
           round((sum(w * x * y) - (sum(w * x) * sum(w * y)) / sum(w))
                 / (sum(w * x * x) - (sum(w * x) * sum(w * x)) / sum(w)), 6)
               AS b_huber,
           round(sum(CASE WHEN w < 1 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 4) AS frac_downweighted
    FROM wtd
    GROUP BY priority
    ORDER BY priority
    """,
)
def q216_huber_irls_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (Huber) trend fit of daily revenue per priority: OLS
    closed-form fit, mean-absolute-residual scale, Huber weights
    w = min(1, 1.345*scale/|r|), then ONE weighted-least-squares
    refit — the first IRLS iteration, which is where nearly all of
    the robustness arrives (q166's Theil–Sen is the rank-based
    sibling; this is the weighting-based one that generalizes to
    multiple regressors). Reports both fits and the downweighted
    fraction.

    Everything is closed-form moment arithmetic: both fits derive
    from Σw, Σwx, Σwy, Σwxy, Σwx² — summable, mergeable,
    map-side-combinable. Note a_huber's weighted intercept
    (Σwy − b·Σwx)/Σw is expanded in the same literal form in both
    engines so the IEEE expression trees match; coefficients round
    at 6 (slopes, magnitude ≲1e1) / 2 (intercepts, magnitude ~1e6 —
    summation ulps ~1e-4, three orders under the rounding grain).

    Scale: the corpus collapses to the |priorities|x|days| daily
    rollup in one agg; the three subsequent passes (OLS moments,
    scale, weighted moments) all run on that calendar-bounded
    relation. No windows except the per-priority min(d), which
    shares the rollup's partition key.
    """
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").cast("date").alias("d"),
    ).agg(F.sum("o_totalprice").alias("y"))
    wmin = Window.partitionBy("priority")
    xy = daily.select(
        "priority",
        F.datediff("d", F.min("d").over(wmin)).cast("double").alias("x"),
        "y",
    )
    ols = xy.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    b0 = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    )
    ols = ols.select(
        "priority",
        "n",
        b0.alias("b0"),
        (F.col("sy") / F.col("n") - b0 * (F.col("sx") / F.col("n"))).alias("a0"),
    )
    res = xy.join(F.broadcast(ols), "priority").withColumn(
        "ar", F.abs(F.col("y") - (F.col("a0") + F.col("b0") * F.col("x")))
    )
    sc = res.groupBy("priority").agg(
        (1.345 * (F.sum("ar") / F.count(F.lit(1)))).alias("delta")
    )
    wtd = res.join(F.broadcast(sc), "priority").withColumn(
        "w",
        F.when((F.col("ar") <= F.col("delta")) | (F.col("ar") == 0), 1.0).otherwise(
            F.col("delta") / F.col("ar")
        ),
    )
    agg = wtd.groupBy("priority").agg(
        F.max("n").alias("n_days"),
        F.max("a0").alias("a0"),
        F.max("b0").alias("b0"),
        F.sum("w").alias("sw"),
        F.sum(F.col("w") * F.col("x")).alias("swx"),
        F.sum(F.col("w") * F.col("y")).alias("swy"),
        F.sum(F.col("w") * F.col("x") * F.col("y")).alias("swxy"),
        F.sum(F.col("w") * F.col("x") * F.col("x")).alias("swxx"),
        F.sum(F.when(F.col("w") < 1, 1).otherwise(0)).alias("ndown"),
        F.count(F.lit(1)).alias("nrows"),
    )
    b1 = (F.col("swxy") - (F.col("swx") * F.col("swy")) / F.col("sw")) / (
        F.col("swxx") - (F.col("swx") * F.col("swx")) / F.col("sw")
    )
    a1 = (F.col("swy") - b1 * F.col("swx")) / F.col("sw")
    return agg.select(
        "priority",
        F.col("n_days").cast("long").alias("n_days"),
        F.round("a0", 2).alias("a_ols"),
        F.round("b0", 6).alias("b_ols"),
        F.round(a1, 2).alias("a_huber"),
        F.round(b1, 6).alias("b_huber"),
        F.round(F.col("ndown") / F.col("nrows").cast("double"), 4).alias(
            "frac_downweighted"
        ),
    ).orderBy("priority")


@register(
    "q226_pinball_quantile_eval",
    oracle="""
    WITH daily AS (
        SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS d,
               CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT) AS yc
        FROM orders GROUP BY 1, 2
    ),
    tagged AS (
        SELECT priority, d, yc,
               CAST(d - DATE '1970-01-01' AS BIGINT) % 2 = 0 AS is_train
        FROM daily
    ),
    tr AS MATERIALIZED (SELECT * FROM tagged WHERE is_train),
    n_tr AS (SELECT priority, CAST(count(*) AS BIGINT) AS n FROM tr GROUP BY 1),
    ranked AS (
        SELECT priority, yc,
               row_number() OVER (PARTITION BY priority ORDER BY yc, d) AS rk
        FROM tr
    ),
    q90 AS MATERIALIZED (
        SELECT r.priority, n_tr.n AS n_train, r.yc AS qc
        FROM ranked r JOIN n_tr USING (priority)
        WHERE r.rk = CAST(ceil(0.9 * n_tr.n) AS BIGINT)
    ),
    te AS (
        SELECT t.priority, t.yc, q.qc, q.n_train
        FROM tagged t JOIN q90 q USING (priority)
        WHERE NOT t.is_train
    )
    SELECT priority, max(n_train) AS n_train,
           CAST(count(*) AS BIGINT) AS n_test,
           round(max(qc) / 100.0, 2) AS q90_revenue,
           round(sum(CASE WHEN yc > qc THEN 0.9 * (yc - qc)
                          ELSE 0.1 * (qc - yc) END) / (100.0 * count(*)), 4)
               AS pinball_loss,
           round(sum(CASE WHEN yc <= qc THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 4) AS coverage
    FROM te
    GROUP BY priority
    ORDER BY priority
    """,
)
def q226_pinball_quantile_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-forecast evaluation: fit the q90 of daily revenue per
    priority on the training half (even epoch-days), score the
    held-out half with the tau=0.9 pinball loss and empirical
    coverage — the quantile sibling of q190's MASE point-forecast
    backtest, and the metric that certifies a P90 capacity forecast.
    Revenue quantizes to integer cents BEFORE ranking and loss (the
    q211 contract), so the rank statistic, the loss numerator, and
    the coverage count are all integer-exact cross-engine; division
    happens once at the end.

    Scale: corpus collapses to the calendar-bounded daily rollup in
    one agg; the per-priority rank is a window over |train days|
    rows; the loss is one more agg over |test days|. At 100 TB the
    q160 log-histogram replaces the exact rank (q196/q197/q211's
    documented path).
    """
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").cast("date").alias("d"),
    ).agg(F.floor(F.sum("o_totalprice") * 100 + 0.5).cast("long").alias("yc"))
    tagged = daily.withColumn(
        "is_train", (F.datediff("d", F.lit("1970-01-01").cast("date")) % 2 == 0)
    )
    tr = tagged.where("is_train")
    n_tr = tr.groupBy("priority").agg(F.count(F.lit(1)).alias("n"))
    wq = Window.partitionBy("priority").orderBy("yc", "d")
    ranked = tr.withColumn("rk", F.row_number().over(wq))
    q90 = (
        ranked.join(F.broadcast(n_tr), "priority")
        .where(F.col("rk") == F.ceil(0.9 * F.col("n")).cast("long"))
        .select("priority", F.col("n").alias("n_train"), F.col("yc").alias("qc"))
    )
    te = tagged.where(~F.col("is_train")).join(F.broadcast(q90), "priority")
    return (
        te.groupBy("priority")
        .agg(
            F.max("n_train").alias("n_train"),
            F.count(F.lit(1)).alias("n_test"),
            F.round(F.max("qc") / 100.0, 2).alias("q90_revenue"),
            F.round(
                F.sum(
                    F.when(
                        F.col("yc") > F.col("qc"), 0.9 * (F.col("yc") - F.col("qc"))
                    ).otherwise(0.1 * (F.col("qc") - F.col("yc")))
                )
                / (100.0 * F.count(F.lit(1))),
                4,
            ).alias("pinball_loss"),
            F.round(
                F.sum(F.when(F.col("yc") <= F.col("qc"), 1).otherwise(0))
                / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("coverage"),
        )
        .orderBy("priority")
    )


@register(
    "q230_session_covisitation",
    oracle="""
    WITH gaps AS (
        SELECT user_id, ts, event_id,
               CAST(json_extract(props, '$.k') AS BIGINT) AS item,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, item,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM gaps
    ),
    si AS MATERIALIZED (
        SELECT DISTINCT user_id, sid, item FROM sess
    ),
    n_sess AS (SELECT CAST(count(DISTINCT (user_id, sid)) AS BIGINT) AS s FROM si),
    singles AS MATERIALIZED (
        SELECT item, CAST(count(*) AS BIGINT) AS c FROM si GROUP BY item
    ),
    pairs AS (
        SELECT a.item AS ia, b.item AS ib, CAST(count(*) AS BIGINT) AS n_co
        FROM si a JOIN si b
          ON a.user_id = b.user_id AND a.sid = b.sid AND a.item < b.item
        GROUP BY 1, 2
    )
    SELECT p.ia, p.ib, p.n_co,
           ca.c AS n_a, cb.c AS n_b,
           round(p.n_co * (SELECT s FROM n_sess)
                 / CAST(ca.c * cb.c AS DOUBLE), 4) AS lift
    FROM pairs p
    JOIN singles ca ON ca.item = p.ia
    JOIN singles cb ON cb.item = p.ib
    ORDER BY p.n_co DESC, p.ia, p.ib
    LIMIT 20
    """,
)
def q230_session_covisitation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session co-visitation ("viewed together in one sitting"): item
    pairs (props.k) sharing a 30-minute session, with session-lift
    n_co*S/(n_a*n_b) — the TEMPORAL co-occurrence signal, distinct
    from q218/q175's basket co-purchase (same order) and q133's PMI
    (same document): covisitation is what powers "people also
    viewed" and is the input q141's association rules mine.

    Scale: sessionization is the one user-keyed window (q28's
    exchange); per-session distinct items bound the pair join by
    Sigma |session items|^2 — session length is capped by human
    behavior (q101's per-order bound, with time doing the capping);
    singles and the session count are small rollups broadcast back.
    Lift divides exact integers; ordering is by integer n_co with
    (ia, ib) tie-break — no float in the rank.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "user_id",
        "ts",
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("item"),
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)) > 1800),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    sess = gaps.withColumn(
        "sid", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    si = sess.select("user_id", "sid", "item").distinct().persist()
    n_sess = si.select("user_id", "sid").distinct().agg(F.count(F.lit(1)).alias("s"))
    singles = si.groupBy("item").agg(F.count(F.lit(1)).alias("c"))
    a, b = si.alias("a"), si.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.sid") == F.col("b.sid"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("ia"), F.col("b.item").alias("ib"))
        .agg(F.count(F.lit(1)).alias("n_co"))
    )
    ca = singles.select(F.col("item").alias("ia"), F.col("c").alias("n_a"))
    cb = singles.select(F.col("item").alias("ib"), F.col("c").alias("n_b"))
    out = (
        # unhinted: per-item session counts are catalog-grain (items
        # grow with the catalog, not provably bounded) — AQE decides
        pairs.join(ca, "ia")
        .join(cb, "ib")
        .crossJoin(F.broadcast(n_sess))
        .select(
            "ia",
            "ib",
            "n_co",
            "n_a",
            "n_b",
            F.round(
                F.col("n_co") * F.col("s") / (F.col("n_a") * F.col("n_b")).cast("double"),
                4,
            ).alias("lift"),
        )
        .orderBy(F.desc("n_co"), "ia", "ib")
        .limit(20)
        .localCheckpoint(eager=True)
    )
    si.unpersist()
    return out


_HW_A, _HW_B, _HW_G = 0.3, 0.1, 0.2  # level / trend / seasonal gains

_HW_S_UPD = ",\n               ".join(
    f"CASE WHEN (h.i % 7) = {k} THEN {_HW_G} * (x.y - ({_HW_A} * (x.y - h.s{k})"
    f" + {1 - _HW_A} * (h.l + h.b))) + {1 - _HW_G} * h.s{k} ELSE h.s{k} END"
    for k in range(7)
)
_HW_SJ = "CASE " + " ".join(
    f"WHEN (h.i % 7) = {k} THEN h.s{k}" for k in range(7)
) + " END"


@register(
    "q237_holt_winters_seasonal",
    oracle=f"""
    WITH RECURSIVE daily AS (
        SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS d,
               sum(o_totalprice) AS y
        FROM orders GROUP BY 1, 2
    ),
    idx AS (
        SELECT priority, y,
               row_number() OVER (PARTITION BY priority ORDER BY d) AS i,
               count(*) OVER (PARTITION BY priority) AS n
        FROM daily
    ),
    first7 AS (
        SELECT priority,
               sum(CASE WHEN i <= 7 THEN y ELSE 0 END) / 7.0 AS l7,
               {", ".join(f"max(CASE WHEN i = {k + 1} THEN y END) - sum(CASE WHEN i <= 7 THEN y ELSE 0 END) / 7.0 AS s{k}" for k in range(7))}
        FROM idx GROUP BY priority
    ),
    hw AS (
        SELECT f.priority, CAST(7 AS BIGINT) AS i, l7 AS l,
               CAST(0 AS DOUBLE) AS b,
               {", ".join(f"s{k}" for k in range(7))},
               CAST(0 AS DOUBLE) AS sse
        FROM first7 f
        UNION ALL
        SELECT x.priority, x.i, 
               {_HW_A} * (x.y - ({_HW_SJ})) + {1 - _HW_A} * (h.l + h.b),
               {_HW_B} * (({_HW_A} * (x.y - ({_HW_SJ})) + {1 - _HW_A} * (h.l + h.b)) - h.l)
                   + {1 - _HW_B} * h.b,
               {_HW_S_UPD},
               h.sse + (x.y - (h.l + h.b + ({_HW_SJ})))
                     * (x.y - (h.l + h.b + ({_HW_SJ})))
        FROM hw h JOIN idx x ON x.priority = h.priority AND x.i = h.i + 1
    ),
    fin AS (
        SELECT hw.*, idx.n FROM hw
        JOIN (SELECT DISTINCT priority, n FROM idx) idx USING (priority)
        WHERE hw.i = idx.n
    )
    SELECT priority, CAST(n AS BIGINT) AS n_days,
           round(l, 4) AS level, round(b, 4) AS trend,
           round(l + 1 * b + (CASE {" ".join(f"WHEN ((i + 1 - 1) % 7) = {k} THEN s{k}" for k in range(7))} END), 4)
               AS forecast_h1,
           round(l + 7 * b + (CASE {" ".join(f"WHEN ((i + 7 - 1) % 7) = {k} THEN s{k}" for k in range(7))} END), 4)
               AS forecast_h7,
           round(sse / (n - 7), 4) AS mse
    FROM fin
    ORDER BY priority
    """,
)
def q237_holt_winters_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Holt-Winters additive smoothing (level + trend + 7-day
    seasonality; alpha/beta/gamma = 0.3/0.1/0.2) of daily revenue per
    priority, with the h=1 and h=7 forecasts and one-step-ahead MSE —
    the seasonal completion of q206 (level+trend) and q151 (seasonal
    baseline without smoothing). Init: l = mean of the first week,
    b = 0, seasonal = first-week deviations.

    The accumulator is a STRUCT CARRYING A 7-ELEMENT SEASONAL ARRAY,
    updated in-place by an indexed transform inside one JVM
    F.aggregate — the general recipe for vector-state recurrences
    (Kalman-style filters follow the same shape). The oracle runs
    the identical recurrence as a recursive CTE with the seasonal
    vector unrolled into 7 columns; both engines evaluate the same
    IEEE expression trees, so round(.,4) compares exactly.

    Scale: identical contract to q206 — ONE combining agg collapses
    the corpus to the calendar-bounded rollup; the recurrence runs
    per group over a sort_array'd series, cost invariant in corpus
    size.
    """
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").cast("date").alias("d"),
    ).agg(F.sum("o_totalprice").alias("y"))
    series = daily.groupBy("priority").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("d", "y"))), lambda s: s["y"]
        ).alias("ys")
    )
    first7 = F.aggregate(
        F.slice("ys", 1, 7), F.lit(0.0), lambda acc, y: acc + y
    ) / 7.0
    acc0 = F.struct(
        F.lit(7).cast("long").alias("i"),
        first7.alias("l"),
        F.lit(0.0).alias("b"),
        F.transform(F.slice("ys", 1, 7), lambda y: y - first7).alias("s"),
        F.lit(0.0).alias("sse"),
    )

    def step(acc, y):
        j = acc["i"] % 7
        sj = F.element_at(acc["s"], (j + 1).cast("int"))
        l_new = _HW_A * (y - sj) + (1 - _HW_A) * (acc["l"] + acc["b"])
        b_new = _HW_B * (l_new - acc["l"]) + (1 - _HW_B) * acc["b"]
        s_new = F.transform(
            acc["s"],
            lambda v, idx: F.when(
                idx.cast("long") == j, _HW_G * (y - l_new) + (1 - _HW_G) * v
            ).otherwise(v),
        )
        err = y - (acc["l"] + acc["b"] + sj)
        return F.struct(
            (acc["i"] + 1).alias("i"),
            l_new.alias("l"),
            b_new.alias("b"),
            s_new.alias("s"),
            (acc["sse"] + err * err).alias("sse"),
        )

    fit = series.select(
        "priority",
        F.size("ys").alias("n_days"),
        F.aggregate(F.slice("ys", 8, F.size("ys") - 7), acc0, step).alias("h"),
    )
    sj_h = lambda h: F.element_at(  # noqa: E731
        F.col("h.s"), ((F.col("h.i") + h - 1) % 7 + 1).cast("int")
    )
    return fit.select(
        "priority",
        F.col("n_days").cast("long").alias("n_days"),
        F.round(F.col("h.l"), 4).alias("level"),
        F.round(F.col("h.b"), 4).alias("trend"),
        F.round(F.col("h.l") + 1 * F.col("h.b") + sj_h(1), 4).alias("forecast_h1"),
        F.round(F.col("h.l") + 7 * F.col("h.b") + sj_h(7), 4).alias("forecast_h7"),
        F.round(F.col("h.sse") / (F.col("n_days") - 7), 4).alias("mse"),
    ).orderBy("priority")


@register(
    "q235_optimal_changepoint",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    idx AS (
        SELECT event_type, d, y,
               row_number() OVER (PARTITION BY event_type ORDER BY d) AS i,
               count(*) OVER (PARTITION BY event_type) AS n,
               sum(y) OVER (PARTITION BY event_type ORDER BY d
                            ROWS UNBOUNDED PRECEDING) AS cum,
               sum(y) OVER (PARTITION BY event_type) AS tot
        FROM daily
    ),
    splits AS (
        SELECT event_type, d, i, n, cum, tot,
               -- between-group sum of squares of the (1..i | i+1..n) split
               (CAST(cum AS DOUBLE) * n - CAST(tot AS DOUBLE) * i)
               * (CAST(cum AS DOUBLE) * n - CAST(tot AS DOUBLE) * i)
               / (CAST(i AS DOUBLE) * (n - i) * n * n) AS bss
        FROM idx WHERE i < n
    ),
    best AS (
        SELECT event_type, d, i, n, cum, tot, bss,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY round(bss, 6) DESC, d) AS rk
        FROM splits
        QUALIFY rk = 1
    )
    SELECT event_type, strftime(d, '%Y-%m-%d') AS change_day,
           CAST(i AS BIGINT) AS split_at, CAST(n AS BIGINT) AS n_days,
           round(CAST(cum AS DOUBLE) / i, 4) AS mean_before,
           round(CAST(tot - cum AS DOUBLE) / (n - i), 4) AS mean_after,
           round(bss, 4) AS bss
    FROM best
    ORDER BY event_type
    """,
)
def q235_optimal_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-optimal single changepoint per event type (binary
    segmentation, first split): the day that maximizes the
    between-segment sum of squares n_l*n_r/n*(mean_l - mean_r)^2 —
    the least-squares change detector that complements q155's CUSUM
    (CUSUM needs a threshold and detects ONLINE; this finds the
    single best OFFLINE split, and recursing on each side is the
    standard binary-segmentation tree). The BSS simplifies to
    (cum*n - tot*i)^2 / (i*(n-i)*n^2), whose numerator is exact
    integer arithmetic — only the final division is float, rounded
    at 6 BEFORE the argmax rank with the day as tie-break.

    Scale: the corpus collapses to the |types| x |days| rollup; the
    cumulative sum and the argmax are windows over that
    calendar-bounded relation partitioned by type. One corpus
    exchange, everything after is bounded.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).alias("y"))
    wp = Window.partitionBy("event_type")
    wo = wp.orderBy("d")
    idx = daily.select(
        "event_type",
        "d",
        "y",
        F.row_number().over(wo).alias("i"),
        F.count(F.lit(1)).over(wp).alias("n"),
        F.sum("y").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("y").over(wp).alias("tot"),
    )
    num = F.col("cum").cast("double") * F.col("n") - F.col("tot").cast("double") * F.col("i")
    bss = num * num / (
        F.col("i").cast("double") * (F.col("n") - F.col("i")) * F.col("n") * F.col("n")
    )
    splits = idx.where(F.col("i") < F.col("n")).withColumn("bss", bss)
    wr = Window.partitionBy("event_type").orderBy(F.desc(F.round(F.col("bss"), 6)), "d")
    best = splits.withColumn("rk", F.row_number().over(wr)).where(F.col("rk") == 1)
    return best.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("change_day"),
        F.col("i").cast("long").alias("split_at"),
        F.col("n").cast("long").alias("n_days"),
        F.round(F.col("cum").cast("double") / F.col("i"), 4).alias("mean_before"),
        F.round(
            (F.col("tot") - F.col("cum")).cast("double") / (F.col("n") - F.col("i")), 4
        ).alias("mean_after"),
        F.round("bss", 4).alias("bss"),
    ).orderBy("event_type")


_GST_BOUNDS = [
    (1, 4.333), (2, 2.963), (3, 2.359), (4, 2.014),
]  # O'Brien-Fleming z boundaries for 4 equally-spaced looks


@register(
    "q238_group_sequential_test",
    oracle=f"""
    WITH ev AS (
        SELECT user_id % 2 = 1 AS treated, value,
               ntile(4) OVER (ORDER BY ts, event_id) AS look
        FROM events
    ),
    looks AS (
        SELECT l.k, e.treated,
               CAST(count(*) AS BIGINT) AS n,
               sum(e.value) AS sv,
               sum(e.value * e.value) AS svv
        FROM ev e JOIN (SELECT unnest(range(1, 5)) AS k) l ON e.look <= l.k
        GROUP BY 1, 2
    ),
    arms AS (
        SELECT k, treated, n, sv / n AS mean,
               (svv - sv * sv / n) / (n - 1) AS var
        FROM looks
    ),
    z AS (
        SELECT a.k,
               CAST(a.n + b.n AS BIGINT) AS n_total,
               (a.mean - b.mean) / sqrt(a.var / a.n + b.var / b.n) AS z
        FROM arms a JOIN arms b ON a.k = b.k AND a.treated AND NOT b.treated
    ),
    bounds (k, c) AS (VALUES {", ".join(f"({k}, {c})" for k, c in _GST_BOUNDS)})
    SELECT z.k AS look, z.n_total, round(z.z, 4) AS z_stat,
           bounds.c AS obf_bound,
           CAST(abs(z.z) > bounds.c AS BOOLEAN) AS significant
    FROM z JOIN bounds ON bounds.k = z.k
    ORDER BY z.k
    """,
)
def q238_group_sequential_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-sequential A/B monitoring with O'Brien-Fleming stopping
    boundaries at 4 equally-spaced looks: the cumulative Welch z at
    each interim analysis against the OBF critical value — the
    peeking-safe readout that lets an experimenter stop early
    without inflating alpha (the sequential completion of the
    q150 -> q221 -> q225 experimentation stack; q150's single z IS
    look 4 with boundary 1.96-ish). Looks are arrival quartiles
    (ntile over event time), so each interim set is a prefix —
    exactly what a live dashboard sees.

    Scale: the look fan-out joins each event to the looks it has
    entered (<=4x), collapsing immediately into per-(look, arm)
    mergeable moments — one corpus exchange into a 8-cell relation;
    the z and boundary comparison are arithmetic on those cells.
    The arrival ntile runs as the TWO-PASS global ntile
    (operators/ranking.py: day-of-ts bucket counts -> broadcast
    prefix offsets -> day-partitioned row_number; exact ntile
    arithmetic), so the corpus never funnels through one partition
    (the r6 ADVICE global-ntile item, retired); in production the
    look id comes straight from the batch/ingest date (no sort at
    all), the q222 staging argument.
    """
    from g_etl_spark.operators.ranking import global_ntile_twopass

    e = load(spark, sf_dir, "events")
    ev = global_ntile_twopass(
        e.select(
            (F.col("user_id") % 2 == 1).alias("treated"), "value", "ts", "event_id"
        ),
        4,
        ["ts", "event_id"],
        F.floor(F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long"),
        out="look",
    ).select("treated", "value", "look")
    ks = spark.range(1, 5).select(F.col("id").alias("k"))
    looks = (
        ev.crossJoin(F.broadcast(ks))
        .where(F.col("look") <= F.col("k"))
        .groupBy("k", "treated")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sv"),
            F.sum(F.col("value") * F.col("value")).alias("svv"),
        )
    )
    arms = looks.select(
        "k",
        "treated",
        "n",
        (F.col("sv") / F.col("n")).alias("mean"),
        ((F.col("svv") - F.col("sv") * F.col("sv") / F.col("n")) / (F.col("n") - 1)).alias("var"),
    )
    a = arms.where("treated").select(
        "k", F.col("n").alias("na"), F.col("mean").alias("ma"), F.col("var").alias("va")
    )
    b = arms.where(~F.col("treated")).select(
        "k", F.col("n").alias("nb"), F.col("mean").alias("mb"), F.col("var").alias("vb")
    )
    z = a.join(b, "k").select(
        "k",
        (F.col("na") + F.col("nb")).cast("long").alias("n_total"),
        (
            (F.col("ma") - F.col("mb"))
            / F.sqrt(F.col("va") / F.col("na") + F.col("vb") / F.col("nb"))
        ).alias("z"),
    )
    bounds = spark.createDataFrame(_GST_BOUNDS, "k long, c double")
    return (
        z.join(F.broadcast(bounds), "k")
        .select(
            F.col("k").alias("look"),
            "n_total",
            F.round("z", 4).alias("z_stat"),
            F.col("c").alias("obf_bound"),
            (F.abs(F.col("z")) > F.col("c")).alias("significant"),
        )
        .orderBy("look")
    )


@register(
    "q246_attribution_models",
    oracle="""
    WITH ev AS (
        SELECT user_id, ts, event_id, event_type,
               CAST(json_extract(props, '$.k') AS BIGINT) % 5 AS channel
        FROM events
    ),
    pur AS (SELECT user_id, ts AS pts, event_id AS pid FROM ev
            WHERE event_type = 'purchase'),
    cli AS (SELECT user_id, ts AS cts, event_id AS cid, channel FROM ev
            WHERE event_type = 'click'),
    touch AS MATERIALIZED (
        SELECT p.pid, c.channel, c.cts, c.cid,
               row_number() OVER (PARTITION BY p.pid ORDER BY c.cts, c.cid)
                   AS rk_first,
               row_number() OVER (PARTITION BY p.pid ORDER BY c.cts DESC,
                                  c.cid DESC) AS rk_last,
               count(*) OVER (PARTITION BY p.pid) AS n_touch
        FROM pur p JOIN cli c
          ON c.user_id = p.user_id
         AND c.cts <= p.pts
         AND c.cts > p.pts - INTERVAL 24 HOUR
    )
    SELECT channel,
           CAST(count(DISTINCT pid) AS BIGINT) AS touched_purchases,
           CAST(sum(CASE WHEN rk_first = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS first_touch,
           CAST(sum(CASE WHEN rk_last = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS last_touch,
           round(sum(1.0 / n_touch), 4) AS linear_credit
    FROM touch
    GROUP BY channel
    ORDER BY channel
    """,
)
def q246_attribution_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three marketing-attribution models in one pass: for every
    purchase, the clicks in the preceding 24 hours are its touch
    path; each channel's credit under FIRST-touch, LAST-touch, and
    LINEAR (1/n per touch) — the side-by-side that shows how much
    the model choice moves budget (q154 computes last-touch alone as
    a no-join carry; this builds the full path so all three models
    read off the same relation). Sum of each credit column across
    channels equals the attributed-purchase count — the conservation
    identity the test pins.

    Scale: the touch join is a per-user time-range join (q37's
    bucketed-range shape; bounded by touches-per-24h x purchases,
    human-rate-capped like q230's sessions); the three models are
    window ranks over each purchase's bounded path; credit collapses
    per channel. Linear credit sums exact reciprocals of small
    integers — rounded at 4 after the agg.
    """
    e = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        (F.get_json_object("props", "$.k").cast("long") % 5).alias("channel"),
    )
    pur = e.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"), F.col("event_id").alias("pid")
    )
    cli = e.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts"), F.col("event_id").alias("cid"), "channel"
    )
    touch = pur.join(
        cli,
        (pur["user_id"] == cli["user_id"])
        & (F.col("cts") <= F.col("pts"))
        & (F.col("cts") > F.col("pts") - F.expr("INTERVAL 24 HOURS")),
    ).select("pid", "channel", "cts", "cid")
    wf = Window.partitionBy("pid").orderBy("cts", "cid")
    wl = Window.partitionBy("pid").orderBy(F.desc("cts"), F.desc("cid"))
    wn = Window.partitionBy("pid")
    ranked = (
        touch.withColumn("rk_first", F.row_number().over(wf))
        .withColumn("rk_last", F.row_number().over(wl))
        .withColumn("n_touch", F.count(F.lit(1)).over(wn))
    )
    return (
        ranked.groupBy("channel")
        .agg(
            F.countDistinct("pid").alias("touched_purchases"),
            F.sum(F.when(F.col("rk_first") == 1, 1).otherwise(0)).alias("first_touch"),
            F.sum(F.when(F.col("rk_last") == 1, 1).otherwise(0)).alias("last_touch"),
            F.round(F.sum(1.0 / F.col("n_touch")), 4).alias("linear_credit"),
        )
        .orderBy("channel")
    )


@register(
    "q248_dft_periodogram",
    oracle="""
    WITH daily AS (
        SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS d,
               CAST(count(*) AS DOUBLE) AS c
        FROM events GROUP BY 1
    ),
    base AS (SELECT min(d) AS d0, avg(c) AS mu FROM daily),
    pw AS (
        SELECT p.p,
               pow(sum((dl.c - b.mu) * cos(2 * pi() * (dl.d - b.d0) / p.p)), 2)
               + pow(sum((dl.c - b.mu) * sin(2 * pi() * (dl.d - b.d0) / p.p)), 2)
                   AS power
        FROM daily dl
        CROSS JOIN base b
        JOIN (SELECT unnest(range(2, 11)) AS p) p ON true
        GROUP BY p.p
    ),
    tot AS (SELECT sum(power) AS t FROM pw)
    SELECT CAST(p AS BIGINT) AS period_days,
           round(power, 2) AS power,
           round(power / (SELECT t FROM tot), 6) AS power_share
    FROM pw ORDER BY period_days
    """,
)
def q248_dft_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-Fourier periodogram of the daily event-count series
    at candidate periods 2..10 days: spectral power of the demeaned
    series per period — the frequency-domain seasonality detector
    (q176's ACF works in the lag domain; the periodogram separates
    overlapping cycles and is what you consult before pinning q151's
    weekday profile or q237's seasonal vector length).

    Scale: the corpus collapses in ONE daily rollup (|days| rows);
    the 9 candidate periods broadcast-join onto it and each power is
    a mergeable (cos, sin) pair of sums over that bounded relation —
    at 100 TB the per-period trig runs on |days| cells, never on raw
    events. Day indices are re-based to the series start so the
    angles stay small and both engines' libm agree well inside the
    rounding; power is rounded AFTER the quadrature sum.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        F.floor(F.unix_micros("ts") / F.lit(86_400_000_000.0)).cast("long").alias("d")
    ).agg(F.count(F.lit(1)).cast("double").alias("c"))
    base = daily.agg(F.min("d").alias("d0"), F.avg("c").alias("mu"))
    ps = spark.range(2, 11).select(F.col("id").alias("p"))
    ang = 2 * 3.141592653589793 * (F.col("d") - F.col("d0")) / F.col("p")
    pw = (
        daily.crossJoin(F.broadcast(base))
        .join(F.broadcast(ps), how="cross")
        .groupBy("p")
        .agg(
            (
                F.pow(F.sum((F.col("c") - F.col("mu")) * F.cos(ang)), 2)
                + F.pow(F.sum((F.col("c") - F.col("mu")) * F.sin(ang)), 2)
            ).alias("power")
        )
    )
    tot = pw.agg(F.sum("power").alias("t"))
    return (
        pw.crossJoin(F.broadcast(tot))
        .select(
            F.col("p").cast("long").alias("period_days"),
            F.round("power", 2).alias("power"),
            F.round(F.col("power") / F.col("t"), 6).alias("power_share"),
        )
        .orderBy("period_days")
    )


@register(
    "q255_time_decay_attribution",
    oracle="""
    WITH ev AS (
        SELECT user_id, ts, event_id, event_type,
               CAST(json_extract(props, '$.k') AS BIGINT) % 5 AS channel
        FROM events
    ),
    pur AS (SELECT user_id, ts AS pts, event_id AS pid FROM ev
            WHERE event_type = 'purchase'),
    cli AS (SELECT user_id, ts AS cts, event_id AS cid, channel FROM ev
            WHERE event_type = 'click'),
    touch AS MATERIALIZED (
        SELECT p.pid, c.channel,
               exp(-(epoch_us(p.pts) - epoch_us(c.cts)) / 21600000000.0) AS w
        FROM pur p JOIN cli c
          ON c.user_id = p.user_id
         AND c.cts <= p.pts
         AND c.cts > p.pts - INTERVAL 24 HOUR
    ),
    norm AS (
        SELECT pid, channel, w / sum(w) OVER (PARTITION BY pid) AS credit
        FROM touch
    )
    SELECT channel,
           CAST(count(DISTINCT pid) AS BIGINT) AS touched_purchases,
           round(sum(credit), 4) AS decay_credit
    FROM norm GROUP BY channel ORDER BY channel
    """,
)
def q255_time_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay marketing attribution (half-life ~4.2 h: weight
    exp(-age/6h)) over the same 24-hour touch paths as q246: recent
    clicks earn exponentially more credit, normalized per purchase
    so each conversion distributes exactly 1.0 — the fourth model of
    the attribution family (first/last/linear in q246), and the one
    practitioners default to because it interpolates between last-
    touch (tau -> 0) and linear (tau -> inf) with one knob.

    Scale: identical join shape to q246 (per-user bounded time-range
    join); the decay weight is map-side arithmetic on exact
    microsecond ages; normalization is one window over each
    purchase's bounded path; credit collapses per channel. Credit
    conservation (sum = attributed purchases) is the test identity.
    """
    e = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        (F.get_json_object("props", "$.k").cast("long") % 5).alias("channel"),
    )
    pur = e.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"), F.col("event_id").alias("pid")
    )
    cli = e.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts"), F.col("event_id").alias("cid"), "channel"
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
            -(F.unix_micros("pts") - F.unix_micros("cts")) / F.lit(21_600_000_000.0)
        ).alias("w"),
    )
    wp = Window.partitionBy("pid")
    norm = touch.withColumn("credit", F.col("w") / F.sum("w").over(wp))
    return (
        norm.groupBy("channel")
        .agg(
            F.countDistinct("pid").alias("touched_purchases"),
            F.round(F.sum("credit"), 4).alias("decay_credit"),
        )
        .orderBy("channel")
    )


@register(
    "q257_croston_forecast",
    oracle="""
    WITH RECURSIVE ev AS (
        SELECT event_type,
               CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS d
        FROM events WHERE value > 200.0
    ),
    d0 AS (
        SELECT CAST(floor(epoch_us(min(ts)) / 86400000000.0) AS BIGINT) AS d0
        FROM events
    ),
    dem AS (
        SELECT event_type, d, CAST(count(*) AS DOUBLE) AS y,
               row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn
        FROM ev GROUP BY 1, 2
    ),
    rec AS (
        SELECT dem.event_type, dem.rn, dem.y AS z,
               CAST(dem.d - (SELECT d0 FROM d0) + 1 AS DOUBLE) AS p,
               dem.d AS prev
        FROM dem WHERE dem.rn = 1
        UNION ALL
        SELECT dem.event_type, dem.rn,
               0.2 * dem.y + 0.8 * rec.z,
               0.2 * (dem.d - rec.prev) + 0.8 * rec.p,
               dem.d
        FROM rec JOIN dem ON dem.event_type = rec.event_type
                         AND dem.rn = rec.rn + 1
    )
    SELECT r.event_type,
           CAST(r.rn AS BIGINT) AS n_demands,
           round(r.z, 4) AS demand_size,
           round(r.p, 4) AS demand_interval,
           round(r.z / r.p, 4) AS rate_per_day
    FROM rec r
    JOIN (SELECT event_type, max(rn) AS mx FROM dem GROUP BY 1) m
      ON m.event_type = r.event_type AND r.rn = m.mx
    ORDER BY r.event_type
    """,
)
def q257_croston_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method (alpha = 0.2) for INTERMITTENT demand — the
    forecaster for series that are mostly zero (spare parts, rare
    high-value events; here daily counts of value > 200 events per
    type, the ~2-5% value tail): EWMA-smooth the nonzero demand SIZE and
    the INTER-demand INTERVAL separately, forecast their ratio.
    Holt/Holt-Winters (q206/q237) average the zeros into oblivion on
    such series; Croston is the standard fix (and its rate is what a
    capacity planner feeds q231's tail-risk check).

    Scale: the corpus collapses in one (type, day) rollup of the
    RARE demands only — no zero-filling, because the interval
    arithmetic derives gaps from consecutive demand DAYS; the
    recurrence runs as one JVM F.aggregate over each type's bounded
    demand array (<= |days| elements), the q206/q237 recipe. The
    oracle replays the identical IEEE expression tree as a recursive
    CTE, so round(.,4) compares exactly.
    """
    e = load(spark, sf_dir, "events")
    day = F.floor(F.unix_micros("ts") / F.lit(86_400_000_000.0)).cast("long")
    dem = (
        e.where(F.col("value") > 200.0)
        .groupBy(F.col("event_type"), day.alias("d"))
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
    )
    series = dem.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("d", "y"))).alias("ds")
    )
    base = e.agg(
        F.floor(F.unix_micros(F.min("ts")) / F.lit(86_400_000_000.0))
        .cast("long")
        .alias("d0")
    )
    acc0 = F.struct(
        F.lit(0.0).alias("z"),
        F.lit(0.0).alias("p"),
        (F.col("d0") - 1).alias("prev"),
        F.lit(0).alias("started"),
    )

    def step(acc, x):
        q = x["d"] - acc["prev"]
        return F.struct(
            F.when(acc["started"] == 0, x["y"])
            .otherwise(0.2 * x["y"] + 0.8 * acc["z"])
            .alias("z"),
            F.when(acc["started"] == 0, q.cast("double"))
            .otherwise(0.2 * q + 0.8 * acc["p"])
            .alias("p"),
            x["d"].alias("prev"),
            F.lit(1).alias("started"),
        )

    fit = series.crossJoin(F.broadcast(base)).select(
        "event_type",
        F.size("ds").cast("long").alias("n_demands"),
        F.aggregate("ds", acc0, step).alias("h"),
    )
    return fit.select(
        "event_type",
        "n_demands",
        F.round(F.col("h.z"), 4).alias("demand_size"),
        F.round(F.col("h.p"), 4).alias("demand_interval"),
        F.round(F.col("h.z") / F.col("h.p"), 4).alias("rate_per_day"),
    ).orderBy("event_type")


@register(
    "q261_funnel_exclusion",
    oracle="""
    WITH base AS (
        SELECT user_id, event_type, epoch_us(ts) AS t FROM events
    ),
    anchors AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'click' THEN t END) AS c_ts
        FROM base GROUP BY user_id
    ),
    pur AS (
        SELECT b.user_id,
               min(CASE WHEN b.event_type = 'purchase' AND b.t > a.c_ts
                        THEN b.t END) AS p_ts
        FROM base b JOIN anchors a USING (user_id)
        GROUP BY b.user_id
    ),
    err AS (
        SELECT b.user_id,
               CAST(sum(CASE WHEN b.event_type = 'error'
                             AND b.t > a.c_ts AND b.t < p.p_ts
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_err
        FROM base b
        JOIN anchors a USING (user_id)
        JOIN pur p USING (user_id)
        GROUP BY b.user_id
    ),
    per_user AS (
        SELECT a.user_id, a.c_ts, p.p_ts, coalesce(e.n_err, 0) AS n_err
        FROM anchors a
        LEFT JOIN pur p USING (user_id)
        LEFT JOIN err e USING (user_id)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(CASE WHEN c_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clicked,
           CAST(sum(CASE WHEN p_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_purchased,
           CAST(sum(CASE WHEN p_ts IS NOT NULL AND n_err > 0 THEN 1 ELSE 0
                    END) AS BIGINT) AS n_excluded,
           CAST(sum(CASE WHEN p_ts IS NOT NULL AND n_err = 0 THEN 1 ELSE 0
                    END) AS BIGINT) AS n_clean_conversions
    FROM per_user
    """,
)
def q261_funnel_exclusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel WITH EXCLUSION semantics (the
    Amplitude/Mixpanel "exclude event between steps" mode, which
    q146's strict-order funnel cannot express): first click -> first
    purchase after it, but a conversion is EXCLUDED if any 'error'
    event fell strictly between the two anchors — the pattern that
    separates "converted" from "converted despite a broken flow",
    which is what a funnel-health dashboard actually wants.

    Scale: the q146 recipe — ONE user_id partitioning carries
    chained conditional window-mins (anchor, then purchase-after-
    anchor, then errors-between) as three WindowExec over one
    Exchange + Sort; the per-user collapse and the scalar rollup
    are map-side-combinable. No joins, no row explosion; integer
    micros end to end so the cross-engine compare is exact.
    """
    e = load(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id")
    base = e.select("user_id", "event_type", F.unix_micros("ts").alias("t"))
    c = base.withColumn(
        "c_ts",
        F.min(F.when(F.col("event_type") == "click", F.col("t"))).over(wu),
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
    per_user = x.groupBy("user_id").agg(
        F.max("c_ts").alias("c_ts"),
        F.max("p_ts").alias("p_ts"),
        F.sum("is_err").alias("n_err"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("c_ts").isNotNull(), 1).otherwise(0)).alias("n_clicked"),
        F.sum(F.when(F.col("p_ts").isNotNull(), 1).otherwise(0)).alias("n_purchased"),
        F.sum(
            F.when(F.col("p_ts").isNotNull() & (F.col("n_err") > 0), 1).otherwise(0)
        ).alias("n_excluded"),
        F.sum(
            F.when(F.col("p_ts").isNotNull() & (F.col("n_err") == 0), 1).otherwise(0)
        ).alias("n_clean_conversions"),
    )


@register(
    "q265_interrupted_time_series",
    oracle="""
    WITH daily AS (
        SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS d,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS y
        FROM events GROUP BY 1
    ),
    cut AS (
        SELECT CAST(floor(epoch_us(TIMESTAMP '2024-01-16 00:00:00')
                          / 86400000000.0) AS BIGINT) AS cd
    ),
    pre AS (SELECT d, y FROM daily, cut WHERE d < cd),
    m AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               sum(CAST(d AS DOUBLE)) AS sd, sum(y) AS sy,
               sum(CAST(d AS DOUBLE) * CAST(d AS DOUBLE)) AS sdd,
               sum(CAST(d AS DOUBLE) * y) AS sdy
        FROM pre
    ),
    fit AS (
        SELECT n,
               (sdy - sd * sy / n) / (sdd - sd * sd / n) AS b,
               sy / n - (sdy - sd * sy / n) / (sdd - sd * sd / n) * (sd / n)
                   AS a
        FROM m
    ),
    resid AS (
        SELECT sum((pre.y - fit.a - fit.b * pre.d)
                   * (pre.y - fit.a - fit.b * pre.d)) AS sse
        FROM pre, fit
    ),
    post AS (
        SELECT CAST(count(*) AS DOUBLE) AS n_post,
               sum(daily.y) AS act,
               sum(fit.a + fit.b * daily.d) AS pred
        FROM daily, cut, fit WHERE daily.d >= cut.cd
    )
    SELECT CAST(fit.n AS BIGINT) AS n_pre_days,
           CAST(post.n_post AS BIGINT) AS n_post_days,
           round(fit.b, 6) AS pre_slope,
           round(post.act, 2) AS post_actual,
           round(post.pred, 2) AS post_counterfactual,
           round(post.act - post.pred, 2) AS cumulative_effect,
           round((post.act - post.pred)
                 / (sqrt(resid.sse / (fit.n - 2)) * sqrt(post.n_post)), 4)
               AS effect_z
    FROM fit, resid, post
    """,
)
def q265_interrupted_time_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interrupted time-series causal impact (CausalImpact-lite): fit
    the PRE-period linear trend of daily revenue, extrapolate it as
    the post-intervention counterfactual, and report the cumulative
    effect (actual - predicted) with a z-score from the pre-period
    residual spread — the estimator for interventions WITHOUT a
    control group (a site-wide launch), completing the causal stack:
    q221 DiD needs a control arm, q225 CUPED a pre covariate, this
    needs only the series itself.

    Scale: the corpus collapses in ONE cent-quantized daily rollup
    (integer-exact per the q177 precedent, so the regression inputs
    are bit-identical across engines); the OLS moments, residual
    pass, and post-period extrapolation all run on the bounded
    |days| relation — three tiny aggs over broadcast scalars,
    nothing corpus-sized moves twice.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        F.floor(F.unix_micros("ts") / F.lit(86_400_000_000.0)).cast("long").alias("d")
    ).agg(
        (
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).cast("double")
            / 100.0
        ).alias("y")
    )
    cd = F.floor(
        F.unix_micros(F.lit("2024-01-16 00:00:00").cast("timestamp"))
        / F.lit(86_400_000_000.0)
    ).cast("long")
    daily = daily.withColumn("cd", cd)
    pre = daily.where(F.col("d") < F.col("cd"))
    dd = F.col("d").cast("double")
    m = pre.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dd).alias("sd"),
        F.sum("y").alias("sy"),
        F.sum(dd * dd).alias("sdd"),
        F.sum(dd * F.col("y")).alias("sdy"),
    )
    slope = (F.col("sdy") - F.col("sd") * F.col("sy") / F.col("n")) / (
        F.col("sdd") - F.col("sd") * F.col("sd") / F.col("n")
    )
    fit = m.select(
        "n",
        slope.alias("b"),
        (F.col("sy") / F.col("n") - slope * (F.col("sd") / F.col("n"))).alias("a"),
    )
    resid = (
        pre.crossJoin(F.broadcast(fit))
        .agg(
            F.sum(
                (F.col("y") - F.col("a") - F.col("b") * F.col("d"))
                * (F.col("y") - F.col("a") - F.col("b") * F.col("d"))
            ).alias("sse")
        )
    )
    post = (
        daily.where(F.col("d") >= F.col("cd"))
        .crossJoin(F.broadcast(fit))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_post"),
            F.sum("y").alias("act"),
            F.sum(F.col("a") + F.col("b") * F.col("d")).alias("pred"),
        )
    )
    return (
        fit.crossJoin(F.broadcast(resid))
        .crossJoin(F.broadcast(post))
        .select(
            F.col("n").cast("long").alias("n_pre_days"),
            F.col("n_post").cast("long").alias("n_post_days"),
            F.round("b", 6).alias("pre_slope"),
            F.round("act", 2).alias("post_actual"),
            F.round("pred", 2).alias("post_counterfactual"),
            F.round(F.col("act") - F.col("pred"), 2).alias("cumulative_effect"),
            F.round(
                (F.col("act") - F.col("pred"))
                / (
                    F.sqrt(F.col("sse") / (F.col("n") - 2))
                    * F.sqrt(F.col("n_post"))
                ),
                4,
            ).alias("effect_z"),
        )
    )


_MKATTR_ROUNDS = 24  # power-iteration depth, mirrored exactly by the oracle
_MKATTR_STEPS = ",\n".join(
    f"    m{i} AS MATERIALIZED (SELECT t.scenario, t.dst AS state, sum(m{i - 1}.m * t.p) AS m"
    f" FROM m{i - 1} JOIN tr t ON t.scenario = m{i - 1}.scenario AND t.src = m{i - 1}.state"
    f" GROUP BY 1, 2)"
    for i in range(1, _MKATTR_ROUNDS + 1)
)


@register(
    "q266_markov_attribution",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, ts, event_id, event_type,
               CAST(json_extract(props, '$.k') AS BIGINT) % 5 AS ch
        FROM events
    ),
    cli AS (
        SELECT user_id, ts, event_id, CAST(ch AS VARCHAR) AS ch
        FROM ev WHERE event_type = 'click'
    ),
    conv AS (SELECT DISTINCT user_id FROM ev WHERE event_type = 'purchase'),
    seq AS (
        SELECT user_id, ch,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               lead(ch) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS nxt
        FROM cli
    ),
    trans0 AS (
        SELECT 'S' AS src, ch AS dst FROM seq WHERE rn = 1
        UNION ALL
        SELECT ch, nxt FROM seq WHERE nxt IS NOT NULL
        UNION ALL
        SELECT s.ch, CASE WHEN c.user_id IS NOT NULL THEN 'C' ELSE 'N' END
        FROM seq s LEFT JOIN conv c USING (user_id) WHERE s.nxt IS NULL
    ),
    tc AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS c
           FROM trans0 GROUP BY 1, 2),
    tot AS (SELECT src, sum(c) AS t FROM tc GROUP BY 1),
    base AS (SELECT tc.src, tc.dst, tc.c / tot.t AS p
             FROM tc JOIN tot USING (src)),
    scen AS (SELECT unnest(['base', 'r0', 'r1', 'r2', 'r3', 'r4'])
                 AS scenario),
    redir AS (
        SELECT s.scenario, b.src,
               CASE WHEN s.scenario != 'base'
                         AND b.dst = substr(s.scenario, 2, 1)
                    THEN 'N' ELSE b.dst END AS dst,
               b.p
        FROM scen s JOIN base b
          ON s.scenario = 'base' OR b.src != substr(s.scenario, 2, 1)
    ),
    tr AS MATERIALIZED (
        SELECT scenario, src, dst, sum(p) AS p FROM redir GROUP BY 1, 2, 3
        UNION ALL
        SELECT scenario, a.st, a.st, 1.0
        FROM scen, (SELECT unnest(['C', 'N']) AS st) a
    ),
    m0 AS (SELECT scenario, 'S' AS state, 1.0 AS m FROM scen),
{_MKATTR_STEPS},
    pconv AS (
        SELECT scenario, coalesce(sum(CASE WHEN state = 'C' THEN m END), 0.0)
            AS p
        FROM m{_MKATTR_ROUNDS} GROUP BY scenario
    ),
    eff AS (
        SELECT CAST(substr(r.scenario, 2, 1) AS BIGINT) AS channel,
               b.p AS p_base, r.p AS p_removed,
               greatest(b.p - r.p, 0.0) AS effect
        FROM pconv r JOIN (SELECT p FROM pconv WHERE scenario = 'base') b
          ON r.scenario != 'base'
    ),
    s AS (SELECT sum(effect) AS te FROM eff)
    SELECT channel,
           round(p_base, 6) AS p_conversion_base,
           round(p_removed, 6) AS p_conversion_removed,
           round(effect, 6) AS removal_effect,
           round(CASE WHEN s.te > 0 THEN effect / s.te ELSE 0.0 END, 6)
               AS attribution_share
    FROM eff, s ORDER BY channel
    """,
)
def q266_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven (Markov removal-effect) attribution — the model
    that replaces the heuristic family (q246 first/last/linear,
    q255 decay) with chain structure: build the S -> channel ->
    ... -> C/N journey chain from ordered clicks, compute the
    absorption probability of conversion, then REMOVE each channel
    (its inflow redirects to null) and re-absorb; a channel's credit
    is its removal effect normalized across channels — the Shapley-
    flavored standard for budget allocation, because it prices what
    a channel's PRESENCE contributes, not where it happens to sit in
    the path.

    Scale: the ONLY corpus-sized work is the per-user ordered-click
    pass (one user exchange) and a distinct-converters agg; the
    chain is a <= 8x8 matrix, so the 6 scenarios x {_MKATTR_ROUNDS}
    power iterations run on the driver over the collected <= 42
    transition cells (the q158/q215 bounded-collect precedent) and
    re-enter Spark as a literal relation. The oracle unrolls the
    IDENTICAL {_MKATTR_ROUNDS} matvecs as MATERIALIZED chained CTEs;
    rounding at 6 absorbs summation-order ulps on <= 8-term sums.
    """
    e = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        (F.get_json_object("props", "$.k").cast("long") % 5).alias("ch"),
    )
    cli = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", F.col("ch").cast("string").alias("ch")
    )
    conv = e.where(F.col("event_type") == "purchase").select("user_id").distinct()
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
    tc = (
        first.unionAll(mid)
        .unionAll(lastt)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .collect()
    )  # bounded: <= (|channels|+1) x (|channels|+2) cells
    rows_out = _markov_removal_attribution(tc, rounds=_MKATTR_ROUNDS)
    return spark.createDataFrame(
        rows_out,
        "channel long, p_conversion_base double, p_conversion_removed double,"
        " removal_effect double, attribution_share double",
    ).orderBy("channel")


def _markov_removal_attribution(cells, rounds: int):
    """Driver-side absorption loop over the bounded journey chain,
    mirroring the oracle's chained CTEs (same transition relation,
    same matvec count, same redirect-to-null removal semantics)."""
    from collections import defaultdict

    tot: dict[str, float] = defaultdict(float)
    for r in cells:
        tot[r["src"]] += r["c"]
    base = sorted((r["src"], r["dst"], r["c"] / tot[r["src"]]) for r in cells)
    channels = sorted(
        {s for s, _, _ in base if s not in ("S",)}
        | {d for _, d, _ in base if d not in ("C", "N")}
    )

    def absorb(removed: str | None) -> float:
        tr: dict[str, list[tuple[str, float]]] = defaultdict(list)
        agg: dict[tuple[str, str], float] = defaultdict(float)
        for src, dst, p in base:
            if removed is not None and src == removed:
                continue
            d = "N" if (removed is not None and dst == removed) else dst
            agg[(src, d)] += p
        for (src, d), p in sorted(agg.items()):
            tr[src].append((d, p))
        tr["C"].append(("C", 1.0))
        tr["N"].append(("N", 1.0))
        m = {"S": 1.0}
        for _ in range(rounds):
            nxt: dict[str, float] = defaultdict(float)
            for src in sorted(m):
                for d, p in tr.get(src, []):
                    nxt[d] += m[src] * p
            m = dict(nxt)
        return m.get("C", 0.0)

    p_base = absorb(None)
    effs = []
    for ch in channels:
        p_r = absorb(ch)
        effs.append((int(ch), p_r, max(p_base - p_r, 0.0)))
    te = sum(e for _, _, e in effs)
    return [
        (
            ch,
            round(p_base, 6),
            round(p_r, 6),
            round(e, 6),
            round(e / te if te > 0 else 0.0, 6),
        )
        for ch, p_r, e in effs
    ]


@register(
    "q267_stl_decomposition",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS DOUBLE) / 100.0 AS y
        FROM orders GROUP BY 1
    ),
    tr AS (
        SELECT d, y,
               CASE WHEN count(*) OVER w = 7 THEN avg(y) OVER w END AS trend
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    det AS (
        SELECT dayofweek(d) AS dow, y - trend AS det
        FROM tr WHERE trend IS NOT NULL
    ),
    seas AS (
        SELECT dow, CAST(count(*) AS BIGINT) AS n_days, avg(det) AS s
        FROM det GROUP BY 1
    ),
    resid AS (
        SELECT d.dow, d.det, d.det - s.s AS r FROM det d JOIN seas s USING (dow)
    ),
    vtot AS (
        SELECT (sum(det * det) - sum(det) * sum(det) / count(*)) / count(*)
                   AS vd,
               (sum(r * r) - sum(r) * sum(r) / count(*)) / count(*) AS vr
        FROM resid
    ),
    mr AS (SELECT dow, avg(abs(r)) AS mar FROM resid GROUP BY dow)
    SELECT s.dow, s.n_days,
           round(s.s, 2) AS seasonal_index,
           round(mr.mar, 2) AS mean_abs_residual,
           round(1.0 - vtot.vr / vtot.vd, 4) AS seasonal_strength
    FROM seas s JOIN mr USING (dow), vtot ORDER BY s.dow
    """,
)
def q267_stl_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite decomposition of daily revenue: trend = centered
    7-day moving average, seasonal = day-of-week means of the
    detrended series, residual = what's left — with the
    Hyndman seasonal-strength statistic 1 - Var(resid)/Var(detrended)
    that says how much of the non-trend variation the weekly cycle
    explains. The classical-decomposition complement of the family:
    q248 DETECTS the period, this EXTRACTS the components, q237
    FORECASTS with them; the per-dow seasonal indices are the
    anomaly baselines q151 compares against.

    Scale: one cent-quantized daily rollup (integer-exact inputs,
    q177 precedent); the MA window, dow means, and variance ratios
    all run on the calendar-bounded |days| relation — the window is
    unpartitioned but its input is bounded by the calendar, not the
    corpus (the q243 bounded-relation contract). Weekday numbering
    pinned cross-engine (Spark dayofweek - 1 = DuckDB dayofweek).
    """
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        (
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")).cast(
                "double"
            )
            / 100.0
        ).alias("y")
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    tr = daily.select(
        "d",
        "y",
        F.when(F.count(F.lit(1)).over(w) == 7, F.avg("y").over(w)).alias("trend"),
    )
    det = tr.where(F.col("trend").isNotNull()).select(
        (F.dayofweek("d") - 1).cast("long").alias("dow"),
        (F.col("y") - F.col("trend")).alias("det")
    )
    seas = det.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_days"), F.avg("det").alias("s")
    )
    resid = det.join(F.broadcast(seas.select("dow", "s")), "dow").select(
        "dow", "det", (F.col("det") - F.col("s")).alias("r")
    )
    cnt = F.count(F.lit(1))
    vtot = resid.agg(
        (
            (F.sum(F.col("det") * F.col("det")) - F.sum("det") * F.sum("det") / cnt)
            / cnt
        ).alias("vd"),
        ((F.sum(F.col("r") * F.col("r")) - F.sum("r") * F.sum("r") / cnt) / cnt).alias(
            "vr"
        ),
    )
    mr = resid.groupBy("dow").agg(F.avg(F.abs("r")).alias("mar"))
    return (
        seas.join(mr, "dow")
        .crossJoin(F.broadcast(vtot))
        .select(
            "dow",
            "n_days",
            F.round("s", 2).alias("seasonal_index"),
            F.round("mar", 2).alias("mean_abs_residual"),
            F.round(1.0 - F.col("vr") / F.col("vd"), 4).alias("seasonal_strength"),
        )
        .orderBy("dow")
    )


@register(
    "q272_path_sankey",
    oracle="""
    WITH cli AS (
        SELECT user_id, ts, event_id,
               CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 5
                    AS VARCHAR) AS ch
        FROM events WHERE event_type = 'click'
    ),
    seq AS (
        SELECT user_id, ch,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               lead(ch) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS nxt
        FROM cli
    )
    SELECT rn AS step, ch AS src_channel, nxt AS dst_channel,
           CAST(count(*) AS BIGINT) AS n_users
    FROM seq WHERE rn <= 3 AND nxt IS NOT NULL
    GROUP BY 1, 2, 3
    ORDER BY step, src_channel, dst_channel
    """,
)
def q272_path_sankey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step-indexed journey flow matrix — the rollup behind a Sankey
    / flow diagram of the first three steps of every user's channel
    path: (step, from-channel, to-channel, count). q127/q215 model
    transitions position-free (a Markov chain assumes step
    invariance); the Sankey keeps POSITION, which is what reveals
    'step 1 -> 2 flows differ from 2 -> 3' — the non-Markov
    structure q266's chain attribution averages away.

    Scale: one user-keyed window pass (row_number + lead share one
    sort), a step-capped filter, and a combining agg on the bounded
    (3 x |channels|^2) grid. Nothing corpus-sized survives the agg.
    """
    e = load(spark, sf_dir, "events")
    cli = e.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        "event_id",
        (F.get_json_object("props", "$.k").cast("long") % 5)
        .cast("string")
        .alias("ch"),
    )
    wq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = cli.select(
        F.col("ch"),
        F.row_number().over(wq).alias("rn"),
        F.lead("ch").over(wq).alias("nxt"),
    )
    return (
        seq.where((F.col("rn") <= 3) & F.col("nxt").isNotNull())
        .groupBy(
            F.col("rn").cast("long").alias("step"),
            F.col("ch").alias("src_channel"),
            F.col("nxt").alias("dst_channel"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("step", "src_channel", "dst_channel")
    )


@register(
    "q274_slo_burn_rate",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0
                        END) AS BIGINT) AS bad
        FROM events GROUP BY 1
    ),
    burn AS (
        SELECT d, n, bad,
               (bad * 1.0 / n) / 0.25 AS burn_rate,
               sum(bad) OVER w * 1.0 / sum(n) OVER w / 0.25
                   AS burn_rate_7d
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT strftime(d, '%Y-%m-%d') AS day, n AS n_events, bad AS n_bad,
           round(burn_rate, 4) AS burn_rate,
           round(burn_rate_7d, 4) AS burn_rate_7d,
           CAST(burn_rate > 1.0 AS BOOLEAN) AS fast_burn,
           CAST(burn_rate_7d > 1.0 AS BOOLEAN) AS slow_burn
    FROM burn ORDER BY d
    """,
)
def q274_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLO error-budget burn rate (the SRE multi-window alert rule):
    with an error-budget of 25% of events, each day's burn rate is
    (bad fraction / budget); the 1-day rate catches FAST burns, the
    7-day rolling rate catches SLOW leaks — the two-window pattern
    that pages only when both magnitude and persistence warrant it.
    The ops-monitoring sibling of the data-drift family (q219 PSI,
    q155 CUSUM): same rollup, different contract.

    Scale: one daily combining agg; the rolling window runs on the
    calendar-bounded daily relation (q243 bounded-relation
    contract). Burn ratios are exact integer ratios scaled by the
    literal budget — rounded at 4, booleans from the unrounded
    values identically in both engines.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("bad"),
    )
    w = Window.orderBy("d").rowsBetween(-6, 0)
    burn = daily.select(
        "d",
        "n",
        "bad",
        ((F.col("bad") * 1.0 / F.col("n")) / 0.25).alias("burn_rate"),
        ((F.sum("bad").over(w) * 1.0 / F.sum("n").over(w)) / 0.25).alias(
            "burn_rate_7d"
        ),
    )
    return burn.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("n").alias("n_events"),
        F.col("bad").alias("n_bad"),
        F.round("burn_rate", 4).alias("burn_rate"),
        F.round("burn_rate_7d", 4).alias("burn_rate_7d"),
        (F.col("burn_rate") > 1.0).alias("fast_burn"),
        (F.col("burn_rate_7d") > 1.0).alias("slow_burn"),
    ).orderBy("day")


@register(
    "q285_qini_curve",
    oracle="""
    WITH pu AS (
        SELECT user_id, user_id % 2 = 1 AS treated,
               sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                        THEN value ELSE 0 END) AS score,
               max(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
                        AND event_type = 'purchase'
                        THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY 1, 2
    ),
    ranked AS (
        SELECT treated, converted,
               ntile(10) OVER (ORDER BY score DESC, user_id) AS decile
        FROM pu
    ),
    g AS (
        SELECT decile,
               CAST(sum(CASE WHEN treated THEN 1 ELSE 0 END) AS BIGINT)
                   AS nt,
               CAST(sum(CASE WHEN NOT treated THEN 1 ELSE 0 END) AS BIGINT)
                   AS nc,
               CAST(sum(CASE WHEN treated THEN converted ELSE 0
                        END) AS BIGINT) AS ct,
               CAST(sum(CASE WHEN NOT treated THEN converted ELSE 0
                        END) AS BIGINT) AS cc
        FROM ranked GROUP BY decile
    ),
    c AS (
        SELECT decile,
               sum(nt) OVER w AS cnt, sum(nc) OVER w AS cnc,
               sum(ct) OVER w AS cct, sum(cc) OVER w AS ccc
        FROM g
        WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(cnt AS BIGINT) AS cum_treated,
           CAST(cnc AS BIGINT) AS cum_control,
           CAST(cct AS BIGINT) AS cum_conv_treated,
           CAST(ccc AS BIGINT) AS cum_conv_control,
           round(cct - ccc * (cnt * 1.0 / cnc), 4) AS qini
    FROM c ORDER BY decile
    """,
)
def q285_qini_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini curve — the standard evaluation of an UPLIFT ranking:
    rank users by an uplift score (pre-period activity as the
    deterministic proxy model), cut into score-ordered deciles, and
    at each cumulative depth report incremental conversions
    vs the control baseline scaled to treated exposure
    (ct - cc * nt/nc). q240 profiles WHERE uplift lives; this grades
    a MODEL that claims to rank users by it — the uplift sibling of
    q273's gains curve, and the last piece of the uplift-modeling
    loop (decompose -> model -> validate).

    Scale: one user-keyed combining agg, the TWO-PASS descending
    ntile for the decile cut (partitioned windows only), a 10-cell
    rollup, and a bounded cumulative window (q243 contract).
    """
    from g_etl_spark.operators.ranking import global_ntile_twopass, log2_bucket

    e = load(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    pu = e.groupBy("user_id", (F.col("user_id") % 2 == 1).alias("treated")).agg(
        F.sum(F.when(F.col("ts") < cut, F.col("value")).otherwise(0.0)).alias("score"),
        F.max(
            F.when(
                (F.col("ts") >= cut) & (F.col("event_type") == "purchase"), 1
            ).otherwise(0)
        ).alias("converted"),
    )
    ranked = global_ntile_twopass(
        pu.withColumn("neg", -F.col("score")),
        10,
        ["neg", "user_id"],
        -log2_bucket(F.col("score")),
        out="decile",
    )
    g = ranked.groupBy("decile").agg(
        F.sum(F.when(F.col("treated"), 1).otherwise(0)).alias("nt"),
        F.sum(F.when(~F.col("treated"), 1).otherwise(0)).alias("nc"),
        F.sum(F.when(F.col("treated"), F.col("converted")).otherwise(0)).alias("ct"),
        F.sum(F.when(~F.col("treated"), F.col("converted")).otherwise(0)).alias("cc"),
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    c = g.select(
        "decile",
        F.sum("nt").over(w).alias("cnt"),
        F.sum("nc").over(w).alias("cnc"),
        F.sum("ct").over(w).alias("cct"),
        F.sum("cc").over(w).alias("ccc"),
    )
    return c.select(
        "decile",
        F.col("cnt").cast("long").alias("cum_treated"),
        F.col("cnc").cast("long").alias("cum_control"),
        F.col("cct").cast("long").alias("cum_conv_treated"),
        F.col("ccc").cast("long").alias("cum_conv_control"),
        F.round(
            F.col("cct") - F.col("ccc") * (F.col("cnt") * 1.0 / F.col("cnc")), 4
        ).alias("qini"),
    ).orderBy("decile")


@register(
    "q288_regression_influence",
    oracle="""
    WITH daily AS (
        SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS d,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS y
        FROM events GROUP BY 1
    ),
    m AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               sum(CAST(d AS DOUBLE)) AS sx, sum(y) AS sy,
               sum(CAST(d AS DOUBLE) * CAST(d AS DOUBLE)) AS sxx,
               sum(CAST(d AS DOUBLE) * y) AS sxy
        FROM daily
    ),
    full_fit AS (
        SELECT n, sx, sy, sxx, sxy,
               (sxy - sx * sy / n) / (sxx - sx * sx / n) AS b
        FROM m
    ),
    loo AS (
        SELECT daily.d, daily.y,
               ((f.sxy - daily.d * daily.y)
                - (f.sx - daily.d) * (f.sy - daily.y) / (f.n - 1))
               / ((f.sxx - CAST(daily.d AS DOUBLE) * daily.d)
                  - (f.sx - daily.d) * (f.sx - daily.d) / (f.n - 1)) AS b_i,
               f.b
        FROM daily, full_fit f
    )
    SELECT strftime(CAST(epoch_ms(d * 86400000) AS DATE), '%Y-%m-%d')
               AS day,
           round(y, 2) AS daily_value,
           round(b, 6) AS slope_full,
           round(b_i, 6) AS slope_without,
           round(b_i - b, 6) AS dfbeta
    FROM loo
    ORDER BY abs(b_i - b) DESC, d LIMIT 5
    """,
)
def q288_regression_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out regression influence (DFBETA) for the daily
    revenue trend: for every day, the slope the OLS fit would have
    WITHOUT that day, computed in closed form from the full fit's
    moment cells (remove the point's contributions from n, Sx, Sy,
    Sxx, Sxy — no refit, no second pass), ranked by |slope change|.
    The top rows are the days that OWN the trend — the diagnostic
    that separates 'revenue is growing' from 'one launch day is
    dragging the line' (q216's Huber downweights them; this NAMES
    them).

    Scale: one cent-quantized daily rollup, ONE moment agg broadcast
    back, then per-row closed-form arithmetic on the bounded |days|
    relation and a TakeOrdered top-5. The n-point leave-one-out
    family costs O(n) total because OLS moments are subtractable.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        F.floor(F.unix_micros("ts") / F.lit(86_400_000_000.0)).cast("long").alias("d")
    ).agg(
        (
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).cast("double")
            / 100.0
        ).alias("y")
    )
    dd = F.col("d").cast("double")
    m = daily.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dd).alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(dd * dd).alias("sxx"),
        F.sum(dd * F.col("y")).alias("sxy"),
    )
    b = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    )
    f = m.select("n", "sx", "sy", "sxx", "sxy", b.alias("b"))
    b_i = (
        (F.col("sxy") - dd * F.col("y"))
        - (F.col("sx") - F.col("d")) * (F.col("sy") - F.col("y")) / (F.col("n") - 1)
    ) / (
        (F.col("sxx") - dd * F.col("d"))
        - (F.col("sx") - F.col("d")) * (F.col("sx") - F.col("d")) / (F.col("n") - 1)
    )
    loo = daily.crossJoin(F.broadcast(f)).select(
        "d",
        "y",
        F.col("b").alias("slope_full_raw"),
        b_i.alias("b_i"),
    )
    return (
        loo.select(
            F.date_format(
                F.timestamp_millis(F.col("d") * 86_400_000).cast("date"), "yyyy-MM-dd"
            ).alias("day"),
            F.round("y", 2).alias("daily_value"),
            F.round("slope_full_raw", 6).alias("slope_full"),
            F.round("b_i", 6).alias("slope_without"),
            F.round(F.col("b_i") - F.col("slope_full_raw"), 6).alias("dfbeta"),
            F.abs(F.col("b_i") - F.col("slope_full_raw")).alias("_a"),
            F.col("d").alias("_d"),
        )
        .orderBy(F.desc("_a"), "_d")
        .limit(5)
        .drop("_a", "_d")
    )


@register(
    "q291_burstiness_index",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(count(*) AS DOUBLE) AS c
        FROM events GROUP BY 1, 2
    ),
    m AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_days,
               avg(c) AS mu,
               (sum(c * c) - sum(c) * sum(c) / count(*)) / (count(*) - 1)
                   AS vr
        FROM daily GROUP BY 1
    )
    SELECT event_type, n_days,
           round(mu, 4) AS mean_daily,
           round(vr / mu, 4) AS fano_factor,
           round((sqrt(vr) - mu) / (sqrt(vr) + mu), 6) AS burstiness
    FROM m ORDER BY event_type
    """,
)
def q291_burstiness_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overdispersion diagnostics of daily arrivals per type: the
    Fano factor (variance/mean — 1 for Poisson, >1 for clumped
    traffic) and the Goh-Barabasi burstiness B = (sigma - mu) /
    (sigma + mu) in [-1, 1] — the dispersion questions the
    correlation family (q176 ACF) cannot answer: whether load
    arrives SMOOTHLY or in BURSTS decides capacity headroom, the
    q274 budget, and whether q257's intermittent model even applies
    (Fano ~ 1 means plain Poisson forecasting is fine).

    Scale: one daily rollup, one moment agg per type — two
    map-side-combinable exchanges to a |types| relation; the
    statistics are arithmetic on those cells.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    cnt = F.count(F.lit(1))
    m = daily.groupBy("event_type").agg(
        cnt.cast("long").alias("n_days"),
        F.avg("c").alias("mu"),
        (
            (F.sum(F.col("c") * F.col("c")) - F.sum("c") * F.sum("c") / cnt)
            / (cnt - 1)
        ).alias("vr"),
    )
    return m.select(
        "event_type",
        "n_days",
        F.round("mu", 4).alias("mean_daily"),
        F.round(F.col("vr") / F.col("mu"), 4).alias("fano_factor"),
        F.round(
            (F.sqrt("vr") - F.col("mu")) / (F.sqrt("vr") + F.col("mu")), 6
        ).alias("burstiness"),
    ).orderBy("event_type")


_LB_CRIT = {  # chi-square 0.95 quantiles, df = 1..7
    1: 3.841, 2: 5.991, 3: 7.815, 4: 9.488, 5: 11.070, 6: 12.592, 7: 14.067,
}


@register(
    "q306_ljung_box_residual_acf",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS di,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS DOUBLE) / count(*) AS mu
        FROM daily
    ),
    dev AS (
        SELECT di, CAST(round((cents - m.mu) / 100.0) AS BIGINT) AS d
        FROM daily CROSS JOIN m
    ),
    ss AS (SELECT CAST(sum(d * d) AS BIGINT) AS s2 FROM dev),
    lags AS (
        SELECT k.k,
               CAST(sum(a.d * b.d) AS BIGINT) AS sk
        FROM (SELECT unnest(range(1, 8)) AS k) k
        JOIN dev a ON TRUE
        JOIN dev b ON b.di = a.di + k.k
        GROUP BY k.k
    ),
    rho AS (
        SELECT k, CAST(sk AS DOUBLE) / ss.s2 AS r
        FROM lags CROSS JOIN ss
    ),
    q AS (
        SELECT rho.k, rho.r,
               m.n * (m.n + 2)
               * sum(rho.r * rho.r / (m.n - rho.k))
                 OVER (ORDER BY rho.k ROWS UNBOUNDED PRECEDING) AS q_stat
        FROM rho CROSS JOIN m
    )
    SELECT k, round(r, 6) AS rho,
           round(q_stat, 4) AS q_stat,
           CASE k {' '.join(f"WHEN {k} THEN {v}" for k, v in _LB_CRIT.items())}
           END AS chi2_crit_95,
           q_stat > CASE k {' '.join(f"WHEN {k} THEN {v}" for k, v in _LB_CRIT.items())}
                    END AS autocorrelated
    FROM q ORDER BY k
    """,
)
def q306_ljung_box_residual_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test on the daily-revenue residuals —
    the forecast-diagnostics closure the family lacked: q176 shows
    the ACF, q190/q226 score point/quantile forecasts, but nothing
    TESTED whether residual autocorrelation is jointly significant
    (i.e. whether a forecaster left structure on the table).
    Q(h) = n(n+2) Σ_{{k≤h}} ρ̂²_k/(n−k) against the χ²_h 0.95
    critical value, for h = 1..7 over the mean-centered daily totals.
    Deviations are quantized to integer dollars before the lag
    products (the q177 cent-quantize discipline), so every ρ̂_k is a
    ratio of exact integers — engine-order-independent.

    Scale: the corpus collapses to |days| integer cells in one
    combining agg; the 7 lag products are an equi-join of that
    bounded relation against itself shifted by a broadcast 7-row lag
    set; the cumulative Q runs on a 7-row relation (the q243
    bounded-window contract). Nothing corpus-sized ever sorts.
    """
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("di")
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).cast("long").alias("cents"))
    m = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.sum("cents").cast("double") / F.count(F.lit(1))).alias("mu"),
    )
    dev = daily.crossJoin(F.broadcast(m)).select(
        "di",
        F.round((F.col("cents") - F.col("mu")) / 100.0, 0).cast("long").alias("d"),
    )
    ss = dev.agg(F.sum(F.col("d") * F.col("d")).cast("long").alias("s2"))
    ks = daily.sparkSession.range(1, 8).select(F.col("id").cast("long").alias("k"))
    a = dev.crossJoin(F.broadcast(ks))
    b = dev.select(F.col("di").alias("dib"), F.col("d").alias("db"))
    lags = (
        a.join(b, F.col("dib") == F.col("di") + F.col("k"))
        .groupBy("k")
        .agg(F.sum(F.col("d") * F.col("db")).cast("long").alias("sk"))
    )
    rho = lags.crossJoin(F.broadcast(ss)).select(
        "k", (F.col("sk").cast("double") / F.col("s2")).alias("r")
    )
    wq = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    crit = F.create_map(
        *[F.lit(x) for kv in _LB_CRIT.items() for x in kv]
    )[F.col("k").cast("int")]
    q = rho.crossJoin(F.broadcast(m)).select(
        "k",
        "r",
        (
            F.col("n")
            * (F.col("n") + 2)
            * F.sum(F.col("r") * F.col("r") / (F.col("n") - F.col("k"))).over(wq)
        ).alias("q_stat"),
    )
    return q.select(
        "k",
        F.round("r", 6).alias("rho"),
        F.round("q_stat", 4).alias("q_stat"),
        crit.alias("chi2_crit_95"),
        (F.col("q_stat") > crit).alias("autocorrelated"),
    ).orderBy("k")


_INV_INIT = 50   # opening stock per part
_INV_CAP = 100   # warehouse capacity clamp


@register(
    "q307_clamped_inventory_scan",
    oracle=f"""
    WITH RECURSIVE deltas AS (
        SELECT l_partkey AS pk,
               row_number() OVER (
                   PARTITION BY l_partkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
               ) AS rn,
               CAST(CASE WHEN l_returnflag = 'R' THEN round(l_quantity)
                         ELSE -round(l_quantity) END AS BIGINT) AS delta
        FROM lineitem
    ),
    counts AS (SELECT pk, max(rn) AS mx FROM deltas GROUP BY pk),
    walk(pk, rn, bal, st, ch) AS (
        SELECT pk, CAST(0 AS BIGINT), CAST({_INV_INIT} AS BIGINT),
               CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        FROM counts
        UNION ALL
        SELECT w.pk, w.rn + 1,
               greatest(least(w.bal + s.delta, {_INV_CAP}), 0),
               w.st + CASE WHEN w.bal + s.delta < 0 THEN 1 ELSE 0 END,
               w.ch + CASE WHEN w.bal + s.delta > {_INV_CAP} THEN 1 ELSE 0 END
        FROM walk w JOIN deltas s ON s.pk = w.pk AND s.rn = w.rn + 1
    )
    SELECT w.pk AS l_partkey, w.bal AS final_balance,
           w.st AS n_stockouts, w.ch AS n_caphits
    FROM walk w JOIN counts c ON w.pk = c.pk AND w.rn = c.mx
    ORDER BY l_partkey
    """,
)
def q307_clamped_inventory_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clamped running inventory balance per part — the
    NON-ASSOCIATIVE scan class (balance_t = clamp(balance_{{t-1}} +
    delta_t, 0, cap)) that plain window SUM cannot express because
    every clamp event resets the linear recurrence: returns restock
    (+qty), shipments draw down (−qty), the balance saturates at
    [0, cap], and stockout/cap-hit events are counted as they happen.
    Runs as one JVM F.aggregate fold over each part's
    shipdate-ordered delta array (the q206/q237 recurrence recipe
    with a STRUCT accumulator), against a recursive-CTE oracle.

    Scale: one shuffle groups deltas per part; each fold is local and
    sequential — which is fine, because clamp-scan functions
    x ↦ min(max(x+a, lo), hi) COMPOSE associatively (each composite
    is again shift+floor+ceiling, 3 numbers), so a part whose history
    outgrows one task splits into blocks whose composed (a, lo, hi)
    triples combine in a tree — the parallel-scan path documented
    here and unit-testable against this exact fold. Balances are
    integer units; no float enters the recurrence.
    """
    li = load(spark, sf_dir, "lineitem")
    delta = F.when(
        F.col("l_returnflag") == "R", F.round(F.col("l_quantity"), 0)
    ).otherwise(-F.round(F.col("l_quantity"), 0)).cast("long")
    rows = li.select(
        F.col("l_partkey"),
        F.struct(
            F.col("l_shipdate"), F.col("l_orderkey"), F.col("l_linenumber"), delta.alias("delta")
        ).alias("s"),
    )
    seqs = rows.groupBy("l_partkey").agg(
        F.sort_array(F.collect_list("s")).alias("seq")
    )
    init = F.expr(
        f"named_struct('bal', CAST({_INV_INIT} AS BIGINT),"
        " 'st', CAST(0 AS BIGINT), 'ch', CAST(0 AS BIGINT))"
    )
    folded = seqs.select(
        "l_partkey",
        F.aggregate(
            F.col("seq"),
            init,
            lambda acc, x: F.struct(
                F.greatest(
                    F.least(acc["bal"] + x["delta"], F.lit(_INV_CAP).cast("long")),
                    F.lit(0).cast("long"),
                ).alias("bal"),
                (
                    acc["st"]
                    + F.when(acc["bal"] + x["delta"] < 0, 1).otherwise(0)
                ).cast("long").alias("st"),
                (
                    acc["ch"]
                    + F.when(acc["bal"] + x["delta"] > _INV_CAP, 1).otherwise(0)
                ).cast("long").alias("ch"),
            ),
        ).alias("f"),
    )
    return folded.select(
        "l_partkey",
        F.col("f.bal").alias("final_balance"),
        F.col("f.st").alias("n_stockouts"),
        F.col("f.ch").alias("n_caphits"),
    ).orderBy("l_partkey")


@register(
    "q316_cross_correlation_leadlag",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS di,
               CAST(sum(CASE WHEN event_type = 'view'
                             THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS a_c,
               CAST(sum(CASE WHEN event_type = 'purchase'
                             THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS b_c
        FROM events GROUP BY 1
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(a_c) AS DOUBLE) / count(*) AS ma,
               CAST(sum(b_c) AS DOUBLE) / count(*) AS mb
        FROM daily
    ),
    dev AS (
        SELECT di,
               CAST(round((a_c - m.ma) / 100.0) AS BIGINT) AS da,
               CAST(round((b_c - m.mb) / 100.0) AS BIGINT) AS db
        FROM daily CROSS JOIN m
    ),
    ss AS (
        SELECT CAST(sum(da * da) AS BIGINT) AS sa,
               CAST(sum(db * db) AS BIGINT) AS sb
        FROM dev
    ),
    lags AS (
        SELECT k.k, CAST(sum(a.da * b.db) AS BIGINT) AS sk
        FROM (SELECT unnest(range(-3, 4)) AS k) k
        JOIN dev a ON TRUE
        JOIN dev b ON b.di = a.di + k.k
        GROUP BY k.k
    ),
    r AS (
        SELECT k, round(CAST(sk AS DOUBLE) / sqrt(CAST(sa AS DOUBLE) * sb), 6)
                   AS xcorr
        FROM lags CROSS JOIN ss
    ),
    best AS (
        SELECT k AS best_lag FROM r
        ORDER BY abs(xcorr) DESC, k ASC LIMIT 1
    )
    SELECT r.k AS lag, r.xcorr, best.best_lag
    FROM r CROSS JOIN best
    ORDER BY lag
    """,
)
def q316_cross_correlation_leadlag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function between the daily 'view' and
    'purchase' value series at lags −3..+3 — the LEAD-LAG detector
    completing q176's autocorrelation and q306's Ljung-Box: a peak
    at positive lag k means views PRECEDE purchases by k days (the
    attribution-window evidence q255's decay constant assumes).
    Deviations are mean-centered and quantized to integer dollars
    before the lag products (q306's discipline), so every
    correlation is a ratio of exact integers; best_lag breaks |r|
    ties toward the smallest lag.

    Scale: the corpus collapses to |days| two-column cells in one
    combining agg; the 7 lag products are an equi-join of that
    bounded relation against itself shifted by a broadcast lag set.
    The CCF at 100 TB costs one scan plus |days|×7 arithmetic.
    """
    e = load(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    daily = e.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("di")
    ).agg(
        F.sum(F.when(F.col("event_type") == "view", cents).otherwise(0))
        .cast("long")
        .alias("a_c"),
        F.sum(F.when(F.col("event_type") == "purchase", cents).otherwise(0))
        .cast("long")
        .alias("b_c"),
    )
    m = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.sum("a_c").cast("double") / F.count(F.lit(1))).alias("ma"),
        (F.sum("b_c").cast("double") / F.count(F.lit(1))).alias("mb"),
    )
    dev = daily.crossJoin(F.broadcast(m)).select(
        "di",
        F.round((F.col("a_c") - F.col("ma")) / 100.0, 0).cast("long").alias("da"),
        F.round((F.col("b_c") - F.col("mb")) / 100.0, 0).cast("long").alias("db"),
    )
    ss = dev.agg(
        F.sum(F.col("da") * F.col("da")).cast("long").alias("sa"),
        F.sum(F.col("db") * F.col("db")).cast("long").alias("sb"),
    )
    ks = daily.sparkSession.range(-3, 4).select(F.col("id").cast("long").alias("k"))
    b = dev.select(F.col("di").alias("dib"), F.col("db").alias("dbb"))
    lags = (
        dev.crossJoin(F.broadcast(ks))
        .join(b, F.col("dib") == F.col("di") + F.col("k"))
        .groupBy("k")
        .agg(F.sum(F.col("da") * F.col("dbb")).cast("long").alias("sk"))
    )
    r = lags.crossJoin(F.broadcast(ss)).select(
        "k",
        F.round(
            F.col("sk").cast("double")
            / F.sqrt(F.col("sa").cast("double") * F.col("sb")),
            6,
        ).alias("xcorr"),
    )
    best = r.orderBy(F.abs(F.col("xcorr")).desc(), F.asc("k")).limit(1).select(
        F.col("k").alias("best_lag")
    )
    return (
        r.crossJoin(F.broadcast(best))
        .select(F.col("k").alias("lag"), "xcorr", "best_lag")
        .orderBy("lag")
    )


@register(
    "q324_time_weighted_average",
    oracle="""
    WITH seq AS (
        SELECT user_id,
               CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT)
                   AS day,
               epoch_us(ts) AS t_us,
               CAST(round(value * 100) AS BIGINT) AS cents,
               lead(epoch_us(ts)) OVER (
                   PARTITION BY user_id, CAST(ts AS DATE)
                   ORDER BY ts, event_id
               ) AS next_us
        FROM events
    ),
    segs AS (
        SELECT user_id, day,
               CAST(sum(cents * (next_us - t_us)) AS BIGINT) AS wsum,
               CAST(sum(next_us - t_us) AS BIGINT) AS dur,
               CAST(count(*) AS BIGINT) + 1 AS n_events
        FROM seq WHERE next_us IS NOT NULL
        GROUP BY user_id, day
    )
    SELECT user_id, day, n_events,
           round(CAST(wsum AS DOUBLE) / dur / 100.0, 4) AS twap,
           round(dur / 3600000000.0, 4) AS span_hours
    FROM segs
    WHERE dur > 0
    ORDER BY user_id, day
    """,
)
def q324_time_weighted_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value (TWAP) per user-day — the step-
    function integral ∫v dt / ∫dt that plain AVG gets WRONG on
    irregularly-sampled observations (a value held for 6 hours must
    weigh 360x one held for a minute — the financial TWAP / metrics
    time-in-state convention; q125's EWMA weights by recency, this
    weighs by DURATION). Each observation holds until the next one
    in the same user-day; weights are integer microsecond durations
    times integer cents (engine-exact products), so the only double
    is the final division. Single-event days carry no interval and
    drop out (dur > 0 guard).

    Scale: ONE user/day-keyed exchange produces all hold intervals
    (a lead() window, PARTITIONED — never global), then one
    combining agg per user-day. This is the as-of/session family's
    physical shape (q36/q213) pointed at weighted means; at 100 TB
    the exchange partition-prunes on a date-partitioned log.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", F.col("ts").cast("date")).orderBy(
        "ts", "event_id"
    )
    seq = e.select(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("day"),
        F.unix_micros("ts").alias("t_us"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        F.lead(F.unix_micros("ts")).over(w).alias("next_us"),
    )
    segs = (
        seq.filter(F.col("next_us").isNotNull())
        .groupBy("user_id", "day")
        .agg(
            F.sum(F.col("cents") * (F.col("next_us") - F.col("t_us")))
            .cast("long")
            .alias("wsum"),
            F.sum(F.col("next_us") - F.col("t_us")).cast("long").alias("dur"),
            (F.count(F.lit(1)) + 1).cast("long").alias("n_events"),
        )
    )
    return (
        segs.filter(F.col("dur") > 0)
        .select(
            "user_id",
            "day",
            "n_events",
            F.round(F.col("wsum").cast("double") / F.col("dur") / 100.0, 4).alias(
                "twap"
            ),
            F.round(F.col("dur") / 3600000000.0, 4).alias("span_hours"),
        )
        .orderBy("user_id", "day")
    )


_PH_DELTA_M = 10_000   # drift allowance per step, milli-cents (10 cents)
_PH_LAMBDA_M = 2_500_000  # alarm threshold, milli-cents (2500 cents)
_PH_BURN_IN = 5        # steps before the alarm may fire (running-mean warm-up)


@register(
    "q334_page_hinkley_drift",
    oracle=f"""
    WITH RECURSIVE daily AS (
        SELECT event_type,
               CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS di,
               CAST(round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                          / count(*)) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    ),
    seq AS (
        SELECT event_type, x,
               row_number() OVER (PARTITION BY event_type ORDER BY di) AS rn
        FROM daily
    ),
    counts AS (SELECT event_type, max(rn) AS mx FROM seq GROUP BY 1),
    walk(event_type, rn, s, u, umin, phmax, alarm) AS (
        SELECT event_type, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
               CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
               CAST(0 AS BIGINT)
        FROM counts
        UNION ALL
        SELECT w.event_type, w.rn + 1, w.s + q.x,
               w.u + q.x * 1000
                   - CAST(round(1000.0 * (w.s + q.x) / (w.rn + 1)) AS BIGINT)
                   - {_PH_DELTA_M},
               least(w.umin,
                     w.u + q.x * 1000
                         - CAST(round(1000.0 * (w.s + q.x) / (w.rn + 1)) AS BIGINT)
                         - {_PH_DELTA_M}),
               greatest(w.phmax,
                        w.u + q.x * 1000
                            - CAST(round(1000.0 * (w.s + q.x) / (w.rn + 1)) AS BIGINT)
                            - {_PH_DELTA_M}
                        - least(w.umin,
                                w.u + q.x * 1000
                                    - CAST(round(1000.0 * (w.s + q.x) / (w.rn + 1)) AS BIGINT)
                                    - {_PH_DELTA_M})),
               CASE WHEN w.alarm > 0 THEN w.alarm
                    WHEN w.rn + 1 > {_PH_BURN_IN}
                     AND w.u + q.x * 1000
                             - CAST(round(1000.0 * (w.s + q.x) / (w.rn + 1)) AS BIGINT)
                             - {_PH_DELTA_M}
                         - least(w.umin,
                                 w.u + q.x * 1000
                                     - CAST(round(1000.0 * (w.s + q.x) / (w.rn + 1)) AS BIGINT)
                                     - {_PH_DELTA_M})
                         > {_PH_LAMBDA_M}
                    THEN w.rn + 1 ELSE 0 END
        FROM walk w JOIN seq q ON q.event_type = w.event_type
                              AND q.rn = w.rn + 1
    ),
    final AS (
        SELECT w.event_type AS et, w.rn, w.u, w.umin, w.phmax, w.alarm
        FROM walk w JOIN counts c ON w.event_type = c.event_type
                                 AND w.rn = c.mx
    )
    SELECT et AS event_type, rn AS n_days,
           round((u - umin) / 1000.0, 3) AS ph_stat_cents,
           round(phmax / 1000.0, 3) AS ph_max_cents,
           alarm AS first_alarm_day,
           alarm > 0 AS drifted
    FROM final
    ORDER BY event_type
    """,
)
def q334_page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley drift detection over each event type's daily mean
    value — the SEQUENTIAL mean-shift monitor the streaming-ML
    literature runs on model inputs (CUSUM q155 detects level shifts
    against a FIXED baseline; Page-Hinkley tracks the RUNNING mean,
    so slow drift and late-onset shifts both register): per day t,
    U_t = U_(t-1) + (x_t − x̄_t − δ) with x̄_t the running mean, and
    the statistic PH_t = U_t − min_(i≤t) U_i alarms when it exceeds
    λ. Output per type: final and max PH (cents), the first alarm
    day (0 = never; suppressed for a 5-day burn-in while the running
    mean warms up), and the drift verdict.

    The recurrence is non-associative (running mean + running min),
    so it runs as the q206/q237/q307 JVM F.aggregate fold over the
    day-ordered value array with a STRUCT accumulator, against a
    recursive-CTE oracle that replays the identical walk. Every step
    quantizes the running-mean term to integer MILLI-cents
    (round(1000·s/i)) before it enters the state, so both engines
    carry identical integers — no float accumulates.

    Scale: the fold runs on the |types| × |days| daily rollup (one
    combining agg collapses the corpus), each type's walk is local
    and bounded by the calendar, and the daily relation is the only
    shuffle. The 100 TB cost is the rollup scan, as with every
    monitor in this family.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("di"),
    ).agg(
        F.round(
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).cast("double")
            / F.count(F.lit(1)),
            0,
        )
        .cast("long")
        .alias("x")
    )
    seqs = daily.select(
        "event_type", F.struct("di", "x").alias("s")
    ).groupBy("event_type").agg(F.sort_array(F.collect_list("s")).alias("seq"))
    init = F.expr(
        "named_struct('i', CAST(0 AS BIGINT), 's', CAST(0 AS BIGINT),"
        " 'u', CAST(0 AS BIGINT), 'umin', CAST(0 AS BIGINT),"
        " 'phmax', CAST(0 AS BIGINT), 'alarm', CAST(0 AS BIGINT))"
    )

    def step(acc, row):
        i = acc["i"] + 1
        s = acc["s"] + row["x"]
        u = (
            acc["u"]
            + row["x"] * 1000
            - F.round(1000.0 * s.cast("double") / i, 0).cast("long")
            - F.lit(_PH_DELTA_M).cast("long")
        )
        umin = F.least(acc["umin"], u)
        ph = u - umin
        return F.struct(
            i.cast("long").alias("i"),
            s.cast("long").alias("s"),
            u.cast("long").alias("u"),
            umin.cast("long").alias("umin"),
            F.greatest(acc["phmax"], ph).cast("long").alias("phmax"),
            F.when(acc["alarm"] > 0, acc["alarm"])
            .when((i > _PH_BURN_IN) & (ph > _PH_LAMBDA_M), i)
            .otherwise(F.lit(0))
            .cast("long")
            .alias("alarm"),
        )

    folded = seqs.select(
        "event_type", F.aggregate(F.col("seq"), init, step).alias("f")
    )
    return folded.select(
        "event_type",
        F.col("f.i").alias("n_days"),
        F.round((F.col("f.u") - F.col("f.umin")) / 1000.0, 3).alias("ph_stat_cents"),
        F.round(F.col("f.phmax") / 1000.0, 3).alias("ph_max_cents"),
        F.col("f.alarm").alias("first_alarm_day"),
        (F.col("f.alarm") > 0).alias("drifted"),
    ).orderBy("event_type")


_CHURN_K = 20


@register(
    "q341_topk_churn",
    oracle=f"""
    WITH split AS (
        SELECT user_id,
               CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16' THEN 0 ELSE 1 END AS half
        FROM events
    ),
    act AS (
        SELECT half, user_id, CAST(count(*) AS BIGINT) AS n
        FROM split GROUP BY half, user_id
    ),
    ranked AS (
        SELECT half, user_id, n,
               row_number() OVER (PARTITION BY half
                                  ORDER BY n DESC, user_id) AS r
        FROM act
    ),
    tops AS (SELECT half, user_id, r FROM ranked WHERE r <= {_CHURN_K}),
    a AS (SELECT user_id, r AS ra FROM tops WHERE half = 0),
    b AS (SELECT user_id, r AS rb FROM tops WHERE half = 1),
    j AS (SELECT a.user_id, a.ra, b.rb
          FROM a FULL OUTER JOIN b ON a.user_id = b.user_id)
    SELECT CAST({_CHURN_K} AS BIGINT) AS k,
           CAST(count(CASE WHEN ra IS NOT NULL AND rb IS NOT NULL THEN 1 END)
                AS BIGINT) AS n_stayed,
           CAST(count(CASE WHEN ra IS NULL THEN 1 END) AS BIGINT) AS n_entered,
           CAST(count(CASE WHEN rb IS NULL THEN 1 END) AS BIGINT) AS n_exited,
           round(CAST(count(CASE WHEN ra IS NOT NULL AND rb IS NOT NULL
                            THEN 1 END) AS DOUBLE)
                 / count(*), 4) AS jaccard,
           round(avg(CASE WHEN ra IS NOT NULL AND rb IS NOT NULL
                          THEN CAST(abs(ra - rb) AS DOUBLE) END), 4)
               AS mean_abs_rank_shift
    FROM j
    """,
)
def q341_topk_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k leaderboard churn between the two halves of the event
    window — the monitoring readout behind "did our heavy hitters
    change": rank users by activity in each half (deterministic
    count-desc/id tiebreak), then measure how the top-20 sets moved —
    stayed/entered/exited counts, the Jaccard of the two sets, and
    the mean absolute rank displacement of the members that stayed.
    A stable system churns slowly; a sudden low Jaccard is the alarm
    that routes to q109's drift and q151's anomaly views (the
    heavy-hitter SETS q204/q120 extract per window, compared ACROSS
    windows).

    Scale: per-half activity is a combining rollup to |users| cells;
    the ranking window partitions by half over that collapsed
    relation; the top-k join is k × k. Nothing corpus-sized sorts —
    and at true 100 TB the per-half rollup is where a Misra-Gries
    pass (q204) would pre-filter candidates before exact ranking.
    """
    e = load(spark, sf_dir, "events")
    split = e.select(
        "user_id",
        F.when(F.col("ts").cast("date") < F.lit("2024-01-16").cast("date"), 0)
        .otherwise(1)
        .alias("half"),
    )
    act = split.groupBy("half", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy("half").orderBy(F.desc("n"), F.asc("user_id"))
    tops = act.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= _CHURN_K
    )
    a = tops.filter(F.col("half") == 0).select(
        F.col("user_id").alias("ua"), F.col("r").alias("ra")
    )
    b = tops.filter(F.col("half") == 1).select(
        F.col("user_id").alias("ub"), F.col("r").alias("rb")
    )
    j = a.join(b, a["ua"] == b["ub"], "full")
    stayed = F.col("ra").isNotNull() & F.col("rb").isNotNull()
    return j.agg(
        F.lit(_CHURN_K).cast("long").alias("k"),
        F.count(F.when(stayed, 1)).cast("long").alias("n_stayed"),
        F.count(F.when(F.col("ra").isNull(), 1)).cast("long").alias("n_entered"),
        F.count(F.when(F.col("rb").isNull(), 1)).cast("long").alias("n_exited"),
        F.round(
            F.count(F.when(stayed, 1)).cast("double") / F.count(F.lit(1)), 4
        ).alias("jaccard"),
        F.round(
            F.avg(F.when(stayed, F.abs(F.col("ra") - F.col("rb")).cast("double"))),
            4,
        ).alias("mean_abs_rank_shift"),
    )


@register(
    "q342_session_entropy_rate",
    oracle="""
    WITH gaps AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts, event_id, event_type,
               sum(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS session_id
        FROM gaps
    ),
    trans AS (
        SELECT event_type AS src,
               lead(event_type) OVER (PARTITION BY user_id, session_id
                                      ORDER BY ts, event_id) AS dst
        FROM sess
    ),
    counts AS (
        SELECT src, dst, CAST(count(*) AS BIGINT) AS n
        FROM trans WHERE dst IS NOT NULL GROUP BY src, dst
    ),
    tot AS (SELECT src, CAST(sum(n) AS BIGINT) AS n_src FROM counts GROUP BY src),
    terms AS (
        SELECT c.src, t.n_src,
               CAST(round(1000000.0 * c.n / t.n_src
                          * ln(CAST(t.n_src AS DOUBLE) / c.n)) AS BIGINT)
                   AS t_micro
        FROM counts c JOIN tot t ON c.src = t.src
    ),
    per_src AS (
        SELECT src, CAST(max(n_src) AS BIGINT) AS n_trans,
               CAST(sum(t_micro) AS BIGINT) AS h_micro
        FROM terms GROUP BY src
    ),
    grand AS (SELECT CAST(sum(n_trans) AS BIGINT) AS n_all FROM per_src),
    overall AS (
        SELECT '__rate__' AS state, grand.n_all AS n_trans,
               CAST(sum(CAST(round(CAST(h_micro AS DOUBLE) * n_trans
                                   / grand.n_all) AS BIGINT)) AS BIGINT)
                   AS h_micro
        FROM per_src CROSS JOIN grand
        GROUP BY grand.n_all
    )
    SELECT state, n_trans,
           round(h_micro / 1000000.0, 6) AS entropy_nats,
           round(exp(h_micro / 1000000.0), 4) AS perplexity
    FROM (
        SELECT src AS state, n_trans, h_micro FROM per_src
        UNION ALL
        SELECT state, n_trans, h_micro FROM overall
    )
    ORDER BY state
    """,
)
def q342_session_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the session Markov chain — the PREDICTABILITY
    closure of the journey family (q127 estimates the transition
    matrix, q215 its steady state, q186 backtests next-event
    accuracy; this single number says how predictable the journeys
    are at all): per source state, the conditional next-event entropy
    H(dst|src) = Σ p·ln(1/p) and its perplexity (effective branching
    factor), plus the plug-in entropy rate Σ π̂_src·H(dst|src) under
    the empirical state frequencies as the '__rate__' row. An
    entropy rate near ln(k) means journeys are noise (personalization
    has nothing to learn); near 0 means deterministic funnels.

    Per-transition entropy terms are quantized to integer micro-nats
    before the per-state sum, and each state's rate contribution is
    quantized before the cross-state sum (the q300/q330 discipline,
    applied at both levels), so the output is engine-order-exact.

    Scale: one sessionize+lead shuffle (shared, as in q127), one
    combining count to |types|² cells, then arithmetic on that
    bounded relation — the entropy rate of 100 TB of journeys costs
    one corpus scan.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    sess = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0),
    ).withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ws = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    trans = sess.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(ws).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    counts = trans.groupBy("src", "dst").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = counts.groupBy("src").agg(F.sum("n").cast("long").alias("n_src"))
    terms = counts.join(tot, "src").select(
        "src",
        "n_src",
        F.round(
            F.lit(1e6)
            * F.col("n")
            / F.col("n_src")
            * F.log(F.col("n_src").cast("double") / F.col("n")),
            0,
        )
        .cast("long")
        .alias("t_micro"),
    )
    per_src = terms.groupBy("src").agg(
        F.max("n_src").cast("long").alias("n_trans"),
        F.sum("t_micro").cast("long").alias("h_micro"),
    )
    grand = per_src.agg(F.sum("n_trans").cast("long").alias("n_all"))
    overall = (
        per_src.crossJoin(F.broadcast(grand))
        .groupBy("n_all")
        .agg(
            F.sum(
                F.round(
                    F.col("h_micro").cast("double") * F.col("n_trans") / F.col("n_all"),
                    0,
                ).cast("long")
            )
            .cast("long")
            .alias("h_micro")
        )
        .select(
            F.lit("__rate__").alias("state"),
            F.col("n_all").alias("n_trans"),
            "h_micro",
        )
    )
    both = per_src.select(
        F.col("src").alias("state"), "n_trans", "h_micro"
    ).unionByName(overall)
    return both.select(
        "state",
        "n_trans",
        F.round(F.col("h_micro") / 1e6, 6).alias("entropy_nats"),
        F.round(F.exp(F.col("h_micro") / 1e6), 4).alias("perplexity"),
    ).orderBy("state")


@register(
    "q344_user_growth_accounting",
    oracle="""
    WITH firsts AS (
        SELECT user_id, CAST(min(ts) AS DATE) AS first_day
        FROM events GROUP BY user_id
    ),
    daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_active_users
        FROM events GROUP BY 1
    ),
    news AS (
        SELECT first_day AS day, CAST(count(*) AS BIGINT) AS n_new_users
        FROM firsts GROUP BY 1
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           d.n_events, d.n_active_users,
           coalesce(n.n_new_users, 0) AS n_new_users,
           CAST(sum(coalesce(n.n_new_users, 0))
                OVER (ORDER BY d.day) AS BIGINT) AS cum_users,
           round(CAST(coalesce(n.n_new_users, 0) AS DOUBLE)
                 / d.n_active_users, 4) AS new_user_share
    FROM daily d LEFT JOIN news n ON d.day = n.day
    ORDER BY day
    """,
)
def q344_user_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily user-growth accounting — the acquisition curve every
    product review starts from (q140's cohort retention slices the
    SAME first-seen fact by cohort; this is its calendar view): per
    day, events, active users, NEW users (first-ever-seen that day),
    the cumulative user base, and the new-user share of actives (a
    rising share means growth, a falling one means the base is
    maturing — the context q147's DAU/WAU needs to be read in).

    Scale: first-seen is ONE combining min per user (the q140 fact);
    daily activity is one combining agg to |days| cells; the
    cumulative sum runs on the bounded calendar relation (the q243
    bounded-window contract — at an unbounded calendar the
    operators/ranking two-pass is the swap-in, as everywhere).
    Day strings are formatted identically in both engines (no raw
    timestamps cross the compare).
    """
    e = load(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("first_day")
    )
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_active_users"),
    )
    news = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    joined = daily.join(news, "day", "left").select(
        "day",
        "n_events",
        "n_active_users",
        F.coalesce("n_new_users", F.lit(0)).alias("n_new_users"),
    )
    return joined.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_events",
        "n_active_users",
        "n_new_users",
        F.sum("n_new_users").over(w).cast("long").alias("cum_users"),
        F.round(
            F.col("n_new_users").cast("double") / F.col("n_active_users"), 4
        ).alias("new_user_share"),
    ).orderBy("day")


def _q346_oracle() -> str:
    """q346 oracle: the same exact-Shapley computation — per-user
    pre-conversion channel bitmask, coalition value v(S) = converting
    users whose touched set ⊆ S, and the 4-channel Shapley sum with
    factorial weights in integer 24ths (4! = 24), so every phi is an
    exact integer before the final division."""
    return """
    WITH conv AS (
        SELECT user_id, min(ts) AS pts
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    touched AS (
        SELECT e.user_id,
               max(CASE WHEN e.event_type = 'view'   THEN 1 ELSE 0 END) AS bv,
               max(CASE WHEN e.event_type = 'click'  THEN 2 ELSE 0 END) AS bc,
               max(CASE WHEN e.event_type = 'signup' THEN 4 ELSE 0 END) AS bs,
               max(CASE WHEN e.event_type = 'error'  THEN 8 ELSE 0 END) AS be
        FROM events e JOIN conv c USING (user_id)
        WHERE e.ts < c.pts
        GROUP BY e.user_id
    ),
    masks AS (
        SELECT coalesce(t.bv + t.bc + t.bs + t.be, 0) AS mask,
               count(*) AS n
        FROM conv c LEFT JOIN touched t USING (user_id)
        GROUP BY 1
    ),
    subsets AS (SELECT unnest(range(0, 16)) AS s),
    v AS (
        SELECT s.s,
               coalesce(sum(CASE WHEN (m.mask & xor(15, s.s)) = 0
                                 THEN m.n ELSE 0 END), 0) AS v
        FROM subsets s CROSS JOIN masks m
        GROUP BY s.s
    ),
    chans AS (
        SELECT unnest([0, 1, 2, 3]) AS ci,
               unnest(['view', 'click', 'signup', 'error']) AS channel
    ),
    sh AS (
        SELECT c.ci, c.channel,
               CAST(sum(CASE bit_count(vs.s)
                        WHEN 0 THEN 6 WHEN 1 THEN 2
                        WHEN 2 THEN 2 ELSE 6 END
                        * (vi.v - vs.v)) AS BIGINT) AS phi_24
        FROM chans c
        JOIN v vs ON (vs.s & (1 << c.ci)) = 0
        JOIN v vi ON vi.s = (vs.s | (1 << c.ci))
        GROUP BY c.ci, c.channel
    ),
    tot AS (SELECT sum(phi_24) AS t FROM sh)
    SELECT channel, phi_24,
           round(phi_24 / 24.0, 4) AS shapley_conversions,
           round(CASE WHEN tot.t > 0
                      THEN phi_24 / CAST(tot.t AS DOUBLE) ELSE 0.0 END,
                 6) AS share
    FROM sh CROSS JOIN tot
    ORDER BY channel
    """


@register("q346_shapley_attribution", oracle=_q346_oracle())
def q346_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value channel attribution over the four
    non-purchase channels — the game-theoretic closure of the
    attribution family (q154 last-touch, q246 positional, q255
    time-decay, q266 Markov removal effect): v(S) counts converting
    users whose pre-conversion channel set ⊆ S, and each channel's
    Shapley value averages its marginal contribution over all
    orderings. With 4 channels the factorial weights |S|!(3−|S|)!
    are the integers 6/2/2/6 over 4! = 24, so every phi is an EXACT
    integer in 24ths before display division — no sampling, no
    permutation Monte Carlo, engine-identical. Monotone coalition
    values (v(S) ⊆-monotone by construction) make every phi ≥ 0;
    efficiency (Σ phi = v(N) − v(∅)) is pinned by test.

    Scale: one corpus pass to per-user bitmasks, ONE combining agg to
    the ≤16-row mask rollup; everything after (the 16-subset value
    table, 4×8 marginal sum) is arithmetic on bounded literals. The
    channel set is fixed; 100 TB costs the two corpus exchanges only.
    """
    e = load(spark, sf_dir, "events")
    conv = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("pts"))
    )
    touched = (
        e.join(conv, "user_id")
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
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    subsets = spark.range(16).select(F.col("id").cast("int").alias("s"))
    # masks is ≤16 rows by construction (4-bit key) — bounded broadcast
    v = (
        subsets.crossJoin(F.broadcast(masks))
        .groupBy("s")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.expr("(mask & (15 ^ s)) = 0"), F.col("n")
                    ).otherwise(F.lit(0).cast("long"))
                ),
                F.lit(0).cast("long"),
            ).alias("v")
        )
    )
    chans = spark.createDataFrame(
        [(0, "view"), (1, "click"), (2, "signup"), (3, "error")],
        "ci int, channel string",
    )
    vs = v.select(F.col("s").alias("s0"), F.col("v").alias("v0"))
    vi = v.select(F.col("s").alias("s1"), F.col("v").alias("v1"))
    w24 = (
        F.when(F.bit_count(F.col("s0")) == 0, 6)
        .when(F.bit_count(F.col("s0")) == 1, 2)
        .when(F.bit_count(F.col("s0")) == 2, 2)
        .otherwise(6)
    )
    sh = (
        chans.join(F.broadcast(vs), F.expr("(s0 & shiftleft(1, ci)) = 0"))
        .join(F.broadcast(vi), F.expr("s1 = (s0 | shiftleft(1, ci))"))
        .groupBy("ci", "channel")
        .agg(
            F.sum(w24 * (F.col("v1") - F.col("v0"))).cast("long").alias("phi_24")
        )
    )
    tot = sh.agg(F.sum("phi_24").alias("t"))
    return (
        sh.crossJoin(F.broadcast(tot))
        .select(
            "channel",
            "phi_24",
            F.round(F.col("phi_24") / 24.0, 4).alias("shapley_conversions"),
            F.round(
                F.when(
                    F.col("t") > 0,
                    F.col("phi_24") / F.col("t").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("share"),
        )
        .orderBy("channel")
    )


@register(
    "q348_mann_kendall_trend",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(ts AS DATE) AS day,
               CAST(round(sum(value) * 100) AS BIGINT) AS cents
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    s AS (
        SELECT a.event_type,
               CAST(sum(CASE WHEN b.cents > a.cents THEN 1
                             WHEN b.cents < a.cents THEN -1
                             ELSE 0 END) AS BIGINT) AS s_stat
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.day < b.day
        GROUP BY a.event_type
    ),
    nn AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n
        FROM daily GROUP BY event_type
    ),
    ties AS (
        SELECT event_type,
               CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
                   AS tie_term
        FROM (SELECT event_type, cents, count(*) AS t
              FROM daily GROUP BY event_type, cents)
        WHERE t > 1
        GROUP BY event_type
    )
    SELECT s.event_type, nn.n AS n_days, s.s_stat,
           round((nn.n * (nn.n - 1) * (2 * nn.n + 5)
                  - coalesce(ties.tie_term, 0)) / 18.0, 6) AS var_s,
           round(CASE WHEN s.s_stat > 0 THEN (s.s_stat - 1)
                      WHEN s.s_stat < 0 THEN (s.s_stat + 1)
                      ELSE 0 END
                 / sqrt((nn.n * (nn.n - 1) * (2 * nn.n + 5)
                         - coalesce(ties.tie_term, 0)) / 18.0), 4) AS z,
           CASE WHEN abs(CASE WHEN s.s_stat > 0 THEN (s.s_stat - 1)
                              WHEN s.s_stat < 0 THEN (s.s_stat + 1)
                              ELSE 0 END
                         / sqrt((nn.n * (nn.n - 1) * (2 * nn.n + 5)
                                 - coalesce(ties.tie_term, 0)) / 18.0)) > 1.96
                THEN CASE WHEN s.s_stat > 0 THEN 'increasing'
                          ELSE 'decreasing' END
                ELSE 'no_trend' END AS verdict
    FROM s JOIN nn USING (event_type)
    LEFT JOIN ties USING (event_type)
    ORDER BY event_type
    """,
)
def q348_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall non-parametric trend test per event type over the
    daily revenue series — the hypothesis-test companion of q166's
    Theil-Sen slope (same pairwise skeleton; Theil-Sen estimates the
    magnitude, Mann-Kendall decides significance without assuming
    normality or linearity): S = Σ_{i<j} sign(x_j − x_i), exact
    integer; Var(S) with the standard tie correction
    Σ t(t−1)(2t+5) over tie groups (exact integers — the series is
    cent-quantized first); z continuity-corrected by ∓1.

    Scale: ONE corpus exchange to the |types|×|days| rollup; the
    pairwise join is |days|² per type on that bounded relation (q166
    precedent) and the tie rollup is a second bounded agg. Verdict
    thresholds at z = 1.96 (two-sided 5%).
    """
    e = load(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.round(F.sum("value") * 100, 0).cast("long").alias("cents"))
    )
    a = daily.select("event_type", F.col("day").alias("da"), F.col("cents").alias("ca"))
    b = daily.select(
        F.col("event_type").alias("et_b"),
        F.col("day").alias("db"),
        F.col("cents").alias("cb"),
    )
    s = (
        a.join(b, (F.col("event_type") == F.col("et_b")) & (F.col("da") < F.col("db")))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("cb") > F.col("ca"), 1)
                .when(F.col("cb") < F.col("ca"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    nn = daily.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))
    ties = (
        daily.groupBy("event_type", "cents")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .filter(F.col("t") > 1)
        .groupBy("event_type")
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    var_s = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
        - F.coalesce(F.col("tie_term"), F.lit(0))
    ) / 18.0
    s_corr = (
        F.when(F.col("s_stat") > 0, F.col("s_stat") - 1)
        .when(F.col("s_stat") < 0, F.col("s_stat") + 1)
        .otherwise(0)
    )
    z = s_corr / F.sqrt(var_s)
    return (
        s.join(nn, "event_type")
        .join(ties, "event_type", "left")
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            "s_stat",
            F.round(var_s, 6).alias("var_s"),
            F.round(z, 4).alias("z"),
            F.when(
                F.abs(z) > 1.96,
                F.when(F.col("s_stat") > 0, F.lit("increasing")).otherwise(
                    F.lit("decreasing")
                ),
            )
            .otherwise(F.lit("no_trend"))
            .alias("verdict"),
        )
        .orderBy("event_type")
    )


@register(
    "q356_logrank_test",
    oracle="""
    WITH horizon AS (SELECT max(CAST(ts AS DATE)) AS hz FROM events),
    span AS (
        SELECT user_id,
               CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS grp,
               date_diff('day', min(CAST(ts AS DATE)),
                   coalesce(min(CASE WHEN event_type = 'purchase'
                                     THEN CAST(ts AS DATE) END),
                            (SELECT hz FROM horizon))) AS t,
               CASE WHEN min(CASE WHEN event_type = 'purchase'
                                  THEN CAST(ts AS DATE) END) IS NOT NULL
                    THEN 1 ELSE 0 END AS observed
        FROM events GROUP BY user_id
    ),
    days AS (SELECT DISTINCT t FROM span WHERE observed = 1),
    leavers AS (
        SELECT t, grp,
               CAST(count(*) AS BIGINT) AS l,
               CAST(sum(observed) AS BIGINT) AS d
        FROM span GROUP BY t, grp
    ),
    totals AS (
        SELECT grp, CAST(count(*) AS BIGINT) AS n FROM span GROUP BY grp
    ),
    risk AS (
        SELECT dd.t,
               (SELECT n FROM totals WHERE grp = 1)
                 - coalesce(sum(CASE WHEN lv.grp = 1 THEN lv.l END), 0) AS n1,
               (SELECT sum(n) FROM totals)
                 - coalesce(sum(lv.l), 0) AS nt,
               (SELECT coalesce(sum(d), 0) FROM leavers
                 WHERE t = dd.t AND grp = 1) AS d1,
               (SELECT coalesce(sum(d), 0) FROM leavers WHERE t = dd.t) AS dt
        FROM days dd LEFT JOIN leavers lv ON lv.t < dd.t
        GROUP BY dd.t
    ),
    terms AS (
        SELECT t, d1, dt, n1, nt,
               CAST(round(dt * (CAST(n1 AS DOUBLE) / nt) * 1e9) AS BIGINT)
                   AS e1_nano,
               CASE WHEN nt > 1 THEN
                   CAST(round(dt * (CAST(n1 AS DOUBLE) / nt)
                              * (1.0 - CAST(n1 AS DOUBLE) / nt)
                              * (nt - dt) / (nt - 1) * 1e9) AS BIGINT)
               ELSE 0 END AS v_nano
        FROM risk WHERE nt > 0 AND dt > 0
    )
    SELECT (SELECT n FROM totals WHERE grp = 1) AS n_treated,
           (SELECT n FROM totals WHERE grp = 0) AS n_control,
           CAST(sum(d1) AS BIGINT) AS observed_treated,
           round(CAST(sum(e1_nano) AS DOUBLE) / 1e9, 6) AS expected_treated,
           round(pow(sum(d1) - CAST(sum(e1_nano) AS DOUBLE) / 1e9, 2)
                 / (CAST(sum(v_nano) AS DOUBLE) / 1e9), 4) AS chi_sq
    FROM terms
    """,
)
def q356_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank (Mantel-Cox) test between the two experiment arms'
    retention curves — the hypothesis test the survival family lacked
    (q157 draws the Kaplan-Meier curve, q245 fits a parametric rate;
    this decides whether two curves DIFFER without assuming any
    distribution, handling censoring correctly): per distinct event
    time, compare observed group-1 conversions against the
    hypergeometric expectation given the risk sets, then
    χ² = (O−E)²/V. The survival event is TIME TO FIRST PURCHASE from
    a user's first event; users who never purchase are CENSORED at
    the corpus horizon (still at risk, never counted as converted —
    q164 measures the converters' percentiles, this test uses
    EVERYONE). Expectation and
    variance terms are nano-quantized integers before their sums, so
    the statistic derives from identical integers in both engines.

    Scale: one user-grain combining agg, then everything runs on the
    bounded |days|² risk-set grid (≤31 distinct span lengths — q243
    bounded-window contract); at 100 TB the single corpus exchange
    is the user rollup.
    """
    e = load(spark, sf_dir, "events")
    horizon = e.agg(F.max(F.col("ts").cast("date")).alias("hz"))
    span = (
        e.groupBy("user_id")
        .agg(
            F.min(F.col("ts").cast("date")).alias("d0"),
            F.min(
                F.when(
                    F.col("event_type") == "purchase", F.col("ts").cast("date")
                )
            ).alias("p0"),
        )
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(F.col("user_id") % 2 == 1, 1).otherwise(0).alias("grp"),
            F.datediff(F.coalesce("p0", "hz"), "d0").alias("t"),
            F.when(F.col("p0").isNotNull(), 1).otherwise(0).alias("observed"),
        )
    )
    leavers = span.groupBy("t", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("l"),
        F.sum("observed").cast("long").alias("d"),
    )
    totals = span.groupBy("grp").agg(F.count(F.lit(1)).cast("long").alias("n"))
    n1_tot = totals.filter(F.col("grp") == 1).select(F.col("n").alias("n1_tot"))
    n_all = totals.agg(F.sum("n").cast("long").alias("n_tot"))
    days = leavers.filter(F.col("d") > 0).select("t").distinct()
    lv = leavers.select(
        F.col("t").alias("lt"), F.col("grp").alias("lgrp"), "l", "d"
    )
    risk = (
        days.join(F.broadcast(lv), F.col("lt") < F.col("t"), "left")
        .groupBy("t")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("lgrp") == 1, F.col("l"))), F.lit(0)
            ).alias("gone1"),
            F.coalesce(F.sum("l"), F.lit(0)).alias("gone"),
        )
        .crossJoin(F.broadcast(n1_tot))
        .crossJoin(F.broadcast(n_all))
        .select(
            "t",
            (F.col("n1_tot") - F.col("gone1")).alias("n1"),
            (F.col("n_tot") - F.col("gone")).alias("nt"),
        )
    )
    deaths = leavers.groupBy("t").agg(
        F.sum(F.when(F.col("grp") == 1, F.col("d")).otherwise(0))
        .cast("long")
        .alias("d1"),
        F.sum("d").cast("long").alias("dt"),
    )
    p1 = F.col("n1").cast("double") / F.col("nt")
    terms = (
        risk.join(deaths, "t")
        .filter((F.col("nt") > 0) & (F.col("dt") > 0))
        .select(
            "d1",
            F.round(F.col("dt") * p1 * 1e9, 0).cast("long").alias("e1_nano"),
            F.when(
                F.col("nt") > 1,
                F.round(
                    F.col("dt") * p1 * (1.0 - p1)
                    * (F.col("nt") - F.col("dt"))
                    / (F.col("nt") - 1)
                    * 1e9,
                    0,
                ).cast("long"),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("v_nano"),
        )
    )
    o_minus_e = F.sum("d1") - F.sum("e1_nano").cast("double") / 1e9
    return (
        terms.agg(
            F.sum("d1").cast("long").alias("observed_treated"),
            F.round(F.sum("e1_nano").cast("double") / 1e9, 6).alias(
                "expected_treated"
            ),
            F.round(
                F.pow(o_minus_e, 2) / (F.sum("v_nano").cast("double") / 1e9), 4
            ).alias("chi_sq"),
        )
        .crossJoin(F.broadcast(n1_tot))
        .crossJoin(
            F.broadcast(
                totals.filter(F.col("grp") == 0).select(
                    F.col("n").alias("n_control")
                )
            )
        )
        .select(
            F.col("n1_tot").alias("n_treated"),
            "n_control",
            "observed_treated",
            "expected_treated",
            "chi_sq",
        )
    )


_ASOF_TOL_S = 3600


@register(
    "q359_asof_tolerance_directions",
    oracle=f"""
    WITH p AS (SELECT user_id, ts, min(event_id) AS event_id FROM events
               WHERE event_type = 'purchase' GROUP BY user_id, ts),
         c AS (SELECT user_id, ts, event_id FROM events
               WHERE event_type = 'click'),
    bwd AS (
        SELECT c.event_id, c.user_id, c.ts,
               p.event_id AS prev_id,
               date_diff('second', p.ts, c.ts) AS d
        FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
    ),
    fwd AS (
        SELECT c.event_id,
               p.event_id AS next_id,
               date_diff('second', c.ts, p.ts) AS d
        FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts <= p.ts
    )
    SELECT b.event_id, b.user_id,
           CASE WHEN b.d <= {_ASOF_TOL_S} THEN b.prev_id END
               AS prev_purchase_id,
           CAST(CASE WHEN b.d <= {_ASOF_TOL_S} THEN b.d END AS BIGINT)
               AS secs_since_prev,
           CASE WHEN f.d <= {_ASOF_TOL_S} THEN f.next_id END
               AS next_purchase_id,
           CAST(CASE WHEN f.d <= {_ASOF_TOL_S} THEN f.d END AS BIGINT)
               AS secs_until_next
    FROM bwd b JOIN fwd f ON b.event_id = f.event_id
    ORDER BY b.event_id
    """,
)
def q359_asof_tolerance_directions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join with DIRECTION and TOLERANCE knobs — the pandas
    merge_asof / kdb aj parameter surface on top of q36's basic
    backward asof: every click gets BOTH its most recent prior
    purchase (backward) and its next following purchase (forward),
    each nulled when the gap exceeds the 1-hour tolerance (the left
    row survives — tolerance filters the MATCH, not the row, exactly
    merge_asof's contract). Backward and forward run off ONE
    union+window pass per direction over the same user partitioning:
    last(ignorenulls) over unbounded-preceding for backward (purchase
    sorts first at equal ts — inclusive >=), first(ignorenulls) over
    unbounded-following for forward with the side sort FLIPPED so an
    equal-ts purchase lands inside the click's frame (inclusive <=) —
    one shuffle total (same partitioning; the second ordering adds a
    sort, not an exchange), no inequality join, no row explosion.
    Same-timestamp purchase ties resolve to the MIN event_id in both
    directions — purchases are deduped per (user_id, ts) up front in
    both engines, because DuckDB ASOF's choice among equal-ts matches
    is unspecified (deterministic-by-construction, pinned by the
    injected duplicate-ts regression test).
    The oracle runs DuckDB's native ASOF JOIN both ways, pinning
    semantic parity with engines that ship the operator.

    Scale: identical economics to q36 — |events| through one
    user-partitioned sort; tolerance and direction are row-local
    CASE arithmetic after the carry.
    """
    e = load(spark, sf_dir, "events")
    # same-ts purchase ties broken DETERMINISTICALLY in both engines
    # (min event_id per (user_id, ts)): DuckDB ASOF's pick among
    # equal-ts matches is unspecified, so both sides dedup FIRST —
    # the carry then never sees a tie in either direction
    p = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("p_id"))
        .select(
            "user_id",
            "ts",
            "p_id",
            F.col("ts").alias("p_ts"),
            F.lit(0).alias("side"),
            F.lit(None).cast("long").alias("c_id"),
        )
    )
    c = e.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("p_id"),
        F.lit(None).cast("timestamp").alias("p_ts"),
        F.lit(1).alias("side"),
        F.col("event_id").alias("c_id"),
    )
    tagged = p.unionByName(c)
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", F.asc_nulls_last("p_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward ordering flips the side sort so a click precedes a
    # SAME-ts purchase: ASOF's <= is inclusive, and the row-based
    # [current, following] frame would otherwise exclude an equal-ts
    # match that sorted before the click
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.desc("side"), F.asc_nulls_last("p_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = tagged.withColumns(
        {
            "prev_id": F.last("p_id", ignorenulls=True).over(wb),
            "prev_ts": F.last("p_ts", ignorenulls=True).over(wb),
            "next_id": F.first("p_id", ignorenulls=True).over(wf),
            "next_ts": F.first("p_ts", ignorenulls=True).over(wf),
        }
    ).filter(F.col("side") == 1)
    d_prev = F.col("ts").cast("long") - F.col("prev_ts").cast("long")
    d_next = F.col("next_ts").cast("long") - F.col("ts").cast("long")
    return carried.select(
        F.col("c_id").alias("event_id"),
        "user_id",
        F.when(d_prev <= _ASOF_TOL_S, F.col("prev_id")).alias("prev_purchase_id"),
        F.when(d_prev <= _ASOF_TOL_S, d_prev).cast("long").alias("secs_since_prev"),
        F.when(d_next <= _ASOF_TOL_S, F.col("next_id")).alias("next_purchase_id"),
        F.when(d_next <= _ASOF_TOL_S, d_next).cast("long").alias("secs_until_next"),
    ).orderBy("event_id")


@register(
    "q364_forecast_reconciliation",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(round(sum(value) * 100) AS BIGINT) AS cents
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    last_day AS (SELECT max(day) AS d FROM daily),
    base AS (
        SELECT d.event_type, d.cents AS base_fc_cents
        FROM daily d JOIN last_day l ON d.day = l.d
    ),
    total_fc AS (
        SELECT CAST(sum(cents) // 7 AS BIGINT) AS tf
        FROM (SELECT day, sum(cents) AS cents FROM daily GROUP BY day)
        WHERE day > (SELECT d - 7 FROM last_day)
    ),
    sums AS (SELECT CAST(sum(base_fc_cents) AS BIGINT) AS sb FROM base),
    alloc AS (
        SELECT b.event_type, b.base_fc_cents,
               CAST((CAST(t.tf AS HUGEINT) * b.base_fc_cents) // s.sb
                    AS BIGINT) AS floor_c,
               CAST((CAST(t.tf AS HUGEINT) * b.base_fc_cents) % s.sb
                    AS BIGINT) AS rem
        FROM base b CROSS JOIN total_fc t CROSS JOIN sums s
    ),
    leftover AS (
        SELECT (SELECT tf FROM total_fc) - CAST(sum(floor_c) AS BIGINT) AS k
        FROM alloc
    ),
    ranked AS (
        SELECT *, row_number() OVER (ORDER BY rem DESC, event_type) AS rr
        FROM alloc
    )
    SELECT r.event_type, r.base_fc_cents,
           CAST(r.floor_c + CASE WHEN r.rr <= l.k THEN 1 ELSE 0 END AS BIGINT)
               AS reconciled_fc_cents,
           round(CAST(r.base_fc_cents AS DOUBLE)
                 / (SELECT sb FROM sums), 6) AS share
    FROM ranked r CROSS JOIN leftover l
    ORDER BY event_type
    """,
)
def q364_forecast_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical FORECAST RECONCILIATION (proportional top-down):
    per-type naive forecasts (last observed day — any of q206/q237/
    q257's models slots in) generally do NOT sum to the total-level
    forecast, and downstream consumers need coherence; proportional
    reconciliation scales each type to the total forecast by its
    base-forecast share. Because forecasts are integer CENTS, the
    scaling runs as exact integer floor division with LARGEST-
    REMAINDER seat distribution (the q355 device), so
    Σ reconciled == total forecast EXACTLY — coherence is an integer
    identity, not a float approximation (pinned by test).

    (Base forecasts are per-type last-value naive; the total-level
    forecast is a DIFFERENT model — the 7-day mean of daily totals —
    so the two levels genuinely disagree and reconciliation
    redistributes real cents. MinT would weight by residual
    covariances — the proportional method is its zero-covariance
    special case.)

    Scale: one |types|×|days| rollup (the corpus exchange), then
    integer arithmetic + one bounded window on |types| rows.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value") * 100, 0).cast("long").alias("cents"))
    last_day = daily.agg(F.max("day").alias("d"))
    base = daily.join(
        F.broadcast(last_day), daily["day"] == F.col("d")
    ).select("event_type", F.col("cents").alias("base_fc_cents"))
    total_fc = (
        daily.join(F.broadcast(last_day), daily["day"] > F.date_sub(F.col("d"), 7))
        # FLOOR over an exact decimal quotient, NOT integer DIV: DIV
        # truncates toward zero while the oracle's // floors — they
        # diverge on a negative 7-day revenue total (and floor keeps
        # every largest-remainder remainder in [0, sb), so the seat
        # arithmetic below stays sound for negative tf too)
        .agg(
            F.expr(
                "CAST(FLOOR(CAST(sum(cents) AS DECIMAL(38,0)) / 7) AS BIGINT)"
            ).alias("tf")
        )
    )
    sums = base.agg(F.sum("base_fc_cents").cast("long").alias("sb"))
    alloc = (
        base.crossJoin(F.broadcast(total_fc))
        .crossJoin(F.broadcast(sums))
        .select(
            "event_type",
            "base_fc_cents",
            # decimal(38,0) product: tf*base wraps int64 at the cent
            # scales the docstring claims exactness for (~1e13 each)
            F.expr(
                "CAST(FLOOR(CAST(tf AS DECIMAL(38,0)) * base_fc_cents / sb)"
                " AS BIGINT)"
            ).alias("floor_c"),
            F.expr(
                "CAST(CAST(tf AS DECIMAL(38,0)) * base_fc_cents"
                " - FLOOR(CAST(tf AS DECIMAL(38,0)) * base_fc_cents / sb) * sb"
                " AS BIGINT)"
            ).alias("rem"),
            "tf",
            "sb",
        )
    )
    leftover = alloc.agg(
        (F.max("tf") - F.sum("floor_c")).cast("long").alias("k")
    )
    ranked = alloc.withColumn(
        "rr",
        F.row_number().over(Window.orderBy(F.desc("rem"), F.asc("event_type"))),
    )
    return (
        ranked.crossJoin(F.broadcast(leftover))
        .select(
            "event_type",
            "base_fc_cents",
            (
                F.col("floor_c")
                + F.when(F.col("rr") <= F.col("k"), 1).otherwise(0)
            )
            .cast("long")
            .alias("reconciled_fc_cents"),
            F.round(
                F.col("base_fc_cents").cast("double") / F.col("sb"), 6
            ).alias("share"),
        )
        .orderBy("event_type")
    )


@register(
    "q390_sequence_edit_distance",
    oracle="""
    WITH ranked AS (
        SELECT user_id, substr(event_type, 1, 1) AS c, ts, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
        WHERE user_id < 20
    ),
    seqs AS (
        SELECT user_id,
               string_agg(c, '' ORDER BY ts, event_id) AS sq
        FROM ranked WHERE rn <= 50
        GROUP BY user_id
    )
    SELECT a.user_id AS user_a, b.user_id AS user_b,
           CAST(length(a.sq) AS BIGINT) AS len_a,
           CAST(length(b.sq) AS BIGINT) AS len_b,
           CAST(levenshtein(a.sq, b.sq) AS BIGINT) AS edit_dist,
           round(1.0 - CAST(levenshtein(a.sq, b.sq) AS DOUBLE)
                       / greatest(length(a.sq), length(b.sq)), 4)
               AS seq_sim
    FROM seqs a JOIN seqs b ON a.user_id < b.user_id
    ORDER BY seq_sim DESC, user_a, user_b
    LIMIT 30
    """,
)
def q390_sequence_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-sequence NEAR-DUP detection by edit distance —
    each user's event stream becomes a character sequence (first
    letter of event_type, ts order, capped at 50 events) and user
    pairs are scored by Levenshtein similarity 1 − d/max(len): the
    bot/replay-detection primitive (two accounts replaying the same
    click script align at high seq_sim even with insertions) and
    the sequence-level complement of the token-level dedup family
    (q52 hashes content, this aligns ORDER). Both engines run their
    native integer Levenshtein, so the DP is exact cross-engine;
    the 50-event cap bounds the O(len²) cell count per pair.

    Scale: the cap is applied BEFORE aggregation — a per-user
    row_number window keeps rn ≤ 50, so the per-group collect state
    is bounded at 50 structs regardless of how heavy a user's event
    stream is (r11 ADVICE: a post-agg substr(1,50) would still
    buffer the whole stream in one group). The pair stage here is a
    bounded 20-user study set (×100 probe: blocked pairing — LSH
    over q53's SimHash of the sequence string — replaces the
    quadratic pair join; the scorer itself is map-side and reusable
    unchanged).
    """
    e = load(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w50 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seqs = (
        e.select(
            "user_id",
            "ts",
            "event_id",
            F.substring("event_type", 1, 1).alias("c"),
            F.row_number().over(w50).alias("rn"),
        )
        .filter(F.col("rn") <= 50)
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("ts"), F.col("event_id"), F.col("c"))
                        )
                    ),
                    lambda s: s["c"],
                ),
                "",
            ).alias("sq")
        )
    )
    a = seqs.select(F.col("user_id").alias("user_a"), F.col("sq").alias("sa"))
    b = seqs.select(F.col("user_id").alias("user_b"), F.col("sq").alias("sb"))
    d = F.levenshtein(F.col("sa"), F.col("sb"))
    mx = F.greatest(F.length("sa"), F.length("sb"))
    return (
        a.join(b, F.col("user_a") < F.col("user_b"))
        .select(
            "user_a",
            "user_b",
            F.length("sa").cast("long").alias("len_a"),
            F.length("sb").cast("long").alias("len_b"),
            d.cast("long").alias("edit_dist"),
            F.round(1.0 - d.cast("double") / mx, 4).alias("seq_sim"),
        )
        .orderBy(F.desc("seq_sim"), "user_a", "user_b")
        .limit(30)
    )


_Q395_SESS_GAP_US = 1_800_000_000     # 30-min session gap
_Q395_OUTAGE_GAP_US = 3_600_000_000   # merge errors within 1 h
_Q395_BUCKET_US = 6 * 3600 * 1_000_000  # 6-h join buckets (Spark side)


@register(
    "q395_interval_overlap_join",
    oracle=f"""
    WITH err AS (
        SELECT epoch_us(ts) AS ts_us FROM events
        WHERE event_type = 'error'
    ),
    og AS (
        SELECT ts_us,
               CASE WHEN lag(ts_us) OVER (ORDER BY ts_us) IS NULL
                         OR ts_us - lag(ts_us) OVER (ORDER BY ts_us)
                            > {_Q395_OUTAGE_GAP_US}
                    THEN 1 ELSE 0 END AS brk
        FROM err
    ),
    oid AS (
        SELECT ts_us,
               sum(brk) OVER (ORDER BY ts_us ROWS UNBOUNDED PRECEDING)
                   AS oid
        FROM og
    ),
    outage AS (
        SELECT oid, min(ts_us) AS o_start, max(ts_us) AS o_end
        FROM oid GROUP BY oid
    ),
    sgap AS (
        SELECT user_id, epoch_us(ts) AS ts_us, event_id,
               CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                            > {_Q395_SESS_GAP_US}
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sid AS (
        SELECT user_id, ts_us,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM sgap
    ),
    sess AS (
        SELECT user_id, sid, min(ts_us) AS s_start, max(ts_us) AS s_end
        FROM sid GROUP BY user_id, sid
    ),
    pairs AS (
        SELECT o.oid, o.o_start, o.o_end,
               least(o.o_end, s.s_end) - greatest(o.o_start, s.s_start)
                   AS ov
        FROM outage o JOIN sess s
          ON s.s_start <= o.o_end AND o.o_start <= s.s_end
    )
    SELECT CAST(oid AS BIGINT) AS outage_id,
           o_start AS o_start_us, o_end AS o_end_us,
           CAST(count(*) AS BIGINT) AS n_sessions_hit,
           CAST(sum(ov) AS BIGINT) AS overlap_us
    FROM pairs GROUP BY oid, o_start, o_end
    ORDER BY outage_id
    """,
)
def q395_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL-OVERLAP JOIN, bucketed — the general interval×interval
    join the time family was missing (q36 as-of joins points, q37
    joins points into ranges, q116 merges, q173 sweeps; this joins
    RANGES to RANGES): user sessions (30-min gap) against global
    outage windows (error events merged within 1 h), reporting per
    outage how many sessions it touched and the total overlapped
    time — the blast-radius readout incident review asks for.

    The Spark plan is the scalable shape: each interval explodes
    into the 6-h epoch buckets it spans, the join runs as a bucket
    EQUI-join (shuffle on bucket id, no range predicate in the join
    condition, no cartesian), and each qualifying pair is counted
    exactly once via the emit-once rule (only in the bucket of
    max(starts), which both intervals provably span). The DuckDB
    oracle states the SEMANTIC truth as the quadratic inequality
    join — the gate proves bucketed == quadratic, which is the whole
    point of the pattern.

    Scale: bucket fan-out is span/6 h per interval (sessions ≈1
    bucket; outages a handful); the bucket join's key cardinality
    grows with the timeline, so partitions stay balanced as the
    corpus grows. The outage construction windows only the ERROR
    subset on the global timeline (incident streams are inherently
    global; at 100 TB you'd pre-slice by day exactly like the
    events here span 30 of them).
    """
    e = load(spark, sf_dir, "events")
    err = e.filter(F.col("event_type") == "error").select(
        F.unix_micros("ts").alias("ts_us")
    )
    wo = Window.orderBy("ts_us")
    og = err.select(
        "ts_us",
        F.when(
            F.lag("ts_us").over(wo).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(wo)
               > _Q395_OUTAGE_GAP_US),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    outage = (
        og.select(
            "ts_us",
            F.sum("brk")
            .over(wo.rowsBetween(Window.unboundedPreceding, 0))
            .alias("oid"),
        )
        .groupBy("oid")
        .agg(F.min("ts_us").alias("o_start"), F.max("ts_us").alias("o_end"))
    )
    ws = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    sgap = e.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
    ).withColumn(
        "brk",
        F.when(
            F.lag("ts_us").over(ws).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(ws) > _Q395_SESS_GAP_US),
            1,
        ).otherwise(0),
    )
    sess = (
        sgap.select(
            "user_id",
            "ts_us",
            F.sum("brk")
            .over(ws.rowsBetween(Window.unboundedPreceding, 0))
            .alias("sid"),
        )
        .groupBy("user_id", "sid")
        .agg(F.min("ts_us").alias("s_start"), F.max("ts_us").alias("s_end"))
    )
    bk = lambda lo, hi: F.explode(  # noqa: E731
        F.sequence(
            F.expr(f"{lo} div {_Q395_BUCKET_US}"),
            F.expr(f"{hi} div {_Q395_BUCKET_US}"),
        )
    ).alias("bk")
    sb = sess.select("s_start", "s_end", bk("s_start", "s_end"))
    ob = outage.select("oid", "o_start", "o_end", bk("o_start", "o_end"))
    pairs = (
        sb.join(ob, "bk")
        .filter(
            (F.col("s_start") <= F.col("o_end"))
            & (F.col("o_start") <= F.col("s_end"))
        )
        .filter(
            F.col("bk")
            == F.expr(
                f"greatest(s_start, o_start) div {_Q395_BUCKET_US}"
            )
        )
    )
    return (
        pairs.groupBy("oid", "o_start", "o_end")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions_hit"),
            F.sum(
                F.least("o_end", "s_end") - F.greatest("o_start", "s_start")
            )
            .cast("long")
            .alias("overlap_us"),
        )
        .select(
            F.col("oid").cast("long").alias("outage_id"),
            F.col("o_start").alias("o_start_us"),
            F.col("o_end").alias("o_end_us"),
            "n_sessions_hit",
            "overlap_us",
        )
        .orderBy("outage_id")
    )


@register(
    "q399_delong_auc_ci",
    oracle="""
    WITH s AS (
        SELECT value AS v,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events WHERE value IS NOT NULL
    ),
    n AS (
        SELECT CAST(sum(y) AS DOUBLE) AS n1,
               CAST(count(*) - sum(y) AS DOUBLE) AS n0
        FROM s
    ),
    vs AS (
        SELECT v,
               CAST(count(*) FILTER (y = 0) AS BIGINT) AS c0,
               CAST(count(*) FILTER (y = 1) AS BIGINT) AS c1
        FROM s GROUP BY v
    ),
    cum AS (
        SELECT v, c0, c1,
               coalesce(sum(c0) OVER w, 0) AS c0_lt,
               coalesce(sum(c1) OVER w, 0) AS c1_lt
        FROM vs
        WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING)
    ),
    auc AS (
        SELECT CAST(sum(CAST(2 * c0_lt + c0 AS HUGEINT) * c1) AS DOUBLE)
               / (2.0 * (SELECT n0 FROM n) * (SELECT n1 FROM n)) AS a
        FROM cum WHERE c1 > 0
    ),
    v10 AS (
        SELECT (c0_lt + 0.5 * c0) / (SELECT n0 FROM n) AS p,
               CAST(c1 AS DOUBLE) AS wgt
        FROM cum WHERE c1 > 0
    ),
    v01 AS (
        SELECT ((SELECT n1 FROM n) - c1_lt - c1 + 0.5 * c1)
                   / (SELECT n1 FROM n) AS p,
               CAST(c0 AS DOUBLE) AS wgt
        FROM cum WHERE c0 > 0
    ),
    s10 AS (
        SELECT CAST(sum(CAST(round(
                   wgt * (p - (SELECT a FROM auc))
                       * (p - (SELECT a FROM auc)) * 1e12)
               AS HUGEINT)) AS DOUBLE) / 1e12
               / ((SELECT n1 FROM n) - 1) AS s
        FROM v10
    ),
    s01 AS (
        SELECT CAST(sum(CAST(round(
                   wgt * ((1 - p) - (SELECT a FROM auc))
                       * ((1 - p) - (SELECT a FROM auc)) * 1e12)
               AS HUGEINT)) AS DOUBLE) / 1e12
               / ((SELECT n0 FROM n) - 1) AS s
        FROM v01
    )
    SELECT CAST(n.n1 AS BIGINT) AS n_pos, CAST(n.n0 AS BIGINT) AS n_neg,
           round(auc.a, 6) AS auc,
           round(sqrt(s10.s / n.n1 + s01.s / n.n0), 6) AS se,
           round(auc.a - 1.96 * sqrt(s10.s / n.n1 + s01.s / n.n0), 6)
               AS ci_lo,
           round(auc.a + 1.96 * sqrt(s10.s / n.n1 + s01.s / n.n0), 6)
               AS ci_hi,
           abs(auc.a - 0.5)
               > 1.96 * sqrt(s10.s / n.n1 + s01.s / n.n0)
               AS separates
    FROM n, auc, s10, s01
    """,
)
def q399_delong_auc_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeLong AUC CONFIDENCE INTERVAL — the inference layer q177's
    point-estimate AUC lacks: the DeLong (1988) structural-component
    variance S10/n1 + S01/n0, where V10 per positive is its
    mid-rank placement among negatives (ties at 0.5) and V01
    symmetrically — computed entirely at DISTINCT-SCORE grain from
    cumulative class counts (V10 for every positive sharing a score
    is identical, so the per-observation components collapse to the
    score histogram with class-count weights: no n1×n0 pair join,
    no per-row pass). Emits the 95% CI and the 'separates' verdict
    (CI excludes 0.5) — the difference between 'AUC 0.52' and 'AUC
    0.52 ± 0.04, i.e. noise', which is what a model-gating pipeline
    actually needs. Note V01 = 1 − V10 at the same score under the
    mid-rank convention; both are materialized anyway to keep the
    estimator in DeLong's stated form.

    Scale: one pass to the score histogram (values grain), one
    values-grain cumulative window, three scalar aggregates. The
    AUC numerator is an exact integer sum and the variance terms
    are 1e-12-grid-quantized before summing, so every moment is
    order-independent across partial-agg merge orders.
    """
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = e.select(
        F.col("value").alias("v"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    n = s.agg(
        F.sum("y").cast("double").alias("n1"),
        (F.count(F.lit(1)) - F.sum("y")).cast("double").alias("n0"),
    )
    vs = s.groupBy("v").agg(
        F.sum(F.when(F.col("y") == 0, 1).otherwise(0))
        .cast("long")
        .alias("c0"),
        F.sum("y").cast("long").alias("c1"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = vs.select(
        "v",
        "c0",
        "c1",
        F.coalesce(F.sum("c0").over(w), F.lit(0)).alias("c0_lt"),
        F.coalesce(F.sum("c1").over(w), F.lit(0)).alias("c1_lt"),
    ).crossJoin(F.broadcast(n))
    # AUC numerator as an exact decimal-integer sum (2·c0_lt + c0 per
    # positive score, weighted by c1) so `a` is order-independent;
    # the variance terms are then quantized to a 1e-12 grid before
    # summing — raw double sums merge in partial-agg order and could
    # flake the 6-dp gate on a rounding boundary (r11 ADVICE).
    auc = cum.filter(F.col("c1") > 0).agg(
        (
            F.sum(
                (2 * F.col("c0_lt") + F.col("c0")).cast("decimal(38,0)")
                * F.col("c1")
            ).cast("double")
            / (2.0 * F.first("n0") * F.first("n1"))
        ).alias("a")
    )
    v10 = cum.filter(F.col("c1") > 0).select(
        ((F.col("c0_lt") + 0.5 * F.col("c0")) / F.col("n0")).alias("p"),
        F.col("c1").cast("double").alias("wgt"),
        "n1",
    )
    v01 = cum.filter(F.col("c0") > 0).select(
        (
            (F.col("n1") - F.col("c1_lt") - F.col("c1") + 0.5 * F.col("c1"))
            / F.col("n1")
        ).alias("p"),
        F.col("c0").cast("double").alias("wgt"),
    )

    def _gridded(term):
        return F.sum(
            F.round(term * F.lit(1e12)).cast("decimal(38,0)")
        ).cast("double") / 1e12

    s10 = (
        v10.crossJoin(F.broadcast(auc))
        .agg(
            (
                _gridded(
                    F.col("wgt")
                    * (F.col("p") - F.col("a"))
                    * (F.col("p") - F.col("a"))
                )
                / (F.first("n1") - 1)
            ).alias("s10")
        )
    )
    s01 = (
        v01.crossJoin(F.broadcast(auc))
        .crossJoin(F.broadcast(n))
        .agg(
            (
                _gridded(
                    F.col("wgt")
                    * ((1 - F.col("p")) - F.col("a"))
                    * ((1 - F.col("p")) - F.col("a"))
                )
                / (F.first("n0") - 1)
            ).alias("s01")
        )
    )
    se = F.sqrt(F.col("s10") / F.col("n1") + F.col("s01") / F.col("n0"))
    return (
        n.crossJoin(F.broadcast(auc))
        .crossJoin(F.broadcast(s10))
        .crossJoin(F.broadcast(s01))
        .select(
            F.col("n1").cast("long").alias("n_pos"),
            F.col("n0").cast("long").alias("n_neg"),
            F.round(F.col("a"), 6).alias("auc"),
            F.round(se, 6).alias("se"),
            F.round(F.col("a") - 1.96 * se, 6).alias("ci_lo"),
            F.round(F.col("a") + 1.96 * se, 6).alias("ci_hi"),
            (F.abs(F.col("a") - 0.5) > 1.96 * se).alias("separates"),
        )
    )


@register(
    "q408_bandit_replay_eval",
    oracle="""
    WITH logged AS (
        SELECT user_id, event_type AS arm, value AS reward
        FROM events WHERE value IS NOT NULL
    ),
    prop AS (
        SELECT arm, CAST(count(*) AS DOUBLE)
                    / (SELECT count(*) FROM logged) AS p
        FROM logged GROUP BY arm
    ),
    pol AS (
        SELECT l.user_id, l.arm, l.reward, prop.p,
               CASE CAST(l.user_id % 5 AS INTEGER)
                    WHEN 0 THEN 'click' WHEN 1 THEN 'purchase'
                    WHEN 2 THEN 'view' WHEN 3 THEN 'signup'
                    ELSE 'error' END AS target_arm
        FROM logged l JOIN prop ON prop.arm = l.arm
    )
    SELECT target_arm,
           CAST(count(*) FILTER (arm = target_arm) AS BIGINT) AS n_matched,
           round(avg(reward) FILTER (arm = target_arm), 4) AS replay_value,
           round(sum(CASE WHEN arm = target_arm
                          THEN reward / p ELSE 0 END) / count(*), 4)
               AS ips_value,
           round(avg(reward), 4) AS logging_value
    FROM pol
    GROUP BY target_arm
    ORDER BY target_arm
    """,
)
def q408_bandit_replay_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OFF-POLICY bandit evaluation — scores a TARGET policy (a
    deterministic user→arm map) on logged interaction data without
    deploying it, by the two standard estimators: REPLAY (Li et al.
    2011 — average reward over the logged rounds where the logger
    happened to pick the policy's arm; unbiased when logging is
    uniform) and IPS (reward / empirical logging propensity on
    matches, averaged over ALL rounds — unbiased under any logged
    propensity, higher variance). logging_value is the behavior
    policy's own average, the baseline the candidate must beat.
    Both estimators disagreeing is itself the diagnostic (propensity
    skew). This is the counterfactual-eval primitive every
    recommendation/training-mix decision pipeline needs before an
    A/B slot (q150/q380 test AFTER deployment; this triages BEFORE).

    Scale: one scan → |arms| propensity rows (broadcast back by
    AQE), one conditional aggregate at target-arm grain — the
    estimator is a groupBy, not a simulation loop.
    """
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    logged = e.select(
        "user_id", F.col("event_type").alias("arm"),
        F.col("value").alias("reward"),
    )
    n = logged.agg(F.count(F.lit(1)).cast("double").alias("n"))
    prop = (
        logged.groupBy("arm")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .crossJoin(F.broadcast(n))
        .select("arm", (F.col("c") / F.col("n")).alias("p"))
    )
    target = (
        F.when(F.col("user_id") % 5 == 0, "click")
        .when(F.col("user_id") % 5 == 1, "purchase")
        .when(F.col("user_id") % 5 == 2, "view")
        .when(F.col("user_id") % 5 == 3, "signup")
        .otherwise("error")
    )
    pol = logged.join(prop, "arm").select(
        "arm", "reward", "p", target.alias("target_arm")
    )
    hit = F.col("arm") == F.col("target_arm")
    return (
        pol.groupBy("target_arm")
        .agg(
            F.sum(hit.cast("int")).cast("long").alias("n_matched"),
            F.round(F.avg(F.when(hit, F.col("reward"))), 4).alias(
                "replay_value"
            ),
            F.round(
                F.sum(
                    F.when(hit, F.col("reward") / F.col("p")).otherwise(0.0)
                )
                / F.count(F.lit(1)),
                4,
            ).alias("ips_value"),
            F.round(F.avg("reward"), 4).alias("logging_value"),
        )
        .orderBy("target_arm")
    )


@register(
    "q420_brier_decomposition",
    oracle="""
    WITH scored AS (
        SELECT least(greatest(CAST(round(value * 100) AS HUGEINT), 0),
                     50000) AS pc,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events WHERE value IS NOT NULL
    ),
    cells AS (
        SELECT least(pc // 5000, 9) AS bin, CAST(count(*) AS BIGINT) AS n,
               sum(pc) AS spc, sum(y) AS sy
        FROM scored GROUP BY 1
    ),
    dcell AS (
        SELECT bin, n,
               CAST(spc AS DOUBLE) / (50000.0 * n) AS pbar,
               CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS ybar
        FROM cells
    ),
    g AS (SELECT CAST(sum(n) AS DOUBLE) AS nt,
                 CAST(sum(sy) AS DOUBLE) / sum(n) AS ybar_g
          FROM cells),
    parts AS (
        SELECT CAST(sum(CAST(round(n * (pbar - ybar) * (pbar - ybar)
                                   * 1e12) AS HUGEINT)) AS DOUBLE)
                   / 1e12 / (SELECT nt FROM g) AS reliability,
               CAST(sum(CAST(round(n * (ybar - (SELECT ybar_g FROM g))
                                   * (ybar - (SELECT ybar_g FROM g))
                                   * 1e12) AS HUGEINT)) AS DOUBLE)
                   / 1e12 / (SELECT nt FROM g) AS resolution
        FROM dcell
    ),
    brier AS (
        SELECT CAST(sum((pc - 50000 * y) * (pc - 50000 * y)) AS DOUBLE)
               / (2500000000.0 * count(*)) AS bs
        FROM scored
    )
    SELECT CAST((SELECT nt FROM g) AS BIGINT) AS n,
           round(brier.bs, 6) AS brier_score,
           round(parts.reliability, 6) AS reliability,
           round(parts.resolution, 6) AS resolution,
           round((SELECT ybar_g FROM g) * (1 - (SELECT ybar_g FROM g)), 6)
               AS uncertainty,
           round(parts.reliability - parts.resolution
                 + (SELECT ybar_g FROM g) * (1 - (SELECT ybar_g FROM g)),
                 6) AS decomposed_bs,
           abs(brier.bs - (parts.reliability - parts.resolution
               + (SELECT ybar_g FROM g) * (1 - (SELECT ybar_g FROM g))))
               < 0.01 AS decomposition_holds
    FROM brier, parts
    """,
)
def q420_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BRIER-SCORE DECOMPOSITION (Murphy 1973) — the three-way split
    every probabilistic-forecast review wants: BS ≈ reliability
    (calibration error: Σn_k(p̄_k−ȳ_k)²/N, what q243's isotonic fit
    removes) − resolution (how much the bins separate outcomes —
    the part worth keeping) + uncertainty (ȳ(1−ȳ), the floor no
    model beats). Computed over 10 equal-width score bins (q178's
    binning; score = the clamped value/500 proxy, outcome =
    purchase), with the within-bin variance term making the binned
    identity approximate — decomposition_holds pins it to 1e-2,
    which is itself the diagnostic that the binning is fine enough.
    Completes the calibration picture: q178 shows the curve, q243
    recalibrates, q226 scores quantiles, this attributes the score.

    Scale: one scan → 10 bin moments (+ one scalar Brier pass);
    everything mergeable, shuffle carries 10 rows.
    """
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    # Scores quantized to centi-units (value is 2-dp; p = pc/50000):
    # bin ids, per-bin score/outcome sums and the Brier numerator are
    # then exact integers — order-independent across partial-agg
    # merge orders — and the two ≤10-term decomposition sums are
    # 1e-12-grid-quantized (r11 ADVICE: raw double sums can flake
    # the 6-dp gate on a rounding boundary).
    scored = e.select(
        F.least(
            F.greatest(
                F.round(F.col("value") * 100).cast("long"), F.lit(0)
            ),
            F.lit(50000),
        ).alias("pc"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    cells = scored.groupBy(
        F.least(F.floor(F.col("pc") / 5000), F.lit(9))
        .cast("long")
        .alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pc").alias("spc"),
        F.sum("y").alias("sy"),
    )
    dcell = cells.select(
        "bin",
        "n",
        (F.col("spc").cast("double") / (50000.0 * F.col("n"))).alias("pbar"),
        (F.col("sy").cast("double") / F.col("n").cast("double")).alias(
            "ybar"
        ),
    )
    g = cells.agg(
        F.sum("n").cast("double").alias("nt"),
        (F.sum("sy").cast("double") / F.sum("n")).alias("ybar_g"),
    )

    def _gridded(term):
        return F.sum(
            F.round(term * F.lit(1e12)).cast("decimal(38,0)")
        ).cast("double") / 1e12

    parts = dcell.crossJoin(F.broadcast(g)).agg(
        (
            _gridded(
                F.col("n")
                * (F.col("pbar") - F.col("ybar"))
                * (F.col("pbar") - F.col("ybar"))
            )
            / F.first("nt")
        ).alias("reliability"),
        (
            _gridded(
                F.col("n")
                * (F.col("ybar") - F.col("ybar_g"))
                * (F.col("ybar") - F.col("ybar_g"))
            )
            / F.first("nt")
        ).alias("resolution"),
        F.first("nt").alias("nt"),
        F.first("ybar_g").alias("ybar_g"),
    )
    dev = F.col("pc") - 50000 * F.col("y")
    brier = scored.agg(
        (
            F.sum((dev * dev).cast("decimal(38,0)")).cast("double")
            / (2500000000.0 * F.count(F.lit(1)))
        ).alias("bs")
    )
    unc = F.col("ybar_g") * (1 - F.col("ybar_g"))
    dec = F.col("reliability") - F.col("resolution") + unc
    return (
        parts.crossJoin(F.broadcast(brier))
        .select(
            F.col("nt").cast("long").alias("n"),
            F.round(F.col("bs"), 6).alias("brier_score"),
            F.round(F.col("reliability"), 6).alias("reliability"),
            F.round(F.col("resolution"), 6).alias("resolution"),
            F.round(unc, 6).alias("uncertainty"),
            F.round(dec, 6).alias("decomposed_bs"),
            (F.abs(F.col("bs") - dec) < 0.01).alias("decomposition_holds"),
        )
    )
