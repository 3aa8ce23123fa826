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
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    new_session = F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0)
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
