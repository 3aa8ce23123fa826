"""Relational operator inventory (SURVEY.md §2.3-§2.7) as declared queries.

Each query exercises specific reference operators, re-expressed as
idiomatic DataFrame plans. Citations point at the reference behavior
being covered (file:line under /root/reference).

Scale notes per query are in the docstrings — the common themes:
dimension joins are broadcast (region/nation/supplier/part are small
even at 100 TB fact scale), aggregations are partial-agg friendly
(map-side combine), and all scans push filters/projections into the
parquet reader.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from g_etl_spark.queries import register
from g_etl_spark.tables import load

# ---------------------------------------------------------------------------
# Aggregation family (reference ops A1, A7; scalar math P9)
# ---------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                          AS sum_qty,
           round(sum(l_extendedprice), 2)                                     AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                  AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)    AS sum_charge,
           round(avg(l_quantity), 2)                                          AS avg_qty,
           round(avg(l_extendedprice), 2)                                     AS avg_price,
           round(avg(l_discount), 4)                                          AS avg_disc,
           count(*)                                                           AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: filter → hash-agg with many partial-aggregatable
    measures (reference A1 `GROUP BY … COUNT(*)` export.py:29-39 and
    P9 `round(...)` aaa_avdelning/001:18-19).

    Scale: 2-key group (6 groups) → map-side combine collapses nearly
    all rows before the shuffle; the scan reads only 7 columns with
    the shipdate predicate pushed to parquet.
    """
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q02_top_orders",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d')                 AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q02_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective fact-fact join + top-k (reference O3
    `ORDER BY count DESC LIMIT n` export.py:33-39).

    Scale: customer filter is applied before the join; orders⋈lineitem
    shuffles on orderkey (co-partitioned); the final top-k plans as
    TakeOrderedAndProject — no global sort materialization.
    """
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q03_region_revenue",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey  = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q03_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: snowflake join through two tiny dims (reference
    J1/J2 dimension joins, h3_query.py:107-118).

    Scale: region and nation are broadcast explicitly (they stay tiny
    at any fact scale), so only orders⋈lineitem shuffles. Customer is
    broadcast-eligible at test SF and shuffles at 100 TB — left to AQE.
    """
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@register(
    "q04_revenue_forecast",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q04_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: conjunctive range filters + scalar agg
    (reference P1 null-filter + A7 scalar counts).

    Scale: all four predicates push into the parquet scan
    (PushedFilters); the agg is a single partial→final reduction with
    no wide shuffle.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "q05_distinct_counts",
    oracle="""
    SELECT count(DISTINCT l_orderkey)  AS n_orders,
           count(DISTINCT l_partkey)   AS n_parts,
           count(DISTINCT l_suppkey)   AS n_supps,
           count(*)                    AS n_rows
    FROM lineitem
    """,
)
def q05_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi COUNT(DISTINCT) in one agg (reference A2,
    h3_query.py:137-138 / pipeline_runner.py:1147-1148).

    Scale: Catalyst plans multi-distinct via expand+two-phase agg; at
    100 TB prefer approx_count_distinct when exactness isn't required
    (exposed in operators/rollup as an option).
    """
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "q06_ordered_distinct_lists",
    oracle="""
    SELECT o_orderstatus,
           array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS priorities,
           count(DISTINCT o_custkey) AS n_custs
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def q06_ordered_distinct_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`LIST(DISTINCT x ORDER BY x)` → sort_array(collect_set(x))
    (reference A3, pipeline_runner.py:1149-1151). Serialized with
    array_join so both engines hash the same canonical string.

    Scale: collect_set is bounded here by attribute cardinality (5
    priorities) so the agg state stays tiny regardless of row count.
    """
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.array_join(F.sort_array(F.collect_set("o_orderpriority")), ",").alias("priorities"),
            F.countDistinct("o_custkey").alias("n_custs"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Distinct / union / top-k / sampling family (reference A5, O1-O5)
# ---------------------------------------------------------------------------


@register(
    "q07_distinct_pairs",
    oracle="""
    SELECT DISTINCT o_orderstatus, o_orderpriority
    FROM orders
    ORDER BY o_orderstatus, o_orderpriority
    """,
)
def q07_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT (reference A5, h3_query.py:109-114)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderstatus", "o_orderpriority")
        .distinct()
        .orderBy("o_orderstatus", "o_orderpriority")
    )


@register(
    "q08_union_all_branches",
    oracle="""
    SELECT branch, count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM (
        SELECT 'high' AS branch, o_totalprice FROM orders WHERE o_totalprice >= 200000
        UNION ALL
        SELECT 'urgent' AS branch, o_totalprice FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    GROUP BY branch
    ORDER BY branch
    """,
)
def q08_union_all_branches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL over per-source relations (reference O5 — the dynamic
    h3_index union, pipeline_runner.py:1083-1137). unionByName keeps
    column resolution by name, matching the generated-SQL semantics.
    """
    o = load(spark, sf_dir, "orders")
    high = o.filter(F.col("o_totalprice") >= 200000).select(
        F.lit("high").alias("branch"), "o_totalprice"
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.lit("urgent").alias("branch"), "o_totalprice"
    )
    return (
        high.unionByName(urgent)
        .groupBy("branch")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("branch")
    )


@register(
    "q09_topk_customers",
    oracle="""
    SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
    FROM customer
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 20
    """,
)
def q09_topk_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT top-k (reference O3). Spark plans this as
    TakeOrderedAndProject — a per-partition heap + driver merge, no
    full sort; exactly the 100 TB-safe top-k.
    """
    c = load(spark, sf_dir, "customer")
    return (
        c.select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal"))
        .orderBy(F.desc("acctbal"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Scalar-function surface (reference §2.7: string/date/json/math)
# ---------------------------------------------------------------------------


@register(
    "q10_scalar_text_funcs",
    oracle="""
    SELECT doc_id,
           md5(text)                                                    AS text_md5,
           trim(regexp_replace(text, '\\s+', ' ', 'g'))                 AS clean_text,
           upper(lang)                                                  AS lang_upper,
           coalesce(nullif(source, ''), '-') || '.' || coalesce(nullif(lang, ''), '-') AS classification,
           length(text)                                                 AS text_len
    FROM documents
    WHERE doc_id < 100
    ORDER BY doc_id
    """,
)
def q10_scalar_text_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface: md5, trim+regexp collapse
    (g_clean_text, 003_db_makros.sql:98-102), COALESCE/NULLIF '||'
    classification concat (aab_ext_restr/002:16), upper, length.
    All JVM built-ins — no UDF.
    """
    d = load(spark, sf_dir, "documents")
    return (
        d.filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.md5(F.col("text")).alias("text_md5"),
            F.trim(F.regexp_replace("text", r"\s+", " ")).alias("clean_text"),
            F.upper("lang").alias("lang_upper"),
            F.concat_ws(
                ".",
                F.coalesce(F.nullif(F.col("source"), F.lit("")), F.lit("-")),
                F.coalesce(F.nullif(F.col("lang"), F.lit("")), F.lit("-")),
            ).alias("classification"),
            F.length("text").cast("long").alias("text_len"),  # match DuckDB length()→BIGINT
        )
        .orderBy("doc_id")
    )


@register(
    "q11_events_daily",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d')        AS day,
           event_type,
           count(*)                         AS n,
           round(sum(value), 2)             AS total_value,
           round(avg(value), 3)             AS avg_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q11_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date formatting + time-bucketed agg (reference
    g_format_date_iso 003:127-131, CURRENT_TIMESTAMP family). This is
    also the batch shape of the streaming daily rollup in
    streaming/pipeline.py.
    """
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.round(F.avg("value"), 3).alias("avg_value"),
        )
        .orderBy("day", "event_type")
    )


@register(
    "q12_case_dispatch",
    oracle="""
    SELECT CASE
             WHEN event_type IN ('click', 'view') THEN 'engagement'
             WHEN event_type = 'purchase' THEN 'conversion'
             WHEN event_type = 'signup' THEN 'acquisition'
             ELSE 'other'
           END AS bucket,
           count(*) AS n,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
)
def q12_case_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE-dispatch (reference P7 geometry-type dispatch shape,
    004_staging_transform_template.sql:50-58) over a typed column."""
    e = load(spark, sf_dir, "events")
    bucket = (
        F.when(F.col("event_type").isin("click", "view"), "engagement")
        .when(F.col("event_type") == "purchase", "conversion")
        .when(F.col("event_type") == "signup", "acquisition")
        .otherwise("other")
        .alias("bucket")
    )
    return (
        e.groupBy(bucket)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("bucket")
    )


@register(
    "q13_json_extract",
    oracle="""
    SELECT event_type,
           round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 3) AS avg_k,
           max(CAST(json_extract_string(props, '$.k') AS INTEGER))           AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q13_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-as-VARCHAR extraction (reference `_json_data` / from_json
    usage, 004:38-39, aab/002:17-19) with numeric cleanup P9
    `round(TRY_CAST(...))`."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.groupBy("event_type")
        .agg(
            F.round(F.avg(k), 3).alias("avg_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "q14_try_cast_cleanup",
    oracle="""
    SELECT o_orderpriority,
           round(avg(TRY_CAST(substr(o_orderpriority, 1, 1) AS DOUBLE)), 1) AS prio_num,
           round(sum(o_totalprice) / 10000.0, 2)                            AS total_wan
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q14_try_cast_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY_CAST numeric cleanup (reference P9 aaa_avdelning/001:18-19)
    and unit-scaling arithmetic (area→hectares /10000.0, 003:32-36)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.round(
                F.avg(F.substring("o_orderpriority", 1, 1).try_cast("double")), 1
            ).alias("prio_num"),
            F.round(F.sum("o_totalprice") / 10000.0, 2).alias("total_wan"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q15_metadata_block",
    oracle="""
    SELECT doc_id,
           md5(CAST(doc_id AS VARCHAR))                               AS source_id_md5,
           md5(concat_ws('|', CAST(doc_id AS VARCHAR), text, lang, source,
                         CAST(n_chars AS VARCHAR)))                   AS attr_md5,
           CAST(n_chars AS VARCHAR)                                   AS n_chars_str
    FROM documents
    WHERE doc_id < 50
    ORDER BY doc_id
    """,
)
def q15_metadata_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-metadata block (reference P6, 004:35-40): `_source_id_md5 =
    MD5(CAST(id AS VARCHAR))`, `_attr_md5` over all attributes. The
    attr hash uses a canonical '|' concat rather than to_json so both
    engines produce byte-identical input (SURVEY §7 sharp edge #3);
    `_imported_at` (current_timestamp) is excluded as nondeterministic.
    """
    d = load(spark, sf_dir, "documents")
    return (
        d.filter(F.col("doc_id") < 50)
        .select(
            "doc_id",
            F.md5(F.col("doc_id").cast("string")).alias("source_id_md5"),
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("doc_id").cast("string"),
                    "text",
                    "lang",
                    "source",
                    F.col("n_chars").cast("string"),
                )
            ).alias("attr_md5"),
            F.col("n_chars").cast("string").alias("n_chars_str"),
        )
        .orderBy("doc_id")
    )


@register(
    "q16_distance_avg",
    oracle="""
    SELECT event_type,
           round(avg(sqrt(((55.0 + ((event_id * 7919) % 1000) * 0.01) - 59.0) * ((55.0 + ((event_id * 7919) % 1000) * 0.01) - 59.0)
                        + ((11.0 + ((event_id * 104729) % 1200) * 0.01) - 15.0) * ((11.0 + ((event_id * 104729) % 1200) * 0.01) - 15.0))), 4) AS avg_dist,
           round(min(sqrt(((55.0 + ((event_id * 7919) % 1000) * 0.01) - 59.0) * ((55.0 + ((event_id * 7919) % 1000) * 0.01) - 59.0)
                        + ((11.0 + ((event_id * 104729) % 1200) * 0.01) - 15.0) * ((11.0 + ((event_id * 104729) % 1200) * 0.01) - 15.0))), 4) AS min_dist
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q16_distance_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AVG over a distance expression per group (reference A6
    `ROUND(AVG(ST_Distance(pt, geom)))`, examples:184-188). Points are
    the derived event coordinates; the distance here is planar
    arithmetic (JVM-side) — the WKB ST_Distance path is
    geo_udfs.st_distance_point, exercised in the pipeline tests."""
    from g_etl_spark.queries.grid import _points

    pts = _points(spark, sf_dir)
    dist = F.sqrt(
        (F.col("lat") - 59.0) * (F.col("lat") - 59.0)
        + (F.col("lng") - 15.0) * (F.col("lng") - 15.0)
    )
    return (
        pts.groupBy("event_type")
        .agg(
            F.round(F.avg(dist), 4).alias("avg_dist"),
            F.round(F.min(dist), 4).alias("min_dist"),
        )
        .orderBy("event_type")
    )


@register(
    "q17_hash_sample",
    oracle="""
    SELECT count(*) AS n,
           round(avg(value), 3) AS avg_value,
           count(DISTINCT event_type) AS n_types
    FROM events
    WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 2) <= '0a'
    """,
)
def q17_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-sampling (reference O4 `USING SAMPLE n`,
    ascii_map.py:207-231). Random SAMPLE is nondeterministic across
    engines, so the engine's sampling operator is md5-bucket selection
    (~4%) — deterministic, reproducible, and the standard way to get
    a STABLE sample at 100 TB (same rows every run, no shuffle)."""
    e = load(spark, sf_dir, "events")
    return e.filter(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 2) <= "0a"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 3).alias("avg_value"),
        F.countDistinct("event_type").alias("n_types"),
    )


@register(
    "q18_catalog_columns",
    oracle="""
    SELECT table_name, CAST(count(*) AS BIGINT) AS n_columns
    FROM information_schema.columns
    WHERE table_name IN ('region', 'nation', 'customer', 'supplier', 'part',
                         'orders', 'lineitem', 'events', 'documents', 'embeddings')
    GROUP BY table_name
    ORDER BY table_name
    """,
)
def q18_catalog_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog/metadata introspection (reference J3
    information_schema joins, admin/screens/explorer.py:291-303) via
    the Spark schema API."""
    from g_etl_spark.tables import TABLE_NAMES

    rows = [(t, len(load(spark, sf_dir, t).columns)) for t in sorted(TABLE_NAMES)]
    return spark.createDataFrame(rows, "table_name string, n_columns bigint").orderBy(
        "table_name"
    )


@register(
    "q19_semi_anti_join",
    oracle="""
    SELECT
      (SELECT count(*) FROM orders o
       WHERE EXISTS (SELECT 1 FROM lineitem l
                     WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45))
        AS n_with_big_items,
      (SELECT count(*) FROM orders o
       WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                         WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45))
        AS n_without_big_items
    """,
)
def q19_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti joins (the closest reference surface is the
    `dataset_id IN (…)` pre-filters, h3_query.py:101-103; full
    EXISTS/NOT EXISTS support is table stakes for an analytics
    engine). Spark plans leftsemi/leftanti — no fan-out, build side
    deduplicated."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    with_big = o.join(li, o.o_orderkey == li.l_orderkey, "leftsemi").count()
    without = o.join(li, o.o_orderkey == li.l_orderkey, "leftanti").count()
    return spark.createDataFrame(
        [(with_big, without)], "n_with_big_items bigint, n_without_big_items bigint"
    )


@register(
    "q27_small_quantity_revenue",
    oracle="""
    WITH part_avg AS (
        SELECT l_partkey, 0.5 * avg(l_quantity) AS half_avg
        FROM lineitem GROUP BY l_partkey
    )
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
           count(*) AS n_items
    FROM lineitem
    JOIN part_avg USING (l_partkey)
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < half_avg
    """,
)
def q27_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery decorrelated into a
    pre-aggregate + join (the rewrite Catalyst/DuckDB both apply; here
    it is expressed directly, which is also the 100 TB-safe form —
    one extra agg on the join key instead of a per-row subquery).
    """
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    part_avg = li.groupBy("l_partkey").agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        li.join(part_avg, "l_partkey")
        .join(part, F.col("p_partkey") == F.col("l_partkey"))  # part-grain: unhinted, AQE decides
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q31_rollup_hierarchy",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*)                      AS n,
           round(sum(l_quantity), 2)     AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
)
def q31_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (beyond the reference — SURVEY §2.5 notes
    it has none; any replacement engine needs them for hierarchy
    reports). NULL markers coalesced to 'ALL' so both engines hash
    identically.

    Scale: Catalyst plans rollup as Expand (k+1 rows per input) +
    single hash agg — one shuffle for all grouping levels.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
        .orderBy("returnflag", "linestatus")
    )


@register(
    "q32_from_json_typed",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           count(*) FILTER (WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 50) AS n_high
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q32_from_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-typed JSON decode: `from_json` with a struct schema
    (≙ the reference's from_json usage on h3_cells / _json_data,
    aab/002:17-19) — unlike q13's get_json_object path, the parse
    happens once per row into a typed struct that all downstream
    expressions share."""
    e = load(spark, sf_dir, "events")
    parsed = e.withColumn("p", F.from_json("props", "k int"))
    return (
        parsed.groupBy("event_type")
        .agg(
            F.sum(F.col("p.k")).cast("long").alias("sum_k"),
            F.count_if(F.col("p.k") > 50).alias("n_high"),
        )
        .orderBy("event_type")
    )


@register(
    "q33_cube_matrix",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL')   AS orderstatus,
           coalesce(o_orderpriority, 'ALL') AS orderpriority,
           count(*)                         AS n,
           round(sum(o_totalprice), 2)      AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY orderstatus, orderpriority
    """,
)
def q33_cube_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets — all 2^k grouping combinations in one
    Expand + single shuffle (completes the grouping-sets family next
    to q31's ROLLUP)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n",
            "total",
        )
        .orderBy("orderstatus", "orderpriority")
    )


# ---------------------------------------------------------------------------
# Correlated-subquery decorrelation family (TPC-H Q2 / Q20 shapes)
# ---------------------------------------------------------------------------

_Q34_SQL = """
    SELECT DISTINCT p.p_partkey, p.p_name, s.s_name,
           round(l.l_extendedprice, 2) AS min_price
    FROM {part} p
    JOIN {lineitem} l ON l.l_partkey = p.p_partkey
    JOIN {supplier} s ON s.s_suppkey = l.l_suppkey
    WHERE p.p_size <= 10
      AND l.l_extendedprice = (
          SELECT min(l2.l_extendedprice) FROM {lineitem} l2
          WHERE l2.l_partkey = p.p_partkey)
    ORDER BY p_partkey, s_name
    LIMIT 100
"""


@register(
    "q34_min_cost_supplier",
    oracle=_Q34_SQL.replace("{part}", "part")
    .replace("{lineitem}", "lineitem")
    .replace("{supplier}", "supplier"),
)
def q34_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar-min subquery — for each small
    part, the supplier(s) charging the global per-part minimum price
    (≙ the reference's min-cost lookup pattern; partsupp is absent
    from the testdata so lineitem serves as the price fact).

    Written as the CORRELATED form on purpose: Catalyst's
    RewriteCorrelatedScalarSubquery decorrelates it into a per-partkey
    aggregate + equi-join — tests/test_plans.py asserts the physical
    plan is join-shaped with no per-row subquery execution.

    Scale: the min-aggregate shuffles lineitem once on l_partkey
    (map-side partial min), the rejoin is partkey-equi; part/supplier
    dims broadcast.
    """
    return spark.sql(
        _Q34_SQL,
        part=load(spark, sf_dir, "part"),
        lineitem=load(spark, sf_dir, "lineitem"),
        supplier=load(spark, sf_dir, "supplier"),
    )


_Q35_SQL = """
    SELECT s.s_suppkey, s.s_name
    FROM {supplier} s
    WHERE s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM {lineitem} l
        WHERE l.l_partkey IN (
            SELECT p.p_partkey FROM {part} p WHERE p.p_name LIKE '%bolt%')
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1996-06-01'
          AND l.l_quantity > 1.8 * (
              SELECT avg(l2.l_quantity) FROM {lineitem} l2
              WHERE l2.l_partkey = l.l_partkey)
    )
    ORDER BY s_suppkey
"""


@register(
    "q35_nested_semi_join",
    oracle=_Q35_SQL.replace("{part}", "part")
    .replace("{lineitem}", "lineitem")
    .replace("{supplier}", "supplier"),
)
def q35_nested_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested semi-joins + correlated scalar agg —
    suppliers who shipped an unusually large lot (> 1.8× the part's
    average quantity) of a bolt part in H1-1996.

    Three decorrelation patterns stack: outer IN → left-semi on
    s_suppkey; inner IN → left-semi on l_partkey; correlated avg →
    per-partkey aggregate joined back. tests/test_plans.py asserts
    all three plan as joins (no per-row subquery).

    Scale: the only wide shuffle is the per-partkey avg over the
    date-windowed lineitem slice; the semi-joins dedup early (semi,
    not inner) so no row multiplication.
    """
    return spark.sql(
        _Q35_SQL,
        part=load(spark, sf_dir, "part"),
        lineitem=load(spark, sf_dir, "lineitem"),
        supplier=load(spark, sf_dir, "supplier"),
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "q47_event_pivot",
    oracle=f"""
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           {", ".join(
               f"count(*) FILTER (WHERE event_type = '{t}') AS {t}_n, "
               f"round(sum(value) FILTER (WHERE event_type = '{t}'), 2) AS {t}_value"
               for t in _EVENT_TYPES)}
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
)
def q47_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: wide per-day matrix of count + value per event type
    (the reference explorer's crosstab view; ≙ DuckDB PIVOT /
    conditional aggregation).

    Pivot values are passed EXPLICITLY: Spark otherwise runs an extra
    collect-distinct job to discover them, and the driver/oracle
    column order would depend on data. With explicit values this
    plans as the two-phase pivot aggregate — groupBy(day, type)
    partial agg, then PivotFirst over the tiny pre-agg — so raw rows
    shuffle ONCE; the pivot itself is a layout transform.
    Missing day×type cells: count coalesces to 0, sum stays NULL
    (matches the FILTER-ed aggregate semantics in the oracle).
    """
    e = load(spark, sf_dir, "events")
    p = (
        e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .pivot("event_type", _EVENT_TYPES)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("value"),
        )
    )
    cols = [F.col("day")]
    for t in _EVENT_TYPES:
        cols.append(F.coalesce(F.col(f"{t}_n"), F.lit(0)).alias(f"{t}_n"))
        cols.append(F.col(f"{t}_value"))
    return p.select(*cols).orderBy("day")


_Q64_SQL = """
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey AS c_custkey, count(o.o_orderkey) AS c_count
        FROM {customer} c
        LEFT OUTER JOIN {orders} o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""


@register(
    "q64_order_count_distribution",
    oracle=_Q64_SQL.replace("{customer}", "customer").replace("{orders}", "orders"),
)
def q64_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: order-count distribution per customer via a
    LEFT OUTER join with an ON-clause filter (the filter must stay in
    the join condition — pushing it below the outer join as a WHERE
    would drop zero-order customers) and a two-level aggregate.

    Scale: count(o_orderkey) over the outer join is the only wide
    shuffle (on custkey); the second aggregate groups the tiny
    distribution domain. Catalyst keeps the o_orderpriority filter on
    the orders SCAN side of the join (safe: it's the preserved-row
    side's opposite), so the join build input is pre-thinned.
    """
    return spark.sql(
        _Q64_SQL,
        customer=load(spark, sf_dir, "customer"),
        orders=load(spark, sf_dir, "orders"),
    )


_Q65_SQL = """
    SELECT c.c_mktsegment AS segment,
           count(*) AS numcust,
           round(sum(c.c_acctbal), 2) AS totacctbal
    FROM {customer} c
    WHERE c.c_acctbal > (
            SELECT avg(c2.c_acctbal) FROM {customer} c2
            WHERE c2.c_acctbal > 0.0)
      AND NOT EXISTS (
            SELECT 1 FROM {orders} o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
"""


@register(
    "q65_inactive_rich_customers",
    oracle=_Q65_SQL.replace("{customer}", "customer").replace("{orders}", "orders"),
)
def q65_inactive_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no
    URGENT orders — an uncorrelated scalar subquery (global avg) +
    an anti-join, rolled up per market segment. (The classic Q22
    anti-joins ALL orders; this corpus gives every customer at least
    one order, so the urgency restriction keeps the result
    non-vacuous without changing the plan shape.)

    Decorrelation: the scalar avg becomes a one-row broadcast
    (ReusedSubquery/scalar-subquery node), NOT a per-row probe; the
    NOT EXISTS plans as LeftAnti on o_custkey. Both are single-pass —
    no nested-loop anywhere (see tests/test_plans.py).
    """
    return spark.sql(
        _Q65_SQL,
        customer=load(spark, sf_dir, "customer"),
        orders=load(spark, sf_dir, "orders"),
    )


_Q66_SQL = """
    SELECT coalesce(o_orderstatus, 'ALL')   AS orderstatus,
           coalesce(o_orderpriority, 'ALL') AS orderpriority,
           count(*)                         AS n,
           round(sum(o_totalprice), 2)      AS total
    FROM {orders}
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    ORDER BY orderstatus, orderpriority
"""


@register(
    "q66_grouping_sets",
    oracle=_Q66_SQL.replace("{orders}", "orders"),
)
def q66_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with DISJOINT sets — the one member of
    the grouping family (q31 ROLLUP, q33 CUBE) neither can express:
    two independent one-column groupings in a single pass.

    Scale: one Expand (2 rows per input) + ONE hash-agg shuffle —
    half the input traffic of running the two groupBys separately
    and unioning.
    """
    return spark.sql(_Q66_SQL, orders=load(spark, sf_dir, "orders"))


_Q67_SQL = """
    SELECT event_type, decile,
           count(*)               AS n,
           round(min(value), 2)   AS lo,
           round(max(value), 2)   AS hi,
           round(avg(value), 3)   AS avg_value
    FROM (
        SELECT event_type, value,
               CAST(ntile(10) OVER (PARTITION BY event_type
                               ORDER BY value, event_id) AS BIGINT) AS decile
        FROM {events}
    )
    GROUP BY event_type, decile
    ORDER BY event_type, decile
"""


@register(
    "q67_value_deciles",
    oracle=_Q67_SQL.replace("{events}", "events"),
)
def q67_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE decile profile per event type (the distribution view a
    monitoring dashboard reads). Spark and DuckDB share the ntile
    definition (even buckets, earlier buckets take the remainder);
    event_id tiebreak makes the frame fully deterministic.

    Scale: one hash exchange on event_type for the window, then the
    decile rollup reuses the same partitioning (no second wide
    shuffle of raw rows).
    """
    return spark.sql(_Q67_SQL, events=load(spark, sf_dir, "events"))


_Q68_SQL = """
    WITH purchasers AS (
        SELECT DISTINCT user_id FROM {events} WHERE event_type = 'purchase'),
    errorers AS (
        SELECT DISTINCT user_id FROM {events} WHERE event_type = 'error')
    SELECT
      (SELECT count(*) FROM (SELECT user_id FROM purchasers
                             INTERSECT
                             SELECT user_id FROM errorers)) AS n_both,
      (SELECT count(*) FROM (SELECT user_id FROM purchasers
                             EXCEPT
                             SELECT user_id FROM errorers)) AS n_purchase_only
"""


@register(
    "q68_user_set_ops",
    oracle=_Q68_SQL.replace("{events}", "events"),
)
def q68_user_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set operators (ANSI set semantics —
    distinct rows), completing the set-op family next to q08's UNION
    ALL: cohort overlap and difference.

    Scale: Spark plans both as LeftSemi/LeftAnti joins over
    pre-deduplicated inputs — same single-shuffle shape as q19; no
    row-id tricks or full sorts.
    """
    return spark.sql(_Q68_SQL, events=load(spark, sf_dir, "events"))


_Q69_SQL = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               count(*) AS n, round(sum(value), 2) AS total
        FROM {events}
        GROUP BY 1, 2
    ),
    bounds AS (
        SELECT event_type, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
    ),
    calendar AS (
        SELECT event_type, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
        FROM bounds
    )
    SELECT c.event_type,
           strftime(c.day, '%Y-%m-%d') AS day,
           COALESCE(d.n, 0) AS n,
           COALESCE(d.total, 0.0) AS total
    FROM calendar c
    LEFT JOIN daily d ON d.event_type = c.event_type AND d.day = c.day
    ORDER BY c.event_type, c.day
"""


@register(
    "q69_daily_gap_fill",
    oracle=_Q69_SQL.replace("{events}", "events"),
)
def q69_daily_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series GAP FILLING: per-type daily rollup joined onto a
    generated complete calendar (missing days appear with zeros) —
    the densification step every dashboard/forecast pipeline needs
    (≙ the reference's daily exports which assume dense days).

    Spark side: `sequence(d0, d1, interval 1 day)` + explode
    generates the calendar FROM the per-type bounds — no driver-side
    date loop; DuckDB's generate_series is the oracle equivalent.

    Scale: the calendar is |types| × days (tiny); the left join
    broadcasts the rollup, never the raw events.
    """
    e = load(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )
    bounds = daily.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    calendar = bounds.select(
        "event_type",
        F.explode(
            F.sequence("d0", "d1", F.expr("interval 1 day"))
        ).alias("day"),
    )
    return (
        calendar.join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n", F.lit(0).cast("long")).alias("n"),
            F.coalesce("total", F.lit(0.0)).alias("total"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "q73_unpivot_metrics",
    oracle="""
    WITH wide AS (
        SELECT o_orderpriority,
               round(avg(o_totalprice), 2) AS avg_price,
               round(min(o_totalprice), 2) AS min_price,
               round(max(o_totalprice), 2) AS max_price
        FROM orders GROUP BY 1
    )
    SELECT o_orderpriority, metric, value
    FROM wide
    UNPIVOT (value FOR metric IN (avg_price, min_price, max_price))
    ORDER BY o_orderpriority, metric
    """,
)
def q73_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt — wide metric columns to (metric, value) rows,
    the inverse layout transform of q47's PIVOT (DataFrame.unpivot ≡
    DuckDB UNPIVOT; reporting sinks want long format).

    Scale: unpivot plans as Expand (k output rows per input row) —
    map-side only, no shuffle beyond the tiny pre-agg.
    """
    o = load(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderpriority").agg(
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["avg_price", "min_price", "max_price"],
        variableColumnName="metric",
        valueColumnName="value",
    ).orderBy("o_orderpriority", "metric")


_Q77_SQL = """
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM {orders} o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (
          SELECT 1 FROM {lineitem} l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL '365' DAY)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
"""


@register(
    "q77_late_order_priority",
    oracle=_Q77_SQL.replace("{orders}", "orders").replace("{lineitem}", "lineitem"),
)
def q77_late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per-priority count of 1996 orders with at least
    one very late line (shipped >365 days after the order date — this
    corpus has no l_commitdate/l_receiptdate, so lateness is defined
    against o_orderdate; cutoff sits between the corpus's median 36 d
    and p90 1404 d, selecting ~2k of 15k orders at sf0.01).

    The EXISTS is correlated on BOTH an equality (l_orderkey) and a
    non-equi expression over an outer column (l_shipdate >
    o_orderdate + 365 d). Catalyst decorrelates to a LEFT SEMI hash
    join on the equality with the date bound as a residual join
    condition — no per-row subquery (plan-asserted).

    Scale: semi-join dedups lineitem matches without multiplying
    order rows; one shuffle on orderkey, then the tiny 5-priority agg.
    """
    return spark.sql(
        _Q77_SQL,
        orders=load(spark, sf_dir, "orders"),
        lineitem=load(spark, sf_dir, "lineitem"),
    )


_Q78_SQL = """
    SELECT c.c_name, o.o_orderkey,
           CAST(CAST(o.o_orderdate AS DATE) AS STRING) AS orderdate,
           o.o_totalprice,
           sum(l.l_quantity) AS total_qty
    FROM {customer} c
    JOIN {orders} o ON c.c_custkey = o.o_custkey
    JOIN {lineitem} l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l2.l_orderkey FROM {lineitem} l2
        GROUP BY l2.l_orderkey HAVING sum(l2.l_quantity) > 300)
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
    LIMIT 100
"""


@register(
    "q78_large_volume_orders",
    oracle=_Q78_SQL.replace("{customer}", "customer")
    .replace("{orders}", "orders")
    .replace("{lineitem}", "lineitem"),
)
def q78_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers behind large-volume orders — an IN
    over a GROUP BY ... HAVING subquery (orders whose total quantity
    exceeds 300; 46 of 15k at sf0.01).

    Decorrelation: the IN-over-aggregate becomes a LEFT SEMI join
    against the pre-aggregated orderkey set, so lineitem is
    aggregated ONCE for the filter and once for the output sum —
    both on the same l_orderkey partitioning, which AQE can reuse.
    Quantities are integral-valued doubles, so sum() is exact and
    needs no rounding for the oracle hash.

    Scale: both aggregates and the semi-join share one shuffle key
    (orderkey); customer joins via broadcast at dim size.
    """
    return spark.sql(
        _Q78_SQL,
        customer=load(spark, sf_dir, "customer"),
        orders=load(spark, sf_dir, "orders"),
        lineitem=load(spark, sf_dir, "lineitem"),
    )


_Q79_SQL = """
    SELECT l.l_partkey AS partkey,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS part_value
    FROM {lineitem} l
    GROUP BY l.l_partkey
    HAVING sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) > (
        SELECT sum(CAST(l2.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l2.l_discount AS DECIMAL(18,2)))) * 0.0008
        FROM {lineitem} l2)
    ORDER BY part_value DESC, partkey
"""


@register(
    "q79_important_part_value",
    oracle=_Q79_SQL.replace("{lineitem}", "lineitem"),
)
def q79_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose traded value exceeds a fraction of
    the GLOBAL traded value — an uncorrelated scalar subquery inside
    HAVING (no partsupp in this corpus, so lineitem value stands in
    for stock value; 0.0008 ≈ 1.6× the mean per-part share keeps the
    result a meaningful head, not all-or-nothing).

    The scalar subquery evaluates once (one extra aggregate job) and
    broadcasts as a literal into the HAVING filter — NOT a per-group
    probe. Both aggregations scan lineitem; Spark runs them as two
    jobs sharing the scan's columnar cache at cluster scale.

    Scale: one shuffle on partkey (map-side partial sums); the global
    sum is a partial-agg tree with a 1-row result.
    """
    return spark.sql(_Q79_SQL, lineitem=load(spark, sf_dir, "lineitem"))


_Q80_SQL = """
    WITH revenue AS (
        SELECT l.l_suppkey AS supplier_no,
               round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS total_revenue
        FROM {lineitem} l
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l.l_suppkey)
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM {supplier} s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(r2.total_revenue) FROM revenue r2)
    ORDER BY s.s_suppkey
"""


@register(
    "q80_top_revenue_supplier",
    oracle=_Q80_SQL.replace("{lineitem}", "lineitem").replace(
        "{supplier}", "supplier"
    ),
)
def q80_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum quarterly revenue
    — a CTE referenced twice (once as the join input, once under a
    scalar max) with equality against the scalar.

    Revenue is rounded BEFORE the max/equality so the comparison is
    on identical values in both engines (raw double sums are
    order-dependent; a near-tie could otherwise flip cross-engine).
    The scalar max is one extra 1-row job; the CTE's aggregate is
    computed per reference — at scale, persist the revenue CTE or
    let AQE reuse the exchange.

    Scale: one shuffle on suppkey over a date-pruned slice
    (PushedFilters carries the shipdate bounds to the scan).
    """
    return spark.sql(
        _Q80_SQL,
        lineitem=load(spark, sf_dir, "lineitem"),
        supplier=load(spark, sf_dir, "supplier"),
    )


_Q81_SQL = """
    SELECT s.s_name, count(*) AS numwait
    FROM {supplier} s
    JOIN {lineitem} l1 ON s.s_suppkey = l1.l_suppkey
    JOIN {orders} o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL '365' DAY
      AND EXISTS (
          SELECT 1 FROM {lineitem} l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
          SELECT 1 FROM {lineitem} l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o.o_orderdate + INTERVAL '365' DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
"""


@register(
    "q81_sole_late_supplier",
    oracle=_Q81_SQL.replace("{supplier}", "supplier")
    .replace("{lineitem}", "lineitem")
    .replace("{orders}", "orders"),
)
def q81_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper on a
    finished multi-supplier order — the classic stacked
    EXISTS + NOT EXISTS against the same fact table, both correlated
    on l1's orderkey, the NOT EXISTS additionally referencing the
    OUTER order's date (lateness is vs o_orderdate here; see q77).

    Decorrelation: EXISTS → LEFT SEMI on orderkey with the suppkey
    inequality as residual; NOT EXISTS → LEFT ANTI with the date
    bound as residual. Both hash joins — no nested loop
    (plan-asserted).

    Scale: three shuffles on orderkey (l1⋈o, semi, anti) — all the
    same key, so co-partitioning/AQE reuse applies; supplier dim
    broadcasts for the name lookup.
    """
    return spark.sql(
        _Q81_SQL,
        supplier=load(spark, sf_dir, "supplier"),
        lineitem=load(spark, sf_dir, "lineitem"),
        orders=load(spark, sf_dir, "orders"),
    )


_Q82_SQL = """
    SELECT CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
    FROM {lineitem} l
    JOIN {part} p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
"""


@register(
    "q82_disjunctive_revenue",
    oracle=_Q82_SQL.replace("{lineitem}", "lineitem").replace("{part}", "part"),
)
def q82_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate mixing
    columns from both join sides — the canonical test that the
    optimizer FACTORS the disjunction instead of evaluating it only
    post-join.

    Catalyst's constraint propagation derives the single-side
    implications: p_brand IN (12,23,3) AND p_size <= 35 reaches the
    part scan, l_quantity BETWEEN 1 AND 30 reaches the lineitem scan
    (both visible as PushedFilters — plan-asserted), and the full
    disjunction remains as the join's residual condition.

    Scale: the derived scan filters cut the join inputs ~10× before
    the broadcast join; without factoring, all of lineitem would
    flow into the join.
    """
    return spark.sql(
        _Q82_SQL,
        lineitem=load(spark, sf_dir, "lineitem"),
        part=load(spark, sf_dir, "part"),
    )


_Q83_SQL = """
    SELECT supp_nation, cust_nation, l_year,
           CAST(round(sum(volume), 2) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
               CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume
        FROM {supplier} s
        JOIN {lineitem} l ON s.s_suppkey = l.l_suppkey
        JOIN {orders} o ON o.o_orderkey = l.l_orderkey
        JOIN {customer} c ON c.c_custkey = o.o_custkey
        JOIN {nation} n1 ON s.s_nationkey = n1.n_nationkey
        JOIN {nation} n2 ON c.c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
           OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
"""


@register(
    "q83_nation_volume_shipping",
    oracle=_Q83_SQL.replace("{supplier}", "supplier")
    .replace("{lineitem}", "lineitem")
    .replace("{orders}", "orders")
    .replace("{customer}", "customer")
    .replace("{nation}", "nation"),
)
def q83_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral shipping volume between two nations
    by year — a 6-way join where the filter is a disjunction over a
    PAIR of dimension attributes (either trade direction).

    The nation dims broadcast twice (supplier side and customer
    side); Catalyst derives n_name IN (3,7) for BOTH broadcast
    builds from the disjunction, so each nation join drops 23/25 of
    keys before touching the facts. year() is cast to BIGINT in the
    shared SQL text (Spark's year() is int32, DuckDB's is int64 —
    the cast pins the driver's dtype compare).

    Scale: lineitem shuffles once on orderkey to meet orders; all
    dims broadcast. The nation filter semi-prunes supplier/customer
    before their joins, which AQE converts to broadcasts at dim size.
    """
    return spark.sql(
        _Q83_SQL,
        supplier=load(spark, sf_dir, "supplier"),
        lineitem=load(spark, sf_dir, "lineitem"),
        orders=load(spark, sf_dir, "orders"),
        customer=load(spark, sf_dir, "customer"),
        nation=load(spark, sf_dir, "nation"),
    )


_Q86_SQL = """
    SELECT c.c_custkey, c.c_name,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name
    FROM {customer} c
    JOIN {orders} o ON c.c_custkey = o.o_custkey
    JOIN {lineitem} l ON l.l_orderkey = o.o_orderkey
    JOIN {nation} n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
"""


@register(
    "q86_returned_item_customers",
    oracle=_Q86_SQL.replace("{customer}", "customer")
    .replace("{orders}", "orders")
    .replace("{lineitem}", "lineitem")
    .replace("{nation}", "nation"),
)
def q86_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue on RETURNED items
    in a quarter — the "who should support call back" report.

    Ordering is on the ROUNDED revenue with a custkey tiebreak, so
    the LIMIT boundary is deterministic cross-engine (raw double sums
    are summation-order-dependent). Scale: lineitem pre-filters on
    returnflag at the scan, one orderkey shuffle to meet orders, then
    a custkey-grouped agg; nation broadcasts; top-20 is TakeOrdered,
    no global sort.
    """
    return spark.sql(
        _Q86_SQL,
        customer=load(spark, sf_dir, "customer"),
        orders=load(spark, sf_dir, "orders"),
        lineitem=load(spark, sf_dir, "lineitem"),
        nation=load(spark, sf_dir, "nation"),
    )


_Q87_SQL = """
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM {orders} o
    JOIN {lineitem} l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
"""


@register(
    "q87_priority_line_counts",
    oracle=_Q87_SQL.replace("{orders}", "orders").replace("{lineitem}", "lineitem"),
)
def q87_priority_line_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per-linestatus counts of high- vs low-priority
    lines shipped in a year (no l_shipmode in this corpus, so
    linestatus is the dispatch dimension) — conditional aggregation
    folded into one pass.

    Scale: the date window prunes lineitem at the scan; one orderkey
    shuffle; both CASE sums ride the same aggregate (map-side
    partials) — never two scans for two counts.
    """
    return spark.sql(
        _Q87_SQL,
        orders=load(spark, sf_dir, "orders"),
        lineitem=load(spark, sf_dir, "lineitem"),
    )


_Q88_SQL = """
    SELECT round(
        CAST(100.0 AS DOUBLE)
        * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                   THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                   ELSE CAST(0.0 AS DECIMAL(18,2)) END) AS DOUBLE)
        / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE), 4) AS promo_revenue_pct
    FROM {lineitem} l
    JOIN {part} p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1996-02-01'
"""


@register(
    "q88_promo_revenue_share",
    oracle=_Q88_SQL.replace("{lineitem}", "lineitem").replace("{part}", "part"),
)
def q88_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo parts' share of a month's revenue — a
    conditional-numerator / total-denominator ratio in ONE aggregate
    (the naive form runs two scans or a self-join).

    Scale: month window pruned at the lineitem scan, part broadcast,
    single partial-aggregated reduction to one row.
    """
    return spark.sql(
        _Q88_SQL,
        lineitem=load(spark, sf_dir, "lineitem"),
        part=load(spark, sf_dir, "part"),
    )


_Q89_SQL = """
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM {part} p
    JOIN {lineitem} l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type <> 'ECONOMY'
      AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l.l_suppkey NOT IN (
          SELECT s.s_suppkey FROM {supplier} s WHERE s.s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
"""


@register(
    "q89_supplier_part_counts",
    oracle=_Q89_SQL.replace("{part}", "part")
    .replace("{lineitem}", "lineitem")
    .replace("{supplier}", "supplier"),
)
def q89_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per part attribute,
    excluding a brand/type slice and a NOT IN supplier denylist.

    The NOT IN subquery plans as a null-aware LEFT ANTI join (one
    broadcast of the tiny denylist), the attribute filters reach the
    part scan, and count(DISTINCT) expands to the standard two-level
    aggregate. Scale: one partkey join shuffle + one grouped distinct
    — no row explosion beyond the lineitem slice.
    """
    return spark.sql(
        _Q89_SQL,
        part=load(spark, sf_dir, "part"),
        lineitem=load(spark, sf_dir, "lineitem"),
        supplier=load(spark, sf_dir, "supplier"),
    )


_Q94_SQL = """
    SELECT o_year,
           CAST(round(sum(CASE WHEN nation = 'NATION_7' THEN volume ELSE 0 END)
                      / sum(volume), 6) AS DOUBLE) AS mkt_share
    FROM (
        SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS volume,
               n2.n_name AS nation
        FROM {part} p
        JOIN {lineitem} l ON p.p_partkey = l.l_partkey
        JOIN {supplier} s ON s.s_suppkey = l.l_suppkey
        JOIN {orders} o ON l.l_orderkey = o.o_orderkey
        JOIN {customer} c ON o.o_custkey = c.c_custkey
        JOIN {nation} n1 ON c.c_nationkey = n1.n_nationkey
        JOIN {region} r ON n1.n_regionkey = r.r_regionkey
        JOIN {nation} n2 ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
          AND p.p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
"""


@register(
    "q94_market_share",
    oracle=_Q94_SQL.replace("{part}", "part")
    .replace("{lineitem}", "lineitem")
    .replace("{supplier}", "supplier")
    .replace("{orders}", "orders")
    .replace("{customer}", "customer")
    .replace("{nation}", "nation")
    .replace("{region}", "region"),
)
def q94_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): an 8-way snowflake join
    where the SAME dimension (nation) joins twice under different
    roles (customer side restricts the market, supplier side labels
    the competitor), and the measure is a conditional-sum ratio.

    Per-row volumes are exact decimals cast to double BEFORE the sum,
    and the share is a double division rounded once — both engines
    produce bit-identical IEEE results. Scale: every dim broadcasts;
    lineitem takes the only shuffle (orderkey) and the p_type filter
    semi-prunes it through the part join before that shuffle; the
    final agg is 2 rows (one per year).
    """
    return spark.sql(
        _Q94_SQL,
        part=load(spark, sf_dir, "part"),
        lineitem=load(spark, sf_dir, "lineitem"),
        supplier=load(spark, sf_dir, "supplier"),
        orders=load(spark, sf_dir, "orders"),
        customer=load(spark, sf_dir, "customer"),
        nation=load(spark, sf_dir, "nation"),
        region=load(spark, sf_dir, "region"),
    )


_Q95_SQL = """
    SELECT nation, o_year,
           CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
    FROM (
        SELECT n.n_name AS nation,
               CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                    - CAST(p.p_retailprice AS DECIMAL(18,2)) * 0.1
                      * CAST(l.l_quantity AS DECIMAL(18,2)) AS DECIMAL(28,6)) AS amount
        FROM {part} p
        JOIN {lineitem} l ON p.p_partkey = l.l_partkey
        JOIN {supplier} s ON s.s_suppkey = l.l_suppkey
        JOIN {orders} o ON o.o_orderkey = l.l_orderkey
        JOIN {nation} n ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
"""


@register(
    "q95_product_profit",
    oracle=_Q95_SQL.replace("{part}", "part")
    .replace("{lineitem}", "lineitem")
    .replace("{supplier}", "supplier")
    .replace("{orders}", "orders")
    .replace("{nation}", "nation"),
)
def q95_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by nation and year): LIKE
    pattern filter on the part dimension ('%widget%' — this corpus's
    p_name vocabulary), profit = revenue minus cost
    as exact decimal arithmetic, grouped by every (nation, year).
    partsupp is absent from this corpus, so cost stands in as
    p_retailprice * 0.1 * quantity (same precedent as q34/Q2).

    The whole profit expression stays DECIMAL until the final
    rounded sum, so summation order cannot perturb the hash compare.
    Scale: the LIKE prunes part before its join (pushed to the scan),
    dims broadcast, lineitem shuffles once on orderkey; the agg is
    |nations| x |years| rows.
    """
    return spark.sql(
        _Q95_SQL,
        part=load(spark, sf_dir, "part"),
        lineitem=load(spark, sf_dir, "lineitem"),
        supplier=load(spark, sf_dir, "supplier"),
        orders=load(spark, sf_dir, "orders"),
        nation=load(spark, sf_dir, "nation"),
    )


_Q98_SQL = """
    WITH updates AS (
        SELECT o.o_custkey AS c_custkey,
               CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) * 0.01, 2) AS DOUBLE) AS delta
        FROM {orders} o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1996-07-01'
        GROUP BY o.o_custkey
    )
    SELECT c.c_custkey,
           CAST(1 AS BIGINT) AS version,
           CAST(round(CAST(c.c_acctbal AS DECIMAL(18,2)), 2) AS DOUBLE) AS acctbal,
           (u.c_custkey IS NULL) AS is_current
    FROM {customer} c
    LEFT JOIN updates u ON c.c_custkey = u.c_custkey
    UNION ALL
    SELECT c.c_custkey,
           CAST(2 AS BIGINT) AS version,
           CAST(round(CAST(c.c_acctbal AS DECIMAL(18,2)) + CAST(u.delta AS DECIMAL(18,2)), 2) AS DOUBLE) AS acctbal,
           TRUE AS is_current
    FROM {customer} c
    JOIN updates u ON c.c_custkey = u.c_custkey
    ORDER BY c_custkey, version
"""


@register(
    "q98_scd2_merge",
    oracle=_Q98_SQL.replace("{orders}", "orders").replace("{customer}", "customer"),
)
def q98_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 merge (the warehouse upsert
    shape Spark's plain parquet lacks a MERGE INTO for): a batch of
    per-customer balance updates closes the current version (old row
    kept, is_current=false) and appends a new current version;
    untouched customers keep their single current row.

    Semantics match the SQL oracle exactly: version 1 is every
    customer's original row (current only if no update arrived),
    version 2 exists only for updated customers. All balance math is
    decimal until the final rounded cast.

    Scale: this is one custkey-grouped agg over the update window +
    one broadcast-or-shuffle join against the dimension, then a
    union — the same plan MERGE INTO compiles to in lakehouse
    engines; at 100 TB the dimension join shuffles on the same key
    the agg just produced, so AQE reuses the partitioning.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    updates = (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
        )
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 0.01, 2
            )
            .cast("double")
            .alias("delta")
        )
    )
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    v1 = (
        c.join(updates, "c_custkey", "left")
        .select(
            "c_custkey",
            F.lit(1).cast("long").alias("version"),
            F.round(bal, 2).cast("double").alias("acctbal"),
            F.col("delta").isNull().alias("is_current"),
        )
    )
    v2 = (
        c.join(updates, "c_custkey", "inner")
        .select(
            "c_custkey",
            F.lit(2).cast("long").alias("version"),
            F.round(bal + F.col("delta").cast("decimal(18,2)"), 2)
            .cast("double")
            .alias("acctbal"),
            F.lit(True).alias("is_current"),
        )
    )
    return v1.unionByName(v2).orderBy("c_custkey", "version")


@register(
    "q106_hierarchy_closure",
    oracle="""
    WITH RECURSIVE walk AS (
        SELECT p_partkey AS node, p_partkey AS cur, 0 AS depth FROM part
        UNION ALL
        SELECT node, CAST(floor(cur / 2) AS BIGINT), depth + 1
        FROM walk WHERE cur > 1
    ),
    depths AS (
        SELECT node, CAST(max(depth) AS BIGINT) AS depth FROM walk GROUP BY node
    )
    SELECT depth, count(*) AS n_nodes, min(node) AS min_node, max(node) AS max_node
    FROM depths
    GROUP BY depth
    ORDER BY depth
    """,
)
def q106_hierarchy_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive hierarchy traversal (BOM explosion / org-chart
    depth) — the RECURSIVE CTE Spark's SQL dialect lacks, provided as
    an operator: every part sits in the binary tree parent(p) =
    floor(p/2); compute each node's depth to the root.

    Spark-first shape: POINTER JUMPING, not per-level recursion —
    each round joins the (node → ancestor, distance) relation with
    itself so ancestor pointers DOUBLE in reach: an 11-level
    hierarchy converges in 4 rounds instead of 11 (the same O(log
    depth) trick as q76's star operations), with per-round lineage
    truncation (localCheckpoint) against plan blowup — the iterative-
    operator discipline measured in operators/graph.py. The oracle is
    the real recursive CTE in DuckDB.

    Scale: each round is ONE self-equi-join on the ancestor key; the
    relation never exceeds |nodes| rows. At 100 TB this is the only
    viable closure shape — per-level loops are O(depth) full scans.
    """
    nodes = (
        load(spark, sf_dir, "part")
        .select(F.col("p_partkey").alias("node"))
        .distinct()
    )
    is_root = F.col("node") <= 1
    lab = nodes.select(
        "node",
        F.when(is_root, F.col("node"))
        .otherwise(F.floor(F.col("node") / 2).cast("long"))
        .alias("anc"),
        F.when(is_root, F.lit(0)).otherwise(F.lit(1)).cast("long").alias("d"),
    ).localCheckpoint()
    # pointer jumping: anc <- anc(anc), d <- d + d(anc); roots fix
    for _ in range(8):  # 2^8 levels >> any partkey hierarchy here
        if lab.filter(F.col("anc") > 1).isEmpty():
            break
        left = lab.alias("l")
        right = lab.select(
            F.col("node").alias("r_node"),
            F.col("anc").alias("r_anc"),
            F.col("d").alias("r_d"),
        ).alias("r")
        lab = (
            left.join(right, F.col("l.anc") == F.col("r_node"))
            .select(
                F.col("l.node").alias("node"),
                F.col("r_anc").alias("anc"),
                (F.col("l.d") + F.col("r_d")).alias("d"),
            )
            .localCheckpoint()
        )
    return (
        lab.groupBy(F.col("d").alias("depth"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("node").alias("min_node"),
            F.max("node").alias("max_node"),
        )
        .orderBy("depth")
    )


_Q107_SQL = """
    WITH names AS (
        SELECT DISTINCT p_name FROM {part}
    ),
    blocked AS (
        SELECT a.p_name AS name_a, b.p_name AS name_b
        FROM names a
        JOIN names b
          ON {noun_a} = {noun_b}
         AND a.p_name < b.p_name
         AND abs(length(a.p_name) - length(b.p_name)) <= 3
    )
    SELECT name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
    FROM blocked
    WHERE levenshtein(name_a, name_b) <= 3
    ORDER BY dist, name_a, name_b
"""


@register(
    "q107_fuzzy_name_join",
    oracle=_Q107_SQL.replace("{part}", "part")
    .replace("{noun_a}", "string_split(a.p_name, ' ')[-1]")
    .replace("{noun_b}", "string_split(b.p_name, ' ')[-1]"),
)
def q107_fuzzy_name_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate string self-join (entity-resolution shape): name
    pairs within edit distance 3, found WITHOUT the all-pairs scan —
    a BLOCKING key (the name's last token) turns the O(n²)
    comparison into per-block candidate sets, with the cheap length
    filter (|len(a)-len(b)| ≤ maxdist, a levenshtein lower bound)
    pruning before the expensive distance.

    Scale: this is the canonical fuzzy-dedup join discipline —
    levenshtein() is JVM built-in on both engines; candidates are
    Σ block² (bounded by block cardinality), never corpus²; at
    100 TB the block key shuffles once and hot blocks split under
    AQE. Same pattern as the LSH families, with an exact distance
    instead of a probabilistic signature.
    """
    names = (
        load(spark, sf_dir, "part").select("p_name").distinct()
    )
    noun = lambda c: F.element_at(F.split(c, " "), -1)  # noqa: E731
    a = names.select(
        F.col("p_name").alias("name_a"), noun(F.col("p_name")).alias("block_a")
    )
    b = names.select(
        F.col("p_name").alias("name_b"), noun(F.col("p_name")).alias("block_b")
    )
    pairs = a.join(
        b,
        (F.col("block_a") == F.col("block_b"))
        & (F.col("name_a") < F.col("name_b"))
        & (
            F.abs(F.length("name_a") - F.length("name_b")) <= 3
        ),
    )
    return (
        pairs.select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("long").alias("dist"),
        )
        .filter(F.col("dist") <= 3)
        .orderBy("dist", "name_a", "name_b")
    )


@register(
    "q110_snapshot_diff",
    oracle="""
    WITH snap_a AS (
        SELECT o_custkey AS k, count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY o_custkey
    ),
    snap_b AS (
        SELECT o_custkey AS k, count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
        GROUP BY o_custkey
    )
    SELECT CASE WHEN a.k IS NULL THEN 'added'
                WHEN b.k IS NULL THEN 'removed'
                WHEN a.n <> b.n OR a.total <> b.total THEN 'changed'
                ELSE 'unchanged' END AS change_type,
           count(*)                           AS n_keys,
           CAST(sum(coalesce(b.n, 0) - coalesce(a.n, 0)) AS BIGINT) AS row_delta
    FROM snap_a a
    FULL OUTER JOIN snap_b b ON a.k = b.k
    GROUP BY 1
    ORDER BY 1
    """,
)
def q110_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diffing (the CDC / dataset-versioning audit): two
    per-key aggregates of the same table at two logical versions
    (1995-97 vs 1998-2001 order windows — natural customer churn
    exercises every class) FULL OUTER joined on the key, every key
    classified added / removed / changed / unchanged with the net
    row delta — what a pipeline reports when a corpus version bumps.

    Scale: both snapshots group on the same key, so the outer join
    reuses the aggregation partitioning (no extra exchange under
    AQE); output is one row per change class. The same plan diffs
    two parquet snapshot directories at 100 TB.
    """
    o = load(spark, sf_dir, "orders")

    def snap(df):
        return df.groupBy(F.col("o_custkey").alias("k")).agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )

    cut = F.lit("1998-01-01").cast("timestamp")
    a = snap(o.filter(F.col("o_orderdate") < cut)).alias("a")
    b = snap(o.filter(F.col("o_orderdate") >= cut)).alias("b")
    j = a.join(b, F.col("a.k") == F.col("b.k"), "full_outer")
    change = (
        F.when(F.col("a.k").isNull(), "added")
        .when(F.col("b.k").isNull(), "removed")
        .when(
            (F.col("a.n") != F.col("b.n")) | (F.col("a.total") != F.col("b.total")),
            "changed",
        )
        .otherwise("unchanged")
    )
    return (
        j.select(
            change.alias("change_type"),
            (
                F.coalesce(F.col("b.n"), F.lit(0)) - F.coalesce(F.col("a.n"), F.lit(0))
            ).alias("delta"),
        )
        .groupBy("change_type")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("delta").cast("long").alias("row_delta"),
        )
        .orderBy("change_type")
    )


@register(
    "q111_data_profile",
    oracle="""
    SELECT 'o_totalprice' AS column_name,
           count(*)                                   AS n_rows,
           count(o_totalprice)                        AS n_nonnull,
           count(DISTINCT o_totalprice)               AS n_distinct,
           round(min(o_totalprice), 2)                AS min_val,
           round(max(o_totalprice), 2)                AS max_val,
           round(avg(o_totalprice), 4)                AS mean_val,
           round(stddev_samp(o_totalprice), 4)        AS std_val
    FROM orders
    UNION ALL
    SELECT 'o_custkey',
           count(*), count(o_custkey), count(DISTINCT o_custkey),
           round(min(o_custkey), 2), round(max(o_custkey), 2),
           round(avg(o_custkey), 4), round(stddev_samp(o_custkey), 4)
    FROM orders
    ORDER BY column_name
    """,
)
def q111_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (the Deequ/TFX-style dataset summary a
    pipeline materializes per snapshot): completeness, cardinality,
    and moments per column, all in ONE pass per table — every stat
    here is an algebraic aggregate, so Spark computes the full
    profile in a single scan with map-side partials.

    Scale: the profile costs one scan regardless of column count
    (all aggregates fuse into one HashAggregate); count(DISTINCT) is
    the only expansion and Spark plans the multi-distinct via Expand
    in the same job. Swap HLL for the distinct at extreme
    cardinality (operators/rollup.py).
    """
    o = load(spark, sf_dir, "orders")

    def profile(col):
        return o.select(
            F.lit(col).alias("column_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count(col).alias("n_nonnull"),
            F.countDistinct(col).alias("n_distinct"),
            F.round(F.min(col), 2).cast("double").alias("min_val"),
            F.round(F.max(col), 2).cast("double").alias("max_val"),
            F.round(F.avg(col), 4).alias("mean_val"),
            F.round(F.stddev_samp(col), 4).alias("std_val"),
        )

    return profile("o_totalprice").unionByName(profile("o_custkey")).orderBy(
        "column_name"
    )


@register(
    "q112_constraint_violations",
    oracle="""
    SELECT 'orderdate_in_range' AS constraint_name,
           count(*) FILTER (WHERE o_orderdate < TIMESTAMP '1995-01-01'
                               OR o_orderdate > TIMESTAMP '2001-12-31') AS n_violations,
           count(*) AS n_checked
    FROM orders
    UNION ALL
    SELECT 'totalprice_positive',
           count(*) FILTER (WHERE o_totalprice <= 0),
           count(*)
    FROM orders
    UNION ALL
    SELECT 'status_in_domain',
           count(*) FILTER (WHERE o_orderstatus NOT IN ('O', 'F', 'P')),
           count(*)
    FROM orders
    UNION ALL
    SELECT 'orderkey_unique',
           CAST((SELECT count(*) - count(DISTINCT o_orderkey) FROM orders) AS BIGINT),
           count(*)
    FROM orders
    UNION ALL
    SELECT 'custkey_referential',
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT),
           count(*)
    FROM orders
    ORDER BY constraint_name
    """,
)
def q112_constraint_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint checking (the Deequ verification suite
    shape): range, sign, domain, uniqueness, and referential
    integrity, each reported as violations over checked rows — the
    gate a pipeline evaluates before publishing a snapshot.

    Scale: ONE job, zero driver actions. The referential check rides a
    LEFT join onto the deduped dim key set (row count is preserved
    and a null probe key == anti-join membership) — UNHINTED, since
    the key set is dimension-grain and grows with the warehouse
    (Catalyst/AQE broadcast it whenever it fits, which it does at
    every tested SF); every constraint —
    the three row-local conditional counts, the uniqueness
    count-minus-distinct, and the null-probe referential count — then
    fuses into a SINGLE aggregate over that joined scan (the
    countDistinct plans as an Expand in the same job), and the 5-row
    report shape is a plan-side melt (explode of a struct array), not
    a driver-side assembly.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    dim = c.select(F.col("c_custkey").alias("ck")).dropDuplicates(["ck"])
    joined = o.join(dim, o["o_custkey"] == dim["ck"], "left")
    agg = joined.agg(
        F.count(F.lit(1)).alias("n_checked"),
        F.count(
            F.when(
                (F.col("o_orderdate") < F.lit("1995-01-01").cast("timestamp"))
                | (F.col("o_orderdate") > F.lit("2001-12-31").cast("timestamp")),
                1,
            )
        ).alias("v_range"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("v_price"),
        F.count(F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)).alias(
            "v_status"
        ),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("v_uniq"),
        F.count(F.when(F.col("ck").isNull(), 1)).alias("v_ref"),
    )

    def row(name: str, col: str):
        return F.struct(
            F.lit(name).alias("constraint_name"),
            F.col(col).alias("n_violations"),
            F.col("n_checked").alias("n_checked"),
        )

    return (
        agg.select(
            F.explode(
                F.array(
                    row("orderdate_in_range", "v_range"),
                    row("totalprice_positive", "v_price"),
                    row("status_in_domain", "v_status"),
                    row("orderkey_unique", "v_uniq"),
                    row("custkey_referential", "v_ref"),
                )
            ).alias("s")
        )
        .select("s.*")
        .orderBy("constraint_name")
    )


@register(
    "q115_group_ols_trend",
    oracle="""
    WITH xy AS (
        SELECT event_type,
               value AS y,
               CAST(epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01')
                    AS DOUBLE) / 86400000000e0 AS x
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT)            AS n,
           round(regr_slope(y, x), 4)          AS slope,
           round(regr_intercept(y, x), 4)      AS intercept,
           round(regr_r2(y, x), 4)             AS r2
    FROM xy
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q115_group_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares trend (metric drift over time): slope,
    intercept, and R^2 of value ~ days-since-epoch for every event
    type — the one-pass trend fit a monitoring pipeline runs per
    metric/segment.

    Scale: regr_slope/intercept/r2 are ALGEBRAIC aggregates (sums of
    x, y, xy, x^2, y^2), so the whole fit is one hash aggregate with
    map-side partials — no second pass, no window, no driver math.
    x is centered on a fixed literal epoch ('2024-01-01', the corpus
    start) so the normal-equation arithmetic isn't cancelling
    near-identical 1970-based day numbers — the standard
    numerical-stability guard for streaming regression at any scale.
    """
    e = load(spark, sf_dir, "events")
    xy = e.select(
        "event_type",
        F.col("value").alias("y"),
        (
            (
                F.unix_micros("ts")
                - F.unix_micros(F.lit("2024-01-01").cast("timestamp"))
            ).cast("double")
            / F.lit(86400000000.0)
        ).alias("x"),
    )
    return (
        xy.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.expr("regr_slope(y, x)"), 4).alias("slope"),
            F.round(F.expr("regr_intercept(y, x)"), 4).alias("intercept"),
            F.round(F.expr("regr_r2(y, x)"), 4).alias("r2"),
        )
        .orderBy("event_type")
    )


@register(
    "q117_pareto_frontier",
    oracle="""
    WITH pts AS (
        SELECT o_totalprice AS price, o_orderdate AS odate,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1, 2
    )
    SELECT round(price, 2) AS price,
           epoch_us(odate) AS odate_us,
           n_orders
    FROM pts p
    WHERE NOT EXISTS (
        SELECT 1 FROM pts q
        WHERE q.price >= p.price AND q.odate <= p.odate
          AND (q.price > p.price OR q.odate < p.odate))
    ORDER BY price DESC, odate_us
    """,
)
def q117_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (skyline): orders not dominated on
    (higher price, earlier date) — the multi-objective shortlist
    shape used to pick e.g. highest-quality-earliest-crawl documents
    without a scalar weighting.

    The oracle is an independent quadratic NOT EXISTS; the engine
    computes the same set in TWO WINDOW PASSES on the distinct
    point set: sorted by (price DESC, date ASC), a point is on the
    frontier iff no PRECEDING point has date <= its date (the
    preceding set is exactly the points with higher price, or equal
    price and earlier date, any of which dominates it) — a running
    MIN instead of an all-pairs join.

    Scale: pass 1 applies that cummin WITHIN hash buckets
    (partitionBy bucket: local domination is a subset of global, so
    only certainly-dominated points drop); pass 2 runs the global
    cummin over the few bucket-survivors. The full point set is
    never globally sorted on one machine — only the survivor set,
    which is frontier-sized per bucket. Integer/decimal comparisons
    only; no floats in the predicate.
    """
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    # o_orderdate decodes as TIMESTAMP_NTZ under Spark 4.1; the UTC
    # session makes the cast payload-preserving (same contract as
    # tables.normalize_event_ts) and unix_micros requires TIMESTAMP
    pts = o.groupBy(
        F.col("o_totalprice").alias("price"),
        F.col("o_orderdate").cast("timestamp").alias("odate"),
    ).agg(F.count(F.lit(1)).alias("n_orders"))

    def survivors(df, part_cols):
        base = Window.partitionBy(*part_cols) if part_cols else Window
        w = base.orderBy(F.desc("price"), F.asc("odate")).rowsBetween(
            Window.unboundedPreceding, -1
        )
        mp = F.min("odate").over(w)
        return df.withColumn("mp", mp).filter(
            F.col("mp").isNull() | (F.col("mp") > F.col("odate"))
        ).drop("mp")

    bucketed = pts.withColumn("bucket", F.pmod(F.hash("price"), F.lit(32)))
    local = survivors(bucketed, ["bucket"]).drop("bucket")
    frontier = survivors(local, [])
    return frontier.select(
        F.round("price", 2).alias("price"),
        F.unix_micros("odate").alias("odate_us"),
        "n_orders",
    ).orderBy(F.desc("price"), "odate_us")


@register(
    "q123_point_in_time_lookup",
    oracle="""
    WITH updated AS (
        SELECT DISTINCT o_custkey AS c_custkey
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-07-01'
    ),
    versions AS (
        SELECT c.c_custkey,
               CAST(1 AS BIGINT) AS version,
               TIMESTAMP '1990-01-01' AS valid_from,
               CASE WHEN u.c_custkey IS NOT NULL
                    THEN TIMESTAMP '1996-07-01' END AS valid_to
        FROM customer c LEFT JOIN updated u ON c.c_custkey = u.c_custkey
        UNION ALL
        SELECT c_custkey, CAST(2 AS BIGINT),
               TIMESTAMP '1996-07-01', NULL
        FROM updated
    ),
    pit AS (
        SELECT v.version, o.o_totalprice
        FROM orders o
        JOIN versions v
          ON o.o_custkey = v.c_custkey
         AND o.o_orderdate >= v.valid_from
         AND (v.valid_to IS NULL OR o.o_orderdate < v.valid_to)
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    )
    SELECT version,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS total_price
    FROM pit
    GROUP BY version
    ORDER BY version
    """,
)
def q123_point_in_time_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (PIT) lookup against an SCD2 dimension: each
    1996 order joins the dimension VERSION that was valid at its
    order date (version boundary 1996-07-01, the same update window
    q98's merge closes) — the temporal-correctness join every
    feature-store / training-data pipeline needs to avoid leakage
    from future dimension states.

    Scale: the validity test is an EQUI-join on the dimension key
    with the interval predicate as a post-join filter — per-key
    version fan-out is the number of versions (2 here), never a
    range-join explosion, and the dimension side broadcasts when
    small. The order-date window is pushed to the orders scan.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    od = F.col("o_orderdate")
    t = lambda s: F.lit(s).cast("timestamp")  # noqa: E731
    updated = (
        o.filter((od >= t("1996-01-01")) & (od < t("1996-07-01")))
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    v1 = c.join(updated.withColumn("u", F.lit(1)), "c_custkey", "left").select(
        "c_custkey",
        F.lit(1).cast("long").alias("version"),
        t("1990-01-01").alias("valid_from"),
        F.when(F.col("u").isNotNull(), t("1996-07-01")).alias("valid_to"),
    )
    v2 = updated.select(
        "c_custkey",
        F.lit(2).cast("long").alias("version"),
        t("1996-07-01").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    versions = v1.unionByName(v2)
    pit = (
        o.filter((od >= t("1996-01-01")) & (od < t("1997-01-01")))
        .join(versions, o["o_custkey"] == versions["c_custkey"])
        .filter(
            (od >= F.col("valid_from"))
            & (F.col("valid_to").isNull() | (od < F.col("valid_to")))
        )
    )
    return (
        pit.groupBy("version")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("version")
    )


@register(
    "q131_equiwidth_histogram",
    oracle="""
    WITH bounds AS (
        SELECT min(value) AS lo, max(value) AS hi FROM events
    ),
    binned AS (
        SELECT e.event_type,
               CAST(least(9, floor((e.value - b.lo) / (greatest(b.hi - b.lo, 1e-12) / 10))) AS BIGINT) AS bin
        FROM events e, bounds b
    )
    SELECT event_type, bin, count(*) AS n
    FROM binned
    GROUP BY event_type, bin
    ORDER BY event_type, bin
    """,
)
def q131_equiwidth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (10 bins over the global [min, max]) of
    event value per event_type — the distribution-shape profile that
    q111's moments summary and q109's PSI binning both presuppose; a
    one-pass answer to "what does this column look like" per
    category.

    Scale: one scalar min/max agg broadcast back onto the scan
    (Spark plans the bounds as a broadcast nested-loop of one row —
    no fact-side shuffle for the bin computation), then a map-side
    combined count on |event_types| × 10 keys. Two scans total,
    independent of row count; the identical shape DuckDB's CROSS
    JOIN of the one-row bounds CTE produces.

    The bin width is floored at epsilon (greatest(hi-lo, 1e-12),
    identically in both engines) so a degenerate all-equal column
    lands every row in bin 0 instead of riding 0/0 → NaN through
    engine-specific floor/least/CAST NaN semantics.
    """
    e = load(spark, sf_dir, "events")
    bounds = e.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    width = F.greatest(F.col("hi") - F.col("lo"), F.lit(1e-12)) / 10
    binned = e.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.least(
            F.lit(9),
            F.floor((F.col("value") - F.col("lo")) / width),
        )
        .cast("long")
        .alias("bin"),
    )
    return (
        binned.groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type", "bin")
    )


@register(
    "q150_ab_mean_ztest",
    oracle="""
    SELECT event_type,
           count(CASE WHEN user_id % 2 = 0 THEN value END) AS n_control,
           count(CASE WHEN user_id % 2 = 1 THEN value END) AS n_treat,
           round(avg(CASE WHEN user_id % 2 = 0 THEN value END), 4) AS mean_control,
           round(avg(CASE WHEN user_id % 2 = 1 THEN value END), 4) AS mean_treat,
           round((avg(CASE WHEN user_id % 2 = 1 THEN value END)
                  - avg(CASE WHEN user_id % 2 = 0 THEN value END))
                 / sqrt(var_samp(CASE WHEN user_id % 2 = 1 THEN value END)
                          / count(CASE WHEN user_id % 2 = 1 THEN value END)
                        + var_samp(CASE WHEN user_id % 2 = 0 THEN value END)
                          / count(CASE WHEN user_id % 2 = 0 THEN value END)), 4) AS z_score,
           abs(round((avg(CASE WHEN user_id % 2 = 1 THEN value END)
                - avg(CASE WHEN user_id % 2 = 0 THEN value END))
               / sqrt(var_samp(CASE WHEN user_id % 2 = 1 THEN value END)
                        / count(CASE WHEN user_id % 2 = 1 THEN value END)
                      + var_samp(CASE WHEN user_id % 2 = 0 THEN value END)
                        / count(CASE WHEN user_id % 2 = 0 THEN value END)), 4)) > 1.96 AS significant
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q150_ab_mean_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Welch z-test per event_type between a deterministic
    experiment split (control = even user_id, treatment = odd) — the
    experimentation readout an analytics engine serves daily:
    z = (m_t - m_c) / sqrt(s_t²/n_t + s_c²/n_c), flagged at the
    two-sided 5% level.

    Scale: ALL eight statistics (two counts, means, variances, z,
    verdict) come from ONE conditional aggregate over one scan —
    mean and variance are mergeable moments, so the partial agg
    collapses map-side and the exchange carries |event_types| rows.
    No per-variant subquery, no join, no second pass.

    NULL-value discipline: every n is count(value-in-arm) — non-NULL
    observations, the same population avg/var_samp describe — in
    BOTH engines, so a NULL value can never diverge the arms (the
    q125 defect class). The significance verdict compares the
    ROUNDED |z| to 1.96 so a summation-order ulp on an exactly-
    critical z can't flip the boolean cross-engine.
    """
    from g_etl_spark.operators.stats import welch_z_test

    e = load(spark, sf_dir, "events")
    return welch_z_test(
        e, ["event_type"], treat=F.col("user_id") % 2 == 1, value=F.col("value")
    )


@register(
    "q163_benford_first_digit",
    oracle="""
    WITH pos AS (
        SELECT event_type,
               CAST(substr(CAST(CAST(floor(value * 1000) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS fd
        FROM events WHERE value > 0.001
    ),
    obs AS (
        SELECT event_type, fd, count(*) AS o
        FROM pos GROUP BY event_type, fd
    ),
    n AS (SELECT event_type, CAST(sum(o) AS DOUBLE) AS n FROM obs GROUP BY event_type),
    grid AS (
        SELECT n.event_type, d.d, n.n, coalesce(obs.o, 0) AS o,
               n.n * ln(1.0 + 1.0 / d.d) / ln(10.0) AS e
        FROM n CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS d) d
        LEFT JOIN obs ON obs.event_type = n.event_type AND obs.fd = d.d
    )
    SELECT event_type, CAST(max(n) AS BIGINT) AS n,
           round(sum(pow(o - e, 2) / e), 4) AS chi2
    FROM grid
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q163_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law conformance per event_type: chi² of the
    first-significant-digit distribution against log10(1 + 1/d) —
    the classic fabricated-data / instrumentation-bug smell test for
    a numeric column (synthetic uniform-ish values score far from
    Benford; organic multiplicative data scores low).

    The first digit comes from the same integer-exact scaling as
    q160 (floor(value×1000) → decimal string), never floor(log10) —
    no float boundary can flip a digit cross-engine. Missing digits
    enter the chi² as zero-observation cells via the 9-digit grid.

    Scale: one map-side digit projection + a |types|×9 count — the
    chi² itself is arithmetic on that tiny grid. The same shape
    monitors any numeric column continuously for free.
    """
    e = load(spark, sf_dir, "events")
    pos = e.filter(F.col("value") > 0.001).select(
        "event_type",
        F.substring(
            F.floor(F.col("value") * 1000).cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("fd"),
    )
    obs = pos.groupBy("event_type", "fd").agg(F.count(F.lit(1)).alias("o"))
    n = obs.groupBy("event_type").agg(F.sum("o").cast("double").alias("n"))
    digits = spark.range(1, 10).select(F.col("id").alias("d"))
    grid = (
        n.crossJoin(F.broadcast(digits))
        .join(
            obs,
            (obs["event_type"] == n["event_type"]) & (obs["fd"] == F.col("d")),
            "left",
        )
        .select(
            n["event_type"],
            "d",
            "n",
            F.coalesce("o", F.lit(0)).alias("o"),
            (F.col("n") * F.log(1.0 + 1.0 / F.col("d")) / F.log(F.lit(10.0))).alias("e"),
        )
    )
    return (
        grid.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.round(
                F.sum(F.pow(F.col("o") - F.col("e"), 2) / F.col("e")), 4
            ).alias("chi2"),
        )
        .orderBy("event_type")
    )


@register(
    "q177_auc_rank",
    oracle="""
    WITH scored AS (
        SELECT CAST(floor(o_totalprice) AS BIGINT) AS score,
               CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS label
        FROM orders
    ),
    by_score AS (
        SELECT score,
               CAST(count(*) AS DOUBLE) AS cnt,
               CAST(sum(label) AS DOUBLE) AS pos
        FROM scored GROUP BY score
    ),
    ranked AS (
        SELECT pos, cnt,
               coalesce(sum(cnt) OVER (
                   ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) + (cnt + 1) / 2 AS avg_rank
        FROM by_score
    )
    SELECT round(
               (sum(pos * avg_rank)
                - sum(pos) * (sum(pos) + 1) / 2)
               / (sum(pos) * (sum(cnt) - sum(pos))), 6) AS auc,
           CAST(sum(pos) AS BIGINT) AS n_pos,
           CAST(sum(cnt) - sum(pos) AS BIGINT) AS n_neg
    FROM ranked
    """,
)
def q177_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of a score against a binary label via the
    Mann-Whitney rank-sum identity — the standard distributed way to
    evaluate a ranking model without materializing the O(P*N) pair
    set: AUC = (sum of positive average-ranks - P(P+1)/2) / (P*N),
    with ties handled by average ranks (midrank convention). Here:
    does order value predict high priority (the expected answer is
    ~0.5 on this synthetic data — the eval harness matters, not the
    verdict).

    Scale: the score is pre-bucketed to whole currency units (its
    own docstring's recipe, applied in the r7-verdict retrofit) so
    |distinct scores| is bounded by the price RANGE (~600k values),
    never by corpus size — midrank math is unchanged on the bucketed
    set and the oracle buckets identically. ONE map-side-combining
    groupBy collapses the corpus to that bounded set; the exclusive
    cumulative rank runs through the operators/ranking SIZE-AWARE
    dispatch: below the measured ~500k-row crossover the collapsed
    rollup takes the plain window (3-4× cheaper there — SCALE_NOTES
    round-8), above it the two-pass prefix sum with every WindowExec
    partitioned. No pair join ever exists.
    """
    from g_etl_spark.operators.ranking import (
        TWOPASS_CROSSOVER_ROWS,
        global_cumsum_twopass,
        log2_bucket,
    )

    o = load(spark, sf_dir, "orders")
    scored = o.select(
        F.floor(F.col("o_totalprice")).cast("long").alias("score"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        ).otherwise(0).alias("label"),
    )
    by_score = scored.groupBy("score").agg(
        F.count(F.lit(1)).cast("double").alias("cnt"),
        F.sum("label").cast("double").alias("pos"),
    )
    ranked = global_cumsum_twopass(
        by_score,
        "cnt",
        ["score"],
        log2_bucket(F.col("score")),
        out="prior",
        inclusive=False,
        threshold_rows=TWOPASS_CROSSOVER_ROWS,
    ).select(
        "pos",
        "cnt",
        (F.col("prior") + (F.col("cnt") + 1) / 2).alias("avg_rank"),
    )
    return ranked.agg(
        F.round(
            (
                F.sum(F.col("pos") * F.col("avg_rank"))
                - F.sum("pos") * (F.sum("pos") + 1) / 2
            )
            / (F.sum("pos") * (F.sum("cnt") - F.sum("pos"))),
            6,
        ).alias("auc"),
        F.sum("pos").cast("long").alias("n_pos"),
        (F.sum("cnt") - F.sum("pos")).cast("long").alias("n_neg"),
    )


@register(
    "q181_group_mode_median",
    oracle="""
    WITH counts AS (
        SELECT event_type, value, count(*) AS cnt
        FROM events GROUP BY event_type, value
    ),
    modes AS (
        SELECT event_type, value AS mode_value, cnt AS mode_count
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY event_type ORDER BY cnt DESC, value ASC
            ) AS rn
            FROM counts
        ) WHERE rn = 1
    ),
    med AS (
        SELECT event_type,
               round(quantile_cont(value, 0.5), 4) AS median_value
        FROM events GROUP BY event_type
    )
    SELECT m.event_type, round(m.mode_value, 4) AS mode_value,
           CAST(m.mode_count AS BIGINT) AS mode_count,
           med.median_value
    FROM modes m JOIN med USING (event_type)
    ORDER BY m.event_type
    """,
)
def q181_group_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode (most frequent value, smallest value on ties)
    and exact median — the two order statistics GROUP BY can't
    express directly. Mode via count-then-argmax; median via exact
    interpolated percentile (q39's convention).

    Scale: the mode path is two map-side-combining aggs — corpus ->
    (group, value) counts -> per-group max-struct argmax; no window
    over the corpus, no sort. The argmax struct orders by (cnt,
    -value) so the tie rule (smallest value wins) is encoded in ONE
    max. Median is the q39 trade: exact here, percentile_approx
    (mergeable t-digest) at 100 TB.
    """
    e = load(spark, sf_dir, "events")
    counts = e.groupBy("event_type", "value").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    modes = counts.groupBy("event_type").agg(
        F.max(F.struct(F.col("cnt"), (-F.col("value")).alias("nv"))).alias("m")
    ).select(
        "event_type",
        F.round(-F.col("m.nv"), 4).alias("mode_value"),
        F.col("m.cnt").cast("long").alias("mode_count"),
    )
    med = e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5D)"), 4).alias("median_value")
    )
    return modes.join(med, "event_type").orderBy("event_type")


@register(
    "q182_trimmed_robust_stats",
    oracle="""
    WITH bounds AS (
        SELECT event_type,
               quantile_cont(value, 0.1) AS lo,
               quantile_cont(value, 0.9) AS hi
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           round(avg(CASE WHEN e.value >= b.lo AND e.value <= b.hi
                          THEN e.value END), 4) AS trimmed_mean,
           round(avg(least(greatest(e.value, b.lo), b.hi)), 4)
               AS winsorized_mean,
           round(avg(e.value), 4) AS raw_mean,
           CAST(sum(CASE WHEN e.value < b.lo OR e.value > b.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
    FROM events e JOIN bounds b USING (event_type)
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
)
def q182_trimmed_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-90% trimmed mean and winsorized mean per group — the
    robust-location estimators an outlier-heavy metric pipeline
    reports alongside the raw mean (complements q126's MAD outlier
    FLAGGING with robust AGGREGATION). Trimmed drops the tails;
    winsorized clamps them to the decile bounds; n_clipped audits how
    much mass the tails held.

    Scale: pass 1 computes per-group decile bounds (exact here; the
    q39 percentile_approx trade at 100 TB); the |groups|-row bounds
    table broadcasts back onto the scan, so pass 2 is map-side
    clamp + one combining agg. Two scans total, zero corpus shuffles
    on the value column.
    """
    e = load(spark, sf_dir, "events")
    bounds = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.1D)").alias("lo"),
        F.expr("percentile(value, 0.9D)").alias("hi"),
    )
    j = e.join(F.broadcast(bounds), "event_type")
    inside = (F.col("value") >= F.col("lo")) & (F.col("value") <= F.col("hi"))
    return (
        j.groupBy("event_type")
        .agg(
            F.round(F.avg(F.when(inside, F.col("value"))), 4).alias(
                "trimmed_mean"
            ),
            F.round(
                F.avg(F.least(F.greatest("value", "lo"), F.col("hi"))), 4
            ).alias("winsorized_mean"),
            F.round(F.avg("value"), 4).alias("raw_mean"),
            F.sum(F.when(~inside, 1).otherwise(0))
            .cast("long")
            .alias("n_clipped"),
        )
        .orderBy("event_type")
    )


@register(
    "q184_bootstrap_ci",
    oracle="""
    WITH reps AS (SELECT unnest(range(0, 32)) AS b),
    weighted AS (
        SELECT reps.b,
               sum(((o_orderkey * 2654435761 + reps.b * 48611 + 12345)
                    % 2147483647) % 3) AS wsum,
               sum((((o_orderkey * 2654435761 + reps.b * 48611 + 12345)
                     % 2147483647) % 3) * o_totalprice) AS wtotal
        FROM orders CROSS JOIN reps
        GROUP BY reps.b
    ),
    means AS (SELECT wtotal / wsum AS m FROM weighted)
    SELECT round((SELECT avg(o_totalprice) FROM orders), 4) AS point_mean,
           round(quantile_cont(m, 0.025), 4) AS ci_lo,
           round(quantile_cont(m, 0.975), 4) AS ci_hi,
           round(stddev_samp(m), 4) AS boot_se
    FROM means
    """,
)
def q184_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval for the mean via the Poisson /
    multiplier bootstrap — THE distributed bootstrap: instead of
    resampling n rows with replacement (impossible without a global
    index), each row gets an integer weight per replicate drawn from
    a mean-1 distribution, and each replicate's weighted mean is one
    bootstrap draw. Weights here are a deterministic affine hash of
    (row id, replicate) mod 3 -> {0,1,2} (mean 1, variance 2/3 — a
    multiplier bootstrap; deterministic so the two engines agree
    bit-for-bit; the replicate stride 48611 is coprime with 3 — a
    stride divisible by 3 shifts the pre-mod value by 0 mod 3 and
    hands every replicate near-identical weights). 32 replicates -> percentile CI + bootstrap SE.

    Scale: the corpus never shuffles — the replicate dimension is a
    32-row broadcast, weights are map-side arithmetic, and the only
    exchange is 32 partial-agg'd (wsum, wtotal) pairs. At 100 TB this
    is exactly one extra scan regardless of B; the 32-row quantile is
    driver-trivial.
    """
    o = load(spark, sf_dir, "orders")
    reps = spark.range(0, 32).select(F.col("id").alias("b"))
    w = (
        (F.col("o_orderkey") * 2654435761 + F.col("b") * 48611 + 12345)
        % 2147483647
    ) % 3
    weighted = (
        o.crossJoin(F.broadcast(reps))
        .groupBy("b")
        .agg(
            F.sum(w).alias("wsum"),
            F.sum(w * F.col("o_totalprice")).alias("wtotal"),
        )
    )
    means = weighted.select((F.col("wtotal") / F.col("wsum")).alias("m"))
    point = o.agg(F.round(F.avg("o_totalprice"), 4).alias("point_mean"))
    return means.agg(
        F.round(F.expr("percentile(m, 0.025D)"), 4).alias("ci_lo"),
        F.round(F.expr("percentile(m, 0.975D)"), 4).alias("ci_hi"),
        F.round(F.stddev_samp("m"), 4).alias("boot_se"),
    ).crossJoin(F.broadcast(point)).select(
        "point_mean", "ci_lo", "ci_hi", "boot_se"
    )


@register(
    "q193_woe_iv_bins",
    oracle="""
    WITH scored AS (
        SELECT o_totalprice AS score,
               CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS y,
               o_orderkey
        FROM orders
    ),
    binned AS (
        SELECT ntile(10) OVER (ORDER BY score, o_orderkey) AS bin, y
        FROM scored
    ),
    tot AS (
        SELECT CAST(sum(y) AS DOUBLE) AS pos,
               CAST(sum(1 - y) AS DOUBLE) AS neg
        FROM binned
    ),
    per_bin AS (
        SELECT bin,
               CAST(count(*) AS BIGINT) AS n,
               (sum(y) + 0.5) / (max(tot.pos) + 0.5) AS pr,
               (sum(1 - y) + 0.5) / (max(tot.neg) + 0.5) AS nr
        FROM binned CROSS JOIN tot
        GROUP BY bin
    )
    SELECT CAST(bin AS INT) AS bin, n,
           round(ln(pr / nr), 6) AS woe,
           round((pr - nr) * ln(pr / nr), 6) AS iv_term,
           round(sum((pr - nr) * ln(pr / nr)) OVER (), 6) AS iv_total
    FROM per_bin
    ORDER BY bin
    """,
)
def q193_woe_iv_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value screen for a candidate
    feature against a binary target — the feature-selection sibling
    of q109's PSI (same binned log-ratio algebra, but predictive
    power instead of drift): decile-bin the score, WOE =
    ln(pos-rate/neg-rate) per bin with the 0.5 Laplace correction so
    empty cells stay finite, IV = Σ (pr−nr)·WOE. IV < 0.02 means the
    feature is useless; > 0.3 strong — q177's AUC gives the rank
    view, this gives the per-bin diagnosis.

    Scale: the decile assignment is the operators/ranking TWO-PASS
    global ntile (bucket-partitioned windows only — no corpus-scale
    single-partition sort; the r7-verdict retrofit of the q238/q240
    machinery); totals broadcast back; everything after is
    arithmetic on 10 rows. The iv_total column repeats the scalar on
    every row (broadcast of the 1-row total onto the 10-row bin set)
    so the result stays one tidy relation.
    """
    from g_etl_spark.operators.ranking import global_ntile_twopass, log2_bucket

    o = load(spark, sf_dir, "orders")
    scored = o.select(
        F.col("o_totalprice").alias("score"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        ).otherwise(0).alias("y"),
        "o_orderkey",
    )
    binned = global_ntile_twopass(
        scored, 10, ["score", "o_orderkey"], log2_bucket(F.col("score")), out="bin"
    ).select("bin", "y")
    tot = binned.agg(
        F.sum("y").cast("double").alias("pos"),
        F.sum(1 - F.col("y")).cast("double").alias("neg"),
    )
    per_bin = (
        binned.crossJoin(F.broadcast(tot))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            ((F.sum("y") + 0.5) / (F.max("pos") + 0.5)).alias("pr"),
            ((F.sum(1 - F.col("y")) + 0.5) / (F.max("neg") + 0.5)).alias("nr"),
        )
    )
    woe = F.log(F.col("pr") / F.col("nr"))
    iv_term = (F.col("pr") - F.col("nr")) * woe
    tot_iv = per_bin.agg(F.round(F.sum(iv_term), 6).alias("iv_total"))
    return (
        per_bin.crossJoin(F.broadcast(tot_iv))
        .select(
            F.col("bin").cast("int").alias("bin"),
            "n",
            F.round(woe, 6).alias("woe"),
            F.round(iv_term, 6).alias("iv_term"),
            "iv_total",
        )
        .orderBy("bin")
    )


@register(
    "q194_join_size_estimate",
    oracle="""
    WITH exact AS (
        SELECT CAST(count(*) AS DOUBLE) AS true_size
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    keys AS (
        SELECT o_orderkey AS k FROM orders
        WHERE ((o_orderkey * 2654435761 + 12345) % 2147483647) % 100 < 5
    ),
    est AS (
        SELECT CAST(count(*) AS DOUBLE) * 20.0 AS est_size,
               CAST(count(DISTINCT keys.k) AS BIGINT) AS n_sampled_keys
        FROM keys JOIN lineitem l ON l.l_orderkey = keys.k
    )
    SELECT CAST(exact.true_size AS BIGINT) AS true_size,
           CAST(est.est_size AS BIGINT) AS est_size,
           est.n_sampled_keys,
           round(abs(est.est_size - exact.true_size) / exact.true_size, 4)
               AS rel_error
    FROM exact CROSS JOIN est
    """,
)
def q194_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation by deterministic key sampling —
    the planner diagnostic that decides broadcast vs shuffle vs
    skew-salt BEFORE running a 100 TB join: hash-sample 5% of the
    build-side keys (coordinated sampling — the SAME hash selects the
    key on every table, so sampled keys join sampled keys), count the
    true join contribution of the sample, scale by 1/rate, and report
    the relative error against the exact size (affordable here; at
    scale only the estimate runs). The q179 skew screen says WHETHER
    keys are skewed; this says how big the join output will be.

    Scale: the estimate path scans the probe side once with a
    semi-join against the 5% key sample (broadcastable — it is 5% of
    a dimension); nothing corpus-sized shuffles. Estimation error
    concentrates as Σ per-key counts over the sample (end-biased at
    heavy keys — the docstring trade: sample ALL keys with count >
    1/rate exactly, sample the tail, the classic bifocal estimator).
    """
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    exact = (
        o.select("o_orderkey")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .agg(F.count(F.lit(1)).cast("double").alias("true_size"))
    )
    keys = o.select(F.col("o_orderkey").alias("k")).where(
        (
            (F.col("o_orderkey") * 2654435761 + 12345) % 2147483647
        ) % 100 < 5
    )
    est = (
        keys.join(li, F.col("l_orderkey") == F.col("k"))
        .agg(
            (F.count(F.lit(1)).cast("double") * 20.0).alias("est_size"),
            F.countDistinct("k").cast("long").alias("n_sampled_keys"),
        )
    )
    return (
        exact.crossJoin(est)
        .select(
            F.col("true_size").cast("long").alias("true_size"),
            F.col("est_size").cast("long").alias("est_size"),
            "n_sampled_keys",
            F.round(
                F.abs(F.col("est_size") - F.col("true_size"))
                / F.col("true_size"),
                4,
            ).alias("rel_error"),
        )
    )


@register(
    "q207_k_anonymity_audit",
    oracle="""
    WITH cls AS (
        SELECT c_mktsegment, c_nationkey,
               CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
               CAST(count(*) AS BIGINT) AS class_size
        FROM customer
        GROUP BY 1, 2, 3
    ),
    n AS (SELECT CAST(sum(class_size) AS DOUBLE) AS n FROM cls)
    SELECT class_size,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(class_size) AS BIGINT) AS n_rows,
           CAST(class_size < 5 AS BOOLEAN) AS at_risk,
           round(sum(class_size) / (SELECT n FROM n), 6) AS row_share
    FROM cls
    GROUP BY class_size
    ORDER BY class_size
    """,
)
def q207_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the customer table under the
    quasi-identifier (mktsegment, nationkey, acctbal/1000 band) —
    the privacy gate a training-data pipeline runs before releasing
    tabular records (companion to q46's PII redaction, which handles
    free text): group rows into equivalence classes on the
    quasi-identifier, histogram the class sizes, and flag the rows
    living in classes smaller than k=5 — those are re-identifiable
    and must be suppressed or generalized.

    Scale: one hash groupBy to the class relation (bounded by the
    quasi-identifier domain, not |rows|), then a second tiny agg on
    class_size; the total-row scalar broadcasts back. At 100 TB the
    class relation is the product of the generalized domains (here
    5 x 25 x ~11) — the whole audit is two partial-agg exchanges.
    """
    c = load(spark, sf_dir, "customer")
    cls = c.groupBy(
        "c_mktsegment",
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000.0).alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("class_size"))
    n = cls.agg(F.sum("class_size").cast("double").alias("n"))
    return (
        cls.groupBy("class_size")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("class_size").alias("n_rows"),
        )
        .crossJoin(F.broadcast(n))
        .select(
            "class_size",
            "n_classes",
            "n_rows",
            (F.col("class_size") < 5).alias("at_risk"),
            F.round(F.col("n_rows") / F.col("n"), 6).alias("row_share"),
        )
        .orderBy("class_size")
    )


@register(
    "q211_conformal_intervals",
    oracle="""
    WITH ev AS (
        SELECT event_type, event_id,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
        FROM events
    ),
    cal AS (SELECT * FROM ev WHERE event_id % 2 = 0),
    tst AS (SELECT * FROM ev WHERE event_id % 2 = 1),
    m AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_t,
               CAST(sum(vc) AS BIGINT) AS s
        FROM cal GROUP BY 1
    ),
    resid AS (
        SELECT c.event_type, m.n_t, m.s,
               abs(m.n_t * c.vc - m.s) AS rs,
               row_number() OVER (
                   PARTITION BY c.event_type
                   ORDER BY abs(m.n_t * c.vc - m.s), c.event_id
               ) AS rk
        FROM cal c JOIN m USING (event_type)
    ),
    q AS (
        SELECT event_type, n_t, s, rs AS qhat
        FROM resid
        WHERE rk = CAST(ceil(0.9 * (n_t + 1)) AS BIGINT)
    ),
    cov AS (
        SELECT t.event_type, CAST(count(*) AS BIGINT) AS n_test,
               CAST(sum(CASE WHEN abs(q.n_t * t.vc - q.s) <= q.qhat
                             THEN 1 ELSE 0 END) AS BIGINT) AS hits
        FROM tst t JOIN q USING (event_type) GROUP BY 1
    )
    SELECT q.event_type, q.n_t AS n_cal, cov.n_test,
           round(q.qhat / (q.n_t * 100.0), 4) AS q_hat,
           round(hits / CAST(cov.n_test AS DOUBLE), 6) AS coverage
    FROM q JOIN cov USING (event_type)
    ORDER BY q.event_type
    """,
)
def q211_conformal_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split conformal prediction per event type (alpha=0.1): the
    calibration half (even event_id) yields the ceil(0.9*(n+1))-th
    smallest absolute residual around the calibration mean as the
    distribution-free interval half-width q_hat; the test half
    reports empirical coverage — the finite-sample-guaranteed
    uncertainty band q178's calibration bins only diagnose.

    Integer-exact trick: values quantize to cents, and the residual
    compares |n_t·v − Σv| (both BIGINT) instead of |v − mean| — the
    same scaled-integer rank arithmetic as q177's quantized AUC, so
    the rank selection and the coverage comparison never touch float
    summation order; q_hat converts to value units only for display.

    Scale: one agg to per-type moments, one per-type window sort of
    the CALIBRATION residuals for the rank statistic (the collapsed
    relation is |cal| rows over |types| partitions; at 100 TB the
    q160 log-histogram sketch replaces the sort, the q196/q197
    precedent), and a map-side broadcast-join coverage count over the
    test half.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("vc"),
    )
    cal = ev.where(F.col("event_id") % 2 == 0)
    tst = ev.where(F.col("event_id") % 2 == 1)
    m = cal.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_t"), F.sum("vc").alias("s")
    )
    rs = F.abs(F.col("n_t") * F.col("vc") - F.col("s"))
    w = Window.partitionBy("event_type").orderBy(rs.asc(), F.col("event_id").asc())
    resid = (
        cal.join(F.broadcast(m), "event_type")
        .withColumn("rs", rs)
        .withColumn("rk", F.row_number().over(w))
    )
    q = resid.where(
        F.col("rk") == F.ceil(0.9 * (F.col("n_t") + 1)).cast("long")
    ).select("event_type", "n_t", "s", F.col("rs").alias("qhat"))
    cov = (
        tst.join(F.broadcast(q), "event_type")
        .groupBy("event_type", "n_t", "s", "qhat")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(
                F.when(
                    F.abs(F.col("n_t") * F.col("vc") - F.col("s")) <= F.col("qhat"), 1
                ).otherwise(0)
            ).alias("hits"),
        )
    )
    return cov.select(
        "event_type",
        F.col("n_t").alias("n_cal"),
        "n_test",
        F.round(F.col("qhat") / (F.col("n_t") * 100.0), 4).alias("q_hat"),
        F.round(F.col("hits") / F.col("n_test").cast("double"), 6).alias("coverage"),
    ).orderBy("event_type")


@register(
    "q221_did_estimate",
    oracle="""
    WITH cells AS (
        SELECT user_id % 2 = 1 AS treated,
               ts >= TIMESTAMP '2024-01-16 00:00:00' AS post,
               CAST(count(*) AS BIGINT) AS n,
               sum(value) AS sv,
               sum(value * value) AS svv
        FROM events
        GROUP BY 1, 2
    ),
    m AS (
        SELECT treated, post, n, sv / n AS mean,
               (svv - sv * sv / n) / (n - 1) AS var
        FROM cells
    ),
    wide AS (
        SELECT
            (SELECT mean FROM m WHERE treated AND post) AS tp,
            (SELECT mean FROM m WHERE treated AND NOT post) AS tr,
            (SELECT mean FROM m WHERE NOT treated AND post) AS cp,
            (SELECT mean FROM m WHERE NOT treated AND NOT post) AS cr,
            (SELECT var / n FROM m WHERE treated AND post)
            + (SELECT var / n FROM m WHERE treated AND NOT post)
            + (SELECT var / n FROM m WHERE NOT treated AND post)
            + (SELECT var / n FROM m WHERE NOT treated AND NOT post) AS v,
            (SELECT sum(n) FROM m) AS n_events
    )
    SELECT CAST(n_events AS BIGINT) AS n_events,
           round(tr, 4) AS treated_pre, round(tp, 4) AS treated_post,
           round(cr, 4) AS control_pre, round(cp, 4) AS control_post,
           round((tp - tr) - (cp - cr), 4) AS did,
           round(sqrt(v), 4) AS se,
           round(((tp - tr) - (cp - cr)) / sqrt(v), 3) AS t_stat
    FROM wide
    """,
)
def q221_did_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimate of the mid-month change in
    event value for the treated cohort (odd user_id) against the
    control (even), with the large-sample standard error from the
    four cell variances — the causal-inference readout an
    experimentation platform computes when assignment predates the
    intervention (q150's Welch z-test is the randomized-A/B special
    case; DiD subtracts the shared time trend the z-test cannot).

    Scale: the WHOLE estimator is one combining agg to four
    (treated, post) cells carrying mergeable moments (n, sum, sum of
    squares) — q150's single-exchange contract; every derived
    quantity is arithmetic on those 4 rows. Means/SE round at 4 and
    t at 3 (cell sums O(1e6); summation-order ulps ~1e-11).
    """
    e = load(spark, sf_dir, "events")
    cells = e.groupBy(
        (F.col("user_id") % 2 == 1).alias("treated"),
        (F.col("ts") >= F.lit("2024-01-16 00:00:00").cast("timestamp")).alias("post"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("sv"),
        F.sum(F.col("value") * F.col("value")).alias("svv"),
    )
    m = cells.select(
        "treated",
        "post",
        "n",
        (F.col("sv") / F.col("n")).alias("mean"),
        ((F.col("svv") - F.col("sv") * F.col("sv") / F.col("n")) / (F.col("n") - 1)).alias(
            "var"
        ),
    )

    def cell(tr: bool, po: bool, col: str):
        return F.max(
            F.when((F.col("treated") == tr) & (F.col("post") == po), F.col(col))
        )

    wide = m.agg(
        F.sum("n").alias("n_events"),
        cell(True, True, "mean").alias("tp"),
        cell(True, False, "mean").alias("tr"),
        cell(False, True, "mean").alias("cp"),
        cell(False, False, "mean").alias("cr"),
        (
            cell(True, True, "var") / F.max(F.when((F.col("treated")) & (F.col("post")), F.col("n")))
            + cell(True, False, "var") / F.max(F.when((F.col("treated")) & (~F.col("post")), F.col("n")))
            + cell(False, True, "var") / F.max(F.when((~F.col("treated")) & (F.col("post")), F.col("n")))
            + cell(False, False, "var") / F.max(F.when((~F.col("treated")) & (~F.col("post")), F.col("n")))
        ).alias("v"),
    )
    did = (F.col("tp") - F.col("tr")) - (F.col("cp") - F.col("cr"))
    return wide.select(
        F.col("n_events").cast("long").alias("n_events"),
        F.round("tr", 4).alias("treated_pre"),
        F.round("tp", 4).alias("treated_post"),
        F.round("cr", 4).alias("control_pre"),
        F.round("cp", 4).alias("control_post"),
        F.round(did, 4).alias("did"),
        F.round(F.sqrt("v"), 4).alias("se"),
        F.round(did / F.sqrt("v"), 3).alias("t_stat"),
    )


@register(
    "q224_eb_smoothed_rates",
    oracle="""
    WITH per_part AS MATERIALIZED (
        SELECT l_partkey,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS h
        FROM lineitem GROUP BY 1
    ),
    mom AS (
        SELECT avg(CAST(h AS DOUBLE) / n) AS m,
               (sum(pow(CAST(h AS DOUBLE) / n, 2))
                - pow(sum(CAST(h AS DOUBLE) / n), 2) / count(*))
               / (count(*) - 1) AS v,
               CAST(count(*) AS BIGINT) AS n_parts
        FROM per_part
    ),
    k AS (
        SELECT m, v, n_parts, m * (1 - m) / v - 1 AS kk FROM mom
    )
    SELECT p.l_partkey, p.n AS trials, p.h AS hits,
           round(CAST(p.h AS DOUBLE) / p.n, 6) AS raw_rate,
           round((p.h + k.m * k.kk) / (p.n + k.kk), 6) AS smoothed_rate,
           round(k.m, 6) AS prior_mean,
           round(k.kk, 4) AS prior_strength
    FROM per_part p CROSS JOIN k
    ORDER BY round((p.h + k.m * k.kk) / (p.n + k.kk), 6) DESC, p.l_partkey
    LIMIT 20
    """,
)
def q224_eb_smoothed_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes smoothed return rates per part (beta-binomial
    shrinkage, method-of-moments prior): raw rates h/n are noisy for
    low-volume parts, so every rate shrinks toward the global mean m
    with prior strength K = m(1−m)/Var(rates) − 1 — smoothed =
    (h + mK)/(n + K). This is THE standard CTR/defect-rate feature
    transform (the q193 WOE bins' continuous sibling): rankings by
    raw rate surface tiny-n flukes, rankings by smoothed rate are
    production-safe. Top-20 by smoothed rate.

    Scale: one part-keyed combining agg to (n, h) per part; the
    prior is a 1-row moments agg over that collapsed relation,
    broadcast back map-side. Ordering compares the ROUNDED smoothed
    rate (q162's contract) with the part id as tie-break, so the
    top-k is stable under float summation order (m, v carry ~1e-16
    engine noise; the rounded rate absorbs it).
    """
    li = load(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("h"),
    )
    rate = F.col("h").cast("double") / F.col("n")
    mom = per_part.agg(
        F.avg(rate).alias("m"),
        (
            (F.sum(F.pow(rate, 2)) - F.pow(F.sum(rate), 2) / F.count(F.lit(1)))
            / (F.count(F.lit(1)) - 1)
        ).alias("v"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    k = mom.select(
        "m", "v", (F.col("m") * (1 - F.col("m")) / F.col("v") - 1).alias("kk")
    )
    sm = F.round((F.col("h") + F.col("m") * F.col("kk")) / (F.col("n") + F.col("kk")), 6)
    return (
        per_part.crossJoin(F.broadcast(k))
        .select(
            "l_partkey",
            F.col("n").alias("trials"),
            F.col("h").alias("hits"),
            F.round(F.col("h").cast("double") / F.col("n"), 6).alias("raw_rate"),
            sm.alias("smoothed_rate"),
            F.round("m", 6).alias("prior_mean"),
            F.round("kk", 4).alias("prior_strength"),
        )
        .orderBy(F.desc("smoothed_rate"), "l_partkey")
        .limit(20)
    )


@register(
    "q225_cuped_adjustment",
    oracle="""
    WITH per_user AS MATERIALIZED (
        SELECT user_id,
               user_id % 2 = 1 AS treated,
               sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                        THEN value ELSE 0 END) AS pre,
               sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
                        THEN value ELSE 0 END) AS post
        FROM events GROUP BY 1, 2
    ),
    mom AS (
        SELECT count(*) AS n, avg(pre) AS mpre, avg(post) AS mpost,
               (sum(pre * post) - sum(pre) * sum(post) / count(*))
               / (count(*) - 1) AS cov,
               (sum(pre * pre) - sum(pre) * sum(pre) / count(*))
               / (count(*) - 1) AS vpre,
               (sum(post * post) - sum(post) * sum(post) / count(*))
               / (count(*) - 1) AS vpost
        FROM per_user
    ),
    th AS (SELECT *, cov / vpre AS theta FROM mom),
    adj AS (
        SELECT p.treated,
               p.post - th.theta * (p.pre - th.mpre) AS y,
               p.post AS raw
        FROM per_user p CROSS JOIN th
    ),
    arms AS (
        SELECT treated, count(*) AS n, avg(y) AS my, avg(raw) AS mraw,
               (sum(y * y) - sum(y) * sum(y) / count(*)) / (count(*) - 1) AS vy,
               (sum(raw * raw) - sum(raw) * sum(raw) / count(*))
               / (count(*) - 1) AS vraw
        FROM adj GROUP BY 1
    )
    SELECT
        CAST((SELECT n FROM mom) AS BIGINT) AS n_users,
        round((SELECT theta FROM th), 6) AS theta,
        round((SELECT cov * cov / (vpre * vpost) FROM th), 6) AS rho2,
        round((SELECT max(CASE WHEN treated THEN mraw END)
               - max(CASE WHEN NOT treated THEN mraw END) FROM arms), 4)
            AS raw_effect,
        round((SELECT max(CASE WHEN treated THEN my END)
               - max(CASE WHEN NOT treated THEN my END) FROM arms), 4)
            AS cuped_effect,
        round((SELECT sqrt(sum(vraw / n)) FROM arms), 4) AS raw_se,
        round((SELECT sqrt(sum(vy / n)) FROM arms), 4) AS cuped_se
    """,
)
def q225_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al., WSDM'13): adjust each
    user's post-period metric by theta x their pre-period covariate
    (theta = cov/var of pre), then re-estimate the treatment effect —
    the standard experimentation-platform trick that shrinks the
    standard error by a factor sqrt(1 − rho^2) with zero bias. Closes
    the experimentation stack: q150 (z-test) → q221 (DiD) → q225
    (CUPED), each one assumption weaker.

    Scale: ONE user-keyed combining agg produces (pre, post) per
    user; theta and all four arm moments are sums over that collapsed
    relation (two more tiny exchanges); nothing corpus-sized moves
    twice. All variances use the same expanded-moment literal form in
    both engines; outputs round at 4-6 with magnitudes O(1e2-1e3)
    (summation ulps 1e-10).
    """
    e = load(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    per_user = e.groupBy(
        "user_id", (F.col("user_id") % 2 == 1).alias("treated")
    ).agg(
        F.sum(F.when(F.col("ts") < cut, F.col("value")).otherwise(0.0)).alias("pre"),
        F.sum(F.when(F.col("ts") >= cut, F.col("value")).otherwise(0.0)).alias("post"),
    )
    n = F.count(F.lit(1))
    mom = per_user.agg(
        n.alias("n"),
        F.avg("pre").alias("mpre"),
        F.avg("post").alias("mpost"),
        ((F.sum(F.col("pre") * F.col("post")) - F.sum("pre") * F.sum("post") / n) / (n - 1)).alias("cov"),
        ((F.sum(F.col("pre") * F.col("pre")) - F.sum("pre") * F.sum("pre") / n) / (n - 1)).alias("vpre"),
        ((F.sum(F.col("post") * F.col("post")) - F.sum("post") * F.sum("post") / n) / (n - 1)).alias("vpost"),
    )
    th = mom.select("*", (F.col("cov") / F.col("vpre")).alias("theta"))
    adj = per_user.crossJoin(F.broadcast(th)).select(
        "treated",
        (F.col("post") - F.col("theta") * (F.col("pre") - F.col("mpre"))).alias("y"),
        F.col("post").alias("raw"),
    )
    arms = adj.groupBy("treated").agg(
        n.alias("na"),
        F.avg("y").alias("my"),
        F.avg("raw").alias("mraw"),
        ((F.sum(F.col("y") * F.col("y")) - F.sum("y") * F.sum("y") / n) / (n - 1)).alias("vy"),
        ((F.sum(F.col("raw") * F.col("raw")) - F.sum("raw") * F.sum("raw") / n) / (n - 1)).alias("vraw"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("treated"), F.col("mraw"))).alias("t_raw"),
        F.max(F.when(~F.col("treated"), F.col("mraw"))).alias("c_raw"),
        F.max(F.when(F.col("treated"), F.col("my"))).alias("t_y"),
        F.max(F.when(~F.col("treated"), F.col("my"))).alias("c_y"),
        F.sum(F.col("vraw") / F.col("na")).alias("sraw"),
        F.sum(F.col("vy") / F.col("na")).alias("sy"),
    )
    return (
        wide.crossJoin(F.broadcast(th))
        .select(
            F.col("n").cast("long").alias("n_users"),
            F.round("theta", 6).alias("theta"),
            F.round(F.col("cov") * F.col("cov") / (F.col("vpre") * F.col("vpost")), 6).alias("rho2"),
            F.round(F.col("t_raw") - F.col("c_raw"), 4).alias("raw_effect"),
            F.round(F.col("t_y") - F.col("c_y"), 4).alias("cuped_effect"),
            F.round(F.sqrt("sraw"), 4).alias("raw_se"),
            F.round(F.sqrt("sy"), 4).alias("cuped_se"),
        )
    )


@register(
    "q231_hill_tail_index",
    oracle="""
    WITH ev AS (
        SELECT event_type, event_id,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
        FROM events WHERE value > 0
    ),
    ranked AS (
        SELECT event_type, vc,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY vc DESC, event_id) AS rk
        FROM ev
    ),
    thresh AS MATERIALIZED (
        SELECT event_type, vc AS vk1 FROM ranked WHERE rk = 101
    ),
    top AS (
        SELECT r.event_type, r.vc, t.vk1
        FROM ranked r JOIN thresh t USING (event_type)
        WHERE r.rk <= 100
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS k,
           round(max(vk1) / 100.0, 2) AS threshold,
           round(count(*) / sum(ln(CAST(vc AS DOUBLE) / vk1)), 4) AS hill_alpha
    FROM top
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q231_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the tail index per event type (k=100 upper
    order statistics): alpha = k / Sigma ln(x_(i)/x_(k+1)) — the
    heavy-tail diagnostic that says whether means/variances are even
    finite, and the principled version of q132's Zipf fit (Zipf fits
    ranks of counts; Hill fits the value tail itself). Small alpha =
    heavy tail = sketch/sample-based operators need tail-aware
    bounds (q105's salting, q179's Gini both exist because of this).

    Values quantize to cents before the rank (q211/q226's contract)
    so the order statistics are integer-exact; ln runs on
    identically-derived doubles and the 100-term sum rounds at 4.

    Scale: one per-type window over the collapsed positive-value
    relation for the rank (|types| partitions; the q160 sketch
    replaces it at 100 TB), then a 100-row-per-type agg. Nothing
    else touches the corpus.
    """
    e = load(spark, sf_dir, "events").where(F.col("value") > 0)
    ev = e.select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("vc"),
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("vc"), "event_id")
    ranked = ev.withColumn("rk", F.row_number().over(w))
    thresh = ranked.where(F.col("rk") == 101).select(
        "event_type", F.col("vc").alias("vk1")
    )
    top = ranked.where(F.col("rk") <= 100).join(F.broadcast(thresh), "event_type")
    return (
        top.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.round(F.max("vk1") / 100.0, 2).alias("threshold"),
            F.round(
                F.count(F.lit(1))
                / F.sum(F.log(F.col("vc").cast("double") / F.col("vk1"))),
                4,
            ).alias("hill_alpha"),
        )
        .orderBy("event_type")
    )


@register(
    "q239_variant_json_rollup",
    oracle="""
    WITH x AS (
        SELECT event_type,
               CAST(json_extract(props, '$.k') AS BIGINT) AS k,
               value
        FROM events
    )
    SELECT event_type, CAST(k % 10 AS BIGINT) AS k_bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(k) AS BIGINT) AS min_k, CAST(max(k) AS BIGINT) AS max_k,
           round(sum(value), 2) AS sum_value
    FROM x
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q239_variant_json_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured rollup through Spark 4's VARIANT type:
    parse_json shreds the props payload ONCE into the binary variant
    encoding, variant_get does typed path extraction — the
    engine-native successor to q13's per-path get_json_object
    (variant parses the document a single time regardless of how
    many paths are later read, and the binary form is
    columnar-shreddable at the storage layer). The rollup buckets
    the extracted key per event type.

    Scale: parse + extract are map-side codegen expressions; the agg
    is one combining exchange to |types| x 10 cells. At 100 TB with
    many extracted paths, VARIANT's parse-once beats N x
    get_json_object re-parses — that asymmetry is the reason this
    query exists alongside q13 (and the oracle needs no variant:
    the typed values, not the encoding, are the contract).
    """
    e = load(spark, sf_dir, "events")
    v = F.parse_json("props")
    x = e.select(
        "event_type",
        F.variant_get(v, "$.k", "long").alias("k"),
        "value",
    )
    return (
        x.groupBy("event_type", (F.col("k") % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("event_type", "k_bucket")
    )


@register(
    "q240_uplift_deciles",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               user_id % 2 = 1 AS treated,
               sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                        THEN value ELSE 0 END) AS pre,
               sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
                        THEN value ELSE 0 END) AS post
        FROM events GROUP BY 1, 2
    ),
    dec AS (
        SELECT treated, post,
               ntile(5) OVER (ORDER BY pre, user_id) AS quintile
        FROM per_user
    ),
    arms AS (
        SELECT quintile, treated,
               CAST(count(*) AS BIGINT) AS n, sum(post) AS sv
        FROM dec GROUP BY 1, 2
    )
    SELECT a.quintile,
           a.n AS n_treated, b.n AS n_control,
           round(a.sv / a.n, 4) AS treated_mean,
           round(b.sv / b.n, 4) AS control_mean,
           round(a.sv / a.n - b.sv / b.n, 4) AS uplift
    FROM arms a JOIN arms b
      ON a.quintile = b.quintile AND a.treated AND NOT b.treated
    ORDER BY a.quintile
    """,
)
def q240_uplift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heterogeneous treatment effect by pre-period activity
    quintile: bucket users on their pre-period covariate, estimate
    the treated-vs-control post-period lift per bucket — the uplift
    profile that tells a targeting system WHO responds (q221/q225
    estimate one average effect; this is its decomposition, and the
    validation table for any uplift model). Quintiles use the exact
    (pre, user_id) order so both engines bucket identically.

    Scale: one user-keyed combining agg (the q225 relation), then
    the TWO-PASS global ntile (operators/ranking.py: log2 pre-bucket
    counts -> broadcast prefix offsets -> bucket-partitioned
    row_number; exact Spark/DuckDB ntile arithmetic) over the
    collapsed per-user rows, then a 10-cell arm agg. Lift is
    arithmetic on those cells. No relation funnels through a
    single-partition WindowExec even at billions of users (the r6
    ADVICE global-ntile item, retired).
    """
    from g_etl_spark.operators.ranking import global_ntile_twopass, log2_bucket

    e = load(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    per_user = e.groupBy(
        "user_id", (F.col("user_id") % 2 == 1).alias("treated")
    ).agg(
        F.sum(F.when(F.col("ts") < cut, F.col("value")).otherwise(0.0)).alias("pre"),
        F.sum(F.when(F.col("ts") >= cut, F.col("value")).otherwise(0.0)).alias("post"),
    )
    dec = global_ntile_twopass(
        per_user, 5, ["pre", "user_id"], log2_bucket(F.col("pre")), out="quintile"
    ).select("treated", "post", "quintile")
    arms = dec.groupBy("quintile", "treated").agg(
        F.count(F.lit(1)).alias("n"), F.sum("post").alias("sv")
    )
    a = arms.where("treated").select(
        "quintile", F.col("n").alias("n_treated"), F.col("sv").alias("sa")
    )
    b = arms.where(~F.col("treated")).select(
        "quintile", F.col("n").alias("n_control"), F.col("sv").alias("sb")
    )
    return (
        a.join(b, "quintile")
        .select(
            "quintile",
            "n_treated",
            "n_control",
            F.round(F.col("sa") / F.col("n_treated"), 4).alias("treated_mean"),
            F.round(F.col("sb") / F.col("n_control"), 4).alias("control_mean"),
            F.round(
                F.col("sa") / F.col("n_treated") - F.col("sb") / F.col("n_control"), 4
            ).alias("uplift"),
        )
        .orderBy("quintile")
    )


@register(
    "q242_rendezvous_sharding",
    oracle="""
    WITH shards AS (SELECT unnest(range(9)) AS s),
    w AS (
        SELECT d.doc_id, s.s,
               CAST(CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':'
                                        || CAST(s.s AS VARCHAR)), 1, 8)
                         AS UBIGINT) AS BIGINT) AS wt
        FROM documents d CROSS JOIN shards s
    ),
    a8 AS MATERIALIZED (
        SELECT doc_id, s AS shard8,
               row_number() OVER (PARTITION BY doc_id ORDER BY wt DESC, s) AS rk
        FROM w WHERE s < 8
        QUALIFY rk = 1
    ),
    a9 AS MATERIALIZED (
        SELECT doc_id, s AS shard9,
               row_number() OVER (PARTITION BY doc_id ORDER BY wt DESC, s) AS rk
        FROM w
        QUALIFY rk = 1
    ),
    j AS (
        SELECT a8.doc_id, a8.shard8, a9.shard9,
               a8.shard8 != a9.shard9 AS moved
        FROM a8 JOIN a9 USING (doc_id)
    )
    SELECT CAST(shard9 AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN moved THEN 1 ELSE 0 END) AS BIGINT) AS n_arrived,
           round(count(*) / (SELECT CAST(count(*) AS DOUBLE) FROM j), 4)
               AS shard_share
    FROM j
    GROUP BY shard9
    ORDER BY shard9
    """,
)
def q242_rendezvous_sharding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) shard planning: assign each
    document to argmax_s md5(doc_id:s) over 8 shards, then over 9,
    and report the per-shard population plus how many documents
    ARRIVED under the expansion — HRW's defining guarantee is that
    rebalancing moves ONLY the ~1/9 of keys that win on the new
    shard, nothing shuffles between old shards (n_arrived must be 0
    for shards 0-7; pinned by test). This is the placement scheme a
    100 TB layout uses so adding capacity does not rewrite the
    corpus (consistent-hashing family; operators/layout.py handles
    the file side, this is the key side).

    Scale: the weight fan-out is |docs| x 9 map-side md5s in
    codegen; the argmax is a 9-row-per-doc WindowGroupLimit; counts
    collapse per shard. Integer weights, (weight desc, shard)
    tie-break — fully deterministic in both engines.
    """
    d = load(spark, sf_dir, "documents").select("doc_id")
    shards = spark.range(9).select(F.col("id").alias("s"))
    wt = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        F.col("s").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("wt")
    )
    w = d.crossJoin(F.broadcast(shards)).select("doc_id", "s", wt)
    wk = Window.partitionBy("doc_id").orderBy(F.desc("wt"), "s")
    a8 = (
        w.where(F.col("s") < 8)
        .withColumn("rk", F.row_number().over(wk))
        .where(F.col("rk") == 1)
        .select("doc_id", F.col("s").alias("shard8"))
    )
    a9 = (
        w.withColumn("rk", F.row_number().over(wk))
        .where(F.col("rk") == 1)
        .select("doc_id", F.col("s").alias("shard9"))
    )
    j = a8.join(a9, "doc_id").select(
        "shard9", (F.col("shard8") != F.col("shard9")).alias("moved")
    )
    tot = j.agg(F.count(F.lit(1)).cast("double").alias("tot"))
    return (
        j.groupBy("shard9")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("moved"), 1).otherwise(0)).alias("n_arrived"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("shard9").alias("shard"),
            "n_docs",
            "n_arrived",
            F.round(F.col("n_docs") / F.col("tot"), 4).alias("shard_share"),
        )
        .orderBy("shard")
    )


@register(
    "q244_capture_recapture",
    oracle="""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    a AS (SELECT user_id FROM u WHERE (user_id * 2654435761) % 97 < 40),
    b AS (SELECT user_id FROM u WHERE (user_id * 104729) % 89 < 37),
    cell AS (
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS na,
               (SELECT CAST(count(*) AS BIGINT) FROM b) AS nb,
               (SELECT CAST(count(*) AS BIGINT)
                FROM a JOIN b USING (user_id)) AS nab,
               (SELECT CAST(count(*) AS BIGINT) FROM u) AS truth
    )
    SELECT na, nb, nab, truth,
           CAST(floor((na + 1.0) * (nb + 1.0) / (nab + 1.0) - 1.0) AS BIGINT)
               AS chapman_estimate,
           round((floor((na + 1.0) * (nb + 1.0) / (nab + 1.0) - 1.0) - truth)
                 / CAST(truth AS DOUBLE), 4) AS rel_error
    FROM cell
    """,
)
def q244_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chapman capture-recapture population estimate: two
    INDEPENDENT deterministic hash samples of the user population
    ("captures"), overlap-based estimate
    N = (na+1)(nb+1)/(nab+1) - 1, scored against the true distinct
    count — the statistical estimator for "how many distinct X exist
    when we can only sample" (unseen-species / dedup-undercount
    estimation), complementary to q113's HLL which needs to SEE
    every element once; capture-recapture extrapolates from partial
    visibility. Independence comes from coprime hash multipliers.

    Scale: two hash-filtered distinct aggs + one semi-join overlap
    count on the collapsed user relation; the estimator is 4-cell
    arithmetic, floored to an integer BEFORE the error division so
    the compare is exact.
    """
    e = load(spark, sf_dir, "events")
    u = e.select("user_id").distinct().persist()
    a = u.where((F.col("user_id") * 2654435761) % 97 < 40)
    b = u.where((F.col("user_id") * 104729) % 89 < 37)
    na = a.agg(F.count(F.lit(1)).alias("na"))
    nb = b.agg(F.count(F.lit(1)).alias("nb"))
    nab = a.join(b, "user_id", "left_semi").agg(F.count(F.lit(1)).alias("nab"))
    truth = u.agg(F.count(F.lit(1)).alias("truth"))
    est = F.floor(
        (F.col("na") + 1.0) * (F.col("nb") + 1.0) / (F.col("nab") + 1.0) - 1.0
    ).cast("long")
    out = (
        na.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(nab))
        .crossJoin(F.broadcast(truth))
        .select(
            "na",
            "nb",
            "nab",
            "truth",
            est.alias("chapman_estimate"),
            F.round(
                (est - F.col("truth")) / F.col("truth").cast("double"), 4
            ).alias("rel_error"),
        )
        .localCheckpoint(eager=True)
    )
    u.unpersist()
    return out


@register(
    "q245_exponential_survival_mle",
    oracle="""
    WITH span AS (
        SELECT user_id,
               CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS obs_s,
               CAST(count(*) AS BIGINT) AS n_ev
        FROM events GROUP BY user_id
    ),
    seg AS (
        SELECT user_id % 2 = 1 AS odd_cohort, obs_s, n_ev
        FROM span WHERE n_ev >= 2
    )
    SELECT odd_cohort,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(n_ev - 1) AS BIGINT) AS n_gaps,
           CAST(sum(obs_s) AS BIGINT) AS exposure_s,
           round(sum(n_ev - 1) / (sum(obs_s) / 3600.0), 6) AS rate_per_hour,
           round((sum(obs_s) / 3600.0) / sum(n_ev - 1), 4) AS mean_gap_hours,
           round(sqrt(CAST(sum(n_ev - 1) AS DOUBLE))
                 / (sum(obs_s) / 3600.0), 6) AS rate_se
    FROM seg
    GROUP BY odd_cohort
    ORDER BY odd_cohort
    """,
)
def q245_exponential_survival_mle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential inter-event rate MLE per cohort: lambda =
    events / exposure with its Poisson standard error sqrt(d)/T —
    the parametric counterpart of q157's nonparametric Kaplan-Meier
    (KM draws the curve; the exponential MLE compresses it to one
    hazard number you can compare across cohorts and monitor). Users
    contribute (n_ev - 1) gap events over their observed span;
    single-event users carry no gap information and are excluded
    identically in both engines.

    Scale: ONE user-keyed combining agg (min/max/count per user),
    then a 2-cell cohort agg — the q150/q221 moment-collapse
    contract. All counts and exposures are exact integers; only the
    final rates divide.
    """
    e = load(spark, sf_dir, "events")
    span = e.groupBy("user_id").agg(
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias("obs_s"),
        F.count(F.lit(1)).alias("n_ev"),
    )
    seg = span.where(F.col("n_ev") >= 2).select(
        (F.col("user_id") % 2 == 1).alias("odd_cohort"), "obs_s", "n_ev"
    )
    return (
        seg.groupBy("odd_cohort")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.col("n_ev") - 1).alias("n_gaps"),
            F.sum("obs_s").alias("exposure_s"),
        )
        .select(
            "odd_cohort",
            "n_users",
            "n_gaps",
            "exposure_s",
            F.round(F.col("n_gaps") / (F.col("exposure_s") / 3600.0), 6).alias(
                "rate_per_hour"
            ),
            F.round((F.col("exposure_s") / 3600.0) / F.col("n_gaps"), 4).alias(
                "mean_gap_hours"
            ),
            F.round(
                F.sqrt(F.col("n_gaps").cast("double"))
                / (F.col("exposure_s") / 3600.0),
                6,
            ).alias("rate_se"),
        )
        .orderBy("odd_cohort")
    )


@register(
    "q247_dq_verification_suite",
    oracle="""
    SELECT * FROM (
        SELECT 'lineitem_discount_in_range' AS check_name,
               round(sum(CASE WHEN l_discount BETWEEN 0.0 AND 1.0
                              THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS metric,
               1.0 AS threshold,
               sum(CASE WHEN l_discount BETWEEN 0.0 AND 1.0 THEN 0 ELSE 1
                   END) = 0 AS pass
        FROM lineitem
        UNION ALL
        SELECT 'orders_custkey_complete',
               round(1.0 - sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                     * 1.0 / count(*), 6),
               1.0,
               sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) = 0
        FROM orders
        UNION ALL
        SELECT 'orders_custkey_ri',
               round(sum(CASE WHEN c.c_custkey IS NOT NULL THEN 1 ELSE 0 END)
                     * 1.0 / count(*), 6),
               1.0,
               sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) = 0
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        UNION ALL
        SELECT 'orders_orderkey_unique',
               round(count(DISTINCT o_orderkey) * 1.0 / count(*), 6),
               1.0,
               count(DISTINCT o_orderkey) = count(*)
        FROM orders
        UNION ALL
        SELECT 'orders_row_count_min',
               CAST(count(*) AS DOUBLE), 100.0, count(*) >= 100
        FROM orders
        UNION ALL
        SELECT 'orders_status_accepted',
               round(sum(CASE WHEN o_orderstatus IN ('O', 'F', 'P')
                              THEN 1 ELSE 0 END) * 1.0 / count(*), 6),
               1.0,
               sum(CASE WHEN o_orderstatus IN ('O', 'F', 'P') THEN 0 ELSE 1
                   END) = 0
        FROM orders
    ) ORDER BY check_name
    """,
)
def q247_dq_verification_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality verification suite — the
    Deequ/dbt-test contract layer a production pipeline runs before
    promoting a batch: completeness (null fraction), uniqueness
    (key cardinality ratio), referential integrity (FK containment
    via LEFT JOIN), value-range and accepted-set conformance, and a
    minimum-volume gate, each emitted as (check, metric, threshold,
    pass). Pass verdicts come from EXACT integer violation counts,
    never from comparing the rounded metric — no FP-boundary flakes.

    Reference parity: the reference validates sources structurally
    at load (source-existence gates, src/g_etl/pipeline.py:216;
    geometry validity via ST_IsValid/ST_MakeValid,
    sql/migrations/003_db_makros.sql:28-29); this is the same gate
    generalized to declarative content constraints over arbitrary
    tables.

    Scale: every check is ONE combining aggregate over its table
    (map-side partials, 1-row result); the RI check is the only
    join and it is a key-equi join that AQE/broadcast handles (dim
    side = customer keys). Checks on the same table could share one
    pass via a multi-aggregate; kept separate here so each check
    names its own relation, like Deequ's analyzers.
    """
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    c = load(spark, sf_dir, "customer")

    def chk(name, metric, threshold, passed):
        return F.struct(
            F.lit(name).alias("check_name"),
            metric.alias("metric"),
            F.lit(threshold).alias("threshold"),
            passed.alias("pass"),
        )

    cnt = F.count(F.lit(1))
    disc_ok = F.sum(
        F.when(F.col("l_discount").between(0.0, 1.0), 1).otherwise(0)
    )
    r1 = li.agg(
        chk(
            "lineitem_discount_in_range",
            F.round(disc_ok * 1.0 / cnt, 6),
            1.0,
            (cnt - disc_ok) == 0,
        ).alias("s")
    )
    nulls = F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
    r2 = o.agg(
        chk(
            "orders_custkey_complete",
            F.round(1.0 - nulls * 1.0 / cnt, 6),
            1.0,
            nulls == 0,
        ).alias("s")
    )
    matched = F.sum(F.when(F.col("c_custkey").isNotNull(), 1).otherwise(0))
    r3 = (
        o.join(c.select("c_custkey"), o["o_custkey"] == c["c_custkey"], "left")
        .agg(
            chk(
                "orders_custkey_ri",
                F.round(matched * 1.0 / cnt, 6),
                1.0,
                (cnt - matched) == 0,
            ).alias("s")
        )
    )
    r4 = o.agg(
        chk(
            "orders_orderkey_unique",
            F.round(F.countDistinct("o_orderkey") * 1.0 / cnt, 6),
            1.0,
            F.countDistinct("o_orderkey") == cnt,
        ).alias("s")
    )
    r5 = o.agg(
        chk("orders_row_count_min", cnt.cast("double"), 100.0, cnt >= 100).alias("s")
    )
    status_ok = F.sum(
        F.when(F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
    )
    r6 = o.agg(
        chk(
            "orders_status_accepted",
            F.round(status_ok * 1.0 / cnt, 6),
            1.0,
            (cnt - status_ok) == 0,
        ).alias("s")
    )
    return (
        r1.unionAll(r2).unionAll(r3).unionAll(r4).unionAll(r5).unionAll(r6)
        .select("s.*")
        .orderBy("check_name")
    )


@register(
    "q249_decision_stump",
    oracle="""
    WITH bins AS (
        SELECT p_size AS s, CAST(count(*) AS BIGINT) AS n,
               sum(p_retailprice) AS sv, sum(p_retailprice * p_retailprice) AS svv
        FROM part GROUP BY 1
    ),
    cum AS (
        SELECT s,
               sum(n)  OVER w AS nl, sum(sv)  OVER w AS svl, sum(svv) OVER w AS svvl,
               (SELECT sum(n) FROM bins)  AS nt,
               (SELECT sum(sv) FROM bins)  AS svt,
               (SELECT sum(svv) FROM bins) AS svvt
        FROM bins
        WINDOW w AS (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    gains AS (
        SELECT s AS split_at, CAST(nl AS BIGINT) AS n_left,
               CAST(nt - nl AS BIGINT) AS n_right,
               (svvt - svt * svt / nt)
               - ((svvl - svl * svl / nl)
                  + (svvt - svvl - (svt - svl) * (svt - svl) / (nt - nl)))
                   AS gain
        FROM cum WHERE nl < nt
    )
    SELECT split_at, n_left, n_right, round(gain, 4) AS sse_gain
    FROM gains ORDER BY round(gain, 4) DESC, split_at LIMIT 5
    """,
)
def q249_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regression decision stump: the best single split of
    p_retailprice by p_size, scored by SSE reduction — the base
    learner of every gradient-boosting / random-forest pipeline, and
    the one-pass feature screen (a large gain = the feature carries
    signal; q193's WOE/IV for a continuous target). Candidate
    thresholds are the feature's value grid; emits the top-5 splits
    with left/right populations.

    Scale: ONE corpus aggregate collapses to per-value mergeable
    moments (n, sum, sum-sq) on the bounded feature grid (|p_size|
    = 50 cells); the cumulative-prefix scan and gain arithmetic run
    on that bounded relation (the window orders 50 rows — bounded by
    the feature domain, not the corpus, the q243 bounded-bin
    precedent). Growing a full tree = re-running this per node on
    filtered partitions; the per-pass cost never exceeds one scan.
    """
    p = load(spark, sf_dir, "part")
    bins = p.groupBy(F.col("p_size").alias("s")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("p_retailprice").alias("sv"),
        F.sum(F.col("p_retailprice") * F.col("p_retailprice")).alias("svv"),
    )
    tot = bins.agg(
        F.sum("n").alias("nt"), F.sum("sv").alias("svt"), F.sum("svv").alias("svvt")
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        bins.select(
            "s",
            F.sum("n").over(w).alias("nl"),
            F.sum("sv").over(w).alias("svl"),
            F.sum("svv").over(w).alias("svvl"),
        )
        .crossJoin(F.broadcast(tot))
        .where(F.col("nl") < F.col("nt"))
    )
    sse_t = F.col("svvt") - F.col("svt") * F.col("svt") / F.col("nt")
    sse_l = F.col("svvl") - F.col("svl") * F.col("svl") / F.col("nl")
    sse_r = (
        (F.col("svvt") - F.col("svvl"))
        - (F.col("svt") - F.col("svl"))
        * (F.col("svt") - F.col("svl"))
        / (F.col("nt") - F.col("nl"))
    )
    gains = cum.select(
        F.col("s").alias("split_at"),
        F.col("nl").cast("long").alias("n_left"),
        (F.col("nt") - F.col("nl")).cast("long").alias("n_right"),
        F.round(sse_t - (sse_l + sse_r), 4).alias("sse_gain"),
    )
    return gains.orderBy(F.desc("sse_gain"), "split_at").limit(5)


@register(
    "q250_ridge_regression",
    oracle="""
    WITH m AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               sum(l_quantity) AS sx, sum(l_discount) AS sz,
               sum(l_extendedprice) AS sy,
               sum(l_quantity * l_quantity) AS sxx,
               sum(l_discount * l_discount) AS szz,
               sum(l_quantity * l_discount) AS sxz,
               sum(l_quantity * l_extendedprice) AS sxy,
               sum(l_discount * l_extendedprice) AS szy
        FROM lineitem
    ),
    c AS (
        SELECT n,
               sxx - sx * sx / n AS cxx, szz - sz * sz / n AS czz,
               sxz - sx * sz / n AS cxz, sxy - sx * sy / n AS cxy,
               szy - sz * sy / n AS czy,
               sx / n AS mx, sz / n AS mz, sy / n AS my
        FROM m
    ),
    f AS (
        SELECT n, mx, mz, my, cxy, czy,
               (cxx + 10.0) * (czz + 10.0) - cxz * cxz AS det,
               ((czz + 10.0) * cxy - cxz * czy) AS num1,
               ((cxx + 10.0) * czy - cxz * cxy) AS num2
        FROM c
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           round(num1 / det, 6) AS beta_quantity,
           round(num2 / det, 6) AS beta_discount,
           round(my - (num1 / det) * mx - (num2 / det) * mz, 4) AS intercept
    FROM f
    """,
)
def q250_ridge_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form ridge regression (lambda = 10) of extended price
    on (quantity, discount): center via the mergeable raw moments,
    solve the 2x2 regularized normal equations by Cramer's rule —
    the multi-feature generalization of q115's OLS trend and the
    degenerate-collinearity-safe fit a feature pipeline runs per
    segment (ridge keeps det > 0 even when features correlate
    perfectly; OLS would divide by ~0). The parameter-server shape
    without parameter shipping: the model IS the aggregate.

    Scale: ONE corpus aggregate to 9 mergeable moment cells — the
    d-feature version is d(d+3)/2 cells, still one combining agg
    (q158's covariance-cell pattern); solving is O(d^3) driver-free
    arithmetic on that bounded relation. Identical formulas on both
    engines, rounded after the solve.
    """
    li = load(spark, sf_dir, "lineitem")
    m = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("l_quantity").alias("sx"),
        F.sum("l_discount").alias("sz"),
        F.sum("l_extendedprice").alias("sy"),
        F.sum(F.col("l_quantity") * F.col("l_quantity")).alias("sxx"),
        F.sum(F.col("l_discount") * F.col("l_discount")).alias("szz"),
        F.sum(F.col("l_quantity") * F.col("l_discount")).alias("sxz"),
        F.sum(F.col("l_quantity") * F.col("l_extendedprice")).alias("sxy"),
        F.sum(F.col("l_discount") * F.col("l_extendedprice")).alias("szy"),
    )
    n = F.col("n")
    c = m.select(
        n,
        (F.col("sxx") - F.col("sx") * F.col("sx") / n).alias("cxx"),
        (F.col("szz") - F.col("sz") * F.col("sz") / n).alias("czz"),
        (F.col("sxz") - F.col("sx") * F.col("sz") / n).alias("cxz"),
        (F.col("sxy") - F.col("sx") * F.col("sy") / n).alias("cxy"),
        (F.col("szy") - F.col("sz") * F.col("sy") / n).alias("czy"),
        (F.col("sx") / n).alias("mx"),
        (F.col("sz") / n).alias("mz"),
        (F.col("sy") / n).alias("my"),
    )
    lam = F.lit(10.0)
    f = c.select(
        n,
        "mx",
        "mz",
        "my",
        "cxy",
        "czy",
        ((F.col("cxx") + lam) * (F.col("czz") + lam) - F.col("cxz") * F.col("cxz")).alias(
            "det"
        ),
        ((F.col("czz") + lam) * F.col("cxy") - F.col("cxz") * F.col("czy")).alias("num1"),
        ((F.col("cxx") + lam) * F.col("czy") - F.col("cxz") * F.col("cxy")).alias("num2"),
    )
    b1 = F.col("num1") / F.col("det")
    b2 = F.col("num2") / F.col("det")
    return f.select(
        n.cast("long").alias("n_rows"),
        F.round(b1, 6).alias("beta_quantity"),
        F.round(b2, 6).alias("beta_discount"),
        F.round(F.col("my") - b1 * F.col("mx") - b2 * F.col("mz"), 4).alias("intercept"),
    )


@register(
    "q251_l_diversity_audit",
    oracle="""
    WITH cls AS (
        SELECT c_nationkey,
               CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
               CAST(count(*) AS BIGINT) AS class_size,
               CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l
        FROM customer GROUP BY 1, 2
    ),
    n AS (SELECT CAST(sum(class_size) AS DOUBLE) AS n FROM cls)
    SELECT l,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(class_size) AS BIGINT) AS n_rows,
           CAST(l < 3 AS BOOLEAN) AS at_risk,
           round(sum(class_size) / (SELECT n FROM n), 6) AS row_share
    FROM cls GROUP BY l ORDER BY l
    """,
)
def q251_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the attribute-disclosure companion to
    q207's k-anonymity: a class can be large (k-anonymous) yet still
    leak if every member shares the same SENSITIVE value, so for
    each quasi-identifier equivalence class (nationkey, acctbal/1000
    band) count the DISTINCT sensitive values (mktsegment) it
    contains; classes with l < 3 need suppression or generalization
    before release even if they pass the k gate.

    Scale: one groupBy to the bounded class relation with a
    count-distinct over the tiny sensitive domain (5 segments — the
    distinct collapses map-side), then a tiny histogram agg on l;
    the row-total broadcasts back. Same two-exchange shape as q207.
    """
    c = load(spark, sf_dir, "customer")
    cls = c.groupBy(
        "c_nationkey", F.floor(F.col("c_acctbal") / 1000.0).alias("bal_band")
    ).agg(
        F.count(F.lit(1)).alias("class_size"),
        F.countDistinct("c_mktsegment").alias("l"),
    )
    n = cls.agg(F.sum("class_size").cast("double").alias("n"))
    return (
        cls.groupBy("l")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("class_size").alias("n_rows"),
        )
        .crossJoin(F.broadcast(n))
        .select(
            "l",
            "n_classes",
            "n_rows",
            (F.col("l") < 3).alias("at_risk"),
            F.round(F.col("n_rows") / F.col("n"), 6).alias("row_share"),
        )
        .orderBy("l")
    )


@register(
    "q254_salted_skew_join",
    oracle="""
    WITH ev AS (
        SELECT CASE WHEN user_id % 10 < 7 THEN 0
                    ELSE CAST(user_id % 25 AS INTEGER) END AS nk,
               value
        FROM events
    )
    SELECT n.n_name,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(ev.value), 4) AS total_value
    FROM ev JOIN nation n ON ev.nk = n.n_nationkey
    GROUP BY n.n_name ORDER BY n.n_name
    """,
)
def q254_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skewed join, oracle-gated: ~70% of the fact rows land
    on ONE join key (a planted hot-nation skew), the pathological
    shape where a plain shuffle join puts most of the corpus in one
    task. The join runs through operators/joins.broadcast_salted_join
    — the dim side replicates per salt bucket, the fact side salts,
    and each hot key's rows spread over 8 tasks — with the oracle
    pinning that the salt fan-out is result-invariant (inner-join
    multiplicity is preserved because every fact row matches exactly
    one (key, salt) replica).

    Scale: this is the 100 TB defense when AQE's runtime skew split
    is unavailable (disabled clusters, non-shuffle broadcast plans) —
    q105 covers the salted AGGREGATE, this covers the salted JOIN;
    together they close the rubric's "skewed keys -> salting" row.
    The dim replication is |dim| x buckets rows — broadcastable by
    construction; the post-join agg collapses map-side.
    """
    from g_etl_spark.operators.joins import broadcast_salted_join

    e = load(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 10 < 7, F.lit(0))
        .otherwise((F.col("user_id") % 25).cast("int"))
        .alias("nk"),
        "value",
    )
    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk"), "n_name"
    )
    joined = broadcast_salted_join(e, n, "nk", salt_buckets=8)
    return (
        joined.groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("n_name")
    )


@register(
    "q256_snapshot_cdc_diff",
    oracle="""
    WITH today AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders),
    yesterday AS (
        SELECT o_orderkey AS k,
               CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice - 10.0
                    ELSE o_totalprice END AS p
        FROM orders WHERE o_orderkey % 50 != 0
        UNION ALL
        SELECT o_orderkey + 5000000, o_totalprice FROM orders
        WHERE o_orderkey % 41 = 0
    ),
    d AS (
        SELECT CASE WHEN y.k IS NULL THEN 'insert'
                    WHEN t.k IS NULL THEN 'delete'
                    WHEN y.p != t.p THEN 'update'
                    ELSE 'unchanged' END AS change_type,
               coalesce(t.k, y.k) AS k
        FROM today t FULL OUTER JOIN yesterday y ON t.k = y.k
    )
    SELECT change_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(k) AS BIGINT) AS key_checksum
    FROM d GROUP BY change_type ORDER BY change_type
    """,
)
def q256_snapshot_cdc_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-diff change-data-capture: classify every key across
    two table states (a planted 'yesterday' with missing keys =
    today's inserts, price-drifted keys = updates, and extra keys =
    deletes) into insert/update/delete/unchanged with per-class
    counts and key checksums — the table-state diff a lakehouse
    pipeline derives CDC feeds and incremental-refresh scopes from
    when the source offers no change log (the batch complement of
    the streaming family, and the generalization of q98's SCD2
    merge, which consumes exactly this classification).

    Scale: ONE full-outer key-equi join — both sides shuffle once on
    the key (or co-locate for free under the bucketed layout the
    house bucketBy plan test pins); classification is map-side
    codegen; the rollup collapses to 4 cells. Checksums are exact
    integer sums, so a mismatched diff can never hash-collide past
    the gate.
    """
    o = load(spark, sf_dir, "orders")
    today = o.select(F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p"))
    yesterday = (
        o.where(F.col("o_orderkey") % 50 != 0)
        .select(
            F.col("o_orderkey").alias("k"),
            F.when(
                F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") - 10.0
            )
            .otherwise(F.col("o_totalprice"))
            .alias("p"),
        )
        .unionAll(
            o.where(F.col("o_orderkey") % 41 == 0).select(
                (F.col("o_orderkey") + 5000000).alias("k"),
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
        .alias("change_type"),
        F.coalesce(F.col("t.k"), F.col("y.k")).alias("k"),
    )
    return (
        d.groupBy("change_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("k").cast("long").alias("key_checksum"),
        )
        .orderBy("change_type")
    )


@register(
    "q259_srm_check",
    oracle="""
    WITH arms AS (
        SELECT user_id % 2 = 1 AS treated,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n
        FROM events GROUP BY 1
    ),
    w AS (
        SELECT max(CASE WHEN treated THEN n END) AS na,
               max(CASE WHEN NOT treated THEN n END) AS nb
        FROM arms
    )
    SELECT na AS n_treated, nb AS n_control,
           round(na * 1.0 / (na + nb), 6) AS treated_share,
           round((na - nb) * (na - nb) * 1.0 / (na + nb), 4) AS chi2,
           CAST((na - nb) * (na - nb) * 1.0 / (na + nb) > 3.841 AS BOOLEAN)
               AS srm_detected
    FROM w
    """,
)
def q259_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check — the first gate of every A/B
    readout (before q150/q221/q225/q238 report an effect, the UNIT
    counts per arm must match the intended 50/50 allocation;
    randomization bugs show up here, and an SRM invalidates the
    whole experiment): distinct USERS per arm (events are not the
    randomization unit), the 1-df chi-square against the expected
    split, flagged at the 95% critical value 3.841.

    Scale: one distinct-user agg (map-side partial on user) into a
    2-cell relation; the test statistic is arithmetic on those two
    integers — exact, so the boolean verdict cannot flake across
    engines.
    """
    e = load(spark, sf_dir, "events")
    arms = e.groupBy((F.col("user_id") % 2 == 1).alias("treated")).agg(
        F.countDistinct("user_id").alias("n")
    )
    w = arms.agg(
        F.max(F.when(F.col("treated"), F.col("n"))).alias("na"),
        F.max(F.when(~F.col("treated"), F.col("n"))).alias("nb"),
    )
    chi2 = (
        (F.col("na") - F.col("nb"))
        * (F.col("na") - F.col("nb"))
        * 1.0
        / (F.col("na") + F.col("nb"))
    )
    return w.select(
        F.col("na").alias("n_treated"),
        F.col("nb").alias("n_control"),
        F.round(F.col("na") * 1.0 / (F.col("na") + F.col("nb")), 6).alias(
            "treated_share"
        ),
        F.round(chi2, 4).alias("chi2"),
        (chi2 > 3.841).alias("srm_detected"),
    )


@register(
    "q260_erasure_audit",
    oracle="""
    WITH tomb AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
    po AS (
        SELECT o_orderkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM tomb)
    )
    SELECT * FROM (
        SELECT 'customer' AS table_name,
               CAST(count(*) AS BIGINT) AS n_rows_to_purge,
               CAST(coalesce(sum(c_custkey), 0) AS BIGINT) AS key_checksum
        FROM tomb
        UNION ALL
        SELECT 'lineitem', CAST(count(*) AS BIGINT),
               CAST(coalesce(sum(l_orderkey * 10 + l_linenumber), 0) AS BIGINT)
        FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM po)
        UNION ALL
        SELECT 'orders', CAST(count(*) AS BIGINT),
               CAST(coalesce(sum(o_orderkey), 0) AS BIGINT)
        FROM po
    ) ORDER BY table_name
    """,
)
def q260_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure cascade audit (GDPR Art. 17 / CCPA delete):
    given a tombstone set of subjects, walk the foreign-key cascade
    (customer -> orders -> lineitem) with semi-joins and emit the
    per-table purge manifest — row counts plus exact key checksums —
    that a deletion job executes and a compliance log retains. The
    data-governance closure of the privacy family: q207/q251 decide
    WHAT is releasable, q234 finds PII in free text, this scopes a
    subject's blast radius across the relational graph.

    Scale: each hop is a key-equi LEFT SEMI join against the
    (broadcastable) parent key set — the tombstone set is tiny by
    construction and stays tiny through the cascade relative to the
    tables it prunes; counts and checksums collapse map-side. At
    100 TB the same manifest drives partition-level rewrites
    (erasure = rewrite only the files whose min/max key ranges
    intersect the manifest — the layout module's pruning story).
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    tomb = c.where(F.col("c_custkey") % 97 == 0).select("c_custkey")
    po = o.join(
        # unhinted: the tombstone set is a corpus fraction (tiny in a
        # real erasure workload, but not provably bounded) — AQE
        # broadcasts when it fits
        tomb, o["o_custkey"] == tomb["c_custkey"], "left_semi"
    ).select("o_orderkey")
    r1 = tomb.agg(
        F.lit("customer").alias("table_name"),
        F.count(F.lit(1)).alias("n_rows_to_purge"),
        F.coalesce(F.sum("c_custkey"), F.lit(0)).cast("long").alias("key_checksum"),
    )
    r2 = li.join(
        po, li["l_orderkey"] == po["o_orderkey"], "left_semi"
    ).agg(
        F.lit("lineitem").alias("table_name"),
        F.count(F.lit(1)).alias("n_rows_to_purge"),
        F.coalesce(F.sum(F.col("l_orderkey") * 10 + F.col("l_linenumber")), F.lit(0))
        .cast("long")
        .alias("key_checksum"),
    )
    r3 = po.agg(
        F.lit("orders").alias("table_name"),
        F.count(F.lit(1)).alias("n_rows_to_purge"),
        F.coalesce(F.sum("o_orderkey"), F.lit(0)).cast("long").alias("key_checksum"),
    )
    return r1.unionAll(r2).unionAll(r3).orderBy("table_name")


@register(
    "q268_power_analysis_mde",
    oracle="""
    WITH pu AS (
        SELECT user_id, user_id % 2 = 1 AS treated,
               sum(value) AS v
        FROM events GROUP BY 1, 2
    ),
    arms AS (
        SELECT treated, CAST(count(*) AS DOUBLE) AS n,
               sum(v) AS sv, sum(v * v) AS svv
        FROM pu GROUP BY 1
    ),
    w AS (
        SELECT max(CASE WHEN treated THEN n END) AS na,
               max(CASE WHEN treated THEN sv END) AS sa,
               max(CASE WHEN treated THEN svv END) AS sva,
               max(CASE WHEN NOT treated THEN n END) AS nb,
               max(CASE WHEN NOT treated THEN sv END) AS sb,
               max(CASE WHEN NOT treated THEN svv END) AS svb
        FROM arms
    ),
    f AS (
        SELECT na, nb, sb / nb AS mu_c,
               (sva - sa * sa / na) / (na - 1) AS va,
               (svb - sb * sb / nb) / (nb - 1) AS vb
        FROM w
    )
    SELECT CAST(na AS BIGINT) AS n_treated,
           CAST(nb AS BIGINT) AS n_control,
           round(mu_c, 4) AS control_mean,
           round(sqrt(va / na + vb / nb), 6) AS effect_se,
           round((1.959964 + 0.841621) * sqrt(va / na + vb / nb), 4)
               AS mde_abs,
           round((1.959964 + 0.841621) * sqrt(va / na + vb / nb) / mu_c, 6)
               AS mde_rel
    FROM f
    """,
)
def q268_power_analysis_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment power analysis: the minimum detectable effect at
    80% power / 95% confidence from the CURRENT arm sizes and
    variances (user-level totals, the randomization unit) — the
    planning number an experimenter reads BEFORE launching (q259
    gates allocation health, q150/q238 read the result; this says
    whether the test is even worth running: an MDE of 8% is useless
    for a 2% expected lift). MDE = (z_{a/2} + z_beta) * SE with the
    standard 1.96/0.8416 quantiles as literals, so both engines do
    identical arithmetic.

    Scale: one user-keyed combining agg (the q240/q225 relation),
    then mergeable moments to a 2-cell arm relation; everything
    after is closed-form arithmetic on six numbers.
    """
    e = load(spark, sf_dir, "events")
    pu = e.groupBy("user_id", (F.col("user_id") % 2 == 1).alias("treated")).agg(
        F.sum("value").alias("v")
    )
    arms = pu.groupBy("treated").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("v").alias("sv"),
        F.sum(F.col("v") * F.col("v")).alias("svv"),
    )
    w = arms.agg(
        F.max(F.when(F.col("treated"), F.col("n"))).alias("na"),
        F.max(F.when(F.col("treated"), F.col("sv"))).alias("sa"),
        F.max(F.when(F.col("treated"), F.col("svv"))).alias("sva"),
        F.max(F.when(~F.col("treated"), F.col("n"))).alias("nb"),
        F.max(F.when(~F.col("treated"), F.col("sv"))).alias("sb"),
        F.max(F.when(~F.col("treated"), F.col("svv"))).alias("svb"),
    )
    f = w.select(
        "na",
        "nb",
        (F.col("sb") / F.col("nb")).alias("mu_c"),
        ((F.col("sva") - F.col("sa") * F.col("sa") / F.col("na")) / (F.col("na") - 1)).alias(
            "va"
        ),
        ((F.col("svb") - F.col("sb") * F.col("sb") / F.col("nb")) / (F.col("nb") - 1)).alias(
            "vb"
        ),
    )
    se = F.sqrt(F.col("va") / F.col("na") + F.col("vb") / F.col("nb"))
    z = 1.959964 + 0.841621
    return f.select(
        F.col("na").cast("long").alias("n_treated"),
        F.col("nb").cast("long").alias("n_control"),
        F.round("mu_c", 4).alias("control_mean"),
        F.round(se, 6).alias("effect_se"),
        F.round(z * se, 4).alias("mde_abs"),
        F.round(z * se / F.col("mu_c"), 6).alias("mde_rel"),
    )


@register(
    "q270_quantile_treatment_effects",
    oracle="""
    WITH pu AS (
        SELECT user_id, user_id % 2 = 1 AS treated, sum(value) AS v
        FROM events GROUP BY 1, 2
    ),
    q AS (
        SELECT quantile_cont(CASE WHEN treated THEN v END,
                   [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qt,
               quantile_cont(CASE WHEN NOT treated THEN v END,
                   [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qc
        FROM pu
    ),
    g AS (SELECT unnest(range(1, 10)) AS d)
    SELECT CAST(g.d AS BIGINT) AS decile,
           round(q.qt[CAST(g.d AS INTEGER)], 4) AS q_treated,
           round(q.qc[CAST(g.d AS INTEGER)], 4) AS q_control,
           round(q.qt[CAST(g.d AS INTEGER)] - q.qc[CAST(g.d AS INTEGER)], 4)
               AS qte
    FROM g, q ORDER BY g.d
    """,
)
def q270_quantile_treatment_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects: the treated-minus-control gap at
    every decile of the user-level outcome distribution — the
    DISTRIBUTIONAL readout the mean-based stack (q150/q221/q225)
    cannot see: a zero average lift can hide a positive effect on
    light users cancelled by a negative one on heavy users, and QTE
    is where that shows up first.

    Scale: one user-keyed combining agg, then two exact grouped
    percentile sets over the collapsed per-user relation (Spark
    `percentile` == DuckDB `quantile_cont`, the q39 parity); at
    billions of users swap in percentile_approx / the q160 sketch —
    the documented knob for every exact-percentile op in this repo.
    """
    e = load(spark, sf_dir, "events")
    pu = e.groupBy("user_id", (F.col("user_id") % 2 == 1).alias("treated")).agg(
        F.sum("value").alias("v")
    )
    qt = pu.where("treated").agg(
        F.expr(
            "percentile(v, array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D))"
        ).alias("qs")
    )
    qc = pu.where(~F.col("treated")).agg(
        F.expr(
            "percentile(v, array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D))"
        ).alias("qs")
    )
    g = spark.range(1, 10).select(F.col("id").alias("decile"))
    return (
        g.crossJoin(F.broadcast(qt.select(F.col("qs").alias("qst"))))
        .crossJoin(F.broadcast(qc.select(F.col("qs").alias("qsc"))))
        .select(
            "decile",
            F.round(F.element_at("qst", F.col("decile").cast("int")), 4).alias(
                "q_treated"
            ),
            F.round(F.element_at("qsc", F.col("decile").cast("int")), 4).alias(
                "q_control"
            ),
            F.round(
                F.element_at("qst", F.col("decile").cast("int"))
                - F.element_at("qsc", F.col("decile").cast("int")),
                4,
            ).alias("qte"),
        )
        .orderBy("decile")
    )


@register(
    "q276_bom_explosion",
    oracle="""
    WITH RECURSIVE edges AS (
        SELECT p_partkey AS c, p_partkey // 10 AS p,
               CAST((p_partkey % 10) + 1 AS BIGINT) AS q
        FROM part WHERE p_partkey >= 10
    ),
    walk AS (
        SELECT p_partkey AS part, p_partkey AS anc,
               CAST(1 AS BIGINT) AS qty, 0 AS depth
        FROM part
        UNION ALL
        SELECT w.part, e.p, w.qty * e.q, w.depth + 1
        FROM walk w JOIN edges e ON e.c = w.anc
    )
    SELECT anc AS root,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(qty) AS BIGINT) AS total_qty,
           CAST(max(depth) AS BIGINT) AS max_depth
    FROM walk WHERE anc < 10
    GROUP BY anc ORDER BY anc
    """,
)
def q276_bom_explosion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bill-of-materials explosion with quantity roll-up — the
    classic parts-explosion recursion (child -> parent assembly
    links carry a per-link quantity; a part's EFFECTIVE quantity at
    its root assembly is the PRODUCT along the chase): every part
    walks a synthetic decade hierarchy (parent = key/10, link qty =
    key%10+1) to its single-digit root; per root, descendant count,
    summed effective quantity, and max depth. q106's closure walks
    the same shape WITHOUT arithmetic along the path — the product
    accumulation is what makes this the BOM/costing op.

    Scale: iterative frontier joins against the persisted edge
    relation (the k-core/_kcore_peel control pattern: bounded-depth
    loop, per-round lineage truncation, RAISE past the depth bound
    instead of silent partial results); state is one row per part
    whose walk is unfinished — monotonically shrinking. Depth is
    bounded by the hierarchy (4 here, O(log key)); quantities are
    integer-exact products summed as bigints.
    """
    p = load(spark, sf_dir, "part").select("p_partkey")
    edges = (
        p.where(F.col("p_partkey") >= 10)
        .select(
            F.col("p_partkey").alias("c"),
            F.expr("p_partkey div 10").alias("pp"),
            ((F.col("p_partkey") % 10) + 1).cast("long").alias("q"),
        )
        .persist()
    )
    state = p.select(
        F.col("p_partkey").alias("part"),
        F.col("p_partkey").alias("anc"),
        F.lit(1).cast("long").alias("qty"),
        F.lit(0).alias("depth"),
    ).localCheckpoint(eager=True)
    for _ in range(8):
        if state.where(F.col("anc") >= 10).isEmpty():
            break
        live = state.where(F.col("anc") >= 10)
        done = state.where(F.col("anc") < 10)
        stepped = (
            live.join(edges, live["anc"] == edges["c"])
            .select(
                "part",
                F.col("pp").alias("anc"),
                (F.col("qty") * F.col("q")).alias("qty"),
                (F.col("depth") + 1).alias("depth"),
            )
        )
        state = done.unionByName(stepped).localCheckpoint(eager=True)
    else:
        edges.unpersist()
        raise RuntimeError("BOM walk did not reach all roots in 8 rounds")
    edges.unpersist()
    return (
        state.groupBy(F.col("anc").alias("root"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("qty").alias("total_qty"),
            F.max("depth").cast("long").alias("max_depth"),
        )
        .orderBy("root")
    )


@register(
    "q277_cdc_apply_roundtrip",
    oracle="""
    WITH today AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders),
    yesterday AS (
        SELECT o_orderkey AS k,
               CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice - 10.0
                    ELSE o_totalprice END AS p
        FROM orders WHERE o_orderkey % 50 != 0
        UNION ALL
        SELECT o_orderkey + 5000000, o_totalprice FROM orders
        WHERE o_orderkey % 41 = 0
    ),
    diff AS (
        SELECT CASE WHEN y.k IS NULL THEN 'insert'
                    WHEN t.k IS NULL THEN 'delete'
                    WHEN y.p != t.p THEN 'update'
                    ELSE 'unchanged' END AS change_type,
               coalesce(t.k, y.k) AS k, t.p AS new_p
        FROM today t FULL OUTER JOIN yesterday y ON t.k = y.k
    ),
    kept AS (
        SELECT y.k, y.p FROM yesterday y
        WHERE y.k NOT IN (SELECT k FROM diff
                          WHERE change_type IN ('delete', 'update'))
    ),
    reconstructed AS (
        SELECT k, p FROM kept
        UNION ALL
        SELECT k, new_p FROM diff WHERE change_type IN ('insert', 'update')
    ),
    ct AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(k) AS BIGINT) AS ck,
               CAST(sum(CAST(floor(p * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cp
        FROM today
    ),
    cr AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(k) AS BIGINT) AS ck,
               CAST(sum(CAST(floor(p * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cp
        FROM reconstructed
    ),
    dc AS (
        SELECT CAST(sum(CASE WHEN change_type = 'insert' THEN 1 ELSE 0
                        END) AS BIGINT) AS ins,
               CAST(sum(CASE WHEN change_type = 'update' THEN 1 ELSE 0
                        END) AS BIGINT) AS upd,
               CAST(sum(CASE WHEN change_type = 'delete' THEN 1 ELSE 0
                        END) AS BIGINT) AS del
        FROM diff
    )
    SELECT ct.n AS n_today, cr.n AS n_reconstructed,
           dc.ins AS n_inserts_applied, dc.upd AS n_updates_applied,
           dc.del AS n_deletes_applied,
           CAST(ct.n = cr.n AND ct.ck = cr.ck AS BOOLEAN) AS keys_match,
           CAST(ct.cp = cr.cp AS BOOLEAN) AS prices_match
    FROM ct, cr, dc
    """,
)
def q277_cdc_apply_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC APPLY, roundtrip-verified: take q256's classified diff and
    replay it onto the 'yesterday' snapshot — drop deletes, replace
    updates, append inserts — then prove the reconstruction equals
    'today' by exact count, key-checksum, and cent-quantized price
    checksums. q98's SCD2 merge keeps history; this is the
    plain-upsert apply path (what a MERGE INTO executes), and the
    roundtrip identity is the invariant every CDC consumer should
    assert before trusting a feed.

    Scale: the apply is one anti-join (kept rows) + one union with
    the delta — both key-equi, both shuffle-once-or-bucketed; the
    verification is two checksum aggs. The diff itself is q256's one
    full-outer join. Checksums are exact integers, so a corrupted
    apply cannot pass by luck.
    """
    o = load(spark, sf_dir, "orders")
    today = o.select(F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p"))
    yesterday = (
        o.where(F.col("o_orderkey") % 50 != 0)
        .select(
            F.col("o_orderkey").alias("k"),
            F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") - 10.0)
            .otherwise(F.col("o_totalprice"))
            .alias("p"),
        )
        .unionAll(
            o.where(F.col("o_orderkey") % 41 == 0).select(
                (F.col("o_orderkey") + 5000000).alias("k"),
                F.col("o_totalprice").alias("p"),
            )
        )
    )
    t, y = today.alias("t"), yesterday.alias("y")
    diff = t.join(y, F.col("t.k") == F.col("y.k"), "full_outer").select(
        F.when(F.col("y.k").isNull(), "insert")
        .when(F.col("t.k").isNull(), "delete")
        .when(F.col("y.p") != F.col("t.p"), "update")
        .otherwise("unchanged")
        .alias("change_type"),
        F.coalesce(F.col("t.k"), F.col("y.k")).alias("k"),
        F.col("t.p").alias("new_p"),
    )
    gone = diff.where(F.col("change_type").isin("delete", "update")).select("k")
    kept = yesterday.join(gone, "k", "left_anti")
    applied = diff.where(F.col("change_type").isin("insert", "update")).select(
        "k", F.col("new_p").alias("p")
    )
    reconstructed = kept.unionByName(applied)
    cents = F.sum(F.floor(F.col("p") * 100 + 0.5).cast("long")).cast("long")
    ct = today.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").cast("long").alias("ck"),
        cents.alias("cp"),
    )
    cr = reconstructed.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").cast("long").alias("ck"),
        cents.alias("cp"),
    )
    dc = diff.agg(
        F.sum(F.when(F.col("change_type") == "insert", 1).otherwise(0)).alias("ins"),
        F.sum(F.when(F.col("change_type") == "update", 1).otherwise(0)).alias("upd"),
        F.sum(F.when(F.col("change_type") == "delete", 1).otherwise(0)).alias("del"),
    )
    return (
        ct.select(
            F.col("n").alias("n_today"),
            F.col("ck").alias("ckt"),
            F.col("cp").alias("cpt"),
        )
        .crossJoin(
            F.broadcast(
                cr.select(
                    F.col("n").alias("n_reconstructed"),
                    F.col("ck").alias("ckr"),
                    F.col("cp").alias("cpr"),
                )
            )
        )
        .crossJoin(F.broadcast(dc))
        .select(
            "n_today",
            "n_reconstructed",
            F.col("ins").alias("n_inserts_applied"),
            F.col("upd").alias("n_updates_applied"),
            F.col("del").alias("n_deletes_applied"),
            (
                (F.col("n_today") == F.col("n_reconstructed"))
                & (F.col("ckt") == F.col("ckr"))
            ).alias("keys_match"),
            (F.col("cpt") == F.col("cpr")).alias("prices_match"),
        )
    )


@register(
    "q278_join_fanout_diagnostics",
    oracle="""
    WITH ck AS (
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_rows
        FROM lineitem GROUP BY 1
    ),
    tot AS (
        SELECT CAST(sum(n_rows * (n_rows - 1) / 2) AS BIGINT) AS total_pairs,
               CAST(max(n_rows) AS BIGINT) AS max_key,
               avg(n_rows) AS avg_key
        FROM ck
    )
    SELECT l_partkey, n_rows,
           CAST(n_rows * (n_rows - 1) / 2 AS BIGINT) AS pair_contribution,
           round(n_rows * (n_rows - 1) / 2.0 / tot.total_pairs, 6)
               AS pair_share,
           tot.total_pairs,
           round(tot.max_key / tot.avg_key, 4) AS skew_ratio
    FROM ck, tot
    ORDER BY pair_contribution DESC, l_partkey
    LIMIT 10
    """,
)
def q278_join_fanout_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join fan-out diagnostics — the PLANNING pass behind every
    Sigma-bucket^2 cost argument in this repo (q101's wedge bound,
    q153's df cap, q52's bucket join): per join key, the pair count
    n*(n-1)/2 it would contribute to a self-join, the top-10
    contributors with their share of total output, and the
    max/average skew ratio that decides whether to salt (q254),
    cap (q218's top-50 truncation), or let AQE split. Run this
    BEFORE the join; it prices the join without executing it.

    Scale: one combining count per key, then arithmetic on the
    bounded key-count relation with a broadcast total — the
    diagnostic costs one scan regardless of how explosive the join
    it prices would be (the whole point). TakeOrdered for the top-10
    (no global sort).
    """
    li = load(spark, sf_dir, "lineitem")
    ck = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_rows"))
    pairs = (F.col("n_rows") * (F.col("n_rows") - 1) / 2).cast("long")
    tot = ck.agg(
        F.sum(pairs).cast("long").alias("total_pairs"),
        F.max("n_rows").cast("long").alias("max_key"),
        F.avg("n_rows").alias("avg_key"),
    )
    return (
        ck.crossJoin(F.broadcast(tot))
        .select(
            "l_partkey",
            "n_rows",
            pairs.alias("pair_contribution"),
            F.round(
                F.col("n_rows") * (F.col("n_rows") - 1) / 2.0 / F.col("total_pairs"),
                6,
            ).alias("pair_share"),
            "total_pairs",
            F.round(F.col("max_key") / F.col("avg_key"), 4).alias("skew_ratio"),
        )
        .orderBy(F.desc("pair_contribution"), "l_partkey")
        .limit(10)
    )


@register(
    "q279_date_dimension",
    oracle="""
    WITH span AS (
        SELECT CAST(min(o_orderdate) AS DATE) AS lo,
               CAST(max(o_orderdate) AS DATE) AS hi
        FROM orders
    ),
    days AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d
        FROM span
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(year(d) AS BIGINT) AS year,
           CAST(quarter(d) AS BIGINT) AS quarter,
           CAST(month(d) AS BIGINT) AS month,
           CAST(day(d) AS BIGINT) AS day_of_month,
           CAST(dayofweek(d) AS BIGINT) AS dow,
           CAST(dayofweek(d) IN (0, 6) AS BOOLEAN) AS is_weekend,
           CAST(d = last_day(d) AS BOOLEAN) AS is_month_end
    FROM days ORDER BY d
    """,
)
def q279_date_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-dimension generation spanning the fact table's calendar:
    one conformed row per day with the standard attributes (year,
    quarter, month, day-of-week with the cross-engine-pinned
    numbering, weekend and month-end flags) — the warehouse-modeling
    primitive every rollup in this repo joins against implicitly;
    materializing it makes calendar logic a broadcast join instead
    of per-row date arithmetic repeated in every query.

    Scale: the span comes from one min/max agg; generation is a
    single F.sequence explode of |days| rows (bounded by the
    calendar, not the corpus) — map-side codegen, no shuffle at all
    beyond the scalar span broadcast.
    """
    o = load(spark, sf_dir, "orders")
    span = o.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("lo"),
        F.max(F.col("o_orderdate").cast("date")).alias("hi"),
    )
    days = span.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("d")
    )
    dow = (F.dayofweek("d") - 1).cast("long")
    return days.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.year("d").cast("long").alias("year"),
        F.quarter("d").cast("long").alias("quarter"),
        F.month("d").cast("long").alias("month"),
        F.dayofmonth("d").cast("long").alias("day_of_month"),
        dow.alias("dow"),
        dow.isin(0, 6).alias("is_weekend"),
        (F.col("d") == F.last_day("d")).alias("is_month_end"),
    ).orderBy("d")


@register(
    "q280_mix_shift_decomposition",
    oracle="""
    WITH ev AS (
        SELECT event_type,
               CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                    THEN 'old' ELSE 'new' END AS period,
               value
        FROM events
    ),
    g AS (
        SELECT period, event_type, CAST(count(*) AS DOUBLE) AS n,
               sum(value) / count(*) AS m
        FROM ev GROUP BY 1, 2
    ),
    tot AS (SELECT period, sum(n) AS tn FROM g GROUP BY 1),
    s AS (
        SELECT g.period, g.event_type, g.m, g.n / tot.tn AS sh
        FROM g JOIN tot USING (period)
    ),
    w AS (
        SELECT o.event_type,
               o.sh AS share_old, n.sh AS share_new,
               o.m AS mean_old, n.m AS mean_new,
               o.sh * (n.m - o.m) AS within_contrib,
               (n.sh - o.sh) * n.m AS mix_contrib
        FROM (SELECT * FROM s WHERE period = 'old') o
        JOIN (SELECT * FROM s WHERE period = 'new') n USING (event_type)
    )
    SELECT event_type,
           round(share_old, 6) AS share_old,
           round(share_new, 6) AS share_new,
           round(mean_old, 4) AS mean_old,
           round(mean_new, 4) AS mean_new,
           round(within_contrib, 6) AS within_contrib,
           round(mix_contrib, 6) AS mix_contrib
    FROM w ORDER BY event_type
    """,
)
def q280_mix_shift_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mix-shift (Oaxaca-Blinder) decomposition of a metric change:
    the day a dashboard's mean moves, the first question is 'did the
    segments change, or did the mix between them change?' — this
    splits the period-over-period delta of mean event value into a
    WITHIN term (old shares x per-type mean changes) and a MIX term
    (share shifts x new means), per type, with the identity
    sum(within) + sum(mix) = total delta (pinned by test). The
    root-cause primitive of every metric tree.

    Scale: one combining agg to the (period x type) grid; shares,
    means, and both contribution terms are arithmetic on that
    bounded relation with a broadcast period total. Nothing
    corpus-sized moves twice.
    """
    e = load(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    g = e.groupBy(
        F.when(F.col("ts") < cut, "old").otherwise("new").alias("period"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        (F.sum("value") / F.count(F.lit(1))).alias("m"),
    )
    tot = g.groupBy("period").agg(F.sum("n").alias("tn"))
    s = g.join(F.broadcast(tot), "period").select(
        "period", "event_type", "m", (F.col("n") / F.col("tn")).alias("sh")
    )
    o = s.where(F.col("period") == "old").select(
        "event_type", F.col("sh").alias("share_old"), F.col("m").alias("mean_old")
    )
    n = s.where(F.col("period") == "new").select(
        "event_type", F.col("sh").alias("share_new"), F.col("m").alias("mean_new")
    )
    return (
        o.join(n, "event_type")
        .select(
            "event_type",
            F.round("share_old", 6).alias("share_old"),
            F.round("share_new", 6).alias("share_new"),
            F.round("mean_old", 4).alias("mean_old"),
            F.round("mean_new", 4).alias("mean_new"),
            F.round(
                F.col("share_old") * (F.col("mean_new") - F.col("mean_old")), 6
            ).alias("within_contrib"),
            F.round(
                (F.col("share_new") - F.col("share_old")) * F.col("mean_new"), 6
            ).alias("mix_contrib"),
        )
        .orderBy("event_type")
    )


@register(
    "q281_ks_two_sample",
    oracle="""
    WITH pu AS (
        SELECT user_id, user_id % 2 = 1 AS treated, sum(value) AS v
        FROM events GROUP BY 1, 2
    ),
    arms AS (
        SELECT CAST(sum(CASE WHEN treated THEN 1 ELSE 0 END) AS DOUBLE)
                   AS na,
               CAST(sum(CASE WHEN NOT treated THEN 1 ELSE 0 END) AS DOUBLE)
                   AS nb
        FROM pu
    ),
    dv AS (
        SELECT v,
               CAST(sum(CASE WHEN treated THEN 1 ELSE 0 END) AS BIGINT)
                   AS ca,
               CAST(sum(CASE WHEN NOT treated THEN 1 ELSE 0 END) AS BIGINT)
                   AS cb
        FROM pu GROUP BY v
    ),
    run AS (
        SELECT sum(ca) OVER w AS ra, sum(cb) OVER w AS rb
        FROM dv
        WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    ),
    d AS (
        SELECT max(abs(run.ra / arms.na - run.rb / arms.nb)) AS ks
        FROM run, arms
    )
    SELECT CAST(arms.na AS BIGINT) AS n_treated,
           CAST(arms.nb AS BIGINT) AS n_control,
           round(d.ks, 6) AS ks_stat,
           round(1.358 * sqrt((arms.na + arms.nb) / (arms.na * arms.nb)), 6)
               AS critical_05,
           CAST(d.ks > 1.358 * sqrt((arms.na + arms.nb)
                                    / (arms.na * arms.nb)) AS BOOLEAN)
               AS reject_05
    FROM d, arms
    """,
)
def q281_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test on user-level outcomes:
    the max ECDF gap between treated and control — the
    DISTRIBUTION-level significance test (q150's z sees means, q270
    reads deciles; KS rejects when ANY part of the distribution
    moved), with the asymptotic 5% critical value.

    Scale: the running ECDF gap is the two-pass recipe AGAIN
    (operators/ranking's shape applied to cumulative counts):
    distinct values bucket by log2(v), per-bucket arm counts fold
    into broadcast prefix offsets, and the within-bucket cumulative
    runs under a bucket-partitioned window — no single-partition
    WindowExec (plan-asserted), no corpus-sized sort on one
    reducer. The oracle's global window is the single-node
    equivalent of the same arithmetic.
    """
    from g_etl_spark.operators.ranking import log2_bucket

    e = load(spark, sf_dir, "events")
    pu = e.groupBy("user_id", (F.col("user_id") % 2 == 1).alias("treated")).agg(
        F.sum("value").alias("v")
    )
    arms = pu.agg(
        F.sum(F.when(F.col("treated"), 1).otherwise(0)).cast("double").alias("na"),
        F.sum(F.when(~F.col("treated"), 1).otherwise(0)).cast("double").alias("nb"),
    )
    dv = pu.groupBy("v").agg(
        F.sum(F.when(F.col("treated"), 1).otherwise(0)).alias("ca"),
        F.sum(F.when(~F.col("treated"), 1).otherwise(0)).alias("cb"),
    )
    b = dv.withColumn("__b", log2_bucket(F.col("v")))
    counts = b.groupBy("__b").agg(
        F.sum("ca").alias("bca"), F.sum("cb").alias("bcb")
    )
    x, y = counts.alias("x"), counts.alias("y")
    offsets = (
        x.join(F.broadcast(y), F.col("y.__b") < F.col("x.__b"), "left")
        .groupBy(F.col("x.__b").alias("__b"))
        .agg(
            F.coalesce(F.sum("y.bca"), F.lit(0)).alias("offa"),
            F.coalesce(F.sum("y.bcb"), F.lit(0)).alias("offb"),
        )
    )
    wloc = (
        Window.partitionBy("__b")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = b.join(F.broadcast(offsets), "__b").select(
        (F.sum("ca").over(wloc) + F.col("offa")).alias("ra"),
        (F.sum("cb").over(wloc) + F.col("offb")).alias("rb"),
    )
    d = run.crossJoin(F.broadcast(arms)).agg(
        F.max(F.abs(F.col("ra") / F.col("na") - F.col("rb") / F.col("nb"))).alias(
            "ks"
        )
    )
    crit = 1.358 * F.sqrt((F.col("na") + F.col("nb")) / (F.col("na") * F.col("nb")))
    return d.crossJoin(F.broadcast(arms)).select(
        F.col("na").cast("long").alias("n_treated"),
        F.col("nb").cast("long").alias("n_control"),
        F.round("ks", 6).alias("ks_stat"),
        F.round(crit, 6).alias("critical_05"),
        (F.col("ks") > crit).alias("reject_05"),
    )


@register(
    "q283_distribution_distances",
    oracle="""
    WITH g AS (
        SELECT CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                    THEN 'old' ELSE 'new' END AS period,
               event_type, CAST(count(*) AS DOUBLE) AS n
        FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT period, sum(n) AS tn FROM g GROUP BY 1),
    s AS (
        SELECT g.event_type, g.period, g.n / tot.tn AS p
        FROM g JOIN tot USING (period)
    ),
    j AS (
        SELECT o.event_type, o.p AS po, n.p AS pn,
               abs(o.p - n.p) AS adiff, sqrt(o.p * n.p) AS bcterm
        FROM (SELECT * FROM s WHERE period = 'old') o
        JOIN (SELECT * FROM s WHERE period = 'new') n USING (event_type)
    ),
    m AS (
        SELECT sum(adiff) / 2.0 AS tv, sum(bcterm) AS bc FROM j
    ),
    top AS (
        SELECT event_type FROM j ORDER BY adiff DESC, event_type LIMIT 1
    )
    SELECT round(m.tv, 6) AS total_variation,
           round(m.bc, 6) AS bhattacharyya_coef,
           round(sqrt(1.0 - m.bc), 6) AS hellinger,
           (SELECT event_type FROM top) AS biggest_shift_type
    FROM m
    """,
)
def q283_distribution_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-distance zoo over the period-on-period event-type
    mix: total variation (the max probability any event-classifier
    can exploit), Bhattacharyya coefficient, and Hellinger distance
    — bounded, symmetric drift metrics that stay FINITE when a
    category appears or disappears (where q122's KL and q219's PSI
    blow up), plus the single type that moved most. Different
    contracts for the same drift question: PSI for monitoring
    thresholds, KS (q281) for continuous outcomes, TV/Hellinger for
    categorical mixes.

    Scale: one combining agg to the (period x type) grid; distances
    are arithmetic on that bounded relation. The argmax type is a
    bounded TakeOrdered, not a global sort.
    """
    e = load(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    g = e.groupBy(
        F.when(F.col("ts") < cut, "old").otherwise("new").alias("period"),
        "event_type",
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    tot = g.groupBy("period").agg(F.sum("n").alias("tn"))
    s = g.join(F.broadcast(tot), "period").select(
        "event_type", "period", (F.col("n") / F.col("tn")).alias("p")
    )
    o = s.where(F.col("period") == "old").select("event_type", F.col("p").alias("po"))
    n = s.where(F.col("period") == "new").select("event_type", F.col("p").alias("pn"))
    j = o.join(n, "event_type").select(
        "event_type",
        F.abs(F.col("po") - F.col("pn")).alias("adiff"),
        F.sqrt(F.col("po") * F.col("pn")).alias("bcterm"),
    )
    m = j.agg((F.sum("adiff") / 2.0).alias("tv"), F.sum("bcterm").alias("bc"))
    top = j.orderBy(F.desc("adiff"), "event_type").limit(1).select(
        F.col("event_type").alias("biggest_shift_type")
    )
    return m.crossJoin(F.broadcast(top)).select(
        F.round("tv", 6).alias("total_variation"),
        F.round("bc", 6).alias("bhattacharyya_coef"),
        F.round(F.sqrt(1.0 - F.col("bc")), 6).alias("hellinger"),
        "biggest_shift_type",
    )


@register(
    "q284_simpson_paradox_detector",
    oracle="""
    WITH ev AS (
        SELECT event_type,
               CAST(hour(ts) AS DOUBLE) AS x, value AS y
        FROM events
    ),
    per AS (
        SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
               sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
               sum(x * x) AS sxx
        FROM ev GROUP BY 1
    ),
    slopes AS (
        SELECT event_type,
               (sxy - sx * sy / n) / (sxx - sx * sx / n) AS slope
        FROM per
    ),
    pooled AS (
        SELECT (sum(sxy) - sum(sx) * sum(sy) / sum(n))
               / (sum(sxx) - sum(sx) * sum(sx) / sum(n)) AS pslope
        FROM per
    )
    SELECT s.event_type,
           round(s.slope, 6) AS group_slope,
           round(p.pslope, 6) AS pooled_slope,
           CAST((s.slope > 0) != (p.pslope > 0) AS BOOLEAN)
               AS sign_disagrees
    FROM slopes s, pooled p
    ORDER BY s.event_type
    """,
)
def q284_simpson_paradox_detector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox detector: the pooled OLS slope of value on
    hour-of-day next to each event-type's within-group slope, with a
    flag where the SIGN disagrees — the aggregation trap every
    dashboard rollup is exposed to (a positive pooled trend made of
    uniformly negative group trends means the MIX drives the trend,
    exactly what q280 then quantifies). Run this before trusting any
    pooled correlation.

    Scale: ONE combining agg produces per-group moment cells; both
    the group slopes and the pooled slope (a sum of the same cells)
    are arithmetic on the bounded grid — the pooled fit costs no
    second corpus pass because OLS moments are additive.
    """
    e = load(spark, sf_dir, "events")
    ev = e.select(
        "event_type", F.hour("ts").cast("double").alias("x"), F.col("value").alias("y")
    )
    per = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    )
    slopes = per.select("event_type", slope.alias("slope"))
    pooled = per.agg(
        (
            (F.sum("sxy") - F.sum("sx") * F.sum("sy") / F.sum("n"))
            / (F.sum("sxx") - F.sum("sx") * F.sum("sx") / F.sum("n"))
        ).alias("pslope")
    )
    return (
        slopes.crossJoin(F.broadcast(pooled))
        .select(
            "event_type",
            F.round("slope", 6).alias("group_slope"),
            F.round("pslope", 6).alias("pooled_slope"),
            ((F.col("slope") > 0) != (F.col("pslope") > 0)).alias("sign_disagrees"),
        )
        .orderBy("event_type")
    )


@register(
    "q289_weighted_median",
    oracle="""
    WITH base AS (
        SELECT l_returnflag AS flag, l_extendedprice AS v,
               CAST(l_quantity AS DOUBLE) AS w
        FROM lineitem
    ),
    tot AS (SELECT flag, sum(w) AS tw FROM base GROUP BY 1),
    run AS (
        SELECT flag, v, w,
               sum(w) OVER (PARTITION BY flag ORDER BY v, w
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cw
        FROM base
    ),
    med AS (
        SELECT r.flag, min(r.v) AS wmed
        FROM run r JOIN tot t USING (flag)
        WHERE r.cw >= t.tw / 2.0
        GROUP BY r.flag
    )
    SELECT m.flag AS l_returnflag,
           round(t.tw, 2) AS total_weight,
           round(m.wmed, 2) AS weighted_median
    FROM med m JOIN tot t ON t.flag = m.flag
    ORDER BY m.flag
    """,
)
def q289_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median per group (price weighted by quantity): the
    smallest value whose cumulative weight reaches half the group
    total — the robust center that q39's unweighted percentiles
    cannot give when rows carry different mass (revenue-weighted
    latency, token-weighted doc quality). Neither engine ships a
    weighted quantile, so both sides run the identical
    cumulative-weight definition.

    Scale: the cumulative weight is a GROUP-partitioned window (the
    partition key is the group — no single-partition WindowExec; at
    a billion rows per group, swap the within-group sort for the
    two-pass bucket recipe of operators/ranking, same as q281's
    ECDF). The crossing-point filter and min collapse per group.
    """
    li = load(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").cast("double").alias("w"),
    )
    tot = base.groupBy("flag").agg(F.sum("w").alias("tw"))
    wrun = (
        Window.partitionBy("flag")
        .orderBy("v", "w")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = base.withColumn("cw", F.sum("w").over(wrun))
    med = (
        run.join(F.broadcast(tot), "flag")
        .where(F.col("cw") >= F.col("tw") / 2.0)
        .groupBy("flag")
        .agg(F.min("v").alias("wmed"))
    )
    return (
        med.join(F.broadcast(tot), "flag")
        .select(
            F.col("flag").alias("l_returnflag"),
            F.round("tw", 2).alias("total_weight"),
            F.round("wmed", 2).alias("weighted_median"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q290_conformance_audit",
    oracle="""
    WITH allowed (src, dst) AS (VALUES
        ('signup', 'view'), ('signup', 'click'),
        ('view', 'view'), ('view', 'click'), ('view', 'signup'),
        ('click', 'view'), ('click', 'purchase'), ('click', 'click'),
        ('purchase', 'view'), ('purchase', 'click'),
        ('error', 'view'), ('error', 'click'), ('error', 'error')
    ),
    seq AS (
        SELECT event_type AS src,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS dst
        FROM events
    ),
    t AS (
        SELECT src, dst, CAST(count(*) AS BIGINT) AS n
        FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(sum(n) AS DOUBLE) AS tn FROM t)
    SELECT t.src, t.dst, t.n,
           CAST(a.src IS NOT NULL AS BOOLEAN) AS is_allowed,
           round(t.n / tot.tn, 6) AS share
    FROM t LEFT JOIN allowed a ON a.src = t.src AND a.dst = t.dst
    CROSS JOIN tot
    ORDER BY t.src, t.dst
    """,
)
def q290_conformance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Process-mining conformance check: every observed event-type
    transition against a declared process model (the allowed-edge
    list), with counts, shares, and a violation flag — the
    discovery-vs-specification diff that process mining runs on
    event logs (q127 DISCOVERS the transition matrix; this AUDITS it
    against what the process is supposed to do; illegal edges are
    either instrumentation bugs or real broken flows, and both page
    someone).

    Scale: one user-keyed window pass for consecutive pairs, a
    combining agg to the bounded |types|^2 grid, and a broadcast
    join against the literal model. Same shuffle as q127.
    """
    e = load(spark, sf_dir, "events")
    allowed = spark.createDataFrame(
        [
            ("signup", "view"), ("signup", "click"),
            ("view", "view"), ("view", "click"), ("view", "signup"),
            ("click", "view"), ("click", "purchase"), ("click", "click"),
            ("purchase", "view"), ("purchase", "click"),
            ("error", "view"), ("error", "click"), ("error", "error"),
        ],
        "asrc string, adst string",
    )
    wq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(wq).alias("dst"),
    ).where(F.col("dst").isNotNull())
    t = seq.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    tot = t.agg(F.sum("n").cast("double").alias("tn"))
    return (
        t.join(
            F.broadcast(allowed),
            (t["src"] == allowed["asrc"]) & (t["dst"] == allowed["adst"]),
            "left",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "src",
            "dst",
            "n",
            F.col("asrc").isNotNull().alias("is_allowed"),
            F.round(F.col("n") / F.col("tn"), 6).alias("share"),
        )
        .orderBy("src", "dst")
    )


@register(
    "q292_price_elasticity",
    oracle="""
    WITH obs AS (
        SELECT p.p_brand,
               ln(li.l_extendedprice / li.l_quantity) AS x,
               ln(li.l_quantity) AS y
        FROM lineitem li JOIN part p ON li.l_partkey = p.p_partkey
        WHERE li.l_quantity > 0 AND li.l_extendedprice > 0
    ),
    m AS (
        SELECT p_brand, CAST(count(*) AS DOUBLE) AS n,
               sum(x) AS sx, sum(y) AS sy,
               sum(x * y) AS sxy, sum(x * x) AS sxx
        FROM obs GROUP BY 1
    )
    SELECT p_brand,
           CAST(n AS BIGINT) AS n_obs,
           round((sxy - sx * sy / n) / (sxx - sx * sx / n), 4)
               AS elasticity,
           round(sy / n - (sxy - sx * sy / n) / (sxx - sx * sx / n)
                 * (sx / n), 4) AS log_intercept
    FROM m ORDER BY p_brand
    """,
)
def q292_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Own-price elasticity of demand per brand: the log-log OLS
    slope of quantity on unit price (elasticity = d ln Q / d ln P) —
    the pricing econometric a revenue team fits before q221/q225
    measure a specific price test; elasticity < -1 means revenue
    RISES when price falls. Unit price derives from extended price /
    quantity; strictly-positive filters keep both logs defined
    identically in both engines.

    Scale: one key-equi join to attach brand (dim-sized build side),
    then one combining moment agg to the bounded |brands| grid — the
    whole fit is five additive cells per brand, the q284/q288
    subtractable-moments family.
    """
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    obs = (
        li.where((F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0))
        .join(p, li["l_partkey"] == p["p_partkey"])  # part-grain: unhinted, AQE decides
        .select(
            "p_brand",
            F.log(F.col("l_extendedprice") / F.col("l_quantity")).alias("x"),
            F.log("l_quantity").alias("y"),
        )
    )
    m = obs.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    )
    return m.select(
        "p_brand",
        F.col("n").cast("long").alias("n_obs"),
        F.round(slope, 4).alias("elasticity"),
        F.round(F.col("sy") / F.col("n") - slope * (F.col("sx") / F.col("n")), 4).alias(
            "log_intercept"
        ),
    ).orderBy("p_brand")


@register(
    "q294_aa_test",
    oracle="""
    WITH pu AS (
        SELECT user_id,
               user_id % 2 = 1 AS real_arm,
               (user_id // 2) % 2 = 1 AS placebo_arm,
               sum(value) AS v
        FROM events GROUP BY 1, 2, 3
    ),
    f AS (
        SELECT 'placebo' AS split, placebo_arm AS arm, v FROM pu
        UNION ALL
        SELECT 'real', real_arm, v FROM pu
    ),
    arms AS (
        SELECT split, arm, CAST(count(*) AS DOUBLE) AS n,
               sum(v) AS sv, sum(v * v) AS svv
        FROM f GROUP BY 1, 2
    ),
    z AS (
        SELECT a.split,
               CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
               (a.sv / a.n - b.sv / b.n)
               / sqrt((a.svv - a.sv * a.sv / a.n) / (a.n - 1) / a.n
                      + (b.svv - b.sv * b.sv / b.n) / (b.n - 1) / b.n)
                   AS zst
        FROM arms a JOIN arms b
          ON a.split = b.split AND a.arm AND NOT b.arm
    )
    SELECT split, n_a, n_b,
           round(zst, 4) AS z_stat,
           CAST(abs(zst) > 1.96 AS BOOLEAN) AS significant
    FROM z ORDER BY split
    """,
)
def q294_aa_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/A placebo test next to the real readout: run the identical
    Welch z on a PLACEBO split that is independent of the treatment
    hash (bit 1 of user_id instead of bit 0) — the validation every
    experimentation platform runs continuously, because a
    'significant' A/A means the assignment, the metric, or the
    variance model is broken and every real readout is suspect. The
    hygiene closure of the stack: q259 checks allocation, q268
    checks power, THIS checks the null calibration, then
    q150/q238/q221 report effects.

    Scale: one user-keyed agg carrying BOTH arm labels, a 4-cell
    moment rollup, and closed-form z arithmetic — the placebo costs
    no extra corpus pass because both splits read the same relation.
    """
    e = load(spark, sf_dir, "events")
    pu = e.groupBy(
        "user_id",
        (F.col("user_id") % 2 == 1).alias("real_arm"),
        (F.expr("user_id div 2") % 2 == 1).alias("placebo_arm"),
    ).agg(F.sum("value").alias("v"))
    f = pu.select(
        F.lit("placebo").alias("split"), F.col("placebo_arm").alias("arm"), "v"
    ).unionAll(pu.select(F.lit("real").alias("split"), F.col("real_arm").alias("arm"), "v"))
    arms = f.groupBy("split", "arm").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("v").alias("sv"),
        F.sum(F.col("v") * F.col("v")).alias("svv"),
    )
    a = arms.where(F.col("arm")).select(
        "split",
        F.col("n").alias("na"),
        F.col("sv").alias("sa"),
        F.col("svv").alias("sva"),
    )
    b = arms.where(~F.col("arm")).select(
        "split",
        F.col("n").alias("nb"),
        F.col("sv").alias("sb"),
        F.col("svv").alias("svb"),
    )
    from g_etl_spark.operators.stats import welch_z_from_moments

    zst = welch_z_from_moments(
        F.col("na"), F.col("sa"), F.col("sva"),
        F.col("nb"), F.col("sb"), F.col("svb"),
    )
    return (
        a.join(b, "split")
        .select(
            "split",
            F.col("na").cast("long").alias("n_a"),
            F.col("nb").cast("long").alias("n_b"),
            F.round(zst, 4).alias("z_stat"),
            (F.abs(zst) > 1.96).alias("significant"),
        )
        .orderBy("split")
    )


@register(
    "q296_column_profile",
    oracle="""
    WITH w AS MATERIALIZED (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_ok,
               CAST(count(DISTINCT o_orderkey) AS BIGINT) AS ndv_ok,
               round(min(CAST(o_orderkey AS DOUBLE)), 4) AS mn_ok,
               round(max(CAST(o_orderkey AS DOUBLE)), 4) AS mx_ok,
               CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_ck,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS ndv_ck,
               round(min(CAST(o_custkey AS DOUBLE)), 4) AS mn_ck,
               round(max(CAST(o_custkey AS DOUBLE)), 4) AS mx_ck,
               CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_os,
               CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS ndv_os,
               min(o_orderstatus) AS ms_os, max(o_orderstatus) AS xs_os,
               round(avg(length(o_orderstatus)), 4) AS al_os,
               CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_tp,
               CAST(count(DISTINCT o_totalprice) AS BIGINT) AS ndv_tp,
               round(min(o_totalprice), 4) AS mn_tp,
               round(max(o_totalprice), 4) AS mx_tp,
               CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_od,
               CAST(count(DISTINCT o_orderdate) AS BIGINT) AS ndv_od,
               round(min(epoch(o_orderdate)), 4) AS mn_od,
               round(max(epoch(o_orderdate)), 4) AS mx_od,
               CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_op,
               CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS ndv_op,
               min(o_orderpriority) AS ms_op, max(o_orderpriority) AS xs_op,
               round(avg(length(o_orderpriority)), 4) AS al_op
        FROM orders
    )
    SELECT * FROM (
        SELECT 'o_orderkey' AS column_name, n, nn_ok AS n_null, ndv_ok AS ndv,
               mn_ok AS min_num, mx_ok AS max_num,
               CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str,
               CAST(NULL AS DOUBLE) AS avg_len FROM w
        UNION ALL
        SELECT 'o_custkey', n, nn_ck, ndv_ck, mn_ck, mx_ck, NULL, NULL, NULL FROM w
        UNION ALL
        SELECT 'o_orderstatus', n, nn_os, ndv_os, NULL, NULL, ms_os, xs_os, al_os FROM w
        UNION ALL
        SELECT 'o_totalprice', n, nn_tp, ndv_tp, mn_tp, mx_tp, NULL, NULL, NULL FROM w
        UNION ALL
        SELECT 'o_orderdate', n, nn_od, ndv_od, mn_od, mx_od, NULL, NULL, NULL FROM w
        UNION ALL
        SELECT 'o_orderpriority', n, nn_op, ndv_op, NULL, NULL, ms_op, xs_op, al_op FROM w
    ) ORDER BY column_name
    """,
)
def q296_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profiling of the orders table
    (operators/profiling.profile_columns) — the statistics pass an
    engine runs before planning: per column row count, null count,
    exact NDV, numeric/epoch min-max, lexicographic string min-max,
    and average string length. NDV feeds broadcast-vs-shuffle join
    choices (q194's estimator consumes it), null fractions feed
    cleanup stages (P9), min/max are the zone-map / partition-prune
    primitives the warehouse Z-order serving relies on.

    Scale: everything except NDV is ONE wide map-side-combining
    aggregate over a single scan. Exact multi-column COUNT(DISTINCT)
    expands the scan |cols|-fold (Spark's Expand operator) — the
    operator's exact_ndv=False flag swaps in approx_count_distinct
    (HyperLogLog++, one pass, mergeable) for the 100 TB path; exact
    is kept here so both engines agree bit-for-bit.
    """
    from g_etl_spark.operators import profiling as P

    o = load(spark, sf_dir, "orders")
    kinds = {
        "o_orderkey": P.NUMERIC,
        "o_custkey": P.NUMERIC,
        "o_orderstatus": P.STRING,
        "o_totalprice": P.NUMERIC,
        "o_orderdate": P.TIMESTAMP,
        "o_orderpriority": P.STRING,
    }
    return P.profile_columns(o, kinds).orderBy("column_name")


@register(
    "q301_poststrat_ipw_ate",
    oracle="""
    WITH base AS (
        SELECT c.c_mktsegment AS stratum,
               CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS t,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS y_c
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    cells AS (
        SELECT stratum,
               CAST(count(*) AS BIGINT) AS n_s,
               CAST(sum(t) AS BIGINT) AS n_t,
               CAST(sum(t * y_c) AS BIGINT) AS sy_t,
               CAST(sum((1 - t) * y_c) AS BIGINT) AS sy_c
        FROM base GROUP BY stratum
    ),
    diffs AS (
        SELECT stratum, n_s, n_t,
               CAST(sy_t AS DOUBLE) / n_t / 100.0 AS mean_t,
               CAST(sy_c AS DOUBLE) / (n_s - n_t) / 100.0 AS mean_c
        FROM cells
    ),
    terms AS (
        SELECT stratum, n_s, n_t, mean_t, mean_c,
               CAST(round(1000000.0 * n_s * (mean_t - mean_c)) AS BIGINT) AS tq_ate,
               CAST(round(1000000.0 * n_t * (mean_t - mean_c)) AS BIGINT) AS tq_att
        FROM diffs
    ),
    pooled AS (
        SELECT CAST(sum(n_s) AS BIGINT) AS n,
               CAST(sum(n_t) AS BIGINT) AS nt,
               round(CAST(sum(tq_ate) AS DOUBLE) / sum(n_s) / 1000000.0, 4)
                   AS ate_poststrat,
               round(CAST(sum(tq_att) AS DOUBLE) / sum(n_t) / 1000000.0, 4)
                   AS att_poststrat
        FROM terms
    ),
    naive AS (
        SELECT round(CAST(sum(t * y_c) AS DOUBLE) / sum(t) / 100.0
                     - CAST(sum((1 - t) * y_c) AS DOUBLE) / sum(1 - t) / 100.0,
                     4) AS naive_diff
        FROM base
    )
    SELECT terms.stratum, terms.n_s, terms.n_t,
           round(terms.mean_t, 4) AS mean_treated,
           round(terms.mean_c, 4) AS mean_control,
           round(terms.mean_t - terms.mean_c, 4) AS stratum_diff,
           naive.naive_diff, pooled.ate_poststrat, pooled.att_poststrat
    FROM terms CROSS JOIN pooled CROSS JOIN naive
    ORDER BY stratum
    """,
)
def q301_poststrat_ipw_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-stratified average-treatment-effect estimation — the
    covariate-adjustment step the experimentation family (q150 z /
    q221 DiD / q225 CUPED / q270 QTE) assumed away: stratify on the
    customer's market segment (a pre-treatment covariate via the
    broadcast dim join), estimate the per-stratum treated-vs-control
    gap, and pool with n_s/n weights (ATE) and n_t,s/n_t weights
    (ATT). With stratum propensities e_s = n_t,s/n_s the
    Horvitz-Thompson IPW estimator is ALGEBRAICALLY the post-
    stratified ATE (Σ sy_t,s/e_s telescopes to Σ n_s·ȳ_t,s), so one
    set of cells prices all three readouts; naive diff shown for the
    imbalance gap. Per-stratum weighted terms are quantized to
    integer micro-units before the cross-stratum sum (the q177
    cent-quantize discipline), so pooling is engine-order-exact.

    Scale: ONE broadcast dim join + ONE combining agg to |strata|
    cells; every estimator is closed-form arithmetic on those cells.
    This is the q84/q287 mixture algebra pointed at causal readouts.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    base = o.join(
        c.select("c_custkey", "c_mktsegment"),  # unhinted: customer-grain dim, AQE decides
        o.o_custkey == c.c_custkey,
    ).select(
        F.col("c_mktsegment").alias("stratum"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("t"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("y_c"),
    )
    cells = base.groupBy("stratum").agg(
        F.count(F.lit(1)).cast("long").alias("n_s"),
        F.sum("t").cast("long").alias("n_t"),
        F.sum(F.col("t") * F.col("y_c")).cast("long").alias("sy_t"),
        F.sum((1 - F.col("t")) * F.col("y_c")).cast("long").alias("sy_c"),
    )
    diffs = cells.select(
        "stratum",
        "n_s",
        "n_t",
        (F.col("sy_t").cast("double") / F.col("n_t") / 100.0).alias("mean_t"),
        (
            F.col("sy_c").cast("double") / (F.col("n_s") - F.col("n_t")) / 100.0
        ).alias("mean_c"),
    )
    terms = diffs.select(
        "*",
        F.round(1000000.0 * F.col("n_s") * (F.col("mean_t") - F.col("mean_c")), 0)
        .cast("long")
        .alias("tq_ate"),
        F.round(1000000.0 * F.col("n_t") * (F.col("mean_t") - F.col("mean_c")), 0)
        .cast("long")
        .alias("tq_att"),
    )
    pooled = terms.agg(
        F.round(
            F.sum("tq_ate").cast("double") / F.sum("n_s") / 1000000.0, 4
        ).alias("ate_poststrat"),
        F.round(
            F.sum("tq_att").cast("double") / F.sum("n_t") / 1000000.0, 4
        ).alias("att_poststrat"),
    )
    naive = base.agg(
        F.round(
            F.sum(F.col("t") * F.col("y_c")).cast("double") / F.sum("t") / 100.0
            - F.sum((1 - F.col("t")) * F.col("y_c")).cast("double")
            / F.sum(1 - F.col("t"))
            / 100.0,
            4,
        ).alias("naive_diff")
    )
    return (
        terms.crossJoin(F.broadcast(pooled))
        .crossJoin(F.broadcast(naive))
        .select(
            "stratum",
            "n_s",
            "n_t",
            F.round("mean_t", 4).alias("mean_treated"),
            F.round("mean_c", 4).alias("mean_control"),
            F.round(F.col("mean_t") - F.col("mean_c"), 4).alias("stratum_diff"),
            "naive_diff",
            "ate_poststrat",
            "att_poststrat",
        )
        .orderBy("stratum")
    )


@register(
    "q302_kfold_cv_ols",
    oracle="""
    WITH rows_x AS (
        SELECT o_orderkey % 5 AS fold,
               CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS x,
               CAST(round(o_totalprice * 100) AS BIGINT) AS y_c
        FROM orders
    ),
    fm AS (
        SELECT fold, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y_c) AS BIGINT) AS sy,
               CAST(sum(x * y_c) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx
        FROM rows_x GROUP BY fold
    ),
    tm AS (
        SELECT CAST(sum(n) AS BIGINT) AS n, CAST(sum(sx) AS BIGINT) AS sx,
               CAST(sum(sy) AS BIGINT) AS sy, CAST(sum(sxy) AS BIGINT) AS sxy,
               CAST(sum(sxx) AS BIGINT) AS sxx
        FROM fm
    ),
    models AS (
        -- leave-fold-out training via SUBTRACTABLE moments: train = total - fold
        SELECT fm.fold,
               CAST(tm.n - fm.n AS BIGINT) AS n_train,
               (CAST(tm.n - fm.n AS DOUBLE) * CAST(tm.sxy - fm.sxy AS DOUBLE)
                - CAST(tm.sx - fm.sx AS DOUBLE) * CAST(tm.sy - fm.sy AS DOUBLE))
               / (CAST(tm.n - fm.n AS DOUBLE) * CAST(tm.sxx - fm.sxx AS DOUBLE)
                  - CAST(tm.sx - fm.sx AS DOUBLE) * CAST(tm.sx - fm.sx AS DOUBLE))
                   AS b,
               CAST(tm.sy - fm.sy AS DOUBLE) / CAST(tm.n - fm.n AS DOUBLE) AS ybar,
               CAST(tm.sx - fm.sx AS DOUBLE) / CAST(tm.n - fm.n AS DOUBLE) AS xbar
        FROM fm CROSS JOIN tm
    ),
    scored AS (
        SELECT m.fold AS model_fold, r.fold AS row_fold,
               CAST(round((r.y_c - (m.ybar - m.b * m.xbar) - m.b * r.x) / 100.0)
                    AS BIGINT) AS r_d
        FROM rows_x r CROSS JOIN models m
    ),
    evald AS (
        SELECT model_fold AS fold,
               CAST(sum(CASE WHEN row_fold = model_fold THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_test,
               CAST(sum(CASE WHEN row_fold = model_fold THEN r_d * r_d ELSE 0 END)
                    AS BIGINT) AS sse_test,
               CAST(sum(CASE WHEN row_fold <> model_fold THEN r_d * r_d ELSE 0 END)
                    AS BIGINT) AS sse_train
        FROM scored GROUP BY model_fold
    )
    SELECT e.fold, m.n_train, e.n_test,
           round(m.b, 6) AS beta_cents_per_day,
           round((m.ybar - m.b * m.xbar) / 100.0, 4) AS intercept_dollars,
           round(sqrt(CAST(e.sse_train AS DOUBLE) / m.n_train), 4)
               AS train_rmse_dollars,
           round(sqrt(CAST(e.sse_test AS DOUBLE) / e.n_test), 4)
               AS test_rmse_dollars,
           round(sqrt(CAST(e.sse_test AS DOUBLE) / e.n_test)
                 - sqrt(CAST(e.sse_train AS DOUBLE) / m.n_train), 4)
               AS generalization_gap
    FROM evald e JOIN models m ON e.fold = m.fold
    ORDER BY e.fold
    """,
)
def q302_kfold_cv_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold cross-validation of the OLS price trend WITHOUT
    retraining — the q288 subtractable-moment trick turned into a
    model-selection harness: per-fold integer moment cells subtract
    from the totals to give each leave-fold-out model in closed form
    (train = total − fold, zero extra scans), then ONE 5-way
    broadcast fan-out scores every row against every model for
    train/test RMSE and the generalization gap. The gap is the
    overfitting readout a feature pipeline checks before shipping a
    scorer (q134/q229's operating points assume it was checked).

    Scale: moments are integer-exact map-side cells (x = days from a
    baseline, y = cents; products and sums run in decimal(38,0) with
    an operand cast BEFORE each multiply, so nothing wraps at true
    100 TB row counts); residuals are
    quantized to whole dollars per ROW and summed as integers, so
    every readout is engine-order-exact. The scoring pass is a
    |folds|-row broadcast against one scan — no shuffle grows with
    the model count.
    """
    o = load(spark, sf_dir, "orders")
    rows_x = o.select(
        (F.col("o_orderkey") % 5).alias("fold"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("x"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("y_c"),
    )
    from g_etl_spark.operators.stats import kfold_cv_ols

    return kfold_cv_ols(rows_x)


_FD_CANDIDATES = [
    # (fd label, table, lhs col, rhs col)
    ("documents.source->lang", "documents", "source", "lang"),
    ("documents.lang->source", "documents", "lang", "source"),
    ("orders.o_custkey->o_orderpriority", "orders", "o_custkey", "o_orderpriority"),
    ("customer.c_nationkey->c_mktsegment", "customer", "c_nationkey", "c_mktsegment"),
    ("nation.n_nationkey->n_name", "nation", "n_nationkey", "n_name"),
]


def _fd_oracle_block(label: str, table: str, lhs: str, rhs: str) -> str:
    return f"""
    SELECT '{label}' AS fd,
           CAST(count(*) AS BIGINT) AS n_lhs_groups,
           CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating_groups,
           CAST(sum(tot) AS BIGINT) AS n_rows,
           CAST(sum(tot - mx) AS BIGINT) AS g3_rows_to_remove,
           round(CAST(sum(tot - mx) AS DOUBLE) / sum(tot), 6) AS violation_rate,
           sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) = 0 AS fd_holds
    FROM (
        SELECT {lhs} AS l, count(DISTINCT {rhs}) AS n_rhs,
               sum(cnt) AS tot, max(cnt) AS mx
        FROM (
            SELECT {lhs}, {rhs}, count(*) AS cnt
            FROM {table} GROUP BY {lhs}, {rhs}
        ) GROUP BY {lhs}
    )"""


@register(
    "q304_fd_violation_audit",
    oracle=" UNION ALL ".join(
        _fd_oracle_block(*fd) for fd in _FD_CANDIDATES
    )
    + " ORDER BY fd",
)
def q304_fd_violation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency violation audit — the data-quality rule
    class q247's Deequ suite doesn't cover (column CONSTRAINTS vs
    cross-column DEPENDENCIES): for each declared candidate FD X→Y,
    count the X-groups whose Y is not unique, and price the repair
    with the classic g3 measure (Kivinen–Mannila: the minimum number
    of rows to DELETE so the FD holds = Σ_groups (group size − modal
    Y count)). fd_holds=true certifies the dependency; a small g3
    says "dirty but repairable"; a large one says the assumed
    dependency is simply false (schema-design feedback). Candidates
    here span held (nation→segment style) and deliberately-false
    (custkey→priority) dependencies so both verdicts appear.

    Scale: per FD, ONE combining (X, Y) count followed by an X
    rollup — never wider than |distinct X×Y|; the per-group max
    needs no window (max of counts inside the second agg). FDs
    audit independently (a union of bounded rollups), so a 100 TB
    audit runs all candidates in one pass per table with
    multi-aggregate pushdown.
    """
    fd_wait = []
    for label, table, lhs, rhs in _FD_CANDIDATES:
        t = load(spark, sf_dir, table)
        pairs = t.groupBy(F.col(lhs).alias("l"), F.col(rhs).alias("r")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        per_lhs = pairs.groupBy("l").agg(
            F.countDistinct("r").alias("n_rhs"),
            F.sum("cnt").alias("tot"),
            F.max("cnt").alias("mx"),
        )
        viol = F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0))
        fd_wait.append(
            per_lhs.agg(
                F.lit(label).alias("fd"),
                F.count(F.lit(1)).cast("long").alias("n_lhs_groups"),
                viol.cast("long").alias("n_violating_groups"),
                F.sum("tot").cast("long").alias("n_rows"),
                F.sum(F.col("tot") - F.col("mx")).cast("long").alias(
                    "g3_rows_to_remove"
                ),
                F.round(
                    F.sum(F.col("tot") - F.col("mx")).cast("double") / F.sum("tot"),
                    6,
                ).alias("violation_rate"),
                (viol == 0).alias("fd_holds"),
            )
        )
    out = fd_wait[0]
    for nxt in fd_wait[1:]:
        out = out.unionByName(nxt)
    return out.orderBy("fd")


# Abramowitz & Stegun 7.1.26 erfc polynomial (promoted to
# operators/stats in r9 — literal constants in BOTH engines so the
# normal tail is portable; no erf built-in in either SQL dialect;
# |error| < 1.5e-7, absorbed by the p-value rounding at 8 decimals);
# the oracle f-strings below keep using this module-level alias
from g_etl_spark.operators.stats import ptail_sql as _ptail_sql  # noqa: E402


@register(
    "q308_bh_fdr_correction",
    oracle=f"""
    WITH base AS (
        SELECT o.o_orderpriority AS priority, c.c_mktsegment AS segment,
               o.o_orderkey % 2 AS t,
               CAST(round(o.o_totalprice) AS BIGINT) AS y
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    cells AS (
        SELECT priority, segment,
               CAST(sum(t) AS BIGINT) AS n1,
               CAST(sum(1 - t) AS BIGINT) AS n0,
               CAST(sum(t * y) AS BIGINT) AS s1,
               CAST(sum((1 - t) * y) AS BIGINT) AS s0,
               CAST(sum(t * y * y) AS BIGINT) AS ss1,
               CAST(sum((1 - t) * y * y) AS BIGINT) AS ss0
        FROM base GROUP BY priority, segment
    ),
    zs AS (
        SELECT priority, segment, n1, n0,
               (CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)
               / sqrt((CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
                      / (n1 - 1) / n1
                      + (CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE) * s0 / n0)
                        / (n0 - 1) / n0) AS z
        FROM cells
    ),
    ps AS (
        SELECT priority, segment, n1, n0, z,
               round({_ptail_sql("z")}, 8) AS p
        FROM zs
    ),
    ranked AS (
        SELECT *, row_number() OVER (
                   ORDER BY p ASC, priority ASC, segment ASC) AS rank,
               CAST(count(*) OVER () AS BIGINT) AS m
        FROM ps
    ),
    kmax AS (
        SELECT coalesce(max(CASE WHEN p <= round(rank * 0.05 / m, 8)
                                 THEN rank END), 0) AS k
        FROM ranked
    )
    SELECT priority, segment, n1 AS n_treat, n0 AS n_control,
           round(z, 4) AS z_stat, p AS p_value,
           CAST(rank AS BIGINT) AS p_rank,
           round(rank * 0.05 / m, 8) AS bh_cutoff,
           rank <= kmax.k AS rejected_bh,
           p <= 0.05 AS rejected_naive
    FROM ranked CROSS JOIN kmax
    ORDER BY priority, segment
    """,
)
def q308_bh_fdr_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg false-discovery-rate correction across a
    FAMILY of A/B readouts — the multiple-testing closure of the
    experimentation stack (q150 runs ONE z-test; a real experiment
    readout slices by segment×priority and runs 25, where naive
    α=0.05 thresholding expects ~1 false positive): Welch z per
    (priority, segment) cell from integer-dollar moments, two-sided
    p-values via the portable A&S erfc polynomial (literal
    constants in both engines — neither SQL dialect ships erf),
    step-up BH at q=0.05. On this effect-free synthetic data the BH
    set is empty while naive thresholding fires on chance — the
    correction visibly working. All BH comparisons run on p-values
    ROUNDED to 8 decimals, so the accept/reject boundary is
    engine-exact (the q300 quantize discipline).

    Scale: one broadcast dim join, ONE combining agg to 25 moment
    cells, closed-form z/p per cell, and the BH rank runs on the
    bounded test relation (25 rows — the q243 bounded-window
    contract). The 100 TB cost is the scan, not the statistics.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    base = o.join(
        c.select("c_custkey", "c_mktsegment"),  # unhinted: customer-grain dim, AQE decides
        o.o_custkey == c.c_custkey,
    ).select(
        F.col("o_orderpriority").alias("priority"),
        F.col("c_mktsegment").alias("segment"),
        (F.col("o_orderkey") % 2).alias("t"),
        F.round(F.col("o_totalprice"), 0).cast("long").alias("y"),
    )
    cells = base.groupBy("priority", "segment").agg(
        F.sum("t").cast("long").alias("n1"),
        F.sum(1 - F.col("t")).cast("long").alias("n0"),
        F.sum(F.col("t") * F.col("y")).cast("long").alias("s1"),
        F.sum((1 - F.col("t")) * F.col("y")).cast("long").alias("s0"),
        F.sum(F.col("t") * F.col("y") * F.col("y")).cast("long").alias("ss1"),
        F.sum((1 - F.col("t")) * F.col("y") * F.col("y")).cast("long").alias("ss0"),
    )
    from g_etl_spark.operators.stats import bh_fdr, welch_z_from_moments

    z = welch_z_from_moments(
        F.col("n1"), F.col("s1"), F.col("ss1"),
        F.col("n0"), F.col("s0"), F.col("ss0"),
    )
    ps = cells.withColumn("z", z).select(
        "priority", "segment", "n1", "n0", "z"
    ).withColumn("p", F.round(F.expr(_ptail_sql("z")), 8))
    return (
        bh_fdr(ps, "p", q=0.05, tiebreak_cols=["priority", "segment"])
        .select(
            "priority",
            "segment",
            F.col("n1").alias("n_treat"),
            F.col("n0").alias("n_control"),
            F.round("z", 4).alias("z_stat"),
            F.col("p").alias("p_value"),
            "p_rank",
            "bh_cutoff",
            "rejected_bh",
            (F.col("p") <= 0.05).alias("rejected_naive"),
        )
        .orderBy("priority", "segment")
    )


_ZM_FILE_ROWS = 1000            # rows per simulated parquet file
_ZM_LO, _ZM_HI = 10_000_000, 11_000_000  # predicate: $100k..$110k in cents


def _zm_oracle_block(layout: str, order_sql: str) -> str:
    return f"""
    SELECT '{layout}' AS layout,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(CASE WHEN mx >= {_ZM_LO} AND mn <= {_ZM_HI}
                         THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
           CAST(sum(CASE WHEN mx >= {_ZM_LO} AND mn <= {_ZM_HI}
                         THEN n ELSE 0 END) AS BIGINT) AS rows_scanned,
           CAST(max(nm) AS BIGINT) AS n_matching,
           round(1.0 - CAST(sum(CASE WHEN mx >= {_ZM_LO} AND mn <= {_ZM_HI}
                                     THEN 1 ELSE 0 END) AS DOUBLE)
                       / count(*), 4) AS prune_ratio,
           round(CAST(sum(CASE WHEN mx >= {_ZM_LO} AND mn <= {_ZM_HI}
                               THEN n ELSE 0 END) AS DOUBLE)
                 / greatest(max(nm), 1), 4) AS scan_amplification
    FROM (
        SELECT CAST(floor((rn - 1) / {_ZM_FILE_ROWS}.0) AS BIGINT) AS f,
               min(cents) AS mn, max(cents) AS mx, count(*) AS n,
               sum(sum(CASE WHEN cents BETWEEN {_ZM_LO} AND {_ZM_HI}
                            THEN 1 ELSE 0 END)) OVER () AS nm
        FROM (
            SELECT cents,
                   row_number() OVER (ORDER BY {order_sql}) AS rn
            FROM (SELECT o_orderkey,
                         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
                  FROM orders)
        ) GROUP BY 1
    )"""


@register(
    "q311_zonemap_pruning_audit",
    oracle=_zm_oracle_block("ingest", "o_orderkey")
    + " UNION ALL "
    + _zm_oracle_block("clustered", "cents, o_orderkey")
    + " ORDER BY layout",
)
def q311_zonemap_pruning_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (file min/max) pruning effectiveness under two
    physical layouts — the measurement behind the warehouse's
    Z-order decision (q22/q299 assert the layout; this PRICES it):
    simulate 1000-row parquet files in (a) ingest order and (b)
    price-clustered order, record per-file min/max of the price
    column, and count the files/rows a $100k-110k predicate must
    scan under footer-level pruning. Ingest order interleaves the
    whole price range into every file (prune_ratio ≈ 0); clustering
    concentrates the band into ~contiguous files (prune_ratio → 1,
    scan amplification → 1). The delta is the exact argument for
    paying a one-time re-cluster of a 100 TB corpus.

    Scale: file ids come from the operators/ranking TWO-PASS rank
    (bucket-partitioned windows only — dogfooding the r8 retrofit
    machinery on the layout simulator itself); per-file min/max is
    one combining agg; the verdict row per layout is a second
    |files|-row agg. The real engine gets this for free from parquet
    footers — the query measures what those footers WILL deliver
    before the corpus is rewritten.
    """
    from g_etl_spark.operators.ranking import global_rank_twopass, log2_bucket

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    layouts = [
        ("ingest", ["o_orderkey"], log2_bucket(F.col("o_orderkey"))),
        ("clustered", ["cents", "o_orderkey"], log2_bucket(F.col("cents"))),
    ]
    match = F.col("cents").between(_ZM_LO, _ZM_HI)
    outs = []
    for name, order_cols, bucket in layouts:
        ranked = global_rank_twopass(o, order_cols, bucket, out="rn")
        files = ranked.groupBy(
            F.floor((F.col("rn") - 1) / _ZM_FILE_ROWS).cast("long").alias("f")
        ).agg(
            F.min("cents").alias("mn"),
            F.max("cents").alias("mx"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(match, 1).otherwise(0)).alias("nm_part"),
        )
        nm = files.agg(F.sum("nm_part").alias("nm"))
        scanned = (F.col("mx") >= _ZM_LO) & (F.col("mn") <= _ZM_HI)
        outs.append(
            files.crossJoin(F.broadcast(nm)).agg(
                F.lit(name).alias("layout"),
                F.count(F.lit(1)).cast("long").alias("n_files"),
                F.sum(F.when(scanned, 1).otherwise(0)).cast("long").alias(
                    "files_scanned"
                ),
                F.sum(F.when(scanned, F.col("n")).otherwise(0)).cast("long").alias(
                    "rows_scanned"
                ),
                F.max("nm").cast("long").alias("n_matching"),
                F.round(
                    1.0
                    - F.sum(F.when(scanned, 1).otherwise(0)).cast("double")
                    / F.count(F.lit(1)),
                    4,
                ).alias("prune_ratio"),
                F.round(
                    F.sum(F.when(scanned, F.col("n")).otherwise(0)).cast("double")
                    / F.greatest(F.max("nm"), F.lit(1)),
                    4,
                ).alias("scan_amplification"),
            )
        )
    out = outs[0]
    for nxt in outs[1:]:
        out = out.unionByName(nxt)
    return out.orderBy("layout")


@register(
    "q313_median_order_stat_ci",
    oracle="""
    WITH v AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderkey
        FROM orders
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
    bounds AS (
        SELECT n,
               CAST(floor(n / 2.0 - 0.98 * sqrt(n)) AS BIGINT) AS lo_rank,
               CAST(ceil(n / 2.0 + 1 + 0.98 * sqrt(n)) AS BIGINT) AS hi_rank,
               CAST(floor((n + 1) / 2.0) AS BIGINT) AS med_rank
        FROM n
    ),
    ranked AS (
        SELECT cents, row_number() OVER (ORDER BY cents, o_orderkey) AS rn
        FROM v
    )
    SELECT bounds.n,
           round(max(CASE WHEN rn = med_rank THEN cents END) / 100.0, 2)
               AS median_value,
           round(max(CASE WHEN rn = lo_rank THEN cents END) / 100.0, 2) AS ci_lo,
           round(max(CASE WHEN rn = hi_rank THEN cents END) / 100.0, 2) AS ci_hi,
           bounds.lo_rank, bounds.hi_rank
    FROM ranked CROSS JOIN bounds
    GROUP BY bounds.n, bounds.lo_rank, bounds.hi_rank
    """,
)
def q313_median_order_stat_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free 95% confidence interval for the MEDIAN via
    order statistics — the binomial-rank identity (CI endpoints are
    the values at ranks n/2 ∓ z·√n/2; no normality, no bootstrap
    replicates, no RNG): the uncertainty readout q39's exact
    percentiles and q160's sketch quantiles both lack. Rank bounds
    are integer arithmetic on n; endpoint values are exact integer
    cents, so both engines emit identical intervals.

    Scale: the global rank runs as the operators/ranking TWO-PASS
    rank (bucket-partitioned windows only — the r8 retrofit
    machinery dogfooded again), and only three ranks are ever looked
    up, via conditional aggregation — no sorted relation is
    materialized. At 100 TB the same three lookups ride the
    mergeable log-histogram (q160) when one-pass matters more than
    exactness.
    """
    from g_etl_spark.operators.ranking import global_rank_twopass, log2_bucket

    o = load(spark, sf_dir, "orders")
    v = o.select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        "o_orderkey",
    )
    n = v.agg(F.count(F.lit(1)).cast("long").alias("n"))
    bounds = n.select(
        "n",
        F.floor(F.col("n") / 2.0 - 0.98 * F.sqrt(F.col("n"))).cast("long").alias(
            "lo_rank"
        ),
        F.ceil(F.col("n") / 2.0 + 1 + 0.98 * F.sqrt(F.col("n"))).cast("long").alias(
            "hi_rank"
        ),
        F.floor((F.col("n") + 1) / 2.0).cast("long").alias("med_rank"),
    )
    ranked = global_rank_twopass(
        v, ["cents", "o_orderkey"], log2_bucket(F.col("cents")), out="rn"
    )
    return (
        ranked.crossJoin(F.broadcast(bounds))
        .groupBy("n", "lo_rank", "hi_rank")
        .agg(
            F.round(
                F.max(F.when(F.col("rn") == F.col("med_rank"), F.col("cents")))
                / 100.0,
                2,
            ).alias("median_value"),
            F.round(
                F.max(F.when(F.col("rn") == F.col("lo_rank"), F.col("cents")))
                / 100.0,
                2,
            ).alias("ci_lo"),
            F.round(
                F.max(F.when(F.col("rn") == F.col("hi_rank"), F.col("cents")))
                / 100.0,
                2,
            ).alias("ci_hi"),
        )
        .select("n", "median_value", "ci_lo", "ci_hi", "lo_rank", "hi_rank")
    )


_KANON_K = 20


@register(
    "q314_kanon_suppressed_rollup",
    oracle=f"""
    WITH cells AS (
        SELECT c_mktsegment AS segment, CAST(c_nationkey AS BIGINT) AS nationkey,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM customer GROUP BY 1, 2
    ),
    marked AS (
        SELECT CASE WHEN n >= {_KANON_K} THEN segment
                    ELSE '__suppressed__' END AS segment,
               CASE WHEN n >= {_KANON_K} THEN CAST(nationkey AS VARCHAR)
                    ELSE '__suppressed__' END AS nationkey,
               n, cents
        FROM cells
    )
    SELECT segment, nationkey,
           CAST(sum(n) AS BIGINT) AS n,
           round(CAST(sum(cents) AS DOUBLE) / sum(n) / 100.0, 4) AS avg_acctbal
    FROM marked
    GROUP BY segment, nationkey
    HAVING sum(n) >= {_KANON_K}
    ORDER BY segment, nationkey
    """,
)
def q314_kanon_suppressed_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-anonymous publication rollup — the release-side counterpart
    of q207's k-anonymity AUDIT: aggregate account balances over the
    (segment, nation) quasi-identifier grid, but POOL every cell
    with fewer than k=20 members into one '__suppressed__' bucket
    before publishing, so no published row describes fewer than k
    individuals (the data-clean-room / census suppression rule). A
    trailing HAVING guards the edge where even the pooled bucket is
    under k (it is then withheld entirely rather than published
    small).

    Scale: two combining aggs (cells, then the pooled re-roll) —
    suppression never reshuffles the corpus, only the |cells|
    relation. Sums carry integer cents end-to-end, so the published
    averages are engine-exact.
    """
    c = load(spark, sf_dir, "customer")
    cells = c.groupBy(
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").cast("long").alias("nationkey"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("c_acctbal") * 100, 0).cast("long"))
        .cast("long")
        .alias("cents"),
    )
    small = F.col("n") < _KANON_K
    marked = cells.select(
        F.when(small, "__suppressed__").otherwise(F.col("segment")).alias("segment"),
        F.when(small, "__suppressed__")
        .otherwise(F.col("nationkey").cast("string"))
        .alias("nationkey"),
        "n",
        "cents",
    )
    return (
        marked.groupBy("segment", "nationkey")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.round(
                F.sum("cents").cast("double") / F.sum("n") / 100.0, 4
            ).alias("avg_acctbal"),
        )
        .filter(F.col("n") >= _KANON_K)
        .orderBy("segment", "nationkey")
    )


@register(
    "q315_spearman_rank_corr",
    oracle="""
    WITH rows_v AS (
        SELECT CAST(round(l_quantity) AS BIGINT) AS x,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        FROM lineitem
    ),
    mx AS (
        SELECT x, count(*) AS cnt,
               2 * coalesce(sum(count(*)) OVER (
                   ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) + count(*) + 1 AS r2
        FROM rows_v GROUP BY x
    ),
    my AS (
        SELECT y, count(*) AS cnt,
               2 * coalesce(sum(count(*)) OVER (
                   ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) + count(*) + 1 AS r2
        FROM rows_v GROUP BY y
    ),
    ranked AS (
        SELECT mx.r2 AS rx, my.r2 AS ry, r.x, r.y
        FROM rows_v r JOIN mx ON r.x = mx.x JOIN my ON r.y = my.y
    ),
    mo AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(rx) AS DOUBLE) AS sx, CAST(sum(ry) AS DOUBLE) AS sy,
               CAST(sum(rx * ry) AS DOUBLE) AS sxy,
               CAST(sum(rx * rx) AS DOUBLE) AS sxx,
               CAST(sum(ry * ry) AS DOUBLE) AS syy,
               CAST(sum(x) AS DOUBLE) AS px, CAST(sum(y) AS DOUBLE) AS py,
               CAST(sum(x * y) AS DOUBLE) AS pxy,
               CAST(sum(x * x) AS DOUBLE) AS pxx,
               CAST(sum(y * y) AS DOUBLE) AS pyy
        FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
               AS spearman_rho,
           round((n * pxy - px * py)
                 / sqrt((n * pxx - px * px) * (n * pyy - py * py)), 6)
               AS pearson_r
    FROM mo
    """,
)
def q315_spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (tie-corrected, midrank convention)
    between quantity and extended price, next to the plain Pearson r
    — the robust-association readout (Spearman sees monotone
    relationships Pearson's linearity misses, and survives the
    heavy-tailed prices q231 diagnoses). Midranks come from the q177
    collapsed-value prefix-sum trick: per distinct value,
    2·midrank = 2·(count of smaller rows) + count + 1 is an exact
    INTEGER, so the rank moments are integer-exact and both engines
    agree bit-for-bit (doubled ranks cancel in the correlation).

    Scale: two value rollups (|distinct| each — quantity has 50,
    price ~|rows|·0.99 — both map-side combining), two equi-joins to
    map rows to midranks, ONE moment aggregate. The rollup prefix
    sums run through the operators/ranking size-aware dispatch: the
    collapsed quantity/price maps take the plain window below the
    measured ~500k-row crossover, the two-pass above it (plain
    window in the oracle either way); no corpus sort, no pair join,
    no window over rows.
    """
    from g_etl_spark.operators.ranking import TWOPASS_CROSSOVER_ROWS
    from g_etl_spark.operators.stats import spearman_pearson

    li = load(spark, sf_dir, "lineitem")
    rows_v = li.select(
        F.round(F.col("l_quantity"), 0).cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("y"),
    )
    return spearman_pearson(rows_v, "x", "y", threshold_rows=TWOPASS_CROSSOVER_ROWS)




@register(
    "q317_twofactor_anova",
    oracle="""
    WITH base AS (
        SELECT o.o_orderkey % 2 AS a, c.c_mktsegment AS b,
               CAST(round(o.o_totalprice) AS BIGINT) AS y
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    cells AS (
        SELECT a, b, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS s,
               CAST(sum(y * y) AS BIGINT) AS ssq
        FROM base GROUP BY a, b
    ),
    lvl AS (
        SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(s) AS DOUBLE) AS stot,
               CAST(sum(ssq) AS DOUBLE) AS ssq_tot,
               CAST(count(*) AS BIGINT) AS n_cells,
               count(DISTINCT a) AS ka, count(DISTINCT b) AS kb,
               CAST(sum(CAST(round(CAST(s AS DOUBLE) * s / n * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS cell_term
        FROM cells
    ),
    amarg AS (
        SELECT CAST(sum(CAST(round(CAST(s AS DOUBLE) * s / n * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS a_term
        FROM (SELECT a, CAST(sum(s) AS BIGINT) AS s, CAST(sum(n) AS BIGINT) AS n
              FROM cells GROUP BY a)
    ),
    bmarg AS (
        SELECT CAST(sum(CAST(round(CAST(s AS DOUBLE) * s / n * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS b_term
        FROM (SELECT b, CAST(sum(s) AS BIGINT) AS s, CAST(sum(n) AS BIGINT) AS n
              FROM cells GROUP BY b)
    ),
    ss AS (
        SELECT lvl.nn,
               lvl.ka - 1 AS df_a, lvl.kb - 1 AS df_b,
               (lvl.ka - 1) * (lvl.kb - 1) AS df_ab,
               lvl.nn - lvl.n_cells AS df_w, lvl.nn - 1 AS df_t,
               amarg.a_term - lvl.stot * lvl.stot / lvl.nn AS ss_a,
               bmarg.b_term - lvl.stot * lvl.stot / lvl.nn AS ss_b,
               lvl.cell_term - amarg.a_term - bmarg.b_term
                   + lvl.stot * lvl.stot / lvl.nn AS ss_ab,
               lvl.ssq_tot - lvl.cell_term AS ss_w,
               lvl.ssq_tot - lvl.stot * lvl.stot / lvl.nn AS ss_t
        FROM lvl CROSS JOIN amarg CROSS JOIN bmarg
    )
    SELECT * FROM (
        SELECT 'A(treatment)' AS source, round(ss_a, 2) AS ss,
               CAST(df_a AS BIGINT) AS df, round(ss_a / df_a, 4) AS ms,
               round((ss_a / df_a) / (ss_w / df_w), 4) AS f_ratio
        FROM ss
        UNION ALL
        SELECT 'B(segment)', round(ss_b, 2), CAST(df_b AS BIGINT),
               round(ss_b / df_b, 4), round((ss_b / df_b) / (ss_w / df_w), 4)
        FROM ss
        UNION ALL
        SELECT 'AB(interaction)', round(ss_ab, 2), CAST(df_ab AS BIGINT),
               round(ss_ab / df_ab, 4), round((ss_ab / df_ab) / (ss_w / df_w), 4)
        FROM ss
        UNION ALL
        SELECT 'within', round(ss_w, 2), CAST(df_w AS BIGINT),
               round(ss_w / df_w, 4), CAST(NULL AS DOUBLE)
        FROM ss
        UNION ALL
        SELECT 'total', round(ss_t, 2), CAST(df_t AS BIGINT),
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
        FROM ss
    ) ORDER BY source
    """,
)
def q317_twofactor_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-factor ANOVA with interaction — the factorial-experiment
    decomposition the pairwise family (q150 one factor, q221 DiD,
    q284 Simpson cells) never totals: partition the outcome variance
    into treatment main effect, segment main effect, their
    INTERACTION (does the treatment effect differ by segment — the
    question q240's uplift deciles eyeball), within-cell noise, and
    total, with F ratios against the within mean square. Sums of
    squares come from integer-dollar moment cells via the marginal
    identity SS = Σ s²/n − S²/N; every cross-level sum is quantized
    to integer hundredths first (the q301 discipline), so the
    decomposition is engine-exact at display precision.

    Scale: ONE broadcast dim join + ONE combining agg to |A×B|
    cells; marginals and the five output rows are arithmetic on that
    bounded relation. A 100 TB factorial readout costs one scan.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    base = o.join(
        c.select("c_custkey", "c_mktsegment"),  # unhinted: customer-grain dim, AQE decides
        o.o_custkey == c.c_custkey,
    ).select(
        (F.col("o_orderkey") % 2).alias("a"),
        F.col("c_mktsegment").alias("b"),
        F.round(F.col("o_totalprice"), 0).cast("long").alias("y"),
    )
    from g_etl_spark.operators.stats import two_factor_anova

    return two_factor_anova(
        base, "a", "b", "y", label_a="A(treatment)", label_b="B(segment)"
    )


@register(
    "q318_price_volume_mix",
    oracle="""
    WITH base AS (
        SELECT c.c_mktsegment AS segment,
               CASE WHEN year(o.o_orderdate) = 1996 THEN 2 ELSE 1 END AS period,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE year(o.o_orderdate) IN (1995, 1996)
    ),
    cells AS (
        SELECT segment,
               CAST(sum(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(sum(CASE WHEN period = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
               CAST(sum(CASE WHEN period = 1 THEN cents ELSE 0 END) AS BIGINT) AS s1,
               CAST(sum(CASE WHEN period = 2 THEN cents ELSE 0 END) AS BIGINT) AS s2
        FROM base GROUP BY segment
    )
    SELECT segment, n1, n2,
           round(s1 / 100.0, 2) AS rev1,
           round(s2 / 100.0, 2) AS rev2,
           round((s2 - s1) / 100.0, 2) AS delta_rev,
           round((n2 - n1) * (CAST(s1 AS DOUBLE) / n1) / 100.0, 2)
               AS volume_effect,
           round(n2 * (CAST(s2 AS DOUBLE) / n2 - CAST(s1 AS DOUBLE) / n1)
                 / 100.0, 2) AS price_effect
    FROM cells
    ORDER BY segment
    """,
)
def q318_price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume decomposition of the year-over-year revenue change
    per segment — the finance/BI waterfall behind every "why did
    revenue move" review (q280's Oaxaca-Blinder decomposes a RATE
    between groups; this decomposes a TOTAL between periods):
    Δrev = (Δn)·p̄₁ + n₂·(p̄₂ − p̄₁), volume at old price plus price
    at new volume — an EXACT identity (the two terms telescope to
    s₂ − s₁), pinned by test. Integer-cent sums end-to-end; the
    averages are the only doubles and they divide exact integers.

    Scale: one broadcast dim join, ONE combining agg to
    |segments|×2 cells, closed-form arithmetic after. A 100 TB
    revenue bridge costs one filtered scan (and the year filter
    partition-prunes on a date-partitioned lake).
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    base = (
        o.filter(F.year("o_orderdate").isin(1995, 1996))
        .join(
            c.select("c_custkey", "c_mktsegment"),  # unhinted: customer-grain dim, AQE decides
            o.o_custkey == c.c_custkey,
        )
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.when(F.year("o_orderdate") == 1996, 2).otherwise(1).alias("period"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        )
    )
    cells = base.groupBy("segment").agg(
        F.sum(F.when(F.col("period") == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("period") == 2, 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when(F.col("period") == 1, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("s1"),
        F.sum(F.when(F.col("period") == 2, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("s2"),
    )
    p1 = F.col("s1").cast("double") / F.col("n1")
    p2 = F.col("s2").cast("double") / F.col("n2")
    return cells.select(
        "segment",
        "n1",
        "n2",
        F.round(F.col("s1") / 100.0, 2).alias("rev1"),
        F.round(F.col("s2") / 100.0, 2).alias("rev2"),
        F.round((F.col("s2") - F.col("s1")) / 100.0, 2).alias("delta_rev"),
        F.round((F.col("n2") - F.col("n1")) * p1 / 100.0, 2).alias("volume_effect"),
        F.round(F.col("n2") * (p2 - p1) / 100.0, 2).alias("price_effect"),
    ).orderBy("segment")


_IG_FEATURES = [
    ("segment", "c_mktsegment"),
    ("orderstatus", "o_orderstatus"),
    ("orderyear", "CAST(year(o_orderdate) AS VARCHAR)"),
    ("noise_custkey_mod10", "CAST(o_custkey % 10 AS VARCHAR)"),
]


def _ig_oracle_block(label: str, expr: str) -> str:
    return f"""
    SELECT '{label}' AS feature,
           CAST(count(*) AS BIGINT) AS n_values,
           round(max(hy), 6) AS label_entropy,
           round(CAST(sum(CAST(round(nv * hv * 1000000000) AS BIGINT)) AS DOUBLE)
                 / 1000000000 / max(n), 6) AS cond_entropy,
           round(max(hy)
                 - CAST(sum(CAST(round(nv * hv * 1000000000) AS BIGINT)) AS DOUBLE)
                   / 1000000000 / max(n), 6) AS info_gain
    FROM (
        SELECT v, nv, pos,
               CASE WHEN pos = 0 OR pos = nv THEN 0.0
                    ELSE -(CAST(pos AS DOUBLE) / nv) * ln(CAST(pos AS DOUBLE) / nv)
                         - (CAST(nv - pos AS DOUBLE) / nv)
                           * ln(CAST(nv - pos AS DOUBLE) / nv)
               END AS hv,
               sum(nv) OVER () AS n,
               CASE WHEN sum(pos) OVER () = 0
                         OR sum(pos) OVER () = sum(nv) OVER () THEN 0.0
                    ELSE -(CAST(sum(pos) OVER () AS DOUBLE) / sum(nv) OVER ())
                          * ln(CAST(sum(pos) OVER () AS DOUBLE) / sum(nv) OVER ())
                         - (CAST(sum(nv) OVER () - sum(pos) OVER () AS DOUBLE)
                            / sum(nv) OVER ())
                          * ln(CAST(sum(nv) OVER () - sum(pos) OVER () AS DOUBLE)
                               / sum(nv) OVER ())
               END AS hy
        FROM (
            SELECT {expr} AS v, CAST(count(*) AS BIGINT) AS nv,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT) AS pos
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1
        )
    )"""


@register(
    "q319_information_gain_screen",
    oracle=" UNION ALL ".join(
        _ig_oracle_block(lbl, ex) for lbl, ex in _IG_FEATURES
    )
    + " ORDER BY feature",
)
def q319_information_gain_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Information-gain feature screening against the high-priority
    label, across FOUR candidate categorical features at once (q193's
    WOE/IV prices one numeric feature; this ranks a feature MENU the
    way a tree split or feature-selection pass does), including a
    deliberate noise feature (custkey mod 10) whose gain must sit at
    ~0 — the null reference that makes the other gains readable.
    IG = H(y) − Σ_v (n_v/n)·H(y|v); every per-value weighted entropy
    term is quantized to integer nano-nats before the cross-value
    sum (the q301 discipline), so the screen is engine-exact.

    Scale: per feature, ONE combining (value, label) rollup —
    |values| rows; all four features share one scan via multi-agg
    pushdown at 100 TB. Entropies are closed-form on the bounded
    rollup; the label entropy is a window over it (bounded, q243
    contract).
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    joined = o.join(
        c.select("c_custkey", "c_mktsegment"),  # unhinted: customer-grain dim, AQE decides
        o.o_custkey == c.c_custkey,
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.col("o_orderstatus").alias("orderstatus"),
        F.year("o_orderdate").cast("string").alias("orderyear"),
        (F.col("o_custkey") % 10).cast("string").alias("noise_custkey_mod10"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        ).otherwise(0).alias("y"),
    )

    def h(p):  # binary entropy of a fraction column, 0 at the edges
        return F.when((p <= 0.0) | (p >= 1.0), 0.0).otherwise(
            -p * F.log(p) - (1 - p) * F.log(1 - p)
        )

    outs = []
    for label, _ in _IG_FEATURES:
        cells = joined.groupBy(F.col(label).alias("v")).agg(
            F.count(F.lit(1)).cast("long").alias("nv"),
            F.sum("y").cast("long").alias("pos"),
        )
        tot = cells.agg(
            F.sum("nv").cast("long").alias("n"), F.sum("pos").cast("long").alias("tp")
        )
        hv = h(F.col("pos").cast("double") / F.col("nv"))
        hy = h(F.col("tp").cast("double") / F.col("n"))
        term_q = F.round(F.col("nv") * hv * 1e9, 0).cast("long")
        outs.append(
            cells.crossJoin(F.broadcast(tot)).agg(
                F.lit(label).alias("feature"),
                F.count(F.lit(1)).cast("long").alias("n_values"),
                F.round(F.max(hy), 6).alias("label_entropy"),
                F.round(
                    F.sum(term_q).cast("double") / 1e9 / F.max("n"), 6
                ).alias("cond_entropy"),
                F.round(
                    F.max(hy) - F.sum(term_q).cast("double") / 1e9 / F.max("n"), 6
                ).alias("info_gain"),
            )
        )
    out = outs[0]
    for nxt in outs[1:]:
        out = out.unionByName(nxt)
    return out.orderBy("feature")


_FRESH_SLA_HOURS = 24


@register(
    "q320_freshness_audit",
    oracle=f"""
    WITH per_type AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               epoch_us(max(ts)) AS last_us
        FROM events GROUP BY event_type
    ),
    hw AS (SELECT max(last_us) AS hwm FROM per_type)
    SELECT event_type, n_events, last_us,
           round((hw.hwm - last_us) / 3600000000.0, 4) AS lag_hours,
           (hw.hwm - last_us) > {_FRESH_SLA_HOURS} * 3600000000 AS stale
    FROM per_type CROSS JOIN hw
    ORDER BY event_type
    """,
)
def q320_freshness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream freshness/staleness audit — the pipeline-operations
    check that pages someone BEFORE q293's quality drift can even
    accumulate: each event type's high-water mark (integer event-time
    micros — a raw timestamp column would hit the ns-vs-us pandas
    decode split between engines), its lag behind
    the global high-water mark in hours, and a >24h SLA breach flag.
    Lags are integer microsecond differences (engine-exact); the
    flag compares integers, never floats.

    Scale: ONE map-side-combining agg to |types| rows plus a 1-row
    broadcast of the global high-water mark. On a date-partitioned
    lake the same audit reads only each partition's footer max —
    effectively free, which is why it runs every ingest cycle.
    """
    e = load(spark, sf_dir, "events")
    per_type = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.unix_micros(F.max("ts")).alias("last_us"),
    )
    hw = per_type.agg(F.max("last_us").alias("hwm"))
    return (
        per_type.crossJoin(F.broadcast(hw))
        .select(
            "event_type",
            "n_events",
            "last_us",
            F.round((F.col("hwm") - F.col("last_us")) / 3600000000.0, 4).alias(
                "lag_hours"
            ),
            (
                (F.col("hwm") - F.col("last_us"))
                > _FRESH_SLA_HOURS * 3600000000
            ).alias("stale"),
        )
        .orderBy("event_type")
    )


# (table, numeric+timestamp col count, string cols) — schema widths for
# the planning advisor; strings are measured, fixed types are 8 bytes
_ADVISOR_TABLES = [
    ("orders", 4, ["o_orderstatus", "o_orderpriority"]),
    ("lineitem", 9, ["l_returnflag", "l_linestatus"]),
    ("customer", 3, ["c_name", "c_mktsegment"]),
    ("events", 4, ["event_type", "props"]),
    ("documents", 2, ["text", "lang", "source"]),
]

_TARGET_PART_BYTES = 128 * 1024 * 1024


def _advisor_block(table: str, n_fixed: int, str_cols: list[str]) -> str:
    sumlens = " + ".join(f"sum(length({c}))" for c in str_cols)
    return f"""
    SELECT '{table}' AS table_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST({8 * n_fixed} * count(*) + {sumlens}
                + {4 * len(str_cols)} * count(*) AS BIGINT) AS est_bytes,
           round(CAST({8 * n_fixed} * count(*) + {sumlens}
                      + {4 * len(str_cols)} * count(*) AS DOUBLE)
                 / count(*), 2) AS est_row_bytes,
           CAST(greatest(ceil(CAST({8 * n_fixed} * count(*) + {sumlens}
                                   + {4 * len(str_cols)} * count(*) AS DOUBLE)
                              / {_TARGET_PART_BYTES}), 1) AS BIGINT)
               AS partitions_128mb
    FROM {table}"""


@register(
    "q321_partition_size_advisor",
    oracle=" UNION ALL ".join(
        _advisor_block(*t) for t in _ADVISOR_TABLES
    )
    + " ORDER BY table_name",
)
def q321_partition_size_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle/scan partition-count advisor from measured table
    widths — the sizing arithmetic behind `spark.sql.shuffle.
    partitions` and `files.maxPartitionBytes` that SCALE_NOTES does
    by hand: estimate each table's in-memory bytes as 8 B per
    fixed-width column plus measured string lengths (+4 B string
    overhead), and emit the partition count that lands each table at
    128 MB per partition. The estimate is INTEGER byte totals
    (sums of lengths — no per-column averaged doubles crossing the
    engines), so both engines agree exactly. q296 profiles column
    STATS; this turns widths into the two knobs a job actually sets.

    Scale: one combining agg per table (length sums ride any
    existing scan). At 100 TB the same arithmetic runs on parquet
    footer metadata instead of a scan — the numbers it emits are
    the cluster-sizing inputs, which is the point.
    """
    outs = []
    for table, n_fixed, str_cols in _ADVISOR_TABLES:
        t = load(spark, sf_dir, table)
        n = F.count(F.lit(1))
        est = _table_bytes_est(n_fixed, str_cols)
        outs.append(
            t.agg(
                F.lit(table).alias("table_name"),
                n.cast("long").alias("n_rows"),
                est.alias("est_bytes"),
                F.round(est.cast("double") / n, 2).alias("est_row_bytes"),
                F.greatest(
                    F.ceil(est.cast("double") / _TARGET_PART_BYTES), F.lit(1)
                ).cast("long").alias("partitions_128mb"),
            )
        )
    out = outs[0]
    for nxt in outs[1:]:
        out = out.unionByName(nxt)
    return out.orderBy("table_name")


@register(
    "q322_join_order_cost_rank",
    oracle="""
    WITH stats AS (
        SELECT (SELECT CAST(count(*) AS DOUBLE) FROM orders) AS n_o,
               (SELECT CAST(count(DISTINCT o_custkey) AS DOUBLE) FROM orders) AS d_oc,
               (SELECT CAST(count(*) AS DOUBLE) FROM customer) AS n_c,
               (SELECT CAST(count(DISTINCT c_custkey) AS DOUBLE) FROM customer) AS d_cc,
               (SELECT CAST(count(DISTINCT c_nationkey) AS DOUBLE) FROM customer) AS d_cn,
               (SELECT CAST(count(*) AS DOUBLE) FROM nation) AS n_n,
               (SELECT CAST(count(DISTINCT n_nationkey) AS DOUBLE) FROM nation) AS d_nn
    ),
    plans AS (
        SELECT 'orders-customer_then_nation' AS plan,
               n_o * n_c / greatest(d_oc, d_cc) AS first_join,
               n_o * n_c / greatest(d_oc, d_cc) * n_n / greatest(d_cn, d_nn)
                   AS final_rows
        FROM stats
        UNION ALL
        SELECT 'customer-nation_then_orders',
               n_c * n_n / greatest(d_cn, d_nn),
               n_c * n_n / greatest(d_cn, d_nn) * n_o / greatest(d_oc, d_cc)
        FROM stats
        UNION ALL
        SELECT 'orders-nation_cross_then_customer',
               n_o * n_n,
               n_o * n_n * n_c / greatest(d_oc, d_cc) / greatest(d_cn, d_nn)
        FROM stats
    )
    SELECT plan,
           CAST(round(first_join) AS BIGINT) AS est_intermediate_rows,
           CAST(round(final_rows) AS BIGINT) AS est_final_rows,
           CAST(row_number() OVER (
               ORDER BY first_join + final_rows, plan) AS BIGINT) AS cost_rank
    FROM plans
    ORDER BY cost_rank
    """,
)
def q322_join_order_cost_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-order cost ranking from catalog statistics — the
    textbook System-R estimate |A⋈B| = |A|·|B| / max(ndv_A, ndv_B)
    applied to the three left-deep orders of orders⋈customer⋈nation,
    making the optimizer's choice INSPECTABLE (q194 estimates ONE
    join's size by sampling; this ranks whole orders from NDV stats
    — exactly what Catalyst's CBO consumes, fed here by q296's
    profile). The no-shared-key order prices as a cross product and
    must rank last; the dim-first order (customer⋈nation) wins
    because its intermediate never exceeds |customer|.

    Scale: the statistics are six scalar aggregates (exact here,
    HLL NDVs at 100 TB — q296's exact_ndv flag); the ranking is
    arithmetic on a 3-row relation (bounded window, q243 contract).
    Nothing here touches more than one scan per statistic.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    stats = (
        o.agg(
            F.count(F.lit(1)).cast("double").alias("n_o"),
            F.countDistinct("o_custkey").cast("double").alias("d_oc"),
        )
        .crossJoin(
            F.broadcast(
                c.agg(
                    F.count(F.lit(1)).cast("double").alias("n_c"),
                    F.countDistinct("c_custkey").cast("double").alias("d_cc"),
                    F.countDistinct("c_nationkey").cast("double").alias("d_cn"),
                )
            )
        )
        .crossJoin(
            F.broadcast(
                n.agg(
                    F.count(F.lit(1)).cast("double").alias("n_n"),
                    F.countDistinct("n_nationkey").cast("double").alias("d_nn"),
                )
            )
        )
    )
    # shared intermediate-estimate expressions reused by every plan
    # row (no duplicated formula strings — r8 ADVICE), expressed as
    # DIRECT DIVISIONS in the oracle's exact operation order: a*b/c
    # and a*b*(1/c) differ by an ulp under IEEE rounding, and both
    # engines round the raw doubles to BIGINT before ranking, so the
    # reciprocal form was a latent cross-engine parity hazard
    # (r9 ADVICE item #1)
    g_oc = F.greatest(F.col("d_oc"), F.col("d_cc"))
    g_cn = F.greatest(F.col("d_cn"), F.col("d_nn"))
    oc = F.col("n_o") * F.col("n_c") / g_oc
    cn = F.col("n_c") * F.col("n_n") / g_cn
    on_x = F.col("n_o") * F.col("n_n")

    def _plan(name, first, final):
        return F.struct(
            F.lit(name).alias("plan"),
            first.alias("first_join"),
            final.alias("final_rows"),
        )

    plans = stats.select(
        F.explode(
            F.array(
                _plan("orders-customer_then_nation", oc, oc * F.col("n_n") / g_cn),
                _plan("customer-nation_then_orders", cn, cn * F.col("n_o") / g_oc),
                _plan(
                    "orders-nation_cross_then_customer",
                    on_x,
                    on_x * F.col("n_c") / g_oc / g_cn,
                ),
            )
        ).alias("p")
    ).select("p.plan", "p.first_join", "p.final_rows")
    w = Window.orderBy(F.col("first_join") + F.col("final_rows"), F.col("plan"))
    return (
        plans.select(
            "plan",
            F.round("first_join", 0).cast("long").alias("est_intermediate_rows"),
            F.round("final_rows", 0).cast("long").alias("est_final_rows"),
            F.row_number().over(w).cast("long").alias("cost_rank"),
        )
        .orderBy("cost_rank")
    )


_TRIM_LEVELS = (0.0, 0.01, 0.05, 0.10)


@register(
    "q325_trimmed_effect_sensitivity",
    oracle=f"""
    WITH base AS (
        SELECT o_orderkey % 2 AS t,
               CAST(round(o_totalprice * 100) AS BIGINT) AS y
        FROM orders
    ),
    bounds AS (
        SELECT quantile_cont(y, [0.0, 0.01, 0.05, 0.10]) AS lo,
               quantile_cont(y, [1.0, 0.99, 0.95, 0.90]) AS hi
        FROM base
    ),
    lv AS (
        SELECT unnest([{", ".join(str(t) for t in _TRIM_LEVELS)}]) AS trim_pct,
               unnest(range(1, {len(_TRIM_LEVELS) + 1})) AS i
    ),
    cells AS (
        SELECT lv.trim_pct,
               CAST(count(*) AS BIGINT) AS n_kept,
               CAST(sum(b.t) AS BIGINT) AS n1,
               CAST(sum(b.t * b.y) AS BIGINT) AS s1,
               CAST(sum(1 - b.t) AS BIGINT) AS n0,
               CAST(sum((1 - b.t) * b.y) AS BIGINT) AS s0
        FROM base b CROSS JOIN bounds CROSS JOIN lv
        WHERE b.y >= bounds.lo[lv.i] AND b.y <= bounds.hi[lv.i]
        GROUP BY lv.trim_pct
    ),
    eff AS (
        SELECT trim_pct, n_kept,
               round(CAST(s1 AS DOUBLE) / n1 / 100.0
                     - CAST(s0 AS DOUBLE) / n0 / 100.0, 4) AS diff
        FROM cells
    ),
    ref AS (SELECT diff AS d0 FROM eff WHERE trim_pct = 0.0)
    SELECT eff.trim_pct, eff.n_kept, eff.diff,
           round(eff.diff - ref.d0, 4) AS delta_vs_untrimmed
    FROM eff CROSS JOIN ref
    ORDER BY eff.trim_pct
    """,
)
def q325_trimmed_effect_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-sensitivity sweep of the treatment effect — the
    robustness table a reviewer demands before believing q150's
    z-test on a heavy-tailed metric (q231 diagnoses the tail; this
    shows whether the EFFECT depends on it): the diff-in-means
    recomputed with the pooled outcome trimmed at 0/1/5/10% on both
    ends, plus each level's drift from the untrimmed estimate. An
    effect that flips sign or collapses under 1% trimming was an
    outlier artifact, not a treatment effect. Trim bounds are exact
    pooled quantiles (q182's convention — identical interpolation in
    both engines on integer cents); kept-row sums are integer cents.

    Scale: ONE pass computes all four exact bound pairs (one sort-
    free percentile agg; t-digest sketch at 100 TB, q39's trade),
    then one scan with a broadcast 4-row level set produces every
    trimmed cell via conditional aggregation — the whole sweep costs
    two scans regardless of how many levels are swept.
    """
    o = load(spark, sf_dir, "orders")
    base = o.select(
        (F.col("o_orderkey") % 2).alias("t"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("y"),
    )
    los = [0.0, 0.01, 0.05, 0.10]
    his = [1.0, 0.99, 0.95, 0.90]
    bounds = base.agg(
        *[
            F.expr(f"percentile(y, {p}D)").alias(f"lo_{i}")
            for i, p in enumerate(los)
        ],
        *[
            F.expr(f"percentile(y, {p}D)").alias(f"hi_{i}")
            for i, p in enumerate(his)
        ],
    )
    lv = base.sparkSession.createDataFrame(
        [(t, i) for i, t in enumerate(_TRIM_LEVELS)], "trim_pct double, i int"
    )
    lo = F.element_at(
        F.array(*[F.col(f"lo_{i}") for i in range(len(los))]), F.col("i") + 1
    )
    hi = F.element_at(
        F.array(*[F.col(f"hi_{i}") for i in range(len(his))]), F.col("i") + 1
    )
    cells = (
        base.crossJoin(F.broadcast(bounds))
        .crossJoin(F.broadcast(lv))
        .filter((F.col("y") >= lo) & (F.col("y") <= hi))
        .groupBy("trim_pct")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.sum("t").cast("long").alias("n1"),
            F.sum(F.col("t") * F.col("y")).cast("long").alias("s1"),
            F.sum(1 - F.col("t")).cast("long").alias("n0"),
            F.sum((1 - F.col("t")) * F.col("y")).cast("long").alias("s0"),
        )
    )
    eff = cells.select(
        "trim_pct",
        "n_kept",
        F.round(
            F.col("s1").cast("double") / F.col("n1") / 100.0
            - F.col("s0").cast("double") / F.col("n0") / 100.0,
            4,
        ).alias("diff"),
    )
    ref = eff.filter(F.col("trim_pct") == 0.0).select(F.col("diff").alias("d0"))
    return (
        eff.crossJoin(F.broadcast(ref))
        .select(
            "trim_pct",
            "n_kept",
            "diff",
            F.round(F.col("diff") - F.col("d0"), 4).alias("delta_vs_untrimmed"),
        )
        .orderBy("trim_pct")
    )


# ---------------------------------------------------------------------------
# Round-9 engine diagnostics: estimator-vs-truth audits
# ---------------------------------------------------------------------------

_QE_JOINS = [
    # (label, left table, left key, right table, right key)
    ("orders*customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem*orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem*part", "lineitem", "l_partkey", "part", "p_partkey"),
]


def _qerror_oracle_block(label: str, lt: str, lk: str, rt: str, rk: str) -> str:
    return f"""
    SELECT '{label}' AS join_name,
           CAST((SELECT count(*) FROM {lt}) AS BIGINT) AS n_left,
           CAST((SELECT count(*) FROM {rt}) AS BIGINT) AS n_right,
           CAST(round(CAST((SELECT count(*) FROM {lt}) AS DOUBLE)
                 * (SELECT count(*) FROM {rt})
                 / greatest((SELECT count(DISTINCT {lk}) FROM {lt}),
                            (SELECT count(DISTINCT {rk}) FROM {rt})))
               AS BIGINT) AS est_rows,
           (SELECT CAST(coalesce(sum(a.n * b.n), 0) AS BIGINT)
            FROM (SELECT {lk} AS k, count(*) AS n FROM {lt} GROUP BY 1) a
            JOIN (SELECT {rk} AS k, count(*) AS n FROM {rt} GROUP BY 1) b
              ON a.k = b.k) AS actual_rows,
           round(greatest(
               CAST(round(CAST((SELECT count(*) FROM {lt}) AS DOUBLE)
                     * (SELECT count(*) FROM {rt})
                     / greatest((SELECT count(DISTINCT {lk}) FROM {lt}),
                                (SELECT count(DISTINCT {rk}) FROM {rt})))
                   AS DOUBLE)
               / (SELECT coalesce(sum(a.n * b.n), 0)
                  FROM (SELECT {lk} AS k, count(*) AS n FROM {lt} GROUP BY 1) a
                  JOIN (SELECT {rk} AS k, count(*) AS n FROM {rt} GROUP BY 1) b
                    ON a.k = b.k),
               (SELECT coalesce(sum(a.n * b.n), 0)
                FROM (SELECT {lk} AS k, count(*) AS n FROM {lt} GROUP BY 1) a
                JOIN (SELECT {rk} AS k, count(*) AS n FROM {rt} GROUP BY 1) b
                  ON a.k = b.k)
               / CAST(round(CAST((SELECT count(*) FROM {lt}) AS DOUBLE)
                     * (SELECT count(*) FROM {rt})
                     / greatest((SELECT count(DISTINCT {lk}) FROM {lt}),
                                (SELECT count(DISTINCT {rk}) FROM {rt})))
                   AS DOUBLE)), 4) AS q_error
    """


@register(
    "q328_join_qerror_audit",
    oracle=" UNION ALL ".join(
        _qerror_oracle_block(*j) for j in _QE_JOINS
    )
    + " ORDER BY join_name",
)
def q328_join_qerror_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality q-error audit — the ESTIMATOR-vs-TRUTH loop
    q322 leaves open: q322 ranks plans by the System-R estimate
    |A⋈B| ≈ n_a·n_b / max(d_a, d_b); this measures how wrong that
    estimate is on three real joins, as q-error = max(est/act,
    act/est) — the metric the learned-cardinality literature scores
    optimizers with, and the number that says whether the q322
    ranking can be trusted on this data.

    The ACTUAL cardinality never executes the join row-wise: it is
    Σ_k n_a(k)·n_b(k) over the two key-count rollups — collapsed
    relations joined on the key, so the audit prices a join that
    would produce billions of rows while touching only |keys| rows
    (the q278 principle applied to ground truth).

    Scale: per join, two map-side combining rollups + one equi-join
    on the collapsed key relations + scalar counts; per-key products
    are exact integers, so est (one rounded double) and actual
    (exact BIGINT) agree cross-engine.
    """
    out = None
    for label, lt, lk, rt, rk in _QE_JOINS:
        left = load(spark, sf_dir, lt)
        right = load(spark, sf_dir, rt)
        lstats = left.agg(
            F.count(F.lit(1)).cast("long").alias("n_left"),
            F.countDistinct(lk).cast("long").alias("d_left"),
        )
        rstats = right.agg(
            F.count(F.lit(1)).cast("long").alias("n_right"),
            F.countDistinct(rk).cast("long").alias("d_right"),
        )
        a = left.groupBy(F.col(lk).alias("k")).agg(F.count(F.lit(1)).alias("n"))
        b = right.groupBy(F.col(rk).alias("k")).agg(F.count(F.lit(1)).alias("n"))
        actual = (
            a.join(b.withColumnRenamed("n", "nb"), "k")
            .agg(
                F.coalesce(F.sum(F.col("n") * F.col("nb")), F.lit(0))
                .cast("long")
                .alias("actual_rows")
            )
        )
        est = F.round(
            F.col("n_left").cast("double")
            * F.col("n_right")
            / F.greatest(F.col("d_left"), F.col("d_right"))
        ).cast("long")
        row = (
            lstats.crossJoin(F.broadcast(rstats))
            .crossJoin(F.broadcast(actual))
            .select(
                F.lit(label).alias("join_name"),
                "n_left",
                "n_right",
                est.alias("est_rows"),
                "actual_rows",
                F.round(
                    F.greatest(
                        est.cast("double") / F.col("actual_rows"),
                        F.col("actual_rows") / est.cast("double"),
                    ),
                    4,
                ).alias("q_error"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("join_name")


_SEL_PREDICATES = [
    # (label, lo cents, hi cents) — range predicates on o_totalprice
    ("narrow_100k_110k", 10_000_000, 11_000_000),
    ("mid_50k_150k", 5_000_000, 15_000_000),
    ("tail_above_400k", 40_000_000, 60_000_000),
]
_SEL_BINS = 10


def _sel_oracle() -> str:
    preds = ", ".join(
        f"('{lbl}', CAST({lo} AS BIGINT), CAST({hi} AS BIGINT))"
        for lbl, lo, hi in _SEL_PREDICATES
    )
    return f"""
    WITH cents_t AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders
    ),
    bounds AS (
        SELECT CAST(min(cents) AS BIGINT) AS lo, CAST(max(cents) AS BIGINT) AS hi,
               (CAST(max(cents) AS BIGINT) - min(cents)) / {_SEL_BINS}.0 AS w,
               CAST(count(*) AS BIGINT) AS n_total
        FROM cents_t
    ),
    hist AS (
        SELECT least({_SEL_BINS - 1},
                     CAST(floor((cents - bounds.lo) / bounds.w) AS BIGINT)) AS bin,
               CAST(count(*) AS BIGINT) AS n
        FROM cents_t CROSS JOIN bounds GROUP BY 1
    ),
    preds(label, plo, phi) AS (VALUES {preds}),
    est AS (
        SELECT p.label,
               CAST(sum(CAST(round(1000000 * h.n * greatest(0.0,
                   least(CAST(p.phi AS DOUBLE), b.lo + (h.bin + 1) * b.w)
                   - greatest(CAST(p.plo AS DOUBLE), b.lo + h.bin * b.w))
                   / b.w) AS BIGINT)) AS BIGINT) AS est_micro
        FROM hist h CROSS JOIN bounds b CROSS JOIN preds p
        GROUP BY p.label
    ),
    act AS (
        SELECT p.label,
               CAST(count(CASE WHEN c.cents >= p.plo AND c.cents < p.phi
                          THEN 1 END) AS BIGINT) AS actual_rows
        FROM cents_t c CROSS JOIN preds p GROUP BY p.label
    )
    SELECT est.label AS predicate,
           b.n_total,
           CAST(round(est.est_micro / 1000000.0) AS BIGINT) AS est_rows,
           act.actual_rows,
           round(est.est_micro / 1000000.0 / b.n_total, 6) AS est_fraction,
           round(CAST(act.actual_rows AS DOUBLE) / b.n_total, 6) AS actual_fraction,
           round(greatest((est.est_micro / 1000000.0 + 1.0)
                          / (act.actual_rows + 1.0),
                          (act.actual_rows + 1.0)
                          / (est.est_micro / 1000000.0 + 1.0)), 4) AS q_error
    FROM est JOIN act ON est.label = act.label CROSS JOIN bounds b
    ORDER BY predicate
    """


@register("q329_selectivity_estimation_audit", oracle=_sel_oracle())
def q329_selectivity_estimation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram selectivity-estimation audit — the single-table half
    of the optimizer-statistics loop (q328 audits JOIN estimates):
    build the 10-bucket equi-width histogram every engine keeps as
    column statistics (q131's shape, integer-cent exact), estimate
    each range predicate's row count under the uniform-within-bucket
    assumption (fractional overlap of predicate and bucket), and
    score it against the TRUE count — add-one q-error per predicate.
    MEASURED finding on this corpus: o_totalprice is near-uniform, so
    equi-width estimates every predicate within q-error ≈ 1.2 and the
    tail predicate within 1.001 — the equi-DEPTH sibling (q340)
    matches it here, and the comparative test records that the two
    agree on benign distributions (equi-depth's advantage is density
    ADAPTATION, which only bites under skew this synthetic column
    doesn't have — the honest-measurement convention).

    Per-bucket estimate contributions are quantized to integer
    micro-rows before the cross-bucket sum (the q319 discipline), so
    both engines sum identical integers in any order.

    Scale: one min/max scan, one map-side histogram count, one
    conditional-count scan for ground truth — three scans total,
    none keyed by more than |bins| × |predicates| cells.
    """
    o = load(spark, sf_dir, "orders")
    cents_t = o.select(F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"))
    bounds = cents_t.agg(
        F.min("cents").cast("long").alias("lo"),
        F.max("cents").cast("long").alias("hi"),
        ((F.max("cents") - F.min("cents")) / float(_SEL_BINS)).alias("w"),
        F.count(F.lit(1)).cast("long").alias("n_total"),
    )
    hist = (
        cents_t.crossJoin(F.broadcast(bounds))
        .select(
            F.least(
                F.lit(_SEL_BINS - 1),
                F.floor((F.col("cents") - F.col("lo")) / F.col("w")),
            )
            .cast("long")
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    preds = spark.createDataFrame(
        [(lbl, lo, hi) for lbl, lo, hi in _SEL_PREDICATES],
        "label string, plo long, phi long",
    )
    contrib = F.round(
        F.lit(1e6)
        * F.col("n")
        * F.greatest(
            F.lit(0.0),
            F.least(F.col("phi").cast("double"), F.col("lo") + (F.col("bin") + 1) * F.col("w"))
            - F.greatest(F.col("plo").cast("double"), F.col("lo") + F.col("bin") * F.col("w")),
        )
        / F.col("w"),
        0,
    ).cast("long")
    est = (
        hist.crossJoin(F.broadcast(bounds))
        .crossJoin(F.broadcast(preds))
        .groupBy("label")
        .agg(F.sum(contrib).cast("long").alias("est_micro"))
    )
    act = (
        cents_t.crossJoin(F.broadcast(preds))
        .groupBy("label")
        .agg(
            F.count(
                F.when((F.col("cents") >= F.col("plo")) & (F.col("cents") < F.col("phi")), 1)
            )
            .cast("long")
            .alias("actual_rows")
        )
    )
    est_rows_d = F.col("est_micro") / 1e6
    return (
        est.join(act, "label")
        .crossJoin(F.broadcast(bounds.select("n_total")))
        .select(
            F.col("label").alias("predicate"),
            "n_total",
            F.round(est_rows_d).cast("long").alias("est_rows"),
            "actual_rows",
            F.round(est_rows_d / F.col("n_total"), 6).alias("est_fraction"),
            F.round(F.col("actual_rows").cast("double") / F.col("n_total"), 6).alias(
                "actual_fraction"
            ),
            F.round(
                F.greatest(
                    (est_rows_d + 1.0) / (F.col("actual_rows") + 1.0),
                    (F.col("actual_rows") + 1.0) / (est_rows_d + 1.0),
                ),
                4,
            ).alias("q_error"),
        )
        .orderBy("predicate")
    )


@register(
    "q335_incremental_view_maintenance",
    oracle="""
    WITH base AS (
        SELECT o_orderdate AS d,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE year(o_orderdate) < 1996
    ),
    delta AS (
        SELECT o_orderdate AS d,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE year(o_orderdate) >= 1996
    ),
    view_base AS (
        SELECT d, CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s
        FROM base GROUP BY d
    ),
    view_delta AS (
        SELECT d, CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s
        FROM delta GROUP BY d
    ),
    merged AS (
        SELECT coalesce(b.d, x.d) AS d,
               coalesce(b.n, 0) + coalesce(x.n, 0) AS n,
               coalesce(b.s, 0) + coalesce(x.s, 0) AS s,
               CASE WHEN b.d IS NOT NULL AND x.d IS NOT NULL THEN 1 ELSE 0 END AS upd,
               CASE WHEN b.d IS NULL THEN 1 ELSE 0 END AS new_day
        FROM view_base b FULL OUTER JOIN view_delta x ON b.d = x.d
    ),
    full_v AS (
        SELECT o_orderdate AS d, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s
        FROM orders GROUP BY d
    ),
    cmp AS (
        SELECT CAST(count(*) AS BIGINT) AS n_days_joined,
               CAST(sum(CASE WHEN m.n = f.n THEN 1 ELSE 0 END) AS BIGINT) AS n_count_match,
               CAST(sum(CASE WHEN m.s = f.s THEN 1 ELSE 0 END) AS BIGINT) AS n_sum_match
        FROM merged m JOIN full_v f ON m.d = f.d
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM full_v) AS n_days_full,
           (SELECT CAST(count(*) AS BIGINT) FROM merged) AS n_days_merged,
           (SELECT CAST(sum(new_day) AS BIGINT) FROM merged) AS n_new_days,
           (SELECT CAST(sum(upd) AS BIGINT) FROM merged) AS n_updated_days,
           (SELECT CAST(sum(n) AS BIGINT) FROM view_delta) AS n_delta_rows,
           cmp.n_days_joined = (SELECT count(*) FROM full_v)
               AND cmp.n_days_joined = (SELECT count(*) FROM merged)
               AND cmp.n_count_match = cmp.n_days_joined
               AND cmp.n_sum_match = cmp.n_days_joined AS view_consistent
    FROM cmp
    """,
)
def q335_incremental_view_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of an aggregate view — the
    dbt-incremental / Materialize contract the CDC family stops short
    of (q277 replays ROW diffs; this maintains a ROLLUP without
    re-reading history): the standing per-day (count, revenue) view
    built from pre-1996 orders absorbs the 1996+ batch by MERGING
    per-day partial aggregates (count/sum are mergeable, so the
    update touches |delta days| cells — never the base corpus), and
    the harness proves merged == full recompute on every day, by
    exact integer count and cent checksum. Output: day/row tallies,
    how many view cells the delta created vs updated, and the
    consistency verdict — the audit an incremental pipeline runs
    before cutting over from full recompute.

    Scale: this is THE reason warehouse rollups are built from
    mergeable partials (q22/A4's incremental refresh is this
    operator in production form): the delta agg is one combining
    pass over the NEW batch only, the merge is a FULL OUTER join on
    the bounded day relation. The full recompute exists here only as
    the verification oracle.
    """
    o = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    yr = F.year("o_orderdate")

    def day_view(df):
        return df.groupBy(F.col("o_orderdate").alias("d")).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(cents).cast("long").alias("s"),
        )

    view_base = day_view(o.filter(yr < 1996))
    view_delta = day_view(o.filter(yr >= 1996))
    b = view_base.select(
        F.col("d").alias("db"), F.col("n").alias("nb"), F.col("s").alias("sb")
    )
    x = view_delta.select(
        F.col("d").alias("dx"), F.col("n").alias("nx"), F.col("s").alias("sx")
    )
    merged = b.join(x, b["db"] == x["dx"], "full").select(
        F.coalesce("db", "dx").alias("d"),
        (F.coalesce("nb", F.lit(0)) + F.coalesce("nx", F.lit(0))).alias("n"),
        (F.coalesce("sb", F.lit(0)) + F.coalesce("sx", F.lit(0))).alias("s"),
        F.when(F.col("db").isNotNull() & F.col("dx").isNotNull(), 1)
        .otherwise(0)
        .alias("upd"),
        F.when(F.col("db").isNull(), 1).otherwise(0).alias("new_day"),
    )
    full_v = day_view(o)
    f = full_v.select(
        F.col("d").alias("df_"), F.col("n").alias("nf"), F.col("s").alias("sf")
    )
    cmp = merged.join(f, merged["d"] == f["df_"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_days_joined"),
        F.sum(F.when(F.col("n") == F.col("nf"), 1).otherwise(0))
        .cast("long")
        .alias("n_count_match"),
        F.sum(F.when(F.col("s") == F.col("sf"), 1).otherwise(0))
        .cast("long")
        .alias("n_sum_match"),
    )
    tallies = (
        full_v.agg(F.count(F.lit(1)).cast("long").alias("n_days_full"))
        .crossJoin(
            merged.agg(
                F.count(F.lit(1)).cast("long").alias("n_days_merged"),
                F.sum("new_day").cast("long").alias("n_new_days"),
                F.sum("upd").cast("long").alias("n_updated_days"),
            )
        )
        .crossJoin(
            view_delta.agg(F.sum("n").cast("long").alias("n_delta_rows"))
        )
    )
    return tallies.crossJoin(F.broadcast(cmp)).select(
        "n_days_full",
        "n_days_merged",
        "n_new_days",
        "n_updated_days",
        "n_delta_rows",
        (
            (F.col("n_days_joined") == F.col("n_days_full"))
            & (F.col("n_days_joined") == F.col("n_days_merged"))
            & (F.col("n_count_match") == F.col("n_days_joined"))
            & (F.col("n_sum_match") == F.col("n_days_joined"))
        ).alias("view_consistent"),
    )


@register(
    "q340_equidepth_selectivity_audit",
    oracle=f"""
    WITH cents_t AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders
    ),
    vals AS (
        SELECT cents, CAST(count(*) AS BIGINT) AS cnt
        FROM cents_t GROUP BY cents
    ),
    cum AS (
        SELECT cents, cnt,
               CAST(sum(cnt) OVER (ORDER BY cents) AS BIGINT) AS c
        FROM vals
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM cents_t),
    bucketed AS (
        SELECT least(CAST(floor((c - 1) * {_SEL_BINS} * 1.0 / tot.n_total)
                          AS BIGINT),
                     {_SEL_BINS - 1}) AS bin,
               cents, cnt
        FROM cum CROSS JOIN tot
    ),
    hist AS (
        SELECT bin, CAST(min(cents) AS BIGINT) AS mn,
               CAST(max(cents) AS BIGINT) AS mx,
               CAST(sum(cnt) AS BIGINT) AS n
        FROM bucketed GROUP BY bin
    ),
    preds(label, plo, phi) AS (VALUES {", ".join(f"('{lbl}', CAST({lo} AS BIGINT), CAST({hi} AS BIGINT))" for lbl, lo, hi in _SEL_PREDICATES)}),
    est AS (
        SELECT p.label,
               CAST(sum(CAST(round(1000000 * h.n * greatest(0.0, least(
                   CAST(least(p.phi, h.mx + 1) - greatest(p.plo, h.mn) AS DOUBLE)
                   / (h.mx + 1 - h.mn), 1.0))) AS BIGINT)) AS BIGINT) AS est_micro
        FROM hist h CROSS JOIN preds p
        GROUP BY p.label
    ),
    act AS (
        SELECT p.label,
               CAST(count(CASE WHEN c.cents >= p.plo AND c.cents < p.phi
                          THEN 1 END) AS BIGINT) AS actual_rows
        FROM cents_t c CROSS JOIN preds p GROUP BY p.label
    )
    SELECT est.label AS predicate,
           tot.n_total,
           CAST(round(est.est_micro / 1000000.0) AS BIGINT) AS est_rows,
           act.actual_rows,
           round(est.est_micro / 1000000.0 / tot.n_total, 6) AS est_fraction,
           round(CAST(act.actual_rows AS DOUBLE) / tot.n_total, 6)
               AS actual_fraction,
           round(greatest((est.est_micro / 1000000.0 + 1.0)
                          / (act.actual_rows + 1.0),
                          (act.actual_rows + 1.0)
                          / (est.est_micro / 1000000.0 + 1.0)), 4) AS q_error
    FROM est JOIN act ON est.label = act.label CROSS JOIN tot
    ORDER BY predicate
    """,
)
def q340_equidepth_selectivity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQUI-DEPTH histogram selectivity estimation on q329's exact
    predicates — the comparative closure of the optimizer-statistics
    pair (q329 measures equi-WIDTH and its documented tail failure;
    this measures the density-ADAPTIVE alternative every real
    optimizer ships): buckets hold ~n/10 rows each by construction
    (bin = rank-decile of the exact cumulative count), so skewed
    regions get narrow buckets. MEASURED on this corpus: totalprice
    is near-uniform, so equi-depth matches equi-width within rounding
    on every predicate (both ≤ 1.21 q-error) — the comparative test
    pins the agreement, and the pair together documents WHEN each
    histogram family earns its cost (adaptation pays under skew,
    which q231's Hill tail index diagnoses). Same uniform-within-bucket interpolation,
    same micro-row per-bucket quantization, same output schema, so
    the two audits read as one table.

    Scale: the exact cumulative count over the value rollup is the
    operators/ranking size-aware dispatch's HONEST corpus-sized user
    (price ndv ≈ rows·0.99 — the rollup does NOT collapse, so above
    the crossover the two-pass runs with every WindowExec
    partitioned; the oracle uses a plain window). Bucket stats are
    10 rows; estimates are arithmetic on 10 × |predicates| cells.
    """
    from g_etl_spark.operators.ranking import (
        TWOPASS_CROSSOVER_ROWS,
        global_cumsum_twopass,
        log2_bucket,
    )

    o = load(spark, sf_dir, "orders")
    cents_t = o.select(F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"))
    vals = cents_t.groupBy("cents").agg(F.count(F.lit(1)).alias("cnt"))
    cum = global_cumsum_twopass(
        vals,
        "cnt",
        ["cents"],
        log2_bucket(F.col("cents")),
        out="c",
        inclusive=True,
        threshold_rows=TWOPASS_CROSSOVER_ROWS,
    )
    tot = cents_t.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    bucketed = cum.crossJoin(F.broadcast(tot)).select(
        F.least(
            F.floor((F.col("c") - 1) * _SEL_BINS * 1.0 / F.col("n_total")).cast(
                "long"
            ),
            F.lit(_SEL_BINS - 1),
        ).alias("bin"),
        "cents",
        "cnt",
    )
    hist = bucketed.groupBy("bin").agg(
        F.min("cents").cast("long").alias("mn"),
        F.max("cents").cast("long").alias("mx"),
        F.sum("cnt").cast("long").alias("n"),
    )
    preds = spark.createDataFrame(
        [(lbl, lo, hi) for lbl, lo, hi in _SEL_PREDICATES],
        "label string, plo long, phi long",
    )
    frac = F.least(
        F.greatest(
            (
                F.least(F.col("phi"), F.col("mx") + 1)
                - F.greatest(F.col("plo"), F.col("mn"))
            ).cast("double")
            / (F.col("mx") + 1 - F.col("mn")),
            F.lit(0.0),
        ),
        F.lit(1.0),
    )
    contrib = F.round(F.lit(1e6) * F.col("n") * frac, 0).cast("long")
    est = (
        hist.crossJoin(F.broadcast(preds))
        .groupBy("label")
        .agg(F.sum(contrib).cast("long").alias("est_micro"))
    )
    act = (
        cents_t.crossJoin(F.broadcast(preds))
        .groupBy("label")
        .agg(
            F.count(
                F.when((F.col("cents") >= F.col("plo")) & (F.col("cents") < F.col("phi")), 1)
            )
            .cast("long")
            .alias("actual_rows")
        )
    )
    est_rows_d = F.col("est_micro") / 1e6
    return (
        est.join(act, "label")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("label").alias("predicate"),
            "n_total",
            F.round(est_rows_d).cast("long").alias("est_rows"),
            "actual_rows",
            F.round(est_rows_d / F.col("n_total"), 6).alias("est_fraction"),
            F.round(F.col("actual_rows").cast("double") / F.col("n_total"), 6).alias(
                "actual_fraction"
            ),
            F.round(
                F.greatest(
                    (est_rows_d + 1.0) / (F.col("actual_rows") + 1.0),
                    (F.col("actual_rows") + 1.0) / (est_rows_d + 1.0),
                ),
                4,
            ).alias("q_error"),
        )
        .orderBy("predicate")
    )


@register(
    "q349_kruskal_wallis",
    oracle="""
    WITH base AS (
        SELECT c.c_mktsegment AS seg,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS y
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    vals AS (SELECT y, CAST(count(*) AS BIGINT) AS cnt FROM base GROUP BY y),
    pri AS (
        SELECT y, cnt,
               coalesce(sum(cnt) OVER (ORDER BY y
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS prior
        FROM vals
    ),
    r2 AS (SELECT y, CAST(2 * prior + cnt + 1 AS BIGINT) AS r2 FROM pri),
    g AS (
        SELECT b.seg,
               CAST(count(*) AS BIGINT) AS n_g,
               CAST(sum(r.r2) AS BIGINT) AS s2r
        FROM base b JOIN r2 r ON b.y = r.y
        GROUP BY b.seg
    ),
    gq AS (
        SELECT CAST(sum(n_g) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS k,
               CAST(sum(CAST(round((s2r / 2.0) * (s2r / 2.0) / n_g)
                        AS BIGINT)) AS BIGINT) AS rterm
        FROM g
    ),
    tie AS (
        SELECT CAST(coalesce(sum(cnt * cnt * cnt - cnt), 0) AS BIGINT) AS tt
        FROM vals WHERE cnt > 1
    )
    SELECT gq.n AS n_total, gq.k AS k_groups, gq.k - 1 AS df,
           round(12.0 / (gq.n * (gq.n + 1.0)) * gq.rterm
                 - 3.0 * (gq.n + 1), 4) AS h,
           round((12.0 / (gq.n * (gq.n + 1.0)) * gq.rterm
                  - 3.0 * (gq.n + 1))
                 / (1.0 - tie.tt
                    / (CAST(gq.n AS DOUBLE) * gq.n * gq.n - gq.n)), 4)
               AS h_tie_corrected
    FROM gq CROSS JOIN tie
    """,
)
def q349_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test: does order value DIFFER across the five
    market segments, rank-based — the k-group generalization of the
    rank tests the suite already carries (q177's two-group rank-sum
    AUC, q315's Spearman): H = 12/(N(N+1)) Σ n_g·R̄_g² − 3(N+1) with
    the standard tie divisor 1 − Σ(t³−t)/(N³−N). Midranks use the
    q315 collapsed-value prefix-sum trick (2·midrank = 2·prior + cnt
    + 1 — exact integers), per-group rank sums are exact integer
    sums, and the 5-term Σ n_g·R̄_g² is quantized per-term to whole
    units before summation (bigint), so both engines derive H from
    identical integers.

    Scale: one value rollup (map-side combining) whose prefix sum
    runs the operators/ranking size-aware dispatch (plain window
    below the measured ~500k crossover, partitioned two-pass above
    — q315's exact shape), one equi-join back to rows, one combining
    agg to |segments| cells. No corpus sort, no pair join.
    """
    from g_etl_spark.operators.ranking import (
        TWOPASS_CROSSOVER_ROWS,
        global_cumsum_twopass,
        log2_bucket,
    )

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    base = o.join(
        c.select("c_custkey", "c_mktsegment"),  # unhinted: customer-grain dim
        o["o_custkey"] == c["c_custkey"],
    ).select(
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("y"),
    )
    vals = base.groupBy("y").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    pri = global_cumsum_twopass(
        vals,
        "cnt",
        ["y"],
        log2_bucket(F.col("y")),
        out="prior",
        inclusive=False,
        threshold_rows=TWOPASS_CROSSOVER_ROWS,
    )
    r2 = pri.select("y", (2 * F.col("prior") + F.col("cnt") + 1).cast("long").alias("r2"))
    g = (
        base.join(r2, "y")
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_g"),
            F.sum("r2").cast("long").alias("s2r"),
        )
    )
    gq = g.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(
            F.round((F.col("s2r") / 2.0) * (F.col("s2r") / 2.0) / F.col("n_g"), 0)
            .cast("long")
        )
        .cast("long")
        .alias("rterm"),
    )
    tie = vals.filter(F.col("cnt") > 1).agg(
        F.coalesce(
            F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")),
            F.lit(0),
        )
        .cast("long")
        .alias("tt")
    )
    h_raw = (
        12.0 / (F.col("n") * (F.col("n") + 1.0)) * F.col("rterm")
        - 3.0 * (F.col("n") + 1)
    )
    c_div = 1.0 - F.col("tt") / (
        F.col("n").cast("double") * F.col("n") * F.col("n") - F.col("n")
    )
    return gq.crossJoin(F.broadcast(tie)).select(
        F.col("n").alias("n_total"),
        F.col("k").alias("k_groups"),
        (F.col("k") - 1).alias("df"),
        F.round(h_raw, 4).alias("h"),
        F.round(h_raw / c_div, 4).alias("h_tie_corrected"),
    )


@register(
    "q357_incremental_join_view",
    oracle="""
    WITH a1 AS (SELECT * FROM orders   WHERE o_orderkey % 10 < 8),
    da AS (SELECT * FROM orders   WHERE o_orderkey % 10 >= 8),
    b1 AS (SELECT * FROM customer WHERE c_custkey % 7 != 0),
    db AS (SELECT * FROM customer WHERE c_custkey % 7 = 0),
    agg AS (
        SELECT seg, CAST(sum(n) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS cents
        FROM (
            SELECT c.c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS cents
            FROM a1 o JOIN b1 c ON o.o_custkey = c.c_custkey GROUP BY 1
            UNION ALL
            SELECT c.c_mktsegment, count(*),
                   CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                        AS BIGINT)
            FROM da o JOIN b1 c ON o.o_custkey = c.c_custkey GROUP BY 1
            UNION ALL
            SELECT c.c_mktsegment, count(*),
                   CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                        AS BIGINT)
            FROM a1 o JOIN db c ON o.o_custkey = c.c_custkey GROUP BY 1
            UNION ALL
            SELECT c.c_mktsegment, count(*),
                   CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                        AS BIGINT)
            FROM da o JOIN db c ON o.o_custkey = c.c_custkey GROUP BY 1
        ) GROUP BY seg
    ),
    full_v AS (
        SELECT c.c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1
    )
    SELECT a.seg AS segment, a.n AS n_orders_merged,
           a.cents AS revenue_cents_merged,
           f.n AS n_orders_recomputed,
           f.cents AS revenue_cents_recomputed,
           (a.n = f.n AND a.cents = f.cents) AS consistent
    FROM agg a JOIN full_v f ON a.seg = f.seg
    ORDER BY segment
    """,
)
def q357_incremental_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view by the delta rule —
    the join sibling of q335's aggregate IVM (together they cover the
    materialized-view algebra: Δ(A⋈B) = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB, then
    merge the delta aggregates into the stored view by combining
    sums). Orders and customers are each split into a day-1 snapshot
    and a CDC delta (so BOTH one-sided terms and the delta×delta
    corner are non-empty — including delta orders referencing delta
    customers, the dangling-then-resolved case naive one-sided
    maintenance loses). The merged view is VERIFIED equal to the
    full recompute per segment — verified, not asserted: both paths
    land in the output with a `consistent` verdict column, exact
    integer cents.

    Scale: the whole point — the incremental path touches
    |ΔA|·|B| + |A|·|ΔB| + |ΔA|·|ΔB| join work instead of |A|·|B|;
    at 100 TB with daily deltas that is the difference between a
    view refresh and a full re-shuffle of the fact table. All four
    terms are equi-joins; the merge is one combining agg on
    |segments| cells.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    a1 = o.filter(F.col("o_orderkey") % 10 < 8)
    da = o.filter(F.col("o_orderkey") % 10 >= 8)
    b1 = c.filter(F.col("c_custkey") % 7 != 0)
    db = c.filter(F.col("c_custkey") % 7 == 0)

    def term(orders_df, cust_df):
        return (
            orders_df.join(
                cust_df.select("c_custkey", "c_mktsegment"),
                orders_df["o_custkey"] == cust_df["c_custkey"],
            )
            .groupBy(F.col("c_mktsegment").alias("seg"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
                .cast("long")
                .alias("cents"),
            )
        )

    merged = (
        term(a1, b1)
        .unionAll(term(da, b1))
        .unionAll(term(a1, db))
        .unionAll(term(da, db))
        .groupBy("seg")
        .agg(
            F.sum("n").cast("long").alias("n_m"),
            F.sum("cents").cast("long").alias("c_m"),
        )
    )
    full_v = term(o, c).select(
        F.col("seg").alias("seg_f"),
        F.col("n").alias("n_f"),
        F.col("cents").alias("c_f"),
    )
    return (
        merged.join(full_v, merged["seg"] == full_v["seg_f"])
        .select(
            F.col("seg").alias("segment"),
            F.col("n_m").alias("n_orders_merged"),
            F.col("c_m").alias("revenue_cents_merged"),
            F.col("n_f").alias("n_orders_recomputed"),
            F.col("c_f").alias("revenue_cents_recomputed"),
            (
                (F.col("n_m") == F.col("n_f")) & (F.col("c_m") == F.col("c_f"))
            ).alias("consistent"),
        )
        .orderBy("segment")
    )


# ---- q369: Selinger DP over the 4-relation join lattice ----------------
# Relations bit-coded region=1, nation=2, customer=4, orders=8; the join
# graph is the chain region–nation–customer–orders. Estimate and DP
# expressions are generated ONCE here and fed verbatim to BOTH engines
# (F.expr and DuckDB parse the identical text), so every double is
# produced by the same operation order before integer rounding.
_SEL_RELS = ((1, "region", "n_r"), (2, "nation", "n_n"),
             (4, "customer", "n_c"), (8, "orders", "n_o"))
_SEL_EDGES = ((3, "greatest(d_rr, d_nr)"), (6, "greatest(d_nn, d_cn)"),
              (12, "greatest(d_cc, d_oc)"))
_SEL_PAIRS = (3, 5, 6, 9, 10, 12)
_SEL_TRIPLES = (7, 11, 13, 14)
_SEL_BUSHY = ((3, 12), (5, 10), (6, 9))


def _sel_est_sql(mask: int) -> str:
    """System-R size estimate for a subset: Π cards / Π max-NDV over
    join edges INSIDE the subset (disconnected subsets keep the full
    cross product — no edge divides them)."""
    e = " * ".join(c for bit, _, c in _SEL_RELS if mask & bit)
    for em, g in _SEL_EDGES:
        if mask & em == em:
            e = f"({e}) / {g}"
    return e


def _sel_label(mask: int) -> str:
    return "+".join(name for bit, name, _ in _SEL_RELS if mask & bit)


def _sel_triple_cost_sql(mask: int) -> str:
    pairs = [p for p in _SEL_PAIRS if mask & p == p]
    return f"e{mask} + least(" + ", ".join(f"e{p}" for p in pairs) + ")"


_SEL_C15_SQL = (
    "e15 + least(c7, c11, c13, c14, "
    + ", ".join(f"e{p} + e{q}" for p, q in _SEL_BUSHY)
    + ")"
)
_SEL_EXHAUSTIVE_SQL = "least(" + ", ".join(
    [f"e{p} + e{t} + e15" for p in _SEL_PAIRS for t in _SEL_TRIPLES
     if t & p == p]
    + [f"e{p} + e{q} + e15" for p, q in _SEL_BUSHY]
) + ")"


def _q369_oracle() -> str:
    ests = ", ".join(
        f"CAST(round({_sel_est_sql(m)}) AS BIGINT) AS e{m}"
        for m in (*_SEL_PAIRS, *_SEL_TRIPLES, 15)
    )
    trips = ", ".join(
        f"{_sel_triple_cost_sql(m)} AS c{m}" for m in _SEL_TRIPLES
    )
    rows = []
    for m in _SEL_PAIRS:
        rows.append(f"SELECT '{_sel_label(m)}' AS subset, 2 AS n_rels,"
                    f" e{m} AS est_rows, e{m} AS dp_cost,"
                    " c15, ex FROM dp")
    for m in _SEL_TRIPLES:
        rows.append(f"SELECT '{_sel_label(m)}', 3, e{m}, c{m}, c15, ex FROM dp")
    rows.append(f"SELECT '{_sel_label(15)}', 4, e15, c15, c15, ex FROM dp")
    body = " UNION ALL ".join(rows)
    return f"""
    WITH stats AS (
        SELECT (SELECT CAST(count(*) AS DOUBLE) FROM region) AS n_r,
               (SELECT CAST(count(DISTINCT r_regionkey) AS DOUBLE) FROM region) AS d_rr,
               (SELECT CAST(count(*) AS DOUBLE) FROM nation) AS n_n,
               (SELECT CAST(count(DISTINCT n_regionkey) AS DOUBLE) FROM nation) AS d_nr,
               (SELECT CAST(count(DISTINCT n_nationkey) AS DOUBLE) FROM nation) AS d_nn,
               (SELECT CAST(count(*) AS DOUBLE) FROM customer) AS n_c,
               (SELECT CAST(count(DISTINCT c_nationkey) AS DOUBLE) FROM customer) AS d_cn,
               (SELECT CAST(count(DISTINCT c_custkey) AS DOUBLE) FROM customer) AS d_cc,
               (SELECT CAST(count(*) AS DOUBLE) FROM orders) AS n_o,
               (SELECT CAST(count(DISTINCT o_custkey) AS DOUBLE) FROM orders) AS d_oc
    ),
    est AS (SELECT {ests} FROM stats),
    dp1 AS (SELECT *, {trips} FROM est),
    dp AS (SELECT *, {_SEL_C15_SQL} AS c15, {_SEL_EXHAUSTIVE_SQL} AS ex
           FROM dp1)
    SELECT subset, CAST(n_rels AS BIGINT) AS n_rels, est_rows, dp_cost,
           c15 AS dp_optimum, ex AS exhaustive_optimum,
           c15 = ex AS dp_matches_exhaustive
    FROM ({body})
    ORDER BY n_rels, subset
    """


@register("q369_selinger_join_order", oracle=_q369_oracle())
def q369_selinger_join_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selinger dynamic-programming join ordering over the FULL
    4-relation subset lattice (region⋈nation⋈customer⋈orders chain) —
    the lattice-complete sibling of q322's three hand-picked orders
    (r10 verdict #5): every subset's System-R size estimate
    (Π cards / Π max-NDV over internal edges; disconnected subsets
    price as cross products), then the textbook recurrence
    cost(S) = est(S) + min over splits [cost(S₁) + cost(S₂)]
    including the bushy 2+2 splits, audited by an INDEPENDENT
    exhaustive enumeration of all 12 distinct left-deep prefixes plus
    the 3 bushy partitions — dp_matches_exhaustive is the contract
    column (for 4 leaves every binary plan is left-deep or 2+2, so
    equality is an identity the query VERIFIES rather than asserts).
    All costs are integer cents of the same rounded estimates
    (additions of pre-rounded BIGINTs — associativity-safe, so the
    DP's (a+b)+c and the enumerator's c+(b+a) cannot drift an ulp
    apart, and both engines agree bit-for-bit).

    Scale: ten scalar statistics (exact NDVs here; q296's HLL NDVs at
    100 TB), then pure arithmetic on a single row — the 2⁴ lattice is
    16 expressions, not 16 scans. This is the optimizer-diagnostic
    shape: run it BEFORE submitting a 4-way join to see whether
    Catalyst's CBO order (q322's inspection) matches the DP optimum.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    stats = (
        r.agg(
            F.count(F.lit(1)).cast("double").alias("n_r"),
            F.countDistinct("r_regionkey").cast("double").alias("d_rr"),
        )
        .crossJoin(
            F.broadcast(
                n.agg(
                    F.count(F.lit(1)).cast("double").alias("n_n"),
                    F.countDistinct("n_regionkey").cast("double").alias("d_nr"),
                    F.countDistinct("n_nationkey").cast("double").alias("d_nn"),
                )
            )
        )
        .crossJoin(
            F.broadcast(
                c.agg(
                    F.count(F.lit(1)).cast("double").alias("n_c"),
                    F.countDistinct("c_nationkey").cast("double").alias("d_cn"),
                    F.countDistinct("c_custkey").cast("double").alias("d_cc"),
                )
            )
        )
        .crossJoin(
            F.broadcast(
                o.agg(
                    F.count(F.lit(1)).cast("double").alias("n_o"),
                    F.countDistinct("o_custkey").cast("double").alias("d_oc"),
                )
            )
        )
    )
    est = stats.selectExpr(
        *[
            f"CAST(round({_sel_est_sql(m)}) AS BIGINT) AS e{m}"
            for m in (*_SEL_PAIRS, *_SEL_TRIPLES, 15)
        ]
    )
    dp1 = est.selectExpr(
        "*", *[f"{_sel_triple_cost_sql(m)} AS c{m}" for m in _SEL_TRIPLES]
    )
    dp = dp1.selectExpr(
        "*",
        f"{_SEL_C15_SQL} AS c15",
        f"{_SEL_EXHAUSTIVE_SQL} AS ex",
    )

    def _row(m: int, nrels: int, cost_sql: str):
        return F.struct(
            F.lit(_sel_label(m)).alias("subset"),
            F.lit(nrels).cast("long").alias("n_rels"),
            F.col(f"e{m}").alias("est_rows"),
            F.expr(cost_sql).alias("dp_cost"),
        )

    rows = (
        [_row(m, 2, f"e{m}") for m in _SEL_PAIRS]
        + [_row(m, 3, f"c{m}") for m in _SEL_TRIPLES]
        + [_row(15, 4, "c15")]
    )
    return (
        dp.select(F.explode(F.array(*rows)).alias("s"), "c15", "ex")
        .select(
            "s.subset",
            "s.n_rels",
            "s.est_rows",
            "s.dp_cost",
            F.col("c15").alias("dp_optimum"),
            F.col("ex").alias("exhaustive_optimum"),
            (F.col("c15") == F.col("ex")).alias("dp_matches_exhaustive"),
        )
        .orderBy("n_rels", "subset")
    )


# ---- q423: cardinality-feedback re-cost (q328 ∘ q369) -----------------
# The adaptive-optimizer loop: measure each chain edge's TRUE join
# cardinality with q328's collapsed-rollup device, convert it to a
# corrected per-edge selectivity a_e/(n_l·n_r), and re-run q369's
# Selinger DP on the corrected estimates. Expressions are generated
# once and fed verbatim to both engines (q369's discipline).
_SEL_EDGE_ACTUALS = (
    (3, "a3", "n_r", "n_n"),     # region ⋈ nation
    (6, "a6", "n_n", "n_c"),     # nation ⋈ customer
    (12, "a12", "n_c", "n_o"),   # customer ⋈ orders
)


def _sel_corr_est_sql(mask: int) -> str:
    """Re-costed subset estimate: Π cards × Π_{edges inside}
    a_e/(n_l·n_r). Substituting the measured actual a_e for the
    System-R guess n_l·n_r/maxNDV is exactly replacing the estimated
    edge selectivity 1/maxNDV with the TRUE one a_e/(n_l·n_r) — the
    independence assumption stays, the NDV guess goes."""
    e = " * ".join(c for bit, _, c in _SEL_RELS if mask & bit)
    for em, a, nl, nr in _SEL_EDGE_ACTUALS:
        if mask & em == em:
            e = f"({e}) * ({a} / ({nl} * {nr}))"
    return e


def _sel_triple_cost_sfx(mask: int, sfx: str) -> str:
    pairs = [p for p in _SEL_PAIRS if mask & p == p]
    return (
        f"e{mask}{sfx} + least("
        + ", ".join(f"e{p}{sfx}" for p in pairs)
        + ")"
    )


def _sel_c15_sfx(sfx: str) -> str:
    return (
        f"e15{sfx} + least("
        + ", ".join(f"c{t}{sfx}" for t in _SEL_TRIPLES)
        + ", "
        + ", ".join(f"e{p}{sfx} + e{q}{sfx}" for p, q in _SEL_BUSHY)
        + ")"
    )


def _sel_exhaustive_sfx(sfx: str) -> str:
    return "least(" + ", ".join(
        [f"e{p}{sfx} + e{t}{sfx} + e15{sfx}"
         for p in _SEL_PAIRS for t in _SEL_TRIPLES if t & p == p]
        + [f"e{p}{sfx} + e{q}{sfx} + e15{sfx}" for p, q in _SEL_BUSHY]
    ) + ")"


_Q423_ACTUAL_SQL = {
    "a3": ("region", "r_regionkey", "nation", "n_regionkey"),
    "a6": ("nation", "n_nationkey", "customer", "c_nationkey"),
    "a12": ("customer", "c_custkey", "orders", "o_custkey"),
}


def _q423_oracle() -> str:
    actuals = ", ".join(
        f"""(SELECT CAST(coalesce(sum(a.n * b.n), 0) AS DOUBLE)
            FROM (SELECT {lk} AS k, count(*) AS n FROM {lt} GROUP BY 1) a
            JOIN (SELECT {rk} AS k, count(*) AS n FROM {rt} GROUP BY 1) b
              ON a.k = b.k) AS {name}"""
        for name, (lt, lk, rt, rk) in _Q423_ACTUAL_SQL.items()
    )
    ests = ", ".join(
        f"CAST(round({_sel_est_sql(m)}) AS BIGINT) AS e{m}, "
        f"CAST(round({_sel_corr_est_sql(m)}) AS BIGINT) AS e{m}k"
        for m in (*_SEL_PAIRS, *_SEL_TRIPLES, 15)
    )
    trips = ", ".join(
        f"{_sel_triple_cost_sql(m)} AS c{m}, "
        f"{_sel_triple_cost_sfx(m, 'k')} AS c{m}k"
        for m in _SEL_TRIPLES
    )
    rows = []
    for m in _SEL_PAIRS:
        rows.append(
            f"SELECT '{_sel_label(m)}' AS subset, 2 AS n_rels,"
            f" e{m} AS est_rows, e{m}k AS est_rows_corrected,"
            f" e{m} AS dp_cost, e{m}k AS dp_cost_corrected,"
            " c15k, exk FROM dp"
        )
    for m in _SEL_TRIPLES:
        rows.append(
            f"SELECT '{_sel_label(m)}', 3, e{m}, e{m}k, c{m}, c{m}k,"
            " c15k, exk FROM dp"
        )
    rows.append(
        f"SELECT '{_sel_label(15)}', 4, e15, e15k, c15, c15k, c15k, exk"
        " FROM dp"
    )
    body = " UNION ALL ".join(rows)
    return f"""
    WITH stats AS (
        SELECT (SELECT CAST(count(*) AS DOUBLE) FROM region) AS n_r,
               (SELECT CAST(count(DISTINCT r_regionkey) AS DOUBLE) FROM region) AS d_rr,
               (SELECT CAST(count(*) AS DOUBLE) FROM nation) AS n_n,
               (SELECT CAST(count(DISTINCT n_regionkey) AS DOUBLE) FROM nation) AS d_nr,
               (SELECT CAST(count(DISTINCT n_nationkey) AS DOUBLE) FROM nation) AS d_nn,
               (SELECT CAST(count(*) AS DOUBLE) FROM customer) AS n_c,
               (SELECT CAST(count(DISTINCT c_nationkey) AS DOUBLE) FROM customer) AS d_cn,
               (SELECT CAST(count(DISTINCT c_custkey) AS DOUBLE) FROM customer) AS d_cc,
               (SELECT CAST(count(*) AS DOUBLE) FROM orders) AS n_o,
               (SELECT CAST(count(DISTINCT o_custkey) AS DOUBLE) FROM orders) AS d_oc,
               {actuals}
    ),
    est AS (SELECT {ests} FROM stats),
    dp1 AS (SELECT *, {trips} FROM est),
    dp AS (SELECT *, {_SEL_C15_SQL} AS c15, {_sel_c15_sfx("k")} AS c15k,
           {_sel_exhaustive_sfx("k")} AS exk FROM dp1)
    SELECT subset, CAST(n_rels AS BIGINT) AS n_rels,
           est_rows, est_rows_corrected, dp_cost, dp_cost_corrected,
           CAST(rank() OVER (PARTITION BY n_rels
                             ORDER BY dp_cost, subset) AS BIGINT)
               AS rank_orig,
           CAST(rank() OVER (PARTITION BY n_rels
                             ORDER BY dp_cost_corrected, subset) AS BIGINT)
               AS rank_corrected,
           rank() OVER (PARTITION BY n_rels ORDER BY dp_cost, subset)
               <> rank() OVER (PARTITION BY n_rels
                               ORDER BY dp_cost_corrected, subset)
               AS rank_changed,
           c15k AS dp_optimum_corrected,
           exk AS exhaustive_optimum_corrected,
           c15k = exk AS dp_matches_exhaustive
    FROM ({body})
    ORDER BY n_rels, subset
    """


@register("q423_cardinality_feedback_recost", oracle=_q423_oracle())
def q423_cardinality_feedback_recost(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CARDINALITY-FEEDBACK re-costing — the run → observe → re-plan
    loop that completes the engine-diagnostic family (r11 verdict
    item #4): q322/q369 cost plans from System-R NDV estimates, q328
    measures how wrong those estimates are; this query CLOSES the
    loop by measuring each chain edge's TRUE cardinality with q328's
    collapsed-rollup device (Σ_k n_l(k)·n_r(k) — never the row-wise
    join) and re-running q369's full-lattice Selinger DP with the
    corrected per-edge selectivity a_e/(n_l·n_r) in place of the
    1/maxNDV guess. Output per subset: original vs corrected
    estimate and DP cost, the within-level cost RANKINGS before and
    after feedback (rank_changed is the 'would the optimizer pick a
    different order now' bit), and the corrected DP re-audited
    against an independent exhaustive enumeration
    (dp_matches_exhaustive). Cost/estimate expressions are generated
    once and fed verbatim to both engines (q369's discipline), all
    costs integer-rounded before the DP sums, so both engines agree
    bit-for-bit.

    Scale: three collapsed-key equi-joins (|keys| rows each — the
    feedback observations a real system reads from runtime metrics
    for free) + ten scalar statistics, then pure single-row
    arithmetic; the 2⁴ lattice is expressions, not scans.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    tables = {"region": r, "nation": n, "customer": c, "orders": o}

    def actual(name: str) -> DataFrame:
        lt, lk, rt, rk = _Q423_ACTUAL_SQL[name]
        a = tables[lt].groupBy(F.col(lk).alias("k")).agg(
            F.count(F.lit(1)).alias("n")
        )
        b = tables[rt].groupBy(F.col(rk).alias("k")).agg(
            F.count(F.lit(1)).alias("nb")
        )
        return a.join(b, "k").agg(
            F.coalesce(F.sum(F.col("n") * F.col("nb")), F.lit(0))
            .cast("double")
            .alias(name)
        )

    stats = (
        r.agg(
            F.count(F.lit(1)).cast("double").alias("n_r"),
            F.countDistinct("r_regionkey").cast("double").alias("d_rr"),
        )
        .crossJoin(
            F.broadcast(
                n.agg(
                    F.count(F.lit(1)).cast("double").alias("n_n"),
                    F.countDistinct("n_regionkey").cast("double").alias("d_nr"),
                    F.countDistinct("n_nationkey").cast("double").alias("d_nn"),
                )
            )
        )
        .crossJoin(
            F.broadcast(
                c.agg(
                    F.count(F.lit(1)).cast("double").alias("n_c"),
                    F.countDistinct("c_nationkey").cast("double").alias("d_cn"),
                    F.countDistinct("c_custkey").cast("double").alias("d_cc"),
                )
            )
        )
        .crossJoin(
            F.broadcast(
                o.agg(
                    F.count(F.lit(1)).cast("double").alias("n_o"),
                    F.countDistinct("o_custkey").cast("double").alias("d_oc"),
                )
            )
        )
        .crossJoin(F.broadcast(actual("a3")))
        .crossJoin(F.broadcast(actual("a6")))
        .crossJoin(F.broadcast(actual("a12")))
    )
    est = stats.selectExpr(
        *[
            f"CAST(round({_sel_est_sql(m)}) AS BIGINT) AS e{m}"
            for m in (*_SEL_PAIRS, *_SEL_TRIPLES, 15)
        ],
        *[
            f"CAST(round({_sel_corr_est_sql(m)}) AS BIGINT) AS e{m}k"
            for m in (*_SEL_PAIRS, *_SEL_TRIPLES, 15)
        ],
    )
    dp1 = est.selectExpr(
        "*",
        *[f"{_sel_triple_cost_sql(m)} AS c{m}" for m in _SEL_TRIPLES],
        *[f"{_sel_triple_cost_sfx(m, 'k')} AS c{m}k" for m in _SEL_TRIPLES],
    )
    dp = dp1.selectExpr(
        "*",
        f"{_SEL_C15_SQL} AS c15",
        f"{_sel_c15_sfx('k')} AS c15k",
        f"{_sel_exhaustive_sfx('k')} AS exk",
    )

    def _row(m: int, nrels: int, cost: str, costk: str):
        return F.struct(
            F.lit(_sel_label(m)).alias("subset"),
            F.lit(nrels).cast("long").alias("n_rels"),
            F.col(f"e{m}").alias("est_rows"),
            F.col(f"e{m}k").alias("est_rows_corrected"),
            F.expr(cost).alias("dp_cost"),
            F.expr(costk).alias("dp_cost_corrected"),
        )

    rows = (
        [_row(m, 2, f"e{m}", f"e{m}k") for m in _SEL_PAIRS]
        + [_row(m, 3, f"c{m}", f"c{m}k") for m in _SEL_TRIPLES]
        + [_row(15, 4, "c15", "c15k")]
    )
    w_orig = Window.partitionBy("n_rels").orderBy("dp_cost", "subset")
    w_corr = Window.partitionBy("n_rels").orderBy(
        "dp_cost_corrected", "subset"
    )
    return (
        dp.select(F.explode(F.array(*rows)).alias("s"), "c15k", "exk")
        .select("s.*", "c15k", "exk")
        .select(
            "subset",
            "n_rels",
            "est_rows",
            "est_rows_corrected",
            "dp_cost",
            "dp_cost_corrected",
            F.rank().over(w_orig).cast("long").alias("rank_orig"),
            F.rank().over(w_corr).cast("long").alias("rank_corrected"),
            (F.rank().over(w_orig) != F.rank().over(w_corr)).alias(
                "rank_changed"
            ),
            F.col("c15k").alias("dp_optimum_corrected"),
            F.col("exk").alias("exhaustive_optimum_corrected"),
            (F.col("c15k") == F.col("exk")).alias("dp_matches_exhaustive"),
        )
        .orderBy("n_rels", "subset")
    )


_Q377_KEYS = (
    ("event_type", "event_type"),
    ("day", "CAST(ts AS DATE)"),
    ("user_id", "user_id"),
    ("user_id,day", "user_id || '|' || CAST(CAST(ts AS DATE) AS VARCHAR)"),
    ("event_id", "event_id"),
)


def _events_key_cardinalities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared scaffold for the aggregation-pricing advisors (q377,
    q378): one events scan → (group_key, n_rows, ndv) rows for the
    five candidate group-by keys in `_Q377_KEYS`. All five exact
    COUNT(DISTINCT)s ride one aggregate; the 1-row NDV frame fans
    out against the scalar row count (both broadcast-bounded), then
    explodes to a 5-row literal lattice — no corpus-grain exchange
    beyond the distinct aggregation itself.
    """
    e = load(spark, sf_dir, "events")
    n_rows = e.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    key_cols = {
        "event_type": F.col("event_type"),
        "day": F.col("ts").cast("date"),
        "user_id": F.col("user_id"),
        "user_id,day": F.concat_ws(
            "|", F.col("user_id").cast("string"),
            F.col("ts").cast("date").cast("string"),
        ),
        "event_id": F.col("event_id"),
    }
    ndvs = e.agg(
        *[
            F.countDistinct(c).cast("long").alias(f"ndv_{i}")
            for i, (_, c) in enumerate(sorted(key_cols.items()))
        ]
    )
    names = [name for name, _ in sorted(key_cols.items())]
    return n_rows.crossJoin(F.broadcast(ndvs)).select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(name).alias("group_key"),
                    F.col("n_rows").alias("n_rows"),
                    F.col(f"ndv_{i}").alias("ndv"),
                )
                for i, name in enumerate(names)
            ])
        ).alias("s")
    )


def _q377_oracle() -> str:
    rows = " UNION ALL ".join(
        f"SELECT '{name}' AS group_key,"
        f" (SELECT CAST(count(*) AS BIGINT) FROM events) AS n_rows,"
        f" CAST(count(DISTINCT {expr}) AS BIGINT) AS ndv FROM events"
        for name, expr in _Q377_KEYS
    )
    return f"""
    SELECT group_key, n_rows, ndv,
           round(CAST(n_rows AS DOUBLE) / ndv, 2) AS reduction_x,
           n_rows >= 8 * ndv AS combine_pays
    FROM ({rows})
    ORDER BY group_key
    """


@register("q377_partial_agg_advisor", oracle=_q377_oracle())
def q377_partial_agg_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-aggregation (map-side combine) ADVISOR — prices, per
    candidate group-by key, how much a pre-shuffle partial aggregate
    would collapse the exchange: reduction_x = rows/NDV is exactly
    the expected rows-per-key a combiner merges before shuffling, and
    combine_pays (the integer gate n ≥ 8·ndv) marks keys where the
    partial agg is worth its hash-table CPU. The two failure modes
    this catches are real at 100 TB: grouping by a near-unique key
    (event_id: reduction 1× — the combiner hashes every row for
    nothing, the case Spark's `spark.sql.aggregate.partialAggregation
    SkipEnabled` adaptive skip exists for) and grouping by a low-NDV
    key (event_type: reduction ≈ n/|types| — the exchange shrinks to
    almost nothing, partial agg is mandatory). Completes the
    engine-diagnostic family: q321 sizes partitions, q322/q369 order
    joins, q328/q329/q340 audit selectivity estimates; this prices
    the aggregation side.

    Scale: one COUNT(DISTINCT) per candidate key (exact here —
    q296's HLL NDV at 100 TB, where ±2% error cannot flip an 8×
    gate) and a 5-row arithmetic readout; nothing touches more than
    one scan per statistic.
    """
    rows = _events_key_cardinalities(spark, sf_dir)
    return rows.select(
        "s.group_key",
        "s.n_rows",
        "s.ndv",
        F.round(F.col("s.n_rows").cast("double") / F.col("s.ndv"), 2).alias(
            "reduction_x"
        ),
        (F.col("s.n_rows") >= 8 * F.col("s.ndv")).alias("combine_pays"),
    ).orderBy("group_key")


def _q378_oracle() -> str:
    rows = " UNION ALL ".join(
        f"SELECT '{name}' AS group_key,"
        f" (SELECT CAST(count(*) AS BIGINT) FROM events) AS n_rows,"
        f" CAST(count(DISTINCT {expr}) AS BIGINT) AS ndv FROM events"
        for name, expr in _Q377_KEYS
    )
    return f"""
    SELECT group_key, n_rows, ndv,
           round(ndv * 48 / 1048576.0, 3) AS hash_table_mb,
           ndv * 48 > 64 * 1048576 AS hash_spills,
           CAST(n_rows + ndv AS BIGINT) AS hash_cost,
           CAST(n_rows * length(bin(n_rows - 1)) AS BIGINT) AS sort_cost,
           CASE WHEN ndv * 48 > 64 * 1048576 THEN 'sort' ELSE 'hash' END
               AS chosen
    FROM ({rows})
    ORDER BY group_key
    """


@register("q378_sort_vs_hash_agg_advisor", oracle=_q378_oracle())
def q378_sort_vs_hash_agg_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-vs-hash aggregation strategy ADVISOR — the aggregation
    twin of q322/q369's join-order pricing (the remaining
    engine-diagnostic from NEXT.md's round-11 list). Per candidate
    group-by key it prices both physical strategies from the same
    two statistics q377 measures (rows, exact NDV):

    - hash_cost  = n + ndv           (one probe per row, one entry
      per group: HashAggregateExec's work when the table fits)
    - sort_cost  = n * ceil(log2 n)  (comparison volume of the sort
      SortAggregateExec needs first)
    - hash_table_mb = ndv * 48B      (entry = key ptr + 2 agg slots
      + bucket overhead) — when this exceeds the 64 MB per-task
      budget the hash table spills and re-merges, and the advisor
      flips to 'sort', exactly the case Spark itself handles with
      ObjectHashAggregate → sort-based fallback.

    ceil(log2 n) is computed INTEGER-EXACTLY as length(bin(n-1)) in
    both engines (bit length of n-1) — a float log2 at an exact
    power of two rounds differently per libm and would flip the
    cost row (the q163 integer-digit lesson).

    The 100 TB read: grouping by event_id (ndv ≈ n) prices a
    ~45 GB hash table per task — hash_spills=true, sort wins (and
    upstream, q377 already said to skip the partial agg); grouping
    by event_type prices a 48-byte table — hash wins by n·(log2 n −
    1) comparisons. The advisor's two gates are exactly the inputs
    a 1000-executor job needs to pick `spark.sql.
    objectHashAggregate.sortBased.fallbackThreshold`.

    Scale: identical economics to q377 — one events scan carrying
    all five exact NDVs, a broadcast scalar fan-out, and a 5-row
    literal lattice; the pricing arithmetic never touches the
    corpus again.
    """
    rows = _events_key_cardinalities(spark, sf_dir)
    n, ndv = F.col("s.n_rows"), F.col("s.ndv")
    spills = ndv * 48 > 64 * 1048576
    return rows.select(
        "s.group_key",
        "s.n_rows",
        "s.ndv",
        F.round(ndv * 48 / F.lit(1048576.0), 3).alias("hash_table_mb"),
        spills.alias("hash_spills"),
        (n + ndv).cast("long").alias("hash_cost"),
        (n * F.length(F.bin(n - 1))).cast("long").alias("sort_cost"),
        F.when(spills, F.lit("sort")).otherwise(F.lit("hash")).alias("chosen"),
    ).orderBy("group_key")


@register(
    "q380_bayesian_ab_posterior",
    oracle="""
    WITH conv AS (
        SELECT CAST(user_id % 2 AS BIGINT) AS arm,
               count(DISTINCT user_id) AS n,
               count(DISTINCT CASE WHEN event_type = 'purchase'
                                   THEN user_id END) AS k
        FROM events GROUP BY 1
    ),
    grid AS (SELECT unnest(generate_series(1, 100)) AS j),
    w AS (
        SELECT c.arm, g.j,
               c.k * ln((2 * g.j - 1) / 200.0)
               + (c.n - c.k) * ln(1.0 - (2 * g.j - 1) / 200.0) AS la
        FROM conv c, grid g
    ),
    wn AS (
        SELECT arm, j,
               CAST(round(exp(la - max(la) OVER (PARTITION BY arm)) * 1e12)
                    AS BIGINT) AS wn
        FROM w
    ),
    cum AS (
        SELECT arm, j, wn,
               coalesce(sum(wn) OVER (PARTITION BY arm ORDER BY j
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS cum_lt
        FROM wn
    ),
    tot AS (SELECT arm, sum(CAST(wn AS HUGEINT)) AS t FROM wn GROUP BY arm),
    pairs AS (
        SELECT a.arm,
               sum(CAST(a.wn AS HUGEINT) * CAST(b.cum_lt AS HUGEINT)) AS num
        FROM cum a JOIN cum b ON b.arm = 1 - a.arm AND b.j = a.j
        GROUP BY a.arm
    )
    SELECT CASE WHEN c.arm = 0 THEN 'control' ELSE 'treat' END AS arm,
           CAST(c.n AS BIGINT) AS n_users,
           CAST(c.k AS BIGINT) AS k_conv,
           round((c.k + 1.0) / (c.n + 2.0), 6) AS post_mean,
           round(CAST(p.num AS DOUBLE)
                 / (CAST(ta.t AS DOUBLE) * CAST(tb.t AS DOUBLE)),
                 5) AS prob_beats_other
    FROM conv c
    JOIN pairs p ON p.arm = c.arm
    JOIN tot ta ON ta.arm = c.arm
    JOIN tot tb ON tb.arm = 1 - c.arm
    ORDER BY arm
    """,
)
def q380_bayesian_ab_posterior(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bayesian A/B readout — P(arm beats the other) under
    independent Beta(k+1, n−k+1) conversion posteriors (uniform
    prior), integrated DETERMINISTICALLY on a 100-point midpoint
    grid instead of Monte Carlo, so the answer is reproducible and
    oracle-checkable (no RNG anywhere — the q150 z-test's Bayesian
    sibling; 'converted' = user has ≥1 purchase event, arms = the
    same even/odd user split).

    Numerical discipline (the q360 nano-quantization device): each
    arm's posterior mass at grid point j is computed in log space,
    max-shifted (softmax trick — no underflow for any n), then
    quantized to INTEGER nanos wn = round(exp(la−max)·1e12). From
    there every sum is integer-exact and summation-order-free
    (Spark's partial aggs can merge in any order without drifting a
    double), the cross-mass P(A>B) = Σ_j wnA_j·cumB_{<j} accumulates
    in decimal(38,0)/HUGEINT (products ≤1e26 — exact), and only the
    final ratio returns to double, rounded at 5 dp — ulp noise from
    the two engines' ln/exp sits ~7 orders below the rounding grain.
    Same-grid-cell mass is a tie and counts for neither arm, so
    prob_control + prob_treat + P(tie) = 1.

    Scale: one events scan collapses to a 2-row (arm, n, k) frame
    map-side (countDistinct over the user grain is the only
    exchange); the grid fan-out is 2×100 literal rows and every
    window/join below it is bounded arithmetic — the corpus is
    never touched again, identical economics at 100 TB.
    """
    e = load(spark, sf_dir, "events")
    conv = e.groupBy(
        (F.col("user_id") % 2).cast("long").alias("arm")
    ).agg(
        F.countDistinct("user_id").alias("n"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("k"),
    )
    grid = spark.range(1, 101).select(F.col("id").cast("int").alias("j"))
    p = (2 * F.col("j") - 1) / F.lit(200.0)
    w = conv.crossJoin(F.broadcast(grid)).select(
        "arm",
        "j",
        "n",
        "k",
        (F.col("k") * F.log(p) + (F.col("n") - F.col("k")) * F.log(1.0 - p))
        .alias("la"),
    )
    arm_w = Window.partitionBy("arm")
    wn = w.select(
        "arm",
        "j",
        F.round(F.exp(F.col("la") - F.max("la").over(arm_w)) * 1e12)
        .cast("long")
        .alias("wn"),
    )
    cum_w = (
        Window.partitionBy("arm")
        .orderBy("j")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = wn.select(
        "arm", "j", "wn",
        F.coalesce(F.sum("wn").over(cum_w), F.lit(0)).alias("cum_lt"),
    )
    tot = cum.groupBy("arm").agg(
        F.sum(F.col("wn").cast("decimal(38,0)")).alias("t")
    )
    other = cum.select(
        (1 - F.col("arm")).alias("arm"),
        F.col("j").alias("oj"),
        F.col("cum_lt").alias("o_cum_lt"),
    )
    pairs = (
        cum.join(other, (cum.arm == other.arm) & (cum.j == other.oj))
        .groupBy(cum.arm)
        .agg(
            F.sum(
                F.col("wn").cast("decimal(38,0)")
                * F.col("o_cum_lt").cast("decimal(38,0)")
            ).alias("num")
        )
    )
    tot_other = tot.select(
        (1 - F.col("arm")).alias("arm"), F.col("t").alias("t_other")
    )
    return (
        conv.join(pairs, "arm")
        .join(tot, "arm")
        .join(tot_other, "arm")
        .select(
            F.when(F.col("arm") == 0, F.lit("control"))
            .otherwise(F.lit("treat"))
            .alias("arm"),
            F.col("n").cast("long").alias("n_users"),
            F.col("k").cast("long").alias("k_conv"),
            F.round((F.col("k") + 1.0) / (F.col("n") + 2.0), 6).alias(
                "post_mean"
            ),
            F.round(
                F.col("num").cast("double")
                / (F.col("t").cast("double") * F.col("t_other").cast("double")),
                5,
            ).alias("prob_beats_other"),
        )
        .orderBy("arm")
    )


_Q382_DP_LAYER = """
    dp{t} AS (
        SELECT j, cost, split FROM (
            SELECT c.j, d.cost + c.sse AS cost, d.j AS split,
                   row_number() OVER (PARTITION BY c.j
                                      ORDER BY d.cost + c.sse, d.j) AS rn
            FROM dp{p} d JOIN cost c ON c.i = d.j + 1
        ) WHERE rn = 1
    )"""


_Q382_ORACLE = f"""
    WITH vals AS (
        SELECT CAST(round(value * 1e6) AS BIGINT) AS v
        FROM events WHERE value IS NOT NULL
    ),
    ext AS (SELECT min(v) AS lo, max(v) AS hi FROM vals),
    binned AS (
        SELECT least(15, ((v - lo) * 16) // (hi - lo + 1)) AS b
             , v
        FROM vals, ext
    ),
    micro AS (
        SELECT b, count(*) AS c, sum(v) AS s,
               sum(CAST(v AS HUGEINT) * v) AS q
        FROM binned GROUP BY b
    ),
    dense AS (
        SELECT g.b, coalesce(m.c, 0) AS c,
               coalesce(m.s, 0) AS s, coalesce(m.q, 0) AS q
        FROM (SELECT unnest(generate_series(0, 15)) AS b) g
        LEFT JOIN micro m USING (b)
    ),
    pre AS (
        SELECT b, sum(c) OVER (ORDER BY b) AS cc,
               sum(s) OVER (ORDER BY b) AS cs,
               sum(q) OVER (ORDER BY b) AS cq
        FROM dense
    ),
    cost AS (
        SELECT lo.i, pj.b AS j,
               CAST(pj.cc - coalesce(pi.cc, 0) AS BIGINT) AS c,
               CASE WHEN pj.cc - coalesce(pi.cc, 0) = 0 THEN 0.0
                    ELSE CAST(pj.cq - coalesce(pi.cq, 0) AS DOUBLE)
                         - CAST(pj.cs - coalesce(pi.cs, 0) AS DOUBLE)
                           * CAST(pj.cs - coalesce(pi.cs, 0) AS DOUBLE)
                           / CAST(pj.cc - coalesce(pi.cc, 0) AS DOUBLE)
               END AS sse
        FROM (SELECT unnest(generate_series(0, 15)) AS i) lo
        JOIN pre pj ON pj.b >= lo.i
        LEFT JOIN pre pi ON pi.b = lo.i - 1
    ),
    dp1 AS (SELECT j, sse AS cost, CAST(NULL AS BIGINT) AS split
            FROM cost WHERE i = 0),
    {_Q382_DP_LAYER.format(t=2, p=1)},
    {_Q382_DP_LAYER.format(t=3, p=2)},
    {_Q382_DP_LAYER.format(t=4, p=3)},
    s3 AS (SELECT split AS e3, cost AS dp_total FROM dp4 WHERE j = 15),
    s2 AS (SELECT dp3.split AS e2, s3.e3, s3.dp_total
           FROM dp3, s3 WHERE dp3.j = s3.e3),
    s1 AS (SELECT dp2.split AS e1, s2.e2, s2.e3, s2.dp_total
           FROM dp2, s2 WHERE dp2.j = s2.e2),
    eq AS (
        SELECT sum(sse) AS ew_total FROM cost
        WHERE (i, j) IN ((0, 3), (4, 7), (8, 11), (12, 15))
    ),
    buckets AS (
        SELECT 1 AS bucket, 0 AS lo_bin, e1 AS hi_bin FROM s1
        UNION ALL SELECT 2, e1 + 1, e2 FROM s1
        UNION ALL SELECT 3, e2 + 1, e3 FROM s1
        UNION ALL SELECT 4, e3 + 1, 15 FROM s1
    )
    SELECT CAST(b.bucket AS BIGINT) AS bucket,
           CAST(b.lo_bin AS BIGINT) AS lo_bin,
           CAST(b.hi_bin AS BIGINT) AS hi_bin,
           c.c AS n_rows,
           round(c.sse / 1e12, 4) AS bucket_sse,
           round(s1.dp_total / 1e12, 4) AS dp_total_sse,
           round(eq.ew_total / 1e12, 4) AS equiwidth_total_sse,
           round(CASE WHEN eq.ew_total <= 0 THEN 0.0
                      ELSE 100.0 * (1.0 - s1.dp_total / eq.ew_total)
                 END, 2) AS gain_pct
    FROM buckets b
    JOIN cost c ON c.i = b.lo_bin AND c.j = b.hi_bin
    CROSS JOIN s1 CROSS JOIN eq
    ORDER BY bucket
"""


@register("q382_voptimal_histogram", oracle=_Q382_ORACLE)
def q382_voptimal_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V-OPTIMAL histogram construction (Jagadish et al., VLDB'98) —
    the optimizer-statistics builder: partition the value domain
    into B=4 buckets minimizing total within-bucket variance (SSE),
    solved EXACTLY by dynamic programming over 16 equi-width
    micro-bins, and priced against the plain equi-width-4 layout
    (gain_pct — how much estimation error the optimal boundaries
    remove). Completes the histogram family: q131/q189 build
    equi-width/equi-depth, q340 audits equi-depth's selectivity
    error; this one builds the ERROR-OPTIMAL histogram those are
    approximations of.

    Exactness discipline: values quantize to integer micro-nanos
    (×1e6) at the scan, so every micro-bin moment (count, Σv, Σv²)
    is an integer (decimal-38/HUGEINT — Σv² terms reach 1e18) and
    the bin assignment uses INTEGER floor-division (both operands
    nonnegative, so DuckDB `//` == Spark `div` — the q364 lesson).
    Interval SSE = Q − S²/C then converts those exact integers to
    double with identical IEEE arithmetic in both engines — no libm
    anywhere — so the DP's argmin comparisons (ties → smaller
    split) cannot fork. Reported SSEs rescale by 1e12 back to
    value² units.

    Scale: ONE corpus scan collapses map-side to ≤16 micro-bin
    moment rows; the interval lattice (136 rows), three DP layers
    (≤16 rows each), and the backtrack are literal-bounded joins —
    the classic sketch-then-solve split: corpus work is mergeable
    moments, the optimization runs on the sketch. B or N grow ×10
    without touching the scan.
    """
    e = load(spark, sf_dir, "events")
    vals = e.filter(F.col("value").isNotNull()).select(
        F.round(F.col("value") * 1e6).cast("long").alias("v")
    )
    ext = vals.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    binned = vals.crossJoin(F.broadcast(ext)).select(
        F.least(
            F.lit(15),
            F.expr("(v - lo) * 16 div (hi - lo + 1)"),
        ).alias("b"),
        "v",
    )
    v38 = F.col("v").cast("decimal(38,0)")
    micro = binned.groupBy("b").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(v38).alias("s"),
        F.sum(v38 * v38).alias("q"),
    )
    bins = spark.range(0, 16).select(F.col("id").alias("b"))
    zero = F.lit(0).cast("decimal(38,0)")
    dense = bins.join(micro, "b", "left").select(
        "b",
        F.coalesce(F.col("c"), F.lit(0)).alias("c"),
        F.coalesce(F.col("s"), zero).alias("s"),
        F.coalesce(F.col("q"), zero).alias("q"),
    )
    wp = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    pre = dense.select(
        "b",
        F.sum("c").over(wp).alias("cc"),
        F.sum("s").over(wp).alias("cs"),
        F.sum("q").over(wp).alias("cq"),
    )
    lo = spark.range(0, 16).select(F.col("id").alias("i"))
    pi = pre.select(
        F.col("b").alias("pb"),
        F.col("cc").alias("pcc"),
        F.col("cs").alias("pcs"),
        F.col("cq").alias("pcq"),
    )
    iv = (
        lo.join(pre, pre.b >= lo.i)
        .join(pi, pi.pb == lo.i - 1, "left")
        .select(
            "i",
            F.col("b").alias("j"),
            (F.col("cc") - F.coalesce(F.col("pcc"), F.lit(0)))
            .cast("long")
            .alias("c"),
            (F.col("cs") - F.coalesce(F.col("pcs"), zero))
            .cast("double")
            .alias("s"),
            (F.col("cq") - F.coalesce(F.col("pcq"), zero))
            .cast("double")
            .alias("q"),
        )
    )
    cost = iv.select(
        "i",
        "j",
        "c",
        F.when(F.col("c") == 0, F.lit(0.0))
        .otherwise(
            F.col("q") - F.col("s") * F.col("s") / F.col("c").cast("double")
        )
        .alias("sse"),
    ).localCheckpoint()

    dp = cost.filter(F.col("i") == 0).select(
        "j", F.col("sse").alias("cost"), F.lit(None).cast("long").alias("split")
    )
    nxt = cost.select(
        F.col("i").alias("ni"), F.col("j").alias("nj"), F.col("sse").alias("nsse")
    )
    dp_frames: dict[int, DataFrame] = {}
    for t in (2, 3, 4):
        wr = Window.partitionBy("nj").orderBy(
            (F.col("cost") + F.col("nsse")).asc(), F.col("j").asc()
        )
        dp = (
            dp.join(nxt, F.col("ni") == F.col("j") + 1)
            .withColumn("rn", F.row_number().over(wr))
            .filter(F.col("rn") == 1)
            .select(
                F.col("nj").alias("j"),
                (F.col("cost") + F.col("nsse")).alias("cost"),
                F.col("j").alias("split"),
            )
        )
        dp_frames[t] = dp
    dp4 = dp_frames[4].filter(F.col("j") == 15).select(
        F.col("split").alias("e3"), F.col("cost").alias("dp_total")
    )
    s2 = dp4.join(dp_frames[3], dp_frames[3]["j"] == dp4["e3"]).select(
        F.col("split").alias("e2"), "e3", "dp_total"
    )
    s1 = s2.join(dp_frames[2], dp_frames[2]["j"] == s2["e2"]).select(
        F.col("split").alias("e1"), "e2", "e3", "dp_total"
    )
    eq = (
        cost.filter(
            ((F.col("i") == 0) & (F.col("j") == 3))
            | ((F.col("i") == 4) & (F.col("j") == 7))
            | ((F.col("i") == 8) & (F.col("j") == 11))
            | ((F.col("i") == 12) & (F.col("j") == 15))
        )
        .agg(F.sum("sse").alias("ew_total"))
    )
    buckets = s1.select(
        F.explode(
            F.array(
                F.struct(F.lit(1).alias("bucket"), F.lit(0).cast("long").alias("lo_bin"), F.col("e1").alias("hi_bin")),
                F.struct(F.lit(2).alias("bucket"), (F.col("e1") + 1).alias("lo_bin"), F.col("e2").alias("hi_bin")),
                F.struct(F.lit(3).alias("bucket"), (F.col("e2") + 1).alias("lo_bin"), F.col("e3").alias("hi_bin")),
                F.struct(F.lit(4).alias("bucket"), (F.col("e3") + 1).alias("lo_bin"), F.lit(15).cast("long").alias("hi_bin")),
            )
        ).alias("bk"),
        "dp_total",
    ).select("bk.*", "dp_total")
    return (
        buckets.join(
            cost,
            (cost.i == buckets.lo_bin) & (cost.j == buckets.hi_bin),
        )
        .crossJoin(eq)
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            F.col("lo_bin").cast("long").alias("lo_bin"),
            F.col("hi_bin").cast("long").alias("hi_bin"),
            F.col("c").alias("n_rows"),
            F.round(F.col("sse") / 1e12, 4).alias("bucket_sse"),
            F.round(F.col("dp_total") / 1e12, 4).alias("dp_total_sse"),
            F.round(F.col("ew_total") / 1e12, 4).alias("equiwidth_total_sse"),
            F.round(
                F.when(F.col("ew_total") <= 0, F.lit(0.0)).otherwise(
                    100.0 * (1.0 - F.col("dp_total") / F.col("ew_total"))
                ),
                2,
            ).alias("gain_pct"),
        )
        .orderBy("bucket")
    )


# q388: table -> (n_fixed_cols, string_cols) width specs (the q321
# formula: 8 B per fixed col + measured string lengths + 4 B string
# overhead) for every relation the join advisor prices.
# dim-only width specs; fact/customer specs come from _ADVISOR_TABLES
# (ONE source of truth for the 8B-fixed + string-length formula —
# q321/q388/q414 must price a table identically).
_Q388_DIM_WIDTHS = {
    "region": (1, ["r_name"]),
    "nation": (2, ["n_name"]),
    "supplier": (3, ["s_name"]),
    "part": (3, ["p_name", "p_brand", "p_type"]),
}
_Q388_WIDTHS = {
    **_Q388_DIM_WIDTHS,
    **{
        t: (nf, sc)
        for t, nf, sc in _ADVISOR_TABLES
        if t in ("orders", "lineitem", "customer")
    },
}


def _table_bytes_est(n_fixed: int, str_cols: list[str]):
    """The q321 byte-estimate Column (8 B per fixed col + measured
    string lengths + 4 B string overhead) — shared by q321/q388/q414
    so the three planners can never price one table differently."""
    sumlen = None
    for c in str_cols:
        term = F.sum(F.length(c).cast("long"))
        sumlen = term if sumlen is None else sumlen + term
    n = F.count(F.lit(1))
    return (
        F.lit(8 * n_fixed) * n + sumlen + F.lit(4 * len(str_cols)) * n
    ).cast("long")

# candidate equi-joins: (name, left table, right table)
_Q388_JOINS = [
    ("customer_nation", "customer", "nation"),
    ("lineitem_orders", "lineitem", "orders"),
    ("lineitem_part", "lineitem", "part"),
    ("nation_region", "nation", "region"),
    ("orders_customer", "orders", "customer"),
    ("supplier_nation", "supplier", "nation"),
]

_Q388_BCAST_LIMIT = 10 * 1024 * 1024  # autoBroadcastJoinThreshold default
_Q388_SHUFFLE_PARTS = 32


def _q388_bytes_sql(table: str) -> str:
    n_fixed, str_cols = _Q388_WIDTHS[table]
    sumlens = " + ".join(f"sum(length({c}))" for c in str_cols)
    return (
        f"SELECT CAST({8 * n_fixed} * count(*) + {sumlens}"
        f" + {4 * len(str_cols)} * count(*) AS BIGINT) AS b FROM {table}"
    )


def _q388_oracle() -> str:
    blocks = " UNION ALL ".join(
        f"""SELECT '{name}' AS join_name,
                  ({_q388_bytes_sql(lt)}) AS left_bytes,
                  ({_q388_bytes_sql(rt)}) AS right_bytes"""
        for name, lt, rt in _Q388_JOINS
    )
    return f"""
    SELECT join_name, left_bytes, right_bytes,
           CASE WHEN least(left_bytes, right_bytes) <= {_Q388_BCAST_LIMIT}
                THEN CASE WHEN left_bytes <= right_bytes
                          THEN 'left' ELSE 'right' END
                WHEN least(left_bytes, right_bytes) * 3
                     <= greatest(left_bytes, right_bytes)
                 AND least(left_bytes, right_bytes)
                     < CAST({_Q388_BCAST_LIMIT} AS BIGINT)
                       * {_Q388_SHUFFLE_PARTS}
                THEN CASE WHEN left_bytes <= right_bytes
                          THEN 'left' ELSE 'right' END
                ELSE 'none' END AS build_side,
           CASE WHEN least(left_bytes, right_bytes) <= {_Q388_BCAST_LIMIT}
                THEN 'broadcast_hash'
                WHEN least(left_bytes, right_bytes) * 3
                     <= greatest(left_bytes, right_bytes)
                 AND least(left_bytes, right_bytes)
                     < CAST({_Q388_BCAST_LIMIT} AS BIGINT)
                       * {_Q388_SHUFFLE_PARTS}
                THEN 'shuffle_hash'
                ELSE 'sort_merge' END AS strategy,
           CASE WHEN least(left_bytes, right_bytes) <= {_Q388_BCAST_LIMIT}
                THEN least(left_bytes, right_bytes) * {_Q388_SHUFFLE_PARTS}
                ELSE left_bytes + right_bytes END AS exchanged_bytes
    FROM ({blocks})
    ORDER BY join_name
    """


@register("q388_join_strategy_advisor", oracle=_q388_oracle())
def q388_join_strategy_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Physical JOIN-STRATEGY advisor — replays Spark's own
    JoinSelection decision rules over measured table widths: pick
    broadcast-hash when the smaller side fits the 10 MB
    autoBroadcastJoinThreshold, else shuffle-hash when one side is
    ≥3× smaller (`muchSmaller`) AND its per-partition slice fits a
    local hash map (bytes < threshold × shuffle partitions —
    `canBuildLocalHashMap`), else sort-merge. exchanged_bytes prices
    the network: a broadcast ships the small side to every one of
    the {32} executors, a shuffle moves each side once — the
    crossover (small × P vs L+R) is exactly why broadcasting a
    'small' 50 GB dim at 1000 executors is a catastrophe while
    broadcasting 5 MB is free. Byte estimates are q321's
    integer-exact width formula (8 B/fixed col + measured string
    lengths + 4 B overhead), so both engines price identically with
    no doubles. Completes the physical-strategy advisor family:
    q322/q369 order the joins, q378 picks the agg algorithm, this
    picks the join algorithm — together the cost-based layer a
    100 TB plan review walks through.

    Scale: one combining length-sum agg per relation (6 scans of
    dims + 2 fact scans, each collapsing map-side to one row);
    the decision table is 6 literal rows of arithmetic.
    """
    stats = {}
    for t in {lt for _, lt, _ in _Q388_JOINS} | {
        rt for _, _, rt in _Q388_JOINS
    }:
        n_fixed, str_cols = _Q388_WIDTHS[t]
        df = load(spark, sf_dir, t)
        stats[t] = df.agg(_table_bytes_est(n_fixed, str_cols).alias(f"b_{t}"))
    base = None
    for t, sdf in sorted(stats.items()):
        base = sdf if base is None else base.crossJoin(F.broadcast(sdf))
    rows = base.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(name).alias("join_name"),
                    F.col(f"b_{lt}").alias("left_bytes"),
                    F.col(f"b_{rt}").alias("right_bytes"),
                )
                for name, lt, rt in _Q388_JOINS
            ])
        ).alias("s")
    ).select("s.*")
    small = F.least(F.col("left_bytes"), F.col("right_bytes"))
    big = F.greatest(F.col("left_bytes"), F.col("right_bytes"))
    fits_bcast = small <= _Q388_BCAST_LIMIT
    fits_shash = (small * 3 <= big) & (
        small < F.lit(_Q388_BCAST_LIMIT).cast("long") * _Q388_SHUFFLE_PARTS
    )
    side = F.when(
        F.col("left_bytes") <= F.col("right_bytes"), F.lit("left")
    ).otherwise(F.lit("right"))
    return rows.select(
        "join_name",
        "left_bytes",
        "right_bytes",
        F.when(fits_bcast, side)
        .when(fits_shash, side)
        .otherwise(F.lit("none"))
        .alias("build_side"),
        F.when(fits_bcast, F.lit("broadcast_hash"))
        .when(fits_shash, F.lit("shuffle_hash"))
        .otherwise(F.lit("sort_merge"))
        .alias("strategy"),
        F.when(fits_bcast, small * _Q388_SHUFFLE_PARTS)
        .otherwise(F.col("left_bytes") + F.col("right_bytes"))
        .alias("exchanged_bytes"),
    ).orderBy("join_name")


_Q387_P = 8          # range partitions
_Q387_SAMPLE = "0c"  # md5 2-hex-char cutoff ≈ 5% deterministic sample


def _q387_boundary_sql(src: str, name: str) -> str:
    """Equi-depth boundary CTEs over `src` (a relation with a value
    column): distinct-value cumulative counts → the 7 order
    statistics at ranks (i·n)//8, collected to an ascending list."""
    return f"""
    {name}_n AS (SELECT count(*) AS n FROM {src}),
    {name}_vc AS (SELECT value, count(*) AS c FROM {src} GROUP BY value),
    {name}_cum AS (
        SELECT value, sum(c) OVER (ORDER BY value) AS cc FROM {name}_vc
    ),
    {name}_b AS (
        SELECT i.i, min(value) AS b
        FROM (SELECT unnest(generate_series(1, {_Q387_P - 1})) AS i) i,
             {name}_cum, {name}_n
        WHERE {name}_cum.cc >= (i.i * {name}_n.n) // {_Q387_P}
        GROUP BY i.i
    ),
    {name}_arr AS (
        SELECT coalesce(list(b ORDER BY i), CAST([] AS DOUBLE[])) AS bs
        FROM {name}_b
    )"""


_Q387_ORACLE = f"""
    WITH ev AS (SELECT event_id, value FROM events
                WHERE value IS NOT NULL),
    samp AS (
        SELECT value FROM ev
        WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 2)
              <= '{_Q387_SAMPLE}'
    ),
    {_q387_boundary_sql("ev", "ex")},
    {_q387_boundary_sql("samp", "sm")},
    parts AS (
        SELECT 'exact' AS method,
               len(list_filter(ex_arr.bs, x -> e.value > x)) AS part_id
        FROM ev e, ex_arr
        UNION ALL
        SELECT 'sampled',
               len(list_filter(sm_arr.bs, x -> e.value > x))
        FROM ev e, sm_arr
    ),
    counts AS (
        SELECT method, CAST(part_id AS BIGINT) AS part_id,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM parts GROUP BY method, part_id
    )
    SELECT method, part_id, n_rows,
           round(CAST(max(n_rows) OVER (PARTITION BY method) AS DOUBLE)
                 * {_Q387_P} / (SELECT n FROM ex_n), 4) AS method_skew_x
    FROM counts
    ORDER BY method, part_id
"""


@register("q387_range_partition_balance", oracle=_Q387_ORACLE)
def q387_range_partition_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RangePartitioner BALANCE AUDIT — the physics behind every
    `orderBy`/`repartitionByRange` at scale: Spark picks range split
    points from a SAMPLE, and the audit measures what that costs.
    Two 8-way range layouts over events.value are compared: 'exact'
    boundaries (true order statistics at ranks i·n/8, computed from
    the distinct-value cumulative histogram — the q39 device) and
    'sampled' boundaries (the same algebra on a deterministic ~5%
    md5 sample, q17's stable-sampling convention — the stand-in for
    RangePartitioner's reservoir). Every row is then assigned by
    boundary comparison (ties left), and the per-partition counts +
    max/ideal skew ratio quantify the imbalance the sample's rank
    error introduces — the number that decides whether a 100 TB
    sort gets straggler tasks (skew 1.0 = perfect; production lore
    says samples keep it under ~1.2, and this measures it).

    Scale: boundary construction is values-grain (distinct-value
    histogram + a 7-row rank probe), never a corpus-wide window;
    assignment is a map-side array scan against the broadcast 7-
    boundary list; counts are one hash agg. The sampled path reads
    the 5% slice with a pushed-down md5 filter. Degenerate sample
    (zero rows on a tiny/heavily-filtered fixture): the oracle
    coalesces the boundary list to [] so both engines agree on
    one all-rows partition 0 — DuckDB's list() over zero rows is
    NULL while collect_list is [] (r11 ADVICE).
    """
    e = (
        load(spark, sf_dir, "events")
        # NULL values ride differently through the two engines' ORDER
        # BY (Spark windows: NULLS FIRST; DuckDB: NULLS LAST) and
        # would shift every cumulative boundary rank — exclude them
        # identically, like q382/q392/q399 do
        .filter(F.col("value").isNotNull())
        .select("event_id", "value")
    )
    samp = e.filter(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 2)
        <= _Q387_SAMPLE
    ).select("value")

    def boundaries(src: DataFrame) -> DataFrame:
        n = src.agg(F.count(F.lit(1)).alias("n"))
        vc = src.groupBy("value").agg(F.count(F.lit(1)).alias("c"))
        cum = vc.select(
            "value",
            F.sum("c")
            .over(Window.orderBy("value").rowsBetween(
                Window.unboundedPreceding, 0))
            .alias("cc"),
        )
        ranks = (
            spark.range(1, _Q387_P)
            .select(F.col("id").alias("i"))
            .crossJoin(F.broadcast(n))
            .selectExpr("i", f"(i * n) div {_Q387_P} AS r")
        )
        bex = (
            cum.join(F.broadcast(ranks), F.col("cc") >= F.col("r"))
            .groupBy("i")
            .agg(F.min("value").alias("b"))
        )
        return bex.agg(F.sort_array(F.collect_list("b")).alias("bs"))

    def assign(bs_frame: DataFrame, method: str) -> DataFrame:
        return e.crossJoin(F.broadcast(bs_frame)).select(
            F.lit(method).alias("method"),
            F.size(F.filter(F.col("bs"), lambda x: F.col("value") > x))
            .cast("long")
            .alias("part_id"),
        )

    parts = assign(boundaries(e), "exact").unionByName(
        assign(boundaries(samp), "sampled")
    )
    counts = parts.groupBy("method", "part_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    total = e.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "method",
            "part_id",
            "n_rows",
            F.round(
                F.max("n_rows").over(Window.partitionBy("method")).cast(
                    "double"
                )
                * _Q387_P
                / F.col("n_total"),
                4,
            ).alias("method_skew_x"),
        )
        .orderBy("method", "part_id")
    )


_Q389_NPART = 32          # shuffle partitions being simulated
_Q389_FACTOR = 5          # skewedPartitionFactor (Spark default)
_Q389_FLOOR = 4096        # skewedPartitionThresholdInBytes, fixture-scaled
_Q389_TARGET = 8192       # advisoryPartitionSizeInBytes, fixture-scaled


@register(
    "q389_aqe_skew_split_sim",
    oracle=f"""
    WITH rw AS (
        SELECT CAST(CAST('0x' || substr(md5(CAST(
                   CASE WHEN user_id % 10 < 7 THEN 0
                        ELSE user_id % 25 END AS VARCHAR)), 1, 8)
                   AS UBIGINT) % {_Q389_NPART} AS BIGINT) AS part_id,
               32 + 8 + length(event_type) + length(props) AS rb
        FROM events
    ),
    parts AS (
        SELECT part_id, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(rb) AS BIGINT) AS est_bytes
        FROM rw GROUP BY part_id
    ),
    med AS (
        SELECT est_bytes AS m FROM (
            SELECT est_bytes,
                   row_number() OVER (ORDER BY est_bytes, part_id) AS rn,
                   count(*) OVER () AS cnt
            FROM parts
        ) WHERE rn = (cnt + 1) // 2
    )
    SELECT p.part_id, p.n_rows, p.est_bytes, med.m AS median_bytes,
           p.est_bytes > greatest({_Q389_FLOOR},
                                  {_Q389_FACTOR} * med.m) AS is_skewed,
           CASE WHEN p.est_bytes > greatest({_Q389_FLOOR},
                                            {_Q389_FACTOR} * med.m)
                THEN CAST(ceil(CAST(p.est_bytes AS DOUBLE)
                               / {_Q389_TARGET}) AS BIGINT)
                ELSE 1 END AS n_splits
    FROM parts p, med
    ORDER BY p.part_id
    """,
)
def q389_aqe_skew_split_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQE SKEW-SPLIT decision replay — simulates exactly the rule
    `OptimizeSkewedJoin` applies at runtime: a shuffle partition is
    skewed when its size exceeds max(skewedPartitionThresholdInBytes,
    skewedPartitionFactor × median partition size), and a skewed
    partition splits into ceil(size / advisoryPartitionSizeInBytes)
    reader slices. The input is q254's planted hot key (~70% of
    events on one join key) hashed into {_Q389_NPART} shuffle
    partitions (md5-derived — engine-portable, unlike Murmur3),
    per-partition bytes from q321's integer width formula, and the
    median as an exact order statistic (lower median, rank
    (n+1)//2 — no averaging doubles). The output is the split
    schedule AQE would produce: the hot partition fans out into
    dozens of slices while the long tail stays at 1 — the runtime
    complement to the PROACTIVE salting q105/q254 implement, and the
    audit that says whether `spark.sql.adaptive.skewJoin` alone
    would save a given 100 TB join (thresholds here are
    fixture-scaled; production defaults are 256 MB floor / 64 MB
    advisory — same algebra).

    Scale: one scan collapsing map-side to ≤{_Q389_NPART} partition
    rows; the decision table is bounded arithmetic on those rows.
    """
    e = load(spark, sf_dir, "events")
    nk = F.when(F.col("user_id") % 10 < 7, F.lit(0)).otherwise(
        F.col("user_id") % 25
    )
    rw = e.select(
        (
            F.conv(F.substring(F.md5(nk.cast("string")), 1, 8), 16, 10)
            .cast("long")
            % _Q389_NPART
        ).alias("part_id"),
        (
            F.lit(32 + 8)
            + F.length("event_type").cast("long")
            + F.length("props").cast("long")
        ).alias("rb"),
    )
    parts = rw.groupBy("part_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("rb").cast("long").alias("est_bytes"),
    )
    ranked = parts.select(
        "est_bytes",
        F.row_number()
        .over(Window.orderBy("est_bytes", "part_id"))
        .alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("cnt"),
    )
    # integer lower-median rank: (cnt + 1) div 2
    med = ranked.filter(
        F.expr("rn = (cnt + 1) div 2")
    ).select(F.col("est_bytes").alias("median_bytes"))
    skewed = F.col("est_bytes") > F.greatest(
        F.lit(_Q389_FLOOR).cast("long"),
        F.lit(_Q389_FACTOR) * F.col("median_bytes"),
    )
    return (
        parts.crossJoin(F.broadcast(med))
        .select(
            "part_id",
            "n_rows",
            "est_bytes",
            "median_bytes",
            skewed.alias("is_skewed"),
            F.when(
                skewed,
                F.ceil(
                    F.col("est_bytes").cast("double") / _Q389_TARGET
                ).cast("long"),
            )
            .otherwise(F.lit(1).cast("long"))
            .alias("n_splits"),
        )
        .orderBy("part_id")
    )


@register(
    "q391_oof_target_encoding",
    oracle="""
    WITH ev AS (
        SELECT event_type,
               CAST(CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                                        1, 8) AS UBIGINT) % 4 AS BIGINT)
                   AS fold,
               value
        FROM events WHERE value IS NOT NULL
    ),
    cell AS (
        SELECT event_type, fold, count(*) AS c,
               sum(CAST(round(value * 100) AS HUGEINT)) AS s
        FROM ev GROUP BY event_type, fold
    ),
    tot AS (
        SELECT event_type, sum(c) AS ct, sum(s) AS st
        FROM cell GROUP BY event_type
    ),
    g AS (SELECT sum(c) AS cg, sum(s) AS sg FROM cell)
    SELECT c.event_type, c.fold,
           CAST(c.c AS BIGINT) AS n_in_fold,
           round(CAST(t.st - c.s AS DOUBLE)
                 / (100.0 * (t.ct - c.c)), 6) AS oof_encoding,
           round(CAST(g.sg - c.s AS DOUBLE)
                 / (100.0 * (g.cg - c.c)), 6) AS oof_global_mean,
           round(CAST(t.st AS DOUBLE) / (100.0 * t.ct), 6)
               AS leaky_encoding
    FROM cell c JOIN tot t USING (event_type) CROSS JOIN g
    ORDER BY c.event_type, c.fold
    """,
)
def q391_oof_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OUT-OF-FOLD target encoding — the leakage-safe categorical
    feature every tabular training pipeline needs at scale: encode
    event_type by the mean target (value) computed WITHOUT the
    current fold's rows, oof = (Σ_total − Σ_fold)/(n_total −
    n_fold). Folds come from the q137/q17 deterministic md5 split
    (4 folds), and the leaky full-data encoding rides along so the
    output quantifies exactly what leaks (leaky − oof per cell).
    The subtract-own-contribution identity is the same subtractable-
    moment device as q363's leave-one-source-out valuation — one
    pass, no per-fold rescan.

    Scale: ONE aggregate to the (category × fold) grain — 20 cells
    here, |categories|×K anywhere — then bounded arithmetic; the
    encode-train-rows join back (not materialized here) is a
    broadcast of those cells. No row-level window, no K passes.
    Target sums are quantized to centi-units (value is 2-dp) and
    summed as exact decimal integers, so the moments are
    order-independent — a raw double sum would differ between
    Spark's partial-merge order and DuckDB's sequential fold and
    could flake the 6-dp gate on a rounding boundary (r11 ADVICE).
    """
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    fold = (
        F.conv(
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 4
    )
    cell = e.groupBy("event_type", fold.alias("fold")).agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(
            F.round(F.col("value") * 100).cast("decimal(38,0)")
        ).alias("s"),
    )
    tot = cell.groupBy("event_type").agg(
        F.sum("c").alias("ct"), F.sum("s").alias("st")
    )
    g = cell.agg(F.sum("c").alias("cg"), F.sum("s").alias("sg"))
    return (
        cell.join(tot, "event_type")
        .crossJoin(F.broadcast(g))
        .select(
            "event_type",
            "fold",
            F.col("c").cast("long").alias("n_in_fold"),
            F.round(
                (F.col("st") - F.col("s")).cast("double")
                / (100.0 * (F.col("ct") - F.col("c"))),
                6,
            ).alias("oof_encoding"),
            F.round(
                (F.col("sg") - F.col("s")).cast("double")
                / (100.0 * (F.col("cg") - F.col("c"))),
                6,
            ).alias("oof_global_mean"),
            F.round(
                F.col("st").cast("double") / (100.0 * F.col("ct")), 6
            ).alias("leaky_encoding"),
        )
        .orderBy("event_type", "fold")
    )


@register(
    "q392_learned_cdf_audit",
    oracle="""
    WITH vc AS (
        SELECT value AS v, count(*) AS c FROM events
        WHERE value IS NOT NULL GROUP BY value
    ),
    cum AS (
        SELECT v, CAST(sum(c) OVER (ORDER BY v) AS DOUBLE) AS r FROM vc
    ),
    fit AS (
        SELECT count(*) AS d,
               CAST(sum(CAST(round(v * 100) AS HUGEINT)) AS DOUBLE)
                   / 100.0 AS sv,
               CAST(sum(CAST(r AS HUGEINT)) AS DOUBLE) AS sr,
               CAST(sum(CAST(round(v * 100) AS HUGEINT)
                        * CAST(round(v * 100) AS HUGEINT)) AS DOUBLE)
                   / 10000.0 AS svv,
               CAST(sum(CAST(round(v * 100) AS HUGEINT)
                        * CAST(r AS HUGEINT)) AS DOUBLE) / 100.0 AS svr,
               max(r) AS n
        FROM cum
    ),
    ab AS (
        SELECT n, d,
               (d * svr - sv * sr) / (d * svv - sv * sv) AS b,
               (sr - (d * svr - sv * sr) / (d * svv - sv * sv) * sv) / d
                   AS a
        FROM fit
    ),
    err AS (
        SELECT max(abs(cum.r - (ab.a + ab.b * cum.v))) AS mx
        FROM cum, ab
    )
    SELECT CAST(ab.n AS BIGINT) AS n_rows,
           CAST(ab.d AS BIGINT) AS n_distinct,
           round(ab.b, 6) AS slope,
           round(ab.a, 4) AS intercept,
           round(err.mx, 2) AS learned_max_rank_err,
           round(ab.n / 32.0, 2) AS hist16_halfbin_err,
           err.mx < ab.n / 32.0 AS learned_beats_hist
    FROM ab, err
    """,
)
def q392_learned_cdf_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEARNED-INDEX audit (Kraska et al.'s RMI, stage-0) — fit the
    empirical CDF of events.value with one least-squares line
    rank ≈ a + b·value over the distinct-value cumulative histogram
    and measure its MAX rank error, against the analytic error of a
    16-bucket equi-depth histogram (half a bucket, n/32). This is
    the zone-map-vs-model question storage engines now ask: a
    learned CDF whose max error beats the histogram's locates a key
    in a narrower scan window with two multiplies instead of a bin
    search — learned_beats_hist is the verdict for THIS column's
    distribution (near-uniform values → the line wins; q382's
    V-optimal buckets are the classical counterattack for skewed
    ones). Closes the statistics-construction arc: q131/q189/q382
    build histograms, q340 audits their selectivity error, this
    audits the model alternative on equal terms.

    Scale: the corpus collapses once to the distinct-value
    histogram; the OLS moments are one mergeable aggregate over it
    (q115's device), and the error pass is a second values-grain
    map — nothing at corpus grain after the first agg. The same
    two-pass shape fits per-partition zone maps at 100 TB (fit per
    file, error per file, worst-case rollup).
    """
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    vc = e.groupBy(F.col("value").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    cum = vc.select(
        "v",
        F.sum("c")
        .over(Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
        .alias("r"),
    )
    # OLS moments as exact decimal-integer sums over centi-unit
    # values (value is 2-dp) and integer ranks: order-independent,
    # so both engines derive bit-identical a/b (r11 ADVICE — raw
    # double sums merge in partial-agg order and can flake the gate).
    vc = F.round(F.col("v") * 100).cast("decimal(38,0)")
    rc = F.col("r").cast("decimal(38,0)")
    fit = cum.agg(
        F.count(F.lit(1)).cast("double").alias("d"),
        (F.sum(vc).cast("double") / 100.0).alias("sv"),
        F.sum(rc).cast("double").alias("sr"),
        (F.sum(vc * vc).cast("double") / 10000.0).alias("svv"),
        (F.sum(vc * rc).cast("double") / 100.0).alias("svr"),
        F.max("r").alias("n"),
    )
    b = (F.col("d") * F.col("svr") - F.col("sv") * F.col("sr")) / (
        F.col("d") * F.col("svv") - F.col("sv") * F.col("sv")
    )
    ab = fit.select(
        "n", "d", b.alias("b"), ((F.col("sr") - b * F.col("sv")) / F.col("d")).alias("a")
    )
    err = cum.crossJoin(F.broadcast(ab)).agg(
        F.max(
            F.abs(F.col("r") - (F.col("a") + F.col("b") * F.col("v")))
        ).alias("mx"),
        F.first("n").alias("n"),
        F.first("d").alias("d"),
        F.first("a").alias("a"),
        F.first("b").alias("b"),
    )
    return err.select(
        F.col("n").cast("long").alias("n_rows"),
        F.col("d").cast("long").alias("n_distinct"),
        F.round(F.col("b"), 6).alias("slope"),
        F.round(F.col("a"), 4).alias("intercept"),
        F.round(F.col("mx"), 2).alias("learned_max_rank_err"),
        F.round(F.col("n") / 32.0, 2).alias("hist16_halfbin_err"),
        (F.col("mx") < F.col("n") / 32.0).alias("learned_beats_hist"),
    )


@register(
    "q393_tcloseness_audit",
    oracle="""
    WITH base AS (
        SELECT c_mktsegment, c_nationkey,
               CAST(least(3, greatest(0,
                    floor((c_acctbal + 1000.0) / 2750.0))) AS BIGINT) AS sb
        FROM customer
    ),
    cell AS (
        SELECT c_mktsegment, c_nationkey, sb, count(*) AS c
        FROM base GROUP BY 1, 2, 3
    ),
    bins AS (SELECT unnest(generate_series(0, 3)) AS sb),
    grp AS (
        SELECT c_mktsegment, c_nationkey, sum(c) AS g
        FROM cell GROUP BY 1, 2
    ),
    gdist AS (SELECT sb, sum(c) AS gc FROM cell GROUP BY sb),
    n AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM cell),
    dense AS (
        SELECT grp.c_mktsegment, grp.c_nationkey, bins.sb, grp.g,
               coalesce(cell.c, 0) AS c, gdist.gc
        FROM grp CROSS JOIN bins
        JOIN gdist ON gdist.sb = bins.sb
        LEFT JOIN cell ON cell.c_mktsegment = grp.c_mktsegment
                      AND cell.c_nationkey = grp.c_nationkey
                      AND cell.sb = bins.sb
    ),
    cums AS (
        SELECT c_mktsegment, c_nationkey, sb, g,
               sum(CAST(c AS DOUBLE) / g) OVER w AS cp,
               sum(CAST(gc AS DOUBLE) / (SELECT n FROM n)) OVER w AS cq
        FROM dense
        WINDOW w AS (PARTITION BY c_mktsegment, c_nationkey
                     ORDER BY sb ROWS UNBOUNDED PRECEDING)
    ),
    emd AS (
        SELECT c_mktsegment, c_nationkey,
               CAST(any_value(g) AS BIGINT) AS class_size,
               round(sum(CASE WHEN sb < 3
                              THEN abs(cp - cq) ELSE 0 END) / 3.0, 6)
                   AS t_emd
        FROM cums GROUP BY 1, 2
    )
    SELECT c_mktsegment, CAST(c_nationkey AS BIGINT) AS c_nationkey,
           class_size, t_emd,
           t_emd > 0.2 AS exceeds_t
    FROM emd
    ORDER BY t_emd DESC, c_mktsegment, c_nationkey
    LIMIT 40
    """,
)
def q393_tcloseness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-CLOSENESS audit (Li et al., ICDE'07) — the third rung of
    the anonymization ladder the engine already climbs (q207
    k-anonymity: class sizes; q251 l-diversity: sensitive-value
    variety): for each quasi-identifier class (mktsegment × nation),
    the Earth Mover's Distance between its SENSITIVE-attribute
    distribution (4 ordered balance bands) and the global one —
    EMD over an ordered attribute with unit ground distance is the
    mean absolute difference of the cumulative distributions,
    (1/(m−1))·Σ|P≤i − Q≤i|. A class can be 5-anonymous and diverse
    yet still leak ('this nation's segment skews rich'); t_emd > 0.2
    flags exactly that, and the top-40 worst classes are the
    suppression worklist.

    Scale: one pass to the (class × band) cells, densified against
    a 4-row literal band frame; cumulative sums run at class grain
    (bounded partitions of 4 rows), never over the corpus. Counts
    are exact integers; the only doubles are the final two divisions
    and the 6-dp-rounded EMD, identical in both engines.
    """
    c = load(spark, sf_dir, "customer")
    sb = F.least(
        F.lit(3),
        F.greatest(
            F.lit(0), F.floor((F.col("c_acctbal") + 1000.0) / 2750.0)
        ),
    ).cast("long")
    cell = c.groupBy("c_mktsegment", "c_nationkey", sb.alias("sb")).agg(
        F.count(F.lit(1)).alias("c")
    )
    bins = spark.range(0, 4).select(F.col("id").alias("sb"))
    grp = cell.groupBy("c_mktsegment", "c_nationkey").agg(
        F.sum("c").alias("g")
    )
    glob = cell.groupBy("sb").agg(F.sum("c").alias("gc"))
    n = cell.agg(F.sum("c").cast("double").alias("n"))
    dense = (
        grp.crossJoin(F.broadcast(bins))
        .join(F.broadcast(glob), "sb")
        .join(cell, ["c_mktsegment", "c_nationkey", "sb"], "left")
        .select(
            "c_mktsegment",
            "c_nationkey",
            "sb",
            "g",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
            "gc",
        )
        .crossJoin(F.broadcast(n))
    )
    w = (
        Window.partitionBy("c_mktsegment", "c_nationkey")
        .orderBy("sb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cums = dense.select(
        "c_mktsegment",
        "c_nationkey",
        "sb",
        "g",
        F.sum(F.col("c").cast("double") / F.col("g")).over(w).alias("cp"),
        F.sum(F.col("gc").cast("double") / F.col("n")).over(w).alias("cq"),
    )
    emd = cums.groupBy("c_mktsegment", "c_nationkey").agg(
        F.any_value("g").cast("long").alias("class_size"),
        F.round(
            F.sum(
                F.when(F.col("sb") < 3, F.abs(F.col("cp") - F.col("cq")))
                .otherwise(F.lit(0.0))
            )
            / 3.0,
            6,
        ).alias("t_emd"),
    )
    return (
        emd.select(
            "c_mktsegment",
            F.col("c_nationkey").cast("long").alias("c_nationkey"),
            "class_size",
            "t_emd",
            (F.col("t_emd") > 0.2).alias("exceeds_t"),
        )
        .orderBy(F.desc("t_emd"), "c_mktsegment", "c_nationkey")
        .limit(40)
    )


_Q396_TARGET = 16 * 1024  # target output bytes, fixture-scaled (prod: 128 MB)


@register(
    "q396_compaction_planner",
    oracle=f"""
    WITH fg AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(sum(32 + 8 + length(event_type) + length(props))
                    AS BIGINT) AS bytes
        FROM events GROUP BY 1, 2
    ),
    ord AS (
        SELECT *,
               coalesce(sum(bytes) OVER (ORDER BY day, event_type
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS cumb
        FROM fg
    ),
    asg AS (SELECT *, cumb // {_Q396_TARGET} AS out_file FROM ord),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n_groups,
               sum(bytes) AS tb
        FROM fg
    )
    SELECT CAST(out_file AS BIGINT) AS out_file,
           CAST(count(*) AS BIGINT) AS n_inputs,
           CAST(sum(bytes) AS BIGINT) AS out_bytes,
           round(100.0 * sum(bytes) / {_Q396_TARGET}, 2) AS fill_pct,
           tot.n_groups AS n_input_groups,
           CAST(ceil(CAST(tot.tb AS DOUBLE) / {_Q396_TARGET}) AS BIGINT)
               AS ideal_files
    FROM asg, tot
    GROUP BY out_file, tot.n_groups, tot.tb
    ORDER BY out_file
    """,
)
def q396_compaction_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SMALL-FILE COMPACTION planner — the maintenance job every
    partitioned lake needs: (event_type × day) ingest partitions
    (the small-file shape daily ingest produces — 150 input groups
    here) are packed into target-sized output files by NEXT-FIT on
    the layout-ordered running byte total: out_file = floor(Σ
    previous bytes / target). Next-fit keeps input order, so each
    output file covers a CONTIGUOUS (day, type) range — zone maps
    and partition pruning survive the rewrite (the same reason
    OPTIMIZE in lakehouse engines compacts within, not across,
    partition boundaries). Per-file fill % and the ideal file count
    quantify the packing loss (next-fit wastes at most one group per
    bin over the Σ/target lower bound). Byte estimates are q321's
    integer width formula; completes the layout family — q299 scan
    amplification, q311 zone maps, q321 partition sizing, q389 AQE
    splits, and now the compaction rewrite plan itself.

    Scale: one scan collapses map-side to the file-group grain
    (|types|×|days| rows); the running total is a file-group-grain
    window (150 rows here, thousands at 100 TB — never corpus) and
    the plan is pure integer arithmetic on it.
    """
    e = load(spark, sf_dir, "events")
    fg = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(
            F.lit(32 + 8)
            + F.length("event_type").cast("long")
            + F.length("props").cast("long")
        )
        .cast("long")
        .alias("bytes")
    )
    wo = Window.orderBy("day", "event_type").rowsBetween(
        Window.unboundedPreceding, -1
    )
    asg = fg.select(
        "bytes",
        F.coalesce(F.sum("bytes").over(wo), F.lit(0)).alias("cumb"),
    ).selectExpr("bytes", f"cumb div {_Q396_TARGET} AS out_file")
    tot = fg.agg(
        F.count(F.lit(1)).cast("long").alias("n_input_groups"),
        F.sum("bytes").alias("tb"),
    )
    return (
        asg.groupBy("out_file")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_inputs"),
            F.sum("bytes").cast("long").alias("out_bytes"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("out_file").cast("long").alias("out_file"),
            "n_inputs",
            "out_bytes",
            F.round(100.0 * F.col("out_bytes") / _Q396_TARGET, 2).alias(
                "fill_pct"
            ),
            "n_input_groups",
            F.ceil(F.col("tb").cast("double") / _Q396_TARGET)
            .cast("long")
            .alias("ideal_files"),
        )
        .orderBy("out_file")
    )


@register(
    "q404_delta_encoding_audit",
    oracle="""
    WITH s AS (
        SELECT event_id,
               row_number() OVER (ORDER BY ts, event_id) AS rn,
               epoch_us(ts) AS ts_us
        FROM events
    ),
    d AS (
        SELECT ts_us - lag(ts_us) OVER (ORDER BY rn) AS delta
        FROM s
    ),
    blocks AS (
        SELECT (rn - 1) // 128 AS blk,
               ts_us - lag(ts_us) OVER (ORDER BY rn) AS delta
        FROM s
    ),
    bw AS (
        SELECT blk,
               CAST(count(*) AS BIGINT) AS n,
               CAST(max(length(bin(greatest(delta, 1) - 1)) + 1)
                    AS BIGINT) AS bits
        FROM blocks WHERE delta IS NOT NULL
        GROUP BY blk
    )
    SELECT CAST(count(*) AS BIGINT) AS n_blocks,
           CAST(sum(n) AS BIGINT) AS n_values,
           CAST(sum(n * bits) // 8 AS BIGINT) AS packed_bytes,
           CAST(sum(n) * 8 AS BIGINT) AS raw_bytes,
           round(CAST(sum(n) * 8 AS DOUBLE)
                 / (sum(n * bits) / 8.0), 2) AS compression_x,
           round(avg(bits), 2) AS avg_bits_per_value,
           CAST(max(bits) AS BIGINT) AS worst_block_bits
    FROM bw
    """,
)
def q404_delta_encoding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELTA/BIT-PACKING encoding audit — measures, on the engine's
    own data, the storage physics parquet's DELTA_BINARY_PACKED
    exploits: sort events by time, take per-row timestamp deltas,
    and price each 128-value block at the bit width of its WORST
    delta (bit length of max(delta−1) + 1 sign/zero slack — integer
    exact, q378's length(bin(·)) device). compression_x vs raw
    8-byte longs is the answer to 'does keeping this table
    time-sorted pay at the storage layer?' — the write-side
    complement of the read-side layout audits (q299 Z-order scan
    amplification, q311 zone maps, q396 compaction): time-sorted
    deltas pack ~6-8 bits, shuffled data packs ~40+, and this
    number is why ingest pipelines sort before write.

    Scale: the global sort is the audited layout itself (an ingest
    writer orders within partitions, so per-partition row_number is
    the production form); everything after is a 128-row-block
    rollup collapsing map-side to |blocks| rows, then one scalar
    aggregate.
    """
    e = load(spark, sf_dir, "events")
    wo = Window.orderBy("ts", "event_id")
    s = e.select(
        F.row_number().over(wo).alias("rn"),
        F.unix_micros("ts").alias("ts_us"),
    )
    wd = Window.orderBy("rn")
    blocks = s.select(
        ((F.col("rn") - 1) / 128).cast("long").alias("blk"),
        (F.col("ts_us") - F.lag("ts_us").over(wd)).alias("delta"),
    ).filter(F.col("delta").isNotNull())
    bw = blocks.groupBy("blk").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (
            F.max(F.length(F.bin(F.greatest(F.col("delta"), F.lit(1)) - 1)))
            + 1
        )
        .cast("long")
        .alias("bits"),
    )
    return bw.agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum("n").cast("long").alias("n_values"),
        F.expr("sum(n * bits) div 8").cast("long").alias("packed_bytes"),
        (F.sum("n") * 8).cast("long").alias("raw_bytes"),
        F.round(
            (F.sum("n") * 8).cast("double")
            / (F.sum(F.col("n") * F.col("bits")) / 8.0),
            2,
        ).alias("compression_x"),
        F.round(F.avg("bits"), 2).alias("avg_bits_per_value"),
        F.max("bits").cast("long").alias("worst_block_bits"),
    )


_Q405_CUT = 250.0
_Q405_BW = 100.0


def _q405_side_sql(name: str, cond: str) -> str:
    # Moments as exact integer sums over centi-unit x (value is 2-dp)
    # and integer y — order-independent, so both engines fit from
    # bit-identical scalars (r11 ADVICE: raw double sums merge in
    # partial-agg order and can flake the 4-dp gate).
    return f"""{name} AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(xc) AS DOUBLE) / 100.0 AS sx,
               CAST(sum(xc * xc) AS DOUBLE) / 10000.0 AS sxx,
               CAST(sum(yc) AS DOUBLE) AS sy,
               CAST(sum(xc * yc) AS DOUBLE) / 100.0 AS sxy,
               CAST(sum(yc * yc) AS DOUBLE) AS syy
        FROM base WHERE {cond}
    ),
    {name}f AS (
        SELECT n,
               (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
               (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                   AS a,
               sxx, sx, sy, sxy, syy
        FROM {name}
    ),
    {name}v AS (
        SELECT n, a, b,
               (syy - a * sy - b * sxy) / (n - 2) * sxx
               / (n * sxx - sx * sx) AS va
        FROM {name}f
    )"""


@register(
    "q405_regression_discontinuity",
    oracle=f"""
    WITH base AS (
        SELECT CAST(round((value - {_Q405_CUT}) * 100) AS HUGEINT) AS xc,
               CAST(length(props) AS HUGEINT) AS yc
        FROM events
        WHERE value >= {_Q405_CUT - _Q405_BW}
          AND value < {_Q405_CUT + _Q405_BW}
          AND props IS NOT NULL
    ),
    {_q405_side_sql("l", "xc < 0")},
    {_q405_side_sql("r", "xc >= 0")}
    SELECT CAST(l.n AS BIGINT) AS n_left,
           CAST(r.n AS BIGINT) AS n_right,
           round(l.a, 4) AS intercept_left,
           round(r.a, 4) AS intercept_right,
           round(r.a - l.a, 4) AS rd_effect,
           round(sqrt(l.va + r.va), 4) AS se_effect,
           abs(r.a - l.a) > 1.96 * sqrt(l.va + r.va) AS significant
    FROM lv l, rv r
    """,
)
def q405_regression_discontinuity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REGRESSION DISCONTINUITY estimator — the sharp-RD design that
    completes the causal family (q221 DiD, q265 interrupted time
    series, q225 CUPED, q301 IPW, q270 QTE, q240/q285 uplift): at a
    policy cutoff on a running variable (value = {_Q405_CUT},
    bandwidth ±{_Q405_BW}), fit a LOCAL LINEAR regression on each
    side and read the treatment effect as the intercept gap at the
    cutoff, with the standard OLS intercept variance on each side
    giving the z-gate. On this observational fixture the honest
    answer is ≈0 with a CI that says so — the estimator's null
    behavior is exactly what the oracle pins (a fabricated jump
    would be the bug).

    Scale: BOTH side-fits come from ONE conditional-aggregate pass
    (six mergeable moments per side — the q115/q392 OLS device);
    no sort, no window, no second scan. The bandwidth filter is
    pushed to the parquet scan.
    """
    e = load(spark, sf_dir, "events").filter(
        (F.col("value") >= _Q405_CUT - _Q405_BW)
        & (F.col("value") < _Q405_CUT + _Q405_BW)
        & F.col("props").isNotNull()
    )
    # Centi-unit x / integer y: the six moments are exact decimal
    # sums (order-independent) scaled back to doubles — see
    # _q405_side_sql for the matching oracle device.
    base = e.select(
        F.round((F.col("value") - _Q405_CUT) * 100)
        .cast("decimal(38,0)")
        .alias("xc"),
        F.length("props").cast("decimal(38,0)").alias("yc"),
    )

    def side(cond):
        m = base.filter(cond).agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            (F.sum("xc").cast("double") / 100.0).alias("sx"),
            (F.sum(F.col("xc") * F.col("xc")).cast("double") / 10000.0)
            .alias("sxx"),
            F.sum("yc").cast("double").alias("sy"),
            (F.sum(F.col("xc") * F.col("yc")).cast("double") / 100.0)
            .alias("sxy"),
            F.sum(F.col("yc") * F.col("yc")).cast("double").alias("syy"),
        )
        b = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
            F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
        )
        a = (F.col("sy") - b * F.col("sx")) / F.col("n")
        return m.select(
            "n",
            a.alias("a"),
            (
                (F.col("syy") - a * F.col("sy") - b * F.col("sxy"))
                / (F.col("n") - 2)
                * F.col("sxx")
                / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            ).alias("va"),
        )

    left = side(F.col("xc") < 0).select(
        F.col("n").alias("nl"), F.col("a").alias("al"), F.col("va").alias("vl")
    )
    right = side(F.col("xc") >= 0).select(
        F.col("n").alias("nr"), F.col("a").alias("ar"), F.col("va").alias("vr")
    )
    se = F.sqrt(F.col("vl") + F.col("vr"))
    return left.crossJoin(F.broadcast(right)).select(
        F.col("nl").cast("long").alias("n_left"),
        F.col("nr").cast("long").alias("n_right"),
        F.round(F.col("al"), 4).alias("intercept_left"),
        F.round(F.col("ar"), 4).alias("intercept_right"),
        F.round(F.col("ar") - F.col("al"), 4).alias("rd_effect"),
        F.round(se, 4).alias("se_effect"),
        (F.abs(F.col("ar") - F.col("al")) > 1.96 * se).alias("significant"),
    )


_Q407_VNODES = 8
_Q407_H32 = "CAST(CAST('0x' || substr(md5({expr}), 1, 8) AS UBIGINT) AS BIGINT)"


def _q407_ring_sql(n_srv: int, name: str) -> str:
    h = _Q407_H32.format(
        expr="'srv:' || CAST(s.s AS VARCHAR) || ':' || CAST(v.v AS VARCHAR)"
    )
    return f"""{name} AS (
        SELECT s.s AS server, {h} AS pos
        FROM (SELECT unnest(range(0, {n_srv})) AS s) s,
             (SELECT unnest(range(0, {_Q407_VNODES})) AS v) v
    ),
    {name}_asg AS (
        SELECT k.user_id, server FROM (
            SELECT k.user_id, r.server,
                   row_number() OVER (PARTITION BY k.user_id
                                      ORDER BY (r.pos < k.h), r.pos,
                                               r.server) AS rn
            FROM keys k, {name} r
        ) k WHERE rn = 1
    )"""


@register(
    "q407_consistent_hash_rebalance",
    oracle=f"""
    WITH keys AS (
        SELECT DISTINCT user_id,
               {_Q407_H32.format(expr="CAST(user_id AS VARCHAR)")} AS h
        FROM events
    ),
    {_q407_ring_sql(4, "r4")},
    {_q407_ring_sql(5, "r5")},
    assigned AS (
        SELECT a.user_id, a.server AS s_before, b.server AS s_after
        FROM r4_asg a JOIN r5_asg b USING (user_id)
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n_keys,
               round(100.0 * sum(CASE WHEN s_before <> s_after
                                      THEN 1 ELSE 0 END) / count(*), 2)
                   AS moved_pct
        FROM assigned
    ),
    srv AS (SELECT unnest(range(0, 5)) AS server)
    SELECT CAST(srv.server AS BIGINT) AS server,
           CAST(coalesce(b.nb, 0) AS BIGINT) AS n_before,
           CAST(coalesce(a.na, 0) AS BIGINT) AS n_after,
           CAST(coalesce(m.mi, 0) AS BIGINT) AS moved_in,
           tot.moved_pct, tot.n_keys
    FROM srv
    LEFT JOIN (SELECT s_before AS server, count(*) AS nb FROM assigned
               GROUP BY 1) b ON b.server = srv.server
    LEFT JOIN (SELECT s_after AS server, count(*) AS na FROM assigned
               GROUP BY 1) a ON a.server = srv.server
    LEFT JOIN (SELECT s_after AS server, count(*) AS mi FROM assigned
               WHERE s_before <> s_after GROUP BY 1) m
           ON m.server = srv.server
    CROSS JOIN tot
    ORDER BY server
    """,
)
def q407_consistent_hash_rebalance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CONSISTENT-HASH RING rebalance audit — q242 prices rendezvous
    (HRW) sharding; this prices the ring: 4 servers × {_Q407_VNODES}
    md5 vnodes each, every user key owned by the first vnode
    clockwise from its hash (wraparound to the ring's minimum), then
    a FIFTH server joins and the audit measures exactly what moved.
    Consistent hashing's contract is that only ~1/(n+1) of keys move
    (here ≈20%, all INTO the new server — moved_in must be 0 for
    old servers: a key's owner changes only if a new vnode lands
    between the key and its old owner); vnode count controls the
    balance spread. moved_pct vs the 80% a mod-N reshard would move
    is the whole argument for rings in shuffle-less key-value
    placement (state-store assignment, cache shards, q242's
    alternative).

    Scale: the ring is a 32/40-row literal relation fanned against
    the distinct-key set map-side (broadcast); assignment is a
    rank-1 window per key over ≤40 candidates; both layouts and the
    movement matrix come from one keys-grain pass each.
    """
    e = load(spark, sf_dir, "events")
    h32 = lambda c: F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")  # noqa: E731
    keys = e.select("user_id").distinct().select(
        "user_id", h32(F.col("user_id").cast("string")).alias("h")
    )

    def ring(n_srv: int) -> DataFrame:
        srv = spark.range(n_srv).select(F.col("id").alias("server"))
        vn = spark.range(_Q407_VNODES).select(F.col("id").alias("v"))
        return srv.crossJoin(vn).select(
            "server",
            h32(
                F.concat(
                    F.lit("srv:"),
                    F.col("server").cast("string"),
                    F.lit(":"),
                    F.col("v").cast("string"),
                )
            ).alias("pos"),
        )

    def assign(r: DataFrame, out: str) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy(
            (F.col("pos") < F.col("h")).asc(), F.col("pos").asc(),
            F.col("server").asc(),
        )
        return (
            keys.crossJoin(F.broadcast(r))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", F.col("server").alias(out))
        )

    both = assign(ring(4), "s_before").join(
        assign(ring(5), "s_after"), "user_id"
    )
    tot = both.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.round(
            100.0
            * F.sum((F.col("s_before") != F.col("s_after")).cast("int"))
            / F.count(F.lit(1)),
            2,
        ).alias("moved_pct"),
    )
    srv = spark.range(5).select(F.col("id").alias("server"))
    nb = both.groupBy(F.col("s_before").alias("server")).agg(
        F.count(F.lit(1)).alias("nb")
    )
    na = both.groupBy(F.col("s_after").alias("server")).agg(
        F.count(F.lit(1)).alias("na")
    )
    mi = (
        both.filter(F.col("s_before") != F.col("s_after"))
        .groupBy(F.col("s_after").alias("server"))
        .agg(F.count(F.lit(1)).alias("mi"))
    )
    return (
        srv.join(nb, "server", "left")
        .join(na, "server", "left")
        .join(mi, "server", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("server").cast("long").alias("server"),
            F.coalesce("nb", F.lit(0)).cast("long").alias("n_before"),
            F.coalesce("na", F.lit(0)).cast("long").alias("n_after"),
            F.coalesce("mi", F.lit(0)).cast("long").alias("moved_in"),
            "moved_pct",
            "n_keys",
        )
        .orderBy("server")
    )


# q409: per string column, the parquet-writer dictionary decision.
_Q409_COLS = [
    ("documents", "lang"),
    ("documents", "source"),
    ("documents", "text"),
    ("events", "event_type"),
    ("events", "props"),
    ("orders", "o_orderpriority"),
    ("part", "p_type"),
]


def _q409_block(table: str, col: str) -> str:
    return f"""
    SELECT '{table}.{col}' AS column_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT {col}) AS BIGINT) AS ndv,
           CAST(sum(length({col})) AS BIGINT) AS plain_bytes,
           CAST((SELECT sum(length(v))
                 FROM (SELECT DISTINCT {col} AS v
                       FROM {table} WHERE {col} IS NOT NULL))
                + (count(*) * length(bin(
                       greatest(count(DISTINCT {col}), 2) - 1)) + 7) // 8
                AS BIGINT) AS dict_bytes
    FROM {table} WHERE {col} IS NOT NULL"""


@register(
    "q409_dictionary_encoding_advisor",
    oracle="SELECT column_name, n_rows, ndv, plain_bytes, dict_bytes,"
    " dict_bytes < plain_bytes AS use_dict,"
    " round(100.0 * (plain_bytes - dict_bytes) / plain_bytes, 2)"
    " AS savings_pct FROM ("
    + " UNION ALL ".join(_q409_block(t, c) for t, c in _Q409_COLS)
    + ") ORDER BY column_name",
)
def q409_dictionary_encoding_advisor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DICTIONARY-ENCODING advisor — the string-column counterpart
    of q404's delta audit, replaying the decision every parquet
    writer makes per column chunk: dictionary encoding costs the
    distinct-value page (Σ distinct lengths) plus bit-packed indexes
    (n · bitwidth(ndv−1), ceil to bytes — integer-exact via the
    length(bin(·)) device), against plain encoding's Σ lengths.
    Low-cardinality columns (event_type, lang, priority) compress
    30-50×; near-unique ones (text, props) cost MORE than plain —
    use_dict flips exactly where parquet's writer falls back, and
    savings_pct is the column-level answer to 'why is this file so
    big'. Together q404/q409/q321/q396 are the storage-layer audit
    kit: encodings, sizing, compaction.

    Scale: one combining aggregate per column (count, NDV, length
    sum) plus one distinct-value length sum — every statistic
    mergeable, shuffle bounded by NDV; at 100 TB the same numbers
    read from parquet footer stats without a scan.
    """
    outs = []
    for table, col in _Q409_COLS:
        df = load(spark, sf_dir, table).filter(F.col(col).isNotNull())
        base = df.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct(col).cast("long").alias("ndv"),
            F.sum(F.length(col)).cast("long").alias("plain_bytes"),
        )
        dpage = (
            df.select(F.col(col).alias("v"))
            .distinct()
            .agg(F.sum(F.length("v")).cast("long").alias("dict_page"))
        )
        outs.append(
            base.crossJoin(F.broadcast(dpage)).select(
                F.lit(f"{table}.{col}").alias("column_name"),
                "n_rows",
                "ndv",
                "plain_bytes",
                (
                    F.col("dict_page")
                    + F.expr(
                        "(n_rows * length(bin(greatest(ndv, 2) - 1)) + 7)"
                        " div 8"
                    )
                )
                .cast("long")
                .alias("dict_bytes"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.select(
        "column_name",
        "n_rows",
        "ndv",
        "plain_bytes",
        "dict_bytes",
        (F.col("dict_bytes") < F.col("plain_bytes")).alias("use_dict"),
        F.round(
            100.0
            * (F.col("plain_bytes") - F.col("dict_bytes"))
            / F.col("plain_bytes"),
            2,
        ).alias("savings_pct"),
    ).orderBy("column_name")


_Q414_MEMS = (64, 256, 1024)  # per-task sort memory, MB
_Q414_FANIN = 64              # merge fan-in per pass


@register(
    "q414_external_sort_planner",
    oracle=" UNION ALL ".join(
        f"""
    SELECT table_name, est_bytes, CAST({mem} AS BIGINT) AS mem_mb,
           n_runs,
           CASE WHEN n_runs <= 1 THEN 0
                ELSE CAST(ceil(ln(CAST(n_runs AS DOUBLE))
                               / ln({_Q414_FANIN}.0)) AS BIGINT)
           END AS merge_passes,
           est_bytes * (1 + 2 * CASE WHEN n_runs <= 1 THEN 0
                ELSE CAST(ceil(ln(CAST(n_runs AS DOUBLE))
                               / ln({_Q414_FANIN}.0)) AS BIGINT) END)
               AS io_bytes
    FROM (
        SELECT '{t}' AS table_name,
               CAST({8 * nf} * count(*) + {" + ".join(f"sum(length({c}))" for c in sc)}
                    + {4 * len(sc)} * count(*) AS BIGINT) AS est_bytes,
               CAST(ceil(CAST({8 * nf} * count(*) + {" + ".join(f"sum(length({c}))" for c in sc)}
                    + {4 * len(sc)} * count(*) AS DOUBLE)
                    / ({mem} * 1048576.0)) AS BIGINT) AS n_runs
        FROM {t}
    )"""
        for t, nf, sc in _ADVISOR_TABLES
        for mem in _Q414_MEMS
    )
    + " ORDER BY table_name, mem_mb",
)
def q414_external_sort_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXTERNAL-SORT SPILL planner — the I/O bill for sorting each
    table under three per-task memory budgets: initial sorted runs
    n_runs = ceil(bytes / mem), merge passes = ceil(log_{_Q414_FANIN}
    n_runs) (Spark's UnsafeExternalSorter merges spill files with a
    bounded fan-in), and io_bytes = data × (1 + 2·passes) — each
    merge pass rereads and rewrites everything. The planner makes
    the memory-vs-I/O tradeoff explicit: the q321 byte estimates
    that fit 64 MB sort in memory cost zero extra I/O, while a
    table 100× the budget pays one full extra read+write — the
    number that justifies `spark.memory.fraction` bumps or
    pre-partitioning before a global sort (q387's range layout).
    Completes the sizing kit: q321 partition counts, q378 agg
    strategy, q388 join strategy, q389 skew splits, q414 sort
    spills.

    Scale: reuses q321's one-aggregate-per-table width measurement;
    the planning table is |tables|×|budgets| literal arithmetic.
    ln-ratio log is safe here: ceil(ln n/ln 64) flips only when
    n_runs crosses an exact power of 64 — unreachable from the
    ceil'd integer run counts these inputs produce.
    """
    import math

    outs = []
    for t, n_fixed, str_cols in _ADVISOR_TABLES:
        df = load(spark, sf_dir, t)
        base = df.agg(_table_bytes_est(n_fixed, str_cols).alias("est_bytes"))
        for mem in _Q414_MEMS:
            runs = F.ceil(
                F.col("est_bytes").cast("double") / (mem * 1048576.0)
            ).cast("long")
            passes = F.when(runs <= 1, F.lit(0).cast("long")).otherwise(
                F.ceil(
                    F.log(runs.cast("double")) / math.log(_Q414_FANIN)
                ).cast("long")
            )
            outs.append(
                base.select(
                    F.lit(t).alias("table_name"),
                    "est_bytes",
                    F.lit(mem).cast("long").alias("mem_mb"),
                    runs.alias("n_runs"),
                    passes.alias("merge_passes"),
                    (F.col("est_bytes") * (1 + 2 * passes)).alias(
                        "io_bytes"
                    ),
                )
            )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("table_name", "mem_mb")


_Q415_NPART = 200        # initial shuffle partitions being coalesced
_Q415_ADVISORY = 8192    # advisoryPartitionSizeInBytes, fixture-scaled


@register(
    "q415_aqe_coalesce_replay",
    oracle=f"""
    WITH RECURSIVE rw AS (
        SELECT CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                   1, 8) AS UBIGINT) % {_Q415_NPART} AS BIGINT) AS pid,
               32 + 8 + length(event_type) + length(props) AS rb
        FROM events
    ),
    parts AS (
        SELECT g.pid AS idx, CAST(coalesce(p.b, 0) AS BIGINT) AS bytes
        FROM (SELECT unnest(range(0, {_Q415_NPART})) AS pid) g
        LEFT JOIN (SELECT pid, sum(rb) AS b FROM rw GROUP BY pid) p
               ON p.pid = g.pid
    ),
    walk AS (
        SELECT CAST(0 AS BIGINT) AS idx, CAST(1 AS BIGINT) AS grp,
               bytes AS gb
        FROM parts WHERE idx = 0
        UNION ALL
        SELECT p.idx,
               CASE WHEN w.gb + p.bytes > {_Q415_ADVISORY}
                    THEN w.grp + 1 ELSE w.grp END,
               CASE WHEN w.gb + p.bytes > {_Q415_ADVISORY}
                    THEN p.bytes ELSE w.gb + p.bytes END
        FROM walk w JOIN parts p ON p.idx = w.idx + 1
    ),
    groups AS (
        SELECT grp AS group_id,
               CAST(count(*) AS BIGINT) AS n_parts,
               CAST(max(gb) AS BIGINT) AS group_bytes
        FROM walk GROUP BY grp
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n_groups,
               CAST({_Q415_NPART} AS BIGINT) AS n_initial
        FROM groups
    )
    SELECT g.group_id, g.n_parts, g.group_bytes,
           round(100.0 * g.group_bytes / {_Q415_ADVISORY}, 2) AS fill_pct,
           tot.n_groups, tot.n_initial
    FROM groups g CROSS JOIN tot
    ORDER BY group_id
    """,
)
def q415_aqe_coalesce_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQE COALESCE-PARTITIONS replay — the shrink-side twin of
    q389's skew split, simulating `CoalesceShufflePartitions`: walk
    the {_Q415_NPART} post-shuffle partitions IN ORDER and greedily
    pack consecutive ones into reader groups, starting a new group
    exactly when adding the next partition would exceed
    advisoryPartitionSizeInBytes (an oversized partition forms its
    own group; empty partitions merge for free — why AQE makes
    over-partitioning cheap and under-partitioning not). Output is
    the coalesce schedule: {_Q415_NPART} map outputs collapse to a
    handful of right-sized reader tasks, the exact mechanism that
    lets `spark.sql.shuffle.partitions` stay high as a ceiling.

    The walk is inherently sequential but PARTITION-grain (bounded
    by the shuffle partition count, never rows): the oracle runs it
    as a {_Q415_NPART}-step recursive CTE, the Spark side as a
    single-row array fold (collect the ≤{_Q415_NPART} sizes to one
    array, aggregate() with a struct accumulator) — both integer-
    exact, byte estimates from q321's width formula.

    Scale: one scan collapses map-side to partition-grain sizes;
    the fold's input array is |shuffle partitions| (hundreds to low
    thousands at 100 TB — driver-side AQE does literally this).
    """
    e = load(spark, sf_dir, "events")
    rw = e.select(
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16, 10,
            ).cast("long")
            % _Q415_NPART
        ).alias("pid"),
        (
            F.lit(32 + 8)
            + F.length("event_type").cast("long")
            + F.length("props").cast("long")
        ).alias("rb"),
    )
    sized = rw.groupBy("pid").agg(F.sum("rb").alias("b"))
    dense = (
        spark.range(_Q415_NPART)
        .select(F.col("id").alias("idx"))
        .join(sized, F.col("pid") == F.col("idx"), "left")
        .select("idx", F.coalesce("b", F.lit(0)).cast("long").alias("bytes"))
    )
    packed = dense.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("idx"), F.col("bytes")))
        ).alias("ps")
    ).select(
        F.explode(
            F.expr(
                f"""aggregate(
                    ps,
                    struct(CAST(0 AS BIGINT) AS grp,
                           CAST(0 AS BIGINT) AS gb,
                           CAST(array() AS array<struct<idx: bigint,
                                grp: bigint, gb: bigint>>) AS out),
                    (acc, p) -> CASE
                        WHEN acc.grp = 0
                             OR acc.gb + p.bytes > {_Q415_ADVISORY}
                        THEN struct(acc.grp + 1 AS grp,
                                    p.bytes AS gb,
                                    array_append(acc.out,
                                        struct(p.idx AS idx,
                                               acc.grp + 1 AS grp,
                                               p.bytes AS gb)) AS out)
                        ELSE struct(acc.grp AS grp,
                                    acc.gb + p.bytes AS gb,
                                    array_append(acc.out,
                                        struct(p.idx AS idx,
                                               acc.grp AS grp,
                                               acc.gb + p.bytes AS gb)) AS out)
                        END,
                    acc -> acc.out)"""
            )
        ).alias("w")
    ).select("w.idx", "w.grp", "w.gb")
    groups = packed.groupBy(F.col("grp").alias("group_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.max("gb").cast("long").alias("group_bytes"),
    )
    tot = groups.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.lit(_Q415_NPART).cast("long").alias("n_initial"),
    )
    return (
        groups.crossJoin(F.broadcast(tot))
        .select(
            "group_id",
            "n_parts",
            "group_bytes",
            F.round(100.0 * F.col("group_bytes") / _Q415_ADVISORY, 2).alias(
                "fill_pct"
            ),
            "n_groups",
            "n_initial",
        )
        .orderBy("group_id")
    )


_Q417_SALTS = (1, 2, 4, 8, 16)
_Q417_NPART = 32
_Q417_SKEW_OK = 1.5  # accept the smallest salt landing max/ideal below this


def _q417_block(s: int) -> str:
    return f"""
    SELECT CAST({s} AS BIGINT) AS salt,
           CAST(max(pb) AS BIGINT) AS max_task_bytes,
           CAST(sum(pb) AS BIGINT) AS total_bytes,
           round(CAST(max(pb) AS DOUBLE)
                 / (CAST(sum(pb) AS DOUBLE) / {_Q417_NPART}), 3) AS skew_x,
           CAST(25 * {s} AS BIGINT) AS dim_replicas
    FROM (
        SELECT CAST(CAST('0x' || substr(md5(
                   CAST(CASE WHEN user_id % 10 < 7 THEN 0
                        ELSE user_id % 25 END AS VARCHAR)
                   || ':' ||
                   CAST(CAST(CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                        1, 8) AS UBIGINT) % {s} AS BIGINT) AS VARCHAR)),
                   1, 8) AS UBIGINT) % {_Q417_NPART} AS BIGINT) AS pid,
               sum(32 + 8 + length(event_type) + length(props)) AS pb
        FROM events
        GROUP BY 1
    )"""


@register(
    "q417_salt_factor_advisor",
    oracle=f"""
    WITH sweep AS ({" UNION ALL ".join(_q417_block(s) for s in _Q417_SALTS)}),
    pick AS (
        SELECT coalesce(
            (SELECT min(salt) FROM sweep WHERE skew_x <= {_Q417_SKEW_OK}),
            (SELECT salt FROM sweep ORDER BY skew_x, salt LIMIT 1)
        ) AS chosen
    )
    SELECT sweep.*, pick.chosen AS chosen_salt
    FROM sweep CROSS JOIN pick
    ORDER BY salt
    """,
)
def q417_salt_factor_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SALT-FACTOR advisor — the missing decision in the skew kit:
    q105/q254 IMPLEMENT salted agg/join at a fixed fan-out, q389
    replays AQE's runtime split; this one CHOOSES the salt by
    measurement. For each candidate fan-out s ∈ {_Q417_SALTS}, the
    planted hot key (q254's 70%-on-one-key shape) is split into s
    md5 salt buckets, re-hashed into {_Q417_NPART} shuffle
    partitions, and priced: max task bytes, skew ratio vs ideal,
    and the dim-replication cost a salted JOIN pays (|dim|·s rows —
    the side effect that says don't over-salt). chosen_salt is the
    SMALLEST s whose skew ratio clears {_Q417_SKEW_OK} — bigger
    salts buy nothing but replication (when no salt clears the bar,
    the min-skew point is chosen). The sweep shows the real curve:
    skew halves per doubling while the hot key dominates, then
    REGRESSES at s=16 — more shards mean more chances two of them
    hash-collide into one of the 32 reducers — which is exactly why
    a measured sweep beats the folklore 'salt by 16'.

    Scale: each sweep point is one map-side keyed rollup (the
    (key, salt) grain is ≤ 25·s rows, partitions {_Q417_NPART}) —
    the sweep costs |salts| aggregates over the SAME scan,
    integer-exact end to end.
    """
    e = load(spark, sf_dir, "events")
    nk = F.when(F.col("user_id") % 10 < 7, F.lit(0)).otherwise(
        F.col("user_id") % 25
    )
    rb = (
        F.lit(32 + 8)
        + F.length("event_type").cast("long")
        + F.length("props").cast("long")
    )
    h32 = lambda c: F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")  # noqa: E731
    outs = []
    for s in _Q417_SALTS:
        salt_id = (h32(F.col("event_id").cast("string")) % s).cast("long")
        pid = (
            h32(F.concat(nk.cast("string"), F.lit(":"),
                         salt_id.cast("string")))
            % _Q417_NPART
        )
        per_part = e.select(pid.alias("pid"), rb.alias("rb")).groupBy(
            "pid"
        ).agg(F.sum("rb").alias("pb"))
        outs.append(
            per_part.agg(
                F.lit(s).cast("long").alias("salt"),
                F.max("pb").cast("long").alias("max_task_bytes"),
                F.sum("pb").cast("long").alias("total_bytes"),
                F.round(
                    F.max("pb").cast("double")
                    / (F.sum("pb").cast("double") / _Q417_NPART),
                    3,
                ).alias("skew_x"),
                F.lit(25 * s).cast("long").alias("dim_replicas"),
            )
        )
    sweep = outs[0]
    for o in outs[1:]:
        sweep = sweep.unionByName(o)
    ok = sweep.filter(F.col("skew_x") <= _Q417_SKEW_OK).agg(
        F.min("salt").alias("ok_salt")
    )
    fallback = (
        sweep.orderBy("skew_x", "salt").limit(1)
        .select(F.col("salt").alias("fb_salt"))
    )
    pick = ok.crossJoin(F.broadcast(fallback)).select(
        F.coalesce("ok_salt", "fb_salt").alias("chosen_salt")
    )
    return (
        sweep.crossJoin(F.broadcast(pick))
        .select(
            "salt", "max_task_bytes", "total_bytes", "skew_x",
            "dim_replicas", "chosen_salt",
        )
        .orderBy("salt")
    )


# ---- q428: Bradley-Terry preference strengths (2 MM iterations) --------
_BT_K = 1_000_000  # micro fixed-point for strengths


@register(
    "q428_bradley_terry_preferences",
    oracle=f"""
    WITH ut AS (
        SELECT user_id, event_type AS t, count(*) AS n,
               sum(CAST(round(value * 100) AS HUGEINT)) AS s
        FROM events WHERE value IS NOT NULL
        GROUP BY user_id, event_type
    ),
    duels AS (
        SELECT CASE WHEN a.s * b.n > b.s * a.n THEN a.t ELSE b.t END AS w,
               CASE WHEN a.s * b.n > b.s * a.n THEN b.t ELSE a.t END AS l
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.t < b.t
        WHERE a.s * b.n <> b.s * a.n
    ),
    m AS (SELECT w AS i, l AS j, CAST(count(*) AS BIGINT) AS nij
          FROM duels GROUP BY w, l),
    cm AS (
        SELECT coalesce(a.i, b.j) AS i, coalesce(a.j, b.i) AS j,
               coalesce(a.nij, 0) + coalesce(b.nij, 0) AS c
        FROM m a FULL JOIN m b ON a.i = b.j AND a.j = b.i
    ),
    ty AS (
        SELECT i AS t, CAST(sum(c) AS BIGINT) AS comps FROM cm GROUP BY i
    ),
    wins AS (
        SELECT i AS t, CAST(sum(nij) AS BIGINT) AS w FROM m GROUP BY i
    ),
    base AS (
        SELECT ty.t, coalesce(wins.w, 0) AS w, ty.comps,
               CAST(round(1000000.0 * 2 * coalesce(wins.w, 0) / ty.comps)
                    AS BIGINT) AS w1raw
        FROM ty LEFT JOIN wins USING (t)
    ),
    k AS (SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(w1raw) AS BIGINT) AS s1 FROM base),
    w1 AS (
        SELECT t, w, comps,
               CAST(round(1000000.0 * k.k * w1raw / k.s1) AS BIGINT)
                   AS w1m
        FROM base, k
    ),
    terms AS (
        SELECT cm.i AS t,
               CAST(round(1000000000000.0 * cm.c / (wa.w1m + wb.w1m))
                    AS BIGINT) AS term
        FROM cm JOIN w1 wa ON wa.t = cm.i JOIN w1 wb ON wb.t = cm.j
    ),
    d2 AS (SELECT t, CAST(sum(term) AS BIGINT) AS denom FROM terms
           GROUP BY t),
    r2 AS (
        SELECT w1.t, w1.w, w1.comps, w1.w1m,
               CAST(round(1000000000000.0 * w1.w / d2.denom) AS BIGINT)
                   AS w2raw
        FROM w1 JOIN d2 USING (t)
    ),
    k2 AS (SELECT CAST(sum(w2raw) AS BIGINT) AS s2 FROM r2)
    SELECT CAST(row_number() OVER (ORDER BY
                round(1000000.0 * k.k * w2raw / k2.s2) DESC, r2.t)
                AS BIGINT) AS pref_rank,
           r2.t AS event_type,
           r2.w AS n_wins, r2.comps AS n_comparisons,
           r2.w1m AS w1_micro,
           CAST(round(1000000.0 * k.k * w2raw / k2.s2) AS BIGINT)
               AS w2_micro
    FROM r2, k, k2
    ORDER BY pref_rank
    """,
)
def q428_bradley_terry_preferences(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BRADLEY-TERRY preference-strength fit — the pairwise-
    preference primitive under every reward model / RLHF data
    pipeline and ranking eval (Chatbot-Arena-style): users 'duel'
    event types (i beats j for a user when its mean value is higher
    — compared as the exact integer cross-product s_i·n_j > s_j·n_i
    in centi-units, no division), duels aggregate to the |types|²
    wins matrix, and TWO minorization-maximization iterations
    (Hunter 2004: w_i ← W_i / Σ_j c_ij/(w_i+w_j)) fit the
    strengths. Every cross-row sum is an integer sum: strengths are
    micro fixed-point between iterations, each MM term is
    pico-quantized before the denominator sum, and each iteration
    re-normalizes to Σw = K on integer totals — so both engines
    produce bit-identical strengths and the final ranking. Ties
    (exact equal means) are excluded as in the standard model.

    Scale: one pass to (user × type) cells, one self-equi-join on
    user at that grain (|users|·|types|, never events²), then
    everything lives at the |types|² ≤ 25-cell matrix — pure
    bounded arithmetic, the q380/q391 quantization discipline.
    """
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    ut = e.groupBy("user_id", F.col("event_type").alias("t")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("decimal(38,0)")).alias(
            "s"
        ),
    )
    a = ut.select(
        "user_id",
        F.col("t").alias("ta"),
        F.col("n").alias("na"),
        F.col("s").alias("sa"),
    )
    b = ut.select(
        "user_id",
        F.col("t").alias("tb"),
        F.col("n").alias("nb"),
        F.col("s").alias("sb"),
    )
    duels = (
        a.join(b, ["user_id"])
        .filter(F.col("ta") < F.col("tb"))
        .filter(F.col("sa") * F.col("nb") != F.col("sb") * F.col("na"))
        .select(
            F.when(
                F.col("sa") * F.col("nb") > F.col("sb") * F.col("na"),
                F.col("ta"),
            )
            .otherwise(F.col("tb"))
            .alias("w"),
            F.when(
                F.col("sa") * F.col("nb") > F.col("sb") * F.col("na"),
                F.col("tb"),
            )
            .otherwise(F.col("ta"))
            .alias("l"),
        )
    )
    m = duels.groupBy(F.col("w").alias("i"), F.col("l").alias("j")).agg(
        F.count(F.lit(1)).cast("long").alias("nij")
    )
    mr = m.select(
        F.col("j").alias("i"), F.col("i").alias("j"),
        F.col("nij").alias("nji"),
    )
    cm = (
        m.join(mr, ["i", "j"], "full")
        .select(
            F.coalesce(F.col("i"), F.col("i")).alias("i"),
            "j",
            (
                F.coalesce(F.col("nij"), F.lit(0))
                + F.coalesce(F.col("nji"), F.lit(0))
            ).alias("c"),
        )
    )
    ty = cm.groupBy(F.col("i").alias("t")).agg(
        F.sum("c").cast("long").alias("comps")
    )
    wins = m.groupBy(F.col("i").alias("t")).agg(
        F.sum("nij").cast("long").alias("w")
    )
    base = ty.join(wins, "t", "left").select(
        "t",
        F.coalesce(F.col("w"), F.lit(0)).alias("w"),
        "comps",
        F.expr(
            "CAST(round(1000000.0 * 2 * coalesce(w, 0) / comps) AS BIGINT)"
        ).alias("w1raw"),
    )
    k = base.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("w1raw").cast("long").alias("s1"),
    )
    w1 = base.crossJoin(F.broadcast(k)).select(
        "t",
        "w",
        "comps",
        F.expr("CAST(round(1000000.0 * k * w1raw / s1) AS BIGINT)").alias(
            "w1m"
        ),
        "k",
    )
    wa = w1.select(F.col("t").alias("i"), F.col("w1m").alias("w1a"))
    wb = w1.select(F.col("t").alias("j"), F.col("w1m").alias("w1b"))
    terms = (
        cm.join(F.broadcast(wa), "i")
        .join(F.broadcast(wb), "j")
        .select(
            F.col("i").alias("t"),
            F.expr(
                "CAST(round(1000000000000.0 * c / (w1a + w1b)) AS BIGINT)"
            ).alias("term"),
        )
    )
    d2 = terms.groupBy("t").agg(F.sum("term").cast("long").alias("denom"))
    r2 = w1.join(d2, "t").select(
        "t",
        "w",
        "comps",
        "w1m",
        "k",
        F.expr(
            "CAST(round(1000000000000.0 * w / denom) AS BIGINT)"
        ).alias("w2raw"),
    )
    k2 = r2.agg(F.sum("w2raw").cast("long").alias("s2"))
    w2m = F.expr("CAST(round(1000000.0 * k * w2raw / s2) AS BIGINT)")
    return (
        r2.crossJoin(F.broadcast(k2))
        .select(
            F.row_number()
            .over(Window.orderBy(w2m.desc(), F.col("t")))
            .cast("long")
            .alias("pref_rank"),
            F.col("t").alias("event_type"),
            F.col("w").alias("n_wins"),
            F.col("comps").alias("n_comparisons"),
            F.col("w1m").alias("w1_micro"),
            w2m.alias("w2_micro"),
        )
        .orderBy("pref_rank")
    )


# ---- q433: partition-layout advisor (workload-priced pruning) ----------
# Layouts × workload cells are generated ONCE here; each cell knows
# whether the layout's partition key can prune the predicate and, if
# so, the key-granular scan condition (partition grain: a partition
# is read iff its key COULD contain matching rows).
_Q433_TS1 = "TIMESTAMP '2024-01-08 00:00:00'"
_Q433_TS2 = "TIMESTAMP '2024-01-15 00:00:00'"
_Q433_TS3 = "TIMESTAMP '2024-01-10 00:00:00'"
_Q433_TS4 = "TIMESTAMP '2024-01-13 00:00:00'"

_Q433_LAYOUTS = {
    "by_day": "CAST(ts AS DATE)",
    "by_type": "event_type",
    "by_user64": "user_id % 64",
}
_Q433_WORKLOAD = {
    "day_range_7d": f"ts >= {_Q433_TS1} AND ts < {_Q433_TS2}",
    "type_point": "event_type = 'purchase'",
    "user_point": "user_id = 42",
    "type_in_3d": "event_type IN ('click', 'view') AND "
                  f"ts >= {_Q433_TS3} AND ts < {_Q433_TS4}",
}
# scan condition per (layout, workload): None = no pruning possible
# (every partition read). Day ranges sit on midnight boundaries, so
# day-partition pruning is exact for them.
_Q433_SCAN = {
    ("by_day", "day_range_7d"):
        f"CAST(ts AS DATE) >= CAST({_Q433_TS1} AS DATE) AND "
        f"CAST(ts AS DATE) < CAST({_Q433_TS2} AS DATE)",
    ("by_day", "type_in_3d"):
        f"CAST(ts AS DATE) >= CAST({_Q433_TS3} AS DATE) AND "
        f"CAST(ts AS DATE) < CAST({_Q433_TS4} AS DATE)",
    ("by_type", "type_point"): "event_type = 'purchase'",
    ("by_type", "type_in_3d"): "event_type IN ('click', 'view')",
    ("by_user64", "user_point"): "user_id % 64 = 42 % 64",
}


def _q433_cells():
    for layout, key in _Q433_LAYOUTS.items():
        for wname, pred in _Q433_WORKLOAD.items():
            scan = _Q433_SCAN.get((layout, wname))
            yield layout, key, wname, pred, scan


def _q433_agg_exprs():
    """The ONE-scan statistics block both the advisor (q433) and its
    executed closure (q442) price layouts from: total rows, per-layout
    distinct-key counts, per-workload match counts, and per-prunable-
    cell (rows-under-scan-condition, partitions-under-scan-condition)."""
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for layout, key in _Q433_LAYOUTS.items():
        aggs.append(
            F.countDistinct(F.expr(key)).cast("long").alias(f"np_{layout}")
        )
    for wname, pred in _Q433_WORKLOAD.items():
        aggs.append(
            F.sum(F.expr(f"CASE WHEN {pred} THEN 1 ELSE 0 END"))
            .cast("long")
            .alias(f"m_{wname}")
        )
    for layout, key, wname, pred, scan in _q433_cells():
        if scan is not None:
            aggs.append(
                F.sum(F.expr(f"CASE WHEN {scan} THEN 1 ELSE 0 END"))
                .cast("long")
                .alias(f"s_{layout}_{wname}")
            )
            aggs.append(
                F.countDistinct(
                    F.expr(f"CASE WHEN {scan} THEN {key} END")
                )
                .cast("long")
                .alias(f"p_{layout}_{wname}")
            )
    return aggs


def _q433_oracle() -> str:
    aggs = ["CAST(count(*) AS BIGINT) AS n_rows"]
    for layout, key in _Q433_LAYOUTS.items():
        aggs.append(
            f"CAST(count(DISTINCT {key}) AS BIGINT) AS np_{layout}"
        )
    for wname, pred in _Q433_WORKLOAD.items():
        aggs.append(
            f"CAST(count(*) FILTER ({pred}) AS BIGINT) AS m_{wname}"
        )
    for layout, key, wname, pred, scan in _q433_cells():
        if scan is not None:
            aggs.append(
                f"CAST(count(*) FILTER ({scan}) AS BIGINT)"
                f" AS s_{layout}_{wname}"
            )
            aggs.append(
                f"CAST(count(DISTINCT CASE WHEN {scan} THEN {key} END)"
                f" AS BIGINT) AS p_{layout}_{wname}"
            )
    rows = []
    for layout, key, wname, pred, scan in _q433_cells():
        scanned = f"s_{layout}_{wname}" if scan else "n_rows"
        parts = f"p_{layout}_{wname}" if scan else f"np_{layout}"
        rows.append(
            f"SELECT '{layout}' AS layout, '{wname}' AS workload,"
            f" np_{layout} AS n_partitions, {parts} AS partitions_read,"
            f" {scanned} AS rows_scanned, m_{wname} AS rows_matching"
            " FROM stats"
        )
    body = " UNION ALL ".join(rows)
    return f"""
    WITH stats AS (SELECT {', '.join(aggs)} FROM events),
    cells AS ({body})
    SELECT layout, workload, n_partitions, partitions_read,
           rows_scanned, rows_matching,
           round(CAST(rows_scanned AS DOUBLE)
                 / greatest(rows_matching, 1), 2) AS read_amp_x,
           rank() OVER (PARTITION BY workload
                        ORDER BY rows_scanned, layout) = 1
               AS best_for_workload
    FROM cells
    ORDER BY layout, workload
    """


@register("q433_partition_layout_advisor", oracle=_q433_oracle())
def q433_partition_layout_advisor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PARTITION-LAYOUT advisor — the physical-design decision every
    100 TB table gets exactly once, priced from data instead of
    folklore: three candidate partition keys (day, event_type,
    64-bucket user hash) against a four-predicate workload (7-day
    range, type point, user point, type+3-day compound), with EXACT
    partition-pruning arithmetic: a partition is read iff its key
    could contain matching rows, so rows_scanned is the true
    post-pruning scan cost, partitions_read the file-listing cost,
    and read_amp_x (scanned / matching) the wasted-IO multiplier a
    layout leaves on each query shape. best_for_workload marks the
    per-predicate winner (rank by scan cost, deterministic
    tie-break) — the table showing WHY multi-tenant tables end up
    day-partitioned (the day layout wins range scans outright and
    loses point lookups only by the pruning it can't do). Day-range
    predicates sit on midnight boundaries so day-grain pruning is
    exact; a mid-day boundary would make the day layout scan one
    partial partition — the fencepost the advisor's scan conditions
    encode at PARTITION grain, not row grain.

    Scale: ONE scan computes every cell (conditional counts +
    conditional distinct keys — 3 layouts × 4 predicates, generated
    once and fed to both engines); the advisor output is 12 rows of
    integer arithmetic. At 100 TB the same statistics come from the
    partition manifest for free.
    """
    e = load(spark, sf_dir, "events")
    stats = e.agg(*_q433_agg_exprs())
    cells = []
    for layout, key, wname, pred, scan in _q433_cells():
        scanned = f"s_{layout}_{wname}" if scan else "n_rows"
        parts = f"p_{layout}_{wname}" if scan else f"np_{layout}"
        cells.append(
            F.struct(
                F.lit(layout).alias("layout"),
                F.lit(wname).alias("workload"),
                F.col(f"np_{layout}").alias("n_partitions"),
                F.col(parts).alias("partitions_read"),
                F.col(scanned).alias("rows_scanned"),
                F.col(f"m_{wname}").alias("rows_matching"),
            )
        )
    w = Window.partitionBy("workload").orderBy("rows_scanned", "layout")
    return (
        stats.select(F.explode(F.array(*cells)).alias("c"))
        .select("c.*")
        .select(
            "layout",
            "workload",
            "n_partitions",
            "partitions_read",
            "rows_scanned",
            "rows_matching",
            F.round(
                F.col("rows_scanned").cast("double")
                / F.greatest(F.col("rows_matching"), F.lit(1)),
                2,
            ).alias("read_amp_x"),
            (F.rank().over(w) == 1).alias("best_for_workload"),
        )
        .orderBy("layout", "workload")
    )


# ---- q434: Python Data Source scan, hash-gated -------------------------
_Q434_ROWS = 5000
_Q434_LO, _Q434_HI = 500, 4000


@register(
    "q434_python_datasource_scan",
    oracle=f"""
    WITH gen AS (
        SELECT i AS id,
               CAST(CAST('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 8)
                         AS UBIGINT) % 1000 AS BIGINT) AS v,
               'cat' || CAST(CAST('0x' || substr(md5(CAST(i AS VARCHAR)),
                                                 1, 8)
                                  AS UBIGINT) % 7 AS VARCHAR) AS cat
        FROM (SELECT unnest(range(0, {_Q434_ROWS})) AS i)
    )
    SELECT cat,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(v) AS BIGINT) AS sum_v,
           CAST(min(id) AS BIGINT) AS min_id,
           CAST(max(id) AS BIGINT) AS max_id
    FROM gen
    WHERE id >= {_Q434_LO} AND id < {_Q434_HI}
    GROUP BY cat
    ORDER BY cat
    """,
)
def q434_python_datasource_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PYTHON DATA SOURCE scan, hash-gated — Spark 4's
    `pyspark.sql.datasource` surface exercised end-to-end: a custom
    source (sources/pygen.py) shards a deterministic md5-derived
    row generator into InputPartitions, CONSUMES the id-range
    predicate in pushFilters (so fully-excluded shards are never
    scheduled — partition pruning inside the Python source, and the
    post-scan Filter node carries only the residual isnotnull), and
    the scan's aggregate hash-matches DuckDB replaying the same
    arithmetic over range(). This is the Spark-native shape for
    every imperative connector the reference ships as plugins
    (WFS pagination, REST fetchers): pages become partitions read
    in parallel on executors, server-evaluable predicates move into
    pushFilters, and the rest of the engine composes unchanged.

    Scale: the source declares {_Q434_ROWS // 8}-row shards here; a
    real deployment sizes shards to the backend's page size and
    gets executor-parallel ingest with predicate pruning for free.
    The only shuffle is the |cats|-grain aggregate.
    """
    from g_etl_spark.sources import pygen

    pygen.register(spark)
    df = (
        spark.read.format("g_etl_gen")
        .option("rows", _Q434_ROWS)
        .option("parts", 8)
        .load()
    )
    return (
        df.filter((F.col("id") >= _Q434_LO) & (F.col("id") < _Q434_HI))
        .groupBy("cat")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("v").cast("long").alias("sum_v"),
            F.min("id").cast("long").alias("min_id"),
            F.max("id").cast("long").alias("max_id"),
        )
        .orderBy("cat")
    )


# ---- q435: Python Data Source JSONL sink roundtrip ---------------------
@register(
    "q435_python_datasource_sink",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT))
                AS BIGINT) AS price_cents
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q435_python_datasource_sink(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PYTHON DATA SOURCE SINK roundtrip, hash-gated — the writer
    half of q434's surface: a filtered lineitem slice goes through
    the custom `g_etl_jsonl` sink (sources/pygen.JsonlWriter —
    executor-parallel shard files, task-unique names, a commit-time
    manifest published only from the successful attempt's commit
    messages: Spark's own commit-protocol shape in miniature), is
    read BACK with Spark's JSON reader against the manifest's shard
    list, and the q01-style rollup over the roundtripped rows must
    hash-match DuckDB over the ORIGINAL parquet — any row lost,
    duplicated, or mangled by the sink (or a torn shard surviving
    abort) breaks the gate. Price survives JSON exactly via
    centi-unit integers.

    Scale: the sink is embarrassingly parallel (one file per task,
    no coordination until the O(|tasks|) commit); the roundtrip
    read is a plain distributed JSON scan. The gate runs the full
    write-commit-read cycle every time — it IS the sink test.
    """
    import json as _json
    import shutil as _shutil
    import tempfile as _tempfile

    from g_etl_spark.sources import pygen

    pygen.register_sink(spark)
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("date")
    )
    out_dir = _tempfile.mkdtemp(prefix="g_etl_jsonl_sink_")
    try:
        (
            li.select(
                "l_orderkey",
                "l_linenumber",
                "l_returnflag",
                "l_linestatus",
                F.round(F.col("l_extendedprice") * 100)
                .cast("long")
                .alias("price_cents"),
            )
            .write.format("g_etl_jsonl")
            .option("path", out_dir)
            .mode("append")
            .save()
        )
        with open(f"{out_dir}/_MANIFEST.json") as f:
            manifest = _json.load(f)
        back = spark.read.schema(
            "l_orderkey long, l_linenumber long, l_returnflag string,"
            " l_linestatus string, price_cents long"
        ).json(manifest["shards"])
        res = (
            back.groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("price_cents").cast("long").alias("price_cents"),
            )
            .orderBy("l_returnflag", "l_linestatus")
        )
        return res.localCheckpoint(eager=True)
    finally:
        _shutil.rmtree(out_dir, ignore_errors=True)


# ---- q438: differential-privacy release-budget accountant --------------
_Q438_EPS_TOTAL_MICRO = 1_000_000   # ε = 1.0 across the workload
_Q438_CLIP = 500                    # value clip for the sum release
# (release, L1 sensitivity of one event row). The sum release works
# in CENTI-units end-to-end (value is 2-dp): the clip is two-sided
# ([0, 500] — a one-sided clip would leave the sensitivity unbounded
# below), its sensitivity is 500·100 cents, and the per-cell sums
# are exact integer cents, so min_cell can never flake on a
# partial-agg merge-order rounding boundary (r12 review).
_Q438_RELEASES = (
    ("count_by_type", 1),
    ("count_by_day", 1),
    ("clipped_sum_by_type", _Q438_CLIP * 100),
)


@register(
    "q438_dp_budget_accountant",
    oracle=f"""
    WITH cells AS (
        SELECT 'count_by_type' AS release,
               CAST(min(c) AS BIGINT) AS min_cell
        FROM (SELECT count(*) AS c FROM events GROUP BY event_type)
        UNION ALL
        SELECT 'count_by_day',
               CAST(min(c) AS BIGINT)
        FROM (SELECT count(*) AS c FROM events GROUP BY CAST(ts AS DATE))
        UNION ALL
        SELECT 'clipped_sum_by_type',
               CAST(min(s) AS BIGINT)
        FROM (SELECT CAST(sum(CAST(round(greatest(least(
                              coalesce(value, 0), {_Q438_CLIP}), 0) * 100)
                              AS HUGEINT)) AS BIGINT) AS s
              FROM events GROUP BY event_type)
    ),
    sens AS (
        SELECT * FROM (VALUES
            ('count_by_type', CAST(1 AS BIGINT)),
            ('count_by_day', CAST(1 AS BIGINT)),
            ('clipped_sum_by_type', CAST({_Q438_CLIP} * 100 AS BIGINT))
        ) AS t(release, sensitivity)
    ),
    tot AS (SELECT CAST(sum(sensitivity) AS BIGINT) AS st,
                   CAST(count(*) AS BIGINT) AS k FROM sens),
    pol AS (
        -- bfac = the EXACT Laplace scale b = Δ/ε_i in raw units
        -- (ε_total = 1.0 exactly): equal split → Δ·k, weighted →
        -- Σ Δ (constant — the policy's defining equalization, held
        -- exactly instead of to the floored-ε display precision)
        SELECT s.release, s.sensitivity, 'equal_split' AS policy,
               CAST({_Q438_EPS_TOTAL_MICRO} // tot.k AS BIGINT)
                   AS eps_micro,
               CAST(s.sensitivity * tot.k AS BIGINT) AS bfac
        FROM sens s, tot
        UNION ALL
        SELECT s.release, s.sensitivity, 'sensitivity_weighted',
               CAST({_Q438_EPS_TOTAL_MICRO} * s.sensitivity // tot.st
                    AS BIGINT),
               tot.st
        FROM sens s, tot
    )
    SELECT p.release, p.policy, p.sensitivity, p.eps_micro,
           CAST(p.bfac * 1000000 AS BIGINT) AS lap_scale_micro,
           c.min_cell,
           round(100.0 * p.bfac / c.min_cell, 2) AS worst_rel_err_pct,
           100.0 * p.bfac / c.min_cell <= 10.0 AS usable
    FROM pol p JOIN cells c USING (release)
    ORDER BY p.release, p.policy
    """,
)
def q438_dp_budget_accountant(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DIFFERENTIAL-PRIVACY budget accountant — the pre-release
    arithmetic a corpus-statistics endpoint runs BEFORE adding
    noise: a workload of three releases over events (counts by
    type, counts by day, value sums clipped at {_Q438_CLIP} — the
    clip IS the sum's L1 sensitivity) under sequential composition
    of a total ε = 1, split two ways (equal, and
    sensitivity-weighted — which equalizes the Laplace scales).
    For each (release, policy): the Laplace scale b = Δ/ε
    (micro-pinned), the workload's SMALLEST true cell (from data —
    the cell noise hurts most), the worst-case expected relative
    error b/min_cell, and the ≤10% usable verdict. This is the
    deterministic half of DP — the noise itself is sampled at
    serving time; what the engine owns is the sensitivity/budget
    algebra and the utility triage, which is exactly what this row
    pins. Completes the governance family: q393 audits
    k-anonymity/t-closeness of microdata, this prices the noisy-
    aggregate alternative.

    Scale: three bounded-grain rollups (|types|, |days|) reduced to
    min-cells, then pure arithmetic on a 3×2 literal workload.
    """
    e = load(spark, sf_dir, "events")
    c1 = (
        e.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.min("c").cast("long").alias("min_cell"))
        .select(F.lit("count_by_type").alias("release"), "min_cell")
    )
    c2 = (
        e.groupBy(F.col("ts").cast("date"))
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.min("c").cast("long").alias("min_cell"))
        .select(F.lit("count_by_day").alias("release"), "min_cell")
    )
    c3 = (
        e.groupBy("event_type")
        .agg(
            F.sum(
                F.round(
                    F.greatest(
                        F.least(
                            F.coalesce(F.col("value"), F.lit(0.0)),
                            F.lit(float(_Q438_CLIP)),
                        ),
                        F.lit(0.0),
                    )
                    * 100
                ).cast("decimal(38,0)")
            )
            .cast("long")
            .alias("s")
        )
        .agg(F.min("s").cast("long").alias("min_cell"))
        .select(
            F.lit("clipped_sum_by_type").alias("release"), "min_cell"
        )
    )
    cells = c1.unionByName(c2).unionByName(c3)
    sens = spark.createDataFrame(
        list(_Q438_RELEASES), "release string, sensitivity long"
    )
    st = sum(s for _, s in _Q438_RELEASES)
    k = len(_Q438_RELEASES)
    pol = sens.selectExpr(
        "release",
        "sensitivity",
        "'equal_split' AS policy",
        f"CAST({_Q438_EPS_TOTAL_MICRO} div {k} AS BIGINT) AS eps_micro",
        f"CAST(sensitivity * {k} AS BIGINT) AS bfac",
    ).unionByName(
        sens.selectExpr(
            "release",
            "sensitivity",
            "'sensitivity_weighted' AS policy",
            f"CAST({_Q438_EPS_TOTAL_MICRO} * sensitivity div {st}"
            " AS BIGINT) AS eps_micro",
            f"CAST({st} AS BIGINT) AS bfac",
        )
    )
    return (
        pol.join(F.broadcast(cells), "release")
        .select(
            "release",
            "policy",
            "sensitivity",
            "eps_micro",
            (F.col("bfac") * 1000000).cast("long").alias(
                "lap_scale_micro"
            ),
            "min_cell",
            F.round(100.0 * F.col("bfac") / F.col("min_cell"), 2).alias(
                "worst_rel_err_pct"
            ),
            (100.0 * F.col("bfac") / F.col("min_cell") <= 10.0).alias(
                "usable"
            ),
        )
        .orderBy("release", "policy")
    )


# ---- q440: group-relative advantage normalization (GRPO shape) ---------
@register(
    "q440_group_relative_advantage",
    oracle="""
    WITH r AS (
        SELECT event_id, user_id,
               CAST(round(value * 100) AS BIGINT) AS vc
        FROM events WHERE value IS NOT NULL
    ),
    g AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(vc) AS HUGEINT) AS s,
               CAST(sum(CAST(vc AS HUGEINT) * vc) AS HUGEINT) AS ss
        FROM r GROUP BY user_id
    ),
    stats AS (
        SELECT user_id, n,
               s / (100.0 * n) AS mean,
               ss / 10000.0 / n - (s / (100.0 * n)) * (s / (100.0 * n))
                   AS var
        FROM g WHERE n >= 2
    ),
    adv AS (
        SELECT r.event_id, r.user_id, r.vc, st.n,
               CAST(round(1000000 * st.mean) AS BIGINT) AS mean_micro,
               CAST(round(1000000 * sqrt(st.var)) AS BIGINT) AS std_micro,
               CAST(round(1000 * (r.vc / 100.0 - st.mean)
                          / sqrt(st.var)) AS BIGINT) AS advantage_milli
        FROM r JOIN stats st USING (user_id)
        WHERE st.var > 0
    )
    SELECT event_id, user_id, vc AS value_centi, n AS group_n,
           mean_micro, std_micro, advantage_milli
    FROM adv
    ORDER BY abs(advantage_milli) DESC, event_id
    LIMIT 20
    """,
)
def q440_group_relative_advantage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GROUP-RELATIVE advantage normalization — the GRPO/RLOO reward
    shape: each sample's reward is z-scored WITHIN ITS PROMPT GROUP
    (user here), advantage = (r − mean_g)/std_g, killing the
    per-prompt reward offset without a learned value baseline. The
    registry shape matters at corpus scale: one combining pass to
    |groups| exact integer moments (centi-unit sums, HUGEINT/decimal
    squares — the overflow discipline), one broadcast-eligible join
    back, map-side arithmetic — no window over the corpus, no
    second scan. Moments are exact integers so mean/var/z are
    bit-identical cross-engine (milli-pinned); degenerate groups
    (n < 2 or zero variance) are excluded by the same integer-exact
    predicate in both engines. Emits the 20 largest |advantages| —
    the outlier samples a reward-hacking review reads first.

    Completes the preference family: q428 fits inter-ITEM strengths
    from duels; this normalizes intra-GROUP rewards for the policy
    gradient.
    """
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    r = e.select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    g = r.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("vc").cast("decimal(38,0)")).alias("s"),
        F.sum(
            F.col("vc").cast("decimal(38,0)") * F.col("vc")
        ).alias("ss"),
    )
    mean = F.col("s") / (100.0 * F.col("n"))
    stats = g.filter(F.col("n") >= 2).select(
        "user_id",
        "n",
        mean.alias("mean"),
        (F.col("ss") / 10000.0 / F.col("n") - mean * mean).alias("var"),
    )
    return (
        r.join(stats, "user_id")
        .filter(F.col("var") > 0)
        .select(
            "event_id",
            "user_id",
            F.col("vc").alias("value_centi"),
            F.col("n").alias("group_n"),
            F.round(1000000 * F.col("mean")).cast("long").alias(
                "mean_micro"
            ),
            F.round(1000000 * F.sqrt(F.col("var"))).cast("long").alias(
                "std_micro"
            ),
            F.round(
                1000
                * (F.col("vc") / 100.0 - F.col("mean"))
                / F.sqrt(F.col("var"))
            )
            .cast("long")
            .alias("advantage_milli"),
        )
        .orderBy(F.abs(F.col("advantage_milli")).desc(), "event_id")
        .limit(20)
    )


# ---- q442: partition-layout advisor choice EXECUTED ---------------------
# The q422 pattern applied to physical design (r12 verdict item #3):
# q433 PRICES three candidate partition layouts; this query EXECUTES
# the pick — writes the advisor-chosen layout to a temp warehouse and
# gates the ENGINE-REPORTED partition pruning (FileSourceScanExec's
# numPartitions/numFiles metrics after a real filtered scan) against
# the advisor's predicted arithmetic. Any gap between priced and real
# pruning (wrong scan condition, writer splitting files, partition
# inference drift) breaks the hash gate.

_Q442_PKEY_SCAN = {
    # the advisor's scan conditions re-expressed on the written
    # partition column (what a production query on the chosen layout
    # would actually write)
    ("by_day", "day_range_7d"):
        f"pkey >= CAST({_Q433_TS1} AS DATE) AND "
        f"pkey < CAST({_Q433_TS2} AS DATE)",
    ("by_day", "type_in_3d"):
        f"pkey >= CAST({_Q433_TS3} AS DATE) AND "
        f"pkey < CAST({_Q433_TS4} AS DATE)",
    ("by_type", "type_point"): "pkey = 'purchase'",
    ("by_type", "type_in_3d"): "pkey IN ('click', 'view')",
    ("by_user64", "user_point"): "pkey = 42",
}


def _q442_oracle() -> str:
    # same statistics block as q433's oracle, then: total predicted
    # scan cost per layout -> argmin (name tiebreak) -> the chosen
    # layout's four workload rows with files_read == partitions_read
    # (the writer produces exactly one file per partition directory).
    aggs = ["CAST(count(*) AS BIGINT) AS n_rows"]
    for layout, key in _Q433_LAYOUTS.items():
        aggs.append(
            f"CAST(count(DISTINCT {key}) AS BIGINT) AS np_{layout}"
        )
    for wname, pred in _Q433_WORKLOAD.items():
        aggs.append(
            f"CAST(count(*) FILTER ({pred}) AS BIGINT) AS m_{wname}"
        )
    for layout, key, wname, pred, scan in _q433_cells():
        if scan is not None:
            aggs.append(
                f"CAST(count(*) FILTER ({scan}) AS BIGINT)"
                f" AS s_{layout}_{wname}"
            )
            aggs.append(
                f"CAST(count(DISTINCT CASE WHEN {scan} THEN {key} END)"
                f" AS BIGINT) AS p_{layout}_{wname}"
            )
    rows = []
    for layout, key, wname, pred, scan in _q433_cells():
        scanned = f"s_{layout}_{wname}" if scan else "n_rows"
        parts = f"p_{layout}_{wname}" if scan else f"np_{layout}"
        rows.append(
            f"SELECT '{layout}' AS layout, '{wname}' AS workload,"
            f" np_{layout} AS n_partitions, {parts} AS partitions_read,"
            f" {scanned} AS rows_scanned, m_{wname} AS rows_matching"
            " FROM stats"
        )
    body = " UNION ALL ".join(rows)
    return f"""
    WITH stats AS (SELECT {', '.join(aggs)} FROM events),
    cells AS ({body}),
    choice AS (
        SELECT layout FROM cells
        GROUP BY layout
        ORDER BY sum(rows_scanned), layout
        LIMIT 1
    )
    SELECT c.layout, c.workload, c.n_partitions, c.partitions_read,
           c.partitions_read AS files_read, c.rows_matching
    FROM cells c JOIN choice ch ON c.layout = ch.layout
    ORDER BY c.workload
    """


def _q442_scan_metrics(df) -> tuple[int, int]:
    """Engine-reported (numPartitions, numFiles) summed over df's
    executed scan leaves — call AFTER an action ran through df's OWN
    plan (a separate .count() executes a different QueryExecution and
    leaves these at zero)."""
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    parts = files = 0
    for i in range(leaves.size()):
        mets = leaves.apply(i).metrics()
        it = mets.iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() == "numPartitions":
                parts += kv._2().value()
            elif kv._1() == "numFiles":
                files += kv._2().value()
    return parts, files


@register("q442_partition_layout_executed", oracle=_q442_oracle())
def q442_partition_layout_executed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PARTITION-LAYOUT choice EXECUTED, hash-gated — closes the loop
    q433 opens: ONE scan prices the three candidate layouts over the
    four-predicate workload, the total-scan-cost argmin is picked
    (bounded 1-row driver observe, the q422 run->observe->act
    precedent), events are WRITTEN hive-partitioned by the chosen key
    to a temp warehouse (repartition by key first, so exactly one
    file lands per partition directory), and every workload predicate
    is re-run against the real layout with its partition-column scan
    condition attached. The gate compares the ENGINE's own scan
    metrics — FileSourceScanExec numPartitions/numFiles after the
    filtered read executed — plus the on-disk directory count against
    the advisor's predicted integers: real pruning must equal priced
    pruning exactly, or the hash breaks (a torn write, a second file
    per partition, date-inference drift on the partition column, or a
    wrong scan condition are all loud).

    Scale: the pricing scan is one pass (q433's block); the rewrite
    is one shuffle by partition key (exactly the production backfill
    cost of adopting the layout); the four probe queries read only
    pruned partitions. The driver handles 1 stats row + 4 metric
    pairs — nothing corpus-sized.
    """
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    e = load(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "user_id"
    )
    # bounded driver observe (q422 precedent): ONE row of layout
    # statistics drives the argmin choice
    stats = e.agg(*_q433_agg_exprs()).collect()[0]

    def _cell(layout, wname):
        scan = _Q433_SCAN.get((layout, wname))
        scanned = stats[f"s_{layout}_{wname}"] if scan else stats["n_rows"]
        parts = (
            stats[f"p_{layout}_{wname}"] if scan else stats[f"np_{layout}"]
        )
        # SUM over an empty corpus is NULL, not 0
        return scanned or 0, parts or 0

    totals = {
        layout: sum(_cell(layout, w)[0] for w in _Q433_WORKLOAD)
        for layout in _Q433_LAYOUTS
    }
    chosen = min(sorted(totals), key=lambda k: totals[k])

    schema = (
        "layout string, workload string, n_partitions long,"
        " partitions_read long, files_read long, rows_matching long"
    )
    if stats["n_rows"] == 0:
        # empty corpus: a partitionBy write of zero rows produces no
        # partition directories and an unreadable (schema-less)
        # parquet dir, so skip the write and emit what the real run
        # would observe — zero partitions read, zero matches — for
        # the argmin layout (all-zero totals tie -> lexicographic
        # first), exactly the oracle's arithmetic on empty input
        return spark.createDataFrame(
            [(chosen, w, 0, 0, 0, 0) for w in sorted(_Q433_WORKLOAD)],
            schema,
        )

    out_dir = _tempfile.mkdtemp(prefix="g_etl_layout_exec_")
    try:
        (
            e.withColumn("pkey", F.expr(_Q433_LAYOUTS[chosen]))
            .repartition("pkey")
            .write.partitionBy("pkey")
            .mode("overwrite")
            .parquet(out_dir)
        )
        n_dirs = sum(
            1 for d in _os.listdir(out_dir) if d.startswith("pkey=")
        )
        back = spark.read.parquet(out_dir)
        rows = []
        # AQE wraps the executed plan in AdaptiveSparkPlanExec whose
        # collectLeaves() are not the executed scan instances (their
        # metrics stay zero); the probes are tiny pruned scans, so run
        # them with AQE off and restore the conf after.
        aqe_key = "spark.sql.adaptive.enabled"
        aqe_old = spark.conf.get(aqe_key)
        spark.conf.set(aqe_key, "false")
        try:
            for wname, pred in _Q433_WORKLOAD.items():
                full = pred
                pkey_cond = _Q442_PKEY_SCAN.get((chosen, wname))
                if pkey_cond is not None:
                    full = f"({pred}) AND ({pkey_cond})"
                probe = back.filter(F.expr(full)).agg(
                    F.count(F.lit(1)).cast("long").alias("n")
                )
                # 1-row aggregate per workload probe (bounded);
                # collect() (not count()) so the metrics populate on
                # THIS plan's QueryExecution
                n_match = probe.collect()[0]["n"]
                parts_real, files_real = _q442_scan_metrics(probe)
                rows.append(
                    (chosen, wname, n_dirs, parts_real, files_real, n_match)
                )
        finally:
            spark.conf.set(aqe_key, aqe_old)
        return spark.createDataFrame(
            sorted(rows, key=lambda r: r[1]), schema
        )
    finally:
        _shutil.rmtree(out_dir, ignore_errors=True)


# ---- q443: Davidson tie-model preference fit ----------------------------
# The preference family's ties closure (r12 verdict item #5): q428
# EXCLUDES exact-equal-mean duels; Davidson (1970) models them —
# P(i>j) = p_i/D_ij, P(tie) = nu*sqrt(p_i p_j)/D_ij with
# D_ij = p_i + p_j + nu*sqrt(p_i p_j). Two MM rounds (Hunter 2004's
# AM-GM minorization of the sqrt coupling), every cross-row quantity
# integer-quantized between steps so both engines are bit-identical.
# The quantized expression TEXT is shared between the Spark plan and
# the DuckDB oracle (same IEEE double ops in the same order).

# s: micro-unit sqrt(p_i*p_j) (product of two <=~1e7 micro ints is
# exact in double; sqrt is correctly rounded; one round() to integer)
_Q443_S = ("CAST(round(sqrt(CAST({pi} AS DOUBLE) * {pj})) AS BIGINT)")
# D: micro units; nu*s/1e6 keeps micro scale
_Q443_D = ("({pi} + {pj} + CAST(round(CAST({nu} AS DOUBLE) * {s} "
           "/ 1000000.0) AS BIGINT))")
# nu-stationarity denominator term per pair (pico-quantized)
_Q443_NUT = ("CAST(round(1000000000000.0 * {n} * {s} / {d}) AS BIGINT)")
# nu update from total ties tt and the pico denominator sum dn
_Q443_NU = ("CAST(round(1000000.0 * {tt} / (CAST({dn} AS DOUBLE) "
            "/ 1000000000000.0)) AS BIGINT)")
# p-update denominator term for the pair-side whose strength is {pi}
_Q443_PT = ("CAST(round(1000000000000.0 * ({n} * (2000000.0 * {pi} "
            "+ CAST({nu} AS DOUBLE) * {s})) / (2000000.0 * {pi} * {d})) "
            "AS BIGINT)")
# raw strength from half-unit numerator hn (2*wins + ties) and the
# pico denominator sum dd
# 1e6 prefactor (NOT 1e12): dd is pico-quantized, so the real
# denominator is dd/1e12 ~ O(n * 5e-7) and hn/denom is scale-free in
# the duel count — 1e6 keeps praw ~1e12-1e13 at EVERY sf (a 1e12
# prefactor overflowed BIGINT at sf0.001 already).
_Q443_PRAW = ("CAST(round(1000000.0 * {hn} / (CAST({dd} AS DOUBLE) "
              "/ 1000000000000.0)) AS BIGINT)")
# renormalize so sum(p) == k (micro): identical to q428's step
_Q443_PNORM = ("CAST(round(1000000.0 * {k} * {praw} / {sp}) AS BIGINT)")


def _q443_oracle() -> str:
    # one MM round as chained CTEs, parameterized by suffix r:
    # inputs p{r-1} (t, p) and nu{r-1} (nu); outputs p{r}, nu{r}
    def mm_round(r: int) -> str:
        q = r - 1
        s0 = _Q443_S.format(pi="pa.p", pj="pb.p")
        d0 = _Q443_D.format(pi="pa.p", pj="pb.p", nu=f"nu{q}.nu", s="s")
        nut = _Q443_NUT.format(n="n", s="s", d="d")
        nu = _Q443_NU.format(tt="tt.tt", dn="dn")
        d1 = _Q443_D.format(pi="pa.p", pj="pb.p", nu=f"nu{r}.nu", s="s")
        pti = _Q443_PT.format(n="n", pi="pi", nu=f"nu{r}.nu", s="s", d="d")
        praw = _Q443_PRAW.format(hn="it.hn", dd="dd")
        pnorm = _Q443_PNORM.format(k="norm.k", praw="praw", sp="norm.sp")
        return f"""
    sd{r} AS MATERIALIZED (
        SELECT pr.i, pr.j, pr.n, {s0} AS s
        FROM pairs pr
        JOIN p{q} pa ON pa.t = pr.i JOIN p{q} pb ON pb.t = pr.j
    ),
    sdd{r} AS MATERIALIZED (
        SELECT sd{r}.i, sd{r}.j, sd{r}.n, sd{r}.s, {d0} AS d
        FROM sd{r}
        JOIN p{q} pa ON pa.t = sd{r}.i JOIN p{q} pb ON pb.t = sd{r}.j
        CROSS JOIN nu{q}
    ),
    nud{r} AS MATERIALIZED (SELECT CAST(sum({nut}) AS BIGINT) AS dn FROM sdd{r}),
    nu{r} AS MATERIALIZED (SELECT {nu} AS nu FROM nud{r}, tt),
    pd{r} AS MATERIALIZED (
        SELECT sd{r}.i, sd{r}.j, sd{r}.n, sd{r}.s, {d1} AS d
        FROM sd{r}
        JOIN p{q} pa ON pa.t = sd{r}.i JOIN p{q} pb ON pb.t = sd{r}.j
        CROSS JOIN nu{r}
    ),
    pterm{r} AS MATERIALIZED (
        SELECT side.t, {pti} AS term
        FROM pd{r}, nu{r},
        LATERAL (SELECT pd{r}.i AS t, pa.p AS pi
                 FROM p{q} pa WHERE pa.t = pd{r}.i
                 UNION ALL
                 SELECT pd{r}.j AS t, pb.p AS pi
                 FROM p{q} pb WHERE pb.t = pd{r}.j) side(t, pi)
    ),
    pden{r} AS MATERIALIZED (SELECT t, CAST(sum(term) AS BIGINT) AS dd
                FROM pterm{r} GROUP BY t),
    praw{r} AS MATERIALIZED (
        SELECT it.t, {praw} AS praw
        FROM items it JOIN pden{r} USING (t)
    ),
    norm{r} AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS k,
                       CAST(sum(praw) AS BIGINT) AS sp FROM praw{r}),
    p{r} AS MATERIALIZED (
        SELECT t, {pnorm} AS p
        FROM praw{r}, norm{r} norm
    )"""

    return f"""
    WITH ut AS MATERIALIZED (
        SELECT user_id, event_type AS t, count(*) AS n,
               sum(CAST(round(value * 100) AS HUGEINT)) AS s
        FROM events WHERE value IS NOT NULL
        GROUP BY user_id, event_type
    ),
    duels AS MATERIALIZED (
        -- duel outcomes at 10-whole-unit mean grain: the winner must
        -- lead by a full bucket; anything finer is a TIE (the
        -- indistinguishable-preference reading Davidson models --
        -- exact centi-unit equality never fires on this data, which
        -- would leave the tie machinery vacuous). Integer mean
        -- buckets: s // n // 1000 in centi-units, truncation-
        -- division on both engines (DuckDB // == Spark div).
        SELECT a.t AS i, b.t AS j,
               CASE WHEN (a.s // a.n) // 1000 > (b.s // b.n) // 1000
                    THEN 1 ELSE 0 END AS wi,
               CASE WHEN (a.s // a.n) // 1000 < (b.s // b.n) // 1000
                    THEN 1 ELSE 0 END AS wj,
               CASE WHEN (a.s // a.n) // 1000 = (b.s // b.n) // 1000
                    THEN 1 ELSE 0 END AS tie
        FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.t < b.t
    ),
    pairs AS MATERIALIZED (
        SELECT i, j, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(wi) AS BIGINT) AS wi,
               CAST(sum(wj) AS BIGINT) AS wj,
               CAST(sum(tie) AS BIGINT) AS t
        FROM duels GROUP BY i, j
    ),
    tt AS MATERIALIZED (SELECT CAST(sum(t) AS BIGINT) AS tt FROM pairs),
    items AS MATERIALIZED (
        SELECT t,
               CAST(sum(w) AS BIGINT) AS w,
               CAST(sum(ties) AS BIGINT) AS ties,
               CAST(sum(n) AS BIGINT) AS comps,
               CAST(sum(2 * w + ties) AS BIGINT) AS hn
        FROM (
            SELECT i AS t, wi AS w, t AS ties, n FROM pairs
            UNION ALL
            SELECT j AS t, wj AS w, t AS ties, n FROM pairs
        ) GROUP BY t
    ),
    p0 AS MATERIALIZED (SELECT t, CAST(1000000 AS BIGINT) AS p FROM items),
    nu0 AS MATERIALIZED (SELECT CAST(1000000 AS BIGINT) AS nu),
    {mm_round(1).lstrip()},
    {mm_round(2).lstrip()}
    SELECT CAST(row_number() OVER (ORDER BY p2.p DESC, items.t)
                AS BIGINT) AS pref_rank,
           items.t AS event_type,
           items.w AS n_wins, items.ties AS n_ties,
           items.comps AS n_comparisons,
           p2.p AS p_micro, nu2.nu AS nu_micro
    FROM items JOIN p2 ON p2.t = items.t CROSS JOIN nu2
    ORDER BY pref_rank
    """


def _q443_mm_round(pairs: DataFrame, p_df: DataFrame, nu_df: DataFrame,
                   tt: DataFrame) -> tuple[DataFrame, DataFrame]:
    """One Davidson MM round at the bounded |types|² pair grain:
    (p, nu) -> (p', nu'). Every quantized expression is a shared
    template (_Q443_*) so the oracle's doubles are bit-identical."""
    pa = p_df.select(F.col("t").alias("i"), F.col("p").alias("p_i"))
    pb = p_df.select(F.col("t").alias("j"), F.col("p").alias("p_j"))
    sd = (
        pairs.join(F.broadcast(pa), "i")
        .join(F.broadcast(pb), "j")
        .withColumn("s", F.expr(_Q443_S.format(pi="p_i", pj="p_j")))
    )
    sdd = sd.crossJoin(F.broadcast(nu_df)).withColumn(
        "d", F.expr(_Q443_D.format(pi="p_i", pj="p_j", nu="nu", s="s"))
    )
    nud = sdd.agg(
        F.sum(F.expr(_Q443_NUT.format(n="n", s="s", d="d")))
        .cast("long")
        .alias("dn")
    )
    nu_next = nud.crossJoin(F.broadcast(tt)).select(
        F.expr(_Q443_NU.format(tt="tt", dn="dn")).alias("nu")
    )
    pd = sd.crossJoin(F.broadcast(nu_next)).withColumn(
        "d", F.expr(_Q443_D.format(pi="p_i", pj="p_j", nu="nu", s="s"))
    )
    sides = pd.select(
        "n",
        "s",
        "d",
        "nu",
        F.explode(
            F.array(
                F.struct(
                    F.col("i").alias("t"), F.col("p_i").alias("pi")
                ),
                F.struct(
                    F.col("j").alias("t"), F.col("p_j").alias("pi")
                ),
            )
        ).alias("side"),
    ).select("n", "s", "d", "nu", "side.t", "side.pi")
    pden = (
        sides.select(
            "t",
            F.expr(
                _Q443_PT.format(n="n", pi="pi", nu="nu", s="s", d="d")
            ).alias("term"),
        )
        .groupBy("t")
        .agg(F.sum("term").cast("long").alias("dd"))
    )
    return pden, nu_next


@register("q443_davidson_tie_preferences", oracle=_q443_oracle())
def q443_davidson_tie_preferences(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DAVIDSON TIE-MODEL preference fit — the ties closure of q428's
    Bradley-Terry: P(i>j) = p_i/D_ij, P(tie) = ν·√(p_i p_j)/D_ij,
    D_ij = p_i + p_j + ν·√(p_i p_j) (Davidson 1970), fit by two MM
    rounds (Hunter 2004's AM-GM minorization of the √ coupling:
    ν ← T / Σ N_ij·√(p_i p_j)/D_ij, then
    p_i ← (2W_i + T_i) / Σ_j N_ij·(2p_i + ν√(p_i p_j))/(2p_i·D_ij)
    with re-normalization to Σp = k each round). Duels compare
    per-user mean value at 10-whole-unit integer grain — a winner
    must lead by a full bucket, finer differences are TIES (17–20%
    of duels on this data), which is exactly the indistinguishable-
    preference regime the tie parameter ν measures; q428 throws that
    signal away. Every cross-row quantity is integer-quantized
    (strengths micro, MM terms pico) through SHARED expression
    templates so Spark and DuckDB produce bit-identical fits.

    Scale: one pass to (user × type) cells, one user-grain self-join
    (|users|·|types|², never events²), then the whole fit lives on
    the ≤|types|² pair matrix — broadcast joins and two bounded MM
    rounds, the q428/q380 discipline.
    """
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    ut = e.groupBy("user_id", F.col("event_type").alias("t")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("decimal(38,0)")).alias(
            "s"
        ),
    )
    a = ut.select(
        "user_id",
        F.col("t").alias("ta"),
        F.expr("(s div n) div 1000").alias("ba"),
    )
    b = ut.select(
        "user_id",
        F.col("t").alias("tb"),
        F.expr("(s div n) div 1000").alias("bb"),
    )
    duels = (
        a.join(b, ["user_id"])
        .filter(F.col("ta") < F.col("tb"))
        .select(
            F.col("ta").alias("i"),
            F.col("tb").alias("j"),
            F.when(F.col("ba") > F.col("bb"), 1).otherwise(0).alias("wi"),
            F.when(F.col("ba") < F.col("bb"), 1).otherwise(0).alias("wj"),
            F.when(F.col("ba") == F.col("bb"), 1).otherwise(0).alias(
                "tie"
            ),
        )
    )
    pairs = duels.groupBy("i", "j").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("wi").cast("long").alias("wi"),
        F.sum("wj").cast("long").alias("wj"),
        F.sum("tie").cast("long").alias("tn"),
    )
    pairs = pairs.localCheckpoint(eager=True)  # tiny; reused 4x/round
    tt = pairs.agg(F.sum("tn").cast("long").alias("tt"))
    items = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("i").alias("t"),
                        F.col("wi").alias("w"),
                        F.col("tn").alias("ties"),
                        F.col("n").alias("n"),
                    ),
                    F.struct(
                        F.col("j").alias("t"),
                        F.col("wj").alias("w"),
                        F.col("tn").alias("ties"),
                        F.col("n").alias("n"),
                    ),
                )
            ).alias("s")
        )
        .select("s.*")
        .groupBy("t")
        .agg(
            F.sum("w").cast("long").alias("w"),
            F.sum("ties").cast("long").alias("ties"),
            F.sum("n").cast("long").alias("comps"),
            F.sum(F.expr("2 * w + ties")).cast("long").alias("hn"),
        )
    )
    items = items.localCheckpoint(eager=True)  # |types| rows
    p_df = items.select("t", F.lit(1000000).cast("long").alias("p"))
    nu_df = spark.range(1).select(
        F.lit(1000000).cast("long").alias("nu")
    )
    for _ in range(2):
        pden, nu_df = _q443_mm_round(pairs, p_df, nu_df, tt)
        praw = items.join(pden, "t").select(
            "t",
            F.expr(_Q443_PRAW.format(hn="hn", dd="dd")).alias("praw"),
        )
        norm = praw.agg(
            F.count(F.lit(1)).cast("long").alias("k"),
            F.sum("praw").cast("long").alias("sp"),
        )
        p_df = praw.crossJoin(F.broadcast(norm)).select(
            "t",
            F.expr(_Q443_PNORM.format(k="k", praw="praw", sp="sp")).alias(
                "p"
            ),
        )
        # truncate lineage: each round's plan would otherwise nest the
        # previous round's joins (the CC per-round lesson); both
        # relations are |types|-row tiny
        p_df = p_df.localCheckpoint(eager=True)
        nu_df = nu_df.localCheckpoint(eager=True)
    return (
        items.join(p_df, "t")
        .crossJoin(F.broadcast(nu_df))
        .select(
            F.row_number()
            .over(Window.orderBy(F.col("p").desc(), F.col("t")))
            .cast("long")
            .alias("pref_rank"),
            F.col("t").alias("event_type"),
            F.col("w").alias("n_wins"),
            F.col("ties").alias("n_ties"),
            F.col("comps").alias("n_comparisons"),
            F.col("p").alias("p_micro"),
            F.col("nu").alias("nu_micro"),
        )
        .orderBy("pref_rank")
    )


# ---- q447: position-bias-corrected Bradley-Terry ------------------------
# The order-effect model (Agresti 1990; MM updates in Hunter 2004's
# home-advantage section): P(home wins) = γ·p_h / (γ·p_h + p_a).
# "Home" = the type the user encountered FIRST (min event ts) — the
# primacy position. γ > 1 means first-encountered types win more than
# their strengths explain: the position bias a duel-based reward
# model must correct for. Shared quantized templates as q443.

# D = γ·p_h/1e6 + p_a (micro)
_Q447_D = ("(CAST(round(CAST({g} AS DOUBLE) * {ph} / 1000000.0)"
           " AS BIGINT) + {pa})")
# γ-stationarity denominator term per ordered pair (pico)
_Q447_GT = ("CAST(round(1000000000000.0 * {n} * {ph} / {d}) AS BIGINT)")
# γ update from total home wins hw and the pico denominator sum dn
_Q447_G = ("CAST(round(1000000.0 * {hw} / (CAST({dn} AS DOUBLE)"
           " / 1000000000000.0)) AS BIGINT)")
# p-update terms: home side n·(γ/1e6)/D, away side n/D (both pico)
_Q447_PTH = ("CAST(round(1000000000000.0 * {n} * {g}"
             " / (1000000.0 * {d})) AS BIGINT)")
_Q447_PTA = ("CAST(round(1000000000000.0 * {n} / CAST({d} AS DOUBLE))"
             " AS BIGINT)")
# raw strength from total wins w and the pico denominator sum dd
_Q447_PRAW = ("CAST(round(1000000.0 * {w} / (CAST({dd} AS DOUBLE)"
              " / 1000000000000.0)) AS BIGINT)")


def _q447_oracle() -> str:
    def mm_round(r: int) -> str:
        q = r - 1
        d0 = _Q447_D.format(g=f"g{q}.g", ph="ph.p", pa="pa.p")
        gt = _Q447_GT.format(n="n", ph="ph.p", d="d")
        gu = _Q447_G.format(hw="hw.hw", dn="dn")
        d1 = _Q447_D.format(g=f"g{r}.g", ph="ph.p", pa="pa.p")
        pth = _Q447_PTH.format(n="n", g=f"g{r}.g", d="d")
        pta = _Q447_PTA.format(n="n", d="d")
        praw = _Q447_PRAW.format(w="it.w", dd="dd")
        pnorm = _Q443_PNORM.format(k="norm.k", praw="praw", sp="norm.sp")
        return f"""
    pd{r} AS MATERIALIZED (
        SELECT pr.h, pr.aw, pr.n, ph.p AS php, {d0} AS d
        FROM pairs pr
        JOIN p{q} ph ON ph.t = pr.h JOIN p{q} pa ON pa.t = pr.aw
        CROSS JOIN g{q}
    ),
    gden{r} AS MATERIALIZED (
        SELECT CAST(sum({gt}) AS BIGINT) AS dn
        FROM (SELECT h, aw, n, php AS p, d FROM pd{r}) x
        JOIN p{q} ph ON ph.t = x.h
    ),
    g{r} AS MATERIALIZED (SELECT {gu} AS g FROM gden{r}, hw),
    pd2{r} AS MATERIALIZED (
        SELECT pr.h, pr.aw, pr.n, {d1} AS d
        FROM pairs pr
        JOIN p{q} ph ON ph.t = pr.h JOIN p{q} pa ON pa.t = pr.aw
        CROSS JOIN g{r}
    ),
    pterm{r} AS MATERIALIZED (
        SELECT h AS t, {pth} AS term FROM pd2{r}, g{r}
        UNION ALL
        SELECT aw AS t, {pta} AS term FROM pd2{r}
    ),
    pden{r} AS MATERIALIZED (
        SELECT t, CAST(sum(term) AS BIGINT) AS dd
        FROM pterm{r} GROUP BY t
    ),
    praw{r} AS MATERIALIZED (
        SELECT it.t, {praw} AS praw
        FROM items it JOIN pden{r} USING (t)
    ),
    norm{r} AS MATERIALIZED (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(praw) AS BIGINT) AS sp FROM praw{r}
    ),
    p{r} AS MATERIALIZED (
        SELECT t, {pnorm} AS p
        FROM praw{r}, norm{r} norm
    )"""

    return f"""
    WITH ut AS MATERIALIZED (
        SELECT user_id, event_type AS t, count(*) AS n,
               sum(CAST(round(value * 100) AS HUGEINT)) AS s,
               min(epoch_us(ts)) AS ft
        FROM events WHERE value IS NOT NULL
        GROUP BY user_id, event_type
    ),
    duels AS MATERIALIZED (
        SELECT CASE WHEN a.ft < b.ft OR (a.ft = b.ft AND a.t < b.t)
                    THEN a.t ELSE b.t END AS h,
               CASE WHEN a.ft < b.ft OR (a.ft = b.ft AND a.t < b.t)
                    THEN b.t ELSE a.t END AS aw,
               CASE WHEN a.s * b.n > b.s * a.n THEN a.t ELSE b.t END AS wt
        FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.t < b.t
        WHERE a.s * b.n <> b.s * a.n
    ),
    pairs AS MATERIALIZED (
        SELECT h, aw, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN wt = h THEN 1 ELSE 0 END) AS BIGINT)
                   AS w
        FROM duels GROUP BY h, aw
    ),
    hw AS MATERIALIZED (SELECT CAST(sum(w) AS BIGINT) AS hw FROM pairs),
    items AS MATERIALIZED (
        SELECT t, CAST(sum(w) AS BIGINT) AS w,
               CAST(sum(nh) AS BIGINT) AS n_home,
               CAST(sum(na) AS BIGINT) AS n_away
        FROM (
            SELECT h AS t, w, n AS nh, 0 AS na FROM pairs
            UNION ALL
            SELECT aw AS t, n - w, 0, n FROM pairs
        ) GROUP BY t
    ),
    p0 AS MATERIALIZED (
        SELECT t, CAST(1000000 AS BIGINT) AS p FROM items),
    g0 AS MATERIALIZED (SELECT CAST(1000000 AS BIGINT) AS g),
    {mm_round(1).lstrip()},
    {mm_round(2).lstrip()}
    SELECT CAST(row_number() OVER (ORDER BY p2.p DESC, items.t)
                AS BIGINT) AS pref_rank,
           items.t AS event_type,
           items.w AS n_wins,
           items.n_home AS n_home_duels,
           items.n_away AS n_away_duels,
           p2.p AS p_micro, g2.g AS gamma_micro
    FROM items JOIN p2 ON p2.t = items.t CROSS JOIN g2
    ORDER BY pref_rank
    """


def _q447_mm_round(
    pairs: DataFrame, items: DataFrame, p_df: DataFrame, g_df: DataFrame,
    hw: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """One order-effect MM round at the ordered-pair grain:
    (p, γ) -> (p', γ'). Templates shared with the oracle."""
    ph = p_df.select(F.col("t").alias("h"), F.col("p").alias("php"))
    pa = p_df.select(F.col("t").alias("aw"), F.col("p").alias("pap"))
    base = pairs.join(F.broadcast(ph), "h").join(F.broadcast(pa), "aw")
    d0 = base.crossJoin(F.broadcast(g_df)).withColumn(
        "d", F.expr(_Q447_D.format(g="g", ph="php", pa="pap"))
    )
    gden = d0.agg(
        F.sum(F.expr(_Q447_GT.format(n="n", ph="php", d="d")))
        .cast("long")
        .alias("dn")
    )
    g_next = gden.crossJoin(F.broadcast(hw)).select(
        F.expr(_Q447_G.format(hw="hw", dn="dn")).alias("g")
    )
    d1 = base.crossJoin(F.broadcast(g_next)).withColumn(
        "d", F.expr(_Q447_D.format(g="g", ph="php", pa="pap"))
    )
    home_terms = d1.select(
        F.col("h").alias("t"),
        F.expr(_Q447_PTH.format(n="n", g="g", d="d")).alias("term"),
    )
    away_terms = d1.select(
        F.col("aw").alias("t"),
        F.expr(_Q447_PTA.format(n="n", d="d")).alias("term"),
    )
    pden = (
        home_terms.unionByName(away_terms)
        .groupBy("t")
        .agg(F.sum("term").cast("long").alias("dd"))
    )
    praw = items.join(pden, "t").select(
        "t", F.expr(_Q447_PRAW.format(w="w", dd="dd")).alias("praw")
    )
    norm = praw.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("praw").cast("long").alias("sp"),
    )
    p_next = praw.crossJoin(F.broadcast(norm)).select(
        "t",
        F.expr(_Q443_PNORM.format(k="k", praw="praw", sp="sp")).alias(
            "p"
        ),
    )
    return p_next.localCheckpoint(eager=True), g_next.localCheckpoint(
        eager=True
    )


@register("q447_position_bias_bradley_terry", oracle=_q447_oracle())
def q447_position_bias_bradley_terry(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """POSITION-BIAS-corrected Bradley-Terry — the order-effect model
    (Agresti 1990; MM in Hunter 2004): P(home wins) =
    γ·p_h / (γ·p_h + p_a), where "home" is the type the user
    ENCOUNTERED FIRST (min event ts — the primacy position) and
    duels are q428's exact integer mean comparisons. γ is the
    global primacy multiplier a duel-based reward model must divide
    out before its strengths mean anything — preference datasets
    collected with a fixed presentation order bake exactly this bias
    in (the known first-position advantage in human A/B preference
    labels). Two MM rounds: γ ← H / Σ n_ha·p_h/D_ha, then
    p_i ← W_i / [Σ_a n_ia·γ/D_ia + Σ_h n_hi/D_hi], re-normalized to
    Σp = k; every cross-row quantity integer-quantized through
    templates shared with the oracle (micro strengths, pico terms).
    Completes the preference trio: q428 (plain BT), q443 (ties),
    q447 (position bias).

    Scale: identical economics to q428/q443 — one user-grain
    self-join to duels, then everything at the ordered |types)²
    pair grain with broadcast strength maps; two bounded MM rounds.
    """
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    ut = e.groupBy("user_id", F.col("event_type").alias("t")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("decimal(38,0)")).alias(
            "s"
        ),
        F.min(F.unix_micros("ts")).alias("ft"),
    )
    a = ut.select(
        "user_id",
        F.col("t").alias("ta"),
        F.col("n").alias("na"),
        F.col("s").alias("sa"),
        F.col("ft").alias("fa"),
    )
    b = ut.select(
        "user_id",
        F.col("t").alias("tb"),
        F.col("n").alias("nb"),
        F.col("s").alias("sb"),
        F.col("ft").alias("fb"),
    )
    a_first = (F.col("fa") < F.col("fb")) | (
        (F.col("fa") == F.col("fb")) & (F.col("ta") < F.col("tb"))
    )
    duels = (
        a.join(b, ["user_id"])
        .filter(F.col("ta") < F.col("tb"))
        .filter(F.col("sa") * F.col("nb") != F.col("sb") * F.col("na"))
        .select(
            F.when(a_first, F.col("ta")).otherwise(F.col("tb")).alias(
                "h"
            ),
            F.when(a_first, F.col("tb")).otherwise(F.col("ta")).alias(
                "aw"
            ),
            F.when(
                F.col("sa") * F.col("nb") > F.col("sb") * F.col("na"),
                F.col("ta"),
            )
            .otherwise(F.col("tb"))
            .alias("wt"),
        )
    )
    pairs = duels.groupBy("h", "aw").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("wt") == F.col("h"), 1).otherwise(0))
        .cast("long")
        .alias("w"),
    )
    pairs = pairs.localCheckpoint(eager=True)  # |types|² rows
    hw = pairs.agg(F.sum("w").cast("long").alias("hw"))
    items = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("h").alias("t"),
                        F.col("w").alias("w"),
                        F.col("n").alias("nh"),
                        F.lit(0).cast("long").alias("na"),
                    ),
                    F.struct(
                        F.col("aw").alias("t"),
                        (F.col("n") - F.col("w")).alias("w"),
                        F.lit(0).cast("long").alias("nh"),
                        F.col("n").alias("na"),
                    ),
                )
            ).alias("s")
        )
        .select("s.*")
        .groupBy("t")
        .agg(
            F.sum("w").cast("long").alias("w"),
            F.sum("nh").cast("long").alias("n_home"),
            F.sum("na").cast("long").alias("n_away"),
        )
    )
    items = items.localCheckpoint(eager=True)
    p_df = items.select("t", F.lit(1000000).cast("long").alias("p"))
    g_df = spark.range(1).select(F.lit(1000000).cast("long").alias("g"))
    for _ in range(2):
        p_df, g_df = _q447_mm_round(pairs, items, p_df, g_df, hw)
    return (
        items.join(p_df, "t")
        .crossJoin(F.broadcast(g_df))
        .select(
            F.row_number()
            .over(Window.orderBy(F.col("p").desc(), F.col("t")))
            .cast("long")
            .alias("pref_rank"),
            F.col("t").alias("event_type"),
            F.col("w").alias("n_wins"),
            F.col("n_home").alias("n_home_duels"),
            F.col("n_away").alias("n_away_duels"),
            F.col("p").alias("p_micro"),
            F.col("g").alias("gamma_micro"),
        )
        .orderBy("pref_rank")
    )


# ---- q449: preference intransitivity (circular triad) audit -------------
@register(
    "q449_preference_cycle_audit",
    oracle="""
    WITH ut AS MATERIALIZED (
        SELECT user_id, event_type AS t, count(*) AS n,
               sum(CAST(round(value * 100) AS HUGEINT)) AS s
        FROM events WHERE value IS NOT NULL
        GROUP BY user_id, event_type
    ),
    duels AS MATERIALIZED (
        SELECT CASE WHEN a.s * b.n > b.s * a.n THEN a.t ELSE b.t END AS w,
               CASE WHEN a.s * b.n > b.s * a.n THEN b.t ELSE a.t END AS l
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.t < b.t
        WHERE a.s * b.n <> b.s * a.n
    ),
    m AS MATERIALIZED (
        SELECT w AS i, l AS j, CAST(count(*) AS BIGINT) AS nij
        FROM duels GROUP BY w, l
    ),
    dirs AS MATERIALIZED (
        -- majority direction per unordered pair, canonicalized to
        -- (least, greatest) BEFORE aggregation so one-sided pairs
        -- (all wins in one direction -> only the reversed row exists
        -- in m) are not dropped; exact-split pairs are UNDECIDED and
        -- excluded from the tournament
        SELECT least(i, j) AS i, greatest(i, j) AS j,
               CASE WHEN sum(CASE WHEN i < j THEN nij ELSE -nij END) > 0
                    THEN 1 ELSE -1 END AS d
        FROM m
        GROUP BY least(i, j), greatest(i, j)
        HAVING sum(CASE WHEN i < j THEN nij ELSE -nij END) <> 0
    ),
    types AS MATERIALIZED (
        SELECT DISTINCT t FROM (
            SELECT i AS t FROM dirs UNION ALL SELECT j FROM dirs)
    ),
    outdeg AS MATERIALIZED (
        SELECT t, CAST(sum(o) AS BIGINT) AS wins_majority FROM (
            SELECT i AS t, CASE WHEN d = 1 THEN 1 ELSE 0 END AS o
            FROM dirs
            UNION ALL
            SELECT j, CASE WHEN d = -1 THEN 1 ELSE 0 END FROM dirs
        ) GROUP BY t
    ),
    triads AS MATERIALIZED (
        SELECT ab.i AS a, ab.j AS b, bc.j AS c,
               (ab.d = bc.d AND ac.d = -ab.d) AS cyc
        FROM dirs ab
        JOIN dirs bc ON bc.i = ab.j
        JOIN dirs ac ON ac.i = ab.i AND ac.j = bc.j
    ),
    gstat AS MATERIALIZED (
        SELECT CAST(count(*) AS BIGINT) AS n_triads_decided,
               CAST(sum(CASE WHEN cyc THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_cyclic,
               (SELECT CAST(count(*) AS BIGINT) FROM types) AS m
        FROM triads
    ),
    pertype AS (
        SELECT t, CAST(count(*) AS BIGINT) AS n_cycles_through FROM (
            SELECT a AS t FROM triads WHERE cyc
            UNION ALL SELECT b FROM triads WHERE cyc
            UNION ALL SELECT c FROM triads WHERE cyc
        ) GROUP BY t
    )
    SELECT ty.t AS event_type,
           od.wins_majority,
           coalesce(pt.n_cycles_through, 0) AS n_cycles_through,
           g.n_triads_decided, g.n_cyclic,
           CAST(round(1000.0 * (1.0 - g.n_cyclic /
                CASE WHEN g.m % 2 = 1
                     THEN (g.m * g.m * g.m - g.m) / 24.0
                     ELSE (g.m * g.m * g.m - 4 * g.m) / 24.0 END))
                AS BIGINT) AS zeta_milli
    FROM types ty
    JOIN outdeg od ON od.t = ty.t
    LEFT JOIN pertype pt ON pt.t = ty.t
    CROSS JOIN gstat g
    ORDER BY event_type
    """,
)
def q449_preference_cycle_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PREFERENCE INTRANSITIVITY audit — the data-quality gate a
    duel-based reward model needs BEFORE q428/q443/q447 fit anything:
    take the majority direction of every decided type pair (the
    3-node tournament), count CIRCULAR TRIADS i→j→k→i (a 3-tournament
    is cyclic iff the two chain edges agree and the closing edge
    opposes them), and report Kendall's coefficient of consistency
    ζ = 1 − d/d_max (d_max = (m³−m)/24 for odd m, (m³−4m)/24 even).
    ζ = 1 means a clean total order exists; every cycle is a set of
    preferences NO Bradley-Terry strengths can explain — per type,
    n_cycles_through localizes which items sit inside the
    contradictions (the labels to re-collect or the duel design to
    fix).

    Scale: the duel matrix is |types|² and the triad join |types|³ —
    both broadcast-tiny at any corpus size (the corpus touches only
    the one user-grain pass q428 already prices). For item
    catalogs instead of types, the same audit runs on a sampled
    pair subset; the algebra is unchanged.
    """
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    ut = e.groupBy("user_id", F.col("event_type").alias("t")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("decimal(38,0)")).alias(
            "s"
        ),
    )
    a = ut.select(
        "user_id", F.col("t").alias("ta"), F.col("n").alias("na"),
        F.col("s").alias("sa"),
    )
    b = ut.select(
        "user_id", F.col("t").alias("tb"), F.col("n").alias("nb"),
        F.col("s").alias("sb"),
    )
    duels = (
        a.join(b, ["user_id"])
        .filter(F.col("ta") < F.col("tb"))
        .filter(F.col("sa") * F.col("nb") != F.col("sb") * F.col("na"))
        .select(
            F.when(
                F.col("sa") * F.col("nb") > F.col("sb") * F.col("na"),
                F.col("ta"),
            ).otherwise(F.col("tb")).alias("w"),
            F.when(
                F.col("sa") * F.col("nb") > F.col("sb") * F.col("na"),
                F.col("tb"),
            ).otherwise(F.col("ta")).alias("l"),
        )
    )
    m = duels.groupBy(F.col("w").alias("i"), F.col("l").alias("j")).agg(
        F.count(F.lit(1)).cast("long").alias("nij")
    )
    # canonicalize each directed win row to (least, greatest) with a
    # SIGNED count, THEN aggregate: one-sided pairs (only the reversed
    # row present in m) survive — the planted-cycle fixture caught the
    # i<j-filter-first version dropping them (in both engines).
    dirs = (
        m.select(
            F.least("i", "j").alias("i"),
            F.greatest("i", "j").alias("j"),
            F.when(F.col("i") < F.col("j"), F.col("nij"))
            .otherwise(-F.col("nij"))
            .alias("sw"),
        )
        .groupBy("i", "j")
        .agg(F.sum("sw").alias("sw"))
        .where(F.col("sw") != 0)
        .select(
            "i", "j",
            F.when(F.col("sw") > 0, 1).otherwise(-1).alias("d"),
        )
    )
    dirs = dirs.localCheckpoint(eager=True)  # |types|² rows, joined 3x
    types = (
        dirs.select(F.col("i").alias("t"))
        .unionByName(dirs.select(F.col("j").alias("t")))
        .distinct()
    )
    outdeg = (
        dirs.select(
            F.col("i").alias("t"),
            F.when(F.col("d") == 1, 1).otherwise(0).alias("o"),
        )
        .unionByName(
            dirs.select(
                F.col("j").alias("t"),
                F.when(F.col("d") == -1, 1).otherwise(0).alias("o"),
            )
        )
        .groupBy("t")
        .agg(F.sum("o").cast("long").alias("wins_majority"))
    )
    ab = dirs.select(
        F.col("i").alias("a"), F.col("j").alias("b"),
        F.col("d").alias("dab"),
    )
    bc = dirs.select(
        F.col("i").alias("b"), F.col("j").alias("c"),
        F.col("d").alias("dbc"),
    )
    ac = dirs.select(
        F.col("i").alias("a"), F.col("j").alias("c"),
        F.col("d").alias("dac"),
    )
    triads = (
        ab.join(bc, "b")
        .join(ac, ["a", "c"])
        .select(
            "a",
            "b",
            "c",
            (
                (F.col("dab") == F.col("dbc"))
                & (F.col("dac") == -F.col("dab"))
            ).alias("cyc"),
        )
    )
    triads = triads.localCheckpoint(eager=True)
    nty = types.agg(F.count(F.lit(1)).cast("long").alias("m"))
    glob = triads.agg(
        F.count(F.lit(1)).cast("long").alias("n_triads_decided"),
        F.sum(F.when(F.col("cyc"), 1).otherwise(0))
        .cast("long")
        .alias("n_cyclic"),
    ).crossJoin(F.broadcast(nty))
    pertype = (
        triads.where("cyc")
        .select(F.explode(F.array("a", "b", "c")).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("n_cycles_through"))
    )
    dmax = F.when(
        F.col("m") % 2 == 1,
        (F.col("m") * F.col("m") * F.col("m") - F.col("m")) / 24.0,
    ).otherwise(
        (F.col("m") * F.col("m") * F.col("m") - 4 * F.col("m")) / 24.0
    )
    return (
        types.join(outdeg, "t")
        .join(pertype, "t", "left")
        .crossJoin(F.broadcast(glob))
        .select(
            F.col("t").alias("event_type"),
            "wins_majority",
            F.coalesce(F.col("n_cycles_through"), F.lit(0))
            .cast("long")
            .alias("n_cycles_through"),
            "n_triads_decided",
            "n_cyclic",
            F.round(
                1000.0 * (1.0 - F.col("n_cyclic") / dmax)
            ).cast("long").alias("zeta_milli"),
        )
        .orderBy("event_type")
    )


# ---- q450: DP noisy release EXECUTED ------------------------------------
# The serving-time half of q438: the accountant priced the budget;
# this RELEASES the workload's cells with Laplace noise drawn by
# inverse-CDF from a DETERMINISTIC md5-uniform (seeded by release +
# cell key), so both engines sample the exact same noise and the
# whole release hash-gates. Equal-split policy: eps_i = eps/3,
# b_i = sensitivity_i * 3 in each release's raw units.
_Q450_U_DEN = 281474976710656.0  # 16^12 — 12 hex chars of md5 -> U[0,1)
# inverse-CDF Laplace, guarded at the u∈{0,1} measure-zero edge with
# an identical epsilon in both engines
_Q450_LAP = (
    "(-CAST({b} AS DOUBLE) * (CASE WHEN {u} >= 0.5 THEN 1.0 ELSE -1.0"
    " END) * ln(greatest(1e-15, 1.0 - 2.0 * abs({u} - 0.5))))"
)


@register(
    "q450_dp_noisy_release",
    oracle=f"""
    WITH cells AS MATERIALIZED (
        SELECT 'count_by_type' AS release, event_type AS cell,
               CAST(count(*) AS BIGINT) AS true_value,
               CAST(1 * 3 AS BIGINT) AS b
        FROM events GROUP BY event_type
        UNION ALL
        SELECT 'count_by_day', CAST(CAST(ts AS DATE) AS VARCHAR),
               CAST(count(*) AS BIGINT), CAST(1 * 3 AS BIGINT)
        FROM events GROUP BY CAST(ts AS DATE)
        UNION ALL
        SELECT 'clipped_sum_by_type', event_type,
               CAST(sum(CAST(round(greatest(least(
                        coalesce(value, 0), {_Q438_CLIP}), 0) * 100)
                        AS HUGEINT)) AS BIGINT),
               CAST({_Q438_CLIP} * 100 * 3 AS BIGINT)
        FROM events GROUP BY event_type
    ),
    seeded AS (
        SELECT release, cell, true_value, b,
               CAST(CAST('0x' || substr(md5(release || '|' || cell),
                                        1, 12) AS UBIGINT) AS BIGINT)
                   / {_Q450_U_DEN} AS u
        FROM cells
    )
    SELECT release, cell, true_value,
           CAST({_Q438_EPS_TOTAL_MICRO} // 3 AS BIGINT) AS eps_micro,
           CAST(b * 1000000 AS BIGINT) AS b_micro,
           CAST(round(1000000000.0 * u) AS BIGINT) AS u_nano,
           CAST(round(1000000.0 * {_Q450_LAP.format(b="b", u="u")})
                AS BIGINT) AS noise_micro,
           CAST(true_value * 1000000
                + round(1000000.0 * {_Q450_LAP.format(b="b", u="u")})
                AS BIGINT) AS noisy_micro
    FROM seeded
    ORDER BY release, cell
    """,
)
def q450_dp_noisy_release(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DP NOISY RELEASE, executed — q438 priced the budget; this
    query SERVES the workload: every cell of the three releases
    (counts by type/day, clipped value sums) is published with
    Laplace noise at the equal-split scale b = 3·Δ (ε/3 per release,
    sequential composition of ε = 1), where the noise is drawn by
    inverse-CDF from an md5-seeded uniform (12 hex chars → U[0,1))
    so the sample is DETERMINISTIC and bit-identical across engines
    — the device that makes a randomized mechanism hash-gateable:
    the gate proves the sensitivity algebra, the seeding, the
    inverse-CDF transform, and the quantization all agree, which is
    every deterministic part of the mechanism (a production release
    swaps the seed source for a CSPRNG and nothing else). u_nano
    rides along per cell so an auditor can re-derive each draw.

    Scale: bounded-grain rollups (|types|, |days|) then map-side
    per-cell arithmetic — release serving is O(cells), independent
    of corpus size; the one corpus pass is the clipped rollup
    itself.
    """
    e = load(spark, sf_dir, "events")
    c1 = e.groupBy(F.col("event_type").alias("cell")).agg(
        F.count(F.lit(1)).cast("long").alias("true_value")
    ).select(
        F.lit("count_by_type").alias("release"), "cell", "true_value",
        F.lit(3).cast("long").alias("b"),
    )
    c2 = e.groupBy(
        F.col("ts").cast("date").cast("string").alias("cell")
    ).agg(F.count(F.lit(1)).cast("long").alias("true_value")).select(
        F.lit("count_by_day").alias("release"), "cell", "true_value",
        F.lit(3).cast("long").alias("b"),
    )
    c3 = e.groupBy(F.col("event_type").alias("cell")).agg(
        F.sum(
            F.round(
                F.greatest(
                    F.least(
                        F.coalesce(F.col("value"), F.lit(0.0)),
                        F.lit(float(_Q438_CLIP)),
                    ),
                    F.lit(0.0),
                )
                * 100
            ).cast("decimal(38,0)")
        ).cast("long").alias("true_value")
    ).select(
        F.lit("clipped_sum_by_type").alias("release"), "cell",
        "true_value",
        F.lit(_Q438_CLIP * 100 * 3).cast("long").alias("b"),
    )
    seeded = (
        c1.unionByName(c2)
        .unionByName(c3)
        .withColumn(
            "u",
            F.expr(
                "CAST(conv(substring(md5(concat(release, '|', cell)),"
                f" 1, 12), 16, 10) AS BIGINT) / {_Q450_U_DEN}"
            ),
        )
    )
    lap = _Q450_LAP.format(b="b", u="u")
    return seeded.select(
        "release",
        "cell",
        "true_value",
        F.lit(_Q438_EPS_TOTAL_MICRO // 3).cast("long").alias("eps_micro"),
        (F.col("b") * 1000000).cast("long").alias("b_micro"),
        F.expr("CAST(round(1000000000.0 * u) AS BIGINT)").alias("u_nano"),
        F.expr(f"CAST(round(1000000.0 * {lap}) AS BIGINT)").alias(
            "noise_micro"
        ),
        F.expr(
            f"CAST(true_value * 1000000 + round(1000000.0 * {lap})"
            " AS BIGINT)"
        ).alias("noisy_micro"),
    ).orderBy("release", "cell")


# ---- q455: Plackett-Luce listwise preference fit -------------------------
# The listwise closure of the preference family: each user RANKS the
# event types (Copeland order of the user's exact pairwise-mean
# tournament — division-free, integer-exact, deterministic
# tie-break), and Plackett-Luce strengths are fit by Hunter 2004's MM:
#   w_i <- W_i / sum_{u} sum_{p<=min(pos_i, k_u - 1)} 1 / D_{u,p},
# D_{u,p} = sum of w over the items still in the pool at stage p.
# Quantization: strengths micro; 1/D terms pico-per-micro; renorm to
# sum(w) = k via the shared _Q443_PNORM template.
_Q455_INV = ("CAST(round(1000000000000.0 / CAST({d} AS DOUBLE))"
             " AS BIGINT)")
_Q455_PRAW = ("CAST(round(1000000.0 * {wn} / (CAST({dd} AS DOUBLE)"
              " / 1000000000000.0)) AS BIGINT)")


def _q455_oracle() -> str:
    def mm_round(r: int) -> str:
        q = r - 1
        inv = _Q455_INV.format(d="d")
        praw = _Q455_PRAW.format(wn="it.wn", dd="dd")
        pnorm = _Q443_PNORM.format(k="norm.k", praw="praw", sp="norm.sp")
        return f"""
    dsum{r} AS MATERIALIZED (
        -- D_(u,p): suffix sum of CURRENT strengths over pos >= p
        SELECT ps.user_id, ps.pos AS p,
               CAST(sum(pw.p) OVER (PARTITION BY ps.user_id
                                    ORDER BY ps.pos DESC
                                    ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS d
        FROM positions ps JOIN p{q} pw ON pw.t = ps.t
    ),
    contrib{r} AS MATERIALIZED (
        SELECT ps.t, {inv} AS term
        FROM positions ps
        JOIN dsum{r} ds ON ds.user_id = ps.user_id
                       AND ds.p <= ps.pos
        JOIN ks ON ks.user_id = ps.user_id AND ds.p <= ks.k_u - 1
    ),
    pden{r} AS MATERIALIZED (
        SELECT t, CAST(sum(term) AS BIGINT) AS dd
        FROM contrib{r} GROUP BY t
    ),
    praw{r} AS MATERIALIZED (
        SELECT it.t, {praw} AS praw
        FROM items it JOIN pden{r} USING (t)
    ),
    norm{r} AS MATERIALIZED (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(praw) AS BIGINT) AS sp FROM praw{r}
    ),
    p{r} AS MATERIALIZED (
        SELECT t, {pnorm} AS p FROM praw{r}, norm{r} norm
    )"""

    return f"""
    WITH ut AS MATERIALIZED (
        SELECT user_id, event_type AS t, count(*) AS n,
               sum(CAST(round(value * 100) AS HUGEINT)) AS s
        FROM events WHERE value IS NOT NULL
        GROUP BY user_id, event_type
    ),
    cope AS MATERIALIZED (
        -- Copeland score inside each user's exact tournament
        SELECT a.user_id, a.t,
               CAST(sum(CASE WHEN a.s * b.n > b.s * a.n THEN 1
                             ELSE 0 END) AS BIGINT) AS score
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.t <> b.t
        GROUP BY a.user_id, a.t
    ),
    positions AS MATERIALIZED (
        SELECT user_id, t,
               CAST(row_number() OVER (PARTITION BY user_id
                                       ORDER BY score DESC, t)
                    AS BIGINT) AS pos
        FROM cope
    ),
    ks AS MATERIALIZED (
        SELECT user_id, CAST(count(*) AS BIGINT) AS k_u
        FROM positions GROUP BY user_id
    ),
    items AS MATERIALIZED (
        SELECT ps.t,
               CAST(count(*) AS BIGINT) AS n_rankings,
               CAST(sum(CASE WHEN ps.pos <= ks.k_u - 1 THEN 1
                             ELSE 0 END) AS BIGINT) AS wn,
               CAST(sum(CASE WHEN ps.pos = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_top1
        FROM positions ps JOIN ks USING (user_id)
        GROUP BY ps.t
    ),
    p0 AS MATERIALIZED (
        SELECT t, CAST(1000000 AS BIGINT) AS p FROM items),
    {mm_round(1).lstrip()},
    {mm_round(2).lstrip()}
    SELECT CAST(row_number() OVER (ORDER BY p2.p DESC, items.t)
                AS BIGINT) AS pref_rank,
           items.t AS event_type,
           items.n_rankings, items.wn AS n_chosen, items.n_top1,
           p2.p AS w_micro
    FROM items JOIN p2 ON p2.t = items.t
    ORDER BY pref_rank
    """


def _q455_mm_round(
    positions: DataFrame, ks: DataFrame, items: DataFrame,
    p_df: DataFrame,
) -> DataFrame:
    """One Plackett-Luce MM round at (user × |types|) grain:
    w -> w'. Suffix sums run in a per-user window (partitioned);
    the stage-membership join is a per-user pos range join."""
    pw = p_df.select(F.col("t"), F.col("p").alias("w"))
    wsuf = Window.partitionBy("user_id").orderBy(
        F.col("pos").desc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    dsum = (
        positions.join(F.broadcast(pw), "t")
        .select(
            "user_id",
            F.col("pos").alias("p"),
            F.sum("w").over(wsuf).cast("long").alias("d"),
        )
    )
    contrib = (
        positions.join(dsum, "user_id")
        .where(F.col("p") <= F.col("pos"))
        .join(ks, "user_id")
        .where(F.col("p") <= F.col("k_u") - 1)
        .select(
            "t", F.expr(_Q455_INV.format(d="d")).alias("term")
        )
    )
    pden = contrib.groupBy("t").agg(
        F.sum("term").cast("long").alias("dd")
    )
    praw = items.join(pden, "t").select(
        "t", F.expr(_Q455_PRAW.format(wn="wn", dd="dd")).alias("praw")
    )
    norm = praw.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("praw").cast("long").alias("sp"),
    )
    return (
        praw.crossJoin(F.broadcast(norm))
        .select(
            "t",
            F.expr(
                _Q443_PNORM.format(k="k", praw="praw", sp="sp")
            ).alias("p"),
        )
        .localCheckpoint(eager=True)
    )


@register("q455_plackett_luce_listwise", oracle=_q455_oracle())
def q455_plackett_luce_listwise(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PLACKETT-LUCE listwise preference fit — the k-way closure of
    the preference family (q428 pairwise → q443 ties → q447 position
    → q455 listwise): every user contributes a full RANKING of the
    event types (the Copeland order of the user's exact pairwise-mean
    tournament — division-free integer cross-products, deterministic
    tie-break), and PL strengths are fit by two Hunter 2004 MM
    rounds: w_i ← W_i / Σ_u Σ_{{stages p where i is in the pool}}
    1/D_{{u,p}}, with D the still-in-pool strength suffix sum. A
    ranking is worth k−1 choice events (the last pick is forced) —
    strictly more signal per user than any pairwise scheme extracts,
    which is why listwise fits dominate when full orderings exist.
    n_top1 rides along as the raw first-choice count the fitted
    strengths should (and here do) re-order only when later stages
    disagree.

    Scale: (user × |types|) grain end-to-end — the Copeland join is
    |types|² per user, the suffix sums are per-user partitioned
    windows, the stage join ≤|types|²/2 rows per user; strengths are
    broadcast maps and the MM rounds are bounded. Nothing
    corpus-sized shuffles beyond the one (user × type) rollup.
    """
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    ut = e.groupBy("user_id", F.col("event_type").alias("t")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("decimal(38,0)")).alias(
            "s"
        ),
    )
    a = ut.select(
        "user_id", F.col("t").alias("ta"), F.col("n").alias("na"),
        F.col("s").alias("sa"),
    )
    b = ut.select(
        "user_id", F.col("t").alias("tb"), F.col("n").alias("nb"),
        F.col("s").alias("sb"),
    )
    cope = (
        a.join(b, ["user_id"])
        .where(F.col("ta") != F.col("tb"))
        .groupBy("user_id", F.col("ta").alias("t"))
        .agg(
            F.sum(
                F.when(
                    F.col("sa") * F.col("nb") > F.col("sb") * F.col("na"),
                    1,
                ).otherwise(0)
            ).cast("long").alias("score")
        )
    )
    wpos = Window.partitionBy("user_id").orderBy(
        F.col("score").desc(), F.col("t")
    )
    positions = cope.select(
        "user_id", "t", F.row_number().over(wpos).cast("long").alias("pos")
    )
    positions = positions.localCheckpoint(eager=True)  # reused 2x/round
    ks = positions.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("k_u")
    )
    ks = ks.localCheckpoint(eager=True)
    items = (
        positions.join(ks, "user_id")
        .groupBy("t")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rankings"),
            F.sum(
                F.when(F.col("pos") <= F.col("k_u") - 1, 1).otherwise(0)
            ).cast("long").alias("wn"),
            F.sum(F.when(F.col("pos") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_top1"),
        )
    )
    items = items.localCheckpoint(eager=True)
    p_df = items.select("t", F.lit(1000000).cast("long").alias("p"))
    for _ in range(2):
        p_df = _q455_mm_round(positions, ks, items, p_df)
    return (
        items.join(p_df, "t")
        .select(
            F.row_number()
            .over(Window.orderBy(F.col("p").desc(), F.col("t")))
            .cast("long")
            .alias("pref_rank"),
            F.col("t").alias("event_type"),
            "n_rankings",
            F.col("wn").alias("n_chosen"),
            "n_top1",
            F.col("p").alias("w_micro"),
        )
        .orderBy("pref_rank")
    )


# ---- q457: repeated session-script (bot/replay) detection ----------------
_Q457_GAP_US = 30 * 60 * 1_000_000   # session break: 30-min inactivity
_Q457_BUCKET_US = 60 * 1_000_000     # gap fingerprint grain: 1 minute
_Q457_TOP = 25


@register(
    "q457_session_script_replay",
    oracle=f"""
    WITH ev AS MATERIALIZED (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        FROM events
    ),
    brk AS (
        SELECT user_id, event_id, event_type, ts_us,
               CASE WHEN lag(ts_us) OVER w IS NULL
                         OR ts_us - lag(ts_us) OVER w > {_Q457_GAP_US}
                    THEN 1 ELSE 0 END AS is_new,
               coalesce(ts_us - lag(ts_us) OVER w, 0) AS gap_us
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ),
    sess AS (
        SELECT user_id, event_id, event_type, ts_us,
               CASE WHEN is_new = 1 THEN 0 ELSE gap_us END AS gap_us,
               sum(is_new) OVER (PARTITION BY user_id
                                 ORDER BY ts_us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM brk
    ),
    scripts AS MATERIALIZED (
        SELECT user_id, sid,
               string_agg(event_type || '|' ||
                          CAST(gap_us // {_Q457_BUCKET_US} AS VARCHAR),
                          '>' ORDER BY ts_us, event_id) AS script,
               CAST(count(*) AS BIGINT) AS n_events
        FROM sess GROUP BY user_id, sid
    ),
    rep AS (
        SELECT script, any_value(n_events) AS n_events,
               CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM scripts GROUP BY script
    )
    SELECT md5(script) AS fingerprint, script,
           CAST(n_events AS BIGINT) AS n_events, n_sessions, n_users
    FROM rep
    WHERE n_sessions >= 2 AND n_users >= 2
    ORDER BY n_sessions DESC, script
    LIMIT {_Q457_TOP}
    """,
)
def q457_session_script_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REPEATED SESSION-SCRIPT detection — the bot/replay screen a
    production event pipeline runs before any engagement metric is
    trusted: sessions (30-min inactivity rule, q213's boundary
    semantics) are fingerprinted by their full behavioral script —
    the ordered event-type sequence WITH minute-bucketed inter-event
    gaps — and scripts executed by MULTIPLE users across multiple
    sessions are exactly what organic behavior doesn't produce:
    humans share coarse paths (q127's Markov view) but not
    gap-faithful replays. Emits the top {_Q457_TOP} shared scripts
    with session/user counts; the md5 fingerprint column is the key
    a blocklist or downstream join consumes. Timing buckets make the
    fingerprint robust to sub-minute jitter while still separating a
    10-second script from a 10-minute one — the dial between
    'same funnel' and 'same macro'.

    Scale: one per-user windowed pass to sessionize (partitioned by
    user — no global window), one hash agg to scripts (session
    grain), one to shared scripts; the report is top-{_Q457_TOP}
    (TakeOrdered). Script strings stay bounded by session length;
    at 100 TB the string_agg becomes the md5-chain rolling hash
    (q51's device) with identical semantics.
    """
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.unix_micros("ts").alias("ts_us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    brk = e.select(
        "user_id",
        "event_id",
        "event_type",
        "ts_us",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w) > _Q457_GAP_US),
            1,
        ).otherwise(0).alias("is_new"),
        F.coalesce(
            F.col("ts_us") - F.lag("ts_us").over(w), F.lit(0)
        ).alias("gap_us"),
    )
    sess = brk.select(
        "user_id",
        "event_id",
        "event_type",
        "ts_us",
        F.when(F.col("is_new") == 1, F.lit(0))
        .otherwise(F.col("gap_us"))
        .alias("gap_us"),
        F.sum("is_new")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sid"),
    )
    tok = F.concat_ws(
        "|",
        F.col("event_type"),
        F.expr(f"CAST(gap_us div {_Q457_BUCKET_US} AS STRING)"),
    )
    scripts = (
        sess.select("user_id", "sid", "ts_us", "event_id", tok.alias("tok"))
        .groupBy("user_id", "sid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts_us", "event_id", "tok")
                        )
                    ),
                    lambda s: s["tok"],
                ),
                ">",
            ).alias("script"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
    )
    rep = scripts.groupBy("script").agg(
        F.first("n_events").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )
    return (
        rep.where((F.col("n_sessions") >= 2) & (F.col("n_users") >= 2))
        .select(
            F.md5("script").alias("fingerprint"),
            "script",
            "n_events",
            "n_sessions",
            "n_users",
        )
        .orderBy(F.desc("n_sessions"), "script")
        .limit(_Q457_TOP)
    )


# ---- q459: multi-column Z-order layout EXECUTED (file-grain gate) -------
# The q442 pattern at FILE grain (r13 verdict item #1): q433/q442 close
# the advise→execute→verify loop for the PARTITION-directory axis; this
# closes it for the second layout axis — multi-column clustering inside
# the files, where pruning comes from parquet min/max footer statistics
# instead of directory names. Three candidate layouts over a
# two-column workload: single-column sorts (perfect on their own axis,
# blind on the other) vs the bit-interleaved Z-curve (equi-depth
# Morton over BOTH axes — operators/layout.py's design, reproduced
# here with exact ntile ranks so file contents are a pure function of
# the data and the DuckDB oracle can price every file envelope
# bit-identically; the production path keeps the approxQuantile
# sketch + repartitionByRange of layout.write_zordered, gated by the
# physical-property test in tests/test_layout.py).
_Q459_B = 256      # equi-depth buckets per axis (8 Morton bits each)
_Q459_NF = 16      # clustered files written
# workload: predicate SQL (both engines) + file-envelope survival SQL
# (a file is READ iff every constrained axis interval intersects its
# [min,max] footer envelope — exactly parquet row-group pruning)
_Q459_WORKLOAD = {
    "u_slice": "user_id BETWEEN 3 AND 7",
    "v_slice": "vc BETWEEN 1000 AND 3000",
    "uv_box": "user_id BETWEEN 0 AND 7 AND vc BETWEEN 5000 AND 15000",
}
_Q459_SURVIVES = {
    "u_slice": "uhi >= 3 AND ulo <= 7",
    "v_slice": "vhi >= 1000 AND vlo <= 3000",
    "uv_box": "uhi >= 0 AND ulo <= 7 AND vhi >= 5000 AND vlo <= 15000",
}
# python-side twin of the survival SQL: {workload: {axis: (lo, hi)}}
_Q459_BOX = {
    "u_slice": {"u": (3, 7)},
    "v_slice": {"v": (1000, 3000)},
    "uv_box": {"u": (0, 7), "v": (5000, 15000)},
}
_Q459_LAYOUTS = ("sort_u", "sort_v", "zorder_uv")


def _q459_oracle() -> str:
    from g_etl_spark.queries.grid import _morton_sql

    cells = " UNION ALL ".join(
        f"""SELECT layout, '{w}' AS workload,
            CAST(count(*) FILTER ({surv}) AS BIGINT) AS files_read,
            CAST(coalesce(sum(n) FILTER ({surv}), 0) AS BIGINT)
                AS rows_scanned
        FROM env GROUP BY layout"""
        for w, surv in _Q459_SURVIVES.items()
    )
    matches = " UNION ALL ".join(
        f"SELECT '{w}' AS workload, CAST(count(*) FILTER ({p}) AS BIGINT)"
        " AS n_match FROM base"
        for w, p in _Q459_WORKLOAD.items()
    )
    return f"""
    WITH base AS MATERIALIZED (
        SELECT event_id, user_id, CAST(round(value * 100) AS BIGINT) AS vc
        FROM events WHERE value IS NOT NULL
    ),
    bkt AS MATERIALIZED (
        SELECT event_id, user_id, vc,
               ntile({_Q459_B}) OVER (ORDER BY vc, event_id) - 1 AS bx,
               ntile({_Q459_B}) OVER (ORDER BY user_id, event_id) - 1 AS by
        FROM base
    ),
    fids AS MATERIALIZED (
        SELECT user_id, vc,
               ntile({_Q459_NF}) OVER (
                   ORDER BY {_morton_sql("bx", "by", 8)}, event_id) - 1
                   AS f_zorder_uv,
               ntile({_Q459_NF}) OVER (ORDER BY user_id, event_id) - 1
                   AS f_sort_u,
               ntile({_Q459_NF}) OVER (ORDER BY vc, event_id) - 1
                   AS f_sort_v
        FROM bkt
    ),
    env AS MATERIALIZED (
        SELECT layout, fid, min(user_id) AS ulo, max(user_id) AS uhi,
               min(vc) AS vlo, max(vc) AS vhi, count(*) AS n
        FROM (
            SELECT 'zorder_uv' AS layout, f_zorder_uv AS fid, user_id, vc
            FROM fids
            UNION ALL SELECT 'sort_u', f_sort_u, user_id, vc FROM fids
            UNION ALL SELECT 'sort_v', f_sort_v, user_id, vc FROM fids
        ) GROUP BY layout, fid
    ),
    cells AS MATERIALIZED ({cells}),
    choice AS (
        SELECT layout FROM cells
        GROUP BY layout ORDER BY sum(rows_scanned), layout LIMIT 1
    ),
    matches AS ({matches}),
    nf AS (SELECT CAST(least({_Q459_NF}, count(*)) AS BIGINT) AS n_files
           FROM base)
    SELECT c.layout, c.workload, nf.n_files, c.files_read,
           c.rows_scanned, m.n_match
    FROM cells c JOIN choice ch ON c.layout = ch.layout
    JOIN matches m ON m.workload = c.workload
    CROSS JOIN nf
    ORDER BY c.workload
    """


def _q459_scan_rows(df) -> int:
    """Engine-reported numOutputRows summed over df's executed scan
    leaves — the rows the parquet reader MATERIALIZED after footer
    (row-group/page) pruning. Call AFTER an action ran through df's
    own plan (q442's metric discipline)."""
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    rows = 0
    for i in range(leaves.size()):
        mets = leaves.apply(i).metrics()
        it = mets.iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() == "numOutputRows":
                rows += kv._2().value()
    return rows


@register("q459_zorder_layout_executed", oracle=_q459_oracle())
def q459_zorder_layout_executed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MULTI-COLUMN Z-ORDER layout choice EXECUTED, hash-gated — the
    file-grain twin of q442: the advisor prices three candidate
    clustered layouts (sort by user_id / sort by vc / equi-depth
    Morton Z-order over both) against a two-axis workload by
    computing every candidate file's [min,max] envelope (bounded
    ≤ |layouts|×{_Q459_NF}-row observe, the q422/q442 precedent),
    picks the total-rows-scanned argmin, WRITES that layout as
    {_Q459_NF} clustered parquet files, and re-runs every workload
    predicate against the real files. The gate compares, per
    workload: the ENGINE's own scan numOutputRows after the filtered
    read executed (= rows materialized after parquet footer pruning
    — each file is one row group and one page at registry scale, so
    row-group skipping IS file skipping), the pyarrow-footer count
    of surviving files, and the on-disk file count — all against
    the advisor's priced integers. Real footer pruning must equal
    priced pruning exactly: a torn write, a stats-free column, a
    sort that didn't happen, or an unpushed filter all break the
    hash. On this corpus the Z-order candidate WINS the workload
    total at both SFs (its file envelopes stay narrow on BOTH axes
    where each sort is blind off-axis) — the multi-column claim of
    operators/layout.py, engine-verified.

    File assignment uses exact ntile ranks (pure function of the
    data → cross-engine bit-identical envelopes); the single-
    partition rank sorts are the price of exactness at gate scale.
    The 100 TB path is layout.write_zordered: approxQuantile bucket
    bounds + repartitionByRange — same curve, sketch-grade edges,
    no global sort — gated by the physical-property test in
    tests/test_layout.py since r7 and the engine-metric test added
    this round.
    """
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from g_etl_spark.queries.grid import _morton_sql

    e = (
        load(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("vc"),
        )
    )
    schema = (
        "layout string, workload string, n_files long, files_read long,"
        " rows_scanned long, n_match long"
    )
    # one WindowExec (one sort) per ORDERING: the 256-bucket axis rank
    # and that axis's 16-file sort id share their window spec, so the
    # five ntiles cost three sorts, not five (measured 34 s -> 7 s at
    # the ×25 probe)
    wv = Window.orderBy("vc", "event_id")
    wu = Window.orderBy("user_id", "event_id")
    bkt = e.select(
        "event_id",
        "user_id",
        "vc",
        (F.ntile(_Q459_B).over(wv) - 1).alias("bx"),
        (F.ntile(_Q459_NF).over(wv) - 1).alias("f_sort_v"),
        (F.ntile(_Q459_B).over(wu) - 1).alias("by"),
        (F.ntile(_Q459_NF).over(wu) - 1).alias("f_sort_u"),
    )
    zc = bkt.withColumn("z", F.expr(_morton_sql("bx", "by", 8)))
    fids = zc.select(
        "event_id",
        "user_id",
        "vc",
        "f_sort_u",
        "f_sort_v",
        (F.ntile(_Q459_NF).over(Window.orderBy("z", "event_id")) - 1)
        .alias("f_zorder_uv"),
    )
    # emptiness is decided on the CHEAP source scan (row-preserving
    # projections/windows between e and fids cannot change it) — the
    # previous fids.isEmpty() executed the three global rank sorts and
    # then localCheckpoint recomputed the same plan, running the most
    # expensive stage twice
    if e.isEmpty():
        return spark.createDataFrame([], schema)
    fids = fids.localCheckpoint()  # three rank sorts run once
    env = None
    for layout in _Q459_LAYOUTS:
        part = (
            fids.groupBy(F.col(f"f_{layout}").alias("fid"))
            .agg(
                F.min("user_id").alias("ulo"),
                F.max("user_id").alias("uhi"),
                F.min("vc").alias("vlo"),
                F.max("vc").alias("vhi"),
                F.count(F.lit(1)).alias("n"),
            )
            .withColumn("layout", F.lit(layout))
        )
        env = part if env is None else env.unionByName(part)
    # bounded advisor observe: ≤ |layouts| × NF envelope rows
    env_rows = env.collect()

    def _survives(r, wname):
        box = _Q459_BOX[wname]
        for axis, (lo, hi) in box.items():
            flo, fhi = (r["ulo"], r["uhi"]) if axis == "u" else (
                r["vlo"], r["vhi"])
            if fhi < lo or flo > hi:
                return False
        return True

    priced = {}  # (layout, workload) -> [files_read, rows_scanned]
    for r in env_rows:
        for wname in _Q459_WORKLOAD:
            key = (r["layout"], wname)
            cell = priced.setdefault(key, [0, 0])
            if _survives(r, wname):
                cell[0] += 1
                cell[1] += r["n"]
    totals = {
        layout: sum(priced[(layout, w)][1] for w in _Q459_WORKLOAD)
        for layout in _Q459_LAYOUTS
    }
    chosen = min(sorted(totals), key=lambda k: totals[k])

    out_dir = _tempfile.mkdtemp(prefix="g_etl_zorder_exec_")
    try:
        (
            fids.select(
                "event_id", "user_id", "vc",
                F.col(f"f_{chosen}").alias("fid"),
            )
            .repartition("fid")
            .write.partitionBy("fid")
            .mode("overwrite")
            .parquet(out_dir)
        )
        # recursiveFileLookup: NO partition-column inference — the fid
        # directory names carry no pruning power, footer stats are the
        # only prune available to the probe scans
        back = spark.read.option("recursiveFileLookup", "true").parquet(
            out_dir
        )
        from g_etl_spark.operators import layout as L

        stats = L.file_stats(out_dir, ["user_id", "vc"])
        # n_files from the SAME pruned enumeration that produced the
        # envelopes (one entry per file): a separate unpruned os.walk
        # would desynchronize n_files from files_read if an
        # interrupted write left _temporary/hidden files behind
        n_files = len(stats)
        rows = []
        aqe_key = "spark.sql.adaptive.enabled"
        aqe_old = spark.conf.get(aqe_key)
        spark.conf.set(aqe_key, "false")
        try:
            for wname, pred in _Q459_WORKLOAD.items():
                probe = back.filter(F.expr(pred)).agg(
                    F.count(F.lit(1)).cast("long").alias("n")
                )
                n_match = probe.collect()[0]["n"]
                scanned = _q459_scan_rows(probe)
                files_read = sum(
                    1
                    for envf in stats
                    if all(
                        not (
                            envf[c][1] < lo or envf[c][0] > hi
                        )
                        for axis, (lo, hi) in _Q459_BOX[wname].items()
                        for c in (("user_id",) if axis == "u" else ("vc",))
                    )
                )
                rows.append(
                    (chosen, wname, n_files, files_read, scanned, n_match)
                )
        finally:
            spark.conf.set(aqe_key, aqe_old)
        return spark.createDataFrame(
            sorted(rows, key=lambda r: r[1]), schema
        )
    finally:
        _shutil.rmtree(out_dir, ignore_errors=True)


# ---- q467: partition-layout drift monitor --------------------------------
# q433 prices layouts on the WHOLE corpus; a deployed layout must be
# re-checked as data arrives. Fixed epoch boundary (mid-corpus):
_Q467_SPLIT = "TIMESTAMP '2024-01-15 00:00:00'"
_Q467_HALVES = {
    "early": f"ts < {_Q467_SPLIT}",
    "late": f"ts >= {_Q467_SPLIT}",
}


def _q467_oracle() -> str:
    aggs = []
    for h, hp in _Q467_HALVES.items():
        aggs.append(f"CAST(count(*) FILTER ({hp}) AS BIGINT) AS n_{h}")
        for layout, key in _Q433_LAYOUTS.items():
            aggs.append(
                f"CAST(count(DISTINCT CASE WHEN {hp} THEN {key} END)"
                f" AS BIGINT) AS np_{h}_{layout}"
            )
            for wname in _Q433_WORKLOAD:
                scan = _Q433_SCAN.get((layout, wname))
                if scan is not None:
                    aggs.append(
                        f"CAST(count(*) FILTER (({hp}) AND ({scan}))"
                        f" AS BIGINT) AS s_{h}_{layout}_{wname}"
                    )
    cells = []
    for h in _Q467_HALVES:
        for layout in _Q433_LAYOUTS:
            terms = []
            for wname in _Q433_WORKLOAD:
                if (layout, wname) in _Q433_SCAN:
                    terms.append(f"s_{h}_{layout}_{wname}")
                else:
                    terms.append(f"n_{h}")
            cells.append(
                f"SELECT '{h}' AS half, '{layout}' AS layout,"
                f" CAST({' + '.join(terms)} AS BIGINT) AS rows_scanned,"
                f" np_{h}_{layout} AS n_partitions FROM stats"
            )
    return f"""
    WITH stats AS (SELECT {", ".join(aggs)} FROM events),
    cells AS ({" UNION ALL ".join(cells)}),
    choice AS (
        SELECT half, layout AS chosen FROM (
            SELECT half, layout,
                   row_number() OVER (PARTITION BY half
                                      ORDER BY rows_scanned, layout) AS rn
            FROM cells) WHERE rn = 1
    ),
    flip AS (
        SELECT count(DISTINCT chosen) > 1 AS layout_flipped FROM choice
    )
    SELECT c.half, c.layout, c.rows_scanned, c.n_partitions,
           c.layout = ch.chosen AS is_chosen, f.layout_flipped
    FROM cells c JOIN choice ch USING (half) CROSS JOIN flip f
    ORDER BY c.half, c.layout
    """


@register("q467_layout_drift_monitor", oracle=_q467_oracle())
def q467_layout_drift_monitor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PARTITION-LAYOUT DRIFT monitor — the maintenance loop around
    q433/q442: a layout chosen once is a bet that the workload-vs-
    data geometry stays put, so the advisor's pricing block is
    re-run PER EPOCH (here: the corpus split at {_Q467_SPLIT} — in
    production, yesterday vs history) and the argmin compared. Each
    (epoch, layout) row carries the priced scan cost and partition
    count; is_chosen marks each epoch's winner and layout_flipped is
    the row a scheduler alerts on — a flip means the deployed layout
    is now paying the wrong pruning — and this fixture genuinely
    flips (type → day): the workload's date predicates live in the
    early half, so in the late epoch the day layout prunes them to
    ZERO rows and overtakes the type layout, exactly how a
    time-boxed dashboard mix re-prices layouts as data ages past
    its date windows.

    Scale: ONE scan computes every (epoch × layout × workload)
    statistic as FILTERed aggregates (q433's one-pass block, halved
    — still a single combining aggregate, no second corpus pass);
    the argmin/flip assembly is |epochs|×|layouts| arithmetic on a
    1-row observe (q442's bounded-collect precedent).
    """
    e = load(spark, sf_dir, "events")
    aggs = []
    for h, hp in _Q467_HALVES.items():
        aggs.append(
            F.sum(F.expr(f"CASE WHEN {hp} THEN 1 ELSE 0 END"))
            .cast("long")
            .alias(f"n_{h}")
        )
        for layout, key in _Q433_LAYOUTS.items():
            aggs.append(
                F.countDistinct(
                    F.expr(f"CASE WHEN {hp} THEN {key} END")
                ).cast("long").alias(f"np_{h}_{layout}")
            )
            for wname in _Q433_WORKLOAD:
                scan = _Q433_SCAN.get((layout, wname))
                if scan is not None:
                    aggs.append(
                        F.sum(
                            F.expr(
                                f"CASE WHEN ({hp}) AND ({scan})"
                                " THEN 1 ELSE 0 END"
                            )
                        ).cast("long").alias(f"s_{h}_{layout}_{wname}")
                    )
    stats = e.agg(*aggs).collect()[0]  # 1-row bounded observe

    cells = []
    for h in _Q467_HALVES:
        for layout in _Q433_LAYOUTS:
            total = 0
            for wname in _Q433_WORKLOAD:
                if (layout, wname) in _Q433_SCAN:
                    total += stats[f"s_{h}_{layout}_{wname}"] or 0
                else:
                    total += stats[f"n_{h}"] or 0
            cells.append(
                (h, layout, total, stats[f"np_{h}_{layout}"] or 0)
            )
    chosen = {
        h: min(
            (c for c in cells if c[0] == h), key=lambda c: (c[2], c[1])
        )[1]
        for h in _Q467_HALVES
    }
    flipped = len(set(chosen.values())) > 1
    return spark.createDataFrame(
        [
            (h, layout, total, np, layout == chosen[h], flipped)
            for h, layout, total, np in sorted(cells)
        ],
        "half string, layout string, rows_scanned long,"
        " n_partitions long, is_chosen boolean, layout_flipped boolean",
    )


# ---- q470: Kaplan-Meier product-limit survival table --------------------
_Q470_TOP = 40   # first K event-time steps emitted


@register(
    "q470_kaplan_meier_gaps",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, epoch_us(ts) AS ts_us FROM events
    ),
    gaps AS (
        SELECT user_id,
               (ts_us - lag(ts_us) OVER (PARTITION BY user_id
                                         ORDER BY ts_us, user_id))
                   // 3600000000 AS t_h,
               FALSE AS censored
        FROM ev
        QUALIFY lag(ts_us) OVER (PARTITION BY user_id
                                 ORDER BY ts_us, user_id) IS NOT NULL
    ),
    tail AS (
        SELECT e.user_id,
               ((SELECT max(ts_us) FROM ev) - max(e.ts_us))
                   // 3600000000 AS t_h,
               TRUE AS censored
        FROM ev e GROUP BY e.user_id
    ),
    durs AS (
        SELECT t_h, censored FROM gaps
        UNION ALL SELECT t_h, censored FROM tail
    ),
    att AS (
        SELECT t_h,
               CAST(sum(CASE WHEN censored THEN 0 ELSE 1 END) AS BIGINT)
                   AS d,
               CAST(sum(CASE WHEN censored THEN 1 ELSE 0 END) AS BIGINT)
                   AS c
        FROM durs GROUP BY t_h
    ),
    risk AS (
        SELECT t_h, d, c,
               CAST((SELECT count(*) FROM durs)
                   - coalesce(sum(d + c) OVER (ORDER BY t_h
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
        FROM att
    ),
    steps AS (
        SELECT t_h, n_risk, d, c,
               CAST(round(1000000 * ln(CAST(n_risk - d AS DOUBLE)
                                       / n_risk)) AS BIGINT)
                   AS ln_step_micro
        FROM risk WHERE d > 0 AND n_risk > d
    )
    SELECT CAST(t_h AS BIGINT) AS t_hours, n_risk, d AS n_events,
           c AS n_censored_at_t, ln_step_micro,
           CAST(sum(ln_step_micro) OVER (ORDER BY t_h
                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS ln_surv_micro
    FROM steps ORDER BY t_hours LIMIT {_Q470_TOP}
    """,
)
def q470_kaplan_meier_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KAPLAN-MEIER product-limit estimator over inter-event gaps —
    the nonparametric companion to q245's exponential MLE (which
    assumes constant hazard; K-M assumes nothing): durations = per-
    user gaps between consecutive events (hour-quantized), right-
    CENSORED by each user's tail (last event → corpus end, the
    observation-window truncation a rate estimate must not count as
    a real gap). At each event time t: n_risk (durations ≥ t), d
    (events at t), and the survival curve as the running product
    Π(1 − d/n) — carried in LOG space as exact micro-nat integers
    (round(1e6·ln((n−d)/n)) per step, integer cumsum), the house
    likelihood discipline: the curve is bit-identical across
    engines with no libm exp in the gate. First {_Q470_TOP} steps
    emitted — the short-gap region where retention decisions live.

    Scale: gaps are one per-user window pass (user-partitioned);
    the K-M table itself lives at |distinct hours| grain — the
    unpartitioned risk-set window runs on that AGGREGATED relation,
    not the corpus (the q429 audit-grain contract; per-cohort
    production runs partition by cohort).
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("ts_us")
    )
    wu = Window.partitionBy("user_id").orderBy("ts_us", "user_id")
    gaps = (
        ev.withColumn("prev", F.lag("ts_us").over(wu))
        .where(F.col("prev").isNotNull())
        .select(
            F.expr("(ts_us - prev) div 3600000000").alias("t_h"),
            F.lit(False).alias("censored"),
        )
    )
    mx = ev.agg(F.max("ts_us").alias("mx"))
    tail = (
        ev.groupBy("user_id")
        .agg(F.max("ts_us").alias("last_us"))
        .crossJoin(F.broadcast(mx))
        .select(
            F.expr("(mx - last_us) div 3600000000").alias("t_h"),
            F.lit(True).alias("censored"),
        )
    )
    durs = gaps.unionByName(tail)
    att = durs.groupBy("t_h").agg(
        F.sum(F.when(F.col("censored"), 0).otherwise(1))
        .cast("long")
        .alias("d"),
        F.sum(F.when(F.col("censored"), 1).otherwise(0))
        .cast("long")
        .alias("c"),
    )
    tot = durs.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    wt = Window.orderBy("t_h")
    risk = att.crossJoin(F.broadcast(tot)).withColumn(
        "n_risk",
        F.col("n_total")
        - F.coalesce(
            F.sum(F.col("d") + F.col("c")).over(
                wt.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    steps = risk.where(
        (F.col("d") > 0) & (F.col("n_risk") > F.col("d"))
    ).withColumn(
        "ln_step_micro",
        F.expr(
            "CAST(round(1000000 * ln(CAST(n_risk - d AS DOUBLE) / n_risk))"
            " AS BIGINT)"
        ),
    )
    return (
        steps.select(
            F.col("t_h").cast("long").alias("t_hours"),
            F.col("n_risk").cast("long").alias("n_risk"),
            F.col("d").alias("n_events"),
            F.col("c").alias("n_censored_at_t"),
            "ln_step_micro",
            F.sum("ln_step_micro")
            .over(wt.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long")
            .alias("ln_surv_micro"),
        )
        .orderBy("t_hours")
        .limit(_Q470_TOP)
    )


# ---- q471: two-sample log-rank test over the K-M risk tables ------------
@register(
    "q471_logrank_cohort_test",
    oracle="""
    WITH ev AS (
        SELECT user_id, user_id % 2 = 1 AS b_cohort, epoch_us(ts) AS ts_us
        FROM events
    ),
    gaps AS (
        SELECT b_cohort,
               (ts_us - lag(ts_us) OVER (PARTITION BY user_id
                                         ORDER BY ts_us, user_id))
                   // 3600000000 AS t_h,
               FALSE AS censored
        FROM ev
        QUALIFY lag(ts_us) OVER (PARTITION BY user_id
                                 ORDER BY ts_us, user_id) IS NOT NULL
    ),
    tail AS (
        SELECT any_value(b_cohort) AS b_cohort,
               ((SELECT max(ts_us) FROM ev) - max(ts_us)) // 3600000000
                   AS t_h,
               TRUE AS censored
        FROM ev GROUP BY user_id
    ),
    durs AS (
        SELECT b_cohort, t_h, censored FROM gaps
        UNION ALL SELECT b_cohort, t_h, censored FROM tail
    ),
    att AS (
        SELECT t_h,
               CAST(sum(CASE WHEN NOT censored AND NOT b_cohort
                             THEN 1 ELSE 0 END) AS BIGINT) AS d_a,
               CAST(sum(CASE WHEN NOT censored AND b_cohort
                             THEN 1 ELSE 0 END) AS BIGINT) AS d_b,
               CAST(sum(CASE WHEN NOT b_cohort THEN 1 ELSE 0 END)
                   AS BIGINT) AS x_a,
               CAST(sum(CASE WHEN b_cohort THEN 1 ELSE 0 END)
                   AS BIGINT) AS x_b
        FROM durs GROUP BY t_h
    ),
    risk AS (
        SELECT t_h, d_a, d_b,
               CAST((SELECT count(*) FROM durs WHERE NOT b_cohort)
                   - coalesce(sum(x_a) OVER (ORDER BY t_h
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS BIGINT) AS n_a,
               CAST((SELECT count(*) FROM durs WHERE b_cohort)
                   - coalesce(sum(x_b) OVER (ORDER BY t_h
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS BIGINT) AS n_b
        FROM att
    ),
    terms AS (
        SELECT d_a, d_b, n_a, n_b, d_a + d_b AS d, n_a + n_b AS n,
               CAST(round(1000000.0 * (d_a + d_b) * n_a / (n_a + n_b))
                   AS BIGINT) AS e_a_micro,
               CASE WHEN n_a + n_b > 1 THEN
                   CAST(round(1000000.0 * (d_a + d_b)
                              * (CAST(n_a AS DOUBLE) / (n_a + n_b))
                              * (CAST(n_b AS DOUBLE) / (n_a + n_b))
                              * (n_a + n_b - d_a - d_b)
                              / (n_a + n_b - 1)) AS BIGINT)
                   ELSE 0 END AS v_micro
        FROM risk WHERE d_a + d_b > 0
    )
    SELECT CAST(count(*) AS BIGINT) AS n_times,
           CAST(sum(d_a) AS BIGINT) AS events_a,
           CAST(sum(d_b) AS BIGINT) AS events_b,
           CAST(sum(e_a_micro) AS BIGINT) AS expected_a_micro,
           CAST(sum(v_micro) AS BIGINT) AS variance_micro,
           CAST(round(1000.0
                      * (CAST(sum(d_a) AS DOUBLE) * 1000000
                         - sum(e_a_micro))
                      * (CAST(sum(d_a) AS DOUBLE) * 1000000
                         - sum(e_a_micro))
                      / (CAST(sum(v_micro) AS DOUBLE) * 1000000))
               AS BIGINT) AS chi2_milli,
           round(1000.0 * (CAST(sum(d_a) AS DOUBLE) * 1000000
                           - sum(e_a_micro))
                 * (CAST(sum(d_a) AS DOUBLE) * 1000000 - sum(e_a_micro))
                 / (CAST(sum(v_micro) AS DOUBLE) * 1000000))
               > 3841 AS reject_5pct
    FROM terms
    """,
)
def q471_logrank_cohort_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-SAMPLE LOG-RANK test — does cohort B's gap-survival curve
    differ from cohort A's (q245's odd/even user split, q470's
    censored durations)?  The Mantel-Cox machinery exactly: at each
    event time, B and A share a risk table; under H₀ the d events
    split between cohorts hypergeometrically, so O_A − E_A
    accumulates with variance Σ d·(n_A/n)·(n_B/n)·(n−d)/(n−1), and
    χ² = (O−E)²/V against 3.841 (5%, 1 dof). Every per-time term is
    micro-quantized off exact integer risk counts BEFORE summation
    (the q443 discipline), so the statistic is reproducible to the
    milli across engines — no resampling, no libm beyond one final
    division of exact sums.

    Scale: identical grain to q470 — one per-user window pass for
    gaps, then everything lives at |distinct hours| grain; the
    result is ONE row. The test composes with any cohort key
    (experiment arm, device class) by swapping the b_cohort
    predicate.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        (F.col("user_id") % 2 == 1).alias("b_cohort"),
        F.unix_micros("ts").alias("ts_us"),
    )
    wu = Window.partitionBy("user_id").orderBy("ts_us", "user_id")
    gaps = (
        ev.withColumn("prev", F.lag("ts_us").over(wu))
        .where(F.col("prev").isNotNull())
        .select(
            "b_cohort",
            F.expr("(ts_us - prev) div 3600000000").alias("t_h"),
            F.lit(False).alias("censored"),
        )
    )
    mx = ev.agg(F.max("ts_us").alias("mx"))
    tail = (
        ev.groupBy("user_id")
        .agg(
            F.first("b_cohort").alias("b_cohort"),
            F.max("ts_us").alias("last_us"),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            "b_cohort",
            F.expr("(mx - last_us) div 3600000000").alias("t_h"),
            F.lit(True).alias("censored"),
        )
    )
    durs = gaps.unionByName(tail)
    att = durs.groupBy("t_h").agg(
        F.sum(
            F.when(~F.col("censored") & ~F.col("b_cohort"), 1).otherwise(0)
        ).cast("long").alias("d_a"),
        F.sum(
            F.when(~F.col("censored") & F.col("b_cohort"), 1).otherwise(0)
        ).cast("long").alias("d_b"),
        F.sum(F.when(~F.col("b_cohort"), 1).otherwise(0))
        .cast("long")
        .alias("x_a"),
        F.sum(F.when(F.col("b_cohort"), 1).otherwise(0))
        .cast("long")
        .alias("x_b"),
    )
    tot = durs.agg(
        F.sum(F.when(~F.col("b_cohort"), 1).otherwise(0))
        .cast("long")
        .alias("tot_a"),
        F.sum(F.when(F.col("b_cohort"), 1).otherwise(0))
        .cast("long")
        .alias("tot_b"),
    )
    wt = Window.orderBy("t_h")
    risk = (
        att.crossJoin(F.broadcast(tot))
        .withColumn(
            "n_a",
            (
                F.col("tot_a")
                - F.coalesce(
                    F.sum("x_a").over(
                        wt.rowsBetween(Window.unboundedPreceding, -1)
                    ),
                    F.lit(0),
                )
            ).cast("long"),
        )
        .withColumn(
            "n_b",
            (
                F.col("tot_b")
                - F.coalesce(
                    F.sum("x_b").over(
                        wt.rowsBetween(Window.unboundedPreceding, -1)
                    ),
                    F.lit(0),
                )
            ).cast("long"),
        )
    )
    terms = risk.where(F.col("d_a") + F.col("d_b") > 0).select(
        "d_a",
        "d_b",
        F.expr(
            "CAST(round(1000000.0 * (d_a + d_b) * n_a / (n_a + n_b))"
            " AS BIGINT)"
        ).alias("e_a_micro"),
        F.expr(
            "CASE WHEN n_a + n_b > 1 THEN"
            " CAST(round(1000000.0 * (d_a + d_b)"
            " * (CAST(n_a AS DOUBLE) / (n_a + n_b))"
            " * (CAST(n_b AS DOUBLE) / (n_a + n_b))"
            " * (n_a + n_b - d_a - d_b)"
            " / (n_a + n_b - 1)) AS BIGINT) ELSE 0 END"
        ).alias("v_micro"),
    )
    chi2 = (
        "round(1000.0"
        " * (CAST(sum(d_a) AS DOUBLE) * 1000000 - sum(e_a_micro))"
        " * (CAST(sum(d_a) AS DOUBLE) * 1000000 - sum(e_a_micro))"
        " / (CAST(sum(v_micro) AS DOUBLE) * 1000000))"
    )
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_times"),
        F.sum("d_a").cast("long").alias("events_a"),
        F.sum("d_b").cast("long").alias("events_b"),
        F.sum("e_a_micro").cast("long").alias("expected_a_micro"),
        F.sum("v_micro").cast("long").alias("variance_micro"),
        F.expr(f"CAST({chi2} AS BIGINT)").alias("chi2_milli"),
        F.expr(f"{chi2} > 3841").alias("reject_5pct"),
    )


# ---- q472: append-delta pruning debt (when to re-OPTIMIZE) --------------
_Q472_SPLIT = _Q467_SPLIT          # base/delta epoch boundary
_Q472_DELTA_NF = 4                 # unsorted delta files appended


def _q472_oracle() -> str:
    from g_etl_spark.queries.grid import _morton_sql

    cells = " UNION ALL ".join(
        f"""SELECT '{w}' AS workload,
            CAST(count(*) FILTER ({surv}) AS BIGINT) AS files_read,
            CAST(coalesce(sum(n) FILTER ({surv} AND grp = 'base'), 0)
                AS BIGINT) AS rows_base,
            CAST(coalesce(sum(n) FILTER ({surv} AND grp = 'delta'), 0)
                AS BIGINT) AS rows_delta
        FROM env"""
        for w, surv in _Q459_SURVIVES.items()
    )
    matches = " UNION ALL ".join(
        f"SELECT '{w}' AS workload, CAST(count(*) FILTER ({p}) AS BIGINT)"
        " AS n_match FROM allrows"
        for w, p in _Q459_WORKLOAD.items()
    )
    return f"""
    WITH allrows AS MATERIALIZED (
        SELECT event_id, user_id, CAST(round(value * 100) AS BIGINT) AS vc,
               ts < {_Q472_SPLIT} AS is_base
        FROM events WHERE value IS NOT NULL
    ),
    bkt AS MATERIALIZED (
        SELECT event_id, user_id, vc,
               ntile({_Q459_B}) OVER (ORDER BY vc, event_id) - 1 AS bx,
               ntile({_Q459_B}) OVER (ORDER BY user_id, event_id) - 1
                   AS by
        FROM allrows WHERE is_base
    ),
    fids AS MATERIALIZED (
        SELECT user_id, vc, 'base' AS grp,
               ntile({_Q459_NF}) OVER (
                   ORDER BY {_morton_sql("bx", "by", 8)}, event_id) - 1
                   AS fid
        FROM bkt
        UNION ALL
        SELECT user_id, vc, 'delta', event_id % {_Q472_DELTA_NF}
        FROM allrows WHERE NOT is_base
    ),
    env AS MATERIALIZED (
        SELECT grp, fid, min(user_id) AS ulo, max(user_id) AS uhi,
               min(vc) AS vlo, max(vc) AS vhi, count(*) AS n
        FROM fids GROUP BY grp, fid
    ),
    cells AS MATERIALIZED ({cells}),
    matches AS ({matches}),
    nf AS (SELECT CAST(count(*) AS BIGINT) AS n_files FROM env)
    SELECT c.workload, nf.n_files, c.files_read,
           CAST(c.rows_base + c.rows_delta AS BIGINT) AS rows_scanned,
           c.rows_base, c.rows_delta, m.n_match,
           CAST(round(1000.0 * c.rows_delta
                      / greatest(c.rows_base + c.rows_delta, 1))
               AS BIGINT) AS delta_scan_share_milli
    FROM cells c JOIN matches m USING (workload) CROSS JOIN nf
    ORDER BY c.workload
    """


@register("q472_append_delta_pruning_debt", oracle=_q472_oracle())
def q472_append_delta_pruning_debt(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """APPEND-DELTA PRUNING DEBT, engine-measured — the layout
    lifecycle's last gap: q459 writes the Z-ordered base, q467 says
    WHEN the workload re-prices, and real tables decay between
    rewrites because appends land UNSORTED. Here the early epoch is
    written as q459's 16 Z-ordered files, the late epoch appended as
    {_Q472_DELTA_NF} arrival-order files (event-hash assignment —
    the shape a streaming sink actually produces), and every q459
    workload predicate is re-run against the COMBINED read: the
    engine's scan numOutputRows must equal base-envelope pruning
    plus the delta's (unprunable) envelope arithmetic exactly, and
    delta_scan_share_milli is the re-OPTIMIZE trigger — the fraction
    of every query's scan that the unsorted tail now costs. A
    compaction policy reads this row: when the share crosses its
    budget, re-run q459's rewrite over base+delta.

    Scale: identical machinery to q459 (exact ntile ranks for
    cross-engine file contents, one clustered write + one append,
    AQE-off probes, bounded metric collection); the combined read is
    ONE multi-path scan, so the measured number is precisely what
    production pays per query between compactions.
    """
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from g_etl_spark.queries.grid import _morton_sql

    e = (
        load(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("vc"),
            F.expr(f"ts < {_Q472_SPLIT}").alias("is_base"),
        )
    )
    schema = (
        "workload string, n_files long, files_read long,"
        " rows_scanned long, rows_base long, rows_delta long,"
        " n_match long, delta_scan_share_milli long"
    )
    base = e.where("is_base")
    if base.isEmpty() or e.where("NOT is_base").isEmpty():
        return spark.createDataFrame([], schema)
    wv = Window.orderBy("vc", "event_id")
    wu = Window.orderBy("user_id", "event_id")
    bkt = base.select(
        "event_id",
        "user_id",
        "vc",
        (F.ntile(_Q459_B).over(wv) - 1).alias("bx"),
        (F.ntile(_Q459_B).over(wu) - 1).alias("by"),
    ).withColumn("z", F.expr(_morton_sql("bx", "by", 8)))
    bfid = bkt.select(
        "event_id",
        "user_id",
        "vc",
        (F.ntile(_Q459_NF).over(Window.orderBy("z", "event_id")) - 1)
        .alias("fid"),
    ).localCheckpoint()
    dfid = e.where("NOT is_base").select(
        "event_id",
        "user_id",
        "vc",
        (F.col("event_id") % _Q472_DELTA_NF).alias("fid"),
    )
    base_dir = _tempfile.mkdtemp(prefix="g_etl_delta_base_")
    delta_dir = _tempfile.mkdtemp(prefix="g_etl_delta_tail_")
    try:
        for frame, out in ((bfid, base_dir), (dfid, delta_dir)):
            (
                frame.repartition("fid")
                .write.partitionBy("fid")
                .mode("overwrite")
                .parquet(out)
            )
        back = spark.read.option("recursiveFileLookup", "true").parquet(
            base_dir, delta_dir
        )
        from g_etl_spark.operators import layout as L

        # read each directory's parquet footers ONCE (base_stats was
        # previously recomputed with a second file_stats walk of base_dir)
        base_stats = L.file_stats(base_dir, ["user_id", "vc"])
        stats = base_stats + L.file_stats(delta_dir, ["user_id", "vc"])
        # n_files from the SAME pruned enumeration that produced the
        # envelopes (one entry per file) — keeps it in lockstep with
        # files_read/_file_rows if leftovers exist under the dirs
        n_files = len(stats)
        rows = []
        aqe_key = "spark.sql.adaptive.enabled"
        aqe_old = spark.conf.get(aqe_key)
        spark.conf.set(aqe_key, "false")
        try:
            # per-file row counts for the predicted base/delta split
            import pyarrow.parquet as _pq

            def _file_rows(d):
                # MUST mirror layout.file_stats' enumeration exactly
                # (full-path sort, hidden/_-prefixed entries skipped) —
                # the envelopes and row counts zip
                def _w(p):
                    for root, dirs, names in _os.walk(p):
                        dirs[:] = [x for x in dirs if not x.startswith((".", "_"))]
                        for nm in names:
                            if nm.endswith(".parquet") and not nm.startswith((".", "_")):
                                yield _os.path.join(root, nm)

                paths = sorted(_w(d))
                return [
                    _pq.ParquetFile(p).metadata.num_rows for p in paths
                ]

            base_rows = _file_rows(base_dir)
            delta_rows = _file_rows(delta_dir)
            delta_stats = stats[len(base_stats):]
            for wname, pred in _Q459_WORKLOAD.items():
                probe = back.filter(F.expr(pred)).agg(
                    F.count(F.lit(1)).cast("long").alias("n")
                )
                n_match = probe.collect()[0]["n"]
                scanned = _q459_scan_rows(probe)

                def _surv(envf):
                    return all(
                        not (envf[c][1] < lo or envf[c][0] > hi)
                        for axis, (lo, hi) in _Q459_BOX[wname].items()
                        for c in (
                            ("user_id",) if axis == "u" else ("vc",)
                        )
                    )

                rb = sum(
                    n
                    for envf, n in zip(base_stats, base_rows)
                    if _surv(envf)
                )
                rd = sum(
                    n
                    for envf, n in zip(delta_stats, delta_rows)
                    if _surv(envf)
                )
                files_read = sum(1 for envf in stats if _surv(envf))
                share = round(1000.0 * rd / max(rb + rd, 1))
                rows.append(
                    (
                        wname,
                        n_files,
                        files_read,
                        scanned,
                        rb,
                        rd,
                        n_match,
                        share,
                    )
                )
        finally:
            spark.conf.set(aqe_key, aqe_old)
        return spark.createDataFrame(
            sorted(rows, key=lambda r: r[0]), schema
        )
    finally:
        _shutil.rmtree(base_dir, ignore_errors=True)
        _shutil.rmtree(delta_dir, ignore_errors=True)


# ---- q476: best-of-n expected-max reward curve --------------------------
_Q476_KS = (1, 2, 4, 8)


def _q476_pow(p: str, k: int) -> str:
    """p^k for k in {{1,2,4,8}} as explicit multiplication chains —
    deterministic IEEE products, no libm pow."""
    if k == 1:
        return p
    if k == 2:
        return f"({p} * {p})"
    if k == 4:
        return f"(({p} * {p}) * ({p} * {p}))"
    return (
        f"((({p} * {p}) * ({p} * {p}))"
        f" * (({p} * {p}) * ({p} * {p})))"
    )


def _q476_oracle() -> str:
    ks = []
    for k in _Q476_KS:
        pk = _q476_pow("p", k)
        qk = _q476_pow("q", k)
        ks.append(
            f"""SELECT {k} AS k,
            CAST(sum(CAST(round(10000.0 * vc * ({pk} - {qk}))
                AS BIGINT)) AS BIGINT) AS e_max_micro
            FROM ecdf"""
        )
    return f"""
    WITH r AS MATERIALIZED (
        SELECT CAST(round(value * 100) AS BIGINT) AS vc
        FROM events WHERE value IS NOT NULL
    ),
    cnt AS (
        SELECT vc, CAST(count(*) AS BIGINT) AS c FROM r GROUP BY vc
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM r),
    ecdf AS (
        SELECT vc,
               CAST(sum(c) OVER (ORDER BY vc ROWS UNBOUNDED PRECEDING)
                   AS DOUBLE) / n.n AS p,
               CAST(coalesce(sum(c) OVER (ORDER BY vc
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS DOUBLE) / n.n AS q
        FROM cnt, n
    ),
    curve AS ({" UNION ALL ".join(ks)}),
    base AS (SELECT e_max_micro AS e1 FROM curve WHERE k = 1)
    SELECT CAST(c.k AS BIGINT) AS k, n.n AS n_samples, c.e_max_micro,
           CAST(c.e_max_micro - b.e1 AS BIGINT) AS gain_vs_1_micro,
           CAST(round(1000.0 * c.e_max_micro / b.e1) AS BIGINT)
               AS gain_ratio_milli
    FROM curve c, base b, n ORDER BY c.k
    """


@register("q476_best_of_n_reward_curve", oracle=_q476_oracle())
def q476_best_of_n_reward_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BEST-OF-N expected-maximum reward curve — the number a
    rejection-sampling / BoN pipeline reads to pick n: with rewards
    drawn i.i.d. from the corpus's empirical distribution (value,
    centi-quantized), E[max of k] = Σ x·(F(x)^k − F(x⁻)^k) computed
    EXACTLY over the ECDF — no simulation, no randomness, the
    order-statistics identity evaluated on exact integer counts.
    Powers for k ∈ {_Q476_KS} are explicit multiplication chains
    (p²; (p²)²; ((p²)²)² — correctly-rounded IEEE products, no libm
    pow), each term micro-quantized before the integer sum, so the
    whole curve is reproducible bit-for-bit. The emitted
    gain-over-k=1 columns show the diminishing return that caps
    useful n — the standard BoN scaling read.

    Scale: one pass to |distinct reward values| counts; the ECDF
    window runs on that AGGREGATED grain (q470's audit-grain
    contract); the curve is |k| rows.
    """
    r = (
        load(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(F.expr("CAST(round(value * 100) AS BIGINT)").alias("vc"))
    )
    cnt = r.groupBy("vc").agg(F.count(F.lit(1)).cast("long").alias("c"))
    n = r.agg(F.count(F.lit(1)).cast("long").alias("n"))
    wv = Window.orderBy("vc")
    ecdf = cnt.crossJoin(F.broadcast(n)).select(
        "vc",
        "n",
        (
            F.sum("c")
            .over(wv.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double")
            / F.col("n")
        ).alias("p"),
        (
            F.coalesce(
                F.sum("c").over(
                    wv.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("double")
            / F.col("n")
        ).alias("q"),
    )
    curve = None
    for k in _Q476_KS:
        pk = _q476_pow("p", k)
        qk = _q476_pow("q", k)
        part = ecdf.agg(
            F.lit(k).cast("long").alias("k"),
            F.sum(
                F.expr(
                    f"CAST(round(10000.0 * vc * ({pk} - {qk})) AS BIGINT)"
                )
            ).cast("long").alias("e_max_micro"),
        )
        curve = part if curve is None else curve.unionByName(part)
    base = curve.where(F.col("k") == 1).select(
        F.col("e_max_micro").alias("e1")
    )
    return (
        curve.crossJoin(F.broadcast(base))
        .crossJoin(F.broadcast(n))
        .select(
            "k",
            F.col("n").alias("n_samples"),
            "e_max_micro",
            (F.col("e_max_micro") - F.col("e1"))
            .cast("long")
            .alias("gain_vs_1_micro"),
            F.round(1000.0 * F.col("e_max_micro") / F.col("e1"))
            .cast("long")
            .alias("gain_ratio_milli"),
        )
        .orderBy("k")
    )


# ---- q477: compaction EXECUTED (q472's debt retired, engine-gated) ------
def _q477_oracle() -> str:
    from g_etl_spark.queries.grid import _morton_sql

    cells_b = " UNION ALL ".join(
        f"""SELECT '{w}' AS workload,
            CAST(count(*) FILTER ({surv}) AS BIGINT) AS files_before,
            CAST(coalesce(sum(n) FILTER ({surv}), 0) AS BIGINT)
                AS rows_before
        FROM benv"""
        for w, surv in _Q459_SURVIVES.items()
    )
    cells_a = " UNION ALL ".join(
        f"""SELECT '{w}' AS workload,
            CAST(count(*) FILTER ({surv}) AS BIGINT) AS files_after,
            CAST(coalesce(sum(n) FILTER ({surv}), 0) AS BIGINT)
                AS rows_after
        FROM aenv"""
        for w, surv in _Q459_SURVIVES.items()
    )
    matches = " UNION ALL ".join(
        f"SELECT '{w}' AS workload, CAST(count(*) FILTER ({p}) AS BIGINT)"
        " AS n_match FROM allrows"
        for w, p in _Q459_WORKLOAD.items()
    )
    m8 = _morton_sql("bx", "by", 8)
    return f"""
    WITH allrows AS MATERIALIZED (
        SELECT event_id, user_id, CAST(round(value * 100) AS BIGINT) AS vc,
               ts < {_Q472_SPLIT} AS is_base
        FROM events WHERE value IS NOT NULL
    ),
    bbkt AS MATERIALIZED (
        SELECT event_id, user_id, vc,
               ntile({_Q459_B}) OVER (ORDER BY vc, event_id) - 1 AS bx,
               ntile({_Q459_B}) OVER (ORDER BY user_id, event_id) - 1
                   AS by
        FROM allrows WHERE is_base
    ),
    bfids AS MATERIALIZED (
        SELECT user_id, vc,
               ntile({_Q459_NF}) OVER (ORDER BY {m8}, event_id) - 1
                   AS fid, 'base' AS grp
        FROM bbkt
        UNION ALL
        SELECT user_id, vc, event_id % {_Q472_DELTA_NF}, 'delta'
        FROM allrows WHERE NOT is_base
    ),
    benv AS MATERIALIZED (
        SELECT grp, fid, min(user_id) AS ulo, max(user_id) AS uhi,
               min(vc) AS vlo, max(vc) AS vhi, count(*) AS n
        FROM bfids GROUP BY grp, fid
    ),
    abkt AS MATERIALIZED (
        SELECT event_id, user_id, vc,
               ntile({_Q459_B}) OVER (ORDER BY vc, event_id) - 1 AS bx,
               ntile({_Q459_B}) OVER (ORDER BY user_id, event_id) - 1
                   AS by
        FROM allrows
    ),
    afids AS MATERIALIZED (
        SELECT user_id, vc,
               ntile({_Q459_NF}) OVER (ORDER BY {m8}, event_id) - 1 AS fid
        FROM abkt
    ),
    aenv AS MATERIALIZED (
        SELECT fid, min(user_id) AS ulo, max(user_id) AS uhi,
               min(vc) AS vlo, max(vc) AS vhi, count(*) AS n
        FROM afids GROUP BY fid
    ),
    cb AS MATERIALIZED ({cells_b}),
    ca AS MATERIALIZED ({cells_a}),
    matches AS ({matches})
    SELECT cb.workload, cb.files_before, cb.rows_before,
           ca.files_after, ca.rows_after, m.n_match,
           CAST(round(1000.0 * (cb.rows_before - ca.rows_after)
                      / greatest(cb.rows_before, 1)) AS BIGINT)
               AS recovered_milli
    FROM cb JOIN ca USING (workload) JOIN matches m USING (workload)
    ORDER BY cb.workload
    """


@register("q477_compaction_executed", oracle=_q477_oracle())
def q477_compaction_executed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """COMPACTION EXECUTED — the layout lifecycle's closing act:
    q472 measures what the unsorted append tail costs per query;
    this operator RETIRES the debt and proves it with the engine.
    Both states are written for real: BEFORE (q472's Z-ordered base
    + arrival-order delta) and AFTER (one fresh Z-order over the
    whole corpus — exactly the rewrite a compaction job runs), and
    every q459 workload predicate executes against both. The gate
    compares the engine's scan numOutputRows for EACH state against
    its envelope arithmetic — the before row must still show the
    delta's unprunable cost, the after row must match the fresh
    clustered pricing, and recovered_milli (scan rows eliminated by
    compacting) is the column that justifies the rewrite's cost in
    a maintenance budget: recovered scan × query frequency vs one
    corpus shuffle.

    Scale: the rewrite IS the production compaction cost (one
    clustered write of base+delta); probes read pruned files only;
    all metric collection is bounded (q442/q459/q472's discipline).
    """
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from g_etl_spark.queries.grid import _morton_sql

    e = (
        load(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("vc"),
            F.expr(f"ts < {_Q472_SPLIT}").alias("is_base"),
        )
    )
    schema = (
        "workload string, files_before long, rows_before long,"
        " files_after long, rows_after long, n_match long,"
        " recovered_milli long"
    )
    if e.where("is_base").isEmpty() or e.where("NOT is_base").isEmpty():
        return spark.createDataFrame([], schema)

    def zfids(frame):
        wv = Window.orderBy("vc", "event_id")
        wu = Window.orderBy("user_id", "event_id")
        bkt = frame.select(
            "event_id",
            "user_id",
            "vc",
            (F.ntile(_Q459_B).over(wv) - 1).alias("bx"),
            (F.ntile(_Q459_B).over(wu) - 1).alias("by"),
        ).withColumn("z", F.expr(_morton_sql("bx", "by", 8)))
        return bkt.select(
            "event_id",
            "user_id",
            "vc",
            (
                F.ntile(_Q459_NF).over(Window.orderBy("z", "event_id")) - 1
            ).alias("fid"),
        )

    bfid = zfids(e.where("is_base")).localCheckpoint()
    dfid = e.where("NOT is_base").select(
        "event_id",
        "user_id",
        "vc",
        (F.col("event_id") % _Q472_DELTA_NF).alias("fid"),
    )
    afid = zfids(e).localCheckpoint()
    dirs = {
        "base": _tempfile.mkdtemp(prefix="g_etl_cmp_base_"),
        "delta": _tempfile.mkdtemp(prefix="g_etl_cmp_delta_"),
        "after": _tempfile.mkdtemp(prefix="g_etl_cmp_after_"),
    }
    try:
        for frame, key in ((bfid, "base"), (dfid, "delta"), (afid, "after")):
            (
                frame.repartition("fid")
                .write.partitionBy("fid")
                .mode("overwrite")
                .parquet(dirs[key])
            )
        before = spark.read.option("recursiveFileLookup", "true").parquet(
            dirs["base"], dirs["delta"]
        )
        after = spark.read.option("recursiveFileLookup", "true").parquet(
            dirs["after"]
        )
        from g_etl_spark.operators import layout as L

        st_before = L.file_stats(dirs["base"], ["user_id", "vc"]) + (
            L.file_stats(dirs["delta"], ["user_id", "vc"])
        )
        st_after = L.file_stats(dirs["after"], ["user_id", "vc"])
        rows = []
        aqe_key = "spark.sql.adaptive.enabled"
        aqe_old = spark.conf.get(aqe_key)
        spark.conf.set(aqe_key, "false")
        try:
            for wname, pred in _Q459_WORKLOAD.items():

                def _surv(envf):
                    return all(
                        not (envf[c][1] < lo or envf[c][0] > hi)
                        for axis, (lo, hi) in _Q459_BOX[wname].items()
                        for c in (
                            ("user_id",) if axis == "u" else ("vc",)
                        )
                    )

                pb = before.filter(F.expr(pred)).agg(
                    F.count(F.lit(1)).cast("long").alias("n")
                )
                n_match = pb.collect()[0]["n"]
                rows_b = _q459_scan_rows(pb)
                pa = after.filter(F.expr(pred)).agg(
                    F.count(F.lit(1)).cast("long").alias("n")
                )
                pa.collect()
                rows_a = _q459_scan_rows(pa)
                fb = sum(1 for envf in st_before if _surv(envf))
                fa = sum(1 for envf in st_after if _surv(envf))
                rec = round(1000.0 * (rows_b - rows_a) / max(rows_b, 1))
                rows.append(
                    (wname, fb, rows_b, fa, rows_a, n_match, rec)
                )
        finally:
            spark.conf.set(aqe_key, aqe_old)
        return spark.createDataFrame(
            sorted(rows, key=lambda r: r[0]), schema
        )
    finally:
        for d in dirs.values():
            _shutil.rmtree(d, ignore_errors=True)
