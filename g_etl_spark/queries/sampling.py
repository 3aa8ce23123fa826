"""Stratified-sampling query family (corpus rebalancing surface).

Extends the engine's O4 sampling operator (reference `USING SAMPLE`,
ascii_map.py:207-231) from uniform to stratified — the shape an LLM
corpus build actually runs: cap the dominant language / thin each
source at its own rate, reproducibly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from g_etl_spark.operators import sampling as S
from g_etl_spark.queries import register
from g_etl_spark.tables import load

_QUOTA = 20

_RATES = {"en": 0.05, "zh": 0.25, "sv": 0.5}
_DEFAULT_RATE = 0.1


@register(
    "q48_stratified_quota",
    oracle=f"""
    SELECT lang, doc_id, source
    FROM (
        SELECT lang, doc_id, source,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents)
    WHERE rn <= {_QUOTA}
    ORDER BY lang, doc_id
    """,
)
def q48_stratified_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum quota sample: cap every language at {_QUOTA} docs,
    keeping each stratum's bottom-k by md5(doc_id)
    (operators/sampling.stratified_quota).

    Scale: plans as WindowGroupLimit — partial top-k per map task
    before the exchange, so a 90%-English corpus shuffles O(tasks×k)
    English rows, not all of them (asserted in tests/test_plans.py).
    """
    d = load(spark, sf_dir, "documents").select("lang", "doc_id", "source")
    return S.stratified_quota(d, "lang", "doc_id", _QUOTA).orderBy("lang", "doc_id")


@register(
    "q49_stratified_rates",
    oracle=f"""
    SELECT lang,
           count(*) AS n_sampled,
           round(avg(n_chars), 3) AS avg_chars
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
          CASE lang
            WHEN 'en' THEN '{S.rate_threshold(_RATES["en"])}'
            WHEN 'zh' THEN '{S.rate_threshold(_RATES["zh"])}'
            WHEN 'sv' THEN '{S.rate_threshold(_RATES["sv"])}'
            ELSE '{S.rate_threshold(_DEFAULT_RATE)}'
          END
    GROUP BY lang
    ORDER BY lang
    """,
)
def q49_stratified_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum rate thinning: deterministic md5-threshold keep
    rates per language (operators/sampling.stratified_rate), then a
    sanity rollup of what survived.

    Scale: the filter is map-only (no shuffle) and sits directly on
    the scan — thinning is one pass over the corpus; only the tiny
    per-language rollup shuffles.
    """
    d = load(spark, sf_dir, "documents")
    kept = S.stratified_rate(d, "lang", "doc_id", _RATES, _DEFAULT_RATE)
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.avg("n_chars"), 3).alias("avg_chars"),
        )
        .orderBy("lang")
    )


# Target mixture for q84: boost three named sources, spread the rest
# uniformly. repr() of each weight is embedded in the oracle SQL so
# both engines parse the identical double.
_MIX_BOOST = {"src0": 0.25, "src1": 0.15, "src19": 0.10}
_MIX_REST = [f"src{i}" for i in range(2, 19)]
_MIX_WEIGHTS = {**_MIX_BOOST, **{s: 0.5 / 17 for s in _MIX_REST}}


def _mix_case_sql() -> str:
    arms = " ".join(
        f"WHEN '{s}' THEN CAST({w!r} AS DOUBLE)"
        for s, w in sorted(_MIX_WEIGHTS.items())
    )
    return f"CASE source {arms} END"


@register(
    "q84_mixture_resample",
    oracle=f"""
    WITH counts AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
    w AS (SELECT source, n, {_mix_case_sql()} AS w FROM counts),
    nt AS (SELECT min(n / w) AS n_feas FROM w),
    rates AS (
        SELECT source, n, least(w * n_feas / n, CAST(1.0 AS DOUBLE)) AS rate
        FROM w, nt),
    kept AS (
        SELECT d.source
        FROM documents d JOIN rates r USING (source)
        WHERE CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                        AS UBIGINT) AS BIGINT)
              < CAST(floor(rate * 4294967296.0) AS BIGINT)),
    kc AS (SELECT source, count(*) AS n_kept FROM kept GROUP BY source)
    SELECT r.source AS source, r.n AS n_total, kc.n_kept AS n_kept,
           round(r.rate, 6) AS rate,
           round(CAST(kc.n_kept AS DOUBLE) / sum(kc.n_kept) OVER (), 6)
               AS achieved_w
    FROM rates r JOIN kc USING (source)
    ORDER BY source
    """,
)
def q84_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture resampling (operators/sampling.mixture_resample):
    thin every source to the LARGEST corpus matching target weights
    (min_s n_s/w_s feasibility), deterministically. The summary
    reports per-source keep rate and the achieved mixture.

    Scale: rate derivation is a source-sized aggregate broadcast back
    onto the corpus; the keep decision is a map-only hash-threshold
    filter — one pass over 100 TB, no data shuffle. The oracle
    recomputes the whole plan (counts → feasible N → rates →
    hash-filtered keep) independently in DuckDB.
    """
    d = load(spark, sf_dir, "documents").select("source", "doc_id")
    kept = S.mixture_resample(d, "source", "doc_id", _MIX_WEIGHTS)
    kc = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.first("_n").alias("n_total"),
        F.first("_rate").alias("_rate"),
    )
    from pyspark.sql import Window as W

    return kc.select(
        "source",
        "n_total",
        "n_kept",
        F.round("_rate", 6).alias("rate"),
        F.round(
            F.col("n_kept").cast("double") / F.sum("n_kept").over(W.partitionBy()),
            6,
        ).alias("achieved_w"),
    ).orderBy("source")


@register(
    "q137_hash_split",
    oracle="""
    WITH split AS (
        SELECT source, doc_id, n_chars,
               CASE WHEN u < 3435973836 THEN 'train'
                    WHEN u < 3865470566 THEN 'val'
                    ELSE 'test' END AS split
        FROM (
            SELECT source, doc_id, n_chars,
                   CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                             AS UBIGINT) AS BIGINT) AS u
            FROM documents)
    )
    SELECT source, split, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS chars,
           min(doc_id) AS first_doc
    FROM split
    GROUP BY source, split
    ORDER BY source, split
    """,
)
def q137_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (80/10/10) by content-
    stable hash of the document id — the split every training
    pipeline needs to be REPRODUCIBLE across runs, engines, and
    re-shards (a random() split is none of those). The thresholds
    are the integer images of 0.8/0.9 in the md5-32-bit space
    (floor(0.8·2^32) = 3435973836), so membership is an integer
    compare in both engines.

    Scale: map-only hash + bucket compare (no shuffle before the
    per-(source, split) rollup); adding a salt string re-splits the
    corpus without data movement, and the same hash applied to a
    NEW batch lands each doc in its stable split — the property
    that keeps eval sets uncontaminated under incremental
    ingestion (decontamination by construction, complementing
    q75's n-gram check).
    """
    d = load(spark, sf_dir, "documents")
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    split = (
        F.when(u < F.lit(3435973836), "train")
        .when(u < F.lit(3865470566), "val")
        .otherwise("test")
    )
    return (
        d.select("source", "doc_id", "n_chars", split.alias("split"))
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("chars"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("source", "split")
    )


@register(
    "q202_negative_sampling",
    oracle="""
    WITH np AS (SELECT count(*) AS np FROM part),
    pos AS (
        SELECT DISTINCT o.o_custkey, l.l_partkey
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    users AS (SELECT DISTINCT o_custkey FROM pos),
    cand AS (
        SELECT u.o_custkey, i.i,
               ((u.o_custkey * 2654435761 + i.i * 48611) % 2147483647)
                   % (SELECT np FROM np) AS cand_part
        FROM users u CROSS JOIN (SELECT unnest(range(12)) AS i) i
    ),
    neg AS (
        SELECT c.o_custkey, c.i, c.cand_part
        FROM cand c
        WHERE NOT EXISTS (
            SELECT 1 FROM pos p
            WHERE p.o_custkey = c.o_custkey AND p.l_partkey = c.cand_part
        )
    ),
    dedup AS (
        SELECT o_custkey, cand_part, min(i) AS i
        FROM neg GROUP BY o_custkey, cand_part
    ),
    ranked AS (
        SELECT o_custkey, cand_part, i,
               row_number() OVER (PARTITION BY o_custkey ORDER BY i) AS rk
        FROM dedup
    )
    SELECT o_custkey AS c_custkey, CAST(rk AS INT) AS neg_rank,
           cand_part AS neg_partkey
    FROM ranked WHERE rk <= 4
    ORDER BY c_custkey, neg_rank
    """,
)
def q202_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training:
    for every purchasing customer, 4 parts they have NEVER ordered,
    drawn by an affine hash stream (stride 48611, coprime to the
    2147483647 modulus — the q184 lesson) with a 12-draw buffer,
    positives excluded by anti-join, duplicate draws collapsed to
    their first index, and the first 4 survivors kept in draw order.
    The (user, item⁻) pairs are what a two-tower/InfoNCE trainer
    consumes next to the q137 split.

    Scale: positives are one distinct over the order join (the only
    corpus-sized exchange); candidates are |users|×12 rows built
    map-side from the hash stream with the part count as a broadcast
    scalar; the exclusion is a LeftAnti hash join, and the keep-4 is
    a per-user window over ≤12 rows (bounded partitions — plans as
    WindowGroupLimit, no global sort).
    """
    from pyspark.sql import Window as W

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    np_ = load(spark, sf_dir, "part").agg(F.count(F.lit(1)).alias("np"))
    pos = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select("o_custkey", "l_partkey")
        .distinct()
    )
    users = pos.select("o_custkey").distinct()
    idx = spark.range(12).select(F.col("id").alias("i"))
    cand = (
        users.crossJoin(F.broadcast(idx))
        .crossJoin(F.broadcast(np_))
        .select(
            "o_custkey",
            "i",
            (
                ((F.col("o_custkey") * 2654435761 + F.col("i") * 48611) % 2147483647)
                % F.col("np")
            ).alias("cand_part"),
        )
    )
    ca, po = cand.alias("ca"), pos.alias("po")
    neg = ca.join(
        po,
        (F.col("ca.o_custkey") == F.col("po.o_custkey"))
        & (F.col("ca.cand_part") == F.col("po.l_partkey")),
        "left_anti",
    )
    dedup = neg.groupBy("o_custkey", "cand_part").agg(F.min("i").alias("i"))
    rk = F.row_number().over(W.partitionBy("o_custkey").orderBy("i"))
    return (
        dedup.select(
            F.col("o_custkey").alias("c_custkey"),
            F.col("cand_part").alias("neg_partkey"),
            rk.alias("neg_rank"),
        )
        .filter(F.col("neg_rank") <= 4)
        .select("c_custkey", F.col("neg_rank").cast("int").alias("neg_rank"), "neg_partkey")
        .orderBy("c_custkey", "neg_rank")
    )


@register(
    "q287_effective_sample_size",
    oracle="""
    WITH shares AS (
        SELECT source, CAST(count(*) AS DOUBLE) AS n
        FROM documents GROUP BY 1
    ),
    tot AS (SELECT sum(n) AS tn, CAST(count(*) AS DOUBLE) AS k FROM shares),
    wt AS (
        SELECT s.source,
               (tot.tn / tot.k) / s.n AS w
        FROM shares s, tot
    ),
    docs AS (
        SELECT d.lang, wt.w FROM documents d JOIN wt USING (source)
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(sum(w), 4) AS sum_w,
           round(sum(w) * sum(w) / sum(w * w), 4) AS ess,
           round(sum(w) * sum(w) / sum(w * w) / count(*), 6) AS ess_ratio
    FROM docs GROUP BY lang ORDER BY lang
    """,
)
def q287_effective_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective sample size under importance reweighting: give every
    document the weight that equalizes SOURCE shares (the q84/q228
    mixture move), then per language report Kish's ESS =
    (sum w)^2 / sum w^2 — the number that says how many EQUIVALENT
    unweighted samples the reweighted corpus is actually worth. A
    mixture plan that doubles a rare source's share may quietly
    halve its ESS; this is the diagnostic that catches it before
    training on ghosts.

    Scale: source shares are one tiny agg broadcast back; weights
    are map-side arithmetic; the ESS moments are one combining agg
    on the bounded lang grid. Nothing iterates.
    """
    d = load(spark, sf_dir, "documents")
    shares = d.groupBy("source").agg(F.count(F.lit(1)).cast("double").alias("n"))
    tot = shares.agg(
        F.sum("n").alias("tn"), F.count(F.lit(1)).cast("double").alias("k")
    )
    wt = shares.crossJoin(F.broadcast(tot)).select(
        "source", ((F.col("tn") / F.col("k")) / F.col("n")).alias("w")
    )
    docs = d.select("lang", "source").join(F.broadcast(wt), "source")
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.sum("w"), 4).alias("sum_w"),
            F.round(
                F.sum("w") * F.sum("w") / F.sum(F.col("w") * F.col("w")), 4
            ).alias("ess"),
            F.round(
                F.sum("w")
                * F.sum("w")
                / F.sum(F.col("w") * F.col("w"))
                / F.count(F.lit(1)),
                6,
            ).alias("ess_ratio"),
        )
        .orderBy("lang")
    )


_IPF_ROUNDS = 5
_IPF_SEG_T = 0.2  # uniform market-segment target margin (5 segments)
_IPF_NG_T = "CASE ng WHEN 0 THEN 0.3 WHEN 1 THEN 0.25 WHEN 2 THEN 0.2 WHEN 3 THEN 0.15 ELSE 0.1 END"


def _ipf_oracle() -> str:
    steps = []
    prev = "r0"
    for r in range(_IPF_ROUNDS):
        a, b = f"r{2 * r + 1}", f"r{2 * r + 2}"
        steps.append(
            f"{a} AS MATERIALIZED (SELECT seg, ng, n, w * ({_IPF_SEG_T} * tn.nn)"
            f" / sum(n * w) OVER (PARTITION BY seg) AS w FROM {prev} CROSS JOIN tn)"
        )
        steps.append(
            f"{b} AS MATERIALIZED (SELECT seg, ng, n, w * (({_IPF_NG_T}) * tn.nn)"
            f" / sum(n * w) OVER (PARTITION BY ng) AS w FROM {a} CROSS JOIN tn)"
        )
        prev = b
    chain = ",\n    ".join(steps)
    return f"""
    WITH cells AS MATERIALIZED (
        SELECT c_mktsegment AS seg, c_nationkey % 5 AS ng,
               CAST(count(*) AS BIGINT) AS n
        FROM customer GROUP BY 1, 2
    ),
    tn AS (SELECT CAST(sum(n) AS DOUBLE) AS nn FROM cells),
    r0 AS (SELECT seg, ng, n, 1.0 AS w FROM cells),
    {chain},
    fin AS (SELECT seg, ng, n, w FROM {prev}),
    tot AS (SELECT sum(n * w) AS tw FROM fin)
    SELECT fin.seg, CAST(fin.ng AS BIGINT) AS ng, fin.n,
           round(fin.w, 6) AS weight,
           round(sum(fin.n * fin.w) OVER (PARTITION BY fin.seg) / tot.tw, 6)
               AS seg_share,
           round(sum(fin.n * fin.w) OVER (PARTITION BY fin.ng) / tot.tw, 6)
               AS ng_share
    FROM fin CROSS JOIN tot
    ORDER BY seg, ng
    """


@register("q309_ipf_raking", oracle=_ipf_oracle())
def q309_ipf_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative proportional fitting (raking) of survey-style cell
    weights to TWO target margins at once — the calibration step
    between q84's rate-based resampling (one margin) and production
    panel weighting: customers cell on (market segment × nation
    group), start at weight 1, then alternately scale each segment
    row to a uniform 20% margin and each nation-group column to a
    declared (30/25/20/15/10)% margin for 5 rounds. IPF converges
    geometrically when all cells are populated; after round 5 the
    LAST-scaled margin holds exactly and the other to ~1e-6 (the
    emitted shares show both). Weighted training mixtures (q228)
    consume exactly these per-cell weights.

    Scale: the corpus collapses to |seg×group| cells in ONE
    combining agg; every IPF step is a partitioned window over that
    bounded cell relation (5 cells per partition — never a corpus
    shuffle, never a driver loop over rows). 10 chained MATERIALIZED
    CTEs mirror the recurrence in the oracle (the q215/q266
    bounded-matvec precedent).
    """
    c = load(spark, sf_dir, "customer")
    cells = c.groupBy(
        F.col("c_mktsegment").alias("seg"),
        (F.col("c_nationkey") % 5).cast("long").alias("ng"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tn = cells.agg(F.sum("n").cast("double").alias("nn"))
    cur = cells.crossJoin(F.broadcast(tn)).withColumn("w", F.lit(1.0))
    ng_t = F.expr(_IPF_NG_T)
    from pyspark.sql import Window as W

    for _ in range(_IPF_ROUNDS):
        cur = cur.withColumn(
            "w",
            F.col("w")
            * (F.lit(_IPF_SEG_T) * F.col("nn"))
            / F.sum(F.col("n") * F.col("w")).over(W.partitionBy("seg")),
        )
        cur = cur.withColumn(
            "w",
            F.col("w")
            * (ng_t * F.col("nn"))
            / F.sum(F.col("n") * F.col("w")).over(W.partitionBy("ng")),
        )
    tot = cur.agg(F.sum(F.col("n") * F.col("w")).alias("tw"))
    return (
        cur.crossJoin(F.broadcast(tot))
        .select(
            "seg",
            "ng",
            "n",
            F.round("w", 6).alias("weight"),
            F.round(
                F.sum(F.col("n") * F.col("w")).over(W.partitionBy("seg"))
                / F.col("tw"),
                6,
            ).alias("seg_share"),
            F.round(
                F.sum(F.col("n") * F.col("w")).over(W.partitionBy("ng"))
                / F.col("tw"),
                6,
            ).alias("ng_share"),
        )
        .orderBy("seg", "ng")
    )


_NEYMAN_N = 1000


@register(
    "q355_neyman_allocation",
    oracle=f"""
    WITH m AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_h,
               CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS s1,
               CAST(sum(CAST(n_chars AS BIGINT) * CAST(n_chars AS BIGINT))
                    AS BIGINT) AS s2
        FROM documents GROUP BY source
    ),
    w AS (
        SELECT source, n_h,
               round(sqrt((s2 - CAST(s1 AS DOUBLE) * s1 / n_h) / n_h), 4)
                   AS sd_chars,
               CAST(round(n_h * sqrt((s2 - CAST(s1 AS DOUBLE) * s1 / n_h)
                                     / n_h) * 1000000) AS BIGINT) AS w_u
        FROM m
    ),
    t AS (SELECT CAST(sum(w_u) AS BIGINT) AS tw FROM w),
    alloc AS (
        SELECT w.source, w.n_h, w.sd_chars, w.w_u,
               CAST(({_NEYMAN_N} * w.w_u) // t.tw AS BIGINT) AS base_n,
               CAST(({_NEYMAN_N} * w.w_u) % t.tw AS BIGINT) AS rem
        FROM w CROSS JOIN t
    ),
    leftover AS (
        SELECT CAST({_NEYMAN_N} - sum(base_n) AS BIGINT) AS k FROM alloc
    ),
    ranked AS (
        SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rr
        FROM alloc
    )
    SELECT r.source, r.n_h AS n_docs, r.sd_chars,
           r.w_u AS neyman_weight_micro,
           CAST(r.base_n + CASE WHEN r.rr <= l.k THEN 1 ELSE 0 END AS BIGINT)
               AS alloc_n,
           round(CAST(r.base_n + CASE WHEN r.rr <= l.k THEN 1 ELSE 0 END
                      AS DOUBLE) / r.n_h, 6) AS sampling_rate
    FROM ranked r CROSS JOIN leftover l
    ORDER BY source
    """,
)
def q355_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman OPTIMAL stratified-sample allocation — the survey-
    statistics planning step before the family's samplers run (q48
    enforces quotas, q49 thins at given rates; this computes the
    rates that minimize estimator variance for a fixed budget):
    allocate n = 1000 across sources ∝ N_h·σ_h, so big AND
    high-variance strata get more of the budget than proportional
    allocation would give. Weights are micro-quantized integers
    (population σ from exact integer moments), the floor allocation
    is pure integer arithmetic ((n·w) div Σw), and the leftover
    seats go by LARGEST REMAINDER ((n·w) mod Σw, source tiebreak) —
    so Σ alloc_n = n exactly and every engine derives the same seats
    (no double in any comparison).

    Scale: one combining moment agg to |sources| cells; allocation
    is arithmetic + one bounded window on that rollup (q243
    contract). The realized sample then runs q49's map-only
    rate thinning at alloc_n/N_h per stratum.
    """
    d = load(spark, sf_dir, "documents")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_h"),
        F.sum(dec(F.col("n_chars"))).cast("long").alias("s1"),
        F.sum(dec(F.col("n_chars")) * F.col("n_chars")).cast("long").alias("s2"),
    )
    var = (
        F.col("s2") - F.col("s1").cast("double") * F.col("s1") / F.col("n_h")
    ) / F.col("n_h")
    w = m.select(
        "source",
        "n_h",
        F.round(F.sqrt(var), 4).alias("sd_chars"),
        F.round(F.col("n_h") * F.sqrt(var) * 1e6, 0).cast("long").alias("w_u"),
    )
    t = w.agg(F.sum("w_u").cast("long").alias("tw"))
    alloc = w.crossJoin(F.broadcast(t)).select(
        "source",
        "n_h",
        "sd_chars",
        "w_u",
        # decimal(38,0) product: n*w_u wraps int64 at ~2e18 micro-
        # weights (1e9 docs), exactly the scale the seats must stay
        # exact at
        F.expr(
            f"CAST(FLOOR(CAST({_NEYMAN_N} AS DECIMAL(38,0)) * w_u / tw)"
            " AS BIGINT)"
        ).alias("base_n"),
        F.expr(
            f"CAST(CAST({_NEYMAN_N} AS DECIMAL(38,0)) * w_u"
            f" - FLOOR(CAST({_NEYMAN_N} AS DECIMAL(38,0)) * w_u / tw) * tw"
            " AS BIGINT)"
        ).alias("rem"),
    )
    leftover = alloc.agg(
        (F.lit(_NEYMAN_N) - F.sum("base_n")).cast("long").alias("k")
    )
    from pyspark.sql import Window

    ranked = alloc.withColumn(
        "rr", F.row_number().over(Window.orderBy(F.desc("rem"), F.asc("source")))
    )
    out_n = (
        F.col("base_n")
        + F.when(F.col("rr") <= F.col("k"), 1).otherwise(0)
    ).cast("long")
    return (
        ranked.crossJoin(F.broadcast(leftover))
        .select(
            "source",
            F.col("n_h").alias("n_docs"),
            "sd_chars",
            F.col("w_u").alias("neyman_weight_micro"),
            out_n.alias("alloc_n"),
            F.round(out_n.cast("double") / F.col("n_h"), 6).alias("sampling_rate"),
        )
        .orderBy("source")
    )


@register(
    "q402_weighted_sample_aes",
    oracle="""
    WITH keyed AS (
        SELECT doc_id, source, CAST(n_chars AS DOUBLE) AS w,
               ln((CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                            1, 8) AS UBIGINT) AS DOUBLE)
                   + 1.0) / 4294967297.0)
               / CAST(n_chars AS DOUBLE) AS k
        FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, source, CAST(w AS BIGINT) AS weight,
           round(k * 1e6, 6) AS key_micro
    FROM keyed
    ORDER BY round(k * 1e6, 6) DESC, doc_id
    LIMIT 20
    """,
)
def q402_weighted_sample_aes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED sampling WITHOUT replacement (Efraimidis–Spirakis
    A-ES, 2006) — the importance-weighted corpus subsampler: each
    document draws u from its md5 (deterministic, q17's convention
    — no RNG, reproducible at any scale) and ranks by u^(1/w),
    computed in the log domain as ln(u)/w (same ordering, no
    underflow for large weights); the top-k by key IS an exact
    weight-proportional sample without replacement. Here w =
    n_chars, so long documents are proportionally favored — the
    length-balanced pick a token-budgeted corpus build uses (q102
    samples WITH replacement; q84's mixture resampler works at
    source grain; this is the per-document without-replacement
    rung). Keys are scaled ×1e6 and rounded at 6 dp before the
    ordering so the cross-engine compare never rides libm's last
    ulp.

    Scale: map-side key computation fused into the scan + one
    TakeOrderedAndProject — no shuffle at all; k grows to millions
    by swapping the limit for a per-partition heap (same plan).
    """
    d = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("double")
        + 1.0
    ) / F.lit(4294967297.0)
    k = F.log(u) / F.col("n_chars").cast("double")
    return (
        d.select(
            "doc_id",
            "source",
            F.col("n_chars").cast("bigint").alias("weight"),
            F.round(k * 1e6, 6).alias("key_micro"),
        )
        .orderBy(F.desc("key_micro"), "doc_id")
        .limit(20)
    )


@register(
    "q413_token_budget_waterfill",
    oracle="""
    WITH src AS (
        SELECT source,
               CAST(sum(len(string_split_regex(lower(trim(text)), '\\s+')))
                    AS DOUBLE) AS cap,
               avg(CAST(n_chars AS DOUBLE)) / 1000.0 AS w
        FROM documents GROUP BY source
    ),
    b AS (SELECT 0.5 * sum(cap) AS budget FROM src),
    ranked AS (
        SELECT source, cap, w, cap / w AS r,
               row_number() OVER (ORDER BY cap / w, source) AS k,
               count(*) OVER () AS n
        FROM src
    ),
    lam AS (
        SELECT g.k AS k0,
               (b.budget - coalesce(p.pcap, 0)) / s.swt AS lam,
               p2.rk AS r_k, s2.rk1 AS r_k1
        FROM (SELECT unnest(range(0, (SELECT CAST(n AS BIGINT) FROM ranked
                                      LIMIT 1))) AS k) g
        CROSS JOIN b
        LEFT JOIN (SELECT k, sum(cap) OVER (ORDER BY k) AS pcap
                   FROM ranked) p ON p.k = g.k
        JOIN (SELECT g2.k AS k, sum(r2.w) AS swt
              FROM (SELECT unnest(range(0, (SELECT CAST(n AS BIGINT)
                                            FROM ranked LIMIT 1))) AS k) g2
              JOIN ranked r2 ON r2.k > g2.k GROUP BY g2.k) s
          ON s.k = g.k
        LEFT JOIN (SELECT k, r AS rk FROM ranked) p2 ON p2.k = g.k
        LEFT JOIN (SELECT k - 1 AS k, r AS rk1 FROM ranked) s2
          ON s2.k = g.k
    ),
    chosen AS (
        SELECT k0, lam FROM lam
        WHERE (k0 = 0 OR r_k <= lam) AND (r_k1 IS NULL OR r_k1 > lam)
        ORDER BY k0 LIMIT 1
    )
    SELECT r.source,
           CAST(r.cap AS BIGINT) AS cap_tokens,
           round(r.w, 4) AS weight,
           CAST(round(CASE WHEN r.k <= c.k0 THEN r.cap
                           ELSE c.lam * r.w END) AS BIGINT)
               AS allocated_tokens,
           r.k <= c.k0 AS saturated,
           round(c.lam, 4) AS lam
    FROM ranked r CROSS JOIN chosen c
    ORDER BY r.source
    """,
)
def q413_token_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKEN-BUDGET WATER-FILLING — the training-mixture allocator:
    spend a token budget (here 50% of the corpus) across sources
    proportionally to a quality weight w_i, subject to each source's
    available-token cap c_i: a_i = min(c_i, λ·w_i) with λ solving
    Σa_i = budget. Solved EXACTLY (no iteration): sort sources by
    saturation ratio c_i/w_i ascending; for each prefix size k,
    λ_k = (B − Σ_{j≤k} c_j)/(Σ_{j>k} w_j); the unique k where the
    k-th source saturates (r_k ≤ λ_k) and the (k+1)-th doesn't is
    the answer — the closed-form the mixture family was missing
    (q228 allocates by variance, q84 resamples to target shares,
    q372 reweights by DSIR; this respects CAPS, which is what real
    corpora have: you cannot sample more arxiv than exists).
    Σ allocated == budget by construction; `saturated` marks the
    sources the budget exhausts.

    Scale: the corpus collapses once to |sources| rows (token sums
    + mean quality); the λ search is a |sources|-grain sorted scan
    with prefix/suffix sums — arithmetic identical in both engines
    (no libm), rounded only at the emitted columns.
    """
    from g_etl_spark.operators import text as T

    d = load(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(
        F.sum(F.size(T.tokens(F.col("text"))))
        .cast("double")
        .alias("cap"),
        (F.avg(F.col("n_chars").cast("double")) / 1000.0).alias("w"),
    )
    b = src.agg((0.5 * F.sum("cap")).alias("budget"))
    wk = Window.orderBy((F.col("cap") / F.col("w")).asc(), F.col("source"))
    ranked = src.select(
        "source", "cap", "w",
        (F.col("cap") / F.col("w")).alias("r"),
        F.row_number().over(wk).alias("k"),
    ).localCheckpoint()
    pre = ranked.select(
        "k", "r",
        F.sum("cap").over(Window.orderBy("k").rowsBetween(
            Window.unboundedPreceding, 0)).alias("pcap"),
        F.sum("w").over(Window.orderBy("k").rowsBetween(
            1, Window.unboundedFollowing)).alias("swt_after"),
        F.lead("r").over(Window.orderBy("k")).alias("r_next"),
    )
    n = ranked.agg(F.count(F.lit(1)).alias("n"))
    # candidate k = 0..n-1 saturated prefixes: k=0 row synthesized
    k0 = (
        n.crossJoin(F.broadcast(b))
        .crossJoin(
            F.broadcast(
                ranked.agg(F.sum("w").alias("tot_w"))
            )
        )
        .select(
            F.lit(0).alias("k0"),
            (F.col("budget") / F.col("tot_w")).alias("lam"),
            F.lit(None).cast("double").alias("r_k"),
        )
        .join(
            ranked.filter(F.col("k") == 1).select(
                F.col("r").alias("r_k1")
            ),
            how="cross",
        )
    )
    kpos = (
        pre.crossJoin(F.broadcast(b))
        .filter(F.col("swt_after").isNotNull())
        .select(
            F.col("k").alias("k0"),
            ((F.col("budget") - F.col("pcap")) / F.col("swt_after")).alias(
                "lam"
            ),
            F.col("r").alias("r_k"),
            F.col("r_next").alias("r_k1"),
        )
    )
    cands = k0.unionByName(kpos)
    chosen = (
        cands.filter(
            (F.col("r_k").isNull() | (F.col("r_k") <= F.col("lam")))
            & (F.col("r_k1").isNull() | (F.col("r_k1") > F.col("lam")))
        )
        .orderBy("k0")
        .limit(1)
        .select("k0", "lam")
    )
    return (
        ranked.crossJoin(F.broadcast(chosen))
        .select(
            "source",
            F.col("cap").cast("long").alias("cap_tokens"),
            F.round("w", 4).alias("weight"),
            F.round(
                F.when(F.col("k") <= F.col("k0"), F.col("cap")).otherwise(
                    F.col("lam") * F.col("w")
                )
            )
            .cast("long")
            .alias("allocated_tokens"),
            (F.col("k") <= F.col("k0")).alias("saturated"),
            F.round("lam", 4).alias("lam"),
        )
        .orderBy("source")
    )


# ---- q425: multi-epoch token budgeting (data-constrained scaling) ------
_Q425_EPOCHS = 4        # max repeat epochs priced
_Q425_DECAY = 0.125     # per-epoch utility decay (exact binary fraction)
_Q425_BUDGET_X = 1.5    # training budget as a multiple of unique tokens


@register(
    "q425_multi_epoch_token_budget",
    oracle=f"""
    WITH src AS (
        SELECT source,
               CAST(sum(len(string_split_regex(lower(trim(text)), '\\s+')))
                    AS DOUBLE) AS cap,
               avg(CAST(n_chars AS DOUBLE)) / 1000.0 AS w
        FROM documents GROUP BY source
    ),
    cells AS (
        SELECT s.source, CAST(e.epoch AS BIGINT) AS epoch, s.cap,
               s.w * power({_Q425_DECAY}, e.epoch - 1) AS we
        FROM src s,
             (SELECT unnest(range(1, {_Q425_EPOCHS} + 1)) AS epoch) e
    ),
    b AS (SELECT {_Q425_BUDGET_X} * sum(cap) AS budget FROM src),
    ranked AS (
        SELECT source, epoch, cap, we, cap / we AS r,
               row_number() OVER (ORDER BY cap / we, source, epoch) AS k
        FROM cells
    ),
    pre AS (
        SELECT k, r,
               sum(cap) OVER (ORDER BY k) AS pcap,
               sum(we) OVER (ORDER BY k ROWS BETWEEN 1 FOLLOWING AND
                             UNBOUNDED FOLLOWING) AS swt_after,
               lead(r) OVER (ORDER BY k) AS r_next
        FROM ranked
    ),
    cands AS (
        SELECT CAST(0 AS BIGINT) AS k0,
               b.budget / (SELECT sum(we) FROM cells) AS lam,
               CAST(NULL AS DOUBLE) AS r_k,
               (SELECT r FROM ranked WHERE k = 1) AS r_k1
        FROM b
        UNION ALL
        SELECT k, (b.budget - pcap) / swt_after, r, r_next
        FROM pre, b WHERE swt_after IS NOT NULL
    ),
    chosen AS (
        SELECT k0, lam FROM cands
        WHERE (r_k IS NULL OR r_k <= lam)
          AND (r_k1 IS NULL OR r_k1 > lam)
        ORDER BY k0 LIMIT 1
    )
    SELECT r.source, r.epoch,
           CAST(r.cap AS BIGINT) AS cap_tokens,
           round(r.we, 4) AS eff_weight,
           CAST(round(CASE WHEN r.k <= c.k0 THEN r.cap
                           ELSE c.lam * r.we END) AS BIGINT)
               AS allocated_tokens,
           r.k <= c.k0 AS saturated,
           round(c.lam, 4) AS lam
    FROM ranked r CROSS JOIN chosen c
    ORDER BY r.source, r.epoch
    """,
)
def q425_multi_epoch_token_budget(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MULTI-EPOCH token budgeting — q413's capped water-fill
    extended to REPEATED data (the data-constrained-scaling
    allocation shape, Muennighoff et al. 2023: when the training
    budget exceeds the unique corpus, repeating data still helps
    but with decaying returns). Each (source, epoch ≤ {_Q425_EPOCHS})
    cell offers the source's unique tokens again at utility
    w_i·δ^(e−1) (δ = {_Q425_DECAY}, an exact binary fraction, so the
    decay multiplies losslessly in both engines); the training
    budget ({_Q425_BUDGET_X}× the unique corpus) water-fills the
    cells with the SAME closed-form λ search as q413 — rank cells
    by saturation ratio cap/w_e, prefix/suffix sums price every
    candidate saturation prefix, the unique crossing fixes λ. High-
    quality sources fund 2-3 epochs; low-quality ones don't earn a
    second pass — exactly the mixture decision a budget-constrained
    pretraining run makes. Σ allocated == budget by construction.

    Scale: the corpus collapses once to |sources| rows; the cell
    grid is |sources|×{_Q425_EPOCHS} — the λ search is a bounded-
    grain sorted scan (arithmetic identical in both engines, no
    libm beyond power on exact fractions), rounded only at the
    emitted columns.
    """
    from g_etl_spark.operators import text as T

    d = load(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(
        F.sum(F.size(T.tokens(F.col("text"))))
        .cast("double")
        .alias("cap"),
        (F.avg(F.col("n_chars").cast("double")) / 1000.0).alias("w"),
    )
    epochs = spark.range(1, _Q425_EPOCHS + 1).select(
        F.col("id").cast("long").alias("epoch")
    )
    cells = src.crossJoin(F.broadcast(epochs)).select(
        "source",
        "epoch",
        "cap",
        (F.col("w") * F.pow(F.lit(_Q425_DECAY), F.col("epoch") - 1)).alias(
            "we"
        ),
    )
    b = src.agg((_Q425_BUDGET_X * F.sum("cap")).alias("budget"))
    wk = Window.orderBy(
        (F.col("cap") / F.col("we")).asc(), F.col("source"), F.col("epoch")
    )
    ranked = cells.select(
        "source",
        "epoch",
        "cap",
        "we",
        (F.col("cap") / F.col("we")).alias("r"),
        F.row_number().over(wk).alias("k"),
    ).localCheckpoint()
    pre = ranked.select(
        "k",
        "r",
        F.sum("cap")
        .over(Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0))
        .alias("pcap"),
        F.sum("we")
        .over(Window.orderBy("k").rowsBetween(1, Window.unboundedFollowing))
        .alias("swt_after"),
        F.lead("r").over(Window.orderBy("k")).alias("r_next"),
    )
    k0 = (
        b.crossJoin(F.broadcast(ranked.agg(F.sum("we").alias("tot_w"))))
        .crossJoin(
            F.broadcast(
                ranked.filter(F.col("k") == 1).select(
                    F.col("r").alias("r_k1")
                )
            )
        )
        .select(
            F.lit(0).cast("long").alias("k0"),
            (F.col("budget") / F.col("tot_w")).alias("lam"),
            F.lit(None).cast("double").alias("r_k"),
            "r_k1",
        )
    )
    kpos = (
        pre.crossJoin(F.broadcast(b))
        .filter(F.col("swt_after").isNotNull())
        .select(
            F.col("k").cast("long").alias("k0"),
            ((F.col("budget") - F.col("pcap")) / F.col("swt_after")).alias(
                "lam"
            ),
            F.col("r").alias("r_k"),
            F.col("r_next").alias("r_k1"),
        )
    )
    chosen = (
        k0.unionByName(kpos)
        .filter(
            (F.col("r_k").isNull() | (F.col("r_k") <= F.col("lam")))
            & (F.col("r_k1").isNull() | (F.col("r_k1") > F.col("lam")))
        )
        .orderBy("k0")
        .limit(1)
        .select("k0", "lam")
    )
    return (
        ranked.crossJoin(F.broadcast(chosen))
        .select(
            "source",
            "epoch",
            F.col("cap").cast("long").alias("cap_tokens"),
            F.round("we", 4).alias("eff_weight"),
            F.round(
                F.when(F.col("k") <= F.col("k0"), F.col("cap")).otherwise(
                    F.col("lam") * F.col("we")
                )
            )
            .cast("long")
            .alias("allocated_tokens"),
            (F.col("k") <= F.col("k0")).alias("saturated"),
            F.round("lam", 4).alias("lam"),
        )
        .orderBy("source", "epoch")
    )


# ---- q427: context-window sequence packing audit -----------------------
_PACK_C = 512          # context length (tokens)
_PACK_SHARD = 512      # docs per packing shard (bounds group state)


def _greedy_pack_bins(lengths) -> int:
    """q427/q430's shared order-preserving greedy fold: close the
    open context when the next doc would cross it (state = two
    integers)."""
    bins, loadv = 0, _PACK_C + 1
    for ln in lengths:
        ln = int(ln)
        if loadv + ln > _PACK_C:
            bins += 1
            loadv = ln
        else:
            loadv += ln
    return bins


@register(
    "q427_sequence_packing_audit",
    oracle=f"""
    WITH RECURSIVE docs AS (
        SELECT source, doc_id, doc_id // {_PACK_SHARD} AS shard,
               least(coalesce(len(string_split_regex(lower(trim(text)),
                                                     '\\s+')), 0),
                     {_PACK_C}) AS len_eff,
               row_number() OVER (PARTITION BY source,
                                  doc_id // {_PACK_SHARD}
                                  ORDER BY doc_id) AS rn
        FROM documents
    ),
    shards AS (SELECT DISTINCT source, shard FROM docs),
    rec AS (
        SELECT source, shard, 0 AS r, CAST(0 AS BIGINT) AS bins,
               CAST({_PACK_C + 1} AS BIGINT) AS load
        FROM shards
        UNION ALL
        SELECT rec.source, rec.shard, rec.r + 1,
               CASE WHEN rec.load + d.len_eff > {_PACK_C}
                    THEN rec.bins + 1 ELSE rec.bins END,
               CASE WHEN rec.load + d.len_eff > {_PACK_C}
                    THEN d.len_eff ELSE rec.load + d.len_eff END
        FROM rec JOIN docs d
          ON d.source = rec.source AND d.shard = rec.shard
         AND d.rn = rec.r + 1
    ),
    final AS (
        SELECT source, shard, bins FROM (
            SELECT source, shard, bins,
                   row_number() OVER (PARTITION BY source, shard
                                      ORDER BY r DESC) AS pick
            FROM rec
        ) WHERE pick = 1
    ),
    per_shard AS (
        SELECT d.source, d.shard,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(d.len_eff) AS BIGINT) AS toks
        FROM docs d GROUP BY d.source, d.shard
    )
    SELECT p.source,
           CAST(sum(p.n_docs) AS BIGINT) AS n_docs,
           CAST(sum(f.bins) AS BIGINT) AS n_bins,
           CAST(sum(p.toks) AS BIGINT) AS total_tokens,
           CAST(sum(f.bins) * {_PACK_C} - sum(p.toks) AS BIGINT)
               AS waste_tokens,
           round(100.0 * sum(p.toks) / (sum(f.bins) * {_PACK_C}), 2)
               AS util_pct
    FROM per_shard p JOIN final f USING (source, shard)
    GROUP BY p.source
    ORDER BY p.source
    """,
)
def q427_sequence_packing_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SEQUENCE-PACKING audit — the context-window packing every
    pretraining data loader runs (concat docs into fixed
    {_PACK_C}-token contexts, greedy NO-SPLIT: a doc that would
    cross the boundary closes the bin and opens the next; overlong
    docs truncate to one full context). Packing is inherently
    SEQUENTIAL state, so this is the registry's canonical
    applyInPandas operator: docs shard into bounded
    ({_PACK_SHARD}-doc) deterministic groups, each group packs in
    one Arrow batch with a plain Python fold (the state is two
    integers), and shard summaries roll up to source grain. Bins
    never span shards — the standard per-shard packing contract
    that makes the operator embarrassingly parallel at 100 TB
    (shard = file/date partition in production; doc_id blocks
    here). The oracle replays the same greedy fold as a recursive
    CTE, so the emitted bin counts / waste / utilization are exact
    integers both sides — a wrong fold order or split policy
    hash-fails.

    Scale: one map-side projection to (group key, token count) —
    the text never reaches Python; Arrow groups are ≤{_PACK_SHARD}
    rows regardless of corpus size; the rollup shuffles
    |sources|×|shards| summary rows. The util_pct emitted is the
    number that prices padding waste on a training run (97%+ with
    packing vs ~45% naive one-doc-per-context on typical web text).
    """
    import pandas as pd

    from g_etl_spark.operators import text as T

    d = load(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.expr(f"doc_id div {_PACK_SHARD}").alias("shard"),
        F.least(
            F.coalesce(F.size(T.tokens(F.col("text"))), F.lit(0)),
            F.lit(_PACK_C),
        ).alias("len_eff"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        return pd.DataFrame(
            [
                {
                    "source": pdf["source"].iloc[0],
                    "shard": int(pdf["shard"].iloc[0]),
                    "n_docs": len(pdf),
                    "n_bins": _greedy_pack_bins(pdf["len_eff"]),
                    "toks": int(pdf["len_eff"].sum()),
                }
            ]
        )

    per_shard = d.groupBy("source", "shard").applyInPandas(
        _pack,
        "source string, shard long, n_docs long, n_bins long, toks long",
    )
    return (
        per_shard.groupBy("source")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("n_bins").cast("long").alias("n_bins"),
            F.sum("toks").cast("long").alias("total_tokens"),
            (F.sum("n_bins") * _PACK_C - F.sum("toks"))
            .cast("long")
            .alias("waste_tokens"),
            F.round(
                100.0 * F.sum("toks") / (F.sum("n_bins") * _PACK_C), 2
            ).alias("util_pct"),
        )
        .orderBy("source")
    )


# ---- q429: epoch-shuffle source-interleaving audit ---------------------
@register(
    "q429_shuffle_interleave_audit",
    oracle="""
    WITH ordered AS (
        SELECT source,
               row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                  doc_id) AS pos
        FROM documents
    ),
    runs AS (
        SELECT source, pos,
               CASE WHEN lag(source) OVER (ORDER BY pos) IS DISTINCT
                         FROM source THEN 1 ELSE 0 END AS brk
        FROM ordered
    ),
    rid AS (
        SELECT source, sum(brk) OVER (ORDER BY pos
                                      ROWS UNBOUNDED PRECEDING) AS rid
        FROM runs
    ),
    per_run AS (
        SELECT source, rid, CAST(count(*) AS BIGINT) AS run_len
        FROM rid GROUP BY source, rid
    ),
    per_src AS (
        SELECT source,
               CAST(sum(run_len) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_runs_src,
               CAST(max(run_len) AS BIGINT) AS longest_run
        FROM per_run GROUP BY source
    ),
    g AS (
        SELECT CAST(sum(n_docs) AS BIGINT) AS n,
               CAST(sum(n_runs_src) AS BIGINT) AS r,
               CAST(sum(CAST(n_docs AS HUGEINT) * n_docs) AS HUGEINT)
                   AS s2,
               CAST(sum(CAST(n_docs AS HUGEINT) * n_docs * n_docs)
                    AS HUGEINT) AS s3
        FROM per_src
    ),
    z AS (
        SELECT n, r,
               CAST(round(1000000.0 * (n * (n + 1) - s2) / n) AS BIGINT)
                   AS e_micro,
               (CAST(s2 AS DOUBLE) * (s2 + n * (n + 1))
                - 2.0 * n * s3 - CAST(n AS DOUBLE) * n * n)
               / (CAST(n AS DOUBLE) * n * (n - 1)) AS var
        FROM g
    )
    SELECT p.source, p.n_docs, p.n_runs_src, p.longest_run,
           z.r AS total_runs, z.e_micro AS expected_runs_micro,
           CAST(round(1000.0 * (z.r - z.e_micro / 1000000.0)
                      / sqrt(z.var)) AS BIGINT) AS z_milli,
           z.r * 1000000 >= z.e_micro - CAST(round(1960.0 * sqrt(z.var)
                                                   * 1000.0) AS BIGINT)
                            * 1000 AS well_mixed
    FROM per_src p, z
    ORDER BY p.source
    """,
)
def q429_shuffle_interleave_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EPOCH-SHUFFLE interleaving audit — does the deterministic
    training order actually MIX the sources? Training on
    source-clumped batches biases gradients, so loaders shuffle
    (here the q17 md5 hash order — seedable, resumable) and this
    audit scores the result with the multi-category WALD-WOLFOWITZ
    runs test: per source the run structure (count, longest clump),
    globally the observed runs R vs the exact finite-sample
    E[R] = (n(n+1) − Σn_i²)/n and its variance, with z in
    milli-units and a 95% one-sided 'well_mixed' verdict (clumping
    LOWERS R; a hash order should sit within noise of random).
    Moments are exact integer sums (HUGEINT/decimal for Σn_i³ —
    the overflow discipline), so the z pin is bit-stable.

    Scale: the order is a hash sort the loader performs anyway; run
    detection is one lag window over it; everything after lives at
    |sources| grain. At 100 TB the same audit runs per shard and
    the per-shard z's combine (Stouffer), shard-grain rows only.
    """
    d = load(spark, sf_dir, "documents")
    ordered = d.select(
        "source",
        F.row_number()
        .over(Window.orderBy(F.md5(F.col("doc_id").cast("string")),
                             F.col("doc_id")))
        .alias("pos"),
    )
    wp = Window.orderBy("pos")
    rid = ordered.select(
        "source",
        F.sum(
            F.when(
                ~F.lag("source").over(wp).eqNullSafe(F.col("source")), 1
            ).otherwise(0)
        )
        .over(wp.rowsBetween(Window.unboundedPreceding, 0))
        .alias("rid"),
    )
    per_run = rid.groupBy("source", "rid").agg(
        F.count(F.lit(1)).cast("long").alias("run_len")
    )
    per_src = per_run.groupBy("source").agg(
        F.sum("run_len").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_runs_src"),
        F.max("run_len").cast("long").alias("longest_run"),
    )
    g = per_src.agg(
        F.sum("n_docs").cast("long").alias("n"),
        F.sum("n_runs_src").cast("long").alias("r"),
        F.sum(
            F.col("n_docs").cast("decimal(38,0)") * F.col("n_docs")
        ).alias("s2"),
        F.sum(
            F.col("n_docs").cast("decimal(38,0)")
            * F.col("n_docs")
            * F.col("n_docs")
        ).alias("s3"),
    )
    z = g.select(
        "n",
        "r",
        F.expr(
            "CAST(round(1000000.0 * (n * (n + 1) - s2) / n) AS BIGINT)"
        ).alias("e_micro"),
        F.expr(
            "(CAST(s2 AS DOUBLE) * (s2 + n * (n + 1))"
            " - 2.0 * n * s3 - CAST(n AS DOUBLE) * n * n)"
            " / (CAST(n AS DOUBLE) * n * (n - 1))"
        ).alias("var"),
    )
    return (
        per_src.crossJoin(F.broadcast(z))
        .select(
            "source",
            "n_docs",
            "n_runs_src",
            "longest_run",
            F.col("r").alias("total_runs"),
            F.col("e_micro").alias("expected_runs_micro"),
            F.expr(
                "CAST(round(1000.0 * (r - e_micro / 1000000.0)"
                " / sqrt(var)) AS BIGINT)"
            ).alias("z_milli"),
            F.expr(
                "r * 1000000 >= e_micro - CAST(round(1960.0 * sqrt(var)"
                " * 1000.0) AS BIGINT) * 1000"
            ).alias("well_mixed"),
        )
        .orderBy("source")
    )


# ---- q430: first-fit-decreasing packing vs the greedy baseline ---------
@register(
    "q430_ffd_packing_comparison",
    oracle=f"""
    WITH RECURSIVE docs AS (
        SELECT source, doc_id, doc_id // {_PACK_SHARD} AS shard,
               least(coalesce(len(string_split_regex(lower(trim(text)),
                                                     '\\s+')), 0),
                     {_PACK_C}) AS len_eff
        FROM documents
    ),
    seq AS (
        SELECT source, shard, len_eff,
               row_number() OVER (PARTITION BY source, shard
                                  ORDER BY doc_id) AS rn,
               row_number() OVER (PARTITION BY source, shard
                                  ORDER BY len_eff DESC, doc_id) AS rnf
        FROM docs
    ),
    shards AS (SELECT DISTINCT source, shard FROM seq),
    recg AS (
        SELECT source, shard, 0 AS r, CAST(0 AS BIGINT) AS bins,
               CAST({_PACK_C + 1} AS BIGINT) AS load
        FROM shards
        UNION ALL
        SELECT recg.source, recg.shard, recg.r + 1,
               CASE WHEN recg.load + d.len_eff > {_PACK_C}
                    THEN recg.bins + 1 ELSE recg.bins END,
               CASE WHEN recg.load + d.len_eff > {_PACK_C}
                    THEN d.len_eff ELSE recg.load + d.len_eff END
        FROM recg JOIN seq d
          ON d.source = recg.source AND d.shard = recg.shard
         AND d.rn = recg.r + 1
    ),
    recf AS (
        SELECT source, shard, 0 AS r, CAST([] AS BIGINT[]) AS loads
        FROM shards
        UNION ALL
        SELECT source, shard, r + 1,
               CASE WHEN idx IS NULL THEN list_append(loads, len_eff)
                    ELSE list_transform(range(1, len(loads) + 1),
                         i -> CASE WHEN i = idx THEN loads[i] + len_eff
                                   ELSE loads[i] END)
               END
        FROM (
            SELECT recf.source, recf.shard, recf.r, recf.loads, d.len_eff,
                   list_filter(range(1, len(recf.loads) + 1),
                       i -> recf.loads[i] + d.len_eff <= {_PACK_C})[1]
                       AS idx
            FROM recf JOIN seq d
              ON d.source = recf.source AND d.shard = recf.shard
             AND d.rnf = recf.r + 1
        )
    ),
    lastg AS (
        SELECT source, shard, bins FROM (
            SELECT source, shard, bins,
                   row_number() OVER (PARTITION BY source, shard
                                      ORDER BY r DESC) AS pick
            FROM recg
        ) WHERE pick = 1
    ),
    lastf AS (
        SELECT source, shard, CAST(len(loads) AS BIGINT) AS bins FROM (
            SELECT source, shard, loads,
                   row_number() OVER (PARTITION BY source, shard
                                      ORDER BY r DESC) AS pick
            FROM recf
        ) WHERE pick = 1
    ),
    per_shard AS (
        SELECT source, shard, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len_eff) AS BIGINT) AS toks
        FROM seq GROUP BY source, shard
    )
    SELECT p.source,
           CAST(sum(p.n_docs) AS BIGINT) AS n_docs,
           CAST(sum(g.bins) AS BIGINT) AS n_bins_greedy,
           CAST(sum(f.bins) AS BIGINT) AS n_bins_ffd,
           CAST(sum(g.bins) - sum(f.bins) AS BIGINT) AS bins_saved,
           round(100.0 * sum(p.toks) / (sum(g.bins) * {_PACK_C}), 2)
               AS util_greedy_pct,
           round(100.0 * sum(p.toks) / (sum(f.bins) * {_PACK_C}), 2)
               AS util_ffd_pct
    FROM per_shard p
    JOIN lastg g USING (source, shard)
    JOIN lastf f USING (source, shard)
    GROUP BY p.source
    ORDER BY p.source
    """,
)
def q430_ffd_packing_comparison(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FIRST-FIT-DECREASING packing vs q427's greedy — the classic
    bin-packing upgrade (FFD ≤ 11/9·OPT + 2/3) priced against the
    order-preserving baseline on the same shards: FFD sorts each
    shard's docs by token count descending and drops each into the
    first context with room (state = the open-bin load list),
    closing the question q427 leaves open — how many contexts does
    preserving document order COST? The trade is real: greedy keeps
    curriculum/position structure, FFD shuffles docs within the
    shard for tighter packing; bins_saved is the price tag per
    source. (FFD's guarantee is vs OPT, not vs next-fit — an
    adversarial document ORDER can let the order-preserving greedy
    beat FFD, so bins_saved is measured, not assumed non-negative;
    on natural length distributions FFD wins or ties.) Both folds run in the SAME Arrow batch per shard (one
    applyInPandas, two accumulators) and the oracle replays both as
    recursive CTEs — the FFD recursion carries the load list and
    does the first-fit probe with a list_filter, so a wrong
    fit-order or tie-break hash-fails.

    Scale: q427's economics exactly (bounded {_PACK_SHARD}-doc
    Arrow groups, text never in Python, |sources|×|shards| summary
    shuffle); FFD's in-group cost is O(docs·bins) on ≤512-doc
    shards.
    """
    import pandas as pd

    from g_etl_spark.operators import text as T

    d = load(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.expr(f"doc_id div {_PACK_SHARD}").alias("shard"),
        F.least(
            F.coalesce(F.size(T.tokens(F.col("text"))), F.lit(0)),
            F.lit(_PACK_C),
        ).alias("len_eff"),
    )

    def _pack2(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        bins_g = _greedy_pack_bins(pdf["len_eff"])
        loads: list[int] = []
        ffd = pdf.sort_values(
            ["len_eff", "doc_id"], ascending=[False, True]
        )
        for ln in ffd["len_eff"]:
            ln = int(ln)
            for i, lv in enumerate(loads):
                if lv + ln <= _PACK_C:
                    loads[i] = lv + ln
                    break
            else:
                loads.append(ln)
        return pd.DataFrame(
            [
                {
                    "source": pdf["source"].iloc[0],
                    "shard": int(pdf["shard"].iloc[0]),
                    "n_docs": len(pdf),
                    "bins_g": bins_g,
                    "bins_f": len(loads),
                    "toks": int(pdf["len_eff"].sum()),
                }
            ]
        )

    per_shard = d.groupBy("source", "shard").applyInPandas(
        _pack2,
        "source string, shard long, n_docs long, bins_g long,"
        " bins_f long, toks long",
    )
    return (
        per_shard.groupBy("source")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("bins_g").cast("long").alias("n_bins_greedy"),
            F.sum("bins_f").cast("long").alias("n_bins_ffd"),
            (F.sum("bins_g") - F.sum("bins_f"))
            .cast("long")
            .alias("bins_saved"),
            F.round(
                100.0 * F.sum("toks") / (F.sum("bins_g") * _PACK_C), 2
            ).alias("util_greedy_pct"),
            F.round(
                100.0 * F.sum("toks") / (F.sum("bins_f") * _PACK_C), 2
            ).alias("util_ffd_pct"),
        )
        .orderBy("source")
    )


# ---- q464: DoReMi-style domain reweighting (one MW step) -----------------
_Q464_ETA = 50   # linearized-MW step size per micro-nat of excess loss


@register(
    "q464_doremi_domain_reweight",
    oracle=f"""
    WITH tok AS MATERIALIZED (
        SELECT source, w FROM (
            SELECT source,
                   unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
            FROM documents) WHERE w <> ''
    ),
    wc AS MATERIALIZED (
        SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY w),
    tt AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM wc),
    cost AS MATERIALIZED (
        SELECT w, cnt,
               CAST(round(1000000 * ln(CAST(tt.t AS DOUBLE) / cnt))
                   AS BIGINT) AS c
        FROM wc, tt
    ),
    swc AS MATERIALIZED (
        SELECT source, w, CAST(count(*) AS BIGINT) AS scnt
        FROM tok GROUP BY source, w
    ),
    dom AS MATERIALIZED (
        SELECT s.source, CAST(sum(s.scnt) AS BIGINT) AS n_tokens,
               CAST(round(CAST(sum(s.scnt * c.c) AS DOUBLE)
                          / sum(s.scnt)) AS BIGINT) AS ce_micro
        FROM swc s JOIN cost c USING (w) GROUP BY s.source
    ),
    gl AS (
        SELECT CAST(round(CAST(sum(cnt * c) AS DOUBLE) / sum(cnt))
                   AS BIGINT) AS ce_global_micro,
               CAST(sum(cnt) AS BIGINT) AS t
        FROM cost
    ),
    step AS (
        SELECT d.source, d.n_tokens, d.ce_micro, g.ce_global_micro,
               CAST(greatest(d.ce_micro - g.ce_global_micro, 0)
                   AS BIGINT) AS excess_micro,
               CAST(round(1000000.0 * d.n_tokens / g.t) AS BIGINT)
                   AS w0_micro,
               CAST(round(1000000.0 * d.n_tokens / g.t) AS BIGINT)
                   * (1000000 + greatest(d.ce_micro - g.ce_global_micro, 0)
                      * {_Q464_ETA}) AS w1raw
        FROM dom d, gl g
    ),
    norm AS (SELECT CAST(sum(w1raw) AS BIGINT) AS sw FROM step)
    SELECT s.source, s.n_tokens, s.w0_micro, s.ce_micro,
           s.ce_global_micro, s.excess_micro,
           CAST(round(1000000.0 * s.w1raw / n.sw) AS BIGINT) AS w1_micro,
           CAST(round(1000000.0 * s.w1raw / n.sw) AS BIGINT) > s.w0_micro
               AS upweighted
    FROM step s, norm n ORDER BY s.source
    """,
)
def q464_doremi_domain_reweight(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DOREMI-STYLE domain reweighting, one multiplicative-weights
    step (Xie et al. 2023's loop body, the data-mixing decision the
    mixture family executes): per-domain (source) excess loss —
    average unigram cross-entropy under the GLOBAL corpus model
    (q424's exact micro-nat cost device) minus the corpus-wide
    average, floored at 0 — drives the linearized exponentiated-
    gradient update w₁ ∝ w₀·(1 + η·excess), normalized back to a
    distribution. Domains whose text the shared model finds HARD get
    upweighted, the DoReMi signal, computed here with pure integer
    arithmetic (exact token counts, micro-nat ln costs, one final
    double division of exact bigints) so both engines agree
    bit-for-bit — the linearized update replaces exp(η·excess)
    precisely to stay inside the cross-engine-exact envelope; at
    small η they differ at O(η²·excess²), far below a micro.

    Scale: one corpus pass to token grain, then everything is
    vocab-grain (global counts), (source × vocab)-grain (domain
    counts — the join is vocab-keyed, NOT broadcast: vocab is
    corpus-grain), and |sources|-grain. The DoReMi outer loop at
    100 TB re-runs exactly this plan per round with the proxy
    model's losses swapped in for the unigram costs — the update
    arithmetic and the rollup grains are unchanged.
    """
    d = load(spark, sf_dir, "documents")
    tok = (
        d.select(
            "source",
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w"),
        )
        .where(F.col("w") != "")
    )
    wc = tok.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    tt = wc.agg(F.sum("cnt").cast("long").alias("t"))
    cost = wc.crossJoin(F.broadcast(tt)).select(
        "w",
        "cnt",
        F.expr(
            "CAST(round(1000000 * ln(CAST(t AS DOUBLE) / cnt)) AS BIGINT)"
        ).alias("c"),
    )
    swc = tok.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("long").alias("scnt")
    )
    dom = (
        swc.join(cost.select("w", "c"), "w")
        .groupBy("source")
        .agg(
            F.sum("scnt").cast("long").alias("n_tokens"),
            F.expr(
                "CAST(round(CAST(sum(scnt * c) AS DOUBLE) / sum(scnt))"
                " AS BIGINT)"
            ).alias("ce_micro"),
        )
    )
    gl = cost.agg(
        F.expr(
            "CAST(round(CAST(sum(cnt * c) AS DOUBLE) / sum(cnt)) AS BIGINT)"
        ).alias("ce_global_micro"),
        F.sum("cnt").cast("long").alias("t"),
    )
    step = dom.crossJoin(F.broadcast(gl)).select(
        "source",
        "n_tokens",
        "ce_micro",
        "ce_global_micro",
        F.greatest(
            F.col("ce_micro") - F.col("ce_global_micro"), F.lit(0)
        ).cast("long").alias("excess_micro"),
        F.expr(
            "CAST(round(1000000.0 * n_tokens / t) AS BIGINT)"
        ).alias("w0_micro"),
        (
            F.expr("CAST(round(1000000.0 * n_tokens / t) AS BIGINT)")
            * (
                F.lit(1000000)
                + F.greatest(
                    F.col("ce_micro") - F.col("ce_global_micro"), F.lit(0)
                )
                * _Q464_ETA
            )
        ).alias("w1raw"),
    )
    norm = step.agg(F.sum("w1raw").cast("long").alias("sw"))
    return (
        step.crossJoin(F.broadcast(norm))
        .select(
            "source",
            "n_tokens",
            "w0_micro",
            "ce_micro",
            "ce_global_micro",
            "excess_micro",
            F.expr(
                "CAST(round(1000000.0 * w1raw / sw) AS BIGINT)"
            ).alias("w1_micro"),
            (
                F.expr("CAST(round(1000000.0 * w1raw / sw) AS BIGINT)")
                > F.col("w0_micro")
            ).alias("upweighted"),
        )
        .orderBy("source")
    )


# ---- q466: context-length packing frontier ------------------------------
_Q466_GRID = (256, 512, 1024, 2048, 4096)


@register(
    "q466_context_length_frontier",
    oracle=f"""
    WITH RECURSIVE grid(ctx) AS (
        VALUES {", ".join(f"({c})" for c in _Q466_GRID)}
    ),
    docs AS (
        SELECT doc_id, doc_id // {_PACK_SHARD} AS shard,
               coalesce(len(string_split_regex(lower(trim(text)),
                                               '\\s+')), 0) AS len_raw,
               row_number() OVER (PARTITION BY doc_id // {_PACK_SHARD}
                                  ORDER BY doc_id) AS rn
        FROM documents
    ),
    shards AS (SELECT DISTINCT shard FROM docs),
    rec AS (
        SELECT s.shard, g.ctx, 0 AS r, CAST(0 AS BIGINT) AS bins,
               CAST(g.ctx + 1 AS BIGINT) AS load
        FROM shards s CROSS JOIN grid g
        UNION ALL
        SELECT rec.shard, rec.ctx, rec.r + 1,
               CASE WHEN rec.load + least(d.len_raw, rec.ctx) > rec.ctx
                    THEN rec.bins + 1 ELSE rec.bins END,
               CASE WHEN rec.load + least(d.len_raw, rec.ctx) > rec.ctx
                    THEN least(d.len_raw, rec.ctx)
                    ELSE rec.load + least(d.len_raw, rec.ctx) END
        FROM rec JOIN docs d
          ON d.shard = rec.shard AND d.rn = rec.r + 1
    ),
    final AS (
        SELECT shard, ctx, bins FROM (
            SELECT shard, ctx, bins,
                   row_number() OVER (PARTITION BY shard, ctx
                                      ORDER BY r DESC) AS pick
            FROM rec
        ) WHERE pick = 1
    ),
    stats AS (
        SELECT g.ctx,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(least(d.len_raw, g.ctx)) AS BIGINT) AS toks,
               CAST(sum(CASE WHEN d.len_raw > g.ctx THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_truncated,
               CAST(sum(greatest(d.len_raw - g.ctx, 0)) AS BIGINT)
                   AS tokens_truncated
        FROM docs d CROSS JOIN grid g GROUP BY g.ctx
    ),
    packed AS (
        SELECT ctx, CAST(sum(bins) AS BIGINT) AS n_bins
        FROM final GROUP BY ctx
    )
    SELECT CAST(s.ctx AS BIGINT) AS ctx_len, s.n_docs, s.n_truncated,
           s.tokens_truncated, p.n_bins,
           s.toks AS total_tokens,
           CAST(p.n_bins * s.ctx - s.toks AS BIGINT) AS waste_tokens,
           round(100.0 * s.toks / (p.n_bins * s.ctx), 2) AS util_pct,
           round(100.0 * s.toks / (s.n_docs * s.ctx), 2)
               AS naive_util_pct
    FROM stats s JOIN packed p USING (ctx)
    ORDER BY ctx_len
    """,
)
def q466_context_length_frontier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CONTEXT-LENGTH packing frontier — the sizing sweep BEFORE
    q427's audit fixes L: the same order-preserving greedy NO-SPLIT
    packing fold run at every candidate context length
    {_Q466_GRID}, emitting per L the two costs a context-window
    decision trades: TRUNCATION (docs longer than L lose their tail
    — count and token mass, the information loss) vs PADDING
    (bins × L − packed tokens, the compute loss), plus the packed
    utilization against the one-doc-per-context naive bound. Small
    L packs tight but beheads long documents; large L keeps them
    whole but pads — this table is the whole decision as
    measurements (the q458 frontier discipline applied to the data
    loader).

    Scale: ONE corpus pass projects (shard, token count) — the text
    never reaches Python; each Arrow group (≤{_PACK_SHARD} docs)
    folds ALL {len(_Q466_GRID)} candidate lengths in one pass
    (state = two integers per L); the rollup is |grid| rows. The
    oracle replays the identical fold as one recursive CTE with L
    carried in the recursion state.
    """
    import pandas as pd

    from g_etl_spark.operators import text as T

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(f"doc_id div {_PACK_SHARD}").alias("shard"),
        F.coalesce(F.size(T.tokens(F.col("text"))), F.lit(0)).alias(
            "len_raw"
        ),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        out = []
        for ctx in _Q466_GRID:
            lens = pdf["len_raw"].clip(upper=ctx)
            bins, loadv = 0, ctx + 1
            for ln in lens:
                ln = int(ln)
                if loadv + ln > ctx:
                    bins += 1
                    loadv = ln
                else:
                    loadv += ln
            out.append(
                {
                    "shard": int(pdf["shard"].iloc[0]),
                    "ctx": ctx,
                    "n_docs": len(pdf),
                    "n_bins": bins,
                    "toks": int(lens.sum()),
                    "n_truncated": int((pdf["len_raw"] > ctx).sum()),
                    "tokens_truncated": int(
                        (pdf["len_raw"] - ctx).clip(lower=0).sum()
                    ),
                }
            )
        return pd.DataFrame(out)

    per_shard = d.groupBy("shard").applyInPandas(
        _pack,
        "shard long, ctx long, n_docs long, n_bins long, toks long,"
        " n_truncated long, tokens_truncated long",
    )
    return (
        per_shard.groupBy("ctx")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("n_truncated").cast("long").alias("n_truncated"),
            F.sum("tokens_truncated")
            .cast("long")
            .alias("tokens_truncated"),
            F.sum("n_bins").cast("long").alias("n_bins"),
            F.sum("toks").cast("long").alias("total_tokens"),
            (F.sum("n_bins") * F.col("ctx") - F.sum("toks"))
            .cast("long")
            .alias("waste_tokens"),
            F.round(
                100.0 * F.sum("toks") / (F.sum("n_bins") * F.col("ctx")), 2
            ).alias("util_pct"),
            F.round(
                100.0 * F.sum("toks") / (F.sum("n_docs") * F.col("ctx")), 2
            ).alias("naive_util_pct"),
        )
        .select(
            F.col("ctx").cast("long").alias("ctx_len"),
            "n_docs",
            "n_truncated",
            "tokens_truncated",
            "n_bins",
            "total_tokens",
            "waste_tokens",
            "util_pct",
            "naive_util_pct",
        )
        .orderBy("ctx_len")
    )


# ---- q475: temperature-scaled source sampling curve ---------------------
# τ grid chosen so n^(1/τ) is a composition of CORRECTLY-ROUNDED IEEE
# ops only (sqrt; sqrt∘sqrt): no libm pow in the gate.
_Q475_TAUS = (1, 2, 4)


def _q475_s_sql(tau: int, n: str) -> str:
    if tau == 1:
        return f"CAST({n} * 1000000 AS BIGINT)"
    if tau == 2:
        return f"CAST(round(1000000 * sqrt(CAST({n} AS DOUBLE))) AS BIGINT)"
    return (
        "CAST(round(1000000 * sqrt(sqrt(CAST("
        f"{n} AS DOUBLE)))) AS BIGINT)"
    )


@register(
    "q475_temperature_sampling_curve",
    oracle=f"""
    WITH src AS MATERIALIZED (
        SELECT source,
               CAST(sum(coalesce(len(string_split_regex(lower(trim(text)),
                                                        '\\s+')), 0))
                   AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ),
    scaled AS (
        {" UNION ALL ".join(
            f"SELECT {tau} AS tau, source, n_tokens,"
            f" {_q475_s_sql(tau, 'n_tokens')} AS s FROM src"
            for tau in _Q475_TAUS
        )}
    ),
    tot AS (
        SELECT tau, CAST(sum(s) AS BIGINT) AS st,
               CAST(sum(n_tokens) AS BIGINT) AS nt
        FROM scaled GROUP BY tau
    ),
    w AS (
        SELECT s.tau, s.source, s.n_tokens,
               CAST(round(1000000.0 * s.n_tokens / t.nt) AS BIGINT)
                   AS w_raw_micro,
               CAST(round(1000000.0 * s.s / t.st) AS BIGINT) AS w_micro
        FROM scaled s JOIN tot t USING (tau)
    ),
    ent AS (
        SELECT tau,
               CAST(sum(CASE WHEN w_micro > 0 THEN
                   CAST(round(w_micro * ln(1000000.0 / w_micro))
                       AS BIGINT) ELSE 0 END) AS BIGINT) AS entropy_micro
        FROM w GROUP BY tau
    )
    SELECT CAST(w.tau AS BIGINT) AS tau, w.source, w.n_tokens,
           w.w_raw_micro, w.w_micro, e.entropy_micro,
           w.w_micro > w.w_raw_micro AS upsampled
    FROM w JOIN ent e USING (tau)
    ORDER BY tau, source
    """,
)
def q475_temperature_sampling_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TEMPERATURE-SCALED source sampling — the α/τ-sampling every
    multilingual/multi-source pretraining mix uses (XLM-R's
    p_i ∝ n_i^(1/τ)): at τ=1 sources are sampled by size, higher τ
    flattens the mixture toward uniform, upsampling the tail. The τ
    grid {_Q475_TAUS} is chosen so every power is a composition of
    CORRECTLY-ROUNDED IEEE ops (identity; sqrt; sqrt∘sqrt) — each
    scaled mass is micro-quantized per source BEFORE the integer
    normalizing sum, so the whole curve is bit-identical across
    engines with no libm pow anywhere. Per (τ, source): raw vs
    tempered weight and the upsampled flag; per τ the mixture
    entropy in micro-nats — the single number (vs ln|sources|) that
    says how far from uniform each temperature lands, which is how
    a τ is actually picked.

    Scale: one corpus pass to |sources| token counts; everything
    after is |τ|×|sources| integer arithmetic. The chosen τ's
    w_micro column feeds q84/q355's samplers directly.
    """
    d = load(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(
        F.sum(
            F.coalesce(
                F.size(F.split(F.lower(F.trim("text")), r"\s+")), F.lit(0)
            )
        ).cast("long").alias("n_tokens")
    )
    scaled = None
    for tau in _Q475_TAUS:
        part = src.select(
            F.lit(tau).cast("long").alias("tau"),
            "source",
            "n_tokens",
            F.expr(_q475_s_sql(tau, "n_tokens")).alias("s"),
        )
        scaled = part if scaled is None else scaled.unionByName(part)
    tot = scaled.groupBy("tau").agg(
        F.sum("s").cast("long").alias("st"),
        F.sum("n_tokens").cast("long").alias("nt"),
    )
    w = scaled.join(F.broadcast(tot), "tau").select(
        "tau",
        "source",
        "n_tokens",
        F.expr("CAST(round(1000000.0 * n_tokens / nt) AS BIGINT)").alias(
            "w_raw_micro"
        ),
        F.expr("CAST(round(1000000.0 * s / st) AS BIGINT)").alias(
            "w_micro"
        ),
    )
    ent = w.groupBy("tau").agg(
        F.sum(
            F.when(
                F.col("w_micro") > 0,
                F.expr(
                    "CAST(round(w_micro * ln(1000000.0 / w_micro))"
                    " AS BIGINT)"
                ),
            ).otherwise(0)
        ).cast("long").alias("entropy_micro")
    )
    return (
        w.join(F.broadcast(ent), "tau")
        .select(
            "tau",
            "source",
            "n_tokens",
            "w_raw_micro",
            "w_micro",
            "entropy_micro",
            (F.col("w_micro") > F.col("w_raw_micro")).alias("upsampled"),
        )
        .orderBy("tau", "source")
    )
