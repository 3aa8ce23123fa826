"""Similarity-search query family over the `embeddings` table
(array<float> column, 64 dims). Backed by operators/similarity.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from g_etl_spark.operators import similarity as S
from g_etl_spark.queries import register
from g_etl_spark.tables import load


def _query_vector(spark: SparkSession, sf_dir: str) -> list[float] | None:
    """The query vector = stored embedding of vec_id 0 (bounded
    driver fetch of one row; both engines read the same value).
    None on an empty corpus — callers return a schema-correct empty
    result instead of crashing (the empty-partition contract,
    tests/test_empty_corpus.py)."""
    row = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .head()
    )
    return None if row is None else [float(x) for x in row[0]]


_TOPK_SCHEMA = "vec_id bigint, cosine double"


def _empty(spark: SparkSession, schema: str) -> DataFrame:
    return spark.createDataFrame([], schema)


def _staged_centroid_relations(e: DataFrame, k: int = 8):
    """(cents, vecs, dot) — the centroid-assignment scaffold shared
    by q97 (SemDeDup assign), q108 (IVF coarse quantizer) and q135
    (k-means update): centroids = the first k vectors, every vector
    cast to double with its L2 norm STAGED before the k-way
    broadcast fan-out. Higher-order array exprs are CodegenFallback,
    so evaluating the norm inside the crossJoin would pay it k times
    per row (measured at 200k vectors × k=8: 45 s → 20 s by
    hoisting). One definition so a zero-norm guard or tiebreak
    change cannot drift between the three operators.
    """
    cast_d = lambda col: F.transform(col, lambda x: x.cast("double"))  # noqa: E731
    norm = lambda col: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(cast_d(col), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    cents = e.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"),
        cast_d(F.col("embedding")).alias("cv"),
        norm(F.col("embedding")).alias("c_norm"),
    )
    vecs = e.select(
        "vec_id",
        cast_d(F.col("embedding")).alias("ev"),
        norm(F.col("embedding")).alias("e_norm"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("ev"), F.col("cv"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return cents, vecs, dot


@register(
    "q60_cosine_topk",
    oracle="""
    WITH q AS (
        SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        FROM embeddings WHERE vec_id = 0
    ),
    scored AS (
        SELECT e.vec_id,
               round(list_aggregate(list_transform(range(1, 65),
                                                   i -> CAST(e.embedding[i] AS DOUBLE) * q.qv[i]),
                                    'sum')
                     / (sqrt(list_aggregate(list_transform(e.embedding,
                                                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                                            'sum'))
                        * sqrt(list_aggregate(list_transform(q.qv, x -> x * x), 'sum'))),
                     3) AS cosine
        FROM embeddings e, q
    )
    SELECT vec_id, cosine FROM scored
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
)
def q60_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k ANN baseline
    (operators/similarity.cosine_topk): one scan, zip_with/aggregate
    dot product JVM-side, TakeOrdered top-k — no global sort."""
    e = load(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir)
    if q is None:
        return _empty(spark, _TOPK_SCHEMA)
    return S.cosine_topk(e, q, k=10)


def _srp_bucket_sql(
    n_planes: int = 6, dim: int = 64, col: str = "embedding", seed: str = "srp"
) -> str:
    """DuckDB expression for the SRP bucket of `col` — the SAME
    md5-derived hyperplanes as operators/similarity, embedded as
    literal constants so both engines compute identical sign bits.
    `seed` selects the hyperplane set (seed 0 of the multi-seed
    operator is "srp"; seed i>0 is "srp:i")."""
    planes = S.random_hyperplanes(n_planes, dim, seed=seed)
    bits = []
    for p, plane in enumerate(planes):
        arr = ", ".join(repr(v) for v in plane)
        dot = (
            f"list_aggregate(list_transform(range(1, {dim + 1}), "
            f"i -> CAST({col}[i] AS DOUBLE) * ([{arr}])[i]), 'sum')"
        )
        bits.append(f"(CASE WHEN {dot} >= 0 THEN CAST(1 AS BIGINT) ELSE 0 END << {p})")
    return "(" + " | ".join(bits) + ")"


@register(
    "q61_ann_srp_bucket",
    oracle=f"""
    WITH bucketed AS (
        SELECT vec_id, embedding, {_srp_bucket_sql()} AS bucket
        FROM embeddings
    ),
    q AS (
        SELECT bucket AS qbucket,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        FROM bucketed WHERE vec_id = 0
    )
    SELECT b.vec_id,
           round(list_aggregate(list_transform(range(1, 65),
                                               i -> CAST(b.embedding[i] AS DOUBLE) * q.qv[i]),
                                'sum')
                 / (sqrt(list_aggregate(list_transform(b.embedding,
                                                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                                        'sum'))
                    * sqrt(list_aggregate(list_transform(q.qv, x -> x * x), 'sum'))),
                 3) AS cosine
    FROM bucketed b, q
    WHERE b.bucket = q.qbucket
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
)
def q61_ann_srp_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via sign-random-projection LSH: probe only
    the query's bucket (operators/similarity.ann_topk_srp). The
    hyperplanes are md5-derived Python constants embedded as literals
    in BOTH engines, so even the LSH path is fully oracle-checked."""
    e = load(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir)
    if q is None:
        return _empty(spark, _TOPK_SCHEMA)
    return S.ann_topk_srp(e, q, k=10, n_planes=6)


@register(
    "q62_label_centroids",
    oracle="""
    SELECT label,
           i - 1                                  AS dim_idx,
           round(avg(CAST(embedding[i] AS DOUBLE)), 4) AS avg_val,
           count(*)                               AS n_vecs
    FROM embeddings, (SELECT unnest(range(1, 9)) AS i)
    GROUP BY label, i
    ORDER BY label, dim_idx
    """,
)
def q62_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid (first 8 dims shown): posexplode the vector
    → groupBy (label, dim) avg — the distributed way to average
    vectors without collecting them."""
    e = load(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("dim_idx", "v"))
        .filter(F.col("dim_idx") < 8)
        .withColumn("dim_idx", F.col("dim_idx").cast("long"))
        .groupBy("label", "dim_idx")
        .agg(
            F.round(F.avg(F.col("v").cast("double")), 4).alias("avg_val"),
            F.count(F.lit(1)).alias("n_vecs"),
        )
        .orderBy("label", "dim_idx")
    )


@register(
    "q63_semantic_retrieval",
    oracle="""
    WITH q AS (
        SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        FROM embeddings WHERE vec_id = 0
    ),
    scored AS (
        SELECT e.vec_id,
               round(list_aggregate(list_transform(range(1, 65),
                                                   i -> CAST(e.embedding[i] AS DOUBLE) * q.qv[i]),
                                    'sum')
                     / (sqrt(list_aggregate(list_transform(e.embedding,
                                                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                                            'sum'))
                        * sqrt(list_aggregate(list_transform(q.qv, x -> x * x), 'sum'))),
                     3) AS cosine
        FROM embeddings e, q
        ORDER BY cosine DESC, vec_id
        LIMIT 10
    )
    SELECT s.vec_id, s.cosine, d.lang, d.source,
           substr(d.text, 1, 40) AS snippet
    FROM scored s
    JOIN documents d ON d.doc_id = s.vec_id
    ORDER BY s.cosine DESC, s.vec_id
    """,
)
def q63_semantic_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal retrieval: ANN top-k over embeddings joined back to
    the document store (vec_id = doc_id) for text + metadata — the
    RAG-retrieval query shape. The top-k side is tiny → the join
    broadcasts it into the documents scan."""

    q = _query_vector(spark, sf_dir)
    if q is None:
        return _empty(
            spark,
            _TOPK_SCHEMA + ", lang string, source string, snippet string",
        )
    top = S.cosine_topk(load(spark, sf_dir, "embeddings"), q, k=10)
    docs = load(spark, sf_dir, "documents")
    return (
        F.broadcast(top)
        .join(docs, top.vec_id == docs.doc_id)
        .select(
            "vec_id",
            "cosine",
            "lang",
            "source",
            F.substring("text", 1, 40).alias("snippet"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
    )


# zero-scale guard mirrors operators/similarity.quantize_int8: an
# all-zero vector quantizes to zeros instead of riding 0/0 -> NaN
# through engine-specific CAST semantics
_QUANT = """
        CASE WHEN list_aggregate(list_transform(embedding,
                      y -> abs(CAST(y AS DOUBLE))), 'max') > 0
        THEN list_transform(
            list_transform(embedding, x -> CAST(x AS DOUBLE)),
            x -> CAST(round(x / (list_aggregate(list_transform(embedding,
                                    y -> abs(CAST(y AS DOUBLE))), 'max') / 127.0), 0)
                      AS INT))
        ELSE list_transform(embedding, x -> CAST(0 AS INT)) END
"""


@register(
    "q72_quantized_ann",
    oracle=f"""
    WITH quant AS (
        SELECT vec_id, {_QUANT} AS qv FROM embeddings
    ),
    q AS (SELECT qv AS query_v FROM quant WHERE vec_id = 0),
    scored AS (
        SELECT e.vec_id,
               round(list_aggregate(list_transform(range(1, 65),
                          i -> CAST(e.qv[i] AS DOUBLE) * CAST(q.query_v[i] AS DOUBLE)),
                          'sum')
                     / greatest(
                         sqrt(list_aggregate(list_transform(e.qv,
                                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                         * sqrt(list_aggregate(list_transform(q.query_v,
                                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')),
                         1e-12),
                     3) AS q_cosine
        FROM quant e, q
    )
    SELECT vec_id, q_cosine FROM scored
    ORDER BY q_cosine DESC, vec_id
    LIMIT 10
    """,
)
def q72_quantized_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN over INT8-QUANTIZED embeddings
    (operators/similarity.quantize_int8): 4× less index I/O; cosine
    is computed directly on the int vectors because per-vector scale
    cancels. Top-10 for the q60 query vector — compared against
    q60's exact result: measured recall@10 = 0.9 at sf0.01 (one swap
    at rank 10, where exact cosines differ by <0.001).

    Scale: quantization is map-only (write it once at ingest); the
    probe is the same TakeOrdered scan as q60 over ¼ the bytes.
    """
    e = load(spark, sf_dir, "embeddings")
    quant = e.select("vec_id", S.quantize_int8(F.col("embedding")).alias("qv"))
    qrow = quant.filter(F.col("vec_id") == 0).select("qv").head()
    if qrow is None:
        # empty-corpus schema must match the real output (q_cosine,
        # not _TOPK_SCHEMA's cosine) or the column-name contract
        # breaks on the zero-row frame
        return _empty(spark, "vec_id bigint, q_cosine double")
    qv = qrow[0]
    lit_q = F.array(*[F.lit(int(x)) for x in qv])
    dot = F.aggregate(
        F.zip_with(F.col("qv"), lit_q, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm_e = F.sqrt(
        F.aggregate(
            F.transform(F.col("qv"), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    norm_q = float(sum(int(x) * int(x) for x in qv)) ** 0.5
    return (
        quant.select(
            "vec_id",
            F.round(
                dot / F.greatest(norm_e * F.lit(norm_q), F.lit(1e-12)), 3
            ).alias("q_cosine"),
        )
        .orderBy(F.desc("q_cosine"), F.asc("vec_id"))
        .limit(10)
    )


@register(
    "q97_semantic_cluster_assign",
    oracle="""
    WITH c AS (
        SELECT vec_id AS cid,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
        FROM embeddings WHERE vec_id < 8
    ),
    scored AS (
        SELECT e.vec_id, c.cid,
               round(list_aggregate(list_transform(range(1, 65),
                                                   i -> CAST(e.embedding[i] AS DOUBLE) * c.cv[i]),
                                    'sum')
                     / (sqrt(list_aggregate(list_transform(e.embedding,
                                                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                                            'sum'))
                        * sqrt(list_aggregate(list_transform(c.cv, x -> x * x), 'sum'))),
                     3) AS cosine
        FROM embeddings e, c
    ),
    best AS (
        SELECT vec_id, cid, cosine,
               row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, cid) AS rn
        FROM scored
    )
    SELECT cid AS cluster_id,
           count(*)             AS n_members,
           round(min(cosine), 3) AS min_cos,
           round(max(cosine), 3) AS max_cos
    FROM best WHERE rn = 1
    GROUP BY cid
    ORDER BY cid
    """,
)
def q97_semantic_cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic clustering assignment (the SemDeDup first stage:
    partition the corpus by nearest centroid, then dedup WITHIN
    clusters so the pairwise phase is n²/k, not n²): every vector is
    assigned to its nearest of k=8 fixed seed centroids (the stored
    embeddings of vec_id 0-7) by cosine, ties broken by centroid id.

    Scale: the centroid table broadcasts (k rows), the scan computes
    k cosines per row JVM-side (zip_with/aggregate — no Python), and
    the argmax is a size-k per-row reduction, NOT a window over the
    corpus: one narrow shuffle for the final per-cluster rollup. At
    100 TB with k in the thousands this becomes the IVF coarse
    quantizer already benched in operators/similarity_ml.
    """
    e = load(spark, sf_dir, "embeddings")
    cents, vecs, dot = _staged_centroid_relations(e)
    scored = (
        vecs.crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            "cid",
            F.round(dot / (F.col("e_norm") * F.col("c_norm")), 3).alias("cosine"),
        )
    )
    # per-row argmax over k candidates: max_by with a composite
    # (cosine, -cid) preference — no corpus-wide window sort
    best = scored.groupBy("vec_id").agg(
        F.max(F.struct(F.col("cosine"), (-F.col("cid")).alias("neg_cid"))).alias("b")
    ).select(
        "vec_id",
        (-F.col("b.neg_cid")).alias("cluster_id"),
        F.col("b.cosine").alias("cosine"),
    )
    return (
        best.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(F.min("cosine"), 3).alias("min_cos"),
            F.round(F.max("cosine"), 3).alias("max_cos"),
        )
        .orderBy("cluster_id")
    )


@register(
    "q108_ivf_topk",
    oracle="""
    WITH c AS (
        SELECT vec_id AS cid,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
        FROM embeddings WHERE vec_id < 8
    ),
    q AS (
        SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        FROM embeddings WHERE vec_id = 0
    ),
    assigned AS (
        SELECT e.vec_id, c.cid,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY round(list_aggregate(list_transform(range(1, 65),
                                      i -> CAST(e.embedding[i] AS DOUBLE) * c.cv[i]), 'sum')
                         / (sqrt(list_aggregate(list_transform(e.embedding,
                                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                            * sqrt(list_aggregate(list_transform(c.cv, x -> x * x), 'sum'))), 3) DESC,
                            c.cid
               ) AS rn
        FROM embeddings e, c
    ),
    cells AS (SELECT vec_id, cid FROM assigned WHERE rn = 1),
    probe AS (
        -- the query vector's 2 nearest cells (nprobe = 2)
        SELECT cid FROM cells JOIN (SELECT 0) z ON cells.vec_id = 0
        UNION
        SELECT cid FROM assigned WHERE vec_id = 0 AND rn = 2
    ),
    cand AS (
        SELECT e.vec_id, e.embedding
        FROM embeddings e JOIN cells ON e.vec_id = cells.vec_id
        JOIN probe ON cells.cid = probe.cid
        WHERE e.vec_id <> 0
    )
    SELECT cand.vec_id,
           round(list_aggregate(list_transform(range(1, 65),
                      i -> CAST(cand.embedding[i] AS DOUBLE) * q.qv[i]), 'sum')
                 / (sqrt(list_aggregate(list_transform(cand.embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                    * sqrt(list_aggregate(list_transform(q.qv, x -> x * x), 'sum'))), 3) AS cosine
    FROM cand, q
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
)
def q108_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN under the oracle — the industry-
    standard scale path q61's SRP buckets approximate: vectors are
    assigned to their nearest of k=8 fixed coarse centroids (q97's
    assignment), and the query probes only its nprobe=2 nearest
    cells, brute-forcing cosine INSIDE those cells.

    Scale: the centroid table broadcasts; assignment is the map-only
    k-cosine argmax (norms staged, q97's measured discipline); the
    probe turns top-k over N vectors into top-k over N·(nprobe/k)
    — with k in the thousands at 100 TB, a 500× scan reduction, the
    same plan as FAISS IVF-Flat distributed by cell equi-join.
    """
    e = load(spark, sf_dir, "embeddings")
    cents, vecs, dot = _staged_centroid_relations(e)
    scored = vecs.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "cid",
        F.round(dot / (F.col("e_norm") * F.col("c_norm")), 3).alias("cos"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), "cid")
    ranked = scored.withColumn("rn", F.row_number().over(w))
    cells = ranked.filter(F.col("rn") == 1).select("vec_id", "cid")
    probe = (
        ranked.filter((F.col("vec_id") == 0) & (F.col("rn") <= 2))
        .select("cid")
        .distinct()
    )
    qv = vecs.filter(F.col("vec_id") == 0).select(
        F.col("ev").alias("qv"), F.col("e_norm").alias("q_norm")
    )
    cand = (
        vecs.join(cells, "vec_id")
        .join(F.broadcast(probe), "cid")
        .filter(F.col("vec_id") != 0)
    )
    qdot = F.aggregate(
        F.zip_with(F.col("ev"), F.col("qv"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        cand.crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            F.round(qdot / (F.col("e_norm") * F.col("q_norm")), 3).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(10)
    )


@register(
    "q135_kmeans_update_step",
    oracle="""
    WITH c AS (
        SELECT vec_id AS cid,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
        FROM embeddings WHERE vec_id < 8
    ),
    scored AS (
        SELECT e.vec_id, c.cid,
               round(list_aggregate(list_transform(range(1, 65),
                                                   i -> CAST(e.embedding[i] AS DOUBLE) * c.cv[i]),
                                    'sum')
                     / (sqrt(list_aggregate(list_transform(e.embedding,
                                                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                                            'sum'))
                        * sqrt(list_aggregate(list_transform(c.cv, x -> x * x), 'sum'))),
                     3) AS cosine
        FROM embeddings e, c
    ),
    best AS (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, cid) AS rn
        FROM scored
    )
    SELECT b.cid AS cluster_id, CAST(g.i AS BIGINT) AS pos,
           round(avg(CAST(e.embedding[g.i] AS DOUBLE)), 6) AS c_val
    FROM best b
    JOIN embeddings e USING (vec_id)
    CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) g
    WHERE b.rn = 1
    GROUP BY b.cid, g.i
    ORDER BY cluster_id, pos
    """,
)
def q135_kmeans_update_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd's iteration of distributed k-means, update step:
    after assigning every vector to its nearest centroid (q97's
    broadcast-cosine argmax), recompute each centroid as the
    element-wise mean of its members — the loop body of
    SemDeDup-style corpus clustering, emitted as (cluster, pos,
    value) so the oracle verifies every coordinate.

    Scale: assignment is the q97 map-side argmax (no corpus
    window); the update posexplodes members into (cluster, pos)
    cells whose partial aggregation collapses to k·d rows BEFORE the
    exchange — the classic mergeable-accumulator formulation that
    lets k-means run over any corpus size with k·d driver-side
    state per iteration (the next round broadcasts these rows back
    as centroids).
    """
    e = load(spark, sf_dir, "embeddings")
    cents, vecs, dot = _staged_centroid_relations(e)
    scored = vecs.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "cid",
        F.round(dot / (F.col("e_norm") * F.col("c_norm")), 3).alias("cosine"),
    )
    best = (
        scored.groupBy("vec_id")
        .agg(
            F.max(
                F.struct(F.col("cosine"), (-F.col("cid")).alias("neg_cid"))
            ).alias("b")
        )
        .select("vec_id", (-F.col("b.neg_cid")).alias("cluster_id"))
    )
    members = best.join(e, "vec_id").select(
        "cluster_id", F.posexplode(F.col("embedding"))
    )
    return (
        members.groupBy(
            "cluster_id", (F.col("pos") + 1).cast("long").alias("pos")
        )
        .agg(F.round(F.avg(F.col("col").cast("double")), 6).alias("c_val"))
        .orderBy("cluster_id", "pos")
    )


@register(
    "q136_gram_matrix",
    oracle="""
    SELECT CAST(a.i AS BIGINT) AS i, CAST(b.j AS BIGINT) AS j,
           round(sum(CAST(embedding[a.i] AS DOUBLE) * CAST(embedding[b.j] AS DOUBLE)), 6) AS xtx
    FROM embeddings
    CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) a
    CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS j) b
    WHERE b.j >= a.i
    GROUP BY a.i, b.j
    ORDER BY i, j
    """,
)
def q136_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed gram matrix X^T X (upper triangle) over the
    embedding corpus — the primitive beneath PCA / whitening /
    linear-probe fitting at scale: d(d+1)/2 = 2080 cells for d=64,
    each the sum over all rows of x_i·x_j.

    Implementation: one Arrow-batched mapInPandas stage computes
    each batch's LOCAL X^T X with a single numpy GEMM and emits
    2080 partial cells per batch; the final aggregation merges
    per-batch matrices. This is the mergeable-moment formulation —
    O(d²) state per partition, independent of row count — and the
    GEMM is the measured winner: a pure-SQL nested-transform
    (explode d²/2 struct products per row, JVM-side) was tried and
    REJECTED at ×100 scale — 123 s vs 4.9 s for 200k vectors — the
    per-element object churn of a CodegenFallback array build loses
    25× to one dgemm per Arrow batch. Exactly how X^T X is
    accumulated over 100 TB for driver-side eigendecomposition
    (d² stays tiny while n does not).

    round(6) guards the cross-engine compare: per-batch summation
    order differs from the oracle's sequential sum by ~1e-12 abs.
    """
    import numpy as np
    import pandas as pd

    e = load(spark, sf_dir, "embeddings")

    def gram_batches(it):
        iu = np.triu_indices(64)
        for pdf in it:
            if not len(pdf):
                continue
            m = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            g = m.T @ m
            yield pd.DataFrame({"i": iu[0] + 1, "j": iu[1] + 1, "p": g[iu]})

    return (
        e.select("embedding")
        .mapInPandas(gram_batches, "i long, j long, p double")
        .groupBy("i", "j")
        .agg(F.round(F.sum("p"), 6).alias("xtx"))
        .orderBy("i", "j")
    )


@register(
    "q142_feature_standardize",
    oracle="""
    WITH cells AS (
        SELECT vec_id, g.i AS pos, CAST(embedding[g.i] AS DOUBLE) AS x
        FROM embeddings
        CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) g
    ),
    stats AS (
        SELECT pos, avg(x) AS mu, stddev_samp(x) AS sd
        FROM cells GROUP BY pos
    )
    SELECT c.vec_id, CAST(c.pos AS BIGINT) AS pos,
           round((c.x - s.mu) / s.sd, 6) AS z
    FROM cells c JOIN stats s USING (pos)
    WHERE c.vec_id < 5 AND c.pos <= 8
    ORDER BY c.vec_id, c.pos
    """,
)
def q142_feature_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension feature standardization (z-scaling) of the
    embedding corpus — the preprocessing step before distance-based
    ops (q54/q60/q97) when dimensions have unequal variance; emitted
    as spot-check coordinates (vec_id < 5, first 8 dims) so the
    oracle verifies the exact standardized values without hashing
    500×64 rows.

    Scale: the stats are ONE posexplode + map-side-combined agg into
    d rows (the mergeable-moment shape shared with q136), broadcast
    back onto the cell stream; nothing after the d-row aggregate
    scales with corpus size, and in production the d-row stats table
    is applied inside a single array transform (no explode) on the
    write path.
    """
    e = load(spark, sf_dir, "embeddings")
    cells = e.select(
        "vec_id", F.posexplode(F.col("embedding"))
    ).select(
        "vec_id",
        (F.col("pos") + 1).cast("long").alias("pos"),
        F.col("col").cast("double").alias("x"),
    )
    stats = cells.groupBy("pos").agg(
        F.avg("x").alias("mu"), F.stddev_samp("x").alias("sd")
    )
    return (
        cells.join(F.broadcast(stats), "pos")
        .filter((F.col("vec_id") < 5) & (F.col("pos") <= 8))
        .select(
            "vec_id",
            "pos",
            F.round((F.col("x") - F.col("mu")) / F.col("sd"), 6).alias("z"),
        )
        .orderBy("vec_id", "pos")
    )


@register(
    "q152_quantile_normalization",
    oracle="""
    WITH e AS (
        SELECT vec_id, g.i AS dim, CAST(embedding[g.i] AS DOUBLE) AS val
        FROM embeddings
        CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) g
    ),
    ranked AS (
        SELECT vec_id, dim, val,
               row_number() OVER (PARTITION BY dim ORDER BY val, vec_id) AS rn
        FROM e
    ),
    ref AS (SELECT rn, avg(val) AS ref FROM ranked GROUP BY rn)
    SELECT r.vec_id, CAST(r.dim AS BIGINT) AS dim, round(f.ref, 5) AS qnorm
    FROM ranked r JOIN ref f USING (rn)
    WHERE r.vec_id < 8 AND r.dim <= 4
    ORDER BY vec_id, dim
    """,
)
def q152_quantile_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of the embedding matrix (columns =
    dimensions): each dimension's k-th smallest value is replaced by
    the MEAN of the k-th smallest values across all 64 dimensions, so
    every dimension ends with the identical marginal distribution —
    the feature-calibration transform (classic in batch-effect
    correction) that min-max or z-scaling (q142) cannot express.
    Ties rank deterministically by (val, vec_id); output is the
    normalized block for vec_id < 8 × dims 1-4.

    Scale: two exchanges — the per-dimension rank (64 sort groups;
    with d columns this is d independent sorts that parallelize
    perfectly) and the per-rank mean whose partial agg collapses to
    |rows| reference cells. At 100 TB the exact ranks become the
    equi-depth sketch (the q131/Z-order quantile machinery) and the
    reference curve interpolates — the same two-pass shape with the
    sort replaced by a mergeable histogram.
    """
    e = load(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id", F.posexplode(F.col("embedding"))
    ).select(
        "vec_id",
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.col("col").cast("double").alias("val"),
    )
    wd = Window.partitionBy("dim").orderBy("val", "vec_id")
    ranked = ex.withColumn("rn", F.row_number().over(wd))
    ref = ranked.groupBy("rn").agg(F.avg("val").alias("ref"))
    sub = ranked.filter((F.col("vec_id") < 8) & (F.col("dim") <= 4))
    return (
        F.broadcast(sub)
        .join(ref, "rn")
        .select("vec_id", "dim", F.round("ref", 5).alias("qnorm"))
        .orderBy("vec_id", "dim")
    )


@register(
    "q158_power_iteration_pca",
    oracle="""
    WITH x AS (SELECT vec_id, embedding FROM embeddings),
    e AS (
        SELECT vec_id, g.i AS dim, CAST(embedding[g.i] AS DOUBLE) AS v
        FROM x CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) g
    ),
    v0 AS (SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS v0 FROM x),
    z1 AS (SELECT e.dim, sum(e.v * v0.v0) AS z
           FROM e JOIN v0 USING (vec_id) GROUP BY e.dim),
    y2 AS (SELECT e.vec_id, sum(e.v * z1.z) AS y
           FROM e JOIN z1 USING (dim) GROUP BY e.vec_id),
    z2 AS (SELECT e.dim, sum(e.v * y2.y) AS z
           FROM e JOIN y2 USING (vec_id) GROUP BY e.dim),
    nrm AS (SELECT sqrt(sum(z * z)) AS n FROM z2)
    SELECT CAST(dim AS BIGINT) AS dim, round(z / n, 6) AS loading
    FROM z2, nrm ORDER BY dim
    """,
)
def q158_power_iteration_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading principal direction of the embedding corpus by two
    unnormalized power-iteration steps on the covariance surrogate
    XᵀX: v ∝ (XᵀX)² e₁, reported L2-normalized — distributed PCA
    without materializing the d×d gram (q136's complement: that
    query ships the matrix, this one ships only d-vectors).

    Each half-step is a mergeable d-cell aggregate: z = Xᵀ(Xv)
    evaluates as a map-side dot product per row (v is a broadcast
    64-literal array — the only driver materialization, d doubles,
    q124's bounded-collect rule) followed by one partial-agg sum per
    dimension. Normalization deferral keeps the recurrence free of
    intermediate rounding; both engines sum the identical products
    and the final round(6) absorbs summation-order ulps.

    Scale: two passes over the corpus, each exchanging 64 cells —
    the exact shape iterated k times for top-k deflation at 100 TB
    (Lanczos/Arnoldi refinements change the driver math, not the
    Spark plan).
    """
    e = load(spark, sf_dir, "embeddings")
    x = e.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda c: c.cast("double")).alias("x"),
    )
    ex = x.select(
        "vec_id",
        F.element_at("x", 1).alias("v0"),
        F.posexplode("x"),
    ).select(
        "vec_id",
        "v0",
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.col("col").alias("v"),
    )
    z1_rows = (
        ex.groupBy("dim")
        .agg(F.sum(F.col("v") * F.col("v0")).alias("z"))
        .orderBy("dim")
        .collect()
    )
    v1 = F.array(*[F.lit(float(r["z"])) for r in z1_rows])
    y2 = x.select(
        "vec_id",
        F.aggregate(
            F.zip_with(F.col("x"), v1, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, t: acc + t,
        ).alias("y"),
    )
    z2 = (
        x.join(y2, "vec_id")
        .select(F.posexplode("x"), F.col("y"))
        .groupBy((F.col("pos") + 1).cast("long").alias("dim"))
        .agg(F.sum(F.col("col") * F.col("y")).alias("z"))
    )
    nrm = z2.agg(F.sqrt(F.sum(F.col("z") * F.col("z"))).alias("n"))
    return (
        z2.crossJoin(F.broadcast(nrm))
        .select("dim", F.round(F.col("z") / F.col("n"), 6).alias("loading"))
        .orderBy("dim")
    )


@register(
    "q161_logreg_gradient",
    oracle="""
    WITH x AS (
        SELECT vec_id, embedding, label % 2 AS y,
               1.0 / (1.0 + exp(-0.1 * CAST(embedding[1] AS DOUBLE))) AS sig
        FROM embeddings
    )
    SELECT CAST(g.i AS BIGINT) AS dim,
           round(sum(CAST(embedding[g.i] AS DOUBLE) * (sig - y)), 4) AS grad
    FROM x CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) g
    GROUP BY g.i
    ORDER BY dim
    """,
)
def q161_logreg_gradient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full-batch logistic-regression gradient over the embedding
    corpus (binary target = label parity, fixed probe weights
    w = 0.1·e₁ so the step is deterministic): ∇ = Σ x·(σ(w·x) − y) —
    the loop body of distributed linear-model training (and the
    linear-probe quality-classifier fit behind q134's frozen
    weights).

    Scale: σ(w·x) is a map-side scalar per row (w broadcast); the
    gradient is a d-cell mergeable sum that collapses in partial
    aggregation — the parameter-server shape: corpus-size work,
    d-size exchange, exactly like q158's matvec and q135's centroid
    update. Per-dim sums round to 4 (magnitudes O(10²), summation-
    order ulps ~1e-10).
    """
    e = load(spark, sf_dir, "embeddings")
    x = e.select(
        F.transform(F.col("embedding"), lambda c: c.cast("double")).alias("x"),
        (F.col("label") % 2).cast("double").alias("y"),
    ).withColumn(
        "sig",
        1.0 / (1.0 + F.exp(-0.1 * F.element_at(F.col("x"), 1))),
    )
    return (
        x.select(F.posexplode("x"), (F.col("sig") - F.col("y")).alias("r"))
        .groupBy((F.col("pos") + 1).cast("long").alias("dim"))
        .agg(F.round(F.sum(F.col("col") * F.col("r")), 4).alias("grad"))
        .orderBy("dim")
    )


@register(
    "q162_pq_quantization",
    oracle="""
    WITH cb AS (SELECT vec_id AS c, embedding AS ce FROM embeddings WHERE vec_id < 4),
    d AS (
        SELECT e.vec_id, sub.s, cb.c,
               round(sum(pow(CAST(e.embedding[sub.s * 8 + k.k] AS DOUBLE)
                             - CAST(cb.ce[sub.s * 8 + k.k] AS DOUBLE), 2)), 9) AS dist
        FROM embeddings e
        CROSS JOIN cb
        CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS s) sub
        CROSS JOIN (SELECT unnest(generate_series(1, 8)) AS k) k
        GROUP BY e.vec_id, sub.s, cb.c
    ),
    a AS (
        SELECT vec_id, s, c, dist,
               row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, c) AS rn
        FROM d
    )
    SELECT CAST(s AS BIGINT) AS subspace, c AS codeword,
           count(*) AS n_assigned,
           round(avg(dist), 4) AS avg_sq_dist
    FROM a WHERE rn = 1
    GROUP BY s, c
    ORDER BY subspace, codeword
    """,
)
def q162_pq_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization assignment (the IVF-PQ compression stage
    FAISS pairs with q108's coarse quantizer): the 64-dim space
    splits into 8 subspaces of 8 dims; every vector picks, per
    subspace, the nearest of 4 codewords (deterministic codebook:
    vectors 0-3), so a vector compresses to 8 2-bit codes.
    Output is the codebook usage histogram + per-cell distortion.

    Distances round to 9 decimals BEFORE the argmin (codeword-id
    tiebreak), so an assignment can't flip on cross-engine
    summation-order ulps in the 8-term squared distance.

    Scale: the codebook broadcasts (k·d doubles); per row the
    8×4 subvector distances are JVM-side array-lambda arithmetic
    (zip_with over slices — no Python, no shuffle); the histogram is
    a 32-cell mergeable count. Training the codebook is q135's
    k-means loop per subspace; this operator is the (much hotter)
    assignment pass that runs over the full 100 TB corpus.
    """
    e = load(spark, sf_dir, "embeddings")
    cast_d = lambda col: F.transform(col, lambda v: v.cast("double"))  # noqa: E731
    cb = F.broadcast(
        e.filter(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("c"), cast_d(F.col("embedding")).alias("ce")
        )
    )
    subs = F.broadcast(
        spark.range(0, 8).select(F.col("id").cast("int").alias("s"))
    )
    j = e.select("vec_id", cast_d(F.col("embedding")).alias("x")).crossJoin(
        cb
    ).crossJoin(subs)
    sq = F.zip_with(
        F.slice(F.col("x"), F.col("s") * 8 + 1, 8),
        F.slice(F.col("ce"), F.col("s") * 8 + 1, 8),
        lambda a, b: (a - b) * (a - b),
    )
    dist = F.round(
        F.aggregate(sq, F.lit(0.0), lambda acc, t: acc + t), 9
    )
    scored = j.select("vec_id", "s", "c", dist.alias("dist"))
    best = scored.groupBy("vec_id", "s").agg(
        F.min(F.struct("dist", "c")).alias("b")
    )
    return (
        best.select("s", F.col("b.c").alias("codeword"), F.col("b.dist").alias("dist"))
        .groupBy(F.col("s").cast("long").alias("subspace"), "codeword")
        .agg(
            F.count(F.lit(1)).alias("n_assigned"),
            F.round(F.avg("dist"), 4).alias("avg_sq_dist"),
        )
        .orderBy("subspace", "codeword")
    )


@register(
    "q183_mahalanobis_outliers",
    oracle="""
    WITH expl AS (
        SELECT vec_id, g.i AS dim,
               CAST(embedding[g.i] AS DOUBLE) AS x
        FROM embeddings
        CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) g
    ),
    stats AS (
        SELECT dim, avg(x) AS mu, var_samp(x) AS v
        FROM expl GROUP BY dim
    ),
    d2 AS (
        SELECT e.vec_id,
               sum(pow(e.x - s.mu, 2) / s.v) AS dist2
        FROM expl e JOIN stats s ON e.dim = s.dim
        GROUP BY e.vec_id
    )
    SELECT vec_id, round(dist2, 4) AS dist2
    FROM d2
    ORDER BY round(dist2, 4) DESC, vec_id ASC
    LIMIT 20
    """,
)
def q183_mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding outlier detection by diagonal-covariance Mahalanobis
    distance — the distribution-aware screen for corrupted or
    off-manifold vectors before they poison dedup/ANN indexes
    (q54/q61's upstream hygiene): d² = Σⱼ (xⱼ−μⱼ)²/σ²ⱼ, top 20. The
    diagonal approximation is the standard scale choice (a full
    covariance inverse is a d×d broadcast with the same plan shape).

    Scale: pass 1 reduces the corpus to d mergeable (μ, σ²) moments;
    pass 2 re-scans with the d-row stats broadcast onto the exploded
    dims and partial-aggregates d² per vector — both passes are
    combining aggs, no corpus-sized shuffle, same parameter-server
    shape as q161's gradient. Ordering compares the ROUNDED distance
    (then vec_id) so both engines rank ties identically.
    """
    e = load(spark, sf_dir, "embeddings")
    expl = e.select(
        "vec_id", F.posexplode(F.col("embedding"))
    ).select(
        "vec_id",
        (F.col("pos") + 1).alias("dim"),
        F.col("col").cast("double").alias("x"),
    )
    stats = expl.groupBy("dim").agg(
        F.avg("x").alias("mu"), F.var_samp("x").alias("v")
    )
    d2 = (
        expl.join(F.broadcast(stats), "dim")
        .groupBy("vec_id")
        .agg(
            F.round(
                F.sum(F.pow(F.col("x") - F.col("mu"), 2) / F.col("v")), 4
            ).alias("dist2")
        )
    )
    return d2.orderBy(F.desc("dist2"), F.asc("vec_id")).limit(20)


@register(
    "q188_matryoshka_recall",
    oracle="""
    WITH q AS (
        SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        FROM embeddings WHERE vec_id = 0
    ),
    scored AS (
        SELECT e.vec_id,
               round(list_aggregate(list_transform(range(1, 65),
                       i -> CAST(e.embedding[i] AS DOUBLE) * q.qv[i]), 'sum')
                     / (sqrt(list_aggregate(list_transform(e.embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                        * sqrt(list_aggregate(list_transform(q.qv, x -> x * x),
                                              'sum'))), 3) AS cos_full,
               round(list_aggregate(list_transform(range(1, 17),
                       i -> CAST(e.embedding[i] AS DOUBLE) * q.qv[i]), 'sum')
                     / (sqrt(list_aggregate(list_transform(range(1, 17),
                              i -> CAST(e.embedding[i] AS DOUBLE)
                                   * CAST(e.embedding[i] AS DOUBLE)), 'sum'))
                        * sqrt(list_aggregate(list_transform(range(1, 17),
                               i -> q.qv[i] * q.qv[i]), 'sum'))), 3) AS cos_pre
        FROM embeddings e, q
    ),
    topf AS (SELECT vec_id FROM scored ORDER BY cos_full DESC, vec_id LIMIT 10),
    topp AS (SELECT vec_id FROM scored ORDER BY cos_pre DESC, vec_id LIMIT 10)
    SELECT CAST((SELECT count(*) FROM topf JOIN topp USING (vec_id)) AS BIGINT)
               AS n_common,
           round((SELECT count(*) FROM topf JOIN topp USING (vec_id)) / 10.0, 2)
               AS recall_at_10
    """,
)
def q188_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncation retrieval evaluation: top-10 cosine
    neighbors using only the FIRST 16 of 64 embedding dims, scored
    against the full-dim top-10 (recall@10) — the measurement that
    decides whether a pipeline can run its coarse ANN stage on
    truncated prefixes (4x less I/O and compute per comparison) and
    refine the survivors at full width. Both rankings round to 3
    decimals before ordering (vec_id tiebreak) so the two engines
    rank identically.

    Scale: both scores come from ONE scan (two array-lambda dot
    products per row, JVM-side); each top-10 is a TakeOrdered (no
    global sort); the recall join touches 10x10 ids. The prefix
    variant is the cheap path precisely because slice(embedding,1,16)
    reads a quarter of the vector — at 100 TB the full-width column
    never leaves parquet for the coarse stage if stored as a separate
    column family.
    """
    e = load(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir)
    if q is None:
        return spark.createDataFrame(
            [], "n_common bigint, recall_at_10 double"
        )
    qf = F.array([F.lit(float(v)) for v in q])
    qp = F.array([F.lit(float(v)) for v in q[:16]])

    def cos(vec, qarr):
        dot = F.aggregate(
            F.zip_with(vec, qarr, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        nv = F.sqrt(
            F.aggregate(
                vec,
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        )
        nq = F.sqrt(
            F.aggregate(qarr, F.lit(0.0), lambda acc, x: acc + x * x)
        )
        return F.round(dot / (nv * nq), 3)

    scored = e.select(
        "vec_id",
        cos(F.col("embedding"), qf).alias("cos_full"),
        cos(F.slice(F.col("embedding"), 1, 16), qp).alias("cos_pre"),
    )
    topf = scored.orderBy(F.desc("cos_full"), "vec_id").limit(10).select("vec_id")
    topp = scored.orderBy(F.desc("cos_pre"), "vec_id").limit(10).select("vec_id")
    common = topf.join(topp, "vec_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_common")
    )
    return common.select(
        "n_common", F.round(F.col("n_common") / 10.0, 2).alias("recall_at_10")
    )


# Deterministic closed-form factor init for q210: factor f of user u /
# item i is an affine-hash point in [-0.5, 0.5), identical integer
# arithmetic in both engines (no factor table to ship).
_MF_D = 4
_MF_P = "((({u}) * 2654435761 + ({f}) * 40503) % 1009 / 1009.0 - 0.5)"
_MF_Q = "((({i}) * 104729 + ({f}) * 48611) % 1009 / 1009.0 - 0.5)"
_MF_PRED = " + ".join(
    _MF_P.format(u="r.u", f=f) + " * " + _MF_Q.format(i="r.i", f=f)
    for f in range(_MF_D)
)


@register(
    "q210_mf_gradient",
    oracle=f"""
    WITH r AS (
        SELECT o.o_custkey AS u, l.l_partkey AS i,
               CAST(sum(l.l_quantity) AS DOUBLE) AS r
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY 1, 2
    ),
    e AS MATERIALIZED (
        SELECT u, i, r - ({_MF_PRED}) AS err
        FROM r r
    ),
    fs AS (SELECT unnest(range({_MF_D})) AS f),
    gp AS (
        SELECT e.u, fs.f,
               sum(e.err * {_MF_Q.format(i="e.i", f="fs.f")}) AS s
        FROM e CROSS JOIN fs GROUP BY 1, 2
    ),
    gq AS (
        SELECT e.i, fs.f,
               sum(e.err * {_MF_P.format(u="e.u", f="fs.f")}) AS s
        FROM e CROSS JOIN fs GROUP BY 1, 2
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_ratings,
           round((SELECT sum(err * err) / count(*) FROM e), 4) AS mse,
           round(sqrt((SELECT sum(4 * s * s) FROM gp)), 4) AS grad_p_norm,
           round(sqrt((SELECT sum(4 * s * s) FROM gq)), 4) AS grad_q_norm
    """,
)
def q210_mf_gradient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-batch matrix-factorization gradient (d=4 latent factors,
    implicit rating = co-purchase quantity) at fixed deterministic
    factors: err(u,i) = r − p_u·q_i, ∇p[u,f] = −2·Σ_i err·q[i,f],
    ∇q[i,f] = −2·Σ_u err·p[u,f]; reports the MSE and both gradient
    norms — one exact step of the ALS/SGD loop behind q175's
    item-item CF and q202's negative sampling (together they are the
    recommender training stack: sample → score → step).

    The factor matrices are CLOSED-FORM affine hashes of (id, f) —
    the parameter-server broadcast without shipping parameters: both
    engines evaluate p_uf/q_if inline in whole-stage codegen, so the
    only state is the rating relation itself (q134's frozen-weights
    trick, applied to embeddings of BOTH join sides).

    Scale: one groupBy to the rating relation, err map-side, then a
    x4 factor-index fan-out into two partial-agg sums keyed (u,f) /
    (i,f) — corpus-sized work, |users|x4 + |items|x4 exchange, the
    q161/q158 parameter-server shape. Norms/MSE round at 4 (values
    O(1e2-1e4); summation-order ulps orders below — q161's
    justification).
    """
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    r = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(F.col("o_custkey").alias("u"), F.col("l_partkey").alias("i"))
        .agg(F.sum("l_quantity").cast("double").alias("r"))
    )

    def p_uf(u, f):
        return ((u * F.lit(2654435761) + f * F.lit(40503)) % 1009) / 1009.0 - 0.5

    def q_if(i, f):
        return ((i * F.lit(104729) + f * F.lit(48611)) % 1009) / 1009.0 - 0.5

    pred = None
    for f in range(_MF_D):
        term = p_uf(F.col("u"), F.lit(f)) * q_if(F.col("i"), F.lit(f))
        pred = term if pred is None else pred + term
    e = r.select("u", "i", (F.col("r") - pred).alias("err"))
    fs = F.sequence(F.lit(0), F.lit(_MF_D - 1))
    ef = e.select("u", "i", "err", F.explode(fs).alias("f"))
    gp = ef.groupBy("u", "f").agg(
        F.sum(F.col("err") * q_if(F.col("i"), F.col("f"))).alias("s")
    )
    gq = ef.groupBy("i", "f").agg(
        F.sum(F.col("err") * p_uf(F.col("u"), F.col("f"))).alias("s")
    )
    stats = e.agg(
        F.count(F.lit(1)).alias("n_ratings"),
        F.round(F.sum(F.col("err") * F.col("err")) / F.count(F.lit(1)), 4).alias("mse"),
    )
    np_ = gp.agg(F.round(F.sqrt(F.sum(4 * F.col("s") * F.col("s"))), 4).alias("grad_p_norm"))
    nq_ = gq.agg(F.round(F.sqrt(F.sum(4 * F.col("s") * F.col("s"))), 4).alias("grad_q_norm"))
    return stats.crossJoin(F.broadcast(np_)).crossJoin(F.broadcast(nq_))


# Fixed probe direction for q219: literal weights (identical doubles
# in both engines; affine-hash derived, see q210's factor trick)
_DRIFT_W = [
    0.4306243806, 0.3612487611, 0.2918731417, 0.2224975223,
    0.1531219029, 0.0837462834, 0.014370664, -0.0550049554,
]
_DRIFT_PROJ_SQL = " + ".join(
    f"CAST(embedding[{d}] AS DOUBLE) * ({w})" for d, w in enumerate(_DRIFT_W, start=1)
)


@register(
    "q219_embedding_drift_psi",
    oracle=f"""
    WITH p AS MATERIALIZED (
        SELECT vec_id, ({_DRIFT_PROJ_SQL}) AS proj FROM embeddings
    ),
    mm AS (SELECT min(proj) AS mn, max(proj) AS mx FROM p),
    binned AS (
        SELECT CAST(least(9, floor((p.proj - mm.mn) * 10.0 / (mm.mx - mm.mn)))
                    AS BIGINT) AS bin,
               vec_id % 2 = 0 AS is_ref
        FROM p CROSS JOIN mm
    ),
    g AS (
        SELECT b.bin,
               CAST(count(*) FILTER (WHERE is_ref) AS BIGINT) AS n_ref,
               CAST(count(*) FILTER (WHERE NOT is_ref) AS BIGINT) AS n_cur
        FROM (SELECT unnest(range(10)) AS bin) b
        LEFT JOIN binned ON binned.bin = b.bin
        GROUP BY b.bin
    ),
    tot AS (
        SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM g
    ),
    probs AS (
        SELECT g.bin, g.n_ref, g.n_cur,
               (g.n_ref + 0.5) / (tot.tr + 5.0) AS p_ref,
               (g.n_cur + 0.5) / (tot.tc + 5.0) AS p_cur
        FROM g CROSS JOIN tot
    ),
    psi AS (
        SELECT sum((p_cur - p_ref) * ln(p_cur / p_ref)) AS psi FROM probs
    )
    SELECT probs.bin, probs.n_ref, probs.n_cur,
           round(probs.p_ref, 6) AS p_ref,
           round(probs.p_cur, 6) AS p_cur,
           round((probs.p_cur - probs.p_ref) * ln(probs.p_cur / probs.p_ref), 6)
               AS contrib,
           round((SELECT psi FROM psi), 6) AS psi_total
    FROM probs
    ORDER BY probs.bin
    """,
)
def q219_embedding_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift monitor: project every embedding
    onto a fixed probe direction (literal 8-weight linear form — the
    SAME left-associated IEEE expression tree in both engines, so
    bin assignment never rides on summation order), split the corpus
    into reference (even vec_id) and current (odd), and report the
    population-stability index over 10 equal-width bins with Laplace
    smoothing — q109's tabular PSI lifted to embedding space, the
    drift alarm a production embedding pipeline runs per batch
    (SemDeDup/ANN quality silently degrades when the distribution
    moves; this is the cheap detector).

    Scale: projection is map-side scalar math in codegen; min/max is
    one 2-cell agg broadcast back; the histogram is a 10-cell
    combining agg — THE mergeable-sketch shape (identical cells
    union across sources, q203). Bins with zero mass still appear
    (range(10) left join) so the smoothed PSI is always defined.
    """
    e = load(spark, sf_dir, "embeddings")
    proj = None
    for d, w in enumerate(_DRIFT_W, start=1):
        term = F.element_at("embedding", d).cast("double") * F.lit(w)
        proj = term if proj is None else proj + term
    p = e.select("vec_id", proj.alias("proj"))
    mm = p.agg(F.min("proj").alias("mn"), F.max("proj").alias("mx"))
    binned = p.crossJoin(F.broadcast(mm)).select(
        F.least(
            F.lit(9),
            F.floor((F.col("proj") - F.col("mn")) * 10.0 / (F.col("mx") - F.col("mn"))),
        )
        .cast("long")
        .alias("bin"),
        (F.col("vec_id") % 2 == 0).alias("is_ref"),
    )
    counts = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(~F.col("is_ref"), 1).otherwise(0)).alias("n_cur"),
    )
    allbins = spark.range(10).select(F.col("id").alias("bin"))
    g = (
        allbins.join(counts, "bin", "left")
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    tot = g.agg(F.sum("n_ref").alias("tr"), F.sum("n_cur").alias("tc"))
    probs = g.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_ref",
        "n_cur",
        ((F.col("n_ref") + 0.5) / (F.col("tr") + 5.0)).alias("p_ref"),
        ((F.col("n_cur") + 0.5) / (F.col("tc") + 5.0)).alias("p_cur"),
    )
    contrib = (F.col("p_cur") - F.col("p_ref")) * F.log(F.col("p_cur") / F.col("p_ref"))
    psi = probs.agg(F.sum(contrib).alias("psi"))
    return (
        probs.crossJoin(F.broadcast(psi))
        .select(
            "bin",
            "n_ref",
            "n_cur",
            F.round("p_ref", 6).alias("p_ref"),
            F.round("p_cur", 6).alias("p_cur"),
            F.round(contrib, 6).alias("contrib"),
            F.round("psi", 6).alias("psi_total"),
        )
        .orderBy("bin")
    )


@register(
    "q220_cluster_purity_ari",
    oracle="""
    WITH cb AS MATERIALIZED (
        SELECT vec_id AS c, embedding AS ce FROM embeddings WHERE vec_id < 4
    ),
    d AS (
        SELECT e.vec_id, e.label, cb.c,
               round(sum(pow(CAST(e.embedding[k.k] AS DOUBLE)
                             - CAST(cb.ce[k.k] AS DOUBLE), 2)), 9) AS dist
        FROM embeddings e
        CROSS JOIN cb
        CROSS JOIN (SELECT unnest(range(1, 65)) AS k) k
        GROUP BY e.vec_id, e.label, cb.c
    ),
    assign AS MATERIALIZED (
        SELECT vec_id, label, c,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist, c) AS rk
        FROM d
        QUALIFY rk = 1
    ),
    ct AS MATERIALIZED (
        SELECT c, label, CAST(count(*) AS BIGINT) AS n FROM assign GROUP BY 1, 2
    ),
    rowsum AS (SELECT c, sum(n) AS a FROM ct GROUP BY c),
    colsum AS (SELECT label, sum(n) AS b FROM ct GROUP BY label),
    n_tot AS (SELECT sum(n) AS n FROM ct),
    comb AS (
        SELECT (SELECT sum(n * (n - 1) / 2) FROM ct) AS s_idx,
               (SELECT sum(a * (a - 1) / 2) FROM rowsum) AS s_a,
               (SELECT sum(b * (b - 1) / 2) FROM colsum) AS s_b,
               (SELECT n * (n - 1) / 2 FROM n_tot) AS s_n
    )
    SELECT CAST((SELECT n FROM n_tot) AS BIGINT) AS n_points,
           round((SELECT sum(mx) FROM (SELECT c, max(n) AS mx FROM ct GROUP BY c))
                 / CAST((SELECT n FROM n_tot) AS DOUBLE), 6) AS purity,
           round((s_idx - s_a * s_b / s_n)
                 / ((s_a + s_b) / 2.0 - s_a * s_b / s_n), 6) AS ari
    FROM comb
    """,
)
def q220_cluster_purity_ari(spark: SparkSession, sf_dir: str) -> DataFrame:
    """External clustering validation: assign every embedding to its
    nearest of 4 fixed centroids (vec_id<4, q135/q162's deterministic
    codebook; distances rounded at 9 BEFORE the argmin, q162's
    cross-engine tie-break contract) and score the clustering against
    the true labels with purity and the Adjusted Rand Index — the
    eval that tells a SemDeDup/curriculum pipeline whether its
    cluster structure actually tracks the taxonomy. ARI is pure
    integer pair-counting (all C(n,2) sums exact in BIGINT) until the
    final division.

    Scale: assignment is the broadcast-codebook distance scan (q97's
    shape: |corpus| x k distances, one row each after the windowless
    min — here a 4-row window per vec, WindowGroupLimit-pruned); the
    contingency is a k x |labels| combining agg; everything after is
    arithmetic on <=40 cells.
    """
    e = load(spark, sf_dir, "embeddings")
    cb = e.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("c"), F.col("embedding").alias("ce")
    )
    dist = F.round(
        F.aggregate(
            F.zip_with(
                "embedding",
                "ce",
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        9,
    )
    d = e.crossJoin(F.broadcast(cb)).select(
        "vec_id", "label", "c", dist.alias("dist")
    )
    wk = Window.partitionBy("vec_id").orderBy("dist", "c")
    assign = d.withColumn("rk", F.row_number().over(wk)).where(F.col("rk") == 1)
    ct = assign.groupBy("c", "label").agg(F.count(F.lit(1)).alias("n"))
    rowsum = ct.groupBy("c").agg(F.sum("n").alias("a"))
    colsum = ct.groupBy("label").agg(F.sum("n").alias("b"))
    s_idx = ct.agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("s_idx"))
    s_a = rowsum.agg(F.sum(F.col("a") * (F.col("a") - 1) / 2).alias("s_a"))
    s_b = colsum.agg(F.sum(F.col("b") * (F.col("b") - 1) / 2).alias("s_b"))
    n_tot = ct.agg(F.sum("n").alias("n"))
    pur = (
        ct.groupBy("c")
        .agg(F.max("n").alias("mx"))
        .agg(F.sum("mx").alias("pure_n"))
    )
    return (
        n_tot.crossJoin(F.broadcast(pur))
        .crossJoin(F.broadcast(s_idx))
        .crossJoin(F.broadcast(s_a))
        .crossJoin(F.broadcast(s_b))
        .select(
            F.col("n").cast("long").alias("n_points"),
            F.round(F.col("pure_n") / F.col("n").cast("double"), 6).alias("purity"),
            F.round(
                (F.col("s_idx") - F.col("s_a") * F.col("s_b") / (F.col("n") * (F.col("n") - 1) / 2))
                / (
                    (F.col("s_a") + F.col("s_b")) / 2.0
                    - F.col("s_a") * F.col("s_b") / (F.col("n") * (F.col("n") - 1) / 2)
                ),
                6,
            ).alias("ari"),
        )
    )


@register(
    "q241_preference_pairs",
    oracle="""
    WITH cb AS MATERIALIZED (
        SELECT vec_id AS c, embedding AS ce FROM embeddings WHERE vec_id < 4
    ),
    d AS (
        SELECT e.vec_id, cb.c,
               round(sum(pow(CAST(e.embedding[k.k] AS DOUBLE)
                             - CAST(cb.ce[k.k] AS DOUBLE), 2)), 9) AS dist
        FROM embeddings e
        CROSS JOIN cb
        CROSS JOIN (SELECT unnest(range(1, 65)) AS k) k
        GROUP BY e.vec_id, cb.c
    ),
    assign AS MATERIALIZED (
        SELECT vec_id, c,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist, c) AS rk
        FROM d
        QUALIFY rk = 1
    ),
    scored AS MATERIALIZED (
        SELECT doc_id,
               round(
                   list_aggregate(
                       list_transform(string_split_regex(lower(trim(text)), '\\s+'),
                           t -> CAST(CAST('0x' || substr(md5(t), 1, 8) AS UBIGINT)
                                     AS BIGINT) / 4294967296.0 - 0.5),
                       'sum')
                   / greatest(len(string_split_regex(lower(trim(text)), '\\s+')), 1),
                   6) AS score
        FROM documents
    ),
    members AS MATERIALIZED (
        SELECT a.c, s.doc_id, s.score
        FROM assign a JOIN scored s ON s.doc_id = a.vec_id
    ),
    ranked AS (
        SELECT c, doc_id, score,
               row_number() OVER (PARTITION BY c ORDER BY score DESC, doc_id)
                   AS rk_top,
               row_number() OVER (PARTITION BY c ORDER BY score ASC, doc_id)
                   AS rk_bot,
               count(*) OVER (PARTITION BY c) AS n
        FROM members
    )
    SELECT t.c AS cluster, CAST(t.n AS BIGINT) AS n_docs,
           t.doc_id AS chosen_doc, t.score AS chosen_score,
           b.doc_id AS rejected_doc, b.score AS rejected_score,
           round(t.score - b.score, 6) AS score_gap
    FROM ranked t JOIN ranked b ON t.c = b.c AND t.rk_top = 1 AND b.rk_bot = 1
    WHERE t.n >= 2
    ORDER BY t.c
    """,
)
def q241_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair construction (DPO/RLHF data prep): cluster
    document embeddings to the 4 fixed centroids (q220's
    assignment), score each document with the q134 hashed quality
    model, and emit per cluster the (chosen = best, rejected =
    worst) pair with the score gap — the standard recipe for
    building contrastive preference data from an unlabeled corpus
    (cluster = "same prompt neighborhood", quality model = the
    preference proxy). Scores and distances are rounded BEFORE the
    ranks with doc_id tie-breaks, the house determinism contract.

    Scale: assignment is the broadcast-codebook scan; scoring is
    q134's scan-speed projection; pair selection is two
    WindowGroupLimit-pruned per-cluster ranks over the |docs with
    embeddings| relation. One rollup exchange, no corpus pair join
    anywhere — this is why preference mining scales where naive
    all-pairs contrast does not.
    """
    e = load(spark, sf_dir, "embeddings")
    cb = e.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("c"), F.col("embedding").alias("ce")
    )
    dist = F.round(
        F.aggregate(
            F.zip_with(
                "embedding",
                "ce",
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        9,
    )
    dd = e.crossJoin(F.broadcast(cb)).select("vec_id", "c", dist.alias("dist"))
    wk = Window.partitionBy("vec_id").orderBy("dist", "c")
    assign = dd.withColumn("rk", F.row_number().over(wk)).where(F.col("rk") == 1)
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim("text")), r"\s+")
    weight = lambda t: (  # noqa: E731
        F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
        / F.lit(4294967296.0)
        - F.lit(0.5)
    )
    score = F.round(
        F.aggregate(F.transform(toks, weight), F.lit(0.0), lambda acc, x: acc + x)
        / F.greatest(F.size(toks), F.lit(1)),
        6,
    )
    scored = docs.select("doc_id", score.alias("score"))
    members = assign.join(scored, assign["vec_id"] == scored["doc_id"]).select(
        "c", "doc_id", "score"
    )
    wt = Window.partitionBy("c").orderBy(F.desc("score"), "doc_id")
    wb = Window.partitionBy("c").orderBy(F.asc("score"), "doc_id")
    wn = Window.partitionBy("c")
    ranked = (
        members.withColumn("rk_top", F.row_number().over(wt))
        .withColumn("rk_bot", F.row_number().over(wb))
        .withColumn("n", F.count(F.lit(1)).over(wn))
    )
    t = ranked.where((F.col("rk_top") == 1) & (F.col("n") >= 2)).select(
        F.col("c").alias("cluster"),
        F.col("n").cast("long").alias("n_docs"),
        F.col("doc_id").alias("chosen_doc"),
        F.col("score").alias("chosen_score"),
    )
    b = ranked.where(F.col("rk_bot") == 1).select(
        F.col("c").alias("cluster"),
        F.col("doc_id").alias("rejected_doc"),
        F.col("score").alias("rejected_score"),
    )
    return (
        t.join(b, "cluster")
        .select(
            "cluster",
            "n_docs",
            "chosen_doc",
            "chosen_score",
            "rejected_doc",
            "rejected_score",
            F.round(F.col("chosen_score") - F.col("rejected_score"), 6).alias(
                "score_gap"
            ),
        )
        .orderBy("cluster")
    )


@register(
    "q269_embedding_quality_audit",
    oracle="""
    WITH base AS (
        SELECT label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
        FROM embeddings
    ),
    per AS (
        SELECT label,
               len(ve) AS dim,
               sqrt(list_sum(list_transform(ve, x -> x * x))) AS nrm,
               len(list_filter(ve, x -> isnan(x) OR NOT isfinite(x))) AS n_bad
        FROM base
    )
    SELECT CAST(label AS BIGINT) AS label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(CASE WHEN dim != 64 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dim_mismatch,
           CAST(sum(CASE WHEN n_bad > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nonfinite,
           CAST(sum(CASE WHEN nrm = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero_norm,
           round(avg(nrm), 4) AS mean_norm,
           round(min(nrm), 4) AS min_norm,
           round(max(nrm), 4) AS max_norm
    FROM per GROUP BY label ORDER BY label
    """,
)
def q269_embedding_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector data-quality audit per label — the embedding-column
    complement of q247's tabular DQ suite, and the gate an ANN /
    SemDeDup pipeline (q61/q97/q108) must pass before indexing:
    dimension consistency, non-finite components (NaN/Inf poison
    every distance downstream), zero-norm vectors (undefined cosine
    — the q54 family divides by this), and the norm distribution
    whose drift is the embedding-model-regression canary (q219's PSI
    tracks a projection; this tracks the raw geometry).

    Scale: pure map-side JVM array arithmetic (higher-order
    transform/sum inside one projection — floats cast to double
    BEFORE squaring in both engines so the sums are bit-identical),
    then one combining agg on the bounded label grid.
    """
    em = load(spark, sf_dir, "embeddings")
    ve = F.transform("embedding", lambda x: x.cast("double"))
    per = em.select(
        F.col("label").cast("long").alias("label"),
        F.size("embedding").alias("dim"),
        F.sqrt(
            F.aggregate(ve, F.lit(0.0), lambda acc, x: acc + x * x)
        ).alias("nrm"),
        F.size(
            F.filter(ve, lambda x: F.isnan(x) | x.isin(float("inf"), float("-inf")))
        ).alias("n_bad"),
    )
    return (
        per.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(F.when(F.col("dim") != 64, 1).otherwise(0)).alias("n_dim_mismatch"),
            F.sum(F.when(F.col("n_bad") > 0, 1).otherwise(0)).alias("n_nonfinite"),
            F.sum(F.when(F.col("nrm") == 0.0, 1).otherwise(0)).alias("n_zero_norm"),
            F.round(F.avg("nrm"), 4).alias("mean_norm"),
            F.round(F.min("nrm"), 4).alias("min_norm"),
            F.round(F.max("nrm"), 4).alias("max_norm"),
        )
        .orderBy("label")
    )


def _q305_oracle() -> str:
    """q305 oracle: q54's planted corpus, SRP-bucketed (literal
    hyperplanes), per-vector top-1 neighbor WITHIN bucket, mutual
    pairs kept."""
    bucket = _srp_bucket_sql(8, 64, col="ve")
    cos = (
        "list_aggregate(list_transform(range(1, 65), i -> a.ve[i] * b.ve[i]),"
        " 'sum') / (a.nrm * b.nrm)"
    )
    return f"""
    WITH base AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
        FROM embeddings
    ),
    corpus AS (
        SELECT vec_id, ve FROM base
        UNION ALL
        SELECT vec_id + 100000,
               list_transform(range(1, 65),
                              i -> CASE WHEN i <= 4 THEN ve[i] * 1.5 ELSE ve[i] END)
        FROM base
    ),
    n AS (
        SELECT vec_id, ve,
               sqrt(list_aggregate(list_transform(ve, x -> x * x), 'sum')) AS nrm,
               {bucket} AS bucket
        FROM corpus
    ),
    cand AS (
        SELECT a.vec_id AS src, b.vec_id AS dst, {cos} AS cosine,
               row_number() OVER (PARTITION BY a.vec_id
                                  ORDER BY {cos} DESC, b.vec_id ASC) AS rn
        FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    ),
    nn AS (SELECT src, dst, cosine FROM cand WHERE rn = 1)
    SELECT x.src AS id_a, x.dst AS id_b, round(x.cosine, 4) AS cosine
    FROM nn x JOIN nn y ON x.dst = y.src AND y.dst = x.src AND x.src < y.src
    ORDER BY id_a, id_b
    """


@register("q305_mutual_nearest_neighbors", oracle=_q305_oracle())
def q305_mutual_nearest_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-nearest-neighbor (MNN) pairs over the planted embedding
    corpus — the alignment primitive behind cross-lingual embedding
    matching and batch-effect correction (two points are aligned only
    if each is the OTHER's top-1 neighbor; one-directional top-k, the
    q61 shape, keeps hub vectors that match everything): SRP-bucket
    the q54 corpus, take each vector's best same-bucket neighbor
    (cosine desc, id asc tiebreak — the argmax window is PARTITIONED
    by source vector), keep symmetric pairs. The planted twins are
    mutual by construction, so recall is measured against q54's
    baseline in tests; hub-induced one-way matches drop out.

    Scale: candidates are the bucket equi-join (Σ bucket², the q295
    path, never corpus²); the top-1 is a bucket-partitioned window;
    mutuality is a self equi-join on the |corpus|-row nn relation —
    three shuffles, all key-bounded. Multi-probe (several plane
    seeds) raises recall at constant asymptotics.
    """
    from g_etl_spark.queries.dedup import _perturbed_embedding_corpus

    corpus = _perturbed_embedding_corpus(spark, sf_dir)
    planes = S.random_hyperplanes(8, 64)
    n = corpus.select(
        "vec_id",
        F.col("embedding").alias("ve"),
        F.sqrt(
            F.aggregate(
                F.transform(F.col("embedding"), lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("nrm"),
        S.srp_bucket(F.col("embedding"), planes).alias("bucket"),
    ).localCheckpoint(eager=True)
    a = n.select(
        F.col("vec_id").alias("src"),
        F.col("ve").alias("va"),
        F.col("nrm").alias("na"),
        "bucket",
    )
    b = n.select(
        F.col("vec_id").alias("dst"),
        F.col("ve").alias("vb"),
        F.col("nrm").alias("nb"),
        F.col("bucket").alias("bucket_b"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cand = a.join(
        b, (F.col("bucket") == F.col("bucket_b")) & (F.col("src") != F.col("dst"))
    ).select("src", "dst", (dot / (F.col("na") * F.col("nb"))).alias("cosine"))
    w = Window.partitionBy("src").orderBy(F.desc("cosine"), F.asc("dst"))
    nn = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("src", "dst", "cosine")
    )
    y = nn.select(
        F.col("src").alias("ysrc"), F.col("dst").alias("ydst")
    )
    return (
        nn.join(
            y,
            (F.col("dst") == F.col("ysrc"))
            & (F.col("ydst") == F.col("src"))
            & (F.col("src") < F.col("ysrc")),
        )
        .select(
            F.col("src").alias("id_a"),
            F.col("dst").alias("id_b"),
            F.round("cosine", 4).alias("cosine"),
        )
        .orderBy("id_a", "id_b")
    )


@register(
    "q343_semantic_source_distance",
    oracle="""
    WITH joined AS (
        SELECT d.source,
               list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
    ),
    dims AS (
        SELECT source, i AS dim, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(v[i] * 1000000) AS BIGINT)) AS BIGINT)
                   AS s_micro
        FROM joined, unnest(range(1, 65)) AS t(i)
        GROUP BY source, i
    ),
    cent AS (
        SELECT source, dim,
               CAST(s_micro AS DOUBLE) / n / 1000000 AS c
        FROM dims
    ),
    pairs AS (
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(sum(CAST(round(a.c * b.c * 1e12) AS BIGINT)) AS DOUBLE)
                   / 1e12 AS dot,
               sqrt(CAST(sum(CAST(round(a.c * a.c * 1e12) AS BIGINT)) AS DOUBLE)
                    / 1e12) AS na,
               sqrt(CAST(sum(CAST(round(b.c * b.c * 1e12) AS BIGINT)) AS DOUBLE)
                    / 1e12) AS nb
        FROM cent a JOIN cent b
          ON a.dim = b.dim AND a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT source_a, source_b,
           round(dot / (na * nb), 6) AS centroid_cosine,
           round(1.0 - dot / (na * nb), 6) AS cosine_distance
    FROM pairs
    ORDER BY source_a, source_b
    """,
)
def q343_semantic_source_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise SEMANTIC source distance — the embedding-space
    sibling of q327's lexical Jensen-Shannon matrix: per source, the
    centroid of its documents' embeddings (the SemDeDup/q97 cluster
    view lifted to source grain), then pairwise centroid cosine. A
    source pair that is lexically far (q327) but semantically close
    is paraphrase/translation overlap — exactly what cross-lingual
    dedup (q305's MNN alignment) should be pointed at; both matrices
    together are the corpus-similarity dashboard.

    Engine-exactness: per-dimension coordinate sums are quantized to
    integer micro-units BEFORE the per-source mean (the q300
    discipline applied per dimension), so the centroids — and hence
    every cosine — are identical integers-derived doubles in both
    engines; the pairwise dot/norm terms are themselves quantized to
    integer pico-units before the 64-term sums, so no
    engine-order-dependent double sum exists anywhere. The pairwise
    stage computes on the |sources| × 64 centroid relation only.

    Scale: one doc→source equi-join (UNHINTED — the map is
    corpus-grain, one row per document, so a forced broadcast would
    OOM the driver at 100 TB; AQE broadcasts it at runtime when it
    actually fits — r9 verdict item #2), one combining agg to
    |sources|·64 cells (the dimension explode is map-side), and a
    pairwise join on the TINY centroid relation — |sources|², never
    corpus². The same shape serves any per-group embedding centroid
    (topic, language, time-bucket).
    """
    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    d = load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), "source"
    )
    joined = e.join(d, "vec_id").select(
        "source",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    dims = (
        joined.select(
            "source",
            F.posexplode(F.col("v")).alias("dim0", "x"),
        )
        .select(
            "source",
            (F.col("dim0") + 1).alias("dim"),
            F.round(F.col("x") * 1e6, 0).cast("long").alias("x_micro"),
        )
        .groupBy("source", "dim")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x_micro").cast("long").alias("s_micro"),
        )
    )
    cent = dims.select(
        "source",
        "dim",
        (F.col("s_micro").cast("double") / F.col("n") / 1e6).alias("c"),
    )
    a = cent.select(
        F.col("source").alias("source_a"), "dim", F.col("c").alias("ca")
    )
    b = cent.select(
        F.col("source").alias("source_b"),
        F.col("dim").alias("dim_b"),
        F.col("c").alias("cb"),
    )
    pairs = (
        a.join(
            b,
            (F.col("dim") == F.col("dim_b"))
            & (F.col("source_a") < F.col("source_b")),
        )
        .groupBy("source_a", "source_b")
        .agg(
            (
                F.sum(F.round(F.col("ca") * F.col("cb") * 1e12, 0).cast("long"))
                .cast("double")
                / 1e12
            ).alias("dot"),
            F.sqrt(
                F.sum(F.round(F.col("ca") * F.col("ca") * 1e12, 0).cast("long"))
                .cast("double")
                / 1e12
            ).alias("na"),
            F.sqrt(
                F.sum(F.round(F.col("cb") * F.col("cb") * 1e12, 0).cast("long"))
                .cast("double")
                / 1e12
            ).alias("nb"),
        )
    )
    cos = F.col("dot") / (F.col("na") * F.col("nb"))
    return pairs.select(
        "source_a",
        "source_b",
        F.round(cos, 6).alias("centroid_cosine"),
        F.round(1.0 - cos, 6).alias("cosine_distance"),
    ).orderBy("source_a", "source_b")


def _q345_oracle() -> str:
    """q345 oracle: SRP buckets from the same md5-derived hyperplane
    literals as the operator; multiprobe candidacy expressed as a
    Hamming-distance filter (bit_count of the XOR against the query
    bucket) — semantically identical to the operator's explicit
    bucket-id IN-set, which is the partition-prunable form."""
    from math import comb

    probed = {b: sum(comb(6, d) for d in range(b + 1)) for b in (0, 1, 2)}
    probed_case = " ".join(
        f"WHEN {b} THEN {n}" for b, n in probed.items()
    )
    return f"""
    WITH bucketed AS (
        SELECT vec_id, embedding,
               {_srp_bucket_sql(6, 64)} AS bucket
        FROM embeddings
    ),
    q AS (
        SELECT bucket AS qbucket,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        FROM bucketed WHERE vec_id = 0
    ),
    scored AS (
        SELECT b.vec_id, b.bucket,
               round(list_aggregate(list_transform(range(1, 65),
                                                   i -> CAST(b.embedding[i] AS DOUBLE) * q.qv[i]),
                                    'sum')
                     / (sqrt(list_aggregate(list_transform(b.embedding,
                                                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                                            'sum'))
                        * sqrt(list_aggregate(list_transform(q.qv, x -> x * x), 'sum'))),
                     3) AS cosine
        FROM bucketed b, q
    ),
    brute AS (
        SELECT vec_id FROM scored ORDER BY cosine DESC, vec_id LIMIT 10
    ),
    levels AS (SELECT unnest([0, 1, 2]) AS n_probe_bits),
    cand AS (
        SELECT l.n_probe_bits, s.vec_id, s.cosine
        FROM levels l, scored s, q
        WHERE bit_count(xor(s.bucket, q.qbucket)) <= l.n_probe_bits
    ),
    counts AS (
        SELECT n_probe_bits, count(*) AS n_candidates
        FROM cand GROUP BY n_probe_bits
    ),
    topk AS (
        SELECT n_probe_bits, vec_id
        FROM (SELECT n_probe_bits, vec_id,
                     row_number() OVER (PARTITION BY n_probe_bits
                                        ORDER BY cosine DESC, vec_id) AS rn
              FROM cand)
        WHERE rn <= 10
    ),
    hits AS (
        SELECT t.n_probe_bits, count(*) AS n_hits
        FROM topk t JOIN brute b USING (vec_id)
        GROUP BY t.n_probe_bits
    )
    -- LEFT JOINs from the level skeleton: a probe level with ZERO
    -- candidates/hits must still emit its row (n = 0), matching the
    -- Spark side's always-3-rows count aggregates
    SELECT CAST(l.n_probe_bits AS BIGINT) AS n_probe_bits,
           CAST(CASE l.n_probe_bits {probed_case} END AS BIGINT)
               AS n_buckets_probed,
           CAST(coalesce(c.n_candidates, 0) AS BIGINT) AS n_candidates,
           CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
           round(coalesce(h.n_hits, 0) / 10.0, 2) AS recall_at_10
    FROM levels l
    LEFT JOIN counts c USING (n_probe_bits)
    LEFT JOIN hits h USING (n_probe_bits)
    ORDER BY n_probe_bits
    """


@register("q345_ann_multiprobe_recall", oracle=_q345_oracle())
def q345_ann_multiprobe_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH recall curve for the SRP ANN serving path
    (Lv et al., multi-probe LSH): at each probe radius b ∈ {0, 1, 2},
    probe the query's bucket plus every bucket within Hamming
    distance b (operators/similarity.srp_probe_buckets /
    ann_topk_srp(n_probe_bits=b)) and report candidate count and
    recall@10 against the exact brute-force top-10 — the measured
    recall-vs-cost tradeoff of the serving path's one knob (the
    query-side twin of the index-side n_seeds knob q339 gates). The
    single-bucket probe (b = 0) is q61's plan; the curve shows what
    each extra Hamming ring buys.

    Scale: the probe set is an IN-set of Σ_{d≤b} C(n_planes, d)
    bucket ids over the bucket-partitioned layout — a partition-
    pruned scan of ~(probed/2^planes)·n vectors per radius, never a
    corpus scan (the brute-force baseline here IS the documented
    full-scan comparison, as in q54/q60). Top-k is TakeOrdered; the
    recall join is 10×10 rows.
    """
    e = load(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir)
    if q is None:
        return _empty(
            spark,
            "n_probe_bits bigint, n_buckets_probed bigint, "
            "n_candidates bigint, n_hits bigint, recall_at_10 double",
        )
    planes = S.random_hyperplanes(6, 64)
    bucketed = S.srp_buckets(e, 6, 64)
    brute = S.cosine_topk(e, q, k=10).select("vec_id")
    outs = []
    for b in (0, 1, 2):
        probes = S.srp_probe_buckets(q, planes, n_probe_bits=b)
        cand = bucketed.filter(F.col("bucket").isin(probes))
        approx = S.cosine_topk(cand, q, k=10).select("vec_id")
        n_cand = cand.agg(
            F.count(F.lit(1)).cast("long").alias("n_candidates")
        )
        hits = approx.join(brute, "vec_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_hits")
        )
        outs.append(
            n_cand.crossJoin(F.broadcast(hits)).select(
                F.lit(b).cast("long").alias("n_probe_bits"),
                F.lit(len(probes)).cast("long").alias("n_buckets_probed"),
                "n_candidates",
                "n_hits",
                F.round(F.col("n_hits") / 10.0, 2).alias("recall_at_10"),
            )
        )
    out = outs[0]
    for nxt in outs[1:]:
        out = out.unionAll(nxt)
    return out.orderBy("n_probe_bits")


_MMR_COS = """round(list_aggregate(list_transform(range(1, 65),
                   i -> CAST({a}.embedding[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)),
                   'sum')
         / (sqrt(list_aggregate(list_transform({a}.embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
            * sqrt(list_aggregate(list_transform({b},
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))), 3)"""


def _q350_oracle(k_sel: int = 5) -> str:
    """q350 oracle: the same greedy MMR selection unrolled into one
    chained CTE pair (candidate rescore + argmax) per step. Scores
    are exact integers (milli-unit relevance/similarity, score10 =
    7·rel − 3·maxsim) so every argmax is engine-identical."""
    qcos = _MMR_COS.format(a="e", b="q.qv")
    pcos = _MMR_COS.format(a="a", b="b.embedding")
    steps = []
    for s in range(2, k_sel + 1):
        sel = " UNION ALL ".join(
            f"SELECT vec_id FROM s{j}" for j in range(1, s)
        )
        steps.append(f"""
    r{s} AS (
        SELECT c.vec_id, c.rel_m, max(p.sim_m) AS maxsim_m
        FROM cand c
        JOIN pairs p ON p.ia = c.vec_id
        JOIN ({sel}) sel ON p.ib = sel.vec_id
        WHERE c.vec_id NOT IN ({sel})
        GROUP BY c.vec_id, c.rel_m
    ),
    s{s} AS (
        SELECT vec_id, rel_m, maxsim_m,
               7 * rel_m - 3 * maxsim_m AS score10
        FROM r{s} ORDER BY score10 DESC, vec_id LIMIT 1
    )""")
    finals = " UNION ALL ".join(
        f"SELECT {j} AS rank, vec_id, rel_m, maxsim_m, score10 FROM s{j}"
        for j in range(1, k_sel + 1)
    )
    return f"""
    WITH q AS (
        SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        FROM embeddings WHERE vec_id = 0
    ),
    cand AS (
        SELECT e.vec_id, e.embedding,
               CAST(round({qcos} * 1000) AS BIGINT) AS rel_m
        FROM embeddings e, q
        ORDER BY rel_m DESC, vec_id
        LIMIT 20
    ),
    pairs AS (
        SELECT a.vec_id AS ia, b.vec_id AS ib,
               CAST(round({pcos} * 1000) AS BIGINT) AS sim_m
        FROM cand a JOIN cand b ON a.vec_id != b.vec_id
    ),
    s1 AS (
        SELECT vec_id, rel_m, CAST(0 AS BIGINT) AS maxsim_m,
               7 * rel_m AS score10
        FROM cand ORDER BY rel_m DESC, vec_id LIMIT 1
    ),{",".join(steps)}
    SELECT CAST(rank AS BIGINT) AS rank, vec_id,
           round(rel_m / 1000.0, 3) AS relevance,
           round(maxsim_m / 1000.0, 3) AS max_sim_prior,
           CAST(score10 AS BIGINT) AS mmr_score10
    FROM ({finals}) ORDER BY rank
    """


@register("q350_mmr_rerank", oracle=_q350_oracle())
def q350_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-Marginal-Relevance re-ranking of the retrieval top-20
    (Carbonell & Goldstein): greedily pick 5 results maximizing
    λ·relevance − (1−λ)·max-similarity-to-already-picked (λ = 0.7) —
    the diversification step a RAG pipeline runs between ANN
    retrieval (q60/q345) and context assembly, so near-duplicate
    passages don't crowd out coverage. Relevance and pairwise
    similarity are milli-quantized integers and the greedy score is
    the exact integer 7·rel − 3·maxsim, so all five argmax picks are
    engine-identical (vec_id tiebreak).

    Scale: ONE brute/ANN pass bounds the working set to k=20 rows;
    the 20×19 pairwise matrix and the 5 greedy steps are arithmetic
    on that bounded relation (q243 contract) — selection cost is
    independent of corpus size. The candidate fetch is the only
    corpus-touching stage and is exactly the q345 serving path.
    """
    e = load(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir)
    if q is None:
        return _empty(
            spark,
            "rank bigint, vec_id bigint, relevance double, "
            "max_sim_prior double, mmr_score10 bigint",
        )
    top = S.cosine_topk(e, q, k=20)
    cand = (
        top.join(e, "vec_id")
        .select(
            "vec_id",
            F.round(F.col("cosine") * 1000, 0).cast("long").alias("rel_m"),
            F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
        )
        .localCheckpoint()
    )
    dot = F.aggregate(
        F.zip_with(F.col("v_a"), F.col("v_b"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda s, x: s + x)
    )
    a = cand.select(F.col("vec_id").alias("ia"), F.col("v").alias("v_a"))
    b = cand.select(F.col("vec_id").alias("ib"), F.col("v").alias("v_b"))
    # 20×19 bounded pair matrix (LIMIT-capped — broadcast-safe)
    pairs = (
        a.join(F.broadcast(b), F.col("ia") != F.col("ib"))
        .select(
            "ia",
            "ib",
            F.round(F.round(dot / (nrm(F.col("v_a")) * nrm(F.col("v_b"))), 3) * 1000, 0)
            .cast("long")
            .alias("sim_m"),
        )
        .localCheckpoint()
    )
    base = cand.select("vec_id", "rel_m")
    s1 = (
        base.orderBy(F.desc("rel_m"), F.asc("vec_id"))
        .limit(1)
        .select(
            F.lit(1).cast("long").alias("rank"),
            "vec_id",
            "rel_m",
            F.lit(0).cast("long").alias("maxsim_m"),
            (7 * F.col("rel_m")).cast("long").alias("score10"),
        )
    )
    selected = [s1]
    for step in range(2, 6):
        sel_ids = selected[0].select("vec_id")
        for s_ in selected[1:]:
            sel_ids = sel_ids.unionAll(s_.select("vec_id"))
        sel_ids = sel_ids.localCheckpoint()
        remaining = base.join(sel_ids, "vec_id", "left_anti")
        rescored = (
            remaining.join(pairs, remaining["vec_id"] == pairs["ia"])
            .join(
                sel_ids.withColumnRenamed("vec_id", "sel_id"),
                F.col("ib") == F.col("sel_id"),
            )
            .groupBy("vec_id", "rel_m")
            .agg(F.max("sim_m").alias("maxsim_m"))
            .select(
                "vec_id",
                "rel_m",
                "maxsim_m",
                (7 * F.col("rel_m") - 3 * F.col("maxsim_m"))
                .cast("long")
                .alias("score10"),
            )
        )
        pick = (
            rescored.orderBy(F.desc("score10"), F.asc("vec_id"))
            .limit(1)
            .select(
                F.lit(step).cast("long").alias("rank"),
                "vec_id",
                "rel_m",
                "maxsim_m",
                "score10",
            )
        )
        selected.append(pick.localCheckpoint())
    out = selected[0]
    for s_ in selected[1:]:
        out = out.unionAll(s_)
    return out.select(
        "rank",
        "vec_id",
        F.round(F.col("rel_m") / 1000.0, 3).alias("relevance"),
        F.round(F.col("maxsim_m") / 1000.0, 3).alias("max_sim_prior"),
        F.col("score10").alias("mmr_score10"),
    ).orderBy("rank")


def _q351_oracle() -> str:
    """q351 oracle: q345's multiprobe skeleton with DCG on top —
    graded relevance = clamped milli-cosine, each rel/log2(rank+1)
    term micro-quantized to bigint before the 10-term sum, so DCG,
    IDCG and their ratio derive from identical integers."""
    return f"""
    WITH bucketed AS (
        SELECT vec_id, embedding,
               {_srp_bucket_sql(6, 64)} AS bucket
        FROM embeddings
    ),
    q AS (
        SELECT bucket AS qbucket,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        FROM bucketed WHERE vec_id = 0
    ),
    scored AS (
        SELECT b.vec_id, b.bucket,
               CAST(round(list_aggregate(list_transform(range(1, 65),
                          i -> CAST(b.embedding[i] AS DOUBLE) * q.qv[i]), 'sum')
                     / (sqrt(list_aggregate(list_transform(b.embedding,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                        * sqrt(list_aggregate(list_transform(q.qv, x -> x * x),
                                              'sum'))) * 1000)
                    AS BIGINT) AS rel_m
        FROM bucketed b, q
    ),
    ideal AS (
        SELECT rel_m,
               row_number() OVER (ORDER BY rel_m DESC, vec_id) AS rn
        FROM scored QUALIFY rn <= 10
    ),
    idcg AS (
        SELECT CAST(sum(CAST(round(greatest(rel_m, 0) * 1e6
                                   / log2(rn + 1)) AS BIGINT)) AS BIGINT)
                   AS idcg_micro
        FROM ideal
    ),
    levels AS (SELECT unnest([0, 1, 2]) AS n_probe_bits),
    approx AS (
        SELECT l.n_probe_bits, s.vec_id, s.rel_m,
               row_number() OVER (PARTITION BY l.n_probe_bits
                                  ORDER BY s.rel_m DESC, s.vec_id) AS rn
        FROM levels l, scored s, q
        WHERE bit_count(xor(s.bucket, q.qbucket)) <= l.n_probe_bits
        QUALIFY rn <= 10
    ),
    dcg AS (
        SELECT n_probe_bits,
               CAST(sum(CAST(round(greatest(rel_m, 0) * 1e6
                                   / log2(rn + 1)) AS BIGINT)) AS BIGINT)
                   AS dcg_micro
        FROM approx GROUP BY n_probe_bits
    )
    -- LEFT JOIN from the level skeleton: a zero-candidate probe
    -- level still emits its row with dcg_micro = 0 (the Spark side
    -- coalesces its empty-relation sum to 0 identically)
    SELECT CAST(l.n_probe_bits AS BIGINT) AS n_probe_bits,
           CAST(coalesce(d.dcg_micro, 0) AS BIGINT) AS dcg_micro,
           i.idcg_micro,
           round(coalesce(d.dcg_micro, 0) / CAST(i.idcg_micro AS DOUBLE), 4)
               AS ndcg_at_10
    FROM levels l
    LEFT JOIN dcg d USING (n_probe_bits)
    CROSS JOIN idcg i
    ORDER BY n_probe_bits
    """


@register("q351_ann_multiprobe_ndcg", oracle=_q351_oracle())
def q351_ann_multiprobe_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 of the multiprobe ANN serving path — the GRADED
    ranking metric beside q345's set-overlap recall: recall treats
    every true top-10 item equally, nDCG weights getting the MOST
    similar items near the top (rel = clamped milli-cosine,
    discounted 1/log2(rank+1)), which is what a RAG context
    assembler actually cares about. Each rel/discount term is
    micro-quantized to bigint before the 10-term sum (the q343
    discipline), so DCG/IDCG are exact integers in both engines.

    Scale: identical probe economics to q345 — per radius b, a
    partition-pruned IN-set scan of Σ_{d≤b} C(6, d) buckets; the
    DCG arithmetic runs on ≤10-row relations (bounded windows,
    q243 contract).
    """
    e = load(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir)
    if q is None:
        return _empty(
            spark,
            "n_probe_bits bigint, dcg_micro bigint, idcg_micro bigint, "
            "ndcg_at_10 double",
        )
    planes = S.random_hyperplanes(6, 64)
    bucketed = S.srp_buckets(e, 6, 64)

    def dcg_micro(top10: DataFrame) -> F.Column:
        ranked = top10.select(
            F.round(F.col("cosine") * 1000, 0).cast("long").alias("rel_m"),
            F.row_number()
            .over(Window.orderBy(F.desc("cosine"), F.asc("vec_id")))
            .alias("rn"),
        )
        return ranked.agg(
            F.coalesce(
                F.sum(
                    F.round(
                        F.greatest(F.col("rel_m"), F.lit(0)) * 1e6
                        / F.log2(F.col("rn") + 1),
                        0,
                    ).cast("long")
                ).cast("long"),
                # empty probe level: SUM yields NULL — pin dcg to 0 to
                # match the oracle's coalesced LEFT JOIN row
                F.lit(0).cast("long"),
            ).alias("m")
        )

    idcg = dcg_micro(S.cosine_topk(e, q, k=10)).withColumnRenamed(
        "m", "idcg_micro"
    )
    outs = []
    for b in (0, 1, 2):
        probes = S.srp_probe_buckets(q, planes, n_probe_bits=b)
        approx = S.cosine_topk(
            bucketed.filter(F.col("bucket").isin(probes)), q, k=10
        )
        dcg = dcg_micro(approx).withColumnRenamed("m", "dcg_micro")
        outs.append(
            dcg.crossJoin(F.broadcast(idcg)).select(
                F.lit(b).cast("long").alias("n_probe_bits"),
                "dcg_micro",
                "idcg_micro",
                F.round(
                    F.col("dcg_micro") / F.col("idcg_micro").cast("double"), 4
                ).alias("ndcg_at_10"),
            )
        )
    out = outs[0]
    for nxt in outs[1:]:
        out = out.unionAll(nxt)
    return out.orderBy("n_probe_bits")


_SRP_PLANNER_PLANES = (4, 6, 8, 10)


def _q358_oracle() -> str:
    """q358 oracle: the same bucket-occupancy statistics per
    hyperplane count, each plane set embedded as literals (q61's
    device, four times)."""
    parts = []
    for p in _SRP_PLANNER_PLANES:
        parts.append(f"""
        SELECT CAST({p} AS BIGINT) AS n_planes,
               CAST({1 << p} AS BIGINT) AS n_buckets_theoretical,
               CAST(count(*) AS BIGINT) AS n_buckets_occupied,
               CAST(max(b) AS BIGINT) AS max_bucket_size,
               round(CAST(sum(b * b) AS DOUBLE) / sum(b), 2)
                   AS exp_candidates_self_probe
        FROM (
            SELECT {_srp_bucket_sql(p, 64)} AS bucket,
                   CAST(count(*) AS BIGINT) AS b
            FROM embeddings GROUP BY 1
        )""")
    return " UNION ALL ".join(parts) + " ORDER BY n_planes"


@register("q358_srp_index_planner", oracle=_q358_oracle())
def q358_srp_index_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP index PLANNER: bucket-occupancy statistics of the ANN
    index across hyperplane counts (4/6/8/10) — the tuning table an
    operator reads before building the q345 serving layout (the SRP
    twin of q262's MinHash (r, b) parameter planner):
    `exp_candidates_self_probe` = Σ b²/n is the expected single-
    bucket candidate count for a query drawn from the indexed
    distribution (occupancy-weighted bucket size), so the table
    shows directly how each extra plane halves expected probe cost
    while q345's curve shows what it costs in recall — the two
    tables together ARE the index-sizing decision. Max bucket size
    exposes skew (a hot bucket is the q254 salting case applied to
    vector space).

    Scale: each plane count is ONE map-side bucket projection +
    ONE combining rollup to ≤2^planes cells; the statistics
    relation never exceeds a few thousand rows. At 100 TB this is
    the same one-pass profile q296 runs for columns, applied to
    the vector index.
    """
    e = load(spark, sf_dir, "embeddings")
    outs = []
    for p in _SRP_PLANNER_PLANES:
        bstats = (
            S.srp_buckets(e, p, 64)
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("b"))
        )
        outs.append(
            bstats.agg(
                F.lit(p).cast("long").alias("n_planes"),
                F.lit(1 << p).cast("long").alias("n_buckets_theoretical"),
                F.count(F.lit(1)).cast("long").alias("n_buckets_occupied"),
                F.max("b").cast("long").alias("max_bucket_size"),
                F.round(
                    F.sum(F.col("b") * F.col("b")).cast("double") / F.sum("b"),
                    2,
                ).alias("exp_candidates_self_probe"),
            )
        )
    out = outs[0]
    for nxt in outs[1:]:
        out = out.unionAll(nxt)
    return out.orderBy("n_planes")


@register(
    "q360_pq_reconstruction_error",
    oracle="""
    WITH cb AS (
        SELECT vec_id AS c,
               list_transform(embedding, v -> CAST(v AS DOUBLE)) AS ce
        FROM embeddings WHERE vec_id < 4
    ),
    d AS (
        SELECT e.vec_id, s.s, cb.c,
               round(list_aggregate(list_transform(range(1, 9),
                     i -> pow(CAST(e.embedding[s.s * 8 + i] AS DOUBLE)
                              - cb.ce[s.s * 8 + i], 2)), 'sum'), 9) AS dist
        FROM embeddings e
        CROSS JOIN cb
        CROSS JOIN (SELECT unnest(range(0, 8)) AS s) s
    ),
    best AS (
        SELECT vec_id, s, CAST(round(dist * 1e9) AS BIGINT) AS dist_nano
        FROM (SELECT vec_id, s, dist,
                     row_number() OVER (PARTITION BY vec_id, s
                                        ORDER BY dist, c) AS rn
              FROM d)
        WHERE rn = 1
    ),
    mse AS (
        SELECT s, CAST(count(*) AS BIGINT) AS n_vecs,
               CAST(sum(dist_nano) AS BIGINT) AS sum_nano
        FROM best GROUP BY s
    ),
    mom AS (
        SELECT (g.i - 1) // 8 AS s,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(CAST(e.embedding[g.i] AS DOUBLE) * 1e6)
                        AS BIGINT)) AS BIGINT) AS s1,
               CAST(sum(CAST(round(CAST(e.embedding[g.i] AS DOUBLE) * 1e6)
                        AS BIGINT)
                        * CAST(round(CAST(e.embedding[g.i] AS DOUBLE) * 1e6)
                        AS BIGINT)) AS BIGINT) AS s2
        FROM embeddings e
        CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) g
        GROUP BY (g.i - 1) // 8, g.i
    ),
    svar AS (
        SELECT s,
               round(CAST(sum(CAST(round((s2 - CAST(s1 AS DOUBLE) * s1 / n)
                                         / n / 1e12 * 1e9) AS BIGINT))
                          AS DOUBLE) / 1e9, 6) AS subspace_variance
        FROM mom GROUP BY s
    )
    SELECT CAST(m.s AS BIGINT) AS subspace, m.n_vecs,
           round(CAST(m.sum_nano AS DOUBLE) / m.n_vecs / 1e9, 6) AS mse,
           v.subspace_variance,
           round(CAST(m.sum_nano AS DOUBLE) / m.n_vecs / 1e9
                 / v.subspace_variance, 4) AS distortion_ratio
    FROM mse m JOIN svar v ON v.s = m.s
    ORDER BY subspace
    """,
)
def q360_pq_reconstruction_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization RECONSTRUCTION-ERROR audit — the
    compression-quality table behind q162's assignment pass (q162
    reports which codewords are used; this reports what the
    compression COSTS): per subspace, the mean squared error between
    original subvectors and their assigned codewords, next to the
    subspace's own signal variance, so `distortion_ratio` (MSE/var)
    says directly how much of each subspace the 2-bit code destroys
    — the number that decides codebook size before a 100 TB corpus
    is compressed (ratio ≈ 1 means the codebook explains nothing;
    q188's Matryoshka-truncation recall is the retrieval-side view
    of the same tradeoff). Per-vector distances are rounded then
    nano-quantized before corpus sums; subspace variances come from
    micro-quantized integer moments — both engines derive every
    readout from identical integers.

    Scale: the assignment is q162's broadcast-codebook map-side pass
    (JVM slice/zip_with, no Python); the audit adds one combining
    agg to 8 cells and one integer-moment rollup per dimension — no
    new shuffle grows with the corpus.
    """
    e = load(spark, sf_dir, "embeddings")
    cast_d = lambda col: F.transform(col, lambda v: v.cast("double"))  # noqa: E731
    cb = F.broadcast(
        e.filter(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("c"), cast_d(F.col("embedding")).alias("ce")
        )
    )
    subs = F.broadcast(
        spark.range(0, 8).select(F.col("id").cast("int").alias("s"))
    )
    j = (
        e.select("vec_id", cast_d(F.col("embedding")).alias("x"))
        .crossJoin(cb)
        .crossJoin(subs)
    )
    sq = F.zip_with(
        F.slice(F.col("x"), F.col("s") * 8 + 1, 8),
        F.slice(F.col("ce"), F.col("s") * 8 + 1, 8),
        lambda a, b: (a - b) * (a - b),
    )
    dist = F.round(F.aggregate(sq, F.lit(0.0), lambda acc, t: acc + t), 9)
    best = (
        j.select("vec_id", "s", "c", dist.alias("dist"))
        .groupBy("vec_id", "s")
        .agg(
            F.round(F.min(F.struct("dist", "c"))["dist"] * 1e9, 0)
            .cast("long")
            .alias("dist_nano")
        )
    )
    mse = best.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum("dist_nano").cast("long").alias("sum_nano"),
    )
    xm = F.round(F.col("xd") * 1e6, 0).cast("long")
    mom = (
        e.select(F.posexplode(cast_d(F.col("embedding"))).alias("i0", "xd"))
        .select(F.floor(F.col("i0") / 8).cast("int").alias("s"), "i0", xm.alias("xm"))
        .groupBy("s", "i0")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("xm").cast("decimal(38,0)")).cast("long").alias("s1"),
            F.sum(F.col("xm").cast("decimal(38,0)") * F.col("xm"))
            .cast("long")
            .alias("s2"),
        )
    )
    # per-dimension variance terms nano-quantized to bigint BEFORE
    # the 8-term sum (engine-order independence — the q343 discipline)
    svar = mom.groupBy("s").agg(
        F.round(
            F.sum(
                F.round(
                    (
                        F.col("s2")
                        - F.col("s1").cast("double") * F.col("s1") / F.col("n")
                    )
                    / F.col("n")
                    / 1e12
                    * 1e9,
                    0,
                ).cast("long")
            ).cast("double")
            / 1e9,
            6,
        ).alias("subspace_variance")
    )
    m = F.col("sum_nano").cast("double") / F.col("n_vecs") / 1e9
    return (
        mse.join(svar, "s")
        .select(
            F.col("s").cast("long").alias("subspace"),
            "n_vecs",
            F.round(m, 6).alias("mse"),
            "subspace_variance",
            F.round(m / F.col("subspace_variance"), 4).alias("distortion_ratio"),
        )
        .orderBy("subspace")
    )


def _q367_oracle() -> str:
    """q367 oracle: q108's coarse-quantizer assignment (nearest of 8
    centroid vectors, milli-rounded cosine, cid tiebreak) with the
    probe level made a LATERAL knob — candidates at nprobe n are the
    members of the query's n nearest cells; recall measured against
    the exact brute-force top-10. Level skeleton LEFT JOINs so a
    zero-candidate level still emits its row (the q345 lesson)."""
    cos = (
        "round(list_aggregate(list_transform(range(1, 65),"
        " i -> CAST(e.embedding[i] AS DOUBLE) * c.cv[i]), 'sum')"
        " / (sqrt(list_aggregate(list_transform(e.embedding,"
        " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
        " * sqrt(list_aggregate(list_transform(c.cv, x -> x * x), 'sum'))), 3)"
    )
    qcos = (
        "round(list_aggregate(list_transform(range(1, 65),"
        " i -> CAST(e.embedding[i] AS DOUBLE) * q.qv[i]), 'sum')"
        " / (sqrt(list_aggregate(list_transform(e.embedding,"
        " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
        " * sqrt(list_aggregate(list_transform(q.qv, x -> x * x), 'sum'))), 3)"
    )
    return f"""
    WITH c AS (
        SELECT vec_id AS cid,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
        FROM embeddings WHERE vec_id < 8
    ),
    q AS (
        SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        FROM embeddings WHERE vec_id = 0
    ),
    assigned AS (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {cos} DESC, c.cid) AS rn
        FROM embeddings e, c
    ),
    cells AS (SELECT vec_id, cid FROM assigned WHERE rn = 1),
    levels AS (SELECT unnest([1, 2, 4]) AS nprobe),
    probe AS (
        SELECT l.nprobe, a.cid
        FROM levels l, assigned a
        WHERE a.vec_id = 0 AND a.rn <= l.nprobe
    ),
    scored AS (
        SELECT e.vec_id, {qcos} AS cosine FROM embeddings e, q
    ),
    brute AS (
        SELECT vec_id FROM scored ORDER BY cosine DESC, vec_id LIMIT 10
    ),
    cand AS (
        SELECT p.nprobe, s.vec_id, s.cosine
        FROM probe p
        JOIN cells ce ON ce.cid = p.cid
        JOIN scored s ON s.vec_id = ce.vec_id
    ),
    counts AS (
        SELECT nprobe, count(*) AS n_candidates FROM cand GROUP BY nprobe
    ),
    topk AS (
        SELECT nprobe, vec_id
        FROM (SELECT nprobe, vec_id,
                     row_number() OVER (PARTITION BY nprobe
                                        ORDER BY cosine DESC, vec_id) AS rn
              FROM cand)
        WHERE rn <= 10
    ),
    hits AS (
        SELECT t.nprobe, count(*) AS n_hits
        FROM topk t JOIN brute b USING (vec_id)
        GROUP BY t.nprobe
    )
    SELECT CAST(l.nprobe AS BIGINT) AS nprobe,
           CAST(l.nprobe AS BIGINT) AS n_cells_probed,
           CAST(coalesce(c.n_candidates, 0) AS BIGINT) AS n_candidates,
           CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
           round(coalesce(h.n_hits, 0) / 10.0, 2) AS recall_at_10
    FROM levels l
    LEFT JOIN counts c ON c.nprobe = l.nprobe
    LEFT JOIN hits h ON h.nprobe = l.nprobe
    ORDER BY nprobe
    """


@register("q367_ivf_multiprobe_recall", oracle=_q367_oracle())
def q367_ivf_multiprobe_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF multiprobe recall curve — the nprobe > 1 sweep q108's
    fixed-nprobe serving path was missing (r10 verdict #3), mirroring
    q345's Hamming-ring curve on the IVF side: at each
    nprobe ∈ {1, 2, 4}, probe the query's nprobe nearest coarse cells
    (the 8-centroid quantizer q108/q97/q135 share), brute-force
    cosine INSIDE those cells only, and report candidate count and
    recall@10 against the exact full-scan top-10. Together with
    q72 (int8), q162/q360 (PQ bytes/distortion), q188 (Matryoshka
    dims) and q345/q358 (SRP probes/cost), this completes the
    recall-vs-bytes-vs-probes frontier: every axis of the ANN design
    space now has a measured, oracle-gated row.

    Scale: the centroid table broadcasts (k rows); assignment is the
    map-only argmax; each probe level scans ~nprobe/k of the corpus
    via the cell equi-join (cells are the partition key at 100 TB, so
    the probe IN-set partition-prunes exactly like q345's bucket
    IN-set — the same candidate-then-refine pattern as the reference's
    H3 cell join, docs/H3_POLYGON_ANALYSIS.md); the recall join is
    10×10 rows.
    """
    e = load(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir)
    if q is None:
        return _empty(
            spark,
            "nprobe bigint, n_cells_probed bigint, n_candidates bigint,"
            " n_hits bigint, recall_at_10 double",
        )
    cents, vecs, dot = _staged_centroid_relations(e)
    scored = vecs.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "cid",
        F.round(dot / (F.col("e_norm") * F.col("c_norm")), 3).alias("cos"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), "cid")
    ranked = scored.withColumn("rn", F.row_number().over(w))
    cells = ranked.filter(F.col("rn") == 1).select("vec_id", "cid")
    qcells = ranked.filter(F.col("vec_id") == 0).select("cid", "rn")
    brute = S.cosine_topk(e, q, k=10).select("vec_id")
    outs = []
    for nprobe in (1, 2, 4):
        probe = qcells.filter(F.col("rn") <= nprobe).select("cid")
        cand_ids = cells.join(F.broadcast(probe), "cid").select("vec_id")
        cand = e.join(cand_ids, "vec_id", "left_semi")
        approx = S.cosine_topk(cand, q, k=10).select("vec_id")
        n_cand = cand.agg(
            F.count(F.lit(1)).cast("long").alias("n_candidates")
        )
        hits = approx.join(brute, "vec_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_hits")
        )
        outs.append(
            n_cand.crossJoin(F.broadcast(hits)).select(
                F.lit(nprobe).cast("long").alias("nprobe"),
                F.lit(nprobe).cast("long").alias("n_cells_probed"),
                "n_candidates",
                "n_hits",
                F.round(F.col("n_hits") / 10.0, 2).alias("recall_at_10"),
            )
        )
    out = outs[0]
    for nxt in outs[1:]:
        out = out.unionAll(nxt)
    return out.orderBy("nprobe")


def _q371_oracle() -> str:
    """q371 oracle: coarse assign (full-vector L2 argmin over the 8
    fixed centroids, 9-rounded, cid tiebreak) → residual vectors →
    per-subspace argmin over the 5-word residual codebook (zero word
    + residuals of vecs 0-3), every per-vector distance nano-
    quantized before corpus sums — q360's discipline, two stages
    deep."""
    dist64 = (
        "round(list_aggregate(list_transform(range(1, 65),"
        " i -> pow(CAST(e.embedding[i] AS DOUBLE) - cb.ce[i], 2)), 'sum'), 9)"
    )
    return f"""
    WITH cb AS (
        SELECT vec_id AS cid,
               list_transform(embedding, v -> CAST(v AS DOUBLE)) AS ce
        FROM embeddings WHERE vec_id < 8
    ),
    coarse AS (
        SELECT vec_id, cid FROM (
            SELECT e.vec_id, cb.cid,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY {dist64}, cb.cid) AS rn
            FROM embeddings e CROSS JOIN cb
        ) WHERE rn = 1
    ),
    resid AS (
        SELECT e.vec_id,
               list_transform(range(1, 65),
                   i -> CAST(e.embedding[i] AS DOUBLE) - cb.ce[i]) AS rx
        FROM embeddings e
        JOIN coarse ON coarse.vec_id = e.vec_id
        JOIN cb ON cb.cid = coarse.cid
    ),
    rcb AS (
        SELECT 0 AS w, list_transform(range(1, 65), i -> 0.0) AS rc
        UNION ALL
        SELECT vec_id + 1 AS w, rx AS rc FROM resid WHERE vec_id < 4
    ),
    cells AS (
        SELECT r.vec_id, s.s, c.w,
               round(list_aggregate(list_transform(range(1, 9),
                     i -> pow(r.rx[s.s * 8 + i] - c.rc[s.s * 8 + i], 2)),
                     'sum'), 9) AS dist,
               round(list_aggregate(list_transform(range(1, 9),
                     i -> pow(r.rx[s.s * 8 + i], 2)), 'sum'), 9) AS cdist
        FROM resid r
        CROSS JOIN rcb c
        CROSS JOIN (SELECT unnest(range(0, 8)) AS s) s
    ),
    best AS (
        SELECT vec_id, s,
               CAST(round(dist * 1e9) AS BIGINT) AS rq_nano,
               CAST(round(cdist * 1e9) AS BIGINT) AS coarse_nano
        FROM (SELECT vec_id, s, dist, cdist,
                     row_number() OVER (PARTITION BY vec_id, s
                                        ORDER BY dist, w) AS rn
              FROM cells)
        WHERE rn = 1
    )
    SELECT CAST(s AS BIGINT) AS subspace,
           CAST(count(*) AS BIGINT) AS n_vecs,
           round(CAST(sum(coarse_nano) AS DOUBLE) / count(*) / 1e9, 6)
               AS mse_coarse,
           round(CAST(sum(rq_nano) AS DOUBLE) / count(*) / 1e9, 6) AS mse_rq,
           round(CAST(sum(rq_nano) AS DOUBLE)
                 / greatest(CAST(sum(coarse_nano) AS DOUBLE), 1e-9), 4)
               AS rq_ratio
    FROM best GROUP BY s
    ORDER BY subspace
    """


@register("q371_residual_quantization", oracle=_q371_oracle())
def q371_residual_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESIDUAL quantization (RQ) distortion audit — the two-stage
    compression between q108's coarse IVF and q162/q360's one-shot PQ
    (FAISS IVF-PQ encodes exactly this: PQ runs on the RESIDUAL
    x − centroid, whose energy is far below the raw vector's, so the
    same code bits buy more precision): stage 1 assigns each vector
    to its nearest of 8 coarse centroids (full-vector L2, the q360
    rounding discipline), stage 2 product-quantizes the residual per
    8-dim subspace against a 5-word residual codebook that INCLUDES
    THE ZERO WORD — so stage 2 can never do worse than coarse-only
    (rq_ratio ≤ 1 is a structural guarantee, pinned by test, because
    picking the zero word keeps the coarse reconstruction). Output:
    per-subspace residual energy before (mse_coarse) and after
    (mse_rq) the residual code, and their ratio — read beside q360's
    distortion_ratio, this is the measured answer to 'does the
    residual stage pay for its extra code byte?'.

    Scale: both codebooks broadcast (8 + 5 rows); assignment and
    residual arithmetic are map-side JVM slice/zip_with; the audit
    collapses to 8 subspace cells before any exchange — identical
    economics to q360 with one more broadcast fan-out.
    """
    e = load(spark, sf_dir, "embeddings")
    cast_d = lambda col: F.transform(col, lambda v: v.cast("double"))  # noqa: E731
    cb = F.broadcast(
        e.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("cid"), cast_d(F.col("embedding")).alias("ce")
        )
    )
    x = e.select("vec_id", cast_d(F.col("embedding")).alias("x"))
    d64 = F.round(
        F.aggregate(
            F.zip_with(F.col("x"), F.col("ce"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, t: acc + t,
        ),
        9,
    )
    coarse = (
        x.crossJoin(cb)
        .select("vec_id", "cid", d64.alias("dist"))
        .groupBy("vec_id")
        .agg(F.min(F.struct("dist", "cid"))["cid"].alias("cid"))
    )
    resid = (
        x.join(coarse, "vec_id")
        .join(cb, "cid")
        .select(
            "vec_id",
            F.zip_with(F.col("x"), F.col("ce"), lambda a, b: a - b).alias("rx"),
        )
        .localCheckpoint()
    )
    zero_word = resid.sparkSession.range(1).select(
        F.lit(0).cast("long").alias("w"),
        F.array_repeat(F.lit(0.0), 64).alias("rc"),
    )
    rcb = F.broadcast(
        zero_word.unionByName(
            resid.filter(F.col("vec_id") < 4).select(
                (F.col("vec_id") + 1).alias("w"), F.col("rx").alias("rc")
            )
        )
    )
    subs = F.broadcast(
        resid.sparkSession.range(0, 8).select(F.col("id").cast("int").alias("s"))
    )
    j = resid.crossJoin(rcb).crossJoin(subs)
    rslice = F.slice(F.col("rx"), F.col("s") * 8 + 1, 8)
    cslice = F.slice(F.col("rc"), F.col("s") * 8 + 1, 8)
    dist = F.round(
        F.aggregate(
            F.zip_with(rslice, cslice, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, t: acc + t,
        ),
        9,
    )
    cdist = F.round(
        F.aggregate(
            F.transform(rslice, lambda a: a * a), F.lit(0.0), lambda acc, t: acc + t
        ),
        9,
    )
    best = (
        j.select("vec_id", "s", "w", dist.alias("dist"), cdist.alias("cdist"))
        .groupBy("vec_id", "s")
        .agg(
            F.round(F.min(F.struct("dist", "w"))["dist"] * 1e9, 0)
            .cast("long")
            .alias("rq_nano"),
            F.round(F.max("cdist") * 1e9, 0).cast("long").alias("coarse_nano"),
        )
    )
    return (
        best.groupBy("s")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum("coarse_nano").cast("long").alias("c_sum"),
            F.sum("rq_nano").cast("long").alias("r_sum"),
        )
        .select(
            F.col("s").cast("long").alias("subspace"),
            "n_vecs",
            F.round(F.col("c_sum").cast("double") / F.col("n_vecs") / 1e9, 6).alias(
                "mse_coarse"
            ),
            F.round(F.col("r_sum").cast("double") / F.col("n_vecs") / 1e9, 6).alias(
                "mse_rq"
            ),
            F.round(
                F.col("r_sum").cast("double")
                / F.greatest(F.col("c_sum").cast("double"), F.lit(1e-9)),
                4,
            ).alias("rq_ratio"),
        )
        .orderBy("subspace")
    )


def _q379_dist_cte(name: str, center_sel: str) -> str:
    """One Gonzalez round's distance CTE: squared euclidean of every
    vector to the single center row `center_sel` yields, rounded to
    3 dp (the cross-engine comparison grain every argmax below
    uses)."""
    return f"""
    {name} AS (
        SELECT v.vec_id,
               round(list_aggregate(list_transform(range(1, 65),
                     i -> (v.x[i] - c.x[i]) * (v.x[i] - c.x[i])), 'sum'),
                     3) AS d
        FROM v JOIN v c ON c.vec_id = ({center_sel})
    )"""


_Q379_ORACLE = f"""
    WITH v AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS x
        FROM embeddings
    ),
    {_q379_dist_cte("d1", "SELECT 0")},
    c2 AS (SELECT vec_id, d FROM d1 ORDER BY d DESC, vec_id LIMIT 1),
    {_q379_dist_cte("d2", "SELECT vec_id FROM c2")},
    m2 AS (SELECT d1.vec_id, least(d1.d, d2.d) AS d
           FROM d1 JOIN d2 USING (vec_id)),
    c3 AS (SELECT vec_id, d FROM m2 ORDER BY d DESC, vec_id LIMIT 1),
    {_q379_dist_cte("d3", "SELECT vec_id FROM c3")},
    m3 AS (SELECT m2.vec_id, least(m2.d, d3.d) AS d
           FROM m2 JOIN d3 USING (vec_id)),
    c4 AS (SELECT vec_id, d FROM m3 ORDER BY d DESC, vec_id LIMIT 1),
    {_q379_dist_cte("d4", "SELECT vec_id FROM c4")},
    m4 AS (SELECT m3.vec_id, least(m3.d, d4.d) AS d
           FROM m3 JOIN d4 USING (vec_id))
    SELECT step, center_id, sel_dist,
           (SELECT round(max(d), 3) FROM m4) AS final_radius
    FROM (
        SELECT CAST(1 AS BIGINT) AS step, CAST(0 AS BIGINT) AS center_id,
               CAST(0.0 AS DOUBLE) AS sel_dist
        UNION ALL SELECT 2, (SELECT vec_id FROM c2), (SELECT d FROM c2)
        UNION ALL SELECT 3, (SELECT vec_id FROM c3), (SELECT d FROM c3)
        UNION ALL SELECT 4, (SELECT vec_id FROM c4), (SELECT d FROM c4)
    )
    ORDER BY step
"""


@register("q379_kcenter_coreset", oracle=_Q379_ORACLE)
def q379_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gonzalez greedy k-center CORESET selection (k=4, seeded at
    vec_id 0) — the max-diversity data-selection primitive: each
    round picks the vector FARTHEST (squared euclidean, min over
    the chosen set, ties to the smaller vec_id) from everything
    selected so far, the classic 2-approximation to the k-center
    optimum. The selected rows are the diversity coreset a training
    pipeline seeds curriculum / active-learning batches with —
    the complement of the near-dup family (q52/q54 drop redundancy;
    this MAXIMIZES spread). final_radius is the k-center objective:
    every corpus vector lies within it of some chosen center.

    Per-round distances are rounded to 3 dp BEFORE the argmax and
    min-fold in both engines — the same comparison-grain discipline
    as q97/q135 — so the greedy trajectory cannot fork on libm
    noise.

    Scale: k map-side passes, each a fold over ≤k literal 64-d
    vectors (no join, no shuffle); the argmax is orderBy+limit 1 =
    TakeOrderedAndProject (per-partition max, driver merge of 32
    rows). Driver state is k vectors + k ids — the same bounded
    per-round fetch as _query_vector. Lineage is re-evaluated per
    round (k·corpus map work, never materialized); at k beyond
    ~16 you'd persist the running min column instead.
    """
    e = load(spark, sf_dir, "embeddings")
    seed = e.filter(F.col("vec_id") == 0).select("embedding").head()
    if seed is None:
        return _empty(
            spark,
            "step bigint, center_id bigint, sel_dist double,"
            " final_radius double",
        )

    cast_d = lambda col: F.transform(col, lambda x: x.cast("double"))  # noqa: E731

    def dist2(center: list[float]):
        arr = F.array(*[F.lit(c) for c in center])
        return F.round(
            F.aggregate(
                F.zip_with(F.col("x"), arr, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, t: acc + t,
            ),
            3,
        )

    vecs = e.select("vec_id", cast_d(F.col("embedding")).alias("x"))
    centers = [[float(v) for v in seed[0]]]
    chosen: list[tuple[int, int, float]] = [(1, 0, 0.0)]
    df = vecs.withColumn("mind", dist2(centers[0]))
    for step in (2, 3, 4):
        top = df.orderBy(F.desc("mind"), F.asc("vec_id")).select(
            "vec_id", "mind"
        ).head()
        if top is None:
            break
        crow = (
            e.filter(F.col("vec_id") == int(top[0]))
            .select("embedding")
            .head()
        )
        centers.append([float(v) for v in crow[0]])
        chosen.append((step, int(top[0]), float(top[1])))
        df = df.withColumn("mind", F.least(F.col("mind"), dist2(centers[-1])))
    radius = df.agg(F.round(F.max("mind"), 3).alias("r")).head()[0]
    out = spark.createDataFrame(
        [(s, c, d, float(radius)) for s, c, d in chosen],
        "step bigint, center_id bigint, sel_dist double, final_radius double",
    )
    return out.orderBy("step")


@register(
    "q381_hard_negative_mining",
    oracle="""
    WITH v AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS x,
               sqrt(list_aggregate(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                   AS nrm
        FROM embeddings
    ),
    a AS (
        SELECT vec_id AS a_id, label AS a_label, x AS ax, nrm AS anrm
        FROM v WHERE vec_id < 10
    ),
    s AS (
        SELECT a.a_id, a.a_label, v.vec_id, v.label,
               round(list_aggregate(list_transform(range(1, 65),
                     i -> v.x[i] * a.ax[i]), 'sum') / (v.nrm * a.anrm),
                     3) AS cos
        FROM v, a WHERE v.vec_id <> a.a_id
    ),
    pos AS (
        SELECT a_id, vec_id, cos,
               row_number() OVER (PARTITION BY a_id
                                  ORDER BY cos DESC, vec_id) AS rn
        FROM s WHERE label = a_label
    ),
    neg AS (
        SELECT a_id, vec_id, cos,
               row_number() OVER (PARTITION BY a_id
                                  ORDER BY cos DESC, vec_id) AS rn
        FROM s WHERE label <> a_label
    )
    SELECT p.a_id AS anchor_id, p.vec_id AS pos_id, p.cos AS pos_cos,
           n.vec_id AS neg_id, n.cos AS neg_cos,
           round(p.cos - n.cos, 3) AS margin
    FROM pos p JOIN neg n ON n.a_id = p.a_id AND n.rn = 1
    WHERE p.rn = 1
    ORDER BY anchor_id
    """,
)
def q381_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-pair MINING for embedding training — per anchor
    (the first 10 vectors), the hardest positive (nearest neighbor
    sharing its label) and the hardest negative (nearest neighbor of
    a DIFFERENT label), with the triplet margin pos_cos − neg_cos.
    A negative margin is exactly the 'hard triplet' a contrastive
    fine-tune batches first (FaceNet semi-hard mining, applied at
    corpus scale); anchors whose label is NULL match neither side
    and drop identically in both engines.

    Scale: the anchor set is a bounded literal slice (10 rows) —
    broadcast fan-out against the corpus is map-side cosine
    arithmetic on staged norms (the q97/q135 discipline: norms
    computed once per side BEFORE the fan-out, never inside it).
    The per-anchor argmax is a 10-partition window over the scored
    stream — rank-1 rows only, so the exchange after scoring
    carries top candidates, never the corpus² pair matrix (anchors
    × corpus = 10n, not n²).
    """
    e = load(spark, sf_dir, "embeddings")
    cast_d = lambda col: F.transform(col, lambda x: x.cast("double"))  # noqa: E731
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, t: a + t
        )
    )
    vecs = e.select(
        "vec_id",
        "label",
        cast_d(F.col("embedding")).alias("x"),
        norm(cast_d(F.col("embedding"))).alias("nrm"),
    )
    anchors = vecs.select(
        F.col("vec_id").alias("a_id"),
        F.col("label").alias("a_label"),
        F.col("x").alias("ax"),
        F.col("nrm").alias("anrm"),
    ).filter(F.col("a_id") < 10)
    dot = F.aggregate(
        F.zip_with(F.col("x"), F.col("ax"), lambda u, w: u * w),
        F.lit(0.0),
        lambda a, t: a + t,
    )
    scored = (
        vecs.crossJoin(F.broadcast(anchors))
        .filter(F.col("vec_id") != F.col("a_id"))
        .select(
            "a_id",
            "a_label",
            "vec_id",
            "label",
            F.round(dot / (F.col("nrm") * F.col("anrm")), 3).alias("cos"),
        )
    )
    w = Window.partitionBy("a_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    pos = (
        scored.filter(F.col("label") == F.col("a_label"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("a_id").alias("anchor_id"),
            F.col("vec_id").alias("pos_id"),
            F.col("cos").alias("pos_cos"),
        )
    )
    neg = (
        scored.filter(F.col("label") != F.col("a_label"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("a_id").alias("anchor_id"),
            F.col("vec_id").alias("neg_id"),
            F.col("cos").alias("neg_cos"),
        )
    )
    return (
        pos.join(neg, "anchor_id")
        .select(
            "anchor_id",
            "pos_id",
            "pos_cos",
            "neg_id",
            "neg_cos",
            F.round(F.col("pos_cos") - F.col("neg_cos"), 3).alias("margin"),
        )
        .orderBy("anchor_id")
    )


def _q403_round_cte(t: int) -> str:
    prev = f"cand{t - 1}" if t > 1 else "cand"
    return f"""lb{t} AS (
        SELECT l, r, s,
               row_number() OVER (PARTITION BY l ORDER BY s DESC, r) AS rn
        FROM {prev}
    ),
    rb{t} AS (
        SELECT l, r,
               row_number() OVER (PARTITION BY r ORDER BY s DESC, l) AS rn
        FROM {prev}
    ),
    m{t} AS (
        SELECT lb{t}.l, lb{t}.r, lb{t}.s
        FROM lb{t} JOIN rb{t} ON lb{t}.l = rb{t}.l AND lb{t}.r = rb{t}.r
        WHERE lb{t}.rn = 1 AND rb{t}.rn = 1
    ),
    cand{t} AS (
        SELECT c.* FROM {prev} c
        WHERE c.l NOT IN (SELECT l FROM m{t})
          AND c.r NOT IN (SELECT r FROM m{t})
    )"""


_Q403_ORACLE = f"""
    WITH v AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS x,
               sqrt(list_aggregate(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                   AS nrm
        FROM embeddings WHERE vec_id < 40
    ),
    cand AS (
        SELECT a.vec_id AS l, b.vec_id AS r,
               round(list_aggregate(list_transform(range(1, 65),
                     i -> a.x[i] * b.x[i]), 'sum') / (a.nrm * b.nrm),
                     3) AS s
        FROM v a JOIN v b
          ON a.label = b.label
         AND a.vec_id % 2 = 0 AND b.vec_id % 2 = 1
    ),
    {_q403_round_cte(1)},
    {_q403_round_cte(2)},
    {_q403_round_cte(3)}
    SELECT CAST(1 AS BIGINT) AS round, l AS left_id, r AS right_id,
           s AS score FROM m1
    UNION ALL SELECT 2, l, r, s FROM m2
    UNION ALL SELECT 3, l, r, s FROM m3
    ORDER BY round, left_id
"""


@register("q403_mutual_best_matching", oracle=_Q403_ORACLE)
def q403_mutual_best_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1:1 ENTITY ASSIGNMENT by parallel mutual-best rounds — the
    conflict-resolution stage record linkage needs after candidate
    scoring (q312 finds scored pairs; q252 merges attributes; this
    decides WHO matches WHOM when several candidates compete): in
    each round, a pair matches iff each side is the other's best
    remaining candidate (ties → smaller id), matched nodes retire,
    and the next round re-ranks the survivors. Three rounds of this
    Luby-style symmetric matching resolve chains that one-shot
    mutual-NN (q305) leaves dangling, with NO sequential greedy scan
    — every round is two window argmaxes + an equi-join, fully
    parallel (the distributed stand-in for Hungarian assignment,
    exact whenever preferences are strict along the chain).
    Candidates here are label-blocked cosine pairs over a 40-vector
    study slice (even ids left, odd right).

    Scale: the candidate relation is whatever the blocking stage
    emits (pair grain, never n²); each round is two
    rank-1-per-partition windows over it plus anti-joins that only
    SHRINK it. Round count is the only sequential dimension —
    O(log n) rounds suffice in practice.
    """
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 40)
    cast_d = lambda c: F.transform(c, lambda x: x.cast("double"))  # noqa: E731
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0),
                    lambda a, t: a + t)
    )
    v = e.select(
        "vec_id",
        "label",
        cast_d(F.col("embedding")).alias("x"),
        norm(cast_d(F.col("embedding"))).alias("nrm"),
    )
    a = v.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("l"), F.col("label").alias("ll"),
        F.col("x").alias("ax"), F.col("nrm").alias("an"),
    )
    b = v.filter(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("r"), F.col("label").alias("rl"),
        F.col("x").alias("bx"), F.col("nrm").alias("bn"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("ax"), F.col("bx"), lambda u, w: u * w),
        F.lit(0.0), lambda acc, t: acc + t,
    )
    cand = (
        a.join(b, F.col("ll") == F.col("rl"))
        .select("l", "r", F.round(dot / (F.col("an") * F.col("bn")), 3)
                .alias("s"))
        .localCheckpoint()
    )
    outs = []
    for t in (1, 2, 3):
        wl = Window.partitionBy("l").orderBy(F.desc("s"), F.asc("r"))
        wr = Window.partitionBy("r").orderBy(F.desc("s"), F.asc("l"))
        ranked = cand.select(
            "l", "r", "s",
            F.row_number().over(wl).alias("lrn"),
            F.row_number().over(wr).alias("rrn"),
        )
        m = ranked.filter(
            (F.col("lrn") == 1) & (F.col("rrn") == 1)
        ).select("l", "r", "s").localCheckpoint()
        outs.append(
            m.select(
                F.lit(t).cast("long").alias("round"),
                F.col("l").alias("left_id"),
                F.col("r").alias("right_id"),
                F.col("s").alias("score"),
            )
        )
        cand = (
            cand.join(m.select("l"), "l", "left_anti")
            .join(m.select("r"), "r", "left_anti")
            .localCheckpoint()
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("round", "left_id")


@register(
    "q411_uncertainty_sampling",
    oracle="""
    WITH c AS (
        SELECT vec_id AS cid,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
        FROM embeddings WHERE vec_id < 8
    ),
    scored AS (
        SELECT e.vec_id, c.cid,
               round(list_aggregate(list_transform(range(1, 65),
                     i -> CAST(e.embedding[i] AS DOUBLE) * c.cv[i]), 'sum')
                     / (sqrt(list_aggregate(list_transform(e.embedding,
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                            'sum'))
                        * sqrt(list_aggregate(list_transform(c.cv,
                            x -> x * x), 'sum'))), 3) AS cos
        FROM embeddings e, c WHERE e.vec_id >= 8
    ),
    ranked AS (
        SELECT vec_id, cid, cos,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cid) AS rn
        FROM scored
    )
    SELECT b.vec_id, b.cid AS best_cid, s.cid AS second_cid,
           b.cos AS best_cos,
           round(b.cos - s.cos, 3) AS margin
    FROM ranked b JOIN ranked s
      ON s.vec_id = b.vec_id AND b.rn = 1 AND s.rn = 2
    ORDER BY round(b.cos - s.cos, 3), b.vec_id
    LIMIT 15
    """,
)
def q411_uncertainty_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACTIVE-LEARNING batch selection by margin uncertainty — the
    label-efficiently-next primitive: score every corpus vector
    against the 8 shared centroids (q97/q135's quantizer), and
    surface the 15 vectors whose top-1 vs top-2 centroid margin is
    SMALLEST — the points sitting on cluster boundaries, exactly
    where a labeling budget or a human-review queue buys the most
    information (q379's k-center picks for COVERAGE; this picks for
    CONFUSION — the two standard acquisition functions, now both in
    the registry). Margins are 3-dp-rounded cosines (q135's
    comparison grain) with deterministic cid/vec_id tie-breaks.

    Scale: the centroid fan-out is the staged-norm broadcast
    map-side scoring shared with q97/q108/q135; the two ranks come
    from one 8-row-per-vector window; the final pick is
    TakeOrderedAndProject. Nothing pairs corpus×corpus.
    """
    e = load(spark, sf_dir, "embeddings")
    cents, vecs, dot = _staged_centroid_relations(e)
    scored = (
        vecs.filter(F.col("vec_id") >= 8)
        .crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            "cid",
            F.round(dot / (F.col("e_norm") * F.col("c_norm")), 3).alias(
                "cos"
            ),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("cid"))
    ranked = scored.withColumn("rn", F.row_number().over(w))
    b = ranked.filter(F.col("rn") == 1).select(
        "vec_id", F.col("cid").alias("best_cid"), F.col("cos").alias("best_cos")
    )
    s = ranked.filter(F.col("rn") == 2).select(
        "vec_id", F.col("cid").alias("second_cid"),
        F.col("cos").alias("second_cos"),
    )
    return (
        b.join(s, "vec_id")
        .select(
            "vec_id",
            "best_cid",
            "second_cid",
            "best_cos",
            F.round(F.col("best_cos") - F.col("second_cos"), 3).alias(
                "margin"
            ),
        )
        .orderBy("margin", "vec_id")
        .limit(15)
    )


# ---- q465: simplified silhouette of the centroid clustering --------------
@register(
    "q465_cluster_silhouette",
    oracle="""
    WITH c AS (
        SELECT vec_id AS cid,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
        FROM embeddings WHERE vec_id < 8
    ),
    scored AS (
        SELECT e.vec_id, c.cid,
               round(list_aggregate(list_transform(range(1, 65),
                                                   i -> CAST(e.embedding[i] AS DOUBLE) * c.cv[i]),
                                    'sum')
                     / (sqrt(list_aggregate(list_transform(e.embedding,
                                                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                                            'sum'))
                        * sqrt(list_aggregate(list_transform(c.cv, x -> x * x), 'sum'))),
                     3) AS cosine
        FROM embeddings e, c
    ),
    best AS (
        SELECT vec_id, cid, cosine,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cosine DESC, cid) AS rn
        FROM scored
    ),
    sil AS (
        SELECT b1.vec_id, b1.cid AS cluster_id,
               CAST(round(1000.0
                          * (CAST(round(b1.cosine * 1000) AS BIGINT)
                             - CAST(round(b2.cosine * 1000) AS BIGINT))
                          / greatest(1000 - CAST(round(b2.cosine * 1000)
                                                AS BIGINT), 1))
                   AS BIGINT) AS s_milli
        FROM best b1 JOIN best b2
          ON b1.vec_id = b2.vec_id AND b1.rn = 1 AND b2.rn = 2
    )
    SELECT cluster_id,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(round(avg(s_milli)) AS BIGINT) AS mean_sil_milli,
           CAST(min(s_milli) AS BIGINT) AS min_sil_milli,
           CAST(max(s_milli) AS BIGINT) AS max_sil_milli,
           CAST(count(*) FILTER (s_milli < 100) AS BIGINT) AS n_boundary
    FROM sil GROUP BY cluster_id ORDER BY cluster_id
    """,
)
def q465_cluster_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIMPLIFIED SILHOUETTE of the centroid clustering — the cluster-
    quality gauge the SemDeDup/IVF family (q97/q108/q162) ships
    without: per vector, a = cosine distance to its OWN (nearest)
    centroid and b = distance to the nearest OTHER centroid, s =
    (b − a)/max(a, b) ∈ [0, 1] under argmax assignment (full-corpus
    pairwise silhouette is O(n²); the centroid form is the standard
    O(nk) approximation, and for IVF it is EXACTLY the quantity that
    prices multi-probe: a boundary point — s near 0 — is the point
    whose neighbors live in the second-nearest list, q367's recall
    argument made per-point). Cosines are 3dp-rounded (q97's
    contract), so a and b are exact milli integers and the silhouette
    is pure integer arithmetic — bit-identical across engines. Per
    cluster: member count, mean/min/max silhouette, and the boundary
    count (s < 0.1) — the rows that tell a curator which clusters are
    real and which are centroid artifacts.

    Scale: the scaffold is q97's broadcast-centroid scan (k=8
    centroid rows fan out, norms staged once); best + runner-up come
    from ONE bounded per-key sort of k structs (sort_array of the
    collect_list — no corpus-wide window); the rollup is
    |clusters|-grain.
    """
    e = load(spark, sf_dir, "embeddings")
    cents, vecs, dot = _staged_centroid_relations(e)
    scored = vecs.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "cid",
        F.round(dot / (F.col("e_norm") * F.col("c_norm")), 3).alias("cosine"),
    )
    top2 = scored.groupBy("vec_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("cosine"), (-F.col("cid")).alias("neg_cid"))
            )
        ).alias("arr")
    ).select(
        "vec_id",
        (-F.element_at("arr", -1).getField("neg_cid")).alias("cluster_id"),
        F.round(F.element_at("arr", -1).getField("cosine") * 1000)
        .cast("long")
        .alias("c1m"),
        F.round(F.element_at("arr", -2).getField("cosine") * 1000)
        .cast("long")
        .alias("c2m"),
    )
    sil = top2.select(
        "vec_id",
        "cluster_id",
        F.round(
            1000.0
            * (F.col("c1m") - F.col("c2m"))
            / F.greatest(F.lit(1000) - F.col("c2m"), F.lit(1))
        ).cast("long").alias("s_milli"),
    )
    return (
        sil.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.round(F.avg("s_milli")).cast("long").alias("mean_sil_milli"),
            F.min("s_milli").cast("long").alias("min_sil_milli"),
            F.max("s_milli").cast("long").alias("max_sil_milli"),
            F.sum(F.when(F.col("s_milli") < 100, 1).otherwise(0))
            .cast("long")
            .alias("n_boundary"),
        )
        .orderBy("cluster_id")
    )


# ---- q473: hard-negative mining at the cluster boundary ------------------
_Q473_K = 5   # hard negatives emitted per centroid


@register(
    "q473_hard_negative_mining",
    oracle=f"""
    WITH c AS (
        SELECT vec_id AS cid,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
        FROM embeddings WHERE vec_id < 8
    ),
    scored AS (
        SELECT e.vec_id, c.cid,
               round(list_aggregate(list_transform(range(1, 65),
                                                   i -> CAST(e.embedding[i] AS DOUBLE) * c.cv[i]),
                                    'sum')
                     / (sqrt(list_aggregate(list_transform(e.embedding,
                                                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                                            'sum'))
                        * sqrt(list_aggregate(list_transform(c.cv, x -> x * x), 'sum'))),
                     3) AS cosine
        FROM embeddings e, c
    ),
    own AS (
        SELECT vec_id, cid AS own_cluster, cosine AS own_cos
        FROM (SELECT vec_id, cid, cosine,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY cosine DESC, cid) AS rn
              FROM scored) WHERE rn = 1
    ),
    ranked AS (
        SELECT s.cid, s.vec_id, s.cosine, o.own_cluster, o.own_cos,
               row_number() OVER (PARTITION BY s.cid
                                  ORDER BY s.cosine DESC, s.vec_id)
                   AS rank
        FROM scored s JOIN own o USING (vec_id)
        WHERE s.cid <> o.own_cluster
    )
    SELECT cid AS cluster_id, CAST(rank AS BIGINT) AS rank, vec_id,
           cosine AS cos_to_centroid, own_cluster,
           CAST(round(1000 * (own_cos - cosine)) AS BIGINT)
               AS margin_milli
    FROM ranked WHERE rank <= {_Q473_K}
    ORDER BY cluster_id, rank
    """,
)
def q473_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD-NEGATIVE MINING at the cluster boundary — the contrastive
    training-data step after q241 builds positives: for every
    centroid, the {_Q473_K} vectors assigned ELSEWHERE that sit
    closest to it (highest cosine, 3dp-rounded, vec_id tiebreak) —
    exactly the confusable in-batch negatives an embedding trainer
    wants (easy random negatives teach nothing; these sit at the
    decision boundary). margin_milli = own-centroid cosine minus the
    mined cosine (≥ 0 under argmax assignment) is the curriculum
    knob: smallest margins are the hardest negatives. Also the IVF
    read: a small margin is q367's multiprobe case and q465's
    boundary point, per identified vector.

    Scale: the scaffold is q97's broadcast-centroid scan; per-vector
    assignment is the bounded k-struct sort; the per-centroid top-k
    is a k-partition window over the |vectors|×(k−1) scored relation
    — at 100 TB replace with per-partition TakeOrdered per centroid
    (operators/ranking's two-pass device), same contract.
    """
    e = load(spark, sf_dir, "embeddings")
    cents, vecs, dot = _staged_centroid_relations(e)
    scored = vecs.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "cid",
        F.round(dot / (F.col("e_norm") * F.col("c_norm")), 3).alias("cosine"),
    )
    own = (
        scored.groupBy("vec_id")
        .agg(
            F.max(
                F.struct(F.col("cosine"), (-F.col("cid")).alias("neg_cid"))
            ).alias("b")
        )
        .select(
            "vec_id",
            (-F.col("b.neg_cid")).alias("own_cluster"),
            F.col("b.cosine").alias("own_cos"),
        )
    )
    ranked = (
        scored.join(own, "vec_id")
        .where(F.col("cid") != F.col("own_cluster"))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("cid").orderBy(
                    F.desc("cosine"), F.asc("vec_id")
                )
            ),
        )
        .where(F.col("rank") <= _Q473_K)
    )
    return ranked.select(
        F.col("cid").alias("cluster_id"),
        F.col("rank").cast("long").alias("rank"),
        "vec_id",
        F.col("cosine").alias("cos_to_centroid"),
        "own_cluster",
        F.round(1000 * (F.col("own_cos") - F.col("cosine")))
        .cast("long")
        .alias("margin_milli"),
    ).orderBy("cluster_id", "rank")
