"""pyspark.ml-backed similarity/dedup alternates.

The hand-rolled operators (operators/similarity.py, operators/
dedup.py) are the oracle-checkable reference implementations; these
wrap Spark MLlib's built-in LSH estimators and KMeans as the
battle-tested JVM alternates for cluster use:

- ``ml_minhash_candidates``: pyspark.ml MinHashLSH over token sets
  (approxSimilarityJoin — JVM-side banding, no Python in the loop)
- ``ml_srp_neighbors``: BucketedRandomProjectionLSH over embeddings
  (Euclidean bucketing; cosine-adjacent for normalized vectors)
- ``ivf_topk``: IVF-style ANN — KMeans coarse quantizer, probe the
  nearest ``n_probe`` centroids, exact re-rank inside (the classic
  IVF-Flat layout; at scale the table is written partitioned by
  centroid id so a probe is a partition-pruned scan)

All of pyspark.ml ships with pyspark — no extra dependency.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from pyspark.ml.clustering import KMeans
from pyspark.ml.feature import (
    BucketedRandomProjectionLSH,
    CountVectorizer,
    MinHashLSH,
)
from pyspark.ml.functions import array_to_vector
from pyspark.ml.linalg import Vectors


def ml_minhash_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hash_tables: int = 8,
    jaccard_distance_threshold: float = 0.5,
) -> DataFrame:
    """MinHashLSH near-dup candidate pairs via approxSimilarityJoin.

    Returns (id_a, id_b, jaccard_distance), id_a < id_b. The
    CountVectorizer(binary=True) vocabulary build is one extra pass;
    the join itself is MLlib's banded OR-amplified LSH (JVM)."""
    toks = df.select(
        F.col(id_col), F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("_toks")
    )
    cv = CountVectorizer(inputCol="_toks", outputCol="_features", binary=True)
    model = cv.fit(toks)
    feats = model.transform(toks).filter(
        # MinHashLSH requires at least one non-zero entry
        F.size("_toks") > 0
    )
    mh = MinHashLSH(
        inputCol="_features", outputCol="_hashes", numHashTables=num_hash_tables, seed=42
    )
    mh_model = mh.fit(feats)
    pairs = mh_model.approxSimilarityJoin(
        feats, feats, jaccard_distance_threshold, distCol="jaccard_distance"
    )
    return (
        pairs.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.round("jaccard_distance", 4).alias("jaccard_distance"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )


def ml_srp_neighbors(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
) -> DataFrame:
    """Approximate nearest neighbors via BucketedRandomProjectionLSH
    (Euclidean). Returns (id, dist) for the approx top-k."""
    feats = df.select(
        F.col(id_col), array_to_vector(F.col(vec_col).cast("array<double>")).alias("_v")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="_v",
        outputCol="_hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=42,
    )
    model = lsh.fit(feats)
    out = model.approxNearestNeighbors(feats, Vectors.dense(list(query)), k, distCol="dist")
    return out.select(F.col(id_col), F.round("dist", 4).alias("dist"))


def ivf_fit(
    df: DataFrame,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Train the IVF coarse quantizer; returns (assigned_df, centers).

    assigned_df carries ``_list`` (the inverted-list id). At 100 TB
    write it ``partitionBy('_list')`` so probes prune partitions."""
    feats = df.select(
        F.col(id_col),
        F.col(vec_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("_v"),
    )
    km = KMeans(k=n_lists, seed=42, featuresCol="_v", predictionCol="_list")
    model = km.fit(feats)
    return model.transform(feats).drop("_v"), model.clusterCenters()


def ivf_topk(
    assigned: DataFrame,
    centers,
    query: Sequence[float],
    k: int = 10,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the n_probe nearest inverted lists, exact cosine re-rank
    inside them (IVF-Flat)."""
    import math

    q = list(map(float, query))

    def dist2(c):
        return sum((a - b) ** 2 for a, b in zip(c, q))

    probe = sorted(range(len(centers)), key=lambda i: dist2(centers[i]))[:n_probe]
    from g_etl_spark.operators.similarity import cosine_topk

    candidates = assigned.filter(F.col("_list").isin(probe))
    return cosine_topk(candidates, q, k=k, id_col=id_col, vec_col=vec_col)
