"""pyspark.ml LSH / IVF alternates: recall against the exact
baselines."""

from __future__ import annotations

import random

import pytest

from g_etl_spark.operators import similarity as S
from g_etl_spark.operators import similarity_ml as ML


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = random.Random(3)
    dim = 16
    base = [rng.gauss(0, 1) for _ in range(dim)]
    rows = []
    for i in range(300):
        if i % 5 == 0:
            v = [b + rng.gauss(0, 0.08) for b in base]
        else:
            v = [rng.gauss(0, 1) for _ in range(dim)]
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()


def test_ml_minhash_finds_planted_dups(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta"),        # near dup of 1
        (3, "one two three four five six seven eight nine"),
        (4, "totally different words entirely here now ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = ML.ml_minhash_candidates(df, jaccard_distance_threshold=0.4)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got
    assert (3, 4) not in got


def test_ml_srp_neighbors_recall(spark, vec_df):
    base = vec_df.filter("vec_id = 0").head().embedding
    exact = {r.vec_id for r in S.cosine_topk(vec_df, base, k=10).collect()}
    approx = {r.vec_id for r in ML.ml_srp_neighbors(vec_df, base, k=10).collect()}
    # Euclidean ANN on clustered data: most of the exact cosine top-k
    assert len(exact & approx) >= 6


def test_ivf_topk_recall(spark, vec_df):
    base = vec_df.filter("vec_id = 0").head().embedding
    assigned, centers = ML.ivf_fit(vec_df, n_lists=8)
    exact = {r.vec_id for r in S.cosine_topk(vec_df, base, k=10).collect()}
    approx = {r.vec_id for r in ML.ivf_topk(assigned, centers, base, k=10, n_probe=2).collect()}
    assert len(exact & approx) >= 8  # cluster members share a list
