"""Empty-corpus robustness: EVERY registered query must run against
empty (schema-only) tables without raising.

At 100 TB this is not a corner case — empty partitions, empty days,
and freshly-created datasets all produce empty inputs, and an
operator that crashes on them takes the pipeline down. The algebraic
contract: a query over an empty corpus returns an empty (or
scalar-over-empty) result, never an exception.
"""

from __future__ import annotations

import pytest

from g_etl_spark.queries import queries as load_queries
from g_etl_spark.tables import TABLE_NAMES, load

SF_DIR = "/root/testdata/sf0.001"

# Streaming equivalence queries spin up a real stream per call (~5 s
# each); one representative covers the empty-stream path.
_STREAMING = {"q91_stream_rollup_equiv", "q92_stream_dedup_equiv", "q93_stream_join_equiv"}
_STREAMING_KEEP = "q91_stream_rollup_equiv"


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("empty_sf")
    for name in TABLE_NAMES:
        (
            load(spark, SF_DIR, name)
            .limit(0)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(d / f"{name}.parquet"))
        )
    return str(d)


def _query_names():
    qs = load_queries()
    return [n for n in qs if n not in (_STREAMING - {_STREAMING_KEEP})]


@pytest.mark.parametrize("name", _query_names())
def test_query_survives_empty_corpus(spark, empty_dir, name):
    qs = load_queries()
    rows = qs[name](spark, empty_dir).collect()
    assert isinstance(rows, list)  # ran to completion; emptiness is fine


def test_concurrent_queries_match_serial(spark):
    """Eight assorted queries submitted simultaneously from threads
    (FAIR pools, shared session) must return exactly their serial
    results — pins thread-safety of the query functions and the
    session-level state they touch (conf setup, broadcast vars,
    registry)."""
    from concurrent.futures import ThreadPoolExecutor

    names = [
        "q01_pricing_summary", "q05_distinct_counts", "q22_grid_stats",
        "q40_text_stats", "q50_exact_dedup", "q60_cosine_topk",
        "q97_semantic_cluster_assign", "q105_salted_skew_agg",
    ]
    qs = load_queries()

    def run(name):
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", name)
        return sorted(map(tuple, qs[name](spark, SF_DIR).collect()))

    serial = {n: run(n) for n in names}
    with ThreadPoolExecutor(max_workers=len(names)) as ex:
        concurrent = dict(zip(names, ex.map(run, names)))
    for n in names:
        assert concurrent[n] == serial[n], f"{n} diverged under concurrency"
