"""Query registry — the declared operator inventory.

Every operator the engine implements (SURVEY.md §2 plus the
training-data extensions) is declared here as a named query:

- a Spark callable ``(spark, sf_dir) -> DataFrame``
- where SQL-expressible, an equivalent DuckDB oracle SQL string

The driver runs both sides at sf0.01 and hash-compares
(CORRECTNESS_r{N}.json). ``tests/test_correctness.py`` replicates
that gate locally at sf0.001.

Column-name contract: every computed column is aliased identically in
the Spark code and the oracle SQL (the driver sorts columns by name
before hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: register a query (and optional DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registrations run."""
    from g_etl_spark.queries import (  # noqa: F401
        dedup,
        grid,
        multimodal,
        relational,
        sampling,
        similarity,
        text,
        windows,
    )


def queries() -> dict[str, QueryFn]:
    load_all()
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    load_all()
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}
