"""Query registry — the declared operator inventory.

Every operator the engine implements (SURVEY.md §2 plus the
training-data extensions) is declared here as a named query:

- a Spark callable ``(spark, sf_dir) -> DataFrame``
- where SQL-expressible, an equivalent DuckDB oracle SQL string

The driver runs both sides at sf0.01 and hash-compares
(CORRECTNESS_r{N}.json). ``verify_local.py`` (repo root) replicates
that gate locally at sf0.001 / SF=0.01.

Column-name contract: every computed column is aliased identically in
the Spark code and the oracle SQL (the driver sorts columns by name
before hashing).
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable
from pathlib import Path

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
        sketches,
        streaming_equiv,
        text,
        windows,
    )


# Driver-visibility ordering: the correctness driver samples a prefix
# of the registry per round (50/round observed). Rotation policy
# (VERDICT r4 "Next round" #1): derive the ordering from recorded
# driver-row AGE instead of a hand-curated prefix list — scan the
# committed CORRECTNESS_r*.json files at the repo root and rank each
# query by the newest round in which the driver recorded a GREEN row
# for it. Queries with no green row ever (brand-new, or a recorded
# mismatch/error) sort first; then ascending newest-green-round
# (stalest first); name order breaks ties. The rotation is therefore
# automatic every round with no list to re-edit.


def _driver_row_ages() -> dict[str, int]:
    """Newest round with a green driver row, per query name."""
    root = Path(__file__).resolve().parents[2]
    ages: dict[str, int] = {}
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", p.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for q, row in data.items():
            green = (
                isinstance(row, dict)
                and not row.get("err")
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False
            )
            if green:
                ages[q] = max(ages.get(q, 0), rnd)
    return ages


def _qid(name: str) -> int:
    """Numeric registration id (qNNN prefix).

    Query ids are assigned sequentially as operators are added, so the
    id IS the registration chronology across rounds. Unnumbered names
    sort last within their age band.
    """
    m = re.match(r"q(\d+)", name)
    return int(m.group(1)) if m else 10**9


def _driver_order(names) -> list[str]:
    # Never-checked queries (age 0) sort first, OLDEST-REGISTERED
    # first (r11 verdict item #2): a plain name sort would let new
    # additions like q42x alphabetically starve e.g. q415-q421 of
    # their first driver row whenever the never-checked set exceeds
    # the driver's 50-slot sample window.
    ages = _driver_row_ages()
    return sorted(names, key=lambda n: (ages.get(n, 0), _qid(n), n))


def queries() -> dict[str, QueryFn]:
    load_all()
    return {name: _REGISTRY[name][0] for name in _driver_order(_REGISTRY)}


def oracle_sql() -> dict[str, str]:
    load_all()
    return {
        name: _REGISTRY[name][1]
        for name in _driver_order(_REGISTRY)
        if _REGISTRY[name][1] is not None
    }
