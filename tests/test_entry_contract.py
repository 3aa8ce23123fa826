"""Driver-contract invariants for __spark_entry__.py."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) >= 3


def test_queries_and_oracles_align():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 45
    # every oracle key must be a declared query
    assert set(oracles) <= set(qs)
    # every registered query carries a DuckDB oracle (q53's simhash
    # gained a portable bit-vote oracle in round 2 — zero rows-only)
    rows_only = set(qs) - set(oracles)
    assert rows_only == set()
    # callables, not results
    assert all(callable(fn) for fn in qs.values())
    assert all(isinstance(sql, str) and "SELECT" in sql.upper() for sql in oracles.values())
