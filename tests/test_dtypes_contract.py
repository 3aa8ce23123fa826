"""Loaded-schema contract for every testdata table.

Round-2 postmortem: a Spark upgrade changed how events.parquet's
timestamp decodes (TIMESTAMP(NANOS)+nanosAsLong shim → TIMESTAMP_NTZ),
which broke 5 queries and 6 tests at ELEVEN scattered sites. This test
pins the dtype of every column the engine depends on so any future
reader-behavior drift fails HERE, in one obvious place, with the
offending column named.
"""

from __future__ import annotations

import pytest

from g_etl_spark.tables import TABLE_NAMES, load

SF_DIR = "/root/testdata/sf0.001"

# The engine's dtype contract per table. Every column queries/operators
# cast, aggregate, or watermark on is listed; extra columns in the
# parquet are tolerated (asserted as superset), missing or re-typed
# ones are not.
EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    # date columns decode as TIMESTAMP_NTZ under Spark 4.1 — queries
    # compare them against timestamp literals / via date_format, both
    # NTZ-safe, so NTZ is the pinned contract here (unlike events.ts).
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp_ntz",
    },
    # ts MUST load as TIMESTAMP (not TIMESTAMP_NTZ, not bigint nanos):
    # withWatermark / unix_micros / cast(bigint) all reject NTZ, and the
    # DuckDB value-hash contract assumes UTC micros. tables.load
    # normalizes; this row is the canary for reader drift.
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


@pytest.mark.parametrize("table", TABLE_NAMES)
def test_loaded_dtypes_match_contract(spark, table):
    assert table in EXPECTED, f"no dtype contract declared for {table}"
    got = dict(load(spark, SF_DIR, table).dtypes)
    bad = []
    for col, want in EXPECTED[table].items():
        if col not in got:
            bad.append(f"{col}: MISSING (have {sorted(got)})")
        elif got[col] != want:
            bad.append(f"{col}: {got[col]!r} != expected {want!r}")
    assert not bad, f"{table} schema drift: " + "; ".join(bad)
