"""Local replica of the driver's correctness gate.

Runs every declared query through Spark AND its DuckDB oracle at a
given scale factor, canonicalizes both results (sort columns by name,
sort rows, stringify), and diffs. Use while iterating:

    python verify_local.py                 # all queries at sf0.001
    python verify_local.py q52 q60         # substring-filtered
    SF=0.01 python verify_local.py         # driver's correctness SF
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from g_etl_spark.session import get_spark
from g_etl_spark.tables import TABLE_NAMES
import __spark_entry__ as entrymod


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-compare shape: columns sorted by name, rows sorted, all
    values stringified (floats repr'd via round-trip str)."""
    out = df.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        out[c] = out[c].map(lambda v: _canon_value(v))
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def dtype_mismatches(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    """Explicit dtype comparison (catches int32/int64 drift BEFORE the
    stringified value compare hides it). Exact pandas dtype match is
    required unless a column contains nulls on either side — null
    presence promotes ints to float64/object differently per engine,
    so those columns compare on numeric-kind only."""
    out = []
    for c in sorted(set(spark_pdf.columns) & set(duck_pdf.columns)):
        a, b = spark_pdf[c], duck_pdf[c]
        if str(a.dtype) == str(b.dtype):
            continue
        if a.isna().any() or b.isna().any():
            ka, kb = a.dtype.kind, b.dtype.kind
            if {ka, kb} <= {"i", "u", "f", "O"}:  # null-promotion noise
                continue
        out.append(f"{c}: spark={a.dtype} duck={b.dtype}")
    return out


def _canon_value(v) -> str:
    import numpy as np

    if v is None:
        return "NULL"
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float):
        if pd.isna(v):
            return "NULL"
        return repr(round(v, 9))
    return str(v)


def main() -> int:
    sf = os.environ.get("SF", "0.001")
    sf_dir = f"/root/testdata/sf{sf}"
    filters = sys.argv[1:]

    spark = get_spark("verify_local")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    failures: list[str] = []

    for name, fn in sorted(qs.items()):
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark raised")
            traceback.print_exc()
            n_fail += 1
            failures.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(spark_pdf)} rows (no oracle) [{dt:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            duck_pdf = con.sql(oracles[name]).df()
        except Exception:
            print(f"FAIL  {name}: duckdb oracle raised")
            traceback.print_exc()
            n_fail += 1
            failures.append(name)
            continue
        a, b = canonicalize(spark_pdf), canonicalize(duck_pdf)
        dt_bad = dtype_mismatches(spark_pdf, duck_pdf)
        if list(a.columns) != list(b.columns):
            print(f"FAIL  {name}: columns differ spark={list(a.columns)} duck={list(b.columns)}")
            n_fail += 1
            failures.append(name)
        elif dt_bad:
            print(f"FAIL  {name}: dtypes differ: " + "; ".join(dt_bad))
            n_fail += 1
            failures.append(name)
        elif len(a) != len(b):
            print(f"FAIL  {name}: rowcount spark={len(a)} duck={len(b)}")
            n_fail += 1
            failures.append(name)
        elif not a.equals(b):
            neq = (a != b).any(axis=1)
            print(f"FAIL  {name}: {int(neq.sum())}/{len(a)} rows differ; first:")
            idx = neq[neq].index[:3]
            for i in idx:
                print(f"  spark: {a.loc[i].to_dict()}")
                print(f"  duck : {b.loc[i].to_dict()}")
            n_fail += 1
            failures.append(name)
        else:
            print(f"PASS  {name}: {len(a)} rows [{dt:.1f}s]")
            n_pass += 1

    print(f"\n== {n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail (sf={sf})")
    if failures:
        print("failed:", ", ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
