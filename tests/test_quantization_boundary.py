"""Cross-engine ln-quantization boundary property test (r15 verdict
item #9, closing the risk note carried since ADVICE/r15).

The weighted samplers (q102/q402 family) rank by the Efraimidis-
Spirakis key ln(u)/w quantized as round(k * 1e6, 6) before any
cross-engine comparison. The carried risk: round(1e6 * ln(x)) could
flip one micro-nat if the two engines' libm ln() differ by a half-ulp
EXACTLY at a rounding boundary. The oracle gates only sample the
corpus's own (u, w) pairs; this test goes looking for trouble — it
scans a large synthetic population of md5-derived u values (the
production u convention) times adversarial weights, selects the pairs
whose key lands CLOSEST to a 0.5e-6 rounding boundary on this host,
and pins that Spark (JVM Math.log) and DuckDB (C libm log) still
agree exactly after quantization on those worst cases.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pyspark.sql.functions as F

N_IDS = 20000
WEIGHTS = [1.0, 3.0, 7.0, 997.0, 12345.0]  # n_chars-like spread
N_ADVERSARIAL = 300  # worst boundary cases kept per run


def _u_of(doc_id: int) -> float:
    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
    return (h + 1.0) / 4294967297.0


def _boundary_distance(key: float) -> float:
    """Distance of key*1e6 from the nearest .5 rounding boundary at
    the 6-dp quantization grid (0 = exactly on a boundary)."""
    scaled = abs(key) * 1e6 * 1e6  # key*1e6 at 6 dp -> integer grid
    frac = scaled - math.floor(scaled)
    return abs(frac - 0.5)


def test_ln_micro_nat_quantization_agrees_on_boundary_cases(spark):
    # 1. scan the synthetic population in plain Python (host libm —
    #    the third implementation) to FIND the adversarial pairs
    cases = []
    for i in range(N_IDS):
        u = _u_of(i)
        lu = math.log(u)
        for w in WEIGHTS:
            cases.append((i, w, _boundary_distance(lu / w)))
    cases.sort(key=lambda t: t[2])
    worst = cases[:N_ADVERSARIAL]
    # the scan must actually have found near-boundary cases, else the
    # test isn't testing anything (observed min is ~1e-7-ish at this
    # population size)
    assert worst[0][2] < 1e-4, f"no near-boundary case found: {worst[0]}"

    ids = [(i, w) for i, w, _ in worst]

    # 2. Spark side: the exact production expression chain
    sdf = spark.createDataFrame(ids, "doc_id long, w double")
    u_col = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("double")
        + 1.0
    ) / F.lit(4294967297.0)
    srows = (
        sdf.select(
            "doc_id",
            "w",
            F.round(F.log(u_col) / F.col("w") * 1e6, 6).alias("key_micro"),
        )
        .collect()
    )
    spark_keys = {(r["doc_id"], r["w"]): r["key_micro"] for r in srows}

    # 3. DuckDB side: the exact oracle expression chain
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, w DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", ids)
    drows = con.execute(
        """
        SELECT doc_id, w,
               round(ln((CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                            1, 8) AS UBIGINT) AS DOUBLE)
                         + 1.0) / 4294967297.0) / w * 1e6, 6) AS key_micro
        FROM t
        """
    ).fetchall()
    duck_keys = {(d, w): k for d, w, k in drows}

    mismatches = [
        (key, spark_keys[key], duck_keys[key])
        for key in spark_keys
        if spark_keys[key] != duck_keys[key]
    ]
    assert not mismatches, (
        f"{len(mismatches)} micro-nat flips at boundary cases, e.g. "
        f"{mismatches[:3]}"
    )
