"""Z-order layout: the multi-column data-skipping contract.

The claim a 100 TB deployment cares about: after write_zordered on
(a, b), a min/max-pruning scan skips most files for a selective
predicate on EITHER column — where a single-column sort only ever
prunes its own column. Verified directly against the parquet footers
(pyarrow), i.e. the exact statistics Spark's scan consults.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from g_etl_spark.operators import layout as L
from g_etl_spark.tables import load

SF_DIR = "/root/testdata/sf0.01"
COLS = ["user_id", "value"]
N_FILES = 32


def _box(df, col, lo_q, hi_q):
    lo, hi = df.approxQuantile(col, [lo_q, hi_q], 0.0)
    return (lo, hi)


def test_zorder_prunes_both_columns_single_sort_does_not(spark, tmp_path):
    ev = load(spark, SF_DIR, "events").select("event_id", "user_id", "value")

    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "single_sort")
    L.write_zordered(ev, zpath, COLS, num_files=N_FILES)
    # comparison layout: same file count, clustered on user_id only
    (
        ev.repartitionByRange(N_FILES, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(spath)
    )

    zstats = L.file_stats(zpath, COLS)
    sstats = L.file_stats(spath, COLS)
    assert len(zstats) == N_FILES and len(sstats) == N_FILES

    # ~5%-wide boxes in each dimension
    ubox = _box(ev, "user_id", 0.40, 0.45)
    vbox = _box(ev, "value", 0.40, 0.45)

    # single-sort: near-perfect on its own column, useless on the other
    assert L.files_pruned_fraction(sstats, {"user_id": ubox}) >= 0.9
    assert L.files_pruned_fraction(sstats, {"value": vbox}) <= 0.1

    # z-order: substantial pruning on EACH column alone...
    z_u = L.files_pruned_fraction(zstats, {"user_id": ubox})
    z_v = L.files_pruned_fraction(zstats, {"value": vbox})
    assert z_u >= 0.5, f"user_id-only pruning too weak: {z_u}"
    assert z_v >= 0.5, f"value-only pruning too weak: {z_v}"
    # ...and stronger still on the conjunction (the 2-D box)
    z_uv = L.files_pruned_fraction(zstats, {"user_id": ubox, "value": vbox})
    assert z_uv >= max(z_u, z_v)
    assert z_uv >= 0.8, f"2-D box pruning too weak: {z_uv}"


def test_zorder_layout_preserves_data(spark, tmp_path):
    ev = load(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    path = str(tmp_path / "z2")
    L.write_zordered(ev, path, COLS, num_files=8)
    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    assert set(back.columns) == set(ev.columns)  # no _z residue
    # spot-check a filtered read returns the identical id set
    lo, hi = _box(ev, "value", 0.10, 0.12)
    want = {r.event_id for r in ev.filter(F.col("value").between(lo, hi)).collect()}
    got = {r.event_id for r in back.filter(F.col("value").between(lo, hi)).collect()}
    assert got == want


def test_write_zordered_engine_scan_rows_match_footers(spark, tmp_path):
    """The ENGINE's own scan metric must agree with the footers (r13
    verdict item #1, the production write_zordered path): after a
    filtered read of the Z-ordered layout with AQE off, the scan's
    numOutputRows equals the total rows of exactly the files whose
    footer envelope intersects the box — i.e. parquet row-group
    skipping at file grain (one row group and one page per file at
    this size), measured from the executed plan, not inferred from
    file_stats arithmetic."""
    import os

    import pyarrow.parquet as pq

    from g_etl_spark.queries.relational import _q459_scan_rows

    ev = load(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    path = str(tmp_path / "zmetrics")
    L.write_zordered(ev, path, COLS, num_files=N_FILES)

    # integer bounds for the bigint column: a double literal would
    # wrap user_id in a cast and BLOCK parquet filter pushdown — the
    # exact failure mode this test exists to catch
    ubox = tuple(int(x) for x in _box(ev, "user_id", 0.40, 0.45))
    vbox = _box(ev, "value", 0.40, 0.45)

    # expected: sum of rows of surviving files, straight off the footers
    expected = 0
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        assert md.num_row_groups == 1  # file grain == row-group grain
        env = {}
        names = md.schema.names
        g = md.row_group(0)
        for ci in range(g.num_columns):
            st = g.column(ci).statistics
            if st is not None:
                env[names[ci]] = (st.min, st.max)
        survives = all(
            not (env[c][1] < lo or env[c][0] > hi)
            for c, (lo, hi) in (("user_id", ubox), ("value", vbox))
        )
        if survives:
            expected += md.num_rows

    back = spark.read.option("recursiveFileLookup", "true").parquet(path)
    aqe_old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        probe = back.filter(
            F.col("user_id").between(*ubox) & F.col("value").between(*vbox)
        ).agg(F.count(F.lit(1)).alias("n"))
        n_match = probe.collect()[0]["n"]
        scanned = _q459_scan_rows(probe)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_old)
    assert scanned == expected, (scanned, expected)
    assert n_match <= scanned
    assert scanned < ev.count() * 0.5, "no real footer pruning happened"
