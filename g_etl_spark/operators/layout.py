"""Data-layout operators: multi-column clustering for scan pruning.

At 100 TB the scan is the dominant cost, and parquet min/max
statistics only prune files/row-groups whose value RANGES are narrow.
A table sorted by one column prunes perfectly on that column and not
at all on any other; Z-ordering (bit-interleaved space-filling curve)
spreads the clustering budget across k columns so a selective
predicate on ANY of them skips most files (≙ Delta/Iceberg
``OPTIMIZE ZORDER BY`` — reproduced here with plain DataFrame ops:
rank → bit-interleave → repartitionByRange → sortWithinPartitions).

The rank step makes the curve DATA-ADAPTIVE (equi-depth, like
Delta's implementation): each column is mapped through its quantile
rank, so skew and scale differences between columns don't collapse
the curve onto one axis.

Verification (tests/test_layout.py) reads the written parquet
footers with pyarrow and asserts the physical property directly:
under Z-order, the fraction of files whose [min, max] envelope
intersects a small k-dim query box is a small multiple of the
perfect-clustering lower bound on EVERY clustered column, where a
single-column sort leaves the other columns unprunable (~100% of
files intersect).
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# 10 bits per column (1024 equi-depth buckets): far more buckets than
# files, so bucket granularity never limits pruning, and 3 columns
# use only 30 of 63 long bits.
ZORDER_BITS = 10


def _interleave(ranks: Sequence[Column], bits: int) -> Column:
    """Bit-interleave k rank columns (already in [0, 2^bits)) into one
    long: bit j of column i lands at position j*k + i. Pure integer
    expressions — JVM-side, whole-stage codegen."""
    k = len(ranks)
    z = F.lit(0).cast("long")
    for j in range(bits):
        for i, r in enumerate(ranks):
            bit = F.shiftright(r, j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, j * k + i))
    return z


def zorder_value(df: DataFrame, cols: Sequence[str], bits: int = ZORDER_BITS) -> DataFrame:
    """Append ``_z``: the equi-depth Z-curve position over ``cols``.

    Each column is rank-normalized to [0, 2^bits) through its
    quantile bucket: bounds come from ``approxQuantile`` (a
    driver-side array of 2^bits - 1 doubles — a sketch, like
    broadcast hyperplanes, NOT a data collect), and the bucket index
    is the count of bounds <= value. No global sort anywhere — the
    quantile sketch is one pass, the mapping is map-side — where a
    percent_rank window would funnel the whole table through a
    single-partition sort. Sketch error only moves bucket EDGES
    (files get slightly uneven), never breaks curve locality.
    """
    if not (1 <= len(cols) <= 3):
        raise ValueError("zorder supports 1-3 columns")
    nb = 1 << bits
    probs = [i / nb for i in range(1, nb)]
    dtypes = dict(df.dtypes)
    out = df
    rank_cols = []
    for c in cols:
        rc = f"_rank_{c}"
        if dtypes.get(c) == "string":
            # Categorical column (e.g. dataset_id): lexical rank over
            # the distinct catalog. The catalog is collected driver-
            # side — valid ONLY for bounded-cardinality dimensions
            # (dataset ids, classes), which is exactly what you
            # cluster on; guarded so a mistaken high-cardinality
            # column fails loudly instead of collecting the table.
            vals = [r[0] for r in out.select(c).distinct().limit(4097).collect()]
            uniq = sorted(v for v in vals if v is not None)
            if len(vals) > 4096:
                raise ValueError(f"zorder string column {c}: cardinality > 4096")
            if not uniq:
                raise ValueError(f"zorder string column {c}: all NULL")
            arr = F.array(*[F.lit(v) for v in uniq])
            # lexical index (NULL → bucket 0); array_position is 1-based
            idx = F.coalesce(F.array_position(arr, F.col(c)), F.lit(1)) - 1
            out = out.withColumn(
                rc, ((idx.cast("long") * (nb - 1)) / F.lit(len(uniq))).cast("long")
            )
            rank_cols.append(rc)
            continue
        bounds = df.approxQuantile(c, probs, 0.001)
        # dedupe: heavy hitters / low-cardinality columns produce
        # repeated bounds -> empty buckets
        uniq = sorted(set(bounds))
        barr = F.array(*[F.lit(float(b)) for b in uniq])
        idx = F.size(F.filter(barr, lambda b: b <= F.col(c).cast("double")))
        # rescale onto the FULL [0, 2^bits) range: a low-cardinality
        # column would otherwise only occupy low bit positions and
        # contribute nothing to the curve's high bits — the other
        # columns would dominate file boundaries and its pruning
        # would silently vanish.
        out = out.withColumn(
            rc, ((idx.cast("long") * (nb - 1)) / F.lit(len(uniq))).cast("long")
        )
        rank_cols.append(rc)
    out = out.withColumn("_z", _interleave([F.col(rc) for rc in rank_cols], bits))
    return out.drop(*rank_cols)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    num_files: int = 32,
) -> None:
    """Write ``df`` as parquet clustered on the Z-curve of ``cols``:
    range-partition by ``_z`` (equal-size files, since the rank is
    equi-depth) and sort within partitions, so every file covers a
    compact curve segment — narrow min/max envelopes on ALL ``cols``
    at once. The ``_z`` helper column is dropped from the output;
    the layout, not an extra column, carries the benefit.
    """
    z = zorder_value(df, cols)
    (
        z.repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_stats(path: str, cols: Sequence[str]) -> list[dict]:
    """Per-file min/max envelopes for ``cols``, read from the parquet
    footers with pyarrow (no Spark job) — the same statistics a
    scan's pruning consults. Returns one dict per file:
    ``{col: (min, max), ...}``."""
    import pyarrow.parquet as pq
    import os

    out = []
    # skip hidden/_temporary/_spark_metadata trees: an interrupted
    # write's leftovers must not silently join the envelope list
    def _walk(p):
        for root, dirs, names in os.walk(p):
            dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
            for name in names:
                if name.endswith(".parquet") and not name.startswith((".", "_")):
                    yield os.path.join(root, name)

    files = sorted(_walk(path))
    for fpath in files:
        md = pq.ParquetFile(fpath).metadata
        schema_names = md.schema.names
        env: dict = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                cname = schema_names[ci]
                if cname not in cols or col.statistics is None:
                    continue
                lo, hi = col.statistics.min, col.statistics.max
                if cname in env:
                    plo, phi = env[cname]
                    env[cname] = (min(plo, lo), max(phi, hi))
                else:
                    env[cname] = (lo, hi)
        out.append(env)
    return out


def files_pruned_fraction(
    stats: list[dict], predicates: dict[str, tuple[float, float]]
) -> float:
    """Fraction of files a min/max-pruning scan SKIPS for a
    conjunctive box predicate {col: (lo, hi)} — a file survives only
    if every predicate interval intersects its envelope."""
    if not stats:
        return 0.0
    kept = 0
    for env in stats:
        ok = True
        for c, (lo, hi) in predicates.items():
            if c not in env:
                ok = False
                break
            flo, fhi = env[c]
            if fhi < lo or flo > hi:
                ok = False
                break
        if ok:
            kept += 1
    return 1.0 - kept / len(stats)
