"""Scale-safe exact global ranking primitives.

A global `row_number()/ntile()` (`Window.orderBy` with no partition
spec) serializes the whole relation through ONE partition — the
WindowExec "No Partition Defined" defect the round-5/6 verdicts track.
These helpers produce the SAME numbers with every WindowExec
partitioned, using the q198 two-pass recipe generalized:

pass 1  bucket rows by a caller-supplied expression that is monotone
        non-decreasing in the leading sort key, count rows per bucket,
        and turn those ~|buckets| counts into per-bucket prefix
        OFFSETS via a triangular broadcast join (window-free);
pass 2  rank WITHIN each bucket (a partitioned window) and add the
        bucket's offset — monotonicity makes offset + local rank
        identical to the global rank at every row.

Bucket choice is the one knob: it must be monotone in the first
order column (ties in the sort key always share a bucket, so the
within-bucket tiebreak still sees them together) and should yield
enough buckets to spread the sort. `log2_bucket` covers unbounded
non-negative doubles with a bounded bucket count at any corpus size;
day-of-timestamp (q198/q238) covers event time.

Size-aware dispatch (round-9): the two-pass pays ~3 extra exchanges,
and the round-8 probe measured it LOSING 3-4× on relations that
collapse small (~500k rows — q177's distinct-score shape). Passing
`threshold_rows=TWOPASS_CROSSOVER_ROWS` makes each operator probe the
relation size with an early-stopping limit(n+1).count() and fall back
to the plain single-partition window below the crossover — the
numbers are identical on both paths, only the physical plan changes.
Callers whose ranked relation is ALWAYS corpus-sized (q193/q191/q179)
omit it and keep the unconditional two-pass; callers whose relation
collapses to a bounded value-rollup (q177, q315's midrank maps) pass
it so small inputs keep the cheap plan.

CONTRACT: the leading order column must be non-NULL. A NULL sort key
would land in a NULL bucket that the triangular offset join cannot
order against the real buckets, silently colliding its ranks with
the first bucket's. Every current caller (q238/q240/q273/q281/q285)
ranks a non-nullable derived key; filter or coalesce NULLs first if
a future caller cannot guarantee that.

No analog in the reference corpus (DuckDB runs window functions
single-node; /root/reference has no distributed-ranking surface) —
this is the Spark-native scale path for the same SQL semantics.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

# Measured two-pass crossover (SCALE_NOTES round-8 probe, q177's
# collapsed ~500k-distinct-score shape at ×100): the single-partition
# window took 2.97 s where the two-pass took 11.17 s — the two-pass
# pays ~3 extra exchanges that only amortize on relations that STAY
# corpus-sized. Below this many rows, one partition sorting the whole
# relation is both safe (it fits) and ~3-4× cheaper.
TWOPASS_CROSSOVER_ROWS = 500_000


def _dispatch(
    df: DataFrame, threshold_rows: int | None
) -> tuple[DataFrame, bool]:
    """Size-aware dispatch probe. Returns (df, take_plain_window).

    When a threshold is set, the input is persisted (MEMORY_AND_DISK)
    BEFORE the probe so the probe's materialization feeds the chosen
    plan instead of recomputing the caller's rollup lineage — and the
    probe cache is RELEASED before returning (r9 ADVICE: each
    construction used to leave a session-lifetime cache entry, so
    gate/bench sessions running hundreds of queries accumulated
    unbounded cache/disk):

    - small: the limit(n+1) probe computed and cached the whole
      (bounded ≤ threshold) relation; it is eagerly localCheckpointed
      FROM that cache (one cheap cache read, lineage truncated) and
      the cache entry dropped. Checkpoint blocks are RDD-scoped, so
      the ContextCleaner reclaims them when the result goes out of
      scope — nothing outlives its query.
    - large: the cache entry is dropped immediately; the partial
      partitions the early-stopping probe touched were marginal to
      the two-pass (which rescans the full lineage anyway).
    """
    if threshold_rows is None:
        return df, False
    from pyspark import StorageLevel

    cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    small = cached.limit(threshold_rows + 1).count() <= threshold_rows
    if small:
        out = cached.localCheckpoint(eager=True)
        cached.unpersist()
        return out, True
    cached.unpersist()
    return df, False


def log2_bucket(col: Column, steps_per_octave: int = 4) -> Column:
    """Monotone bucket for non-negative doubles with a bounded bucket
    count at any scale (~64·steps buckets over the double range).
    Negative inputs clamp into the lowest bucket — still monotone."""
    return F.floor(F.log2(F.greatest(col, F.lit(0.0)) + 1) * steps_per_octave).cast(
        "long"
    )


def global_rank_twopass(
    df: DataFrame,
    order_cols: Sequence[str],
    bucket: Column,
    out: str = "rank",
    threshold_rows: int | None = None,
) -> DataFrame:
    """Exact 1-based global row_number over `order_cols` (ascending)
    with no single-partition WindowExec. `bucket` must be monotone
    non-decreasing in the leading order column.

    `threshold_rows` (e.g. `TWOPASS_CROSSOVER_ROWS`) enables the
    size-aware dispatch: relations at or under it run the plain
    single-partition window, which the round-8 probe measured 3-4×
    cheaper on collapsed-small relations. Same numbers either way —
    only the physical plan changes."""
    df, small = _dispatch(df, threshold_rows)
    if small:
        w = Window.orderBy(*[F.asc(c) for c in order_cols])
        return df.withColumn(out, F.row_number().over(w).cast("long"))
    b = df.withColumn("__b", bucket)
    counts = b.groupBy("__b").agg(F.count(F.lit(1)).alias("__c"))
    x, y = counts.alias("x"), counts.alias("y")
    offsets = (
        x.join(F.broadcast(y), F.col("y.__b") < F.col("x.__b"), "left")
        .groupBy(F.col("x.__b").alias("__b"))
        .agg(F.coalesce(F.sum("y.__c"), F.lit(0)).alias("__off"))
    )
    w = Window.partitionBy("__b").orderBy(*[F.asc(c) for c in order_cols])
    return (
        b.join(F.broadcast(offsets), "__b")
        .withColumn(out, (F.row_number().over(w) + F.col("__off")).cast("long"))
        .drop("__b", "__off")
    )


def global_cumsum_twopass(
    df: DataFrame,
    value: str,
    order_cols: Sequence[str],
    bucket: Column,
    out: str = "cum",
    inclusive: bool = True,
    threshold_rows: int | None = None,
) -> DataFrame:
    """Exact global cumulative SUM of `value` over `order_cols`
    (ascending) with no single-partition WindowExec — the prefix-sum
    sibling of `global_rank_twopass` (rank is the special case
    value≡1). Same bucket contract: monotone non-decreasing in the
    leading order column, leading key non-NULL. `inclusive=False`
    gives the `ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING`
    frame (0 on each bucket's first row). `threshold_rows` enables
    the size-aware dispatch (see `global_rank_twopass`)."""
    df, small = _dispatch(df, threshold_rows)
    if small:
        w = Window.orderBy(*[F.asc(c) for c in order_cols]).rowsBetween(
            Window.unboundedPreceding, 0 if inclusive else -1
        )
        return df.withColumn(
            out, F.coalesce(F.sum(value).over(w), F.lit(0))
        )
    b = df.withColumn("__b", bucket)
    sums = b.groupBy("__b").agg(F.sum(value).alias("__s"))
    x, y = sums.alias("x"), sums.alias("y")
    offsets = (
        x.join(F.broadcast(y), F.col("y.__b") < F.col("x.__b"), "left")
        .groupBy(F.col("x.__b").alias("__b"))
        .agg(F.coalesce(F.sum("y.__s"), F.lit(0)).alias("__off"))
    )
    w = (
        Window.partitionBy("__b")
        .orderBy(*[F.asc(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, 0 if inclusive else -1)
    )
    return (
        b.join(F.broadcast(offsets), "__b")
        .withColumn(
            out,
            F.coalesce(F.sum(value).over(w), F.lit(0)) + F.col("__off"),
        )
        .drop("__b", "__off")
    )


def global_ntile_twopass(
    df: DataFrame,
    n_tiles: int,
    order_cols: Sequence[str],
    bucket: Column,
    out: str = "tile",
    threshold_rows: int | None = None,
) -> DataFrame:
    """Exact `ntile(n_tiles) OVER (ORDER BY order_cols)` — identical
    to Spark's and DuckDB's NTile (with n rows, the first n % k tiles
    get ceil(n/k) rows, the rest floor(n/k)) — built from the
    two-pass global rank, so every WindowExec stays partitioned. The
    row count enters as a broadcast 1-row relation, not a driver
    collect. `threshold_rows` enables the size-aware dispatch (see
    `global_rank_twopass`)."""
    df, small = _dispatch(df, threshold_rows)
    if small:
        w = Window.orderBy(*[F.asc(c) for c in order_cols])
        return df.withColumn(out, F.ntile(int(n_tiles)).over(w).cast("long"))
    ranked = global_rank_twopass(df, order_cols, bucket, out="__r")
    tot = df.agg(F.count(F.lit(1)).alias("__n"))
    k = int(n_tiles)
    # rank r (1..n) -> tile, all integer-exact; greatest(..,1) guards
    # the n < k case, where the first branch always fires anyway
    tile = F.expr(
        f"CAST(CASE WHEN __r <= (__n % {k}) * (__n div {k} + 1) "
        f"THEN (__r - 1) div (__n div {k} + 1) + 1 "
        f"ELSE (__n % {k}) "
        f"+ (__r - (__n % {k}) * (__n div {k} + 1) - 1) div greatest(__n div {k}, 1) "
        f"+ 1 END AS BIGINT)"
    )
    return (
        ranked.join(F.broadcast(tot), how="cross")
        .withColumn(out, tile)
        .drop("__r", "__n")
    )
