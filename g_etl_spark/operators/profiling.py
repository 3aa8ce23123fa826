"""ANALYZE-style column profiling — the statistics pass an engine
runs before planning (ndv feeds join-strategy choice, null fractions
feed skew decisions, min/max feed zone maps / partition pruning).

One job, two shapes:

- `profile_columns(df, kinds)` → one row per column with
  (n, n_null, ndv, min/max, avg_len).  The n/n_null/min/max side is
  a SINGLE wide aggregate over one scan (all columns at once,
  map-side combining).  The exact multi-column COUNT(DISTINCT) side
  expands the scan |cols|-fold (Spark's Expand); at 100 TB swap
  `exact_ndv=False` to use approx_count_distinct (HyperLogLog++,
  one pass, mergeable) — the oracle-gated query keeps exact so both
  engines agree bit-for-bit.

The reference ships table stats only implicitly (DuckDB's internal
ANALYZE); this surfaces them as a first-class relational operator.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# column kind → which stat slots it fills
NUMERIC = "numeric"
STRING = "string"
TIMESTAMP = "timestamp"


def profile_columns(
    df: DataFrame, kinds: dict[str, str], exact_ndv: bool = True
) -> DataFrame:
    """Profile `kinds.keys()` columns of `df`; one output row per
    column: (column_name, n, n_null, ndv, min_num, max_num, min_str,
    max_str, avg_len).  Numeric slots are NULL for string columns and
    vice versa; timestamps profile as epoch seconds in the numeric
    slots.  `exact_ndv=False` switches to approx_count_distinct for
    the 100 TB path (no Expand, mergeable sketches)."""
    aggs = []
    ndv = F.countDistinct if exact_ndv else F.approx_count_distinct
    # alias suffixes are POSITIONAL (i), never the raw column name —
    # a name containing a quote/backtick/dot/space would break the
    # generated stack() SQL and the later column references (r8
    # ADVICE); df[c] (not F.col) resolves names with dots literally
    names = list(kinds)
    for i, c in enumerate(names):
        kind = kinds[c]
        # explicit backtick quoting (doubled inner backticks) so
        # dots/spaces/quotes/backticks in the name resolve literally
        col = F.col("`" + c.replace("`", "``") + "`")
        num = (
            col.cast("double")
            if kind == NUMERIC
            else (F.unix_timestamp(col).cast("double") if kind == TIMESTAMP else None)
        )
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{i}"),
            F.sum(F.when(col.isNull(), 1).otherwise(0)).cast("long").alias(f"__nn_{i}"),
            ndv(col).cast("long").alias(f"__ndv_{i}"),
            (F.min(num) if num is not None else F.lit(None).cast("double")).alias(
                f"__mn_{i}"
            ),
            (F.max(num) if num is not None else F.lit(None).cast("double")).alias(
                f"__mx_{i}"
            ),
            (F.min(col) if kind == STRING else F.lit(None).cast("string")).alias(
                f"__ms_{i}"
            ),
            (F.max(col) if kind == STRING else F.lit(None).cast("string")).alias(
                f"__xs_{i}"
            ),
            (
                F.avg(F.length(col))
                if kind == STRING
                else F.lit(None).cast("double")
            ).alias(f"__al_{i}"),
        ]
    wide = df.agg(*aggs)
    # 1-row wide result → |cols| rows via stack (driver-free pivot);
    # column-name literals are escaped for the SQL string
    esc = lambda s: s.replace("\\", "\\\\").replace("'", "\\'")  # noqa: E731
    parts = ", ".join(
        f"'{esc(c)}', __n_{i}, __nn_{i}, __ndv_{i}, __mn_{i}, __mx_{i},"
        f" __ms_{i}, __xs_{i}, __al_{i}"
        for i, c in enumerate(names)
    )
    return wide.select(
        F.expr(
            f"stack({len(kinds)}, {parts}) AS "
            "(column_name, n, n_null, ndv, min_num, max_num,"
            " min_str, max_str, avg_len)"
        )
    ).select(
        "column_name",
        F.col("n").cast("long").alias("n"),
        "n_null",
        "ndv",
        F.round("min_num", 4).alias("min_num"),
        F.round("max_num", 4).alias("max_num"),
        "min_str",
        "max_str",
        F.round("avg_len", 4).alias("avg_len"),
    )
