"""Reusable statistics operators — the experimentation/eval ring as a
first-class API (the r8-verdict item #4: these lived as inline query
bodies; a real user wants `bh_fdr(df, "p")` the way they can call
`operators/ranking.global_ntile_twopass`).

Every operator is a relational re-expression of a classic statistic
with the engine-parity disciplines the oracle gate enforces
(integer/decimal moment cells, display-precision rounding before any
comparison that feeds a boolean), so the qNN queries that now wrap
them keep their DuckDB hash-parity unchanged:

- `welch_z_test`           per-group two-sample Welch z (q150/q294)
- `welch_z_from_moments`   the closed-form z from integer moment
                           cells (q294/q308 share this formula)
- `bh_fdr`                 Benjamini-Hochberg step-up FDR (q308)
- `two_factor_anova`       factorial SS decomposition + F (q317)
- `cohens_kappa`           2x2 inter-rater agreement (q303)
- `spearman_pearson`       tie-corrected midrank Spearman next to
                           Pearson from one moment pass (q315)

Scale contracts are per-operator (see docstrings): the group
aggregations are combining map-side rollups; `bh_fdr`'s global rank
runs on the bounded TEST relation (|tests| rows — the q243
bounded-window contract), never on corpus rows; `spearman_pearson`
routes its value-rollup prefix sums through the operators/ranking
size-aware dispatch.

No analog in the reference corpus (/root/reference ships no
statistics surface); formulas are textbook (A&S erfc polynomial for
normal tails; Landis & Koch kappa; Mann-Whitney midranks).
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

# Abramowitz & Stegun 7.1.26 erfc polynomial — literal constants in
# both engines (neither Spark SQL nor DuckDB ships erf); max abs
# error 1.5e-7, and every consumer rounds p to 8 decimals before any
# comparison so the boundary is engine-exact.
AS_P = 0.3275911
AS_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
SQRT2 = 1.4142135623730951


def ptail_sql(zcol: str) -> str:
    """SQL for the two-sided normal p-value 2(1−Φ(|z|)) = erfc(|z|/√2)
    via the A&S polynomial — one string usable verbatim in Spark
    `F.expr` AND in a DuckDB oracle, which is how cross-engine p-value
    parity is achieved."""
    x = f"(abs({zcol}) / {SQRT2})"
    t = f"(1.0 / (1.0 + {AS_P} * {x}))"
    poly = " + ".join(f"({a}) * pow({t}, {i + 1})" for i, a in enumerate(AS_A))
    return f"(({poly}) * exp(-({x}) * ({x})))"


def welch_z_from_moments(
    n1: Column, s1: Column, ss1: Column, n0: Column, s0: Column, ss0: Column
) -> Column:
    """Welch z from the six mergeable moment cells of two arms
    (count, sum, sum-of-squares — integers or exact decimals at the
    caller's discretion): z = (m1−m0)/√(v1/n1 + v0/n0) with
    v = (ss − s²/n)/(n−1). This is the exact expression q294/q308
    inline; centralizing it keeps every A/B readout's z bit-identical
    across the family."""
    d = lambda c: c.cast("double")  # noqa: E731
    return (d(s1) / n1 - d(s0) / n0) / F.sqrt(
        (d(ss1) - d(s1) * s1 / n1) / (n1 - 1) / n1
        + (d(ss0) - d(s0) * s0 / n0) / (n0 - 1) / n0
    )


def welch_z_test(
    df: DataFrame,
    group_cols: Sequence[str],
    treat: Column,
    value: Column,
    crit: float = 1.96,
) -> DataFrame:
    """Per-group two-sample Welch z-test (q150's shape): `treat` is a
    boolean Column splitting rows into treatment/control, `value` the
    outcome. Returns one row per group with
    (n_control, n_treat, mean_control, mean_treat, z_score,
    significant).

    Scale: ALL eight statistics come from ONE conditional aggregate
    over one scan — mean/variance are mergeable moments, the exchange
    carries |groups| rows. NULL discipline: each n counts non-NULL
    values in its arm (the same population avg/var_samp describe), so
    a NULL can never diverge the arms. The verdict compares the
    ROUNDED |z| to `crit` so a summation-order ulp can't flip the
    boolean cross-engine."""
    cv = F.when(~treat, value)
    tv = F.when(treat, value)
    n_c, n_t = F.count(cv), F.count(tv)
    m_c, m_t = F.avg(cv), F.avg(tv)
    z = F.round(
        (m_t - m_c) / F.sqrt(F.var_samp(tv) / n_t + F.var_samp(cv) / n_c), 4
    )
    return (
        df.groupBy(*group_cols)
        .agg(
            n_c.alias("n_control"),
            n_t.alias("n_treat"),
            F.round(m_c, 4).alias("mean_control"),
            F.round(m_t, 4).alias("mean_treat"),
            z.alias("z_score"),
            (F.abs(z) > crit).alias("significant"),
        )
        .orderBy(*group_cols)
    )


def bh_fdr(
    df: DataFrame,
    p_col: str = "p",
    q: float = 0.05,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Benjamini-Hochberg step-up FDR correction over a relation of
    test results (q308's shape): ranks p ascending (ties broken by
    `tiebreak_cols` so the rank is deterministic), finds
    k = max{i : p_(i) ≤ i·q/m}, and flags ranks ≤ k. Adds columns
    (p_rank, bh_cutoff, rejected_bh) to the input.

    CONTRACT: `df` is the bounded TEST relation (one row per
    hypothesis — |tests| rows, q243 bounded-window contract), so the
    global rank window is safe; never hand this corpus rows. All
    comparisons run on p ROUNDED to 8 decimals (the caller should
    round `p_col` identically) and a cutoff rounded to 8 decimals, so
    the accept/reject boundary is engine-exact."""
    wr = Window.orderBy(F.asc(p_col), *[F.asc(c) for c in tiebreak_cols])
    ranked = df.select(
        "*",
        F.row_number().over(wr).cast("long").alias("p_rank"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("__m"),
    )
    kmax = ranked.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col(p_col)
                    <= F.round(F.col("p_rank") * q / F.col("__m"), 8),
                    F.col("p_rank"),
                )
            ),
            F.lit(0),
        ).alias("__k")
    )
    return (
        ranked.crossJoin(F.broadcast(kmax))
        .withColumn("bh_cutoff", F.round(F.col("p_rank") * q / F.col("__m"), 8))
        .withColumn("rejected_bh", F.col("p_rank") <= F.col("__k"))
        .drop("__m", "__k")
    )


def two_factor_anova(
    df: DataFrame,
    a: str,
    b: str,
    y: str,
    label_a: str | None = None,
    label_b: str | None = None,
    label_ab: str = "AB(interaction)",
) -> DataFrame:
    """Two-factor ANOVA with interaction from integer moment cells
    (q317's shape): `y` MUST be an integer-quantized outcome column
    (whole units — the caller picks the quantum) so the sums of
    squares are engine-exact. Returns the classic 5-row table
    (source, ss, df, ms, f_ratio) for A, B, AB, within, total via the
    marginal identity SS = Σ s²/n − S²/N; every cross-level sum is
    quantized to integer hundredths first (the q301 discipline).

    Row labels derive from the factor column names by default
    (`A(<a>)` / `B(<b>)`) — callers with domain labels pass them
    explicitly (q317 keeps its oracle's 'A(treatment)'/'B(segment)';
    r9 ADVICE item #4: the first-class API must not hardcode one
    query's labels). Labels land in SQL literals, so embedded quotes
    are escaped.

    Scale: ONE combining agg to |A×B| cells; marginals and the five
    output rows are arithmetic on that bounded relation."""
    def _lit(s: str) -> str:
        # Spark's default SQL parser treats backslash as an escape
        # inside string literals — escape it BEFORE doubling quotes
        return s.replace("\\", "\\\\").replace("'", "''")

    la = _lit(label_a if label_a is not None else f"A({a})")
    lb = _lit(label_b if label_b is not None else f"B({b})")
    lab = _lit(label_ab)
    cells = df.groupBy(F.col(a).alias("a"), F.col(b).alias("b")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(y).cast("long").alias("s"),
        F.sum(F.col(y) * F.col(y)).cast("long").alias("ssq"),
    )
    qterm = F.round(
        F.col("s").cast("double") * F.col("s") / F.col("n") * 100, 0
    ).cast("long")
    lvl = cells.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("s").cast("double").alias("stot"),
        F.sum("ssq").cast("double").alias("ssq_tot"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.countDistinct("a").alias("ka"),
        F.countDistinct("b").alias("kb"),
        (F.sum(qterm).cast("double") / 100.0).alias("cell_term"),
    )

    def marg(col: str, out: str):
        g = cells.groupBy(col).agg(
            F.sum("s").cast("long").alias("s"), F.sum("n").cast("long").alias("n")
        )
        return g.agg((F.sum(qterm).cast("double") / 100.0).alias(out))

    ss = (
        lvl.crossJoin(F.broadcast(marg("a", "a_term")))
        .crossJoin(F.broadcast(marg("b", "b_term")))
        .select(
            "nn",
            (F.col("ka") - 1).cast("long").alias("df_a"),
            (F.col("kb") - 1).cast("long").alias("df_b"),
            ((F.col("ka") - 1) * (F.col("kb") - 1)).cast("long").alias("df_ab"),
            (F.col("nn") - F.col("n_cells")).cast("long").alias("df_w"),
            (F.col("nn") - 1).cast("long").alias("df_t"),
            (F.col("a_term") - F.col("stot") * F.col("stot") / F.col("nn")).alias(
                "ss_a"
            ),
            (F.col("b_term") - F.col("stot") * F.col("stot") / F.col("nn")).alias(
                "ss_b"
            ),
            (
                F.col("cell_term")
                - F.col("a_term")
                - F.col("b_term")
                + F.col("stot") * F.col("stot") / F.col("nn")
            ).alias("ss_ab"),
            (F.col("ssq_tot") - F.col("cell_term")).alias("ss_w"),
            (F.col("ssq_tot") - F.col("stot") * F.col("stot") / F.col("nn")).alias(
                "ss_t"
            ),
        )
    )
    parts = ", ".join(
        [
            f"'{la}', round(ss_a, 2), df_a, round(ss_a / df_a, 4),"
            " round((ss_a / df_a) / (ss_w / df_w), 4)",
            f"'{lb}', round(ss_b, 2), df_b, round(ss_b / df_b, 4),"
            " round((ss_b / df_b) / (ss_w / df_w), 4)",
            f"'{lab}', round(ss_ab, 2), df_ab, round(ss_ab / df_ab, 4),"
            " round((ss_ab / df_ab) / (ss_w / df_w), 4)",
            "'within', round(ss_w, 2), df_w, round(ss_w / df_w, 4),"
            " CAST(NULL AS DOUBLE)",
            "'total', round(ss_t, 2), df_t, CAST(NULL AS DOUBLE),"
            " CAST(NULL AS DOUBLE)",
        ]
    )
    return ss.select(
        F.expr(f"stack(5, {parts}) AS (source, ss, df, ms, f_ratio)")
    ).orderBy("source")


def cohens_kappa(df: DataFrame, a: str, b: str) -> DataFrame:
    """Cohen's kappa between two binary raters (q303's shape): `a`
    and `b` are 0/1 integer label columns. Returns ONE row with the
    exact 2x2 confusion (n, n11, n10, n01, n00) and
    (p_observed, p_expected, kappa) — κ = (p_o − p_e)/(1 − p_e).

    Scale: ONE combining agg to a single row; the plan is
    scan → project → agg, no shuffle beyond the 1-row exchange."""
    conf = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(a) * F.col(b)).cast("long").alias("n11"),
        F.sum(F.col(a) * (1 - F.col(b))).cast("long").alias("n10"),
        F.sum((1 - F.col(a)) * F.col(b)).cast("long").alias("n01"),
        F.sum((1 - F.col(a)) * (1 - F.col(b))).cast("long").alias("n00"),
    )
    po = (F.col("n11") + F.col("n00")).cast("double") / F.col("n")
    pe = (
        (F.col("n11") + F.col("n10")).cast("double") * (F.col("n11") + F.col("n01"))
        + (F.col("n01") + F.col("n00")).cast("double") * (F.col("n10") + F.col("n00"))
    ) / (F.col("n").cast("double") * F.col("n"))
    return conf.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.round(po, 6).alias("p_observed"),
        F.round(pe, 6).alias("p_expected"),
        F.round((po - pe) / (1.0 - pe), 6).alias("kappa"),
    )


def kfold_cv_ols(df: DataFrame) -> DataFrame:
    """K-fold cross-validation of an OLS trend WITHOUT retraining
    (q302's shape): `df` must carry integer columns (fold, x, y_c) —
    fold a small integer fold id, x the regressor, y_c the outcome in
    integer cents. Per-fold moment cells subtract from the totals to
    give each leave-fold-out model in closed form (train = total −
    fold, zero extra scans); ONE |folds|-row broadcast fan-out scores
    every row against every model. Returns one row per fold with
    (n_train, n_test, beta_cents_per_day, intercept_dollars,
    train_rmse_dollars, test_rmse_dollars, generalization_gap).

    Moment products and sums run in decimal(38,0) with an operand
    cast before each multiply; residuals are quantized to whole
    dollars per ROW and summed as integers, so every readout is
    engine-order-exact.

    Scale: one combining agg to |folds| moment cells + one broadcast
    scoring pass — no shuffle grows with the model count."""
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    fm = df.groupBy("fold").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("y_c"))).alias("sy"),
        F.sum(dec(F.col("x")) * F.col("y_c")).alias("sxy"),
        F.sum(dec(F.col("x")) * F.col("x")).alias("sxx"),
    )
    tm = fm.agg(
        F.sum("n").cast("long").alias("tn"),
        F.sum("sx").alias("tsx"),
        F.sum("sy").alias("tsy"),
        F.sum("sxy").alias("tsxy"),
        F.sum("sxx").alias("tsxx"),
    )
    d = lambda c: c.cast("double")  # noqa: E731
    models = fm.crossJoin(F.broadcast(tm)).select(
        "fold",
        (F.col("tn") - F.col("n")).cast("long").alias("n_train"),
        (
            (
                d(F.col("tn") - F.col("n")) * d(F.col("tsxy") - F.col("sxy"))
                - d(F.col("tsx") - F.col("sx")) * d(F.col("tsy") - F.col("sy"))
            )
            / (
                d(F.col("tn") - F.col("n")) * d(F.col("tsxx") - F.col("sxx"))
                - d(F.col("tsx") - F.col("sx")) * d(F.col("tsx") - F.col("sx"))
            )
        ).alias("b"),
        (d(F.col("tsy") - F.col("sy")) / d(F.col("tn") - F.col("n"))).alias("ybar"),
        (d(F.col("tsx") - F.col("sx")) / d(F.col("tn") - F.col("n"))).alias("xbar"),
    )
    scored = df.crossJoin(
        F.broadcast(models.withColumnRenamed("fold", "model_fold"))
    ).select(
        F.col("fold").alias("row_fold"),
        "model_fold",
        F.round(
            (
                F.col("y_c")
                - (F.col("ybar") - F.col("b") * F.col("xbar"))
                - F.col("b") * F.col("x")
            )
            / 100.0,
            0,
        )
        .cast("long")
        .alias("r_d"),
    )
    evald = scored.groupBy(F.col("model_fold").alias("fold")).agg(
        F.sum(F.when(F.col("row_fold") == F.col("model_fold"), 1).otherwise(0))
        .cast("long")
        .alias("n_test"),
        F.sum(
            F.when(
                F.col("row_fold") == F.col("model_fold"),
                F.col("r_d").cast("decimal(38,0)") * F.col("r_d"),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("sse_test"),
        F.sum(
            F.when(
                F.col("row_fold") != F.col("model_fold"),
                F.col("r_d").cast("decimal(38,0)") * F.col("r_d"),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("sse_train"),
    )
    train_rmse = F.sqrt(F.col("sse_train").cast("double") / F.col("n_train"))
    test_rmse = F.sqrt(F.col("sse_test").cast("double") / F.col("n_test"))
    return (
        evald.join(F.broadcast(models), "fold")
        .select(
            "fold",
            "n_train",
            "n_test",
            F.round("b", 6).alias("beta_cents_per_day"),
            F.round((F.col("ybar") - F.col("b") * F.col("xbar")) / 100.0, 4).alias(
                "intercept_dollars"
            ),
            F.round(train_rmse, 4).alias("train_rmse_dollars"),
            F.round(test_rmse, 4).alias("test_rmse_dollars"),
            F.round(test_rmse - train_rmse, 4).alias("generalization_gap"),
        )
        .orderBy("fold")
    )


def spearman_pearson(
    df: DataFrame,
    x: str = "x",
    y: str = "y",
    threshold_rows: int | None = None,
) -> DataFrame:
    """Tie-corrected Spearman rank correlation (midrank convention)
    next to plain Pearson r, from one moment pass (q315's shape):
    `x`/`y` MUST be integer-quantized value columns (the caller picks
    the quantum) so the midranks are exact. Returns ONE row
    (n, spearman_rho, pearson_r).

    Midranks come from the collapsed-value prefix-sum trick: per
    distinct value, 2·midrank = 2·(count of smaller rows) + count + 1
    is an exact INTEGER (the doubled ranks cancel in the
    correlation). Moment products cast an operand to decimal(38,0)
    BEFORE multiplying so nothing wraps at any row count.

    Scale: two value rollups (map-side combining), two equi-joins to
    map rows to midranks, ONE moment aggregate; the rollup prefix
    sums run the operators/ranking size-aware dispatch via
    `threshold_rows`. The operator is SYMMETRIC in x and y: neither
    midrank map carries a broadcast hint (a hinted broadcast of a
    high-NDV column's map — price has ndv ≈ rows — would OOM the
    driver instead of falling back; r9 ADVICE item #3). AQE
    broadcasts either side at runtime when it actually fits."""
    from g_etl_spark.operators.ranking import global_cumsum_twopass, log2_bucket

    rows_v = df.select(F.col(x).alias("x"), F.col(y).alias("y"))

    def midrank_map(col: str):
        counts = rows_v.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        pri = global_cumsum_twopass(
            counts,
            "cnt",
            [col],
            log2_bucket(F.col(col)),
            out="prior",
            inclusive=False,
            threshold_rows=threshold_rows,
        )
        return pri.select(
            col, (2 * F.col("prior") + F.col("cnt") + 1).cast("long").alias("r2")
        )

    ranked = rows_v.join(
        midrank_map("x").withColumnRenamed("r2", "rx"), "x"
    ).join(midrank_map("y").withColumnRenamed("r2", "ry"), "y")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    mo = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dec(F.col("rx"))).cast("double").alias("sx"),
        F.sum(dec(F.col("ry"))).cast("double").alias("sy"),
        F.sum(dec(F.col("rx")) * F.col("ry")).cast("double").alias("sxy"),
        F.sum(dec(F.col("rx")) * F.col("rx")).cast("double").alias("sxx"),
        F.sum(dec(F.col("ry")) * F.col("ry")).cast("double").alias("syy"),
        F.sum(dec(F.col("x"))).cast("double").alias("px"),
        F.sum(dec(F.col("y"))).cast("double").alias("py"),
        F.sum(dec(F.col("x")) * F.col("y")).cast("double").alias("pxy"),
        F.sum(dec(F.col("x")) * F.col("x")).cast("double").alias("pxx"),
        F.sum(dec(F.col("y")) * F.col("y")).cast("double").alias("pyy"),
    )
    n = F.col("n")
    return mo.select(
        n.cast("long").alias("n"),
        F.round(
            (n * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt(
                (n * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (n * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("spearman_rho"),
        F.round(
            (n * F.col("pxy") - F.col("px") * F.col("py"))
            / F.sqrt(
                (n * F.col("pxx") - F.col("px") * F.col("px"))
                * (n * F.col("pyy") - F.col("py") * F.col("py"))
            ),
            6,
        ).alias("pearson_r"),
    )
