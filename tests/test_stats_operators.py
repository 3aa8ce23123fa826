"""Unit tests for operators/stats — the promoted experimentation ring
(r8 verdict item #4). The qNN oracle rows pin cross-engine parity;
these pin the STATISTICS against hand-computed fixtures so the
operators are safe to call outside the registry."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from g_etl_spark.operators.stats import (
    bh_fdr,
    cohens_kappa,
    kfold_cv_ols,
    spearman_pearson,
    two_factor_anova,
    welch_z_from_moments,
    welch_z_test,
)


def test_welch_z_test_hand_computed(spark):
    # control {1,2,3} (mean 2, var 1), treat {4,6} (mean 5, var 2)
    # z = 3 / sqrt(2/2 + 1/3) = 3 / sqrt(4/3)
    df = spark.createDataFrame(
        [(0, 1.0), (0, 2.0), (0, 3.0), (1, 4.0), (1, 6.0)],
        "arm int, value double",
    ).withColumn("g", F.lit("g1"))
    row = welch_z_test(df, ["g"], F.col("arm") == 1, F.col("value")).collect()[0]
    assert row["n_control"] == 3 and row["n_treat"] == 2
    assert row["mean_control"] == 2.0 and row["mean_treat"] == 5.0
    assert abs(row["z_score"] - round(3 / math.sqrt(4 / 3), 4)) < 1e-9
    assert bool(row["significant"]) is True


def test_welch_z_from_moments_matches_definition(spark):
    # same arms as above, via integer moment cells
    df = spark.createDataFrame(
        [(2, 10, 52, 3, 6, 14)], "n1 long, s1 long, ss1 long, n0 long, s0 long, ss0 long"
    )
    z = df.select(
        welch_z_from_moments(
            F.col("n1"), F.col("s1"), F.col("ss1"),
            F.col("n0"), F.col("s0"), F.col("ss0"),
        ).alias("z")
    ).collect()[0]["z"]
    # treat {4,6}: n=2 s=10 ss=52; control {1,2,3}: n=3 s=6 ss=14
    assert abs(z - 3 / math.sqrt(4 / 3)) < 1e-12


def test_bh_fdr_textbook_example(spark):
    # classic: m=5, q=0.25; sorted p = .01 .04 .10 .30 .50
    # cutoffs   .05 .10 .15 .20 .25 -> k = 3 (p3=.10 <= .15)
    df = spark.createDataFrame(
        [("t1", 0.10), ("t2", 0.01), ("t3", 0.50), ("t4", 0.04), ("t5", 0.30)],
        "test string, p double",
    )
    rows = {r["test"]: r for r in bh_fdr(df, "p", q=0.25, tiebreak_cols=["test"]).collect()}
    assert [rows[t]["rejected_bh"] for t in ("t1", "t2", "t3", "t4", "t5")] == [
        True, True, False, True, False,
    ]
    assert rows["t2"]["p_rank"] == 1 and rows["t3"]["p_rank"] == 5
    assert abs(rows["t2"]["bh_cutoff"] - 0.05) < 1e-12


def test_bh_fdr_rejects_nothing_on_uniform_high_p(spark):
    df = spark.createDataFrame(
        [(f"t{i}", 0.5 + i * 0.05) for i in range(8)], "test string, p double"
    )
    out = bh_fdr(df, "p", q=0.05, tiebreak_cols=["test"]).collect()
    assert not any(r["rejected_bh"] for r in out)


def test_two_factor_anova_identity_and_balanced_case(spark):
    # balanced 2x2, y integer: cell means 10,20,30,40 (2 obs each,
    # +/-1 noise) -> grand mean 25, ss_total decomposes exactly
    data = []
    for a, b, mu in ((0, "x", 10), (0, "y", 20), (1, "x", 30), (1, "y", 40)):
        data += [(a, b, mu - 1), (a, b, mu + 1)]
    df = spark.createDataFrame(data, "a int, b string, y long")
    # generic API: labels derive from the factor column names (the
    # first-class operator no longer hardcodes q317's domain labels)
    rows = {r["source"]: r for r in two_factor_anova(df, "a", "b", "y").collect()}
    assert rows["within"]["df"] == 4 and rows["total"]["df"] == 7
    # ss_within = 8 * 1 = 8; ss_a = 8*(10)^2/... hand: means a0=15,a1=35
    # ss_a = 4*(15-25)^2 + 4*(35-25)^2 = 800; ss_b likewise 200; ss_ab 0
    assert abs(rows["A(a)"]["ss"] - 800.0) < 1e-6
    assert abs(rows["B(b)"]["ss"] - 200.0) < 1e-6
    assert abs(rows["AB(interaction)"]["ss"] - 0.0) < 1e-6
    assert abs(rows["within"]["ss"] - 8.0) < 1e-6
    total = sum(
        rows[k]["ss"] for k in ("A(a)", "B(b)", "AB(interaction)", "within")
    )
    assert abs(total - rows["total"]["ss"]) < 1e-6
    # F_a = (800/1)/(8/4) = 400
    assert abs(rows["A(a)"]["f_ratio"] - 400.0) < 1e-6
    # explicit labels flow through verbatim, quote-escaped
    lbl = {
        r["source"]
        for r in two_factor_anova(
            df, "a", "b", "y", label_a="A(treat'ment)", label_b="B(seg)"
        ).collect()
    }
    assert "A(treat'ment)" in lbl and "B(seg)" in lbl
    # backslashes must survive too (Spark SQL literals treat \ as an
    # escape; a column name like a\b reaches the default label path)
    lbl2 = {
        r["source"]
        for r in two_factor_anova(
            df, "a", "b", "y", label_a="A(x\\n)", label_b="B(y\\)"
        ).collect()
    }
    assert "A(x\\n)" in lbl2 and "B(y\\)" in lbl2


def test_cohens_kappa_hand_computed(spark):
    # confusion n11=20 n10=5 n01=10 n00=15, n=50
    # p_o = 35/50 = .7; p_e = (25*30 + 25*20)/2500 = .5; kappa = .4
    data = (
        [(1, 1)] * 20 + [(1, 0)] * 5 + [(0, 1)] * 10 + [(0, 0)] * 15
    )
    df = spark.createDataFrame(data, "a int, b int")
    row = cohens_kappa(df, "a", "b").collect()[0]
    assert (row["n11"], row["n10"], row["n01"], row["n00"]) == (20, 5, 10, 15)
    assert abs(row["p_observed"] - 0.7) < 1e-9
    assert abs(row["p_expected"] - 0.5) < 1e-9
    assert abs(row["kappa"] - 0.4) < 1e-9


def test_spearman_monotone_nonlinear_and_ties(spark):
    # y = x^3 is monotone -> spearman 1, pearson < 1
    df = spark.createDataFrame(
        [(i, i ** 3) for i in range(1, 21)], "x long, y long"
    )
    row = spearman_pearson(df, "x", "y").collect()[0]
    assert row["n"] == 20
    assert abs(row["spearman_rho"] - 1.0) < 1e-9
    assert row["pearson_r"] < 1.0
    # tie handling (midranks): x=(1,1,2), y=(2,3,1) ->
    # rank_x=(1.5,1.5,3), rank_y=(2,3,1); rho = -0.5 exactly? compute:
    # covariance of ranks: mean_rx=2, mean_ry=2
    # devs rx=(-.5,-.5,1), ry=(0,1,-1) -> sxy=-1.5, sxx=1.5, syy=2
    # rho = -1.5/sqrt(3) = -0.866025
    df2 = spark.createDataFrame([(1, 2), (1, 3), (2, 1)], "x long, y long")
    row2 = spearman_pearson(df2, "x", "y").collect()[0]
    assert abs(row2["spearman_rho"] - (-1.5 / math.sqrt(3.0))) < 1e-5


def test_kfold_cv_ols_recovers_exact_linear_trend(spark):
    # y_c = 200*x + 5000 exactly -> every fold's model recovers
    # beta=200, intercept=$50, rmse ~ 0
    df = spark.createDataFrame(
        [(i % 3, i, 200 * i + 5000) for i in range(60)],
        "fold long, x long, y_c long",
    )
    rows = kfold_cv_ols(df).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["n_train"] == 40 and r["n_test"] == 20
        assert abs(r["beta_cents_per_day"] - 200.0) < 1e-6
        assert abs(r["intercept_dollars"] - 50.0) < 1e-6
        assert r["train_rmse_dollars"] < 0.01 and r["test_rmse_dollars"] < 0.01
