"""Unit tests for the g_* macro layer (functions/core.py ≙
sql/migrations/003_db_makros.sql)."""

from __future__ import annotations

import pyspark.sql.functions as F

from g_etl_spark.functions import core


def _one(spark, col, **data):
    cols = ", ".join(f"{k} string" for k in data)
    return (
        spark.createDataFrame([tuple(data.values())], cols)
        .select(col.alias("v"))
        .head()
        .v
    )


def test_clean_text(spark):
    assert _one(spark, core.clean_text(F.col("t")), t="  a   b\t\tc  ") == "a b c"


def test_empty_to_null(spark):
    assert _one(spark, core.empty_to_null(F.col("t")), t="   ") is None
    assert _one(spark, core.empty_to_null(F.col("t")), t="x") == "x"


def test_classification(spark):
    assert _one(spark, core.classification(F.col("g"), F.col("t")), g="G", t="T") == "G.T"
    assert _one(spark, core.classification(F.col("g"), F.col("t")), g="", t="T") == "-.T"
    assert _one(spark, core.classification(F.col("g"), F.col("t")), g="", t="") == "-.-"


def test_format_date_iso(spark):
    got = _one(
        spark,
        core.format_date_iso(F.col("d").cast("timestamp")),
        d="2024-03-05 10:11:12",
    )
    assert got == "2024-03-05"


def test_md5_helpers_are_stable(spark):
    a = _one(spark, core.source_id_md5(F.col("t")), t="abc")
    b = _one(spark, core.source_id_md5(F.col("t")), t="abc")
    assert a == b and len(a) == 32
    c = _one(spark, core.attr_md5(F.col("t"), F.col("u")), t="x", u="y")
    d = _one(spark, core.attr_md5(F.col("t"), F.col("u")), t="x", u="z")
    assert c != d


def test_generate_id_nondeterministic_shape(spark):
    v = _one(spark, core.generate_id(F.col("t")), t="seed")
    assert len(v) == 32  # md5 hex; value itself is time-dependent


def test_area_to_hectares(spark):
    df = spark.createDataFrame([(25000.0,)], "a double")
    assert df.select(core.area_to_hectares(F.col("a")).alias("v")).head().v == 2.5


def test_numeric_cleanup(spark):
    df = spark.createDataFrame([("12.3456",), ("oklart",)], "x string")
    got = [r.v for r in df.select(core.numeric_cleanup(F.col("x"), 2).alias("v")).collect()]
    assert got[0] == 12.35 and got[1] is None


def test_json_data_excludes_nothing_but_is_valid_json(spark):
    import json

    df = spark.createDataFrame([("a", "b")], "x string, y string")
    v = df.select(
        core.json_data({"x": F.col("x"), "y": F.col("y")}).alias("v")
    ).head().v
    assert json.loads(v) == {"x": "a", "y": "b"}
