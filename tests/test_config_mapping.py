"""Config loader + field-mapping compiler tests — ported from the
reference's test ideas (tests/test_sql_generator.py:14-163,
test_config_loader.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from g_etl_spark.config import DatasetConfig, filter_datasets, flatten_config
from g_etl_spark.mapping import compile_mapping, compile_value


def test_flatten_pipelines_format():
    cfg = {
        "pipelines": [
            {"id": "ext_restr", "datasets": [{"id": "a"}, {"id": "b", "enabled": False}]},
            {"id": "avdelning", "datasets": [{"id": "c", "plugin": "wfs"}]},
        ]
    }
    ds = flatten_config(cfg)
    assert [d.id for d in ds] == ["a", "b", "c"]
    assert [d.pipeline for d in ds] == ["ext_restr", "ext_restr", "avdelning"]
    assert ds[2].plugin == "wfs"


def test_flatten_legacy_format():
    ds = flatten_config({"datasets": [{"id": "x", "pipeline": "avdelning"}]})
    assert ds[0].pipeline == "avdelning"


def test_flatten_rejects_unknown_shape():
    with pytest.raises(ValueError):
        flatten_config({"nope": []})


def test_unknown_keys_go_to_options():
    d = DatasetConfig.from_dict({"id": "x", "custom_flag": 7})
    assert d.options["custom_flag"] == 7


def test_filter_datasets():
    ds = flatten_config(
        {
            "pipelines": [
                {
                    "id": "p",
                    "datasets": [
                        {"id": "a"},
                        {"id": "b", "enabled": False},
                        {"id": "c", "plugin": "wfs"},
                    ],
                }
            ]
        }
    )
    assert [d.id for d in filter_datasets(ds)] == ["a", "c"]
    assert [d.id for d in filter_datasets(ds, ids=["c"])] == ["c"]
    assert [d.id for d in filter_datasets(ds, plugin="wfs")] == ["c"]
    assert [d.id for d in filter_datasets(ds, enabled_only=False)] == ["a", "b", "c"]


# --- mapping compiler (≙ sql_generator.py:399-440 semantics) -----------


def _eval(spark, cols: dict):
    row = (
        spark.createDataFrame(
            [("V1", None)], "kategori string, tom string"
        )
        .select(*[c.alias(k) for k, c in cols.items()])
        .head()
    )
    return row.asDict()


def test_compile_value_column_ref(spark):
    got = _eval(spark, {"v": compile_value("$kategori")})
    assert got["v"] == "V1"


def test_compile_value_column_ref_null_coalesces_to_empty(spark):
    got = _eval(spark, {"v": compile_value("$tom")})
    assert got["v"] == ""


def test_compile_value_literal_and_empty(spark):
    got = _eval(spark, {"a": compile_value("biotopskydd"), "b": compile_value(""), "c": compile_value(None)})
    assert got == {"a": "biotopskydd", "b": "", "c": ""}


def test_compile_mapping_full_contract(spark):
    m = compile_mapping(
        {
            "source_id_column": "$kategori",
            "klass": "biotopskydd",
            "area": "$tom",  # unknown key passthrough (≙ {key}_expr)
        }
    )
    # standard keys + data_1..5 always exist
    for key in ("source_id", "klass", "grupp", "typ", "leverantor"):
        assert key in m
    for i in range(1, 6):
        assert f"data_{i}" in m
    assert "area" in m
    got = _eval(spark, {"source_id": m["source_id"], "klass": m["klass"], "grupp": m["grupp"], "area": m["area"]})
    assert got == {"source_id": "V1", "klass": "biotopskydd", "grupp": "", "area": ""}


def test_compile_mapping_casts_nonstring_columns(spark):
    m = compile_mapping({"klass": "$n"})
    row = (
        spark.createDataFrame([(42,)], "n int")
        .select(m["klass"].alias("k"))
        .head()
    )
    assert row.k == "42"
