"""Unit tests for the JS-semantics scalar layer (SURVEY §2.7) --
including the falsy-coalesce edge cases the reference depends on."""

from __future__ import annotations

from pyspark.sql import functions as F

from mvp_mini_etl_pipeline_1762840347_spark.functions.js import (
    case_status,
    clamped_pct,
    csv_quote,
    full_name,
    js_str_or,
    js_truthy,
    url_hostname,
)


def _vals(spark, col, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return [r[0] for r in df.select(col).collect()]


def test_js_str_or_falsy_semantics(spark):
    # '' falls through (JS ||), NULL falls through, non-empty wins.
    rows = [("", "fb"), (None, "fb"), ("x", "fb")]
    out = _vals(spark, js_str_or(F.col("a"), F.col("b")), rows, "a string, b string")
    assert out == ["fb", "fb", "x"]


def test_js_truthy(spark):
    rows = [("",), (None,), ("0",), ("false",), ("x",)]
    out = _vals(spark, js_truthy(F.col("a")), rows, "a string")
    assert out == [False, False, False, False, True]


def test_full_name_trims(spark):
    rows = [("John", "Doe"), ("Solo", None), (None, None)]
    out = _vals(spark, full_name(F.col("f"), F.col("l")), rows, "f string, l string")
    assert out == ["John Doe", "Solo", ""]


def test_csv_quote_doubles_embedded_quotes(spark):
    rows = [('say "hi"',), (None,), ("plain",)]
    out = _vals(spark, csv_quote(F.col("a")), rows, "a string")
    assert out == ['"say ""hi"""', '""', '"plain"']


def test_clamped_pct(spark):
    rows = [(50.0, 100.0), (200.0, 100.0), (5.0, 0.0), (5.0, -1.0)]
    out = _vals(
        spark, clamped_pct(F.col("v"), F.col("m")), rows, "v double, m double"
    )
    assert out == [50.0, 100.0, 0.0, 0.0]


def test_case_status(spark):
    rows = [(True, False), (False, True), (False, False)]
    out = _vals(
        spark,
        case_status(F.col("s"), F.col("u")),
        rows,
        "s boolean, u boolean",
    )
    assert out == ["Success", "Upcoming", "Failed"]


def test_url_hostname_with_fallback(spark):
    rows = [("https://api.example.com/path",), ("not a url",)]
    out = _vals(spark, url_hostname(F.col("a")), rows, "a string")
    assert out == ["api.example.com", "not a url"]


def test_js_truthy_numeric_kind(spark):
    rows = [(0.0,), (-0.0,), (float("nan"),), (None,), (0.5,), (-3.0,)]
    out = _vals(spark, js_truthy(F.col("a"), kind="numeric"), rows, "a double")
    assert out == [False, False, False, False, True, True]


def test_js_truthy_string_kind_matches_js(spark):
    # JS Boolean('0') and Boolean('false') are TRUE -- only '' is falsy.
    rows = [("",), (None,), ("0",), ("false",), ("x",)]
    out = _vals(spark, js_truthy(F.col("a"), kind="string"), rows, "a string")
    assert out == [False, False, True, True, True]


def test_js_truthy_boolean_kind(spark):
    rows = [(True,), (False,), (None,)]
    out = _vals(spark, js_truthy(F.col("a"), kind="boolean"), rows, "a boolean")
    assert out == [True, False, False]
