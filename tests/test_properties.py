"""Property-based tests (hypothesis) for the normalizer laws and the
CSV quoting round-trip (SURVEY §5.4)."""

from __future__ import annotations

import csv
import io

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from mvp_mini_etl_pipeline_1762840347_spark.functions.js import csv_quote, js_str_or

TEXT = st.one_of(st.none(), st.text(max_size=12))


def _js_or_py(a, b):
    """Reference-JS `a || b` for strings ('' and None falsy)."""
    return a if a else b


@settings(max_examples=12, deadline=None)
@given(st.lists(st.tuples(TEXT, TEXT), min_size=1, max_size=8))
def test_js_str_or_matches_js_semantics(spark, pairs):
    df = spark.createDataFrame(pairs, "a string, b string")
    got = [r[0] for r in df.select(js_str_or(F.col("a"), F.col("b"))).collect()]
    want = [_js_or_py(a, b) for a, b in pairs]
    assert got == want


@settings(max_examples=12, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=20)), min_size=1, max_size=8))
def test_csv_quote_roundtrip(spark, values):
    """A csv_quote'd cell always parses back to the original value
    (None -> '')."""
    df = spark.createDataFrame([(v,) for v in values], "a string")
    quoted = [r[0] for r in df.select(csv_quote(F.col("a"))).collect()]
    for original, cell in zip(values, quoted):
        line = io.StringIO(cell + "\n")
        parsed = next(csv.reader(line))
        # csv.reader splits on embedded newlines/commas inside quotes fine
        assert "".join(parsed) if len(parsed) > 1 else parsed[0] == (original or "")


def test_js_str_or_associativity(spark):
    """(a || b) || c == a || (b || c) -- the law the chained defaults
    in the reference rely on."""
    rows = [(a, b, c) for a in ("", None, "x") for b in ("", None, "y") for c in ("z",)]
    df = spark.createDataFrame(rows, "a string, b string, c string")
    left = df.select(
        js_str_or(js_str_or(F.col("a"), F.col("b")), F.col("c")).alias("v")
    ).collect()
    right = df.select(
        js_str_or(F.col("a"), js_str_or(F.col("b"), F.col("c"))).alias("v")
    ).collect()
    assert [r["v"] for r in left] == [r["v"] for r in right]
