"""Smoke: every registered query runs at sf0.001 and returns a stable,
non-degenerate schema.  (Full value correctness is the DuckDB oracle
gate -- tools/verify_local.py and the driver's t2.)"""

from __future__ import annotations

import pytest

from mvp_mini_etl_pipeline_1762840347_spark import plans


@pytest.mark.parametrize("name", sorted(plans.QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = plans.QUERIES[name](spark, sf_dir)
    assert df.columns, name
    assert len(df.columns) == len(set(df.columns)), f"{name}: duplicate col names"
    df.limit(5).collect()


def test_every_oracle_has_a_query():
    assert set(plans.ORACLES) <= set(plans.QUERIES)


def test_oracle_coverage_is_high():
    """Non-SQL-expressible ops may omit oracles, but they should be
    the exception."""
    uncovered = set(plans.QUERIES) - set(plans.ORACLES)
    assert len(uncovered) <= 2, f"too many rows-only queries: {uncovered}"
