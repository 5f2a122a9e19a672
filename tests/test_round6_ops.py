"""Property pins for the round-6 operators: eager-aggregation
value-identity, the Misra-Gries containment guarantee, and
correlation-profile sanity against Spark's built-in estimator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mvp_mini_etl_pipeline_1762840347_spark import plans
from mvp_mini_etl_pipeline_1762840347_spark.io import read_table

SF = "/root/testdata/sf0.001"


def test_eager_agg_equals_lazy_composition(spark):
    """The pushed-down plan must be value-identical to the lazy
    join-everything-then-aggregate composition (the rewrite's entire
    correctness claim, checked engine-side, independent of the
    DuckDB oracle)."""
    li = read_table(spark, SF, "lineitem")
    orders = read_table(spark, SF, "orders")
    cust = read_table(spark, SF, "customer")
    lazy = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_lineitems"),
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("bigint")
            ).alias("revenue_cents"),
        )
    )
    want = {
        r["c_mktsegment"]: (r["n_lineitems"], r["revenue_cents"])
        for r in lazy.collect()
    }
    got = {
        r["c_mktsegment"]: (r["n_lineitems"], r["revenue_cents"])
        for r in plans.QUERIES["eager_agg_pushdown"](spark, SF).collect()
    }
    assert got == want and len(got) >= 3


def test_spacesaving_containment_guarantee(spark):
    """Any token whose exact count exceeds the summed per-shard error
    MUST survive the compression into the merged candidate set, and
    every reported bracket must contain the exact count -- the
    deterministic Misra-Gries guarantee, recomputed from scratch."""
    from mvp_mini_etl_pipeline_1762840347_spark.plans.sketches import (
        _MG_K,
        _MG_SHARDS,
    )
    from pyspark.sql.window import Window

    docs = read_table(spark, SF, "documents")
    toks = docs.select(
        (F.col("doc_id") % _MG_SHARDS).alias("shard"),
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("item"),
    )
    counts = toks.groupBy("shard", "item").agg(F.count("*").alias("c"))
    w = Window.partitionBy("shard").orderBy(F.desc("c"), F.col("item"))
    ranked = counts.select(
        "*", F.row_number().over(w).alias("rnk")
    ).filter(F.col("rnk") <= _MG_K + 1)
    err = ranked.groupBy("shard").agg(
        F.coalesce(
            F.max(F.when(F.col("rnk") == _MG_K + 1, F.col("c"))), F.lit(0)
        ).alias("e")
    )
    total_err = err.agg(F.sum("e")).first()[0]
    kept_items = {
        r["item"]
        for r in ranked.filter(F.col("rnk") <= _MG_K)
        .join(err, "shard")
        .filter(F.col("c") - F.col("e") > 0)
        .select("item")
        .distinct()
        .collect()
    }
    exact = {
        r["item"]: r["n"]
        for r in toks.groupBy("item").agg(F.count("*").alias("n")).collect()
    }
    must_appear = {t for t, n in exact.items() if n > total_err}
    assert must_appear, "degenerate fixture: no token above the error mass"
    missing = must_appear - kept_items
    assert not missing, f"guaranteed heavy hitters dropped: {missing}"

    out = plans.QUERIES["sketch_spacesaving_merge"](spark, SF).collect()
    assert out and all(r["within_bounds"] for r in out)
    for r in out:
        assert r["est_lo"] <= r["exact_n"] <= r["est_hi"]


def test_correlation_profile_matches_builtin(spark):
    """The shared-SQL Pearson r from exact sufficient statistics must
    agree with Spark's built-in corr() on the same scaled columns to
    float precision (different summation order => compare loosely)."""
    rows = plans.QUERIES["correlation_profile"](spark, SF).collect()
    assert len(rows) == 6
    li = read_table(spark, SF, "lineitem").select(
        F.col("l_quantity").cast("bigint").alias("quantity"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias(
            "price_cents"
        ),
        F.round(F.col("l_discount") * 100).cast("bigint").alias(
            "discount_pct"
        ),
        F.round(F.col("l_tax") * 100).cast("bigint").alias("tax_pct"),
    )
    for r in rows:
        assert -1.0 <= r["pearson_r"] <= 1.0
        builtin = li.agg(F.corr(r["col_x"], r["col_y"])).first()[0]
        assert builtin == pytest.approx(r["pearson_r"], abs=1e-4), (
            r["col_x"],
            r["col_y"],
        )
