"""Approximate (sketch) aggregates: the 100 TB path for the engine's
exact distinct / percentile queries.

The driver's oracle gate can only value-check deterministic results,
so the exact forms (countDistinct, percentile) are what `queries()`
registers; these tests pin the approximate twins -- HyperLogLog++
(approx_count_distinct) and KLL-ish quantile sketch
(approx_percentile) -- to tight relative error against the exact
answers, which is the contract a deployment relies on when it swaps
them in at scale (sketches partial-aggregate map-side and shuffle
O(sketch) bytes instead of O(distinct keys))."""

from __future__ import annotations

from pyspark.sql import functions as F

from mvp_mini_etl_pipeline_1762840347_spark.io import read_events, read_table

SF = "/root/testdata/sf0.001"


def test_hll_distinct_users_within_5pct(spark):
    e = read_events(spark, SF)
    row = e.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).first()
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05


def test_hll_distinct_per_type_within_10pct(spark):
    e = read_events(spark, SF)
    rows = (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["approx"] - r["exact"]) / max(r["exact"], 1) < 0.10


def test_quantile_sketch_close_to_exact(spark):
    li = read_table(spark, SF, "lineitem")
    row = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_med"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias(
            "approx_med"
        ),
        F.expr("percentile(l_extendedprice, 0.95)").alias("exact_p95"),
        F.expr("approx_percentile(l_extendedprice, 0.95, 10000)").alias(
            "approx_p95"
        ),
    ).first()
    assert abs(row["approx_med"] - row["exact_med"]) / row["exact_med"] < 0.01
    assert abs(row["approx_p95"] - row["exact_p95"]) / row["exact_p95"] < 0.01


def test_sketches_partial_aggregate(spark):
    """The scale property itself: the sketch aggregation's plan shows
    a partial (map-side) aggregate before the exchange, i.e. the
    shuffle carries per-partition sketches, not raw rows."""
    e = read_events(spark, SF)
    agg = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("u")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    first_agg = plan.index("HashAggregate")
    first_exchange = plan.index("Exchange")
    # plan prints top-down: final agg, exchange, partial agg
    assert "partial_approx_count_distinct" in plan
    assert first_agg < first_exchange


# ---------------------------------------------------------------------------
# Portable (oracle-checkable) sketches from plans/sketches.py
# ---------------------------------------------------------------------------
from mvp_mini_etl_pipeline_1762840347_spark.plans import sketches as psk  # noqa: E402


def test_kmv_estimate_bounds(spark):
    row = psk.sketch_kmv_distinct(spark, SF).first()
    # k=64 => 1-sigma ~ 12.5%; allow 4 sigma.
    assert row["k"] <= 64
    assert abs(row["est_distinct"] - row["exact_distinct"]) <= max(
        0.5 * row["exact_distinct"], 10
    )


def test_portable_hll_estimate_bounds_and_state(spark):
    row = psk.sketch_hll_distinct(spark, SF).first()
    assert 1 <= row["n_buckets"] <= 256
    # m=256 => 1-sigma ~ 6.5%; allow 4 sigma.
    assert abs(row["est_distinct"] - row["exact_distinct"]) <= max(
        0.30 * row["exact_distinct"], 10
    )
    # integer-exact invariant: every occupied bucket contributes at
    # least 1 to the scaled sum, empties contribute 2^m_max.
    assert row["sum_scaled"] >= 256 - row["n_buckets"] + row["n_buckets"] * 1


def test_countmin_never_underestimates(spark):
    rows = psk.sketch_countmin_freq(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["cm_est"] >= r["exact_cnt"]
        assert r["overestimate"] == r["cm_est"] - r["exact_cnt"]


def test_kmv_plan_is_take_ordered(spark):
    """The bottom-K selection must be per-partition top-K merged once
    (TakeOrderedAndProject), not a global sort."""
    df = psk.sketch_kmv_distinct(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan.replace("TakeOrderedAndProject", "")


def test_bloom_no_false_negatives_and_probe_split(spark):
    """Bloom invariant: every actually-present probe MUST be positive
    (no false negatives, ever); absent probes may only err positive."""
    rows = psk.sketch_bloom_membership(spark, SF).collect()
    present = [r for r in rows if r["actually_present"]]
    absent = [r for r in rows if not r["actually_present"]]
    assert len(present) == 10 and len(absent) == 10
    for r in present:
        assert r["bloom_positive"], f"false negative on {r['probe_key']}"
    # the sizing (m=64Ki, k=4, n<=15k keys) keeps FP rate well under 1:
    # not all absent probes may be positive.
    assert any(not r["bloom_positive"] for r in absent)


def test_quantile_hist_within_one_bin(spark):
    """Histogram-quantile error is bounded by construction: the
    interpolated estimate lives in the hit cell, so |est - exact|
    can never exceed one bin width."""
    rows = psk.sketch_quantile_hist(spark, SF).collect()
    assert {r["q"] for r in rows} == {0.50, 0.95, 0.99}
    for r in rows:
        assert abs(r["est"] - r["exact"]) <= 2_000.0, r
        # est must be monotone in q
    by_q = sorted(rows, key=lambda r: r["q"])
    assert by_q[0]["est"] <= by_q[1]["est"] <= by_q[2]["est"]


def test_kmv_by_group_small_group_is_exact(spark, tmp_path):
    """A group with fewer than K distinct keys holds its COMPLETE
    hash set, so the estimator must return the exact count k there
    (standard KMV small-cardinality case), not the biased
    (K-1)/ratio formula."""
    big = [("BIG", i) for i in range(psk._KMV_K * 4)]
    small = [("SMALL", i) for i in range(7)]
    spark.createDataFrame(
        big + small, "o_orderpriority string, o_custkey long"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    rows = {
        r["grp"]: r for r in psk.sketch_kmv_by_group(spark, str(tmp_path)).collect()
    }
    assert rows["SMALL"]["k"] == 7
    assert rows["SMALL"]["est_distinct"] == 7.0
    assert rows["SMALL"]["rel_err_pct"] == 0.0
    # the big group uses the estimator and stays within KMV bounds
    assert rows["BIG"]["k"] == psk._KMV_K
    assert abs(rows["BIG"]["est_distinct"] / rows["BIG"]["exact_distinct"] - 1) < 0.5


def test_hll_merge_equals_direct_build(spark):
    """Register merge is lossless: merging per-slice HLL states by
    elementwise max yields the same (n_buckets, m_max, sum_scaled,
    est_distinct) as the single-pass build over the union -- max is
    associative, so the merged registers are bit-identical.  This is
    the property that lets per-day states answer any date range."""
    direct = psk.sketch_hll_distinct(spark, SF).first()
    merged = psk.sketch_hll_merge(spark, SF).first()
    assert merged["n_slices"] == 2
    for col in ("n_buckets", "m_max", "sum_scaled", "exact_distinct",
                "est_distinct", "rel_err_pct"):
        assert merged[col] == direct[col], col
    # the merge did real work: slices overlapped buckets
    assert merged["slice_registers_total"] > merged["n_buckets"]


def test_hll_merge_partial_aggregate_plan(spark):
    """The register build must partial-aggregate map-side: the
    shuffle carries <= slices*256 register rows per partition, never
    raw order rows."""
    plan = (
        psk.sketch_hll_merge(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_max" in plan or plan.index("HashAggregate") < plan.index(
        "Exchange"
    )


def test_kmv_merge_equals_direct_build(spark):
    """Theta-sketch union is lossless: the K smallest of a union are
    contained in the union of per-slice bottom-K sets, so the merged
    state must equal the direct single-pass build exactly."""
    direct = psk.sketch_kmv_distinct(spark, SF).first()
    merged = psk.sketch_kmv_merge(spark, SF).first()
    assert merged["n_slices"] == 2
    assert merged["candidate_hashes"] <= 2 * psk._KMV_K
    for col in ("k", "kth_hash", "exact_distinct", "est_distinct",
                "rel_err_pct"):
        assert merged[col] == direct[col], col


def test_countmin_merge_equals_direct_build(spark):
    """Count-Min is linear: cell-wise summing per-slice sketches
    yields exactly the direct sketch, so every probe estimate must
    match the direct build (and never underestimate)."""
    direct = {
        r["user_id"]: (r["exact_cnt"], r["cm_est"], r["overestimate"])
        for r in psk.sketch_countmin_freq(spark, SF).collect()
    }
    merged = {
        r["user_id"]: (r["exact_cnt"], r["cm_est"], r["overestimate"])
        for r in psk.sketch_countmin_merge(spark, SF).collect()
    }
    assert merged == direct
    for exact_cnt, cm_est, _ in merged.values():
        assert cm_est >= exact_cnt


def test_quantile_merge_equals_direct_build(spark):
    """Histogram linearity: cell-wise summed per-slice histograms
    must estimate every percentile identically to the direct build."""
    direct = {r["q"]: tuple(r) for r in psk.sketch_quantile_hist(spark, SF).collect()}
    merged = {r["q"]: tuple(r) for r in psk.sketch_quantile_merge(spark, SF).collect()}
    assert merged == direct


def test_join_cardinality_cm_upper_bound(spark):
    """CM inner product never underestimates the true join size, and
    at sketch width >> key cardinality it should be tight."""
    from mvp_mini_etl_pipeline_1762840347_spark.plans import QUERIES

    row = QUERIES["sketch_join_cardinality"](spark, SF).first()
    assert row["cm_est"] >= row["exact_join_size"]
    assert row["overestimate"] == row["cm_est"] - row["exact_join_size"]
    # d=4 x w=512 over sf0.001's part keys: demand a loose 2x bound so
    # the test is hash-collision-robust while still catching a broken
    # estimator (which would be off by orders of magnitude)
    assert row["cm_est"] <= 2 * row["exact_join_size"]


def test_kmv_intersection_estimates_overlap(spark):
    """KMV set-algebra sanity: matches <= k, the exact intersection is
    positive on the year cohorts, and the estimate lands within a
    K=64-appropriate error band of the truth."""
    from mvp_mini_etl_pipeline_1762840347_spark.plans import QUERIES

    row = QUERIES["sketch_kmv_intersection"](spark, SF).first()
    assert 0 <= row["matches"] <= row["k"]
    assert row["exact_intersection"] > 0
    assert 0.0 <= row["est_jaccard"] <= 1.0
    # K=64 gives ~1/sqrt(64) = 12.5% std err on jaccard; allow 3 sigma
    rel = abs(row["est_intersection"] - row["exact_intersection"]) / row[
        "exact_intersection"
    ]
    assert rel < 0.45, row


def test_hll_sliding_exact_column_matches_pandas_recompute(spark):
    """The query's exact_distinct yardstick is itself re-derived here
    with an independent pandas implementation of the 3-day trailing
    window (no fan-out trick), per observed day."""
    from mvp_mini_etl_pipeline_1762840347_spark.plans import QUERIES

    out = {
        str(r["day"]): r["exact_distinct"]
        for r in QUERIES["sketch_hll_sliding"](spark, SF).collect()
    }
    pdf = read_events(spark, SF).select(
        F.to_date("ts").alias("day"), "user_id"
    ).toPandas()
    days = sorted(pdf["day"].unique())
    assert set(out) == {str(d) for d in days}
    for d in days:
        import datetime

        lo = d - datetime.timedelta(days=2)
        expect = pdf[(pdf["day"] >= lo) & (pdf["day"] <= d)][
            "user_id"
        ].nunique()
        assert out[str(d)] == expect, d


def test_hll_sliding_estimate_sane_and_registers_bounded(spark):
    from mvp_mini_etl_pipeline_1762840347_spark.plans import QUERIES
    from mvp_mini_etl_pipeline_1762840347_spark.plans.sketches import (
        _HLL_M,
        _HLL_WBITS,
    )

    for r in QUERIES["sketch_hll_sliding"](spark, SF).collect():
        assert 1 <= r["n_buckets"] <= _HLL_M
        assert 1 <= r["m_max"] <= _HLL_WBITS + 1
        assert r["est_distinct"] > 0
        # HLL with m=256 has ~6.5% std err; 3-day windows at sf0.001
        # hold a few hundred users -- allow a generous 5-sigma band
        assert abs(r["rel_err_pct"]) < 35.0, r


def test_hll_cube_lattice_consistency(spark):
    """The grand-total cell's registers are the max over all finest
    cells, so its estimate must equal sketch_hll_distinct's global
    estimate (same hash, same space); exact columns obey lattice
    monotonicity (a rollup cell's distinct >= any child's)."""
    from mvp_mini_etl_pipeline_1762840347_spark.plans import QUERIES

    rows = QUERIES["sketch_hll_cube"](spark, SF).collect()
    cells = {(r.cell_s, r.cell_p): r for r in rows}
    grand = cells[("ALL", "ALL")]
    glob = QUERIES["sketch_hll_distinct"](spark, SF).first()
    assert grand.est_distinct == glob.est_distinct
    assert grand.sum_scaled == glob.sum_scaled
    for (s, p), r in cells.items():
        if s != "ALL":
            assert r.exact_distinct <= cells[("ALL", p)].exact_distinct
        if p != "ALL":
            assert r.exact_distinct <= cells[(s, "ALL")].exact_distinct
