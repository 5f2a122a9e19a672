"""Warehouse / ETL maintenance operators (plans/warehouse.py):
property checks that pin the semantics beyond the driver's oracle
gate -- interval algebra for SCD2, merge-action arithmetic, the
sweep-line invariants, exact-rank equivalence for the partitioner
bounds, and the Z-order locality guarantee the layout exists for."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mvp_mini_etl_pipeline_1762840347_spark.io import read_table
from mvp_mini_etl_pipeline_1762840347_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def test_scd2_intervals_contiguous_and_compressed(spark):
    out = QUERIES["scd2_user_state"](spark, SF)
    w = Window.partitionBy("user_id").orderBy("version")
    r = out.select(
        "user_id",
        "state",
        "valid_from",
        "valid_to",
        "version",
        F.lead("valid_from").over(w).alias("next_from"),
        F.lead("state").over(w).alias("next_state"),
    ).collect()
    open_per_user: dict = {}
    for row in r:
        if row.valid_to is None:
            open_per_user[row.user_id] = open_per_user.get(row.user_id, 0) + 1
            assert row.next_from is None  # open interval is the last one
        else:
            # each closed interval hands off exactly at the next start
            assert row.valid_to == row.next_from
        if row.next_state is not None:
            # SCD2 compression: consecutive versions change state
            assert row.next_state != row.state
    assert all(v == 1 for v in open_per_user.values())


def test_merge_upsert_action_arithmetic(spark):
    out = QUERIES["merge_upsert_orders"](spark, SF)
    acts = {
        r["action"]: r["n"]
        for r in out.groupBy("action").agg(F.count("*").alias("n")).collect()
    }
    o = read_table(spark, SF, "orders")
    n_ins = o.filter((F.col("o_orderkey") % 3 == 0) & (F.col("o_orderkey") % 2 == 0)).count()
    n_upd = o.filter((F.col("o_orderkey") % 3 != 0) & (F.col("o_orderkey") % 2 == 0)).count()
    n_keep = o.filter((F.col("o_orderkey") % 3 != 0) & (F.col("o_orderkey") % 2 != 0)).count()
    assert acts.get("insert", 0) == n_ins
    assert acts.get("update", 0) == n_upd
    assert acts.get("keep", 0) == n_keep
    # updates carry the delta's price: original + 10.0 exactly
    j = (
        out.filter(F.col("action") == "update")
        .join(o, "o_orderkey")
        .filter(F.col("price") != F.col("o_totalprice") + F.lit(10.0))
    )
    assert j.count() == 0


def test_max_concurrent_matches_naive_global_window(spark):
    out = QUERIES["max_concurrent_sessions"](spark, SF).first()
    # naive one-node recomputation with a single global window
    from mvp_mini_etl_pipeline_1762840347_spark.io import read_events

    e = read_events(spark, SF).select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (
        F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    )
    s = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap >= 30 * 60 * 1_000_000), 1).otherwise(0),
    ).withColumn(
        "sid",
        F.sum("new_session").over(
            Window.partitionBy("user_id")
            .orderBy("ts")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    iv = s.groupBy("user_id", "sid").agg(
        F.min("ts").alias("s"),
        (F.max("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
    )
    d = iv.select(F.col("s").alias("t"), F.lit(1).alias("d")).unionAll(
        iv.select(F.col("e").alias("t"), F.lit(-1).alias("d"))
    )
    g = d.groupBy("t").agg(F.sum("d").alias("d"))
    run = g.withColumn(
        "run",
        F.sum("d").over(
            Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    naive = run.agg(F.max("run").alias("m")).first()["m"]
    assert out["max_concurrent"] == naive
    assert out["n_sessions"] == iv.count()
    assert out["at_ts"] is not None


def test_range_partition_bounds_are_exact_ranks(spark):
    out = {
        r["split_idx"]: r["split_price"]
        for r in QUERIES["range_partition_bounds"](spark, SF).collect()
    }
    o = read_table(spark, SF, "orders")
    n = o.count()
    ranked = o.select(
        "o_totalprice",
        F.row_number()
        .over(Window.orderBy("o_totalprice", "o_orderkey"))
        .alias("rn"),
    )
    want = {
        i: ranked.filter(F.col("rn") == (i * n) // 8).first()["o_totalprice"]
        for i in range(1, 8)
    }
    assert out == want
    # bounds are nondecreasing (equi-depth over a continuous column)
    vals = [out[i] for i in range(1, 8)]
    assert vals == sorted(vals)


def test_skew_diagnose_top_key(spark):
    rows = QUERIES["skew_diagnose"](spark, SF).orderBy("rnk").collect()
    assert len(rows) == 5
    cnts = (
        read_table(spark, SF, "orders")
        .groupBy("o_custkey")
        .count()
        .orderBy(F.col("count").desc(), "o_custkey")
        .limit(1)
        .first()
    )
    assert rows[0]["o_custkey"] == cnts["o_custkey"]
    assert rows[0]["cnt"] == cnts["count"]
    assert rows[0]["skew_factor"] >= 1.0  # the max key is above the mean
    assert [r["cnt"] for r in rows] == sorted(
        [r["cnt"] for r in rows], reverse=True
    )


def test_zorder_blocks_bound_both_dimensions(spark):
    rows = QUERIES["zorder_layout"](spark, SF).collect()
    o_n = read_table(spark, SF, "orders").count()
    assert sum(r["n"] for r in rows) == o_n
    for r in rows:
        assert 0 <= r["min_x"] <= r["max_x"] <= 255
        assert 0 <= r["min_y"] <= r["max_y"] <= 255
        # block = zkey >> 10 fixes the top 3 bits of BOTH dimensions,
        # so each block spans < 2^5 = 32 in x AND in y -- the
        # two-dimensional locality a single-column sort cannot give.
        assert r["max_x"] - r["min_x"] < 32
        assert r["max_y"] - r["min_y"] < 32


def test_frequent_pairs_properties(spark):
    rows = QUERIES["frequent_pairs"](spark, SF).collect()
    assert rows, "sf0.001 should still have co-ordered pairs"
    supports = [r["support"] for r in rows]
    assert supports == sorted(supports, reverse=True)
    for r in rows:
        assert r["a"] < r["b"]
        assert r["support"] >= 2
        assert 0 < r["confidence"] <= 1.0
        assert r["lift"] > 0


def test_session_paths_consistent_with_sessionization(spark):
    rows = QUERIES["session_paths"](spark, SF).collect()
    assert rows
    counts = [r["n_sessions"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    n_total_sessions = QUERIES["events_session"](spark, SF).count()
    assert sum(counts) <= n_total_sessions
    for r in rows:
        steps = r["path"].split(">")
        assert steps and all(s for s in steps)
        assert r["avg_len"] >= 1.0
        # a path of k steps means sessions of exactly k events
        assert abs(r["avg_len"] - len(steps)) < 1e-9


# ---------------------------------------------------------------------------
# DeltaLogTable: delta-sized commits, fold-on-read, checkpoint compaction
# ---------------------------------------------------------------------------
def test_delta_log_fold_equals_sequential_merges(spark, tmp_path_factory):
    from mvp_mini_etl_pipeline_1762840347_spark.operators.table_format import (
        DeltaLogTable,
    )

    root = str(tmp_path_factory.mktemp("dlt") / "t")
    t = DeltaLogTable(spark, root, key="k")
    t.append_delta(spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]))
    t.append_delta(spark.createDataFrame(
        [(2, "B"), (4, "d")], ["k", "v"]))      # update 2, insert 4
    t.append_delta(spark.createDataFrame(
        [(1, "A"), (2, "B2")], ["k", "v"]))     # update 1 and 2 again
    got = {(r.k, r.v) for r in t.read().collect()}
    assert got == {(1, "A"), (2, "B2"), (3, "c"), (4, "d")}
    assert t.fold_depth() == 3


def test_delta_log_checkpoint_bounds_fold_and_preserves_view(
    spark, tmp_path_factory
):
    from mvp_mini_etl_pipeline_1762840347_spark.operators.table_format import (
        DeltaLogTable,
    )

    root = str(tmp_path_factory.mktemp("dlt2") / "t")
    t = DeltaLogTable(spark, root, key="k")
    for i in range(4):
        t.append_delta(spark.createDataFrame(
            [(i, f"v{i}"), (99, f"w{i}")], ["k", "v"]))
    before = {(r.k, r.v) for r in t.read().collect()}
    assert t.fold_depth() == 4
    t.checkpoint()
    assert t.fold_depth() == 1                 # reads fold checkpoint only
    assert {(r.k, r.v) for r in t.read().collect()} == before
    # key 99 resolved to the NEWEST delta, not any earlier one
    assert ("99" not in {v for _, v in before}) and (99, "w3") in before
    # further deltas fold on top of the checkpoint
    t.append_delta(spark.createDataFrame([(0, "V0")], ["k", "v"]))
    assert t.fold_depth() == 2
    after = {(r.k, r.v) for r in t.read().collect()}
    assert after == (before - {(0, "v0")}) | {(0, "V0")}


def test_delta_log_ignores_unreferenced_directory(spark, tmp_path_factory):
    """A crash between data write and log append leaves garbage, not a
    torn table: directories without a log line never fold into reads."""
    import os

    from mvp_mini_etl_pipeline_1762840347_spark.operators.table_format import (
        DeltaLogTable,
    )

    root = str(tmp_path_factory.mktemp("dlt3") / "t")
    t = DeltaLogTable(spark, root, key="k")
    t.append_delta(spark.createDataFrame([(1, "a")], ["k", "v"]))
    # simulate the crash: delta parquet landed, log line never written
    spark.createDataFrame([(1, "TORN")], ["k", "v"]).write.parquet(
        os.path.join(root, "delta-1")
    )
    assert {(r.k, r.v) for r in t.read().collect()} == {(1, "a")}
    # the next committed delta reuses a FRESH directory name without
    # clobbering history semantics (overwrite of the orphan is fine)
    t.append_delta(spark.createDataFrame([(2, "b")], ["k", "v"]))
    assert {(r.k, r.v) for r in t.read().collect()} == {(1, "a"), (2, "b")}


def test_encoding_advisor_sizes_are_consistent(spark):
    """Sanity of the estimator itself: a low-cardinality flag must
    dictionary- or RLE-encode below plain, a dense unique-ish key
    must stay plain, and the recommendation is the argmin of the
    three sizes."""
    rows = {
        r.column_name: r
        for r in QUERIES["encoding_advisor"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    flag = rows["l_returnflag"]
    assert flag.n_distinct <= 4
    assert flag.dict_bytes < flag.plain_bytes
    assert flag.rle_sorted_bytes < flag.plain_bytes
    # sizes scale with the data: plain grows with rows, dict's
    # dictionary part with distincts
    key = rows["l_orderkey"]
    assert key.n_distinct > 1000
    assert key.plain_bytes > flag.plain_bytes // 2
    for r in rows.values():
        best = min(
            ("dict", r.dict_bytes),
            ("rle_sorted", r.rle_sorted_bytes),
            ("plain", r.plain_bytes),
            key=lambda kv: kv[1],
        )[1]
        assert (
            {"dict": r.dict_bytes, "rle_sorted": r.rle_sorted_bytes,
             "plain": r.plain_bytes}[r.best_encoding] == best
        )


def test_partition_advisor_arithmetic(spark):
    """The recommendations are exact ceil-divisions of the measured
    size model, and the size model is bounded below by the
    fixed-width floor."""
    rows = {
        r.tbl: r
        for r in QUERIES["partition_advisor"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    li = rows["lineitem"]
    assert li.est_bytes >= 84 * li.n_rows  # fixed-width floor
    for r in rows.values():
        assert r.target_scan_files == max(
            -(-r.est_bytes // (128 * 1024 * 1024)), 1
        )
        assert r.target_shuffle_partitions == max(
            -(-r.est_bytes // (64 * 1024 * 1024)), 1
        )
        assert r.avg_row_bytes == (r.est_bytes + r.n_rows // 2) // r.n_rows


def test_mv_advisor_greedy_rule(spark):
    """The admitted set is exactly the ratio-ordered prefix that fits
    the budget, ratios are correctly computed from exact sizes, and
    the cheap coarse rollup is always admitted."""
    rows = QUERIES["mv_advisor"](spark, SF).collect()
    fact = rows[0].fact_rows
    budget = fact * 30 // 100
    ratios = [
        r.freq * (fact - r.view_rows) / r.view_rows for r in rows
    ]
    assert ratios == sorted(ratios, reverse=True)
    cum = 0
    for r in rows:
        cum += r.view_rows
        assert r.cum_rows == cum
        assert r.materialize == (cum <= budget)
    by_name = {r.view_name: r for r in rows}
    assert by_name["v_returnflag"].materialize  # 4-row view: free win


def test_table_fingerprint_order_invariant_and_edit_sensitive(spark):
    """The fingerprint is identical under arbitrary reordering /
    repartitioning, and any single-row edit changes it."""
    rows = {
        r.tbl: r for r in QUERIES["table_fingerprint"](spark, SF).collect()
    }
    nat = read_table(spark, SF, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )

    def fp(df):
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        *[F.col(c).cast("string") for c in df.columns],
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        r = df.select(h.alias("h")).agg(
            F.count("*").alias("n"),
            (
                F.sum(F.col("h").cast("decimal(38,0)"))
                % F.lit(9223372036854775783).cast("decimal(38,0)")
            ).cast("bigint").alias("s"),
            F.expr("bit_xor(h)").cast("bigint").alias("x"),
        ).first()
        return (r.n, r.s, r.x)

    base = fp(nat)
    shuffled = fp(nat.orderBy(F.rand(7)).repartition(13))
    assert base == shuffled
    assert base == (
        rows["nation"].n_rows,
        rows["nation"].sum_fp,
        rows["nation"].xor_fp,
    )
    edited = fp(
        nat.withColumn(
            "n_name",
            F.when(F.col("n_nationkey") == 0, F.lit("EDITED")).otherwise(
                F.col("n_name")
            ),
        )
    )
    assert edited != base and edited[0] == base[0]


def test_result_cache_fingerprint_invalidation(spark, tmp_path_factory):
    """Same inputs -> cache hit with identical values and no
    recompute; any content change -> miss and fresh result; a
    reordered/repartitioned input is still a hit (fingerprints are
    order-independent)."""
    from mvp_mini_etl_pipeline_1762840347_spark.operators.result_cache import (
        ResultCache,
    )

    root = str(tmp_path_factory.mktemp("rc") / "cache")
    cache = ResultCache(spark, root)
    nat = read_table(spark, SF, "nation")
    cols = ("n_nationkey", "n_name", "n_regionkey")
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return nat.groupBy("n_regionkey").count()

    r1 = cache.get_or_compute("by_region", {"nation": (nat, cols)}, compute)
    v1 = {r.n_regionkey: r["count"] for r in r1.collect()}
    assert cache.last_hit is False and calls["n"] == 1

    shuffled = nat.orderBy(F.rand(3)).repartition(7)
    r2 = cache.get_or_compute(
        "by_region", {"nation": (shuffled, cols)}, compute
    )
    assert cache.last_hit is True and calls["n"] == 1
    assert {r.n_regionkey: r["count"] for r in r2.collect()} == v1

    edited = nat.withColumn(
        "n_name",
        F.when(F.col("n_nationkey") == 1, F.lit("X")).otherwise(
            F.col("n_name")
        ),
    )
    cache.get_or_compute("by_region", {"nation": (edited, cols)}, compute)
    assert cache.last_hit is False and calls["n"] == 2


def _xy2d_ref(n, x, y):
    rx = ry = 0
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_transform_matches_reference(spark):
    """The unrolled SQL stage pairs compute the textbook xy2d
    Hilbert distance for random cells."""
    import random

    from mvp_mini_etl_pipeline_1762840347_spark.plans.warehouse import (
        _hilbert_stage_sqls,
    )

    random.seed(11)
    pts = [(random.randrange(256), random.randrange(256)) for _ in range(300)]
    df = spark.createDataFrame(pts, "x: long, y: long").selectExpr(
        "x", "y", "x AS hx", "y AS hy", "CAST(0 AS BIGINT) AS hd"
    )
    for a, b in _hilbert_stage_sqls():
        df = df.selectExpr(*a).selectExpr(*b)
    got = {(r.x, r.y): r.hd for r in df.collect()}
    for x, y in pts:
        assert got[(x, y)] == _xy2d_ref(256, x, y), (x, y)


def test_hilbert_blocks_tighter_than_zorder(spark):
    """The locality claim: on the same data, quantization, and block
    count, the worst per-block bounding-box span of the Hilbert
    layout is <= Z-order's in BOTH dimensions (and every Hilbert
    block stays within the 32-cell quadrant bound)."""
    hz = QUERIES["hilbert_layout"](spark, SF).collect()
    zz = QUERIES["zorder_layout"](spark, SF).collect()

    def worst(rows):
        return (
            max(r.max_x - r.min_x for r in rows),
            max(r.max_y - r.min_y for r in rows),
        )

    hx, hy = worst(hz)
    zx, zy = worst(zz)
    assert hx <= zx and hy <= zy, (hx, hy, zx, zy)
    assert hx < 32 and hy < 32
    assert sum(r.n for r in hz) == sum(r.n for r in zz)


def test_scratch_dirs_bounded_and_prior_results_stay_readable(spark):
    """The process-scoped scratch root (round-7 verdict #4 + advice):
    repeated invocations of the mkdtemp-backed queries leave at most
    ONE live ``ttravel-*`` / ``rescache-*`` dir on the filesystem, and
    a caller holding TWO invocations' lazily-read results can still
    materialize the older one (no eager prune under it)."""
    import glob
    import tempfile

    from mvp_mini_etl_pipeline_1762840347_spark.plans import warehouse

    tmp = tempfile.gettempdir()

    def live(kind):
        return [
            d
            for d in glob.glob(f"{tmp}/{kind}-*")
            if warehouse._SCRATCH_ROOTS.get(kind) == d
        ]

    first_tt = QUERIES["snapshot_time_travel"](spark, SF)
    v1 = first_tt.collect()
    second_tt = QUERIES["snapshot_time_travel"](spark, SF)
    # both roots collapse to the single process-scoped one
    assert len(live("ttravel")) <= 1
    assert len(glob.glob(f"{tmp}/ttravel-*")) >= 1
    # the FIRST result is still readable after the SECOND ran
    assert first_tt.collect() == v1
    assert second_tt.collect() == v1

    first_rc = QUERIES["result_cache_serve"](spark, SF)
    r1 = first_rc.collect()
    QUERIES["result_cache_serve"](spark, SF).collect()
    assert len(live("rescache")) <= 1
    # prior invocation's served frame must not be pruned from under us
    assert sorted(map(tuple, first_rc.collect())) == sorted(map(tuple, r1))
