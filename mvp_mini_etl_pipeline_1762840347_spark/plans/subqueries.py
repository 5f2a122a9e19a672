"""Correlated / nested subquery shapes, decorrelated the way an
optimizer would (north-star analytics surface, SURVEY §0 layer 2).

SQL engines execute these as correlated subqueries; the Spark-first
form is the explicit decorrelation -- per-group aggregates joined
back, semi/anti joins for EXISTS / NOT EXISTS, and a broadcast
single-row cross join for uncorrelated scalar subqueries.  The DuckDB
oracles are written in the *subquery* form so the gate proves the
decorrelation is semantics-preserving.

Scale notes: every decorrelation below turns O(outer x inner) nested
evaluation into one shuffle-bounded join; scalar subqueries become a
1-row broadcast (no shuffle at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table
from .registry import query

_BRAND = "Brand#12"
_QTY_HAVING = 150
_DORMANT_CUT = "2001-01-01"


# ---------------------------------------------------------------------------
# Scalar correlated subquery (TPC-H Q17 shape)
# ---------------------------------------------------------------------------
@query(
    "small_qty_revenue",
    oracle=f"""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
           count(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = '{_BRAND}'
      AND l_quantity < (
        SELECT 0.5 * avg(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey
      )
    """,
)
def small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average yearly revenue lost if small-quantity orders of one
    brand's parts were no longer taken (scalar subquery correlated on
    partkey).  Decorrelation: per-part avg quantity computed once with
    a groupBy, then broadcast-joined back -- the inner table is scanned
    twice but shuffled only on its own aggregation, vs. the nested
    form's per-row rescan."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == _BRAND
    ).select("p_partkey")
    # partkey determines brand, so restricting lineitem to the brand's
    # parts FIRST leaves the per-part average unchanged while the
    # decorrelated aggregate runs over the pruned subset only
    brand_items = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).drop(
        "p_partkey"
    )
    per_part = brand_items.groupBy("l_partkey").agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        brand_items.join(F.broadcast(per_part), "l_partkey")
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# EXISTS -> left-semi join with non-equi condition (TPC-H Q4 shape)
# ---------------------------------------------------------------------------
@query(
    "late_ship_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    """,
)
def late_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders (per priority) with at least one lineitem shipped more
    than 60 days after the order date.  EXISTS becomes a left-semi
    join whose condition carries both the equi key (orderkey -- the
    shuffle key) and the non-equi lateness predicate (evaluated post
    hash-match, no extra pass)."""
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAY")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# ---------------------------------------------------------------------------
# IN over a HAVING subquery (TPC-H Q18 shape)
# ---------------------------------------------------------------------------
@query(
    "big_volume_customers",
    oracle=f"""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > {_QTY_HAVING}
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
    """,
)
def big_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers behind the largest-volume orders.  The IN-subquery is
    the per-order quantity aggregate reused directly: aggregate once,
    filter with HAVING, then join the (now tiny) key set back as a
    broadcast semi -- lineitem shuffles once on orderkey and that
    partitioning is reused by both the aggregate and the final join."""
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > _QTY_HAVING)
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "total_qty")
    )


# ---------------------------------------------------------------------------
# Uncorrelated scalar subquery + NOT EXISTS anti join (TPC-H Q22 shape)
# ---------------------------------------------------------------------------
@query(
    "dormant_rich_customers",
    oracle=f"""
    SELECT c_mktsegment,
           count(*) AS n_customers,
           round(sum(c_acctbal), 2) AS total_bal
    FROM customer c
    WHERE c_acctbal > (
        SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '{_DORMANT_CUT}'
      )
    GROUP BY c_mktsegment
    """,
)
def dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers with no recent order, by
    segment.  The uncorrelated scalar avg is a 1-row broadcast cross
    join (evaluated exactly once); NOT EXISTS is a left-anti join
    against the date-filtered orders -- the filter pushes into the
    orders scan so the anti side is small before it shuffles."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(_DORMANT_CUT).cast("timestamp")
    ).select("o_custkey")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


# ---------------------------------------------------------------------------
# Nested EXISTS + NOT EXISTS on the same table (TPC-H Q21 shape)
# ---------------------------------------------------------------------------
@query(
    "sole_late_supplier",
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3 JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s.s_name
    """,
)
def sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late lineitems whose supplier is the ONLY late supplier on a
    multi-supplier order (Q21's nested EXISTS + NOT EXISTS on the
    same fact table), counted per supplier.

    Decorrelation collapses both correlated subqueries into per-order
    DISTINCT-SUPPLIER counts computed as WINDOW aggregates over the
    joined facts (size(collect_set(..)) over the l_orderkey window --
    set sizes are bounded by suppliers-per-order, single digits), so
    the blame filter applies in the SAME shuffle that produced the
    counts: lineitem is scanned once and moves on orderkey exactly
    once, versus the nested form's three correlated rescans and the
    aggregate-then-join-back form's two scans (the plan property
    tests/test_scale.py pins)."""
    from pyspark.sql.window import Window

    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    s = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    lo = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
        ).alias("is_late"),
    )
    w = Window.partitionBy("l_orderkey")
    blamed = (
        lo.withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late_supp",
            F.size(
                F.collect_set(
                    F.when(F.col("is_late"), F.col("l_suppkey"))
                ).over(w)
            ),
        )
        .filter(
            F.col("is_late")
            & (F.col("n_supp") > 1)
            & (F.col("n_late_supp") == 1)
        )
    )
    return (
        blamed.join(F.broadcast(s), blamed.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Min-cost supplier per part (Q2-style correlated scalar min, decorrelated)
# ---------------------------------------------------------------------------
@query(
    "min_cost_supplier",
    oracle="""
    WITH per_supp AS (
      SELECT l_partkey, l_suppkey,
             min({'u': l_extendedprice / l_quantity,
                  'p': l_extendedprice, 'q': l_quantity}) AS m
      FROM lineitem GROUP BY 1, 2
    ),
    winners AS (
      SELECT l_partkey,
             min({'u': m.u, 'k': l_suppkey, 'p': m.p, 'q': m.q}) AS w,
             count(*) AS n_suppliers
      FROM per_supp GROUP BY 1
    )
    SELECT r.l_partkey, s.s_name AS best_supplier,
           r.w.u AS best_unit_cost, r.w.p AS best_price,
           r.w.q AS best_qty, r.n_suppliers
    FROM winners r JOIN supplier s ON s.s_suppkey = r.w.k
    WHERE r.n_suppliers >= 4
    """,
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every contested part (4+ observed suppliers), the supplier
    with the lowest observed unit price -- TPC-H Q2's correlated
    scalar subquery ("cost = (SELECT min(cost) ... WHERE same
    part)"), decorrelated into cascaded aggregations.  The testdata
    carries no partsupp table, so supply cost is the best unit price
    observed in lineitem.

    Cross-engine float discipline: the reported cost is a MIN over
    bit-identical per-row doubles carried inside a lexicographic
    struct-min (unit cost, then supplier key as deterministic
    tie-break), so the output needs NO rounding at all -- an
    averaged-then-rounded cost flips at decimal grid boundaries
    because engines round the same double differently, while the
    winning line's raw values are hash-identical by construction.

    Scale shape: two cascaded aggregations -- (part, supplier) grain,
    then part grain where the winner is a second struct-min and the
    supplier tally an ordinary count -- so the whole decorrelation is
    partial-aggregated, map-side combined, and SORT-FREE (the first
    draft ranked with row_number over a partkey window, which sorts
    the entire aggregated frame; the agg form halved sf0.1 wall
    time).  Supplier names attach by broadcast.  Against the
    correlated form this removes the per-part rescan; against
    aggregate-then-join-back it removes the second shuffle."""
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    per_supp = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.struct(
                (F.col("l_extendedprice") / F.col("l_quantity")).alias("u"),
                F.col("l_extendedprice").alias("p"),
                F.col("l_quantity").alias("q"),
            )
        ).alias("m")
    )
    winners = per_supp.groupBy("l_partkey").agg(
        F.min(
            F.struct(
                F.col("m.u").alias("u"),
                F.col("l_suppkey").alias("k"),
                F.col("m.p").alias("p"),
                F.col("m.q").alias("q"),
            )
        ).alias("w"),
        F.count("*").alias("n_suppliers"),
    ).filter(F.col("n_suppliers") >= 4)
    return winners.join(F.broadcast(s), winners["w.k"] == s.s_suppkey).select(
        "l_partkey",
        F.col("s_name").alias("best_supplier"),
        F.col("w.u").alias("best_unit_cost"),
        F.col("w.p").alias("best_price"),
        F.col("w.q").alias("best_qty"),
        "n_suppliers",
    )


# ---------------------------------------------------------------------------
# Q9-class profit rollup (nation x year), exact-integer summation
# ---------------------------------------------------------------------------
@query(
    "profit_by_nation_year",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY 1
    ),
    terms AS (
      SELECT n.n_name AS nation,
             CAST(extract(year FROM o.o_orderdate) AS BIGINT) AS o_year,
             CAST(round((l.l_extendedprice * (1 - l.l_discount)
                         - l.l_quantity * c.unit_cost) * 100) AS BIGINT)
               AS amount_cents
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN cost c     ON c.l_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
    )
    SELECT nation, o_year,
           round(sum(amount_cents) / 100.0, 2) AS profit,
           count(*) AS n_lines
    FROM terms GROUP BY 1, 2
    """,
)
def profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit by supplier nation and order year -- TPC-H Q9's shape
    (revenue minus supply cost, rolled up by nation x year) with the
    supply cost proxied by each part's best observed unit price
    (min_cost_supplier's cost model; the testdata has no partsupp).

    Float discipline, third pattern: a grouped SUM of float products
    diverges between engines by summation order, and rounding the
    group total cannot fix what the sum already scrambled.  Here each
    ROW's amount -- arithmetic on bit-identical doubles, including
    the min-derived unit cost -- is integerized to cents FIRST
    (per-row round is engine-identical), and groups then sum exact
    BIGINTs; the only float op after aggregation is one division on
    identical operands.  SCALE.md documents the family.

    Scale: the cost table is a per-part aggregate joined back
    broadcast-or-shuffle by size; dimensions broadcast; one fact
    shuffle on partkey (cost attach) and one grouped aggregation on
    the 175-cell (nation, year) grid."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    s = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    n = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cost = li.groupBy("l_partkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "unit_cost"
        )
    )
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("l_quantity") * F.col("unit_cost")
    )
    terms = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cost, "l_partkey")
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            F.round(amount * 100).cast("bigint").alias("amount_cents"),
        )
    )
    return terms.groupBy("nation", "o_year").agg(
        F.round(F.sum("amount_cents") / 100.0, 2).alias("profit"),
        F.count("*").alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# Important parts (Q11-class: HAVING against a global scalar aggregate)
# ---------------------------------------------------------------------------
@query(
    "important_parts",
    oracle="""
    WITH pv AS (
      SELECT l_partkey,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS val_cents
      FROM lineitem GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(val_cents) AS BIGINT) AS total_cents,
             count(*) AS n_parts
      FROM pv
    )
    SELECT l_partkey, val_cents,
           round(val_cents / 100.0, 2) AS part_value
    FROM pv, tot
    WHERE val_cents * 2 * n_parts > 3 * total_cents
    """,
)
def important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts carrying an outsized share of total discounted revenue
    -- TPC-H Q11's shape (GROUP BY ... HAVING sum() > scalar subquery
    over the same aggregate), the one decorrelation class the
    registry lacked: the filter threshold is itself an aggregate of
    the grouped result.  Q11's fixed fraction shrinks with scale
    factor, so the threshold here is 1.5x the MEAN per-part value
    (``val * 2n > 3 * total`` in exact BIGINT cents) -- selectivity
    is scale-invariant and no float crosses the engine boundary.

    Scale: ONE fact scan -- the per-part aggregate subtree feeding
    both the grouped rows and the global total is byte-identical, so
    Spark's ReuseExchange collapses the two branches onto a single
    shuffle (pinned in tests/test_scale.py); the 1-row total then
    broadcasts back.  This is the plan Q11 wants at 100 TB: the
    scalar subquery costs one re-aggregation of the already-shuffled
    group rows, never a second pass over lineitem.  (Reference has
    no subquery surface; its whole data layer is src/lib/users.js +
    src/lib/spacex.js.)"""
    li = read_table(spark, sf_dir, "lineitem")
    pv = (
        li.select(
            "l_partkey",
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            )
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("l_partkey")
        .agg(F.sum("cents").cast("bigint").alias("val_cents"))
    )
    tot = pv.agg(
        F.sum("val_cents").cast("bigint").alias("total_cents"),
        F.count("*").alias("n_parts"),
    )
    return (
        pv.join(F.broadcast(tot))
        .filter(
            F.col("val_cents") * 2 * F.col("n_parts")
            > 3 * F.col("total_cents")
        )
        .select(
            "l_partkey",
            "val_cents",
            F.round(F.col("val_cents") / 100.0, 2).alias("part_value"),
        )
    )


# ---------------------------------------------------------------------------
# NOT IN -> broadcast anti-join over a grouped distinct count (TPC-H Q16)
# ---------------------------------------------------------------------------
_Q16_SIZES = (1, 9, 14, 19, 23, 36, 45, 49)


@query(
    "supplier_part_kinds",
    oracle=f"""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#12'
      AND p_type <> 'PROMO'
      AND p_size IN {_Q16_SIZES!r}
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def supplier_part_kinds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many suppliers can source each (brand, type, size) kind of
    part, excluding delinquent suppliers -- TPC-H Q16's shape (grouped
    count-distinct behind a NOT IN subquery), adapted to this schema:
    lineitem is the part<->supplier bridge (no partsupp table) and the
    exclusion set is negative-balance suppliers (no s_comment column).

    Scale: the NOT IN subquery decorrelates to a broadcast ANTI join
    (the exclusion set is a filtered dimension, tiny even at 100 TB);
    part filters broadcast onto the fact scan, and the distinct pairs
    reduce to one shuffle keyed by the group columns + suppkey with
    map-side partial distinct.  NOT IN's null trap does not bite:
    s_suppkey is a non-null key, so ANTI join is exactly equivalent.
    (Reference has no subquery surface; its whole data layer is
    src/lib/users.js + src/lib/spacex.js.)"""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    p = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#12")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(*_Q16_SIZES)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = read_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Nested IN chain with correlated HAVING (TPC-H Q20 shape)
# ---------------------------------------------------------------------------
_Q20_NATIONS = ("NATION_3", "NATION_7", "NATION_11", "NATION_19", "NATION_23")
_Q20_PREFIX = "red "
_Q20_MIN_QTY = 40
_Q20_YEAR = 1995


@query(
    "promotable_suppliers",
    oracle=f"""
    SELECT s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN {_Q20_NATIONS!r}
      AND s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE '{_Q20_PREFIX}%')
        GROUP BY l_partkey, l_suppkey
        HAVING sum(CAST(l_quantity AS BIGINT)) >= {_Q20_MIN_QTY}
           AND 2 * sum(CASE WHEN year(l_shipdate) = {_Q20_YEAR}
                            THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
             > sum(CAST(l_quantity AS BIGINT))
      )
    """,
)
def promotable_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers in a nation set who front-loaded a red part: over
    half of their lifetime shipped quantity of some sufficiently-
    traded red-prefixed part went out in {year} -- TPC-H Q20's shape
    (IN chain three subqueries deep with a HAVING correlated on the
    middle level), adapted to this schema: shipped quantity stands in
    for ps_availqty, and the 50%%-of-volume test compares two
    aggregates of the SAME grouped rows instead of two tables.

    Scale: innermost part filter broadcasts onto the fact scan
    (semi-join); the correlated HAVING decorrelates into ONE
    (partkey, suppkey) aggregation carrying both the total and the
    conditional {year} sum as integer columns -- no second lineitem
    pass and no float across the engine boundary; the outer IN is a
    left-semi join onto the tiny supplier dimension, then a broadcast
    nation join.  (Reference has no subquery surface; its whole data layer
    is src/lib/users.js + src/lib/spacex.js.)"""
    li = read_table(spark, sf_dir, "lineitem")
    red = read_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith(_Q20_PREFIX)
    ).select("p_partkey")
    qty = F.col("l_quantity").cast("bigint")
    pairs = (
        li.join(F.broadcast(red), li.l_partkey == red.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(qty).alias("qty_all"),
            F.sum(
                F.when(F.year("l_shipdate") == _Q20_YEAR, qty).otherwise(
                    F.lit(0)
                )
            ).alias("qty_year"),
        )
        .filter(
            (F.col("qty_all") >= _Q20_MIN_QTY)
            & (2 * F.col("qty_year") > F.col("qty_all"))
        )
        .select("l_suppkey")
    )
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(*_Q20_NATIONS)
    )
    return (
        s.join(pairs, s.s_suppkey == pairs.l_suppkey, "left_semi")
        .join(
            F.broadcast(n), s.s_nationkey == n.n_nationkey
        )
        .select("s_suppkey", "s_name", "n_name")
    )


promotable_suppliers.__doc__ = promotable_suppliers.__doc__.replace(
    "{year}", str(_Q20_YEAR)
)
