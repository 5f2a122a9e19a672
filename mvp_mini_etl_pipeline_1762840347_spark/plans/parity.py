"""Reference-parity queries (SURVEY §2) over the driver star schema.

Each query reproduces one or more reference operators with Spark-first
plans: scans stay declarative so Catalyst pushes filters/projections
into the parquet scan, dimension joins are explicitly broadcast, and
aggregations rely on partial (map-side) aggregation.

Reference citations use file:line within /root/reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.js import clamped_pct, csv_quote, js_str_or
from ..io import read_table
from .registry import query

# JS-falsy coalesce in DuckDB SQL (F2 semantics, src/lib/users.js:69).
_JS_OR = "CASE WHEN {a} IS NOT NULL AND {a} <> '' THEN {a} ELSE {b} END"


# ---------------------------------------------------------------------------
# A1-A5 + A8: the buildMetrics global-aggregate record
# (reference src/lib/users.js:65-79) transplanted onto `customer`.
# ---------------------------------------------------------------------------
@query(
    "metrics_customer",
    oracle="""
    SELECT count(*)                                                   AS rows_in,
           count(*) FILTER (WHERE c_acctbal > 0 AND c_mktsegment <> '') AS rows_out,
           count(*) - count(*) FILTER (WHERE c_acctbal > 0 AND c_mktsegment <> '')
                                                                      AS dedup_removed,
           count(DISTINCT c_nationkey)                                AS countries,
           max_by(c_name, c_custkey)                                  AS last_record
    FROM customer
    """,
)
def metrics_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows_in/rows_out/dedup_removed/countries/lastRecord metrics.

    A1 count (users.js:66), A2 filtered count (users.js:67), A3 derived
    difference (users.js:68), A4 count-distinct (users.js:69), A5
    last-in-source-order (users.js:70) -- source order is the ingest
    key, so "last record" is max_by over c_custkey (see SURVEY §4 on
    the explicit-ordering convention).  Single global agg => one
    map-side partial + 1-row reduce; no full shuffle of the table.
    """
    c = read_table(spark, sf_dir, "customer")
    valid = (F.col("c_acctbal") > 0) & (F.col("c_mktsegment") != "")
    agg = c.agg(
        F.count("*").alias("rows_in"),
        F.count(F.when(valid, 1)).alias("rows_out"),
        F.countDistinct("c_nationkey").alias("countries"),
        F.max_by("c_name", "c_custkey").alias("last_record"),
    )
    return agg.select(
        "rows_in",
        "rows_out",
        (F.col("rows_in") - F.col("rows_out")).alias("dedup_removed"),
        "countries",
        "last_record",
    )


# ---------------------------------------------------------------------------
# P1 + F1/F2/F14: enrichment projection with JS-falsy defaults
# (reference src/lib/users.js:16-35)
# ---------------------------------------------------------------------------
@query(
    "projection_enrich",
    oracle=f"""
    SELECT 'user-' || CAST(c_custkey AS VARCHAR)                     AS id,
           trim(c_name)                                              AS name,
           {_JS_OR.format(a="c_mktsegment", b="'UNKNOWN'")}          AS segment,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END                                      AS balance_tier,
           trim(c_name) || ' (' ||
             {_JS_OR.format(a="c_mktsegment", b="'UNKNOWN'")} || ')' AS display
    FROM customer
    """,
)
def projection_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rename/derive/default projection (P1): id synthesis `user-${{idx}}`
    (users.js:17), trim-concat naming (users.js:18, F1), ||-default with
    empty-string-aware semantics (users.js:17-33, F2), display string
    (F3/F14).  Pure narrow projection -- no shuffle, column-pruned scan.
    """
    c = read_table(spark, sf_dir, "customer")
    segment = js_str_or(F.col("c_mktsegment"), F.lit("UNKNOWN"))
    name = F.trim(F.col("c_name"))
    return c.select(
        F.concat(F.lit("user-"), F.col("c_custkey").cast("string")).alias("id"),
        name.alias("name"),
        segment.alias("segment"),
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("balance_tier"),
        F.concat(name, F.lit(" ("), segment, F.lit(")")).alias("display"),
    )


# ---------------------------------------------------------------------------
# P3/P6: validity filter (reference src/lib/users.js:67,69)
# ---------------------------------------------------------------------------
@query(
    "filter_valid",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_acctbal > 0 AND c_mktsegment IS NOT NULL AND c_mktsegment <> ''
    """,
)
def filter_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`user.valid && user.email` truthiness filter (P3) + non-empty
    predicate (P6).  The predicate is pushed into the parquet scan
    (verify: PushedFilters in .explain)."""
    c = read_table(spark, sf_dir, "customer")
    return c.filter(
        (F.col("c_acctbal") > 0)
        & F.col("c_mktsegment").isNotNull()
        & (F.col("c_mktsegment") != "")
    ).select("c_custkey", "c_name", "c_acctbal")


# ---------------------------------------------------------------------------
# P7 + F10: point lookup with string-cast loose equality
# (reference pages/launch/[id].js:33)
# ---------------------------------------------------------------------------
@query(
    "point_lookup",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE CAST(o_orderkey AS VARCHAR) = '42'
    """,
)
def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`find(item => String(item.id) == params.id)`: cast-to-string
    equality on the key (P7/F10).

    The raw `cast(key as string) = probe` predicate is opaque to
    parquet pushdown (the cast hides the column).  When the probe
    parses as the key's native type, the engine adds the equivalent
    typed conjunct `key = typed_probe`, which DOES push down
    (PushedFilters: EqualTo) -- at 100 TB that is the difference
    between a point read and a full scan.  The string comparison is
    kept as the semantic guard for non-numeric probes."""
    probe = "42"
    o = read_table(spark, sf_dir, "orders")
    cond = F.col("o_orderkey").cast("string") == F.lit(probe)
    try:
        cond = cond & (F.col("o_orderkey") == F.lit(int(probe)))
    except ValueError:
        pass  # non-numeric probe: loose equality alone (never matches a bigint key)
    return o.filter(cond).select("o_orderkey", "o_orderstatus", "o_totalprice")


# ---------------------------------------------------------------------------
# P8: per-row CASE (reference pages/launch/[id].js:16)
# ---------------------------------------------------------------------------
@query(
    "case_status",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'F' THEN 'Success'
                WHEN o_orderstatus = 'O' THEN 'Upcoming'
                ELSE 'Failed' END AS status
    FROM orders
    """,
)
def case_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """status = success ? 'Success' : upcoming ? 'Upcoming' : 'Failed'."""
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "Success")
        .when(F.col("o_orderstatus") == "O", "Upcoming")
        .otherwise("Failed")
        .alias("status"),
    )


# ---------------------------------------------------------------------------
# J1/J2: broadcast left-outer lookup joins with ||-defaults on miss
# (reference src/lib/spacex.js:24-25,32-33)
# ---------------------------------------------------------------------------
@query(
    "join_lookup_default",
    oracle=f"""
    SELECT c_custkey, c_name,
           {_JS_OR.format(a="n_name", b="'Unknown'")} AS nation_name,
           coalesce(r_name, 'Unknown')                AS region_name
    FROM customer
    LEFT JOIN nation ON c_nationkey = n_nationkey AND n_nationkey < 20
    LEFT JOIN region ON n_regionkey = r_regionkey
    """,
)
def join_lookup_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension lookup joins J1/J2.  The reference does an O(n*m)
    `rockets.find(...)` per launch (spacex.js:24); here the dimension
    side is explicitly `broadcast()` so the fact table never shuffles
    -- the shape that survives a 100 TB fact side.  The `n_nationkey <
    20` join condition manufactures misses to exercise the
    'Unknown'-default path (spacex.js:32)."""
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 20)
    r = read_table(spark, sf_dir, "region")
    joined = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey, "left"
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
    return joined.select(
        "c_custkey",
        "c_name",
        js_str_or(F.col("n_name"), F.lit("Unknown")).alias("nation_name"),
        F.coalesce(F.col("r_name"), F.lit("Unknown")).alias("region_name"),
    )


# ---------------------------------------------------------------------------
# J3: array-membership join + group-collect (reference src/lib/spacex.js:26-28,34-35)
# ---------------------------------------------------------------------------
@query(
    "array_membership_join",
    oracle="""
    SELECT l_orderkey                                   AS order_key,
           count(*)                                     AS payloads_count,
           array_to_string(list_sort(list(p_name)), ',') AS payload_names
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY l_orderkey
    """,
)
def array_membership_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload collection per launch (J3 + A7): for each order, collect
    the full rows of its referenced parts plus their count.  The
    reference filters the payload table per launch (O(n*m),
    spacex.js:26-28); the scalable shape is explode->equi-join->
    group-collect: one broadcast join + one shuffle on the group key.
    The collected array is sorted + joined to a string so the result is
    deterministic and oracle-comparable."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("l_orderkey").alias("order_key"))
        .agg(
            F.count("*").alias("payloads_count"),
            F.array_join(F.array_sort(F.collect_list("p_name")), ",").alias(
                "payload_names"
            ),
        )
    )


# ---------------------------------------------------------------------------
# J4: union-as-concat (reference src/lib/spacex.js:16)
# ---------------------------------------------------------------------------
@query(
    "union_all",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM (
      SELECT * FROM orders WHERE o_orderstatus = 'O'
      UNION ALL
      SELECT * FROM orders WHERE o_orderstatus = 'F'
    )
    GROUP BY o_orderpriority
    """,
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[...past, ...upcoming] concat == UNION ALL (duplicates kept)."""
    o = read_table(spark, sf_dir, "orders")
    past = o.filter(F.col("o_orderstatus") == "O")
    upcoming = o.filter(F.col("o_orderstatus") == "F")
    return (
        past.unionByName(upcoming)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# L1: tail-limit with explicit order (reference src/lib/spacex.js:40)
# ---------------------------------------------------------------------------
@query(
    "tail_limit",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM orders ORDER BY o_orderkey DESC LIMIT 150
    """,
)
def tail_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`enriched.slice(-150)`: last 150 in source order.  Distributed
    Spark has no stable tail, so order is the explicit ingest key;
    Catalyst turns orderBy+limit into a TakeOrdered top-k (no full
    sort)."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_orderkey").desc())
        .limit(150)
        .select("o_orderkey", "o_orderdate", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# L2/L3: head-limit (reference pages/index.js:229,268)
# ---------------------------------------------------------------------------
@query(
    "head_limit",
    oracle="SELECT c_custkey, c_name FROM customer ORDER BY c_custkey LIMIT 20",
)
def head_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`users.slice(0, 20)` with explicit ingest order."""
    c = read_table(spark, sf_dir, "customer")
    return c.orderBy("c_custkey").limit(20).select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# F1/F3/F8/F9/F12 + F7-shape: scalar function showcase
# ---------------------------------------------------------------------------
@query(
    "scalar_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                                        AS name_upper,
           p_brand || ': ' || p_type                            AS brand_type,
           round(least(CAST(p_size AS DOUBLE) / 50 * 100, 100), 2) AS size_pct,
           '"' || replace(p_name, '"', '""') || '"'             AS name_quoted,
           regexp_extract('https://' || p_brand || '.example.com/p',
                          'https?://([^/]+)/', 1)               AS host
    FROM part
    """,
)
def scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar layer: upper (F9, pages/index.js:323), template concat
    (F3), clamped percentage (F12, pages/index.js:291), CSV quoting
    rule (F8, pages/index.js:426-430), URL hostname extraction (F7,
    pages/index.js:417-424; regexp form so the oracle dialect
    matches)."""
    p = read_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.concat(F.col("p_brand"), F.lit(": "), F.col("p_type")).alias("brand_type"),
        F.round(clamped_pct(F.col("p_size").cast("double"), F.lit(50)), 2).alias(
            "size_pct"
        ),
        csv_quote(F.col("p_name")).alias("name_quoted"),
        F.regexp_extract(
            F.concat(F.lit("https://"), F.col("p_brand"), F.lit(".example.com/p")),
            r"https?://([^/]+)/",
            1,
        ).alias("host"),
    )


# ---------------------------------------------------------------------------
# F4/F5/F6: timestamp parse/format/epoch (reference pages/analytics.js:32, ...)
# ---------------------------------------------------------------------------
@query(
    "datetime_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER)  AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month,
           strftime(o_orderdate, '%Y-%m')      AS order_ym,
           epoch_ms(o_orderdate)               AS epoch_millis,
           date_trunc('month', o_orderdate)    AS month_start,
           strftime(o_orderdate, '%-m/%-d/%Y, %-I:%M:%S %p') AS locale_display
    FROM orders
    """,
)
def datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp functions: parse/format (F4), epoch millis (F6),
    truncation.  Session TZ pinned UTC so values agree with the
    UTC-naive oracle."""
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_ym"),
        # Parquet timestamps load as TIMESTAMP_NTZ; session TZ is pinned
        # UTC so casting to TIMESTAMP is exact and matches epoch_ms on
        # DuckDB's UTC-naive timestamps.
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("epoch_millis"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        # F4: new Date(d).toLocaleString() en-US display form
        # (reference pages/analytics.js:32) = 'M/d/yyyy, h:mm:ss a'.
        F.date_format("o_orderdate", "M/d/yyyy, h:mm:ss a").alias(
            "locale_display"
        ),
    )


# ---------------------------------------------------------------------------
# North-star group-by aggregation (TPC-H Q1 shape) -- SURVEY §2.5 note
# ---------------------------------------------------------------------------
@query(
    "groupby_pricing",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                       AS sum_qty,
           round(sum(l_extendedprice), 2)                                  AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)               AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 2)                                       AS avg_qty,
           round(avg(l_discount), 4)                                       AS avg_disc,
           count(*)                                                        AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def groupby_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed aggregation generalizing the reference's global metrics
    (SURVEY §2.5): the classic pricing-summary shape.  Map-side partial
    aggregation means the shuffle carries only (2-key x few-groups)
    partials, not 600k rows -- the property that makes this plan flat
    at 100 TB."""
    li = read_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "groupby_segment",
    oracle="""
    SELECT c_mktsegment,
           count(*)                        AS n_orders,
           round(sum(o_totalprice), 2)     AS total_price,
           round(avg(o_totalprice), 2)     AS avg_price,
           count(DISTINCT o_custkey)       AS n_customers
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def groupby_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dim join + keyed agg (launches-per-rocket shape from
    SURVEY §2.5).  customer is broadcast: at 100 TB the orders side
    never moves for the join; the only shuffle is the low-cardinality
    group-by."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


# ---------------------------------------------------------------------------
# Window functions: scalable form of A5/L1 (SURVEY §2.10)
# ---------------------------------------------------------------------------
@query(
    "window_rank",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: row_number over a unique-tiebreak
    ordering (deterministic in both engines)."""
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_analytics",
    oracle="""
    SELECT o_custkey, o_orderkey,
           lag(o_totalprice) OVER w                                    AS prev_price,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag + running sum per customer in event order (analytic window
    surface; also the scalable replacement for 'last record')."""
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.round(
            F.sum("o_totalprice").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            2,
        ).alias("running_total"),
    )
