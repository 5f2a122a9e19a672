"""Distributed prefix sum: global running totals in key order WITHOUT
a global window.

The naive form -- ``sum(x) OVER (ORDER BY key)`` with no PARTITION BY
-- moves the entire table through one reducer (the scale-killer class
the plan audit bans).  This operator computes the identical result as
a three-level hierarchical scan, the classic parallel prefix-sum
decomposition:

1. rows cumsum WITHIN a bucket of the key space   (partitioned window)
2. bucket totals cumsum WITHIN a super-bucket     (partitioned window)
3. super-bucket totals cumsum globally            (unpartitioned, but
   over N / (bucket_width * super_width) rows -- with the default
   4096 x 4096 widths a 10^11-row table yields ~6 super rows, so the
   "global" step is trivially bounded; recurse another level if a
   key space ever outgrows width^3)

Every row then reconstructs its exclusive global prefix as
``within-bucket prefix + bucket offset (within super) + super offset``.
The per-row work is one partitioned window plus one equi-join against
the bucket-offset table (N / bucket_width rows -- broadcastable for
most real tables, an ordinary shuffle join otherwise).

This unlocks the order-dependent analytics that otherwise force a
single reducer: global running totals, exact sequence packing
(plans/packing.py), systematic sampling with exact periods over
sparse keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def exclusive_cumsum(
    df: DataFrame,
    key: str,
    value: Column | str,
    out: str = "cumsum_before",
    bucket_width: int = 4096,
    super_width: int = 4096,
    partition_by: str | None = None,
) -> DataFrame:
    """Add column ``out`` = sum of ``value`` over all rows with a
    strictly smaller ``key`` (exclusive global prefix sum) -- within
    each ``partition_by`` group if given (the per-group scan: an
    independent prefix sum per source/tenant/day in ONE pass).

    ``key`` must be unique per row (it defines the global order;
    per-group, unique within the group suffices).  Result is
    identical to ``coalesce(sum(value) OVER ([PARTITION BY g] ORDER
    BY key ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)``
    on any partitioning -- asserted in tests/test_operators.py -- but
    no stage ever sees more than max(bucket rows, N/bucket_width,
    N/(bucket_width*super_width)) rows in one task.  With
    ``partition_by``, even the level-2 window is partitioned by the
    group, so low-cardinality groups never serialize the full table
    through one reducer the way ``Window.partitionBy(g)`` over raw
    rows would.
    """
    parts = [partition_by] if partition_by else []
    v = F.col(value) if isinstance(value, str) else value
    b0 = F.floor(F.col(key) / bucket_width).alias("__b0")
    staged = df.withColumn("__v", v).withColumn("__b0", b0).withColumn(
        "__b1", F.floor(F.col("__b0") / super_width)
    )

    w0 = (
        Window.partitionBy(*parts, "__b0")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = F.coalesce(F.sum("__v").over(w0), F.lit(0).cast("bigint"))

    # Level 1: per-(group, bucket) totals, cumulated within each
    # (group, super-bucket).
    b0_sums = staged.groupBy(*parts, "__b0", "__b1").agg(
        F.sum("__v").alias("__s0")
    )
    w1 = (
        Window.partitionBy(*parts, "__b1")
        .orderBy("__b0")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    b0_local = b0_sums.withColumn(
        "__off0", F.coalesce(F.sum("__s0").over(w1), F.lit(0).cast("bigint"))
    )

    # Level 2: per-(group, super) totals, cumulated across supers.
    # Unpartitioned only in the global case, and even then its input
    # is the super-bucket aggregate -- N/(bucket_width*super_width)
    # rows by construction.
    b1_sums = b0_sums.groupBy(*parts, "__b1").agg(F.sum("__s0").alias("__s1"))
    w2 = (
        Window.partitionBy(*parts)
        .orderBy("__b1")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    b1_off = b1_sums.withColumn(
        "__off1", F.coalesce(F.sum("__s1").over(w2), F.lit(0).cast("bigint"))
    ).select(*parts, "__b1", "__off1")

    offsets = (
        b0_local.join(F.broadcast(b1_off), [*parts, "__b1"])
        .select(
            *parts,
            "__b0",
            (F.col("__off0") + F.col("__off1")).alias("__bucket_off"),
        )
    )
    return (
        staged.join(offsets, [*parts, "__b0"])
        .withColumn(out, (within + F.col("__bucket_off")).cast("bigint"))
        .drop("__v", "__b0", "__b1", "__bucket_off")
    )


def exclusive_cummax(
    df: DataFrame,
    key: str,
    value: Column | str,
    out: str = "cummax_before",
    floor: int = -(1 << 62),
    bucket_width: int = 4096,
    super_width: int = 4096,
    partition_by: str | None = None,
) -> DataFrame:
    """Add column ``out`` = max of ``value`` over all rows with a
    strictly smaller ``key`` (exclusive global prefix MAX; ``floor``
    for the first row) -- the same three-level hierarchical scan as
    ``exclusive_cumsum`` with (max, floor) in place of (+, 0): max is
    associative, so within-bucket prefix maxima combine with bucket
    and super-bucket offsets by ``greatest`` instead of ``+``.  Result
    is identical to ``coalesce(max(value) OVER ([PARTITION BY g]
    ORDER BY key ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
    floor)`` with no stage ever holding more than the cumsum's
    bounds.  Unlocks sorted-scan operators: 2-D skyline
    (plans/analytics.py::skyline_parts), record running peaks,
    monotone envelope checks."""
    parts = [partition_by] if partition_by else []
    v = F.col(value) if isinstance(value, str) else value
    flit = F.lit(floor).cast("bigint")
    staged = (
        df.withColumn("__v", v)
        .withColumn("__b0", F.floor(F.col(key) / bucket_width))
        .withColumn("__b1", F.floor(F.col("__b0") / super_width))
    )

    w0 = (
        Window.partitionBy(*parts, "__b0")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = F.coalesce(F.max("__v").over(w0), flit)

    b0_maxs = staged.groupBy(*parts, "__b0", "__b1").agg(
        F.max("__v").alias("__s0")
    )
    w1 = (
        Window.partitionBy(*parts, "__b1")
        .orderBy("__b0")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    b0_local = b0_maxs.withColumn(
        "__off0", F.coalesce(F.max("__s0").over(w1), flit)
    )

    b1_maxs = b0_maxs.groupBy(*parts, "__b1").agg(
        F.max("__s0").alias("__s1")
    )
    w2 = (
        Window.partitionBy(*parts)
        .orderBy("__b1")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    b1_off = b1_maxs.withColumn(
        "__off1", F.coalesce(F.max("__s1").over(w2), flit)
    ).select(*parts, "__b1", "__off1")

    offsets = (
        b0_local.join(F.broadcast(b1_off), [*parts, "__b1"])
        .select(
            *parts,
            "__b0",
            F.greatest(F.col("__off0"), F.col("__off1")).alias(
                "__bucket_off"
            ),
        )
    )
    return (
        staged.join(offsets, [*parts, "__b0"])
        .withColumn(
            out,
            F.greatest(within, F.col("__bucket_off")).cast("bigint"),
        )
        .drop("__v", "__b0", "__b1", "__bucket_off")
    )
