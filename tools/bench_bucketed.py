"""Measure the bucketed-warehouse payoff: the order_fulfillment
big-big join (orders x lineitem on orderkey) against plain parquet vs
bucketed tables, broadcast disabled so the join strategy is the
variable under test.

Usage: python tools/bench_bucketed.py [sf_dir] [n_buckets]

Prints one JSON line; numbers land in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mvp_mini_etl_pipeline_1762840347_spark.io import read_table  # noqa: E402
from mvp_mini_etl_pipeline_1762840347_spark.operators.scale import (  # noqa: E402
    write_bucketed,
)
from mvp_mini_etl_pipeline_1762840347_spark.session import get_spark  # noqa: E402


def _agg(df):
    return (
        df.groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
    )


def _run(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark("bench_bucketed")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.sql("CREATE DATABASE IF NOT EXISTS bench_bucketed")
    spark.sql("USE bench_bucketed")

    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")

    t_load = time.time()
    write_bucketed(o, "bb_orders", "o_orderkey", n_buckets=n_buckets)
    write_bucketed(li, "bb_lineitem", "l_orderkey", n_buckets=n_buckets)
    load_s = time.time() - t_load

    plain = _agg(o.join(li, o.o_orderkey == li.l_orderkey))
    bo, bl = spark.table("bb_orders"), spark.table("bb_lineitem")
    bucketed = _agg(bo.join(bl, bo.o_orderkey == bl.l_orderkey))

    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    shuffle_free = "Exchange" not in plan

    # warm both paths once, then measure best-of-3
    _run(plain), _run(bucketed)
    plain_s = min(_run(plain) for _ in range(3))
    bucketed_s = min(_run(bucketed) for _ in range(3))

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_buckets": n_buckets,
                "one_time_bucketed_load_sec": round(load_s, 3),
                "plain_join_sec": round(plain_s, 3),
                "bucketed_join_sec": round(bucketed_s, 3),
                "speedup": round(plain_s / bucketed_s, 2),
                "bucketed_plan_shuffle_free": shuffle_free,
            }
        )
    )
    spark.sql("DROP TABLE IF EXISTS bb_orders")
    spark.sql("DROP TABLE IF EXISTS bb_lineitem")
    spark.sql("USE default")
    return 0


if __name__ == "__main__":
    sys.exit(main())
