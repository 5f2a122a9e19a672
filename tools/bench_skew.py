"""Measure hot-key skew handling: a join where one key carries most
of the rows, run (a) plain with AQE skew split disabled, (b) plain
with AQE skew split on, (c) salted_join -- broadcast disabled so the
shuffle join is the thing measured.

Usage: python tools/bench_skew.py [n_rows] [hot_fraction]

Prints one JSON line; numbers land in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mvp_mini_etl_pipeline_1762840347_spark.operators.scale import (  # noqa: E402
    salted_join,
)
from mvp_mini_etl_pipeline_1762840347_spark.session import get_spark  # noqa: E402


def _run(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    spark = get_spark("bench_skew")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    # big side: hot_frac of rows on key 0, the rest uniform over 10k keys
    big = spark.range(n_rows).select(
        F.when(
            (F.col("id") % 100) < int(hot_frac * 100), F.lit(0)
        )
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(10_000)))
        .alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(10_000).select(
        F.col("id").alias("k2"), (F.col("id") * 2).alias("v")
    )
    joined_plain = big.join(small, big.k == small.k2).groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("sv")
    )
    joined_salted = salted_join(big, small, "k", "k2", n_salts=16).groupBy(
        "k"
    ).agg(F.count("*").alias("n"), F.sum("v").alias("sv"))

    results = {}
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    _run(joined_plain)
    results["plain_no_skew_handling_sec"] = round(
        min(_run(joined_plain) for _ in range(3)), 3
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    _run(joined_plain)
    results["plain_aqe_skew_split_sec"] = round(
        min(_run(joined_plain) for _ in range(3)), 3
    )
    _run(joined_salted)
    results["salted_join_sec"] = round(
        min(_run(joined_salted) for _ in range(3)), 3
    )
    results.update(
        {"n_rows": n_rows, "hot_fraction": hot_frac, "n_salts": 16}
    )
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
