"""Test the single-row-group caveat (BASELINE.md): rewrite lineitem
into a multi-file layout and time the same scan-dominated aggregation
on both.

Measured outcome at sf0.1 (recorded in BASELINE.md): NO warm-path win
(0.8x -- 32-task scheduling overhead exceeds the parallelism gain on
600k cached rows).  That is itself the useful number: local per-query
bench times are NOT scan-parallelism-bound at these scale factors, so
they measure plan shape + fixed overheads, and blanket repartition()
"fixes" would only add cost.  Layout parallelism starts to matter when
scans are cold-I/O-bound (real cluster, object store, TB files) --
which local page-cached runs cannot exhibit.

Usage: python tools/bench_layout.py [sf_dir] [n_files]

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mvp_mini_etl_pipeline_1762840347_spark.io import read_table  # noqa: E402
from mvp_mini_etl_pipeline_1762840347_spark.session import get_spark  # noqa: E402


def _agg(df):
    """The groupby_pricing aggregation shape (scan-dominated)."""
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        df.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.count("*").alias("n"),
        )
    )


def _best_of(df, n: int = 3) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark("bench_layout")

    single = read_table(spark, sf_dir, "lineitem")
    n_rows = single.count()  # warm the JVM + page cache

    tmp = tempfile.mkdtemp(prefix="layout_bench_")
    try:
        multi_path = os.path.join(tmp, "lineitem_multi")
        t0 = time.perf_counter()
        single.repartition(n_files).write.parquet(multi_path)
        rewrite_s = round(time.perf_counter() - t0, 3)
        multi = spark.read.parquet(multi_path)

        single_s = _best_of(_agg(single))
        multi_s = _best_of(_agg(multi))

        single_tasks = single.rdd.getNumPartitions()
        multi_tasks = multi.rdd.getNumPartitions()

        print(
            json.dumps(
                {
                    "metric": "single_row_group_vs_multi_file_scan",
                    "sf_dir": sf_dir,
                    "n_rows": n_rows,
                    "single_file_scan_tasks": single_tasks,
                    "multi_file_scan_tasks": multi_tasks,
                    "single_file_agg_sec": single_s,
                    "multi_file_agg_sec": multi_s,
                    "speedup": round(single_s / multi_s, 2) if multi_s else None,
                    "one_time_rewrite_sec": rewrite_s,
                    "n_files": n_files,
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
