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


# ---------------------------------------------------------------------------
# Full-layout mode: rewrite EVERY table multi-file/multi-row-group and
# run the whole driver bench against it, warm AND genuinely cold
# ---------------------------------------------------------------------------
_BIG_TABLES = (
    "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
)
_TINY_TABLES = ("region", "nation")


def _drop_page_cache() -> bool:
    """Flush dirty pages and evict the OS page cache so the next read
    is real disk I/O (needs root; returns False where unavailable)."""
    os.sync()
    try:
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3")
        return True
    except (PermissionError, FileNotFoundError):
        return False


def rewrite_all_tables(sf_dir: str, out_dir: str, n_files: int) -> None:
    """Mirror ``sf_dir`` into ``out_dir`` with every big table split
    into ``n_files`` parquet files of multiple row groups (small
    parquet block size), the layout a real ingest produces -- the
    committed testdata is one row group per table, which serializes
    cold scans into one task."""
    spark = get_spark("layout_rewrite")
    # parquet.block.size must land on the HADOOP conf object the
    # ParquetOutputFormat reads -- setting "spark.hadoop.parquet.
    # block.size" via spark.conf.set AFTER session creation never
    # reaches it (newHadoopConf() copies the key verbatim with its
    # spark.hadoop. prefix, leaving the 128 MiB default in force).
    spark.sparkContext._jsc.hadoopConfiguration().set(
        "parquet.block.size", str(1 << 20)
    )
    for name in _BIG_TABLES:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        df.repartition(n_files).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
    for name in _TINY_TABLES:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
    spark.stop()


def full_bench(sf_dir: str, n_files: int, keep: str | None = None) -> None:
    """Rewrite the whole scale factor into a multi-file layout, then
    run the driver bench (bench.py, unchanged) against it twice:

    * COLD: page cache dropped first, one rep -- every first scan is
      real disk I/O split across ``n_files`` tasks per table (the
      1000-executor cold-read shape, shrunk to one box);
    * WARM: three reps, minima -- the plan-shape number comparable to
      BENCH_LOCAL_latest.json over the committed single-row-group
      layout.

    Prints one JSON line per phase plus a summary line.  ``keep``
    preserves the rewritten layout at that path for reuse."""
    import subprocess

    out_dir = keep or tempfile.mkdtemp(prefix="layout_full_")
    t0 = time.perf_counter()
    rewrite_all_tables(sf_dir, out_dir, n_files)
    rewrite_s = round(time.perf_counter() - t0, 1)

    def _run(reps: int, budget: str) -> dict:
        env = dict(
            os.environ,
            SPARK_GRAFT_SF_DIR=out_dir,
            SPARK_GRAFT_BENCH_REPS=str(reps),
            SPARK_GRAFT_BENCH_BUDGET=budget,
            SPARK_GRAFT_BENCH_OUT="-",  # don't clobber the committed artifact
        )
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        out = subprocess.run(
            [sys.executable, os.path.join(here, "bench.py")],
            env=env, capture_output=True, text=True,
        )
        if out.returncode != 0:
            sys.stderr.write(out.stderr[-4000:] + "\n")
            raise RuntimeError(f"bench.py failed (rc={out.returncode})")
        return json.loads(out.stdout.strip().splitlines()[-1])

    try:
        cold_dropped = _drop_page_cache()
        cold = _run(reps=1, budget="1200")
        warm = _run(reps=3, budget="420")
        print(json.dumps({
            "metric": "full_bench_multifile_layout",
            "sf_dir": sf_dir,
            "n_files": n_files,
            "rewrite_sec": rewrite_s,
            "page_cache_dropped": cold_dropped,
            "cold_total_sec": cold["value"],
            "warm_total_sec": warm["value"],
            "n_queries": len(warm["queries"]),
        }))
        print("COLD " + json.dumps(cold))
        print("WARM " + json.dumps(warm))
    finally:
        if not keep:
            shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    if "--full" in sys.argv:
        args = [a for a in sys.argv[1:] if a != "--full" and not a.startswith("--keep")]
        keep = next((a.split("=", 1)[1] for a in sys.argv if a.startswith("--keep=")), None)
        full_bench(
            args[0] if args else "/root/testdata/sf0.1",
            int(args[1]) if len(args) > 1 else 16,
            keep=keep,
        )
    else:
        main()
