"""Benchmark harness (driver contract): times every registered query
at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion through the noop sink (full
physical plan runs, nothing collects to the driver), which is the
honest distributed-execution cost -- `.collect()` would add a
driver-materialization term that doesn't exist in production writes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mvp_mini_etl_pipeline_1762840347_spark import plans  # noqa: E402
from mvp_mini_etl_pipeline_1762840347_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    # Warm the JVM/codegen once so per-query numbers measure the plans,
    # not first-use initialization.
    plans.QUERIES["metrics_customer"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name, fn in sorted(plans.QUERIES.items()):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_wall_sec_all_queries",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "n_queries": len(timings),
            }
        )
    )


if __name__ == "__main__":
    main()
