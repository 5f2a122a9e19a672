"""Dump .explain('formatted') output for the named queries to
plans/<outdir>/<query>_<tag>.txt -- the judge-facing evidence files for
optimization rounds.  Usage:

    python tools/dump_plan.py <outdir> <tag> <query> [query ...]

Writes plans/<outdir>/<query>_<tag>.txt using the STANDALONE plan
(fragment cache off) unless SPARK_GRAFT_FRAGMENT_CACHE=1 is exported
(then the bench-mode plan -- name such dumps `<tag>_bench`), at
sf0.001 for speed (plan shape, not timing).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mvp_mini_etl_pipeline_1762840347_spark import plans  # noqa: E402
from mvp_mini_etl_pipeline_1762840347_spark.session import get_spark  # noqa: E402


def main() -> int:
    if len(sys.argv) < 4:
        print(__doc__, file=sys.stderr)
        return 2
    outdir_name, tag = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    unknown = [n for n in names if n not in plans.QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        outdir_name,
    )
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump_plan", cpus=8)
    for name in names:
        df = plans.QUERIES[name](spark, sf_dir)
        # PythonSQLUtils.explainString is the same JVM entry point
        # DataFrame.explain() prints through; used directly so the text
        # can be captured instead of echoed to stdout.
        text = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
