"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same sf dir, then compares row count, column-name set
and an order-insensitive value comparison (columns sorted by name,
rows sorted by all columns).  Usage:

    python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from mvp_mini_etl_pipeline_1762840347_spark.session import get_spark  # noqa: E402
from mvp_mini_etl_pipeline_1762840347_spark.io import TABLES  # noqa: E402


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _dtype_kind(dtype) -> str:
    """Coarse dtype class: the driver's value hash is dtype-sensitive
    (the DuckDB HUGEINT->float64 artifact broke two rows in r4), so a
    Spark int64 vs oracle float64 column is a future hash-fail even
    when every value matches."""
    if pd.api.types.is_float_dtype(dtype):
        return "float"
    if pd.api.types.is_integer_dtype(dtype):
        return "int"
    if pd.api.types.is_bool_dtype(dtype):
        return "bool"
    if pd.api.types.is_datetime64_any_dtype(dtype):
        return "ts"
    return "obj"


def compare(name: str, spark_df, oracle_df) -> str:
    s = _normalize(spark_df)
    o = _normalize(oracle_df)
    if len(s) != len(o):
        return f"ROWS {len(s)} vs {len(o)}"
    if list(s.columns) != list(o.columns):
        return f"COLS {list(s.columns)} vs {list(o.columns)}"
    dtype_warn = [
        c for c in s.columns
        if _dtype_kind(s[c].dtype) != _dtype_kind(o[c].dtype)
    ]
    try:
        pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=False, rtol=1e-6, atol=1e-6)
    except AssertionError as e:
        return "VALUES " + str(e).split("\n")[0][:200]
    if dtype_warn:
        return "DTYPE-MISMATCH " + ",".join(
            f"{c}({_dtype_kind(s[c].dtype)} vs {_dtype_kind(o[c].dtype)})"
            for c in dtype_warn
        )
    # Float-exactness audit: a non-zero Spark-vs-oracle difference in
    # any float column means the row relies on the driver hash's
    # rounding tolerance rather than bit-identical arithmetic -- the
    # class that bites when data or libm versions change.  Annotated,
    # not failed: the repo's discipline is to keep this list empty.
    fdiff = 0.0
    for c in s.columns:
        if pd.api.types.is_float_dtype(s[c].dtype) and pd.api.types.is_float_dtype(o[c].dtype):
            d = (s[c] - o[c]).abs().max()
            if pd.notna(d):
                fdiff = max(fdiff, float(d))
    if fdiff > 0:
        return f"OK float-diff={fdiff:.2e}"
    return "OK"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("verify_local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"{name:32s} SPARK-ERROR")
            traceback.print_exc()
            failed.append(name)
            continue
        if name not in oracles:
            print(f"{name:32s} rows-only: {len(sdf)} rows  ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception:
            print(f"{name:32s} ORACLE-ERROR")
            traceback.print_exc()
            failed.append(name)
            continue
        verdict = compare(name, sdf, odf)
        print(f"{name:32s} {verdict}  ({len(sdf)} rows, {time.time()-t0:.1f}s)")
        if not verdict.startswith("OK"):
            failed.append(name)
    print(f"\n{n_run - len(failed)}/{n_run} OK" + (f"; FAILED: {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
