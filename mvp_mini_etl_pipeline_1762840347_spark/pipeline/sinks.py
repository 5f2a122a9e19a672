"""Load layer (SURVEY §2.2): CSV / JSON sinks with the reference's
serialization semantics.

K1 CSV export (reference pages/index.js:105-131, quoting rule
:426-430): fixed header, EVERY value quoted, embedded '"' doubled,
null/undefined -> '', location formatted as "city, country",
timestamped filename.  Spark's CSV writer natively implements the
quote-doubling; `quoteAll` + `emptyValue ''` give the rest.

K2 JSON sink (pages/api/etl/restart.js:14-20): records as JSON lines.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.js import fmt_city_country

CSV_COLUMNS = ["id", "name", "email", "phone", "location", "age", "gender", "country"]


def users_export_projection(users: DataFrame) -> DataFrame:
    """The 8-column export projection (pages/index.js:106-118):
    location flattened to "city, country", country from
    `nat || location.country` JS-falsy fallback."""
    from ..functions.js import js_str_or

    return users.select(
        "id",
        "name",
        "email",
        "phone",
        fmt_city_country(F.col("location.city"), F.col("location.country")).alias(
            "location"
        ),
        "age",
        "gender",
        js_str_or(F.col("nat"), F.col("location.country")).alias("country"),
    )


def write_csv(df: DataFrame, out_dir: str, stamped: bool = True) -> str:
    """K1: quote-all CSV with '' for nulls.  Distributed write (one
    file per partition; coalesce upstream if a single file is
    needed)."""
    path = f"{out_dir}/mini-etl-users-{int(time.time() * 1000)}" if stamped else out_dir
    (
        df.write.mode("overwrite")
        .option("header", True)
        .option("quoteAll", True)
        .option("emptyValue", "")
        .option("nullValue", "")
        .csv(path)
    )
    return path


def write_json(df: DataFrame, out_dir: str) -> str:
    """K2: JSON-lines sink."""
    df.write.mode("overwrite").json(out_dir)
    return out_dir


def preview_json(df: DataFrame, n: int = 10) -> list[str]:
    """K4: pretty-preview of the first n rows as JSON strings
    (pages/index.js:266-270).  Driver-side by design -- tiny result."""
    return [r["js"] for r in df.limit(n).select(F.to_json(F.struct("*")).alias("js")).collect()]
