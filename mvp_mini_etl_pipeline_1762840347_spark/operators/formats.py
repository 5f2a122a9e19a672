"""Multi-format dataset IO: one read/write surface over every file
format this Spark build carries natively (parquet, ORC, JSON-lines,
CSV), with the per-format scale tradeoffs stated where the choice is
made, not in tribal knowledge.

Capability notes (what you give up leaving parquet):

* **parquet** — columnar, predicate pushdown + column pruning +
  min/max zone maps per row group.  The default for every table in
  this engine.
* **orc** — columnar with the same pushdown class (Spark's OrcScan
  shows PushedFilters); interchange with Hive/Trino estates.  Reads
  use the vectorized reader; behaviorally parquet-equivalent here.
* **json** (lines) — row-oriented, schema-on-read, NO pushdown and a
  full-text parse per row; only for landing zones and interchange.
  Always read with an explicit schema: inference scans the data once
  extra and infers wider types than the writer meant.
* **csv** — row-oriented, lossy on types (timestamps/nested data need
  explicit schemas and still lose nanos), quoting edge cases; the
  reference's export format (K1) and nothing else.
* **avro** — row-oriented with real schemas; needs the external
  spark-avro package, absent in this container, so it is
  capability-gated: `write_dataset(..., "avro")` raises a clear
  UnsupportedFormat rather than a cryptic ClassNotFoundException.

Nested columns (structs/arrays, e.g. the documents/embeddings
tables) survive parquet/orc/json round-trips; CSV rejects them by
design (Spark raises) — flatten first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "orc", "json", "csv")


class UnsupportedFormat(ValueError):
    """Raised for formats this deployment cannot serve (with why)."""


def _check(fmt: str) -> None:
    if fmt == "avro":
        raise UnsupportedFormat(
            "avro needs the external spark-avro package, which is not "
            "in this container; use parquet or orc"
        )
    if fmt not in FORMATS:
        raise UnsupportedFormat(
            f"unknown format {fmt!r}; supported: {FORMATS} (+ avro when "
            "spark-avro is on the classpath)"
        )


def write_dataset(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Write a dataset in the given format (overwrite).

    CSV writes carry a header and quote-all so the round-trip is
    byte-stable for string columns containing delimiters (the K1
    discipline); timestamps serialize as ISO-8601 micros."""
    _check(fmt)
    w = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        w = w.option("header", "true").option("quoteAll", "true").option(
            "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
        )
    w.save(path)


def read_dataset(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | None = None,
) -> DataFrame:
    """Read a dataset written by write_dataset.

    For the row formats (json/csv) pass the writer's schema: it skips
    the inference scan AND pins exact types (csv would otherwise read
    bigints as ints or strings; json widens).  Columnar formats carry
    their own schema and ignore the hint only if None."""
    _check(fmt)
    r = spark.read.format(fmt)
    if schema is not None:
        r = r.schema(schema)
    elif fmt in ("json", "csv"):
        r = r.option("inferSchema", "true")
    if fmt == "csv":
        r = r.option("header", "true").option(
            "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
        )
    return r.load(path)
