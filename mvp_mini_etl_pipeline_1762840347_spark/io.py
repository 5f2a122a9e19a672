"""IO layer: readers for the driver's star-schema parquet tables.

Scale notes
-----------
* ``spark.read.parquet`` gives predicate pushdown + column pruning for
  free; every query should therefore select only what it needs and put
  filters as early as possible (Catalyst pushes them into the scan).
* ``ingest_order(df, order_col)`` reproduces the reference's implicit
  "source order" semantics (reference keeps JS arrays in fetch order;
  its lastRecord / tail-150 operators depend on it -- see SURVEY §2.5
  A5, §2.6 L1).  Distributed DataFrames have no stable order, so order
  is always an explicit column: we use the table's natural key, which
  the driver generates monotonically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Natural ingest-order key per table (driver generates keys monotonically).
INGEST_KEY = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": None,  # composite (l_orderkey, l_linenumber)
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table. Plain parquet scan -- pushdown-friendly."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the `events` table with its timestamp normalized.

    events.parquet stores INT64 TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; read the raw nanos (runtime conf) and
    truncate to micros -- identical to how DuckDB/pyarrow surface the
    same column, so oracle comparisons agree.  Session TZ is UTC so
    timestamp_micros yields the same naive value."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    e = read_table(spark, sf_dir, "events")
    if dict(e.dtypes)["ts"] == "bigint":
        e = e.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        e = e.withColumn("ts", F.col("ts").cast("timestamp"))
    return e


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read all driver tables lazily (no action is triggered)."""
    return {name: read_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL-flavored queries)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
