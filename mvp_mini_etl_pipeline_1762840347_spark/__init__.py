"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference mini-ETL pipeline
(QAway-to/mvp-mini-etl-pipeline-1762840347), re-expressed Spark-first.

Layout:
    session     -- SparkSession factory tuned for local[32] + cluster scale
    io          -- parquet readers for the driver star schema + ingest order
    functions/  -- scalar function layer (JS-falsy coalesce, formatting, ...)
    operators/  -- dedup, similarity, text, joins, windows, multimodal
    plans/      -- named queries + DuckDB oracle SQL (driver contract)
    pipeline/   -- extract/transform/load orchestration, sinks, run metrics
    streaming/  -- Structured Streaming versions of the event operators
"""

__version__ = "0.1.0"
