"""Query registry backing the driver contract (__spark_entry__.py).

Each named query is a callable ``(spark, sf_dir) -> DataFrame`` plus an
optional DuckDB oracle SQL string producing the same rows (same column
names -- the driver sorts columns by name and value-hashes).

Discipline enforced here (see SURVEY §7 gotchas):
* every computed column aliased identically in Spark and oracle SQL;
* float aggregates rounded identically on both sides (sum/avg of
  doubles differ in the last ulps between engines otherwise);
* any LIMIT/top-k is ordered by a unique key so results are
  deterministic in both engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle=None`` => rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
