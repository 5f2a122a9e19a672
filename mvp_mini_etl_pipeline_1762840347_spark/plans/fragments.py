"""Opt-in per-process FRAGMENT CACHE shared by the plan modules.

Several registered queries derive the same full-corpus artifact in
one batch window: the curation disposition frame (corpus_disposition,
training_data_release), release_delta_incremental's "yesterday" state,
and the full-corpus LSH band signatures (the ~9 dedup/graph/split
queries whose candidate generation starts from one minhash pass).  A
production batch scheduler materializes such shared fragments once
per window -- this cache is that behavior, opt-in via
``SPARK_GRAFT_FRAGMENT_CACHE=1`` (bench.py turns it on) so every
query's standalone plan (PLAN_AUDIT.md, tests) stays deterministic.
Cached frames are localCheckpointed, so a hit serves materialized
rows; value parity cache-on == cache-off is pinned in
tests/test_round9_ops.py and tests/test_round10_ops.py.

Keys are scoped to the live SparkContext via ``applicationId`` --
NOT ``id(spark)``, which CPython reuses after GC, so a new session
allocated at a stopped session's address could be served checkpointed
frames bound to the dead context (ADVICE r9).

``HITS``/``MISSES`` count cache decisions so bench.py can record, per
query, whether the committed timing was served from a cached fragment
(the artifact-honesty flag ADVICE r9 asked for).
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

_FRAGMENT_CACHE: dict[tuple, object] = {}

# Monotone counters, incremented on every cache decision (hit/miss)
# regardless of which fragment it was.  bench.py snapshots HITS around
# each timed query to tag cache-served minima in the artifact.
_STATS = {"hits": 0, "misses": 0}


def fragment_cache_on() -> bool:
    return os.environ.get("SPARK_GRAFT_FRAGMENT_CACHE") == "1"


def hit_count() -> int:
    return _STATS["hits"]


def note_hit() -> None:
    """Record a cache hit made outside cached_frame (dict-valued
    fragments like the curation-state memo)."""
    _STATS["hits"] += 1


def note_miss() -> None:
    _STATS["misses"] += 1


def cache_key(spark: SparkSession, *parts) -> tuple:
    """Cache key scoped to the live SparkContext (applicationId is
    unique per context; object ids are not)."""
    return (spark.sparkContext.applicationId, *parts)


def clear() -> None:
    """Drop every cached fragment and unpersist the checkpointed
    blocks (ADVICE r11: the cache otherwise grows resident checkpoint
    blocks for the life of the session).  Long-lived sessions that
    cross batch windows should call this at the window boundary;
    bench.py deliberately does NOT call it between passes -- the warm
    pass measuring amortized fragment reads is the declared
    methodology, and the artifact flags every cache-served minimum.

    A localCheckpointed frame's blocks belong to its underlying RDD,
    not the SQL CacheManager, so the release mechanism is reference
    drop: clearing the dict releases the last py4j reference, the JVM
    RDD becomes unreachable, and Spark's ContextCleaner unpersists the
    blocks asynchronously.  Resident footprint for reference (sf0.1,
    all fragments warm): the corpus-wide fragments are compact
    columnar state, ~60 MB of storage-memory blocks total across ~20
    fragments (the doc-shingle store dominates); the always-on
    dict-valued state memos (curation stores) live on DISK as parquet
    under the scratch dir, not in executor storage."""
    _FRAGMENT_CACHE.clear()


def cached_frame(
    spark: SparkSession,
    parts: tuple,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Serve the fragment at ``parts`` from the cache, building (and
    localCheckpointing) it on miss.  With the cache OFF the lazy frame
    is returned as built -- the standalone plan, unchanged.

    ALWAYS-ON input-state memos (e.g. "yesterday's committed curation
    stores exist" -- dict-valued, not a single frame) do not fit this
    helper; they write _FRAGMENT_CACHE directly (see
    quality._curation_state) and call note_hit/note_miss themselves.
    """
    if not fragment_cache_on():
        return build()
    key = cache_key(spark, *parts)
    hit = _FRAGMENT_CACHE.get(key)
    if hit is not None:
        _STATS["hits"] += 1
        return hit  # type: ignore[return-value]
    _STATS["misses"] += 1
    out = build().localCheckpoint()
    _FRAGMENT_CACHE[key] = out
    return out
