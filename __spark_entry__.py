"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the ``mvp_mini_etl_pipeline_1762840347_spark``
package; this module only adapts it to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mvp_mini_etl_pipeline_1762840347_spark import plans  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# Names with a green driver CORRECTNESS row in a prior round.  The
# driver oracle-checks queries in dict order and caps the per-round
# count, so names never yet checked are emitted FIRST; already-green
# ones re-verify in later rounds once everything has had a row.
# Source of truth: COVERAGE.md "driver-checked" section.
_DRIVER_CHECKED: tuple[str, ...] = (
    "metrics_customer", "projection_enrich", "filter_valid", "point_lookup",
    "case_status", "join_lookup_default", "array_membership_join", "union_all",
    "tail_limit", "head_limit", "scalar_funcs", "datetime_funcs",
    "groupby_pricing", "groupby_segment", "window_rank", "window_analytics",
    "events_tumbling", "events_sliding", "events_session", "events_dedup_first",
    "events_json_extract", "events_gap_stats", "events_rollup_2level",
    "events_cohort_retention", "events_funnel", "events_gap_fill",
    "events_transitions", "events_value_anomaly", "events_trailing_7d",
    "events_attribution", "events_anomaly_online", "events_session_funnel",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash", "dedup_ngram_jaccard",
    "dedup_verified_pairs", "dedup_simhash_hamming",
    "similarity_topk", "similarity_lsh_bucket", "similarity_ivf",
    "dedup_embedding_cosine", "embedding_norm_stats",
    "embedding_label_centroids", "kmeans_2iter", "embedding_centered_norms",
    "text_langid", "text_quality", "text_token_stats", "text_bpe_tokens",
)


def _coverage_ordered(mapping: dict) -> dict:
    """Never-driver-checked entries first (registry order), then the rest."""
    unchecked = {k: v for k, v in mapping.items() if k not in _DRIVER_CHECKED}
    checked = {k: v for k, v in mapping.items() if k in _DRIVER_CHECKED}
    return {**unchecked, **checked}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the pricing-summary aggregation."""
    return plans.QUERIES["groupby_pricing"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _coverage_ordered(dict(plans.QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle SQL per query (same column names/values)."""
    return _coverage_ordered(dict(plans.ORACLES))
