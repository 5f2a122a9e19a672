"""Unit tests for the round-5 curation/maintenance additions:
incremental LSH dedup, partial-aggregate MV maintenance, and the
full-corpus disposition partition.

The oracle gate proves value parity with DuckDB; these pin the
SEMANTIC invariants the hash cannot state: the incremental candidate
set equals the from-scratch build restricted to new pairs, merged MV
partials reconcile with the single-level aggregate, and dispositions
form an exact partition of the corpus that reconciles with the
stand-alone stage queries.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    return entrymod.queries()[name](spark, SF)


# ---------------------------------------------------------------------------
# dedup_incremental
# ---------------------------------------------------------------------------
def test_incremental_equals_from_scratch_restricted_to_new(spark):
    """Incremental candidates == full-build pairs with >=1 new side:
    the contract that lets the daily path skip re-hashing the corpus."""
    from mvp_mini_etl_pipeline_1762840347_spark.plans.dedup import _INC_MOD

    inc = {
        (r.doc_a, r.doc_b, r.n_shared_bands)
        for r in _run(spark, "dedup_incremental").collect()
    }
    full = {
        (r.doc_a, r.doc_b, r.n_shared_bands)
        for r in _run(spark, "dedup_minhash_lsh").collect()
        if r.doc_a % _INC_MOD == 0 or r.doc_b % _INC_MOD == 0
    }
    assert inc == full


def test_incremental_pair_type_consistent(spark):
    from mvp_mini_etl_pipeline_1762840347_spark.plans.dedup import _INC_MOD

    for r in _run(spark, "dedup_incremental").collect():
        both_new = r.doc_a % _INC_MOD == 0 and r.doc_b % _INC_MOD == 0
        assert r.pair_type == ("new-new" if both_new else "new-old")
        assert r.doc_a % _INC_MOD == 0 or r.doc_b % _INC_MOD == 0


# ---------------------------------------------------------------------------
# mv_partial_merge
# ---------------------------------------------------------------------------
def test_mv_merge_reconciles_with_direct_aggregate(spark):
    """Merging (segment, month) partials must equal the one-level
    groupBy -- associativity of every maintained state, in exact
    integer arithmetic."""
    from mvp_mini_etl_pipeline_1762840347_spark.io import read_table

    out = {r.segment: r for r in _run(spark, "mv_partial_merge").collect()}
    o = read_table(spark, SF, "orders")
    c = read_table(spark, SF, "customer").select("c_custkey", "c_mktsegment")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    direct = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n"),
            F.sum(cents).alias("s"),
            F.max(cents).alias("m"),
        )
        .collect()
    )
    assert len(direct) == len(out)
    for r in direct:
        got = out[r.segment]
        assert got.n_orders == r.n
        assert got.revenue_cents == r.s
        assert got.max_price_cents == r.m
        assert got.avg_price_cents == r.s // r.n


def test_mv_delta_bounded_by_total(spark):
    for r in _run(spark, "mv_partial_merge").collect():
        assert 0 <= r.delta_orders <= r.n_orders


# ---------------------------------------------------------------------------
# corpus_disposition
# ---------------------------------------------------------------------------
def test_disposition_partitions_the_corpus(spark):
    """Dispositions are a PARTITION: doc counts sum to the table size
    and token totals sum to the corpus token count."""
    from mvp_mini_etl_pipeline_1762840347_spark.io import read_table

    rows = _run(spark, "corpus_disposition").collect()
    d = read_table(spark, SF, "documents")
    n_docs = d.count()
    n_tokens = d.select(
        F.sum(F.size(F.split(F.lower(F.col("text")), r"\s+"))).alias("t")
    ).first().t
    assert sum(r.n_docs for r in rows) == n_docs
    assert sum(r.total_tokens for r in rows) == n_tokens


def test_disposition_reconciles_with_stage_queries(spark):
    """Stage precedence: eval count == the eval source's size; the
    quality_drop count == total alive at that stage minus the funnel's
    n_quality_pass; split sequence counts follow ceil(tokens/512)."""
    from mvp_mini_etl_pipeline_1762840347_spark.plans.dedup import (
        _EVAL_SOURCE,
    )
    from mvp_mini_etl_pipeline_1762840347_spark.io import read_table

    rows = {r.disposition: r for r in _run(spark, "corpus_disposition").collect()}
    d = read_table(spark, SF, "documents")
    n_eval = d.filter(F.col("source") == _EVAL_SOURCE).count()
    assert rows.get("0_eval_heldout") is not None
    assert rows["0_eval_heldout"].n_docs == n_eval
    for name, r in rows.items():
        if name.startswith("5_"):
            assert r.n_sequences == (r.total_tokens + 511) // 512
        else:
            assert r.n_sequences == 0


# ---------------------------------------------------------------------------
# PNG codec (operators/multimodal.py)
# ---------------------------------------------------------------------------
def test_png_round_trip_all_filters():
    from mvp_mini_etl_pipeline_1762840347_spark.operators.multimodal import (
        build_png,
        decode_png,
    )

    for seed in (0, 3, 77, 255, 4096):
        w, h = 4 + seed % 13, 6  # h >= 5 exercises every filter type
        dw, dh, px = decode_png(build_png(w, h, seed))
        assert (dw, dh) == (w, h)
        assert px == bytes(
            (7 * x + 13 * y + seed) % 256 for y in range(h) for x in range(w)
        )


def test_png_decoder_rejects_corruption():
    import pytest

    from mvp_mini_etl_pipeline_1762840347_spark.operators.multimodal import (
        build_png,
        decode_png,
    )

    png = build_png(8, 8, 42)
    with pytest.raises(ValueError):
        decode_png(b"NOTAPNG" + png)
    bad = bytearray(png)
    bad[40] ^= 0xFF  # flip a byte inside IDAT -> CRC mismatch
    with pytest.raises(ValueError):
        decode_png(bytes(bad))


def test_decode_image_routes_png_and_stubs_rest():
    import pytest

    from mvp_mini_etl_pipeline_1762840347_spark.operators.multimodal import (
        build_png,
        decode_image,
    )

    out = decode_image(build_png(5, 4, 9))
    assert (out["width"], out["height"]) == (5, 4)
    assert len(out["pixels"]) == 20
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0 fake jpeg")


# ---------------------------------------------------------------------------
# events_pattern_match
# ---------------------------------------------------------------------------
def test_pattern_match_agrees_with_python_re(spark):
    """Cross-check the distributed regex scan against a sequential
    reference: rebuild each user's encoded sequence in Python and run
    the same pattern with the stdlib re module."""
    import re as _re

    from mvp_mini_etl_pipeline_1762840347_spark.io import read_events
    from mvp_mini_etl_pipeline_1762840347_spark.plans.events import (
        _SEQ_PATTERN,
    )

    out = {r.user_id: r for r in _run(spark, "events_pattern_match").collect()}
    ev = (
        read_events(spark, SF)
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    seqs = {}
    for r in sorted(ev, key=lambda r: (r.ts, r.event_id)):
        seqs.setdefault(r.user_id, []).append(r.event_type[0])
    assert set(seqs) == set(out)
    for uid, chars in seqs.items():
        hits = _re.findall(_SEQ_PATTERN, "".join(chars))
        assert out[uid].n_events == len(chars)
        assert out[uid].n_matches == len(hits), uid
        assert out[uid].longest_match == (max(map(len, hits)) if hits else 0)


# ---------------------------------------------------------------------------
# drift_psi
# ---------------------------------------------------------------------------
def test_psi_contributions_nonnegative_and_counts_partition(spark):
    """(pa-pb)*ln(pa/pb) >= 0 for every bin (both factors share sign),
    and the per-bin period counts partition the orders table."""
    from mvp_mini_etl_pipeline_1762840347_spark.io import read_table

    rows = _run(spark, "drift_psi").collect()
    n_orders = read_table(spark, SF, "orders").count()
    assert sum(r.n_a + r.n_b for r in rows) == n_orders
    for r in rows:
        assert r.psi_contrib >= 0.0, r
    assert sum(r.psi_contrib for r in rows) >= 0.0


# ---------------------------------------------------------------------------
# snapshot_time_travel
# ---------------------------------------------------------------------------
def test_time_travel_versions_grow_to_full_table(spark):
    from mvp_mini_etl_pipeline_1762840347_spark.io import read_table

    rows = sorted(
        _run(spark, "snapshot_time_travel").collect(), key=lambda r: r.version
    )
    assert [r.version for r in rows] == [0, 1, 2]
    assert rows[0].n_rows <= rows[1].n_rows <= rows[2].n_rows
    assert rows[2].n_rows == read_table(spark, SF, "orders").count()


# ---------------------------------------------------------------------------
# events_dead_letter
# ---------------------------------------------------------------------------
def test_dead_letter_quarantines_exactly_the_corrupted_rows(spark):
    from mvp_mini_etl_pipeline_1762840347_spark.io import read_events
    from mvp_mini_etl_pipeline_1762840347_spark.plans.events import _DL_MOD

    out = {r.event_type: r for r in _run(spark, "events_dead_letter").collect()}
    ev = read_events(spark, SF).select("event_id", "event_type").collect()
    expect = {}
    for r in ev:
        n, q = expect.get(r.event_type, (0, 0))
        expect[r.event_type] = (n + 1, q + (1 if r.event_id % _DL_MOD == 0 else 0))
    assert set(expect) == set(out)
    for et, (n, q) in expect.items():
        assert out[et].n_rows == n
        assert out[et].n_quarantined == q


def test_mixture_waterfill_invariants(spark):
    """Waterfilling optimality: allocations sum to the budget,
    saturated sources give everything, unsaturated ones sit exactly
    at the common water level, and the level matches a sequential
    solve."""
    import numpy as np

    rows = (
        entrymod.queries()["mixture_waterfill"](
            spark, "/root/testdata/sf0.001"
        )
        .toPandas()
        .sort_values("source")
    )
    avail = rows["avail_tokens"].to_numpy(dtype=np.float64)
    alloc = rows["allocated_tokens"].to_numpy(dtype=np.float64)
    budget = float(rows["budget_tokens"].iloc[0])
    level = float(rows["water_level"].iloc[0])
    # allocations: min(avail, level), summing to the budget
    assert np.allclose(alloc, np.minimum(avail, level), atol=1e-3)
    assert abs(alloc.sum() - budget) < 1.0
    # saturated flag consistent
    assert (
        (rows["saturated"].to_numpy()) == (avail <= level + 1e-9)
    ).all()
    # sequential reference solve of the same instance
    a = np.sort(avail)
    K = len(a)
    lam = None
    for j in range(K):
        cand = (budget - a[:j].sum()) / (K - j)
        if (j == 0 or a[j - 1] <= cand) and a[j] > cand:
            lam = cand
            break
    assert lam is not None and abs(lam - level) < 1e-6
