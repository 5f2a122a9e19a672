"""Semantic invariants for the round-5 continuation operators --
properties the DuckDB value hash cannot state: ledger conservation
for the span rewrite, recomputed thresholds for the MAD quarantine,
brute-force (numpy / pandas) equivalence for the spectral step, RRF
fusion and k-center trace, and join-count conservation for the
delta-maintained view."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    return entrymod.queries()[name](spark, SF)


def _docs_tokens(spark):
    return {
        r.doc_id: r.n
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select(
            "doc_id",
            F.size(F.split(F.lower(F.col("text")), r"\s+")).alias("n"),
        )
        .collect()
    }


# ---------------------------------------------------------------------------
# dedup_span_rewrite: ledger conservation + first-occurrence uniqueness
# ---------------------------------------------------------------------------
def test_span_rewrite_ledger_conserves_tokens(spark):
    toks = _docs_tokens(spark)
    rows = _run(spark, "dedup_span_rewrite").collect()
    assert {r.doc_id for r in rows} == set(toks)
    for r in rows:
        assert r.n_spans == math.ceil(toks[r.doc_id] / 16)
        assert r.tokens_kept + r.tokens_dropped == toks[r.doc_id]
        assert 0 < r.n_kept <= r.n_spans  # first span of a doc's first
        # occurrence chain is always kept, short trailing spans always kept


def test_span_rewrite_keeps_each_full_span_once(spark):
    """Every distinct full-length span text survives exactly once
    corpus-wide (the definition of first-occurrence-wins removal)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.split(F.lower(F.col("text")), r"\s+").alias("t")
    )
    spans = {}
    kept_total = dropped_total = 0
    for r in sorted(docs.collect(), key=lambda r: r.doc_id):
        t = r.t
        for i in range(0, len(t), 16):
            chunk = t[i : i + 16]
            if len(chunk) < 16:
                kept_total += 1
                continue
            key = " ".join(chunk)
            if key in spans:
                dropped_total += 1
            else:
                spans[key] = (r.doc_id, i // 16)
                kept_total += 1
    got = _run(spark, "dedup_span_rewrite").agg(
        F.sum("n_kept").alias("k"),
        F.sum(F.col("n_spans") - F.col("n_kept")).alias("d"),
    ).collect()[0]
    assert (got.k, got.d) == (kept_total, dropped_total)


# ---------------------------------------------------------------------------
# outlier_mad: flags match a recomputed median/MAD threshold
# ---------------------------------------------------------------------------
def test_outlier_mad_matches_recomputed_threshold(spark):
    stats = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(
            "doc_id",
            F.size(F.split(F.lower(F.col("text")), r"\s+")).alias("nt"),
            F.length("text").alias("nc"),
        )
        .collect()
    )
    nt = np.array([r.nt for r in stats])
    nc = np.array([r.nc for r in stats])

    def flags(x):
        med2 = int(round(2 * float(np.median(x))))
        d = np.abs(2 * x - med2)
        mad4 = int(round(2 * float(np.median(d))))
        return {r.doc_id for r, di in zip(stats, d) if 2 * di > 2 * mad4}

    want_t, want_c = flags(nt), flags(nc)
    got = _run(spark, "outlier_mad").collect()
    assert {r.doc_id for r in got} == want_t | want_c
    for r in got:
        assert r.tok_outlier == (r.doc_id in want_t)
        assert r.chars_outlier == (r.doc_id in want_c)


# ---------------------------------------------------------------------------
# important_parts: brute-force threshold equivalence
# ---------------------------------------------------------------------------
def test_important_parts_matches_bruteforce(spark):
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select(
            "l_partkey",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("bigint")
            .alias("c"),
        )
        .collect()
    )
    vals = {}
    for r in li:
        vals[r.l_partkey] = vals.get(r.l_partkey, 0) + r.c
    total, n = sum(vals.values()), len(vals)
    want = {k: v for k, v in vals.items() if v * 2 * n > 3 * total}
    got = {r.l_partkey: r.val_cents for r in _run(spark, "important_parts").collect()}
    assert got == want


# ---------------------------------------------------------------------------
# embedding_power_iteration: numpy mat-vec equivalence
# ---------------------------------------------------------------------------
def test_power_iteration_matches_numpy(spark):
    rows = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    X = np.array(
        [np.round(np.array(r.embedding, dtype=np.float64) * 1000) for r in rows],
        dtype=np.int64,
    )
    v1 = X.T @ X.sum(axis=1)
    got = {r.dim: (r.v, r.n_vectors) for r in _run(spark, "embedding_power_iteration").collect()}
    assert len(got) == 64
    for j in range(64):
        assert got[j + 1] == (v1[j], len(rows))


# ---------------------------------------------------------------------------
# similarity_rrf_fusion: brute-force rank fusion equivalence
# ---------------------------------------------------------------------------
def test_rrf_fusion_matches_bruteforce(spark):
    rows = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    Q = {
        r.vec_id: np.round(np.array(r.embedding, dtype=np.float64) * 1000).astype(
            np.int64
        )
        for r in rows
    }
    ranks = {}
    for probe in (0, 1):
        scored = sorted(
            ((int(Q[v] @ Q[probe]), v) for v in Q if v != probe),
            key=lambda t: (-t[0], t[1]),
        )
        for rnk, (_, v) in enumerate(scored[:50], start=1):
            ranks.setdefault(v, {})[probe] = rnk
    fused = sorted(
        (
            (-sum(1.0 / (60 + r) for r in d.values()), v, d)
            for v, d in ranks.items()
        ),
    )[:20]
    got = _run(spark, "similarity_rrf_fusion").collect()
    assert [r.vec_id for r in got] == [v for _, v, _ in fused]
    for r, (_, v, d) in zip(got, fused):
        assert r.rank_a == d.get(0, 0) and r.rank_b == d.get(1, 0)


# ---------------------------------------------------------------------------
# mv_join_delta: the maintained view conserves the full join's counts
# ---------------------------------------------------------------------------
def test_mv_join_delta_conserves_full_join(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    want = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    got = {r.priority: r.n_rows for r in _run(spark, "mv_join_delta").collect()}
    assert got == {r.o_orderpriority: r.n for r in want}


# ---------------------------------------------------------------------------
# coreset_kcenter: numpy farthest-point traversal equivalence,
# monotone covering radius
# ---------------------------------------------------------------------------
def test_kcenter_matches_numpy_and_monotone(spark):
    rows = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    Q = {
        r.vec_id: np.round(np.array(r.embedding, dtype=np.float64) * 1000).astype(
            np.int64
        )
        for r in rows
    }
    ids = sorted(Q)
    mind = {v: int(((Q[v] - Q[0]) ** 2).sum()) for v in ids if v != 0}
    want = [(1, 0, 0)]
    for step in (2, 3, 4):
        sel = max(mind, key=lambda v: (mind[v], -v))
        want.append((step, sel, mind[sel]))
        selq = Q[sel]
        del mind[sel]
        for v in mind:
            mind[v] = min(mind[v], int(((Q[v] - selq) ** 2).sum()))
    got = [
        (r.step, r.vec_id, r.d2_at_selection)
        for r in sorted(_run(spark, "coreset_kcenter").collect())
    ]
    assert got == want
    d2s = [d for _, _, d in got[1:]]
    assert d2s == sorted(d2s, reverse=True)


# ---------------------------------------------------------------------------
# dedup_span_spectrum reconciles with the rewrite's drop ledger
# ---------------------------------------------------------------------------
def test_span_spectrum_reconciles_with_rewrite(spark):
    spec = _run(spark, "dedup_span_spectrum").collect()
    ledger = _run(spark, "dedup_span_rewrite").agg(
        F.sum("tokens_dropped").alias("d")
    ).collect()[0]
    assert sum(r.removable_tokens for r in spec) == ledger.d
    assert any(r.n_copies > 1 for r in spec), "degenerate fixture"


# ---------------------------------------------------------------------------
# seqlen_histogram: bucket partition + cumulative conservation
# ---------------------------------------------------------------------------
def test_seqlen_histogram_conserves_corpus(spark):
    toks = _docs_tokens(spark)
    rows = sorted(_run(spark, "seqlen_histogram").collect())
    assert sum(r.n_docs for r in rows) == len(toks)
    assert sum(r.bucket_tokens for r in rows) == sum(toks.values())
    assert rows[-1].cum_tokens == sum(toks.values())
    for r in rows:
        assert r.lo_tokens == 2 ** (r.bit_bucket - 1)
        assert r.hi_tokens == 2 ** r.bit_bucket - 1
    want = {}
    for n in toks.values():
        want[n.bit_length()] = want.get(n.bit_length(), 0) + 1
    assert {r.bit_bucket: r.n_docs for r in rows} == want


# ---------------------------------------------------------------------------
# dedup_rewrite_apply: rewritten token counts equal the ledger's
# tokens_kept, and the fingerprint matches a sequential rebuild
# ---------------------------------------------------------------------------
def test_rewrite_apply_matches_sequential_rebuild(spark):
    import hashlib

    docs = sorted(
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", F.lower(F.col("text")).alias("t"))
        .collect(),
        key=lambda r: r.doc_id,
    )
    import re as _re

    seen = set()
    want = {}
    for r in docs:
        toks = _re.split(r"\s+", r.t)
        kept_spans = []
        n_new = 0
        for i in range(0, len(toks), 16):
            chunk = toks[i : i + 16]
            key = " ".join(chunk)
            if len(chunk) < 16:
                kept_spans.append(key)
                n_new += len(chunk)
            elif key not in seen:
                seen.add(key)
                kept_spans.append(key)
                n_new += 16
        text = " ".join(kept_spans)
        fp = int(hashlib.md5(text.encode()).hexdigest()[:15], 16)
        want[r.doc_id] = (n_new, fp)
    got = {
        r.doc_id: (r.n_tokens_new, r.rewritten_fp)
        for r in _run(spark, "dedup_rewrite_apply").collect()
    }
    assert got == want
    ledger = {
        r.doc_id: r.tokens_kept
        for r in _run(spark, "dedup_span_rewrite").collect()
    }
    assert {k: v[0] for k, v in got.items()} == ledger


def test_multiprobe_recall_dominates_single_probe(spark):
    """Multi-probe candidates strictly contain the single-probe
    bucket's, so per-query recall against the exact top-5 can only
    improve; verify both the superset property and the recall
    ordering on the sf0.001 embeddings."""
    exact = (
        entrymod.queries()["similarity_topk"](spark, SF)
        .filter(F.col("rank") <= 5)
        .collect()
    )
    single = entrymod.queries()["similarity_lsh_bucket"](spark, SF).collect()
    multi = entrymod.queries()["similarity_lsh_multiprobe"](
        spark, SF
    ).collect()

    def by_query(rows):
        out = {}
        for r in rows:
            out.setdefault(r.query_id, set()).add(r.neighbor_id)
        return out

    ex, si, mu = by_query(exact), by_query(single), by_query(multi)
    # queries 0..4 exist in all three (similarity_topk uses 5 queries)
    for qid in ex:
        got_s = si.get(qid, set())
        got_m = mu.get(qid, set())
        r_single = len(ex[qid] & got_s) / len(ex[qid])
        r_multi = len(ex[qid] & got_m) / len(ex[qid])
        assert r_multi >= r_single, (qid, r_single, r_multi)


def test_vocab_growth_curve_is_monotone_and_conserves(spark):
    """Growth-curve invariants: cum_types / cum_tokens are strictly
    monotone, the last checkpoint equals the corpus totals, and
    new_types sums to the distinct-type count."""
    rows = entrymod.queries()["vocab_growth_heaps"](spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    tok = docs.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w")
    )
    total_occ = tok.count()
    total_types = tok.distinct().count()
    cum_t = [r.cum_types for r in rows]
    cum_o = [r.cum_tokens for r in rows]
    assert cum_t == sorted(cum_t) and cum_o == sorted(cum_o)
    assert cum_o[-1] == total_occ
    assert cum_t[-1] == total_types
    assert sum(r.new_types for r in rows) == total_types


def test_source_matrix_counts_match_pair_join(spark):
    """The source matrix is exactly the pair list rolled up through
    the doc->source map (recomputed via pandas)."""
    from mvp_mini_etl_pipeline_1762840347_spark.plans.dedup import (
        minhash_pairs,
    )

    pairs = minhash_pairs(spark, SF).toPandas()
    src = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "source")
        .toPandas()
        .set_index("doc_id")["source"]
    )
    import collections

    want = collections.Counter(
        tuple(sorted((src[a], src[b])))
        for a, b in zip(pairs["doc_a"], pairs["doc_b"])
    )
    got = {
        (r.source_a, r.source_b): r.n_dup_pairs
        for r in entrymod.queries()["dedup_source_matrix"](
            spark, SF
        ).collect()
    }
    assert got == {k: v for k, v in want.items() if v >= 2}
