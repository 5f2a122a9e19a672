"""Round-8 flagship: the release DELTA between two corpus snapshots.

The delta query must reconcile EXACTLY with two independent full
recomputes of the release manifest (training_data_release's code path
parameterized by snapshot): per split, the document/token deltas are
manifest(v2) minus manifest(v1) and the XOR fingerprint delta is
fp(v1) XOR fp(v2) -- the composed-equals-recompute contract the
z-set algebra promises.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mvp_mini_etl_pipeline_1762840347_spark import plans
from mvp_mini_etl_pipeline_1762840347_spark.io import read_table
from mvp_mini_etl_pipeline_1762840347_spark.plans.quality import (
    _ingest_bucket_col,
    _release_manifest,
)

SF = "/root/testdata/sf0.001"


def _manifest(spark, pred):
    d = read_table(spark, SF, "documents").filter(pred)
    return {
        r["split"]: r.asDict()
        for r in _release_manifest(spark, SF, d).collect()
    }


def test_release_delta_equals_manifest_diff(spark):
    ib = _ingest_bucket_col()
    m1 = _manifest(spark, ib < 14)
    m2 = _manifest(spark, ib != 13)
    delta = {
        r["split"]: r.asDict()
        for r in plans.QUERIES["release_delta"](spark, SF).collect()
    }
    # Every split whose manifest changed must appear in the delta.
    for s in set(m1) | set(m2):
        a, b = m1.get(s), m2.get(s)
        n1, t1, f1 = (
            (a["n_docs"], a["n_tokens"], a["content_fingerprint"])
            if a
            else (0, 0, 0)
        )
        n2, t2, f2 = (
            (b["n_docs"], b["n_tokens"], b["content_fingerprint"])
            if b
            else (0, 0, 0)
        )
        if (n1, t1, f1) == (n2, t2, f2):
            assert s not in delta or delta[s]["n_docs_delta"] == 0
            continue
        d = delta[s]
        assert d["n_docs_delta"] == n2 - n1, (s, d, n1, n2)
        assert d["n_tokens_delta"] == t2 - t1, (s, d, t1, t2)
        assert d["fingerprint_delta"] == f1 ^ f2, (s, d, f1, f2)
        # Flow accounting closes: net = added - removed + in - out.
        assert d["n_docs_delta"] == (
            d["n_docs_added"]
            - d["n_docs_removed"]
            + d["n_resplit_in"]
            - d["n_resplit_out"]
        ), d


def test_release_delta_carries_real_churn(spark):
    """The snapshot construction must actually add AND remove docs
    (a delta query tested only on additions would hide sign bugs in
    the removal path)."""
    rows = plans.QUERIES["release_delta"](spark, SF).collect()
    assert sum(r["n_docs_added"] for r in rows) > 0
    assert sum(r["n_docs_removed"] for r in rows) > 0


def test_release_delta_scan_count(spark):
    """The fused single-derivation form: per-doc artifacts are
    snapshot-independent, so BOTH snapshots ride the one
    corpus_disposition scan budget (features + checkpointed LSH pairs
    + shingle stream) -- not two full pipelines (6 scans, measured
    8.7 s at sf0.1) and certainly not the union-of-two-filters form
    that re-ran the join per side (12 scans)."""
    df = plans.QUERIES["release_delta"](spark, SF)
    df.collect()
    final = (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert final.count("documents.parquet") == 3, (
        "release_delta: one shared 3-scan derivation for both snapshots"
    )


def test_unchanged_docs_never_reach_the_delta_agg(spark):
    """Membership-unchanged docs are filtered BEFORE the contribution
    fan-out -- the churn-sized-shuffle property the docstring claims.
    Checked semantically: every exploded contribution row belongs to a
    doc whose (v1, v2) split assignment differs."""
    ib = _ingest_bucket_col()
    d = read_table(spark, SF, "documents")
    from mvp_mini_etl_pipeline_1762840347_spark.plans.quality import (
        _kept_docs_frame,
    )

    k1 = _kept_docs_frame(spark, SF, d.filter(ib < 14)).alias("a")
    k2 = _kept_docs_frame(spark, SF, d.filter(ib != 13)).alias("b")
    j = k1.join(k2, F.col("a.doc_id") == F.col("b.doc_id"), "full_outer")
    n_changed = j.filter(
        ~F.col("a.split").eqNullSafe(F.col("b.split"))
    ).count()
    rows = plans.QUERIES["release_delta"](spark, SF).collect()
    n_contrib = sum(
        r["n_docs_added"]
        + r["n_docs_removed"]
        + r["n_resplit_in"]
        + r["n_resplit_out"]
        for r in rows
    )
    # added/removed docs contribute once; resplit docs twice (out of
    # the old split, into the new) -- so contributions count changed
    # docs with resplits double-counted, never unchanged docs.
    n_resplit = sum(r["n_resplit_in"] for r in rows)
    assert n_contrib == n_changed + n_resplit


def test_release_delta_stream_matches_batch(spark, tmp_path_factory):
    """The streamed per-split delta over several micro-batches of
    membership-change rows must equal the batch release_delta (counts
    and token deltas add; XOR composes batch fingerprint deltas), and
    a replayed batch id must be a no-op."""
    from mvp_mini_etl_pipeline_1762840347_spark.plans.quality import (
        _membership_changes,
    )
    from mvp_mini_etl_pipeline_1762840347_spark.streaming import jobs

    base = tmp_path_factory.mktemp("release_delta_stream")
    landing = str(base / "landing")
    ch = _membership_changes(spark, SF)
    ch.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
        landing, mode="overwrite"
    )
    ch.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(
        landing, mode="append"
    )
    state_path = str(base / "delta")

    stream = (
        spark.readStream.schema(ch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    q = jobs.release_delta_stream(spark, stream, state_path)
    q.awaitTermination(120)

    got = {
        r["split"]: r.asDict()
        for r in spark.read.parquet(state_path).collect()
    }
    want = {
        r["split"]: r.asDict()
        for r in plans.QUERIES["release_delta"](spark, SF).collect()
    }
    assert got == want

    # replayed batch id: exactly-once no-op
    assert not jobs.release_delta_merge_step(
        spark, ch.limit(3), 0, state_path
    )
    still = {
        r["split"]: r.asDict()
        for r in spark.read.parquet(state_path).collect()
    }
    assert still == want
