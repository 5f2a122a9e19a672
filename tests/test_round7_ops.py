"""Round-7 flagship: the end-to-end training-data release manifest.

The composite must reconcile EXACTLY with its stand-alone stage
queries (corpus_disposition's 5_* census rows) and its content
fingerprint must equal an independent hashlib-computed XOR over the
documents the pipeline kept -- the composed-equals-stages contract.
"""

from __future__ import annotations

import hashlib

import pyarrow.parquet as pq

from mvp_mini_etl_pipeline_1762840347_spark import plans

SF = "/root/testdata/sf0.001"


def _rows(df):
    return {r["split"]: r.asDict() for r in df.collect()}


def test_release_reconciles_with_disposition(spark):
    release = _rows(plans.QUERIES["training_data_release"](spark, SF))
    disp = {
        r["disposition"]: r.asDict()
        for r in plans.QUERIES["corpus_disposition"](spark, SF).collect()
    }
    kept = {k: v for k, v in disp.items() if k.startswith("5_")}
    assert set(release) == {k[2:] for k in kept}, (release.keys(), kept.keys())
    for k, d in kept.items():
        r = release[k[2:]]
        assert r["n_docs"] == d["n_docs"], (k, r, d)
        assert r["n_tokens"] == d["total_tokens"], (k, r, d)
        assert r["n_sequences"] == d["n_sequences"], (k, r, d)


def test_release_fingerprint_matches_hashlib(spark):
    """The XOR content fingerprint re-derived independently: hashlib
    md5 over 'doc_id:text' for exactly the kept documents, 60-bit
    prefix, XOR per split -- a conv/substring/endianness slip in the
    engine's hash chain changes the value."""
    from mvp_mini_etl_pipeline_1762840347_spark.plans.quality import (
        _disposition_frame,
    )

    per_doc = {
        r["doc_id"]: r["disposition"]
        for r in _disposition_frame(spark, SF).collect()
    }
    docs = pq.read_table(SF + "/documents.parquet").to_pylist()
    expected: dict[str, int] = {}
    n_kept = 0
    for d in docs:
        fate = per_doc[d["doc_id"]]
        if not fate.startswith("5_"):
            continue
        n_kept += 1
        h = int(
            hashlib.md5(f"{d['doc_id']}:{d['text']}".encode()).hexdigest()[
                :15
            ],
            16,
        )
        expected[fate[2:]] = expected.get(fate[2:], 0) ^ h
    assert n_kept > 0 and len(expected) == 3, (n_kept, expected)

    release = _rows(plans.QUERIES["training_data_release"](spark, SF))
    for split, fp in expected.items():
        assert release[split]["content_fingerprint"] == fp, (
            split,
            release[split]["content_fingerprint"],
            fp,
        )


def test_dispositions_partition_the_corpus(spark):
    """Every document gets exactly one fate: release + drop counts sum
    to the table size (auditable shrinkage, the composite's core
    invariant)."""
    disp = plans.QUERIES["corpus_disposition"](spark, SF).collect()
    n_total = sum(r["n_docs"] for r in disp)
    n_docs = pq.read_metadata(SF + "/documents.parquet").num_rows
    assert n_total == n_docs, (n_total, n_docs)


def test_release_manifest_stream_matches_batch(spark, tmp_path_factory):
    """The streamed per-source manifest over several micro-batches
    must equal the batch release_manifest of all rows (every column
    is a commutative reduction; XOR composes batch fingerprints), and
    a replayed batch id must be a no-op."""
    from pyspark.sql import functions as F

    from mvp_mini_etl_pipeline_1762840347_spark import plans
    from mvp_mini_etl_pipeline_1762840347_spark.io import read_table
    from mvp_mini_etl_pipeline_1762840347_spark.streaming import jobs

    base = tmp_path_factory.mktemp("release_stream")
    landing = str(base / "landing")
    d = read_table(spark, SF, "documents")
    d.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
        landing, mode="overwrite"
    )
    d.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(
        landing, mode="append"
    )
    state_path = str(base / "manifest")

    docs = (
        spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    q = jobs.release_manifest_stream(spark, docs, state_path)
    q.awaitTermination(120)

    got = {
        r["source"]: r.asDict()
        for r in spark.read.parquet(state_path).collect()
    }
    want = {
        r["source"]: r.asDict()
        for r in plans.QUERIES["release_manifest"](spark, SF).collect()
    }
    assert got == want

    # replayed batch id: exactly-once no-op
    assert not jobs.release_manifest_merge_step(
        spark, d.limit(3), 0, state_path
    )
    still = {
        r["source"]: r.asDict()
        for r in spark.read.parquet(state_path).collect()
    }
    assert still == want
