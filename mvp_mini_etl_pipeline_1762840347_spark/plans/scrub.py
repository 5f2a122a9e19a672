"""Corpus scrubbing operators: PII detection + redaction.

The reference pipeline has no PII handling (its 10-file surface stops
at display formatting, e.g. lib/transform.js formatters); this module
adds the scrub pass every large-scale training-data pipeline runs
before packing: find emails / phone numbers / IP addresses, count
them, and replace them with typed placeholder tokens.

The driver's synthetic ``documents.text`` is clean word-soup, so each
query first derives a deterministic "dirty" variant (PII strings
keyed off ``doc_id``, injected with the SAME expression in Spark and
the DuckDB oracle) and then runs the real detection/redaction
machinery against it.  The regexes are the operator under test; the
injection only manufactures known positives (the same
deterministic-fixture approach as ``plans/multimodal.py``).

Scale: per-document narrow projection -- zero shuffles, whole-stage
codegen end to end (regexp_extract_all / regexp_replace are JVM
expressions).  At 100 TB this is the ideal operator shape: embarrass-
ingly parallel, scan-bound, no Python.

Patterns are kept in the common subset of Java regex (Spark) and RE2
(DuckDB): character classes, bounded repetition, ``\\b`` anchors; no
lookarounds (RE2 lacks them).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table
from .registry import query

_RE_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_RE_PHONE = r"\b555-01[0-9]{2}\b"
_RE_IP = r"\b10\.[0-9]{1,3}\.0\.[0-9]{1,3}\b"

# Deterministic PII injection, keyed off doc_id (same in both engines).
_DIRTY_SQL = """
    text
    || CASE WHEN doc_id % 3 = 0
            THEN ' contact user' || CAST(doc_id AS VARCHAR)
                 || '@example.com now' ELSE '' END
    || CASE WHEN doc_id % 5 = 0
            THEN ' call 555-01'
                 || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                 || ' today' ELSE '' END
    || CASE WHEN doc_id % 7 = 0
            THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                 || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR)
            ELSE '' END
"""


def _dirty_col() -> Column:
    did = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit(" contact user"),
                did.cast("string"),
                F.lit("@example.com now"),
            ),
        ).otherwise(""),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit(" call 555-01"),
                F.lpad((did % 100).cast("string"), 2, "0"),
                F.lit(" today"),
            ),
        ).otherwise(""),
        F.when(
            did % 7 == 0,
            F.concat(
                F.lit(" from 10."),
                (did % 256).cast("string"),
                F.lit(".0."),
                ((did * 7) % 256).cast("string"),
            ),
        ).otherwise(""),
    )


@query(
    "pii_redaction",
    oracle=rf"""
    WITH dirty AS (
      SELECT doc_id, ({_DIRTY_SQL}) AS dirty FROM documents
    ),
    hits AS (
      SELECT doc_id, dirty,
             len(regexp_extract_all(dirty, '{_RE_EMAIL}')) AS n_emails,
             len(regexp_extract_all(dirty, '{_RE_PHONE}')) AS n_phones,
             len(regexp_extract_all(dirty, '{_RE_IP}'))    AS n_ips
      FROM dirty
    )
    SELECT doc_id, n_emails, n_phones, n_ips,
           (n_emails + n_phones + n_ips > 0) AS has_pii,
           md5(regexp_replace(regexp_replace(regexp_replace(dirty,
                 '{_RE_EMAIL}', '[EMAIL]', 'g'),
                 '{_RE_PHONE}', '[PHONE]', 'g'),
                 '{_RE_IP}', '[IP]', 'g'))   AS redacted_md5
    FROM hits
    """,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass: detect emails / phone numbers / IPv4 addresses
    with JVM-side regexes, count per document, and emit an md5 of the
    fully redacted text (placeholders ``[EMAIL]``/``[PHONE]``/
    ``[IP]``).  The md5 proves byte-exact redaction output against
    the oracle without shipping the full text through the hash gate.

    Scale: narrow per-row projection, no shuffle, no Python --
    regexp_extract_all / regexp_replace run inside whole-stage
    codegen, so the pass is scan-bound at 100 TB.  Known positives
    are injected deterministically from doc_id (see module
    docstring); the detection regexes, not the injection, are the
    operator under test."""
    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", _dirty_col().alias("dirty")
    )
    n_emails = F.size(
        F.regexp_extract_all(F.col("dirty"), F.lit(_RE_EMAIL), F.lit(0))
    )
    n_phones = F.size(
        F.regexp_extract_all(F.col("dirty"), F.lit(_RE_PHONE), F.lit(0))
    )
    n_ips = F.size(
        F.regexp_extract_all(F.col("dirty"), F.lit(_RE_IP), F.lit(0))
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("dirty"), _RE_EMAIL, "[EMAIL]"),
            _RE_PHONE,
            "[PHONE]",
        ),
        _RE_IP,
        "[IP]",
    )
    staged = d.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        n_ips.alias("n_ips"),
        F.md5(redacted).alias("redacted_md5"),
    )
    return staged.select(
        "doc_id",
        "n_emails",
        "n_phones",
        "n_ips",
        (
            (F.col("n_emails") + F.col("n_phones") + F.col("n_ips")) > 0
        ).alias("has_pii"),
        "redacted_md5",
    )
