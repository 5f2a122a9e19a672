"""Sequence packing: assign documents to fixed-token-budget training
sequences in key order -- the step between a cleaned corpus and a
token stream that every LLM data pipeline runs last.

The semantics are offset packing: a document starts in the sequence
``floor(tokens_before_it / budget)`` (documents may straddle a
boundary; the reader concatenates in key order, so byte offsets are
exact).  That is a pure function of the EXCLUSIVE GLOBAL PREFIX SUM
of token counts -- the operation that naively needs an unpartitioned
window.  Here it runs through operators/prefix.py::exclusive_cumsum
(three-level hierarchical scan), so the plan holds at corpus scale
while the DuckDB oracle states the same semantics as the single
global window it would be on one node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table
from ..operators.prefix import exclusive_cumsum
from .registry import query

_PACK_BUDGET = 512
# Narrow widths locally so all three prefix levels are genuinely
# exercised at test scale (sf0.01's 500 docs -> 8 buckets / 1 super;
# sf0.1 -> 79 buckets / 5 supers).  Deploy uses the 4096 defaults.
_BUCKET_W, _SUPER_W = 64, 16


@query(
    "pack_sequences",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id,
             len(string_split_regex(lower(text), '\s+')) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS tokens_before
      FROM t
    )
    SELECT CAST(floor(tokens_before / {_PACK_BUDGET}) AS BIGINT) AS seq_id,
           count(*)        AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
           min(doc_id)     AS first_doc,
           max(doc_id)     AS last_doc
    FROM c GROUP BY 1
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into {budget}-token training sequences by key
    order: seq_id = floor(exclusive-prefix-sum(tokens) / budget),
    then per-sequence accounting (doc count, token count, doc-id
    range).  The prefix sum is the distributed three-level scan --
    no unpartitioned window ever sees more than a bucket -- and the
    final accounting is an ordinary partial aggregation on seq_id.
    The oracle states the identical semantics as the global window
    DuckDB can afford on one node."""
    d = read_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.size(F.split(F.lower(F.col("text")), r"\s+")).alias("n_tokens"),
    )
    c = exclusive_cumsum(
        t,
        "doc_id",
        "n_tokens",
        out="tokens_before",
        bucket_width=_BUCKET_W,
        super_width=_SUPER_W,
    )
    return (
        c.select(
            F.floor(F.col("tokens_before") / _PACK_BUDGET)
            .cast("bigint")
            .alias("seq_id"),
            "n_tokens",
            "doc_id",
        )
        .groupBy("seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("seq_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


pack_sequences.__doc__ = pack_sequences.__doc__.format(budget=_PACK_BUDGET)


@query(
    "running_corpus_tokens",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, source,
             len(string_split_regex(lower(text), '\s+')) AS n_tokens
      FROM documents
    )
    SELECT doc_id, source, n_tokens,
           CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) + n_tokens AS BIGINT) AS running_total
    FROM t
    """,
)
def running_corpus_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global running token total per document in key order (the
    inclusive prefix sum) -- the curriculum/checkpoint bookkeeping
    query ("how many tokens precede document X?").  Inclusive = the
    exclusive three-level scan plus the row's own count; same
    distributed shape as pack_sequences, per-row output."""
    d = read_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "source",
        F.size(F.split(F.lower(F.col("text")), r"\s+")).alias("n_tokens"),
    )
    c = exclusive_cumsum(
        t,
        "doc_id",
        "n_tokens",
        out="tokens_before",
        bucket_width=_BUCKET_W,
        super_width=_SUPER_W,
    )
    return c.select(
        "doc_id",
        "source",
        "n_tokens",
        (F.col("tokens_before") + F.col("n_tokens")).alias("running_total"),
    )


# ---------------------------------------------------------------------------
# Shuffled packing: deterministic pseudo-random corpus order
# ---------------------------------------------------------------------------
# shuffle_key = (h60(doc_id) % 2^20) << 40 | doc_id: unique (doc_id
# < 2^40), uniformly distributed at bucket granularity, fits BIGINT.
_SHUF_MOD = 1 << 20
_SHUF_SHIFT = 1 << 40
# keys spread over [0, 2^60): value-range buckets of width 2^52 give
# ~256 balanced buckets regardless of N (hash uniformity), 16 supers.
_SHUF_BUCKET_W = 1 << 52
_SHUF_SUPER_W = 16


@query(
    "pack_sequences_shuffled",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id,
             len(string_split_regex(lower(text), '\s+')) AS n_tokens,
             (('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
              % {_SHUF_MOD}) * {_SHUF_SHIFT} + doc_id AS shuffle_key
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             coalesce(sum(n_tokens) OVER (ORDER BY shuffle_key
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS tokens_before
      FROM t
    )
    SELECT CAST(floor(tokens_before / {_PACK_BUDGET}) AS BIGINT) AS seq_id,
           count(*)        AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
           min(doc_id)     AS first_doc,
           max(doc_id)     AS last_doc
    FROM c GROUP BY 1
    """,
)
def pack_sequences_shuffled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing after a GLOBAL PSEUDO-RANDOM SHUFFLE of the corpus --
    the step real training pipelines run so a sequence never carries
    long runs of one source/crawl segment.  The shuffle is a
    deterministic key remap, not a sort of random(): shuffle_key =
    (md5-hash(doc_id) mod 2^20) << 40 | doc_id is unique, reproducible
    across engines and runs, and uniformly distributed -- so the
    SAME three-level exclusive_cumsum packs in shuffled order with
    value-range buckets that stay balanced by hash uniformity (the
    key space is fixed at [0, 2^60), so bucket width 2^52 yields ~256
    even buckets at ANY corpus size; no rank/global-sort step exists
    anywhere).  Epoch reshuffles are a salt on the hash input.
    Output is the same per-sequence accounting as pack_sequences;
    first_doc/last_doc ranges now interleave across sequences
    (asserted in tests) instead of being contiguous."""
    d = read_table(spark, sf_dir, "documents")
    h60 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    t = d.select(
        "doc_id",
        F.size(F.split(F.lower(F.col("text")), r"\s+")).alias("n_tokens"),
        ((h60 % _SHUF_MOD) * _SHUF_SHIFT + F.col("doc_id")).alias(
            "shuffle_key"
        ),
    )
    c = exclusive_cumsum(
        t,
        "shuffle_key",
        "n_tokens",
        out="tokens_before",
        bucket_width=_SHUF_BUCKET_W,
        super_width=_SHUF_SUPER_W,
    )
    return (
        c.select(
            F.floor(F.col("tokens_before") / _PACK_BUDGET)
            .cast("bigint")
            .alias("seq_id"),
            "n_tokens",
            "doc_id",
        )
        .groupBy("seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("seq_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


# ---------------------------------------------------------------------------
# Sequence-length histogram (context-length planning)
# ---------------------------------------------------------------------------
@query(
    "seqlen_histogram",
    oracle=r"""
    WITH stats AS (
      SELECT CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT) AS n
      FROM documents
    ),
    b AS (
      SELECT length(bin(n)) AS bit_bucket,
             count(*) AS n_docs,
             CAST(sum(n) AS BIGINT) AS bucket_tokens
      FROM stats GROUP BY 1
    )
    SELECT bit_bucket,
           CAST(2 ** (bit_bucket - 1) AS BIGINT) AS lo_tokens,
           CAST(2 ** bit_bucket - 1 AS BIGINT) AS hi_tokens,
           n_docs, bucket_tokens,
           CAST(sum(bucket_tokens) OVER (ORDER BY bit_bucket) AS BIGINT)
             AS cum_tokens
    FROM b
    """,
)
def seqlen_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two sequence-length histogram with cumulative token
    coverage -- the context-length planning table: "how many tokens
    live in documents shorter than 2^w", which fixes the max-seq-len
    / truncation-loss tradeoff before a training run.  Buckets are by
    BIT WIDTH of the token count (length of the binary rendering --
    pure integer, no float log2 whose boundary rounding could differ
    between engines).

    Scale: one narrow pass + one hash aggregate on <= 64 bucket keys;
    the cumulative sum is a window over the BUCKET table (bounded by
    64 rows, not data-scale -- the legitimate use of an unpartitioned
    window, vs the corpus-scale prefix sums that use
    operators/prefix.exclusive_cumsum)."""
    stats = read_table(spark, sf_dir, "documents").select(
        F.size(F.split(F.lower(F.col("text")), r"\s+"))
        .cast("bigint")
        .alias("n")
    )
    b = (
        stats.select(F.length(F.bin("n")).alias("bit_bucket"), "n")
        .groupBy("bit_bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n").cast("bigint").alias("bucket_tokens"),
        )
    )
    from pyspark.sql.window import Window as _W

    w = _W.orderBy("bit_bucket").rowsBetween(_W.unboundedPreceding, 0)
    return b.select(
        "bit_bucket",
        F.pow(F.lit(2), F.col("bit_bucket") - 1).cast("bigint").alias(
            "lo_tokens"
        ),
        (F.pow(F.lit(2), F.col("bit_bucket")).cast("bigint") - 1).alias(
            "hi_tokens"
        ),
        "n_docs",
        "bucket_tokens",
        F.sum("bucket_tokens").over(w).cast("bigint").alias("cum_tokens"),
    )


# ---------------------------------------------------------------------------
# Size-class (harmonic) packing: no document straddles a boundary
# ---------------------------------------------------------------------------
@query(
    "pack_sizeclass",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT)
               AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             CAST(length(bin({_PACK_BUDGET} // n_tokens)) - 1 AS BIGINT)
               AS size_class
      FROM t
    ),
    r AS (
      SELECT doc_id, size_class, n_tokens,
             row_number() OVER (PARTITION BY size_class
                                ORDER BY doc_id) - 1 AS idx
      FROM c
    )
    SELECT size_class,
           CAST(1 << size_class AS BIGINT) AS docs_per_seq,
           CAST(idx // (1 << size_class) AS BIGINT) AS seq_in_class,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc,
           round(100.0 * sum(n_tokens) / {_PACK_BUDGET}, 4)
             AS utilization_pct
    FROM r GROUP BY size_class, seq_in_class
    ORDER BY size_class, seq_in_class
    """,
)
def pack_sizeclass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARMONIC packing: the bin-packing alternative to
    pack_sequences' offset packing for readers that must NOT split a
    document across sequences.  Each document joins size class
    k = floor(log2(budget / tokens)); exactly 2^k class-k documents
    fill one {budget}-token sequence, and because every class-k
    document exceeds budget/2^(k+1), every emitted sequence is >50%
    full by construction -- the harmonic algorithm's utilization
    guarantee, visible in every emitted sequence's exact
    `utilization_pct` (the number the packing planner compares
    against offset packing's 100%-minus-tail); the last sequence of
    a class may dip below it, carrying the class remainder.

    Scale shape: the size class is a per-row expression (code width
    via length(bin(b div n)) -- no float log2); the within-class
    index runs through the PER-GROUP three-level scan
    (operators/prefix.py::exclusive_cumsum with partition_by), so a
    popular size class never serializes through one reducer the way
    row_number() OVER (PARTITION BY class) would -- the oracle states
    exactly that single-node window.  seq = idx div 2^k needs no
    second pass; per-sequence accounting shuffles on the
    (class, seq) key."""
    d = read_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.size(F.split(F.lower(F.col("text")), r"\s+"))
        .cast("bigint")
        .alias("n_tokens"),
    ).withColumn(
        "size_class",
        (
            F.length(F.expr(f"bin({_PACK_BUDGET} div n_tokens)")) - 1
        ).cast("bigint"),
    )
    idx = exclusive_cumsum(
        t,
        "doc_id",
        F.lit(1),
        out="idx",
        bucket_width=_BUCKET_W,
        super_width=_SUPER_W,
        partition_by="size_class",
    )
    cap = F.expr("shiftleft(1L, cast(size_class as int))")
    return (
        idx.select(
            "doc_id",
            "size_class",
            "n_tokens",
            cap.cast("bigint").alias("docs_per_seq"),
            F.expr(
                "idx div shiftleft(1L, cast(size_class as int))"
            ).cast("bigint").alias("seq_in_class"),
        )
        .groupBy("size_class", "docs_per_seq", "seq_in_class")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("seq_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .select(
            "size_class",
            "docs_per_seq",
            "seq_in_class",
            "n_docs",
            "seq_tokens",
            "first_doc",
            "last_doc",
            F.round(
                100.0 * F.col("seq_tokens") / _PACK_BUDGET, 4
            ).alias("utilization_pct"),
        )
        .orderBy("size_class", "seq_in_class")
    )


pack_sizeclass.__doc__ = pack_sizeclass.__doc__.replace(
    "{budget}", str(_PACK_BUDGET)
)
