"""Corpus scrubbing operators: PII detection + redaction.

The reference pipeline has no PII handling (its 10-file surface stops
at display formatting, e.g. the CSV value quoting of
pages/index.js:426-430); this module
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


# ---------------------------------------------------------------------------
# Model-based quality classifier (broadcast linear model + sigmoid)
# ---------------------------------------------------------------------------
_QC_STOP_SQL = ", ".join(
    f"'{w}'"
    for w in ("the", "a", "of", "and", "to", "in", "is", "on", "for")
)
_QC_STOPS = ("the", "a", "of", "and", "to", "in", "is", "on", "for")
# Fixed logistic-model weights: intercept, stop_ratio, mean_tok_len, ttr.
_QC_W = (-2.0, 6.0, 0.3, 1.5)
_QC_THRESH = 0.6


@query(
    "quality_classifier",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
      FROM documents
    ),
    feat AS (
      SELECT doc_id,
             len(toks) AS n_tokens,
             round(CAST(len(list_filter(toks,
                     x -> x IN ({_QC_STOP_SQL}))) AS DOUBLE)
                   / len(toks), 4)                       AS stop_ratio,
             round(CAST(list_sum(list_transform(toks, x -> len(x)))
                        AS DOUBLE) / len(toks), 4)        AS mean_tok_len,
             round(CAST(len(list_distinct(toks)) AS DOUBLE)
                   / len(toks), 4)                        AS ttr
      FROM t WHERE len(toks) > 0
    ),
    scored AS (
      SELECT doc_id, n_tokens, stop_ratio, mean_tok_len, ttr,
             round(1.0 / (1.0 + exp(-({_QC_W[0]} + {_QC_W[1]} * stop_ratio
                   + {_QC_W[2]} * mean_tok_len + {_QC_W[3]} * ttr))), 4)
               AS score
      FROM feat
    )
    SELECT doc_id, n_tokens, stop_ratio, mean_tok_len, ttr, score,
           CASE WHEN score >= {_QC_THRESH} THEN 'keep' ELSE 'drop' END
             AS label
    FROM scored
    """,
)
def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filter: featurize every document (stopword
    ratio, mean token length, type-token ratio), apply a FIXED
    logistic model (the broadcast-small-model pattern -- in
    production the weights come from a trained fastText/LR quality
    classifier; here they are constants so the oracle can restate
    them), and emit the per-doc keep/drop decision plus the score the
    curriculum samplers consume.  Features are rounded to 4 decimals
    BEFORE entering the linear form so both engines score identical
    inputs (kills cross-engine float drift at the decision boundary).

    Scale: narrow per-row projection -- tokenization, the three
    array folds, and the sigmoid all run inside whole-stage codegen
    with zero shuffles; the 'model' is a constant expression, the
    degenerate (and fastest) case of a broadcast join.  This is the
    exact shape a learned-classifier scoring pass has at 100 TB:
    scan-bound, embarrassingly parallel."""
    d = read_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), r"\s+")
    staged = d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda x: x.isin(*_QC_STOPS))).alias("n_stop"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x)),
            F.lit(0),
            lambda acc, t: acc + t,
        ).alias("sum_len"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
    ).filter(F.col("n_tokens") > 0)
    feat = staged.select(
        "doc_id",
        "n_tokens",
        F.round(
            F.col("n_stop").cast("double") / F.col("n_tokens"), 4
        ).alias("stop_ratio"),
        F.round(
            F.col("sum_len").cast("double") / F.col("n_tokens"), 4
        ).alias("mean_tok_len"),
        F.round(
            F.col("n_distinct").cast("double") / F.col("n_tokens"), 4
        ).alias("ttr"),
    )
    z = (
        F.lit(_QC_W[0])
        + F.lit(_QC_W[1]) * F.col("stop_ratio")
        + F.lit(_QC_W[2]) * F.col("mean_tok_len")
        + F.lit(_QC_W[3]) * F.col("ttr")
    )
    scored = feat.withColumn(
        "score", F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 4)
    )
    return scored.withColumn(
        "label",
        F.when(F.col("score") >= _QC_THRESH, "keep").otherwise("drop"),
    )


# ---------------------------------------------------------------------------
# Importance resampling (DSIR-style: target-vs-corpus unigram LM ratio)
# ---------------------------------------------------------------------------
_IMP_TARGET_LANG = "en"
_IMP_N = 120  # docs selected


@query(
    "sample_importance",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, unnest(string_split_regex(lower(text), '\\s+'))
               AS tok
      FROM documents
    ),
    counts AS (
      SELECT tok,
             count(*) AS c_all,
             CAST(sum(CASE WHEN lang = '{_IMP_TARGET_LANG}'
                           THEN 1 ELSE 0 END) AS BIGINT) AS c_tgt
      FROM tok GROUP BY tok
    ),
    totals AS (
      SELECT CAST(sum(c_all) AS BIGINT) AS n_all,
             CAST(sum(c_tgt) AS BIGINT) AS n_tgt,
             count(*)                   AS v
      FROM counts
    ),
    weighted AS (
      SELECT t.doc_id, t.lang,
             count(*) AS n_tokens,
             round(avg(ln(((c.c_tgt + 1.0) / (tt.n_tgt + tt.v))
                        / ((c.c_all + 1.0) / (tt.n_all + tt.v)))), 4)
               AS avg_log_ratio
      FROM tok t JOIN counts c USING (tok) CROSS JOIN totals tt
      GROUP BY t.doc_id, t.lang
    )
    SELECT doc_id, lang, n_tokens, avg_log_ratio
    FROM weighted
    ORDER BY round(avg_log_ratio, 6) DESC, doc_id
    LIMIT {_IMP_N}
    """,
)
def sample_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-selection-by-importance-resampling (DSIR-style): score
    every document by the mean per-token log-likelihood ratio of a
    TARGET unigram LM (add-one-smoothed, built from the '{lang}'
    slice) against the full-corpus unigram LM, then keep the top
    {n} documents -- the cheap importance sampler that skews a
    pretraining mixture toward a target domain without a learned
    classifier.

    Scale: one vocabulary-bounded token-count aggregate serves BOTH
    language models (the target count rides along as a conditional
    sum, so the corpus is scanned once); the count table and the
    1-row totals broadcast back onto the exploded tokens; per-doc
    scoring is one grouped average; selection is a TakeOrdered
    (per-partition top-{n} then merge -- no global sort, no
    unpartitioned window).  Ordering is on the 6-decimal-rounded
    score with doc_id tiebreak, so the cut is engine-deterministic."""
    d = read_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"),
    )
    counts = tok.groupBy("tok").agg(
        F.count("*").alias("c_all"),
        F.sum(
            F.when(F.col("lang") == _IMP_TARGET_LANG, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("c_tgt"),
    )
    totals = counts.agg(
        F.sum("c_all").cast("bigint").alias("n_all"),
        F.sum("c_tgt").cast("bigint").alias("n_tgt"),
        F.count("*").alias("v"),
    )
    ratio = F.log(
        ((F.col("c_tgt") + 1.0) / (F.col("n_tgt") + F.col("v")))
        / ((F.col("c_all") + 1.0) / (F.col("n_all") + F.col("v")))
    )
    weighted = (
        tok.join(F.broadcast(counts), "tok")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(ratio), 4).alias("avg_log_ratio"),
        )
    )
    return weighted.orderBy(
        F.round(F.col("avg_log_ratio"), 6).desc(), "doc_id"
    ).limit(_IMP_N)


sample_importance.__doc__ = sample_importance.__doc__.format(
    lang=_IMP_TARGET_LANG, n=_IMP_N
)


# ---------------------------------------------------------------------------
# Shared hygiene core (batch + streaming twins consume the same frame)
# ---------------------------------------------------------------------------
def hygiene_frame(docs: DataFrame) -> DataFrame:
    """One-pass corpus-hygiene transform over (doc_id, text) rows:
    PII detection counts (emails / phones / IPs on the text AS GIVEN
    -- no injection here), the quality-classifier features + sigmoid
    score, and the combined admission decision
    (``admit`` = classifier says keep AND no PII found).

    Stateless and narrow (zero shuffles, no watermark state), so the
    SAME function serves the batch queries and the Structured
    Streaming ingest twin (streaming/jobs.py::hygiene_stream) --
    the per-document hygiene gate a landing-zone pipeline applies
    before anything enters the corpus."""
    toks = F.split(F.lower(F.col("text")), r"\s+")
    n_emails = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(_RE_EMAIL), F.lit(0))
    )
    n_phones = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(_RE_PHONE), F.lit(0))
    )
    n_ips = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(_RE_IP), F.lit(0))
    )
    staged = docs.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        n_ips.alias("n_ips"),
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda x: x.isin(*_QC_STOPS))).alias("n_stop"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x)),
            F.lit(0),
            lambda acc, t: acc + t,
        ).alias("sum_len"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
    ).filter(F.col("n_tokens") > 0)
    feat = staged.select(
        "doc_id",
        "n_emails",
        "n_phones",
        "n_ips",
        "n_tokens",
        F.round(
            F.col("n_stop").cast("double") / F.col("n_tokens"), 4
        ).alias("stop_ratio"),
        F.round(
            F.col("sum_len").cast("double") / F.col("n_tokens"), 4
        ).alias("mean_tok_len"),
        F.round(
            F.col("n_distinct").cast("double") / F.col("n_tokens"), 4
        ).alias("ttr"),
    )
    z = (
        F.lit(_QC_W[0])
        + F.lit(_QC_W[1]) * F.col("stop_ratio")
        + F.lit(_QC_W[2]) * F.col("mean_tok_len")
        + F.lit(_QC_W[3]) * F.col("ttr")
    )
    scored = feat.select(
        "*",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 4).alias("score"),
        (
            (F.col("n_emails") + F.col("n_phones") + F.col("n_ips")) > 0
        ).alias("has_pii"),
    )
    return scored.select(
        "*",
        (
            (F.col("score") >= _QC_THRESH) & ~F.col("has_pii")
        ).alias("admit"),
    )


# ---------------------------------------------------------------------------
# k-anonymity audit: equivalence-class size profile over quasi-identifiers
# ---------------------------------------------------------------------------
@query(
    "k_anonymity_audit",
    oracle="""
    WITH classes AS (
      SELECT count(*) AS class_size
      FROM customer
      GROUP BY c_nationkey, c_mktsegment, CAST(floor(c_acctbal / 1000) AS BIGINT)
    )
    SELECT class_size,
           count(*) AS n_classes,
           CAST(class_size * count(*) AS BIGINT) AS n_rows
    FROM classes GROUP BY class_size
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity profile of a quasi-identifier tuple (nation,
    market segment, account-balance band): how many equivalence
    classes exist at each size, and how many ROWS sit in them -- the
    re-identification risk audit run before any dataset release
    (rows in classes of size < k are linkable; the histogram is the
    whole risk curve, so the k=5 or k=10 policy threshold is a
    read-off, not a re-run).

    Two cascaded integer-exact aggregations -- QI-tuple grain, then
    class-size grain -- both partial-aggregated and map-side
    combined; output is bounded by the largest class size.  The
    continuous attribute enters the QI only through a coarse
    deterministic band (floor/1000), the generalization step
    k-anonymization itself would take."""
    c = read_table(spark, sf_dir, "customer")
    classes = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
    ).agg(F.count("*").alias("class_size"))
    return classes.groupBy("class_size").agg(
        F.count("*").alias("n_classes"),
        (F.col("class_size") * F.count("*")).cast("bigint").alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# l-diversity audit: sensitive-attribute diversity inside QI classes
# ---------------------------------------------------------------------------
@query(
    "l_diversity_audit",
    oracle="""
    WITH classes AS (
      SELECT count(*) AS class_size,
             count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) AS l
      FROM customer
      GROUP BY c_nationkey, c_mktsegment
    )
    SELECT l,
           count(*) AS n_classes,
           CAST(sum(class_size) AS BIGINT) AS n_rows,
           CAST(min(class_size) AS BIGINT) AS min_class_size
    FROM classes GROUP BY l
    """,
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity profile: k_anonymity_audit's companion audit.  A
    k-anonymous class is still linkable when every row in it shares
    the SAME sensitive value (the homogeneity attack), so releases
    audit the number of DISTINCT sensitive values (l) per
    quasi-identifier class -- here QI = (nation, market segment) and
    the sensitive attribute is the account-balance band.  Output is
    the l-histogram (classes and rows at each diversity level, plus
    the smallest class at that level); the l>=3 policy threshold is a
    read-off.

    Same two-cascaded-aggregation shape as the k-anonymity audit --
    QI grain with a count-distinct (partial-aggregated: the distinct
    set is bounded by the band count, not the class size), then
    l grain; output bounded by max diversity.  (Reference's only
    privacy surface is field defaulting, src/lib/users.js:17-33; this
    is the release-gate discipline grown up.)"""
    c = read_table(spark, sf_dir, "customer")
    classes = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("class_size"),
        F.countDistinct(
            F.floor(F.col("c_acctbal") / 1000).cast("bigint")
        ).alias("l"),
    )
    return classes.groupBy("l").agg(
        F.count("*").alias("n_classes"),
        F.sum("class_size").cast("bigint").alias("n_rows"),
        F.min("class_size").cast("bigint").alias("min_class_size"),
    )


# ---------------------------------------------------------------------------
# Importance-weight diagnostics: effective sample size + clipping
# ---------------------------------------------------------------------------
_ESS_CLIP = 4.0


@query(
    "sample_ess",
    oracle=f"""
    WITH per_src AS (
      SELECT source, count(*) AS n_docs FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
             count(*) AS n_sources
      FROM per_src
    ),
    w AS (
      SELECT s.source, s.n_docs,
             (CAST(t.n_total AS DOUBLE) / t.n_sources) / s.n_docs AS wt,
             least((CAST(t.n_total AS DOUBLE) / t.n_sources) / s.n_docs,
                   {_ESS_CLIP}) AS wt_clip
      FROM per_src s CROSS JOIN tot t
    )
    SELECT CAST(sum(n_docs) AS BIGINT) AS n_docs,
           round(pow(sum(n_docs * wt), 2) / sum(n_docs * wt * wt), 2)
             AS ess_raw,
           round(pow(sum(n_docs * wt_clip), 2)
                 / sum(n_docs * wt_clip * wt_clip), 2) AS ess_clipped,
           round(pow(sum(n_docs * wt), 2) / sum(n_docs * wt * wt)
                 / sum(n_docs), 4) AS ess_fraction,
           round(sum(CASE WHEN wt > {_ESS_CLIP} THEN n_docs
                          ELSE 0 END) / CAST(sum(n_docs) AS DOUBLE), 4)
             AS clipped_doc_fraction
    FROM w
    """,
)
def sample_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective-sample-size diagnostics for importance-weighted
    training mixtures: re-weighting the corpus toward a UNIFORM
    source mixture (weight_s = target_share / corpus_share, the
    sample_mixture / DSIR setting) costs statistical efficiency --
    ESS = (sum w)^2 / sum w^2 is the number of equally-weighted
    documents the weighted corpus is worth (Kish, 1965).  Emits raw
    and clipped-at-{clip} ESS, the ESS fraction, and how much of the
    corpus the clip touches -- the go/no-go readout before training
    on weights instead of resampling.

    Scale: weights depend only on the source, so the doc-level sums
    collapse algebraically to source-level sums (sum over docs of w^k
    = sum over sources of n_s * w_s^k) -- ONE source-grain aggregate
    (map-side combined, <=n_sources rows) and a 1-row reduction; the
    corpus is scanned once and nothing is exploded.  The same algebra
    is how a 100-TB run computes ESS from the source census it
    already maintains, for free."""
    per_src = (
        read_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"))
    )
    tot = per_src.agg(
        F.sum("n_docs").cast("bigint").alias("n_total"),
        F.count("*").alias("n_sources"),
    )
    wt = (F.col("n_total").cast("double") / F.col("n_sources")) / F.col(
        "n_docs"
    )
    w = per_src.crossJoin(F.broadcast(tot)).select(
        "n_docs",
        wt.alias("wt"),
        F.least(wt, F.lit(_ESS_CLIP)).alias("wt_clip"),
    )
    ess = F.pow(F.sum(F.col("n_docs") * F.col("wt")), 2) / F.sum(
        F.col("n_docs") * F.col("wt") * F.col("wt")
    )
    ess_clip = F.pow(F.sum(F.col("n_docs") * F.col("wt_clip")), 2) / F.sum(
        F.col("n_docs") * F.col("wt_clip") * F.col("wt_clip")
    )
    return w.agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.round(ess, 2).alias("ess_raw"),
        F.round(ess_clip, 2).alias("ess_clipped"),
        F.round(ess / F.sum("n_docs"), 4).alias("ess_fraction"),
        F.round(
            F.sum(
                F.when(F.col("wt") > _ESS_CLIP, F.col("n_docs")).otherwise(0)
            )
            / F.sum("n_docs").cast("double"),
            4,
        ).alias("clipped_doc_fraction"),
    )


sample_ess.__doc__ = sample_ess.__doc__.format(clip=_ESS_CLIP)


# ---------------------------------------------------------------------------
# Differentially-private release: deterministic Laplace noise on counts
# ---------------------------------------------------------------------------
_DP_EPS = 0.5


@query(
    "dp_noisy_counts",
    oracle=f"""
    WITH g AS (
      SELECT c_mktsegment AS segment, count(*) AS n_true,
             ('0x' || substring(md5(c_mktsegment), 1, 15))::BIGINT
               / 1152921504606846976.0 AS u01
      FROM customer GROUP BY c_mktsegment
    )
    SELECT segment, n_true,
           round(n_true + (CASE WHEN u01 >= 0.5 THEN -1.0 ELSE 1.0 END)
                 * (1.0 / {_DP_EPS})
                 * ln(1.0 - 2.0 * abs(u01 - 0.5)), 2) AS n_noisy,
           {_DP_EPS} AS epsilon
    FROM g
    """,
)
def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release: per-segment counts plus
    Laplace(1/epsilon) noise, epsilon = {eps} -- the mechanism every
    privacy-bounded aggregate release uses (count sensitivity 1 =>
    Laplace scale 1/epsilon).

    The noise is DETERMINISTIC by construction: the uniform draw is
    an md5 hash of the group key mapped to [0,1) (the engine's
    standard portable-hash idiom), pushed through the inverse Laplace
    CDF -- so both engines derive bit-identical noise, the release is
    reproducible across reruns (a real property DP deployments want:
    re-releasing the same statistic must NOT spend fresh budget or
    average the noise away), and the oracle can state the mechanism
    exactly.  True counts ride along for the audit view; a production
    release would project them out.  One integer-exact aggregation;
    noise arithmetic is per-GROUP, on the tiny aggregated frame."""
    c = read_table(spark, sf_dir, "customer")
    g = c.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").alias("n_true")
    )
    u01 = F.conv(F.substring(F.md5(F.col("segment")), 1, 15), 16, 10).cast(
        "double"
    ) / F.lit(float(1 << 60))
    noise = (
        F.when(u01 >= 0.5, F.lit(-1.0)).otherwise(F.lit(1.0))
        * (1.0 / _DP_EPS)
        * F.log(1.0 - 2.0 * F.abs(u01 - F.lit(0.5)))
    )
    return g.select(
        "segment",
        "n_true",
        F.round(F.col("n_true") + noise, 2).alias("n_noisy"),
        F.lit(_DP_EPS).alias("epsilon"),
    )


dp_noisy_counts.__doc__ = dp_noisy_counts.__doc__.format(eps=_DP_EPS)


# ---------------------------------------------------------------------------
# Corpus release manifest: per-source accounting + order-free fingerprint
# ---------------------------------------------------------------------------
@query(
    "release_manifest",
    oracle=r"""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(len(string_split_regex(lower(text), '\s+'))) AS BIGINT)
             AS n_tokens,
           CAST(sum(n_chars) AS BIGINT) AS n_chars,
           min(doc_id) AS min_doc_id,
           max(doc_id) AS max_doc_id,
           bit_xor(('0x' || substring(
               md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 15))::BIGINT)
             AS content_fingerprint
    FROM documents GROUP BY source
    """,
)
def release_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source release manifest for the corpus: document/token/char
    tallies, doc-id range, and a CONTENT FINGERPRINT -- the artifact a
    dataset release ships so a consumer can verify they materialized
    exactly the published bytes (and a rebuild can prove it changed
    nothing).

    The fingerprint is the XOR of per-document md5-derived 60-bit
    hashes keyed by (doc_id, text).  XOR is commutative, associative,
    and self-inverse, which buys exactly the properties a distributed
    manifest needs: the aggregate is partition-order independent (any
    shuffle layout yields the same value), map-side combinable, and
    incrementally maintainable -- adding or deleting a document is
    one XOR against the published fingerprint, no rescan.  All other
    columns are integer-exact aggregates; one shuffle of
    O(|sources|) rows."""
    return manifest_frame(read_table(spark, sf_dir, "documents"))


def manifest_frame(docs: DataFrame) -> DataFrame:
    """Per-source manifest aggregation over any documents frame --
    shared by release_manifest (whole table) and the streaming twin's
    per-batch delta (every column is a commutative/associative
    reduction, so per-batch manifests MERGE into the table manifest)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("text"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return (
        docs.select(
            "source",
            "doc_id",
            "n_chars",
            F.size(F.split(F.lower(F.col("text")), r"\s+")).alias("n_tokens"),
            h.alias("h"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.expr("bit_xor(h)").alias("content_fingerprint"),
        )
    )


# ---------------------------------------------------------------------------
# Robust outlier detection (median / MAD, fully integer-exact)
# ---------------------------------------------------------------------------
_MAD_K = 2  # flag when |x - median| > K * MAD


@query(
    "outlier_mad",
    oracle=rf"""
    WITH stats AS (
      SELECT doc_id,
             CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT)
               AS n_tokens,
             CAST(length(text) AS BIGINT) AS n_chars
      FROM documents
    ),
    med AS (
      SELECT CAST(2 * median(n_tokens) AS BIGINT) AS med2_t,
             CAST(2 * median(n_chars)  AS BIGINT) AS med2_c
      FROM stats
    ),
    dev AS (
      SELECT s.doc_id, s.n_tokens, s.n_chars,
             abs(2 * s.n_tokens - m.med2_t) AS d_t,
             abs(2 * s.n_chars  - m.med2_c) AS d_c
      FROM stats s, med m
    ),
    mad AS (
      SELECT CAST(2 * median(d_t) AS BIGINT) AS mad4_t,
             CAST(2 * median(d_c) AS BIGINT) AS mad4_c
      FROM dev
    )
    SELECT doc_id, n_tokens, n_chars,
           (2 * d.d_t > {_MAD_K} * mad4_t) AS tok_outlier,
           (2 * d.d_c > {_MAD_K} * mad4_c) AS chars_outlier
    FROM dev d, mad
    WHERE 2 * d.d_t > {_MAD_K} * mad4_t OR 2 * d.d_c > {_MAD_K} * mad4_c
    """,
)
def outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-document outlier detection with median / MAD (the
    estimator a curation pipeline uses instead of mean / stddev,
    because a heavy-tailed corpus drags the mean toward its own
    outliers): flag documents whose token or character count deviates
    from the corpus median by more than {k}x the median absolute
    deviation.  Emits only the flagged rows -- the quarantine list.

    Exactness: medians of integers live on a half-integer grid, so
    the plan carries ``2*median`` and ``4*MAD`` as BIGINTs (the
    midpoint interpolation both engines use makes ``2*median`` ==
    ``x_k + x_{{k+1}}`` exactly) and the flag compares
    ``2*d > K*mad4`` in pure integer arithmetic -- no float ever
    crosses the engine boundary, per the repo's float-exactness rule.

    Scale: one narrow stats projection, two 1-row percentile
    aggregates broadcast back (no data-scale shuffle, no window).
    At 100 TB swap ``percentile`` for ``approx_percentile`` (KLL
    sketch, mergeable, one pass) -- same shape, bounded error; the
    exact form is the correctness baseline, like
    ``winsorized_pricing`` vs its approx twin.  The reference has no
    statistics surface at all (buildMetrics stops at counts,
    src/lib/users.js:65-79); this is the robust-statistics layer a
    training-data pipeline needs before length filtering.
    """
    stats = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.lower(F.col("text")), r"\s+"))
        .cast("bigint")
        .alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
    )
    med = stats.agg(
        (F.percentile("n_tokens", F.lit(0.5)) * 2)
        .cast("bigint")
        .alias("med2_t"),
        (F.percentile("n_chars", F.lit(0.5)) * 2)
        .cast("bigint")
        .alias("med2_c"),
    )
    dev = stats.join(F.broadcast(med)).select(
        "doc_id",
        "n_tokens",
        "n_chars",
        F.abs(F.col("n_tokens") * 2 - F.col("med2_t")).alias("d_t"),
        F.abs(F.col("n_chars") * 2 - F.col("med2_c")).alias("d_c"),
    )
    mad = dev.agg(
        (F.percentile("d_t", F.lit(0.5)) * 2).cast("bigint").alias("mad4_t"),
        (F.percentile("d_c", F.lit(0.5)) * 2).cast("bigint").alias("mad4_c"),
    )
    tok_out = F.col("d_t") * 2 > F.col("mad4_t") * _MAD_K
    chars_out = F.col("d_c") * 2 > F.col("mad4_c") * _MAD_K
    return (
        dev.join(F.broadcast(mad))
        .filter(tok_out | chars_out)
        .select(
            "doc_id",
            "n_tokens",
            "n_chars",
            tok_out.alias("tok_outlier"),
            chars_out.alias("chars_outlier"),
        )
    )


outlier_mad.__doc__ = outlier_mad.__doc__.format(k=_MAD_K)
