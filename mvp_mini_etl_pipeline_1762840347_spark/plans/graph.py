"""Iterative graph operator: connected-component clustering of the
MinHash near-dup candidate pairs -- the step that turns pairwise
"A looks like B" evidence into dedup groups with one canonical doc
per cluster (standard in training-data dedup pipelines).

Spark side: driver-coordinated min-label propagation -- each round is
one join + one aggregate, state is a (node, label) DataFrame, lineage
truncated per round with localCheckpoint.  Rounds needed = graph
diameter (tiny for near-dup clusters); each round is a pair of
shuffles keyed by node, so the pattern holds at any corpus size
(this is exactly large-scale connected components a la
GraphX/Pregel, expressed in plain DataFrames).

Oracle: DuckDB recursive CTE computing min reachable label over the
same edges -- the rare case where an "iterative, non-SQL" operator
still gets a full value-checked oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import _MINHASH_PAIRS_SQL, minhash_pairs
from .registry import query

MAX_ITERS = 20


def connected_components(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Min-label propagation over an undirected edge list.
    Returns (node, cluster_id) where cluster_id = min node id in the
    component.  Deterministic on any partitioning."""
    both = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    both = both.distinct().localCheckpoint()
    labels = (
        both.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    # The convergence probe is FUSED into each round: the node's
    # previous label rides through the min-aggregation as a second
    # column (max over exactly-one-non-null), so "did anything
    # change" is a filter+count over the freshly checkpointed round
    # output -- no separate join action, and convergence is detected
    # the round it happens.
    label_type = dict(labels.dtypes)["label"]
    for _ in range(MAX_ITERS):
        neighbor_labels = both.join(
            labels, both.b == labels.node, "inner"
        ).select(
            F.col("a").alias("node"),
            "label",
            F.lit(None).cast(label_type).alias("old"),
        )
        new_labels = (
            labels.select("node", "label", F.col("label").alias("old"))
            .unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"), F.max("old").alias("old"))
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("label") != F.col("old")).count()
        labels = new_labels.drop("old")
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("cluster_id"))


@query(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      SELECT doc_a, doc_b FROM ({_MINHASH_PAIRS_SQL})
    ),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    reach(v, u) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.v, e.b FROM reach r JOIN edges e ON r.u = e.a
    )
    SELECT v              AS doc_id,
           least(v, min(u)) AS cluster_id,
           CAST(v = least(v, min(u)) AS BOOLEAN) AS is_canonical
    FROM reach GROUP BY v
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters from the LSH candidate pairs: every doc in a
    candidate pair mapped to its component's minimum doc_id (the
    canonical survivor).  Iterative min-label propagation; converges
    in diameter rounds."""
    pairs = minhash_pairs(spark, sf_dir).select("doc_a", "doc_b")
    comp = connected_components(pairs, "doc_a", "doc_b")
    return comp.select(
        F.col("node").alias("doc_id"),
        "cluster_id",
        (F.col("node") == F.col("cluster_id")).alias("is_canonical"),
    )


@query(
    "dedup_apply",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      SELECT doc_a, doc_b FROM ({_MINHASH_PAIRS_SQL})
    ),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    reach(v, u) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.v, e.b FROM reach r JOIN edges e ON r.u = e.a
    ),
    drop_docs AS (
      SELECT v AS doc_id FROM reach GROUP BY v
      HAVING v <> least(v, min(u))
    )
    SELECT d.lang,
           count(*)                             AS n_docs,
           count(dd.doc_id)                     AS n_dropped,
           count(*) - count(dd.doc_id)          AS n_kept
    FROM documents d LEFT JOIN drop_docs dd ON d.doc_id = dd.doc_id
    GROUP BY d.lang
    """,
)
def dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline applied end-to-end: LSH candidates ->
    connected components -> drop every non-canonical cluster member ->
    per-language keep/drop accounting.  The drop set (non-canonical
    docs) is tiny relative to the corpus, so the final step is a
    broadcast anti-join shape -- the corpus scans once and never
    shuffles.  This is the operator a training-data pipeline actually
    runs; dedup_clusters/dedup_minhash_lsh expose its intermediate
    stages."""
    from ..io import read_table

    comp = dedup_clusters(spark, sf_dir)
    drop = comp.filter(~F.col("is_canonical")).select("doc_id")
    d = read_table(spark, sf_dir, "documents")
    flagged = d.join(
        F.broadcast(drop.withColumn("dropped", F.lit(1))), "doc_id", "left"
    )
    return flagged.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.count("dropped").alias("n_dropped"),
        (F.count("*") - F.count("dropped")).alias("n_kept"),
    )
