"""Multimodal column plumbing (north-star, SURVEY §2.10).

Images / audio / video are opaque `binary` columns with typed
metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched Pandas functions over `mapInPandas`.  The actual codec
step is STUBBED (no image/audio libraries in this container) behind
`NotImplementedError` or a clearly-marked deterministic fake -- but
the Spark-side plumbing (schemas, UDF signatures, batch iteration,
partitioning) is real and tested.

Scale notes: media blobs ride in parquet binary columns; partition
sizing is byte-driven (`spark.sql.files.maxPartitionBytes`), and the
pandas batches stream through Arrow without materializing a partition
at once (`maxRecordsPerBatch`).  Feature extraction is embarrassingly
parallel -- no shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes long, content_sha string, "
    "features array<float>"
)


def fake_media_from_documents(documents: DataFrame) -> DataFrame:
    """Deterministic fake media table: each document's text bytes act
    as the opaque blob (stands in for real image/audio payloads so the
    binary-column plumbing is exercised end-to-end)."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.col("n_chars") % 100).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_image(content: bytes) -> "object":
    """Real codec entry point -- NOT IMPLEMENTED in this container
    (no PIL/opencv).  The mapInPandas pipeline calls
    `_fake_feature_vector` instead; swap this in when codecs exist."""
    raise NotImplementedError(
        "image decoding requires an image library not present in this environment"
    )


def _fake_feature_vector(content: bytes) -> list[float]:
    """Deterministic stand-in for a real encoder: FEATURE_DIM floats
    derived from the sha256 of the payload.  Stable across runs and
    partitionings."""
    h = hashlib.sha256(content or b"").digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


def extract_features(media: DataFrame) -> DataFrame:
    """Feature extraction over binary columns via mapInPandas: Arrow
    batches in, Arrow batches out; one output row per media row."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else 0),
                    "content_sha": content.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "features": content.map(_fake_feature_vector),
                }
            )

    return media.mapInPandas(op, schema=FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling *plan*: one output row per sampled frame
    index (the decode of the actual frame bytes is the stubbed codec
    step).  Demonstrates the fan-out shape: explode over a generated
    index array, no shuffle."""
    n = F.coalesce(F.col("meta.n_frames"), F.lit(0))
    idxs = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n))
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(F.when(n > 0, idxs).otherwise(F.array())).alias("frame_idx"),
    )
