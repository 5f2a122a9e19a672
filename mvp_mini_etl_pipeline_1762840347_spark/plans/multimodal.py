"""Multimodal-column queries (north-star): binary payload plumbing
over the documents table (deterministic fake media -- see
operators/multimodal.py for why the codec step is stubbed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table
from ..operators.multimodal import (
    decode_media_headers,
    extract_features,
    fake_media_from_documents,
    frame_sample,
    real_media_from_documents,
    resize_media,
)
from .registry import query


# ---------------------------------------------------------------------------
# Binary column metadata aggregation (oracle-checked)
# ---------------------------------------------------------------------------
@query(
    "multimodal_meta",
    oracle="""
    SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
           ELSE 'video' END              AS kind,
           count(*)                       AS n_media,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           round(avg(n_chars % 100), 2)   AS avg_frames
    FROM documents GROUP BY 1
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata accounting over opaque binary media columns:
    byte volumes and frame counts per modality.  The binary payload
    stays opaque (never decoded) -- scans prune it unless projected."""
    media = fake_media_from_documents(read_table(spark, sf_dir, "documents"))
    return media.groupBy("kind").agg(
        F.count("*").alias("n_media"),
        F.sum(F.length("content")).alias("total_bytes"),
        F.round(F.avg("meta.n_frames"), 2).alias("avg_frames"),
    )


# ---------------------------------------------------------------------------
# Arrow-batched checksums -- the Python path, VALUE-checked
# ---------------------------------------------------------------------------
@query(
    "multimodal_checksums",
    oracle="""
    SELECT doc_id                          AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END           AS kind,
           octet_length(encode(text))      AS n_bytes,
           sha256(text)                    AS content_sha
    FROM documents
    """,
)
def multimodal_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte counts + sha256 content ids over binary media columns,
    computed entirely JVM-side (`F.sha2` / `F.length`): codegen'd,
    no Python in the plan.  The Arrow/mapInPandas plumbing is
    exercised (and value-checked) by multimodal_features instead,
    where no builtin exists for the feature step."""
    media = fake_media_from_documents(read_table(spark, sf_dir, "documents"))
    return media.select(
        "media_id",
        "kind",
        F.length("content").cast("long").alias("n_bytes"),
        F.lower(F.sha2("content", 256)).alias("content_sha"),
    )


# ---------------------------------------------------------------------------
# Video frame-sampling plan (oracle-checked fan-out)
# ---------------------------------------------------------------------------
@query(
    "multimodal_frames",
    oracle="""
    SELECT doc_id AS media_id,
           unnest(generate_series(0, greatest((n_chars % 100) - 1, 0), 10))
             AS frame_idx
    FROM documents
    WHERE doc_id % 3 = 2 AND n_chars % 100 > 0
    """,
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling fan-out for video media: one row per sampled
    frame index (every 10th), generated with sequence+explode -- a
    narrow map whose output size is frames/10, no shuffle.  The frame
    decode itself is the stubbed codec step."""
    media = fake_media_from_documents(read_table(spark, sf_dir, "documents"))
    return frame_sample(media, every_n=10)


# ---------------------------------------------------------------------------
# Arrow-batched feature extraction (rows-only: mapInPandas, not SQL)
# ---------------------------------------------------------------------------
@query(
    "multimodal_features",
    oracle="""
    SELECT doc_id                          AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END           AS kind,
           octet_length(encode(text))      AS n_bytes,
           sha256(text)                    AS content_sha,
           round((16.0 * (instr('0123456789abcdef',
                                substring(sha256(text), 1, 1)) - 1)
                  + (instr('0123456789abcdef',
                           substring(sha256(text), 2, 1)) - 1)) / 255.0,
                 4)                        AS f0
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction through the mapInPandas plumbing: sha256
    content ids + deterministic fake feature vectors.  Exercises the
    real Arrow batch path end-to-end; deterministic output regardless
    of partitioning.  The fake features are sha-derived, so the first
    component f0 (= sha byte0 / 255) is oracle-checkable: the SQL twin
    recomputes it from the hex digest, value-proving the Arrow path.
    (b/255 can only land on an exact 4-decimal boundary at b in
    {0,51,...,255} -- clean one-decimal values -- so float32 transport
    of the feature cannot flip the rounding.)"""
    media = fake_media_from_documents(read_table(spark, sf_dir, "documents"))
    feats = extract_features(media)
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        "content_sha",
        F.round(F.element_at("features", 1).cast("double"), 4).alias("f0"),
    )


# ---------------------------------------------------------------------------
# REAL container decode (BMP/WAV headers, stdlib struct) -- VALUE-checked
# ---------------------------------------------------------------------------
@query(
    "multimodal_decode",
    oracle="""
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END AS kind,
           CAST(CASE doc_id % 3
                WHEN 0 THEN 54 + ((3 * (8 + doc_id % 24) + 3) // 4) * 4
                            * (8 + doc_id % 16)
                WHEN 1 THEN 44 + 2 * (64 + n_chars % 128)
                ELSE octet_length(encode(text)) END AS BIGINT) AS n_bytes,
           CASE doc_id % 3 WHEN 0 THEN 'image/bmp' WHEN 1 THEN 'audio/wav'
                ELSE NULL END AS mime,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 8 + doc_id % 24 END
                AS INTEGER) AS width,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 8 + doc_id % 16 END
                AS INTEGER) AS height,
           CAST(CASE WHEN doc_id % 3 = 1 THEN 8000 + 1000 * (doc_id % 5) END
                AS INTEGER) AS sample_rate,
           CAST(CASE WHEN doc_id % 3 = 1 THEN 64 + n_chars % 128 END
                AS INTEGER) AS n_frames
    FROM documents
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media decode, end to end: image/audio payloads are genuine
    BMP / RIFF-WAVE files built with stdlib struct (real container
    bytes in the binary column), and the decode step sniffs magic
    bytes and struct.unpacks the actual headers -- no fake metadata
    anywhere in the path.  The oracle independently computes what the
    headers MUST contain from the deterministic generation parameters,
    so a parser that misreads any offset fails the value hash.  Video
    payloads are raw bytes (no stdlib container writer exists) and
    must decode to all-null fields -- the honest unknown-format
    branch.  Both steps run Arrow-batched in mapInPandas: per-row
    binary construction/parsing is exactly the work DataFrame builtins
    cannot express (SURVEY §2.10 multimodal plumbing, now with the
    codec stub replaced by a real header decoder for the formats
    stdlib can carry)."""
    media = real_media_from_documents(read_table(spark, sf_dir, "documents"))
    return decode_media_headers(media)


# ---------------------------------------------------------------------------
# REAL media transform (pixel/sample bytes, not just headers)
# ---------------------------------------------------------------------------
@query(
    "multimodal_resize",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                  ELSE 'video' END AS kind,
             (8 + doc_id % 24) // 2 AS ow,
             (8 + doc_id % 16) // 2 AS oh,
             (8000 + 1000 * (doc_id % 5)) // 2 AS osr,
             (64 + n_chars % 128 + 1) // 2 AS onf,
             octet_length(encode(text)) AS raw_len
      FROM documents
    )
    SELECT doc_id AS media_id, kind,
           CAST(CASE kind
                WHEN 'image' THEN 54 + ((3 * ow + 3) // 4) * 4 * oh
                WHEN 'audio' THEN 44 + 2 * onf
                ELSE raw_len END AS BIGINT) AS n_bytes_out,
           CASE kind WHEN 'image' THEN 'image/bmp'
                WHEN 'audio' THEN 'audio/wav' ELSE NULL END AS mime,
           CAST(CASE WHEN kind = 'image' THEN ow END AS INTEGER) AS width,
           CAST(CASE WHEN kind = 'image' THEN oh END AS INTEGER) AS height,
           CAST(CASE WHEN kind = 'audio' THEN osr END AS INTEGER)
               AS sample_rate,
           CAST(CASE WHEN kind = 'audio' THEN onf END AS INTEGER)
               AS n_frames
    FROM dims
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media transform over pixel/sample bytes: BMPs downscale
    2:1 by nearest neighbor (actual pixel re-layout, new row padding),
    WAVs decimate 2:1 (every other 16-bit sample, halved declared
    rate), unknown containers pass through.  The proof is a full
    ROUND TRIP: the transformed bytes are RE-PARSED by the header
    decoder and the oracle independently predicts what the new
    headers must say from the generation parameters -- a stride bug,
    off-by-one sample count, or unwritten header field fails the
    value hash.  Completes the decode / feature-extract / resize /
    frame-sample quartet with three genuinely real steps (video
    demux stays honestly stubbed).

    Scale: build -> resize -> re-parse are three chained mapInPandas
    stages, embarrassingly parallel, zero shuffles end to end; blob
    partition sizing stays byte-driven
    (spark.sql.files.maxPartitionBytes)."""
    media = real_media_from_documents(read_table(spark, sf_dir, "documents"))
    resized = resize_media(media)
    return decode_media_headers(resized).withColumnRenamed(
        "n_bytes", "n_bytes_out"
    )


# ---------------------------------------------------------------------------
# REAL pixel decode (PNG: zlib inflate + filter reconstruction)
# ---------------------------------------------------------------------------
@query(
    "multimodal_pixels",
    oracle="""
    WITH d AS (
      SELECT doc_id, 4 + doc_id % 13 AS w, 4 + doc_id % 7 AS h
      FROM documents
    ),
    px AS (
      SELECT doc_id, w, h, (7 * x.x + 13 * y.y + doc_id) % 256 AS v
      FROM d, unnest(range(d.w)) AS x(x), unnest(range(d.h)) AS y(y)
    )
    SELECT doc_id AS media_id,
           CAST(max(w) AS INTEGER) AS width,
           CAST(max(h) AS INTEGER) AS height,
           count(*) AS n_pixels,
           CAST(sum(v) AS BIGINT) AS pixel_sum,
           CAST(min(v) AS BIGINT) AS px_min,
           CAST(max(v) AS BIGINT) AS px_max
    FROM px GROUP BY doc_id
    """,
)
def multimodal_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel-level image decode -- the codec step itself, not
    just container headers: each document becomes a genuine 8-bit
    grayscale PNG (deflate-compressed scanlines, filter type cycling
    through all five per row), and the decode walks chunks, verifies
    CRCs, zlib-inflates, reconstructs every filter type, and
    aggregates the recovered pixels.  The oracle states the
    closed-form pixel statistics from the generator formula
    ((7x + 13y + doc_id) mod 256), so a wrong Paeth predictor, a
    mis-ordered scanline, or an off-by-one stride changes pixel_sum
    and fails the value hash.  This closes the ROADMAP 'pixel-level
    multimodal decode' gap with zero new dependencies; JPEG stays
    honestly stubbed in operators/multimodal.py::decode_image.

    Scale: build -> decode -> per-image aggregate all happen inside
    ONE Arrow-batched mapInPandas pass (pixels never leave the
    worker, only 7 small columns per image do); embarrassingly
    parallel, zero shuffles."""
    from collections.abc import Iterator

    import pandas as pd

    from ..operators.multimodal import build_png, decode_png

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                png = build_png(4 + i % 13, 4 + i % 7, i)
                w, h, px = decode_png(png)
                rows.append(
                    (i, w, h, len(px), sum(px), min(px), max(px))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "n_pixels",
                    "pixel_sum", "px_min", "px_max",
                ],
            )

    return (
        read_table(spark, sf_dir, "documents")
        .select("doc_id")
        .mapInPandas(
            op,
            schema=(
                "media_id long, width int, height int, n_pixels long, "
                "pixel_sum long, px_min long, px_max long"
            ),
        )
    )


# ---------------------------------------------------------------------------
# REAL audio feature extraction (PCM sample statistics)
# ---------------------------------------------------------------------------
@query(
    "multimodal_audio_features",
    oracle="""
    WITH a AS (
      -- mirror the engine's empty-payload fallback (build_wav uses
      -- b"\\x00" when the text encodes to zero bytes): NULL/'' text
      -- becomes the single zero byte, so L >= 1 always
      SELECT doc_id, 64 + n_chars % 128 AS nf,
             CASE WHEN octet_length(encode(coalesce(text, ''))) = 0
                  THEN '00'
                  ELSE lower(hex(encode(text))) END AS hx,
             greatest(octet_length(encode(coalesce(text, ''))), 1) AS L
      FROM documents WHERE doc_id % 3 = 1
    ),
    smp AS (
      SELECT doc_id, nf, t.i,
             ('0x' || substr(hx, 2 * ((2 * t.i) % L) + 1, 2))::BIGINT
             + 256 * ('0x' || substr(hx, 2 * ((2 * t.i + 1) % L) + 1, 2))::BIGINT
               AS u
      FROM a, unnest(range(a.nf)) AS t(i)
    ),
    sg AS (
      SELECT doc_id, nf, i,
             u - 65536 * (CASE WHEN u >= 32768 THEN 1 ELSE 0 END) AS s
      FROM smp
    ),
    zc AS (
      SELECT doc_id, nf, s,
             CASE WHEN lag(s < 0) OVER w IS NOT NULL
                   AND (s < 0) <> lag(s < 0) OVER w
                  THEN 1 ELSE 0 END AS z
      FROM sg WINDOW w AS (PARTITION BY doc_id ORDER BY i)
    )
    SELECT doc_id AS media_id,
           CAST(max(nf) AS BIGINT) AS n_samples,
           CAST(sum(s) AS BIGINT) AS sample_sum,
           CAST(sum(abs(s)) AS BIGINT) AS abs_sum,
           CAST(max(abs(s)) AS BIGINT) AS peak_abs,
           CAST(sum(z) AS BIGINT) AS zero_crossings
    FROM zc GROUP BY doc_id
    """,
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio feature extraction, value-checked at the SAMPLE
    level: the audio payloads are genuine RIFF/WAVE files whose PCM
    bytes cycle the document's UTF-8 text, the engine parses the real
    data chunk into signed 16-bit samples and reduces each clip to
    amplitude statistics (sum, total |amplitude|, peak, zero-crossing
    count), and the oracle re-derives every sample arithmetically
    from the generation parameters (byte j of the text, little-endian
    pairing, two's-complement sign) -- so a codec bug at ANY byte
    offset, an endianness slip, or a sign error changes some clip's
    statistics and fails the value hash.  Extends the decode /
    resize / pixel trio with feature extraction over real sample
    bytes (operators/multimodal.py::audio_sample_features); the
    reference has no media path at all (its only binary handling is
    JSON strings), so this whole family is the engine's own
    100-TB-pipeline surface."""
    from ..operators.multimodal import (
        audio_sample_features,
        real_media_from_documents,
    )

    media = real_media_from_documents(read_table(spark, sf_dir, "documents"))
    return audio_sample_features(media)
