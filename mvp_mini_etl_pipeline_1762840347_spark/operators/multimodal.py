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
    """Full PIXEL decode entry point.  PNG is REAL (stdlib zlib
    inflate + filter reconstruction -- decode_png below, value-checked
    by the multimodal_pixels oracle); BMP headers/pixels are real via
    parse_media_header / resize_bmp_half.  JPEG decompression and
    video demux still need codec libraries absent from this container
    and raise rather than fabricate."""
    if content is not None and content[:8] == b"\x89PNG\r\n\x1a\n":
        w, h, px = decode_png(content)
        return {"width": w, "height": h, "pixels": px}
    raise NotImplementedError(
        "JPEG/video decoding requires a codec library not present in this environment"
    )


# ---------------------------------------------------------------------------
# Real container formats, stdlib-only: BMP + WAV writers and the
# header parser.  The writers make the binary column carry genuine
# files; the parser is a real decoder (magic sniff + struct.unpack),
# not a fake -- a misread header fails the value-checked oracle.
# ---------------------------------------------------------------------------
def build_bmp(width: int, height: int, payload: bytes) -> bytes:
    """A real 24-bit uncompressed BMP: BITMAPFILEHEADER +
    BITMAPINFOHEADER + row-padded pixel data cycled from payload."""
    import struct

    stride = ((3 * width + 3) // 4) * 4
    img_size = stride * height
    src = payload or b"\x00"
    pixels = (src * (img_size // len(src) + 1))[:img_size]
    file_header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    return file_header + info_header + pixels


def build_wav(sample_rate: int, n_samples: int, payload: bytes) -> bytes:
    """A real RIFF/WAVE file: 16-bit mono PCM, sample bytes cycled
    from payload."""
    import struct

    data_size = 2 * n_samples
    src = payload or b"\x00"
    data = (src * (data_size // len(src) + 1))[:data_size]
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    header = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + data_size, b"WAVE")
    return header + fmt + struct.pack("<4sI", b"data", data_size) + data


def parse_media_header(content: bytes) -> dict:
    """REAL header decode via magic-byte sniff + struct.unpack:
    BMP -> mime/width/height, WAV -> mime/sample_rate/n_frames
    (sample count).  Unknown containers (e.g. the video payloads --
    real demuxing needs a codec library) return all-null fields
    rather than fabricated ones."""
    import struct

    out = {
        "mime": None,
        "width": None,
        "height": None,
        "sample_rate": None,
        "n_frames": None,
    }
    if content is None:
        return out
    if len(content) >= 54 and content[:2] == b"BM":
        width, height = struct.unpack_from("<ii", content, 18)
        out.update(mime="image/bmp", width=width, height=height)
    elif (
        len(content) >= 44
        and content[:4] == b"RIFF"
        and content[8:12] == b"WAVE"
    ):
        channels, sample_rate = struct.unpack_from("<HI", content, 22)
        bits = struct.unpack_from("<H", content, 34)[0]
        data_size = struct.unpack_from("<I", content, 40)[0]
        out.update(
            mime="audio/wav",
            sample_rate=sample_rate,
            n_frames=data_size // (channels * bits // 8),
        )
    return out


def real_media_from_documents(documents: DataFrame) -> DataFrame:
    """Media table whose image/audio payloads are GENUINE container
    files (BMP / WAV built with stdlib struct), sized by deterministic
    functions of doc_id / n_chars so an oracle can state the expected
    decoded header fields.  Video payloads stay raw text bytes --
    honest: no stdlib video container writer -- and must decode to
    nulls.  Generation runs Arrow-batched in mapInPandas (binary
    construction is per-row imperative work, the UDF slow path used
    exactly where builtins cannot express it)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, n_chars, text in zip(
                pdf["doc_id"], pdf["n_chars"], pdf["text"]
            ):
                payload = (text or "").encode("utf-8")
                mod = doc_id % 3
                if mod == 0:
                    kind = "image"
                    content = build_bmp(
                        8 + int(doc_id) % 24, 8 + int(doc_id) % 16, payload
                    )
                elif mod == 1:
                    kind = "audio"
                    content = build_wav(
                        8000 + 1000 * (int(doc_id) % 5),
                        64 + int(n_chars) % 128,
                        payload,
                    )
                else:
                    kind = "video"
                    content = payload
                rows.append((int(doc_id), kind, content))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "content"]
            )

    return documents.select("doc_id", "n_chars", "text").mapInPandas(
        op, schema="media_id long, kind string, content binary"
    )


def decode_media_headers(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL header decode over the binary column: one
    output row per media row with the parsed container fields."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_media_header(b) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "mime": [p["mime"] for p in parsed],
                    "width": [p["width"] for p in parsed],
                    "height": [p["height"] for p in parsed],
                    "sample_rate": [p["sample_rate"] for p in parsed],
                    "n_frames": [p["n_frames"] for p in parsed],
                }
            )

    return media.mapInPandas(
        op,
        schema=(
            "media_id long, kind string, n_bytes long, mime string, "
            "width int, height int, sample_rate int, n_frames int"
        ),
    )


def audio_sample_features(media: DataFrame) -> DataFrame:
    """REAL audio feature extraction from genuine PCM bytes: parse the
    RIFF data chunk, reinterpret it as little-endian signed 16-bit
    mono samples, and reduce to the classic clip descriptors (sample
    sum, total absolute amplitude, peak, zero-crossing count).  The
    parse is byte-level (struct offset 40 for the data size, samples
    from offset 44) so a header or endianness bug changes the values;
    the oracle reconstructs the same samples arithmetically from the
    generation parameters and must agree exactly.  Arrow-batched
    mapInPandas with a numpy inner loop -- per-byte decoding is the
    one place builtins cannot express the work; everything after the
    per-clip reduction is ordinary DataFrame algebra.

    Scale: embarrassingly parallel, zero shuffles; one output row per
    clip regardless of clip length, so downstream state is bounded by
    clip count, not sample count."""
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        for pdf in batches:
            rows = []
            for mid, kind, content in zip(
                pdf["media_id"], pdf["kind"], pdf["content"]
            ):
                if kind != "audio" or content is None:
                    continue
                b = bytes(content)
                data_size = struct.unpack_from("<I", b, 40)[0]
                s = np.frombuffer(
                    b[44:44 + data_size], dtype="<i2"
                ).astype(np.int64)
                neg = s < 0
                zc = int(np.count_nonzero(neg[1:] != neg[:-1]))
                rows.append(
                    (
                        int(mid),
                        int(s.size),
                        int(s.sum()),
                        int(np.abs(s).sum()),
                        int(np.abs(s).max()) if s.size else 0,
                        zc,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_samples", "sample_sum",
                    "abs_sum", "peak_abs", "zero_crossings",
                ],
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(
        op,
        schema=(
            "media_id long, n_samples long, sample_sum long, "
            "abs_sum long, peak_abs long, zero_crossings long"
        ),
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


# ---------------------------------------------------------------------------
# Real media TRANSFORMS, stdlib-only: BMP nearest-neighbor downscale
# and WAV 2:1 decimation.  These operate on actual pixel/sample bytes
# (not just headers), completing the decode / feature-extract /
# resize / frame-sample quartet with three real steps.
# ---------------------------------------------------------------------------
def _bmp_from_pixels(width: int, height: int, pixels: bytes) -> bytes:
    import struct

    file_header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 54
    )
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels),
        2835, 2835, 0, 0,
    )
    return file_header + info_header + pixels


def resize_bmp_half(content: bytes) -> bytes:
    """Real nearest-neighbor 2:1 downscale of a 24-bit BMP: output
    pixel (x, y) = input pixel (2x, 2y), row padding rebuilt for the
    new width.  Pure stdlib; a misplaced stride or offset produces a
    file whose re-parsed header fails the oracle."""
    import struct

    off = struct.unpack_from("<I", content, 10)[0]
    w, h = struct.unpack_from("<ii", content, 18)
    stride = ((3 * w + 3) // 4) * 4
    ow, oh = max(w // 2, 1), max(h // 2, 1)
    ostride = ((3 * ow + 3) // 4) * 4
    out = bytearray(ostride * oh)
    for y in range(oh):
        src = off + (2 * y) * stride
        dst = y * ostride
        for x in range(ow):
            s = src + 6 * x
            out[dst + 3 * x : dst + 3 * x + 3] = content[s : s + 3]
    return _bmp_from_pixels(ow, oh, bytes(out))


def downsample_wav_half(content: bytes) -> bytes:
    """Real 2:1 decimation of 16-bit mono PCM: keep every other
    sample, halve the declared sample rate (naive resample -- no
    anti-alias filter, documented as such)."""
    import struct

    sample_rate = struct.unpack_from("<I", content, 24)[0]
    data_size = struct.unpack_from("<I", content, 40)[0]
    n = data_size // 2
    out_n = (n + 1) // 2
    data = b"".join(
        content[44 + 4 * i : 44 + 4 * i + 2] for i in range(out_n)
    )
    sr_out = sample_rate // 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, 1, sr_out, sr_out * 2, 2, 16
    )
    header = struct.pack(
        "<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data), b"WAVE"
    )
    return header + fmt + struct.pack("<4sI", b"data", len(data)) + data


def resize_media(media: DataFrame) -> DataFrame:
    """Arrow-batched real media transform over the binary column:
    BMPs downscale 2:1 (nearest neighbor), WAVs decimate 2:1, unknown
    containers pass through untouched.  One output row per media row;
    embarrassingly parallel, no shuffle."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for b in pdf["content"]:
                if b is not None and len(b) >= 54 and b[:2] == b"BM":
                    outs.append(resize_bmp_half(b))
                elif (
                    b is not None
                    and len(b) >= 44
                    and b[:4] == b"RIFF"
                    and b[8:12] == b"WAVE"
                ):
                    outs.append(downsample_wav_half(b))
                else:
                    outs.append(b)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "content": outs,
                }
            )

    return media.mapInPandas(
        op, schema="media_id long, kind string, content binary"
    )


# ---------------------------------------------------------------------------
# REAL pixel-level codec, stdlib-only: PNG (zlib + struct).  Unlike the
# BMP/WAV paths (headers + raw bytes), PNG requires genuine
# decompression and per-scanline filter reconstruction -- the "needs a
# codec library" step, implemented here from the public spec for the
# subset stdlib can carry (8-bit grayscale, all five filter types).
# JPEG/video stay honestly stubbed in decode_image.
# ---------------------------------------------------------------------------
def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _png_filter_line(f: int, line: bytes, prev: bytes) -> bytes:
    """Apply PNG filter f to a raw scanline (encode direction),
    grayscale so bpp == 1."""
    out = bytearray(len(line))
    for i, v in enumerate(line):
        a = line[i - 1] if i else 0
        b = prev[i]
        c = prev[i - 1] if i else 0
        if f == 0:
            pred = 0
        elif f == 1:
            pred = a
        elif f == 2:
            pred = b
        elif f == 3:
            pred = (a + b) // 2
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out[i] = (v - pred) & 255
    return bytes(out)


def build_png(width: int, height: int, seed: int) -> bytes:
    """A real 8-bit grayscale PNG: pixel(x, y) = (7x + 13y + seed)
    mod 256, scanline y filtered with type y mod 5 -- every decoder
    filter path is exercised and value-checked, since the oracle
    states the closed-form pixel sums the decode must recover."""
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = bytearray()
    prev = bytes(width)
    for y in range(height):
        line = bytes((7 * x + 13 * y + seed) % 256 for x in range(width))
        f = y % 5
        raw.append(f)
        raw += _png_filter_line(f, line, prev)
        prev = line
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(content: bytes) -> tuple[int, int, bytes]:
    """REAL PNG decode: chunk walk with CRC verification, zlib
    inflate, and per-scanline filter reconstruction (types 0-4).
    Returns (width, height, row-major pixel bytes).  Supports the
    8-bit grayscale non-interlaced subset; anything else raises
    rather than fabricating pixels."""
    import struct
    import zlib

    if content[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat, w, h = 8, b"", None, None
    while pos + 12 <= len(content):
        (length,) = struct.unpack_from(">I", content, pos)
        tag = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", content, pos + 8 + length)
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if (depth, color, comp, filt, interlace) != (8, 0, 0, 0, 0):
                raise NotImplementedError(
                    "only 8-bit grayscale non-interlaced PNG supported"
                )
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = zlib.decompress(idat)
    if len(raw) != h * (w + 1):
        raise ValueError("decompressed size mismatch")
    out = bytearray()
    prev = bytearray(w)
    p = 0
    for _y in range(h):
        f = raw[p]
        p += 1
        line = bytearray(raw[p : p + w])
        p += w
        if f == 1:
            for i in range(1, w):
                line[i] = (line[i] + line[i - 1]) & 255
        elif f == 2:
            for i in range(w):
                line[i] = (line[i] + prev[i]) & 255
        elif f == 3:
            for i in range(w):
                a = line[i - 1] if i else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 255
        elif f == 4:
            for i in range(w):
                a = line[i - 1] if i else 0
                b = prev[i]
                c = prev[i - 1] if i else 0
                pr = a + b - c
                pa, pb, pc = abs(pr - a), abs(pr - b), abs(pr - c)
                pred = (
                    a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                )
                line[i] = (line[i] + pred) & 255
        elif f != 0:
            raise ValueError(f"unknown filter {f}")
        out += line
        prev = line
    return w, h, bytes(out)
