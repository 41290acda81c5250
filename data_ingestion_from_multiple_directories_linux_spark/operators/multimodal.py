"""Multimodal (image/audio/video) column plumbing.

Media assets ride through the engine as opaque ``binary`` payload columns
with a typed metadata struct (SURVEY-extension; BASELINE.json north
star). The Spark-side contract is real and tested — schema, partitioning,
Arrow batch shape, UDF signatures — and the decode step is pluggable via
``decode_fn``: :func:`real_decode` parses PNG IHDR / JPEG SOF container
headers in pure Python and goes all the way to PIXELS for both formats
(stdlib zlib inflate + scanline unfilter in ``functions.png_codec``;
pure-Python baseline entropy decode in ``functions.jpeg_codec``) —
per-channel means as ``feature`` and real nearest-neighbor
:func:`real_resize`. :func:`fake_decode` (deterministic, byte-derived)
remains the no-codec stand-in for plumbing tests and for formats the
codecs don't cover (progressive/color JPEG, video).

Design for 100 TB of media:
* payloads stay in ``binary`` columns — no base64 inflation, Arrow moves
  them zero-copy into the Python workers;
* decode/feature-extract is ``mapInPandas`` (Arrow-batched, one Python
  process per core, streaming batches — never a row-at-a-time UDF);
* ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds worker memory:
  batch_rows × payload_size is the working set;
* partition by a content-derived bucket (e.g. crc32(sha) % N) before
  decode so stragglers (giant videos) spread evenly.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from .registry import query

#: media-table schema: opaque payload + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

#: decode output: per-asset feature row
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)

DecodeFn = Callable[[bytes, str], dict]

#: JPEG SOF markers that carry frame dimensions (C0-C3, C5-C7, C9-CB,
#: CD-CF — i.e. every SOFn; C4/C8/CC are DHT/JPG/DAC, not frames)
_JPEG_SOF = frozenset(
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
)


def parse_image_header(payload: bytes) -> dict | None:
    """Pure-Python container-header parse: PNG IHDR / JPEG SOF.

    Needs no codec library — dimensions live in the container header:
    PNG stores width/height as the first 8 bytes of the IHDR chunk
    (always the first chunk, at offset 16); JPEG stores them in the
    SOFn frame segment (height then width, big-endian, at segment
    offset +5/+7). Returns {format, width, height} or None if the
    payload is neither.
    """
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
        return {
            "format": "png",
            "width": int.from_bytes(payload[16:20], "big"),
            "height": int.from_bytes(payload[20:24], "big"),
        }
    if payload[:2] == b"\xff\xd8":
        i = 2
        n = len(payload)
        # <=: the SOF dims may END at the payload's last byte (i+9 == n)
        while i + 9 <= n:
            if payload[i] != 0xFF:
                i += 1
                continue
            marker = payload[i + 1]
            if marker in _JPEG_SOF:
                return {
                    "format": "jpeg",
                    "width": int.from_bytes(payload[i + 7 : i + 9], "big"),
                    "height": int.from_bytes(payload[i + 5 : i + 7], "big"),
                }
            if marker == 0xD9:  # EOI
                break
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            i += 2 + int.from_bytes(payload[i + 2 : i + 4], "big")
        return None
    return None


def parse_wav_header(payload: bytes) -> dict | None:
    """Pure-Python WAV (RIFF) header parse: walk chunks, read ``fmt ``
    for channels/sample-rate/bit-depth and ``data`` for the payload
    size; n_samples = data_bytes / (channels * bits/8). Returns
    {format, channels, sample_rate, bits, n_samples} or None."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i, n = 12, len(payload)
    fmt = None
    data_size = None
    while i + 8 <= n:
        tag = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        body = payload[i + 8 : i + 8 + size]
        if tag == b"fmt " and size >= 16:
            fmt = {
                "channels": int.from_bytes(body[2:4], "little"),
                "sample_rate": int.from_bytes(body[4:8], "little"),
                "bits": int.from_bytes(body[14:16], "little"),
            }
        elif tag == b"data":
            data_size = size
        i += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data_size is None:
        return None
    frame = fmt["channels"] * max(fmt["bits"] // 8, 1)
    return {
        "format": "wav",
        "channels": fmt["channels"],
        "sample_rate": fmt["sample_rate"],
        "bits": fmt["bits"],
        "n_samples": data_size // frame if frame else 0,
    }


def make_wav(sample_rate: int, channels: int, n_samples: int, bits: int = 16) -> bytes:
    """Minimal well-formed PCM WAV: RIFF/WAVE + fmt + silent data."""
    import struct

    frame = channels * bits // 8
    data = b"\x00" * (n_samples * frame)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * frame, frame, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_mp4_header(payload: bytes) -> dict | None:
    """Pure-Python MP4/ISO-BMFF box walk: top-level boxes until ``moov``,
    then ``mvhd`` (version-0: timescale/duration at payload offsets
    12/16, big-endian) and one count per ``trak`` child. Returns
    {format, timescale, duration_units, n_tracks} or None."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        return None

    def walk(buf: bytes, start: int, end: int):
        i = start
        while i + 8 <= end:
            size = int.from_bytes(buf[i : i + 4], "big")
            tag = buf[i + 4 : i + 8]
            if size < 8 or i + size > end:
                return
            yield tag, i + 8, i + size
            i += size

    for tag, b0, b1 in walk(payload, 0, len(payload)):
        if tag != b"moov":
            continue
        timescale = duration = None
        n_tracks = 0
        for ctag, c0, c1 in walk(payload, b0, b1):
            if ctag == b"mvhd" and c1 - c0 >= 20 and payload[c0] == 0:
                timescale = int.from_bytes(payload[c0 + 12 : c0 + 16], "big")
                duration = int.from_bytes(payload[c0 + 16 : c0 + 20], "big")
            elif ctag == b"trak":
                n_tracks += 1
        if timescale is None:
            return None
        return {
            "format": "mp4",
            "timescale": timescale,
            "duration_units": duration,
            "n_tracks": n_tracks,
        }
    return None


def make_mp4(timescale: int, duration: int, n_tracks: int) -> bytes:
    """Minimal ISO-BMFF: ftyp + moov(mvhd + n empty trak boxes)."""
    import struct

    def box(tag: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + tag + body

    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00"  # version 0 + flags
        + struct.pack(">II", 0, 0)  # ctime, mtime
        + struct.pack(">II", timescale, duration)
        + b"\x00" * 80,  # rate/volume/matrix/next_track_id padding
    )
    traks = b"".join(box(b"trak", b"") for _ in range(n_tracks))
    return ftyp + box(b"moov", mvhd + traks)


def real_decode(payload: bytes, media_type: str) -> dict:
    """Real decode, no codec library: PNG/JPEG dimensions via
    :func:`parse_image_header`, then a FULL pixel decode where the
    pure-Python codecs reach — PNG (stdlib zlib inflate + scanline
    unfilter, ``functions.png_codec.decode_png``) with ``feature`` =
    per-channel pixel means, and baseline grayscale JPEG
    (``functions.jpeg_codec.decode_jpeg_gray``) with ``feature`` =
    [gray mean]. Rows the codecs don't cover (progressive/color JPEG,
    header-only fixtures) keep header dimensions with ``feature``
    None; unparseable payloads yield all-None (quarantine upstream)."""
    hdr = parse_image_header(payload) if payload else None
    if hdr is None:
        return {"width": None, "height": None, "n_frames": None, "feature": None}
    feature = None
    if hdr["format"] == "png":
        from ..functions.png_codec import decode_png

        px = decode_png(payload)
        if px is not None:
            n = px.shape[0] * px.shape[1]
            # exact integer sums → float division: bit-identical to any
            # engine computing avg over the same integers
            feature = [
                float(int(px[:, :, c].sum(dtype="int64"))) / n
                for c in range(px.shape[2])
            ]
    elif hdr["format"] == "jpeg":
        from ..functions.jpeg_codec import decode_jpeg_gray

        px = decode_jpeg_gray(payload)
        if px is not None and px.size:
            feature = [
                float(int(px.sum(dtype="int64"))) / px.size
            ]
    return {
        "width": hdr["width"],
        "height": hdr["height"],
        "n_frames": 1,
        "feature": feature,
    }


#: fake_decode's video frame-count rule — ONE definition shared by the
#: Python decode stub and frame_sample's plan-side Column twin, so the
#: sampling plan can never silently desynchronize from the stub
FAKE_FRAME_MOD = 300


def _fake_frames(n_bytes: int) -> int:
    return (n_bytes % FAKE_FRAME_MOD) + 1


def fake_decode(payload: bytes, media_type: str) -> dict:
    """Deterministic byte-derived stand-in for a codec: 'dimensions' from
    the payload length, a 4-dim 'feature' from byte prefix sums. Lets
    every piece of Spark plumbing (schema, batching, partitioning) be
    tested end-to-end without codecs."""
    n = len(payload)
    head = payload[:64]
    feature = [
        float(sum(head[0::4])),
        float(sum(head[1::4])),
        float(sum(head[2::4])),
        float(sum(head[3::4])),
    ]
    return {
        "width": (n % 640) + 1,
        "height": (n % 480) + 1,
        "n_frames": 1 if media_type.startswith("image") else _fake_frames(n),
        "feature": feature,
    }


def extract_features(
    media: DataFrame, decode_fn: DecodeFn = real_decode
) -> DataFrame:
    """Decode + feature-extract every asset via Arrow-batched mapInPandas.

    One Python worker per core pulls Arrow batches of (media_id, type,
    payload), runs ``decode_fn`` per asset, and emits FEATURE_SCHEMA
    rows. Narrow (no shuffle); batch size bounds memory.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_fn(bytes(p) if p is not None else b"", mt or "")
                for p, mt in zip(pdf["payload"], pdf["media_type"])
            ]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "media_type": pdf["media_type"].values,
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "n_frames": [f["n_frames"] for f in feats],
                    "feature": [f["feature"] for f in feats],
                }
            )
            yield out

    return media.select("media_id", "media_type", "payload").mapInPandas(
        run, FEATURE_SCHEMA
    )


def frame_sample(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plan for video payloads: one output row per sampled
    frame index. The frame *count* comes from metadata (cheap probe or
    ingest-time info) so the plan is a pure JVM-side explode — the decode
    of sampled frames then runs through :func:`extract_features` on the
    exploded rows only. No codec needed to build the sampling plan.
    Image rows sample exactly frame 0 (n_frames 1, matching every
    decode_fn); video rows use the FAKE_FRAME_MOD rule shared with
    :func:`fake_decode` (review finding: the formula used to be a
    second inline copy, applied to images too)."""
    n_frames = F.when(
        F.col("media_type").startswith("image"), F.lit(1)
    ).otherwise(
        F.coalesce(F.col("meta.n_bytes") % FAKE_FRAME_MOD + 1, F.lit(1))
    )
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return media.select(
        "media_id",
        "media_type",
        "payload",
        F.explode(idx).alias("frame_index"),
    )


def make_png(width: int, height: int) -> bytes:
    """Minimal but well-formed PNG: signature + IHDR (correct CRC) +
    one-pixel IDAT + IEND. Pure stdlib (zlib for CRC/deflate)."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    idat = zlib.compress(b"\x00\x00")
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def make_jpeg(width: int, height: int) -> bytes:
    """Minimal JPEG: SOI + JFIF APP0 + SOF0 carrying the dimensions +
    EOI. Enough structure that a marker-walking parser must skip APP0
    correctly before finding SOF0."""
    import struct

    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof0 = struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00"
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
        + b"\xff\xc0" + struct.pack(">H", len(sof0) + 2) + sof0
        + b"\xff\xd9"
    )


def synth_media_from_documents(docs: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA frame of REAL image payloads synthesized per doc_id:
    even ids → PNG, odd ids → JPEG, dimensions derived arithmetically
    (width = 16 + id % 320, height = 16 + id % 200) so an oracle can
    predict them without parsing. Synthesis runs in Arrow-batched
    mapInPandas — the same path real binary columns ride."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            payloads, types = [], []
            for i in ids:
                w, h = 16 + i % 320, 16 + i % 200
                if i % 2 == 0:
                    payloads.append(make_png(w, h))
                    types.append("image/png")
                else:
                    payloads.append(make_jpeg(w, h))
                    types.append("image/jpeg")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": types,
                    "payload": payloads,
                    "meta": [
                        {"source": "synth", "n_bytes": len(p)} for p in payloads
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(run, MEDIA_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a MEDIA_SCHEMA frame from the documents test table (payload =
    utf-8 bytes) — the fixture generator for plumbing tests."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image/fake").alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.col("source").alias("source"),
            F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


@query(
    "media_dimensions",
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image/png'
                ELSE 'image/jpeg' END AS media_type,
           CAST(16 + doc_id % 320 AS BIGINT) AS width,
           CAST(16 + doc_id % 200 AS BIGINT) AS height
    FROM documents
    """,
)
def media_dimensions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image dimensions from real container headers, end to end: per
    doc_id a REAL PNG/JPEG payload is synthesized (mapInPandas), then
    :func:`real_decode` parses the PNG IHDR / JPEG SOF headers back out
    of the bytes — both hops Arrow-batched, payloads in binary columns.
    The oracle predicts the dimensions arithmetically from the synthesis
    rule, so a parser bug (offset, endianness, marker walk) fails the
    hash. Narrow plan: scan → mapInPandas → mapInPandas, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    media = synth_media_from_documents(docs)
    feats = extract_features(media, real_decode)
    return feats.select(
        "media_id",
        "media_type",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
    )


@query(
    "media_audio_stats",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(1 + doc_id % 2 AS BIGINT) AS channels,
           CAST(8000 * (1 + doc_id % 3) AS BIGINT) AS sample_rate,
           CAST(100 + doc_id % 50 AS BIGINT) AS n_samples,
           CAST(100 + doc_id % 50 AS DOUBLE)
               / (8000 * (1 + doc_id % 3)) AS duration_secs
    FROM documents
    """,
)
def media_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio metadata from real WAV containers, end to end: per doc_id a
    REAL PCM WAV payload is synthesized (channels/rate/length derived
    arithmetically from the id), then :func:`parse_wav_header` walks the
    RIFF chunks back out of the bytes — both hops Arrow-batched
    mapInPandas over binary columns, no audio library involved. The
    oracle predicts every field from the synthesis rule, so chunk-walk
    or endianness bugs fail the value hash. Narrow plan, no shuffle."""

    audio_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("channels", T.LongType(), True),
            T.StructField("sample_rate", T.LongType(), True),
            T.StructField("n_samples", T.LongType(), True),
            T.StructField("duration_secs", T.DoubleType(), True),
        ]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [
                        make_wav(
                            8000 * (1 + i % 3), 1 + i % 2, 100 + i % 50
                        )
                        for i in ids
                    ],
                }
            )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hdrs = [
                parse_wav_header(bytes(p) if p is not None else b"") or {}
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "channels": [h.get("channels") for h in hdrs],
                    "sample_rate": [h.get("sample_rate") for h in hdrs],
                    "n_samples": [h.get("n_samples") for h in hdrs],
                    "duration_secs": [
                        (h["n_samples"] / h["sample_rate"])
                        if h.get("sample_rate")
                        else None
                        for h in hdrs
                    ],
                }
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(synth, audio_schema).mapInPandas(parse, out_schema)


@query(
    "media_video_stats",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(1000 * (1 + doc_id % 4) AS BIGINT) AS timescale,
           CAST(30000 + doc_id % 1000 AS BIGINT) AS duration_units,
           CAST(30000 + doc_id % 1000 AS DOUBLE)
               / (1000 * (1 + doc_id % 4)) AS duration_secs,
           CAST(1 + doc_id % 3 AS BIGINT) AS n_tracks
    FROM documents
    """,
)
def media_video_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video metadata from real MP4 containers: per doc_id a minimal
    ISO-BMFF payload (ftyp + moov/mvhd + trak boxes) is synthesized and
    the box walk parses timescale/duration/track-count back out —
    completing the image/audio/video triple on the same Arrow-batched
    binary-column path. Oracle predicts every field from the synthesis
    rule; box-size arithmetic or offset bugs fail the hash."""

    video_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("timescale", T.LongType(), True),
            T.StructField("duration_units", T.LongType(), True),
            T.StructField("duration_secs", T.DoubleType(), True),
            T.StructField("n_tracks", T.LongType(), True),
        ]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [
                        make_mp4(
                            1000 * (1 + i % 4), 30000 + i % 1000, 1 + i % 3
                        )
                        for i in ids
                    ],
                }
            )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hdrs = [
                parse_mp4_header(bytes(p) if p is not None else b"") or {}
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "timescale": [h.get("timescale") for h in hdrs],
                    "duration_units": [h.get("duration_units") for h in hdrs],
                    "duration_secs": [
                        (h["duration_units"] / h["timescale"])
                        if h.get("timescale")
                        else None
                        for h in hdrs
                    ],
                    "n_tracks": [h.get("n_tracks") for h in hdrs],
                }
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(synth, video_schema).mapInPandas(parse, out_schema)


def make_png_gradient(doc_id: int) -> bytes:
    """A REAL pixel PNG per doc_id: grayscale, width = 4 + id % 60,
    height = 4 + id % 40, row y holding the constant value
    ``id % 200 + y`` (never wraps: 199 + 39 < 256). Encoded with filter
    type 2 (Up) on every row after the first, so decoding requires a
    genuine unfilter pass — a decoder bug shifts every value and fails
    the oracle hash."""
    import numpy as np

    from ..functions.png_codec import encode_png

    w, h = 4 + doc_id % 60, 4 + doc_id % 40
    base = doc_id % 200
    rows = (base + np.arange(h, dtype=np.uint8))[:, None]
    return encode_png(np.broadcast_to(rows, (h, w)).copy())


def make_jpeg_gradient(doc_id: int) -> bytes:
    """A REAL entropy-coded baseline JPEG per doc_id: same dimensions
    as :func:`make_png_gradient`, but a BLOCK-ROW gradient — row y
    holds the constant value ``id % 200 + y // 8`` (max 199 + 5 < 256).
    Tile-constant by construction, so the all-ones-quant codec
    round-trips it bit-exactly (``jpeg_codec`` module docstring) and
    the pixel stats stay closed-form. Decoding requires the full
    baseline path: marker walk, Huffman DC differentials across blocks,
    EOB runs, byte unstuffing, IDCT."""
    import numpy as np

    from ..functions.jpeg_codec import encode_jpeg_gray

    w, h = 4 + doc_id % 60, 4 + doc_id % 40
    base = doc_id % 200
    rows = (base + np.arange(h) // 8).astype(np.uint8)[:, None]
    return encode_jpeg_gray(np.broadcast_to(rows, (h, w)).copy())


@query(
    "media_pixel_stats",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(4 + doc_id % 60 AS BIGINT) AS width,
           CAST(4 + doc_id % 40 AS BIGINT) AS height,
           CASE WHEN doc_id % 2 = 0
                THEN CAST(doc_id % 200 + (3 + doc_id % 40) / 2.0 AS DOUBLE)
                ELSE CAST((4 + doc_id % 40) * (doc_id % 200)
                          + 4 * ((4 + doc_id % 40) // 8)
                              * ((4 + doc_id % 40) // 8 - 1)
                          + ((4 + doc_id % 40) % 8)
                              * ((4 + doc_id % 40) // 8)
                      AS DOUBLE) / (4 + doc_id % 40)
           END AS mean_px,
           CAST(doc_id % 200 AS BIGINT) AS min_px,
           CAST(doc_id % 200
                + CASE WHEN doc_id % 2 = 0 THEN 3 + doc_id % 40
                       ELSE (3 + doc_id % 40) // 8 END
               AS BIGINT) AS max_px
    FROM documents
    """,
)
def media_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIXEL-level image statistics, fully real end to end, over BOTH
    shipped codecs: even doc_ids synthesize a grayscale PNG with a
    per-row gradient (:func:`make_png_gradient`, Up-filtered scanlines
    → zlib inflate + unfilter on decode), odd doc_ids a baseline
    entropy-coded JPEG with a block-row gradient
    (:func:`make_jpeg_gradient` → Huffman decode + dequantize + IDCT).
    Stats come from the decoded pixel arrays; the oracle predicts them
    in closed form from the synthesis rules (PNG: mean = base +
    (h-1)/2, exact dyadic; JPEG: mean = (h·base + Σ y//8)/h with
    Σ y//8 = 4q(q-1) + rq for h = 8q+r — one exact-integer division on
    both engines, so the doubles agree bit-for-bit). Any codec bug —
    zlib framing, filter reconstruction, Huffman table assignment, DC
    differentials, IDCT scaling — fails the value hash. Narrow plan:
    scan → mapInPandas → mapInPandas, no shuffle."""
    import numpy as np

    from ..functions.jpeg_codec import decode_jpeg_gray
    from ..functions.png_codec import decode_png

    img_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("width", T.LongType(), True),
            T.StructField("height", T.LongType(), True),
            T.StructField("mean_px", T.DoubleType(), True),
            T.StructField("min_px", T.LongType(), True),
            T.StructField("max_px", T.LongType(), True),
        ]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [
                        make_png_gradient(i) if i % 2 == 0
                        else make_jpeg_gradient(i)
                        for i in ids
                    ],
                }
            )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("width", "height", "mean_px", "min_px", "max_px")}
            for p in pdf["payload"]:
                raw = bytes(p) if p is not None else b""
                px = decode_png(raw)
                if px is None:
                    jp = decode_jpeg_gray(raw)
                    px = jp[:, :, None] if jp is not None else None
                if px is None:
                    for k in out:
                        out[k].append(None)
                    continue
                h, w, _ = px.shape
                total = int(px.sum(dtype=np.int64))
                out["width"].append(w)
                out["height"].append(h)
                out["mean_px"].append(float(total) / (h * w))
                out["min_px"].append(int(px.min()))
                out["max_px"].append(int(px.max()))
            yield pd.DataFrame({"media_id": pdf["media_id"].values, **out})

    # single-parquet-file tables scan as ONE partition; spread the
    # per-row codec work (Huffman encode/decode is the expensive part)
    # across the executors before entering the Python stages — the
    # shuffle carries only doc_id
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    return docs.mapInPandas(synth, img_schema).mapInPandas(stats, out_schema)


ResizeFn = Callable[[bytes, str, int, int], bytes]


def real_resize(payload: bytes, media_type: str, width: int, height: int) -> bytes:
    """Real pixel resize, format-preserving: decode (PNG: stdlib zlib +
    unfilter; baseline grayscale JPEG: pure-Python Huffman + IDCT,
    ``functions.jpeg_codec``) → nearest-neighbor resample (numpy index
    arithmetic) → re-encode in the source format. The output
    round-trips through :func:`parse_image_header` and the matching
    decoder (asserted e2e in tests). Payloads neither codec can decode
    (progressive/color JPEG, truncated scans) raise here — the
    distributed path (:func:`resize_media`) catches and quarantines."""
    from ..functions.jpeg_codec import decode_jpeg_gray, encode_jpeg_gray
    from ..functions.png_codec import decode_png, encode_png, resize_nearest

    px = decode_png(payload) if payload else None
    if px is not None:
        return encode_png(resize_nearest(px, width, height))
    jpx = decode_jpeg_gray(payload) if payload else None
    if jpx is not None:
        return encode_jpeg_gray(resize_nearest(jpx, width, height))
    raise NotImplementedError(
        "payload is not decodable by the shipped codecs (PNG, baseline "
        "grayscale JPEG); other formats require an image codec not in "
        "this container"
    )


def fake_resize(payload: bytes, media_type: str, width: int, height: int) -> bytes:
    """Deterministic stand-in: re-synthesize a container of the target
    dimensions (PNG in → PNG out), preserving the real byte-level shape
    a resize produces."""
    return make_png(width, height)


#: resize output: MEDIA_SCHEMA plus a quarantine marker — NULL on
#: success, the failure reason on rows whose payload could not be
#: decoded (unsupported codec, malformed container)
RESIZED_SCHEMA = T.StructType(
    list(MEDIA_SCHEMA.fields)
    + [T.StructField("resize_error", T.StringType(), True)]
)


def resize_media(
    media: DataFrame,
    width: int,
    height: int,
    resize_fn: ResizeFn = real_resize,
) -> DataFrame:
    """Resize every image payload to (width, height) via Arrow-batched
    mapInPandas — same narrow, binary-column path as decode. Output is
    MEDIA_SCHEMA plus ``resize_error``: resized rows carry the new
    payload, refreshed meta.n_bytes and a NULL error; rows whose
    payload the codec cannot handle (JPEG in this container, malformed
    bytes) become QUARANTINE rows — NULL payload, original source kept,
    the exception text in ``resize_error`` — instead of raising. One
    bad asset in a mixed-format 100 TB corpus must quarantine its row,
    not kill the job; the exception surface stays on the direct
    :func:`real_resize` call. Giant-asset stragglers are spread by
    repartitioning on a content hash upstream (module docstring)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas, errs = [], [], []
            for p, mt, m in zip(pdf["payload"], pdf["media_type"], pdf["meta"]):
                src = m.get("source") if m else None
                try:
                    out = resize_fn(
                        bytes(p) if p is not None else b"", mt or "", width, height
                    )
                except Exception as exc:  # quarantine, never crash the job
                    payloads.append(None)
                    metas.append({"source": src, "n_bytes": None})
                    errs.append(f"{type(exc).__name__}: {exc}"[:256])
                else:
                    payloads.append(out)
                    metas.append({"source": src, "n_bytes": len(out)})
                    errs.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "media_type": pdf["media_type"].values,
                    "payload": payloads,
                    "meta": metas,
                    "resize_error": errs,
                }
            )

    return media.select("media_id", "media_type", "payload", "meta").mapInPandas(
        run, RESIZED_SCHEMA
    )


# ---------------------------------------------------------------------------
# Image near-duplicate detection: average-hash over the real pixel path
# ---------------------------------------------------------------------------

#: aHash pattern geometry: 8×8 grayscale, one hash bit per row
AHASH_CLASSES = 12
AHASH_BRIGHT, AHASH_DARK = 200, 10


def _ahash_key(doc_id: int) -> int:
    """The 8-bit pattern key image ``doc_id`` is synthesized FROM (and
    that a correct decode+hash must recover): one of {AHASH_CLASSES}
    base patterns, with every second dozen flipping the top bit — so
    each class exists in two variants at Hamming distance 1. Key range
    never hits 0 or 255, so every image has both bright and dark rows
    and the mean threshold is never degenerate."""
    base = 17 + (doc_id % AHASH_CLASSES) * 18
    return base ^ (128 * ((doc_id // AHASH_CLASSES) % 2))


def make_png_pattern(doc_id: int) -> bytes:
    """A REAL 8×8 grayscale PNG whose rows encode :func:`_ahash_key`:
    row y is all-bright when bit y is set, all-dark otherwise.
    Up-filtered scanlines as in :func:`make_png_gradient`, so the hash
    only comes out right if inflate + unfilter are both correct."""
    import numpy as np

    from ..functions.png_codec import encode_png

    key = _ahash_key(doc_id)
    rows = np.where(
        (key >> np.arange(8)) & 1, AHASH_BRIGHT, AHASH_DARK
    ).astype(np.uint8)[:, None]
    return encode_png(np.broadcast_to(rows, (8, 8)).copy())


@query(
    "image_near_dup_ahash",
    oracle=f"""
    WITH keys AS (
        SELECT doc_id,
               CAST(xor(17 + (doc_id % {AHASH_CLASSES}) * 18,
                        128 * ((doc_id // {AHASH_CLASSES}) % 2))
                    AS BIGINT) AS ahash
        FROM documents
    ), reps AS (
        SELECT ahash, CAST(COUNT(*) AS BIGINT) AS n_docs,
               MIN(doc_id) AS rep_doc
        FROM keys GROUP BY ahash
    )
    SELECT a.ahash AS hash_a, b.ahash AS hash_b,
           a.n_docs AS n_a, b.n_docs AS n_b,
           a.rep_doc AS rep_a, b.rep_doc AS rep_b,
           CAST(bit_count(xor(a.ahash, b.ahash)) AS BIGINT) AS hamming
    FROM reps a JOIN reps b
      ON a.ahash < b.ahash
     AND (a.ahash % 16 = b.ahash % 16 OR a.ahash // 16 = b.ahash // 16)
    WHERE bit_count(xor(a.ahash, b.ahash)) <= 1
    ORDER BY hash_a, hash_b
    """,
)
def image_near_dup_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate detection by average hash, REAL end to end:
    per doc_id an 8×8 pattern PNG is synthesized, the stdlib codec
    decodes its actual IDAT bytes, and the aHash comes from the decoded
    pixels (bit y = row y's mean above the image mean). Near-dup pairs
    are hash pairs at Hamming distance ≤ 1.

    The oracle recomputes the hash in closed form from the synthesis
    rule — any bug in zlib framing, unfiltering, row order, mean
    threshold, or bit packing scrambles the recovered key and fails the
    hash join, so the whole pixel pipeline is value-certified.

    Scale plan (the part that matters at billions of images): documents
    COLLAPSE TO DISTINCT FINGERPRINTS FIRST (one groupBy; the corpus
    never self-joins), then the pair search runs at hash granularity —
    a banded equi-join (two 4-bit bands; distance ≤ 1 guarantees at
    least one band matches, so banding is recall-lossless) over a frame
    that is orders of magnitude smaller than the corpus. The same
    two-phase shape as minhash/simhash dedup, in its image form. The
    decode itself is a narrow Arrow-batched mapInPandas scan — no
    shuffle carries a payload byte."""
    import numpy as np

    from ..functions.png_codec import decode_png

    png_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )
    hash_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("ahash", T.LongType(), True),
        ]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [make_png_pattern(i) for i in ids]}
            )

    def ahash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                px = decode_png(bytes(p) if p is not None else b"")
                if px is None:
                    out.append(None)
                    continue
                gray = px.mean(axis=2)
                row_means = gray.mean(axis=1)
                bits = (row_means > gray.mean()).astype(np.int64)
                out.append(int((bits << np.arange(8)).sum()))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "ahash": out}
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    hashes = docs.mapInPandas(synth, png_schema).mapInPandas(
        ahash, hash_schema
    )
    reps = hashes.groupBy("ahash").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("doc_id").alias("rep_doc"),
    )
    a = reps.select(
        F.col("ahash").alias("hash_a"),
        F.col("n_docs").alias("n_a"),
        F.col("rep_doc").alias("rep_a"),
        (F.col("ahash") % 16).alias("band0_a"),
        (F.col("ahash") / 16).cast("long").alias("band1_a"),
    )
    b = reps.select(
        F.col("ahash").alias("hash_b"),
        F.col("n_docs").alias("n_b"),
        F.col("rep_doc").alias("rep_b"),
        (F.col("ahash") % 16).alias("band0_b"),
        (F.col("ahash") / 16).cast("long").alias("band1_b"),
    )
    # one EQUI-join per band (an OR condition would plan as a nested
    # loop); union + dedup — the standard LSH banding shape
    cand0 = a.join(
        b,
        (F.col("band0_a") == F.col("band0_b"))
        & (F.col("hash_a") < F.col("hash_b")),
    )
    cand1 = a.join(
        b,
        (F.col("band1_a") == F.col("band1_b"))
        & (F.col("hash_a") < F.col("hash_b")),
    )
    pairs = cand0.unionByName(cand1).dropDuplicates(["hash_a", "hash_b"])
    return (
        pairs.withColumn(
            "hamming",
            F.bit_count(
                F.col("hash_a").bitwiseXOR(F.col("hash_b"))
            ).cast("long"),
        )
        .filter(F.col("hamming") <= 1)
        .select(
            "hash_a", "hash_b", "n_a", "n_b", "rep_a", "rep_b", "hamming"
        )
        .orderBy("hash_a", "hash_b")
    )


# ---------------------------------------------------------------------------
# Audio fingerprinting: segment-energy hash over real PCM decode
# ---------------------------------------------------------------------------

#: audio fingerprint geometry: 8 segments × this many 16-bit samples
AUDIO_SEG_SAMPLES = 64
AUDIO_CLASSES = 10
AUDIO_LOUD, AUDIO_QUIET = 10_000, 100


def read_wav_pcm(payload: bytes):
    """Decode a 16-bit PCM WAV's ``data`` chunk to an int16 sample
    array (chunk walk as :func:`parse_wav_header`), or None when the
    payload is not such a WAV."""
    import numpy as np

    hdr = parse_wav_header(payload)
    if hdr is None or hdr["bits"] != 16:
        return None
    i, n = 12, len(payload)
    while i + 8 <= n:
        tag = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        if tag == b"data":
            raw = payload[i + 8 : i + 8 + size]
            if len(raw) != size or size % 2:
                # truncated or odd-byte data chunk: malformed, not a
                # ValueError out of np.frombuffer mid-task (the 'or
                # None' quarantine contract — review finding)
                return None
            return np.frombuffer(raw, dtype="<i2")
        i += 8 + size + (size % 2)
    return None


def _audio_key(doc_id: int) -> int:
    """The 8-bit loudness pattern audio ``doc_id`` is synthesized from:
    one of {AUDIO_CLASSES} base patterns with every second group of ten
    flipping the top bit. Stride 22 keeps every base off 127/128, so no
    key is ever 0 or 255 — the clip always has BOTH loud and quiet
    segments and the mean-energy threshold strictly separates them
    (the old stride 21 hit base 128, whose flipped key was 0: an
    all-quiet clip whose fingerprint only matched by the accident of
    exact-equal energies — review finding)."""
    base = 23 + (doc_id % AUDIO_CLASSES) * 22
    return base ^ (128 * ((doc_id // AUDIO_CLASSES) % 2))


def make_wav_pattern(doc_id: int) -> bytes:
    """A REAL 16-bit mono PCM WAV whose 8 fixed-length segments encode
    :func:`_audio_key`: segment s is a loud square wave when bit s is
    set, near-silence otherwise."""
    import struct

    import numpy as np

    key = _audio_key(doc_id)
    amps = np.where(
        (key >> np.arange(8)) & 1, AUDIO_LOUD, AUDIO_QUIET
    )
    seg = np.tile(np.array([1, -1], dtype=np.int64), AUDIO_SEG_SAMPLES // 2)
    pcm = (amps[:, None] * seg[None, :]).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


@query(
    "audio_fingerprint_classes",
    oracle=f"""
    WITH keys AS (
        SELECT doc_id,
               CAST(xor(23 + (doc_id % {AUDIO_CLASSES}) * 22,
                        128 * ((doc_id // {AUDIO_CLASSES}) % 2))
                    AS BIGINT) AS fingerprint
        FROM documents
    )
    SELECT fingerprint, CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(doc_id) AS rep_doc
    FROM keys GROUP BY fingerprint
    ORDER BY fingerprint
    """,
)
def audio_fingerprint_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-duplicate grouping by segment-energy fingerprint,
    REAL end to end: per doc_id a PCM WAV is synthesized, the chunk
    walk extracts the actual int16 samples, and the fingerprint bit s
    says whether segment s's mean |amplitude| exceeds the clip's mean —
    the skeleton of every audio fingerprinter (Shazam-style
    constellation maps start exactly here: banded energy over time
    windows, thresholded).

    The oracle recomputes the fingerprint arithmetically from the
    synthesis rule, so a wrong byte order, a misread chunk size, or an
    off-by-one segment boundary scrambles the recovered key and fails
    the value hash. Scale plan: decode + hash is a narrow Arrow-batched
    mapInPandas (no shuffle carries audio bytes); the only shuffle is
    the fingerprint groupBy, which collapses the corpus to
    {AUDIO_CLASSES}×2 rows."""
    import numpy as np

    wav_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )
    fp_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("fingerprint", T.LongType(), True),
        ]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [make_wav_pattern(i) for i in ids]}
            )

    def fingerprint(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                pcm = read_wav_pcm(bytes(p) if p is not None else b"")
                if pcm is None or len(pcm) % AUDIO_SEG_SAMPLES:
                    out.append(None)
                    continue
                segs = np.abs(pcm.astype(np.int64)).reshape(
                    -1, AUDIO_SEG_SAMPLES
                )
                energy = segs.mean(axis=1)
                bits = (energy > energy.mean()).astype(np.int64)
                out.append(int((bits << np.arange(len(bits))).sum()))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "fingerprint": out}
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return (
        docs.mapInPandas(synth, wav_schema)
        .mapInPandas(fingerprint, fp_schema)
        .groupBy("fingerprint")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("rep_doc"),
        )
        .orderBy("fingerprint")
    )
