"""Multimodal (image/audio/video) column plumbing.

Media assets ride through the engine as opaque ``binary`` payload columns
with a typed metadata struct (SURVEY-extension; BASELINE.json north
star). The Spark-side contract is real and tested — schema, partitioning,
Arrow batch shape, UDF signatures — while the actual codec step is
isolated behind ``decode_fn``: the container ships no image/audio
libraries, so the default decoder raises NotImplementedError and tests
exercise the pipeline with :func:`fake_decode` (deterministic,
byte-derived features).

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
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def real_decode(payload: bytes, media_type: str) -> dict:
    """Codec-backed decode (PIL/libav/...). STUB: the container ships no
    media libraries — wire a real implementation here on a cluster with
    codecs installed."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use fake_decode for pipeline testing"
    )


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
        "n_frames": 1 if media_type.startswith("image") else (n % 300) + 1,
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
    exploded rows only. No codec needed to build the sampling plan."""
    n_frames = F.coalesce(F.col("meta.n_bytes") % 300 + 1, F.lit(1))
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return media.select(
        "media_id",
        "media_type",
        "payload",
        F.explode(idx).alias("frame_index"),
    )


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
