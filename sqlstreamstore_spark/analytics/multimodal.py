"""Multimodal column handling — image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched Pandas UDFs.

The Spark-side plumbing (schema, partitioning, mapInPandas batch shape,
UDF signatures) is real and tested; the actual media decoding is STUBBED
(no PIL/ffmpeg in this container): ``decode_image_stub`` parses only our
deterministic fake header. Swap `_decode_one` for a real decoder (PIL /
torchaudio / pyav) in production — the dataflow does not change.

Scale design: media bytes never pass through the driver; rows flow
partition-by-partition through mapInPandas with a bounded Arrow batch
size (spark.sql.execution.arrow.maxRecordsPerBatch governs memory — for
multi-MB payloads set it low, e.g. 32). Feature extraction keeps columns
narrow: select() away the payload as soon as the features are computed,
so downstream shuffles move only features, not bytes.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata travels next to the opaque payload.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

_MAGIC = b"FAKEMEDIA"  # deterministic fake header: MAGIC | kind(1B) | w | h | dur


def encode_fake_media(media_id: int, kind: str, width: int, height: int, duration_ms: int) -> bytes:
    """Deterministic fake payload for tests (stands in for real bytes)."""
    kind_b = {"image": 0, "audio": 1, "video": 2}[kind]
    body = bytes((media_id * 7 + i) % 256 for i in range(64))
    return _MAGIC + struct.pack("<BIII", kind_b, width, height, duration_ms) + body


def make_fake_media_df(spark: SparkSession, n: int = 100) -> DataFrame:
    """Synthesize a deterministic media table with the canonical schema."""
    kinds = ["image", "audio", "video"]
    mimes = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        w, h, d = (64 + i % 32, 48 + i % 24, 1000 + i * 10)
        rows.append(
            (
                i,
                kind,
                mimes[kind],
                encode_fake_media(i, kind, w, h, d),
                (w if kind == "image" else None, h if kind == "image" else None,
                 d if kind != "image" else None, "fake"),
            )
        )
    # Right-size partitions to the data: a tiny demo table across the
    # session's full default parallelism would spawn one Python worker per
    # (near-empty) partition in the downstream mapInPandas. Real media
    # tables arrive already partitioned by the source.
    n_parts = max(1, min(spark.sparkContext.defaultParallelism, n // 32 or 1))
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(n_parts)


def _decode_one(payload: bytes) -> dict:
    """STUB decoder: parses the deterministic fake header. A real build
    replaces this body with PIL/librosa/pyav — signature stays."""
    if payload is None or not payload.startswith(_MAGIC):
        raise NotImplementedError(
            "real media decoding is not available in this environment; "
            "payload is not FAKEMEDIA"
        )
    kind_b, w, h, d = struct.unpack_from("<BIII", payload, len(_MAGIC))
    body = payload[len(_MAGIC) + 13 :]
    return {
        "decoded_kind": ["image", "audio", "video"][kind_b],
        "width": w,
        "height": h,
        "duration_ms": d,
        "n_bytes": len(payload),
        "checksum": sum(body) % 65536,
    }


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("decoded_kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("checksum", T.IntegerType(), False),
    ]
)


def decode_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: payload in, narrow features out.
    The payload column dies inside the operator — only features shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_one(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.select("media_id", "payload").mapInPandas(run, DECODED_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize pipeline stage (stub transform: rewrites the fake
    header dims; a real build calls PIL.Image.resize). Filter + transform
    runs fully parallel; non-images are filtered out BEFORE the UDF so
    the Python worker only sees relevant rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                d = _decode_one(bytes(p))
                payloads.append(encode_fake_media(int(mid), "image", width, height,
                                                  d["duration_ms"]))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": payloads,
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(run, RESIZE_SCHEMA)
    )


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp (explode of a generated timestamp sequence — the Spark-side
    shape of frame extraction; actual frame decode is the stub)."""
    frames = media.filter(
        (F.col("kind") == "video") & (F.col("meta.duration_ms") > 0)
    ).select(
        # zero/negative durations have no frames — and sequence(0, -1)
        # throws "illegal sequence boundaries" under ANSI, so the guard
        # is correctness, not just semantics
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
    return frames.withColumn(
        "frame_id",
        F.concat_ws("-", F.col("media_id").cast("string"), F.col("frame_ts_ms").cast("string")),
    )


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Treat each document's utf-8 bytes as an opaque binary payload —
    the bridging shape for mixed text/media corpora (and the one media
    query the DuckDB oracle can check, since the payload derives from a
    fixture table rather than synthesized rows)."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("kind"),
        F.lit("text/plain").alias("mime"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


PAYLOAD_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("digest", T.StringType(), False),
    ]
)


def payload_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched binary feature extraction with a checkable result:
    byte length + md5 digest per payload via mapInPandas (the exact
    dataflow a real decoder uses — bytes stay executor-side, only
    narrow features come out; DuckDB computes identical values from the
    source text, so this one IS oracled, unlike the stubbed decodes)."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(p) for p in payloads],
                    "digest": [hashlib.md5(p).hexdigest() for p in payloads],
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, PAYLOAD_STATS_SCHEMA)
