"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side architecture is the real deliverable here — schema,
partition-friendly batch shape, Arrow-batched ``mapInPandas`` signatures —
while the actual codec calls are stubbed (no image/audio libraries in
this environment): ``decode_media_batch`` raises ``NotImplementedError``
for real codecs and offers ``fake_decode_meta``, a deterministic
byte-level stand-in, so the distributed plumbing is testable end-to-end.

At 100 TB: payloads stay in executor memory one Arrow batch at a time
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds peak usage);
nothing ever collects payload bytes to the driver. Feature extraction
emits small fixed-width columns, so downstream joins/aggs shuffle
metadata, not media bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta", MapType(StringType(), StringType())),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def synthesize_media(documents: DataFrame) -> DataFrame:
    """Deterministic media table from the documents fixture: the text
    bytes become the opaque payload (the engine treats payloads as
    opaque either way — only the stubbed decoder would care)."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
        F.encode("text", "UTF-8").alias("payload"),
        F.create_map(
            F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")
        ).alias("meta"),
    )


def fake_decode_meta(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for a codec's (width, height): derived from
    payload length — stable across engines and runs."""
    n = len(payload or b"")
    return (n % 640 + 1, n % 480 + 1)


def decode_media_batch(df: DataFrame, codec: str = "fake") -> DataFrame:
    """Arrow-batched decode / feature-extract over payload bytes.

    ``codec='fake'`` exercises the full distributed path with the
    deterministic stand-in. Real codecs are declared but stubbed:
    the image/audio libraries are not available in this environment.
    """
    if codec != "fake":
        raise NotImplementedError(
            f"codec {codec!r}: real decoders (PIL/librosa/ffmpeg) are not "
            "available in this environment; the Spark plumbing is identical —"
            " swap fake_decode_meta for the codec call."
        )

    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            w_h = [fake_decode_meta(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": [len(p or b"") for p in payloads],
                    "digest": [
                        hashlib.md5(p or b"").hexdigest() for p in payloads
                    ],
                    "width": [w for w, _ in w_h],
                    "height": [h for _, h in w_h],
                }
            )

    return df.mapInPandas(batches, schema=DECODED_SCHEMA)


def extract_features(decoded: DataFrame) -> DataFrame:
    """Post-decode metadata analytics — plain DataFrame ops from here on."""
    return (
        decoded.groupBy("mime")
        .agg(
            F.count("*").alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.min("width").alias("min_width"),
            F.max("height").alias("max_height"),
        )
        .orderBy("mime")
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", LongType()),
        StructField("n_frames", IntegerType()),
    ]
)


def resize_media(df: DataFrame, width: int = 64, height: int = 48) -> DataFrame:
    """Binary-in → binary-out transform (the resize plumbing): payload is
    deterministically truncated/padded to width*height bytes. A real
    resampler replaces the inner function; the Arrow-batched one-binary-
    row-in, one-out shape is what matters at scale."""
    target = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = [
                (p or b"")[:target].ljust(target, b"\0") for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "payload": out,
                    "width": width,
                    "height": height,
                }
            )

    return df.mapInPandas(batches, schema=RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame, frame_size: int = 256, every_n: int = 4
) -> DataFrame:
    """One-to-many mapInPandas: split each payload into frame_size-byte
    "frames" and keep every n-th — the video frame-sampling shape (a real
    demuxer replaces the byte splitter). Emits small fixed-width rows, so
    downstream work shuffles frame metadata, never payloads."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, mimes, idxs, sizes, totals = [], [], [], [], []
            for mid, mime, p in zip(pdf["media_id"], pdf["mime"], pdf["payload"]):
                p = p or b""
                n_frames = max((len(p) + frame_size - 1) // frame_size, 1)
                for i in range(0, n_frames, every_n):
                    ids.append(mid)
                    mimes.append(mime)
                    idxs.append(i)
                    sizes.append(len(p[i * frame_size : (i + 1) * frame_size]))
                    totals.append(n_frames)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "mime": mimes,
                    "frame_idx": idxs,
                    "frame_bytes": sizes,
                    "n_frames": totals,
                }
            )

    return df.mapInPandas(batches, schema=FRAME_SCHEMA)
