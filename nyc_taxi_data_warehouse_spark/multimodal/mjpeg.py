"""REAL video frame sampling for MJPEG-in-AVI payloads.

``sample_frames`` (binaryops) keeps the catalog's byte-splitter shape;
this module makes the real thing possible for one genuine video format
the sandbox can fully express: AVI is a RIFF container (stdlib walk,
same family as WAV) and Motion-JPEG frames are plain baseline JPEGs —
exactly what ``jpegcodec.decode_jpeg_pixels`` decodes. Demux → pick
every n-th frame → decode → emit fixed-width per-frame stats; payload
bytes never leave the Arrow batch.

The demuxer is deliberately structure-only: it trusts the RIFF tree
(LIST/movi, ``##dc``/``##db`` chunks whose data starts with the JPEG
SOI marker) and takes frame dimensions from the decoded frames
themselves, ignoring ``avih``/``strh`` header fields entirely — so it
reads any writer's MJPEG AVI, including the minimal test mux below,
and a lying header cannot skew results.

MP4/H.264 frame decode remains out of scope (needs external codecs) —
this is the honest subset a pure-stdlib+numpy environment can do.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from .jpegcodec import decode_jpeg_pixels


def demux_mjpeg_frames(payload: bytes):
    """JPEG frame payloads from an AVI RIFF tree, in stream order, or
    None if the payload is not an AVI. Frames are the data of video
    chunks (fourcc ``xxdc``/``xxdb``) that start with SOI."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    frames: list[bytes] = []

    def walk(off: int, end: int) -> None:
        while off + 8 <= end:
            cid = payload[off : off + 4]
            (size,) = struct.unpack("<I", payload[off + 4 : off + 8])
            data_start = off + 8
            if cid == b"LIST":
                # list type (movi/hdrl/...) then sub-chunks
                walk(data_start + 4, min(data_start + size, end))
            elif cid[2:4] in (b"dc", b"db"):
                data = payload[data_start : data_start + size]
                if data[:2] == b"\xff\xd8":
                    frames.append(data)
            off = data_start + size + (size & 1)  # chunks are word-aligned

    walk(12, len(payload))
    return frames


def mux_mjpeg_avi(frames: list[bytes], fps: int = 30) -> bytes:
    """Minimal spec-shaped MJPEG AVI writer (test/validation fixture —
    the demuxer above ignores the header fields, but the RIFF structure
    is the real thing: hdrl list with avih, movi list with 00dc
    chunks)."""
    avih = struct.pack(
        "<14I",
        1_000_000 // max(fps, 1),  # microseconds per frame
        0, 0, 0x10, len(frames), 0, 1, 0, 0, 0, 0, 0, 0, 0,
    )
    hdrl = b"LIST" + struct.pack("<I", 4 + 8 + len(avih)) + b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
    movi_items = bytearray()
    for f in frames:
        movi_items += b"00dc" + struct.pack("<I", len(f)) + f
        if len(f) & 1:
            movi_items += b"\x00"
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_items)) + b"movi" + bytes(movi_items)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("mean_px", DoubleType()),
    ]
)


def sample_video_frames(df: DataFrame, every_n: int = 4) -> DataFrame:
    """One row per SAMPLED, DECODED frame of each MJPEG AVI payload:
    every n-th frame is demuxed and fully decoded (baseline JPEG), and
    the row carries real dimensions and pixel mean. Non-AVI payloads
    and undecodable frames are dropped. Same containment contract as
    every extractor here: payloads and pixels live only inside the
    Arrow batch; downstream work shuffles fixed-width stats."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                frames = demux_mjpeg_frames(p or b"")
                if not frames:
                    continue
                for i in range(0, len(frames), every_n):
                    dec = decode_jpeg_pixels(frames[i])
                    if dec is None:
                        continue
                    w, h, c, px = dec
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": i,
                            "n_frames": len(frames),
                            "width": w,
                            "height": h,
                            "channels": c,
                            "mean_px": round(sum(px) / len(px), 4),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in VIDEO_FRAME_SCHEMA.fields]
            )

    return df.mapInPandas(batches, schema=VIDEO_FRAME_SCHEMA)
