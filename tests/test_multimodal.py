"""Multimodal plumbing: Arrow-batched binary transforms must preserve
schema/shape contracts even with the codec stubbed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.multimodal import (
    decode_media_batch,
    synthesize_media,
)
from nyc_taxi_data_warehouse_spark.multimodal.binaryops import (
    resize_media,
    sample_frames,
)
from nyc_taxi_data_warehouse_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_resize_fixes_payload_size(spark):
    media = synthesize_media(load_table(spark, SF, "documents").limit(50))
    out = resize_media(media, width=10, height=8)
    sizes = out.select(F.octet_length("payload").alias("n")).distinct().collect()
    assert [r["n"] for r in sizes] == [80]
    assert out.count() == 50  # 1:1 — resize never drops or duplicates rows


def test_sample_frames_counts(spark):
    media = synthesize_media(load_table(spark, SF, "documents").limit(50))
    frames = sample_frames(media, frame_size=100, every_n=3)
    # sampled count per media == floor((n_frames-1)/3)+1, and frame_idx
    # strides by 3 from 0
    bad = frames.groupBy("media_id", "n_frames").agg(
        F.count("*").alias("got"),
        F.max("frame_idx").alias("max_idx"),
    ).where(
        (F.col("got") != F.floor((F.col("n_frames") - 1) / 3) + 1)
        | (F.col("max_idx") % 3 != 0)
    )
    assert bad.count() == 0


def test_real_codec_is_declared_but_stubbed(spark):
    media = synthesize_media(load_table(spark, SF, "documents").limit(1))
    with pytest.raises(NotImplementedError):
        decode_media_batch(media, codec="pil")
