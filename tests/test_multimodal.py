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


def _png_bytes(width: int, height: int) -> bytes:
    # Signature + IHDR chunk (length, type, w, h, bit-depth/color/etc.).
    import struct

    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", width, height)
        + b"\x08\x02\x00\x00\x00"
        + b"\x00" * 4  # CRC (unchecked by the header parser)
    )


def _wav_bytes(rate: int, channels: int) -> bytes:
    # RIFF header + a JUNK chunk before fmt  to prove the chunk walk.
    import struct

    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, 2, 16)
    junk = b"JUNK" + struct.pack("<I", 5) + b"\x00" * 5 + b"\x00"  # padded
    body = junk + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _jpeg_bytes(width: int, height: int) -> bytes:
    # SOI + APP0(JFIF) + DQT before SOF0 to prove the marker walk, + EOI.
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\xff\xdb" + struct.pack(">H", 5) + b"\x00\x01\x02"
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x01\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + dqt + sof0 + b"\xff\xd9"


def _mp4_bytes(timescale: int, duration: int, version: int = 0) -> bytes:
    # ftyp + moov>mvhd (v0: u32 times/duration; v1: u64) per ISO-BMFF.
    import struct

    ftyp = struct.pack(">I", 16) + b"ftypisom" + struct.pack(">I", 0)
    if version == 1:
        body = (
            b"\x01\x00\x00\x00"
            + b"\x00" * 16  # ctime/mtime u64
            + struct.pack(">I", timescale)
            + struct.pack(">Q", duration)
            + b"\x00" * 76
        )
    else:
        body = (
            b"\x00\x00\x00\x00"
            + b"\x00" * 8  # ctime/mtime u32
            + struct.pack(">II", timescale, duration)
            + b"\x00" * 80
        )
    mvhd = struct.pack(">I", 8 + len(body)) + b"mvhd" + body
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    return ftyp + moov


def test_header_codec_parses_jpeg_and_mp4(spark):
    """JPEG SOF0 (after APP0/DQT segments) and MP4 moov/mvhd (both
    version 0 and 1 time fields) parse with stdlib struct end-to-end
    through the Arrow decode; garbage falls back to the fake codec."""
    from nyc_taxi_data_warehouse_spark.multimodal.binaryops import MEDIA_SCHEMA

    rows = [
        (1, "image/jpeg", _jpeg_bytes(800, 600), {}),
        (2, "video/mp4", _mp4_bytes(90000, 450000), {}),  # 5.000 s
        (3, "video/mp4", _mp4_bytes(1000, 72_500, version=1), {}),
        (4, "image/jpeg", b"\xff\xd8\xff\xd9", {}),  # SOI+EOI, no SOF
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    got = {
        r["media_id"]: r
        for r in decode_media_batch(media, codec="header").collect()
    }
    assert (got[1]["width"], got[1]["height"]) == (800, 600)
    assert got[1]["codec_used"] == "jpeg-header"
    assert got[1]["duration_ms"] is None
    assert (got[2]["duration_ms"], got[2]["sample_rate"]) == (5000, 90000)
    assert got[2]["codec_used"] == "mp4-header"
    assert (got[3]["duration_ms"], got[3]["sample_rate"]) == (72500, 1000)
    assert got[4]["codec_used"] == "fake"


def test_header_codec_parses_png_and_wav(spark):
    from nyc_taxi_data_warehouse_spark.multimodal.binaryops import MEDIA_SCHEMA

    rows = [
        (1, "image/png", _png_bytes(640, 480), {}),
        (2, "audio/wav", _wav_bytes(44100, 2), {}),
        (3, "video/mp4", b"not a container at all", {}),
        (4, "image/png", b"\x89PNG\r\n\x1a\nTRUNC", {}),  # torn header
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    got = {
        r["media_id"]: r
        for r in decode_media_batch(media, codec="header").collect()
    }
    assert (got[1]["width"], got[1]["height"]) == (640, 480)
    assert got[1]["codec_used"] == "png-header"
    assert got[1]["sample_rate"] is None
    assert (got[2]["sample_rate"], got[2]["channels"]) == (44100, 2)
    assert got[2]["codec_used"] == "wav-header"
    # Unparseable payloads fall back to the deterministic fake.
    from nyc_taxi_data_warehouse_spark.multimodal.binaryops import (
        fake_decode_meta,
    )

    for mid in (3, 4):
        assert got[mid]["codec_used"] == "fake"
        w, h = fake_decode_meta(rows[mid - 1][2])
        assert (got[mid]["width"], got[mid]["height"]) == (w, h)


def test_read_media_dir_ingests_files_end_to_end(spark, tmp_path):
    """binaryFile ingestion → MEDIA_SCHEMA → header decode, on real
    files: mime from extension, deterministic path-hash ids, max_bytes
    pushed into the listing, payload bytes intact."""
    from nyc_taxi_data_warehouse_spark.multimodal import read_media_dir

    (tmp_path / "a.png").write_bytes(_png_bytes(320, 200))
    (tmp_path / "b.wav").write_bytes(_wav_bytes(16000, 1))
    (tmp_path / "c.bin").write_bytes(b"\x00" * 4096)
    (tmp_path / "skip.txt").write_text("not media")

    media = read_media_dir(spark, str(tmp_path), glob="*.{png,wav,bin}")
    assert media.schema.simpleString() == (
        "struct<media_id:bigint,mime:string,payload:binary,"
        "meta:map<string,string>>"
    )
    rows = {r["meta"]["path"].rsplit("/", 1)[-1]: r for r in media.collect()}
    assert set(rows) == {"a.png", "b.wav", "c.bin"}
    assert rows["a.png"]["mime"] == "image/png"
    assert rows["b.wav"]["mime"] == "audio/wav"
    assert rows["c.bin"]["mime"] == "application/octet-stream"
    assert bytes(rows["a.png"]["payload"]) == _png_bytes(320, 200)
    # deterministic id: re-read yields identical keys
    again = {r["media_id"] for r in read_media_dir(
        spark, str(tmp_path), glob="*.{png,wav,bin}").collect()}
    assert again == {r["media_id"] for r in rows.values()}

    # size gate drops the 4 KiB blob before decode — and reaches the
    # binaryFile scan as a DataFilter (bytes of oversized files are
    # never read, not read-then-dropped)
    small = read_media_dir(
        spark, str(tmp_path), glob="*.{png,wav,bin}", max_bytes=1024
    )
    plan = small._jdf.queryExecution().executedPlan().toString()
    scan_lines = [ln for ln in plan.splitlines() if "FileScan binaryFile" in ln]
    assert scan_lines and "length" in scan_lines[0].split("DataFilters")[-1]
    from nyc_taxi_data_warehouse_spark.multimodal import decode_media_batch

    got = {
        r["codec_used"]
        for r in decode_media_batch(small, codec="header").collect()
    }
    assert got == {"png-header", "wav-header"}
    dec = {
        r["mime"]: r
        for r in decode_media_batch(small, codec="header").collect()
    }
    assert (dec["image/png"]["width"], dec["image/png"]["height"]) == (320, 200)
    assert (dec["audio/wav"]["sample_rate"], dec["audio/wav"]["channels"]) == (
        16000,
        1,
    )


def test_read_media_dir_jpeg_mp4_end_to_end(spark, tmp_path):
    """binaryFile ingestion → header decode on real JPEG/MP4 files."""
    from nyc_taxi_data_warehouse_spark.multimodal.binaryops import read_media_dir

    (tmp_path / "x.jpg").write_bytes(_jpeg_bytes(64, 32))
    (tmp_path / "y.mp4").write_bytes(_mp4_bytes(600, 1200))  # 2.000 s
    media = read_media_dir(spark, str(tmp_path), glob="*.{jpg,mp4}")
    dec = {
        r["mime"]: r
        for r in decode_media_batch(media, codec="header").collect()
    }
    assert (dec["image/jpeg"]["width"], dec["image/jpeg"]["height"]) == (64, 32)
    assert dec["image/jpeg"]["codec_used"] == "jpeg-header"
    assert (dec["video/mp4"]["duration_ms"], dec["video/mp4"]["sample_rate"]) == (
        2000,
        600,
    )
    assert dec["video/mp4"]["codec_used"] == "mp4-header"


def test_bounded_arrow_batches_scopes_the_conf(spark):
    """The media batch bound must apply inside the context (observable
    as smaller decode batches) and restore the session default after."""
    from nyc_taxi_data_warehouse_spark.multimodal.binaryops import (
        bounded_arrow_batches,
    )

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    before = spark.conf.get(key, None)
    media = synthesize_media(load_table(spark, SF, "documents").limit(40))
    with bounded_arrow_batches(spark, records=7):
        assert spark.conf.get(key) == "7"
        # 40 rows / 7-row batches: every digest row still produced once
        assert decode_media_batch(media, codec="header").count() == 40
    assert spark.conf.get(key, None) == before


def test_fake_codec_output_unchanged_by_header_columns(spark):
    # m02's oracle depends on the fake codec's width/height; the new
    # schema columns must be null under codec='fake'.
    media = synthesize_media(load_table(spark, SF, "documents").limit(20))
    out = decode_media_batch(media, codec="fake")
    assert out.where(
        F.col("sample_rate").isNotNull()
        | F.col("channels").isNotNull()
        | (F.col("codec_used") != "fake")
    ).count() == 0
