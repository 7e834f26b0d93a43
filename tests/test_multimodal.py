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


def _png_full_bytes(width, height, channels, pixels, filter_type=0):
    """A real, decodable PNG: IHDR + one zlib IDAT with every scanline
    filtered with `filter_type` (the test applies the filter forward;
    the engine decoder must invert it)."""
    import struct
    import zlib

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]

    def chunk(ctype, data):
        c = struct.pack(">I", len(data)) + ctype + data
        return c + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * channels
    raw = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        row = bytearray(pixels[y * stride : (y + 1) * stride])
        filt = bytearray(stride)
        for i in range(stride):
            a = row[i - channels] if i >= channels else 0
            b = prev[i]
            c = prev[i - channels] if i >= channels else 0
            if filter_type == 0:
                filt[i] = row[i]
            elif filter_type == 1:
                filt[i] = (row[i] - a) & 0xFF
            elif filter_type == 2:
                filt[i] = (row[i] - b) & 0xFF
            elif filter_type == 3:
                filt[i] = (row[i] - ((a + b) >> 1)) & 0xFF
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else b if pb <= pc else c
                filt[i] = (row[i] - pred) & 0xFF
        raw += bytes([filter_type]) + filt
        prev = row
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _wav_pcm16_bytes(rate, channels, samples):
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16
    )
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_png_full_frame_decode_all_filters(spark):
    """decode_png_pixels is a REAL decoder: for every PNG scanline
    filter type (None/Sub/Up/Average/Paeth) and channel count, the
    zlib-round-tripped pixels must equal the source exactly, end-to-end
    through the Arrow mapInPandas stats operator."""
    import statistics

    from nyc_taxi_data_warehouse_spark.multimodal.binaryops import (
        MEDIA_SCHEMA,
        decode_png_pixels,
        extract_pixel_stats,
    )

    w, h = 5, 4
    rows = []
    expect = {}
    mid = 0
    for channels in (1, 2, 3, 4):
        stride = w * channels
        pixels = bytes(
            (x * 37 + y * 11 + ch) % 256
            for y in range(h)
            for x in range(w)
            for ch in range(channels)
        )
        assert len(pixels) == h * stride
        for ftype in range(5):
            png = _png_full_bytes(w, h, channels, pixels, filter_type=ftype)
            dec = decode_png_pixels(png)
            assert dec is not None, (channels, ftype)
            assert (dec[0], dec[1], dec[2]) == (w, h, channels)
            assert bytes(dec[3]) == pixels, f"filter {ftype} c{channels}"
            mean = sum(pixels) / len(pixels)
            expect[mid] = (
                channels,
                round(mean, 4),
                round(statistics.pstdev(pixels, mean), 4),
            )
            rows.append((mid, "image/png", png, {}))
            mid += 1
    rows.append((999, "image/png", b"not a png", {}))  # dropped, not error

    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in extract_pixel_stats(media).collect()}
    assert set(got) == set(expect)
    for m, (c, mean, std) in expect.items():
        r = got[m]
        assert (r["channels"], r["mean_px"], r["std_px"]) == (c, mean, std)


def test_wav_full_frame_decode_pcm16(spark):
    import math

    from nyc_taxi_data_warehouse_spark.multimodal.binaryops import (
        MEDIA_SCHEMA,
        extract_audio_stats,
    )

    samples = [0, 1000, -2000, 30000, -30001, 12345, -1, 7]
    wav = _wav_pcm16_bytes(8000, 1, samples)
    media = spark.createDataFrame(
        [(1, "audio/wav", wav, {}), (2, "audio/wav", b"RIFFjunk", {})],
        schema=MEDIA_SCHEMA,
    )
    got = extract_audio_stats(media).collect()
    assert len(got) == 1
    r = got[0]
    rms = math.sqrt(sum(s * s for s in samples) / len(samples))
    assert (r["sample_rate"], r["channels"], r["n_samples"]) == (8000, 1, 8)
    assert r["rms"] == round(rms, 4)
    assert r["peak"] == 30001


# ---------------------------------------------------------------------------
# Property tests for the pure-Python decoders (no Spark session needed)
# ---------------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 10),
    channels=st.sampled_from([1, 2, 3, 4]),
    filter_type=st.integers(0, 4),
    data=st.data(),
)
def test_png_decode_roundtrip_property(w, h, channels, filter_type, data):
    """For ANY pixel content, encoding with any single filter type and
    decoding must return the source bytes exactly."""
    from nyc_taxi_data_warehouse_spark.multimodal.binaryops import (
        decode_png_pixels,
    )

    n = w * h * channels
    pixels = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n))
    )
    png = _png_full_bytes(w, h, channels, pixels, filter_type=filter_type)
    dec = decode_png_pixels(png)
    assert dec is not None
    assert (dec[0], dec[1], dec[2]) == (w, h, channels)
    assert bytes(dec[3]) == pixels


@settings(max_examples=60, deadline=None)
@given(
    rate=st.sampled_from([8000, 16000, 44100]),
    channels=st.integers(1, 2),
    samples=st.lists(st.integers(-32768, 32767), min_size=0, max_size=64),
)
def test_wav_decode_roundtrip_property(rate, channels, samples):
    from nyc_taxi_data_warehouse_spark.multimodal.binaryops import (
        decode_wav_samples,
    )

    wav = _wav_pcm16_bytes(rate, channels, samples)
    dec = decode_wav_samples(wav)
    assert dec is not None
    got_rate, got_ch, got = dec
    assert (got_rate, got_ch) == (rate, channels)
    assert list(got) == samples


@settings(max_examples=40, deadline=None)
@given(junk=st.binary(min_size=0, max_size=200))
def test_decoders_never_crash_on_garbage(junk):
    """Arbitrary bytes (including truncated magic prefixes) must yield
    None, never an exception — a corrupt corpus cannot kill an executor."""
    from nyc_taxi_data_warehouse_spark.multimodal.binaryops import (
        decode_png_pixels,
        decode_wav_samples,
        parse_jpeg_header,
        parse_mp4_header,
        parse_png_header,
        parse_wav_header,
    )

    for prefix in (b"", b"\x89PNG\r\n\x1a\n", b"RIFF", b"\xff\xd8", b"\x00\x00\x00\x10ftyp"):
        payload = prefix + junk
        for fn in (
            decode_png_pixels,
            decode_wav_samples,
            parse_jpeg_header,
            parse_mp4_header,
            parse_png_header,
            parse_wav_header,
        ):
            fn(payload)  # may return None/tuple; must not raise


def _mk_bmp(width, height, pixels_rgb, bpp=24, top_down=False, palette=None):
    """Independent test encoder: rows padded to 4 bytes, B,G,R(,A)
    order, bottom-up unless top_down. pixels_rgb is row-major top-down
    [(r,g,b[,a])...]."""
    import struct

    if palette is not None:
        bytes_px = 1
    else:
        bytes_px = bpp // 8
    stride = (width * bytes_px + 3) & ~3
    pal_bytes = b""
    n_pal = 0
    if palette is not None:
        n_pal = len(palette)
        pal_bytes = b"".join(
            bytes((b, g, r, 0)) for (r, g, b) in palette
        )
    data_off = 14 + 40 + len(pal_bytes)
    rows = []
    for y in range(height):
        src_y = y if top_down else height - 1 - y
        row = bytearray()
        for x in range(width):
            px = pixels_rgb[src_y * width + x]
            if palette is not None:
                row.append(px)  # already an index
            elif bpp == 32:
                r, g, b, a = px
                row += bytes((b, g, r, a))
            else:
                r, g, b = px
                row += bytes((b, g, r))
        row += b"\x00" * (stride - len(row))
        rows.append(bytes(row))
    data = b"".join(rows)
    hdr = b"BM" + struct.pack(
        "<IHHI", data_off + len(data), 0, 0, data_off
    ) + struct.pack(
        "<iiiHHIIiiII",
        40,
        width,
        -height if top_down else height,
        1,
        8 if palette is not None else bpp,
        0,
        len(data),
        2835,
        2835,
        n_pal,
        0,
    )
    return hdr + pal_bytes + data


def test_bmp_decode_all_variants():
    from nyc_taxi_data_warehouse_spark.multimodal.binaryops import (
        decode_bmp_pixels,
    )

    px = [(10, 20, 30), (40, 50, 60), (70, 80, 90),
          (1, 2, 3), (4, 5, 6), (7, 8, 9)]
    for top_down in (False, True):
        got = decode_bmp_pixels(_mk_bmp(3, 2, px, top_down=top_down))
        assert got is not None
        w, h, c, out = got
        assert (w, h, c) == (3, 2, 3)
        assert list(out) == [v for p in px for v in p]
    # 32-bit: the reserved 4th byte (zeroed by most writers, NOT alpha
    # under BI_RGB) must be skipped, not surfaced as a channel
    px4 = [(10, 20, 30, 0), (40, 50, 60, 0)]
    w, h, c, out = decode_bmp_pixels(_mk_bmp(2, 1, px4, bpp=32))
    assert (w, h, c) == (2, 1, 3)
    assert list(out) == [v for p in px4 for v in p[:3]]
    # 8-bit paletted
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
    idx = [0, 1, 2, 2, 1, 0]
    w, h, c, out = decode_bmp_pixels(_mk_bmp(3, 2, idx, palette=pal))
    assert (w, h, c) == (3, 2, 3)
    assert list(out) == [v for i in idx for v in pal[i]]
    # out-of-coverage and malformed: None, never an exception
    good = _mk_bmp(3, 2, px)
    assert decode_bmp_pixels(good[:30]) is None  # truncated
    rle = bytearray(good)
    rle[30] = 1  # BI_RLE8 compression
    assert decode_bmp_pixels(bytes(rle)) is None
    assert decode_bmp_pixels(b"NotABmpAtAll" * 10) is None


def test_bmp_flows_through_pixel_stats(spark):
    import statistics

    from nyc_taxi_data_warehouse_spark.multimodal.binaryops import (
        extract_pixel_stats,
    )

    px = [(0, 0, 0), (255, 255, 255), (10, 200, 30), (90, 14, 250)]
    payload = _mk_bmp(2, 2, px)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    rows = extract_pixel_stats(df).collect()
    assert len(rows) == 1
    r = rows[0]
    flat = [v for p in px for v in p]
    assert (r["width"], r["height"], r["channels"]) == (2, 2, 3)
    assert abs(r["mean_px"] - sum(flat) / len(flat)) < 1e-3
    assert abs(r["std_px"] - statistics.pstdev(flat)) < 1e-3
