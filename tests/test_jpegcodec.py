"""Baseline JPEG codec (multimodal/jpegcodec.py): encoder↔decoder
round-trips within quantization error, plus the Spark integration.

The encoder exists to validate the decoder without a reference codec:
forward DCT vs inverse DCT, bit writer vs bit reader, run-length build
vs parse are independent implementations, and the encoder's flat 8-bit
Huffman tables force the decoder through its generic DHT machinery.
"""

from __future__ import annotations

import numpy as np
import pytest

from nyc_taxi_data_warehouse_spark.multimodal.binaryops import parse_jpeg_header
from nyc_taxi_data_warehouse_spark.multimodal.jpegcodec import (
    decode_jpeg_pixels,
    encode_jpeg_baseline,
)


def _roundtrip(img: np.ndarray, subsample: bool = False):
    h, w, c = img.shape
    enc = encode_jpeg_baseline(img.tobytes(), w, h, c, subsample=subsample)
    dec = decode_jpeg_pixels(enc)
    assert dec is not None
    dw, dh, dc, px = dec
    assert (dw, dh, dc) == (w, h, c)
    out = np.frombuffer(px, dtype=np.uint8).reshape(h, w, c).astype(float)
    return enc, out


CASES = [
    ("solid-gray", np.full((16, 24, 1), 130, np.uint8), False, 1.0),
    ("solid-rgb", np.tile(np.array([200, 60, 30], np.uint8), (16, 16, 1)), False, 1.0),
    ("solid-420", np.tile(np.array([90, 140, 220], np.uint8), (20, 36, 1)), True, 1.0),
]


@pytest.mark.parametrize("name,img,sub,tol", CASES, ids=[c[0] for c in CASES])
def test_roundtrip_flat_images_near_exact(name, img, sub, tol):
    """Flat blocks are DC-only — reconstruction error is bounded by the
    DC quantization step alone."""
    _, out = _roundtrip(img, subsample=sub)
    assert np.abs(out - img.astype(float)).mean() < tol


def test_roundtrip_gradient_and_odd_dims():
    gx = np.linspace(0, 255, 32).astype(np.uint8)
    grad = np.stack([np.tile(gx, (24, 1))] * 3, axis=-1)
    for sub in (False, True):
        _, out = _roundtrip(grad, subsample=sub)
        assert np.abs(out - grad.astype(float)).mean() < 2.0
    # odd, non-multiple-of-8 (and of 16 under 4:2:0) dimensions
    rng = np.random.RandomState(0)
    noise = rng.randint(0, 256, (17, 13, 3)).astype(np.uint8)
    _, out = _roundtrip(noise)
    # high-frequency noise is exactly what Annex-K quantization crushes;
    # the mean must still survive
    assert abs(out.mean() - noise.astype(float).mean()) < 6.0
    _, out420 = _roundtrip(noise, subsample=True)
    assert abs(out420.mean() - noise.astype(float).mean()) < 8.0


def test_encoded_stream_header_parses():
    """The existing stdlib SOF header parser reads our encoder's output
    — two independent implementations agreeing on the container."""
    img = np.full((12, 34, 3), 77, np.uint8)
    enc, _ = _roundtrip(img)
    assert parse_jpeg_header(enc) == (34, 12)


def test_decoder_rejects_what_it_does_not_cover():
    assert decode_jpeg_pixels(b"") is None
    assert decode_jpeg_pixels(b"\x00" * 64) is None
    img = np.full((8, 8, 1), 10, np.uint8)
    enc = encode_jpeg_baseline(img.tobytes(), 8, 8, 1)
    # flip SOF0 (FFC0) to lossless SOF3 (FFC3): must refuse, not garble
    lossless = enc.replace(b"\xff\xc0", b"\xff\xc3", 1)
    assert decode_jpeg_pixels(lossless) is None
    # truncated entropy data: must never raise — either None or a
    # zero-padded partial image (the spec's marker-stops-the-scan rule)
    res = decode_jpeg_pixels(enc[: len(enc) // 2])
    assert res is None or (res[0], res[1], res[2]) == (8, 8, 1)


def test_extract_pixel_stats_decodes_jpegs(spark):
    """Spark integration: JPEG payloads flow through the same
    mapInPandas stats extractor as PNGs, with exact dims and means
    within quantization error of the source pixels."""
    from nyc_taxi_data_warehouse_spark.multimodal.binaryops import (
        extract_pixel_stats,
    )

    imgs = {
        1: np.full((16, 24, 1), 130, np.uint8),
        2: np.tile(np.array([200, 60, 30], np.uint8), (16, 16, 1)),
        3: np.tile(np.array([90, 140, 220], np.uint8), (20, 36, 1)),
    }
    rows = []
    for mid, img in imgs.items():
        h, w, c = img.shape
        rows.append(
            (mid, bytearray(encode_jpeg_baseline(img.tobytes(), w, h, c, subsample=mid == 3)))
        )
    rows.append((99, bytearray(b"not an image at all")))
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in extract_pixel_stats(media).collect()}
    assert set(got) == set(imgs)
    for mid, img in imgs.items():
        h, w, c = img.shape
        r = got[mid]
        assert (r["width"], r["height"], r["channels"]) == (w, h, c)
        assert abs(r["mean_px"] - float(img.astype(float).mean())) < 1.0


def test_mjpeg_avi_demux_and_frame_sampling(spark):
    """Real video frame sampling end-to-end: six solid-color JPEG
    frames muxed into an AVI, every 2nd frame demuxed + fully decoded;
    each sampled row carries the true dimensions and that frame's mean
    within quantization error."""
    from nyc_taxi_data_warehouse_spark.multimodal.mjpeg import (
        demux_mjpeg_frames,
        mux_mjpeg_avi,
        sample_video_frames,
    )

    levels = [20, 60, 100, 140, 180, 220]
    frames = [
        encode_jpeg_baseline(
            np.full((16, 24, 1), lvl, np.uint8).tobytes(), 24, 16, 1
        )
        for lvl in levels
    ]
    avi = mux_mjpeg_avi(frames, fps=10)

    assert demux_mjpeg_frames(avi) == frames  # byte-exact round trip
    assert demux_mjpeg_frames(b"RIFFxxxxWAVE") is None
    assert demux_mjpeg_frames(b"junk") is None

    media = spark.createDataFrame(
        [(7, bytearray(avi)), (8, bytearray(b"not a video"))],
        "media_id long, payload binary",
    )
    got = sample_video_frames(media, every_n=2).collect()
    assert {r.media_id for r in got} == {7}
    assert sorted(r.frame_idx for r in got) == [0, 2, 4]
    for r in got:
        assert (r.width, r.height, r.channels, r.n_frames) == (24, 16, 1, 6)
        assert abs(r.mean_px - levels[r.frame_idx]) < 1.0


PROG_CASES = [
    # big solid: 48 empty-AC luma blocks -> exercises EOBn runs (r>0)
    ("solid-big", np.full((48, 64, 1), 130, np.uint8), False),
    ("rgb", np.tile(np.array([200, 60, 30], np.uint8), (32, 40, 1)), False),
    (
        "grad-420",
        np.stack(
            [np.tile(np.linspace(0, 255, 32).astype(np.uint8), (24, 1))] * 3,
            axis=-1,
        ),
        True,
    ),
    (
        "noise-odd-420",
        np.random.RandomState(1).randint(0, 256, (19, 21, 3)).astype(np.uint8),
        True,
    ),
]


@pytest.mark.parametrize(
    "name,img,sub", PROG_CASES, ids=[c[0] for c in PROG_CASES]
)
def test_progressive_decodes_identical_to_baseline(name, img, sub):
    """The progressive encoding (DC successive approximation + per-
    component spectral-selection AC scans with EOB-run aggregation)
    carries the same quantized coefficients as the baseline encoding —
    so the two decodes must be BIT-IDENTICAL, which validates the
    multi-scan accumulation, the DC refinement bits, the non-
    interleaved AC geometry, and the EOBRUN path in one assertion."""
    from nyc_taxi_data_warehouse_spark.multimodal.jpegcodec import (
        encode_jpeg_progressive,
    )

    h, w, c = img.shape
    base = decode_jpeg_pixels(encode_jpeg_baseline(img.tobytes(), w, h, c, subsample=sub))
    prog_bytes = encode_jpeg_progressive(img.tobytes(), w, h, c, subsample=sub)
    prog = decode_jpeg_pixels(prog_bytes)
    assert prog is not None and base is not None
    assert prog[:3] == (w, h, c)
    assert prog[3] == base[3]
    # and the container really is SOF2
    assert b"\xff\xc2" in prog_bytes and b"\xff\xc0" not in prog_bytes


def test_progressive_ac_refinement_roundtrips_bit_identical():
    """FULL successive approximation: each component's AC band arrives
    as a coarse Al=1 scan plus a correction-bit refinement scan
    (newly-significant ±1 placements, buffered correction bits after
    their covering symbol or EOB run — libjpeg's two-buffer order).
    Both encodings carry the same coefficients, so the refined decode
    must equal the baseline decode bit-for-bit — fuzzed across sizes,
    channel counts, and 4:2:0."""
    from nyc_taxi_data_warehouse_spark.multimodal.jpegcodec import (
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(42)
    cases = [np.full((48, 64, 1), 130, np.uint8),
             (np.indices((24, 32)).sum(axis=0) % 2 * 255).astype(np.uint8)[..., None]]
    for _ in range(15):
        hh, ww = rng.randint(8, 40), rng.randint(8, 40)
        cc = int(rng.choice([1, 3]))
        cases.append(rng.randint(0, 256, (hh, ww, cc)).astype(np.uint8))
    for img in cases:
        h, w, c = img.shape
        sub = bool(rng.randint(2)) and c == 3
        base = decode_jpeg_pixels(
            encode_jpeg_baseline(img.tobytes(), w, h, c, subsample=sub)
        )
        prog = decode_jpeg_pixels(
            encode_jpeg_progressive(
                img.tobytes(), w, h, c, subsample=sub, ac_successive=True
            )
        )
        assert prog is not None and base is not None
        assert prog[3] == base[3]


def test_restart_markers_roundtrip_bit_identical():
    """DRI + RSTn every N MCUs (byte-aligned, DC predictors reset) must
    decode to exactly the no-restart encoding's pixels — round-trip
    coverage for the decoder's restart resync path, fuzzed over
    interval lengths, sizes, and 4:2:0."""
    rng = np.random.RandomState(7)
    for _ in range(12):
        hh, ww = rng.randint(8, 48), rng.randint(8, 48)
        cc = int(rng.choice([1, 3]))
        sub = bool(rng.randint(2)) and cc == 3
        ri = int(rng.choice([1, 2, 3, 5]))
        img = rng.randint(0, 256, (hh, ww, cc)).astype(np.uint8)
        plain = decode_jpeg_pixels(
            encode_jpeg_baseline(img.tobytes(), ww, hh, cc, subsample=sub)
        )
        rst_bytes = encode_jpeg_baseline(
            img.tobytes(), ww, hh, cc, subsample=sub, restart_interval=ri
        )
        rst = decode_jpeg_pixels(rst_bytes)
        assert plain is not None and rst is not None
        assert plain[3] == rst[3]
    # the stream genuinely contains restart machinery
    assert b"\xff\xdd" in rst_bytes  # DRI
    assert any(bytes([0xFF, 0xD0 + i]) in rst_bytes for i in range(8))
