"""GIF codec (multimodal/gifcodec.py): LZW round-trips across width
growth and table resets, container round-trips (palettes, interlace,
transparency, disposal modes, sub-rect animation), and the Spark
frame-sampling / pixel-stats / header paths on real GIF bytes."""

from __future__ import annotations

import hashlib
import struct

import pytest
from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.multimodal.gifcodec import (
    decode_gif_frames,
    encode_gif,
    lzw_decode,
    lzw_encode,
    parse_gif_header,
    sample_gif_frames,
)

PAL = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]


def _pseudo_bytes(n: int, mod: int, seed: bytes = b"gif") -> bytes:
    out = bytearray()
    h = seed
    while len(out) < n:
        h = hashlib.sha256(h).digest()
        out += bytes(b % mod for b in h)
    return bytes(out[:n])


@pytest.mark.parametrize("mcs,mod,n", [(2, 4, 500), (8, 256, 40_000)])
def test_lzw_round_trip_with_width_growth_and_reset(mcs, mod, n):
    """40k pseudo-random 8-bit indices push the table through every
    width 9->12 and past the 4096-entry reset; both streams round-trip
    exactly."""
    data = _pseudo_bytes(n, mod)
    assert bytes(lzw_decode(lzw_encode(data, mcs), mcs)) == data


def test_lzw_run_heavy_stream_hits_kwkwk_case():
    """Long single-symbol runs exercise the code==len(table) (KwKwK)
    decoder branch."""
    data = b"\x00" * 1000 + b"\x01" + b"\x00" * 1000
    assert bytes(lzw_decode(lzw_encode(data, 2), 2)) == data


def test_static_round_trip_and_header():
    w, h = 11, 7
    idx = _pseudo_bytes(w * h, len(PAL))
    gif = encode_gif([(0, 0, idx)], PAL, w, h)
    assert parse_gif_header(gif) == (w, h)
    frames = decode_gif_frames(gif)
    assert len(frames) == 1
    fw, fh, c, px = frames[0]
    assert (fw, fh, c) == (w, h, 4)
    for i, v in enumerate(idx):
        assert tuple(px[i * 4 : i * 4 + 3]) == PAL[v]
        assert px[i * 4 + 3] == 255


def test_interlaced_frame_decodes_identically():
    w, h = 9, 13  # odd height exercises all four passes unevenly
    idx = _pseudo_bytes(w * h, len(PAL), seed=b"ilace")
    plain = decode_gif_frames(encode_gif([(0, 0, idx)], PAL, w, h))
    laced = decode_gif_frames(
        encode_gif([(0, 0, idx)], PAL, w, h, interlace_first=True)
    )
    assert plain[0] == laced[0]


def test_transparency_leaves_canvas_and_reports_alpha():
    w, h = 4, 1
    # frame 1 all red; frame 2 paints index-3 over cells 0,1 but cell 1
    # uses the transparent index -> keeps red; cells 2,3 transparent too
    gif = encode_gif(
        [(0, 0, bytes([0, 0, 0, 0])), (0, 0, bytes([3, 1, 1, 1]))],
        PAL,
        w,
        h,
        transparent=1,
    )
    frames = decode_gif_frames(gif)
    assert len(frames) == 2
    px = frames[1][3]
    assert tuple(px[0:3]) == PAL[3]
    for cell in (1, 2, 3):
        assert tuple(px[cell * 4 : cell * 4 + 3]) == PAL[0]


def test_disposal_restore_previous_subrect_animation():
    """3 frames, disposal=3: frame 2's sub-rect paints over frame 1's
    canvas, frame 3 composes onto the RESTORED frame-1 canvas."""
    w, h = 3, 2
    f1 = bytes([0] * 6)  # all red
    gif = encode_gif(
        [
            (0, 0, f1),
            (0, 0, 1, 1, bytes([2])),  # blue at (0,0)
            (2, 1, 1, 1, bytes([1])),  # green at (2,1)
        ],
        PAL,
        w,
        h,
        disposal=[1, 3, 1],  # frame 2 restores-to-previous after display
    )
    frames = decode_gif_frames(gif)
    assert len(frames) == 3
    px2 = frames[1][3]
    assert tuple(px2[0:3]) == PAL[2]  # blue painted
    px3 = frames[2][3]
    assert tuple(px3[0:3]) == PAL[0]  # (0,0) restored to red
    cell = (1 * w + 2) * 4
    assert tuple(px3[cell : cell + 3]) == PAL[1]  # green painted


def test_disposal_restore_background_clears_subrect():
    w, h = 2, 1
    gif = encode_gif(
        [(0, 0, 1, 1, bytes([0])), (1, 0, 1, 1, bytes([1]))],
        PAL,
        w,
        h,
        disposal=2,
    )
    frames = decode_gif_frames(gif)
    px2 = frames[1][3]
    assert px2[3] == 0  # frame 1's rect cleared to transparent
    assert tuple(px2[4:7]) == PAL[1] and px2[7] == 255


def test_non_gif_rejected():
    assert parse_gif_header(b"PNG......") is None
    assert decode_gif_frames(b"\x89PNG\r\n\x1a\n" + b"\x00" * 40) is None
    # truncated real header: magic but no screen descriptor
    assert parse_gif_header(b"GIF89a\x01") is None


def test_spark_gif_frame_sampling_and_pixel_stats(spark):
    w, h = 6, 4
    idxs = [
        _pseudo_bytes(w * h, len(PAL), seed=bytes([s])) for s in range(5)
    ]
    anim = encode_gif([(0, 0, i) for i in idxs], PAL, w, h)
    static = encode_gif([(0, 0, idxs[0])], PAL, w, h)
    df = spark.createDataFrame(
        [(1, anim), (2, static), (3, b"not a gif")],
        "media_id long, payload binary",
    )
    sampled = sample_gif_frames(df, every_n=2).collect()
    by_media = {}
    for r in sampled:
        by_media.setdefault(r.media_id, []).append(r)
    assert sorted(by_media) == [1, 2]
    assert [r.frame_idx for r in sorted(by_media[1], key=lambda r: r.frame_idx)] == [0, 2, 4]
    assert all(r.n_frames == 5 and r.width == w and r.height == h for r in by_media[1])
    assert all(r.opaque_frac == 1.0 for r in sampled)
    # mean over an all-opaque frame == mean of palette RGB of its indices
    want = sum(sum(PAL[v]) for v in idxs[0]) / (3 * w * h)
    got = [r for r in by_media[2]][0].mean_px
    assert abs(got - want) < 1e-3

    from nyc_taxi_data_warehouse_spark.multimodal.binaryops import (
        decode_media_batch,
        extract_pixel_stats,
    )

    media = df.withColumn("mime", F.lit("image/gif"))
    headers = {r.media_id: r for r in decode_media_batch(media, codec="header").collect()}
    assert headers[2].codec_used == "gif-header"
    assert (headers[2].width, headers[2].height) == (w, h)
    assert headers[3].codec_used == "fake"
    stats = {r.media_id: r for r in extract_pixel_stats(media).collect()}
    assert set(stats) == {1, 2}
    assert stats[2].channels == 4
    assert abs(stats[2].mean_px - (3 * want + 255) / 4) < 0.05


def test_large_palette_many_colors_round_trip():
    pal = [(i, (i * 7) % 256, (i * 13) % 256) for i in range(256)]
    w, h = 32, 32
    idx = _pseudo_bytes(w * h, 256, seed=b"big")
    frames = decode_gif_frames(encode_gif([(0, 0, idx)], pal, w, h))
    px = frames[0][3]
    for i, v in enumerate(idx):
        assert tuple(px[i * 4 : i * 4 + 3]) == pal[v]


def test_foreign_subblock_sizes_and_extensions_skipped():
    """Comment + application extensions before the image are walked
    over; an 87a header (no extensions) also decodes."""
    w, h = 3, 3
    idx = bytes([1] * 9)
    gif = bytearray(encode_gif([(0, 0, idx)], PAL, w, h))
    # splice a comment extension right after the global palette
    splice_at = 13 + 3 * 4
    comment = b"\x21\xfe\x05hello\x00"
    gif[splice_at:splice_at] = comment
    frames = decode_gif_frames(bytes(gif))
    assert frames and tuple(frames[0][3][0:3]) == PAL[1]
    plain87 = b"GIF87a" + bytes(encode_gif([(0, 0, idx)], PAL, w, h))[6:]
    assert decode_gif_frames(plain87)


def test_zero_dimension_gif_skipped_not_crashed(spark):
    """A crafted GIF with a 0x0 logical screen must not raise
    ZeroDivisionError inside the Spark task (ADVICE r4) — its frames
    are skipped; valid payloads in the same batch still decode."""
    w, h = 4, 2
    good = encode_gif([(0, 0, _pseudo_bytes(w * h, len(PAL)))], PAL, w, h)
    zero = encode_gif([(0, 0, b"")], PAL, 0, 0)
    assert parse_gif_header(zero) == (0, 0)
    df = spark.createDataFrame(
        [(1, good), (2, zero)], "media_id long, payload binary"
    )
    rows = sample_gif_frames(df, every_n=1).collect()
    assert sorted({r.media_id for r in rows}) == [1]
    assert all(r.width * r.height > 0 for r in rows)
