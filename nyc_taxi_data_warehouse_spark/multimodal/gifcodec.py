"""REAL GIF decode with the stdlib only — LZW, palettes, animation.

GIF's whole compression layer is LZW with variable code widths, which is
~60 lines of plain Python; everything else is fixed-layout block
walking. That puts GIF (87a and 89a, static and animated, interlaced or
not, with transparency) in the same bucket as PNG/WAV/JPEG/MJPEG-AVI:
fully decodable here without external libraries. Like ``jpegcodec``,
the decoder is validated by round-trip against its own INDEPENDENT
encoder (separate LZW implementation, separate bit-packing direction of
reasoning), so a shared-bug pass is structurally unlikely.

Coverage: 8-bit-max color tables (all GIFs), global and local palettes,
interlaced images (4-pass row order), Graphic Control transparency, and
the three concrete frame-disposal modes (1 leave, 2 restore-background,
3 restore-previous; 0 treated as 1 per the spec's "no action"). Frames
compose onto the logical screen, so every emitted frame is a full
canvas in RGBA — what a feature extractor wants — not a raw sub-rect.
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


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


def lzw_decode(data: bytes, min_code_size: int) -> bytearray | None:
    """GIF-flavor LZW: LSB-first bit stream, clear/EOI codes, widths
    grow from min+1 to 12 bits. Returns the index stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return out  # truncated streams: emit what we have
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if code < len(table) and (code < clear or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            return None  # corrupt
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Independent GIF LZW encoder (test/validation fixture for the
    decoder's round-trip): dict of byte-runs -> code, emit LSB-first,
    clear-code reset at the 4096-entry cap."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == 1 << width:
            if width < 12:
                width += 1
            else:
                emit(clear, width)
                table = {bytes([i]): i for i in range(clear)}
                next_code = eoi + 1
                width = min_code_size + 1
        run = bytes([b])
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: list[bytes], height: int) -> list[bytes]:
    ordered: list[bytes] = [b""] * height
    i = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, height, step):
            ordered[y] = rows[i]
            i += 1
    return ordered


def parse_gif_header(payload: bytes) -> tuple[int, int] | None:
    """(width, height) of the logical screen, or None if not a GIF."""
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", payload[6:10])
    return (w, h)


def decode_gif_frames(payload: bytes, max_frames: int | None = None):
    """Fully-composed RGBA frames of a GIF: list of ``(width, height,
    4, pixels)`` over the LOGICAL SCREEN (disposal methods applied
    between frames), or None if the payload is not a decodable GIF.
    ``pixels`` is a bytearray, row-major RGBA."""
    hdr = parse_gif_header(payload)
    if hdr is None:
        return None
    width, height = hdr
    flags = payload[10]
    bg_index = payload[11]
    off = 13
    global_pal: list[tuple[int, int, int]] | None = None
    if flags & 0x80:
        gct_size = 2 << (flags & 0x07)
        raw = payload[off : off + 3 * gct_size]
        if len(raw) < 3 * gct_size:
            return None
        global_pal = [tuple(raw[i : i + 3]) for i in range(0, len(raw), 3)]
        off += 3 * gct_size

    canvas = bytearray(width * height * 4)  # transparent screen
    frames: list[tuple[int, int, int, bytearray]] = []
    transparent: int | None = None
    disposal = 0
    n = len(payload)

    def read_subblocks(o: int) -> tuple[bytearray, int]:
        buf = bytearray()
        while o < n:
            size = payload[o]
            o += 1
            if size == 0:
                break
            buf += payload[o : o + size]
            o += size
        return buf, o

    while off < n:
        marker = payload[off]
        off += 1
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension
            label = payload[off]
            off += 1
            if label == 0xF9:  # Graphic Control
                block, off = read_subblocks(off)
                if len(block) >= 4:
                    gflags = block[0]
                    disposal = (gflags >> 2) & 0x07
                    transparent = block[3] if gflags & 0x01 else None
            else:  # comment / app / plain text: skip
                _, off = read_subblocks(off)
            continue
        if marker != 0x2C:  # image descriptor is all that's left
            return None
        if off + 9 > n:
            return None
        left, top, fw, fh = struct.unpack("<4H", payload[off : off + 8])
        iflags = payload[off + 8]
        off += 9
        pal = global_pal
        if iflags & 0x80:
            lct_size = 2 << (iflags & 0x07)
            raw = payload[off : off + 3 * lct_size]
            if len(raw) < 3 * lct_size:
                return None
            pal = [tuple(raw[i : i + 3]) for i in range(0, len(raw), 3)]
            off += 3 * lct_size
        if pal is None:
            return None
        if off >= n:
            return None
        min_code_size = payload[off]
        off += 1
        data, off = read_subblocks(off)
        indices = lzw_decode(bytes(data), min_code_size)
        if indices is None or len(indices) < fw * fh:
            return None
        rows = [bytes(indices[y * fw : (y + 1) * fw]) for y in range(fh)]
        if iflags & 0x40:
            rows = _deinterlace(rows, fh)

        saved = bytes(canvas) if disposal == 3 else None
        for y in range(fh):
            cy = top + y
            if cy >= height:
                break
            row = rows[y]
            base = (cy * width + left) * 4
            for x in range(min(fw, width - left)):
                idx = row[x]
                if idx == transparent:
                    continue
                if idx >= len(pal):
                    return None
                r, g, b = pal[idx]
                o4 = base + x * 4
                canvas[o4 : o4 + 4] = bytes((r, g, b, 255))
        frames.append((width, height, 4, bytearray(canvas)))
        if max_frames is not None and len(frames) >= max_frames:
            return frames

        if disposal == 2:  # restore background: spec-wise the bg color,
            # but every modern renderer clears to transparent — do that.
            for y in range(fh):
                cy = top + y
                if cy >= height:
                    break
                base = (cy * width + left) * 4
                for x in range(min(fw, width - left)):
                    o4 = base + x * 4
                    canvas[o4 : o4 + 4] = b"\x00\x00\x00\x00"
        elif disposal == 3 and saved is not None:
            canvas = bytearray(saved)
        disposal = 0
        transparent = None
    _ = bg_index  # parsed for completeness; composition uses transparent
    return frames if frames else None


def encode_gif(
    frames: list[tuple[int, int, bytes]],
    palette: list[tuple[int, int, int]],
    width: int,
    height: int,
    transparent: int | None = None,
    disposal: int | list[int] = 1,
    interlace_first: bool = False,
) -> bytes:
    """Minimal spec-shaped GIF89a writer (validation fixture for the
    decoder's independent round-trip). Each frame is either a
    ``(left, top, indices)`` 3-tuple covering the full logical screen
    (``len(indices) == width*height``) or a sub-rect
    ``(left, top, fw, fh, indices)`` 5-tuple. One global palette;
    ``interlace_first`` writes frame 0 in 4-pass interlaced row
    order."""
    pal_bits = 1
    while (1 << pal_bits) < len(palette):
        pal_bits += 1
    pal_size = 1 << pal_bits
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | (pal_bits - 1), 0, 0])
    for i in range(pal_size):
        out += bytes(palette[i]) if i < len(palette) else b"\x00\x00\x00"
    for fi, frame in enumerate(frames):
        if len(frame) == 3:
            left, top, idx = frame
            fw, fh = width, height
        else:
            left, top, fw, fh, idx = frame
        assert len(idx) == fw * fh
        disp = disposal[fi] if isinstance(disposal, list) else disposal
        gflags = (disp & 0x07) << 2
        tindex = 0
        if transparent is not None:
            gflags |= 0x01
            tindex = transparent
        out += bytes([0x21, 0xF9, 4, gflags, 0, 0, tindex, 0])
        ilace = interlace_first and fi == 0
        out += b"\x2c" + struct.pack("<4H", left, top, fw, fh)
        out += bytes([0x40 if ilace else 0x00])
        if ilace:
            order = [
                y
                for start, step in _INTERLACE_PASSES
                for y in range(start, fh, step)
            ]
            idx = b"".join(idx[y * fw : (y + 1) * fw] for y in order)
        mcs = max(2, pal_bits)
        out += bytes([mcs])
        comp = lzw_encode(bytes(idx), mcs)
        for o in range(0, len(comp), 255):
            chunk = comp[o : o + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


GIF_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("opaque_frac", DoubleType()),
        StructField("mean_px", DoubleType()),
    ]
)


def sample_gif_frames(df: DataFrame, every_n: int = 2) -> DataFrame:
    """One row per SAMPLED, DECODED, fully-composed frame of each
    animated-GIF payload — the GIF sibling of ``mjpeg.
    sample_video_frames``: real dimensions, opaque-pixel fraction (GIF
    frames can be partially transparent canvases) and RGB mean over the
    opaque pixels. Non-GIF payloads are dropped; payload bytes and
    pixels never leave the Arrow batch."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                frames = decode_gif_frames(p or b"")
                if not frames:
                    continue
                for i in range(0, len(frames), every_n):
                    w, h, _c, px = frames[i]
                    if w * h == 0:
                        # crafted/malformed GIF with a zero-dimension
                        # logical screen — skip rather than fail the
                        # whole Spark task on an untrusted payload
                        continue
                    alphas = px[3::4]
                    opaque = sum(1 for a in alphas if a)
                    rgb_sum = 0
                    for o in range(0, len(px), 4):
                        if px[o + 3]:
                            rgb_sum += px[o] + px[o + 1] + px[o + 2]
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": i,
                            "n_frames": len(frames),
                            "width": w,
                            "height": h,
                            "opaque_frac": round(opaque / (w * h), 4),
                            "mean_px": round(rgb_sum / (3 * opaque), 4)
                            if opaque
                            else 0.0,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in GIF_FRAME_SCHEMA.fields]
            )

    return df.mapInPandas(batches, schema=GIF_FRAME_SCHEMA)
