"""Baseline JPEG (SOF0) codec in pure stdlib + numpy.

The sandbox ships no image libraries, but nothing in baseline JPEG
needs one: the entropy layer is Huffman over run-length symbols, the
transform is an 8x8 DCT (a fixed matrix product in numpy), and the
color model is a linear YCbCr. This module implements

- ``decode_jpeg_pixels(payload)`` — a GENERAL baseline decoder:
  arbitrary DQT/DHT tables, grayscale or YCbCr, any sampling factors
  (4:4:4, 4:2:2, 4:2:0), restart markers, byte stuffing. Returns
  ``(width, height, channels, pixels_bytes)`` like the PNG decoder, or
  None for payloads it does not cover (progressive SOF2, 12-bit,
  arithmetic coding).
- ``encode_jpeg_baseline(pixels, w, h, c)`` — a minimal but spec-valid
  encoder used to VALIDATE the decoder without a reference codec: it
  shares only the constant tables with the decoder (quant matrices,
  zigzag order); the forward DCT vs inverse DCT, bit writer vs bit
  reader, and run-length build vs parse are independent
  implementations, so a round-trip agreeing within quantization error
  is real evidence, not self-confirmation. Its Huffman tables are
  flat 8-bit canonical codes — unusual but valid per the spec (any
  prefix code with lengths <= 16 and the all-ones code unused), which
  keeps the encoder honest AND forces the decoder through its generic
  DHT machinery rather than hard-coded standard tables.

Throughput note: the entropy loop is per-symbol Python — the same
contract as the PNG unfilter loop (`binaryops.decode_png_pixels`):
fine for thumbnail/feature extraction inside an Arrow batch; swap in a
native codec on clusters that have one. The Spark-side plumbing
(`extract_pixel_stats`) is identical either way.
"""

from __future__ import annotations

import struct

import numpy as np

# Annex-K-style quantization tables (embedded in the stream via DQT, so
# any tables would round-trip; these make realistic files).
QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)
QUANT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int32)

# zigzag scan order, generated rather than transcribed: diagonal s runs
# bottom-left->top-right when s is even, top-left->bottom-right when odd
ZIGZAG = [
    (r, s - r)
    for s in range(15)
    for r in sorted(range(max(0, s - 7), min(8, s + 1)), reverse=(s % 2 == 0))
]

# orthonormal DCT-II basis: spatial = M.T @ coefs @ M, coefs = M @ spatial @ M.T
_M = np.array([
    [
        (np.sqrt(0.5) if u == 0 else 1.0) / 2.0 * np.cos((2 * i + 1) * u * np.pi / 16)
        for i in range(8)
    ]
    for u in range(8)
])


def _fdct(block: np.ndarray) -> np.ndarray:
    return _M @ block @ _M.T


def _idct(coefs: np.ndarray) -> np.ndarray:
    return _M.T @ coefs @ _M


def _extend(v: int, t: int) -> int:
    """JPEG magnitude decode: t-bit value v -> signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing.
    Stops at any real marker (0xFF followed by non-zero, non-RST)."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> bool:
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller via sync()
                return False
            else:
                return False
        else:
            self.pos += 1
        self.bits = (self.bits << 8) | b
        self.nbits += 8
        return True

    def read(self, n: int) -> int:
        while self.nbits < n:
            if not self._fill():
                # marker reached: pad with zero bits (spec: scan ends)
                self.bits <<= 8
                self.nbits += 8
        self.nbits -= n
        out = (self.bits >> self.nbits) & ((1 << n) - 1)
        self.bits &= (1 << self.nbits) - 1
        return out

    def sync_restart(self) -> None:
        """Consume an RSTn marker and realign to the next byte."""
        self.bits = 0
        self.nbits = 0
        while self.buf[self.pos] != 0xFF or not (
            0xD0 <= self.buf[self.pos + 1] <= 0xD7
        ):
            self.pos += 1
        self.pos += 2

    def decode_huff(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 17:
            code = (code << 1) | self.read(1)
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code")


def _huff_table(counts: list[int], symbols: bytes) -> dict[tuple[int, int], int]:
    """Canonical JPEG table: (length, code) -> symbol."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def decode_jpeg_pixels(payload: bytes):
    """Decode a baseline JPEG. Returns ``(w, h, channels, bytes)`` —
    channels 1 (grayscale) or 3 (RGB) — or None if not baseline JPEG."""
    try:
        return _decode(payload)
    except (IndexError, ValueError, ZeroDivisionError, struct.error, KeyError):
        return None


def _decode(p: bytes):
    if p[:2] != b"\xff\xd8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(p):
        if p[pos] != 0xFF:
            return None
        marker = p[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", p[pos + 2 : pos + 4])
        body = p[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 15
                if pq != 0:
                    return None  # 16-bit tables: not baseline-typical
                vals = np.zeros((8, 8), dtype=np.int32)
                for i, (r, c) in enumerate(ZIGZAG):
                    vals[r, c] = body[off + 1 + i]
                qt[tq] = vals
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 15
                counts = list(body[off + 1 : off + 17])
                n = sum(counts)
                symbols = bytes(body[off + 17 : off + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _huff_table(counts, symbols)
                off += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision = body[0]
            if precision != 8:
                return None
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comps = []
            for i in range(ncomp):
                cid = body[6 + 3 * i]
                hv = body[7 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": body[8 + 3 * i]}
                )
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            return None  # extended/progressive/lossless: not baseline
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                return None
            ns = body[0]
            scan = []
            for i in range(ns):
                cid = body[1 + 2 * i]
                tbl = body[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cid)
                scan.append((comp, tbl >> 4, tbl & 15))
            data_start = pos + 2 + seglen
            return _decode_scan(
                p, data_start, frame, scan, qt, huff_dc, huff_ac, restart_interval
            )
        elif marker == 0xD9:  # EOI before SOS
            return None
        pos += 2 + seglen
    return None


def _decode_scan(p, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    w, h = frame["w"], frame["h"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        for c in comps
    }
    reader = _BitReader(p, pos)
    dc_pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.sync_restart()
                dc_pred = {c["id"]: 0 for c in comps}
            for comp, td, ta in scan:
                q = qt[comp["tq"]]
                for v in range(comp["v"]):
                    for hh in range(comp["h"]):
                        coefs = np.zeros((8, 8), dtype=np.float64)
                        t = reader.decode_huff(huff_dc[td])
                        diff = _extend(reader.read(t), t) if t else 0
                        dc_pred[comp["id"]] += diff
                        coefs[0, 0] = dc_pred[comp["id"]] * q[0, 0]
                        k = 1
                        while k < 64:
                            rs = reader.decode_huff(huff_ac[ta])
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            rr, cc = ZIGZAG[k]
                            coefs[rr, cc] = _extend(reader.read(s), s) * q[rr, cc]
                            k += 1
                        block = _idct(coefs) + 128.0
                        y0 = (my * comp["v"] + v) * 8
                        x0 = (mx * comp["h"] + hh) * 8
                        planes[comp["id"]][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1

    # upsample to full resolution and crop
    full = []
    for c in comps:
        plane = planes[c["id"]]
        if c["h"] != hmax or c["v"] != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        full.append(plane[:h, :w])
    if len(full) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return (w, h, 1, out.tobytes())
    if len(full) != 3:
        return None
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return (w, h, 3, out.tobytes())


# ---------------------------------------------------------------------------
# encoder (validation-grade)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nacc += nbits
        while self.nacc >= 8:
            self.nacc -= 8
            b = (self.acc >> self.nacc) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.acc &= (1 << self.nacc) - 1

    def flush(self) -> None:
        if self.nacc:
            pad = 8 - self.nacc
            self.write((1 << pad) - 1, pad)


def _flat_tables(symbols: list[int]):
    """A valid JPEG Huffman table giving every symbol an 8-bit code
    (fine while len(symbols) < 255 — the all-ones code stays unused).
    Returns (counts16, symbol_bytes, {symbol: (code, 8)})."""
    symbols = sorted(set(symbols))
    assert len(symbols) < 255
    counts = [0] * 16
    counts[7] = len(symbols)  # all codes length 8
    enc = {s: (i, 8) for i, s in enumerate(symbols)}
    return counts, bytes(symbols), enc


def _mag_bits(v: int):
    """(category, value-bits) for a DC diff / AC coefficient."""
    t = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << t) - 1
    return t, bits


def encode_jpeg_baseline(
    pixels: bytes, w: int, h: int, channels: int, subsample: bool = False
) -> bytes:
    """Encode 8-bit pixels (row-major, interleaved; channels 1 or 3) as
    a baseline JPEG. ``subsample`` turns on 4:2:0 chroma. Huffman
    tables are per-image flat 8-bit codes (see ``_flat_tables``)."""
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, channels).astype(
        np.float64
    )
    if channels == 3:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
        sampling = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1), (1, 1), (1, 1)]
        qtabs = [0, 1, 1]
    elif channels == 1:
        planes = [img[..., 0]]
        sampling = [(1, 1)]
        qtabs = [0]
    else:
        raise ValueError("channels must be 1 or 3")

    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # downsample chroma (2x2 mean) and pad every plane to its MCU grid
    prepped = []
    for plane, (sh, sv) in zip(planes, sampling):
        if (sh, sv) != (hmax, vmax):
            fy, fx = vmax // sv, hmax // sh
            py = -(-plane.shape[0] // fy) * fy
            px = -(-plane.shape[1] // fx) * fx
            padded = np.pad(
                plane, ((0, py - plane.shape[0]), (0, px - plane.shape[1])),
                mode="edge",
            )
            plane = padded.reshape(py // fy, fy, px // fx, fx).mean(axis=(1, 3))
        th, tw = mcuy * sv * 8, mcux * sh * 8
        plane = np.pad(
            plane, ((0, th - plane.shape[0]), (0, tw - plane.shape[1])), mode="edge"
        )
        prepped.append(plane)

    quant = [QUANT_LUMA, QUANT_CHROMA]

    # pass 1: quantized coefficients per (comp, mcu, block)
    all_blocks: list[list[list[np.ndarray]]] = [[] for _ in planes]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (plane, (sh, sv)) in enumerate(zip(prepped, sampling)):
                blocks = []
                q = quant[qtabs[ci]]
                for v in range(sv):
                    for hh in range(sh):
                        y0 = (my * sv + v) * 8
                        x0 = (mx * sh + hh) * 8
                        block = plane[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        coefs = np.round(_fdct(block) / q).astype(np.int64)
                        blocks.append(coefs)
                all_blocks[ci].append(blocks)

    # pass 2: collect the symbols each component actually emits
    def block_symbols(coefs, dc_prev):
        dc = int(coefs[0, 0])
        t, _ = _mag_bits(dc - dc_prev)
        dcs = [t]
        acs = []
        zz = [int(coefs[r, c]) for r, c in ZIGZAG]
        run = 0
        for k in range(1, 64):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                acs.append(0xF0)
                run -= 16
            s, _ = _mag_bits(zz[k])
            acs.append((run << 4) | s)
            run = 0
        if run:
            acs.append(0x00)  # EOB
        elif not acs or True:
            pass
        # always terminate with EOB unless the last coef was at k=63
        if zz[63] == 0:
            if not acs or acs[-1] != 0x00:
                acs.append(0x00)
        return dc, dcs, acs

    n_tables = 1 if channels == 1 else 2
    dc_syms: list[list[int]] = [[] for _ in range(n_tables)]
    ac_syms: list[list[int]] = [[0x00] for _ in range(n_tables)]  # EOB always in
    dc_prev = [0] * len(planes)
    for ci in range(len(planes)):
        tbl = 0 if ci == 0 else 1
        prev = 0
        for blocks in all_blocks[ci]:
            for coefs in blocks:
                dc, dcs, acs = block_symbols(coefs, prev)
                prev = dc
                dc_syms[tbl].extend(dcs)
                ac_syms[tbl].extend(a for a in acs)
    dc_tabs = [_flat_tables(s or [0]) for s in dc_syms]
    ac_tabs = [_flat_tables(s) for s in ac_syms]

    # emit segments
    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes):
        out.extend(b"\xff" + bytes([marker]) + struct.pack(">H", len(body) + 2) + body)

    for tq, q in enumerate(quant[: len(set(qtabs))]):
        zz = bytes(q[r, c] for r, c in ZIGZAG)
        seg(0xDB, bytes([tq]) + zz)
    compspec = b"".join(
        bytes([ci + 1, (sh << 4) | sv, qtabs[ci]])
        for ci, (sh, sv) in enumerate(sampling)
    )
    seg(0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([len(planes)]) + compspec)
    for tbl in range(n_tables):
        counts, symbols, _ = dc_tabs[tbl]
        seg(0xC4, bytes([tbl]) + bytes(counts) + symbols)
        counts, symbols, _ = ac_tabs[tbl]
        seg(0xC4, bytes([0x10 | tbl]) + bytes(counts) + symbols)
    sos_comps = b"".join(
        bytes([ci + 1, ((0 if ci == 0 else 1) << 4) | (0 if ci == 0 else 1)])
        for ci in range(len(planes))
    )
    seg(0xDA, bytes([len(planes)]) + sos_comps + bytes([0, 63, 0]))

    # entropy-coded data
    bw = _BitWriter()
    dc_prev = [0] * len(planes)
    for my in range(mcuy):
        for mx in range(mcux):
            mcu_idx = my * mcux + mx
            for ci, (sh, sv) in enumerate(sampling):
                tbl = 0 if ci == 0 else 1
                _, _, dc_enc = dc_tabs[tbl]
                _, _, ac_enc = ac_tabs[tbl]
                for coefs in all_blocks[ci][mcu_idx]:
                    dc = int(coefs[0, 0])
                    t, bits = _mag_bits(dc - dc_prev[ci])
                    dc_prev[ci] = dc
                    code, ln = dc_enc[t]
                    bw.write(code, ln)
                    if t:
                        bw.write(bits, t)
                    zz = [int(coefs[r, c]) for r, c in ZIGZAG]
                    run = 0
                    last_nz = max(
                        (k for k in range(1, 64) if zz[k] != 0), default=0
                    )
                    for k in range(1, last_nz + 1):
                        if zz[k] == 0:
                            run += 1
                            continue
                        while run > 15:
                            code, ln = ac_enc[0xF0]
                            bw.write(code, ln)
                            run -= 16
                        s, vbits = _mag_bits(zz[k])
                        code, ln = ac_enc[(run << 4) | s]
                        bw.write(code, ln)
                        bw.write(vbits, s)
                        run = 0
                    if last_nz < 63:
                        code, ln = ac_enc[0x00]
                        bw.write(code, ln)
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)
