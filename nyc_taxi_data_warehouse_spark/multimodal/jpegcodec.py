"""JPEG codec (baseline SOF0 + progressive SOF2) in pure stdlib + numpy.

The sandbox ships no image libraries, but nothing in DCT JPEG needs
one: the entropy layer is Huffman over run-length symbols, the
transform is an 8x8 DCT (a fixed matrix product in numpy), and the
color model is a linear YCbCr. This module implements

- ``decode_jpeg_pixels(payload)`` — a GENERAL decoder: arbitrary
  DQT/DHT tables, grayscale or YCbCr, any sampling factors (4:4:4,
  4:2:2, 4:2:0), restart markers, byte stuffing; baseline single-scan
  AND progressive multi-scan streams (spectral selection with EOB-run
  coding, FULL successive approximation — DC refinement bits and AC
  correction-bit refinement scans — non-interleaved AC geometry;
  coefficients accumulate across scans, one IDCT at the end). Returns
  ``(width, height, channels, pixels_bytes)`` like the PNG decoder, or
  None for payloads outside coverage (12-bit precision,
  lossless/arithmetic modes).
- ``encode_jpeg_baseline`` / ``encode_jpeg_progressive`` — minimal but
  spec-valid encoders used to VALIDATE the decoder without a reference
  codec: they share only the constant tables with the decoder (quant
  matrices, zigzag order); forward DCT vs inverse DCT, bit writer vs
  bit reader, and run-length build vs parse are independent
  implementations, so round-trip agreement is real evidence, not
  self-confirmation. The progressive encoder emits every scan kind the
  decoder covers (DC first at Al=1, DC refinement bits, per-component
  AC bands with aggregated EOBn runs, and — with ``ac_successive`` —
  AC refinement scans with libjpeg's two-buffer correction-bit
  discipline), and both encodings carry
  IDENTICAL quantized coefficients — so progressive-decode ==
  baseline-decode bit-for-bit is the validation gate. Huffman tables
  are flat 8-bit canonical codes — unusual but valid per the spec,
  which keeps the encoders honest AND forces the decoder through its
  generic DHT machinery rather than hard-coded standard tables.

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
    """Decode a baseline (SOF0) or progressive (SOF2) JPEG. Returns
    ``(w, h, channels, bytes)`` — channels 1 (grayscale) or 3 (RGB) —
    or None for streams outside coverage (12-bit precision, lossless /
    arithmetic modes). Progressive coverage is FULL: spectral selection
    with EOB runs, DC successive approximation, and AC correction-bit
    refinement scans."""
    try:
        return _decode(payload)
    except (IndexError, ValueError, ZeroDivisionError, struct.error, KeyError):
        return None


def _alloc_coefs(frame):
    """Per-component quantized-coefficient store on the MCU-padded
    block grid: comp_id -> int32[by_pad, bx_pad, 64] (zigzag index)."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    w, h = frame["w"], frame["h"]
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    store = {}
    for c in comps:
        store[c["id"]] = np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        # true (unpadded) block dims of the component, for raster scans
        comp_w = -(-(w * c["h"]) // hmax)
        comp_h = -(-(h * c["v"]) // vmax)
        c["bx"] = -(-comp_w // 8)
        c["by"] = -(-comp_h // 8)
    frame["hmax"], frame["vmax"] = hmax, vmax
    frame["mcux"], frame["mcuy"] = mcux, mcuy
    return store


def _decode(p: bytes):
    if p[:2] != b"\xff\xd8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    coefs = None
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(p):
        if p[pos] != 0xFF:
            return None
        marker = p[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
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
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
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
            frame = {"w": w, "h": h, "comps": comps, "progressive": marker == 0xC2}
            coefs = _alloc_coefs(frame)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            return None  # extended/lossless/arithmetic: out of coverage
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            ns = body[0]
            scan = []
            for i in range(ns):
                cid = body[1 + 2 * i]
                tbl = body[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cid)
                scan.append((comp, tbl >> 4, tbl & 15))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 15
            if not frame["progressive"]:
                ss, se, ah, al = 0, 63, 0, 0
            pos = _entropy_scan(
                p, pos + 2 + seglen, frame, coefs, scan,
                huff_dc, huff_ac, ss, se, ah, al, restart_interval,
            )
            continue
        pos += 2 + seglen
    if frame is None or coefs is None:
        return None
    return _reconstruct(frame, coefs, qt)


def _next_marker(p: bytes, pos: int) -> int:
    """Position of the next real marker (skips stuffed FF00 and fill
    FFs) at or after ``pos``."""
    while pos + 1 < len(p):
        if p[pos] == 0xFF and p[pos + 1] not in (0x00, 0xFF):
            return pos
        pos += 1
    return len(p)


def _entropy_scan(
    p, pos, frame, coefs, scan, huff_dc, huff_ac, ss, se, ah, al, restart_interval
):
    """Decode ONE scan's entropy data into the coefficient store and
    return the position of the marker that ends it. Handles baseline
    combined scans (ss=0, se=63), progressive DC first/refinement, and
    progressive AC first scans; AC refinement (ss>0, ah>0) is out of
    coverage."""
    reader = _BitReader(p, pos)
    dc_pred = {c["id"]: 0 for c in frame["comps"]}
    eobrun = 0

    def refine_nonzero(blk, k):
        """Read one correction bit for an already-nonzero coefficient:
        a 1-bit grows the magnitude by 2^Al toward its sign."""
        if reader.read(1) and not (abs(int(blk[k])) >> al) & 1:
            blk[k] += (1 << al) if blk[k] > 0 else -(1 << al)

    def decode_block_ac_refine(comp, ta, by, bx):
        """Progressive AC successive-approximation refinement (Ah=Al+1
        -> Al): newly-significant coefficients arrive as ±2^Al after a
        run of zero-HISTORY positions; every nonzero-history position
        crossed (or covered by an EOB run) contributes one correction
        bit, in positional order."""
        nonlocal eobrun
        blk = coefs[comp["id"]][by, bx]
        if eobrun > 0:
            for k in range(ss, se + 1):
                if blk[k] != 0:
                    refine_nonzero(blk, k)
            eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = reader.decode_huff(huff_ac[ta])
            r, t = rs >> 4, rs & 15
            if t == 0 and r < 15:  # EOBn: rest of this block is refinement-only
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.read(r)
                for kk in range(k, se + 1):
                    if blk[kk] != 0:
                        refine_nonzero(blk, kk)
                return
            if t == 0:  # ZRL: cross exactly 16 zero-history positions
                zeros_left, newval = 16, 0
            else:
                if t != 1:
                    raise ValueError("refinement scan magnitude must be 1")
                sign = reader.read(1)
                zeros_left, newval = r, (1 << al) if sign else -(1 << al)
            while k <= se:
                if blk[k] != 0:
                    refine_nonzero(blk, k)
                    k += 1
                    continue
                if newval == 0:  # ZRL: stop right AFTER the 16th zero —
                    # correction bits beyond it belong to the next symbol
                    zeros_left -= 1
                    k += 1
                    if zeros_left == 0:
                        break
                    continue
                if zeros_left == 0:  # placement: land ON the next zero
                    break
                zeros_left -= 1
                k += 1
            if newval:
                if k > se:
                    raise ValueError("refinement run past band end")
                blk[k] = newval
                k += 1

    def decode_block(comp, td, ta, by, bx):
        nonlocal eobrun
        if ss > 0 and ah > 0:
            decode_block_ac_refine(comp, ta, by, bx)
            return
        blk = coefs[comp["id"]][by, bx]
        if ss == 0:
            if ah == 0:
                t = reader.decode_huff(huff_dc[td])
                diff = _extend(reader.read(t), t) if t else 0
                dc_pred[comp["id"]] += diff
                blk[0] = dc_pred[comp["id"]] << al
            else:  # DC refinement: one raw bit
                blk[0] |= reader.read(1) << al
            if se == 0:
                return
            first_ac = 1
        else:
            first_ac = ss
        # AC coefficients (baseline tail or progressive first scan)
        if eobrun > 0:
            eobrun -= 1
            return
        k = first_ac
        while k <= se:
            rs = reader.decode_huff(huff_ac[ta])
            r, t = rs >> 4, rs & 15
            if t == 0:
                if r == 15:
                    k += 16
                    continue
                # EOBn: run of (1<<r)-1+ext further all-zero bands
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.read(r)
                break
            k += r
            if k > se:
                raise ValueError("AC run past band end")
            blk[k] = _extend(reader.read(t), t) << al
            k += 1

    if len(scan) == 1 and frame["progressive"] and ss > 0:
        # non-interleaved AC scan: raster over the component's TRUE blocks
        comp, td, ta = scan[0]
        count = 0
        for by in range(comp["by"]):
            for bx in range(comp["bx"]):
                if restart_interval and count and count % restart_interval == 0:
                    reader.sync_restart()
                    eobrun = 0
                decode_block(comp, td, ta, by, bx)
                count += 1
    else:
        mcu_count = 0
        for my in range(frame["mcuy"]):
            for mx in range(frame["mcux"]):
                if (
                    restart_interval
                    and mcu_count
                    and mcu_count % restart_interval == 0
                ):
                    reader.sync_restart()
                    dc_pred.update({c["id"]: 0 for c in frame["comps"]})
                    eobrun = 0
                for comp, td, ta in scan:
                    for v in range(comp["v"]):
                        for hh in range(comp["h"]):
                            decode_block(
                                comp, td, ta, my * comp["v"] + v, mx * comp["h"] + hh
                            )
                mcu_count += 1
    return _next_marker(p, reader.pos)


def _reconstruct(frame, coefs, qt):
    """Dequantize + IDCT every block, upsample chroma, color-convert."""
    w, h = frame["w"], frame["h"]
    comps = frame["comps"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    zz_rows = np.array([rc[0] for rc in ZIGZAG])
    zz_cols = np.array([rc[1] for rc in ZIGZAG])
    full = []
    for c in comps:
        store = coefs[c["id"]]
        by_pad, bx_pad, _ = store.shape
        q = qt[c["tq"]]
        plane = np.zeros((by_pad * 8, bx_pad * 8), dtype=np.float64)
        dq = np.zeros((8, 8), dtype=np.float64)
        for by in range(by_pad):
            for bx in range(bx_pad):
                dq[zz_rows, zz_cols] = store[by, bx]
                block = _idct(dq * q) + 128.0
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
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


def _prep_blocks(pixels: bytes, w: int, h: int, channels: int, subsample: bool):
    """Shared encoder front half: color transform, chroma subsampling,
    MCU-grid padding, FDCT + quantization. Returns (sampling, qtabs,
    grids, mcux, mcuy) with ``grids[ci][by][bx]`` the int64 quantized
    zigzag-ordered coefficient vector of one block on the padded
    grid."""
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

    hmax = max(sh for sh, _ in sampling)
    vmax = max(sv for _, sv in sampling)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    quant = [QUANT_LUMA, QUANT_CHROMA]
    zz_rows = np.array([rc[0] for rc in ZIGZAG])
    zz_cols = np.array([rc[1] for rc in ZIGZAG])

    grids = []
    for ci, (plane, (sh, sv)) in enumerate(zip(planes, sampling)):
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
        q = quant[qtabs[ci]]
        grid = np.zeros((mcuy * sv, mcux * sh, 64), dtype=np.int64)
        for by in range(mcuy * sv):
            for bx in range(mcux * sh):
                block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coefs = np.round(_fdct(block) / q).astype(np.int64)
                grid[by, bx] = coefs[zz_rows, zz_cols]
        grids.append(grid)
    return sampling, qtabs, grids, mcux, mcuy


def _emit_headers(out: bytearray, sampling, qtabs, w, h, progressive: bool):
    quant = [QUANT_LUMA, QUANT_CHROMA]

    def seg(marker: int, body: bytes):
        out.extend(b"\xff" + bytes([marker]) + struct.pack(">H", len(body) + 2) + body)

    for tq, q in enumerate(quant[: len(set(qtabs))]):
        zz = bytes(int(q[r, c]) for r, c in ZIGZAG)
        seg(0xDB, bytes([tq]) + zz)
    compspec = b"".join(
        bytes([ci + 1, (sh << 4) | sv, qtabs[ci]])
        for ci, (sh, sv) in enumerate(sampling)
    )
    seg(
        0xC2 if progressive else 0xC0,
        bytes([8]) + struct.pack(">HH", h, w) + bytes([len(sampling)]) + compspec,
    )
    return seg


def _write_ac_band(bw, enc_table, zz, first, last, write_values=True):
    """Emit one block's AC band with ZRL + per-block EOB0."""
    nz = [k for k in range(first, last + 1) if zz[k] != 0]
    last_nz = nz[-1] if nz else first - 1
    run = 0
    for k in range(first, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            code, ln = enc_table[0xF0]
            bw.write(code, ln)
            run -= 16
        t, vbits = _mag_bits(int(zz[k]))
        code, ln = enc_table[(run << 4) | t]
        bw.write(code, ln)
        if write_values:
            bw.write(vbits, t)
        run = 0
    if last_nz < last:
        code, ln = enc_table[0x00]
        bw.write(code, ln)


def _ac_band_symbols(zz, first, last):
    syms = []
    nz = [k for k in range(first, last + 1) if zz[k] != 0]
    last_nz = nz[-1] if nz else first - 1
    run = 0
    for k in range(first, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            syms.append(0xF0)
            run -= 16
        t, _ = _mag_bits(int(zz[k]))
        syms.append((run << 4) | t)
        run = 0
    if last_nz < last:
        syms.append(0x00)
    return syms


def _ac_scan_ops(grid_blocks, first=1, last=63):
    """Symbol/bit op stream for one component's progressive AC scan,
    with END-OF-BAND RUN aggregation (EOBn, r up to 14): consecutive
    end-of-band events collapse into one EOBn symbol plus r extension
    bits, exactly the coding real progressive encoders emit — so the
    decoder's EOBRUN path is exercised by round-trip, not just written.
    Yields ("sym", s) and ("bits", value, nbits) ops."""
    ops = []
    pending = 0

    def flush():
        nonlocal pending
        while pending:
            r = min(pending.bit_length() - 1, 14)
            take = min(pending, (1 << (r + 1)) - 1)
            ops.append(("sym", r << 4))
            if r:
                ops.append(("bits", take - (1 << r), r))
            pending -= take

    for zz in grid_blocks:
        nz = [k for k in range(first, last + 1) if zz[k] != 0]
        if not nz:
            pending += 1
            continue
        flush()
        last_nz = nz[-1]
        run = 0
        for k in range(first, last_nz + 1):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                ops.append(("sym", 0xF0))
                run -= 16
            t, vbits = _mag_bits(int(zz[k]))
            ops.append(("sym", (run << 4) | t))
            ops.append(("bits", vbits, t))
            run = 0
        if last_nz < last:
            pending = 1
    flush()
    return ops


def _ac_refine_ops(blocks, first=1, last=63, al=0):
    """Op stream for an AC successive-approximation REFINEMENT scan
    (Ah=al+1 -> al), mirroring the decoder's positional traversal:

    - newly-significant coefficients (|c| >> al == 1) arrive as a
      (zero-run, 1) symbol + sign bit;
    - already-significant coefficients contribute one correction bit
      (bit ``al`` of |c|), buffered and flushed after the symbol whose
      traversal crosses them — libjpeg's two-buffer discipline: bits
      inside the current stretch flush after that stretch's ZRL or
      placement symbol, bits after a block's last placement attach to
      the pending END-OF-BAND run and flush right after its EOBn.

    Runs above 32767 blocks would need interleaved EOBn chunking the
    flush below does not attempt — far beyond any test or realistic
    scan segment here."""
    ops = []
    eob_pending = 0
    eob_bits = []

    def flush_eob():
        nonlocal eob_pending
        while eob_pending:
            r = min(eob_pending.bit_length() - 1, 14)
            take = min(eob_pending, (1 << (r + 1)) - 1)
            ops.append(("sym", r << 4))
            if r:
                ops.append(("bits", take - (1 << r), r))
            eob_pending -= take
        ops.extend(eob_bits)
        eob_bits.clear()

    for zz in blocks:
        newly = [k for k in range(first, last + 1) if (abs(int(zz[k])) >> al) == 1]
        last_new = newly[-1] if newly else first - 1
        stretch = []  # ("z",) or ("b", bit) events since the last symbol
        for k in range(first, last_new + 1):
            c = int(zz[k])
            mag = abs(c) >> al
            if mag == 0:
                stretch.append(("z",))
            elif mag > 1:
                stretch.append(("b", mag & 1))
            else:  # newly significant: replay the stretch, then place
                if eob_pending:
                    flush_eob()
                zeros, pend = 0, []
                for ev in stretch:
                    if ev[0] == "z":
                        zeros += 1
                        if zeros == 16:
                            ops.append(("sym", 0xF0))
                            ops.extend(pend)
                            pend, zeros = [], 0
                    else:
                        pend.append(("bits", ev[1], 1))
                ops.append(("sym", (zeros << 4) | 1))
                ops.append(("bits", 1 if c > 0 else 0, 1))
                ops.extend(pend)
                stretch = []
        if last_new == last:
            # the final placement landed on the band's last position —
            # the decoder's traversal is complete, NO end-of-band event
            # exists for this block (mirrors _ac_scan_ops' last_nz==last)
            continue
        eob_bits.extend(
            ("bits", (abs(int(zz[k])) >> al) & 1, 1)
            for k in range(max(last_new + 1, first), last + 1)
            if (abs(int(zz[k])) >> al) > 1
        )
        eob_pending += 1
    flush_eob()
    return ops


def encode_jpeg_baseline(
    pixels: bytes,
    w: int,
    h: int,
    channels: int,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode 8-bit pixels (row-major, interleaved; channels 1 or 3) as
    a baseline JPEG. ``subsample`` turns on 4:2:0 chroma;
    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker
    (byte-aligned, DC predictors reset) every that many MCUs — the
    error-resilience feature real encoders add, and the round-trip
    coverage for the decoder's restart resync. Huffman tables are
    per-image flat 8-bit codes (see ``_flat_tables``).

    Both the symbol-collection and bit-writing passes traverse in MCU
    order (one shared generator): under 4:2:0 the MCU traversal visits
    luma blocks in a different order than a plain grid raster, and the
    DC DIFF sequence — hence the Huffman symbol set — depends on that
    order, so the two passes must walk identically."""
    sampling, qtabs, grids, mcux, mcuy = _prep_blocks(
        pixels, w, h, channels, subsample
    )
    n_tables = 1 if channels == 1 else 2

    def mcu_walk():
        """(ci, zz, mcu_index) in write order."""
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (sh, sv) in enumerate(sampling):
                    for v in range(sv):
                        for hh in range(sh):
                            yield ci, grids[ci][my * sv + v, mx * sh + hh], my * mcux + mx

    # symbol collection per table, in write order with restart resets
    dc_syms: list[list[int]] = [[] for _ in range(n_tables)]
    ac_syms: list[list[int]] = [[0x00] for _ in range(n_tables)]
    prevs = [0] * len(grids)
    last_mcu = 0
    for ci, zz, mcu in mcu_walk():
        if restart_interval and mcu != last_mcu and mcu % restart_interval == 0:
            prevs = [0] * len(grids)
        last_mcu = mcu
        tbl = 0 if ci == 0 else 1
        dc = int(zz[0])
        t, _ = _mag_bits(dc - prevs[ci])
        prevs[ci] = dc
        dc_syms[tbl].append(t)
        ac_syms[tbl].extend(_ac_band_symbols(zz, 1, 63))
    dc_tabs = [_flat_tables(sy or [0]) for sy in dc_syms]
    ac_tabs = [_flat_tables(sy) for sy in ac_syms]

    out = bytearray(b"\xff\xd8")
    seg = _emit_headers(out, sampling, qtabs, w, h, progressive=False)
    for tbl in range(n_tables):
        counts, symbols, _ = dc_tabs[tbl]
        seg(0xC4, bytes([tbl]) + bytes(counts) + symbols)
        counts, symbols, _ = ac_tabs[tbl]
        seg(0xC4, bytes([0x10 | tbl]) + bytes(counts) + symbols)
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos_comps = b"".join(
        bytes([ci + 1, ((0 if ci == 0 else 1) << 4) | (0 if ci == 0 else 1)])
        for ci in range(len(grids))
    )
    seg(0xDA, bytes([len(grids)]) + sos_comps + bytes([0, 63, 0]))

    bw = _BitWriter()
    dc_prev = [0] * len(grids)
    last_mcu = 0
    rst_n = 0
    for ci, zz, mcu in mcu_walk():
        if restart_interval and mcu != last_mcu and mcu % restart_interval == 0:
            bw.flush()
            out.extend(bw.out)
            bw = _BitWriter()
            out.extend(bytes([0xFF, 0xD0 + rst_n]))
            rst_n = (rst_n + 1) % 8
            dc_prev = [0] * len(grids)
        last_mcu = mcu
        tbl = 0 if ci == 0 else 1
        _, _, dc_enc = dc_tabs[tbl]
        _, _, ac_enc = ac_tabs[tbl]
        dc = int(zz[0])
        t, bits = _mag_bits(dc - dc_prev[ci])
        dc_prev[ci] = dc
        code, ln = dc_enc[t]
        bw.write(code, ln)
        if t:
            bw.write(bits, t)
        _write_ac_band(bw, ac_enc, zz, 1, 63)
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


def encode_jpeg_progressive(
    pixels: bytes,
    w: int,
    h: int,
    channels: int,
    subsample: bool = False,
    ac_successive: bool = False,
) -> bytes:
    """Progressive (SOF2) encoding exercising every scan kind the
    decoder covers: an interleaved DC first scan at Al=1, a DC
    successive-approximation refinement scan (raw bits), then one
    spectral-selection AC scan (1..63, Al=0) per component over the
    component's true block raster. Validation fixture for the
    progressive decode path; quantized coefficients are identical to
    the baseline encoding, so both forms decode to the same pixels."""
    sampling, qtabs, grids, mcux, mcuy = _prep_blocks(
        pixels, w, h, channels, subsample
    )
    hmax = max(sh for sh, _ in sampling)
    vmax = max(sv for _, sv in sampling)
    n_tables = 1 if channels == 1 else 2

    out = bytearray(b"\xff\xd8")
    seg = _emit_headers(out, sampling, qtabs, w, h, progressive=True)

    def mcu_blocks():
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (sh, sv) in enumerate(sampling):
                    for v in range(sv):
                        for hh in range(sh):
                            yield ci, grids[ci][my * sv + v, mx * sh + hh]

    # scan 1: DC first, interleaved, Al=1 (point-transformed diffs)
    dc_syms: list[list[int]] = [[] for _ in range(n_tables)]
    prevs = [0] * len(grids)
    for ci, zz in mcu_blocks():
        tbl = 0 if ci == 0 else 1
        v1 = int(zz[0]) >> 1
        t, _ = _mag_bits(v1 - prevs[ci])
        prevs[ci] = v1
        dc_syms[tbl].append(t)
    dc_tabs = [_flat_tables(sy or [0]) for sy in dc_syms]
    for tbl in range(n_tables):
        counts, symbols, _ = dc_tabs[tbl]
        seg(0xC4, bytes([tbl]) + bytes(counts) + symbols)
    sos_comps = b"".join(
        bytes([ci + 1, ((0 if ci == 0 else 1) << 4)])
        for ci in range(len(grids))
    )
    seg(0xDA, bytes([len(grids)]) + sos_comps + bytes([0, 0, 0x01]))
    bw = _BitWriter()
    prevs = [0] * len(grids)
    for ci, zz in mcu_blocks():
        tbl = 0 if ci == 0 else 1
        _, _, dc_enc = dc_tabs[tbl]
        v1 = int(zz[0]) >> 1
        t, bits = _mag_bits(v1 - prevs[ci])
        prevs[ci] = v1
        code, ln = dc_enc[t]
        bw.write(code, ln)
        if t:
            bw.write(bits, t)
    bw.flush()
    out.extend(bw.out)

    # scan 2: DC refinement (Ah=1 -> Al=0), one raw bit per block
    seg(0xDA, bytes([len(grids)]) + sos_comps + bytes([0, 0, 0x10]))
    bw = _BitWriter()
    for ci, zz in mcu_blocks():
        bw.write(int(zz[0]) & 1, 1)
    bw.flush()
    out.extend(bw.out)

    # per-component AC spectral-selection scans, with EOB-run
    # aggregation so the decoder's EOBRUN path round-trips. With
    # ac_successive, each component sends its band twice: a first scan
    # at Al=1 (point-transformed values) and a successive-approximation
    # REFINEMENT scan carrying the final bit — exercising the decoder's
    # correction-bit machinery end to end.
    def emit_ops_scan(ci, ops, sos_params):
        syms = [op[1] for op in ops if op[0] == "sym"] or [0x00]
        counts, symbols, ac_enc = _flat_tables(syms)
        tbl = 0 if ci == 0 else 1
        seg(0xC4, bytes([0x10 | tbl]) + bytes(counts) + symbols)
        seg(0xDA, bytes([1, ci + 1, tbl]) + bytes(sos_params))
        bw = _BitWriter()
        for op in ops:
            if op[0] == "sym":
                code, ln = ac_enc[op[1]]
                bw.write(code, ln)
            else:
                bw.write(op[1], op[2])
        bw.flush()
        out.extend(bw.out)

    comp_blocks = []
    for ci, grid in enumerate(grids):
        sh, sv = sampling[ci]
        comp_w = -(-(w * sh) // hmax)
        comp_h = -(-(h * sv) // vmax)
        bx_true = -(-comp_w // 8)
        by_true = -(-comp_h // 8)
        comp_blocks.append(
            [grid[by, bx] for by in range(by_true) for bx in range(bx_true)]
        )

    if not ac_successive:
        for ci, blocks in enumerate(comp_blocks):
            emit_ops_scan(ci, _ac_scan_ops(blocks), [1, 63, 0])
    else:
        for ci, blocks in enumerate(comp_blocks):
            # first scan at Al=1: sign(c) * (|c| >> 1)
            coarse = [
                np.sign(zz) * (np.abs(zz) >> 1) for zz in blocks
            ]
            emit_ops_scan(ci, _ac_scan_ops(coarse), [1, 63, 0x01])
        for ci, blocks in enumerate(comp_blocks):
            emit_ops_scan(ci, _ac_refine_ops(blocks, al=0), [1, 63, 0x10])

    out.extend(b"\xff\xd9")
    return bytes(out)
