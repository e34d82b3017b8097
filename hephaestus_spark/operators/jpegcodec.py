"""Baseline JPEG (ITU-T T.81) encoder + INDEPENDENT decoder, stdlib only.

The multimodal family's last genuinely-compressed image format
(VERDICT r6 item 5 carried to completion in r7): WAV/BMP are headered
reads, PNG added a hand-rolled inflate, and this module removes JPEG
from the stub list with both sides of the codec written from the
public spec — no codec library exists in this image to lean on.

Encoder: RGB -> YCbCr (BT.601) -> 8x8 blocks (edge-replicate pad) ->
separable forward DCT -> quantize (Annex K tables) -> zigzag -> DC
prediction + canonical Huffman entropy coding (Annex K tables) with
0xFF byte stuffing. 4:4:4, single scan, no restart markers.

Decoder: marker walk (SOI/DQT/SOF0/DHT/SOS/EOI), Huffman tables built
from the DHT payloads (not the spec constants — a wrong table write
breaks decode), MCU entropy decode, dequantize, inverse zigzag,
separable IDCT, YCbCr -> RGB with clamping.

The contract the Spark query pins: the entropy layer is LOSSLESS, so
the decoder's recovered quantized coefficients must equal bit-for-bit
the coefficients an independent forward pass derives from the source
pixels (``jpeg_expected_coeff_blob``); the DCT/IDCT float path is
lossy exactly and only through quantization (bounded in-query).

Every byte-layout constant here is from ITU-T T.81 (Annex K tables,
section C.2 canonical code construction, F.2 decode procedures).
"""

from __future__ import annotations

import math
import struct

# ---- spec constants (T.81 Annex K) ----

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

QT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
QT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K Huffman specs: (bits[1..16], huffval)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
    for u in range(8)
]
_C = [1 / math.sqrt(2)] + [1.0] * 7


def _fdct_quant(block: list[int], qt: list[int]) -> list[int]:
    """Separable forward 8x8 DCT on level-shifted samples + quantize;
    returns 64 ints in NATURAL order. Rounding is half-away-from-zero
    (symmetric, deterministic — pure-Python IEEE ops only)."""
    tmp = [[0.0] * 8 for _ in range(8)]
    for y in range(8):
        row = block[8 * y:8 * y + 8]
        for u in range(8):
            cu = _COS[u]
            tmp[u][y] = (
                row[0] * cu[0] + row[1] * cu[1] + row[2] * cu[2]
                + row[3] * cu[3] + row[4] * cu[4] + row[5] * cu[5]
                + row[6] * cu[6] + row[7] * cu[7]
            )
    out = [0] * 64
    for v in range(8):
        cv = _COS[v]
        for u in range(8):
            t = tmp[u]
            s = (
                t[0] * cv[0] + t[1] * cv[1] + t[2] * cv[2] + t[3] * cv[3]
                + t[4] * cv[4] + t[5] * cv[5] + t[6] * cv[6] + t[7] * cv[7]
            ) * (_C[u] * _C[v] / 4.0)
            c = s / qt[v * 8 + u]
            out[v * 8 + u] = (
                int(math.floor(c + 0.5)) if c >= 0 else -int(math.floor(-c + 0.5))
            )
    return out


def _dequant_idct(coefs: list[int], qt: list[int]) -> list[int]:
    """Dequantize (natural order) + separable inverse DCT ->
    level-shifted ints (the decoder's half; independent of the
    encoder's forward pass)."""
    dq = [coefs[i] * qt[i] for i in range(64)]
    tmp = [[0.0] * 8 for _ in range(8)]
    for v in range(8):
        row = dq[8 * v:8 * v + 8]
        for x in range(8):
            s = 0.0
            for u in range(8):
                s += _C[u] * row[u] * _COS[u][x]
            tmp[x][v] = s
    out = [0] * 64
    for y in range(8):
        for x in range(8):
            t = tmp[x]
            s = 0.0
            for v in range(8):
                s += _C[v] * t[v] * _COS[v][y]
            s /= 4.0
            out[y * 8 + x] = (
                int(math.floor(s + 0.5)) if s >= 0 else -int(math.floor(-s + 0.5))
            )
    return out


def _rgb_to_ycbcr(r: int, g: int, b: int) -> tuple[int, int, int]:
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128

    def rnd(v):
        return min(255, max(0, int(math.floor(v + 0.5))))

    return rnd(y), rnd(cb), rnd(cr)


def _ycbcr_to_rgb(y: int, cb: int, cr: int) -> tuple[int, int, int]:
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)

    def rnd(v):
        return min(255, max(0, int(math.floor(v + 0.5))))

    return rnd(r), rnd(g), rnd(b)


def _mag_bits(v: int) -> tuple[int, int]:
    """JPEG magnitude category + the category-coded value bits."""
    if v == 0:
        return 0, 0
    a = abs(v)
    n = a.bit_length()
    bits = v if v > 0 else v + (1 << n) - 1
    return n, bits


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, bits: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((bits >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.acc <<= 8 - self.n
            self.acc |= (1 << (8 - self.n)) - 1  # pad with 1s per spec
            self.buf.append(self.acc)
            if self.acc == 0xFF:
                self.buf.append(0x00)
            self.acc = 0
            self.n = 0
        return bytes(self.buf)


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical per spec C.2."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _block_at(
    plane: list[int], w: int, h: int, bx: int, by: int
) -> list[int]:
    """One 8x8 level-shifted block at block coords (bx, by),
    edge-replicated past the plane boundary."""
    blk = []
    for y in range(8):
        sy = min(by * 8 + y, h - 1)
        for x in range(8):
            sx = min(bx * 8 + x, w - 1)
            blk.append(plane[sy * w + sx] - 128)
    return blk


def _blocks_of(plane: list[int], w: int, h: int) -> list[list[int]]:
    """8x8 level-shifted blocks, edge-replicated to cover w x h."""
    bw, bh = (w + 7) // 8, (h + 7) // 8
    return [
        _block_at(plane, w, h, bx, by)
        for by in range(bh)
        for bx in range(bw)
    ]


def _downsample_2x2(plane: list[int], w: int, h: int) -> tuple[list[int], int, int]:
    """4:2:0 chroma plane: each output sample is the rounded mean of a
    2x2 box (edge-clamped) — (cw, ch) = ceil halves."""
    cw, ch = (w + 1) // 2, (h + 1) // 2
    out = []
    for cy in range(ch):
        y0, y1 = 2 * cy, min(2 * cy + 1, h - 1)
        for cx in range(cw):
            x0, x1 = 2 * cx, min(2 * cx + 1, w - 1)
            s = (
                plane[y0 * w + x0] + plane[y0 * w + x1]
                + plane[y1 * w + x0] + plane[y1 * w + x1]
            )
            out.append((s + 2) // 4)
    return out, cw, ch


def _entropy_block(bw_, coefs, pred, ci, dct_t, act_t) -> None:
    """DC-predict + zigzag + Huffman-code one quantized block."""
    zz = [coefs[ZIGZAG[k]] for k in range(64)]
    diff = zz[0] - pred[ci]
    pred[ci] = zz[0]
    n, bits = _mag_bits(diff)
    code, ln = dct_t[n]
    bw_.write(code, ln)
    if n:
        bw_.write(bits, n)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k] != 0:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = act_t[0xF0]  # ZRL
            bw_.write(code, ln)
            run -= 16
        n, bits = _mag_bits(v)
        code, ln = act_t[(run << 4) | n]
        bw_.write(code, ln)
        bw_.write(bits, n)
        run = 0
    if last_nz != 63:
        code, ln = act_t[0x00]  # EOB
        bw_.write(code, ln)


def _split_ycbcr(pixels: bytes, w: int, h: int):
    ys, cbs, crs = [], [], []
    for i in range(w * h):
        y, cb, cr = _rgb_to_ycbcr(
            pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2]
        )
        ys.append(y)
        cbs.append(cb)
        crs.append(cr)
    return ys, cbs, crs


def _mcu_plan(w: int, h: int, subsample: bool):
    """Per-MCU block coordinates: list of (comp_index, bx, by) in scan
    order, plus the MCU grid. 4:4:4 -> one 8x8 block per component per
    MCU; 4:2:0 -> four Y blocks (2x2, row-major) + one Cb + one Cr."""
    if not subsample:
        mcux, mcuy = (w + 7) // 8, (h + 7) // 8
        def blocks(mbx: int, mby: int):
            return [(0, mbx, mby), (1, mbx, mby), (2, mbx, mby)]
        return mcux, mcuy, blocks
    mcux, mcuy = (w + 15) // 16, (h + 15) // 16
    def blocks(mbx: int, mby: int):
        out = [
            (0, 2 * mbx + dx, 2 * mby + dy)
            for dy in range(2)
            for dx in range(2)
        ]
        out += [(1, mbx, mby), (2, mbx, mby)]
        return out
    return mcux, mcuy, blocks


def _component_planes(pixels: bytes, w: int, h: int, subsample: bool):
    """[(plane, pw, ph, qt), ...] for Y, Cb, Cr."""
    ys, cbs, crs = _split_ycbcr(pixels, w, h)
    if not subsample:
        return [
            (ys, w, h, QT_LUMA), (cbs, w, h, QT_CHROMA), (crs, w, h, QT_CHROMA)
        ]
    cb_d, cw, ch = _downsample_2x2(cbs, w, h)
    cr_d, _, _ = _downsample_2x2(crs, w, h)
    return [
        (ys, w, h, QT_LUMA), (cb_d, cw, ch, QT_CHROMA), (cr_d, cw, ch, QT_CHROMA)
    ]


def jpeg_encode(pixels: bytes, w: int, h: int, subsample: bool = False) -> bytes:
    """Baseline JFIF-less JPEG: SOI DQT SOF0 DHT SOS <scan> EOI.
    ``subsample=True`` emits 4:2:0 (Y at 2x2 sampling, chroma planes
    2x2-box-downsampled; MCU = 4 Y blocks + Cb + Cr), the dominant
    real-world mode; default stays 4:4:4."""
    dc_l = _huff_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _huff_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _huff_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _huff_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)
    tables = [(dc_l, ac_l), (dc_c, ac_c), (dc_c, ac_c)]

    planes = _component_planes(pixels, w, h, subsample)
    mcux, mcuy, mcu_blocks = _mcu_plan(w, h, subsample)
    bw_ = _BitWriter()
    pred = [0, 0, 0]
    for m in range(mcux * mcuy):
        mby, mbx = divmod(m, mcux)
        for ci, bx, by in mcu_blocks(mbx, mby):
            plane, pw, ph, qt = planes[ci]
            coefs = _fdct_quant(_block_at(plane, pw, ph, bx, by), qt)
            _entropy_block(bw_, coefs, pred, ci, *tables[ci])
    scan = bw_.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dqt(tid: int, qt: list[int]) -> bytes:
        return seg(0xFFDB, bytes([tid]) + bytes(qt[ZIGZAG[k]] for k in range(64)))

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    y_samp = 0x22 if subsample else 0x11
    sof = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, y_samp, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    sos = seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return (
        b"\xff\xd8"
        + dqt(0, QT_LUMA)
        + dqt(1, QT_CHROMA)
        + sof
        + dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
        + dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
        + dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        + dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
        + sos
        + scan
        + b"\xff\xd9"
    )


def jpeg_expected_coeff_blob(
    pixels: bytes, w: int, h: int, subsample: bool = False
) -> bytes:
    """The quantized-coefficient stream the encoder commits to the
    bitstream, serialized canonically (MCU scan order, int16
    little-endian, natural coefficient order). The decoder must recover
    EXACTLY this — the entropy layer is lossless."""
    planes = _component_planes(pixels, w, h, subsample)
    mcux, mcuy, mcu_blocks = _mcu_plan(w, h, subsample)
    blob = bytearray()
    for m in range(mcux * mcuy):
        mby, mbx = divmod(m, mcux)
        for ci, bx, by in mcu_blocks(mbx, mby):
            plane, pw, ph, qt = planes[ci]
            for c in _fdct_quant(_block_at(plane, pw, ph, bx, by), qt):
                blob += struct.pack("<h", c)
    return bytes(blob)


# ---------------- decoder ----------------


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated scan")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("unexpected marker in scan")
                self.pos += 1
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.bit()
        if (ln, code) in table:
            return table[(ln, code)]
    raise ValueError("invalid huffman code in scan")


def _extend(bits: int, n: int) -> int:
    if n == 0:
        return 0
    return bits if bits >= (1 << (n - 1)) else bits - (1 << n) + 1


def jpeg_decode(data: bytes):
    """-> (w, h, n_components, rgb_pixels, coeff_blob)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("bad SOI")
    pos = 2
    qts: dict[int, list[int]] = {}
    hts: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    w = h = None
    comps = []  # (id, qt_id)
    scan_comps = []  # (comp_index, dc_tid, ac_tid)
    scan_data = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if pos + 2 > len(data):
            raise ValueError("truncated segment header")
        (ln,) = struct.unpack_from(">H", data, pos)
        if pos + ln > len(data):
            raise ValueError("truncated segment body")
        body = data[pos + 2:pos + ln]
        if marker == 0xDB:  # DQT (possibly multiple tables)
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 15
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zzq = list(body[o + 1:o + 65])
                if len(zzq) < 64:
                    raise ValueError("truncated DQT segment")
                nat = [0] * 64
                for k in range(64):
                    nat[ZIGZAG[k]] = zzq[k]
                qts[tq] = nat
                o += 65
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision")
            o = 6
            for _ in range(nc):
                cid, samp, tq = body[o], body[o + 1], body[o + 2]
                hi, vi = samp >> 4, samp & 15
                if (hi, vi) not in ((1, 1), (2, 2)):
                    raise ValueError("only 1x1 or 2x2 sampling factors supported")
                comps.append((cid, tq, hi, vi))
                o += 3
        elif marker in (0xC1, 0xC2, 0xC3):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xC4:  # DHT (possibly multiple)
            o = 0
            while o < len(body):
                cls, tid = body[o] >> 4, body[o] & 15
                bits = list(body[o + 1:o + 17])
                nv = sum(bits)
                vals = list(body[o + 17:o + 17 + nv])
                if len(bits) < 16 or len(vals) < nv:
                    raise ValueError("truncated DHT segment")
                hts[(cls, tid)] = _huff_decode_table(bits, vals)
                o += 17 + nv
        elif marker == 0xDA:  # SOS
            ns = body[0]
            o = 1
            for _ in range(ns):
                cid, tt = body[o], body[o + 1]
                idx = next(i for i, c in enumerate(comps) if c[0] == cid)
                scan_comps.append((idx, tt >> 4, tt & 15))
                o += 2
            scan_data = data[pos + ln:]
            # find EOI from the end
            eoi = scan_data.rfind(b"\xff\xd9")
            if eoi < 0:
                raise ValueError("no EOI")
            scan_data = scan_data[:eoi]
            pos += ln + eoi  # will break via EOI handling next loop
            pos = len(data)  # single-scan baseline: done
            continue
        pos += ln
    if w is None or scan_data is None:
        raise ValueError("missing SOF0 or SOS")

    br = _BitReader(scan_data)
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    n_mcu = mcux * mcuy
    pred = [0] * len(comps)
    # per-component planes at that component's resolution, MCU-padded
    pw = [mcux * 8 * c[2] for c in comps]
    ph = [mcuy * 8 * c[3] for c in comps]
    planes = [[0] * (pw[i] * ph[i]) for i in range(len(comps))]
    blob = bytearray()
    for m in range(n_mcu):
        mby, mbx = divmod(m, mcux)
        for (ci, dc_tid, ac_tid) in scan_comps:
            dc_tab = hts[(0, dc_tid)]
            ac_tab = hts[(1, ac_tid)]
            _, tq, hi, vi = comps[ci]
            for byi in range(vi):
                for bxi in range(hi):
                    zz = [0] * 64
                    n = _huff_decode(br, dc_tab)
                    diff = _extend(br.bits(n), n)
                    pred[ci] += diff
                    zz[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(br, ac_tab)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16  # ZRL
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run past block end")
                        zz[k] = _extend(br.bits(s), s)
                        k += 1
                    coefs = [0] * 64
                    for k2 in range(64):
                        coefs[ZIGZAG[k2]] = zz[k2]
                    for c in coefs:
                        blob += struct.pack("<h", c)
                    samples = _dequant_idct(coefs, qts[tq])
                    stride = pw[ci]
                    px = (mbx * hi + bxi) * 8
                    py = (mby * vi + byi) * 8
                    for y in range(8):
                        row = (py + y) * stride + px
                        for x in range(8):
                            planes[ci][row + x] = min(
                                255, max(0, samples[y * 8 + x] + 128)
                            )
    rgb = bytearray()
    for y in range(h):
        for x in range(w):
            vals = []
            for i, (_, _, hi, vi) in enumerate(comps):
                # nearest-sample upsampling (pixel replication)
                sx, sy = x * hi // hmax, y * vi // vmax
                vals.append(planes[i][sy * pw[i] + sx])
            r, g, b = _ycbcr_to_rgb(*vals)
            rgb += bytes((r, g, b))
    return w, h, len(comps), bytes(rgb), bytes(blob)


