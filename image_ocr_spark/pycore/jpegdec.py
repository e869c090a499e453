"""From-scratch baseline JPEG codec (stdlib only) for the multimodal
feature path — the second real raster decoder after `pngdec.py`
(VERDICT r04 item 7: the reference accepts seven raster formats,
`main.py:169-176`, and preprocesses real pixels, `preprocessor.py:81-131`;
the sandbox ships no PIL/cv2, so the decode is built from the public ITU
T.81 spec the way pngdec was built from RFC 2083).

Scope (baseline sequential DCT, everything a deterministic fixture needs):
- 8-bit precision, 1 component (grayscale) or 3 components (YCbCr 4:4:4)
- canonical Huffman entropy coding, tables parsed from DHT (the encoder
  writes the public Annex K example tables)
- DC prediction, AC run-length with ZRL/EOB, 0xFF00 byte stuffing
- markers: SOI/APPn/COM/DQT/DHT/SOF0/SOS/EOI; anything requiring more
  machinery (progressive SOF2, subsampled components, restart intervals,
  12-bit, arithmetic coding) raises ValueError loudly rather than
  decoding wrong

Exactness contract the driver oracle relies on: an image made of
CONSTANT 8x8 blocks round-trips bit-exactly through the full
DCT->quantize->Huffman->decode pipeline with all-ones quantization
tables — a constant block's forward DCT is a lone DC coefficient whose
scalings are powers of two (AC terms quantize to exactly 0 from ~1e-13
float residue), and the neutral-chroma YCbCr<->RGB conversions multiply
the chroma offsets by exactly 0.0.  The fixture generator exploits this:
the DuckDB oracle computes pixel stats straight from the generative
block formula while Spark decodes real entropy-coded JPEG bytes —
equality proves the codec.  Non-constant blocks (the AC/ZRL paths) are
covered by roundtrip-tolerance tests instead (JPEG is lossy by design).

The encoder exists for fixture generation only; the decoder is the
product surface (extract_pixel_features sniffs PNG/JPEG magic).
"""

from __future__ import annotations

import math
import struct
from typing import Dict, List, Tuple

JPEG_MAGIC = b"\xff\xd8"

# largest w*h*ch the decoder will materialize (bomb guard, mirrors pngdec)
MAX_PIXEL_BYTES = 64 * 1024 * 1024

# zigzag scan order: scan position k -> raster index (row*8 + col)
ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)

# Huffman table specs from ITU T.81 Annex K.3 (public example tables):
# (BITS[1..16], HUFFVAL) per (class, id) — class 0 = DC, 1 = AC.
_DC_LUM = (
    (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
    tuple(range(12)),
)
_DC_CHR = (
    (0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
    tuple(range(12)),
)
_AC_LUM = (
    (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125),
    (
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ),
)
_AC_CHR = (
    (0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119),
    (
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ),
)

# cosine basis COS[x][u] = cos((2x+1) * u * pi / 16); C[u] = 1/sqrt(2) or 1
_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)]
    for x in range(8)
]
_C = [1.0 / math.sqrt(2.0)] + [1.0] * 7

# optional numpy fast path (import-try per repo policy): the separable
# IDCT S = B @ F @ B.T with B[x][u] = 0.5*C(u)*cos((2x+1)u*pi/16) is
# ~100x the naive loop.  Constant-block exactness survives: a DC-only F
# contributes exact 0.0 terms everywhere else, and the <=2-ulp product
# reordering cannot move a value that rounds to an integer.
try:
    import numpy as _np

    _B = _np.array(
        [[0.5 * _C[u] * _COS[x][u] for u in range(8)] for x in range(8)],
        dtype=_np.float64,
    )
    # forward tables (r07): separable FDCT coef = _CC * (A.T @ block @ A)
    # with A[y][r] = COS[y][r]; _ZZN indexes raster coefs in zigzag order
    _A = _np.array(_COS, dtype=_np.float64)
    _CC = 0.25 * _np.outer(_np.array(_C), _np.array(_C))
    ZIGZAG_NP = _np.array(ZIGZAG, dtype=_np.int64)
except ImportError:  # pragma: no cover - numpy is baked into the sandbox
    _np = None
    _B = None
    _A = None
    _CC = None


def _canonical_codes(bits, huffval) -> Dict[int, Tuple[int, int]]:
    """symbol -> (code, length) by the canonical assignment (T.81 C.2)."""
    out: Dict[int, Tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                # a corrupt DHT can declare more codes than fit at this
                # bit length; the canonical code would overflow
                raise ValueError("jpeg: invalid DHT code counts")
            out[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits, huffval):
    """(lut8, by_code): lut8 resolves any code of length <= 8 from the
    next 8 peeked bits in one step (lut8[b] = (symbol, length) or None);
    by_code[(length, code)] covers the rare longer codes bit-by-bit."""
    by_code = {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, huffval).items()
    }
    lut8 = [None] * 256
    for (length, code), sym in by_code.items():
        if length <= 8:
            base = code << (8 - length)
            for suffix in range(1 << (8 - length)):
                lut8[base | suffix] = (sym, length)
    return lut8, by_code


def _magnitude(v: int) -> Tuple[int, int]:
    """(category, appended-bits) per T.81 F.1.2.1 (negative values store
    v - 1 in category bits)."""
    if v == 0:
        return 0, 0
    size = abs(v).bit_length()
    return size, v if v > 0 else v + (1 << size) - 1


def _extend(raw: int, size: int) -> int:
    """Inverse of _magnitude (T.81 F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    return raw if raw >= (1 << (size - 1)) else raw - (1 << size) + 1


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits (spec)
        return bytes(self.out)


class _BitReader:
    """MSB-first reader over the entropy-coded segment, un-stuffing
    0xFF00; any other 0xFF-marker (or end of data) ends the real stream.

    Peeks past the real stream are satisfied with VIRTUAL 1-bits (the
    spec's pad value) so the 8-bit LUT can always look ahead; CONSUMING
    a virtual bit means a code ran past the data — that raises the same
    truncation ValueError the bit-at-a-time reader did, so the
    decode-or-ValueError contract is unchanged.  acc is masked to the
    live window after every fill (an unmasked accumulator grows by 8
    bits per fill and turns the scan quadratic in stream length)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.virtual = 0  # trailing virtual pad bits in the window

    def _fill_real(self) -> bool:
        if self.virtual or self.pos >= len(self.data):
            return False  # never append real bytes after virtual pads
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                self.pos -= 1
                return False  # lone trailing 0xFF: treat as end
            if self.data[self.pos] == 0x00:
                self.pos += 1  # stuffed data byte 0xFF
            else:
                self.pos -= 1
                return False  # a real marker: scan data is over
        self.acc = ((self.acc << 8) | b) & ((1 << (self.nbits + 8)) - 1)
        self.nbits += 8
        return True

    def _ensure(self, n: int) -> None:
        while self.nbits < n:
            if not self._fill_real():
                self.acc = ((self.acc << 8) | 0xFF) & (
                    (1 << (self.nbits + 8)) - 1
                )
                self.nbits += 8
                self.virtual += 8

    def _consume(self, n: int) -> None:
        self.nbits -= n
        if self.nbits < self.virtual:
            raise ValueError("jpeg: truncated entropy-coded segment")

    def read_bits(self, n: int) -> int:
        self._ensure(n)
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self._consume(n)
        return v

    def read_bit(self) -> int:
        return self.read_bits(1)

    def read_symbol(self, table) -> int:
        lut8, by_code = table
        self._ensure(8)
        hit = lut8[(self.acc >> (self.nbits - 8)) & 0xFF]
        if hit is not None:
            sym, length = hit
            self._consume(length)
            return sym
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = by_code.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid Huffman code")


def _fdct_quant(block: List[int], qtab_raster: List[int]) -> List[int]:
    """Forward DCT + quantization of one level-shifted 8x8 raster block;
    returns zigzag-ordered quantized coefficients.

    numpy separable form when available (r07, ~40x: coef = 0.25 C_r C_c
    (A.T @ block @ A)); naive exact-form loop otherwise.  For the
    constant-block fixture domain both are bit-identical (DC row/col 0 of
    A is exactly 1.0 so the DC sum is the same fp addition chain up to
    reassociation of exact integers; AC terms quantize to 0 either way) —
    pinned exhaustively over the full 768-id synth cycle in
    tests/test_jpegdec.py."""
    if _np is not None:
        bm = _np.asarray(block, dtype=_np.float64).reshape(8, 8)
        coef = (_CC * (_A.T @ bm @ _A)).reshape(64)
        q = coef[ZIGZAG_NP] / _np.asarray(qtab_raster, dtype=_np.float64)[ZIGZAG_NP]
        out = _np.where(
            q >= 0, _np.floor(q + 0.5), -_np.floor(-q + 0.5)
        ).astype(_np.int64)
        return out.tolist()
    coef = [0.0] * 64
    for r in range(8):
        for c in range(8):
            acc = 0.0
            for y in range(8):
                cy = _COS[y][r]
                base = y * 8
                for x in range(8):
                    acc += block[base + x] * cy * _COS[x][c]
            coef[r * 8 + c] = 0.25 * _C[r] * _C[c] * acc
    out = [0] * 64
    for k in range(64):
        z = ZIGZAG[k]
        q = coef[z] / qtab_raster[z]
        out[k] = int(math.floor(q + 0.5)) if q >= 0 else -int(
            math.floor(-q + 0.5)
        )
    return out


def _idct(coef_raster: List[int]) -> List[int]:
    """IDCT of one dequantized raster block -> clamped 0..255 pixel bytes
    (row-major).  numpy separable form when available (~100x), naive
    exact-form loop otherwise; both reproduce a DC-only block's constant
    exactly (see _B comment)."""
    if _np is not None:
        fm = _np.asarray(coef_raster, dtype=_np.float64).reshape(8, 8)
        s = _np.floor(_B @ fm @ _B.T + 128.5)
        return _np.clip(s, 0, 255).astype(_np.int64).reshape(64).tolist()
    acc = [[0.0] * 8 for _ in range(8)]
    for r in range(8):
        for c in range(8):
            f = coef_raster[r * 8 + c]
            if f == 0:
                continue
            scale = 0.25 * _C[r] * _C[c] * f
            for y in range(8):
                vy = scale * _COS[y][r]
                row = acc[y]
                for x in range(8):
                    row[x] += vy * _COS[x][c]
    out = [0] * 64
    for y in range(8):
        row = acc[y]
        for x in range(8):
            v = int(math.floor(row[x] + 128.0 + 0.5))
            out[y * 8 + x] = 0 if v < 0 else (255 if v > 255 else v)
    return out


def _clamp_byte(x: float) -> int:
    v = int(math.floor(x + 0.5))
    return 0 if v < 0 else (255 if v > 255 else v)


def _encode_block(
    zz: List[int], pred: int, wr: _BitWriter, dc_codes, ac_codes
) -> int:
    """Huffman-encode one zigzag block; returns the new DC predictor."""
    size, bits = _magnitude(zz[0] - pred)
    code, length = dc_codes[size]
    wr.write(code, length)
    if size:
        wr.write(bits, size)
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    k = 1
    while k <= last_nz:
        run = 0
        while zz[k] == 0:
            run += 1
            k += 1
        while run >= 16:
            code, length = ac_codes[0xF0]  # ZRL
            wr.write(code, length)
            run -= 16
        size, bits = _magnitude(zz[k])
        if size > 10:
            raise ValueError(
                "jpeg: AC coefficient too large for baseline Annex K "
                "tables — use a coarser quantization table"
            )
        code, length = ac_codes[(run << 4) | size]
        wr.write(code, length)
        wr.write(bits, size)
        k += 1
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        wr.write(code, length)
    return zz[0]


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def jpeg_encode(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    qtab_luma: List[int] = None,
    qtab_chroma: List[int] = None,
) -> bytes:
    """Baseline JFIF from raw row-major 8-bit pixels (channels 1 = gray,
    3 = RGB; converted to YCbCr 4:4:4).  Default quantization tables are
    all-ones ("near-lossless": constant 8x8 blocks round-trip exactly).
    Fixture-generation only — the product surface is jpeg_decode."""
    if channels not in (1, 3):
        raise ValueError("jpeg_encode: channels must be 1 or 3")
    if len(pixels) != width * height * channels:
        raise ValueError("jpeg_encode: pixel buffer size mismatch")
    qt_l = list(qtab_luma or [1] * 64)
    qt_c = list(qtab_chroma or [1] * 64)
    # component planes, level-shifted later per block
    if channels == 1:
        planes = [list(pixels)]
    else:
        n = width * height
        ys, cbs, crs = [0] * n, [0] * n, [0] * n
        for i in range(n):
            r, g, b = pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2]
            ys[i] = _clamp_byte(0.299 * r + 0.587 * g + 0.114 * b)
            cbs[i] = _clamp_byte(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b)
            crs[i] = _clamp_byte(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b)
        planes = [ys, cbs, crs]
    bw, bh = (width + 7) // 8, (height + 7) // 8

    def block_at(plane, bx, by):
        out = [0] * 64
        for y in range(8):
            sy = min(by * 8 + y, height - 1)  # edge-replicate padding
            base = sy * width
            for x in range(8):
                sx = min(bx * 8 + x, width - 1)
                out[y * 8 + x] = plane[base + sx] - 128
        return out

    dc_l = _canonical_codes(*_DC_LUM)
    ac_l = _canonical_codes(*_AC_LUM)
    dc_c = _canonical_codes(*_DC_CHR)
    ac_c = _canonical_codes(*_AC_CHR)
    wr = _BitWriter()
    preds = [0] * channels
    for by in range(bh):
        for bx in range(bw):
            for ci in range(channels):
                qt = qt_l if ci == 0 else qt_c
                zz = _fdct_quant(block_at(planes[ci], bx, by), qt)
                preds[ci] = _encode_block(
                    zz,
                    preds[ci],
                    wr,
                    dc_l if ci == 0 else dc_c,
                    ac_l if ci == 0 else ac_c,
                )
    scan = wr.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(
        0xFFE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    qts = bytes([0x00]) + bytes(qt_l[ZIGZAG[k]] for k in range(64))
    if channels == 3:
        qts += bytes([0x01]) + bytes(qt_c[ZIGZAG[k]] for k in range(64))
    out += _seg(0xFFDB, qts)
    comps = b""
    for ci in range(channels):
        comps += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += _seg(
        0xFFC0, struct.pack(">BHHB", 8, height, width, channels) + comps
    )
    dht = b""
    tables = [(0x00, _DC_LUM), (0x10, _AC_LUM)]
    if channels == 3:
        tables += [(0x01, _DC_CHR), (0x11, _AC_CHR)]
    for tc_th, (bits, vals) in tables:
        dht += bytes([tc_th]) + bytes(bits) + bytes(vals)
    out += _seg(0xFFC4, dht)
    sos = bytes([channels])
    for ci in range(channels):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xFFDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def jpeg_decode(data: bytes) -> Tuple[int, int, int, bytes]:
    """(width, height, channels, pixels) from a baseline sequential JPEG.

    Supports what the scope note promises (8-bit, 1 or 3 components,
    4:4:4, Huffman); any UNSUPPORTED feature — progressive, subsampling,
    restart intervals, 12-bit, arithmetic coding — raises ValueError
    rather than decoding wrong, as do structural corruptions (truncated
    segments, bad lengths, invalid Huffman codes).  Bit flips INSIDE the
    entropy-coded data that still form valid codes decode to different
    pixels, as in any JPEG decoder — only ValueError ever escapes
    (fuzz-tested), so the operator skip contract holds either way."""
    if len(data) < 4 or data[:2] != JPEG_MAGIC:
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: Dict[int, List[int]] = {}
    # (class, id) -> (lut8, by_code) as returned by _decode_table
    htabs: Dict[Tuple[int, int], tuple] = {}
    sof = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("jpeg: truncated before SOS")
        if data[pos] != 0xFF:
            raise ValueError("jpeg: expected marker")
        marker = (data[pos] << 8) | data[pos + 1]
        pos += 2
        if marker == 0xFFD9:
            raise ValueError("jpeg: EOI before scan data")
        if 0xFFD0 <= marker <= 0xFFD7:  # RSTn outside a scan
            raise ValueError("jpeg: unexpected RST marker")
        (seglen,) = struct.unpack_from(">H", data, pos)
        if seglen < 2 or pos + seglen > len(data):
            raise ValueError("jpeg: bad segment length")
        body = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xFFDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("jpeg: 16-bit quant tables unsupported")
                if i + 65 > len(body):
                    raise ValueError("jpeg: truncated DQT")
                zz = list(body[i + 1 : i + 65])
                raster = [0] * 64
                for k in range(64):
                    raster[ZIGZAG[k]] = zz[k]
                qtabs[tq] = raster
                i += 65
        elif marker == 0xFFC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = tuple(body[i + 17 : i + 17 + n])
                if len(bits) < 16 or len(vals) < n:
                    raise ValueError("jpeg: truncated DHT")
                htabs[(tc, th)] = _decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xFFC0:  # SOF0 baseline
            if len(body) < 6:
                raise ValueError("jpeg: truncated SOF0")
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            if ncomp not in (1, 3):
                raise ValueError("jpeg: only 1 or 3 components supported")
            if w == 0 or h == 0:
                raise ValueError("jpeg: zero-dimension image")
            if w * h * ncomp > MAX_PIXEL_BYTES:
                raise ValueError("jpeg: image too large")
            if len(body) < 6 + 3 * ncomp:
                raise ValueError("jpeg: truncated SOF0 component specs")
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                if hv != 0x11:
                    raise ValueError(
                        "jpeg: subsampled components unsupported (4:4:4 only)"
                    )
                comps.append((cid, tq))
            sof = (w, h, comps)
        elif marker in (0xFFC2, 0xFFC1, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                        0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise ValueError("jpeg: only baseline SOF0 supported")
        elif marker == 0xFFDD:
            raise ValueError("jpeg: restart intervals unsupported")
        elif marker == 0xFFDA:  # SOS
            if sof is None:
                raise ValueError("jpeg: SOS before SOF0")
            if len(body) < 1 or len(body) < 1 + 2 * body[0] + 3:
                raise ValueError("jpeg: truncated SOS header")
            ns = body[0]
            w, h, comps = sof
            if ns != len(comps):
                raise ValueError("jpeg: partial-scan SOS unsupported")
            scan_tabs = []
            for ci in range(ns):
                cs, tdta = body[1 + 2 * ci], body[2 + 2 * ci]
                td, ta = tdta >> 4, tdta & 0x0F
                if (0, td) not in htabs or (1, ta) not in htabs:
                    raise ValueError("jpeg: missing Huffman table")
                _, tq = comps[ci]
                if tq not in qtabs:
                    raise ValueError("jpeg: missing quant table")
                scan_tabs.append((htabs[(0, td)], htabs[(1, ta)], qtabs[tq]))
            return _decode_scan(data, pos, w, h, scan_tabs)
        # else: APPn / COM / others — skipped


def _decode_scan(data, pos, w, h, scan_tabs) -> Tuple[int, int, int, bytes]:
    ncomp = len(scan_tabs)
    bw, bh = (w + 7) // 8, (h + 7) // 8
    rd = _BitReader(data, pos)
    planes = [bytearray(bw * 8 * bh * 8) for _ in range(ncomp)]
    preds = [0] * ncomp
    for by in range(bh):
        for bx in range(bw):
            for ci in range(ncomp):
                dc_tab, ac_tab, qt = scan_tabs[ci]
                size = rd.read_symbol(dc_tab)
                preds[ci] += _extend(rd.read_bits(size), size)
                zz = [0] * 64
                zz[0] = preds[ci]
                k = 1
                while k < 64:
                    sym = rd.read_symbol(ac_tab)
                    run, size = sym >> 4, sym & 0x0F
                    if size == 0:
                        if run == 15:  # ZRL
                            k += 16
                            continue
                        break  # EOB
                    k += run
                    if k > 63:
                        raise ValueError("jpeg: AC index overflow")
                    zz[k] = _extend(rd.read_bits(size), size)
                    k += 1
                coef = [0] * 64
                for k in range(64):
                    z = ZIGZAG[k]
                    coef[z] = zz[k] * qt[z]
                px = _idct(coef)
                plane, rowlen = planes[ci], bw * 8
                for y in range(8):
                    base = (by * 8 + y) * rowlen + bx * 8
                    plane[base : base + 8] = bytes(px[y * 8 : y * 8 + 8])
    rowlen = bw * 8
    if ncomp == 1:
        out = bytearray(w * h)
        for y in range(h):
            out[y * w : (y + 1) * w] = planes[0][y * rowlen : y * rowlen + w]
        return w, h, 1, bytes(out)
    yp, cbp, crp = planes
    if _np is not None:
        # row-chunked with in-place ops: a whole-image float64 pipeline
        # peaks ~1.5 GB of temporaries at the MAX_PIXEL_BYTES cap
        # (review r5) — chunks bound the transient to a few MB
        out = _np.empty((h, w, 3), dtype=_np.uint8)
        ya = _np.frombuffer(bytes(yp), dtype=_np.uint8).reshape(-1, rowlen)
        cba = _np.frombuffer(bytes(cbp), dtype=_np.uint8).reshape(-1, rowlen)
        cra = _np.frombuffer(bytes(crp), dtype=_np.uint8).reshape(-1, rowlen)
        step = max(1, (4 << 20) // max(1, w * 24))
        for y0 in range(0, h, step):
            y1 = min(h, y0 + step)
            yy = ya[y0:y1, :w].astype(_np.float64)
            cb = cba[y0:y1, :w].astype(_np.float64)
            cb -= 128.0
            cr = cra[y0:y1, :w].astype(_np.float64)
            cr -= 128.0
            for ch_i, plane in enumerate(
                (
                    yy + 1.402 * cr,
                    yy - 0.344136 * cb - 0.714136 * cr,
                    yy + 1.772 * cb,
                )
            ):
                plane += 0.5
                _np.floor(plane, out=plane)
                _np.clip(plane, 0, 255, out=plane)
                out[y0:y1, :, ch_i] = plane.astype(_np.uint8)
        return w, h, 3, out.tobytes()
    out = bytearray(w * h * 3)
    for y in range(h):
        base = y * rowlen
        for x in range(w):
            yy = yp[base + x]
            cb = cbp[base + x] - 128
            cr = crp[base + x] - 128
            i = (y * w + x) * 3
            out[i] = _clamp_byte(yy + 1.402 * cr)
            out[i + 1] = _clamp_byte(yy - 0.344136 * cb - 0.714136 * cr)
            out[i + 2] = _clamp_byte(yy + 1.772 * cb)
    return w, h, 3, bytes(out)
