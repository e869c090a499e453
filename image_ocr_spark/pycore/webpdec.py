"""From-scratch lossless-WebP (VP8L) codec (stdlib only) for the
multimodal feature path.

Fifth and final entry in the from-scratch codec series (pngdec/jpegdec/
bmpdec/tiffdec): the reference's CLI accepts ``.webp``
(``src/main.py:169``) and preprocesses real decoded pixels
(``src/preprocessor.py:81-131``).  Lossless WebP is the VP8L bitstream
(public "WebP Lossless Bitstream Specification"): LSB-first bit packing,
canonical prefix codes (simple 1-2-symbol form and the DEFLATE-style
code-length-coded normal form), an optional ARGB color cache, and LZ77
back-references with a 120-entry two-dimensional neighbor distance map.

Scope:
- decode: transform-free VP8L streams with any mix of literal pixels,
  color-cache hits, and LZ77 back-references (neighbor-mapped AND plain
  distances); simple and normal prefix codes, including code-length
  repeats 16/17/18 and the max_symbol short-circuit.  The four VP8L
  transforms (predictor/color/subtract-green/palette) and meta prefix
  groups raise ValueError — documented boundary, same policy as
  progressive JPEG in pycore/jpegdec.py.
- encode (fixture generation only): literal pixels with per-channel
  canonical prefix codes (simple form when a channel has <=2 distinct
  values, else the normal form with an explicit code-length code), no
  transforms, no cache, single prefix group.  RGB and RGBA (VP8L has no
  grayscale mode; the alpha-hint header bit distinguishes them).

Correctness is proven two ways: encode->decode roundtrip identity, and
the driver query's closed-form DuckDB oracle computing the same pixel
stats straight from the generative formula (VP8L literal coding is
lossless, so the oracle replay is exact — the pixels pass through real
entropy-coded bits first).  Lossy WebP (VP8) would need the full VP8
intra codec and remains the documented non-goal.
"""

from __future__ import annotations

import heapq
import struct
from typing import Dict, List, Sequence, Tuple

RIFF_MAGIC = b"RIFF"
WEBP_MAGIC = b"WEBP"
VP8L_TAG = b"VP8L"


class LossyWebPError(ValueError):
    """Container holds a lossy 'VP8 ' chunk — out of the from-scratch
    VP8L scope; callers may route to the system libwebp binding (r07,
    ADVICE: a typed contract instead of exception-message matching)."""


class ExtendedWebPError(ValueError):
    """Container is a VP8X extended file (may carry alpha) — same typed
    routing contract as LossyWebPError."""
VP8L_SIGNATURE = 0x2F

MAX_PIXEL_BYTES = 64 * 1024 * 1024

# code-length-code symbol transmission order (spec section 6.2.2)
_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

# 120-entry (dx, dy) neighbor map for LZ77 distance codes 1..120
# (spec section 5.2.2, verbatim)
_DIST_MAP: List[Tuple[int, int]] = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


# ---------------------------------------------------------------------------
# LSB-first bit IO
# ---------------------------------------------------------------------------


def _rev_bits(code: int, length: int) -> int:
    """Reverse the low ``length`` bits of ``code`` (prefix codes are
    tree-walk MSB-first; the VP8L bitstream is LSB-first)."""
    r = 0
    for _ in range(length):
        r = (r << 1) | (code & 1)
        code >>= 1
    return r


class _BitWriter:
    def __init__(self) -> None:
        self._acc = 0
        self._n = 0
        self._out = bytearray()

    def write(self, value: int, nbits: int) -> None:
        """Append ``nbits`` of ``value``, LSB first."""
        self._acc |= (value & ((1 << nbits) - 1)) << self._n
        self._n += nbits
        while self._n >= 8:
            self._out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def write_code(self, code: int, length: int) -> None:
        """Prefix codes are written MSB-of-code first (tree walk order) —
        equivalently, ONE LSB-first write of the bit-reversed code (r07:
        the per-bit loop dominated encode time; `write(_rev_bits(code,
        length), length)` emits the identical stream)."""
        self.write(_rev_bits(code, length), length)

    def flush(self) -> bytes:
        if self._n:
            self._out.append(self._acc & 0xFF)
            self._acc, self._n = 0, 0
        return bytes(self._out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0
        self._acc = 0
        self._n = 0

    def read(self, nbits: int) -> int:
        while self._n < nbits:
            if self._pos >= len(self._data):
                raise ValueError("truncated VP8L bitstream")
            self._acc |= self._data[self._pos] << self._n
            self._pos += 1
            self._n += 8
        v = self._acc & ((1 << nbits) - 1)
        self._acc >>= nbits
        self._n -= nbits
        return v

    def peek(self, nbits: int) -> int:
        """Next ``nbits`` without consuming, ZERO-PADDED past the end of
        data (r07, for the LUT fast path; ``self._n`` afterwards tells the
        caller how many of the peeked bits are real)."""
        while self._n < nbits and self._pos < len(self._data):
            self._acc |= self._data[self._pos] << self._n
            self._pos += 1
            self._n += 8
        return self._acc & ((1 << nbits) - 1)

    def consume(self, nbits: int) -> None:
        """Drop ``nbits`` previously peeked REAL bits (caller must have
        checked ``nbits <= self._n``)."""
        self._acc >>= nbits
        self._n -= nbits


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------


def _canonical_codes(lengths: Sequence[int]) -> Dict[int, Tuple[int, int]]:
    """symbol -> (code, length), canonical (sorted by length then symbol)."""
    pairs = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    codes: Dict[int, Tuple[int, int]] = {}
    code = 0
    prev_len = pairs[0][0] if pairs else 0
    for length, sym in pairs:
        code <<= length - prev_len
        codes[sym] = (code, length)
        code += 1
        prev_len = length
    return codes


class _PrefixDecoder:
    """Bit-at-a-time canonical prefix decoder (plus 0-bit single-symbol)."""

    def __init__(self, lengths: Sequence[int]) -> None:
        nonzero = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not nonzero:
            raise ValueError("empty prefix code")
        if len(nonzero) == 1:
            self.single: int | None = nonzero[0][1]
            self.table: Dict[Tuple[int, int], int] = {}
            return
        self.single = None
        codes = _canonical_codes(lengths)
        # validate the code is COMPLETE: a multi-symbol canonical prefix
        # code must satisfy Kraft equality.  Over-subscription makes
        # decoding ambiguous; under-subscription (incomplete code) means
        # some bit sequences decode to nothing — spec-conformant decoders
        # reject both, and accepting incomplete codes let some invalid
        # VP8L streams decode to pixels instead of raising.
        kraft = sum(1 / (1 << l) for _, (c, l) in codes.items())
        if abs(kraft - 1.0) > 1e-9:
            raise ValueError("incomplete or over-subscribed prefix code")
        self.table = {(c, l): s for s, (c, l) in codes.items()}
        self.max_len = max(l for _, (c, l) in codes.items())
        # one-level LUT over max_len peeked bits (r07): a code of length l
        # occupies every index whose LOW l bits equal the bit-reversed
        # code (the stream is LSB-first).  Kraft equality above guarantees
        # full coverage.  Bounded to <=2^12 entries; deeper codes keep the
        # exact bit-at-a-time path.
        if self.max_len <= 12:
            lut: List = [None] * (1 << self.max_len)
            for s, (c, l) in codes.items():
                base = _rev_bits(c, l)
                ent = (s, l)
                for high in range(1 << (self.max_len - l)):
                    lut[base | (high << l)] = ent
            self.lut: List | None = lut
        else:
            self.lut = None

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        lut = self.lut
        if lut is not None:
            ent = lut[br.peek(self.max_len)]
            # ent[1] <= br._n means every matched bit is REAL (not the
            # zero padding peek applies at end-of-data): safe to consume.
            # Otherwise fall through to the exact path so truncation and
            # invalid-code errors are raised identically to the r06 code.
            if ent is not None and ent[1] <= br._n:
                br.consume(ent[1])
                return ent[0]
        code, length = 0, 0
        while True:
            code = (code << 1) | br.read(1)
            length += 1
            sym = self.table.get((code, length))
            if sym is not None:
                return sym
            if length > self.max_len:
                raise ValueError("invalid prefix code in VP8L stream")


def _build_lengths(hist: Sequence[int], max_len: int) -> List[int]:
    """Huffman code lengths from a histogram, depth-capped at ``max_len``
    (fixture alphabets are small; a cap violation rebuilds with flattened
    weights, and a final check raises rather than emit a bad stream)."""
    weights = list(hist)
    for _ in range(8):
        syms = [s for s, w in enumerate(weights) if w > 0]
        if len(syms) <= 1:
            return [1 if w > 0 else 0 for w in weights]
        heap = [(w, s, (s,)) for s, w in enumerate(weights) if w > 0]
        heapq.heapify(heap)
        depth = [0] * len(weights)
        while len(heap) > 1:
            w1, t1, m1 = heapq.heappop(heap)
            w2, t2, m2 = heapq.heappop(heap)
            for s in m1 + m2:
                depth[s] += 1
            heapq.heappush(heap, (w1 + w2, min(t1, t2), m1 + m2))
        if max(depth) <= max_len:
            return depth
        # flatten: halving spreads the tree (standard depth-limit fallback)
        weights = [(w + 1) // 2 if w > 0 else 0 for w in weights]
    raise ValueError("cannot build depth-limited prefix code")


# ---------------------------------------------------------------------------
# encoder (fixture generation only)
# ---------------------------------------------------------------------------


def _write_prefix_code(bw: _BitWriter, lengths: List[int]) -> None:
    """Emit one prefix code: simple form for <=2 symbols, else the
    code-length-coded normal form (no 16/17/18 repeats — the fixture
    alphabets are small enough that plain lengths + max_symbol win)."""
    syms = [s for s, l in enumerate(lengths) if l > 0]
    if 1 <= len(syms) <= 2:
        bw.write(1, 1)  # simple code
        bw.write(len(syms) - 1, 1)
        first = syms[0]
        if first <= 1:
            bw.write(0, 1)  # first symbol in 1 bit
            bw.write(first, 1)
        else:
            bw.write(1, 1)
            bw.write(first, 8)
        if len(syms) == 2:
            if syms[1] > 255:
                raise ValueError("simple code symbol out of range")
            bw.write(syms[1], 8)
        return
    bw.write(0, 1)  # normal code
    max_symbol = max(syms) + 1
    cl_hist = [0] * 19
    for s in range(max_symbol):
        cl_hist[lengths[s]] += 1
    cl_lengths = _build_lengths(cl_hist, 7)
    # transmit all 19 code-length-code lengths (num_code_lengths = 19)
    bw.write(19 - 4, 4)
    for sym in _CL_ORDER:
        bw.write(cl_lengths[sym], 3)
    # max_symbol short-circuit: pick the smallest length_nbits that fits
    bw.write(1, 1)
    nbits_choice = None
    for i in range(8):
        if max_symbol - 2 < (1 << (2 + 2 * i)):
            nbits_choice = i
            break
    if nbits_choice is None:
        raise ValueError("alphabet too large for max_symbol field")
    bw.write(nbits_choice, 3)
    bw.write(max_symbol - 2, 2 + 2 * nbits_choice)
    cl_codes = _canonical_codes(cl_lengths)
    single = len([l for l in cl_lengths if l > 0]) == 1
    for s in range(max_symbol):
        if not single:
            code, length = cl_codes[lengths[s]]
            bw.write_code(code, length)
        # single-symbol code-length code: zero bits per symbol


def webp_encode(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Transform-free literal-coded VP8L inside a minimal RIFF/WEBP
    container; channels 3 (RGB) or 4 (RGBA) — VP8L has no gray mode."""
    if channels not in (3, 4):
        raise ValueError(f"unsupported channel count {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match dimensions")
    if not (1 <= width <= 1 << 14 and 1 <= height <= 1 << 14):
        raise ValueError("dimensions out of VP8L range")
    n = width * height
    greens = [0] * (256 + 24)
    reds = [0] * 256
    blues = [0] * 256
    alphas = [0] * 256
    for i in range(n):
        off = i * channels
        reds[pixels[off]] += 1
        greens[pixels[off + 1]] += 1
        blues[pixels[off + 2]] += 1
        alphas[pixels[off + 3] if channels == 4 else 255] += 1

    bw = _BitWriter()
    bw.write(VP8L_SIGNATURE, 8)
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(1 if channels == 4 else 0, 1)  # alpha hint
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix image

    code_specs = []
    for hist in (greens, reds, blues, alphas):
        lengths = _build_lengths(hist, 15)
        _write_prefix_code(bw, lengths)
        code_specs.append(_canonical_codes(lengths))
    # distance code: never used -> single-symbol simple code (0 bits/use)
    _write_prefix_code(bw, [1] + [0] * 39)
    g_codes, r_codes, b_codes, a_codes = code_specs

    # per-channel (reversed_code, length) tables so each symbol is ONE
    # LSB-first write (r07); single-symbol codes cost zero bits and are
    # replaced by None to skip the lookup entirely
    rev_specs = [
        None
        if len(codes) == 1
        else {v: (_rev_bits(c, l), l) for v, (c, l) in codes.items()}
        for codes in code_specs
    ]
    g_rev, r_rev, b_rev, a_rev = rev_specs
    bw_write = bw.write
    for i in range(n):
        off = i * channels
        if g_rev is not None:
            v, l = g_rev[pixels[off + 1]]
            bw_write(v, l)
        if r_rev is not None:
            v, l = r_rev[pixels[off]]
            bw_write(v, l)
        if b_rev is not None:
            v, l = b_rev[pixels[off + 2]]
            bw_write(v, l)
        if a_rev is not None:
            v, l = a_rev[pixels[off + 3] if channels == 4 else 255]
            bw_write(v, l)
    payload = bw.flush()
    if len(payload) % 2:
        padded = payload + b"\x00"
    else:
        padded = payload
    chunk = VP8L_TAG + struct.pack("<I", len(payload)) + padded
    return RIFF_MAGIC + struct.pack("<I", 4 + len(chunk)) + WEBP_MAGIC + chunk


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixDecoder:
    lengths = [0] * alphabet_size
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        if br.read(1):
            first = br.read(8)
        else:
            first = br.read(1)
        if first >= alphabet_size:
            raise ValueError("simple-code symbol out of alphabet")
        lengths[first] = 1  # single symbol decodes via 0-bit reads
        if num_symbols == 2:
            second = br.read(8)
            if second >= alphabet_size or second == first:
                raise ValueError("bad simple-code second symbol")
            lengths[second] = 1
        return _PrefixDecoder(lengths)
    num_code_lengths = 4 + br.read(4)  # 4 + 4 bits <= 19 by construction
    cl_lengths = [0] * 19
    for i in range(num_code_lengths):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_dec = _PrefixDecoder(cl_lengths)
    if br.read(1):  # max_symbol present
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = cl_dec.read(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev_len = code_len
        else:
            if code_len == 16:
                repeat, extra, what = 3 + br.read(2), 0, prev_len
            elif code_len == 17:
                repeat, extra, what = 3 + br.read(3), 0, 0
            elif code_len == 18:
                repeat, extra, what = 11 + br.read(7), 0, 0
            else:
                raise ValueError("bad code length symbol")
            if symbol + repeat > alphabet_size:
                raise ValueError("code-length repeat overruns alphabet")
            for _ in range(repeat):
                lengths[symbol] = what
                symbol += 1
    return _PrefixDecoder(lengths)


def _lz77_value(code: int, br: _BitReader) -> int:
    """Spec prefix coding: codes 0-3 literal 1-4; above, offset+extra."""
    if code < 4:
        return code + 1
    extra_bits = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra_bits
    return offset + br.read(extra_bits) + 1


def webp_decode(data: bytes) -> Tuple[int, int, int, bytes]:
    """(width, height, channels, row-major interleaved pixels) for a
    transform-free VP8L stream; ValueError for anything else (lossy VP8
    and extended VP8X containers are the documented boundary)."""
    if data[:4] != RIFF_MAGIC or data[8:12] != WEBP_MAGIC:
        raise ValueError("not a WebP (bad RIFF magic)")
    pos = 12
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if tag == VP8L_TAG:
            payload = body
            break
        if tag == b"VP8 ":
            raise LossyWebPError("lossy WebP (VP8) not supported")
        if tag == b"VP8X":
            raise ExtendedWebPError("extended WebP (VP8X) not supported")
        pos += 8 + size + (size & 1)
    if payload is None:
        raise ValueError("no VP8L chunk found")

    br = _BitReader(payload)
    if br.read(8) != VP8L_SIGNATURE:
        raise ValueError("bad VP8L signature")
    width = br.read(14) + 1
    height = br.read(14) + 1
    alpha_hint = br.read(1)
    if br.read(3) != 0:
        raise ValueError("unsupported VP8L version")
    if width * height * 4 > MAX_PIXEL_BYTES:
        raise ValueError("image too large")
    if br.read(1):
        raise ValueError("VP8L transforms not supported")

    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad color-cache size")
    if br.read(1):
        raise ValueError("VP8L meta prefix image not supported")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    green_dec = _read_prefix_code(br, 256 + 24 + cache_size)
    red_dec = _read_prefix_code(br, 256)
    blue_dec = _read_prefix_code(br, 256)
    alpha_dec = _read_prefix_code(br, 256)
    dist_dec = _read_prefix_code(br, 40)

    n = width * height
    argb: List[int] = []

    def cache_insert(px: int) -> None:
        if cache_size:
            cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px

    while len(argb) < n:
        s = green_dec.read(br)
        if s < 256:
            g = s
            r = red_dec.read(br)
            b = blue_dec.read(br)
            a = alpha_dec.read(br)
            px = (a << 24) | (r << 16) | (g << 8) | b
            argb.append(px)
            cache_insert(px)
        elif s < 256 + 24:
            length = _lz77_value(s - 256, br)
            dist_code = _lz77_value(dist_dec.read(br), br)
            if dist_code <= 120:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dy * width + dx
                if dist < 1:
                    dist = 1
            else:
                dist = dist_code - 120
            if dist > len(argb):
                raise ValueError("LZ77 distance before start of image")
            if len(argb) + length > n:
                raise ValueError("LZ77 copy overruns image")
            for _ in range(length):
                px = argb[-dist]
                argb.append(px)
                cache_insert(px)
        else:
            idx = s - 256 - 24
            if idx >= cache_size:
                raise ValueError("color-cache index out of range")
            argb.append(cache[idx])

    channels = 4 if alpha_hint else 3
    out = bytearray(n * channels)
    for i, px in enumerate(argb):
        off = i * channels
        out[off] = (px >> 16) & 0xFF
        out[off + 1] = (px >> 8) & 0xFF
        out[off + 2] = px & 0xFF
        if channels == 4:
            out[off + 3] = (px >> 24) & 0xFF
    return width, height, channels, bytes(out)
