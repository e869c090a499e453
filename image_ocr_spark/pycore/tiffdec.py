"""From-scratch baseline TIFF codec (stdlib only) for the multimodal
feature path.

Fourth entry in the from-scratch codec series (pngdec/jpegdec/bmpdec):
the reference's CLI accepts ``.tiff``/``.tif`` (``src/main.py:169``) and
preprocesses real decoded pixels (``src/preprocessor.py:81-131``).
Baseline TIFF is a tag directory plus raw strips — no entropy coding —
so a complete little/big-endian reader is small and exact.

Scope (everything a deterministic fixture needs, nothing speculative):
- classic TIFF (magic 42), single IFD, 8-bit samples
- both byte orders ("II" little- and "MM" big-endian) — the fixture
  encoder alternates, so decoding exercises both
- PhotometricInterpretation 1 (BlackIsZero gray) and 2 (RGB), with
  SamplesPerPixel 1/3/4 (4 = RGB + unassociated alpha via ExtraSamples)
- Compression 1 (none) AND 32773 (PackBits) — encode and decode; the
  fixture alternates, so both paths are exercised
- multi-strip images (RowsPerStrip < height): offsets/bytecounts read
  inline or from external arrays, whichever the count requires

The encoder exists for fixture generation only; correctness of the
decoder is proven two ways: encode->decode roundtrip identity, and the
driver query's closed-form DuckDB oracle computing the same pixel stats
straight from the generative formula (TIFF is lossless here, so the
oracle replay is exact — the pixels pass through real strip/PackBits/
byte-order plumbing first).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

TIFF_MAGIC_LE = b"II*\x00"
TIFF_MAGIC_BE = b"MM\x00*"

_TYPE_SIZE = {3: 2, 4: 4}  # SHORT, LONG

# strip-size cap: fixture images are tiny; a crafted giant strip is cut off
MAX_PIXEL_BYTES = 64 * 1024 * 1024


def packbits_encode(data: bytes) -> bytes:
    """Apple PackBits RLE: runs of >=2 identical bytes become
    (1-run) signed + value; literals accumulate up to 128."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        lit_start = i
        i += 1
        while (
            i < n
            and i - lit_start < 128
            and not (i + 1 < n and data[i + 1] == data[i])
        ):
            i += 1
        out.append(i - lit_start - 1)
        out += data[lit_start:i]
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    """Inverse of packbits_encode; raises if output != ``expected`` bytes."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        c = data[i]
        i += 1
        if c == 128:  # noop
            continue
        if c < 128:  # literal run of c+1 bytes
            if i + c + 1 > n:
                raise ValueError("truncated PackBits literal")
            out += data[i : i + c + 1]
            i += c + 1
        else:  # repeat next byte 257-c times
            if i >= n:
                raise ValueError("truncated PackBits run")
            out += bytes([data[i]]) * (257 - c)
            i += 1
    if len(out) != expected:
        raise ValueError(f"PackBits expanded to {len(out)}, want {expected}")
    return bytes(out)


def tiff_encode(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    big_endian: bool = False,
    packbits: bool = False,
    rows_per_strip: int = 2,
) -> bytes:
    """Classic single-IFD TIFF from raw row-major interleaved 8-bit
    pixels; channels 1 (gray), 3 (RGB), or 4 (RGB + alpha)."""
    if channels not in (1, 3, 4):
        raise ValueError(f"unsupported channel count {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match dimensions")
    e = ">" if big_endian else "<"
    rps = max(1, min(rows_per_strip, height))
    stride = width * channels
    strips: List[bytes] = []
    for y0 in range(0, height, rps):
        raw = pixels[y0 * stride : min(y0 + rps, height) * stride]
        strips.append(packbits_encode(raw) if packbits else raw)
    nstrips = len(strips)

    # (tag, type, count, values) in ascending tag order
    entries: List[Tuple[int, int, int, List[int]]] = [
        (256, 3, 1, [width]),
        (257, 3, 1, [height]),
        (258, 3, channels, [8] * channels),
        (259, 3, 1, [32773 if packbits else 1]),
        (262, 3, 1, [1 if channels == 1 else 2]),
        (273, 4, nstrips, [0] * nstrips),  # offsets patched below
        (277, 3, 1, [channels]),
        (278, 3, 1, [rps]),
        (279, 4, nstrips, [len(s) for s in strips]),
    ]
    if channels == 4:
        entries.append((338, 3, 1, [2]))  # unassociated alpha

    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    ext_off = ifd_off + ifd_size
    ext = bytearray()

    def value_field(typ: int, count: int, values: List[int]) -> bytes:
        nonlocal ext
        fmt = {3: "H", 4: "I"}[typ]
        packed = b"".join(struct.pack(e + fmt, v) for v in values)
        if len(packed) <= 4:
            return packed + b"\x00" * (4 - len(packed))
        off = ext_off + len(ext)
        ext += packed
        return struct.pack(e + "I", off)

    # lay out external arrays first (two-pass: strip offsets depend on
    # total external size, so reserve their slots, then patch)
    fields = []
    strip_field_idx = None
    for i, (tag, typ, count, values) in enumerate(entries):
        if tag == 273:
            strip_field_idx = i
            fields.append(None)  # placeholder
            if 4 * count > 4:
                ext += b"\x00" * 4 * count  # reserve
            continue
        fields.append(value_field(typ, count, values))

    data_start = ext_off + len(ext)
    offsets = []
    pos = data_start
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    packed = b"".join(struct.pack(e + "I", v) for v in offsets)
    if len(packed) <= 4:
        fields[strip_field_idx] = packed + b"\x00" * (4 - len(packed))
    else:
        # find the reserved slot: it is the FIRST reserved region, placed
        # in entry order among external blobs
        reserved_at = 0
        for tag, typ, count, values in entries[:strip_field_idx]:
            fmt_size = _TYPE_SIZE[typ] * count
            if fmt_size > 4:
                reserved_at += fmt_size
        ext[reserved_at : reserved_at + len(packed)] = packed
        fields[strip_field_idx] = struct.pack(e + "I", ext_off + reserved_at)

    out = bytearray()
    out += (TIFF_MAGIC_BE if big_endian else TIFF_MAGIC_LE)
    out += struct.pack(e + "I", ifd_off)
    out += struct.pack(e + "H", len(entries))
    for (tag, typ, count, _), field in zip(entries, fields):
        out += struct.pack(e + "HHI", tag, typ, count)[:8] + field
    out += struct.pack(e + "I", 0)  # next IFD
    out += ext
    for s in strips:
        out += s
    return bytes(out)


def _read_values(data: bytes, e: str, typ: int, count: int, field: bytes) -> List[int]:
    size = _TYPE_SIZE.get(typ)
    if size is None:
        raise ValueError(f"unsupported TIFF field type {typ}")
    fmt = {3: "H", 4: "I"}[typ]
    total = size * count
    if total <= 4:
        buf = field[:total]
    else:
        (off,) = struct.unpack(e + "I", field)
        if off + total > len(data):
            raise ValueError("TIFF value array out of bounds")
        buf = data[off : off + total]
    return [struct.unpack_from(e + fmt, buf, i * size)[0] for i in range(count)]


def tiff_decode(data: bytes) -> Tuple[int, int, int, bytes]:
    """(width, height, channels, row-major interleaved pixels) or
    ValueError for anything outside the supported envelope (bad magic,
    non-8-bit samples, unknown compression, tiled images, bad strips)."""
    if data[:4] == TIFF_MAGIC_LE:
        e = "<"
    elif data[:4] == TIFF_MAGIC_BE:
        e = ">"
    else:
        raise ValueError("not a TIFF (bad magic)")
    if len(data) < 8:
        raise ValueError("truncated TIFF header")
    (ifd_off,) = struct.unpack_from(e + "I", data, 4)
    if ifd_off + 2 > len(data):
        raise ValueError("IFD offset out of bounds")
    (n_entries,) = struct.unpack_from(e + "H", data, ifd_off)
    if ifd_off + 2 + 12 * n_entries + 4 > len(data):
        raise ValueError("truncated IFD")

    tags: Dict[int, Tuple[int, int, bytes]] = {}
    for i in range(n_entries):
        base = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(e + "HHI", data, base)
        tags[tag] = (typ, count, data[base + 8 : base + 12])

    def get(tag: int, default=None) -> List[int]:
        if tag not in tags:
            if default is not None:
                return default
            raise ValueError(f"missing required TIFF tag {tag}")
        typ, count, field = tags[tag]
        return _read_values(data, e, typ, count, field)

    if 322 in tags or 323 in tags:
        raise ValueError("tiled TIFF not supported")
    width = get(256)[0]
    height = get(257)[0]
    channels = get(277, [1])[0]
    bits = get(258, [8] * channels)
    compression = get(259, [1])[0]
    photometric = get(262)[0]
    if width <= 0 or height <= 0:
        raise ValueError("bad dimensions")
    if channels not in (1, 3, 4):
        raise ValueError(f"unsupported sample count {channels}")
    if len(bits) != channels or any(b != 8 for b in bits):
        raise ValueError(f"unsupported bits per sample {bits}")
    if compression not in (1, 32773):
        raise ValueError(f"unsupported TIFF compression {compression}")
    if photometric not in (1, 2):
        raise ValueError(f"unsupported photometric {photometric}")
    if photometric == 2 and channels < 3:
        raise ValueError("RGB photometric needs >=3 samples")

    stride = width * channels
    if stride * height > MAX_PIXEL_BYTES:
        raise ValueError("image too large")
    offsets = get(273)
    counts = get(279)
    if len(offsets) != len(counts) or not offsets:
        raise ValueError("strip offsets/bytecounts mismatch")
    rps = get(278, [height])[0]
    rps = min(rps, height) or height
    if (height + rps - 1) // rps != len(offsets):
        raise ValueError("strip count does not match RowsPerStrip")

    out = bytearray()
    for i, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(data):
            raise ValueError("strip out of bounds")
        rows = min(rps, height - i * rps)
        raw = data[off : off + cnt]
        if compression == 32773:
            raw = packbits_decode(raw, rows * stride)
        elif len(raw) != rows * stride:
            raise ValueError("strip byte count does not match rows")
        out += raw
    if len(out) != stride * height:
        raise ValueError("decoded pixel size mismatch")
    return width, height, channels, bytes(out)
