"""From-scratch BMP (Windows DIB) codec (stdlib only) for the multimodal
feature path.

Third entry in the from-scratch codec series (pycore/pngdec.py,
pycore/jpegdec.py): the reference's CLI accepts ``.bmp`` alongside
PNG/JPEG/TIFF/WebP (``src/main.py:169``) and preprocesses real decoded
pixels (``src/preprocessor.py:81-131``); the sandbox ships no PIL/cv2,
but BMP is an uncompressed container — a 14-byte file header, a 40-byte
BITMAPINFOHEADER, an optional palette, and 4-byte-aligned pixel rows.

Scope (everything a deterministic fixture needs, nothing speculative):
- BITMAPINFOHEADER (40-byte) only; BI_RGB (uncompressed) only
- 8-bit palettized (decoded through the palette; an all-gray palette
  yields 1-channel output, anything else expands to RGB), 24-bit BGR,
  and 32-bit BGRA
- bottom-up (positive height) AND top-down (negative height) row order
  — the fixture encoder alternates, so decoding exercises both branches
- row padding to 4-byte boundaries is written and verified

The encoder exists for fixture generation only; correctness of the
decoder is proven two ways: encode->decode roundtrip identity, and the
driver query's closed-form DuckDB oracle computing the same pixel stats
straight from the generative formula (BMP is lossless, so the oracle
replay is exact — the pixels pass through real padded/bottom-up/BGR
bytes first).
"""

from __future__ import annotations

import struct
from typing import Tuple

BMP_MAGIC = b"BM"

_BITCOUNT = {1: 8, 3: 24, 4: 32}

# header-size cap: fixture images are tiny; a crafted giant dib is cut off
MAX_PIXEL_BYTES = 64 * 1024 * 1024


def _row_stride(width: int, bitcount: int) -> int:
    return ((width * bitcount + 31) // 32) * 4


def bmp_encode(
    width: int, height: int, channels: int, pixels: bytes, top_down: bool = False
) -> bytes:
    """BI_RGB BMP from raw row-major channel-interleaved 8-bit pixels.

    channels: 1 -> 8-bit palettized with an identity grayscale palette,
    3 -> 24-bit BGR, 4 -> 32-bit BGRA.  ``top_down`` stores rows in
    natural order with a negative height; the default writes the
    standard bottom-up layout.  len(pixels) must be width*height*channels.
    """
    if channels not in _BITCOUNT:
        raise ValueError(f"unsupported channel count {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match dimensions")
    bitcount = _BITCOUNT[channels]
    stride = _row_stride(width, bitcount)
    palette = b""
    if channels == 1:
        palette = b"".join(bytes((i, i, i, 0)) for i in range(256))

    rows = []
    for y in range(height):
        off = y * width * channels
        if channels == 1:
            row = pixels[off : off + width]
        elif channels == 3:
            row = bytes(
                pixels[off + x * 3 + c] for x in range(width) for c in (2, 1, 0)
            )
        else:
            row = bytes(
                pixels[off + x * 4 + c] for x in range(width) for c in (2, 1, 0, 3)
            )
        rows.append(row + b"\x00" * (stride - len(row)))
    if not top_down:
        rows.reverse()
    body = b"".join(rows)

    data_off = 14 + 40 + len(palette)
    file_hdr = struct.pack("<2sIHHI", BMP_MAGIC, data_off + len(body), 0, 0, data_off)
    info_hdr = struct.pack(
        "<IiiHHIIiiII",
        40,
        width,
        -height if top_down else height,
        1,
        bitcount,
        0,  # BI_RGB
        len(body),
        2835,
        2835,
        256 if channels == 1 else 0,
        0,
    )
    return file_hdr + info_hdr + palette + body


def bmp_decode(data: bytes) -> Tuple[int, int, int, bytes]:
    """(width, height, channels, row-major interleaved pixels) or
    ValueError for anything outside the supported envelope (bad magic,
    compressed DIB, bitcount not 8/24/32, truncated rows, V4/V5-only
    features beyond the 40-byte core are tolerated but their extra
    header bytes must still parse)."""
    if data[:2] != BMP_MAGIC:
        raise ValueError("not a BMP (bad magic)")
    if len(data) < 14 + 40:
        raise ValueError("truncated BMP header")
    _, _fsize, _, _, data_off = struct.unpack_from("<2sIHHI", data, 0)
    (
        hdr_size,
        width,
        raw_height,
        planes,
        bitcount,
        compression,
        _img_size,
        _xppm,
        _yppm,
        colors_used,
        _colors_imp,
    ) = struct.unpack_from("<IiiHHIIiiII", data, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    if planes != 1:
        raise ValueError(f"bad plane count {planes}")
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression}")
    if bitcount not in (8, 24, 32):
        raise ValueError(f"unsupported bit count {bitcount}")
    top_down = raw_height < 0
    height = -raw_height if top_down else raw_height
    if width <= 0 or height <= 0:
        raise ValueError("bad dimensions")
    if data_off < 14 + hdr_size:
        raise ValueError("pixel data offset inside headers")

    palette = None
    if bitcount == 8:
        n_colors = colors_used or 256
        if n_colors > 256:
            raise ValueError(f"bad palette size {n_colors}")
        pal_off = 14 + hdr_size
        pal_end = pal_off + 4 * n_colors
        if pal_end > len(data) or pal_end > data_off:
            raise ValueError("truncated palette")
        palette = [
            (data[pal_off + 4 * i + 2], data[pal_off + 4 * i + 1], data[pal_off + 4 * i])
            for i in range(n_colors)
        ]

    stride = _row_stride(width, bitcount)
    if stride * height > MAX_PIXEL_BYTES:
        raise ValueError("image too large")
    if data_off + stride * height > len(data):
        raise ValueError("truncated pixel data")

    if bitcount == 8:
        gray_palette = all(r == g == b for r, g, b in palette)
        channels = 1 if gray_palette else 3
    else:
        channels = bitcount // 8

    # vectorized row unpack: one ndarray view over the padded rows, then a
    # channel reorder (BGR(A)->RGB(A)) or palette gather — no per-pixel
    # Python (the decode hot path runs inside mapInArrow at corpus scale)
    import numpy as np

    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * height, offset=data_off
    ).reshape(height, stride)
    if not top_down:
        rows = rows[::-1]
    if bitcount == 8:
        idx = rows[:, :width]
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("palette index out of range")
        pal = np.asarray(palette, dtype=np.uint8)  # (n, 3) RGB
        if channels == 1:
            out = pal[idx.reshape(-1), 0]
        else:
            out = pal[idx.reshape(-1)].reshape(-1)
    else:
        px = rows[:, : width * channels].reshape(height, width, channels)
        order = [2, 1, 0] if channels == 3 else [2, 1, 0, 3]
        out = px[:, :, order].reshape(-1)
    return width, height, channels, out.tobytes()
