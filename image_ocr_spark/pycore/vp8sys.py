"""System-codec binding for LOSSY WebP (VP8 key frames) via ctypes.

The from-scratch codec family (pngdec / jpegdec / bmpdec / tiffdec /
webpdec-VP8L) covers every raster format in the reference's allowlist
(`/root/reference/src/main.py:169-176`) except lossy VP8.  A conformant
VP8 decoder is ~95% spec CONSTANT DATA (two ~4 KB default/update
coefficient-probability tables, quantizer tables, token trees, RFC 6386
§13) rather than logic; transcribing those tables without the RFC text
or a conformance vector set in the container could not honestly claim
spec conformance — an encoder/decoder pair built that way only proves it
agrees with itself, which the lossless codecs already demonstrate.  The
container DOES ship the reference C implementation (libwebp.so.7), so
lossy decode binds to it — the same system-decoder posture the
reference repo takes for its entire OCR stage (Tesseract via
pytesseract).  Everything is gated: ``vp8_available()`` is False when
the library is absent, and callers keep the documented ValueError
boundary (`webpdec.webp_decode` itself stays pure from-scratch).

The binding doubles as an EXTERNAL CONFORMANCE ORACLE for the
from-scratch VP8L decoder: tests/test_webpdec.py decodes the fixture
encoder's lossless streams with libwebp and asserts pixel byte-identity
against pycore ``webp_decode`` — cross-validation of the from-scratch
codec against the reference C implementation, not just against its own
encoder.
"""

from __future__ import annotations

import ctypes
import ctypes.util
from typing import Optional, Tuple

_LIB_NAMES = ("libwebp.so.7", "libwebp.so", "webp", "libwebp.7.dylib")
_lib_cache: list = []  # [lib_or_None] once probed


def _lib() -> Optional[ctypes.CDLL]:
    if _lib_cache:
        return _lib_cache[0]
    lib = None
    for name in _LIB_NAMES:
        try:
            if name == "webp":
                found = ctypes.util.find_library("webp")
                if not found:
                    continue
                name = found
            lib = ctypes.CDLL(name)
            break
        except OSError:
            continue
    if lib is not None:
        try:
            lib.WebPDecodeRGB.restype = ctypes.POINTER(ctypes.c_uint8)
            lib.WebPDecodeRGB.argtypes = [
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
            lib.WebPDecodeRGBA.argtypes = lib.WebPDecodeRGB.argtypes
            lib.WebPEncodeRGB.restype = ctypes.c_size_t
            lib.WebPEncodeRGB.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_float,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ]
            lib.WebPEncodeRGBA.restype = ctypes.c_size_t
            lib.WebPEncodeRGBA.argtypes = lib.WebPEncodeRGB.argtypes
            lib.WebPFree.restype = None
            lib.WebPFree.argtypes = [ctypes.c_void_p]
        except AttributeError:
            lib = None  # ancient build without the needed entry points
    _lib_cache.append(lib)
    return lib


def vp8_available() -> bool:
    """True when the system libwebp binding is usable in this process."""
    return _lib() is not None


def decode_rgb(data: bytes) -> Tuple[int, int, int, bytes]:
    """(width, height, 3, row-major RGB bytes) via libwebp — lossy VP8
    and any other container libwebp accepts.  Raises ValueError on
    decode failure or when the library is absent."""
    lib = _lib()
    if lib is None:
        raise ValueError("lossy WebP (VP8) not supported: no system libwebp")
    w, h = ctypes.c_int(0), ctypes.c_int(0)
    ptr = lib.WebPDecodeRGB(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not ptr:
        raise ValueError("libwebp failed to decode WebP payload")
    try:
        n = w.value * h.value * 3
        px = ctypes.string_at(ptr, n)
    finally:
        lib.WebPFree(ctypes.cast(ptr, ctypes.c_void_p))
    return w.value, h.value, 3, px


def decode_rgba(data: bytes) -> Tuple[int, int, int, bytes]:
    """(width, height, 4, row-major RGBA bytes) via libwebp."""
    lib = _lib()
    if lib is None:
        raise ValueError("WebP decode not supported: no system libwebp")
    w, h = ctypes.c_int(0), ctypes.c_int(0)
    ptr = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not ptr:
        raise ValueError("libwebp failed to decode WebP payload")
    try:
        n = w.value * h.value * 4
        px = ctypes.string_at(ptr, n)
    finally:
        lib.WebPFree(ctypes.cast(ptr, ctypes.c_void_p))
    return w.value, h.value, 4, px


def encode_lossy_rgb(
    width: int, height: int, pixels: bytes, quality: float = 90.0
) -> bytes:
    """Lossy VP8 .webp bytes from row-major RGB pixels via libwebp —
    the fixture/egress direction for exercising the lossy decode path
    with REAL VP8 streams."""
    lib = _lib()
    if lib is None:
        raise ValueError("lossy WebP (VP8) encode needs system libwebp")
    if len(pixels) != width * height * 3:
        raise ValueError("pixel buffer does not match width*height*3")
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = lib.WebPEncodeRGB(
        pixels, width, height, width * 3, ctypes.c_float(quality),
        ctypes.byref(out),
    )
    if not size or not out:
        raise ValueError("libwebp failed to encode")
    try:
        return ctypes.string_at(out, size)
    finally:
        lib.WebPFree(ctypes.cast(out, ctypes.c_void_p))


def encode_lossy_rgba(
    width: int, height: int, pixels: bytes, quality: float = 90.0
) -> bytes:
    """Lossy .webp bytes from RGBA pixels — libwebp emits a VP8X
    extended container with an ALPH chunk, the fixture for the VP8X
    decode route."""
    lib = _lib()
    if lib is None:
        raise ValueError("lossy WebP (VP8X) encode needs system libwebp")
    if len(pixels) != width * height * 4:
        raise ValueError("pixel buffer does not match width*height*4")
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = lib.WebPEncodeRGBA(
        pixels, width, height, width * 4, ctypes.c_float(quality),
        ctypes.byref(out),
    )
    if not size or not out:
        raise ValueError("libwebp failed to encode")
    try:
        return ctypes.string_at(out, size)
    finally:
        lib.WebPFree(ctypes.cast(out, ctypes.c_void_p))
