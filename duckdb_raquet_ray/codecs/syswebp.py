"""Optional binding to the SYSTEM libwebp shared library (ctypes).

Two jobs, both honest about being a system dependency rather than part
of the dependency-free pure-Python codec family:

1. **Lossy VP8 decode.** VP8 lossy is a boolean-coder + DCT format the
   pure-Python webpcodec does not implement. Where the host has
   libwebp.so (this container ships 1.2.4), `decode_rgba` makes the
   `VP8 `-fourcc path REAL; where it doesn't, callers keep the
   documented NotImplementedError. The reference takes exactly the same
   stance: WebP support is compile-time optional behind RAQUET_HAS_WEBP
   (/root/reference/src/raster/band_decoder.cpp:15-17,129-152).

2. **Conformance oracle.** The pure-Python VP8L encoder/decoder pair is
   roundtrip-exact by construction, which cannot detect a *shared* spec
   deviation. tests/test_webpcodec.py cross-validates both directions
   against this binding (our encoder's bytes through libwebp's decoder,
   libwebp's encoder's bytes through our decoder) whenever the library
   is present — this caught two real bitstream bugs (Kraft-incomplete
   degenerate huffman codes; simple-code read-order assignment).

Everything here is lazy and failure-tolerant: no import-time ctypes
work, `available()` is the single gate, and all functions raise a clear
RuntimeError when the library is absent.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

_LIB_CANDIDATES = ("libwebp.so.7", "libwebp.so", "libwebp.7.dylib", "webp")


class _LibCache:
    """Per-process CDLL cache. A ctypes handle cannot be pickled, and Ray
    ships this module BY VALUE to workers (module dict included) — so once
    the driver had loaded the library, a bare module-global handle made the
    whole codecs package unshippable. The cache pickles back to its
    unloaded state; each worker process re-resolves its own handle on
    first use."""

    def __init__(self):
        self.lib = None
        self.tried = False

    def __reduce__(self):
        return (_LibCache, ())


_cache = _LibCache()


def _load():
    if _cache.tried:
        return _cache.lib
    _cache.tried = True
    for name in _LIB_CANDIDATES:
        try:
            cand = ctypes.CDLL(name)
        except OSError:
            found = ctypes.util.find_library(name)
            if not found:
                continue
            try:
                cand = ctypes.CDLL(found)
            except OSError:
                continue
        try:
            cand.WebPGetDecoderVersion.restype = ctypes.c_int
            cand.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
            cand.WebPDecodeRGBA.argtypes = [
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            cand.WebPGetInfo.argtypes = [
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            enc_args = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
            cand.WebPEncodeRGB.restype = ctypes.c_size_t
            cand.WebPEncodeRGB.argtypes = enc_args + [
                ctypes.c_float,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ]
            cand.WebPEncodeRGBA.restype = ctypes.c_size_t
            cand.WebPEncodeRGBA.argtypes = enc_args + [
                ctypes.c_float,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ]
            cand.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
            cand.WebPEncodeLosslessRGB.argtypes = enc_args + [
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))
            ]
            cand.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
            cand.WebPEncodeLosslessRGBA.argtypes = enc_args + [
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))
            ]
        except AttributeError:
            continue
        _cache.lib = cand
        break
    return _cache.lib


def available() -> bool:
    """True iff a usable system libwebp was found."""
    return _load() is not None


def version() -> str:
    lib = _load()
    if lib is None:
        raise RuntimeError("system libwebp not available")
    v = lib.WebPGetDecoderVersion()
    return f"{(v >> 16) & 0xFF}.{(v >> 8) & 0xFF}.{v & 0xFF}"


def decode_rgba(data: bytes) -> np.ndarray:
    """WEBP bytes (lossy VP8 or lossless VP8L) -> (h, w, 4) uint8 RGBA."""
    lib = _load()
    if lib is None:
        raise RuntimeError("system libwebp not available")
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not p:
        raise ValueError("libwebp: decode failed (corrupt or unsupported stream)")
    try:
        out = np.ctypeslib.as_array(p, shape=(h.value, w.value, 4)).copy()
    finally:
        lib.WebPFree(p)
    return out


def _encode(fn, img: np.ndarray, *quality) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = fn(img.tobytes(), w, h, w * c, *quality, ctypes.byref(out))
    if n == 0 or not out:
        raise ValueError("libwebp: encode failed")
    try:
        return ctypes.string_at(out, n)
    finally:
        _load().WebPFree(out)


def encode_lossy(img: np.ndarray, quality: float = 85.0) -> bytes:
    """(h, w, 3|4) uint8 -> lossy VP8 WEBP bytes. Default quality 85
    mirrors the reference's lossy-tile default (reference README.md:240)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("system libwebp not available")
    fn = lib.WebPEncodeRGBA if img.shape[2] == 4 else lib.WebPEncodeRGB
    return _encode(fn, img, ctypes.c_float(quality))


def encode_lossless(img: np.ndarray) -> bytes:
    """(h, w, 3|4) uint8 -> lossless VP8L WEBP bytes (conformance-oracle
    input for the pure-Python decoder)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("system libwebp not available")
    fn = (
        lib.WebPEncodeLosslessRGBA
        if img.shape[2] == 4
        else lib.WebPEncodeLosslessRGB
    )
    return _encode(fn, img)
