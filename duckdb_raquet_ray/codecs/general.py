"""General-purpose byte compression fallback (zstd via pyarrow, zlib stdlib).

The analogue of the reference's gzip fallback blob codec
(/root/reference/src/band_encoder.cpp:190-203 `compress_gzip`,
/root/reference/src/band_decoder.cpp:35-75 auto-detect inflate): when no
lightweight codec wins, bytes go through a general compressor. We prefer
zstd (bundled with pyarrow, C speed); zlib is the always-available fallback.
"""

from __future__ import annotations

import zlib

import pyarrow as pa


def _zstd_available() -> bool:
    try:
        pa.Codec("zstd")
        return True
    except Exception:
        return False


HAVE_ZSTD = _zstd_available()
DEFAULT_GENERAL = "zstd" if HAVE_ZSTD else "zlib"


def compress(data: bytes, method: str = DEFAULT_GENERAL) -> bytes:
    if method == "zstd":
        return pa.compress(data, codec="zstd", asbytes=True)
    if method == "zlib":
        return zlib.compress(data, 6)
    if method == "none":
        return data
    raise ValueError(f"unknown general compression {method!r}")


def decompress(data: bytes, method: str, raw_size: int) -> bytes:
    if method == "zstd":
        return pa.decompress(data, decompressed_size=raw_size, codec="zstd", asbytes=True)
    if method == "zlib":
        return zlib.decompress(data)
    if method == "none":
        return data
    raise ValueError(f"unknown general compression {method!r}")
