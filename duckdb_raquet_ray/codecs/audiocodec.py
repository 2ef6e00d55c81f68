"""Dependency-free WAV (RIFF/PCM) audio codec.

Extends the imagecodec/jpegcodec discipline (stdlib struct + numpy only)
to audio, so the multimodal audio stage decodes REAL payloads in a
container with no audio libraries. The reference's analogue is its
self-contained per-blob codecs (/root/reference/src/band_decoder.cpp) —
a WAV chunk is likewise fully self-describing.

Scope (documented, loud on anything else):
  - RIFF/WAVE with a `fmt ` chunk of format 1 (integer PCM; 8/16/24/32
    bit) or 3 (IEEE float32), mono or multi-channel, any sample rate,
  - unknown chunks (LIST, fact, ...) are skipped,
  - compressed formats (mp3/aac/ogg inside other containers) raise
    ValueError naming the format tag.

Decoded form: (samples, sample_rate) where samples is int32 (PCM,
24-bit widened) or float32, shape (n,) mono or (n, channels).
"""

from __future__ import annotations

import struct

import numpy as np


def sniff(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (samples, sample_rate)."""
    if not sniff(data):
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if pos + 8 + clen > len(data):
            raise ValueError(
                f"corrupt WAV: chunk {cid!r} claims {clen} bytes but only "
                f"{len(data) - pos - 8} remain (truncated download?)"
            )
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError(f"corrupt WAV: fmt chunk is {clen} bytes (< 16)")
            tag, channels, rate, _brate, _align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            fmt = (tag, channels, rate, bits)
        elif cid == b"data":
            raw = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("corrupt WAV: missing fmt/data chunk")
    tag, channels, rate, bits = fmt
    if tag == 1:  # integer PCM
        if bits == 8:
            s = np.frombuffer(raw, dtype=np.uint8).astype(np.int32) - 128
        elif bits == 16:
            s = np.frombuffer(raw, dtype="<i2").astype(np.int32)
        elif bits == 24:
            b = np.frombuffer(raw, dtype=np.uint8)
            n = len(b) // 3
            b = b[: n * 3].reshape(n, 3).astype(np.int32)
            s = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            s = np.where(s >= 1 << 23, s - (1 << 24), s)
        elif bits == 32:
            s = np.frombuffer(raw, dtype="<i4").astype(np.int32)
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif tag == 3:  # IEEE float
        if bits != 32:
            raise ValueError(f"unsupported float bit depth {bits}")
        s = np.frombuffer(raw, dtype="<f4").copy()
    else:
        raise ValueError(
            f"unsupported WAV format tag {tag} (only PCM=1 and float=3; "
            "compressed audio requires a codec library not installed here)"
        )
    if channels > 1:
        n = len(s) // channels
        s = s[: n * channels].reshape(n, channels)
    return s, int(rate)


def wav_encode(samples: np.ndarray, rate: int) -> bytes:
    """int 16-bit PCM WAV bytes from (n,) or (n, channels) samples.
    Integer input clips to int16; FLOATING input follows the [-1, 1]
    convention (what wav_decode returns for format-3 WAVs) and scales by
    32767 — clipping floats directly would silently flatten real audio
    to {-1, 0, 1}."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    channels = s.shape[1]
    if s.dtype.kind == "f":
        s = np.round(np.clip(s, -1.0, 1.0) * 32767.0)
    pcm = np.clip(s, -32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, int(rate), int(rate) * channels * 2,
                      channels * 2, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks
