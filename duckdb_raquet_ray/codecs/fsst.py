"""FSST-style string compression: a per-partition symbol table of byte
sequences, each occurrence replaced by a 1-byte code.

Follows the public FSST design (Boncz, Neumann, Leis — "FSST: Fast Random
Access String Compression", VLDB 2020): up to 254 symbols of 1..8 bytes,
one reserved escape code; bytes not covered by the table are emitted as
escapes. Two deviations, both for vectorizability in Python/numpy:

- escaped literal bytes go to a *side stream* (code 0xFF in the code stream
  means "take the next byte from the exceptions stream"), which removes the
  sequential escape-pair scan from the decoder;
- the whole concatenated string buffer of a partition is compressed as one
  stream (symbols may span string boundaries); per-string offsets are
  reconstructed from the separately-encoded length column, so random access
  is per-partition, matching the engine's partition-as-coded-unit model
  (the reference's blob-per-tile unit, /root/reference/src/band_decoder.cpp:185-224).

The symbol table is trained deterministically on a prefix sample of the
partition's buffer and serialized inside the blob; its sha256 is recorded
in the manifest (`fsst_symbol_table_hash`).

Round-trip bit-identity is property-tested for arbitrary bytes (including
0xFF literals).
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import numpy as np

ESCAPE = 255
MAX_SYMBOLS = 254  # codes 0..253
_SYM_LENGTHS = (2, 3, 4, 6, 8)
_TRAIN_SAMPLE = 32 * 1024


class SymbolTable:
    """Immutable trained symbol table; build via :func:`train`."""

    def __init__(self, symbols: list[bytes]):
        assert len(symbols) <= MAX_SYMBOLS
        self.symbols = symbols
        self.code_of = {s: i for i, s in enumerate(symbols)}
        # encode-side regex: longest alternatives first for greedy longest match,
        # then any single byte as fallback
        alts = sorted(symbols, key=lambda s: (-len(s), s))
        pattern = b"|".join(re.escape(s) for s in alts)
        pattern = (pattern + b"|" if pattern else b"") + b"(?s:.)"
        self._rx = re.compile(pattern, re.S)
        # decode-side lookup arrays
        symflat = b"".join(symbols)
        lens = np.ones(256, dtype=np.int64)
        starts = np.zeros(256, dtype=np.int64)
        pos = 0
        for i, s in enumerate(symbols):
            lens[i] = len(s)
            starts[i] = pos
            pos += len(s)
        self._symflat = symflat
        self._lens = lens
        self._starts = starts

    # -- serialization ------------------------------------------------------
    def serialize(self) -> bytes:
        head = bytes([len(self.symbols)]) + bytes(len(s) for s in self.symbols)
        return head + self._symflat

    @classmethod
    def deserialize(cls, data: bytes) -> tuple["SymbolTable", int]:
        n = data[0]
        lens = list(data[1 : 1 + n])
        pos = 1 + n
        symbols = []
        for ln in lens:
            symbols.append(data[pos : pos + ln])
            pos += ln
        return cls(symbols), pos

    def sha256(self) -> str:
        return "sha256:" + hashlib.sha256(self.serialize()).hexdigest()

    # -- codec --------------------------------------------------------------
    def encode(self, data: bytes) -> tuple[bytes, bytes]:
        """-> (code stream, exceptions stream)."""
        code_of = self.code_of
        exceptions = bytearray()
        esc = bytes([ESCAPE])

        def repl(m: re.Match) -> bytes:
            s = m.group(0)
            c = code_of.get(s)
            if c is None:
                exceptions.extend(s)  # single byte fallback
                return esc
            return _CODE_BYTES[c]

        codes = self._rx.sub(repl, data)
        return codes, bytes(exceptions)

    def decode(self, codes: bytes, exceptions: bytes) -> bytes:
        if not codes:
            return b""
        arr = np.frombuffer(codes, dtype=np.uint8)
        lens = self._lens[arr]
        starts = self._starts[arr].copy()
        is_esc = arr == ESCAPE
        n_esc = int(is_esc.sum())
        if n_esc:
            esc_rank = np.cumsum(is_esc) - 1
            starts[is_esc] = len(self._symflat) + esc_rank[is_esc]
            lens[is_esc] = 1
        buf = np.frombuffer(self._symflat + exceptions, dtype=np.uint8)
        out_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        total = int(out_starts[-1] + lens[-1]) if len(lens) else 0
        idx = np.repeat(starts - out_starts, lens) + np.arange(total, dtype=np.int64)
        return buf[idx].tobytes()


_CODE_BYTES = [bytes([i]) for i in range(256)]


def train(sample: bytes, max_symbols: int = MAX_SYMBOLS) -> SymbolTable:
    """Deterministically train a symbol table on a byte sample.

    Greedy one-pass selection by estimated gain: a multi-byte symbol of
    length L occurring f times saves ~(L-1)*f bytes; a single-byte symbol
    saves f bytes (vs a 2-byte escape). Ties broken by symbol bytes, so the
    result is a pure function of the sample (bit-identity across resumed
    runs — SURVEY.md §7 hard-part 1).
    """
    sample = sample[:_TRAIN_SAMPLE]
    n = len(sample)
    if n == 0:
        return SymbolTable([])
    scores: Counter = Counter()
    for L in _SYM_LENGTHS:
        if n < L:
            continue
        c: Counter = Counter(sample[i : i + L] for i in range(n - L + 1))
        for s, f in c.items():
            if f >= 2:
                scores[s] = (L - 1) * f
    # single bytes: gain = frequency (escape costs 2 bytes)
    for s, f in Counter(sample[i : i + 1] for i in range(n)).items():
        scores[s] = f
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    symbols = [s for s, _ in ranked[:max_symbols]]
    return SymbolTable(symbols)


# ---------------------------------------------------------------------------
# blob-level API used by blockcodec: blob = [table | lens | codes | exceptions]
# ---------------------------------------------------------------------------


def encode_bytes(data: bytes) -> tuple[bytes, dict]:
    if not isinstance(data, bytes):
        data = bytes(data)  # training/coding index by hashed byte windows
    table = train(data)
    codes, exceptions = table.encode(data)
    tbl = table.serialize()
    desc = {
        "codec": "fsst",
        "raw_size": len(data),
        "sections": [len(tbl), len(codes), len(exceptions)],
        "table_hash": table.sha256(),
    }
    return tbl + codes + exceptions, desc


def decode_bytes(blob: bytes, desc: dict) -> bytes:
    s0, s1, s2 = desc["sections"]
    table, _ = SymbolTable.deserialize(blob[:s0])
    codes = blob[s0 : s0 + s1]
    exceptions = blob[s0 + s1 : s0 + s1 + s2]
    return table.decode(codes, exceptions)
