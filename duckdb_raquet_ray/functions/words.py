"""Vectorized whitespace word splitting + hashing over Arrow string
arrays — the shared kernel behind the word-tokenize family (n-gram
dedup/decontamination, SimHash, hashed tokenization, BM25/phrase
retrieval, duplicate-span removal, language ID).

House kernel rule (the chunk_batch gather discipline): no per-document
Python in any hot path. The split is Arrow's `utf8_split_whitespace`
(one C pass), empties are filtered flat-wise (leading/trailing
whitespace produces '' elements; dropping them reproduces Python
``str.split()`` exactly), per-doc word counts come from a bincount over
`list_parent_indices`, and hashing runs directly on the flat array's
raw UTF-8 buffers (zero-copy — no ``"".join`` / per-string ``len``
pass, see `hash_string_array`).

Lowercasing uses `pc.utf8_lower` (Unicode SIMPLE case mapping), which
matches DuckDB's `lower()` — the oracle engine — where Python's
``str.lower`` diverges (full mapping: 'İ'.lower() grows a combining
dot; DuckDB and Arrow both map it to plain 'i').
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import detmix

__all__ = [
    "flat_utf8",
    "hash_string_array",
    "split_ws",
    "split_ws_hashes",
]


def _as_array(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def flat_utf8(arr: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """-> (data uint8, lens int64): the raw UTF-8 bytes and per-string
    BYTE lengths of a (large_)string array, zero-copy (offset-aware
    buffer views — the pipelines/text.py chunk-gather pattern). Nulls
    must be filled by the caller (loud check: a silent 0-length null
    would hash like the empty string and mask caller bugs)."""
    a = _as_array(arr)
    if a.null_count:
        raise ValueError("flat_utf8: fill nulls before hashing")
    if pa.types.is_large_string(a.type):
        odt = np.int64
    elif pa.types.is_string(a.type):
        odt = np.int32
    else:
        raise TypeError(f"flat_utf8: expected a string array, got {a.type}")
    if len(a) == 0:
        return np.zeros(0, np.uint8), np.zeros(0, np.int64)
    off = np.frombuffer(a.buffers()[1], odt)[a.offset : a.offset + len(a) + 1]
    data = np.frombuffer(a.buffers()[2] or b"", np.uint8)[off[0] : off[-1]]
    return data, np.diff(off).astype(np.int64)


def hash_string_array(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """detmix.string_hash64 of every element of an Arrow string array,
    computed on the array's own UTF-8 buffers — no Python-object
    round trip. Byte-identical to ``string_hash64(np.array(objects))``
    (both hash UTF-8 bytes through the base-257 Horner + splitmix64)."""
    data, lens = flat_utf8(arr)
    return detmix.hash_utf8_segments(data, lens)


def split_ws(
    col: pa.Array | pa.ChunkedArray, *, lower: bool = False
) -> tuple[np.ndarray, pa.Array]:
    """Whitespace-split every string -> (lens int64 per doc, flat words
    as ONE Arrow string array, doc-major order). Exactly Python
    ``str.split()`` semantics: split on runs of Unicode whitespace, no
    empty words, null docs count as 0 words. ``lower=True`` lowercases
    the flat words (simple mapping — the DuckDB ``lower()`` twin)."""
    a = _as_array(col)
    filled = pc.fill_null(a, "")
    lists = pc.utf8_split_whitespace(filled)
    flat = pc.list_flatten(lists)
    # drop '' elements (leading/trailing whitespace artifacts of the
    # maximal-run splitter) — what distinguishes str.split() from
    # str.split(' ')
    mask = pc.greater(pc.binary_length(flat), 0)
    np_mask = mask.to_numpy(zero_copy_only=False)
    parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)[np_mask]
    words = flat.filter(mask)
    if lower:
        words = pc.utf8_lower(words)
    lens = np.bincount(parent, minlength=len(a)).astype(np.int64)
    return lens, words


def split_ws_hashes(
    col: pa.Array | pa.ChunkedArray, *, lower: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """-> (lens int64 per doc, wh uint64 flat word hashes): the fused
    split+hash kernel every n-gram / fingerprint consumer shares. One
    Arrow split pass, one buffer-level hash pass."""
    lens, words = split_ws(col, lower=lower)
    return lens, hash_string_array(words)
