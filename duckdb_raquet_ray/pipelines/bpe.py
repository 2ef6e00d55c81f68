"""Byte-pair-encoding subword tokenizer: train + apply + decode.

The tokens-axis flagship beyond hashed tokenization (text.tokenize_hashed
gives fixed-vocab ids; BPE gives the LEARNED subword vocabulary a real
LM-training pipeline ships). Byte-level BPE exactly as published
(Sennrich et al. 2016 over bytes, the GPT-2 base-vocab convention):

  * base vocab    — the 256 byte values; token i < 256 IS byte i;
  * training      — `n_merges` iterations; each merges the most frequent
                    adjacent pair into a new token 256+r; ties break to
                    the SMALLEST (a, b) pair (np.unique's sorted-key
                    argmax — deterministic everywhere);
  * application   — merges replay in rank order; overlapping matches
                    resolve greedy-left (alternate-keep inside runs of
                    consecutive matches — exactly greedy, vectorized);
  * decode        — token -> byte-string lookup table expanded from the
                    merge list; lossless by construction.

Scale shape: training reads a deterministic hash-stride SAMPLE
(splitmix64(key) % sample_mod == 0 — shard-spread, content-independent,
the IVF-training discipline) and runs in driver memory over that sample
only, with a loud byte-budget gate (the published practice: tokenizers
train on a bounded sample, never the full corpus). Application broadcasts
the merge table (KBs) and streams — one vectorized pass per batch, no
Python loop over docs or tokens; per-merge work is numpy masks over the
batch's flat byte array. Decode is the chunk_batch multi-range gather.

No SQL can replay greedy BPE, so the driver faces are: a rows-only
encode view, and a VALUE-CHECKED roundtrip (apply -> decode must
reproduce the text column byte-for-byte; oracle = the table itself —
the codec losslessness pattern roundtrip_stats uses).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from duckdb_raquet_ray import util
from duckdb_raquet_ray.functions import detmix, words

# training-sample driver budget: fail loudly, never silently truncate
MAX_SAMPLE_BYTES = 256 << 20


def _doc_bytes(batch: pa.Table, text_col: str) -> tuple[np.ndarray, np.ndarray]:
    """-> (lens int64 per doc, flat uint8 bytes) — slice-offset-safe."""
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    a = pc.fill_null(col, "").cast(pa.string())
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    off = np.frombuffer(a.buffers()[1], np.int32)[a.offset : a.offset + len(a) + 1]
    data = np.frombuffer(a.buffers()[2] or b"", np.uint8)
    lens = (off[1:] - off[:-1]).astype(np.int64)
    flat = data[off[0] : off[-1]].astype(np.int32)
    return lens, flat


def _apply_one(
    flat: np.ndarray, doc_of: np.ndarray, lens: np.ndarray, a: int, b: int, t: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Apply one merge (a,b)->t greedily left-to-right over the flat token
    stream (doc boundaries never pair). -> (flat, doc_of, lens)."""
    if len(flat) < 2:
        return flat, doc_of, lens
    mask = (flat[:-1] == a) & (flat[1:] == b) & (doc_of[1:] == doc_of[:-1])
    if not mask.any():
        return flat, doc_of, lens
    idx = np.flatnonzero(mask)
    # runs of CONSECUTIVE matches overlap (share a token): greedy keeps
    # every other one starting at the run head
    run_start = np.r_[True, idx[1:] != idx[:-1] + 1]
    run_id = np.cumsum(run_start) - 1
    first = idx[run_start]
    keep = ((idx - first[run_id]) % 2) == 0
    p = idx[keep]
    flat[p] = t
    delete = np.zeros(len(flat), bool)
    delete[p + 1] = True
    lens = lens - np.bincount(doc_of[p], minlength=len(lens))
    return flat[~delete], doc_of[~delete], lens


def apply_merges(
    lens: np.ndarray, flat: np.ndarray, merges: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Replay `merges` ((a, b, t) int32 rows, rank order) -> (lens, flat)."""
    doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    flat = flat.astype(np.int32, copy=True)
    for a, b, t in merges:
        flat, doc_of, lens = _apply_one(
            flat, doc_of, lens, int(a), int(b), int(t)
        )
    return lens, flat


def bpe_train(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    key_col: str = "doc_id",
    n_merges: int = 64,
    sample_mod: int = 4,
) -> np.ndarray:
    """Learn `n_merges` merges from the hash-stride sample -> (r, 3) int32
    rows (a, b, new_id), rank order. Deterministic: the sample is a pure
    function of key values (never of block order), sorted by key before
    training; ties in pair frequency break to the smallest (a, b)."""
    ds = util.clean_dataset(ds).select_columns([key_col, text_col])

    def pick(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col)
        if pa.types.is_integer(keys.type):
            kv = pc.fill_null(keys, 0).cast(pa.int64(), safe=False).to_numpy(
                zero_copy_only=False
            )
            h = detmix.splitmix64(kv.view(np.uint64))
        else:
            karr = pc.fill_null(keys.cast(pa.string()), "")
            if isinstance(karr, pa.ChunkedArray):
                karr = karr.combine_chunks()
            h = words.hash_string_array(karr)
        return batch.filter(pa.array(h % np.uint64(sample_mod) == 0))

    sampled = ds.map_batches(pick, batch_format="pyarrow").take_all()
    if not sampled:
        return np.zeros((0, 3), np.int32)
    st = pa.Table.from_pylist(sampled).sort_by([(key_col, "ascending")])
    lens, flat = _doc_bytes(st, text_col)
    if flat.nbytes > MAX_SAMPLE_BYTES:
        raise ValueError(
            f"BPE training sample is {flat.nbytes} bytes (> {MAX_SAMPLE_BYTES}): "
            "raise sample_mod — the trainer is driver-resident by design"
        )
    doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    K = np.int64(256 + n_merges)
    merges = []
    for r in range(n_merges):
        if len(flat) < 2:
            break
        valid = doc_of[1:] == doc_of[:-1]
        key = flat[:-1].astype(np.int64) * K + flat[1:]
        u, c = np.unique(key[valid], return_counts=True)
        if len(u) == 0 or c.max() < 2:
            break
        best = int(u[np.argmax(c)])  # first max = smallest pair key
        a, b = best // int(K), best % int(K)
        t = 256 + r
        merges.append((a, b, t))
        flat, doc_of, lens = _apply_one(flat, doc_of, lens, a, b, t)
    return np.array(merges, np.int32).reshape(-1, 3)


def vocab_bytes(merges: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Expand the merge list -> (lut_off int64 [V+1], lut_flat uint8):
    byte string of every token id (0..255 = the byte itself)."""
    toks: list[bytes] = [bytes([i]) for i in range(256)]
    for a, b, t in merges:
        assert int(t) == len(toks), "merge ids must be dense rank order"
        toks.append(toks[int(a)] + toks[int(b)])
    lut_len = np.array([len(x) for x in toks], np.int64)
    lut_off = np.zeros(len(toks) + 1, np.int64)
    np.cumsum(lut_len, out=lut_off[1:])
    return lut_off, np.frombuffer(b"".join(toks), np.uint8)


def bpe_encode(
    ds: rd.Dataset,
    merges: np.ndarray,
    *,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> rd.Dataset:
    """Stream-apply the merges -> (key_col, bpe list<int32>, n_bpe int64)."""
    mz = np.asarray(merges, np.int32)

    def enc(batch: pa.Table) -> pa.Table:
        lens, flat = _doc_bytes(batch, text_col)
        lens, flat = apply_merges(lens, flat, mz)
        off = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=off[1:])
        if off[-1] >= 1 << 31:
            raise ValueError(
                "encoded batch exceeds the int32 list offset limit: "
                "lower batch_size"
            )
        arr = pa.ListArray.from_arrays(
            pa.array(off.astype(np.int32)), pa.array(flat, pa.int32())
        )
        return pa.table(
            {
                key_col: batch.column(key_col),
                "bpe": arr,
                "n_bpe": pa.array(lens, pa.int64()),
            }
        )

    return ds.map_batches(enc, batch_format="pyarrow")


def bpe_decode_batch(
    batch: pa.Table,
    lut_off: np.ndarray,
    lut_flat: np.ndarray,
    *,
    key_col: str = "doc_id",
    bpe_col: str = "bpe",
    out_col: str = "text",
) -> pa.Table:
    """Token ids -> text, one multi-range gather (the chunk_batch shape)."""
    col = batch.column(bpe_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    doc_lens = pc.list_value_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
    toks = col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    tl = lut_off[toks + 1] - lut_off[toks]
    nbytes = int(tl.sum())
    if nbytes >= 1 << 31:
        raise ValueError("decoded batch exceeds the int32 utf8 offset limit")
    excl = np.cumsum(tl) - tl
    gather = np.repeat(lut_off[toks] - excl, tl) + np.arange(nbytes, dtype=np.int64)
    out_bytes = lut_flat[gather]
    byte_lens = np.zeros(len(doc_lens), np.int64)
    np.add.at(byte_lens, np.repeat(np.arange(len(doc_lens)), doc_lens), tl)
    out_off = np.zeros(len(doc_lens) + 1, np.int32)
    np.cumsum(byte_lens, out=out_off[1:])
    text = pa.Array.from_buffers(
        pa.utf8(),
        len(doc_lens),
        [None, pa.py_buffer(out_off.tobytes()), pa.py_buffer(out_bytes.tobytes())],
    )
    return pa.table({key_col: batch.column(key_col), out_col: text})


def bpe_roundtrip(
    ds: rd.Dataset,
    merges: np.ndarray,
    *,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> rd.Dataset:
    """encode -> decode, streaming: (key_col, text). Equal to the input
    table iff the merge replay is lossless — the value-checked face."""
    lut_off, lut_flat = vocab_bytes(np.asarray(merges, np.int32))
    enc = bpe_encode(ds, merges, text_col=text_col, key_col=key_col)
    return enc.map_batches(
        lambda b: bpe_decode_batch(
            b, lut_off, lut_flat, key_col=key_col, out_col=text_col
        ),
        batch_format="pyarrow",
    )
