"""Codec auto-selection: a deterministic sampling cost model per
(partition, column).

The analogue of the reference's dual-mode band statistics
(/root/reference/src/band_stats_v01.cpp:27-378): a deterministic sample
(fixed stride — a pure function of the partition contents, never of
cluster topology or timing, so resumed runs re-plan identically; cf. the
mt19937 fixed seed at band_stats_v01.cpp:109) feeds per-column histograms —
cardinality (dict viability), run count (RLE), min/max bit-width (FOR),
byte-sample compression ratio (general fallback) — and the cheapest
estimated encoding wins.

Estimates are *sizes in bytes*; exact for FOR/bit-pack, sample-extrapolated
for the rest. The chooser is intentionally simple and fully deterministic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import blockcodec as bc
from .codecs import fsst as fsst_mod
from .codecs import general, intcodec, rowcodec

U64 = np.uint64

SAMPLE_TARGET = 4096  # values sampled per column
BYTES_SAMPLE = 64 * 1024  # byte-sample for general/fsst ratio estimation
_HEADER_OVERHEAD = 48  # descriptor/JSON amortized guess per blob


def _stride_sample(n: int, target: int = SAMPLE_TARGET) -> slice | np.ndarray:
    """Deterministic stride sample indices over n elements."""
    if n <= target:
        return np.arange(n)
    stride = n // target
    return np.arange(0, n, stride)


N_WINDOWS = 8
WINDOW = 4096


def _window_sample(arr: np.ndarray) -> np.ndarray:
    """Deterministic scattered contiguous windows — representative of
    locally-structured data (runs, per-row patterns) where a prefix or a
    stride sample is not. Pure function of len(arr)."""
    n = len(arr)
    if n <= N_WINDOWS * WINDOW:
        return arr
    step = n // N_WINDOWS
    return np.concatenate([arr[i * step : i * step + WINDOW] for i in range(N_WINDOWS)])


def plan_plane(plane: np.ndarray, signed: bool, itemsize: int = 8) -> tuple[str, dict[str, float]]:
    """Pick the cheapest plane codec for a fixed-width column."""
    n = len(plane)
    if n == 0:
        return "for_bitpack", {"for_bitpack": 0.0}
    idx = _stride_sample(n)
    sample = plane[idx]
    sn = len(sample)
    scale = n / sn

    est: dict[str, float] = {}

    # All plan estimates come from bounded samples — planning must never
    # scan the full plane (encode computes the exact min/max itself, so a
    # sample-underestimated width only perturbs the cost model, never
    # correctness). `prefix` = scattered contiguous windows, ~32k values.
    prefix = _window_sample(plane)
    base, maxd = intcodec.for_minmax(prefix, signed)
    width = intcodec.bit_width(maxd)
    est["for_bitpack"] = n * width / 8 + _HEADER_OVERHEAD

    # RLE: run count needs contiguity, so measure on the same windows
    runs_prefix = len(intcodec.run_starts(prefix))
    runs_est = runs_prefix * (n / len(prefix))
    val_w = max(width, 1)
    est["rle"] = runs_est * (val_w + 16) / 8 + _HEADER_OVERHEAD

    # dict: cardinality from sample; if sample card is near sample size the
    # column is high-cardinality and dict is hopeless
    card = len(np.unique(sample))
    if card < sn * 0.75:
        card_est = min(card * scale**0.5, float(n))  # sublinear growth guess
        code_w = max(intcodec.bit_width(int(card_est)), 1)
        est["dict"] = card_est * val_w / 8 + n * code_w / 8 + _HEADER_OVERHEAD
    # for_bss: FOR -> minimal byte width -> byte-stream-split -> zstd;
    # estimated by trial-compressing the contiguous prefix the same way
    w = intcodec._byte_width(maxd)
    pre_deltas = intcodec.narrow_deltas(prefix, base, w)
    if len(pre_deltas):
        streams = intcodec.split_streams(pre_deltas)
        zr = len(general.compress(streams)) / max(len(streams), 1)
        est["for_bss"] = n * w * zr + _HEADER_OVERHEAD

    # delta+zigzag+bitpack: width from WITHIN-window zigzag deltas only
    # (a max over the concatenated windows would let the N seam deltas —
    # artifacts of sampling, not of the data — blow the width estimate to
    # full range and the codec would never be picked on sorted planes)
    zz_width = 0
    if n <= N_WINDOWS * WINDOW:
        if n >= 2:
            zz_width = intcodec.bit_width(int(intcodec.zigzag_deltas(plane).max()))
    else:
        step = n // N_WINDOWS
        for i in range(N_WINDOWS):
            win = plane[i * step : i * step + WINDOW]
            if len(win) >= 2:
                zz = intcodec.zigzag_deltas(win)
                zz_width = max(zz_width, intcodec.bit_width(int(zz.max())))
    # +1 byte tie penalty: on equal size prefer the simpler codecs (delta
    # decode needs a prefix sum; FOR/RLE are direct), keeping prior golden
    # selections stable on constant planes
    est["delta_bitpack"] = n * zz_width / 8 + _HEADER_OVERHEAD + 1.0

    # general (zstd) on the original-width little-endian bytes of the sample
    # (the native-width plane IS those bytes)
    raw = prefix.tobytes()
    z = general.compress(raw)
    ratio = len(z) / max(len(raw), 1)
    est["general"] = n * itemsize * ratio + _HEADER_OVERHEAD

    best = min(sorted(est), key=lambda k: est[k])
    return best, est


def plan_string(arr: pa.Array) -> tuple[str, dict[str, float]]:
    n = len(arr)
    if n == 0:
        return "plain", {"plain": 0.0}
    lengths, data = bc._string_parts(arr if isinstance(arr, pa.Array) else arr.combine_chunks())
    total = len(data)
    est: dict[str, float] = {"plain": total + n * 1.5 + _HEADER_OVERHEAD}

    # cardinality on a stride sample of the strings
    idx = _stride_sample(n, 1024)
    sample_vals = arr.take(pa.array(idx)).to_pylist()
    card = len(set(sample_vals))
    sn = len(sample_vals)
    if card < sn * 0.75:
        card_est = min(card * (n / sn) ** 0.5, float(n))
        avg_len = total / n if n else 0
        code_w = max(intcodec.bit_width(int(card_est)), 1)
        est["dict"] = card_est * (avg_len + 1.5) + n * code_w / 8 + _HEADER_OVERHEAD

    bsample = data[:BYTES_SAMPLE]
    if bsample:
        z = general.compress(bsample)
        est["general"] = total * (len(z) / len(bsample)) + n * 1.5 + _HEADER_OVERHEAD
        fsst_blob, _ = fsst_mod.encode_bytes(bsample[: 16 * 1024])
        fr = len(fsst_blob) / max(len(bsample[: 16 * 1024]), 1)
        # straight size comparison: the aligned-pair fsst encoder runs at
        # >100 MB/s/core, so speed no longer justifies a bias — it is
        # selected exactly when its trial size wins (on F1 doc_ids,
        # dict/zstd wins and that is the honest answer)
        est["fsst"] = total * fr + n * 1.5 + _HEADER_OVERHEAD

    best = min(sorted(est), key=lambda k: est[k])
    return best, est


def plan_array(arr: pa.Array | pa.ChunkedArray) -> dict:
    """-> choice dict for :func:`blockcodec.encode_array`."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        child = arr.flatten()
        flat_choice = plan_array(child)
        return {"codec": "list", "child": _plan_list_child(arr, child, flat_choice)}
    if (
        pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
    ):
        codec, _ = plan_string(arr)
        return {"codec": codec}
    # fixed-width primitive
    vals = bc._primitive_np(arr)
    plane, signed = bc.to_plane(vals)
    codec, _ = plan_plane(plane, signed, vals.dtype.itemsize)
    return {"codec": codec}


ROW_WINDOWS = 8
ROW_WINDOW = 64  # rows per window: ~8x64 rows of tokens ≈ 100-200k values


def _plan_list_child(arr: pa.Array, child: pa.Array, flat_choice: dict) -> dict:
    """Decide flat child codec vs per-row FOR (codecs/rowcodec.py) by a
    trial encode of BOTH on the same deterministic row-window sample —
    per-row structure (narrow bands, runs, per-doc alphabets) is invisible
    to the flattened-plane histograms, so only a real trial can price it."""
    t = child.type
    if child.null_count or len(child) == 0 or not pa.types.is_integer(t):
        return flat_choice
    rows = len(arr)
    if rows <= ROW_WINDOWS * ROW_WINDOW:
        sample = arr
    else:
        step = rows // ROW_WINDOWS
        sample = pa.concat_arrays(
            [arr.slice(i * step, ROW_WINDOW) for i in range(ROW_WINDOWS)]
        )
    import pyarrow.compute as pc

    s_child = sample.flatten()
    if len(s_child) == 0:
        return flat_choice
    lengths = pc.fill_null(pc.list_value_length(sample), 0).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    vals = bc._primitive_np(s_child)
    cdt = bc._np_dtype_of(t)
    if vals.dtype != cdt:
        vals = vals.astype(cdt)
    plane, signed = bc.to_plane(vals)
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    row_secs, rdesc = rowcodec.encode_child(plane, offsets, signed)
    size_rows = sum(len(s) for s in row_secs)
    has_dict = any(b["code"] == rowcodec.DICT_CODE for b in rdesc["buckets"])
    if has_dict:
        # dict-on/off decided EMPIRICALLY on the same sample: a 2-byte
        # dict is byte-equal with w2 residual rows, so only a real trial
        # can price the entropy difference (shared-table alignment vs
        # misaligned residuals)
        nd_secs, _ = rowcodec.encode_child(plane, offsets, signed, try_dict=False)
        if sum(len(s) for s in nd_secs) <= size_rows:
            has_dict = False
            size_rows = sum(len(s) for s in nd_secs)
    flat_blob, _ = bc.encode_array(s_child, flat_choice)
    # small deterministic margin: prefer the simpler flat codec on a tie
    if size_rows < len(flat_blob) * 0.98:
        # the hint lets dict-less data skip the detection passes entirely
        return {"codec": "for_rows", "dict": has_dict}
    return flat_choice


def plan_table(table: pa.Table) -> dict[str, dict]:
    """Per-column codec choices for one partition."""
    return {name: plan_array(table.column(name)) for name in table.column_names}
