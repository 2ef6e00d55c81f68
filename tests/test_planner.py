"""Cost-model golden tests: known inputs select known codecs (SURVEY.md §7
step 3), selection is deterministic, and the chosen codec is never far off
the true optimum on the F1 mixture."""

import numpy as np
import pyarrow as pa

from duckdb_raquet_ray import blockcodec as bc
from duckdb_raquet_ray import planner
from duckdb_raquet_ray.sources import tokens as tk


def _plane(vals, dtype=np.int64):
    arr = np.asarray(vals, dtype=dtype)
    return bc.to_plane(arr)


def test_constant_selects_cheap():
    plane, signed = _plane(np.full(10000, 7))
    codec, est = planner.plan_plane(plane, signed, 8)
    # constant column: RLE and width-0 FOR are both ~free; either is fine
    assert codec in ("rle", "for_bitpack")
    assert est[codec] < 200


def test_runs_select_rle():
    rng = np.random.default_rng(0)
    vals = np.repeat(rng.integers(0, 100, size=200), rng.integers(50, 200, size=200))
    plane, signed = _plane(vals)
    codec, _ = planner.plan_plane(plane, signed, 8)
    # rle and for_bss(zstd) both collapse long runs; either is near-optimal
    assert codec in ("rle", "for_bss")


def test_narrow_range_selects_for():
    rng = np.random.default_rng(1)
    vals = 1_000_000 + rng.integers(0, 16, size=50_000)  # width 4 incompressible noise
    plane, signed = _plane(vals)
    codec, _ = planner.plan_plane(plane, signed, 8)
    assert codec in ("for_bitpack", "for_bss")


def test_low_cardinality_scattered_selects_dict():
    rng = np.random.default_rng(2)
    alphabet = rng.choice(2**40, size=64, replace=False)
    vals = alphabet[rng.integers(0, 64, size=50_000)]
    plane, signed = _plane(vals)
    codec, _ = planner.plan_plane(plane, signed, 8)
    assert codec == "dict"


def test_low_cardinality_strings_select_dict():
    arr = pa.array(["web", "code", "books"] * 2000)
    codec, _ = planner.plan_string(arr)
    assert codec == "dict"


def test_unique_strings_select_compressed():
    arr = pa.array([f"web/doc-{i:012d}" for i in range(5000)])
    codec, _ = planner.plan_string(arr)
    assert codec in ("general", "fsst")


def test_plan_deterministic():
    t = tk.generate_shard(3, 2000)
    p1 = planner.plan_table(t)
    p2 = planner.plan_table(t)
    assert p1 == p2


def test_mixture_beats_parquet_zstd():
    """The whole point: auto-selected codecs ≤ reference compressed size
    (zstd-Parquet of the same data) on the F1 token mixture."""
    import io

    import pyarrow.parquet as pq

    t = tk.generate_shard(0, 3000)
    plan = planner.plan_table(t)
    ours = sum(len(bc.encode_array(t.column(n), plan[n])[0]) for n in t.column_names)
    buf = io.BytesIO()
    pq.write_table(t, buf, compression="zstd")
    assert ours <= len(buf.getvalue())


def test_chosen_codec_near_optimal():
    """Chosen codec's actual size within 1.35x of the best actual size."""
    from duckdb_raquet_ray.codecs import intcodec

    t = tk.generate_shard(1, 2000)
    child = t.column("tokens").combine_chunks().flatten()
    plane, signed = bc.to_plane(bc._primitive_np(child))
    chosen, _ = planner.plan_plane(plane, signed, 4)
    sizes = {}
    for c in ("for_bitpack", "rle", "dict", "for_bss"):
        blob, _ = intcodec.encode_plane(plane, c, signed)
        sizes[c] = len(blob)
    assert sizes[chosen] <= 1.35 * min(sizes.values())


def test_noisy_sorted_selects_delta():
    """A random walk (sorted, non-arithmetic) is the delta codec's home
    turf: FOR's global frame spans the full range while successive
    differences stay narrow. The within-window width estimate must not be
    poisoned by the sampling-seam deltas between scattered windows."""
    rng = np.random.default_rng(2)
    plane = np.cumsum(rng.integers(0, 1000, 300_000)).astype(np.uint64)
    codec, est = planner.plan_plane(plane, False, 8)
    assert codec == "delta_bitpack", est
    # the estimate is exact for delta (true width <= sampled width + noise)
    from duckdb_raquet_ray.codecs import intcodec

    blob, _ = intcodec.encode_plane(plane, "delta_bitpack", False)
    assert abs(len(blob) - est["delta_bitpack"]) < 0.02 * len(blob) + 64


def test_delta_wraparound_roundtrip():
    from duckdb_raquet_ray.codecs import intcodec

    for plane in (
        np.array([255, 0, 1, 255], np.uint8),
        np.array([0, 2**64 - 1, 1, 2**63], np.uint64),
        np.arange(5, dtype=np.uint16)[::-1].copy(),  # descending
    ):
        blob, desc = intcodec.encode_plane(plane, "delta_bitpack", False)
        out = intcodec.decode_plane(blob, desc)
        assert out.dtype == plane.dtype
        np.testing.assert_array_equal(out, plane)
