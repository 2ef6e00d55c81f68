"""Hypothesis property tests: decode(encode(x)) == x bit-exactly for every
codec x dtype x edge case — the reference's central round-trip invariant
(/root/reference/src/st_value_mask.cpp:100-114 decode→encode→decode
closure; test strategy per SURVEY.md §5 item 2), driven by generated
inputs instead of hand-picked ones.

These are pure-local (no Ray): bit-identity is a local property of the
codec layer."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays, from_dtype

from duckdb_raquet_ray import blockcodec as bc
from duckdb_raquet_ray import planner
from duckdb_raquet_ray.codecs import intcodec

INT_DTYPES = [np.int8, np.int16, np.int32, np.int64, np.uint8, np.uint16, np.uint32, np.uint64]
PLANE_CODECS = ["for_bitpack", "rle", "dict", "for_bss", "delta_bitpack"]


def _roundtrip(arr: pa.Array, choice: dict) -> None:
    blob, desc = bc.encode_array(arr, choice)
    out = bc.decode_array(blob, desc)
    assert out.equals(arr), f"{choice} failed:\n{arr}\nvs\n{out}"


@settings(max_examples=30, deadline=None)
@given(
    data=st.data(),
    dtype=st.sampled_from(INT_DTYPES),
    codec=st.sampled_from(PLANE_CODECS),
)
def test_int_plane_roundtrip(data, dtype, codec):
    vals = data.draw(arrays(dtype, st.integers(0, 200), elements=from_dtype(np.dtype(dtype))))
    plane, signed = bc.to_plane(vals)
    blob, desc = intcodec.encode_plane(plane, codec, signed)
    out = intcodec.decode_plane(blob, desc)
    np.testing.assert_array_equal(out, plane)
    back = bc.from_plane(out, vals.dtype)
    np.testing.assert_array_equal(back, vals)


@settings(max_examples=30, deadline=None)
@given(data=st.data(), dtype=st.sampled_from(INT_DTYPES), codec=st.sampled_from(PLANE_CODECS))
def test_int_column_with_nulls_roundtrip(data, dtype, codec):
    vals = data.draw(
        st.lists(st.one_of(st.none(), st.integers(*_bounds(dtype))), min_size=0, max_size=120)
    )
    arr = pa.array(vals, type=pa.from_numpy_dtype(dtype))
    _roundtrip(arr, {"codec": codec})


def _bounds(dtype):
    info = np.iinfo(dtype)
    return info.min, info.max


@settings(max_examples=30, deadline=None)
@given(data=st.data(), codec=st.sampled_from(["plain", "general", "fsst", "dict"]))
def test_string_roundtrip(data, codec):
    vals = data.draw(
        st.lists(st.one_of(st.none(), st.text(max_size=40)), min_size=0, max_size=80)
    )
    arr = pa.array(vals, type=pa.string())
    _roundtrip(arr, {"codec": codec})


@settings(max_examples=30, deadline=None)
@given(data=st.data(), child_codec=st.sampled_from(PLANE_CODECS))
def test_token_list_roundtrip(data, child_codec):
    vals = data.draw(
        st.lists(
            st.one_of(
                st.none(),
                st.lists(st.integers(-(2**31), 2**31 - 1), min_size=0, max_size=30),
            ),
            min_size=0,
            max_size=40,
        )
    )
    arr = pa.array(vals, type=pa.list_(pa.int32()))
    _roundtrip(arr, {"codec": "list", "child": {"codec": child_codec}})


@settings(max_examples=30, deadline=None)
@given(data=st.data(), dtype=st.sampled_from(INT_DTYPES))
def test_for_rows_list_roundtrip(data, dtype):
    """Per-row FOR child codec: arbitrary ints of every width, empty rows,
    null rows, constant rows, full-range extremes."""
    info = np.iinfo(dtype)
    vals = data.draw(
        st.lists(
            st.one_of(
                st.none(),
                st.lists(st.integers(int(info.min), int(info.max)), min_size=0, max_size=30),
            ),
            min_size=0,
            max_size=40,
        )
    )
    arr = pa.array(vals, type=pa.list_(pa.from_numpy_dtype(np.dtype(dtype))))
    _roundtrip(arr, {"codec": "list", "child": {"codec": "for_rows"}})


@settings(max_examples=30, deadline=None)
@given(data=st.data())
def test_float_roundtrip_bitexact(data):
    # floats (incl nan/inf/-0.0) must round-trip by BIT PATTERN
    vals = data.draw(
        arrays(
            np.float64,
            st.integers(0, 100),
            elements=st.floats(allow_nan=True, allow_infinity=True, width=64),
        )
    )
    arr = pa.array(vals, type=pa.float64())
    for codec in ("for_bss", "general", "plain"):
        blob, desc = bc.encode_array(arr, {"codec": codec})
        out = bc.decode_array(blob, desc)
        np.testing.assert_array_equal(
            out.to_numpy(zero_copy_only=False).view(np.uint64),
            vals.view(np.uint64),
        )


@settings(max_examples=20, deadline=None)
@given(data=st.data())
def test_planner_choice_always_roundtrips(data):
    # whatever the cost model picks must decode bit-exactly
    n = data.draw(st.integers(0, 300))
    kind = data.draw(st.sampled_from(["uniform", "runs", "const", "narrow"]))
    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    if kind == "uniform":
        vals = rng.integers(0, 50_257, n).astype(np.int32)
    elif kind == "runs":
        vals = np.repeat(rng.integers(0, 50, max(n // 7, 1)), 7)[:n].astype(np.int32)
    elif kind == "const":
        vals = np.full(n, 42, dtype=np.int32)
    else:
        vals = (1000 + rng.integers(0, 64, n)).astype(np.int32)
    arr = pa.array(vals, type=pa.int32())
    choice = planner.plan_array(arr)
    _roundtrip(arr, choice)
