"""Hypothesis property tests for the token transforms: each vectorized
kernel must agree with a row-at-a-time python reference over generated
nullable inputs (SURVEY.md §5 discipline applied to §2.2 operators)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_raquet_ray.pipelines import transforms as tr

token_lists = st.lists(
    st.one_of(
        st.none(),
        st.lists(
            st.one_of(st.none(), st.integers(-100, 60_000)), min_size=0, max_size=20
        ),
    ),
    min_size=0,
    max_size=30,
)


def _batch(rows):
    return pa.table({"tokens": pa.array(rows, type=pa.list_(pa.int32()))})


@settings(max_examples=40, deadline=None)
@given(rows=token_lists, low=st.integers(-50, 100), span=st.integers(0, 50_000))
def test_mask_range_matches_reference(rows, low, span):
    high = low + span
    out = tr.mask_tokens_range(_batch(rows), low=low, high=high).column("tokens").to_pylist()
    expect = [
        None
        if r is None
        else [None if v is None else (v if low <= v <= high else tr.SENTINEL) for v in r]
        for r in rows
    ]
    assert out == expect


@settings(max_examples=40, deadline=None)
@given(rows=token_lists, low=st.integers(-50, 100), span=st.integers(0, 50_000))
def test_clip_matches_reference(rows, low, span):
    high = low + span
    out = tr.clip_tokens(_batch(rows), low, high, length_column=None).column("tokens").to_pylist()
    expect = [
        None if r is None else [v for v in r if v is not None and low <= v <= high]
        for r in rows
    ]
    assert out == expect


@settings(max_examples=40, deadline=None)
@given(rows=token_lists)
def test_token_stats_matches_reference(rows):
    out = tr.token_stats(_batch(rows)).to_pylist()
    for r, o in zip(rows, out):
        vals = [v for v in (r or []) if v is not None]
        assert o["tok_count"] == len(vals)
        assert o["tok_sum"] == sum(vals)
        if vals:
            assert o["tok_min"] == min(vals) and o["tok_max"] == max(vals)


@settings(max_examples=40, deadline=None)
@given(rows=token_lists, allowed=st.lists(st.integers(-100, 60_000), max_size=20))
def test_mask_list_matches_reference(rows, allowed):
    out = tr.mask_tokens_list(_batch(rows), allowed=allowed).column("tokens").to_pylist()
    aset = set(allowed)
    expect = [
        None
        if r is None
        else [None if v is None else (v if v in aset else tr.SENTINEL) for v in r]
        for r in rows
    ]
    assert out == expect


@settings(max_examples=40, deadline=None)
@given(rows=token_lists, mod=st.integers(1, 1000))
def test_map_tokens_matches_reference(rows, mod):
    mapping = (np.arange(60_001, dtype=np.int64) % mod).astype(np.int32)
    out = tr.map_tokens(_batch(rows), mapping=mapping).column("tokens").to_pylist()
    expect = [
        None
        if r is None
        else [
            None if v is None else (int(mapping[v]) if 0 <= v < len(mapping) else tr.SENTINEL)
            for v in r
        ]
        for r in rows
    ]
    assert out == expect
