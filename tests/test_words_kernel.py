"""Property tests for the shared Arrow word-split/hash kernel
(functions/words.py): the rewrite of the pandas str.split family is only
safe if it is BIT-identical to the semantics every oracle was built
against — Python ``str.split()`` word lists and detmix.string_hash64
over UTF-8 bytes — on arbitrary unicode, not just the fixtures."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_raquet_ray.functions import detmix, words

# exclude the two documented divergence classes: Python-only whitespace
# (\x1c-\x1f are str.split separators but not Unicode White_Space) and
# surrogates (not encodable)
_text = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",), blacklist_characters="\x1c\x1d\x1e\x1f\x85"
    ),
    max_size=60,
)


class TestSplitParity:
    @settings(max_examples=150, deadline=None)
    @given(st.lists(st.one_of(_text, st.none()), max_size=12))
    def test_split_ws_equals_python_str_split(self, docs):
        arr = pa.array(docs, pa.string())
        lens, flat = words.split_ws(arr)
        want_lists = [(d or "").split() for d in docs]
        assert lens.tolist() == [len(w) for w in want_lists]
        assert flat.to_pylist() == [w for ws in want_lists for w in ws]

    @settings(max_examples=150, deadline=None)
    @given(st.lists(_text, max_size=10))
    def test_hash_string_array_equals_string_hash64(self, vals):
        arr = pa.array(vals, pa.string())
        got = words.hash_string_array(arr)
        want = detmix.string_hash64(np.array(vals, dtype=object))
        np.testing.assert_array_equal(got, want)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(_text, min_size=2, max_size=8))
    def test_hash_respects_slices_and_chunks(self, vals):
        arr = pa.array(vals, pa.string())
        sl = arr.slice(1)
        np.testing.assert_array_equal(
            words.hash_string_array(sl),
            detmix.string_hash64(np.array(vals[1:], dtype=object)),
        )
        ch = pa.chunked_array([arr.slice(0, 1), arr.slice(1)])
        np.testing.assert_array_equal(
            words.hash_string_array(ch),
            detmix.string_hash64(np.array(vals, dtype=object)),
        )

    def test_large_string_input(self):
        arr = pa.array(["a b", " c  d "], pa.large_string())
        lens, flat = words.split_ws(arr)
        assert lens.tolist() == [2, 2]
        assert flat.to_pylist() == ["a", "b", "c", "d"]
        np.testing.assert_array_equal(
            words.hash_string_array(pa.array(["x", "yz"], pa.large_string())),
            detmix.string_hash64(np.array(["x", "yz"], dtype=object)),
        )

    def test_null_refusal_in_flat_utf8(self):
        import pytest

        with pytest.raises(ValueError, match="fill nulls"):
            words.flat_utf8(pa.array(["a", None]))

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            _text.filter(
                # exclude NON-ASCII whitespace: Unicode ws (the kernel's
                # split class) vs RE2's ASCII \s (the oracle's) is the
                # documented divergence; corpora are ASCII-whitespace
                lambda s: all(
                    not ch.isspace() or ch in " \t\n\r\x0b\x0c" for ch in s
                )
            ),
            max_size=8,
        )
    )
    def test_lower_matches_duckdb_simple_mapping(self, vals):
        # the kernel's lower IS Arrow's simple case mapping — pinned
        # against DuckDB's lower(), the engine every oracle runs on
        import duckdb

        arr = pa.array(vals, pa.string())
        _, flat = words.split_ws(arr, lower=True)
        con = duckdb.connect()
        con.register("t", pa.table({"s": arr}))
        rows = con.execute(
            "SELECT x FROM (SELECT unnest(list_filter(regexp_split_to_array("
            r"lower(s), '[ \t\n\r\x0b\x0c]+'), w -> w <> '')) AS x FROM t)"
        ).fetchall()
        want = [r[0] for r in rows]
        got = flat.to_pylist()
        assert got == want
