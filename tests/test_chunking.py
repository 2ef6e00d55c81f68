"""Sliding-window chunking: SQL-twin parity (incl. nulls/empties/tail
windows), slice-offset robustness, coverage/overlap invariants, flat-map
distribution."""

import duckdb
import numpy as np
import pandas.testing as pdt
import pyarrow as pa
import pytest

from duckdb_raquet_ray.pipelines import text as T


def _docs(n=80, seed=3) -> pa.Table:
    rng = np.random.default_rng(seed)
    alpha = np.array(list("abcdefgh XYZ.,"))
    texts = ["".join(rng.choice(alpha, size=rng.integers(0, 600))) for _ in range(n)]
    texts[0] = ""
    texts[1] = None
    texts[2] = "short"
    return pa.table({"doc_id": pa.array(range(n), pa.int64()), "text": texts})


class TestKernel:
    @pytest.mark.parametrize("size,stride", [(4, 3), (256, 192), (10, 10), (7, 2)])
    def test_sql_parity(self, size, stride):
        t = _docs()
        got = (
            T.chunk_batch(t, size=size, stride=stride)
            .to_pandas()
            .sort_values(["doc_id", "chunk_id"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", t)
        want = (
            con.execute(T.chunk_oracle_sql(size=size, stride=stride))
            .df()
            .sort_values(["doc_id", "chunk_id"])
            .reset_index(drop=True)
        )
        pdt.assert_frame_equal(got, want, check_dtype=False)

    def test_slice_offset(self):
        t = _docs()
        full = T.chunk_batch(t, size=9, stride=5).to_pandas()
        part = T.chunk_batch(t.slice(3, 40), size=9, stride=5).to_pandas()
        sub = full[full.doc_id.isin(range(3, 43))].reset_index(drop=True)
        pdt.assert_frame_equal(part.reset_index(drop=True), sub)

    def test_reconstruction(self):
        # non-overlapping windows concatenate back to the original text
        t = _docs(seed=11)
        df = T.chunk_batch(t, size=64, stride=64).to_pandas()
        joined = df.sort_values(["doc_id", "chunk_id"]).groupby("doc_id")["chunk"].agg("".join)
        for i, txt in enumerate(t.column("text").to_pylist()):
            want = txt or ""
            assert joined.get(i, "") == want

    def test_bad_params(self):
        with pytest.raises(ValueError):
            T.chunk_batch(_docs(4), size=0, stride=3)
        with pytest.raises(ValueError):
            T.chunk_batch(_docs(4), size=3, stride=0)


class TestDistributed:
    def test_block_invariance(self, ray_session):
        import ray.data as rd

        t = _docs(60, seed=8)
        a = (
            T.chunk_docs(rd.from_arrow(t).repartition(1))
            .to_pandas()
            .sort_values(["doc_id", "chunk_id"])
            .reset_index(drop=True)
        )
        b = (
            T.chunk_docs(rd.from_arrow(t).repartition(9))
            .to_pandas()
            .sort_values(["doc_id", "chunk_id"])
            .reset_index(drop=True)
        )
        pdt.assert_frame_equal(a, b)
        assert len(a) > 60  # actually fanned out
