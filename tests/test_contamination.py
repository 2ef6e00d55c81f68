"""Benchmark-decontamination operator: kernel goldens, SQL-oracle parity,
batch-split determinism, end-to-end Ray path, and the schema-metadata
hygiene regression (pandas-written parquet inputs must not leak the
unhashable b'pandas' schema metadata into stage outputs)."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from duckdb_raquet_ray import util
from duckdb_raquet_ray.pipelines import contamination as cont

DOCS = [
    (7, "one two three four five six seven"),  # benchmark (7 % 50 == 7)
    (1, "zz one two three four five tail words here"),  # one shared 5-gram
    (2, "alpha beta gamma delta epsilon zeta"),  # disjoint
    (3, "short doc"),  # fewer than n words
    (4, "one two three four  five six"),  # run of spaces: split parity
    (5, ""),  # empty text
]


def _table(docs=DOCS) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": [s for _, s in docs],
        }
    )


def _mod_mask(t: pa.Table, rem_eq: bool) -> pa.Table:
    m = (t.column("doc_id").to_numpy() % 50) == 7
    return t.filter(pa.array(m if rem_eq else ~m))


def _bench_hashes(t: pa.Table) -> np.ndarray:
    bench = _mod_mask(t, True)
    _, g = cont.ngram_doc_hashes(bench)
    return np.sort(np.unique(g))


class TestKernel:
    def test_golden_overlap_counts(self):
        t = _table()
        probe = cont._ContaminationProbe(_bench_hashes(t), "text", 5)
        train = _mod_mask(t, False)
        out = probe(train).to_pandas().set_index("doc_id")
        # doc 1 shares exactly "one two three four five"; doc 4 shares
        # that plus "two three four five six" (double space collapses)
        assert out.loc[1, "ngram_hits"] == 1
        assert out.loc[2, "ngram_hits"] == 0
        assert out.loc[3, "ngram_hits"] == 0
        assert out.loc[4, "ngram_hits"] == 2
        assert out.loc[5, "ngram_hits"] == 0
        assert list(out["contaminated"]) == [1, 0, 0, 1, 0]

    def test_ngram_window_never_crosses_docs(self):
        # "d e" tail of doc A + "f g h" head of doc B must NOT form a gram
        a = pa.table({"doc_id": pa.array([0, 1], pa.int64()), "text": ["a b c d e", "f g h i j"]})
        b = pa.table({"doc_id": pa.array([2], pa.int64()), "text": ["c d e f g"]})
        _, ga = cont.ngram_doc_hashes(a)
        _, gb = cont.ngram_doc_hashes(b)
        assert not np.intersect1d(ga, gb).size

    def test_batch_split_determinism(self):
        t = _table()
        d_all, g_all = cont.ngram_doc_hashes(t)
        parts = [cont.ngram_doc_hashes(t.slice(0, 3)), cont.ngram_doc_hashes(t.slice(3))]
        g_split = np.concatenate([p[1] for p in parts])
        assert sorted(g_all.tolist()) == sorted(g_split.tolist())

    def test_ngram_order_below_one_rejected(self):
        # n=0 would make n_pos = total + 1 and silently garbage the valid
        # mask — must be a loud error instead
        with pytest.raises(ValueError, match="n-gram order"):
            cont.ngram_doc_hashes(_table(), n=0)

    def test_short_and_empty_docs_yield_nothing(self):
        t = pa.table({"doc_id": pa.array([0, 1], pa.int64()), "text": ["one two", ""]})
        d, g = cont.ngram_doc_hashes(t, n=5)
        assert len(d) == 0 and len(g) == 0


class TestOracleParity:
    def test_sql_oracle_matches_kernel(self):
        t = _table()
        probe = cont._ContaminationProbe(_bench_hashes(t), "text", 5)
        train = _mod_mask(t, False)
        mine = (
            probe(train)
            .select(["doc_id", "ngram_hits", "contaminated"])
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        vals = ", ".join(f"({i}, '{s}')" for i, s in DOCS)
        sql = cont.contamination_oracle_sql(
            f"(SELECT * FROM (VALUES {vals}) v(doc_id, text))"
        )
        oracle = duckdb.connect().execute(sql).df().sort_values("doc_id").reset_index(drop=True)
        assert mine["doc_id"].tolist() == oracle["doc_id"].tolist()
        assert mine["ngram_hits"].tolist() == oracle["ngram_hits"].tolist()
        assert mine["contaminated"].tolist() == oracle["contaminated"].tolist()


class TestEndToEnd:
    def test_decontaminate_dataset(self, ray_session):
        import ray.data as rd

        t = _table()
        bench = cont.benchmark_ngram_set(
            rd.from_arrow(_mod_mask(t, True))
        )
        train = rd.from_arrow(_mod_mask(t, False))
        out = {
            r["doc_id"]: r["contaminated"]
            for r in cont.decontaminate(train, bench, concurrency=1).take_all()
        }
        assert out == {1: 1, 2: 0, 3: 0, 4: 1, 5: 0}
        kept = cont.decontaminate(train, bench, drop=True, concurrency=1)
        assert sorted(r["doc_id"] for r in kept.take_all()) == [2, 3, 5]

    def test_empty_benchmark_flags_nothing(self, ray_session):
        import ray.data as rd

        train = rd.from_arrow(_table())
        out = cont.decontaminate(train, np.zeros(0, np.uint64), concurrency=1).take_all()
        assert all(r["contaminated"] == 0 for r in out)


class TestSchemaMetadataHygiene:
    """Regression: pandas-written parquet carries b'pandas' schema metadata;
    a schema with metadata is unhashable, so Ray logs 'Failed to hash the
    schemas' on every block concat. Stage outputs must be metadata-free."""

    def _dirty(self) -> pa.Table:
        return _table().replace_schema_metadata({"pandas": "{}"})

    def test_strip_helper(self):
        assert util.strip_schema_metadata(self._dirty()).schema.metadata is None
        clean = _table()
        assert util.strip_schema_metadata(clean) is clean  # no-op, zero-copy
        hash(util.strip_schema_metadata(self._dirty()).schema)  # hashable

    def test_stage_outputs_metadata_free(self):
        from duckdb_raquet_ray.pipelines import dedup, text
        from duckdb_raquet_ray.stages import stats as st

        dirty = self._dirty()
        probe = cont._ContaminationProbe(np.zeros(0, np.uint64), "text", 5)
        for out in (
            probe(dirty),
            dedup._content_hash(dirty, "text"),
            dedup.simhash_batch(dirty),
            text.TextAnalyzer()(dirty),
            text.token_count_batch(dirty),
            text.winnow_batch(dirty),
            st.welford_partials(
                pa.table({"k": ["a"], "v": [1.0]}).replace_schema_metadata({"pandas": "{}"}),
                "k",
                "v",
            ),
        ):
            assert out.schema.metadata is None
            hash(out.schema)


class TestSemanticDecontaminate:
    """Embedding-cosine decontamination: brute-force float parity on the
    integer rational test, planted-copy hits, dim-mismatch guard, empty
    benchmark, and drop mode."""

    def _vecs(self, n=20, dim=8, seed=3):
        rng = np.random.default_rng(seed)
        x = rng.normal(size=(n, dim)).astype(np.float32)
        return pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(x), pa.list_(pa.float32())),
            }
        )

    def test_planted_copies_hit(self, ray_session):
        import ray.data as rd

        t = self._vecs()
        # benchmark = exact copies of vecs 0..4 — cosine 1.0, always >= pct
        bench = t.slice(0, 5)
        out = cont.semantic_decontaminate(
            rd.from_arrow(t), rd.from_arrow(bench), threshold_pct=99, concurrency=1
        ).to_pandas()
        out = out.sort_values("vec_id").reset_index(drop=True)
        assert (out.loc[:4, "contaminated"] == 1).all()
        assert (out.loc[:4, "sem_hits"] >= 1).all()

    def test_matches_bruteforce_rational_test(self, ray_session):
        import ray.data as rd
        from duckdb_raquet_ray.pipelines.ann import _int8_matrix

        t = self._vecs(n=30)
        bench = t.slice(20, 10)
        corpus = t.slice(0, 20)
        pct = 35  # low threshold so random vectors produce real hits
        out = (
            cont.semantic_decontaminate(
                rd.from_arrow(corpus), rd.from_arrow(bench),
                threshold_pct=pct, concurrency=1,
            )
            .to_pandas().sort_values("vec_id").reset_index(drop=True)
        )
        Q = _int8_matrix(corpus, "embedding")
        B = _int8_matrix(bench, "embedding")
        D = Q @ B.T
        n2q = (Q * Q).sum(axis=1)
        n2b = (B * B).sum(axis=1)
        ok = (D > 0) & (D * D * 10000 >= pct * pct * np.outer(n2q, n2b))
        exp = ok.sum(axis=1)
        assert out["sem_hits"].to_numpy().tolist() == exp.tolist()
        assert exp.max() >= 1  # the threshold actually exercises hits

    def test_drop_mode_and_empty_bench(self, ray_session):
        import ray.data as rd

        t = self._vecs()
        bench = t.slice(0, 3)
        kept = cont.semantic_decontaminate(
            rd.from_arrow(t), rd.from_arrow(bench), drop=True, concurrency=1
        ).to_pandas()
        assert set(kept["vec_id"]) >= set(range(3, 20)) - set(kept[kept.contaminated > 0]["vec_id"])
        assert not (kept["contaminated"] > 0).any()
        # empty benchmark: nothing flagged
        empty = t.slice(0, 0)
        out = cont.semantic_decontaminate(
            rd.from_arrow(t), rd.from_arrow(empty), concurrency=1
        ).to_pandas()
        assert (out["contaminated"] == 0).all()

    def test_dim_mismatch_raises(self, ray_session):
        import ray.data as rd

        t = self._vecs(dim=8)
        bench = self._vecs(n=4, dim=16)
        with pytest.raises(Exception, match="dim"):
            cont.semantic_decontaminate(
                rd.from_arrow(t), rd.from_arrow(bench), concurrency=1
            ).materialize()
