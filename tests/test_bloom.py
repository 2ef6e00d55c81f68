"""Bloom filter: kernel parity vs SQL twins, no-false-negative guarantee,
merge/block invariance, sketch-bounded partials, forced-false-positive
determinism (engine and oracle must agree even when the filter lies)."""

import duckdb
import numpy as np
import pandas.testing as pdt
import pyarrow as pa
import pytest

from duckdb_raquet_ray.pipelines import bloom, contamination

N = 5


def _docs(n_docs: int = 60, seed: int = 3) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(40)]
    texts = []
    for i in range(n_docs):
        words = rng.choice(vocab, size=rng.integers(3, 30)).tolist()
        texts.append(" ".join(words) if i % 17 else None)
    return pa.table(
        {"doc_id": pa.array(range(n_docs), pa.int64()), "text": pa.array(texts)}
    )


def _split(t: pa.Table, mod: int, rem: int):
    m = (t.column("doc_id").to_numpy(zero_copy_only=False) % mod) == rem
    return t.filter(pa.array(m)), t.filter(pa.array(~m))


def _build_words(bench: pa.Table, m_bits: int, k: int) -> np.ndarray:
    _, g = contamination.ngram_doc_hashes(bench, n=N)
    if len(g) == 0:
        return np.zeros(m_bits // 64, np.uint64)
    return bloom.pack_words(
        np.unique(bloom.bit_positions(np.unique(g), m_bits, k).ravel()), m_bits
    )


class TestKernels:
    def test_positions_shape_range_determinism(self):
        g = np.arange(100, dtype=np.uint64) * np.uint64(2654435761)
        p = bloom.bit_positions(g, 1 << 16, 4)
        assert p.shape == (4, 100)
        assert p.min() >= 0 and p.max() < (1 << 16)
        assert np.array_equal(p, bloom.bit_positions(g, 1 << 16, 4))

    def test_positions_require_power_of_two(self):
        with pytest.raises(ValueError):
            bloom.bit_positions(np.zeros(1, np.uint64), 1000, 4)

    def test_pack_registers_roundtrip(self):
        pos = np.array([0, 63, 64, 700, 700, 1023], np.int64)
        w = bloom.pack_words(pos, 1 << 10)
        t = bloom.registers_table(w)
        # unpack every register row back to positions
        got = []
        for idx, val in zip(t.column("word_idx").to_pylist(), t.column("word_val").to_pylist()):
            u = val if val >= 0 else val + (1 << 64)  # undo the int64 view
            for b in range(64):
                if (u >> b) & 1:
                    got.append(idx * 64 + b)
        assert sorted(got) == sorted(set(pos.tolist()))

    def test_no_false_negatives_and_exact_at_large_m(self):
        t = _docs()
        bench, train = _split(t, 5, 2)
        # large m: FP probability ~0 -> bloom == exact membership
        words = _build_words(bench, 1 << 22, 4)
        out = bloom._BloomProbe(words, "text", N, 1 << 22, 4)(train)
        _, gb = contamination.ngram_doc_hashes(bench, n=N)
        d, g = contamination.ngram_doc_hashes(train, n=N)
        exact = np.zeros(train.num_rows, np.int64)
        if len(g):
            np.add.at(exact, d[np.isin(g, gb)], 1)
        got = out.column("bloom_hits").to_numpy()
        assert np.array_equal(got, exact)

    def test_forced_false_positives_match_sql(self):
        """Tiny m -> the filter saturates and lies; the SQL twin must lie
        IDENTICALLY (the whole point of replicating the bit arithmetic)."""
        t = _docs(n_docs=80, seed=11)
        m_bits, k = 1 << 8, 4
        bench, train = _split(t, 5, 2)
        words = _build_words(bench, m_bits, k)
        out = bloom._BloomProbe(words, "text", N, m_bits, k)(train)
        # sanity: saturation produced at least one false positive
        _, gb = contamination.ngram_doc_hashes(bench, n=N)
        d, g = contamination.ngram_doc_hashes(train, n=N)
        exact = np.zeros(train.num_rows, np.int64)
        if len(g):
            np.add.at(exact, d[np.isin(g, gb)], 1)
        assert (out.column("bloom_hits").to_numpy() > exact).any()
        con = duckdb.connect()
        con.register("documents", t)
        odf = (
            con.execute(
                bloom.bloom_decontaminate_oracle_sql(
                    "documents", n=N, m_bits=m_bits, k=k, bench_mod=5, bench_rem=2
                )
            )
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        edf = (
            out.select(["doc_id", "bloom_hits", "bloom_flag"])
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pdt.assert_frame_equal(edf, odf, check_dtype=False)

    def test_registers_oracle_matches(self):
        t = _docs(n_docs=40, seed=7)
        m_bits, k = 1 << 14, 4
        bench, _ = _split(t, 5, 2)
        words = _build_words(bench, m_bits, k)
        con = duckdb.connect()
        con.register("documents", t)
        odf = (
            con.execute(
                bloom.bloom_registers_oracle_sql(
                    "documents", n=N, m_bits=m_bits, k=k, where="doc_id % 5 = 2"
                )
            )
            .df()
            .sort_values("word_idx")
            .reset_index(drop=True)
        )
        edf = (
            bloom.registers_table(words)
            .to_pandas()
            .sort_values("word_idx")
            .reset_index(drop=True)
        )
        pdt.assert_frame_equal(edf, odf, check_dtype=False)


class TestDistributed:
    def test_block_structure_invariance(self, ray_session):
        """The built filter is independent of how the corpus is blocked
        (the distinct shuffle merges partials exactly)."""
        import ray.data as rd

        t = _docs(n_docs=100, seed=5)
        m_bits, k = 1 << 16, 4
        a = bloom.bloom_build(
            rd.from_arrow(t).repartition(1), m_bits=m_bits, k=k, n=N
        )
        b = bloom.bloom_build(
            rd.from_arrow(t).repartition(13), m_bits=m_bits, k=k, n=N
        )
        assert np.array_equal(a, b)
        # and equals the single-table kernel build
        c = _build_words(t, m_bits, k)
        assert np.array_equal(a, c)

    def test_partials_are_sketch_bounded(self):
        t = _docs(n_docs=200, seed=9)
        m_bits, k = 1 << 10, 4
        part = bloom._position_partials(t, text_col="text", n=N, m_bits=m_bits, k=k)
        assert part.num_rows <= m_bits
        _, g = contamination.ngram_doc_hashes(t, n=N)
        assert part.num_rows <= k * len(np.unique(g))

    def test_probe_dataset_roundtrip(self, ray_session):
        import ray.data as rd

        t = _docs(n_docs=60, seed=13)
        bench, train = _split(t, 5, 2)
        m_bits, k = 1 << 18, 4
        words = bloom.bloom_build(rd.from_arrow(bench), m_bits=m_bits, k=k, n=N)
        got = (
            bloom.bloom_probe(
                rd.from_arrow(train), words, m_bits=m_bits, k=k, n=N, concurrency=(1, 2)
            )
            .select_columns(["doc_id", "bloom_hits"])
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = (
            bloom._BloomProbe(words, "text", N, m_bits, k)(train)
            .select(["doc_id", "bloom_hits"])
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pdt.assert_frame_equal(got, want)
