"""Grouped KL divergence + JL random projection: brute-force parity,
invariances, degenerate shapes."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from duckdb_raquet_ray.pipelines import ann
from duckdb_raquet_ray.stages import stats


def _tok_table(rows: list[tuple[str, list[int]]]) -> pa.Table:
    return pa.table(
        {
            "source": pa.array([r[0] for r in rows], pa.string()),
            "tokens": pa.array([r[1] for r in rows], pa.list_(pa.int64())),
        }
    )


def _brute_kl(rows: list[tuple[str, list[int]]]) -> dict[str, float]:
    from collections import Counter

    corpus = Counter()
    per: dict[str, Counter] = {}
    for s, ts in rows:
        corpus.update(ts)
        per.setdefault(s, Counter()).update(ts)
    n_c = sum(corpus.values())
    out = {}
    for s, cnt in per.items():
        n_s = sum(cnt.values())
        kl = sum(
            (c / n_s) * (np.log2(c / n_s) - np.log2(corpus[t] / n_c))
            for t, c in cnt.items()
        )
        out[s] = kl
    return out


@pytest.mark.usefixtures("ray_session")
class TestGroupedKL:
    def test_matches_brute_force(self):
        rng = np.random.default_rng(5)
        rows = [
            (f"s{i % 3}", rng.integers(0, 50, size=20).tolist()) for i in range(60)
        ]
        got = stats.grouped_kl_divergence(
            rd.from_arrow(_tok_table(rows)), vocab_size=64
        ).to_pandas()
        want = _brute_kl(rows)
        assert len(got) == len(want)
        for _, r in got.iterrows():
            assert r["kl_bits"] == pytest.approx(want[r["source"]], rel=1e-12)
            assert r["kl_bits"] >= -1e-12  # KL is non-negative

    def test_single_source_is_zero(self):
        rows = [("only", [1, 2, 3, 1]), ("only", [2, 2, 4])]
        got = stats.grouped_kl_divergence(
            rd.from_arrow(_tok_table(rows)), vocab_size=8
        ).to_pandas()
        assert len(got) == 1
        assert got["kl_bits"][0] == pytest.approx(0.0, abs=1e-12)
        assert int(got["n_tokens"][0]) == 7

    def test_bucket_invariance(self):
        rng = np.random.default_rng(9)
        rows = [
            (f"s{i % 5}", rng.integers(0, 30, size=10).tolist()) for i in range(50)
        ]
        a = (
            stats.grouped_kl_divergence(
                rd.from_arrow(_tok_table(rows)), vocab_size=32, n_buckets=2
            )
            .to_pandas().sort_values("source").reset_index(drop=True)
        )
        b = (
            stats.grouped_kl_divergence(
                rd.from_arrow(_tok_table(rows)), vocab_size=32, n_buckets=37
            )
            .to_pandas().sort_values("source").reset_index(drop=True)
        )
        assert list(a["source"]) == list(b["source"])
        assert np.allclose(a["kl_bits"], b["kl_bits"], rtol=0, atol=0)

    def test_empty(self):
        out = stats.grouped_kl_divergence(
            rd.from_arrow(_tok_table([])), vocab_size=8
        )
        assert out.count() == 0


@pytest.mark.usefixtures("ray_session")
class TestRandomProjection:
    def _vecs(self, n: int, dim: int, seed: int) -> pa.Table:
        rng = np.random.default_rng(seed)
        return pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(
                    list(rng.normal(size=(n, dim)).astype(np.float32)),
                    pa.list_(pa.float32()),
                ),
            }
        )

    def test_matches_brute_force(self):
        t = self._vecs(100, 16, seed=2)
        out = (
            ann.random_projection_int8(rd.from_arrow(t), out_dim=4, seed=7)
            .to_pandas().sort_values(["vec_id", "d"]).reset_index(drop=True)
        )
        q = ann._int8_matrix(t, "embedding")
        P = ann._jl_matrix(16, 4, 7)
        want = q @ P
        got = out["v"].to_numpy(np.int64).reshape(100, 4)
        assert (got == want).all()

    def test_projection_deterministic_and_sparse(self):
        P1 = ann._jl_matrix(64, 8, 42)
        P2 = ann._jl_matrix(64, 8, 42)
        assert (P1 == P2).all()
        assert set(np.unique(P1)) <= {-1, 0, 1}
        # Achlioptas density: ~1/3 nonzero
        frac = (P1 != 0).mean()
        assert 0.15 < frac < 0.5
        assert not (ann._jl_matrix(64, 8, 43) == P1).all()

    def test_preserves_relative_distance_roughly(self):
        # JL sanity: identical vectors project identically; a far vector
        # stays far more often than not (statistical, fixed seed)
        t = self._vecs(2, 32, seed=4)
        base = ann._int8_matrix(t, "embedding")
        q = np.vstack([base[0], base[0], base[1]])
        P = ann._jl_matrix(32, 8, 42)
        p = q @ P
        assert (p[0] == p[1]).all()
        assert not (p[0] == p[2]).all()

    def test_empty(self):
        t = self._vecs(0, 8, seed=1)
        out = ann.random_projection_int8(rd.from_arrow(t), out_dim=4)
        assert out.count() == 0


@pytest.mark.usefixtures("ray_session")
class TestBigramPerplexity:
    def _corpus(self):
        rows = [
            [1, 2, 3, 1, 2],     # common bigrams
            [1, 2, 3, 1, 2, 3],
            [7, 6, 5, 4],        # rare junk
            [9],                 # < 2 tokens: no bigrams
            [],
        ]
        return pa.table(
            {
                "doc_id": pa.array(np.arange(len(rows), dtype=np.int64)),
                "tokens": pa.array(rows, pa.list_(pa.int64())),
            }
        )

    def test_matches_brute_force(self):
        t = self._corpus()
        ds = rd.from_arrow(t)
        V = 16
        lm = stats.bigram_topk(ds, k=100)
        out = (
            stats.bigram_perplexity(ds, lm, vocab_size=V)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        # brute force
        from collections import Counter

        rows = t.column("tokens").to_pylist()
        bi = Counter()
        uni = Counter()
        for r in rows:
            uni.update(r)
            bi.update(zip(r, r[1:]))
        for i, r in enumerate(rows):
            pairs = list(zip(r, r[1:]))
            want_n = len(pairs)
            assert int(out["n_bigrams"][i]) == want_n
            if want_n:
                h = -sum(
                    np.log2((bi[p] + 1) / (uni[p[0]] + V)) for p in pairs
                ) / want_n
                assert out["h_bits"][i] == pytest.approx(h, rel=1e-12)
            else:
                assert out["h_bits"][i] == 0.0

    def test_rare_doc_scores_higher(self):
        t = self._corpus()
        ds = rd.from_arrow(t)
        lm = stats.bigram_topk(ds, k=100)
        out = (
            stats.bigram_perplexity(ds, lm, vocab_size=16)
            .to_pandas().set_index("doc_id")
        )
        assert out.loc[2, "h_bits"] > out.loc[0, "h_bits"]

    def test_capped_table_raises_entropy(self):
        # with the LM capped to 1 entry, unseen bigrams fall back to the
        # +1 smoothing floor -> higher cross-entropy than the full table
        t = self._corpus()
        ds = rd.from_arrow(t)
        full = stats.bigram_topk(ds, k=100)
        tiny = stats.bigram_topk(ds, k=1)
        hf = (
            stats.bigram_perplexity(ds, full, vocab_size=16)
            .to_pandas().set_index("doc_id")["h_bits"]
        )
        ht = (
            stats.bigram_perplexity(ds, tiny, vocab_size=16)
            .to_pandas().set_index("doc_id")["h_bits"]
        )
        assert (ht >= hf - 1e-12).all()
        assert ht[0] > hf[0]


@pytest.mark.usefixtures("ray_session")
class TestIvfAppend:
    def _vecs(self, ids, dim=8, seed=0):
        rng = np.random.default_rng(seed)
        return pa.table(
            {
                "vec_id": pa.array(np.asarray(ids, np.int64)),
                "embedding": pa.array(
                    list(rng.normal(size=(len(ids), dim)).astype(np.float32)),
                    pa.list_(pa.float32()),
                ),
            }
        )

    def test_append_equivalent_to_full_probe(self, tmp_path):
        a = self._vecs(range(100), seed=1)
        b = self._vecs(range(100, 150), seed=2)
        idx = str(tmp_path / "ivf")
        ann.build_ivf_index(rd.from_arrow(a), idx, n_centroids=4)
        n = ann.append_ivf_index(rd.from_arrow(b), idx, append_id="day1")
        assert n == 50
        q = np.asarray(a.column("embedding")[0].as_py(), np.float64)
        got = ann.ivf_topk_indexed(idx, q, k=10, n_probe=4)
        both = pa.concat_tables([a, b])
        want = ann.brute_force_topk(rd.from_arrow(both), q, 10)
        assert got.column("vec_id").to_pylist() == want.column("vec_id").to_pylist()

    def test_append_idempotent(self, tmp_path):
        a = self._vecs(range(60), seed=3)
        b = self._vecs(range(60, 90), seed=4)
        idx = str(tmp_path / "ivf")
        ann.build_ivf_index(rd.from_arrow(a), idx, n_centroids=4)
        assert ann.append_ivf_index(rd.from_arrow(b), idx, append_id="x") == 30
        # completed re-run: no-op, no duplicate vectors
        assert ann.append_ivf_index(rd.from_arrow(b), idx, append_id="x") == 0
        import glob as g

        files = g.glob(str(tmp_path / "ivf" / "ivf_bucket=*" / "*.parquet"))
        import pyarrow.parquet as pq

        total = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        assert total == 90

    def test_append_files_deterministic_names(self, tmp_path):
        a = self._vecs(range(40), seed=5)
        b = self._vecs(range(40, 60), seed=6)
        idx = str(tmp_path / "ivf")
        ann.build_ivf_index(rd.from_arrow(a), idx, n_centroids=2)
        ann.append_ivf_index(rd.from_arrow(b), idx, append_id="z9")
        import glob as g

        names = [
            f.split("/")[-1]
            for f in g.glob(str(tmp_path / "ivf" / "ivf_bucket=*" / "*.parquet"))
        ]
        assert any(n.startswith("append-z9-") for n in names)


@pytest.mark.usefixtures("ray_session")
class TestScriptMix:
    def test_counts(self):
        from duckdb_raquet_ray.pipelines import text as text_ops

        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(
                    ["hello привет 世界 αβγ", "plain ascii", None]
                ),
            }
        )
        out = text_ops.script_mix_batch(t)
        assert out.column("n_latin").to_pylist() == [5, 10, None]
        assert out.column("n_cyrillic").to_pylist() == [6, 0, None]
        assert out.column("n_han").to_pylist() == [2, 0, None]
        assert out.column("n_greek").to_pylist() == [3, 0, None]
        assert out.column("n_arabic").to_pylist() == [0, 0, None]

    def test_fixture_splice_deterministic(self):
        from duckdb_raquet_ray.pipelines import text as text_ops

        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(["x"] * 4),
            }
        )
        out = text_ops.synthesize_scripts_batch(t).column("text").to_pylist()
        assert out[0].endswith("привет мир")
        assert out[1].endswith("世界你好")
        assert out[2].endswith("αβγδ")
        assert out[3] == "x"


@pytest.mark.usefixtures("ray_session")
class TestGroupedCorr:
    def _events(self, n=300, seed=8):
        rng = np.random.default_rng(seed)
        g = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
        x = rng.normal(10, 3, n)
        y = 2.0 * x + rng.normal(0, 1, n)  # strongly correlated
        return pa.table(
            {
                "g": pa.array(g.tolist()),
                "x": pa.array(x, pa.float64()),
                "y": pa.array(y, pa.float64()),
            }
        )

    def test_close_to_builtin_corr(self):
        import duckdb

        t = self._events()
        got = (
            stats.grouped_corr(rd.from_arrow(t), "g", "x", "y",
                               x_scale=10**6, y_scale=10**6)
            .to_pandas().sort_values("g").reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("ev", t)
        want = (
            con.execute("SELECT g, corr(x, y) AS c FROM ev GROUP BY g ORDER BY g")
            .df()
        )
        for a, b in zip(got["corr_xy"], want["c"]):
            assert a == pytest.approx(b, abs=1e-6)
        assert (got["corr_xy"] > 0.9).all()

    def test_oracle_bit_identical(self):
        import duckdb

        t = self._events(seed=9)
        got = (
            stats.grouped_corr(rd.from_arrow(t), "g", "x", "y",
                               x_scale=1000, y_scale=1000)
            .to_pandas().sort_values("g").reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("ev", t)
        ora = (
            con.execute(
                stats.grouped_corr_oracle_sql(
                    "ev", "g", "x", "y", x_scale=1000, y_scale=1000
                )
            )
            .df().sort_values("g").reset_index(drop=True)
        )
        # bit-identical, not merely close: exact integer sums + one
        # shared double expression
        assert got["corr_xy"].tolist() == ora["corr_xy"].tolist()
        assert got["n"].tolist() == ora["n"].tolist()

    def test_null_pairs_and_degenerate(self):
        t = pa.table(
            {
                "g": pa.array(["a", "a", "a", "b", "c", "c"]),
                "x": pa.array([1.0, 2.0, None, 5.0, 1.0, 1.0], pa.float64()),
                "y": pa.array([2.0, 4.0, 9.0, 1.0, 3.0, 4.0], pa.float64()),
            }
        )
        got = (
            stats.grouped_corr(rd.from_arrow(t), "g", "x", "y")
            .to_pandas().set_index("g")
        )
        assert int(got.loc["a", "n"]) == 2          # null pair excluded
        assert got.loc["a", "corr_xy"] == pytest.approx(1.0)
        assert int(got.loc["b", "n"]) == 1
        assert np.isnan(got.loc["b", "corr_xy"])     # < 2 rows
        assert np.isnan(got.loc["c", "corr_xy"])     # zero x-variance

    def test_overflow_guard(self):
        t = pa.table(
            {
                "g": pa.array(["a"] * 4),
                "x": pa.array([1e9] * 4, pa.float64()),
                "y": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
            }
        )
        with pytest.raises(Exception):
            stats.grouped_corr(
                rd.from_arrow(t), "g", "x", "y", x_scale=10**6
            ).to_pandas()


@pytest.mark.usefixtures("ray_session")
class TestPmiTopk:
    def test_matches_brute_force(self):
        rows = [
            [1, 2, 1, 2, 1, 2],   # (1,2) strongly associated
            [3, 4, 5, 6],
            [1, 2, 7, 8],
            [5, 6, 5, 6],
        ]
        t = pa.table({"tokens": pa.array(rows, pa.list_(pa.int64()))})
        out = stats.pmi_topk(
            rd.from_arrow(t), k_table=100, top=10, vocab_size=16
        ).to_pandas()
        from collections import Counter

        bi = Counter()
        uni = Counter()
        t_bi = 0
        for r in rows:
            uni.update(r)
            bi.update(zip(r, r[1:]))
            t_bi += max(len(r) - 1, 0)
        t_uni = sum(uni.values())
        for _, row in out.iterrows():
            a, b, c = int(row.tok_a), int(row.tok_b), int(row.cnt)
            assert bi[(a, b)] == c
            want = np.log2((c * t_uni * t_uni) / (t_bi * uni[a] * uni[b]))
            assert row.pmi_bits == pytest.approx(want, rel=1e-12)
        # the rare exclusive pair (7,8) — both tokens occur once, always
        # together — has the maximal PMI; the boilerplate-glue pair (2,1)
        # scores below the association pair (1,2)
        top_pair = out.sort_values("pmi_bits", ascending=False).iloc[0]
        assert (int(top_pair.tok_a), int(top_pair.tok_b)) == (7, 8)
        bypair = {
            (int(r.tok_a), int(r.tok_b)): float(r.pmi_bits)
            for _, r in out.iterrows()
        }
        assert bypair[(1, 2)] > bypair[(2, 1)]

    def test_empty(self):
        t = pa.table({"tokens": pa.array([], pa.list_(pa.int64()))})
        out = stats.pmi_topk(rd.from_arrow(t), vocab_size=8)
        assert out.num_rows == 0
