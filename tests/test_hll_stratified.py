"""HyperLogLog distinct-count sketch + stratified per-group sample:
brute-force parity, DuckDB oracle parity, partitioning invariance, and
the estimator's accuracy bound."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from duckdb_raquet_ray.functions import detmix
from duckdb_raquet_ray.pipelines import sampling
from duckdb_raquet_ray.stages import stats as st


def _token_table(n_docs: int, vocab: int, seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    tok = [
        rng.integers(0, vocab, size=rng.integers(1, 30)).astype(np.int32).tolist()
        for _ in range(n_docs)
    ]
    return pa.table(
        {
            "doc_id": pa.array([f"d{i:06d}" for i in range(n_docs)], pa.string()),
            "tokens": pa.array(tok, pa.list_(pa.int32())),
        }
    )


def _brute_registers(values: np.ndarray, p: int) -> dict[int, int]:
    q = 64 - p
    h = detmix.splitmix64(values.astype(np.uint64))
    regs: dict[int, int] = {}
    for hv in h:
        idx = int(hv >> np.uint64(q))
        rem = int(hv & np.uint64((1 << q) - 1))
        rank = q + 1 if rem == 0 else q - rem.bit_length() + 1
        regs[idx] = max(regs.get(idx, 0), rank)
    return regs


class TestBitLength:
    def test_exact_on_boundaries(self):
        # powers of two are exactly where float log2 goes wrong
        vals = [0, 1, 2, 3, 4, (1 << 31) - 1, 1 << 31, (1 << 53) + 1,
                (1 << 63) - 1, 1 << 63, (1 << 64) - 1]
        arr = np.array(vals, dtype=np.uint64)
        got = st._bit_length_u64(arr)
        want = [int(v).bit_length() for v in vals]
        assert got.tolist() == want


class TestHll:
    def test_matches_brute_force_and_partition_invariant(self, ray_session):
        import ray.data as rd

        t = _token_table(600, 3000, seed=5)
        flat = np.concatenate([np.asarray(r, np.int64) for r in t["tokens"].to_pylist()])
        want = _brute_registers(flat, p=8)
        for parts in (1, 7):
            ds = rd.from_arrow(t).repartition(parts)
            got = st.hll_registers(ds, "tokens", p=8).to_pandas()
            assert dict(zip(got["register"], got["rank"])) == want

    def test_duckdb_oracle_parity(self, ray_session):
        import duckdb
        import ray.data as rd

        t = _token_table(400, 2000, seed=9)
        got = st.hll_registers(rd.from_arrow(t).repartition(5), "tokens", p=9).to_pandas()
        con = duckdb.connect()
        con.register("corpus", t)
        want = con.sql(st.hll_oracle_sql("corpus", "tokens", p=9)).df()
        assert got["register"].tolist() == want["register"].tolist()
        assert got["rank"].tolist() == want["rank"].tolist()

    def test_estimate_within_error_bound(self, ray_session):
        import ray.data as rd

        vocab = 20_000
        t = _token_table(4000, vocab, seed=13)
        exact = len({x for row in t["tokens"].to_pylist() for x in row})
        got = st.hll_registers(rd.from_arrow(t), "tokens", p=10).to_pandas()
        est = st.hll_estimate(
            got["register"].to_numpy(), got["rank"].to_numpy(), p=10
        )
        # standard error 1.04/sqrt(2^10) ~= 3.3%; allow 4 sigma
        assert abs(est - exact) / exact < 0.13

    def test_sketch_merge_is_the_shuffle(self, ray_session):
        # sketch of (A union B) == merge of sketches: registers over the
        # concatenated dataset equal elementwise-max of the halves
        import ray.data as rd

        a = _token_table(200, 1500, seed=1)
        b = _token_table(200, 1500, seed=2)
        ra = st.hll_registers(rd.from_arrow(a), "tokens", p=8).to_pandas()
        rb = st.hll_registers(rd.from_arrow(b), "tokens", p=8).to_pandas()
        rboth = st.hll_registers(
            rd.from_arrow(a).union(rd.from_arrow(b)), "tokens", p=8
        ).to_pandas()
        merged: dict[int, int] = {}
        for df in (ra, rb):
            for r, k in zip(df["register"], df["rank"]):
                merged[r] = max(merged.get(r, 0), k)
        assert dict(zip(rboth["register"], rboth["rank"])) == merged


class TestGroupedHll:
    def _grouped_table(self, n: int, seed: int) -> pa.Table:
        t = _token_table(n, 2500, seed=seed)
        rng = np.random.default_rng(seed + 1)
        src = rng.choice(["a", "b", "c"], size=n)
        return t.append_column("source", pa.array(src, pa.string()))

    def test_matches_per_group_brute_and_partition_invariant(self, ray_session):
        import ray.data as rd

        t = self._grouped_table(500, seed=21)
        src = np.array(t["source"].to_pylist())
        want = {}
        for g in ("a", "b", "c"):
            rows = [r for r, s in zip(t["tokens"].to_pylist(), src) if s == g]
            flat = np.concatenate([np.asarray(r, np.int64) for r in rows])
            want[g] = _brute_registers(flat, p=8)
        for parts in (1, 9):
            got = st.grouped_hll_registers(
                rd.from_arrow(t).repartition(parts), "source", "tokens", p=8
            ).to_pandas()
            by_g = {
                g: dict(zip(sub["register"], sub["rank"]))
                for g, sub in got.groupby("source")
            }
            assert by_g == want

    def test_duckdb_oracle_parity(self, ray_session):
        import duckdb
        import ray.data as rd

        t = self._grouped_table(300, seed=4)
        got = st.grouped_hll_registers(
            rd.from_arrow(t).repartition(5), "source", "tokens", p=9
        ).to_pandas()
        con = duckdb.connect()
        con.register("corpus", t)
        want = con.sql(
            st.grouped_hll_oracle_sql("corpus", "source", "tokens", p=9)
        ).df()
        assert got.values.tolist() == want.values.tolist()


def _doc_table(n: int, seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    srcs = np.array(["web", "code", "books", "wiki", "rare"])
    # 'rare' is tiny: exercises the fewer-than-k group
    w = np.array([0.4, 0.25, 0.2, 0.149, 0.001])
    pick = srcs[rng.choice(5, size=n, p=w)]
    return pa.table(
        {
            "doc_id": pa.array([f"d{i:06d}" for i in range(n)], pa.string()),
            "source": pa.array(pick, pa.string()),
        }
    )


class TestStratifiedSample:
    def _brute(self, t: pa.Table, k: int, seed: int):
        ids = np.asarray(t["doc_id"].to_pylist(), dtype=object)
        src = np.asarray(t["source"].to_pylist(), dtype=object)
        u = detmix.seeded_mix(detmix.string_hash64(ids), seed)
        import pandas as pd

        df = pd.DataFrame({"source": src, "doc_id": ids, "u": u})
        df = df.sort_values(["u", "doc_id"]).groupby("source", sort=False).head(k)
        return df.sort_values(["source", "doc_id"])[["source", "doc_id"]].reset_index(
            drop=True
        )

    def test_matches_brute_force_and_partition_invariant(self, ray_session):
        import ray.data as rd

        t = _doc_table(3000, seed=21)
        want = self._brute(t, k=15, seed=4)
        for parts in (1, 8):
            got = (
                sampling.stratified_sample(
                    rd.from_arrow(t).repartition(parts), k=15, seed=4
                )
                .to_pandas()
                .reset_index(drop=True)
            )
            assert got.equals(want)

    def test_bucket_invariance(self, ray_session):
        import ray.data as rd

        t = _doc_table(1500, seed=8)
        a = sampling.stratified_sample(
            rd.from_arrow(t), k=10, seed=0, n_buckets=37
        ).to_pandas()
        b = sampling.stratified_sample(
            rd.from_arrow(t), k=10, seed=0, n_buckets=211
        ).to_pandas()
        assert a.equals(b)

    def test_small_group_keeps_all_rows(self, ray_session):
        import ray.data as rd

        t = _doc_table(3000, seed=21)
        n_rare = sum(1 for s in t["source"].to_pylist() if s == "rare")
        assert 0 < n_rare < 15
        got = sampling.stratified_sample(rd.from_arrow(t), k=15, seed=4).to_pandas()
        assert (got["source"] == "rare").sum() == n_rare

    def test_duckdb_oracle_parity(self, ray_session):
        import duckdb
        import ray.data as rd

        t = _doc_table(2000, seed=30)
        got = (
            sampling.stratified_sample(rd.from_arrow(t), k=12, seed=7)
            .to_pandas()
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("docs", t)
        want = con.sql(
            sampling.stratified_oracle_sql("docs", 12, seed=7)
        ).df()
        assert got.equals(want.reset_index(drop=True))


def _disc(vals: np.ndarray, p: float) -> float:
    s = np.sort(vals)
    return float(s[max(int(np.ceil(p * len(s))), 1) - 1])


class TestFloatQuantiles:
    def test_matches_rank_rule_and_partition_invariant(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(17)
        v = rng.normal(0, 1e6, 20_000)
        t = pa.table({"v": pa.array(v, pa.float64())})
        ps = (0.25, 0.5, 0.75, 0.9, 0.99)
        want = {f"p{int(p * 100)}": _disc(v, p) for p in ps}
        for parts in (1, 11):
            got = st.float_quantiles(
                rd.from_arrow(t).repartition(parts), "v", ps,
                n_bins=128, collect_budget=300,
            )
            assert got.iloc[0].to_dict() == want

    def test_heavy_duplicates_and_ulp_range(self, ray_session):
        import ray.data as rd

        # 80% of mass on two adjacent floats: ranges degenerate to ulp
        # width and the lo/hi count fallback decides
        a = 3.14159
        b = float(np.nextafter(a, np.inf))
        v = np.concatenate(
            [np.full(8000, a), np.full(1500, b), np.linspace(-1, 1, 500)]
        )
        t = pa.table({"v": pa.array(v, pa.float64())})
        got = st.float_quantiles(
            rd.from_arrow(t).repartition(4), "v",
            (0.25, 0.5, 0.75, 0.9, 0.99), n_bins=16, collect_budget=100,
        )
        want = {f"p{int(p * 100)}": _disc(v, p) for p in (0.25, 0.5, 0.75, 0.9, 0.99)}
        assert got.iloc[0].to_dict() == want

    def test_nulls_and_nans_excluded(self, ray_session):
        import duckdb
        import ray.data as rd

        v = pa.array([1.0, None, 3.0, float("nan"), 5.0, 7.0], pa.float64())
        t = pa.table({"v": v})
        got = st.float_quantiles(rd.from_arrow(t), "v", (0.5,), n_bins=8)
        # DuckDB treats NaN as a (large) value; SQL NULL is excluded.
        # Our kernel excludes both — compare against the NaN-free column.
        clean = np.array([1.0, 3.0, 5.0, 7.0])
        assert got.iloc[0]["p50"] == _disc(clean, 0.5)

    def test_duckdb_oracle_parity(self, ray_session):
        import duckdb
        import ray.data as rd

        rng = np.random.default_rng(23)
        v = np.round(rng.gamma(2.0, 1000.0, 10_000), 2)
        t = pa.table({"v": pa.array(v, pa.float64())})
        got = st.float_quantiles(
            rd.from_arrow(t).repartition(6), "v", n_bins=64, collect_budget=200
        )
        con = duckdb.connect()
        con.register("tt", t)
        want = con.sql(st.float_quantiles_oracle_sql("tt", "v")).df()
        assert got.equals(want)

    def test_empty_input(self, ray_session):
        import ray.data as rd

        t = pa.table({"v": pa.array([], pa.float64())})
        got = st.float_quantiles(rd.from_arrow(t), "v", (0.5,))
        assert np.isnan(got.iloc[0]["p50"])


class TestGroupedQuantiles:
    def test_matches_duckdb_with_nulls_and_null_group(self, ray_session):
        import duckdb
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from duckdb_raquet_ray.stages import stats

        rng = np.random.default_rng(6)
        n = 400
        vals = rng.integers(0, 100, n).astype(np.int64)
        t = pa.table({
            "source": pa.array(
                [None if i % 37 == 0 else ["a", "b", "c"][i % 3] for i in range(n)]
            ),
            "n_tok": pa.array(
                [None if i % 29 == 0 else int(vals[i]) for i in range(n)],
                pa.int64(),
            ),
        })
        got = (
            stats.grouped_quantiles(rd.from_arrow(t))
            .to_pandas()
            .sort_values("source")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("tt", t)
        want = (
            con.execute(stats.grouped_quantiles_oracle_sql("tt"))
            .df()
            .sort_values("source")
            .reset_index(drop=True)
        )
        assert got[want.columns.tolist()].equals(want)

    def test_bucket_invariance(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from duckdb_raquet_ray.stages import stats

        rng = np.random.default_rng(1)
        t = pa.table({
            "source": pa.array([f"s{i % 7}" for i in range(300)]),
            "n_tok": pa.array(rng.integers(1, 50, 300).astype(np.int64)),
        })
        a = stats.grouped_quantiles(rd.from_arrow(t), n_buckets=2).to_pandas()
        b = stats.grouped_quantiles(rd.from_arrow(t), n_buckets=19).to_pandas()
        key = a.columns.tolist()
        assert (
            a.sort_values("source").reset_index(drop=True)[key]
            .equals(b.sort_values("source").reset_index(drop=True)[key])
        )


class TestTokenEntropy:
    def test_matches_sql_and_block_invariant(self, ray_session):
        import duckdb
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from duckdb_raquet_ray.stages import stats as st

        rng = np.random.default_rng(4)
        lists = [rng.integers(0, 300, size=rng.integers(0, 50)).astype(np.int32)
                 for _ in range(200)]
        t = pa.table({"tokens": pa.array([list(x) for x in lists],
                                          pa.list_(pa.int32()))})
        a = st.token_entropy(rd.from_arrow(t).repartition(1), vocab_size=300)
        b = st.token_entropy(rd.from_arrow(t).repartition(13), vocab_size=300)
        assert a.equals(b)  # merge is exact -> bitwise-identical fold
        con = duckdb.connect()
        con.register("corpus", t)
        o = con.execute(st.token_entropy_oracle_sql("corpus")).df()
        assert int(a["n_tokens"][0]) == int(o["n_tokens"][0])
        assert int(a["n_distinct"][0]) == int(o["n_distinct"][0])
        assert f"{a['entropy_bits'][0]:.9g}" == f"{o['entropy_bits'][0]:.9g}"

    def test_uniform_vs_degenerate(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from duckdb_raquet_ray.stages import stats as st

        uni = pa.table({"tokens": pa.array([list(range(64))] * 4, pa.list_(pa.int32()))})
        h = st.token_entropy(rd.from_arrow(uni), vocab_size=64)
        assert abs(h["entropy_bits"][0] - 6.0) < 1e-12  # log2(64)
        one = pa.table({"tokens": pa.array([[7] * 100] * 3, pa.list_(pa.int32()))})
        h1 = st.token_entropy(rd.from_arrow(one), vocab_size=64)
        assert h1["entropy_bits"][0] == 0.0
        empty = pa.table({"tokens": pa.array([[]], pa.list_(pa.int32()))})
        h0 = st.token_entropy(rd.from_arrow(empty), vocab_size=8)
        assert int(h0["n_tokens"][0]) == 0


class TestGroupedTokenEntropy:
    def test_matches_sql_and_bucket_invariant(self, ray_session):
        import duckdb
        import numpy as np
        import pandas.testing as pdt
        import pyarrow as pa
        import ray.data as rd

        from duckdb_raquet_ray.stages import stats as st

        rng = np.random.default_rng(6)
        srcs = [f"s{i % 7}" for i in range(150)]
        srcs[3] = None  # NULL source folds into ''
        lists = [rng.integers(0, 200, size=rng.integers(0, 40)).astype(np.int32)
                 for _ in range(150)]
        t = pa.table({
            "source": pa.array(srcs, pa.string()),
            "tokens": pa.array([list(x) for x in lists], pa.list_(pa.int32())),
        })

        def run(nb, parts):
            return (
                st.grouped_token_entropy(
                    rd.from_arrow(t).repartition(parts), vocab_size=200, n_buckets=nb
                )
                .to_pandas()
                .sort_values("source")
                .reset_index(drop=True)
            )

        a = run(32, 1)
        b = run(5, 11)  # different fan-out AND block split -> same result
        pdt.assert_frame_equal(a, b)
        con = duckdb.connect()
        con.register("corpus", t)
        o = (
            con.execute(st.grouped_entropy_oracle_sql("corpus"))
            .df()
            .sort_values("source")
            .reset_index(drop=True)
        )
        assert a["source"].tolist() == o["source"].tolist()
        assert a["n_tokens"].tolist() == o["n_tokens"].tolist()
        assert a["n_distinct"].tolist() == o["n_distinct"].tolist()
        for x, y in zip(a["entropy_bits"], o["entropy_bits"]):
            assert f"{x:.9g}" == f"{y:.9g}"


class TestGroupedQuantilesCont:
    def test_matches_duckdb_at_9g(self, ray_session):
        import duckdb
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from duckdb_raquet_ray.stages import stats

        rng = np.random.default_rng(14)
        n = 500
        t = pa.table({
            "source": pa.array([["a", "b", "c"][i % 3] for i in range(n)]),
            "n_tok": pa.array(rng.integers(0, 97, n).astype(np.int64)),
        })
        got = (
            stats.grouped_quantiles_cont(rd.from_arrow(t))
            .to_pandas()
            .sort_values("source")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("tt", t)
        want = (
            con.execute(stats.grouped_quantiles_cont_oracle_sql("tt"))
            .df()
            .sort_values("source")
            .reset_index(drop=True)
        )
        for c in got.columns:
            if c == "source":
                assert got[c].tolist() == want[c].tolist()
            else:  # the driver's float tolerance
                assert ["%.9g" % x for x in got[c]] == ["%.9g" % x for x in want[c]]

    def test_interpolates_between_ranks(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from duckdb_raquet_ray.stages import stats

        # 4 values: p50 -> h = 1.5 -> midpoint of 2nd and 3rd
        t = pa.table({
            "source": pa.array(["x"] * 4),
            "n_tok": pa.array([10, 20, 40, 100], pa.int64()),
        })
        got = stats.grouped_quantiles_cont(
            rd.from_arrow(t), ps=(0.5,)
        ).to_pandas()
        assert got["q50"].tolist() == [30.0]
