"""Distributed integer-exact Lloyd k-means: brute-force parity, DuckDB
oracle parity, objective monotonicity, tie determinism, degenerate
shapes (k > n, single cluster, empty input)."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from duckdb_raquet_ray.pipelines import cluster
from duckdb_raquet_ray.pipelines.ann import _int8_matrix


def _vec_table(n: int, dim: int, seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        }
    )


def _brute_kmeans(t: pa.Table, k: int, iters: int):
    """Sequential replica of the spec: smallest-key init, int64 argmin
    assignment with first-minimum ties, floor(sum/count) update."""
    x = _int8_matrix(t, "embedding")
    keys = t.column("vec_id").to_numpy()
    order = np.argsort(keys, kind="stable")
    cents = x[order[:k]].copy()
    for _ in range(iters):
        j, _ = cluster._assign(x, cents)
        new = cents.copy()
        for c in range(len(cents)):
            m = j == c
            if m.any():
                new[c] = np.floor(
                    x[m].sum(axis=0).astype(np.float64) / m.sum()
                ).astype(np.int64)
        cents = new
    j, d2 = cluster._assign(x, cents)
    return keys, j, d2, cents


@pytest.mark.usefixtures("ray_session")
class TestKmeans:
    def test_matches_brute_force(self):
        t = _vec_table(300, 16, seed=3)
        out = (
            cluster.kmeans_int8(
                rd.from_arrow(t), k=5, iters=3, vec_col="embedding", key_col="vec_id"
            )
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        keys, j, d2, _ = _brute_kmeans(t, k=5, iters=3)
        order = np.argsort(keys, kind="stable")
        assert out["cluster"].to_numpy().tolist() == j[order].tolist()
        assert out["dist2"].to_numpy().tolist() == d2[order].tolist()

    def test_oracle_parity(self):
        t = _vec_table(120, 8, seed=11)
        got = (
            cluster.kmeans_int8(rd.from_arrow(t), k=4, iters=2)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("embeddings", t)
        sql = cluster.kmeans_oracle_sql("embeddings", k=4, iters=2)
        want = con.execute(sql + " ORDER BY vec_id").fetchdf()
        assert got["cluster"].tolist() == want["cluster"].tolist()
        assert got["dist2"].tolist() == want["dist2"].tolist()

    def test_objective_never_increases_with_iters(self):
        t = _vec_table(400, 12, seed=5)
        prev = None
        for iters in (0, 1, 2, 4):
            out = cluster.kmeans_int8(rd.from_arrow(t), k=6, iters=iters).to_pandas()
            obj = int(out["dist2"].sum())
            if prev is not None:
                assert obj <= prev
            prev = obj

    def test_k_larger_than_n(self):
        t = _vec_table(3, 4, seed=2)
        out = cluster.kmeans_int8(rd.from_arrow(t), k=10, iters=2).to_pandas()
        assert len(out) == 3
        # every vector IS a centroid -> zero distance
        assert out["dist2"].tolist() == [0, 0, 0]

    def test_single_cluster_mean(self):
        t = _vec_table(50, 6, seed=9)
        out = cluster.kmeans_int8(rd.from_arrow(t), k=1, iters=2).to_pandas()
        x = _int8_matrix(t, "embedding")
        c = np.floor(x.sum(axis=0).astype(np.float64) / len(x)).astype(np.int64)
        d2 = ((x - c) ** 2).sum(axis=1)
        assert sorted(out["dist2"].tolist()) == sorted(d2.tolist())
        assert (out["cluster"] == 0).all()

    def test_empty_input(self):
        t = _vec_table(0, 4, seed=1)
        out = cluster.kmeans_int8(rd.from_arrow(t), k=3, iters=2)
        assert out.count() == 0
        # empty Dataset.to_pandas drops columns; the schema is the contract
        assert set(out.schema().names) == {"vec_id", "cluster", "dist2"}

    def test_tie_breaks_to_lowest_index(self):
        # two identical centroids (duplicate smallest-key vectors):
        # assignment must pick the lower index for every tied row
        base = np.ones((4, 4), np.float32)
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(4, dtype=np.int64)),
                "embedding": pa.array(list(base), pa.list_(pa.float32())),
            }
        )
        out = cluster.kmeans_int8(rd.from_arrow(t), k=2, iters=1).to_pandas()
        assert (out["cluster"] == 0).all()


@pytest.mark.usefixtures("ray_session")
class TestClusterBalancedSample:
    def test_oracle_parity_and_partition_invariance(self):
        t = _vec_table(240, 8, seed=17)
        con = duckdb.connect()
        con.register("embeddings", t)
        want = con.execute(
            cluster.cluster_balanced_oracle_sql(
                "embeddings", k=4, iters=1, per_cluster=10
            )
            + " ORDER BY cluster, vec_id"
        ).fetchdf()
        for parts in (1, 9):
            got = (
                cluster.cluster_balanced_sample(
                    rd.from_arrow(t).repartition(parts),
                    k=4, iters=1, per_cluster=10,
                )
                .to_pandas()
                .sort_values(["cluster", "vec_id"])
                .reset_index(drop=True)
            )
            assert got["cluster"].tolist() == want["cluster"].tolist()
            assert got["vec_id"].tolist() == want["vec_id"].tolist()

    def test_per_cluster_cap_and_membership(self):
        t = _vec_table(300, 8, seed=23)
        out = cluster.cluster_balanced_sample(
            rd.from_arrow(t), k=5, iters=2, per_cluster=7
        ).to_pandas()
        sizes = out.groupby("cluster").size()
        assert (sizes <= 7).all()
        # a sampled key's cluster must equal its kmeans assignment
        asg = cluster.kmeans_int8(rd.from_arrow(t), k=5, iters=2).to_pandas()
        amap = dict(zip(asg["vec_id"], asg["cluster"]))
        assert all(amap[v] == c for v, c in zip(out["vec_id"], out["cluster"]))

    def test_negative_keys_raise(self):
        t = _vec_table(10, 4, seed=2)
        t = t.set_column(0, "vec_id", pa.array(np.arange(-5, 5, dtype=np.int64)))
        with pytest.raises(Exception, match="non-negative"):
            cluster.cluster_balanced_sample(
                rd.from_arrow(t), k=2, iters=1, per_cluster=3
            ).to_pandas()


@pytest.mark.usefixtures("ray_session")
class TestGroupedCentroid:
    def test_matches_brute_force(self):
        t = _vec_table(200, 8, seed=6)
        labels = np.arange(200, dtype=np.int64) % 4
        t = t.append_column("label", pa.array(labels.astype(np.int32)))
        out = (
            cluster.grouped_centroid_int8(rd.from_arrow(t))
            .to_pandas().sort_values(["label", "d"]).reset_index(drop=True)
        )
        q = _int8_matrix(t, "embedding")
        for g in range(4):
            m = labels == g
            want = np.floor(
                q[m].sum(axis=0).astype(np.float64) / m.sum()
            ).astype(np.int64)
            got = out[out["label"] == g].sort_values("d")["cv"].to_numpy(np.int64)
            assert (got == want).all()
            assert (out[out["label"] == g]["n"] == m.sum()).all()

    def test_partition_invariant(self):
        t = _vec_table(120, 6, seed=7)
        t = t.append_column(
            "label", pa.array((np.arange(120) % 3).astype(np.int32))
        )
        a = (
            cluster.grouped_centroid_int8(rd.from_arrow(t).repartition(1))
            .to_pandas().sort_values(["label", "d"]).reset_index(drop=True)
        )
        b = (
            cluster.grouped_centroid_int8(rd.from_arrow(t).repartition(7))
            .to_pandas().sort_values(["label", "d"]).reset_index(drop=True)
        )
        assert a.equals(b)

    def test_empty(self):
        t = _vec_table(0, 4, seed=1).append_column(
            "label", pa.array([], pa.int32())
        )
        out = cluster.grouped_centroid_int8(rd.from_arrow(t))
        assert out.num_rows == 0
