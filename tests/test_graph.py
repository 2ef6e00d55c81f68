"""Domain link-graph PageRank: brute-force parity on random graphs,
DuckDB oracle parity on the synthesized-link corpus, bucket invariance,
chains/stars/self-loops, empty and degenerate inputs, mass bounds."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from duckdb_raquet_ray.pipelines import graph


def _brute_pagerank(
    edges: list[tuple[str, str]],
    iters: int = 3,
    scale: int = graph.PR_SCALE,
    damping: tuple[int, int] = (85, 100),
) -> dict[str, int]:
    """Sequential replica of the spec: exact integer floor-division
    power iteration, dangling mass dropped."""
    num, den = damping
    w: dict[tuple[str, str], int] = {}
    for s, d in edges:
        w[(s, d)] = w.get((s, d), 0) + 1
    ww: dict[str, int] = {}
    for (s, _), c in w.items():
        ww[s] = ww.get(s, 0) + c
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    if not nodes:
        return {}
    n = len(nodes)
    r = {v: scale // n for v in nodes}
    tele = ((den - num) * scale) // (den * n)
    for _ in range(iters):
        c: dict[str, int] = {}
        for (s, d), wt in w.items():
            c[d] = c.get(d, 0) + (r[s] * wt) // ww[s]
        r = {v: tele + (num * c.get(v, 0)) // den for v in nodes}
    return r


def _edge_ds(edges: list[tuple[str, str]]) -> rd.Dataset:
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.string()),
                "dst": pa.array([e[1] for e in edges], pa.string()),
            }
        )
    )


def _run(edges, **kw):
    out = graph.domain_pagerank(_edge_ds(edges), **kw).to_pandas()
    return dict(zip(out["domain"], (int(x) for x in out["rank"])))


@pytest.mark.usefixtures("ray_session")
class TestPagerank:
    def test_matches_brute_force_random(self):
        rng = np.random.default_rng(7)
        nodes = [f"d{i}" for i in range(23)]
        edges = [
            (nodes[int(a)], nodes[int(b)])
            for a, b in rng.integers(0, len(nodes), size=(400, 2))
        ]
        assert _run(edges) == _brute_pagerank(edges)

    def test_multiplicity_weights(self):
        # repeated (src, dst) pairs must weight the edge, not dedupe
        edges = [("a", "b")] * 3 + [("a", "c")]
        got = _run(edges)
        assert got == _brute_pagerank(edges)
        assert got["b"] > got["c"]

    def test_chain_star_selfloop(self):
        chain = [("a", "b"), ("b", "c"), ("c", "d")]
        star = [(f"s{i}", "hub") for i in range(6)]
        loop = [("x", "x"), ("x", "y")]
        for edges in (chain, star, loop, chain + star + loop):
            assert _run(edges) == _brute_pagerank(edges)

    def test_star_hub_ranks_highest(self):
        edges = [(f"s{i}", "hub") for i in range(6)]
        got = _run(edges)
        assert max(got, key=got.get) == "hub"

    def test_bucket_invariance(self):
        # edge_driver_limit=0 forces the DISTRIBUTED iteration path
        rng = np.random.default_rng(11)
        nodes = [f"n{i}" for i in range(17)]
        edges = [
            (nodes[int(a)], nodes[int(b)])
            for a, b in rng.integers(0, len(nodes), size=(150, 2))
        ]
        a = _run(edges, n_buckets=3, edge_driver_limit=0)
        b = _run(edges, n_buckets=61, edge_driver_limit=0)
        assert a == b == _brute_pagerank(edges)

    def test_driver_and_distributed_paths_bit_equal(self):
        rng = np.random.default_rng(21)
        nodes = [f"m{i}" for i in range(29)]
        edges = [
            (nodes[int(a)], nodes[int(b)])
            for a, b in rng.integers(0, len(nodes), size=(300, 2))
        ]
        fast = _run(edges)  # folded-table driver path (default gate)
        dist = _run(edges, edge_driver_limit=0)
        assert fast == dist

    def test_mass_bound(self):
        # total rank never exceeds SCALE (mass is conserved or lost)
        edges = [("a", "b"), ("b", "a"), ("b", "c")]
        got = _run(edges, iters=5)
        assert 0 < sum(got.values()) <= graph.PR_SCALE

    def test_empty_edges(self):
        out = graph.domain_pagerank(_edge_ds([]))
        assert out.count() == 0
        # empty Dataset.to_pandas drops columns; the schema is the contract
        assert set(out.schema().names) == {"domain", "rank"}

    def test_damping_validation(self):
        with pytest.raises(ValueError):
            graph.domain_pagerank(_edge_ds([("a", "b")]), damping=(100, 100))

    def test_link_edges_extraction(self):
        t = pa.table(
            {
                "text": pa.array(
                    [
                        "see https://a.org/x and https://b.org/y https://c.org",
                        "only https://solo.org here",  # < 2 urls: no edges
                        None,
                        "",
                    ]
                )
            }
        )
        out = graph.link_edges_batch(t)
        assert out.column("src").to_pylist() == ["a.org", "a.org"]
        assert out.column("dst").to_pylist() == ["b.org", "c.org"]

    def test_oracle_parity_synthesized_corpus(self, tmp_path):
        import pandas as pd

        n = 400
        docs = pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array([f"doc {i} body" for i in range(n)]),
            }
        )
        path = tmp_path / "docs.parquet"
        import pyarrow.parquet as pq

        pq.write_table(docs, path)
        ds = rd.read_parquet(str(path)).map_batches(
            graph.synthesize_links_batch, batch_format="pyarrow"
        )
        eng = (
            graph.domain_pagerank(graph.link_edges(ds), iters=3)
            .to_pandas()
            .sort_values("domain")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')"
        )
        ora = (
            con.execute(
                graph.pagerank_oracle_sql(
                    graph.synthesize_links_sql("documents"), iters=3
                )
            )
            .df()
            .sort_values("domain")
            .reset_index(drop=True)
        )
        assert len(eng) == len(ora) == 37
        assert list(eng["domain"]) == list(ora["domain"])
        assert [int(x) for x in eng["rank"]] == [int(x) for x in ora["rank"]]


@pytest.mark.usefixtures("ray_session")
class TestDomainComponents:
    def test_multi_component(self):
        edges = [
            ("a.org", "b.org"), ("b.org", "c.org"),     # family 1
            ("x.net", "y.net"),                           # family 2
            ("solo1.io", "solo2.io"),                     # family 3
        ]
        out = graph.domain_components(_edge_ds(edges)).to_pandas()
        comp = dict(zip(out["domain"], out["component"]))
        assert comp["a.org"] == comp["b.org"] == comp["c.org"] == "a.org"
        assert comp["x.net"] == comp["y.net"] == "x.net"
        assert comp["solo1.io"] == comp["solo2.io"] == "solo1.io"

    def test_direction_irrelevant(self):
        # components are over the UNDIRECTED graph
        out = graph.domain_components(
            _edge_ds([("z.org", "a.org")])
        ).to_pandas()
        comp = dict(zip(out["domain"], out["component"]))
        assert comp["z.org"] == comp["a.org"] == "a.org"

    def test_chain_collapses(self):
        chain = [(f"n{i:02d}.x", f"n{i+1:02d}.x") for i in range(12)]
        out = graph.domain_components(_edge_ds(chain)).to_pandas()
        assert set(out["component"]) == {"n00.x"}
        assert len(out) == 13
