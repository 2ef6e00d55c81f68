"""Hypothesis property tests for the round-4-continuation kernels —
pure-local (no Ray): per-batch / pure-function invariants.

- JL projection is linear (P(x + y) = P(x) + P(y) on the integer plane)
  and deterministic in (dim, out_dim, seed).
- The phrase-count kernel is invariant under doc order, counts overlaps,
  and never exceeds (len - m + 1) per doc.
- Temperature rates are scale-free (multiplying every count by c leaves
  the rates unchanged), bounded in (0, 1], and monotone in count.
- window-span arithmetic: segments of any block tiling sum to the block
  lengths and each window's segments sum to <= window.
- The PageRank brute-force spec conserves-or-loses mass and is
  invariant under edge-list order.
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_raquet_ray.pipelines import ann, retrieval, sampling


@settings(max_examples=40, deadline=None)
@given(
    dim=st.integers(2, 32),
    out_dim=st.integers(1, 8),
    seed=st.integers(0, 2**31),
)
def test_jl_matrix_deterministic_and_ternary(dim, out_dim, seed):
    p1 = ann._jl_matrix(dim, out_dim, seed)
    p2 = ann._jl_matrix(dim, out_dim, seed)
    assert (p1 == p2).all()
    assert p1.shape == (dim, out_dim)
    assert set(np.unique(p1)) <= {-1, 0, 1}


@settings(max_examples=30, deadline=None)
@given(
    data=st.data(),
    dim=st.integers(2, 16),
)
def test_jl_projection_linear(data, dim):
    x = np.asarray(
        data.draw(st.lists(st.integers(-127, 127), min_size=dim, max_size=dim)),
        np.int64,
    )
    y = np.asarray(
        data.draw(st.lists(st.integers(-127, 127), min_size=dim, max_size=dim)),
        np.int64,
    )
    P = ann._jl_matrix(dim, 4, 42)
    assert ((x + y) @ P == x @ P + y @ P).all()


def _phrase_counts(texts, phrase):
    """ENGINE kernel (module-level batch fn, no Ray) vs nothing — callers
    compare it against the brute spec below."""
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = retrieval.phrase_count_batch(t, [w.lower() for w in phrase])
    return out.column("n_phrase").to_pylist()


def _phrase_brute(texts, phrase):
    wl = [s.lower().split() for s in texts]
    m = len(phrase)
    res = []
    for words in wl:
        c = 0
        for i in range(len(words) - m + 1):
            if words[i : i + m] == phrase:
                c += 1
        res.append(c)
    return res


@settings(max_examples=40, deadline=None)
@given(
    data=st.data(),
)
def test_phrase_bounds_and_permutation(data):
    words = ["a", "b", "c"]
    texts = data.draw(
        st.lists(
            st.lists(st.sampled_from(words), min_size=0, max_size=12).map(
                " ".join
            ),
            min_size=1,
            max_size=6,
        )
    )
    phrase = data.draw(
        st.lists(st.sampled_from(words), min_size=1, max_size=3)
    )
    engine = _phrase_counts(texts, phrase)
    assert engine == _phrase_brute(texts, phrase)
    for txt, c in zip(texts, engine):
        n = len(txt.split())
        assert 0 <= c <= max(0, n - len(phrase) + 1)
    # doc order invariance of the per-doc counts
    perm = list(reversed(range(len(texts))))
    engine_perm = _phrase_counts([texts[i] for i in perm], phrase)
    assert engine_perm == [engine[i] for i in perm]


@settings(max_examples=60, deadline=None)
@given(
    counts=st.dictionaries(
        st.text(min_size=1, max_size=4),
        st.integers(1, 10**9),
        min_size=1,
        max_size=8,
    ),
    tau=st.floats(0.0, 1.0, allow_nan=False),
    c=st.integers(2, 1000),
)
def test_temperature_rates_scale_free_and_bounded(counts, tau, c):
    r1 = sampling.temperature_rates_from_counts(counts, tau)
    r2 = sampling.temperature_rates_from_counts(
        {k: v * c for k, v in counts.items()}, tau
    )
    for k in counts:
        assert 0.0 < r1[k] <= 1.0
        assert r1[k] == pytest_approx(r2[k])
    # monotone: bigger sources never keep MORE than smaller ones
    items = sorted(counts.items(), key=lambda kv: kv[1])
    for (k1, v1), (k2, v2) in zip(items, items[1:]):
        if v1 < v2:
            assert r1[k1] >= r1[k2] - 1e-12


def pytest_approx(x):
    import pytest

    return pytest.approx(x, rel=1e-9)


@settings(max_examples=50, deadline=None)
@given(
    lens=st.lists(st.integers(0, 40), min_size=1, max_size=30),
    window=st.integers(1, 32),
)
def test_window_span_arithmetic(lens, window):
    """The pure span spec: blocks (n+1) tiled over windows."""
    spans = {}
    pos = 0
    for n in lens:
        blk = n + 1
        s, e = pos, pos + blk
        w = s // window
        while w * window < e:
            lo, hi = max(s, w * window), min(e, (w + 1) * window)
            spans.setdefault(w, []).append(hi - lo)
            w += 1
        pos = e
    total = sum(n + 1 for n in lens)
    # every token is covered exactly once
    assert sum(sum(v) for v in spans.values()) == total
    # each window's segments sum to window (except the final partial)
    last_w = (total - 1) // window
    for w, segs in spans.items():
        if w < last_w:
            assert sum(segs) == window
        assert all(s > 0 for s in segs)


@settings(max_examples=30, deadline=None)
@given(
    data=st.data(),
    n_nodes=st.integers(2, 10),
)
def test_pagerank_spec_mass_and_order_invariance(data, n_nodes):
    from tests.test_graph import _brute_pagerank

    nodes = [f"n{i}" for i in range(n_nodes)]
    edges = data.draw(
        st.lists(
            st.tuples(st.sampled_from(nodes), st.sampled_from(nodes)),
            min_size=1,
            max_size=30,
        )
    )
    r = _brute_pagerank(edges)
    assert 0 < sum(r.values()) <= 10**12
    perm = data.draw(st.permutations(edges))
    assert _brute_pagerank(list(perm)) == r
