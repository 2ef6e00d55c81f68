"""Hypothesis property tests for the final-continuation kernels —
pure-local (no Ray): per-batch / pure-function invariants.

- ngram_start_hashes: occurrence count per doc is exactly
  max(0, len - n + 1), starts are in-range, and the hash stream is
  invariant under doc order within a batch (hashes are per-doc
  functions).
- _median2_from_hist: equals 2 * numpy continuous median on the
  expanded multiset for any histogram.
- MAD reduce math: the integer outlier rule 2*|2x - med2| > k*mad4
  equals the float rule |x - med| > k * MAD computed in numpy.
- semantic probe rational test: the integer comparison agrees with
  float cosine at any pct where the float is not razor-edge (checked
  away from ties).
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_raquet_ray.pipelines import quality
from duckdb_raquet_ray.stages import stats

words = st.lists(
    st.text(alphabet="abcdefg XYZ", min_size=1, max_size=6).map(
        lambda s: s.replace(" ", "") or "w"
    ),
    min_size=0,
    max_size=24,
)


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(words, min_size=1, max_size=6), n=st.integers(1, 5))
def test_ngram_start_counts_and_ranges(docs, n):
    texts = [" ".join(ws) for ws in docs]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    d, s, g = quality.ngram_start_hashes(t, n=n)
    lens = np.array([len(ws) for ws in docs], np.int64)
    exp = np.maximum(lens - n + 1, 0)
    got = np.bincount(d, minlength=len(docs)) if len(d) else np.zeros(len(docs), int)
    assert got.tolist() == exp.tolist()
    if len(s):
        assert s.min() >= 0
        assert (s <= (lens[d] - n)).all()


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(words, min_size=2, max_size=5))
def test_ngram_hashes_doc_order_invariant(docs):
    texts = [" ".join(ws) for ws in docs]

    def per_doc_sets(order):
        t = pa.table(
            {
                "doc_id": pa.array([order.index(i) for i in range(len(order))], pa.int64()),
                "text": pa.array([texts[i] for i in order]),
            }
        )
        d, s, g = quality.ngram_start_hashes(t, n=2)
        out = {}
        for di, si, gi in zip(d, s, g):
            out.setdefault(order[di], set()).add((int(si), int(gi)))
        return out

    a = per_doc_sets(list(range(len(texts))))
    b = per_doc_sets(list(reversed(range(len(texts)))))
    assert a == b


@settings(max_examples=60, deadline=None)
@given(
    vals=st.lists(st.integers(0, 500), min_size=1, max_size=60),
)
def test_median2_matches_numpy(vals):
    v, c = np.unique(np.array(vals, np.int64), return_counts=True)
    med2 = stats._median2_from_hist(v, c.astype(np.int64))
    assert med2 == int(round(2 * float(np.median(vals))))


@settings(max_examples=40, deadline=None)
@given(
    vals=st.lists(st.integers(0, 300), min_size=2, max_size=50),
    k=st.integers(1, 5),
)
def test_mad_outlier_rule_matches_float(vals, k):
    x = np.array(vals, np.int64)
    v, c = np.unique(x, return_counts=True)
    med2 = stats._median2_from_hist(v, c.astype(np.int64))
    dev2 = np.abs(2 * v - med2)
    du, inv = np.unique(dev2, return_inverse=True)
    dcu = np.bincount(inv, weights=c).astype(np.int64)
    mad4 = stats._median2_from_hist(du, dcu)
    n_int = int(c[2 * dev2 > k * mad4].sum())
    med = np.median(x)
    mad = np.median(np.abs(x - med))
    n_float = int((np.abs(x - med) > k * mad).sum())
    assert n_int == n_float


@settings(max_examples=40, deadline=None)
@given(
    dim=st.integers(2, 16),
    seed=st.integers(0, 2**31),
    pct=st.sampled_from([50, 80, 90, 99]),
)
def test_semantic_rational_test_matches_float_cosine(dim, seed, pct):
    from duckdb_raquet_ray.pipelines.ann import _int8_matrix

    rng = np.random.default_rng(seed)
    A = rng.normal(size=(6, dim)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(6), pa.int64()),
            "embedding": pa.array(list(A), pa.list_(pa.float32())),
        }
    )
    Q = _int8_matrix(t, "embedding")
    D = Q @ Q.T
    n2 = (Q * Q).sum(axis=1)
    ok_int = (D > 0) & (D * D * 10000 >= pct * pct * np.outer(n2, n2))
    norms = np.sqrt(n2.astype(np.float64))
    with np.errstate(divide="ignore", invalid="ignore"):
        cos = D / np.outer(norms, norms)
    cos = np.nan_to_num(cos)
    thr = pct / 100.0
    # away from the razor edge, integer and float verdicts agree
    clear = np.abs(cos - thr) > 1e-9
    assert (ok_int[clear] == (cos[clear] >= thr)).all()
