"""Byte-level BPE: vectorized kernels vs a trivially-correct sequential
reference, greedy-overlap semantics, training determinism, lossless
roundtrip, partitioning invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from duckdb_raquet_ray.pipelines import bpe


# --- sequential reference ---------------------------------------------------


def ref_apply_one(seq: list[int], a: int, b: int, t: int) -> list[int]:
    out, i = [], 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
            out.append(t)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def ref_encode(text: str, merges) -> list[int]:
    seq = list(text.encode())
    for a, b, t in merges:
        seq = ref_apply_one(seq, int(a), int(b), int(t))
    return seq


def ref_train(texts: list[str], n_merges: int):
    seqs = [list(t.encode()) for t in texts]
    K = 256 + n_merges
    merges = []
    for r in range(n_merges):
        counts: dict[int, int] = {}
        for s in seqs:
            for x, y in zip(s, s[1:]):
                counts[x * K + y] = counts.get(x * K + y, 0) + 1
        if not counts:
            break
        best = min(k for k, c in counts.items() if c == max(counts.values()))
        if counts[best] < 2:
            break
        a, b, t = best // K, best % K, 256 + r
        merges.append((a, b, t))
        seqs = [ref_apply_one(s, a, b, t) for s in seqs]
    return merges


def _table(texts: list[str]) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )


def _rand_texts(n: int, seed: int) -> list[str]:
    rng = np.random.default_rng(seed)
    alpha = "abcdeé ☃"
    return [
        "".join(rng.choice(list(alpha), size=rng.integers(0, 60)))
        for _ in range(n)
    ]


class TestKernels:
    def test_apply_matches_reference(self):
        texts = _rand_texts(40, seed=5)
        merges = ref_train(texts, 12)
        t = _table(texts)
        lens, flat = bpe._doc_bytes(t, "text")
        lens2, flat2 = bpe.apply_merges(lens, flat, np.array(merges, np.int32))
        got = np.split(flat2, np.cumsum(lens2)[:-1])
        for g, txt in zip(got, texts):
            assert g.tolist() == ref_encode(txt, merges)

    def test_greedy_overlap_aaa(self):
        # merge (a,a)->t over "aaaa" must give [t, t]; over "aaa" -> [t, a]
        a = ord("a")
        lens = np.array([4, 3], np.int64)
        flat = np.array([a] * 7, np.int32)
        lens2, flat2 = bpe.apply_merges(
            lens, flat, np.array([[a, a, 256]], np.int32)
        )
        assert lens2.tolist() == [2, 2]
        assert flat2.tolist() == [256, 256, 256, a]

    def test_no_cross_doc_pair(self):
        # 'ab' split across two docs must NOT merge
        lens = np.array([1, 1], np.int64)
        flat = np.array([ord("a"), ord("b")], np.int32)
        lens2, flat2 = bpe.apply_merges(
            lens, flat, np.array([[ord("a"), ord("b"), 256]], np.int32)
        )
        assert flat2.tolist() == [ord("a"), ord("b")]
        assert lens2.tolist() == [1, 1]

    def test_train_matches_reference(self):
        texts = _rand_texts(30, seed=9)
        want = ref_train(texts, 10)
        t = _table(texts)
        lens, flat = bpe._doc_bytes(t, "text")
        # drive the trainer core directly on the full set (sample_mod=1)
        got = bpe.bpe_train(rd.from_arrow(t), n_merges=10, sample_mod=1)
        assert [tuple(r) for r in got.tolist()] == want

    def test_vocab_bytes_expansion(self):
        merges = np.array([[ord("a"), ord("b"), 256], [256, ord("c"), 257]], np.int32)
        off, flat = bpe.vocab_bytes(merges)
        assert bytes(flat[off[256] : off[257]]) == b"ab"
        assert bytes(flat[off[257] : off[258]]) == b"abc"


@pytest.mark.usefixtures("ray_session")
class TestPipelines:
    def test_roundtrip_lossless(self):
        texts = _rand_texts(120, seed=3)
        t = _table(texts)
        merges = bpe.bpe_train(rd.from_arrow(t), n_merges=24, sample_mod=2)
        out = (
            bpe.bpe_roundtrip(rd.from_arrow(t), merges)
            .to_pandas()
            .sort_values("doc_id")
        )
        assert out["text"].tolist() == texts

    def test_encode_partitioning_invariance(self):
        texts = _rand_texts(200, seed=11)
        t = _table(texts)
        merges = bpe.bpe_train(rd.from_arrow(t), n_merges=16, sample_mod=2)
        a = (
            bpe.bpe_encode(rd.from_arrow(t), merges)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        b = (
            bpe.bpe_encode(rd.from_arrow(t).repartition(13), merges)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert a["n_bpe"].tolist() == b["n_bpe"].tolist()
        assert [x.tolist() for x in a["bpe"]] == [x.tolist() for x in b["bpe"]]

    def test_compression_monotone_in_merges(self):
        texts = _rand_texts(150, seed=2)
        t = _table(texts)
        prev = None
        for nm in (0, 8, 32):
            merges = bpe.bpe_train(rd.from_arrow(t), n_merges=nm, sample_mod=1)
            enc = bpe.bpe_encode(rd.from_arrow(t), merges).to_pandas()
            total = int(enc["n_bpe"].sum())
            if prev is not None:
                assert total <= prev
            prev = total

    def test_sample_budget_gate(self):
        t = _table(["x" * 100])
        old = bpe.MAX_SAMPLE_BYTES
        bpe.MAX_SAMPLE_BYTES = 10
        try:
            with pytest.raises(ValueError, match="sample_mod"):
                bpe.bpe_train(rd.from_arrow(t), n_merges=4, sample_mod=1)
        finally:
            bpe.MAX_SAMPLE_BYTES = old
