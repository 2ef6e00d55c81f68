"""Corpus-scaled shuffle fan-out (util.scaled_buckets) and the
driver-state bound of global_word_df — the round-3 verdict's two
scale-killers: fixed 256-bucket fan-outs and the O(blocks x vocab)
driver concat."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from duckdb_raquet_ray import util
from duckdb_raquet_ray.pipelines import dedup
from duckdb_raquet_ray.pipelines import quality as q


class TestScaledBuckets:
    def test_scales_with_bytes(self):
        bpb = util.DEFAULT_BUCKET_TARGET_BYTES
        assert util.scaled_buckets(1) == 33  # lo clamp 32, nudged off 2^5
        assert util.scaled_buckets(100 * bpb) == 100
        assert util.scaled_buckets(10**18) == 4093  # cap

    def test_never_power_of_two(self):
        for nbytes in [1, 64 << 20, 2048 << 20, 10**15]:
            n = util.scaled_buckets(nbytes)
            assert not (n > 1 and n & (n - 1) == 0), n

    def test_unknown_size_falls_back(self):
        class NoPlan:
            pass

        n = util.scaled_buckets(NoPlan())
        assert n == 257  # 256 fallback, nudged off the power of two

    def test_dataset_metadata_no_execution(self, ray_session):
        # a parquet read knows its size from metadata; the call must not
        # execute the plan (guarded indirectly: it returns instantly and
        # the dataset still lazily executes afterwards)
        ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet")
        n = util.scaled_buckets(ds)
        assert 32 <= n <= 4093


class TestBucketCountInvariance:
    def _docs(self):
        return pa.table(
            {
                "doc_id": pa.array([5, 1, 2, 3, 4, 6], pa.int64()),
                "text": pa.array(["aa", "aa", "bb", "aa", "cc", None]),
            }
        )

    def test_exact_dedup_any_fanout(self, ray_session):
        ds = rd.from_arrow(self._docs())
        base = sorted(r["doc_id"] for r in dedup.exact_dedup(ds).take_all())
        for nb in (1, 7, 333):
            got = sorted(
                r["doc_id"] for r in dedup.exact_dedup(ds, n_buckets=nb).take_all()
            )
            assert got == base

    def test_simhash_dedup_any_fanout(self, ray_session):
        ds = rd.from_arrow(self._docs())
        base = sorted(r["doc_id"] for r in dedup.simhash_dedup(ds).take_all())
        for nb in (1, 7):
            got = sorted(
                r["doc_id"] for r in dedup.simhash_dedup(ds, n_buckets=nb).take_all()
            )
            assert got == base

    def test_global_word_df_any_fanout(self, ray_session):
        t = pa.table(
            {
                "doc_id": pa.array(range(6), pa.int64()),
                "text": ["a b c", "a b", "a", "d e", "d", "f f f"],
            }
        )
        ds = rd.from_arrow(t)
        base = q.global_word_df(ds)
        for nb in (1, 7, 333):
            u, df = q.global_word_df(ds, n_buckets=nb)
            np.testing.assert_array_equal(u, base[0])
            np.testing.assert_array_equal(df, base[1])
        # capped variant too
        base_c = q.global_word_df(ds, top_n=3)
        for nb in (1, 7):
            u, df = q.global_word_df(ds, top_n=3, n_buckets=nb)
            np.testing.assert_array_equal(u, base_c[0])
            np.testing.assert_array_equal(df, base_c[1])


class TestDfDriverBound:
    def test_peak_driver_rows_is_o_result_not_o_blocks(self, ray_session):
        # 32 blocks sharing one 40-word vocabulary: the old driver concat
        # held blocks x vocab (1280) rows; the bucketed fold must hold at
        # most min(vocab, buckets x top_n) = vocab (40) for the uncapped
        # call and <= buckets x top_n for the capped one
        vocab = [f"w{i}" for i in range(40)]
        rows = []
        rng = np.random.default_rng(0)
        for d in range(256):
            words = rng.choice(vocab, size=20, replace=False)
            rows.append((d, " ".join(words)))
        t = pa.table(
            {
                "doc_id": pa.array([d for d, _ in rows], pa.int64()),
                "text": [s for _, s in rows],
            }
        )
        ds = rd.from_arrow(t).repartition(32)
        u, df = q.global_word_df(ds, n_buckets=7)
        assert len(u) == 40
        assert q.LAST_DF_DRIVER_ROWS <= 40  # O(result), not O(blocks x vocab)
        top = 5
        u2, df2 = q.global_word_df(ds, top_n=top, n_buckets=7)
        assert len(u2) == top
        assert q.LAST_DF_DRIVER_ROWS <= 7 * top
        # capped result == global exact cap of the uncapped table
        order = np.lexsort((u, -df))[:top]
        keep = np.sort(order)
        np.testing.assert_array_equal(u2, u[keep])
        np.testing.assert_array_equal(df2, df[keep])


class TestMinhashDriverState:
    def test_candidates_never_driver_held(self, ray_session):
        # many LSH candidate pairs, ZERO verified edges: docs share whole
        # bands (identical first half) but exact Jaccard stays below the
        # threshold — the driver must end holding 0 edge rows even though
        # candidates were plentiful (the round-3 shape held O(candidates)
        # key->bucket dicts)
        shared = "aaaa bbbb cccc dddd eeee ffff gggg hhhh " * 6
        docs = [(i, shared + f"tail{i} " * 40) for i in range(12)]
        t = pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": [s for _, s in docs],
            }
        )
        ds = rd.from_arrow(t)
        kept = dedup.minhash_dedup(ds, threshold=0.95).take_all()
        assert dedup.LAST_CANDIDATE_PAIRS > 0  # LSH did collide
        assert dedup.LAST_DRIVER_EDGES == 0  # nothing verified -> no state
        assert len(kept) == 12

    def test_edge_ceiling_fails_loudly(self, ray_session, monkeypatch):
        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["same text here " * 10] * 3),
            }
        )
        monkeypatch.setattr(dedup, "MAX_DRIVER_EDGES", 1)
        with pytest.raises(RuntimeError, match="near-dup edges"):
            dedup.minhash_dedup(rd.from_arrow(t), threshold=0.5).take_all()

    def test_verified_edges_match_round3_semantics(self, ray_session):
        # the distributed fetch join must verify the same edges the
        # broadcast-map shape did (pinned indirectly by the driver oracle;
        # here: a crafted mixed corpus)
        base = "the quick brown fox jumps over the lazy dog " * 10
        near = base[:-10] + " extra tail"
        other = "completely different content about databases " * 10
        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array([base, near, other]),
            }
        )
        edges = dedup._minhash_verified_pairs(rd.from_arrow(t), threshold=0.5)
        assert edges == [(1, 2)]
        assert dedup.LAST_DRIVER_EDGES == 1
