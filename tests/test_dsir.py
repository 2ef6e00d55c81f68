"""DSIR importance resampling: weight-table properties, SQL-oracle
parity for scoring and top-k selection, batch-split determinism, bounded
driver state in bucket_counts, and null/empty-text edges."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from duckdb_raquet_ray.pipelines import dsir

TARGET_DOCS = [
    (1, "wiki wiki article article reference neutral tone"),
    (2, "article cites reference reference wiki"),
]
RAW_DOCS = TARGET_DOCS + [
    (3, "buy now cheap cheap pills click click click"),
    (4, "wiki article of quality with reference"),
    (5, "click here buy pills now"),
    (6, ""),  # empty text
    (7, None),  # null text
    (8, "spam spam spam buy buy"),  # breaks the t/T == r/R degeneracy
]

NB = 64  # tiny bucket table keeps the VALUES oracle fast


def _ds(docs) -> rd.Dataset:
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([s for _, s in docs], pa.string()),
            }
        )
    )


def _values_src(docs) -> str:
    vals = ", ".join(
        f"({i}, {'NULL' if s is None else repr(s)})" for i, s in docs
    )
    return f"(SELECT * FROM (VALUES {vals}) v(doc_id, text))"


@pytest.fixture(scope="module")
def weights(ray_session):
    tc = dsir.bucket_counts(_ds(TARGET_DOCS), n_buckets=NB)
    rc = dsir.bucket_counts(_ds(RAW_DOCS), n_buckets=NB)
    return dsir.dsir_weights(tc, rc)


class TestWeights:
    def test_counts_total_words(self, ray_session):
        c = dsir.bucket_counts(_ds(RAW_DOCS), n_buckets=NB)
        n_words = sum(len(s.split()) for _, s in RAW_DOCS if s)
        assert c.sum() == n_words and len(c) == NB and c.dtype == np.int64

    def test_shape_mismatch_rejected(self):
        with pytest.raises(ValueError, match="shape mismatch"):
            dsir.dsir_weights(np.zeros(8), np.zeros(16))

    def test_target_words_weigh_positive(self, weights, ray_session):
        # a word frequent in target but diluted in raw gets weight > 0;
        # a raw-only word gets weight < 0
        from duckdb_raquet_ray.functions import detmix

        wiki = int(detmix.string_hash64(np.array(["wiki"], object))[0]) % NB
        click = int(detmix.string_hash64(np.array(["click"], object))[0]) % NB
        assert weights[wiki] > 0 > weights[click]

    def test_identical_corpora_zero(self):
        c = np.arange(NB, dtype=np.int64)
        assert (dsir.dsir_weights(c, c) == 0).all()


class TestScoreOracle:
    def test_score_matches_duckdb(self, weights, ray_session):
        mine = (
            dsir.dsir_score(_ds(RAW_DOCS), weights)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        ref = (
            duckdb.sql(
                dsir.dsir_score_oracle_sql(weights, _values_src(RAW_DOCS))
            )
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert mine["dsir_score"].tolist() == ref["dsir_score"].tolist()
        assert mine["n_words"].tolist() == ref["n_words"].tolist()

    def test_empty_and_null_score_zero(self, weights, ray_session):
        out = (
            dsir.dsir_score(_ds(RAW_DOCS), weights)
            .to_pandas()
            .set_index("doc_id")
        )
        assert out.loc[6, "dsir_score"] == 0 and out.loc[6, "n_words"] == 0
        assert out.loc[7, "dsir_score"] == 0 and out.loc[7, "n_words"] == 0

    def test_batch_split_invariance(self, weights, ray_session):
        whole = (
            dsir.dsir_score(_ds(RAW_DOCS), weights, batch_size=4096)
            .to_pandas()
            .sort_values("doc_id")["dsir_score"]
            .tolist()
        )
        split = (
            dsir.dsir_score(_ds(RAW_DOCS), weights, batch_size=2)
            .to_pandas()
            .sort_values("doc_id")["dsir_score"]
            .tolist()
        )
        assert whole == split


class TestSelect:
    def test_topk_matches_duckdb(self, weights, ray_session):
        mine = dsir.dsir_select(_ds(RAW_DOCS), weights, 3).to_pandas()
        ref = duckdb.sql(
            dsir.dsir_select_oracle_sql(weights, 3, _values_src(RAW_DOCS))
        ).df()
        assert mine["doc_id"].tolist() == ref["doc_id"].tolist()
        assert mine["dsir_score"].tolist() == ref["dsir_score"].tolist()

    def test_target_docs_rank_first(self, weights, ray_session):
        top = dsir.dsir_select(_ds(RAW_DOCS), weights, 2).to_pandas()
        # the most target-like docs are the wiki-ish ones, not the spam
        assert set(top["doc_id"]) <= {1, 2, 4}

    def test_k_below_one_rejected(self, weights):
        with pytest.raises(ValueError, match="k must be"):
            dsir.dsir_select(_ds(RAW_DOCS), weights, 0)
