"""DSIR-style data selection: hashed-n-gram importance resampling
(Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling" — public method description only).

Given a small TARGET corpus (the distribution you want more of) and the
RAW corpus being filtered, DSIR scores every raw document by how much
more likely its hashed bag-of-words is under the target unigram
distribution than under the raw one, then keeps the top-scoring docs.

No reference analogue (training-data-pipeline first-class op, like
`pipelines/quality` / `pipelines/contamination`); the closest reference
shape is the sampled cost-model plan step (/root/reference/src/
planner-style v0.1 sample stats) — a small plan-time artifact steering a
streaming pass.

Scale contract (100 TB):
- Feature space is a FIXED n_buckets-sized hash table (the published
  method's core trick), so every distributed partial is O(n_buckets) —
  independent of corpus vocabulary. `bucket_counts` folds per-block
  dense bincounts into ONE running vector on the driver (state =
  8 bytes x n_buckets, ~32 KB at the 4096 default; never a concat of
  per-block partials).
- Weights are computed ONCE at plan time (driver, numpy log over the
  two count vectors) and broadcast via `ray.put`; scoring is one
  streaming `map_batches` pass with the weights fetched once per actor
  (`__init__`), gather + reduceat per batch — no shuffle, nothing
  corpus-sized anywhere.
- `dsir_select` reduces each block to its local top-k before the global
  sort, so the sorted stream is O(blocks x k), not O(corpus).

Determinism / oracle: the float log-ratio is rounded to an INTEGER
weight per bucket at plan time (scale 2^20); the per-doc score is then
a pure int64 sum over word occurrences, so the scoring pass carries an
exact DuckDB value oracle with the weight table inlined as VALUES
(same plan-artifact-inlined-in-SQL discipline as ann.pq_codes_oracle_sql).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .. import util
from ..functions import detmix
from .quality import _flat_word_hashes

DEFAULT_N_BUCKETS = 4096
WEIGHT_SCALE = 1 << 20


def bucket_counts(
    ds: rd.Dataset, *, text_col: str = "text", n_buckets: int = DEFAULT_N_BUCKETS
) -> np.ndarray:
    """int64[n_buckets] — total word OCCURRENCES per hash bucket (bucket =
    string_hash64(word) % n_buckets) across the corpus. Per-block dense
    bincount partials, folded into one running vector on the driver
    (driver state is O(n_buckets), never O(blocks))."""

    def partial(batch: pa.Table) -> pa.Table:
        batch = util.strip_schema_metadata(batch)
        _, wh = _flat_word_hashes(batch, text_col)
        c = np.bincount(
            (wh % np.uint64(n_buckets)).astype(np.int64), minlength=n_buckets
        ).astype(np.int64)
        return pa.table({"c": pa.array(c[None, :].tolist(), pa.list_(pa.int64()))})

    total = np.zeros(n_buckets, np.int64)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for row in b.column("c"):
            total += np.asarray(row.as_py(), dtype=np.int64)
    return total


def dsir_weights(
    target_counts: np.ndarray,
    raw_counts: np.ndarray,
    *,
    scale: int = WEIGHT_SCALE,
) -> np.ndarray:
    """int64[n_buckets] integer log-ratio weights:
    round(scale * (ln p_target(f) - ln p_raw(f))) with add-one smoothing
    (p(f) = (count_f + 1) / (total + n_buckets)). Computed once at plan
    time; both the Ray scorer and the SQL oracle consume THIS integer
    table, so scoring is integer-exact by construction."""
    t = np.asarray(target_counts, np.float64)
    r = np.asarray(raw_counts, np.float64)
    if t.shape != r.shape:
        raise ValueError(f"count shape mismatch: {t.shape} vs {r.shape}")
    nb = len(t)
    lt = np.log(t + 1.0) - np.log(t.sum() + nb)
    lr = np.log(r + 1.0) - np.log(r.sum() + nb)
    return np.rint(scale * (lt - lr)).astype(np.int64)


class _DsirScorer:
    """Actor-pool stage: integer weight table fetched ONCE per actor in
    __init__ (ray.put broadcast), per-batch vectorized gather+reduceat."""

    def __init__(self, w_ref, text_col: str, key_col: str):
        self.w = ray.get(w_ref) if isinstance(w_ref, ray.ObjectRef) else w_ref
        self.nb = np.uint64(len(self.w))
        self.text_col = text_col
        self.key_col = key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = util.strip_schema_metadata(batch)
        lens, wh = _flat_word_hashes(batch, self.text_col)
        nd = batch.num_rows
        score = np.zeros(nd, np.int64)
        if len(wh):
            doc_of = np.repeat(np.arange(nd, dtype=np.int64), lens)
            contrib = self.w[(wh % self.nb).astype(np.int64)]
            score = np.bincount(doc_of, weights=contrib, minlength=nd).astype(
                np.int64
            )
        return pa.table(
            {
                "doc_id": batch.column(self.key_col),
                "n_words": pa.array(lens),
                "dsir_score": pa.array(score),
            }
        )


def dsir_score(
    ds: rd.Dataset,
    weights: np.ndarray,
    *,
    text_col: str = "text",
    key_col: str = "doc_id",
    batch_size: int = 4096,
    concurrency=None,
) -> rd.Dataset:
    """(doc_id, n_words, dsir_score int64) for every doc: one streaming
    actor-pool pass, score = sum over word occurrences of the integer
    bucket weight. Null/empty text scores 0 with n_words 0."""
    if concurrency is None:
        concurrency = (1, util.default_concurrency())
    w_ref = ray.put(np.asarray(weights, np.int64))
    return util.clean_dataset(ds).map_batches(
        _DsirScorer,
        fn_constructor_kwargs=dict(w_ref=w_ref, text_col=text_col, key_col=key_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def dsir_select(
    ds: rd.Dataset,
    weights: np.ndarray,
    k: int,
    *,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> rd.Dataset:
    """Top-k docs by (dsir_score desc, doc_id asc) — the DSIR "keep the
    most target-like documents" step, deterministic under ties. Each
    block first reduces to its LOCAL top-k (a global-top-k row must be a
    local-top-k row in its own block), so the global sort sees
    O(blocks x k) rows, never the corpus."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    scored = dsir_score(ds, weights, text_col=text_col, key_col=key_col)

    def local_topk(batch: pa.Table) -> pa.Table:
        s = batch.column("dsir_score").to_numpy(zero_copy_only=False)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -s))[:k]
        return batch.take(pa.array(np.sort(order)))

    pruned = scored.map_batches(local_topk, batch_format="pyarrow")
    return pruned.sort(["dsir_score", "doc_id"], descending=[True, False]).limit(k)


# ---------------------------------------------------------------------------
# SQL oracle
# ---------------------------------------------------------------------------


def _weights_values_sql(weights: np.ndarray) -> str:
    """VALUES list for a ``dsir_w(f, w)`` CTE — the plan-time integer
    weight table inlined (only at test scale; the engine broadcasts it)."""
    return ", ".join(f"({i}, {int(w)})" for i, w in enumerate(weights))


def dsir_score_oracle_sql(
    weights: np.ndarray,
    table: str = "documents",
    *,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> str:
    """DuckDB replica of `dsir_score`: identical word split, detmix word
    hash, bucket = h % n_buckets, integer weight sum over word
    OCCURRENCES (not distinct words). ASCII corpora, words <= 128 chars
    (detmix.sql_string_hash_ctes caveats)."""
    nb = len(weights)
    ws = r"[ \t\n\r\x0b\x0c]+"
    return f"""
WITH pow257_64(j, v) AS (VALUES {detmix.sql_pow257_64_values()}),
dsir_w(f, w) AS (VALUES {_weights_values_sql(weights)}),
wl AS (
  SELECT {key_col} AS k,
    list_filter(regexp_split_to_array(lower({text_col}), '{ws}'), x -> x <> '') AS wl
  FROM {table}
),
w AS (
  SELECT k, unnest(wl) AS word FROM wl
),
{detmix.sql_string_hash_ctes("w", "word")},
occ AS (
  SELECT w.k, (kh.h % {nb})::BIGINT AS f FROM w JOIN kh ON kh.k = w.word
),
agg AS (
  SELECT occ.k, sum(dsir_w.w)::BIGINT AS dsir_score
  FROM occ JOIN dsir_w ON dsir_w.f = occ.f GROUP BY occ.k
)
SELECT d.{key_col} AS doc_id,
  coalesce(len(wl.wl), 0)::BIGINT AS n_words,
  coalesce(agg.dsir_score, 0)::BIGINT AS dsir_score
FROM {table} d
LEFT JOIN wl ON wl.k = d.{key_col}
LEFT JOIN agg ON agg.k = d.{key_col}
"""


def dsir_select_oracle_sql(
    weights: np.ndarray,
    k: int,
    table: str = "documents",
    *,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> str:
    """Top-k twin: ORDER BY score DESC, key ASC LIMIT k over the scoring
    oracle (deterministic — the tie-break is total)."""
    inner = dsir_score_oracle_sql(
        weights, table, text_col=text_col, key_col=key_col
    )
    return (
        f"SELECT doc_id, n_words, dsir_score FROM ({inner}) "
        f"ORDER BY dsir_score DESC, doc_id ASC LIMIT {k}"
    )
