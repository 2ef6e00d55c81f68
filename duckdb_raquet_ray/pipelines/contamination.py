"""Benchmark decontamination: flag training documents that share any word
n-gram with a benchmark (eval) set — the published GPT-3 appendix-C /
Llama training-data hygiene rule (n-gram overlap against eval suites).
No reference analogue (training-data-pipeline first-class op, like
`pipelines/dedup`); the reference's closest shape is the broadcast
small-side metadata join (/root/reference/src/raquet_extension.cpp:40-44).

Scale contract (100 TB): the benchmark side is SMALL by definition (eval
suites are megabytes) — its distinct n-gram hash set is built once and
broadcast via `ray.put`; the training corpus streams through one
`map_batches` stage with a vectorized `np.isin` membership probe. No
shuffle, no driver pass over the corpus.

Determinism / oracle: word hash = detmix.string_hash64 (polynomial byte
hash + splitmix64), n-gram hash = FNV-prime Horner fold of the n word
hashes mod 2^64 — both exactly replicable in DuckDB HUGEINT arithmetic
(`contamination_oracle_sql`), so the whole operator is value-checkable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .. import util
from ..functions import detmix
from ..functions import words as _words

# module-level, not lazy-in-method: a lazy package-internal import inside a
# class shipped to workers breaks by-value pickling under a foreign cwd
from duckdb_raquet_ray.pipelines.ann import _int8_matrix as ann_int8

# FNV-1a 64-bit prime (~2^40): small enough that HUGEINT (int128) holds
# acc * P without overflow in the SQL replica (2^64 * 2^40 < 2^127)
NGRAM_P = np.uint64(1099511628211)
U64 = 1 << 64


def ngram_doc_hashes(
    batch: pa.Table, *, text_col: str = "text", n: int = 5
) -> tuple[np.ndarray, np.ndarray]:
    """-> (doc_index int64, g uint64): one row per DISTINCT word-n-gram
    hash per document in the batch. Fully vectorized: the lowercase
    whitespace split + word hashing is the shared Arrow-buffer kernel
    (functions/words.split_ws_hashes — identical split semantics to the
    SQL oracle's regexp_split_to_array + list_filter non-empty, no
    per-doc pandas pass), the n-fold Horner combine is n-1 vectorized
    multiply-adds over shifted slices, doc boundaries are masked (a
    window never crosses documents), distinctness via lexsort."""
    if n < 1:
        raise ValueError(f"n-gram order must be >= 1, got {n}")
    lens, wh = _words.split_ws_hashes(batch.column(text_col))
    total = int(lens.sum())
    if total < n:
        return np.zeros(0, np.int64), np.zeros(0, np.uint64)
    n_pos = total - n + 1
    with np.errstate(over="ignore"):  # mod-2^64 wrap is the definition
        acc = wh[:n_pos].copy()
        for j in range(1, n):
            acc *= NGRAM_P
            acc += wh[j : j + n_pos]
    doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    valid = doc_of[:n_pos] == doc_of[n - 1 : total]
    g = acc[valid]
    d = doc_of[:n_pos][valid]
    if len(g) == 0:
        return d, g
    order = np.lexsort((g, d))
    g, d = g[order], d[order]
    keep = np.empty(len(g), dtype=bool)
    keep[0] = True
    np.logical_or(d[1:] != d[:-1], g[1:] != g[:-1], out=keep[1:])
    return d[keep], g[keep]


def benchmark_ngram_set(
    bench_ds: rd.Dataset, *, text_col: str = "text", n: int = 5
) -> np.ndarray:
    """Distinct n-gram hashes of the benchmark set, as a SORTED uint64
    array (the broadcast side). Only hashes ever reach the driver — the
    benchmark corpus itself streams through map_batches."""

    def hashes(batch: pa.Table) -> pa.Table:
        _, g = ngram_doc_hashes(batch, text_col=text_col, n=n)
        return pa.table({"g": pa.array(np.unique(g), type=pa.uint64())})

    parts = [
        b["g"]
        for b in bench_ds.map_batches(hashes, batch_format="pyarrow").iter_batches(
            batch_format="numpy"
        )
    ]
    if not parts:
        return np.zeros(0, np.uint64)
    return np.unique(np.concatenate(parts))


class _ContaminationProbe:
    """Actor-pool stage: benchmark hash set fetched ONCE per actor in
    __init__ (ray.put broadcast), per-batch vectorized membership probe."""

    def __init__(self, bench_ref, text_col: str, n: int):
        self.bench = ray.get(bench_ref) if isinstance(bench_ref, ray.ObjectRef) else bench_ref
        self.text_col, self.n = text_col, n

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = util.strip_schema_metadata(batch)  # pandas-written parquet input
        d, g = ngram_doc_hashes(batch, text_col=self.text_col, n=self.n)
        hits = np.zeros(batch.num_rows, dtype=np.int64)
        if len(g) and len(self.bench):
            idx = np.searchsorted(self.bench, g).clip(max=len(self.bench) - 1)
            m = self.bench[idx] == g
            np.add.at(hits, d[m], 1)
        return batch.append_column(
            "ngram_hits", pa.array(hits)
        ).append_column("contaminated", pa.array((hits > 0).astype(np.int32)))


def decontaminate(
    ds: rd.Dataset,
    bench_hashes: np.ndarray,
    *,
    text_col: str = "text",
    n: int = 5,
    drop: bool = False,
    concurrency: int | tuple[int, int] = (1, 8),
) -> rd.Dataset:
    """Annotate (or drop) training docs sharing any word n-gram with the
    benchmark set. `ngram_hits` = count of the doc's DISTINCT n-gram
    hashes present in the benchmark set; `contaminated` = hits > 0."""
    ref = ray.put(np.sort(np.asarray(bench_hashes, dtype=np.uint64)))
    out = ds.map_batches(
        _ContaminationProbe,
        fn_constructor_kwargs={
            "bench_ref": ref,
            "text_col": text_col,
            "n": n,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    if drop:
        # vectorized expression filter — a per-row Python lambda here would
        # be the slowest stage of the whole pipeline at corpus scale
        out = out.filter(expr="contaminated == 0")
    return out


def _sql_fold(n: int) -> str:
    """Horner fold of list_extract(hl, i..i+n-1) mod 2^64 — byte-for-byte
    the numpy uint64 wrap in ngram_doc_hashes."""
    expr = "list_extract(hl, i)::HUGEINT"
    for j in range(1, n):
        expr = f"(({expr} * {int(NGRAM_P)}) % {U64} + list_extract(hl, i + {j})) % {U64}"
    return expr


def contamination_oracle_sql(
    table: str = "documents",
    *,
    text_col: str = "text",
    key_col: str = "doc_id",
    n: int = 5,
    bench_mod: int = 50,
    bench_rem: int = 7,
) -> str:
    """ANSI-SQL (DuckDB) replica of the decontaminate query over `table`
    with the benchmark set defined as `key % bench_mod = bench_rem`:
    identical word split, word hash (detmix CTEs) and n-gram fold, then
    a distinct-hash membership count per training doc. ASCII corpora
    only (same caveat as minhash_oracle_sql), and words are hashed over
    at most 128 chars on the SQL side (detmix.sql_string_hash_ctes cap)
    while numpy hashes the full word — parity requires words <= 128
    chars, which every driver/test corpus satisfies."""
    ws = r"[ \t\n\r\x0b\x0c]+"
    return f"""
WITH pow257_64(j, v) AS (VALUES {detmix.sql_pow257_64_values()}),
wl AS (
  SELECT {key_col} AS k,
    list_filter(regexp_split_to_array(lower({text_col}), '{ws}'), x -> x <> '') AS wl
  FROM {table}
),
w AS (
  SELECT k, unnest(wl) AS word, unnest(generate_series(1, len(wl))) AS wi FROM wl
),
{detmix.sql_string_hash_ctes("w", "word")},
hl AS (
  SELECT w.k, list(kh.h ORDER BY w.wi) AS hl
  FROM w JOIN kh ON kh.k = w.word
  GROUP BY w.k
),
ng AS (
  SELECT k, ({_sql_fold(n)})::UBIGINT AS g
  FROM (
    SELECT k, hl, unnest(generate_series(1, len(hl) - {n} + 1)) AS i
    FROM hl WHERE len(hl) >= {n}
  )
),
bench AS (SELECT DISTINCT g FROM ng WHERE k % {bench_mod} = {bench_rem}),
hits AS (
  SELECT k, count(DISTINCT g) AS ngram_hits
  FROM ng
  WHERE k % {bench_mod} <> {bench_rem} AND g IN (SELECT g FROM bench)
  GROUP BY k
)
SELECT d.{key_col} AS doc_id,
       coalesce(h.ngram_hits, 0)::BIGINT AS ngram_hits,
       (coalesce(h.ngram_hits, 0) > 0)::INT AS contaminated
FROM {table} d
LEFT JOIN hits h ON h.k = d.{key_col}
WHERE d.{key_col} % {bench_mod} <> {bench_rem}
"""


# ---------------------------------------------------------------------------
# semantic (embedding-cosine) decontamination: the embedding analogue of
# the n-gram rule above — flag training items whose embedding is
# near-identical to ANY benchmark embedding (paraphrased/translated eval
# leakage the n-gram probe structurally misses).
# ---------------------------------------------------------------------------


def benchmark_int8_set(
    bench_ds: rd.Dataset, *, vec_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray]:
    """Int8-quantize the benchmark embeddings -> ((K, dim) int64 matrix,
    (K,) squared norms) — the small broadcast side. Quantization is
    ann._int8_matrix's rule (per-vector max|x| scale, round-half-away),
    the one already replicated in SQL by the embedding-dedup oracles, so
    the whole operator stays value-checkable. Eval suites are megabytes
    by definition: only the quantized matrix ever reaches the driver."""
    mats = []
    for b in bench_ds.iter_batches(batch_format="pyarrow", batch_size=4096):
        m = ann_int8(util.strip_schema_metadata(b), vec_col)
        if m.size:
            mats.append(m)
    if not mats:
        return np.zeros((0, 0), np.int64), np.zeros(0, np.int64)
    dims = {m.shape[1] for m in mats}
    if len(dims) > 1:
        raise ValueError(f"benchmark embedding dims differ across batches: {sorted(dims)}")
    B = np.concatenate(mats)
    return B, (B * B).sum(axis=1)


class _SemanticProbe:
    """Actor-pool stage: quantized benchmark matrix fetched ONCE per actor
    in __init__ (ray.put broadcast); per-batch one int64 matmul + the
    exact rational cosine test (dot > 0 AND dot^2 * 10^4 >= pct^2 *
    |a|^2 |b|^2 — no floats past quantization, same rule as
    dedup._int8_drop_keys). Int64-safe to dim 1880 (127^4 * dim^2 * 10^4
    must stay under 2^63); larger dims raise loudly rather than wrap."""

    def __init__(self, bench_ref, vec_col: str, threshold_pct: int):
        self.B, self.n2b = (
            ray.get(bench_ref) if isinstance(bench_ref, ray.ObjectRef) else bench_ref
        )
        self.vec_col, self.pct = vec_col, int(threshold_pct)

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = util.strip_schema_metadata(batch)
        hits = np.zeros(batch.num_rows, dtype=np.int64)
        if batch.num_rows and self.B.shape[0]:
            Q = ann_int8(batch, self.vec_col)
            if Q.shape[1] != self.B.shape[1]:
                raise ValueError(
                    f"corpus embedding dim {Q.shape[1]} != benchmark dim {self.B.shape[1]}"
                )
            if Q.shape[1] > 1880:
                raise ValueError(
                    f"dim {Q.shape[1]} > 1880: dot^2 * 10^4 would overflow "
                    "int64 and silently diverge from the HUGEINT SQL oracle"
                )
            D = Q @ self.B.T  # (n, K) int64
            n2 = (Q * Q).sum(axis=1)
            ok = (D > 0) & (D * D * 10000 >= self.pct * self.pct * np.outer(n2, self.n2b))
            hits = ok.sum(axis=1).astype(np.int64)
        return batch.append_column("sem_hits", pa.array(hits)).append_column(
            "contaminated", pa.array((hits > 0).astype(np.int32))
        )


def semantic_decontaminate(
    ds: rd.Dataset,
    bench_ds: rd.Dataset,
    *,
    vec_col: str = "embedding",
    threshold_pct: int = 99,
    drop: bool = False,
    concurrency: int | tuple[int, int] = (1, 8),
) -> rd.Dataset:
    """Annotate (or drop) corpus rows whose embedding has cosine >=
    threshold_pct/100 against ANY benchmark embedding. `sem_hits` = how
    many benchmark vectors match; `contaminated` = hits > 0.

    Scale contract (100 TB): identical to `decontaminate` — the benchmark
    side is small by definition, quantized once and broadcast via
    ray.put; the corpus streams through one actor-pool map_batches whose
    per-batch work is a single int64 matmul. No shuffle, no driver pass
    over the corpus. SQL twin: `semantic_oracle_sql`."""
    ref = ray.put(benchmark_int8_set(bench_ds, vec_col=vec_col))
    out = util.clean_dataset(ds).map_batches(
        _SemanticProbe,
        fn_constructor_kwargs={
            "bench_ref": ref,
            "vec_col": vec_col,
            "threshold_pct": threshold_pct,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    if drop:
        out = out.filter(expr="contaminated == 0")
    return out


def semantic_oracle_sql(
    src: str,
    *,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    threshold_pct: int = 99,
    bench_pred: str = ">= 100000",
    corpus_pred: str = "< 100000",
) -> str:
    """DuckDB replica of semantic_decontaminate over `src` (a table name
    or parenthesized subquery) with benchmark/corpus sides split by a
    key predicate: int8 quantization (the SQL-replicated
    embedding_quantize rule), integer dot products, the exact rational
    cosine test, LEFT-JOINed hit counts per corpus row."""
    pct = int(threshold_pct)
    return f"""
WITH e AS (SELECT {key_col} AS k, {vec_col} AS v,
  list_max(list_transform({vec_col}, x -> abs(x::DOUBLE))) AS scale FROM {src} AS s),
t AS (SELECT k, scale, unnest(v) AS x,
  unnest(generate_series(1, len(v))) AS i FROM e),
q AS (SELECT k, i - 1 AS d,
  CASE WHEN scale > 0 THEN round(x::DOUBLE / scale * 127)::BIGINT ELSE 0 END AS qv
  FROM t),
n2 AS (SELECT k, sum(qv * qv)::BIGINT AS n2 FROM q GROUP BY k),
dots AS (
  SELECT qa.k AS a, qb.k AS b, sum(qa.qv * qb.qv)::BIGINT AS dp
  FROM q qa JOIN q qb ON qb.d = qa.d
  WHERE qa.k {corpus_pred} AND qb.k {bench_pred}
  GROUP BY qa.k, qb.k
),
hits AS (
  SELECT a AS k, count(*)::BIGINT AS sem_hits
  FROM dots
  JOIN n2 na ON na.k = dots.a
  JOIN n2 nb ON nb.k = dots.b
  WHERE dp > 0
    AND dp::HUGEINT * dp * 10000 >= {pct}::HUGEINT * {pct} * na.n2 * nb.n2
  GROUP BY a
)
SELECT e.k AS {key_col},
       coalesce(h.sem_hits, 0)::BIGINT AS sem_hits,
       (coalesce(h.sem_hits, 0) > 0)::INT AS contaminated
FROM e LEFT JOIN hits h ON h.k = e.k
WHERE e.k {corpus_pred}
"""
