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

# FNV-1a 64-bit prime (~2^40): small enough that HUGEINT (int128) holds
# acc * P without overflow in the SQL replica (2^64 * 2^40 < 2^127)
NGRAM_P = np.uint64(1099511628211)
U64 = 1 << 64


def _word_lists(batch: pa.Table, text_col: str):
    """lowercase whitespace-split word lists (identical split semantics to
    the SQL oracle's regexp_split_to_array + list_filter non-empty)."""
    s = batch.column(text_col).to_pandas().fillna("")
    return s.str.lower().str.split()


def ngram_doc_hashes(
    batch: pa.Table, *, text_col: str = "text", n: int = 5
) -> tuple[np.ndarray, np.ndarray]:
    """-> (doc_index int64, g uint64): one row per DISTINCT word-n-gram
    hash per document in the batch. Fully vectorized: all words of all
    docs hashed in one string_hash64 call, the n-fold Horner combine is
    n-1 vectorized multiply-adds over shifted slices, doc boundaries are
    masked (a window never crosses documents), distinctness via lexsort."""
    if n < 1:
        raise ValueError(f"n-gram order must be >= 1, got {n}")
    word_lists = _word_lists(batch, text_col)
    lens = word_lists.map(len).to_numpy(np.int64)
    total = int(lens.sum())
    if total < n:
        return np.zeros(0, np.int64), np.zeros(0, np.uint64)
    exploded = word_lists.explode()
    flat = exploded[exploded.notna()].to_numpy(dtype=object)
    wh = detmix.string_hash64(flat)
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
