"""Distributed Bloom filter: a mergeable bit-set sketch for set-membership
at corpus scale — the standard primitive for 100-TB decontamination /
URL-blocklist / seen-before probes where even the distinct-hash array of
the reference set (`contamination.benchmark_ngram_set`) would be too big
to broadcast. No reference analogue (training-data-pipeline first-class
op, like `pipelines/contamination`); the mergeable-sketch shape mirrors
`stages/stats.hll_registers`.

Scale contract (100 TB): per-block partials are DISTINCT bit positions —
at most min(k x grams_in_block, m) rows regardless of block rows — merged
by one sketch-bounded distinct shuffle (`groupby(pos)`); the packed
filter is m/64 uint64 words (m is a DESIGN constant, e.g. 2^30 bits =
128 MiB for ~10^8 items at 1% FP), built once on the driver and broadcast
via `ray.put`; the corpus streams through one `map_batches` probe pass.
Driver state is O(m), never O(corpus).

Determinism / oracle: item hash = the contamination n-gram fold (detmix
word hashes + FNV Horner), bit positions = Kirsch-Mitzenmacher double
hashing (public: "Less Hashing, Same Performance", ESA 2006)
pos_i = (h1 + i*h2) mod 2^64 mod m with h1/h2 = seeded splitmix64 remixes
(h2 forced odd) — all plain modular integer math, replicated exactly in
DuckDB HUGEINT arithmetic (`bloom_registers_oracle_sql` /
`bloom_decontaminate_oracle_sql`), so the packed words AND the probe
verdicts (false positives included) value-check end to end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .. import util
from ..functions import detmix
from . import contamination

M_BITS_DEFAULT = 1 << 20
K_DEFAULT = 4

# seeded splitmix64 remix constants (inlined into the SQL twins)
_SEED_H1 = int(detmix.splitmix64(1))
_SEED_H2 = int(detmix.splitmix64(2))
U64 = 1 << 64


def bit_positions(g: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(k, len(g)) int64 bit positions of item hashes `g` (uint64):
    Kirsch-Mitzenmacher double hashing, h2 forced odd so the k probes
    never degenerate when m is a power of two."""
    if m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two, got {m_bits}")
    g = np.asarray(g, dtype=np.uint64)
    h1 = detmix.splitmix64(g ^ np.uint64(_SEED_H1))
    h2 = detmix.splitmix64(g ^ np.uint64(_SEED_H2)) | np.uint64(1)
    out = np.empty((k, len(g)), np.int64)
    mask = np.uint64(m_bits - 1)
    with np.errstate(over="ignore"):
        for i in range(k):
            out[i] = ((h1 + np.uint64(i) * h2) & mask).astype(np.int64)
    return out


def _position_partials(
    t: pa.Table, *, text_col: str, n: int, m_bits: int, k: int
) -> pa.Table:
    """Per-block DISTINCT bit positions of the block's n-gram hashes —
    the sketch-bounded shuffle payload (<= min(k x grams, m_bits) rows)."""
    t = util.strip_schema_metadata(t)
    _, g = contamination.ngram_doc_hashes(t, text_col=text_col, n=n)
    if len(g) == 0:
        return pa.table({"pos": pa.array([], pa.int64())})
    pos = np.unique(bit_positions(np.unique(g), m_bits, k))
    return pa.table({"pos": pa.array(pos, pa.int64())})


def bloom_build_positions(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    n: int = 5,
    m_bits: int = M_BITS_DEFAULT,
    k: int = K_DEFAULT,
) -> rd.Dataset:
    """Distinct set bit positions of the Bloom filter over `ds`'s word
    n-grams, as a Dataset of (pos int64) — one sketch-bounded distinct
    shuffle (the merge IS the shuffle, exactly like hll_registers)."""
    parts = ds.map_batches(
        lambda t: _position_partials(t, text_col=text_col, n=n, m_bits=m_bits, k=k),
        batch_format="pyarrow",
    )
    agg = parts.groupby("pos").count()
    return agg.map_batches(
        lambda t: t.select(["pos"]) if t.num_columns else t, batch_format="pyarrow"
    )


def pack_words(pos: np.ndarray, m_bits: int) -> np.ndarray:
    """Distinct bit positions -> dense packed filter (m_bits/64 uint64)."""
    words = np.zeros(m_bits // 64, np.uint64)
    pos = np.asarray(pos, np.int64)
    if len(pos):
        np.bitwise_or.at(
            words, pos >> 6, np.uint64(1) << (pos & np.int64(63)).astype(np.uint64)
        )
    return words


def registers_table(words: np.ndarray) -> pa.Table:
    """Packed filter -> (word_idx int64, word_val int64) rows for the
    nonzero words — the value-checkable face of the packed bitmap (the
    uint64 word viewed as two's-complement int64, matching the SQL
    twin's wrap)."""
    nz = np.nonzero(words)[0]
    return pa.table(
        {
            "word_idx": pa.array(nz.astype(np.int64), pa.int64()),
            "word_val": pa.array(words[nz].view(np.int64), pa.int64()),
        }
    )


def bloom_build(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    n: int = 5,
    m_bits: int = M_BITS_DEFAULT,
    k: int = K_DEFAULT,
) -> np.ndarray:
    """Build the packed filter. The driver holds O(m_bits/8) bytes — a
    design constant independent of corpus size (the whole point of the
    sketch vs the exact distinct-hash set)."""
    pos_rows = bloom_build_positions(
        ds, text_col=text_col, n=n, m_bits=m_bits, k=k
    ).take_all()  # <= m_bits rows, bounded by the design constant
    pos = np.fromiter((r["pos"] for r in pos_rows), np.int64, count=len(pos_rows))
    return pack_words(pos, m_bits)


class _BloomProbe:
    """Actor-pool stage: packed filter fetched ONCE per actor in
    __init__ (ray.put broadcast), per-batch vectorized k-bit probe."""

    def __init__(self, words_ref, text_col: str, n: int, m_bits: int, k: int):
        self.words = (
            ray.get(words_ref) if isinstance(words_ref, ray.ObjectRef) else words_ref
        )
        self.text_col, self.n, self.m_bits, self.k = text_col, n, m_bits, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = util.strip_schema_metadata(batch)
        d, g = contamination.ngram_doc_hashes(batch, text_col=self.text_col, n=self.n)
        hits = np.zeros(batch.num_rows, dtype=np.int64)
        if len(g):
            pos = bit_positions(g, self.m_bits, self.k)
            present = (
                (self.words[pos >> 6] >> (pos & np.int64(63)).astype(np.uint64))
                & np.uint64(1)
            ).astype(bool)
            all_k = present.all(axis=0)
            np.add.at(hits, d[all_k], 1)
        return batch.append_column("bloom_hits", pa.array(hits)).append_column(
            "bloom_flag", pa.array((hits > 0).astype(np.int32))
        )


def bloom_probe(
    ds: rd.Dataset,
    words: np.ndarray,
    *,
    text_col: str = "text",
    n: int = 5,
    m_bits: int = M_BITS_DEFAULT,
    k: int = K_DEFAULT,
    concurrency: int | tuple[int, int] = (1, 8),
) -> rd.Dataset:
    """Annotate docs with the count of their DISTINCT n-gram hashes whose
    k Bloom bits are all set (`bloom_hits`) and `bloom_flag` = hits > 0.
    One streaming pass; the filter ships once per actor."""
    ref = ray.put(np.asarray(words, np.uint64))
    return ds.map_batches(
        _BloomProbe,
        fn_constructor_kwargs={
            "words_ref": ref,
            "text_col": text_col,
            "n": n,
            "m_bits": m_bits,
            "k": k,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# SQL twins (DuckDB) — byte-for-byte replicas of the kernels above
# ---------------------------------------------------------------------------


def _sql_gram_ctes(table: str, text_col: str, key_col: str, n: int, where: str) -> str:
    """CTE chain ending in ``ng(k, g)``: per-doc DISTINCT word-n-gram
    hashes of `table` rows matching `where` — the same split / word hash
    / FNV Horner fold as contamination.ngram_doc_hashes."""
    ws = r"[ \t\n\r\x0b\x0c]+"
    fold = contamination._sql_fold(n)
    return f"""wl AS (
  SELECT {key_col} AS k,
    list_filter(regexp_split_to_array(lower({text_col}), '{ws}'), x -> x <> '') AS wl
  FROM {table} WHERE {where}
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
  SELECT DISTINCT k, ({fold})::UBIGINT AS g
  FROM (
    SELECT k, hl, unnest(generate_series(1, len(hl) - {n} + 1)) AS i
    FROM hl WHERE len(hl) >= {n}
  )
)"""


def _sql_positions(m_bits: int, k: int) -> str:
    """CTE ``bpos(k, g, i, pos)``: the k Kirsch-Mitzenmacher bit positions
    of every ng row (splits h1/h2 exactly as bit_positions does)."""
    h1 = detmix.sql_splitmix64(f"xor(g, {_SEED_H1})")
    h2 = detmix.sql_splitmix64(f"xor(g, {_SEED_H2})")
    return f"""bh AS (
  SELECT k, g, ({h1})::HUGEINT AS h1, (({h2}) | 1::UBIGINT)::HUGEINT AS h2 FROM ng
),
bpos AS (
  SELECT k, g, i, ((h1 + i * h2) % {U64}) % {m_bits} AS pos
  FROM bh, LATERAL unnest(generate_series(0, {k - 1})) AS t(i)
)"""


def bloom_registers_oracle_sql(
    table: str = "documents",
    *,
    text_col: str = "text",
    key_col: str = "doc_id",
    n: int = 5,
    m_bits: int = M_BITS_DEFAULT,
    k: int = K_DEFAULT,
    where: str = "TRUE",
) -> str:
    """DuckDB replica of bloom_build + registers_table: nonzero packed
    words of the filter. sum(DISTINCT 1 << bit) == bitwise OR because the
    bits are distinct within a word; the >= 2^63 fold reproduces numpy's
    uint64 -> int64 view."""
    return f"""WITH pow257_64(j, v) AS (VALUES {detmix.sql_pow257_64_values()}),
{_sql_gram_ctes(table, text_col, key_col, n, where)},
{_sql_positions(m_bits, k)},
wv AS (
  SELECT pos // 64 AS word_idx,
         sum(DISTINCT (1::HUGEINT << (pos % 64)::INT)) AS s
  FROM (SELECT DISTINCT pos FROM bpos)
  GROUP BY pos // 64
)
SELECT word_idx::BIGINT AS word_idx,
       (CASE WHEN s >= {1 << 63}::HUGEINT THEN s - {U64}::HUGEINT ELSE s END)::BIGINT
         AS word_val
FROM wv"""


def bloom_decontaminate_oracle_sql(
    table: str = "documents",
    *,
    text_col: str = "text",
    key_col: str = "doc_id",
    n: int = 5,
    m_bits: int = M_BITS_DEFAULT,
    k: int = K_DEFAULT,
    bench_mod: int = 50,
    bench_rem: int = 7,
) -> str:
    """DuckDB replica of: build a Bloom filter over the benchmark docs
    (key % bench_mod = bench_rem), probe every other doc. One shared
    gram CTE over ALL docs (tagged bench/train), positions once, the
    built bit set = bench positions, a train gram hits iff ALL k of its
    positions are present (bool_and — self-collisions handled exactly
    like the engine's bitmap read), so false positives match too."""
    ws = r"[ \t\n\r\x0b\x0c]+"
    fold = contamination._sql_fold(n)
    h1 = detmix.sql_splitmix64(f"xor(g, {_SEED_H1})")
    h2 = detmix.sql_splitmix64(f"xor(g, {_SEED_H2})")
    return f"""WITH pow257_64(j, v) AS (VALUES {detmix.sql_pow257_64_values()}),
wl AS (
  SELECT {key_col} AS k, ({key_col} % {bench_mod} = {bench_rem}) AS is_bench,
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
  SELECT DISTINCT k, ({fold})::UBIGINT AS g
  FROM (
    SELECT k, hl, unnest(generate_series(1, len(hl) - {n} + 1)) AS i
    FROM hl WHERE len(hl) >= {n}
  )
),
bh AS (
  SELECT k, g, ({h1})::HUGEINT AS h1, (({h2}) | 1::UBIGINT)::HUGEINT AS h2 FROM ng
),
bpos AS (
  SELECT k, g, ((h1 + i * h2) % {U64}) % {m_bits} AS pos
  FROM bh, LATERAL unnest(generate_series(0, {k - 1})) AS t(i)
),
bset AS (
  SELECT DISTINCT pos FROM bpos JOIN wl USING (k) WHERE wl.is_bench
),
gram_hit AS (
  SELECT p.k, p.g, bool_and(bset.pos IS NOT NULL) AS hit
  FROM bpos p
  JOIN wl ON wl.k = p.k AND NOT wl.is_bench
  LEFT JOIN bset ON bset.pos = p.pos
  GROUP BY p.k, p.g
),
doc_hits AS (
  SELECT k, sum(CASE WHEN hit THEN 1 ELSE 0 END)::BIGINT AS bloom_hits
  FROM gram_hit GROUP BY k
)
SELECT wl.k AS {key_col},
       coalesce(d.bloom_hits, 0)::BIGINT AS bloom_hits,
       (coalesce(d.bloom_hits, 0) > 0)::INT AS bloom_flag
FROM wl LEFT JOIN doc_hits d ON d.k = wl.k
WHERE NOT wl.is_bench"""
