"""Deterministic 64-bit mixing — the shared hash kernel behind SimHash
word hashes, source-mixture sampling and epoch ordering.

Every function here is plain modular uint64 arithmetic (polynomial byte
hash base 257 mod 2^64, splitmix64 finalizer), chosen precisely so each
consumer can carry a value-checked DuckDB oracle: the SQL builders below
emit the byte-for-byte equivalent expressions (HUGEINT stands in for the
uint64 wrap; the 64x64 splitmix multiplies are split into 32-bit halves
because a full product overflows INT128).

splitmix64 constants: Steele/Lea/Flood (public-domain PRNG finalizer).
"""

from __future__ import annotations

import numpy as np

U64 = 1 << 64
SM64_C1 = np.uint64(0x9E3779B97F4A7C15)
SM64_C2 = np.uint64(0xBF58476D1CE4E5B9)
SM64_C3 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray | int) -> np.ndarray | np.uint64:
    """splitmix64 finalizer over uint64 (vectorized; all ops wrap —
    errstate silences numpy's SCALAR-only overflow warning; mod-2^64
    wraparound is the whole point)."""
    with np.errstate(over="ignore"):
        z = np.asarray(x, dtype=np.uint64) + SM64_C1
        z = (z ^ (z >> np.uint64(30))) * SM64_C2
        z = (z ^ (z >> np.uint64(27))) * SM64_C3
        out = z ^ (z >> np.uint64(31))
    return out if out.ndim else np.uint64(out)


def string_hash64(flat: np.ndarray) -> np.ndarray:
    """uint64 hash per string: byte-polynomial base 257 (Horner, mod 2^64)
    + splitmix64. One encode of the whole stream, one table-gathered
    multiply, one segment reduceat — no per-string Python loop. (For
    strings already in an Arrow array, functions/words.hash_string_array
    computes the identical hash on the array's own UTF-8 buffers with no
    object round trip.)"""
    joined = "".join(flat.tolist())
    data = np.frombuffer(joined.encode("utf-8"), dtype=np.uint8)
    lens = np.fromiter((len(w) for w in flat), np.int64, count=len(flat))
    if int(lens.sum()) != len(data):  # non-ASCII: char len != byte len
        lens = np.fromiter(
            (len(w.encode("utf-8")) for w in flat), np.int64, count=len(flat)
        )
    return hash_utf8_segments(data, lens)


def hash_utf8_segments(data: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """The string_hash64 core over a flat UTF-8 byte stream: `data` is
    the concatenated bytes, `lens` the per-string byte lengths (sum ==
    len(data)). Shared by the object-array entry above and the
    zero-copy Arrow-buffer entry (functions/words.hash_string_array)."""
    if len(data) == 0:
        return splitmix64(np.zeros(len(lens), dtype=np.uint64))
    ends = np.cumsum(lens)
    # exponent of 257 for each byte: position from its string's END
    wend = np.repeat(ends, lens)
    exp = wend - 1 - np.arange(len(data), dtype=np.int64)
    powers = np.ones(int(lens.max()) + 1, dtype=np.uint64)
    powers[1:] = 257
    np.multiply.accumulate(powers, out=powers)  # 257^j mod 2^64 (wraps)
    terms = data.astype(np.uint64) * powers[exp]
    h = np.zeros(len(lens), dtype=np.uint64)
    ne = lens > 0  # empty strings hash as 0 before the finalizer
    if ne.any():
        h[ne] = np.add.reduceat(terms, (ends - lens)[ne])
    return splitmix64(h)


def seeded_mix(h: np.ndarray, seed: int) -> np.ndarray:
    """Seed-dependent remix: splitmix64(h XOR splitmix64(seed))."""
    return splitmix64(np.asarray(h, dtype=np.uint64) ^ splitmix64(int(seed) % U64))


# ---------------------------------------------------------------------------
# SQL builders (DuckDB) — byte-for-byte replicas of the kernels above
# ---------------------------------------------------------------------------


def sql_splitmix64(expr: str) -> str:
    """SQL expression: splitmix64 of a non-negative HUGEINT expression.
    Returns a UBIGINT-typed expression."""
    c1, c2, c3 = int(SM64_C1), int(SM64_C2), int(SM64_C3)

    def mul_mod64(zexpr: str, c: int) -> str:
        # (z * C) mod 2^64 via 32-bit halves (full product overflows INT128)
        return (
            f"((( (({zexpr}) & 4294967295)::HUGEINT * {c}) % {U64}"
            f" + ((( ({zexpr}) >> 32)::HUGEINT * {c}) % 4294967296) * 4294967296"
            f") % {U64})::UBIGINT"
        )

    z1 = f"((({expr})::HUGEINT + {c1}) % {U64})::UBIGINT"
    z2 = mul_mod64(f"xor({z1}, {z1} >> 30)", c2)
    z3 = mul_mod64(f"xor({z2}, {z2} >> 27)", c3)
    return f"xor({z3}, {z3} >> 31)"


def sql_string_hash_ctes(source_sql: str, key_col: str, max_len: int = 128) -> str:
    """CTE chain (to splice after a ``pow257_64(j, v)`` CTE) computing
    ``kh(k, h)``: string_hash64 of DISTINCT `key_col` values of
    `source_sql`. ASCII keys only (ascii(substr()) == the UTF-8 byte for
    7-bit text). Join ``kh`` back on k for per-row hashes.

    Empty keys hash as splitmix64(0) via the LEFT JOIN + coalesce (an
    inner path would silently DROP them — the Ray kernel keeps them);
    keys longer than the pow table raise loudly via error() instead of
    losing high-order terms to a silent join miss."""
    return f"""
kh_d AS (
  SELECT CASE WHEN length(k) > {max_len}
              THEN error('detmix oracle: key longer than pow257_64 table ('
                         || length(k) || ' > {max_len} chars)')
              ELSE k END AS k
  FROM (SELECT DISTINCT {key_col} AS k FROM {source_sql})
),
kh_c AS (
  SELECT k, unnest(generate_series(1, length(k))) AS i FROM kh_d
),
kh_r AS (
  SELECT k, (sum((ascii(substr(k, i::INT, 1))::HUGEINT * p.v) % {U64}) % {U64}) AS r
  FROM kh_c JOIN pow257_64 p ON p.j = length(kh_c.k) - kh_c.i
  GROUP BY k, length(k)
),
kh AS (
  SELECT d.k, {sql_splitmix64("coalesce(r.r, 0)")} AS h
  FROM kh_d d LEFT JOIN kh_r r ON r.k = d.k
)"""


def sql_pow257_64_values(max_len: int = 128) -> str:
    """VALUES list for a ``pow257_64(j, v)`` CTE: 257^j mod 2^64."""
    vals, acc = [], 1
    for j in range(max_len + 1):
        vals.append(f"({j}, {acc}::HUGEINT)")
        acc = (acc * 257) % U64
    return ", ".join(vals)
