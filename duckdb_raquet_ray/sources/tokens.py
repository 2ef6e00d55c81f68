"""Deterministic synthesis of the primary input table (FIXTURES.md F1).

Schema (BASELINE.json input_hint): doc_id:string, tokens:list<int32>,
n_tok:int32, source:string. Everything is a pure function of
(seed, shard index), generated fully vectorized, so any scale can be
re-materialized identically on any machine — the analogue of the
reference's committed seed-42 fixture
(/root/reference/test/sql/read_raster_metadata.test:12-16).

Token mixture per row (exercises every codec):
  30% uniform in [0, vocab)        -> bit-pack
  30% narrow band [base, base+256) -> frame-of-reference
  20% runs of repeated ids         -> RLE
  20% 64-symbol dictionary         -> dict
`source` is Zipf(a=1.2) over 20 names (head key ~40% of rows) — the skew
regression input (SURVEY.md §7 hard-part 4).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = 50_257
SOURCES = [
    "web", "code", "books", "wiki", "news", "forums", "papers", "social",
    "legal", "medical", "patents", "reviews", "mail", "chat", "docs",
    "finance", "edu", "gov", "tech", "misc",
]
ZIPF_A = 1.2

SIZES = {
    "smoke": (1_000, 1),
    "correctness": (50_000, 8),
    "bench": (2_000_000, 64),
}


def _zipf_probs(k: int = len(SOURCES), a: float = ZIPF_A) -> np.ndarray:
    w = 1.0 / np.arange(1, k + 1) ** a
    return w / w.sum()


def _source_bands(vocab: int) -> tuple[np.ndarray, int]:
    """Per-source vocab band starts + width for the source-coherent mode."""
    band = vocab // len(SOURCES)
    starts = (np.arange(len(SOURCES)) * band).astype(np.int32)
    return starts, band


def _source_alphabet(seed: int, src_idx: int, vocab: int) -> np.ndarray:
    """64-symbol dictionary alphabet of ONE source, shared across shards —
    a pure function of (seed, source), so grouped-by-source partitions see
    one coherent alphabet no matter which shards fed them."""
    starts, band = _source_bands(vocab)
    rng = np.random.default_rng(np.random.SeedSequence([seed, 1_000_000 + src_idx]))
    return (starts[src_idx] + rng.choice(band, size=64, replace=False)).astype(np.int32)


def generate_shard(
    shard: int,
    rows: int,
    *,
    seed: int = 42,
    vocab: int = VOCAB,
    row_offset: int = 0,
    skew_head: float | None = None,
    source_coherent: bool = False,
) -> pa.Table:
    """One shard as an Arrow table; pure function of (seed, shard[, mode]).

    ``source_coherent=True`` is the F5 variant: every token class draws
    from the row's SOURCE-specific vocab band (and the dict alphabet is a
    function of the source, not the shard) — the realistic regime where
    domains have distinct token distributions, so grouping by source
    before encoding genuinely narrows the per-partition value structure.
    The default F1 mixture is deliberately source-INDEPENDENT (per-row /
    per-shard structure only), the adversarial case for grouped encode."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, shard]))

    n_tok = np.clip(rng.lognormal(5.5, 1.0, size=rows), 1, 8192).astype(np.int32)
    total = int(n_tok.sum())
    offsets = np.zeros(rows + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])

    cls = rng.choice(4, size=rows, p=[0.30, 0.30, 0.20, 0.20])
    row_of = np.repeat(np.arange(rows), n_tok)
    cls_of = cls[row_of]

    if source_coherent:
        # F5 path: sources drawn FIRST (values key on them). The default
        # path below keeps the ORIGINAL rng draw order untouched so the
        # committed F1 fixture stays bit-identical across versions.
        if skew_head is None:
            src_idx = rng.choice(len(SOURCES), size=rows, p=_zipf_probs())
        else:
            p = np.full(len(SOURCES), (1 - skew_head) / (len(SOURCES) - 1))
            p[0] = skew_head
            src_idx = rng.choice(len(SOURCES), size=rows, p=p)
        sources = np.array(SOURCES)[src_idx]
        starts, band = _source_bands(vocab)
        row_base = starts[src_idx]
        tok_base = row_base[row_of]
        flat = tok_base + rng.integers(0, band, size=total).astype(np.int32)
        m1 = cls_of == 1
        if m1.any():
            base = row_base + rng.integers(0, band - 256, size=rows).astype(np.int32)
            flat[m1] = base[row_of[m1]] + rng.integers(0, 256, size=int(m1.sum())).astype(np.int32)
        m2 = cls_of == 2
        if m2.any():
            k = int(m2.sum())
            change = rng.random(k) < 0.125
            row_ids = row_of[m2]
            change[np.concatenate(([True], row_ids[1:] != row_ids[:-1]))] = True
            seg = np.cumsum(change) - 1
            seg_vals = rng.integers(0, band, size=int(seg[-1]) + 1 if k else 0).astype(np.int32)
            flat[m2] = tok_base[m2] + seg_vals[seg]
        m3 = cls_of == 3
        if m3.any():
            alphabets = np.stack(
                [_source_alphabet(seed, i, vocab) for i in range(len(SOURCES))]
            )
            picks = rng.integers(0, 64, size=int(m3.sum()))
            flat[m3] = alphabets[src_idx[row_of[m3]], picks]
        return _assemble(sources, flat, n_tok, offsets, rows, row_offset, total)

    flat = rng.integers(0, vocab, size=total).astype(np.int32)

    # class 1: narrow band [base, base+256)
    m1 = cls_of == 1
    if m1.any():
        base = rng.integers(0, vocab - 256, size=rows).astype(np.int32)
        flat[m1] = base[row_of[m1]] + rng.integers(0, 256, size=int(m1.sum())).astype(np.int32)

    # class 2: runs of repeated ids (change prob 1/8, reset at row starts)
    m2 = cls_of == 2
    if m2.any():
        k = int(m2.sum())
        change = rng.random(k) < 0.125
        # force a new run at each row boundary within the masked stream
        row_ids = row_of[m2]
        change[np.concatenate(([True], row_ids[1:] != row_ids[:-1]))] = True
        seg = np.cumsum(change) - 1
        seg_vals = rng.integers(0, vocab, size=int(seg[-1]) + 1 if k else 0).astype(np.int32)
        flat[m2] = seg_vals[seg]

    # class 3: 64-symbol dictionary (alphabet fixed per shard)
    m3 = cls_of == 3
    if m3.any():
        alphabet = rng.choice(vocab, size=64, replace=False).astype(np.int32)
        flat[m3] = alphabet[rng.integers(0, 64, size=int(m3.sum()))]

    if skew_head is None:
        src_idx = rng.choice(len(SOURCES), size=rows, p=_zipf_probs())
    else:
        # F4 skew table: `skew_head` fraction of rows on the head key
        p = np.full(len(SOURCES), (1 - skew_head) / (len(SOURCES) - 1))
        p[0] = skew_head
        src_idx = rng.choice(len(SOURCES), size=rows, p=p)
    sources = np.array(SOURCES)[src_idx]

    return _assemble(sources, flat, n_tok, offsets, rows, row_offset, total)


def _assemble(sources, flat, n_tok, offsets, rows, row_offset, total) -> pa.Table:
    gids = row_offset + np.arange(rows)
    doc_id = pa.array([f"{s}/doc-{g:012d}" for s, g in zip(sources, gids)], type=pa.string())

    if total > np.iinfo(np.int32).max:
        raise ValueError(
            f"shard has {total} tokens, over the int32 list-offset limit; "
            "use more shards (the fixture keeps plain list<int32> so the "
            "schema matches the input_hint exactly)"
        )
    tokens = pa.ListArray.from_arrays(
        pa.array(offsets.astype(np.int32)), pa.array(flat, type=pa.int32())
    )
    return pa.table(
        {
            "doc_id": doc_id,
            "tokens": tokens,
            "n_tok": pa.array(n_tok, type=pa.int32()),
            "source": pa.array(sources, type=pa.string()),
        }
    )


def _write_one_shard(args: tuple) -> str:
    out_dir, k, n, seed, vocab, row_offset, skew_head, row_group_rows, coherent = args
    path = os.path.join(out_dir, f"shard-{k:05d}.parquet")
    if os.path.exists(path):
        return path
    table = generate_shard(
        k, n, seed=seed, vocab=vocab, row_offset=row_offset, skew_head=skew_head,
        source_coherent=coherent,
    )
    tmp = path + ".tmp"
    pq.write_table(table, tmp, row_group_size=row_group_rows)
    os.replace(tmp, path)
    return path


def write_corpus(
    out_dir: str,
    rows: int,
    shards: int,
    *,
    seed: int = 42,
    vocab: int = VOCAB,
    skew_head: float | None = None,
    row_group_rows: int = 8192,
    processes: int = 1,
    source_coherent: bool = False,
) -> list[str]:
    """Materialize a corpus as Parquet shards (idempotent: existing complete
    shards are kept — the generator is deterministic so re-use is safe).
    Reuse is gated on a `_params.json` fingerprint: re-running into the
    same dir with DIFFERENT generation parameters regenerates from
    scratch instead of silently keeping stale shards (rows/seed/skew
    would otherwise diverge from what the caller was told).
    ``processes > 1`` fans shard generation out over a process pool (each
    shard is a pure function of (seed, shard), so parallel generation is
    bit-identical to sequential)."""
    import glob as _glob
    import json as _json

    os.makedirs(out_dir, exist_ok=True)
    params = {
        "rows": rows, "shards": shards, "seed": seed, "vocab": vocab,
        "skew_head": skew_head, "row_group_rows": row_group_rows,
        "source_coherent": source_coherent,
    }
    ppath = os.path.join(out_dir, "_params.json")
    prior = None
    if os.path.exists(ppath):
        try:
            with open(ppath) as f:
                prior = _json.load(f)
        except Exception:
            prior = None
    if prior != params:
        if prior is not None or _glob.glob(os.path.join(out_dir, "shard-*.parquet")):
            for f in _glob.glob(os.path.join(out_dir, "shard-*.parquet")):
                os.remove(f)
        tmp = ppath + f".tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            _json.dump(params, f)
        os.replace(tmp, ppath)
    per = rows // shards
    jobs = []
    for k in range(shards):
        n = per + (rows % shards if k == shards - 1 else 0)
        jobs.append(
            (out_dir, k, n, seed, vocab, k * per, skew_head, row_group_rows, source_coherent)
        )
    if processes > 1 and shards > 1:
        from concurrent.futures import ProcessPoolExecutor

        with ProcessPoolExecutor(max_workers=processes) as ex:
            return list(ex.map(_write_one_shard, jobs))
    return [_write_one_shard(j) for j in jobs]


def corpus_paths(out_dir: str) -> list[str]:
    return sorted(
        os.path.join(out_dir, f)
        for f in os.listdir(out_dir)
        if f.startswith("shard-") and f.endswith(".parquet")
    )
