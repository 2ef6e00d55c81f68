"""Sequence packing — GPT-style concat-and-chop of a tokenized corpus
into fixed-length context windows.

Canonical pretraining packing: concatenate every document's tokens in
corpus order, append ONE separator token after each document, then cut the
stream every `window` tokens (documents may span a cut — the attention
mask handles that downstream). No analogue exists in the reference (it
packs pixels, not sequences); this is one of the beyond-reference
training-data operators the engine adds as a first-class component.

Scale shape — a distributed two-pass prefix sum, no all-to-all:

  pass 1 (plan): read ONLY the `n_tok` column of every shard (pruned
      column read), fold per-shard token totals on the driver, and
      exclusive-scan them into a per-shard BASE OFFSET — O(#shards)
      driver state, the same planner pattern as pipelines/encode.py.
  pass 2 (map): each shard task knows its global base, so every token's
      global position — hence its window id and offset inside the
      window — is pure arithmetic. Tasks emit per-window PARTIALS
      (count, position-weighted checksum, or the raw token pieces);
      only windows STRADDLING a shard boundary need merging, so the
      final groupby(window) moves O(#windows) tiny rows, never tokens.

The per-window checksum is position-weighted (sum((1 + pos_in_window) *
token)), so it pins token ORDER inside every window, and it is exactly
replicable in ANSI SQL (see __ray_entry__ `packed_windows` oracle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

SEP_TOKEN = 50_256  # GPT-2-style end-of-text id
DEFAULT_WINDOW = 2_048
_N_BUCKETS = 256  # coarse shuffle key (see pipelines/dedup.py rationale)


def plan_offsets(paths: list[str], length_column: str = "n_tok") -> list[dict]:
    """Pass 1: per-shard exclusive base offsets of the packed stream
    (each doc contributes n_tok + 1 — its tokens plus one separator).

    The per-shard totals are computed by PARALLEL pruned column reads
    (one tiny task per shard through Ray Data), not a serial driver loop —
    at 10^5 shards a serial footer+column read per file would make pass 1
    the job's wall-clock floor. Only O(#shards) scalars return to the
    driver for the exclusive scan."""

    def shard_total(batch: pa.Table) -> pa.Table:
        totals = []
        for p in batch.column("path").to_pylist():
            t = pq.read_table(p, columns=[length_column])
            totals.append(int(np.asarray(t.column(length_column)).sum()) + t.num_rows)
        return pa.table({"path": batch.column("path"), "total": pa.array(totals, pa.int64())})

    items = rd.from_items([{"path": p} for p in paths], override_num_blocks=len(paths))
    got = {
        r["path"]: r["total"]
        for r in items.map_batches(shard_total, batch_format="pyarrow").take_all()
    }
    totals = [got[p] for p in paths]  # restore input order (take_all may not)
    bases = np.zeros(len(paths), dtype=np.int64)
    np.cumsum(totals[:-1], out=bases[1:])
    return [
        {"path": p, "base": int(b), "total": int(n)}
        for p, b, n in zip(paths, bases, totals)
    ]


def _flat_with_seps(t: pa.Table, tokens_column: str) -> np.ndarray:
    """Concatenate the shard's token lists with a separator after each doc
    — vectorized scatter, no per-row loop."""
    col = t.column(tokens_column)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    child = col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    lengths = np.asarray(
        pc.list_value_length(col).to_numpy(zero_copy_only=False), dtype=np.int64
    )
    n = len(child) + len(lengths)
    flat = np.empty(n, dtype=np.int64)
    # separator positions: after each doc's tokens in the packed stream
    sep_pos = np.cumsum(lengths + 1) - 1
    flat[sep_pos] = SEP_TOKEN
    mask = np.ones(n, dtype=bool)
    mask[sep_pos] = False
    flat[mask] = child
    return flat


def _window_splits(base: int, n: int, window: int) -> tuple[np.ndarray, np.ndarray]:
    """Split indices of a shard's [base, base+n) stream slice at global
    window boundaries -> (segment start indices into the slice, window ids)."""
    first_w = base // window
    last_w = (base + n - 1) // window
    wins = np.arange(first_w, last_w + 1, dtype=np.int64)
    starts = np.maximum(wins * window - base, 0)
    return starts, wins


def packed_window_stats(
    paths: list[str],
    window: int = DEFAULT_WINDOW,
    tokens_column: str = "tokens",
    length_column: str = "n_tok",
) -> rd.Dataset:
    """-> Dataset of (window, n_tokens, checksum): count and position-
    weighted checksum of every packed context window (order-pinning,
    SQL-replicable). Shard tasks emit per-window partials; the groupby
    merges only boundary-straddling windows."""
    plan = plan_offsets(paths, length_column)

    def shard_partials(batch: pa.Table) -> pa.Table:
        out = []
        for row in batch.to_pylist():
            t = pq.read_table(row["path"], columns=[tokens_column])
            flat = _flat_with_seps(t, tokens_column)
            if len(flat) != row["total"]:
                raise ValueError(
                    f"{row['path']}: token stream length {len(flat)} != planned "
                    f"{row['total']} — {length_column} disagrees with "
                    f"len({tokens_column}); window offsets would corrupt"
                )
            if len(flat) == 0:  # empty shard contributes nothing
                continue
            base = row["base"]
            starts, wins = _window_splits(base, len(flat), window)
            pos_in_w = (np.arange(len(flat), dtype=np.int64) + base) % window
            weighted = flat * (pos_in_w + 1)
            sums = np.add.reduceat(weighted, starts)
            counts = np.diff(np.append(starts, len(flat)))
            out.append(
                pa.table(
                    {
                        "window_id": pa.array(wins),
                        "n_tokens": pa.array(counts.astype(np.int64)),
                        "checksum": pa.array(sums),
                        "_b": pa.array((wins % _N_BUCKETS).astype(np.int32)),
                    }
                )
            )
        if not out:
            return pa.table(
                {
                    "window_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "checksum": pa.array([], pa.int64()),
                    "_b": pa.array([], pa.int32()),
                }
            )
        return pa.concat_tables(out)

    items = rd.from_items(plan, override_num_blocks=max(len(plan), 1))

    def merge(group: pa.Table) -> pa.Table:
        # Arrow out (see stages/stats.py._combine_and_finalize)
        df = group.select(["window_id", "n_tokens", "checksum"]).to_pandas()
        g = df.groupby("window_id", sort=True).sum()
        return pa.table(
            {
                "window_id": pa.array(g.index.to_numpy(np.int64)),
                "n_tokens": pa.array(g["n_tokens"].to_numpy(np.int64)),
                "checksum": pa.array(g["checksum"].to_numpy(np.int64)),
            }
        )

    return (
        items.map_batches(shard_partials, batch_format="pyarrow", batch_size=1)
        .groupby("_b")
        .map_groups(merge, batch_format="pyarrow")
    )


def pack_windows(
    paths: list[str],
    window: int = DEFAULT_WINDOW,
    tokens_column: str = "tokens",
    length_column: str = "n_tok",
) -> rd.Dataset:
    """-> Dataset of (window, tokens list<int64>): the actual packed
    training windows. Shard tasks emit window PIECES (a window straddling
    a shard boundary yields one piece per shard — at most 2 pieces per
    window in practice); the groupby(window) concatenates pieces in
    stream order. Every window has exactly `window` tokens except the
    final one."""
    plan = plan_offsets(paths, length_column)

    def shard_pieces(batch: pa.Table) -> pa.Table:
        out = []
        for row in batch.to_pylist():
            t = pq.read_table(row["path"], columns=[tokens_column])
            flat = _flat_with_seps(t, tokens_column)
            if len(flat) != row["total"]:
                raise ValueError(
                    f"{row['path']}: token stream length {len(flat)} != planned "
                    f"{row['total']} — {length_column} disagrees with "
                    f"len({tokens_column}); window offsets would corrupt"
                )
            if len(flat) == 0:
                continue
            base = row["base"]
            starts, wins = _window_splits(base, len(flat), window)
            ends = np.append(starts[1:], len(flat))
            offs = np.concatenate(([0], np.cumsum(ends - starts)))
            # int64 offsets (LargeList): one shard can exceed 2^31 tokens
            # at production scale; int32 offsets would wrap silently
            pieces = pa.LargeListArray.from_arrays(
                pa.array(offs, type=pa.int64()), pa.array(flat, type=pa.int64())
            )
            out.append(
                pa.table(
                    {
                        "window_id": pa.array(wins),
                        "piece_pos": pa.array(((starts + base) % window).astype(np.int64)),
                        "piece": pieces,
                        "_b": pa.array((wins % _N_BUCKETS).astype(np.int32)),
                    }
                )
            )
        if not out:
            return pa.table(
                {
                    "window_id": pa.array([], pa.int64()),
                    "piece_pos": pa.array([], pa.int64()),
                    "piece": pa.array([], pa.list_(pa.int64())),
                    "_b": pa.array([], pa.int32()),
                }
            )
        return pa.concat_tables(out)

    items = rd.from_items(plan, override_num_blocks=max(len(plan), 1))

    def merge(group: pa.Table) -> pa.Table:
        df = group.select(["window_id", "piece_pos", "piece"]).to_pandas()
        df = df.sort_values(["window_id", "piece_pos"])
        wins, toks = [], []
        for w, sub in df.groupby("window_id", sort=True):
            wins.append(int(w))
            toks.append(np.concatenate([np.asarray(p) for p in sub["piece"]]))
        offs = np.zeros(len(toks) + 1, dtype=np.int64)
        np.cumsum([len(x) for x in toks], out=offs[1:])
        child = np.concatenate(toks) if toks else np.zeros(0, dtype=np.int64)
        return pa.table(
            {
                "window_id": pa.array(np.asarray(wins, dtype=np.int64)),
                "tokens": pa.LargeListArray.from_arrays(
                    pa.array(offs, type=pa.int64()), pa.array(child, type=pa.int64())
                ),
            }
        )

    return (
        items.map_batches(shard_pieces, batch_format="pyarrow", batch_size=1)
        .groupby("_b")
        .map_groups(merge, batch_format="pyarrow")
    )
