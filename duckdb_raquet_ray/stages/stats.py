"""Distributed grouped statistics: partial Welford per batch + pairwise
combine — the ST_RegionStats execution shape
(/root/reference/src/st_region_stats.cpp:330-807): per-input update into a
thread-local state (:531-541), parallel combine with the numerically-stable
pairwise formula (:382-411), finalize (:413-448). Here: `map_batches`
emits one partial row per (key, batch) — a pre-aggregation that shrinks the
shuffle from O(rows) to O(keys x batches) — then a small
`groupby(key).map_groups` merges partials and finalizes.

stddev is the sample standard deviation (m2/(n-1)) like compute_band_stats
(band_decoder.cpp:226-297), matching DuckDB's STDDEV_SAMP.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def welford_partials(batch: pa.Table, key: str, value: str) -> pa.Table:
    """One partial state row per key in this batch (vectorized).

    Keys are grouped over ALL rows (dropna=False: the NULL key forms a
    group, and a key whose values are all NULL still appears with n=0 —
    SQL GROUP BY / COUNT(v) semantics); pandas reductions skip NaN
    values, which is exactly the SQL aggregate null rule."""
    df = pd.DataFrame(
        {
            "k": batch.column(key).to_pandas(),
            "v": batch.column(value).to_numpy(zero_copy_only=False).astype(np.float64),
        }
    )
    g = df.groupby("k", dropna=False)["v"]
    n = g.count()  # non-null count, one scan reused below
    out = pd.DataFrame(
        {
            key: n.index,
            "n": n.to_numpy(),
            "sum": g.sum().to_numpy(),
            "mean": g.mean().to_numpy(),
            "m2": (g.var(ddof=0) * n).fillna(0.0).to_numpy(),
            "min": g.min().to_numpy(),
            "max": g.max().to_numpy(),
        }
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def _combine_and_finalize(group: pa.Table, key: str) -> pa.Table:
    """Pairwise Welford merge of partial states (st_region_stats.cpp:382-411).

    Arrow in, Arrow out with an explicit uniform schema: pandas-out
    map_groups hits a per-group block-building slow path (measured 25x on
    the dedup pipeline — see pipelines/dedup.py)."""
    ns = group.column("n").to_numpy(zero_copy_only=False)
    means = group.column("mean").to_numpy(zero_copy_only=False)
    m2s = group.column("m2").to_numpy(zero_copy_only=False)
    n_t, mean_t, m2_t = 0.0, 0.0, 0.0
    for n, mean, m2 in zip(ns, means, m2s):
        if n == 0:
            continue
        delta = mean - mean_t
        tot = n_t + n
        m2_t = m2_t + m2 + delta * delta * n_t * n / tot
        mean_t = mean_t + delta * n / tot
        n_t = tot
    # NaN encodes SQL NULL for the double columns (DuckDB's to-pandas
    # convention): STDDEV_SAMP is NULL for n<2, SUM/MEAN/MIN/MAX are NULL
    # for an all-null group
    std = float(np.sqrt(m2_t / (n_t - 1))) if n_t > 1 else float("nan")
    empty = n_t == 0
    nan = float("nan")
    mins = group.column("min").to_numpy(zero_copy_only=False)
    maxs = group.column("max").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            key: group.column(key).slice(0, 1),
            "cnt": pa.array([int(n_t)], type=pa.int64()),
            "sum_v": pa.array(
                [nan if empty else float(np.nansum(group.column("sum").to_numpy(zero_copy_only=False)))],
                type=pa.float64(),
            ),
            "mean_v": pa.array([nan if empty else mean_t], type=pa.float64()),
            "min_v": pa.array([float(np.nanmin(mins)) if not np.isnan(mins).all() else nan], type=pa.float64()),
            "max_v": pa.array([float(np.nanmax(maxs)) if not np.isnan(maxs).all() else nan], type=pa.float64()),
            "std_v": pa.array([std], type=pa.float64()),
        }
    )


def grouped_stats(ds: rd.Dataset, key: str, value: str) -> rd.Dataset:
    """Per-key {cnt, sum_v, mean_v, min_v, max_v, std_v} — partial+final."""
    partials = ds.map_batches(
        lambda b: welford_partials(b, key, value),
        batch_format="pyarrow",
        batch_size=65536,
    )
    return partials.groupby(key).map_groups(
        lambda g: _combine_and_finalize(g, key), batch_format="pyarrow"
    )
