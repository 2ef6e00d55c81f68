"""Sequence packing (pipelines/packing.py): two-pass prefix-sum windows
must equal brute-force concat-and-chop regardless of shard boundaries."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from duckdb_raquet_ray.pipelines import packing


def _write_shards(tmpdir, rng, n_shards=3, rows_per=40):
    paths = []
    all_tokens = []
    for s in range(n_shards):
        toks = [
            rng.integers(0, 1000, size=rng.integers(1, 60)).astype(np.int64).tolist()
            for _ in range(rows_per)
        ]
        all_tokens.extend(toks)
        t = pa.table(
            {
                "tokens": pa.array(toks, type=pa.list_(pa.int64())),
                "n_tok": pa.array([len(x) for x in toks], type=pa.int32()),
            }
        )
        p = os.path.join(tmpdir, f"shard-{s}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    return paths, all_tokens


def _brute_pack(all_tokens, window):
    stream = []
    for toks in all_tokens:
        stream.extend(toks)
        stream.append(packing.SEP_TOKEN)
    stream = np.asarray(stream, dtype=np.int64)
    return [stream[i : i + window] for i in range(0, len(stream), window)]


@pytest.mark.parametrize("window", [7, 64, 513])
def test_window_stats_match_bruteforce(ray_session, tmp_path, window):
    rng = np.random.default_rng(3)
    paths, all_tokens = _write_shards(str(tmp_path), rng)
    got = (
        packing.packed_window_stats(paths, window=window)
        .to_pandas()
        .sort_values("window_id")
        .reset_index(drop=True)
    )
    want = _brute_pack(all_tokens, window)
    assert got["window_id"].tolist() == list(range(len(want)))
    assert got["n_tokens"].tolist() == [len(w) for w in want]
    assert got["checksum"].tolist() == [
        int((w * (np.arange(len(w)) + 1)).sum()) for w in want
    ]


def test_pack_windows_reassembles_stream(ray_session, tmp_path):
    rng = np.random.default_rng(5)
    paths, all_tokens = _write_shards(str(tmp_path), rng, n_shards=4, rows_per=25)
    window = 97  # deliberately misaligned with shard boundaries
    out = packing.pack_windows(paths, window=window).to_pandas().sort_values("window_id")
    want = _brute_pack(all_tokens, window)
    assert out["window_id"].tolist() == list(range(len(want)))
    for w, toks in zip(out["window_id"], out["tokens"]):
        assert np.array_equal(np.asarray(toks, dtype=np.int64), want[w])
    # every window full except the last
    lens = [len(t) for t in out["tokens"]]
    assert all(n == window for n in lens[:-1]) and 0 < lens[-1] <= window


def test_plan_offsets_exclusive_scan(tmp_path):
    rng = np.random.default_rng(1)
    paths, all_tokens = _write_shards(str(tmp_path), rng, n_shards=2, rows_per=5)
    plan = packing.plan_offsets(paths)
    per_doc = [len(t) + 1 for t in all_tokens]
    assert plan[0]["base"] == 0
    assert plan[1]["base"] == sum(per_doc[:5])
    assert plan[1]["total"] == sum(per_doc[5:])


def test_stale_length_column_fails_loudly(ray_session, tmp_path):
    """n_tok drives the pass-1 offsets; if it disagrees with len(tokens)
    the window math would silently corrupt — the shard task must raise."""
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "tokens": pa.array([[1, 2, 3], [4, 5]], type=pa.list_(pa.int64())),
            "n_tok": pa.array([3, 99], type=pa.int32()),  # stale second row
        }
    )
    p = os.path.join(str(tmp_path), "bad.parquet")
    pq.write_table(t, p)
    with pytest.raises(Exception, match="disagrees|corrupt|token stream"):
        packing.packed_window_stats([p], window=8).to_pandas()
