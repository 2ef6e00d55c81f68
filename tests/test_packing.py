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


def test_pack_windows_window_spans_many_shards(ray_session, tmp_path):
    """Shards much smaller than the window: every window straddles several
    shards, so the whole output flows through the boundary-stitch path."""
    rng = np.random.default_rng(11)
    paths, all_tokens = _write_shards(str(tmp_path), rng, n_shards=6, rows_per=3)
    window = 997
    out = packing.pack_windows(paths, window=window).to_pandas().sort_values("window_id")
    want = _brute_pack(all_tokens, window)
    assert out["window_id"].tolist() == list(range(len(want)))
    for w, toks in zip(out["window_id"], out["tokens"]):
        assert np.array_equal(np.asarray(toks, dtype=np.int64), want[w])


def test_pack_windows_aligned_shards_emit_locally(ray_session, tmp_path):
    """Shard totals that are exact window multiples: zero boundary pieces —
    every window is complete inside one shard and must never shuffle."""
    window = 16
    paths, all_tokens = [], []
    for s in range(3):
        toks = [list(range(s * 100, s * 100 + window - 1)) for _ in range(4)]
        all_tokens.extend(toks)
        t = pa.table(
            {
                "tokens": pa.array(toks, type=pa.list_(pa.int64())),
                "n_tok": pa.array([len(x) for x in toks], type=pa.int32()),
            }
        )
        p = os.path.join(str(tmp_path), f"al-{s}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    out = packing.pack_windows(paths, window=window).to_pandas().sort_values("window_id")
    want = _brute_pack(all_tokens, window)
    assert out["window_id"].tolist() == list(range(len(want)))
    for w, toks in zip(out["window_id"], out["tokens"]):
        assert np.array_equal(np.asarray(toks, dtype=np.int64), want[w])


def test_complete_span_ownership_is_exact():
    """Pure-arithmetic check of the ownership rule across random layouts:
    complete spans partition the stream with the boundary ranges."""
    rng = np.random.default_rng(7)
    for _ in range(200):
        window = int(rng.integers(2, 50))
        n_shards = int(rng.integers(1, 8))
        totals = rng.integers(0, 120, size=n_shards)
        bases = np.concatenate(([0], np.cumsum(totals[:-1])))
        corpus = int(totals.sum())
        owned = []
        for b, n in zip(bases, totals):
            s, e = packing._complete_span(int(b), int(n), window, corpus)
            if e > s:
                assert (b + s) % window == 0
                owned.extend(range((int(b) + s) // window, -(-(int(b) + e) // window)))
        # every owned window appears exactly once
        assert len(owned) == len(set(owned))
        # owned windows' spans are fully inside their shard by construction;
        # the rest are stitched — together they must cover all windows
        n_windows = -(-corpus // window) if corpus else 0
        assert set(owned) <= set(range(n_windows))


def test_pack_windows_streams_shards_larger_than_chunk(ray_session, tmp_path):
    # shard >> read chunk: the streaming reader (carry buffer + running
    # offset) must reproduce brute-force packing exactly — multiple row
    # groups, chunk budget of 16 rows, windows spanning chunk edges
    rng = np.random.default_rng(11)
    paths, all_tokens = _write_shards(str(tmp_path), rng, n_shards=2, rows_per=120)
    window = 257
    got = {
        r["window_id"]: list(r["tokens"])
        for r in packing.pack_windows(
            paths, window=window, read_rows=16, stream_token_budget=0
        ).take_all()
    }
    want = {i: list(w) for i, w in enumerate(_brute_pack(all_tokens, window))}
    assert got == want


def test_pack_windows_emits_int32_token_plane(ray_session, tmp_path):
    """The packed output's token plane must be int32 (vocab-id domain):
    an int64 plane would double the corpus-sized output's object-store
    and sink traffic. Both the shard-local fast path and the boundary
    stitch path must agree on the schema or the union breaks."""
    rng = np.random.default_rng(7)
    paths, _ = _write_shards(str(tmp_path), rng, n_shards=4, rows_per=10)
    ds = packing.pack_windows(paths, window=64)
    assert ds.schema().base_schema.field("tokens").type == pa.large_list(pa.int32())


@pytest.mark.usefixtures("ray_session")
class TestWindowDocSpans:
    def _shards(self, tmp_path, lens_per_shard):
        import pyarrow as pa
        import pyarrow.parquet as pq

        paths = []
        did = 0
        for si, lens in enumerate(lens_per_shard):
            rows = {
                "doc_id": [f"doc-{did + i:06d}" for i in range(len(lens))],
                "tokens": [list(range(n)) for n in lens],
                "n_tok": lens,
            }
            did += len(lens)
            p = str(tmp_path / f"s{si}.parquet")
            pq.write_table(pa.table(rows), p)
            paths.append(p)
        return paths

    def _brute(self, all_lens, W):
        spans = {}
        pos = 0
        for n in all_lens:
            blk = n + 1
            s, e = pos, pos + blk
            w = s // W
            while w * W < e:
                lo, hi = max(s, w * W), min(e, (w + 1) * W)
                spans.setdefault(w, []).append(hi - lo)
                w += 1
            pos = e
        return spans

    def test_matches_brute_force(self, tmp_path):
        from duckdb_raquet_ray.pipelines import packing

        lens = [[5, 3, 9], [20, 1], [2, 2, 2, 2]]
        paths = self._shards(tmp_path, lens)
        W = 8
        out = (
            packing.window_doc_spans(paths, window=W)
            .to_pandas().sort_values("window_id").reset_index(drop=True)
        )
        want = self._brute([n for shard in lens for n in shard], W)
        assert len(out) == len(want)
        for _, r in out.iterrows():
            segs = list(r["seg_lens"])
            assert segs == want[int(r["window_id"])]
            assert int(r["n_segs"]) == len(segs)
            assert int(r["spans_checksum"]) == sum(
                s * (i + 1) for i, s in enumerate(segs)
            )

    def test_spans_sum_to_window(self, tmp_path):
        from duckdb_raquet_ray.pipelines import packing

        paths = self._shards(tmp_path, [[7, 7, 7, 7, 7, 7]])
        W = 16
        out = packing.window_doc_spans(paths, window=W).to_pandas()
        total = (6 * 8)
        full = out[out["window_id"] < total // W]
        assert all(sum(r) == W for r in full["seg_lens"])

    def test_doc_longer_than_window(self, tmp_path):
        from duckdb_raquet_ray.pipelines import packing

        paths = self._shards(tmp_path, [[50]])
        out = (
            packing.window_doc_spans(paths, window=8)
            .to_pandas().sort_values("window_id")
        )
        # one 51-token block -> six full windows of one segment + a tail
        assert out["n_segs"].tolist() == [1] * 7
        assert [s[0] for s in out["seg_lens"]] == [8, 8, 8, 8, 8, 8, 3]
