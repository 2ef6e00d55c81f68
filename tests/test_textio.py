"""Landing-zone JSONL/CSV sources (sources/textio.py): deterministic
fixtures, read-path equality across formats, and the ingest bridge into
the canonical parquet shards the rest of the engine consumes."""

import os

import pyarrow.parquet as pq

from duckdb_raquet_ray.sources import textio


def test_jsonl_and_csv_read_identically(ray_session, tmp_path):
    jd, cd = str(tmp_path / "j"), str(tmp_path / "c")
    jp = textio.write_jsonl_corpus(jd, 300, 3, seed=7)
    cp = textio.write_csv_corpus(cd, 300, 3, seed=7)
    a = (
        textio.read_jsonl(jp, columns=["doc_id", "text", "source"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        textio.read_csv(cp, columns=["doc_id", "text", "source"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    assert len(a) == 300


def test_write_corpus_idempotent(tmp_path):
    d = str(tmp_path / "j")
    p1 = textio.write_jsonl_corpus(d, 50, 2)
    sig = [(p, os.path.getmtime(p)) for p in p1]
    p2 = textio.write_jsonl_corpus(d, 50, 2)
    assert p1 == p2
    assert [(p, os.path.getmtime(p)) for p in p2] == sig  # untouched


def test_source_stats_matches_pandas(ray_session, tmp_path):
    jp = textio.write_jsonl_corpus(str(tmp_path / "j"), 200, 2, seed=9)
    got = (
        textio.source_stats(textio.read_jsonl(jp))
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    df = textio.read_jsonl(jp).to_pandas()
    want = (
        df.assign(L=df["text"].str.len())
        .groupby("source")
        .agg(n_docs=("L", "size"), text_chars=("L", "sum"))
        .reset_index()
        .sort_values("source")
        .reset_index(drop=True)
    )
    assert got["source"].tolist() == want["source"].tolist()
    assert got["n_docs"].tolist() == want["n_docs"].tolist()
    assert got["text_chars"].tolist() == want["text_chars"].tolist()


def test_ingest_bridge_feeds_dedup(ray_session, tmp_path):
    """Foreign landing files -> canonical parquet shards -> an engine
    pipeline (exact dedup) — the full ingest path."""
    from duckdb_raquet_ray.pipelines import dedup

    jp = textio.write_jsonl_corpus(str(tmp_path / "j"), 120, 2, seed=5)
    shards = textio.to_parquet_shards(
        textio.read_jsonl(jp), str(tmp_path / "pq")
    )
    assert shards and all(p.endswith(".parquet") for p in shards)
    total = sum(pq.read_metadata(p).num_rows for p in shards)
    assert total == 120
    import ray.data as rd

    ds = rd.read_parquet(shards, columns=["doc_id", "text"])
    kept = dedup.exact_dedup(ds).count()
    assert 0 < kept <= 120


def test_write_jsonl_roundtrip(ray_session, tmp_path):
    """Export sink -> own reader round trip preserves every row and value
    (quoting, escapes, unicode)."""
    import pyarrow as pa
    import ray.data as rd

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "source": ["a", "b", "a"],
            "text": ['line "quoted"\nnewline', "unicode: café ☃", ""],
        }
    )
    paths = textio.write_jsonl(rd.from_arrow(t), str(tmp_path / "sink"))
    assert paths
    back = (
        textio.read_jsonl(paths, columns=["doc_id", "source", "text"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert back.equals(want)


def test_write_csv_roundtrip(ray_session, tmp_path):
    """CSV sink -> own reader round trip preserves quoting-sensitive
    values (commas, quotes, embedded newlines)."""
    import pyarrow as pa
    import ray.data as rd

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "source": ["a", "b", "a"],
            "text": ['comma, and "quote"', "new\nline", "plain"],
        }
    )
    paths = textio.write_csv(rd.from_arrow(t), str(tmp_path / "csink"))
    assert paths
    back = (
        textio.read_csv(paths, columns=["doc_id", "source", "text"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert back.equals(want)


def test_write_ipc_roundtrip(ray_session, tmp_path):
    """Arrow IPC sink -> own reader round trip is byte-lossless (incl.
    unicode, embedded newlines, nulls, list columns) and the reader's
    column projection prunes correctly."""
    import pyarrow as pa
    import ray.data as rd

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "source": ["a", "b", None, "a"],
            "text": ['quote " comma,', "uni: café ☃", None, "x\ny"],
            "tokens": pa.array(
                [[1, 2], [], None, [7]], pa.list_(pa.int32())
            ),
        }
    )
    paths = textio.write_ipc(rd.from_arrow(t), str(tmp_path / "ipc"))
    assert paths and all(p.endswith(".arrow") for p in paths)
    # compare as Arrow rows: Ray's to_pandas would tensor-cast the ragged
    # list column, which is exactly what the IPC path must NOT mangle
    back = sorted(
        textio.read_ipc(paths).take_all(), key=lambda r: r["doc_id"]
    )
    want = sorted(t.to_pylist(), key=lambda r: r["doc_id"])
    for b, w in zip(back, want, strict=True):
        got_tokens = None if b["tokens"] is None else list(b["tokens"])
        assert (b["doc_id"], b["source"], b["text"], got_tokens) == (
            w["doc_id"], w["source"], w["text"], w["tokens"],
        )
    pruned = textio.read_ipc(paths, columns=["doc_id", "text"]).to_pandas()
    assert sorted(pruned.columns) == ["doc_id", "text"]
    # idempotent sink: content-addressed names -> same files on re-write
    again = textio.write_ipc(rd.from_arrow(t), str(tmp_path / "ipc"))
    assert again == paths


def test_sliced_block_shards_do_not_collide(ray_session, tmp_path):
    """Regression: a single input block larger than rows_per_file is
    handed to the write tasks as ZERO-COPY SLICES of one parent block;
    those slices share the parent's raw Arrow buffers, so the old
    buffer-hash naming gave every slice the SAME content-addressed shard
    name and the later rename silently overwrote the earlier shard. The
    serialized-bytes hash must keep each slice a distinct shard and
    preserve every row."""
    import pyarrow as pa
    import ray.data as rd

    n = 10_000
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array([f"row {i}" for i in range(n)]),
        }
    )
    for writer, reader, sub in (
        (textio.write_ipc, textio.read_ipc, "ipc"),
        (textio.write_orc, textio.read_orc, "orc"),
    ):
        paths = writer(
            rd.from_arrow(t), str(tmp_path / sub), rows_per_file=4_096
        )
        assert len(paths) == len(set(paths)) >= 2, sub
        back = reader(paths).to_pandas()
        assert len(back) == n, sub
        assert sorted(back["doc_id"]) == list(range(n)), sub


def test_jsonl_gz_reads_identical_to_plain(ray_session, tmp_path):
    jd, gd = str(tmp_path / "j"), str(tmp_path / "g")
    jp = textio.write_jsonl_corpus(jd, 200, 2, seed=3)
    gp = textio.write_jsonl_gz_corpus(gd, 200, 2, seed=3)
    assert all(p.endswith(".jsonl.gz") for p in gp)
    a = (
        textio.read_jsonl(jp, columns=["doc_id", "text", "source"])
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        textio.read_jsonl(gp, columns=["doc_id", "text", "source"])
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a.equals(b)
    assert len(b) == 200


def test_jsonl_gz_deterministic_bytes(tmp_path):
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    p1 = textio.write_jsonl_gz_corpus(d1, 40, 2, seed=9)
    p2 = textio.write_jsonl_gz_corpus(d2, 40, 2, seed=9)
    for a, b in zip(p1, p2):
        assert open(a, "rb").read() == open(b, "rb").read()


def test_jsonl_mixed_gz_and_plain_rejected(tmp_path):
    import pytest

    jp = textio.write_jsonl_corpus(str(tmp_path / "j"), 10, 1)
    gp = textio.write_jsonl_gz_corpus(str(tmp_path / "g"), 10, 1)
    with pytest.raises(ValueError):
        textio.read_jsonl(jp + gp)


def test_csv_gz_reads_identical_to_plain(ray_session, tmp_path):
    cd, gd = str(tmp_path / "c"), str(tmp_path / "g")
    cp = textio.write_csv_corpus(cd, 200, 2, seed=3)
    gp = textio.write_csv_gz_corpus(gd, 200, 2, seed=3)
    a = (
        textio.read_csv(cp, columns=["doc_id", "text", "source"])
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        textio.read_csv(gp, columns=["doc_id", "text", "source"])
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a.equals(b)
    assert len(b) == 200


def test_jsonl_gz_sink_roundtrip(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type="int64"),
            "text": pa.array(['quote " and \\ slash', "unicode é€", None]),
        }
    )
    out = str(tmp_path / "gz")
    paths = textio.write_jsonl_gz(rd.from_arrow(t), out)
    assert paths and all(p.endswith(".jsonl.gz") for p in paths)
    back = (
        textio.read_jsonl(paths)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert back["text"].tolist()[:2] == t.column("text").to_pylist()[:2]
    assert len(back) == 3


class TestWebDatasetSink:
    """WebDataset tar sink/source: lossless roundtrip (text + binary
    payload), deterministic shard bytes, idempotent re-runs, consecutive
    same-key grouping."""

    def _docs(self):
        import pyarrow as pa

        return pa.table(
            {
                "doc_id": pa.array([10, 11, 12], pa.int64()),
                "source": pa.array(["web", "code", None]),
                "text": pa.array(["hello world", "", None]),
            }
        )

    def test_roundtrip_text(self, ray_session, tmp_path):
        import ray.data as rd

        from duckdb_raquet_ray.sources import textio

        paths = textio.write_wds(rd.from_arrow(self._docs()), str(tmp_path / "w"))
        assert paths and all(p.endswith(".tar") for p in paths)
        back = {
            r["doc_id"]: (r.get("source"), r["text"])
            for r in textio.read_wds(paths).take_all()
        }
        # text nulls come back as '' (the sink writes empty members);
        # metadata nulls survive via json
        assert back["10"] == ("web", "hello world")
        assert back["11"] == ("code", "")
        assert back["12"] == (None, "")

    def test_binary_payload_roundtrip(self, ray_session, tmp_path):
        import pyarrow as pa
        import ray.data as rd

        from duckdb_raquet_ray.sources import textio

        t = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "source": pa.array(["a", "b"]),
                "text": pa.array(["x", "y"]),
                "payload": pa.array([b"\x89PNG\x00\x01", b""], pa.binary()),
            }
        )
        paths = textio.write_wds(
            rd.from_arrow(t), str(tmp_path / "b"), payload_col="payload"
        )
        back = {
            r["doc_id"]: r["payload"] for r in textio.read_wds(paths).take_all()
        }
        assert back["1"] == b"\x89PNG\x00\x01" and back["2"] == b""

    def test_deterministic_and_idempotent(self, ray_session, tmp_path):
        import os

        import ray.data as rd

        from duckdb_raquet_ray.sources import textio

        d1, d2 = str(tmp_path / "r1"), str(tmp_path / "r2")
        p1 = textio.write_wds(rd.from_arrow(self._docs()), d1)
        p2 = textio.write_wds(rd.from_arrow(self._docs()), d2)
        assert [os.path.basename(p) for p in p1] == [os.path.basename(p) for p in p2]
        assert open(p1[0], "rb").read() == open(p2[0], "rb").read()
        # re-run into the same dir: same content-addressed names, no dupes
        p3 = textio.write_wds(rd.from_arrow(self._docs()), d1)
        assert p3 == p1 and sorted(os.listdir(d1)) == [os.path.basename(p) for p in p1]


class TestWdsKeyGuards:
    def test_null_and_duplicate_keys_raise(self, ray_session, tmp_path):
        import pyarrow as pa
        import pytest as _pytest
        import ray.data as rd

        from duckdb_raquet_ray.sources import textio

        dup = pa.table(
            {
                "doc_id": pa.array([1, 1], pa.int64()),
                "source": pa.array(["a", "b"]),
                "text": pa.array(["x", "y"]),
            }
        )
        with _pytest.raises(Exception, match="duplicate"):
            textio.write_wds(rd.from_arrow(dup), str(tmp_path / "d"))
        nul = pa.table(
            {
                "doc_id": pa.array([None], pa.int64()),
                "source": pa.array(["a"]),
                "text": pa.array(["x"]),
            }
        )
        with _pytest.raises(Exception, match="null"):
            textio.write_wds(rd.from_arrow(nul), str(tmp_path / "n"))


class TestOrcSink:
    def test_roundtrip_and_projection(self, ray_session, tmp_path):
        import pyarrow as pa
        import ray.data as rd

        from duckdb_raquet_ray.sources import textio

        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "source": pa.array(["a", None, "b"]),
                "text": pa.array(["hello", "", None]),
                "n": pa.array([7, 8, 9], pa.int64()),
            }
        )
        paths = textio.write_orc(rd.from_arrow(t), str(tmp_path / "o"))
        assert paths and all(p.endswith(".orc") for p in paths)
        back = textio.read_orc(paths).to_pandas().sort_values("doc_id")
        assert back["doc_id"].tolist() == [1, 2, 3]
        assert back["n"].tolist() == [7, 8, 9]
        assert back["text"].tolist()[0] == "hello"
        # projection: only requested columns come back
        proj = textio.read_orc(paths, columns=["doc_id"]).to_pandas()
        assert list(proj.columns) == ["doc_id"]

    def test_idempotent_rerun(self, ray_session, tmp_path):
        import os

        import pyarrow as pa
        import ray.data as rd

        from duckdb_raquet_ray.sources import textio

        t = pa.table({"doc_id": pa.array([1], pa.int64()), "text": ["x"]})
        d = str(tmp_path / "o2")
        p1 = textio.write_orc(rd.from_arrow(t), d)
        p2 = textio.write_orc(rd.from_arrow(t), d)
        assert p1 == p2 and len(os.listdir(d)) == 1


class TestRegexExtract:
    def test_extract_and_oracle_parity(self, ray_session):
        import duckdb
        import pyarrow as pa
        import ray.data as rd

        from duckdb_raquet_ray.pipelines import text as tx

        t = pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4], pa.int64()),
                "props": pa.array(
                    ['{"k": 87, "u": "ann"}', "no match", None, '{"k": 0}']
                ),
            }
        )
        pat = r'"k":\s*(?P<kval>\d+)'
        out = (
            tx.regex_extract(rd.from_arrow(t), pat, text_col="props",
                             keep_cols=("event_id",))
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        )
        assert out["kval"].tolist() == ["87", None, None, "0"]
        con = duckdb.connect()
        con.register("events", t)
        ora = (
            con.execute(tx.regex_extract_oracle_sql(
                "events", pat, text_col="props", select_cols="event_id"))
            .df().sort_values("event_id").reset_index(drop=True)
        )
        assert out["kval"].tolist() == ora["kval"].tolist()

    def test_unnamed_groups_rejected(self, ray_session):
        import pytest as _pytest
        import ray.data as rd
        import pyarrow as pa

        from duckdb_raquet_ray.pipelines import text as tx

        t = pa.table({"text": pa.array(["x"])})
        with _pytest.raises(ValueError, match="named"):
            tx.regex_extract(rd.from_arrow(t), r"(\d+)")
