"""Staged resumable preparation recipe: end-to-end run, full-skip resume,
killed-partial rebuild, config-mismatch refusal, downstream invalidation
via the upstream config chain, and the zero-row loud failure."""

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from duckdb_raquet_ray.pipelines import prepare


def _docs_fixture(tmp_path) -> str:
    span = "the quick brown fox jumps over the lazy dog near river bank today"
    rows = []
    for i in range(40):
        if i % 10 == 0 and i > 0:
            text = f"doc {i} copies the shared span {span} and trails off uniquely {i}"
        else:
            text = f"document number {i} has its own words entirely " + " ".join(
                f"w{i}x{j}" for j in range(30)
            )
        rows.append((i, text, "web" if i % 2 == 0 else "code"))
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "source": pa.array([r[2] for r in rows]),
        }
    )
    p = str(tmp_path / "docs.parquet")
    pq.write_table(t, p)
    return p


def _bench_fixture(tmp_path) -> str:
    t = pa.table(
        {
            "doc_id": pa.array([999], pa.int64()),
            "text": pa.array(["document number 3 has its own words entirely"]),
        }
    )
    p = str(tmp_path / "bench.parquet")
    pq.write_table(t, p)
    return p


class TestPrepare:
    def test_end_to_end_and_resume(self, ray_session, tmp_path):
        docs = _docs_fixture(tmp_path)
        bench = _bench_fixture(tmp_path)
        wd = str(tmp_path / "wd")
        s = prepare.run_prepare(
            docs, wd, benchmark_glob=bench, despan_n=8, window=64, encode=True
        )
        names = list(s["stages"])
        assert names == [
            "dedup", "quality", "decontam", "despan", "tokenize", "pack", "encode",
        ]
        assert all(not v["skipped"] for v in s["stages"].values())
        # decontam drops the doc sharing the benchmark 5-gram
        assert s["stages"]["decontam"]["rows"] < s["stages"]["quality"]["rows"]
        assert s["stages"]["pack"]["rows"] >= 1
        # encoded dir is a real encode_job output
        assert os.path.exists(os.path.join(wd, "encode", "manifest.json"))

        s2 = prepare.run_prepare(
            docs, wd, benchmark_glob=bench, despan_n=8, window=64, encode=True
        )
        assert all(v["skipped"] for v in s2["stages"].values())
        assert {k: v["rows"] for k, v in s2["stages"].items()} == {
            k: v["rows"] for k, v in s["stages"].items()
        }

    def test_killed_partial_rebuilds_only_that_stage(self, ray_session, tmp_path):
        docs = _docs_fixture(tmp_path)
        wd = str(tmp_path / "wd")
        prepare.run_prepare(docs, wd, window=64)
        os.remove(os.path.join(wd, "pack", "_DONE.json"))
        s = prepare.run_prepare(docs, wd, window=64)
        skipped = {k: v["skipped"] for k, v in s["stages"].items()}
        assert skipped["pack"] is False
        assert all(v for k, v in skipped.items() if k != "pack")

    def test_config_mismatch_raises_and_force_invalidates_downstream(
        self, ray_session, tmp_path
    ):
        docs = _docs_fixture(tmp_path)
        wd = str(tmp_path / "wd")
        prepare.run_prepare(docs, wd, window=64)
        with pytest.raises(ValueError, match="_DONE.json config"):
            prepare.run_prepare(docs, wd, window=128)
        # force: pack rebuilds; a later encode run must NOT reuse a marker
        # built against the old pack config (upstream chain fingerprint)
        s = prepare.run_prepare(docs, wd, window=128, force=True)
        assert s["stages"]["pack"]["skipped"] is False
        # tokenize config unchanged -> still skipped
        assert s["stages"]["tokenize"]["skipped"] is True

    def test_input_regenerated_in_place_invalidates(self, ray_session, tmp_path):
        # same PATH, different CONTENT: the per-file (size, mtime_ns)
        # fingerprint in the dedup stage config must invalidate the marker
        # (path-only configs would silently reuse stale outputs)
        docs = _docs_fixture(tmp_path)
        wd = str(tmp_path / "wd")
        prepare.run_prepare(docs, wd, window=64)
        t = pq.read_table(docs)
        pq.write_table(t.slice(0, 20), docs)  # regenerate in place
        with pytest.raises(ValueError, match="_DONE.json config"):
            prepare.run_prepare(docs, wd, window=64)
        s = prepare.run_prepare(docs, wd, window=64, force=True)
        assert s["stages"]["dedup"]["skipped"] is False
        assert s["stages"]["dedup"]["rows"] <= 20

    def test_zero_row_stage_fails_loudly(self, ray_session, tmp_path):
        docs = _docs_fixture(tmp_path)
        wd = str(tmp_path / "wd0")
        # benchmark == corpus: decontaminate drops everything -> loud error
        with pytest.raises(ValueError, match="0 rows"):
            prepare.run_prepare(docs, wd, benchmark_glob=docs, window=64)

    def test_cli_surface(self, ray_session, tmp_path):
        from duckdb_raquet_ray import cli

        docs = _docs_fixture(tmp_path)
        wd = str(tmp_path / "wdcli")
        cli.main(["prepare", "--input", docs, "--workdir", wd, "--window", "64"])
        assert os.path.exists(os.path.join(wd, "pack", "_DONE.json"))
