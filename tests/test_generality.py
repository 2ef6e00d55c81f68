"""The encode job is schema-general: any Parquet table (timestamps,
doubles, strings, float lists) round-trips bit-identically, not just the
input_hint token table — the reference reads arbitrary GDAL rasters
(/root/reference/src/read_raster.cpp:787-811 detects dtype/bands at bind
time); we detect per-column types at plan time (planner.plan_array)."""

import shutil

import pytest

from duckdb_raquet_ray.pipelines import decode, encode


@pytest.mark.parametrize("table", ["events", "lineitem", "embeddings"])
def test_arbitrary_table_roundtrip(ray_session, tmp_path, table):
    src = [f"/root/testdata/sf0.001/{table}.parquet"]
    out = str(tmp_path / f"enc_{table}")
    shutil.rmtree(out, ignore_errors=True)
    meta = encode.encode_job(src, out, target_part_bytes=1 << 19)
    res = decode.verify_job(src, out, target_part_bytes=1 << 19)
    assert res["ok"], res
    assert meta["encoded_bytes"] < meta["input_bytes"]


def test_verify_encoded_from_manifest(ray_session, tmp_path):
    """verify_encoded reconstructs the exact encoded partitioning from the
    manifest — works even when encode used auto sizing the verifier does
    not know."""
    from duckdb_raquet_ray.sources import tokens as tok

    paths = tok.write_corpus(str(tmp_path / "c"), 2000, 2, row_group_rows=512)
    out = str(tmp_path / "e")
    encode.encode_job(paths, out, target_part_bytes=1 << 19)
    res = decode.verify_encoded(out)
    assert res["ok"] and res["rows"] == 2000
    items = decode.items_from_manifest(out)
    assert all(it["row_groups"] for it in items)
