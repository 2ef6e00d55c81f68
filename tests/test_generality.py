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


def test_verify_encoded_grouped_multiset(ray_session, tmp_path):
    """Grouped-mode partitions have no row ranges; verify_encoded falls
    back to the order-insensitive multiset fingerprint gate — and that
    gate catches a single flipped token."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from duckdb_raquet_ray.pipelines import encode_grouped
    from duckdb_raquet_ray.sources import tokens as tok
    from duckdb_raquet_ray.stages import encoder as enc

    paths = tok.write_corpus(str(tmp_path / "c"), 2000, 2, row_group_rows=512)
    out = str(tmp_path / "g")
    encode_grouped.encode_job_grouped(paths, out, target_group_rows=500)
    res = decode.verify_encoded(out)
    assert res["ok"] and res["mode"] == "multiset" and res["rows"] == 2000

    # tamper: flip one token in one partition, re-encode in place
    import glob

    p = sorted(glob.glob(out + "/part-*.parquet"))[0]
    t = pq.read_table(p)
    rows = enc.decode_rows(t)
    toks = rows.column("tokens").to_pylist()
    toks[0] = list(toks[0])
    toks[0][0] = (toks[0][0] + 1) % 50257
    tampered = rows.set_column(
        rows.schema.get_field_index("tokens"), "tokens", pa.array(toks, type=pa.list_(pa.int32()))
    )
    pid = t.column("partition_id")[0].as_py()
    enc2, _ = enc.encode_table(tampered, pid, "tamper")
    pq.write_table(enc2, p, compression="none")
    assert not decode.verify_encoded(out)["ok"]


def test_nullable_everything_roundtrip(ray_session, tmp_path):
    """End-to-end encode job over a table with nulls in every column kind
    (incl. null list elements, empty lists, null rows) — bit identity."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "s": pa.array(["a", None, "", "dup", "dup", None] * 50),
            "i": pa.array([1, None, -5, 2**40, None, 0] * 50, type=pa.int64()),
            "f": pa.array([1.5, None, float("nan"), float("-inf"), -0.0, None] * 50),
            "ts": pa.array([0, None, 10**15, None, 42, 7] * 50, type=pa.timestamp("us")),
            "l": pa.array(
                [[1, None, 3], None, [], [2**30], [None], [0, 0]] * 50,
                type=pa.list_(pa.int32()),
            ),
            "b": pa.array([b"x", None, b"", b"yy", None, b"z"] * 50, type=pa.binary()),
        }
    )
    src = str(tmp_path / "nullable.parquet")
    pq.write_table(t, src, row_group_size=75)
    out = str(tmp_path / "enc")
    encode.encode_job([src], out, target_part_bytes=1 << 16)
    res = decode.verify_encoded(out)
    assert res["ok"] and res["rows"] == 300


def test_zone_map_range_read(ray_session, tmp_path):
    """Manifest zone-map pruning: only partitions whose [min,max] overlap
    the range are opened; the residual filter handles stragglers."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from duckdb_raquet_ray.state import manifest as mf

    # three value bands -> three partitions with disjoint n_tok ranges
    rows = []
    for band, (lo, hi) in enumerate([(1, 10), (100, 110), (1000, 1010)]):
        for i in range(100):
            v = lo + (i % (hi - lo))
            rows.append({"doc_id": f"d{band}-{i}", "tokens": [v], "n_tok": v, "source": "web"})
    t = pa.Table.from_pylist(rows).cast(
        pa.schema(
            [
                ("doc_id", pa.string()),
                ("tokens", pa.list_(pa.int64())),
                ("n_tok", pa.int64()),
                ("source", pa.string()),
            ]
        )
    )
    src = str(tmp_path / "bands.parquet")
    pq.write_table(t, src, row_group_size=100)
    out = str(tmp_path / "enc")
    encode.encode_job([src], out, target_part_bytes=1)  # one partition per row group
    assert len(mf.load_metadata(out)["partition_ids"]) == 3
    # range [100, 110] must open exactly the middle partition
    pruned = mf.prune_partitions(out, "n_tok", 100, 110)
    assert len(pruned) == 1
    got = decode.read_encoded_range(out, "n_tok", 100, 110).to_pandas()
    assert len(got) == 100 and got["n_tok"].between(100, 110).all()
    # open range: everything >= 1000
    got = decode.read_encoded_range(out, "n_tok", lo=1000).to_pandas()
    assert len(got) == 100 and (got["n_tok"] >= 1000).all()
