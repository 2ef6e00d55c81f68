"""Decode/read side: encoded partition dir -> Dataset of original rows.

The read_raquet family re-expressed (SURVEY.md §2.1):

  read_encoded(dir)                     ~ read_raquet(file)
                                          (/root/reference/src/raquet_extension.cpp:36-45)
  read_encoded(dir, partition_ids=...)  ~ spatial-filtered read: driver
                                          computes the wanted id set, only
                                          those part files are opened
                                          (raquet_extension.cpp:49-81 ->
                                          partition pruning at the file level)
  read_encoded(dir, columns=[...])      ~ band projection: blobs are one
                                          binary column per source column,
                                          so Parquet column pruning skips
                                          un-requested blobs entirely
  point_lookup(dir, pid)                ~ read_raquet_at point query
                                          (raquet_extension.cpp:215-263):
                                          one file, one row group, ~one blob
  verify_job(...)                       ~ the round-trip invariant gate
                                          (st_value_mask.cpp:100-114 decode->
                                          encode->decode closure), run as an
                                          embarrassingly parallel comparison

The metadata broadcast pattern: manifest.json is loaded ONCE on the driver
and closed over into the decode stage (fn_constructor_kwargs) — the
broadcast-small-side join of the reference's metadata row
(raquet_extension.cpp:40-44), never a shuffle.
"""

from __future__ import annotations

import functools
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from ..functions import partition_keys as pk
from ..stages import encoder as enc
from ..state import manifest as mf
from .encode import plan_partitions


def encoded_part_files(out_dir: str, partition_ids: list[int] | None = None) -> list[str]:
    """Resolve partition files from the manifest (falling back to listdir),
    sorted by partition id — ordered by key by construction."""
    try:
        meta = mf.load_metadata(out_dir)
        pids = meta["partition_ids"]
    except FileNotFoundError:
        pids = sorted(mf.done_partition_ids(out_dir))
    if partition_ids is not None:
        wanted = set(partition_ids)
        pids = [p for p in pids if p in wanted]
    return [os.path.join(out_dir, pk.part_file_name(p)) for p in pids]


class PartitionDecoder:
    """Actor-pool stage: one partition file per input row — read + decode
    in-process, so the large encoded blobs never round-trip through the
    object store; only the decoded rows enter plasma and stream on with
    backpressure. An ACTOR pool on purpose, symmetric with
    PartitionEncoder: (a) the descriptor/manifest caches live per actor,
    and (b) an actor operator never fuses with a downstream task operator
    — a fused task-task chain re-bundles the one-row path blocks up to the
    downstream batch_size and can collapse the whole file list into a
    single serial task."""

    def __init__(self, columns: list[str] | None = None):
        self.columns = columns
        self.read_cols = None
        if columns is not None:
            self.read_cols = list(enc.ENCODED_FIXED_COLS) + [f"col_{c}" for c in columns]

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for path in batch.column("path").to_pylist():
            t = pq.read_table(path, columns=self.read_cols, use_threads=False)
            out.append(enc.decode_rows(t, self.columns))
        return pa.concat_tables(out)


def read_encoded(
    out_dir: str,
    *,
    partition_ids: list[int] | None = None,
    columns: list[str] | None = None,
    concurrency: int | tuple[int, int] | None = None,
) -> rd.Dataset:
    """Encoded dir -> Dataset of decoded original rows (streaming)."""
    from ..util import default_concurrency

    files = encoded_part_files(out_dir, partition_ids)
    ds = rd.from_items([{"path": f} for f in files], override_num_blocks=max(len(files), 1))
    if concurrency is None:
        concurrency = (1, default_concurrency(cap=max(len(files), 1)))
    return ds.map_batches(
        PartitionDecoder,
        fn_constructor_kwargs={"columns": columns},
        batch_size=1,
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )


def read_encoded_for_shard(out_dir: str, shard_idx: int, **kw) -> rd.Dataset:
    """Range-predicate pruning on the lineage key: all partitions of one
    input shard (the block BETWEEN analogue)."""
    lo, hi = pk.shard_range(shard_idx)
    meta = mf.load_metadata(out_dir)
    pids = [p for p in meta["partition_ids"] if lo <= p < hi]
    return read_encoded(out_dir, partition_ids=pids, **kw)


def point_lookup(out_dir: str, pid: int, columns: list[str] | None = None) -> pa.Table:
    """Fetch + decode exactly one partition (driver-side, no Dataset):
    the read_raquet_at path — cheap because file naming is keyed."""
    path = os.path.join(out_dir, pk.part_file_name(pid))
    read_cols = None
    if columns is not None:
        read_cols = list(enc.ENCODED_FIXED_COLS) + [f"col_{c}" for c in columns]
    t = pq.read_table(path, columns=read_cols)
    return enc.decode_rows(t, columns)


def export_job(out_dir: str, dest_dir: str, *, columns: list[str] | None = None) -> int:
    """Decode an encoded dir back to PLAIN partitioned Parquet — the export
    sink (the reference's ST_AsPNG / COPY TO export path, SURVEY.md §2.1-2.2).
    One output file per encoded partition (same lineage file name), written
    tmp→rename, so a failed export resumes by skipping existing files —
    the resumable-output rule: never one giant file."""
    files = encoded_part_files(out_dir)
    os.makedirs(dest_dir, exist_ok=True)

    def export_one(batch: pa.Table) -> pa.Table:
        done = []
        for path in batch.column("path").to_pylist():
            name = os.path.basename(path)
            dest = os.path.join(dest_dir, name)
            if not os.path.exists(dest):
                read_cols = None
                if columns is not None:
                    read_cols = list(enc.ENCODED_FIXED_COLS) + [f"col_{c}" for c in columns]
                t = pq.read_table(path, columns=read_cols, use_threads=False)
                decoded = enc.decode_rows(t, columns)
                tmp = dest + f".tmp-{os.getpid()}"
                pq.write_table(decoded, tmp)
                os.replace(tmp, dest)
            done.append({"file": name})
        return pa.Table.from_pylist(done, schema=pa.schema([("file", pa.string())]))

    ds = rd.from_items([{"path": f} for f in files], override_num_blocks=max(len(files), 1))
    n = ds.map_batches(export_one, batch_size=1, batch_format="pyarrow", num_cpus=1).count()
    return n


def _verify_partitions(batch: pa.Table, out_dir: str) -> pa.Table:
    """Re-read the input row range and the encoded partition; compare
    bit-exactly. One work item per row, embarrassingly parallel."""
    results = []
    for item in batch.to_pylist():
        pid = item["partition_id"]
        original = pq.ParquetFile(item["shard"]).read_row_groups(item["row_groups"], use_threads=False)
        decoded = point_lookup(out_dir, pid)
        ok = decoded.equals(original)
        results.append({"partition_id": pid, "ok": ok, "n_rows": original.num_rows})
    return pa.Table.from_pylist(results)


def items_from_manifest(out_dir: str) -> list[dict]:
    """Reconstruct lineage-mode work items from the manifest itself, so
    verification checks exactly the partitioning that was encoded (no
    re-planning — an encode run with auto partition sizing would not
    re-plan identically without the original target)."""
    entries = mf.load_entries(out_dir)
    items: list[dict] = []
    shard_offsets: dict[str, list[int]] = {}
    for pid in sorted(entries):
        e = entries[pid]
        if e.get("status") != "done" or not e.get("row_range"):
            continue  # grouped-mode entries carry no row range
        shard = e["input_shard"]
        offs = shard_offsets.get(shard)
        if offs is None:
            md = pq.ParquetFile(shard).metadata
            offs = [0]
            for i in range(md.num_row_groups):
                offs.append(offs[-1] + md.row_group(i).num_rows)
            shard_offsets[shard] = offs
        lo, hi = e["row_range"]
        rgs = [i for i in range(len(offs) - 1) if offs[i] >= lo and offs[i + 1] <= hi]
        items.append(
            {"partition_id": pid, "shard": shard, "row_groups": rgs, "row_range": [lo, hi]}
        )
    return items


def verify_encoded(out_dir: str) -> dict:
    """Bit-identity gate driven purely by the manifest (lineage mode)."""
    return _run_verify(items_from_manifest(out_dir), out_dir)


def verify_job(input_paths: list[str], out_dir: str, **encode_plan_kwargs) -> dict:
    """Full-corpus bit-identity gate (per-row token-array equality via
    pa.Table.equals on every partition). Returns summary dict."""

    items = plan_partitions(input_paths, **encode_plan_kwargs)
    return _run_verify(items, out_dir)


def _run_verify(items: list[dict], out_dir: str) -> dict:
    ds = rd.from_items(items, override_num_blocks=len(items))
    res = ds.map_batches(
        functools.partial(_verify_partitions, out_dir=out_dir),
        batch_size=1,
        batch_format="pyarrow",
        num_cpus=1,
    )
    rows = res.take_all()
    bad = [r["partition_id"] for r in rows if not r["ok"]]
    return {
        "partitions": len(rows),
        "rows": sum(r["n_rows"] for r in rows),
        "mismatched_partitions": bad,
        "ok": not bad,
    }
