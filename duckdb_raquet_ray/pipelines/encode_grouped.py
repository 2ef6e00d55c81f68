"""Grouped encode: salted groupby-on-source shuffle before encoding.

Encoders compress better when they see a coherent value distribution (one
`source`'s doc-ids share prefixes; its token alphabet is narrower) — the
reason the reference trains its warp transformer per overview level and
reuses it across tiles of the same frame
(/root/reference/src/read_raster.cpp:273-286,359-439). But `source` is
Zipf: an unsalted groupby('source') serializes the job on the head key
(SURVEY.md §7 hard-part 4). So the group key is salted:

    salt = siphash64(doc_id) % S(source),   S(source) = ceil(rows / target)

with S from a driver-side `groupby('source').count()` — a tiny aggregate
over a low-cardinality column. Same source => same string/token
distribution in every salted bucket (compression unaffected); skew broken
because the head key fans out over S buckets. The salt is a pure function
of doc_id, so bucket membership is deterministic across runs/topologies.

This is the engine's ONE wide operation. Its `groupby(...).map_groups`
moves every row; the lineage-partitioned `encode_job` (encode.py) needs no
shuffle at all and is the default — use grouped mode when compression
ratio matters more than a one-pass encode.

Partition id = pack_grouped(source, salt) (functions/partition_keys.py);
within a group, rows are sorted by doc_id before encoding so the output is
a pure function of the group *set*, not of shuffle arrival order —
bit-identity across resumed/re-sharded runs.
"""

from __future__ import annotations

import json
import math
import os
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from ..functions import partition_keys as pk
from ..stages import encoder as enc
from ..state import manifest as mf

DEFAULT_GROUP_ROWS = 100_000
_ENTRY_SCHEMA = pa.schema([("entry_json", pa.string())])


def _salts(batch: pa.Table, salt_map: dict[str, int], key: str = "doc_id") -> pa.Table:
    """Vectorized salt column: pandas' stable 64-bit string hasher (siphash,
    fixed key — C speed, deterministic across runs and topologies) over the
    doc key, modulo the source's bucket count."""
    import numpy as np
    import pandas as pd

    h = pd.util.hash_pandas_object(batch.column(key).to_pandas(), index=False).to_numpy()
    mods = (
        batch.column("source")
        .to_pandas()
        .map(salt_map)
        .fillna(1)
        .to_numpy(dtype=np.uint64)
    )
    salts = (h % mods).astype(np.int32)
    return batch.append_column("_salt", pa.array(salts, type=pa.int32()))


def compute_salt_map(ds: rd.Dataset, target_rows: int = DEFAULT_GROUP_ROWS) -> dict[str, int]:
    """Driver-side per-source row counts -> bucket counts. Small shuffle
    over a low-cardinality key; result is broadcast by closure."""
    counts = ds.groupby("source").count().take_all()
    return {
        r["source"]: max(1, math.ceil(r["count()"] / target_rows)) for r in counts
    }


def encode_job_grouped(
    input_paths: list[str],
    out_dir: str,
    *,
    target_group_rows: int = DEFAULT_GROUP_ROWS,
    resume: bool = True,
    salt_map: dict[str, int] | None = None,
) -> dict:
    """source-salted shuffle encode job -> partition files + manifest."""
    ds = rd.read_parquet(sorted(input_paths))
    schema_str = str(pq.ParquetFile(sorted(input_paths)[0]).schema_arrow)
    if salt_map is None:
        # count from a source-column-only read: the driver-side salt map
        # needs one tiny column, not a shuffle of the whole table
        salt_map = compute_salt_map(
            rd.read_parquet(sorted(input_paths), columns=["source"]), target_group_rows
        )
    done = mf.done_partition_ids(out_dir) if resume else set()
    os.makedirs(out_dir, exist_ok=True)

    def encode_group(group: pa.Table) -> pa.Table:
        source = group.column("source")[0].as_py()
        salt = group.column("_salt")[0].as_py()
        pid = pk.pack_grouped(source, salt)
        if pid in done:
            return _ENTRY_SCHEMA.empty_table()
        group = group.sort_by("doc_id").drop_columns(["_salt"])
        encoded, entry = enc.encode_table(
            group, pid, input_shard=f"group:{source}/{salt}", row_range=None
        )
        entry["group"] = {"source": source, "salt": salt, "n_buckets": salt_map.get(source, 1)}
        path = os.path.join(out_dir, pk.part_file_name(pid))
        tmp = path + f".tmp-{os.getpid()}"
        pq.write_table(encoded, tmp, compression="none")
        os.replace(tmp, path)
        return pa.Table.from_pylist([{"entry_json": json.dumps(entry)}], schema=_ENTRY_SCHEMA)

    salted = ds.map_batches(
        lambda b: _salts(b, salt_map), batch_format="pyarrow", batch_size=16384
    )
    results = salted.groupby(["source", "_salt"]).map_groups(
        encode_group, batch_format="pyarrow", num_cpus=1
    )
    writer = mf.ManifestWriter(out_dir)
    try:
        for row in results.iter_rows():
            writer.append(json.loads(row["entry_json"]))
        meta = writer.finalize(
            schema_str,
            extra={
                "mode": "grouped",
                "salt_map": salt_map,
                "input_shards": sorted(input_paths),
            },
        )
    finally:
        writer.close()
    return meta
