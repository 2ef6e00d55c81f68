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

This is the engine's ONE wide operation, and it is a hash-bucket
streaming repartition, not a sort: map tasks append each block's rows to
per-bucket piece files (bucket = partition_id % n_buckets, so a group
always lands whole in one bucket), then one reduce task per bucket
encodes its groups. The lineage-partitioned `encode_job` (encode.py)
needs no shuffle at all and is the default — and since the r2 dict
bucket, lineage partitions are the MORE coherent alphabet and compress
BETTER (BASELINE.md addendum). Use grouped mode for its source-
partitioned LAYOUT: `read_encoded_source` opens only one source's
partition files (pruned reads), and skewed sources are salted flat.

Partition id = pack_grouped(source, salt) (functions/partition_keys.py);
within a group, rows are sorted by doc_id before encoding so the output is
a pure function of the group *set*, not of shuffle arrival order —
bit-identity across resumed/re-sharded runs.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from .. import util
from ..functions import detmix
from ..functions import partition_keys as pk
from ..stages import encoder as enc
from ..state import fsio
from ..state import manifest as mf

# ~25k rows ≈ 40 MB decoded per group: measured 7x faster end-to-end than
# 100k-row groups (15.9 s vs 106-113 s on the 2 M-row bench corpus) at a
# 0.8 % ratio cost — big groups starve parallelism (32 groups on 32 cpus),
# never amortize the per-worker codec scratch pool, and push 170 MB blocks
# through the object store
DEFAULT_GROUP_ROWS = 25_000
NULL_SOURCE_KEY = "\x00<null-source>"  # partition-key stand-in for source IS NULL
_ENTRY_SCHEMA = pa.schema([("entry_json", pa.string())])


def _salts(batch: pa.Table, salt_map: dict[str, int], key: str = "doc_id") -> pa.Table:
    """Vectorized salt column: pandas' stable 64-bit string hasher (siphash,
    fixed key — C speed, deterministic across runs and topologies) over the
    doc key, modulo the source's bucket count."""
    import numpy as np
    import pandas as pd

    h = pd.util.hash_pandas_object(batch.column(key).to_pandas(), index=False).to_numpy()
    src = batch.column("source").to_pandas().fillna(NULL_SOURCE_KEY)
    mapped = src.map(salt_map)
    if mapped.isna().any():
        missing = sorted(src[mapped.isna()].unique())
        raise ValueError(
            f"sources {missing} absent from the job's salt_map — encoding "
            "them under a default salt would make read_encoded_source "
            "return empty for them (the manifest records the planned map); "
            "re-plan with resume=False or extend the input at plan time"
        )
    mods = mapped.to_numpy(dtype=np.uint64)
    salts = (h % mods).astype(np.int32)
    # group key column with nulls replaced: Ray's sort shuffle cannot
    # compare None with str; the real (nullable) source column rides along
    # untouched and round-trips bit-exactly
    gsrc = src.to_numpy(dtype=object)
    batch = batch.append_column("_gsrc", pa.array(gsrc, type=pa.string()))
    return batch.append_column("_salt", pa.array(salts, type=pa.int32()))


def _done_salts_by_source(done: set[int], salt_map: dict[str, int]) -> dict[str, object]:
    """Invert finished partition ids -> {source: sorted array of done salts}
    by enumerating the (source, salt) domain from the salt map (tiny:
    sum of bucket counts). Lets resume drop finished groups' rows BEFORE
    the shuffle instead of after it."""
    import numpy as np

    out: dict[str, object] = {}
    for s, buckets in salt_map.items():
        salts = [k for k in range(buckets) if pk.pack_grouped(s, k) in done]
        if salts:
            out[s] = np.array(salts, dtype=np.int32)
    return out


def _drop_done_groups(batch: pa.Table, done_by_source: dict[str, object]) -> pa.Table:
    """Filter out rows of already-encoded (source, salt) groups. Vectorized
    per distinct source (low-cardinality by construction)."""
    import numpy as np

    src = batch.column("_gsrc").to_numpy(zero_copy_only=False)
    salt = batch.column("_salt").to_numpy(zero_copy_only=False)
    keep = np.ones(len(src), dtype=bool)
    for s, done_salts in done_by_source.items():
        rows = src == s
        if rows.any():
            keep[rows] &= ~np.isin(salt[rows], done_salts)
    return batch.filter(pa.array(keep))


def compute_salt_map(ds: rd.Dataset, target_rows: int = DEFAULT_GROUP_ROWS) -> dict[str, int]:
    """Driver-side per-source row counts -> bucket counts. Per-batch
    value_counts folded on the driver — a pre-aggregation over a
    low-cardinality column, no shuffle at all (and unlike Ray's sort-based
    groupby, null sources are handled: they count under NULL_SOURCE_KEY)."""

    def counts(b: pa.Table) -> pa.Table:
        vc = b.column("source").to_pandas().fillna(NULL_SOURCE_KEY).value_counts()
        return pa.table(
            {"source": pa.array(vc.index.astype(str)), "cnt": pa.array(vc.to_numpy())}
        )

    agg: dict[str, int] = {}
    for r in ds.map_batches(counts, batch_format="pyarrow").take_all():
        agg[r["source"]] = agg.get(r["source"], 0) + int(r["cnt"])
    _check_source_hash_collisions(agg.keys())
    return {s: max(1, math.ceil(c / target_rows)) for s, c in agg.items()}


def _check_source_hash_collisions(sources) -> None:
    """The 43-bit source hash leaves ~0.06% collision odds at 100k distinct
    sources; a collision would make two sources share partition ids and the
    last writer would silently replace the other's file. The driver sees
    the full source list here, so collisions fail LOUDLY instead."""
    seen: dict[int, str] = {}
    for s in sources:
        h = pk.source_hash(s)
        if h in seen and seen[h] != s:
            raise ValueError(
                f"source-hash collision between {seen[h]!r} and {s!r}: "
                "grouped mode would assign them the same partition ids; "
                "use lineage mode or rename one source"
            )
        seen[h] = s


def encode_job_grouped(
    input_paths: list[str],
    out_dir: str,
    *,
    target_group_rows: int | None = None,
    resume: bool = True,
    salt_map: dict[str, int] | None = None,
    shuffle_buckets: int | None = None,
) -> dict:
    """source-salted shuffle encode job -> partition files + manifest.

    The salt map (and target_group_rows) is persisted to job.json at job
    start and REUSED on resume: partition ids are pure functions of the
    salt map, so re-deriving it with a different target would re-plan
    different groups under colliding ids. An explicit conflicting
    target_group_rows on resume raises."""
    prior = mf.resolve_job_config(
        out_dir, "grouped", {"target_group_rows": target_group_rows}, resume
    )
    if prior is not None:
        target_group_rows = prior["target_group_rows"]
        if salt_map is not None and salt_map != prior["salt_map"]:
            raise ValueError(
                "encode_job_grouped resume: explicit salt_map conflicts with "
                f"the persisted one ({salt_map} != {prior['salt_map']}) — "
                "partition ids are functions of the salt map; pass "
                "resume=False (fresh dir) to re-plan"
            )
        salt_map = prior["salt_map"]
    if target_group_rows is None:
        target_group_rows = DEFAULT_GROUP_ROWS
    ds = rd.read_parquet(sorted(input_paths))
    schema_arrow = pq.ParquetFile(sorted(input_paths)[0]).schema_arrow
    schema_str = str(schema_arrow)
    # schema-drift gate (the lineage-mode _encode_ordered rule): mixed
    # shard schemas would concat into null-filled grouped partitions
    ref_fields = [(f.name, f.type) for f in schema_arrow]
    for p in sorted(input_paths)[1:]:
        s = pq.ParquetFile(p).schema_arrow
        if [(f.name, f.type) for f in s] != ref_fields:
            raise ValueError(
                f"schema drift: {p} has schema "
                f"{[(f.name, str(f.type)) for f in s]} but the first shard's "
                f"is {[(n, str(t)) for n, t in ref_fields]} — align shard "
                "schemas before a grouped encode"
            )
    if salt_map is None:
        # count from a source-column-only read: the driver-side salt map
        # needs one tiny column, not a shuffle of the whole table
        salt_map = compute_salt_map(
            rd.read_parquet(sorted(input_paths), columns=["source"]), target_group_rows
        )
    if prior is None:
        mf.persist_job_config(
            out_dir,
            {"mode": "grouped", "target_group_rows": target_group_rows, "salt_map": salt_map},
        )
    done = mf.done_partition_ids(out_dir) if resume else set()
    os.makedirs(out_dir, exist_ok=True)

    def encode_one_group(group: pa.Table, source: str, salt: int) -> dict | None:
        util.retain_heap()  # task workers are long-lived; idempotent per pid
        pid = pk.pack_grouped(source, salt)
        if pid in done:
            return None
        # composite sort key: bit-identity across runs requires a total
        # order; doc_id alone leaves duplicate-key rows in shuffle-arrival
        # order (rows identical in all three keys but differing elsewhere
        # remain the one unordered residue — documented limitation)
        group = group.sort_by(
            [("doc_id", "ascending"), ("n_tok", "ascending"), ("_gsrc", "ascending")]
        ).drop_columns(["_salt", "_gsrc"])
        encoded, entry = enc.encode_table(
            group, pid, input_shard=f"group:{source}/{salt}", row_range=None
        )
        entry["group"] = {"source": source, "salt": salt, "n_buckets": salt_map.get(source, 1)}
        path = os.path.join(out_dir, pk.part_file_name(pid))
        # write_statistics=False: see encode.PartitionEncoder — footer
        # min/max over blob columns costs half the write and nothing reads it
        fsio.publish_table(
            encoded, path, compression="none", write_statistics=False
        )
        return entry

    salted = ds.map_batches(
        lambda b: _salts(b, salt_map), batch_format="pyarrow", batch_size=16384
    )
    if done:
        # resume: drop finished groups' rows BEFORE the shuffle — a resumed
        # run spills only the remaining rows, not 100% of the corpus just
        # to skip groups inside the encoder
        done_by_source = _done_salts_by_source(done, salt_map)
        salted = salted.map_batches(
            lambda b: _drop_done_groups(b, done_by_source), batch_format="pyarrow"
        )

    # --- hash-bucket streaming repartition (NO sort shuffle) ------------
    # The old shape was groupby(["_gsrc","_salt"]).map_groups — Ray's
    # sort-based all-to-all over the whole corpus just to obtain a LAYOUT.
    # Instead: map tasks append each block's rows to per-BUCKET piece
    # files (bucket = partition_id % n_buckets, so a group always lands
    # whole in one bucket), then one reduce task per bucket reads its
    # pieces and encodes its few groups. Data flows through the job's
    # output filesystem (shared storage on a real cluster — the same
    # assumption the part files themselves make), never through a sort.
    n_groups = sum(salt_map.values())
    n_buckets = shuffle_buckets or max(1, min(4096, math.ceil(n_groups / 4)))
    shuffle_dir = os.path.join(out_dir, "_shuffle")
    shutil.rmtree(shuffle_dir, ignore_errors=True)
    os.makedirs(shuffle_dir, exist_ok=True)

    def write_pieces(batch: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd

        if batch.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int32()),
                             "path": pa.array([], pa.string())})
        src = batch.column("_gsrc").to_pandas()
        salt = np.asarray(batch.column("_salt")).astype(np.uint64)
        sh = {s: pk.source_hash(s) for s in src.unique()}  # few distinct
        pid = (
            np.uint64(pk.MODE_BIT)
            | (src.map(sh).to_numpy(dtype=np.uint64) << np.uint64(pk.SALT_BITS))
            | salt
        )
        # mix before the modulus: pid packs salt into the LOW bits
        # (source_hash << SALT_BITS | salt), so a power-of-two n_buckets
        # (including the 4096 cap) would reduce to `salt % n_buckets` and
        # collapse every source's salt-0 group into ONE reduce bucket —
        # exactly the skew this repartition exists to remove
        bucket = (detmix.splitmix64(pid) % np.uint64(n_buckets)).astype(np.int32)
        order = np.argsort(bucket, kind="stable")
        batch = batch.take(pa.array(order))
        bsorted = bucket[order]
        uniq, first = np.unique(bsorted, return_index=True)
        ends = np.append(first[1:], len(bsorted))
        tag = uuid.uuid4().hex[:12]
        buckets_out, paths_out, bytes_out = [], [], []
        for b, s0, s1 in zip(uniq.tolist(), first.tolist(), ends.tolist()):
            p = os.path.join(shuffle_dir, f"b{b:05d}-{tag}.parquet")
            pq.write_table(batch.slice(s0, s1 - s0), p, compression="lz4")
            buckets_out.append(b)
            paths_out.append(p)
            bytes_out.append(os.path.getsize(p))
        return pa.table({"bucket": pa.array(buckets_out, pa.int32()),
                         "path": pa.array(paths_out, pa.string()),
                         "bytes": pa.array(bytes_out, pa.int64())})

    piece_rows = salted.map_batches(
        write_pieces, batch_format="pyarrow", batch_size=None
    ).take_all()  # O(blocks x buckets-present) tiny rows
    by_bucket: dict[int, list[str]] = {}
    bucket_bytes: dict[int, int] = {}
    for r in piece_rows:
        b = int(r["bucket"])
        by_bucket.setdefault(b, []).append(r["path"])
        bucket_bytes[b] = bucket_bytes.get(b, 0) + int(r.get("bytes", 0) or 0)
    # the layout shuffle's priced cost: on object storage every piece file
    # is one PUT + one GET — recorded in the manifest so the bench reports
    # it as a number, not prose
    shuffle_stats = {
        "n_buckets": int(n_buckets),
        "piece_files": len(piece_rows),
        "piece_bytes": int(sum(bucket_bytes.values())),
        "max_bucket_bytes": int(max(bucket_bytes.values(), default=0)),
    }

    def encode_bucket(batch: pa.Table) -> pa.Table:
        import numpy as np

        entries = []
        for row in batch.to_pylist():
            t = pa.concat_tables([pq.read_table(p) for p in row["paths"]])
            src = t.column("_gsrc").to_numpy(zero_copy_only=False)
            salt = t.column("_salt").to_numpy(zero_copy_only=False)
            order = np.lexsort((salt, src))
            t = t.take(pa.array(order))
            src, salt = src[order], salt[order]
            change = np.nonzero((src[1:] != src[:-1]) | (salt[1:] != salt[:-1]))[0] + 1
            starts = np.concatenate(([0], change, [len(src)]))
            for s0, s1 in zip(starts[:-1], starts[1:]):
                e = encode_one_group(
                    t.slice(s0, s1 - s0), str(src[s0]), int(salt[s0])
                )
                if e is not None:
                    entries.append({"entry_json": json.dumps(e)})
        if not entries:
            return _ENTRY_SCHEMA.empty_table()
        return pa.Table.from_pylist(entries, schema=_ENTRY_SCHEMA)

    writer = mf.ManifestWriter(out_dir)
    try:
        if by_bucket:
            # largest-first (LPT, same rationale as encode.encode_job):
            # bucket sizes vary with the salt layout, and the last-started
            # bucket bounds the reduce wall — big buckets go first
            order = sorted(
                by_bucket, key=lambda b: bucket_bytes.get(b, 0), reverse=True
            )
            items = rd.from_items(
                [{"paths": by_bucket[b]} for b in order],
                override_num_blocks=len(by_bucket),
            )
            # half-density slots, same rationale as encode.ENCODER_NUM_CPUS:
            # the group-encode kernel is memory-bandwidth/fault-bound, and
            # 16 concurrent encoders measurably beat 32 on a 32-vCPU box
            results = items.map_batches(
                encode_bucket, batch_format="pyarrow", batch_size=1, num_cpus=2
            )
            for row in results.iter_rows():
                writer.append(json.loads(row["entry_json"]))
        meta = writer.finalize(
            schema_str,
            extra={
                "mode": "grouped",
                "salt_map": salt_map,
                "input_shards": sorted(input_paths),
                "schema_ipc": mf.schema_to_b64(schema_arrow),
                "shuffle": shuffle_stats,
            },
        )
    finally:
        writer.close()
        shutil.rmtree(shuffle_dir, ignore_errors=True)
    return meta
