"""The encode job: Parquet shards -> encoded partition files + manifest.

Ray-Data-native translation of the reference's `read_raster` ingest
(/root/reference/src/read_raster.cpp:733-1626, traced in SURVEY.md §3.1),
redesigned for partition independence:

  driver: plan_partitions()        -- enumerate (shard, row-group range)
                                      work units, like the tile work queue
                                      (read_raster.cpp:1143-1147), but ids
                                      are pure lineage functions so resume
                                      and two-cluster runs re-plan identically
  Dataset(work items) ->
    map_batches(PartitionEncoder,   -- actor pool; each actor reads its row
                concurrency=N)         groups (pyarrow), plans codecs,
                                       encodes, writes part-<pid>.parquet
                                       tmp->rename, emits a manifest entry
  driver: append entries + finalize manifest.json
                                    -- the phase-3 metadata barrier
                                       (read_raster.cpp:1486-1590), reduced
                                       to a driver-side fold

Reading inside the encode task (instead of read_parquet -> shuffle ->
encode) is exactly how Ray Data's own read operator works — a read task IS
an item — and it keeps the pipeline shuffle-free: block ≡ partition
(SURVEY.md §1.1). At 100 TB the work-item list is ~10^5-10^6 tiny dicts —
nothing — while the data itself streams through the actor pool with
backpressure, one partition at a time per actor.

Resume: completed partition ids (manifest 'done' + file exists) are
filtered from the work list before launch — idempotent, no shuffle.
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from ..functions import partition_keys as pk
from ..util import default_concurrency, retain_heap
from ..stages import encoder as enc
from ..state import fsio
from ..state import manifest as mf

DEFAULT_PART_BYTES = 64 * 1024 * 1024  # decoded bytes per partition
MIN_PART_BYTES = 8 * 1024 * 1024
MAX_PART_BYTES = 256 * 1024 * 1024
TASKS_PER_CPU = 4  # target work-items per core, for pipelining + stragglers
# encoder actors reserve 2 logical CPUs each: the kernel is memory-bandwidth
# bound (measured: 16 concurrent encoders beat 32 on a 32-vCPU box, 0.72 vs
# 0.36 GB/s — DRAM and host fault handling saturate near half the cores), so
# half-density slots are the right per-node sizing, and each actor then sees
# 2x the partitions, amortizing its scratch pool (codecs/scratch.py) better
ENCODER_NUM_CPUS = 2


def _pool_size(
    concurrency: int | tuple[int, int] | None, n_items: int
) -> int | tuple[int, int]:
    """Actor-pool sizing shared by every encoder-family job (encode /
    compact / delete): a CPU budget becomes half-density actor slots
    (ENCODER_NUM_CPUS rationale above), capped by the work-item count;
    a tuple passes through as an explicit (min, max) pool."""
    if concurrency is None:
        concurrency = default_concurrency()
    if isinstance(concurrency, int):
        return max(1, min(concurrency // ENCODER_NUM_CPUS, max(n_items, 1)))
    return concurrency


def _typed_value_set(cache: dict, keys: list, typ: pa.DataType) -> pa.Array:
    """Memoized typed Arrow array of a key list (keyed by target type):
    large retention key sets must not re-materialize per partition."""
    vs = cache.get(typ)
    if vs is None:
        vs = cache[typ] = pa.array(keys, type=typ)
    return vs


def _footer_md(path: str, md_cache: dict | None):
    """Parquet footer metadata with a per-job cache: planning consults
    every shard's footer up to three times (auto-sizing, partition plan,
    schema) — at 10^5-10^6 shards the duplicate reads dominate the
    driver-side planning phase, so one read per shard per job."""
    if md_cache is None:
        return pq.ParquetFile(path).metadata
    md = md_cache.get(path)
    if md is None:
        md = md_cache[path] = pq.ParquetFile(path).metadata
    return md


def auto_target_part_bytes(
    input_paths: list[str],
    cluster_cpus: int | None = None,
    md_cache: dict | None = None,
) -> int:
    """Pick a partition size so the job yields ~TASKS_PER_CPU work items
    per core, clamped to [8 MB, 256 MB] — the reference's auto resolution
    selection (ST_RegionStats picks the zoom whose tile count stays under
    a target, /root/reference/src/st_region_stats.cpp:255-324), inverted
    for a fixed-size cluster: enough partitions to pipeline and absorb
    stragglers, few enough that per-task overhead stays negligible.
    Deterministic given (inputs, cpus): resume must re-plan identically,
    so pass the SAME cluster_cpus when resuming a run started elsewhere."""
    if cluster_cpus is None:
        cluster_cpus = default_concurrency()
    total = 0
    for path in input_paths:
        md = _footer_md(path, md_cache)
        total += sum(md.row_group(i).total_byte_size for i in range(md.num_row_groups))
    target = total // max(cluster_cpus * TASKS_PER_CPU, 1)
    return max(MIN_PART_BYTES, min(MAX_PART_BYTES, target))


def plan_partitions(
    input_paths: list[str],
    target_part_bytes: int = DEFAULT_PART_BYTES,
    *,
    shard_order: list[str] | None = None,
    first_shard_index: int = 0,
    md_cache: dict | None = None,
) -> list[dict]:
    """Enumerate deterministic work items from Parquet metadata only.

    Row groups are the atomic units (cheap range reads); contiguous row
    groups are greedily packed to ~target_part_bytes of decoded data. The
    plan is a pure function of (input file list, target) — never of
    cluster size — so partition ids are stable across runs and topologies
    (SURVEY.md §7 hard-part 1).

    ``shard_order``: explicit shard-index assignment (APPEND support —
    partition ids embed the shard's position, so an appended shard must
    take the next index even if its name sorts before an existing one;
    encode_job persists the order in job.json and append_job extends it).
    Default: sorted(input_paths), the original first-encode order.
    """
    ordered = list(shard_order) if shard_order is not None else sorted(input_paths)
    items: list[dict] = []
    for shard_idx, path in enumerate(ordered, start=first_shard_index):
        md = _footer_md(path, md_cache)
        groups: list[list[int]] = []
        cur: list[int] = []
        cur_bytes = 0
        for rg in range(md.num_row_groups):
            size = md.row_group(rg).total_byte_size
            if cur and cur_bytes + size > target_part_bytes:
                groups.append(cur)
                cur, cur_bytes = [], 0
            cur.append(rg)
            cur_bytes += size
        if cur:
            groups.append(cur)
        rg_rows = [md.row_group(rg).num_rows for rg in range(md.num_row_groups)]
        rg_offsets = [0]
        for r in rg_rows:
            rg_offsets.append(rg_offsets[-1] + r)
        for part_idx, rgs in enumerate(groups):
            row_start = rg_offsets[rgs[0]]
            row_end = rg_offsets[rgs[-1] + 1]
            items.append(
                {
                    "partition_id": pk.pack(shard_idx, part_idx),
                    "shard": path,
                    "row_groups": rgs,
                    "row_range": [row_start, row_end],
                    # decoded size estimate, used only for LPT scheduling
                    # (largest-first submission); identity stays (shard, idx)
                    "decoded_bytes": sum(
                        md.row_group(rg).total_byte_size for rg in rgs
                    ),
                }
            )
    return items


class PartitionEncoder:
    """Actor-pool stage: encode one work item per input row.

    Per-actor state (scratch, nothing heavyweight today; the slot where a
    shared model/symbol-table cache would live) is created once in
    __init__ — the reference's per-thread lazy state
    (read_raster.cpp:264-286, 1230-1242)."""

    def __init__(self, out_dir: str | None):
        self.out_dir = out_dir
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
        # keep freed task memory mapped (glibc mmap thresholds + jemalloc
        # decay): re-faulting purged pages measurably dominates encode at
        # high parallelism (same rationale as codecs/scratch.py for numpy)
        retain_heap()

    def __call__(self, batch: pa.Table) -> pa.Table:
        entries = []
        for item in batch.to_pylist():
            pid = item["partition_id"]
            pf = pq.ParquetFile(item["shard"])
            # single-threaded read: each actor owns one CPU; pyarrow's
            # default pool is sized to the whole machine, and N actors x
            # N arrow threads thrash the scheduler at high concurrency
            table = pf.read_row_groups(item["row_groups"], use_threads=False)
            encoded, entry = enc.encode_table(
                table, pid, input_shard=item["shard"], row_range=tuple(item["row_range"])
            )
            if self.out_dir:
                path = os.path.join(self.out_dir, pk.part_file_name(pid))
                # absent-or-complete publish (local rename / object-store
                # atomic upload — state/fsio.py); blobs are already
                # compressed. No footer statistics: min/max over 10s-of-MB
                # binary blobs costs half the write (measured 300->156 ms
                # per partition) and nothing reads them — pruning uses the
                # manifest + explicit stat_* columns
                fsio.publish_table(
                    encoded, path, compression="none", write_statistics=False
                )
            entries.append({"entry_json": json.dumps(entry)})
        return pa.Table.from_pylist(entries, schema=pa.schema([("entry_json", pa.string())]))


def encode_job(
    input_paths: list[str],
    out_dir: str,
    *,
    target_part_bytes: int | None = None,
    resume: bool = True,
    concurrency: int | tuple[int, int] | None = None,
) -> dict:
    """Run the full encode job; returns the finalized manifest metadata.

    The resolved ``target_part_bytes`` is persisted to job.json at start;
    a resume reuses the persisted value (partition ids are functions of the
    plan — re-planning with a different target under the same ids would
    silently skip rows) and an explicit conflicting value raises."""
    if not resume and os.path.isdir(out_dir):
        # fresh re-encode requested: stale journal/manifest/part files from
        # a prior plan must not leak into finalize (overlapping row ranges)
        for pat in ("manifest.jsonl", "manifest.json", "job.json"):
            try:
                os.remove(os.path.join(out_dir, pat))
            except FileNotFoundError:
                pass
        for f in glob.glob(os.path.join(out_dir, "part-*.parquet")):
            os.remove(f)
    md_cache: dict = {}  # one footer read per shard per job (see _footer_md)
    prior = mf.resolve_job_config(
        out_dir, "lineage", {"target_part_bytes": target_part_bytes}, resume
    )
    if prior is not None:
        target_part_bytes = prior["target_part_bytes"]
        shard_order = prior.get("shard_order")
        if not shard_order:
            # legacy job.json without shard_order: recover the original
            # roster from the journal's input_shard fields — falling back
            # to sorted(input_paths) would make the mismatch guard below a
            # tautology and let a grown list silently remap shard indices
            recorded = sorted(
                {
                    e.get("input_shard")
                    for e in mf.load_entries(out_dir).values()
                    if e.get("input_shard") and e.get("input_shard") != "<stream>"
                }
            )
            shard_order = recorded or sorted(input_paths)
        if set(shard_order) != set(input_paths):
            # grown input list: safe ONLY if sorting it leaves every
            # existing shard at its original index (new names all sort
            # after) — then this is the documented incremental re-run.
            # Anything else (a new shard sorting into the middle, or a
            # shrunk list) would silently remap partition ids.
            grown = sorted(input_paths)
            if len(grown) > len(shard_order) and grown[: len(shard_order)] == list(
                shard_order
            ):
                shard_order = grown
                mf.persist_job_config(out_dir, {**prior, "shard_order": grown})
            else:
                raise ValueError(
                    f"resume input mismatch in {out_dir}: job started with "
                    f"{len(shard_order)} shards; re-run with the original "
                    "list, or grow the corpus with append_job (shard indices "
                    "are part of every partition id — a silent re-sort would "
                    "corrupt them)"
                )
    else:
        if target_part_bytes is None:
            # auto-size from input volume and cluster width; persisted below
            # so a resume on a different-width cluster re-plans identically
            target_part_bytes = auto_target_part_bytes(
                input_paths, md_cache=md_cache
            )
        shard_order = sorted(input_paths)
        mf.persist_job_config(
            out_dir,
            {
                "mode": "lineage",
                "target_part_bytes": target_part_bytes,
                "shard_order": shard_order,
            },
        )
    return _encode_ordered(
        shard_order, out_dir, target_part_bytes, resume=resume,
        concurrency=concurrency, md_cache=md_cache,
    )


def _encode_ordered(
    shard_order: list[str],
    out_dir: str,
    target_part_bytes: int,
    *,
    resume: bool,
    concurrency: int | tuple[int, int] | None,
    plan_from: int = 0,
    md_cache: dict | None = None,
) -> dict:
    """Shared encode body (encode_job + append_job): plan over an explicit
    shard order, skip done partitions, encode, finalize from the journal.

    ``plan_from``: skip planning (= parquet footer reads) for the first N
    shards — append_job passes the count of already-FINALIZED shards so an
    append costs O(new shards), not O(corpus); their partitions are all in
    the done set anyway."""
    # sweep stale publish temps from a killed prior run (publish is
    # tmp-<pid> -> rename; a SIGKILL mid-write leaves the tmp behind and
    # resume re-encodes that partition under a fresh pid anyway)
    for stale in glob.glob(os.path.join(out_dir, "*.tmp-*")):
        try:
            os.remove(stale)
        except OSError:
            pass
    items = plan_partitions(
        shard_order[plan_from:],
        target_part_bytes,
        shard_order=shard_order[plan_from:],
        first_shard_index=plan_from,
        md_cache=md_cache,
    )
    md0 = _footer_md(shard_order[0], md_cache)
    schema_arrow = md0.schema.to_arrow_schema()
    schema_str = str(schema_arrow)
    # schema-drift gate: a shard whose columns/types differ from shard 0
    # would encode partitions with a DIFFERENT schema into the same dir,
    # and decode would silently union them into a null-filled mixed
    # frame — the corrupted-table failure mode an append-heavy corpus
    # hits first. Footers are already read for planning (md_cache), so
    # the check is free; field metadata (pandas etc.) is ignored.
    ref_fields = [
        (f.name, f.type) for f in schema_arrow
    ]
    for shard in shard_order[plan_from:]:
        s = _footer_md(shard, md_cache).schema.to_arrow_schema()
        if [(f.name, f.type) for f in s] != ref_fields:
            raise ValueError(
                f"schema drift: {shard} has schema "
                f"{[(f.name, str(f.type)) for f in s]} but this encode dir's "
                f"schema is {[(n, str(t)) for n, t in ref_fields]} — encode "
                "drifted shards to their own directory (or align the schema "
                "first); appending them here would corrupt decode"
            )
    done = mf.resume_skip_ids(out_dir) if resume else set()
    todo = [it for it in items if it["partition_id"] not in done]

    writer = mf.ManifestWriter(out_dir)
    try:
        if todo:
            n_actors = _pool_size(concurrency, len(todo))
            # one block per work item: map_batches parallelism is per-BLOCK
            # (batch_size only slices batches within a task), so without
            # this the whole work list can serialize onto one actor.
            # Largest-first (LPT): partition sizes vary (greedy row-group
            # packing), and the last-started partition bounds job wall —
            # submitting big ones first shrinks the straggler tail, which
            # is the dominant non-scaling term once actors are warm
            todo = sorted(
                todo, key=lambda it: it.get("decoded_bytes", 0), reverse=True
            )
            ds = rd.from_items(todo, override_num_blocks=len(todo))
            results = ds.map_batches(
                PartitionEncoder,
                fn_constructor_kwargs={"out_dir": out_dir},
                batch_size=1,
                batch_format="pyarrow",
                concurrency=n_actors,
                num_cpus=ENCODER_NUM_CPUS,
            )
            # entries are tiny; stream them back and append in completion order
            for row in results.iter_rows():
                writer.append(json.loads(row["entry_json"]))
        meta = writer.finalize(
            schema_str,
            extra={
                # shard-index order, NOT re-sorted: verify_encoded replans
                # from this list and appended shards keep their indices
                "input_shards": list(shard_order),
                "schema_ipc": mf.schema_to_b64(schema_arrow),
            },
        )
    finally:
        writer.close()
    return meta


def append_job(
    new_paths: list[str],
    out_dir: str,
    *,
    concurrency: int | tuple[int, int] | None = None,
) -> dict:
    """Grow an encoded dir with NEW input shards — the operational path
    for a corpus that arrives in batches (the 100-TB norm). New shards
    take shard indices AFTER every existing one (names never re-sort, so
    existing partition ids — pack(shard_idx, part_idx) — are untouched);
    only the new shards' partitions are planned and encoded; the manifest
    journal appends and manifest.json/rollups re-finalize from it.
    Idempotent: already-present paths are skipped, and a killed append
    resumes (done partitions skipped) by re-running with the same args.
    Decode/verify/rollup read the updated manifest with no special case —
    an append-then-read is bit-identical to a single encode of the full
    corpus over the same shard order (pytest-pinned)."""
    cfg = mf.load_job_config(out_dir)
    if not cfg or cfg.get("mode") != "lineage":
        raise ValueError(
            f"{out_dir} is not a resumable lineage-mode encode dir "
            f"(job.json missing or mode={cfg.get('mode') if cfg else None!r})"
        )
    if cfg.get("compacted_from"):
        # compacted dirs are append-CLOSED: their partition ids are
        # pack(group_index, 0), and an appended shard takes the next
        # SHARD index — if compaction produced >= as many groups as the
        # source had shards, the two id namespaces collide and resume
        # would silently skip the appended shard's partitions (data
        # loss). Append to the SOURCE dir and re-compact, or encode the
        # new shards to a fresh dir.
        raise ValueError(
            f"{out_dir} is a compacted dir (compact_job output) and is "
            "append-closed — append to its source dir "
            f"({cfg['compacted_from']}) and re-compact, or encode the new "
            "shards to a fresh directory"
        )
    order = cfg.get("shard_order")
    if not order:
        try:
            meta = mf.load_metadata(out_dir)
        except FileNotFoundError:
            meta = {}  # initial encode died before finalize: no manifest yet
        order = meta.get("input_shards")  # pre-append-feature dirs: sorted
    if not order:
        raise ValueError(f"cannot append to {out_dir}: no shard order recorded")
    seen = set(order)
    fresh = [p for p in sorted(new_paths) if p not in seen]
    shard_order = list(order) + fresh
    if fresh:
        mf.persist_job_config(out_dir, {**cfg, "shard_order": shard_order})
    # plan only past the FINALIZED prefix (manifest.json's input_shards —
    # job.json is written before encoding, so it can't prove completion):
    # appends cost O(new shards) in footer reads, and a killed append
    # resumes because its shards sit past the last finalized prefix
    try:
        finalized = mf.load_metadata(out_dir).get("input_shards") or []
    except FileNotFoundError:
        finalized = []  # never finalized: plan from 0, resume skips done pids
    plan_from = (
        len(finalized)
        if shard_order[: len(finalized)] == list(finalized)
        else 0
    )
    return _encode_ordered(
        shard_order,
        out_dir,
        cfg["target_part_bytes"],
        resume=True,
        concurrency=concurrency,
        plan_from=plan_from,
        md_cache={},  # one footer read per shard: planning + drift gate share it
    )


class GroupCompactor:
    """Actor-pool stage for compact_job: one work item = one GROUP of
    source partitions -> decode each part file, concat in partition-id
    order, re-encode as ONE right-sized partition. Per-actor scratch
    state in __init__ (the PartitionEncoder discipline)."""

    def __init__(self, src_dir: str, out_dir: str):
        self.src_dir = src_dir
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        retain_heap()

    def __call__(self, batch: pa.Table) -> pa.Table:
        entries = []
        for item in batch.to_pylist():
            new_pid = int(item["new_pid"])
            tables = []
            for pid in item["src_pids"]:
                path = os.path.join(self.src_dir, pk.part_file_name(int(pid)))
                tables.append(
                    enc.decode_rows(
                        pq.read_table(path, use_threads=False)
                    )
                )
            table = pa.concat_tables(tables).combine_chunks()
            encoded, entry = enc.encode_table(
                table, new_pid, input_shard=f"compact:{self.src_dir}"
            )
            fsio.publish_table(
                encoded,
                os.path.join(self.out_dir, pk.part_file_name(new_pid)),
                compression="none",
                write_statistics=False,
            )
            entries.append({"entry_json": json.dumps(entry)})
        return pa.Table.from_pylist(
            entries, schema=pa.schema([("entry_json", pa.string())])
        )


def compact_job(
    src_dir: str,
    out_dir: str,
    *,
    target_part_bytes: int | None = None,
    concurrency: int | tuple[int, int] | None = None,
) -> dict:
    """Merge an encoded dir's partitions into right-sized ones — the LSM
    compaction step an append-heavy 100-TB corpus needs: each append_job
    tail-encodes its own shards, so partition sizes drift small over many
    appends; compaction re-encodes GROUPS of consecutive partitions
    (partition-id order == row order, so the logical table is unchanged)
    into fresh partitions near ``target_part_bytes`` decoded bytes,
    WITHOUT touching the original input shards (they may be gone — the
    group decode reads only the encoded part files).

    Scale shape: planning is O(partitions) manifest rows on the driver
    (the same order as resume's done-set); the decode+re-encode fans out
    one task per GROUP through an actor pool, each task reading only its
    own group's part files; entries stream back and the manifest
    finalizes from the journal. Output ids are ``pack(group_index, 0)``
    — valid lineage ids, so every decode/stats/rollup path reads the
    compacted dir with no special case. Resumable: a killed compaction
    re-run skips groups whose id is already journaled 'done'
    (``resolve_job_config`` pins the target across resumes; a different
    explicit target raises rather than silently re-grouping)."""
    src_meta = mf.load_metadata(src_dir)
    entries = mf.load_entries(src_dir)
    done_src = {
        p: e for p, e in entries.items() if e.get("status") == "done"
    }
    if not done_src:
        raise ValueError(f"{src_dir}: no completed partitions to compact")
    if os.path.abspath(src_dir) == os.path.abspath(out_dir):
        raise ValueError("compact_job: out_dir must differ from src_dir")
    src_cfg = mf.load_job_config(src_dir) or {}
    if src_cfg.get("mode") not in (None, "lineage"):
        # grouped-mode partition ids carry (source, salt) semantics that
        # read_encoded_source unpacks — re-keying them to pack(group, 0)
        # would silently break every grouped read path
        raise ValueError(
            f"compact_job supports lineage-mode dirs only; {src_dir} is "
            f"{src_cfg.get('mode')!r}-mode"
        )
    # pin the SOURCE PARTITION ROSTER, not just the target: group ids are
    # consecutive indices over the source done-set, so a resume after the
    # source changed (append/delete) would re-group and silently skip a
    # grown last group under an already-done id — roster drift must raise
    import hashlib as _hashlib

    roster = _hashlib.sha256(
        json.dumps(
            sorted([int(p), int(e["input_bytes"])] for p, e in done_src.items())
        ).encode()
    ).hexdigest()[:16]
    prior = mf.resolve_job_config(
        out_dir,
        "lineage",
        {
            # pass the CALLER'S value (None = no opinion): pre-resolving
            # the default here would make a flag-less resume of an
            # explicit-target run raise a spurious mismatch
            "target_part_bytes": target_part_bytes,
            "compacted_from": os.path.abspath(src_dir),
            "src_roster_sha": roster,
        },
        resume=True,
    )
    if prior is not None:
        # resolve_job_config only compares keys PRESENT in the prior
        # config, so a job.json without the compact keys (a plain encode
        # dir used as out_dir, or a pre-roster compacted dir) would
        # silently bypass both gates — refuse those explicitly
        if prior.get("compacted_from") != os.path.abspath(src_dir):
            raise ValueError(
                f"{out_dir} is not a compaction of {src_dir} "
                f"(job.json compacted_from={prior.get('compacted_from')!r}) "
                "— compact into a FRESH directory"
            )
        if "src_roster_sha" not in prior:
            raise ValueError(
                f"{out_dir} predates roster pinning — its resume cannot be "
                "proven safe against source changes; compact into a fresh "
                "directory"
            )
        tgt = int(prior["target_part_bytes"])
    else:
        tgt = int(
            target_part_bytes
            or src_cfg.get("target_part_bytes")
            or DEFAULT_PART_BYTES
        )
        mf.persist_job_config(
            out_dir,
            {
                "mode": "lineage",
                "target_part_bytes": tgt,
                "compacted_from": os.path.abspath(src_dir),
                "src_roster_sha": roster,
            },
        )

    # group CONSECUTIVE partition ids (id order == row order) to ~tgt
    # decoded bytes per group; a single oversized partition stays its own
    # group (splitting would need a row-range re-plan — out of scope)
    pids = sorted(done_src)
    groups: list[list[int]] = []
    cur: list[int] = []
    cur_b = 0
    for pid in pids:
        b = int(done_src[pid]["input_bytes"])
        if cur and cur_b + b > tgt:
            groups.append(cur)
            cur, cur_b = [], 0
        cur.append(pid)
        cur_b += b
    if cur:
        groups.append(cur)

    for stale in glob.glob(os.path.join(out_dir, "*.tmp-*")):
        try:
            os.remove(stale)
        except OSError:
            pass
    done_out = mf.resume_skip_ids(out_dir)
    todo = [
        {
            "new_pid": pk.pack(gi, 0),
            "src_pids": g,
            "decoded_bytes": sum(int(done_src[p]["input_bytes"]) for p in g),
        }
        for gi, g in enumerate(groups)
        if pk.pack(gi, 0) not in done_out
    ]

    writer = mf.ManifestWriter(out_dir)
    try:
        if todo:
            n_actors = _pool_size(concurrency, len(todo))
            todo = sorted(todo, key=lambda it: it["decoded_bytes"], reverse=True)
            ds = rd.from_items(todo, override_num_blocks=len(todo))
            results = ds.map_batches(
                GroupCompactor,
                fn_constructor_kwargs={"src_dir": src_dir, "out_dir": out_dir},
                batch_size=1,
                batch_format="pyarrow",
                concurrency=n_actors,
                num_cpus=ENCODER_NUM_CPUS,
            )
            for row in results.iter_rows():
                writer.append(json.loads(row["entry_json"]))
        meta = writer.finalize(
            src_meta["schema"],
            extra={
                "input_shards": src_meta.get("input_shards", []),
                "schema_ipc": src_meta.get("schema_ipc"),
                "compacted_from": os.path.abspath(src_dir),
            },
        )
    finally:
        writer.close()
    return meta


class PartitionDeleter:
    """Actor-pool stage for delete_job: one work item = one AFFECTED
    partition -> decode, drop the targeted keys, re-encode, and STAGE
    the result under a tmp name. Nothing destructive happens in the
    actor: the DRIVER journals each entry and only then replaces (or
    removes) the live file — so a kill at any point leaves a journal
    that is either consistent with the files or strictly behind them,
    and a re-run's key-plane probe heals the difference (see
    delete_job's crash-safety contract). The typed Arrow key set is
    built once per actor per key type (large retention key lists must
    not re-materialize per partition)."""

    def __init__(self, out_dir: str, keys_ref):
        import ray as _ray

        self.out_dir = out_dir
        self.keys = (
            _ray.get(keys_ref) if isinstance(keys_ref, _ray.ObjectRef) else keys_ref
        )
        self._vsets: dict = {}
        retain_heap()

    def _value_set(self, typ: pa.DataType) -> pa.Array:
        return _typed_value_set(self._vsets, self.keys, typ)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import uuid as _uuid

        import pyarrow.compute as pc

        entries = []
        for item in batch.to_pylist():
            pid = int(item["pid"])
            key_col = item["key_column"]
            path = os.path.join(self.out_dir, pk.part_file_name(pid))
            table = enc.decode_rows(pq.read_table(path, use_threads=False))
            col = table.column(key_col)
            keep = pc.invert(pc.is_in(col, value_set=self._value_set(col.type)))
            kept = table.filter(keep)
            if kept.num_rows == table.num_rows:
                continue  # planner false positive: nothing to rewrite
            dropped = table.num_rows - kept.num_rows
            rr = item.get("row_range")
            shard = item.get("input_shard") or f"delete:{self.out_dir}"
            prior_del = int(item.get("prior_deleted") or 0)
            if kept.num_rows == 0:
                # full drop: the DRIVER removes the file after journaling
                entry = {
                    "partition_id": pid,
                    "status": "deleted",
                    "input_shard": shard,
                    "n_rows": 0,
                    "codecs": {},
                    "input_bytes": 0,
                    "encoded_bytes": 0,
                    # every original row is now gone: span when known,
                    # else the running count
                    "deleted_rows": (
                        int(rr[1] - rr[0]) if rr is not None
                        else int(dropped) + prior_del
                    ),
                }
                if rr is not None:
                    entry["row_range"] = list(rr)
                staged = None
            else:
                encoded, entry = enc.encode_table(
                    kept,
                    pid,
                    input_shard=shard,
                    row_range=tuple(rr) if rr is not None else None,
                )
                # span-derived when the range is known: self-healing across
                # the journal-ahead crash window (a stale prior entry's
                # deleted_rows would double-count the re-dropped rows)
                entry["deleted_rows"] = (
                    int(rr[1] - rr[0]) - kept.num_rows
                    if rr is not None
                    else int(dropped) + prior_del
                )
                entry["rewritten_by"] = "delete"
                staged = path + f".tmp-delete-{_uuid.uuid4().hex[:8]}"
                pq.write_table(
                    encoded, staged, compression="none", write_statistics=False
                )
            entries.append(
                {"entry_json": json.dumps(entry), "staged": staged or ""}
            )
        return pa.Table.from_pylist(
            entries,
            schema=pa.schema([("entry_json", pa.string()), ("staged", pa.string())]),
        )


def delete_job(
    out_dir: str,
    keys,
    *,
    key_column: str | None = None,
    concurrency: int | tuple[int, int] | None = None,
) -> dict:
    """Delete rows by key from an encoded dir IN PLACE — the data-subject
    erasure / retention operator the ingest->append->compact lifecycle
    needs. Partition-granular: a distributed KEY-PLANE scan (decoding
    ONLY the key column of every partition) finds the affected
    partitions; each one decodes, drops its targeted rows, re-encodes
    and STAGES the result; the driver then journals the updated entry
    and swaps the staged file in (or removes the file, for a fully
    emptied partition). Entries keep their ORIGINAL input_shard and
    row_range plus a ``deleted_rows`` count, so lineage validation
    still tiles every shard (validate_entries understands the
    deletion); the manifest re-finalizes, so counts/rollups/stat
    pushdown reflect the erasure.

    Crash-safety contract (every window heals on a SAME-KEYS re-run,
    and the in-progress marker makes any OTHER delete refuse until that
    re-run happened — the journal-ahead rewrite window is only
    detectable by re-finding the original keys):
    - kill before a journal append: the live file is untouched (staged
      tmps are swept at start); the re-run's probe finds the keys again
      and redoes the partition;
    - kill between a journal append and the file swap: the journal is
      AHEAD of the file; the re-run's probe still finds the keys in the
      live file (rewrite case — deleted_rows is span-derived, so the
      re-drop cannot double-count) or the start-of-run sweep removes
      the file of a 'deleted'-journaled partition, converging both;
    - kill before finalize: the re-run re-finalizes from the journal
      and clears the marker.
    Idempotent: re-running with the same keys scans to zero hits.

    Stated consequences: verify_job against the ORIGINAL inputs reports
    the deleted rows as mismatches — deletion rewrites history by
    design; and deletion is TERMINAL for resume (manifest
    resume_skip_ids), so a later encode/compact re-run over this dir
    can never resurrect the erased rows from its inputs.

    Scale shape: keys broadcast once (ray.put) and typed once per actor;
    the scan is column-pruned to the key plane; only affected partitions
    pay a rewrite. Driver state is O(partitions + affected)."""
    import ray as _ray

    keys = list(keys)
    if not keys:
        raise ValueError("delete_job: empty key list")
    meta0 = mf.load_metadata(out_dir)
    cfg = mf.load_job_config(out_dir) or {}
    if cfg.get("mode") not in (None, "lineage"):
        raise ValueError(
            f"delete_job supports lineage-mode dirs only; {out_dir} is "
            f"{cfg.get('mode')!r}-mode"
        )
    schema = mf.schema_from_b64(meta0["schema_ipc"])
    key_col = key_column or schema.names[0]
    if key_col not in schema.names:
        raise ValueError(f"{key_col!r} not in schema {schema.names}")
    # interrupted-delete marker: the journal-ahead REWRITE window only
    # heals on a SAME-KEYS re-run (the probe must find the original keys
    # again); a different delete would finalize a manifest inconsistent
    # with a half-swapped file. The marker makes that loud: it is written
    # before any destructive step and removed only after finalize, and a
    # run with DIFFERENT keys refuses while it exists.
    import hashlib as _hashlib

    keys_sha = _hashlib.sha256(
        "\n".join(sorted(str(k) for k in keys)).encode()
    ).hexdigest()[:16]
    marker = os.path.join(out_dir, "_DELETE_INPROGRESS.json")
    if os.path.exists(marker):
        with open(marker) as f:
            rec = json.load(f)
        if rec.get("keys_sha") != keys_sha:
            raise ValueError(
                f"{out_dir}: a previous delete_job (keys_sha="
                f"{rec.get('keys_sha')}) was interrupted before finalize — "
                "re-run THAT delete to convergence first (only a same-keys "
                "re-run heals its rewrite windows), then retry this one"
            )
    else:
        fsio.publish_bytes(json.dumps({"keys_sha": keys_sha}).encode(), marker)
    # heal a killed prior delete: sweep staged tmps, and remove the live
    # file of any partition whose LATEST journal entry says 'deleted'
    # (the journal-ahead-of-files window)
    for stale in glob.glob(os.path.join(out_dir, "*.tmp-*")):
        try:
            os.remove(stale)
        except OSError:
            pass
    all_entries = mf.load_entries(out_dir)
    for pid, e in all_entries.items():
        if e.get("status") == "deleted":
            try:
                os.remove(os.path.join(out_dir, pk.part_file_name(pid)))
            except FileNotFoundError:
                pass
    keys_ref = _ray.put(keys)
    # the scan list derives from the ALREADY-loaded journal (one parse):
    # done + file-exists, never 'deleted' pids
    pids = sorted(
        p
        for p, e in all_entries.items()
        if e.get("status") == "done"
        and os.path.exists(os.path.join(out_dir, pk.part_file_name(p)))
    )

    # pass 1: column-pruned key-plane scan -> affected partition ids
    def probe(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        hits = []
        kset = _ray.get(keys_ref)
        vsets: dict = {}
        for item in batch.to_pylist():
            path = os.path.join(out_dir, pk.part_file_name(int(item["pid"])))
            t = enc.decode_rows(
                pq.read_table(path, use_threads=False), columns=[key_col]
            )
            col = t.column(key_col)
            vs = _typed_value_set(vsets, kset, col.type)
            if pc.any(pc.is_in(col, value_set=vs)).as_py():
                hits.append({"pid": int(item["pid"])})
        return pa.Table.from_pylist(
            hits, schema=pa.schema([("pid", pa.int64())])
        )

    items = [{"pid": p} for p in pids]
    affected = [
        int(r["pid"])
        for r in rd.from_items(items, override_num_blocks=max(len(items), 1))
        .map_batches(probe, batch_format="pyarrow", batch_size=8, num_cpus=1)
        .take_all()
    ]

    writer = mf.ManifestWriter(out_dir)
    try:
        if affected:
            work = [
                {
                    "pid": p,
                    "key_column": key_col,
                    "row_range": all_entries.get(p, {}).get("row_range"),
                    "input_shard": all_entries.get(p, {}).get("input_shard"),
                    "prior_deleted": all_entries.get(p, {}).get("deleted_rows", 0),
                }
                for p in affected
            ]
            results = rd.from_items(
                work, override_num_blocks=len(work)
            ).map_batches(
                PartitionDeleter,
                fn_constructor_kwargs={"out_dir": out_dir, "keys_ref": keys_ref},
                batch_size=1,
                batch_format="pyarrow",
                concurrency=_pool_size(concurrency, len(work)),
                num_cpus=ENCODER_NUM_CPUS,
            )
            # journal FIRST, then make the destructive move — the window
            # between the two is the journal-ahead state the next run's
            # start-of-run sweep converges
            for row in results.iter_rows():
                entry = json.loads(row["entry_json"])
                writer.append(entry)
                final = os.path.join(
                    out_dir, pk.part_file_name(entry["partition_id"])
                )
                if row["staged"]:
                    os.replace(row["staged"], final)
                else:
                    try:
                        os.remove(final)
                    except FileNotFoundError:
                        pass
        meta = writer.finalize(
            meta0["schema"],
            extra={
                "input_shards": meta0.get("input_shards", []),
                "schema_ipc": meta0.get("schema_ipc"),
            },
        )
        os.remove(marker)  # the delete is now journal- AND file-consistent
    finally:
        writer.close()
    return meta
