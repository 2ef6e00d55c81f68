"""Small shared helpers."""

from __future__ import annotations


def strip_schema_metadata(batch):
    """Drop Arrow schema-level metadata (zero-copy). Parquet written by
    pandas carries a b'pandas' metadata blob; a schema with metadata is
    UNHASHABLE (its hash includes a dict), so every downstream Ray block
    concat logs "Failed to hash the schemas (for deduplication)" and
    loses the schema-dedup fast path. Stages whose output derives from an
    externally-read batch (append_column preserves metadata) call this
    once on entry."""
    return batch.replace_schema_metadata(None) if batch.schema.metadata else batch


def clean_dataset(ds):
    """Insert a zero-copy whole-block metadata strip after an external
    read. Needed where a downstream stage sets an explicit batch_size:
    Ray's batch slicer then CONCATENATES raw read blocks BEFORE the stage
    fn runs, and pandas-written parquet blocks carry the unhashable
    b'pandas' schema metadata — per-stage strips can't reach that concat.
    batch_size=None keeps it per-block (no slicing, no copy); Ray fuses
    the stage into the consumer."""
    return ds.map_batches(strip_schema_metadata, batch_format="pyarrow", batch_size=None)


def mod_split(b, *, key_col: str = "doc_id", mod: int, rem: int, keep: bool):
    """Vectorized `key % mod == rem` row split (pa.Table -> pa.Table) —
    the deterministic benchmark/train carve used by the bloom queries.
    Lives in the package (registered pickle-by-value) so shipping it to
    workers never depends on the driver module being importable there."""
    import pyarrow as pa

    m = (b.column(key_col).to_numpy(zero_copy_only=False) % mod) == rem
    return b.filter(pa.array(m if keep else ~m))


DEFAULT_BUCKET_TARGET_BYTES = 32 << 20


def _plan_size_bytes(ds) -> int | None:
    """Best-known byte size of a Dataset from plan METADATA only (never
    triggers execution). Map operators discard size_bytes (output size is
    unknowable pre-execution), so a `read_parquet -> map_batches` chain
    reports None at the tip; walk up the input dependencies to the
    nearest operator with a known size — for sizing shuffle fan-out the
    INPUT byte count is the right proxy anyway."""
    try:
        frontier = [ds._logical_plan.dag]
    except Exception:
        return None
    seen = 0
    while frontier and seen < 64:
        node = frontier.pop(0)
        seen += 1
        try:
            sz = node.infer_metadata().size_bytes
        except Exception:
            sz = None
        if sz:
            return int(sz)
        frontier.extend(getattr(node, "input_dependencies", []) or [])
    return None


def scaled_buckets(
    ds,
    *,
    bytes_per_bucket: int = DEFAULT_BUCKET_TARGET_BYTES,
    lo: int = 32,
    cap: int = 4093,
    fallback: int = 256,
) -> int:
    """Corpus-scaled shuffle fan-out: ceil(input_bytes / bytes_per_bucket)
    clamped to [lo, cap] (the encode_grouped ceil(work/target) discipline).
    A FIXED fan-out makes per-bucket payload O(corpus / constant) — tens
    of GB per in-memory reduce task at 100 TB; scaling the bucket count
    with input size keeps each reduce task ~bytes_per_bucket at any scale.

    The cap is deliberately NOT a power of two, and a computed n landing
    on a power of two is nudged off it — callers whose bucket keys carry
    structure in the low bits additionally pre-mix with detmix.splitmix64
    before the modulus (see encode_grouped.py's write_pieces).

    `ds` is a Ray Dataset (size read from plan METADATA only — never
    triggers execution; unknown sizes use `fallback`, the historical
    constant) or a plain int byte count."""
    if isinstance(ds, int):
        nbytes = ds
    else:
        nbytes = _plan_size_bytes(ds)
    if not nbytes or nbytes <= 0:
        n = fallback
    else:
        n = max(lo, min(cap, -(-int(nbytes) // bytes_per_bucket)))
    if n > 1 and n & (n - 1) == 0:
        # keep low-entropy keys from collapsing on a 2^k modulus; nudge
        # DOWN when at the caller's cap (n+1 would exceed the contract)
        n = n - 1 if n >= cap else n + 1
    return int(n)


_HEAP_RETAINED_PID: int | None = None


def retain_heap() -> None:
    """Make a long-lived worker keep freed memory mapped, for both
    allocators in play:

    - glibc malloc (numpy temporaries): allocations over ~128 KB default
      to mmap and are munmapped on free, so every task re-faults its large
      planes (~15 ms per 50 MB warm; under 32-way concurrency the kernel
      serializes fault handling and this dominates wall time — measured as
      in-actor task times 2-8x the same work in a warm single process).
      Raising M_MMAP_THRESHOLD/M_TRIM_THRESHOLD keeps big blocks on the
      brk heap and reusable: the 50 MB alloc+touch drops to ~0.1 ms.
    - pyarrow buffers: route Arrow allocations through the SYSTEM (glibc)
      pool so the mallopt retention above covers them too. pyarrow's
      default jemalloc pool keeps purging even with decay disabled
      (measured: an identical 28 MB parquet read re-faults ~100 MB of
      fresh pages EVERY call under jemalloc decay=-1; under the system
      pool it drops to ~10 MB once warm — 2026-08-19, full task fault
      traffic 1.8 GB/task -> ~0.5 GB). On lazily-backed sandbox VMs a
      first-touch fault costs ~100x a warm one AND the host serializes
      fault handling across processes, so per-task fault bytes are the
      non-scaling term in the 2->8 cpu pair. jemalloc decay is still
      disabled as a fallback for buffers allocated before this runs.

    Call from every actor-pool ``__init__`` (or hot task fn) whose tasks
    move partition-sized arrays; idempotent and ~free when repeated."""
    # pid-keyed, not a bool: the flag travels INTO workers when the module
    # ships by value (see codecs/scratch.py on by-value module state), and
    # a driver-set True must not make a fresh worker skip the mallopt
    import os

    global _HEAP_RETAINED_PID
    if _HEAP_RETAINED_PID == os.getpid():
        return
    _HEAP_RETAINED_PID = os.getpid()
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD
    except Exception:
        pass  # non-glibc platform
    try:
        import pyarrow as pa

        pa.set_memory_pool(pa.system_memory_pool())
    except Exception:
        pass
    try:
        import pyarrow as pa

        pa.jemalloc_set_decay_ms(-1)
    except Exception:
        pass  # non-jemalloc arrow builds


def default_concurrency(cap: int | None = None) -> int:
    """Actor-pool size default: the cluster's CPU count (map_batches with a
    callable class requires explicit concurrency in Ray 2.49)."""
    import ray

    try:
        n = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        n = 0
    if n <= 0:
        import os

        n = os.cpu_count() or 4
    if cap is None:
        return n
    return max(1, min(n, cap))
