"""Per-process grow-only scratch buffers for codec temporaries.

Why this exists: the encode kernel is not compute-bound, it is PAGE-FAULT
bound at high parallelism. Encoding one 50 MB partition allocates ~500 MB
of large numpy temporaries; every allocation that size is an mmap that is
munmap'd on free, so the next partition re-faults every page. Measured on
the 32-vCPU sandbox (Firecracker, lazily-backed memory): per-task system
time 0.37 s at 8 concurrent encoders but 2.6 s at 32 — fault handling
serializes host-side and gets ~7x slower per fault under concurrency,
pinning aggregate encode throughput regardless of core count. glibc
malloc tunables (MALLOC_MMAP_THRESHOLD_/MALLOC_TRIM_THRESHOLD_) measurably
did NOT fix it (numpy/arrow large blocks bypass the tuned arena).

The fix is to stop allocating: encoder actors live for the whole job, so
codec kernels draw their big temporaries from this module's per-process
pool — named, grow-only buffers that fault once per actor and are reused
for every subsequent partition. This is the same reasoning as the
reference's per-thread lazily-initialized scratch state
(/root/reference/src/read_raster.cpp:264-286), applied to numpy.

Contract: a buffer named `tag` is INVALIDATED by the next `buf()`/`arr()`
call with the same tag — callers must finish with (or copy out of) a
scratch array before re-requesting its tag, and must never return scratch
views to callers outside the codec. Plain module dict on purpose:
functools caches pickle by reference and would break cloudpickle by-value
shipping to Ray workers.
"""

from __future__ import annotations

import os

import numpy as np


class _Pool(dict):
    """Buffer pool that PICKLES AS EMPTY. This module ships to Ray workers
    by value (cloudpickle), and a plain module-level dict would be
    serialized WITH its contents: every UDF pickle would drag the driver's
    scratch buffers along (100s of MB of task payload), and the unpickled
    arrays arrive backed by read-only pickle buffers — `out[:] = 0` then
    raises 'assignment destination is read-only' in the worker (observed
    live via point_lookup populating the driver pool before a later query
    pickled its UDFs)."""

    def __reduce__(self):
        return (_Pool, ())


_BUFS: dict[str, np.ndarray] = _Pool()
_OWNER_PID = os.getpid()

# growth headroom: avoids a re-fault cascade when partition sizes creep up
_SLACK = 1.25


def buf(tag: str, nbytes: int) -> np.ndarray:
    """uint8 scratch array of exactly `nbytes` (view of a pooled backing)."""
    global _OWNER_PID
    if _OWNER_PID != os.getpid():  # forked child: drop inherited buffers
        _BUFS.clear()
        _OWNER_PID = os.getpid()
    backing = _BUFS.get(tag)
    if backing is None or backing.nbytes < nbytes or not backing.flags.writeable:
        backing = np.empty(int(nbytes * _SLACK) + 64, dtype=np.uint8)
        _BUFS[tag] = backing
    return backing[:nbytes]


def arr(tag: str, n: int, dtype) -> np.ndarray:
    """Scratch array of n elements of `dtype` (uninitialized)."""
    dtype = np.dtype(dtype)
    return buf(tag, int(n) * dtype.itemsize).view(dtype)


def clear() -> None:
    """Release all pooled buffers (tests / memory-pressure hook)."""
    _BUFS.clear()
