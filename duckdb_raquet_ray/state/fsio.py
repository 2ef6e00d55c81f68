"""Filesystem abstraction for partition/manifest output — the cloud path.

The engine's resumability rests on one invariant: a partition file is
either ABSENT or COMPLETE, never half-written (resume decides what to
re-encode by "does a valid file exist"). Locally that is tmp→`os.replace`.
Object stores (S3/GCS) have no rename — but they don't need one: a
multipart PUT is invisible until completed, so a plain streamed write
through `pyarrow.fs` already has the absent-or-complete property; the
reference leans on the same store semantics for its GCS path
(/root/reference/docs/PERFORMANCE_COMPARISON.md cloud-native reads).

`publish_table` / `publish_bytes` route every output through this module:

  LocalFileSystem         -> write `<path>.tmp-<pid>-<uuid>`, fsync-free rename
  any other pyarrow fs    -> direct `open_output_stream` (atomic-on-close
                             by store semantics; aborted uploads never
                             become visible objects)

Paths are resolved with `pyarrow.fs.FileSystem.from_uri`, so an out_dir of
`s3://bucket/prefix` flows through the SAME code as `/tmp/enc` — the only
local-only remnant is the manifest journal's append mode, which
`ManifestWriter` documents (a cloud deployment ships entries back through
the driver fold, which this engine already does — the journal is a
driver-side file).

The sandbox has no object store; LocalFileSystem is what tests exercise,
plus a SubTreeFileSystem-wrapped run that takes the non-rename branch
end-to-end (tests/test_fsio.py).
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
from pyarrow import fs as pafs


def resolve(path: str) -> tuple[pafs.FileSystem, str]:
    """URI or plain path -> (filesystem, fs-relative path)."""
    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def _is_local(filesystem: pafs.FileSystem) -> bool:
    fsys = filesystem
    # unwrap SubTreeFileSystem? No: a subtree wrapper hides the base path
    # needed for rename, so it intentionally takes the object-store branch.
    return isinstance(fsys, pafs.LocalFileSystem)


def publish_bytes(data: bytes, path: str, filesystem: pafs.FileSystem | None = None) -> None:
    """Write `data` so the object at `path` is absent-or-complete."""
    fsys, p = (filesystem, path) if filesystem is not None else resolve(path)
    if _is_local(fsys):
        # pid alone collides across NODES (containerized workers commonly
        # share pid numbers on a shared filesystem) — a uuid component keeps
        # two retried writers of the same partition from interleaving one
        # tmp file and renaming corrupt bytes into place
        tmp = p + f".tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, p)
        return
    with fsys.open_output_stream(p) as f:  # atomic-on-close upload
        f.write(data)


def publish_table(
    table: pa.Table,
    path: str,
    filesystem: pafs.FileSystem | None = None,
    **write_kwargs,
) -> None:
    """Write a Parquet file so the object at `path` is absent-or-complete."""
    fsys, p = (filesystem, path) if filesystem is not None else resolve(path)
    if _is_local(fsys):
        # pid alone collides across NODES (containerized workers commonly
        # share pid numbers on a shared filesystem) — a uuid component keeps
        # two retried writers of the same partition from interleaving one
        # tmp file and renaming corrupt bytes into place
        tmp = p + f".tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        pq.write_table(table, tmp, **write_kwargs)
        os.replace(tmp, p)
        return
    with fsys.open_output_stream(p) as f:
        pq.write_table(table, f, **write_kwargs)


def exists(path: str, filesystem: pafs.FileSystem | None = None) -> bool:
    fsys, p = (filesystem, path) if filesystem is not None else resolve(path)
    return fsys.get_file_info(p).type != pafs.FileType.NotFound


def makedirs(path: str, filesystem: pafs.FileSystem | None = None) -> None:
    fsys, p = (filesystem, path) if filesystem is not None else resolve(path)
    fsys.create_dir(p, recursive=True)
