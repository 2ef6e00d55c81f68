"""Checkpoint manifest: per-partition lineage records + final metadata.

The reference stores one self-describing JSON metadata row at block=0,
written exactly once after all tiles finish
(/root/reference/src/read_raster.cpp:1486-1590 phase-3 CAS;
raquet_metadata.hpp:386-506 to_json). Ray Data has no cheap "one special
row" idiom, and an in-band row is not resumable — so our metadata is a
*sidecar*: an append-only ``manifest.jsonl`` of per-partition lineage rows
(written as each partition completes) plus a final ``manifest.json``
(the block=0 analogue) written by the driver after the barrier.

Resume = skip every partition_id already recorded 'done' (a driver-side set
membership check; no shuffle — SURVEY.md §2.7). Partition output files are
written tmp -> rename, so a crash leaves either nothing or a complete file
that the manifest may or may not reference; re-encoding an orphan file is
idempotent because codec choice is a pure function of partition contents
(planner.py) and the file name is a pure function of the partition id.

Validator mirrors raquet_validate_metadata
(/root/reference/src/metadata/raquet_metadata.cpp:16-133): structural
errors vs warnings, returned as a dict.
"""

from __future__ import annotations

import json
import os
import time

from ..functions import partition_keys as pk

MANIFEST_JSONL = "manifest.jsonl"
MANIFEST_JSON = "manifest.json"

FORMAT_VERSION = "0.1.0"

KNOWN_CODECS = {"for_bitpack", "for_bss", "rle", "dict", "plain", "general", "fsst", "list"}

REQUIRED_ENTRY_FIELDS = (
    "partition_id",
    "input_shard",
    "n_rows",
    "codecs",
    "input_bytes",
    "encoded_bytes",
    "status",
)


class ManifestWriter:
    """Append-only JSONL writer (driver-side single writer: encoder results
    stream back through the Dataset and the driver appends in completion
    order; ids are deterministic so order never matters)."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, MANIFEST_JSONL)
        self._fh = open(self.path, "a", encoding="utf-8")

    def append(self, entry: dict) -> None:
        self._fh.write(json.dumps(entry, sort_keys=True) + "\n")
        self._fh.flush()
        os.fsync(self._fh.fileno())

    def close(self) -> None:
        self._fh.close()

    def finalize(self, schema_str: str, extra: dict | None = None) -> dict:
        """Write the final manifest.json — the block=0 metadata analogue."""
        self._fh.flush()
        entries = load_entries(self.out_dir)
        done = [e for e in entries.values() if e.get("status") == "done"]
        meta = {
            "format_version": FORMAT_VERSION,
            "schema": schema_str,
            "num_partitions": len(done),
            "num_rows": sum(e["n_rows"] for e in done),
            "input_bytes": sum(e["input_bytes"] for e in done),
            "encoded_bytes": sum(e["encoded_bytes"] for e in done),
            "partition_ids": sorted(e["partition_id"] for e in done),
            "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        if extra:
            meta.update(extra)
        tmp = os.path.join(self.out_dir, MANIFEST_JSON + ".tmp")
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(meta, fh, indent=1, sort_keys=True)
        os.replace(tmp, os.path.join(self.out_dir, MANIFEST_JSON))
        return meta


def load_entries(out_dir: str) -> dict[int, dict]:
    """Read manifest.jsonl -> {partition_id: latest entry}. Tolerates a
    truncated final line (crash mid-append)."""
    path = os.path.join(out_dir, MANIFEST_JSONL)
    entries: dict[int, dict] = {}
    if not os.path.exists(path):
        return entries
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue  # torn tail write
            entries[e["partition_id"]] = e
    return entries


def done_partition_ids(out_dir: str) -> set[int]:
    """Partition ids safe to skip on resume: recorded done AND the output
    file actually exists."""

    done = set()
    for pid, e in load_entries(out_dir).items():
        if e.get("status") == "done":
            if os.path.exists(os.path.join(out_dir, pk.part_file_name(pid))):
                done.add(pid)
    return done


def load_metadata(out_dir: str) -> dict:
    """Read the finalized manifest.json (read_raquet_metadata analogue,
    /root/reference/src/raquet_extension.cpp:89-100)."""
    with open(os.path.join(out_dir, MANIFEST_JSON), encoding="utf-8") as fh:
        return json.load(fh)


def stats_passthrough(out_dir: str) -> list[dict]:
    """Per-partition stats straight from the manifest — no blob is decoded
    (the reference's precomputed-stats fast path: ST_RasterSummaryStats'
    passthrough overload skips decompression entirely when stats columns
    exist, /root/reference/src/st_raster_stats.cpp:351-402)."""
    out = []
    entries = load_entries(out_dir)
    for pid in sorted(entries):
        e = entries[pid]
        if e.get("status") != "done":
            continue
        row = {"partition_id": pid, "n_rows": e["n_rows"]}
        for col, s in (e.get("stats") or {}).items():
            for k, v in s.items():
                row[f"{col}_{k}"] = v
        out.append(row)
    return out


def totals_passthrough(out_dir: str, column: str = "tokens") -> dict:
    """Corpus-level totals for one column folded from manifest stats —
    an O(partitions) driver-side reduce, zero data reads."""
    entries = [e for e in load_entries(out_dir).values() if e.get("status") == "done"]
    stats = [e["stats"][column] for e in entries if column in (e.get("stats") or {})]
    nonempty = [s for s in stats if s["count"]]
    return {
        "total_rows": sum(e["n_rows"] for e in entries),
        "total_values": sum(s["count"] for s in stats),
        "values_sum": sum(s["sum"] for s in stats),
        "values_min": min((s["min"] for s in nonempty), default=None),
        "values_max": max((s["max"] for s in nonempty), default=None),
    }


def prune_partitions(out_dir: str, column: str, lo=None, hi=None) -> list[int]:
    """Zone-map pruning: partition ids that MAY contain values of
    ``column`` within [lo, hi], decided from manifest stats alone — the
    reference's sorted-block + row-group min/max pruning
    (/root/reference/CLAUDE.md:44, raquet_extension.cpp:49-81) with the
    manifest as the zone map. Partitions lacking stats are kept
    (pruning must never lose data); callers apply the residual row filter
    after decode."""
    keep: list[int] = []
    for pid, e in sorted(load_entries(out_dir).items()):
        if e.get("status") != "done":
            continue
        s = (e.get("stats") or {}).get(column)
        if not s or s.get("count", 0) == 0 or s.get("min") is None:
            keep.append(pid)
            continue
        if lo is not None and s["max"] < lo:
            continue
        if hi is not None and s["min"] > hi:
            continue
        keep.append(pid)
    return keep


def validate_entries(entries: list[dict]) -> dict:
    """Structural validation -> {is_valid, errors, warnings, num_partitions,
    num_rows} (raquet_validate_metadata analogue)."""
    errors: list[str] = []
    warnings: list[str] = []
    seen: set[int] = set()
    num_rows = 0
    for i, e in enumerate(entries):
        for f in REQUIRED_ENTRY_FIELDS:
            if f not in e:
                errors.append(f"entry {i}: missing required field {f!r}")
        pid = e.get("partition_id")
        if pid is not None:
            if pid in seen:
                errors.append(f"entry {i}: duplicate partition_id {pid}")
            seen.add(pid)
        codecs = e.get("codecs", {})
        for col, choice in codecs.items():
            name = choice["codec"] if isinstance(choice, dict) else choice
            # unwrap nested list<...> summaries (e.g. "list<for_bss>")
            while isinstance(name, str) and name.startswith("list<") and name.endswith(">"):
                name = name[5:-1]
            if name not in KNOWN_CODECS:
                errors.append(f"entry {i}: unknown codec {name!r} for column {col!r}")
        n = e.get("n_rows")
        rr = e.get("row_range")
        if n is not None and rr is not None and rr[1] - rr[0] != n:
            errors.append(f"entry {i}: n_rows {n} != row_range span {rr}")
        if n is not None:
            num_rows += n
        if "checksum" not in e:
            warnings.append(f"entry {i}: missing checksum")
        if "fsst_symbol_table_hash" not in e:
            warnings.append(f"entry {i}: missing fsst_symbol_table_hash")
    return {
        "is_valid": not errors,
        "errors": errors,
        "warnings": warnings,
        "num_partitions": len(entries),
        "num_rows": num_rows,
    }
