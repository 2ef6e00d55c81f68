"""Per-row-adaptive list-child codec: frame-of-reference at ROW granularity.

The engine's coded unit is a partition, but token sequences have per-ROW
structure a partition-wide codec can't see: one row draws from a narrow id
band, the next is a run stream, the next a small per-document alphabet
(the reference re-encodes each TILE with its own scale/offset for the same
reason — /root/reference/src/band_encoder.cpp:48-145; our rows are the
tile analogue inside a partition). ``for_rows``:

  1. per-row min/max over the child plane (one ``np.minimum.reduceat``
     pass using the list offsets; empty rows excluded),
  2. per-row FOR: residual = value - row_base (modular at plane width),
  3. rows are bucketed by residual byte width w ∈ {0, 1, 2, 4, 8}
     (w=0: constant/empty rows — zero payload bytes),
  4. each bucket's residuals are gathered into one contiguous stream at
     its native width and coded with ``for_bss`` (byte-stream-split +
     zstd), so narrow rows cost 1 byte/token instead of the partition-wide
     width and run rows collapse inside zstd,
  5. the per-row bases (one plane) and width codes (uint8, RLE-friendly)
     are coded with the regular plane codecs.

Measured on the F1 token mixture: 6-7 % smaller than partition-wide
``for_bss`` at comparable encode speed. Everything is vectorized
(reduceat / repeat / boolean gathers); decode needs the row lengths,
which the enclosing list codec already stores, so the descriptor is only
valid as a list child — ``blockcodec.decode_list`` dispatches it.

Round-trip is bit-exact for every input (property-tested alongside the
plane codecs).
"""

from __future__ import annotations

import numpy as np

from . import intcodec

_WIDTH_OF_CODE = {1: 1, 2: 2, 3: 4, 4: 8}
_CODE_OF_WIDTH = {1: 1, 2: 2, 4: 3, 8: 4}
_NP_OF_WIDTH = {1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint64}


def row_ranges(plane: np.ndarray, offsets: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-row (base bit pattern, modular range) in one reduceat pass.

    ``offsets`` has len(rows)+1 entries over the flattened child. Empty
    rows get base=0, range=0. reduceat runs over the starts of NON-empty
    rows only: the segment from one non-empty start to the next spans
    exactly that row (interleaved empty rows contribute no elements)."""
    lengths = np.diff(offsets)
    rows = len(lengths)
    bases = np.zeros(rows, dtype=plane.dtype)
    ranges = np.zeros(rows, dtype=plane.dtype)
    ne = lengths > 0
    if ne.any():
        starts = offsets[:-1][ne]
        mins = np.minimum.reduceat(plane, starts)
        maxs = np.maximum.reduceat(plane, starts)
        bases[ne] = mins
        ranges[ne] = maxs - mins  # modular diff == true unsigned magnitude
    return bases, ranges


def encode_child(
    plane: np.ndarray, offsets: np.ndarray, signed: bool
) -> tuple[list[bytes], dict]:
    """Encode a list child plane with per-row FOR + width buckets.

    ``signed`` orders the per-row min/max on the logical values (the same
    rule as :func:`intcodec.for_minmax`); residual arithmetic is modular
    in the plane width so the bit patterns round-trip exactly."""
    lengths = np.diff(offsets).astype(np.int64)
    n = len(plane)
    rows = len(lengths)
    view = plane.view(intcodec._SIGNED_OF_WIDTH[plane.dtype.itemsize]) if signed else plane
    bases_v, _ = row_ranges(view, offsets)
    bases = bases_v.view(plane.dtype) if signed else bases_v
    # ranges must be computed on the UNSIGNED modular residual magnitude:
    # (pattern - base_pattern) mod 2^(8w) — recompute from the plane
    resid = plane - np.repeat(bases, lengths)
    _, ranges = row_ranges(resid, offsets)

    codes = np.zeros(rows, dtype=np.uint8)
    codes[ranges > 0] = 1
    if plane.dtype.itemsize > 1:
        codes[ranges > 0xFF] = 2
    if plane.dtype.itemsize > 2:
        codes[ranges > 0xFFFF] = 3
    if plane.dtype.itemsize > 4:
        codes[ranges > 0xFFFFFFFF] = 4

    wtok = np.repeat(codes, lengths)
    sections: list[bytes] = []
    buckets: list[dict] = []
    for code in (1, 2, 3, 4):
        mask = wtok == code
        cnt = int(mask.sum())
        if cnt == 0:
            continue
        w = _WIDTH_OF_CODE[code]
        sub = resid[mask].astype(_NP_OF_WIDTH[w])  # values < 2^(8w): exact
        blob, bdesc = intcodec.encode_plane(sub, "for_bss", False)
        sections.append(blob)
        buckets.append({"code": code, "plane": bdesc})

    bases_blob, bases_desc = intcodec.encode_plane(bases, "for_bss", signed)
    # width codes: tiny, heavily repetitive when row classes cluster
    runs = len(intcodec.run_starts(codes))
    wc_codec = "rle" if runs * 4 < rows else "for_bitpack"
    codes_blob, codes_desc = intcodec.encode_plane(codes, wc_codec, False)

    desc = {
        "codec": "for_rows",
        "n": n,
        "rows": rows,
        "pw": plane.dtype.itemsize,
        "bases": bases_desc,
        "wcodes": codes_desc,
        "buckets": buckets,
        "sections": [len(bases_blob), len(codes_blob)] + [len(s) for s in sections],
    }
    return [bases_blob, codes_blob] + sections, desc


def decode_child(blob: bytes, desc: dict, lengths: np.ndarray) -> np.ndarray:
    """Inverse of :func:`encode_child`; needs the row lengths the list
    codec stores alongside."""
    dt = np.dtype(intcodec._BYTE_WIDTH_DTYPE[desc["pw"]])
    n = desc["n"]
    secs = desc["sections"]
    off = 0
    bases = intcodec.decode_plane(blob[off : off + secs[0]], desc["bases"]).view(dt)
    off += secs[0]
    codes = intcodec.decode_plane(blob[off : off + secs[1]], desc["wcodes"]).astype(np.uint8)
    off += secs[1]

    lengths = np.asarray(lengths, dtype=np.int64)
    wtok = np.repeat(codes, lengths)
    resid = np.zeros(n, dtype=dt)
    for i, b in enumerate(desc["buckets"]):
        size = secs[2 + i]
        sub = intcodec.decode_plane(blob[off : off + size], b["plane"])
        off += size
        resid[wtok == b["code"]] = sub.astype(dt)
    return resid + np.repeat(bases, lengths)
