"""Codec-kernel micro-fixtures with arithmetic goldens + round-trip properties.

Mirrors the reference test strategy (SURVEY.md §5; fixtures from FIXTURES.md
F2): hand-crafted inputs with hand-checkable encodings, then seeded random
round-trip properties per codec x dtype x edge case.
"""

import numpy as np
import pytest

from duckdb_raquet_ray.codecs import fsst, general, intcodec, rowcodec

U64 = np.uint64


class TestBitpack:
    def test_ramp_width4(self):
        # F2 "ramp": [100..115] -> FOR base=100, width=4 bits
        vals = np.arange(100, 116, dtype=np.int64).view(U64)
        blob, desc = intcodec.encode_plane(vals, "for_bitpack", True)
        assert desc["base"] == 100
        assert desc["width"] == 4
        assert len(blob) == 16 * 4 // 8
        out = intcodec.decode_plane(blob, desc)
        np.testing.assert_array_equal(out, vals)

    def test_const_width0(self):
        # F2 "const": [7]*16 -> width 0 after FOR, zero payload bytes
        vals = np.full(16, 7, dtype=np.uint64)
        blob, desc = intcodec.encode_plane(vals, "for_bitpack", False)
        assert desc["width"] == 0
        assert blob == b""
        np.testing.assert_array_equal(intcodec.decode_plane(blob, desc), vals)

    def test_negatives_modular(self):
        # F2 "negmax": int32 extremes survive the modular-FOR round trip
        raw = np.array([-(2**31), 2**31 - 1, 0, -1], dtype=np.int64)
        vals = raw.view(U64)
        blob, desc = intcodec.encode_plane(vals, "for_bitpack", True)
        assert desc["base"] == int(np.int64(-(2**31)).view(U64))
        out = intcodec.decode_plane(blob, desc)
        np.testing.assert_array_equal(out.view(np.int64), raw)

    def test_int64_full_range(self):
        raw = np.array([np.iinfo(np.int64).min, np.iinfo(np.int64).max, 0], dtype=np.int64)
        vals = raw.view(U64)
        blob, desc = intcodec.encode_plane(vals, "for_bitpack", True)
        out = intcodec.decode_plane(blob, desc)
        np.testing.assert_array_equal(out.view(np.int64), raw)

    def test_empty_and_single(self):
        for raw in ([], [42]):
            vals = np.array(raw, dtype=np.uint64)
            blob, desc = intcodec.encode_plane(vals, "for_bitpack", False)
            np.testing.assert_array_equal(intcodec.decode_plane(blob, desc), vals)


class TestRle:
    def test_runs_golden(self):
        # F2 "runs": [1,1,1,2,2,9,9,9,9] -> runs (1,3),(2,2),(9,4)
        vals = np.array([1, 1, 1, 2, 2, 9, 9, 9, 9], dtype=np.uint64)
        blob, desc = intcodec.encode_plane(vals, "rle", False)
        assert desc["runs"] == 3
        np.testing.assert_array_equal(intcodec.decode_plane(blob, desc), vals)

    def test_const_one_run(self):
        vals = np.full(1000, 7, dtype=np.uint64)
        blob, desc = intcodec.encode_plane(vals, "rle", False)
        assert desc["runs"] == 1
        assert len(blob) < 16
        np.testing.assert_array_equal(intcodec.decode_plane(blob, desc), vals)


class TestDict:
    def test_dict4_golden(self):
        # F2 "dict4": 64 values over {3,17,99,1000} -> card 4, 2-bit codes
        rng = np.random.default_rng(42)
        vals = rng.choice([3, 17, 99, 1000], size=64).astype(np.uint64)
        blob, desc = intcodec.encode_plane(vals, "dict", False)
        assert desc["card"] == 4
        assert desc["code_width"] == 2
        np.testing.assert_array_equal(intcodec.decode_plane(blob, desc), vals)


@pytest.mark.parametrize("codec", ["for_bitpack", "rle", "dict"])
@pytest.mark.parametrize("seed", range(8))
def test_plane_roundtrip_property(codec, seed):
    """decode(encode(x)) == x bit-exactly for seeded random planes."""
    rng = np.random.default_rng(seed)
    kind = seed % 4
    n = int(rng.integers(0, 5000))
    if kind == 0:
        raw = rng.integers(-(2**62), 2**62, size=n, dtype=np.int64)
        vals, signed = raw.view(U64), True
    elif kind == 1:
        vals, signed = rng.integers(0, 100, size=n, dtype=np.uint64), False
    elif kind == 2:
        vals, signed = np.repeat(rng.integers(0, 50, size=max(n // 10, 1), dtype=np.uint64), 10)[:n], False
    else:
        raw = rng.integers(-5, 5, size=n, dtype=np.int64)
        vals, signed = raw.view(U64), True
    blob, desc = intcodec.encode_plane(vals, codec, signed)
    np.testing.assert_array_equal(intcodec.decode_plane(blob, desc), vals)


class TestGeneral:
    def test_roundtrip(self):
        data = b"hello world " * 100
        for method in (["zstd"] if general.HAVE_ZSTD else []) + ["zlib", "none"]:
            z = general.compress(data, method)
            assert general.decompress(z, method, len(data)) == data
        assert general.HAVE_ZSTD  # pyarrow ships zstd in this environment


class TestFsst:
    def test_shared_prefix_compresses(self):
        # F2 "strings": shared-prefix doc-ids gain from the symbol table.
        # The vectorized aligned-pair encoder caps at ~2x (every matched
        # cell: 2 bytes -> 1 code) plus the serialized table — the
        # documented trade for a >100 MB/s/core encode.
        data = b"".join(f"web/doc-{i:012d}".encode() for i in range(500))
        blob, desc = fsst.encode_bytes(data)
        assert len(blob) < len(data) * 0.6
        assert fsst.decode_bytes(blob, desc) == data
        assert desc["table_hash"].startswith("sha256:")

    def test_roundtrip_arbitrary_bytes(self):
        rng = np.random.default_rng(7)
        for trial in range(6):
            n = int(rng.integers(0, 4000))
            data = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
            blob, desc = fsst.encode_bytes(data)
            assert fsst.decode_bytes(blob, desc) == data

    def test_roundtrip_ff_literals(self):
        data = b"\xff" * 37 + b"ab\xff\xffcd" + bytes(range(256))
        blob, desc = fsst.encode_bytes(data)
        assert fsst.decode_bytes(blob, desc) == data

    def test_empty(self):
        blob, desc = fsst.encode_bytes(b"")
        assert fsst.decode_bytes(blob, desc) == b""

    def test_deterministic(self):
        data = b"the quick brown fox " * 64
        b1, d1 = fsst.encode_bytes(data)
        b2, d2 = fsst.encode_bytes(data)
        assert b1 == b2 and d1["table_hash"] == d2["table_hash"]


class TestRowcodecDictBucket:
    """Partition-global dictionary bucket (row code 5): rows drawing from
    one shared alphabet must be dictionary-coded, beat the FOR-only
    encoding, and round-trip bit-exactly."""

    @staticmethod
    def _alphabet_plane(rows=400, row_len=64, card=64, seed=7):
        rng = np.random.default_rng(seed)
        alphabet = np.sort(rng.choice(50_000, size=card, replace=False)).astype(np.uint32)
        vals = alphabet[rng.integers(0, card, size=rows * row_len)]
        offsets = np.arange(rows + 1, dtype=np.int64) * row_len
        return vals, offsets, alphabet

    def test_dict_bucket_detected_and_smaller(self):
        plane, offsets, _ = self._alphabet_plane()
        secs, desc = rowcodec.encode_child(plane, offsets, signed=False)
        codes = [b["code"] for b in desc["buckets"]]
        assert rowcodec.DICT_CODE in codes
        secs_no, _ = rowcodec.encode_child(plane, offsets, signed=False, try_dict=False)
        assert sum(len(s) for s in secs) < 0.8 * sum(len(s) for s in secs_no)

    def test_dict_bucket_roundtrip_bitexact(self):
        plane, offsets, _ = self._alphabet_plane()
        secs, desc = rowcodec.encode_child(plane, offsets, signed=False)
        out = rowcodec.decode_child(b"".join(secs), desc, np.diff(offsets))
        np.testing.assert_array_equal(out, plane)

    def test_mixed_dict_and_for_rows_roundtrip(self):
        vals, offsets, alphabet = self._alphabet_plane(rows=100)
        rng = np.random.default_rng(11)
        # append narrow-band rows (w1) and wide random rows (w2, uncovered)
        extra = [rng.integers(1000, 1100, size=50).astype(np.uint32),
                 rng.integers(0, 50_000, size=50).astype(np.uint32)]
        plane = np.concatenate([vals] + extra)
        offs = np.concatenate([offsets, [offsets[-1] + 50, offsets[-1] + 100]])
        secs, desc = rowcodec.encode_child(plane, offs, signed=False)
        codes = {b["code"] for b in desc["buckets"]}
        assert rowcodec.DICT_CODE in codes and len(codes) >= 2
        out = rowcodec.decode_child(b"".join(secs), desc, np.diff(offs))
        np.testing.assert_array_equal(out, plane)

    def test_no_dict_on_uniform_values(self):
        rng = np.random.default_rng(3)
        plane = rng.integers(0, 50_000, size=40_000).astype(np.uint32)
        offsets = np.arange(0, 40_001, 100, dtype=np.int64)
        _, desc = rowcodec.encode_child(plane, offsets, signed=False)
        assert all(b["code"] != rowcodec.DICT_CODE for b in desc["buckets"])

    def test_signed_plane_patterns_roundtrip(self):
        # negative values have patterns >= 2^31: the dict gate must skip
        # them and the FOR path must still round-trip exactly
        vals = np.array([-5, -1, -3] * 500, dtype=np.int32)
        plane = vals.view(np.uint32)
        offsets = np.arange(0, 1501, 3, dtype=np.int64)
        secs, desc = rowcodec.encode_child(plane, offsets, signed=True)
        assert all(b["code"] != rowcodec.DICT_CODE for b in desc["buckets"])
        out = rowcodec.decode_child(b"".join(secs), desc, np.diff(offsets))
        np.testing.assert_array_equal(out, plane)


class TestCorruptStreamBoundaries:
    def test_all_decoders_raise_valueerror_only(self):
        """Fuzz gate across every from-scratch codec: truncations and
        bit flips surface as ValueError/NotImplementedError — the
        _corrupt_boundary wrappers convert raw IndexError/KeyError/
        OverflowError/struct.error/zlib.error at each decode entry."""
        import numpy as np

        from duckdb_raquet_ray.codecs import audiocodec as A
        from duckdb_raquet_ray.codecs import gifcodec as G
        from duckdb_raquet_ray.codecs import imagecodec as I
        from duckdb_raquet_ray.codecs import jpegcodec as J
        from duckdb_raquet_ray.codecs import videocodec as V
        from duckdb_raquet_ray.codecs import webpcodec as W

        rng = np.random.default_rng(5)
        pal = rng.integers(0, 256, (8, 3), np.uint8)
        rgb = pal[rng.integers(0, 8, (16, 16))]
        gray = rng.integers(0, 256, (16, 16), np.uint8)
        samples = [
            (G.gif_encode(rgb), G.gif_decode),
            (G.gif_encode_frames([rgb, rgb], delays_cs=[4, 4]), G.gif_frames),
            (W.webp_encode(rgb), W.webp_decode),
            (W.webp_encode_frames([rgb, rgb]), W.webp_frames),
            (I.png_encode(gray), I.png_decode),
            (
                A.wav_encode(
                    rng.integers(-1000, 1000, 300, np.int64).astype(np.int16), 16000
                ),
                A.wav_decode,
            ),
            (
                V.avi_encode_mjpeg([J.jpeg_encode(gray, 85)] * 2, 16, 16, fps=5),
                V.avi_frames,
            ),
        ]
        for blob, dec in samples:
            for cut in range(10, len(blob), max(1, len(blob) // 15)):
                try:
                    dec(blob[:cut])
                except (ValueError, NotImplementedError, EOFError):
                    pass
            for _ in range(60):
                b = bytearray(blob)
                b[int(rng.integers(0, len(b)))] ^= int(rng.integers(1, 256))
                try:
                    dec(bytes(b))
                except (ValueError, NotImplementedError, EOFError):
                    pass
