"""Dependency-free image codec (codecs/imagecodec.py) + the real decode
paths of the multimodal stages. Reference analogue: the dependency-free
PNG encoder at /root/reference/src/band_encoder.cpp:205-249."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from duckdb_raquet_ray.codecs import imagecodec as ic
from duckdb_raquet_ray.pipelines import multimodal as mm


def _ref_png(img: np.ndarray, ftype: int) -> bytes:
    """Spec-literal grayscale PNG writer for an arbitrary filter type —
    independent of png_encode, so decode of filters 1/3/4 is tested
    against the spec, not against our own encoder."""
    h, w = img.shape
    lines = []
    prev = np.zeros(w, dtype=np.int32)
    for y in range(h):
        cur = img[y].astype(np.int32)
        raw = np.zeros(w, dtype=np.int32)
        for x in range(w):
            a = cur[x - 1] if x >= 1 else 0
            b = prev[x]
            c = prev[x - 1] if x >= 1 else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
            raw[x] = (cur[x] - pred) & 0xFF
        lines.append(bytes([ftype]) + bytes(raw.astype(np.uint8)))
        prev = cur

    def chunk(t, p):
        return struct.pack(">I", len(p)) + t + p + struct.pack(
            ">I", zlib.crc32(t + p) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )


class TestPng:
    @pytest.mark.parametrize("shape", [(13, 7), (9, 21, 3), (5, 4, 4), (1, 1)])
    @pytest.mark.parametrize("ftype", [0, 2])
    def test_roundtrip(self, shape, ftype):
        img = np.random.default_rng(3).integers(0, 256, size=shape, dtype=np.uint8)
        out = ic.png_decode(ic.png_encode(img, filter_type=ftype))
        assert out.shape == img.shape
        assert np.array_equal(out, img)

    @pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
    def test_all_spec_filters_decode(self, ftype):
        img = np.random.default_rng(7).integers(0, 256, size=(11, 17), dtype=np.uint8)
        assert np.array_equal(ic.png_decode(_ref_png(img, ftype)), img)

    def test_rejects_unsupported(self):
        with pytest.raises(ValueError, match="signature"):
            ic.png_decode(b"JFIF....")
        # 16-bit depth header
        bad = bytearray(ic.png_encode(np.zeros((2, 2), np.uint8)))
        bad[24] = 16  # bit depth byte in IHDR
        with pytest.raises(ValueError, match="unsupported PNG"):
            ic.png_decode(bytes(bad))

    def test_sniff(self):
        img = np.zeros((2, 2), np.uint8)
        assert ic.sniff(ic.png_encode(img)) == "png"
        assert ic.sniff(ic.ppm_encode(img)) == "pgm"
        assert ic.sniff(b"\xff\xd8\xff\xe0") == "jpeg"
        assert ic.sniff(b"RIFF0000WEBPdata") == "webp"  # VP8L decoder added r4


class TestPpm:
    @pytest.mark.parametrize("shape", [(6, 9), (6, 9, 3)])
    def test_roundtrip(self, shape):
        img = np.random.default_rng(5).integers(0, 256, size=shape, dtype=np.uint8)
        assert np.array_equal(ic.ppm_decode(ic.ppm_encode(img)), img)

    def test_comment_header(self):
        img = np.arange(12, dtype=np.uint8).reshape(3, 4)
        data = b"P5\n# a comment\n4 3\n255\n" + img.tobytes()
        assert np.array_equal(ic.ppm_decode(data), img)


class TestResize:
    def test_nearest_exact_halving(self):
        img = np.random.default_rng(1).integers(0, 256, size=(10, 8), dtype=np.uint8)
        assert np.array_equal(ic.resize_nearest(img, 4, 5), img[::2][:, ::2])

    def test_upscale_shape(self):
        img = np.zeros((4, 4), np.uint8)
        assert ic.resize_nearest(img, 9, 7).shape == (7, 9)


class TestStagesRealPath:
    def _batch(self, n=6):
        return mm.synthesize_png_media_table(n, seed=9)

    def test_decoder_runs_nonfake_on_real_payloads(self):
        b = self._batch()
        out = mm.ImageDecoder(fake=False, feature_dim=8)(b)
        assert out.column("features").type.value_type == pa.float32()
        feats = np.asarray(out.column("features").combine_chunks().flatten())
        assert np.all((feats >= 0) & (feats <= 1))

    def test_decoder_feature_is_strip_mean(self):
        b = self._batch(3)
        out = mm.ImageDecoder(fake=False, feature_dim=4)(b)
        px = np.asarray(b.column("pixels")[0].as_py(), dtype=np.float64)
        ids = (np.arange(len(px)) * 4) // len(px)
        want = np.bincount(ids, weights=px, minlength=4) / np.bincount(ids, minlength=4) / 255.0
        got = np.asarray(out.column("features")[0].as_py())
        assert np.allclose(got, want, atol=1e-6)

    def test_resizer_roundtrips_format_and_shape(self):
        b = self._batch(5)
        out = mm.ImageResizer(12, 10, fake=False)(b)
        for p, mime in zip(out.column("payload").to_pylist(), b.column("mime").to_pylist()):
            img = ic.decode(p)
            assert img.shape == (10, 12)
            assert ic.sniff(p) == ("png" if mime == "image/png" else "pgm")

    def test_unknown_format_still_raises_without_fake(self):
        t = pa.table(
            {
                "media_id": pa.array(["x"]),
                # TIFF magic: sniffs as no known codec (webp now routes
                # through the real VP8L/system-libwebp path instead)
                "payload": pa.array([b"II*\x00unknown-format"], type=pa.binary()),
                "mime": pa.array(["image/tiff"]),
                "width": pa.array([4], pa.int32()),
                "height": pa.array([4], pa.int32()),
                "n_frames": pa.array([1], pa.int32()),
            }
        )
        with pytest.raises(NotImplementedError):
            mm.ImageDecoder(fake=False)(t)
        with pytest.raises(NotImplementedError):
            mm.ImageResizer(2, 2, fake=False)(t)

    def test_strip_sums_match_pixels_column(self):
        b = self._batch(8)
        out = mm.strip_sums_batch(b, feature_dim=16)
        assert out.num_rows == 8 * 16
        df = out.to_pandas()
        for i, (mid, px) in enumerate(
            zip(b.column("media_id").to_pylist(), b.column("pixels").to_pylist())
        ):
            px = np.asarray(px, dtype=np.int64)
            ids = (np.arange(len(px)) * 16) // len(px)
            want = np.bincount(ids, weights=px, minlength=16).astype(np.int64)
            got = df[df.media_id == mid].sort_values("strip")["strip_sum"].to_numpy()
            assert np.array_equal(got, want)
