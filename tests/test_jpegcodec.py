"""Baseline JPEG codec (codecs/jpegcodec.py): forced-decode parity (the
decoder's independent bitstream parse must reproduce the mathematically
forced decode of the coefficients the encoder wrote), hand-computed DC
goldens, marker robustness, loud unsupported-feature errors, and the
multimodal stage wiring."""

import numpy as np
import pyarrow as pa
import pytest

from duckdb_raquet_ray.codecs import imagecodec as ic
from duckdb_raquet_ray.codecs import jpegcodec as J
from duckdb_raquet_ray.pipelines import multimodal as mm


class TestRoundTrip:
    @pytest.mark.parametrize("shape", [(8, 8), (21, 37), (40, 9), (64, 64)])
    @pytest.mark.parametrize("quality", [60, 85, 95])
    def test_gray_forced_decode_parity(self, shape, quality):
        rng = np.random.default_rng(hash((shape, quality)) % 2**32)
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        blob, expected = J.jpeg_encode(img, quality, return_expected=True)
        dec = J.jpeg_decode(blob)
        assert dec.shape == img.shape
        np.testing.assert_array_equal(dec, expected)

    @pytest.mark.parametrize("subsample", [False, True])
    @pytest.mark.parametrize("shape", [(16, 24), (13, 19), (33, 47)])
    def test_rgb_forced_decode_parity(self, shape, subsample):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
        blob, expected = J.jpeg_encode(
            img, 80, subsample=subsample, return_expected=True
        )
        dec = J.jpeg_decode(blob)
        assert dec.shape == img.shape
        np.testing.assert_array_equal(dec, expected)

    def test_smooth_gradient_is_lossless_at_high_quality(self):
        # a gentle gradient survives q95 quantization exactly — catches
        # gross IDCT/scaling errors the shared-code parity test can't
        img = (np.arange(32)[:, None] * 4 + np.arange(48)[None, :] * 2).astype(np.uint8)
        dec = J.jpeg_decode(J.jpeg_encode(img, 95))
        np.testing.assert_array_equal(dec, img)

    def test_lossy_error_is_bounded(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, size=(48, 48), dtype=np.uint8)
        dec = J.jpeg_decode(J.jpeg_encode(img, 85))
        assert np.abs(dec.astype(int) - img.astype(int)).mean() < 12


class TestGoldens:
    def test_constant_block_dc_golden(self):
        # hand-computable: constant v -> F00 = 8*(v-128), coef =
        # rint(F00/q00), decode = clip(rint(coef*q00/8) + 128)
        for v, quality in [(130, 90), (7, 75), (250, 60)]:
            img = np.full((8, 8), v, np.uint8)
            blob = J.jpeg_encode(img, quality)
            qy, _ = J._quality_tables(quality)
            q00 = int(qy[0, 0])
            coef = round(8.0 * (v - 128.0) / q00)
            want = int(np.clip(round(coef * q00 / 8.0) + 128, 0, 255))
            dec = J.jpeg_decode(blob)
            assert (dec == want).all(), (v, quality, want, dec[0, 0])

    def test_zigzag_is_a_permutation(self):
        assert sorted(J.ZIGZAG.tolist()) == list(range(64))
        # spec spot values
        assert J.ZIGZAG[0] == 0 and J.ZIGZAG[1] == 1 and J.ZIGZAG[2] == 8
        assert J.ZIGZAG[63] == 63

    def test_dct_basis_orthonormal(self):
        np.testing.assert_allclose(J._A @ J._A.T, np.eye(8), atol=1e-12)


class TestMarkers:
    def test_appn_segments_are_skipped(self):
        img = np.arange(64, dtype=np.uint8).reshape(8, 8)
        blob = J.jpeg_encode(img, 90)
        # splice a JFIF APP0 after SOI — decoders must skip unknown APPn
        app0 = b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
        spliced = blob[:2] + app0 + blob[2:]
        np.testing.assert_array_equal(J.jpeg_decode(spliced), J.jpeg_decode(blob))

    def test_arithmetic_sof_raises_named_error(self):
        img = np.zeros((8, 8), np.uint8)
        blob = bytearray(J.jpeg_encode(img, 90))
        i = bytes(blob).find(b"\xff\xc0")
        blob[i + 1] = 0xC9  # rewrite SOF0 -> SOF9 (arithmetic sequential)
        with pytest.raises(ValueError, match="SOF9"):
            J.jpeg_decode(bytes(blob))

    def test_truncated_scan_raises(self):
        img = np.random.default_rng(1).integers(0, 256, (16, 16), np.uint8)
        blob = J.jpeg_encode(img, 85)
        with pytest.raises(ValueError, match="exhausted|marker|SOS"):
            J.jpeg_decode(blob[: len(blob) // 2])

    def test_not_a_jpeg(self):
        with pytest.raises(ValueError, match="SOI"):
            J.jpeg_decode(b"\x89PNG\r\n\x1a\n")

    def test_scan_segments_unstuff_and_split(self):
        data = b"\xaa\xff\x00\xbb" + b"\xff\xd0" + b"\xcc" + b"\xff\xd9"
        segs, end = J._scan_segments(data, 0)
        assert segs == [b"\xaa\xff\xbb", b"\xcc"]
        assert data[end : end + 2] == b"\xff\xd9"  # terminating marker pos


class TestStageWiring:
    def test_sniff_and_dispatch(self):
        img = np.zeros((8, 8), np.uint8)
        blob = J.jpeg_encode(img, 90)
        assert ic.sniff(blob) == "jpeg"
        assert ic.decode(blob).shape == (8, 8)

    def test_image_decoder_non_fake_on_jpeg(self, ray_session):
        import ray.data as rd

        t = mm.synthesize_jpeg_media_table(12)
        ds = rd.from_arrow(t.drop_columns(["pixels"]))
        out = ds.map_batches(
            mm.ImageDecoder, batch_format="pyarrow", concurrency=1,
            fn_constructor_kwargs={"fake": False},
        ).take_all()
        assert len(out) == 12
        assert all(len(r["features"]) == 32 for r in out)

    def test_strip_sums_match_forced_pixels(self):
        # the png_strip_sums pattern on JPEG: decode(payload) must equal
        # the independent forced-pixels column exactly
        t = mm.synthesize_jpeg_media_table(10)
        out = mm.strip_sums_batch(t, feature_dim=16).to_pandas()
        for mid, px in zip(t.column("media_id").to_pylist(), t.column("pixels").to_pylist()):
            flat = np.asarray(px, dtype=np.int64)
            sids = (np.arange(len(flat)) * 16) // len(flat)
            want = np.bincount(sids, weights=flat, minlength=16).astype(np.int64)
            got = out[out.media_id == mid].sort_values("strip")["strip_sum"].to_numpy()
            np.testing.assert_array_equal(got, want)

    def test_resizer_reencodes_jpeg(self):
        t = mm.synthesize_jpeg_media_table(3)
        rs = mm.ImageResizer(10, 6)
        out = rs(t.drop_columns(["pixels"]))
        for p in out.column("payload").to_pylist():
            assert ic.sniff(p) == "jpeg"
            assert ic.decode(p).shape[:2] == (6, 10)


class TestProgressive:
    """Progressive (SOF2, Annex G) and multi-scan sequential decode: both
    streams carry the SAME quantized coefficients as the interleaved
    baseline encode, so their decodes must be bit-identical to the
    baseline stream's decode — the strongest dependency-free invariant
    (any asymmetric bug in the scan packaging or the four progressive
    decode modes breaks the equality)."""

    def _imgs(self):
        rng = np.random.default_rng(77)
        return [
            (rng.integers(0, 256, (16, 24), np.uint8), False),
            (rng.integers(0, 256, (13, 9), np.uint8), False),
            (rng.integers(0, 256, (23, 37, 3), np.uint8), False),
            (rng.integers(0, 256, (23, 37, 3), np.uint8), True),
            (rng.integers(0, 256, (8, 8, 3), np.uint8), True),
        ]

    def test_progressive_matches_baseline_decode(self):
        for img, sub in self._imgs():
            for q in (60, 85, 95):
                blob, exp = J.jpeg_encode_progressive(
                    img, q, subsample=sub, return_expected=True
                )
                got = J.jpeg_decode(blob)
                np.testing.assert_array_equal(got, exp)
                base = J.jpeg_decode(J.jpeg_encode(img, q, subsample=sub))
                np.testing.assert_array_equal(got, base)

    def test_multiscan_sequential_matches_baseline_decode(self):
        for img, sub in self._imgs():
            blob, exp = J.jpeg_encode_multiscan(
                img, 85, subsample=sub, return_expected=True
            )
            np.testing.assert_array_equal(J.jpeg_decode(blob), exp)

    def test_long_eob_runs(self):
        # flat / sparse images drive EOBRUN > 1 through both the AC-first
        # and AC-refinement eob paths
        flat = np.full((64, 64), 128, np.uint8)
        blob, exp = J.jpeg_encode_progressive(flat, 85, return_expected=True)
        np.testing.assert_array_equal(J.jpeg_decode(blob), exp)
        sparse = np.zeros((48, 48), np.uint8)
        sparse[7, 11] = 255
        sparse[33, 40] = 200
        blob, exp = J.jpeg_encode_progressive(sparse, 85, return_expected=True)
        np.testing.assert_array_equal(J.jpeg_decode(blob), exp)

    def test_sof2_sniffs_and_dispatches(self):
        img = np.random.default_rng(3).integers(0, 256, (12, 12), np.uint8)
        blob = J.jpeg_encode_progressive(img, 85)
        assert ic.sniff(blob) == "jpeg"
        assert ic.decode(blob).shape == (12, 12)


class TestCorruptStreams:
    def test_corrupt_streams_raise_valueerror_only(self):
        """Fuzz gate: truncations and bit flips over all three stream
        layouts must surface as ValueError/NotImplementedError — never a
        raw IndexError/KeyError/OverflowError/AttributeError from deep
        in the parse (the jpeg_decode boundary converts them)."""
        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (16, 16, 3), np.uint8)
        for enc in (J.jpeg_encode, J.jpeg_encode_progressive, J.jpeg_encode_multiscan):
            blob = enc(img, 85)
            for cut in range(40, len(blob), max(1, len(blob) // 25)):
                try:
                    J.jpeg_decode(blob[:cut])
                except (ValueError, NotImplementedError):
                    pass
            for _ in range(150):
                b = bytearray(blob)
                b[int(rng.integers(2, len(b)))] ^= int(rng.integers(1, 256))
                try:
                    J.jpeg_decode(bytes(b))
                except (ValueError, NotImplementedError):
                    pass

    def test_undefined_table_reference_named_error(self):
        # a scan whose header points at a Huffman slot no DHT defined
        img = np.zeros((8, 8), np.uint8)
        blob = bytearray(J.jpeg_encode_progressive(img, 85))
        i = bytes(blob).find(b"\xff\xda")
        # component's Td/Ta byte sits 4 bytes into the SOS payload
        blob[i + 6] = 0x33  # table id 3/3: never defined
        with pytest.raises(ValueError, match="corrupt JPEG"):
            J.jpeg_decode(bytes(blob))
