"""WebP VP8L codec (codecs/webpcodec.py): every spec decode path
roundtrips pixel-exact against the fixture encoder — simple and normal
huffman trees, LZ77 + color cache, meta-huffman groups, all 14 predictor
modes, the color transform, color-indexing with sub-byte packing."""

import numpy as np
import pytest

from duckdb_raquet_ray.codecs import imagecodec
from duckdb_raquet_ray.codecs import webpcodec as wp


def _rand_rgb(rng, h, w):
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


class TestLiteralPaths:
    def test_literal_roundtrip(self):
        rng = np.random.default_rng(0)
        for _ in range(5):
            img = _rand_rgb(rng, int(rng.integers(1, 30)), int(rng.integers(1, 30)))
            assert np.array_equal(wp.webp_decode(wp.webp_encode(img)), img)

    def test_rgba_preserved(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, size=(9, 7, 4), dtype=np.uint8)
        back = wp.webp_decode(wp.webp_encode(img))
        assert back.shape == (9, 7, 4) and np.array_equal(back, img)

    def test_single_color_single_symbol_trees(self):
        img = np.full((5, 6, 3), 77, dtype=np.uint8)
        assert np.array_equal(wp.webp_decode(wp.webp_encode(img, use_lz77=True)), img)

    def test_subtract_green_cache_lz77_compose(self):
        rng = np.random.default_rng(2)
        pal = rng.integers(0, 256, size=(6, 3), dtype=np.uint8)
        img = pal[rng.integers(0, 6, size=(15, 11))]
        data = wp.webp_encode(img, subtract_green=True, cache_bits=5, use_lz77=True)
        assert np.array_equal(wp.webp_decode(data), img)

    def test_meta_huffman_groups(self):
        rng = np.random.default_rng(3)
        img = _rand_rgb(rng, 19, 27)
        assert np.array_equal(wp.webp_decode(wp.webp_encode(img, meta_bits=3)), img)
        # single-tile meta image (1 group) — regression: n_groups must be
        # max(group id) + 1, not the encoder's nominal group count
        small = _rand_rgb(rng, 4, 4)
        assert np.array_equal(
            wp.webp_decode(wp.webp_encode(small, subtract_green=True, meta_bits=2)),
            small,
        )


class TestTransforms:
    def test_all_14_predictor_modes(self):
        rng = np.random.default_rng(4)
        for mode in range(14):
            img = _rand_rgb(rng, 13, 17)
            data = wp.webp_encode_transformed(img, predictor_mode=mode, tile_bits=2)
            assert np.array_equal(wp.webp_decode(data), img), f"mode {mode}"

    def test_color_transform_signed_deltas(self):
        rng = np.random.default_rng(5)
        for deltas in ((0, 0, 0), (16, -16, 8), (127, -128, 33), (-5, 77, -100)):
            img = _rand_rgb(rng, 9, 21)
            data = wp.webp_encode_transformed(img, color_deltas=deltas, tile_bits=3)
            assert np.array_equal(wp.webp_decode(data), img), deltas

    def test_color_indexing_all_packing_widths(self):
        rng = np.random.default_rng(6)
        for ncol in (2, 3, 11, 200):  # 1-, 2-, 4-, 8-bit packing
            pal = rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8)
            img = pal[rng.integers(0, ncol, size=(14, 23))]
            data = wp.webp_encode_transformed(img, palette=True)
            assert np.array_equal(wp.webp_decode(data), img), ncol


class TestContainerAndDispatch:
    def test_sniff_and_dispatch(self):
        img = np.full((3, 4, 3), 9, np.uint8)
        data = wp.webp_encode(img)
        assert imagecodec.sniff(data) == "webp"
        assert np.array_equal(imagecodec.decode(data), img)

    def test_lossy_vp8_raises(self):
        fake_vp8 = b"RIFF" + b"\x10\x00\x00\x00" + b"WEBP" + b"VP8 " + b"\x00" * 8
        with pytest.raises(NotImplementedError, match="VP8L"):
            wp.webp_decode(fake_vp8)

    def test_not_webp_raises(self):
        with pytest.raises(ValueError):
            wp.webp_decode(b"not a webp at all....")

    def test_media_table_pixels_match_decode(self):
        from duckdb_raquet_ray.pipelines import multimodal as mm

        t = mm.synthesize_webp_media_table(24)
        for payload, pix in zip(
            t.column("payload").to_pylist(), t.column("pixels").to_pylist()
        ):
            got = imagecodec.decode(payload).reshape(-1).astype(np.int32)
            assert got.tolist() == pix


class TestHuffmanDepth:
    def test_long_codes_roundtrip(self):
        """Fibonacci frequencies force the length-limited clamp (depth 15)
        and the decoder's beyond-fast-LUT long-code walk."""
        from duckdb_raquet_ray.codecs.webpcodec import (
            _BitReader,
            _BitWriter,
            _HuffEnc,
            _Huffman,
        )

        fibs = [1, 1]
        while len(fibs) < 24:
            fibs.append(fibs[-1] + fibs[-2])
        freq = np.zeros(256, dtype=np.int64)
        freq[: len(fibs)] = fibs
        enc = _HuffEnc(freq)
        assert enc.lengths.max() == 15  # clamped by the length limit
        dec = _Huffman(enc.lengths)
        rng = np.random.default_rng(0)
        syms = rng.choice(24, size=500, p=freq[:24] / freq[:24].sum())
        bw = _BitWriter()
        for s in syms:
            enc.emit(bw, int(s))
        br = _BitReader(bw.finish())
        assert [dec.read(br) for _ in syms] == [int(s) for s in syms]
