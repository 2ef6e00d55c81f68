"""WebP VP8L codec (codecs/webpcodec.py): every spec decode path
roundtrips pixel-exact against the fixture encoder — simple and normal
huffman trees, LZ77 + color cache, meta-huffman groups, all 14 predictor
modes, the color transform, color-indexing with sub-byte packing."""

import numpy as np
import pytest

from duckdb_raquet_ray.codecs import imagecodec, syswebp
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

    def test_lossy_vp8_garbage(self):
        # with a system libwebp the lossy path is real, so a garbage VP8
        # chunk is a corrupt-stream ValueError; without one it stays the
        # honest NotImplementedError
        fake_vp8 = b"RIFF" + b"\x10\x00\x00\x00" + b"WEBP" + b"VP8 " + b"\x00" * 8
        if syswebp.available():
            with pytest.raises(ValueError, match="decode failed"):
                wp.webp_decode(fake_vp8)
        else:
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


@pytest.mark.skipif(not syswebp.available(), reason="no system libwebp")
class TestLibwebpConformance:
    """Cross-validate the pure-Python VP8L pair against the system
    libwebp in BOTH directions. A self-consistent encoder/decoder pair
    cannot see a shared spec deviation; this oracle can (and did:
    Kraft-incomplete degenerate huffman codes, simple-code read-order)."""

    def test_our_encoder_decodes_in_libwebp(self):
        rng = np.random.default_rng(7)
        for h, w in [(1, 1), (2, 2), (5, 3), (8, 8), (21, 17)]:
            img = _rand_rgb(rng, h, w)
            flat = np.full((h, w, 3), (10, 20, 30), np.uint8)
            grad = (np.arange(h * w * 3).reshape(h, w, 3) % 7 * 13).astype(np.uint8)
            streams = [
                wp.webp_encode(img),
                wp.webp_encode(flat),  # single-symbol trees
                wp.webp_encode(img, subtract_green=True),
                wp.webp_encode(grad, cache_bits=3),
                wp.webp_encode(grad, use_lz77=True),
                wp.webp_encode(img, meta_bits=3),
            ]
            wants = [img, flat, img, grad, grad, img]
            for data, want in zip(streams, wants):
                got = syswebp.decode_rgba(data)
                assert np.array_equal(got[:, :, :3], want)
                assert (got[:, :, 3] == 255).all()

    def test_our_transformed_encoder_decodes_in_libwebp(self):
        rng = np.random.default_rng(8)
        img = _rand_rgb(rng, 13, 17)
        pal = (rng.integers(0, 5, (13, 17, 1)) * np.array([[[37, 11, 91]]])).astype(
            np.uint8
        )
        for mode in range(14):
            data = wp.webp_encode_transformed(img, predictor_mode=mode, tile_bits=2)
            assert np.array_equal(syswebp.decode_rgba(data)[:, :, :3], img), mode
        for data, want in [
            (wp.webp_encode_transformed(img, color_deltas=(16, -16, 8)), img),
            (wp.webp_encode_transformed(pal, palette=True), pal),
        ]:
            assert np.array_equal(syswebp.decode_rgba(data)[:, :, :3], want)

    def test_fixture_corpus_decodes_in_libwebp(self):
        from duckdb_raquet_ray.pipelines import multimodal as mm

        t = mm.synthesize_webp_media_table(24)
        for payload, pix in zip(
            t.column("payload").to_pylist(), t.column("pixels").to_pylist()
        ):
            got = syswebp.decode_rgba(payload)[:, :, :3]
            assert got.reshape(-1).astype(np.int32).tolist() == pix

    def test_libwebp_encoder_decodes_here(self):
        # libwebp's own lossless encoder exercises meta-huffman,
        # predictors, color cache and LZ77 together — decode must be
        # bit-identical to libwebp's decoder on every stream
        rng = np.random.default_rng(11)
        y, x = np.mgrid[0:96, 0:80]
        images = [
            np.stack([(x * 3) % 256, (y * 2) % 256, (x + y) % 256], -1).astype(
                np.uint8
            ),
            np.kron(
                rng.integers(0, 256, (12, 10, 3)), np.ones((8, 8, 1))
            ).astype(np.uint8),
            rng.integers(0, 256, (96, 80, 3), dtype=np.uint8),
            (128 + 60 * np.sin(x / 9.0) * np.cos(y / 13.0))[:, :, None]
            .repeat(3, 2)
            .astype(np.uint8),
            (rng.integers(0, 4, (96, 80, 1)) * np.array([[[60, 120, 180]]])).astype(
                np.uint8
            ),
        ]
        for img in images:
            data = syswebp.encode_lossless(img)
            ours = wp.webp_decode(data)
            assert np.array_equal(ours[:, :, :3] if ours.shape[2] == 4 else ours, img)

    def test_libwebp_rgba_stream_decodes_here(self):
        # libwebp may rewrite RGB under fully-transparent pixels, so the
        # ground truth is libwebp's own decode, not the source image
        y, x = np.mgrid[0:40, 0:32]
        img = np.stack(
            [(x * 5) % 256, (y * 3) % 256, (x + y) % 256, (x + 2 * y) % 256], -1
        ).astype(np.uint8)
        data = syswebp.encode_lossless(img)
        ours = wp.webp_decode(data)
        ref = syswebp.decode_rgba(data)
        if ours.shape[2] == 3:
            assert (ref[:, :, 3] == 255).all()
            ref = ref[:, :, :3]
        assert np.array_equal(ours, ref)


@pytest.mark.skipif(not syswebp.available(), reason="no system libwebp")
class TestLossyVP8SystemPath:
    def test_lossy_decode_matches_libwebp(self):
        rng = np.random.default_rng(13)
        img = _rand_rgb(rng, 32, 48)
        data = syswebp.encode_lossy(img, quality=80.0)
        assert wp.sniff_webp(data) == "vp8"
        ours = wp.webp_decode(data)
        ref = syswebp.decode_rgba(data)
        want = ref[:, :, :3] if (ref[:, :, 3] == 255).all() else ref
        assert np.array_equal(ours, want)
        # lossy but sane: same shape, bounded error on a smooth image
        smooth = (np.mgrid[0:32, 0:48][0] * 4).astype(np.uint8)[:, :, None].repeat(
            3, 2
        )
        sm = wp.webp_decode(syswebp.encode_lossy(smooth, quality=95.0))
        assert sm.shape == smooth.shape
        assert np.abs(sm.astype(int) - smooth.astype(int)).mean() < 8.0

    def test_lossy_media_table_pixels_match_pipeline_decode(self):
        from duckdb_raquet_ray.codecs import imagecodec
        from duckdb_raquet_ray.pipelines import multimodal as mm

        t = mm.synthesize_webp_lossy_media_table(12)
        for payload, pix in zip(
            t.column("payload").to_pylist(), t.column("pixels").to_pylist()
        ):
            got = imagecodec.decode(payload).reshape(-1).astype(np.int32)
            assert got.tolist() == pix


class TestAnimatedWebp:
    """VP8X/ANIM/ANMF container: dirty-rect lossless frames must
    composite back to the exact source frames (VP8L lossless + replace
    semantics), including even-alignment of patch offsets, identical
    frames (1x1 no-op patch), and the sampler stage wiring."""

    def _frames(self, seed=9, n=5, side=17):
        rng = np.random.default_rng(seed)
        pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
        out = [pal[rng.integers(0, 8, size=(side, side + 4))]]
        for f in range(1, n):
            if f % 2:
                nxt = out[-1].copy()
                nxt[3:8, 5:11] = pal[rng.integers(0, 8, size=(5, 6))]
                out.append(nxt)
            else:
                out.append(pal[rng.integers(0, 8, size=(side, side + 4))])
        return out

    def test_composited_roundtrip_exact(self):
        frames = self._frames()
        frames.append(frames[-1].copy())  # identical -> 1x1 no-op patch
        blob = wp.webp_encode_frames(frames, durations_ms=[40] * len(frames))
        got = wp.webp_frames(blob)
        assert len(got) == len(frames)
        for i, (g, f) in enumerate(zip(got, frames)):
            np.testing.assert_array_equal(g, f, err_msg=f"frame {i}")

    def test_sniff_is_vp8x(self):
        blob = wp.webp_encode_frames(self._frames(n=2))
        assert wp.sniff_webp(blob) == "vp8x"

    def test_odd_offset_patch_even_aligns(self):
        base = np.zeros((12, 12, 3), np.uint8)
        nxt = base.copy()
        nxt[5, 7] = [9, 8, 7]  # odd x/y dirty rect -> encoder must align
        blob = wp.webp_encode_frames([base, nxt])
        got = wp.webp_frames(blob)
        np.testing.assert_array_equal(got[1], nxt)

    def test_video_frame_features_dispatches_webp(self, ray_session):
        import ray.data as rd

        from duckdb_raquet_ray.pipelines import multimodal as mm

        t = mm.synthesize_webp_anim_table(6)
        out = (
            rd.from_arrow(t.select(["media_id", "payload"]))
            .map_batches(
                mm.VideoFrameFeatures,
                fn_constructor_kwargs={"every_k": 2},
                batch_format="pyarrow",
                concurrency=1,
            )
            .to_pandas()
        )
        want = {
            (mid, i): s
            for mid, sums in zip(
                t.column("media_id").to_pylist(), t.column("frame_sums").to_pylist()
            )
            for i, s in enumerate(sums)
            if i % 2 == 0
        }
        got = {
            (r.media_id, r.frame_index): r.frame_pixel_sum
            for r in out.itertuples()
        }
        assert got == want
