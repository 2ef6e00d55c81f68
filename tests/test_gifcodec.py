"""GIF codec (codecs/gifcodec.py): LZW both directions, interlace,
transparency compositing, animation, and an externally-published byte
vector (decoder independence from our own encoder)."""

import numpy as np
import pyarrow as pa
import pytest

from duckdb_raquet_ray.codecs import gifcodec as g
from duckdb_raquet_ray.codecs import imagecodec


def _rand_palette_img(rng, h, w, ncol):
    pal = rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8)
    return pal[rng.integers(0, ncol, size=(h, w))]


class TestRoundtrip:
    def test_plain_and_interlace(self):
        rng = np.random.default_rng(0)
        for trial in range(8):
            img = _rand_palette_img(
                rng, int(rng.integers(1, 40)), int(rng.integers(1, 40)),
                int(rng.integers(1, 17)),
            )
            for inter in (False, True):
                back = g.gif_decode(g.gif_encode(img, interlace=inter))
                assert np.array_equal(back, img), (trial, inter)

    def test_256_colors_code_width_growth_and_reset(self):
        # a gray plane with all 256 values: codes grow 9->12 bits and the
        # 4096-entry dictionary resets mid-stream on a 200x300 image
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, size=(200, 300), dtype=np.uint8)
        back = g.gif_decode(g.gif_encode(img))
        assert np.array_equal(back, np.stack([img] * 3, axis=-1))

    def test_single_color(self):
        img = np.full((7, 5, 3), 9, dtype=np.uint8)
        assert np.array_equal(g.gif_decode(g.gif_encode(img)), img)


class TestTransparencyAndAnimation:
    def test_transparent_pixels_show_background(self):
        # palette order = first appearance: (10,20,30) at (0,0) is file
        # index 0 (= the background), black is 1, red is 2
        img = np.zeros((2, 3, 3), dtype=np.uint8)
        img[0, 0] = (10, 20, 30)
        img[1, 2] = (200, 0, 0)
        data = g.gif_encode(img, transparent_index=2)
        back = g.gif_decode(data)
        want = img.copy()
        want[1, 2] = (10, 20, 30)  # transparent red -> background
        assert np.array_equal(back, want)

    def test_animation_frames_and_delays(self):
        rng = np.random.default_rng(2)
        frames = [_rand_palette_img(rng, 12, 9, 6) for _ in range(3)]
        out = g.gif_frames(g.gif_encode_frames(frames, delays_cs=[5, 10, 15]))
        assert [f["delay_cs"] for f in out] == [5, 10, 15]
        for got, want in zip(out, frames):
            assert np.array_equal(got["rgb"], want)


class TestExternalVector:
    def test_published_1x1_transparent_gif(self):
        # the canonical 1x1 transparent placeholder GIF — bytes NOT
        # produced by our encoder, so decoder correctness is independent
        data = bytes.fromhex(
            "474946383961010001008000"
            "00ffffff00000021f90401000000002c"
            "00000000010001000002024401003b"
        )
        img = g.gif_decode(data)
        assert img.shape == (1, 1, 3)
        assert img[0, 0].tolist() == [255, 255, 255]  # background composite


class TestDispatcherAndMediaTable:
    def test_sniff_and_decode_dispatch(self):
        img = np.full((3, 3, 3), 7, dtype=np.uint8)
        data = g.gif_encode(img)
        assert imagecodec.sniff(data) == "gif"
        assert np.array_equal(imagecodec.decode(data), img)

    def test_media_table_pixels_match_decode(self):
        from duckdb_raquet_ray.pipelines import multimodal as mm

        t = mm.synthesize_gif_media_table(16)
        for payload, pix in zip(
            t.column("payload").to_pylist(), t.column("pixels").to_pylist()
        ):
            got = imagecodec.decode(payload).reshape(-1).astype(np.int32)
            assert got.tolist() == pix

    def test_too_many_colors_raises(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
        with pytest.raises(ValueError, match="distinct colors"):
            g.gif_encode(img)


class TestFrameSampling:
    def test_video_frame_features_gif_branch(self, ray_session):
        import ray.data as rd

        from duckdb_raquet_ray.pipelines import multimodal as mm

        t = mm.synthesize_gif_anim_table(6)
        ds = rd.from_arrow(t.select(["media_id", "payload"]))
        got = (
            ds.map_batches(
                mm.VideoFrameFeatures,
                fn_constructor_kwargs={"every_k": 2},
                batch_format="pyarrow",
                concurrency=1,
            )
            .to_pandas()
            .sort_values(["media_id", "frame_index"])
            .reset_index(drop=True)
        )
        want = []
        for mid, sums in zip(
            t.column("media_id").to_pylist(), t.column("frame_sums").to_pylist()
        ):
            for f in range(0, len(sums), 2):
                want.append((mid, f, sums[f]))
        assert (
            list(zip(got["media_id"], got["frame_index"], got["frame_pixel_sum"]))
            == want
        )
