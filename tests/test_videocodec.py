"""MJPEG-AVI container codec + VideoFrameFeatures: container round-trip,
nested rec lists, frame decode parity, and loud non-MJPEG errors."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from duckdb_raquet_ray.codecs import jpegcodec as J
from duckdb_raquet_ray.codecs import videocodec as V
from duckdb_raquet_ray.pipelines import multimodal as mm


def _frames(n=5, side=16, seed=2):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        img = rng.integers(0, 256, size=(side, side), dtype=np.uint8)
        out.append(J.jpeg_encode(img, 85, return_expected=True))
    return out


class TestAviContainer:
    def test_roundtrip_frame_payloads(self):
        pairs = _frames(7)
        blob = V.avi_encode_mjpeg([b for b, _ in pairs], 16, 16)
        assert V.sniff(blob)
        got = V.avi_frames(blob)
        assert got == [b for b, _ in pairs]

    def test_odd_length_frames_word_aligned(self):
        frames = [b"\xff\xd8\xff" + bytes([65]) * 7, b"\xff\xd8\xff" + bytes([66]) * 8]
        blob = V.avi_encode_mjpeg(frames, 4, 4)
        assert V.avi_frames(blob) == frames

    def test_rec_list_descended(self):
        # hand-build a movi whose frames sit inside a 'rec ' sublist
        f1, f2 = b"\xff\xd8\xffA", b"\xff\xd8\xffBB"
        rec = V._list(b"rec ", V._chunk(b"00dc", f1) + V._chunk(b"00dc", f2))
        movi = V._list(b"movi", rec)
        blob = b"RIFF" + struct.pack("<I", 4 + len(movi)) + b"AVI " + movi
        assert V.avi_frames(blob) == [f1, f2]

    def test_not_avi(self):
        with pytest.raises(ValueError, match="AVI"):
            V.avi_frames(b"RIFFxxxxWAVEdata")

    def test_non_mjpeg_frame_raises(self):
        with pytest.raises(ValueError, match="video library"):
            V.decode_frame(b"\x00\x00\x00\x01h264nal")


class TestVideoFrameFeatures:
    def test_sampled_frame_sums_match_forced_decode(self):
        pairs = _frames(9, seed=5)
        blob = V.avi_encode_mjpeg([b for b, _ in pairs], 16, 16)
        t = pa.table(
            {"media_id": pa.array(["v0"]), "payload": pa.array([blob], pa.binary())}
        )
        out = mm.VideoFrameFeatures(every_k=2)(t).to_pandas()
        assert out.frame_index.tolist() == [0, 2, 4, 6, 8]
        want = [int(exp.astype(np.int64).sum()) for _, exp in pairs][::2]
        assert out.frame_pixel_sum.tolist() == want

    def test_fixture_table_consistent(self):
        t = mm.synthesize_mjpeg_media_table(4)
        out = mm.VideoFrameFeatures(every_k=1)(t.select(["media_id", "payload"]))
        df = out.to_pandas()
        for mid, sums in zip(
            t.column("media_id").to_pylist(), t.column("frame_sums").to_pylist()
        ):
            got = df[df.media_id == mid].sort_values("frame_index")
            assert got.frame_pixel_sum.tolist() == list(sums)
