"""IVF and y4m container tests against oracle-generated fixtures."""
import subprocess

import numpy as np
import pytest

from alfalfa_tpu.util.ivf import IVFReader, IVFWriter
from alfalfa_tpu.util.y4m import Y4MReader, Y4MWriter

from conftest import FIXTURES, fixture_manifest


def test_ivf_reader_parses_fixtures():
    manifest = fixture_manifest()
    for name in manifest:
        r = IVFReader(FIXTURES / name)
        assert r.fourcc == "VP80"
        assert r.frame_count == len(list(r))
        assert r.width > 0 and r.height > 0
        # YUV420 byte count must match golden decode size
        per_frame = r.width * r.height * 3 // 2
        assert per_frame * r.frame_count == manifest[name]["yuv_bytes"]


def test_ivf_roundtrip(tmp_path):
    src = IVFReader(FIXTURES / "inter_176x144_q32.ivf")
    out = tmp_path / "copy.ivf"
    with IVFWriter(out, "VP80", src.width, src.height, src.frame_rate,
                   src.time_scale,
                   expected_decoder_minihash=src.expected_decoder_minihash) as w:
        for frame in src:
            w.append_frame(frame)
    dst = IVFReader(out)
    assert dst.frame_count == src.frame_count
    assert dst.expected_decoder_minihash == src.expected_decoder_minihash
    for i in range(len(src)):
        assert dst.frame(i) == src.frame(i)


def test_y4m_roundtrip(tmp_path):
    w, h = 32, 16
    rng = np.random.RandomState(0)
    frames = [(rng.randint(0, 256, (h, w), dtype=np.uint8).astype(np.uint8),
               rng.randint(0, 256, (h // 2, w // 2)).astype(np.uint8),
               rng.randint(0, 256, (h // 2, w // 2)).astype(np.uint8))
              for _ in range(3)]
    path = tmp_path / "test.y4m"
    with Y4MWriter(path, w, h) as writer:
        for y, u, v in frames:
            writer.append_frame(y, u, v)
    r = Y4MReader(path)
    assert (r.width, r.height) == (w, h)
    got = list(r)
    assert len(got) == 3
    for (y, u, v), (gy, gu, gv) in zip(frames, got):
        np.testing.assert_array_equal(y, gy)
        np.testing.assert_array_equal(u, gu)
        np.testing.assert_array_equal(v, gv)
