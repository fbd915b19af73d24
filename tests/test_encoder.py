"""Encoder tests: self-decode equality, oracle interop, quality parity."""
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, str(__import__('pathlib').Path(__file__).parent / "fixtures"))
from gen_inputs import gen_clip

from alfalfa_tpu.encoder.encoder import Encoder
from alfalfa_tpu.util.ivf import IVFWriter
from alfalfa_tpu.util.ssim import ssim
from alfalfa_tpu.decoder import FilePlayer

from conftest import FIXTURES

ORACLE_DECODER = FIXTURES.parent.parent / "oracle" / "build" / "bin" / "decode-to-stdout"


def encode_clip(tmp_path, clip, w, h, qp, quality="best"):
    enc = Encoder(w, h, quality=quality)
    path = tmp_path / "out.ivf"
    with IVFWriter(path, "VP80", w, h) as writer:
        for f in clip:
            writer.append_frame(enc.encode_with_quantizer(f, qp))
    return enc, path


@pytest.mark.parametrize("qp", [20, 60])
def test_encode_decode_selfconsistent(tmp_path, qp):
    w, h = 80, 64
    clip = gen_clip(w, h, 3, seed=3)
    enc, path = encode_clip(tmp_path, clip, w, h, qp)
    rasters = list(FilePlayer(path))
    assert len(rasters) == 3
    # decoder output must equal the encoder's reference raster
    assert np.array_equal(rasters[-1].y, np.asarray(enc.references.last.y))
    assert np.array_equal(rasters[-1].u, np.asarray(enc.references.last.u))


@pytest.mark.parametrize("qp", [40])
def test_oracle_decodes_our_stream(tmp_path, qp):
    if not ORACLE_DECODER.exists():
        pytest.skip("oracle not built")
    w, h = 80, 64
    clip = gen_clip(w, h, 4, seed=9)
    enc, path = encode_clip(tmp_path, clip, w, h, qp)
    ours = b"".join(r.dump_bytes() for r in FilePlayer(path))
    out = subprocess.run([str(ORACLE_DECODER), str(path)], capture_output=True)
    assert out.returncode == 0
    assert out.stdout == ours


def test_ssim_improves_with_lower_qp(tmp_path):
    w, h = 80, 64
    clip = gen_clip(w, h, 1, seed=1)
    _, p1 = encode_clip(tmp_path, clip, w, h, 100)
    s_low = ssim(FilePlayer(p1).advance().display()[0], clip[0][0])
    _, p2 = encode_clip(tmp_path, clip, w, h, 10)
    s_high = ssim(FilePlayer(p2).advance().display()[0], clip[0][0])
    assert s_high > s_low


def test_minimum_ssim_search(tmp_path):
    w, h = 80, 64
    clip = gen_clip(w, h, 2, seed=2)
    enc = Encoder(w, h)
    path = tmp_path / "ssim.ivf"
    with IVFWriter(path, "VP80", w, h) as writer:
        for f in clip:
            writer.append_frame(enc.encode_with_minimum_ssim(f, 0.80))
    for raster, f in zip(FilePlayer(path), clip):
        assert ssim(raster.display()[0], f[0]) >= 0.80 - 0.005


def test_lf_search_threads_identical(monkeypatch):
    """The loop-filter search's parallel candidate evaluation must pick
    the exact level (and bytes) of the serial climb — the chunked
    break-on-first-drop replays the reference's decision sequence."""
    w, h = 96, 64
    clip = gen_clip(w, h, 3, seed=5)
    outs = {}
    for k in ("1", "4"):
        monkeypatch.setenv("ALFALFA_LF_THREADS", k)
        enc = Encoder(w, h)
        outs[k] = [enc.encode_with_quantizer(f, 52, key_frame=i == 0)
                   for i, f in enumerate(clip)]
    assert outs["1"] == outs["4"]
