"""The JAX device reconstruction must be bit-exact vs the golden hashes
(and hence vs the numpy scalar path and the reference decoder)."""
import hashlib

import pytest

from alfalfa_tpu.decoder import FilePlayer

from conftest import FIXTURES, fixture_manifest


def decode_all(path):
    out = b""
    for raster in FilePlayer(path, backend="jax"):
        out += raster.dump_bytes()
    return out


@pytest.mark.parametrize("name", [
    "kf_64x48_q40.ivf",          # single keyframe, B_PRED heavy
    "kf_176x144_q16.ivf",        # low QP keyframe
    "inter_176x144_q96.ivf",     # inter frames, coarse quantizer
    "inter_176x144_rt_q48.ivf",  # realtime mode encode
])
def test_jax_bit_exact(name):
    manifest = fixture_manifest()
    out = decode_all(FIXTURES / name)
    assert hashlib.sha1(out).hexdigest() == manifest[name]["yuv_sha1"]


@pytest.mark.slow
@pytest.mark.parametrize("name", [
    "inter_176x144_q32.ivf",
    "inter_176x144_q8.ivf",
    "inter_320x240_q40.ivf",
    "ssim80_176x144.ivf",
    "twopass_176x144_q32.ivf",
])
def test_jax_bit_exact_slow(name):
    manifest = fixture_manifest()
    out = decode_all(FIXTURES / name)
    assert hashlib.sha1(out).hexdigest() == manifest[name]["yuv_sha1"]
