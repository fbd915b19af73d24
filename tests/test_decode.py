"""Golden decode tests: bit-exact YUV vs oracle-generated manifest hashes.

Equivalent of the reference's decoding.test (SHA-1 of decoded output must
match the recorded golden hash)."""
import hashlib

import pytest

from alfalfa_tpu.decoder import FilePlayer

from conftest import FIXTURES, fixture_manifest

SMALL_CLIPS = [
    "kf_64x48_q40.ivf",
    "kf_176x144_q16.ivf",
    "inter_176x144_q32.ivf",
    "inter_176x144_q96.ivf",
    "inter_176x144_rt_q48.ivf",
    "ssim80_176x144.ivf",
    "twopass_176x144_q32.ivf",
]

LARGE_CLIPS = [
    "inter_176x144_q8.ivf",
    "inter_320x240_q40.ivf",
]


def decode_all(path):
    out = b""
    for raster in FilePlayer(path):
        out += raster.dump_bytes()
    return out


@pytest.mark.parametrize("name", SMALL_CLIPS)
def test_bit_exact_decode(name):
    manifest = fixture_manifest()
    out = decode_all(FIXTURES / name)
    assert len(out) == manifest[name]["yuv_bytes"]
    assert hashlib.sha1(out).hexdigest() == manifest[name]["yuv_sha1"]


@pytest.mark.slow
@pytest.mark.parametrize("name", LARGE_CLIPS)
def test_bit_exact_decode_large(name):
    manifest = fixture_manifest()
    out = decode_all(FIXTURES / name)
    assert hashlib.sha1(out).hexdigest() == manifest[name]["yuv_sha1"]


@pytest.mark.slow
def test_bit_exact_decode_720p():
    manifest = fixture_manifest()
    name = "inter_1280x720_q48.ivf"
    out = decode_all(FIXTURES / name)
    assert hashlib.sha1(out).hexdigest() == manifest[name]["yuv_sha1"]
