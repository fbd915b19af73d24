"""SSIM parity vs the reference's x264-backed metric.

The reference wraps libx264's x264_8_pixel_ssim_wxh
(/root/reference/src/util/ssim.cc:24-57); util/ssim.py re-derives the
same windowed integer SSIM.  This gate compares our values against the
oracle xc-ssim binary frame-by-frame so `xc enc -s <target>` means
exactly what the reference CLI means.
"""
import subprocess
from pathlib import Path

import pytest

from alfalfa_tpu.util.ssim import ssim
from alfalfa_tpu.decoder import FilePlayer

from conftest import FIXTURES

XC_SSIM = Path(__file__).parent.parent / "oracle" / "build" / "bin" / \
    "xc-ssim"

PAIRS = [
    ("inter_176x144_q32.ivf", "inter_176x144_q96.ivf"),
    ("natural/pan_qcif_q16.ivf", "natural/pan_qcif_q96.ivf"),
    ("natural/grain_qcif_q48.ivf", "natural/grain_qcif_q112.ivf"),
]


@pytest.mark.parametrize("a,b", PAIRS)
def test_ssim_matches_x264(a, b):
    if not XC_SSIM.exists():
        pytest.skip("oracle not built")
    pa, pb = str(FIXTURES / a), str(FIXTURES / b)
    want = [float(line) for line in subprocess.run(
        [str(XC_SSIM), "-1", "ivf", "-2", "ivf", pa, pb],
        check=True, capture_output=True, text=True).stdout.split()]
    ra = [r.display() for r in FilePlayer(pa)]
    rb = [r.display() for r in FilePlayer(pb)]
    assert len(want) == min(len(ra), len(rb))
    for i, (x, y) in enumerate(zip(ra, rb)):
        ours = ssim(x[0], y[0])
        assert abs(ours - want[i]) < 1e-6, \
            f"frame {i}: ours {ours} vs x264 {want[i]}"
