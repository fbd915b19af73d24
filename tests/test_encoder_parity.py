"""Encoder parity vs the reference encoder (oracle xc-enc) at matched
quantizers: size and SSIM must track closely (BASELINE.md: SSIM/PSNR >=
alfalfa at matched bitrate)."""
import os
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent / "fixtures"))
from gen_inputs import gen_clip, write_y4m
from alfalfa_tpu.encoder import Encoder
from alfalfa_tpu.util.ivf import IVFWriter, IVFReader
from alfalfa_tpu.util.ssim import ssim
from alfalfa_tpu.decoder import FilePlayer

XC_ENC = Path(__file__).parent.parent / "oracle/build/bin/xc-enc"


@pytest.mark.skipif(not XC_ENC.exists(), reason="oracle not built")
@pytest.mark.parametrize("qi", [24, 48, 80])
def test_matched_quantizer_parity(tmp_path, qi):
    w, h, n = 176, 144, 4
    clip = gen_clip(w, h, n, seed=7)
    y4m = tmp_path / "in.y4m"
    write_y4m(str(y4m), clip, w, h)

    ref_ivf = tmp_path / "ref.ivf"
    subprocess.run([str(XC_ENC), "-i", "y4m", "-o", str(ref_ivf),
                    "--y-ac-qi", str(qi), str(y4m)],
                   check=True, capture_output=True)
    ours_ivf = tmp_path / "ours.ivf"
    enc = Encoder(w, h)
    with IVFWriter(str(ours_ivf), "VP80", w, h, 1, 1, 0) as wr:
        for f in clip:
            wr.append_frame(enc.encode_with_quantizer(f, qi))

    def stats(path):
        sizes = sum(len(p) for p in IVFReader(str(path)))
        qs = [ssim(r.display()[0], f[0])
              for r, f in zip(FilePlayer(str(path)), clip)]
        return sizes, float(np.mean(qs))

    ref_size, ref_ssim = stats(ref_ivf)
    our_size, our_ssim = stats(ours_ivf)
    assert our_ssim >= ref_ssim - 0.01
    assert our_size <= ref_size * 1.10
