"""Rebase parity vs the oracle `xc-enc -r` on codec-typical content
(reference frontend/xc-enc.cc:262-326 + reencode.cc:305-381): run the
same chunk-encode / terminate / rebase pipeline through the oracle
binaries and through our CLI, then gate stitched size and SSIM at the
same kind of margins as tests/test_rd_curves.py."""
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent / "fixtures"))
from gen_inputs import write_y4m
from alfalfa_tpu.util.ivf import IVFReader
from alfalfa_tpu.util.ssim import ssim
from alfalfa_tpu.decoder import FilePlayer

FIXTURES = Path(__file__).parent / "fixtures"
ORACLE_BIN = Path(__file__).parent.parent / "oracle" / "build" / "bin"
XC = [sys.executable, "-m", "alfalfa_tpu.cli.xc"]
QI = 48
KF_Q_WEIGHT = 0.5


def _run(cmd, **kw):
    subprocess.run([str(c) for c in cmd], check=True, capture_output=True,
                   **kw)


@pytest.mark.slow
@pytest.mark.skipif(not (ORACLE_BIN / "xc-enc").exists(),
                    reason="oracle not built")
def test_rebase_parity_vs_oracle(tmp_path):
    clip = [r.display()
            for r in FilePlayer(str(FIXTURES / "inter_176x144_q8.ivf"))]
    w, h = 176, 144
    half = len(clip) // 2
    c0_y4m, c1_y4m = tmp_path / "c0.y4m", tmp_path / "c1.y4m"
    write_y4m(str(c0_y4m), clip[:half], w, h)
    write_y4m(str(c1_y4m), clip[half:], w, h)

    def pipeline(tag, enc_chunk, terminate, rebase):
        """chunk encodes -> terminate chunk0 -> rebase chunk1."""
        c0 = tmp_path / f"{tag}_c0.ivf"
        c1 = tmp_path / f"{tag}_c1.ivf"
        c0t = tmp_path / f"{tag}_c0t.ivf"
        st = tmp_path / f"{tag}_exit.state"
        rb = tmp_path / f"{tag}_rebased.ivf"
        enc_chunk(c0_y4m, c0)
        enc_chunk(c1_y4m, c1)
        terminate(c0, c0t, st)
        rebase(c1_y4m, c1, st, rb)
        return c0t, rb

    def oracle_enc(src, out):
        _run([ORACLE_BIN / "xc-enc", "-i", "y4m", "-o", out,
              "--y-ac-qi", QI, src])

    def oracle_term(src, out, st):
        _run([ORACLE_BIN / "xc-terminate-chunk", src, out, st])

    def oracle_rebase(src_y4m, pred, st, out):
        _run([ORACLE_BIN / "xc-enc", "-W", "-r", "-i", "y4m", "-o", out,
              "-p", pred, "-I", st, "-w", KF_Q_WEIGHT, src_y4m],
             stdin=subprocess.DEVNULL)

    def our_enc(src, out):
        _run(XC + ["enc", "-i", "y4m", "-o", out, "--y-ac-qi", QI, src])

    def our_term(src, out, st):
        _run(XC + ["terminate-chunk", src, out, "-O", st])

    def our_rebase(src_y4m, pred, st, out):
        _run(XC + ["enc", "-r", "-i", "y4m", "-o", out, "-p", pred,
                   "-I", st, "-w", KF_Q_WEIGHT, src_y4m])

    ref_c0t, ref_rb = pipeline("ref", oracle_enc, oracle_term,
                               oracle_rebase)
    our_c0t, our_rb = pipeline("ours", our_enc, our_term, our_rebase)

    def stitched_stats(c0t, rb):
        cat = tmp_path / f"cat_{c0t.stem}.ivf"
        from alfalfa_tpu.util.ivf import IVFWriter
        with IVFWriter(str(cat), "VP80", w, h) as wr:
            for p in IVFReader(str(c0t)):
                wr.append_frame(p)
            for p in IVFReader(str(rb)):
                wr.append_frame(p)
        rasters = list(FilePlayer(str(cat)))
        assert len(rasters) == len(clip)
        s = float(np.mean([ssim(r.display()[0], f[0])
                           for r, f in zip(rasters, clip)]))
        rb_size = sum(len(p) for p in IVFReader(str(rb)))
        return rb_size, s

    ref_size, ref_ssim = stitched_stats(ref_c0t, ref_rb)
    our_size, our_ssim = stitched_stats(our_c0t, our_rb)
    print(f"rebase parity: size ours={our_size} ref={ref_size} "
          f"ssim ours={our_ssim:.4f} ref={ref_ssim:.4f}")
    assert our_ssim >= ref_ssim - 0.005
    assert our_size <= ref_size * 1.05
