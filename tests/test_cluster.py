"""Parallel chunk encode + serial rebase (ExCamera pipeline in-framework,
parallel/cluster.py)."""
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent / "fixtures"))
from gen_inputs import gen_clip
from alfalfa_tpu.parallel.cluster import parallel_encode
from alfalfa_tpu.util.ivf import IVFWriter
from alfalfa_tpu.util.ssim import ssim
from alfalfa_tpu.decoder import FilePlayer

ORACLE = Path(__file__).parent.parent / "oracle/build/bin/decode-to-stdout"


def test_parallel_encode_stitches(tmp_path):
    w, h, n = 80, 64, 12
    clip = gen_clip(w, h, n, seed=23)
    out = tmp_path / "par.ivf"
    with IVFWriter(out, "VP80", w, h, 1, 1, 0) as writer:
        stats = parallel_encode(clip, w, h, writer, y_ac_qi=40,
                                chunk_frames=4, workers=2)
    assert len(stats) == 3 and stats[1]["rebased"]

    rasters = list(FilePlayer(out))
    assert len(rasters) == n
    q = np.mean([ssim(r.display()[0], f[0]) for r, f in zip(rasters, clip)])
    assert q > 0.7

    if ORACLE.exists():
        ours = b"".join(r.dump_bytes() for r in rasters)
        res = subprocess.run([str(ORACLE), str(out)], capture_output=True)
        assert res.returncode == 0 and res.stdout == ours


def test_parallel_matches_single_worker(tmp_path):
    """The pipeline is deterministic: worker count must not change the
    output stream."""
    w, h, n = 64, 48, 8
    clip = gen_clip(w, h, n, seed=29)
    outs = []
    for workers in (1, 3):
        p = tmp_path / f"w{workers}.ivf"
        with IVFWriter(p, "VP80", w, h, 1, 1, 0) as writer:
            parallel_encode(clip, w, h, writer, y_ac_qi=48,
                            chunk_frames=3, workers=workers)
        outs.append(p.read_bytes())
    assert outs[0] == outs[1]
