"""encode_with_target_size: quantizer search driven by the 1/4-subsampled
size estimator (encoder.cc:592-629, size_estimation.cc)."""
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent / "fixtures"))
from gen_inputs import gen_clip
from alfalfa_tpu.encoder import Encoder
from alfalfa_tpu.decoder import FramePlayer

W, H = 176, 144


def test_estimator_monotone_and_scaled():
    clip = gen_clip(W, H, 1, seed=21)
    enc = Encoder(W, H)
    sizes = [enc.estimate_frame_size(clip[0], qi) for qi in (8, 48, 96, 120)]
    # coarser quantizer -> smaller estimate
    assert sizes == sorted(sizes, reverse=True)
    # the estimate is in the ballpark of a real encode (x16 scaling sane):
    real = len(enc.fork().encode_with_quantizer(clip[0], 48))
    est = sizes[1]
    assert real / 4 <= est <= real * 4


def test_target_size_tracks_budget():
    clip = gen_clip(W, H, 3, seed=22)
    enc = Encoder(W, H)
    budgets = [9000, 3000, 1500]
    payloads = []
    for frame, budget in zip(clip, budgets):
        payloads.append(enc.encode_with_target_size(frame, budget))
    # estimator is approximate: sizes must track the budget within ~2x
    for p, budget in zip(payloads, budgets):
        assert len(p) <= 2 * budget
    # and the stream still decodes
    player = FramePlayer(W, H)
    for p in payloads:
        assert player.decode(p) is not None


def test_target_size_output_decodes_in_oracle(tmp_path):
    import subprocess
    oracle = Path(__file__).parent.parent / "oracle/build/bin/vp8decode"
    if not oracle.exists():
        pytest.skip("oracle not built")
    from alfalfa_tpu.util.ivf import IVFWriter
    clip = gen_clip(W, H, 2, seed=23)
    enc = Encoder(W, H)
    out = tmp_path / "ts.ivf"
    with IVFWriter(str(out), "VP80", W, H, 30, 1, 0) as w:
        for frame in clip:
            w.append_frame(enc.encode_with_target_size(frame, 4000))
    r = subprocess.run([str(oracle), str(out), str(tmp_path / "o.y4m")],
                       capture_output=True)
    assert r.returncode == 0, r.stderr.decode()
