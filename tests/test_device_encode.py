"""Device (TPU) keyframe encoder parity: the Pallas wavefront encoder must
produce byte-identical frames to the host per-MB loop (and therefore stay
inside every oracle-gated property the host path already has)."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent / "fixtures"))
from gen_inputs import gen_clip
from alfalfa_tpu.encoder import Encoder


@pytest.mark.parametrize("qi", [24, 64])
def test_device_keyframe_bit_identical(qi):
    w, h = 80, 48
    clip = gen_clip(w, h, 2, seed=21)
    host = Encoder(w, h, device_encode=False)
    dev = Encoder(w, h, device_encode=True)
    for f in clip:
        ph = host.encode_with_quantizer(f, qi, key_frame=True)
        pd = dev.encode_with_quantizer(f, qi, key_frame=True)
        assert ph == pd, "device keyframe encode differs from host"
    assert host.minihash() == dev.minihash()


def test_device_keyframe_decodes():
    from alfalfa_tpu.decoder.decoder import FramePlayer
    w, h = 80, 48
    clip = gen_clip(w, h, 1, seed=22)
    enc = Encoder(w, h, device_encode=True)
    payload = enc.encode_with_quantizer(clip[0], 40, key_frame=True)
    player = FramePlayer(w, h)
    shown, raster = player.decoder.decode_frame(payload)
    assert shown and raster is not None
