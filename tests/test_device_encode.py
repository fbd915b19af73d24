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


@pytest.mark.parametrize("qi", [16, 56])
def test_device_twopass_keyframe_bit_identical(qi):
    """--two-pass on device: the single trellis-quantizing kernel pass is
    byte-identical to the host two-pass loop (whose first pass is
    recomputed by the second)."""
    w, h = 80, 48
    clip = gen_clip(w, h, 2, seed=31)
    host = Encoder(w, h, device_encode=False, two_pass=True)
    dev = Encoder(w, h, device_encode=True, two_pass=True)
    for f in clip:
        ph = host.encode_with_quantizer(f, qi, key_frame=True)
        pd = dev.encode_with_quantizer(f, qi, key_frame=True)
        assert ph == pd, "device two-pass keyframe differs from host"
    assert host.minihash() == dev.minihash()


def test_device_twopass_nondefault_probs():
    """Two-pass trellis token costs follow the PERSISTED probability
    tables (refresh_entropy_probs), not the defaults: run a frame first
    so the state's tables move, then compare the next keyframe."""
    w, h = 64, 48
    clip = gen_clip(w, h, 3, seed=33)
    host = Encoder(w, h, device_encode=False, two_pass=True)
    dev = Encoder(w, h, device_encode=True, two_pass=True)
    for f in clip:
        ph = host.encode_with_quantizer(f, 40, key_frame=True)
        pd = dev.encode_with_quantizer(f, 40, key_frame=True)
        assert ph == pd
