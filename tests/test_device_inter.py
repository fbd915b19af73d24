"""Device (TPU) inter-frame encoder parity: the Pallas raster kernel must
produce byte-identical frames to the host per-MB loop
(encode_inter_np.encode_interframe), in both best and realtime quality."""
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent / "fixtures"))
from gen_inputs import gen_clip
from alfalfa_tpu.encoder import Encoder


@pytest.mark.parametrize("quality,qi", [("best", 40), ("rt", 64)])
def test_device_interframe_bit_identical(quality, qi):
    w, h = 80, 48
    clip = gen_clip(w, h, 3, seed=31)
    host = Encoder(w, h, device_encode=False, quality=quality)
    dev = Encoder(w, h, device_encode=True, quality=quality)
    for i, f in enumerate(clip):
        kf = i == 0
        ph = host.encode_with_quantizer(f, qi, key_frame=kf)
        pd = dev.encode_with_quantizer(f, qi, key_frame=kf)
        assert ph == pd, f"device interframe {i} differs from host"
    assert host.minihash() == dev.minihash()


def test_device_interframe_decodes():
    from alfalfa_tpu.decoder.decoder import FramePlayer
    w, h = 64, 48
    clip = gen_clip(w, h, 2, seed=32)
    enc = Encoder(w, h, device_encode=True)
    player = FramePlayer(w, h)
    for i, f in enumerate(clip):
        payload = enc.encode_with_quantizer(f, 48, key_frame=(i == 0))
        shown, raster = player.decoder.decode_frame(payload)
        assert shown and raster is not None
