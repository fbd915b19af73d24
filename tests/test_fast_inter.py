"""Fast (split decision/dense) device interframe encoder gates.

The fast path (encoder/encode_inter_fast.py, ALFALFA_FAST_INTER=1) is
NOT bit-exact vs the host rt loop — its intra screening uses source
neighbors — so it is gated on the properties that actually matter:

1. stream validity / decode-exactness: the emitted bytes decode through
   the normal host decoder, and the decoded reference state matches the
   encoder's own reference raster bit for bit (the invariant every VP8
   encoder must keep, decoder.cc / encode_inter.cc:231-369);
2. rate/quality parity: sizes and SSIM stay within a small band of the
   bit-exact rt encoder on the same content.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent / "fixtures"))
from gen_inputs import gen_clip
from alfalfa_tpu.encoder import Encoder
from alfalfa_tpu.decoder.decoder import Decoder
from alfalfa_tpu.util.ssim import ssim


def _roundtrip(clip, w, h, qi, fast, monkeypatch):
    monkeypatch.setenv("ALFALFA_FAST_INTER", "1" if fast else "0")
    enc = Encoder(w, h, device_encode=True, quality="rt")
    dec = Decoder(w, h)
    sizes, quals = [], []
    for i, f in enumerate(clip):
        payload = enc.encode_with_quantizer(f, qi, key_frame=i == 0)
        sizes.append(len(payload))
        _, raster = dec.decode_frame(payload)
        # decoder's post-filter reference must equal the encoder's
        ref = enc.references.last
        assert np.array_equal(np.asarray(dec.references.last.y),
                              np.asarray(ref.y)), f"frame {i} Y drift"
        assert np.array_equal(np.asarray(dec.references.last.u),
                              np.asarray(ref.u)), f"frame {i} U drift"
        assert np.array_equal(np.asarray(dec.references.last.v),
                              np.asarray(ref.v)), f"frame {i} V drift"
        quals.append(ssim(np.asarray(raster.y),
                          np.asarray(f[0] if isinstance(f, tuple)
                                     else f.y)))
    return sizes, quals


@pytest.mark.parametrize("size,qi", [((80, 48), 64), ((76, 44), 48)])
def test_fast_inter_decodes_exactly(size, qi, monkeypatch):
    w, h = size
    clip = gen_clip(w, h, 5, seed=7)
    _roundtrip(clip, w, h, qi, True, monkeypatch)


def test_fast_inter_multiqp_decodes_exactly(monkeypatch):
    """The fused speculative pair (one vmapped dispatch over the QP axis)
    must produce two independently decode-exact streams."""
    import copy
    from alfalfa_tpu.bitstream.header import QuantIndices
    from alfalfa_tpu.encoder.encode_inter_fast import (
        encode_interframe_fast_multiqp)

    monkeypatch.setenv("ALFALFA_FAST_INTER", "1")
    w, h = 80, 48
    clip = gen_clip(w, h, 3, seed=23)
    enc = Encoder(w, h, device_encode=True, quality="rt")
    kf = enc.encode_with_quantizer(clip[0], 60, key_frame=True)
    encs = [enc, copy.deepcopy(enc)]
    quants = [QuantIndices(y_ac_qi=56), QuantIndices(y_ac_qi=72)]
    results = encode_interframe_fast_multiqp(encs, clip[1], quants)
    assert len(results) == 2
    for e, (payload, _q) in zip(encs, results):
        dec = Decoder(w, h)
        dec.decode_frame(kf)
        dec.decode_frame(payload)
        assert np.array_equal(np.asarray(dec.references.last.y),
                              np.asarray(e.references.last.y))
        assert np.array_equal(np.asarray(dec.references.last.u),
                              np.asarray(e.references.last.u))
        assert np.array_equal(np.asarray(dec.references.last.v),
                              np.asarray(e.references.last.v))
    # distinct quantizers must yield distinct streams
    assert results[0][0] != results[1][0]


def test_fast_inter_rd_parity(monkeypatch):
    """Sizes and SSIM vs the bit-exact rt encoder on the same clip."""
    w, h, qi = 80, 48, 56
    clip = gen_clip(w, h, 6, seed=19)
    fs, fq = _roundtrip(clip, w, h, qi, True, monkeypatch)
    hs, hq = _roundtrip(clip, w, h, qi, False, monkeypatch)
    # per-clip totals: the fast path may make slightly different
    # decisions but must stay in the same rd neighborhood
    assert sum(fs) <= sum(hs) * 1.15, (fs, hs)
    assert np.mean(fq) >= np.mean(hq) - 0.01, (fq, hq)
