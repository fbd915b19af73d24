"""Trellis quantization / --two-pass (encoder.cc:220-408,
encode_intra.cc:409-431)."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent / "fixtures"))
from gen_inputs import gen_clip
from alfalfa_tpu.encoder import Encoder
from alfalfa_tpu.encoder.trellis import (
    _VALUE_COST, fill_token_costs, trellis_quantize, token_for_coeff)
from alfalfa_tpu.bitstream import tables as T
from alfalfa_tpu.decoder import FramePlayer

W, H = 176, 144


def test_value_cost_matches_reference_table():
    # spot values from the reference's hardcoded dct_value_cost
    # (encoder/costs.cc:632-645): ours is derived from the category
    # probabilities and must agree
    assert _VALUE_COST[0] == 8285        # coeff -2048
    assert _VALUE_COST[1] == 8277
    assert _VALUE_COST[2] == 8267
    assert _VALUE_COST[4095] == 8275     # coeff 2047


def test_token_for_coeff_boundaries():
    assert [token_for_coeff(v) for v in (0, 1, 4, 5, 6, 7, 10, 11, 18, 19,
                                         34, 35, 66, 67, 2047)] == \
        [0, 1, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 10, 10]


def test_trellis_identity_on_exact_coeffs():
    """Coefficients that are exact multiples of the factors survive
    unchanged (zero distortion at level 0 always wins)."""
    tc = fill_token_costs(T.DEFAULT_COEFF_PROBS)
    unq = np.zeros(16, np.int32)
    unq[T.ZIGZAG[0]] = 40
    unq[T.ZIGZAG[1]] = -24
    out = trellis_quantize(unq, 8, 8, tc[3], 0, 0, 10, 100)
    assert out[T.ZIGZAG[0]] == 5 and out[T.ZIGZAG[1]] == -3
    assert not out[[z for z in T.ZIGZAG[2:]]].any()


def test_two_pass_stream_decodes():
    clip = gen_clip(W, H, 2, seed=5)
    enc = Encoder(W, H, two_pass=True)
    p_kf = enc.encode_with_quantizer(clip[0], 64)
    p_if = enc.encode_with_quantizer(clip[1], 64)
    player = FramePlayer(W, H)
    assert player.decode(p_kf) is not None
    assert player.decode(p_if) is not None
    # decoded stream matches the encoder's own reconstruction bit-exactly
    assert np.array_equal(player.decoder.references.last.y,
                          enc.references.last.y)


def test_two_pass_changes_rd_point():
    """At matched quantizer the trellis trades a little distortion for
    rate: the keyframe must not be larger by more than noise, and the
    stream stays decodable by the oracle path (covered above)."""
    clip = gen_clip(W, H, 1, seed=5)
    p1 = Encoder(W, H).encode_with_quantizer(clip[0], 64)
    p2 = Encoder(W, H, two_pass=True).encode_with_quantizer(clip[0], 64)
    assert len(p2) <= len(p1) * 1.01
