"""Token-layer property fuzz: serialize random coefficient frames (all
token categories incl. cat5/cat6 extremes, EOB-everywhere, dense-max)
and parse them back — native serializer vs native parser must be a
perfect loop, including the sparse compact-stream emission the batched
decoder consumes.  Real fixture streams rarely reach the extreme
token categories; this does."""
import numpy as np
import pytest

from alfalfa_tpu.bitstream import tables as T
from alfalfa_tpu.decoder.parse import FrameArrays
from alfalfa_tpu.state.decoder_state import DecoderState


def _random_coeff_frame(rng, R, C, style):
    a = FrameArrays(R, C)
    a.y2_coded[:] = rng.integers(0, 2, (R, C)).astype(bool)
    if style == "dense-max":
        a.coeffs[:] = rng.choice(
            np.array([-2047, -67, -5, 4, 66, 2047], np.int16),
            size=a.coeffs.shape)
    elif style == "extremes":
        mask = rng.random(a.coeffs.shape) < 0.05
        vals = rng.choice(
            np.array([-2047, -1000, -35, -11, -4, -1,
                      1, 2, 3, 4, 6, 10, 18, 34, 66, 800, 2047], np.int16),
            size=a.coeffs.shape)
        a.coeffs[:] = np.where(mask, vals, 0)
    else:  # sparse-small
        mask = rng.random(a.coeffs.shape) < 0.01
        a.coeffs[:] = np.where(
            mask, rng.integers(-6, 7, a.coeffs.shape), 0).astype(np.int16)
    # Y2-coded MBs never carry DC in the Y blocks (parsed with first=1),
    # and only Y2-coded MBs carry a Y2 block: zero the never-coded slots
    # so serialize->parse is the identity
    a.coeffs[:, :, :16, 0] = np.where(a.y2_coded[:, :, None], 0,
                                      a.coeffs[:, :, :16, 0])
    a.coeffs[:, :, 24, :] = np.where(a.y2_coded[:, :, None],
                                     a.coeffs[:, :, 24, :], 0)
    # skip flag must reflect emptiness, as the encoder guarantees
    nz = a.coeffs.any(axis=(2, 3))
    a.skip_coeff[:] = ~nz
    a.has_nonzero[:] = nz
    return a


@pytest.mark.parametrize("style", ["sparse-small", "extremes", "dense-max"])
def test_token_serialize_parse_loop(style):
    from alfalfa_tpu.encoder.serializer import FrameSerializer
    from alfalfa_tpu.native import bitwork

    rng = np.random.default_rng(hash(style) & 0xFFFF)
    R, C = 5, 7
    probs = DecoderState.initial(C * 16, R * 16).probability_tables
    a = _random_coeff_frame(rng, R, C, style)

    fs = FrameSerializer.__new__(FrameSerializer)
    fs.a = a
    fs.probs = probs
    fs.h = type("H", (), {"log2_number_of_dct_partitions": 0})()
    parts = fs.serialize_tokens()
    assert len(parts) == 1

    coeffs_out = np.zeros((R, C, 25, 16), np.int16)
    hnz = np.zeros((R, C), np.uint8)
    ok = bitwork.parse_tokens(parts, R, C, probs.coeff_probs,
                              a.skip_coeff, a.y2_coded, coeffs_out, hnz)
    assert ok
    np.testing.assert_array_equal(coeffs_out, a.coeffs, style)
    np.testing.assert_array_equal(hnz.astype(bool), a.has_nonzero, style)
