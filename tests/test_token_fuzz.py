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
        # every coefficient coded, dense cat4-6 tokens; |v| <= 127 keeps
        # the compact stream's value-escape list within its designed
        # rarely-used capacity (the GOP fast path hands universal
        # escapes back to the Python parser by design)
        a.coeffs[:] = rng.choice(
            np.array([-127, -67, -5, 4, 66, 127], np.int16),
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


def _simd_supported():
    import alfalfa_tpu.native.bitwork as bw
    import os
    saved = bw._simdlib
    bw._simdlib = None
    old = os.environ.get("ALFALFA_SIMD_TOKENS")
    os.environ["ALFALFA_SIMD_TOKENS"] = "1"
    try:
        return bw._load_simd() is not None
    finally:
        bw._simdlib = saved
        if old is None:
            del os.environ["ALFALFA_SIMD_TOKENS"]
        else:
            os.environ["ALFALFA_SIMD_TOKENS"] = old


@pytest.mark.skipif(not _simd_supported(), reason="no AVX-512 on this host")
@pytest.mark.parametrize("style", ["extremes", "dense-max"])
def test_simd_tokens_extreme_values(style, monkeypatch):
    """The SIMD DFA's category-5/6 extra-bit chains and sign states on
    magnitudes fixtures never produce: scalar GOP parse == SIMD parse on
    the synthetic streams, compact output and all."""
    import alfalfa_tpu.native.bitwork as bw
    from alfalfa_tpu.encoder.serializer import FrameSerializer

    rng = np.random.default_rng(99)
    R, C, G = 4, 6, 3
    probs = DecoderState.initial(C * 16, R * 16).probability_tables
    frames = [_random_coeff_frame(rng, R, C, style) for _ in range(G)]
    parts, skips, y2s = [], [], []
    for a in frames:
        fs = FrameSerializer.__new__(FrameSerializer)
        fs.a = a
        fs.probs = probs
        fs.h = type("H", (), {"log2_number_of_dct_partitions": 0})()
        parts.append(fs.serialize_tokens())
        skips.append(a.skip_coeff.astype(np.uint8))
        y2s.append(a.y2_coded.astype(np.uint8))
    skip_all = np.stack(skips)
    y2_all = np.stack(y2s)
    probs_list = [probs.coeff_probs] * G

    outs = {}
    for simd in (False, True):
        if simd:
            monkeypatch.setenv("ALFALFA_SIMD_TOKENS", "1")
            bw._simdlib = None
            assert bw._load_simd() is not None
        else:
            bw._simdlib = False
        try:
            hnz = np.zeros((G, R, C), np.uint8)
            cs = bw.parse_tokens_gop(parts, R, C, probs_list,
                                     skip_all, y2_all, hnz, threads=1)
            assert cs is not None
            outs[simd] = (cs, hnz)
        finally:
            bw._simdlib = None
    (a_cs, a_h), (b_cs, b_h) = outs[False], outs[True]
    assert a_cs.keys() == b_cs.keys()
    for k in a_cs:
        np.testing.assert_array_equal(a_cs[k], b_cs[k], k)
    np.testing.assert_array_equal(a_h, b_h)


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
