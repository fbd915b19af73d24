"""Native interframe MB-header serializer vs the pure-Python writer.

The IVF fixtures exercise the common paths (test_roundtrip.py runs the
native writer against the original bytes); this file covers the corners
the fixtures never hit: segmentation-map updates, sign-bias flips in the
MV census, golden/altref references, every SPLITMV scheme, and clamped
NEWMV deltas.  Oracle = the Python loop (serializer.cc:165-316 mirror).
"""
import copy
import os

import numpy as np
import pytest

from alfalfa_tpu.bitstream import tables as T
from alfalfa_tpu.bitstream.header import UncompressedChunk, UpdateSegmentation
from alfalfa_tpu.decoder.parse import FrameArrays, FrameParser
from alfalfa_tpu.encoder.serializer import FrameSerializer
from alfalfa_tpu.state.decoder_state import DecoderState
from alfalfa_tpu.util.ivf import IVFReader

from conftest import FIXTURES

_BASE_HEADER = None


def _base_interframe_header():
    """A real parsed InterFrameHeader to mutate (synthetic defaults are not
    serializable: optional header fields default to None)."""
    global _BASE_HEADER
    if _BASE_HEADER is None:
        ivf = IVFReader(FIXTURES / "inter_176x144_q32.ivf")
        state = DecoderState.initial(ivf.width, ivf.height)
        payloads = list(ivf)
        FrameParser(state).parse(
            UncompressedChunk(payloads[0], ivf.width, ivf.height))
        header, _, _ = FrameParser(state).parse(
            UncompressedChunk(payloads[1], ivf.width, ivf.height))
        _BASE_HEADER = header
    return copy.deepcopy(_BASE_HEADER)


def _random_frame(rng, R, C, seg, skip_flag, sign_bias):
    a = FrameArrays(R, C)
    ref = rng.integers(0, 4, (R, C)).astype(np.int8)
    a.ref[:] = ref
    intra = ref == 0
    a.ymode[:] = np.where(intra, rng.integers(0, 5, (R, C)),
                          rng.integers(5, 10, (R, C))).astype(np.int8)
    # bmode doubles as the SPLITMV submode plane (10..13); give intra
    # B_PRED MBs intra submodes and SPLITMV MBs submv_ref leaves
    bm_intra = rng.integers(0, 10, (R, C, 4, 4))
    bm_split = rng.integers(10, 14, (R, C, 4, 4))
    a.bmode[:] = np.where((a.ymode == T.SPLITMV)[:, :, None, None],
                          bm_split, bm_intra).astype(np.int8)
    a.uvmode[:] = rng.integers(0, 4, (R, C)).astype(np.int8)
    a.skip_coeff[:] = rng.integers(0, 2, (R, C)).astype(bool)
    # even quarter-pel MVs, large enough to clamp at the frame border
    a.sub_mv[:] = (rng.integers(-2000, 2000, (R, C, 4, 4, 2)) * 2).astype(
        np.int16)
    a.splitmv_pid[:] = np.where(a.ymode == T.SPLITMV,
                                rng.integers(0, 4, (R, C)), -1).astype(np.int8)

    h = _base_interframe_header()
    h.update_segmentation = None
    h.prob_skip_false = int(rng.integers(1, 255)) if skip_flag else None
    h.prob_inter = int(rng.integers(1, 255))
    h.prob_references_last = int(rng.integers(1, 255))
    h.prob_references_golden = int(rng.integers(1, 255))
    h.sign_bias_golden = bool(sign_bias & 1)
    h.sign_bias_alternate = bool(sign_bias & 2)
    if seg:
        probs = [int(rng.integers(1, 255)), None, int(rng.integers(1, 255))]
        h.update_segmentation = UpdateSegmentation(
            update_mb_segmentation_map=True, mb_segmentation_map=probs)
        a.segment_update[:] = rng.integers(0, 4, (R, C)).astype(np.int16)

    probs = DecoderState.initial(C * 16, R * 16).probability_tables
    probs.y_mode_probs[:] = rng.integers(1, 255, probs.y_mode_probs.shape)
    probs.uv_mode_probs[:] = rng.integers(1, 255, probs.uv_mode_probs.shape)
    probs.mv_probs[:] = rng.integers(1, 255, probs.mv_probs.shape)
    return h, a, probs


@pytest.mark.parametrize("seg,skip_flag,sign_bias", [
    (False, True, 0),
    (False, False, 1),
    (True, True, 2),
    (True, True, 3),
])
def test_native_matches_python(seg, skip_flag, sign_bias):
    rng = np.random.default_rng(hash((seg, skip_flag, sign_bias)) & 0xFFFF)
    for trial in range(4):
        R, C = int(rng.integers(2, 9)), int(rng.integers(2, 9))
        h, a, probs = _random_frame(rng, R, C, seg, skip_flag, sign_bias)
        fs = FrameSerializer(h, a, probs, key_frame=False,
                             width=C * 16, height=R * 16)
        native = fs.serialize_first_partition()
        os.environ["ALFALFA_NATIVE_MODES"] = "0"
        try:
            py = fs.serialize_first_partition()
        finally:
            os.environ["ALFALFA_NATIVE_MODES"] = "1"
        assert native == py, (seg, skip_flag, sign_bias, trial, R, C)
