"""Native whole-header parser vs the declarative Python parser on
synthetic headers that exercise every optional branch (segmentation
feature data, lf delta updates, copy flags, mode prob refreshes, MV
updates) — fixtures rarely carry these.  Strategy: build a header with
randomized optional fields, serialize it with the Python writer, parse
the bytes back through BOTH parsers, require dataclass equality and
identical decoder state."""
import numpy as np
import pytest

from alfalfa_tpu.bitstream import tables as T
from alfalfa_tpu.bitstream.boolcoder import BoolDecoder, BoolEncoder
from alfalfa_tpu.bitstream.header import (InterFrameHeader, KeyFrameHeader,
                                          ModeRefLFDeltaUpdate, QuantIndices,
                                          SegmentFeatureData,
                                          UpdateSegmentation,
                                          parse_frame_header_fast)


def _maybe(rng, v):
    return int(v) if rng.random() < 0.5 else None


def _random_header(rng, key_frame):
    h = KeyFrameHeader() if key_frame else InterFrameHeader()
    if rng.random() < 0.7:
        fd = None
        if rng.random() < 0.7:
            fd = SegmentFeatureData(
                bool(rng.integers(2)),
                [_maybe(rng, rng.integers(-63, 64)) for _ in range(4)],
                [_maybe(rng, rng.integers(-31, 32)) for _ in range(4)])
        update_map = bool(rng.integers(2))
        probs = ([_maybe(rng, rng.integers(0, 256)) for _ in range(3)]
                 if update_map else None)
        h.update_segmentation = UpdateSegmentation(update_map, fd, probs)
    h.loop_filter_level = int(rng.integers(0, 64))
    h.sharpness_level = int(rng.integers(0, 8))
    h.mode_lf_adjustments_enabled = bool(rng.integers(2))
    if h.mode_lf_adjustments_enabled and rng.random() < 0.7:
        h.mode_lf_adjustments = ModeRefLFDeltaUpdate(
            [_maybe(rng, rng.integers(-31, 32)) for _ in range(4)],
            [_maybe(rng, rng.integers(-31, 32)) for _ in range(4)])
    h.log2_number_of_dct_partitions = int(rng.integers(0, 4))
    h.quant_indices = QuantIndices(
        int(rng.integers(0, 128)),
        *[_maybe(rng, rng.integers(-7, 8)) for _ in range(5)])
    h.refresh_entropy_probs = bool(rng.integers(2))
    h.token_prob_update = {
        (int(rng.integers(4)), int(rng.integers(8)), int(rng.integers(3)),
         int(rng.integers(11))): int(rng.integers(1, 256))
        for _ in range(rng.integers(0, 6))}
    h.prob_skip_false = _maybe(rng, rng.integers(1, 256))
    if not key_frame:
        h.refresh_golden_frame = bool(rng.integers(2))
        h.refresh_alternate_frame = bool(rng.integers(2))
        if not h.refresh_golden_frame:
            h.copy_buffer_to_golden = int(rng.integers(0, 3))
        if not h.refresh_alternate_frame:
            h.copy_buffer_to_alternate = int(rng.integers(0, 3))
        h.sign_bias_golden = bool(rng.integers(2))
        h.sign_bias_alternate = bool(rng.integers(2))
        h.refresh_last = bool(rng.integers(2))
        h.prob_inter = int(rng.integers(1, 256))
        h.prob_references_last = int(rng.integers(1, 256))
        h.prob_references_golden = int(rng.integers(1, 256))
        if rng.random() < 0.5:
            h.intra_16x16_prob = [int(v) for v in rng.integers(1, 256, 4)]
        if rng.random() < 0.5:
            h.intra_chroma_prob = [int(v) for v in rng.integers(1, 256, 3)]
        h.mv_prob_update = {
            (int(rng.integers(2)), int(rng.integers(T.MV_PROB_CNT))):
                ((int(v) << 1) if v else 1)
            for v in rng.integers(0, 128, rng.integers(0, 5))}
    return h


@pytest.mark.parametrize("key_frame", [False, True])
def test_fast_header_parse_fuzz(key_frame):
    rng = np.random.default_rng(42 + key_frame)
    for trial in range(40):
        want = _random_header(rng, key_frame)
        be = BoolEncoder()
        want.write(be)
        data = be.finish()

        bd = BoolDecoder(data, True)
        cls = KeyFrameHeader if key_frame else InterFrameHeader
        via_python = cls.parse(bd)
        assert via_python == want, trial   # writer/parser self-consistency

        fast = parse_frame_header_fast(data, key_frame)
        assert fast is not None, trial
        got, state = fast
        assert got == want, trial
        assert state == (bd.pos, bd.range, bd.value, bd.bit_count), trial
