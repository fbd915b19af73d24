"""State serialization tests: byte-compat with reference .state files,
resume-from-state decode, minihash interop, randomized roundtrip."""
import numpy as np
import pytest

from alfalfa_tpu.state import serdes, hashing
from alfalfa_tpu.state.decoder_state import (DecoderState, ProbabilityTables,
                                             Segmentation, FilterAdjustments,
                                             References, Raster)

from conftest import FIXTURES


def test_reference_state_file_roundtrip():
    orig = open(FIXTURES / "dump_frame5.state", "rb").read()
    state, refs = serdes.load_decoder(orig)
    assert (state.width, state.height) == (176, 144)
    assert serdes.save_decoder(state, refs) == orig


def test_minihash_matches_reference_value():
    # golden value printed by the reference Decoder::minihash() for this state
    state, refs = serdes.load_decoder(FIXTURES / "dump_frame5.state")
    mh = hashing.minihash(hashing.decoder_hash(
        state.hash(), refs.last.hash(), refs.golden.hash(),
        refs.alternative.hash()))
    assert mh == 4013583801


@pytest.mark.parametrize("seed", range(4))
def test_randomized_state_roundtrip(seed):
    rng = np.random.RandomState(seed)
    w, h = 64, 48
    state = DecoderState(w, h)
    state.probability_tables.coeff_probs = rng.randint(
        1, 255, (4, 8, 3, 11)).astype(np.uint8)
    state.probability_tables.mv_probs = rng.randint(1, 255, (2, 19)).astype(np.uint8)
    if seed % 2:
        seg = Segmentation.create(w, h)
        seg.absolute = bool(seed % 4 == 1)
        seg.quantizer_adjustments = rng.randint(-63, 64, 4).astype(np.int8)
        seg.map[:3, :4] = rng.randint(0, 4, (3, 4))
        state.segmentation = seg
    if seed % 3:
        fa = FilterAdjustments()
        fa.ref_adjustments = rng.randint(-63, 64, 4).astype(np.int8)
        state.filter_adjustments = fa
    refs = References.create(w, h)
    refs.last.y[:] = rng.randint(0, 256, refs.last.y.shape)

    data = serdes.save_decoder(state, refs)
    state2, refs2 = serdes.load_decoder(data)
    assert state2 == state
    assert np.array_equal(refs2.last.y, refs.last.y)
    assert serdes.save_decoder(state2, refs2) == data
