"""Bitstream roundtrip: parse every fixture frame, re-serialize with the
same probability tables, byte-compare with the original (the reference's
key invariant; tests/roundtrip.cc:104-113)."""
import pytest

from alfalfa_tpu.util.ivf import IVFReader
from alfalfa_tpu.bitstream.header import UncompressedChunk
from alfalfa_tpu.state.decoder_state import DecoderState
from alfalfa_tpu.decoder.parse import FrameParser
from alfalfa_tpu.encoder.serializer import serialize_frame

from conftest import FIXTURES

CLIPS = [
    "kf_64x48_q40.ivf",
    "kf_176x144_q16.ivf",
    "inter_176x144_q32.ivf",
    "inter_176x144_q96.ivf",
    "inter_176x144_rt_q48.ivf",
    "ssim80_176x144.ivf",
    "twopass_176x144_q32.ivf",
    "inter_320x240_q40.ivf",
]


@pytest.mark.parametrize("name", CLIPS)
def test_parse_serialize_identity(name):
    ivf = IVFReader(FIXTURES / name)
    state = DecoderState.initial(ivf.width, ivf.height)
    for i, payload in enumerate(ivf):
        chunk = UncompressedChunk(payload, ivf.width, ivf.height)
        header, arrays, frame_probs = FrameParser(state).parse(chunk)
        out = serialize_frame(header, arrays, frame_probs, chunk.key_frame,
                              ivf.width, ivf.height, chunk.show_frame)
        assert out == payload, f"frame {i} of {name} does not roundtrip"
