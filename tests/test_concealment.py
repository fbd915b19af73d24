"""Error concealment: truncated frames decode with partial data
(UncompressedChunk corruption levels, BoolDecoder valid_, ZEROMV-from-LAST
fallback; uncompressed_chunk.cc:80-130, macroblock.cc:343-352)."""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent / "fixtures"))
from alfalfa_tpu.util.ivf import IVFReader
from alfalfa_tpu.decoder.decoder import Decoder

FIXTURES = Path(__file__).parent / "fixtures"


def test_truncated_interframe_conceals():
    ivf = IVFReader(str(FIXTURES / "inter_176x144_q32.ivf"))
    d = Decoder(ivf.width, ivf.height, error_concealment=True)
    shown, full0 = d.decode_frame(ivf.frame(0))

    # cut the next interframe in half: residues (and possibly part of the
    # first partition) are lost; the decoder must still produce a raster
    payload = ivf.frame(1)
    truncated = payload[:len(payload) // 2]
    shown, raster = d.decode_frame(truncated)
    y = raster.display()[0]
    assert y.shape == full0.display()[0].shape
    # the concealed frame leans on the last reference: it must correlate
    # strongly with frame 0 rather than being garbage
    diff = np.abs(y.astype(np.int32) -
                  full0.display()[0].astype(np.int32)).mean()
    assert diff < 16

    # the stream continues decodable after concealment
    shown, nxt = d.decode_frame(ivf.frame(2))
    assert nxt is not None


def test_concealment_disabled_raises():
    ivf = IVFReader(str(FIXTURES / "inter_176x144_q32.ivf"))
    d = Decoder(ivf.width, ivf.height, error_concealment=False)
    d.decode_frame(ivf.frame(0))
    payload = ivf.frame(1)
    try:
        d.decode_frame(payload[:8])
    except Exception:
        return
    raise AssertionError("truncated frame should raise without concealment")
