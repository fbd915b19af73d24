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


def test_truncation_sweep_across_frames():
    """Sweep cut points across every frame of the fixture: any prefix must
    decode to a full-size raster that leans on the last reference, and the
    stream must stay decodable afterwards (uncompressed_chunk.cc:80-130)."""
    ivf = IVFReader(str(FIXTURES / "inter_176x144_q32.ivf"))
    shape = None
    for frame_no in range(1, min(4, len(ivf))):
        for frac in (0.05, 0.2, 0.4, 0.6, 0.8, 0.95):
            d = Decoder(ivf.width, ivf.height, error_concealment=True)
            _, full0 = d.decode_frame(ivf.frame(0))
            ref_y = full0.display()[0].astype(np.int32)
            if shape is None:
                shape = ref_y.shape
            for i in range(1, frame_no):
                d.decode_frame(ivf.frame(i))
                ref_y = d.references.last.display()[0].astype(np.int32)
            payload = ivf.frame(frame_no)
            cut = max(1, int(len(payload) * frac))
            _, raster = d.decode_frame(payload[:cut])
            y = raster.display()[0]
            assert y.shape == shape
            diff = np.abs(y.astype(np.int32) - ref_y).mean()
            assert diff < 24, (frame_no, frac, diff)
            # stream continues decodable after concealment
            nxt = min(frame_no + 1, len(ivf) - 1)
            _, after = d.decode_frame(ivf.frame(nxt))
            assert after.display()[0].shape == shape


def test_fragment_partial_frame_path():
    """FragmentedFrame.partial_frame: the valid fragment prefix decodes
    under concealment — the receiver's flush path for incomplete frames
    (salsify-receiver.cc:227-243, packet-level)."""
    from alfalfa_tpu.net import packet as P

    ivf = IVFReader(str(FIXTURES / "inter_176x144_q32.ivf"))
    d = Decoder(ivf.width, ivf.height, error_concealment=True)
    _, full0 = d.decode_frame(ivf.frame(0))
    ref_y = full0.display()[0].astype(np.int32)

    payload = ivf.frame(1)
    # shrink the wire MTU so the small fixture frame spans many fragments
    saved = P.MAXIMUM_PAYLOAD
    P.MAXIMUM_PAYLOAD = 120
    try:
        out = P.FragmentedFrame(7, source_state=1, target_state=2,
                                frame_no=1, time_since_last=0,
                                whole_frame=payload)
        frags = out.fragments
        assert len(frags) >= 3
        # drop the tail: deliver only a prefix of fragments
        ff = P.FragmentedFrame(7, packet=frags[0])
        for p in frags[1:len(frags) // 2]:
            ff.add_packet(p)
        assert not ff.complete()
        partial = ff.partial_frame()
        assert 0 < len(partial) < len(payload)
    finally:
        P.MAXIMUM_PAYLOAD = saved
    _, raster = d.decode_frame(partial)
    diff = np.abs(raster.display()[0].astype(np.int32) - ref_y).mean()
    assert diff < 24


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
