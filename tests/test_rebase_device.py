"""Device rebase parity: update_residues with the TPU inter-MB path must
produce byte-identical output to the host per-MB loop across the full
chunked-encode + rebase pipeline."""
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent / "fixtures"))
from gen_inputs import gen_clip
from alfalfa_tpu.encoder import Encoder
from alfalfa_tpu.encoder import reencode as RB
from alfalfa_tpu.util.ivf import IVFWriter, IVFReader
from alfalfa_tpu.bitstream.header import UncompressedChunk
from alfalfa_tpu.decoder.parse import FrameParser
from alfalfa_tpu.state.decoder_state import DecoderState


def _parse_frames(payloads, w, h):
    state = DecoderState.initial(w, h)
    out = []
    for payload in payloads:
        chunk = UncompressedChunk(payload, w, h)
        header, arrays, _ = FrameParser(state).parse(chunk)
        out.append((chunk.key_frame, header, arrays))
    return out


def _rebase(tmp_path, device):
    w, h, n = 80, 48, 5
    clip = gen_clip(w, h, n, seed=41)

    # chunk 0 establishes the inherited state
    enc0 = Encoder(w, h, device_encode=device)
    for f in clip[:2]:
        enc0.encode_with_quantizer(f, 44)
    state, refs = enc0.state.copy(), enc0.references.copy()

    # independently encoded prediction chunk for frames 2..n
    encp = Encoder(w, h, device_encode=device)
    pred_payloads = [encp.encode_with_quantizer(f, 44) for f in clip[2:]]
    pred = _parse_frames(pred_payloads, w, h)

    reb = Encoder(w, h, device_encode=device)
    reb.state, reb.references = state, refs
    out_path = tmp_path / f"rebased_{device}.ivf"
    with IVFWriter(out_path, "VP80", w, h) as writer:
        RB.reencode(reb, clip[2:], pred, 0.5, False, writer)
    return [p for p in IVFReader(out_path)]


def test_device_rebase_bit_identical(tmp_path):
    host = _rebase(tmp_path, device=False)
    dev = _rebase(tmp_path, device=True)
    assert len(host) == len(dev) and len(host) >= 3
    for i, (a, b) in enumerate(zip(host, dev)):
        assert a == b, f"rebased frame {i} differs between host and device"
