"""ExCamera rebase integration: independent chunk encodes stitched via
terminate-chunk + state dump + rebase, with minihash chain verification
and oracle-identical decode of the stitched stream."""
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, str(__import__('pathlib').Path(__file__).parent / "fixtures"))
from gen_inputs import gen_clip

from alfalfa_tpu.encoder.encoder import Encoder
from alfalfa_tpu.encoder import reencode as RB
from alfalfa_tpu.util.ivf import IVFReader, IVFWriter
from alfalfa_tpu.util.ssim import ssim
from alfalfa_tpu.decoder import FilePlayer
from alfalfa_tpu.decoder.decoder import Decoder
from alfalfa_tpu.decoder.parse import FrameParser
from alfalfa_tpu.decoder import reconstruct_np
from alfalfa_tpu.bitstream.header import UncompressedChunk
from alfalfa_tpu.state import serdes

from conftest import FIXTURES

ORACLE = FIXTURES.parent.parent / "oracle" / "build" / "bin" / "decode-to-stdout"


def _encode_chunk(clip, w, h, qp):
    enc = Encoder(w, h)
    payloads = [enc.encode_with_quantizer(f, qp) for f in clip]
    return enc, payloads


def _parse_ivf_frames(payloads, w, h):
    dec = Decoder(w, h)
    out = []
    for payload in payloads:
        chunk = UncompressedChunk(payload, w, h)
        header, arrays, _ = FrameParser(dec.state).parse(chunk)
        raster = reconstruct_np.reconstruct(header, arrays, dec.state,
                                            dec.references, chunk.key_frame)
        dec._update_references(chunk.key_frame, header, raster)
        out.append((chunk.key_frame, header, arrays))
    return out


def test_chunked_rebase_stitches(tmp_path):
    w, h, n = 80, 64, 8
    clip = gen_clip(w, h, n, seed=17)
    qp = 40

    # two independently encoded chunks
    enc0, chunk0 = _encode_chunk(clip[:4], w, h, qp)
    _, chunk1 = _encode_chunk(clip[4:], w, h, qp)

    # terminate chunk 0 (refresh-all on its last frame) and take exit state
    dec = Decoder(w, h)
    term0 = []
    for i, payload in enumerate(chunk0):
        chunk = UncompressedChunk(payload, w, h)
        header, arrays, frame_probs = FrameParser(dec.state).parse(chunk)
        if i == len(chunk0) - 1 and not chunk.key_frame:
            header.refresh_last = True
            header.refresh_golden_frame = True
            header.refresh_alternate_frame = True
            header.copy_buffer_to_golden = None
            header.copy_buffer_to_alternate = None
            from alfalfa_tpu.encoder.serializer import serialize_frame
            payload = serialize_frame(header, arrays, frame_probs, False, w, h)
        raster = reconstruct_np.reconstruct(header, arrays, dec.state,
                                            dec.references, chunk.key_frame)
        dec._update_references(chunk.key_frame, header, raster)
        term0.append(payload)

    state_bytes = serdes.save_decoder(dec.state, dec.references)
    entry_minihash = dec.minihash()

    # rebase chunk 1 against the inherited state
    enc1 = Encoder(w, h)
    enc1.state, enc1.references = serdes.load_decoder(state_bytes)
    assert enc1.minihash() == entry_minihash  # serdes round-trips the hash

    pred = _parse_ivf_frames(chunk1, w, h)
    out_path = tmp_path / "rebased.ivf"
    with IVFWriter(out_path, "VP80", w, h, 1, 1, entry_minihash) as writer:
        RB.reencode(enc1, clip[4:], pred, 0.5, False, writer)

    # stitched stream decodes continuously and matches in the oracle decoder
    stitched = tmp_path / "stitched.ivf"
    with IVFWriter(stitched, "VP80", w, h) as writer:
        for p in term0:
            writer.append_frame(p)
        for p in IVFReader(out_path):
            writer.append_frame(p)

    rasters = list(FilePlayer(stitched))
    assert len(rasters) == n
    quality = np.mean([ssim(r.display()[0], f[0]) for r, f in zip(rasters, clip)])
    assert quality > 0.70

    if ORACLE.exists():
        ours = b"".join(r.dump_bytes() for r in rasters)
        out = subprocess.run([str(ORACLE), str(stitched)], capture_output=True)
        assert out.returncode == 0 and out.stdout == ours

    # minihash chain: decoder after chunk 0 matches the rebased entry hash
    dec2 = Decoder(w, h)
    for p in term0:
        dec2.decode_frame(p)
    assert dec2.minihash() == entry_minihash
