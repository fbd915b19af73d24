"""Decoder-feature golden gate over synthesized streams.

The fixtures produced by our encoder never exercise SPLITMV, segmentation,
golden/alt prediction, sign biases, multi-partition token decode, or
refresh_entropy_probs persistence (the reference encoder has the same
blind spot, encode_inter.cc:269).  gen_feature_streams.py authors streams
that do; this gate decodes them with the reference binary (oracle) and
requires our numpy, device, and batched decoders to match byte-for-byte —
the reference's decoding.test idea extended to the feature tail.
"""
import pathlib
import subprocess

import numpy as np
import pytest

import gen_feature_streams as G

ORACLE = (pathlib.Path(__file__).parent.parent / "oracle" / "build" / "bin"
          / "decode-to-stdout")

STREAMS = sorted(G.GENERATORS)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("feature_corpus")
    for name, gen in G.GENERATORS.items():
        gen(d / name)
    return d


def _decode_ours(path, backend):
    from alfalfa_tpu.decoder.decoder import FilePlayer
    out = b""
    for raster in FilePlayer(str(path), backend=backend):
        out += raster.dump_bytes()
    return out


@pytest.fixture(scope="module")
def numpy_yuv(corpus):
    return {name: _decode_ours(corpus / name, "numpy") for name in STREAMS}


@pytest.mark.parametrize("name", STREAMS)
def test_oracle_bit_exact(corpus, numpy_yuv, name):
    if not ORACLE.exists():
        pytest.skip("oracle decoder not built")
    want = subprocess.run([str(ORACLE), str(corpus / name)],
                          capture_output=True, check=True).stdout
    assert len(want) > 0
    assert numpy_yuv[name] == want


@pytest.mark.parametrize("name", STREAMS)
def test_device_bit_exact(corpus, numpy_yuv, name):
    assert _decode_ours(corpus / name, "jax") == numpy_yuv[name]


@pytest.mark.parametrize("name", STREAMS)
def test_batched_bit_exact(corpus, numpy_yuv, name):
    from alfalfa_tpu.state.decoder_state import Raster
    from alfalfa_tpu.util.ivf import IVFReader
    from alfalfa_tpu.parallel.gop import BatchedGopDecoder

    ivf = IVFReader(str(corpus / name))
    dec = BatchedGopDecoder(ivf.width, ivf.height, 2)
    out = [b"", b""]
    for i in range(len(ivf)):
        (y, u, v), show = dec.decode_frame_batch([ivf.frame(i)] * 2)
        y, u, v = np.asarray(y), np.asarray(u), np.asarray(v)
        for g in range(2):
            if show[g]:
                out[g] += Raster(ivf.width, ivf.height,
                                 y[g], u[g], v[g]).dump_bytes()
    assert out[0] == numpy_yuv[name]
    assert out[1] == numpy_yuv[name]


@pytest.mark.parametrize("name", STREAMS)
def test_roundtrip_identity(corpus, name):
    """parse(serialize) == identity also holds on the authored streams
    (reference roundtrip.cc:104-113)."""
    from alfalfa_tpu.util.ivf import IVFReader
    from alfalfa_tpu.bitstream.header import UncompressedChunk
    from alfalfa_tpu.decoder.parse import FrameParser
    from alfalfa_tpu.encoder.serializer import serialize_frame
    from alfalfa_tpu.state.decoder_state import DecoderState

    ivf = IVFReader(str(corpus / name))
    state = DecoderState.initial(ivf.width, ivf.height)
    for i in range(len(ivf)):
        payload = ivf.frame(i)
        chunk = UncompressedChunk(payload, ivf.width, ivf.height)
        header, arrays, frame_probs = FrameParser(state).parse(chunk)
        out = serialize_frame(header, arrays, frame_probs, chunk.key_frame,
                              ivf.width, ivf.height)
        assert out == payload, f"{name} frame {i} reserialization differs"


def test_mt_partition_decode_equals_serial(corpus, numpy_yuv, monkeypatch):
    """Wavefront-parallel token decode across DCT partitions
    (vp8_parse_tokens_mt: one thread per partition, MB (r, c) gated on
    MB (r-1, c)) must be bit-identical to the serial decode on the
    multi-partition SPLITMV stream (2/4/8 token partitions)."""
    monkeypatch.setenv("ALFALFA_PARSE_THREADS", "4")
    got = _decode_ours(corpus / "feat_splitmv.ivf", "numpy")
    assert got == numpy_yuv["feat_splitmv.ivf"]
