"""The AVX-512 8-lane DFA token decoder (native/tokensimd.cc) must emit
the exact compact coefficient stream of the scalar interleaved parser
(bitwork.cc vp8_parse_tokens_gop) — same deltas, escapes, values, and
has_nonzero map — on real fixture streams, keyframe and inter."""
import numpy as np
import pytest

from alfalfa_tpu.util.ivf import IVFReader
from alfalfa_tpu.parallel.gop import BatchedGopDecoder
import alfalfa_tpu.native.bitwork as bw


def _supported():
    saved = bw._simdlib
    bw._simdlib = None
    import os
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


def _batches(path, G, use_simd, monkeypatch):
    if use_simd:
        monkeypatch.setenv("ALFALFA_SIMD_TOKENS", "1")
        bw._simdlib = None
        assert bw._load_simd() is not None
    else:
        bw._simdlib = False
    ivf = IVFReader(path)
    payloads = [ivf.frame(i) for i in range(len(ivf))]
    dec = BatchedGopDecoder(ivf.width, ivf.height, G)
    out = []
    for p in payloads:
        _, batch, _, _ = dec.parse_frame_batch([p] * G)
        out.append({k: np.asarray(v) for k, v in batch.items()
                    if v is not None and hasattr(v, "shape")})
    return out


@pytest.mark.skipif(not _supported(), reason="no AVX-512 on this host")
@pytest.mark.parametrize("path", [
    "tests/fixtures/kf_64x48_q40.ivf",       # keyframe, B_PRED (no Y2 mbs)
    "tests/fixtures/kf_176x144_q16.ivf",     # dense keyframe
    "tests/fixtures/inter_176x144_q96.ivf",  # interframe, skips
    "tests/fixtures/inter_320x240_q40.ivf",  # bigger inter, value escapes
])
def test_simd_tokens_equal_scalar(path, monkeypatch):
    try:
        want = _batches(path, 3, False, monkeypatch)
        got = _batches(path, 3, True, monkeypatch)
    finally:
        bw._simdlib = None      # re-resolve from env next use
    for f, (a, b) in enumerate(zip(want, got)):
        assert a.keys() == b.keys()
        for k in a:
            assert np.array_equal(a[k], b[k]), f"{path} frame {f}: {k}"


@pytest.mark.skipif(not _supported(), reason="no AVX-512 on this host")
def test_simd_tokens_paired_engines(monkeypatch):
    """G > 8 on ONE thread interleaves both 8-lane engines in a single
    loop (run_engine_pair) — must stay bit-identical to the scalar
    parser, including the uneven 8+4 split."""
    path = "tests/fixtures/inter_320x240_q40.ivf"
    monkeypatch.setenv("ALFALFA_PARSE_THREADS", "1")
    for G in (12, 16, 20, 32):   # 8+4, 8+8, pair+single, two pairs
        try:
            want = _batches(path, G, False, monkeypatch)
            got = _batches(path, G, True, monkeypatch)
        finally:
            bw._simdlib = None
        for f, (a, b) in enumerate(zip(want, got)):
            for k in a:
                assert np.array_equal(a[k], b[k]), f"G={G} frame {f}: {k}"


@pytest.mark.skipif(not _supported(), reason="no AVX-512 on this host")
@pytest.mark.parametrize("G,threads", [(12, 2), (32, 4)])
def test_simd_tokens_wide_batch(G, threads, monkeypatch):
    """G > 8 splits into 8-lane engines fanned over threads — the
    wide-lockstep (ALFALFA_BENCH_G) configuration.  G=32/threads=4
    covers every engine worker owning its own schedule scratch."""
    path = "tests/fixtures/inter_176x144_q96.ivf"
    monkeypatch.setenv("ALFALFA_PARSE_THREADS", str(threads))
    try:
        want = _batches(path, G, False, monkeypatch)
        got = _batches(path, G, True, monkeypatch)
    finally:
        bw._simdlib = None
    for f, (a, b) in enumerate(zip(want, got)):
        for k in a:
            assert np.array_equal(a[k], b[k]), f"frame {f}: {k}"
