"""Correctness gate for the batched GOP decoder (the bench path).

The reference gates decode with SHA-1 golden vectors
(/root/reference/src/tests/decoding.test:6-21); here the batched lockstep
decoder (parallel/gop.py) must produce exactly the rasters of the serial
FilePlayer on every fixture, per GOP slot.  Without this, bench.py's
throughput number would come from an unvalidated code path.
"""
import json
import pathlib

import numpy as np
import pytest

from alfalfa_tpu.util.ivf import IVFReader
from alfalfa_tpu.decoder.decoder import FilePlayer
from alfalfa_tpu.parallel.gop import BatchedGopDecoder

FIXTURES = pathlib.Path(__file__).parent / "fixtures"

CLIPS = ["kf_176x144_q16.ivf", "inter_176x144_q96.ivf",
         "inter_176x144_q32.ivf", "inter_320x240_q40.ivf"]


@pytest.mark.parametrize("clip", CLIPS)
def test_batched_equals_serial(clip):
    path = str(FIXTURES / clip)
    ivf = IVFReader(path)
    payloads = [ivf.frame(i) for i in range(len(ivf))]

    G = 3
    dec = BatchedGopDecoder(ivf.width, ivf.height, G)
    player = FilePlayer(path)

    for f, p in enumerate(payloads):
        (y, u, v), show = dec.decode_frame_batch([p] * G)
        raster = player.decode(p)
        assert all(s == (raster is not None) for s in show)
        if raster is None:
            continue
        y, u, v = np.asarray(y), np.asarray(u), np.asarray(v)
        for g in range(G):
            assert (y[g] == raster.y).all(), f"{clip} frame {f} slot {g}: Y"
            assert (u[g] == raster.u).all(), f"{clip} frame {f} slot {g}: U"
            assert (v[g] == raster.v).all(), f"{clip} frame {f} slot {g}: V"


def test_async_overflow_retry(monkeypatch):
    """When the async token job's scale-1 capacity guess overflows (rc -2),
    join() must transparently re-run the synchronous grow-and-retry path
    and still return the exact compact stream."""
    from alfalfa_tpu.native import bitwork

    path = str(FIXTURES / "inter_320x240_q40.ivf")
    ivf = IVFReader(path)
    payloads = [ivf.frame(i) for i in range(len(ivf))]
    G = 3

    def batches(**kw):
        dec = BatchedGopDecoder(ivf.width, ivf.height, G)
        out = []
        for p in payloads:
            _, batch, _, _ = dec.parse_frame_batch([p] * G)
            out.append({k: np.asarray(v) for k, v in batch.items()
                        if v is not None and hasattr(v, "shape")})
        return out

    want = batches()

    orig = bitwork._gop_buffers
    calls = {"n": 0}

    def tiny_first(su, dense_g, scale):
        calls["n"] += 1
        if scale == 1:   # sabotage only the async job's first guess
            su = dict(su, frame_bytes=[0] * su["G"])
            b = orig(su, dense_g, 0)
            # 16-entry segments: guaranteed overflow on real content
            seg = np.zeros_like(b["seg_meta"])
            np.cumsum([16] * su["G"], out=seg[1:su["G"] + 1])
            np.cumsum([4] * su["G"],
                      out=seg[2 * su["G"] + 2:3 * su["G"] + 2])
            b["seg_meta"] = seg
            for k in ("sp_delta", "sp_val"):
                b[k] = b[k][:int(seg[su["G"]])].copy()
            return b
        return orig(su, dense_g, scale)

    monkeypatch.setattr(bitwork, "_gop_buffers", tiny_first)
    # threads=2 takes the real _TokenJob (thread-spawning) join path
    monkeypatch.setenv("ALFALFA_PARSE_THREADS", "2")
    got = batches()
    assert calls["n"] > 0
    for f, (a, b) in enumerate(zip(want, got)):
        assert a.keys() == b.keys()
        for k in a:
            assert np.array_equal(a[k], b[k]), f"frame {f}: {k}"


def test_mt_parse_equals_serial(monkeypatch):
    """The multithreaded native token parse (vp8_parse_tokens_gop_mt:
    G independent range-decoder streams split over OS threads) must emit
    the exact batch the serial interleaved call does — same compact
    coefficient stream, same context planes."""
    path = str(FIXTURES / "inter_320x240_q40.ivf")
    ivf = IVFReader(path)
    payloads = [ivf.frame(i) for i in range(len(ivf))]
    G = 5  # odd split: threads get 2/1/1/1 streams

    def batches(threads):
        monkeypatch.setenv("ALFALFA_PARSE_THREADS", str(threads))
        dec = BatchedGopDecoder(ivf.width, ivf.height, G)
        out = []
        for p in payloads:
            _, batch, _, _ = dec.parse_frame_batch([p] * G)
            out.append({k: np.asarray(v) for k, v in batch.items()
                        if v is not None and hasattr(v, "shape")})
        return out

    serial, mt = batches(1), batches(4)
    for f, (a, b) in enumerate(zip(serial, mt)):
        assert a.keys() == b.keys()
        for k in a:
            assert np.array_equal(a[k], b[k]), f"frame {f}: {k}"


@pytest.mark.slow
def test_batched_equals_manifest_720p():
    """The bench configuration itself (720p, lockstep GOPs) against the
    golden decode hash from the fixture manifest (the same SHA-1 the
    serial decoder is gated on in test_decode.py)."""
    import hashlib
    from alfalfa_tpu.state.decoder_state import Raster

    with open(FIXTURES / "manifest.json") as fh:
        manifest = json.load(fh)
    clip = "inter_1280x720_q48.ivf"

    path = str(FIXTURES / clip)
    ivf = IVFReader(path)
    payloads = [ivf.frame(i) for i in range(len(ivf))]
    G = 2
    dec = BatchedGopDecoder(ivf.width, ivf.height, G)
    digests = [hashlib.sha1() for _ in range(G)]
    for p in payloads:
        (y, u, v), show = dec.decode_frame_batch([p] * G)
        y, u, v = np.asarray(y), np.asarray(u), np.asarray(v)
        for g in range(G):
            if show[g]:
                r = Raster(ivf.width, ivf.height, y[g], u[g], v[g])
                digests[g].update(r.dump_bytes())
    for g in range(G):
        assert digests[g].hexdigest() == manifest[clip]["yuv_sha1"], \
            f"slot {g}"


def test_decode_stream_equals_frame_batch():
    """decode_stream (the pipelined path bench.py times) must be
    bit-identical to decode_frame_batch (the serial path): the stream
    variant has its own upload/dispatch ordering on a worker thread, and
    the bench's bit_exact flag certifies the timed path (VERDICT r4
    item 5)."""
    path = str(FIXTURES / "inter_320x240_q40.ivf")
    ivf = IVFReader(path)
    payloads = [ivf.frame(i) for i in range(len(ivf))]
    G = 3

    dec_a = BatchedGopDecoder(ivf.width, ivf.height, G)
    serial = []
    for p in payloads:
        (y, u, v), show = dec_a.decode_frame_batch([p] * G)
        serial.append((np.asarray(y), np.asarray(u), np.asarray(v),
                       list(show)))

    dec_b = BatchedGopDecoder(ivf.width, ivf.height, G)
    n = 0
    for f, ((y, u, v), show) in enumerate(
            dec_b.decode_stream([p] * G for p in payloads)):
        ys, us, vs, shows = serial[f]
        assert list(show) == shows
        assert (np.asarray(y) == ys).all(), f"frame {f}: Y"
        assert (np.asarray(u) == us).all(), f"frame {f}: U"
        assert (np.asarray(v) == vs).all(), f"frame {f}: V"
        n += 1
    assert n == len(payloads)
