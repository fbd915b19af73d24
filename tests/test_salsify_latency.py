"""Salsify per-frame latency measurement (salsify-sender.cc:160-170: the
design budget is 100 ms in flight, 33 ms frame interval).

The sender records each output's encode wall time; this test runs the
loopback pair and reports p50/p95 capture->send latency, gating only a
sanity bound today — the 720p/33 ms design point needs the device inter
encoder (tracked in VERDICT #2/#7).  Numbers are printed so the bench
log keeps a record per round.
"""
import sys
import threading
import time
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent / "fixtures"))
from gen_inputs import gen_clip
from alfalfa_tpu.salsify import SalsifyReceiver, SalsifySender

from test_salsify import ClipInput

W, H, N = 64, 48, 30
PORT = 19911


@pytest.mark.slow
def test_salsify_frame_latency():
    clip = list(gen_clip(W, H, 10, seed=4)) * 3
    received = []
    receiver = SalsifyReceiver(PORT, W, H, on_raster=received.append)
    rt = threading.Thread(
        target=lambda: receiver.run(max_frames=N, timeout_ms=30000),
        daemon=True)
    rt.start()
    sender = SalsifySender("127.0.0.1", PORT, 1337, ClipInput(clip, W, H),
                           mode="s2", drop_frames_while_busy=False)
    try:
        sender.run(max_frames=N)
        deadline = time.monotonic() + 10
        while rt.is_alive() and time.monotonic() < deadline and \
                len(received) < N:
            rt.join(0.1)
    finally:
        sender.close()
        receiver.close()

    enc_ms = np.array([e for *_, e in sender.sent_log], float)
    gaps = np.diff([t for _, _, _, t, _ in sender.sent_log]) * 1000
    assert len(enc_ms) >= N - 2
    p50, p95 = np.percentile(enc_ms, [50, 95])
    g50, g95 = np.percentile(gaps, [50, 95]) if len(gaps) else (0, 0)
    print(f"\nsalsify {W}x{H}: encode ms p50={p50:.1f} p95={p95:.1f}; "
          f"frame gap ms p50={g50:.1f} p95={g95:.1f}")
    # sanity bound only (real budget: 33 ms at 720p once inter encode is
    # on-device); keeps regressions visible without blocking the suite
    assert p95 < 2000, f"encode p95 {p95:.0f} ms"


@pytest.mark.slow
@pytest.mark.skipif(
    __import__("jax").default_backend() != "tpu",
    reason="the 33 ms design point is a TPU budget (device inter encode)")
def test_salsify_720p_design_point():
    """The reference's design point: 1280x720, 33 ms per-frame encode
    budget (salsify-sender.cc:160-170).  With the device inter encoder
    and the fused speculative pair, the steady-state p95 encode must fit
    the frame interval."""
    import os
    os.environ["ALFALFA_DEVICE_ENCODE"] = "1"
    try:
        w, h, n = 1280, 720, 40
        clip = list(gen_clip(w, h, 8, seed=11)) * 5
        received = []
        receiver = SalsifyReceiver(PORT + 1, w, h,
                                   on_raster=received.append)
        rt = threading.Thread(
            target=lambda: receiver.run(max_frames=n, timeout_ms=120000),
            daemon=True)
        rt.start()
        sender = SalsifySender("127.0.0.1", PORT + 1, 1338,
                               ClipInput(clip, w, h), mode="s2",
                               drop_frames_while_busy=False)
        try:
            sender.run(max_frames=n)
            deadline = time.monotonic() + 30
            while rt.is_alive() and time.monotonic() < deadline and \
                    len(received) < n:
                rt.join(0.1)
        finally:
            sender.close()
            receiver.close()

        # steady state: skip the keyframe + first interframe (compiles)
        enc_ms = np.array([e for *_, e in sender.sent_log[2:]], float)
        assert len(enc_ms) >= n - 6
        p50, p95 = np.percentile(enc_ms, [50, 95])
        print(f"\nsalsify 720p: encode ms p50={p50:.1f} p95={p95:.1f}")
        assert p95 <= 33, f"encode p95 {p95:.1f} ms > 33 ms budget"
    finally:
        os.environ.pop("ALFALFA_DEVICE_ENCODE", None)
