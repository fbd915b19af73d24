"""Salsify over an emulated cellular link (reference scripts/run-contest).

Runs sender -> EmulatedLink (trace-shaped downlink, propagation delay,
drop-tail queue) -> receiver and checks that (1) the stream survives the
capacity dips and (2) the AIMD/target-size machinery adapts: frames sent
while the ACK-measured inter-packet delay is high are smaller than frames
sent when the path is fast.
"""
import sys
import threading
import time
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent / "fixtures"))
from gen_inputs import gen_clip
from alfalfa_tpu.net.emulation import EmulatedLink, lte_like_trace
from alfalfa_tpu.salsify import SalsifyReceiver, SalsifySender

from test_salsify import ClipInput

W, H = 64, 48
N_FRAMES = 80
RECV_PORT = 19899


@pytest.mark.slow
def test_salsify_over_emulated_link():
    clip = list(gen_clip(W, H, 12, seed=9)) * (N_FRAMES // 12 + 1)
    received = []
    receiver = SalsifyReceiver(RECV_PORT, W, H, on_raster=received.append)
    # ~550 kbit/s in the high windows, ~14 kbit/s in the dips (the budget
    # must actually bind for adaptation to show), 20 ms one-way delay
    trace = lte_like_trace(ms_total=12000, period_ms=3000,
                           high_pps=40, low_pps=1)
    link = EmulatedLink(0, RECV_PORT, trace, delay_ms=20,
                        queue_limit=32).start()

    rt = threading.Thread(
        target=lambda: receiver.run(max_frames=N_FRAMES, timeout_ms=60000),
        daemon=True)
    rt.start()

    sender = SalsifySender("127.0.0.1", link.listen_port, 1337,
                           ClipInput(clip, W, H), mode="s2",
                           drop_frames_while_busy=False)
    try:
        sender.run(max_frames=N_FRAMES)
        deadline = time.monotonic() + 20
        while rt.is_alive() and time.monotonic() < deadline and \
                len(received) < N_FRAMES // 2:
            rt.join(0.1)
    finally:
        sender.close()
        receiver.close()
        link.close()

    # stream survives the capacity dips
    assert len(received) >= N_FRAMES // 2, \
        f"only {len(received)} frames arrived"
    assert link.stats["delivered"] > 0 and link.stats["acks"] > 0

    # adaptation: with delay feedback present, frame sizes shrink when the
    # measured inter-packet delay is large (sender.cc:160-170 semantics)
    log = [(size, delay) for _, size, delay, _, _ in sender.sent_log
           if delay is not None]
    assert len(log) >= 20, "too few delay-informed sends to judge adaptation"
    sizes = np.array([s for s, _ in log], float)
    delays = np.array([d for _, d in log], float)
    hi = delays > np.median(delays)
    assert hi.any() and (~hi).any()
    assert sizes[hi].mean() < sizes[~hi].mean(), (
        f"no adaptation: mean size at high delay {sizes[hi].mean():.0f} >= "
        f"{sizes[~hi].mean():.0f} at low delay")
    corr = float(np.corrcoef(sizes, delays)[0, 1])
    assert corr < -0.2, f"size/delay correlation too weak: {corr:.2f}"
