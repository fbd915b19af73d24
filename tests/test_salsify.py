"""Salsify integration: sender -> receiver over loopback UDP.

Mirrors what the reference tests only via live runs (scripts/run-contest):
(1) lossless loopback — every frame arrives, receiver tracks the sender's
advertised target states exactly; (2) lossy loopback — dropped fragments
force partial-frame concealment and the state-addressed recovery path.
"""
import sys
import threading
import time
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent / "fixtures"))
from gen_inputs import gen_clip
from alfalfa_tpu.input.frame_input import FrameInput
from alfalfa_tpu.salsify import SalsifyReceiver, SalsifySender

W, H, N_FRAMES = 64, 48, 6
PORT = 19877


class ClipInput(FrameInput):
    def __init__(self, clip, width, height):
        self.clip = list(clip)
        self.i = 0
        self.w, self.h = width, height

    def get_next_frame(self):
        if self.i >= len(self.clip):
            return None
        f = self.clip[self.i]
        self.i += 1
        return f

    @property
    def display_width(self):
        return self.w

    @property
    def display_height(self):
        return self.h


def run_pair(port, drop_fragments=(), mode="s2", expect_frames=N_FRAMES):
    """Run a sender/receiver pair on loopback; returns (sender, receiver,
    received_rasters)."""
    clip = gen_clip(W, H, N_FRAMES, seed=5)
    received = []
    receiver = SalsifyReceiver(port, W, H, on_raster=received.append)
    if drop_fragments:
        # drop selected (frame_no, fragment_no) data packets once each
        import alfalfa_tpu.net.packet as pkt
        real_recv = receiver.socket.recv
        dropped = set()

        def lossy_recv(*a, **kw):
            while True:
                d = real_recv(*a, **kw)
                p = pkt.Packet.parse(d.payload)
                key = (p.frame_no, p.fragment_no)
                if key in drop_fragments and key not in dropped:
                    dropped.add(key)
                    continue
                return d
        receiver.socket.recv = lossy_recv

    # exit as soon as the expected frames are displayed; the generous idle
    # timeout is only a backstop — it must outlive even pathologically slow
    # encode cycles (a loaded CI host), else the receiver dies mid-stream
    # and the sender sees ICMP-unreachable
    rt = threading.Thread(
        target=lambda: receiver.run(max_frames=expect_frames,
                                    timeout_ms=60000), daemon=True)
    rt.start()

    sender = SalsifySender("127.0.0.1", port, 1337,
                           ClipInput(clip, W, H), mode=mode,
                           drop_frames_while_busy=False)
    try:
        sender.run(max_frames=N_FRAMES)
        # let in-flight datagrams land, then wait out the receiver's idle exit
        deadline = time.monotonic() + 30
        while rt.is_alive() and time.monotonic() < deadline:
            rt.join(0.1)
    finally:
        sender.close()
        receiver.close()
    return sender, receiver, received


def test_lossless_loopback():
    sender, receiver, received = run_pair(PORT)
    assert sender.frames_sent == N_FRAMES
    assert len(received) == N_FRAMES
    # with zero loss the receiver lands on the sender's assumed state
    assert receiver.current_state == sender.receiver_assumed_state
    # sender learned the receiver's state from acks
    assert sender.receiver_last_acked_state is not None
    assert sender.avg_delay is not None
    # receiver banked complete states for state-addressed encoding
    assert receiver.complete_states
    for s in receiver.complete_states:
        assert s in receiver.decoders


def test_lossless_content_matches_encoder():
    """The decoded rasters must match the sender-side encoder's own
    reconstruction (the encoder re-decodes its own frames, so its last
    reference IS the receiver's output)."""
    sender, receiver, received = run_pair(PORT + 1, mode="s1")
    assert len(received) == N_FRAMES
    last_encoder = sender.encoders[sender.receiver_assumed_state]
    ey, eu, ev = last_encoder.references.last.display()
    ry, ru, rv = received[-1].display()
    assert np.array_equal(ey, ry)
    assert np.array_equal(eu, ru)
    assert np.array_equal(ev, rv)


def test_lossy_loopback_concealment():
    """Drop the tail fragment of one frame: the receiver should conceal and
    keep displaying, and the sender should keep the stream decodable via
    state-addressed encoding."""
    # frame payloads at q~64 on 64x48 are small; frame 2 fragment 0 dropped
    # means frame 2 is concealed entirely when frame 3 arrives
    sender, receiver, received = run_pair(PORT + 2, drop_fragments={(2, 0)},
                                          expect_frames=N_FRAMES - 1)
    # the loss inflates the receiver's delay EWMA (a full frame gap with no
    # grace), so the sender may legitimately skip frames while the imputed
    # budget recovers — what must hold is that the loss didn't kill the
    # stream: everything sent before/after the loss decodes and displays
    assert sender.frames_sent >= 3
    assert len(received) >= sender.frames_sent - 2
    # receiver moved past the lossy frame via concealment
    assert receiver.next_frame_no >= 3


def test_conventional_mode_loopback():
    """Conventional mode: one encode per frame at the AIMD-controlled
    quantizer; every frame is sent (sender.cc:452-488, 563)."""
    sender, receiver, received = run_pair(PORT + 3, mode="conventional")
    assert sender.frames_sent == N_FRAMES
    assert len(received) == N_FRAMES
