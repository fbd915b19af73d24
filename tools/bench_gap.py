#!/usr/bin/env python3
"""Locate the gap between profile_decode's staged fps and bench.py's
measured fps: times (a) decode_frame_batch loop with a reused decoder,
(b) fresh-decoder decode_frame_batch loop, (c) fresh-decoder
decode_stream loop (the bench path), and (d) decoder construction alone.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from alfalfa_tpu.util.ivf import IVFReader
from alfalfa_tpu.parallel.gop import BatchedGopDecoder

CLIP = "tests/fixtures/inter_1280x720_q48.ivf"
G = int(os.environ.get("G", "8"))

ivf = IVFReader(CLIP)
payloads = [ivf.frame(i) for i in range(len(ivf))]
n = len(payloads)

dec = BatchedGopDecoder(ivf.width, ivf.height, G)
for p in payloads:
    (y, u, v), _ = dec.decode_frame_batch([p] * G)
jax.block_until_ready(y)


def fence(y):
    return float(jnp.ravel(y)[0])


def timed(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        y = fn()
        fence(y)
        best = min(best, time.perf_counter() - t0)
    return best


def loop_reuse():
    for p in payloads:
        (y, u, v), _ = dec.decode_frame_batch([p] * G)
    return y


def loop_fresh():
    d = BatchedGopDecoder(ivf.width, ivf.height, G)
    for p in payloads:
        (y, u, v), _ = d.decode_frame_batch([p] * G)
    return y


def loop_stream():
    d = BatchedGopDecoder(ivf.width, ivf.height, G)
    for (y, u, v), _ in d.decode_stream([p] * G for p in payloads):
        pass
    return y


t = timed(loop_reuse)
print(f"reuse  decode_frame_batch: {t*1000:.1f} ms -> {G*n/t:.1f} fps")
t = timed(loop_fresh)
print(f"fresh  decode_frame_batch: {t*1000:.1f} ms -> {G*n/t:.1f} fps")
t = timed(loop_stream)
print(f"fresh  decode_stream:      {t*1000:.1f} ms -> {G*n/t:.1f} fps")
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    d = BatchedGopDecoder(ivf.width, ivf.height, G)
    jax.block_until_ready(jax.tree.leaves(d.refs))
    best = min(best, time.perf_counter() - t0)
print(f"decoder construction:      {best*1000:.1f} ms")
