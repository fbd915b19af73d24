#!/usr/bin/env python3
"""True host/device split of the decode bench: parse+pack everything
first (host-only time), then run the device chain back-to-back with a
real fetch fence (device time).  Axon's block_until_ready returns before
remote execution completes, so per-step staging (profile_decode.py)
under-reports the device side; this tool fences with a scalar fetch.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from alfalfa_tpu.util.ivf import IVFReader
from alfalfa_tpu.parallel.gop import (BatchedGopDecoder, _pack_merged,
                                      _scatter_fn)

CLIP = "tests/fixtures/inter_1280x720_q48.ivf"
G = int(os.environ.get("G", "8"))

ivf = IVFReader(CLIP)
payloads = [ivf.frame(i) for i in range(len(ivf))]
n = len(payloads)

dec = BatchedGopDecoder(ivf.width, ivf.height, G)
for p in payloads:
    (y, u, v), _ = dec.decode_frame_batch([p] * G)
_ = float(jnp.ravel(y)[0])

# host-only: parse + pack (no jax)
best_host = float("inf")
for _ in range(3):
    d = BatchedGopDecoder(ivf.width, ivf.height, G)
    t0 = time.perf_counter()
    packed = []
    for p in payloads:
        key_frame, batch, flags, show = d.parse_frame_batch([p] * G)
        mega, spec_r, spec_c, off = _pack_merged(batch)
        packed.append((key_frame, mega, spec_r, spec_c, off))
    best_host = min(best_host, time.perf_counter() - t0)
print(f"host parse+pack: {best_host*1000:.1f} ms "
      f"({best_host*1000/n:.1f}/step, {best_host*1000/n/G:.2f}/frame)")
mb = sum(p[1].size for p in packed) / n / 1e6
print(f"upload bytes: {mb:.2f} MB/step ({mb*1000/G:.0f} KB/frame)")

# upload-only (ONE merged transfer per step).  The tunnel charges ~55 ms
# the FIRST time it sees each buffer shape (per-shape handshake) and
# ~1.3 ms/1.5MB warm — warm every shape first so the number reflects the
# steady state the pipelined decode actually runs at.
jax.block_until_ready([jax.device_put(mega) for _, mega, _, _, _ in packed])
best_up = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    bufs = [jax.device_put(mega) for _, mega, _, _, _ in packed]
    jax.block_until_ready(bufs)
    best_up = min(best_up, time.perf_counter() - t0)
print(f"upload: {best_up*1000:.1f} ms ({best_up*1000/n:.1f}/step)")

# device-only: fixed-slice + scatter + step chained, fence w/ scalar fetch
R, C = dec.mb_rows, dec.mb_cols
best_dev = float("inf")
for _ in range(3):
    refs0 = dec.refs
    t0 = time.perf_counter()
    refs = refs0
    for (key_frame, _m, spec_r, spec_c, off), dv in zip(packed, bufs):
        coeffs16 = _scatter_fn(G, R, C, spec_c)(dv)
        (y, u, v), refs = dec._step(key_frame, spec=spec_r)(dv[:off],
                                                            coeffs16, refs)
    _ = float(jnp.ravel(y)[0])
    best_dev = min(best_dev, time.perf_counter() - t0)
print(f"device scatter+step+fence: {best_dev*1000:.1f} ms "
      f"({best_dev*1000/n:.1f}/step, {best_dev*1000/n/G:.2f}/frame)")
tot = max(best_host, best_up + best_dev)
print(f"ideal overlapped: {tot*1000:.1f} ms -> {G*n/tot:.1f} fps")
