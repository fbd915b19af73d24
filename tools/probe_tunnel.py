#!/usr/bin/env python3
"""Measure axon tunnel characteristics: per-dispatch latency, fetch
latency, H2D bandwidth, and the decode step's buffer sizes."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp


@jax.jit
def tiny(x):
    return x + 1


x = jnp.zeros((8, 128), jnp.int32)
tiny(x).block_until_ready()
_ = float(jnp.ravel(tiny(x))[0])

# dispatch latency: N chained tiny calls + one scalar fetch
for N in (1, 10, 50):
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        y = x
        for _ in range(N):
            y = tiny(y)
        _ = float(jnp.ravel(y)[0])
        best = min(best, time.perf_counter() - t0)
    print(f"chain N={N}: {best*1000:.2f} ms ({best*1000/N:.3f}/call)")

# H2D bandwidth
for mb in (1, 4, 16):
    buf = np.zeros(mb << 20, np.uint8)
    d = jax.device_put(buf); jax.block_until_ready(d)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        d = jax.device_put(buf)
        jax.block_until_ready(d)
        best = min(best, time.perf_counter() - t0)
    print(f"H2D {mb} MB: {best*1000:.2f} ms ({mb/best:.0f} MB/s)")

# does block_until_ready actually wait for a big matmul?
a = jnp.ones((4096, 4096), jnp.bfloat16)


@jax.jit
def mm(a):
    for _ in range(8):
        a = a @ a
    return a


mm(a).block_until_ready()
t0 = time.perf_counter()
y = mm(a)
y.block_until_ready()
t1 = time.perf_counter()
_ = float(jnp.ravel(y)[0])
t2 = time.perf_counter()
print(f"matmul: block_until_ready {1000*(t1-t0):.2f} ms, "
      f"fetch adds {1000*(t2-t1):.2f} ms")

# decode step buffer sizes
from alfalfa_tpu.util.ivf import IVFReader
from alfalfa_tpu.parallel.gop import (BatchedGopDecoder, _pack_upload,
                                      _COEFF_KEYS)
G = int(os.environ.get("G", "8"))
ivf = IVFReader("tests/fixtures/inter_1280x720_q48.ivf")
dec = BatchedGopDecoder(ivf.width, ivf.height, G)
for i in range(len(ivf)):
    key_frame, batch, flags, show = dec.parse_frame_batch([ivf.frame(i)] * G)
    batch_c = {k: batch.pop(k) for k in _COEFF_KEYS}
    mega_c, _ = _pack_upload(batch_c)
    mega_r, _ = _pack_upload(batch)
    print(f"frame {i} (kf={key_frame}): coeff {mega_c.nbytes/1e6:.2f} MB, "
          f"rest {mega_r.nbytes/1e6:.2f} MB")
