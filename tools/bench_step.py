#!/usr/bin/env python3
"""Real-fixture step timing for the batched GOP decoder.

Splits the 720p decode wall into host parse / upload / device chain,
using chained dependent steps + one scalar fetch (block_until_ready is
unreliable over the axon tunnel for pure-XLA dispatch).
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from alfalfa_tpu.util.ivf import IVFReader
from alfalfa_tpu.parallel.gop import BatchedGopDecoder

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLIP = os.path.join(REPO, "tests", "fixtures", "inter_1280x720_q48.ivf")
G = 8

ivf = IVFReader(CLIP)
payloads = [ivf.frame(i) for i in range(len(ivf))]
print(f"clip: {len(payloads)} frames {ivf.width}x{ivf.height}", flush=True)

# -- warmup / compile --------------------------------------------------------
dec = BatchedGopDecoder(ivf.width, ivf.height, G)
for p in payloads:
    (y, u, v), _ = dec.decode_frame_batch([p] * G)
_ = float(jnp.ravel(y)[0].astype(jnp.float32))
print("warm", flush=True)

# -- host parse cost (fresh decoder, parse only) -----------------------------
t0 = time.perf_counter()
dec2 = BatchedGopDecoder(ivf.width, ivf.height, G)
batches = []
for p in payloads:
    batches.append(dec2.parse_frame_batch([p] * G))
t_parse = (time.perf_counter() - t0) / len(payloads) * 1000
print(f"host parse            {t_parse:8.2f} ms/step", flush=True)

# -- device chain only (pre-parsed, pre-uploaded) ----------------------------
dev_batches = []
for key_frame, batch, flags, show in batches:
    dev_batches.append((key_frame, {
        k: (v if v is None or isinstance(v, (dict, tuple))
            else jax.device_put(v)) for k, v in batch.items()}))
jax.block_until_ready([b[1]["buf8"] for b in dev_batches])

for trial in range(3):
    dec3 = BatchedGopDecoder(ivf.width, ivf.height, G)
    t0 = time.perf_counter()
    for key_frame, dev_batch in dev_batches:
        (y, u, v), dec3.refs = dec3._step(key_frame)(dev_batch, dec3.refs)
    _ = float(jnp.ravel(y)[0].astype(jnp.float32))
    t_dev = (time.perf_counter() - t0) / len(payloads) * 1000
    print(f"device chain          {t_dev:8.2f} ms/step", flush=True)

# interframe-only chain (skip the keyframe position)
dec4 = BatchedGopDecoder(ivf.width, ivf.height, G)
(y, u, v), dec4.refs = dec4._step(dev_batches[0][0])(dev_batches[0][1],
                                                     dec4.refs)
_ = float(jnp.ravel(y)[0].astype(jnp.float32))
inter = [b for b in dev_batches[1:]]
t0 = time.perf_counter()
for rep in range(2):
    for key_frame, dev_batch in inter:
        (y, u, v), dec4.refs = dec4._step(key_frame)(dev_batch, dec4.refs)
_ = float(jnp.ravel(y)[0].astype(jnp.float32))
t_int = (time.perf_counter() - t0) / (2 * len(inter)) * 1000
print(f"interframe dev chain  {t_int:8.2f} ms/step", flush=True)

# -- full loop (parse + upload + dispatch interleaved) -----------------------
for trial in range(3):
    dec5 = BatchedGopDecoder(ivf.width, ivf.height, G)
    t0 = time.perf_counter()
    for p in payloads:
        (y, u, v), _ = dec5.decode_frame_batch([p] * G)
    _ = float(jnp.ravel(y)[0].astype(jnp.float32))
    t_full = (time.perf_counter() - t0) / len(payloads) * 1000
    print(f"full loop             {t_full:8.2f} ms/step "
          f"({G * len(payloads) / (t_full * len(payloads) / 1000):.1f} fps)",
          flush=True)
