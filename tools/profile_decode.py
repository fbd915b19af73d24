#!/usr/bin/env python3
"""Stage-level profile of the 720p 8-GOP decode bench path."""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

from alfalfa_tpu.util.ivf import IVFReader
from alfalfa_tpu.parallel.gop import BatchedGopDecoder

CLIP = "tests/fixtures/inter_1280x720_q48.ivf"
G = int(__import__("os").environ.get("G","8"))

ivf = IVFReader(CLIP)
payloads = [ivf.frame(i) for i in range(len(ivf))]
print(f"{len(payloads)} frames, {ivf.width}x{ivf.height}")

dec = BatchedGopDecoder(ivf.width, ivf.height, G)
# warmup compile
for p in payloads:
    (y, u, v), _ = dec.decode_frame_batch([p] * G)
jax.block_until_ready(y)

# timed, staged
dec = BatchedGopDecoder(ivf.width, ivf.height, G)
parse_t, upload_t, step_t = [], [], []
for p in payloads:
    from alfalfa_tpu.parallel.gop import (_pack_upload, _COEFF_KEYS,
                                          _scatter_fn)
    t0 = time.perf_counter()
    key_frame, batch, flags, show = dec.parse_frame_batch([p] * G)
    t1 = time.perf_counter()
    batch_c = {k: batch.pop(k) for k in _COEFF_KEYS}
    mega_c, spec_c = _pack_upload(batch_c)
    mega_r, spec_r = _pack_upload(batch)
    dev_c = jax.device_put(mega_c)
    dev_r = jax.device_put(mega_r)
    jax.block_until_ready([dev_c, dev_r])
    t2 = time.perf_counter()
    coeffs16 = _scatter_fn(dec.G, dec.mb_rows, dec.mb_cols, spec_c)(dev_c)
    (y, u, v), dec.refs = dec._step(key_frame, spec=spec_r)(
        dev_r, coeffs16, dec.refs)
    jax.block_until_ready(y)
    t3 = time.perf_counter()
    parse_t.append(t1 - t0); upload_t.append(t2 - t1); step_t.append(t3 - t2)

n = len(payloads)
print(f"parse:  total {sum(parse_t)*1000:.1f} ms  mean {np.mean(parse_t)*1000:.1f}  (per GOP-frame {np.mean(parse_t)*1000/G:.2f})")
print(f"upload: total {sum(upload_t)*1000:.1f} ms  mean {np.mean(upload_t)*1000:.1f}")
print(f"step:   total {sum(step_t)*1000:.1f} ms  mean {np.mean(step_t)*1000:.1f}  kf {step_t[0]*1000:.1f}")
tot = sum(parse_t) + sum(upload_t) + sum(step_t)
print(f"total {tot*1000:.1f} ms -> {G*n/tot:.1f} fps")
