#!/usr/bin/env python3
"""Per-stage device timing for the batched 720p decode step.

Times each device sub-stage with chained dependent iterations + one scalar
fetch (block_until_ready lies over the axon tunnel; NEXT.md methodology).
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from alfalfa_tpu.util.ivf import IVFReader
from alfalfa_tpu.parallel.gop import BatchedGopDecoder

CLIP = "tests/fixtures/inter_1280x720_q48.ivf"
G = 8
ITERS = 8

ivf = IVFReader(CLIP)
payloads = [ivf.frame(i) for i in range(len(ivf))]
dec = BatchedGopDecoder(ivf.width, ivf.height, G)
R, C = dec.mb_rows, dec.mb_cols

# capture a realistic interframe batch (frame 1)
key0, b0, _, _ = dec.parse_frame_batch([payloads[0]] * G)
(y, u, v), dec.refs = dec._step(key0)(
    {k: (v if v is None else jax.device_put(v)) for k, v in b0.items()}, dec.refs)
key1, b1, _, _ = dec.parse_frame_batch([payloads[1]] * G)
dev = {k: (v if v is None else jax.device_put(v)) for k, v in b1.items()}
refs = dec.refs

step = dec._step(key1)
kf_step = dec._step(True)


def timeit(name, fn, *args):
    out = fn(*args)           # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    # chase one scalar through the tunnel to force completion
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.ravel(leaf)[0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:34s} {dt:8.2f} ms")
    return out


print(f"geometry {R}x{C}, G={G}")
timeit("full interframe step", lambda: step(dev, refs)[0][0])
timeit("full keyframe step", lambda: kf_step(dev, refs)[0][0])

# ---- stage ablation: pieces of reconstruct_core ----
from alfalfa_tpu.decoder import reconstruct_jax as RJ
from alfalfa_tpu.ops import transforms, sixtap

sched = dec._sched
coeffs = jnp.zeros((G, R, C, 25, 16), jnp.int32)
qf = {k: jnp.full((G, R, C), 8, jnp.int32) for k in
      ("y_dc", "y_ac", "y2_dc", "y2_ac", "uv_dc", "uv_ac")}
y2c = jnp.ones((G, R, C), bool)
refstack = jnp.stack([refs["y"][0]] * 4, axis=1)
refstack_uv = jnp.stack([refs["u"][0]] * 4, axis=1)
smv = jnp.zeros((G, R, C, 4, 4, 2), jnp.int32)
uvmv = jnp.zeros((G, R, C, 2, 2, 2), jnp.int32)
refsel = jnp.ones((G, R, C), jnp.int32)

@jax.jit
def stage_resid(coeffs, qf, y2c):
    f = lambda co, q, y2: transforms.residuals_from_coeffs(co, q, y2)
    return jax.vmap(f)(coeffs, qf, y2c)

@jax.jit
def stage_mc(refstack, refsel, smv, refstack_uv, uvmv):
    fy = jax.vmap(lambda r, s, m: sixtap.predict_mb_tiles(r, s, m, 16))
    fu = jax.vmap(lambda r, s, m: sixtap.predict_mb_tiles(r, s, m, 8))
    return fy(refstack, refsel, smv), fu(refstack_uv, refsel, uvmv), \
        fu(refstack_uv, refsel, uvmv)

@jax.jit
def stage_skew_unskew(ytiles):
    n_diags = int(sched["scat_idx"].shape[0]); L = int(sched["scat_idx"].shape[1])
    f = lambda t: RJ._unskew(
        RJ._skew(t.astype(jnp.int16), sched["scat_idx"], n_diags, L),
        sched["unskew_idx"], R, C, (16, 16))
    t = jax.vmap(f)(ytiles)
    return t.transpose(0, 1, 3, 2, 4).reshape(G, R * 16, C * 16).astype(jnp.uint8)

res = timeit("residuals (vmap G)", stage_resid, coeffs, qf, y2c)
timeit("sixtap MC y+u+v (vmap G)", stage_mc, refstack, refsel, smv,
       refstack_uv, uvmv)
ytiles = jnp.zeros((G, R, C, 16, 16), jnp.int32)
timeit("skew+unskew+untile (vmap G)", stage_skew_unskew, ytiles)

# ---- the two Pallas wavefronts as used today (vmapped per frame) ----
from alfalfa_tpu.ops import intra_pallas, lf_pallas

n_diags = int(sched["scat_idx"].shape[0]); L = int(sched["scat_idx"].shape[1])
dy = jnp.zeros((G, n_diags, L, 256), jnp.int16)
du = jnp.zeros((G, n_diags, L, 64), jnp.int16)
prm = jnp.zeros((G, n_diags, L, 32), jnp.int16)
prm = prm.at[:, :, :, 3].set(1)  # intra everywhere
prm = prm.at[:, :, :, 4].set(jnp.asarray(sched["valid"], jnp.int16)[None])
r16 = jnp.zeros((G, n_diags, L, 256), jnp.int16)
ru = jnp.zeros((G, n_diags, L, 64), jnp.int16)

@jax.jit
def stage_intra(dy, du, dv, prm, r16, rb, ru, rv):
    f = lambda *a: intra_pallas.intra_frame(*a)
    return jax.vmap(f)(dy, du, dv, prm, r16, rb, ru, rv)

@jax.jit
def stage_intra_nb(dy, du, dv, prm, r16, rb, ru, rv):
    return jax.vmap(lambda *a: intra_pallas.intra_frame(*a))(
        dy, du, dv, prm, r16, rb, ru, rv)

dpad_dy = jnp.zeros((G, n_diags + 3, L, 256), jnp.int16)
dpad_du = jnp.zeros((G, n_diags + 3, L, 64), jnp.int16)
lfprm = jnp.zeros((G, n_diags, L, 8), jnp.int16)
lfprm = lfprm.at[:, :, :, 0].set(1).at[:, :, :, 5].set(1) \
    .at[:, :, :, 6].set(1).at[:, :, :, 7].set(1) \
    .at[:, :, :, 1].set(9).at[:, :, :, 2].set(53).at[:, :, :, 3].set(49)

@jax.jit
def stage_lf(dy, du, dv, prm):
    fy = jax.vmap(lambda d, p: lf_pallas.lf_pallas(d, p, 16))
    fu = jax.vmap(lambda d, p: lf_pallas.lf_pallas(d, p, 8))
    return fy(dy, prm), fu(du, prm), fu(dv, prm)

# ymode=0 (DC): no B_PRED work
timeit("intra kernel 8x (no B_PRED)", stage_intra, dy, du, du, prm,
       r16, r16, ru, ru)
prm_b = prm.at[:, :, :, 0].set(4)  # every MB B_PRED
timeit("intra kernel 8x (all B_PRED)", stage_intra_nb, dy, du, du, prm_b,
       r16, r16, ru, ru)
timeit("lf kernel 8x (3 planes)", stage_lf, dpad_dy, dpad_du, dpad_du, lfprm)
