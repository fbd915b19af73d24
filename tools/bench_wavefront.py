#!/usr/bin/env python3
"""Chained-iteration timing of the decode device path, split by stage.

Run ALONE: any concurrent CPU or TPU work poisons the numbers (single
host core, single tunnel).
"""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

ITERS = 6


def timeit(name, fn, *chain0, n_chain=None):
    for _ in range(2):                    # compile + genuinely execute
        out = fn(*chain0)
        # block_until_ready lies over the axon tunnel: force completion
        # with a scalar fetch before starting the clock
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.ravel(leaf)[0].astype(jnp.float32))
    n = n_chain or len(chain0)
    t0 = time.perf_counter()
    chain = chain0
    for _ in range(ITERS):
        out = fn(*chain)
        chain = out[:n]
    leaf = jax.tree_util.tree_leaves(chain)[0]
    _ = float(jnp.ravel(leaf)[0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:44s} {dt:8.2f} ms", flush=True)


# ---- production step with real parsed 720p data ----
from alfalfa_tpu.util.ivf import IVFReader
from alfalfa_tpu.parallel.gop import BatchedGopDecoder

CLIP = "tests/fixtures/inter_1280x720_q48.ivf"
G = 8
ivf = IVFReader(CLIP)
payloads = [ivf.frame(i) for i in range(len(ivf))]
dec = BatchedGopDecoder(ivf.width, ivf.height, G)
key0, b0, _, _ = dec.parse_frame_batch([payloads[0]] * G)
dev0 = {k: (v if v is None else jax.device_put(v)) for k, v in b0.items()}
(y, u, v), refs1 = dec._step(key0)(dev0, dec.refs)
dec.refs = refs1
key1, b1, _, _ = dec.parse_frame_batch([payloads[1]] * G)
dev1 = {k: (v if v is None else jax.device_put(v)) for k, v in b1.items()}

kf_step = dec._step(True)
if_step = dec._step(False)

timeit("full interframe step (chained refs)",
       lambda refs: (if_step(dev1, refs)[1],), refs1, n_chain=1)
timeit("full keyframe step (chained refs)",
       lambda refs: (kf_step(dev0, refs)[1],), refs1, n_chain=1)

# ---- merged wavefront kernel alone (chained via planes) ----
from alfalfa_tpu.ops import wavefront_pallas as WP

R, C = dec.mb_rows, dec.mb_cols
Rp = ((R + 7) // 8) * 8
nd = 2 * (R - 1) + C
L = G * Rp
rng = np.random.RandomState(0)
dy = jnp.asarray(rng.randint(0, 255, (nd, L, 256)), jnp.int16)
du = jnp.asarray(rng.randint(0, 255, (nd, L, 64)), jnp.int16)
prm = np.zeros((nd, L, 32), np.int16)
prm[:, :, 3] = 1   # intra everywhere
prm[:, :, 4] = 1   # valid
prm[:, :, 5] = 1
prm[:, :, 6] = 1
prm_dc = jnp.asarray(prm)
prm_b = prm.copy()
prm_b[:, :, 0] = 4  # all B_PRED
prm_b = jnp.asarray(prm_b)
prm_no = prm.copy()
prm_no[:, :, 3] = 0  # no intra at all (pure inter frame)
prm_no = jnp.asarray(prm_no)
lfprm = np.zeros((nd, L, 8), np.int16)
lfprm[:, :, 0] = 1
lfprm[:, :, 1] = 9
lfprm[:, :, 2] = 53
lfprm[:, :, 3] = 49
lfprm[:, :, 5:8] = 1
lfprm = jnp.asarray(lfprm)
r16 = jnp.zeros((nd, L, 256), jnp.int16)
r64 = jnp.zeros((nd, L, 64), jnp.int16)


def mk(p):
    @jax.jit
    def f(dy, du, dv):
        return WP.wavefront_frame_batch(dy, du, dv, p, r16, r16, r64, r64,
                                        lfprm)
    return f


timeit("merged kernel (no intra: LF only)", mk(prm_no), dy, du, du)
timeit("merged kernel (DC intra + LF)", mk(prm_dc), dy, du, du)
timeit("merged kernel (all B_PRED + LF)", mk(prm_b), dy, du, du)

# ---- prelude alone: everything the step does BEFORE the kernel ----
from alfalfa_tpu.decoder import reconstruct_jax as RJ
from alfalfa_tpu.ops import transforms, sixtap
from functools import partial


@jax.jit
def prelude(coeff_val, refs_y, refs_u, refs_v):
    i32 = lambda x: x.astype(jnp.int32)
    n_mb = G * R * C
    coeffs = jnp.zeros((n_mb * 25 * 16,), jnp.int32).at[
        dev1["coeff_idx"]].add(i32(coeff_val)).reshape(G, R, C, 25, 16)
    qf = {k: jnp.full((G, R, C), 8, jnp.int32) for k in
          ("y_dc", "y_ac", "y2_dc", "y2_ac", "uv_dc", "uv_ac")}
    y2c = jnp.ones((G, R, C), bool)
    nz = jnp.ones((G, R, C), bool)
    refsel = jnp.ones((G, R, C), jnp.int32)
    smv = jnp.zeros((G, R, C, 4, 4, 2), jnp.int32)
    uvmv = jnp.zeros((G, R, C, 2, 2, 2), jnp.int32)
    ry = jnp.stack([refs_y] * 4, axis=1)
    ru = jnp.stack([refs_u] * 4, axis=1)
    rv = jnp.stack([refs_v] * 4, axis=1)
    ab = jax.vmap(partial(RJ._stage_ab, R, C, False))(
        coeffs, qf, y2c, nz, refsel, smv, uvmv, ry, ru, rv)
    y_tiles = ab[0]
    # chain through a scalar so the next iteration depends on this one
    bump = (y_tiles.sum() % 2).astype(jnp.uint8)
    return refs_y + bump, refs_u + bump, refs_v + bump


z_y = refs1["y"][0]
z_u = refs1["u"][0]
timeit("prelude: scatter+residuals+MC (vmap G)",
       lambda a, b, c: prelude(dev1["coeff_val"], a, b, c),
       z_y, z_u, z_u, n_chain=3)
