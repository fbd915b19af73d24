#!/usr/bin/env python3
"""Chained-iteration timing of the decode device path variants.

Feeds each stage's output back as its input so iterations form a real
dependency chain (block_until_ready lies over the axon tunnel).
"""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

G, R, C = 8, 45, 80
Rp = 48
nd = 2 * (R - 1) + C
ITERS = 6


def timeit(name, fn, *chain0):
    chain = fn(*chain0)                   # compile
    jax.block_until_ready(chain)
    t0 = time.perf_counter()
    chain = chain0
    for _ in range(ITERS):
        chain = fn(*chain)
    leaf = jax.tree_util.tree_leaves(chain)[0]
    _ = float(jnp.ravel(leaf)[0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:40s} {dt:8.2f} ms", flush=True)


# ---- merged wavefront kernel alone (chained via planes) ----
from alfalfa_tpu.ops import wavefront_pallas as WP

rng = np.random.RandomState(0)
L = G * Rp
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
lfprm = np.zeros((nd, L, 8), np.int16)
lfprm[:, :, 0] = 1
lfprm[:, :, 1] = 9
lfprm[:, :, 2] = 53
lfprm[:, :, 3] = 49
lfprm[:, :, 5:8] = 1
lfprm = jnp.asarray(lfprm)
r16 = jnp.zeros((nd, L, 256), jnp.int16)
r64 = jnp.zeros((nd, L, 64), jnp.int16)


@jax.jit
def merged(dy, du, dv, which):
    return WP.wavefront_frame_batch(dy, du, dv, prm_dc, r16, r16, r64, r64,
                                    lfprm)


@jax.jit
def merged_b(dy, du, dv, which):
    return WP.wavefront_frame_batch(dy, du, dv, prm_b, r16, r16, r64, r64,
                                    lfprm)


timeit("merged kernel (DC intra + LF)", lambda a, b, c: merged(a, b, c, 0) + (0,),
       dy, du, du)
timeit("merged kernel (all B_PRED + LF)", lambda a, b, c: merged_b(a, b, c, 0) + (0,),
       dy, du, du)

# ---- old kernels, batch-folded slabs for comparison ----
from alfalfa_tpu.ops import intra_pallas, lf_pallas


@jax.jit
def old_intra_folded(dy, du, dv):
    return intra_pallas.intra_frame(dy, du, dv, prm_dc, r16, r16, r64, r64)


timeit("old intra kernel, G folded in sublanes",
       lambda a, b, c: old_intra_folded(a, b, c), dy, du, du)


@jax.jit
def old_intra_vmap(dy, du, dv):
    f = lambda *a: intra_pallas.intra_frame(*a)
    return jax.vmap(f)(dy, du, dv,
                       jnp.broadcast_to(prm_dc[:, :Rp], (G, nd, Rp, 32)),
                       jnp.zeros((G, nd, Rp, 256), jnp.int16),
                       jnp.zeros((G, nd, Rp, 256), jnp.int16),
                       jnp.zeros((G, nd, Rp, 64), jnp.int16),
                       jnp.zeros((G, nd, Rp, 64), jnp.int16))


dy_v = jnp.asarray(rng.randint(0, 255, (G, nd, Rp, 256)), jnp.int16)
du_v = jnp.asarray(rng.randint(0, 255, (G, nd, Rp, 64)), jnp.int16)
timeit("old intra kernel, vmap over G",
       lambda a, b, c: old_intra_vmap(a, b, c), dy_v, du_v, du_v)

DP = 3
dyp = jnp.asarray(rng.randint(0, 255, (G, nd + DP, Rp, 256)), jnp.int16)
dup = jnp.asarray(rng.randint(0, 255, (G, nd + DP, Rp, 64)), jnp.int16)
lfprm_v = jnp.broadcast_to(jnp.asarray(lfprm)[None, :, :Rp], (G, nd, Rp, 8))


@jax.jit
def old_lf_vmap(dy, du, dv):
    fy = jax.vmap(lambda d: lf_pallas.lf_pallas(d, lfprm_v[0], 16))
    fu = jax.vmap(lambda d: lf_pallas.lf_pallas(d, lfprm_v[0], 8))
    return fy(dy), fu(du), fu(dv)


timeit("old lf kernel, vmap over G (3 planes)",
       lambda a, b, c: old_lf_vmap(a, b, c), dyp, dup, dup)
