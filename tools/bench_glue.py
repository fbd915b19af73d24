#!/usr/bin/env python3
"""Split the non-kernel device time of the batched decode step."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

G, R, C = 8, 45, 80
Rp = 48
nd = 2 * (R - 1) + C
L = G * Rp
H, W = R * 16, C * 16
ITERS = 6


def timeit(name, fn, *chain0, n_chain=None):
    for _ in range(2):
        out = fn(*chain0)
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


from alfalfa_tpu.decoder import reconstruct_jax as RJ
from alfalfa_tpu.ops import sixtap, transforms

sched_b = RJ.skew_schedule_batch(R, C, G)
scat_idx = jnp.asarray(sched_b["scat_idx"])
unskew_idx = jnp.asarray(sched_b["unskew_idx"])

rng = np.random.RandomState(0)
y_tiles = jnp.asarray(rng.randint(0, 255, (G, R, C, 16, 16)), jnp.int32)
u_tiles = jnp.asarray(rng.randint(0, 255, (G, R, C, 8, 8)), jnp.int32)
B_y = jnp.asarray(rng.randint(0, 255, (nd, L, 256)), jnp.int16)
B_u = jnp.asarray(rng.randint(0, 255, (nd, L, 64)), jnp.int16)
n_nz = 1 << 18
cidx = jnp.asarray(rng.choice(G * R * C * 400, n_nz, replace=False)
                   .astype(np.int32))
cval = jnp.asarray(rng.randint(-500, 500, n_nz), jnp.int16)
refs_y = jnp.asarray(rng.randint(0, 255, (G, H, W)), jnp.uint8)
refs_u = jnp.asarray(rng.randint(0, 255, (G, H // 2, W // 2)), jnp.uint8)


def bump_of(x):
    return (x.sum() % 2).astype(jnp.uint8)


@jax.jit
def skew_big(yt, ut, vt):
    def skew(x):
        flat = x.reshape((G * R * C, -1))
        pad = jnp.zeros((1,) + flat.shape[1:], flat.dtype)
        flat = jnp.concatenate([flat, pad])
        return jnp.take(flat, scat_idx.reshape(-1), axis=0) \
            .reshape((nd, L) + flat.shape[1:])
    a = skew(yt.reshape(G, R, C, 256).astype(jnp.int16))
    b = skew(ut.reshape(G, R, C, 64).astype(jnp.int16))
    c = skew(vt.reshape(G, R, C, 64).astype(jnp.int16))
    d = skew(yt.reshape(G, R, C, 256).astype(jnp.int16))  # r16 stand-in
    e = skew(yt.reshape(G, R, C, 256).astype(jnp.int16))  # rb stand-in
    bump = (a.sum() + b.sum() + c.sum() + d.sum() + e.sum()) % 2
    return (yt + bump.astype(jnp.int32), ut, vt)


timeit("skew: 3 big + 2 residual takes", skew_big, y_tiles, u_tiles, u_tiles)


@jax.jit
def unskew_untile(by, bu, bv):
    def unskew(B, S):
        flat = B.reshape((-1,) + B.shape[2:])
        t = jnp.take(flat, unskew_idx.reshape(-1), axis=0) \
            .reshape((G, R, C, S, S))
        return t.transpose(0, 1, 3, 2, 4).reshape(G, R * S, C * S) \
            .astype(jnp.uint8)
    y = unskew(by, 16)
    u = unskew(bu, 8)
    v = unskew(bv, 8)
    bump = (y.sum() % 2).astype(jnp.int16)
    return (by + bump, bu, bv)


timeit("unskew + untile (3 planes)", unskew_untile, B_y, B_u, B_u)


@jax.jit
def scatter_add(idx, val):
    co = jnp.zeros((G * R * C * 400,), jnp.int32).at[idx] \
        .add(val.astype(jnp.int32))
    return (idx + (co.sum() % 2).astype(jnp.int32), val)


timeit("coeff scatter .add (262k updates)", scatter_add, cidx, cval)


@jax.jit
def scatter_set(idx, val):
    co = jnp.zeros((G * R * C * 400,), jnp.int32).at[idx] \
        .set(val.astype(jnp.int32), mode="drop", unique_indices=True)
    return (idx + (co.sum() % 2).astype(jnp.int32), val)


timeit("coeff scatter .set drop+unique", scatter_set, cidx, cval)


@jax.jit
def refstack_pad_mc(ry, ru, rv):
    def refstack(p):
        return jnp.stack([p, p, p, p], axis=1)
    ys = refstack(ry)
    us = refstack(ru)
    vs = refstack(rv)
    refsel = jnp.ones((G, R, C), jnp.int32)
    smv = jnp.zeros((G, R, C, 4, 4, 2), jnp.int32)
    uvmv = jnp.zeros((G, R, C, 2, 2, 2), jnp.int32)
    py = jax.vmap(lambda r, s, m: sixtap.predict_mb_tiles(r, s, m, 16))(
        ys, refsel, smv)
    pu = jax.vmap(lambda r, s, m: sixtap.predict_mb_tiles(r, s, m, 8))(
        us, refsel, uvmv)
    pv = jax.vmap(lambda r, s, m: sixtap.predict_mb_tiles(r, s, m, 8))(
        vs, refsel, uvmv)
    bump = ((py.sum() + pu.sum() + pv.sum()) % 2).astype(jnp.uint8)
    return (ry + bump, ru, rv)


timeit("refstack + pad + MC (3 planes, vmap G)", refstack_pad_mc,
       refs_y, refs_u, refs_u)


@jax.jit
def resid(co):
    qf = {k: jnp.full((G, R, C), 8, jnp.int32) for k in
          ("y_dc", "y_ac", "y2_dc", "y2_ac", "uv_dc", "uv_ac")}
    y2c = jnp.ones((G, R, C), bool)
    f = lambda c_, q, y2: transforms.residuals_from_coeffs(c_, q, y2)
    r = jax.vmap(f)(co, qf, y2c)
    return (co + (r.sum() % 2).astype(jnp.int32),)


co0 = jnp.zeros((G, R, C, 25, 16), jnp.int32)
timeit("residuals iDCT (vmap G)", resid, co0, n_chain=1)
