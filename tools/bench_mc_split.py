#!/usr/bin/env python3
"""Split refstack / edge-pad / MC-kernel costs of the batched decode step."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

G, R, C = 8, 45, 80
H, W = R * 16, C * 16
ITERS = 6

from alfalfa_tpu.ops import sixtap_pallas as SP


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


rng = np.random.RandomState(0)
ry = jnp.asarray(rng.randint(0, 255, (G, H, W)), jnp.uint8)
ru = jnp.asarray(rng.randint(0, 255, (G, H // 2, W // 2)), jnp.uint8)
refsel = jnp.ones((G, R, C), jnp.int32)
smv = jnp.asarray(rng.randint(-32, 32, (G, R, C, 1, 1, 2)) * 0
                  + rng.randint(-32, 32, (G, 1, 1, 1, 1, 2)), jnp.int32)
smv = jnp.broadcast_to(smv, (G, R, C, 4, 4, 2))
uvmv = smv[:, :, :, :2, :2, :]


@jax.jit
def stack_only(ry, ru, rv):
    ys = jnp.stack([ry, ry, ry, ry], axis=1)
    us = jnp.stack([ru, ru, ru, ru], axis=1)
    vs = jnp.stack([rv, rv, rv, rv], axis=1)
    bump = ((ys.sum(dtype=jnp.int32) + us.sum(dtype=jnp.int32)
             + vs.sum(dtype=jnp.int32)) % 2).astype(jnp.uint8)
    return (ry + bump, ru, rv)


timeit("refstack concat only (3 planes)", stack_only, ry, ru, ru)


@jax.jit
def stack_pad(ry, ru, rv):
    ys = SP.pad_refs(jnp.stack([ry, ry, ry, ry], axis=1).reshape(G * 4, H, W))
    us = SP.pad_refs(jnp.stack([ru, ru, ru, ru], axis=1)
                     .reshape(G * 4, H // 2, W // 2))
    vs = SP.pad_refs(jnp.stack([rv, rv, rv, rv], axis=1)
                     .reshape(G * 4, H // 2, W // 2))
    bump = ((ys.sum(dtype=jnp.int32) + us.sum(dtype=jnp.int32)
             + vs.sum(dtype=jnp.int32)) % 2).astype(jnp.uint8)
    return (ry + bump, ru, rv)


timeit("refstack + edge pad (3 planes)", stack_pad, ry, ru, ru)

py = SP.pad_refs(jnp.stack([ry, ry, ry, ry], axis=1))  # (G,4,Hp,Wp)
pu = SP.pad_refs(jnp.stack([ru, ru, ru, ru], axis=1))


@jax.jit
def mc_only(py, pu, pv, sel, smv, uvmv):
    fy = jax.vmap(lambda r, s, m: SP.mc_tiles(r, H, W, s, m, 16))(
        py, sel, smv)
    fu = jax.vmap(lambda r, s, m: SP.mc_tiles(r, H // 2, W // 2, s, m, 8))(
        pu, sel, uvmv)
    fv = jax.vmap(lambda r, s, m: SP.mc_tiles(r, H // 2, W // 2, s, m, 8))(
        pv, sel, uvmv)
    bump = ((fy.sum() + fu.sum() + fv.sum()) % 2).astype(jnp.uint8)
    return (py + bump, pu, pv, sel, smv, uvmv)


timeit("MC kernels only, prepadded (y+u+v)", mc_only, py, pu, pu,
       refsel, smv, uvmv, n_chain=6)


@jax.jit
def mc_luma(py, sel, smv):
    fy = jax.vmap(lambda r, s, m: SP.mc_tiles(r, H, W, s, m, 16))(
        py, sel, smv)
    bump = (fy.sum() % 2).astype(jnp.uint8)
    return (py + bump, sel, smv)


timeit("MC kernel luma only", mc_luma, py, refsel, smv)


@jax.jit
def mc_chroma(pu, sel, uvmv):
    fu = jax.vmap(lambda r, s, m: SP.mc_tiles(r, H // 2, W // 2, s, m, 8))(
        pu, sel, uvmv)
    bump = (fu.sum() % 2).astype(jnp.uint8)
    return (pu + bump, sel, uvmv)


timeit("MC kernel one chroma plane", mc_chroma, pu, refsel, uvmv)


@jax.jit
def pad_batch(ry, ru, rv):
    a = SP.pad_refs(ry)
    b = SP.pad_refs(ru)
    c = SP.pad_refs(rv)
    bump = ((a.sum(dtype=jnp.int32) + b.sum(dtype=jnp.int32)
             + c.sum(dtype=jnp.int32)) % 2).astype(jnp.uint8)
    return (ry + bump, ru, rv)


timeit("edge pad (G,H,W) x3 planes (new-raster cost)", pad_batch, ry, ru, ru)
