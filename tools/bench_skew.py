#!/usr/bin/env python3
"""Dense (gather-free) skew/unskew vs the take-based formulation.

Skew identity: with S[r, d] = X[r, d - 2r], the row-major flattening of X
padded to width ND+2 coincides with the row-major flattening of S (width
ND):  r*(ND+2) + c  ==  r*ND + (2r + c).  So skew = pad + reshape + slice
+ transpose (all dense copies), and unskew is the inverse slicing.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

G, R, C = 8, 45, 80
Rp = 48
ND = 2 * (R - 1) + C
L = G * Rp
ITERS = 6

from alfalfa_tpu.decoder import reconstruct_jax as RJ

sched_b = RJ.skew_schedule_batch(R, C, G)
scat_idx = jnp.asarray(sched_b["scat_idx"])
unskew_idx = jnp.asarray(sched_b["unskew_idx"])


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


def skew_dense(x):
    """(G, R, C, P) -> (ND, G*Rp, P) via pad/reshape/transpose only."""
    P = x.shape[-1]
    y = jnp.pad(x, ((0, 0), (0, 0), (0, ND + 2 - C), (0, 0)))
    y = y.reshape(G, R * (ND + 2), P)[:, :R * ND]
    y = y.reshape(G, R, ND, P)
    y = jnp.pad(y, ((0, 0), (0, Rp - R), (0, 0), (0, 0)))
    return y.transpose(2, 0, 1, 3).reshape(ND, L, P)


def unskew_dense(B):
    """(ND, G*Rp, P) -> (G, R, C, P)."""
    P = B.shape[-1]
    y = B.reshape(ND, G, Rp, P).transpose(1, 2, 0, 3)[:, :R]  # (G,R,ND,P)
    y = y.reshape(G, R * ND, P)
    y = jnp.pad(y, ((0, 0), (0, 2 * R), (0, 0)))
    y = y.reshape(G, R, ND + 2, P)[:, :, :C]
    return y


def skew_take(x):
    flat = x.reshape((G * R * C, -1))
    pad = jnp.zeros((1,) + flat.shape[1:], flat.dtype)
    flat = jnp.concatenate([flat, pad])
    return jnp.take(flat, scat_idx.reshape(-1), axis=0) \
        .reshape((ND, L) + flat.shape[1:])


rng = np.random.RandomState(0)
x256 = jnp.asarray(rng.randint(-999, 999, (G, R, C, 256)), jnp.int16)
x64 = jnp.asarray(rng.randint(-999, 999, (G, R, C, 64)), jnp.int16)

# correctness
a = np.asarray(jax.jit(skew_dense)(x256))
b = np.asarray(jax.jit(skew_take)(x256))
assert (a == b).all(), "skew mismatch"
c = np.asarray(jax.jit(unskew_dense)(jnp.asarray(a)))
assert (c == np.asarray(x256)).all(), "unskew mismatch"
print("dense skew/unskew bit-exact vs take", flush=True)


@jax.jit
def five_dense(y, u, v):
    a = skew_dense(y)
    b = skew_dense(u)
    c = skew_dense(v)
    d = skew_dense(y)
    e = skew_dense(y)
    bump = ((a.sum(dtype=jnp.int32) + b.sum(dtype=jnp.int32)
             + c.sum(dtype=jnp.int32) + d.sum(dtype=jnp.int32)
             + e.sum(dtype=jnp.int32)) % 2).astype(jnp.int16)
    return (y + bump, u, v)


timeit("skew dense: 3 big + 2 residual", five_dense, x256, x64, x64)


@jax.jit
def five_take(y, u, v):
    a = skew_take(y)
    b = skew_take(u)
    c = skew_take(v)
    d = skew_take(y)
    e = skew_take(y)
    bump = ((a.sum(dtype=jnp.int32) + b.sum(dtype=jnp.int32)
             + c.sum(dtype=jnp.int32) + d.sum(dtype=jnp.int32)
             + e.sum(dtype=jnp.int32)) % 2).astype(jnp.int16)
    return (y + bump, u, v)


timeit("skew take:  3 big + 2 residual", five_take, x256, x64, x64)

B_y = jax.jit(skew_dense)(x256)
B_u = jax.jit(skew_dense)(x64)


@jax.jit
def unskew3_dense(by, bu, bv):
    def un(B, S):
        t = unskew_dense(B).reshape(G, R, C, S, S)
        return t.transpose(0, 1, 3, 2, 4).reshape(G, R * S, C * S) \
            .astype(jnp.uint8)
    y = un(by, 16)
    u = un(bu, 8)
    v = un(bv, 8)
    bump = (y.sum(dtype=jnp.int32) % 2).astype(jnp.int16)
    return (by + bump, bu, bv)


timeit("unskew+untile dense (3 planes)", unskew3_dense, B_y, B_u, B_u)


@jax.jit
def unskew3_take(by, bu, bv):
    def un(B, S):
        flat = B.reshape((-1,) + B.shape[2:])
        t = jnp.take(flat, unskew_idx.reshape(-1), axis=0) \
            .reshape((G, R, C, S, S))
        return t.transpose(0, 1, 3, 2, 4).reshape(G, R * S, C * S) \
            .astype(jnp.uint8)
    y = un(by, 16)
    u = un(bu, 8)
    v = un(bv, 8)
    bump = (y.sum(dtype=jnp.int32) % 2).astype(jnp.int16)
    return (by + bump, bu, bv)


timeit("unskew+untile take (3 planes)", unskew3_take, B_y, B_u, B_u)
