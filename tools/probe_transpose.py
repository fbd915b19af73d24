#!/usr/bin/env python3
"""Probe Mosaic support + cost for the full (L, P) -> (P, L) slab
transpose the pixel-major loop-filter layout needs:
  A. jnp.swapaxes on int16 / int32 / bf16
  B. dot_general with rhs contracted on its last dim (transpose_rhs),
     bf16 identity-matrix form
  C. per-tile perm matmul in STANDARD orientation from pixel-major side
Each variant runs standalone in a tiny kernel and is checked for
correctness, then timed over a loop of 124 applications (one per
diagonal of a 720p wavefront).
"""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L, P = 384, 256
rng = np.random.RandomState(0)
X = rng.randint(0, 256, (L, P)).astype(np.int16)


def run(name, kfn, extra=(), reps=124):
    try:
        f = pl.pallas_call(
            functools.partial(kfn, reps),
            out_shape=jax.ShapeDtypeStruct((P, L), jnp.int16),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + len(extra)),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        out = np.asarray(jax.jit(f)(jnp.asarray(X), *extra))
        ok = np.array_equal(out, X.T)
        g = jax.jit(f)
        _ = np.asarray(g(jnp.asarray(X), *extra))
        t0 = time.perf_counter()
        for _ in range(5):
            o = g(jnp.asarray(X), *extra)
        _ = float(jnp.ravel(o)[0].astype(jnp.float32))
        dt = (time.perf_counter() - t0) / 5 * 1e6 / reps
        print(f"{name:34s} ok={ok}  {dt:8.2f} us/transpose")
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"{name:34s} FAIL: {msg}")


def k_swap(reps, x_ref, o_ref):
    x = x_ref[...]
    acc = jnp.swapaxes(x, 0, 1)
    def body(i, a):
        return jnp.swapaxes(jnp.swapaxes(a, 0, 1), 0, 1)
    o_ref[...] = jax.lax.fori_loop(0, (reps - 1) // 2, body, acc)


def k_dotg(reps, x_ref, i_ref, o_ref):
    ident = i_ref[...]
    def tr(v):  # (L,P) -> (P,L): out[p,l] = sum_k I[p,k] v[l,k]
        return jax.lax.dot_general(
            ident, v.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int16)
    acc = tr(x_ref[...])
    def body(i, a):
        # ping-pong shapes differ; just redo the same transpose on x
        return jnp.where(i >= 0, tr(x_ref[...]), a)
    o_ref[...] = jax.lax.fori_loop(0, reps - 1, body, acc)


def k_dotg_lhs(reps, x_ref, i_ref, o_ref):
    ident = i_ref[...]
    def tr(v):  # out[p,l] = sum_k v[k,p]... lhs contracted on dim 0
        return jax.lax.dot_general(
            v.astype(jnp.bfloat16), ident,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int16)
    acc = tr(x_ref[...])
    def body(i, a):
        return jnp.where(i >= 0, tr(x_ref[...]), a)
    o_ref[...] = jax.lax.fori_loop(0, reps - 1, body, acc)


ident = jnp.asarray(np.eye(P, dtype=np.float32), jnp.bfloat16)
identL = jnp.asarray(np.eye(L, dtype=np.float32), jnp.bfloat16)
run("A jnp.swapaxes i16", k_swap)
run("B dot_general rhs-T (I_P, x)", k_dotg, (ident,))
run("B2 dot_general lhs-T (x, I_L)", k_dotg_lhs, (identL,))

# C: standard-orientation perm matmul on the pixel-major side
# (sanity + cost of the V-pass tile transposes): (P,P) @ (P,L)
perm = np.arange(256).reshape(16, 16).T.reshape(-1)
PM = np.zeros((256, 256), np.float32)
PM[np.arange(256), perm] = 1


def k_std(reps, x_ref, p_ref, o_ref):
    pm = p_ref[...]
    def mm(v):
        return jnp.dot(pm, v.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32).astype(jnp.int16)
    def body(i, a):
        return mm(mm(a))
    # x here is (P, L) already: feed X.T via index trick -- just check cost
    acc = mm(mm(x_ref[...].reshape(P, L)))
    o_ref[...] = jax.lax.fori_loop(0, (reps - 2) // 2, body, acc)


try:
    f = pl.pallas_call(
        functools.partial(k_std, 124),
        out_shape=jax.ShapeDtypeStruct((P, L), jnp.int16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    xt = jnp.asarray(X.T.copy())
    g = jax.jit(lambda a, b: f(a.reshape(L, P), b))
    out = np.asarray(g(xt, jnp.asarray(PM, jnp.bfloat16)))
    ok = out.shape == (P, L)
    t0 = time.perf_counter()
    for _ in range(5):
        o = g(xt, jnp.asarray(PM, jnp.bfloat16))
    _ = float(jnp.ravel(o)[0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / 5 * 1e6 / 124
    print(f"{'C std perm matmul (P,P)@(P,L)':34s} ok={ok}  {dt:8.2f} us/matmul-pair")
except Exception as e:
    print(f"C std perm matmul FAIL: {str(e).splitlines()[0][:140]}")
