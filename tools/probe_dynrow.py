#!/usr/bin/env python3
"""Probe Mosaic's handling of DYNAMIC sublane (dim -2) indexing on real
hardware — the pattern behind the r3 bench failure ("cannot statically
prove that index in dimension 0 is a multiple of 8", vector.load on a
(3600, 256) i16 VMEM scratch in ops/enc_inter_pallas.py).

Variants probed independently (each compiled + run, PASS/FAIL printed):
  dyn_load    : x_ref[pl.ds(i, 1), :] with arbitrary scalar i
  dyn_store   : x_ref[pl.ds(i, 1), :] = row
  stream_store: out_ref[0, c] = row   (dynamic sublane in a (1,C,P) block)
  stream_load : in_ref[0, c]          (dynamic sublane read)
  al_select   : aligned 8-row load + iota-select (the proposed fix)
  rmw_store   : aligned 8-row load + blend + aligned store (proposed fix)
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, P = 40, 256
xs = (np.arange(N * P).reshape(N, P) % 251).astype(np.int16)


def run(name, kernel, want, n_out=N):
    try:
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec((N, P), lambda: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((n_out, P), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_out, P), jnp.int16),
            scratch_shapes=[pltpu.VMEM((N, P), jnp.int16),
                            pltpu.SMEM((8,), jnp.int32)],
        )(jnp.asarray(xs))
        ok = np.array_equal(np.asarray(out), want)
        print(f"{name}: {'PASS' if ok else 'WRONG RESULT'}")
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:160]}")


def dynidx(sscr):
    sscr[0] = jnp.int32(13)        # defeat constant folding
    return sscr[0]


# 1. plain dynamic-row load
def k_load(x_ref, o_ref, vscr, sscr):
    i = dynidx(sscr)
    row = x_ref[pl.ds(i, 1), :]
    o_ref[...] = jnp.broadcast_to(row, (N, P))


# 2. plain dynamic-row store
def k_store(x_ref, o_ref, vscr, sscr):
    i = dynidx(sscr)
    vscr[...] = x_ref[...]
    vscr[pl.ds(i, 1), :] = x_ref[0:1, :] + 1
    o_ref[...] = vscr[...]


# 3. streamed-block style store out[0, c] = row (3D block)
def k_stream_store(x_ref, o_ref, vscr, sscr):
    i = dynidx(sscr)
    vscr[...] = x_ref[...]
    vscr[pl.ds(i, 1), :] = x_ref[0:1, :] + 1

    def body(c, _):
        o_ref[pl.ds(c, 1), :] = vscr[pl.ds(c, 1), :]
        return 0
    jax.lax.fori_loop(0, N, body, 0)


# 4. aligned + iota select (proposed load fix)
def k_al_select(x_ref, o_ref, vscr, sscr):
    i = dynidx(sscr)
    base = pl.multiple_of((i >> 3) << 3, 8)
    blk = x_ref[pl.ds(base, 8), :].astype(jnp.int32)
    sel = jax.lax.broadcasted_iota(jnp.int32, (8, P), 0) == (i - base)
    row = jnp.sum(jnp.where(sel, blk, 0), axis=0, keepdims=True)
    o_ref[...] = jnp.broadcast_to(row.astype(jnp.int16), (N, P))


# 5. aligned read-modify-write (proposed store fix)
def k_rmw(x_ref, o_ref, vscr, sscr):
    i = dynidx(sscr)
    vscr[...] = x_ref[...]
    base = pl.multiple_of((i >> 3) << 3, 8)
    blk = vscr[pl.ds(base, 8), :]
    sel = jax.lax.broadcasted_iota(jnp.int32, (8, P), 0) == (i - base)
    vscr[pl.ds(base, 8), :] = jnp.where(sel, x_ref[0:1, :] + 1, blk)
    o_ref[...] = vscr[...]


want_load = np.broadcast_to(xs[13][None], (N, P))
want_store = xs.copy(); want_store[13] = xs[0] + 1

run("dyn_load", k_load, want_load)
run("dyn_store", k_store, want_store)
run("stream_store", k_stream_store, want_store)
run("al_select", k_al_select, want_load)
run("rmw_store", k_rmw, want_store)
