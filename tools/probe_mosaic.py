#!/usr/bin/env python3
"""Probe Mosaic capabilities needed by the inter-encode kernel:
1. scalar load from a VMEM ref (vector -> scalar bridge via scratch)
2. lax.while_loop with scalar carry inside a kernel
3. scalar store to SMEM scratch + read-back
4. dynamic-index single-row read from a big VMEM scratch
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(x_ref, o_ref, vscr, sscr):
    x = x_ref[...].astype(jnp.int32)          # (8, 128)
    s = jnp.sum(x)                            # full reduce -> scalar? or vector
    # 1. write a reduction into VMEM scratch, scalar-read it back
    vscr[0, 0] = s
    sc = vscr[0, 0]                           # scalar load from VMEM
    # 3. SMEM scratch roundtrip
    sscr[0] = sc + 1
    sc2 = sscr[0]

    # 2. while loop with scalar carry
    def cond(st):
        i, acc = st
        return i < 5

    def body(st):
        i, acc = st
        return i + 1, acc + sc2

    _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))

    # 4. dynamic single-row read using the scalar
    row = (sc2 % 8).astype(jnp.int32)
    vrow = x_ref[pl.ds(row, 1), :].astype(jnp.int32)

    o_ref[...] = (x + acc + vrow).astype(jnp.int16)


x = jnp.asarray(np.arange(8 * 128).reshape(8, 128) % 100, jnp.int16)
out = pl.pallas_call(
    kernel,
    in_specs=[pl.BlockSpec((8, 128), lambda: (0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((8, 128), lambda: (0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int16),
    scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32),
                    pltpu.SMEM((8,), jnp.int32)],
)(x)
xs = np.arange(8 * 128).reshape(8, 128) % 100
s = xs.sum()
acc = 5 * (s + 1)
row = (s + 1) % 8
want = xs + acc + xs[row][None, :]
got = np.asarray(out)
print("match:", (got == want.astype(np.int16)).all())
