"""Sparse device->host coefficient fetch for the device encoders.

The encode kernels emit dense (R, C, 400) int16 coefficient tiles — 2.9 MB
per 720p frame over the D2H link — while a typical q48 frame carries well
under 100K nonzero coefficients.  `compact` shrinks the transfer to one
fixed-capacity (index, value, count) triple built on device (mask cumsum +
drop-mode scatter); the host rebuilds the dense array with a single numpy
scatter.  The dense device buffer is still returned by the encode jit, so
a capacity overflow just falls back to fetching it — never a re-encode.

This is the decode-side compact coefficient upload stream (parallel/gop.py)
run in reverse, closing the last host-side piece of the device-encode
round trip (reference comparison: serializer.cc consumes what
decoder/frame.cc parsed; here both directions cross the PCIe/tunnel link).
Disable with ALFALFA_SPARSE_FETCH=0.
"""
import os

import numpy as np


def enabled():
    return os.environ.get("ALFALFA_SPARSE_FETCH", "1") != "0"


def cap_for(n_elems):
    """Fixed compaction capacity for a frame of n_elems coefficients:
    ~n/11 rounded up to a power of two (720p: 1.44M -> 131072 entries =
    0.79 MB transferred instead of 2.9)."""
    cap = 1 << 15
    while cap * 11 < n_elems:
        cap <<= 1
    return cap


def compact(flat_i16, cap):
    """Device-side compaction of a flat int16 tensor.

    Returns (idx i32[cap], val i16[cap], count i32).  Entries beyond
    count are zero; when count > cap the buffers are truncated and the
    caller must fall back to the dense tensor."""
    import jax
    import jax.numpy as jnp

    nz = flat_i16 != 0
    pos = jnp.cumsum(nz.astype(jnp.int32)) - 1
    tgt = jnp.where(nz, pos, cap)            # zeros scatter out of range
    ar = jax.lax.broadcasted_iota(jnp.int32, flat_i16.shape, 0)
    idx = jnp.zeros(cap, jnp.int32).at[tgt].set(ar, mode="drop")
    val = jnp.zeros(cap, jnp.int16).at[tgt].set(flat_i16, mode="drop")
    return idx, val, jnp.sum(nz.astype(jnp.int32))


def rebuild(sparse, dense_dev, n_elems):
    """Host-side: dense int16[n_elems] from a fetched compact triple,
    falling back to the dense device buffer on overflow."""
    idx, val, count = sparse
    count = int(count)
    if count > idx.shape[-1]:
        return np.asarray(dense_dev).reshape(-1).astype(np.int16).copy()
    out = np.zeros(n_elems, np.int16)
    if count:
        out[np.asarray(idx)[:count]] = np.asarray(val)[:count]
    return out
