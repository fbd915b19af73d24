"""Packed host<->device transfers.

The interconnect (PCIe; the axon tunnel during development) charges a
per-transfer overhead on top of bytes — measured ~3 ms per array at the
tunnel median, so a 7-leaf ``jax.device_get`` costs ~20 ms before any
data moves.  These helpers move ANY pytree as ONE uint8 buffer:

- ``get_packed(tree)``: one jitted on-device concat of bitcast leaves,
  one D2H transfer, numpy views split it back (zero-copy reads).
- ``put_packed(tree)``: one host-side concat, one H2D transfer, one
  jitted unpack dispatch returning device arrays.

Pack/unpack jits are cached per leaf-shape signature.
"""
import numpy as np
import jax
import jax.numpy as jnp

_GET_CACHE = {}
_PUT_CACHE = {}


def _leaf_sig(leaves):
    return tuple((tuple(np.shape(l)), np.dtype(jnp.result_type(l)).str)
                 for l in leaves)


def get_packed(tree):
    """Fetch a pytree of device arrays as ONE uint8 transfer."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    sig = _leaf_sig(leaves)
    fn = _GET_CACHE.get(sig)
    if fn is None:
        def pack(*ls):
            parts = []
            for a in ls:
                b = a.reshape(-1)
                if b.dtype.itemsize > 1:
                    b = jax.lax.bitcast_convert_type(b, jnp.uint8) \
                        .reshape(-1)
                elif b.dtype != jnp.uint8:
                    b = jax.lax.bitcast_convert_type(b, jnp.uint8)
                parts.append(b)
            return jnp.concatenate(parts)
        fn = jax.jit(pack)
        _GET_CACHE[sig] = fn
    buf = np.asarray(fn(*leaves))
    out = []
    off = 0
    for shape, dstr in sig:
        dt = np.dtype(dstr)
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1
        arr = np.frombuffer(buf, dt, count=n, offset=off).reshape(shape)
        out.append(arr)
        off += n * dt.itemsize
    return jax.tree_util.tree_unflatten(treedef, out)


def put_packed(tree):
    """Upload a pytree of host arrays as ONE uint8 transfer; returns the
    same pytree of device arrays (one extra cheap unpack dispatch)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    leaves = [np.ascontiguousarray(l) for l in leaves]
    sig = _leaf_sig(leaves)
    fn = _PUT_CACHE.get(sig)
    if fn is None:
        def unpack(buf):
            out = []
            off = 0
            for shape, dstr in sig:
                dt = np.dtype(dstr)
                n = int(np.prod(shape, dtype=np.int64)) if shape else 1
                seg = jax.lax.slice(buf, (off,), (off + n * dt.itemsize,))
                if dt.itemsize > 1:
                    seg = jax.lax.bitcast_convert_type(
                        seg.reshape(-1, dt.itemsize), jnp.dtype(dt))
                elif dt != np.uint8:
                    seg = jax.lax.bitcast_convert_type(seg, jnp.dtype(dt))
                out.append(seg.reshape(shape))
                off += n * dt.itemsize
            return tuple(out)
        fn = jax.jit(unpack)
        _PUT_CACHE[sig] = fn
    mega = np.concatenate([l.view(np.uint8).reshape(-1) for l in leaves]) \
        if leaves else np.zeros(0, np.uint8)
    dev = fn(jax.device_put(mega))
    return jax.tree_util.tree_unflatten(treedef, list(dev))
