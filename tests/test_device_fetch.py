"""Sparse device->host coefficient fetch (encoder/device_fetch.py):
compact-on-device + rebuild-on-host must be the identity on the dense
tensor, including the capacity-overflow fallback and the vmapped
(multi-QP) form."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from alfalfa_tpu.encoder import device_fetch as DF


@pytest.mark.parametrize("density", [0.0, 0.01, 0.08])
def test_compact_rebuild_identity(density):
    rng = np.random.default_rng(int(density * 100))
    n = 45 * 80 * 400 // 16          # manageable size, same structure
    dense = np.zeros(n, np.int16)
    k = int(n * density)
    if k:
        pos = rng.choice(n, k, replace=False)
        vals = rng.integers(-2047, 2048, k).astype(np.int16)
        vals[vals == 0] = 7
        dense[pos] = vals
    cap = DF.cap_for(n)
    sp = DF.compact(jnp.asarray(dense), cap)
    assert int(sp[2]) == np.count_nonzero(dense)
    out = DF.rebuild(sp, jnp.asarray(dense), n)
    assert np.array_equal(out, dense)


def test_overflow_falls_back_to_dense():
    n = 4096
    dense = np.arange(1, n + 1, dtype=np.int16)   # every element nonzero
    cap = 256                                     # force overflow
    sp = DF.compact(jnp.asarray(dense), cap)
    assert int(sp[2]) == n
    out = DF.rebuild(sp, jnp.asarray(dense), n)
    assert np.array_equal(out, dense)


def test_vmapped_compact():
    rng = np.random.default_rng(3)
    n, B = 8192, 3
    dense = np.zeros((B, n), np.int16)
    for b in range(B):
        pos = rng.choice(n, 50 * (b + 1), replace=False)
        dense[b, pos] = rng.integers(1, 100, len(pos)).astype(np.int16)
    cap = DF.cap_for(n)
    idx, val, cnt = jax.vmap(lambda x: DF.compact(x, cap))(
        jnp.asarray(dense))
    for b in range(B):
        out = DF.rebuild((idx[b], val[b], cnt[b]), jnp.asarray(dense[b]), n)
        assert np.array_equal(out, dense[b])
