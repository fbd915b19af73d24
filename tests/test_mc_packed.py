"""Packed-reference MC kernel vs the XLA gather oracle.

The packed kernel (ops/sixtap_pallas.py pack_refs32/mc_tiles_packed) must
be bit-exact with the dense gather formulation (ops/sixtap.py) for every
MV shape: uniform, SPLITMV, zero, subpel phases, and far-out-of-frame
clamped windows (prediction.cc:655-975, 919-971).  The gather oracle runs
on the CPU backend — its advanced-indexing lowering is pathological on
TPU and it is the reference formulation regardless.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from alfalfa_tpu.ops import sixtap
from alfalfa_tpu.ops import sixtap_pallas as SP

R, C = 6, 10
H, W = R * 16, C * 16


def _inputs(seed):
    rng = np.random.RandomState(seed)
    sub_mv = np.repeat(
        rng.randint(-60, 60, (R, C, 1, 1, 2)), 16, axis=2) \
        .reshape(R, C, 4, 4, 2)[:, :, :4, :4]
    sub_mv = np.ascontiguousarray(sub_mv)
    for (r, c) in [(0, 0), (3, 7), (5, 9)]:   # SPLITMV macroblocks
        sub_mv[r, c] = rng.randint(-40, 40, (4, 4, 2))
    # extreme MVs: windows fully outside the frame (edge clamp path)
    sub_mv[1, 1, :, :] = [900, -900]
    sub_mv[2, 2, :, :] = [-2000, 2000]
    sub_mv[4, 4, :, :] = 0                    # zero-MV case
    sub_mv[4, 5, :, :] = [40, -16]            # full-pel nonzero (fast path)
    sub_mv[4, 6, :, :] = [-896, 896]          # full-pel AND clamped
    sub_mv[4, 7, :, :] = [8, 3]               # x full-pel, y subpel
    sel = rng.randint(1, 4, (R, C))
    refs = rng.randint(0, 256, (4, H, W)).astype(np.uint8)
    refs_uv = rng.randint(0, 256, (4, H // 2, W // 2)).astype(np.uint8)
    q = sub_mv.reshape(R, C, 2, 2, 2, 2, 2).sum(axis=(3, 5))
    uv_mv = np.sign(q) * ((np.abs(q) + 4) >> 3)
    return sel, sub_mv, uv_mv, refs, refs_uv


def test_packed_matches_gather_oracle():
    sel, sub_mv, uv_mv, refs, refs_uv = _inputs(7)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        pk_y = SP.pack_refs32(SP.pad_refs(jnp.asarray(refs)))
        pk_uv = SP.pack_refs32(SP.pad_refs(jnp.asarray(refs_uv)))
        want_y = np.asarray(sixtap._predict_prepadded(
            SP.unpack_refs32(pk_y), jnp.asarray(sel, jnp.int32),
            jnp.asarray(sub_mv, jnp.int32), 16, H, W, SP.PAD))
        want_u = np.asarray(sixtap._predict_prepadded(
            SP.unpack_refs32(pk_uv), jnp.asarray(sel, jnp.int32),
            jnp.asarray(uv_mv, jnp.int32), 8, H // 2, W // 2, SP.PAD))
        # the prepadded oracle must itself equal the plain clamped gather
        plain_y = np.asarray(sixtap.predict_4x4_blocks(
            jnp.asarray(refs),
            jnp.broadcast_to(jnp.asarray(sel, jnp.int32)[:, :, None, None],
                             (R, C, 4, 4)).reshape(-1),
            jnp.asarray((np.arange(R)[:, None, None, None] * 16
                         + np.arange(4)[None, None, :, None] * 4)
                        + np.zeros((R, C, 4, 4), np.int32),
                        jnp.int32).reshape(-1),
            jnp.asarray((np.arange(C)[None, :, None, None] * 16
                         + np.arange(4)[None, None, None, :] * 4)
                        + np.zeros((R, C, 4, 4), np.int32),
                        jnp.int32).reshape(-1),
            jnp.asarray(sub_mv, jnp.int32).reshape(-1, 2))).reshape(
                R, C, 4, 4, 4, 4).transpose(0, 1, 2, 4, 3, 5) \
            .reshape(R, C, 16, 16)
        np.testing.assert_array_equal(want_y, plain_y)

    got_y = np.asarray(SP.mc_tiles_packed(
        jax.device_put(np.asarray(pk_y)), H, W,
        jnp.asarray(sel, jnp.int32), jnp.asarray(sub_mv, jnp.int32), 16))
    got_u = np.asarray(SP.mc_tiles_packed(
        jax.device_put(np.asarray(pk_uv)), H // 2, W // 2,
        jnp.asarray(sel, jnp.int32), jnp.asarray(uv_mv, jnp.int32), 8))
    np.testing.assert_array_equal(got_y, want_y)
    np.testing.assert_array_equal(got_u, want_u)
