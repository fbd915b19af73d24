"""Pipelined chunk rebase over the device mesh (parallel/gop.py
gop_rebase_chain): the exit references must chain device-to-device
(ppermute over ICI) and the result must equal the serial computation
exactly (reference reencode.cc:305-381 + the ExCamera mu pipeline)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from alfalfa_tpu.parallel import gop
from alfalfa_tpu.encoder.reencode_device import _fn_core


def _chain_inputs(n_chunks, n_frames, R, C, seed=7):
    rng = np.random.RandomState(seed)
    H, W = R * 16, C * 16
    oy = rng.randint(0, 256, (n_chunks, n_frames, H, W)).astype(np.int32)
    ou = rng.randint(0, 256, (n_chunks, n_frames, H // 2, W // 2)) \
        .astype(np.int32)
    ov = rng.randint(0, 256, (n_chunks, n_frames, H // 2, W // 2)) \
        .astype(np.int32)
    refsel = rng.randint(1, 4, (n_chunks, n_frames, R, C)).astype(np.int32)
    smv = rng.randint(-48, 48, (n_chunks, n_frames, R, C, 4, 4, 2)) \
        .astype(np.int32)
    splitmv = rng.rand(n_chunks, n_frames, R, C) < 0.3
    # non-SPLITMV MBs use one whole-MB motion vector
    smv = np.where(splitmv[..., None, None, None], smv,
                   smv[:, :, :, :, :1, :1, :])
    q = smv.reshape(n_chunks, n_frames, R, C, 2, 2, 2, 2, 2).sum(axis=(5, 7))
    uvmv = (np.sign(q) * ((np.abs(q) + 4) >> 3)).astype(np.int32)
    qs = np.tile(np.array([8, 6, 16, 9, 8, 6, 0, 0], np.int32),
                 (n_chunks, 1))
    ry0 = rng.randint(0, 256, (4, H, W)).astype(np.uint8)
    ru0 = rng.randint(0, 256, (4, H // 2, W // 2)).astype(np.uint8)
    rv0 = rng.randint(0, 256, (4, H // 2, W // 2)).astype(np.uint8)
    return (oy, ou, ov, refsel, smv, uvmv, splitmv, qs), (ry0, ru0, rv0)


def _serial_oracle(inputs, refs0, R, C):
    """The same chunk chain computed serially with the jitted per-frame
    residue update."""
    oy, ou, ov, refsel, smv, uvmv, splitmv, qs = inputs
    frame_fn = jax.jit(_fn_core(R, C))

    def tiles(plane, S):
        return jnp.asarray(plane.reshape(R, S, C, S).transpose(0, 2, 1, 3)
                           .astype(np.int32))

    ry, ru, rv = (jnp.asarray(p) for p in refs0)
    co_all, nz_all = [], []
    for d in range(oy.shape[0]):
        co_c, nz_c = [], []
        for f in range(oy.shape[1]):
            co, _sp, nz, rec_y, rec_u, rec_v = frame_fn(
                tiles(oy[d, f], 16), tiles(ou[d, f], 8), tiles(ov[d, f], 8),
                ry, ru, rv, jnp.asarray(refsel[d, f]),
                jnp.asarray(smv[d, f]), jnp.asarray(uvmv[d, f]),
                jnp.asarray(splitmv[d, f]), jnp.asarray(qs[d]))
            py = rec_y.transpose(0, 2, 1, 3).reshape(R * 16, C * 16)
            pu = rec_u.transpose(0, 2, 1, 3).reshape(R * 8, C * 8)
            pv = rec_v.transpose(0, 2, 1, 3).reshape(R * 8, C * 8)
            ry = ry.at[1].set(py)
            ru = ru.at[1].set(pu)
            rv = rv.at[1].set(pv)
            co_c.append(np.asarray(co))
            nz_c.append(np.asarray(nz))
        ry = jnp.broadcast_to(py[None], (4,) + py.shape)
        ru = jnp.broadcast_to(pu[None], (4,) + pu.shape)
        rv = jnp.broadcast_to(pv[None], (4,) + pv.shape)
        co_all.append(np.stack(co_c))
        nz_all.append(np.stack(nz_c))
    return np.stack(co_all), np.stack(nz_all), np.asarray(ry)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_mesh_rebase_chain_equals_serial():
    n_chunks, n_frames, R, C = 8, 3, 3, 4
    mesh = gop.make_gop_mesh(jax.devices()[:n_chunks])
    inputs, refs0 = _chain_inputs(n_chunks, n_frames, R, C)

    fn = gop.gop_rebase_chain(mesh, R, C, n_frames)
    co, nz, exit_y = fn(*[jnp.asarray(x) for x in inputs],
                        *[jnp.asarray(r) for r in refs0])
    co = np.asarray(co)
    nz = np.asarray(nz)
    exit_y = np.asarray(exit_y)

    co_ref, nz_ref, exit_ref = _serial_oracle(inputs, refs0, R, C)
    n_mb = R * C
    assert co.shape == (n_chunks, n_frames, n_mb, 400)
    np.testing.assert_array_equal(
        co, co_ref.reshape(n_chunks, n_frames, n_mb, 400))
    np.testing.assert_array_equal(
        nz, nz_ref.reshape(n_chunks, n_frames, n_mb))
    np.testing.assert_array_equal(exit_y, exit_ref)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_mesh_rebase_chain_real_content():
    """The same chain-vs-serial byte equality on REAL oracle-encoded
    320x240 content: decoded rasters, the stream's own MV fields /
    SPLITMV layout / reference selections / quantizer (VERDICT r3 item
    8 — random noise exercises the arithmetic, not codec-typical mode
    and motion distributions).  Also logs per-hop wall time."""
    import time
    n_chunks, n_frames, R, C = 8, 2, 15, 20
    mesh = gop.make_gop_mesh(jax.devices()[:n_chunks])
    inputs, refs0 = gop.rebase_chain_inputs_from_ivf(
        "tests/fixtures/inter_320x240_q40.ivf", n_chunks, n_frames)

    fn = gop.gop_rebase_chain(mesh, R, C, n_frames)
    t0 = time.perf_counter()
    co, nz, exit_y = fn(*[jnp.asarray(x) for x in inputs],
                        *[jnp.asarray(r) for r in refs0])
    jax.block_until_ready(co)
    dt = time.perf_counter() - t0
    print(f"\nmesh rebase 320x240 x{n_chunks} chunks: {dt*1e3:.0f} ms "
          f"({dt*1e3/n_chunks:.0f} ms/hop incl. compile)")

    co_ref, nz_ref, exit_ref = _serial_oracle(inputs, refs0, R, C)
    np.testing.assert_array_equal(
        np.asarray(co), co_ref.reshape(n_chunks, n_frames, R * C, 400))
    np.testing.assert_array_equal(
        np.asarray(nz), nz_ref.reshape(n_chunks, n_frames, R * C))
    np.testing.assert_array_equal(np.asarray(exit_y), exit_ref)
