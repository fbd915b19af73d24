"""GOP-parallel decoding/encoding over a device mesh (ExCamera-style).

The reference scales by making chunks of video independently processable
(state files + rebase; SURVEY.md sections 2.9, 3.3).  Here the same idea is
expressed natively in JAX: a batch of frames (one GOP chunk per device) is
sharded along a ``gop`` mesh axis with shard_map; each device reconstructs
its chunk locally, and the small exit state (reference planes, stats) is
exchanged with XLA collectives over ICI.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from alfalfa_tpu.decoder.reconstruct_jax import reconstruct_core, skew_schedule


def make_gop_mesh(devices=None, axis="gop"):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def gop_decode_step(mesh, mb_rows, mb_cols, key_frame=False, axis="gop"):
    """Builds a jitted sharded step: a batch of per-frame parse arrays
    (leading axis = frames, sharded over the mesh) is reconstructed in
    parallel; outputs are the per-frame rasters plus an all-gathered stack
    of exit luma planes (the data a rebase pass would consume).
    """
    sched = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
             for k, v in skew_schedule(mb_rows, mb_cols).items()}

    def per_frame(coeffs, qf, y2c, nz, ym, uvm, bm, refsel, smv, uvmv,
                  ry, ru, rv, lfp):
        return reconstruct_core(mb_rows, mb_cols, key_frame,
                                coeffs, qf, y2c, nz, ym, uvm, bm, refsel,
                                smv, uvmv, ry, ru, rv, lfp, sched)

    def shard_fn(coeffs, qf, y2c, nz, ym, uvm, bm, refsel, smv, uvmv,
                 ry, ru, rv, lfp):
        # each shard holds a sub-batch of frames; decode them with vmap
        y, u, v = jax.vmap(per_frame)(coeffs, qf, y2c, nz, ym, uvm, bm,
                                      refsel, smv, uvmv, ry, ru, rv, lfp)
        # exchange exit state: every device sees every chunk's final luma
        # plane (what the serial rebase pass consumes)
        exit_y = jax.lax.all_gather(y[-1], axis)
        exit_y = exit_y.reshape((-1,) + y.shape[1:])
        mean_energy = jax.lax.pmean(jnp.mean(jnp.abs(y.astype(jnp.float32))), axis)
        return y, u, v, exit_y, mean_energy

    spec = P(axis)
    fn = jax.shard_map(shard_fn, mesh=mesh, check_vma=False,
                       in_specs=(spec,) * 14,
                       out_specs=(spec, spec, spec, P(None), P()))
    return jax.jit(fn)


def example_frame_batch(n_frames, mb_rows, mb_cols, seed=0):
    """Synthesizes a valid batch of parse arrays for dry runs/benchmarks."""
    rng = np.random.RandomState(seed)
    R, C, B = mb_rows, mb_cols, n_frames
    coeffs = rng.randint(-80, 80, (B, R, C, 25, 16)).astype(np.int32)
    qf = {k: np.full((B, R, C), v, np.int32)
          for k, v in (("y_dc", 8), ("y_ac", 6), ("y2_dc", 16),
                       ("y2_ac", 9), ("uv_dc", 8), ("uv_ac", 6))}
    y2c = rng.rand(B, R, C) < 0.7
    nz = np.ones((B, R, C), bool)
    ym = np.where(y2c, 0, 4).astype(np.int32)   # DC_PRED / B_PRED mix
    uvm = rng.randint(0, 4, (B, R, C)).astype(np.int32)
    bm = rng.randint(0, 10, (B, R, C, 4, 4)).astype(np.int32)
    refsel = rng.randint(1, 4, (B, R, C)).astype(np.int32)
    smv = rng.randint(-64, 64, (B, R, C, 4, 4, 2)).astype(np.int32)
    uvmv = rng.randint(-64, 64, (B, R, C, 2, 2, 2)).astype(np.int32)
    H, W = R * 16, C * 16
    ry = rng.randint(0, 256, (B, 4, H, W)).astype(np.uint8)
    ru = rng.randint(0, 256, (B, 4, H // 2, W // 2)).astype(np.uint8)
    rv = rng.randint(0, 256, (B, 4, H // 2, W // 2)).astype(np.uint8)
    lvl = np.full((B, R, C), 20, np.int32)
    lfp = (lvl, np.full((B, R, C), 9, np.int32), np.full((B, R, C), 53, np.int32),
           np.full((B, R, C), 49, np.int32), np.full((B, R, C), 2, np.int32),
           np.zeros((B, R, C), bool))
    return (coeffs, qf, y2c, nz, ym, uvm, bm, refsel, smv, uvmv,
            ry, ru, rv, lfp)
