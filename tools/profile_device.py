#!/usr/bin/env python3
"""Per-stage device timing for the batched 720p decode step (current API:
compact coefficient stream + resident packed refs + merged wavefront).

Times each jitted sub-stage with chained dependent iterations + one
scalar fetch (block_until_ready lies over the axon tunnel)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from alfalfa_tpu.util.ivf import IVFReader
from alfalfa_tpu.parallel.gop import BatchedGopDecoder, _QF_KEYS
from alfalfa_tpu.decoder import reconstruct_jax as RJ

CLIP = "tests/fixtures/inter_1280x720_q48.ivf"
G = 8
ITERS = 8

ivf = IVFReader(CLIP)
payloads = [ivf.frame(i) for i in range(len(ivf))]
dec = BatchedGopDecoder(ivf.width, ivf.height, G)
R, C = dec.mb_rows, dec.mb_cols

key0, b0, _, _ = dec.parse_frame_batch([payloads[0]] * G)
(y, u, v), dec.refs = dec._step(key0)(
    {k: (v if v is None else jax.device_put(v)) for k, v in b0.items()},
    dec.refs)
key1, b1, _, _ = dec.parse_frame_batch([payloads[1]] * G)
dev = {k: (v if v is None else jax.device_put(v)) for k, v in b1.items()}
refs = dec.refs
step = dec._step(key1)


def timeit(name, fn, *args):
    out = fn(*args)              # compile
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.ravel(leaf)[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.ravel(leaf)[0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:40s} {dt:8.2f} ms", flush=True)
    return out


print(f"geometry {R}x{C}, G={G}", flush=True)
timeit("full interframe step", lambda: step(dev, refs)[0][0])

# ---- pieces, mirroring gop._step ----
n_mb = G * R * C
ne = n_mb * 25 * 16


@jax.jit
def coeffs_stage(batch):
    pad_n = batch["coeff_delta"].shape[0]
    delta = batch["coeff_delta"].astype(jnp.int32).at[
        batch["desc_pos"]].add(batch["desc_extra"], mode="drop")
    cidx = jnp.cumsum(delta) - 1
    cval = batch["coeff_val8"].astype(jnp.int16).at[
        batch["vesc_pos"]].set(batch["vesc_val"], mode="drop")
    return jnp.zeros((ne + pad_n,), jnp.int16).at[cidx].set(
        cval, unique_indices=True, indices_are_sorted=True)[:ne] \
        .astype(jnp.int32).reshape(G, R, C, 25, 16)


coeffs = timeit("coeff scatter", coeffs_stage, dev)

from alfalfa_tpu.ops import transforms

qf = {k: jnp.full((G, R, C), 8, jnp.int32) for k in _QF_KEYS}
y2c = jnp.ones((G, R, C), bool)
nzb = jnp.ones((G, R, C), bool)


@jax.jit
def resid_stage(coeffs, qf, y2c):
    f = lambda co, q, y2: transforms.residuals_from_coeffs(co, q, y2)
    return jax.vmap(f)(coeffs, qf, y2c)


timeit("residuals (vmap G)", resid_stage, coeffs, qf, y2c)

# MC from resident packed refs
from alfalfa_tpu.ops import sixtap_pallas as SP

smv = jnp.zeros((G, R, C, 4, 4, 2), jnp.int32)
uvmv = jnp.zeros((G, R, C, 2, 2, 2), jnp.int32)
refsel = jnp.ones((G, R, C), jnp.int32)


@jax.jit
def mc_stage(refs, refsel, smv, uvmv):
    fy = jax.vmap(lambda r, s, m: SP.mc_tiles_packed(r, 720, 1280, s, m, 16))
    fu = jax.vmap(lambda r, s, m: SP.mc_tiles_packed(r, 360, 640, s, m, 8))
    return (fy(refs["y"], refsel, smv),
            fu(refs["u"], refsel, uvmv), fu(refs["v"], refsel, uvmv))


try:
    timeit("sixtap MC y+u+v (packed)", mc_stage, refs, refsel, smv, uvmv)
except Exception as e:
    print(f"  mc_stage skipped: {type(e).__name__}: {e}", flush=True)

# stage A+B together (residuals + MC + merge)
@jax.jit
def ab_stage(coeffs, qf, y2c, nz, refsel, smv, uvmv, refs):
    return jax.vmap(partial(RJ._stage_ab, R, C, False,
                            refs_prepadded=True))(
        coeffs, qf, y2c, nz, refsel, smv, uvmv,
        refs["y"], refs["u"], refs["v"])


ab = timeit("stage A+B (resid+MC+merge)", ab_stage, coeffs, qf, y2c, nzb,
            refsel, smv, uvmv, refs)
(y_tiles, u_tiles, v_tiles, res_y, res_u, res_v, res, intra_mask) = ab

# skew packing of all wavefront inputs
sched_b = RJ.skew_schedule_batch(R, C, G)
nd = int(sched_b["scat_idx"].shape[0])
L = int(sched_b["scat_idx"].shape[1])
Rp = L // G


def mk_skew():
    def skew(x):
        P = x.shape[3:]
        pP = ((0, 0),) * len(P)
        yy = jnp.pad(x, ((0, 0), (0, 0), (0, nd + 2 - C)) + pP)
        yy = yy.reshape((G, R * (nd + 2)) + P)[:, :R * nd]
        yy = yy.reshape((G, R, nd) + P)
        yy = jnp.pad(yy, ((0, 0), (0, Rp - R), (0, 0)) + pP)
        return yy.transpose((2, 0, 1) + tuple(range(3, 3 + len(P)))) \
            .reshape((nd, L) + P)
    return skew


skew = mk_skew()


@jax.jit
def skew_stage(y_tiles, u_tiles, v_tiles, res_y, res, res_u, res_v):
    i16s = lambda x: skew(x).astype(jnp.int16)
    return (i16s(y_tiles.reshape(G, R, C, 256)),
            i16s(u_tiles.reshape(G, R, C, 64)),
            i16s(v_tiles.reshape(G, R, C, 64)),
            i16s(res_y.reshape(G, R, C, 256)),
            i16s(res[:, :, :, 0:16].reshape(G, R, C, 256)),
            i16s(res_u.reshape(G, R, C, 64)),
            i16s(res_v.reshape(G, R, C, 64)))


sk = timeit("skew 7 arrays", skew_stage, y_tiles, u_tiles, v_tiles,
            res_y, res, res_u, res_v)

# the merged wavefront kernel
from alfalfa_tpu.ops import wavefront_pallas

masks = {k: jnp.asarray(sched_b[k]) for k in
         ("valid", "has_row", "has_col", "last_col")}
zi = jnp.zeros((G, R, C), jnp.int32)
prm_head = jnp.stack(
    [skew(zi).astype(jnp.int16)] * 4 +
    [masks["valid"].astype(jnp.int16), masks["has_row"].astype(jnp.int16),
     masks["has_col"].astype(jnp.int16),
     masks["last_col"].astype(jnp.int16)], axis=-1)
prm = jnp.concatenate([prm_head,
                       jnp.zeros((nd, L, 16), jnp.int16),
                       jnp.zeros((nd, L, 8), jnp.int16)], axis=-1)
lfprm = jnp.zeros((nd, L, 8), jnp.int16)


@jax.jit
def wf_stage(sk, prm, lfprm):
    Dy, Du, Dv, ry, rb, ru, rv = sk
    return wavefront_pallas.wavefront_frame_batch(
        Dy, Du, Dv, prm, ry, rb, ru, rv, lfprm)


wf = timeit("merged wavefront kernel", wf_stage, sk, prm, lfprm)


@jax.jit
def unskew_stage(wf):
    B_y, B_u, B_v = wf

    def unskew(B, S):
        P = B.shape[2:]
        yy = B.reshape((nd, G, Rp) + P).transpose(
            (1, 2, 0) + tuple(range(3, 3 + len(P))))[:, :R]
        yy = yy.reshape((G, R * nd) + P)
        yy = jnp.pad(yy, ((0, 0), (0, 2 * R)) + ((0, 0),) * len(P))
        yy = yy.reshape((G, R, nd + 2) + P)[:, :, :C]
        t = yy.reshape(G, R, C, S, S)
        return t.transpose(0, 1, 3, 2, 4).reshape(G, R * S, C * S) \
            .astype(jnp.uint8)

    return unskew(B_y, 16), unskew(B_u, 8), unskew(B_v, 8)


planes = timeit("unskew+untile 3 planes", unskew_stage, wf)


@jax.jit
def refs_stage(planes, refs):
    yy, uu, vv = planes
    new_refs = {}
    for plane, raster in (("y", yy), ("u", uu), ("v", vv)):
        pr = SP.pack_refs32(SP.pad_refs(raster))
        stack = refs[plane]
        last, gold, alt = stack[:, 1], stack[:, 2], stack[:, 3]
        new_refs[plane] = jnp.stack([last, last, gold, alt], axis=1)
    return new_refs


timeit("ref pack + restack", refs_stage, planes, refs)
