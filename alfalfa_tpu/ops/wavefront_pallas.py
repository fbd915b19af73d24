"""Pallas TPU kernel: the whole batched decode wavefront in ONE pass.

Round-2 ran two kernels per frame (intra wavefront, then a whole-plane
loop filter) under vmap over the GOP batch, which serializes into G
programs each walking all diagonals — 8x the step latency, and the
batched loop-filter planes no longer fit VMEM.  This kernel restructures
the wavefront TPU-first:

- The GOP batch folds into the SUBLANE axis: one slab step processes
  diagonal d of all G frames at once ((G*R_pad, P) int16 slabs), so the
  sequential step count is n_diags + 5 regardless of batch size.  Frame
  boundaries need no special casing: cross-frame sublane shifts are
  masked by each frame's own has_row/valid lanes.
- Intra prediction (diagonal d) and the loop filter (diagonal d-3) run in
  the same grid step with a lag-3 software pipeline: LF(e) needs intra
  done at e..e-2, and intra at later steps never reads diagonals the
  filter already touched (intra at step s reads >= s-3; LF writes
  e..e-2 = s-3..s-5 at step s, strictly below every later intra read
  when ordered intra-then-LF inside the step).
- Planes live in an 8-deep VMEM ring (slot = d & 7) instead of
  whole-plane residency; diagonal e streams out at step e+5, after its
  last modification (LF(e+2) touches e as its "top" neighbor).

Intra semantics mirror ops/intra_pallas.py (reference prediction.cc:
38-643, macroblock.cc:523-551); filter semantics mirror ops/lf_pallas.py
(reference loopfilter.cc:133-154, loopfilter_filters.hh:58-186).

Streamed blocks per step d:
  prm    (G*R_pad, 32) int16  at d      (intra params; intra_pallas layout)
  dy/du/dv stage-B tiles      at d
  r16/rb Y residuals, ru/rv   at d
  lfprm  (G*R_pad, 8) int16   at d-3    (lf_pallas prm layout)
Outputs stream at d-5 (drained by 5 extra grid steps).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from alfalfa_tpu.ops.intra_pallas import (
    B_PRED, _bcast, _bpred_tile, _shift_down, _tile_col, _whole_predict)
from alfalfa_tpu.ops.lf_pallas import _edge, _t_perm, _t_tiles

RING = 8


def _intra_phase(d, prm_ref, dy_ref, du_ref, dv_ref,
                 r16_ref, rb_ref, ru_ref, rv_ref,
                 ring_y, ring_u, ring_v):
    """Intra-predict diagonal d into the ring (ops/intra_pallas semantics,
    ring deepened to 8 slots)."""
    pm = prm_ref[0].astype(jnp.int32)              # (GRp, 32)
    col = lambda k: pm[:, k:k + 1]
    ymode, uvmode = col(0), col(1)
    nz = col(2) != 0
    write = (col(4) != 0) & (col(3) != 0)          # valid & intra
    hrow, hcol, lcolm = col(5) != 0, col(6) != 0, col(7) != 0
    bm = pm[:, 8:24]
    any_intra = jnp.any(write)
    any_b = jnp.any(write & (ymode == B_PRED))

    cur_y = dy_ref[0].astype(jnp.int32)
    cur_u = du_ref[0].astype(jnp.int32)
    cur_v = dv_ref[0].astype(jnp.int32)

    s1, s2, s3 = (d + RING - 1) % RING, (d + RING - 2) % RING, \
        (d + RING - 3) % RING
    abv_row = _shift_down(ring_y[s2].astype(jnp.int32))[:, 240:256]
    ar_row = _shift_down(ring_y[s1].astype(jnp.int32))[:, 240:244]
    al_c = _shift_down(ring_y[s3].astype(jnp.int32))[:, 255:256]
    lcol_raw = _tile_col(ring_y[s1], 15, 16).astype(jnp.int32)
    abv_u = _shift_down(ring_u[s2].astype(jnp.int32))[:, 56:64]
    al_u = _shift_down(ring_u[s3].astype(jnp.int32))[:, 63:64]
    lcol_u = _tile_col(ring_u[s1], 7, 8).astype(jnp.int32)
    abv_v = _shift_down(ring_v[s2].astype(jnp.int32))[:, 56:64]
    al_v = _shift_down(ring_v[s3].astype(jnp.int32))[:, 63:64]
    lcol_v = _tile_col(ring_v[s1], 7, 8).astype(jnp.int32)

    r16 = r16_ref[0].astype(jnp.int32)
    rb = rb_ref[0].astype(jnp.int32)
    ru = ru_ref[0].astype(jnp.int32)
    rv = rv_ref[0].astype(jnp.int32)

    def compute(_):
        a16 = jnp.where(hrow, abv_row, 127)
        ar4 = jnp.where(hrow & ~lcolm, ar_row,
                        jnp.where(hrow & lcolm, _bcast(a16[:, 15:16], 4),
                                  127))
        e0 = jnp.where(hrow & hcol, al_c, jnp.where(hrow, 129, 127))
        lcol = jnp.where(hcol, lcol_raw, 129)

        whole = _whole_predict(a16, lcol, e0, hrow, hcol, ymode, 16)
        whole = jnp.clip(whole + jnp.where(nz, r16, 0), 0, 255)
        bt = jax.lax.cond(
            any_b,
            lambda x: _bpred_tile(a16, ar4, e0, lcol, bm, rb, nz),
            lambda x: x, whole)
        new_y = jnp.where((ymode == B_PRED), bt, whole)

        def chroma(abv, al2, lraw, res):
            a8 = jnp.where(hrow, abv, 127)
            ce0 = jnp.where(hrow & hcol, al2, jnp.where(hrow, 129, 127))
            cl = jnp.where(hcol, lraw, 129)
            p = _whole_predict(a8, cl, ce0, hrow, hcol, uvmode, 8)
            return jnp.clip(p + jnp.where(nz, res, 0), 0, 255)

        new_u = chroma(abv_u, al_u, lcol_u, ru)
        new_v = chroma(abv_v, al_v, lcol_v, rv)
        return (jnp.where(write, new_y, cur_y),
                jnp.where(write, new_u, cur_u),
                jnp.where(write, new_v, cur_v))

    out_y, out_u, out_v = jax.lax.cond(
        any_intra, compute, lambda _: (cur_y, cur_u, cur_v), 0)
    ring_y[d % RING] = out_y.astype(jnp.int16)
    ring_u[d % RING] = out_u.astype(jnp.int16)
    ring_v[d % RING] = out_v.astype(jnp.int16)


def _lf_phase(e, lfprm_ref, tpy, tpu_, ring, S):
    """Loop-filter diagonal e in the ring (ops/lf_pallas step semantics:
    MB left edge, interior V edges, MB top edge, interior H edges)."""
    P = S * S
    tp = tpy if S == 16 else tpu_
    p = lfprm_ref[0].astype(jnp.int32)     # (GRp, 8)
    col = lambda k: p[:, k:k + 1]
    interior, mb_lim, sb_lim, hev_t = col(1), col(2), col(3), col(4)
    do_sb = col(5) != 0
    do_left = col(6) != 0
    do_top = col(7) != 0

    se, s1, s2 = e % RING, (e + RING - 1) % RING, (e + RING - 2) % RING
    cur = ring[se].astype(jnp.int32)       # (GRp, P)
    left = ring[s1].astype(jnp.int32)
    topraw = ring[s2]
    top = _shift_down(topraw.astype(jnp.int32))

    grp = lambda slab, j: slab[:, j * S:(j + 1) * S]

    # ---- vertical passes (column-major space) ----
    curT = _t_tiles(cur, tp)
    leftT = _t_tiles(left, tp)
    ccols = [grp(curT, j) for j in range(S)]
    lcols = [grp(leftT, j) for j in range(S - 4, S)]

    g = _edge(lcols + ccols[0:4], interior, mb_lim, hev_t, True, do_left)
    lcols = g[0:4]
    ccols[0:4] = g[4:8]
    for x in range(4, S, 4):
        g = _edge(ccols[x - 4:x + 4], interior, sb_lim, hev_t, False, do_sb)
        ccols[x - 4:x + 4] = g

    cur = _t_tiles(jnp.concatenate(ccols, axis=1), tp)
    leftT = jnp.concatenate(
        [grp(leftT, j) for j in range(S - 4)] + lcols, axis=1)
    ring[s1] = _t_tiles(leftT, tp).astype(jnp.int16)

    # ---- horizontal passes (natural row-major space) ----
    crows = [grp(cur, j) for j in range(S)]
    trows = [grp(top, j) for j in range(S - 4, S)]

    g = _edge(trows + crows[0:4], interior, mb_lim, hev_t, True, do_top)
    trows = g[0:4]
    crows[0:4] = g[4:8]
    for y in range(4, S, 4):
        g = _edge(crows[y - 4:y + 4], interior, sb_lim, hev_t, False, do_sb)
        crows[y - 4:y + 4] = g

    ring[se] = jnp.concatenate(crows, axis=1).astype(jnp.int16)
    top_new = jnp.concatenate(
        [grp(top, j) for j in range(S - 4)] + trows, axis=1)
    # shift back up one row; the last storage row was never aligned in
    ring[s2] = jnp.concatenate(
        [top_new[1:].astype(jnp.int16), topraw[-1:]], axis=0)


def _wave_kernel(nd, prm_ref, lfprm_ref, tpy_ref, tpu_ref,
                 dy_ref, du_ref, dv_ref, r16_ref, rb_ref, ru_ref, rv_ref,
                 oy_ref, ou_ref, ov_ref,
                 ring_y, ring_u, ring_v):
    d = pl.program_id(0)

    @pl.when(d < nd)
    def _():
        _intra_phase(d, prm_ref, dy_ref, du_ref, dv_ref,
                     r16_ref, rb_ref, ru_ref, rv_ref,
                     ring_y, ring_u, ring_v)

    @pl.when((d >= 3) & (d < nd + 3))
    def _():
        e = d - 3
        _lf_phase(e, lfprm_ref, tpy_ref[...], tpu_ref[...], ring_y, 16)
        _lf_phase(e, lfprm_ref, tpy_ref[...], tpu_ref[...], ring_u, 8)
        _lf_phase(e, lfprm_ref, tpy_ref[...], tpu_ref[...], ring_v, 8)

    # emit diagonal d-5 (final after LF(d-3) touched it as "top")
    oy_ref[0] = ring_y[(d - 5) % RING]
    ou_ref[0] = ring_u[(d - 5) % RING]
    ov_ref[0] = ring_v[(d - 5) % RING]


def wavefront_frame_batch(dy, du, dv, prm, r16, rb, ru, rv, lfprm,
                          interpret=None):
    """Run the merged intra + loop-filter wavefront for a GOP batch.

    dy/du/dv: (n_diags, GRp, P) int16 stage-B tiles, skewed with the GOP
    batch folded into the sublane axis (GRp = G * R_pad); prm: (n_diags,
    GRp, 32) int16 (intra_pallas layout); r16/rb: (n_diags, GRp, 256)
    int16 Y residuals (assembled / subblock layouts); ru/rv chroma;
    lfprm: (n_diags, GRp, 8) int16 (lf_pallas layout).  Returns the
    decoded + filtered (n_diags, GRp, P) planes.

    interpret=None autodetects: off-TPU the kernel runs in Pallas
    interpret mode so the TPU decode path is testable anywhere.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nd, GRp, _ = dy.shape
    n_steps = nd + 5
    at_d = lambda P: pl.BlockSpec(
        (1, GRp, P), lambda d: (jnp.minimum(d, nd - 1), 0, 0),
        memory_space=pltpu.VMEM)
    at_lf = pl.BlockSpec(
        (1, GRp, 8), lambda d: (jnp.clip(d - 3, 0, nd - 1), 0, 0),
        memory_space=pltpu.VMEM)
    out_at = lambda P: pl.BlockSpec(
        (1, GRp, P), lambda d: (jnp.maximum(d - 5, 0), 0, 0),
        memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_wave_kernel, nd),
        grid=(n_steps,),
        in_specs=[at_d(32), at_lf, full, full,
                  at_d(256), at_d(64), at_d(64),
                  at_d(256), at_d(256), at_d(64), at_d(64)],
        out_specs=(out_at(256), out_at(64), out_at(64)),
        out_shape=(jax.ShapeDtypeStruct((nd, GRp, 256), jnp.int16),
                   jax.ShapeDtypeStruct((nd, GRp, 64), jnp.int16),
                   jax.ShapeDtypeStruct((nd, GRp, 64), jnp.int16)),
        scratch_shapes=[pltpu.VMEM((RING, GRp, 256), jnp.int16),
                        pltpu.VMEM((RING, GRp, 64), jnp.int16),
                        pltpu.VMEM((RING, GRp, 64), jnp.int16)],
        # the combined intra+LF stack tops the 16 MB default scoped-vmem
        # budget at 720p; v5e VMEM is far larger, so raise the soft limit
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(prm.astype(jnp.int16), lfprm.astype(jnp.int16),
      _t_perm(16), _t_perm(8), dy, du, dv, r16, rb, ru, rv)
