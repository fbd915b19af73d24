"""Pallas TPU kernel: the batched decode wavefront in PIXEL-MAJOR layout.

The round-2..4 kernel (ops/wavefront_pallas.py) stores a diagonal slab as
(G*R_pad, S*S) — storage rows on sublanes, pixels on lanes.  Its edge math
then runs on (GRp, S) operands: S=16 of 128 lanes live (87% waste), and
every pixel-group extraction is an unaligned 16-lane slice (a lane rotate +
select each).  Measured on a v5e (ROUND4.md): ~60K vreg-ops of filter math
plus ~30K of lane slices per diagonal — the decode device-step wall.

This kernel flips the slab to (S*S, G*R_pad): the PIXEL index rides the
sublane axis, batch*rows ride the lanes.  Consequences:

- A pixel group (p3..q3 of a filter edge, an above-row, a left-column in
  transposed space) is a CONTIGUOUS, 16-ALIGNED sublane slice: (16, L)
  int32 = L/128 * 2 vregs at FULL lane utilization — 8x less vector work
  per edge and zero slice/concat overhead (slices at sublane-tile
  granularity are free vreg addressing).
- The vertical<->horizontal conversion contracts the SUBLANE axis: a
  LEFT-matmul by the same 256x256 permutation matrix the lane-major
  kernel used on the right (pixel values are exact in bf16).  Same MXU
  cost, now feeding aligned groups.
- Neighbor row shifts (storage row r-1) become single lane shifts of
  16-sublane operands instead of sublane shifts of whole slabs.

Semantics are IDENTICAL to ops/wavefront_pallas.py (which mirrors the
reference prediction.cc:38-643, macroblock.cc:523-551, loopfilter.cc:
133-154, loopfilter_filters.hh:58-186); only the layout differs.  The
lane-major kernel remains selectable with ALFALFA_PM=0 for on-chip A/B.

Streamed blocks per step d (all pixel-major):
  prm    (32, L) int16  at d      intra params, params on sublanes
  dy/du/dv stage-B tiles at d     (P, L)
  r16/rb Y residuals, ru/rv at d
  lfprm  (8, L) int16   at d-3
Outputs stream at d-5 (drained by 5 extra grid steps).
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from alfalfa_tpu.ops.loopfilter import _mask_hev, _common_filter, _mb_filter

B_PRED = 4
RING = 8


# ---------------------------------------------------------------------------
# constant relayout matrices (host-built, streamed once as kernel operands)
# ---------------------------------------------------------------------------

def _t_perm(S):
    """(S*S, S*S) bf16 permutation: LEFT-multiplying a pixel-major slab
    maps row-major pixel order to column-major (involution)."""
    perm = np.arange(S * S).reshape(S, S).T.reshape(-1)
    P = np.zeros((S * S, S * S), np.float32)
    P[perm, np.arange(S * S)] = 1
    return jnp.asarray(P, jnp.bfloat16)


def _rep_mat(S):
    """(S*S, S) bf16: dot(rep, lcol) broadcasts lcol[y] across pixel row y
    (the H-prediction fill; avoids a sublane-repeat Mosaic can't tile)."""
    R = np.zeros((S * S, S), np.float32)
    R[np.arange(S * S), np.arange(S * S) // S] = 1
    return jnp.asarray(R, jnp.bfloat16)


def _colsel(S, x):
    """(S, S*S) bf16: dot(sel, slab) extracts tile column x -> (S, L)."""
    M = np.zeros((S, S * S), np.float32)
    M[np.arange(S), np.arange(S) * S + x] = 1
    return jnp.asarray(M, jnp.bfloat16)


def _mm(a_bf16, x, out_dtype=jnp.int32):
    """Exact integer relayout via MXU: values are in [0, 255] (exact in
    bf16), the matrix is 0/1 with row sums of 1."""
    return jnp.dot(a_bf16, x.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32).astype(out_dtype)


# ---------------------------------------------------------------------------
# pixel-major helpers (sublane-axis ports of ops/intra_pallas.py)
# ---------------------------------------------------------------------------

def _avg2(x, y):
    return (x + y + 1) >> 1


def _avg3(x, y, z):
    return (x + 2 * y + z + 2) >> 2


def _row(x, i):
    return x[i:i + 1]


def _bcast(x1, n):
    return jnp.broadcast_to(x1, (n,) + x1.shape[1:])


def _shift_lanes(x):
    """Storage-row shift: out[:, l] = x[:, l-1], first lane zero.  Frame
    boundaries inside the folded lane axis are masked by has_row lanes."""
    z = jnp.zeros(x.shape[:-1] + (1,), x.dtype)
    return jnp.concatenate([z, x[..., :-1]], axis=-1)


def _whole_predict(a, lcol, e0, hrow, hcol, mode, S, rep):
    """16x16/8x8 prediction, modes DC/V/H/TM per lane
    (prediction.cc:435-467).  a/lcol (S, L), e0/masks/mode (1, L)."""
    log2 = {8: 3, 16: 4}[S]
    sum_a = jnp.sum(a, axis=0, keepdims=True)
    sum_l = jnp.sum(lcol, axis=0, keepdims=True)
    dc = jnp.where(
        hrow & hcol, (sum_a + sum_l + (1 << log2)) >> (log2 + 1),
        jnp.where(hrow, (sum_a + (1 << (log2 - 1))) >> log2,
                  jnp.where(hcol, (sum_l + (1 << (log2 - 1))) >> log2, 128)))
    P = S * S
    dcp = _bcast(dc, P)
    vp = jnp.tile(a, (S, 1))
    hp = _mm(rep, lcol)
    tm = jnp.clip(hp + vp - _bcast(e0, P), 0, 255)
    return jnp.where(mode == 0, dcp,
                     jnp.where(mode == 1, vp,
                               jnp.where(mode == 2, hp, tm)))


def _sb_predict_all(a, left, al):
    """All ten 4x4 b-mode predictions (prediction.cc:479-643), pixel index
    on sublanes.  a (8, L) = above4 + above-right4; left (4, L); al (1, L).
    Returns list of 10 (16, L) tiles in bmode enum order."""
    cat = lambda *xs: jnp.concatenate(xs, axis=0)
    east = cat(_row(left, 3), _row(left, 2), _row(left, 1),
               _row(left, 0), al, a)                     # (13, L)
    a4 = a[0:4]

    dc = _bcast((jnp.sum(a4, 0, keepdims=True)
                 + jnp.sum(left, 0, keepdims=True) + 4) >> 3, 16)
    tm = cat(*[jnp.clip(_bcast(_row(left, y), 4) + a4 - _bcast(al, 4),
                        0, 255) for y in range(4)])
    ve_v = _avg3(cat(al, a[0:3]), a4, a[1:5])
    ve = jnp.tile(ve_v, (4, 1))
    he_v = _avg3(cat(al, left[0:3]), left,
                 cat(left[1:4], _row(left, 3)))
    he = cat(*[_bcast(_row(he_v, y), 4) for y in range(4)])

    ld_v = cat(_avg3(a[0:6], a[1:7], a[2:8]),
               _avg3(_row(a, 6), _row(a, 7), _row(a, 7)))   # (7, L)
    ld = cat(*[ld_v[y:y + 4] for y in range(4)])
    rd_v = _avg3(east[0:7], east[1:8], east[2:9])           # (7, L)
    rd = cat(*[rd_v[3 - y:7 - y] for y in range(4)])

    vr3 = _avg3(east[1:7], east[2:8], east[3:9])            # (6, L)
    vr2 = _avg2(east[4:9], east[5:10])                      # (5, L)
    vr = cat(vr2[0:4], vr3[2:6],
             _row(vr3, 1), vr2[0:3],
             _row(vr3, 0), vr3[2:5])

    vl2 = _avg2(a[0:4], a[1:5])
    vl3 = _avg3(a[0:6], a[1:7], a[2:8])
    vl = cat(vl2[0:4], vl3[0:4],
             vl2[1:4], _row(vl3, 4),
             vl3[1:4], _row(vl3, 5))

    hd2 = _avg2(east[0:5], east[1:6])
    hd3 = _avg3(east[0:6], east[1:7], east[2:8])
    hd = cat(_row(hd2, 3), _row(hd3, 3), _row(hd3, 4), _row(hd3, 5),
             _row(hd2, 2), _row(hd3, 2), _row(hd2, 3), _row(hd3, 3),
             _row(hd2, 1), _row(hd3, 1), _row(hd2, 2), _row(hd3, 2),
             _row(hd2, 0), _row(hd3, 0), _row(hd2, 1), _row(hd3, 1))

    l0, l1, l2, l3 = (_row(left, i) for i in range(4))
    hu = cat(_avg2(l0, l1), _avg3(l0, l1, l2), _avg2(l1, l2),
             _avg3(l1, l2, l3),
             _avg2(l1, l2), _avg3(l1, l2, l3), _avg2(l2, l3),
             _avg3(l2, l3, l3),
             _avg2(l2, l3), _avg3(l2, l3, l3), l3, l3,
             l3, l3, l3, l3)
    return [dc, tm, ve, he, ld, rd, vr, vl, hd, hu]


def _bpred_tile(a16, ar4, e0, lcol, bm, rb, nz):
    """B_PRED macroblock chain as a fori_loop over the four subblock BANDS
    (macroblock.cc:539-544; band restructuring per ops/intra_pallas.py) —
    per-band data rides the carry and rotates into a static sublane window
    each iteration.  All args pixel-major; rb (256, L) subblock-layout
    residual."""
    L = a16.shape[-1]
    al_roll0 = jnp.concatenate(
        [e0] + [_row(lcol, 4 * b - 1) for b in range(1, 4)], axis=0)

    def band(_i, carry):
        (prev_bottom, out_acc, lc_roll, al_roll, bm_roll, rb_roll) = carry
        lcb = lc_roll[0:4]
        al_first = al_roll[0:1]
        bmb = bm_roll[0:4]
        rbb = rb_roll[0:64]
        above20 = jnp.concatenate([prev_bottom, ar4], axis=0)
        rows = [jnp.zeros((16, L), jnp.int32)] * 4
        block_prev = None
        for sc in range(4):
            above4 = above20[sc * 4:sc * 4 + 4]
            ar = above20[(sc + 1) * 4:(sc + 1) * 4 + 4]
            al = al_first if sc == 0 else _row(above20, sc * 4 - 1)
            left4 = (lcb if sc == 0 else
                     jnp.concatenate([_row(block_prev, i * 4 + 3)
                                      for i in range(4)], axis=0))
            preds = _sb_predict_all(jnp.concatenate([above4, ar], axis=0),
                                    left4, al)
            m = _row(bmb, sc)
            sel = preds[0]
            for k in range(1, 10):
                sel = jnp.where(m == k, preds[k], sel)
            res = jnp.where(nz, rbb[sc * 16:sc * 16 + 16], 0)
            block = jnp.clip(sel + res, 0, 255)   # (16, L) row-major 4x4
            for i in range(4):
                r = rows[i]
                parts = ([r[:sc * 4]] if sc > 0 else []) \
                    + [block[i * 4:i * 4 + 4]] \
                    + ([r[sc * 4 + 4:]] if sc < 3 else [])
                rows[i] = jnp.concatenate(parts, axis=0)
            block_prev = block
        band_out = jnp.concatenate(rows, axis=0)             # (64, L)
        out_acc = jnp.concatenate([out_acc[64:], band_out], axis=0)
        roll = lambda x, n: jnp.concatenate([x[n:], x[:n]], axis=0)
        return (rows[3], out_acc, roll(lc_roll, 4), roll(al_roll, 1),
                roll(bm_roll, 4), roll(rb_roll, 64))

    _, out, _, _, _, _ = jax.lax.fori_loop(
        0, 4, band, (a16, jnp.zeros((256, L), jnp.int32),
                     lcol, al_roll0, bm, rb))
    return out


# ---------------------------------------------------------------------------
# kernel phases
# ---------------------------------------------------------------------------

def _cat2(x):
    """Duplicate along lanes for the fused-UV layout: (k, L) -> (k, 2L).
    L is vreg-aligned in practice, so the concat is free tiling.  Mosaic
    cannot relayout i1 vectors (bitcast_vreg i1->i32 fails), so boolean
    masks ride the concat as int32 and are re-compared after."""
    if x.dtype == jnp.bool_:
        xi = x.astype(jnp.int32)
        return jnp.concatenate([xi, xi], axis=-1) != 0
    return jnp.concatenate([x, x], axis=-1)


def _intra_phase(d, prm_ref, dy_ref, duv_ref,
                 r16_ref, rb_ref, ruv_ref,
                 ring_y, ring_uv, cs_y, cs_u, rep_y, rep_u):
    """Intra-predict diagonal d into the ring (intra_pallas semantics).

    U and V ride ONE (64, 2L) slab (lane = plane*L + storage row): the
    chroma prediction/filter math runs once over both planes.  Lane
    shifts crossing the plane boundary land on a frame's row-0 lane,
    which has_row already masks — the same mechanism that isolates the
    folded GOP batch."""
    pm = prm_ref[0].astype(jnp.int32)              # (32, L)
    col = lambda k: pm[k:k + 1]
    ymode, uvmode = col(0), col(1)
    nz = col(2) != 0
    write = (col(4) != 0) & (col(3) != 0)          # valid & intra
    hrow, hcol, lcolm = col(5) != 0, col(6) != 0, col(7) != 0
    bm = pm[8:24]
    any_intra = jnp.any(write)
    any_b = jnp.any(write & (ymode == B_PRED))

    cur_y = dy_ref[0].astype(jnp.int32)
    cur_uv = duv_ref[0].astype(jnp.int32)          # (64, 2L)

    s1, s2, s3 = (d + RING - 1) % RING, (d + RING - 2) % RING, \
        (d + RING - 3) % RING
    # neighbor context: sublane-slice first (aligned, free), lane-shift the
    # small result (the lane-major kernel had to shift whole slabs first)
    # shifts operate on 8-ALIGNED sublane slices only: Mosaic's lane
    # concat requires matching sublane offsets, so e.g. rows [255:256]
    # (offset 7) are taken AFTER shifting the aligned [248:256] block
    abv_row = _shift_lanes(ring_y[s2][240:256].astype(jnp.int32))
    ar_row = _shift_lanes(ring_y[s1][240:244].astype(jnp.int32))
    al_c = _shift_lanes(ring_y[s3][248:256].astype(jnp.int32))[7:8]
    lcol_raw = _mm(cs_y, ring_y[s1])               # (16, L)
    abv_uv = _shift_lanes(ring_uv[s2][56:64].astype(jnp.int32))
    al_uv = _shift_lanes(ring_uv[s3][56:64].astype(jnp.int32))[7:8]
    lcol_uv = _mm(cs_u, ring_uv[s1])               # (8, 2L)

    r16 = r16_ref[0].astype(jnp.int32)
    rb = rb_ref[0].astype(jnp.int32)
    ruv = ruv_ref[0].astype(jnp.int32)

    def compute(_):
        a16 = jnp.where(hrow, abv_row, 127)
        ar4 = jnp.where(hrow & ~lcolm, ar_row,
                        jnp.where(hrow & lcolm, _bcast(a16[15:16], 4),
                                  127))
        e0 = jnp.where(hrow & hcol, al_c, jnp.where(hrow, 129, 127))
        lcol = jnp.where(hcol, lcol_raw, 129)

        whole = _whole_predict(a16, lcol, e0, hrow, hcol, ymode, 16, rep_y)
        whole = jnp.clip(whole + jnp.where(nz, r16, 0), 0, 255)
        bt = jax.lax.cond(
            any_b,
            lambda x: _bpred_tile(a16, ar4, e0, lcol, bm, rb, nz),
            lambda x: x, whole)
        new_y = jnp.where((ymode == B_PRED), bt, whole)

        hrow2, hcol2 = _cat2(hrow), _cat2(hcol)
        a8 = jnp.where(hrow2, abv_uv, 127)
        ce0 = jnp.where(hrow2 & hcol2, al_uv,
                        jnp.where(hrow2, 129, 127))
        cl = jnp.where(hcol2, lcol_uv, 129)
        p = _whole_predict(a8, cl, ce0, hrow2, hcol2, _cat2(uvmode), 8,
                           rep_u)
        new_uv = jnp.clip(p + jnp.where(_cat2(nz), ruv, 0), 0, 255)
        return (jnp.where(write, new_y, cur_y),
                jnp.where(_cat2(write), new_uv, cur_uv))

    out_y, out_uv = jax.lax.cond(
        any_intra, compute, lambda _: (cur_y, cur_uv), 0)
    ring_y[d % RING] = out_y.astype(jnp.int16)
    ring_uv[d % RING] = out_uv.astype(jnp.int16)


def _edge(groups, limit, blimit, thresh, mb_edge, do):
    """Filter one edge given its 8 pixel groups (p3..p0, q0..q3), each
    (S, L) int32 raw [0,255].  The (1, L) ``do`` mask merges filtered
    lanes.  Math shared with ops/loopfilter.py (loopfilter_filters.hh)."""
    mask, hev = _mask_hev(limit, blimit, thresh, *groups)
    s = [g - 128 for g in groups]
    if mb_edge:
        p2, p1, p0, q0, q1, q2 = _mb_filter(s[1], s[2], s[3], s[4], s[5],
                                            s[6], mask, hev)
        new = (1, p2), (2, p1), (3, p0), (4, q0), (5, q1), (6, q2)
    else:
        p1, p0, q0, q1 = _common_filter(s[2], s[3], s[4], s[5], mask, hev)
        new = (2, p1), (3, p0), (4, q0), (5, q1)
    out = list(groups)
    for idx, v in new:
        out[idx] = jnp.where(do, (v + 128).astype(groups[idx].dtype),
                             groups[idx])
    return out


def _lf_phase(e, prms, tp, ring, S):
    """Loop-filter diagonal e (reference pass order loopfilter.cc:133-154:
    MB left edge, interior V edges, MB top edge, interior H edges).
    prms: pre-extracted (interior, mb_lim, sb_lim, hev_t, do_sb, do_left,
    do_top), each (1, lanes-of-ring)."""
    interior, mb_lim, sb_lim, hev_t, do_sb, do_left, do_top = prms

    se, s1, s2 = e % RING, (e + RING - 1) % RING, (e + RING - 2) % RING
    cur = ring[se].astype(jnp.int32)       # (P, L)
    left = ring[s1].astype(jnp.int32)
    topraw = ring[s2]
    top = _shift_lanes(topraw.astype(jnp.int32))

    grp = lambda slab, j: slab[j * S:(j + 1) * S]

    # ---- vertical passes (column-major pixel space via MXU permute) ----
    curT = _mm(tp, cur)
    leftT = _mm(tp, left)
    ccols = [grp(curT, j) for j in range(S)]
    lcols = [grp(leftT, j) for j in range(S - 4, S)]

    g = _edge(lcols + ccols[0:4], interior, mb_lim, hev_t, True, do_left)
    lcols = g[0:4]
    ccols[0:4] = g[4:8]
    for x in range(4, S, 4):
        g = _edge(ccols[x - 4:x + 4], interior, sb_lim, hev_t, False, do_sb)
        ccols[x - 4:x + 4] = g

    cur = _mm(tp, jnp.concatenate(ccols, axis=0))
    leftT = jnp.concatenate(
        [grp(leftT, j) for j in range(S - 4)] + lcols, axis=0)
    ring[s1] = _mm(tp, leftT, jnp.int16)

    # ---- horizontal passes (natural row-major pixel space) ----
    crows = [grp(cur, j) for j in range(S)]
    trows = [grp(top, j) for j in range(S - 4, S)]

    g = _edge(trows + crows[0:4], interior, mb_lim, hev_t, True, do_top)
    trows = g[0:4]
    crows[0:4] = g[4:8]
    for y in range(4, S, 4):
        g = _edge(crows[y - 4:y + 4], interior, sb_lim, hev_t, False, do_sb)
        crows[y - 4:y + 4] = g

    ring[se] = jnp.concatenate(crows, axis=0).astype(jnp.int16)
    top_new = jnp.concatenate(
        [grp(top, j) for j in range(S - 4)] + trows, axis=0)
    # shift back one storage row (lane); the last lane was never aligned in
    ring[s2] = jnp.concatenate(
        [top_new[:, 1:].astype(jnp.int16), topraw[:, -1:]], axis=1)


def _wave_kernel(nd, prm_ref, lfprm_ref, tpy_ref, tpu_ref,
                 csy_ref, csu_ref, repy_ref, repu_ref,
                 dy_ref, duv_ref, r16_ref, rb_ref, ruv_ref,
                 oy_ref, ouv_ref,
                 ring_y, ring_uv):
    d = pl.program_id(0)

    @pl.when(d < nd)
    def _():
        _intra_phase(d, prm_ref, dy_ref, duv_ref,
                     r16_ref, rb_ref, ruv_ref,
                     ring_y, ring_uv,
                     csy_ref[...], csu_ref[...], repy_ref[...], repu_ref[...])

    @pl.when((d >= 3) & (d < nd + 3))
    def _():
        e = d - 3
        p = lfprm_ref[0].astype(jnp.int32)     # (8, L)
        col = lambda k: p[k:k + 1]
        prms = (col(1), col(2), col(3), col(4),
                col(5) != 0, col(6) != 0, col(7) != 0)
        _lf_phase(e, prms, tpy_ref[...], ring_y, 16)
        _lf_phase(e, tuple(_cat2(x) for x in prms), tpu_ref[...],
                  ring_uv, 8)

    # emit diagonal d-5 (final after LF(d-3) touched it as "top")
    oy_ref[0] = ring_y[(d - 5) % RING]
    ouv_ref[0] = ring_uv[(d - 5) % RING]


def wavefront_frame_batch_pm(dy, duv, prm, r16, rb, ruv, lfprm,
                             interpret=None):
    """Run the merged intra + loop-filter wavefront, pixel-major.

    dy: (n_diags, 256, L) int16 stage-B luma tiles — PIXEL index on the
    sublane axis, storage rows (GOP batch folded: L = G * R_pad) on
    lanes; duv: (n_diags, 64, 2L) fused chroma (lane = plane*L + row);
    prm: (n_diags, 32, L) int16 (intra param words on sublanes); r16/rb:
    (n_diags, 256, L) Y residuals (assembled / subblock layouts); ruv:
    (n_diags, 64, 2L); lfprm: (n_diags, 8, L).  Returns the decoded +
    filtered luma (n_diags, 256, L) and fused chroma (n_diags, 64, 2L).

    interpret=None autodetects: off-TPU the kernel runs in Pallas
    interpret mode so the TPU decode path is testable anywhere.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nd, _, L = dy.shape
    n_steps = nd + 5
    at_d = lambda P: pl.BlockSpec(
        (1, P, L), lambda d: (jnp.minimum(d, nd - 1), 0, 0),
        memory_space=pltpu.VMEM)
    at_lf = pl.BlockSpec(
        (1, 8, L), lambda d: (jnp.clip(d - 3, 0, nd - 1), 0, 0),
        memory_space=pltpu.VMEM)
    out_at = lambda P: pl.BlockSpec(
        (1, P, L), lambda d: (jnp.maximum(d - 5, 0), 0, 0),
        memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    at2 = lambda P: pl.BlockSpec(
        (1, P, 2 * L), lambda d: (jnp.minimum(d, nd - 1), 0, 0),
        memory_space=pltpu.VMEM)
    out2 = pl.BlockSpec(
        (1, 64, 2 * L), lambda d: (jnp.maximum(d - 5, 0), 0, 0),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_wave_kernel, nd),
        grid=(n_steps,),
        in_specs=[at_d(32), at_lf, full, full, full, full, full, full,
                  at_d(256), at2(64),
                  at_d(256), at_d(256), at2(64)],
        out_specs=(out_at(256), out2),
        out_shape=(jax.ShapeDtypeStruct((nd, 256, L), jnp.int16),
                   jax.ShapeDtypeStruct((nd, 64, 2 * L), jnp.int16)),
        scratch_shapes=[pltpu.VMEM((RING, 256, L), jnp.int16),
                        pltpu.VMEM((RING, 64, 2 * L), jnp.int16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(prm.astype(jnp.int16), lfprm.astype(jnp.int16),
      _t_perm(16), _t_perm(8), _colsel(16, 15), _colsel(8, 7),
      _rep_mat(16), _rep_mat(8), dy, duv, r16, rb, ruv)
