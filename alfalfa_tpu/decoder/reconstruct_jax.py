"""Device (JAX/XLA) frame reconstruction.

TPU-first reformulation of the reference pixel pipeline (SURVEY.md section
7.1): everything data-parallel runs as dense batched ops over the whole
frame (residual transforms, sixtap motion compensation); the sequentially
dependent parts (intra prediction, loop filter) run as `lax.scan` wavefronts
over anti-diagonals d = 2*row + col.

Wavefront storage is **diagonal-skewed**: macroblock tiles live in an array
``D[d, j]`` indexed by (diagonal, position-in-diagonal), so a step's
neighbor reads (left = d-1, above = d-2, above-right = d-1, above-left =
d-3, each at a per-diagonal constant j-shift) are contiguous
``dynamic_slice`` windows and its writes are ``dynamic_update_slice`` —
no gathers or scatters anywhere in the scan body.  This is what makes the
wavefronts cheap on TPU: the whole loop filter is ~169 slab-sized
vector steps instead of thousands of scatter ops.

Bit-exact vs. the numpy scalar path (tests/test_reconstruct_jax.py), which
is itself bit-exact vs. the reference decoder.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from alfalfa_tpu.bitstream import tables as T
from alfalfa_tpu.util import jaxcache

jaxcache.enable()
from alfalfa_tpu.ops import transforms, sixtap, intra, loopfilter as lf_ops
from alfalfa_tpu.state.decoder_state import Raster


# ---------------------------------------------------------------------------
# diagonal-skewed wavefront scheduling (host-side, cached per geometry)
# ---------------------------------------------------------------------------

_SCHED_CACHE = {}


def skew_schedule(mb_rows, mb_cols):
    """Schedule tables for the skewed wavefront d = 2r + c.

    Returns a dict of numpy arrays:
      scat_idx  (n_diags, L): flat r*C+c index of the MB at (d, j), or R*C
                 for padding slots (gathers a zero tile).
      unskew_idx (R, C): flat d*L+j position of each MB in skewed storage.
      d_idx, k_left, k_above, k_ar, k_al (n_diags,): per-diagonal j-shifts
                 for reading neighbor diagonals (left/above/above-right/
                 above-left); stored tiles sit at axis-1 offset +1 so the
                 shifted window start k+1 is always >= 0.
      valid, has_row, has_col, last_col (n_diags, L): per-slot masks.
    """
    key = (mb_rows, mb_cols)
    if key in _SCHED_CACHE:
        return _SCHED_CACHE[key]
    R, C = mb_rows, mb_cols
    n_diags = 2 * (R - 1) + C

    def start_r(d):
        return max(0, -((-(d - C + 1)) // 2) if d >= C else 0)

    # explicit: smallest r with c = d - 2r <= C-1 and r >= 0
    def s(d):
        if d < 0:
            return 0
        return max(0, (d - C + 1 + 1) // 2)  # ceil((d-C+1)/2)

    lens = []
    for d in range(n_diags):
        lo = s(d)
        hi = min(R - 1, d // 2)
        lens.append(max(0, hi - lo + 1))
    L = max(lens)

    scat = np.full((n_diags, L), R * C, np.int32)
    unskew = np.zeros((R, C), np.int32)
    valid = np.zeros((n_diags, L), bool)
    has_row = np.zeros((n_diags, L), bool)
    has_col = np.zeros((n_diags, L), bool)
    last_col = np.zeros((n_diags, L), bool)
    for d in range(n_diags):
        for j in range(lens[d]):
            r = s(d) + j
            c = d - 2 * r
            scat[d, j] = r * C + c
            unskew[r, c] = d * L + j
            valid[d, j] = True
            has_row[d, j] = r > 0
            has_col[d, j] = c > 0
            last_col[d, j] = c == C - 1

    d_idx = np.arange(n_diags, dtype=np.int32)
    k_left = np.array([s(d) - s(d - 1) for d in range(n_diags)], np.int32)
    k_above = np.array([s(d) - 1 - s(d - 2) for d in range(n_diags)], np.int32)
    k_ar = np.array([s(d) - 1 - s(d - 1) for d in range(n_diags)], np.int32)
    k_al = np.array([s(d) - 1 - s(d - 3) for d in range(n_diags)], np.int32)
    assert k_left.min() >= -1 and k_above.min() >= -1 and \
        k_ar.min() >= -1 and k_al.min() >= -1

    _SCHED_CACHE[key] = dict(
        n_diags=n_diags, L=L, scat_idx=scat, unskew_idx=unskew,
        d_idx=d_idx, k_left=k_left, k_above=k_above, k_ar=k_ar, k_al=k_al,
        valid=valid, has_row=has_row, has_col=has_col, last_col=last_col)
    return _SCHED_CACHE[key]


# Skewed pixel storage puts diagonal d at row d + DPAD so neighbor reads
# (down to d-3) never need index clamping, and keeps tiles flattened to a
# single lane axis in int16 — minor dims like (16, 16) would be tile-padded
# by XLA and make every scan-step slab slice ~8x more expensive.
DPAD = 3


def _skew(x, scat_idx, n_diags, L):
    """(R, C, ...) -> (DPAD + n_diags, L+2[, P]) with tiles at axis-1
    offset 1 and zero padding (one take, no scatter)."""
    R, C = x.shape[0], x.shape[1]
    flat = x.reshape((R * C, -1)) if x.ndim > 2 else x.reshape((R * C,))
    pad = jnp.zeros((1,) + flat.shape[1:], flat.dtype)
    flat = jnp.concatenate([flat, pad])
    sk = jnp.take(flat, scat_idx.reshape(-1), axis=0) \
        .reshape((n_diags, L) + flat.shape[1:])
    zcol = jnp.zeros((n_diags, 1) + flat.shape[1:], x.dtype)
    sk = jnp.concatenate([zcol, sk, zcol], axis=1)
    zrow = jnp.zeros((DPAD,) + sk.shape[1:], x.dtype)
    return jnp.concatenate([zrow, sk], axis=0)


def _unskew(D, unskew_idx, R, C, tile_shape):
    """(DPAD + n_diags, L+2, P) skewed storage -> (R, C) + tile_shape."""
    body = D[DPAD:, 1:-1]  # strip pad rows/slots
    flat = body.reshape((body.shape[0] * body.shape[1],) + D.shape[2:])
    return jnp.take(flat, unskew_idx.reshape(-1), axis=0) \
        .reshape((R, C) + tile_shape)


def _read_slab(D, d, k, L, tile_shape=None):
    """Window of L tiles of diagonal d (can be as low as -DPAD), j-shifted
    by k (k in [-1, 1]); garbage pad slots are masked by callers."""
    start = (d + DPAD, k + 1) + (0,) * (D.ndim - 2)
    size = (1, L) + D.shape[2:]
    slab = jax.lax.dynamic_slice(D, start, size)[0]
    return slab if tile_shape is None else slab.reshape((L,) + tile_shape)


def _write_slab(D, d, k, slab):
    start = (d + DPAD, k + 1) + (0,) * (D.ndim - 2)
    slab = slab.reshape((slab.shape[0],) + D.shape[2:])
    return jax.lax.dynamic_update_slice(D, slab[None], start)


# legacy helper kept for callers that want the plain diagonal listing
def wavefront_schedule(mb_rows, mb_cols):
    sched = skew_schedule(mb_rows, mb_cols)
    n_diags, L = sched["n_diags"], sched["L"]
    scat = sched["scat_idx"]
    rs = np.where(scat < mb_rows * mb_cols, scat // mb_cols, 0).astype(np.int32)
    cs = np.where(scat < mb_rows * mb_cols, scat % mb_cols, 0).astype(np.int32)
    return rs, cs, sched["valid"]


# ---------------------------------------------------------------------------
# the jitted frame kernel
# ---------------------------------------------------------------------------

def reconstruct_core(mb_rows, mb_cols, key_frame,
                     coeffs, qf, y2_coded, has_nonzero,
                     ymode, uvmode, bmode, ref_sel, sub_mv, uv_mv,
                     ref_y, ref_u, ref_v,
                     lf_params, sched, intra_active=None):
    R, C = mb_rows, mb_cols
    n_diags = int(sched["scat_idx"].shape[0])
    L = int(sched["scat_idx"].shape[1])
    scat_idx = sched["scat_idx"]
    unskew_idx = sched["unskew_idx"]

    def skew(x):
        return _skew(x, scat_idx, n_diags, L)

    # ---- stage A: residuals (fully parallel) ----
    res = transforms.residuals_from_coeffs(coeffs, qf, y2_coded)  # (R,C,24,4,4)
    res = jnp.where(has_nonzero[:, :, None, None, None], res, 0)

    y_tiles = jnp.zeros((R, C, 16, 16), jnp.int32)
    u_tiles = jnp.zeros((R, C, 8, 8), jnp.int32)
    v_tiles = jnp.zeros((R, C, 8, 8), jnp.int32)

    def res_mb_y(rblocks):
        return rblocks.reshape(R, C, 4, 4, 4, 4).transpose(0, 1, 2, 4, 3, 5) \
            .reshape(R, C, 16, 16)

    def res_mb_uv(rblocks):
        return rblocks.reshape(R, C, 2, 2, 4, 4).transpose(0, 1, 2, 4, 3, 5) \
            .reshape(R, C, 8, 8)

    res_y = res_mb_y(res[:, :, 0:16])
    res_u = res_mb_uv(res[:, :, 16:20])
    res_v = res_mb_uv(res[:, :, 20:24])

    # ---- stage B: inter prediction (fully parallel) ----
    if not key_frame:
        is_inter = ref_sel > 0

        pred = sixtap.predict_mb_tiles(ref_y, ref_sel, sub_mv, 16)
        y_inter = jnp.clip(pred + res_y, 0, 255)
        pred_u = sixtap.predict_mb_tiles(ref_u, ref_sel, uv_mv, 8)
        pred_v = sixtap.predict_mb_tiles(ref_v, ref_sel, uv_mv, 8)
        u_inter = jnp.clip(pred_u + res_u, 0, 255)
        v_inter = jnp.clip(pred_v + res_v, 0, 255)

        m = is_inter[:, :, None, None]
        y_tiles = jnp.where(m, y_inter, y_tiles)
        u_tiles = jnp.where(m, u_inter, u_tiles)
        v_tiles = jnp.where(m, v_inter, v_tiles)
        intra_mask_full = ~is_inter
    else:
        intra_mask_full = jnp.ones((R, C), bool)

    # ---- skew everything the wavefronts touch ----
    # pixel carries are int16: halves slab traffic, values stay in [0, 255]
    D_y = skew(y_tiles.astype(jnp.int16))
    D_u = skew(u_tiles.astype(jnp.int16))
    D_v = skew(v_tiles.astype(jnp.int16))
    masks = {k: jnp.asarray(sched[k]) for k in
             ("valid", "has_row", "has_col", "last_col")}
    shifts = {k: jnp.asarray(sched[k]) for k in
              ("d_idx", "k_left", "k_above", "k_ar", "k_al")}

    def strip(x):
        return x[DPAD:, 1:-1]  # drop pad rows/slots for per-step xs

    # ---- stage C: intra wavefront ----
    def intra_step(carry, xs):
        D_y, D_u, D_v = carry
        (d, kl, ka, kar, kal, valid, hrow, hcol, lcol_mask,
         my_ymode, my_uvmode, my_bmode, my_nz, my_intra,
         res16, resb, res8u, res8v) = xs
        write = valid & my_intra
        any_intra = jnp.any(write)

        def work(D_y, D_u, D_v):
            res16 = xs[14].reshape(L, 16, 16)
            resb = xs[15].reshape(L, 16, 4, 4)
            res8u = xs[16].reshape(L, 8, 8)
            res8v = xs[17].reshape(L, 8, 8)
            my_bmode_t = my_bmode.reshape(L, 4, 4)
            left = _read_slab(D_y, d - 1, kl, L, (16, 16)).astype(jnp.int32)
            above = _read_slab(D_y, d - 2, ka, L, (16, 16)).astype(jnp.int32)
            ar = _read_slab(D_y, d - 1, kar, L, (16, 16)).astype(jnp.int32)
            al = _read_slab(D_y, d - 3, kal, L, (16, 16)).astype(jnp.int32)

            above16 = jnp.where(hrow[:, None], above[:, 15, :], 127)
            ar4 = jnp.where((hrow & ~lcol_mask)[:, None], ar[:, 15, 0:4],
                            jnp.where((hrow & lcol_mask)[:, None],
                                      above16[:, 15:16], 127))
            e0 = jnp.where(hrow & hcol, al[:, 15, 15],
                           jnp.where(hrow, 129, 127))
            e21 = jnp.concatenate([e0[:, None], above16, ar4], axis=1)
            lcol = jnp.where(hcol[:, None], left[:, :, 15], 129)

            whole = jax.vmap(lambda e, l, hr, hc, m: intra.whole_block_predict(
                e, l, hr, hc, m, 16))(e21, lcol, hrow, hcol, my_ymode)
            whole = jnp.clip(
                whole + jnp.where(my_nz[:, None, None], res16, 0), 0, 255)

            bt = jax.vmap(intra.bpred_tile)(e21, lcol, my_bmode_t, resb, my_nz)
            new_y = jnp.where((my_ymode == T.B_PRED)[:, None, None], bt, whole)

            def chroma(Dp, res8):
                lft = _read_slab(Dp, d - 1, kl, L, (8, 8)).astype(jnp.int32)
                abv = _read_slab(Dp, d - 2, ka, L, (8, 8)).astype(jnp.int32)
                alt = _read_slab(Dp, d - 3, kal, L, (8, 8)).astype(jnp.int32)
                a8 = jnp.where(hrow[:, None], abv[:, 7, :], 127)
                ce0 = jnp.where(hrow & hcol, alt[:, 7, 7],
                                jnp.where(hrow, 129, 127))
                ce = jnp.concatenate([ce0[:, None], a8], axis=1)
                cl = jnp.where(hcol[:, None], lft[:, :, 7], 129)
                p = jax.vmap(lambda e, l, hr, hc, m: intra.whole_block_predict(
                    e, l, hr, hc, m, 8))(ce, cl, hrow, hcol, my_uvmode)
                return jnp.clip(
                    p + jnp.where(my_nz[:, None, None], res8, 0), 0, 255)

            new_u = chroma(D_u, res8u)
            new_v = chroma(D_v, res8v)

            cur_y = _read_slab(D_y, d, 0, L, (16, 16))
            cur_u = _read_slab(D_u, d, 0, L, (8, 8))
            cur_v = _read_slab(D_v, d, 0, L, (8, 8))
            wm = write[:, None, None]
            i16 = lambda x: x.astype(jnp.int16)
            D_y = _write_slab(D_y, d, 0, jnp.where(wm, i16(new_y), cur_y))
            D_u = _write_slab(D_u, d, 0, jnp.where(wm, i16(new_u), cur_u))
            D_v = _write_slab(D_v, d, 0, jnp.where(wm, i16(new_v), cur_v))
            return D_y, D_u, D_v

        carry = jax.lax.cond(any_intra, work,
                             lambda a, b, c: (a, b, c), D_y, D_u, D_v)
        return carry, None

    if intra_active is None:
        sel_rows = None

        def skew_xs(x):
            return strip(skew(x))
    else:
        # run only the diagonals that contain intra macroblocks: fold the
        # active-row selection into the skew gather so per-MB xs arrays
        # materialize A rows instead of n_diags (sentinel entries gather
        # all-masked zero rows)
        pad_row = jnp.full((1, L), R * C, scat_idx.dtype)
        sel_rows = jnp.take(jnp.concatenate([scat_idx, pad_row]),
                            intra_active, axis=0)  # (A, L)

        def skew_xs(x):
            flat = (x.reshape((R * C, -1)) if x.ndim > 2
                    else x.reshape((R * C,)))
            zero = jnp.zeros((1,) + flat.shape[1:], flat.dtype)
            flat = jnp.concatenate([flat, zero])
            A = intra_active.shape[0]
            return jnp.take(flat, sel_rows.reshape(-1), axis=0) \
                .reshape((A, L) + flat.shape[1:])

    def sel_sched(a):
        if intra_active is None:
            return a
        pad = jnp.zeros((1,) + a.shape[1:], a.dtype)
        return jnp.concatenate([a, pad])[intra_active]

    intra_xs = (sel_sched(shifts["d_idx"]), sel_sched(shifts["k_left"]),
                sel_sched(shifts["k_above"]), sel_sched(shifts["k_ar"]),
                sel_sched(shifts["k_al"]),
                sel_sched(masks["valid"]), sel_sched(masks["has_row"]),
                sel_sched(masks["has_col"]), sel_sched(masks["last_col"]),
                skew_xs(ymode), skew_xs(uvmode), skew_xs(bmode),
                skew_xs(has_nonzero), skew_xs(intra_mask_full),
                skew_xs(res_y), skew_xs(res[:, :, 0:16]), skew_xs(res_u),
                skew_xs(res_v))
    (D_y, D_u, D_v), _ = jax.lax.scan(intra_step, (D_y, D_u, D_v), intra_xs)

    # ---- stage D: loop filter wavefront ----
    lf_level, lf_interior, lf_mb_limit, lf_sb_limit, lf_hev, lf_skip_sb = \
        lf_params
    sk_lf = tuple(strip(skew(x)) for x in
                  (lf_level, lf_interior, lf_mb_limit, lf_sb_limit, lf_hev,
                   lf_skip_sb))

    def lf_step(carry, xs):
        D_y, D_u, D_v = carry
        (d, kl, ka, kal, valid, hrow, hcol,
         level, interior, mb_limit, sb_limit, hev, skip_sb) = xs

        apply = valid & (level > 0)
        do_left = apply & hcol
        do_top = apply & hrow
        do_sb = apply & ~skip_sb
        any_work = jnp.any(apply)

        def plane(D, size):
            # one fused read of diagonals d-3..d (rows d..d+3 of padded
            # storage), in-register slab extraction, one fused write-back
            P = D.shape[2]
            blk = jax.lax.dynamic_slice(
                D, (d, 0, 0), (DPAD + 1, D.shape[1], P))

            def slab(row, k):
                s = jax.lax.dynamic_slice(blk, (row, k + 1, 0), (1, L, P))[0]
                return s.reshape(L, size, size).astype(jnp.int32)

            tl = slab(0, kal)
            top = slab(1, ka)
            left = slab(2, kl)
            cur = slab(3, 0)
            win = jnp.concatenate([
                jnp.concatenate([tl[:, size - 4:, size - 4:],
                                 top[:, size - 4:, :]], axis=2),
                jnp.concatenate([left[:, :, size - 4:], cur], axis=2)],
                axis=1)  # (L, size+4, size+4)

            fwin = jax.vmap(lf_ops.filter_mb_window,
                            in_axes=(0, None, 0, 0, 0, 0, 0, 0, 0))(
                win, size, interior[:, None], mb_limit[:, None],
                sb_limit[:, None], hev[:, None],
                do_left[:, None, None], do_top[:, None, None],
                do_sb[:, None, None])

            am = apply[:, None, None]
            lm = do_left[:, None, None]
            tm = do_top[:, None, None]
            new_cur = jnp.where(am, fwin[:, 4:, 4:], cur)
            new_left = left.at[:, :, size - 3:].set(
                jnp.where(lm, fwin[:, 4:, 1:4], left[:, :, size - 3:]))
            new_top = top.at[:, size - 3:, :].set(
                jnp.where(tm, fwin[:, 1:4, 4:], top[:, size - 3:, :]))

            def put(blk, row, k, s):
                s = s.astype(jnp.int16).reshape(1, L, P)
                return jax.lax.dynamic_update_slice(blk, s, (row, k + 1, 0))

            blk = put(blk, 1, ka, new_top)
            blk = put(blk, 2, kl, new_left)
            blk = put(blk, 3, 0, new_cur)
            return jax.lax.dynamic_update_slice(D, blk, (d, 0, 0))

        def work(D_y, D_u, D_v):
            return plane(D_y, 16), plane(D_u, 8), plane(D_v, 8)

        carry = jax.lax.cond(any_work, work,
                             lambda a, b, c: (a, b, c), D_y, D_u, D_v)
        return carry, None

    lf_xs = (shifts["d_idx"], shifts["k_left"], shifts["k_above"],
             shifts["k_al"], masks["valid"], masks["has_row"],
             masks["has_col"]) + sk_lf
    (D_y, D_u, D_v), _ = jax.lax.scan(lf_step, (D_y, D_u, D_v), lf_xs)

    y_tiles = _unskew(D_y, unskew_idx, R, C, (16, 16))
    u_tiles = _unskew(D_u, unskew_idx, R, C, (8, 8))
    v_tiles = _unskew(D_v, unskew_idx, R, C, (8, 8))

    # ---- untile ----
    def untile(t, size):
        return t.transpose(0, 2, 1, 3).reshape(R * size, C * size).astype(jnp.uint8)

    return untile(y_tiles, 16), untile(u_tiles, 8), untile(v_tiles, 8)


_reconstruct_device = jax.jit(reconstruct_core,
                              static_argnames=("mb_rows", "mb_cols", "key_frame"))


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------

def _frame_quant_factors(header, state, segment):
    """Per-MB dequantization factors as (r, c) int32 arrays."""
    seg = state.segmentation
    if seg is not None:
        per_seg = [header.quant_indices.quantizer(int(seg.quantizer_adjustments[i]),
                                                  seg.absolute) for i in range(4)]
        out = {}
        for k in per_seg[0]:
            table = np.array([int(q[k]) for q in per_seg], np.int32)
            out[k] = table[segment]
        return out
    q = header.quant_indices.quantizer()
    r, c = segment.shape
    return {k: np.full((r, c), int(v), np.int32) for k, v in q.items()}


def _frame_lf_params(header, arrays, state, key_frame):
    """Per-MB loop filter parameters (host-side table math)."""
    seg = state.segmentation
    fa = state.filter_adjustments
    R, C = arrays.mb_rows, arrays.mb_cols

    if not header.loop_filter_level:
        z = np.zeros((R, C), np.int32)
        return (z, z, z, z, z, np.zeros((R, C), bool))

    if seg is not None:
        base = seg.filter_adjustments[arrays.segment].astype(np.int32) + \
            (0 if seg.absolute else header.loop_filter_level)
    else:
        base = np.full((R, C), header.loop_filter_level, np.int32)

    if fa is not None:
        ref = arrays.ref.astype(np.int32)
        ymode = arrays.ymode.astype(np.int32)
        base = base + fa.ref_adjustments[ref].astype(np.int32)
        mode_adj = np.where(
            ref == T.CURRENT_FRAME,
            np.where(ymode == T.B_PRED, fa.mode_adjustments[0], 0),
            np.where(ymode == T.ZEROMV, fa.mode_adjustments[1],
                     np.where(ymode == T.SPLITMV, fa.mode_adjustments[3],
                              fa.mode_adjustments[2]))).astype(np.int32)
        base = base + mode_adj

    # MBs with level <= 0 are skipped entirely (macroblock.cc:632-634)
    apply = base > 0
    p = lf_ops.loopfilter_params(base, header.sharpness_level, key_frame)
    level = np.where(apply, p["level"], 0).astype(np.int32)
    skip_sb = arrays.y2_coded & ~arrays.has_nonzero
    return (level, p["interior"].astype(np.int32),
            p["mb_limit"].astype(np.int32), p["sb_limit"].astype(np.int32),
            p["hev"].astype(np.int32), skip_sb)


def reconstruct(header, arrays, state, references, key_frame):
    """Device reconstruction; same contract as reconstruct_np.reconstruct."""
    R, C = arrays.mb_rows, arrays.mb_cols
    qf = _frame_quant_factors(header, state, arrays.segment)
    lf_params = _frame_lf_params(header, arrays, state, key_frame)
    sched = skew_schedule(R, C)
    sched_dev = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
                 for k, v in sched.items()}

    # stacked reference planes; index 0 is a dummy slot (intra)
    ref_y = jnp.stack([references.last.y, references.last.y,
                       references.golden.y, references.alternative.y])
    ref_u = jnp.stack([references.last.u, references.last.u,
                       references.golden.u, references.alternative.u])
    ref_v = jnp.stack([references.last.v, references.last.v,
                       references.golden.v, references.alternative.v])

    if key_frame:
        intra_active = None
    else:
        d_of = 2 * np.arange(R)[:, None] + np.arange(C)[None, :]
        active = np.unique(d_of[arrays.ref == 0])
        n_diags = sched["n_diags"]
        # two shape buckets only (compile time): sparse or full
        A = 16 if len(active) <= 16 else n_diags
        intra_active = np.full(A, n_diags, np.int32)  # sentinel rows
        intra_active[:min(len(active), A)] = active[:A]

    y, u, v = _reconstruct_device(
        R, C, bool(key_frame),
        jnp.asarray(arrays.coeffs, jnp.int32),
        {k: jnp.asarray(qa) for k, qa in qf.items()},
        jnp.asarray(arrays.y2_coded), jnp.asarray(arrays.has_nonzero),
        jnp.asarray(arrays.ymode, jnp.int32), jnp.asarray(arrays.uvmode, jnp.int32),
        jnp.asarray(arrays.bmode, jnp.int32), jnp.asarray(arrays.ref, jnp.int32),
        jnp.asarray(arrays.sub_mv, jnp.int32), jnp.asarray(arrays.uv_mv, jnp.int32),
        ref_y, ref_u, ref_v,
        tuple(jnp.asarray(x) for x in lf_params),
        sched_dev,
        None if intra_active is None else jnp.asarray(intra_active))

    return Raster(state.width, state.height, y, u, v)
