"""Device (JAX/XLA) frame reconstruction.

TPU-first reformulation of the reference pixel pipeline (SURVEY.md section
7.1): everything data-parallel runs as dense batched ops over the whole
frame (residual transforms, sixtap motion compensation); the sequentially
dependent parts (intra prediction, loop filter) run as `lax.scan` wavefronts
over anti-diagonals d = 2*row + col, with each diagonal's macroblocks
processed in parallel via masked gather/scatter on tiled planes.

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
# wavefront scheduling (host-side, cached per frame geometry)
# ---------------------------------------------------------------------------

_DIAG_CACHE = {}


def wavefront_schedule(mb_rows, mb_cols):
    """Anti-diagonal schedule d = 2r + c: returns (rs, cs, valid) arrays of
    shape (n_diags, max_len). Each diagonal's MBs are mutually independent
    for intra prediction and loop filtering (deps: left, above, above-right
    all lie on smaller d)."""
    key = (mb_rows, mb_cols)
    if key in _DIAG_CACHE:
        return _DIAG_CACHE[key]
    n_diags = 2 * (mb_rows - 1) + mb_cols
    diags = [[] for _ in range(n_diags)]
    for r in range(mb_rows):
        for c in range(mb_cols):
            diags[2 * r + c].append((r, c))
    max_len = max(len(d) for d in diags)
    rs = np.zeros((n_diags, max_len), np.int32)
    cs = np.zeros((n_diags, max_len), np.int32)
    valid = np.zeros((n_diags, max_len), bool)
    for i, d in enumerate(diags):
        for j, (r, c) in enumerate(d):
            rs[i, j], cs[i, j], valid[i, j] = r, c, True
    _DIAG_CACHE[key] = (rs, cs, valid)
    return _DIAG_CACHE[key]


# ---------------------------------------------------------------------------
# the jitted frame kernel
# ---------------------------------------------------------------------------

def reconstruct_core(mb_rows, mb_cols, key_frame,
                        coeffs, qf, y2_coded, has_nonzero,
                        ymode, uvmode, bmode, ref_sel, sub_mv, uv_mv,
                        ref_y, ref_u, ref_v,
                        lf_params,
                        diag_rs, diag_cs, diag_valid):
    R, C = mb_rows, mb_cols

    # ---- stage A: residuals (fully parallel) ----
    res = transforms.residuals_from_coeffs(coeffs, qf, y2_coded)  # (R,C,24,4,4)
    res = jnp.where(has_nonzero[:, :, None, None, None], res, 0)

    y_tiles = jnp.zeros((R, C, 16, 16), jnp.int32)
    u_tiles = jnp.zeros((R, C, 8, 8), jnp.int32)
    v_tiles = jnp.zeros((R, C, 8, 8), jnp.int32)

    def res_mb_y(rblocks):
        # (R, C, 16, 4, 4) -> (R, C, 16, 16)
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

        # luma: every 4x4 subblock, uniform sixtap
        rr, cc = jnp.mgrid[0:R, 0:C]
        sby = (rr[:, :, None, None] * 16 + jnp.arange(4)[None, None, :, None] * 4)
        sbx = (cc[:, :, None, None] * 16 + jnp.arange(4)[None, None, None, :] * 4)
        n = R * C * 16
        pred = sixtap.predict_4x4_blocks(
            ref_y,
            jnp.broadcast_to(ref_sel[:, :, None, None].astype(jnp.int32),
                             (R, C, 4, 4)).reshape(n),
            jnp.broadcast_to(sby, (R, C, 4, 4)).reshape(n),
            jnp.broadcast_to(sbx, (R, C, 4, 4)).reshape(n),
            sub_mv.reshape(n, 2).astype(jnp.int32))
        pred = pred.reshape(R, C, 4, 4, 4, 4).transpose(0, 1, 2, 4, 3, 5) \
            .reshape(R, C, 16, 16)
        y_inter = jnp.clip(pred + res_y, 0, 255)

        # chroma: every 4x4 subblock with its 2x2 parent MV
        sby = (rr[:, :, None, None] * 8 + jnp.arange(2)[None, None, :, None] * 4)
        sbx = (cc[:, :, None, None] * 8 + jnp.arange(2)[None, None, None, :] * 4)
        n = R * C * 4
        args = (jnp.broadcast_to(ref_sel[:, :, None, None].astype(jnp.int32),
                                 (R, C, 2, 2)).reshape(n),
                jnp.broadcast_to(sby, (R, C, 2, 2)).reshape(n),
                jnp.broadcast_to(sbx, (R, C, 2, 2)).reshape(n),
                uv_mv.reshape(n, 2).astype(jnp.int32))
        pred_u = sixtap.predict_4x4_blocks(ref_u, *args) \
            .reshape(R, C, 2, 2, 4, 4).transpose(0, 1, 2, 4, 3, 5).reshape(R, C, 8, 8)
        pred_v = sixtap.predict_4x4_blocks(ref_v, *args) \
            .reshape(R, C, 2, 2, 4, 4).transpose(0, 1, 2, 4, 3, 5).reshape(R, C, 8, 8)
        u_inter = jnp.clip(pred_u + res_u, 0, 255)
        v_inter = jnp.clip(pred_v + res_v, 0, 255)

        m = is_inter[:, :, None, None]
        y_tiles = jnp.where(m, y_inter, y_tiles)
        u_tiles = jnp.where(m, u_inter, u_tiles)
        v_tiles = jnp.where(m, v_inter, v_tiles)
        intra_mask_full = ~is_inter
    else:
        intra_mask_full = jnp.ones((R, C), bool)

    # ---- stage C: intra wavefront ----
    def intra_step(tiles, xs):
        rs, cs, valid = xs
        any_intra = jnp.any(valid & intra_mask_full[rs, cs])
        return (jax.lax.cond(any_intra, _intra_step_work,
                             lambda t, *_: t, tiles, rs, cs, valid), None)

    def _intra_step_work(tiles, rs, cs, valid):
        y_t, u_t, v_t = tiles
        L = rs.shape[0]
        has_row = rs > 0
        has_col = cs > 0
        last_col = cs == (C - 1)

        # luma context
        above16 = jnp.where(has_row[:, None], y_t[rs - 1, cs, 15, :], 127)
        ar4 = jnp.where((has_row & ~last_col)[:, None],
                        y_t[rs - 1, cs + (~last_col), 15, 0:4],
                        jnp.where((has_row & last_col)[:, None],
                                  above16[:, 15:16], 127))
        e0 = jnp.where(has_row & has_col, y_t[rs - 1, cs - 1, 15, 15],
                       jnp.where(has_row, 129, 127))
        e21 = jnp.concatenate([e0[:, None], above16, ar4], axis=1)
        lcol = jnp.where(has_col[:, None], y_t[rs, cs - 1, :, 15], 129)

        my_ymode = ymode[rs, cs]
        my_nz = has_nonzero[rs, cs]
        res16 = res_y[rs, cs]

        whole = jax.vmap(lambda e, l, hr, hc, m: intra.whole_block_predict(
            e, l, hr, hc, m, 16))(e21, lcol, has_row, has_col, my_ymode)
        whole = jnp.clip(whole + jnp.where(my_nz[:, None, None], res16, 0), 0, 255)

        bt = jax.vmap(intra.bpred_tile)(e21, lcol, bmode[rs, cs],
                                        res[rs, cs, 0:16], my_nz)
        new_y = jnp.where((my_ymode == T.B_PRED)[:, None, None], bt, whole)

        # chroma context
        def chroma_tile(t, res8):
            a8 = jnp.where(has_row[:, None], t[rs - 1, cs, 7, :], 127)
            ce0 = jnp.where(has_row & has_col, t[rs - 1, cs - 1, 7, 7],
                            jnp.where(has_row, 129, 127))
            ce = jnp.concatenate([ce0[:, None], a8], axis=1)
            cl = jnp.where(has_col[:, None], t[rs, cs - 1, :, 7], 129)
            p = jax.vmap(lambda e, l, hr, hc, m: intra.whole_block_predict(
                e, l, hr, hc, m, 8))(ce, cl, has_row, has_col, uvmode[rs, cs])
            return jnp.clip(p + jnp.where(my_nz[:, None, None], res8[rs, cs], 0),
                            0, 255)

        new_u = chroma_tile(u_t, res_u)
        new_v = chroma_tile(v_t, res_v)

        write = valid & intra_mask_full[rs, cs]
        rs_w = jnp.where(write, rs, R)  # out-of-range -> dropped
        y_t = y_t.at[rs_w, cs].set(new_y, mode="drop")
        u_t = u_t.at[rs_w, cs].set(new_u, mode="drop")
        v_t = v_t.at[rs_w, cs].set(new_v, mode="drop")
        return (y_t, u_t, v_t)

    (y_tiles, u_tiles, v_tiles), _ = jax.lax.scan(
        intra_step, (y_tiles, u_tiles, v_tiles),
        (diag_rs, diag_cs, diag_valid))

    # ---- stage D: loop filter wavefront ----
    lf_level, lf_interior, lf_mb_limit, lf_sb_limit, lf_hev, lf_skip_sb = lf_params

    def lf_plane(t, size, rs, cs, valid):
        """Filter one diagonal's MBs on one plane's tiles."""
        apply = valid & (lf_level[rs, cs] > 0)
        do_left = apply & (cs > 0)
        do_top = apply & (rs > 0)
        do_sb = apply & ~lf_skip_sb[rs, cs]

        tl = t[rs - 1, cs - 1, size - 4:, size - 4:]
        top = t[rs - 1, cs, size - 4:, :]
        left = t[rs, cs - 1, :, size - 4:]
        cur = t[rs, cs]
        win = jnp.concatenate([
            jnp.concatenate([tl, top], axis=2),
            jnp.concatenate([left, cur], axis=2)], axis=1)  # (L, size+4, size+4)

        limit = lf_interior[rs, cs][:, None]
        bmb = lf_mb_limit[rs, cs][:, None]
        bsb = lf_sb_limit[rs, cs][:, None]
        th = lf_hev[rs, cs][:, None]

        fwin = jax.vmap(lf_ops.filter_mb_window, in_axes=(0, None, 0, 0, 0, 0, 0, 0, 0))(
            win, size, limit, bmb, bsb, th,
            do_left[:, None, None], do_top[:, None, None], do_sb[:, None, None])

        # scatter: current tile, left strip (3 cols), top strip (3 rows)
        rs_w = jnp.where(apply, rs, R)
        t = t.at[rs_w, cs].set(fwin[:, 4:, 4:], mode="drop")
        rs_w = jnp.where(do_left, rs, R)
        t = t.at[rs_w, cs - 1, :, size - 3:].set(fwin[:, 4:, 1:4], mode="drop")
        rs_w = jnp.where(do_top, rs - 1, R)
        t = t.at[rs_w, cs, size - 3:, :].set(fwin[:, 1:4, 4:], mode="drop")
        return t

    def lf_step(tiles, xs):
        y_t, u_t, v_t = tiles
        rs, cs, valid = xs
        y_t = lf_plane(y_t, 16, rs, cs, valid)
        u_t = lf_plane(u_t, 8, rs, cs, valid)
        v_t = lf_plane(v_t, 8, rs, cs, valid)
        return (y_t, u_t, v_t), None

    (y_tiles, u_tiles, v_tiles), _ = jax.lax.scan(
        lf_step, (y_tiles, u_tiles, v_tiles),
        (diag_rs, diag_cs, diag_valid))

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
    diag_rs, diag_cs, diag_valid = wavefront_schedule(R, C)

    # stacked reference planes; index 0 is a dummy slot (intra)
    ref_y = jnp.stack([references.last.y, references.last.y,
                       references.golden.y, references.alternative.y])
    ref_u = jnp.stack([references.last.u, references.last.u,
                       references.golden.u, references.alternative.u])
    ref_v = jnp.stack([references.last.v, references.last.v,
                       references.golden.v, references.alternative.v])

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
        jnp.asarray(diag_rs), jnp.asarray(diag_cs), jnp.asarray(diag_valid))

    return Raster(state.width, state.height, y, u, v)
