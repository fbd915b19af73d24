"""Pallas TPU kernel: keyframe intra ENCODING over the skewed wavefront.

SURVEY section 7.2 stage 4 device side: per-macroblock intra mode search
(whole-MB modes by variance rd-cost, B_PRED by per-subblock SSE rd-cost
with reconstruction in the loop), subtract->fDCT->quantize, Y2 WHT path,
and the decoder-identical reconstruction — all on-chip, walking diagonals
d = 2r + c exactly like the decode kernels (ops/intra_pallas.py), with the
reconstructed planes and chosen b-modes carried in small VMEM rings.

Bit-exact to the host path (encoder/encode_intra_np.py; reference
encoder/encode_intra.cc:36-456) including every tie-break: whole modes and
chroma modes scan ascending with strict '<', B_PRED beats the best whole
mode only when strictly cheaper.

Lane layouts: a "tile" vector is row-major pixels (lane = y*S + x); a
"block" vector is 4x4-subblock-major (lane = 16*b + 4*y + x).  The two are
exchanged by exact MXU permutation matmuls (pixel values <= 255 are exact
in bf16).  Keyframe B_PRED mode costs are contextual on (above, left)
modes, resolved with a one-hot MXU lookup split into hi/lo bytes.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from alfalfa_tpu.ops.intra_pallas import (_sb_predict_all, _lane, _bcast,
                                          _shift_down, _tile_col, B_PRED)
from alfalfa_tpu.ops import enc_transforms_pallas as ET

DPAD = 3
NUM_B_MODES = 10
# whole-mode -> implied b-mode (parse.py _IMPLIED_BMODE; DC,V,H,TM)
_IMPLIED = (0, 2, 3, 1)


def _t2b_perm(S):
    """Tile (row-major S*S) -> block (subblock-major) permutation, bf16."""
    n = S * S
    perm = np.zeros(n, np.int32)
    nb = S // 4
    for b in range(nb * nb):
        br, bc = b // nb, b % nb
        for y in range(4):
            for x in range(4):
                perm[16 * b + 4 * y + x] = (4 * br + y) * S + 4 * bc + x
    P = np.zeros((n, n), np.float32)
    P[perm, np.arange(n)] = 1
    return jnp.asarray(P, jnp.bfloat16), jnp.asarray(P.T, jnp.bfloat16)


def _permute(x, P):
    """Exact lane permutation via MXU (values must fit bf16 exactly)."""
    return jnp.dot(x.astype(jnp.bfloat16), P,
                   preferred_element_type=jnp.float32).astype(x.dtype)


def _seg_sum16(x, nb):
    """Per-16-lane-block sums: (Rp, 16*nb) -> list of nb (Rp, 1)."""
    return [jnp.sum(x[:, 16 * b:16 * b + 16], axis=1, keepdims=True)
            for b in range(nb)]


def _rdcost(rate, dist, rmult, dmult):
    return ((128 + rate * rmult) >> 8) + dist * dmult


def _whole_modes(a, lcol, e0, hrow, hcol, S):
    """The four whole-MB predictions as separate (Rp, S*S) tiles."""
    log2 = {8: 3, 16: 4}[S]
    sum_a = jnp.sum(a, axis=1, keepdims=True)
    sum_l = jnp.sum(lcol, axis=1, keepdims=True)
    dc = jnp.where(
        hrow & hcol, (sum_a + sum_l + (1 << log2)) >> (log2 + 1),
        jnp.where(hrow, (sum_a + (1 << (log2 - 1))) >> log2,
                  jnp.where(hcol, (sum_l + (1 << (log2 - 1))) >> log2, 128)))
    P = S * S
    dcp = _bcast(dc, P)
    vp = jnp.tile(a, (1, S))
    hp = jnp.concatenate([_bcast(_lane(lcol, y), S) for y in range(S)],
                         axis=1)
    tm = jnp.clip(hp + vp - _bcast(e0, P), 0, 255)
    return [dcp, vp, hp, tm]


def _variance(orig, pred):
    """Reference variance: sse - s*s//256 over a 256-lane tile, kept in
    int32 by splitting s (|s| <= 65280 so s*s would overflow)."""
    d = orig - pred
    sse = jnp.sum(d * d, axis=1, keepdims=True)
    s = jnp.sum(d, axis=1, keepdims=True)
    sa = jnp.abs(s)          # s*s >= 0, so the split can use |s|
    hi, lo = sa >> 8, sa & 255
    # exact s*s//256: (hi*256+lo)^2//256 = hi^2*256 + 2*hi*lo + lo^2//256
    sq = hi * hi * 256 + 2 * hi * lo + (lo * lo) // 256
    return sse - sq


def _onehot_cost(above, left, hi_ref, lo_ref):
    """bmode_costs[above, left, :] per lane via one-hot MXU lookup.
    above/left: (Rp, 1) int32; returns (Rp, 10) int32."""
    li = jax.lax.broadcasted_iota(jnp.int32, (above.shape[0], 100), 1)
    oh = ((li // 10 == above) & (li % 10 == left)).astype(jnp.bfloat16)
    hi = jnp.dot(oh, hi_ref[...], preferred_element_type=jnp.float32)
    lo = jnp.dot(oh, lo_ref[...], preferred_element_type=jnp.float32)
    return hi.astype(jnp.int32) * 256 + lo.astype(jnp.int32)


def _enc_kernel(nd, prm_ref, sc_ref, mbc_ref, uvc_ref, bhi_ref, blo_ref,
                t2b_ref, b2t_ref, t2b8_ref, b2t8_ref,
                oyt_ref, oyb_ref, out_ref, ovt_ref,
                co_ref, md_ref, ry_ref, ru_ref, rv_ref,
                ring_y, ring_u, ring_v, ring_bm):
    d = pl.program_id(0)
    Rp = oyt_ref.shape[1]

    pm = prm_ref[0].astype(jnp.int32)
    valid = pm[:, 0:1] != 0
    hrow = pm[:, 1:2] != 0
    hcol = pm[:, 2:3] != 0
    lcolm = pm[:, 3:4] != 0

    q_ydc, q_yac = sc_ref[0, 0], sc_ref[0, 1]
    q_y2dc, q_y2ac = sc_ref[0, 2], sc_ref[0, 3]
    q_uvdc, q_uvac = sc_ref[0, 4], sc_ref[0, 5]
    rmult, dmult = sc_ref[0, 6], sc_ref[0, 7]

    oy_t = oyt_ref[0].astype(jnp.int32)      # orig luma, tile layout
    oy_b = oyb_ref[0].astype(jnp.int32)      # orig luma, block layout
    ou_t = out_ref[0].astype(jnp.int32)
    ov_t = ovt_ref[0].astype(jnp.int32)

    s1, s2, s3 = (d + 3) & 3, (d + 2) & 3, (d + 1) & 3   # d-1, d-2, d-3
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
    abv_bm = _shift_down(ring_bm[s2].astype(jnp.int32))   # above MB bmodes
    left_bm = ring_bm[s1].astype(jnp.int32)               # left MB bmodes

    a16 = jnp.where(hrow, abv_row, 127)
    ar4 = jnp.where(hrow & ~lcolm, ar_row,
                    jnp.where(hrow & lcolm, _bcast(a16[:, 15:16], 4), 127))
    e0 = jnp.where(hrow & hcol, al_c, jnp.where(hrow, 129, 127))
    lcol = jnp.where(hcol, lcol_raw, 129)
    # keyframe b-mode context defaults to B_DC_PRED (0) off-frame
    abm = jnp.where(hrow, abv_bm, 0)
    lbm = jnp.where(hcol, left_bm, 0)

    # ---- B_PRED candidate: 16 subblocks, reconstruction in the loop,
    # as a lax.scan over the four subblock BANDS (same position-uniform
    # trick as the decode wavefront's _bpred_tile: with prev_bottom
    # initialized to the above row, every band sees above20 =
    # concat(prev_bottom, ar4); the band-0 mode context arrives as the
    # prev_bm carry initialized to the above MB's bottom-row modes).
    # This traces the search chain once per band instead of 16 times —
    # the unroll dominated this kernel's trace/Mosaic-lowering time. ----
    # (Mosaic in-kernel loops: fori_loop-shaped only, no extensive
    # inputs — per-band data rides the carry and rotates into a static
    # lane window; see intra_pallas._bpred_tile)
    bhi_v, blo_v = bhi_ref[...], blo_ref[...]
    al_roll0 = jnp.concatenate(
        [e0] + [_lane(lcol, 4 * b - 1) for b in range(1, 4)], axis=1)
    lbm_roll0 = jnp.concatenate(
        [_lane(lbm, 4 * b + 3) for b in range(4)], axis=1)

    def bpred_band(_i, carry):
        (prev_bottom, prev_bm, out_recon, out_co, out_bm, rate_a, dist_a,
         lc_roll, al_roll, lbm_roll, oyb_roll) = carry
        lcb = lc_roll[:, 0:4]
        al_first = al_roll[:, 0:1]
        lbm_first = lbm_roll[:, 0:1]
        osb_band = oyb_roll[:, 0:64]
        above20 = jnp.concatenate([prev_bottom, ar4], axis=1)
        rows = [jnp.zeros((Rp, 16), jnp.int32)] * 4
        bm_list, co_list = [], []
        block_prev = None
        left_m = lbm_first
        for sc in range(4):
            above4 = above20[:, sc * 4:sc * 4 + 4]
            ar = above20[:, (sc + 1) * 4:(sc + 1) * 4 + 4]
            al = al_first if sc == 0 else _lane(above20, sc * 4 - 1)
            left4 = (lcb if sc == 0 else
                     jnp.concatenate([_lane(block_prev, i * 4 + 3)
                                      for i in range(4)], axis=1))
            preds = _sb_predict_all(jnp.concatenate([above4, ar], axis=1),
                                    left4, al)
            above_m = _lane(prev_bm, sc)
            costs10 = _onehot_cost(above_m, left_m, bhi_v, blo_v)

            osb = osb_band[:, sc * 16:sc * 16 + 16]
            best_cost = None
            best_m = None
            best_rate = None
            best_sse = None
            for m in range(NUM_B_MODES):
                sse = jnp.sum((osb - preds[m]) ** 2, axis=1, keepdims=True)
                rate = costs10[:, m:m + 1]
                cost = _rdcost(rate, sse, rmult, dmult)
                if best_cost is None:
                    best_cost, best_m = cost, jnp.zeros((Rp, 1), jnp.int32)
                    best_rate, best_sse = rate, sse
                else:
                    better = cost < best_cost
                    best_cost = jnp.where(better, cost, best_cost)
                    best_m = jnp.where(better, m, best_m)
                    best_rate = jnp.where(better, rate, best_rate)
                    best_sse = jnp.where(better, sse, best_sse)
            bm_list.append(best_m)
            rate_a = rate_a + best_rate
            dist_a = dist_a + best_sse
            left_m = best_m

            pred_sel = preds[0]
            for m in range(1, NUM_B_MODES):
                pred_sel = jnp.where(best_m == m, preds[m], pred_sel)

            qc = ET.quantize(ET.fdct(osb - pred_sel), q_ydc, q_yac)
            co_list.append(qc)
            res = ET.idct(ET.dequantize(qc, q_ydc, q_yac))
            blk = jnp.clip(pred_sel + res, 0, 255)
            for i in range(4):
                r_ = rows[i]
                parts = ([r_[:, :sc * 4]] if sc > 0 else []) + \
                    [blk[:, i * 4:i * 4 + 4]] + \
                    ([r_[:, sc * 4 + 4:]] if sc < 3 else [])
                rows[i] = jnp.concatenate(parts, axis=1)
            block_prev = blk

        band_bm = jnp.concatenate(bm_list, axis=1)           # (Rp, 4)
        out_recon = jnp.concatenate(
            [out_recon[:, 64:], jnp.concatenate(rows, axis=1)], axis=1)
        out_co = jnp.concatenate(
            [out_co[:, 64:], jnp.concatenate(co_list, axis=1)], axis=1)
        out_bm = jnp.concatenate([out_bm[:, 4:], band_bm], axis=1)
        roll = lambda x, n: jnp.concatenate([x[:, n:], x[:, :n]], axis=1)
        return (rows[3], band_bm, out_recon, out_co, out_bm,
                rate_a, dist_a, roll(lc_roll, 4), roll(al_roll, 1),
                roll(lbm_roll, 1), roll(oyb_roll, 64))

    z256 = jnp.zeros((Rp, 256), jnp.int32)
    (_, _, bpred_recon, bpred_co, bpred_bm, bpred_rate, bpred_dist,
     _, _, _, _) = jax.lax.fori_loop(
        0, 4, bpred_band,
        (a16, abm[:, 12:16], z256, z256,
         jnp.zeros((Rp, 16), jnp.int32),
         jnp.zeros((Rp, 1), jnp.int32) + mbc_ref[0, B_PRED],
         jnp.zeros((Rp, 1), jnp.int32),
         lcol, al_roll0, lbm_roll0, oy_b))
    bpred_cost = _rdcost(bpred_rate, bpred_dist, rmult, dmult)

    # ---- whole-MB modes ----
    wpreds = _whole_modes(a16, lcol, e0, hrow, hcol, 16)
    wcost = None
    wmode = None
    wpred = None
    for m in range(4):
        var = _variance(oy_t, wpreds[m])
        cost = _rdcost(mbc_ref[0, m].astype(jnp.int32), var, rmult, dmult)
        if wcost is None:
            wcost, wmode, wpred = cost, jnp.zeros((Rp, 1), jnp.int32), \
                wpreds[0]
        else:
            better = cost < wcost
            wcost = jnp.where(better, cost, wcost)
            wmode = jnp.where(better, m, wmode)
            wpred = jnp.where(better, wpreds[m], wpred)

    wpred_b = _permute(wpred, t2b_ref[...])
    oy_diff = oy_b - wpred_b
    wco_full = ET.fdct(oy_diff)
    li = jax.lax.broadcasted_iota(jnp.int32, (Rp, 256), 1)
    is_dc = (li % 16) == 0
    walsh = jnp.concatenate([_lane(wco_full, 16 * b) for b in range(16)],
                            axis=1)
    wco_ac = ET.quantize(jnp.where(is_dc, 0, wco_full), q_ydc, q_yac)
    y2q = ET.quantize(ET.fwht(walsh), q_y2dc, q_y2ac)
    # decoder-identical reconstruction: dequant ACs, Y2 iWHT DC terms
    yd = ET.dequantize(wco_ac, q_ydc, q_yac)
    dc_rec = ET.iwht(ET.dequantize(y2q, q_y2dc, q_y2ac))   # (Rp, 16)
    dc_expand = jnp.zeros((Rp, 256), jnp.int32)
    for b in range(16):
        dc_expand = dc_expand + jnp.where(li == 16 * b,
                                          _bcast(_lane(dc_rec, b), 256), 0)
    yblk = jnp.where(is_dc, dc_expand, yd)
    wrecon_b = jnp.clip(wpred_b + ET.idct(yblk), 0, 255)
    wrecon = _permute(wrecon_b, b2t_ref[...])

    # ---- luma decision (B_PRED wins only when strictly cheaper) ----
    use_b = bpred_cost < wcost
    ymode = jnp.where(use_b, B_PRED, wmode)
    implied = jnp.zeros((Rp, 1), jnp.int32)
    for m in range(4):
        implied = jnp.where(wmode == m, _IMPLIED[m], implied)
    bm_out = jnp.where(use_b, bpred_bm, _bcast(implied, 16))
    co_y = jnp.where(use_b, bpred_co, wco_ac)
    co_y2 = jnp.where(use_b, 0, y2q)
    recon_y = jnp.where(use_b, bpred_recon, wrecon)

    # ---- chroma ----
    a8u = jnp.where(hrow, abv_u, 127)
    e0u = jnp.where(hrow & hcol, al_u, jnp.where(hrow, 129, 127))
    clu = jnp.where(hcol, lcol_u, 129)
    a8v = jnp.where(hrow, abv_v, 127)
    e0v = jnp.where(hrow & hcol, al_v, jnp.where(hrow, 129, 127))
    clv = jnp.where(hcol, lcol_v, 129)
    pu = _whole_modes(a8u, clu, e0u, hrow, hcol, 8)
    pv = _whole_modes(a8v, clv, e0v, hrow, hcol, 8)
    ucost = None
    uvmode = None
    pu_sel = pv_sel = None
    for m in range(4):
        dist = (jnp.sum((ou_t - pu[m]) ** 2, axis=1, keepdims=True)
                + jnp.sum((ov_t - pv[m]) ** 2, axis=1, keepdims=True))
        if ucost is None:
            ucost, uvmode = dist, jnp.zeros((Rp, 1), jnp.int32)
            pu_sel, pv_sel = pu[0], pv[0]
        else:
            better = dist < ucost
            ucost = jnp.where(better, dist, ucost)
            uvmode = jnp.where(better, m, uvmode)
            pu_sel = jnp.where(better, pu[m], pu_sel)
            pv_sel = jnp.where(better, pv[m], pv_sel)

    def chroma_code(ot, psel):
        pb = _permute(psel, t2b8_ref[...])
        ob = _permute(ot, t2b8_ref[...])
        qc = ET.quantize(ET.fdct(ob - pb), q_uvdc, q_uvac)
        res = ET.idct(ET.dequantize(qc, q_uvdc, q_uvac))
        rec = _permute(jnp.clip(pb + res, 0, 255), b2t8_ref[...])
        return qc, rec

    co_u, recon_u = chroma_code(ou_t, pu_sel)
    co_v, recon_v = chroma_code(ov_t, pv_sel)

    # ---- outputs ----
    coeffs = jnp.concatenate([co_y, co_u, co_v, co_y2[:, 0:16]], axis=1)
    nz = jnp.any(coeffs != 0, axis=1, keepdims=True)
    co_ref[0] = coeffs.astype(jnp.int16)
    md = jnp.concatenate(
        [ymode, uvmode, (~use_b).astype(jnp.int32),
         nz.astype(jnp.int32), bm_out,
         jnp.zeros((Rp, 12), jnp.int32)], axis=1)
    md_ref[0] = md.astype(jnp.int16)
    ry_ref[0] = recon_y.astype(jnp.int16)
    ru_ref[0] = recon_u.astype(jnp.int16)
    rv_ref[0] = recon_v.astype(jnp.int16)
    ring_y[d & 3] = recon_y.astype(jnp.int16)
    ring_u[d & 3] = recon_u.astype(jnp.int16)
    ring_v[d & 3] = recon_v.astype(jnp.int16)
    ring_bm[d & 3] = bm_out.astype(jnp.int16)


def encode_kf_frame(oy_t, oy_b, ou_t, ov_t, prm, scalars, mb_costs,
                    bcost_hi, bcost_lo, interpret=False):
    """Run the keyframe intra-encode wavefront.

    oy_t/oy_b: (nd, Rp, 256) int16 skewed original luma (tile / block
    layouts); ou_t/ov_t: (nd, Rp, 64); prm: (nd, Rp, 8) int16 masks
    [valid, has_row, has_col, last_col]; scalars: (1, 8) int32
    [y_dc, y_ac, y2_dc, y2_ac, uv_dc, uv_ac, rate_mult, dist_mult];
    mb_costs: (1, 8) int32 keyframe mbmode costs; bcost_hi/lo: (100, 10)
    bf16 split keyframe b-mode cost table.
    Returns (coeffs (nd,Rp,400) i16, md (nd,Rp,32) i16,
             recon_y (nd,Rp,256) i16, recon_u, recon_v).
    """
    nd, Rp, _ = oy_t.shape
    t2b, b2t = _t2b_perm(16)
    t2b8, b2t8 = _t2b_perm(8)
    stream = lambda P: pl.BlockSpec((1, Rp, P), lambda d: (d, 0, 0),
                                    memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda d: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_enc_kernel, nd),
        grid=(nd,),
        in_specs=[stream(8),
                  pl.BlockSpec((1, 8), lambda d: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, 8), lambda d: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, 8), lambda d: (0, 0),
                               memory_space=pltpu.SMEM),
                  const((100, 10)), const((100, 10)),
                  const((256, 256)), const((256, 256)),
                  const((64, 64)), const((64, 64)),
                  stream(256), stream(256), stream(64), stream(64)],
        out_specs=(stream(400), stream(32), stream(256), stream(64),
                   stream(64)),
        out_shape=(jax.ShapeDtypeStruct((nd, Rp, 400), jnp.int16),
                   jax.ShapeDtypeStruct((nd, Rp, 32), jnp.int16),
                   jax.ShapeDtypeStruct((nd, Rp, 256), jnp.int16),
                   jax.ShapeDtypeStruct((nd, Rp, 64), jnp.int16),
                   jax.ShapeDtypeStruct((nd, Rp, 64), jnp.int16)),
        scratch_shapes=[pltpu.VMEM((4, Rp, 256), jnp.int16),
                        pltpu.VMEM((4, Rp, 64), jnp.int16),
                        pltpu.VMEM((4, Rp, 64), jnp.int16),
                        pltpu.VMEM((4, Rp, 16), jnp.int16)],
        interpret=interpret,
    )(prm.astype(jnp.int16), scalars, mb_costs,
      jnp.zeros((1, 8), jnp.int32),  # placeholder uv costs (unused)
      bcost_hi, bcost_lo, t2b, b2t, t2b8, b2t8,
      oy_t, oy_b, ou_t, ov_t)
