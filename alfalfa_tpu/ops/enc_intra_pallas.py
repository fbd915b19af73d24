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

from alfalfa_tpu.bitstream import tables as TB
from alfalfa_tpu.ops.intra_pallas import (_sb_predict_all, _lane, _bcast,
                                          _shift_down, _tile_col, B_PRED)
from alfalfa_tpu.ops import enc_transforms_pallas as ET
from alfalfa_tpu.ops import trellis_pallas as TRP

DPAD = 3
NUM_B_MODES = 10
# whole-mode -> implied b-mode (parse.py _IMPLIED_BMODE; DC,V,H,TM)
_IMPLIED = (0, 2, 3, 1)

_ZZ = tuple(int(v) for v in TB.ZIGZAG)
_INVZZ = tuple(_ZZ.index(j) for j in range(16))


def _zz_pm(x):
    """Natural 16-lane block -> position-major (nb=1) by static concat."""
    return jnp.concatenate([x[:, z:z + 1] for z in _ZZ], axis=1)


def _zz_nat(x):
    """Position-major (nb=1) -> natural 16-lane block."""
    return jnp.concatenate([x[:, i:i + 1] for i in _INVZZ], axis=1)


def _set_lane(acc, b, val, n):
    """acc with lane b replaced by (Rp, 1) val (n total lanes)."""
    li = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    return jnp.where(li == b, val, acc)


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


def _enc_kernel(nd, trellis, prm_ref, sc_ref, mbc_ref, uvc_ref, bhi_ref,
                blo_ref, t2b_ref, b2t_ref, t2b8_ref, b2t8_ref, *rest):
    if trellis:
        (tct_ref, pmy_ref, pmyi_ref, pmuv_ref, pmuvi_ref,
         oyt_ref, oyb_ref, out_ref, ovt_ref,
         co_ref, md_ref, ry_ref, ru_ref, rv_ref,
         ring_y, ring_u, ring_v, ring_bm, ring_tnz) = rest
    else:
        (oyt_ref, oyb_ref, out_ref, ovt_ref,
         co_ref, md_ref, ry_ref, ru_ref, rv_ref,
         ring_y, ring_u, ring_v, ring_bm) = rest
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

    if trellis:
        # token-cost rows (host order: [Y_noY2, Y_afterY2, UV, Y2]) and
        # the neighbors' post-trellis nonzero context ring.  Ring lanes:
        # 0-3 y right col, 4-7 y bottom row, 8-9 u right, 10-11 u bottom,
        # 12-13 v right, 14-15 v bottom, 16/17 y2 column nz/valid,
        # 18/19 y2 row nz/valid.
        # tct_ref is SMEM (64, 36): rows [Y_noY2 0:16, Y_afterY2 16:32,
        # UV 32:48, Y2 48:64]; trellis lookups are dynamic scalar reads
        tnz_abv = _shift_down(ring_tnz[s2].astype(jnp.int32))
        tnz_left = ring_tnz[s1].astype(jnp.int32)
        hrow_i = hrow.astype(jnp.int32)
        hcol_i = hcol.astype(jnp.int32)
        # y contexts: above MB bottom row / left MB right column, gated
        ynz_abv4 = tnz_abv[:, 4:8] * hrow_i
        ynz_left4 = tnz_left[:, 0:4] * hcol_i
        unz_abv = tnz_abv[:, 10:12] * hrow_i
        unz_left = tnz_left[:, 8:10] * hcol_i
        vnz_abv = tnz_abv[:, 14:16] * hrow_i
        vnz_left = tnz_left[:, 12:14] * hcol_i
        y2_col_in = tnz_abv[:, 16:17] * hrow_i
        y2_col_val = tnz_abv[:, 17:18] * hrow_i
        y2_row_in = tnz_left[:, 18:19] * hcol_i
        y2_row_val = tnz_left[:, 19:20] * hcol_i

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
        if trellis:
            (prev_bottom, prev_bm, out_recon, out_co, out_bm, rate_a,
             dist_a, lc_roll, al_roll, lbm_roll, oyb_roll,
             prev_nz, lnz_roll, out_nzc) = carry
        else:
            (prev_bottom, prev_bm, out_recon, out_co, out_bm, rate_a,
             dist_a, lc_roll, al_roll, lbm_roll, oyb_roll) = carry
        lcb = lc_roll[:, 0:4]
        al_first = al_roll[:, 0:1]
        lbm_first = lbm_roll[:, 0:1]
        osb_band = oyb_roll[:, 0:64]
        above20 = jnp.concatenate([prev_bottom, ar4], axis=1)
        rows = [jnp.zeros((Rp, 16), jnp.int32)] * 4
        bm_list, co_list, nz_list = [], [], []
        block_prev = None
        left_m = lbm_first
        last_nz = None
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

            co_nat = ET.fdct(osb - pred_sel)
            if trellis:
                # entry context: post-trellis nonzero of up (previous
                # band, carried) / left (previous subblock or left MB)
                up_nz = prev_nz[:, sc:sc + 1]
                left_nz = lnz_roll[:, 0:1] if sc == 0 else last_nz
                ctxb = up_nz + left_nz
                qpm, nzb = TRP.trellis_quantize_pm(
                    _zz_pm(co_nat), tct_ref, 0, 0, ctxb, q_ydc, q_yac,
                    rmult, dmult, 1)
                qc = _zz_nat(qpm)
                last_nz = nzb.astype(jnp.int32)
                nz_list.append(last_nz)
            else:
                qc = ET.quantize(co_nat, q_ydc, q_yac)
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
        base = (rows[3], band_bm, out_recon, out_co, out_bm,
                rate_a, dist_a, roll(lc_roll, 4), roll(al_roll, 1),
                roll(lbm_roll, 1), roll(oyb_roll, 64))
        if trellis:
            band_nz = jnp.concatenate(nz_list, axis=1)       # (Rp, 4)
            out_nzc = jnp.concatenate(
                [out_nzc[:, 1:], band_nz[:, 3:4]], axis=1)
            return base + (band_nz, roll(lnz_roll, 1), out_nzc)
        return base

    z256 = jnp.zeros((Rp, 256), jnp.int32)
    init = (a16, abm[:, 12:16], z256, z256,
            jnp.zeros((Rp, 16), jnp.int32),
            jnp.zeros((Rp, 1), jnp.int32) + mbc_ref[0, B_PRED],
            jnp.zeros((Rp, 1), jnp.int32),
            lcol, al_roll0, lbm_roll0, oy_b)
    if trellis:
        init = init + (ynz_abv4, ynz_left4, jnp.zeros((Rp, 4), jnp.int32))
        (_, _, bpred_recon, bpred_co, bpred_bm, bpred_rate,
         bpred_dist, _, _, _, _, bp_bnz, _, bp_colnz) = jax.lax.fori_loop(
            0, 4, bpred_band, init)
    else:
        (_, _, bpred_recon, bpred_co, bpred_bm, bpred_rate, bpred_dist,
         _, _, _, _) = jax.lax.fori_loop(0, 4, bpred_band, init)
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
    if trellis:
        def sel3(ctx, v0, v1, v2):
            return jnp.where(ctx == 0, v0, jnp.where(ctx == 1, v1, v2))

        # ---- whole-mode luma: one DP over all 16 subblocks, both
        # start-level walk-forwards and all three entry-context costs
        # precomputed, the per-subblock choice resolved afterwards in
        # raster order (the context only selects between the two
        # precomputed outputs) ----
        wpm = TRP.permute_wide(jnp.where(is_dc, 0, wco_full), pmy_ref[...])
        finalW, storesW = TRP.trellis_nodes(
            wpm, tct_ref, 16, 1, q_ydc, q_yac, rmult, dmult, 16)
        zc = jnp.zeros((Rp, 16), jnp.int32)
        outW0, nzW0 = TRP.trellis_walk(storesW, zc, 1, 16)
        outW1, nzW1 = TRP.trellis_walk(storesW, zc + 1, 1, 16)
        cw = [TRP.final_costs(finalW, tct_ref, 17, zc + c, rmult, dmult)
              for c in range(3)]
        nzW0i, nzW1i = nzW0.astype(jnp.int32), nzW1.astype(jnp.int32)
        chW, nzW = zc, zc
        for b in range(16):
            sr_, sc_ = b // 4, b % 4
            up_nz = nzW[:, b - 4:b - 3] if sr_ else ynz_abv4[:, sc_:sc_ + 1]
            lf_nz = nzW[:, b - 1:b] if sc_ else ynz_left4[:, sr_:sr_ + 1]
            ctx = up_nz + lf_nz
            c0 = sel3(ctx, cw[0][0][:, b:b + 1], cw[1][0][:, b:b + 1],
                      cw[2][0][:, b:b + 1])
            c1 = sel3(ctx, cw[0][1][:, b:b + 1], cw[1][1][:, b:b + 1],
                      cw[2][1][:, b:b + 1])
            chb = (c1 < c0).astype(jnp.int32)
            nzb = jnp.where(chb == 1, nzW1i[:, b:b + 1], nzW0i[:, b:b + 1])
            chW = _set_lane(chW, b, chb, 16)
            nzW = _set_lane(nzW, b, nzb, 16)
        wout_pm = jnp.where(jnp.tile(chW, (1, 16)) == 1, outW1, outW0)
        wco_ac = TRP.permute_wide(wout_pm, pmyi_ref[...])

        # ---- Y2: context from the column/row chains threaded through
        # the rings (B_PRED MBs propagate, whole-mode MBs set) ----
        y2ctx = y2_col_in * y2_col_val + y2_row_in * y2_row_val
        y2pm, y2nzb = TRP.trellis_quantize_pm(
            _zz_pm(ET.fwht(walsh)), tct_ref, 48, 0, y2ctx, q_y2dc,
            q_y2ac, rmult, dmult, 1)
        y2q = _zz_nat(y2pm)
    else:
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

    if trellis:
        # ---- chroma: one DP over the 8 subblocks of both planes; the
        # two planes' 2x2 context chains are independent ----
        pbu = _permute(pu_sel, t2b8_ref[...])
        obu = _permute(ou_t, t2b8_ref[...])
        pbv = _permute(pv_sel, t2b8_ref[...])
        obv = _permute(ov_t, t2b8_ref[...])
        uv_nat = jnp.concatenate(
            [ET.fdct(obu - pbu), ET.fdct(obv - pbv)], axis=1)
        uvpm = TRP.permute_wide(uv_nat, pmuv_ref[...])
        finalU, storesU = TRP.trellis_nodes(
            uvpm, tct_ref, 32, 0, q_uvdc, q_uvac, rmult, dmult, 8)
        z8 = jnp.zeros((Rp, 8), jnp.int32)
        outU0, nzU0 = TRP.trellis_walk(storesU, z8, 0, 8)
        outU1, nzU1 = TRP.trellis_walk(storesU, z8 + 1, 0, 8)
        cu = [TRP.final_costs(finalU, tct_ref, 32, z8 + c, rmult, dmult)
              for c in range(3)]
        nzU0i, nzU1i = nzU0.astype(jnp.int32), nzU1.astype(jnp.int32)
        chU, nzU = z8, z8
        for pos in range(4):
            sr_, sc_ = pos // 2, pos % 2
            for p in range(2):
                b = p * 4 + pos
                abv = (unz_abv, vnz_abv)[p]
                lft = (unz_left, vnz_left)[p]
                up_nz = nzU[:, b - 2:b - 1] if sr_ else abv[:, sc_:sc_ + 1]
                lf_nz = nzU[:, b - 1:b] if sc_ else lft[:, sr_:sr_ + 1]
                ctx = up_nz + lf_nz
                c0 = sel3(ctx, cu[0][0][:, b:b + 1], cu[1][0][:, b:b + 1],
                          cu[2][0][:, b:b + 1])
                c1 = sel3(ctx, cu[0][1][:, b:b + 1], cu[1][1][:, b:b + 1],
                          cu[2][1][:, b:b + 1])
                chb = (c1 < c0).astype(jnp.int32)
                nzb = jnp.where(chb == 1, nzU1i[:, b:b + 1],
                                nzU0i[:, b:b + 1])
                chU = _set_lane(chU, b, chb, 8)
                nzU = _set_lane(nzU, b, nzb, 8)
        uvout_pm = jnp.where(jnp.tile(chU, (1, 16)) == 1, outU1, outU0)
        uv_q = TRP.permute_wide(uvout_pm, pmuvi_ref[...])
        co_u, co_v = uv_q[:, 0:64], uv_q[:, 64:128]

        def chroma_recon(qc, pb):
            res = ET.idct(ET.dequantize(qc, q_uvdc, q_uvac))
            return _permute(jnp.clip(pb + res, 0, 255), b2t8_ref[...])

        recon_u = chroma_recon(co_u, pbu)
        recon_v = chroma_recon(co_v, pbv)
    else:
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
    if trellis:
        # post-trellis nonzero context ring for the down/right neighbors
        wm_col = jnp.concatenate(
            [nzW[:, 3:4], nzW[:, 7:8], nzW[:, 11:12], nzW[:, 15:16]],
            axis=1)
        ycol = jnp.where(use_b, bp_colnz, wm_col)
        yrow = jnp.where(use_b, bp_bnz, nzW[:, 12:16])
        y2nz_i = y2nzb.astype(jnp.int32)
        one = jnp.ones((Rp, 1), jnp.int32)
        col_nz = jnp.where(use_b, y2_col_in, y2nz_i)
        col_val = jnp.where(use_b, y2_col_val, one)
        row_nz = jnp.where(use_b, y2_row_in, y2nz_i)
        row_val = jnp.where(use_b, y2_row_val, one)
        ur = jnp.concatenate([nzU[:, 1:2], nzU[:, 3:4]], axis=1)
        vr = jnp.concatenate([nzU[:, 5:6], nzU[:, 7:8]], axis=1)
        tnz = jnp.concatenate(
            [ycol, yrow, ur, nzU[:, 2:4], vr, nzU[:, 6:8],
             col_nz, col_val, row_nz, row_val,
             jnp.zeros((Rp, 12), jnp.int32)], axis=1)
        ring_tnz[d & 3] = tnz.astype(jnp.int16)


def encode_kf_frame(oy_t, oy_b, ou_t, ov_t, prm, scalars, mb_costs,
                    bcost_hi, bcost_lo, interpret=False, token_costs=None):
    """Run the keyframe intra-encode wavefront.

    oy_t/oy_b: (nd, Rp, 256) int16 skewed original luma (tile / block
    layouts); ou_t/ov_t: (nd, Rp, 64); prm: (nd, Rp, 8) int16 masks
    [valid, has_row, has_col, last_col]; scalars: (1, 8) int32
    [y_dc, y_ac, y2_dc, y2_ac, uv_dc, uv_ac, rate_mult, dist_mult];
    mb_costs: (1, 8) int32 keyframe mbmode costs; bcost_hi/lo: (100, 10)
    bf16 split keyframe b-mode cost table.
    token_costs: optional (64, 36) int32 position-major trellis token
    costs (rows [Y_noY2, Y_afterY2, UV, Y2] x 16) — when given, every
    quantization runs the two-pass trellis DP (--two-pass second pass).
    Returns (coeffs (nd,Rp,400) i16, md (nd,Rp,32) i16,
             recon_y (nd,Rp,256) i16, recon_u, recon_v).
    """
    nd, Rp, _ = oy_t.shape
    trellis = token_costs is not None
    t2b, b2t = _t2b_perm(16)
    t2b8, b2t8 = _t2b_perm(8)
    stream = lambda P: pl.BlockSpec((1, Rp, P), lambda d: (d, 0, 0),
                                    memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda d: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    tr_specs, tr_args = [], []
    scratch = [pltpu.VMEM((4, Rp, 256), jnp.int16),
               pltpu.VMEM((4, Rp, 64), jnp.int16),
               pltpu.VMEM((4, Rp, 64), jnp.int16),
               pltpu.VMEM((4, Rp, 16), jnp.int16)]
    if trellis:
        pmy, pmyi = TRP.pm_perm(16)
        pmuv, pmuvi = TRP.pm_perm(8)
        tr_specs = [pl.BlockSpec((64, 36), lambda d: (0, 0),
                                 memory_space=pltpu.SMEM),
                    const((256, 256)), const((256, 256)),
                    const((128, 128)), const((128, 128))]
        tr_args = [jnp.asarray(token_costs, jnp.int32), pmy, pmyi,
                   pmuv, pmuvi]
        scratch = scratch + [pltpu.VMEM((4, Rp, 32), jnp.int16)]
    return pl.pallas_call(
        functools.partial(_enc_kernel, nd, trellis),
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
                  const((64, 64)), const((64, 64))] + tr_specs +
                 [stream(256), stream(256), stream(64), stream(64)],
        out_specs=(stream(400), stream(32), stream(256), stream(64),
                   stream(64)),
        out_shape=(jax.ShapeDtypeStruct((nd, Rp, 400), jnp.int16),
                   jax.ShapeDtypeStruct((nd, Rp, 32), jnp.int16),
                   jax.ShapeDtypeStruct((nd, Rp, 256), jnp.int16),
                   jax.ShapeDtypeStruct((nd, Rp, 64), jnp.int16),
                   jax.ShapeDtypeStruct((nd, Rp, 64), jnp.int16)),
        scratch_shapes=scratch,
        interpret=interpret,
    )(prm.astype(jnp.int16), scalars, mb_costs,
      jnp.zeros((1, 8), jnp.int32),  # placeholder uv costs (unused)
      bcost_hi, bcost_lo, t2b, b2t, t2b8, b2t8,
      *tr_args, oy_t, oy_b, ou_t, ov_t)
