"""Pallas TPU kernel: INTER-frame encoding (motion search + mode decision
+ residue coding + reconstruction) as a serial raster walk.

Mirrors encoder/encode_inter_np.py (reference encoder/encode_inter.cc)
bit-exactly: per macroblock it runs the scalar MV census over already-
encoded neighbors, screens the four whole-MB intra modes by variance
rd-cost, evaluates ZEROMV / NEARESTMV / NEARMV (+ NEWMV via the exact
iterated diamond search) against the LAST reference, and encodes the
winner — inter residues through the Y2/WHT path, or the full intra
macroblock encode (with the non-contextual interframe B_PRED costs) when
intra wins — reconstructing in the loop so neighbors see decoder-exact
pixels.

Design notes (why serial): unlike the keyframe wavefront kernel
(ops/enc_intra_pallas.py) which vectorizes across a diagonal, motion
search needs per-macroblock dynamic window loads from the reference and
scalar control flow (diamond descent), so one MB at a time with all
tiles as (1, lanes) vectors is the shape that fits the hardware: scalar
unit drives loads/decisions, VPU does the per-tile math, MXU does the
exact layout permutations.  References are vertically byte-packed
(ops/sixtap_pallas.pack_refs32) so a window load is (16, 256) int32.

Costs: rd math is identical to encoder/costs.py (PROB_COST tables,
rdcost with >>8), SAD mv-cost and component mv-cost tables are uploaded
and indexed in SMEM.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from alfalfa_tpu.ops.intra_pallas import _sb_predict_all, _lane, _bcast
from alfalfa_tpu.ops import enc_transforms_pallas as ET
from alfalfa_tpu.ops import trellis_pallas as TRP
from alfalfa_tpu.ops.enc_intra_pallas import _zz_pm, _zz_nat, _set_lane
from alfalfa_tpu.ops.sixtap_pallas import (PACKED_ROWS, LANES, PAD,
                                           SIXTAP_TABLE)

NUM_B_MODES = 10
B_PRED = 4
_IMPLIED = (0, 2, 3, 1)
INF = 1 << 30      # python int: jnp.int32(...) would be captured as a
                   # device constant by the pallas_call closure

# mode ids (bitstream/tables.py)
ZEROMV, NEARESTMV, NEARMV, NEWMV = 7, 5, 6, 8


def _t2b_perm_np(S):
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
    return P


def _permute(x, P):
    return jnp.dot(x.astype(jnp.bfloat16), P,
                   preferred_element_type=jnp.float32).astype(x.dtype)


def _ps2lane_mask(S):
    """Constants converting a phase-split (S, S) tile (row c*(S//4)+t =
    pixel row 4t+c) to a (1, S*S) row-major lane tile:
    returns (B (S, S*S) bf16, M (S, S*S) f32 mask)."""
    n4 = S // 4
    B = np.zeros((S, S * S), np.float32)
    M = np.zeros((S, S * S), np.float32)
    for x in range(S):
        for y in range(S):
            B[x, S * y + x] = 1
    for y in range(S):
        i = (y & 3) * n4 + (y >> 2)
        M[i, S * y:S * y + S] = 1
    return B, M


def _ps_to_lane(ps, B_ref, M_ref):
    """Phase-split (S, S) int32 tile -> (1, S*S) int32 lane tile."""
    t = jnp.dot(ps.astype(jnp.bfloat16), B_ref[...].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    return jnp.sum(t * M_ref[...], axis=0, keepdims=True).astype(jnp.int32)


def _filter_ps(w, S, mx, my, taps_ref):
    """Separable 6-tap on a packed (8, 32) window -> phase-split (S, S)
    int32 tile (row c*(S//4)+t = prediction row 4t+c).  Tap values come
    from one dynamic SMEM row read per direction (taps_ref (8, 6) i32)
    instead of the 8-way select chain — the filters run per candidate MV
    in the serial per-MB loop, so scalar op count is latency."""
    tx = [taps_ref[mx, k] for k in range(6)]
    ty = [taps_ref[my, k] for k in range(6)]
    A = [jax.lax.shift_right_logical(w, 8 * b) & 0xFF for b in range(4)]
    Hh = []
    for b in range(4):
        acc = jnp.zeros((8, S), jnp.int32)
        for k in range(6):
            acc = acc + A[b][:, k:k + S] * tx[k]
        Hh.append(jnp.clip((acc + 64) >> 7, 0, 255))
    Hs = [[h,
           jnp.concatenate([h[1:], h[:1]], axis=0),
           jnp.concatenate([h[2:], h[:2]], axis=0)] for h in Hh]
    n = S // 4
    outs = []
    for c in range(4):
        acc = jnp.zeros((8, S), jnp.int32)
        for k in range(6):
            idx = c + k
            acc = acc + Hs[idx & 3][idx >> 2] * ty[k]
        outs.append(jnp.clip((acc + 64) >> 7, 0, 255)[:n])
    return jnp.concatenate(outs, axis=0)        # (S, S) phase-split


def _predict_ps(ref_ref, r, c, mvx, mvy, S, W, H, taps_ref):
    """Motion-compensated phase-split (S, S) prediction for MB (r, c) of
    one plane from the packed reference, mv in 1/8-pel units.

    Whole-pel MVs (ZEROMV always; most NEAREST/NEAR on typical content)
    skip the 6-tap entirely — the filter is the identity there
    (prediction.cc unfiltered path), so the window bytes unpack straight
    into the phase-split layout."""
    sy = r * S + (mvy >> 3) - 2 + PAD
    sx = c * S + (mvx >> 3) - 2 + PAD
    sy = jnp.clip(sy, 0, H + 2 * PAD - (S + 5))
    sx = jnp.clip(sx, 0, W + 2 * PAD - (S + 5))
    n = S // 4

    def fullpel():
        w = _load_window_packed_2d(ref_ref, sy + 2, sx + 2)
        return jnp.concatenate(
            [(jax.lax.shift_right_logical(w, 8 * ph) & 0xFF)[:n, :S]
             for ph in range(4)], axis=0)

    def subpel():
        win = _load_window_packed_2d(ref_ref, sy, sx)
        return _filter_ps(win, S, mvx & 7, mvy & 7, taps_ref)

    return jax.lax.cond(((mvx & 7) == 0) & ((mvy & 7) == 0),
                        fullpel, subpel)


def _load_window_packed_2d(ref_ref, sy, sx):
    """sixtap_pallas._load_window_packed for a single (Hp4, Wp) plane."""
    s0 = sy >> 2
    s_al = pl.multiple_of((s0 >> 3) << 3, 8)
    sx_al = pl.multiple_of((sx >> 7) << 7, 128)
    big = ref_ref[pl.ds(s_al, PACKED_ROWS), pl.ds(sx_al, LANES)]
    big = pltpu.roll(big, -(sx - sx_al), 1)
    big = pltpu.roll(big, -(s0 - s_al), 0)
    w = big[:8, :32]
    rr = sy & 3
    wn = jnp.concatenate([w[1:], w[:1]], axis=0)
    sh = 8 * rr
    lo = jax.lax.shift_right_logical(w, sh)
    hi = jax.lax.shift_left(wn, (32 - sh) & 31)
    return jnp.where(rr == 0, w, lo | hi)


def _ssum(x):
    """Scalar sum of a small vector tile."""
    return jnp.sum(x.astype(jnp.int32))


# Mosaic cannot lower a vector load/store whose sublane (dim -2) start is
# not provably 8-aligned ("cannot statically prove that index in dimension
# 0 is a multiple of 8" — the r3 on-chip compile failure).  Every dynamic
# single-row access in this kernel therefore goes through an aligned
# 8-row block plus an iota select (load) or blend (read-modify-write
# store); tools/probe_dynrow.py gates both idioms on real hardware.
# Callers guarantee the backing dim is padded to a multiple of 8.

def _vrow(ref, idx):
    """(1, lanes) int32 row of a 2-D VMEM ref at a DYNAMIC sublane index."""
    base = pl.multiple_of((idx >> 3) << 3, 8)
    blk = ref[pl.ds(base, 8), :].astype(jnp.int32)
    sel = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 0) == idx - base
    return jnp.sum(jnp.where(sel, blk, 0), axis=0, keepdims=True)


def _vrow_s(ref, c):
    """Row c of a (1, Cp, lanes) streamed block as (1, lanes) int32."""
    base = pl.multiple_of((c >> 3) << 3, 8)
    blk = ref[0, pl.ds(base, 8), :].astype(jnp.int32)
    sel = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 0) == c - base
    return jnp.sum(jnp.where(sel, blk, 0), axis=0, keepdims=True)


def _vrow_ps(ref, c):
    """Row c of a (1, Cp, 16, 16) streamed block as (16, 16) int32."""
    base = pl.multiple_of((c >> 3) << 3, 8)
    blk = ref[0, pl.ds(base, 8)].astype(jnp.int32)
    sel = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 0) == c - base
    return jnp.sum(jnp.where(sel, blk, 0), axis=0)


def _vrow_store(ref, idx, row):
    """Store (1, lanes) row to a 2-D ref at a DYNAMIC sublane index."""
    base = pl.multiple_of((idx >> 3) << 3, 8)
    blk = ref[pl.ds(base, 8), :]
    sel = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 0) == idx - base
    ref[pl.ds(base, 8), :] = jnp.where(sel, row.astype(ref.dtype), blk)


def _vrow_store_s(ref, c, row):
    """Store (1, lanes) row to a (1, Cp, lanes) streamed block at row c."""
    base = pl.multiple_of((c >> 3) << 3, 8)
    blk = ref[0, pl.ds(base, 8), :]
    sel = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 0) == c - base
    ref[0, pl.ds(base, 8), :] = jnp.where(sel, row.astype(ref.dtype), blk)


def _var_scalar(diff):
    """Reference variance (sse - s*s//n) as a scalar; diff (S, S) int32.
    s*s would overflow int32, so use the exact hi/lo split."""
    n = diff.shape[0] * diff.shape[1]
    sse = _ssum(diff * diff)
    s = _ssum(diff)
    sa = jnp.abs(s)
    hi, lo = sa >> 8, sa & 255
    if n == 256:
        sq = hi * hi * 256 + 2 * hi * lo + (lo * lo) // 256
    else:
        raise AssertionError("variance only used on 16x16")
    return sse - sq


def _rdc(rate, dist, rmult, dmult):
    return ((128 + rate * rmult) >> 8) + dist * dmult


def _clamp_mv(mvx, mvy, r, c, R, C):
    """macroblock.cc:176-195."""
    to_left = -(c * 16 << 3) - 128
    to_right = ((C - 1 - c) * 16 << 3) + 128
    to_top = -(r * 16 << 3) - 128
    to_bottom = ((R - 1 - r) * 16 << 3) + 128
    return (jnp.clip(mvx, to_left, to_right),
            jnp.clip(mvy, to_top, to_bottom))


def _chroma_mv(v):
    """(4*v + 4) >> 3 with symmetric rounding (luma_to_chroma for a
    uniform MV)."""
    a = jnp.abs(v) * 4
    return jnp.sign(v) * ((a + 4) >> 3)


def _inter_kernel(R, C, W, H, realtime, trellis,
                  # SMEM:
                  sc_ref, mbc_ref, ibc_ref, mvc2p_ref, pcost_ref,
                  sadc_ref, mvcost_ref, taps_ref,
                  # VMEM consts:
                  refy_ref, refu_ref, refv_ref,
                  t2b_ref, b2t_ref, t2b8_ref, b2t8_ref,
                  psB_ref, psM_ref, psB8_ref, psM8_ref,
                  *rest):
    if trellis:
        (tct_ref, pmy_ref, pmyi_ref, pmuv_ref, pmuvi_ref,
         oyt_ref, oyb_ref, oyps_ref, out_ref, ovt_ref, oub_ref, ovb_ref,
         co_ref, md_ref, ry_ref, ru_ref, rv_ref,
         rec_y, rec_u, rec_v, ring, anz) = rest
    else:
        (oyt_ref, oyb_ref, oyps_ref, out_ref, ovt_ref, oub_ref, ovb_ref,
         co_ref, md_ref, ry_ref, ru_ref, rv_ref,
         rec_y, rec_u, rec_v, ring) = rest
    r = pl.program_id(0)

    if trellis:
        # above-row post-trellis nonzero context plane (TrellisContext
        # semantics: only intra MBs ever set their slots; lanes
        # [0:4 y bottom row, 4:6 u bottom, 6:8 v bottom, 8 y2 nz,
        #  9 y2 valid]).  Zeroed at frame start; persists across rows.
        @pl.when(r == 0)
        def _():
            anz[...] = jnp.zeros(anz.shape, anz.dtype)

    q_ydc, q_yac = sc_ref[0, 0], sc_ref[0, 1]
    q_y2dc, q_y2ac = sc_ref[0, 2], sc_ref[0, 3]
    q_uvdc, q_uvac = sc_ref[0, 4], sc_ref[0, 5]
    rmult, dmult = sc_ref[0, 6], sc_ref[0, 7]
    sad_weight = sc_ref[0, 8]

    def mb_body(c, lnz):
        # lnz (trellis): left MB's post-trellis nonzero state, carried
        # along the row [0:4 y right col, 4:6 u right, 6:8 v right,
        # 8 y2 nz, 9 y2 valid]; ignored (scalar 0) otherwise.
        if trellis:
            arow = _vrow(anz, c)           # (1, 16) above-MB nz state
        # ---------------- census (scalar; parse.py mv_census) ----------
        cr, ar = r & 1, (r + 1) & 1
        s0 = jnp.int32(0)
        s1 = jnp.int32(0)
        s2 = jnp.int32(0)
        s3 = jnp.int32(0)
        m1x = m1y = m2x = m2y = m3x = m3y = jnp.int32(0)
        idx = jnp.int32(0)

        def census_add(state, score, valid, nx, ny, ninter):
            (s0, s1, s2, s3, m1x, m1y, m2x, m2y, m3x, m3y, idx) = state
            use = valid & (ninter != 0)
            zero = (nx == 0) & (ny == 0)
            s0 = s0 + jnp.where(use & zero, score, 0)
            nz = use & ~zero
            curx = jnp.where(idx == 1, m1x, jnp.where(idx == 2, m2x,
                             jnp.where(idx == 3, m3x, 0)))
            cury = jnp.where(idx == 1, m1y, jnp.where(idx == 2, m2y,
                             jnp.where(idx == 3, m3y, 0)))
            neq = (nx != curx) | (ny != cury)
            bump = nz & neq
            idx2 = idx + jnp.where(bump, 1, 0)
            m1x = jnp.where(bump & (idx2 == 1), nx, m1x)
            m1y = jnp.where(bump & (idx2 == 1), ny, m1y)
            m2x = jnp.where(bump & (idx2 == 2), nx, m2x)
            m2y = jnp.where(bump & (idx2 == 2), ny, m2y)
            m3x = jnp.where(bump & (idx2 == 3), nx, m3x)
            m3y = jnp.where(bump & (idx2 == 3), ny, m3y)
            s1 = s1 + jnp.where(nz & (idx2 == 1), score, 0)
            s2 = s2 + jnp.where(nz & (idx2 == 2), score, 0)
            s3 = s3 + jnp.where(nz & (idx2 == 3), score, 0)
            return (s0, s1, s2, s3, m1x, m1y, m2x, m2y, m3x, m3y, idx2)

        state = (s0, s1, s2, s3, m1x, m1y, m2x, m2y, m3x, m3y, idx)
        # above (r-1, c), left (r, c-1), above-left (r-1, c-1)
        cc = jnp.maximum(c - 1, 0)
        state = census_add(state, 2, r > 0,
                           ring[ar, c, 0], ring[ar, c, 1], ring[ar, c, 2])
        state = census_add(state, 2, c > 0,
                           ring[cr, cc, 0], ring[cr, cc, 1],
                           ring[cr, cc, 2])
        state = census_add(state, 1, (r > 0) & (c > 0),
                           ring[ar, cc, 0], ring[ar, cc, 1],
                           ring[ar, cc, 2])
        (s0, s1, s2, s3, m1x, m1y, m2x, m2y, m3x, m3y, idx) = state

        # Scorer::calculate
        lx = jnp.where(idx == 1, m1x, jnp.where(idx == 2, m2x, m3x))
        ly = jnp.where(idx == 1, m1y, jnp.where(idx == 2, m2y, m3y))
        merge = (s3 > 0) & (lx == m1x) & (ly == m1y)
        s1 = s1 + jnp.where(merge, s3, 0)
        swap = s2 > s1
        t1, t2 = s1, s2
        s1 = jnp.where(swap, t2, t1)
        s2 = jnp.where(swap, t1, t2)
        tx, ty = m1x, m1y
        m1x = jnp.where(swap, m2x, m1x)
        m1y = jnp.where(swap, m2y, m1y)
        m2x = jnp.where(swap, tx, m2x)
        m2y = jnp.where(swap, ty, m2y)
        best_vx = jnp.where(s1 >= s0, m1x, 0)
        best_vy = jnp.where(s1 >= s0, m1y, 0)

        # mv_ref probs -> leaf costs (MV_REF_TREE, costs.py)
        p0 = mvc2p_ref[s0, 0]
        p1 = mvc2p_ref[s1, 1]
        p2 = mvc2p_ref[s2, 2]
        p3 = mvc2p_ref[jnp.int32(0), 3]     # splitmv never produced
        c_zero = pcost_ref[0, p0]
        c_nearest = pcost_ref[0, 255 - p0] + pcost_ref[0, p1]
        c_near = (pcost_ref[0, 255 - p0] + pcost_ref[0, 255 - p1]
                  + pcost_ref[0, p2])
        c_new = (pcost_ref[0, 255 - p0] + pcost_ref[0, 255 - p1]
                 + pcost_ref[0, 255 - p2] + pcost_ref[0, p3])

        brx, bry = _clamp_mv(best_vx, best_vy, r, c, R, C)

        # ---------------- intra whole-mode screening -------------------
        hrow = r > 0
        hcol = c > 0
        above_t = _vrow(rec_y, jnp.maximum(r - 1, 0) * C + c)
        left_t = _vrow(rec_y, r * C + jnp.maximum(c - 1, 0))
        al_t = _vrow(rec_y, jnp.maximum(r - 1, 0) * C
                     + jnp.maximum(c - 1, 0))
        a16 = jnp.where(hrow, above_t[:, 240:256], 127)
        lcol16 = _tile_col16(left_t)
        lcol = jnp.where(hcol, lcol16, 129)
        e0 = jnp.where(hrow & hcol, al_t[:, 255:256],
                       jnp.where(hrow, 129, 127))
        oy_t = _vrow_s(oyt_ref, c)                          # (1, 256)
        oy_b = _vrow_s(oyb_ref, c)
        oy_ps = _vrow_ps(oyps_ref, c)                       # (16, 16)

        wpreds = _whole16(a16, lcol, e0, hrow, hcol)
        best_cost = INF
        best_wmode = jnp.int32(0)
        wpred_sel = wpreds[0]
        for m in range(4):
            var = _var_scalar_lane(oy_t - wpreds[m])
            cost = _rdc(mbc_ref[0, m], var, rmult, dmult)
            better = cost < best_cost
            best_wmode = jnp.where(better, m, best_wmode)
            wpred_sel = jnp.where(better, wpreds[m], wpred_sel)
            best_cost = jnp.where(better, cost, best_cost)

        # ---------------- inter candidates -----------------------------
        # best = (cost, kind [0 intra/1 inter], mode, mvx, mvy, pred_ps)
        best = (best_cost, jnp.int32(0), jnp.int32(0), jnp.int32(0),
                jnp.int32(0), jnp.zeros((16, 16), jnp.int32))

        def consider(best, mode, cand_mvx, cand_mvy, rate, enabled):
            (bc, bk, bm, bx, by, bps) = best
            ps = _predict_ps(refy_ref, r, c, cand_mvx, cand_mvy, 16, W, H,
                              taps_ref)
            var = _var_scalar(oy_ps - ps)
            cost = jnp.where(enabled, _rdc(rate, var, rmult, dmult), INF)
            better = cost < bc
            return (jnp.where(better, cost, bc),
                    jnp.where(better, 1, bk),
                    jnp.where(better, mode, bm),
                    jnp.where(better, cand_mvx, bx),
                    jnp.where(better, cand_mvy, by),
                    jnp.where(better, ps, bps))

        best = consider(best, jnp.int32(ZEROMV), jnp.int32(0),
                        jnp.int32(0), c_zero, True)
        nx, ny = _clamp_mv(m1x, m1y, r, c, R, C)
        best = consider(best, jnp.int32(NEARESTMV), nx, ny, c_nearest,
                        (nx != 0) | (ny != 0))
        nx2, ny2 = _clamp_mv(m2x, m2y, r, c, R, C)
        best = consider(best, jnp.int32(NEARMV), nx2, ny2, c_near,
                        (nx2 != 0) | (ny2 != 0))

        # NEWMV: iterated diamond search (encode_inter.cc:172-229)
        if realtime:
            do_search = (c % 4 == 0) & (r % 4 == 0)
        else:
            do_search = jnp.bool_(True)

        def site_cost(ox, oy_, sx_, sy_, step):
            mvx = ox + step * sx_
            mvy = oy_ + step * sy_
            oob = (jnp.abs(mvx) > 1023) | (jnp.abs(mvy) > 1023)
            tx, ty = _clamp_mv(mvx + brx, mvy + bry, r, c, R, C)
            ps = _predict_ps(refy_ref, r, c, tx, ty, 16, W, H, taps_ref)
            dist = _ssum(jnp.abs(oy_ps - ps))
            cx = jnp.clip(jax.lax.shift_right_arithmetic(mvx, 2),
                          -255, 255)
            cy = jnp.clip(jax.lax.shift_right_arithmetic(mvy, 2),
                          -255, 255)
            rate = (sadc_ref[0, jnp.abs(cy)] + sadc_ref[0, jnp.abs(cx)])
            rate = (rate * sad_weight + 128) >> 8
            cost = ((128 + rate) >> 8) + dist
            return jnp.where(oob, INF, cost), mvx, mvy

        def diamond(origin_x, origin_y, step0):
            first_step = step0 >> 1

            def cond(st):
                return st[2] > 1

            def body(st):
                ox, oy_, step, fs = st
                bcost = INF
                bx, by = ox, oy_
                for sx_, sy_ in ((-1, 0), (0, -1), (0, 0), (0, 1), (1, 0)):
                    cost, mvx, mvy = site_cost(ox, oy_, sx_, sy_, step)
                    bet = cost < bcost
                    bx = jnp.where(bet, mvx, bx)
                    by = jnp.where(bet, mvy, by)
                    bcost = jnp.where(bet, cost, bcost)
                stay = (bx == ox) & (by == oy_)
                fs = jnp.where(stay, step >> 1, fs)
                return (bx, by, step >> 1, fs)

            ox, oy_, _, fs = jax.lax.while_loop(
                cond, body, (origin_x, origin_y, step0, first_step))
            return ox, oy_, fs

        def full_search():
            def cond(st):
                return st[2] > 1

            def body(st):
                mx_, my_, step = st
                nx_, ny_, fs = diamond(mx_, my_, step)
                same = (nx_ == mx_) & (ny_ == my_)
                # 'break' when the restart converges: force step to 1
                return (nx_, ny_, jnp.where(same, 1, fs))

            mx_, my_, _ = jax.lax.while_loop(
                cond, body, (jnp.int32(0), jnp.int32(0), jnp.int32(512)))
            return mx_ + brx, my_ + bry

        fx, fy = jax.lax.cond(
            do_search, full_search,
            lambda: (jnp.int32(0), jnp.int32(0)))
        new_en = do_search & ((fx != 0) | (fy != 0))
        # component mv cost (MVComponentCostTable.mv_cost, weight 96)
        dmx = fx - brx
        dmy = fy - bry
        mvrate = (mvcost_ref[jnp.where(dmy < 0, 1, 0), jnp.abs(dmy)]
                  + mvcost_ref[2 + jnp.where(dmx < 0, 1, 0), jnp.abs(dmx)])
        nrate = c_new + (mvrate * 96) // 128
        best = consider(best, jnp.int32(NEWMV), fx, fy, nrate, new_en)

        (bcost, bkind, bmode, bmvx, bmvy, bps) = best

        # ---------------- encode the winner ----------------------------
        def encode_inter():
            pred_t = _ps_to_lane(bps, psB_ref, psM_ref)        # (1, 256)
            pred_b = _permute(pred_t, t2b_ref[...])
            diff_b = oy_b - pred_b
            co_full = ET.fdct(diff_b)
            li = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
            is_dc = (li % 16) == 0
            walsh = jnp.concatenate(
                [_lane(co_full, 16 * b) for b in range(16)], axis=1)
            co_ac = ET.quantize(jnp.where(is_dc, 0, co_full), q_ydc, q_yac)
            y2q = ET.quantize(ET.fwht(walsh), q_y2dc, q_y2ac)
            yd = ET.dequantize(co_ac, q_ydc, q_yac)
            dc_rec = ET.iwht(ET.dequantize(y2q, q_y2dc, q_y2ac))
            dc_expand = jnp.zeros((1, 256), jnp.int32)
            for b in range(16):
                dc_expand = dc_expand + jnp.where(
                    li == 16 * b, _bcast(_lane(dc_rec, b), 256), 0)
            yblk = jnp.where(is_dc, dc_expand, yd)
            rec_b = jnp.clip(pred_b + ET.idct(yblk), 0, 255)
            rec_t = _permute(rec_b, b2t_ref[...])

            # chroma from the averaged MV
            cmx = _chroma_mv(bmvx)
            cmy = _chroma_mv(bmvy)
            pu_ps = _predict_ps(refu_ref, r, c, cmx, cmy, 8,
                                W // 2, H // 2, taps_ref)
            pv_ps = _predict_ps(refv_ref, r, c, cmx, cmy, 8,
                                W // 2, H // 2, taps_ref)
            pu_t = _ps_to_lane8(pu_ps, psB8_ref, psM8_ref)
            pv_t = _ps_to_lane8(pv_ps, psB8_ref, psM8_ref)

            def chroma_code(ob, pt):
                pb = _permute(pt, t2b8_ref[...])
                qc = ET.quantize(ET.fdct(ob - pb), q_uvdc, q_uvac)
                resd = ET.idct(ET.dequantize(qc, q_uvdc, q_uvac))
                rec = _permute(jnp.clip(pb + resd, 0, 255), b2t8_ref[...])
                return qc, rec

            co_u, rec_u_t = chroma_code(_vrow_s(oub_ref, c), pu_t)
            co_v, rec_v_t = chroma_code(_vrow_s(ovb_ref, c), pv_t)
            out = (co_ac, co_u, co_v, y2q[:, 0:16], jnp.int32(1),
                   bmode, jnp.zeros((1, 16), jnp.int32),
                   jnp.int32(0),          # uvmode unused for inter
                   rec_t, rec_u_t, rec_v_t, cmx, cmy)
            if trellis:
                # inter MBs never trellis-quantize (the host mirrors the
                # reference's FIRST_PASS interframe path) — their context
                # slots stay zero and the y2 chain passes through
                out = out + (jnp.zeros((1, 24), jnp.int32),)
            return out

        def encode_intra():
            # full intra MB with interframe costs (encode_intra_np
            # encode_intra_mb(interframe=True)); B_PRED costs are the
            # non-contextual inter_bmode_costs
            ar_t = _vrow(rec_y, jnp.maximum(r - 1, 0) * C
                         + jnp.minimum(c + 1, C - 1))
            has_ar = hrow & (c < C - 1)
            ar4 = jnp.where(has_ar, ar_t[:, 240:244],
                            jnp.where(hrow, _bcast(a16[:, 15:16], 4), 127))
            ea = jnp.concatenate([a16, ar4], axis=1)

            # band scan over the four subblock rows (same position-uniform
            # trick as enc_intra_pallas: above20 = concat(prev_bottom, ar4)
            # with prev_bottom initialized to a16); B_PRED costs here are
            # the non-contextual inter_bmode_costs, so no mode carry
            # (Mosaic in-kernel loops: fori_loop-shaped only, no
            # extensive inputs — band data rides the carry and rotates
            # into a static lane window)
            al_roll0 = jnp.concatenate(
                [e0] + [_lane(lcol, 4 * b - 1) for b in range(1, 4)],
                axis=1)

            if trellis:
                # entry contexts (host TrellisContext semantics): above
                # MB bottom row / left MB right column, zero off-frame or
                # when the neighbor was inter-coded (its slots were never
                # written)
                ynz_abv4 = arow[:, 0:4]
                ynz_left4 = lnz[:, 0:4]
                unz_abv, unz_left = arow[:, 4:6], lnz[:, 4:6]
                vnz_abv, vnz_left = arow[:, 6:8], lnz[:, 6:8]

            def bpred_band(_i, carry):
                if trellis:
                    (prev_bottom, out_recon, out_co, out_bm, rate_a,
                     dist_a, lc_roll, al_roll, oyb_roll,
                     prev_nz, lnz_roll, out_nzc) = carry
                else:
                    (prev_bottom, out_recon, out_co, out_bm, rate_a,
                     dist_a, lc_roll, al_roll, oyb_roll) = carry
                lcb = lc_roll[:, 0:4]
                al_first = al_roll[:, 0:1]
                osb_band = oyb_roll[:, 0:64]
                above20 = jnp.concatenate([prev_bottom, ar4], axis=1)
                rows = [jnp.zeros((1, 16), jnp.int32)] * 4
                bm_list, co_list, nz_list = [], [], []
                block_prev = None
                last_nz = None
                for sc in range(4):
                    above4 = above20[:, sc * 4:sc * 4 + 4]
                    arr = above20[:, (sc + 1) * 4:(sc + 1) * 4 + 4]
                    al = al_first if sc == 0 else _lane(above20, sc * 4 - 1)
                    left4 = (lcb if sc == 0 else
                             jnp.concatenate([_lane(block_prev, i * 4 + 3)
                                              for i in range(4)], axis=1))
                    preds = _sb_predict_all(
                        jnp.concatenate([above4, arr], axis=1), left4, al)
                    osb = osb_band[:, sc * 16:sc * 16 + 16]
                    bcost_sb = INF
                    bm = jnp.int32(0)
                    brate = jnp.int32(0)
                    bsse = jnp.int32(0)
                    psel = preds[0]
                    for m in range(NUM_B_MODES):
                        sse = _ssum((osb - preds[m]) ** 2)
                        rate = ibc_ref[0, m]
                        cost = _rdc(rate, sse, rmult, dmult)
                        bet = cost < bcost_sb
                        bm = jnp.where(bet, m, bm)
                        brate = jnp.where(bet, rate, brate)
                        bsse = jnp.where(bet, sse, bsse)
                        psel = jnp.where(bet, preds[m], psel)
                        bcost_sb = jnp.where(bet, cost, bcost_sb)
                    bm_list.append(jnp.broadcast_to(bm, (1, 1)))
                    rate_a = rate_a + brate
                    dist_a = dist_a + bsse
                    co_nat = ET.fdct(osb - psel)
                    if trellis:
                        # B_PRED: no Y2, first_index 0, context from the
                        # post-trellis nz of up (previous band, carried)
                        # / left (previous subblock or left MB)
                        up_nz = prev_nz[:, sc:sc + 1]
                        left_nz = lnz_roll[:, 0:1] if sc == 0 else last_nz
                        ctxb = up_nz + left_nz
                        qpm, nzb = TRP.trellis_quantize_pm(
                            _zz_pm(co_nat), tct_ref, 0, 0, ctxb, q_ydc,
                            q_yac, rmult, dmult, 1)
                        qc = _zz_nat(qpm)
                        last_nz = nzb.astype(jnp.int32)
                        nz_list.append(last_nz)
                    else:
                        qc = ET.quantize(co_nat, q_ydc, q_yac)
                    co_list.append(qc)
                    resd = ET.idct(ET.dequantize(qc, q_ydc, q_yac))
                    blk = jnp.clip(psel + resd, 0, 255)
                    for i in range(4):
                        r_ = rows[i]
                        parts = ([r_[:, :sc * 4]] if sc > 0 else []) + \
                            [blk[:, i * 4:i * 4 + 4]] + \
                            ([r_[:, sc * 4 + 4:]] if sc < 3 else [])
                        rows[i] = jnp.concatenate(parts, axis=1)
                    block_prev = blk
                out_recon = jnp.concatenate(
                    [out_recon[:, 64:], jnp.concatenate(rows, axis=1)],
                    axis=1)
                out_co = jnp.concatenate(
                    [out_co[:, 64:], jnp.concatenate(co_list, axis=1)],
                    axis=1)
                out_bm = jnp.concatenate(
                    [out_bm[:, 4:], jnp.concatenate(bm_list, axis=1)],
                    axis=1)
                roll = lambda x, n: jnp.concatenate(
                    [x[:, n:], x[:, :n]], axis=1)
                base = (rows[3], out_recon, out_co, out_bm,
                        rate_a, dist_a, roll(lc_roll, 4),
                        roll(al_roll, 1), roll(oyb_roll, 64))
                if trellis:
                    band_nz = jnp.concatenate(nz_list, axis=1)   # (1, 4)
                    out_nzc = jnp.concatenate(
                        [out_nzc[:, 1:], band_nz[:, 3:4]], axis=1)
                    base = base + (band_nz, roll(lnz_roll, 1), out_nzc)
                return base

            z256 = jnp.zeros((1, 256), jnp.int32)
            init = (a16, z256, z256, jnp.zeros((1, 16), jnp.int32),
                    mbc_ref[0, B_PRED] * jnp.ones((), jnp.int32),
                    jnp.int32(0),
                    lcol, al_roll0, oy_b)
            if trellis:
                init = init + (ynz_abv4, ynz_left4,
                               jnp.zeros((1, 4), jnp.int32))
                (_, bpred_recon, bpred_co, bpred_bm, bpred_rate,
                 bpred_dist, _, _, _, bp_bnz, _, bp_colnz) = \
                    jax.lax.fori_loop(0, 4, bpred_band, init)
            else:
                (_, bpred_recon, bpred_co, bpred_bm, bpred_rate,
                 bpred_dist, _, _, _) = jax.lax.fori_loop(
                    0, 4, bpred_band, init)
            bpred_cost = _rdc(bpred_rate, bpred_dist, rmult, dmult)

            # whole-MB: reuse screening results (same math)
            wpred_b = _permute(wpred_sel, t2b_ref[...])
            diff_b = oy_b - wpred_b
            co_full = ET.fdct(diff_b)
            li = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
            is_dc = (li % 16) == 0
            walsh = jnp.concatenate(
                [_lane(co_full, 16 * b) for b in range(16)], axis=1)
            if trellis:
                def sel3(ctx, v0, v1, v2):
                    return jnp.where(ctx == 0, v0,
                                     jnp.where(ctx == 1, v1, v2))

                # whole-mode luma: one DP over all 16 subblocks, both
                # start-level walk-forwards + all three entry-context
                # costs precomputed, per-subblock choice resolved in
                # raster order (enc_intra_pallas pattern at Rp=1)
                wpm = TRP.permute_wide(jnp.where(is_dc, 0, co_full),
                                       pmy_ref[...])
                finalW, storesW = TRP.trellis_nodes(
                    wpm, tct_ref, 16, 1, q_ydc, q_yac, rmult, dmult, 16)
                zc = jnp.zeros((1, 16), jnp.int32)
                outW0, nzW0 = TRP.trellis_walk(storesW, zc, 1, 16)
                outW1, nzW1 = TRP.trellis_walk(storesW, zc + 1, 1, 16)
                cw = [TRP.final_costs(finalW, tct_ref, 17, zc + k,
                                      rmult, dmult) for k in range(3)]
                nzW0i = nzW0.astype(jnp.int32)
                nzW1i = nzW1.astype(jnp.int32)
                chW, nzW = zc, zc
                for b in range(16):
                    sr_, sc_ = b // 4, b % 4
                    up_nz = (nzW[:, b - 4:b - 3] if sr_
                             else ynz_abv4[:, sc_:sc_ + 1])
                    lf_nz = (nzW[:, b - 1:b] if sc_
                             else ynz_left4[:, sr_:sr_ + 1])
                    ctx = up_nz + lf_nz
                    c0 = sel3(ctx, cw[0][0][:, b:b + 1],
                              cw[1][0][:, b:b + 1], cw[2][0][:, b:b + 1])
                    c1 = sel3(ctx, cw[0][1][:, b:b + 1],
                              cw[1][1][:, b:b + 1], cw[2][1][:, b:b + 1])
                    chb = (c1 < c0).astype(jnp.int32)
                    nzb = jnp.where(chb == 1, nzW1i[:, b:b + 1],
                                    nzW0i[:, b:b + 1])
                    chW = _set_lane(chW, b, chb, 16)
                    nzW = _set_lane(nzW, b, nzb, 16)
                wout_pm = jnp.where(jnp.tile(chW, (1, 16)) == 1,
                                    outW1, outW0)
                wco_ac = TRP.permute_wide(wout_pm, pmyi_ref[...])

                # Y2: context from the above/left chains (inter MBs and
                # B_PRED MBs pass the chain through untouched)
                y2ctx = (arow[:, 8:9] * arow[:, 9:10]
                         + lnz[:, 8:9] * lnz[:, 9:10])
                y2pm, y2nzb = TRP.trellis_quantize_pm(
                    _zz_pm(ET.fwht(walsh)), tct_ref, 48, 0, y2ctx,
                    q_y2dc, q_y2ac, rmult, dmult, 1)
                y2q = _zz_nat(y2pm)
            else:
                wco_ac = ET.quantize(jnp.where(is_dc, 0, co_full), q_ydc,
                                     q_yac)
                y2q = ET.quantize(ET.fwht(walsh), q_y2dc, q_y2ac)
            yd = ET.dequantize(wco_ac, q_ydc, q_yac)
            dc_rec = ET.iwht(ET.dequantize(y2q, q_y2dc, q_y2ac))
            dc_expand = jnp.zeros((1, 256), jnp.int32)
            for b in range(16):
                dc_expand = dc_expand + jnp.where(
                    li == 16 * b, _bcast(_lane(dc_rec, b), 256), 0)
            yblk = jnp.where(is_dc, dc_expand, yd)
            wrec_b = jnp.clip(wpred_b + ET.idct(yblk), 0, 255)
            wrecon = _permute(wrec_b, b2t_ref[...])

            use_b = bpred_cost < best_cost     # vs best WHOLE cost
            ymode = jnp.where(use_b, B_PRED, best_wmode)
            implied = jnp.int32(0)
            for m in range(4):
                implied = jnp.where(best_wmode == m, _IMPLIED[m], implied)
            bm_out = jnp.where(use_b, bpred_bm,
                               jnp.broadcast_to(implied, (1, 16)))
            co_y = jnp.where(use_b, bpred_co, wco_ac)
            co_y2 = jnp.where(use_b, jnp.zeros((1, 16), jnp.int32),
                              y2q[:, 0:16])
            rec_t = jnp.where(use_b, bpred_recon, wrecon)

            # chroma intra by SSE
            abv_u = _vrow(rec_u, jnp.maximum(r - 1, 0) * C + c)
            lft_u = _vrow(rec_u, r * C + jnp.maximum(c - 1, 0))
            alu = _vrow(rec_u, jnp.maximum(r - 1, 0) * C
                        + jnp.maximum(c - 1, 0))
            abv_v = _vrow(rec_v, jnp.maximum(r - 1, 0) * C + c)
            lft_v = _vrow(rec_v, r * C + jnp.maximum(c - 1, 0))
            alv = _vrow(rec_v, jnp.maximum(r - 1, 0) * C
                        + jnp.maximum(c - 1, 0))
            a8u = jnp.where(hrow, abv_u[:, 56:64], 127)
            e0u = jnp.where(hrow & hcol, alu[:, 63:64],
                            jnp.where(hrow, 129, 127))
            clu = jnp.where(hcol, _tile_col8(lft_u), 129)
            a8v = jnp.where(hrow, abv_v[:, 56:64], 127)
            e0v = jnp.where(hrow & hcol, alv[:, 63:64],
                            jnp.where(hrow, 129, 127))
            clv = jnp.where(hcol, _tile_col8(lft_v), 129)
            pu = _whole8(a8u, clu, e0u, hrow, hcol)
            pv = _whole8(a8v, clv, e0v, hrow, hcol)
            ou_t = _vrow_s(out_ref, c)
            ov_t = _vrow_s(ovt_ref, c)
            ucost = INF
            uvmode = jnp.int32(0)
            pu_sel, pv_sel = pu[0], pv[0]
            for m in range(4):
                dist = (_ssum((ou_t - pu[m]) ** 2)
                        + _ssum((ov_t - pv[m]) ** 2))
                bet = dist < ucost
                uvmode = jnp.where(bet, m, uvmode)
                pu_sel = jnp.where(bet, pu[m], pu_sel)
                pv_sel = jnp.where(bet, pv[m], pv_sel)
                ucost = jnp.where(bet, dist, ucost)

            if trellis:
                # chroma: one DP over the 8 subblocks of both planes;
                # the two planes' 2x2 context chains are independent
                pbu = _permute(pu_sel, t2b8_ref[...])
                pbv = _permute(pv_sel, t2b8_ref[...])
                obu = _vrow_s(oub_ref, c)
                obv = _vrow_s(ovb_ref, c)
                uv_nat = jnp.concatenate(
                    [ET.fdct(obu - pbu), ET.fdct(obv - pbv)], axis=1)
                uvpm = TRP.permute_wide(uv_nat, pmuv_ref[...])
                finalU, storesU = TRP.trellis_nodes(
                    uvpm, tct_ref, 32, 0, q_uvdc, q_uvac, rmult, dmult, 8)
                z8 = jnp.zeros((1, 8), jnp.int32)
                outU0, nzU0 = TRP.trellis_walk(storesU, z8, 0, 8)
                outU1, nzU1 = TRP.trellis_walk(storesU, z8 + 1, 0, 8)
                cu = [TRP.final_costs(finalU, tct_ref, 32, z8 + k,
                                      rmult, dmult) for k in range(3)]
                nzU0i = nzU0.astype(jnp.int32)
                nzU1i = nzU1.astype(jnp.int32)
                chU, nzU = z8, z8
                for pos in range(4):
                    sr_, sc_ = pos // 2, pos % 2
                    for p in range(2):
                        b = p * 4 + pos
                        abv = (unz_abv, vnz_abv)[p]
                        lft = (unz_left, vnz_left)[p]
                        up_nz = (nzU[:, b - 2:b - 1] if sr_
                                 else abv[:, sc_:sc_ + 1])
                        lf_nz = (nzU[:, b - 1:b] if sc_
                                 else lft[:, sr_:sr_ + 1])
                        ctx = up_nz + lf_nz
                        c0 = sel3(ctx, cu[0][0][:, b:b + 1],
                                  cu[1][0][:, b:b + 1],
                                  cu[2][0][:, b:b + 1])
                        c1 = sel3(ctx, cu[0][1][:, b:b + 1],
                                  cu[1][1][:, b:b + 1],
                                  cu[2][1][:, b:b + 1])
                        chb = (c1 < c0).astype(jnp.int32)
                        nzb = jnp.where(chb == 1, nzU1i[:, b:b + 1],
                                        nzU0i[:, b:b + 1])
                        chU = _set_lane(chU, b, chb, 8)
                        nzU = _set_lane(nzU, b, nzb, 8)
                uvout_pm = jnp.where(jnp.tile(chU, (1, 16)) == 1,
                                     outU1, outU0)
                uv_q = TRP.permute_wide(uvout_pm, pmuvi_ref[...])
                co_u, co_v = uv_q[:, 0:64], uv_q[:, 64:128]

                def chroma_recon(qc, pb):
                    resd = ET.idct(ET.dequantize(qc, q_uvdc, q_uvac))
                    return _permute(jnp.clip(pb + resd, 0, 255),
                                    b2t8_ref[...])

                rec_u_t = chroma_recon(co_u, pbu)
                rec_v_t = chroma_recon(co_v, pbv)
            else:
                def chroma_code(ob, pt):
                    pb = _permute(pt, t2b8_ref[...])
                    qc = ET.quantize(ET.fdct(ob - pb), q_uvdc, q_uvac)
                    resd = ET.idct(ET.dequantize(qc, q_uvdc, q_uvac))
                    rec = _permute(jnp.clip(pb + resd, 0, 255),
                                   b2t8_ref[...])
                    return qc, rec

                co_u, rec_u_t = chroma_code(_vrow_s(oub_ref, c), pu_sel)
                co_v, rec_v_t = chroma_code(_vrow_s(ovb_ref, c), pv_sel)
            out = (co_y, co_u, co_v, co_y2, jnp.int32(0),
                   ymode, bm_out, uvmode,
                   rec_t, rec_u_t, rec_v_t, jnp.int32(0), jnp.int32(0))
            if trellis:
                # post-trellis nonzero state for the right/down neighbors:
                # [0:4 y right col, 4:8 y bottom row, 8:10 u right,
                #  10:12 u bottom, 12:14 v right, 14:16 v bottom,
                #  16 y2 nz, 17 y2 set (whole-mode only), pad]
                wm_col = jnp.concatenate(
                    [nzW[:, 3:4], nzW[:, 7:8], nzW[:, 11:12],
                     nzW[:, 15:16]], axis=1)
                ycol = jnp.where(use_b, bp_colnz, wm_col)
                yrow = jnp.where(use_b, bp_bnz, nzW[:, 12:16])
                ur = jnp.concatenate([nzU[:, 1:2], nzU[:, 3:4]], axis=1)
                vr = jnp.concatenate([nzU[:, 5:6], nzU[:, 7:8]], axis=1)
                y2set = jnp.where(use_b, jnp.zeros((1, 1), jnp.int32),
                                  jnp.ones((1, 1), jnp.int32))
                tnzv = jnp.concatenate(
                    [ycol, yrow, ur, nzU[:, 2:4], vr, nzU[:, 6:8],
                     y2nzb.astype(jnp.int32), y2set,
                     jnp.zeros((1, 6), jnp.int32)], axis=1)
                out = out + (tnzv,)
            return out

        inter_wins = bkind != 0
        res = jax.lax.cond(inter_wins, encode_inter, encode_intra)
        (co_y, co_u, co_v, co_y2, _is_inter, out_mode, bm_out, uvmode,
         rec_t, rec_u_t, rec_v_t, cmx, cmy) = res[:13]
        if trellis:
            # nonzero-context state update: intra MBs publish their
            # post-trellis nz; inter MBs zero the y/u/v slots (their plane
            # slots are never written host-side) and pass the y2 chain
            # through untouched
            tnzv = res[13]
            y2on = tnzv[:, 17:18] != 0
            new_abv = jnp.concatenate(
                [tnzv[:, 4:8], tnzv[:, 10:12], tnzv[:, 14:16],
                 jnp.where(y2on, tnzv[:, 16:17], arow[:, 8:9]),
                 jnp.where(y2on, 1, arow[:, 9:10]),
                 jnp.zeros((1, 6), jnp.int32)], axis=1)
            _vrow_store(anz, c, new_abv)
            lnz_new = jnp.concatenate(
                [tnzv[:, 0:4], tnzv[:, 8:10], tnzv[:, 12:14],
                 jnp.where(y2on, tnzv[:, 16:17], lnz[:, 8:9]),
                 jnp.where(y2on, 1, lnz[:, 9:10]),
                 jnp.zeros((1, 6), jnp.int32)], axis=1)

        coeffs = jnp.concatenate([co_y, co_u, co_v, co_y2], axis=1)
        nz = jnp.any(coeffs != 0)

        # ---------------- outputs + state ------------------------------
        _vrow_store_s(co_ref, c, coeffs)
        md_row = jnp.concatenate([
            jnp.stack([out_mode, uvmode,
                       jnp.where(inter_wins, 1, 0),
                       nz.astype(jnp.int32), bmvx, bmvy, cmx, cmy])[None],
            bm_out[0][None], jnp.zeros((1, 8), jnp.int32)], axis=1)
        _vrow_store_s(md_ref, c, md_row)
        _vrow_store_s(ry_ref, c, rec_t)
        _vrow_store_s(ru_ref, c, rec_u_t)
        _vrow_store_s(rv_ref, c, rec_v_t)
        _vrow_store(rec_y, r * C + c, rec_t)
        _vrow_store(rec_u, r * C + c, rec_u_t)
        _vrow_store(rec_v, r * C + c, rec_v_t)
        ring[cr, c, 0] = jnp.where(inter_wins, bmvx, 0)
        ring[cr, c, 1] = jnp.where(inter_wins, bmvy, 0)
        ring[cr, c, 2] = jnp.where(inter_wins, 1, 0)
        ring[cr, c, 3] = out_mode
        return lnz_new if trellis else 0

    jax.lax.fori_loop(0, C, mb_body,
                      jnp.zeros((1, 16), jnp.int32) if trellis else 0)


def _tile_col16(t):
    return jnp.concatenate([_lane(t, 15 + 16 * y) for y in range(16)],
                           axis=1)


def _tile_col8(t):
    return jnp.concatenate([_lane(t, 7 + 8 * y) for y in range(8)], axis=1)


def _whole16(a, lcol, e0, hrow, hcol):
    return _whole_generic(a, lcol, e0, hrow, hcol, 16)


def _whole8(a, lcol, e0, hrow, hcol):
    return _whole_generic(a, lcol, e0, hrow, hcol, 8)


def _whole_generic(a, lcol, e0, hrow, hcol, S):
    log2 = {8: 3, 16: 4}[S]
    sum_a = jnp.sum(a, axis=1, keepdims=True)
    sum_l = jnp.sum(lcol, axis=1, keepdims=True)
    dc = jnp.where(
        hrow & hcol, (sum_a + sum_l + (1 << log2)) >> (log2 + 1),
        jnp.where(hrow, (sum_a + (1 << (log2 - 1))) >> log2,
                  jnp.where(hcol, (sum_l + (1 << (log2 - 1))) >> log2,
                            128)))
    P = S * S
    dcp = _bcast(dc, P)
    vp = jnp.tile(a, (1, S))
    hp = jnp.concatenate([_bcast(_lane(lcol, y), S) for y in range(S)],
                         axis=1)
    tm = jnp.clip(hp + vp - _bcast(e0, P), 0, 255)
    return [dcp, vp, hp, tm]


def _var_scalar_lane(diff):
    """variance of a (1, 256) int32 diff, scalar."""
    sse = _ssum(diff * diff)
    s = _ssum(diff)
    sa = jnp.abs(s)
    hi, lo = sa >> 8, sa & 255
    return sse - (hi * hi * 256 + 2 * hi * lo + (lo * lo) // 256)


def _ps_to_lane8(ps, B_ref, M_ref):
    t = jnp.dot(ps.astype(jnp.bfloat16), B_ref[...].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    return jnp.sum(t * M_ref[...], axis=0, keepdims=True).astype(jnp.int32)


def encode_inter_frame(oy_t, oy_b, oy_ps, ou_t, ov_t, ou_b, ov_b,
                       refy_p, refu_p, refv_p,
                       scalars, mb_costs, ib_costs, mvc2p, pcost, sadcost,
                       mvcost, realtime, interpret=False,
                       token_costs=None):
    """Run the inter-encode raster kernel.

    oy_t/oy_b: (R, C, 256) i16 original luma tiles (row-major / block
    layouts); oy_ps: (R, C, 16, 16) i16 phase-split tiles (row 4t+c at
    [c*4+t]); ou_*/ov_*: (R, C, 64) i16; refy_p/refu_p/refv_p: packed
    references (pack_refs32 of pad_refs); scalars: (16,) i32 [q_ydc, q_yac,
    q_y2dc, q_y2ac, q_uvdc, q_uvac, rmult, dmult, sad_weight, ...];
    mb_costs (8,) i32; ib_costs (16,) i32; mvc2p (6, 4) i32; pcost (256,)
    i32; sadcost (256,) i32; mvcost (4, 1024) i32 [comp*2+sign].

    Returns (coeffs (R, C, 400) i16, md (R, C, 32) i16,
             rec_y (R, C, 256) i16, rec_u, rec_v (R, C, 64) i16).
    md lanes: [ymode, uvmode, is_inter, nz, mvx, mvy, cmx, cmy,
               bmode x16, pad x8].

    token_costs: optional (64, 36) int32 position-major trellis token
    cost table (rows [Y_noY2 0:16, Y_afterY2 16:32, UV 32:48, Y2 48:64]);
    when set, intra-coded MBs run the --two-pass trellis DP on device
    (inter MBs keep plain quantization, mirroring the host/reference
    FIRST_PASS interframe path; encoder.cc:220-408, encode_inter.cc:
    614-622).
    """
    R, C = oy_t.shape[:2]
    H, W = R * 16, C * 16
    # pad the MB-column axis (the kernel's dynamic sublane axis) to a
    # multiple of 8 so every aligned 8-row block in _vrow/_vrow_store
    # stays in bounds; same for the (R*C, lanes) recon scratch rows
    Cp = ((C + 7) // 8) * 8
    RC8 = ((R * C + 7) // 8) * 8

    def padc(x):
        return jnp.pad(x, ((0, 0), (0, Cp - C)) + ((0, 0),) * (x.ndim - 2))

    oy_t, oy_b, oy_ps, ou_t, ov_t, ou_b, ov_b = (
        padc(a) for a in (oy_t, oy_b, oy_ps, ou_t, ov_t, ou_b, ov_b))
    t2b = jnp.asarray(_t2b_perm_np(16), jnp.bfloat16)
    b2t = jnp.asarray(_t2b_perm_np(16).T, jnp.bfloat16)
    t2b8 = jnp.asarray(_t2b_perm_np(8), jnp.bfloat16)
    b2t8 = jnp.asarray(_t2b_perm_np(8).T, jnp.bfloat16)
    psB, psM = _ps2lane_mask(16)
    psB8, psM8 = _ps2lane_mask(8)

    stream = lambda *shape: pl.BlockSpec((1,) + shape,
                                         lambda r: (r,) + (0,) * len(shape),
                                         memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda r: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    smem = lambda shape: pl.BlockSpec(shape, lambda r: (0,) * len(shape),
                                      memory_space=pltpu.SMEM)

    Hp4y, Wpy = refy_p.shape
    Hp4c, Wpc = refu_p.shape

    trellis = token_costs is not None
    tr_specs, tr_args, tr_scratch = [], [], []
    if trellis:
        pmy, pmyi = TRP.pm_perm(16)
        pmuv, pmuvi = TRP.pm_perm(8)
        tr_specs = [smem((64, 36)), const((256, 256)), const((256, 256)),
                    const((128, 128)), const((128, 128))]
        tr_args = [jnp.asarray(token_costs, jnp.int32),
                   pmy, pmyi, pmuv, pmuvi]
        tr_scratch = [pltpu.VMEM((Cp, 16), jnp.int32)]

    outs = pl.pallas_call(
        functools.partial(_inter_kernel, R, C, W, H, bool(realtime),
                          trellis),
        grid=(R,),
        # SMEM inputs are all >= 2-D: under the fused-QP vmap the batch
        # axis lands in front and Mosaic only accepts batched blocks whose
        # last two dims equal the array dims (1-D blocks fail to lower)
        in_specs=[smem((1, 16)), smem((1, 8)), smem((1, 16)), smem((6, 4)),
                  smem((1, 256)), smem((1, 256)), smem((4, 1024)),
                  smem((8, 6)),
                  const((Hp4y, Wpy)), const((Hp4c, Wpc)),
                  const((Hp4c, Wpc)),
                  const((256, 256)), const((256, 256)),
                  const((64, 64)), const((64, 64)),
                  const((16, 256)), const((16, 256)),
                  const((8, 64)), const((8, 64))]
        + tr_specs
        + [stream(Cp, 256), stream(Cp, 256), stream(Cp, 16, 16),
           stream(Cp, 64), stream(Cp, 64), stream(Cp, 64),
           stream(Cp, 64)],
        out_specs=(stream(Cp, 400), stream(Cp, 32), stream(Cp, 256),
                   stream(Cp, 64), stream(Cp, 64)),
        out_shape=(jax.ShapeDtypeStruct((R, Cp, 400), jnp.int16),
                   jax.ShapeDtypeStruct((R, Cp, 32), jnp.int16),
                   jax.ShapeDtypeStruct((R, Cp, 256), jnp.int16),
                   jax.ShapeDtypeStruct((R, Cp, 64), jnp.int16),
                   jax.ShapeDtypeStruct((R, Cp, 64), jnp.int16)),
        scratch_shapes=[pltpu.VMEM((RC8, 256), jnp.int16),
                        pltpu.VMEM((RC8, 64), jnp.int16),
                        pltpu.VMEM((RC8, 64), jnp.int16),
                        pltpu.SMEM((2, C, 4), jnp.int32)] + tr_scratch,
        interpret=interpret,
    )(jnp.asarray(scalars, jnp.int32)[None],
      jnp.asarray(mb_costs, jnp.int32)[None],
      jnp.asarray(ib_costs, jnp.int32)[None], jnp.asarray(mvc2p, jnp.int32),
      jnp.asarray(pcost, jnp.int32)[None],
      jnp.asarray(sadcost, jnp.int32)[None],
      jnp.asarray(mvcost, jnp.int32),
      jnp.asarray(np.asarray(SIXTAP_TABLE, np.int32)),
      refy_p, refu_p, refv_p, t2b, b2t, t2b8, b2t8,
      jnp.asarray(psB, jnp.bfloat16), jnp.asarray(psM, jnp.float32),
      jnp.asarray(psB8, jnp.bfloat16), jnp.asarray(psM8, jnp.float32),
      *tr_args,
      oy_t, oy_b, oy_ps, ou_t, ov_t, ou_b, ov_b)
    return tuple(o[:, :C] for o in outs)
