"""Pallas TPU kernel: interframe mode/MV DECISIONS ONLY (fast rt path).

The serial raster kernel (ops/enc_inter_pallas.py) interleaves the
sequential part of interframe encoding (MV census over committed
neighbor decisions, candidate evaluation, diamond search) with the
heavy per-macroblock pixel math (transforms, quantization,
reconstruction, the full intra fallback).  That shape is bit-exact vs
the host loop but leaves the VPU nearly idle: every op runs on
(1, 256)/(16, 16) operands, ~60-90 us/MB on a v5e.

This kernel keeps ONLY the decision chain — the part that is truly
serial (census reads the left/above/above-left committed modes,
encode_inter.cc:231-369) — and emits a per-MB (is_inter, mode, mv)
field.  Everything downstream (motion-compensated prediction, forward
DCT/WHT, quantization, decoder-exact reconstruction) is data-parallel
given the decisions and runs as dense batched XLA/Pallas ops over the
whole frame at full VPU/MXU utilization (encoder/encode_inter_fast.py).

Divergence from the host loop (documented, gated by RD tests): the
whole-MB intra screening variance is computed against SOURCE neighbor
pixels (precomputed outside, one cost per MB in SMEM) instead of the
in-loop reconstruction the host uses — reconstruction does not exist
yet when decisions are made in this split design.  Everything else
(census, ZEROMV/NEARESTMV/NEARMV evaluation, the iterated diamond
search for NEWMV, rd costs) matches encode_inter_np bit-for-bit: the
candidate predictions come from the same packed reference via the same
_predict_ps/_filter_ps helpers.

Reference: encoder/encode_inter.cc:172-369 (search + decision),
salsify-sender.cc:160-170 (the 33 ms design point this serves).
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from alfalfa_tpu.ops.enc_inter_pallas import (
    INF, ZEROMV, NEARESTMV, NEARMV, NEWMV,
    _predict_ps, _var_scalar, _ssum, _clamp_mv, _vrow_ps, _vrow_store_s)
from alfalfa_tpu.ops.sixtap_pallas import SIXTAP_TABLE


def _decide_kernel(R, C, W, H, realtime,
                   sc_ref, mvc2p_ref, pcost_ref, sadc_ref, mvcost_ref,
                   icost_ref, taps_ref,
                   refy_ref,
                   oyps_ref,
                   md_ref,
                   ring):
    r = pl.program_id(0)
    rmult, dmult = sc_ref[0, 6], sc_ref[0, 7]
    sad_weight = sc_ref[0, 8]

    def mb_body(c, _):
        # ---------------- census (parse.py mv_census) ------------------
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
        p3 = mvc2p_ref[jnp.int32(0), 3]
        c_zero = pcost_ref[0, p0]
        c_nearest = pcost_ref[0, 255 - p0] + pcost_ref[0, p1]
        c_near = (pcost_ref[0, 255 - p0] + pcost_ref[0, 255 - p1]
                  + pcost_ref[0, p2])
        c_new = (pcost_ref[0, 255 - p0] + pcost_ref[0, 255 - p1]
                 + pcost_ref[0, 255 - p2] + pcost_ref[0, p3])

        brx, bry = _clamp_mv(best_vx, best_vy, r, c, R, C)

        oy_ps = _vrow_ps(oyps_ref, c)                       # (16, 16)

        # intra screening: precomputed source-neighbor whole-mode cost
        best = (icost_ref[0, r * C + c], jnp.int32(0), jnp.int32(0),
                jnp.int32(0), jnp.int32(0))

        def consider(best, mode, cand_mvx, cand_mvy, rate, enabled):
            (bc, bk, bm, bx, by) = best
            ps = _predict_ps(refy_ref, r, c, cand_mvx, cand_mvy, 16, W, H,
                             taps_ref)
            var = _var_scalar(oy_ps - ps)
            cost = jnp.where(enabled, ((128 + rate * rmult) >> 8)
                             + var * dmult, INF)
            better = cost < bc
            return (jnp.where(better, cost, bc),
                    jnp.where(better, 1, bk),
                    jnp.where(better, mode, bm),
                    jnp.where(better, cand_mvx, bx),
                    jnp.where(better, cand_mvy, by))

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
                return (nx_, ny_, jnp.where(same, 1, fs))

            mx_, my_, _ = jax.lax.while_loop(
                cond, body, (jnp.int32(0), jnp.int32(0), jnp.int32(512)))
            return mx_ + brx, my_ + bry

        fx, fy = jax.lax.cond(
            do_search, full_search,
            lambda: (jnp.int32(0), jnp.int32(0)))
        new_en = do_search & ((fx != 0) | (fy != 0))
        dmx = fx - brx
        dmy = fy - bry
        mvrate = (mvcost_ref[jnp.where(dmy < 0, 1, 0), jnp.abs(dmy)]
                  + mvcost_ref[2 + jnp.where(dmx < 0, 1, 0), jnp.abs(dmx)])
        nrate = c_new + (mvrate * 96) // 128
        best = consider(best, jnp.int32(NEWMV), fx, fy, nrate, new_en)

        (bcost, bkind, bmode, bmvx, bmvy) = best
        inter_wins = bkind != 0

        md_row = jnp.stack([
            jnp.where(inter_wins, 1, 0), bmode, bmvx, bmvy,
            jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0)])[None]
        _vrow_store_s(md_ref, c, md_row)
        ring[cr, c, 0] = jnp.where(inter_wins, bmvx, 0)
        ring[cr, c, 1] = jnp.where(inter_wins, bmvy, 0)
        ring[cr, c, 2] = jnp.where(inter_wins, 1, 0)
        return 0

    jax.lax.fori_loop(0, C, mb_body, 0)


def decide_inter_frame(oy_ps, refy_p, scalars, icost, mvc2p, pcost,
                       sadcost, mvcost, realtime, interpret=False):
    """Run the decisions-only raster kernel.

    oy_ps: (R, C, 16, 16) i16 phase-split source luma tiles (row 4t+c at
    [c*4+t]); refy_p: packed luma reference (pack_refs32 of pad_refs);
    scalars: (16,) i32 (enc_inter_pallas layout — only rmult/dmult/
    sad_weight are read); icost: (R*C,) i32 best source-screened intra
    whole-mode rd cost per MB; tables as in encode_inter_frame.

    Returns md (R, C, 8) i16: [is_inter, inter mode id, mvx, mvy, 0...].
    """
    R, C = oy_ps.shape[:2]
    H, W = R * 16, C * 16
    Cp = ((C + 7) // 8) * 8
    RC = R * C

    oy_ps = jnp.pad(oy_ps, ((0, 0), (0, Cp - C), (0, 0), (0, 0)))

    stream = lambda *shape: pl.BlockSpec((1,) + shape,
                                         lambda r: (r,) + (0,) * len(shape),
                                         memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda r: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    smem = lambda shape: pl.BlockSpec(shape, lambda r: (0,) * len(shape),
                                      memory_space=pltpu.SMEM)

    Hp4y, Wpy = refy_p.shape
    return pl.pallas_call(
        functools.partial(_decide_kernel, R, C, W, H, bool(realtime)),
        grid=(R,),
        in_specs=[smem((1, 16)), smem((6, 4)), smem((1, 256)),
                  smem((1, 256)), smem((4, 1024)), smem((1, RC)),
                  smem((8, 6)),
                  const((Hp4y, Wpy))]
        + [stream(Cp, 16, 16)],
        out_specs=stream(Cp, 8),
        out_shape=jax.ShapeDtypeStruct((R, Cp, 8), jnp.int16),
        scratch_shapes=[pltpu.SMEM((2, C, 3), jnp.int32)],
        interpret=interpret,
    )(jnp.asarray(scalars, jnp.int32)[None],
      jnp.asarray(mvc2p, jnp.int32),
      jnp.asarray(pcost, jnp.int32)[None],
      jnp.asarray(sadcost, jnp.int32)[None],
      jnp.asarray(mvcost, jnp.int32),
      jnp.asarray(icost, jnp.int32)[None],
      jnp.asarray(np.asarray(SIXTAP_TABLE, np.int32)),
      refy_p, oy_ps)[:, :C]
