"""Pallas TPU kernel: whole-mode intra encode for the sparse intra-coded
macroblocks of a fast-path interframe (the "fixup" pass).

The fast rt pipeline (encoder/encode_inter_fast.py) computes inter
residues/reconstruction densely; macroblocks where the decision kernel
scored intra still need real intra encoding against decoder-exact
neighbor reconstruction — a serial dependency.  Round-tripping them to
the host cost a full reconstruction fetch + per-MB numpy encode + a
scatter upload (~0.5-1 s/frame over the axon tunnel).  This kernel does
the same whole-mode encode in place: a raster walk that passes inter
MBs through (a vector copy) and runs DC/V/H/TM screening + fDCT/WHT +
quantization + reconstruction for intra MBs only, reading neighbors
from the in-kernel reconstruction scratch.

Semantics match encode_intra_np.encode_intra_mb(interframe=True,
skip_bpred=True) — the fast path's documented B_PRED trade — and the
transform/quant/recon math is lifted from the serial kernel's
encode_intra branch (ops/enc_inter_pallas.py, itself byte-identical to
the host).  Reference: encode_inter.cc:270-276 (intra fallback inside
the interframe loop), encode_intra.cc whole-mode path.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from alfalfa_tpu.ops.intra_pallas import _lane, _bcast
from alfalfa_tpu.ops import enc_transforms_pallas as ET
from alfalfa_tpu.ops.enc_inter_pallas import (
    INF, _t2b_perm_np, _permute, _vrow, _vrow_s, _vrow_store,
    _vrow_store_s, _var_scalar_lane, _rdc, _tile_col16, _tile_col8,
    _whole16, _whole8, _ssum)

_IMPLIED = (0, 2, 3, 1)
B_PRED = 4


def _fixup_kernel(R, C,
                  sc_ref, mbc_ref,
                  t2b_ref, b2t_ref, t2b8_ref, b2t8_ref,
                  md_ref, oyt_ref, oyb_ref, out_ref, ovt_ref,
                  oub_ref, ovb_ref,
                  dy_ref, du_ref, dv_ref,
                  co_ref, md2_ref, ry_ref, ru_ref, rv_ref,
                  rec_y, rec_u, rec_v):
    r = pl.program_id(0)
    q_ydc, q_yac = sc_ref[0, 0], sc_ref[0, 1]
    q_y2dc, q_y2ac = sc_ref[0, 2], sc_ref[0, 3]
    q_uvdc, q_uvac = sc_ref[0, 4], sc_ref[0, 5]
    rmult, dmult = sc_ref[0, 6], sc_ref[0, 7]

    def mb_body(c, _):
        md = _vrow_s(md_ref, c)
        is_intra = md[0, 0] == 0
        in_y = _vrow_s(dy_ref, c)
        in_u = _vrow_s(du_ref, c)
        in_v = _vrow_s(dv_ref, c)

        hrow = r > 0
        hcol = c > 0

        def encode():
            above_t = _vrow(rec_y, jnp.maximum(r - 1, 0) * C + c)
            left_t = _vrow(rec_y, r * C + jnp.maximum(c - 1, 0))
            al_t = _vrow(rec_y, jnp.maximum(r - 1, 0) * C
                         + jnp.maximum(c - 1, 0))
            a16 = jnp.where(hrow, above_t[:, 240:256], 127)
            lcol = jnp.where(hcol, _tile_col16(left_t), 129)
            e0 = jnp.where(hrow & hcol, al_t[:, 255:256],
                           jnp.where(hrow, 129, 127))
            oy_t = _vrow_s(oyt_ref, c)
            oy_b = _vrow_s(oyb_ref, c)

            # whole-MB mode screening (reconstruction neighbors)
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

            # whole-mode luma transform path (Y2/WHT; serial kernel's
            # encode_intra non-trellis branch)
            wpred_b = _permute(wpred_sel, t2b_ref[...])
            co_full = ET.fdct(oy_b - wpred_b)
            li = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
            is_dc = (li % 16) == 0
            walsh = jnp.concatenate(
                [_lane(co_full, 16 * b) for b in range(16)], axis=1)
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
            rec_t = _permute(jnp.clip(wpred_b + ET.idct(yblk), 0, 255),
                             b2t_ref[...])

            # chroma intra by SSE (serial kernel / host uv selection)
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

            def chroma_code(ob, pt):
                pb = _permute(pt, t2b8_ref[...])
                qc = ET.quantize(ET.fdct(ob - pb), q_uvdc, q_uvac)
                resd = ET.idct(ET.dequantize(qc, q_uvdc, q_uvac))
                rec = _permute(jnp.clip(pb + resd, 0, 255),
                               b2t8_ref[...])
                return qc, rec

            co_u, rec_u_t = chroma_code(_vrow_s(oub_ref, c), pu_sel)
            co_v, rec_v_t = chroma_code(_vrow_s(ovb_ref, c), pv_sel)

            coeffs = jnp.concatenate(
                [wco_ac, co_u, co_v, y2q[:, 0:16]], axis=1)   # (1, 400)
            nz = jnp.any(coeffs != 0).astype(jnp.int32)
            md2 = jnp.concatenate([
                jnp.stack([best_wmode, uvmode, nz])[None],
                jnp.zeros((1, 5), jnp.int32)], axis=1)
            return coeffs, md2, rec_t, rec_u_t, rec_v_t

        def passthrough():
            return (jnp.zeros((1, 400), jnp.int32),
                    jnp.zeros((1, 8), jnp.int32), in_y, in_u, in_v)

        coeffs, md2, rec_t, rec_u_t, rec_v_t = jax.lax.cond(
            is_intra, encode, passthrough)

        _vrow_store_s(co_ref, c, coeffs)
        _vrow_store_s(md2_ref, c, md2)
        _vrow_store_s(ry_ref, c, rec_t)
        _vrow_store_s(ru_ref, c, rec_u_t)
        _vrow_store_s(rv_ref, c, rec_v_t)
        _vrow_store(rec_y, r * C + c, rec_t)
        _vrow_store(rec_u, r * C + c, rec_u_t)
        _vrow_store(rec_v, r * C + c, rec_v_t)
        return 0

    jax.lax.fori_loop(0, C, mb_body, 0)


def intra_fixup_frame(md8, oy_t, oy_b, ou_t, ov_t, ou_b, ov_b,
                      rec_y_in, rec_u_in, rec_v_in, scalars, mb_costs,
                      interpret=False):
    """Run the intra fixup raster walk.

    md8: (R, C, 8) i16 decision field ([0]=is_inter); oy_t/oy_b:
    (R, C, 256) i16 source luma (row-major / block layouts); ou_*/ov_*:
    (R, C, 64) i16; rec_*_in: dense inter reconstruction tiles (intra
    slots arbitrary); scalars/mb_costs as in enc_inter_pallas.

    Returns (co (R, C, 400) i16 — intra MBs only, zeros elsewhere;
             md2 (R, C, 8) i16 [ymode, uvmode, nz];
             rec_y (R, C, 256), rec_u, rec_v (R, C, 64) i16 — FINAL
             pre-loop-filter reconstruction for every MB).
    """
    R, C = md8.shape[:2]
    Cp = ((C + 7) // 8) * 8
    RC8 = ((R * C + 7) // 8) * 8

    def padc(x):
        return jnp.pad(x, ((0, 0), (0, Cp - C)) + ((0, 0),) * (x.ndim - 2))

    md8, oy_t, oy_b, ou_t, ov_t, ou_b, ov_b = (
        padc(a.astype(jnp.int16)) for a in
        (md8, oy_t, oy_b, ou_t, ov_t, ou_b, ov_b))
    rec_y_in, rec_u_in, rec_v_in = (padc(a.astype(jnp.int16)) for a in
                                    (rec_y_in, rec_u_in, rec_v_in))
    t2b = jnp.asarray(_t2b_perm_np(16), jnp.bfloat16)
    b2t = jnp.asarray(_t2b_perm_np(16).T, jnp.bfloat16)
    t2b8 = jnp.asarray(_t2b_perm_np(8), jnp.bfloat16)
    b2t8 = jnp.asarray(_t2b_perm_np(8).T, jnp.bfloat16)

    stream = lambda *shape: pl.BlockSpec((1,) + shape,
                                         lambda r: (r,) + (0,) * len(shape),
                                         memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda r: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    smem = lambda shape: pl.BlockSpec(shape, lambda r: (0,) * len(shape),
                                      memory_space=pltpu.SMEM)

    outs = pl.pallas_call(
        functools.partial(_fixup_kernel, R, C),
        grid=(R,),
        in_specs=[smem((1, 16)), smem((1, 8)),
                  const((256, 256)), const((256, 256)),
                  const((64, 64)), const((64, 64)),
                  stream(Cp, 8),
                  stream(Cp, 256), stream(Cp, 256),
                  stream(Cp, 64), stream(Cp, 64),
                  stream(Cp, 64), stream(Cp, 64),
                  stream(Cp, 256), stream(Cp, 64), stream(Cp, 64)],
        out_specs=(stream(Cp, 400), stream(Cp, 8), stream(Cp, 256),
                   stream(Cp, 64), stream(Cp, 64)),
        out_shape=(jax.ShapeDtypeStruct((R, Cp, 400), jnp.int16),
                   jax.ShapeDtypeStruct((R, Cp, 8), jnp.int16),
                   jax.ShapeDtypeStruct((R, Cp, 256), jnp.int16),
                   jax.ShapeDtypeStruct((R, Cp, 64), jnp.int16),
                   jax.ShapeDtypeStruct((R, Cp, 64), jnp.int16)),
        scratch_shapes=[pltpu.VMEM((RC8, 256), jnp.int16),
                        pltpu.VMEM((RC8, 64), jnp.int16),
                        pltpu.VMEM((RC8, 64), jnp.int16)],
        interpret=interpret,
    )(jnp.asarray(scalars, jnp.int32)[None],
      jnp.asarray(mb_costs, jnp.int32)[None],
      t2b, b2t, t2b8, b2t8,
      md8, oy_t, oy_b, ou_t, ov_t, ou_b, ov_b,
      rec_y_in, rec_u_in, rec_v_in)
    return tuple(o[:, :C] for o in outs)
