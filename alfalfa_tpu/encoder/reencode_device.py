"""Device path for the rebase residue update (reference reencode.cc:162-210).

``update_residues`` reuses the prediction frame's modes/MVs verbatim, so
the inter macroblocks have NO search and NO cross-MB dependencies: motion
compensation (the Pallas sixtap kernel), subtract->fDCT->quantize (the
lane-wise integer transforms, which run fine under plain XLA), the Y2 WHT
path, and the decoder-identical reconstruction all run for every inter MB
at once on the TPU.  Intra MBs (rare in prediction frames) keep the host
raster-order loop — they need reconstructed neighbors, and inter MBs never
read intra output, so computing all inter MBs first is order-equivalent.

Byte-identical to the host path (tests/test_rebase_device.py).
"""
import numpy as np
import jax
import jax.numpy as jnp

from alfalfa_tpu.bitstream import tables as T
from alfalfa_tpu.ops import sixtap
from alfalfa_tpu.ops import enc_transforms_pallas as ET

_FN_CACHE = {}


def _tiles_to_blocks(t, S):
    """(R, C, S, S) spatial tiles -> (R*C, S*S) subblock-major vectors."""
    R, C = t.shape[0], t.shape[1]
    nb = S // 4
    return (t.reshape(R, C, nb, 4, nb, 4)
            .transpose(0, 1, 2, 4, 3, 5).reshape(R * C, S * S))


def _blocks_to_tiles(b, R, C, S):
    nb = S // 4
    return (b.reshape(R, C, nb, nb, 4, 4)
            .transpose(0, 1, 2, 4, 3, 5).reshape(R, C, S, S))


def _fn_core(R, C):
    """The per-frame residue-update function, un-jitted (reused by the
    mesh rebase chain in parallel/gop.py)."""
    n = R * C

    def luma(orig_b, pred_b, splitmv, qs):
        y_dc, y_ac, y2_dc, y2_ac = qs[0], qs[1], qs[2], qs[3]
        co_full = ET.fdct(orig_b - pred_b)                  # (n, 256)
        li = jax.lax.broadcasted_iota(jnp.int32, (n, 256), 1)
        is_dc = (li % 16) == 0
        # whole-MV path: DCs ride Y2
        dcs = co_full.reshape(n, 16, 16)[:, :, 0]           # (n, 16)
        y2q = ET.quantize(ET.fwht(dcs), y2_dc, y2_ac)
        co_ac = ET.quantize(jnp.where(is_dc, 0, co_full), y_dc, y_ac)
        # SPLITMV: no Y2, DC coded in-block
        co_sp = ET.quantize(co_full, y_dc, y_ac)
        sm = splitmv.reshape(n, 1)
        co = jnp.where(sm, co_sp, co_ac)
        y2q = jnp.where(sm, 0, y2q)
        # decoder-identical reconstruction
        yd = ET.dequantize(co, y_dc, y_ac)
        dc_rec = ET.iwht(ET.dequantize(y2q, y2_dc, y2_ac))  # (n, 16)
        dc_expand = jnp.repeat(dc_rec, 16, axis=1)          # lane 16b+k -> dc[b]
        blk = jnp.where(sm | ~is_dc, yd, dc_expand)
        recon = jnp.clip(pred_b + ET.idct(blk), 0, 255)
        return co, y2q, recon

    def chroma(orig_b, pred_b, qs):
        uv_dc, uv_ac = qs[4], qs[5]
        co = ET.quantize(ET.fdct(orig_b - pred_b), uv_dc, uv_ac)
        recon = jnp.clip(pred_b + ET.idct(ET.dequantize(co, uv_dc, uv_ac)),
                         0, 255)
        return co, recon

    def f(oy_t, ou_t, ov_t, ry, ru, rv, refsel, sub_mv, uv_mv, splitmv, qs):
        # orig tiles arrive uint8; widen on device (4x less H2D)
        oy_t = oy_t.astype(jnp.int32)
        ou_t = ou_t.astype(jnp.int32)
        ov_t = ov_t.astype(jnp.int32)
        pred_y = sixtap.predict_mb_tiles(ry, refsel, sub_mv, 16)
        pred_u = sixtap.predict_mb_tiles(ru, refsel, uv_mv, 8)
        pred_v = sixtap.predict_mb_tiles(rv, refsel, uv_mv, 8)

        co_y, y2q, rec_y = luma(_tiles_to_blocks(oy_t, 16),
                                _tiles_to_blocks(pred_y, 16), splitmv, qs)
        co_u, rec_u = chroma(_tiles_to_blocks(ou_t, 8),
                             _tiles_to_blocks(pred_u, 8), qs)
        co_v, rec_v = chroma(_tiles_to_blocks(ov_t, 8),
                             _tiles_to_blocks(pred_v, 8), qs)

        coeffs = jnp.concatenate([co_y, co_u, co_v, y2q], axis=1)  # (n, 400)
        nz = jnp.any(coeffs != 0, axis=1)
        coeffs = coeffs.astype(jnp.int16)
        from . import device_fetch as DF
        sp = (DF.compact(coeffs.reshape(-1), DF.cap_for(R * C * 400))
              if DF.enabled() else None)
        return (coeffs, sp, nz,
                _blocks_to_tiles(rec_y, R, C, 16).astype(jnp.uint8),
                _blocks_to_tiles(rec_u, R, C, 8).astype(jnp.uint8),
                _blocks_to_tiles(rec_v, R, C, 8).astype(jnp.uint8))

    return f


def _fn(R, C):
    from . import device_fetch
    key = (R, C, device_fetch.enabled())
    if key in _FN_CACHE:
        return _FN_CACHE[key]
    fn = jax.jit(_fn_core(R, C))
    _FN_CACHE[key] = fn
    return fn


def apply_inter_residues_device(orig, recon, arrays, q, references):
    """Fill coeffs/has_nonzero/y2_coded and the reconstruction for every
    inter MB on device; intra positions are left for the host loop."""
    oy, ou, ov = orig
    R, C = arrays.mb_rows, arrays.mb_cols

    def tiles(plane, S):
        return jnp.asarray(np.ascontiguousarray(
            plane.reshape(R, S, C, S).transpose(0, 2, 1, 3)))

    refs = references
    ry = jnp.asarray(np.stack([refs.last.y, refs.last.y, refs.golden.y,
                               refs.alternative.y]))
    ru = jnp.asarray(np.stack([refs.last.u, refs.last.u, refs.golden.u,
                               refs.alternative.u]))
    rv = jnp.asarray(np.stack([refs.last.v, refs.last.v, refs.golden.v,
                               refs.alternative.v]))
    splitmv = (arrays.ymode == T.SPLITMV) & (arrays.ref != T.CURRENT_FRAME)
    qs = np.array([q["y_dc"], q["y_ac"], q["y2_dc"], q["y2_ac"],
                   q["uv_dc"], q["uv_ac"], 0, 0], np.int32)

    co, sp, nz, rec_y, rec_u, rec_v = _fn(R, C)(
        tiles(oy, 16), tiles(ou, 8), tiles(ov, 8), ry, ru, rv,
        jnp.asarray(arrays.ref.astype(np.int32)),
        jnp.asarray(arrays.sub_mv.astype(np.int32)),
        jnp.asarray(arrays.uv_mv.astype(np.int32)),
        jnp.asarray(splitmv), jnp.asarray(qs))

    from . import device_fetch
    if sp is not None:
        co = device_fetch.rebuild(sp, co, R * C * 400).reshape(R, C, 25, 16)
    else:
        co = np.asarray(co).reshape(R, C, 25, 16)
    nz = np.asarray(nz).reshape(R, C)
    rec_y = np.asarray(rec_y)
    rec_u = np.asarray(rec_u)
    rec_v = np.asarray(rec_v)

    inter = np.asarray(arrays.ref) != T.CURRENT_FRAME
    arrays.coeffs[inter] = co[inter]
    arrays.has_nonzero[inter] = nz[inter]
    arrays.y2_coded[inter] = ~np.asarray(splitmv)[inter]
    # scatter reconstructed tiles into the raster
    for plane, rec, S in ((recon.y, rec_y, 16), (recon.u, rec_u, 8),
                          (recon.v, rec_v, 8)):
        pr = plane.reshape(R, S, C, S)
        for r, c in zip(*np.nonzero(inter)):
            pr[r, :, c, :] = rec[r, c]
    return inter
