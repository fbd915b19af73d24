"""Batched intra prediction (JAX), tile-local formulation.

The reference predicts from the frame raster with 127/129 edge rules
(prediction.cc:99-167, 383-643).  Here each macroblock is processed from a
small context: ``e`` = extended above row [above-left, above x size,
above-right x 4] and ``lcol`` = left column, both pre-substituted with the
edge constants, so subblock extraction needs no frame-level branches.

All functions are written for vmap over a batch of macroblocks.
"""
import jax
import jax.numpy as jnp

from alfalfa_tpu.bitstream import tables as T


def _avg2(x, y):
    return (x + y + 1) >> 1


def _avg3(x, y, z):
    return (x + 2 * y + z + 2) >> 2


def whole_block_predict(e, lcol, has_row, has_col, mode, size):
    """16x16 or 8x8 prediction, all four modes computed and selected.

    e: (size+1,) or longer — e[0]=above-left, e[1:size+1]=above.
    lcol: (size,). has_row/has_col: bool scalars. mode: int scalar.
    Returns (size, size) int32."""
    above = e[1:size + 1]
    left = lcol
    al = e[0]
    log2 = {4: 2, 8: 3, 16: 4}[size]

    dc_both = (above.sum() + left.sum() + (1 << log2)) >> (log2 + 1)
    dc_row = (above.sum() + (1 << (log2 - 1))) >> log2
    dc_col = (left.sum() + (1 << (log2 - 1))) >> log2
    dc = jnp.where(has_row & has_col, dc_both,
                   jnp.where(has_row, dc_row,
                             jnp.where(has_col, dc_col, 128)))
    dc_pred = jnp.full((size, size), dc, jnp.int32)
    v_pred = jnp.broadcast_to(above[None, :], (size, size))
    h_pred = jnp.broadcast_to(left[:, None], (size, size))
    tm_pred = jnp.clip(left[:, None] + above[None, :] - al, 0, 255)

    preds = jnp.stack([dc_pred, v_pred, h_pred, tm_pred])
    return preds[jnp.clip(mode, 0, 3)]


def subblock_predict_all(above4, left4, al, ar4):
    """All ten 4x4 b-mode predictions: returns (10, 4, 4) int32.

    above4/left4/ar4: (4,) int32; al scalar.  Order matches the bmode enum.
    """
    a = jnp.concatenate([above4, ar4])  # a[0..7]
    left = left4
    east = jnp.concatenate([left4[::-1], jnp.array([al]), a])  # east(i) = east[i]

    dc = jnp.full((4, 4), (a[:4].sum() + left.sum() + 4) >> 3, jnp.int32)
    tm = jnp.clip(left[:, None] + a[None, :4] - al, 0, 255)
    ve = jnp.broadcast_to(jnp.stack([
        _avg3(al, a[0], a[1]), _avg3(a[0], a[1], a[2]),
        _avg3(a[1], a[2], a[3]), _avg3(a[2], a[3], a[4])])[None, :], (4, 4))
    he = jnp.broadcast_to(jnp.stack([
        _avg3(al, left[0], left[1]), _avg3(left[0], left[1], left[2]),
        _avg3(left[1], left[2], left[3]), _avg3(left[2], left[3], left[3])])[:, None],
        (4, 4))

    # B_LD: anti-diagonals of smoothed above
    ld_v = jnp.stack([_avg3(a[k], a[k + 1], a[k + 2]) for k in range(6)]
                     + [_avg3(a[6], a[7], a[7])])
    yy, xx = jnp.mgrid[0:4, 0:4]
    ld = ld_v[xx + yy]

    # B_RD: diagonals of east
    rd_v = jnp.stack([_avg3(east[k], east[k + 1], east[k + 2]) for k in range(7)])
    rd = rd_v[xx - yy + 3]

    # diagonal modes built from smoothed vectors by gather, with the handful
    # of avg2 cells overlaid via static index maps (cheaper graphs than
    # per-cell scatters)
    e = east
    vr3 = jnp.stack([_avg3(e[k + 1], e[k + 2], e[k + 3]) for k in range(6)])
    vr2 = jnp.stack([_avg2(e[k + 4], e[k + 5]) for k in range(5)])
    # row-major cell map for B_VR: (vector, index) pairs
    vr = jnp.stack([vr2[0], vr2[1], vr2[2], vr2[3],
                    vr3[2], vr3[3], vr3[4], vr3[5],
                    vr3[1], vr2[0], vr2[1], vr2[2],
                    vr3[0], vr3[2], vr3[3], vr3[4]]).reshape(4, 4)

    vl2 = jnp.stack([_avg2(a[k], a[k + 1]) for k in range(4)])
    vl3 = jnp.stack([_avg3(a[k], a[k + 1], a[k + 2]) for k in range(6)])
    vl = jnp.stack([vl2[0], vl2[1], vl2[2], vl2[3],
                    vl3[0], vl3[1], vl3[2], vl3[3],
                    vl2[1], vl2[2], vl2[3], vl3[4],
                    vl3[1], vl3[2], vl3[3], vl3[5]]).reshape(4, 4)

    hd2 = jnp.stack([_avg2(e[k], e[k + 1]) for k in range(5)])
    hd3 = jnp.stack([_avg3(e[k], e[k + 1], e[k + 2]) for k in range(6)])
    hd = jnp.stack([hd2[3], hd3[3], hd3[4], hd3[5],
                    hd2[2], hd3[2], hd2[3], hd3[3],
                    hd2[1], hd3[1], hd2[2], hd3[2],
                    hd2[0], hd3[0], hd2[1], hd3[1]]).reshape(4, 4)

    l = left
    hu = jnp.stack([_avg2(l[0], l[1]), _avg3(l[0], l[1], l[2]),
                    _avg2(l[1], l[2]), _avg3(l[1], l[2], l[3]),
                    _avg2(l[1], l[2]), _avg3(l[1], l[2], l[3]),
                    _avg2(l[2], l[3]), _avg3(l[2], l[3], l[3]),
                    _avg2(l[2], l[3]), _avg3(l[2], l[3], l[3]),
                    l[3], l[3],
                    l[3], l[3], l[3], l[3]]).reshape(4, 4)

    return jnp.stack([dc, tm, ve, he, ld, rd, vr, vl, hd, hu])


def bpred_tile(e21, lcol16, bmodes, residuals, apply_residue):
    """Reconstruct one B_PRED macroblock: sequential 4x4 subblocks with
    inline residual add (macroblock.cc:539-544).

    e21: (21,), lcol16: (16,), bmodes: (4, 4) int, residuals: (16, 4, 4)
    int32, apply_residue: bool scalar (the MB's has_nonzero).
    Returns (16, 16) int32 tile."""
    tile = jnp.zeros((16, 16), jnp.int32)
    for sr in range(4):
        for sc in range(4):
            above4 = (tile[sr * 4 - 1, sc * 4:sc * 4 + 4] if sr > 0
                      else e21[1 + sc * 4:1 + sc * 4 + 4])
            left4 = (tile[sr * 4:sr * 4 + 4, sc * 4 - 1] if sc > 0
                     else lcol16[sr * 4:sr * 4 + 4])
            if sr == 0:
                al = e21[sc * 4] if sc > 0 else e21[0]
            else:
                al = tile[sr * 4 - 1, sc * 4 - 1] if sc > 0 else lcol16[sr * 4 - 1]
            if sr == 0:
                ar4 = e21[1 + (sc + 1) * 4:1 + (sc + 1) * 4 + 4]
            elif sc < 3:
                ar4 = tile[sr * 4 - 1, (sc + 1) * 4:(sc + 1) * 4 + 4]
            else:
                ar4 = e21[17:21]

            preds = subblock_predict_all(above4, left4, al, ar4)
            pred = preds[jnp.clip(bmodes[sr, sc], 0, 9)]
            res = jnp.where(apply_residue, residuals[sr * 4 + sc], 0)
            block = jnp.clip(pred + res, 0, 255)
            tile = tile.at[sr * 4:sr * 4 + 4, sc * 4:sc * 4 + 4].set(block)
    return tile
