"""Scalar (numpy) frame reconstruction: FrameArrays -> raster.

Bit-exact mirror of the reference pixel pipeline, used as the correctness
oracle for the JAX/Pallas device path (alfalfa_tpu/ops):
- intra prediction: prediction.cc:99-643 (127/129 edge rules, all 10 b-modes)
- inter prediction: sixtap subpel, prediction.cc:645-975
- transforms: iDCT4x4/iWHT with int16 intermediates, transform.cc:47-137
- loop filter: normal filter, loopfilter.cc + loopfilter_filters.hh:58-273
"""
import numpy as np

from alfalfa_tpu.bitstream import tables as T
from alfalfa_tpu.state.decoder_state import Raster

SIXTAP = np.array([
    [0, 0, 128, 0, 0, 0],
    [0, -6, 123, 12, -1, 0],
    [2, -11, 108, 36, -8, 1],
    [0, -9, 93, 50, -6, 0],
    [3, -16, 77, 77, -16, 3],
    [0, -6, 50, 93, -9, 0],
    [1, -8, 36, 108, -11, 2],
    [0, -1, 12, 123, -6, 0]], np.int32)


def clamp255(x):
    return np.clip(x, 0, 255)


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------

def dequantize(coeffs16, dc_factor, ac_factor):
    """int16-wrapping dequantization (quantization.cc:95-126)."""
    factors = np.full(16, ac_factor, np.int32)
    factors[0] = dc_factor
    return (coeffs16.astype(np.int32) * factors).astype(np.int16)


def iwht(y2_coeffs):
    """Inverse Walsh-Hadamard: 16 Y2 coefficients -> 4x4 DC terms
    (transform.cc:47-88). Input raster order int16[16]; returns int16(4,4)."""
    c = y2_coeffs.astype(np.int32).reshape(4, 4)
    a1 = c[0] + c[3]
    b1 = c[1] + c[2]
    c1 = c[1] - c[2]
    d1 = c[0] - c[3]
    inter = np.empty((4, 4), np.int16)
    inter[0] = a1 + b1
    inter[1] = c1 + d1
    inter[2] = a1 - b1
    inter[3] = d1 - c1
    i = inter.astype(np.int32)
    a1 = i[:, 0] + i[:, 3]
    b1 = i[:, 1] + i[:, 2]
    c1 = i[:, 1] - i[:, 2]
    d1 = i[:, 0] - i[:, 3]
    out = np.empty((4, 4), np.int16)
    out[:, 0] = (a1 + b1 + 3) >> 3
    out[:, 1] = (c1 + d1 + 3) >> 3
    out[:, 2] = (a1 - b1 + 3) >> 3
    out[:, 3] = (d1 - c1 + 3) >> 3
    return out


def _mul_20091(a):
    return ((a * 20091) >> 16) + a


def _mul_35468(a):
    return (a * 35468) >> 16


def idct_add(coeffs16, target4x4):
    """4x4 inverse DCT + add into the raster block (transform.cc:100-137).
    Intermediates are stored as int16 exactly like the reference."""
    from alfalfa_tpu.native import enckernel
    if enckernel.available():
        enckernel.idct_add(coeffs16, target4x4)
        return
    c = coeffs16.astype(np.int32).reshape(4, 4)
    # first pass: over columns, intermediate transposed, stored int16
    t0 = c[0] + c[2]
    t1 = c[0] - c[2]
    t2 = _mul_35468(c[1]) - _mul_20091(c[3])
    t3 = _mul_20091(c[1]) + _mul_35468(c[3])
    inter = np.empty((4, 4), np.int16)
    inter[:, 0] = t0 + t3
    inter[:, 1] = t1 + t2
    inter[:, 2] = t1 - t2
    inter[:, 3] = t0 - t3
    i = inter.astype(np.int32)
    t0 = i[0] + i[2]
    t1 = i[0] - i[2]
    t2 = _mul_35468(i[1]) - _mul_20091(i[3])
    t3 = _mul_20091(i[1]) + _mul_35468(i[3])
    rows = np.stack([(t0 + t3 + 4) >> 3,
                     (t1 + t2 + 4) >> 3,
                     (t1 - t2 + 4) >> 3,
                     (t0 - t3 + 4) >> 3], axis=1)
    target4x4[:] = clamp255(target4x4.astype(np.int32) + rows).astype(np.uint8)


# ---------------------------------------------------------------------------
# intra prediction
# ---------------------------------------------------------------------------

def _predictors(plane, col, row, size):
    """above[-1..2*size-1] and left[0..size-1] with VP8 edge rules
    (prediction.cc:99-167). Returns (above_ext, left) where above_ext[0] is
    the above-left pixel and above_ext[1:] is above[0..2*size-1]."""
    h, w = plane.shape
    left = np.full(size, 129, np.int32)
    if col > 0:
        left[:] = plane[row * size:row * size + size, col * size - 1]
    above = np.full(2 * size + 1, 127, np.int32)  # [0]=above-left
    if row > 0:
        above[1:size + 1] = plane[row * size - 1,
                                  col * size:col * size + size]
    if col > 0 and row > 0:
        above[0] = plane[row * size - 1, col * size - 1]
    elif row > 0:
        above[0] = 129

    if size != 4:
        return above, left

    # above-right for 4x4 subblocks (prediction.cc:141-163)
    if row == 0:
        above[size + 1:] = 127
    elif size * (col + 1) >= w:
        if row >= 4:
            above[size + 1:] = plane[(row // 4) * 4 * size - 1, size * (col + 1) - 1]
        else:
            above[size + 1:] = 127
    else:
        if col % 4 == 3 and row % 4 != 0:
            if row >= 4:
                above[size + 1:] = plane[(row // 4) * 4 * size - 1,
                                         size * (col + 1):size * (col + 1) + size]
            else:
                above[size + 1:] = 127
        else:
            above[size + 1:] = plane[row * size - 1,
                                     size * (col + 1):size * (col + 1) + size]
    return above, left


def intra_predict_mb(plane, col, row, size, mode):
    """Whole-block intra prediction for 16x16 (Y) or 8x8 (chroma) blocks."""
    above_ext, left = _predictors(plane, col, row, size)
    above = above_ext[1:size + 1]
    above_left = above_ext[0]
    out = plane[row * size:(row + 1) * size, col * size:(col + 1) * size]
    log2size = {4: 2, 8: 3, 16: 4}[size]

    if mode == T.DC_PRED:
        if col and row:
            value = (above.sum() + left.sum() + (1 << log2size)) >> (log2size + 1)
        elif row:
            value = (above.sum() + (1 << (log2size - 1))) >> log2size
        elif col:
            value = (left.sum() + (1 << (log2size - 1))) >> log2size
        else:
            value = 128
        out[:] = value
    elif mode == T.V_PRED:
        out[:] = above[np.newaxis, :]
    elif mode == T.H_PRED:
        out[:] = left[:, np.newaxis]
    elif mode == T.TM_PRED:
        out[:] = clamp255(left[:, np.newaxis] + above[np.newaxis, :] - above_left)
    else:
        raise ValueError(f"bad whole-block mode {mode}")


def _avg2(x, y):
    return (x + y + 1) >> 1


def _avg3(x, y, z):
    return (x + 2 * y + z + 2) >> 2


def intra_predict_b(plane, col4, row4, bmode):
    """4x4 subblock intra prediction (prediction.cc:479-643).
    col4/row4 are subblock coordinates within the frame plane."""
    above_ext, left = _predictors(plane, col4, row4, 4)
    a = above_ext[1:]       # above[0..7]
    al = above_ext[0]       # above[-1]
    out = plane[row4 * 4:row4 * 4 + 4, col4 * 4:col4 * 4 + 4]

    def east(i):
        return left[3 - i] if i <= 3 else (al if i == 4 else a[i - 5])

    m = bmode
    if m == T.B_DC_PRED:
        out[:] = (a[:4].sum() + left.sum() + 4) >> 3
    elif m == T.B_TM_PRED:
        out[:] = clamp255(left[:, np.newaxis] + a[np.newaxis, :4] - al)
    elif m == T.B_VE_PRED:
        vals = [_avg3(al, a[0], a[1]), _avg3(a[0], a[1], a[2]),
                _avg3(a[1], a[2], a[3]), _avg3(a[2], a[3], a[4])]
        out[:] = np.array(vals, np.int32)[np.newaxis, :]
    elif m == T.B_HE_PRED:
        vals = [_avg3(al, left[0], left[1]), _avg3(left[0], left[1], left[2]),
                _avg3(left[1], left[2], left[3]), _avg3(left[2], left[3], left[3])]
        out[:] = np.array(vals, np.int32)[:, np.newaxis]
    elif m == T.B_LD_PRED:
        v = [_avg3(a[k], a[k + 1], a[k + 2]) for k in range(6)]
        v.append(_avg3(a[6], a[7], a[7]))
        # v[k] corresponds to anti-diagonal k = x + y
        for y in range(4):
            for x in range(4):
                out[y, x] = v[x + y]
    elif m == T.B_RD_PRED:
        v = [_avg3(east(i), east(i + 1), east(i + 2)) for i in range(7)]
        # out[y][x] with x - y + 3 indexing into v
        for y in range(4):
            for x in range(4):
                out[y, x] = v[x - y + 3]
    elif m == T.B_VR_PRED:
        # mapping from prediction.cc:527-541 (output.at(column,row))
        out[3, 0] = _avg3(east(1), east(2), east(3))
        out[2, 0] = _avg3(east(2), east(3), east(4))
        out[3, 1] = out[1, 0] = _avg3(east(3), east(4), east(5))
        out[2, 1] = out[0, 0] = _avg2(east(4), east(5))
        out[3, 2] = out[1, 1] = _avg3(east(4), east(5), east(6))
        out[2, 2] = out[0, 1] = _avg2(east(5), east(6))
        out[3, 3] = out[1, 2] = _avg3(east(5), east(6), east(7))
        out[2, 3] = out[0, 2] = _avg2(east(6), east(7))
        out[1, 3] = _avg3(east(6), east(7), east(8))
        out[0, 3] = _avg2(east(7), east(8))
    elif m == T.B_VL_PRED:
        out[0, 0] = _avg2(a[0], a[1])
        out[1, 0] = _avg3(a[0], a[1], a[2])
        out[2, 0] = out[0, 1] = _avg2(a[1], a[2])
        out[1, 1] = out[3, 0] = _avg3(a[1], a[2], a[3])
        out[2, 1] = out[0, 2] = _avg2(a[2], a[3])
        out[3, 1] = out[1, 2] = _avg3(a[2], a[3], a[4])
        out[2, 2] = out[0, 3] = _avg2(a[3], a[4])
        out[3, 2] = out[1, 3] = _avg3(a[3], a[4], a[5])
        out[2, 3] = _avg3(a[4], a[5], a[6])
        out[3, 3] = _avg3(a[5], a[6], a[7])
    elif m == T.B_HD_PRED:
        out[3, 0] = _avg2(east(0), east(1))
        out[3, 1] = _avg3(east(0), east(1), east(2))
        out[2, 0] = out[3, 2] = _avg2(east(1), east(2))
        out[2, 1] = out[3, 3] = _avg3(east(1), east(2), east(3))
        out[2, 2] = out[1, 0] = _avg2(east(2), east(3))
        out[2, 3] = out[1, 1] = _avg3(east(2), east(3), east(4))
        out[1, 2] = out[0, 0] = _avg2(east(3), east(4))
        out[1, 3] = out[0, 1] = _avg3(east(3), east(4), east(5))
        out[0, 2] = _avg3(east(4), east(5), east(6))
        out[0, 3] = _avg3(east(5), east(6), east(7))
    elif m == T.B_HU_PRED:
        out[0, 0] = _avg2(left[0], left[1])
        out[0, 1] = _avg3(left[0], left[1], left[2])
        out[1, 0] = out[0, 2] = _avg2(left[1], left[2])
        out[1, 1] = out[0, 3] = _avg3(left[1], left[2], left[3])
        out[1, 2] = out[2, 0] = _avg2(left[2], left[3])
        out[1, 3] = out[2, 1] = _avg3(left[2], left[3], left[3])
        out[2, 2] = out[2, 3] = out[3, 0] = out[3, 1] = out[3, 2] = out[3, 3] \
            = left[3]
    else:
        raise ValueError(f"bad b-mode {m}")


# ---------------------------------------------------------------------------
# inter prediction (sixtap)
# ---------------------------------------------------------------------------

def inter_predict(ref_plane, dst_plane, col, row, size, mv):
    """Motion-compensated prediction of one size x size block
    (prediction.cc:655-975).  Reads are clamped to the padded plane."""
    mx, my = mv[0] & 7, mv[1] & 7
    src_col = col * size + (mv[0] >> 3)
    src_row = row * size + (mv[1] >> 3)
    h, w = ref_plane.shape
    out = dst_plane[row * size:(row + 1) * size, col * size:(col + 1) * size]

    if mx == 0 and my == 0:
        rr = np.clip(np.arange(src_row, src_row + size), 0, h - 1)
        cc = np.clip(np.arange(src_col, src_col + size), 0, w - 1)
        out[:] = ref_plane[np.ix_(rr, cc)]
        return

    # horizontal six-tap into (size+5)-row intermediate, then vertical
    hf = SIXTAP[mx]
    rows = np.clip(np.arange(src_row - 2, src_row + size + 3), 0, h - 1)
    cols = np.clip(np.arange(src_col - 2, src_col + size + 3), 0, w - 1)
    patch = ref_plane[np.ix_(rows, cols)].astype(np.int32)  # (size+5, size+5)

    inter = np.zeros((size + 5, size), np.int32)
    for k in range(6):
        inter += patch[:, k:k + size] * hf[k]
    inter = clamp255((inter + 64) >> 7)

    vf = SIXTAP[my]
    acc = np.zeros((size, size), np.int32)
    for k in range(6):
        acc += inter[k:k + size] * vf[k]
    out[:] = clamp255((acc + 64) >> 7).astype(np.uint8)


# ---------------------------------------------------------------------------
# loop filter
# ---------------------------------------------------------------------------

def _s8(x):
    """Emulate signed-char wrapping (value ^ 0x80 trick domain)."""
    return ((x + 128) & 0xFF) - 128


def _c(x):
    return np.clip(x, -128, 127)


def _filter_common(p1, p0, q0, q1, mask, hev):
    """vp8_filter (loopfilter_filters.hh:85-131). All args int32 arrays in
    [-128,127] (already ^0x80). Returns new (p1, p0, q0, q1)."""
    fv = _c(p1 - q1)
    fv = np.where(hev, fv, 0)
    fv = _c(fv + 3 * (q0 - p0))
    fv = np.where(mask, fv, 0)

    f1 = _c(fv + 4) >> 3
    f2 = _c(fv + 3) >> 3
    new_q0 = _c(q0 - f1)
    new_p0 = _c(p0 + f2)

    fv2 = (f1 + 1) >> 1
    fv2 = np.where(hev, 0, fv2)
    new_q1 = _c(q1 - fv2)
    new_p1 = _c(p1 + fv2)
    return new_p1, new_p0, new_q0, new_q1


def _mbfilter(p2, p1, p0, q0, q1, q2, mask, hev):
    """vp8_mbfilter (loopfilter_filters.hh:133-186)."""
    fv = _c(_c(p1 - q1) + 3 * (q0 - p0))
    fv = np.where(mask, fv, 0)

    f2 = np.where(hev, fv, 0)
    f1 = _c(f2 + 4) >> 3
    f2 = _c(f2 + 3) >> 3
    q0 = _c(q0 - f1)
    p0 = _c(p0 + f2)

    w = np.where(hev, 0, fv)
    u = _c((63 + w * 27) >> 7)
    q0, p0 = _c(q0 - u), _c(p0 + u)
    u = _c((63 + w * 18) >> 7)
    q1, p1 = _c(q1 - u), _c(p1 + u)
    u = _c((63 + w * 9) >> 7)
    q2, p2 = _c(q2 - u), _c(p2 + u)
    return p2, p1, p0, q0, q1, q2


def _filter_mask(limit, blimit, p3, p2, p1, p0, q0, q1, q2, q3):
    m = ((np.abs(p3 - p2) > limit) | (np.abs(p2 - p1) > limit)
         | (np.abs(p1 - p0) > limit) | (np.abs(q1 - q0) > limit)
         | (np.abs(q2 - q1) > limit) | (np.abs(q3 - q2) > limit)
         | (np.abs(p0 - q0) * 2 + np.abs(p1 - q1) // 2 > blimit))
    return ~m


def _hevmask(thresh, p1, p0, q0, q1):
    return (np.abs(p1 - p0) > thresh) | (np.abs(q1 - q0) > thresh)


class LoopFilterParams:
    """Per-MB filter limits (loopfilter.cc:82-128)."""

    def __init__(self, filter_level, sharpness, key_frame):
        filter_level = int(np.clip(filter_level, 0, 63))
        self.filter_level = filter_level
        interior = filter_level
        if sharpness:
            interior >>= 2 if sharpness > 4 else 1
            interior = min(interior, 9 - sharpness)
        interior = max(interior, 1)
        self.interior_limit = interior
        self.mb_edge_limit = (filter_level + 2) * 2 + interior
        self.sb_edge_limit = filter_level * 2 + interior
        hev = 1 if filter_level >= 15 else 0
        if filter_level >= 40:
            hev += 1
        if filter_level >= 20 and not key_frame:
            hev += 1
        self.hev_threshold = hev


def _filter_edge_cols(plane, rows, center_col, limit, blimit, thresh, mb_edge):
    """Filter a vertical edge at x=center_col for the given rows."""
    g = plane[rows, :].astype(np.int32)
    x = center_col
    p = [g[:, x - 4 + i] for i in range(4)]  # p3..p0
    q = [g[:, x + i] for i in range(4)]      # q0..q3
    mask = _filter_mask(limit, blimit, p[0], p[1], p[2], p[3], q[0], q[1], q[2], q[3])
    hev = _hevmask(thresh, p[2], p[3], q[0], q[1])
    sp = [_s8(v - 128) for v in p]
    sq = [_s8(v - 128) for v in q]
    if mb_edge:
        p2, p1, p0, q0, q1, q2 = _mbfilter(sp[1], sp[2], sp[3], sq[0], sq[1], sq[2],
                                           mask, hev)
        plane[rows, x - 3] = (p2 + 128).astype(np.uint8)
        plane[rows, x - 2] = (p1 + 128).astype(np.uint8)
        plane[rows, x - 1] = (p0 + 128).astype(np.uint8)
        plane[rows, x + 0] = (q0 + 128).astype(np.uint8)
        plane[rows, x + 1] = (q1 + 128).astype(np.uint8)
        plane[rows, x + 2] = (q2 + 128).astype(np.uint8)
    else:
        p1, p0, q0, q1 = _filter_common(sp[2], sp[3], sq[0], sq[1], mask, hev)
        plane[rows, x - 2] = (p1 + 128).astype(np.uint8)
        plane[rows, x - 1] = (p0 + 128).astype(np.uint8)
        plane[rows, x + 0] = (q0 + 128).astype(np.uint8)
        plane[rows, x + 1] = (q1 + 128).astype(np.uint8)


def _filter_edge_rows(plane, cols, center_row, limit, blimit, thresh, mb_edge):
    g = plane[:, cols].astype(np.int32)
    y = center_row
    p = [g[y - 4 + i, :] for i in range(4)]
    q = [g[y + i, :] for i in range(4)]
    mask = _filter_mask(limit, blimit, p[0], p[1], p[2], p[3], q[0], q[1], q[2], q[3])
    hev = _hevmask(thresh, p[2], p[3], q[0], q[1])
    sp = [_s8(v - 128) for v in p]
    sq = [_s8(v - 128) for v in q]
    if mb_edge:
        p2, p1, p0, q0, q1, q2 = _mbfilter(sp[1], sp[2], sp[3], sq[0], sq[1], sq[2],
                                           mask, hev)
        plane[y - 3, cols] = (p2 + 128).astype(np.uint8)
        plane[y - 2, cols] = (p1 + 128).astype(np.uint8)
        plane[y - 1, cols] = (p0 + 128).astype(np.uint8)
        plane[y + 0, cols] = (q0 + 128).astype(np.uint8)
        plane[y + 1, cols] = (q1 + 128).astype(np.uint8)
        plane[y + 2, cols] = (q2 + 128).astype(np.uint8)
    else:
        p1, p0, q0, q1 = _filter_common(sp[2], sp[3], sq[0], sq[1], mask, hev)
        plane[y - 2, cols] = (p1 + 128).astype(np.uint8)
        plane[y - 1, cols] = (p0 + 128).astype(np.uint8)
        plane[y + 0, cols] = (q0 + 128).astype(np.uint8)
        plane[y + 1, cols] = (q1 + 128).astype(np.uint8)


def loopfilter_mb(raster, r, c, params, skip_subblock_edges):
    """Filter one macroblock in the reference's 4-pass order
    (loopfilter.cc:133-154)."""
    lp = params
    planes = ((raster.y, 16), (raster.u, 8), (raster.v, 8))

    # 1: left MB edge (vertical)
    if c > 0:
        for plane, size in planes:
            rows = np.arange(r * size, (r + 1) * size)
            _filter_edge_cols(plane, rows, c * size, lp.interior_limit,
                              lp.mb_edge_limit, lp.hev_threshold, True)
    # 2: vertical subblock edges
    if not skip_subblock_edges:
        for plane, size in planes:
            rows = np.arange(r * size, (r + 1) * size)
            for off in range(4, size, 4):
                _filter_edge_cols(plane, rows, c * size + off, lp.interior_limit,
                                  lp.sb_edge_limit, lp.hev_threshold, False)
    # 3: top MB edge (horizontal)
    if r > 0:
        for plane, size in planes:
            cols = np.arange(c * size, (c + 1) * size)
            _filter_edge_rows(plane, cols, r * size, lp.interior_limit,
                              lp.mb_edge_limit, lp.hev_threshold, True)
    # 4: horizontal subblock edges
    if not skip_subblock_edges:
        for plane, size in planes:
            cols = np.arange(c * size, (c + 1) * size)
            for off in range(4, size, 4):
                _filter_edge_rows(plane, cols, r * size + off, lp.interior_limit,
                                  lp.sb_edge_limit, lp.hev_threshold, False)


def _mode_adjustment(mode_adjustments, ref, ymode):
    """loopfilter.cc:57-70"""
    if ref == T.CURRENT_FRAME:
        return mode_adjustments[0] if ymode == T.B_PRED else 0
    if ymode == T.ZEROMV:
        return mode_adjustments[1]
    if ymode == T.SPLITMV:
        return mode_adjustments[3]
    return mode_adjustments[2]


# ---------------------------------------------------------------------------
# frame reconstruction
# ---------------------------------------------------------------------------

def reconstruct(header, arrays, state, references, key_frame):
    """Full reconstruction of one frame: prediction + residues + loop filter.
    Returns a new Raster. (KeyFrame/InterFrame::decode + Frame::loopfilter,
    frame.cc:208-250, 139-182.)"""
    raster = Raster(state.width, state.height)
    for ref in (references.last, references.golden, references.alternative):
        ref.to_host()
    seg = state.segmentation

    # per-segment quantizers (frame.cc:186-205)
    if seg is not None:
        quantizers = [header.quant_indices.quantizer(int(seg.quantizer_adjustments[i]),
                                                     seg.absolute)
                      for i in range(4)]
    else:
        fq = header.quant_indices.quantizer()
        quantizers = [fq] * 4

    for r in range(arrays.mb_rows):
        for c in range(arrays.mb_cols):
            q = quantizers[arrays.segment[r, c]] if seg is not None else quantizers[0]
            if not key_frame and arrays.ref[r, c] != T.CURRENT_FRAME:
                _reconstruct_inter_mb(arrays, raster, references, r, c, q)
            else:
                _reconstruct_intra_mb(arrays, raster, r, c, q)

    _loopfilter_frame(header, arrays, state, raster, key_frame)
    return raster


def _dequant_y(arrays, r, c, q):
    return [dequantize(arrays.coeffs[r, c, i], q["y_dc"], q["y_ac"])
            for i in range(16)]


def _apply_walsh(arrays, raster, r, c, q):
    """Y2 iWHT -> DC terms -> per-subblock iDCT-add (macroblock.cc:504-521)."""
    yd = _dequant_y(arrays, r, c, q)
    dc = iwht(dequantize(arrays.coeffs[r, c, 24], q["y2_dc"], q["y2_ac"]))
    for sr in range(4):
        for sc in range(4):
            blk = yd[sr * 4 + sc].copy()
            blk[0] = dc[sr, sc]
            idct_add(blk, raster.y[r * 16 + sr * 4:r * 16 + sr * 4 + 4,
                                   c * 16 + sc * 4:c * 16 + sc * 4 + 4])


def _reconstruct_intra_mb(arrays, raster, r, c, q):
    """macroblock.cc:523-551"""
    has_nonzero = arrays.has_nonzero[r, c]
    uvmode = arrays.uvmode[r, c]

    # chroma
    intra_predict_mb(raster.u, c, r, 8, uvmode)
    intra_predict_mb(raster.v, c, r, 8, uvmode)
    if has_nonzero:
        for plane, base in ((raster.u, 16), (raster.v, 20)):
            for sr in range(2):
                for sc in range(2):
                    dq = dequantize(arrays.coeffs[r, c, base + sr * 2 + sc],
                                    q["uv_dc"], q["uv_ac"])
                    idct_add(dq, plane[r * 8 + sr * 4:r * 8 + sr * 4 + 4,
                                       c * 8 + sc * 4:c * 8 + sc * 4 + 4])

    # luma
    if arrays.ymode[r, c] == T.B_PRED:
        for sr in range(4):
            for sc in range(4):
                intra_predict_b(raster.y, c * 4 + sc, r * 4 + sr,
                                arrays.bmode[r, c, sr, sc])
                if has_nonzero:
                    dq = dequantize(arrays.coeffs[r, c, sr * 4 + sc],
                                    q["y_dc"], q["y_ac"])
                    idct_add(dq, raster.y[r * 16 + sr * 4:r * 16 + sr * 4 + 4,
                                          c * 16 + sc * 4:c * 16 + sc * 4 + 4])
    else:
        intra_predict_mb(raster.y, c, r, 16, arrays.ymode[r, c])
        if has_nonzero:
            _apply_walsh(arrays, raster, r, c, q)


def _reconstruct_inter_mb(arrays, raster, references, r, c, q):
    """macroblock.cc:553-601"""
    ref = references.at(int(arrays.ref[r, c]))
    has_nonzero = arrays.has_nonzero[r, c]
    splitmv = arrays.ymode[r, c] == T.SPLITMV

    if splitmv:
        for sr in range(4):
            for sc in range(4):
                inter_predict(ref.y, raster.y, c * 4 + sc, r * 4 + sr, 4,
                              tuple(arrays.sub_mv[r, c, sr, sc]))
        for sr in range(2):
            for sc in range(2):
                mv = tuple(arrays.uv_mv[r, c, sr, sc])
                inter_predict(ref.u, raster.u, c * 2 + sc, r * 2 + sr, 4, mv)
                inter_predict(ref.v, raster.v, c * 2 + sc, r * 2 + sr, 4, mv)
        if has_nonzero:
            for sr in range(4):
                for sc in range(4):
                    dq = dequantize(arrays.coeffs[r, c, sr * 4 + sc],
                                    q["y_dc"], q["y_ac"])
                    idct_add(dq, raster.y[r * 16 + sr * 4:r * 16 + sr * 4 + 4,
                                          c * 16 + sc * 4:c * 16 + sc * 4 + 4])
            _add_uv_residues(arrays, raster, r, c, q)
    else:
        base_mv = tuple(arrays.sub_mv[r, c, 3, 3])
        inter_predict(ref.y, raster.y, c, r, 16, base_mv)
        uv = tuple(arrays.uv_mv[r, c, 0, 0])
        inter_predict(ref.u, raster.u, c, r, 8, uv)
        inter_predict(ref.v, raster.v, c, r, 8, uv)
        if has_nonzero:
            _apply_walsh(arrays, raster, r, c, q)
            _add_uv_residues(arrays, raster, r, c, q)


def _add_uv_residues(arrays, raster, r, c, q):
    for plane, base in ((raster.u, 16), (raster.v, 20)):
        for sr in range(2):
            for sc in range(2):
                dq = dequantize(arrays.coeffs[r, c, base + sr * 2 + sc],
                                q["uv_dc"], q["uv_ac"])
                idct_add(dq, plane[r * 8 + sr * 4:r * 8 + sr * 4 + 4,
                                   c * 8 + sc * 4:c * 8 + sc * 4 + 4])


def _loopfilter_frame(header, arrays, state, raster, key_frame):
    """frame.cc:139-182 + macroblock.cc:603-650"""
    if not header.loop_filter_level:
        return

    # native path: same scalar kernels in C (native/lfkernel.cc)
    from alfalfa_tpu.native import lfkernel
    if lfkernel.available():
        from alfalfa_tpu.decoder.lf_params import frame_lf_params
        (level, interior, mb_limit, sb_limit, hev,
         skip_sb) = frame_lf_params(header, arrays, state, key_frame)
        lfkernel.loopfilter_frame(raster.y, raster.u, raster.v, level,
                                  interior, mb_limit, sb_limit, hev, skip_sb)
        return

    seg = state.segmentation
    fa = state.filter_adjustments

    for r in range(arrays.mb_rows):
        for c in range(arrays.mb_cols):
            if seg is not None:
                level = int(seg.filter_adjustments[arrays.segment[r, c]]) + \
                    (0 if seg.absolute else header.loop_filter_level)
            else:
                level = header.loop_filter_level

            if fa is not None:
                ref = int(arrays.ref[r, c])
                ymode = int(arrays.ymode[r, c])
                level += int(fa.ref_adjustments[ref]) + \
                    _mode_adjustment(fa.mode_adjustments, ref, ymode)

            if level <= 0:
                continue
            params = LoopFilterParams(level, header.sharpness_level, key_frame)
            if params.filter_level <= 0:
                continue
            skip_sb = bool(arrays.y2_coded[r, c]) and not bool(arrays.has_nonzero[r, c])
            loopfilter_mb(raster, r, c, params, skip_sb)
