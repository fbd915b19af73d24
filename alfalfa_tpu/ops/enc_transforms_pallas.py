"""Lane-wise VP8 encoder transforms for Pallas kernels.

Each 4x4 block is 16 consecutive lanes in row-major order (lane = 4*y + x);
a whole luma macroblock is 16 blocks = 256 lanes.  Within-block data
movement is expressed as full-axis lane rolls + lane-position masks: every
roll a block needs stays inside its own 16-lane group at the positions the
masks keep, so all 16 blocks of an MB transform in one batched op sequence.

Arithmetic is bit-exact to encoder/transforms_np.py and
decoder/reconstruct_np.py (reference dct.cc:45-163, transform.cc:47-137,
quantization.cc:95-157), including the int16 wraps of stored
intermediates.
"""
import jax
import jax.numpy as jnp


def _roll(x, shift):
    """Static lane roll: jnp.roll lowers to two static slices + concat,
    which Mosaic supports, and it also runs outside Pallas (tests).
    shift 0 would produce an empty slice Mosaic rejects."""
    if shift % x.shape[1] == 0:
        return x
    return jnp.roll(x, shift, axis=1)


def w16(x):
    """Wrap to int16 range (stored-int16 intermediates)."""
    return ((x + 0x8000) & 0xFFFF) - 0x8000


def _lane_pos(n):
    li = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    return li % 4, (li % 16) // 4      # (col_id, row_id)


def fdct(d):
    """Forward 4x4 DCT over every 16-lane block of d (i32 (Rp, N) residual,
    N a multiple of 16).  transforms_np.subtract_fdct minus the subtract."""
    col_id, row_id = _lane_pos(d.shape[1])
    x0, x1, x2, x3 = d, _roll(d, -1), _roll(d, -2), _roll(d, -3)
    a1 = (x0 + x3) * 8
    b1 = (x1 + x2) * 8
    c1 = (x1 - x2) * 8
    d1 = (x0 - x3) * 8
    r0 = a1 + b1
    r2 = a1 - b1
    r1 = (c1 * 2217 + d1 * 5352 + 14500) >> 12
    r3 = (d1 * 2217 - c1 * 5352 + 7500) >> 12
    rows = jnp.where(col_id == 0, r0,
                     jnp.where(col_id == 1, _roll(r1, 1),
                               jnp.where(col_id == 2, _roll(r2, 2),
                                         _roll(r3, 3))))
    rows = w16(rows)

    y0, y1, y2, y3 = rows, _roll(rows, -4), _roll(rows, -8), _roll(rows, -12)
    a1 = y0 + y3
    b1 = y1 + y2
    c1 = y1 - y2
    d1 = y0 - y3
    o0 = (a1 + b1 + 7) >> 4
    o2 = (a1 - b1 + 7) >> 4
    o1 = ((c1 * 2217 + d1 * 5352 + 12000) >> 16) + (d1 != 0)
    o3 = (d1 * 2217 - c1 * 5352 + 51000) >> 16
    out = jnp.where(row_id == 0, o0,
                    jnp.where(row_id == 1, _roll(o1, 4),
                              jnp.where(row_id == 2, _roll(o2, 8),
                                        _roll(o3, 12))))
    return w16(out)


def idct(c):
    """Inverse 4x4 DCT over every 16-lane block (reconstruct_np.idct_add
    without the add/clamp); returns the spatial residual rows."""
    col_id, row_id = _lane_pos(c.shape[1])

    def m20091(a):
        return ((a * 20091) >> 16) + a

    def m35468(a):
        return (a * 35468) >> 16

    # pass 1 over columns: u_k = inter row k, valid at row-0 lanes
    y0, y1, y2, y3 = c, _roll(c, -4), _roll(c, -8), _roll(c, -12)
    t0 = y0 + y2
    t1 = y0 - y2
    t2 = m35468(y1) - m20091(y3)
    t3 = m20091(y1) + m35468(y3)
    u0 = w16(t0 + t3)
    u1 = w16(t1 + t2)
    u2 = w16(t1 - t2)
    u3 = w16(t0 - t3)
    # assemble the full inter block (same two-level select as iwht):
    # rolling row k's lanes 0..3 to lanes 4k..4k+3 makes every lane valid
    inter = jnp.where(row_id == 0, u0,
                      jnp.where(row_id == 1, _roll(u1, 4),
                                jnp.where(row_id == 2, _roll(u2, 8),
                                          _roll(u3, 12))))

    # pass 2 over rows of inter: p..s valid at col-0 lanes of each row
    p, q, r2_, s = (inter, _roll(inter, -1), _roll(inter, -2),
                    _roll(inter, -3))
    t0 = p + r2_
    t1 = p - r2_
    t2 = m35468(q) - m20091(s)
    t3 = m20091(q) + m35468(s)
    o0 = (t0 + t3 + 4) >> 3
    o1 = (t1 + t2 + 4) >> 3
    o2 = (t1 - t2 + 4) >> 3
    o3 = (t0 - t3 + 4) >> 3
    return jnp.where(col_id == 0, o0,
                     jnp.where(col_id == 1, _roll(o1, 1),
                               jnp.where(col_id == 2, _roll(o2, 2),
                                         _roll(o3, 3))))


def fwht(dc):
    """Forward Walsh-Hadamard over every 16-lane block (dct.cc:106-163)."""
    col_id, row_id = _lane_pos(dc.shape[1])
    x0, x1, x2, x3 = dc, _roll(dc, -1), _roll(dc, -2), _roll(dc, -3)
    a1 = (x0 + x2) * 4
    d1 = (x1 + x3) * 4
    c1 = (x1 - x3) * 4
    b1 = (x0 - x2) * 4
    r0 = a1 + d1 + (a1 != 0)
    r1 = b1 + c1
    r2 = b1 - c1
    r3 = a1 - d1
    rows = jnp.where(col_id == 0, r0,
                     jnp.where(col_id == 1, _roll(r1, 1),
                               jnp.where(col_id == 2, _roll(r2, 2),
                                         _roll(r3, 3))))
    rows = w16(rows)

    y0, y1, y2, y3 = rows, _roll(rows, -4), _roll(rows, -8), _roll(rows, -12)
    a1 = y0 + y2
    d1 = y1 + y3
    c1 = y1 - y3
    b1 = y0 - y2
    a2 = a1 + d1
    b2 = b1 + c1
    c2 = b1 - c1
    d2 = a1 - d1
    a2 = a2 + (a2 < 0)
    b2 = b2 + (b2 < 0)
    c2 = c2 + (c2 < 0)
    d2 = d2 + (d2 < 0)
    o0 = (a2 + 3) >> 3
    o1 = (b2 + 3) >> 3
    o2 = (c2 + 3) >> 3
    o3 = (d2 + 3) >> 3
    out = jnp.where(row_id == 0, o0,
                    jnp.where(row_id == 1, _roll(o1, 4),
                              jnp.where(row_id == 2, _roll(o2, 8),
                                        _roll(o3, 12))))
    return w16(out)


def iwht(c):
    """Inverse Walsh-Hadamard over every 16-lane block
    (transform.cc:47-88; reconstruct_np.iwht)."""
    col_id, row_id = _lane_pos(c.shape[1])
    # pass 1 over rows of c: c[k] = row k; inter[k] rows from row combos
    y0, y1, y2, y3 = c, _roll(c, -4), _roll(c, -8), _roll(c, -12)
    a1 = y0 + y3
    b1 = y1 + y2
    c1 = y1 - y2
    d1 = y0 - y3
    i0 = w16(a1 + b1)   # inter row 0, valid at row-0 lanes
    i1 = w16(c1 + d1)
    i2 = w16(a1 - b1)
    i3 = w16(d1 - c1)
    inter = jnp.where(row_id == 0, i0,
                      jnp.where(row_id == 1, _roll(i1, 4),
                                jnp.where(row_id == 2, _roll(i2, 8),
                                          _roll(i3, 12))))
    # pass 2 over columns of inter
    x0, x1, x2, x3 = (inter, _roll(inter, -1), _roll(inter, -2),
                      _roll(inter, -3))
    a1 = x0 + x3
    b1 = x1 + x2
    c1 = x1 - x2
    d1 = x0 - x3
    o0 = (a1 + b1 + 3) >> 3
    o1 = (c1 + d1 + 3) >> 3
    o2 = (a1 - b1 + 3) >> 3
    o3 = (d1 - c1 + 3) >> 3
    out = jnp.where(col_id == 0, o0,
                    jnp.where(col_id == 1, _roll(o1, 1),
                              jnp.where(col_id == 2, _roll(o2, 2),
                                        _roll(o3, 3))))
    return w16(out)


def quantize(c, dc_factor, ac_factor):
    """C-style truncating division per block (quantization.cc:149-157).
    dc_factor/ac_factor: scalars or (Rp, 1) arrays."""
    col_id, row_id = _lane_pos(c.shape[1])
    is_dc = (col_id == 0) & (row_id == 0)
    f = jnp.where(is_dc, dc_factor, ac_factor)
    a = jnp.abs(c)
    # exact integer floor-divide via f32 estimate + correction: operands
    # are small (|c| <= ~25k, f <= 300), one step suffices either way
    q = (a.astype(jnp.float32) * (1.0 / f.astype(jnp.float32))).astype(
        jnp.int32)
    q = jnp.where((q + 1) * f <= a, q + 1, q)
    q = jnp.where(q * f > a, q - 1, q)
    return jnp.where(c < 0, -q, q)


def dequantize(c, dc_factor, ac_factor):
    """int16-wrapping dequantization (quantization.cc:95-126)."""
    col_id, row_id = _lane_pos(c.shape[1])
    is_dc = (col_id == 0) & (row_id == 0)
    f = jnp.where(is_dc, dc_factor, ac_factor)
    return w16(c * f)
