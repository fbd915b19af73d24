"""Dense batched encoder math (JAX/XLA): forward DCT/WHT, quantization,
source-based intra screening — whole-frame shapes at full VPU width.

These are the data-parallel halves of interframe encoding once the
per-MB decisions are known (ops/enc_decide_pallas.py): given a mode/MV
field, prediction, residual transforms, quantization and reconstruction
have no cross-MB dependency, so they run as (R, C, ...) tensor ops that
XLA tiles onto the VPU/MXU — in contrast to the serial raster kernel
(ops/enc_inter_pallas.py) which does the same math one (1, 256) tile at
a time.

Bit-exactness: each function mirrors its host twin to the bit —
fdct_blocks/fwht_blocks/quantize_blocks follow encoder/transforms_np.py
(reference dct.cc:45-163, quantization.cc:149-157) including the int16
intermediate wraps; variance_blocks uses the same hi/lo split as the
kernels (int32-safe s*s/256).
"""
import jax
import jax.numpy as jnp


def _w16(x):
    """Wrap to the reference's int16 coefficient storage."""
    return x.astype(jnp.int16).astype(jnp.int32)


def fdct_blocks(diff):
    """Forward 4x4 DCT, batched: (..., 4, 4) int32 residual -> (..., 16)
    int32 (int16-wrapped) coefficients.  transforms_np.subtract_fdct
    minus the subtract (dct.cc:45-103)."""
    inp = diff.astype(jnp.int32)
    a1 = (inp[..., :, 0] + inp[..., :, 3]) * 8
    b1 = (inp[..., :, 1] + inp[..., :, 2]) * 8
    c1 = (inp[..., :, 1] - inp[..., :, 2]) * 8
    d1 = (inp[..., :, 0] - inp[..., :, 3]) * 8
    rows = jnp.stack([
        a1 + b1,
        (c1 * 2217 + d1 * 5352 + 14500) >> 12,
        a1 - b1,
        (d1 * 2217 - c1 * 5352 + 7500) >> 12,
    ], axis=-1)
    rows = _w16(rows)                                   # (..., row, 4)
    a1 = rows[..., 0, :] + rows[..., 3, :]
    b1 = rows[..., 1, :] + rows[..., 2, :]
    c1 = rows[..., 1, :] - rows[..., 2, :]
    d1 = rows[..., 0, :] - rows[..., 3, :]
    out = jnp.stack([
        (a1 + b1 + 7) >> 4,
        ((c1 * 2217 + d1 * 5352 + 12000) >> 16) + (d1 != 0),
        (a1 - b1 + 7) >> 4,
        (d1 * 2217 - c1 * 5352 + 51000) >> 16,
    ], axis=-2)                                         # (..., 4, 4)
    return _w16(out).reshape(out.shape[:-2] + (16,))


def fwht_blocks(dc16):
    """Forward Walsh-Hadamard, batched: (..., 16) int32 Y-block DCs ->
    (..., 16) int32 (int16-wrapped).  transforms_np.fwht
    (dct.cc:106-163)."""
    inp = dc16.astype(jnp.int32).reshape(dc16.shape[:-1] + (4, 4))
    a1 = (inp[..., :, 0] + inp[..., :, 2]) * 4
    d1 = (inp[..., :, 1] + inp[..., :, 3]) * 4
    c1 = (inp[..., :, 1] - inp[..., :, 3]) * 4
    b1 = (inp[..., :, 0] - inp[..., :, 2]) * 4
    rows = jnp.stack([
        a1 + d1 + (a1 != 0),
        b1 + c1,
        b1 - c1,
        a1 - d1,
    ], axis=-1)
    rows = _w16(rows)
    a1 = rows[..., 0, :] + rows[..., 2, :]
    d1 = rows[..., 1, :] + rows[..., 3, :]
    c1 = rows[..., 1, :] - rows[..., 3, :]
    b1 = rows[..., 0, :] - rows[..., 2, :]
    a2 = a1 + d1
    b2 = b1 + c1
    c2 = b1 - c1
    d2 = a1 - d1
    a2 = a2 + (a2 < 0)
    b2 = b2 + (b2 < 0)
    c2 = c2 + (c2 < 0)
    d2 = d2 + (d2 < 0)
    out = jnp.stack([(a2 + 3) >> 3, (b2 + 3) >> 3,
                     (c2 + 3) >> 3, (d2 + 3) >> 3], axis=-2)
    return _w16(out).reshape(out.shape[:-2] + (16,))


def quantize_blocks(coeffs, dc_factor, ac_factor):
    """C-style truncating quantization, batched: (..., 16) int32 ->
    (..., 16) int32 (quantization.cc:149-157).  dc/ac factors are scalar
    int32."""
    c = coeffs.astype(jnp.int32)
    f = jnp.full((16,), 1, jnp.int32) * ac_factor
    f = f.at[0].set(dc_factor)
    q = jnp.abs(c) // f
    return jnp.sign(c) * q


def variance_blocks(diff):
    """Reference variance (sse - s*s // 256), batched over 16x16 tiles:
    diff (..., 256) int32 -> (...,) int32.  Same hi/lo split as the
    kernels (s*s would overflow int32)."""
    sse = jnp.sum(diff * diff, axis=-1)
    s = jnp.sum(diff, axis=-1)
    sa = jnp.abs(s)
    hi, lo = sa >> 8, sa & 255
    return sse - (hi * hi * 256 + 2 * hi * lo + (lo * lo) // 256)


def intra_screen_source(oy_t, mbc, rmult, dmult):
    """Best whole-MB intra rd cost per macroblock, screened against
    SOURCE neighbor pixels (the fast-path stand-in for the host's
    reconstruction-based screening, encode_inter_np.py:223-233).

    oy_t: (R, C, 256) int source luma tiles (row-major);
    mbc: (8,) int32 whole-mode rate costs (mbmode_costs[1]);
    rmult/dmult: scalar rd multipliers.

    Returns (R*C,) int32 minimum rd cost over DC/V/H/TM.
    """
    R, C = oy_t.shape[:2]
    o = oy_t.astype(jnp.int32)
    tiles = o.reshape(R, C, 16, 16)

    # neighbor edges from source tiles, with the 127/129 frame-edge
    # defaults of intra prediction (reconstruct_np semantics)
    abv = jnp.pad(o[:-1, :, 240:256], ((1, 0), (0, 0), (0, 0)))
    lco = jnp.pad(tiles[:, :-1, :, 15], ((0, 0), (1, 0), (0, 0)))
    al = jnp.pad(o[:-1, :-1, 255], ((1, 0), (1, 0)))
    hrow = (jnp.arange(R) > 0)[:, None]
    hcol = (jnp.arange(C) > 0)[None, :]
    a16 = jnp.where(hrow[..., None], abv, 127)          # (R, C, 16)
    lcol = jnp.where(hcol[..., None], lco, 129)
    e0 = jnp.where(hrow & hcol, al,
                   jnp.where(hrow, 129, 127))           # (R, C)

    sum_a = jnp.sum(a16, axis=-1)
    sum_l = jnp.sum(lcol, axis=-1)
    dc = jnp.where(hrow & hcol, (sum_a + sum_l + 16) >> 5,
                   jnp.where(hrow, (sum_a + 8) >> 4,
                             jnp.where(hcol, (sum_l + 8) >> 4, 128)))

    preds = [
        jnp.broadcast_to(dc[..., None, None], (R, C, 16, 16)),
        jnp.broadcast_to(a16[:, :, None, :], (R, C, 16, 16)),      # V
        jnp.broadcast_to(lcol[:, :, :, None], (R, C, 16, 16)),     # H
        jnp.clip(lcol[:, :, :, None] + a16[:, :, None, :]
                 - e0[..., None, None], 0, 255),                   # TM
    ]
    best = None
    for m, p in enumerate(preds):
        d = (tiles - p).reshape(R, C, 256)
        var = variance_blocks(d)
        cost = ((128 + mbc[m] * rmult) >> 8) + var * dmult
        best = cost if best is None else jnp.minimum(best, cost)
    return best.reshape(R * C)


def chroma_mv(v):
    """luma_to_chroma for a uniform whole-MB MV: (4*v + 4) >> 3 with
    symmetric rounding (encode_inter_np.py:285-287)."""
    a = jnp.abs(v) * 4
    return jnp.sign(v) * ((a + 4) >> 3)
