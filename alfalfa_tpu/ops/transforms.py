"""Batched integer transforms (JAX): dequantize, iWHT, iDCT.

Bit-exact device equivalents of the reference transforms
(transform.cc:47-137, quantization.cc:95-126), operating on whole frames of
coefficients at once: shapes (..., 16) in raster (de-zigzagged) order.
Intermediates that the reference stores as int16 are wrapped to int16 here
too, so results match to the bit.
"""
import jax
import jax.numpy as jnp


def dequantize(coeffs, dc_factor, ac_factor):
    """coeffs (..., 16) int, factors broadcastable to (...,).

    Returns (..., 16) int32 (wrapped to int16 range like the reference's
    int16 storage)."""
    dc = coeffs[..., :1] * dc_factor[..., None]
    ac = coeffs[..., 1:] * ac_factor[..., None]
    out = jnp.concatenate([dc, ac], axis=-1)
    return out.astype(jnp.int16).astype(jnp.int32)


def iwht(y2, out_dtype=jnp.int32):
    """Inverse Walsh-Hadamard on (..., 16) -> (..., 4, 4) DC terms."""
    c = y2.reshape(y2.shape[:-1] + (4, 4)).astype(jnp.int32)
    a1 = c[..., 0, :] + c[..., 3, :]
    b1 = c[..., 1, :] + c[..., 2, :]
    c1 = c[..., 1, :] - c[..., 2, :]
    d1 = c[..., 0, :] - c[..., 3, :]
    inter = jnp.stack([a1 + b1, c1 + d1, a1 - b1, d1 - c1], axis=-2)
    inter = inter.astype(jnp.int16).astype(jnp.int32)
    a1 = inter[..., :, 0] + inter[..., :, 3]
    b1 = inter[..., :, 1] + inter[..., :, 2]
    c1 = inter[..., :, 1] - inter[..., :, 2]
    d1 = inter[..., :, 0] - inter[..., :, 3]
    out = jnp.stack([(a1 + b1 + 3) >> 3,
                     (c1 + d1 + 3) >> 3,
                     (a1 - b1 + 3) >> 3,
                     (d1 - c1 + 3) >> 3], axis=-1)
    # reference stores DCs via int16 coefficients
    return out.astype(jnp.int16).astype(out_dtype)


def _mul_20091(a):
    return ((a * 20091) >> 16) + a


def _mul_35468(a):
    return (a * 35468) >> 16


def idct(coeffs):
    """Batched 4x4 inverse DCT: (..., 16) -> (..., 4, 4) int32 residuals
    (the values added to prediction before clamping)."""
    c = coeffs.reshape(coeffs.shape[:-1] + (4, 4)).astype(jnp.int32)
    t0 = c[..., 0, :] + c[..., 2, :]
    t1 = c[..., 0, :] - c[..., 2, :]
    t2 = _mul_35468(c[..., 1, :]) - _mul_20091(c[..., 3, :])
    t3 = _mul_20091(c[..., 1, :]) + _mul_35468(c[..., 3, :])
    # intermediate[i][j]: i = input column index, stored int16
    inter = jnp.stack([t0 + t3, t1 + t2, t1 - t2, t0 - t3], axis=-1)
    inter = inter.astype(jnp.int16).astype(jnp.int32)
    t0 = inter[..., 0, :] + inter[..., 2, :]
    t1 = inter[..., 0, :] - inter[..., 2, :]
    t2 = _mul_35468(inter[..., 1, :]) - _mul_20091(inter[..., 3, :])
    t3 = _mul_20091(inter[..., 1, :]) + _mul_35468(inter[..., 3, :])
    rows = jnp.stack([(t0 + t3 + 4) >> 3,
                      (t1 + t2 + 4) >> 3,
                      (t1 - t2 + 4) >> 3,
                      (t0 - t3 + 4) >> 3], axis=-1)
    # rows[..., i, j]: output row index i comes from intermediate column i
    return rows


def residuals_from_coeffs(coeffs, qfactors, y2_coded):
    """Full residual computation for a frame.

    coeffs: (r, c, 25, 16) int; qfactors: dict of (r, c) int32 arrays
    (y_dc, y_ac, y2_dc, y2_ac, uv_dc, uv_ac); y2_coded: (r, c) bool.

    Returns (r, c, 24, 4, 4) int32 residuals for the 16 Y + 4 U + 4 V
    blocks, with Y2 DC substitution already applied where coded."""
    y = dequantize(coeffs[:, :, 0:16, :], qfactors["y_dc"][..., None],
                   qfactors["y_ac"][..., None])
    u = dequantize(coeffs[:, :, 16:20, :], qfactors["uv_dc"][..., None],
                   qfactors["uv_ac"][..., None])
    v = dequantize(coeffs[:, :, 20:24, :], qfactors["uv_dc"][..., None],
                   qfactors["uv_ac"][..., None])
    y2 = dequantize(coeffs[:, :, 24, :], qfactors["y2_dc"], qfactors["y2_ac"])
    dc = iwht(y2)  # (r, c, 4, 4)
    dc_flat = dc.reshape(dc.shape[:-2] + (16,))
    y_dc = jnp.where(y2_coded[..., None], dc_flat, y[..., 0])
    y = y.at[..., 0].set(y_dc)
    blocks = jnp.concatenate([y, u, v], axis=2)  # (r, c, 24, 16)
    return idct(blocks)
