"""Batched inter prediction (JAX): VP8 six-tap subpel filter.

The reference treats full-pel MVs as a copy fast path and subpel as a
two-pass 6-tap filter (prediction.cc:655-975); filter index 0 is the
identity tap, so a uniform two-pass filter over every 4x4 subblock is
bit-exact for all MVs and maps to dense vectorized gathers + multiplies.
Out-of-frame reads clamp to the padded plane edge, matching both the
reference's "unsafe" in-bounds path and its EdgeExtendedRaster path.
"""
import jax
import jax.numpy as jnp


def predict_mb_tiles(ref_planes, ref_sel, sub_mv, S, dims=None):
    """Motion-compensate all macroblock tiles of one plane.

    ref_planes: (4, H, W) uint8; ref_sel: (R, C); sub_mv: (R, C, n, n, 2)
    eighth-pel MVs (n = S // 4).  Returns (R, C, S, S) int32.

    With dims=(H, W), ref_planes is already in MC layout (edge-padded via
    sixtap_pallas.pad_refs) and H/W are the REAL plane dims — clamping
    anywhere inside the edge-replicated band reads the same edge pixel, so
    both paths stay bit-exact (prediction.cc:919-971).

    Dispatches to the Pallas kernel on TPU (ops/sixtap_pallas.py); the XLA
    gather formulation below is the fallback (and the CPU test oracle).
    """
    R, C = ref_sel.shape
    n = S // 4
    if jax.default_backend() == "tpu":
        from . import sixtap_pallas
        if dims is None:
            H, W = ref_planes.shape[-2:]
            padded = sixtap_pallas.pad_refs(ref_planes)
        else:
            H, W = dims
            padded = ref_planes
        return sixtap_pallas.mc_tiles(padded, H, W,
                                      ref_sel.astype(jnp.int32),
                                      sub_mv.astype(jnp.int32), S)

    if dims is not None:
        from . import sixtap_pallas
        H, W = dims
        return _predict_prepadded(ref_planes, ref_sel, sub_mv, S, H, W,
                                  sixtap_pallas.PAD)
    rr, cc = jnp.mgrid[0:R, 0:C]
    si = jnp.arange(n)
    sby = rr[:, :, None, None] * S + si[None, None, :, None] * 4
    sbx = cc[:, :, None, None] * S + si[None, None, None, :] * 4
    N = R * C * n * n
    pred = predict_4x4_blocks(
        ref_planes,
        jnp.broadcast_to(ref_sel[:, :, None, None].astype(jnp.int32),
                         (R, C, n, n)).reshape(N),
        jnp.broadcast_to(sby, (R, C, n, n)).reshape(N),
        jnp.broadcast_to(sbx, (R, C, n, n)).reshape(N),
        sub_mv.reshape(N, 2).astype(jnp.int32))
    return pred.reshape(R, C, n, n, 4, 4).transpose(0, 1, 2, 4, 3, 5) \
        .reshape(R, C, S, S)


def _predict_prepadded(padded, ref_sel, sub_mv, S, H, W, pad):
    """XLA fallback over prepadded planes (CPU oracle for the padded-ref
    step layout): identical to predict_4x4_blocks with coords offset into
    the pad band and clamps widened to the padded bounds."""
    R, C = ref_sel.shape
    n = S // 4
    rr, cc = jnp.mgrid[0:R, 0:C]
    si = jnp.arange(n)
    sby = rr[:, :, None, None] * S + si[None, None, :, None] * 4
    sbx = cc[:, :, None, None] * S + si[None, None, None, :] * 4
    N = R * C * n * n
    mv = sub_mv.reshape(N, 2).astype(jnp.int32)
    sel = jnp.broadcast_to(ref_sel[:, :, None, None].astype(jnp.int32),
                           (R, C, n, n)).reshape(N)
    by = jnp.broadcast_to(sby, (R, C, n, n)).reshape(N)
    bx = jnp.broadcast_to(sbx, (R, C, n, n)).reshape(N)
    mx = mv[:, 0] & 7
    my = mv[:, 1] & 7
    src_x = bx + (mv[:, 0] >> 3)
    src_y = by + (mv[:, 1] >> 3)
    oy = jnp.arange(-2, 7)
    # clamp inside the edge-replicated band: same pixel as a real-edge clamp
    yy = jnp.clip(src_y[:, None] + oy[None, :] + pad, 0, H + 2 * pad - 1)
    xx = jnp.clip(src_x[:, None] + oy[None, :] + pad, 0, W + 2 * pad - 1)
    patch = padded[sel[:, None, None], yy[:, :, None],
                   xx[:, None, :]].astype(jnp.int32)
    hf = SIXTAP[mx]
    acc = jnp.zeros((N, 9, 4), jnp.int32)
    for k in range(6):
        acc = acc + patch[:, :, k:k + 4] * hf[:, k, None, None]
    inter = jnp.clip((acc + 64) >> 7, 0, 255)
    vf = SIXTAP[my]
    acc = jnp.zeros((N, 4, 4), jnp.int32)
    for k in range(6):
        acc = acc + inter[:, k:k + 4, :] * vf[:, k, None, None]
    pred = jnp.clip((acc + 64) >> 7, 0, 255)
    return pred.reshape(R, C, n, n, 4, 4).transpose(0, 1, 2, 4, 3, 5) \
        .reshape(R, C, S, S)


SIXTAP = jnp.array([
    [0, 0, 128, 0, 0, 0],
    [0, -6, 123, 12, -1, 0],
    [2, -11, 108, 36, -8, 1],
    [0, -9, 93, 50, -6, 0],
    [3, -16, 77, 77, -16, 3],
    [0, -6, 50, 93, -9, 0],
    [1, -8, 36, 108, -11, 2],
    [0, -1, 12, 123, -6, 0]], jnp.int32)


def predict_4x4_blocks(ref_planes, ref_sel, block_y, block_x, mv):
    """Predict N 4x4 blocks from selected reference planes.

    ref_planes: (n_refs, H, W) uint8/int32 — stacked reference plane.
    ref_sel: (N,) int32 — which reference each block reads.
    block_y/block_x: (N,) int32 — top-left plane coords of each 4x4 block.
    mv: (N, 2) int32 — (x, y) in 1/8-pel units.

    Returns (N, 4, 4) int32 predictions.
    """
    H, W = ref_planes.shape[-2:]
    mx = mv[:, 0] & 7
    my = mv[:, 1] & 7
    src_x = block_x + (mv[:, 0] >> 3)
    src_y = block_y + (mv[:, 1] >> 3)

    # gather 9x9 patches (rows src_y-2 .. src_y+6), edge-clamped
    oy = jnp.arange(-2, 7)
    ox = jnp.arange(-2, 7)
    yy = jnp.clip(src_y[:, None] + oy[None, :], 0, H - 1)    # (N, 9)
    xx = jnp.clip(src_x[:, None] + ox[None, :], 0, W - 1)    # (N, 9)
    patch = ref_planes[ref_sel[:, None, None],
                       yy[:, :, None],
                       xx[:, None, :]].astype(jnp.int32)      # (N, 9, 9)

    hf = SIXTAP[mx]  # (N, 6)
    acc = jnp.zeros((patch.shape[0], 9, 4), jnp.int32)
    for k in range(6):
        acc = acc + patch[:, :, k:k + 4] * hf[:, k, None, None]
    inter = jnp.clip((acc + 64) >> 7, 0, 255)                # (N, 9, 4)

    vf = SIXTAP[my]
    acc = jnp.zeros((patch.shape[0], 4, 4), jnp.int32)
    for k in range(6):
        acc = acc + inter[:, k:k + 4, :] * vf[:, k, None, None]
    return jnp.clip((acc + 64) >> 7, 0, 255)
