"""Pallas TPU kernel for VP8 sixtap motion compensation.

The XLA gather formulation (ops/sixtap.py) costs ~7-10 ns per gathered
element — ~60 ms/720p frame.  This kernel instead keeps the (edge-padded)
reference planes resident in VMEM and walks macroblocks with scalar-driven
window loads:

- uniform-MV macroblocks (everything except SPLITMV) load ONE aligned
  window and run the separable 6-tap over the whole (S+5, S+5) tile;
- SPLITMV macroblocks fall back to 16 per-subblock (9, 9) windows.

Mosaic requires vector-load starts to be 8-aligned in sublanes and
128-aligned in lanes, so each window load is an aligned superset followed
by a dynamic two-axis rotate (pltpu.roll) that brings the true start to
(0, 0); the filter then reads a static (win, win) corner.

Edge extension (prediction.cc:919-971 EdgeExtendedRaster) is reproduced by
pre-padding each plane with PAD edge-replicated pixels and clamping the
window start: any window that would fall fully outside the frame clamps to
a window of pure edge pixels, and partial overlaps land inside the padding
— bit-identical to per-index clamping because PAD >= window size.

Taps are selected by an unrolled scalar where-chain (no dynamic indexing
of constants), so the whole kernel is scalar-unit address math + small
VPU tiles.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 8-phase 6-tap filters (prediction.cc:645-653)
SIXTAP_TABLE = (
    (0, 0, 128, 0, 0, 0),
    (0, -6, 123, 12, -1, 0),
    (2, -11, 108, 36, -8, 1),
    (0, -9, 93, 50, -6, 0),
    (3, -16, 77, 77, -16, 3),
    (0, -6, 50, 93, -9, 0),
    (1, -8, 36, 108, -11, 2),
    (0, -1, 12, 123, -6, 0),
)

PAD = 32          # >= max window size (21): whole-window clamping is exact
LANES = 256       # aligned lane span per window load (>= 127 + 21)
ROWS_PER_STEP = 8  # grid block height (Mosaic wants sublane-divisible blocks)


def _tap(phase, k):
    """Scalar tap value TAPS[phase][k] via an unrolled select chain."""
    v = jnp.int32(SIXTAP_TABLE[0][k])
    for p in range(1, 8):
        v = jnp.where(phase == p, jnp.int32(SIXTAP_TABLE[p][k]), v)
    return v


def _filter_window(win, S, mx, my):
    """Separable 6-tap on an int32 (S+5, S+5) window -> (S, S)."""
    acc = jnp.zeros((S + 5, S), jnp.int32)
    for k in range(6):
        acc = acc + win[:, k:k + S] * _tap(mx, k)
    mid = jnp.clip((acc + 64) >> 7, 0, 255)
    acc = jnp.zeros((S, S), jnp.int32)
    for k in range(6):
        acc = acc + mid[k:k + S, :] * _tap(my, k)
    return jnp.clip((acc + 64) >> 7, 0, 255)


def _load_window(refs_ref, sel, sy, sx, win, rows_aligned):
    """Aligned load + two-axis dynamic rotate; returns (win, win) int32
    window starting at unaligned padded coords (sy, sx)."""
    sy_al = pl.multiple_of((sy >> 3) << 3, 8)
    sx_al = pl.multiple_of((sx >> 7) << 7, 128)
    big = refs_ref[sel, pl.ds(sy_al, rows_aligned), pl.ds(sx_al, LANES)] \
        .astype(jnp.int32)  # rotate only supports 32-bit lanes
    big = pltpu.roll(big, -(sy - sy_al), 0)
    big = pltpu.roll(big, -(sx - sx_al), 1)
    return big[:win, :win]


def _mc_kernel(S, C, R,
               sel_ref, split_ref, sy_ref, sx_ref, mx_ref, my_ref,
               ssy_ref, ssx_ref, smx_ref, smy_ref,
               refs_ref, out_ref):
    nsub = (S // 4) ** 2
    rows_uniform = 32   # rem(7) + window, 8-aligned (power of two: dynamic_rotate)
    base = pl.program_id(0) * ROWS_PER_STEP

    def mb_body(i, _):
        rloc = i // C
        j = i % C
        sel = sel_ref[rloc, j]

        def uniform():
            win = _load_window(refs_ref, sel, sy_ref[rloc, j],
                               sx_ref[rloc, j], S + 5, rows_uniform)
            out_ref[rloc, j] = _filter_window(
                win, S, mx_ref[rloc, j], my_ref[rloc, j]).astype(jnp.uint8)

        def split():
            blocks = []
            for s in range(nsub):
                win = _load_window(refs_ref, sel,
                                   ssy_ref[rloc, j * nsub + s],
                                   ssx_ref[rloc, j * nsub + s], 9, 16)
                blocks.append(_filter_window(
                    win, 4, smx_ref[rloc, j * nsub + s],
                    smy_ref[rloc, j * nsub + s]))
            w = S // 4
            tile = jnp.concatenate(
                [jnp.concatenate(blocks[r * w:(r + 1) * w], axis=1)
                 for r in range(w)], axis=0)
            out_ref[rloc, j] = tile.astype(jnp.uint8)

        @pl.when(base + rloc < R)
        def _():
            jax.lax.cond(split_ref[rloc, j] != 0, split, uniform)

        return 0

    jax.lax.fori_loop(0, ROWS_PER_STEP * C, mb_body, 0)


# ---------------------------------------------------------------------------
# packed-reference variant: 4 vertically adjacent pixels per int32 word
# ---------------------------------------------------------------------------
#
# The u8 kernel's cost is dominated by the two dynamic rotates on a
# (32, 256) int32 window (log-step select chains over 32 KB).  Packing rows
# 4-per-word shrinks the loaded window to (16, 256) int32 covering the same
# 64 pixel rows, removes the in-kernel u8->i32 conversion entirely, and
# lets the separable filter run on (8, 32) byte-plane tiles.  Predictions
# come back packed the same way; one dense full-frame op unpacks them.

PACKED_ROWS = 16   # packed sublanes per aligned window load (64 pixel rows)


def pack_refs32(padded):
    """(..., Hp, Wp) uint8 (edge-padded) -> (..., Hp4, Wp) int32 with
    pixel row 4s+b in byte b of packed row s; Hp4 >= Hp//4 + 8 rounded so
    every aligned PACKED_ROWS-sublane window load stays in bounds."""
    Hp, Wp = padded.shape[-2:]
    x = padded.astype(jnp.int32).reshape(
        padded.shape[:-2] + (Hp // 4, 4, Wp))
    p = (x[..., 0, :] | (x[..., 1, :] << 8) | (x[..., 2, :] << 16)
         | (x[..., 3, :] << 24))
    h4 = Hp // 4
    h4p = ((h4 + 7) // 8) * 8 + 8
    lead = ((0, 0),) * (p.ndim - 2)
    return jnp.pad(p, lead + ((0, h4p - h4), (0, 0)))


def unpack_pred(p):
    """(..., n, S) packed int32 predictions -> (..., 4*n, S) int32."""
    bs = [jax.lax.shift_right_logical(p, 8 * b) & 0xFF for b in range(4)]
    x = jnp.stack(bs, axis=-2)                     # (..., n, 4, S)
    n, S = p.shape[-2], p.shape[-1]
    return x.reshape(p.shape[:-2] + (n * 4, S))


def unpack_refs32(p):
    """Inverse of pack_refs32: (..., Hp//4, Wp) int32 -> (..., Hp, Wp) u8."""
    return unpack_pred(p).astype(jnp.uint8)


def _load_window_packed(refs_ref, sel, sy, sx):
    """Aligned packed load + two-axis rotate + byte alignment: (8, 32)
    int32 whose byte b of sublane s is window row 4s+b, window origin at
    padded pixel coords (sy, sx)."""
    s0 = sy >> 2
    s_al = pl.multiple_of((s0 >> 3) << 3, 8)
    sx_al = pl.multiple_of((sx >> 7) << 7, 128)
    big = refs_ref[sel, pl.ds(s_al, PACKED_ROWS), pl.ds(sx_al, LANES)]
    big = pltpu.roll(big, -(sx - sx_al), 1)
    big = pltpu.roll(big, -(s0 - s_al), 0)
    w = big[:8, :32]
    r = sy & 3
    wn = jnp.concatenate([w[1:], w[:1]], axis=0)
    sh = 8 * r
    lo = jax.lax.shift_right_logical(w, sh)
    hi = jax.lax.shift_left(wn, (32 - sh) & 31)
    return jnp.where(r == 0, w, lo | hi)


def _filter_window_packed(w, S, mx, my):
    """Separable 6-tap on a packed (8, 32) window -> (S//4, S) packed."""
    A = [jax.lax.shift_right_logical(w, 8 * b) & 0xFF for b in range(4)]
    Hh = []
    for b in range(4):
        acc = jnp.zeros((8, S), jnp.int32)
        for k in range(6):
            acc = acc + A[b][:, k:k + S] * _tap(mx, k)
        Hh.append(jnp.clip((acc + 64) >> 7, 0, 255))
    # shifted copies cover cross-word vertical taps (row 4s+b+k)
    Hs = [[h,
           jnp.concatenate([h[1:], h[:1]], axis=0),
           jnp.concatenate([h[2:], h[:2]], axis=0)] for h in Hh]
    n = S // 4
    outs = []
    for c in range(4):
        acc = jnp.zeros((8, S), jnp.int32)
        for k in range(6):
            idx = c + k
            acc = acc + Hs[idx & 3][idx >> 2] * _tap(my, k)
        outs.append(jnp.clip((acc + 64) >> 7, 0, 255)[:n])
    return (outs[0] | (outs[1] << 8) | (outs[2] << 16) | (outs[3] << 24))


def _mc_kernel_packed(S, C, R,
                      sel_ref, split_ref, sy_ref, sx_ref, mx_ref, my_ref,
                      ssy_ref, ssx_ref, smx_ref, smy_ref,
                      refs_ref, out_ref):
    nsub = (S // 4) ** 2
    w = S // 4
    base = pl.program_id(0) * ROWS_PER_STEP

    def mb_body(i, _):
        rloc = i // C
        j = i % C
        sel = sel_ref[rloc, j]

        def uniform():
            mx = mx_ref[rloc, j]
            my = my_ref[rloc, j]

            def fullpel():
                # whole-pel MV: the 6-tap is the identity (reference
                # skips filtering, prediction.cc unfiltered path), so
                # the prediction is the window at (y, x) directly —
                # ~5x fewer ops, and typical inter frames are ~90-99%
                # full-pel (bench clip: 91-99%)
                win = _load_window_packed(refs_ref, sel,
                                          sy_ref[rloc, j] + 2,
                                          sx_ref[rloc, j] + 2)
                out_ref[rloc, j] = win[:S // 4, :S]

            def subpel():
                win = _load_window_packed(refs_ref, sel, sy_ref[rloc, j],
                                          sx_ref[rloc, j])
                out_ref[rloc, j] = _filter_window_packed(win, S, mx, my)

            jax.lax.cond((mx == 0) & (my == 0), fullpel, subpel)

        def split():
            blocks = []
            for s in range(nsub):
                win = _load_window_packed(refs_ref, sel,
                                          ssy_ref[rloc, j * nsub + s],
                                          ssx_ref[rloc, j * nsub + s])
                blocks.append(_filter_window_packed(
                    win, 4, smx_ref[rloc, j * nsub + s],
                    smy_ref[rloc, j * nsub + s]))
            tile = jnp.concatenate(
                [jnp.concatenate(blocks[r * w:(r + 1) * w], axis=1)
                 for r in range(w)], axis=0)
            out_ref[rloc, j] = tile

        @pl.when(base + rloc < R)
        def _():
            jax.lax.cond(split_ref[rloc, j] != 0, split, uniform)

        return 0

    jax.lax.fori_loop(0, ROWS_PER_STEP * C, mb_body, 0)


def mc_tiles_packed(refs_packed, H, W, sel, sub_mv, S, interpret=None):
    """Motion-compensate all macroblock tiles of one plane from PACKED
    references (pack_refs32 of pad_refs).  Same contract as mc_tiles:
    returns (R, C, S, S) int32 predictions.

    interpret=None autodetects (off-TPU runs the kernel in Pallas
    interpret mode so the TPU MC path is testable anywhere)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    R, C = sel.shape
    n = S // 4
    rr = jnp.arange(R, dtype=jnp.int32)[:, None, None, None]
    cc = jnp.arange(C, dtype=jnp.int32)[None, :, None, None]
    si = jnp.arange(n, dtype=jnp.int32)

    mvx = sub_mv[..., 0]
    mvy = sub_mv[..., 1]
    by = rr * S + si[None, None, :, None] * 4
    bx = cc * S + si[None, None, None, :] * 4
    ssy = jnp.clip(by + (mvy >> 3) - 2 + PAD, 0, H + 2 * PAD - 9)
    ssx = jnp.clip(bx + (mvx >> 3) - 2 + PAD, 0, W + 2 * PAD - 9)
    smx = mvx & 7
    smy = mvy & 7

    mv0x = mvx[:, :, 0, 0]
    mv0y = mvy[:, :, 0, 0]
    split = jnp.any((mvx != mv0x[:, :, None, None]) |
                    (mvy != mv0y[:, :, None, None]), axis=(2, 3))
    sy = jnp.clip(rr[:, :, 0, 0] * S + (mv0y >> 3) - 2 + PAD,
                  0, H + 2 * PAD - (S + 5))
    sx = jnp.clip(cc[:, :, 0, 0] * S + (mv0x >> 3) - 2 + PAD,
                  0, W + 2 * PAD - (S + 5))

    G = ROWS_PER_STEP
    Rp = ((R + G - 1) // G) * G

    def padr(x):
        return jnp.pad(x, ((0, Rp - R),) + ((0, 0),) * (x.ndim - 1))

    Hp4, Wp = refs_packed.shape[-2:]
    smem = lambda shape: pl.BlockSpec(
        (G,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        functools.partial(_mc_kernel_packed, S, C, R),
        grid=(Rp // G,),
        in_specs=[smem((C,)), smem((C,)), smem((C,)), smem((C,)),
                  smem((C,)), smem((C,)),
                  smem((C * n * n,)), smem((C * n * n,)),
                  smem((C * n * n,)), smem((C * n * n,)),
                  pl.BlockSpec((4, Hp4, Wp), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((G, C, S // 4, S), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, C, S // 4, S), jnp.int32),
        interpret=interpret,
    )(padr(sel.astype(jnp.int32)), padr(split.astype(jnp.int32)),
      padr(sy.astype(jnp.int32)), padr(sx.astype(jnp.int32)),
      padr((mv0x & 7).astype(jnp.int32)), padr((mv0y & 7).astype(jnp.int32)),
      padr(ssy.reshape(R, C * n * n).astype(jnp.int32)),
      padr(ssx.reshape(R, C * n * n).astype(jnp.int32)),
      padr(smx.reshape(R, C * n * n).astype(jnp.int32)),
      padr(smy.reshape(R, C * n * n).astype(jnp.int32)),
      refs_packed)
    return unpack_pred(out[:R])


def pad_refs(planes):
    """(..., H, W) -> (..., H', W') edge-replicated; dims aligned so every
    aligned window load stays in bounds."""
    H, W = planes.shape[-2:]
    Hp = ((H + 2 * PAD + 7) // 8) * 8 + 8
    Wp = ((W + 2 * PAD + 127) // 128) * 128 + LANES
    lead = ((0, 0),) * (planes.ndim - 2)
    return jnp.pad(planes, lead + ((PAD, Hp - H - PAD),
                                   (PAD, Wp - W - PAD)), mode="edge")


def mc_tiles(refs_padded, H, W, sel, sub_mv, S):
    """Motion-compensate all macroblock tiles of one plane.

    refs_padded: (4, Hp, Wp) uint8 from pad_refs.
    sel: (R, C) int32 reference selector (0 = intra, garbage output ok).
    sub_mv: (R, C, n, n, 2) int32 eighth-pel MVs per 4x4 subblock
            (n = S // 4); S: 16 for luma, 8 for chroma.
    Returns (R, C, S, S) int32 predictions.
    """
    R, C = sel.shape
    n = S // 4
    rr = jnp.arange(R, dtype=jnp.int32)[:, None, None, None]
    cc = jnp.arange(C, dtype=jnp.int32)[None, :, None, None]
    si = jnp.arange(n, dtype=jnp.int32)

    mvx = sub_mv[..., 0]
    mvy = sub_mv[..., 1]
    # per-subblock window starts in padded coords, clamped (see module doc)
    by = rr * S + si[None, None, :, None] * 4
    bx = cc * S + si[None, None, None, :] * 4
    # clamp to the real-content region [0, dim + 2*PAD - win] so whole-window
    # clamping stays within edge-replicated pixels
    ssy = jnp.clip(by + (mvy >> 3) - 2 + PAD, 0, H + 2 * PAD - 9)
    ssx = jnp.clip(bx + (mvx >> 3) - 2 + PAD, 0, W + 2 * PAD - 9)
    smx = mvx & 7
    smy = mvy & 7

    # uniform (non-SPLITMV) fast path parameters from subblock 0
    mv0x = mvx[:, :, 0, 0]
    mv0y = mvy[:, :, 0, 0]
    split = jnp.any((mvx != mv0x[:, :, None, None]) |
                    (mvy != mv0y[:, :, None, None]), axis=(2, 3))
    sy = jnp.clip(rr[:, :, 0, 0] * S + (mv0y >> 3) - 2 + PAD,
                  0, H + 2 * PAD - (S + 5))
    sx = jnp.clip(cc[:, :, 0, 0] * S + (mv0x >> 3) - 2 + PAD,
                  0, W + 2 * PAD - (S + 5))

    G = ROWS_PER_STEP
    Rp = ((R + G - 1) // G) * G

    def padr(x):  # pad MB-row axis up to the grid block height
        return jnp.pad(x, ((0, Rp - R),) + ((0, 0),) * (x.ndim - 1))

    Hp, Wp = refs_padded.shape[-2:]
    smem = lambda shape: pl.BlockSpec(
        (G,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        functools.partial(_mc_kernel, S, C, R),
        grid=(Rp // G,),
        in_specs=[smem((C,)), smem((C,)), smem((C,)), smem((C,)),
                  smem((C,)), smem((C,)),
                  smem((C * n * n,)), smem((C * n * n,)),
                  smem((C * n * n,)), smem((C * n * n,)),
                  pl.BlockSpec((4, Hp, Wp), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((G, C, S, S), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, C, S, S), jnp.uint8),
    )(padr(sel.astype(jnp.int32)), padr(split.astype(jnp.int32)),
      padr(sy.astype(jnp.int32)), padr(sx.astype(jnp.int32)),
      padr((mv0x & 7).astype(jnp.int32)), padr((mv0y & 7).astype(jnp.int32)),
      padr(ssy.reshape(R, C * n * n).astype(jnp.int32)),
      padr(ssx.reshape(R, C * n * n).astype(jnp.int32)),
      padr(smx.reshape(R, C * n * n).astype(jnp.int32)),
      padr(smy.reshape(R, C * n * n).astype(jnp.int32)),
      refs_padded)
    return out[:R].astype(jnp.int32)
