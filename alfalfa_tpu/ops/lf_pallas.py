"""Pallas TPU kernel: whole-frame VP8 loop filter over the skewed wavefront.

The XLA lax.scan wavefront (reconstruct_jax._lf_scan) is op-latency bound:
~169 dispatched slab steps per 720p frame cost ~80 ms.  This kernel runs
the ENTIRE wavefront inside one Mosaic program with the skewed plane
resident in VMEM, so each step is a handful of vector ops with no dispatch
overhead.

Storage layout (shared with reconstruct_jax): D[d + DPAD, r, P] holds the
flattened (row-major) tile of macroblock (r, c=d-2r); P = S*S (256 luma,
64 chroma).  Neighbor reads are whole diagonals at constant row shifts:
left = D[d-1] (same r), top = D[d-2] shifted down one row.

Within a step the four filter passes follow the reference ordering
(loopfilter.cc:133-154): MB left edge, interior vertical edges, MB top
edge, interior horizontal edges.  Vertical edges need tile *columns*
adjacent in lanes, so tiles are transposed to column-major for the V
passes and back for the H passes (a (S,S) swapaxes per slab).  The edge
arithmetic is imported from ops/loopfilter.py so the math is shared with
the scan oracle (and with the reference loopfilter_filters.hh:58-186).

Per-MB parameters arrive as one skewed int16 tensor prm[d, r, 8]:
(apply, interior_limit, mb_edge_limit, sb_edge_limit, hev_threshold,
 do_subblock, do_left, do_top).
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from alfalfa_tpu.ops.loopfilter import _mask_hev, _common_filter, _mb_filter

DPAD = 3  # leading zero diagonals (reads reach d-3); = reconstruct_jax.DPAD


def _t_perm(S):
    """(S*S, S*S) bf16 permutation matrix mapping row-major tiles to
    column-major (an involution, so the same matrix transposes back)."""
    perm = np.arange(S * S).reshape(S, S).T.reshape(-1)
    P = np.zeros((S * S, S * S), np.float32)
    P[perm, np.arange(S * S)] = 1
    return jnp.asarray(P, jnp.bfloat16)


def _t_tiles(slab, perm_mat):
    """Per-tile transpose via one MXU dot: Mosaic has no lane<->sublane
    shape cast for (R_pad, S*S) -> (R_pad, S, S), but pixel values fit
    exactly in bf16 (0..255, 8 mantissa bits), so a permutation-matrix
    matmul is an exact relayout."""
    return jnp.dot(slab.astype(jnp.bfloat16), perm_mat,
                   preferred_element_type=jnp.float32).astype(slab.dtype)


def _edge(groups, limit, blimit, thresh, mb_edge, do):
    """Filter one edge given its 8 pixel groups (p3..p0, q0..q3), each
    (R_pad, S) int16 raw [0,255].  Returns the 8 groups with the filtered
    lanes merged where ``do`` (an (R_pad, 1) bool) holds."""
    mask, hev = _mask_hev(limit, blimit, thresh, *groups)
    s = [g - 128 for g in groups]
    if mb_edge:
        p2, p1, p0, q0, q1, q2 = _mb_filter(s[1], s[2], s[3], s[4], s[5],
                                            s[6], mask, hev)
        new = (1, p2), (2, p1), (3, p0), (4, q0), (5, q1), (6, q2)
    else:
        p1, p0, q0, q1 = _common_filter(s[2], s[3], s[4], s[5], mask, hev)
        new = (2, p1), (3, p0), (4, q0), (5, q1)
    out = list(groups)
    for idx, v in new:
        out[idx] = jnp.where(do, (v + 128).astype(groups[idx].dtype),
                             groups[idx])
    return out


def _lf_kernel(S, n_diags, prm_ref, tp_ref, d_ref, o_ref):
    P = S * S
    R_pad = o_ref.shape[1]
    tp = tp_ref[...]
    # no input/output aliasing: with >2 operands Pallas binds the alias to
    # the wrong buffer (observed: untouched rows come back as garbage), so
    # copy once and filter in place on the output
    o_ref[...] = d_ref[...]

    def step(d, _):
        dd = d + DPAD
        # int16 vector arithmetic is spottily supported by Mosaic (no
        # absi/maxsi on packed i16), so all in-register math is int32;
        # only the VMEM-resident storage stays int16.
        p = prm_ref[d].astype(jnp.int32)     # (R_pad, 8)
        col = lambda k: p[:, k:k + 1]
        interior, mb_lim, sb_lim, hev_t = col(1), col(2), col(3), col(4)
        do_sb = col(5) != 0
        do_left = col(6) != 0
        do_top = col(7) != 0

        cur = o_ref[dd].astype(jnp.int32)    # (R_pad, P)
        left = o_ref[dd - 1].astype(jnp.int32)
        topraw = o_ref[dd - 2]
        zrow = jnp.zeros((1, P), jnp.int32)
        top = jnp.concatenate([zrow, topraw[:-1].astype(jnp.int32)], axis=0)

        grp = lambda slab, j: slab[:, j * S:(j + 1) * S]

        # ---- vertical passes (column-major space) ----
        curT = _t_tiles(cur, tp)
        leftT = _t_tiles(left, tp)
        ccols = [grp(curT, j) for j in range(S)]
        lcols = [grp(leftT, j) for j in range(S - 4, S)]

        g = _edge(lcols + ccols[0:4], interior, mb_lim, hev_t, True, do_left)
        lcols = g[0:4]
        ccols[0:4] = g[4:8]
        for x in range(4, S, 4):
            g = _edge(ccols[x - 4:x + 4], interior, sb_lim, hev_t, False,
                      do_sb)
            ccols[x - 4:x + 4] = g

        cur = _t_tiles(jnp.concatenate(ccols, axis=1), tp)
        leftT = jnp.concatenate(
            [grp(leftT, j) for j in range(S - 4)] + lcols, axis=1)
        o_ref[dd - 1] = _t_tiles(leftT, tp).astype(jnp.int16)

        # ---- horizontal passes (natural row-major space) ----
        crows = [grp(cur, j) for j in range(S)]
        trows = [grp(top, j) for j in range(S - 4, S)]

        g = _edge(trows + crows[0:4], interior, mb_lim, hev_t, True, do_top)
        trows = g[0:4]
        crows[0:4] = g[4:8]
        for y in range(4, S, 4):
            g = _edge(crows[y - 4:y + 4], interior, sb_lim, hev_t, False,
                      do_sb)
            crows[y - 4:y + 4] = g

        o_ref[dd] = jnp.concatenate(crows, axis=1).astype(jnp.int16)
        top_new = jnp.concatenate(
            [grp(top, j) for j in range(S - 4)] + trows, axis=1)
        # shift back up one row; the last storage row was never aligned in
        o_ref[dd - 2] = jnp.concatenate(
            [top_new[1:].astype(jnp.int16), topraw[-1:]], axis=0)
        return 0

    jax.lax.fori_loop(0, n_diags, step, 0)


def lf_pallas(D, prm, S):
    """Filter one skewed plane in place on TPU.

    D: (DPAD + n_diags, R_pad, S*S) int16 skewed tiles (donated).
    prm: (n_diags, R_pad, 8) int16 parameter tensor (see module doc).
    """
    ND, R_pad, P = D.shape
    assert P == S * S
    return pl.pallas_call(
        functools.partial(_lf_kernel, S, ND - DPAD),
        out_shape=jax.ShapeDtypeStruct(D.shape, D.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(prm.astype(jnp.int16), _t_perm(S), D)
