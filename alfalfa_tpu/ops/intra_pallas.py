"""Pallas TPU kernel: whole-frame VP8 intra prediction over the skewed
wavefront.

Replaces the lax.scan intra wavefront in reconstruct_jax (op-latency bound:
up to 168 dispatched slab steps per 720p frame).  The kernel walks the
diagonals as a sequential grid: the decoded planes live VMEM-resident as
revisiting outputs, while the per-diagonal inputs (stage-B inter tiles,
residuals in two layouts, packed mode/mask words) stream in as grid blocks
that Pallas double-buffers against compute.

Semantics mirror ops/intra.py (reference prediction.cc:38-643 +
macroblock.cc:523-551) exactly, reformulated lane-wise: a macroblock tile
is one row-major (S*S,)-lane vector per storage row, tile rows are
contiguous lane groups, and the ten 4x4 b-modes are built from static lane
slices of the smoothed edge vectors.  B_PRED's 16-subblock feedback chain
(macroblock.cc:539-544) runs as an unrolled loop over subblocks inside a
lax.cond that skips diagonals with no B_PRED macroblock.

Packed parameter word prm[d, r, 32] (int16):
  0 ymode, 1 uvmode, 2 has_nonzero, 3 intra, 4 valid, 5 has_row,
  6 has_col, 7 last_col, 8..23 bmode[4*4], rest pad.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DPAD = 3     # leading pad diagonals (= reconstruct_jax.DPAD)
B_PRED = 4   # tables.B_PRED


def _avg2(x, y):
    return (x + y + 1) >> 1


def _avg3(x, y, z):
    return (x + 2 * y + z + 2) >> 2


def _lane(x, i):
    return x[:, i:i + 1]


def _bcast(x1, n):
    return jnp.broadcast_to(x1, (x1.shape[0], n))


def _shift_down(x):
    z = jnp.zeros((1,) + x.shape[1:], x.dtype)
    return jnp.concatenate([z, x[:-1]], axis=0)


def _tile_col(slab, x, S):
    """Column x of row-major (Rp, S*S) tiles -> (Rp, S)."""
    return jnp.concatenate([_lane(slab, x + S * y) for y in range(S)], axis=1)


def _whole_predict(a, lcol, e0, hrow, hcol, mode, S):
    """16x16/8x8 prediction, modes DC/V/H/TM selected per row
    (prediction.cc:435-467).  a/lcol (Rp, S), e0/masks/mode (Rp, 1)."""
    log2 = {8: 3, 16: 4}[S]
    sum_a = jnp.sum(a, axis=1, keepdims=True)
    sum_l = jnp.sum(lcol, axis=1, keepdims=True)
    dc = jnp.where(
        hrow & hcol, (sum_a + sum_l + (1 << log2)) >> (log2 + 1),
        jnp.where(hrow, (sum_a + (1 << (log2 - 1))) >> log2,
                  jnp.where(hcol, (sum_l + (1 << (log2 - 1))) >> log2, 128)))
    P = S * S
    dcp = _bcast(dc, P)
    vp = jnp.tile(a, (1, S))
    hp = jnp.concatenate([_bcast(_lane(lcol, y), S) for y in range(S)],
                         axis=1)
    tm = jnp.clip(hp + vp - _bcast(e0, P), 0, 255)
    return jnp.where(mode == 0, dcp,
                     jnp.where(mode == 1, vp,
                               jnp.where(mode == 2, hp, tm)))


def _sb_predict_all(a, left, al):
    """All ten 4x4 b-mode predictions, lane-wise (prediction.cc:479-643;
    same construction as ops/intra.py:subblock_predict_all).

    a (Rp, 8) = above4 + above-right4; left (Rp, 4); al (Rp, 1).
    Returns list of 10 (Rp, 16) tiles in bmode enum order."""
    cat = lambda *xs: jnp.concatenate(xs, axis=1)
    east = cat(_lane(left, 3), _lane(left, 2), _lane(left, 1),
               _lane(left, 0), al, a)                     # (Rp, 13)
    a4 = a[:, 0:4]

    dc = _bcast((jnp.sum(a4, 1, keepdims=True)
                 + jnp.sum(left, 1, keepdims=True) + 4) >> 3, 16)
    tm = cat(*[jnp.clip(_bcast(_lane(left, y), 4) + a4 - _bcast(al, 4),
                        0, 255) for y in range(4)])
    ve_v = _avg3(cat(al, a[:, 0:3]), a4, a[:, 1:5])
    ve = jnp.tile(ve_v, (1, 4))
    he_v = _avg3(cat(al, left[:, 0:3]), left,
                 cat(left[:, 1:4], _lane(left, 3)))
    he = cat(*[_bcast(_lane(he_v, y), 4) for y in range(4)])

    ld_v = cat(_avg3(a[:, 0:6], a[:, 1:7], a[:, 2:8]),
               _avg3(_lane(a, 6), _lane(a, 7), _lane(a, 7)))   # (Rp, 7)
    ld = cat(*[ld_v[:, y:y + 4] for y in range(4)])
    rd_v = _avg3(east[:, 0:7], east[:, 1:8], east[:, 2:9])     # (Rp, 7)
    rd = cat(*[rd_v[:, 3 - y:7 - y] for y in range(4)])

    vr3 = _avg3(east[:, 1:7], east[:, 2:8], east[:, 3:9])      # (Rp, 6)
    vr2 = _avg2(east[:, 4:9], east[:, 5:10])                   # (Rp, 5)
    vr = cat(vr2[:, 0:4], vr3[:, 2:6],
             _lane(vr3, 1), vr2[:, 0:3],
             _lane(vr3, 0), vr3[:, 2:5])

    vl2 = _avg2(a[:, 0:4], a[:, 1:5])
    vl3 = _avg3(a[:, 0:6], a[:, 1:7], a[:, 2:8])
    vl = cat(vl2[:, 0:4], vl3[:, 0:4],
             vl2[:, 1:4], _lane(vl3, 4),
             vl3[:, 1:4], _lane(vl3, 5))

    hd2 = _avg2(east[:, 0:5], east[:, 1:6])
    hd3 = _avg3(east[:, 0:6], east[:, 1:7], east[:, 2:8])
    hd = cat(_lane(hd2, 3), _lane(hd3, 3), _lane(hd3, 4), _lane(hd3, 5),
             _lane(hd2, 2), _lane(hd3, 2), _lane(hd2, 3), _lane(hd3, 3),
             _lane(hd2, 1), _lane(hd3, 1), _lane(hd2, 2), _lane(hd3, 2),
             _lane(hd2, 0), _lane(hd3, 0), _lane(hd2, 1), _lane(hd3, 1))

    l0, l1, l2, l3 = (_lane(left, i) for i in range(4))
    hu = cat(_avg2(l0, l1), _avg3(l0, l1, l2), _avg2(l1, l2),
             _avg3(l1, l2, l3),
             _avg2(l1, l2), _avg3(l1, l2, l3), _avg2(l2, l3),
             _avg3(l2, l3, l3),
             _avg2(l2, l3), _avg3(l2, l3, l3), l3, l3,
             l3, l3, l3, l3)
    return [dc, tm, ve, he, ld, rd, vr, vl, hd, hu]


def _bpred_tile(a16, ar4, e0, lcol, bm, rb, nz):
    """One B_PRED macroblock row-of-diagonal: sequential 4x4 subblocks with
    inline residual add (macroblock.cc:539-544), as a lax.scan over the
    four subblock BANDS (rows of 4 blocks).

    The band body is position-uniform: with prev_bottom initialized to the
    above row a16, every band's 20-lane above vector is
    concat(prev_bottom, ar4), the above-left for sc=0 arrives as per-band
    xs (e0 for band 0, lcol lanes after), and everything else is static
    lane arithmetic — so the subblock chain traces ONCE per band instead
    of 16 times, cutting the kernel's traced-op count ~4x (the B_PRED
    unroll dominated JAX trace + Mosaic lowering time).  The decoded tile
    accumulates in a lane-shifting carry (concat, no dynamic indexing).
    All args lane-wise over storage rows; rb (Rp, 256) is the
    subblock-layout residual."""
    Rp = a16.shape[0]
    # Mosaic's in-kernel loop lowering supports only fori_loop-shaped
    # scans with NO extensive inputs (pallas/mosaic/lowering.py
    # _scan_lowering_rule), so per-band data rides the CARRY and rotates
    # into a static lane window each iteration (roll = static concat,
    # Mosaic-safe):
    #   lc_roll  (Rp, 16): band lcol at lanes 0:4, rolls by 4
    #   al_roll  (Rp, 4):  band above-left at lane 0, rolls by 1
    #   bm_roll  (Rp, 16): band modes at lanes 0:4, rolls by 4
    #   rb_roll  (Rp, 256): band residuals at lanes 0:64, rolls by 64
    al_roll0 = jnp.concatenate(
        [e0] + [_lane(lcol, 4 * b - 1) for b in range(1, 4)], axis=1)

    def band(_i, carry):
        (prev_bottom, out_acc, lc_roll, al_roll, bm_roll, rb_roll) = carry
        lcb = lc_roll[:, 0:4]
        al_first = al_roll[:, 0:1]
        bmb = bm_roll[:, 0:4]
        rbb = rb_roll[:, 0:64]
        above20 = jnp.concatenate([prev_bottom, ar4], axis=1)
        rows = [jnp.zeros((Rp, 16), jnp.int32)] * 4
        block_prev = None
        for sc in range(4):
            above4 = above20[:, sc * 4:sc * 4 + 4]
            ar = above20[:, (sc + 1) * 4:(sc + 1) * 4 + 4]
            al = al_first if sc == 0 else _lane(above20, sc * 4 - 1)
            left4 = (lcb if sc == 0 else
                     jnp.concatenate([_lane(block_prev, i * 4 + 3)
                                      for i in range(4)], axis=1))
            preds = _sb_predict_all(jnp.concatenate([above4, ar], axis=1),
                                    left4, al)
            m = _lane(bmb, sc)
            sel = preds[0]
            for k in range(1, 10):
                sel = jnp.where(m == k, preds[k], sel)
            res = jnp.where(nz, rbb[:, sc * 16:sc * 16 + 16], 0)
            block = jnp.clip(sel + res, 0, 255)   # (Rp, 16) row-major 4x4
            for i in range(4):
                r = rows[i]
                parts = ([r[:, :sc * 4]] if sc > 0 else []) \
                    + [block[:, i * 4:i * 4 + 4]] \
                    + ([r[:, sc * 4 + 4:]] if sc < 3 else [])
                rows[i] = jnp.concatenate(parts, axis=1)
            block_prev = block
        band_out = jnp.concatenate(rows, axis=1)             # (Rp, 64)
        out_acc = jnp.concatenate([out_acc[:, 64:], band_out], axis=1)
        roll = lambda x, n: jnp.concatenate([x[:, n:], x[:, :n]], axis=1)
        return (rows[3], out_acc, roll(lc_roll, 4), roll(al_roll, 1),
                roll(bm_roll, 4), roll(rb_roll, 64))

    _, out, _, _, _, _ = jax.lax.fori_loop(
        0, 4, band, (a16, jnp.zeros((Rp, 256), jnp.int32),
                     lcol, al_roll0, bm, rb))
    return out


def _bpred_tile_unrolled(a16, ar4, e0, lcol, bm, rb, nz):
    """The fully-unrolled B_PRED chain (fallback if the in-kernel scan
    ever hits a Mosaic lowering limit; ALFALFA_BPRED_UNROLL=1)."""
    Rp = a16.shape[0]
    zrow = jnp.zeros((Rp, 16), jnp.int32)
    rows = [zrow] * 16
    ea = jnp.concatenate([a16, ar4], axis=1)  # e21[1:21]
    for sr in range(4):
        for sc in range(4):
            if sr == 0:
                above4 = ea[:, sc * 4:sc * 4 + 4]
                ar = ea[:, (sc + 1) * 4:(sc + 1) * 4 + 4]
                al = e0 if sc == 0 else _lane(ea, sc * 4 - 1)
            else:
                prow = rows[sr * 4 - 1]
                above4 = prow[:, sc * 4:sc * 4 + 4]
                ar = (prow[:, (sc + 1) * 4:(sc + 1) * 4 + 4]
                      if sc < 3 else ea[:, 16:20])
                al = (_lane(prow, sc * 4 - 1) if sc > 0
                      else _lane(lcol, sr * 4 - 1))
            left4 = (lcol[:, sr * 4:sr * 4 + 4] if sc == 0 else
                     jnp.concatenate(
                         [_lane(rows[sr * 4 + i], sc * 4 - 1)
                          for i in range(4)], axis=1))

            preds = _sb_predict_all(jnp.concatenate([above4, ar], axis=1),
                                    left4, al)
            sb = sr * 4 + sc
            m = _lane(bm, sb)
            sel = preds[0]
            for k in range(1, 10):
                sel = jnp.where(m == k, preds[k], sel)
            res = jnp.where(nz, rb[:, sb * 16:sb * 16 + 16], 0)
            block = jnp.clip(sel + res, 0, 255)   # (Rp, 16) row-major 4x4
            for i in range(4):
                r = rows[sr * 4 + i]
                parts = []
                if sc > 0:
                    parts.append(r[:, :sc * 4])
                parts.append(block[:, i * 4:i * 4 + 4])
                if sc < 3:
                    parts.append(r[:, sc * 4 + 4:])
                rows[sr * 4 + i] = jnp.concatenate(parts, axis=1)
    return jnp.concatenate(rows, axis=1)


import os as _os
if _os.environ.get("ALFALFA_BPRED_UNROLL") == "1":
    _bpred_tile = _bpred_tile_unrolled


def _intra_kernel(nd, prm_ref, dy_ref, du_ref, dv_ref,
                  r16_ref, rb_ref, ru_ref, rv_ref,
                  oy_ref, ou_ref, ov_ref,
                  ring_y, ring_u, ring_v):
    """Output diagonals stream out as per-step blocks; the last four decoded
    diagonals live in a small VMEM ring (slot = d & 3) for neighbor reads.
    Keeping the full planes resident instead would double-buffer ~12 MB
    across the batch grid dim and blow scoped VMEM at 720p.  Ring slots
    for d-1..d-3 are garbage at d < 3 / across batch steps, but every read
    of them is masked by has_row/has_col/valid."""
    d = pl.program_id(0)

    pm = prm_ref[0].astype(jnp.int32)              # (Rp, 32)
    col = lambda k: pm[:, k:k + 1]
    ymode, uvmode = col(0), col(1)
    nz = col(2) != 0
    write = (col(4) != 0) & (col(3) != 0)          # valid & intra
    hrow, hcol, lcolm = col(5) != 0, col(6) != 0, col(7) != 0
    bm = pm[:, 8:24]
    any_intra = jnp.any(write)
    any_b = jnp.any(write & (ymode == B_PRED))

    cur_y = dy_ref[0].astype(jnp.int32)
    cur_u = du_ref[0].astype(jnp.int32)
    cur_v = dv_ref[0].astype(jnp.int32)

    # neighbor context (reads of already-decoded diagonals from the ring;
    # row r's above neighbors live at storage row r-1, hence the
    # shift_down).  Narrow lane slices of sublane-shifted vectors hit
    # Mosaic layout-concat limits, so whole slabs are shifted first and
    # sliced after.
    s1, s2, s3 = (d + 3) & 3, (d + 2) & 3, (d + 1) & 3   # d-1, d-2, d-3
    abv_row = _shift_down(ring_y[s2].astype(jnp.int32))[:, 240:256]
    ar_row = _shift_down(ring_y[s1].astype(jnp.int32))[:, 240:244]
    al_c = _shift_down(ring_y[s3].astype(jnp.int32))[:, 255:256]
    lcol_raw = _tile_col(ring_y[s1], 15, 16).astype(jnp.int32)
    abv_u = _shift_down(ring_u[s2].astype(jnp.int32))[:, 56:64]
    al_u = _shift_down(ring_u[s3].astype(jnp.int32))[:, 63:64]
    lcol_u = _tile_col(ring_u[s1], 7, 8).astype(jnp.int32)
    abv_v = _shift_down(ring_v[s2].astype(jnp.int32))[:, 56:64]
    al_v = _shift_down(ring_v[s3].astype(jnp.int32))[:, 63:64]
    lcol_v = _tile_col(ring_v[s1], 7, 8).astype(jnp.int32)

    r16 = r16_ref[0].astype(jnp.int32)
    rb = rb_ref[0].astype(jnp.int32)
    ru = ru_ref[0].astype(jnp.int32)
    rv = rv_ref[0].astype(jnp.int32)

    def compute(_):
        a16 = jnp.where(hrow, abv_row, 127)
        ar4 = jnp.where(hrow & ~lcolm, ar_row,
                        jnp.where(hrow & lcolm, _bcast(a16[:, 15:16], 4),
                                  127))
        e0 = jnp.where(hrow & hcol, al_c, jnp.where(hrow, 129, 127))
        lcol = jnp.where(hcol, lcol_raw, 129)

        whole = _whole_predict(a16, lcol, e0, hrow, hcol, ymode, 16)
        whole = jnp.clip(whole + jnp.where(nz, r16, 0), 0, 255)
        bt = jax.lax.cond(
            any_b,
            lambda x: _bpred_tile(a16, ar4, e0, lcol, bm, rb, nz),
            lambda x: x, whole)
        new_y = jnp.where((ymode == B_PRED), bt, whole)

        def chroma(abv, al2, lraw, res):
            a8 = jnp.where(hrow, abv, 127)
            ce0 = jnp.where(hrow & hcol, al2, jnp.where(hrow, 129, 127))
            cl = jnp.where(hcol, lraw, 129)
            p = _whole_predict(a8, cl, ce0, hrow, hcol, uvmode, 8)
            return jnp.clip(p + jnp.where(nz, res, 0), 0, 255)

        new_u = chroma(abv_u, al_u, lcol_u, ru)
        new_v = chroma(abv_v, al_v, lcol_v, rv)
        return (jnp.where(write, new_y, cur_y),
                jnp.where(write, new_u, cur_u),
                jnp.where(write, new_v, cur_v))

    out_y, out_u, out_v = jax.lax.cond(
        any_intra, compute, lambda _: (cur_y, cur_u, cur_v), 0)
    oy_ref[0] = out_y.astype(jnp.int16)
    ou_ref[0] = out_u.astype(jnp.int16)
    ov_ref[0] = out_v.astype(jnp.int16)
    ring_y[d & 3] = out_y.astype(jnp.int16)
    ring_u[d & 3] = out_u.astype(jnp.int16)
    ring_v[d & 3] = out_v.astype(jnp.int16)


def intra_frame(dy, du, dv, prm, r16, rb, ru, rv):
    """Run the intra wavefront for one frame.

    dy/du/dv: (n_diags, R_pad, P) int16 stage-B tiles (skewed, NO pad
    diagonals); prm: (n_diags, R_pad, 32) int16; r16/rb: (n_diags, R_pad,
    256) int16 Y residuals (assembled / subblock layout); ru/rv chroma.
    Returns (n_diags, R_pad, P) decoded planes (callers re-attach the
    DPAD pad diagonals for the loop filter).
    """
    nd, R_pad, _ = dy.shape
    stream = lambda P: pl.BlockSpec((1, R_pad, P), lambda d: (d, 0, 0),
                                    memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_intra_kernel, nd),
        grid=(nd,),
        in_specs=[stream(32), stream(256), stream(64), stream(64),
                  stream(256), stream(256), stream(64), stream(64)],
        out_specs=(stream(256), stream(64), stream(64)),
        out_shape=(jax.ShapeDtypeStruct((nd, R_pad, 256), jnp.int16),
                   jax.ShapeDtypeStruct((nd, R_pad, 64), jnp.int16),
                   jax.ShapeDtypeStruct((nd, R_pad, 64), jnp.int16)),
        scratch_shapes=[pltpu.VMEM((4, R_pad, 256), jnp.int16),
                        pltpu.VMEM((4, R_pad, 64), jnp.int16),
                        pltpu.VMEM((4, R_pad, 64), jnp.int16)],
    )(prm.astype(jnp.int16), dy, du, dv, r16, rb, ru, rv)
