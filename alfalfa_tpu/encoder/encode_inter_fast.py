"""Fast device interframe encode: split decision/math pipeline for the
Salsify real-time path (salsify-sender.cc:160-170, 33 ms/frame budget).

The serial raster kernel (encode_inter_device.py -> enc_inter_pallas)
is bit-exact vs the host loop but pays ~60-90 us per macroblock: every
op runs on one MB's (1, 256) tile.  This module restructures the frame
TPU-first:

1. decisions  — ops/enc_decide_pallas.py: the truly-serial chain (MV
   census over committed neighbors, ZEROMV/NEARESTMV/NEARMV/NEWMV
   evaluation with the exact diamond search) runs as a slim raster
   kernel that emits only (is_inter, mode, mv) per MB.
2. dense math — ops/enc_batch.py + the decoder's own batched MC
   (ops/sixtap_pallas.mc_tiles_packed) and residual machinery
   (ops/transforms.residuals_from_coeffs): prediction, forward
   DCT/WHT, quantization and decoder-exact reconstruction for ALL
   macroblocks at once, full VPU/MXU width.
3. host patch — macroblocks where intra won (rare in P frames) are
   re-encoded exactly by the host intra encoder in raster order
   (encode_intra_np.encode_intra_mb), patching arrays/recon before
   serialization; the patched tiles are scattered back into the
   device reconstruction so the cached reference stays decode-exact.

Divergence vs the host rt loop (gated by tests/test_fast_inter.py):
whole-MB intra SCREENING uses source instead of in-loop recon
neighbors, so the intra/inter choice can differ on a few MBs; the
emitted bitstream is always valid VP8 and reconstruction is
decoder-exact (the decode gates assert it).

Enable with ALFALFA_FAST_INTER=1 (the Salsify sender turns it on by
default); quality must be "rt".
"""
import os

import numpy as np

from alfalfa_tpu.decoder import reconstruct_np
from alfalfa_tpu.bitstream import tables as T
from .encode_inter_np import make_inter_header, finish_interframe
from .encode_intra_np import encode_intra_mb
from .encode_inter_device import (_kernel_inputs, _scalars_for,
                                  _outputs_to_frame, _cache_device_refs,
                                  _ps_rowperm)
from .costs import rd_multipliers

_FN_CACHE = {}


def enabled():
    return os.environ.get("ALFALFA_FAST_INTER", "0") == "1"


def _res_mb_y(rblocks, R, C):
    return rblocks.reshape(R, C, 4, 4, 4, 4).transpose(0, 1, 2, 4, 3, 5) \
        .reshape(R, C, 16, 16)


def _res_mb_uv(rblocks, R, C):
    return rblocks.reshape(R, C, 2, 2, 4, 4).transpose(0, 1, 2, 4, 3, 5) \
        .reshape(R, C, 8, 8)


def _blocks_of(diff, S):
    """(R, C, S, S) -> (R, C, (S//4)**2, 4, 4) raster-ordered subblocks."""
    R, C = diff.shape[:2]
    n = S // 4
    return diff.reshape(R, C, n, 4, n, 4).transpose(0, 1, 2, 4, 3, 5) \
        .reshape(R, C, n * n, 4, 4)


def _fast_raw(R, C, interpret, sparse, fixup=True):
    """Un-jitted fast-path function; same signature family as
    encode_inter_device._inter_raw (realtime is implied)."""
    import jax
    import jax.numpy as jnp
    from alfalfa_tpu.ops import enc_batch as EB
    from alfalfa_tpu.ops import enc_decide_pallas as EDP
    from alfalfa_tpu.ops import enc_intra_fixup_pallas as FIX
    from alfalfa_tpu.ops import sixtap_pallas as SP
    from alfalfa_tpu.ops import sixtap, transforms
    from .encode_intra_device import _tile_perm
    from . import device_fetch

    cap = device_fetch.cap_for(R * C * 400)
    rp16 = _ps_rowperm(16)
    _PERM16 = _tile_perm(16)
    _PERM8 = _tile_perm(8)
    W, H = C * 16, R * 16

    def f(oy_u8, ou_u8, ov_u8, refy_p, refu_p, refv_p, scalars,
          mbc, ibc, mvc2p, pcost, sadcost, mvcost):
        oy_t = oy_u8.astype(jnp.int16)
        oy_ps = oy_t.reshape(R, C, 16, 16)[:, :, rp16, :]
        rmult, dmult = scalars[6], scalars[7]
        icost = EB.intra_screen_source(oy_t, mbc.astype(jnp.int32),
                                       rmult, dmult)
        md8 = EDP.decide_inter_frame(
            oy_ps, refy_p, scalars, icost, mvc2p, pcost, sadcost, mvcost,
            realtime=True, interpret=interpret)

        is_inter = md8[:, :, 0] != 0
        mode = md8[:, :, 1].astype(jnp.int32)
        mvx = jnp.where(is_inter, md8[:, :, 2].astype(jnp.int32), 0)
        mvy = jnp.where(is_inter, md8[:, :, 3].astype(jnp.int32), 0)
        cmx = EB.chroma_mv(mvx)
        cmy = EB.chroma_mv(mvy)

        sub_mv = jnp.broadcast_to(
            jnp.stack([mvx, mvy], -1)[:, :, None, None, :],
            (R, C, 4, 4, 2))
        uv_mv = jnp.broadcast_to(
            jnp.stack([cmx, cmy], -1)[:, :, None, None, :],
            (R, C, 2, 2, 2))
        sel = jnp.zeros((R, C), jnp.int32)

        if not interpret and jax.default_backend() == "tpu":
            def mc(ref_p, mv, S):
                refs4 = jnp.broadcast_to(ref_p, (4,) + ref_p.shape)
                return SP.mc_tiles_packed(refs4, (H if S == 16 else H // 2),
                                          (W if S == 16 else W // 2),
                                          sel, mv, S)
        else:
            def mc(ref_p, mv, S):
                return sixtap._predict_prepadded(
                    SP.unpack_refs32(ref_p)[None], sel, mv, S,
                    (H if S == 16 else H // 2),
                    (W if S == 16 else W // 2), SP.PAD)

        pred_y = mc(refy_p, sub_mv, 16)                  # (R, C, 16, 16)
        pred_u = mc(refu_p, uv_mv, 8)
        pred_v = mc(refv_p, uv_mv, 8)

        oy_tiles = oy_t.reshape(R, C, 16, 16).astype(jnp.int32)
        ou_tiles = ou_u8.astype(jnp.int32).reshape(R, C, 8, 8)
        ov_tiles = ov_u8.astype(jnp.int32).reshape(R, C, 8, 8)

        ydct = EB.fdct_blocks(_blocks_of(oy_tiles - pred_y, 16))
        walsh = ydct[..., 0]                             # (R, C, 16)
        qy = EB.quantize_blocks(ydct.at[..., 0].set(0),
                                scalars[0], scalars[1])
        y2 = EB.quantize_blocks(EB.fwht_blocks(walsh),
                                scalars[2], scalars[3])
        qu = EB.quantize_blocks(EB.fdct_blocks(
            _blocks_of(ou_tiles - pred_u, 8)), scalars[4], scalars[5])
        qv = EB.quantize_blocks(EB.fdct_blocks(
            _blocks_of(ov_tiles - pred_v, 8)), scalars[4], scalars[5])
        coeffs = jnp.concatenate(
            [qy, qu, qv, y2[:, :, None, :]], axis=2)     # (R, C, 25, 16)
        coeffs = jnp.where(is_inter[:, :, None, None], coeffs, 0)
        nz = jnp.any(coeffs != 0, axis=(2, 3))

        qf = {k: jnp.full((R, C), scalars[i], jnp.int32)
              for i, k in enumerate(("y_dc", "y_ac", "y2_dc", "y2_ac",
                                     "uv_dc", "uv_ac"))}
        res = transforms.residuals_from_coeffs(coeffs, qf, is_inter)
        res = jnp.where(nz[:, :, None, None, None], res, 0)
        rec_y = jnp.clip(pred_y + _res_mb_y(res[:, :, 0:16], R, C), 0, 255)
        rec_u = jnp.clip(pred_u + _res_mb_uv(res[:, :, 16:20], R, C), 0, 255)
        rec_v = jnp.clip(pred_v + _res_mb_uv(res[:, :, 20:24], R, C), 0, 255)
        m = is_inter[:, :, None, None]
        rec_y = jnp.where(m, rec_y, 0)
        rec_u = jnp.where(m, rec_u, 0)
        rec_v = jnp.where(m, rec_v, 0)

        ii = is_inter.astype(jnp.int32)
        co = coeffs.reshape(R, C, 400).astype(jnp.int16)
        ry = rec_y.reshape(R, C, 256)
        ru = rec_u.reshape(R, C, 64)
        rv = rec_v.reshape(R, C, 64)
        ymode = mode * ii
        uvmode = jnp.zeros_like(ii)
        nz32 = nz.astype(jnp.int32)

        if fixup:
            # intra-coded MBs: whole-mode encode on device against the
            # final reconstruction (raster walk; inter MBs pass through)
            oy_b = oy_t[:, :, _PERM16]
            ou_t16 = ou_u8.astype(jnp.int16)
            ov_t16 = ov_u8.astype(jnp.int16)
            co_fix, md2, ry, ru, rv = FIX.intra_fixup_frame(
                md8, oy_t, oy_b, ou_t16, ov_t16,
                ou_t16[:, :, _PERM8], ov_t16[:, :, _PERM8],
                ry, ru, rv, scalars, mbc.astype(jnp.int32),
                interpret=interpret)
            mi = is_inter[:, :, None]
            co = jnp.where(mi, co, co_fix.astype(jnp.int16))
            ymode = jnp.where(is_inter, ymode, md2[:, :, 0].astype(jnp.int32))
            uvmode = jnp.where(is_inter, uvmode,
                               md2[:, :, 1].astype(jnp.int32))
            nz32 = jnp.where(is_inter, nz32, md2[:, :, 2].astype(jnp.int32))
            ry, ru, rv = (a.astype(jnp.int32) for a in (ry, ru, rv))

        md = jnp.stack([ymode, uvmode, ii, nz32, mvx, mvy, cmx, cmy],
                       axis=-1)
        md = jnp.concatenate(
            [md, jnp.zeros((R, C, 24), jnp.int32)], axis=-1) \
            .astype(jnp.int16)

        sp = device_fetch.compact(co.reshape(-1), cap) if sparse else None
        return (co, sp, md,
                ry.astype(jnp.uint8),
                ru.astype(jnp.uint8),
                rv.astype(jnp.uint8))

    return f


def _fixup_enabled():
    return os.environ.get("ALFALFA_FAST_FIXUP", "1") != "0"


def _fast_fn(R, C, interpret):
    from . import device_fetch
    sparse = device_fetch.enabled()
    fixup = _fixup_enabled()
    key = (R, C, interpret, sparse, fixup)
    if key in _FN_CACHE:
        return _FN_CACHE[key]
    import jax
    f = _fast_raw(R, C, interpret, sparse, fixup)
    fn = jax.jit(f) if not interpret else f
    _FN_CACHE[key] = fn
    return fn


def _arrays_only(co_h, md_h, R, C):
    """FrameArrays from kernel outputs without materializing the
    reconstruction (steady frames never need host pixels)."""
    from alfalfa_tpu.decoder.parse import FrameArrays
    arrays = FrameArrays(R, C)
    arrays.coeffs[:] = co_h.reshape(R, C, 25, 16)
    ymode = md_h[:, :, 0]
    is_inter = md_h[:, :, 2] != 0
    arrays.ymode[:] = ymode.astype(np.int8)
    arrays.uvmode[:] = md_h[:, :, 1].astype(np.int8)
    arrays.y2_coded[:] = is_inter | (ymode != T.B_PRED)
    arrays.has_nonzero[:] = md_h[:, :, 3] != 0
    arrays.bmode[:] = md_h[:, :, 8:24].reshape(R, C, 4, 4).astype(np.int8)
    arrays.ref[:] = np.where(is_inter, T.LAST_FRAME, T.CURRENT_FRAME)
    arrays.sub_mv[:, :, :, :, 0] = md_h[:, :, 4, None, None]
    arrays.sub_mv[:, :, :, :, 1] = md_h[:, :, 5, None, None]
    arrays.uv_mv[..., 0] = md_h[:, :, 6].reshape(
        R, C, *([1] * (arrays.uv_mv.ndim - 3)))
    arrays.uv_mv[..., 1] = md_h[:, :, 7].reshape(
        R, C, *([1] * (arrays.uv_mv.ndim - 3)))
    return arrays


_IMPLIED_B = np.array((0, 2, 3, 1), np.int8)   # DC/V/H/TM -> implied bmode


def _implied_bmodes(arrays):
    """Whole-mode intra MBs carry the implied per-mode bmode values
    (B_DC/B_VE/B_HE/B_TM) in arrays.bmode for serializer consistency."""
    intra = np.asarray(arrays.ref == T.CURRENT_FRAME)
    if not intra.any():
        return
    ym = np.clip(arrays.ymode, 0, 3).astype(np.int64)
    imp = _IMPLIED_B[ym]                      # (R, C)
    arrays.bmode[intra] = imp[intra][:, None, None]


def _patch_intra_host(encoder, arrays, recon, orig, quant_indices):
    """Exact host intra encode for the MBs the decision kernel scored
    intra, in raster order (each sees the patched recon of earlier intra
    neighbors; inter neighbors are already decoder-exact)."""
    q = {k: int(v) for k, v in quant_indices.quantizer().items()}
    rate_mult, dist_mult = rd_multipliers(q["y_ac"])
    R, C = encoder.mb_rows, encoder.mb_cols
    patched = []
    intra = np.asarray(arrays.ref == T.CURRENT_FRAME)
    if not intra.any():
        return patched
    planes = (orig.y, orig.u, orig.v)
    skip_bpred = os.environ.get("ALFALFA_FAST_BPRED", "0") != "1"
    for r, c in zip(*np.nonzero(intra)):
        encode_intra_mb(planes, recon, arrays, int(r), int(c), q,
                        rate_mult, dist_mult, interframe=True,
                        skip_bpred=skip_bpred)
        arrays.ref[r, c] = T.CURRENT_FRAME
        patched.append((int(r), int(c)))
    return patched


_LF_CACHE = {}


def _lf_filter_and_pack_fn(R, C, interpret):
    """Jitted: loop-filter the device recon tiles at the given level and
    return BOTH the filtered (H, W) planes (the next host-visible
    reference, materialized lazily by Raster.to_host) and the padded+
    packed MC layout (the next frame's on-device reference) — one filter
    pass, zero host round trips."""
    key = (R, C, interpret)
    if key in _LF_CACHE:
        return _LF_CACHE[key]
    import jax
    from alfalfa_tpu.decoder import reconstruct_jax as RJ
    from alfalfa_tpu.ops.sixtap_pallas import pad_refs, pack_refs32

    def f(ry_t, ru_t, rv_t, lf_params):
        on_tpu = jax.default_backend() == "tpu" and not interpret
        y, u, v = RJ.loopfilter_tiles(ry_t, ru_t, rv_t, lf_params, R, C,
                                      on_tpu=on_tpu)
        return (y, u, v, pack_refs32(pad_refs(y)), pack_refs32(pad_refs(u)),
                pack_refs32(pad_refs(v)))

    fn = f if interpret else jax.jit(f)
    _LF_CACHE[key] = fn
    return fn


# steady-state frames reuse the previous loop-filter level (the
# reference persists it under REALTIME_QUALITY, encoder.cc:164-166);
# every Nth frame re-climbs +-1 on host to track content drift
_LF_RECLIMB_PERIOD = 16


def _take_reclimb(encoder):
    """Advance the fast-path frame counter and decide whether this frame
    re-climbs the loop-filter level on host (first frame, every
    _LF_RECLIMB_PERIOD-th frame, or whenever segmentation is active).
    The driver calls this BEFORE the fetch: steady frames skip fetching
    the reconstruction entirely."""
    nframe = getattr(encoder, "_fast_frame_no", 0)
    encoder._fast_frame_no = nframe + 1
    return (encoder.last_loop_filter_level is None
            or nframe % _LF_RECLIMB_PERIOD == 0
            or encoder.state.segmentation is not None)


def _finish_fast(encoder, header, arrays, recon, orig, update,
                 ry, ru, rv, interpret, reclimb):
    """finish_interframe with the loop-filter stage on DEVICE: reuses the
    persisted rt filter level, filters the device recon once, and arms
    both the host-visible reference Raster (device-backed, lazy) and the
    packed device reference — the host never filters or SSIMs in steady
    state.  Falls back to the host search on re-climb frames and
    whenever segmentation is active."""
    import numpy as np_
    import jax.numpy as jnp
    from alfalfa_tpu.util import tracing
    from alfalfa_tpu.decoder import reconstruct_jax as RJ
    from alfalfa_tpu.state.decoder_state import (DecoderState, Raster,
                                                 FilterAdjustments)

    W, H = encoder.width, encoder.height
    R, C = encoder.mb_rows, encoder.mb_cols
    if reclimb:
        return finish_interframe(encoder, header, arrays, recon, orig,
                                 update)

    from .encoder import calc_prob, worker_pool
    from .serializer import count_token_branches, optimize_token_probs
    from alfalfa_tpu.bitstream.header import ModeRefLFDeltaUpdate

    refs = encoder.references
    no_skip = int(arrays.has_nonzero.sum())
    header.prob_skip_false = calc_prob(no_skip, arrays.has_nonzero.size)
    arrays.skip_coeff[:] = ~arrays.has_nonzero

    n_intra = int((arrays.ref == T.CURRENT_FRAME).sum())
    n_last = int((arrays.ref == T.LAST_FRAME).sum())
    total = arrays.ref.size
    p = calc_prob(n_intra, total)
    if p > 0:
        header.prob_inter = p
    p = calc_prob(n_last, n_last)
    if p > 0:
        header.prob_references_last = p

    counts_f = worker_pool().submit(count_token_branches, arrays)

    header.mode_lf_adjustments_enabled = True
    header.mode_lf_adjustments = ModeRefLFDeltaUpdate([0] * 4, [0] * 4)
    lf_level = encoder.last_loop_filter_level
    header.loop_filter_level = lf_level
    with tracing.stage("enc.fast_lf_device"):
        state_view = DecoderState(W, H, encoder.state.probability_tables,
                                  None, FilterAdjustments.create(header))
        lf_params = RJ._frame_lf_params(header, arrays, state_view,
                                        key_frame=False)
        fy, fu, fv, py, pu, pv = _lf_filter_and_pack_fn(R, C, interpret)(
            ry, ru, rv,
            tuple(jnp.asarray(np_.asarray(x)) for x in lf_params))
    filtered = Raster(W, H, fy, fu, fv)

    with tracing.stage("enc.if_counts_join"):
        counts = counts_f.result()
    header.token_prob_update = optimize_token_probs(
        counts, encoder.state.probability_tables.coeff_probs)
    frame_probs = encoder.state.probability_tables.copy()
    frame_probs.update(header)

    from .serializer import serialize_frame
    with tracing.stage("enc.if_serialize"):
        payload = serialize_frame(header, arrays, frame_probs, False, W, H)
    quality = encoder.last_ssim   # steady state reuses the last score

    if update:
        encoder.state.probability_tables = frame_probs.copy()
        encoder.state.filter_adjustments = FilterAdjustments.create(header)
        if header.update_segmentation is None:
            encoder.state.segmentation = None
        refs.last = filtered
        if header.refresh_golden_frame:
            refs.golden = filtered
        if header.refresh_alternate_frame:
            refs.alternative = filtered
        encoder.last_loop_filter_level = lf_level
        if (header.update_segmentation is None
                and encoder.state.segmentation is None):
            encoder._dev_refs = (py, pu, pv)
            encoder._dev_refs_for = refs.last
    return payload, quality


def encode_interframe_fast_multiqp(encoders, yuv, quant_list, update=True,
                                   interpret=False):
    """The Salsify speculative pair through the fast path: ONE vmapped
    dispatch over the quantizer scalars (decisions + dense math for both
    candidates share every upload; salsify-sender.cc:490-518)."""
    import jax
    import jax.numpy as jnp
    from alfalfa_tpu.util.xfer import get_packed
    from . import device_fetch

    if not interpret and jax.default_backend() != "tpu":
        interpret = True

    enc0 = encoders[0]
    W, H = enc0.width, enc0.height
    R, C = enc0.mb_rows, enc0.mb_cols
    n = len(quant_list)

    orig, planes, tables = _kernel_inputs(enc0, yuv, interpret)
    scalars = jnp.asarray(np.stack([_scalars_for(qi) for qi in quant_list]))

    sparse = device_fetch.enabled()
    key = (R, C, interpret, n, sparse, "multiqp")
    fn = _FN_CACHE.get(key)
    if fn is None:
        vf = jax.vmap(_fast_raw(R, C, interpret, sparse),
                      in_axes=(None,) * 6 + (0,) + (None,) * 6)
        fn = vf if interpret else jax.jit(vf)
        _FN_CACHE[key] = fn

    co, sp, md, ry, ru, rv = fn(*planes, scalars, *tables)
    fixup = _fixup_enabled()
    reclimbs = [_take_reclimb(e) for e in encoders]
    steady = fixup and not any(reclimbs)
    if steady:
        if sp is not None:
            sp_h, md_h = get_packed((sp, md))
            idx, val, cnt = sp_h
            co_rows = [device_fetch.rebuild((idx[i], val[i], cnt[i]),
                                            co[i], R * C * 400)
                       for i in range(n)]
        else:
            md_h = np.asarray(md)
            co_rows = [np.asarray(co[i]).reshape(-1).astype(np.int16)
                       for i in range(n)]
        ry_h = ru_h = rv_h = None
    elif sp is not None:
        sp_h, md_h, ry_h, ru_h, rv_h = get_packed((sp, md, ry, ru, rv))
        idx, val, cnt = sp_h
        co_rows = [device_fetch.rebuild((idx[i], val[i], cnt[i]), co[i],
                                        R * C * 400)
                   for i in range(n)]
    else:
        co_all, md_h, ry_h, ru_h, rv_h = get_packed((co, md, ry, ru, rv))
        co_rows = [co_all[i].reshape(-1).astype(np.int16)
                   for i in range(n)]

    results = []
    for i, (enc, qi) in enumerate(zip(encoders, quant_list)):
        header = make_inter_header(qi, None)
        md_i = np.asarray(md_h[i]).reshape(R, C, 32).astype(np.int32)
        if steady:
            arrays = _arrays_only(co_rows[i].reshape(R, C, 400), md_i,
                                  R, C)
            recon = None
        else:
            arrays, recon = _outputs_to_frame(
                co_rows[i].reshape(R, C, 400), md_i,
                ry_h[i], ru_h[i], rv_h[i], R, C, W, H)
        ryi, rui, rvi = ry[i], ru[i], rv[i]
        if fixup:
            _implied_bmodes(arrays)
        else:
            patched = _patch_intra_host(enc, arrays, recon, orig, qi)
            if patched:
                ryi, rui, rvi = _scatter_patches(recon, patched,
                                                 ryi, rui, rvi, interpret)
        results.append(_finish_fast(enc, header, arrays, recon, orig,
                                    update, ryi, rui, rvi, interpret,
                                    reclimbs[i]))
        if update and getattr(enc, "_dev_refs_for", None) \
                is not enc.references.last:
            _cache_device_refs(enc, header, arrays, ryi, rui, rvi,
                               interpret)
    return results


def encode_interframe_fast(encoder, yuv, quant_indices, update,
                           rebase_kf_header=None, interpret=False):
    """Encode one rt interframe with the split decision/dense pipeline."""
    import jax
    import jax.numpy as jnp
    from alfalfa_tpu.util import tracing
    from alfalfa_tpu.util.xfer import get_packed
    from . import device_fetch

    if not interpret and jax.default_backend() != "tpu":
        interpret = True

    W, H = encoder.width, encoder.height
    R, C = encoder.mb_rows, encoder.mb_cols
    assert encoder.quality == "rt", "fast path is the rt design point"

    header = make_inter_header(quant_indices, rebase_kf_header)
    with tracing.stage("enc.fast_inputs"):
        orig, planes, tables = _kernel_inputs(encoder, yuv, interpret)

    with tracing.stage("enc.fast_kernel"):
        co, sp, md, ry, ru, rv = _fast_fn(R, C, interpret)(
            *planes, jnp.asarray(_scalars_for(quant_indices)), *tables)

    reclimb = _take_reclimb(encoder)
    fixup = _fixup_enabled()
    steady = fixup and not reclimb
    with tracing.stage("enc.fast_fetch"):
        if steady:
            # the host only serializes: coeffs + modes suffice; the
            # reconstruction stays on device (LF + reference packing run
            # there, references.last is a lazy device-backed Raster)
            if sp is not None:
                sp_h, md_h = get_packed((sp, md))
                co_h = device_fetch.rebuild(sp_h, co, R * C * 400) \
                    .reshape(R, C, 400)
            else:
                md_h = np.asarray(md)
                co_h = np.asarray(co).reshape(R, C, 400).astype(np.int16)
            ry_h = ru_h = rv_h = None
        elif sp is not None:
            sp_h, md_h, ry_h, ru_h, rv_h = get_packed((sp, md, ry, ru, rv))
            co_h = device_fetch.rebuild(sp_h, co, R * C * 400) \
                .reshape(R, C, 400)
        else:
            md_h, ry_h, ru_h, rv_h = get_packed((md, ry, ru, rv))
            co_h = np.asarray(co).reshape(R, C, 400).astype(np.int16)

    with tracing.stage("enc.fast_host"):
        md_h = np.asarray(md_h).reshape(R, C, 32).astype(np.int32)
        if steady:
            arrays = _arrays_only(co_h, md_h, R, C)
            recon = None
        else:
            arrays, recon = _outputs_to_frame(co_h, md_h, ry_h, ru_h,
                                              rv_h, R, C, W, H)
        if fixup:
            # intra MBs were whole-mode encoded on device; their bmodes
            # are the implied per-whole-mode values
            _implied_bmodes(arrays)
        else:
            patched = _patch_intra_host(encoder, arrays, recon, orig,
                                        quant_indices)
            if patched:
                ry, ru, rv = _scatter_patches(recon, patched, ry, ru, rv,
                                              interpret)
        out = _finish_fast(encoder, header, arrays, recon, orig, update,
                           ry, ru, rv, interpret, reclimb)
    if update and getattr(encoder, "_dev_refs_for", None) \
            is not encoder.references.last:
        # re-climb frames fall back to finish_interframe, which does not
        # arm the device reference cache — do it here
        with tracing.stage("enc.fast_refcache"):
            _cache_device_refs(encoder, header, arrays, ry, ru, rv,
                               interpret)
    return out


_SCATTER_CACHE = {}
_SCATTER_BUCKETS = (64, 512, 4096)


def _scatter_fn(K, interpret):
    """Jitted fixed-capacity tile scatter: variable-length eager scatters
    would trigger a fresh (remote, multi-second) XLA compile per distinct
    intra-MB count — pad to one of three capacity buckets instead and
    mask the padding by writing back the gathered original tiles."""
    key = (K, interpret)
    if key in _SCATTER_CACHE:
        return _SCATTER_CACHE[key]
    import jax
    import jax.numpy as jnp

    def f(ry, ru, rv, idx, px):
        rr, cc = idx[:, 0], idx[:, 1]
        valid = idx[:, 2:3] != 0
        yt = jnp.where(valid, px[:, :256], ry[rr, cc])
        ut = jnp.where(valid, px[:, 256:320], ru[rr, cc])
        vt = jnp.where(valid, px[:, 320:384], rv[rr, cc])
        return (ry.at[rr, cc].set(yt.astype(jnp.uint8)),
                ru.at[rr, cc].set(ut.astype(jnp.uint8)),
                rv.at[rr, cc].set(vt.astype(jnp.uint8)))

    fn = f if interpret else jax.jit(f)
    _SCATTER_CACHE[key] = fn
    return fn


def _scatter_patches(recon, patched, ry, ru, rv, interpret=False):
    """Scatter the host-re-encoded intra MB tiles back into the device
    reconstruction so the on-device loop filter / reference cache sees
    decode-exact pixels."""
    import jax.numpy as jnp
    n = len(patched)
    K = next(b for b in _SCATTER_BUCKETS if b >= n)
    idx = np.zeros((K, 3), np.int32)
    px = np.zeros((K, 384), np.uint8)
    for i, (r, c) in enumerate(patched):
        idx[i] = (r, c, 1)
        px[i, :256] = recon.y[r * 16:(r + 1) * 16,
                              c * 16:(c + 1) * 16].reshape(256)
        px[i, 256:320] = recon.u[r * 8:(r + 1) * 8,
                                 c * 8:(c + 1) * 8].reshape(64)
        px[i, 320:384] = recon.v[r * 8:(r + 1) * 8,
                                 c * 8:(c + 1) * 8].reshape(64)
    # padding duplicates a REAL entry: XLA scatter order for duplicate
    # indices is undefined, so every duplicate must carry identical data
    # (a (0,0,invalid) pad row would race a genuine patch of MB (0,0))
    idx[n:] = idx[0]
    px[n:] = px[0]
    return _scatter_fn(K, interpret)(ry, ru, rv, jnp.asarray(idx),
                                     jnp.asarray(px))
