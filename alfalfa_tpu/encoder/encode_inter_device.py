"""Device (TPU) inter-frame encoding: host driver for the Pallas raster
kernel (ops/enc_inter_pallas.py).

Prepares the original planes in the kernel's three layouts (row-major
tile, subblock-major, phase-split), packs the LAST reference into the
vertically byte-packed MC layout, uploads the rd/mv cost tables, runs the
kernel, and converts the outputs back into FrameArrays + the
reconstructed Raster — a drop-in replacement for the per-MB host loop in
encode_inter_np.encode_interframe (reference encoder/encode_inter.cc:
231-369), bit-identical by tests/test_device_inter.py.  The frame-level
tail (prob/skip optimization, loop-filter search, serialization) is
shared with the host path via encode_inter_np.finish_interframe.
"""
import numpy as np

from alfalfa_tpu.bitstream import tables as T
from alfalfa_tpu.decoder.parse import FrameArrays
from alfalfa_tpu.state.decoder_state import Raster
from .costs import rd_multipliers, PROB_COST
from .encode_intra_device import _tables, _tile_perm, _plane_tiles, _untile
from .encode_inter_np import (MVComponentCostTable, SAD_PER_BIT16,
                              _MV_SAD_COST, make_inter_header,
                              finish_interframe)

_FN_CACHE = {}
_TABLE_CACHE = {}


def _ps_rowperm(S):
    """Row permutation turning an (S, S) tile into the phase-split layout
    (pixel row 4t+ph stored at row ph*(S//4)+t)."""
    n4 = S // 4
    perm = np.zeros(S, np.int32)
    for ph in range(4):
        for t in range(n4):
            perm[ph * n4 + t] = 4 * t + ph
    return perm


def _inter_raw(R, C, realtime, interpret, sparse=False, trellis=False):
    """The un-jitted kernel wrapper (vmap-able over the scalars arg).
    With ``sparse``, also returns the compact coefficient triple so the
    D2H fetch skips the dense (R, C, 400) tile (device_fetch).  With
    ``trellis``, f takes a trailing (64, 36) token-cost table and runs
    the --two-pass trellis DP for intra-coded MBs in-kernel."""
    from alfalfa_tpu.ops import enc_inter_pallas as EK
    from . import device_fetch

    cap = device_fetch.cap_for(R * C * 400)
    perm16 = _tile_perm(16)
    perm8 = _tile_perm(8)
    rp16 = _ps_rowperm(16)

    def f(oy_u8, ou_u8, ov_u8,
          refy_p, refu_p, refv_p, scalars, mbc, ibc, mvc2p, pcost,
          sadcost, mvcost, *tct):
        import jax.numpy as jnp
        # one uint8 upload per plane; the kernel's three layouts
        # (row-major tile / subblock-major / phase-split) are device-side
        # gathers — the H2D link carries 1.2 MB instead of 5.5 per frame
        oy_t = oy_u8.astype(jnp.int16)
        oy_b = oy_t[:, :, perm16]
        oy_ps = oy_t.reshape(R, C, 16, 16)[:, :, rp16, :]
        ou_t = ou_u8.astype(jnp.int16)
        ov_t = ov_u8.astype(jnp.int16)
        ou_b = ou_t[:, :, perm8]
        ov_b = ov_t[:, :, perm8]
        co, md, ry, ru, rv = EK.encode_inter_frame(
            oy_t, oy_b, oy_ps, ou_t, ov_t, ou_b, ov_b,
            refy_p, refu_p, refv_p, scalars, mbc, ibc, mvc2p, pcost,
            sadcost, mvcost, realtime, interpret=interpret,
            token_costs=tct[0] if trellis else None)
        sp = device_fetch.compact(co.reshape(-1), cap) if sparse else None
        return (co, sp, md, ry.astype(jnp.uint8).reshape(R, C, 256),
                ru.astype(jnp.uint8).reshape(R, C, 64),
                rv.astype(jnp.uint8).reshape(R, C, 64))

    return f


def _inter_fn(R, C, realtime, interpret, trellis=False):
    from . import device_fetch
    sparse = device_fetch.enabled()
    key = (R, C, realtime, interpret, sparse, trellis)
    if key in _FN_CACHE:
        return _FN_CACHE[key]
    import jax
    f = _inter_raw(R, C, realtime, interpret, sparse, trellis)
    fn = jax.jit(f) if not interpret else f
    _FN_CACHE[key] = fn
    return fn


def _kernel_inputs(encoder, yuv, interpret):
    """Shared (QP-independent) kernel inputs for one source raster."""
    import jax.numpy as jnp
    from alfalfa_tpu.ops.sixtap_pallas import pad_refs, pack_refs32
    from .encoder import _pad_raster

    W, H = encoder.width, encoder.height
    R, C = encoder.mb_rows, encoder.mb_cols
    orig = _pad_raster(*yuv, W, H)
    refs = encoder.references

    oy_u8 = _plane_tiles(orig.y, R, C, 16)
    ou_u8 = _plane_tiles(orig.u, R, C, 8)
    ov_u8 = _plane_tiles(orig.v, R, C, 8)

    if getattr(encoder, "_dev_refs_for", None) is refs.last:
        # the previous device encode already filtered + packed this exact
        # reference on device (_cache_device_refs) — zero re-upload
        refy_p, refu_p, refv_p = encoder._dev_refs
    else:
        refs.last.to_host()
        refy_p = pack_refs32(pad_refs(jnp.asarray(refs.last.y)))
        refu_p = pack_refs32(pad_refs(jnp.asarray(refs.last.u)))
        refv_p = pack_refs32(pad_refs(jnp.asarray(refs.last.v)))

    from alfalfa_tpu.util.xfer import put_packed
    # the rd/census/prob-cost tables are per-STATE constants: everything
    # but mvcost is compile-time static, and mvcost depends only on the
    # persistent MV probabilities (which our encoder never updates
    # in-stream).  Upload once per distinct mv_probs content and keep the
    # device handles — per-frame H2D then carries only the source planes.
    mvp = np.asarray(encoder.state.probability_tables.mv_probs)
    tkey = mvp.tobytes()
    cached = _TABLE_CACHE.get(tkey)
    if cached is None:
        costs = _tables()
        mbc = np.zeros(8, np.int32)
        mbc[:5] = np.asarray(costs.mbmode_costs[1][:5], np.int64)
        ibc = np.zeros(16, np.int32)
        ibc[:10] = np.asarray(costs.inter_bmode_costs, np.int64)
        mvc2p = np.asarray(T.MV_COUNTS_TO_PROBS, np.int32)
        pcost = np.asarray(PROB_COST, np.int32)
        sadcost = np.asarray(_MV_SAD_COST, np.int32)
        mv_table = MVComponentCostTable(
            encoder.state.probability_tables.mv_probs)
        mvcost = np.asarray(mv_table.table.reshape(4, 1024), np.int32)
        cached = put_packed((mbc, ibc, mvc2p, pcost, sadcost, mvcost))
        # never evict: entries are ~30 KB of device memory and evicting
        # live device buffers while async work may still reference them
        # is not worth the savings
        _TABLE_CACHE[tkey] = cached

    oy_d, ou_d, ov_d = put_packed((oy_u8, ou_u8, ov_u8))
    return orig, (oy_d, ou_d, ov_d, refy_p, refu_p, refv_p), cached


def _scalars_for(quant_indices):
    q = {k: int(v) for k, v in quant_indices.quantizer().items()}
    rate_mult, dist_mult = rd_multipliers(q["y_ac"])
    qi = int(quant_indices.y_ac_qi)
    scalars = np.zeros(16, np.int32)
    scalars[:9] = [q["y_dc"], q["y_ac"], q["y2_dc"], q["y2_ac"],
                   q["uv_dc"], q["uv_ac"], rate_mult, dist_mult,
                   int(SAD_PER_BIT16[qi])]
    return scalars


def _device_refs_enabled():
    import os
    return os.environ.get("ALFALFA_DEVICE_REFS", "1") != "0"


_LFPACK_CACHE = {}


def _lf_pack_fn(R, C, interpret):
    """Jitted: loop-filter the device-resident reconstruction tiles at the
    host-chosen level, then pad + pack the filtered planes into the MC
    reference layout — the next frame's references never leave the
    device (no 1.4 MB/frame re-upload + repack)."""
    key = (R, C, interpret)
    if key in _LFPACK_CACHE:
        return _LFPACK_CACHE[key]
    import jax
    from alfalfa_tpu.decoder import reconstruct_jax as RJ
    from alfalfa_tpu.ops.sixtap_pallas import pad_refs, pack_refs32

    def f(ry_t, ru_t, rv_t, lf_params):
        on_tpu = jax.default_backend() == "tpu" and not interpret
        y, u, v = RJ.loopfilter_tiles(ry_t, ru_t, rv_t, lf_params, R, C,
                                      on_tpu=on_tpu)
        return (pack_refs32(pad_refs(y)), pack_refs32(pad_refs(u)),
                pack_refs32(pad_refs(v)))

    fn = f if interpret else jax.jit(f)
    _LFPACK_CACHE[key] = fn
    return fn


def _cache_device_refs(encoder, header, arrays, ry_dev, ru_dev, rv_dev,
                       interpret, key_frame=False):
    """After a frame's state update: filter + pack the device recon as the
    next frame's references, keyed to the exact Raster installed."""
    if not _device_refs_enabled():
        return
    if (header.update_segmentation is not None
            or encoder.state.segmentation is not None):
        return          # host pack path handles segment-adjusted filters
    import numpy as np_
    from alfalfa_tpu.decoder import reconstruct_jax as RJ
    from alfalfa_tpu.state.decoder_state import (DecoderState,
                                                 FilterAdjustments)
    W, H = encoder.width, encoder.height
    state_view = DecoderState(W, H, encoder.state.probability_tables,
                              None, FilterAdjustments.create(header))
    lf_params = RJ._frame_lf_params(header, arrays, state_view,
                                    key_frame=key_frame)
    R, C = encoder.mb_rows, encoder.mb_cols
    import jax.numpy as jnp
    packed = _lf_pack_fn(R, C, interpret)(
        ry_dev, ru_dev, rv_dev,
        tuple(jnp.asarray(np_.asarray(p)) for p in lf_params))
    encoder._dev_refs = packed
    encoder._dev_refs_for = encoder.references.last


def encode_interframe_device(encoder, yuv, quant_indices, update,
                             rebase_kf_header=None, interpret=False):
    """Encode one interframe with the macroblock loop on device."""
    import jax
    import jax.numpy as jnp

    if not interpret and jax.default_backend() != "tpu":
        interpret = True

    W, H = encoder.width, encoder.height
    R, C = encoder.mb_rows, encoder.mb_cols
    realtime = encoder.quality == "rt"

    header = make_inter_header(quant_indices, rebase_kf_header)
    from alfalfa_tpu.util import tracing
    with tracing.stage("enc.inter_inputs"):
        orig, planes, tables = _kernel_inputs(encoder, yuv, interpret)
        mbc, ibc, mvc2p, pcost, sadcost, mvcost = tables

    # --two-pass: trellis-quantize intra MBs in-kernel (host twin:
    # encode_inter_np trellis_ctx; the reference interframe path is
    # FIRST_PASS-only, encode_inter.cc:614-622)
    two_pass = getattr(encoder, "two_pass", False)
    tct_arg = ()
    if two_pass:
        from alfalfa_tpu.ops import trellis_pallas as TRP
        tcpm = TRP.token_costs_pm(
            encoder.state.probability_tables.coeff_probs)
        order = (T.BLOCK_Y_WITHOUT_Y2, T.BLOCK_Y_AFTER_Y2,
                 T.BLOCK_UV, T.BLOCK_Y2)
        tct_arg = (jnp.asarray(
            np.concatenate([tcpm[bt] for bt in order], axis=0)),)

    with tracing.stage("enc.inter_kernel"):
        co, sp, md, ry, ru, rv = _inter_fn(R, C, realtime, interpret,
                                           trellis=two_pass)(
            *planes, jnp.asarray(_scalars_for(quant_indices)),
            mbc, ibc, mvc2p, pcost, sadcost, mvcost, *tct_arg)

    from . import device_fetch
    import jax
    from alfalfa_tpu.util.xfer import get_packed
    with tracing.stage("enc.inter_fetch"):
        if sp is not None:
            # ONE packed D2H transfer for everything the host needs
            sp_h, md_h, ry_h, ru_h, rv_h = get_packed(
                (sp, md, ry, ru, rv))
            co_h = device_fetch.rebuild(sp_h, co, R * C * 400) \
                .reshape(R, C, 400)
        else:
            md_h, ry_h, ru_h, rv_h = get_packed((md, ry, ru, rv))
            co_h = np.asarray(co).reshape(R, C, 400).astype(np.int16)
    with tracing.stage("enc.inter_host"):
        md_h = np.asarray(md_h).reshape(R, C, 32).astype(np.int32)
        arrays, recon = _outputs_to_frame(co_h, md_h, ry_h, ru_h, rv_h,
                                          R, C, W, H)
        out = finish_interframe(encoder, header, arrays, recon, orig,
                                update)
    if update:
        with tracing.stage("enc.inter_refcache"):
            _cache_device_refs(encoder, header, arrays, ry, ru, rv,
                               interpret)
    return out


def _outputs_to_frame(co_h, md_h, ry, ru, rv, R, C, W, H):
    """Kernel outputs -> (FrameArrays, reconstructed Raster)."""
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
    arrays.uv_mv[..., 0] = md_h[:, :, 6].reshape(R, C, *([1] * (arrays.uv_mv.ndim - 3)))
    arrays.uv_mv[..., 1] = md_h[:, :, 7].reshape(R, C, *([1] * (arrays.uv_mv.ndim - 3)))

    recon = Raster(W, H,
                   _untile(ry, R, C, 16).astype(np.uint8),
                   _untile(ru, R, C, 8).astype(np.uint8),
                   _untile(rv, R, C, 8).astype(np.uint8))
    return arrays, recon


def encode_interframe_device_multiqp(encoders, yuv, quant_list, update=True,
                                     interpret=False):
    """Encode the SAME raster at several quantizers in ONE device dispatch
    (the Salsify speculative pair, salsify-sender.cc:490-518): the QP axis
    rides a vmap over the scalar table, so motion search + mode decision
    for both candidates share one kernel launch and all plane uploads.

    encoders: one Encoder fork per quantizer, all in the identical state.
    Returns a list of (payload, quality) in quant_list order; each fork's
    state advances by its own result when ``update``."""
    import jax
    import jax.numpy as jnp

    if not interpret and jax.default_backend() != "tpu":
        interpret = True

    enc0 = encoders[0]
    W, H = enc0.width, enc0.height
    R, C = enc0.mb_rows, enc0.mb_cols
    realtime = enc0.quality == "rt"
    n = len(quant_list)

    orig, planes, tables = _kernel_inputs(enc0, yuv, interpret)
    mbc, ibc, mvc2p, pcost, sadcost, mvcost = tables
    scalars = jnp.asarray(np.stack([_scalars_for(qi) for qi in quant_list]))

    from . import device_fetch
    sparse = device_fetch.enabled()
    key = (R, C, realtime, interpret, n, sparse)
    fn = _FN_CACHE.get(key)
    if fn is None:
        vf = jax.vmap(_inter_raw(R, C, realtime, interpret, sparse),
                      in_axes=(None,) * 6 + (0,) + (None,) * 6)
        fn = vf if interpret else jax.jit(vf)
        _FN_CACHE[key] = fn

    co, sp, md, ry, ru, rv = fn(*planes, scalars, mbc, ibc, mvc2p, pcost,
                                sadcost, mvcost)
    from alfalfa_tpu.util.xfer import get_packed
    if sp is not None:
        sp_h, md_h, ry_h, ru_h, rv_h = get_packed((sp, md, ry, ru, rv))
        idx, val, cnt = sp_h
        co_rows = [device_fetch.rebuild((idx[i], val[i], cnt[i]), co[i],
                                        R * C * 400)
                   for i in range(n)]
    else:
        co_all, md_h, ry_h, ru_h, rv_h = get_packed((co, md, ry, ru, rv))
        co_rows = [co_all[i].reshape(-1).astype(np.int16) for i in range(n)]

    results = []
    for i, (enc, qi) in enumerate(zip(encoders, quant_list)):
        header = make_inter_header(qi, None)
        arrays, recon = _outputs_to_frame(
            co_rows[i].reshape(R, C, 400),
            md_h[i].reshape(R, C, 32).astype(np.int32),
            ry_h[i], ru_h[i], rv_h[i], R, C, W, H)
        results.append(finish_interframe(enc, header, arrays, recon, orig,
                                         update))
        if update:
            _cache_device_refs(enc, header, arrays, ry[i], ru[i], rv[i],
                               interpret)
    return results
