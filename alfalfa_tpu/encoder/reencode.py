"""Frame rebasing: the ExCamera core (reference encoder/reencode.cc).

- ``reencode_as_interframe``: re-encode a chunk's leading keyframe as an
  interframe against inherited references (full motion search).
- ``update_residues``: reuse a prediction frame's modes/MVs verbatim and
  recompute + requantize only the residues against the (drifted) references.
- ``reencode``: the chunk driver (kf_q_weight blending, extra-frame chunks,
  last-frame refresh-all).
"""
import numpy as np

from alfalfa_tpu.bitstream import tables as T
from alfalfa_tpu.bitstream.header import InterFrameHeader, QuantIndices
from alfalfa_tpu.decoder import reconstruct_np as R
from alfalfa_tpu.decoder.parse import FrameArrays
from alfalfa_tpu.state.decoder_state import DecoderState, FilterAdjustments, Raster
from . import encode_intra_np, transforms_np as FX
from .costs import rd_multipliers
from .serializer import (serialize_frame, count_token_branches,
                         optimize_token_probs)


def _apply_intra_mb(orig, recon, arrays, r, c, q):
    """Re-apply fixed intra modes (from the prediction frame) and requantize
    residues (update_macroblock intra paths, reencode.cc:131-160, 215-230)."""
    oy, ou, ov = orig
    ymode = int(arrays.ymode[r, c])
    o16 = oy[r * 16:(r + 1) * 16, c * 16:(c + 1) * 16]

    if ymode == T.B_PRED:
        for sr in range(4):
            for sc in range(4):
                col4, row4 = c * 4 + sc, r * 4 + sr
                osb = oy[row4 * 4:row4 * 4 + 4, col4 * 4:col4 * 4 + 4]
                pred = encode_intra_np._predict_b(recon.y, col4, row4,
                                                  int(arrays.bmode[r, c, sr, sc]))
                coeffs = FX.subtract_fdct(osb, pred)
                qc = FX.quantize(coeffs, q["y_dc"], q["y_ac"])
                arrays.coeffs[r, c, sr * 4 + sc] = qc
                dq = R.dequantize(qc, q["y_dc"], q["y_ac"])
                blk = recon.y[row4 * 4:row4 * 4 + 4, col4 * 4:col4 * 4 + 4]
                blk[:] = pred
                R.idct_add(dq, blk)
        arrays.y2_coded[r, c] = False
    else:
        pred = encode_intra_np._predict_whole(recon.y, c, r, 16, ymode)
        walsh_input = np.zeros(16, np.int16)
        for sr in range(4):
            for sc in range(4):
                osb = o16[sr * 4:sr * 4 + 4, sc * 4:sc * 4 + 4]
                psb = pred[sr * 4:sr * 4 + 4, sc * 4:sc * 4 + 4]
                coeffs = FX.subtract_fdct(osb, psb)
                walsh_input[sr * 4 + sc] = coeffs[0]
                coeffs[0] = 0
                arrays.coeffs[r, c, sr * 4 + sc] = FX.quantize(coeffs, q["y_dc"], q["y_ac"])
        arrays.coeffs[r, c, 24] = FX.quantize(FX.fwht(walsh_input),
                                              q["y2_dc"], q["y2_ac"])
        arrays.y2_coded[r, c] = True
        recon.y[r * 16:(r + 1) * 16, c * 16:(c + 1) * 16] = pred
        R._apply_walsh(arrays, recon, r, c, {k: np.int32(v) for k, v in q.items()})

    # chroma: fixed uv mode
    uvmode = int(arrays.uvmode[r, c])
    pu = encode_intra_np._predict_whole(recon.u, c, r, 8, uvmode)
    pv = encode_intra_np._predict_whole(recon.v, c, r, 8, uvmode)
    _requant_chroma(orig, recon, arrays, r, c, q, pu, pv)


def _requant_chroma(orig, recon, arrays, r, c, q, pu, pv):
    _, ou, ov = orig
    for plane, opl, ppl, base in ((recon.u, ou, pu, 16), (recon.v, ov, pv, 20)):
        for sr in range(2):
            for sc in range(2):
                osb = opl[r * 8 + sr * 4:r * 8 + sr * 4 + 4,
                          c * 8 + sc * 4:c * 8 + sc * 4 + 4]
                psb = ppl[sr * 4:sr * 4 + 4, sc * 4:sc * 4 + 4]
                qc = FX.quantize(FX.subtract_fdct(osb, psb), q["uv_dc"], q["uv_ac"])
                arrays.coeffs[r, c, base + sr * 2 + sc] = qc
                dq = R.dequantize(qc, q["uv_dc"], q["uv_ac"])
                blk = plane[r * 8 + sr * 4:r * 8 + sr * 4 + 4,
                            c * 8 + sc * 4:c * 8 + sc * 4 + 4]
                blk[:] = psb
                R.idct_add(dq, blk)


def _apply_inter_mb(orig, recon, arrays, r, c, q, references):
    """Fixed-MV inter path of update_macroblock (reencode.cc:162-210)."""
    from .encode_inter_np import _inter_predict_into
    oy, ou, ov = orig
    ref = references.at(int(arrays.ref[r, c]))
    splitmv = int(arrays.ymode[r, c]) == T.SPLITMV
    o16 = oy[r * 16:(r + 1) * 16, c * 16:(c + 1) * 16]

    pred16 = np.zeros((16, 16), np.uint8)
    if splitmv:
        for sr in range(4):
            for sc in range(4):
                _inter_predict_into(ref.y, pred16[sr * 4:sr * 4 + 4, sc * 4:sc * 4 + 4],
                                    c * 16 + sc * 4, r * 16 + sr * 4, 4,
                                    tuple(int(v) for v in arrays.sub_mv[r, c, sr, sc]))
        for sr in range(4):
            for sc in range(4):
                osb = o16[sr * 4:sr * 4 + 4, sc * 4:sc * 4 + 4]
                psb = pred16[sr * 4:sr * 4 + 4, sc * 4:sc * 4 + 4]
                arrays.coeffs[r, c, sr * 4 + sc] = FX.quantize(
                    FX.subtract_fdct(osb, psb), q["y_dc"], q["y_ac"])
        arrays.coeffs[r, c, 24] = 0
        arrays.y2_coded[r, c] = False
    else:
        mv = tuple(int(v) for v in arrays.sub_mv[r, c, 3, 3])
        _inter_predict_into(ref.y, pred16, c * 16, r * 16, 16, mv)
        walsh_input = np.zeros(16, np.int16)
        for sr in range(4):
            for sc in range(4):
                osb = o16[sr * 4:sr * 4 + 4, sc * 4:sc * 4 + 4]
                psb = pred16[sr * 4:sr * 4 + 4, sc * 4:sc * 4 + 4]
                coeffs = FX.subtract_fdct(osb, psb)
                walsh_input[sr * 4 + sc] = coeffs[0]
                coeffs[0] = 0
                arrays.coeffs[r, c, sr * 4 + sc] = FX.quantize(coeffs, q["y_dc"], q["y_ac"])
        arrays.coeffs[r, c, 24] = FX.quantize(FX.fwht(walsh_input),
                                              q["y2_dc"], q["y2_ac"])
        arrays.y2_coded[r, c] = True

    # chroma from the (copied) chroma MVs
    pu = np.zeros((8, 8), np.uint8)
    pv = np.zeros((8, 8), np.uint8)
    if splitmv:
        for sr in range(2):
            for sc in range(2):
                mv = tuple(int(v) for v in arrays.uv_mv[r, c, sr, sc])
                _inter_predict_into(ref.u, pu[sr * 4:sr * 4 + 4, sc * 4:sc * 4 + 4],
                                    c * 8 + sc * 4, r * 8 + sr * 4, 4, mv)
                _inter_predict_into(ref.v, pv[sr * 4:sr * 4 + 4, sc * 4:sc * 4 + 4],
                                    c * 8 + sc * 4, r * 8 + sr * 4, 4, mv)
    else:
        mv = tuple(int(v) for v in arrays.uv_mv[r, c, 0, 0])
        _inter_predict_into(ref.u, pu, c * 8, r * 8, 8, mv)
        _inter_predict_into(ref.v, pv, c * 8, r * 8, 8, mv)

    _, ou_, ov_ = orig
    for opl, ppl, base in ((ou_, pu, 16), (ov_, pv, 20)):
        for sr in range(2):
            for sc in range(2):
                osb = opl[r * 8 + sr * 4:r * 8 + sr * 4 + 4,
                          c * 8 + sc * 4:c * 8 + sc * 4 + 4]
                psb = ppl[sr * 4:sr * 4 + 4, sc * 4:sc * 4 + 4]
                arrays.coeffs[r, c, base + sr * 2 + sc] = FX.quantize(
                    FX.subtract_fdct(osb, psb), q["uv_dc"], q["uv_ac"])

    arrays.has_nonzero[r, c] = bool(arrays.coeffs[r, c].any())
    R._reconstruct_inter_mb(arrays, recon, references, r, c,
                            {k: np.int32(v) for k, v in q.items()})


def update_residues(encoder, orig_yuv, pred_header, pred_arrays,
                    quant_indices, last_frame):
    """Rebuild an interframe with the prediction frame's modes/MVs but fresh
    residues against the encoder's current references
    (reencode.cc:236-303)."""
    from .encoder import _pad_raster, calc_prob

    W, H = encoder.width, encoder.height
    R_, C_ = encoder.mb_rows, encoder.mb_cols
    orig = _pad_raster(*orig_yuv, W, H)
    refs = encoder.references
    for ref in (refs.last, refs.golden, refs.alternative):
        ref.to_host()

    oh = pred_header
    header = InterFrameHeader()
    header.update_segmentation = oh.update_segmentation
    header.filter_type = oh.filter_type
    header.loop_filter_level = oh.loop_filter_level
    header.sharpness_level = oh.sharpness_level
    header.mode_lf_adjustments = oh.mode_lf_adjustments
    header.mode_lf_adjustments_enabled = oh.mode_lf_adjustments_enabled
    header.sign_bias_golden = oh.sign_bias_golden
    header.sign_bias_alternate = oh.sign_bias_alternate
    header.refresh_entropy_probs = oh.refresh_entropy_probs
    header.prob_references_last = oh.prob_references_last
    header.prob_references_golden = oh.prob_references_golden
    header.prob_inter = oh.prob_inter
    if last_frame:
        header.refresh_last = True
        header.refresh_golden_frame = True
        header.refresh_alternate_frame = True
        header.copy_buffer_to_golden = None
        header.copy_buffer_to_alternate = None
    else:
        header.refresh_last = oh.refresh_last
        header.refresh_golden_frame = oh.refresh_golden_frame
        header.refresh_alternate_frame = oh.refresh_alternate_frame
        header.copy_buffer_to_golden = oh.copy_buffer_to_golden
        header.copy_buffer_to_alternate = oh.copy_buffer_to_alternate
    header.quant_indices = quant_indices

    # copy modes/MVs from the prediction frame
    arrays = FrameArrays(R_, C_)
    for field in ("ymode", "uvmode", "ref", "bmode", "sub_mv", "uv_mv",
                  "splitmv_pid", "segment_update"):
        getattr(arrays, field)[:] = getattr(pred_arrays, field)

    recon = Raster(W, H)
    q = {k: int(v) for k, v in quant_indices.quantizer().items()}
    oplanes = (orig.y, orig.u, orig.v)

    if getattr(encoder, "device_encode", False):
        # all inter MBs at once on device (fixed MVs -> no dependencies);
        # intra MBs keep the raster-order host loop below, which is
        # order-equivalent because inter MBs never read intra output
        from .reencode_device import apply_inter_residues_device
        inter_done = apply_inter_residues_device(oplanes, recon, arrays, q,
                                                 refs)
        for r in range(R_):
            for c in range(C_):
                if not inter_done[r, c]:
                    _apply_intra_mb(oplanes, recon, arrays, r, c, q)
                    arrays.has_nonzero[r, c] = bool(arrays.coeffs[r, c].any())
    else:
        for r in range(R_):
            for c in range(C_):
                if int(arrays.ref[r, c]) == T.CURRENT_FRAME:
                    _apply_intra_mb(oplanes, recon, arrays, r, c, q)
                    arrays.has_nonzero[r, c] = bool(arrays.coeffs[r, c].any())
                else:
                    _apply_inter_mb(oplanes, recon, arrays, r, c, q, refs)

    no_skip = int(arrays.has_nonzero.sum())
    header.prob_skip_false = calc_prob(no_skip, arrays.has_nonzero.size)
    arrays.skip_coeff[:] = ~arrays.has_nonzero

    _optimize_ref_probs(header, arrays)
    counts = count_token_branches(arrays)
    header.token_prob_update = optimize_token_probs(
        counts, encoder.state.probability_tables.coeff_probs)
    frame_probs = encoder.state.probability_tables.copy()
    frame_probs.update(header)

    return header, arrays, frame_probs, recon


def _optimize_ref_probs(header, arrays):
    from .encoder import calc_prob
    n_intra = int((arrays.ref == T.CURRENT_FRAME).sum())
    n_last = int((arrays.ref == T.LAST_FRAME).sum())
    n_golden = int((arrays.ref == T.GOLDEN_FRAME).sum())
    n_alt = int((arrays.ref == T.ALTREF_FRAME).sum())
    total = arrays.ref.size
    p = calc_prob(n_intra, total)
    if p > 0:
        header.prob_inter = p
    p = calc_prob(n_last, n_last + n_golden + n_alt)
    if p > 0:
        header.prob_references_last = p
    p = calc_prob(n_golden, n_golden + n_alt)
    if p > 0:
        header.prob_references_golden = p


def finish_frame(encoder, header, arrays, frame_probs, recon, orig_yuv):
    """write_frame equivalent: loopfilter the reconstruction, update encoder
    state + references per header flags, serialize (encoder.cc:146-176)."""
    from .encoder import _pad_raster

    W, H = encoder.width, encoder.height
    lf_state = DecoderState(W, H, frame_probs, None,
                            FilterAdjustments.create(header)
                            if header.mode_lf_adjustments_enabled else None)
    filtered = recon.copy()
    R._loopfilter_frame(header, arrays, lf_state, filtered, False)

    payload = serialize_frame(header, arrays, frame_probs, False, W, H)

    # update_decoder_state + reference refresh
    if header.refresh_entropy_probs:
        encoder.state.probability_tables = frame_probs.copy()
    if header.mode_lf_adjustments_enabled:
        encoder.state.filter_adjustments = FilterAdjustments.create(header)
    else:
        encoder.state.filter_adjustments = None

    refs = encoder.references
    if header.copy_buffer_to_alternate == 1:
        refs.alternative = refs.last
    elif header.copy_buffer_to_alternate == 2:
        refs.alternative = refs.golden
    if header.copy_buffer_to_golden == 1:
        refs.golden = refs.last
    elif header.copy_buffer_to_golden == 2:
        refs.golden = refs.alternative
    if header.refresh_golden_frame:
        refs.golden = filtered
    if header.refresh_alternate_frame:
        refs.alternative = filtered
    if header.refresh_last:
        refs.last = filtered
    return payload


def reencode_as_interframe(encoder, orig_yuv, kf_header, quant_indices):
    """Re-encode a keyframe as an interframe against the encoder's current
    (inherited) references (reencode.cc:37-129): a full inter encode with
    the keyframe's filter settings and refresh-all semantics."""
    if encoder.device_encode and not encoder.two_pass:
        from .encode_inter_device import encode_interframe_device
        payload, _ = encode_interframe_device(
            encoder, orig_yuv, quant_indices, update=True,
            rebase_kf_header=kf_header)
        return payload
    from . import encode_inter_np

    payload, _ = encode_inter_np.encode_interframe(
        encoder, orig_yuv, quant_indices, update=True,
        rebase_kf_header=kf_header)
    return payload


def reencode(encoder, original_rasters, prediction_frames, kf_q_weight,
             extra_frame_chunk, ivf_writer):
    """Chunk rebase driver (reencode.cc:305-381).

    original_rasters: list of (y, u, v); prediction_frames: list of
    (key_frame: bool, header, arrays) parsed from the prediction IVF."""
    if not original_rasters:
        raise ValueError("no rasters to re-encode")
    if len(original_rasters) != len(prediction_frames):
        raise ValueError("prediction/original_rasters mismatch")

    start = 1 if extra_frame_chunk else 0
    n = len(original_rasters)

    for i in range(start, n):
        target = original_rasters[i]
        last_frame = i == n - 1
        kf, header, arrays = prediction_frames[i]

        if i == start and kf:
            new_q = QuantIndices(**vars(header.quant_indices))
            if i + 1 < n and not prediction_frames[i + 1][0]:
                next_q = prediction_frames[i + 1][1].quant_indices.y_ac_qi
                new_q.y_ac_qi = int(round(
                    kf_q_weight * header.quant_indices.y_ac_qi
                    + (1 - kf_q_weight) * next_q))
            payload = reencode_as_interframe(encoder, target, header, new_q)
        elif i == start and extra_frame_chunk:
            if not prediction_frames[0][0]:
                raise ValueError("extra-frame chunks must start with a keyframe")
            new_q = QuantIndices(**vars(header.quant_indices))
            new_q.y_ac_qi = int(round(
                kf_q_weight * prediction_frames[0][1].quant_indices.y_ac_qi
                + (1 - kf_q_weight) * header.quant_indices.y_ac_qi))
            h, a, fp, recon = update_residues(encoder, target, header, arrays,
                                              new_q, last_frame)
            payload = finish_frame(encoder, h, a, fp, recon, target)
        elif kf:
            # preserve interior keyframes: serializing the parsed frame is
            # byte-identical (roundtrip invariant); keyframes reset decoder
            # state, so serialize against default tables + header updates
            from alfalfa_tpu.state.decoder_state import ProbabilityTables
            fp = ProbabilityTables()
            fp.coeff_prob_update(header)
            payload = serialize_frame(header, arrays, fp, True,
                                      encoder.width, encoder.height)
            # advance the encoder's state/references like a decoder would
            from alfalfa_tpu.decoder.decoder import Decoder
            d = Decoder(encoder.width, encoder.height,
                        state=encoder.state, references=encoder.references)
            d.decode_frame(payload)
            encoder.state = d.state
            encoder.references = d.references
        else:
            h, a, fp, recon = update_residues(encoder, target, header, arrays,
                                              header.quant_indices, last_frame)
            payload = finish_frame(encoder, h, a, fp, recon, target)

        ivf_writer.append_frame(payload)
