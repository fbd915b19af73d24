"""Intra (keyframe + intra-MB) encoding: mode decision, transform, quantize,
inline reconstruction.  Scalar numpy implementation — the behavior oracle
for the batched device encoder.

Mirrors reference encoder/encode_intra.cc:36-456: whole-MB modes are scored
by variance (the DC moves into Y2), B_PRED subblocks by SSE with
reconstruction-in-the-loop; chroma by SSE over both planes.
"""
import numpy as np

from alfalfa_tpu.bitstream import tables as T
from alfalfa_tpu.decoder import reconstruct_np as R
from alfalfa_tpu.decoder.parse import FrameArrays
from . import transforms_np as FX
from .costs import Costs, rdcost, rd_multipliers

_COSTS = Costs()


def _variance(orig, pred):
    d = orig.astype(np.int32) - pred.astype(np.int32)
    s = int(d.sum())
    return int((d * d).sum()) - (s * s) // d.size


def _sse(orig, pred):
    d = orig.astype(np.int32) - pred.astype(np.int32)
    return int((d * d).sum())


def _predict_whole(plane, col, row, size, mode):
    """Prediction block without writing it into the plane."""
    saved = plane[row * size:(row + 1) * size, col * size:(col + 1) * size].copy()
    R.intra_predict_mb(plane, col, row, size, mode)
    pred = plane[row * size:(row + 1) * size, col * size:(col + 1) * size].copy()
    plane[row * size:(row + 1) * size, col * size:(col + 1) * size] = saved
    return pred


def _predict_b(plane, col4, row4, mode):
    saved = plane[row4 * 4:row4 * 4 + 4, col4 * 4:col4 * 4 + 4].copy()
    R.intra_predict_b(plane, col4, row4, mode)
    pred = plane[row4 * 4:row4 * 4 + 4, col4 * 4:col4 * 4 + 4].copy()
    plane[row4 * 4:row4 * 4 + 4, col4 * 4:col4 * 4 + 4] = saved
    return pred


def encode_intra_mb(orig, recon, arrays, r, c, q, rate_mult, dist_mult,
                    interframe=False, bmode_costs_ctx=None, trellis=None,
                    skip_bpred=False):
    """Encode one intra macroblock against the current reconstruction;
    writes coefficients/modes into ``arrays`` and the reconstructed pixels
    into ``recon`` (the decoder-identical reconstruction).

    skip_bpred: evaluate only the four whole-MB modes (the fast rt
    interframe path's latency trade — the 16-subblock B_PRED search is
    ~10x the cost of the whole-mode scan; encode_inter_fast.py)."""
    oy, ou, ov = orig
    mode_cost_idx = 1 if interframe else 0

    # ---- luma: B_PRED candidate (reconstruction-in-the-loop) ----
    bpred_rate = int(_COSTS.mbmode_costs[mode_cost_idx][T.B_PRED])
    bpred_dist = 0
    bpred_coeffs = np.zeros((16, 16), np.int16)
    bpred_modes = np.zeros((4, 4), np.int8)
    saved_y = recon.y[r * 16:(r + 1) * 16, c * 16:(c + 1) * 16].copy()

    for sr in range(0 if skip_bpred else 4):
        for sc in range(4):
            col4, row4 = c * 4 + sc, r * 4 + sr
            osb = oy[row4 * 4:row4 * 4 + 4, col4 * 4:col4 * 4 + 4]
            # per-subblock mode search
            best = (1 << 62, 0, None)
            if interframe:
                mode_costs = _COSTS.inter_bmode_costs
            else:
                if sr > 0:
                    above = int(bpred_modes[sr - 1, sc])
                elif r > 0:
                    above = int(arrays.bmode[r - 1, c, 3, sc])
                else:
                    above = T.B_DC_PRED
                if sc > 0:
                    left = int(bpred_modes[sr, sc - 1])
                elif c > 0:
                    left = int(arrays.bmode[r, c - 1, sr, 3])
                else:
                    left = T.B_DC_PRED
                mode_costs = _COSTS.bmode_costs[above, left]
            from alfalfa_tpu.native import enckernel
            if enckernel.available():
                m, pred = enckernel.bpred_search(
                    recon.y, col4, row4, osb,
                    np.asarray(mode_costs, np.int64), rate_mult, dist_mult)
            else:
                for m in range(T.NUM_INTRA_B_MODES):
                    pred = _predict_b(recon.y, col4, row4, m)
                    dist = _sse(osb, pred)
                    cost = rdcost(int(mode_costs[m]), dist,
                                  rate_mult, dist_mult)
                    if cost < best[0]:
                        best = (cost, m, pred)
                _, m, pred = best
            bpred_modes[sr, sc] = m
            bpred_rate += int(mode_costs[m])
            bpred_dist += _sse(osb, pred)
            # transform + quantize + reconstruct in place
            coeffs = FX.subtract_fdct(osb, pred)
            if trellis is not None:
                qc = trellis.quantize_y(coeffs, r, c, sr, sc, after_y2=False)
            else:
                qc = FX.quantize(coeffs, q["y_dc"], q["y_ac"])
            bpred_coeffs[sr * 4 + sc] = qc
            dq = R.dequantize(qc, q["y_dc"], q["y_ac"])
            blk = recon.y[row4 * 4:row4 * 4 + 4, col4 * 4:col4 * 4 + 4]
            blk[:] = pred
            R.idct_add(dq, blk)

    bpred_cost = (1 << 62 if skip_bpred
                  else rdcost(bpred_rate, bpred_dist, rate_mult, dist_mult))
    bpred_recon = recon.y[r * 16:(r + 1) * 16, c * 16:(c + 1) * 16].copy()
    recon.y[r * 16:(r + 1) * 16, c * 16:(c + 1) * 16] = saved_y

    # ---- luma: whole-MB modes ----
    best_whole = (1 << 62, None, None)
    o16 = oy[r * 16:(r + 1) * 16, c * 16:(c + 1) * 16]
    for m in range(T.B_PRED):
        pred = _predict_whole(recon.y, c, r, 16, m)
        dist = _variance(o16, pred)
        cost = rdcost(int(_COSTS.mbmode_costs[mode_cost_idx][m]), dist,
                      rate_mult, dist_mult)
        if cost < best_whole[0]:
            best_whole = (cost, m, pred)

    if bpred_cost < best_whole[0]:
        ymode = T.B_PRED
        arrays.ymode[r, c] = T.B_PRED
        arrays.bmode[r, c] = bpred_modes
        arrays.coeffs[r, c, 0:16] = bpred_coeffs
        arrays.y2_coded[r, c] = False
        recon.y[r * 16:(r + 1) * 16, c * 16:(c + 1) * 16] = bpred_recon
    else:
        _, ymode, pred = best_whole
        arrays.ymode[r, c] = ymode
        arrays.bmode[r, c] = {T.DC_PRED: T.B_DC_PRED, T.V_PRED: T.B_VE_PRED,
                              T.H_PRED: T.B_HE_PRED, T.TM_PRED: T.B_TM_PRED}[ymode]
        arrays.y2_coded[r, c] = True
        # whole-mode transform path: per-subblock fDCT, DCs -> Y2 WHT
        walsh_input = np.zeros(16, np.int16)
        for sr in range(4):
            for sc in range(4):
                osb = o16[sr * 4:sr * 4 + 4, sc * 4:sc * 4 + 4]
                psb = pred[sr * 4:sr * 4 + 4, sc * 4:sc * 4 + 4]
                coeffs = FX.subtract_fdct(osb, psb)
                walsh_input[sr * 4 + sc] = coeffs[0]
                coeffs[0] = 0
                if trellis is not None:
                    arrays.coeffs[r, c, sr * 4 + sc] = trellis.quantize_y(
                        coeffs, r, c, sr, sc, after_y2=True)
                else:
                    arrays.coeffs[r, c, sr * 4 + sc] = FX.quantize(
                        coeffs, q["y_dc"], q["y_ac"])
        y2 = FX.fwht(walsh_input)
        if trellis is not None:
            arrays.coeffs[r, c, 24] = trellis.quantize_y2(y2, r, c)
        else:
            arrays.coeffs[r, c, 24] = FX.quantize(y2, q["y2_dc"], q["y2_ac"])
        # reconstruct via the decoder path (prediction + walsh + idct_add)
        recon.y[r * 16:(r + 1) * 16, c * 16:(c + 1) * 16] = pred
        R._apply_walsh(arrays, recon, r, c, q)

    # ---- chroma ----
    best_uv = (1 << 62, None, None, None)
    ou8 = ou[r * 8:(r + 1) * 8, c * 8:(c + 1) * 8]
    ov8 = ov[r * 8:(r + 1) * 8, c * 8:(c + 1) * 8]
    for m in range(T.NUM_UV_MODES):
        pu = _predict_whole(recon.u, c, r, 8, m)
        pv = _predict_whole(recon.v, c, r, 8, m)
        dist = _sse(ou8, pu) + _sse(ov8, pv)
        # reference picks chroma by raw distortion (encode_intra.cc:276)
        if dist < best_uv[0]:
            best_uv = (dist, m, pu, pv)
    _, uvmode, pu, pv = best_uv
    arrays.uvmode[r, c] = uvmode
    for plane, opl, ppl, base in ((recon.u, ou8, pu, 16), (recon.v, ov8, pv, 20)):
        for sr in range(2):
            for sc in range(2):
                osb = opl[sr * 4:sr * 4 + 4, sc * 4:sc * 4 + 4]
                psb = ppl[sr * 4:sr * 4 + 4, sc * 4:sc * 4 + 4]
                coeffs = FX.subtract_fdct(osb, psb)
                if trellis is not None:
                    qc = trellis.quantize_uv(coeffs, r, c, sr, sc,
                                             0 if base == 16 else 1)
                else:
                    qc = FX.quantize(coeffs, q["uv_dc"], q["uv_ac"])
                arrays.coeffs[r, c, base + sr * 2 + sc] = qc
                dq = R.dequantize(qc, q["uv_dc"], q["uv_ac"])
                blk = plane[r * 8 + sr * 4:r * 8 + sr * 4 + 4,
                            c * 8 + sc * 4:c * 8 + sc * 4 + 4]
                blk[:] = psb
                R.idct_add(dq, blk)

    arrays.has_nonzero[r, c] = bool(arrays.coeffs[r, c].any())
    arrays.ref[r, c] = T.CURRENT_FRAME
