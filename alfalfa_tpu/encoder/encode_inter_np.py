"""Inter-frame encoding: motion search + mode decision + residue coding.

Scalar numpy implementation mirroring reference encoder/encode_inter.cc:
- candidate modes ZEROMV / NEARESTMV / NEARMV / NEWMV (SPLITMV is not
  searched, matching the reference) plus the intra modes
- NEWMV via iterated diamond search (step 512 -> 1 in 1/8-pel units)
- whole-MB Y2/WHT residue path, chroma from averaged MVs
- per-frame prob_skip / reference-prob / token-prob optimization
"""
import numpy as np

from alfalfa_tpu.bitstream import tables as T
from alfalfa_tpu.bitstream.header import InterFrameHeader, ModeRefLFDeltaUpdate
from alfalfa_tpu.decoder import reconstruct_np as R
from alfalfa_tpu.decoder.parse import FrameArrays, mv_census, clamp_mv
from alfalfa_tpu.state.decoder_state import DecoderState, FilterAdjustments, Raster
from alfalfa_tpu.util.ssim import ssim
from . import encode_intra_np, transforms_np as FX
from .costs import Costs, rdcost, rd_multipliers, cost_bit, tree_leaf_costs
from .serializer import count_token_branches, optimize_token_probs

_COSTS = Costs()

# libvpx:vp8/encoder/rdopt.c:135
SAD_PER_BIT16 = np.array([
    2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 3, 3,
    3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 4, 4, 4, 4, 4, 4, 4, 4,
    4, 4, 4, 4, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 6, 6, 6,
    6, 6, 6, 6, 6, 6, 6, 6, 6, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7,
    7, 7, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8, 9, 9, 9, 9, 9,
    9, 9, 9, 9, 9, 9, 9, 10, 10, 10, 10, 10, 10, 10, 10, 11, 11, 11, 11,
    11, 11, 12, 12, 12, 12, 12, 12, 13, 13, 13, 13, 14, 14], np.int32)

# mv sad costs (libvpx onyx_if.c:1698): index |v>>2| clamped to 255
_MV_SAD_COST = np.zeros(256, np.int64)
_MV_SAD_COST[0] = 300
_i = np.arange(1, 256, dtype=np.float32)
_MV_SAD_COST[1:] = (256 * (2 * np.log2(8 * _i) + np.float32(0.6))).astype(np.int64)


def _sad_mv_cost(mv, weight):
    x = max(min(mv[0] >> 2, 255), -255)
    y = max(min(mv[1] >> 2, 255), -255)
    return (int(_MV_SAD_COST[abs(y)] + _MV_SAD_COST[abs(x)]) * weight + 128) // 256


class MVComponentCostTable:
    """mv_component_costs over persistent MV probabilities
    (costs.cc:113-132)."""

    def __init__(self, mv_probs):
        self.table = np.zeros((2, 2, 1024), np.uint32)
        for comp in range(2):
            probs = mv_probs[comp]
            base0 = _COSTS.mv_component_cost(0, probs)
            self.table[comp, 0, 0] = self.table[comp, 1, 0] = base0
            sign_cost0 = cost_bit(int(probs[1]), 0)
            sign_cost1 = cost_bit(int(probs[1]), 1)
            for i in range(1, 1024):
                # mv_component_cost already adds a sign-0 bit for nonzero
                c = _COSTS.mv_component_cost(i << 1, probs) - sign_cost0
                self.table[comp, 0, i] = c + sign_cost0
                self.table[comp, 1, i] = c + sign_cost1

    def mv_cost(self, mv, weight):
        """motion_vector_cost (costs.cc:222-226); mv in doubled-1/8 units."""
        return int((self.table[0, int(mv[1] < 0), abs(int(mv[1]))]
                    + self.table[1, int(mv[0] < 0), abs(int(mv[0]))])
                   * weight) // 128


def _sad(a, b):
    return int(np.abs(a.astype(np.int32) - b.astype(np.int32)).sum())


def _variance(a, b):
    d = a.astype(np.int32) - b.astype(np.int32)
    s = int(d.sum())
    return int((d * d).sum()) - (s * s) // d.size


def _inter_predict_into(ref_plane, out, px, py, size, mv):
    from alfalfa_tpu.native import enckernel
    if enckernel.available():
        enckernel.inter_predict_into(ref_plane, out, px, py, size, mv)
        return
    mx, my = mv[0] & 7, mv[1] & 7
    src_col = px + (mv[0] >> 3)
    src_row = py + (mv[1] >> 3)
    h, w = ref_plane.shape
    if mx == 0 and my == 0:
        rr = np.clip(np.arange(src_row, src_row + size), 0, h - 1)
        cc = np.clip(np.arange(src_col, src_col + size), 0, w - 1)
        out[:] = ref_plane[np.ix_(rr, cc)]
        return
    hf = R.SIXTAP[mx]
    rows = np.clip(np.arange(src_row - 2, src_row + size + 3), 0, h - 1)
    cols = np.clip(np.arange(src_col - 2, src_col + size + 3), 0, w - 1)
    patch = ref_plane[np.ix_(rows, cols)].astype(np.int32)
    inter = np.zeros((size + 5, size), np.int32)
    for k in range(6):
        inter += patch[:, k:k + size] * hf[k]
    inter = np.clip((inter + 64) >> 7, 0, 255)
    vf = R.SIXTAP[my]
    acc = np.zeros((size, size), np.int32)
    for k in range(6):
        acc += inter[k:k + size] * vf[k]
    out[:] = np.clip((acc + 64) >> 7, 0, 255).astype(np.uint8)


def _out_of_bounds(mv):
    return abs(mv[0]) > 1023 or abs(mv[1]) > 1023


def diamond_search(orig16, ref_y, r, c, R_, C_, base_mv, origin, step, qi):
    """encode_inter.cc:172-229; returns (mv, first_step)."""
    first_step = step // 2
    base_mv = clamp_mv(base_mv, c, r, C_, R_)
    sites = ((-1, 0), (0, -1), (0, 0), (0, 1), (1, 0))
    weight = int(SAD_PER_BIT16[qi])

    from alfalfa_tpu.native import enckernel
    if enckernel.available():
        return enckernel.diamond_search(ref_y, np.ascontiguousarray(orig16),
                                        r, c, R_, C_, base_mv, origin, step,
                                        weight, _MV_SAD_COST)
    pred = np.zeros((16, 16), np.uint8)

    while step > 1:
        best = (1 << 62, None)
        for sx, sy in sites:
            mv = (origin[0] + step * sx, origin[1] + step * sy)
            if _out_of_bounds(mv):
                continue
            this_mv = clamp_mv((mv[0] + base_mv[0], mv[1] + base_mv[1]),
                               c, r, C_, R_)
            _inter_predict_into(ref_y, pred, c * 16, r * 16, 16, this_mv)
            dist = _sad(orig16, pred)
            rate = _sad_mv_cost(mv, weight)
            cost = rdcost(rate, dist, 1, 1)
            if cost < best[0]:
                best = (cost, mv)
        if best[1] == origin:
            first_step = step // 2
        origin = best[1]
        step //= 2
    return origin, first_step


def make_inter_header(quant_indices, rebase_kf_header=None):
    """Interframe header skeleton shared by the host and device encoders."""
    header = InterFrameHeader()
    header.quant_indices = quant_indices
    header.refresh_entropy_probs = True
    header.refresh_last = True
    header.copy_buffer_to_golden = 0
    header.copy_buffer_to_alternate = 0
    header.prob_inter = 128
    header.prob_references_last = 128
    header.prob_references_golden = 128
    if rebase_kf_header is not None:
        # rebased chunk-leading frame: refresh every reference and emit
        # explicit default intra-mode probs (reencode.cc:50-72)
        header.refresh_golden_frame = True
        header.refresh_alternate_frame = True
        header.copy_buffer_to_golden = None
        header.copy_buffer_to_alternate = None
        header.sharpness_level = rebase_kf_header.sharpness_level
        header.intra_16x16_prob = [int(v) for v in T.DEFAULT_Y_MODE_PROBS]
        header.intra_chroma_prob = [int(v) for v in T.DEFAULT_UV_MODE_PROBS]
    return header


def encode_interframe(encoder, yuv, quant_indices, update, rebase_kf_header=None):
    from .encoder import _pad_raster

    W, H = encoder.width, encoder.height
    R_, C_ = encoder.mb_rows, encoder.mb_cols
    orig = _pad_raster(*yuv, W, H)
    refs = encoder.references
    for ref in (refs.last, refs.golden, refs.alternative):
        ref.to_host()

    header = make_inter_header(quant_indices, rebase_kf_header)
    arrays = FrameArrays(R_, C_)
    recon = Raster(W, H)
    q = {k: int(v) for k, v in quant_indices.quantizer().items()}
    rate_mult, dist_mult = rd_multipliers(q["y_ac"])
    qi = int(quant_indices.y_ac_qi)

    mv_table = MVComponentCostTable(encoder.state.probability_tables.mv_probs)
    flipped_map = np.zeros((R_, C_), bool)  # no sign biases emitted
    realtime = encoder.quality == "rt"

    # two-pass: trellis-quantize intra MBs (a documented superset — the
    # reference's interframe path hard-codes FIRST_PASS everywhere,
    # encode_inter.cc:614-622, so its encode_intra.cc:203 trellis branch
    # is dead for interframes; we apply it directly)
    trellis_ctx = None
    if getattr(encoder, "two_pass", False):
        from .trellis import TrellisContext
        trellis_ctx = TrellisContext(
            encoder.state.probability_tables.coeff_probs, R_, C_, q,
            rate_mult, dist_mult)

    oy, ou, ov = orig.y, orig.u, orig.v
    ref_y = refs.last.y
    pred16 = np.zeros((16, 16), np.uint8)

    for r in range(R_):
        for c in range(C_):
            o16 = oy[r * 16:(r + 1) * 16, c * 16:(c + 1) * 16]

            # census over already-encoded neighbors
            best_v, nearest, near, counts = mv_census(arrays, flipped_map, r, c, False)
            best_ref = clamp_mv(best_v, c, r, C_, R_)
            mv_ref_probs = [T.MV_COUNTS_TO_PROBS[counts[0]][0],
                            T.MV_COUNTS_TO_PROBS[counts[1]][1],
                            T.MV_COUNTS_TO_PROBS[counts[2]][2],
                            T.MV_COUNTS_TO_PROBS[counts[3]][3]]
            mv_ref_costs = tree_leaf_costs(T.MV_REF_TREE, mv_ref_probs)

            # ---- intra candidates (whole-MB only for cost screening;
            #      B_PRED is skipped for interframes in realtime mode and
            #      handled by the full intra encoder when intra wins) ----
            best_cost, best_kind, best_detail = 1 << 62, None, None
            for m in range(T.B_PRED):
                pred = encode_intra_np._predict_whole(recon.y, c, r, 16, m)
                dist = _variance(o16, pred)
                cost = rdcost(int(_COSTS.mbmode_costs[1][m]), dist,
                              rate_mult, dist_mult)
                if cost < best_cost:
                    best_cost, best_kind, best_detail = cost, "intra", m

            # ---- inter candidates ----
            for mode in (T.ZEROMV, T.NEARESTMV, T.NEARMV, T.NEWMV):
                if mode == T.NEWMV:
                    if realtime and not (c % 4 == 0 and r % 4 == 0):
                        continue
                    mv = (0, 0)
                    step = 512
                    while step > 1:
                        nmv, first_step = diamond_search(
                            o16, ref_y, r, c, R_, C_, best_v, mv, step, qi)
                        if nmv == mv:
                            break
                        mv = nmv
                        step = first_step
                    mv = (mv[0] + best_ref[0], mv[1] + best_ref[1])
                    if mv == (0, 0):
                        continue
                elif mode in (T.NEARESTMV, T.NEARMV):
                    src = nearest if mode == T.NEARESTMV else near
                    mv = clamp_mv(src, c, r, C_, R_)
                    if mv == (0, 0):
                        continue
                else:
                    mv = (0, 0)

                _inter_predict_into(ref_y, pred16, c * 16, r * 16, 16, mv)
                dist = _variance(o16, pred16)
                rate = int(mv_ref_costs[mode])
                if mode == T.NEWMV:
                    rate += mv_table.mv_cost((mv[0] - best_ref[0],
                                              mv[1] - best_ref[1]), 96)
                cost = rdcost(rate, dist, rate_mult, dist_mult)
                if cost < best_cost:
                    best_cost, best_kind, best_detail = cost, "inter", (mode, mv)

            if best_kind == "intra":
                # full intra encode (includes the B_PRED search)
                encode_intra_np.encode_intra_mb(
                    (oy, ou, ov), recon, arrays, r, c, q, rate_mult, dist_mult,
                    interframe=True, trellis=trellis_ctx)
                arrays.ref[r, c] = T.CURRENT_FRAME
                continue

            mode, mv = best_detail
            arrays.ref[r, c] = T.LAST_FRAME
            arrays.ymode[r, c] = mode
            arrays.y2_coded[r, c] = True
            arrays.bmode[r, c] = 0
            arrays.sub_mv[r, c, :, :, 0] = mv[0]
            arrays.sub_mv[r, c, :, :, 1] = mv[1]
            cx = (4 * mv[0] + 4) >> 3 if mv[0] >= 0 else -((-4 * mv[0] + 4) >> 3)
            cy = (4 * mv[1] + 4) >> 3 if mv[1] >= 0 else -((-4 * mv[1] + 4) >> 3)
            arrays.uv_mv[r, c] = (cx, cy)

            # ---- residues: luma Y2/WHT path ----
            _inter_predict_into(ref_y, pred16, c * 16, r * 16, 16, mv)
            walsh_input = np.zeros(16, np.int16)
            for sr in range(4):
                for sc in range(4):
                    osb = o16[sr * 4:sr * 4 + 4, sc * 4:sc * 4 + 4]
                    psb = pred16[sr * 4:sr * 4 + 4, sc * 4:sc * 4 + 4]
                    coeffs = FX.subtract_fdct(osb, psb)
                    walsh_input[sr * 4 + sc] = coeffs[0]
                    coeffs[0] = 0
                    arrays.coeffs[r, c, sr * 4 + sc] = FX.quantize(
                        coeffs, q["y_dc"], q["y_ac"])
            arrays.coeffs[r, c, 24] = FX.quantize(FX.fwht(walsh_input),
                                                  q["y2_dc"], q["y2_ac"])

            # ---- chroma ----
            pu = np.zeros((8, 8), np.uint8)
            pv = np.zeros((8, 8), np.uint8)
            _inter_predict_into(refs.last.u, pu, c * 8, r * 8, 8, (cx, cy))
            _inter_predict_into(refs.last.v, pv, c * 8, r * 8, 8, (cx, cy))
            for opl, ppl, base in ((ou, pu, 16), (ov, pv, 20)):
                for sr in range(2):
                    for sc in range(2):
                        osb = opl[r * 8 + sr * 4:r * 8 + sr * 4 + 4,
                                  c * 8 + sc * 4:c * 8 + sc * 4 + 4]
                        psb = ppl[sr * 4:sr * 4 + 4, sc * 4:sc * 4 + 4]
                        arrays.coeffs[r, c, base + sr * 2 + sc] = FX.quantize(
                            FX.subtract_fdct(osb, psb), q["uv_dc"], q["uv_ac"])

            arrays.has_nonzero[r, c] = bool(arrays.coeffs[r, c].any())
            # decoder-exact reconstruction of this MB
            R._reconstruct_inter_mb(arrays, recon, refs, r, c,
                                    {k: np.int32(v) for k, v in q.items()})

    return finish_interframe(encoder, header, arrays, recon, orig, update)


def finish_interframe(encoder, header, arrays, recon, orig, update):
    """Frame-level prob optimization, loop-filter search, serialization and
    state update shared by the host and device interframe encoders
    (encode_inter.cc:88-170)."""
    from .encoder import calc_prob
    W, H = encoder.width, encoder.height
    refs = encoder.references

    no_skip = int(arrays.has_nonzero.sum())
    header.prob_skip_false = calc_prob(no_skip, arrays.has_nonzero.size)
    arrays.skip_coeff[:] = ~arrays.has_nonzero

    # reference probabilities (optimize_interframe_probs)
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

    # token-branch counting (native, GIL released) overlaps the loop
    # filter search — the filter only reads segmentation/adjustments,
    # never the probability tables, so the state view can carry the
    # baseline tables
    from .encoder import worker_pool
    from alfalfa_tpu.util import tracing
    counts_f = worker_pool().submit(count_token_branches, arrays)
    lf_state = DecoderState(W, H, encoder.state.probability_tables,
                            encoder.state.segmentation, None)
    with tracing.stage("enc.if_lf_search"):
        lf_level, filtered, lf_ssim = encoder._search_loopfilter(
            header, arrays, lf_state, recon, orig, False)
    header.loop_filter_level = lf_level
    with tracing.stage("enc.if_counts_join"):
        counts = counts_f.result()
    header.token_prob_update = optimize_token_probs(
        counts, encoder.state.probability_tables.coeff_probs)
    frame_probs = encoder.state.probability_tables.copy()
    frame_probs.update(header)

    from .serializer import serialize_frame
    with tracing.stage("enc.if_serialize"):
        payload = serialize_frame(header, arrays, frame_probs, False, W, H)
    quality = lf_ssim     # the search already scored the winning candidate

    if update:
        # update_decoder_state (encode_inter.cc:154-170)
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
    return payload, quality
