"""Trellis (RD-optimal) coefficient quantization — the --two-pass encoder's
second-pass quantizer (reference encoder/encoder.cc:220-408, based on
libvpx vp8/encoder/encodemb.c).

For each subblock, a 2-level Viterbi walks the zigzag positions backwards,
choosing between quantized level q and q-1 per coefficient by minimizing
rate (token costs under the frame's probability tables + per-value base
cost) + distortion (squared requantization error), with EOB pulled forward
when a trailing zero makes it cheaper.
"""
import numpy as np

from alfalfa_tpu.bitstream import tables as T
from .costs import cost_bit, rdcost

# token enum (decoder/tokens.hh:36-49): ZERO..FOUR, CAT1..CAT6, EOB
ZERO_TOKEN, ONE_TOKEN = 0, 1
DCT_VAL_CATEGORY1, DCT_EOB_TOKEN = 5, 11

# per-token context class for the *next* token (encoder/costs.hh:14)
PREV_TOKEN_CLASS = np.array([0, 1, 2, 2, 2, 2, 2, 2, 2, 2, 2, 0], np.uint8)

# VP8 coefficient token tree (RFC 6386 section 13.2); negative/zero = leaf
COEF_TREE = np.array([
    -DCT_EOB_TOKEN, 2,
    -ZERO_TOKEN, 4,
    -ONE_TOKEN, 6,
    8, 12,
    -2, 10,
    -3, -4,
    14, 16,
    -DCT_VAL_CATEGORY1, -6,
    18, 20,
    -7, -8,
    -9, -10], np.int32)


def token_for_coeff(coeff):
    """encoder/costs.cc:242-261"""
    a = abs(int(coeff))
    if a <= 4:
        return a  # ZERO..FOUR tokens share the enum value
    for cat, bound in enumerate((6, 10, 18, 34, 66)):
        if a <= bound:
            return DCT_VAL_CATEGORY1 + cat
    return DCT_VAL_CATEGORY1 + 5


def _build_value_cost():
    """Sign + category-extra-bits cost per coefficient value, the
    dct_value_cost table of encoder/costs.cc:613-645 computed from the
    category bit probabilities instead of hardcoded."""
    out = np.zeros(4096, np.uint32)
    for v in range(-2048, 2048):
        a = abs(v)
        if a == 0:
            continue
        cost = cost_bit(128, v < 0)  # sign bit (asymmetric around 1/2)
        tok = token_for_coeff(a)
        if tok == DCT_VAL_CATEGORY1:
            # single extra bit at the fixed prob 159 (serializer.cc:659)
            cost += cost_bit(159, a - 5)
        elif tok > DCT_VAL_CATEGORY1:
            base, probs = T.TOKEN_DECODERS[tok - DCT_VAL_CATEGORY1 - 1]
            extra = a - base
            n = len(probs)
            for i, p in enumerate(probs):
                bit = (extra >> (n - 1 - i)) & 1
                cost += cost_bit(int(p), bit)
        out[2048 + v] = cost
    return out


_VALUE_COST = _build_value_cost()


def coeff_base_cost(coeff):
    return int(_VALUE_COST[2048 + int(coeff)])


def _tree_costs(probs, start, out):
    """Walk COEF_TREE from node pair `start`, accumulating per-leaf bit
    costs into `out` (compute_cost, encoder/costs.cc:151-170)."""
    stack = [(start, 0)]
    while stack:
        idx, cost = stack.pop()
        prob = int(probs[idx >> 1])
        for b in (0, 1):
            entry = int(COEF_TREE[idx + b])
            c = cost + cost_bit(prob, b)
            if entry <= 0:
                out[-entry] = c
            else:
                stack.append((entry, c))


def fill_token_costs(coeff_probs):
    """(4, 8, 3, 11) probs -> (4, 8, 3, 12) uint32 per-token bit costs
    (encoder/costs.cc:172-189).  Contexts where EOB cannot occur (after a
    zero, except the first band) skip the EOB branch."""
    out = np.zeros((4, 8, 3, 12), np.uint32)
    for i in range(4):
        for j in range(8):
            for k in range(3):
                start = 2 if (k == 0 and j > (1 if i == 0 else 0)) else 0
                _tree_costs(coeff_probs[i][j][k], start, out[i, j, k])
    return out


def trellis_quantize(unq16, dc_factor, ac_factor, token_costs_bt,
                     token_ctx, first_index, rate_mult, dist_mult):
    """RD-quantize one subblock (encoder.cc:221-408).

    unq16: natural-order int32[16] UNQUANTIZED coefficients.
    token_costs_bt: (8, 3, 12) costs for this block type.
    token_ctx: above+left nonzero context (0..2) of the first token.
    Returns natural-order int16[16] quantized coefficients.
    """
    zz = T.ZIGZAG
    band = T.COEFF_TO_BAND
    LEVELS = 2
    out = np.zeros(16, np.int16)

    coded_length = 0
    for idx in range(first_index, 16):
        if unq16[zz[idx]]:
            coded_length = idx + 1
    if coded_length == 0:
        return out

    INF = 1 << 62
    # trellis[idx][level] = (rate, distortion, cost, coeff, token, next)
    rate = np.zeros((17, LEVELS), np.int64)
    dist = np.zeros((17, LEVELS), np.int64)
    cost = np.zeros((17, LEVELS), np.int64)
    coeff = np.zeros((17, LEVELS), np.int64)
    token = np.full((17, LEVELS), DCT_EOB_TOKEN, np.int64)
    nxt = np.full((17, LEVELS), 255, np.int64)

    for idx in range(coded_length - 1, first_index - 1, -1):
        original = int(unq16[zz[idx]])
        factor = dc_factor if idx == 0 else ac_factor
        q = int(abs(original) // factor) * (1 if original >= 0 else -1)

        for shift in range(LEVELS):
            cand = q
            if cand < 0:
                cand = min(0, cand + shift)
            elif cand > 0 or shift == 0:
                cand = max(0, cand - shift)
            else:
                # q == 0 and shift != 0: copy level 0's node
                rate[idx, shift] = rate[idx, 0]
                dist[idx, shift] = dist[idx, 0]
                cost[idx, shift] = cost[idx, 0]
                coeff[idx, shift] = coeff[idx, 0]
                token[idx, shift] = token[idx, 0]
                nxt[idx, shift] = nxt[idx, 0]
                continue

            diff = original - cand * factor
            sse = diff * diff
            tok = token_for_coeff(cand)

            best_next, best_cost = 255, INF
            rates = [0, 0]
            dists = [0, 0]
            for n in range(LEVELS):
                dists[n] = dist[idx + 1, n] + sse
                r = rate[idx + 1, n]
                if idx < 15:
                    next_band = band[idx + 1]
                    ctx = PREV_TOKEN_CLASS[tok]
                    r += token_costs_bt[next_band][ctx][token[idx + 1, n]]
                rates[n] = r
                rd = rdcost(int(r), int(dists[n]), rate_mult, dist_mult)
                if rd < best_cost:
                    best_cost, best_next = rd, n

            if cand != 0 or token[idx + 1, best_next] != DCT_EOB_TOKEN:
                rate[idx, shift] = rates[best_next] + coeff_base_cost(cand)
                dist[idx, shift] = dists[best_next]
                cost[idx, shift] = best_cost
                coeff[idx, shift] = cand
                token[idx, shift] = tok
                nxt[idx, shift] = best_next
            else:
                # zero followed by EOB: pull EOB forward
                rate[idx, shift] = 0
                dist[idx, shift] = sse
                cost[idx, shift] = rdcost(0, int(sse), rate_mult, dist_mult)
                coeff[idx, shift] = 0
                token[idx, shift] = DCT_EOB_TOKEN
                nxt[idx, shift] = 255

    # charge the first token's cost under the real entry context
    for lvl in range(LEVELS):
        r = rate[first_index, lvl] + \
            token_costs_bt[band[first_index]][token_ctx][token[first_index, lvl]]
        rate[first_index, lvl] = r
        cost[first_index, lvl] = rdcost(int(r), int(dist[first_index, lvl]),
                                        rate_mult, dist_mult)

    choice = int(np.argmin(cost[first_index, :]))
    idx = first_index
    while idx < 16:
        if token[idx, choice] == DCT_EOB_TOKEN:
            break
        out[zz[idx]] = coeff[idx, choice]
        choice = int(nxt[idx, choice])
        idx += 1
    return out


class TrellisContext:
    """Frame-wide state for second-pass trellis quantization: per-chain
    nonzero contexts (mirroring serializer.iter_frame_blocks) + token
    costs under the encoder's current probability tables."""

    def __init__(self, coeff_probs, mb_rows, mb_cols, q,
                 rate_mult, dist_mult):
        self.tc = fill_token_costs(coeff_probs)
        R, C = mb_rows, mb_cols
        self.y_nz = np.zeros((R * 4, C * 4), bool)
        self.u_nz = np.zeros((R * 2, C * 2), bool)
        self.v_nz = np.zeros((R * 2, C * 2), bool)
        self.y2_above = np.zeros(C, bool)
        self.y2_above_valid = np.zeros(C, bool)
        self.y2_left = False
        self.y2_left_valid = False
        self._y2_row = 0
        self.q = q
        self.rm, self.dm = rate_mult, dist_mult

    def _row_reset(self, r):
        if r != self._y2_row:
            self._y2_row = r
            self.y2_left = False
            self.y2_left_valid = False

    def quantize_y(self, unq16, r, c, sr, sc, after_y2):
        gr, gc = r * 4 + sr, c * 4 + sc
        ctx = int(gr > 0 and self.y_nz[gr - 1, gc]) + \
            int(gc > 0 and self.y_nz[gr, gc - 1])
        bt = T.BLOCK_Y_AFTER_Y2 if after_y2 else T.BLOCK_Y_WITHOUT_Y2
        first = 1 if after_y2 else 0
        out = trellis_quantize(unq16, self.q["y_dc"], self.q["y_ac"],
                               self.tc[bt], ctx, first, self.rm, self.dm)
        self.y_nz[gr, gc] = bool(out[first:].any() if first else out.any())
        return out

    def quantize_y2(self, unq16, r, c):
        self._row_reset(r)
        ctx = int(self.y2_above[c] if self.y2_above_valid[c] else False) + \
            int(self.y2_left if self.y2_left_valid else False)
        out = trellis_quantize(unq16, self.q["y2_dc"], self.q["y2_ac"],
                               self.tc[T.BLOCK_Y2], ctx, 0, self.rm, self.dm)
        nz = bool(out.any())
        self.y2_above[c] = nz
        self.y2_above_valid[c] = True
        self.y2_left = nz
        self.y2_left_valid = True
        return out

    def quantize_uv(self, unq16, r, c, sr, sc, plane):
        nzp = self.u_nz if plane == 0 else self.v_nz
        gr, gc = r * 2 + sr, c * 2 + sc
        ctx = int(gr > 0 and nzp[gr - 1, gc]) + \
            int(gc > 0 and nzp[gr, gc - 1])
        out = trellis_quantize(unq16, self.q["uv_dc"], self.q["uv_ac"],
                               self.tc[T.BLOCK_UV], ctx, 0, self.rm, self.dm)
        nzp[gr, gc] = bool(out.any())
        return out
