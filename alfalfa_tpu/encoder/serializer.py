"""Frame serialization: (header, FrameArrays) -> VP8 bitstream bytes.

Exact mirror of the parser, so parse-then-serialize is the identity on every
well-formed frame (the reference's roundtrip invariant, tests/roundtrip.cc).
Semantics follow encoder/serializer.cc:165-829.
"""
import os

import numpy as np

from alfalfa_tpu.bitstream import tables as T
from alfalfa_tpu.bitstream.boolcoder import BoolEncoder, tree_path
from alfalfa_tpu.decoder.parse import (mv_census, flipped_map_for, clamp_mv,
                                       Y_BASE, U_BASE, V_BASE, Y2_IDX)

_IMPLIED = {T.DC_PRED: T.B_DC_PRED, T.V_PRED: T.B_VE_PRED,
            T.H_PRED: T.B_HE_PRED, T.TM_PRED: T.B_TM_PRED}

# precomputed tree paths: leaf -> [(bit, node_index), ...]
_PATH_CACHE = {}


def _paths(tree_arr_id, tree_arr):
    if tree_arr_id not in _PATH_CACHE:
        leaves = sorted({-int(v) for v in tree_arr if v <= 0})
        table = {}
        for leaf in leaves:
            bits = tree_path(tree_arr, leaf)
            idx = []
            i = 0
            for b in bits:
                idx.append((b, i >> 1))
                i = int(tree_arr[i + b])
            table[leaf] = idx
        _PATH_CACHE[tree_arr_id] = table
    return _PATH_CACHE[tree_arr_id]


def write_tree(be, tree_arr, probs, leaf, tree_id):
    for bit, prob_idx in _paths(tree_id, tree_arr)[int(leaf)]:
        be.put(bit, probs[prob_idx])


def _write_mv_component(be, num, probs):
    """serializer.cc:197-236"""
    num_to_encode = int(num) >> 1
    x = abs(num_to_encode)
    if x < 8:
        be.put(0, probs[0])
        write_tree(be, T.SMALL_MV_TREE, probs[2:9], x, "small_mv")
    else:
        be.put(1, probs[0])
        for i in range(3):
            be.put((x >> i) & 1, probs[9 + i])
        for i in range(9, 3, -1):
            be.put((x >> i) & 1, probs[9 + i])
        if x & 0xFFF0:
            be.put((x >> 3) & 1, probs[9 + 3])
    if x:
        be.put(1 if num_to_encode < 0 else 0, probs[1])


def write_mv(be, mv, mv_probs):
    _write_mv_component(be, mv[1], mv_probs[0])  # y first
    _write_mv_component(be, mv[0], mv_probs[1])


def write_block_tokens(be, coeffs16, coeff_probs, block_type, ctx, first):
    """serializer.cc:596-737. Returns has_nonzero."""
    zz = T.ZIGZAG
    band = T.COEFF_TO_BAND
    probs_bt = coeff_probs[block_type]

    coded_length = 0
    for index in range(first, 16):
        if coeffs16[zz[index]]:
            coded_length = index + 1

    last_was_zero = False
    token_context = ctx
    index = first
    has_nonzero = False
    while index < coded_length:
        coefficient = int(coeffs16[zz[index]])
        v = abs(coefficient)
        sign = coefficient < 0
        prob = probs_bt[band[index]][token_context]

        if not last_was_zero:
            be.put(1, prob[0])
        if v == 0:
            be.put(0, prob[1])
            last_was_zero = True
            token_context = 0
            index += 1
            continue
        last_was_zero = False
        has_nonzero = True
        be.put(1, prob[1])
        if v == 1:
            be.put(0, prob[2])
            be.put(sign)
            token_context = 1
            index += 1
            continue
        token_context = 2
        be.put(1, prob[2])
        if v == 2:
            be.put(0, prob[3])
            be.put(0, prob[4])
        elif v == 3:
            be.put(0, prob[3])
            be.put(1, prob[4])
            be.put(0, prob[5])
        elif v == 4:
            be.put(0, prob[3])
            be.put(1, prob[4])
            be.put(1, prob[5])
        else:
            be.put(1, prob[3])
            if v < 7:   # 5..6
                be.put(0, prob[6])
                be.put(0, prob[7])
                be.put(v == 6, 159)
            elif v < 11:  # category 1
                be.put(0, prob[6])
                be.put(1, prob[7])
                _write_extra(be, v, 0)
            else:
                be.put(1, prob[6])
                if v < 19:
                    be.put(0, prob[8])
                    be.put(0, prob[9])
                    _write_extra(be, v, 1)
                elif v < 35:
                    be.put(0, prob[8])
                    be.put(1, prob[9])
                    _write_extra(be, v, 2)
                elif v < 67:
                    be.put(1, prob[8])
                    be.put(0, prob[10])
                    _write_extra(be, v, 3)
                elif v < 2115:
                    be.put(1, prob[8])
                    be.put(1, prob[10])
                    _write_extra(be, v, 4)
                else:
                    raise ValueError("token value too large")
        be.put(sign)
        index += 1

    if coded_length < 16:
        prob = probs_bt[band[index]][token_context]
        be.put(0, prob[0])
    return has_nonzero


def _write_extra(be, value, cat):
    base, probs = T.TOKEN_DECODERS[cat]
    increment = value - base
    n = len(probs)
    for i in range(n):
        be.put((increment >> (n - 1 - i)) & 1, probs[i])


class FrameSerializer:
    """Serializes one frame from its dense arrays."""

    def __init__(self, header, arrays, frame_probs, key_frame, width, height,
                 show=True):
        self.h = header
        self.a = arrays
        self.probs = frame_probs
        self.key_frame = key_frame
        self.width, self.height = width, height
        self.show = show

    # -- first partition -----------------------------------------------------

    def _serialize_mb_header(self, be, r, c, seg_tree_probs, flipped_map):
        h, a = self.h, self.a
        if (h.update_segmentation is not None
                and h.update_segmentation.update_mb_segmentation_map):
            write_tree(be, T.SEGMENT_ID_TREE, seg_tree_probs,
                       int(a.segment_update[r, c]), "segment_id")
        if h.prob_skip_false is not None:
            be.put(bool(a.skip_coeff[r, c]), h.prob_skip_false)

        if self.key_frame:
            self._serialize_kf_modes(be, r, c)
            return

        ref = int(a.ref[r, c])
        is_inter = ref != T.CURRENT_FRAME
        be.put(is_inter, h.prob_inter)
        if is_inter:
            be.put(ref != T.LAST_FRAME, h.prob_references_last)
            if ref != T.LAST_FRAME:
                be.put(ref == T.ALTREF_FRAME, h.prob_references_golden)
            self._serialize_inter_modes(be, r, c, flipped_map)
        else:
            self._serialize_inter_intra_modes(be, r, c)

    def _serialize_kf_modes(self, be, r, c):
        a = self.a
        ymode = int(a.ymode[r, c])
        write_tree(be, T.KF_Y_MODE_TREE, T.KF_Y_MODE_PROBS, ymode, "kf_y")
        if ymode == T.B_PRED:
            for sr in range(4):
                for sc in range(4):
                    if sr > 0:
                        above = a.bmode[r, c, sr - 1, sc]
                    elif r > 0:
                        above = a.bmode[r - 1, c, 3, sc]
                    else:
                        above = T.B_DC_PRED
                    if sc > 0:
                        left = a.bmode[r, c, sr, sc - 1]
                    elif c > 0:
                        left = a.bmode[r, c - 1, sr, 3]
                    else:
                        left = T.B_DC_PRED
                    write_tree(be, T.B_MODE_TREE,
                               T.KF_B_MODE_PROBS[above][left],
                               int(a.bmode[r, c, sr, sc]), "bmode")
        write_tree(be, T.UV_MODE_TREE, T.KF_UV_MODE_PROBS,
                   int(a.uvmode[r, c]), "uv")

    def _serialize_inter_intra_modes(self, be, r, c):
        a = self.a
        ymode = int(a.ymode[r, c])
        write_tree(be, T.Y_MODE_TREE, self.probs.y_mode_probs, ymode, "y")
        if ymode == T.B_PRED:
            for sr in range(4):
                for sc in range(4):
                    write_tree(be, T.B_MODE_TREE, T.INVARIANT_B_MODE_PROBS,
                               int(a.bmode[r, c, sr, sc]), "bmode")
        write_tree(be, T.UV_MODE_TREE, self.probs.uv_mode_probs,
                   int(a.uvmode[r, c]), "uv")

    def _serialize_inter_modes(self, be, r, c, flipped_map):
        a = self.a
        R, C = a.mb_rows, a.mb_cols
        flipped = bool(flipped_map[r, c])
        best, nearest, near, counts = mv_census(a, flipped_map, r, c, flipped)
        mv_ref_probs = [T.MV_COUNTS_TO_PROBS[counts[0]][0],
                        T.MV_COUNTS_TO_PROBS[counts[1]][1],
                        T.MV_COUNTS_TO_PROBS[counts[2]][2],
                        T.MV_COUNTS_TO_PROBS[counts[3]][3]]

        ymode = int(a.ymode[r, c])
        write_tree(be, T.MV_REF_TREE, mv_ref_probs, ymode, "mv_ref")

        if ymode == T.NEWMV:
            cb = clamp_mv(best, c, r, C, R)
            base = (int(a.sub_mv[r, c, 3, 3, 0]), int(a.sub_mv[r, c, 3, 3, 1]))
            write_mv(be, (base[0] - cb[0], base[1] - cb[1]), self.probs.mv_probs)
        elif ymode == T.SPLITMV:
            pid = int(a.splitmv_pid[r, c])
            write_tree(be, T.SPLIT_MV_TREE, T.SPLIT_MV_PROBS, pid, "split_mv")
            cb = clamp_mv(best, c, r, C, R)
            for partition in T.MV_PARTITIONS[pid]:
                first_c, first_r = partition[0]
                self._serialize_subblock_mv(be, r, c, first_r, first_c, cb)

    def _serialize_subblock_mv(self, be, r, c, sr, sc, best):
        """write_subblock_inter_prediction (serializer.cc:249-316)."""
        a = self.a
        if sc > 0:
            left = tuple(int(v) for v in a.sub_mv[r, c, sr, sc - 1])
        elif c > 0:
            left = tuple(int(v) for v in a.sub_mv[r, c - 1, sr, 3])
        else:
            left = (0, 0)
        if sr > 0:
            above = tuple(int(v) for v in a.sub_mv[r, c, sr - 1, sc])
        elif r > 0:
            above = tuple(int(v) for v in a.sub_mv[r - 1, c, 3, sc])
        else:
            above = (0, 0)

        left_zero, above_zero = left == (0, 0), above == (0, 0)
        if left == above and left_zero:
            ctx = 4
        elif left == above:
            ctx = 3
        elif above_zero:
            ctx = 2
        elif left_zero:
            ctx = 1
        else:
            ctx = 0

        submode = int(a.bmode[r, c, sr, sc])
        write_tree(be, T.SUBMV_REF_TREE, T.SUBMV_REF_PROBS2[ctx], submode,
                   "submv_ref")
        if submode == T.NEW4X4:
            mv = (int(a.sub_mv[r, c, sr, sc, 0]), int(a.sub_mv[r, c, sr, sc, 1]))
            write_mv(be, (mv[0] - best[0], mv[1] - best[1]), self.probs.mv_probs)

    def serialize_first_partition(self):
        be = BoolEncoder()
        self.h.write(be)
        if self.key_frame and self.h.update_segmentation is None:
            try:
                from alfalfa_tpu.native import bitwork
                if bitwork.write_kf_modes(be, self.a,
                                          self.h.prob_skip_false):
                    return be.finish()
            except (ImportError, AttributeError, OSError):
                pass
        if (not self.key_frame
                and os.environ.get("ALFALFA_NATIVE_MODES", "1") != "0"):
            try:
                from alfalfa_tpu.native import bitwork
                flipped = np.asarray(flipped_map_for(self.a, self.h))
                if bitwork.write_inter_modes(be, self.a, self.h, self.probs,
                                             flipped):
                    return be.finish()
            except (ImportError, AttributeError, OSError):
                pass
        seg_tree_probs = ([255, 255, 255] if self.h.update_segmentation is None
                          else self.h.update_segmentation.segment_tree_probs())
        flipped = (None if self.key_frame
                   else np.asarray(flipped_map_for(self.a, self.h)))
        for r in range(self.a.mb_rows):
            for c in range(self.a.mb_cols):
                self._serialize_mb_header(be, r, c, seg_tree_probs, flipped)
        return be.finish()

    # -- token partitions ------------------------------------------------------

    def serialize_tokens(self):
        try:
            from alfalfa_tpu.native import bitwork
            parts = bitwork.serialize_tokens(
                self.a, self.probs.coeff_probs,
                1 << self.h.log2_number_of_dct_partitions)
            if parts is not None:
                return parts
        except (ImportError, AttributeError, OSError):
            pass
        return self._serialize_tokens_py()

    def _serialize_tokens_py(self):
        n_parts = 1 << self.h.log2_number_of_dct_partitions
        encoders = [BoolEncoder() for _ in range(n_parts)]
        coeff_probs = self.probs.coeff_probs
        for row, coeffs, block_type, ctx, first in iter_frame_blocks(self.a):
            write_block_tokens(encoders[row % n_parts], coeffs, coeff_probs,
                               block_type, ctx, first)
        return [be.finish() for be in encoders]

    # -- full frame --------------------------------------------------------------

    def serialize(self):
        """Assembles the complete frame (make_frame, serializer.cc:741-800)."""
        first = self.serialize_first_partition()
        parts = self.serialize_tokens()
        if self.width > 16383 or self.height > 16383:
            raise ValueError("VP8 frame dimensions too large")

        fpl = len(first)
        tag = ((0 if self.key_frame else 1)
               | ((1 if self.show else 0) << 4)
               | ((fpl & 0x7FFFF) << 5))
        out = bytearray([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
        if self.key_frame:
            out += b"\x9d\x01\x2a"
            out += bytes([self.width & 0xFF, (self.width >> 8) & 0x3F])
            out += bytes([self.height & 0xFF, (self.height >> 8) & 0x3F])
        out += first
        for p in parts[:-1]:
            n = len(p)
            out += bytes([n & 0xFF, (n >> 8) & 0xFF, (n >> 16) & 0xFF])
        for p in parts:
            out += p
        return bytes(out)


def serialize_frame(header, arrays, frame_probs, key_frame, width, height,
                    show=True):
    return FrameSerializer(header, arrays, frame_probs, key_frame, width,
                           height, show).serialize()


def iter_frame_blocks(a):
    """Yields (mb_row, coeffs16, block_type, ctx, first_index) for every
    token-coded block of the frame in coding order, with the exact
    cross-MB nonzero contexts (frame.cc:121-137, tokens.cc:57-66)."""
    R, C = a.mb_rows, a.mb_cols
    y_nz = np.zeros((R * 4, C * 4), bool)
    u_nz = np.zeros((R * 2, C * 2), bool)
    v_nz = np.zeros((R * 2, C * 2), bool)
    y2_above = np.zeros(C, bool)
    y2_above_valid = np.zeros(C, bool)

    for r in range(R):
        y2_left = False
        y2_left_valid = False
        for c in range(C):
            if a.skip_coeff[r, c]:
                y_nz[r * 4:r * 4 + 4, c * 4:c * 4 + 4] = False
                u_nz[r * 2:r * 2 + 2, c * 2:c * 2 + 2] = False
                v_nz[r * 2:r * 2 + 2, c * 2:c * 2 + 2] = False
                if a.y2_coded[r, c]:
                    y2_above[c] = False
                    y2_above_valid[c] = True
                    y2_left = False
                    y2_left_valid = True
                continue

            if a.y2_coded[r, c]:
                ctx = int(y2_above[c] if y2_above_valid[c] else False) + \
                    int(y2_left if y2_left_valid else False)
                coeffs = a.coeffs[r, c, Y2_IDX]
                yield r, coeffs, T.BLOCK_Y2, ctx, 0
                nz = bool(coeffs.any())
                y2_above[c] = nz
                y2_above_valid[c] = True
                y2_left = nz
                y2_left_valid = True

            block_type = (T.BLOCK_Y_AFTER_Y2 if a.y2_coded[r, c]
                          else T.BLOCK_Y_WITHOUT_Y2)
            first = 1 if a.y2_coded[r, c] else 0
            for sr in range(4):
                for sc in range(4):
                    gr, gc = r * 4 + sr, c * 4 + sc
                    ctx = int(gr > 0 and y_nz[gr - 1, gc]) + \
                        int(gc > 0 and y_nz[gr, gc - 1])
                    coeffs = a.coeffs[r, c, Y_BASE + sr * 4 + sc]
                    yield r, coeffs, block_type, ctx, first
                    y_nz[gr, gc] = bool(coeffs[first:].any() if first else coeffs.any())
            for base, nz_plane in ((U_BASE, u_nz), (V_BASE, v_nz)):
                for sr in range(2):
                    for sc in range(2):
                        gr, gc = r * 2 + sr, c * 2 + sc
                        ctx = int(gr > 0 and nz_plane[gr - 1, gc]) + \
                            int(gc > 0 and nz_plane[gr, gc - 1])
                        coeffs = a.coeffs[r, c, base + sr * 2 + sc]
                        yield r, coeffs, T.BLOCK_UV, ctx, 0
                        nz_plane[gr, gc] = bool(coeffs.any())


def count_token_branches(arrays, counts=None):
    """Branch-outcome counts per coefficient-tree node
    (accumulate_token_branches, serializer.cc:456-594).

    Returns counts (4, 8, 3, 11, 2) int64: [..., 0]=false, [..., 1]=true."""
    try:
        from alfalfa_tpu.native import bitwork
        return bitwork.count_token_branches(arrays, counts)
    except (ImportError, AttributeError, OSError):
        pass
    if counts is None:
        counts = np.zeros((4, 8, 3, 11, 2), np.int64)
    zz = T.ZIGZAG
    band = T.COEFF_TO_BAND

    for _, coeffs16, bt, ctx, first in iter_frame_blocks(arrays):
        if bt == T.BLOCK_Y2:
            # the reference accumulates Y/U/V blocks only -- never Y2
            # (serializer.cc:583-587) -- so Y2 probs stay at the baseline;
            # counting them emits ~9-bit updates that cost more than they
            # save (measured +8% on rebased interframes)
            continue
        coded_length = 0
        for index in range(first, 16):
            if coeffs16[zz[index]]:
                coded_length = index + 1
        last_was_zero = False
        token_context = ctx
        index = first
        while index < coded_length:
            v = abs(int(coeffs16[zz[index]]))
            b = band[index]
            node = counts[bt, b, token_context]
            if not last_was_zero:
                node[0, 1] += 1
            if v == 0:
                node[1, 0] += 1
                last_was_zero = True
                token_context = 0
                index += 1
                continue
            last_was_zero = False
            node[1, 1] += 1
            if v == 1:
                node[2, 0] += 1
                token_context = 1
            else:
                node[2, 1] += 1
                token_context = 2
                if v <= 4:
                    node[3, 0] += 1
                    if v == 2:
                        node[4, 0] += 1
                    else:
                        node[4, 1] += 1
                        node[5, 0 if v == 3 else 1] += 1
                else:
                    node[3, 1] += 1
                    if v < 11:
                        node[6, 0] += 1
                        node[7, 0 if v < 7 else 1] += 1
                    else:
                        node[6, 1] += 1
                        if v < 35:
                            node[8, 0] += 1
                            node[9, 0 if v < 19 else 1] += 1
                        else:
                            node[8, 1] += 1
                            node[10, 0 if v < 67 else 1] += 1
            index += 1
        if coded_length < 16:
            counts[bt, band[index], token_context, 0, 0] += 1
    return counts


def optimize_token_probs(counts, baseline_probs):
    """Per-frame coefficient-probability updates that beat the baseline.

    The reference updates whenever the measured probability differs
    (optimize_probability_tables, encoder.cc:418-439); but an update
    costs ~9 bits (the flag's true/false cost delta at
    coeff_update_probs + an 8-bit literal), which LOSES bytes on
    rarely-visited contexts.  Following libvpx's update decision
    (onyx_int.h / tokenize), emit an update only when the counts-weighted
    entropy saving exceeds that cost — strictly smaller output than the
    reference rule under the same cost model."""
    from .costs import PROB_COST
    updates = {}
    up = T.COEFF_UPDATE_PROBS
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for l in range(11):
                    fc = int(counts[i, j, k, l, 0])
                    tc = int(counts[i, j, k, l, 1])
                    if fc == 0:
                        continue
                    prob = max(1, min(255, 256 * fc // (fc + tc)))
                    old = int(baseline_probs[i, j, k, l])
                    if prob == old:
                        continue
                    savings = (fc * (int(PROB_COST[old])
                                     - int(PROB_COST[prob]))
                               + tc * (int(PROB_COST[255 - old])
                                       - int(PROB_COST[255 - prob])))
                    u = int(up[i, j, k, l])
                    update_cost = (int(PROB_COST[255 - u])
                                   - int(PROB_COST[u]) + 8 * 256)
                    if savings > update_cost:
                        updates[(i, j, k, l)] = prob
    return updates
