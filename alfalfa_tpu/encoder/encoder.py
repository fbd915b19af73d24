"""Encoder: explicit-state VP8 encoding driver.

Like the reference Encoder (encoder/encoder.hh:95-383), this carries
(DecoderState, References) and encodes each frame against them, inlining a
full decode so the references match what any decoder reconstructs.

Modes: constant quantizer, minimum-SSIM search, (target-size to come).
"""
import numpy as np

from alfalfa_tpu.bitstream import tables as T
from alfalfa_tpu.bitstream.header import KeyFrameHeader, InterFrameHeader, QuantIndices
from alfalfa_tpu.decoder import reconstruct_np as R
from alfalfa_tpu.decoder.parse import FrameArrays
from alfalfa_tpu.state.decoder_state import DecoderState, References, Raster
from alfalfa_tpu.state import hashing
from alfalfa_tpu.util.ssim import ssim
from . import encode_intra_np
from .costs import rd_multipliers
from .serializer import serialize_frame


def _pad_raster(y, u, v, width, height):
    r = Raster(width, height)
    r.y[:y.shape[0], :y.shape[1]] = y
    r.u[:u.shape[0], :u.shape[1]] = u
    r.v[:v.shape[0], :v.shape[1]] = v
    return r


def calc_prob(false_count, total):
    """encoder.cc:48-55"""
    if false_count == 0:
        return 0
    return max(1, min(255, 256 * false_count // total))


_POOL = None


def worker_pool():
    """Shared thread pool for the encode tail's native overlaps (loop
    filter candidates, token counting) — created once, not per frame."""
    global _POOL
    if _POOL is None:
        from concurrent.futures import ThreadPoolExecutor
        _POOL = ThreadPoolExecutor(8)
    return _POOL


def _lf_threads():
    import os
    try:
        k = int(os.environ.get("ALFALFA_LF_THREADS", "") or 0)
    except ValueError:
        k = 0
    return k or os.cpu_count() or 1


class Encoder:
    def __init__(self, width, height, quality="best", two_pass=False,
                 device_encode=None):
        self.width, self.height = width, height
        self.mb_cols = (width + 15) // 16
        self.mb_rows = (height + 15) // 16
        self.state = DecoderState.initial(width, height)
        self.references = References.create(width, height)
        self.frame_no = 0
        self.quality = quality
        self.two_pass = two_pass
        if device_encode is None:
            import os
            device_encode = bool(int(
                os.environ.get("ALFALFA_DEVICE_ENCODE", "0") or "0"))
        self.device_encode = device_encode
        self.last_loop_filter_level = None
        self.last_y_ac_qi = None  # seeds the target-size search window
        self.last_ssim = None     # reference encode_stats_.ssim parity

    # -- public API -----------------------------------------------------------

    def encode_with_quantizer(self, yuv, y_ac_qi, key_frame=None):
        """Encode one frame at a fixed quantizer index; returns the frame
        bytes and advances the encoder state."""
        if key_frame is None:
            key_frame = self.frame_no == 0
        qi = QuantIndices(y_ac_qi=int(y_ac_qi))
        payload, quality = self._encode_frame(yuv, qi, key_frame, update=True)
        self.frame_no += 1
        self.last_y_ac_qi = int(y_ac_qi)
        self.last_ssim = quality
        return payload

    def encode_with_target_size(self, yuv, target_size, key_frame=None):
        """Binary search on y_ac_qi for the largest frame <= target_size,
        using a 1/4 x 1/4 subsampled trial encode as the size estimator
        (encoder.cc:592-629). The search window is +-16 around the last
        frame's quantizer when known."""
        if key_frame is None:
            key_frame = self.frame_no == 0
        y_qi_min, y_qi_max = 4, 127
        if self.last_y_ac_qi is not None:
            radius = 16
            if self.last_y_ac_qi - radius >= y_qi_min:
                y_qi_min = self.last_y_ac_qi - radius
            y_qi_max = min(y_qi_max, self.last_y_ac_qi + radius)

        best_y_qi = None
        while y_qi_min <= y_qi_max:
            y_qi = (y_qi_min + y_qi_max) // 2
            estimated = self.estimate_frame_size(yuv, y_qi, key_frame)
            if estimated <= target_size or \
                    (y_qi_min == y_qi_max and best_y_qi is None):
                best_y_qi = y_qi
                y_qi_max = y_qi - 1
            else:
                y_qi_min = y_qi + 1
        return self.encode_with_quantizer(yuv, best_y_qi, key_frame=key_frame)

    # subsample factor per axis (encoder.hh:114-115): the trial encode sees
    # 1/16 of the macroblocks, so its size scales back by x16
    SAMPLE_FACTOR = 4

    def _mosaic(self, y, u, v, sub_rows, sub_cols):
        """Pack every SAMPLE_FACTOR-th macroblock tile into a small raster —
        our equivalent of the reference's macroblock_mapper subsampled frame
        (size_estimation.cc:37-42)."""
        f = self.SAMPLE_FACTOR
        my = np.zeros((sub_rows * 16, sub_cols * 16), np.uint8)
        mu = np.zeros((sub_rows * 8, sub_cols * 8), np.uint8)
        mv = np.zeros((sub_rows * 8, sub_cols * 8), np.uint8)
        for r in range(sub_rows):
            for c in range(sub_cols):
                oy, ox = r * f * 16, c * f * 16
                my[r * 16:(r + 1) * 16, c * 16:(c + 1) * 16] = \
                    y[oy:oy + 16, ox:ox + 16]
                mu[r * 8:(r + 1) * 8, c * 8:(c + 1) * 8] = \
                    u[oy // 2:oy // 2 + 8, ox // 2:ox // 2 + 8]
                mv[r * 8:(r + 1) * 8, c * 8:(c + 1) * 8] = \
                    v[oy // 2:oy // 2 + 8, ox // 2:ox // 2 + 8]
        return my, mu, mv

    def estimate_frame_size(self, yuv, y_ac_qi, key_frame=None):
        """Estimated compressed size at y_ac_qi from a subsampled trial
        encode (size_estimation.cc:35-181): encode a mosaic of every 4th
        macroblock (same references, subsampled the same way), scale x16."""
        if key_frame is None:
            key_frame = self.frame_no == 0
        f = self.SAMPLE_FACTOR
        sub_rows = max(1, self.mb_rows // f)
        sub_cols = max(1, self.mb_cols // f)

        padded = _pad_raster(*yuv, self.width, self.height)
        my, mu, mv = self._mosaic(padded.y, padded.u, padded.v,
                                  sub_rows, sub_cols)
        # the trial encoder inherits the device path: on a TPU host the
        # binary search's ~5 mosaic encodes are small kernel launches,
        # not host per-MB loops (geometry compiles once, then cached)
        sub = Encoder(sub_cols * 16, sub_rows * 16, quality=self.quality,
                      device_encode=self.device_encode)
        if not key_frame:
            # mirror the current state against mosaic references
            last = self.references.last
            ry, ru, rv = self._mosaic(last.y, last.u, last.v,
                                      sub_rows, sub_cols)
            sub.references.last = _pad_raster(ry, ru, rv,
                                              sub.width, sub.height)
            sub.references.golden = sub.references.last
            sub.references.alternative = sub.references.last
            sub.frame_no = 1  # force interframe
        qi = QuantIndices(y_ac_qi=int(y_ac_qi))
        payload, _ = sub._encode_frame((my, mu, mv), qi, key_frame,
                                       update=False)
        return len(payload) * f * f

    def encode_with_minimum_ssim(self, yuv, minimum_ssim, key_frame=None):
        """Binary search on y_ac_qi for the target SSIM
        (encoder.cc:518-557)."""
        if key_frame is None:
            key_frame = self.frame_no == 0
        lo, hi = 0, 127
        found = False
        best_qi = 0
        while lo <= hi:
            qi = (lo + hi) // 2
            _, cur = self._encode_frame(yuv, QuantIndices(y_ac_qi=qi),
                                        key_frame, update=False)
            if cur >= minimum_ssim or (lo == hi and not found):
                found = True
                best_qi = qi
            if lo == hi:
                break
            if cur < minimum_ssim:
                hi = qi - 1
            else:
                lo = qi + 1
        payload, quality = self._encode_frame(
            yuv, QuantIndices(y_ac_qi=best_qi), key_frame, update=True)
        self.frame_no += 1
        self.last_y_ac_qi = best_qi
        self.last_ssim = quality
        return payload

    def fork(self):
        """Value-copy of the encoder. Salsify copies the encoder per
        speculative job and keeps a minihash-addressed map of past encoders
        (salsify-sender.cc:490-518, 357-379); references are immutable once
        installed, so a container-level copy suffices."""
        e = Encoder.__new__(Encoder)
        e.__dict__.update(self.__dict__)
        e.state = self.state.copy()
        e.references = self.references.copy()
        return e

    def minihash(self):
        return hashing.minihash(hashing.decoder_hash(
            self.state.hash(), self.references.last.hash(),
            self.references.golden.hash(), self.references.alternative.hash()))

    # -- core -----------------------------------------------------------------

    def _encode_frame(self, yuv, quant_indices, key_frame, update):
        if key_frame:
            return self._encode_keyframe(yuv, quant_indices, update)
        return self._encode_interframe(yuv, quant_indices, update)

    def _encode_keyframe(self, yuv, quant_indices, update):
        orig = _pad_raster(*yuv, self.width, self.height)
        header = KeyFrameHeader()
        header.quant_indices = quant_indices
        header.refresh_entropy_probs = True

        arrays = FrameArrays(self.mb_rows, self.mb_cols)
        recon = Raster(self.width, self.height)
        q = quant_indices.quantizer()
        q = {k: int(v) for k, v in q.items()}
        rate_mult, dist_mult = rd_multipliers(q["y_ac"])

        from alfalfa_tpu.util import tracing
        oplanes = (orig.y, orig.u, orig.v)
        if self.device_encode:
            # the whole MB wavefront runs on-chip (SURVEY section 7.2
            # stage 4); bit-identical to the host loop below.  Two-pass:
            # the host first pass is recomputed from scratch by the
            # second (its arrays/recon are discarded), so the device
            # path runs ONE trellis-quantizing kernel pass.
            from .encode_intra_device import encode_keyframe_device
            tp = (self.state.probability_tables.coeff_probs
                  if self.two_pass else None)
            with tracing.stage("enc.kf_mb_wavefront"):
                arrays, recon, dev_tiles = encode_keyframe_device(
                    oplanes, self.width, self.height, q, rate_mult,
                    dist_mult, trellis_probs=tp)
        else:
            passes = 2 if self.two_pass else 1
            for pass_i in range(passes):
                trellis_ctx = None
                if pass_i == 1:
                    # second pass: trellis quantization with token costs
                    # from the current probability tables
                    # (encode_intra.cc:409-431, encoder.cc:220-408)
                    from .trellis import TrellisContext
                    trellis_ctx = TrellisContext(
                        self.state.probability_tables.coeff_probs,
                        self.mb_rows, self.mb_cols, q, rate_mult, dist_mult)
                    arrays = FrameArrays(self.mb_rows, self.mb_cols)
                    recon = Raster(self.width, self.height)
                for r in range(self.mb_rows):
                    for c in range(self.mb_cols):
                        encode_intra_np.encode_intra_mb(
                            oplanes, recon, arrays, r, c, q, rate_mult,
                            dist_mult, interframe=False,
                            trellis=trellis_ctx)

        # skip flags + prob (encoder.cc:441-457, 657)
        no_skip = int(arrays.has_nonzero.sum())
        total = arrays.has_nonzero.size
        header.prob_skip_false = calc_prob(no_skip, total)
        arrays.skip_coeff[:] = ~arrays.has_nonzero

        # keyframes reset decoder state (update_decoder_state, encode_intra.cc:36-46)
        new_state = DecoderState.from_keyframe_header(header, self.width, self.height)

        # per-frame coefficient probability optimization (encoder.cc:418-439)
        # — the native counting overlaps the loop-filter search (the
        # filter never reads the probability tables)
        from .serializer import count_token_branches, optimize_token_probs
        counts_f = worker_pool().submit(count_token_branches, arrays)
        with tracing.stage("enc.lf_search"):
            lf_level, filtered, lf_ssim = self._search_loopfilter(
                header, arrays, new_state, recon, orig, True)
        header.loop_filter_level = lf_level
        with tracing.stage("enc.token_counts_join"):
            counts = counts_f.result()
        header.token_prob_update = optimize_token_probs(
            counts, new_state.probability_tables.coeff_probs)
        frame_probs = new_state.probability_tables.copy()
        frame_probs.coeff_prob_update(header)

        with tracing.stage("enc.serialize"):
            payload = serialize_frame(header, arrays, frame_probs,
                                      True, self.width, self.height)
        quality = lf_ssim    # the search already scored the winner

        if update:
            self.state = new_state
            # refresh_entropy_probs=True persists the per-frame tables
            self.state.probability_tables = frame_probs.copy()
            self.references.last = filtered
            self.references.golden = filtered
            self.references.alternative = filtered
            self.last_loop_filter_level = lf_level
            if self.device_encode:
                from .encode_inter_device import _cache_device_refs
                _cache_device_refs(self, header, arrays, *dev_tiles,
                                   interpret=False, key_frame=True)
        return payload, quality

    def _encode_interframe(self, yuv, quant_indices, update):
        if self.device_encode:
            if self.quality == "rt":
                from . import encode_inter_fast
                if encode_inter_fast.enabled():
                    # split decision/dense pipeline — the Salsify 33 ms
                    # design point (ALFALFA_FAST_INTER=1; quality-gated
                    # by tests/test_fast_inter.py, not bit-exact vs the
                    # host loop)
                    return encode_inter_fast.encode_interframe_fast(
                        self, yuv, quant_indices, update)
            # whole MB raster loop (motion search + mode decision +
            # residues + reconstruction) on-chip, bit-identical to the
            # host loop (tests/test_device_inter.py); --two-pass runs
            # the trellis DP for intra MBs inside the same kernel
            from .encode_inter_device import encode_interframe_device
            return encode_interframe_device(self, yuv, quant_indices, update)
        from . import encode_inter_np
        return encode_inter_np.encode_interframe(self, yuv, quant_indices, update)

    # -- loop filter search (encoder.cc:459-516) -------------------------------

    def _search_loopfilter(self, header, arrays, state, recon, orig, key_frame):
        """Hill-climb the loop filter level by SSIM vs the original; returns
        (level, filtered_raster, ssim). Starts near the last frame's level
        in realtime mode; full climb from 0 otherwise."""
        # the reference emits mode_lf_adjustments with explicit zero updates
        from alfalfa_tpu.bitstream.header import ModeRefLFDeltaUpdate
        header.mode_lf_adjustments_enabled = True
        header.mode_lf_adjustments = ModeRefLFDeltaUpdate([0] * 4, [0] * 4)
        from alfalfa_tpu.state.decoder_state import FilterAdjustments
        state.filter_adjustments = FilterAdjustments.create(header)

        # +-1 window around the previous level in realtime mode only: the
        # reference persists loop_filter_level_ solely under
        # REALTIME_QUALITY (encoder.cc:164-166, 477-487); best quality
        # re-climbs from 0 with break-on-first-drop every frame
        min_lf, max_lf = 0, 63
        if self.quality == "rt" and self.last_loop_filter_level is not None:
            min_lf = max(0, self.last_loop_filter_level - 1)
            max_lf = min(63, self.last_loop_filter_level + 1)

        oy = orig.display()[0]

        def evaluate(level):
            # per-thread header copy: the native filter + SSIM release the
            # GIL, so candidate levels run concurrently on multicore hosts
            import copy as _copy
            h = _copy.copy(header)
            h.loop_filter_level = level
            candidate = recon.copy()
            R._loopfilter_frame(h, arrays, state, candidate, key_frame)
            return ssim(candidate.display()[0], oy), candidate

        # evaluate in core-sized chunks, applying the reference's
        # break-on-first-SSIM-drop sequentially over the results — the
        # picked level is identical to the serial climb (encoder.cc:488)
        levels = list(range(min_lf, max_lf + 1))
        K = max(1, min(len(levels), _lf_threads(), 8))
        best = (-1.0, 0, None)
        if K == 1:
            for level in levels:
                s, candidate = evaluate(level)
                if s > best[0]:
                    best = (s, level, candidate)
                else:
                    break
        else:
            ex = worker_pool()
            stop = False
            for base in range(0, len(levels), K):
                chunk = levels[base:base + K]
                for level, (s, candidate) in zip(chunk,
                                                 ex.map(evaluate, chunk)):
                    if s > best[0]:
                        best = (s, level, candidate)
                    else:
                        stop = True
                        break
                if stop:
                    break
        s, level, filtered = best
        return level, filtered, s
