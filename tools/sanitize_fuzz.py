#!/usr/bin/env python3
"""jax-free fuzz driver for the ASAN/UBSAN-built native layer.

The sanitizer runtime must be preloaded into the whole process, which is
incompatible with jaxlib (its statically linked C++ runtime throws before
ASAN's __cxa_throw interceptor is bound), so this driver exercises every
native entry point (bitwork.cc frame-header / MB-header / token parse,
FastBool, BoolEnc + mode/token writers, tokensimd.cc DFA engines,
mbparse.cc, enckernel.cc, lfkernel.cc SSIM) through the pure-numpy host
paths only — no jax import anywhere.

Stages:
  1. bit-exact decode of fixture + natural-corpus clips (scalar player)
  2. interleaved GOP token parse: scalar / MT / SIMD / SIMD+MT engines
     must agree with the per-frame parse, on real streams
  3. truncation + byte-flip fuzz through the error-concealment decoder
  4. host encoder roundtrips (qp / two-pass / ssim-target / rt) — writer
     paths + in-loop decode, output re-decoded and compared

Run under the sanitizers via tests/test_sanitizers.py; exits nonzero on
the first failure.
"""
import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests", "fixtures"))

import numpy as np

assert os.environ.get("ALFALFA_SANITIZE") == "1" or "--unsanitized" \
    in sys.argv, "run me with ALFALFA_SANITIZE=1 (see tests/test_sanitizers.py)"

FIX = os.path.join(REPO, "tests", "fixtures")


def stage1_decode():
    from alfalfa_tpu.decoder import FilePlayer
    with open(os.path.join(FIX, "manifest.json")) as f:
        man = json.load(f)
    with open(os.path.join(FIX, "natural_manifest.json")) as f:
        nat = json.load(f)
    clips = [(os.path.join(FIX, n), m) for n, m in man.items()
             if "720" not in n and "320" not in n]
    clips += [(os.path.join(FIX, "natural", n), nat[n])
              for n in ("pan_qcif_q48.ivf", "cut_qcif_q32.ivf",
                        "grain_qcif_q112.ivf", "pan_90x48_q40.ivf",
                        "still_qcif_q4.ivf", "object_qcif_tp_q48.ivf",
                        "pan_qcif_rt_q48.ivf", "fade_qcif_q8.ivf")]
    for path, m in clips:
        out = b""
        for raster in FilePlayer(path):
            out += raster.dump_bytes()
        got = hashlib.sha1(out).hexdigest()
        assert got == m["yuv_sha1"], f"decode mismatch: {path}"
        print(f"  stage1 {os.path.basename(path)} ok", flush=True)


def _gop_token_inputs(path, G=3):
    """Parse the first interframe of ``path`` G times (independent
    states), return the parse_tokens_gop argument tuple."""
    from alfalfa_tpu.util.ivf import IVFReader
    from alfalfa_tpu.bitstream.header import UncompressedChunk
    from alfalfa_tpu.decoder.parse import FrameParser
    from alfalfa_tpu.state.decoder_state import DecoderState

    ivf = IVFReader(path)
    states = [DecoderState.initial(ivf.width, ivf.height) for _ in range(G)]
    R, C = (ivf.height + 15) // 16, (ivf.width + 15) // 16
    ref = None
    for i in range(len(ivf)):
        payload = ivf.frame(i)
        chunks = [UncompressedChunk(payload, ivf.width, ivf.height)
                  for _ in range(G)]
        parsers = [FrameParser(states[g], sparse_tokens=True,
                               defer_tokens=True) for g in range(G)]
        hdr = [parsers[g].parse_header_phase(chunks[g]) for g in range(G)]
        per = []
        for g in range(G):
            header, fp, bd = hdr[g]
            arrays = parsers[g]._parse_macroblock_headers(
                bd, header, fp, key_frame=chunks[g].key_frame,
                error_concealment=False)
            parsers[g]._apply_segmentation_map(arrays)
            per.append((header, arrays, chunks[g], fp))
        frame_parts = [p[2].dct_partitions(
            1 << p[0].log2_number_of_dct_partitions) for p in per]
        probs = [p[3].coeff_probs for p in per]
        skip = np.stack([p[1].skip_coeff for p in per]).astype(np.uint8)
        y2 = np.stack([p[1].y2_coded for p in per]).astype(np.uint8)
        ref = (frame_parts, R, C, probs, skip, y2)
        # per-frame oracle: the scalar in-frame token parse
        for g in range(G):
            parsers[g]._parse_tokens(per[g][2], per[g][0], per[g][1],
                                     per[g][3])
    return ref


def stage2_token_engines():
    from alfalfa_tpu.native import bitwork
    for clip in ("inter_176x144_q32.ivf", "kf_176x144_q16.ivf"):
        frame_parts, R, C, probs, skip, y2 = _gop_token_inputs(
            os.path.join(FIX, clip))
        runs = {}
        for tag, (simd, threads) in dict(
                scalar=(0, 1), scalar_mt=(0, 2),
                simd=(1, 1), simd_mt=(1, 2)).items():
            os.environ["ALFALFA_SIMD_TOKENS"] = str(simd)
            bitwork._simdlib = None      # re-evaluate the knob
            hnz = np.zeros(skip.shape, np.uint8)
            out = bitwork.parse_tokens_gop(
                frame_parts, R, C, probs, skip, y2, hnz, threads=threads)
            assert out is not None, f"{clip} {tag}: parse failed"
            runs[tag] = (out, hnz.copy())
        base, bnz = runs["scalar"]
        for tag, (out, hnz) in runs.items():
            assert (hnz == bnz).all(), f"{clip} {tag}: nz mismatch"
            for k in base:
                assert np.array_equal(base[k], out[k]), \
                    f"{clip} {tag}: compact stream field {k} differs"
        os.environ.pop("ALFALFA_SIMD_TOKENS", None)
        bitwork._simdlib = None
        print(f"  stage2 {clip} ok (4 engines agree)", flush=True)


def stage3_corruption(n_trunc=24, n_flip=40, seed=77):
    from alfalfa_tpu.util.ivf import IVFReader
    from alfalfa_tpu.decoder.decoder import Decoder

    rng = np.random.RandomState(seed)
    path = os.path.join(FIX, "inter_176x144_q32.ivf")
    ivf = IVFReader(path)
    payloads = [ivf.frame(i) for i in range(len(ivf))]

    def run(mutate):
        dec = Decoder(ivf.width, ivf.height, error_concealment=True)
        for i, p in enumerate(payloads):
            q = mutate(i, bytearray(p))
            try:
                dec.decode_frame(bytes(q))
            except Exception:
                pass        # decode errors are fine; crashes are not

    for t in range(n_trunc):
        cut = rng.randint(1, max(2, len(payloads[t % len(payloads)])))
        run(lambda i, b, t=t, cut=cut: b[:cut] if i == t % len(payloads)
            else b)
    for _ in range(n_flip):
        fi = rng.randint(len(payloads))
        run(lambda i, b, fi=fi: _flip(rng, b) if i == fi else b)
    print("  stage3 corruption fuzz ok", flush=True)


def _flip(rng, b):
    for _ in range(rng.randint(1, 6)):
        b[rng.randint(len(b))] ^= 1 << rng.randint(8)
    return b


def stage4_encode():
    from gen_natural import gen_clip
    from alfalfa_tpu.encoder import Encoder
    from alfalfa_tpu.decoder.decoder import Decoder

    w, h, n = 96, 64, 3
    clip = gen_clip(w, h, n, seed=55)
    for quality, mode in (("best", "qp"), ("rt", "qp"), ("best", "twopass"),
                          ("best", "ssim")):
        enc = Encoder(w, h, quality=quality,
                      two_pass=(mode == "twopass"))
        dec = Decoder(w, h)
        for fi, f in enumerate(clip):
            kf = fi == 0
            if mode == "ssim":
                payload = enc.encode_with_minimum_ssim(f, 0.7, key_frame=kf)
            else:
                payload = enc.encode_with_quantizer(f, 40, key_frame=kf)
            dec.decode_frame(payload)
            el, dl = enc.references.last, dec.references.last
            assert (np.asarray(dl.y) == np.asarray(el.y)).all() \
                and (np.asarray(dl.u) == np.asarray(el.u)).all() \
                and (np.asarray(dl.v) == np.asarray(el.v)).all(), \
                f"{quality}/{mode}: enc/dec drift at frame {fi}"
        print(f"  stage4 encode {quality}/{mode} ok", flush=True)


if __name__ == "__main__":
    stage1_decode()
    stage2_token_engines()
    stage3_corruption()
    stage4_encode()
    assert "jax" not in sys.modules, "driver accidentally imported jax"
    print("sanitize_fuzz: all stages passed", flush=True)
