#!/usr/bin/env python3
"""Randomized end-to-end soak: generate clips across sizes (aligned and
not), quantizers, qualities, and encode modes; require our encoder's
output to decode BYTE-EXACTLY in both our decoder and the reference
oracle decoder, and the batched lockstep decoder to agree too.

Usage: python tools/soak.py [n_trials] [seed]
Prints one line per trial; exits nonzero on the first mismatch with a
repro line.
"""
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tests", "fixtures"))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE = os.path.join(REPO, "oracle", "build", "bin", "decode-to-stdout")


def one_trial(rng, tmpdir, i):
    from gen_inputs import gen_clip
    from alfalfa_tpu.encoder import Encoder
    from alfalfa_tpu.util.ivf import IVFReader, IVFWriter
    from alfalfa_tpu.decoder import FilePlayer

    w = int(rng.choice([48, 64, 66, 80, 96, 112, 144, 174, 176, 208]))
    h = int(rng.choice([32, 34, 48, 64, 80, 100, 112, 144]))
    frames = int(rng.integers(2, 6))
    qi = int(rng.integers(4, 121))
    quality = str(rng.choice(["best", "rt"]))
    mode = str(rng.choice(["qp", "qp", "qp", "ssim", "target", "twopass"]))
    seed = int(rng.integers(0, 1 << 30))
    desc = f"trial {i}: {w}x{h} f={frames} qi={qi} {quality} {mode} seed={seed}"
    print("  starting " + desc, flush=True)   # survives a native crash

    clip = gen_clip(w, h, frames, seed=seed)
    enc = Encoder(w, h, quality=quality, two_pass=(mode == "twopass"))
    ivf = os.path.join(tmpdir, f"soak_{i}.ivf")
    with IVFWriter(ivf, width=w, height=h) as wr:
        for fi, f in enumerate(clip):
            kf = fi == 0
            if mode == "ssim":
                p = enc.encode_with_minimum_ssim(f, 0.8, key_frame=kf)
            elif mode == "target":
                p = enc.encode_with_target_size(f, int(rng.integers(400, 4000)),
                                                key_frame=kf)
            else:
                p = enc.encode_with_quantizer(f, qi, key_frame=kf)
            wr.append_frame(p)

    want = subprocess.run([ORACLE, ivf], capture_output=True,
                          timeout=120).stdout
    ours = b""
    for raster in FilePlayer(ivf):
        for plane in raster.display():
            ours += plane.tobytes()
    if ours != want:
        return desc + "  MISMATCH scalar-vs-oracle"

    # batched lockstep decoder (G=2) must agree on cropped planes
    from alfalfa_tpu.parallel.gop import BatchedGopDecoder
    rd = IVFReader(ivf)
    dec = BatchedGopDecoder(rd.width, rd.height, 2)
    off = 0
    ch, cw = (h + 1) // 2, (w + 1) // 2
    for fi in range(len(rd)):
        (y, u, v), _ = dec.decode_frame_batch([rd.frame(fi)] * 2)
        poff = off
        for g in range(2):
            poff = off
            for plane, (ph, pw) in ((np.asarray(y[g]), (h, w)),
                                    (np.asarray(u[g]), (ch, cw)),
                                    (np.asarray(v[g]), (ch, cw))):
                ref = np.frombuffer(want[poff:poff + ph * pw],
                                    np.uint8).reshape(ph, pw)
                if not np.array_equal(plane[:ph, :pw], ref):
                    return desc + f"  MISMATCH batched frame {fi}"
                poff += ph * pw
        off = poff
    os.unlink(ivf)
    return desc + "  ok"


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1234
    rng = np.random.default_rng(seed)
    tmpdir = "/tmp/alfalfa_soak"
    os.makedirs(tmpdir, exist_ok=True)
    for i in range(n):
        line = one_trial(rng, tmpdir, i)
        print(line, flush=True)
        if "MISMATCH" in line:
            sys.exit(1)
    print(f"soak: {n} trials clean")


if __name__ == "__main__":
    main()
