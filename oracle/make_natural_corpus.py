#!/usr/bin/env python3
"""Render the natural-content corpus and oracle-encode it.

Stand-in for the reference's alfalfa_test_vectors submodule (54 real-video
IVFs named by the SHA-1 of their decoded output; decoding.test:6-21) —
the submodule is unreachable here, so tests/fixtures/gen_natural.py
synthesizes camera-like content and this script drives the ORACLE
(reference) encoder over the ENCODES matrix, then records the oracle
decoder's SHA-1 per clip as ground truth in natural_manifest.json.

Usage: python3 oracle/make_natural_corpus.py   (regenerates everything)
"""
import hashlib
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
FIX = os.path.join(REPO, "tests", "fixtures")
NAT = os.path.join(FIX, "natural")
TMP = os.path.join(FIX, "tmp")
BIN = os.path.join(HERE, "build", "bin")

sys.path.insert(0, FIX)
from gen_natural import SCENES, ENCODES, gen_clip, write_y4m  # noqa: E402


def main():
    subprocess.run(["make", "-C", HERE, "-j", str(os.cpu_count() or 4)],
                   check=True, capture_output=True)
    os.makedirs(NAT, exist_ok=True)
    os.makedirs(TMP, exist_ok=True)

    y4ms = {}
    for name, (w, h, frames, kw) in SCENES.items():
        path = os.path.join(TMP, f"nat_{name}.y4m")
        if not os.path.exists(path):
            write_y4m(path, gen_clip(w, h, frames, **kw), w, h)
        y4ms[name] = path
        print(f"rendered {name} {w}x{h}x{frames}")

    manifest = {}
    for scene, tag, args in ENCODES:
        w, h, frames, _ = SCENES[scene]
        out = os.path.join(NAT, f"{scene}_{tag}.ivf")
        subprocess.run([os.path.join(BIN, "xc-enc"), "-i", "y4m",
                        "-o", out] + args + [y4ms[scene]],
                       check=True, capture_output=True, timeout=1800)
        yuv = subprocess.run([os.path.join(BIN, "decode-to-stdout"), out],
                             check=True, stdout=subprocess.PIPE).stdout
        manifest[os.path.basename(out)] = {
            "yuv_sha1": hashlib.sha1(yuv).hexdigest(),
            "yuv_bytes": len(yuv),
            "ivf_bytes": os.path.getsize(out),
            "width": w, "height": h, "frames": frames,
        }
        print(f"encoded {os.path.basename(out)}: "
              f"{os.path.getsize(out)} bytes")

    with open(os.path.join(FIX, "natural_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    total = sum(m["ivf_bytes"] for m in manifest.values())
    print(f"{len(manifest)} clips, {total / 1e6:.2f} MB total")


if __name__ == "__main__":
    main()
