#!/usr/bin/env python3
"""Bit-exactness gate for the TPU batched decode path (G=8, 720p) against
the fixture manifest SHA-1 — run on the real chip after step changes."""
import sys, os, json, hashlib
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from alfalfa_tpu.util.ivf import IVFReader
from alfalfa_tpu.parallel.gop import BatchedGopDecoder
from alfalfa_tpu.state.decoder_state import Raster

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIX = os.path.join(REPO, "tests", "fixtures")
clip = sys.argv[1] if len(sys.argv) > 1 else "inter_1280x720_q48.ivf"
G = int(sys.argv[2]) if len(sys.argv) > 2 else 8

with open(os.path.join(FIX, "manifest.json")) as fh:
    manifest = json.load(fh)
path = os.path.join(FIX, clip)
ivf = IVFReader(path)
payloads = [ivf.frame(i) for i in range(len(ivf))]
dec = BatchedGopDecoder(ivf.width, ivf.height, G)
digests = [hashlib.sha1() for _ in range(G)]
for f, p in enumerate(payloads):
    (y, u, v), show = dec.decode_frame_batch([p] * G)
    y, u, v = np.asarray(y), np.asarray(u), np.asarray(v)
    for g in range(G):
        if show[g]:
            r = Raster(ivf.width, ivf.height, y[g], u[g], v[g])
            digests[g].update(r.dump_bytes())
    print(f"frame {f} ok", flush=True)
want = manifest[clip]["yuv_sha1"]
for g in range(G):
    got = digests[g].hexdigest()
    assert got == want, f"slot {g}: {got} != {want}"
print(f"PASS: {clip} G={G} bit-exact ({want[:12]})", flush=True)
