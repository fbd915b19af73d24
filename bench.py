#!/usr/bin/env python3
"""Benchmark: VP8 decode throughput vs the reference (oracle) decoder.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ...,
"vs_baseline": N}.  vs_baseline is our frames/s divided by the reference
scalar decoder's frames/s on the same clip on this host (the reference's
own headline is single-core software decode; BASELINE.md targets >= 10x).
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
CLIP = os.path.join(REPO, "tests", "fixtures", "inter_176x144_q32.ivf")
ORACLE = os.path.join(REPO, "oracle", "build", "bin", "decode-to-stdout")


def oracle_fps(clip, frames):
    if not os.path.exists(ORACLE):
        try:
            subprocess.run(["make", "-C", os.path.join(REPO, "oracle"),
                            "-j", str(os.cpu_count() or 4)],
                           check=True, capture_output=True, timeout=600)
        except Exception:
            return None
    # warm cache, then time
    subprocess.run([ORACLE, clip], stdout=subprocess.DEVNULL, check=True)
    t0 = time.perf_counter()
    for _ in range(3):
        subprocess.run([ORACLE, clip], stdout=subprocess.DEVNULL, check=True)
    return 3 * frames / (time.perf_counter() - t0)


def our_fps(clip, frames):
    from alfalfa_tpu.decoder import FilePlayer

    # warmup pass (jit compile both frame types)
    for _ in FilePlayer(clip, backend="jax"):
        pass
    t0 = time.perf_counter()
    n = 0
    for raster in FilePlayer(clip, backend="jax"):
        raster.y.ravel()[0]  # force materialization
        n += 1
    return n / (time.perf_counter() - t0)


def main():
    sys.path.insert(0, REPO)
    from alfalfa_tpu.util.ivf import IVFReader

    frames = IVFReader(CLIP).frame_count
    ours = our_fps(CLIP, frames)
    ref = oracle_fps(CLIP, frames)
    print(json.dumps({
        "metric": "vp8_decode_fps_176x144",
        "value": round(ours, 3),
        "unit": "frames/s",
        "vs_baseline": round(ours / ref, 4) if ref else None,
    }))


if __name__ == "__main__":
    main()
