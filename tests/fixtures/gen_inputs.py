#!/usr/bin/env python3
"""Deterministic synthetic y4m clip generator for test fixtures.

Content mixes moving gradients, translating rectangles, and mild noise so the
oracle encoder exercises intra modes, motion search, and the loop filter.
"""
import sys
import numpy as np


def gen_clip(width, height, frames, seed=7):
    rng = np.random.RandomState(seed)
    hh, hw = height // 2, width // 2
    base = ((np.indices((height, width)).sum(0) * 3) % 256).astype(np.uint8)
    tex = rng.randint(0, 40, (height, width)).astype(np.int16)
    out = []
    for n in range(frames):
        y = np.roll(base, n * 3, axis=1).astype(np.int16) + tex
        # translating bright rectangle (inter-prediction fodder)
        r0, c0 = 10 + (n * 2) % max(1, height - 40), (8 + n * 5) % max(1, width - 48)
        y[r0:r0 + 30, c0:c0 + 40] += 90
        # slowly varying noise to keep residues nonzero
        y += rng.randint(-3, 4, (height, width))
        y = np.clip(y, 0, 255).astype(np.uint8)
        u = np.clip(((np.indices((hh, hw)).sum(0) + n * 4) % 220 + 20), 0, 255).astype(np.uint8)
        v = np.roll((np.indices((hh, hw))[0] % 200 + 28).astype(np.uint8), n * 2, axis=0)
        out.append((y, u, v))
    return out


def write_y4m(path, clip, width, height):
    with open(path, 'wb') as f:
        f.write(b'YUV4MPEG2 W%d H%d F30:1 Ip A1:1 C420\n' % (width, height))
        for y, u, v in clip:
            f.write(b'FRAME\n')
            f.write(y.tobytes())
            f.write(u.tobytes())
            f.write(v.tobytes())


if __name__ == '__main__':
    width, height, frames, path = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    seed = int(sys.argv[5]) if len(sys.argv) > 5 else 7
    write_y4m(path, gen_clip(width, height, frames, seed), width, height)
