#!/usr/bin/env python3
"""Deterministic natural-looking y4m clip generator for the decode corpus.

The reference's decode ground truth is a 54-clip corpus of real video
(/root/reference/src/tests/decoding.test:6-21, .gitmodules:1-3 —
alfalfa_test_vectors, unavailable here: no network egress).  These clips
stand in for it with camera-like content that synthetic noise/blocks
under-exercise: smooth multi-octave textures (natural rate
distributions), true sub-pixel panning and zooming (dense non-integer MV
fields), scene cuts (intra bursts mid-stream), film grain (high-entropy
residues), fades (TM-mode fodder), near-static scenes (skip/ZEROMV runs),
and camera shake (erratic global motion).

Everything is pure numpy and seeded, so the corpus is regenerable
bit-for-bit by oracle/make_natural_corpus.py.
"""
import numpy as np


def _upsample_bilinear(a, h, w):
    """Bilinear-resize a 2-D float array to (h, w)."""
    ah, aw = a.shape
    y = np.linspace(0, ah - 1, h)
    x = np.linspace(0, aw - 1, w)
    y0 = np.floor(y).astype(np.int64)
    x0 = np.floor(x).astype(np.int64)
    y1 = np.minimum(y0 + 1, ah - 1)
    x1 = np.minimum(x0 + 1, aw - 1)
    fy = (y - y0)[:, None]
    fx = (x - x0)[None, :]
    return (a[y0][:, x0] * (1 - fy) * (1 - fx) + a[y0][:, x1] * (1 - fy) * fx
            + a[y1][:, x0] * fy * (1 - fx) + a[y1][:, x1] * fy * fx)


def value_noise(rng, h, w, octaves=7, base=8, persistence=0.68):
    """Multi-octave value noise: smooth, natural-looking luminance."""
    out = np.zeros((h, w))
    amp, total = 1.0, 0.0
    for o in range(octaves):
        gh = min(h, base * (2 ** o))
        gw = min(w, base * (2 ** o))
        out += amp * _upsample_bilinear(rng.rand(gh, gw), h, w)
        total += amp
        amp *= persistence
    return out / total


def make_world(rng, h, w, kind="landscape"):
    """A luma/chroma 'world' the camera moves over (float 0..255)."""
    y = value_noise(rng, h, w, octaves=8) * 235 + 10
    if kind == "landscape":
        # horizon gradient + a few hard-edged structures (buildings/rocks)
        y += (np.linspace(-30, 30, h))[:, None]
        for _ in range(6):
            r0 = rng.randint(0, h - 24)
            c0 = rng.randint(0, w - 24)
            rh = rng.randint(12, max(13, h // 4))
            rw = rng.randint(12, max(13, w // 4))
            y[r0:r0 + rh, c0:c0 + rw] += rng.randint(-50, 51)
    u = value_noise(rng, h // 2, w // 2, octaves=3) * 90 + 85
    v = value_noise(rng, h // 2, w // 2, octaves=3) * 90 + 85
    return (np.clip(y, 0, 255), np.clip(u, 16, 240), np.clip(v, 16, 240))


def _sample(world, y0, x0, h, w, zoom=1.0):
    """Bilinearly sample an (h, w) window at float offset, float zoom."""
    wh, ww = world.shape
    ys = y0 + np.arange(h) * zoom
    xs = x0 + np.arange(w) * zoom
    ys = np.clip(ys, 0, wh - 1.001)
    xs = np.clip(xs, 0, ww - 1.001)
    iy = ys.astype(np.int64)
    ix = xs.astype(np.int64)
    fy = (ys - iy)[:, None]
    fx = (xs - ix)[None, :]
    return (world[iy][:, ix] * (1 - fy) * (1 - fx)
            + world[iy][:, ix + 1] * (1 - fy) * fx
            + world[iy + 1][:, ix] * fy * (1 - fx)
            + world[iy + 1][:, ix + 1] * fy * fx)


def _sprite(rng, size):
    """Soft-edged elliptical blob with internal texture."""
    yy, xx = np.indices((size, size))
    cy = cx = (size - 1) / 2
    d = np.sqrt(((yy - cy) / (size * 0.45)) ** 2
                + ((xx - cx) / (size * 0.38)) ** 2)
    alpha = np.clip(1.25 - d, 0, 1) ** 1.5
    tex = value_noise(rng, size, size, octaves=3) * 120 + 80
    return tex, alpha


def gen_clip(width, height, frames, seed=1, scene="pan", grain=2.5,
             cut_at=None, fade=False, shake=0.0, objects=0, zoom_rate=0.0,
             pan=(1.7, 3.3), still=False):
    """Camera-like clip: returns [(y, u, v)] uint8 planes (4:2:0)."""
    rng = np.random.RandomState(seed)
    margin = int(max(abs(pan[0]), abs(pan[1])) * frames
                 + abs(zoom_rate) * frames * max(width, height)
                 + shake * 4 + 8)
    wh, ww = height + 2 * margin, width + 2 * margin
    worlds = [make_world(rng, wh, ww)]
    if cut_at is not None:
        worlds.append(make_world(rng, wh, ww, kind="plain"))
    sprites = [(_sprite(rng, rng.randint(18, 34)),
                rng.uniform(4, 14, 2) * rng.choice([-1, 1], 2),
                rng.uniform(margin, margin + min(width, height) // 2, 2))
               for _ in range(objects)]

    out = []
    for n in range(frames):
        wy, wu, wv = worlds[0 if cut_at is None or n < cut_at else 1]
        if still:
            oy = ox = float(margin)
        else:
            oy = margin + pan[0] * n
            ox = margin + pan[1] * n
        if shake:
            oy += rng.uniform(-shake, shake)
            ox += rng.uniform(-shake, shake)
        z = 1.0 + zoom_rate * n
        y = _sample(wy, oy, ox, height, width, z)
        u = _sample(wu, oy / 2, ox / 2, height // 2, width // 2, z)
        v = _sample(wv, oy / 2, ox / 2, height // 2, width // 2, z)

        for (tex, alpha), vel, pos in sprites:
            sy = int(pos[0] + vel[0] * n - oy + margin)
            sx = int(pos[1] + vel[1] * n - ox + margin)
            s = tex.shape[0]
            r0, r1 = max(0, sy), min(height, sy + s)
            c0, c1 = max(0, sx), min(width, sx + s)
            if r1 > r0 and c1 > c0:
                ty, ta = (tex[r0 - sy:r1 - sy, c0 - sx:c1 - sx],
                          alpha[r0 - sy:r1 - sy, c0 - sx:c1 - sx])
                y[r0:r1, c0:c1] = y[r0:r1, c0:c1] * (1 - ta) + ty * ta

        if fade:
            y = y * (0.25 + 0.75 * n / max(1, frames - 1)) + 16 * (
                1 - n / max(1, frames - 1))
        if grain:
            y = y + rng.normal(0, grain, y.shape)
        out.append((np.clip(y, 0, 255).astype(np.uint8),
                    np.clip(u, 0, 255).astype(np.uint8),
                    np.clip(v, 0, 255).astype(np.uint8)))
    return out


def write_y4m(path, clip, width, height):
    with open(path, "wb") as f:
        f.write(b"YUV4MPEG2 W%d H%d F30:1 Ip A1:1 C420\n" % (width, height))
        for y, u, v in clip:
            f.write(b"FRAME\n")
            f.write(y.tobytes())
            f.write(u.tobytes())
            f.write(v.tobytes())


# ---------------------------------------------------------------------------
# The corpus matrix: scene definitions and the oracle-encode settings.
# Names are stable; oracle/make_natural_corpus.py renders + encodes these.
# ---------------------------------------------------------------------------

SCENES = {
    # name: (W, H, frames, kwargs)
    "pan_qcif":    (176, 144, 12, dict(seed=101, scene="pan")),
    "pan_320":     (320, 240, 10, dict(seed=102, pan=(2.3, -4.1))),
    "pan_640":     (640, 360, 8, dict(seed=103, pan=(1.1, 5.7))),
    "pan_720p":    (1280, 720, 6, dict(seed=104, pan=(2.9, 6.3))),
    "zoom_qcif":   (176, 144, 12, dict(seed=105, pan=(0.4, 0.7),
                                       zoom_rate=0.012)),
    "zoom_320":    (320, 240, 10, dict(seed=106, pan=(0.2, 0.4),
                                       zoom_rate=-0.009)),
    "cut_qcif":    (176, 144, 12, dict(seed=107, cut_at=6)),
    "cut_320":     (320, 240, 10, dict(seed=108, cut_at=5, pan=(3.1, 1.2))),
    "cut_720p":    (1280, 720, 6, dict(seed=109, cut_at=3, pan=(1.5, 4.4))),
    "fade_qcif":   (176, 144, 12, dict(seed=110, fade=True, pan=(0.9, 1.8))),
    "grain_qcif":  (176, 144, 10, dict(seed=111, grain=6.0)),
    "object_qcif": (176, 144, 12, dict(seed=112, objects=3, still=True,
                                       grain=0.6)),
    "shake_320":   (320, 240, 10, dict(seed=113, shake=3.5, pan=(0.3, 0.5))),
    "still_qcif":  (176, 144, 10, dict(seed=114, still=True, grain=0.4)),
    # non-MB-multiple sizes: the reference ENCODER heap-corrupts when
    # width % 16 is in 1..7 (and on some width/height combinations — see
    # tests/test_odd_sizes.py, which gates truly-odd sizes through OUR
    # encoder), so pick non-aligned sizes it survives
    "pan_90x48":   (90, 48, 8, dict(seed=115)),
    "zoom_140x96": (140, 96, 8, dict(seed=116, pan=(0.3, 0.5),
                                     zoom_rate=0.015)),
    "cut_360x242": (360, 242, 8, dict(seed=117, cut_at=4, pan=(2.2, 2.8))),
}

# encode matrix: (scene, output tag, xc-enc args)
ENCODES = [
    ("pan_qcif", "q16", ["--y-ac-qi", "16"]),
    ("pan_qcif", "q48", ["--y-ac-qi", "48"]),
    ("pan_qcif", "q96", ["--y-ac-qi", "96"]),
    ("pan_qcif", "rt_q48", ["-q", "rt", "--y-ac-qi", "48"]),
    ("pan_qcif", "tp_q32", ["--two-pass", "--y-ac-qi", "32"]),
    ("pan_qcif", "ssim75", ["-s", "0.75"]),
    ("pan_320", "q40", ["--y-ac-qi", "40"]),
    ("pan_320", "rt_q64", ["-q", "rt", "--y-ac-qi", "64"]),
    ("pan_640", "q48", ["--y-ac-qi", "48"]),
    ("pan_640", "rt_q48", ["-q", "rt", "--y-ac-qi", "48"]),
    ("pan_720p", "q48", ["--y-ac-qi", "48"]),
    ("pan_720p", "tp_q56", ["--two-pass", "--y-ac-qi", "56"]),
    ("zoom_qcif", "q32", ["--y-ac-qi", "32"]),
    ("zoom_qcif", "q80", ["--y-ac-qi", "80"]),
    ("zoom_320", "q56", ["--y-ac-qi", "56"]),
    ("cut_qcif", "q32", ["--y-ac-qi", "32"]),
    ("cut_qcif", "rt_q48", ["-q", "rt", "--y-ac-qi", "48"]),
    ("cut_320", "q56", ["--y-ac-qi", "56"]),
    ("cut_720p", "q64", ["--y-ac-qi", "64"]),
    ("fade_qcif", "q40", ["--y-ac-qi", "40"]),
    ("fade_qcif", "q8", ["--y-ac-qi", "8"]),
    ("grain_qcif", "q48", ["--y-ac-qi", "48"]),
    ("grain_qcif", "q112", ["--y-ac-qi", "112"]),
    ("object_qcif", "q24", ["--y-ac-qi", "24"]),
    ("object_qcif", "tp_q48", ["--two-pass", "--y-ac-qi", "48"]),
    ("shake_320", "q48", ["--y-ac-qi", "48"]),
    ("still_qcif", "q48", ["--y-ac-qi", "48"]),
    ("still_qcif", "q4", ["--y-ac-qi", "4"]),
    ("pan_90x48", "q40", ["--y-ac-qi", "40"]),
    ("zoom_140x96", "q48", ["--y-ac-qi", "48"]),
    ("cut_360x242", "q56", ["--y-ac-qi", "56"]),
]


if __name__ == "__main__":
    import sys
    name = sys.argv[1]
    path = sys.argv[2]
    w, h, frames, kw = SCENES[name]
    write_y4m(path, gen_clip(w, h, frames, **kw), w, h)
