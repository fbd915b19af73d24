"""Structural similarity, x264-window formulation (integer 4x4 block sums,
8x8 overlapping windows on a 4-pixel grid).

Same algorithm as the quality metric the codec uses for loop-filter search
and SSIM-target rate control (reference util/ssim.cc wraps libx264's; the
oracle build uses the identical reimplementation in oracle/stubs/ssim.cc,
so quality comparisons against oracle encodes are apples-to-apples).
"""
import numpy as np

C1 = 416      # .01^2 * 255^2 * 64
C2 = 235963   # .03^2 * 255^2 * 64 * 63


def ssim(img1, img2):
    """SSIM over the overlap of 8x8 windows; img1/img2: (H, W) uint8."""
    try:
        from alfalfa_tpu.native import lfkernel
        if lfkernel.available():
            return lfkernel.ssim(img1, img2)
    except Exception:
        pass
    a = img1.astype(np.int64)
    b = img2.astype(np.int64)
    h, w = a.shape
    bh, bw = h // 4, w // 4
    if bh < 2 or bw < 2:
        return 1.0

    # per-4x4-block sums
    a4 = a[:bh * 4, :bw * 4].reshape(bh, 4, bw, 4)
    b4 = b[:bh * 4, :bw * 4].reshape(bh, 4, bw, 4)
    s1 = a4.sum(axis=(1, 3))
    s2 = b4.sum(axis=(1, 3))
    ss = (a4 * a4).sum(axis=(1, 3)) + (b4 * b4).sum(axis=(1, 3))
    s12 = (a4 * b4).sum(axis=(1, 3))

    # 2x2 block windows
    def win(x):
        return x[:-1, :-1] + x[:-1, 1:] + x[1:, :-1] + x[1:, 1:]

    t1, t2, tss, t12 = win(s1), win(s2), win(ss), win(s12)
    vars_ = tss * 64 - t1 * t1 - t2 * t2
    covar = t12 * 64 - t1 * t2
    vals = ((2.0 * t1 * t2 + C1) * (2.0 * covar + C2)
            / ((t1 * t1 + t2 * t2 + C1).astype(np.float64) * (vars_ + C2)))
    return float(vals.mean())
