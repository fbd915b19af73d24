"""ctypes loader for the native loop-filter kernel (auto-built on first
use); the host-path analogue of the reference's loopfilter asm."""
import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "lfkernel.cc")

_lib = None
_failed = False


def available():
    global _lib, _failed
    if _failed:
        return False
    if _lib is not None:
        return True
    try:
        from alfalfa_tpu.native._build import load_library
        lib = load_library(_SRC)
        lib.vp8_loopfilter_frame.restype = None
        lib.vp8_loopfilter_frame.argtypes = [ctypes.c_void_p] * 3 + \
            [ctypes.c_int] * 4 + [ctypes.c_void_p] * 6
        lib.vp8_ssim.restype = ctypes.c_double
        lib.vp8_ssim.argtypes = [ctypes.c_void_p] * 2 + [ctypes.c_int] * 4
        _lib = lib
        return True
    except Exception:
        _failed = True
        return False


def loopfilter_frame(y, u, v, level, interior, mb_limit, sb_limit, hev,
                     skip_sb):
    """Filter padded planes in place. level<=0 skips the MB."""
    lib = _lib
    R, C = level.shape
    yc = np.ascontiguousarray(y)
    uc = np.ascontiguousarray(u)
    vc = np.ascontiguousarray(v)
    # keep converted arrays alive across the call (.ctypes.data alone
    # would let the temporaries be collected mid-call)
    params = [np.ascontiguousarray(a, np.int16)
              for a in (level, interior, mb_limit, sb_limit, hev)]
    params.append(np.ascontiguousarray(skip_sb, np.uint8))
    lib.vp8_loopfilter_frame(
        yc.ctypes.data, uc.ctypes.data, vc.ctypes.data,
        yc.shape[1], uc.shape[1], R, C,
        *[p.ctypes.data for p in params])
    if yc is not y:
        y[:] = yc
    if uc is not u:
        u[:] = uc
    if vc is not v:
        v[:] = vc


def ssim(a, b):
    """Native x264-window SSIM; a/b (H, W) uint8, C-contiguous or not."""
    ac = np.ascontiguousarray(a, np.uint8)
    bc = np.ascontiguousarray(b, np.uint8)
    h, w = ac.shape
    return float(_lib.vp8_ssim(ac.ctypes.data, bc.ctypes.data,
                               ac.strides[0], bc.strides[0], w, h))
