"""ctypes loader for the native encode kernels (auto-built on first use);
host-path analogues of the reference's encoder asm/intrinsics."""
import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "enckernel.cc")

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
        lib.vp8_inter_predict.restype = None
        lib.vp8_inter_predict.argtypes = [ctypes.c_void_p] + [ctypes.c_int]*3 + \
            [ctypes.c_void_p] + [ctypes.c_int]*6
        lib.vp8_diamond_search.restype = None
        lib.vp8_diamond_search.argtypes = [ctypes.c_void_p] + [ctypes.c_int]*3 + \
            [ctypes.c_void_p] + [ctypes.c_int]*11 + [ctypes.c_void_p]*2
        lib.vp8_sad.restype = ctypes.c_int
        lib.vp8_sad.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        lib.vp8_subtract_fdct.restype = None
        lib.vp8_subtract_fdct.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                          ctypes.c_void_p, ctypes.c_int,
                                          ctypes.c_void_p]
        lib.vp8_idct_add.restype = None
        lib.vp8_idct_add.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_int]
        lib.vp8_quantize.restype = None
        lib.vp8_quantize.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                     ctypes.c_int, ctypes.c_void_p]
        lib.vp8_bpred_search.restype = ctypes.c_int
        lib.vp8_bpred_search.argtypes = [ctypes.c_void_p] + [ctypes.c_int]*5 +             [ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p,
             ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p]
        lib.vp8_bpred_predict.restype = None
        lib.vp8_bpred_predict.argtypes = [ctypes.c_void_p] + [ctypes.c_int]*6 +             [ctypes.c_void_p]
        _lib = lib
        return True
    except Exception:
        _failed = True
        return False


def inter_predict_into(ref_plane, out, px, py, size, mv):
    h, w = ref_plane.shape
    _lib.vp8_inter_predict(ref_plane.ctypes.data, h, w,
                           ref_plane.strides[0], out.ctypes.data,
                           out.strides[0], px, py, size,
                           int(mv[0]), int(mv[1]))


def diamond_search(ref_y, orig16, r, c, mb_rows, mb_cols, base_mv, origin,
                   step, weight, mv_sad_cost):
    h, w = ref_y.shape
    out = np.zeros(3, np.int32)
    _lib.vp8_diamond_search(ref_y.ctypes.data, h, w, ref_y.strides[0],
                            orig16.ctypes.data, orig16.strides[0], r, c,
                            mb_rows, mb_cols, int(base_mv[0]),
                            int(base_mv[1]), int(origin[0]), int(origin[1]),
                            int(step), int(weight),
                            mv_sad_cost.ctypes.data, out.ctypes.data)
    return (int(out[0]), int(out[1])), int(out[2])


def subtract_fdct(block4, pred4):
    out = np.zeros(16, np.int16)
    _lib.vp8_subtract_fdct(block4.ctypes.data, block4.strides[0],
                           pred4.ctypes.data, pred4.strides[0],
                           out.ctypes.data)
    return out


def idct_add(coeffs16, target4x4):
    c = coeffs16 if coeffs16.dtype == np.int16 else coeffs16.astype(np.int16)
    if not c.flags.c_contiguous:
        c = np.ascontiguousarray(c)
    _lib.vp8_idct_add(c.ctypes.data, target4x4.ctypes.data,
                      target4x4.strides[0])


def quantize(coeffs16, dc, ac):
    c = np.ascontiguousarray(coeffs16, np.int16)
    out = np.zeros(16, np.int16)
    _lib.vp8_quantize(c.ctypes.data, int(dc), int(ac), out.ctypes.data)
    return out


def bpred_search(plane, col4, row4, orig4, mode_costs, rate_mult, dist_mult):
    """Best 4x4 intra mode + its prediction for one subblock."""
    h, w = plane.shape
    pred = np.zeros((4, 4), np.uint8)
    costs = np.ascontiguousarray(mode_costs, np.int64)
    mode = _lib.vp8_bpred_search(plane.ctypes.data, h, w, plane.strides[0],
                                 col4, row4, orig4.ctypes.data,
                                 orig4.strides[0], costs.ctypes.data,
                                 int(rate_mult), int(dist_mult),
                                 pred.ctypes.data)
    return mode, pred
