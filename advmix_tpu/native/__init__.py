"""Native (C++) host kernels, loaded via ctypes.

Counterpart of the reference's compiled NMS stack (`lib/nms/setup_linux.py`
+ `lib/Makefile` build of cpu_nms/gpu_nms). The shared library is built
on first import with g++ (cached next to the source); every entry point has
a pure-numpy fallback in advmix_tpu/ops/nms.py, so the package works even
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "nms.cpp")
_SO = os.path.join(_HERE, "libadvmix_nms.so")

_lib = None
_load_error = None


def _build() -> str:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-std=c++17", _SRC, "-o", _SO,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.bbox_nms.restype = ctypes.c_int
        lib.oks_nms.restype = ctypes.c_int
        lib.soft_oks_nms.restype = ctypes.c_int
        lib.greedy_from_matrix.restype = ctypes.c_int
        lib.glass_compose.restype = None
        _lib = lib
    except Exception as e:  # no toolchain / load failure -> numpy fallback
        _load_error = e
    return _lib


def _ptr(arr, dtype):
    a = np.ascontiguousarray(arr, dtype=dtype)
    return a, a.ctypes.data_as(ctypes.POINTER(
        ctypes.c_float if dtype == np.float32 else
        ctypes.c_double if dtype == np.float64 else ctypes.c_int
    ))


def bbox_nms(dets: np.ndarray, thresh: float):
    lib = get_lib()
    if lib is None:
        from ..ops.nms import bbox_nms_np

        return bbox_nms_np(np.asarray(dets), thresh)
    dets = np.ascontiguousarray(dets, np.float32)
    n = dets.shape[0]
    keep = np.zeros(max(n, 1), np.int32)
    cnt = lib.bbox_nms(
        dets.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(n),
        ctypes.c_float(thresh),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return keep[:cnt].tolist()


def oks_nms(kpts: np.ndarray, scores: np.ndarray, areas: np.ndarray,
            thresh: float, sigmas=None):
    from ..ops.nms import COCO_SIGMAS, oks_nms_np

    lib = get_lib()
    if lib is None:
        return oks_nms_np(kpts, scores, areas, thresh, sigmas)
    if sigmas is None:
        sigmas = COCO_SIGMAS
    kpts = np.ascontiguousarray(kpts, np.float64)
    n = kpts.shape[0]
    j = kpts.shape[1] // 3
    keep = np.zeros(max(n, 1), np.int32)
    cnt = lib.oks_nms(
        kpts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        np.ascontiguousarray(scores, np.float64).ctypes.data_as(
            ctypes.POINTER(ctypes.c_double)),
        np.ascontiguousarray(areas, np.float64).ctypes.data_as(
            ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int(n), ctypes.c_int(j), ctypes.c_double(thresh),
        np.ascontiguousarray(sigmas, np.float64).ctypes.data_as(
            ctypes.POINTER(ctypes.c_double)),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return keep[:cnt].tolist()


def soft_oks_nms(kpts: np.ndarray, scores: np.ndarray, areas: np.ndarray,
                 thresh: float, sigmas=None, max_dets: int = 20):
    from ..ops.nms import COCO_SIGMAS, soft_oks_nms_np

    lib = get_lib()
    if lib is None:
        return soft_oks_nms_np(kpts, scores, areas, thresh, sigmas,
                               max_dets=max_dets)
    if sigmas is None:
        sigmas = COCO_SIGMAS
    kpts = np.ascontiguousarray(kpts, np.float64)
    n = kpts.shape[0]
    j = kpts.shape[1] // 3
    keep = np.zeros(max(n, max_dets, 1), np.int32)
    cnt = lib.soft_oks_nms(
        kpts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        np.ascontiguousarray(scores, np.float64).ctypes.data_as(
            ctypes.POINTER(ctypes.c_double)),
        np.ascontiguousarray(areas, np.float64).ctypes.data_as(
            ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int(n), ctypes.c_int(j), ctypes.c_double(thresh),
        np.ascontiguousarray(sigmas, np.float64).ctypes.data_as(
            ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int(max_dets),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return keep[:cnt].tolist()


def greedy_from_matrix(sim: np.ndarray, scores: np.ndarray, thresh: float):
    """Greedy scan over a precomputed (device-generated) similarity matrix."""
    lib = get_lib()
    n = sim.shape[0]
    if lib is None:
        keep = []
        suppressed = np.zeros(n, bool)
        order = np.argsort(-scores, kind="stable")
        for i in order:
            if suppressed[i]:
                continue
            keep.append(int(i))
            suppressed |= sim[i] > thresh
            suppressed[i] = True
        return keep
    sim = np.ascontiguousarray(sim, np.float32)
    keep = np.zeros(max(n, 1), np.int32)
    cnt = lib.greedy_from_matrix(
        sim.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        np.ascontiguousarray(scores, np.float32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(n), ctypes.c_float(thresh),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return keep[:cnt].tolist()


def glass_compose(h: int, w: int, max_delta: int, iters: int,
                  deltas: np.ndarray) -> np.ndarray:
    """Compose glass_blur's sequential interior pixel swaps into one
    source-index permutation (int32 (h*w,)). deltas: int32 (n_swaps, 2)
    (dx, dy) in draw order, n_swaps = iters * interior_h * interior_w."""
    deltas = np.ascontiguousarray(deltas, np.int32)
    n_h = len(range(h - max_delta, max_delta, -1))
    n_w = len(range(w - max_delta, max_delta, -1))
    expected = iters * n_h * n_w
    if deltas.shape != (expected, 2):
        raise ValueError(
            f"deltas shape {deltas.shape} != ({expected}, 2) for "
            f"h={h} w={w} max_delta={max_delta} iters={iters}")
    src = np.arange(h * w, dtype=np.int32)
    lib = get_lib()
    if lib is not None:
        lib.glass_compose(
            ctypes.c_int(h), ctypes.c_int(w),
            ctypes.c_int(max_delta), ctypes.c_int(iters),
            deltas.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        return src
    # pure-python fallback (same loop; fine for test-sized images)
    t = 0
    for _ in range(iters):
        for hh in range(h - max_delta, max_delta, -1):
            base = hh * w
            for ww in range(w - max_delta, max_delta, -1):
                dx = deltas[t, 0]
                dy = deltas[t, 1]
                t += 1
                p = base + ww
                q = (hh + dy) * w + (ww + dx)
                src[p], src[q] = src[q], src[p]
    return src
