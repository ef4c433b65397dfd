"""ctypes wrapper for the single-thread CPU fast-KLT baseline
(native/klt_cpu_baseline.cpp).

Two jobs:
 - the *measured* Eigen-class CPU baseline for bench.py's ``vs_baseline``
   (the reference publishes no numbers; its demo prints TickTock ms at
   runtime only — BASELINE.md),
 - the float32 ground truth for exact-count parity fixtures: the C++ loop
   implements the identical break/status semantics as the jnp/Pallas
   paths, so tracked counts and endpoints must agree to float tolerance.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libftk_klt_baseline.so")

_lock = threading.Lock()
_lib = None


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO_PATH):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR],
                               check=True, capture_output=True, timeout=120)
            except Exception:
                return None
        if not os.path.exists(_SO_PATH):
            return None
        lib = ctypes.CDLL(_SO_PATH)
        pf = ctypes.POINTER(ctypes.c_float)
        common = [
            ctypes.POINTER(pf), ctypes.POINTER(pf),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
            pf, pf, ctypes.POINTER(ctypes.c_int8),
            ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float,
        ]
        lib.ftk_klt_fast_pyramid.restype = ctypes.c_int
        lib.ftk_klt_fast_pyramid.argtypes = common
        lib.ftk_klt_affine_fast_pyramid.restype = ctypes.c_int
        lib.ftk_klt_affine_fast_pyramid.argtypes = common
        lib.ftk_klt_lssd_fast_pyramid.restype = ctypes.c_int
        lib.ftk_klt_lssd_fast_pyramid.argtypes = common + [ctypes.c_int]
        lib.ftk_direct_method_pyramid.restype = ctypes.c_int
        lib.ftk_direct_method_pyramid.argtypes = [
            ctypes.POINTER(pf), ctypes.POINTER(pf),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
            pf, pf, pf, pf, pf, pf,
            ctypes.POINTER(ctypes.c_int8),
            ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float,
        ]
        lib.ftk_farneback_pyramid.restype = ctypes.c_int
        lib.ftk_farneback_pyramid.argtypes = [
            ctypes.POINTER(pf), ctypes.POINTER(pf),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float,
            pf, pf,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _run_fast(fn_name, ref_pyramid, cur_pyramid, ref_uv, cur_uv, status,
              opts, extra=()):
    from feature_tracker_tpu.core.config import KltOptions

    opts = opts or KltOptions()
    lib = _load()
    if lib is None:
        raise RuntimeError("libftk_klt_baseline.so unavailable")

    levels = len(ref_pyramid)
    refs = [np.ascontiguousarray(np.asarray(im), np.float32)
            for im in ref_pyramid]
    curs = [np.ascontiguousarray(np.asarray(im), np.float32)
            for im in cur_pyramid]
    ref_uv = np.ascontiguousarray(np.asarray(ref_uv), np.float32)
    n = ref_uv.shape[0]
    out_uv = (np.array(cur_uv, np.float32, copy=True)
              if cur_uv is not None and np.shape(cur_uv) == (n, 2)
              else ref_uv.copy())
    out_st = (np.array(status, np.int8, copy=True)
              if status is not None and np.shape(status) == (n,)
              else np.zeros(n, np.int8))

    pf = ctypes.POINTER(ctypes.c_float)
    ref_ptrs = (pf * levels)(*[im.ctypes.data_as(pf) for im in refs])
    cur_ptrs = (pf * levels)(*[im.ctypes.data_as(pf) for im in curs])
    hs = (ctypes.c_int * levels)(*[im.shape[0] for im in refs])
    ws = (ctypes.c_int * levels)(*[im.shape[1] for im in refs])

    rc = getattr(lib, fn_name)(
        ref_ptrs, cur_ptrs, hs, ws, levels,
        ref_uv.ctypes.data_as(pf), out_uv.ctypes.data_as(pf),
        out_st.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        n, opts.max_track_points,
        opts.patch_row_half_size, opts.patch_col_half_size,
        opts.max_iterations, opts.max_tolerance_large_step,
        opts.max_converge_step, *extra)
    if rc != 0:
        raise ValueError(
            f"{fn_name}: unsupported config (patch side > 62, "
            f"levels outside 1..16) — rc={rc}")
    return out_uv, out_st


def klt_fast_cpu(ref_pyramid, cur_pyramid, ref_uv, cur_uv=None, status=None,
                 opts=None):
    """Single-thread CPU fast-KLT over a pyramid (level 0 = finest).

    Mirrors BasicKlt.track's contract: (cur_uv [N,2] f32, status [N] i8).
    """
    return _run_fast("ftk_klt_fast_pyramid", ref_pyramid, cur_pyramid,
                     ref_uv, cur_uv, status, opts)


def klt_affine_fast_cpu(ref_pyramid, cur_pyramid, ref_uv, cur_uv=None,
                        status=None, opts=None):
    """Affine-warp fast-KLT ground truth (mirrors AffineKlt.track)."""
    return _run_fast("ftk_klt_affine_fast_pyramid", ref_pyramid,
                     cur_pyramid, ref_uv, cur_uv, status, opts)


def klt_lssd_fast_cpu(ref_pyramid, cur_pyramid, ref_uv, cur_uv=None,
                      status=None, opts=None, luminance=False):
    """SE(2)/LSSD fast-KLT ground truth (mirrors LssdKlt.track)."""
    return _run_fast("ftk_klt_lssd_fast_pyramid", ref_pyramid, cur_pyramid,
                     ref_uv, cur_uv, status, opts,
                     extra=(int(luminance),))


def direct_method_cpu(ref_pyramid, cur_pyramid, k4, p_c_in_ref, ref_uv,
                      q_rc=None, p_rc=None, opts=None):
    """Direct-method (DIRECT mode) pose ground truth; mirrors
    DirectMethod.track's contract: (cur_uv, q_rc, p_rc, status)."""
    from feature_tracker_tpu.trackers.direct import DirectMethodOptions

    opts = opts or DirectMethodOptions()
    lib = _load()
    if lib is None:
        raise RuntimeError("libftk_klt_baseline.so unavailable")

    levels = len(ref_pyramid)
    refs = [np.ascontiguousarray(np.asarray(im), np.float32)
            for im in ref_pyramid]
    curs = [np.ascontiguousarray(np.asarray(im), np.float32)
            for im in cur_pyramid]
    ref_uv = np.ascontiguousarray(np.asarray(ref_uv), np.float32)
    p_ref = np.ascontiguousarray(np.asarray(p_c_in_ref), np.float32)
    k4 = np.ascontiguousarray(np.asarray(k4), np.float32)
    n = ref_uv.shape[0]
    out_uv = ref_uv.copy()
    q = np.ascontiguousarray(
        np.asarray(q_rc if q_rc is not None else [1, 0, 0, 0]),
        np.float32)
    p = np.ascontiguousarray(
        np.asarray(p_rc if p_rc is not None else [0, 0, 0]), np.float32)
    st = np.zeros(n, np.int8)

    pf = ctypes.POINTER(ctypes.c_float)
    ref_ptrs = (pf * levels)(*[im.ctypes.data_as(pf) for im in refs])
    cur_ptrs = (pf * levels)(*[im.ctypes.data_as(pf) for im in curs])
    hs = (ctypes.c_int * levels)(*[im.shape[0] for im in refs])
    ws = (ctypes.c_int * levels)(*[im.shape[1] for im in refs])
    rc = lib.ftk_direct_method_pyramid(
        ref_ptrs, cur_ptrs, hs, ws, levels,
        k4.ctypes.data_as(pf), p_ref.ctypes.data_as(pf),
        ref_uv.ctypes.data_as(pf), out_uv.ctypes.data_as(pf),
        q.ctypes.data_as(pf), p.ctypes.data_as(pf),
        st.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        n, opts.max_track_points,
        opts.patch_row_half_size, opts.patch_col_half_size,
        opts.max_iterations, opts.max_converge_step)
    if rc != 0:
        raise ValueError(
            "ftk_direct_method_pyramid: unsupported config (patch side "
            f"> 64, n > 4096, levels outside 1..16) — rc={rc}")
    return out_uv, q, p, st


def farneback_cpu(ref_pyramid, cur_pyramid, opts=None):
    """Single-thread CPU dense Farneback flow over a pyramid (level 0 =
    finest). Mirrors DenseOpticalFlow.track's contract: flow [2, H, W]
    (channel 0 = row flow, 1 = col flow)."""
    from feature_tracker_tpu.trackers.dense import DenseFlowOptions

    opts = opts or DenseFlowOptions()
    lib = _load()
    if lib is None:
        raise RuntimeError("libftk_klt_baseline.so unavailable")

    levels = len(ref_pyramid)
    refs = [np.ascontiguousarray(np.asarray(im), np.float32)
            for im in ref_pyramid]
    curs = [np.ascontiguousarray(np.asarray(im), np.float32)
            for im in cur_pyramid]
    h, w = refs[0].shape
    out_r = np.zeros((h, w), np.float32)
    out_c = np.zeros((h, w), np.float32)

    pf = ctypes.POINTER(ctypes.c_float)
    ref_ptrs = (pf * levels)(*[im.ctypes.data_as(pf) for im in refs])
    cur_ptrs = (pf * levels)(*[im.ctypes.data_as(pf) for im in curs])
    hs = (ctypes.c_int * levels)(*[im.shape[0] for im in refs])
    ws = (ctypes.c_int * levels)(*[im.shape[1] for im in refs])
    rc = lib.ftk_farneback_pyramid(
        ref_ptrs, cur_ptrs, hs, ws, levels,
        opts.half_patch_size, opts.max_iterations,
        opts.max_converge_step, opts.max_delta_flow_step,
        out_r.ctypes.data_as(pf), out_c.ctypes.data_as(pf))
    if rc != 0:
        raise ValueError(
            f"ftk_farneback_pyramid: unsupported config — rc={rc}")
    return np.stack([out_r, out_c])
