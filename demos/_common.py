"""Shared demo plumbing: data location with synthetic fallback, output dir.

The demos mirror the reference's test/*.cpp drivers (reference:
CMakeLists.txt:69-151, run.sh:1-12) but write PNGs into demos/output/
instead of opening GUI windows. Input imagery defaults to the read-only
reference mount; when absent, a deterministic synthetic textured pair is
generated so every demo still runs end to end.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

try:
    # Persistent compile cache: repeated demo runs skip the multi-minute
    # tunnel compiles (same setup as bench.py / scripts/*).
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

DATA_ROOT = os.environ.get("FTK_DATA", "/root/reference/example")
OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "output")


def out_path(name: str) -> str:
    os.makedirs(OUT_DIR, exist_ok=True)
    return os.path.join(OUT_DIR, name)


def _synthetic_texture(h, w, seed):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (h // 8 + 2, w // 8 + 2)).astype(np.float32)
    # Smooth upsample so gradients exist everywhere.
    from numpy import kron
    img = kron(base, np.ones((8, 8), np.float32))[:h, :w]
    k = np.ones(5, np.float32) / 5.0
    img = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, img)
    img = np.apply_along_axis(lambda c: np.convolve(c, k, "same"), 0, img)
    return img


def load_optical_flow_pair():
    """The 752x480 gray pair used by 6 of the 7 reference demos
    (reference: test_optical_flow.cpp:31-32); synthetic fallback."""
    from feature_tracker_tpu.utils.viz import load_gray_image
    ref_p = os.path.join(DATA_ROOT, "optical_flow", "ref_image.png")
    cur_p = os.path.join(DATA_ROOT, "optical_flow", "cur_image.png")
    if os.path.exists(ref_p) and os.path.exists(cur_p):
        return load_gray_image(ref_p), load_gray_image(cur_p), "reference"
    ref = _synthetic_texture(480, 752, 0)
    shift_r, shift_c = 5, -3
    cur = np.roll(np.roll(ref, shift_r, axis=0), shift_c, axis=1)
    return ref, cur, "synthetic"


def load_direct_method_set():
    """KITTI-style left + disparity + 5 current frames
    (reference: test_direct_method.cpp:21-26); synthetic fallback."""
    from feature_tracker_tpu.utils.viz import load_gray_image
    root = os.path.join(DATA_ROOT, "direct_method")
    names = [f"{i:06d}.png" for i in range(1, 6)]
    paths = ([os.path.join(root, "left.png"),
              os.path.join(root, "disparity.png")]
             + [os.path.join(root, n) for n in names])
    if all(os.path.exists(p) for p in paths):
        imgs = [load_gray_image(p) for p in paths]
        return imgs[0], imgs[1], imgs[2:], "reference"
    left = _synthetic_texture(376, 1240, 1)
    disparity = np.full_like(left, 64.0)
    curs = [np.roll(left, 2 * (i + 1), axis=1) for i in range(5)]
    return left, disparity, curs, "synthetic"
