"""Shi-Tomasi / Harris corner detection, fully on-device.

TPU-native stand-in for the sibling-repo FeaturePointHarrisDetector the
reference demos use (reference: test/test_optical_flow.cpp:34-39):
``DetectGoodFeatures(image, max_n, pixel_uv)`` with a minimum response and a
minimum inter-feature distance.

Pipeline (all jittable, static output size):
  1. central-difference gradients, structure tensor box-filtered over a
     (2w+1)^2 window (mean, not sum),
  2. Shi-Tomasi response = min eigenvalue of the structure tensor,
  3. 3x3 local-max NMS + response threshold,
  4. top-K candidates by response,
  5. greedy radius suppression in score order (sequential over K on device —
     K is small, this is exact, deterministic NMS rather than grid-cell
     approximation).

Returns fixed-size arrays plus a count, since jit requires static shapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from feature_tracker_tpu.core.config import HarrisOptions


def _box_filter(a, half: int):
    k = 2 * half + 1
    win = jax.lax.reduce_window(
        a, 0.0, jax.lax.add,
        window_dimensions=(k, k), window_strides=(1, 1), padding="SAME")
    return win / float(k * k)


def shi_tomasi_response(img, window_half_size: int = 1):
    """Min-eigenvalue corner response map ``[H, W]``."""
    dx = jnp.zeros_like(img)
    dy = jnp.zeros_like(img)
    dx = dx.at[:, 1:-1].set(0.5 * (img[:, 2:] - img[:, :-2]))
    dy = dy.at[1:-1, :].set(0.5 * (img[2:, :] - img[:-2, :]))
    ixx = _box_filter(dx * dx, window_half_size)
    iyy = _box_filter(dy * dy, window_half_size)
    ixy = _box_filter(dx * dy, window_half_size)
    tr = ixx + iyy
    d = jnp.sqrt((ixx - iyy) ** 2 + 4.0 * ixy * ixy)
    return 0.5 * (tr - d)


@partial(jax.jit, static_argnames=("max_num", "opts"))
def detect_good_features(img, max_num: int, opts: HarrisOptions = HarrisOptions()):
    """Detect up to ``max_num`` corners with min-distance suppression.

    Args:
      img: ``[H, W]`` float image (0..255 gray values).
      max_num: static maximum number of returned features.
      opts: detection options.

    Returns:
      (uv ``[max_num, 2]`` float (x, y); padded entries are (-1, -1),
       num: int32 count of valid features).
    """
    h, w = img.shape
    resp = shi_tomasi_response(img, opts.window_half_size)

    # Exclude a border so every detected feature has full bilinear support.
    border = opts.window_half_size + 2
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    in_border = ((rows >= border) & (rows < h - border)
                 & (cols >= border) & (cols < w - border))

    # 3x3 local maxima.
    local_max = jax.lax.reduce_window(
        resp, -jnp.inf, jax.lax.max,
        window_dimensions=(3, 3), window_strides=(1, 1), padding="SAME")
    cand = (resp >= local_max) & (resp > opts.min_valid_response) & in_border
    scores = jnp.where(cand, resp, -jnp.inf)

    k = min(opts.max_candidates, h * w)
    top_scores, flat_idx = jax.lax.top_k(scores.reshape(-1), k)
    cy = (flat_idx // w).astype(jnp.float32)
    cx = (flat_idx % w).astype(jnp.float32)
    valid = top_scores > -jnp.inf

    # Greedy min-distance suppression in descending score order.
    d2 = ((cx[:, None] - cx[None, :]) ** 2 + (cy[:, None] - cy[None, :]) ** 2)
    min_d2 = float(opts.min_feature_distance) ** 2
    conflict = d2 < min_d2  # includes self

    def body(i, keep):
        earlier_kept = keep & (jnp.arange(k) < i)
        suppressed = jnp.any(earlier_kept & conflict[i])
        return keep.at[i].set(valid[i] & ~suppressed)

    keep = jax.lax.fori_loop(0, k, body, jnp.zeros((k,), dtype=bool))

    # Compact the first max_num kept candidates (they are already in score
    # order). Rank via cumulative sum; scatter into the output slots.
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    take_slot = jnp.where(keep & (rank < max_num), rank, max_num)
    out_x = jnp.full((max_num + 1,), -1.0).at[take_slot].set(cx, mode="drop")
    out_y = jnp.full((max_num + 1,), -1.0).at[take_slot].set(cy, mode="drop")
    num = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), max_num)
    uv = jnp.stack([out_x[:max_num], out_y[:max_num]], axis=-1)
    return uv, num
