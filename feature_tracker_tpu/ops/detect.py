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


def _chaotic_greedy(valid, higher_f):
    """Chaotic iteration of the greedy recurrence: a candidate is DECIDED
    once every higher-ranked conflicting candidate is decided, so whole
    independent groups resolve per round (exact — only final inputs are
    ever committed). Rounds = depth of the suppression chains."""

    def round_(state):
        decided, keep = state
        # One fused 2-column matmul: column 0 counts kept higher
        # conflicts (blocked), column 1 counts undecided ones (ready).
        rhs = jnp.stack([jnp.where(keep, 1.0, 0.0),
                         jnp.where(decided, 0.0, 1.0)], axis=-1)
        counts = higher_f @ rhs
        blocked = counts[:, 0] > 0.0
        ready = counts[:, 1] == 0.0
        new_keep = jnp.where(decided, keep, valid & ~blocked & ready)
        return decided | ready, new_keep

    k = valid.shape[0]
    state = (jnp.zeros((k,), bool), jnp.zeros((k,), bool))
    _, keep = jax.lax.while_loop(lambda s: ~jnp.all(s[0]), round_, state)
    return keep


def greedy_suppression(valid, conflict, chunk: int = 512):
    """Exact greedy radius suppression in rank order, parallelized.

    Equivalent to the sequential scan ``keep[i] = valid[i] and no kept
    j < i conflicts with i``. Candidates are processed in score-ordered
    chunks: suppression from already-decided chunks is one masked matvec,
    and each chunk resolves internally by chaotic iteration
    (_chaotic_greedy) — bounding the memory traffic to chunk-sized
    matrices instead of K x K per round (dense corner fields need O(100)
    rounds, which made the unchunked version HBM-bound).

    Args:
      valid: ``[K]`` bool, candidates in descending score order.
      conflict: ``[K, K]`` bool symmetric conflict matrix (self included).
    """
    k = valid.shape[0]
    chunk = min(chunk, k)
    keep = jnp.zeros((k,), bool)
    for c0 in range(0, k, chunk):
        c1 = min(c0 + chunk, k)
        block = conflict[c0:c1]
        sub_valid = valid[c0:c1]
        if c0 > 0:
            prev = block[:, :c0].astype(jnp.float32)
            sub_valid = sub_valid & (
                prev @ jnp.where(keep[:c0], 1.0, 0.0) == 0.0)
        n = c1 - c0
        tri = (jnp.arange(n)[None, :] < jnp.arange(n)[:, None])
        higher = (block[:, c0:c1] & tri).astype(jnp.float32)
        keep = keep.at[c0:c1].set(_chaotic_greedy(sub_valid, higher))
    return keep


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
    keep = greedy_suppression(valid, conflict)

    # Compact the first max_num kept candidates (they are already in score
    # order). Rank via cumulative sum; scatter into the output slots.
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    take_slot = jnp.where(keep & (rank < max_num), rank, max_num)
    out_x = jnp.full((max_num + 1,), -1.0).at[take_slot].set(cx, mode="drop")
    out_y = jnp.full((max_num + 1,), -1.0).at[take_slot].set(cy, mode="drop")
    num = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), max_num)
    uv = jnp.stack([out_x[:max_num], out_y[:max_num]], axis=-1)
    return uv, num
