"""Bilinear image sampling primitives.

These replace the reference's GrayImage::GetPixelValue / patch-extraction
loops (reference: src/optical_flow_tracker/optical_flow.cpp:49-102) with
batched gathers. A position is valid when its floor anchor lies in
``[0, H-2] x [0, W-2]`` — the reference treats the valid range as
``rows()-2`` / ``cols()-2`` because of the +1 bilinear taps
(reference: optical_flow.cpp:68,73). Invalid taps read 0 and are masked.

Coordinates are ``(x, y) = (col, row)``.
"""

from __future__ import annotations

import jax.numpy as jnp


def _gather4(img, ri, ci):
    """Gather the 2x2 bilinear neighborhood at integer anchor (ri, ci).

    ri/ci may be any broadcastable integer shapes; they are clipped so the
    gather stays in range (callers mask with their own validity)."""
    h, w = img.shape
    rc = jnp.clip(ri, 0, h - 2)
    cc = jnp.clip(ci, 0, w - 2)
    tl = img[rc, cc]
    tr = img[rc, cc + 1]
    bl = img[rc + 1, cc]
    br = img[rc + 1, cc + 1]
    return tl, tr, bl, br


def _tap_valid(img, ri, ci):
    h, w = img.shape
    return (ri >= 0) & (ri <= h - 2) & (ci >= 0) & (ci <= w - 2)


def bilinear_sample(img, pos_xy):
    """Bounds-checked bilinear sample (GetPixelValue equivalent).

    Args:
      img: ``[H, W]`` float image.
      pos_xy: ``[..., 2]`` float positions (x=col, y=row).

    Returns:
      (value ``[...]``, valid ``[...]`` bool). Invalid positions read 0.
    """
    x = pos_xy[..., 0]
    y = pos_xy[..., 1]
    r0 = jnp.floor(y)
    c0 = jnp.floor(x)
    fr = y - r0
    fc = x - c0
    ri = r0.astype(jnp.int32)
    ci = c0.astype(jnp.int32)
    valid = _tap_valid(img, ri, ci)
    tl, tr, bl, br = _gather4(img, ri, ci)
    val = ((1.0 - fr) * (1.0 - fc) * tl
           + (1.0 - fr) * fc * tr
           + fr * (1.0 - fc) * bl
           + fr * fc * br)
    return jnp.where(valid, val, 0.0), valid


def extract_const_weight_patch(img, uv, rows: int, cols: int):
    """Integer-grid patch around ``uv`` with constant bilinear weights.

    The patch is anchored at ``floor(uv) - (rows//2, cols//2)`` and every
    pixel uses the same 4 bilinear weights derived from uv's fractional
    part — the patch is rigidly offset from the feature point, so the
    weights are computed once (reference: optical_flow.cpp:49-102 for the
    extended reference patch; basic_klt_fast.cpp:101-195 uses the same
    anchoring for the current patch).

    Args:
      img: ``[H, W]`` float image.
      uv: ``[2]`` float (x, y).
      rows, cols: static patch size.

    Returns:
      (patch ``[rows, cols]``, valid ``[rows, cols]`` bool).
    """
    x, y = uv[0], uv[1]
    r0 = jnp.floor(y)
    c0 = jnp.floor(x)
    fr = y - r0
    fc = x - c0
    w_tl = (1.0 - fr) * (1.0 - fc)
    w_tr = (1.0 - fr) * fc
    w_bl = fr * (1.0 - fc)
    w_br = fr * fc

    min_r = r0.astype(jnp.int32) - rows // 2
    min_c = c0.astype(jnp.int32) - cols // 2
    rr = min_r + jnp.arange(rows, dtype=jnp.int32)[:, None]
    cc = min_c + jnp.arange(cols, dtype=jnp.int32)[None, :]
    valid = _tap_valid(img, rr, cc)
    tl, tr, bl, br = _gather4(img, rr, cc)
    patch = w_tl * tl + w_tr * tr + w_bl * bl + w_br * br
    return jnp.where(valid, patch, 0.0), valid


def inner_gradients(ex_patch, ex_valid):
    """Central-difference gradients on the inner region of an extended patch.

    ``dx = right - left``, ``dy = bottom - top`` — the reference keeps the
    un-halved differences and compensates nowhere; both H and b scale
    consistently so the GN step is simply half-sized
    (reference: basic_klt_fast.cpp:64-99). Gradients are zeroed wherever any
    of the 4 neighbor taps is invalid, which also zeroes that pixel's H/b
    contribution.

    Args:
      ex_patch: ``[R+2, C+2]``.
      ex_valid: ``[R+2, C+2]`` bool.

    Returns:
      (dx ``[R, C]``, dy ``[R, C]``).
    """
    left = ex_patch[1:-1, :-2]
    right = ex_patch[1:-1, 2:]
    top = ex_patch[:-2, 1:-1]
    bottom = ex_patch[2:, 1:-1]
    gvalid = (ex_valid[1:-1, :-2] & ex_valid[1:-1, 2:]
              & ex_valid[:-2, 1:-1] & ex_valid[2:, 1:-1])
    dx = jnp.where(gvalid, right - left, 0.0)
    dy = jnp.where(gvalid, bottom - top, 0.0)
    return dx, dy
