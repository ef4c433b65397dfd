"""Window-slice patch extraction — the TPU-fast formulation.

TPUs execute scalar gathers poorly; the KLT patch operations never need
them because every sample in a patch shares one integer anchor and one set
of bilinear weights (reference: optical_flow.cpp:49-66). Each feature's
work therefore reduces to ONE contiguous window slice per image per
iteration:

  - pad the image once per level (zeros; values under the padding are
    always masked by analytically-computed validity),
  - per feature, ``lax.dynamic_slice`` a (window x window) block at the
    clipped integer anchor — under vmap this lowers to a single gather of
    N contiguous blocks, which the TPU memory system handles well,
  - the 4 bilinear taps are 4 shifted sub-views of the block; central
    differences are further shifted sub-views.

This replaces tens of millions of scalar gathers per track() call with a
few dozen block gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pad_image(img, pad: int):
    """Zero-pad an image for clip-free window slicing."""
    return jnp.pad(img, pad)


def slice_window(padded, pad: int, anchor_r, anchor_c, window: int):
    """Slice a (window, window) block at integer anchor (in unpadded
    coordinates). The anchor is clipped into the padded array; validity of
    out-of-image pixels must be handled by the caller's analytic mask."""
    hp, wp = padded.shape
    r = jnp.clip(anchor_r + pad, 0, hp - window)
    c = jnp.clip(anchor_c + pad, 0, wp - window)
    return jax.lax.dynamic_slice(padded, (r, c), (window, window))


def bilinear_taps(block, rows: int, cols: int):
    """The 4 bilinear tap views of a (rows+1, cols+1)-or-larger block."""
    tl = block[:rows, :cols]
    tr = block[:rows, 1:cols + 1]
    bl = block[1:rows + 1, :cols]
    br = block[1:rows + 1, 1:cols + 1]
    return tl, tr, bl, br


def const_weights(uv):
    """Integer anchor parts and the 4 constant bilinear weights of uv."""
    x, y = uv[0], uv[1]
    r0 = jnp.floor(y)
    c0 = jnp.floor(x)
    fr = y - r0
    fc = x - c0
    w = ((1.0 - fr) * (1.0 - fc), (1.0 - fr) * fc, fr * (1.0 - fc), fr * fc)
    return r0.astype(jnp.int32), c0.astype(jnp.int32), w


def tap_validity(img_shape, min_r, min_c, rows: int, cols: int):
    """Validity of each integer tap position: anchor within [0, dim-2]
    (the reference's bound, optical_flow.cpp:68,73)."""
    h, w = img_shape
    rr = min_r + jnp.arange(rows, dtype=jnp.int32)[:, None]
    cc = min_c + jnp.arange(cols, dtype=jnp.int32)[None, :]
    return (rr >= 0) & (rr <= h - 2) & (cc >= 0) & (cc <= w - 2)


def extract_patch_window(padded, pad: int, img_shape, uv, rows: int,
                         cols: int):
    """Const-weight patch via one window slice.

    Equivalent to ops.interp.extract_const_weight_patch but gather-free.
    Returns (patch [rows, cols], valid [rows, cols])."""
    r0, c0, (w_tl, w_tr, w_bl, w_br) = const_weights(uv)
    min_r = r0 - rows // 2
    min_c = c0 - cols // 2
    block = slice_window(padded, pad, min_r, min_c, rows + 1)
    tl, tr, bl, br = bilinear_taps(block, rows, cols)
    patch = w_tl * tl + w_tr * tr + w_bl * bl + w_br * br
    valid = tap_validity(img_shape, min_r, min_c, rows, cols)
    return jnp.where(valid, patch, 0.0), valid
