"""Image pyramid construction.

TPU-native stand-in for the sibling-repo ImagePyramid the reference consumes
(reference: test/test_optical_flow.cpp:49-71): half resolution per level via
2x2 averaging. ``quantize=True`` truncates each level to integers to match
the uint8 arithmetic of the reference pyramid buffers."""

from __future__ import annotations

import warnings
from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("levels", "quantize"))
def _build(img, levels: int, quantize: bool):
    pyr = [jnp.floor(img) if quantize else img]
    for _ in range(levels - 1):
        a = pyr[-1]
        h2 = (a.shape[0] // 2) * 2
        w2 = (a.shape[1] // 2) * 2
        down = (a[0:h2:2, 0:w2:2] + a[1:h2:2, 0:w2:2]
                + a[0:h2:2, 1:w2:2] + a[1:h2:2, 1:w2:2]) * 0.25
        if quantize:
            down = jnp.floor(down)
        pyr.append(down)
    return tuple(pyr)


def build_pyramid(img, levels: int, quantize: bool = True):
    """Build a half-resolution-per-level pyramid.

    Args:
      img: ``[H, W]`` float image (level 0), expected in GRAY-VALUE range
        (uint8-derived, [0, 255]) when ``quantize=True``.
      levels: total number of levels (level 0 included).
      quantize: truncate downsampled levels to integer gray values.

    Returns:
      Tuple of ``levels`` arrays, finest first.

    With ``quantize=True`` level 0 is floor-truncated too: the reference's
    level 0 is the raw uint8 buffer (integer-valued by construction), so
    this is a no-op for uint8-derived float input while enforcing the
    integer invariant the compiled Pallas samplers rely on
    (KltOptions.integer_pyramid) for arbitrary float input. Normalized
    [0, 1] imagery is DESTROYED by that floor (every pixel becomes 0 or
    1) — pass ``quantize=False`` (and track with
    ``KltOptions(integer_pyramid=False)``) for non-integer imagery. When
    the input is a concrete array whose value range suggests normalized
    floats, a warning points there (tracers inside an outer jit skip the
    check).
    """
    if quantize and not isinstance(img, jax.core.Tracer):
        arr = jnp.asarray(img)
        if jnp.issubdtype(arr.dtype, jnp.floating) and arr.size:
            mx = float(arr.max())
            if 0.0 < mx <= 1.5 and float(arr.min()) >= 0.0 \
                    and bool(jnp.any(arr != jnp.floor(arr))):
                warnings.warn(
                    "build_pyramid(quantize=True) floor-truncates level 0 "
                    f"to integers, but the input looks like normalized "
                    f"[0, 1] imagery (max={mx:.4g}) — the finest level "
                    "would collapse to 0/1. Pass quantize=False and track "
                    "with KltOptions(integer_pyramid=False), or scale the "
                    "image to gray values first.", stacklevel=2)
    return _build(img, levels, quantize)
