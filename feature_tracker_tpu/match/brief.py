"""BRIEF binary descriptor, computed on device.

TPU-native stand-in for the sibling-repo BriefDescriptor the reference
demos use (reference: test_descriptor_matcher_brief.cpp:70-76) with the
same parameters: 256 bits, half patch 8. The sampling-pair table is a fixed
deterministic pattern (seeded uniform offsets in [-half, half], the classic
BRIEF construction); each bit is I(p + o1) < I(p + o2) on integer pixels of
a box-smoothed image.

Features whose patch leaves the image get an all-zero descriptor and
``valid=False`` — the reference returns an empty descriptor there, which
its demo distance maps to +inf (test_descriptor_matcher_brief.cpp:33-38);
mask distances with ``valid`` the same way.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def brief_pattern(length: int = 256, half: int = 8, seed: int = 7):
    """Deterministic [length, 2, 2] integer offset pairs (dx, dy)."""
    rng = np.random.default_rng(seed)
    return rng.integers(-half, half + 1, size=(length, 2, 2)).astype(np.int32)


def _box_smooth(img):
    """3x3 box smoothing with replicate border (BRIEF is computed on a
    smoothed image for noise robustness)."""
    pad = jnp.pad(img, 1, mode="edge")
    h, w = img.shape
    acc = jnp.zeros_like(img)
    for i in range(3):
        for j in range(3):
            acc = acc + pad[i:i + h, j:j + w]
    return acc / 9.0


@partial(jax.jit, static_argnames=("length", "half", "seed"))
def compute_brief(img, uv, length: int = 256, half: int = 8, seed: int = 7):
    """Compute BRIEF descriptors at integer-rounded feature positions.

    Args:
      img: ``[H, W]`` float image.
      uv: ``[N, 2]`` float (x, y) positions.

    Returns:
      (bits ``[N, length]`` uint8 in {0, 1}, valid ``[N]`` bool).
    """
    h, w = img.shape
    pattern = jnp.asarray(brief_pattern(length, half, seed))  # [L, 2, 2]
    smoothed = _box_smooth(img)
    center = jnp.round(uv).astype(jnp.int32)  # [N, 2] (x, y)
    # Margin: half for offsets + 1 for the smoothing window.
    margin = half + 1
    valid = ((center[:, 0] >= margin) & (center[:, 0] < w - margin)
             & (center[:, 1] >= margin) & (center[:, 1] < h - margin))
    safe = jnp.stack([jnp.clip(center[:, 0], margin, w - margin - 1),
                      jnp.clip(center[:, 1], margin, h - margin - 1)], -1)
    pos = safe[:, None, None, :] + pattern[None, :, :, :]  # [N, L, 2, 2]
    vals = smoothed[pos[..., 1], pos[..., 0]]  # [N, L, 2]
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint8)
    return jnp.where(valid[:, None], bits, 0), valid


def pack_bits(bits):
    """Pack 0/1 bit rows ``[N, L]`` into uint32 lanes ``[N, L/32]`` for
    compact storage/transfer (L must be a multiple of 32)."""
    n, length = bits.shape
    words = bits.reshape(n, length // 32, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(words << shifts[None, None, :], axis=-1)
