"""Descriptor matching: all-pairs and spatially-gated nearest neighbor.

Reference behavior: src/descriptor_matcher/descriptor_matcher.h
 - ForceMatch: per ref descriptor, argmin over all cur descriptors with
   distance strictly below the threshold (descriptor_matcher.h:56-79); ties
   go to the lowest index.
 - NearbyMatch: candidates gated to |dx| <= kMaxValidPredictColDistance and
   |dy| <= kMaxValidPredictRowDistance around the predicted position
   (descriptor_matcher.h:91-124). The reference's early exit on an exact
   0-distance candidate is subsumed by argmin-first-index semantics.
 - FillMatchedPixelByPairIndices: maps index pairs to matched pixels and
   TRACKED/LARGE_RESIDUAL statuses, skipping already-failed entries
   (descriptor_matcher.h:136-157).
 - The default distance threshold is 0, so callers MUST set one
   (descriptor_matcher.h:16-20).

TPU design: the O(N*M) scalar loops become one [N, M] distance matrix from
a single MXU matmul (Hamming via the polarization identity on 0/1 vectors,
cosine via normalized dot products) plus masked argmin — no data-dependent
control flow.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from feature_tracker_tpu.core.status import TrackStatus, is_failed


@dataclasses.dataclass(frozen=True)
class MatcherOptions:
    """Defaults mirror DescriptorMatcher::Options (descriptor_matcher.h:16-20)."""

    max_valid_predict_row_distance: int = 40
    max_valid_predict_col_distance: int = 40
    max_valid_descriptor_distance: float = 0.0


def hamming_distance_matrix(bits_ref, bits_cur):
    """Hamming distances between 0/1 bit matrices ``[N, L]`` and ``[M, L]``.

    Uses |a| + |b| - 2 a.b so the heavy term is one MXU matmul; exact for
    L <= 2^23 in float32."""
    a = bits_ref.astype(jnp.float32)
    b = bits_cur.astype(jnp.float32)
    cross = jnp.matmul(a, b.T, precision="highest")
    na = jnp.sum(a, axis=-1, keepdims=True)
    nb = jnp.sum(b, axis=-1, keepdims=True)
    return na + nb.T - 2.0 * cross


def cosine_distance_matrix(desc_ref, desc_cur, eps: float = 1e-12):
    """0.5 - 0.5*cos distance used by the SuperPoint/DISK demos
    (reference: test_descriptor_matcher_superpoint.cpp:32-34)."""
    a = desc_ref / jnp.maximum(
        jnp.linalg.norm(desc_ref, axis=-1, keepdims=True), eps)
    b = desc_cur / jnp.maximum(
        jnp.linalg.norm(desc_cur, axis=-1, keepdims=True), eps)
    return 0.5 - 0.5 * jnp.matmul(a, b.T, precision="highest")


def _masked_argmin(dist, accept):
    masked = jnp.where(accept, dist, jnp.inf)
    j = jnp.argmin(masked, axis=1).astype(jnp.int32)
    ok = jnp.take_along_axis(masked, j[:, None], axis=1)[:, 0] < jnp.inf
    return jnp.where(ok, j, -1)


@jax.jit
def force_match(dist, max_valid_distance):
    """All-pairs NN match. Returns ``[N]`` int32 cur indices (-1 = none)."""
    return _masked_argmin(dist, dist < max_valid_distance)


@jax.jit
def nearby_match(dist, pred_uv_in_cur, cur_uv, max_valid_distance,
                 max_col_distance, max_row_distance):
    """Spatially-gated NN match.

    Args:
      dist: ``[N, M]`` descriptor distances.
      pred_uv_in_cur: ``[N, 2]`` predicted positions of ref features.
      cur_uv: ``[M, 2]`` candidate positions.
    """
    dxy = jnp.abs(pred_uv_in_cur[:, None, :] - cur_uv[None, :, :])
    gate = (dxy[..., 0] <= max_col_distance) & (dxy[..., 1] <= max_row_distance)
    return _masked_argmin(dist, gate & (dist < max_valid_distance))


@jax.jit
def fill_matched_pixels(index_pairs, cur_uv, status=None):
    """Index pairs -> (matched_uv [N,2], status [N]).

    Entries already failed (> TRACKED) keep their status and get a zero
    pixel, matching the reference's default-constructed Vec2."""
    n = index_pairs.shape[0]
    if status is None:
        status = jnp.full((n,), int(TrackStatus.NOT_TRACKED), jnp.int8)
    skip = is_failed(status)
    found = index_pairs >= 0
    safe_idx = jnp.clip(index_pairs, 0, cur_uv.shape[0] - 1)
    matched = jnp.where(found[:, None], cur_uv[safe_idx], 0.0)
    new_status = jnp.where(found, jnp.int8(int(TrackStatus.TRACKED)),
                           jnp.int8(int(TrackStatus.LARGE_RESIDUAL)))
    return (jnp.where(skip[:, None], 0.0, matched),
            jnp.where(skip, status, new_status))
