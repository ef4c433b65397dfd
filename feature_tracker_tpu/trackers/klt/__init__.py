"""Sparse pyramidal Lucas-Kanade trackers (basic / affine / LSSD warps).

Public API mirrors the reference's ``OpticalFlow::TrackFeatures`` dual entry
points (reference: optical_flow.cpp:6-47) but is functional: trackers take
and return arrays instead of mutating vectors in place.

  tracker = BasicKlt(KltOptions(...))
  cur_uv, status = tracker.track(ref_pyramid, cur_pyramid, ref_uv)

Semantics shared with the reference:
 - A missing/mismatched ``cur_uv`` prediction falls back to ``ref_uv``; a
   missing/mismatched ``status`` resets to NOT_TRACKED
   (reference: optical_flow.cpp:11-21).
 - Features whose incoming status is > TRACKED are not re-tracked
   (reference: basic_klt.cpp:15).
 - Only the first ``max_track_points`` features are tracked
   (reference: basic_klt.cpp:9).
 - A final position outside the full-resolution image maps to OUTSIDE
   (reference: basic_klt.cpp:47-53).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from feature_tracker_tpu.core.config import KltMethod, KltOptions
from feature_tracker_tpu.core.status import fresh_status, is_failed
from feature_tracker_tpu.trackers.klt import affine as _affine
from feature_tracker_tpu.trackers.klt import basic as _basic
from feature_tracker_tpu.trackers.klt import lssd as _lssd
from feature_tracker_tpu.trackers.klt.engine import final_outside_check

__all__ = ["BasicKlt", "AffineKlt", "LssdKlt", "KltOptions", "KltMethod"]


def _skip_mask(n, status, opts):
    return is_failed(status) | (jnp.arange(n) >= opts.max_track_points)


@partial(jax.jit, static_argnames=("opts",))
def _basic_pyramid(opts, ref_pyr, cur_pyr, ref_uv, cur_uv, status):
    from feature_tracker_tpu.ops.pallas_klt import pallas_patch_supported

    n = ref_uv.shape[0]
    skip = _skip_mask(n, status, opts)
    # Patches wider than the Pallas stacked-sampler stride (ex-patch dim
    # > 32, i.e. half size >= 15) would alias adjacent feature blocks in
    # the kernels — those fall through to the vmapped jnp path (correct,
    # much slower on TPU; the kernels raise if called directly).
    if jax.default_backend() == "tpu" and pallas_patch_supported(opts):
        # One Pallas launch runs the whole coarse-to-fine loop on-chip
        # (all three solver modes since round 4 — the vmapped
        # dynamic-slice fallback below lowers to HBM gathers that are
        # ~4 orders slower on real TPUs). Skipped features (failed
        # earlier / beyond max_track_points) are PARKED off-image —
        # an empty validity rectangle ends their GN chains before
        # iteration 0 — and the tile is sorted alive-first so whole
        # interleave batches of dead features exit their while_loop
        # immediately (the CPU reference `continue`s dead features for
        # free, basic_klt.cpp:15; without grouping, a dead lane inside a
        # live batch saves nothing). Outputs are unsorted and the parked
        # results discarded by the skip select below.
        from feature_tracker_tpu.ops.pallas_klt import (
            track_pyramid_fast_pallas,
            track_pyramid_iter_pallas,
        )
        order = jnp.argsort(skip.astype(jnp.int8), stable=True)
        inv = jnp.zeros_like(order).at[order].set(jnp.arange(n))
        park = jnp.float32(-4096.0)
        ruv = jnp.where(skip[:, None], park, ref_uv)[order]
        cuv = jnp.where(skip[:, None], park, cur_uv)[order]
        if opts.method == KltMethod.FAST:
            s_cur, st = track_pyramid_fast_pallas(opts, ref_pyr, cur_pyr,
                                                  ruv, cuv)
        else:
            s_cur, st = track_pyramid_iter_pallas(opts, ref_pyr, cur_pyr,
                                                  ruv, cuv, status[order])
        s_cur, st = s_cur[inv], st[inv]
    else:
        scale = float(1 << (len(ref_pyr) - 1))
        s_ref = ref_uv / scale
        s_cur = cur_uv / scale
        st = status
        for lvl in range(len(ref_pyr) - 1, -1, -1):
            s_cur, st = _basic.track_level(opts, ref_pyr[lvl], cur_pyr[lvl],
                                           s_ref, s_cur, st)
            if lvl > 0:
                s_ref = s_ref * 2.0
                s_cur = s_cur * 2.0
    st = final_outside_check(s_cur, st, cur_pyr[0].shape)
    out_uv = jnp.where(skip[:, None], cur_uv, s_cur)
    out_st = jnp.where(skip, status, st)
    return out_uv, out_st


@partial(jax.jit, static_argnames=("opts",))
def _basic_single(opts, ref_img, cur_img, ref_uv, cur_uv, status):
    n = ref_uv.shape[0]
    skip = _skip_mask(n, status, opts)
    new_uv, st = _basic.track_level(opts, ref_img, cur_img, ref_uv, cur_uv,
                                    status)
    st = final_outside_check(new_uv, st, cur_img.shape)
    return (jnp.where(skip[:, None], cur_uv, new_uv),
            jnp.where(skip, status, st))


@partial(jax.jit, static_argnames=("opts",))
def _affine_pyramid(opts, ref_pyr, cur_pyr, ref_uv, cur_uv, status):
    n = ref_uv.shape[0]
    skip = _skip_mask(n, status, opts)
    scale = float(1 << (len(ref_pyr) - 1))
    s_ref = ref_uv / scale
    s_cur = cur_uv / scale
    # Affine starts at identity once per call and persists across levels
    # (reference: affine_klt.cpp:20).
    aff = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32), (n, 2, 2))
    st = status
    for lvl in range(len(ref_pyr) - 1, -1, -1):
        s_cur, aff, st = _affine.track_level(
            opts, ref_pyr[lvl], cur_pyr[lvl], s_ref, s_cur, aff, st)
        if lvl > 0:
            s_ref = s_ref * 2.0
            s_cur = s_cur * 2.0
    st = final_outside_check(s_cur, st, cur_pyr[0].shape)
    out_uv = jnp.where(skip[:, None], cur_uv, s_cur)
    out_st = jnp.where(skip, status, st)
    return out_uv, out_st


@partial(jax.jit, static_argnames=("opts",))
def _affine_single(opts, ref_img, cur_img, ref_uv, cur_uv, status,
                   predict_affine):
    n = ref_uv.shape[0]
    skip = _skip_mask(n, status, opts)
    aff = jnp.broadcast_to(predict_affine, (n, 2, 2))
    new_uv, _, st = _affine.track_level(opts, ref_img, cur_img, ref_uv,
                                        cur_uv, aff, status)
    st = final_outside_check(new_uv, st, cur_img.shape)
    return (jnp.where(skip[:, None], cur_uv, new_uv),
            jnp.where(skip, status, st))


@partial(jax.jit, static_argnames=("opts", "luminance"))
def _lssd_pyramid(opts, luminance, ref_pyr, cur_pyr, ref_uv, cur_uv, status,
                  predict_rot):
    n = ref_uv.shape[0]
    skip = _skip_mask(n, status, opts)
    scale = float(1 << (len(ref_pyr) - 1))
    s_ref = ref_uv / scale
    s_cur = cur_uv / scale
    rot = jnp.broadcast_to(predict_rot, (n, 2, 2))
    # t_cr = scaled prediction - R_cr @ scaled ref (reference: lssd_klt.cpp:22-23).
    t = s_cur - jnp.einsum("ij,nj->ni", predict_rot, s_ref)
    st = status
    for lvl in range(len(ref_pyr) - 1, -1, -1):
        rot, t, st = _lssd.track_level(opts, luminance, ref_pyr[lvl],
                                       cur_pyr[lvl], s_ref, rot, t, st)
        if lvl > 0:
            s_ref = s_ref * 2.0
            t = t * 2.0  # only the translation is upscaled (lssd_klt.cpp:49)
    out = jnp.einsum("nij,nj->ni", rot, ref_uv) + t
    st = final_outside_check(out, st, cur_pyr[0].shape)
    out_uv = jnp.where(skip[:, None], cur_uv, out)
    out_st = jnp.where(skip, status, st)
    return out_uv, out_st


@partial(jax.jit, static_argnames=("opts", "luminance"))
def _lssd_single(opts, luminance, ref_img, cur_img, ref_uv, cur_uv, status,
                 predict_rot):
    n = ref_uv.shape[0]
    skip = _skip_mask(n, status, opts)
    rot = jnp.broadcast_to(predict_rot, (n, 2, 2))
    t = cur_uv - jnp.einsum("ij,nj->ni", predict_rot, ref_uv)
    rot, t, st = _lssd.track_level(opts, luminance, ref_img, cur_img, ref_uv,
                                   rot, t, status)
    out = jnp.einsum("nij,nj->ni", rot, ref_uv) + t
    st = final_outside_check(out, st, cur_img.shape)
    return (jnp.where(skip[:, None], cur_uv, out),
            jnp.where(skip, status, st))


@partial(jax.jit, static_argnames=("opts", "kind", "luminance", "levels"))
def _stream(opts, kind, luminance, frames, uv0, st0, levels):
    from feature_tracker_tpu.ops.pyramid import build_pyramid

    pyr = jax.vmap(lambda f: build_pyramid(f, levels))(frames)

    def body(carry, x):
        uv, st = carry
        rp, cp = x
        if kind == "basic":
            out = _basic_pyramid(opts, rp, cp, uv, uv, st)
        elif kind == "affine":
            out = _affine_pyramid(opts, rp, cp, uv, uv, st)
        else:
            out = _lssd_pyramid(opts, luminance, rp, cp, uv, uv, st,
                                jnp.eye(2, dtype=jnp.float32))
        return out, out

    _, (uvs, sts) = jax.lax.scan(
        body, (uv0, st0),
        (tuple(p[:-1] for p in pyr), tuple(p[1:] for p in pyr)))
    return uvs, sts


class _KltBase:
    _stream_kind = "basic"

    def __init__(self, options: KltOptions | None = None):
        self.options = options or KltOptions()

    def track_stream(self, frames, ref_uv, status=None, levels: int = 4):
        """Track features through a ``[T, H, W]`` frame stream — T-1
        chained pairs — in ONE jitted program (pyramids built batched,
        the tracker scanned over consecutive pairs, one device dispatch
        for the whole stream).

        Each pair's tracked positions become the next pair's reference
        positions AND prediction; failed features stay skipped on later
        frames (reference: basic_klt.cpp:15 — the reference has no
        multi-frame API, its demos track one pair; this is the
        production front-end shape that amortizes per-call dispatch and
        host overhead across the stream).

        Returns ``(uv [T-1, N, 2], status [T-1, N] int8)`` — the state
        after each pair."""
        frames = jnp.asarray(frames, jnp.float32)
        ref_uv = jnp.asarray(ref_uv, jnp.float32)
        n = ref_uv.shape[0]
        if status is None or jnp.shape(status) != (n,):
            status = fresh_status(n)
        else:
            status = jnp.asarray(status, jnp.int8)
        return _stream(self.options, self._stream_kind,
                       getattr(self, "consider_patch_luminance", False),
                       frames, ref_uv, status, levels)

    def _prep(self, ref_uv, cur_uv, status):
        ref_uv = jnp.asarray(ref_uv, jnp.float32)
        n = ref_uv.shape[0]
        if cur_uv is None or jnp.shape(cur_uv) != (n, 2):
            cur_uv = ref_uv
        else:
            cur_uv = jnp.asarray(cur_uv, jnp.float32)
        if status is None or jnp.shape(status) != (n,):
            status = fresh_status(n)
        else:
            status = jnp.asarray(status, jnp.int8)
        return ref_uv, cur_uv, status


class BasicKlt(_KltBase):
    """Translation-only pyramidal KLT."""

    def track(self, ref_pyramid, cur_pyramid, ref_uv, cur_uv=None,
              status=None):
        ref_uv, cur_uv, status = self._prep(ref_uv, cur_uv, status)
        return _basic_pyramid(self.options, tuple(ref_pyramid),
                              tuple(cur_pyramid), ref_uv, cur_uv, status)

    def track_single_level(self, ref_image, cur_image, ref_uv, cur_uv=None,
                           status=None):
        ref_uv, cur_uv, status = self._prep(ref_uv, cur_uv, status)
        return _basic_single(self.options, ref_image, cur_image, ref_uv,
                             cur_uv, status)


class AffineKlt(_KltBase):
    """Affine-warp pyramidal KLT."""

    _stream_kind = "affine"

    def __init__(self, options: KltOptions | None = None):
        super().__init__(options)
        self.predict_affine = jnp.eye(2, dtype=jnp.float32)

    def track(self, ref_pyramid, cur_pyramid, ref_uv, cur_uv=None,
              status=None):
        ref_uv, cur_uv, status = self._prep(ref_uv, cur_uv, status)
        return _affine_pyramid(self.options, tuple(ref_pyramid),
                               tuple(cur_pyramid), ref_uv, cur_uv, status)

    def track_single_level(self, ref_image, cur_image, ref_uv, cur_uv=None,
                           status=None):
        ref_uv, cur_uv, status = self._prep(ref_uv, cur_uv, status)
        return _affine_single(self.options, ref_image, cur_image, ref_uv,
                              cur_uv, status,
                              jnp.asarray(self.predict_affine, jnp.float32))


class LssdKlt(_KltBase):
    """SE(2) pyramidal KLT with optional luminance normalization."""

    _stream_kind = "lssd"

    def __init__(self, options: KltOptions | None = None,
                 consider_patch_luminance: bool = False):
        super().__init__(options)
        self.consider_patch_luminance = consider_patch_luminance
        self.predict_rotation = jnp.eye(2, dtype=jnp.float32)

    def track(self, ref_pyramid, cur_pyramid, ref_uv, cur_uv=None,
              status=None):
        ref_uv, cur_uv, status = self._prep(ref_uv, cur_uv, status)
        return _lssd_pyramid(self.options, self.consider_patch_luminance,
                             tuple(ref_pyramid), tuple(cur_pyramid), ref_uv,
                             cur_uv, status,
                             jnp.asarray(self.predict_rotation, jnp.float32))

    def track_single_level(self, ref_image, cur_image, ref_uv, cur_uv=None,
                           status=None):
        ref_uv, cur_uv, status = self._prep(ref_uv, cur_uv, status)
        return _lssd_single(self.options, self.consider_patch_luminance,
                            ref_image, cur_image, ref_uv, cur_uv, status,
                            jnp.asarray(self.predict_rotation, jnp.float32))
