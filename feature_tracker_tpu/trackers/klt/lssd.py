"""SE(2) (rotation + translation) pyramidal KLT with optional luminance
normalization — the reference calls this variant LSSD (locally scaled sum of
squared differences).

Warp model: ``pos_cur = R_cr @ pos_ref + t_cr`` with per-feature 2x2
rotation ``R_cr`` and translation ``t_cr``; GN state v in R^3 =
(dtheta, dt_x, dt_y).

Reference behavior: src/optical_flow_tracker/lssd_klt/
 - fast mode: optical_flow_lssd_klt_fast.cpp (H rebuilt per iteration since
   R changes; optional mean-normalization gated by consider_patch_luminance)
 - direct/inverse: optical_flow_lssd_klt.cpp:127-253 (always
   mean-normalized)
 - rotation update via the small-angle matrix [[1, -v0], [v0, 1]] followed
   by first-column renormalization (lssd_klt.cpp:113-117)
 - the SE(2) jacobian column is grad . (R_cr @ (-row, col))
   (lssd_klt_fast.cpp:216-217)
 - multi-level scales only t_cr between levels (lssd_klt.cpp:49); final
   position is R_cr @ ref_uv + t_cr at full resolution (lssd_klt.cpp:43).

Luminance-mean quirks replicated on purpose: the reference divides the sum
over the *inner* region of a patch by the valid-pixel count of the *whole*
patch (lssd_klt_fast.cpp:29-36, 66-73); since reference and current patches
use different denominators this only approximately cancels, and we match it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from feature_tracker_tpu.core.config import KltMethod, KltOptions
from feature_tracker_tpu.core.status import TrackStatus
from feature_tracker_tpu.ops.interp import (
    bilinear_sample,
    extract_const_weight_patch,
    inner_gradients,
)
from feature_tracker_tpu.ops.solve import solve_sym
from feature_tracker_tpu.trackers.klt.engine import (
    NO_BREAK,
    StepResult,
    run_klt_iterations,
)
from feature_tracker_tpu.trackers.klt.basic import _patch_offsets


def _update_se2(rot, t, v):
    delta = jnp.array([[1.0, 0.0], [0.0, 1.0]]) + jnp.array(
        [[0.0, -1.0], [1.0, 0.0]]) * v[0]
    new_rot = rot @ delta
    new_rot = new_rot / jnp.linalg.norm(new_rot[:, 0])
    return new_rot, t + v[1:3]


def _fast_one(opts: KltOptions, luminance: bool, ref_img, cur_img, ref_uv,
              rot0, t0, status_in):
    del status_in
    ex_patch, ex_valid = extract_const_weight_patch(
        ref_img, ref_uv, opts.ex_patch_rows, opts.ex_patch_cols)
    n_valid_ref = jnp.sum(ex_valid.astype(jnp.int32))
    dx2, dy2 = inner_gradients(ex_patch, ex_valid)
    dx = dx2.reshape(-1)
    dy = dy2.reshape(-1)
    inner_patch = ex_patch[1:-1, 1:-1]
    inner_valid = ex_valid[1:-1, 1:-1].reshape(-1)

    if luminance:
        # Sum over the inner patch / count over the whole extended patch
        # (reference: lssd_klt_fast.cpp:29-36).
        ref_mean = jnp.sum(inner_patch) / n_valid_ref.astype(jnp.float32)
        dx = dx / ref_mean
        dy = dy / ref_mean
        inner_patch = inner_patch / ref_mean
    inner_flat = inner_patch.reshape(-1)

    offsets = _patch_offsets(opts)            # [P, 2] (dcol, drow)
    p_ref = ref_uv[None, :] + offsets         # absolute subpixel ref coords
    # d(pos)/dtheta = R @ (-row, col) per pixel (x-component is -row).
    jrot_ref = jnp.stack([-p_ref[:, 1], p_ref[:, 0]], axis=-1)

    no_pixels = n_valid_ref == 0
    status0 = jnp.where(no_pixels, jnp.int8(int(TrackStatus.OUTSIDE)),
                        jnp.int8(int(TrackStatus.LARGE_RESIDUAL)))

    def step(state):
        rot, t = state
        pos = p_ref @ rot.T + t[None, :]
        curv, okcur = bilinear_sample(cur_img, pos)
        cur_patch = jnp.where(okcur, curv, 0.0)
        if luminance:
            n_cur = jnp.sum(okcur.astype(jnp.float32))
            grid = cur_patch.reshape(opts.patch_rows, opts.patch_cols)
            cur_mean = jnp.sum(grid[1:-1, 1:-1]) / n_cur
            cur_patch = cur_patch / cur_mean
        valid = okcur & inner_valid
        residual = jnp.where(valid, cur_patch - inner_flat, 0.0)
        jtheta = jnp.sum(jnp.stack([dx, dy], -1) * (jrot_ref @ rot.T), -1)
        j3 = jnp.stack([jtheta, dx, dy], axis=-1)
        j3 = jnp.where(valid[:, None], j3, 0.0)
        hess = j3.T @ j3
        b = -(j3.T @ residual)
        v = solve_sym(hess, b)
        new_rot, new_t = _update_se2(rot, t, v)
        return StepResult(jnp.sum(valid.astype(jnp.int32)), v,
                          (new_rot, new_t), NO_BREAK)

    (rot, t), status = run_klt_iterations(
        step, (rot0, t0), status0, no_pixels, opts, divergence_counter=True)
    return rot, t, status


def _iterative_one(opts: KltOptions, ref_img, cur_img, ref_uv, rot0, t0,
                   status_in):
    """Direct/inverse mode; always mean-normalized
    (reference: lssd_klt.cpp:127-253)."""
    offsets = _patch_offsets(opts)
    ex = jnp.array([1.0, 0.0], dtype=jnp.float32)
    ey = jnp.array([0.0, 1.0], dtype=jnp.float32)
    p_ref = ref_uv[None, :] + offsets
    jrot_ref = jnp.stack([-p_ref[:, 1], p_ref[:, 0]], axis=-1)
    inverse = opts.method == KltMethod.INVERSE

    def step(state):
        rot, t = state
        pos = p_ref @ rot.T + t[None, :]
        if inverse:
            g_img, g_pos = ref_img, p_ref
        else:
            g_img, g_pos = cur_img, pos
        vl, okl = bilinear_sample(g_img, g_pos - ex)
        vr, okr = bilinear_sample(g_img, g_pos + ex)
        vt, okt = bilinear_sample(g_img, g_pos - ey)
        vb, okb = bilinear_sample(g_img, g_pos + ey)
        refv, okref = bilinear_sample(ref_img, p_ref)
        curv, okcur = bilinear_sample(cur_img, pos)
        valid = okl & okr & okt & okb & okref & okcur
        nvalid = jnp.sum(valid.astype(jnp.float32))
        ref_mean = jnp.sum(jnp.where(valid, refv, 0.0)) / nvalid
        cur_mean = jnp.sum(jnp.where(valid, curv, 0.0)) / nvalid
        g_mean = ref_mean if inverse else cur_mean
        dx = jnp.where(valid, vr - vl, 0.0) / g_mean
        dy = jnp.where(valid, vb - vt, 0.0) / g_mean
        residual = jnp.where(valid, curv / cur_mean - refv / ref_mean, 0.0)
        jtheta = jnp.sum(jnp.stack([dx, dy], -1) * (jrot_ref @ rot.T), -1)
        j3 = jnp.stack([jtheta, dx, dy], axis=-1)
        hess = j3.T @ j3
        b = -(j3.T @ residual)
        v = solve_sym(hess, b)
        new_rot, new_t = _update_se2(rot, t, v)
        return StepResult(nvalid.astype(jnp.int32), v, (new_rot, new_t),
                          NO_BREAK)

    (rot, t), status = run_klt_iterations(
        step, (rot0, t0), status_in, False, opts, divergence_counter=False)
    return rot, t, status


def track_level(opts: KltOptions, luminance: bool, ref_img, cur_img, ref_uv,
                rot, t, status):
    if opts.method == KltMethod.FAST and jax.default_backend() == "tpu":
        # See affine.track_level: Pallas replaces the HBM-gather sampling.
        from feature_tracker_tpu.ops.pallas_warp_klt import (
            lssd_track_level_pallas,
        )
        return lssd_track_level_pallas(opts, luminance, ref_img, cur_img,
                                       ref_uv, rot, t)
    if opts.method == KltMethod.FAST:
        one = partial(_fast_one, opts, luminance, ref_img, cur_img)
    else:
        one = partial(_iterative_one, opts, ref_img, cur_img)
    return jax.vmap(one)(ref_uv, rot, t, status)
