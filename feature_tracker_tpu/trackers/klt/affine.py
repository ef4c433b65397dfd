"""Affine-warp pyramidal KLT (batched, jitted).

Warp model: ``pos_cur = A @ (dcol, drow) + cur_uv`` with per-feature 2x2
affine ``A``; the GN state is z in R^6 (columns of dA stacked, then dt).

Reference behavior: src/optical_flow_tracker/affine_klt/
 - fast mode: optical_flow_affine_klt_fast.cpp (H precomputed per level from
   ref-patch gradients with x,y anchored at the level-entry cur_uv; bias per
   iteration at affine-warped absolute positions)
 - direct/inverse: optical_flow_affine_klt.cpp:96-220
 - position update v = z[0:2]*x + z[2:4]*y + z[4:6] and A-column update
   (affine_klt_fast.cpp:41-53); convergence is checked on v, not z.
 - A starts as identity once per multi-level call (affine_klt.cpp:20) and
   from predict_affine in single-level calls (affine_klt.cpp:72).

Deviation from the reference (documented on purpose): the reference
accumulates H(3,4) as ``y^2*dx*dy`` (affine_klt.cpp:185, also via the
symmetric fill in the fast path) where the true Gauss-Newton outer product
term is ``y*dx*dy``; we use the mathematically consistent H = sum(J J^T).
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


def _solve_and_update(z_h, z_b, cur_uv, affine):
    """Solve the 6x6 system and apply the reference's update rule."""
    z = solve_sym(z_h, z_b)
    v = z[0:2] * cur_uv[0] + z[2:4] * cur_uv[1] + z[4:6]
    new_uv = cur_uv + v
    new_affine = affine + jnp.stack([z[0:2], z[2:4]], axis=-1)
    return z, v, new_uv, new_affine


def _fast_one(opts: KltOptions, ref_img, cur_img, ref_uv, cur_uv0, affine0,
              status_in):
    del status_in
    ex_patch, ex_valid = extract_const_weight_patch(
        ref_img, ref_uv, opts.ex_patch_rows, opts.ex_patch_cols)
    n_valid_ref = jnp.sum(ex_valid.astype(jnp.int32))
    dx2, dy2 = inner_gradients(ex_patch, ex_valid)
    dx = dx2.reshape(-1)
    dy = dy2.reshape(-1)
    inner_patch = ex_patch[1:-1, 1:-1].reshape(-1)
    inner_valid = ex_valid[1:-1, 1:-1].reshape(-1)
    offsets = _patch_offsets(opts)  # [P, 2] (dcol, drow)

    # H is precomputed once per level with x,y = patch offset + level-entry
    # cur_uv (reference: affine_klt_fast.cpp:95-137).
    x0 = offsets[:, 0] + cur_uv0[0]
    y0 = offsets[:, 1] + cur_uv0[1]
    j6 = jnp.stack([x0 * dx, x0 * dy, y0 * dx, y0 * dy, dx, dy], axis=-1)
    hess = j6.T @ j6

    no_pixels = n_valid_ref == 0
    status0 = jnp.where(no_pixels, jnp.int8(int(TrackStatus.OUTSIDE)),
                        jnp.int8(int(TrackStatus.LARGE_RESIDUAL)))

    def step(state):
        cur_uv, affine = state
        warped = offsets @ affine.T + cur_uv[None, :]
        curv, okcur = bilinear_sample(cur_img, warped)
        valid = okcur & inner_valid
        dt = jnp.where(valid, curv - inner_patch, 0.0)
        xw = jnp.where(valid, warped[:, 0], 0.0)
        yw = jnp.where(valid, warped[:, 1], 0.0)
        b = -jnp.stack([
            jnp.sum(dt * xw * dx), jnp.sum(dt * xw * dy),
            jnp.sum(dt * yw * dx), jnp.sum(dt * yw * dy),
            jnp.sum(dt * dx), jnp.sum(dt * dy)])
        _, v, new_uv, new_affine = _solve_and_update(hess, b, cur_uv, affine)
        return StepResult(jnp.sum(valid.astype(jnp.int32)), v,
                          (new_uv, new_affine), NO_BREAK)

    (uv, affine), status = run_klt_iterations(
        step, (cur_uv0, affine0), status0, no_pixels, opts,
        divergence_counter=True)
    return uv, affine, status


def _iterative_one(opts: KltOptions, ref_img, cur_img, ref_uv, cur_uv0,
                   affine0, status_in):
    offsets = _patch_offsets(opts)
    h, w = cur_img.shape
    ex = jnp.array([1.0, 0.0], dtype=jnp.float32)
    ey = jnp.array([0.0, 1.0], dtype=jnp.float32)

    def step(state):
        cur_uv, affine = state
        warped = offsets @ affine.T + cur_uv[None, :]
        if opts.method == KltMethod.DIRECT:
            g_img, g_pos = cur_img, warped
        else:
            g_img, g_pos = ref_img, ref_uv[None, :] + offsets
        vl, okl = bilinear_sample(g_img, g_pos - ex)
        vr, okr = bilinear_sample(g_img, g_pos + ex)
        vt, okt = bilinear_sample(g_img, g_pos - ey)
        vb, okb = bilinear_sample(g_img, g_pos + ey)
        refv, okref = bilinear_sample(ref_img, ref_uv[None, :] + offsets)
        curv, okcur = bilinear_sample(cur_img, warped)
        valid = okl & okr & okt & okb & okref & okcur
        dx = jnp.where(valid, vr - vl, 0.0)
        dy = jnp.where(valid, vb - vt, 0.0)
        dt = jnp.where(valid, curv - refv, 0.0)
        xw = jnp.where(valid, warped[:, 0], 0.0)
        yw = jnp.where(valid, warped[:, 1], 0.0)
        j6 = jnp.stack([xw * dx, xw * dy, yw * dx, yw * dy, dx, dy], axis=-1)
        hess = j6.T @ j6
        b = -(j6.T @ dt)
        _, v, new_uv, new_affine = _solve_and_update(hess, b, cur_uv, affine)
        outside = ((new_uv[0] < 0) | (new_uv[0] > w - 1)
                   | (new_uv[1] < 0) | (new_uv[1] > h - 1))
        brk = jnp.where(outside, jnp.int8(int(TrackStatus.OUTSIDE)), NO_BREAK)
        return StepResult(jnp.sum(valid.astype(jnp.int32)), v,
                          (new_uv, new_affine), brk)

    (uv, affine), status = run_klt_iterations(
        step, (cur_uv0, affine0), status_in, False, opts,
        divergence_counter=False)
    return uv, affine, status


def track_level(opts: KltOptions, ref_img, cur_img, ref_uv, cur_uv, affine,
                status):
    if opts.method == KltMethod.FAST and jax.default_backend() == "tpu":
        # The per-pixel warped bilinear sampling below lowers to HBM
        # gathers on TPU; the Pallas kernel keeps images in VMEM and
        # samples via separable hat-weight matmuls instead.
        from feature_tracker_tpu.ops.pallas_warp_klt import (
            affine_track_level_pallas,
        )
        return affine_track_level_pallas(opts, ref_img, cur_img, ref_uv,
                                         cur_uv, affine)
    one = _fast_one if opts.method == KltMethod.FAST else _iterative_one
    return jax.vmap(partial(one, opts, ref_img, cur_img))(
        ref_uv, cur_uv, affine, status)
