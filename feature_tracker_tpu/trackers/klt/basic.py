"""Translation-only pyramidal KLT (batched, jitted).

Reference behavior: src/optical_flow_tracker/basic_klt/
 - fast mode (inverse-compositional with precomputed Hessian):
   optical_flow_basic_klt_fast.cpp:7-195
 - direct/inverse per-iteration rebuild: optical_flow_basic_klt.cpp:88-204
 - multi-level driver: optical_flow_basic_klt.cpp:7-57

Design: the per-feature loops become one vmapped lane per feature; the
per-iteration early exits become the masked scaffold in
:mod:`feature_tracker_tpu.trackers.klt.engine`.
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
from feature_tracker_tpu.ops.solve import solve2x2
from feature_tracker_tpu.trackers.klt.engine import (
    NO_BREAK,
    StepResult,
    run_klt_iterations,
)


def _patch_offsets(opts: KltOptions):
    """[P, 2] integer (dcol, drow) offsets covering the patch."""
    dr = jnp.arange(-opts.patch_row_half_size, opts.patch_row_half_size + 1,
                    dtype=jnp.float32)
    dc = jnp.arange(-opts.patch_col_half_size, opts.patch_col_half_size + 1,
                    dtype=jnp.float32)
    dcc, drr = jnp.meshgrid(dc, dr)  # row-major: row varies slowest
    return jnp.stack([dcc.reshape(-1), drr.reshape(-1)], axis=-1)


def _fast_one(opts: KltOptions, ref_img, cur_img, ref_uv, cur_uv0, status_in):
    """Fast mode for one feature at one level (to be vmapped)."""
    del status_in  # fast mode rewrites the status unconditionally
    ex_patch, ex_valid = extract_const_weight_patch(
        ref_img, ref_uv, opts.ex_patch_rows, opts.ex_patch_cols)
    n_valid_ref = jnp.sum(ex_valid.astype(jnp.int32))
    dx, dy = inner_gradients(ex_patch, ex_valid)
    h00 = jnp.sum(dx * dx)
    h01 = jnp.sum(dx * dy)
    h11 = jnp.sum(dy * dy)
    inner_patch = ex_patch[1:-1, 1:-1]
    inner_valid = ex_valid[1:-1, 1:-1]

    no_pixels = n_valid_ref == 0
    status0 = jnp.where(no_pixels, jnp.int8(int(TrackStatus.OUTSIDE)),
                        jnp.int8(int(TrackStatus.LARGE_RESIDUAL)))

    def step(cur_uv):
        cur_patch, cur_valid = extract_const_weight_patch(
            cur_img, cur_uv, opts.patch_rows, opts.patch_cols)
        valid = cur_valid & inner_valid
        dt = jnp.where(valid, cur_patch - inner_patch, 0.0)
        b0 = -jnp.sum(dx * dt)
        b1 = -jnp.sum(dy * dt)
        v = solve2x2(h00, h01, h11, b0, b1)
        return StepResult(jnp.sum(valid.astype(jnp.int32)), v, cur_uv + v,
                          NO_BREAK)

    uv, status = run_klt_iterations(step, cur_uv0, status0, no_pixels, opts,
                                    divergence_counter=True)
    return uv, status


def _iterative_one(opts: KltOptions, ref_img, cur_img, ref_uv, cur_uv0,
                   status_in):
    """Direct/inverse mode for one feature at one level (to be vmapped).

    H and b are rebuilt every iteration from bilinear samples; the gradient
    comes from the reference image (inverse) or the current image (direct)
    (reference: basic_klt.cpp:119-204). Unlike fast mode there is no
    divergence counter and the incoming status is kept unless a break
    condition rewrites it."""
    offsets = _patch_offsets(opts)  # [P, 2]
    h, w = cur_img.shape
    ex = jnp.array([1.0, 0.0], dtype=jnp.float32)
    ey = jnp.array([0.0, 1.0], dtype=jnp.float32)

    def step(cur_uv):
        if opts.method == KltMethod.INVERSE:
            g_img, g_base = ref_img, ref_uv
        else:
            g_img, g_base = cur_img, cur_uv
        pos_g = g_base[None, :] + offsets
        vl, okl = bilinear_sample(g_img, pos_g - ex)
        vr, okr = bilinear_sample(g_img, pos_g + ex)
        vt, okt = bilinear_sample(g_img, pos_g - ey)
        vb, okb = bilinear_sample(g_img, pos_g + ey)
        refv, okref = bilinear_sample(ref_img, ref_uv[None, :] + offsets)
        curv, okcur = bilinear_sample(cur_img, cur_uv[None, :] + offsets)
        valid = okl & okr & okt & okb & okref & okcur
        fx = jnp.where(valid, vr - vl, 0.0)
        fy = jnp.where(valid, vb - vt, 0.0)
        ft = jnp.where(valid, curv - refv, 0.0)
        h00 = jnp.sum(fx * fx)
        h01 = jnp.sum(fx * fy)
        h11 = jnp.sum(fy * fy)
        b0 = -jnp.sum(fx * ft)
        b1 = -jnp.sum(fy * ft)
        v = solve2x2(h00, h01, h11, b0, b1)
        new_uv = cur_uv + v
        outside = ((new_uv[0] < 0) | (new_uv[0] > w - 1)
                   | (new_uv[1] < 0) | (new_uv[1] > h - 1))
        brk = jnp.where(outside, jnp.int8(int(TrackStatus.OUTSIDE)), NO_BREAK)
        return StepResult(jnp.sum(valid.astype(jnp.int32)), v, new_uv, brk)

    uv, status = run_klt_iterations(step, cur_uv0, status_in, False, opts,
                                    divergence_counter=False)
    return uv, status


def track_level(opts: KltOptions, ref_img, cur_img, ref_uv, cur_uv, status):
    one = _fast_one if opts.method == KltMethod.FAST else _iterative_one
    return jax.vmap(partial(one, opts, ref_img, cur_img))(ref_uv, cur_uv,
                                                          status)
