"""Translation-only pyramidal KLT (batched, jitted).

Reference behavior: src/optical_flow_tracker/basic_klt/
 - fast mode (inverse-compositional with precomputed Hessian):
   optical_flow_basic_klt_fast.cpp:7-195
 - direct/inverse per-iteration rebuild: optical_flow_basic_klt.cpp:88-204
 - multi-level driver: optical_flow_basic_klt.cpp:7-57

TPU design: the per-feature loops become one vmapped lane per feature, the
per-iteration early exits become the masked scaffold in engine.py, and all
patch sampling uses the window-slice formulation (ops/window.py) — one
contiguous dynamic-slice per feature per image per iteration instead of
per-pixel gathers, because every sample in a patch shares one integer
anchor and one set of bilinear weights.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from feature_tracker_tpu.core.config import KltMethod, KltOptions
from feature_tracker_tpu.core.status import TrackStatus
from feature_tracker_tpu.ops.solve import solve2x2
from feature_tracker_tpu.ops.window import (
    const_weights,
    pad_image,
    slice_window,
    tap_validity,
)
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


def _weighted_taps(block, weights, r0: int, c0: int, rows: int, cols: int):
    """Constant-weight bilinear combination of the 4 tap views of a block
    sub-region starting at (r0, c0)."""
    w_tl, w_tr, w_bl, w_br = weights
    return (w_tl * block[r0:r0 + rows, c0:c0 + cols]
            + w_tr * block[r0:r0 + rows, c0 + 1:c0 + cols + 1]
            + w_bl * block[r0 + 1:r0 + rows + 1, c0:c0 + cols]
            + w_br * block[r0 + 1:r0 + rows + 1, c0 + 1:c0 + cols + 1])


def _fast_one(opts: KltOptions, img_shape, ref_pad, cur_pad, pad: int,
              ref_uv, cur_uv0, status_in):
    """Fast mode for one feature at one level (to be vmapped)."""
    del status_in  # fast mode rewrites the status unconditionally
    epr, epc = opts.ex_patch_rows, opts.ex_patch_cols
    pr, pc = opts.patch_rows, opts.patch_cols

    r0, c0, wts = const_weights(ref_uv)
    min_r = r0 - epr // 2
    min_c = c0 - epc // 2
    block = slice_window(ref_pad, pad, min_r, min_c, max(epr, epc) + 1)
    ex_valid = tap_validity(img_shape, min_r, min_c, epr, epc)
    ex_patch = jnp.where(ex_valid, _weighted_taps(block, wts, 0, 0, epr, epc),
                         0.0)
    n_valid_ref = jnp.sum(ex_valid.astype(jnp.int32))

    gvalid = (ex_valid[1:-1, :-2] & ex_valid[1:-1, 2:]
              & ex_valid[:-2, 1:-1] & ex_valid[2:, 1:-1])
    dx = jnp.where(gvalid, ex_patch[1:-1, 2:] - ex_patch[1:-1, :-2], 0.0)
    dy = jnp.where(gvalid, ex_patch[2:, 1:-1] - ex_patch[:-2, 1:-1], 0.0)
    h00 = jnp.sum(dx * dx)
    h01 = jnp.sum(dx * dy)
    h11 = jnp.sum(dy * dy)
    inner_patch = ex_patch[1:-1, 1:-1]
    inner_valid = ex_valid[1:-1, 1:-1]

    no_pixels = n_valid_ref == 0
    status0 = jnp.where(no_pixels, jnp.int8(int(TrackStatus.OUTSIDE)),
                        jnp.int8(int(TrackStatus.LARGE_RESIDUAL)))

    def step(cur_uv):
        cr0, cc0, cwts = const_weights(cur_uv)
        cmin_r = cr0 - pr // 2
        cmin_c = cc0 - pc // 2
        cblock = slice_window(cur_pad, pad, cmin_r, cmin_c,
                              max(pr, pc) + 1)
        cvalid = tap_validity(img_shape, cmin_r, cmin_c, pr, pc)
        cur_patch = _weighted_taps(cblock, cwts, 0, 0, pr, pc)
        valid = cvalid & inner_valid
        dt = jnp.where(valid, cur_patch - inner_patch, 0.0)
        b0 = -jnp.sum(dx * dt)
        b1 = -jnp.sum(dy * dt)
        v = solve2x2(h00, h01, h11, b0, b1)
        return StepResult(jnp.sum(valid.astype(jnp.int32)), v, cur_uv + v,
                          NO_BREAK)

    uv, status = run_klt_iterations(step, cur_uv0, status0, no_pixels, opts,
                                    divergence_counter=True)
    return uv, status


def _iterative_one(opts: KltOptions, img_shape, ref_pad, cur_pad, pad: int,
                   ref_uv, cur_uv0, status_in):
    """Direct/inverse mode for one feature at one level (to be vmapped).

    H and b are rebuilt every iteration; the gradient comes from the
    reference image (inverse) or the current image (direct)
    (reference: basic_klt.cpp:119-204). The +-1 gradient samples share the
    anchor's fractional part, so the whole iteration still needs only one
    window slice per image."""
    pr, pc = opts.patch_rows, opts.patch_cols
    h, w = img_shape
    win = max(pr, pc) + 3  # patch + 1px gradient border + 1 bilinear tap
    inverse = opts.method == KltMethod.INVERSE

    def shifted(block, wts, dr, dc):
        return _weighted_taps(block, wts, 1 + dr, 1 + dc, pr, pc)

    def validity(min_r, min_c, dr, dc):
        return tap_validity(img_shape, min_r + dr, min_c + dc, pr, pc)

    def load(padded, uv):
        r0, c0, wts = const_weights(uv)
        min_r = r0 - pr // 2
        min_c = c0 - pc // 2
        block = slice_window(padded, pad, min_r - 1, min_c - 1, win)
        return block, wts, min_r, min_c

    def step(cur_uv):
        g_block, g_wts, g_minr, g_minc = load(
            ref_pad if inverse else cur_pad, ref_uv if inverse else cur_uv)
        r_block, r_wts, r_minr, r_minc = load(ref_pad, ref_uv)
        c_block, c_wts, c_minr, c_minc = load(cur_pad, cur_uv)

        vl = shifted(g_block, g_wts, 0, -1)
        vr = shifted(g_block, g_wts, 0, 1)
        vt = shifted(g_block, g_wts, -1, 0)
        vb = shifted(g_block, g_wts, 1, 0)
        refv = shifted(r_block, r_wts, 0, 0)
        curv = shifted(c_block, c_wts, 0, 0)

        valid = (validity(g_minr, g_minc, 0, -1)
                 & validity(g_minr, g_minc, 0, 1)
                 & validity(g_minr, g_minc, -1, 0)
                 & validity(g_minr, g_minc, 1, 0)
                 & validity(r_minr, r_minc, 0, 0)
                 & validity(c_minr, c_minc, 0, 0))
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
    if opts.method == KltMethod.FAST and jax.default_backend() == "tpu":
        # On real TPUs the whole level loop runs as one Pallas kernel —
        # the vmapped dynamic_slice formulation below lowers to HBM
        # gathers that are ~4 orders of magnitude slower there. Patches
        # wider than the stacked-sampler stride stay on the jnp path.
        from feature_tracker_tpu.ops.pallas_klt import (
            pallas_patch_supported,
            track_level_fast_pallas,
        )
        if pallas_patch_supported(opts):
            return track_level_fast_pallas(opts, ref_img, cur_img, ref_uv,
                                           cur_uv)
    pad = max(opts.ex_patch_rows, opts.ex_patch_cols) + 3
    ref_pad = pad_image(ref_img, pad)
    cur_pad = pad_image(cur_img, pad)
    one = _fast_one if opts.method == KltMethod.FAST else _iterative_one
    fn = partial(one, opts, ref_img.shape, ref_pad, cur_pad, pad)
    return jax.vmap(fn)(ref_uv, cur_uv, status)
