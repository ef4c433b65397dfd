"""Pallas TPU kernel for the basic-KLT fast-mode level tracker.

The hot path of sparse KLT is, per feature per iteration, a bilinear
window resample of the current image plus two dot products
(reference: basic_klt_fast.cpp:101-195). The jnp formulation
(trackers/klt/basic.py) expresses this as a vmapped ``dynamic_slice`` —
XLA lowers that to an HBM gather per iteration, which TPUs execute poorly
(~870 ms for 10k features at 4 levels).

This kernel keeps BOTH padded level images resident in VMEM (a 752x480
float level is 1.4 MB; VMEM is ~16 MB) and runs the entire per-level
Gauss-Newton iteration loop on-chip: the grid walks feature tiles, and for
each feature one VMEM window slice per iteration feeds the fused
bilinear + residual + J^T r reduction and the closed-form 2x2 solve. No
HBM traffic happens inside the loop at all.

Semantics are bit-for-bit those of the jnp path (engine.py):
 - no valid reference pixel        -> OUTSIDE, position unchanged
 - NaN step                        -> NUMERIC_ERROR, break, uv unchanged
 - squared step not shrinking max_tolerance_large_step consecutive times
                                    -> break, status stays LARGE_RESIDUAL
 - squared step < max_converge_step -> TRACKED, break
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from feature_tracker_tpu.core.config import KltOptions
from feature_tracker_tpu.core.status import TrackStatus

# Feature tile per grid program. The grid is sequential on a TensorCore;
# the tile mainly sizes the position/status SMEM blocks, and 1D SMEM
# operands must match XLA's {0:T(1024)} layout tiling.
TILE = 1024


def _win(n: int) -> int:
    """Window edge: patch + 1 bilinear tap, rounded up a little so slices
    stay within one static shape for ref (patch+2+1) and cur (patch+1)."""
    return n


def _kernel(ref_pad, cur_pad, ref_x, ref_y, cur_x, cur_y,
            out_x, out_y, out_status, *,
            opts: KltOptions, img_h: int, img_w: int, pad: int,
            hp: int, wp: int, n_features: int):
    epr, epc = opts.ex_patch_rows, opts.ex_patch_cols      # patch + 2
    pr, pc = opts.patch_rows, opts.patch_cols
    ew = max(epr, epc) + 1                                  # ref window edge
    cw = max(pr, pc) + 1                                    # cur window edge

    tile_base = pl.program_id(0) * TILE

    def taps(block, w, r0, c0, rows, cols):
        w_tl, w_tr, w_bl, w_br = w
        return (w_tl * block[r0:r0 + rows, c0:c0 + cols]
                + w_tr * block[r0:r0 + rows, c0 + 1:c0 + cols + 1]
                + w_bl * block[r0 + 1:r0 + rows + 1, c0:c0 + cols]
                + w_br * block[r0 + 1:r0 + rows + 1, c0 + 1:c0 + cols + 1])

    def weights_of(x, y):
        r0 = jnp.floor(y)
        c0 = jnp.floor(x)
        fr = y - r0
        fc = x - c0
        return (r0.astype(jnp.int32), c0.astype(jnp.int32),
                ((1.0 - fr) * (1.0 - fc), (1.0 - fr) * fc,
                 fr * (1.0 - fc), fr * fc))

    def validity(min_r, min_c, rows, cols):
        # Masks are rebuilt at their exact shape every use: Mosaic
        # miscompiles (crashes on) sliced bool/iota vectors.
        rr = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0) + min_r
        cc = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1) + min_c
        return ((rr >= 0) & (rr <= img_h - 2)
                & (cc >= 0) & (cc <= img_w - 2))

    # Aligned superset-window extents (multiples of 8 sublanes / 128
    # lanes — Mosaic vector loads and dynamic rotates require both).
    ew_rows = ((max(epr, epc) + 1 + 16 + 7) // 8) * 8
    ew_lanes = 256

    def slice_clip(img, min_r, min_c, edge):
        # Load one tile-aligned superset window containing the target,
        # then rotate the target window into place in-register.
        r = jnp.clip(min_r + pad, 0, hp - edge)
        c = jnp.clip(min_c + pad, 0, wp - edge)
        r8 = pl.multiple_of(jnp.minimum((r // 8) * 8, hp - ew_rows), 8)
        c128 = pl.multiple_of(jnp.minimum((c // 128) * 128, wp - ew_lanes),
                              128)
        win = img[pl.ds(r8, ew_rows), pl.ds(c128, ew_lanes)]
        win = pltpu.roll(win, shift=r8 - r, axis=0)
        win = pltpu.roll(win, shift=c128 - c, axis=1)
        return win[:edge, :edge]

    def one_feature(f, _):
        @pl.when(tile_base + f < n_features)
        def _():
            rx = ref_x[f]
            ry = ref_y[f]
            r0, c0, wts = weights_of(rx, ry)
            min_r = r0 - epr // 2
            min_c = c0 - epc // 2
            block = slice_clip(ref_pad, min_r, min_c, ew)
            ex_valid = validity(min_r, min_c, epr, epc)
            ex_patch = jnp.where(ex_valid, taps(block, wts, 0, 0, epr, epc),
                                 0.0)
            n_valid_ref = jnp.sum(ex_valid.astype(jnp.int32))

            # Neighbor-validity product, recomputed at [pr, pc] (the
            # sliced-bool equivalents crash Mosaic; see validity()).
            gvalid = (validity(min_r + 1, min_c, pr, pc)
                      & validity(min_r + 1, min_c + 2, pr, pc)
                      & validity(min_r, min_c + 1, pr, pc)
                      & validity(min_r + 2, min_c + 1, pr, pc))
            dx = jnp.where(gvalid, ex_patch[1:-1, 2:] - ex_patch[1:-1, :-2],
                           0.0)
            dy = jnp.where(gvalid, ex_patch[2:, 1:-1] - ex_patch[:-2, 1:-1],
                           0.0)
            h00 = jnp.sum(dx * dx)
            h01 = jnp.sum(dx * dy)
            h11 = jnp.sum(dy * dy)
            det = h00 * h11 - h01 * h01
            inner_patch = ex_patch[1:-1, 1:-1]
            inner_valid = validity(min_r + 1, min_c + 1, pr, pc)

            no_pixels = n_valid_ref == 0
            status0 = jnp.where(no_pixels,
                                jnp.int32(int(TrackStatus.OUTSIDE)),
                                jnp.int32(int(TrackStatus.LARGE_RESIDUAL)))

            def iter_body(_, carry):
                x, y, status, last_sq, cnt, done = carry
                cr0, cc0, cwts = weights_of(x, y)
                cmin_r = cr0 - pr // 2
                cmin_c = cc0 - pc // 2
                cblock = slice_clip(cur_pad, cmin_r, cmin_c, cw)
                cvalid = validity(cmin_r, cmin_c, pr, pc)
                valid = cvalid & inner_valid
                cur_patch = taps(cblock, cwts, 0, 0, pr, pc)
                dt = jnp.where(valid, cur_patch - inner_patch, 0.0)
                b0 = -jnp.sum(dx[:pr, :pc] * dt)
                b1 = -jnp.sum(dy[:pr, :pc] * dt)
                # Closed-form 2x2 solve (LDLT equivalent).
                vx = (h11 * b0 - h01 * b1) / det
                vy = (h00 * b1 - h01 * b0) / det

                num_valid = jnp.sum(valid.astype(jnp.int32))
                no_valid = num_valid == 0
                isnan = jnp.isnan(vx) | jnp.isnan(vy)
                sq = vx * vx + vy * vy

                do_update = jnp.logical_not(done | no_valid | isnan)
                new_x = jnp.where(do_update, x + vx, x)
                new_y = jnp.where(do_update, y + vy, y)

                shrink = sq < last_sq
                new_last = jnp.where(shrink, sq, last_sq)
                new_cnt = jnp.where(shrink, 0, cnt + 1)
                new_last = jnp.where(do_update, new_last, last_sq)
                new_cnt = jnp.where(do_update, new_cnt, cnt)
                diverged = do_update & (
                    new_cnt >= opts.max_tolerance_large_step)
                converged = (do_update & (sq < opts.max_converge_step)
                             & jnp.logical_not(diverged))

                new_status = jnp.where(
                    isnan & jnp.logical_not(done | no_valid),
                    jnp.int32(int(TrackStatus.NUMERIC_ERROR)),
                    jnp.where(converged,
                              jnp.int32(int(TrackStatus.TRACKED)), status))
                new_status = jnp.where(done, status, new_status)
                new_done = done | no_valid | isnan | diverged | converged
                return (new_x, new_y, new_status, new_last, new_cnt,
                        new_done)

            x, y, status, _, _, _ = jax.lax.fori_loop(
                0, opts.max_iterations, iter_body,
                (cur_x[f], cur_y[f], status0,
                 jnp.float32(jnp.inf), jnp.int32(0), no_pixels))

            out_x[f] = x
            out_y[f] = y
            out_status[f] = status

        return 0

    jax.lax.fori_loop(0, TILE, one_feature, 0)


@functools.partial(jax.jit,
                   static_argnames=("opts", "interpret"))
def track_level_fast_pallas(opts: KltOptions, ref_img, cur_img, ref_uv,
                            cur_uv, interpret: bool = False):
    """Drop-in fast-mode level tracker. Returns (uv [N,2], status [N] i8).

    Incoming-status semantics (skip handling) are applied by the caller,
    as in the jnp path."""
    n = ref_uv.shape[0]
    n_pad = ((n + TILE - 1) // TILE) * TILE
    # Positions travel as separate 1D x/y arrays: 2D SMEM blocks get
    # lane-padded to 128 and blow the scalar-memory budget.
    ref_x = jnp.pad(ref_uv[:, 0], (0, n_pad - n))
    ref_y = jnp.pad(ref_uv[:, 1], (0, n_pad - n))
    cur_x = jnp.pad(cur_uv[:, 0], (0, n_pad - n))
    cur_y = jnp.pad(cur_uv[:, 1], (0, n_pad - n))

    pad = max(opts.ex_patch_rows, opts.ex_patch_cols) + 3
    h, w = ref_img.shape
    ew = max(opts.ex_patch_rows, opts.ex_patch_cols) + 1
    # Bottom/right extra padding so the aligned superset window (ew+16
    # rows rounded to 8, 256 lanes) always fits, even on tiny levels.
    ew_rows = ((ew + 16 + 7) // 8) * 8
    hp = ((max(h + 2 * pad, ew_rows) + 7) // 8) * 8
    wp = ((max(w + 2 * pad, 256) + 127) // 128) * 128
    ref_pad = jnp.pad(ref_img, ((pad, hp - h - pad), (pad, wp - w - pad)))
    cur_pad = jnp.pad(cur_img, ((pad, hp - h - pad), (pad, wp - w - pad)))

    kernel = functools.partial(_kernel, opts=opts, img_h=h, img_w=w,
                               pad=pad, hp=hp, wp=wp, n_features=n)
    smem_vec = pl.BlockSpec((TILE,), lambda i: (i,),
                            memory_space=pltpu.SMEM)
    out_x, out_y, status = pl.pallas_call(
        kernel,
        grid=(n_pad // TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ref_pad (whole)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cur_pad (whole)
            # Positions are consumed/produced as scalars -> SMEM.
            smem_vec, smem_vec, smem_vec, smem_vec,
        ],
        out_specs=(smem_vec, smem_vec, smem_vec),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad,), jnp.float32),
            jax.ShapeDtypeStruct((n_pad,), jnp.float32),
            jax.ShapeDtypeStruct((n_pad,), jnp.int32),
        ),
        interpret=interpret,
    )(ref_pad, cur_pad, ref_x, ref_y, cur_x, cur_y)
    return (jnp.stack([out_x[:n], out_y[:n]], axis=-1),
            status[:n].astype(jnp.int8))


def pallas_available() -> bool:
    """True when running on a real TPU backend (the compiled kernel);
    tests use interpret mode on CPU."""
    return jax.default_backend() == "tpu"
