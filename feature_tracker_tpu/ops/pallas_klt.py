"""Pallas TPU kernel for the basic-KLT fast-mode tracker.

The hot path of sparse KLT is, per feature per iteration, a bilinear
window resample of the current image plus two dot products
(reference: basic_klt_fast.cpp:101-195). The jnp formulation
(trackers/klt/basic.py) expresses this as a vmapped ``dynamic_slice`` —
XLA lowers that to an HBM gather per iteration, which TPUs execute poorly
(~870 ms for 10k features at 4 levels).

This kernel keeps ALL padded pyramid levels resident in VMEM (a 752x480
float level is ~2 MB) and runs the ENTIRE coarse-to-fine tracking loop
on-chip in one launch: per feature, each level precomputes the reference
patch/gradients/2x2 Hessian and iterates the Gauss-Newton update, then
doubles the coordinates for the next level. One program dispatch per
frame, zero HBM traffic inside the loop.

Performance notes (rounds 2-3; measured on 1x v5e in BASELINE.md):
 - Patch sampling is a separable constant-weight contraction of an
   aligned window with hat-weight selection matrices — tile-aligned
   loads with the sub-tile offset absorbed by the interpolation weights
   (roll-free; Mosaic's dynamic sublane rotate miscompiles for several
   shift/shape combos).
 - The wide column contraction is STACKED across the interleave batch:
   one ``[B*win_r, 128] x [128, B*16]`` matmul computes every feature's
   column-interpolated block per iteration (and per reference setup);
   feature k's block is read back at tile-aligned offsets
   (off-diagonal blocks are never read). Windows are 128 lanes via a
   64-column-shifted second image plane (round 3; anchor granularity
   64) — halves the contraction and every weight-build area.
 - Round-3 ablation profile (fixed-iteration probes, 10240 feats x 4
   levels): setup ~2.6 ms, full ~36 ms. Per-iteration cost splits
   ~12.5 ms bias reduce chains, ~4 ms stacked contraction, ~2.7 ms
   scalar advance, ~1.3 ms weight builds. Rewrites that looked better
   on paper measured WORSE and are documented in the bias comment
   below: every extra small-matmul issue carries ~20-35ns fixed MXU
   overhead, and cross-lane-offset elementwise ops insert expensive
   relayouts — op COUNT and layout offsets, not FLOPs, are the
   currency of this kernel.
 - The per-iteration bias uses a MASKED TRACE IDENTITY instead of
   materializing the patch:  b = sum(A_E) - <A_D, U>  with
   A = RW_masked^T @ [dx|dy|dx*inner|dy*inner]. The reference's dt
   validity mask is a separable rectangle, so it folds exactly into a
   row mask on RW^T and one lane mask on the gradient block; the
   <grad*inner> constant falls out of the same matmul because hat
   weights are a partition of unity over the window. num_valid is the
   closed-form area of the rectangle intersection. No branches — border
   and interior features share one path, bit-equivalent semantics
   (modulo float summation order; see the identity parity test).
 - The compiled path replaces 6-pass ``Precision.HIGHEST`` matmuls with
   an explicit 3-pass split-bfloat16 product (hi/lo decomposition of
   both operands, lo x lo dropped): ~1e-3 gray-level accuracy on 0..255
   imagery (vs ~0.3 gray for single-pass bf16 — enough to break the
   |v|^2 < 4e-2 convergence threshold) at half the MXU issue count.
   Interpret mode keeps exact float32 f32 matmuls and the
   reference-ordered (non-identity) bias so the parity tests compare
   bit-meaningfully against the jnp path; the identity and split paths
   have their own tolerance tests (tests/test_pallas_klt.py).
 - Iteration windows are [24, 256] (patch rows 16 + sublane alignment
   7), setup windows [32, 256]; the padded-image geometry guarantees
   every VALID tap is covered by the clamped aligned load for any float
   position (see _geometry). Loads measured free (VMEM reads ~4KB/cy).
 - Features interleave in batches of 4 independent scalar GN chains
   sharing one early-exiting ``while_loop`` (typical convergence: 2-5 of
   the 15 iterations; measured batch-max ~4.3). B=2/8 measured slower
   (pipelining vs straggler trade).
 - Round-4 ablations (2026-08-19, same 10240x4 workload) — identity b4
   36.4 ms remains the optimum; every wider-op formulation measured
   SLOWER: qpf b4 38.0 (per-feature q = RW^T U fold: same 3 MXU issues
   as the a-matmul but its q-matmul DEPENDS on the stacked contraction,
   serializing what identity overlaps — identity's a-matmul reads only
   setup constants, so all B a-matmuls + the stacked contraction issue
   independently); qdt-bcast b4/b8 51.3/51.0 and qdtv-bcast b8/b16
   47.7/53.3 (replacing the r3 per-block select chains with one
   3-split broadcast matmul made the folds WORSE — the select chains
   were never the bottleneck; the block-diagonal fold matmul's
   quadratic-in-B FLOPs [16B, win_r*B] x [win_r*B, 16B] and its serial
   position in the chain are).
 - Roofline position: 36.4 ms = ~44k batch-iterations (10240/4 features
   x 4 levels x ~4.3 avg iterations) at ~830 ns each, covering 5 MXU
   issues (2 stacked-sample passes + 3 a-matmul passes x 4 features =
   14 issues total), ~45 VPU ops (weight/mask builds + 16 reduce-chain
   stages across 4 features), ~2b window loads, and 4 x ~30-op scalar
   advance chains. With measured ~20-35 ns/issue MXU fixed cost and the
   VPU/scalar work overlapping it, the issue floor alone is
   ~14 x 25 = 350 ns; adding the non-overlappable reduce stages puts
   the access-pattern bound at roughly 550-650 ns/batch-iteration,
   i.e. ~24-29 ms for the workload. The kernel sits within ~1.3-1.5x of
   that bound; the remaining gap is compiler scheduling slack, not an
   untried formulation (see the ablation list above — every candidate
   that trades chains for matmul issues or width has been measured).

Semantics are bit-for-bit those of the jnp path (engine.py):
 - no valid reference pixel        -> OUTSIDE, position unchanged
 - NaN step                        -> NUMERIC_ERROR, break, uv unchanged
 - squared step not shrinking max_tolerance_large_step consecutive times
                                    -> break, status stays LARGE_RESIDUAL
 - squared step < max_converge_step -> TRACKED, break
Status is rewritten per level; failed-feature skipping and the final
outside check stay in the jnp wrapper (trackers/klt/__init__.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from feature_tracker_tpu.core.config import KltOptions
from feature_tracker_tpu.core.status import TrackStatus
from feature_tracker_tpu.ops.pallas_warp_klt import (
    TILE,
    _advance,
    _round8,
    _smem_vec,
    _split2,
    _status0,
    _xdot,
)


WIN_C = 128  # window lanes: patch cols 16 + 64-granular anchor offset
             # (the padded images carry a 64-column-shifted second plane,
             # halving every sampling matmul's contraction width vs the
             # round-2 256-lane windows with 128-granular anchors)

# Stacked-sampler stride limit: stacked_samples packs each feature's
# column block at a 16- or 32-lane stride (16 when cols <= 16, else 32).
# An extended patch wider than 32 columns would overrun its 32-lane slot
# and alias the NEXT feature's block — silently wrong tracks, no crash.
# Both whole-pyramid entry points extract extended patches through the
# stacked sampler (every bias mode, "slow" included), so both check this
# at trace time; the tracker dispatch falls back to the vmapped jnp path
# for wider patches.
MAX_EX_PATCH_DIM = 32


def pallas_patch_supported(opts: KltOptions) -> bool:
    """True when the whole-pyramid kernels' stacked-sampler layout can
    hold this patch size (ex-patch rows/cols <= 32, i.e. half size <= 14)."""
    return max(opts.ex_patch_rows, opts.ex_patch_cols) <= MAX_EX_PATCH_DIM


def _check_patch_limits(opts: KltOptions, entry: str) -> None:
    if not pallas_patch_supported(opts):
        raise ValueError(
            f"{entry} requires ex-patch rows/cols <= {MAX_EX_PATCH_DIM} "
            f"(stacked-sampler 32-lane stride); got "
            f"{opts.ex_patch_rows}x{opts.ex_patch_cols} "
            f"(patch_row/col_half_size {opts.patch_row_half_size}/"
            f"{opts.patch_col_half_size}). Use the vmapped jnp path for "
            f"wider patches.")


class _RigidSampler:
    """Rigid (constant-bilinear-weight) patch sampler in 2D layout.

    Basic KLT's patch is rigidly offset from the feature point, so the
    whole [pr, pc] patch is one separable contraction of an aligned
    window; the [pr, pc] layout packs into 2 VPU tiles instead of the
    warped kernels' flat-P 22."""

    def __init__(self, opts: KltOptions, img_h, img_w, pad, hp, wp,
                 rows=None, cols=None, precise: bool = True):
        self.pr = opts.patch_rows if rows is None else rows
        self.pc = opts.patch_cols if cols is None else cols
        self.win_r = _round8(self.pr + 1 + 7)
        self.img_h, self.img_w = img_h, img_w
        self.pad, self.hp, self.wp = pad, hp, wp
        self.precise = precise
        # 2-pass image splits require integer-valued imagery (see
        # KltOptions.integer_pyramid); non-integer input keeps 3 passes.
        self.img_exact = opts.integer_pyramid
        pr, pc = self.pr, self.pc
        self.r_i = jax.lax.broadcasted_iota(jnp.int32, (pr, self.win_r), 0)
        self.r_r = jax.lax.broadcasted_iota(jnp.int32, (pr, self.win_r), 1)
        self.c_j = jax.lax.broadcasted_iota(jnp.int32, (pc, WIN_C), 0)
        self.c_c = jax.lax.broadcasted_iota(jnp.int32, (pc, WIN_C), 1)
        self.v_i = jax.lax.broadcasted_iota(jnp.int32, (pr, pc), 0)
        self.v_j = jax.lax.broadcasted_iota(jnp.int32, (pr, pc), 1)

    def load_window(self, img, center_x, center_y):
        """Aligned [win_r, WIN_C] window anchored at the patch start.

        ``img`` is the STACKED padded image [2*hp, wp]: plane 1 holds
        the 64-column-shifted copy, so the effective column anchor has
        64-px granularity and 128 lanes always cover the 17 bilinear
        taps. _geometry guarantees the clamps never cut off a VALID
        tap."""
        r_des = jnp.clip(
            jnp.floor(center_y).astype(jnp.int32) - self.pr // 2 + self.pad,
            0, self.hp - self.win_r)
        c_des = jnp.clip(
            jnp.floor(center_x).astype(jnp.int32) - self.pc // 2 + self.pad,
            0, self.wp - 65)
        r8 = pl.multiple_of((r_des // 8) * 8, 8)
        plane = (c_des // 64) & 1
        c128 = pl.multiple_of((c_des // 128) * 128, 128)
        row0 = pl.multiple_of(plane * self.hp + r8, 8)
        win = img[pl.ds(row0, self.win_r), pl.ds(c128, WIN_C)]
        return win, r8 - self.pad, c128 + 64 * plane - self.pad

    def sample(self, window, wr0, wc0, x, y):
        """Const-weight [pr, pc] patch at (x, y). Columns contract first
        (A·B^T form), then the narrow row contraction. Returns
        (patch, valid) — valid per the reference bound (floor anchor in
        [0, dim-2])."""
        ly0 = y - self.pr // 2 - wr0.astype(jnp.float32)
        lx0 = x - self.pc // 2 - wc0.astype(jnp.float32)
        rw = jnp.maximum(
            0.0, 1.0 - jnp.abs(ly0 + self.r_i.astype(jnp.float32)
                               - self.r_r.astype(jnp.float32)))
        cw = jnp.maximum(
            0.0, 1.0 - jnp.abs(lx0 + self.c_j.astype(jnp.float32)
                               - self.c_c.astype(jnp.float32)))
        # Quantized pyramid levels are uint8-truncated integers (exact in
        # bf16) — the window's lo split term is identically zero: 2-pass
        # split, gated on KltOptions.integer_pyramid.
        u = _xdot(window, cw, ((1,), (1,)), self.precise,
                  a_exact=self.img_exact)                   # [win_r, pc]
        patch = _xdot(rw, u, ((1,), (0,)), self.precise)    # [pr, pc]
        valid = self.validity_at(x, y)
        return jnp.where(valid, patch, 0.0), valid

    def validity_at(self, x, y):
        """Reference-bound validity of the patch grid."""
        min_r = jnp.floor(y).astype(jnp.int32) - self.pr // 2
        min_c = jnp.floor(x).astype(jnp.int32) - self.pc // 2
        rr = self.v_i + min_r
        cc = self.v_j + min_c
        return ((rr >= 0) & (rr <= self.img_h - 2)
                & (cc >= 0) & (cc <= self.img_w - 2))

    def interior_at(self, x, y):
        """Scalar: every patch tap anchor strictly valid (full-true
        validity rectangle) — the precondition for the trace-identity
        fast path."""
        min_r = jnp.floor(y).astype(jnp.int32) - self.pr // 2
        min_c = jnp.floor(x).astype(jnp.int32) - self.pc // 2
        return ((min_r >= 0) & (min_r + self.pr - 1 <= self.img_h - 2)
                & (min_c >= 0) & (min_c + self.pc - 1 <= self.img_w - 2))

    def row_weights_t(self, ly0, i_lo=None, i_hi=None, width=None):
        """Transposed row hat weights [win_r, width] built directly (no
        transpose op): rwT[r, i] = hat(ly0 + i - r), optionally zeroed
        outside patch-row range [i_lo, i_hi] (the cur-validity row
        mask; also zeroes pad columns i >= pr when width > pr since
        i_hi <= pr - 1)."""
        n = self.pr if width is None else width
        r = jax.lax.broadcasted_iota(jnp.int32, (self.win_r, n), 0)
        i = jax.lax.broadcasted_iota(jnp.int32, (self.win_r, n), 1)
        w = jnp.maximum(
            0.0, 1.0 - jnp.abs(ly0 + i.astype(jnp.float32)
                               - r.astype(jnp.float32)))
        if i_lo is not None:
            w = jnp.where((i >= i_lo) & (i <= i_hi), w, 0.0)
        return w

    def row_weights_16(self, ly0, i_lo, i_hi):
        """Row hat weights [16, win_r] built directly in the q-fold's
        matmul-ready orientation: w[i, r] = hat(ly0 + i - r), zeroed
        outside patch-row range [i_lo, i_hi] (which also zeroes pad rows
        i >= pr since i_hi <= pr - 1)."""
        i = jax.lax.broadcasted_iota(jnp.int32, (16, self.win_r), 0)
        r = jax.lax.broadcasted_iota(jnp.int32, (16, self.win_r), 1)
        w = jnp.maximum(
            0.0, 1.0 - jnp.abs(ly0 + i.astype(jnp.float32)
                               - r.astype(jnp.float32)))
        return jnp.where((i >= i_lo) & (i <= i_hi), w, 0.0)

    def stacked_col_weights(self, lx0_list, stride: int = 16):
        """Column hat weights for B features stacked at a power-of-two
        row stride: CW_all[stride*k + j, c] = hat(lx0_k + j - c) for
        j in [0, stride) (rows past the patch width are junk lanes never
        read back). One [B*stride, WIN_C] build + one stacked
        contraction replaces B separate ones."""
        b = len(lx0_list)
        rows = stride * b
        shift = stride.bit_length() - 1
        i = jax.lax.broadcasted_iota(jnp.int32, (rows, WIN_C), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (rows, WIN_C), 1)
        j = (i & (stride - 1)).astype(jnp.float32)
        k = i >> shift
        lx0 = lx0_list[0]
        for kk in range(1, b):
            lx0 = jnp.where(k >= kk, lx0_list[kk], lx0)
        return jnp.maximum(0.0, 1.0 - jnp.abs(lx0 + j
                                              - c.astype(jnp.float32)))

    def stacked_samples(self, imgs, xs, ys):
        """Load B windows and compute every feature's column-contracted
        block in ONE stacked matmul. Returns (U_all, loads); feature k's
        [win_r, stride] block is U_all[win_r*k :, stride*k :]."""
        b = len(xs)
        stride = 16 if self.pc <= 16 else 32
        loads = [self.load_window(imgs, xs[k], ys[k]) for k in range(b)]
        wins_all = jnp.concatenate([w for (w, _, _) in loads], axis=0)
        lx0s = [xs[k] - self.pc // 2 - loads[k][2].astype(jnp.float32)
                for k in range(b)]
        cw_all = self.stacked_col_weights(lx0s, stride)
        # Stacked quantized windows are uint8-truncated integers — exact
        # in bf16, so the lo x hi split pass is a zero matrix and is
        # dropped (gated on KltOptions.integer_pyramid).
        u_all = _xdot(wins_all, cw_all, ((1,), (1,)), self.precise,
                      a_exact=self.img_exact)
        return u_all, loads, stride

    def stacked_col_weights_bc(self, lx0_bc, b, stride: int = 16):
        """Column hat weights [stride*b, WIN_C] from a block-broadcast
        lx0 column ([16b, 1], _bcast16 output) — the iota arithmetic is
        identical to stacked_col_weights but the per-feature values
        arrive pre-broadcast, with no O(b) select chain over the full
        area."""
        rows = stride * b
        i = jax.lax.broadcasted_iota(jnp.int32, (rows, WIN_C), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (rows, WIN_C), 1)
        j = (i & (stride - 1)).astype(jnp.float32)
        return jnp.maximum(
            0.0, 1.0 - jnp.abs(lx0_bc + j - c.astype(jnp.float32)))

    def stacked_row_weights_t_bc(self, ly0_bc, lo_bc, hi_bc, b):
        """Block-diagonal transposed row hat weights [16b, win_r*b] from
        block-broadcast ly0 / row-range columns ([16b, 1] each). Same
        semantics as stacked_row_weights_t (mask folded in, pad and
        off-diagonal rows zero), no per-block select chains."""
        rows, cols = 16 * b, self.win_r * b
        gi = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
        gr = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
        r0 = (gi >> 4) * self.win_r
        ii = (gi & 15).astype(jnp.float32)
        rloc = (gr - r0).astype(jnp.float32)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(ly0_bc + ii - rloc))
        ok = ((rloc >= 0) & (rloc < self.win_r)
              & (ii >= lo_bc) & (ii <= hi_bc))
        return jnp.where(ok, w, 0.0)

    def stacked_contract(self, wins_all, cw_all):
        """The stacked sampling contraction on pre-built operands."""
        return _xdot(wins_all, cw_all, ((1,), (1,)), self.precise,
                     a_exact=self.img_exact)

    def stacked_row_weights_t(self, ly0_list, ci_lo_list, ci_hi_list):
        """Block-diagonal transposed row hat weights for B features:
        W[16k + i, win_r*k + r] = hat(ly0_k + i - r) for i in the
        cur-validity row range [ci_lo_k, ci_hi_k], zero elsewhere (incl.
        off-diagonal blocks and pad rows i >= pr, since ci_hi <= pr-1).
        One [16B, win_r*B] build feeds ONE stacked contraction with the
        stacked window samples, replacing B separate row matmuls; the
        folded i-mask makes the contraction output exactly the
        row-masked sampled patch (and, against a ones column, the exact
        0/1 row-mask vector)."""
        b = len(ly0_list)
        rows, cols = 16 * b, self.win_r * b
        gi = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
        gr = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
        k = gi >> 4
        r0 = k * self.win_r
        ly0 = ly0_list[0]
        lo = ci_lo_list[0]
        hi = ci_hi_list[0]
        for kk in range(1, b):
            sel = k >= kk
            ly0 = jnp.where(sel, ly0_list[kk], ly0)
            lo = jnp.where(sel, ci_lo_list[kk], lo)
            hi = jnp.where(sel, ci_hi_list[kk], hi)
        ii = gi & 15
        rloc = gr - r0
        w = jnp.maximum(
            0.0, 1.0 - jnp.abs(ly0 + ii.astype(jnp.float32)
                               - rloc.astype(jnp.float32)))
        ok = ((rloc >= 0) & (rloc < self.win_r) & (ii >= lo) & (ii <= hi))
        return jnp.where(ok, w, 0.0)


BATCH = 4  # interleaved per-feature GN chains per while_loop


def _lane_vec(vals, dtype=jnp.float32):
    """[1, b] lane vector from b per-feature scalars (b cheap 1-tile
    selects)."""
    b = len(vals)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
    v = jnp.full((1, b), vals[0], dtype)
    for k in range(1, b):
        v = jnp.where(lanes == k, jnp.asarray(vals[k]).astype(dtype), v)
    return v


def _bcast16(rows, b, precise):
    """Block broadcast [16b, nq]: output row-block k, column q =
    rows[q][0, k], via ONE matmul against the static 0/1 block
    indicator. Replaces the round-3 per-block select chains, whose cost
    grew as O(b) chained wheres over O(b)-row areas — the actual
    quadratic term that sank the qdt/qdtv folds on-chip (the fold
    matmuls themselves are 3 issues regardless of b).

    The broadcast values feed hat-weight builds, so the compiled path
    uses a 3-way hi/lo/ll bf16 split of the value matrix (~2^-24
    relative, f32-rounding exact in practice) — a 2-pass split's ~2^-16
    error would put ~0.07 gray of sampling error on the patch."""
    v = jnp.concatenate(rows, axis=0)                       # [nq, b]
    gi = jax.lax.broadcasted_iota(jnp.int32, (16 * b, b), 0)
    gc = jax.lax.broadcasted_iota(jnp.int32, (16 * b, b), 1)
    e2 = ((gi >> 4) == gc).astype(jnp.float32)
    dn = (((1,), (1,)), ((), ()))
    if precise:
        return jax.lax.dot_general(e2, v, dn,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
    eh = e2.astype(jnp.bfloat16)
    hi = v.astype(jnp.bfloat16)
    r1 = v - hi.astype(jnp.float32)
    lo = r1.astype(jnp.bfloat16)
    ll = (r1 - lo.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(p):
        return jax.lax.dot_general(eh, p, dn,
                                   preferred_element_type=jnp.float32)

    return d(hi) + d(lo) + d(ll)


def _eye_place(pc: int, lane0: int, lanes: int):
    """Static [pc, lanes] 0/1 placement matrix: column j -> lane
    lane0 + j. A split-exact matmul against it re-materializes a block
    at the target lane offset with CANONICAL layout (a direct
    lane-offset concat of values is rejected by Mosaic)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (pc, lanes), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (pc, lanes), 1)
    return (c == r + lane0).astype(jnp.float32)


def _place_exact(arr, eye, precise: bool):
    """arr @ eye with f32-exact arithmetic: HIGHEST on the parity path,
    2-pass hi/lo split on the compiled path (eye is 0/1, exact in bf16;
    hi + lo reproduces arr to f32 rounding)."""
    dn = (((1,), (0,)), ((), ()))
    if precise:
        return jax.lax.dot_general(arr, eye, dn,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
    hi, lo = _split2(arr)
    eh = eye.astype(jnp.bfloat16)

    def d(p):
        return jax.lax.dot_general(p, eh, dn,
                                   preferred_element_type=jnp.float32)

    return d(hi) + d(lo)


def _kernel(*refs, opts: KltOptions, shapes, pad: int, n_features: int,
            precise: bool, bias_mode: str, batch: int = BATCH):
    levels = len(shapes)
    ref_imgs = refs[:levels]
    cur_imgs = refs[levels:2 * levels]
    (ref_x, ref_y, cur_x, cur_y, out_x, out_y,
     out_status) = refs[2 * levels:]

    tile_base = pl.program_id(0) * TILE
    epr, epc = opts.ex_patch_rows, opts.ex_patch_cols
    samplers = [_RigidSampler(opts, h, w, pad, hp, wp, precise=precise)
                for (h, w, hp, wp) in shapes]
    # Extended sampler: patch + 1px gradient border in ONE contraction
    # (static float-array slicing of the result is safe; only bool/iota
    # slicing crashes Mosaic).
    ex_samplers = [_RigidSampler(opts, h, w, pad, hp, wp,
                                 rows=epr, cols=epc, precise=precise)
                   for (h, w, hp, wp) in shapes]

    def ref_setup(lvl, rx, ry, ex_patch):
        """Per-level reference quantities for one feature (``ex_patch``
        comes from the batched stacked extraction)."""
        smp = samplers[lvl]
        inner = ex_patch[1:-1, 1:-1]
        # Validity rectangles in closed form: the intersection of the 4
        # gradient-neighbor validities is one rectangle (anchor row/col
        # in [1, dim-3]), so one mask replaces four.
        inner_valid = smp.validity_at(rx, ry)
        min_r = jnp.floor(ry).astype(jnp.int32) - smp.pr // 2
        min_c = jnp.floor(rx).astype(jnp.int32) - smp.pc // 2
        rr = smp.v_i + min_r
        cc = smp.v_j + min_c
        gvalid = ((rr >= 1) & (rr <= smp.img_h - 3)
                  & (cc >= 1) & (cc <= smp.img_w - 3))
        dx = jnp.where(gvalid, ex_patch[1:-1, 2:] - ex_patch[1:-1, :-2],
                       0.0)
        dy = jnp.where(gvalid, ex_patch[2:, 1:-1] - ex_patch[:-2, 1:-1],
                       0.0)
        h00 = jnp.sum(dx * dx)
        h01 = jnp.sum(dx * dy)
        h11 = jnp.sum(dy * dy)
        det = h00 * h11 - h01 * h01

        # Valid-pixel count of the FULL extended (epr x epc) patch, which
        # decides the initial OUTSIDE status (optical_flow.cpp:49-102);
        # the valid region is a clipped rectangle, so the count is closed
        # form.
        fy = jnp.floor(ry).astype(jnp.int32)
        fx = jnp.floor(rx).astype(jnp.int32)
        lo_r = jnp.maximum(fy - epr // 2, 0)
        hi_r = jnp.minimum(fy - epr // 2 + epr - 1, smp.img_h - 2)
        lo_c = jnp.maximum(fx - epc // 2, 0)
        hi_c = jnp.minimum(fx - epc // 2 + epc - 1, smp.img_w - 2)
        n_ref = (jnp.maximum(hi_r - lo_r + 1, 0)
                 * jnp.maximum(hi_c - lo_c + 1, 0))

        # Masked-trace-identity operands (see iter_body): the gradient
        # pair and the <grad, inner> integrands in one lane-stacked
        # [pr, 64] block (16-lane stride keeps every read-back slice
        # tile-aligned), plus the reference-validity rectangle bounds in
        # patch coordinates (scalars) for the closed-form valid count.
        # Only built on the identity/qdt paths, whose 16-lane block
        # layouts require patch rows/cols <= 16 (checked at trace time).
        if bias_mode != "slow":
            rmin_r = jnp.floor(ry).astype(jnp.int32) - smp.pr // 2
            rmin_c = jnp.floor(rx).astype(jnp.int32) - smp.pc // 2
            ref_rect = (jnp.maximum(0, -rmin_r),
                        jnp.minimum(smp.pr - 1, smp.img_h - 2 - rmin_r),
                        jnp.maximum(0, -rmin_c),
                        jnp.minimum(smp.pc - 1, smp.img_w - 2 - rmin_c))
        else:
            ref_rect = None
        if bias_mode == "identity":
            pc = smp.pc
            zcol = jnp.zeros((smp.pr, 16 - pc), jnp.float32)
            d_aug = jnp.concatenate(
                [dx, zcol, dy, zcol, dx * inner, zcol, dy * inner, zcol],
                axis=1)                                       # [pr, 64]
        elif bias_mode == "qpf":
            # Zero-padded [16, 16] blocks for the q-fold: the junk lanes
            # of u_all (j >= pc) and pad rows (i >= pr) are killed by the
            # zero dx/dy entries, so the per-iteration bias needs no junk
            # masking — only the cur-validity rectangle. inner/dx/dy come
            # out of the setup at mismatched internal layout offsets, so
            # a direct lane concat is rejected by Mosaic; each block is
            # re-materialized at canonical layout by a HIGHEST-precision
            # placement matmul (setup-amortized; the 0/1 eye keeps values
            # to f32 rounding), then row-concat with zeros is legal.
            zrow = jnp.zeros((16 - smp.pr, 16), jnp.float32)
            e16 = _eye_place(smp.pc, 0, 16)

            def p16(m):
                return jnp.concatenate(
                    [_place_exact(m, e16, True), zrow], axis=0)

            d_aug = (p16(inner), p16(dx), p16(dy))
        else:
            d_aug = None
        return (inner, inner_valid, dx, dy, (h00, h01, h11, det),
                n_ref == 0, d_aug, ref_rect)

    def track_level_batch(lvl, rxs, rys, xs, ys):
        """Fast-mode tracking of a BATCH of features at one level.

        The B features' chains are independent, so their small matmuls
        and window loads interleave — hiding the MXU/VPU latency that
        serializes a one-feature-at-a-time loop. Lists in, lists out."""
        smp = samplers[lvl]
        exs = ex_samplers[lvl]
        b = len(rxs)
        # Batched reference setup: one stacked contraction extracts all
        # B extended patches' column blocks.
        uex_all, exloads, exstride = exs.stacked_samples(
            ref_imgs[lvl], rxs, rys)
        ex_patches = []
        for k in range(b):
            _, wr0, wc0 = exloads[k]
            ly0 = rys[k] - exs.pr // 2 - wr0.astype(jnp.float32)
            rw = jnp.maximum(
                0.0, 1.0 - jnp.abs(ly0 + exs.r_i.astype(jnp.float32)
                                   - exs.r_r.astype(jnp.float32)))
            uex = uex_all[exs.win_r * k:exs.win_r * (k + 1),
                          exstride * k:exstride * k + exs.pc]
            patch = _xdot(rw, uex, ((1,), (0,)), precise)
            ex_patches.append(
                jnp.where(exs.validity_at(rxs[k], rys[k]), patch, 0.0))
        setups = [ref_setup(lvl, rxs[k], rys[k], ex_patches[k])
                  for k in range(b)]

        if bias_mode in ("qdt", "qdtv"):
            # Lane-place each feature's (dx, dy, inner) at lanes
            # [16k, 16k+pc) via exact split matmuls (amortized over
            # every iteration of the level). Each block is placed by
            # its OWN matmul: dx/dy/inner come out of the setup with
            # different internal Mosaic layout offsets, and a
            # pre-matmul row concat of offset-mismatched vectors is
            # rejected by the real compiler ("result/input offset
            # mismatch on non-concat dimension" — interpret mode does
            # not exercise layouts). The matmul re-materializes each
            # output at canonical layout, so the row concats below are
            # legal.
            dxs, dys, inns = [], [], []
            for k in range(b):
                inner, _, dx, dy = setups[k][:4]
                ek = _eye_place(smp.pc, 16 * k, 16 * b)
                dxs.append(_place_exact(dx, ek, precise))
                dys.append(_place_exact(dy, ek, precise))
                inns.append(_place_exact(inner, ek, precise))
            # Row blocks sit at a 16-row stride: pad each feature's
            # pr-row block with zeros up to 16.
            def cat16(blocks):
                if smp.pr == 16:
                    return jnp.concatenate(blocks, axis=0)
                zrow = jnp.zeros((16 - smp.pr, 16 * b), jnp.float32)
                return jnp.concatenate(
                    [v for blk in blocks for v in (blk, zrow)], axis=0)

            dx_p = cat16(dxs)                           # [16b, 16b]
            dy_p = cat16(dys)
            inner_p = cat16(inns)

        def slow_bias(k, cwin, cwr0, cwc0, x, y):
            """Masked-patch bias (reference semantics near borders)."""
            inner, inner_valid, dx, dy = setups[k][:4]
            curv, okcur = smp.sample(cwin, cwr0, cwc0, x, y)
            valid = okcur & inner_valid
            dt = jnp.where(valid, curv - inner, 0.0)
            return (-jnp.sum(dx * dt), -jnp.sum(dy * dt),
                    jnp.sum(valid.astype(jnp.int32)))

        wr = smp.win_r

        def advance_all(pre):
            out = []
            for k in range(b):
                (x, y, status, last_sq, cnt, done, num_valid,
                 b0, b1) = pre[k]
                (h00, h01, h11, det) = setups[k][4]
                # Closed-form 2x2 solve (LDLT equivalent).
                vx = (h11 * b0 - h01 * b1) / det
                vy = (h00 * b1 - h01 * b0) / det
                upd, status, last_sq, cnt, done = _advance(
                    done, status, last_sq, cnt, [vx, vy], num_valid, opts)
                out.extend([jnp.where(upd, x + vx, x),
                            jnp.where(upd, y + vy, y),
                            status, last_sq, cnt, done])
            return tuple(out)

        def qdt_fold(xs_c, ys_c):
            """The q/dt fold shared by qdt and qdtv (reworked round 4):
            loads the B windows, block-broadcasts ALL per-feature build
            scalars (lx0, ly0, row range) in ONE _bcast16 matmul, builds
            both stacked hat-weight operands select-chain-free, then two
            stacked block-diagonal contractions produce every feature's
            column samples and row-masked sampled patch q (plus, against
            an appended ones column, the exact 0/1 row-mask — hat
            weights are a partition of unity over the covered window, so
            the masked build's row sums are exactly the cur-validity
            indicator). The residual dt = q - inner*rowmask is
            small-magnitude (no catastrophic cancellation), and the
            masked column sums of dx*dt / dy*dt come out as two [1, 16b]
            lane vectors (cs0m, cs1m). The round-3 version of this fold
            measured SLOWER than identity because its per-block select
            chains cost O(b) wheres over O(b)-row areas per iteration;
            the broadcast matmul removes that quadratic term."""
            loads = [smp.load_window(cur_imgs[lvl], xs_c[k], ys_c[k])
                     for k in range(b)]
            lx0s, ly0s, ci_los, ci_his, rects = [], [], [], [], []
            for k in range(b):
                x, y = xs_c[k], ys_c[k]
                min_r = jnp.floor(y).astype(jnp.int32) - smp.pr // 2
                min_c = jnp.floor(x).astype(jnp.int32) - smp.pc // 2
                ci_lo = jnp.maximum(0, -min_r)
                ci_hi = jnp.minimum(smp.pr - 1, smp.img_h - 2 - min_r)
                cj_lo = jnp.maximum(0, -min_c)
                cj_hi = jnp.minimum(smp.pc - 1, smp.img_w - 2 - min_c)
                lx0s.append(x - smp.pc // 2
                            - loads[k][2].astype(jnp.float32))
                ly0s.append(y - smp.pr // 2
                            - loads[k][1].astype(jnp.float32))
                ci_los.append(ci_lo.astype(jnp.float32))
                ci_his.append(ci_hi.astype(jnp.float32))
                rects.append((ci_lo, ci_hi, cj_lo, cj_hi))
            bc = _bcast16([_lane_vec(lx0s), _lane_vec(ly0s),
                           _lane_vec(ci_los), _lane_vec(ci_his)],
                          b, precise)                       # [16b, 4]
            cw_all = smp.stacked_col_weights_bc(bc[:, 0:1], b)
            wins_all = jnp.concatenate([w for (w, _, _) in loads],
                                       axis=0)
            u_all = smp.stacked_contract(wins_all, cw_all)
            rwtt = smp.stacked_row_weights_t_bc(bc[:, 1:2], bc[:, 2:3],
                                                bc[:, 3:4], b)
            ones_col = jnp.ones((b * smp.win_r, 1), jnp.float32)
            u_aug = jnp.concatenate([u_all, ones_col], axis=1)
            q_aug = _xdot(rwtt, u_aug, ((1,), (0,)), precise)
            rowm = q_aug[:, 16 * b:16 * b + 1]          # [16b, 1]
            qv = q_aug[:, :16 * b]                      # [16b, 16b]
            dtm = qv - inner_p * rowm
            cs0 = jnp.sum(dx_p * dtm, axis=0, keepdims=True)
            cs1 = jnp.sum(dy_p * dtm, axis=0, keepdims=True)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 16 * b), 1)
            kk = lane >> 4
            jj = lane & 15
            lo = rects[0][2]
            hi = rects[0][3]
            for k2 in range(1, b):
                lo = jnp.where(kk >= k2, rects[k2][2], lo)
                hi = jnp.where(kk >= k2, rects[k2][3], hi)
            colm = ((jj >= lo) & (jj <= hi)).astype(jnp.float32)
            return cs0 * colm, cs1 * colm, rects

        def qdt_pre(carry, xs_c, ys_c):
            """qdt mode: per-feature SCALAR bias/count extraction from
            the fold (static 16-lane slice sums + closed-form rect
            intersection counts); the advance stays 4 interleaved
            scalar chains."""
            cs0m, cs1m, rects = qdt_fold(xs_c, ys_c)
            pre = []
            for k in range(b):
                x, y, status, last_sq, cnt, done = carry[6 * k:6 * k + 6]
                ci_lo, ci_hi, cj_lo, cj_hi = rects[k]
                b0 = -jnp.sum(cs0m[0:1, 16 * k:16 * (k + 1)])
                b1 = -jnp.sum(cs1m[0:1, 16 * k:16 * (k + 1)])
                ri_lo, ri_hi, rj_lo, rj_hi = setups[k][7]
                num_valid = (
                    jnp.maximum(0, jnp.minimum(ci_hi, ri_hi)
                                - jnp.maximum(ci_lo, ri_lo) + 1)
                    * jnp.maximum(0, jnp.minimum(cj_hi, rj_hi)
                                  - jnp.maximum(cj_lo, rj_lo) + 1))
                pre.append((x, y, status, last_sq, cnt, done,
                            num_valid, b0, b1))
            return pre

        if bias_mode == "qdtv":
            # Vector-lane GN advance (VERDICT r2 item 1): per-feature
            # state (x, y, status, last_sq, cnt, done) lives in [1, b]
            # VMEM lane vectors, so ONE VPU op advances the whole
            # interleave — the ~30-op scalar break chain no longer runs
            # b times. The only scalar round-trips left per iteration
            # are the 2b window-load anchors (one-hot masked lane sums,
            # exact: a single nonzero term). The masked bias column
            # sums reduce [2, 16b] -> [2, b] through ONE exact split
            # matmul against the static block-sum matrix, and the
            # validity counts become elementwise rect intersections on
            # int vectors.
            lanes = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
            onehots = [(lanes == k).astype(jnp.float32)
                       for k in range(b)]
            onehots_i = [(lanes == k).astype(jnp.int32)
                         for k in range(b)]

            def to_vec(vals, dtype):
                v = jnp.full((1, b), vals[0], dtype)
                for k in range(1, b):
                    v = jnp.where(lanes == k,
                                  jnp.asarray(vals[k]).astype(dtype), v)
                return v

            h00v = to_vec([setups[k][4][0] for k in range(b)],
                          jnp.float32)
            h01v = to_vec([setups[k][4][1] for k in range(b)],
                          jnp.float32)
            h11v = to_vec([setups[k][4][2] for k in range(b)],
                          jnp.float32)
            detv = to_vec([setups[k][4][3] for k in range(b)],
                          jnp.float32)
            refr = [to_vec([setups[k][7][i] for k in range(b)],
                           jnp.int32) for i in range(4)]
            gi = jax.lax.broadcasted_iota(jnp.int32, (16 * b, b), 0)
            gc = jax.lax.broadcasted_iota(jnp.int32, (16 * b, b), 1)
            blocksum = ((gi >> 4) == gc).astype(jnp.float32)

            def vec_iter(c):
                xv, yv, stv, lastv, cntv, donev = c
                # Static scalar extraction (v[0, k]) measured cheap on
                # Mosaic (static value slicing is legal; see the op-cost
                # notes in the module docstring) — the one-hot
                # multiply+sum alternative costs ~19ns per reduce x 2b
                # per iteration, a meaningful share of the per-feature
                # advance budget.
                xs_c = [xv[0, k] for k in range(b)]
                ys_c = [yv[0, k] for k in range(b)]
                cs0m, cs1m, rects = qdt_fold(xs_c, ys_c)
                out2 = _place_exact(
                    jnp.concatenate([cs0m, cs1m], axis=0), blocksum,
                    precise)                                  # [2, b]
                b0v = -out2[0:1]
                b1v = -out2[1:2]
                cur = [to_vec([rects[k][i] for k in range(b)],
                              jnp.int32) for i in range(4)]
                rowcnt = jnp.maximum(
                    0, jnp.minimum(cur[1], refr[1])
                    - jnp.maximum(cur[0], refr[0]) + 1)
                colcnt = jnp.maximum(
                    0, jnp.minimum(cur[3], refr[3])
                    - jnp.maximum(cur[2], refr[2]) + 1)
                nvv = rowcnt * colcnt
                vxv = (h11v * b0v - h01v * b1v) / detv
                vyv = (h00v * b1v - h01v * b0v) / detv
                upd, stv, lastv, cntv, done_b = _advance(
                    donev != 0, stv, lastv, cntv, [vxv, vyv], nvv, opts)
                # done travels as an int32 lane vector: Mosaic rejects
                # materializing i1 vectors ("unsupported target
                # bitwidth for truncation"); comparisons/masks are fine.
                return (jnp.where(upd, xv + vxv, xv),
                        jnp.where(upd, yv + vyv, yv),
                        stv, lastv, cntv, done_b.astype(jnp.int32))

            carry0v = (jnp.int32(0),
                       to_vec(xs, jnp.float32), to_vec(ys, jnp.float32),
                       to_vec([_status0(setups[k][5]) for k in range(b)],
                              jnp.int32),
                       jnp.full((1, b), jnp.inf, jnp.float32),
                       jnp.zeros((1, b), jnp.int32),
                       to_vec([setups[k][5] for k in range(b)],
                              jnp.int32))

            def vcond(c):
                return ((c[0] < opts.max_iterations)
                        & jnp.logical_not(jnp.all(c[6] != 0)))

            def vstep(c):
                return (c[0] + 1,) + vec_iter(c[1:])

            fin = jax.lax.while_loop(vcond, vstep, carry0v)
            xvf, yvf, stvf = fin[1], fin[2], fin[3]
            return ([jnp.sum(xvf * onehots[k]) for k in range(b)],
                    [jnp.sum(yvf * onehots[k]) for k in range(b)],
                    [jnp.sum(stvf * onehots_i[k]) for k in range(b)])

        def iter_body(_, carry):
            xs_c = [carry[6 * k] for k in range(b)]
            ys_c = [carry[6 * k + 1] for k in range(b)]
            if bias_mode == "qdt":
                pre = qdt_pre(carry, xs_c, ys_c)
                return advance_all(pre)
            if bias_mode != "slow":
                # ONE stacked contraction computes every feature's
                # column-interpolated window: U_all[24k+r, 16k+j] is
                # feature k's sample column j at window row r (the
                # off-diagonal blocks are never read).
                u_all, loads, _ = smp.stacked_samples(cur_imgs[lvl],
                                                      xs_c, ys_c)
            else:
                loads = [smp.load_window(cur_imgs[lvl], xs_c[k], ys_c[k])
                         for k in range(b)]

            pre = []
            for k in range(b):
                x, y, status, last_sq, cnt, done = (
                    carry[6 * k:6 * k + 6])
                d_aug, ref_rect = setups[k][6:8]
                cwin, cwr0, cwc0 = loads[k]

                if bias_mode == "qpf":
                    # Per-feature q/dt fold (round 4): ONE small matmul
                    # Q = RW_16 @ U_k row-contracts the column-sampled
                    # window into the row-masked patch — replacing the
                    # identity path's [24, 64] a-matmul AND absorbing
                    # U_k's 16k lane offset (the matmul output is
                    # canonical, so the dt arithmetic below runs at
                    # offset 0 with no relayout). The bias then needs
                    # only 2 reduce chains over [16, 16] instead of 4
                    # over [24, 64]; dt = Q - inner is small-magnitude.
                    inner16, dx16, dy16 = setups[k][6]
                    min_r = jnp.floor(y).astype(jnp.int32) - smp.pr // 2
                    min_c = jnp.floor(x).astype(jnp.int32) - smp.pc // 2
                    ci_lo = jnp.maximum(0, -min_r)
                    ci_hi = jnp.minimum(smp.pr - 1,
                                        smp.img_h - 2 - min_r)
                    cj_lo = jnp.maximum(0, -min_c)
                    cj_hi = jnp.minimum(smp.pc - 1,
                                        smp.img_w - 2 - min_c)
                    ly0 = y - smp.pr // 2 - cwr0.astype(jnp.float32)
                    rwt16 = smp.row_weights_16(ly0, ci_lo, ci_hi)
                    u16 = u_all[wr * k:wr * (k + 1),
                                16 * k:16 * k + 16]
                    q = _xdot(rwt16, u16, ((1,), (0,)),
                              precise)                        # [16, 16]
                    ii = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 0)
                    jj = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 1)
                    curm = ((ii >= ci_lo) & (ii <= ci_hi)
                            & (jj >= cj_lo) & (jj <= cj_hi))
                    dtm = jnp.where(curm, q - inner16, 0.0)
                    b0 = -jnp.sum(dx16 * dtm)
                    b1 = -jnp.sum(dy16 * dtm)
                    ri_lo, ri_hi, rj_lo, rj_hi = ref_rect
                    num_valid = (
                        jnp.maximum(0, jnp.minimum(ci_hi, ri_hi)
                                    - jnp.maximum(ci_lo, ri_lo) + 1)
                        * jnp.maximum(0, jnp.minimum(cj_hi, rj_hi)
                                      - jnp.maximum(cj_lo, rj_lo) + 1))
                elif bias_mode == "identity":
                    # Masked trace identity — EXACT reference semantics
                    # with no branch: the dt mask (cur validity & ref
                    # validity) is a separable rectangle, so it folds
                    # into the row weights (i-mask on rwT) and one lane
                    # mask on the stacked gradient block:
                    #   b = sum(A[:, E-blocks] - A[:, D-blocks] * U)
                    # using sum_r rwT[r, i] = 1 for unmasked taps (hat
                    # weights are a partition of unity inside the
                    # window, which _geometry guarantees covers every
                    # valid tap). The four reduce chains per feature
                    # are the measured largest per-iteration cost, but
                    # both alternatives measure SLOWER: stacked
                    # matmul-reductions (each extra MXU issue carries
                    # ~20-35ns fixed overhead at these shapes) and
                    # fused subtract-then-sum (the three operands sit at
                    # different lane offsets, so the subtract inserts
                    # lane-rotate relayouts costlier than the sums).
                    min_r = jnp.floor(y).astype(jnp.int32) - smp.pr // 2
                    min_c = jnp.floor(x).astype(jnp.int32) - smp.pc // 2
                    ci_lo = jnp.maximum(0, -min_r)
                    ci_hi = jnp.minimum(smp.pr - 1,
                                        smp.img_h - 2 - min_r)
                    cj_lo = jnp.maximum(0, -min_c)
                    cj_hi = jnp.minimum(smp.pc - 1,
                                        smp.img_w - 2 - min_c)
                    ly0 = y - smp.pr // 2 - cwr0.astype(jnp.float32)
                    rwt = smp.row_weights_t(ly0, ci_lo, ci_hi)
                    j16 = jax.lax.broadcasted_iota(jnp.int32, (1, 64),
                                                   1) & 15
                    colmask = ((j16 >= cj_lo)
                               & (j16 <= cj_hi)).astype(jnp.float32)
                    a = _xdot(rwt, d_aug * colmask, ((1,), (0,)),
                              precise)                       # [24, 64]
                    u16 = u_all[wr * k:wr * (k + 1),
                                16 * k:16 * k + 16]
                    b0 = jnp.sum(a[:, 32:48]) - jnp.sum(a[:, :16] * u16)
                    b1 = (jnp.sum(a[:, 48:64])
                          - jnp.sum(a[:, 16:32] * u16))
                    ri_lo, ri_hi, rj_lo, rj_hi = ref_rect
                    num_valid = (
                        jnp.maximum(0, jnp.minimum(ci_hi, ri_hi)
                                    - jnp.maximum(ci_lo, ri_lo) + 1)
                        * jnp.maximum(0, jnp.minimum(cj_hi, rj_hi)
                                      - jnp.maximum(cj_lo, rj_lo) + 1))
                else:
                    b0, b1, num_valid = slow_bias(k, cwin, cwr0, cwc0,
                                                  x, y)
                pre.append((x, y, status, last_sq, cnt, done,
                            num_valid, b0, b1))
            return advance_all(pre)

        carry0 = []
        for k in range(b):
            no_pixels = setups[k][5]
            carry0.extend([xs[k], ys[k], _status0(no_pixels),
                           jnp.float32(jnp.inf), jnp.int32(0), no_pixels])

        def cond(c):
            i = c[0]
            all_done = c[1 + 5]
            for k in range(1, b):
                all_done = all_done & c[1 + 6 * k + 5]
            return (i < opts.max_iterations) & jnp.logical_not(all_done)

        def step(c):
            return (c[0] + 1,) + iter_body(c[0], c[1:])

        final = jax.lax.while_loop(cond, step,
                                   (jnp.int32(0),) + tuple(carry0))[1:]
        return ([final[6 * k] for k in range(b)],
                [final[6 * k + 1] for k in range(b)],
                [final[6 * k + 2] for k in range(b)])

    def one_batch(bi, _):
        f0 = bi * batch
        scale = 1.0 / float(1 << (levels - 1))
        rxs = [ref_x[f0 + k] * scale for k in range(batch)]
        rys = [ref_y[f0 + k] * scale for k in range(batch)]
        xs = [cur_x[f0 + k] * scale for k in range(batch)]
        ys = [cur_y[f0 + k] * scale for k in range(batch)]
        # Coarse-to-fine, coordinates doubled between levels
        # (reference: basic_klt.cpp:10,44-45); status is rewritten per
        # level, the last (finest) level's wins.
        sts = None
        for lvl in range(levels - 1, -1, -1):
            xs, ys, sts = track_level_batch(lvl, rxs, rys, xs, ys)
            if lvl > 0:
                rxs = [v * 2.0 for v in rxs]
                rys = [v * 2.0 for v in rys]
                xs = [v * 2.0 for v in xs]
                ys = [v * 2.0 for v in ys]
        for k in range(batch):
            @pl.when(tile_base + f0 + k < n_features)
            def _(k=k):
                out_x[f0 + k] = xs[k]
                out_y[f0 + k] = ys[k]
                out_status[f0 + k] = sts[k]
        return 0

    jax.lax.fori_loop(0, TILE // batch, one_batch, 0)


def _geometry(opts: KltOptions, img):
    """Padded-image geometry for one level: a STACKED 2-plane image
    [2*hp, wp] whose second plane is the 64-column-shifted copy.

    The clamps in load_window must never exclude a VALID tap. For any
    float center, valid rows exist only while floor(y) <= h-2+pr//2; the
    natural aligned anchor there is floor8(h-2+pad), so
    hp >= h + pad + SWIN_R - 2 keeps the upper clamp inactive whenever
    valid rows exist (SWIN_R = the larger, setup window). Columns: the
    effective anchor has 64-px granularity (plane select), the clamp
    sits at wp-65, and wp >= w + pad + 64 keeps it inactive while valid
    columns exist; 128 lanes then cover anchor offset (<= 63) plus the
    17 bilinear taps. The lower clamp needs pad >= ex_patch + 1."""
    pad = max(opts.ex_patch_rows, opts.ex_patch_cols) + 3
    swin_r = _round8(opts.ex_patch_rows + 1 + 7)
    h, w = img.shape
    hp = _round8(max(h + pad + swin_r - 2, swin_r))
    wp = ((max(w + 2 * pad + 64, 2 * WIN_C) + 127) // 128) * 128
    padded = jnp.pad(img, ((pad, hp - h - pad), (pad, wp + 64 - w - pad)))
    stacked = jnp.concatenate([padded[:, :wp], padded[:, 64:wp + 64]],
                              axis=0)
    return stacked, (h, w, hp, wp), pad


@functools.partial(jax.jit,
                   static_argnames=("opts", "interpret", "use_identity",
                                    "bias_mode", "batch"))
def track_pyramid_fast_pallas(opts: KltOptions, ref_pyramid, cur_pyramid,
                              ref_uv, cur_uv, interpret: bool = False,
                              use_identity: bool | None = None,
                              bias_mode: str | None = None,
                              batch: int = BATCH):
    """Whole-pyramid fast-mode tracker in ONE kernel launch.

    Returns (uv [N,2] full-resolution, status [N] int8). Skip handling
    and the final outside check are applied by the caller.

    ``bias_mode`` selects the per-iteration bias formulation:
      - ``"qpf"``: PER-FEATURE q/dt fold (round 4) — one small
        [16, win_r] x [win_r, 16] matmul row-contracts each feature's
        column-sampled window into the row-masked patch Q (absorbing
        U_k's lane offset into the matmul's canonical output), then
        bias = -sum(grad * (Q - inner)) over the cur-validity rectangle:
        2 reduce chains over [16, 16] instead of identity's 4 over
        [24, 64]; scalar advance chains.
      - ``"qdtv"``: the q/dt fold + VECTOR-LANE advance — per-feature
        GN state lives in [1, batch] lane vectors, one VPU op advances
        the whole interleave, bias lane sums via one block-sum matmul;
        only the 2*batch window-load anchors round-trip to scalars.
      - ``"qdt"``: the stacked q/dt fold — one block-diagonal
        contraction samples every interleaved feature's row-masked
        patch (+ exact row mask via an appended ones column), bias from
        the small-magnitude residual dt; scalar advance chains.
      - ``"identity"``: round-2 per-feature masked trace identity
        (compiled default until the r3 folds are timed on-chip).
      - ``"slow"`` (interpret default): reference-ordered masked-patch
        arithmetic for bit-meaningful parity tests.
    ``use_identity`` is the legacy boolean alias (True -> "identity",
    False -> "slow"). The blocked paths' 16-lane layouts require patch
    rows/cols <= 16; wider patches fall back to "slow"."""
    if bias_mode is None:
        if use_identity is not None:
            bias_mode = "identity" if use_identity else "slow"
        elif (not interpret and opts.patch_cols <= 16
              and opts.patch_rows <= 16):
            # "identity" stays the compiled default: the r3 folds were
            # timed on the real chip (2026-08-18, 10240 feats x 4
            # levels) and ALL lose to it — identity b4 36.7 ms vs
            # qdt b4 43.0 / b8 43.8, qdtv b4 48.1 / b8 40.3 / b16 57.4.
            # The r4 reworks lose too (see the module header ablation
            # list): qpf b4 38.0, broadcast-matmul qdt b4/b8 51.3/51.0,
            # qdtv b8/b16 47.7/53.3. The block-diagonal fold matmuls
            # grow quadratically in the interleave width while only the
            # diagonal is read, and any formulation whose per-feature
            # matmul depends on the stacked contraction serializes what
            # identity overlaps.
            bias_mode = "identity"
        else:
            bias_mode = "slow"
    if bias_mode not in ("qpf", "qdtv", "qdt", "identity", "slow"):
        raise ValueError(f"unknown bias_mode {bias_mode!r}")
    _check_patch_limits(opts, "track_pyramid_fast_pallas")
    if bias_mode != "slow" and (opts.patch_cols > 16
                                or opts.patch_rows > 16):
        raise ValueError(
            f"bias_mode={bias_mode!r} requires patch rows/cols <= 16 "
            f"(16-lane block layout); got "
            f"{opts.patch_rows}x{opts.patch_cols}. Pass "
            f"bias_mode='slow'.")
    if TILE % batch != 0:
        raise ValueError(f"batch ({batch}) must divide TILE ({TILE})")
    levels = len(ref_pyramid)
    n = ref_uv.shape[0]
    n_pad = ((n + TILE - 1) // TILE) * TILE
    # Positions travel as separate 1D x/y arrays: 2D SMEM blocks get
    # lane-padded to 128 and blow the scalar-memory budget.
    vecs = [jnp.pad(v, (0, n_pad - n))
            for v in (ref_uv[:, 0], ref_uv[:, 1], cur_uv[:, 0],
                      cur_uv[:, 1])]

    imgs = []
    shapes = []
    pad = None
    for img in tuple(ref_pyramid) + tuple(cur_pyramid):
        padded, shape, pad = _geometry(opts, img)
        imgs.append(padded)
        shapes.append(shape)
    shapes = tuple(shapes[:levels])

    kernel = functools.partial(_kernel, opts=opts, shapes=shapes, pad=pad,
                               n_features=n, precise=interpret,
                               bias_mode=bias_mode, batch=batch)
    smem_vec = _smem_vec()
    out_x, out_y, status = pl.pallas_call(
        kernel,
        grid=(n_pad // TILE,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * levels)
        + [smem_vec] * 4,
        out_specs=(smem_vec, smem_vec, smem_vec),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad,), jnp.float32),
            jax.ShapeDtypeStruct((n_pad,), jnp.float32),
            jax.ShapeDtypeStruct((n_pad,), jnp.int32),
        ),
        interpret=interpret,
    )(*imgs, *vecs)
    return (jnp.stack([out_x[:n], out_y[:n]], axis=-1),
            status[:n].astype(jnp.int8))


@functools.partial(jax.jit, static_argnames=("opts", "interpret"))
def track_level_fast_pallas(opts: KltOptions, ref_img, cur_img, ref_uv,
                            cur_uv, interpret: bool = False):
    """Single-level fast-mode tracker (the 1-level pyramid case)."""
    return track_pyramid_fast_pallas(opts, (ref_img,), (cur_img,), ref_uv,
                                     cur_uv, interpret=interpret)


def _iter_kernel(*refs, opts: KltOptions, shapes, pad: int,
                 n_features: int, precise: bool, inverse: bool,
                 batch: int = BATCH):
    """DIRECT/INVERSE basic-KLT modes on-chip (round 4).

    Per-iteration H/b rebuild semantics of basic_klt.cpp:88-204, mapped
    onto the fast kernel's machinery:
     - ONE extended-patch const-weight sample yields the center patch
       AND all four +-1 gradient shifts (they share the anchor's
       fractional weights) — for INVERSE the ref-side sample is
       level-setup-hoisted (gradients fixed); DIRECT re-samples the cur
       extended patch each iteration and reads curv from its center.
     - The combined validity (4 gradient shifts ∩ ref ∩ cur) is an
       intersection of separable rectangles: one closed-form rect per
       iteration masks the products and gives num_valid.
     - The break machine is engine.py's non-divergence-counter variant:
       incoming status preserved, per-iteration OUTSIDE break on the
       updated position (run_klt_iterations(..., divergence_counter=
       False) semantics)."""
    levels = len(shapes)
    ref_imgs = refs[:levels]
    cur_imgs = refs[levels:2 * levels]
    (ref_x, ref_y, cur_x, cur_y, st_in,
     out_x, out_y, out_status) = refs[2 * levels:]
    tile_base = pl.program_id(0) * TILE
    epr, epc = opts.ex_patch_rows, opts.ex_patch_cols
    samplers = [_RigidSampler(opts, h, w, pad, hp, wp, precise=precise)
                for (h, w, hp, wp) in shapes]
    ex_samplers = [_RigidSampler(opts, h, w, pad, hp, wp,
                                 rows=epr, cols=epc, precise=precise)
                   for (h, w, hp, wp) in shapes]

    def ex_patches_batch(exs, imgs, xs, ys, b):
        """Stacked extended-patch extraction (UNMASKED; masking happens
        at use time through the combined rect)."""
        uex_all, exloads, exstride = exs.stacked_samples(imgs, xs, ys)
        out = []
        for k in range(b):
            _, wr0, wc0 = exloads[k]
            ly0 = ys[k] - exs.pr // 2 - wr0.astype(jnp.float32)
            rw = jnp.maximum(
                0.0, 1.0 - jnp.abs(ly0 + exs.r_i.astype(jnp.float32)
                                   - exs.r_r.astype(jnp.float32)))
            uex = uex_all[exs.win_r * k:exs.win_r * (k + 1),
                          exstride * k:exstride * k + exs.pc]
            out.append(_xdot(rw, uex, ((1,), (0,)), precise))
        return out

    def track_level_batch(lvl, rxs, rys, xs, ys, sts):
        smp = samplers[lvl]
        exs = ex_samplers[lvl]
        b = len(rxs)
        img_h, img_w = smp.img_h, smp.img_w
        pr, pc = smp.pr, smp.pc

        # Level setup: ref extended patches (refv; + fixed gradients for
        # INVERSE) and the fixed scalar rect anchors.
        ex_refs = ex_patches_batch(exs, ref_imgs[lvl], rxs, rys, b)
        setups = []
        for k in range(b):
            exr = ex_refs[k]
            refv = exr[1:-1, 1:-1]
            if inverse:
                fx0 = exr[1:-1, 2:] - exr[1:-1, :-2]
                fy0 = exr[2:, 1:-1] - exr[:-2, 1:-1]
            else:
                fx0 = fy0 = None
            r_min_r = jnp.floor(rys[k]).astype(jnp.int32) - pr // 2
            r_min_c = jnp.floor(rxs[k]).astype(jnp.int32) - pc // 2
            setups.append((refv, fx0, fy0, r_min_r, r_min_c))

        def body(carry):
            xs_c = [carry[4 * k] for k in range(b)]
            ys_c = [carry[4 * k + 1] for k in range(b)]
            if not inverse:
                ex_curs = ex_patches_batch(exs, cur_imgs[lvl], xs_c, ys_c,
                                           b)
            else:
                loads = [smp.load_window(cur_imgs[lvl], xs_c[k], ys_c[k])
                         for k in range(b)]
            out = []
            for k in range(b):
                x, y, status, done = carry[4 * k:4 * (k + 1)]
                refv, fx0, fy0, r_min_r, r_min_c = setups[k]
                c_min_r = jnp.floor(y).astype(jnp.int32) - pr // 2
                c_min_c = jnp.floor(x).astype(jnp.int32) - pc // 2
                if inverse:
                    cwin, cwr0, cwc0 = loads[k]
                    curv, _ = smp.sample(cwin, cwr0, cwc0, x, y)
                    fx, fy = fx0, fy0
                    g_min_r, g_min_c = r_min_r, r_min_c
                else:
                    exc = ex_curs[k]
                    curv = exc[1:-1, 1:-1]
                    fx = exc[1:-1, 2:] - exc[1:-1, :-2]
                    fy = exc[2:, 1:-1] - exc[:-2, 1:-1]
                    g_min_r, g_min_c = c_min_r, c_min_c

                # Combined validity rectangle (patch coordinates):
                # gradient shifts need anchors in [1, dim-3], ref/cur
                # patches in [0, dim-2] (optical_flow.cpp:68,73 bound).
                ilo = jnp.maximum(jnp.maximum(1 - g_min_r, -r_min_r),
                                  jnp.maximum(-c_min_r, 0))
                ihi = jnp.minimum(
                    jnp.minimum(img_h - 3 - g_min_r, img_h - 2 - r_min_r),
                    jnp.minimum(img_h - 2 - c_min_r, pr - 1))
                jlo = jnp.maximum(jnp.maximum(1 - g_min_c, -r_min_c),
                                  jnp.maximum(-c_min_c, 0))
                jhi = jnp.minimum(
                    jnp.minimum(img_w - 3 - g_min_c, img_w - 2 - r_min_c),
                    jnp.minimum(img_w - 2 - c_min_c, pc - 1))
                m = ((smp.v_i >= ilo) & (smp.v_i <= ihi)
                     & (smp.v_j >= jlo) & (smp.v_j <= jhi))
                fx_m = jnp.where(m, fx, 0.0)
                fy_m = jnp.where(m, fy, 0.0)
                ft = jnp.where(m, curv - refv, 0.0)
                h00 = jnp.sum(fx_m * fx_m)
                h01 = jnp.sum(fx_m * fy_m)
                h11 = jnp.sum(fy_m * fy_m)
                b0 = -jnp.sum(fx_m * ft)
                b1 = -jnp.sum(fy_m * ft)
                det = h00 * h11 - h01 * h01
                vx = (h11 * b0 - h01 * b1) / det
                vy = (h00 * b1 - h01 * b0) / det
                num_valid = (jnp.maximum(0, ihi - ilo + 1)
                             * jnp.maximum(0, jhi - jlo + 1))

                # engine.py non-divergence break machine + OUTSIDE break.
                no_valid = num_valid == 0
                isnan = jnp.isnan(vx) | jnp.isnan(vy)
                sq = vx * vx + vy * vy
                do_update = jnp.logical_not(done | no_valid | isnan)
                nx = jnp.where(do_update, x + vx, x)
                ny = jnp.where(do_update, y + vy, y)
                outside = ((nx < 0) | (nx > img_w - 1)
                           | (ny < 0) | (ny > img_h - 1))
                extra_break = do_update & outside
                converged = (do_update & (sq < opts.max_converge_step)
                             & jnp.logical_not(extra_break))
                new_status = jnp.where(
                    isnan & jnp.logical_not(done | no_valid),
                    jnp.int32(int(TrackStatus.NUMERIC_ERROR)),
                    jnp.where(extra_break,
                              jnp.int32(int(TrackStatus.OUTSIDE)),
                              jnp.where(converged,
                                        jnp.int32(int(
                                            TrackStatus.TRACKED)),
                                        status)))
                status = jnp.where(done, status, new_status)
                done = done | no_valid | isnan | converged | extra_break
                out.extend([nx, ny, status, done])
            return tuple(out)

        carry0 = []
        for k in range(b):
            carry0.extend([xs[k], ys[k], sts[k], jnp.bool_(False)])

        def cond(c):
            all_done = c[1 + 3]
            for k in range(1, b):
                all_done = all_done & c[1 + 4 * k + 3]
            return (c[0] < opts.max_iterations) & jnp.logical_not(all_done)

        def step(c):
            return (c[0] + 1,) + body(c[1:])

        final = jax.lax.while_loop(cond, step,
                                   (jnp.int32(0),) + tuple(carry0))[1:]
        return ([final[4 * k] for k in range(b)],
                [final[4 * k + 1] for k in range(b)],
                [final[4 * k + 2] for k in range(b)])

    def one_batch(bi, _):
        f0 = bi * batch
        scale = 1.0 / float(1 << (levels - 1))
        rxs = [ref_x[f0 + k] * scale for k in range(batch)]
        rys = [ref_y[f0 + k] * scale for k in range(batch)]
        xs = [cur_x[f0 + k] * scale for k in range(batch)]
        ys = [cur_y[f0 + k] * scale for k in range(batch)]
        sts = [st_in[f0 + k] for k in range(batch)]
        for lvl in range(levels - 1, -1, -1):
            xs, ys, sts = track_level_batch(lvl, rxs, rys, xs, ys, sts)
            if lvl > 0:
                rxs = [v * 2.0 for v in rxs]
                rys = [v * 2.0 for v in rys]
                xs = [v * 2.0 for v in xs]
                ys = [v * 2.0 for v in ys]
        for k in range(batch):
            @pl.when(tile_base + f0 + k < n_features)
            def _(k=k):
                out_x[f0 + k] = xs[k]
                out_y[f0 + k] = ys[k]
                out_status[f0 + k] = sts[k]
        return 0

    jax.lax.fori_loop(0, TILE // batch, one_batch, 0)


@functools.partial(jax.jit,
                   static_argnames=("opts", "interpret", "batch"))
def track_pyramid_iter_pallas(opts: KltOptions, ref_pyramid, cur_pyramid,
                              ref_uv, cur_uv, status,
                              interpret: bool = False,
                              batch: int = BATCH):
    """Whole-pyramid DIRECT/INVERSE-mode tracker in ONE kernel launch.

    Mirrors the jnp _iterative_one semantics (trackers/klt/basic.py):
    per-iteration H/b rebuild, incoming status preserved, per-iteration
    OUTSIDE break, no divergence counter. Skip handling and the final
    outside check stay in the caller."""
    from feature_tracker_tpu.core.config import KltMethod

    _check_patch_limits(opts, "track_pyramid_iter_pallas")
    inverse = opts.method == KltMethod.INVERSE
    levels = len(ref_pyramid)
    n = ref_uv.shape[0]
    n_pad = ((n + TILE - 1) // TILE) * TILE
    vecs = [jnp.pad(v, (0, n_pad - n))
            for v in (ref_uv[:, 0], ref_uv[:, 1], cur_uv[:, 0],
                      cur_uv[:, 1], status.astype(jnp.int32))]

    imgs = []
    shapes = []
    pad = None
    for img in tuple(ref_pyramid) + tuple(cur_pyramid):
        padded, shape, pad = _geometry(opts, img)
        imgs.append(padded)
        shapes.append(shape)
    shapes = tuple(shapes[:levels])

    kernel = functools.partial(_iter_kernel, opts=opts, shapes=shapes,
                               pad=pad, n_features=n, precise=interpret,
                               inverse=inverse, batch=batch)
    smem_vec = _smem_vec()
    out_x, out_y, out_st = pl.pallas_call(
        kernel,
        grid=(n_pad // TILE,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * levels)
        + [smem_vec] * 5,
        out_specs=(smem_vec, smem_vec, smem_vec),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad,), jnp.float32),
            jax.ShapeDtypeStruct((n_pad,), jnp.float32),
            jax.ShapeDtypeStruct((n_pad,), jnp.int32),
        ),
        interpret=interpret,
    )(*imgs, *vecs)
    return (jnp.stack([out_x[:n], out_y[:n]], axis=-1),
            out_st[:n].astype(jnp.int8))


def pallas_available() -> bool:
    """True when running on a real TPU backend (the compiled kernel);
    tests use interpret mode on CPU."""
    return jax.default_backend() == "tpu"
