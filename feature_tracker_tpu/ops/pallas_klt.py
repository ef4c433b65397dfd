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

Performance notes (round 2 rework):
 - Patches are separable constant-weight contractions of an aligned
   window: ``patch = RW @ (WIN · CW^T)`` with hat-weight selection
   matrices — tile-aligned loads with the sub-tile offset absorbed by the
   interpolation weights (roll-free; Mosaic's dynamic sublane rotate
   miscompiles for several shift/shape combos).
 - Columns contract FIRST: ``u = WIN[24,256] · CW^T -> [24, pc]`` then
   ``RW[pr,24] @ u`` — ~2x fewer MXU block-ops than the row-first order
   because the wide (256-lane) contraction runs once, not twice.
 - The compiled path replaces 6-pass ``Precision.HIGHEST`` matmuls with
   an explicit 3-pass split-bfloat16 product (hi/lo decomposition of both
   operands, lo x lo dropped): ~1e-3 gray-level accuracy on 0..255
   imagery (vs ~0.3 gray for single-pass bf16 — enough to break the
   |v|^2 < 4e-2 convergence threshold) at half the MXU issue count.
   Interpret mode keeps exact float32 so the parity tests compare
   bit-meaningfully against the jnp path; split-vs-f32 error has its own
   numeric test (tests/test_pallas_klt.py).
 - Iteration windows are [24, 256] (patch rows 16 + sublane alignment 7),
   setup windows [32, 256] (extended patch rows 18 + 7); the padded-image
   geometry guarantees every VALID tap is covered by the clamped aligned
   load for any float position (see _geometry).
 - Features interleave in batches of 8 independent scalar GN chains so
   the small matmuls pipeline; the batch shares one early-exiting
   ``while_loop`` (typical convergence: 2-5 of the 15 iterations).

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
    _status0,
)

WIN_C = 256  # window lanes: patch cols 16 + 128-aligned anchor offset


def _split2(x):
    """Exact-leading hi/lo bfloat16 decomposition of a float32 array."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _xdot(a, b, dims, precise: bool):
    """dot_general with either exact f32 (interpret / parity) or the
    3-pass split-bf16 product (compiled TPU path)."""
    dn = (dims, ((), ()))
    if precise:
        return jax.lax.dot_general(a, b, dn,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
    ah, al = _split2(a)
    bh, bl = _split2(b)

    def d(p, q):
        return jax.lax.dot_general(p, q, dn,
                                   preferred_element_type=jnp.float32)

    return d(ah, bh) + d(ah, bl) + d(al, bh)


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
        pr, pc = self.pr, self.pc
        self.r_i = jax.lax.broadcasted_iota(jnp.int32, (pr, self.win_r), 0)
        self.r_r = jax.lax.broadcasted_iota(jnp.int32, (pr, self.win_r), 1)
        self.c_j = jax.lax.broadcasted_iota(jnp.int32, (pc, WIN_C), 0)
        self.c_c = jax.lax.broadcasted_iota(jnp.int32, (pc, WIN_C), 1)
        self.v_i = jax.lax.broadcasted_iota(jnp.int32, (pr, pc), 0)
        self.v_j = jax.lax.broadcasted_iota(jnp.int32, (pr, pc), 1)

    def load_window(self, img, center_x, center_y):
        """Aligned [win_r, WIN_C] window anchored at the patch start.
        _geometry guarantees the clamp never cuts off a VALID tap."""
        r_des = jnp.clip(
            jnp.floor(center_y).astype(jnp.int32) - self.pr // 2 + self.pad,
            0, self.hp - self.win_r)
        c_des = jnp.clip(
            jnp.floor(center_x).astype(jnp.int32) - self.pc // 2 + self.pad,
            0, self.wp - WIN_C)
        r8 = pl.multiple_of((r_des // 8) * 8, 8)
        c128 = pl.multiple_of((c_des // 128) * 128, 128)
        win = img[pl.ds(r8, self.win_r), pl.ds(c128, WIN_C)]
        return win, r8 - self.pad, c128 - self.pad

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
        u = _xdot(window, cw, ((1,), (1,)), self.precise)   # [win_r, pc]
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


def _kernel(*refs, opts: KltOptions, shapes, pad: int, n_features: int,
            precise: bool):
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

    def ref_setup(lvl, rx, ry):
        """Per-level reference quantities for one feature."""
        smp = samplers[lvl]
        exs = ex_samplers[lvl]
        window, wr0, wc0 = exs.load_window(ref_imgs[lvl], rx, ry)
        ex_patch, _ = exs.sample(window, wr0, wc0, rx, ry)
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
        return inner, inner_valid, dx, dy, (h00, h01, h11, det), n_ref == 0

    def track_level_batch(lvl, rxs, rys, xs, ys):
        """Fast-mode tracking of a BATCH of features at one level.

        The B features' chains are independent, so their small matmuls
        and window loads interleave — hiding the MXU/VPU latency that
        serializes a one-feature-at-a-time loop. Lists in, lists out."""
        smp = samplers[lvl]
        b = len(rxs)
        setups = [ref_setup(lvl, rxs[k], rys[k]) for k in range(b)]

        def iter_body(_, carry):
            out = []
            for k in range(b):
                x, y, status, last_sq, cnt, done = (
                    carry[6 * k:6 * k + 6])
                inner, inner_valid, dx, dy, (h00, h01, h11, det), _ = (
                    setups[k])
                cwin, cwr0, cwc0 = smp.load_window(cur_imgs[lvl], x, y)
                curv, okcur = smp.sample(cwin, cwr0, cwc0, x, y)
                valid = okcur & inner_valid
                dt = jnp.where(valid, curv - inner, 0.0)
                b0 = -jnp.sum(dx * dt)
                b1 = -jnp.sum(dy * dt)
                # Closed-form 2x2 solve (LDLT equivalent).
                vx = (h11 * b0 - h01 * b1) / det
                vy = (h00 * b1 - h01 * b0) / det
                num_valid = jnp.sum(valid.astype(jnp.int32))
                upd, status, last_sq, cnt, done = _advance(
                    done, status, last_sq, cnt, [vx, vy], num_valid, opts)
                out.extend([jnp.where(upd, x + vx, x),
                            jnp.where(upd, y + vy, y),
                            status, last_sq, cnt, done])
            return tuple(out)

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

    BATCH = 4

    def one_batch(bi, _):
        f0 = bi * BATCH
        scale = 1.0 / float(1 << (levels - 1))
        rxs = [ref_x[f0 + k] * scale for k in range(BATCH)]
        rys = [ref_y[f0 + k] * scale for k in range(BATCH)]
        xs = [cur_x[f0 + k] * scale for k in range(BATCH)]
        ys = [cur_y[f0 + k] * scale for k in range(BATCH)]
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
        for k in range(BATCH):
            @pl.when(tile_base + f0 + k < n_features)
            def _(k=k):
                out_x[f0 + k] = xs[k]
                out_y[f0 + k] = ys[k]
                out_status[f0 + k] = sts[k]
        return 0

    jax.lax.fori_loop(0, TILE // BATCH, one_batch, 0)


def _geometry(opts: KltOptions, img):
    """Padded-image geometry for one level.

    The clamp in load_window must never exclude a VALID tap. For any
    float center, valid rows exist only while floor(y) <= h-2+pr//2; the
    natural aligned anchor there is floor8(h-2+pad), so
    hp >= h + pad + SWIN_R - 2 keeps the upper clamp inactive whenever
    valid rows exist (SWIN_R = the larger, setup window). Columns the
    same with 128-alignment: wp >= w + pad + WIN_C - 127 - 2. The lower
    clamp needs pad >= ex_patch + 1."""
    pad = max(opts.ex_patch_rows, opts.ex_patch_cols) + 3
    swin_r = _round8(opts.ex_patch_rows + 1 + 7)
    h, w = img.shape
    hp = _round8(max(h + pad + swin_r - 2, swin_r))
    wp = ((max(w + pad + WIN_C - 129, WIN_C) + 127) // 128) * 128
    padded = jnp.pad(img, ((pad, hp - h - pad), (pad, wp - w - pad)))
    return padded, (h, w, hp, wp), pad


@functools.partial(jax.jit, static_argnames=("opts", "interpret"))
def track_pyramid_fast_pallas(opts: KltOptions, ref_pyramid, cur_pyramid,
                              ref_uv, cur_uv, interpret: bool = False):
    """Whole-pyramid fast-mode tracker in ONE kernel launch.

    Returns (uv [N,2] full-resolution, status [N] int8). Skip handling
    and the final outside check are applied by the caller."""
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
                               n_features=n, precise=interpret)
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


def pallas_available() -> bool:
    """True when running on a real TPU backend (the compiled kernel);
    tests use interpret mode on CPU."""
    return jax.default_backend() == "tpu"
