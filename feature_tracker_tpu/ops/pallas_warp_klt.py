"""Pallas TPU kernels for the affine and LSSD (SE(2)) fast-KLT trackers.

Unlike basic KLT, these warps sample the current image at per-pixel warped
positions (reference: affine_klt_fast.cpp:150-152, lssd_klt_fast.cpp), so
the constant-bilinear-weight window trick does not apply. Instead each
sample is expressed as a separable hat-weight contraction over a
VMEM-resident window W centered on the feature:

    S(p) = sum_{r,c} hat(ly_p - r) * W[r, c] * hat(lx_p - c)
         = rowsum( (Rw @ W) * Cw ),   hat(t) = max(0, 1 - |t|)

with Rw/Cw [P, WINDOW] built from iota — one MXU matmul + elementwise ops
per sample call, zero gathers. This is exactly bilinear interpolation for
any position inside the window; the window (32 px) leaves >= 5 px of slack
beyond the rotated patch diagonal, so any SE(2) warp and all
near-identity affine warps are covered (positions escaping the window are
masked invalid — a documented deviation from the reference, which samples
unboundedly; it only triggers for |A| far from identity).

Patch pixels live on a flattened [P_pad, 1] axis (Mosaic cannot reshape
unaligned 2D tiles); per-feature state travels as 1D SMEM scalars as in
pallas_klt.py. The 3x3/6x6 GN solves are unrolled scalar Cholesky —
matching the LDLT of the jnp path up to float noise, with NaN on singular
H feeding the NUMERIC_ERROR path identically.

Iteration semantics (masked break machine) are identical to
trackers/klt/engine.py fast mode; see pallas_klt.py for the contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from feature_tracker_tpu.core.config import KltOptions
from feature_tracker_tpu.core.status import TrackStatus

TILE = 1024
AFFINE_BATCH = 4  # interleaved per-feature GN chains per while_loop
LSSD_BATCH = 2    # (round 4; on-chip ablation: affine 103.7 -> 87.1 (b2)
                  # -> 83.7 ms (b4); LSSD 174.8 (b1) ~ 177.5 (b2) <
                  # 190.1 (b4) — LSSD is throughput-bound on its
                  # per-iteration matmul passes, not latency-bound)
WIN_R = 48        # aligned window rows (32 target + 8 offset, rounded)
WIN_C = 128       # window lanes: 32-px target + 64-granular anchor offset
                  # (the padded images carry a 64-column-shifted second
                  # plane, halving the flat-P sampling matmul vs a
                  # 256-lane window with 128-granular anchors)


def _round8(x):
    return ((x + 7) // 8) * 8


def _split2(x):
    """Exact-leading hi/lo bfloat16 decomposition of a float32 array."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _xdot(a, b, dims, precise: bool,
          a_exact: bool = False, b_exact: bool = False):
    """dot_general with either exact f32 (interpret / parity paths) or a
    3-pass split-bf16 product (compiled TPU path): hi/lo decomposition of
    both operands with the lo x lo term dropped — ~1e-3 gray-level
    accuracy on 0..255 imagery at half HIGHEST's MXU issue count (see
    pallas_klt.py's kernel notes and the split error-bound test).

    ``a_exact``/``b_exact`` declare an operand EXACTLY representable in
    bfloat16 (integers |x| <= 256 — e.g. uint8-truncated pyramid levels,
    0/+-1 one-hot extraction matrices): its lo part is identically zero,
    so the corresponding split pass multiplies a zero matrix and is
    dropped. Bit-identical to the 3-pass result, one fewer MXU pass."""
    dn = (dims, ((), ()))
    if precise:
        return jax.lax.dot_general(a, b, dn,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)

    def d(p, q):
        return jax.lax.dot_general(p, q, dn,
                                   preferred_element_type=jnp.float32)

    if a_exact:
        ah = a.astype(jnp.bfloat16)
        bh, bl = _split2(b)
        return d(ah, bh) + d(ah, bl)
    if b_exact:
        ah, al = _split2(a)
        bh = b.astype(jnp.bfloat16)
        return d(ah, bh) + d(al, bh)
    ah, al = _split2(a)
    bh, bl = _split2(b)
    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _chol_solve(h, b):
    """Unrolled scalar Cholesky solve; h is a list-of-lists (lower half
    used), b a list. Returns list x with H x = b; NaN if H not SPD."""
    return _chol_solve_factored(_chol_factor(h, len(b)), b)


def _chol_factor(h, n):
    """Unrolled scalar Cholesky factor (lower half of h used); NaN on a
    non-SPD h. Split from the solve so a setup-constant system (affine's
    per-level Hessian) factors ONCE instead of every GN iteration —
    arithmetic is bit-identical to the previous fused _chol_solve."""
    low = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            acc = h[i][j]
            for k in range(j):
                acc = acc - low[i][k] * low[j][k]
            if i == j:
                low[i][j] = jnp.sqrt(acc)
            else:
                low[i][j] = acc / low[j][j]
    return low


def _chol_solve_factored(low, b):
    n = len(b)
    y = [None] * n
    for i in range(n):
        acc = b[i]
        for k in range(i):
            acc = acc - low[i][k] * y[k]
        y[i] = acc / low[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        acc = y[i]
        for k in range(i + 1, n):
            acc = acc - low[k][i] * x[k]
        x[i] = acc / low[i][i]
    return x


class _Sampler:
    """Shared per-kernel machinery: aligned window loads and hat-weight
    sampling over a flattened patch grid.

    Round-3 layout: the flat patch axis P lives in LANES ([1, P_pad]
    rows), not sublanes. The round-2 [P_pad, 1] column layout paid ~22
    sublane-tile issues (at 1/128 lane utilization) for EVERY
    elementwise op and reduce in the iteration — the masks, dt, the
    6 bias terms, the jacobian products. In row layout those are 2-tile
    ops. Sampling contracts the window's COLUMN axis first
    (win @ cwT -> [WIN_R, P_pad]) so no operand needs a transpose; the
    row hat weights then reduce over sublanes."""

    def __init__(self, opts: KltOptions, img_h, img_w, pad, hp, wp,
                 rows=None, cols=None, precise: bool = True):
        self.precise = precise
        # Image operands are exactly representable in bf16 only when the
        # caller declares integer-valued imagery (quantize=True pyramids);
        # otherwise the samplers keep the full 3-pass split.
        self.img_exact = opts.integer_pyramid
        self.pr = opts.patch_rows if rows is None else rows
        self.pc = opts.patch_cols if cols is None else cols
        self.epr, self.epc = opts.ex_patch_rows, opts.ex_patch_cols
        self.p = self.pr * self.pc
        self.p_pad = _round8(self.p)
        self.img_h, self.img_w = img_h, img_w
        self.pad, self.hp, self.wp = pad, hp, wp

        pid = jax.lax.broadcasted_iota(jnp.int32, (1, self.p_pad), 1)
        self.p_mask = pid < self.p
        self.offx = jnp.where(
            self.p_mask, pid % self.pc - self.pc // 2, 0).astype(jnp.float32)
        self.offy = jnp.where(
            self.p_mask, pid // self.pc - self.pr // 2, 0).astype(jnp.float32)
        # tpu.iota only produces integers; cast to float after.
        self.row_sub = jax.lax.broadcasted_iota(
            jnp.int32, (WIN_R, self.p_pad), 0).astype(jnp.float32)
        self.col_sub = jax.lax.broadcasted_iota(
            jnp.int32, (WIN_C, self.p_pad), 0).astype(jnp.float32)

    def load_window(self, img, center_x, center_y):
        """Tile-aligned [WIN_R, WIN_C] window whose interior contains the
        32x32 neighborhood of the (float) center. No in-register rolls —
        the hat weights absorb the sub-tile offset (Mosaic's dynamic
        sublane rotate miscompiles for some shift/shape combinations).

        ``img`` is the STACKED padded image [2*hp, wp]: plane 1 holds the
        64-column-shifted copy, so the effective column-anchor
        granularity is 64 and 128 lanes always cover [center-16,
        center+48] — the same left margin as the previous 256-lane
        window, so the out-of-window masking behavior (the documented
        deviation for extreme warps) is unchanged for |warp| <= 16 px.
        Returns (window, wr0, wc0) with the origin in unpadded coords."""
        r_des = jnp.clip(
            jnp.floor(center_y).astype(jnp.int32) - 16 + self.pad,
            0, self.hp - 32)
        c_des = jnp.clip(
            jnp.floor(center_x).astype(jnp.int32) - 16 + self.pad,
            0, self.wp - 64)
        r8 = pl.multiple_of(
            jnp.minimum((r_des // 8) * 8, self.hp - WIN_R), 8)
        plane = (c_des // 64) & 1
        c128 = pl.multiple_of(
            jnp.minimum((c_des // 128) * 128, self.wp - WIN_C), 128)
        row0 = pl.multiple_of(plane * self.hp + r8, 8)
        win = img[pl.ds(row0, WIN_R), pl.ds(c128, WIN_C)]
        return win, r8 - self.pad, c128 + 64 * plane - self.pad

    def sample(self, window, wr0, wc0, pos_x, pos_y):
        """Hat-weight bilinear sample of [1, P_pad] positions from the
        window. Returns (value, valid) — valid combines the reference's
        global bound (floor in [0, dim-2]) with window coverage.

        Column contraction first: win @ cwT needs NO transposed operand
        (the contraction axis is the window's lane axis), then the row
        hat weights reduce over WIN_R sublanes."""
        lx = pos_x - wc0.astype(jnp.float32)            # [1, P_pad]
        ly = pos_y - wr0.astype(jnp.float32)
        rwt = jnp.maximum(0.0, 1.0 - jnp.abs(ly - self.row_sub))
        cwt = jnp.maximum(0.0, 1.0 - jnp.abs(lx - self.col_sub))
        # Single-pass bf16 rounding of the hat weights would cost
        # ~0.3 gray levels per sample — enough to break the
        # |v|^2 < 4e-2 convergence threshold on real imagery — so the
        # compiled path uses the 3-pass split product (exact f32 in
        # interpret mode).
        # Quantized pyramid levels are uint8-truncated integers (exact in
        # bf16): the window's lo split term is identically zero — 2-pass
        # split, gated on KltOptions.integer_pyramid.
        s = _xdot(window, cwt, ((1,), (0,)), self.precise,
                  a_exact=self.img_exact)                   # [WIN_R, P]
        val = jnp.sum(s * rwt, axis=0, keepdims=True)       # [1, P_pad]

        fx = jnp.floor(pos_x)
        fy = jnp.floor(pos_y)
        valid = ((fx >= 0) & (fx <= self.img_w - 2)
                 & (fy >= 0) & (fy <= self.img_h - 2)
                 & (jnp.floor(lx) >= 0) & (jnp.floor(lx) <= WIN_C - 2)
                 & (jnp.floor(ly) >= 0) & (jnp.floor(ly) <= WIN_R - 2)
                 & self.p_mask)
        return jnp.where(valid, val, 0.0), valid

    def rect_valid(self, rx, ry, lo: int, hi_off: int):
        """Closed-form rectangle validity of the rigid patch grid: the
        anchor of pixel p is floor(center) + integer offset, so validity
        is anchor row/col in [lo, dim - hi_off]."""
        rr = jnp.floor(ry).astype(jnp.int32) + self.offy.astype(jnp.int32)
        cc = jnp.floor(rx).astype(jnp.int32) + self.offx.astype(jnp.int32)
        return ((rr >= lo) & (rr <= self.img_h - hi_off)
                & (cc >= lo) & (cc <= self.img_w - hi_off) & self.p_mask)


def make_ref_extractors(opts: KltOptions):
    """Static one-hot matrices extracting the inner patch and its
    un-halved central-difference gradients from the FLAT extended-patch
    row in one matvec each (replaces 4 of the 5 hat-matmul samples in
    the reference setup). Transposed [EX_pad, P_pad] for the row
    layout: extract = ex_row @ mat."""
    import numpy as _np
    pr, pc = opts.patch_rows, opts.patch_cols
    epr, epc = opts.ex_patch_rows, opts.ex_patch_cols
    p_pad = _round8(pr * pc)
    ex_pad = _round8(epr * epc)

    def sel(dr, dc):
        m = _np.zeros((ex_pad, p_pad), _np.float32)
        for q in range(pr * pc):
            m[(q // pc + 1 + dr) * epc + (q % pc + 1 + dc), q] = 1.0
        return m

    return (jnp.asarray(sel(0, 0)),
            jnp.asarray(sel(0, 1) - sel(0, -1)),
            jnp.asarray(sel(1, 0) - sel(-1, 0)))


def ref_setup_shared(smp, exs, extractors, ref_img_pad, rx, ry):
    """Reference-patch quantities shared by both warp models: masked
    inner patch, un-halved central-difference gradients, validity, and
    the extended-patch valid count that drives the OUTSIDE status.

    ONE extended hat-matmul sample + three static extraction matvecs
    (the previous formulation paid five full hat-matmul samples)."""
    window, wr0, wc0 = exs.load_window(ref_img_pad, rx, ry)
    ex_flat, _ = exs.sample(window, wr0, wc0, rx + exs.offx,
                            ry + exs.offy)                  # [1, EX_pad]
    s_c_m, s_dx_m, s_dy_m = extractors

    def extract(mat):
        # 0/+-1 one-hot extraction matrices are exact in bf16.
        return _xdot(ex_flat, mat, ((1,), (0,)), smp.precise,
                     b_exact=True)                          # [1, P_pad]

    v_c = smp.rect_valid(rx, ry, 0, 2)
    gvalid = smp.rect_valid(rx, ry, 1, 3)
    s_c = jnp.where(v_c, extract(s_c_m), 0.0)
    dx = jnp.where(gvalid, extract(s_dx_m), 0.0)
    dy = jnp.where(gvalid, extract(s_dy_m), 0.0)

    # Valid-pixel count of the FULL extended patch: a clipped rectangle,
    # so the count is closed form (optical_flow.cpp:49-102 semantics).
    epr, epc = exs.pr, exs.pc
    fy = jnp.floor(ry).astype(jnp.int32)
    fx = jnp.floor(rx).astype(jnp.int32)
    lo_r = jnp.maximum(fy - epr // 2, 0)
    hi_r = jnp.minimum(fy - epr // 2 + epr - 1, smp.img_h - 2)
    lo_c = jnp.maximum(fx - epc // 2, 0)
    hi_c = jnp.minimum(fx - epc // 2 + epc - 1, smp.img_w - 2)
    n_valid_ref = (jnp.maximum(hi_r - lo_r + 1, 0)
                   * jnp.maximum(hi_c - lo_c + 1, 0))
    return s_c, v_c, dx, dy, n_valid_ref


def _stack_rows(rows, p_pad):
    """Stack [1, p_pad] vectors into an [8, p_pad] matrix (zero-filled
    past len(rows)) via sublane broadcasts + selects. Row-concatenation
    of vectors with mismatched internal layout offsets is rejected by
    Mosaic ('result/input offset mismatch on non-concat dimension');
    broadcast+select re-materializes each row at canonical layout."""
    assert len(rows) <= 8
    ri = jax.lax.broadcasted_iota(jnp.int32, (8, p_pad), 0)
    out = jnp.zeros((8, p_pad), jnp.float32)
    for k, r in enumerate(rows):
        out = jnp.where(ri == k, jnp.broadcast_to(r, (8, p_pad)), out)
    return out


def iterate_until_done(body, carry0, max_iterations: int):
    """Run ``body(i, carry) -> carry`` until done (the carry's last
    element) or the iteration bound. Inside the per-feature sequential
    loop this is a REAL early exit — typical features converge in 2-5 of
    the 15 iterations, which the vmapped jnp path cannot exploit."""
    def cond(c):
        return (c[0] < max_iterations) & jnp.logical_not(c[-1])

    def step(c):
        return (c[0] + 1,) + tuple(body(c[0], c[1:]))

    out = jax.lax.while_loop(cond, step, (jnp.int32(0),) + tuple(carry0))
    return out[1:]


def _status0(no_pixels):
    return jnp.where(no_pixels, jnp.int32(int(TrackStatus.OUTSIDE)),
                     jnp.int32(int(TrackStatus.LARGE_RESIDUAL)))


def _advance(carry_done, carry_status, carry_last, carry_cnt, v_list,
             num_valid, opts):
    """The shared fast-mode break machine (engine.py semantics). Returns
    (do_update, new_status, new_last, new_cnt, new_done)."""
    done, status, last_sq, cnt = (carry_done, carry_status, carry_last,
                                  carry_cnt)
    no_valid = num_valid == 0
    isnan = jnp.bool_(False)
    sq = jnp.float32(0.0)
    for v in v_list:
        isnan = isnan | jnp.isnan(v)
        sq = sq + v * v
    do_update = jnp.logical_not(done | no_valid | isnan)
    shrink = sq < last_sq
    new_last = jnp.where(do_update & shrink, sq, last_sq)
    new_cnt = jnp.where(do_update, jnp.where(shrink, 0, cnt + 1), cnt)
    diverged = do_update & (new_cnt >= opts.max_tolerance_large_step)
    converged = (do_update & (sq < opts.max_converge_step)
                 & jnp.logical_not(diverged))
    new_status = jnp.where(
        isnan & jnp.logical_not(done | no_valid),
        jnp.int32(int(TrackStatus.NUMERIC_ERROR)),
        jnp.where(converged, jnp.int32(int(TrackStatus.TRACKED)), status))
    new_status = jnp.where(done, status, new_status)
    new_done = done | no_valid | isnan | diverged | converged
    return do_update, new_status, new_last, new_cnt, new_done


def _affine_kernel(ref_pad, cur_pad, exm_c, exm_dx, exm_dy,
                   ref_x, ref_y, cur_x, cur_y,
                   a00, a01, a10, a11,
                   out_x, out_y, o00, o01, o10, o11, out_status, *,
                   opts: KltOptions, img_h, img_w, pad, hp, wp, n_features,
                   precise: bool = True, batch: int = AFFINE_BATCH):
    smp = _Sampler(opts, img_h, img_w, pad, hp, wp, precise=precise)
    exs = _Sampler(opts, img_h, img_w, pad, hp, wp,
                   rows=opts.ex_patch_rows, cols=opts.ex_patch_cols,
                   precise=precise)
    extractors = (exm_c[:], exm_dx[:], exm_dy[:])
    tile_base = pl.program_id(0) * TILE

    def setup_one(f):
        """Per-feature level setup (round-4: hoisted out of the batched
        while_loop; independent across the interleave)."""
        inner, inner_valid, dx, dy, n_ref = ref_setup_shared(
            smp, exs, extractors, ref_pad, ref_x[f], ref_y[f])
        x_ent, y_ent = cur_x[f], cur_y[f]
        # H precomputed once per level with x,y anchored at the
        # level-entry position (affine_klt_fast.cpp:95-137). The
        # absolute pixel coordinates make cond(H) ~ coord^4 — fatal
        # for an unpivoted float32 Cholesky — so the system is
        # equilibrated by the coordinate scale: solve (DHD)w = Db,
        # z = Dw with D = diag(1/s,1/s,1/s,1/s,1,1).
        scl = jnp.maximum(jnp.maximum(jnp.abs(x_ent), jnp.abs(y_ent)),
                          1.0)
        dvec = [1.0 / scl] * 4 + [jnp.float32(1.0)] * 2
        x0 = smp.offx + x_ent
        y0 = smp.offy + y_ent
        # ONE gram matmul replaces the previous 21 lane-reduction
        # sums: H8[i, j] = sum(j6_i * j6_j) over the patch lanes.
        j8 = _stack_rows([x0 * dx, x0 * dy, y0 * dx, y0 * dy, dx, dy],
                         smp.p_pad)
        # HIGHEST-precision (near-f32; a multi-pass bf16 split on the
        # MXU, not bit-exact f32 accumulation): the equilibrated 6x6
        # still carries cond >> 1e3, so 3-pass split-bf16 gram error
        # poisons the Cholesky (measured: tracked 8656 -> 7441 on
        # the 10240-feature bench).
        h8 = _xdot(j8, j8, ((1,), (1,)), True)
        hess = [[h8[i, j] * dvec[i] * dvec[j] for j in range(6)]
                for i in range(6)]
        # H is anchored at the level-entry position, so its Cholesky
        # factor is iteration-invariant: factor ONCE here (6 sqrts +
        # 15 divs + the elimination chain leave the loop body).
        hess_low = _chol_factor(hess, 6)
        # Bias base rows: the per-iteration jacobian is
        # xw*dx = (c00*offx + c01*offy + x)*dx etc., so the 6 bias
        # sums decompose over 6 FIXED vectors with per-iteration
        # scalar coefficients — one [1,P]x[8,P]^T matvec per
        # iteration instead of 6 masked product + lane-reduce
        # chains (the measured per-iteration hot spot).
        m8 = _stack_rows([smp.offx * dx, smp.offy * dx,
                          smp.offx * dy, smp.offy * dy, dx, dy],
                         smp.p_pad)
        return (inner, inner_valid, dvec, hess_low, m8, n_ref == 0,
                x_ent, y_ent)

    def one_batch(bi, _):
        """BATCH independent per-feature GN chains interleaved in one
        early-exiting while_loop (round 4) — the same latency-hiding
        interleave that took basic KLT from serial chains to its
        measured optimum; each feature's sample matmul, bias matvec and
        scalar solve are independent, so the compiler overlaps them
        instead of exposing each chain's MXU/VPU latency serially."""
        f0 = bi * batch
        setups = [setup_one(f0 + k) for k in range(batch)]

        def body(_, carry):
            out = []
            for k in range(batch):
                (x, y, c00, c01, c10, c11, status, last_sq, cnt,
                 done) = carry[10 * k:10 * (k + 1)]
                (inner, inner_valid, dvec, hess_low, m8, _np_, _xe,
                 _ye) = setups[k]
                wx = c00 * smp.offx + c01 * smp.offy + x
                wy = c10 * smp.offx + c11 * smp.offy + y
                window, wr0, wc0 = smp.load_window(cur_pad, x, y)
                curv, okcur = smp.sample(window, wr0, wc0, wx, wy)
                valid = okcur & inner_valid
                dt = jnp.where(valid, curv - inner, 0.0)
                # HIGHEST-precision (near-f32; see the gram note): the
                # GN step is b through the ill-conditioned solve;
                # [1,P]x[8,P]^T at HIGHEST is ~2 MXU issues per pass —
                # still far cheaper than the 6 lane-reduce chains it
                # replaces.
                s8 = _xdot(dt, m8, ((1,), (1,)), True)        # [1, 8]
                s1, s2, s3 = s8[0, 0], s8[0, 1], s8[0, 2]
                s4, s5, s6 = s8[0, 3], s8[0, 4], s8[0, 5]
                b = [-(c00 * s1 + c01 * s2 + x * s5),
                     -(c00 * s3 + c01 * s4 + x * s6),
                     -(c10 * s1 + c11 * s2 + y * s5),
                     -(c10 * s3 + c11 * s4 + y * s6),
                     -s5, -s6]
                w = _chol_solve_factored(
                    hess_low, [b[i] * dvec[i] for i in range(6)])
                z = [w[i] * dvec[i] for i in range(6)]
                vx = z[0] * x + z[2] * y + z[4]
                vy = z[1] * x + z[3] * y + z[5]
                num_valid = jnp.sum(valid.astype(jnp.int32))
                upd, status, last_sq, cnt, done = _advance(
                    done, status, last_sq, cnt, [vx, vy], num_valid,
                    opts)
                out.extend([jnp.where(upd, x + vx, x),
                            jnp.where(upd, y + vy, y),
                            jnp.where(upd, c00 + z[0], c00),
                            jnp.where(upd, c01 + z[2], c01),
                            jnp.where(upd, c10 + z[1], c10),
                            jnp.where(upd, c11 + z[3], c11),
                            status, last_sq, cnt, done])
            return tuple(out)

        carry0 = []
        for k in range(batch):
            f = f0 + k
            no_pixels = setups[k][5]
            carry0.extend([setups[k][6], setups[k][7],
                           a00[f], a01[f], a10[f], a11[f],
                           _status0(no_pixels), jnp.float32(jnp.inf),
                           jnp.int32(0), no_pixels])

        def cond(c):
            all_done = c[1 + 9]
            for k in range(1, batch):
                all_done = all_done & c[1 + 10 * k + 9]
            return (c[0] < opts.max_iterations) & jnp.logical_not(all_done)

        def step(c):
            return (c[0] + 1,) + body(c[0], c[1:])

        final = jax.lax.while_loop(cond, step,
                                   (jnp.int32(0),) + tuple(carry0))[1:]
        for k in range(batch):
            @pl.when(tile_base + f0 + k < n_features)
            def _(k=k):
                f = f0 + k
                out_x[f] = final[10 * k]
                out_y[f] = final[10 * k + 1]
                o00[f] = final[10 * k + 2]
                o01[f] = final[10 * k + 3]
                o10[f] = final[10 * k + 4]
                o11[f] = final[10 * k + 5]
                out_status[f] = final[10 * k + 6]
        return 0

    jax.lax.fori_loop(0, TILE // batch, one_batch, 0)


def _lssd_kernel(ref_pad, cur_pad, exm_c, exm_dx, exm_dy,
                 ref_x, ref_y, r00, r01, r10, r11, tx, ty,
                 o00, o01, o10, o11, otx, oty, out_status, *,
                 opts: KltOptions, luminance: bool, img_h, img_w, pad, hp,
                 wp, n_features, precise: bool = True,
                 batch: int = LSSD_BATCH):
    smp = _Sampler(opts, img_h, img_w, pad, hp, wp, precise=precise)
    exs = _Sampler(opts, img_h, img_w, pad, hp, wp,
                   rows=opts.ex_patch_rows, cols=opts.ex_patch_cols,
                   precise=precise)
    extractors = (exm_c[:], exm_dx[:], exm_dy[:])
    tile_base = pl.program_id(0) * TILE
    pr, pc = opts.patch_rows, opts.patch_cols
    # Inner-of-patch mask for the reference's luminance-mean numerator
    # (lssd_klt_fast.cpp:66-73 sums rows/cols 1..n-2 of the patch grid).
    in11 = ((jnp.abs(smp.offx) <= pc // 2 - 1)
            & (jnp.abs(smp.offy) <= pr // 2 - 1))

    def setup_one(f):
        rx, ry = ref_x[f], ref_y[f]
        inner, inner_valid, dx, dy, n_ref = ref_setup_shared(
            smp, exs, extractors, ref_pad, rx, ry)
        if luminance:
            ref_mean = (jnp.sum(inner)
                        / jnp.maximum(n_ref.astype(jnp.float32), 1.0))
            dx = dx / ref_mean
            dy = dy / ref_mean
            inner = inner / ref_mean
        px = rx + smp.offx
        py = ry + smp.offy
        jrx = -py        # d(pos)/dtheta = R @ (-row, col)
        jry = px
        # jtheta = dx*(c00*jrx + c01*jry) + dy*(c10*jrx + c11*jry)
        # is a per-iteration scalar combination of 4 FIXED vectors,
        # so every gram/bias sum of the 3x3 GN system decomposes
        # over the setup-time row stack V8 = [t1..t4, dx, dy, 1]:
        # ONE masked gram matmul + one residual matvec per iteration
        # replaces the previous ~10 masked product + lane-reduce
        # chains (num_valid = G[6,6] falls out of the same gram).
        #
        # Round 4: the t-rows are EQUILIBRATED by the coordinate scale
        # (jrx/jry carry absolute pixel coordinates; the raw 3x3 has
        # cond >> 1e3, which forced both iteration matmuls to 6-pass
        # HIGHEST). The solve runs in the scaled unknown v' = (s*dtheta,
        # dtx, dty) — the affine kernel's dvec pattern — after which the
        # balanced system tolerates the 3-pass split product: 6 fewer
        # MXU passes per iteration on the LSSD hot path.
        scl = jnp.maximum(jnp.maximum(jnp.abs(rx), jnp.abs(ry)),
                          1.0) + float(max(pr, pc))
        inv_s = 1.0 / scl
        v8 = _stack_rows([dx * jrx * inv_s, dx * jry * inv_s,
                          dy * jrx * inv_s, dy * jry * inv_s,
                          dx, dy, smp.p_mask.astype(jnp.float32)],
                         smp.p_pad)
        return (inner, inner_valid, v8, px, py, rx, ry, n_ref == 0,
                inv_s)

    def one_batch(bi, _):
        """BATCH interleaved per-feature GN chains (round 4; see the
        affine kernel note — same latency-hiding restructure)."""
        f0 = bi * batch
        setups = [setup_one(f0 + k) for k in range(batch)]

        def body(_, carry):
            out = []
            for k in range(batch):
                (c00, c01, c10, c11, cx, cy, status, last_sq, cnt,
                 done) = carry[10 * k:10 * (k + 1)]
                (inner, inner_valid, v8, px, py, rx, ry, _np_,
                 inv_s) = setups[k]
                wx = c00 * px + c01 * py + cx
                wy = c10 * px + c11 * py + cy
                # Window centered at the current feature position.
                center_x = c00 * rx + c01 * ry + cx
                center_y = c10 * rx + c11 * ry + cy
                window, wr0, wc0 = smp.load_window(cur_pad, center_x,
                                                   center_y)
                curv, okcur = smp.sample(window, wr0, wc0, wx, wy)
                cur_patch = curv
                if luminance:
                    n_cur = jnp.sum(okcur.astype(jnp.float32))
                    cur_mean = (jnp.sum(jnp.where(in11, cur_patch, 0.0))
                                / jnp.maximum(n_cur, 1.0))
                    cur_patch = cur_patch / cur_mean
                valid = okcur & inner_valid
                residual = jnp.where(valid, cur_patch - inner, 0.0)
                validf = valid.astype(jnp.float32)
                vm = v8 * jnp.broadcast_to(validf, v8.shape)
                # G[i, j] = sum(valid * v_i * v_j) (valid^2 == valid, so
                # masking one side counts it exactly once). The t-rows
                # of v8 are pre-scaled by 1/s (setup), so this 3x3 GN
                # system is solved in the scaled unknown v' = (s*dtheta,
                # dtx, dty) against a COORDINATE-BALANCED G. Round-4
                # measurements (10240x4 workload): swapping these two
                # HIGHEST products for the 3-pass split saved NO time
                # (175.9 vs 174.8 ms) and cost 22 tracked features —
                # the matmul passes are not the LSSD bottleneck (a probe
                # deleting the gram entirely also measured ~181 ms; the
                # 2x cost over affine is SE(2) iteration volume, which
                # is reference semantics). HIGHEST stays (near-f32, not
                # bit-exact; rounding reassociates vs the old fused lane
                # reduce).
                g = _xdot(vm, v8, ((1,), (1,)), True)         # [8, 8]
                bv = _xdot(residual, v8, ((1,), (1,)), True)  # [1, 8]
                a4 = [c00, c01, c10, c11]
                ga = [sum(a4[j] * g[i, j] for j in range(4))
                      for i in range(4)]
                h_tt = sum(a4[i] * ga[i] for i in range(4))
                h_xt = sum(a4[i] * g[4, i] for i in range(4))
                h_yt = sum(a4[i] * g[5, i] for i in range(4))
                h3 = [[h_tt, h_xt, h_yt],
                      [h_xt, g[4, 4], g[4, 5]],
                      [h_yt, g[5, 4], g[5, 5]]]
                b = [-sum(a4[i] * bv[0, i] for i in range(4)),
                     -bv[0, 4], -bv[0, 5]]
                vs = _chol_solve(h3, b)
                # Unscale: dtheta = v'[0] / s (the advance's step-norm
                # check and the rotation update use original units).
                v = [vs[0] * inv_s, vs[1], vs[2]]
                num_valid = g[6, 6].astype(jnp.int32)
                upd, status, last_sq, cnt, done = _advance(
                    done, status, last_sq, cnt, v, num_valid, opts)
                # rot @ [[1, -v0], [v0, 1]], then whole-matrix division
                # by the first column's norm (lssd_klt.cpp:113-117).
                n00 = c00 + c01 * v[0]
                n01 = c01 - c00 * v[0]
                n10 = c10 + c11 * v[0]
                n11 = c11 - c10 * v[0]
                norm = jnp.sqrt(n00 * n00 + n10 * n10)
                out.extend([jnp.where(upd, n00 / norm, c00),
                            jnp.where(upd, n01 / norm, c01),
                            jnp.where(upd, n10 / norm, c10),
                            jnp.where(upd, n11 / norm, c11),
                            jnp.where(upd, cx + v[1], cx),
                            jnp.where(upd, cy + v[2], cy),
                            status, last_sq, cnt, done])
            return tuple(out)

        carry0 = []
        for k in range(batch):
            f = f0 + k
            no_pixels = setups[k][7]
            carry0.extend([r00[f], r01[f], r10[f], r11[f], tx[f], ty[f],
                           _status0(no_pixels), jnp.float32(jnp.inf),
                           jnp.int32(0), no_pixels])

        def cond(c):
            all_done = c[1 + 9]
            for k in range(1, batch):
                all_done = all_done & c[1 + 10 * k + 9]
            return (c[0] < opts.max_iterations) & jnp.logical_not(all_done)

        def step(c):
            return (c[0] + 1,) + body(c[0], c[1:])

        final = jax.lax.while_loop(cond, step,
                                   (jnp.int32(0),) + tuple(carry0))[1:]
        for k in range(batch):
            @pl.when(tile_base + f0 + k < n_features)
            def _(k=k):
                f = f0 + k
                o00[f] = final[10 * k]
                o01[f] = final[10 * k + 1]
                o10[f] = final[10 * k + 2]
                o11[f] = final[10 * k + 3]
                otx[f] = final[10 * k + 4]
                oty[f] = final[10 * k + 5]
                out_status[f] = final[10 * k + 6]
        return 0

    jax.lax.fori_loop(0, TILE // batch, one_batch, 0)


def _prep(opts, ref_img, *vecs):
    """Shared padding/layout plumbing. Returns (n, n_pad, padded images
    geometry dict, padded 1D vectors)."""
    n = vecs[0].shape[0]
    n_pad = ((n + TILE - 1) // TILE) * TILE
    out = [jnp.pad(v, (0, n_pad - n)) for v in vecs]
    return n, n_pad, out


def _pad_images(opts, ref_img, cur_img):
    """Padded STACKED images [2*hp, wp]: plane 0 as-is, plane 1 shifted
    left 64 columns — the load path's 64-granular column anchoring (see
    _Sampler.load_window)."""
    pad = max(opts.ex_patch_rows, opts.ex_patch_cols) + 3
    h, w = ref_img.shape
    hp = _round8(max(h + 2 * pad, WIN_R))
    wp = ((max(w + 2 * pad, 2 * WIN_C) + 127) // 128) * 128

    def stack(img):
        padded = jnp.pad(img, ((pad, hp - h - pad), (pad, wp + 64 - w - pad)))
        return jnp.concatenate([padded[:, :wp], padded[:, 64:wp + 64]],
                               axis=0)

    return stack(ref_img), stack(cur_img), pad, h, w, hp, wp


def _smem_vec():
    return pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.SMEM)


@functools.partial(jax.jit, static_argnames=("opts", "interpret"))
def affine_track_level_pallas(opts: KltOptions, ref_img, cur_img, ref_uv,
                              cur_uv, affine, interpret: bool = False):
    """Fast-mode affine level tracker.

    Returns (uv [N,2], affine [N,2,2], status [N] int8)."""
    ref_pad, cur_pad, pad, h, w, hp, wp = _pad_images(opts, ref_img, cur_img)
    n, n_pad, vecs = _prep(
        opts, ref_img,
        ref_uv[:, 0], ref_uv[:, 1], cur_uv[:, 0], cur_uv[:, 1],
        affine[:, 0, 0], affine[:, 0, 1], affine[:, 1, 0], affine[:, 1, 1])

    exm = make_ref_extractors(opts)
    kernel = functools.partial(_affine_kernel, opts=opts, precise=interpret,
                               img_h=h, img_w=w,
                               pad=pad, hp=hp, wp=wp, n_features=n)
    outs = pl.pallas_call(
        kernel,
        grid=(n_pad // TILE,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5
        + [_smem_vec()] * 8,
        out_specs=tuple([_smem_vec()] * 7),
        out_shape=tuple([jax.ShapeDtypeStruct((n_pad,), jnp.float32)] * 6
                        + [jax.ShapeDtypeStruct((n_pad,), jnp.int32)]),
        interpret=interpret,
    )(ref_pad, cur_pad, *exm, *vecs)
    uv = jnp.stack([outs[0][:n], outs[1][:n]], axis=-1)
    aff = jnp.stack([jnp.stack([outs[2][:n], outs[3][:n]], -1),
                     jnp.stack([outs[4][:n], outs[5][:n]], -1)], axis=-2)
    return uv, aff, outs[6][:n].astype(jnp.int8)


@functools.partial(jax.jit,
                   static_argnames=("opts", "luminance", "interpret"))
def lssd_track_level_pallas(opts: KltOptions, luminance: bool, ref_img,
                            cur_img, ref_uv, rot, t,
                            interpret: bool = False):
    """Fast-mode LSSD level tracker.

    Returns (rot [N,2,2], t [N,2], status [N] int8)."""
    ref_pad, cur_pad, pad, h, w, hp, wp = _pad_images(opts, ref_img, cur_img)
    n, n_pad, vecs = _prep(
        opts, ref_img,
        ref_uv[:, 0], ref_uv[:, 1],
        rot[:, 0, 0], rot[:, 0, 1], rot[:, 1, 0], rot[:, 1, 1],
        t[:, 0], t[:, 1])

    exm = make_ref_extractors(opts)
    kernel = functools.partial(_lssd_kernel, opts=opts, precise=interpret,
                               luminance=luminance,
                               img_h=h, img_w=w, pad=pad, hp=hp, wp=wp,
                               n_features=n)
    outs = pl.pallas_call(
        kernel,
        grid=(n_pad // TILE,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5
        + [_smem_vec()] * 8,
        out_specs=tuple([_smem_vec()] * 7),
        out_shape=tuple([jax.ShapeDtypeStruct((n_pad,), jnp.float32)] * 6
                        + [jax.ShapeDtypeStruct((n_pad,), jnp.int32)]),
        interpret=interpret,
    )(ref_pad, cur_pad, *exm, *vecs)
    new_rot = jnp.stack([jnp.stack([outs[0][:n], outs[1][:n]], -1),
                         jnp.stack([outs[2][:n], outs[3][:n]], -1)], axis=-2)
    new_t = jnp.stack([outs[4][:n], outs[5][:n]], axis=-1)
    return new_rot, new_t, outs[6][:n].astype(jnp.int8)
