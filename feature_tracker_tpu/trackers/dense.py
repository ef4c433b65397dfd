"""Dense optical flow via Gunnar Farneback polynomial expansion.

Reference behavior: src/dense_optical_flow_tracker/dense_optical_flow.{h,cpp}
 - Gaussian kernel (sigma=1, normalized) + moments k2/k4/k22
   (dense_optical_flow.cpp:87-134)
 - per-pixel Gaussian-weighted intensity moments S0,Sr,Sc,Src,Srr,Scc with
   replicate border (dense_optical_flow.cpp:136-189)
 - per-pixel iterative solve: polynomial coefficients A,b from moments,
   current-frame coefficients bilinearly sampled at warped positions on the
   moment matrices, regularized LS step (M^T M + lambda I) d = M^T (b1-b2)
   with M = (A1+A2), lambda = 0.1*tr + 1, step capped at kMaxDeltaFlowStep
   (dense_optical_flow.cpp:191-332)
 - 3x3 median smoothing of both flow channels (dense_optical_flow.cpp:334-371)
 - pyramid: coarse-to-fine, flow bilinearly upsampled 2x with magnitude x2
   (dense_optical_flow.cpp:35-85)

TPU design: the reference's O(k^2) per-pixel moment loops become 6 separable
convolutions (the Gaussian window factorizes as g(dr)g(dc), and the dr/dc
polynomial weights factor per axis); the per-pixel GN loop is pure
elementwise math over the whole flow field, so every pixel is a VPU lane.
Flow is carried as ``[2, H, W]`` with channel 0 = row flow, 1 = col flow,
matching the reference's output convention (dense_optical_flow.h:26-27).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DenseFlowOptions:
    """Defaults mirror DenseOpticalFlow::Options (dense_optical_flow.h:15-20)."""

    max_iterations: int = 10
    half_patch_size: int = 2
    max_converge_step: float = 1e-6
    max_delta_flow_step: float = 1.0


def _kernel_moments(half: int):
    """Normalized Gaussian kernel 1D factors and k2/k4/k22 moments (static)."""
    if half == 0:
        return np.ones(1), 0.0, 0.0, 0.0
    d = np.arange(-half, half + 1, dtype=np.float64)
    g = np.exp(-0.5 * d * d)  # sigma = 1 (dense_optical_flow.cpp:104)
    w2d = np.outer(g, g)
    w2d /= w2d.sum()
    g1 = g / g.sum()  # separable factor of the normalized 2D kernel
    dr = d[:, None]
    dc = d[None, :]
    k2 = float(np.sum(w2d * dr * dr))
    k4 = float(np.sum(w2d * dr ** 4))
    k22 = float(np.sum(w2d * dr * dr * dc * dc))
    return g1, k2, k4, k22


def _moments(img, half: int, g1):
    """The 6 Gaussian-weighted moment maps, stacked [6, H, W] in the order
    (S0, Sr, Sc, Src, Srr, Scc).

    The reference's O(k^2) per-pixel loops (dense_optical_flow.cpp:
    136-189) become TWO convolutions: a rows pass producing the 3
    distinct row-filtered planes (g, g*d, g*d*d) and a cols pass mapping
    those 3 planes to the 6 moment products — one
    ``lax.conv_general_dilated`` call each (channels stacked), instead
    of 12 sequential dynamic-slice accumulations per image."""
    k = 2 * half + 1
    d = np.arange(-half, half + 1, dtype=np.float32)
    g = np.asarray(g1, np.float32)
    rows_k = np.stack([g, g * d, g * d * d], axis=-1)     # [k, 3]
    # Col-pass mixing: output (row_plane, col_weight) pairs.
    #   S0=(g,g)p0  Sr=(gd,g)p1  Sc=(g,gd)p0  Src=(gd,gd)p1
    #   Srr=(gdd,g)p2  Scc=(g,gdd)p0
    cols_k = np.zeros((k, 3, 6), np.float32)
    cols_k[:, 0, 0] = g
    cols_k[:, 1, 1] = g
    cols_k[:, 0, 2] = g * d
    cols_k[:, 1, 3] = g * d
    cols_k[:, 2, 4] = g
    cols_k[:, 0, 5] = g * d * d

    pad = jnp.pad(img, half, mode="edge")[None, :, :, None]  # NHWC
    dn = jax.lax.conv_dimension_numbers(pad.shape, (k, 1, 1, 3),
                                        ("NHWC", "HWIO", "NHWC"))
    r3 = jax.lax.conv_general_dilated(
        pad, jnp.asarray(rows_k).reshape(k, 1, 1, 3), (1, 1), "VALID",
        dimension_numbers=dn, precision=jax.lax.Precision.HIGHEST)
    dn2 = jax.lax.conv_dimension_numbers(r3.shape, (1, k, 3, 6),
                                         ("NHWC", "HWIO", "NHWC"))
    m6 = jax.lax.conv_general_dilated(
        r3, jnp.asarray(cols_k).reshape(1, k, 3, 6), (1, 1), "VALID",
        dimension_numbers=dn2, precision=jax.lax.Precision.HIGHEST)
    return jnp.moveaxis(m6[0], -1, 0)                      # [6, H, W]


def _poly_coeffs(moments, k2, k4, k22):
    """Quadratic polynomial coefficients from moment maps.

    Returns (a, bq, c, br, bc): f ~ [r c] A [r c]^T + [br bc].[r c] + const
    with A = [[a, c/2], [c/2, bq]] (dense_optical_flow.cpp:247-303)."""
    s0, sr, sc, src, srr, scc = moments
    dd = k4 - k2 * k2
    ee = k22 - k2 * k2
    term1 = (srr + scc - 2.0 * k2 * s0) / (dd + ee + 1e-6)
    term2 = (srr - scc) / (dd - ee + 1e-6)
    a = 0.5 * (term1 + term2)
    bq = 0.5 * (term1 - term2)
    c = src / (k22 + 1e-6)
    br = sr / (k2 + 1e-6)
    bc = sc / (k2 + 1e-6)
    return a, bq, c, br, bc


def _interp_maps(maps, r, c):
    """Bilinear sample a stack of ``[K, H, W]`` maps at (r, c) grids with
    clamped taps (the reference's Utility::Interpolate on moment matrices)."""
    h, w = maps.shape[-2:]
    r = jnp.clip(r, 0.0, h - 1.0)
    c = jnp.clip(c, 0.0, w - 1.0)
    r0 = jnp.clip(jnp.floor(r).astype(jnp.int32), 0, h - 2)
    c0 = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, w - 2)
    fr = r - r0
    fc = c - c0
    tl = maps[:, r0, c0]
    tr_ = maps[:, r0, c0 + 1]
    bl = maps[:, r0 + 1, c0]
    br = maps[:, r0 + 1, c0 + 1]
    return ((1 - fr) * (1 - fc) * tl + (1 - fr) * fc * tr_
            + fr * (1 - fc) * bl + fr * fc * br)


def _pack_maps(maps):
    """Pack ``[K, H, W]`` maps (K <= 8) for gather-efficient bilinear
    sampling: row r*W+c holds all FOUR bilinear taps of all K maps —
    (r, c) in lanes 0..K, (r, c+1) in 8..8+K, (r+1, c) in 16..16+K,
    (r+1, c+1) in 24..24+K. ONE row gather then fetches a full bilinear
    neighborhood (TPU gathers are row-granular: the round-2 two-gather
    layout halved again to a single 32-lane gather per iteration; the
    naive form paid 4*K tiny gathers). 4x the HBM footprint of the maps
    — irrelevant next to gather row count."""
    k, h, w = maps.shape
    right = jnp.concatenate([maps[:, :, 1:], maps[:, :, -1:]], axis=2)
    down = jnp.concatenate([maps[:, 1:, :], maps[:, -1:, :]], axis=1)
    down_r = jnp.concatenate([right[:, 1:, :], right[:, -1:, :]], axis=1)
    p = jnp.zeros((h, w, 32), maps.dtype)
    p = p.at[..., :k].set(jnp.moveaxis(maps, 0, -1))
    p = p.at[..., 8:8 + k].set(jnp.moveaxis(right, 0, -1))
    p = p.at[..., 16:16 + k].set(jnp.moveaxis(down, 0, -1))
    p = p.at[..., 24:24 + k].set(jnp.moveaxis(down_r, 0, -1))
    # bf16 table halves the gather bytes (the iteration's wall): ~0.4%
    # relative tap noise, far below the solver's damping floor
    # (lambda = 0.1 tr + 1) and the test tolerances; the blend and all
    # solver math stay f32.
    return p.reshape(h * w, 32).astype(jnp.bfloat16)


def _interp_maps_packed(packed, k, h, w, r, c):
    """Bilinear sample of K packed maps (same arithmetic and clamping as
    _interp_maps, term for term). Returns ``[K, H, W]``."""
    r = jnp.clip(r, 0.0, h - 1.0)
    c = jnp.clip(c, 0.0, w - 1.0)
    r0 = jnp.clip(jnp.floor(r).astype(jnp.int32), 0, h - 2)
    c0 = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, w - 2)
    fr = (r - r0)[..., None]
    fc = (c - c0)[..., None]
    flat_t = (r0 * w + c0).reshape(-1)
    quad = jnp.take(packed, flat_t, axis=0).reshape(
        *r.shape, 32).astype(jnp.float32)
    vals = ((1 - fr) * (1 - fc) * quad[..., :k]
            + (1 - fr) * fc * quad[..., 8:8 + k]
            + fr * (1 - fc) * quad[..., 16:16 + k]
            + fr * fc * quad[..., 24:24 + k])
    return jnp.moveaxis(vals, -1, 0)


@partial(jax.jit, static_argnames=("opts",))
def _track_single(opts: DenseFlowOptions, ref_img, cur_img, init_flow):
    half = opts.half_patch_size
    g1, k2, k4, k22 = _kernel_moments(half)
    m_ref = _moments(ref_img, half, g1)
    m_cur = _moments(cur_img, half, g1)
    # Both frames' moments go through the SAME bf16 rounding as the
    # packed gather table, so identical images yield identically-zero
    # b1-b2 (zero flow stays exactly zero); see _pack_maps.
    m_ref = m_ref.astype(jnp.bfloat16).astype(jnp.float32)
    a1, bq1, c1, br1, bc1 = _poly_coeffs(m_ref, k2, k4, k22)

    h, w = ref_img.shape
    rows = jnp.arange(h, dtype=ref_img.dtype)[:, None]
    cols = jnp.arange(w, dtype=ref_img.dtype)[None, :]

    packed_cur = _pack_maps(m_cur)

    def body(_, carry):
        flow, done = carry
        sample_r = rows + flow[0]
        sample_c = cols + flow[1]
        m2 = _interp_maps_packed(packed_cur, 6, h, w, sample_r, sample_c)
        a2, bq2, c2, br2, bc2 = _poly_coeffs(m2, k2, k4, k22)
        # M = (A1 + A2) (the reference's A_avg * 2), d = b1 - b2.
        m00 = a1 + a2
        m01 = 0.5 * (c1 + c2)
        m11 = bq1 + bq2
        d0 = br1 - br2
        d1 = bc1 - bc2
        # H = M^T M + lambda I, rhs = M^T d  (M symmetric).
        h00 = m00 * m00 + m01 * m01
        h01 = m01 * (m00 + m11)
        h11 = m01 * m01 + m11 * m11
        lam = 0.1 * (h00 + h11) + 1.0
        h00 = h00 + lam
        h11 = h11 + lam
        g0 = m00 * d0 + m01 * d1
        g1_ = m01 * d0 + m11 * d1
        det = h00 * h11 - h01 * h01
        dr = (h11 * g0 - h01 * g1_) / det
        dc = (h00 * g1_ - h01 * g0) / det
        norm = jnp.sqrt(dr * dr + dc * dc)
        cap = jnp.minimum(1.0, opts.max_delta_flow_step / jnp.maximum(
            norm, 1e-30))
        dr = dr * cap
        dc = dc * cap
        upd = jnp.logical_not(done)
        flow = flow + jnp.stack([jnp.where(upd, dr, 0.0),
                                 jnp.where(upd, dc, 0.0)])
        done = done | (dr * dr + dc * dc < opts.max_converge_step)
        return flow, done

    flow0 = init_flow
    done0 = jnp.zeros(ref_img.shape, dtype=bool)
    # The reference iterates each pixel until its own convergence break
    # (dense_optical_flow.cpp:191-245); converged lanes here stop
    # updating, and once EVERY pixel has converged the remaining
    # iterations are identity — so the while_loop's all-done early exit
    # is bit-exact and skips the tail gathers (most pixels converge well
    # before max_iterations on real imagery).
    def cond(carry):
        i, _, done = carry
        return (i < opts.max_iterations) & jnp.logical_not(jnp.all(done))

    def step(carry):
        i, flow, done = carry
        flow, done = body(i, (flow, done))
        return i + 1, flow, done

    _, flow, _ = jax.lax.while_loop(cond, step,
                                    (jnp.int32(0), flow0, done0))
    return _median3x3(flow)


def _median3x3(flow):
    """3x3 median of each flow channel with replicate border
    (dense_optical_flow.cpp:334-371)."""
    pad = jnp.pad(flow, ((0, 0), (1, 1), (1, 1)), mode="edge")
    h, w = flow.shape[-2:]
    stacks = [pad[:, i:i + h, j:j + w] for i in range(3) for j in range(3)]
    window = jnp.stack(stacks, axis=0)  # [9, 2, H, W]
    return jnp.sort(window, axis=0)[4]


@partial(jax.jit, static_argnames=("out_shape",))
def _upsample_flow(flow, out_shape):
    """Bilinear 2x upsample with magnitude doubled
    (dense_optical_flow.cpp:64-79): up[r, c] = interp(flow, r/2, c/2) * 2.

    The sample grid is regular (stride 1/2), so this is gather-free row/
    column interleaving: even outputs copy the source, odd outputs
    average neighbours (identical values to the clamped bilinear form —
    halving is exact, so 0.5*(a+b) rounds exactly like the two-weight
    sum)."""
    h, w = out_shape
    k, sh, sw = flow.shape
    down = jnp.concatenate([flow[:, 1:, :], flow[:, -1:, :]], axis=1)
    rows2 = jnp.stack([flow, 0.5 * (flow + down)],
                      axis=2).reshape(k, 2 * sh, sw)
    right = jnp.concatenate([rows2[:, :, 1:], rows2[:, :, -1:]], axis=2)
    full = jnp.stack([rows2, 0.5 * (rows2 + right)],
                     axis=3).reshape(k, 2 * sh, 2 * sw)
    # Odd parent sizes sample at the clamped border: replicate-edge pad.
    if h > 2 * sh or w > 2 * sw:
        full = jnp.pad(full, ((0, 0), (0, max(0, h - 2 * sh)),
                              (0, max(0, w - 2 * sw))), mode="edge")
    return full[:, :h, :w] * 2.0


class DenseOpticalFlow:
    """Farneback dense flow tracker.

    ``track`` consumes pyramids (tuples of [H, W] float images, finest
    first) and returns flow ``[2, H, W]`` (row flow, col flow) at full
    resolution."""

    def __init__(self, options: DenseFlowOptions | None = None):
        self.options = options or DenseFlowOptions()

    def track_single_level(self, ref_img, cur_img, init_flow=None):
        ref_img = jnp.asarray(ref_img, jnp.float32)
        cur_img = jnp.asarray(cur_img, jnp.float32)
        if init_flow is None or jnp.shape(init_flow) != (2,) + ref_img.shape:
            init_flow = jnp.zeros((2,) + ref_img.shape, jnp.float32)
        return _track_single(self.options, ref_img, cur_img,
                             jnp.asarray(init_flow, jnp.float32))

    def track(self, ref_pyramid, cur_pyramid):
        levels = len(ref_pyramid)
        flow = jnp.zeros((2,) + tuple(ref_pyramid[-1].shape), jnp.float32)
        for lvl in range(levels - 1, -1, -1):
            flow = _track_single(self.options,
                                 jnp.asarray(ref_pyramid[lvl], jnp.float32),
                                 jnp.asarray(cur_pyramid[lvl], jnp.float32),
                                 flow)
            if lvl > 0:
                flow = _upsample_flow(flow, tuple(ref_pyramid[lvl - 1].shape))
        return flow
