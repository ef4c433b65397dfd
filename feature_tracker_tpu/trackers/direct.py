"""Direct photometric SE(3) camera-pose tracker.

Estimates the relative pose (q_rc, p_rc) of the current frame w.r.t. a
depth-endowed reference frame by joint Gauss-Newton over the photometric
residuals of all feature patches (one pose for the whole frame).

Reference behavior: src/direct_method_tracker/direct_method_tracker.cpp
 - world-frame entry lifts landmarks into the reference camera frame and
   composes T_rc from the two world poses (:8-33)
 - relative entry: multi-level with intrinsics scaled by the pyramid level
   (:35-86); final out-of-image check sets OUTSIDE (:74-83); other statuses
   are reported TRACKED
 - DIRECT mode (:115-192): per feature the 2x6 d(pixel)/d(xi) jacobian from
   the REFERENCE-frame point, per patch pixel the 0.5-scaled central
   difference of the CURRENT image, H/b accumulated over all features, LDLT
   solve, additive position update and left-multiplied small-angle
   quaternion update; reprojected cur_pixel_uv is a side effect of each
   iteration (:144-145); features with non-positive depth in either frame
   are skipped (:130,142); NaN or squared step < kMaxConvergeStep breaks.
 - INVERSE / FAST are empty stubs in the reference (:108-113,194-199)
   although its README claims Inverse; here both are real: INVERSE takes
   image gradients from the reference frame each iteration, FAST
   additionally freezes H from the reference-only validity mask so per
   iteration only the residual/bias is rebuilt.

TPU design: the feature loop is a vmapped H_i/b_i evaluation and a tree-sum
into one 6x6 system — exactly the reduction that becomes a ``psum`` when
features are sharded across devices (see parallel/).
kMaxConvergeResidual exists in the reference options but is read nowhere
(direct_method_tracker.h:26); kept for config parity.
"""

from __future__ import annotations

import dataclasses
import enum
from functools import partial

import jax
import jax.numpy as jnp

from feature_tracker_tpu.core.geometry import (
    pinhole_project,
    quat_conjugate,
    quat_from_small_angle,
    quat_multiply,
    quat_normalize,
    quat_rotate,
)
from feature_tracker_tpu.core.status import TrackStatus
from feature_tracker_tpu.ops.solve import solve_sym

_EPS_Z = 1e-6


class DirectMethodMode(enum.Enum):
    INVERSE = "inverse"
    DIRECT = "direct"
    FAST = "fast"


@dataclasses.dataclass(frozen=True)
class DirectMethodOptions:
    """Defaults mirror DirectMethodOptions (direct_method_tracker.h:20-28)."""

    max_track_points: int = 500
    max_iterations: int = 15
    patch_row_half_size: int = 6
    patch_col_half_size: int = 6
    max_converge_step: float = 1e-6
    max_converge_residual: float = 2.0  # parity only; unused by reference too
    method: DirectMethodMode = DirectMethodMode.DIRECT


def _patch_offsets(opts):
    dr = jnp.arange(-opts.patch_row_half_size, opts.patch_row_half_size + 1,
                    dtype=jnp.float32)
    dc = jnp.arange(-opts.patch_col_half_size, opts.patch_col_half_size + 1,
                    dtype=jnp.float32)
    dcc, drr = jnp.meshgrid(dc, dr)
    return jnp.stack([dcc.reshape(-1), drr.reshape(-1)], axis=-1)  # [P,2](x,y)


def _sample_patch(padded, pad: int, img_shape, uv, pr: int, pc: int,
                  grads: bool):
    """Const-weight patch (and optionally its +-1 central-difference
    gradients) for ONE feature from ONE window slice.

    The direct method's patch is rigidly offset from the projected pixel
    (direct_method_tracker.cpp:144-155), so all samples share the anchor's
    bilinear weights — the per-pixel gathers of ``bilinear_sample`` reduce
    to shifted views of a single contiguous block (see ops/window.py);
    that one change takes the tracker from 830 to ~40 ms/frame on TPU.

    Returns (value [P], valid [P], grad [P, 2] | None, ok_grad [P] | None).
    """
    from feature_tracker_tpu.ops.window import (
        const_weights,
        slice_window,
        tap_validity,
    )
    win = max(pr, pc) + 3
    r0, c0, wts = const_weights(uv)
    min_r = r0 - pr // 2
    min_c = c0 - pc // 2
    block = slice_window(padded, pad, min_r - 1, min_c - 1, win)
    w_tl, w_tr, w_bl, w_br = wts

    def sh(dr, dc):
        r = 1 + dr
        c = 1 + dc
        return (w_tl * block[r:r + pr, c:c + pc]
                + w_tr * block[r:r + pr, c + 1:c + pc + 1]
                + w_bl * block[r + 1:r + pr + 1, c:c + pc]
                + w_br * block[r + 1:r + pr + 1, c + 1:c + pc + 1])

    center = sh(0, 0).reshape(-1)
    v_c = tap_validity(img_shape, min_r, min_c, pr, pc).reshape(-1)
    if not grads:
        return jnp.where(v_c, center, 0.0), v_c, None, None
    vl = sh(0, -1)
    vr = sh(0, 1)
    vt = sh(-1, 0)
    vb = sh(1, 0)
    ok = (tap_validity(img_shape, min_r, min_c - 1, pr, pc)
          & tap_validity(img_shape, min_r, min_c + 1, pr, pc)
          & tap_validity(img_shape, min_r - 1, min_c, pr, pc)
          & tap_validity(img_shape, min_r + 1, min_c, pr, pc)).reshape(-1)
    grad = 0.5 * jnp.stack([(vr - vl).reshape(-1),
                            (vb - vt).reshape(-1)], axis=-1)
    return jnp.where(v_c, center, 0.0), v_c, grad, ok


def _pixel_xi_jacobian(p_ref, fx, fy):
    """2x6 d(pixel)/d(xi) from the reference-frame point
    (reference: direct_method_tracker.cpp:148-151)."""
    x, y, z = p_ref[..., 0], p_ref[..., 1], p_ref[..., 2]
    # Invalid (non-positive-depth) features are masked out of H/b later,
    # but 1/0 here would produce NaN*0 = NaN and poison the reduction —
    # substitute a safe depth for them.
    zi = 1.0 / jnp.where(z >= _EPS_Z, z, 1.0)
    zi2 = zi * zi
    row0 = jnp.stack([fx * zi, jnp.zeros_like(x), -fx * x * zi2,
                      -fx * x * y * zi2, fx + fx * x * x * zi2,
                      -fx * y * zi], axis=-1)
    row1 = jnp.stack([jnp.zeros_like(x), fy * zi, -fy * y * zi2,
                      -fy - fy * y * y * zi2, fy * x * y * zi2,
                      fy * x * zi], axis=-1)
    return jnp.stack([row0, row1], axis=-2)  # [..., 2, 6]


@partial(jax.jit, static_argnames=("opts",))
def _track_level(opts: DirectMethodOptions, ref_img, cur_img, k4, p_ref,
                 ref_uv, cur_uv0, q0, p0):
    n = p_ref.shape[0]
    pr, pc = 2 * opts.patch_row_half_size + 1, 2 * opts.patch_col_half_size + 1
    pad = max(pr, pc) + 3
    ref_pad = jnp.pad(ref_img, pad)
    cur_pad = jnp.pad(cur_img, pad)
    in_limit = jnp.arange(n) < opts.max_track_points
    fx, fy = k4[0], k4[1]
    valid_ref_depth = p_ref[:, 2] >= _EPS_Z

    need_ref_grads = opts.method != DirectMethodMode.DIRECT
    sample_ref = jax.vmap(partial(_sample_patch, ref_pad, pad,
                                  ref_img.shape, pr=pr, pc=pc,
                                  grads=need_ref_grads))
    refv, okref, grad_ref, ok_grad = sample_ref(ref_uv)
    jac_xi = _pixel_xi_jacobian(p_ref, fx, fy)          # [N, 2, 6]

    if need_ref_grads:
        # Reference-frame gradients are pose-independent: compute once.
        ok_grad_ref = ok_grad & okref
        jac_ref = jnp.einsum("npk,nkj->npj", grad_ref, jac_xi)   # [N, P, 6]

    if opts.method == DirectMethodMode.FAST:
        # H frozen from reference-only validity.
        mask_fast = (ok_grad_ref & valid_ref_depth[:, None]
                     & in_limit[:, None]).astype(jnp.float32)
        jm = jac_ref * mask_fast[..., None]
        h_fast = jnp.einsum("npi,npj->ij", jm, jac_ref)

    def body(_, carry):
        q, p, cur_uv, done = carry
        p_cur = quat_rotate(quat_conjugate(q)[None, :], p_ref - p[None, :])
        valid_feat = valid_ref_depth & (p_cur[:, 2] >= _EPS_Z) & in_limit
        norm_xy = p_cur[:, :2] / p_cur[:, 2:3]
        proj_uv = pinhole_project(norm_xy, k4)
        new_cur_uv = jnp.where((valid_feat & jnp.logical_not(done))[:, None],
                               proj_uv, cur_uv)

        direct_mode = opts.method == DirectMethodMode.DIRECT
        sample_cur = jax.vmap(partial(_sample_patch, cur_pad, pad,
                                      cur_img.shape, pr=pr, pc=pc,
                                      grads=direct_mode))
        curv, okcur, grad, ok_grad_cur = sample_cur(new_cur_uv)

        if direct_mode:
            okpix = ok_grad_cur & okref & okcur
            jac = jnp.einsum("npk,nkj->npj", grad, jac_xi)
        else:
            okpix = ok_grad_ref & okcur
            jac = jac_ref

        mask = (okpix & valid_feat[:, None]).astype(jnp.float32)
        residual = (curv - refv) * mask
        jm = jac * mask[..., None]
        if opts.method == DirectMethodMode.FAST:
            hess = h_fast
        else:
            hess = jnp.einsum("npi,npj->ij", jm, jac)
        bias = jnp.einsum("np,npj->j", residual, jm)

        dx = solve_sym(hess, bias)
        isnan = jnp.any(jnp.isnan(dx))
        upd = jnp.logical_not(done | isnan)
        new_p = jnp.where(upd, p + dx[:3], p)
        dq = quat_multiply(quat_from_small_angle(dx[3:6]), q)
        new_q = jnp.where(upd, quat_normalize(dq), q)
        new_done = done | isnan | (jnp.sum(dx * dx) < opts.max_converge_step)
        return new_q, new_p, new_cur_uv, new_done

    # The GN chain is GLOBAL (one pose for the whole frame), so unlike
    # the per-feature trackers the early exit is a real while_loop exit,
    # not a masked lane: the reference breaks after ~3-5 iterations
    # (direct_method_tracker.cpp:122) and the fixed-15 fori_loop paid the
    # full compute for every converged iteration (round-4 fix; the
    # done-masked body is unchanged, so results are bit-identical).
    def wcond(c):
        return (c[0] < opts.max_iterations) & jnp.logical_not(c[1][3])

    def wstep(c):
        return c[0] + 1, body(c[0], c[1])

    _, (q, p, cur_uv, _) = jax.lax.while_loop(
        wcond, wstep, (jnp.int32(0), (q0, p0, cur_uv0, jnp.asarray(False))))
    return q, p, cur_uv


class DirectMethod:
    """Photometric SE(3) pose tracker over a pyramid."""

    def __init__(self, options: DirectMethodOptions | None = None):
        self.options = options or DirectMethodOptions()

    def track(self, ref_pyramid, cur_pyramid, k4, p_c_in_ref, ref_uv,
              q_rc=None, p_rc=None, cur_uv=None, status=None):
        """Relative-frame entry. Returns (cur_uv, q_rc, p_rc, status)."""
        k4 = jnp.asarray(k4, jnp.float32)
        p_c_in_ref = jnp.asarray(p_c_in_ref, jnp.float32)
        ref_uv = jnp.asarray(ref_uv, jnp.float32)
        n = ref_uv.shape[0]
        if cur_uv is None or jnp.shape(cur_uv) != (n, 2):
            cur_uv = ref_uv
        else:
            cur_uv = jnp.asarray(cur_uv, jnp.float32)
        q = (jnp.asarray(q_rc, jnp.float32) if q_rc is not None
             else jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32))
        p = (jnp.asarray(p_rc, jnp.float32) if p_rc is not None
             else jnp.zeros(3, jnp.float32))

        levels = len(ref_pyramid)
        scale = float(1 << (levels - 1))
        s_ref = ref_uv / scale
        s_k = k4 / scale
        for lvl in range(levels - 1, -1, -1):
            q, p, cur_uv = _track_level(self.options, ref_pyramid[lvl],
                                        cur_pyramid[lvl], s_k, p_c_in_ref,
                                        s_ref, cur_uv, q, p)
            if lvl > 0:
                s_ref = s_ref * 2.0
                s_k = s_k * 2.0

        # Outside check on the full-resolution image; everything else is
        # reported TRACKED (reference: direct_method_tracker.cpp:74-83).
        h, w = ref_pyramid[0].shape
        if status is None or jnp.shape(status) != (n,):
            status = jnp.full((n,), int(TrackStatus.TRACKED), jnp.int8)
        else:
            status = jnp.asarray(status, jnp.int8)
        outside = ((cur_uv[:, 0] < 0) | (cur_uv[:, 0] > w - 1)
                   | (cur_uv[:, 1] < 0) | (cur_uv[:, 1] > h - 1))
        status = jnp.where(outside, jnp.int8(int(TrackStatus.OUTSIDE)),
                           status)
        return cur_uv, q, p, status

    def track_world(self, ref_pyramid, cur_pyramid, k4, ref_q_wc, ref_p_wc,
                    p_w, ref_uv, cur_q_wc, cur_p_wc, cur_uv=None,
                    status=None):
        """World-frame entry (reference: direct_method_tracker.cpp:8-33).

        Returns (cur_uv, cur_q_wc, cur_p_wc, status)."""
        ref_q_wc = jnp.asarray(ref_q_wc, jnp.float32)
        ref_p_wc = jnp.asarray(ref_p_wc, jnp.float32)
        p_w = jnp.asarray(p_w, jnp.float32)
        cur_q_wc = jnp.asarray(cur_q_wc, jnp.float32)
        cur_p_wc = jnp.asarray(cur_p_wc, jnp.float32)

        ref_q_cw = quat_conjugate(ref_q_wc)
        p_c_in_ref = quat_rotate(ref_q_cw[None, :], p_w - ref_p_wc[None, :])
        q_rc = quat_multiply(ref_q_cw, cur_q_wc)
        p_rc = quat_rotate(ref_q_cw, cur_p_wc - ref_p_wc)

        cur_uv, q_rc, p_rc, status = self.track(
            ref_pyramid, cur_pyramid, k4, p_c_in_ref, ref_uv, q_rc, p_rc,
            cur_uv, status)
        new_q_wc = quat_multiply(ref_q_wc, q_rc)
        new_p_wc = quat_rotate(ref_q_wc, p_rc) + ref_p_wc
        return cur_uv, new_q_wc, new_p_wc, status
