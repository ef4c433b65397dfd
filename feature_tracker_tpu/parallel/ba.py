"""Sharded Schur-complement bundle adjustment.

New scope beyond the reference (which has no multi-view refinement;
SURVEY.md §7.2.7): jointly refines camera poses and landmarks from pixel
observations. Designed TPU-first:

 - **Landmark-block layout**: observations are stored per landmark
   ``[L, O]`` (pose index, uv, mask) — the landmark axis is the shard
   axis. Every per-landmark quantity (3x3 A_l, Schur contributions,
   back-substitution) is an independent vmapped lane.
 - **Schur complement**: each landmark eliminates its own 3x3 block in
   closed form; its contribution to the reduced camera system is a dense
   [O, O, 6, 6] outer block scattered into [P, P, 6, 6]. With landmarks
   sharded, the scatter-add's replication is an XLA all-reduce (psum over
   the mesh) — the only cross-device communication per iteration.
 - **Replicated solve**: the reduced 6P x 6P system is tiny (P = window
   keyframes) and solved replicated on every device; back-substitution is
   shard-local.

Pose convention: world-to-camera (q_cw, t_cw), p_c = R(q) p_w + t.
Left SE(3) perturbation: p_c' ~= p_c + dtheta x p_c + dt, giving
d p_c/d theta = -[p_c]_x and d p_c/d t = I; landmark jacobian is R(q).
Gauge freedom is fixed by freezing the first pose.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from feature_tracker_tpu.core.geometry import (
    quat_from_small_angle,
    quat_multiply,
    quat_normalize,
    quat_rotate,
    quat_to_matrix,
)

_EPS_Z = 1e-6


@dataclasses.dataclass(frozen=True)
class BaOptions:
    max_iterations: int = 10
    landmark_damping: float = 1e-4
    pose_damping: float = 1e-4
    # Gauge fixing: freeze the first K poses. 1 pins the similarity frame
    # up to global scale (sufficient with metric depth); 2 also pins the
    # monocular scale freedom.
    num_fixed_poses: int = 1
    # Metric anchoring: quadratic prior pulling each landmark toward its
    # INITIAL position, weight in (px/m)^2 against the pixel residuals.
    # 0 = pure monocular BA (scale is a gauge freedom unless
    # num_fixed_poses >= 2); > 0 = depth-seeded windows (stereo/RGBD
    # disparity) keep their metric scale, e.g. 10-100 for KITTI-scale
    # scenes (jacobian entries fx/z ~ 10-150 px/m).
    landmark_prior: float = 0.0
    # Robust kernel: Huber width in pixels (0 = pure L2). Applied as
    # IRLS — each observation's residual/jacobians are scaled by
    # sqrt(min(1, huber_px/|r|)) before the normal equations, so
    # outlier tracks (occlusions, disparity edges) stop dominating.
    huber_px: float = 0.0


def project(p_c, k4):
    """Pinhole projection of camera-frame points [..., 3] -> [..., 2]."""
    fx, fy, cx, cy = k4[0], k4[1], k4[2], k4[3]
    z = jnp.maximum(p_c[..., 2], _EPS_Z)
    return jnp.stack([fx * p_c[..., 0] / z + cx,
                      fy * p_c[..., 1] / z + cy], axis=-1)


def reprojection_residuals(q_cw, t_cw, landmarks, obs_pose_idx, obs_uv,
                           obs_mask, k4):
    """Masked residuals [L, O, 2] (projection - observation)."""
    q_o = q_cw[obs_pose_idx]                      # [L, O, 4]
    t_o = t_cw[obs_pose_idx]                      # [L, O, 3]
    p_c = quat_rotate(q_o, landmarks[:, None, :]) + t_o
    valid = obs_mask & (p_c[..., 2] > _EPS_Z)
    r = project(p_c, k4) - obs_uv
    return jnp.where(valid[..., None], r, 0.0), p_c, valid


def reprojection_rms(q_cw, t_cw, landmarks, obs_pose_idx, obs_uv, obs_mask,
                     k4):
    r, _, valid = reprojection_residuals(q_cw, t_cw, landmarks,
                                         obs_pose_idx, obs_uv, obs_mask, k4)
    n = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sqrt(jnp.sum(r * r) / n.astype(jnp.float32))


def _skew(v):
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack([
        jnp.stack([z, -v[..., 2], v[..., 1]], -1),
        jnp.stack([v[..., 2], z, -v[..., 0]], -1),
        jnp.stack([-v[..., 1], v[..., 0], z], -1)], -2)


def _jacobians(q_cw, t_cw, landmarks, obs_pose_idx, obs_uv, obs_mask, k4):
    """Residuals + per-observation jacobians.

    Returns r [L,O,2], j_pose [L,O,2,6] (theta cols 0-2, t cols 3-5),
    j_lm [L,O,2,3], valid [L,O]."""
    r, p_c, valid = reprojection_residuals(q_cw, t_cw, landmarks,
                                           obs_pose_idx, obs_uv, obs_mask,
                                           k4)
    fx, fy = k4[0], k4[1]
    z = jnp.maximum(p_c[..., 2], _EPS_Z)
    zi = 1.0 / z
    x, y = p_c[..., 0], p_c[..., 1]
    zero = jnp.zeros_like(zi)
    j_proj = jnp.stack([
        jnp.stack([fx * zi, zero, -fx * x * zi * zi], -1),
        jnp.stack([zero, fy * zi, -fy * y * zi * zi], -1)], -2)  # [L,O,2,3]

    j_pose = jnp.concatenate([
        jnp.einsum("loij,lojk->loik", j_proj, -_skew(p_c)),
        j_proj], axis=-1)                                        # [L,O,2,6]

    rot = quat_to_matrix(q_cw)[obs_pose_idx]                     # [L,O,3,3]
    j_lm = jnp.einsum("loij,lojk->loik", j_proj, rot)            # [L,O,2,3]

    m = valid[..., None, None].astype(jnp.float32)
    return r, j_pose * m, j_lm * m, valid


@partial(jax.jit, static_argnames=("opts",))
def ba_step(q_cw, t_cw, landmarks, obs_pose_idx, obs_uv, obs_mask, k4,
            opts: BaOptions = BaOptions(), landmarks0=None):
    """One damped Gauss-Newton step with Schur elimination of landmarks.

    ``landmarks0`` (with ``opts.landmark_prior > 0``) anchors landmarks
    to their initial metric positions. Returns (q_cw, t_cw, landmarks)
    updated."""
    # Normal equations are ill-conditioned; the TPU MXU's default bf16
    # matmul precision diverges here — force full float32 contractions.
    if landmarks0 is None:
        landmarks0 = landmarks
    with jax.default_matmul_precision("float32"):
        return _ba_step_f32(q_cw, t_cw, landmarks, obs_pose_idx, obs_uv,
                            obs_mask, k4, opts, landmarks0)


def _ba_step_f32(q_cw, t_cw, landmarks, obs_pose_idx, obs_uv, obs_mask, k4,
                 opts: BaOptions, landmarks0):
    num_poses = q_cw.shape[0]
    r, j_pose, j_lm, _ = _jacobians(q_cw, t_cw, landmarks, obs_pose_idx,
                                    obs_uv, obs_mask, k4)
    if opts.huber_px > 0.0:
        # IRLS Huber weights per observation (scale r and J by sqrt(w)).
        rn = jnp.linalg.norm(r, axis=-1)                         # [L,O]
        sw = jnp.sqrt(jnp.minimum(1.0, opts.huber_px
                                  / jnp.maximum(rn, 1e-6)))
        r = r * sw[..., None]
        j_pose = j_pose * sw[..., None, None]
        j_lm = j_lm * sw[..., None, None]

    # Landmark-block quantities (all vmapped over the sharded L axis).
    # Damping is RELATIVE (Levenberg-Marquardt lambda*diag(A) + floor):
    # at pixel-unit jacobian scales (fx ~ 700, A entries ~ 1e5) an
    # absolute 1e-4 ridge is below f32 rounding of the Gram product, and
    # a landmark seen from identical poses (rank-2 A) inverts to NaN —
    # which the dx NaN guard then silently turns into a zero step.
    a_l = jnp.einsum("loik,loij->lkj", j_lm, j_lm)               # [L,3,3]
    lm_scale = jnp.diagonal(a_l, axis1=1, axis2=2)               # [L,3]
    a_l = a_l + jnp.eye(3) * (opts.landmark_damping * lm_scale
                              + opts.landmark_damping)[:, None, :]
    g_l = -jnp.einsum("loik,loi->lk", j_lm, r)                   # [L,3]
    if opts.landmark_prior > 0.0:
        # Quadratic metric prior 0.5*w*|lm - lm0|^2: normal equations
        # gain w*I on A and -w*(lm - lm0) on g (W/B untouched, so the
        # Schur elimination below absorbs it unchanged).
        a_l = a_l + opts.landmark_prior * jnp.eye(3)
        g_l = g_l - opts.landmark_prior * (landmarks - landmarks0)
    w = jnp.einsum("loik,loij->lokj", j_pose, j_lm)              # [L,O,6,3]
    b_blk = jnp.einsum("loik,loij->lokj", j_pose, j_pose)        # [L,O,6,6]
    c = -jnp.einsum("loik,loi->lok", j_pose, r)                  # [L,O,6]

    a_inv = jnp.linalg.inv(a_l)                                  # [L,3,3]
    w_ainv = jnp.einsum("loij,ljk->loik", w, a_inv)              # [L,O,6,3]

    # Schur contributions: diag GN blocks minus W A^-1 W^T pair blocks.
    pair = -jnp.einsum("loik,lpjk->lopij", w_ainv, w)            # [L,O,O,6,6]
    o = obs_uv.shape[1]
    eye_o = jnp.eye(o, dtype=bool)
    pair = pair + jnp.where(eye_o[None, :, :, None, None],
                            b_blk[:, :, None], 0.0)
    rhs = c - jnp.einsum("loik,lk->loi", w_ainv, g_l)            # [L,O,6]

    # Scatter into the reduced camera system. With L sharded this
    # all-reduces across the mesh (the per-iteration psum).
    rows = jnp.broadcast_to(obs_pose_idx[:, :, None], pair.shape[:3])
    cols = jnp.broadcast_to(obs_pose_idx[:, None, :], pair.shape[:3])
    h_pp = jnp.zeros((num_poses, num_poses, 6, 6), jnp.float32)
    h_pp = h_pp.at[rows, cols].add(pair)
    b_p = jnp.zeros((num_poses, 6), jnp.float32)
    b_p = b_p.at[obs_pose_idx].add(rhs)

    diag = jnp.arange(num_poses)
    pose_scale = jnp.diagonal(h_pp[diag, diag], axis1=1, axis2=2)  # [P,6]
    h_pp = h_pp.at[diag, diag].add(
        jnp.eye(6) * (opts.pose_damping * pose_scale
                      + opts.pose_damping)[:, None, :])

    if opts.num_fixed_poses > 0:
        # Gauge: freeze the first K poses (zero rows/cols, identity diag).
        keep = jnp.arange(num_poses) >= opts.num_fixed_poses
        h_pp = h_pp * keep[:, None, None, None] * keep[None, :, None, None]
        fixed = jnp.arange(opts.num_fixed_poses)
        h_pp = h_pp.at[fixed, fixed].set(jnp.eye(6))
        b_p = b_p * keep[:, None]

    h_dense = h_pp.transpose(0, 2, 1, 3).reshape(6 * num_poses,
                                                 6 * num_poses)
    dx_p = jnp.linalg.solve(h_dense, b_p.reshape(-1)).reshape(num_poses, 6)
    dx_p = jnp.where(jnp.isnan(dx_p), 0.0, dx_p)

    # Back-substitution (shard-local): dl = A^-1 (g - sum_o W^T dp_o).
    dp_at_obs = dx_p[obs_pose_idx]                               # [L,O,6]
    corr = jnp.einsum("loik,loi->lk", w, dp_at_obs)              # [L,3]
    dl = jnp.einsum("lij,lj->li", a_inv, g_l - corr)
    dl = jnp.where(jnp.isnan(dl), 0.0, dl)

    # Apply updates: left-perturbation pose update, additive landmarks.
    dq = quat_from_small_angle(dx_p[:, :3])
    new_q = quat_normalize(quat_multiply(dq, q_cw))
    new_t = quat_rotate(dq, t_cw) + dx_p[:, 3:]
    return new_q, new_t, landmarks + dl


def bundle_adjust(q_cw, t_cw, landmarks, obs_pose_idx, obs_uv, obs_mask, k4,
                  opts: BaOptions = BaOptions()):
    """Run ``opts.max_iterations`` damped GN steps; returns
    (q_cw, t_cw, landmarks, rms_history [iters+1])."""
    q_cw = jnp.asarray(q_cw, jnp.float32)
    t_cw = jnp.asarray(t_cw, jnp.float32)
    landmarks = jnp.asarray(landmarks, jnp.float32)
    obs_pose_idx = jnp.asarray(obs_pose_idx, jnp.int32)
    obs_uv = jnp.asarray(obs_uv, jnp.float32)
    obs_mask = jnp.asarray(obs_mask, bool)
    k4 = jnp.asarray(k4, jnp.float32)

    landmarks0 = landmarks
    rms = [reprojection_rms(q_cw, t_cw, landmarks, obs_pose_idx, obs_uv,
                            obs_mask, k4)]
    for _ in range(opts.max_iterations):
        q_cw, t_cw, landmarks = ba_step(q_cw, t_cw, landmarks, obs_pose_idx,
                                        obs_uv, obs_mask, k4, opts,
                                        landmarks0)
        rms.append(reprojection_rms(q_cw, t_cw, landmarks, obs_pose_idx,
                                    obs_uv, obs_mask, k4))
    return q_cw, t_cw, landmarks, jnp.stack(rms)
