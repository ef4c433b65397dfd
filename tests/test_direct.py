import numpy as np
import pytest

import jax.numpy as jnp

from feature_tracker_tpu.core.geometry import (
    quat_multiply,
    quat_rotate,
    quat_to_matrix,
)
from feature_tracker_tpu.ops.pyramid import build_pyramid
from feature_tracker_tpu.trackers.direct import (
    DirectMethod,
    DirectMethodMode,
    DirectMethodOptions,
)

from tests.synthetic import Texture

H, W = 240, 320
K4 = np.array([200.0, 200.0, 160.0, 120.0], np.float32)
Z0 = 5.0
TEX_SCALE = 18.0  # world units -> texture pixels


def _render_plane(tex, q_wc, p_wc):
    """Render a camera viewing the textured plane z=Z0 (world frame)."""
    rot = np.asarray(quat_to_matrix(jnp.asarray(q_wc)))
    vv, uu = np.mgrid[0:H, 0:W].astype(np.float64)
    d_cam = np.stack([(uu - K4[2]) / K4[0], (vv - K4[3]) / K4[1],
                      np.ones_like(uu)], axis=-1)
    d_world = d_cam @ rot.T
    lam = (Z0 - p_wc[2]) / d_world[..., 2]
    x = p_wc[0] + lam * d_world[..., 0]
    y = p_wc[1] + lam * d_world[..., 1]
    return tex.eval(x * TEX_SCALE, y * TEX_SCALE).astype(np.float32)


def _scene(q_cur, p_cur, seed=11):
    tex = Texture(seed, min_period=8.0, max_period=80.0)
    ref = _render_plane(tex, np.array([1.0, 0, 0, 0]), np.zeros(3))
    cur = _render_plane(tex, q_cur, p_cur)
    # Features: back-project a pixel grid of the reference view.
    us = np.arange(50, W - 50, 20, dtype=np.float64)
    vs = np.arange(50, H - 50, 20, dtype=np.float64)
    gu, gv = np.meshgrid(us, vs)
    ref_uv = np.stack([gu.reshape(-1), gv.reshape(-1)], -1).astype(np.float32)
    p_ref = np.stack([(ref_uv[:, 0] - K4[2]) / K4[0] * Z0,
                      (ref_uv[:, 1] - K4[3]) / K4[1] * Z0,
                      np.full(len(ref_uv), Z0)], -1).astype(np.float32)
    return ref, cur, ref_uv, p_ref


def _small_quat(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    return np.concatenate([[np.cos(angle / 2)],
                           np.sin(angle / 2) * axis]).astype(np.float32)


@pytest.mark.parametrize("mode", [DirectMethodMode.DIRECT,
                                  DirectMethodMode.INVERSE,
                                  DirectMethodMode.FAST])
def test_direct_method_recovers_pose(mode):
    q_true = _small_quat([0, 1, 0], 0.01)
    p_true = np.array([0.12, -0.06, 0.08], np.float32)
    ref, cur, ref_uv, p_ref = _scene(q_true, p_true)
    ref_pyr = build_pyramid(jnp.asarray(ref), 3)
    cur_pyr = build_pyramid(jnp.asarray(cur), 3)
    tracker = DirectMethod(DirectMethodOptions(method=mode))
    cur_uv, q, p, status = tracker.track(ref_pyr, cur_pyr, K4, p_ref, ref_uv)
    p = np.asarray(p)
    q = np.asarray(q)
    assert np.linalg.norm(p - p_true) < 0.02, p
    # Quaternion sign-invariant distance.
    qd = min(np.linalg.norm(q - q_true), np.linalg.norm(q + q_true))
    assert qd < 5e-3, q
    # Reprojections should agree with the ground-truth projection.
    st = np.asarray(status)
    assert (st == 1).mean() > 0.9


def test_direct_method_world_entry_composes():
    q_true = _small_quat([1, 0, 0], -0.008)
    p_true = np.array([-0.08, 0.1, 0.05], np.float32)
    ref, cur, ref_uv, p_ref = _scene(q_true, p_true, seed=13)
    ref_pyr = build_pyramid(jnp.asarray(ref), 3)
    cur_pyr = build_pyramid(jnp.asarray(cur), 3)

    # Place the reference camera at an arbitrary world pose and express the
    # landmarks in world coordinates.
    q_wr = _small_quat([0.3, -0.5, 0.8], 0.4)
    p_wr = np.array([1.0, -2.0, 0.5], np.float32)
    p_w = np.asarray(quat_rotate(jnp.asarray(q_wr)[None], jnp.asarray(p_ref))
                     ) + p_wr
    # True current world pose = T_wr * T_rc(true).
    q_wc_true = np.asarray(quat_multiply(jnp.asarray(q_wr),
                                         jnp.asarray(q_true)))
    p_wc_true = np.asarray(quat_rotate(jnp.asarray(q_wr),
                                       jnp.asarray(p_true))) + p_wr

    tracker = DirectMethod()
    _, q_wc, p_wc, _ = tracker.track_world(
        ref_pyr, cur_pyr, K4, q_wr, p_wr, p_w, ref_uv,
        cur_q_wc=q_wr, cur_p_wc=p_wr)  # init at the reference pose
    assert np.linalg.norm(np.asarray(p_wc) - p_wc_true) < 0.02
    qd = min(np.linalg.norm(np.asarray(q_wc) - q_wc_true),
             np.linalg.norm(np.asarray(q_wc) + q_wc_true))
    assert qd < 5e-3
