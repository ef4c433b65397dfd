"""Tests for the parallel package: meshes, sharded tracking, sharded BA.

conftest.py provides 8 virtual CPU devices; every sharded path is checked
for numerical agreement with its single-device equivalent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feature_tracker_tpu.core.geometry import quat_rotate
from feature_tracker_tpu.core.status import TrackStatus
from feature_tracker_tpu.ops.pyramid import build_pyramid
from feature_tracker_tpu.parallel import (
    BaOptions,
    bundle_adjust,
    feature_sharding,
    make_mesh,
    shard_features,
    track_direct_sharded,
    track_klt_sharded,
)
from feature_tracker_tpu.parallel.ba import reprojection_rms
from feature_tracker_tpu.trackers.direct import DirectMethod
from feature_tracker_tpu.trackers.klt import BasicKlt, KltOptions

from synthetic import translated_pair


def test_make_mesh_default_and_2d():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    mesh2 = make_mesh({"host": 2, "data": -1})
    assert mesh2.devices.shape == (2, 4)
    with pytest.raises(ValueError):
        make_mesh({"data": 16})


def test_shard_features_pads_and_places():
    mesh = make_mesh()
    uv = jnp.ones((13, 2))
    n_pad, s = shard_features(mesh, uv)
    assert n_pad == 16 and s.shape == (16, 2)
    assert s.sharding == feature_sharding(mesh)
    np.testing.assert_allclose(np.asarray(s)[13:], 0.0)


def test_track_klt_sharded_matches_single_device():
    ref, cur = translated_pair(h=96, w=128, shift=(3.0, -2.0))
    ref_pyr = build_pyramid(jnp.asarray(ref), 3)
    cur_pyr = build_pyramid(jnp.asarray(cur), 3)
    rng = np.random.default_rng(0)
    uv = np.stack([rng.uniform(20, 108, 37), rng.uniform(20, 76, 37)],
                  -1).astype(np.float32)
    tracker = BasicKlt(KltOptions(max_track_points=64))

    base_uv, base_st = tracker.track(ref_pyr, cur_pyr, uv)
    mesh = make_mesh()
    sh_uv, sh_st = track_klt_sharded(tracker, mesh, ref_pyr, cur_pyr, uv)
    np.testing.assert_array_equal(np.asarray(base_st), np.asarray(sh_st))
    np.testing.assert_allclose(np.asarray(base_uv), np.asarray(sh_uv),
                               atol=1e-4)
    assert (np.asarray(sh_st) == int(TrackStatus.TRACKED)).sum() > 25


def test_track_direct_sharded_matches_single_device():
    ref, cur = translated_pair(h=96, w=160, shift=(0.0, 4.0))
    ref_pyr = build_pyramid(jnp.asarray(ref), 3)
    cur_pyr = build_pyramid(jnp.asarray(cur), 3)
    k4 = np.array([120.0, 120.0, 80.0, 48.0], np.float32)
    rng = np.random.default_rng(1)
    n = 50
    uv = np.stack([rng.uniform(15, 145, n), rng.uniform(15, 81, n)],
                  -1).astype(np.float32)
    depth = rng.uniform(4.0, 8.0, n).astype(np.float32)
    p_ref = np.stack([(uv[:, 0] - k4[2]) / k4[0],
                      (uv[:, 1] - k4[3]) / k4[1],
                      np.ones(n)], -1) * depth[:, None]

    solver = DirectMethod()
    b_uv, b_q, b_p, b_st = solver.track(ref_pyr, cur_pyr, k4, p_ref, uv)
    mesh = make_mesh()
    s_uv, s_q, s_p, s_st = track_direct_sharded(solver, mesh, ref_pyr,
                                                cur_pyr, k4, p_ref, uv)
    # A uniform pixel shift is gauge-degenerate between translation and
    # rotation, so tiny psum reduction-order differences can move the
    # parameters along the flat direction; the physically observable
    # quantities (reprojected pixels, statuses) must agree tightly.
    np.testing.assert_array_equal(np.asarray(b_st), np.asarray(s_st))
    np.testing.assert_allclose(np.asarray(b_uv), np.asarray(s_uv), atol=0.2)
    assert np.abs(np.asarray(b_uv) - np.asarray(s_uv)).mean() < 0.05


def _synthetic_ba(num_poses=6, num_lm=64, obs=4, pix_noise=0.3,
                  state_noise=0.05, seed=0):
    """Random landmarks in front of a forward-moving camera line."""
    rng = np.random.default_rng(seed)
    k4 = np.array([200.0, 200.0, 160.0, 120.0], np.float32)
    lm = np.stack([rng.uniform(-3, 3, num_lm), rng.uniform(-2, 2, num_lm),
                   rng.uniform(8, 16, num_lm)], -1).astype(np.float32)
    q = np.tile(np.array([1.0, 0, 0, 0], np.float32), (num_poses, 1))
    t = np.stack([np.zeros(num_poses), np.zeros(num_poses),
                  -0.4 * np.arange(num_poses)], -1).astype(np.float32)

    # Each landmark observed by `obs` random poses.
    idx = np.stack([rng.choice(num_poses, obs, replace=False)
                    for _ in range(num_lm)]).astype(np.int32)
    p_c = lm[:, None, :] + t[idx]  # identity rotations
    uv = np.stack([k4[0] * p_c[..., 0] / p_c[..., 2] + k4[2],
                   k4[1] * p_c[..., 1] / p_c[..., 2] + k4[3]], -1)
    uv += rng.normal(0, pix_noise, uv.shape)
    mask = np.ones(idx.shape, bool)

    # Perturb the initial state (pose 0 stays at gauge).
    t0 = t.copy()
    t0[1:] += rng.normal(0, state_noise, (num_poses - 1, 3))
    lm0 = lm + rng.normal(0, state_noise, lm.shape)
    return (q.astype(np.float32), t0.astype(np.float32),
            lm0.astype(np.float32), idx, uv.astype(np.float32), mask, k4,
            t.astype(np.float32), lm)


def test_bundle_adjust_converges():
    q0, t0, lm0, idx, uv, mask, k4, t_true, lm_true = _synthetic_ba()
    # Monocular BA has a global scale gauge: fix two poses to pin it
    # (the second perturbed pose is reset to truth to act as the anchor).
    t0[1] = t_true[1]
    q, t, lm, rms = bundle_adjust(q0, t0, lm0, idx, uv, mask, k4,
                                  BaOptions(max_iterations=8,
                                            num_fixed_poses=2))
    rms = np.asarray(rms)
    assert rms[-1] < rms[0] * 0.2
    assert rms[-1] < 1.0  # close to the 0.3 px noise floor
    # Gauge poses untouched.
    np.testing.assert_allclose(np.asarray(t)[:2], t0[:2], atol=1e-6)
    # Poses near ground truth (up to noise).
    assert np.abs(np.asarray(t)[2:] - t_true[2:]).max() < 0.05


def test_bundle_adjust_sharded_matches_single_device():
    q0, t0, lm0, idx, uv, mask, k4, *_ = _synthetic_ba(num_lm=64, seed=3)
    # Two fixed poses: pin the monocular scale direction so reduction-order
    # float noise cannot drift the two runs apart along the flat gauge.
    opts = BaOptions(max_iterations=3, num_fixed_poses=2)
    base = bundle_adjust(q0, t0, lm0, idx, uv, mask, k4, opts)

    mesh = make_mesh()
    sh = feature_sharding(mesh)
    lm_s = jax.device_put(jnp.asarray(lm0), sh)
    idx_s = jax.device_put(jnp.asarray(idx), sh)
    uv_s = jax.device_put(jnp.asarray(uv), sh)
    mask_s = jax.device_put(jnp.asarray(mask), sh)
    shard = bundle_adjust(q0, t0, lm_s, idx_s, uv_s, mask_s, k4, opts)

    # Sharded scatter-adds reduce in a different order; agreement is up to
    # float32 noise (observed ~1e-4 relative), not bitwise.
    np.testing.assert_allclose(np.asarray(base[0]), np.asarray(shard[0]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(base[1]), np.asarray(shard[1]),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(base[2]), np.asarray(shard[2]),
                               rtol=1e-3, atol=5e-3)


def test_bundle_adjust_masked_observations_inert():
    q0, t0, lm0, idx, uv, mask, k4, *_ = _synthetic_ba(num_lm=32, seed=5)
    # Landmark 0: no valid observations -> must not move.
    mask2 = mask.copy()
    mask2[0] = False
    _, _, lm, _ = bundle_adjust(q0, t0, lm0, idx, uv, mask2, k4,
                                BaOptions(max_iterations=2))
    np.testing.assert_allclose(np.asarray(lm)[0], lm0[0], atol=1e-6)


def test_reprojection_rms_zero_at_ground_truth():
    q0, t0, lm0, idx, uv, mask, k4, t_true, lm_true = _synthetic_ba(
        pix_noise=0.0, state_noise=0.0, seed=7)
    rms = reprojection_rms(jnp.asarray(q0), jnp.asarray(t_true),
                           jnp.asarray(lm_true), jnp.asarray(idx),
                           jnp.asarray(uv), jnp.asarray(mask),
                           jnp.asarray(k4))
    assert float(rms) < 1e-3


def test_sliding_window_ba_end_to_end():
    """Full back-end flow: keyframes + landmarks + observations in,
    refined state out; noisy poses pulled toward truth."""
    from feature_tracker_tpu.parallel.window_ba import (
        SlidingWindowBa,
        WindowConfig,
    )

    rng = np.random.default_rng(0)
    k4 = np.array([200.0, 200.0, 160.0, 120.0], np.float32)
    win = SlidingWindowBa(k4, WindowConfig(max_keyframes=4,
                                           max_landmarks=64,
                                           obs_per_landmark=4),
                          BaOptions(max_iterations=6, num_fixed_poses=2))

    t_true = np.stack([np.zeros(4), np.zeros(4),
                       -0.3 * np.arange(4)], -1).astype(np.float32)
    lm_true = np.stack([rng.uniform(-3, 3, 48), rng.uniform(-2, 2, 48),
                        rng.uniform(8, 14, 48)], -1).astype(np.float32)
    for i in range(4):
        noise = 0.0 if i < 2 else rng.normal(0, 0.05, 3)
        win.add_keyframe([1, 0, 0, 0], t_true[i] + noise)
    for j in range(48):
        slot = win.add_landmark(lm_true[j] + rng.normal(0, 0.05, 3))
        for i in range(4):
            p_c = lm_true[j] + t_true[i]
            uv = np.array([k4[0] * p_c[0] / p_c[2] + k4[2],
                           k4[1] * p_c[1] / p_c[2] + k4[3]])
            win.add_observation(slot, i, uv + rng.normal(0, 0.2, 2))

    rms = win.optimize()
    assert rms[-1] < rms[0]
    assert rms[-1] < 0.5
    assert np.abs(win.t_cw[2:4] - t_true[2:4]).max() < 0.03


def test_sliding_window_slides_and_drops_oldest():
    from feature_tracker_tpu.parallel.window_ba import (
        SlidingWindowBa,
        WindowConfig,
    )
    k4 = np.array([100.0, 100.0, 50.0, 50.0], np.float32)
    win = SlidingWindowBa(k4, WindowConfig(max_keyframes=2,
                                           max_landmarks=4,
                                           obs_per_landmark=2))
    win.add_keyframe([1, 0, 0, 0], [0, 0, 0])
    win.add_keyframe([1, 0, 0, 0], [0, 0, -1])
    s = win.add_landmark([0, 0, 5])
    win.add_observation(s, 0, [50, 50])
    win.add_observation(s, 1, [50, 50])
    win.add_keyframe([1, 0, 0, 0], [0, 0, -2])  # slides
    # Keyframe-0 observation dropped, keyframe-1's shifted to slot 0.
    assert win.obs_mask[s].sum() == 1
    assert win.obs_pose[s][win.obs_mask[s]][0] == 0
    np.testing.assert_allclose(win.t_cw[1], [0, 0, -2])


def test_bundle_adjust_on_2d_mesh():
    """BA sharded over a 2-axis (host x data, the DCN x ICI layout)
    mesh must agree with the single-device result."""
    q0, t0, lm0, idx, uv, mask, k4, *_ = _synthetic_ba(num_lm=64, seed=9)
    opts = BaOptions(max_iterations=2, num_fixed_poses=2)
    base = bundle_adjust(q0, t0, lm0, idx, uv, mask, k4, opts)

    mesh = make_mesh({"host": 2, "data": -1})
    sh = feature_sharding(mesh)
    shard = bundle_adjust(q0, t0,
                          jax.device_put(jnp.asarray(lm0), sh),
                          jax.device_put(jnp.asarray(idx), sh),
                          jax.device_put(jnp.asarray(uv), sh),
                          jax.device_put(jnp.asarray(mask), sh),
                          k4, opts)
    np.testing.assert_allclose(np.asarray(base[1]), np.asarray(shard[1]),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(base[2]), np.asarray(shard[2]),
                               rtol=1e-3, atol=5e-3)


def test_track_klt_sharded_respects_global_cap():
    """max_track_points is a GLOBAL index cap; under shard_map the cap is
    applied outside the map (local shard order is not global order)."""
    ref, cur = translated_pair(h=96, w=128, shift=(2.0, -1.0))
    ref_pyr = build_pyramid(jnp.asarray(ref), 2)
    cur_pyr = build_pyramid(jnp.asarray(cur), 2)
    rng = np.random.default_rng(2)
    uv = np.stack([rng.uniform(20, 108, 24), rng.uniform(20, 76, 24)],
                  -1).astype(np.float32)
    tracker = BasicKlt(KltOptions(max_track_points=10))
    base_uv, base_st = tracker.track(ref_pyr, cur_pyr, uv)
    mesh = make_mesh()
    sh_uv, sh_st = track_klt_sharded(tracker, mesh, ref_pyr, cur_pyr, uv)
    np.testing.assert_array_equal(np.asarray(base_st), np.asarray(sh_st))
    np.testing.assert_allclose(np.asarray(base_uv), np.asarray(sh_uv),
                               atol=1e-4)
    # Capped lanes keep their inputs.
    np.testing.assert_array_equal(np.asarray(sh_uv)[10:], uv[10:])


def test_pallas_kernel_runs_under_shard_map():
    """The Pallas pyramid kernel (interpret mode on CPU) must compose
    with shard_map over the feature axis — the code path real TPU meshes
    take (VERDICT r1 item 4)."""
    from functools import partial
    from feature_tracker_tpu.core.config import KltOptions as KO
    from feature_tracker_tpu.ops.pallas_klt import (
        track_pyramid_fast_pallas,
    )
    from jax.sharding import PartitionSpec as P

    ref, cur = translated_pair(h=64, w=96, shift=(2.0, -1.0))
    ref_pyr = build_pyramid(jnp.asarray(ref), 2)
    cur_pyr = build_pyramid(jnp.asarray(cur), 2)
    rng = np.random.default_rng(3)
    n = 32
    uv = jnp.asarray(np.stack([rng.uniform(10, 86, n),
                               rng.uniform(10, 54, n)],
                              -1).astype(np.float32))
    opts = KO(max_track_points=n)

    base_uv, base_st = track_pyramid_fast_pallas(opts, ref_pyr, cur_pyr,
                                                 uv, uv, interpret=True)
    mesh = make_mesh()
    sh = feature_sharding(mesh)
    uv_sh = jax.device_put(uv, sh)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P(), P("data"), P("data")),
             out_specs=(P("data"), P("data")), check_vma=False)
    def run(rp, cp, r, c):
        return track_pyramid_fast_pallas(opts, rp, cp, r, c,
                                         interpret=True)

    sh_uv, sh_st = run(ref_pyr, cur_pyr, uv_sh, uv_sh)
    np.testing.assert_array_equal(np.asarray(base_st), np.asarray(sh_st))
    np.testing.assert_allclose(np.asarray(base_uv), np.asarray(sh_uv),
                               atol=1e-4)


@pytest.mark.parametrize("kind", ["affine", "lssd"])
def test_track_warp_klt_sharded_matches_single_device(kind):
    """Affine/LSSD through the shard_map wrapper (VERDICT r2 item 7: the
    warp trackers must not keep an unpartitioned-Pallas hole under a
    mesh) agree with the single-device tracker."""
    from feature_tracker_tpu.trackers.klt import AffineKlt, LssdKlt

    ref, cur = translated_pair(h=96, w=128, shift=(2.0, -1.0))
    ref_pyr = build_pyramid(jnp.asarray(ref), 2)
    cur_pyr = build_pyramid(jnp.asarray(cur), 2)
    rng = np.random.default_rng(5)
    n = 24
    uv = np.stack([rng.uniform(20, 108, n), rng.uniform(20, 76, n)],
                  -1).astype(np.float32)
    cls = {"affine": AffineKlt, "lssd": LssdKlt}[kind]
    tracker = cls(KltOptions(max_track_points=n))
    base_uv, base_st = tracker.track(ref_pyr, cur_pyr, uv)
    mesh = make_mesh()
    sh_uv, sh_st = track_klt_sharded(tracker, mesh, ref_pyr, cur_pyr, uv)
    np.testing.assert_array_equal(np.asarray(base_st), np.asarray(sh_st))
    both = (np.asarray(base_st) == 1)
    np.testing.assert_allclose(np.asarray(base_uv)[both],
                               np.asarray(sh_uv)[both], atol=1e-3)


def test_measure_ba_scaling_runs_and_reports():
    """The measured-scaling probe returns timings for 1-dev and the full
    mesh plus analytic estimates; the full-mesh step must not be slower
    than ~3x the single-device step (sanity, not a perf target — the
    virtual devices share host cores)."""
    from feature_tracker_tpu.parallel import measure_ba_scaling

    out = measure_ba_scaling(num_landmarks=512, iters=2)
    assert out["n_devices"] == 8
    assert out["step_ms_1dev"] > 0
    assert out["step_ms_8dev_flat"] > 0
    assert "analytic" in out and out["analytic"]["psum_bytes"] > 0
    assert out["step_ms_8dev_flat"] < 3.0 * out["step_ms_1dev"] + 50.0


def test_overhead_vs_landmarks_hlo_validates_analytic_bytes():
    """The L-sweep's HLO-extracted all-reduce payload must EQUAL the
    closed-form psum bytes (the collective is the [6P,6P]+[6P] reduced
    camera system, independent of L), and the extrapolated 2-host
    efficiency must clear the >=80% north-star at every measured L."""
    from feature_tracker_tpu.parallel.scaling import (
        measure_overhead_vs_landmarks,
    )

    out = measure_overhead_vs_landmarks(l_list=(512, 8192), iters=1)
    assert out["hlo_allreduce_bytes"] == out["analytic_psum_bytes"] > 0
    assert out["serial_ms_measured"] > 0
    ls = [row["L"] for row in out["sweep"]]
    assert ls == [512, 8192]
    # Parallel (landmark-local) work grows with L; the serial+dcn share
    # shrinks and efficiency rises — the amortization the north star
    # relies on. The >=80% bar applies at realistic landmark counts
    # (8k+); a 512-landmark toy problem is honestly below it.
    assert (out["sweep"][1]["parallel_ms"]
            > out["sweep"][0]["parallel_ms"])
    assert (out["sweep"][1]["serial_plus_dcn_frac"]
            < out["sweep"][0]["serial_plus_dcn_frac"] + 1e-6)
    assert (out["sweep"][1]["extrapolated_2host_efficiency"]
            >= max(0.8, out["sweep"][0]["extrapolated_2host_efficiency"]
                   - 1e-6)), out["sweep"]


def test_bundle_adjust_kitti_scale_identity_init():
    """Regression (r3 slam demo): at pixel-unit jacobian scales
    (fx ~ 700, Gram entries ~ 1e5) the old ABSOLUTE 1e-4 damping was
    below f32 rounding — a landmark observed from identical initial
    poses has a rank-2 system, inv() went NaN and the NaN guard silently
    zeroed the whole step (poses frozen at identity forever). Relative
    (LM) damping + the metric landmark prior must recover a KITTI-scale
    forward trajectory from all-identity initialization."""
    rng = np.random.default_rng(3)
    fx = fy = 718.856
    cx, cy = 607.2, 185.2
    k4 = np.array([fx, fy, cx, cy], np.float32)
    n_lm, n_pose = 120, 5
    depth = rng.uniform(5, 60, n_lm)
    u = rng.uniform(100, 1140, n_lm)
    v = rng.uniform(50, 330, n_lm)
    lm0 = np.stack([(u - cx) / fx * depth, (v - cy) / fy * depth,
                    depth], -1).astype(np.float32)
    t_true = np.stack([[0.0, 0.0, -0.8 * k] for k in range(n_pose)],
                      0).astype(np.float32)
    idx = np.tile(np.arange(n_pose, dtype=np.int32)[None], (n_lm, 1))
    p_c = lm0[:, None, :] + t_true[None]
    uv = np.stack([fx * p_c[..., 0] / p_c[..., 2] + cx,
                   fy * p_c[..., 1] / p_c[..., 2] + cy],
                  -1).astype(np.float32)
    mask = ((np.abs(uv[..., 0] - cx) < cx)
            & (np.abs(uv[..., 1] - cy) < cy))

    q0 = np.tile(np.array([1, 0, 0, 0], np.float32), (n_pose, 1))
    q, t, lm, rms = bundle_adjust(
        q0, np.zeros((n_pose, 3), np.float32), lm0, idx, uv, mask, k4,
        BaOptions(max_iterations=15, landmark_prior=30.0))
    assert float(rms[-1]) < 0.05, np.asarray(rms)
    # Metric trajectory recovered from identity init (not a scaled copy).
    np.testing.assert_allclose(np.asarray(t), t_true, atol=0.02)


def test_bundle_adjust_huber_downweights_outliers():
    """One grossly corrupted observation must not drag the solution:
    with the Huber kernel the recovered trajectory stays metric-true
    despite a 60 px outlier; pure L2 visibly bends toward it."""
    rng = np.random.default_rng(4)
    fx = fy = 718.856
    cx, cy = 607.2, 185.2
    k4 = np.array([fx, fy, cx, cy], np.float32)
    n_lm, n_pose = 80, 4
    depth = rng.uniform(5, 50, n_lm)
    u = rng.uniform(200, 1000, n_lm)
    v = rng.uniform(60, 320, n_lm)
    lm0 = np.stack([(u - cx) / fx * depth, (v - cy) / fy * depth,
                    depth], -1).astype(np.float32)
    t_true = np.stack([[0.0, 0.0, -0.8 * k] for k in range(n_pose)],
                      0).astype(np.float32)
    idx = np.tile(np.arange(n_pose, dtype=np.int32)[None], (n_lm, 1))
    p_c = lm0[:, None, :] + t_true[None]
    uv = np.stack([fx * p_c[..., 0] / p_c[..., 2] + cx,
                   fy * p_c[..., 1] / p_c[..., 2] + cy],
                  -1).astype(np.float32)
    mask = np.ones(uv.shape[:2], bool)
    uv_bad = uv.copy()
    uv_bad[:8, 1:] += 60.0  # 8 corrupted tracks

    q0 = np.tile(np.array([1, 0, 0, 0], np.float32), (n_pose, 1))
    t0 = np.zeros((n_pose, 3), np.float32)
    _, t_l2, _, _ = bundle_adjust(
        q0, t0, lm0, idx, uv_bad, mask, k4,
        BaOptions(max_iterations=15, landmark_prior=30.0))
    _, t_hub, _, _ = bundle_adjust(
        q0, t0, lm0, idx, uv_bad, mask, k4,
        BaOptions(max_iterations=15, landmark_prior=30.0, huber_px=2.0))
    err_l2 = np.abs(np.asarray(t_l2) - t_true).max()
    err_hub = np.abs(np.asarray(t_hub) - t_true).max()
    assert err_hub < 0.05, (err_hub, np.asarray(t_hub))
    assert err_hub < err_l2 / 3.0, (err_hub, err_l2)


def test_multihost_launcher_single_host_form():
    """The pod launcher's CI form runs end-to-end in a subprocess
    (own interpreter: it sets XLA_FLAGS/platform before importing jax)
    and converges the synthetic window."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "multihost_ba.py"),
         "--simulate-hosts", "2", "--landmarks", "2048", "--iters", "4"],
        capture_output=True, text=True, timeout=600, env=env, cwd=repo)
    assert out.returncode == 0, out.stderr[-800:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["hosts"] == 2 and rec["mesh"] == {"dcn": 2, "ici": 4}
    assert rec["rms_final"] < 0.05 * rec["rms_initial"]
