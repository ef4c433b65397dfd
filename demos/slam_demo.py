"""SLAM front-end capstone demo: persistent KLT tracking feeding the
sliding-window Schur-complement bundle adjuster, cross-validated against
the direct photometric method.

This exercises the new-scope production path end-to-end (the reference
stops at per-pair demo loops, test_optical_flow.cpp): the
TrackingFrontEnd tracks the KITTI direct-method sequence with persistent
identities, frame-0 tracks are back-projected through the disparity map
into landmarks (reference intrinsics, test_direct_method.cpp:12-20), each
frame becomes a keyframe with identity-initialized pose, and the window
BA refines all poses + landmarks jointly. The refined camera trajectory
is then compared per-frame against the DirectMethod SE(3) solve — two
independent estimators (feature-reprojection BA vs dense photometric GN)
agreeing on the same motion is the checkable signal. Writes a top-down
trajectory plot + final-frame track overlay."""

import _common  # noqa: F401

import jax.numpy as jnp
import numpy as np

from feature_tracker_tpu.core.status import TrackStatus
from feature_tracker_tpu.ops.pyramid import build_pyramid
from feature_tracker_tpu.parallel.ba import BaOptions
from feature_tracker_tpu.parallel.window_ba import (
    SlidingWindowBa,
    WindowConfig,
)
from feature_tracker_tpu.pipeline import FrontEndConfig, TrackingFrontEnd
from feature_tracker_tpu.trackers.direct import DirectMethod
from feature_tracker_tpu.utils import TickTock, report_info
from feature_tracker_tpu.utils.viz import (
    draw_lines,
    draw_points,
    render_tracked_features,
    save_png,
)

# KITTI-style intrinsics (reference: test_direct_method.cpp:12-20).
FX, FY, CX, CY = 718.856, 718.856, 607.1928, 185.2157
BASELINE = 0.573


def trajectory_plot(trajs, size=420):
    """Top-down (x, z) trajectory canvas; trajs: list of [T, 3]."""
    rgb = np.full((size, size, 3), 255, np.uint8)
    allp = np.concatenate(trajs, axis=0)
    lo = allp.min(axis=0)
    hi = allp.max(axis=0)
    span = max(float(hi[0] - lo[0]), float(hi[2] - lo[2]), 0.5)
    margin = 40

    def to_px(t):
        x = (t[:, 0] - lo[0]) / span * (size - 2 * margin) + margin
        z = (t[:, 2] - lo[2]) / span * (size - 2 * margin) + margin
        return np.stack([x, size - 1 - z], -1).astype(np.float32)

    colors = [(30, 120, 255), (230, 60, 60), (40, 180, 90)]
    for traj, color in zip(trajs, colors):
        px = to_px(traj)
        draw_lines(rgb, px[:-1], px[1:], color)
        draw_points(rgb, px, color, radius=3)
    return rgb


def main():
    left, disparity, cur_frames, source = _common.load_direct_method_set()
    frames = [left] + list(cur_frames)
    h, w = left.shape
    report_info(f">> SLAM front-end demo ({source} imagery, {w}x{h}, "
                f"{len(frames)} frames).")

    # ---- 1. Persistent tracking with identities -------------------------
    fe = TrackingFrontEnd(FrontEndConfig())
    results = [fe.process_frame(f) for f in frames]
    for r in results:
        report_info(f"frame {r.frame_id}: live tracks {r.num_live}")

    # ---- 2. Landmarks from frame-0 disparity ---------------------------
    r0 = results[0]
    lane_ok = r0.track_ids >= 0
    uv0 = r0.uv
    disp = disparity[np.clip(uv0[:, 1].astype(int), 0, h - 1),
                     np.clip(uv0[:, 0].astype(int), 0, w - 1)]
    depth = FX * BASELINE / np.maximum(disp, 1.0)
    usable = lane_ok & (disp > 1.0) & (depth < 80.0)
    p_w = np.stack([(uv0[:, 0] - CX) / FX * depth,
                    (uv0[:, 1] - CY) / FY * depth,
                    depth], -1)

    k4 = np.array([FX, FY, CX, CY], np.float32)
    # landmark_prior anchors the disparity-seeded landmarks to their
    # metric depths (the scale gauge would otherwise be free).
    wba = SlidingWindowBa(k4, WindowConfig(max_keyframes=len(frames),
                                           max_landmarks=512,
                                           obs_per_landmark=len(frames)),
                          BaOptions(max_iterations=20,
                                    landmark_prior=30.0, huber_px=2.0))

    kf_slots = [wba.add_keyframe([1, 0, 0, 0], [0, 0, 0])
                for _ in frames]
    lm_slot_of_lane = {}
    for lane in np.nonzero(usable)[0]:
        lm_slot_of_lane[lane] = wba.add_landmark(p_w[lane])

    # Observations: every frame where the lane is alive and still carries
    # the SAME identity it had on frame 0 (persistent ids are the point).
    n_obs = 0
    for r in results:
        for lane, slot in lm_slot_of_lane.items():
            if (r.track_ids[lane] == r0.track_ids[lane]
                    and r.status[lane] == int(TrackStatus.TRACKED)):
                wba.add_observation(slot, kf_slots[r.frame_id],
                                    r.uv[lane])
                n_obs += 1
    report_info(f"window: {len(lm_slot_of_lane)} landmarks, "
                f"{len(frames)} keyframes, {n_obs} observations")

    # ---- 3. Window BA ----------------------------------------------------
    timer = TickTock()
    rms = wba.optimize()
    ms = timer.tock_tick_ms()
    report_info(f"BA rms {rms[0]:.3f} -> {rms[-1]:.3f} px over "
                f"{len(rms) - 1} iterations ({ms:.0f} ms incl. compile)")

    # Camera position in world = -R^T t  (q_cw, t_cw convention).
    from feature_tracker_tpu.core.geometry import quat_to_matrix
    rot = np.asarray(quat_to_matrix(jnp.asarray(wba.q_cw)))
    cam_ba = -np.einsum("kij,kj->ki", rot.transpose(0, 2, 1), wba.t_cw)

    # ---- 4. Cross-check: direct photometric method ----------------------
    ref_pyr = build_pyramid(jnp.asarray(left), 5)
    solver = DirectMethod()
    ref_uv = uv0[usable].astype(np.float32)
    p_c_ref = p_w[usable].astype(np.float32)
    cam_direct = [np.zeros(3)]
    q_rc, p_rc = None, None
    for cur in cur_frames:
        cur_pyr = build_pyramid(jnp.asarray(cur), 5)
        _, q_rc, p_rc, _ = solver.track(ref_pyr, cur_pyr, k4, p_c_ref,
                                        ref_uv, q_rc, p_rc)
        q = np.asarray(q_rc)
        p = np.asarray(p_rc)
        # T_rc maps cur-camera to ref(world): camera center = p directly.
        cam_direct.append(p.astype(np.float64))
    cam_direct = np.stack(cam_direct)

    err = np.linalg.norm(cam_ba[1:len(frames)] - cam_direct[1:], axis=1)
    for i in range(1, len(frames)):
        report_info(
            f"frame {i}: BA cam [{cam_ba[i][0]:+.3f} {cam_ba[i][1]:+.3f} "
            f"{cam_ba[i][2]:+.3f}]  direct [{cam_direct[i][0]:+.3f} "
            f"{cam_direct[i][1]:+.3f} {cam_direct[i][2]:+.3f}]  "
            f"|Δ| {err[i - 1]:.3f} m")
    report_info(f"BA vs direct mean |Δ| {err.mean():.3f} m over "
                f"{len(err)} frames")

    # ---- 5. Render -------------------------------------------------------
    plot = trajectory_plot([cam_ba[:len(frames)], cam_direct])
    save_png(_common.out_path("slam_trajectory.png"), plot)
    last = results[-1]
    overlay = render_tracked_features(frames[-1], results[-2].uv, last.uv,
                                      last.status)
    save_png(_common.out_path("slam_front_end_tracks.png"), overlay)
    report_info(">> wrote slam_trajectory.png (blue: BA, red: direct) "
                "and slam_front_end_tracks.png")


if __name__ == "__main__":
    main()
