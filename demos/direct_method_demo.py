"""Direct photometric SE(3) pose-tracking demo — port of the reference's
test_direct_method (reference: test/test_direct_method.cpp:28-101): KITTI
intrinsics, 300 random depth-seeded points from the disparity map, 5-level
pyramid; prints the solved pose q_rc / p_rc and timing per current frame."""

import _common  # noqa: F401

import jax.numpy as jnp
import numpy as np

from feature_tracker_tpu.core.status import TrackStatus
from feature_tracker_tpu.ops.pyramid import build_pyramid
from feature_tracker_tpu.trackers.direct import DirectMethod
from feature_tracker_tpu.utils import TickTock, report_info
from feature_tracker_tpu.utils.viz import render_tracked_features, save_png

# KITTI-style intrinsics (reference: test_direct_method.cpp:12-20).
FX, FY, CX, CY = 718.856, 718.856, 607.1928, 185.2157
BASELINE = 0.573
N_POINTS = 300
LEVELS = 5


def main():
    left, disparity, cur_frames, source = _common.load_direct_method_set()
    report_info(f">> Test direct method ({source} imagery, "
                f"{left.shape[1]}x{left.shape[0]}).")

    h, w = left.shape
    rng = np.random.default_rng(0)
    ref_uv = np.stack([rng.integers(0, w, N_POINTS),
                       rng.integers(0, h, N_POINTS)], -1).astype(np.float32)
    disp = disparity[ref_uv[:, 1].astype(int), ref_uv[:, 0].astype(int)]
    depth = FX * BASELINE / np.maximum(disp, 1.0)

    # Back-project to the reference camera frame (identity world pose).
    p_c_ref = np.stack([(ref_uv[:, 0] - CX) / FX,
                        (ref_uv[:, 1] - CY) / FY,
                        np.ones(N_POINTS)], -1) * depth[:, None]

    ref_pyr = build_pyramid(jnp.asarray(left), LEVELS)
    k4 = np.array([FX, FY, CX, CY], np.float32)
    solver = DirectMethod()

    q_rc, p_rc = None, None
    last = None
    for i, cur in enumerate(cur_frames):
        cur_pyr = build_pyramid(jnp.asarray(cur), LEVELS)
        timer = TickTock()
        cur_uv, q_rc, p_rc, status = solver.track(
            ref_pyr, cur_pyr, k4, p_c_ref, ref_uv, q_rc, p_rc)
        q = np.asarray(q_rc)
        p = np.asarray(p_rc)
        ms = timer.tock_tick_ms()
        tracked = int((np.asarray(status) == int(TrackStatus.TRACKED)).sum())
        report_info(
            f"frame {i + 1}: q_rc [{q[0]:.5f} {q[1]:.5f} {q[2]:.5f} "
            f"{q[3]:.5f}], p_rc [{p[0]:.4f} {p[1]:.4f} {p[2]:.4f}], "
            f"tracked {tracked}/{N_POINTS}, {ms:.1f} ms"
            + (" (incl. compile)" if i == 0 else ""))
        last = (cur, cur_uv, status)

    cur, cur_uv, status = last
    overlay = render_tracked_features(cur, ref_uv, np.asarray(cur_uv),
                                      np.asarray(status))
    path = _common.out_path("direct_method_tracking.png")
    save_png(path, overlay)
    report_info(f"Wrote {path}")


if __name__ == "__main__":
    main()
