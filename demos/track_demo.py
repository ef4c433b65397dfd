"""Sparse pyramidal KLT demo — port of the reference's test_optical_flow
(reference: test/test_optical_flow.cpp:171-185): Harris detect (min
distance 25, min response 40, <=300 features), 4-level pyramid, half-patch
6, fast solver; runs Basic / Affine / LSSD variants, prints tracked counts
and timing, writes status-colored overlays."""

import _common  # noqa: F401  (sys.path setup)

import jax.numpy as jnp
import numpy as np

from feature_tracker_tpu.core.config import HarrisOptions, KltMethod, KltOptions
from feature_tracker_tpu.core.status import TrackStatus
from feature_tracker_tpu.ops.detect import detect_good_features
from feature_tracker_tpu.ops.pyramid import build_pyramid
from feature_tracker_tpu.trackers.klt import AffineKlt, BasicKlt, LssdKlt
from feature_tracker_tpu.utils import TickTock, report_info, time_jitted
from feature_tracker_tpu.utils.viz import render_tracked_features, save_png

MAX_FEATURES = 300
PYRAMID_LEVELS = 4
HALF_PATCH = 6


def main():
    ref, cur, source = _common.load_optical_flow_pair()
    report_info(f">> Test optical flow ({source} imagery, "
                f"{ref.shape[1]}x{ref.shape[0]}).")

    timer = TickTock()
    ref_j = jnp.asarray(ref)
    cur_j = jnp.asarray(cur)
    uv, num = detect_good_features(
        ref_j, MAX_FEATURES,
        HarrisOptions(min_feature_distance=25, min_valid_response=40.0))
    uv, num = np.asarray(uv), int(num)
    report_info(f"Detected {num} features in "
                f"{timer.tock_tick_ms():.2f} ms (incl. compile).")

    ref_pyr = build_pyramid(ref_j, PYRAMID_LEVELS)
    cur_pyr = build_pyramid(cur_j, PYRAMID_LEVELS)
    opts = KltOptions(max_track_points=MAX_FEATURES,
                      patch_row_half_size=HALF_PATCH,
                      patch_col_half_size=HALF_PATCH,
                      method=KltMethod.FAST)

    for name, tracker in [("basic", BasicKlt(opts)),
                          ("affine", AffineKlt(opts)),
                          ("lssd", LssdKlt(opts))]:
        (cur_uv, status), stats = time_jitted(
            tracker.track, ref_pyr, cur_pyr, uv[:num], iters=10)
        tracked = int((np.asarray(status) == int(TrackStatus.TRACKED)).sum())
        report_info(
            f"{name} klt (fast) tracked {tracked} / {num} features; "
            f"{stats['mean_ms']:.3f} ms/call steady state "
            f"({stats['compile_ms']:.0f} ms first call).")
        overlay = render_tracked_features(cur, uv[:num], np.asarray(cur_uv),
                                          np.asarray(status))
        path = _common.out_path(f"klt_{name}_tracking.png")
        save_png(path, overlay)
        report_info(f"Wrote {path}")


if __name__ == "__main__":
    main()
