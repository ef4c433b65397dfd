"""Streaming tracking demo: native ring-buffer pipeline + Pallas KLT.

Production restructuring of the reference's frame loop: a producer thread
feeds KITTI frames (uint8) through the C++ SPSC ring; the consumer builds
pyramids with the fused native convert+pyramid and tracks features
frame-to-frame on the TPU. Prints per-frame latency and survival."""

import _common  # noqa: F401

import jax.numpy as jnp
import numpy as np

from feature_tracker_tpu.core.config import HarrisOptions, KltOptions
from feature_tracker_tpu.core.status import TrackStatus
from feature_tracker_tpu.ops.detect import detect_good_features
from feature_tracker_tpu.runtime import FrameStream, build_native, get_runtime
from feature_tracker_tpu.trackers.klt import BasicKlt
from feature_tracker_tpu.utils import report_info

LEVELS = 4
MAX_FEATURES = 300


def main():
    left, _, cur_frames, source = _common.load_direct_method_set()
    report_info(f">> Streaming tracking demo ({source} imagery, "
                f"native={build_native() and get_runtime().is_native}).")

    frames = [np.clip(f, 0, 255).astype(np.uint8)
              for f in [left] + list(cur_frames)]
    rt = get_runtime()

    # Fixed-capacity state (uv + status), so every frame reuses ONE
    # compiled program: failed lanes are skipped by the tracker
    # (reference semantics) instead of being filtered out, which would
    # change shapes and force a recompile per frame.
    tracker = BasicKlt(KltOptions(max_track_points=MAX_FEATURES))
    detect_opts = HarrisOptions(min_feature_distance=25,
                                min_valid_response=40.0)
    prev_pyr = None
    uv = None
    status = None
    t_all = rt.now_ns()
    for fid, pyr in FrameStream(iter(frames), levels=LEVELS, capacity=4):
        pyr_j = tuple(jnp.asarray(level) for level in pyr)
        if prev_pyr is None:
            uv, num = detect_good_features(pyr_j[0], MAX_FEATURES,
                                           detect_opts)
            status = jnp.where(jnp.arange(MAX_FEATURES) < num,
                               jnp.int8(int(TrackStatus.NOT_TRACKED)),
                               jnp.int8(int(TrackStatus.OUTSIDE)))
            report_info(f"frame {fid}: detected {int(num)} features")
        else:
            t0 = rt.now_ns()
            uv, status = tracker.track(prev_pyr, pyr_j, uv, uv, status)
            status.block_until_ready()
            ms = (rt.now_ns() - t0) / 1e6
            alive = int((np.asarray(status)
                         == int(TrackStatus.TRACKED)).sum())
            report_info(f"frame {fid}: tracked {alive}/{MAX_FEATURES} "
                        f"lanes in {ms:.1f} ms"
                        + (" (incl. compile)" if fid == 1 else ""))
            # Survivors continue; failed lanes stay failed (reference:
            # basic_klt.cpp:15). Reset survivors to NOT_TRACKED so the
            # next frame re-tracks them.
            status = jnp.where(
                status == jnp.int8(int(TrackStatus.TRACKED)),
                jnp.int8(int(TrackStatus.NOT_TRACKED)), status)
        prev_pyr = pyr_j
    total_ms = (rt.now_ns() - t_all) / 1e6
    report_info(f"Processed {len(frames)} frames in {total_ms:.0f} ms "
                f"(incl. compiles).")


if __name__ == "__main__":
    main()
