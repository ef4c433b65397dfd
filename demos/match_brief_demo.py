"""BRIEF descriptor matching demo — port of the reference's
test_descriptor_matcher_brief (reference:
test/test_descriptor_matcher_brief.cpp:48-105): Harris detect (min distance
20, response 40, <=300), 256-bit BRIEF with half-patch 8, nearby match with
a 50-px gate and Hamming threshold 60; prints tracked / total and writes a
side-by-side match image."""

import _common  # noqa: F401

import jax.numpy as jnp
import numpy as np

from feature_tracker_tpu.core.config import HarrisOptions
from feature_tracker_tpu.core.status import TrackStatus
from feature_tracker_tpu.match.brief import compute_brief
from feature_tracker_tpu.match.matcher import (
    fill_matched_pixels,
    hamming_distance_matrix,
    nearby_match,
)
from feature_tracker_tpu.ops.detect import detect_good_features
from feature_tracker_tpu.utils import TickTock, report_info
from feature_tracker_tpu.utils.viz import render_matches, save_png

MAX_FEATURES = 300


def main():
    ref, cur, source = _common.load_optical_flow_pair()
    report_info(f">> Test feature point matcher with BRIEF "
                f"({source} imagery).")

    ref_j, cur_j = jnp.asarray(ref), jnp.asarray(cur)
    opts = HarrisOptions(min_feature_distance=20, min_valid_response=40.0)
    ref_uv, n_ref = detect_good_features(ref_j, MAX_FEATURES, opts)
    cur_uv, n_cur = detect_good_features(cur_j, MAX_FEATURES, opts)
    n_ref, n_cur = int(n_ref), int(n_cur)
    report_info(f"Detected {n_ref} / {n_cur} features in ref / cur image.")

    timer = TickTock()
    ref_bits, ref_valid = compute_brief(ref_j, ref_uv[:n_ref])
    cur_bits, cur_valid = compute_brief(cur_j, cur_uv[:n_cur])
    dist = hamming_distance_matrix(ref_bits, cur_bits)
    # Invalid (border) descriptors behave like the reference's empty
    # descriptors: distance +inf (test_descriptor_matcher_brief.cpp:33-38).
    dist = jnp.where(ref_valid[:n_ref, None] & cur_valid[None, :n_cur],
                     dist, jnp.inf)
    idx = nearby_match(dist, ref_uv[:n_ref], cur_uv[:n_cur],
                       max_valid_distance=60.0,
                       max_col_distance=50.0, max_row_distance=50.0)
    matched_uv, status = fill_matched_pixels(idx, cur_uv[:n_cur])
    status = np.asarray(status)
    ms = timer.tock_tick_ms()
    tracked = int((status == int(TrackStatus.TRACKED)).sum())
    report_info(f"Matched {tracked} / {n_ref} features in {ms:.2f} ms "
                f"(incl. compile).")

    canvas = render_matches(ref, cur, np.asarray(ref_uv[:n_ref]),
                            np.asarray(matched_uv), status)
    path = _common.out_path("match_brief.png")
    save_png(path, canvas)
    report_info(f"Wrote {path}")


if __name__ == "__main__":
    main()
