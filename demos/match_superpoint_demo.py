"""SuperPoint detection + cosine matching demo — port of the reference's
test_descriptor_matcher_superpoint (reference:
test/test_descriptor_matcher_superpoint.cpp:37-86). The reference runs an
opaque pretrained ONNX SuperPoint; here the native Flax SuperPoint runs
with randomly initialized weights, so match quality is only meaningful
after training — the demo exercises the full detect -> describe -> cosine
nearby-match mechanism."""

import _common  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

from feature_tracker_tpu.core.status import TrackStatus
from feature_tracker_tpu.match.matcher import (
    cosine_distance_matrix,
    fill_matched_pixels,
    nearby_match,
)
from feature_tracker_tpu.models.superpoint import SuperPointDetector
from feature_tracker_tpu.utils import TickTock, report_info
from feature_tracker_tpu.utils.viz import render_matches, save_png

MAX_FEATURES = 300


def main():
    ref, cur, source = _common.load_optical_flow_pair()
    detector = SuperPointDetector.from_file(max_features=MAX_FEATURES,
                                            min_response=0.01)
    kind = "pretrained weights"
    if detector is None:
        detector = SuperPointDetector.init_random(
            jax.random.PRNGKey(0), max_features=MAX_FEATURES)
        kind = "untrained weights (run train/pretrain.py)"
    report_info(f">> Test feature point matcher with SuperPoint "
                f"({source} imagery, {kind}).")

    timer = TickTock()
    ref_uv, ref_desc, n_ref = detector.detect(jnp.asarray(ref))
    cur_uv, cur_desc, n_cur = detector.detect(jnp.asarray(cur))
    n_ref, n_cur = int(n_ref), int(n_cur)
    report_info(f"Detected {n_ref} / {n_cur} features in "
                f"{timer.tock_tick_ms():.1f} ms (incl. compile).")

    dist = cosine_distance_matrix(ref_desc[:n_ref], cur_desc[:n_cur])
    idx = nearby_match(dist, ref_uv[:n_ref], cur_uv[:n_cur],
                       max_valid_distance=0.1,
                       max_col_distance=50.0, max_row_distance=50.0)
    matched_uv, status = fill_matched_pixels(idx, cur_uv[:n_cur])
    status = np.asarray(status)
    tracked = int((status == int(TrackStatus.TRACKED)).sum())
    report_info(f"Matched {tracked} / {n_ref} features "
                f"in {timer.tock_tick_ms():.1f} ms.")

    canvas = render_matches(ref, cur, np.asarray(ref_uv[:n_ref]),
                            np.asarray(matched_uv), status)
    path = _common.out_path("match_superpoint.png")
    save_png(path, canvas)
    report_info(f"Wrote {path}")


if __name__ == "__main__":
    main()
