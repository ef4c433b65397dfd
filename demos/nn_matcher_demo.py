"""LightGlue neural matching demo — port of the reference's
test_nn_feature_matcher (reference: test/test_nn_feature_matcher.cpp:27-77):
SuperPoint detect + LightGlue match, max 250 features, min match score
log(0.03). The reference loads pretrained ONNX blobs (absent from the
mount); here both networks run natively in JAX with untrained weights, so
the demo validates the full mechanism (detect -> describe -> attention
match -> mutual-argmax) rather than match quality."""

import math

import _common  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

from feature_tracker_tpu.core.status import TrackStatus
from feature_tracker_tpu.match.nn_matcher import (
    NNFeatureMatcher,
    NNMatcherModelType,
    NNMatcherOptions,
)
from feature_tracker_tpu.models.superpoint import SuperPointDetector
from feature_tracker_tpu.utils import TickTock, report_info
from feature_tracker_tpu.utils.viz import render_matches, save_png

MAX_FEATURES = 250  # reference: test_nn_feature_matcher.cpp:22


def main():
    ref, cur, source = _common.load_optical_flow_pair()
    detector = SuperPointDetector.from_file(max_features=MAX_FEATURES,
                                            min_response=0.01)
    opts = NNMatcherOptions(
        max_number_of_matches=MAX_FEATURES,
        min_valid_match_score=math.log(0.03),
        model_type=NNMatcherModelType.LIGHTGLUE_SUPERPOINT_SCORE_MAT,
        depth=9)
    matcher = NNFeatureMatcher.from_file(opts) if detector else None
    kind = "pretrained weights"
    if detector is None or matcher is None:
        detector = detector or SuperPointDetector.init_random(
            jax.random.PRNGKey(0), max_features=MAX_FEATURES)
        matcher = NNFeatureMatcher(NNMatcherOptions(
            max_number_of_matches=MAX_FEATURES,
            min_valid_match_score=math.log(0.03),
            model_type=NNMatcherModelType.LIGHTGLUE_SUPERPOINT_SCORE_MAT,
            depth=4))
        kind = "untrained weights (run train/pretrain.py)"
    report_info(f">> Test NN feature matcher with LightGlue "
                f"({source} imagery, {kind}).")

    timer = TickTock()
    matcher.initialize()
    report_info(f"Matcher warm-up in {timer.tock_tick_ms():.0f} ms.")

    ref_uv, ref_desc, n_ref = detector.detect(jnp.asarray(ref))
    cur_uv, cur_desc, n_cur = detector.detect(jnp.asarray(cur))
    mask_ref = jnp.arange(MAX_FEATURES) < n_ref
    mask_cur = jnp.arange(MAX_FEATURES) < n_cur
    report_info(f"Detected {int(n_ref)} / {int(n_cur)} features in "
                f"{timer.tock_tick_ms():.0f} ms (incl. compile).")

    matched_uv, status = matcher.match(ref_desc, cur_desc, ref_uv, cur_uv,
                                       mask_ref, mask_cur)
    status = np.array(status)
    status[~np.asarray(mask_ref)] = int(TrackStatus.NOT_TRACKED)
    tracked = int((status == int(TrackStatus.TRACKED)).sum())
    report_info(f"Matched {tracked} / {int(n_ref)} features in "
                f"{timer.tock_tick_ms():.0f} ms (incl. compile).")

    canvas = render_matches(ref, cur, np.asarray(ref_uv),
                            np.asarray(matched_uv), status)
    path = _common.out_path("nn_matcher_lightglue.png")
    save_png(path, canvas)
    report_info(f"Wrote {path}")

    # DISK-descriptor variant (the reference's disk_lightglue family,
    # nn_feature_matcher.h:16-21) when both weight files exist.
    from feature_tracker_tpu.models.disk import DiskDetector
    disk_det = DiskDetector.from_file(max_features=MAX_FEATURES)
    disk_opts = NNMatcherOptions(
        max_number_of_matches=MAX_FEATURES,
        min_valid_match_score=math.log(0.03),
        model_type=NNMatcherModelType.LIGHTGLUE_DISK_SCORE_MAT,
        depth=9)
    disk_matcher = (NNFeatureMatcher.from_file(disk_opts)
                    if disk_det is not None else None)
    if disk_det is None or disk_matcher is None:
        report_info("DISK+LightGlue variant skipped (weights absent).")
        return
    timer.tock_tick_ms()
    ruv, rd, nr = disk_det.detect(jnp.asarray(ref))
    cuv, cd, nc = disk_det.detect(jnp.asarray(cur))
    m0 = jnp.arange(MAX_FEATURES) < nr
    m1 = jnp.arange(MAX_FEATURES) < nc
    muv, st = disk_matcher.match(rd, cd, ruv, cuv, m0, m1)
    st = np.array(st)
    st[~np.asarray(m0)] = int(TrackStatus.NOT_TRACKED)
    tracked = int((st == int(TrackStatus.TRACKED)).sum())
    report_info(f"DISK+LightGlue matched {tracked} / {int(nr)} features "
                f"in {timer.tock_tick_ms():.0f} ms (incl. compile).")
    canvas = render_matches(ref, cur, np.asarray(ruv), np.asarray(muv),
                            st)
    path = _common.out_path("nn_matcher_lightglue_disk.png")
    save_png(path, canvas)
    report_info(f"Wrote {path}")


if __name__ == "__main__":
    main()
