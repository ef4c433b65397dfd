"""Dense Farneback optical-flow demo — port of the reference's
test_dense_optical_flow (reference: test/test_dense_optical_flow.cpp:18-69):
5-level pyramid, half-patch 2, 20 iterations; flow vectors visualized on a
15-pixel grid."""

import _common  # noqa: F401

import jax.numpy as jnp
import numpy as np

from feature_tracker_tpu.ops.pyramid import build_pyramid
from feature_tracker_tpu.trackers.dense import DenseFlowOptions, DenseOpticalFlow
from feature_tracker_tpu.utils import report_info, time_jitted
from feature_tracker_tpu.utils.viz import render_dense_flow, save_png


def main():
    ref, cur, source = _common.load_optical_flow_pair()
    report_info(f">> Test dense optical flow ({source} imagery).")

    ref_pyr = build_pyramid(jnp.asarray(ref), 5, quantize=False)
    cur_pyr = build_pyramid(jnp.asarray(cur), 5, quantize=False)
    flowper = DenseOpticalFlow(DenseFlowOptions(half_patch_size=2,
                                                max_iterations=20))
    flow, stats = time_jitted(flowper.track, ref_pyr, cur_pyr, iters=5)
    flow = np.asarray(flow)
    report_info(f"Dense flow {ref.shape[1]}x{ref.shape[0]}: "
                f"{stats['mean_ms']:.2f} ms/frame steady state "
                f"({stats['compile_ms']:.0f} ms first call); "
                f"mean |flow| = {np.abs(flow).mean():.3f} px.")

    overlay = render_dense_flow(cur, flow, step=15)
    path = _common.out_path("dense_flow_vectors.png")
    save_png(path, overlay)
    report_info(f"Wrote {path}")


if __name__ == "__main__":
    main()
