import numpy as np

import jax.numpy as jnp

from feature_tracker_tpu.ops.pyramid import build_pyramid
from feature_tracker_tpu.trackers.dense import DenseFlowOptions, DenseOpticalFlow

from tests.synthetic import translated_pair


def _interior(a, m=20):
    return a[..., m:-m, m:-m]


def test_dense_single_level_small_shift():
    shift = (1.3, -0.8)  # (dx, dy)
    ref, cur = translated_pair(h=120, w=160, shift=shift, seed=2)
    flow = DenseOpticalFlow().track_single_level(ref, cur)
    flow = np.asarray(flow)
    # flow[0] = row flow (dy), flow[1] = col flow (dx).
    err_r = _interior(flow[0]) - shift[1]
    err_c = _interior(flow[1]) - shift[0]
    assert np.median(np.abs(err_r)) < 0.25
    assert np.median(np.abs(err_c)) < 0.25


def test_dense_pyramid_larger_shift():
    shift = (5.2, 3.6)
    ref, cur = translated_pair(h=160, w=192, shift=shift, seed=4)
    ref_pyr = build_pyramid(jnp.asarray(ref), 3)
    cur_pyr = build_pyramid(jnp.asarray(cur), 3)
    opts = DenseFlowOptions(max_iterations=20)
    flow = np.asarray(DenseOpticalFlow(opts).track(ref_pyr, cur_pyr))
    err = np.hypot(_interior(flow[0]) - shift[1], _interior(flow[1]) - shift[0])
    assert np.median(err) < 0.5


def test_dense_zero_shift_is_zero_flow():
    ref, _ = translated_pair(h=96, w=96, seed=5)
    flow = np.asarray(DenseOpticalFlow().track_single_level(ref, ref))
    assert np.abs(flow).max() < 1e-3


def test_cpu_farneback_port_matches_jnp_path():
    """The native single-thread Farneback port (the bench row's measured
    CPU baseline) must reproduce the jnp pyramid flow within float/bf16
    table tolerance on interior pixels."""
    from feature_tracker_tpu.runtime import cpu_baseline

    if not cpu_baseline.available():
        import pytest
        pytest.skip("native toolchain unavailable")
    ref, cur = translated_pair(h=120, w=160, shift=(3.0, -2.0))
    rp = build_pyramid(jnp.asarray(ref), 3, quantize=False)
    cp = build_pyramid(jnp.asarray(cur), 3, quantize=False)
    opts = DenseFlowOptions(half_patch_size=2, max_iterations=10)
    fj = np.asarray(DenseOpticalFlow(opts).track(rp, cp))
    fc = cpu_baseline.farneback_cpu([np.asarray(l) for l in rp],
                                    [np.asarray(l) for l in cp], opts)
    j = fj[:, 10:-10, 10:-10]
    c = fc[:, 10:-10, 10:-10]
    assert np.abs(j - c).mean() < 0.05
    np.testing.assert_allclose(np.median(c[0]), -2.0, atol=0.05)
    np.testing.assert_allclose(np.median(c[1]), 3.0, atol=0.05)
