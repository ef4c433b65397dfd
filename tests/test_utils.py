"""Tests for utils: timer, logging, and visualization rendering."""

import numpy as np

from feature_tracker_tpu.core.status import TrackStatus
from feature_tracker_tpu.utils import TickTock, report_info, time_jitted
from feature_tracker_tpu.utils.viz import (
    COLOR_FAILED,
    COLOR_TRACKED,
    draw_lines,
    draw_points,
    render_dense_flow,
    render_detected_features,
    render_matches,
    render_tracked_features,
    to_rgb,
)


def test_ticktock_measures_time():
    t = TickTock()
    acc = 0
    for i in range(10000):
        acc += i
    ms = t.tock_tick_ms()
    assert ms >= 0.0
    # After tick, the next reading is smaller than a long prior window.
    assert t.tock_ms() <= ms + 1000.0


def test_time_jitted_runs_and_reports():
    import jax
    import jax.numpy as jnp

    fn = jax.jit(lambda x: x * 2.0)
    out, stats = time_jitted(fn, jnp.ones((8, 8)), iters=3)
    assert stats["mean_ms"] >= 0.0
    assert stats["compile_ms"] >= 0.0
    np.testing.assert_allclose(np.asarray(out), 2.0)


def test_draw_points_stamps_color():
    rgb = to_rgb(np.zeros((20, 20), np.float32))
    draw_points(rgb, np.array([[10.0, 5.0]]), COLOR_TRACKED, radius=1)
    assert tuple(rgb[5, 10]) == COLOR_TRACKED
    # Out-of-image points are dropped, not clipped onto the border.
    before = rgb.copy()
    draw_points(rgb, np.array([[100.0, 100.0]]), COLOR_FAILED, radius=1)
    np.testing.assert_array_equal(rgb, before)


def test_draw_lines_connects_endpoints():
    rgb = to_rgb(np.zeros((20, 20), np.float32))
    draw_lines(rgb, np.array([[2.0, 2.0]]), np.array([[15.0, 2.0]]),
               COLOR_TRACKED)
    row = rgb[2, 2:16]
    assert (row == np.array(COLOR_TRACKED)).all(axis=-1).all()


def test_render_tracked_features_status_colors():
    gray = np.zeros((30, 40), np.float32)
    ref = np.array([[5.0, 5.0], [20.0, 10.0]])
    cur = np.array([[8.0, 5.0], [22.0, 10.0]])
    status = np.array([int(TrackStatus.TRACKED),
                       int(TrackStatus.LARGE_RESIDUAL)], np.int8)
    rgb = render_tracked_features(gray, ref, cur, status)
    assert tuple(rgb[5, 8]) == COLOR_TRACKED
    assert tuple(rgb[10, 22]) == COLOR_FAILED


def test_render_matches_side_by_side_shape():
    a = np.zeros((30, 40), np.float32)
    b = np.zeros((20, 50), np.float32)
    canvas = render_matches(a, b, np.array([[5.0, 5.0]]),
                            np.array([[10.0, 5.0]]),
                            np.array([int(TrackStatus.TRACKED)], np.int8))
    assert canvas.shape == (30, 90, 3)
    # Current-image point drawn offset by ref width.
    assert tuple(canvas[5, 40 + 10]) == COLOR_TRACKED


def test_render_detected_and_dense_flow_shapes():
    gray = np.zeros((60, 80), np.float32)
    rgb = render_detected_features(gray, np.array([[4.0, 4.0], [-1.0, -1.0]]),
                                   num=1)
    assert rgb.shape == (60, 80, 3)
    flow = np.zeros((2, 60, 80), np.float32)
    flow[1] += 3.0
    out = render_dense_flow(gray, flow, step=15)
    assert out.shape == (60, 80, 3)


def test_report_functions_do_not_raise(capsys):
    report_info("hello")


def test_stage_timer_accumulates():
    from feature_tracker_tpu.utils.profiling import StageTimer

    t = StageTimer()
    with t.stage("a"):
        sum(range(1000))
    with t.stage("a"):
        sum(range(1000))
    with t.stage("b"):
        pass
    rep = t.report()
    assert rep["a"]["count"] == 2
    assert rep["a"]["total_ms"] >= rep["b"]["total_ms"]


def test_assert_finite_raises_on_nan():
    import jax.numpy as jnp
    import pytest
    from feature_tracker_tpu.utils.profiling import assert_finite

    assert_finite({"x": jnp.ones(3)})
    with pytest.raises(FloatingPointError):
        assert_finite({"x": jnp.array([1.0, jnp.nan])})
