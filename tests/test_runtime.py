"""Tests for the native host runtime (C++ ring buffer, fused
convert+pyramid, timers) and the streaming frame pipeline."""

import numpy as np
import pytest

import jax.numpy as jnp

from feature_tracker_tpu.ops.pyramid import build_pyramid
from feature_tracker_tpu.runtime import FrameStream, build_native, get_runtime


@pytest.fixture(scope="module")
def rt():
    built = build_native()
    r = get_runtime()
    if built:
        assert r.is_native, "library built but failed to load"
    return r


def test_native_builds(rt):
    # The environment ships g++, so the native path must be real here.
    assert rt.is_native


def test_timer_monotonic(rt):
    a = rt.now_ns()
    b = rt.now_ns()
    assert b >= a


def test_ring_buffer_fifo_and_capacity(rt):
    ring = rt.ring_buffer(capacity=3, frame_bytes=16)
    frames = [np.full(16, i, np.uint8) for i in range(5)]
    assert ring.push(frames[0])
    assert ring.push(frames[1])
    assert ring.push(frames[2])
    assert not ring.push(frames[3])  # full -> dropped
    assert len(ring) == 3
    out = ring.pop((16,))
    np.testing.assert_array_equal(out, frames[0])
    assert ring.push(frames[4])      # slot freed
    np.testing.assert_array_equal(ring.pop((16,)), frames[1])
    np.testing.assert_array_equal(ring.pop((16,)), frames[2])
    np.testing.assert_array_equal(ring.pop((16,)), frames[4])
    assert ring.pop((16,)) is None   # empty


def test_convert_and_pyramid_matches_jax(rt):
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (96, 130), dtype=np.uint8)
    native = rt.convert_and_pyramid(frame, levels=4)
    jaxp = build_pyramid(jnp.asarray(frame, jnp.float32), 4, quantize=True)
    assert len(native) == 4
    for a, b in zip(native, jaxp):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_frame_stream_end_to_end(rt):
    rng = np.random.default_rng(1)
    frames = [rng.integers(0, 256, (64, 80), dtype=np.uint8)
              for _ in range(6)]
    got = []
    for fid, pyr in FrameStream(iter(frames), levels=3, capacity=16):
        got.append((fid, pyr))
    # Capacity 16 > frame count: nothing dropped, all frames in order.
    assert len(got) == 6
    for i, (fid, pyr) in enumerate(got):
        assert fid == i
        assert pyr[0].shape == (64, 80)
        assert pyr[2].shape == (16, 20)
    np.testing.assert_array_equal(got[3][1][0],
                                  frames[3].astype(np.float32))
