"""Tests for the CoTracker pretraining driver's synthetic-video data:
ground-truth tracks must be exactly the composed per-frame warps, and the
rendered frames must be photometrically consistent with them."""

import numpy as np

from feature_tracker_tpu.train.cotracker_pretrain import synthetic_video


def _sample(img, x, y):
    x0, y0 = int(np.floor(x)), int(np.floor(y))
    fx, fy = x - x0, y - y0
    return ((1 - fy) * (1 - fx) * img[y0, x0]
            + (1 - fy) * fx * img[y0, x0 + 1]
            + fy * (1 - fx) * img[y0 + 1, x0]
            + fy * fx * img[y0 + 1, x0 + 1])


def test_shapes_and_visibility():
    rng = np.random.default_rng(0)
    video, queries, tracks, vis = synthetic_video(rng, 5, 48, 64, 7,
                                                  augment=False)
    assert video.shape == (5, 48, 64, 1)
    assert queries.shape == (7, 2)
    assert tracks.shape == (5, 7, 2)
    assert vis.shape == (5, 7)
    # Frame 0 is the identity warp: tracks == queries, all visible.
    np.testing.assert_allclose(tracks[0], queries)
    assert (vis[0] == 1.0).all()
    # Visibility is exactly the in-frame indicator of the track.
    inside = ((tracks[..., 0] >= 0) & (tracks[..., 0] <= 63)
              & (tracks[..., 1] >= 0) & (tracks[..., 1] <= 47))
    np.testing.assert_array_equal(vis.astype(bool), inside)


def test_tracks_follow_image_content():
    """frame_k(W_k(p)) == frame_0(p): the intensity under each track
    point must match the frame-0 intensity at the query (no photometric
    augmentation, interior points only)."""
    rng = np.random.default_rng(1)
    video, queries, tracks, vis = synthetic_video(rng, 6, 64, 64, 16,
                                                  augment=False)
    checked = 0
    for k in range(1, 6):
        for i in range(16):
            x, y = tracks[k, i]
            if not (2 <= x < 61 and 2 <= y < 61):
                continue
            got = _sample(video[k, :, :, 0], x, y)
            want = _sample(video[0, :, :, 0], *queries[i])
            # Bilinear resampling of a warped bilinear render is not
            # exact; textures are smooth so 3 gray levels is ample.
            assert abs(got - want) < 3.0, (k, i, got, want)
            checked += 1
    assert checked > 20


def test_trajectory_is_smooth():
    """Per-step track motion stays bounded by the step warp bounds
    (shift <= 2.5 px + rotation/scale contribution at the corners)."""
    rng = np.random.default_rng(2)
    _, _, tracks, _ = synthetic_video(rng, 8, 96, 96, 8, augment=False)
    step = np.linalg.norm(np.diff(tracks, axis=0), axis=-1)
    assert step.max() < 15.0


def test_real_video_tracks_and_samples():
    """KLT-verified real-video pseudo-labels: verified tracks exist, are
    forward-backward consistent by construction, and samples honor the
    (video, queries, tracks, vis) contract."""
    from feature_tracker_tpu.train.cotracker_pretrain import (
        _real_video_tracks,
        real_video_sample,
    )

    frames, tracks = _real_video_tracks()
    if frames is None:
        import pytest
        pytest.skip("reference imagery or native CPU port unavailable")
    t, m = tracks.shape[:2]
    assert t == frames.shape[0] and m >= 64
    # Real KITTI forward motion: nonzero median per-frame displacement.
    d = np.linalg.norm(np.diff(tracks, axis=0), axis=-1)
    assert 0.5 < np.median(d) < 30.0

    rng = np.random.default_rng(0)
    s = real_video_sample(rng, 8, 96, 96, 16)
    assert s is not None
    video, queries, tr, vis = s
    assert video.shape == (8, 96, 96, 1) and tr.shape == (8, 16, 2)
    assert queries.shape == (16, 2) and vis.shape == (8, 16)
    np.testing.assert_allclose(tr[0], queries, atol=1e-5)
    assert np.isfinite(video).all() and np.isfinite(tr).all()
    # Visibility is the in-crop indicator of the LABEL positions.
    inside = ((tr[..., 0] >= 0) & (tr[..., 0] <= 95)
              & (tr[..., 1] >= 0) & (tr[..., 1] <= 95))
    np.testing.assert_array_equal(vis.astype(bool), inside)
