"""Tests for the CoTracker-style joint point tracker (capability beyond
the reference, whose co_tracker/model.py is an empty placeholder)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feature_tracker_tpu.models.cotracker import CoTracker, CoTrackerConfig

CFG = CoTrackerConfig(feature_dim=16, corr_levels=2, corr_radius=2,
                      model_dim=32, num_heads=2, depth=1, iterations=2)


@pytest.fixture(scope="module")
def model_and_vars():
    model = CoTracker(CFG)
    video = jnp.zeros((3, 32, 40, 1), jnp.float32)
    queries = jnp.asarray([[10.0, 12.0], [20.0, 8.0]], jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), video, queries)
    return model, variables


def test_output_shapes(model_and_vars):
    model, variables = model_and_vars
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.uniform(0, 255, (3, 32, 40, 1)), jnp.float32)
    queries = jnp.asarray(rng.uniform(5, 25, (4, 2)), jnp.float32)
    tracks, vis = model.apply(variables, video, queries)
    assert tracks.shape == (3, 4, 2)
    assert vis.shape == (3, 4)
    assert np.isfinite(np.asarray(tracks)).all()
    assert np.isfinite(np.asarray(vis)).all()


def test_batched_via_vmap(model_and_vars):
    model, variables = model_and_vars
    rng = np.random.default_rng(1)
    video = jnp.asarray(rng.uniform(0, 255, (2, 3, 32, 40, 1)), jnp.float32)
    queries = jnp.asarray(rng.uniform(5, 25, (2, 2, 2)), jnp.float32)
    tracks, vis = jax.vmap(lambda v, q: model.apply(variables, v, q))(
        video, queries)
    assert tracks.shape == (2, 3, 2, 2)
    # Batched result equals per-sample results.
    t0, _ = model.apply(variables, video[0], queries[0])
    np.testing.assert_allclose(np.asarray(tracks[0]), np.asarray(t0),
                               rtol=1e-5, atol=1e-5)


def test_static_video_keeps_tracks_near_queries():
    """On a static video, a trained-free model has no signal to move
    points; with zero-init delta heads the first iteration's corr/flow
    tokens still produce deterministic small deltas. We check structural
    sanity: frame-0 tracks of duplicate queries coincide."""
    model = CoTracker(CFG)
    rng = np.random.default_rng(2)
    frame = rng.uniform(0, 255, (32, 40, 1))
    video = jnp.asarray(np.stack([frame] * 3), jnp.float32)
    queries = jnp.asarray([[16.0, 16.0], [16.0, 16.0]], jnp.float32)
    variables = model.init(jax.random.PRNGKey(3), video, queries)
    tracks, _ = model.apply(variables, video, queries)
    tracks = np.asarray(tracks)
    # Identical queries on identical frames -> identical trajectories.
    np.testing.assert_allclose(tracks[:, 0], tracks[:, 1], atol=1e-5)
    # Static video: every frame's track equals frame 0's track.
    np.testing.assert_allclose(tracks[1:], np.broadcast_to(
        tracks[:1], tracks[1:].shape), atol=1e-4)


def test_corr_features_peak_at_true_offset():
    """The windowed correlation features must carry the tracking signal:
    for a pure integer translation (divisible by the encoder stride, so
    conv translation-equivariance holds exactly up to borders), the
    center tap of the correlation window sampled AT the true shifted
    position must beat sampling a few pixels off, even with an untrained
    encoder."""
    from feature_tracker_tpu.models.cotracker import (
        FrameEncoder,
        _corr_features,
    )
    from feature_tracker_tpu.models.raft import pool_feature_pyramid

    rng = np.random.default_rng(7)
    base = rng.uniform(0, 255, (64, 80)).astype(np.float32)
    shift = 8  # px, = 2 feature cells at stride 4
    cur = np.roll(base, shift, axis=1)
    video = jnp.asarray(np.stack([base, cur])[..., None])

    enc = FrameEncoder(32)
    vars_ = enc.init(jax.random.PRNGKey(0),
                     jnp.zeros((2, 64, 80, 1)))
    fmaps = enc.apply(vars_, 2.0 * (video / 255.0) - 1.0)
    fpyrs = pool_feature_pyramid(fmaps, 1)

    queries = jnp.asarray([[24.0, 32.0], [40.0, 24.0]], jnp.float32)
    qf = queries / 4.0
    from feature_tracker_tpu.models.cotracker import _bilinear_rows
    track_feat = _bilinear_rows(fmaps[0], qf)

    radius = 2
    k2 = (2 * radius + 1) ** 2
    center = k2 // 2
    true_pos = jnp.stack([qf + jnp.asarray([shift / 4.0, 0.0]),
                          qf + jnp.asarray([shift / 4.0, 0.0])])[0]
    pos_true = jnp.broadcast_to(true_pos[None], (2,) + true_pos.shape)
    pos_off = pos_true + 1.5  # 6 px off at level 0

    corr_true = _corr_features(track_feat, fpyrs, pos_true, radius)
    corr_off = _corr_features(track_feat, fpyrs, pos_off, radius)
    # Frame 1 (index 1) holds the shifted content.
    ct = np.asarray(corr_true)[1, :, center]
    co = np.asarray(corr_off)[1, :, center]
    assert (ct > co).all(), (ct, co)
    # And the window's max over taps is AT the center for the true pos.
    win = np.asarray(corr_true)[1, :, :k2]
    assert (win.argmax(axis=-1) == center).all(), win.argmax(axis=-1)
