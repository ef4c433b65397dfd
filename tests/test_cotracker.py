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
