import numpy as np
import pytest

import jax
import jax.numpy as jnp

from feature_tracker_tpu.models.raft import (
    Raft,
    RaftConfig,
    compute_correlation_pyramid,
    lookup_correlation,
    upsample_flow_convex,
)


def test_correlation_pyramid_matches_naive():
    rng = np.random.default_rng(0)
    f0 = rng.normal(size=(2, 6, 5, 16)).astype(np.float32)
    f1 = rng.normal(size=(2, 6, 5, 16)).astype(np.float32)
    pyr = compute_correlation_pyramid(jnp.asarray(f0), jnp.asarray(f1), 2)
    naive = np.einsum("bijc,bklc->bijkl", f0, f1) / np.sqrt(16.0)
    got = np.asarray(pyr[0]).reshape(2, 6, 5, 6, 5)
    np.testing.assert_allclose(got, naive, rtol=1e-4, atol=1e-4)
    assert pyr[1].shape == (2 * 6 * 5, 3, 2)


def test_lookup_correlation_center_identity():
    # With radius 0 at integer locations, the lookup returns exactly the
    # correlation at those coordinates.
    rng = np.random.default_rng(1)
    f0 = rng.normal(size=(1, 4, 4, 8)).astype(np.float32)
    f1 = rng.normal(size=(1, 4, 4, 8)).astype(np.float32)
    pyr = compute_correlation_pyramid(jnp.asarray(f0), jnp.asarray(f1), 1)
    xs, ys = np.meshgrid(np.arange(4.0), np.arange(4.0))
    locs = jnp.asarray(np.stack([xs, ys], -1)[None].astype(np.float32))
    out = np.asarray(lookup_correlation(pyr, locs, 0))[0, ..., 0]
    naive = np.einsum("ijc,ijc->ij", f0[0], f1[0]) / np.sqrt(8.0)
    np.testing.assert_allclose(out, naive, rtol=1e-4, atol=1e-4)


def test_upsample_flow_shapes_and_uniform_mask():
    # A uniform mask makes the upsampling a plain 3x3 average of 8*flow.
    flow = jnp.ones((1, 4, 6, 2), jnp.float32)
    mask = jnp.zeros((1, 4, 6, 576), jnp.float32)
    up = np.asarray(upsample_flow_convex(flow, mask))
    assert up.shape == (1, 32, 48, 2)
    # Interior blocks: average of 9 neighbors of constant 8.0 = 8.0.
    np.testing.assert_allclose(up[0, 8:-8, 8:-8], 8.0, rtol=1e-5)


@pytest.mark.slow
def test_raft_forward_shapes():
    cfg = RaftConfig(max_iterations=2)
    model = Raft(cfg)
    ref = jnp.asarray(np.random.default_rng(2).uniform(
        0, 255, (1, 48, 48, 1)).astype(np.float32))
    cur = ref
    vars_ = model.init(jax.random.PRNGKey(0), ref, cur)
    preds = model.apply(vars_, ref, cur)
    assert preds.shape == (2, 1, 48, 48, 2)
    assert np.isfinite(np.asarray(preds)).all()
