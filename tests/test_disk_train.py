"""Trainability tests for the native DISK descriptors."""

import numpy as np

import jax.numpy as jnp

from feature_tracker_tpu.models.disk import DiskConfig
from feature_tracker_tpu.models.disk import sample_descriptors_fullres
from feature_tracker_tpu.train.disk_train import (
    DiskTrainConfig,
    train_synthetic,
    translated_training_pair,
)

CFG = DiskConfig(descriptor_dim=16, base_channels=8, depth=2)


def test_translated_pair_correspondences_exact():
    rng = np.random.default_rng(0)
    a, b, (dx, dy) = translated_training_pair(rng, 48, 48)
    # b shifted content: b[y + dy, x + dx] == a[y, x] inside the margin.
    ys, xs = np.mgrid[12:36, 12:36]
    np.testing.assert_allclose(b[ys + dy, xs + dx], a[ys, xs], atol=1e-5)


def test_disk_descriptors_learn_correspondence():
    model, params, losses = train_synthetic(CFG, DiskTrainConfig(),
                                            steps=40, h=64, w=64, seed=0)
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert last < first * 0.6, (first, last)

    # Matching accuracy on a held-out pair beats chance comfortably.
    rng = np.random.default_rng(123)
    a, b, (dx, dy) = translated_training_pair(rng, 64, 64)
    uv_a = rng.uniform(10, 54, (64, 2)).astype(np.float32)
    uv_b = uv_a + np.array([dx, dy], np.float32)
    _, da_map = model.apply(params, jnp.asarray(a)[None, :, :, None])
    _, db_map = model.apply(params, jnp.asarray(b)[None, :, :, None])
    da = np.asarray(sample_descriptors_fullres(da_map[0],
                                               jnp.asarray(uv_a)))
    db = np.asarray(sample_descriptors_fullres(db_map[0],
                                               jnp.asarray(uv_b)))
    pred = (da @ db.T).argmax(axis=1)
    acc = (pred == np.arange(64)).mean()
    assert acc > 0.5, acc
