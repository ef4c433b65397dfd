"""Trainability tests for the native SuperPoint detector (MagicPoint
stage on synthetic corner geometry)."""

import numpy as np

import jax.numpy as jnp

from feature_tracker_tpu.models.superpoint import (
    SuperPointConfig,
    select_keypoints,
)
from feature_tracker_tpu.train.superpoint_train import (
    SuperPointTrainConfig,
    corner_label_map,
    synthetic_corners_image,
    train_synthetic,
)


def test_synthetic_corner_rendering():
    rng = np.random.default_rng(0)
    img, corners = synthetic_corners_image(rng, 64, 64)
    assert img.shape == (64, 64)
    assert img.min() >= 0 and img.max() <= 255
    assert len(corners) >= 8
    labels = corner_label_map(corners, 64, 64)
    assert labels.shape == (8, 8)
    assert (labels < 64).sum() >= 4  # some corner cells


def test_superpoint_learns_corners():
    cfg = SuperPointConfig(descriptor_dim=32)
    model, params, losses = train_synthetic(
        cfg, SuperPointTrainConfig(), steps=150, h=64, w=64, batch=8,
        seed=0)
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert last < first * 0.8, (first, last)

    # After training, detections should land near true corners far more
    # often than an untrained net: check mean distance to nearest corner.
    rng = np.random.default_rng(99)
    img, corners = synthetic_corners_image(rng, 64, 64)
    heat, _ = model.apply(params, jnp.asarray(img[None, :, :, None]))
    uv, num = select_keypoints(heat[0], 16, 0.01, 4)
    uv = np.asarray(uv)[:int(num)]
    assert len(uv) > 0
    d = np.sqrt(((uv[:, None, :] - corners[None, :, :]) ** 2).sum(-1))
    mean_nearest = d.min(axis=1).mean()
    assert mean_nearest < 8.0, mean_nearest
