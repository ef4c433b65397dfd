"""Trainability tests for the native LightGlue matcher."""

import numpy as np

from feature_tracker_tpu.models.lightglue import LightGlueConfig
from feature_tracker_tpu.train.lightglue_train import (
    LightGlueTrainConfig,
    synthetic_matching_problem,
    train_synthetic,
)

CFG = LightGlueConfig(descriptor_dim=16, model_dim=32, num_heads=2, depth=2)


def test_synthetic_problem_structure():
    rng = np.random.default_rng(0)
    k0, d0, k1, d1, gt = synthetic_matching_problem(rng, 32, 40, 16, 20)
    assert k0.shape == (32, 2) and k1.shape == (40, 2)
    assert (gt[:20] >= 0).all() and (gt[20:] == -1).all()
    # Matched descriptors are close; distractors are not.
    cos = (d0[:20] * d1[gt[:20]]).sum(-1)
    assert cos.min() > 0.8
    np.testing.assert_allclose(np.linalg.norm(d1, axis=-1), 1.0, atol=1e-5)


def test_lightglue_learns_synthetic_matching():
    _, history = train_synthetic(CFG, LightGlueTrainConfig(), steps=60,
                                 n=48, m=48, matched=32, seed=1)
    first = np.mean([h["loss"] for h in history[:5]])
    last = np.mean([h["loss"] for h in history[-5:]])
    assert last < first * 0.5, (first, last)
    acc_last = np.mean([h["assignment_acc"] for h in history[-5:]])
    acc_first = np.mean([h["assignment_acc"] for h in history[:5]])
    assert acc_last > acc_first
    assert acc_last > 0.5, acc_last
