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


def test_pos_hinge_adds_sub_margin_penalty():
    """The positive-cosine hinge (DiskTrainConfig.pos_hinge_weight) exists
    because the matcher demo converts a positive pair to a match only when
    cos >= 0.8 (0.1 cosine-distance gate, test_descriptor_matcher_disk
    protocol); InfoNCE alone leaves the absolute similarity scale free.
    On an UNTRAINED model (positive cosines well below the margin) the
    hinged loss must exceed the hinge-free loss by exactly the weighted
    mean squared violation; once cosines sit above the margin the two
    must coincide (no spurious gradient on an already-converted space)."""
    import jax
    from feature_tracker_tpu.models.disk import Disk
    from feature_tracker_tpu.train.disk_train import make_train_step

    def one_step_loss(hinge_weight, margin=0.875):
        cfg = DiskTrainConfig(num_samples=48,
                              pos_hinge_weight=hinge_weight,
                              pos_hinge_margin=margin)
        model = Disk(CFG)
        rng = np.random.default_rng(7)
        params = model.init(jax.random.PRNGKey(7),
                            jnp.zeros((1, 64, 64, 1), jnp.float32))
        step, tx = make_train_step(model, cfg)
        opt = tx.init(params)
        a, b, (dx, dy) = translated_training_pair(rng, 64, 64)
        uv_a = rng.uniform(10, 50, (48, 2)).astype(np.float32)
        uv_b = uv_a + np.array([dx, dy], np.float32)
        _, _, loss = step(params, opt, jnp.asarray(a), jnp.asarray(b),
                          jnp.asarray(uv_a), jnp.asarray(uv_b))
        return float(loss)

    base = one_step_loss(0.0)
    # A margin of 1.01 is always violated (cos <= 1): strict penalty.
    # (A realistic 0.875 margin may not bind at CI scale: an untrained
    # smooth CNN already gives nearby-point positives cos ~ 1.)
    assert one_step_loss(1.0, margin=1.01) > base
    # A margin of -1 can never be violated (cos >= -1): exact equality.
    assert one_step_loss(1.0, margin=-1.0) == base
