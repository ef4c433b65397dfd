"""DISK descriptor training on known-correspondence pairs.

The reference consumes a pretrained ONNX DISK (SURVEY.md E5); the native
U-Net needs a training path. DISK's original recipe is policy-gradient
over match rewards; for a deterministic, CI-testable scaffold this module
trains the descriptor field with dense InfoNCE on translated image pairs
(exact correspondences known): descriptors at corresponding pixels are
positives, all other sampled pixels in the pair are negatives. The
detection heatmap trains jointly to fire where descriptors match
confidently (peakiness proxy).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from feature_tracker_tpu.models.disk import Disk, DiskConfig
from feature_tracker_tpu.models.disk import sample_descriptors_fullres


@dataclasses.dataclass(frozen=True)
class DiskTrainConfig:
    learning_rate: float = 1e-3
    weight_decay: float = 1e-5
    clip_norm: float = 1.0
    temperature: float = 0.1
    num_samples: int = 128  # correspondence samples per pair
    # Positive-cosine hinge at the demo decision boundary: the matcher
    # demo gates cosine DISTANCE at 0.1 (test_descriptor_matcher_disk
    # protocol), i.e. a positive pair only converts to a match when
    # cos >= 0.8. InfoNCE separates positives from negatives but does
    # not pin the absolute similarity scale; the hinge pushes positive
    # cosines above the gate with slack. 0 disables (initial training).
    pos_hinge_margin: float = 0.875
    pos_hinge_weight: float = 0.0


def translated_training_pair(rng: np.random.Generator, h: int, w: int,
                             max_shift: int = 6):
    """Textured image + integer-shifted copy with exact correspondences."""
    base = rng.uniform(0, 255, (h // 4 + 4, w // 4 + 4)).astype(np.float32)
    img = np.kron(base, np.ones((4, 4), np.float32))[:h + 16, :w + 16]
    k = np.ones(3, np.float32) / 3.0
    img = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, img)
    img = np.apply_along_axis(lambda c: np.convolve(c, k, "same"), 0, img)
    dr = int(rng.integers(-max_shift, max_shift + 1))
    dc = int(rng.integers(-max_shift, max_shift + 1))
    a = img[8:h + 8, 8:w + 8]
    b = img[8 - dr:h + 8 - dr, 8 - dc:w + 8 - dc]
    return a.copy(), b.copy(), (dc, dr)  # flow (dx, dy) from a to b


def make_train_step(model: Disk, cfg: DiskTrainConfig):
    tx = optax.chain(optax.clip_by_global_norm(cfg.clip_norm),
                     optax.adamw(cfg.learning_rate,
                                 weight_decay=cfg.weight_decay))

    @jax.jit
    def step(params, opt_state, img_a, img_b, uv_a, uv_b):
        def loss_fn(p):
            _, desc_a = model.apply(p, img_a[None, :, :, None])
            _, desc_b = model.apply(p, img_b[None, :, :, None])
            da = sample_descriptors_fullres(desc_a[0], uv_a)   # [S, D]
            db = sample_descriptors_fullres(desc_b[0], uv_b)   # [S, D]
            sim = (da @ db.T) / cfg.temperature                # [S, S]
            labels = jnp.arange(sim.shape[0])
            # Symmetric InfoNCE.
            l_ab = optax.softmax_cross_entropy_with_integer_labels(
                sim, labels).mean()
            l_ba = optax.softmax_cross_entropy_with_integer_labels(
                sim.T, labels).mean()
            loss = 0.5 * (l_ab + l_ba)
            if cfg.pos_hinge_weight > 0.0:
                pos_cos = jnp.sum(da * db, axis=-1)
                loss = loss + cfg.pos_hinge_weight * jnp.mean(
                    jax.nn.relu(cfg.pos_hinge_margin - pos_cos) ** 2)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step, tx


def train_synthetic(cfg: DiskConfig, train_cfg: DiskTrainConfig,
                    steps: int, h: int = 64, w: int = 64, seed: int = 0):
    model = Disk(cfg)
    rng = np.random.default_rng(seed)
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, h, w, 1), jnp.float32))
    step, tx = make_train_step(model, train_cfg)
    opt_state = tx.init(params)

    losses = []
    margin = 10
    for _ in range(steps):
        a, b, (dx, dy) = translated_training_pair(rng, h, w)
        uv_a = rng.uniform(margin, [w - margin, h - margin],
                           (train_cfg.num_samples, 2)).astype(np.float32)
        uv_b = uv_a + np.array([dx, dy], np.float32)
        params, opt_state, loss = step(params, opt_state, jnp.asarray(a),
                                       jnp.asarray(b), jnp.asarray(uv_a),
                                       jnp.asarray(uv_b))
        losses.append(float(loss))
    return model, params, losses
