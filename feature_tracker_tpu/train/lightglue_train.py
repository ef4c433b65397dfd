"""LightGlue matcher training on synthetic correspondences.

The reference ships pretrained ONNX LightGlue blobs (absent from the
mount, SURVEY.md §0); the native matcher therefore needs a training path
(SURVEY §7.4 hard part 4). This module provides the LightGlue loss
(negative log-likelihood of the ground-truth partial assignment:
-log P[i, gt(i)] for matched points, -log(1 - sigma) for unmatchable
points on both sides — Lindenberger et al. 2023, eq. 10) plus a synthetic
correspondence generator (random similarity warp of keypoints, noised
shared descriptors, distractors) so trainability is testable end to end
without external data.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from feature_tracker_tpu.models.lightglue import (
    LightGlue,
    LightGlueConfig,
    mutual_argmax_matches,
)


@dataclasses.dataclass(frozen=True)
class LightGlueTrainConfig:
    learning_rate: float = 1e-3
    weight_decay: float = 1e-5
    clip_norm: float = 1.0


def synthetic_matching_problem(rng: np.random.Generator, n: int, m: int,
                               dim: int, matched: int,
                               desc_noise: float = 0.1,
                               image_size: float = 640.0):
    """Build one matching problem.

    The first ``matched`` ref keypoints correspond to a random similarity
    warp of themselves placed at random slots in cur; their descriptors
    are shared up to noise. Remaining points on both sides are
    distractors. Returns (kpts0, desc0, kpts1, desc1, gt) with gt [n]
    int32 cur indices (-1 = unmatchable)."""
    kpts0 = rng.uniform(0, image_size, (n, 2)).astype(np.float32)
    desc0 = rng.normal(0, 1, (n, dim)).astype(np.float32)
    desc0 /= np.linalg.norm(desc0, axis=-1, keepdims=True)

    theta = rng.uniform(-0.3, 0.3)
    scale = rng.uniform(0.8, 1.25)
    rot = scale * np.array([[np.cos(theta), -np.sin(theta)],
                            [np.sin(theta), np.cos(theta)]], np.float32)
    shift = rng.uniform(-40, 40, 2).astype(np.float32)

    kpts1 = rng.uniform(0, image_size, (m, 2)).astype(np.float32)
    desc1 = rng.normal(0, 1, (m, dim)).astype(np.float32)
    desc1 /= np.linalg.norm(desc1, axis=-1, keepdims=True)

    slots = rng.choice(m, size=matched, replace=False).astype(np.int32)
    kpts1[slots] = kpts0[:matched] @ rot.T + shift
    d = desc0[:matched] + desc_noise * rng.normal(0, 1, (matched, dim))
    desc1[slots] = (d / np.linalg.norm(d, axis=-1, keepdims=True)
                    ).astype(np.float32)

    gt = np.full(n, -1, np.int32)
    gt[:matched] = slots
    return kpts0, desc0, kpts1, desc1, gt


def lightglue_loss(scores, logit0, logit1, gt):
    """NLL of the ground-truth partial assignment.

    scores: [N, M] log P; gt: [N] int32 (-1 = ref point unmatchable).
    Cur points not referenced by gt are treated as unmatchable."""
    n, m = scores.shape
    matched = gt >= 0
    safe = jnp.clip(gt, 0, m - 1)
    pos_ll = jnp.take_along_axis(scores, safe[:, None], axis=1)[:, 0]
    pos_loss = -jnp.sum(jnp.where(matched, pos_ll, 0.0))

    # log(1 - sigma) = log_sigmoid(-logit) for unmatchable points.
    neg0 = -jnp.sum(jnp.where(matched, 0.0, jax.nn.log_sigmoid(-logit0)))
    cur_hit = jnp.zeros((m,), bool).at[safe].set(matched, mode="drop")
    neg1 = -jnp.sum(jnp.where(cur_hit, 0.0, jax.nn.log_sigmoid(-logit1)))

    denom = jnp.maximum(jnp.sum(matched), 1)
    return (pos_loss + 0.5 * (neg0 + neg1)) / denom


def make_train_step(model: LightGlue, cfg: LightGlueTrainConfig):
    tx = optax.chain(optax.clip_by_global_norm(cfg.clip_norm),
                     optax.adamw(cfg.learning_rate,
                                 weight_decay=cfg.weight_decay))

    @jax.jit
    def step(params, opt_state, k0, d0, k1, d1, gt):
        n = k0.shape[0]
        m = k1.shape[0]
        mask0 = jnp.ones((n,), bool)
        mask1 = jnp.ones((m,), bool)

        def loss_fn(p):
            scores, l0, l1 = model.apply(p, k0, d0, mask0, k1, d1, mask1)
            loss = lightglue_loss(scores, l0, l1, gt)
            return loss, scores

        (loss, scores), grads = jax.value_and_grad(loss_fn,
                                                   has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        pred = mutual_argmax_matches(scores, -1e8)
        acc = jnp.mean((pred == gt).astype(jnp.float32))
        return params, opt_state, {"loss": loss, "assignment_acc": acc}

    return step, tx


def train_synthetic(cfg: LightGlueConfig, train_cfg: LightGlueTrainConfig,
                    steps: int, n: int = 64, m: int = 64, matched: int = 40,
                    seed: int = 0):
    """Train on fresh synthetic problems; returns (params, metrics list)."""
    model = LightGlue(cfg)
    rng = np.random.default_rng(seed)
    k0, d0, k1, d1, gt = synthetic_matching_problem(rng, n, m,
                                                    cfg.descriptor_dim,
                                                    matched)
    params = model.init(jax.random.PRNGKey(seed), jnp.asarray(k0),
                        jnp.asarray(d0), jnp.ones((n,), bool),
                        jnp.asarray(k1), jnp.asarray(d1),
                        jnp.ones((m,), bool))
    step, tx = make_train_step(model, train_cfg)
    opt_state = tx.init(params)

    history = []
    for _ in range(steps):
        k0, d0, k1, d1, gt = synthetic_matching_problem(
            rng, n, m, cfg.descriptor_dim, matched)
        params, opt_state, metrics = step(
            params, opt_state, jnp.asarray(k0), jnp.asarray(d0),
            jnp.asarray(k1), jnp.asarray(d1), jnp.asarray(gt))
        history.append({k: float(v) for k, v in metrics.items()})
    return params, history
