"""SuperPoint detector training on synthetic corner geometry.

The reference consumes a pretrained ONNX SuperPoint (SURVEY.md E5); the
native model needs a training path. This is the MagicPoint stage of the
SuperPoint recipe (DeTone et al. 2018): render simple polygons/line
junctions with exactly known corner locations, supervise the detector
head with the 65-way cell classification loss (64 positions + dustbin),
and supervise descriptors with a hinge contrastive loss on random
homography... kept to the detector stage here — descriptors train in a
later stage; the test asserts the detector learns to fire on corners.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from feature_tracker_tpu.models.superpoint import SuperPoint, SuperPointConfig


@dataclasses.dataclass(frozen=True)
class SuperPointTrainConfig:
    learning_rate: float = 1e-3
    weight_decay: float = 1e-5
    clip_norm: float = 1.0


def synthetic_corners_image(rng: np.random.Generator, h: int, w: int,
                            num_shapes: int = 4):
    """Render random filled quadrilaterals; return (image uint8-range
    float [h, w], corners [K, 2] float (x, y)) with K = 4*num_shapes."""
    img = np.full((h, w), rng.uniform(20, 60), np.float32)
    corners = []
    yy, xx = np.mgrid[0:h, 0:w]
    for _ in range(num_shapes):
        cx = rng.uniform(10, w - 10)
        cy = rng.uniform(10, h - 10)
        ang = rng.uniform(0, 2 * np.pi)
        sx = rng.uniform(5, min(18, w / 4))
        sy = rng.uniform(5, min(18, h / 4))
        pts = []
        for i in range(4):
            a = ang + i * np.pi / 2 + rng.uniform(-0.3, 0.3)
            r = np.array([sx, sy]) * rng.uniform(0.7, 1.0)
            pts.append([cx + r[0] * np.cos(a), cy + r[1] * np.sin(a)])
        pts = np.asarray(pts)
        shade = rng.uniform(120, 240)
        # Rasterize the convex quad as intersection of half planes.
        inside = np.ones((h, w), bool)
        for i in range(4):
            p0, p1 = pts[i], pts[(i + 1) % 4]
            inside &= ((p1[0] - p0[0]) * (yy - p0[1])
                       - (p1[1] - p0[1]) * (xx - p0[0])) >= 0
        img[inside] = shade
        corners.extend(pts)
    corners = np.asarray(corners, np.float32)
    keep = ((corners[:, 0] >= 2) & (corners[:, 0] < w - 2)
            & (corners[:, 1] >= 2) & (corners[:, 1] < h - 2))
    return img, corners[keep]


def corner_label_map(corners, h: int, w: int):
    """The 65-way cell labels [h/8, w/8] int32: index of the corner pixel
    within its 8x8 cell, or 64 (dustbin) for empty cells."""
    hc, wc = h // 8, w // 8
    labels = np.full((hc, wc), 64, np.int32)
    for x, y in corners:
        xi, yi = int(round(x)), int(round(y))
        if 0 <= xi < wc * 8 and 0 <= yi < hc * 8:
            labels[yi // 8, xi // 8] = (yi % 8) * 8 + (xi % 8)
    return labels


def make_train_step(model: SuperPoint, cfg: SuperPointTrainConfig):
    tx = optax.chain(optax.clip_by_global_norm(cfg.clip_norm),
                     optax.adamw(cfg.learning_rate,
                                 weight_decay=cfg.weight_decay))

    @jax.jit
    def step(params, opt_state, images, labels):
        def loss_fn(p):
            # train=False: batch norm uses its stored statistics, which
            # are part of the optimized pytree here — equivalent to
            # learned affine normalization, sufficient for the
            # detector-stage training this scaffold provides.
            heat, desc = model.apply(p, images, train=False)
            # heat: [B, H, W] probabilities (dustbin dropped). Rebuild
            # per-cell distributions: cells [B, hc, wc, 64] plus implied
            # dustbin mass = 1 - sum(cells).
            b, hh, ww = heat.shape
            hc, wc = hh // 8, ww // 8
            cells = heat.reshape(b, hc, 8, wc, 8).transpose(0, 1, 3, 2, 4)
            cells = cells.reshape(b, hc, wc, 64)
            dust = jnp.clip(1.0 - jnp.sum(cells, -1, keepdims=True),
                            1e-8, 1.0)
            logp = jnp.log(jnp.concatenate([jnp.clip(cells, 1e-8, 1.0),
                                            dust], axis=-1))
            nll = -jnp.take_along_axis(logp, labels[..., None],
                                       axis=-1)[..., 0]
            # Balance: corner cells are rare; weight them up.
            is_corner = labels < 64
            wgt = jnp.where(is_corner, 10.0, 1.0)
            return jnp.sum(nll * wgt) / jnp.sum(wgt)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step, tx


def train_synthetic(cfg: SuperPointConfig, train_cfg: SuperPointTrainConfig,
                    steps: int, h: int = 64, w: int = 64, batch: int = 4,
                    seed: int = 0):
    """Train the detector on fresh synthetic corner images."""
    model = SuperPoint(cfg)
    rng = np.random.default_rng(seed)
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((batch, h, w, 1), jnp.float32))
    step, tx = make_train_step(model, train_cfg)
    opt_state = tx.init(params)

    losses = []
    for _ in range(steps):
        imgs, labs = [], []
        for _ in range(batch):
            img, corners = synthetic_corners_image(rng, h, w)
            imgs.append(img[..., None])
            labs.append(corner_label_map(corners, h, w))
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(np.stack(imgs)),
                                       jnp.asarray(np.stack(labs)))
        losses.append(float(loss))
    return model, params, losses
