"""RAFT supervised training on TPU meshes.

The reference has no training loop anywhere (SURVEY §5); this subsystem is
new scope: the standard RAFT sequence loss (exponentially weighted L1 over
the per-iteration predictions, gamma = 0.8) with AdamW, expressed as a pure
jitted train step.

Parallelism: the step is jitted over a 2D ``Mesh(('data', 'model'))``:
 - batch dimension sharded over 'data' (DP),
 - image height sharded over 'model' (the sequence-parallel analogue for
   dense vision — XLA's SPMD partitioner inserts the halo exchanges the
   convolutions need),
 - parameters and optimizer state replicated; gradient reduction becomes a
   psum over 'data' inserted automatically by XLA.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from feature_tracker_tpu.models.raft import Raft, RaftConfig


@dataclasses.dataclass(frozen=True)
class RaftTrainConfig:
    learning_rate: float = 2e-4
    weight_decay: float = 1e-5
    clip_norm: float = 1.0
    gamma: float = 0.8  # per-iteration loss decay (RAFT paper)
    # One-cycle schedule over this many steps (0 = constant lr). RAFT's
    # published recipe uses a one-cycle triangular schedule.
    schedule_steps: int = 0
    warmup_frac: float = 0.05


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(cfg: RaftTrainConfig):
    if cfg.schedule_steps > 0:
        warm = max(1, int(cfg.schedule_steps * cfg.warmup_frac))
        lr = optax.join_schedules(
            [optax.linear_schedule(0.0, cfg.learning_rate, warm),
             optax.cosine_decay_schedule(cfg.learning_rate,
                                         cfg.schedule_steps - warm)],
            [warm])
    else:
        lr = cfg.learning_rate
    return optax.chain(
        optax.clip_by_global_norm(cfg.clip_norm),
        optax.adamw(lr, weight_decay=cfg.weight_decay),
    )


def create_train_state(rng, raft_cfg: RaftConfig, train_cfg: RaftTrainConfig,
                       sample_shape):
    model = Raft(raft_cfg)
    dummy = jnp.zeros(sample_shape, jnp.float32)
    variables = model.init(rng, dummy, dummy, train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = make_optimizer(train_cfg).init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=opt_state)


def sequence_loss(predictions, gt_flow, gamma: float):
    """Exponentially weighted L1 over per-iteration predictions.

    Args:
      predictions: ``[T, B, H, W, 2]``; gt_flow: ``[B, H, W, 2]``.
    """
    t = predictions.shape[0]
    weights = gamma ** jnp.arange(t - 1, -1, -1, dtype=predictions.dtype)
    l1 = jnp.mean(jnp.abs(predictions - gt_flow[None]), axis=(1, 2, 3, 4))
    return jnp.sum(weights * l1)


def _warp_bilinear(img, flow):
    """Backward warp: sample ``img`` at p + flow(p).

    img ``[B, H, W, C]``, flow ``[B, H, W, 2]`` (dx, dy). Returns
    (warped ``[B, H, W, C]``, valid ``[B, H, W, 1]`` — 1 where all four
    taps land inside the image)."""
    b, h, w, c = img.shape
    gx, gy = jnp.meshgrid(jnp.arange(w, dtype=flow.dtype),
                          jnp.arange(h, dtype=flow.dtype))
    x = gx[None] + flow[..., 0]
    y = gy[None] + flow[..., 1]
    valid = ((x >= 0) & (x <= w - 1) & (y >= 0)
             & (y <= h - 1)).astype(img.dtype)[..., None]
    x = jnp.clip(x, 0.0, w - 1.001)
    y = jnp.clip(y, 0.0, h - 1.001)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    flat = img.reshape(b, h * w, c)

    def tap(yi, xi):
        idx = (yi * w + xi).reshape(b, h * w, 1)
        return jnp.take_along_axis(flat, idx, axis=1).reshape(b, h, w, c)

    out = ((1 - fy) * (1 - fx) * tap(y0i, x0i)
           + (1 - fy) * fx * tap(y0i, x0i + 1)
           + fy * (1 - fx) * tap(y0i + 1, x0i)
           + fy * fx * tap(y0i + 1, x0i + 1))
    return out, valid


def _edge_aware_smoothness(flow, image):
    """First-order smoothness of the flow, downweighted at image edges
    (exp(-|dI|/8) on 0..255 gray) — the standard unsupervised-flow
    regularizer that keeps the photometric term from collapsing into
    noise in textureless regions."""
    di_x = jnp.abs(image[:, :, 1:] - image[:, :, :-1]).mean(-1, keepdims=True)
    di_y = jnp.abs(image[:, 1:] - image[:, :-1]).mean(-1, keepdims=True)
    wx = jnp.exp(-di_x / 8.0)
    wy = jnp.exp(-di_y / 8.0)
    df_x = jnp.abs(flow[:, :, 1:] - flow[:, :, :-1])
    df_y = jnp.abs(flow[:, 1:] - flow[:, :-1])
    return (jnp.mean(wx * df_x) + jnp.mean(wy * df_y))


def photometric_sequence_loss(predictions, ref, cur, gamma: float,
                              smooth_weight: float = 0.05):
    """Unsupervised photometric-warp loss over per-iteration predictions
    (VERDICT r4 item 4: REAL consecutive frames have no dense flow
    ground truth — supervision is ref(p) ~ cur(p + flow(p))).

    Charbonnier on the 0..1-scaled warp residual over in-image pixels,
    exponentially weighted per iteration like sequence_loss, plus an
    edge-aware smoothness term on each predicted flow."""
    t = predictions.shape[0]
    weights = gamma ** jnp.arange(t - 1, -1, -1, dtype=predictions.dtype)
    total = 0.0
    for k in range(t):
        warped, valid = _warp_bilinear(cur, predictions[k])
        resid = (ref - warped) / 255.0
        photo = jnp.sum(valid * jnp.sqrt(resid * resid + 1e-6)) \
            / jnp.maximum(jnp.sum(valid), 1.0)
        total = total + weights[k] * (
            photo + smooth_weight * _edge_aware_smoothness(
                predictions[k] / 8.0, ref))
    return total


def make_train_step(raft_cfg: RaftConfig, train_cfg: RaftTrainConfig,
                    mesh: Mesh | None = None):
    """Build the jitted train step.

    With a mesh, inputs are sharded batch-over-'data' and height-over-
    'model'; state is replicated.
    """
    model = Raft(raft_cfg)
    tx = make_optimizer(train_cfg)

    def train_step(state: TrainState, ref, cur, gt_flow):
        def loss_fn(params):
            preds, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                ref, cur, train=True, mutable=["batch_stats"])
            loss = sequence_loss(preds, gt_flow, train_cfg.gamma)
            return loss, (preds, updates["batch_stats"])

        (loss, (preds, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        epe = jnp.mean(jnp.linalg.norm(preds[-1] - gt_flow, axis=-1))
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_stats, opt_state=new_opt)
        return new_state, {"loss": loss, "epe": epe}

    if mesh is None:
        return jax.jit(train_step)
    return _shard_step(train_step, mesh)


def make_unsup_train_step(raft_cfg: RaftConfig, train_cfg: RaftTrainConfig,
                          smooth_weight: float = 0.05,
                          mesh: Mesh | None = None):
    """Photometric-warp (unsupervised) train step for REAL frame pairs
    with no flow ground truth. Same state/optimizer contract as
    make_train_step; reports the photometric loss and the mean |flow| of
    the final iteration (no EPE — there is no ground truth)."""
    model = Raft(raft_cfg)
    tx = make_optimizer(train_cfg)

    def train_step(state: TrainState, ref, cur):
        def loss_fn(params):
            preds, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                ref, cur, train=True, mutable=["batch_stats"])
            loss = photometric_sequence_loss(preds, ref, cur,
                                             train_cfg.gamma,
                                             smooth_weight)
            return loss, (preds, updates["batch_stats"])

        (loss, (preds, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        mean_flow = jnp.mean(jnp.linalg.norm(preds[-1], axis=-1))
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_stats, opt_state=new_opt)
        return new_state, {"loss": loss, "mean_flow": mean_flow}

    if mesh is None:
        return jax.jit(train_step)
    batch_spec = P("data", "model")
    replicated = NamedSharding(mesh, P())
    data_sharding = NamedSharding(mesh, batch_spec)
    return jax.jit(
        train_step,
        in_shardings=(replicated, data_sharding, data_sharding),
        out_shardings=(replicated, replicated),
    )


def _shard_step(train_step, mesh):

    batch_spec = P("data", "model")  # [B, H, W, C] -> shard B and H
    replicated = NamedSharding(mesh, P())
    data_sharding = NamedSharding(mesh, batch_spec)
    return jax.jit(
        train_step,
        in_shardings=(replicated, data_sharding, data_sharding,
                      data_sharding),
        out_shardings=(replicated, replicated),
    )
