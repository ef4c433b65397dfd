"""CoTracker-style joint point tracking over video, native JAX/Flax.

The reference reserves a slot for this capability but ships an empty
placeholder (reference: src/nn_optical_flow_tracker/co_tracker/model.py —
0 lines; README.md marks CoTracker unimplemented). This is a compact,
faithful-in-structure implementation of the CoTracker idea (Karaev et al.
2023): track N query points through T frames JOINTLY, with a factorized
transformer attending across time (per point) and across points (per
frame), iteratively refining all tracks at once.

Per iteration, each (point, frame) token packs:
 - multi-scale correlation features: the query point's frame-0 feature
   dotted against a (2r+1)^2 window around the current estimate in that
   frame's (pooled) feature pyramid — the same on-the-fly windowed
   correlation machinery RAFT uses (models/raft.py),
 - a sinusoidal embedding of the current flow from the query position,
 - the track's appearance feature.

The head predicts per-token position deltas and visibility logits.
Everything is static-shape: lax.scan over refinement iterations, fixed N
and T, NHWC convs for the encoder (MXU-friendly).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from feature_tracker_tpu.models.raft import (
    _gather_rows,
    pool_feature_pyramid,
)


@dataclasses.dataclass(frozen=True)
class CoTrackerConfig:
    feature_dim: int = 64
    stride: int = 4               # feature-map downsampling
    corr_levels: int = 2
    corr_radius: int = 3
    model_dim: int = 128
    num_heads: int = 4
    depth: int = 2                # transformer blocks per refinement
    iterations: int = 4
    # Sinusoidal time encoding on the tokens (param-free). Off by
    # default: weights trained without it expect unshifted activations.
    time_encoding: bool = False
    dtype: jnp.dtype = jnp.float32


class FrameEncoder(nn.Module):
    """Small conv encoder, stride-4 (stride//2 applied twice)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.dim // 2, (7, 7), strides=(2, 2), padding="SAME",
                    dtype=self.dtype)(x)
        x = nn.gelu(x)
        x = nn.Conv(self.dim, (3, 3), strides=(2, 2), padding="SAME",
                    dtype=self.dtype)(x)
        x = nn.gelu(x)
        x = nn.Conv(self.dim, (3, 3), padding="SAME", dtype=self.dtype)(x)
        return x


def _bilinear_rows(fmap, pos):
    """Zero-padded bilinear feature sample: fmap [h, w, C], pos [..., 2]
    (x, y) in feature coords. Returns [..., C]."""
    x = pos[..., 0]
    y = pos[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    return ((1 - fy) * (1 - fx) * _gather_rows(fmap, y0i, x0i)
            + (1 - fy) * fx * _gather_rows(fmap, y0i, x0i + 1)
            + fy * (1 - fx) * _gather_rows(fmap, y0i + 1, x0i)
            + fy * fx * _gather_rows(fmap, y0i + 1, x0i + 1))


def _corr_features(track_feat, fpyrs, pos, radius: int):
    """Windowed correlation of each track's appearance feature against
    each frame's feature pyramid around the current positions.

    track_feat: [N, C]; fpyrs: list of [T, h, w, C]; pos: [T, N, 2]
    (feature coords at level 0). Returns [T, N, L*(2r+1)^2]."""
    k = 2 * radius + 1
    d = jnp.arange(-radius, radius + 1, dtype=pos.dtype)
    dxx, dyy = jnp.meshgrid(d, d)
    offs = jnp.stack([dxx.reshape(-1), dyy.reshape(-1)], -1)  # [K2, 2]
    c = track_feat.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(c, pos.dtype))
    out = []
    for lvl, fp in enumerate(fpyrs):
        p = pos / (2.0 ** lvl)
        sample_pos = p[:, :, None, :] + offs[None, None, :, :]  # [T,N,K2,2]
        rows = jax.vmap(_bilinear_rows)(fp, sample_pos)         # [T,N,K2,C]
        out.append(jnp.einsum("nc,tnkc->tnk", track_feat * scale, rows,
                              precision="highest"))
    return jnp.concatenate(out, axis=-1)


def _flow_embedding(flow, dim: int):
    """Sinusoidal embedding of 2D flow, [..., dim] (dim multiple of 4)."""
    freqs = 2.0 ** jnp.arange(dim // 4, dtype=flow.dtype)
    ang = flow[..., :, None] * freqs * (jnp.pi / 64.0)  # [..., 2, dim/4]
    emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return emb.reshape(flow.shape[:-1] + (dim,))


class AttnBlock(nn.Module):
    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.MultiHeadDotProductAttention(num_heads=self.heads,
                                            dtype=self.dtype)(h, h)
        x = x + h
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(4 * self.dim, dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype)(h)
        return x + h


class FactorizedUpdate(nn.Module):
    """Time attention per track, then point attention per frame."""

    cfg: CoTrackerConfig

    @nn.compact
    def __call__(self, tokens):
        c = self.cfg
        t, n, d = tokens.shape
        for i in range(c.depth):
            # Across time: each point attends over its own trajectory.
            x = tokens.transpose(1, 0, 2)                     # [N, T, D]
            x = AttnBlock(c.model_dim, c.num_heads, c.dtype,
                          name=f"time_{i}")(x)
            tokens = x.transpose(1, 0, 2)
            # Across points: joint reasoning within each frame.
            tokens = AttnBlock(c.model_dim, c.num_heads, c.dtype,
                               name=f"point_{i}")(tokens)
        # Zero-init refinement heads (RAFT-style): the untrained tracker
        # predicts zero deltas, so iterative refinement starts from the
        # query positions instead of compounding random offsets across
        # iterations (x stride in pixels).
        delta = nn.Dense(2, dtype=jnp.float32, name="delta_head",
                         kernel_init=nn.initializers.zeros)(tokens)
        vis = nn.Dense(1, dtype=jnp.float32, name="vis_head",
                       kernel_init=nn.initializers.zeros)(tokens)
        return delta, vis[..., 0]


class CoTracker(nn.Module):
    """Joint tracker. video [T, H, W, C] (0..255), queries [N, 2] (x, y)
    on frame 0. Returns (tracks [T, N, 2] pixel coords, visibility logits
    [T, N]). Batch via vmap."""

    cfg: CoTrackerConfig = CoTrackerConfig()

    @nn.compact
    def __call__(self, video, queries, return_all_iterations: bool = False):
        c = self.cfg
        t = video.shape[0]
        n = queries.shape[0]
        frames = (2.0 * (video / 255.0) - 1.0).astype(c.dtype)
        fmaps = FrameEncoder(c.feature_dim, c.dtype)(frames)  # [T,h,w,C]
        fmaps = fmaps.astype(jnp.float32)
        fpyrs = pool_feature_pyramid(fmaps, c.corr_levels)

        q_feat_pos = queries / c.stride                       # [N, 2]
        track_feat = _bilinear_rows(fmaps[0], q_feat_pos)     # [N, C]

        k2 = (2 * c.corr_radius + 1) ** 2
        proj = nn.Dense(c.model_dim, dtype=c.dtype, name="token_proj")
        feat_proj = nn.Dense(c.model_dim, dtype=c.dtype, name="feat_proj")
        update = FactorizedUpdate(c, name="update")
        emb_dim = (c.model_dim // 4) * 4

        feat_tokens = feat_proj(track_feat)[None, :, :]       # [1, N, D]
        # Param-free sinusoidal TIME encoding: without it the time
        # attention is permutation-invariant along T (frame order would
        # be visible only through the flow-embedding content), so the
        # model cannot express trajectory smoothness priors. Works for
        # any T; adds no parameters. Config-gated because weights
        # trained without it expect unshifted activations.
        if c.time_encoding:
            ti = jnp.arange(t, dtype=jnp.float32)[:, None]    # [T, 1]
            di = jnp.arange(c.model_dim, dtype=jnp.float32)[None, :]
            ang = ti / jnp.power(100.0, (di // 2) * 2.0 / c.model_dim)
            time_tokens = jnp.where((di % 2) == 0, jnp.sin(ang),
                                    jnp.cos(ang)).astype(
                                        c.dtype)[:, None, :]  # [T, 1, D]
        else:
            time_tokens = jnp.zeros((t, 1, c.model_dim), c.dtype)

        def refine(mdl, carry, _):
            pos, vis = carry                                  # [T, N, 2]
            corr = _corr_features(track_feat, fpyrs, pos, c.corr_radius)
            flow = pos - q_feat_pos[None, :, :]
            tok = jnp.concatenate(
                [corr.astype(c.dtype),
                 _flow_embedding(flow.astype(c.dtype), emb_dim)], axis=-1)
            tokens = proj(tok) + feat_tokens + time_tokens
            delta, new_vis = mdl(tokens)
            new_pos = pos + delta
            return (new_pos, new_vis), new_pos

        pos0 = jnp.broadcast_to(q_feat_pos[None, :, :], (t, n, 2))
        scan = nn.scan(refine, variable_broadcast="params",
                       split_rngs={"params": False}, length=c.iterations)
        (pos, vis), pos_iters = scan(update, (pos0, jnp.zeros((t, n))),
                                     None)
        del k2
        if return_all_iterations:
            # Every refinement iteration's positions [K, T, N, 2] for the
            # RAFT-style exponentially weighted training loss.
            return pos * c.stride, vis, pos_iters * c.stride
        return pos * c.stride, vis
