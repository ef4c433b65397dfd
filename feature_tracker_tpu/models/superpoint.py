"""SuperPoint detector + descriptor in Flax (NHWC).

TPU-native replacement for the reference's ONNX SuperPoint detector
(reference: test_descriptor_matcher_superpoint.cpp:48-61, options
kMinResponse / kMinFeatureDistance / kMaxNumberOfDetectedFeatures /
kModelType=kSuperpointNms). The reference runs an opaque onnxruntime
session; here the standard SuperPoint architecture (DeTone et al. 2018) is
implemented natively so detection + description is one jitted function:

 - shared VGG-style encoder: [64,64]-pool-[64,64]-pool-[128,128]-pool-
   [128,128] -> H/8 x W/8
 - detector head: conv3x3(256) -> conv1x1(65); softmax over the 65 channels
   (64 cell pixels + dustbin), dustbin dropped, depth-to-space to a full
   resolution heatmap
 - descriptor head: conv3x3(256) -> conv1x1(D); bilinear sampling at
   keypoints + L2 normalization
 - NMS: 3x3 local max + response threshold + top-K with min-distance
   suppression (same routine as the classic Harris path).

Output layout matches the classic detector: (uv [K,2], num) plus
descriptors [K,D], so the descriptor matcher consumes either source.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp

from feature_tracker_tpu.core.config import HarrisOptions
from feature_tracker_tpu.ops import detect as _detect


@dataclasses.dataclass(frozen=True)
class SuperPointConfig:
    descriptor_dim: int = 256
    dtype: jnp.dtype = jnp.float32


def _vgg_block(x, features, dtype, train):
    x = nn.Conv(features, (3, 3), padding="SAME", dtype=dtype)(x)
    x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                     dtype=dtype)(x)
    return nn.relu(x)


class SuperPoint(nn.Module):
    cfg: SuperPointConfig = SuperPointConfig()

    @nn.compact
    def __call__(self, image, train: bool = False):
        """image: [B, H, W, 1] in 0..255. Returns (heatmap [B, H, W],
        dense descriptors [B, H/8, W/8, D], unnormalized)."""
        c = self.cfg
        x = image / 255.0
        x = x.astype(c.dtype)
        for i, feats in enumerate([64, 64, 64, 64, 128, 128, 128, 128]):
            x = _vgg_block(x, feats, c.dtype, train)
            if i in (1, 3, 5):
                x = nn.max_pool(x, (2, 2), strides=(2, 2))

        # Detector head.
        det = _vgg_block(x, 256, c.dtype, train)
        det = nn.Conv(65, (1, 1), dtype=jnp.float32)(det)
        prob = jax.nn.softmax(det, axis=-1)[..., :64]  # drop dustbin
        b, hc, wc, _ = prob.shape
        heat = prob.reshape(b, hc, wc, 8, 8)
        heat = heat.transpose(0, 1, 3, 2, 4).reshape(b, hc * 8, wc * 8)

        # Descriptor head.
        desc = _vgg_block(x, 256, c.dtype, train)
        desc = nn.Conv(c.descriptor_dim, (1, 1), dtype=jnp.float32)(desc)
        return heat, desc


def sample_descriptors(desc_map, uv, stride: int = 8):
    """Bilinear-sample L2-normalized descriptors at pixel positions.

    Args:
      desc_map: ``[Hc, Wc, D]`` dense descriptors at 1/stride resolution.
      uv: ``[K, 2]`` full-resolution (x, y).
    """
    hc, wc, _ = desc_map.shape
    pos = (uv + 0.5) / stride - 0.5  # cell-center aligned
    x = jnp.clip(pos[:, 0], 0.0, wc - 1.0)
    y = jnp.clip(pos[:, 1], 0.0, hc - 1.0)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, wc - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, hc - 2)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    d = ((1 - fy) * (1 - fx) * desc_map[y0, x0]
         + (1 - fy) * fx * desc_map[y0, x0 + 1]
         + fy * (1 - fx) * desc_map[y0 + 1, x0]
         + fy * fx * desc_map[y0 + 1, x0 + 1])
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)


@partial(jax.jit, static_argnames=("max_num", "min_distance"))
def select_keypoints(heatmap, max_num: int, min_response,
                     min_distance: int = 4):
    """Heatmap -> (uv [max_num, 2], num) with 3x3 NMS, threshold, top-K and
    greedy radius suppression (mirrors the classic detector's contract)."""
    opts = HarrisOptions(min_feature_distance=min_distance,
                         min_valid_response=0.0, max_candidates=4096)
    local_max = jax.lax.reduce_window(
        heatmap, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")
    h, w = heatmap.shape
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    border = 4
    inb = ((rows >= border) & (rows < h - border)
           & (cols >= border) & (cols < w - border))
    cand = (heatmap >= local_max) & (heatmap > min_response) & inb
    scores = jnp.where(cand, heatmap, -jnp.inf)
    k = min(opts.max_candidates, h * w)
    top_scores, flat_idx = jax.lax.top_k(scores.reshape(-1), k)
    cy = (flat_idx // w).astype(jnp.float32)
    cx = (flat_idx % w).astype(jnp.float32)
    valid = top_scores > -jnp.inf
    d2 = (cx[:, None] - cx[None, :]) ** 2 + (cy[:, None] - cy[None, :]) ** 2
    conflict = d2 < float(min_distance) ** 2
    keep = _detect.greedy_suppression(valid, conflict)
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    slot = jnp.where(keep & (rank < max_num), rank, max_num)
    out_x = jnp.full((max_num + 1,), -1.0).at[slot].set(cx, mode="drop")
    out_y = jnp.full((max_num + 1,), -1.0).at[slot].set(cy, mode="drop")
    num = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), max_num)
    return jnp.stack([out_x[:max_num], out_y[:max_num]], -1), num


class SuperPointDetector:
    """Detect-and-describe front end (NNFeaturePointDetector equivalent).

    Options mirror the reference demo's configuration surface:
    min_response, min_feature_distance, max_features
    (reference: test_descriptor_matcher_superpoint.cpp:48-56)."""

    def __init__(self, variables, cfg: SuperPointConfig = SuperPointConfig(),
                 min_response: float = 0.005, min_feature_distance: int = 4,
                 max_features: int = 300):
        self.model = SuperPoint(cfg)
        self.variables = variables
        self.min_response = min_response
        self.min_feature_distance = min_feature_distance
        self.max_features = max_features

    @classmethod
    def init_random(cls, rng, image_shape=(1, 120, 160, 1), **kw):
        model = SuperPoint()
        variables = model.init(rng, jnp.zeros(image_shape, jnp.float32))
        return cls(variables, **kw)

    @classmethod
    def from_file(cls, path: str | None = None, **kw):
        """Load pretrained weights (weights/superpoint.npz, produced by
        train/pretrain.py). Returns None when the file is absent so
        callers can fall back to init_random."""
        from feature_tracker_tpu.utils.weights import (
            load_pytree,
            weights_path,
        )
        import os
        path = path or weights_path("superpoint.npz")
        if not os.path.exists(path):
            return None
        det = cls.init_random(jax.random.PRNGKey(0), **kw)
        det.variables = load_pytree(path, det.variables)
        return det

    def detect(self, image):
        """image: [H, W] 0..255. Returns (uv [K,2], descriptors [K,D], num)."""
        return _detect_jit(self.model, self.variables, image,
                           self.max_features, self.min_response,
                           self.min_feature_distance)


@partial(jax.jit, static_argnames=("model", "max_features", "min_distance"))
def _detect_jit(model, variables, image, max_features: int, min_response,
                min_distance: int):
    heat, desc = model.apply(variables, image[None, :, :, None])
    uv, num = select_keypoints(heat[0], max_features, min_response,
                               min_distance)
    d = sample_descriptors(desc[0], uv)
    return uv, d, num
