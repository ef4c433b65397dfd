"""DISK detector + descriptor in Flax (NHWC).

TPU-native replacement for the reference's ONNX DISK detector
(reference: test_descriptor_matcher_disk.cpp:48-61, options kMinResponse /
kMinFeatureDistance / kMaxNumberOfDetectedFeatures / kModelType=kDiskNms;
descriptor type is a 128-d float vector). The reference runs an opaque
onnxruntime session; here the DISK architecture (Tyszkiewicz et al. 2020)
is implemented natively:

 - U-Net trunk: ``depth`` down blocks (two 3x3 convs + 2x2 average pool)
   and matching up blocks (2x bilinear upsample + skip concat + two 3x3
   convs), instance-norm free, gelu activations
 - head: 1x1 conv to descriptor_dim + 1 channels — channel 0 is the
   detection heatmap, channels 1..D are the dense full-resolution
   descriptor field
 - keypoints: 3x3 NMS + threshold + top-K with greedy radius suppression
   (shared ``select_keypoints`` routine), descriptors bilinearly sampled
   at keypoints and L2-normalized.

Output layout matches SuperPointDetector: (uv [K, 2], desc [K, D], num).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp

from feature_tracker_tpu.models.superpoint import select_keypoints


@dataclasses.dataclass(frozen=True)
class DiskConfig:
    descriptor_dim: int = 128
    base_channels: int = 32
    depth: int = 3
    dtype: jnp.dtype = jnp.float32


def _double_conv(x, features, dtype):
    x = nn.Conv(features, (3, 3), padding="SAME", dtype=dtype)(x)
    x = nn.gelu(x)
    x = nn.Conv(features, (3, 3), padding="SAME", dtype=dtype)(x)
    return nn.gelu(x)


def _upsample2x(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")


class Disk(nn.Module):
    cfg: DiskConfig = DiskConfig()

    @nn.compact
    def __call__(self, image):
        """image: [B, H, W, 1] in 0..255, H and W divisible by
        2**cfg.depth. Returns (heatmap [B, H, W], descriptors
        [B, H, W, D] unnormalized)."""
        c = self.cfg
        x = (image / 255.0 - 0.5).astype(c.dtype)

        skips = []
        feats = c.base_channels
        for _ in range(c.depth):
            x = _double_conv(x, feats, c.dtype)
            skips.append(x)
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            feats *= 2
        x = _double_conv(x, feats, c.dtype)
        for skip in reversed(skips):
            feats //= 2
            x = _upsample2x(x)
            x = jnp.concatenate([x, skip], axis=-1)
            x = _double_conv(x, feats, c.dtype)

        out = nn.Conv(c.descriptor_dim + 1, (1, 1), dtype=jnp.float32)(x)
        return out[..., 0], out[..., 1:]


def sample_descriptors_fullres(desc_map, uv):
    """Bilinear-sample L2-normalized descriptors from a full-resolution
    field at (x, y) positions."""
    h, w, _ = desc_map.shape
    x = jnp.clip(uv[:, 0], 0.0, w - 1.0)
    y = jnp.clip(uv[:, 1], 0.0, h - 1.0)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 2)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    d = ((1 - fy) * (1 - fx) * desc_map[y0, x0]
         + (1 - fy) * fx * desc_map[y0, x0 + 1]
         + fy * (1 - fx) * desc_map[y0 + 1, x0]
         + fy * fx * desc_map[y0 + 1, x0 + 1])
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)


@partial(jax.jit, static_argnames=("model", "max_features", "min_distance"))
def _detect_jit(model, variables, image, max_features: int, min_response,
                min_distance: int):
    pad_h = (-image.shape[0]) % (2 ** model.cfg.depth)
    pad_w = (-image.shape[1]) % (2 ** model.cfg.depth)
    padded = jnp.pad(image, ((0, pad_h), (0, pad_w)))
    heat, desc = model.apply(variables, padded[None, :, :, None])
    h, w = image.shape
    heat = heat[0, :h, :w]
    uv, num = select_keypoints(heat, max_features, min_response,
                               min_distance)
    d = sample_descriptors_fullres(desc[0, :h, :w], uv)
    return uv, d, num


class DiskDetector:
    """Detect-and-describe front end (NNFeaturePointDetector with
    kModelType=kDiskNms equivalent)."""

    def __init__(self, variables, cfg: DiskConfig = DiskConfig(),
                 min_response: float = 0.0, min_feature_distance: int = 4,
                 max_features: int = 300):
        self.model = Disk(cfg)
        self.variables = variables
        self.min_response = min_response
        self.min_feature_distance = min_feature_distance
        self.max_features = max_features

    @classmethod
    def init_random(cls, rng, image_shape=(1, 120, 160, 1),
                    cfg: DiskConfig = DiskConfig(), **kw):
        model = Disk(cfg)
        variables = model.init(rng, jnp.zeros(image_shape, jnp.float32))
        return cls(variables, cfg, **kw)

    @classmethod
    def from_file(cls, path: str | None = None,
                  cfg: DiskConfig = DiskConfig(), **kw):
        """Load pretrained weights (weights/disk.npz, produced by
        train/pretrain.py); None when absent."""
        from feature_tracker_tpu.utils.weights import (
            load_pytree,
            weights_path,
        )
        import os
        path = path or weights_path("disk.npz")
        if not os.path.exists(path):
            return None
        det = cls.init_random(jax.random.PRNGKey(0), cfg=cfg, **kw)
        det.variables = load_pytree(path, det.variables)
        return det

    def detect(self, image):
        """image: [H, W] 0..255. Returns (uv [K,2], descriptors [K,D], num)."""
        return _detect_jit(self.model, self.variables, image,
                           self.max_features, self.min_response,
                           self.min_feature_distance)
