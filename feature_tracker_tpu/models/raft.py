"""RAFT optical flow in Flax (NHWC, TPU-native).

Architecture parity with the reference's from-scratch PyTorch RAFT
(reference: src/nn_optical_flow_tracker/raft/):
 - FeatureEncoder: conv7 stem -> 3 ResNet stages with stride-2 at each stage
   end (output H/8 x W/8), channels ramp c/4 -> c/2 -> 3c/4 -> c, conv3 out
   (encoder.py:25-55); ContextEncoder = same trunk, split into
   (context, hidden) (encoder.py:57-68).
 - Correlation pyramid: all-pairs <fmap0, fmap1>/sqrt(C) built once, 2x2
   average-pooled over the second image's dims per level
   (correlation_volumes.py:19-46); lookup samples a (2r+1)^2 window around
   locations/2^level with bilinear zero-padding — torch grid_sample
   align_corners=True, zeros padding (correlation_volumes.py:3-17,48-83).
 - UpdateBlock: MotionEncoder (1x1+3x3 on corr, 7x7+3x3 on flow, concat ->
   3x3 to out-2 channels, raw flow concatenated back), SepConvGRU
   (horizontal then vertical 1D-kernel GRU passes, kernel 5), FlowHead, and
   a mask head scaled by 0.25 (update_block.py, gru.py:46-76).
 - Convex upsampling: softmax over 9 neighbors of the 8x-scaled flow,
   3x3 unfold with zero padding, pixel-shuffle to [8H, 8W] (model.py:48-64).
 - Images normalized 2*(I/255)-1 (model.py:70-71); predictions from every
   iteration are returned (model.py:95-97).

TPU design notes: data layout is NHWC throughout; stride-2 convolutions use
explicit torch-style padding so geometry matches the reference; the
iterative update runs under ``lax.scan`` so the graph stays small and XLA
pipelines the per-iteration conv stack. The all-pairs correlation is one
batched matmul (MXU); a blockwise Pallas variant lives in ops/pallas for
large resolutions.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RaftConfig:
    """Defaults follow the reference self-test configuration
    (model.py:100-121)."""

    in_channels: int = 1
    hidden_channels: int = 64
    feature_channels: int = 128
    context_channels: int = 128
    correlation_pyramid_levels: int = 3
    correlation_radius: int = 3
    correlation_hidden_channels: int = 64
    correlation_out_channels: int = 32
    flow_hidden_channels: int = 32
    flow_out_channels: int = 16
    motion_out_channels: int = 32
    mask_hidden_channels: int = 64
    max_iterations: int = 5
    # True: never materialize the [B*H*W, H, W] all-pairs volume; compute
    # windowed correlations on the fly (O(HW) memory, required at real
    # resolutions where the volume is hundreds of MB per frame).
    low_memory: bool = False
    dtype: jnp.dtype = jnp.float32  # compute dtype (bfloat16 for perf)
    # Inference-only deviation: the reference returns the CONVEX-UPSAMPLED
    # flow of EVERY iteration (model.py:95-97) — training supervises all
    # of them. With True, the full-resolution unfold/softmax upsample
    # (pure data movement, no learned compute beyond the mask head, which
    # still runs per iteration so the param tree and net trajectory are
    # unchanged) is applied only to the FINAL iteration; the returned
    # list has length 1.
    upsample_last_only: bool = False


def _conv(features, kernel, stride=1, dtype=jnp.float32, name=None):
    pad = kernel // 2
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=((pad, pad), (pad, pad)), dtype=dtype, name=name)


class ResNetBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        in_features = x.shape[-1]
        h = _conv(self.features, 3, self.stride, self.dtype)(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(h)
        h = nn.relu(h)
        h = _conv(self.features, 3, 1, self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(h)
        if self.stride != 1 or in_features != self.features:
            x = nn.Conv(self.features, (1, 1), strides=(self.stride,) * 2,
                        dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype)(x)
        return nn.relu(h + x)


class FeatureEncoder(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        step = self.out_channels // 4
        x = nn.relu(_conv(step, 7, 1, self.dtype)(x))
        x = ResNetBlock(step, 1, self.dtype)(x, train)
        x = ResNetBlock(step * 2, 2, self.dtype)(x, train)
        x = ResNetBlock(step * 2, 1, self.dtype)(x, train)
        x = ResNetBlock(step * 3, 2, self.dtype)(x, train)
        x = ResNetBlock(step * 3, 1, self.dtype)(x, train)
        x = ResNetBlock(self.out_channels, 2, self.dtype)(x, train)
        x = nn.relu(_conv(self.out_channels, 3, 1, self.dtype)(x))
        return x


def compute_correlation_pyramid(fmap0, fmap1, num_levels: int):
    """All-pairs correlation pyramid.

    Args:
      fmap0, fmap1: ``[B, H, W, C]``.

    Returns:
      list of ``[B*H*W, H_i, W_i]`` volumes (level 0 first).
    """
    b, h, w, c = fmap0.shape
    f0 = fmap0.reshape(b, h * w, c)
    f1 = fmap1.reshape(b, h * w, c)
    corr = jnp.einsum("bnc,bmc->bnm", f0, f1,
                      precision="highest") / jnp.sqrt(
        jnp.asarray(c, f0.dtype))
    corr = corr.reshape(b * h * w, h, w)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        prev = pyramid[-1]
        h2 = (prev.shape[1] // 2) * 2
        w2 = (prev.shape[2] // 2) * 2
        pooled = 0.25 * (prev[:, 0:h2:2, 0:w2:2] + prev[:, 1:h2:2, 0:w2:2]
                         + prev[:, 0:h2:2, 1:w2:2] + prev[:, 1:h2:2, 1:w2:2])
        pyramid.append(pooled)
    return pyramid


def pool_feature_pyramid(fmap1, num_levels: int):
    """Half-resolution 2x2-average pyramid of the SECOND image's feature
    map. Because correlation is linear in f1, pooling the features first
    and dotting later equals pooling the correlation volume
    (compute_correlation_pyramid) exactly — without ever materializing
    the [B*H*W, H, W] volume. Returns list of ``[B, h_i, w_i, C]``."""
    pyr = [fmap1]
    for _ in range(num_levels - 1):
        prev = pyr[-1]
        h2 = (prev.shape[1] // 2) * 2
        w2 = (prev.shape[2] // 2) * 2
        pyr.append(0.25 * (prev[:, 0:h2:2, 0:w2:2]
                           + prev[:, 1:h2:2, 0:w2:2]
                           + prev[:, 0:h2:2, 1:w2:2]
                           + prev[:, 1:h2:2, 1:w2:2]))
    return pyr


def _gather_rows(fmap, yi, xi):
    """Zero-padded row gather from ``[h, w, C]`` at integer (yi, xi)
    [..., any shape]; out-of-range reads 0. Returns [..., C]."""
    h, w, _ = fmap.shape
    ok = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
    flat = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
    rows = fmap.reshape(h * w, -1)[flat.reshape(-1)]
    rows = rows.reshape(yi.shape + (fmap.shape[-1],))
    return jnp.where(ok[..., None], rows, 0.0)


def lookup_correlation_otf(fmap0, fmap1_pyramid, locations, radius: int):
    """Memory-light correlation lookup: compute the windowed correlations
    on the fly instead of sampling a precomputed all-pairs volume
    (SURVEY §5 long-context analogue: the [HW, HW] volume is O((HW)^2)
    memory; this path is O(HW * L * (2r+1)^2)). Numerically equal to
    compute_correlation_pyramid + lookup_correlation because pooling
    commutes with the dot product and both use zero-padded bilinear taps.

    Args:
      fmap0: ``[B, H, W, C]``; fmap1_pyramid: list of ``[B, h, w, C]``;
      locations: ``[B, H, W, 2]``.

    Returns:
      ``[B, H, W, L*(2r+1)^2]``.
    """
    b, h, w, c = fmap0.shape
    k = 2 * radius + 1
    scale = 1.0 / jnp.sqrt(jnp.asarray(c, fmap0.dtype))
    f0 = fmap0.reshape(b, h * w, c) * scale
    d = jnp.arange(-radius, radius + 1, dtype=locations.dtype)
    dxx, dyy = jnp.meshgrid(d, d)
    offsets = jnp.stack([dxx.reshape(-1), dyy.reshape(-1)], axis=-1)

    centers = locations.reshape(b, h * w, 2)
    out = []
    for lvl, f1 in enumerate(fmap1_pyramid):
        base = centers / (2.0 ** lvl)

        def one_offset(off, f1=f1):
            pos = base + off[None, None, :]
            x0 = jnp.floor(pos[..., 0])
            y0 = jnp.floor(pos[..., 1])
            fx = pos[..., 0] - x0
            fy = pos[..., 1] - y0
            x0i = x0.astype(jnp.int32)
            y0i = y0.astype(jnp.int32)

            def tap(yi, xi, wgt):
                rows = jax.vmap(_gather_rows)(f1, yi, xi)   # [B, HW, C]
                return wgt * jnp.einsum("bnc,bnc->bn", f0, rows,
                                        precision="highest")

            return (tap(y0i, x0i, (1 - fy) * (1 - fx))
                    + tap(y0i, x0i + 1, (1 - fy) * fx)
                    + tap(y0i + 1, x0i, fy * (1 - fx))
                    + tap(y0i + 1, x0i + 1, fy * fx))   # [B, HW]

        corr = jax.lax.map(one_offset, offsets)             # [K2, B, HW]
        out.append(corr.transpose(1, 2, 0).reshape(b, h, w, k * k))
    return jnp.concatenate(out, axis=-1)


def _bilinear_zeros(vol, pos):
    """Bilinear sample with zero padding (grid_sample align_corners=True,
    padding_mode='zeros': each out-of-range tap contributes 0).

    Args:
      vol: ``[M, h, w]``.
      pos: ``[M, K, 2]`` (x, y) pixel coordinates.

    Returns:
      ``[M, K]``.
    """
    h, w = vol.shape[-2:]
    x = pos[..., 0]
    y = pos[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    m = jnp.arange(vol.shape[0])[:, None]

    def tap(yi, xi, wgt):
        ok = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        v = vol[m, jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(ok, v * wgt, 0.0)

    return (tap(y0i, x0i, (1 - fy) * (1 - fx))
            + tap(y0i, x0i + 1, (1 - fy) * fx)
            + tap(y0i + 1, x0i, fy * (1 - fx))
            + tap(y0i + 1, x0i + 1, fy * fx))


def lookup_correlation(pyramid: Sequence, locations, radius: int):
    """Sample (2r+1)^2 windows around ``locations/2^level`` per level.

    Args:
      pyramid: list of ``[B*H*W, h_i, w_i]``.
      locations: ``[B, H, W, 2]`` current pixel locations (x, y).

    Returns:
      ``[B, H, W, L*(2r+1)^2]`` correlation features.
    """
    b, h, w, _ = locations.shape
    k = 2 * radius + 1
    d = jnp.arange(-radius, radius + 1, dtype=locations.dtype)
    dxx, dyy = jnp.meshgrid(d, d)  # torch meshgrid(dy, dx, ij) stack([dx,dy])
    offsets = jnp.stack([dxx.reshape(-1), dyy.reshape(-1)], axis=-1)  # [K2,2]
    out = []
    centers = locations.reshape(b * h * w, 1, 2)
    for i, vol in enumerate(pyramid):
        pos = centers / (2.0 ** i) + offsets[None, :, :]
        out.append(_bilinear_zeros(vol, pos).reshape(b, h, w, k * k))
    return jnp.concatenate(out, axis=-1)


class SepConvGru(nn.Module):
    hidden: int
    kernel: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, h):
        pad = self.kernel // 2
        for axis_kernel, axis_pad in (((1, self.kernel), ((0, 0), (pad, pad))),
                                      ((self.kernel, 1), ((pad, pad), (0, 0)))):
            def conv(name):
                return nn.Conv(self.hidden, axis_kernel, padding=axis_pad,
                               dtype=self.dtype, name=name)
            dir_name = "h" if axis_kernel[0] == 1 else "v"
            xh = jnp.concatenate([x, h], axis=-1)
            z = nn.sigmoid(conv(f"conv_z_{dir_name}")(xh))
            r = nn.sigmoid(conv(f"conv_r_{dir_name}")(xh))
            q = nn.tanh(conv(f"conv_q_{dir_name}")(
                jnp.concatenate([x, r * h], axis=-1)))
            h = (1 - z) * h + z * q
        return h


class MotionEncoder(nn.Module):
    cfg: RaftConfig

    @nn.compact
    def __call__(self, corr, flow):
        c = self.cfg
        dt = c.dtype
        t_corr = nn.relu(nn.Conv(c.correlation_hidden_channels, (1, 1),
                                 dtype=dt)(corr))
        t_corr = nn.relu(_conv(c.correlation_out_channels, 3, 1, dt)(t_corr))
        t_flow = nn.relu(_conv(c.flow_hidden_channels, 7, 1, dt)(flow))
        t_flow = nn.relu(_conv(c.flow_out_channels, 3, 1, dt)(t_flow))
        out = nn.relu(_conv(c.motion_out_channels - 2, 3, 1, dt)(
            jnp.concatenate([t_corr, t_flow], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)


class UpdateBlock(nn.Module):
    cfg: RaftConfig

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        c = self.cfg
        dt = c.dtype
        motion = MotionEncoder(c)(corr, flow)
        net = SepConvGru(c.hidden_channels, 5, dt)(
            jnp.concatenate([inp, motion], axis=-1), net)
        delta = _conv(2, 3, 1, jnp.float32, name="flow_conv2")(
            nn.relu(_conv(c.flow_out_channels, 3, 1, dt,
                          name="flow_conv1")(net)))
        mask = nn.Conv(8 * 8 * 9, (1, 1), dtype=jnp.float32, name="mask_out")(
            nn.relu(_conv(c.mask_hidden_channels, 3, 1, dt,
                          name="mask_hidden")(net)))
        return net, 0.25 * mask, delta


def upsample_flow_convex(flow, mask):
    """Learned convex 8x upsampling (reference: model.py:48-64).

    Args:
      flow: ``[B, H, W, 2]``; mask: ``[B, H, W, 576]``.

    Returns:
      ``[B, 8H, 8W, 2]``.
    """
    b, h, w, _ = flow.shape
    mask = mask.reshape(b, h, w, 9, 8, 8)
    mask = jax.nn.softmax(mask, axis=3)
    # 3x3 neighborhoods of 8*flow with zero padding (torch unfold).
    fpad = jnp.pad(8.0 * flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
    neigh = jnp.stack([fpad[:, i:i + h, j:j + w, :] for i in range(3)
                       for j in range(3)], axis=3)  # [B,H,W,9,2]
    up = jnp.einsum("bhwkc,bhwkuv->bhwuvc", neigh, mask,
                    precision="highest")  # [B,H,W,8,8,2]
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(b, 8 * h, 8 * w, 2)


class Raft(nn.Module):
    """Full RAFT. Input images ``[B, H, W, C]`` with 0..255 gray values;
    returns per-iteration upsampled flows ``[T, B, 8H', 8W', 2]`` with
    channels (dx, dy)."""

    cfg: RaftConfig = RaftConfig()

    @nn.compact
    def __call__(self, ref_image, cur_image, train: bool = False):
        c = self.cfg
        ref = (2.0 * (ref_image / 255.0) - 1.0).astype(c.dtype)
        cur = (2.0 * (cur_image / 255.0) - 1.0).astype(c.dtype)

        fenc = FeatureEncoder(c.feature_channels, c.dtype, name="feature_enc")
        fmap0 = fenc(ref, train).astype(jnp.float32)
        fmap1 = fenc(cur, train).astype(jnp.float32)

        ctx = FeatureEncoder(c.context_channels + c.hidden_channels, c.dtype,
                             name="context_enc")(ref, train)
        inp = ctx[..., :c.context_channels]
        net = ctx[..., c.context_channels:]

        if c.low_memory:
            # O(HW) path: pooled feature pyramid + on-the-fly windowed
            # correlation (numerically equal; see lookup_correlation_otf).
            fpyr = pool_feature_pyramid(fmap1, c.correlation_pyramid_levels)
        else:
            pyramid = compute_correlation_pyramid(
                fmap0, fmap1, c.correlation_pyramid_levels)

        b, h, w, _ = fmap0.shape
        xs = jnp.arange(w, dtype=jnp.float32)
        ys = jnp.arange(h, dtype=jnp.float32)
        gx, gy = jnp.meshgrid(xs, ys)
        ref_locs = jnp.broadcast_to(jnp.stack([gx, gy], -1)[None],
                                    (b, h, w, 2))

        update = UpdateBlock(c)

        def step(mdl, carry, _):
            net_, cur_locs = carry
            if c.low_memory:
                use_pallas = (jax.default_backend() == "tpu"
                              and c.correlation_radius <= 3)
                if use_pallas:
                    # Gather-free Pallas lookup (ops/pallas_raft_lookup),
                    # vmapped over the batch: ONE kernel instance with a
                    # batch grid dimension regardless of B (a Python loop
                    # here compiled B copies — VERDICT r1 item 7).
                    from feature_tracker_tpu.ops.pallas_raft_lookup import (
                        lookup_correlation_pallas_batched,
                    )
                    corr = lookup_correlation_pallas_batched(
                        fmap0, fpyr, cur_locs,
                        c.correlation_radius).astype(c.dtype)
                else:
                    corr = lookup_correlation_otf(
                        fmap0, fpyr, cur_locs, c.correlation_radius
                    ).astype(c.dtype)
            else:
                corr = lookup_correlation(
                    pyramid, cur_locs, c.correlation_radius).astype(c.dtype)
            flow = (cur_locs - ref_locs).astype(c.dtype)
            net_, up_mask, delta = mdl(net_, inp, corr, flow)
            cur_locs = cur_locs + delta.astype(jnp.float32)
            if c.upsample_last_only:
                # Defer the full-resolution upsample out of the scan;
                # emit the low-res flow + mask instead.
                return (net_, cur_locs), (cur_locs - ref_locs, up_mask)
            up = upsample_flow_convex(cur_locs - ref_locs, up_mask)
            return (net_, cur_locs), up

        # The update block's weights are shared across iterations, so scan
        # with broadcast params keeps the compiled graph small and lets XLA
        # pipeline the per-iteration conv stack.
        scan = nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False}, length=c.max_iterations)
        (_, _), predictions = scan(update, (net, ref_locs), None)
        if c.upsample_last_only:
            flows_lr, masks = predictions
            return upsample_flow_convex(flows_lr[-1], masks[-1])[None]
        return predictions
