"""LightGlue attention matcher, native JAX/Flax.

TPU-native replacement for the reference's onnxruntime LightGlue sessions
(reference: src/nn_feature_matcher/nn_feature_matcher.cpp:11-31 loads one of
4 ONNX variants; the .onnx blobs are absent from the mount, so the
architecture is implemented natively after Lindenberger et al., ICCV 2023).

Inputs mirror the reference's 4 session tensors
(nn_feature_matcher.cpp:91-138): kpts_ref [N,2], kpts_cur [M,2],
desc_ref [N,D], desc_cur [M,D] — plus validity masks since jit needs static
shapes.

Architecture:
 - input projection of descriptors to the model width d
 - ``depth`` transformer layers; each runs a SELF-attention unit (rotary
   positional encoding from a learnable Fourier projection of the
   normalized keypoint positions) then a CROSS-attention unit (no
   positional encoding) — both applied to the two images with shared
   weights, message fused via x + MLP([x | message])
 - assignment head: similarity S = proj(x_ref) . proj(x_cur) / sqrt(d)
   plus per-point matchability logits; the log partial assignment is
   log sigma_ref_i + log sigma_cur_j + log_softmax_row(S) +
   log_softmax_col(S) (dual softmax), matching the exp(score) in [0, 1]
   semantics the reference post-processing relies on
   (nn_feature_matcher.cpp:183-186).

Both reference output modes are provided (nn_feature_matcher.cpp:158-216):
``scores`` returns the [N, M] log-assignment matrix; ``match_pairs``
additionally runs mutual-argmax + threshold inside jit and returns a fixed
size [K, 2] int32 match list + scores (the "fused matches" variant).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class LightGlueConfig:
    descriptor_dim: int = 256     # 256 for SuperPoint, 128 for DISK
    model_dim: int = 256
    num_heads: int = 4
    depth: int = 9
    dtype: jnp.dtype = jnp.float32


def normalize_keypoints(kpts, mask, image_hw=None):
    """Shift/scale keypoints into ~[-1, 1].

    With ``image_hw`` given, normalize by the image center and half max
    dim; otherwise by the bounding box of the valid keypoints (the public
    LightGlue fallback when the image size is unknown)."""
    if image_hw is not None:
        h, w = image_hw
        center = jnp.array([w / 2.0, h / 2.0], kpts.dtype)
        scale = jnp.asarray(max(h, w) / 2.0, kpts.dtype)
    else:
        big = jnp.where(mask[:, None], kpts, -jnp.inf)
        small = jnp.where(mask[:, None], kpts, jnp.inf)
        kmax = jnp.max(big, axis=0)
        kmin = jnp.min(small, axis=0)
        ok = jnp.isfinite(kmax).all() & jnp.isfinite(kmin).all()
        kmax = jnp.where(ok, kmax, 1.0)
        kmin = jnp.where(ok, kmin, 0.0)
        center = (kmax + kmin) / 2.0
        scale = jnp.maximum(jnp.max(kmax - kmin) / 2.0, 1.0)
    return (kpts - center[None, :]) / scale


class FourierRotary(nn.Module):
    """Learnable Fourier features -> per-position rotation angles.

    Projects 2D normalized positions to head_dim/2 angles; the resulting
    cos/sin pair rotates query/key channel pairs (2D rotary encoding)."""

    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pos):
        angles = nn.Dense(self.head_dim // 2, use_bias=False,
                          dtype=self.dtype, name="freq")(pos)
        return jnp.cos(angles), jnp.sin(angles)  # each [N, head_dim/2]


def apply_rotary(x, cos, sin):
    """Rotate channel pairs of ``x [N, H, Dh]`` by per-position angles
    ``cos/sin [N, Dh/2]``."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    c = cos[:, None, :]
    s = sin[:, None, :]
    out = jnp.stack([x1 * c - x2 * s, x1 * s + x2 * c], axis=-1)
    return out.reshape(x.shape)


def _attend(q, k, v, key_mask):
    """Standard scaled dot-product attention over axis 0 tokens.

    q: [N, H, Dh], k/v: [M, H, Dh], key_mask: [M] bool."""
    dh = q.shape[-1]
    logits = jnp.einsum("nhd,mhd->hnm", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    logits = jnp.where(key_mask[None, None, :], logits, NEG_INF)
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("hnm,mhd->nhd", attn, v,
                      preferred_element_type=jnp.float32)


class MessageFuse(nn.Module):
    """x + MLP([x | message]) with LayerNorm, as in the public LightGlue."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, message):
        h = jnp.concatenate([x, message], axis=-1)
        h = nn.Dense(2 * self.dim, dtype=self.dtype)(h)
        h = nn.LayerNorm(dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype)(h)
        return x + h


class SelfUnit(nn.Module):
    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cos, sin, mask):
        dh = self.dim // self.heads
        n = x.shape[0]
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(n, 3, self.heads, dh), 3, axis=1)
        q = apply_rotary(q[:, 0], cos, sin)
        k = apply_rotary(k[:, 0], cos, sin)
        msg = _attend(q, k, v[:, 0], mask).reshape(n, self.dim)
        msg = nn.Dense(self.dim, dtype=self.dtype, name="out")(msg)
        return MessageFuse(self.dim, self.dtype)(x, msg)


class CrossUnit(nn.Module):
    """Bidirectional cross attention (shared weights for both directions)."""

    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x0, x1, mask0, mask1):
        dh = self.dim // self.heads
        qk = nn.Dense(self.dim, dtype=self.dtype, name="qk")
        val = nn.Dense(self.dim, dtype=self.dtype, name="v")
        out = nn.Dense(self.dim, dtype=self.dtype, name="out")
        fuse = MessageFuse(self.dim, self.dtype)

        def heads_of(a):
            return a.reshape(a.shape[0], self.heads, dh)

        qk0 = heads_of(qk(x0))
        qk1 = heads_of(qk(x1))
        v0 = heads_of(val(x0))
        v1 = heads_of(val(x1))
        m0 = out(_attend(qk0, qk1, v1, mask1).reshape(x0.shape[0], self.dim))
        m1 = out(_attend(qk1, qk0, v0, mask0).reshape(x1.shape[0], self.dim))
        return fuse(x0, m0), fuse(x1, m1)


class LightGlue(nn.Module):
    """Returns the [N, M] log partial-assignment matrix (masked entries are
    NEG_INF) plus per-side log-matchability vectors."""

    cfg: LightGlueConfig = LightGlueConfig()

    @nn.compact
    def __call__(self, kpts_ref, desc_ref, mask_ref, kpts_cur, desc_cur,
                 mask_cur, image_hw=None):
        c = self.cfg
        p0 = normalize_keypoints(kpts_ref.astype(jnp.float32), mask_ref,
                                 image_hw)
        p1 = normalize_keypoints(kpts_cur.astype(jnp.float32), mask_cur,
                                 image_hw)
        head_dim = c.model_dim // c.num_heads
        rotary = FourierRotary(head_dim, c.dtype)
        cos0, sin0 = rotary(p0)
        cos1, sin1 = rotary(p1)

        proj = nn.Dense(c.model_dim, dtype=c.dtype, name="input_proj")
        x0 = proj(desc_ref.astype(jnp.float32))
        x1 = proj(desc_cur.astype(jnp.float32))

        for i in range(c.depth):
            su = SelfUnit(c.model_dim, c.num_heads, c.dtype,
                          name=f"self_{i}")
            x0 = su(x0, cos0, sin0, mask_ref)
            x1 = su(x1, cos1, sin1, mask_cur)
            x0, x1 = CrossUnit(c.model_dim, c.num_heads, c.dtype,
                               name=f"cross_{i}")(x0, x1, mask_ref, mask_cur)

        # Assignment head.
        feat = nn.Dense(c.model_dim, dtype=c.dtype, name="final_proj")
        f0 = feat(x0)
        f1 = feat(x1)
        sim = jnp.einsum("nd,md->nm", f0, f1,
                         preferred_element_type=jnp.float32)
        sim = sim / jnp.sqrt(jnp.asarray(c.model_dim, jnp.float32))
        sim = jnp.where(mask_ref[:, None] & mask_cur[None, :], sim, NEG_INF)

        match_logit = nn.Dense(1, dtype=c.dtype, name="matchability")
        logit0 = match_logit(x0)[:, 0]
        logit1 = match_logit(x1)[:, 0]
        z0 = jnp.where(mask_ref, jax.nn.log_sigmoid(logit0), NEG_INF)
        z1 = jnp.where(mask_cur, jax.nn.log_sigmoid(logit1), NEG_INF)

        # Dual-softmax log partial assignment.
        lsm_row = jax.nn.log_softmax(sim, axis=1)
        lsm_col = jax.nn.log_softmax(sim, axis=0)
        scores = lsm_row + lsm_col + z0[:, None] + z1[None, :]
        scores = jnp.where(mask_ref[:, None] & mask_cur[None, :],
                           scores, NEG_INF)
        # Raw matchability logits are returned for the training loss
        # (log(1 - sigma) = log_sigmoid(-logit) for unmatchable points).
        return scores, logit0, logit1


def mutual_argmax_matches(scores, min_score):
    """Reference score-matrix post-processing, vectorized
    (nn_feature_matcher.cpp:176-216): per-row argmax, threshold on the row
    max, keep only if the column's argmax points back. Returns [N] int32
    cur indices (-1 = unmatched). Ties resolve to the first index, same as
    the C++ scan with a strict ``>``."""
    row_best = jnp.argmax(scores, axis=1).astype(jnp.int32)
    row_max = jnp.max(scores, axis=1)
    col_best = jnp.argmax(scores, axis=0).astype(jnp.int32)
    mutual = col_best[row_best] == jnp.arange(scores.shape[0], dtype=jnp.int32)
    ok = (row_max >= min_score) & mutual
    return jnp.where(ok, row_best, -1)


@partial(jax.jit, static_argnames=("max_matches",))
def fused_match_list(scores, min_score, max_matches: int):
    """The "fused matches" output mode (nn_feature_matcher.cpp:158-175):
    [K, 2] int64-style (ref, cur) index pairs sorted by score, padded with
    (-1, -1), plus the match scores."""
    idx = mutual_argmax_matches(scores, min_score)
    n = scores.shape[0]
    safe = jnp.clip(idx, 0, scores.shape[1] - 1)
    sc = jnp.take_along_axis(scores, safe[:, None], axis=1)[:, 0]
    sc = jnp.where(idx >= 0, sc, -jnp.inf)
    order = jnp.argsort(-sc)[:max_matches]
    ref_i = jnp.where(sc[order] > -jnp.inf, order, -1).astype(jnp.int32)
    cur_i = jnp.where(ref_i >= 0, idx[jnp.clip(order, 0, n - 1)], -1)
    pairs = jnp.stack([ref_i, cur_i.astype(jnp.int32)], axis=-1)
    return pairs, jnp.where(ref_i >= 0, sc[order], 0.0)
