"""Neural feature matcher front end (NNFeatureMatcher equivalent).

Mirrors the reference's onnxruntime wrapper surface
(reference: src/nn_feature_matcher/nn_feature_matcher.{h,cpp}):

 - 4 model variants: SuperPoint/DISK descriptors x score-matrix/fused
   output (nn_feature_matcher.h:16-21) — here one native LightGlue with
   the descriptor dim and output mode as config
 - Options kMaxNumberOfMatches=300, kMinValidMatchScore=-3.0
   (nn_feature_matcher.h:23-27)
 - ``initialize()`` performs a warm-up inference with kMaxNumberOfMatches
   zeroed descriptors (nn_feature_matcher.cpp:56-76) — here that is the
   jit warm-up compile
 - ``match()`` post-processing: status starts at LARGE_RESIDUAL,
   matched_pixel_uv_cur starts as a copy of pixel_uv_cur
   (nn_feature_matcher.cpp:155-157); matched entries become TRACKED.

Fixed-capacity arrays + valid masks replace the reference's dynamic
vectors so one compiled program serves every frame.
"""

from __future__ import annotations

import dataclasses
import enum
from functools import partial

import jax
import jax.numpy as jnp

from feature_tracker_tpu.core.status import TrackStatus
from feature_tracker_tpu.models.lightglue import (
    LightGlue,
    LightGlueConfig,
    fused_match_list,
    mutual_argmax_matches,
)


class NNMatcherModelType(enum.Enum):
    LIGHTGLUE_SUPERPOINT_SCORE_MAT = 0
    LIGHTGLUE_SUPERPOINT_MATCHES = 1
    LIGHTGLUE_DISK_SCORE_MAT = 2
    LIGHTGLUE_DISK_MATCHES = 3


_DESC_DIM = {
    NNMatcherModelType.LIGHTGLUE_SUPERPOINT_SCORE_MAT: 256,
    NNMatcherModelType.LIGHTGLUE_SUPERPOINT_MATCHES: 256,
    NNMatcherModelType.LIGHTGLUE_DISK_SCORE_MAT: 128,
    NNMatcherModelType.LIGHTGLUE_DISK_MATCHES: 128,
}

_FUSED = {
    NNMatcherModelType.LIGHTGLUE_SUPERPOINT_MATCHES,
    NNMatcherModelType.LIGHTGLUE_DISK_MATCHES,
}


@dataclasses.dataclass(frozen=True)
class NNMatcherOptions:
    max_number_of_matches: int = 300
    min_valid_match_score: float = -3.0
    model_type: NNMatcherModelType = (
        NNMatcherModelType.LIGHTGLUE_SUPERPOINT_SCORE_MAT)
    depth: int = 9


@partial(jax.jit, static_argnames=("model",))
def _scores_jit(model, variables, ref_uv, ref_desc, mask_ref, cur_uv,
                cur_desc, mask_cur):
    scores, _, _ = model.apply(variables, ref_uv, ref_desc, mask_ref,
                               cur_uv, cur_desc, mask_cur)
    return scores


class NNFeatureMatcher:
    """LightGlue-based matcher with the reference's Match() contract."""

    def __init__(self, options: NNMatcherOptions = NNMatcherOptions(),
                 variables=None, rng=None):
        self.options = options
        self.cfg = LightGlueConfig(
            descriptor_dim=_DESC_DIM[options.model_type],
            depth=options.depth)
        self.model = LightGlue(self.cfg)
        self._variables = variables
        self._rng = rng if rng is not None else jax.random.PRNGKey(0)
        self._initialized = variables is not None

    @property
    def variables(self):
        return self._variables

    @classmethod
    def from_file(cls, options: NNMatcherOptions = NNMatcherOptions(),
                  path=None):
        """Matcher with pretrained LightGlue weights — the variant picks
        the file, mirroring the reference's per-variant ONNX paths
        (nn_feature_matcher.cpp:11-31): SuperPoint descriptors load
        weights/lightglue_superpoint.npz, DISK descriptors
        weights/lightglue_disk.npz (both from train/pretrain.py). None
        when the file is absent or the depth differs from the trained
        architecture."""
        import os

        from feature_tracker_tpu.utils.weights import (
            load_pytree,
            weights_path,
        )
        dim = _DESC_DIM[options.model_type]
        path = path or weights_path(
            "lightglue_superpoint.npz" if dim == 256
            else "lightglue_disk.npz")
        if not os.path.exists(path) or options.depth != 9:
            return None
        m = cls(options)
        n = options.max_number_of_matches
        kpts = jnp.zeros((n, 2), jnp.float32)
        desc = jnp.zeros((n, dim), jnp.float32)
        mask = jnp.ones((n,), bool)
        like = m.model.init(m._rng, kpts, desc, mask, kpts, desc, mask)
        m._variables = load_pytree(path, like)
        m._initialized = True
        return m

    def initialize(self) -> bool:
        """Create (or keep) parameters and run the reference-style warm-up
        inference on kMaxNumberOfMatches zero descriptors
        (nn_feature_matcher.cpp:56-76) — this triggers the jit compile so
        the first real match() is fast."""
        n = self.options.max_number_of_matches
        d = self.cfg.descriptor_dim
        kpts = jnp.zeros((n, 2), jnp.float32)
        desc = jnp.zeros((n, d), jnp.float32)
        mask = jnp.ones((n,), bool)
        if self._variables is None:
            self._variables = self.model.init(self._rng, kpts, desc, mask,
                                              kpts, desc, mask)
        scores = _scores_jit(self.model, self._variables, kpts, desc, mask,
                             kpts, desc, mask)
        scores.block_until_ready()
        self._initialized = True
        return True

    def _require_init(self):
        if not self._initialized:
            self.initialize()

    def scores(self, ref_uv, ref_desc, cur_uv, cur_desc, mask_ref=None,
               mask_cur=None):
        """Raw [N, M] log-assignment matrix (score-matrix model output)."""
        self._require_init()
        ref_uv = jnp.asarray(ref_uv, jnp.float32)
        cur_uv = jnp.asarray(cur_uv, jnp.float32)
        ref_desc = jnp.asarray(ref_desc, jnp.float32)
        cur_desc = jnp.asarray(cur_desc, jnp.float32)
        if mask_ref is None:
            mask_ref = jnp.ones((ref_uv.shape[0],), bool)
        if mask_cur is None:
            mask_cur = jnp.ones((cur_uv.shape[0],), bool)
        return _scores_jit(self.model, self._variables, ref_uv, ref_desc,
                           mask_ref, cur_uv, cur_desc, mask_cur)

    def match(self, ref_desc, cur_desc, ref_uv, cur_uv, mask_ref=None,
              mask_cur=None):
        """Full Match() contract. Returns (matched_uv [N,2], status [N]).

        Argument order follows the reference: descriptors first
        (nn_feature_matcher.cpp:149-152)."""
        scores = self.scores(ref_uv, ref_desc, cur_uv, cur_desc, mask_ref,
                             mask_cur)
        cur_uv = jnp.asarray(cur_uv, jnp.float32)
        n = scores.shape[0]

        if self.options.model_type in _FUSED:
            pairs, _ = fused_match_list(
                scores, self.options.min_valid_match_score,
                self.options.max_number_of_matches)
            # Scatter the fused list back to per-ref-feature indices
            # (nn_feature_matcher.cpp:165-174).
            slot = jnp.where(pairs[:, 0] >= 0, pairs[:, 0], n)
            idx = jnp.full((n + 1,), -1, jnp.int32).at[slot].set(
                pairs[:, 1], mode="drop")[:n]
        else:
            idx = mutual_argmax_matches(
                scores, self.options.min_valid_match_score)

        found = idx >= 0
        safe = jnp.clip(idx, 0, cur_uv.shape[0] - 1)
        # Unmatched entries keep the initial copy of pixel_uv_cur
        # (nn_feature_matcher.cpp:156) when shapes line up, else zeros.
        if cur_uv.shape[0] == n:
            default_uv = cur_uv
        else:
            default_uv = jnp.zeros((n, 2), jnp.float32)
        matched_uv = jnp.where(found[:, None], cur_uv[safe], default_uv)
        status = jnp.where(found, jnp.int8(int(TrackStatus.TRACKED)),
                           jnp.int8(int(TrackStatus.LARGE_RESIDUAL)))
        return matched_uv, status
