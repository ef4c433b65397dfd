"""Tests for the native LightGlue matcher and its NNFeatureMatcher wrapper.

Weights are untrained; correctness here means structural: shapes, masking,
permutation equivariance, exact parity of the mutual-argmax post-processing
with a literal translation of the reference's C++ scan loops
(nn_feature_matcher.cpp:176-216), and fused/score-mode consistency.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feature_tracker_tpu.core.status import TrackStatus
from feature_tracker_tpu.match.nn_matcher import (
    NNFeatureMatcher,
    NNMatcherModelType,
    NNMatcherOptions,
)
from feature_tracker_tpu.models.lightglue import (
    LightGlue,
    LightGlueConfig,
    NEG_INF,
    fused_match_list,
    mutual_argmax_matches,
    normalize_keypoints,
)

CFG = LightGlueConfig(descriptor_dim=32, model_dim=32, num_heads=2, depth=2)


def _random_inputs(n, m, d, seed=0):
    rng = np.random.default_rng(seed)
    k0 = rng.uniform(0, 640, (n, 2)).astype(np.float32)
    k1 = rng.uniform(0, 640, (m, 2)).astype(np.float32)
    d0 = rng.normal(0, 1, (n, d)).astype(np.float32)
    d1 = rng.normal(0, 1, (m, d)).astype(np.float32)
    return jnp.asarray(k0), jnp.asarray(d0), jnp.asarray(k1), jnp.asarray(d1)


@pytest.fixture(scope="module")
def model_and_vars():
    model = LightGlue(CFG)
    k0, d0, k1, d1 = _random_inputs(12, 10, CFG.descriptor_dim)
    m0 = jnp.ones((12,), bool)
    m1 = jnp.ones((10,), bool)
    variables = model.init(jax.random.PRNGKey(0), k0, d0, m0, k1, d1, m1)
    return model, variables


def test_scores_shape_and_mask(model_and_vars):
    model, variables = model_and_vars
    k0, d0, k1, d1 = _random_inputs(12, 10, CFG.descriptor_dim)
    m0 = jnp.arange(12) < 8
    m1 = jnp.arange(10) < 7
    scores, z0, z1 = model.apply(variables, k0, d0, m0, k1, d1, m1)
    assert scores.shape == (12, 10)
    s = np.asarray(scores)
    # Masked rows/cols are NEG_INF; valid block is finite and <= 0 (log P).
    assert (s[8:, :] <= NEG_INF / 2).all()
    assert (s[:, 7:] <= NEG_INF / 2).all()
    assert np.isfinite(s[:8, :7]).all()
    assert (s[:8, :7] <= 1e-4).all()


def test_permutation_equivariance(model_and_vars):
    model, variables = model_and_vars
    k0, d0, k1, d1 = _random_inputs(9, 11, CFG.descriptor_dim, seed=3)
    m0 = jnp.ones((9,), bool)
    m1 = jnp.ones((11,), bool)
    s, _, _ = model.apply(variables, k0, d0, m0, k1, d1, m1)
    perm = np.random.default_rng(0).permutation(11)
    s_p, _, _ = model.apply(variables, k0, d0, m0, k1[perm], d1[perm], m1)
    np.testing.assert_allclose(np.asarray(s)[:, perm], np.asarray(s_p),
                               rtol=2e-4, atol=2e-5)


def test_normalize_keypoints_bbox_fallback():
    k = jnp.array([[0.0, 0.0], [100.0, 50.0], [50.0, 25.0]])
    mask = jnp.ones((3,), bool)
    out = np.asarray(normalize_keypoints(k, mask))
    assert out.min() >= -1.0 - 1e-6 and out.max() <= 1.0 + 1e-6
    # With image size: center/scale by the image, not the bbox.
    out2 = np.asarray(normalize_keypoints(k, mask, image_hw=(100, 200)))
    np.testing.assert_allclose(out2[0], [-1.0, -0.5])


def _reference_mutual_argmax(scores, min_score):
    """Literal translation of nn_feature_matcher.cpp:188-216."""
    n, m = scores.shape
    col_best = [int(np.argmax(scores[:, j])) for j in range(m)]
    idx = np.full(n, -1, np.int32)
    for i in range(n):
        j = int(np.argmax(scores[i]))
        if scores[i, j] < min_score:
            continue
        if col_best[j] != i:
            continue
        idx[i] = j
    return idx


def test_mutual_argmax_matches_reference_parity():
    rng = np.random.default_rng(1)
    scores = rng.normal(-2.0, 1.5, (40, 37)).astype(np.float32)
    got = np.asarray(mutual_argmax_matches(jnp.asarray(scores), -3.0))
    want = _reference_mutual_argmax(scores, -3.0)
    np.testing.assert_array_equal(got, want)


def test_fused_match_list_consistent_with_score_mode():
    rng = np.random.default_rng(2)
    scores = rng.normal(-2.0, 1.0, (25, 30)).astype(np.float32)
    idx = np.asarray(mutual_argmax_matches(jnp.asarray(scores), -3.0))
    pairs, sc = fused_match_list(jnp.asarray(scores), -3.0, 300)
    pairs = np.asarray(pairs)
    got = {(int(a), int(b)) for a, b in pairs if a >= 0}
    want = {(i, int(j)) for i, j in enumerate(idx) if j >= 0}
    assert got == want
    # Sorted by descending score.
    valid_scores = np.asarray(sc)[pairs[:, 0] >= 0]
    assert (np.diff(valid_scores) <= 1e-6).all()


def test_fused_match_list_respects_capacity():
    # Identity-dominant score matrix: every feature matches itself.
    scores = jnp.asarray(np.eye(20, dtype=np.float32) * 5.0 - 4.0)
    pairs, _ = fused_match_list(scores, -10.0, 8)
    pairs = np.asarray(pairs)
    assert pairs.shape == (8, 2)
    assert (pairs[:, 0] >= 0).sum() == 8


def test_nn_feature_matcher_end_to_end():
    opts = NNMatcherOptions(
        max_number_of_matches=16, depth=2,
        model_type=NNMatcherModelType.LIGHTGLUE_SUPERPOINT_SCORE_MAT)
    matcher = NNFeatureMatcher(opts)
    # Shrink to the test config for speed.
    matcher.cfg = CFG
    matcher.model = LightGlue(CFG)
    matcher._variables = None
    assert matcher.initialize()

    k0, d0, k1, d1 = _random_inputs(16, 16, CFG.descriptor_dim, seed=5)
    # Make matching easy: identical descriptors, threshold very low.
    matcher.options = NNMatcherOptions(
        max_number_of_matches=16, min_valid_match_score=-1e8, depth=2)
    matched_uv, status = matcher.match(d0, d0, k0, k0)
    status = np.asarray(status)
    assert status.shape == (16,)
    assert set(np.unique(status)) <= {int(TrackStatus.TRACKED),
                                      int(TrackStatus.LARGE_RESIDUAL)}
    # Identical inputs with mutual argmax: each feature matches itself.
    tracked = status == int(TrackStatus.TRACKED)
    np.testing.assert_allclose(np.asarray(matched_uv)[tracked],
                               np.asarray(k0)[tracked])
    assert tracked.sum() >= 12  # allow a couple of symmetric ties


def test_nn_feature_matcher_fused_mode_matches_score_mode():
    k0, d0, k1, d1 = _random_inputs(14, 14, CFG.descriptor_dim, seed=6)
    base = NNFeatureMatcher(NNMatcherOptions(max_number_of_matches=14,
                                             depth=2))
    base.cfg = CFG
    base.model = LightGlue(CFG)
    base._variables = None
    base.initialize()

    fused = NNFeatureMatcher(
        NNMatcherOptions(max_number_of_matches=14, depth=2,
                         model_type=NNMatcherModelType
                         .LIGHTGLUE_SUPERPOINT_MATCHES),
        variables=base.variables)
    fused.cfg = CFG
    fused.model = LightGlue(CFG)

    uv_a, st_a = base.match(d0, d1, k0, k1)
    uv_b, st_b = fused.match(d0, d1, k0, k1)
    np.testing.assert_array_equal(np.asarray(st_a), np.asarray(st_b))
    np.testing.assert_allclose(np.asarray(uv_a), np.asarray(uv_b))
