import numpy as np

import jax.numpy as jnp

from feature_tracker_tpu.core.status import TrackStatus
from feature_tracker_tpu.match import (
    compute_brief,
    cosine_distance_matrix,
    fill_matched_pixels,
    force_match,
    hamming_distance_matrix,
    nearby_match,
)

from tests.synthetic import Texture, grid_features, translated_pair


def test_hamming_matrix_exact():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 2, (5, 256)).astype(np.uint8)
    b = rng.integers(0, 2, (7, 256)).astype(np.uint8)
    d = np.asarray(hamming_distance_matrix(jnp.asarray(a), jnp.asarray(b)))
    expect = (a[:, None, :] != b[None, :, :]).sum(-1)
    np.testing.assert_array_equal(d, expect)


def test_cosine_distance_range():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(4, 64)).astype(np.float32)
    d = np.asarray(cosine_distance_matrix(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(np.diag(d), 0.0, atol=1e-5)
    assert (d >= -1e-5).all() and (d <= 1.0 + 1e-5).all()


def test_force_match_threshold_and_ties():
    dist = jnp.asarray([[5.0, 3.0, 3.0],   # tie -> lowest index (1)
                        [9.0, 9.0, 9.0],   # nothing below threshold
                        [0.0, 2.0, 1.0]])
    idx = np.asarray(force_match(dist, 6.0))
    np.testing.assert_array_equal(idx, [1, -1, 0])


def test_nearby_match_gate():
    dist = jnp.full((1, 2), 1.0)
    pred = jnp.asarray([[50.0, 50.0]])
    cur = jnp.asarray([[50.0, 95.0],    # dy=45 > 40 -> gated out
                       [80.0, 60.0]])   # inside the 40x40 box
    idx = np.asarray(nearby_match(dist, pred, cur, 2.0, 40, 40))
    np.testing.assert_array_equal(idx, [1])


def test_fill_matched_pixels_statuses():
    idx = jnp.asarray([1, -1, 0], jnp.int32)
    cur_uv = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
    status0 = jnp.asarray([0, 0, int(TrackStatus.OUTSIDE)], jnp.int8)
    uv, st = fill_matched_pixels(idx, cur_uv, status0)
    np.testing.assert_array_equal(np.asarray(st),
                                  [int(TrackStatus.TRACKED),
                                   int(TrackStatus.LARGE_RESIDUAL),
                                   int(TrackStatus.OUTSIDE)])
    np.testing.assert_allclose(np.asarray(uv),
                               [[3.0, 4.0], [0.0, 0.0], [0.0, 0.0]])


def test_brief_end_to_end_matching():
    shift = (7.0, -4.0)
    ref, cur = translated_pair(h=240, w=320, shift=shift, seed=9)
    ref_uv = grid_features(240, 320)
    cur_uv_truth = ref_uv + np.asarray(shift, np.float32)

    bits_ref, valid_ref = compute_brief(jnp.asarray(ref), jnp.asarray(ref_uv))
    bits_cur, valid_cur = compute_brief(jnp.asarray(cur),
                                        jnp.asarray(cur_uv_truth))
    assert np.asarray(valid_ref).all() and np.asarray(valid_cur).all()

    dist = hamming_distance_matrix(bits_ref, bits_cur)
    idx = np.asarray(nearby_match(dist, jnp.asarray(ref_uv),
                                  jnp.asarray(cur_uv_truth), 60.0, 40, 40))
    # Every ref feature should match its own shifted copy.
    correct = (idx == np.arange(len(ref_uv))).mean()
    assert correct > 0.9


def test_brief_border_invalid():
    tex = Texture(2)
    img = jnp.asarray(tex.render(64, 64))
    uv = jnp.asarray([[2.0, 2.0], [32.0, 32.0]], jnp.float32)
    bits, valid = compute_brief(img, uv)
    np.testing.assert_array_equal(np.asarray(valid), [False, True])
    assert np.asarray(bits)[0].sum() == 0
