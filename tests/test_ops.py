import numpy as np

import jax.numpy as jnp

from feature_tracker_tpu.core.config import HarrisOptions
from feature_tracker_tpu.ops.detect import detect_good_features
from feature_tracker_tpu.ops.interp import (
    bilinear_sample,
    extract_const_weight_patch,
)
from feature_tracker_tpu.ops.pyramid import build_pyramid

from tests.synthetic import Texture


def test_bilinear_sample_exact_on_bilinear_function():
    # A bilinear function is reproduced exactly by bilinear interpolation.
    h, w = 32, 48
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = jnp.asarray(3.0 + 0.5 * xx + 0.25 * yy + 0.01 * xx * yy)
    pos = jnp.asarray([[5.3, 7.8], [0.0, 0.0], [46.0, 30.0]], jnp.float32)
    val, valid = bilinear_sample(img, pos)
    expect = 3.0 + 0.5 * pos[:, 0] + 0.25 * pos[:, 1] + 0.01 * pos[:, 0] * pos[:, 1]
    assert np.all(np.asarray(valid))
    np.testing.assert_allclose(np.asarray(val), np.asarray(expect), rtol=1e-5)


def test_bilinear_sample_bounds():
    img = jnp.zeros((16, 16))
    pos = jnp.asarray([[-0.1, 5.0], [5.0, -0.1], [14.5, 5.0], [15.1, 5.0],
                       [14.0, 14.0]], jnp.float32)
    _, valid = bilinear_sample(img, pos)
    # Valid range for the floor anchor is [0, dim-2] (reference convention):
    # floor(14.5)=14 is still valid in a 16-wide image, floor(15.1)=15 not.
    np.testing.assert_array_equal(np.asarray(valid),
                                  [False, False, True, False, True])


def test_extract_patch_matches_scalar_sampling():
    tex = Texture(3)
    img = jnp.asarray(tex.render(64, 64))
    uv = jnp.asarray([20.4, 17.8], jnp.float32)
    patch, valid = extract_const_weight_patch(img, uv, 5, 5)
    assert np.all(np.asarray(valid))
    # Center pixel equals a direct bilinear sample at uv's anchor cell.
    val, _ = bilinear_sample(img, uv)
    np.testing.assert_allclose(np.asarray(patch)[2, 2], np.asarray(val),
                               rtol=1e-5)


def test_extract_patch_border_validity():
    img = jnp.zeros((32, 32))
    patch, valid = extract_const_weight_patch(
        img, jnp.asarray([1.0, 1.0], jnp.float32), 7, 7)
    v = np.asarray(valid)
    # Anchor = (1,1) - 3 = (-2,-2): first two rows/cols invalid.
    assert not v[:2].any()
    assert not v[:, :2].any()
    assert v[2:, 2:].all()


def test_pyramid_shapes_and_quantization():
    img = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (64, 96)).astype(np.float32))
    pyr = build_pyramid(img, 3)
    assert [p.shape for p in pyr] == [(64, 96), (32, 48), (16, 24)]
    for p in pyr[1:]:
        arr = np.asarray(p)
        np.testing.assert_array_equal(arr, np.floor(arr))


def test_detector_min_distance_and_count():
    tex = Texture(7)
    img = jnp.asarray(tex.render(240, 320))
    opts = HarrisOptions(min_feature_distance=20, min_valid_response=1.0)
    uv, num = detect_good_features(img, 100, opts)
    uv = np.asarray(uv)
    num = int(num)
    assert num > 20
    pts = uv[:num]
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    d[np.arange(len(pts)), np.arange(len(pts))] = np.inf
    assert d.min() >= 20.0
    # Padding slots are marked (-1, -1).
    assert np.all(uv[num:] == -1.0)


def test_greedy_suppression_matches_sequential_scan():
    """The chunked chaotic-iteration NMS must equal the sequential greedy
    scan exactly, over randomized geometry and chunk boundaries."""
    import numpy as np

    from feature_tracker_tpu.ops.detect import greedy_suppression

    rng = np.random.default_rng(0)
    for trial in range(25):
        k = int(rng.integers(5, 400))
        pts = rng.uniform(0, 60, (k, 2))
        valid = rng.random(k) > 0.1
        d2 = ((pts[:, None] - pts[None, :]) ** 2).sum(-1)
        conflict = d2 < rng.uniform(2, 30) ** 2
        want = np.zeros(k, bool)
        for i in range(k):
            want[i] = valid[i] and not np.any(want[:i] & conflict[i, :i])
        got = np.asarray(greedy_suppression(jnp.asarray(valid),
                                            jnp.asarray(conflict),
                                            chunk=64))
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")


def test_pyramid_quantize_warns_on_normalized_input():
    """quantize=True floor-truncation destroys [0,1] imagery — a concrete
    normalized-float input must warn and point to quantize=False."""
    import warnings

    rng = np.random.default_rng(0)
    img01 = rng.uniform(0, 1, (32, 32)).astype(np.float32)
    img255 = np.floor(img01 * 255).astype(np.float32)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        build_pyramid(img01, 3)
        assert len(rec) == 1 and "quantize=False" in str(rec[0].message)
        build_pyramid(img255, 3)          # integer gray values: silent
        build_pyramid(img01, 3, quantize=False)  # explicit opt-out: silent
        assert len(rec) == 1
