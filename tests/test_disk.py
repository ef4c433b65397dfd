"""Tests for the native DISK detector/descriptor."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feature_tracker_tpu.models.disk import (
    Disk,
    DiskConfig,
    DiskDetector,
    sample_descriptors_fullres,
)

CFG = DiskConfig(descriptor_dim=16, base_channels=8, depth=2)


@pytest.fixture(scope="module")
def detector():
    return DiskDetector.init_random(jax.random.PRNGKey(0),
                                    image_shape=(1, 32, 32, 1), cfg=CFG,
                                    max_features=20)


def test_disk_output_shapes():
    model = Disk(CFG)
    x = jnp.zeros((2, 32, 48, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    heat, desc = model.apply(variables, x)
    assert heat.shape == (2, 32, 48)
    assert desc.shape == (2, 32, 48, CFG.descriptor_dim)


def test_detect_handles_non_divisible_sizes(detector):
    # 50x70 is not divisible by 2**depth; internal padding must handle it.
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 255, (50, 70)),
                      jnp.float32)
    uv, desc, num = detector.detect(img)
    assert uv.shape == (20, 2)
    assert desc.shape == (20, CFG.descriptor_dim)
    n = int(num)
    uv = np.asarray(uv)[:n]
    assert (uv[:, 0] < 70).all() and (uv[:, 1] < 50).all()


def test_descriptors_l2_normalized(detector):
    img = jnp.asarray(np.random.default_rng(1).uniform(0, 255, (48, 64)),
                      jnp.float32)
    uv, desc, num = detector.detect(img)
    n = int(num)
    if n:
        norms = np.linalg.norm(np.asarray(desc)[:n], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_min_distance_respected(detector):
    img = jnp.asarray(np.random.default_rng(2).uniform(0, 255, (64, 64)),
                      jnp.float32)
    uv, _, num = detector.detect(img)
    n = int(num)
    uv = np.asarray(uv)[:n]
    if n > 1:
        d = np.sqrt(((uv[:, None] - uv[None, :]) ** 2).sum(-1))
        np.fill_diagonal(d, np.inf)
        assert d.min() >= detector.min_feature_distance


def test_sample_descriptors_fullres_bilinear():
    # Linear field: bilinear sampling is exact.
    h, w, d = 8, 8, 3
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    field = np.stack([xx, yy, np.ones_like(xx)], -1)
    uv = jnp.asarray([[2.5, 3.25], [0.0, 0.0]], jnp.float32)
    out = np.asarray(sample_descriptors_fullres(jnp.asarray(field), uv))
    want0 = np.array([2.5, 3.25, 1.0])
    np.testing.assert_allclose(out[0], want0 / np.linalg.norm(want0),
                               rtol=1e-6)
