"""Parity tests for the Pallas affine/LSSD fast-KLT kernels (interpret
mode on CPU vs the jnp reference-semantics path)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from feature_tracker_tpu.core.config import KltOptions
from feature_tracker_tpu.core.status import TrackStatus
from feature_tracker_tpu.ops.pallas_warp_klt import (
    affine_track_level_pallas,
    lssd_track_level_pallas,
)
from feature_tracker_tpu.trackers.klt import affine as _affine
from feature_tracker_tpu.trackers.klt import lssd as _lssd

from synthetic import translated_pair


def _inputs(n=48, h=120, w=160, seed=0):
    ref, cur = translated_pair(h=h, w=w, shift=(2.0, -1.5))
    rng = np.random.default_rng(seed)
    uv = np.stack([rng.uniform(10, w - 10, n),
                   rng.uniform(10, h - 10, n)], -1).astype(np.float32)
    eye = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32), (n, 2, 2))
    return (jnp.asarray(ref), jnp.asarray(cur), jnp.asarray(uv), eye,
            jnp.zeros((n,), jnp.int8))


def test_affine_kernel_matches_jnp():
    ref, cur, uv, eye, st0 = _inputs()
    opts = KltOptions()
    fn = jax.vmap(functools.partial(_affine._fast_one, opts, ref, cur))
    uv_a, aff_a, st_a = fn(uv, uv, eye, st0)
    uv_b, aff_b, st_b = affine_track_level_pallas(opts, ref, cur, uv, uv,
                                                  eye, interpret=True)
    np.testing.assert_array_equal(np.asarray(st_a), np.asarray(st_b))
    both = np.asarray(st_a) == int(TrackStatus.TRACKED)
    assert both.sum() > 30
    np.testing.assert_allclose(np.asarray(uv_a)[both],
                               np.asarray(uv_b)[both], atol=5e-3)
    np.testing.assert_allclose(np.asarray(aff_a)[both],
                               np.asarray(aff_b)[both], atol=5e-3)


def test_lssd_kernel_matches_jnp_both_luminance_modes():
    ref, cur, uv, eye, st0 = _inputs(seed=2)
    opts = KltOptions()
    t0 = uv * 0.0
    for lum in (False, True):
        fn = jax.vmap(functools.partial(_lssd._fast_one, opts, lum, ref,
                                        cur))
        r_a, t_a, st_a = fn(uv, eye, t0, st0)
        r_b, t_b, st_b = lssd_track_level_pallas(opts, lum, ref, cur, uv,
                                                 eye, t0, interpret=True)
        np.testing.assert_array_equal(np.asarray(st_a), np.asarray(st_b))
        both = np.asarray(st_a) == int(TrackStatus.TRACKED)
        assert both.sum() > 20
        np.testing.assert_allclose(np.asarray(t_a)[both],
                                   np.asarray(t_b)[both], atol=5e-3)
        np.testing.assert_allclose(np.asarray(r_a)[both],
                                   np.asarray(r_b)[both], atol=1e-4)


def test_affine_kernel_off_image_is_outside():
    ref, cur, uv, eye, st0 = _inputs(n=3)
    opts = KltOptions()
    bad_uv = jnp.asarray([[-40.0, -40.0], [500.0, 20.0], [80.0, 60.0]],
                         jnp.float32)
    eye3 = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32), (3, 2, 2))
    uv_out, _, st = affine_track_level_pallas(opts, ref, cur, bad_uv,
                                              bad_uv, eye3, interpret=True)
    st = np.asarray(st)
    assert st[0] == int(TrackStatus.OUTSIDE)
    assert st[1] == int(TrackStatus.OUTSIDE)
    assert st[2] == int(TrackStatus.TRACKED)
