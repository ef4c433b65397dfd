import numpy as np
import pytest

import jax.numpy as jnp

from feature_tracker_tpu.core.config import KltMethod, KltOptions
from feature_tracker_tpu.core.status import TrackStatus
from feature_tracker_tpu.ops.pyramid import build_pyramid
from feature_tracker_tpu.trackers.klt import AffineKlt, BasicKlt, LssdKlt

from tests.synthetic import grid_features, se2_pair, translated_pair


def _track_err(cur_uv, ref_uv, true_shift):
    pred = np.asarray(cur_uv) - np.asarray(ref_uv)
    return np.linalg.norm(pred - np.asarray(true_shift), axis=-1)


@pytest.mark.parametrize("method", [KltMethod.FAST, KltMethod.INVERSE,
                                    KltMethod.DIRECT])
def test_basic_single_level_subpixel(method):
    shift = (2.3, -1.7)
    ref, cur = translated_pair(shift=shift)
    uv = grid_features(*ref.shape)
    tracker = BasicKlt(KltOptions(method=method))
    cur_uv, status = tracker.track_single_level(jnp.asarray(ref),
                                                jnp.asarray(cur), uv)
    status = np.asarray(status)
    tracked = status == int(TrackStatus.TRACKED)
    assert tracked.mean() > 0.9
    err = _track_err(cur_uv, uv, shift)[tracked]
    assert np.median(err) < 0.15


def test_basic_pyramid_large_shift():
    shift = (10.4, 6.2)
    ref, cur = translated_pair(shift=shift)
    uv = grid_features(*ref.shape)
    ref_pyr = build_pyramid(jnp.asarray(ref), 3)
    cur_pyr = build_pyramid(jnp.asarray(cur), 3)
    tracker = BasicKlt()
    cur_uv, status = tracker.track(ref_pyr, cur_pyr, uv)
    status = np.asarray(status)
    tracked = status == int(TrackStatus.TRACKED)
    assert tracked.mean() > 0.8
    err = _track_err(cur_uv, uv, shift)[tracked]
    assert np.median(err) < 0.25


@pytest.mark.parametrize("cls,tol", [(AffineKlt, 0.3), (LssdKlt, 0.5)])
def test_affine_lssd_translation(cls, tol):
    # LSSD's convergence step includes the angle term, so it stops a little
    # farther from the optimum than basic/affine on pure translation.
    shift = (3.1, -2.4)
    ref, cur = translated_pair(shift=shift)
    uv = grid_features(*ref.shape)
    ref_pyr = build_pyramid(jnp.asarray(ref), 3)
    cur_pyr = build_pyramid(jnp.asarray(cur), 3)
    cur_uv, status = cls().track(ref_pyr, cur_pyr, uv)
    status = np.asarray(status)
    tracked = status == int(TrackStatus.TRACKED)
    assert tracked.mean() > 0.6
    err = _track_err(cur_uv, uv, shift)[tracked]
    assert np.median(err) < tol


def test_lssd_rotation():
    ref, cur, rot, t = se2_pair(theta=0.04)
    uv = grid_features(*ref.shape, margin=60, step=30)
    ref_pyr = build_pyramid(jnp.asarray(ref), 3)
    cur_pyr = build_pyramid(jnp.asarray(cur), 3)
    cur_uv, status = LssdKlt().track(ref_pyr, cur_pyr, uv)
    status = np.asarray(status)
    tracked = status == int(TrackStatus.TRACKED)
    assert tracked.mean() > 0.5
    truth = uv @ rot.T + t
    err = np.linalg.norm(np.asarray(cur_uv) - truth, axis=-1)[tracked]
    assert np.median(err) < 0.5


def test_status_codes():
    ref, cur = translated_pair()
    h, w = ref.shape
    flat = np.zeros_like(ref)
    # Feature near the border -> patch empty -> OUTSIDE.
    uv = np.array([[2.0, 2.0], [w / 2, h / 2]], np.float32)
    tracker = BasicKlt()
    _, status = tracker.track_single_level(jnp.asarray(flat),
                                           jnp.asarray(flat), uv)
    status = np.asarray(status)
    # Flat image: zero hessian -> singular solve -> NUMERIC_ERROR.
    assert status[1] == int(TrackStatus.NUMERIC_ERROR)


def test_failed_features_not_retracked():
    ref, cur = translated_pair()
    uv = grid_features(*ref.shape)
    status0 = np.zeros(len(uv), np.int8)
    status0[0] = int(TrackStatus.OUTSIDE)
    prior_uv = uv.copy()
    prior_uv[0] = (99.0, 99.0)
    tracker = BasicKlt()
    cur_uv, status = tracker.track_single_level(
        jnp.asarray(ref), jnp.asarray(cur), uv, cur_uv=prior_uv,
        status=status0)
    assert np.asarray(status)[0] == int(TrackStatus.OUTSIDE)
    np.testing.assert_allclose(np.asarray(cur_uv)[0], (99.0, 99.0))


def test_max_track_points_limit():
    ref, cur = translated_pair()
    uv = grid_features(*ref.shape)
    n_limit = 3
    tracker = BasicKlt(KltOptions(max_track_points=n_limit))
    cur_uv, status = tracker.track_single_level(jnp.asarray(ref),
                                                jnp.asarray(cur), uv)
    status = np.asarray(status)
    assert np.all(status[n_limit:] == int(TrackStatus.NOT_TRACKED))
    np.testing.assert_allclose(np.asarray(cur_uv)[n_limit:], uv[n_limit:])
    assert np.all(status[:n_limit] == int(TrackStatus.TRACKED))


@pytest.mark.parametrize("cls", [BasicKlt, AffineKlt, LssdKlt])
def test_track_stream_matches_chained_pairs(cls):
    """track_stream (T-1 pairs in one scanned program) must equal
    sequentially chaining track() per pair with carried uv/status."""
    from tests.synthetic import Texture

    tex = Texture(0)
    h, w = 120, 160
    shifts = [(0.0, 0.0), (1.5, -1.0), (3.0, -2.0), (4.5, -3.0)]
    frames = np.stack([
        tex.render(h, w, warp=lambda x, y, d=d: (x - d[0], y - d[1]))
        for d in shifts]).astype(np.float32)
    uv0 = grid_features(h, w, margin=20, step=30)
    tracker = cls()
    levels = 3

    uvs, sts = tracker.track_stream(frames, uv0, levels=levels)
    assert uvs.shape == (3, len(uv0), 2) and sts.shape == (3, len(uv0))

    uv, st = jnp.asarray(uv0), None
    for t in range(3):
        rp = build_pyramid(jnp.asarray(frames[t]), levels)
        cp = build_pyramid(jnp.asarray(frames[t + 1]), levels)
        uv, st = tracker.track(rp, cp, uv, cur_uv=uv, status=st)
        np.testing.assert_array_equal(np.asarray(sts[t]), np.asarray(st))
        np.testing.assert_allclose(np.asarray(uvs[t]), np.asarray(uv),
                                   atol=1e-5)

    # The last pair's survivors actually tracked the cumulative motion.
    st_f = np.asarray(sts[-1])
    assert (st_f == int(TrackStatus.TRACKED)).sum() >= len(uv0) * 2 // 3
    moved = np.asarray(uvs[-1]) - uv0
    ok = st_f == int(TrackStatus.TRACKED)
    np.testing.assert_allclose(moved[ok], np.tile((4.5, -3.0), (ok.sum(), 1)),
                               atol=0.2)


def test_track_pairs_matches_per_pair_calls():
    """The composite multi-pair launch reproduces per-pair tracking for
    interior features (same arithmetic on identical neighborhoods)."""
    from feature_tracker_tpu.trackers.klt.multi import track_pairs
    from tests.synthetic import translated_pair

    # Exact parity needs features >= (patch_half+2)*2^(levels-1) = 32 px
    # inside their image (multi.py docstring).
    k, h, w, n = 2, 96, 128, 12
    pyrs_r, pyrs_c, uvs = [], [], []
    rng = np.random.default_rng(0)
    for i in range(k):
        ref, cur = translated_pair(h=h, w=w, shift=(2.0 + i, -1.5), seed=i)
        pyrs_r.append(build_pyramid(jnp.asarray(ref), 3))
        pyrs_c.append(build_pyramid(jnp.asarray(cur), 3))
        uvs.append(np.stack([rng.uniform(36, w - 36, n),
                             rng.uniform(36, h - 36, n)],
                            -1).astype(np.float32))
    uv = np.stack(uvs)
    tracker = BasicKlt(KltOptions(max_track_points=k * n))
    import pytest as _pytest
    with _pytest.raises(ValueError, match="coarsest"):
        track_pairs(tracker, pyrs_r, pyrs_c, uv, gap=16)
    cuv, st = track_pairs(tracker, pyrs_r, pyrs_c, uv, gap=64)
    assert cuv.shape == (k, n, 2) and st.shape == (k, n)
    single = BasicKlt(KltOptions(max_track_points=n))
    for i in range(k):
        suv, sst = single.track(pyrs_r[i], pyrs_c[i], uv[i])
        np.testing.assert_array_equal(np.asarray(sst), np.asarray(st[i]))
        both = np.asarray(sst) == 1
        np.testing.assert_allclose(np.asarray(suv)[both],
                                   np.asarray(cuv[i])[both], atol=1e-4)
        assert both.sum() >= n - 2
