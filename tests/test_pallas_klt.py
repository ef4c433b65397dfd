"""Parity tests for the Pallas fast-KLT level kernel.

On CPU the kernel runs in Pallas interpret mode (slow but exact), compared
element-for-element against the jnp window-slice path that the rest of the
suite validates against the reference semantics.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from feature_tracker_tpu.core.config import KltMethod, KltOptions
from feature_tracker_tpu.core.status import TrackStatus
from feature_tracker_tpu.ops.pallas_klt import track_level_fast_pallas
from feature_tracker_tpu.trackers.klt.basic import track_level

from synthetic import translated_pair


def _compare(h, w, shift, n, seed=0, margin=5.0):
    ref, cur = translated_pair(h=h, w=w, shift=shift)
    ref, cur = jnp.asarray(ref), jnp.asarray(cur)
    rng = np.random.default_rng(seed)
    uv = np.stack([rng.uniform(margin, w - margin, n),
                   rng.uniform(margin, h - margin, n)], -1).astype(np.float32)
    opts = KltOptions(max_track_points=n)
    st0 = jnp.zeros(n, jnp.int8)
    uv_a, st_a = track_level(opts, ref, cur, jnp.asarray(uv),
                             jnp.asarray(uv), st0)
    uv_b, st_b = track_level_fast_pallas(opts, ref, cur, jnp.asarray(uv),
                                         jnp.asarray(uv), interpret=True)
    return (np.asarray(uv_a), np.asarray(st_a),
            np.asarray(uv_b), np.asarray(st_b))


def test_pallas_klt_matches_jnp_path():
    uv_a, st_a, uv_b, st_b = _compare(120, 160, (2.5, -1.5), 64)
    np.testing.assert_array_equal(st_a, st_b)
    np.testing.assert_allclose(uv_a, uv_b, atol=1e-3)
    assert (st_a == int(TrackStatus.TRACKED)).sum() > 48


def test_pallas_klt_border_features_match():
    # Features hugging the border exercise the clipped aligned loads and
    # the analytic validity masking.
    uv_a, st_a, uv_b, st_b = _compare(64, 96, (1.0, 1.0), 48, seed=3,
                                      margin=1.0)
    np.testing.assert_array_equal(st_a, st_b)
    np.testing.assert_allclose(uv_a, uv_b, atol=1e-3)


def test_pallas_klt_off_image_features():
    ref, cur = translated_pair(h=64, w=96, shift=(1.0, 0.0))
    uv = jnp.asarray([[-30.0, -30.0], [200.0, 20.0], [48.0, 32.0]],
                     jnp.float32)
    opts = KltOptions()
    uv_out, st = track_level_fast_pallas(opts, jnp.asarray(ref),
                                         jnp.asarray(cur), uv, uv,
                                         interpret=True)
    st = np.asarray(st)
    assert st[0] == int(TrackStatus.OUTSIDE)
    assert st[1] == int(TrackStatus.OUTSIDE)
    assert st[2] == int(TrackStatus.TRACKED)
    # Off-image features keep their input position.
    np.testing.assert_allclose(np.asarray(uv_out)[:2], np.asarray(uv)[:2])


def test_pallas_pyramid_kernel_matches_jnp_pyramid():
    """The fused whole-pyramid kernel must reproduce the level-by-level
    jnp pyramid driver (scaling, per-level status rewrite, coordinate
    doubling)."""
    from feature_tracker_tpu.ops.pallas_klt import track_pyramid_fast_pallas
    from feature_tracker_tpu.ops.pyramid import build_pyramid
    from feature_tracker_tpu.trackers.klt import BasicKlt

    ref, cur = translated_pair(h=120, w=160, shift=(3.0, -2.0))
    rp = build_pyramid(jnp.asarray(ref), 3)
    cp = build_pyramid(jnp.asarray(cur), 3)
    rng = np.random.default_rng(1)
    n = 64
    uv = jnp.asarray(np.stack([rng.uniform(8, 152, n),
                               rng.uniform(8, 112, n)], -1), jnp.float32)

    tracker = BasicKlt(KltOptions(max_track_points=n))
    want_uv, want_st = tracker.track(rp, cp, uv)
    got_uv, got_st = track_pyramid_fast_pallas(KltOptions(max_track_points=n),
                                               rp, cp, uv, uv,
                                               interpret=True)
    # The wrapper applies the final outside check on top of the kernel.
    from feature_tracker_tpu.trackers.klt.engine import final_outside_check
    got_st = final_outside_check(got_uv, got_st, cp[0].shape)
    np.testing.assert_array_equal(np.asarray(want_st), np.asarray(got_st))
    np.testing.assert_allclose(np.asarray(want_uv), np.asarray(got_uv),
                               atol=1e-3)


def test_split_bf16_dot_error_bound():
    """The compiled path's 3-pass split-bf16 product must stay within
    ~1e-2 gray levels of exact f32 on 0..255 imagery-scale operands —
    two orders tighter than single-pass bf16 (which breaks the KLT
    convergence threshold)."""
    from feature_tracker_tpu.ops.pallas_klt import _xdot

    rng = np.random.default_rng(0)
    win = jnp.asarray(rng.uniform(0, 255, (24, 256)), jnp.float32)
    cw = jnp.zeros((15, 256), jnp.float32)
    # Hat-weight-like rows: two adjacent taps summing to 1.
    cols = rng.integers(0, 255, 15)
    fr = rng.uniform(0, 1, 15)
    cw = cw.at[np.arange(15), cols].set(1 - fr).at[
        np.arange(15), cols + 1].set(fr)

    exact = _xdot(win, cw, ((1,), (1,)), precise=True)
    split = _xdot(win, cw, ((1,), (1,)), precise=False)
    err = np.abs(np.asarray(exact) - np.asarray(split)).max()
    assert err < 1e-2, err
    naive = jnp.dot(win.astype(jnp.bfloat16),
                    cw.astype(jnp.bfloat16).T,
                    preferred_element_type=jnp.float32)
    naive_err = np.abs(np.asarray(exact) - np.asarray(naive)).max()
    assert err < naive_err / 5  # materially tighter than 1-pass bf16


def test_a_exact_split_bitwise_equals_3pass_on_integer_window():
    """The 2-pass ``a_exact`` branch drops the window's lo split term.
    On an INTEGER-valued window (|x| <= 255, exact in bf16) that term is
    identically zero, so the 2-pass product must be bitwise identical to
    the 3-pass split — this is the compiled-only invariant the
    interpret-mode parity tests (precise=True) can never exercise."""
    from feature_tracker_tpu.ops.pallas_klt import _xdot

    rng = np.random.default_rng(1)
    win = jnp.asarray(rng.integers(0, 256, (24, 256)), jnp.float32)
    cw = jnp.asarray(rng.uniform(0, 1, (15, 256)), jnp.float32)
    full = _xdot(win, cw, ((1,), (1,)), precise=False)
    two = _xdot(win, cw, ((1,), (1,)), precise=False, a_exact=True)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(two))

    # Counter-check: on NON-integer imagery the dropped pass is NOT zero
    # and the 2-pass product drifts past the ~0.3-gray level the kernel
    # notes call convergence-breaking — the reason a_exact is gated on
    # KltOptions.integer_pyramid.
    win_f = win + jnp.asarray(rng.uniform(0.001, 0.999, win.shape),
                              jnp.float32)
    exact = _xdot(win_f, cw, ((1,), (1,)), precise=True)
    two_f = _xdot(win_f, cw, ((1,), (1,)), precise=False, a_exact=True)
    err = np.abs(np.asarray(exact) - np.asarray(two_f)).max()
    assert err > 0.05, err  # materially worse than the 3-pass bound


def test_b_exact_split_error_bound_on_extraction_matrices():
    """``b_exact`` with 0/+-1 extraction matrices (exact in bf16): the
    2-pass product must match HIGHEST within the 3-pass split bound on
    imagery-scale float operands."""
    from feature_tracker_tpu.ops.pallas_klt import _xdot
    from feature_tracker_tpu.ops.pallas_warp_klt import make_ref_extractors

    rng = np.random.default_rng(2)
    opts = KltOptions()
    sel, sdx, sdy = make_ref_extractors(opts)
    ex_flat = jnp.asarray(
        rng.uniform(0, 255, (1, sel.shape[0])), jnp.float32)
    for mat in (sel, sdx, sdy):
        exact = _xdot(ex_flat, mat, ((1,), (0,)), precise=True)
        two = _xdot(ex_flat, mat, ((1,), (0,)), precise=False,
                    b_exact=True)
        err = np.abs(np.asarray(exact) - np.asarray(two)).max()
        assert err < 1e-2, err


def test_identity_fast_path_matches_slow_path():
    """The interior-feature trace-identity bias (compiled default) must
    agree with the reference-ordered masked-patch bias to float-reorder
    tolerance: same endpoints to ~1e-2 px, at most one borderline status
    flip per few hundred features."""
    from feature_tracker_tpu.ops.pallas_klt import (
        track_pyramid_fast_pallas,
    )
    from feature_tracker_tpu.ops.pyramid import build_pyramid

    ref, cur = translated_pair(h=120, w=160, shift=(3.0, -2.0))
    rp = build_pyramid(jnp.asarray(ref), 3)
    cp = build_pyramid(jnp.asarray(cur), 3)
    rng = np.random.default_rng(7)
    n = 96
    uv = jnp.asarray(np.stack([rng.uniform(2, 158, n),
                               rng.uniform(2, 118, n)],
                              -1).astype(np.float32))
    opts = KltOptions(max_track_points=n)
    uv_s, st_s = track_pyramid_fast_pallas(opts, rp, cp, uv, uv,
                                           interpret=True,
                                           use_identity=False)
    uv_f, st_f = track_pyramid_fast_pallas(opts, rp, cp, uv, uv,
                                           interpret=True,
                                           use_identity=True)
    st_s, st_f = np.asarray(st_s), np.asarray(st_f)
    assert (st_s != st_f).sum() <= 1, np.nonzero(st_s != st_f)
    both = (st_s == 1) & (st_f == 1)
    d = np.abs(np.asarray(uv_s)[both] - np.asarray(uv_f)[both])
    assert d.max() < 1e-2, d.max()


def test_qdt_fold_matches_slow_path():
    """The round-3 stacked q/dt-fold bias (compiled default) must agree
    with the reference-ordered masked-patch bias: the fold is exact
    algebra (rowmask from the hat partition of unity, colmask on the
    stacked column sums), so only float reordering separates them."""
    from feature_tracker_tpu.ops.pallas_klt import (
        track_pyramid_fast_pallas,
    )
    from feature_tracker_tpu.ops.pyramid import build_pyramid

    ref, cur = translated_pair(h=120, w=160, shift=(3.0, -2.0))
    rp = build_pyramid(jnp.asarray(ref), 3)
    cp = build_pyramid(jnp.asarray(cur), 3)
    rng = np.random.default_rng(11)
    n = 96
    # Mix interior features with border-clipped ones (masked rects).
    uv = np.stack([rng.uniform(2, 158, n),
                   rng.uniform(2, 118, n)], -1).astype(np.float32)
    uv[-16:, 0] = rng.uniform(-4, 164, 16)
    uv[-16:, 1] = rng.uniform(-4, 124, 16)
    uv = jnp.asarray(uv)
    opts = KltOptions(max_track_points=n)
    uv_s, st_s = track_pyramid_fast_pallas(opts, rp, cp, uv, uv,
                                           interpret=True,
                                           bias_mode="slow")
    st_s = np.asarray(st_s)
    # qdt: scalar advance; qdtv: vector-lane advance, across the
    # interleave widths the TPU A/B sweeps (batch=8 puts the stacked
    # fold at exactly 128 lanes; 16 exercises the multi-tile fold the
    # real-chip sweep will compile).
    for mode, batch in (("qdt", 4), ("qdtv", 4), ("qdtv", 8),
                        ("qdtv", 16)):
        uv_q, st_q = track_pyramid_fast_pallas(opts, rp, cp, uv, uv,
                                               interpret=True,
                                               bias_mode=mode,
                                               batch=batch)
        st_q = np.asarray(st_q)
        assert (st_s != st_q).sum() <= 1, (mode, batch,
                                           np.nonzero(st_s != st_q))
        both = (st_s == 1) & (st_q == 1)
        d = np.abs(np.asarray(uv_s)[both] - np.asarray(uv_q)[both])
        assert d.max() < 1e-2, (mode, batch, d.max())


@pytest.mark.parametrize("method", [KltMethod.INVERSE, KltMethod.DIRECT])
def test_iter_pallas_matches_jnp_pyramid(method):
    """Whole-pyramid DIRECT/INVERSE kernel vs the jnp level loop: exact
    status parity, positions to float tolerance."""
    from feature_tracker_tpu.ops.pallas_klt import track_pyramid_iter_pallas
    from feature_tracker_tpu.ops.pyramid import build_pyramid
    from feature_tracker_tpu.trackers.klt import basic as _basic

    ref, cur = translated_pair(h=120, w=160, shift=(2.5, -1.5))
    rp = build_pyramid(jnp.asarray(ref), 3)
    cp = build_pyramid(jnp.asarray(cur), 3)
    rng = np.random.default_rng(0)
    n = 32
    uv = jnp.asarray(np.stack([rng.uniform(2, 158, n),
                               rng.uniform(2, 118, n)], -1), jnp.float32)
    st0 = jnp.zeros(n, jnp.int8)
    opts = KltOptions(max_track_points=n, method=method)

    scale = 4.0
    s_ref, s_cur, st = uv / scale, uv / scale, st0
    for lvl in (2, 1, 0):
        s_cur, st = _basic.track_level(opts, rp[lvl], cp[lvl], s_ref,
                                       s_cur, st)
        if lvl > 0:
            s_ref, s_cur = s_ref * 2, s_cur * 2

    ub, sb = track_pyramid_iter_pallas(opts, rp, cp, uv, uv, st0,
                                       interpret=True)
    np.testing.assert_array_equal(np.asarray(st), np.asarray(sb))
    np.testing.assert_allclose(np.asarray(s_cur), np.asarray(ub),
                               atol=1e-4)
    assert (np.asarray(sb) == int(TrackStatus.TRACKED)).sum() >= n - 2


@pytest.mark.parametrize("entry", ["fast", "iter"])
def test_wide_patch_raises_stride_guard(entry):
    """Ex-patch dims past the stacked-sampler 32-lane stride must raise
    (silent aliasing otherwise); the tracker dispatch falls back to jnp."""
    from feature_tracker_tpu.ops.pallas_klt import (
        pallas_patch_supported,
        track_pyramid_fast_pallas,
        track_pyramid_iter_pallas,
    )

    opts = KltOptions(patch_row_half_size=15, patch_col_half_size=15,
                      method=(KltMethod.FAST if entry == "fast"
                              else KltMethod.INVERSE))
    assert not pallas_patch_supported(opts)
    img = jnp.zeros((64, 64), jnp.float32)
    uv = jnp.zeros((4, 2), jnp.float32)
    with pytest.raises(ValueError, match="stacked-sampler"):
        if entry == "fast":
            track_pyramid_fast_pallas(opts, (img,), (img,), uv, uv,
                                      interpret=True)
        else:
            track_pyramid_iter_pallas(opts, (img,), (img,), uv, uv,
                                      jnp.zeros(4, jnp.int8),
                                      interpret=True)
    # half size 14 (ex-patch 31) still fits the 32-lane stride.
    assert pallas_patch_supported(
        KltOptions(patch_row_half_size=14, patch_col_half_size=14))
