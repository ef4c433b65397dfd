"""Multi-pair tracking: K independent frame pairs in ONE launch.

The multi-camera / multi-sequence front-end shape (no reference
counterpart — the reference tracks one pair per call,
optical_flow.cpp:6-26): the K pairs' pyramids are stacked VERTICALLY
into one composite pyramid per side with a zero gap band between pairs
(halved per level so per-pair row offsets stay exact integers at every
level), each pair's features are offset into its band, and the whole
composite tracks as one call — one kernel launch on TPU, amortizing
per-call dispatch and setup across the pairs.

Semantics caveat (documented deviation): a feature whose patch reaches
its band edge AT ANY PYRAMID LEVEL samples the zero gap instead of
getting the per-pair border masking — exact parity holds for features
at least ``(patch_half + 2) * 2^(levels-1)`` px inside their image
(e.g. 32 px at half size 6, 3 levels). ``track_pairs`` validates that
the gap at the COARSEST level still covers one extended patch, so the
NEIGHBOR pair's pixels can never leak into a patch (only gap zeros
can): gap >= (ex_patch + 1) * 2^(levels-1), i.e. 64 at 3 levels / 128
at 4 levels for the default patch.

VMEM bounds K on TPU: the fast kernel keeps both composite pyramids
resident (~6 MB per 376x512 pair at 4 levels).
"""

from __future__ import annotations

import jax.numpy as jnp



def build_composite_pyramids(pyramids, gap: int = 64):
    """Stack K same-shape pyramids vertically with a zero gap band after
    each pair. Returns (composite levels tuple, band height at level 0).

    ``gap`` must be divisible by 2^(levels-1) so per-pair offsets stay
    integral at every level."""
    k = len(pyramids)
    levels = len(pyramids[0])
    h0, w0 = pyramids[0][0].shape
    for p in pyramids:
        if len(p) != levels or p[0].shape != (h0, w0):
            raise ValueError("all pairs need identical pyramid shapes")
    if gap % (1 << (levels - 1)) or h0 % (1 << (levels - 1)):
        raise ValueError(f"gap ({gap}) and height ({h0}) must be "
                         f"divisible by 2^(levels-1)")
    comp = []
    for lvl in range(levels):
        gl = gap >> lvl
        wl = pyramids[0][lvl].shape[1]
        z = jnp.zeros((gl, wl), pyramids[0][lvl].dtype)
        comp.append(jnp.concatenate(
            [jnp.concatenate([p[lvl], z], 0) for p in pyramids], 0))
    del k
    return tuple(comp), h0 + gap


def track_pairs(tracker, ref_pyramids, cur_pyramids, ref_uv, cur_uv=None,
                status=None, gap: int = 64):
    """Track K pairs in one launch.

    Args:
      tracker: a ``BasicKlt`` (warp trackers work too through the same
        dispatch, sharing the composite's skip/status semantics).
      ref_pyramids / cur_pyramids: K same-shape pyramids (finest first).
      ref_uv: ``[K, N, 2]`` per-pair feature positions; ``cur_uv`` and
        ``status`` optional with the same leading shape.

    Returns (cur_uv [K, N, 2], status [K, N] int8) in per-pair coords.
    """
    k = len(ref_pyramids)
    ref_uv = jnp.asarray(ref_uv, jnp.float32)
    if ref_uv.ndim != 3 or ref_uv.shape[0] != k:
        raise ValueError(f"ref_uv must be [K={k}, N, 2]")
    levels = len(ref_pyramids[0])
    ex = max(tracker.options.ex_patch_rows, tracker.options.ex_patch_cols)
    min_gap = (ex + 1) * (1 << (levels - 1))
    if gap < min_gap:
        raise ValueError(
            f"gap ({gap}) must be >= (ex_patch + 1) * 2^(levels-1) = "
            f"{min_gap} so the coarsest-level gap still covers one "
            f"extended patch (otherwise the neighbor pair's pixels leak "
            f"into border features' patches)")
    n = ref_uv.shape[1]
    comp_ref, band = build_composite_pyramids(ref_pyramids, gap)
    comp_cur, _ = build_composite_pyramids(cur_pyramids, gap)
    off = (band * jnp.arange(k, dtype=jnp.float32))[:, None, None]
    off = jnp.concatenate([jnp.zeros_like(off), off], -1)   # y offset only
    flat = (ref_uv + off).reshape(k * n, 2)
    cur_flat = (None if cur_uv is None
                else (jnp.asarray(cur_uv, jnp.float32) + off).reshape(
                    k * n, 2))
    st_flat = (None if status is None
               else jnp.asarray(status, jnp.int8).reshape(k * n))
    # max_track_points must cover the whole composite batch (tracker
    # constructors differ across warp models, so no silent rebuild).
    if tracker.options.max_track_points < k * n:
        raise ValueError(
            f"tracker.options.max_track_points "
            f"({tracker.options.max_track_points}) must cover all "
            f"K*N = {k * n} composite features")
    out_uv, out_st = tracker.track(comp_ref, comp_cur, flat, cur_flat,
                                   st_flat)
    out_uv = out_uv.reshape(k, n, 2) - off
    return out_uv, out_st.reshape(k, n)


__all__ = ["build_composite_pyramids", "track_pairs"]
