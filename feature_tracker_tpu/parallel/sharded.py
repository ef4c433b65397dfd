"""Sharded front ends for the sparse trackers and the direct method.

The sparse KLT trackers are embarrassingly parallel per feature
(reference: basic_klt.cpp:13-54 is a serial feature loop) — here the
feature axis is sharded over the mesh and the images replicated; every
device tracks its slice with zero communication. The direct method is a
reduction of per-feature 6x6 systems into one pose
(direct_method_tracker.cpp:128-176) — features are sharded, and XLA
all-reduces the H/b sums (a psum over the mesh) each Gauss-Newton
iteration.

Both wrappers pad the feature count to a multiple of the mesh size (jit
needs even shards); padded lanes carry a failed status / zero depth so
they are inert, and outputs are sliced back.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from feature_tracker_tpu.core.status import TrackStatus
from feature_tracker_tpu.parallel.mesh import (
    feature_sharding,
    pad_to_multiple,
    replicated,
)


def shard_features(mesh, *arrays, pad_value=0.0):
    """Pad leading dims to the mesh size and device_put with the feature
    sharding. Returns (padded_n, sharded_arrays...)."""
    n = arrays[0].shape[0]
    m = int(np.prod(mesh.devices.shape))
    n_pad = pad_to_multiple(n, m)
    sh = feature_sharding(mesh)
    out = []
    for a in arrays:
        a = jnp.asarray(a)
        pad_width = [(0, n_pad - n)] + [(0, 0)] * (a.ndim - 1)
        padded = jnp.pad(a, pad_width, constant_values=pad_value)
        out.append(jax.device_put(padded, sh))
    return (n_pad, *out)


def track_klt_sharded(tracker, mesh, ref_pyramid, cur_pyramid, ref_uv,
                      cur_uv=None, status=None):
    """Track features sharded over the mesh; returns (cur_uv, status) of
    the original length.

    The tracker runs inside ``jax.shard_map`` so each device executes the
    WHOLE tracker — including the Pallas kernel on real TPUs — on its
    local feature shard with replicated images (GSPMD cannot partition a
    ``pallas_call`` on its own). The global ``max_track_points`` cap is
    applied outside the map: inside, every local lane is tracked (local
    index order is not global order), and capped lanes are restored to
    their inputs afterwards — identical semantics to the single-device
    wrapper (trackers/klt/__init__.py)."""
    import copy
    import dataclasses
    from functools import partial

    n = ref_uv.shape[0]
    ref_uv = jnp.asarray(ref_uv, jnp.float32)
    cur_uv = (jnp.asarray(cur_uv, jnp.float32) if cur_uv is not None
              else ref_uv)
    status = (jnp.asarray(status, jnp.int8) if status is not None
              else jnp.full((n,), int(TrackStatus.NOT_TRACKED), jnp.int8))

    # Padded lanes are marked failed so the tracker skips them
    # (reference semantics: failed features are not re-tracked).
    n_pad, s_ref, s_cur = shard_features(mesh, ref_uv, cur_uv)
    _, s_status = shard_features(mesh, status,
                                 pad_value=int(TrackStatus.OUTSIDE))
    rep = replicated(mesh)
    ref_pyramid = tuple(jax.device_put(a, rep) for a in ref_pyramid)
    cur_pyramid = tuple(jax.device_put(a, rep) for a in cur_pyramid)

    local = copy.copy(tracker)
    local.options = dataclasses.replace(tracker.options,
                                        max_track_points=n_pad)
    axes = tuple(mesh.axis_names)
    spec_f = jax.sharding.PartitionSpec(axes)
    spec_r = jax.sharding.PartitionSpec()

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(spec_r, spec_r, spec_f, spec_f, spec_f),
             out_specs=(spec_f, spec_f), check_vma=False)
    def run(ref_pyr, cur_pyr, r_uv, c_uv, st):
        return local.track(ref_pyr, cur_pyr, r_uv, c_uv, st)

    out_uv, out_status = run(ref_pyramid, cur_pyramid, s_ref, s_cur,
                             s_status)
    capped = jnp.arange(n) >= tracker.options.max_track_points
    out_uv = jnp.where(capped[:, None], cur_uv, out_uv[:n])
    out_status = jnp.where(capped, status, out_status[:n])
    return out_uv, out_status


def track_direct_sharded(solver, mesh, ref_pyramid, cur_pyramid, k4,
                         p_c_in_ref, ref_uv, q_rc=None, p_rc=None):
    """Direct-method pose tracking with features sharded over the mesh.

    The per-feature H_i/b_i terms live on the feature shards; the 6x6
    system sum is a psum inserted by GSPMD. Returns
    (cur_uv, q_rc, p_rc, status) of the original length."""
    n = ref_uv.shape[0]
    # Zero depth marks padded lanes invalid (the solver skips features
    # with non-positive depth, direct_method_tracker.cpp:130,142).
    _, s_p, s_uv = shard_features(mesh, jnp.asarray(p_c_in_ref, jnp.float32),
                                  jnp.asarray(ref_uv, jnp.float32))
    rep = replicated(mesh)
    ref_pyramid = tuple(jax.device_put(a, rep) for a in ref_pyramid)
    cur_pyramid = tuple(jax.device_put(a, rep) for a in cur_pyramid)
    k4 = jax.device_put(jnp.asarray(k4, jnp.float32), rep)

    cur_uv, q, p, status = solver.track(ref_pyramid, cur_pyramid, k4, s_p,
                                        s_uv, q_rc, p_rc)
    return cur_uv[:n], q, p, status[:n]
