"""Sliding-window keyframe back end over the sharded bundle adjuster.

The glue between the trackers and parallel/ba.py (new scope beyond the
reference, which stops at per-pair tracking): a fixed-capacity keyframe
window plus fixed-capacity landmark table — so every optimization hits
one compiled program — fed from per-frame track results, periodically
refined with the Schur-complement BA, with marginalization-by-drop when
the window slides.

Capacity semantics: all arrays are static-size; liveness is carried by
masks. A landmark's observation list is a ring of the most recent
``obs_per_landmark`` sightings.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from feature_tracker_tpu.parallel.ba import BaOptions, bundle_adjust
from feature_tracker_tpu.parallel.mesh import feature_sharding


@dataclasses.dataclass(frozen=True)
class WindowConfig:
    max_keyframes: int = 8
    max_landmarks: int = 512
    obs_per_landmark: int = 8


class SlidingWindowBa:
    """Host-side bookkeeping + device-side optimization.

    The observation/landmark state is numpy (irregular per-frame updates
    are host work); ``optimize()`` ships the fixed-size arrays to the
    device (optionally sharded over a mesh) and runs the BA.
    """

    def __init__(self, k4, cfg: WindowConfig = WindowConfig(),
                 ba_options: BaOptions = BaOptions(), mesh=None):
        self.cfg = cfg
        self.k4 = np.asarray(k4, np.float32)
        self.ba_options = ba_options
        self.mesh = mesh

        kf, lm, obs = cfg.max_keyframes, cfg.max_landmarks, \
            cfg.obs_per_landmark
        self.q_cw = np.tile(np.array([1, 0, 0, 0], np.float32), (kf, 1))
        self.t_cw = np.zeros((kf, 3), np.float32)
        self.kf_alive = np.zeros((kf,), bool)
        self.landmarks = np.zeros((lm, 3), np.float32)
        self.lm_alive = np.zeros((lm,), bool)
        self.obs_pose = np.zeros((lm, obs), np.int32)
        self.obs_uv = np.zeros((lm, obs, 2), np.float32)
        self.obs_mask = np.zeros((lm, obs), bool)
        self._obs_next = np.zeros((lm,), np.int32)
        self._next_kf = 0

    # ------------------------------------------------------------ intake
    def add_keyframe(self, q_cw, p_cw) -> int:
        """Insert a keyframe pose; slides the window (dropping the oldest
        keyframe and its observations) when full. Returns the slot."""
        if self._next_kf >= self.cfg.max_keyframes:
            self._slide()
        slot = self._next_kf
        self.q_cw[slot] = np.asarray(q_cw, np.float32)
        self.t_cw[slot] = np.asarray(p_cw, np.float32)
        self.kf_alive[slot] = True
        self._next_kf += 1
        return slot

    def _slide(self):
        """Drop keyframe 0, shift the window left (marginalization by
        drop: the oldest pose's observations are discarded)."""
        self.q_cw[:-1] = self.q_cw[1:]
        self.t_cw[:-1] = self.t_cw[1:]
        self.kf_alive[-1] = False
        hit = self.obs_pose == 0
        self.obs_mask &= ~hit
        self.obs_pose = np.maximum(self.obs_pose - 1, 0)
        self._next_kf -= 1

    def add_landmark(self, p_w) -> int:
        free = np.nonzero(~self.lm_alive)[0]
        if free.size == 0:
            raise RuntimeError("landmark table full")
        slot = int(free[0])
        self.landmarks[slot] = np.asarray(p_w, np.float32)
        self.lm_alive[slot] = True
        self.obs_mask[slot] = False
        self._obs_next[slot] = 0
        return slot

    def add_observation(self, lm_slot: int, kf_slot: int, uv):
        o = int(self._obs_next[lm_slot]) % self.cfg.obs_per_landmark
        self.obs_pose[lm_slot, o] = kf_slot
        self.obs_uv[lm_slot, o] = np.asarray(uv, np.float32)
        self.obs_mask[lm_slot, o] = True
        self._obs_next[lm_slot] += 1

    # ---------------------------------------------------------- optimize
    def optimize(self):
        """Run the (optionally sharded) Schur-complement BA over the
        window; writes refined poses/landmarks back. Returns the rms
        history array."""
        mask = self.obs_mask & self.lm_alive[:, None]
        if self.mesh is not None:
            sh = feature_sharding(self.mesh)
            put = lambda a: jax.device_put(jnp.asarray(a), sh)  # noqa: E731
            lm = put(self.landmarks)
            idx = put(self.obs_pose)
            uv = put(self.obs_uv)
            m = put(mask)
        else:
            lm, idx, uv, m = (jnp.asarray(self.landmarks),
                              jnp.asarray(self.obs_pose),
                              jnp.asarray(self.obs_uv), jnp.asarray(mask))
        q, t, new_lm, rms = bundle_adjust(
            jnp.asarray(self.q_cw), jnp.asarray(self.t_cw), lm, idx, uv, m,
            jnp.asarray(self.k4), self.ba_options)
        self.q_cw = np.asarray(q)
        self.t_cw = np.asarray(t)
        self.landmarks = np.asarray(new_lm)
        return np.asarray(rms)
