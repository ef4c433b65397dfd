"""Production tracking front end: detect -> pyramid -> track -> replenish.

The reference stops at per-pair demo loops (test_optical_flow.cpp); this
facade is the persistent front end a visual-SLAM system actually runs:
fixed-capacity track state (one compiled program for every frame),
persistent track identities, failure-aware replenishment (new detections
fill dead lanes, suppressed around surviving tracks), and hooks into the
sliding-window bundle adjuster for pose estimation.

All device work is static-shape; host work is O(capacity) numpy.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from feature_tracker_tpu.core.config import HarrisOptions, KltOptions
from feature_tracker_tpu.core.status import TrackStatus
from feature_tracker_tpu.ops.detect import detect_good_features
from feature_tracker_tpu.ops.pyramid import build_pyramid
from feature_tracker_tpu.trackers.klt import BasicKlt


@dataclasses.dataclass(frozen=True)
class FrontEndConfig:
    capacity: int = 300              # track slots (static shape)
    pyramid_levels: int = 4
    min_live_tracks: int = 150       # replenish below this
    replenish_suppression: float = 10.0  # px around surviving tracks
    klt: KltOptions = KltOptions(max_track_points=300)
    harris: HarrisOptions = HarrisOptions(min_feature_distance=25,
                                          min_valid_response=40.0)


@dataclasses.dataclass
class FrameResult:
    frame_id: int
    uv: np.ndarray          # [capacity, 2]
    status: np.ndarray      # [capacity] int8 (TRACKED = alive this frame)
    track_ids: np.ndarray   # [capacity] int64, -1 = empty lane
    num_live: int


class TrackingFrontEnd:
    """Persistent KLT front end over a frame stream."""

    def __init__(self, cfg: FrontEndConfig = FrontEndConfig(),
                 tracker=None):
        self.cfg = cfg
        self.tracker = tracker or BasicKlt(cfg.klt)
        cap = cfg.capacity
        self._uv = np.zeros((cap, 2), np.float32)
        self._ids = np.full((cap,), -1, np.int64)
        self._dead = np.ones((cap,), bool)
        self._next_id = 0
        self._frame_id = -1
        self._prev_pyr = None
        self._fused_step = self._make_fused_step()

    @property
    def live_mask(self) -> np.ndarray:
        return ~self._dead

    def _replenish(self, img_j):
        uv, num = detect_good_features(img_j, self.cfg.capacity,
                                       self.cfg.harris)
        cand = np.asarray(uv)[:int(num)]
        if cand.size == 0:
            return
        live = self._uv[~self._dead]
        if live.size:
            d2 = ((cand[:, None, :] - live[None, :, :]) ** 2).sum(-1)
            cand = cand[d2.min(axis=1)
                        > self.cfg.replenish_suppression ** 2]
        free = np.nonzero(self._dead)[0]
        take = min(len(free), len(cand))
        slots = free[:take]
        self._uv[slots] = cand[:take]
        self._ids[slots] = np.arange(self._next_id, self._next_id + take)
        self._next_id += take
        self._dead[slots] = False

    def _make_fused_step(self):
        """One fused program per steady-state frame: build the new
        frame's pyramid AND track into it — a single compiled program
        avoids alternating dispatches (which thrash remote program
        caches) and lets XLA overlap the pyramid build with tracking.
        Built once (jit caches by function identity)."""

        @partial(jax.jit, static_argnames=("levels",))
        def fused(prev_pyr, img, uv, dead, levels):
            pyr = build_pyramid(img, levels)
            status_in = jnp.where(
                dead, jnp.int8(int(TrackStatus.OUTSIDE)),  # skip dead
                jnp.int8(int(TrackStatus.NOT_TRACKED)))
            uv_out, st = self.tracker.track(prev_pyr, pyr, uv, uv,
                                            status_in)
            return pyr, uv_out, st

        return fused

    def process_frame(self, frame: np.ndarray) -> FrameResult:
        """frame: [H, W] gray 0..255 (numpy or jax). Returns the tracked
        state after this frame."""
        self._frame_id += 1
        img_j = jnp.asarray(frame, jnp.float32)

        if self._prev_pyr is None:
            pyr = build_pyramid(img_j, self.cfg.pyramid_levels)
            self._replenish(img_j)
            status = np.where(self._dead,
                              np.int8(int(TrackStatus.NOT_TRACKED)),
                              np.int8(int(TrackStatus.TRACKED)))
        else:
            pyr, uv_out, st = self._fused_step(
                self._prev_pyr, img_j, jnp.asarray(self._uv),
                jnp.asarray(self._dead), self.cfg.pyramid_levels)
            status = np.asarray(st)
            self._uv = np.array(uv_out)  # writable copy off-device
            failed = status != int(TrackStatus.TRACKED)
            self._dead |= failed
            self._ids[self._dead] = -1
            if (~self._dead).sum() < self.cfg.min_live_tracks:
                was_dead = self._dead.copy()
                self._replenish(img_j)
                # Slots filled by replenishment are alive THIS frame —
                # keep the "status==TRACKED means alive" contract for
                # consumers (fresh detections carry TRACKED, like the
                # first-frame branch).
                status = np.where(was_dead & ~self._dead,
                                  np.int8(int(TrackStatus.TRACKED)),
                                  status)

        self._prev_pyr = pyr
        return FrameResult(self._frame_id, self._uv.copy(), status,
                           self._ids.copy(),
                           int((~self._dead).sum()))
