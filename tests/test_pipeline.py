"""Tests for the persistent tracking front end."""

import numpy as np

from feature_tracker_tpu.core.status import TrackStatus
from feature_tracker_tpu.pipeline import FrontEndConfig, TrackingFrontEnd

from synthetic import translated_pair


def _sequence(n_frames=5, h=120, w=160, dc=3.0):
    """Texture translating by dc px/frame in x."""
    base, _ = translated_pair(h=h, w=w + int(dc) * n_frames + 8,
                              shift=(0.0, 0.0))
    frames = []
    for i in range(n_frames):
        off = int(round(dc * i))
        frames.append(base[:, off:off + w])
    return frames


def test_front_end_tracks_and_keeps_ids():
    frames = _sequence()
    cfg = FrontEndConfig(capacity=128, min_live_tracks=20,
                         harris=__import__(
                             "feature_tracker_tpu.core.config",
                             fromlist=["HarrisOptions"]).HarrisOptions(
                                 min_feature_distance=10,
                                 min_valid_response=20.0))
    fe = TrackingFrontEnd(cfg)

    r0 = fe.process_frame(frames[0])
    assert r0.num_live > 20
    ids0 = r0.track_ids.copy()

    results = [r0]
    for f in frames[1:]:
        results.append(fe.process_frame(f))

    last = results[-1]
    live = last.track_ids >= 0
    # A healthy fraction of the original tracks survives with the SAME id.
    survivors = np.intersect1d(last.track_ids[live], ids0[ids0 >= 0])
    assert len(survivors) > 10

    # Surviving tracks moved left by ~dc per frame (content shifts right
    # window -> features move left in image coords).
    sl = np.nonzero(live & np.isin(last.track_ids, survivors))[0]
    first_uv = r0.uv[np.isin(r0.track_ids, last.track_ids[sl])]
    motion = last.uv[sl][:, 0].mean() - first_uv[:, 0].mean()
    assert abs(motion + 3.0 * (len(frames) - 1)) < 1.5, motion


def test_front_end_replenishes_dead_lanes():
    frames = _sequence(n_frames=3)
    cfg = FrontEndConfig(capacity=64, min_live_tracks=64,
                         harris=__import__(
                             "feature_tracker_tpu.core.config",
                             fromlist=["HarrisOptions"]).HarrisOptions(
                                 min_feature_distance=8,
                                 min_valid_response=10.0))
    fe = TrackingFrontEnd(cfg)
    fe.process_frame(frames[0])
    r1 = fe.process_frame(frames[1])
    # min_live == capacity forces replenishment every frame; new ids
    # appear in previously dead lanes.
    assert r1.num_live > 0
    r2 = fe.process_frame(frames[2])
    assert r2.track_ids.max() >= r1.track_ids.max()
