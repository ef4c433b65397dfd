"""CoTracker demo: multi-frame point tracking on real KITTI video.

Beyond-reference capability: the reference reserves this slot as an
empty file (reference: src/nn_optical_flow_tracker/co_tracker/model.py,
0 bytes). This demo drives the trained TPU-native CoTracker (factorized
time/point transformer, weights/cotracker.npz — held-out EPE beats the
zero-motion baseline as of round 5) over the KITTI sequence the direct
method uses (reference: test_direct_method.cpp:21-26), and
cross-checks its endpoints against chained basic-KLT tracks (the
exact-parity classical tracker) on the same points.

Output: demos/output/cotracker_tracks.png — the last frame with the
full track trails, green = CoTracker, magenta endpoints = chained KLT.
"""

import json
import os

import _common

import jax
import jax.numpy as jnp
import numpy as np

from feature_tracker_tpu.core.config import HarrisOptions, KltOptions
from feature_tracker_tpu.core.status import TrackStatus
from feature_tracker_tpu.models.cotracker import CoTracker, CoTrackerConfig
from feature_tracker_tpu.ops.detect import detect_good_features
from feature_tracker_tpu.ops.pyramid import build_pyramid
from feature_tracker_tpu.trackers.klt import BasicKlt
from feature_tracker_tpu.utils import report_info
from feature_tracker_tpu.utils.viz import (
    COLOR_FAILED,
    COLOR_LINE,
    COLOR_TRACKED,
    draw_lines,
    draw_points,
    save_png,
    to_rgb,
)
from feature_tracker_tpu.utils.weights import WEIGHTS_DIR, load_pytree

CROP = 192          # square crop fed to the model (training res ×2)
N_POINTS = 24       # query count (training shape)
LEVELS = 3          # KLT pyramid levels for the 192-px crop


def load_video():
    left, _, curs, source = _common.load_direct_method_set()
    frames = [left] + list(curs)
    h, w = frames[0].shape
    r0 = max(0, (h - CROP) // 2)
    c0 = max(0, (w - CROP) // 2)
    video = np.stack([f[r0:r0 + CROP, c0:c0 + CROP] for f in frames])
    return video.astype(np.float32), source


def chained_klt_tracks(video, uv0):
    """Frame-to-frame basic-KLT chain (the classical cross-check)."""
    tracker = BasicKlt(KltOptions(max_track_points=N_POINTS))
    pyrs = [build_pyramid(jnp.asarray(f), LEVELS) for f in video]
    uv = jnp.asarray(uv0)
    status = jnp.full((uv0.shape[0],), int(TrackStatus.NOT_TRACKED),
                      jnp.int8)
    out = [np.asarray(uv)]
    for t in range(1, len(video)):
        uv, status = tracker.track(pyrs[t - 1], pyrs[t], uv, uv, status)
        out.append(np.asarray(uv))
    return np.stack(out), np.asarray(status)


def main():
    video, source = load_video()
    report_info(f">> CoTracker demo ({source} imagery, "
                f"{video.shape[0]} frames, {CROP}x{CROP} crop).")

    mpath = os.path.join(WEIGHTS_DIR, "metrics.json")
    wpath = os.path.join(WEIGHTS_DIR, "cotracker.npz")
    if not os.path.exists(wpath):
        report_info("!! weights/cotracker.npz missing - run "
                    "python -m feature_tracker_tpu.train.cotracker_pretrain")
        return
    mcfg = {}
    if os.path.exists(mpath):
        with open(mpath) as f:
            mcfg = json.load(f).get("cotracker", {}).get("config", {})
    cfg = CoTrackerConfig(
        feature_dim=mcfg.get("feature_dim", 64),
        model_dim=mcfg.get("model_dim", 128),
        depth=mcfg.get("depth", 2),
        iterations=mcfg.get("iterations", 4),
        time_encoding=mcfg.get("time_encoding", False))
    model = CoTracker(cfg)

    # Queries: strongest Harris corners on frame 0 of the crop.
    uv0, num = detect_good_features(
        jnp.asarray(video[0]), N_POINTS,
        HarrisOptions(min_feature_distance=12, min_valid_response=20.0))
    n = int(num)
    uv0 = np.asarray(uv0)[:n]
    report_info(f"frame 0: {n} query points")

    # The model runs at its training resolution (96x96): 2x2-mean
    # downsample the crop, halve the queries, double the tracks back.
    # Feeding the raw 192-px crop doubles the per-frame motion relative
    # to the training distribution and the refiner stays near zero.
    small = video.reshape(-1, CROP // 2, 2, CROP // 2, 2).mean((2, 4))
    vid = jnp.asarray(small)[..., None]
    queries = jnp.asarray(uv0 * 0.5, jnp.float32)
    like = model.init(jax.random.PRNGKey(0), vid, queries)["params"]
    params = load_pytree(wpath, like)
    tracks, vis = model.apply({"params": params}, vid, queries)
    tracks = np.asarray(tracks) * 2.0                # [T, N, 2]
    visible = np.asarray(jax.nn.sigmoid(vis)) > 0.5  # [T, N]

    klt_tracks, klt_status = chained_klt_tracks(video, uv0)
    ok = klt_status == int(TrackStatus.TRACKED)
    if ok.any():
        d = np.linalg.norm(tracks[-1][ok] - klt_tracks[-1][ok], axis=-1)
        zero = np.linalg.norm(uv0[ok] - klt_tracks[-1][ok], axis=-1)
        report_info(
            f"last-frame deviation vs chained KLT ({int(ok.sum())} "
            f"surviving pts): median {np.median(d):.2f} px "
            f"(zero-motion predictor: {np.median(zero):.2f} px)")

    rgb = to_rgb(video[-1])
    for t in range(1, tracks.shape[0]):
        draw_lines(rgb, tracks[t - 1], tracks[t], COLOR_LINE)
    draw_points(rgb, tracks[-1][visible[-1]], COLOR_TRACKED, 2)
    draw_points(rgb, tracks[-1][~visible[-1]], COLOR_FAILED, 2)
    draw_points(rgb, klt_tracks[-1][ok], COLOR_REF_ENDPOINT, 1)
    out = _common.out_path("cotracker_tracks.png")
    save_png(out, rgb)
    report_info(f"wrote {out}")

    # In-distribution segment: a synthetic wide-motion video with exact
    # ground truth — the distribution the held-out EPE gate measures.
    # The shipped model's margin over the zero-motion baseline is thin
    # (held-out 3.0175 vs 3.02, round 5); the print below reports this
    # sample's EPE against exact ground truth, honest either way.
    from feature_tracker_tpu.train.cotracker_pretrain import synthetic_video
    rng = np.random.default_rng(7)
    svid, sq, struth, svis = synthetic_video(rng, 8, 96, 96, N_POINTS,
                                             max_theta_step=0.05,
                                             max_shift_step=4.0)
    stracks, _ = model.apply({"params": params}, jnp.asarray(svid),
                             jnp.asarray(sq))
    stracks = np.asarray(stracks)
    mask = np.asarray(svis) > 0.5
    err = np.linalg.norm(stracks - np.asarray(struth), axis=-1)
    zerr = np.linalg.norm(np.asarray(sq)[None] - np.asarray(struth),
                          axis=-1)
    report_info(
        f"synthetic wide-motion video: EPE {err[mask].mean():.2f} px vs "
        f"zero-motion {zerr[mask].mean():.2f} px (exact ground truth)")
    srgb = to_rgb(np.asarray(svid)[-1, ..., 0])
    for t in range(1, stracks.shape[0]):
        draw_lines(srgb, stracks[t - 1], stracks[t], COLOR_LINE)
    draw_points(srgb, stracks[-1][mask[-1]], COLOR_TRACKED, 1)
    draw_points(srgb, np.asarray(struth)[-1][mask[-1]],
                COLOR_REF_ENDPOINT, 1)
    out2 = _common.out_path("cotracker_synthetic.png")
    save_png(out2, srgb)
    report_info(f"wrote {out2}")


COLOR_REF_ENDPOINT = (255, 0, 255)  # ground-truth/KLT endpoints, magenta

if __name__ == "__main__":
    main()
