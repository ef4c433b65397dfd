"""Brief CoTracker training on synthetic videos + held-out track EPE.

CoTracker is a capability the reference reserves but leaves EMPTY
(reference: src/nn_optical_flow_tracker/co_tracker/model.py — 0 lines),
so there is no behavior to match; the measurable claim here is that the
native joint tracker *learns*: short supervised training on synthetic
videos whose per-frame point tracks are exactly known (a smooth chain of
similarity warps applied to textured/real imagery), then endpoint error
on held-out videos vs the zero-motion baseline, recorded in
weights/metrics.json and BASELINE.md.

Run: ``python -m feature_tracker_tpu.train.cotracker_pretrain [steps=N]``.
"""

from __future__ import annotations

import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from feature_tracker_tpu.models.cotracker import CoTracker, CoTrackerConfig
from feature_tracker_tpu.train.pretrain import (
    _bilinear_np,
    _photometric,
    _real_image_pool,
    _Texture,
)
from feature_tracker_tpu.utils.weights import WEIGHTS_DIR, save_pytree


def synthetic_video(rng, t, h, w, n_points, max_theta_step=0.04,
                    max_shift_step=2.5, augment=True):
    """(video [T,H,W,1], queries [N,2], tracks [T,N,2], vis [T,N]).

    Frame k renders the base image under the CUMULATIVE similarity warp
    W_k = S_k ∘ ... ∘ S_1 (W_0 = identity), each step S_i a small random
    rotation/scale/shift about the image center — a smooth trajectory. A
    point at p in frame 0 appears at W_k(p) in frame k, known exactly;
    visibility is the in-frame indicator."""
    pool = _real_image_pool()
    use_real = len(pool) > 0 and rng.uniform() < 0.5
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    center = np.array([w / 2.0, h / 2.0])

    if use_real:
        img = pool[rng.integers(len(pool))]
        ih, iw = img.shape
        margin = 40
        ox = rng.uniform(margin, iw - w - margin)
        oy = rng.uniform(margin, ih - h - margin)
        base = _bilinear_np(img, xx + ox, yy + oy).astype(np.float32)
    else:
        tex = _Texture(rng)
        base = tex.eval(xx, yy).astype(np.float32)

    rot = np.eye(2)
    trans = np.zeros(2)
    frames = [base]
    rots, transs = [rot], [trans]
    for _ in range(t - 1):
        th = rng.uniform(-max_theta_step, max_theta_step)
        sc = rng.uniform(0.98, 1.02)
        c, s = np.cos(th) * sc, np.sin(th) * sc
        step_rot = np.array([[c, -s], [s, c]])
        step_t = (center + rng.uniform(-max_shift_step, max_shift_step, 2)
                  - step_rot @ center)
        rot = step_rot @ rot
        trans = step_rot @ trans + step_t
        rinv = np.linalg.inv(rot)
        src = np.stack([xx - trans[0], yy - trans[1]], -1) @ rinv.T
        frame = _bilinear_np(base, src[..., 0], src[..., 1])
        if augment:
            frame = _photometric(rng, frame)
        frames.append(frame.astype(np.float32))
        rots.append(rot)
        transs.append(trans)

    margin = 6
    queries = np.stack([rng.uniform(margin, w - margin, n_points),
                        rng.uniform(margin, h - margin, n_points)],
                       -1)                                      # [N, 2]
    tracks = np.stack([queries @ np.asarray(r).T + tt
                       for r, tt in zip(rots, transs)], 0)      # [T, N, 2]
    vis = ((tracks[..., 0] >= 0) & (tracks[..., 0] <= w - 1)
           & (tracks[..., 1] >= 0) & (tracks[..., 1] <= h - 1))
    video = np.stack(frames)[..., None]
    return (video.astype(np.float32), queries.astype(np.float32),
            tracks.astype(np.float32), vis.astype(np.float32))


_REAL_TRACKS = None


def _np_pyramid(img, levels=4):
    """Numpy twin of ops.pyramid.build_pyramid(quantize=True) — label
    generation must not touch the TPU (the native CPU KLT port does the
    tracking)."""
    pyr = [np.floor(img).astype(np.float32)]
    for _ in range(levels - 1):
        a = pyr[-1]
        h2, w2 = (a.shape[0] // 2) * 2, (a.shape[1] // 2) * 2
        pyr.append(np.floor((a[0:h2:2, 0:w2:2] + a[1:h2:2, 0:w2:2]
                             + a[0:h2:2, 1:w2:2] + a[1:h2:2, 1:w2:2])
                            * 0.25))
    return pyr


def _real_video_tracks(grid_step=6, margin=20, fb_tol=0.5):
    """REAL video with KLT-verified pseudo-label tracks (VERDICT r4
    item 4): the mounted 6-frame KITTI sequence, dense grid seeds
    tracked 0->5 by the native CPU fast-KLT port (chained pairs), then
    5->0 from the endpoints; a track survives only if every status is
    TRACKED both ways and the round trip returns within ``fb_tol`` px.
    Label noise is the KLT endpoint error (~0.03-0.1 px vs the native
    ground truth — far below the EPEs being measured).

    Returns (frames [6, H, W] f32, tracks [6, M, 2] f32), cached; (None,
    None) when the imagery or the native port is unavailable."""
    global _REAL_TRACKS
    if _REAL_TRACKS is not None:
        return _REAL_TRACKS
    _REAL_TRACKS = (None, None)
    try:
        from feature_tracker_tpu.core.config import KltOptions
        from feature_tracker_tpu.runtime.cpu_baseline import klt_fast_cpu

        frames = _real_image_pool()
        if len(frames) < 3:
            return _REAL_TRACKS
        frames = np.stack(frames[:6])
        t, (ih, iw) = frames.shape[0], frames.shape[1:]
        xs = np.arange(margin, iw - margin, grid_step, dtype=np.float32)
        ys = np.arange(margin, ih - margin, grid_step, dtype=np.float32)
        gx, gy = np.meshgrid(xs, ys)
        uv0 = np.stack([gx.reshape(-1), gy.reshape(-1)], -1)
        opts = KltOptions(max_track_points=uv0.shape[0])
        pyrs = [_np_pyramid(f) for f in frames]

        fwd = [uv0]
        alive = np.ones(uv0.shape[0], bool)
        uv, st = uv0, None
        for i in range(t - 1):
            uv, st = klt_fast_cpu(pyrs[i], pyrs[i + 1], uv, cur_uv=uv,
                                  status=st, opts=opts)
            alive &= (st == 1)
            fwd.append(uv)
        buv, bst = fwd[-1], None
        for i in range(t - 1, 0, -1):
            buv, bst = klt_fast_cpu(pyrs[i], pyrs[i - 1], buv, cur_uv=buv,
                                    status=bst, opts=opts)
            alive &= (bst == 1)
        alive &= (np.linalg.norm(buv - uv0, axis=-1) < fb_tol)
        tracks = np.stack(fwd)[:, alive]          # [T, M, 2]
        if tracks.shape[1] >= 64:
            _REAL_TRACKS = (frames, tracks.astype(np.float32))
    except Exception:
        pass
    return _REAL_TRACKS


def real_video_sample(rng, t, h, w, n_points, augment=True,
                      max_drift_step=3.0):
    """One training sample from the REAL sequence: a crop window (with a
    smooth random per-frame drift — known camera shake on top of the
    real scene motion) around a randomly chosen verified track, frame
    indices ping-ponged to length ``t``. Same contract as
    synthetic_video; returns None when real data is unavailable."""
    frames, tracks = _real_video_tracks()
    if frames is None:
        return None
    tf, (ih, iw) = frames.shape[0], frames.shape[1:]
    idx = list(range(tf))
    while len(idx) < t:  # ping-pong: 0,1,..,5,4,3,.. (real motion both ways)
        nxt = idx[-2] if len(idx) >= 2 else 0
        step = -1 if idx[-1] > nxt else 1
        idx.append(idx[-1] + step if 0 <= idx[-1] + step < tf else 1)
    idx = np.asarray(idx[:t])

    margin = 6
    for _ in range(20):
        anchor = tracks[0, rng.integers(tracks.shape[1])]
        ox = np.clip(anchor[0] - rng.uniform(margin, w - margin),
                     0, iw - w - 1 - max_drift_step * t)
        oy = np.clip(anchor[1] - rng.uniform(margin, h - margin),
                     0, ih - h - 1 - max_drift_step * t)
        ox = max(ox, max_drift_step * t)
        oy = max(oy, max_drift_step * t)
        in0 = ((tracks[0, :, 0] >= ox + margin)
               & (tracks[0, :, 0] <= ox + w - margin)
               & (tracks[0, :, 1] >= oy + margin)
               & (tracks[0, :, 1] <= oy + h - margin))
        if in0.sum() >= n_points:
            break
    else:
        return None
    sel = rng.choice(np.nonzero(in0)[0], n_points, replace=False)

    # Smooth window drift: origin_k = origin + cumsum of small steps.
    drift = np.zeros((t, 2))
    drift[1:] = np.cumsum(
        rng.uniform(-max_drift_step, max_drift_step, (t - 1, 2)), axis=0)
    origins = np.stack([ox, oy]) + drift                    # [t, 2]

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    vid = []
    for k in range(t):
        f = _bilinear_np(frames[idx[k]], xx + origins[k, 0],
                         yy + origins[k, 1])
        if augment and k > 0:
            f = _photometric(rng, f)
        vid.append(f.astype(np.float32))
    video = np.stack(vid)[..., None]

    tr = tracks[idx][:, sel] - origins[:, None, :]          # [t, N, 2]
    queries = tr[0]
    vis = ((tr[..., 0] >= 0) & (tr[..., 0] <= w - 1)
           & (tr[..., 1] >= 0) & (tr[..., 1] <= h - 1))
    return (video.astype(np.float32), queries.astype(np.float32),
            tr.astype(np.float32), vis.astype(np.float32))


def make_pool(rng, n, batch, t, h, w, n_points, augment=True,
              wide_motion=False, real_frac=0.0):
    """``wide_motion`` samples per-video step magnitudes up to ~6 px
    shift / 0.08 rad (VERDICT r3 item 7: with the default gentle motion
    the zero-motion baseline is already ~3 px and hard to beat early;
    larger displacements make standing still a bad predictor the model
    can immediately improve on)."""
    pool = []
    for _ in range(n):
        vids, qs, trs, vs = [], [], [], []
        for _ in range(batch):
            sample = None
            if real_frac > 0 and rng.uniform() < real_frac:
                sample = real_video_sample(rng, t, h, w, n_points,
                                           augment=augment)
            if sample is None:
                if wide_motion:
                    kw = {"max_theta_step": rng.uniform(0.01, 0.08),
                          "max_shift_step": rng.uniform(1.0, 6.0)}
                else:
                    kw = {}
                sample = synthetic_video(rng, t, h, w, n_points,
                                         augment=augment, **kw)
            v, q, tr, vi = sample
            vids.append(v)
            qs.append(q)
            trs.append(tr)
            vs.append(vi)
        pool.append(tuple(jnp.asarray(np.stack(a))
                          for a in (vids, qs, trs, vs)))
    return pool


def make_train_step(model, tx, gamma: float = 0.8):

    def loss_fn(params, video, queries, tracks, vis):
        pred, vis_logits, pred_iters = jax.vmap(
            lambda v, q: model.apply({"params": params}, v, q,
                                     return_all_iterations=True))(
                video, queries)
        # RAFT-style supervision of EVERY refinement iteration with
        # exponentially increasing weights gamma^(K-1-k) (VERDICT r3
        # item 7 — supervising only the final positions starves the
        # early iterations of gradient signal).
        d = pred_iters - tracks[:, None]                 # [B, K, T, N, 2]
        # Epsilon-smoothed norm: with zero-init heads the frame-0
        # prediction EQUALS the target exactly, and d/dx |x| at 0 is
        # NaN — plain linalg.norm NaNs the whole first gradient.
        err = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-8)   # [B, K, T, N]
        huber = jnp.where(err < 4.0, 0.5 * err * err, 4.0 * err - 8.0)
        k = err.shape[1]
        wts = gamma ** jnp.arange(k - 1, -1, -1, dtype=jnp.float32)
        per_iter = (jnp.sum(huber * vis[:, None], axis=(0, 2, 3))
                    / jnp.maximum(jnp.sum(vis), 1.0))    # [K]
        pos_loss = jnp.sum(wts * per_iter) / jnp.sum(wts)
        vis_loss = jnp.mean(optax.sigmoid_binary_cross_entropy(
            vis_logits, vis))
        epe = (jnp.sum(err[:, -1] * vis)
               / jnp.maximum(jnp.sum(vis), 1.0))
        return pos_loss + vis_loss, epe

    @jax.jit
    def step(params, ema, opt_state, video, queries, tracks, vis):
        (loss, epe), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, video, queries, tracks, vis)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # Parameter EMA for evaluation/shipping: training at batch 2 is
        # spiky late in the schedule (r4 grid: a 6000-step run ended at
        # EPE 9.0 after passing through ~4.5; the shipped 3.50 was
        # partly cosine-decay timing luck) — the EMA smooths over the
        # spikes instead of shipping whatever the last step landed on.
        ema = jax.tree_util.tree_map(
            lambda e, p: 0.999 * e + 0.001 * p, ema, params)
        return params, ema, opt_state, loss, epe

    return step


def main(steps: int = 500, t: int = 8, h: int = 96, w: int = 96,
         n_points: int = 24, batch: int = 2, seed: int = 0,
         log_every: int = 25, eval_videos: int = 8, augment: int = 1,
         lr_micro: int = 50, wide_motion: int = 1, save: int = 1,
         real_pct: int = 0, pool_size: int = 120, feature_dim: int = 64,
         model_dim: int = 128, depth: int = 2, iterations: int = 4,
         time_enc: int = 0):
    """``real_pct`` mixes REAL KITTI-video samples with KLT-verified
    pseudo-label tracks into the pool (VERDICT r4 item 4); capacity
    knobs (feature_dim/model_dim/depth/iterations) expose the
    paper-scale axis — the r4 grid saturated the small model.
    ``time_enc`` defaults OFF: the r5 sweep measured the unit-amplitude
    sinusoidal time tokens DIVERGING at the r4-best recipe (loss 95 /
    EPE 19.33 vs 3.47 without; with real_pct=30 still 6.53 and
    visibility accuracy collapsed to 0.36) — see BASELINE.md."""
    os.makedirs(WEIGHTS_DIR, exist_ok=True)
    t0 = time.time()
    cfg = CoTrackerConfig(feature_dim=feature_dim, model_dim=model_dim,
                          depth=depth, iterations=iterations,
                          time_encoding=bool(time_enc))
    model = CoTracker(cfg)
    rng = np.random.default_rng(seed)

    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((t, h, w, 1)),
                        jnp.zeros((n_points, 2)))["params"]
    # LR was the make-or-break knob at batch 2 with final-only
    # supervision: without warmup the first adam steps threw the
    # zero-init delta heads into a >10 px basin they never left, and a
    # 2e-4 peak diverged at step ~75 (r3 notes). The r4 all-iteration
    # loss feeds every refinement step a gradient, which stabilizes
    # higher peaks — lr_micro (peak LR in 1e-6 units) exposes the knob;
    # 5e-5 remains the safe default.
    warmup = min(max(steps // 6, 50), max(steps // 2, 1))
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(optax.warmup_cosine_decay_schedule(
                         0.0, lr_micro * 1e-6, warmup, steps, 1e-6)))
    opt_state = tx.init(params)
    step = make_train_step(model, tx)

    pool = make_pool(rng, min(steps, pool_size), batch, t, h, w, n_points,
                     augment=bool(augment), wide_motion=bool(wide_motion),
                     real_frac=real_pct / 100.0)
    ema = params
    for it in range(steps):
        video, queries, tracks, vis = pool[it % len(pool)]
        params, ema, opt_state, loss, epe = step(params, ema, opt_state,
                                                 video, queries, tracks,
                                                 vis)
        if it % log_every == 0 or it == steps - 1:
            print(f"[cotracker] step {it}: loss={float(loss):.3f} "
                  f"epe={float(epe):.3f}", flush=True)
    # Evaluate/ship the EMA parameters.
    params = ema

    # Held-out evaluation (fresh rng stream, no photometric augmentation
    # so the metric reflects geometry, not appearance jitter).
    eval_rng = np.random.default_rng(seed + 1000)
    epool = make_pool(eval_rng, eval_videos, 1, t, h, w, n_points,
                      augment=False)
    apply = jax.jit(functools.partial(model.apply, {"params": params}))
    tot_err = tot_zero = tot_vis = 0.0
    vis_correct = vis_count = 0.0
    for video, queries, tracks, vis in epool:
        pred, vis_logits = apply(video[0], queries[0])
        err = np.linalg.norm(np.asarray(pred) - np.asarray(tracks[0]),
                             axis=-1)
        zero = np.linalg.norm(
            np.asarray(tracks[0]) - np.asarray(queries[0])[None], axis=-1)
        v = np.asarray(vis[0])
        tot_err += float((err * v).sum())
        tot_zero += float((zero * v).sum())
        tot_vis += float(v.sum())
        vis_correct += float(((np.asarray(vis_logits) > 0) == (v > 0.5))
                             .sum())
        vis_count += v.size
    agg = {
        "epe": round(tot_err / max(tot_vis, 1.0), 4),
        "zero_motion_epe": round(tot_zero / max(tot_vis, 1.0), 4),
        "vis_accuracy": round(vis_correct / max(vis_count, 1.0), 4),
        "videos": eval_videos,
        "frames": t,
        "points": n_points,
        "resolution": f"{w}x{h}",
        "iterations": cfg.iterations,
        "train_steps": steps,
        "lr_peak": lr_micro * 1e-6,
        "batch": batch,
        "wide_motion_train": bool(wide_motion),
        "all_iteration_loss": True,
        "real_video_pct": real_pct,
        "pool_size": pool_size,
        "config": {"feature_dim": cfg.feature_dim,
                   "model_dim": cfg.model_dim, "depth": cfg.depth,
                   "iterations": cfg.iterations,
                   "time_encoding": cfg.time_encoding},
        "wall_s": round(time.time() - t0, 1),
    }
    # Real-video held-out probe (fresh rng; crops of the SAME 6-frame
    # sequence — report-only, the synthetic held-out EPE is the gate).
    real_rng = np.random.default_rng(seed + 2000)
    r_err = r_zero = r_vis = 0.0
    for _ in range(eval_videos):
        s = real_video_sample(real_rng, t, h, w, n_points, augment=False)
        if s is None:
            break
        video, queries, tracks, vis = (jnp.asarray(a) for a in s)
        pred, _ = apply(video, queries)
        err = np.linalg.norm(np.asarray(pred) - np.asarray(tracks), axis=-1)
        zero = np.linalg.norm(np.asarray(tracks)
                              - np.asarray(queries)[None], axis=-1)
        v = np.asarray(vis)
        r_err += float((err * v).sum())
        r_zero += float((zero * v).sum())
        r_vis += float(v.sum())
    if r_vis > 0:
        agg["real_epe"] = round(r_err / r_vis, 4)
        agg["real_zero_motion_epe"] = round(r_zero / r_vis, 4)
    print("[cotracker] real-video probe:",
          json.dumps({k: agg.get(k) for k in
                      ("real_epe", "real_zero_motion_epe")}), flush=True)
    print("[cotracker] held-out:", json.dumps(agg), flush=True)

    # Gated ship (the pretrain.py convention): never overwrite weights
    # with a run that regressed the held-out EPE.
    mpath = os.path.join(WEIGHTS_DIR, "metrics.json")
    metrics_all = {}
    if os.path.exists(mpath):
        with open(mpath) as f:
            metrics_all = json.load(f)
    prev = metrics_all.get("cotracker", {}).get("epe")
    if save and (prev is None or agg["epe"] < prev):
        save_pytree(os.path.join(WEIGHTS_DIR, "cotracker.npz"),
                    {"params": params})
        metrics_all["cotracker"] = agg
        with open(mpath, "w") as f:
            json.dump(metrics_all, f, indent=2)
        print(f"[cotracker] shipped (epe {agg['epe']} < prev {prev})",
              flush=True)
    elif save:
        print(f"[cotracker] gate-rejected (epe {agg['epe']} >= prev "
              f"{prev}); weights unchanged", flush=True)
    return agg


if __name__ == "__main__":
    import sys
    kw = {}
    for a in sys.argv[1:]:
        k, v = a.split("=")
        kw[k] = int(v)
    main(**kw)
