"""Brief RAFT training on synthetic flow + held-out EPE (VERDICT r2
item 9: the RAFT row needs a quality axis, not just ms).

The reference's RAFT is untrained torch code with a shape-only self-test
(reference: src/nn_optical_flow_tracker/raft/model.py:100-121); there is
no published accuracy to match, so the measurable claim here is that the
native Flax RAFT *learns*: short supervised training on dense synthetic
similarity-warp flow (exactly known per-pixel ground truth), then EPE /
outlier fractions on held-out pairs, recorded in weights/metrics.json
and BASELINE.md.

Run: ``python -m feature_tracker_tpu.train.raft_pretrain [steps=N]``.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from feature_tracker_tpu.models.raft import Raft, RaftConfig
from feature_tracker_tpu.train.pretrain import warped_texture_pair
from feature_tracker_tpu.train.raft_eval import flow_metrics
from feature_tracker_tpu.train.raft_train import (
    RaftTrainConfig,
    create_train_state,
    make_train_step,
)
from feature_tracker_tpu.utils.weights import WEIGHTS_DIR, save_pytree


def synthetic_flow_sample(rng, h, w, max_theta=0.1, max_shift=6.0,
                          augment=True):
    """(ref, cur, flow): dense ground-truth flow of a similarity warp —
    a point at p in ref appears at warp(p) in cur, so
    flow(p) = warp(p) - p, known exactly at every pixel."""
    ref, cur, warp = warped_texture_pair(rng, h, w, max_theta=max_theta,
                                         max_shift=max_shift,
                                         augment=augment)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    pts = np.stack([xx.reshape(-1), yy.reshape(-1)], -1)
    proj = warp(pts)
    flow = (proj - pts).reshape(h, w, 2).astype(np.float32)
    return ref.astype(np.float32), cur.astype(np.float32), flow


def make_pool(rng, n, h, w, batch, augment=True):
    pool = []
    for _ in range(n):
        refs, curs, flows = [], [], []
        for _ in range(batch):
            r, c, f = synthetic_flow_sample(rng, h, w, augment=augment)
            refs.append(r[..., None])
            curs.append(c[..., None])
            flows.append(f)
        pool.append((jnp.asarray(np.stack(refs)),
                     jnp.asarray(np.stack(curs)),
                     jnp.asarray(np.stack(flows))))
    return pool


def make_real_pool(rng, n, h, w, batch):
    """Batches of REAL consecutive-frame crop pairs (the mounted KITTI
    sequence) for the photometric-warp step — real motion has no dense
    flow ground truth, so these train unsupervised (VERDICT r4 item 4).
    Returns [] when the imagery is unavailable."""
    from feature_tracker_tpu.train.pretrain import _real_image_pool

    frames = _real_image_pool()
    if len(frames) < 2:
        return []
    pool = []
    for _ in range(n):
        refs, curs = [], []
        for _ in range(batch):
            i = int(rng.integers(len(frames) - 1))
            a, b = frames[i], frames[i + 1]
            ih, iw = a.shape
            oy = int(rng.integers(0, ih - h))
            ox = int(rng.integers(0, iw - w))
            refs.append(a[oy:oy + h, ox:ox + w, None])
            curs.append(b[oy:oy + h, ox:ox + w, None])
        pool.append((jnp.asarray(np.stack(refs)),
                     jnp.asarray(np.stack(curs))))
    return pool


def main(steps: int = 600, h: int = 128, w: int = 128, batch: int = 4,
         iters: int = 8, seed: int = 0, log_every: int = 50,
         eval_pairs: int = 16, augment: int = 0, small: int = 0,
         real_pct: int = 0, lr_micro: int = 0, gate: int = 1,
         pool_size: int = 150):
    """``real_pct`` interleaves UNSUPERVISED photometric-warp steps on
    real consecutive KITTI frame crops (make_unsup_train_step) with the
    supervised synthetic steps — the real-data lever for the full
    config's predict-the-mean plateau (VERDICT r4 item 4). ``gate``
    keeps the on-disk weights when the held-out EPE regressed."""
    from feature_tracker_tpu.train.raft_train import make_unsup_train_step

    os.makedirs(WEIGHTS_DIR, exist_ok=True)
    t0 = time.time()
    if small:
        # Compact config: the full-size model needs RAFT-paper-scale
        # step counts (~100k) to escape the predict-the-mean basin —
        # far beyond this driver; the compact model demonstrates
        # correlation-driven learning within a short budget.
        cfg = RaftConfig(max_iterations=iters, feature_channels=64,
                         context_channels=64, hidden_channels=32,
                         correlation_pyramid_levels=2,
                         correlation_radius=3,
                         correlation_hidden_channels=32,
                         correlation_out_channels=16,
                         flow_hidden_channels=16, flow_out_channels=8,
                         motion_out_channels=16, mask_hidden_channels=32)
    else:
        cfg = RaftConfig(max_iterations=iters)
    lr = (lr_micro * 1e-6) if lr_micro > 0 else (4e-4 if small else 3e-4)
    tcfg = RaftTrainConfig(learning_rate=lr, schedule_steps=steps)
    rng = np.random.default_rng(seed)

    state = create_train_state(jax.random.PRNGKey(seed), cfg, tcfg,
                               (batch, h, w, 1))
    step = make_train_step(cfg, tcfg)

    # Data pre-generated in one phase (tunnel program-cache discipline).
    # Photometric augmentation off by default: with batch-4 BatchNorm and
    # a small model the gain/bias jitter dominated the loss and training
    # plateaued at EPE ~8 (the round-3 2400-step run).
    pool = make_pool(rng, min(steps, pool_size), h, w, batch,
                     augment=bool(augment))
    real_pool = (make_real_pool(rng, min(steps, pool_size), h, w, batch)
                 if real_pct > 0 else [])
    ustep = make_unsup_train_step(cfg, tcfg) if real_pool else None
    ri = 0
    for it in range(steps):
        if real_pool and rng.uniform() < real_pct / 100.0:
            ref, cur = real_pool[ri % len(real_pool)]
            ri += 1
            state, metrics = ustep(state, ref, cur)
            if it % log_every == 0 or it == steps - 1:
                print(f"[raft] step {it} (real/photo): "
                      f"loss={float(metrics['loss']):.3f} "
                      f"mean_flow={float(metrics['mean_flow']):.2f}",
                      flush=True)
            continue
        ref, cur, gt = pool[it % len(pool)]
        state, metrics = step(state, ref, cur, gt)
        if it % log_every == 0 or it == steps - 1:
            print(f"[raft] step {it}: loss={float(metrics['loss']):.3f} "
                  f"epe={float(metrics['epe']):.3f}", flush=True)

    # Held-out evaluation at the FINAL refinement iteration.
    model = Raft(cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    eval_rng = np.random.default_rng(seed + 1000)
    n_eval_batches = max(1, -(-eval_pairs // batch))  # ceil, never 0
    epool = make_pool(eval_rng, n_eval_batches, h, w, batch,
                      augment=bool(augment))
    agg = None
    zero_epe = 0.0
    for ref, cur, gt in epool:
        preds = model.apply(variables, ref, cur)
        m = {k: float(v) for k, v in flow_metrics(preds[-1], gt).items()}
        agg = m if agg is None else {k: agg[k] + m[k] for k in m}
        zero_epe += float(jnp.mean(jnp.linalg.norm(gt, axis=-1)))
    agg = {k: round(v / len(epool), 4) for k, v in agg.items()}
    # The do-nothing baseline: EPE of predicting zero flow.
    agg["zero_flow_epe"] = round(zero_epe / len(epool), 4)
    agg["pairs"] = n_eval_batches * batch
    agg["resolution"] = f"{w}x{h}"
    agg["config"] = "compact" if small else "full"
    agg["iterations"] = iters
    agg["train_steps"] = steps
    agg["real_photometric_pct"] = real_pct
    agg["lr_peak"] = lr
    agg["wall_s"] = round(time.time() - t0, 1)
    print("[raft] held-out:", json.dumps(agg), flush=True)

    key = "raft_small" if small else "raft"
    mpath = os.path.join(WEIGHTS_DIR, "metrics.json")
    metrics_all = {}
    if os.path.exists(mpath):
        with open(mpath) as f:
            metrics_all = json.load(f)
    prev_entry = metrics_all.get(key, {})
    prev = prev_entry.get("epe")
    # Gated ship (cotracker_pretrain convention): never overwrite
    # weights with a run that regressed the held-out EPE. EPEs only
    # compare at the same eval resolution; a mismatched resolution
    # keeps the on-disk weights (run with gate=0 to force).
    if gate and prev is not None \
            and prev_entry.get("resolution") != agg["resolution"]:
        print(f"[raft] gate-rejected (eval resolution "
              f"{agg['resolution']} != shipped "
              f"{prev_entry.get('resolution')}); weights unchanged",
              flush=True)
        return agg
    if gate and prev is not None and agg["epe"] >= prev:
        print(f"[raft] gate-rejected (epe {agg['epe']} >= prev {prev}); "
              f"weights unchanged", flush=True)
        return agg
    save_pytree(os.path.join(WEIGHTS_DIR,
                             "raft_small.npz" if small else "raft.npz"),
                {"params": state.params, "batch_stats": state.batch_stats})
    metrics_all[key] = agg
    with open(mpath, "w") as f:
        json.dump(metrics_all, f, indent=2)
    if prev is not None:
        print(f"[raft] shipped (epe {agg['epe']} < prev {prev})",
              flush=True)
    return agg


if __name__ == "__main__":
    import sys
    kw = {}
    for a in sys.argv[1:]:
        k, v = a.split("=")
        kw[k] = int(v)
    main(**kw)
