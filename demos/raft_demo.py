"""RAFT self-test demo — analogue of the reference's
``python3 src/nn_optical_flow_tracker/raft/model.py`` shape check
(reference: model.py:100-121, run.sh:1): 5x60x60 gray inputs, hidden 64,
feature/context 128, 3 correlation levels, radius 3, 5 iterations; prints
every per-iteration prediction shape."""

import _common  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

from feature_tracker_tpu.models.raft import Raft, RaftConfig
from feature_tracker_tpu.utils import report_info, time_jitted


def main():
    report_info(">> Test RAFT (shape self-check parity with reference).")
    cfg = RaftConfig(max_iterations=5)
    model = Raft(cfg)
    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.uniform(0, 255, (5, 64, 64, 1)), jnp.float32)
    cur = jnp.asarray(rng.uniform(0, 255, (5, 64, 64, 1)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), ref, cur)

    apply = jax.jit(lambda v, a, b: model.apply(v, a, b))
    flows, stats = time_jitted(apply, variables, ref, cur, iters=5)
    for i in range(flows.shape[0]):
        report_info(f"prediction {i}: shape {tuple(flows[i].shape)}")
    report_info(f"RAFT forward {stats['mean_ms']:.2f} ms/call steady state "
                f"({stats['compile_ms']:.0f} ms first call).")

    # Trained-weights accuracy check (weights/raft_small.npz from
    # train/raft_pretrain.py small=1 — the compact config that converges
    # within the short budget; the full config's run is recorded in
    # weights/metrics.json): EPE on a fresh synthetic-flow pair.
    import os

    from feature_tracker_tpu.utils.weights import load_pytree, weights_path
    wpath = weights_path("raft_small.npz")
    if not os.path.exists(wpath):
        report_info("No trained RAFT weights "
                    "(run train/raft_pretrain.py small=1); "
                    "skipping EPE check.")
        return
    tcfg = RaftConfig(max_iterations=6, feature_channels=64,
                      context_channels=64, hidden_channels=32,
                      correlation_pyramid_levels=2, correlation_radius=3,
                      correlation_hidden_channels=32,
                      correlation_out_channels=16,
                      flow_hidden_channels=16, flow_out_channels=8,
                      motion_out_channels=16, mask_hidden_channels=32)
    tmodel = Raft(tcfg)
    from feature_tracker_tpu.train.raft_pretrain import (
        synthetic_flow_sample,
    )
    like_img = jnp.zeros((1, 64, 64, 1), jnp.float32)
    like = tmodel.init(jax.random.PRNGKey(0), like_img, like_img)
    trained = load_pytree(wpath, {"params": like["params"],
                                  "batch_stats": like.get("batch_stats",
                                                          {})})
    rimg, cimg, gt = synthetic_flow_sample(np.random.default_rng(77),
                                           64, 64, augment=False)
    preds = tmodel.apply(trained, jnp.asarray(rimg)[None, ..., None],
                         jnp.asarray(cimg)[None, ..., None])
    epe = float(jnp.mean(jnp.linalg.norm(
        preds[-1][0] - jnp.asarray(gt), axis=-1)))
    report_info(f"Trained RAFT EPE on a fresh synthetic pair: "
                f"{epe:.2f} px (zero-flow baseline "
                f"{float(np.linalg.norm(gt, axis=-1).mean()):.2f} px).")


if __name__ == "__main__":
    main()
