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


if __name__ == "__main__":
    main()
