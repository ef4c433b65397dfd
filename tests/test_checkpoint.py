"""Checkpoint/resume tests: save -> mutate -> restore round trip,
retention, and resume-equivalence of the training trajectory."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feature_tracker_tpu.models.raft import RaftConfig
from feature_tracker_tpu.train.checkpoint import CheckpointManager
from feature_tracker_tpu.train.raft_train import (
    RaftTrainConfig,
    create_train_state,
    make_train_step,
)

TINY = RaftConfig(max_iterations=2, feature_channels=16,
                  context_channels=16, hidden_channels=8,
                  correlation_pyramid_levels=2, correlation_radius=1,
                  correlation_hidden_channels=8,
                  correlation_out_channels=4, flow_hidden_channels=4,
                  flow_out_channels=4, motion_out_channels=4,
                  mask_hidden_channels=8)


@pytest.fixture(scope="module")
def setup():
    train_cfg = RaftTrainConfig()
    state = create_train_state(jax.random.PRNGKey(0), TINY, train_cfg,
                               (1, 32, 32, 1))
    step = make_train_step(TINY, train_cfg)
    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.uniform(0, 255, (1, 32, 32, 1)), jnp.float32)
    cur = jnp.asarray(rng.uniform(0, 255, (1, 32, 32, 1)), jnp.float32)
    gt = jnp.asarray(rng.normal(0, 1, (1, 32, 32, 2)), jnp.float32)
    return state, step, (ref, cur, gt)


def test_save_restore_round_trip(setup, tmp_path):
    state, step_fn, batch = setup
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    state1, _ = step_fn(state, *batch)
    assert mgr.save(int(state1.step), state1)
    restored = mgr.restore(state1)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        state1.params, restored.params)
    assert int(restored.step) == int(state1.step)
    mgr.close()


def test_resume_continues_identical_trajectory(setup, tmp_path):
    state, step_fn, batch = setup
    mgr = CheckpointManager(str(tmp_path / "ckpt2"))
    s1, _ = step_fn(state, *batch)
    mgr.save(int(s1.step), s1)
    s2_direct, m_direct = step_fn(s1, *batch)

    resumed = mgr.restore(s1)
    s2_resumed, m_resumed = step_fn(resumed, *batch)
    np.testing.assert_allclose(float(m_direct["loss"]),
                               float(m_resumed["loss"]), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), atol=1e-7),
        s2_direct.params, s2_resumed.params)
    mgr.close()


def test_retention_keeps_max_to_keep(setup, tmp_path):
    state, step_fn, batch = setup
    mgr = CheckpointManager(str(tmp_path / "ckpt3"), max_to_keep=2)
    s = state
    for _ in range(4):
        s, _ = step_fn(s, *batch)
        mgr.save(int(s.step), s)
    steps = mgr.all_steps()
    assert len(steps) == 2
    assert mgr.latest_step() == int(s.step)
    mgr.close()


def test_restore_missing_raises(tmp_path, setup):
    state, _, _ = setup
    mgr = CheckpointManager(str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError):
        mgr.restore(state)
    mgr.close()
