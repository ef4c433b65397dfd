from feature_tracker_tpu.train.raft_train import (
    RaftTrainConfig,
    TrainState,
    create_train_state,
    make_train_step,
    sequence_loss,
)

__all__ = [
    "RaftTrainConfig",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "sequence_loss",
]
