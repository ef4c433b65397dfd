from feature_tracker_tpu.models.raft import Raft, RaftConfig

__all__ = ["Raft", "RaftConfig"]
