from feature_tracker_tpu.core.status import TrackStatus
from feature_tracker_tpu.core.config import (
    KltOptions,
    KltMethod,
)

__all__ = ["TrackStatus", "KltOptions", "KltMethod"]
