"""Host-side runtime: native library bindings and the frame stream.

The compute path is JAX/Pallas on the TPU; this package is the compiled
host runtime around it (the role Slam_Utility's buffers/allocator/timer
play in the reference, SURVEY.md L1): a C++ frame ring buffer, fused
uint8->float32 + pyramid preprocessing, and nanosecond timers, with pure
numpy fallbacks when the shared library is not built.
"""

from feature_tracker_tpu.runtime.native import (  # noqa: F401
    NativeRuntime,
    build_native,
    get_runtime,
)
from feature_tracker_tpu.runtime.stream import FrameStream  # noqa: F401
