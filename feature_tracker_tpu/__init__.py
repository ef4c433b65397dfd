"""feature_tracker_tpu — a TPU-native feature tracking framework for visual
SLAM front-ends.

Built from scratch for JAX/XLA/Pallas on TPU, with the capability surface of
the reference C++/Eigen library (Horizon1026/Feature_Tracker): pyramidal
Lucas-Kanade tracking (basic / affine / SE(2)-LSSD warps, direct / inverse /
fast solver modes), dense Farneback optical flow, direct photometric SE(3)
pose tracking, descriptor matching (BRIEF / SuperPoint / DISK), LightGlue
attention matching, and RAFT — all as batched, jittable pure functions.

Conventions
-----------
* Images are ``float32 [H, W]`` arrays holding 0..255 gray values.
* Pixel coordinates are ``uv = (x, y) = (col, row)`` float pairs, matching
  the reference's ``Vec2 pixel_uv`` convention.
* Per-feature results carry an int8 ``TrackStatus`` code
  (see :mod:`feature_tracker_tpu.core.status`).
"""

from feature_tracker_tpu.core.status import TrackStatus

__version__ = "0.1.0"

__all__ = ["TrackStatus", "__version__"]
