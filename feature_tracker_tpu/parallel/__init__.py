"""Distributed execution: device meshes, sharded tracking, distributed BA.

The reference is entirely single-threaded and single-process
(SURVEY.md §2.2) — its embarrassingly-parallel per-feature loops and its
feature->pose reductions are exactly the axes this package distributes:

 - features sharded over a ``data`` mesh axis for the sparse trackers
   (the per-feature loop of basic_klt.cpp:13-54 becomes a sharded batch)
 - the direct method's joint 6x6 reduction over features
   (direct_method_tracker.cpp:128-176) becomes a vmapped H_i/b_i + psum
 - new scope beyond the reference: sharded Schur-complement bundle
   adjustment — landmark blocks sharded over the mesh, the reduced camera
   system all-reduced, solved replicated, and back-substituted shard-local.

All collectives are XLA GSPMD: inputs carry NamedShardings and jit inserts
psum/all_gather over ICI (and DCN for a multi-host axis) automatically.
"""

from feature_tracker_tpu.parallel.mesh import (  # noqa: F401
    ba_comm_report,
    feature_sharding,
    make_mesh,
    make_multihost_mesh,
    replicated,
)
from feature_tracker_tpu.parallel.sharded import (  # noqa: F401
    shard_features,
    track_direct_sharded,
    track_klt_sharded,
)
from feature_tracker_tpu.parallel.ba import (  # noqa: F401
    BaOptions,
    bundle_adjust,
)
from feature_tracker_tpu.parallel.scaling import (  # noqa: F401
    measure_ba_scaling,
)
