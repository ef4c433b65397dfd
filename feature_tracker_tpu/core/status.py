"""Per-feature track status codes.

Mirrors the universal status enum every tracker and visualizer in the
reference consumes (reference: src/feature_tracker.h:8-14). Stored as int8
arrays ``[N]`` on device; lanes are masked rather than skipped.
"""

import enum

import jax.numpy as jnp


class TrackStatus(enum.IntEnum):
    NOT_TRACKED = 0
    TRACKED = 1
    LARGE_RESIDUAL = 2
    OUTSIDE = 3
    NUMERIC_ERROR = 4


STATUS_DTYPE = jnp.int8


def fresh_status(n: int):
    """Status array for features that have not been tracked yet."""
    return jnp.full((n,), int(TrackStatus.NOT_TRACKED), dtype=STATUS_DTYPE)


def is_failed(status):
    """Features with status > TRACKED are not re-tracked on later calls
    (reference: basic_klt.cpp:15)."""
    return status > jnp.asarray(int(TrackStatus.TRACKED), dtype=status.dtype)
