"""Small batched linear solves for per-feature Gauss-Newton steps.

The reference solves per-feature 2x2/3x3/6x6 systems with Eigen LDLT
(reference: basic_klt_fast.cpp:39). Here the 2x2 is closed-form and the
general symmetric case goes through ``jnp.linalg.solve``; both vmap cleanly
and a singular H yields non-finite steps, which the iteration scaffold turns
into NUMERIC_ERROR exactly like Eigen's NaN check."""

from __future__ import annotations

import jax.numpy as jnp


def solve2x2(h00, h01, h11, b0, b1):
    """Closed-form solve of the symmetric 2x2 system H v = b."""
    det = h00 * h11 - h01 * h01
    v0 = (h11 * b0 - h01 * b1) / det
    v1 = (h00 * b1 - h01 * b0) / det
    return jnp.stack([v0, v1])


def solve_sym(h, b):
    """Solve H v = b for a small symmetric matrix (3x3 / 6x6)."""
    return jnp.linalg.solve(h, b)
