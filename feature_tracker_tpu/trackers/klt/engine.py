"""Shared Gauss-Newton iteration scaffold for the sparse LK trackers.

The reference iterates each feature independently with early breaks
(reference: basic_klt_fast.cpp:29-61). On TPU all lanes run the fixed
``max_iterations`` with a done-mask carried through ``lax.fori_loop`` — the
break/convergence/divergence semantics are replicated exactly so status
codes match:

fast mode (divergence counter on, reference: basic_klt_fast.cpp:33-60):
  1. no valid pixel in the step -> break, state & status unchanged
  2. NaN step               -> NUMERIC_ERROR, break, state unchanged
  3. state <- updated state
  4. step didn't shrink kMaxToleranceLargeStep consecutive times -> break
     (state already updated, status unchanged — stays LARGE_RESIDUAL)
  5. squared step < kMaxConvergeStep -> TRACKED, break
     (checked after divergence: a diverging final step never marks TRACKED)

direct/inverse mode (reference: basic_klt.cpp:88-116): same minus the
divergence counter, plus an optional per-step break status computed on the
updated state (e.g. OUTSIDE when the feature leaves the image)."""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from feature_tracker_tpu.core.config import KltOptions
from feature_tracker_tpu.core.status import TrackStatus


class StepResult(NamedTuple):
    """Output of one Gauss-Newton step for a single feature."""

    num_valid: jnp.ndarray      # int32: valid pixels used by this step
    v: jnp.ndarray              # the step vector driving convergence checks
    new_state: object           # candidate updated state pytree
    break_status: jnp.ndarray   # int8: 0 = none; else status to set & break


NO_BREAK = jnp.int8(0)


def _tree_select(pred, on_true, on_false):
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(pred, a, b), on_true, on_false)


def run_klt_iterations(
    step_fn: Callable[[object], StepResult],
    state0,
    status0,
    done0,
    opts: KltOptions,
    divergence_counter: bool,
):
    """Run the per-feature GN loop; returns (final_state, final_status)."""

    def body(_, carry):
        state, status, last_sq, cnt, done = carry
        res = step_fn(state)
        no_valid = res.num_valid == 0
        isnan = jnp.any(jnp.isnan(res.v))
        sq = jnp.sum(res.v * res.v)

        do_update = jnp.logical_not(done | no_valid | isnan)
        state = _tree_select(do_update, res.new_state, state)

        if divergence_counter:
            shrink = sq < last_sq
            new_last = jnp.where(shrink, sq, last_sq)
            new_cnt = jnp.where(shrink, 0, cnt + 1)
            last_sq = jnp.where(do_update, new_last, last_sq)
            cnt = jnp.where(do_update, new_cnt, cnt)
            diverged = do_update & (cnt >= opts.max_tolerance_large_step)
        else:
            diverged = jnp.asarray(False)

        extra_break = do_update & (res.break_status != NO_BREAK)
        converged = (do_update & (sq < opts.max_converge_step)
                     & jnp.logical_not(diverged) & jnp.logical_not(extra_break))

        new_status = jnp.where(
            isnan & jnp.logical_not(done | no_valid),
            jnp.int8(int(TrackStatus.NUMERIC_ERROR)),
            jnp.where(extra_break, res.break_status,
                      jnp.where(converged, jnp.int8(int(TrackStatus.TRACKED)),
                                status)))
        status = jnp.where(done, status, new_status)
        done = done | no_valid | isnan | diverged | converged | extra_break
        return state, status, last_sq, cnt, done

    carry0 = (state0, jnp.asarray(status0, dtype=jnp.int8),
              jnp.asarray(jnp.inf, dtype=jnp.float32), jnp.asarray(0, jnp.int32),
              jnp.asarray(done0))
    state, status, _, _, _ = jax.lax.fori_loop(
        0, opts.max_iterations, body, carry0)
    return state, status


def final_outside_check(uv, status, image_shape):
    """Mark features whose final position left the full-resolution image
    (reference: basic_klt.cpp:47-53): bounds are cols-1 / rows-1."""
    h, w = image_shape
    x = uv[..., 0]
    y = uv[..., 1]
    outside = (x < 0) | (x > w - 1) | (y < 0) | (y > h - 1)
    return jnp.where(outside, jnp.int8(int(TrackStatus.OUTSIDE)), status)
