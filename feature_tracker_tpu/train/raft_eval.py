"""Optical-flow evaluation metrics for RAFT (and any dense-flow method).

Standard metrics from the RAFT evaluation protocol: average end-point
error (EPE) and outlier fractions (>1 / >3 / >5 px), plus the KITTI Fl
measure (>3 px AND >5% of the ground-truth magnitude). The reference has
no evaluation harness at all (SURVEY §4); this pairs with
train/raft_train.py to make training measurable.
"""

from __future__ import annotations

import jax.numpy as jnp


def endpoint_error(pred_flow, gt_flow, valid=None):
    """Per-pixel EPE ``[..., H, W]``; ``valid`` masks invalid gt."""
    epe = jnp.sqrt(jnp.sum((pred_flow - gt_flow) ** 2, axis=-1))
    if valid is not None:
        epe = jnp.where(valid, epe, 0.0)
    return epe


def flow_metrics(pred_flow, gt_flow, valid=None):
    """Summary metrics dict for ``[..., H, W, 2]`` flows.

    Returns epe (mean), px1/px3/px5 outlier fractions, and fl (KITTI
    outlier: >3 px and >5% of gt magnitude)."""
    epe = endpoint_error(pred_flow, gt_flow, valid)
    if valid is None:
        valid = jnp.ones(epe.shape, bool)
    count = jnp.maximum(jnp.sum(valid), 1)

    def frac(mask):
        return jnp.sum(mask & valid) / count

    mag = jnp.sqrt(jnp.sum(gt_flow ** 2, axis=-1))
    return {
        "epe": jnp.sum(epe) / count,
        "px1": frac(epe > 1.0),
        "px3": frac(epe > 3.0),
        "px5": frac(epe > 5.0),
        "fl": frac((epe > 3.0) & (epe > 0.05 * mag)),
    }


def evaluate_raft(model, variables, ref, cur, gt_flow, valid=None):
    """Run RAFT and report metrics on the FINAL prediction (the RAFT
    protocol evaluates the last refinement iteration)."""
    predictions = model.apply(variables, ref, cur)
    return flow_metrics(predictions[-1], gt_flow, valid)
