"""Flat-pytree weight persistence (.npz) for the neural models.

The reference ships pretrained ONNX blobs; this framework's equivalents
are produced by ``python -m feature_tracker_tpu.train.pretrain`` and
stored under ``weights/`` at the repo root. ``load_pytree`` restores into
an existing pytree's structure (leaf order is the flatten order, which is
deterministic for a given model definition).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

WEIGHTS_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "weights")


def save_pytree(path: str, tree) -> None:
    flat, treedef = jax.tree_util.tree_flatten(tree)
    np.savez_compressed(path, treedef=np.frombuffer(
        repr(treedef).encode(), dtype=np.uint8),
        **{f"a{i}": np.asarray(x) for i, x in enumerate(flat)})


def load_pytree(path: str, like):
    """Load a flattened pytree using ``like``'s structure.

    Every loaded leaf is validated against the corresponding leaf of
    ``like`` (shape and dtype) so an architecture-mismatched or stale
    weights file fails loudly here, with the leaf path, instead of
    misbehaving later at apply time."""
    data = np.load(path)
    flat_like, treedef = jax.tree_util.tree_flatten(like)
    paths = [jax.tree_util.keystr(kp) for kp, _ in
             jax.tree_util.tree_flatten_with_path(like)[0]]
    flat = []
    for i, ref_leaf in enumerate(flat_like):
        key = f"a{i}"
        if key not in data:
            raise ValueError(
                f"{path}: missing leaf {paths[i]} (expected "
                f"{len(flat_like)} leaves, file has fewer)")
        arr = data[key]
        ref_shape = tuple(np.shape(ref_leaf))
        ref_dtype = np.asarray(ref_leaf).dtype
        if tuple(arr.shape) != ref_shape or arr.dtype != ref_dtype:
            raise ValueError(
                f"{path}: leaf {paths[i]} has shape {tuple(arr.shape)} "
                f"dtype {arr.dtype}, model expects {ref_shape} "
                f"{ref_dtype}")
        flat.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, flat)


def weights_path(name: str) -> str:
    return os.path.join(WEIGHTS_DIR, name)


def has_weights(name: str) -> bool:
    return os.path.exists(weights_path(name))
