"""Device-mesh construction and common shardings.

The mesh layout convention: the fast ICI interconnect carries the
feature/landmark data axis; an optional slower DCN axis (multi-host) is a
pure outer data axis. Tests exercise these meshes on 8 virtual CPU
devices (tests/conftest.py)."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: dict | None = None, devices=None) -> Mesh:
    """Build a mesh from {axis_name: size}.

    Default: all devices on one ``data`` axis. A -1 size is inferred from
    the device count (at most one -1)."""
    devices = list(devices if devices is not None else jax.devices())
    if not shape:
        shape = {"data": len(devices)}
    names = tuple(shape.keys())
    sizes = list(shape.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = len(devices) // known
    total = int(np.prod(sizes))
    if total > len(devices):
        raise ValueError(f"mesh {dict(zip(names, sizes))} needs {total} "
                         f"devices, have {len(devices)}")
    arr = np.asarray(devices[:total]).reshape(sizes)
    return Mesh(arr, names)


def feature_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (feature/landmark) dimension over ``axis``; when
    the mesh has multiple axes they all shard the leading dim."""
    if len(mesh.axis_names) > 1:
        return NamedSharding(mesh, P(tuple(mesh.axis_names)))
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
