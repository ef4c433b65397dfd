"""Device-mesh construction and common shardings.

The mesh layout convention: the fast ICI interconnect carries the
feature/landmark data axis; the slower DCN axis (multi-host) is the
OUTER axis of the same shard dimension (``make_multihost_mesh``), so
shards are host-major and per-iteration collectives cross DCN exactly
once (see ``ba_comm_report``). Tests exercise these meshes on 8 virtual
CPU devices (tests/conftest.py)."""

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


def make_multihost_mesh(num_hosts: int, devices=None) -> Mesh:
    """("dcn", "ici") mesh: the slow inter-host axis OUTERMOST so that
    the landmark/feature shard axis groups devices host-major — each
    host's shard lives on its own ICI domain and the only DCN traffic is
    the psum of the reduced camera system (see parallel/ba.py and
    ba_comm_report). On a real multi-host slice the devices argument
    comes from jax.devices() after jax.distributed.initialize(); here the
    same layout is exercised on virtual CPU devices (tests/conftest.py)
    and by __graft_entry__.dryrun_multichip."""
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) % num_hosts:
        raise ValueError(f"{len(devices)} devices not divisible by "
                         f"{num_hosts} hosts")
    return make_mesh({"dcn": num_hosts, "ici": -1}, devices)


def ba_comm_report(num_poses: int, num_landmarks: int, obs_per_landmark: int,
                   mesh: Mesh) -> dict:
    """Per-GN-iteration communication vs compute estimate for the
    landmark-sharded Schur BA (the ≥80% 2-host scaling-efficiency
    groundwork; BASELINE.md). The only cross-device traffic is the
    all-reduce of the reduced camera system: (6P)^2 + 6P floats. Compute
    is dominated by per-landmark Schur elimination: ~O(o^2*36 + o*180)
    flops per landmark on the shard."""
    p, l, o = num_poses, num_landmarks, obs_per_landmark
    n_dev = int(np.prod(mesh.devices.shape))
    psum_bytes = 4 * ((6 * p) ** 2 + 6 * p)
    flops_per_lm = 36 * o * o + 400 * o  # Schur outer blocks + jacobians
    shard_flops = (l + n_dev - 1) // n_dev * flops_per_lm
    # DCN all-reduce moves the payload across the host boundary once per
    # direction (ring over the dcn axis); ICI handles the intra-host
    # stage at ~10x the bandwidth.
    dcn = dict(zip(mesh.axis_names, mesh.devices.shape)).get("dcn", 1)
    dcn_bytes = psum_bytes * max(dcn - 1, 0) * 2
    return {"psum_bytes": psum_bytes, "dcn_bytes_per_iter": dcn_bytes,
            "shard_flops_per_iter": shard_flops,
            "flops_per_dcn_byte": shard_flops / max(dcn_bytes, 1)}


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
