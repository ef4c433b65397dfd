"""Multi-host launcher for the landmark-sharded Schur BA.

This is the program a pod user actually runs — one copy per host — to
execute the distributed BA across a multi-host TPU slice (the reference
has no distributed story at all; SURVEY §2.2). The mesh layout puts the
slow DCN axis outermost so each host's landmark shard lives on its own
ICI domain and the only DCN traffic per GN iteration is the all-reduce
of the [6P, 6P] reduced camera system (parallel/mesh.py,
ba_comm_report; measured/validated in BASELINE.md "BA 2-host scaling
case").

Launch on a TPU pod slice (one command per host; TPU pods auto-discover
the coordinator from the environment):

    python scripts/multihost_ba.py --landmarks 262144 --iters 10

Launch on generic hosts (explicit coordinator):

    # host 0                     # host 1
    python scripts/multihost_ba.py \\
        --coordinator 10.0.0.1:8476 --num-processes 2 --process-id 0
    python scripts/multihost_ba.py \\
        --coordinator 10.0.0.1:8476 --num-processes 2 --process-id 1

CI-exercised single-host form (no jax.distributed; 8 virtual CPU
devices emulate the 2-host x 4-chip layout — tests/test_parallel.py):

    python scripts/multihost_ba.py --simulate-hosts 2

Every array is materialized host-locally and device_put with the
landmark sharding; jax.make_array_from_process_local_data would be the
drop-in for problems too large per host.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None,
                    help="coordinator address host:port (omit on TPU "
                         "pods: auto-discovered)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--simulate-hosts", type=int, default=0,
                    help="single-process CI form: emulate N hosts on "
                         "virtual CPU devices instead of "
                         "jax.distributed")
    ap.add_argument("--landmarks", type=int, default=65536)
    ap.add_argument("--obs", type=int, default=4)
    ap.add_argument("--poses", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args(argv)

    if args.simulate_hosts:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count="
            + str(4 * args.simulate_hosts)).strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
        num_hosts = args.simulate_hosts
    else:
        import jax
        if args.coordinator:
            jax.distributed.initialize(
                coordinator_address=args.coordinator,
                num_processes=args.num_processes,
                process_id=args.process_id)
        else:
            # TPU pod slices self-describe through the environment.
            jax.distributed.initialize()
        num_hosts = jax.process_count()

    import jax.numpy as jnp
    from feature_tracker_tpu.parallel.ba import (
        BaOptions,
        bundle_adjust,
        reprojection_rms,
    )
    from feature_tracker_tpu.parallel.mesh import (
        ba_comm_report,
        feature_sharding,
        make_multihost_mesh,
        replicated,
    )
    from feature_tracker_tpu.parallel.scaling import _make_problem

    mesh = make_multihost_mesh(max(num_hosts, 1))
    q, t, lm, idx, uv, mask, k4 = _make_problem(args.landmarks, args.obs,
                                                args.poses)
    sh = feature_sharding(mesh)
    rep = replicated(mesh)
    q = jax.device_put(jnp.asarray(q), rep)
    t = jax.device_put(jnp.asarray(t), rep)
    lm_d = jax.device_put(jnp.asarray(lm), sh)
    idx_d = jax.device_put(jnp.asarray(idx), sh)
    uv_d = jax.device_put(jnp.asarray(uv), sh)
    mask_d = jax.device_put(jnp.asarray(mask), sh)
    k4_d = jax.device_put(jnp.asarray(k4), rep)

    opts = BaOptions(max_iterations=args.iters, num_fixed_poses=2)
    t0 = time.perf_counter()
    new_q, new_t, new_lm, rms = bundle_adjust(
        q, t, lm_d, idx_d, uv_d, mask_d, k4_d, opts)
    jax.block_until_ready(rms)
    wall = time.perf_counter() - t0

    if jax.process_index() == 0:
        report = ba_comm_report(args.poses, args.landmarks, args.obs,
                                mesh)
        final = float(reprojection_rms(new_q, new_t, new_lm, idx_d, uv_d,
                                       mask_d, k4_d))
        print(json.dumps({
            "hosts": num_hosts, "devices": len(jax.devices()),
            "mesh": {n: int(s) for n, s in
                     zip(mesh.axis_names, mesh.devices.shape)},
            "landmarks": args.landmarks, "poses": args.poses,
            "iters": args.iters,
            "rms_initial": round(float(rms[0]), 4),
            "rms_final": round(final, 6),
            "wall_s": round(wall, 3),
            "comm": report}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
