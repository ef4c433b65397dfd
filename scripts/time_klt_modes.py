"""On-chip timing of the basic-KLT Pallas kernels.

Usage: python scripts/time_klt_modes.py <mode> <batch>
``mode`` is a fast-kernel bias mode (identity/qpf/qdt/qdtv/slow) or an
iterative solver mode (``direct``/``inverse`` — the per-iteration
H/b-rebuild kernel). Prints one JSON line {mode, batch, ms, tracked}.
Follows the BASELINE.md protocol: scalar-checksum output, device-side
input perturbation, measured dispatch floor subtracted, own process per
program.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    mode, batch = sys.argv[1], int(sys.argv[2])
    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from feature_tracker_tpu.core.config import KltOptions
    from feature_tracker_tpu.ops.pyramid import build_pyramid
    from feature_tracker_tpu.ops.pallas_klt import track_pyramid_fast_pallas
    from PIL import Image

    ref = np.asarray(Image.open(
        "/root/reference/example/optical_flow/ref_image.png").convert("L"),
        np.float32)
    cur = np.asarray(Image.open(
        "/root/reference/example/optical_flow/cur_image.png").convert("L"),
        np.float32)
    n = 10240
    rng = np.random.default_rng(0)
    uv = np.stack([rng.uniform(20, ref.shape[1] - 20, n),
                   rng.uniform(20, ref.shape[0] - 20, n)],
                  -1).astype(np.float32)
    ref_pyr = tuple(build_pyramid(jnp.asarray(ref), 4))
    cur_pyr = tuple(build_pyramid(jnp.asarray(cur), 4))
    opts = KltOptions(max_track_points=n)
    uv_dev = jnp.asarray(uv)

    if mode in ("direct", "inverse"):
        from feature_tracker_tpu.core.config import KltMethod
        from feature_tracker_tpu.ops.pallas_klt import (
            track_pyramid_iter_pallas,
        )
        opts = KltOptions(max_track_points=n,
                          method=(KltMethod.DIRECT if mode == "direct"
                                  else KltMethod.INVERSE))
        st0 = jnp.zeros(n, jnp.int8)

        def track(uvp):
            return track_pyramid_iter_pallas(opts, ref_pyr, cur_pyr, uvp,
                                             uvp, st0, batch=batch)
    else:
        def track(uvp):
            return track_pyramid_fast_pallas(opts, ref_pyr, cur_pyr, uvp,
                                             uvp, bias_mode=mode,
                                             batch=batch)

    def run(s):
        uvp = uv_dev + s
        out_uv, st = track(uvp)
        return jnp.sum(out_uv) + jnp.sum(st.astype(jnp.int32))

    step = jax.jit(run)
    floor = jax.jit(lambda s: jnp.sum(uv_dev + s))

    out_uv, st = track(uv_dev)
    tracked = int((np.asarray(st) == 1).sum())

    _ = float(step(0.0)); _ = float(floor(0.0))
    dt = fl = float("inf")
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(5):
            _ = float(step(0.01 * (w * 5 + i + 1)))
        dt = min(dt, (time.perf_counter() - t0) / 5)
        t0 = time.perf_counter()
        for i in range(5):
            _ = float(floor(0.01 * (w * 5 + i + 1)))
        fl = min(fl, (time.perf_counter() - t0) / 5)
    print(json.dumps({"mode": mode, "batch": batch,
                      "ms": round((dt - fl) * 1e3, 3),
                      "tracked": tracked}), flush=True)


if __name__ == "__main__":
    main()
