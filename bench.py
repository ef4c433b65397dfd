"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: tracked features/s/chip for the flagship batched pyramidal
basic-KLT (fast mode) at scale, on the reference demo geometry (752x480,
4-level pyramid, half-patch 6). The reference publishes no numbers
(BASELINE.md); vs_baseline is measured against BASELINE_FEATURES_PER_S, an
estimate of the single-thread Eigen fast-KLT path (~300 features in ~2 ms),
to be replaced by a real measurement if the reference toolchain becomes
buildable.
"""
import json
import sys
import time

import numpy as np

BASELINE_FEATURES_PER_S = 150_000.0  # estimated Eigen CPU baseline


def main():
    import jax.numpy as jnp
    from feature_tracker_tpu.core.config import KltOptions
    from feature_tracker_tpu.ops.pyramid import build_pyramid
    from feature_tracker_tpu.trackers.klt import BasicKlt

    # Reference-geometry images (use the mounted pair when present so the
    # workload matches the reference demo; otherwise a synthetic texture).
    try:
        from PIL import Image
        ref = np.asarray(Image.open(
            "/root/reference/example/optical_flow/ref_image.png").convert("L"),
            np.float32)
        cur = np.asarray(Image.open(
            "/root/reference/example/optical_flow/cur_image.png").convert("L"),
            np.float32)
    except Exception:
        sys.path.insert(0, "tests")
        from synthetic import translated_pair
        ref, cur = translated_pair(h=480, w=752, shift=(7.0, -4.0))

    n = 10240  # tracks at scale; reference demo uses 300
    rng = np.random.default_rng(0)
    uv = np.stack([rng.uniform(20, ref.shape[1] - 20, n),
                   rng.uniform(20, ref.shape[0] - 20, n)], -1).astype(np.float32)

    ref_pyr = build_pyramid(jnp.asarray(ref), 4)
    cur_pyr = build_pyramid(jnp.asarray(cur), 4)
    tracker = BasicKlt(KltOptions(max_track_points=n))

    import jax

    cur_uv, status = tracker.track(ref_pyr, cur_pyr, uv)  # for `tracked`
    tracked = int((np.asarray(status) == 1).sum())

    # Compute-only protocol (see BASELINE.md): on the axon tunnel,
    # block_until_ready can return before execution completes and
    # identical program+input runs are memoized, so the timed call
    # perturbs its input ON DEVICE (fresh execution, no host upload) and
    # returns a scalar checksum (forces full compute, avoids paying the
    # ~50 MB/s tunnel for bulk outputs). The measured ~29 ms round-trip
    # floor is subtracted to estimate on-chip time.
    uv_dev = jnp.asarray(uv)
    step = jax.jit(lambda p, s: jnp.sum(
        tracker.track(ref_pyr, cur_pyr, p + s)[0]))
    floor_fn = jax.jit(lambda s: jnp.sum(uv_dev + s))
    _ = float(step(uv_dev, 0.0))
    _ = float(floor_fn(0.0))

    iters = 5
    dt = float("inf")
    floor = float("inf")
    for w_i in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            _ = float(step(uv_dev, 0.01 * (w_i * iters + i + 1)))
        dt = min(dt, (time.perf_counter() - t0) / iters)
        t0 = time.perf_counter()
        for i in range(iters):
            _ = float(floor_fn(0.01 * (w_i * iters + i + 1)))
        floor = min(floor, (time.perf_counter() - t0) / iters)
    dt = max(dt - floor, 1e-6)
    feats_per_s = n / dt
    print(json.dumps({
        "metric": "klt_tracked_features_per_s_per_chip",
        "value": round(feats_per_s, 1),
        "unit": "features/s",
        "vs_baseline": round(feats_per_s / BASELINE_FEATURES_PER_S, 3),
        "extra": {"n_features": n, "tracked": tracked,
                  "ms_per_call": round(dt * 1e3, 3)},
    }))


if __name__ == "__main__":
    main()
