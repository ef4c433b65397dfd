"""Multi-pair KLT launch experiment (VERDICT r4 item 2).

The last untried structural axis for the >=10x-per-chip north star
(BASELINE.json): ONE kernel launch tracking K independent frame pairs —
the multi-camera / multi-sequence front-end shape — so per-launch setup
and dispatch amortize over K x the useful output.

Formulation: the K pairs' pyramids are stacked VERTICALLY into one
composite pyramid per side (a zero GAP band between pairs, halved per
level so per-pair row offsets stay exact integers at every level), and
each pair's features are offset into its band. The existing
whole-pyramid kernel then tracks all K*N features in one launch,
unchanged. Features stay >= 20 px inside their bands so the gap never
enters a patch; aggregate throughput is compared against K sequential
kernel launches of the same per-pair workload inside one jit.

Timing protocol: each formulation runs as ONE jitted fori_loop chain of
``inner`` data-dependent evaluations (the bench's chained-dispatch
guard, applied unconditionally — exactly two compiled programs for the
whole experiment). Correctness cross-checks against the native CPU port
(klt_fast_cpu), costing no extra TPU programs.

VMEM bounds K: the kernel keeps both composite pyramids resident
(~12 MB at K=2, 376x512 — the same footprint as the 1241x376 stream
workload). K=2 is the measurable point on this v5e.

Usage: python scripts/klt_multipair.py [K] [H] [W] [N_per_pair]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def _enable_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


_enable_cache()


def load_pairs(k, h, w):
    """K distinct (ref, cur) crops from the reference demo pair (distinct
    row/col origins per pair; synthetic fallback)."""
    try:
        from PIL import Image
        base = "/root/reference/example/optical_flow/"
        ref = np.asarray(Image.open(base + "ref_image.png").convert("L"),
                         np.float32)
        cur = np.asarray(Image.open(base + "cur_image.png").convert("L"),
                         np.float32)
    except Exception:
        from tests.synthetic import translated_pair
        ref, cur = translated_pair(h=480, w=752, shift=(7.0, -4.0))
    rng = np.random.default_rng(0)
    pairs = []
    for i in range(k):
        r0 = int(rng.integers(0, ref.shape[0] - h + 1))
        c0 = int(rng.integers(0, ref.shape[1] - w + 1))
        pairs.append((ref[r0:r0 + h, c0:c0 + w].copy(),
                      cur[r0:r0 + h, c0:c0 + w].copy()))
    return pairs


def main():
    import jax
    import jax.numpy as jnp
    from feature_tracker_tpu.core.config import KltOptions
    from feature_tracker_tpu.ops.pallas_klt import track_pyramid_fast_pallas
    from feature_tracker_tpu.ops.pyramid import build_pyramid

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 320
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    n = int(sys.argv[4]) if len(sys.argv) > 4 else 5120
    # gap >= (ex_patch + 1) * 2^(levels-1) (trackers/klt/multi.py): the
    # coarsest-level gap must cover one extended patch.
    levels, gap, inner = 4, 128, 8
    assert h % (1 << (levels - 1)) == 0 and gap % (1 << (levels - 1)) == 0

    pairs = load_pairs(k, h, w)
    rng = np.random.default_rng(1)
    uv = np.stack([rng.uniform(20, w - 20, (k, n)),
                   rng.uniform(20, h - 20, (k, n))],
                  -1).astype(np.float32)  # [K, N, 2]
    opts = KltOptions(max_track_points=n)
    opts_big = KltOptions(max_track_points=k * n)

    ref_pyrs = [build_pyramid(jnp.asarray(r), levels) for r, _ in pairs]
    cur_pyrs = [build_pyramid(jnp.asarray(c), levels) for _, c in pairs]

    # Composite pyramids: per level, stack the K pairs' levels with a
    # gap/2^l zero band after each (assembled from the per-pair levels,
    # so band contents are bit-identical to the per-pair pyramids).
    comp_ref, comp_cur = [], []
    for lvl in range(levels):
        gl = gap >> lvl
        wl = ref_pyrs[0][lvl].shape[1]
        z = jnp.zeros((gl, wl), jnp.float32)
        comp_ref.append(jnp.concatenate(
            [jnp.concatenate([p[lvl], z], 0) for p in ref_pyrs], 0))
        comp_cur.append(jnp.concatenate(
            [jnp.concatenate([p[lvl], z], 0) for p in cur_pyrs], 0))
    band = h + gap
    uv_comp = uv.copy()
    uv_comp[..., 1] += band * np.arange(k, dtype=np.float32)[:, None]
    uv_comp = jnp.asarray(uv_comp.reshape(k * n, 2))
    uv_dev = jnp.asarray(uv)
    ref_tuple, cur_tuple = tuple(comp_ref), tuple(comp_cur)

    def run_composite(s):
        cuv, st = track_pyramid_fast_pallas(
            opts_big, ref_tuple, cur_tuple, uv_comp + s, uv_comp + s)
        return (jnp.sum(cuv) * 1e-20
                + jnp.sum(st.astype(jnp.float32)) * 1e-20)

    def run_sequential(s):
        tot = jnp.float32(0.0)
        for i in range(k):
            cuv, st = track_pyramid_fast_pallas(
                opts, tuple(ref_pyrs[i]), tuple(cur_pyrs[i]),
                uv_dev[i] + s, uv_dev[i] + s)
            tot = tot + jnp.sum(cuv) + jnp.sum(st.astype(jnp.float32))
        return tot * 1e-20

    def chained(run):
        def fn(s):
            def body(i, c):
                return (run(c + 0.01 * (i + 1)) + c).astype(jnp.float32)
            return jax.lax.fori_loop(0, inner, body, jnp.float32(s))
        return jax.jit(fn)

    def best(fn, rounds=3, iters=3):
        b = float("inf")
        for r in range(rounds):
            t0 = time.perf_counter()
            for i in range(iters):
                _ = float(fn(0.01 * (r * iters + i + 1)))
            b = min(b, (time.perf_counter() - t0) / iters)
        return b

    floor_fn = jax.jit(lambda s: jnp.sum(uv_comp + s))
    cstep = chained(run_composite)
    sstep = chained(run_sequential)
    print("[multipair] compiling composite chain...", flush=True)
    _ = float(cstep(0.0))
    print("[multipair] compiling sequential chain...", flush=True)
    _ = float(sstep(0.0))
    _ = float(floor_fn(0.0))
    floor = best(floor_fn)
    dt_comp = max((best(cstep) - floor) / inner, 1e-9)
    dt_seq = max((best(sstep) - floor) / inner, 1e-9)

    # Correctness + CPU baseline: the native port per pair (no extra TPU
    # programs; the compiled kernel's status parity with this port is
    # test-pinned at the reference config).
    cuv_c, st_c = track_pyramid_fast_pallas(opts_big, ref_tuple, cur_tuple,
                                            uv_comp, uv_comp)
    cuv_c = np.array(cuv_c).reshape(k, n, 2)
    cuv_c[..., 1] -= band * np.arange(k, dtype=np.float32)[:, None]
    st_c = np.array(st_c).reshape(k, n)
    tracked_c = int((st_c == 1).sum())
    mismatch, maxd, cpu_dt = -1, -1.0, -1.0
    try:
        from feature_tracker_tpu.runtime.cpu_baseline import klt_fast_cpu
        rp_np = [[np.asarray(l) for l in p] for p in ref_pyrs]
        cp_np = [[np.asarray(l) for l in p] for p in cur_pyrs]
        mismatch, maxd, cpu_dt = 0, 0.0, float("inf")
        for rep in range(2):
            t0 = time.perf_counter()
            outs = [klt_fast_cpu(rp_np[i], cp_np[i], np.asarray(uv[i]),
                                 opts=opts) for i in range(k)]
            cpu_dt = min(cpu_dt, time.perf_counter() - t0)
        for i, (cpu_uv, cpu_st) in enumerate(outs):
            mismatch += int((cpu_st != st_c[i]).sum())
            both = (cpu_st == 1) & (st_c[i] == 1)
            if both.any():
                maxd = max(maxd, float(np.abs(cpu_uv[both]
                                              - cuv_c[i][both]).max()))
    except Exception as e:
        print(f"[multipair] CPU port unavailable: {e}", flush=True)

    total = k * n
    out = {
        "k_pairs": k, "resolution": f"{w}x{h}", "n_per_pair": n,
        "tracked_composite": tracked_c,
        "status_mismatch_vs_cpu": mismatch,
        "max_pos_diff_vs_cpu_px": round(maxd, 4),
        "composite_ms": round(dt_comp * 1e3, 3),
        "sequential_ms": round(dt_seq * 1e3, 3),
        "composite_feats_per_s": round(total / dt_comp, 1),
        "sequential_feats_per_s": round(total / dt_seq, 1),
        "launch_amortization": round(dt_seq / dt_comp, 4),
        "cpu_ms": round(cpu_dt * 1e3, 3),
        "vs_cpu_composite": round(cpu_dt / dt_comp, 3) if cpu_dt > 0
        else -1.0,
        "floor_ms": round(floor * 1e3, 3), "inner_chain": inner,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
