"""RAFT bf16 vs f32: accuracy delta + on-chip speed + stage split.

VERDICT r3 item 6: benchmark RaftConfig(dtype=bfloat16) at 440x1024 with
an EPE delta vs f32 on the trained compact weights, and record an
encoder/lookup-GRU time split. The split uses the iteration-count probe:
timing the forward at iters=1 and iters=12 gives
  per-iteration (lookup + GRU + upsample) = (t12 - t1) / 11
  encoders + correlation init          ~= t1 - per_iteration
(BASELINE.md timing protocol: scalar checksum, device-side perturbation,
dispatch floor subtracted, one process per program family.)

Usage: python scripts/raft_bf16_eval.py [accuracy|speed]
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


def _time(step, floor_fn, iters=3, rounds=3):
    _ = float(step(0.0))
    _ = float(floor_fn(0.0))
    dt = fl = float("inf")
    for w in range(rounds):
        t0 = time.perf_counter()
        for i in range(iters):
            _ = float(step(0.01 * (w * iters + i + 1)))
        dt = min(dt, (time.perf_counter() - t0) / iters)
        t0 = time.perf_counter()
        for i in range(iters):
            _ = float(floor_fn(0.01 * (w * iters + i + 1)))
        fl = min(fl, (time.perf_counter() - t0) / iters)
    return max(dt - fl, 1e-9)


def compact_cfg(dtype, iters=6):
    import jax.numpy as jnp  # noqa: F401
    from feature_tracker_tpu.models.raft import RaftConfig

    return RaftConfig(max_iterations=iters, feature_channels=64,
                      context_channels=64, hidden_channels=32,
                      correlation_pyramid_levels=2, correlation_radius=3,
                      correlation_hidden_channels=32,
                      correlation_out_channels=16,
                      flow_hidden_channels=16, flow_out_channels=8,
                      motion_out_channels=16, mask_hidden_channels=32,
                      dtype=dtype)


def accuracy():
    """EPE of the trained compact weights at f32 vs bf16 compute, on the
    same held-out pool as weights/metrics.json's raft_small entry."""
    import jax
    import jax.numpy as jnp
    from feature_tracker_tpu.models.raft import Raft
    from feature_tracker_tpu.train.raft_eval import flow_metrics
    from feature_tracker_tpu.train.raft_pretrain import make_pool
    from feature_tracker_tpu.utils.weights import WEIGHTS_DIR, load_pytree

    h = w = 64
    batch = 4
    out = {}
    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        cfg = compact_cfg(dtype)
        model = Raft(cfg)
        like = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, h, w, 1)), jnp.zeros((1, h, w, 1)))
        variables = load_pytree(
            os.path.join(WEIGHTS_DIR, "raft_small.npz"), like)
        eval_rng = np.random.default_rng(1000)  # seed 0 + 1000, as in
        epool = make_pool(eval_rng, 4, h, w, batch,  # raft_pretrain main
                          augment=False)
        agg = None
        for ref, cur, gt in epool:
            preds = model.apply(variables, ref, cur)
            m = {k: float(v)
                 for k, v in flow_metrics(preds[-1].astype(jnp.float32),
                                          gt).items()}
            agg = m if agg is None else {k: agg[k] + m[k] for k in m}
        out[name] = {k: round(v / len(epool), 4) for k, v in agg.items()}
    out["epe_delta_bf16_minus_f32"] = round(
        out["bf16"]["epe"] - out["f32"]["epe"], 4)
    print(json.dumps({"raft_accuracy_64x64_compact_6it": out}), flush=True)


def speed():
    """440x1024 x 12 iters forward: f32 vs bf16, plus the stage split."""
    import jax
    import jax.numpy as jnp
    from feature_tracker_tpu.models.raft import Raft, RaftConfig

    h, w = 440, 1024
    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.uniform(0, 255, (1, h, w, 1)), jnp.float32)
    cur = jnp.asarray(rng.uniform(0, 255, (1, h, w, 1)), jnp.float32)
    results = {}
    for name, dtype, last_only in (("f32", jnp.float32, False),
                                   ("bf16", jnp.bfloat16, False),
                                   ("bf16_last_up", jnp.bfloat16, True)):
        times = {}
        for iters in (1, 12):
            cfg = RaftConfig(max_iterations=iters, low_memory=True,
                             dtype=dtype, upsample_last_only=last_only)
            model = Raft(cfg)
            variables = model.init(jax.random.PRNGKey(0),
                                   ref[:, :64, :64], cur[:, :64, :64])

            def run(s):
                flows = model.apply(variables, ref, cur + s)
                return jnp.sum(flows[-1].astype(jnp.float32))

            step = jax.jit(run)
            floor_fn = jax.jit(lambda s: jnp.sum(cur + s))
            times[iters] = _time(step, floor_fn)
        per_it = (times[12] - times[1]) / 11.0
        enc = times[1] - per_it
        results[name] = {
            "ms_12it": round(times[12] * 1e3, 2),
            "fps_12it": round(1.0 / times[12], 2),
            "per_iteration_ms": round(per_it * 1e3, 2),
            "encoders_plus_init_ms": round(enc * 1e3, 2),
        }
    results["speedup_bf16"] = round(
        results["f32"]["ms_12it"] / results["bf16"]["ms_12it"], 3)
    print(json.dumps({"raft_speed_1024x440": results}), flush=True)


def split():
    """Per-iteration cost split: Pallas correlation lookup vs the update
    block (MotionEncoder + SepConvGRU + flow/mask heads) — VERDICT r4
    item 3a. Each side runs as its own 12-step fori_loop/scan with a
    data-dependent carry (so XLA can neither hoist nor collapse the
    iterations), at the shipped inference dtype (bf16) and the bench
    resolution (440x1024 -> 55x128 at /8). Random features — the timing
    is shape/dtype-bound, not value-bound."""
    import jax
    import jax.numpy as jnp
    from feature_tracker_tpu.models.raft import (
        RaftConfig,
        UpdateBlock,
        pool_feature_pyramid,
    )
    from feature_tracker_tpu.ops.pallas_raft_lookup import (
        lookup_correlation_pallas_batched,
    )

    cfg = RaftConfig(low_memory=True, dtype=jnp.bfloat16,
                     upsample_last_only=True)
    h8, w8 = 440 // 8, 1024 // 8
    rng = np.random.default_rng(0)
    fmap0 = jnp.asarray(rng.normal(0, 1, (1, h8, w8, cfg.feature_channels)),
                        jnp.float32)
    fmap1 = jnp.asarray(rng.normal(0, 1, (1, h8, w8, cfg.feature_channels)),
                        jnp.float32)
    fpyr = pool_feature_pyramid(fmap1, cfg.correlation_pyramid_levels)
    gx, gy = jnp.meshgrid(jnp.arange(w8, dtype=jnp.float32),
                          jnp.arange(h8, dtype=jnp.float32))
    ref_locs = jnp.stack([gx, gy], -1)[None]
    n_corr = cfg.correlation_pyramid_levels * (
        2 * cfg.correlation_radius + 1) ** 2

    iters = 12

    def lookup_loop(s):
        def body(_, locs):
            corr = lookup_correlation_pallas_batched(
                fmap0, fpyr, locs, cfg.correlation_radius)
            return locs + 1e-6 * jnp.mean(corr)
        out = jax.lax.fori_loop(0, iters, body, ref_locs + s)
        return jnp.sum(out)

    update = UpdateBlock(cfg)
    net0 = jnp.asarray(rng.normal(0, 1, (1, h8, w8, cfg.hidden_channels)),
                       cfg.dtype)
    inp = jnp.asarray(rng.normal(0, 1, (1, h8, w8, cfg.context_channels)),
                      cfg.dtype)
    corr0 = jnp.asarray(rng.normal(0, 1, (1, h8, w8, n_corr)), cfg.dtype)
    flow0 = jnp.zeros((1, h8, w8, 2), cfg.dtype)
    variables = update.init(jax.random.PRNGKey(0), net0, inp, corr0, flow0)

    def update_loop(s):
        def body(carry, _):
            net, flow = carry
            # corr must depend on the carry or XLA hoists the whole
            # block out of the scan.
            corr = corr0 * (1.0 + 1e-20 * jnp.mean(net).astype(cfg.dtype))
            net, up_mask, delta = update.apply(variables, net, inp, corr,
                                               flow)
            return (net, flow + delta.astype(cfg.dtype)), jnp.sum(
                up_mask.astype(jnp.float32))
        (net, flow), masks = jax.lax.scan(
            body, (net0 + s.astype(cfg.dtype), flow0), None, length=iters)
        return jnp.sum(flow.astype(jnp.float32)) + jnp.sum(masks)

    floor_fn = jax.jit(lambda s: jnp.sum(ref_locs + s))
    t_lookup = _time(jax.jit(lookup_loop), floor_fn)
    t_update = _time(jax.jit(update_loop), floor_fn)
    out = {
        "resolution": "1024x440 (/8: 128x55)", "iterations": iters,
        "dtype": "bf16", "corr_channels": int(n_corr),
        "lookup_ms_per_iteration": round(t_lookup * 1e3 / iters, 3),
        "update_block_ms_per_iteration": round(t_update * 1e3 / iters, 3),
        "sum_ms_per_iteration": round((t_lookup + t_update) * 1e3 / iters,
                                      3),
        "note": ("each side isolated in its own 12-step loop with a "
                 "data-dependent carry; compare against the full model's "
                 "per-iteration 7.2 ms (bf16 + upsample_last_only, "
                 "BASELINE.md r4)"),
    }
    print(json.dumps({"raft_iteration_split": out}), flush=True)


def speed_sidecar():
    """The three 1024x440 timings the bench RAFT row cites from
    weights/metrics.json ``raft_speed``: shipped (bf16 +
    upsample_last_only) at K=12 and K=6, plus the f32 parity config at
    K=12. Split out of the bench because three 440x1024 RAFT compiles
    through the remote-compile tunnel blow the bench's slow-workload
    timeout (r5 full-run evidence); this runs once per weight/model
    revision."""
    import datetime

    import jax
    import jax.numpy as jnp
    from feature_tracker_tpu.models.raft import Raft, RaftConfig
    from feature_tracker_tpu.utils.weights import WEIGHTS_DIR

    h, w = 440, 1024
    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.uniform(0, 255, (1, h, w, 1)), jnp.float32)
    cur = jnp.asarray(rng.uniform(0, 255, (1, h, w, 1)), jnp.float32)

    def time_cfg(cfg):
        model = Raft(cfg)
        variables = model.init(jax.random.PRNGKey(0),
                               ref[:, :64, :64], cur[:, :64, :64])

        def run(s):
            flows = model.apply(variables, ref, cur + s)
            return jnp.sum(flows[-1].astype(jnp.float32))

        step = jax.jit(run)
        floor_fn = jax.jit(lambda s: jnp.sum(cur + s))
        return _time(step, floor_fn, iters=2, rounds=2)

    out = {"resolution": f"{w}x{h}",
           "updated": datetime.datetime.now(
               datetime.timezone.utc).isoformat(timespec="seconds")}
    for key, cfg in (
            ("shipped_k12", RaftConfig(max_iterations=12, low_memory=True,
                                       dtype=jnp.bfloat16,
                                       upsample_last_only=True)),
            ("shipped_k6", RaftConfig(max_iterations=6, low_memory=True,
                                      dtype=jnp.bfloat16,
                                      upsample_last_only=True)),
            ("parity_f32_k12", RaftConfig(max_iterations=12,
                                          low_memory=True))):
        dt = time_cfg(cfg)
        out[key] = {"ms": round(dt * 1e3, 2), "fps": round(1.0 / dt, 2)}
        print(json.dumps({key: out[key]}), flush=True)
    path = os.path.join(WEIGHTS_DIR, "metrics.json")
    with open(path) as fh:
        metrics = json.load(fh)
    metrics["raft_speed"] = out
    with open(path, "w") as fh:
        json.dump(metrics, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({"raft_speed": out}), flush=True)


def anytime():
    """Held-out EPE of the trained compact weights at K=6 (native) vs
    K=12 (extrapolated) iterations — the anytime knob the bench row
    ships (VERDICT r4 item 3b). Writes weights/metrics.json
    ``raft_anytime``."""
    import jax
    import jax.numpy as jnp
    from feature_tracker_tpu.models.raft import Raft
    from feature_tracker_tpu.train.raft_eval import flow_metrics
    from feature_tracker_tpu.train.raft_pretrain import make_pool
    from feature_tracker_tpu.utils.weights import WEIGHTS_DIR, load_pytree

    h = w = 64
    batch = 4
    out = {"resolution": f"{h}x{w}", "pairs": 16,
           "weights": "raft_small.npz (trained at 6 iterations)"}
    for iters in (6, 12):
        cfg = compact_cfg(jnp.float32, iters=iters)
        model = Raft(cfg)
        like = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, h, w, 1)), jnp.zeros((1, h, w, 1)))
        variables = load_pytree(
            os.path.join(WEIGHTS_DIR, "raft_small.npz"), like)
        epool = make_pool(np.random.default_rng(1000), 4, h, w, batch,
                          augment=False)
        agg = zf = 0.0
        for ref, cur, gt in epool:
            preds = model.apply(variables, ref, cur)
            agg += float(flow_metrics(preds[-1].astype(jnp.float32),
                                      gt)["epe"])
            zf += float(flow_metrics(jnp.zeros_like(gt), gt)["epe"])
        out[f"epe_k{iters}"] = round(agg / len(epool), 4)
        out["zero_flow_epe"] = round(zf / len(epool), 4)
    path = os.path.join(WEIGHTS_DIR, "metrics.json")
    with open(path) as fh:
        metrics = json.load(fh)
    metrics["raft_anytime"] = out
    with open(path, "w") as fh:
        json.dump(metrics, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({"raft_anytime": out}), flush=True)


if __name__ == "__main__":
    {"accuracy": accuracy, "speed": speed, "speed_sidecar": speed_sidecar,
     "split": split, "anytime": anytime}[sys.argv[1]]()
