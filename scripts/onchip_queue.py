"""One-shot on-chip measurement queue (PERF.md "Pending on-chip
measurements"): run the moment a TPU is reachable, prints one JSON
decision block.

  1. sorted segment-max cost at the serving pool shape (the Pallas
     kernel this once decided between was removed in round 3 after
     losing 10.6 vs 4.6 ms — PERF.md graveyard note; the XLA scatter
     route is now the only one).
  2. NMS default — 'classfix' (exact per-class) vs 'fixpoint' serving
     throughput on the bench workload; decides Config.nms_algorithm.
  3. fused message kernel at D=4 bf16 — Pallas vs XLA fusion on the
     bf16 fast-serving path; decides eval/predict's bf16 pallas auto-route.

Measurement hygiene (PERF.md): every microbenchmark is one on-device
lax.scan chain with the carry threaded into the inputs (XLA hoists
carry-independent bodies), timed with a HOST FETCH as the completion
barrier (block_until_ready can return early through the axon tunnel).

Usage: python scripts/onchip_queue.py  [--quick]
After it prints, apply the decisions it names and re-run bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_time(fn, args, n_iters=30):
    """Time fn as one carry-threaded on-device scan chain; returns
    sec/iter. fn: (carry_scalar, *args) -> array (any shape)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(args):
        def body(acc, _):
            out = fn(acc, *args)
            return jnp.float32(out.reshape(-1)[0]), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n_iters)
        return acc

    np.asarray(run(args))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(run(args))
    return (time.perf_counter() - t0) / n_iters


def measure_segment_max(n_rows=131072, n_cols=1152, avg_seg=32, seed=0,
                        n_iters=30):
    """Serving pool shape: [131k, 1152] bf16 sorted segment-max."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    # SESYD-like segment sizes around avg_seg, sorted ids
    sizes = np.maximum(1, rng.poisson(avg_seg, size=2 * n_rows // avg_seg))
    ids = np.repeat(np.arange(len(sizes)), sizes)[:n_rows]
    num_segments = int(ids.max()) + 1
    data = jnp.asarray(rng.standard_normal((n_rows, n_cols)), jnp.bfloat16)
    ids_j = jnp.asarray(ids, jnp.int32)
    mask = jnp.ones(n_rows, bool)

    def xla_route(acc, data, ids_j, mask):
        d = data + acc.astype(data.dtype) * 1e-30
        masked = jnp.where(mask[:, None], d, jnp.asarray(-jnp.inf, d.dtype))
        return jax.ops.segment_max(masked, ids_j,
                                   num_segments=num_segments,
                                   indices_are_sorted=True)

    t_xla = chain_time(xla_route, (data, ids_j, mask), n_iters)

    # The sorted-max Pallas kernel this once A/B'd against was removed in
    # round 3 after measuring 10.6 ms (flat) / 11.3 ms (two-level) vs the
    # XLA scatter's 4.6 ms on the current toolchain (PERF.md graveyard
    # note). This measurement now just tracks the XLA route's cost.
    return {"xla_ms": round(t_xla * 1e3, 3), "kernel_ms": None,
            "decision": "XLA scatter route (sorted-max kernel removed r3)"}


def measure_serving(quick=False):
    """NMS default + bf16 fused-kernel routing on the bench workload."""
    import jax

    import bench
    from yolat_tpu.eval.fast_forward import fold_params
    from yolat_tpu.train.config import Config
    from yolat_tpu.train.loop import create_state
    from yolat_tpu.train.optim import make_optimizer

    ds, batches, _ = bench.build_workload()
    cfg = Config(n_classes=ds.n_classes, data_aug=False)
    tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
    single = {k: v[0] for k, v in batches[0].items()}
    state = create_state(cfg, tx, single, jax.random.key(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    folded = fold_params(variables, n_blocks=cfg.n_blocks)
    dev = jax.devices()[0]
    iters = 2 if quick else 8

    rate_fix = bench.time_predict(cfg, variables, batches, dev, iters=iters,
                                  fast=True, folded=folded, bf16=True)
    cfg_cf = cfg.replace(nms_algorithm="classfix")
    rate_cf = bench.time_predict(cfg_cf, variables, batches, dev,
                                 iters=iters, fast=True, folded=folded,
                                 bf16=True)
    # fused Pallas message kernel at D=4 bf16 vs the XLA fusion
    try:
        rate_pallas = bench.time_predict(cfg, variables, batches, dev,
                                         iters=iters, fast=True,
                                         folded=folded, bf16=True,
                                         pallas=True)
        pallas_err = None
    except Exception as e:
        rate_pallas, pallas_err = None, f"{type(e).__name__}: {e}"

    out = {
        "fixpoint_img_s": round(rate_fix, 2),
        "classfix_img_s": round(rate_cf, 2),
        "nms_decision": ("make 'classfix' the eval default"
                         if rate_cf >= rate_fix * 0.98
                         else "keep 'fixpoint' default"),
        "bf16_xla_img_s": round(rate_fix, 2),
        "bf16_pallas_img_s": (round(rate_pallas, 2)
                              if rate_pallas is not None else None),
    }
    if pallas_err:
        out["pallas_error"] = pallas_err
        out["fused_kernel_decision"] = "keep XLA route for bf16"
    else:
        out["fused_kernel_decision"] = (
            "route bf16 fast serving through the fused kernel"
            if rate_pallas > rate_fix * 1.05
            else "keep XLA route for bf16 (kernel did not clearly win)")
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--skip-probe", action="store_true")
    args = p.parse_args()

    from yolat_tpu.cli.common import apply_platform_env

    apply_platform_env()  # honor JAX_PLATFORMS in-process (axon plugin)

    import __graft_entry__ as ge

    if not args.skip_probe and not ge.backend_is_reachable():
        print(json.dumps({"error": "accelerator backend unreachable"}))
        return 2

    import jax

    backend = jax.default_backend()
    result = {"backend": backend, "device": str(jax.devices()[0])}
    if backend != "tpu":
        result["warning"] = ("not a TPU backend — decisions below do not "
                             "apply to the TPU defaults")
    result["segment_max"] = measure_segment_max(
        n_rows=8192 if args.quick else 131072,
        n_iters=5 if args.quick else 30)
    result["serving"] = measure_serving(quick=args.quick)
    result["also_run"] = [
        "python bench.py  (record fresh rates in PERF.md)",
        "python scripts/validate_training.py --epochs 200 --eval_start 120"
        " --step 10 --batch_size 4 --n_train 12 --n_test 4 --width 1200"
        " --height 900 --n_rooms 4 --arch yolat_pp  (TPU re-gate)",
    ]
    print(json.dumps(result, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
