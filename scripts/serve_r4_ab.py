"""Round-4 serving A/Bs on the real bench workload (scan-chain timing):

  1. canonical fast_bf16: img_slots=None (pre-round-4 [B, P] NMS layout)
     vs the exact per-image cap (eval/runner.img_slot_cap) — the NMS
     conf+top_k work shrinks ~batch_size x, detections identical.
  2. YOLaT++ fast_bf16: per-edge prim level (ragged banded kernel route)
     vs the factored (v2) prefix-sum level (cfg.pp_factored_prim
     checkpoint layout) — both with the capped NMS layout.

Usage: python scripts/serve_r4_ab.py [--iters N]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=48)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_workload
    from yolat_tpu.eval.fast_forward import extra_plans_for, fold_params_for
    from yolat_tpu.eval.predict import make_predict_core
    from yolat_tpu.eval.runner import img_slot_cap
    from yolat_tpu.train.config import Config
    from yolat_tpu.train.loop import create_state
    from yolat_tpu.train.optim import make_optimizer

    cfg0 = Config(n_classes=17, arch="yolat_pp")
    print("# building workload...", flush=True)
    ds, batches, _ = build_workload(extra_plans=extra_plans_for(cfg0))
    print("# workload ready", flush=True)
    single = {k: v[0] for k, v in batches[0].items()}
    cap = max(img_slot_cap(b) for b in batches)
    stack = {k: jnp.asarray(np.stack([b[k][0] for b in batches]))
             for k in batches[0]}
    S = len(batches)
    n_img_chain = sum(int(b["n_images"][0]) for b in batches) * (
        args.iters // S)

    def time_core(core, variables):
        print("# compiling...", flush=True)

        @jax.jit
        def run(variables, stack):
            def body(carry, i):
                b = jax.tree.map(lambda a: a[i % S], stack)
                b["pos"] = b["pos"] + (carry * 1e-30).astype(b["pos"].dtype)
                out = core(variables, b)
                return out["scores"].astype(jnp.float32).sum(), out["scores"]

            _, outs = jax.lax.scan(body, jnp.float32(0.0),
                                   jnp.arange(args.iters))
            return outs

        np.asarray(run(variables, stack))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(variables, stack))
            best = min(best, time.perf_counter() - t0)
        return round(n_img_chain / best, 1)

    res = {"device": str(jax.devices()[0]), "img_slot_cap": cap,
           "padded_P": int(single["labels"].shape[0])}

    # ---- 1. canonical: NMS layout cap A/B --------------------------------
    cfg = Config(n_classes=ds.n_classes)
    tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
    state = create_state(cfg, tx, single, jax.random.key(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    folded = fold_params_for(cfg, variables)
    for tag, slots in (("canon_fullP", None), ("canon_capped", cap)):
        core = make_predict_core(cfg, max_det=300, fast=True, folded=folded,
                                 bf16=True, img_slots=slots)
        res[tag + "_img_s"] = time_core(core, variables)
        print(f"# {tag}: {res[tag + '_img_s']}", flush=True)
    res["cap_speedup"] = round(
        res["canon_capped_img_s"] / res["canon_fullP_img_s"], 3)

    # ---- 2. YOLaT++: per-edge (banded) vs factored prim level ------------
    for tag, fact in (("pp_edge", False), ("pp_factored", True)):
        cfg = Config(n_classes=ds.n_classes, arch="yolat_pp",
                     pp_factored_prim=fact)
        tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
        state = create_state(cfg, tx, single, jax.random.key(0))
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        folded = fold_params_for(cfg, variables)
        core = make_predict_core(cfg, max_det=300, fast=True, folded=folded,
                                 bf16=True, img_slots=cap)
        res[tag + "_img_s"] = time_core(core, variables)
        print(f"# {tag}: {res[tag + '_img_s']}", flush=True)
    res["factored_speedup"] = round(
        res["pp_factored_img_s"] / res["pp_edge_img_s"], 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
