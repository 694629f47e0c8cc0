"""On-chip A/B: YOLaT++ serving with the curve level's two banded passes
(dst-plan + src-plan, each recomputing the per-edge token) vs the fused
both-endpoint kernel (ops/banded_message.banded_message_sum_both — one
pass, token computed once, shared gather one-hots, spill-tile scatter to
the other endpoint). Full fast_forward_pp step, 32-step scan chains."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_workload
    from yolat_tpu.data.packing import finalize_batch
    from yolat_tpu.eval.fast_forward import (extra_plans_for, fast_forward_pp,
                                             fold_params_for)
    from yolat_tpu.train.config import Config
    from yolat_tpu.train.loop import create_state
    from yolat_tpu.train.optim import make_optimizer

    print("building workload...", file=sys.stderr, flush=True)
    cfg0 = Config(n_classes=17, arch="yolat_pp")
    ds, batches, _ = build_workload(extra_plans=extra_plans_for(cfg0))
    cfg = Config(n_classes=ds.n_classes, arch="yolat_pp")
    tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
    single = {k: v[0] for k, v in batches[0].items()}
    print("workload built; creating state...", file=sys.stderr, flush=True)
    state = create_state(cfg, tx, single, jax.random.key(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    folded = fold_params_for(cfg, variables)
    stack = {k: jnp.asarray(np.stack([b[k][0] for b in batches]))
             for k in batches[0]}
    S = len(batches)
    n_images = sum(int(b["n_images"][0]) for b in batches)
    res = {}

    iters = 32
    n_steps = iters * S  # bench.time_train's convention: every batch runs
    # `iters` times, so images-per-chain = iters * n_images exactly

    for tag, fused in (("two_pass", False), ("fused", True)):
        @jax.jit
        def run(folded, stack, fused=fused):
            def body(carry, i):
                b = jax.tree.map(lambda a: a[i % S], stack)
                b["pos"] = b["pos"] + (carry * 1e-30).astype(b["pos"].dtype)
                b = finalize_batch(b)
                logits, _ = fast_forward_pp(folded, b, bf16=True,
                                            curve_fused=fused)
                s = logits.sum()
                return s, s
            _, outs = jax.lax.scan(body, jnp.float32(0.0),
                                   jnp.arange(n_steps))
            return outs

        print(f"compiling route {tag}...", file=sys.stderr, flush=True)
        o = np.asarray(run(folded, stack))
        res[tag + "_logits_sum"] = float(o.sum())
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(folded, stack))
            best = min(best, time.perf_counter() - t0)
        res[tag + "_ms_step"] = round(best / n_steps * 1e3, 3)
        res[tag + "_img_s"] = round(n_images * iters / best, 1)
    res["device"] = str(jax.devices()[0])
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
