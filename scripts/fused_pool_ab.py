"""On-chip A/B: fused folded-MLP + block-max pool vs the two-stage path.

Measures the bf16 serving step (scan-chain, host-fetch barrier) with
fused_pool True/False and prints one JSON line.
"""
import json, os, sys, time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_workload
    from yolat_tpu.eval.fast_forward import fold_params_for
    from yolat_tpu.eval.predict import make_predict_core
    from yolat_tpu.train.config import Config
    from yolat_tpu.train.loop import create_state
    from yolat_tpu.train.optim import make_optimizer

    ds, batches, _ = build_workload()
    cfg = Config(n_classes=ds.n_classes, data_aug=False)
    tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
    single = {k: v[0] for k, v in batches[0].items()}
    state = create_state(cfg, tx, single, jax.random.key(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    folded = fold_params_for(cfg, variables)
    stack = {k: jnp.asarray(np.stack([b[k][0] for b in batches]))
             for k in batches[0]}
    S = len(batches)
    n_img = sum(int(b["n_images"][0]) for b in batches)
    res = {"device": str(jax.devices()[0])}

    from functools import partial

    from yolat_tpu.eval.fast_forward import fast_forward
    from yolat_tpu.data.packing import finalize_batch
    from yolat_tpu.ops.nms import single_image_nms  # noqa: F401

    for tag, fp in (("fused", True), ("twostage", False)):
        core = make_predict_core(cfg, max_det=300, fast=True, folded=folded,
                                 bf16=True)
        # monkey-free: route via functools partial on fast_forward's flag
        import yolat_tpu.eval.predict as predict_mod
        import yolat_tpu.eval.fast_forward as ffm

        orig = ffm.fast_forward

        def patched(*a, _orig=orig, _fp=fp, **kw):
            kw["fused_pool"] = _fp
            return _orig(*a, **kw)

        ffm.fast_forward = patched
        predict_mod.fast_forward = patched
        try:
            core = make_predict_core(cfg, max_det=300, fast=True,
                                     folded=folded, bf16=True)

            @jax.jit
            def run(variables, stack):
                def body(carry, i):
                    b = jax.tree.map(lambda a: a[i % S], stack)
                    b["pos"] = b["pos"] + (carry * 1e-30).astype(b["pos"].dtype)
                    out = core(variables, b)
                    return out["scores"].astype(jnp.float32).sum(), out["scores"]
                _, outs = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(64))
                return outs

            o = run(variables, stack); np.asarray(o)
            res[tag + "_scores_sum"] = float(np.asarray(o, np.float32).sum())
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter(); np.asarray(run(variables, stack))
                best = min(best, time.perf_counter() - t0)
            res[tag + "_img_s"] = round(n_img * 64 / S / best / (8 // 8), 1)
        finally:
            ffm.fast_forward = orig
            predict_mod.fast_forward = orig
    print(json.dumps(res))


if __name__ == "__main__":
    main()
