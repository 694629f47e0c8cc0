"""On-chip: YOLaT++ serving throughput — flax eval vs folded fast_bf16."""
import json, os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    import jax
    import jax.numpy as jnp
    from bench import build_workload
    from yolat_tpu.train.config import Config
    from yolat_tpu.train.loop import create_state
    from yolat_tpu.train.optim import make_optimizer
    from yolat_tpu.eval.fast_forward import fold_params_for
    from yolat_tpu.eval.predict import make_predict_core

    from yolat_tpu.eval.fast_forward import extra_plans_for

    cfg0 = Config(n_classes=17, arch="yolat_pp")
    ds, batches, _ = build_workload(extra_plans=extra_plans_for(cfg0))
    cfg = Config(n_classes=ds.n_classes, arch="yolat_pp")
    tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
    single = {k: v[0] for k, v in batches[0].items()}
    state = create_state(cfg, tx, single, jax.random.key(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    folded = fold_params_for(cfg, variables)
    stack = {k: jnp.asarray(np.stack([b[k][0] for b in batches])) for k in batches[0]}
    S = len(batches)
    res = {}

    for tag, kw in (("flax", dict(fast=False)),
                    ("fast_f32", dict(fast=True, folded=folded)),
                    ("fast_bf16", dict(fast=True, folded=folded, bf16=True))):
        core = make_predict_core(cfg, max_det=300, **kw)
        @jax.jit
        def run(variables, stack):
            def body(carry, i):
                b = jax.tree.map(lambda a: a[i % S], stack)
                b["pos"] = b["pos"] + (carry * 1e-30).astype(b["pos"].dtype)
                out = core(variables, b)
                return out["scores"].astype(jnp.float32).sum(), out["scores"]
            _, outs = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(16))
            return outs
        o = run(variables, stack); np.asarray(o)
        res[tag + "_scores_sum"] = float(np.asarray(o, np.float32).sum())
        n_images = sum(int(b["n_images"][0]) for b in batches) * 8
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); np.asarray(run(variables, stack))
            best = min(best, time.perf_counter() - t0)
        res[tag + "_img_s"] = round(n_images / best, 1)
    res["device"] = str(jax.devices()[0])
    print(json.dumps(res))

if __name__ == "__main__":
    main()
