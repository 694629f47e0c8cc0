"""On-chip A/B: lax.approx_max_k candidate selection in fixpoint NMS.

Measures the full bf16 serving step and checks detection-exactness
against the exact top_k route on the bench workload (untrained scores =
near-flat = worst case for rank stability, per scripts/nms_topk_sweep)."""
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
    from yolat_tpu.eval.fast_forward import fold_params
    from yolat_tpu.eval.predict import make_predict_core

    ds, batches, _ = build_workload()
    base = Config(n_classes=ds.n_classes)
    tx = make_optimizer(base.optimizer, base.lr, base.weight_decay)
    single = {k: v[0] for k, v in batches[0].items()}
    state = create_state(base, tx, single, jax.random.key(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    folded = fold_params(variables, n_blocks=base.n_blocks)
    stack = {k: jnp.asarray(np.stack([b[k][0] for b in batches])) for k in batches[0]}
    S = len(batches)
    res = {}
    dets = {}

    for tag, approx in (("exact", False), ("approx", True)):
        cfg = base.replace(nms_approx_topk=approx)
        core = make_predict_core(cfg, max_det=300, fast=True, folded=folded,
                                 bf16=True)
        @jax.jit
        def run(variables, stack):
            def body(carry, i):
                b = jax.tree.map(lambda a: a[i % S], stack)
                b["pos"] = b["pos"] + (carry * 1e-30).astype(b["pos"].dtype)
                out = core(variables, b)
                keep = {k: out[k] for k in ("boxes", "scores", "classes", "valid")}
                return out["scores"].astype(jnp.float32).sum(), keep
            _, outs = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(16))
            return outs
        o = run(variables, stack); jax.block_until_ready(o)
        np.asarray(o["scores"])
        dets[tag] = jax.tree.map(np.asarray, o)
        n_images = sum(int(b["n_images"][0]) for b in batches) * 8
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); np.asarray(run(variables, stack)["scores"])
            best = min(best, time.perf_counter() - t0)
        res[tag + "_img_s"] = round(n_images / best, 1)

    a, b_ = dets["exact"], dets["approx"]
    res["valid_equal"] = bool((a["valid"] == b_["valid"]).all())
    m = a["valid"]
    res["classes_equal"] = bool((a["classes"][m] == b_["classes"][m]).all())
    res["boxes_equal"] = bool(np.allclose(a["boxes"][m], b_["boxes"][m]))
    res["scores_close"] = bool(np.allclose(a["scores"][m], b_["scores"][m], atol=1e-6))
    res["n_detections"] = int(m.sum())
    res["device"] = str(jax.devices()[0])
    print(json.dumps(res))

if __name__ == "__main__":
    main()
