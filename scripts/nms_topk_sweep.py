"""On-chip sensitivity sweep for Config.nms_topk (fixpoint-NMS candidate
cap).

The fixpoint NMS materialises one [topk, topk] IoU matrix per image
(PERF.md: the [4, 4096, 4096] chain is the largest pre-fusion contributor
to the serving program's bytes) — the cost is quadratic in topk, while
exactness only needs topk to exceed the rank of the last greedy survivor
(ops/nms.py docstring). This sweep measures, on the real bench workload:

  1. bf16 fast-serving throughput at topk in {512, 1024, 2048, 4096};
  2. exactness of each against algorithm='loop' (greedy over ALL M*K
     candidates, torchvision semantics) on the same model outputs —
     untrained-model scores are near-flat softmaxes, the WORST case for
     rank truncation (long suppression chains, dense near-ties), so
     agreement here is a conservative exactness signal.

Prints one JSON block with a decision for the Config.nms_topk default.

Usage: python scripts/nms_topk_sweep.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def detections_equal(a, b, i):
    """Compare one image's detection dicts (sorted by score desc, the
    layout both algorithms emit)."""
    va = np.asarray(a["valid"][i])
    vb = np.asarray(b["valid"][i])
    if va.sum() != vb.sum():
        return False
    n = int(va.sum())
    ok = np.allclose(np.asarray(a["scores"][i][:n], np.float32),
                     np.asarray(b["scores"][i][:n], np.float32),
                     rtol=1e-5, atol=1e-6)
    ok &= bool((np.asarray(a["classes"][i][:n]) ==
                np.asarray(b["classes"][i][:n])).all())
    ok &= np.allclose(np.asarray(a["boxes"][i][:n], np.float32),
                      np.asarray(b["boxes"][i][:n], np.float32),
                      rtol=1e-5, atol=1e-3)
    return bool(ok)


def main():
    import jax

    import bench
    from yolat_tpu.eval.fast_forward import fold_params
    from yolat_tpu.eval.predict import make_predict_fn
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

    # ---- exactness vs the unbounded greedy loop (f32 path: the loop
    # oracle and the fixpoint candidates must see identical scores) ----
    loop_cfg = cfg.replace(nms_algorithm="loop")
    loop_predict = make_predict_fn(loop_cfg, max_det=300, fast=True,
                                   folded=folded)
    dev_batches = [
        {k: jax.device_put(v[0], dev) for k, v in b.items()} for b in batches
    ]
    dev_folded = jax.device_put(folded, dev)
    loop_outs = [jax.tree.map(np.asarray, loop_predict(dev_folded, b))
                 for b in dev_batches]

    results = {}
    for topk in (256, 384, 512, 1024, 2048, 4096):
        c = cfg.replace(nms_topk=topk)
        fp_predict = make_predict_fn(c, max_det=300, fast=True, folded=folded)
        mismatches = 0
        n_img = 0
        for b, ref in zip(dev_batches, loop_outs):
            out = jax.tree.map(np.asarray, fp_predict(dev_folded, b))
            k = int(np.asarray(b["n_images"]))
            for i in range(k):
                n_img += 1
                if not detections_equal(out, ref, i):
                    mismatches += 1
        # throughput on the bf16 fast path (the bench headline route)
        rate = bench.time_predict(c, variables, batches, dev, iters=8,
                                  fast=True, folded=folded, bf16=True)
        results[topk] = {"img_per_s_bf16": round(rate, 1),
                         "exact_vs_loop": f"{n_img - mismatches}/{n_img}"}
        print(f"topk={topk}: {results[topk]}", file=sys.stderr)

    exact = [k for k, v in results.items()
             if v["exact_vs_loop"].split("/")[0] == v["exact_vs_loop"].split("/")[1]]
    best = max(exact, key=lambda k: results[k]["img_per_s_bf16"]) if exact else 4096
    print(json.dumps({"results": results,
                      "smallest_exact_topk": min(exact) if exact else None,
                      "decision": f"fastest exact topk = {best}"}))


if __name__ == "__main__":
    main()
