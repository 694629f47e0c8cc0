"""On-chip A/B: cfg.fused_head_train (ops/fused_pool_train.py) on the
FULL train step — canonical and YOLaT++(factored) archs at bf16, bench
shapes, scan-chain methodology (bench.time_train).

The pool head measured 3.93 ms of the 14.2 ms factored pp step (28%, the
top group — scripts/pp_train_decomp.py --factored, PERF.md round 4); the
fused head removes all [N, 1024] HBM traffic from its fwd+bwd.

Usage: python scripts/fused_head_ab.py [--iters N]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()

    import jax

    from bench import build_workload, time_train
    from yolat_tpu.train.config import Config
    from yolat_tpu.train.loop import create_state
    from yolat_tpu.train.optim import make_optimizer

    ds, batches, _ = build_workload()
    res = {"device": str(jax.devices()[0])}
    for arch, akw in (("canonical", {}),
                      ("pp_factored", {"arch": "yolat_pp",
                                       "pp_factored_prim": True})):
        for tag, fused in (("base", False), ("fused", True)):
            cfg = Config(n_classes=ds.n_classes, data_aug=True,
                         dtype="bfloat16", fused_head_train=fused, **akw)
            tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
            single = {k: v[0] for k, v in batches[0].items()}
            state = create_state(cfg, tx, single, jax.random.key(0))
            key = f"{arch}_{tag}_img_s"
            res[key] = round(time_train(cfg, state, batches,
                                        iters=args.iters), 1)
            print(f"# {key}: {res[key]}", flush=True)
        res[arch + "_speedup"] = round(
            res[f"{arch}_fused_img_s"] / res[f"{arch}_base_img_s"], 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
