"""On-chip A/B: YOLaT++ FULL train step with the super-edge clique family
on the sparse dst-sorted XLA path vs the custom-VJP banded primitives
(cfg.pp_banded_super -> nn/yolat_pp.py banded_super route,
ops/banded_train.py). The layer-level A/B measured the banded super family
-26% at bf16 (PERF.md round 3); this measures the whole pp train step
(fwd+bwd+Adam) at bench shapes with the sew_ plan riding the batch.
Scan-chain methodology (bench.time_train). Reference counterpart: fwd+bwd
of the clique propagation inside gcn_lib/sparse/torch_vertex.py.

Usage: python scripts/pp_train_ab.py [--iters N] [--dtype bfloat16]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--dtype", type=str, default="bfloat16")
    args = ap.parse_args()

    import jax

    from bench import build_workload, time_train
    from yolat_tpu.train.config import Config
    from yolat_tpu.train.loop import create_state
    from yolat_tpu.train.optim import make_optimizer

    # the sew_ plan must ride the packed batches (the trainer does this
    # via PackedLoader(extra_plans=("super",)) when cfg.pp_banded_super)
    ds, batches, _ = build_workload(extra_plans=("super",))
    res = {"device": str(jax.devices()[0]), "dtype": args.dtype}
    for tag, kw in (("sparse", {}),
                    ("banded_super", {"pp_banded_super": True}),
                    ("factored", {"pp_factored_prim": True})):
        cfg = Config(n_classes=ds.n_classes, arch="yolat_pp", data_aug=True,
                     dtype=args.dtype, **kw)
        tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
        single = {k: v[0] for k, v in batches[0].items()}
        state = create_state(cfg, tx, single, jax.random.key(0))
        res[tag + "_img_s"] = round(
            time_train(cfg, state, batches, iters=args.iters), 1)
    for tag in ("banded_super", "factored"):
        res[tag + "_speedup"] = round(
            res[tag + "_img_s"] / res["sparse_img_s"], 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
