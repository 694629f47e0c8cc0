"""On-chip A/B: train_layout 'sparse' (dst-sorted gathers + sorted scatters)
vs 'window' (banded one-hot Pallas gather/scatter custom VJPs,
ops/edge_window_train.py) at bench shapes. Scan-chain methodology
(bench.time_train). VERDICT r2 item 4; reference counterpart: fwd+bwd of
gcn_lib/sparse/torch_vertex.py:330-337.

Usage: python scripts/train_layout_ab.py [--iters N] [--dtype bfloat16]
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

    ds, batches, _ = build_workload()
    res = {"device": str(jax.devices()[0]), "dtype": args.dtype}
    for layout in ("sparse", "window"):
        cfg = Config(n_classes=ds.n_classes, data_aug=True,
                     dtype=args.dtype, train_layout=layout)
        tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
        single = {k: v[0] for k, v in batches[0].items()}
        state = create_state(cfg, tx, single, jax.random.key(0))
        res[layout + "_img_s"] = round(
            time_train(cfg, state, batches, iters=args.iters), 1)
    res["speedup"] = round(res["window_img_s"] / res["sparse_img_s"], 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
