"""Chart step-20 NMS probe: re-evaluate a trained checkpoint under
different NMS configurations WITHOUT retraining.

Two VERDICT round-5 questions in one run:
1. Does the fixpoint NMS candidate cap (nms_topk=1024) truncate on the
   dense chart sweep (7.2k proposals/image)? classfix is exact over ALL
   candidates per class; the topk sweep finds the knee at TRAINED scores
   (the round-2 exactness sweep ran at near-flat untrained scores and the
   capped layout changed the candidate distribution — PERF.md item).
2. Is any of the step-20 quality gap (0.619 vs the 0.935 ceiling)
   recoverable at eval time, before touching the loss?

Usage:
  python scripts/chart_nms_probe.py --exp <exp_dir> [--tag 120]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", required=True,
                    help="experiment dir (contains checkpoint/)")
    ap.add_argument("--data", default="/tmp/yolat_charts_r4")
    ap.add_argument("--step", type=int, default=20)
    ap.add_argument("--batch_size", type=int, default=2)
    ap.add_argument("--tag", default="120",
                    help="checkpoint tag; the gate reports the FINAL "
                         "epoch's eval, so default to that epoch")
    ap.add_argument("--arch", default="centernet3cc_rpn_gp_iter2")
    ap.add_argument("--out", default="/tmp/chart_nms_probe.json")
    ap.add_argument("--arms",
                    default="fixpoint:1024,fixpoint:2048,fixpoint:4096,"
                            "fixpoint:8192,classfix:0")
    args = ap.parse_args()

    from yolat_tpu.cli.common import (apply_platform_env,
                                      enable_compilation_cache)

    apply_platform_env()
    enable_compilation_cache()

    import jax

    from yolat_tpu.data.dataset import PackedLoader, SESYDDataset
    from yolat_tpu.eval.fast_forward import extra_plans_for
    from yolat_tpu.eval.runner import evaluate
    from yolat_tpu.train.checkpoint import CheckpointManager
    from yolat_tpu.train.config import Config
    from yolat_tpu.train.loop import create_state
    from yolat_tpu.train.optim import make_optimizer

    cfg = Config(data_dir=args.data, batch_size=args.batch_size,
                 bbox_sampling_step=args.step, arch=args.arch)
    ds = SESYDDataset(args.data, "test", bbox_sampling_step=args.step)
    cfg = cfg.replace(n_classes=ds.n_classes)
    loader = PackedLoader(ds, batch_size=cfg.batch_size, shuffle=False,
                          dense=True, extra_plans=extra_plans_for(cfg))
    example = {k: v[0] for k, v in next(iter(loader)).items()}
    tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
    state = create_state(cfg, tx, example, jax.random.key(0))
    state, epoch, _ = CheckpointManager(
        os.path.join(args.exp, "checkpoint")).restore(state, tag=args.tag)
    print(f"restored epoch={epoch} from {args.exp}", flush=True)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    rows = []
    for arm in args.arms.split(","):
        algo, topk = arm.split(":")
        acfg = cfg.replace(nms_algorithm=algo)
        if int(topk):
            acfg = acfg.replace(nms_topk=int(topk))
        print(f"arm {arm}: compiling+evaluating ...", flush=True)
        t0 = time.time()
        res = evaluate(acfg, variables, loader)
        row = {"algo": algo, "topk": int(topk) or None,
               "map_50": res["map_50"], "map_all": res["map_all"],
               "top1": res["top1_acc"], "wall_s": time.time() - t0}
        rows.append(row)
        print(json.dumps(row), flush=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
