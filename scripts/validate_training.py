"""Training validation: train the canonical config on synthetic SESYD-style
floorplans and report the full mAP table. Written for the round-1 quality
gate (BASELINE.md: mAP@0.5 parity target); run on TPU or CPU.

Usage: python scripts/validate_training.py [--epochs 60] [--out results.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--n_train", type=int, default=24)
    p.add_argument("--n_test", type=int, default=8)
    p.add_argument("--eval_start", type=int, default=None)
    p.add_argument("--root", type=str, default="/tmp/yolat_validation")
    p.add_argument("--out", type=str, default="/tmp/yolat_validation/results.json")
    p.add_argument("--lr", type=float, default=2.5e-4)
    p.add_argument("--step", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--dataset", type=str, default="floorplans",
                   choices=("floorplans", "diagrams", "charts"))
    p.add_argument("--width", type=float, default=2000.0)
    p.add_argument("--height", type=float, default=1500.0)
    p.add_argument("--n_rooms", type=int, default=6)
    p.add_argument("--dtype", type=str, default="float32")
    p.add_argument("--n_devices", type=int, default=1,
                   help="data-parallel devices (the chart-VG config's "
                        "large-batch ICI-DP gate runs 8 on the virtual "
                        "CPU mesh)")
    p.add_argument("--scan_steps", type=int, default=1,
                   help="train steps per device dispatch (remote-link lever)")
    p.add_argument("--arch", type=str, default="centernet3cc_rpn_gp_iter2",
                   help="architecture (e.g. yolat_pp for the hierarchical "
                        "YOLaT++ model)")
    p.add_argument("--mixup", type=float, default=0.0,
                   help="mixup probability (reference --do_mixup; pairs "
                        "CCs side-by-side with bipartite super edges)")
    p.add_argument("--factored", action="store_true",
                   help="YOLaT++ v2 factored primitive level "
                        "(cfg.pp_factored_prim; train-throughput lever)")
    p.add_argument("--iou_aware", action="store_true",
                   help="IoU-aware soft classification targets "
                        "(cfg.iou_aware_loss; high-IoU-tail lever)")
    p.add_argument("--pos_weight", type=float, default=1.0,
                   help="positive-row loss weight "
                        "(cfg.pos_class_weight; dense-sweep lever)")
    p.add_argument("--iou_mode", type=str, default="abs",
                   choices=("abs", "rel"),
                   help="quality target: abs IoU, or sibling-relative "
                        "(cfg.iou_aware_mode; round-5 chart lever)")
    args = p.parse_args()

    from yolat_tpu.cli.common import apply_platform_env
    from yolat_tpu.data.synthetic import (write_chart_dataset,
                                          write_dataset,
                                          write_diagram_dataset)
    from yolat_tpu.train.config import Config
    from yolat_tpu.train.trainer import run_training

    # honor JAX_PLATFORMS in-process (the axon plugin ignores the env var
    # and hangs backend init when its tunnel is down) — same mechanism as
    # the CLIs (cli/common.py) and tests/conftest.py
    apply_platform_env()

    os.makedirs(args.root, exist_ok=True)
    if not os.path.exists(os.path.join(args.root, "train_list.txt")):
        if args.dataset == "diagrams":
            write_diagram_dataset(args.root, n_train=args.n_train,
                                  n_test=args.n_test, seed=11)
        elif args.dataset == "charts":
            write_chart_dataset(args.root, n_train=args.n_train,
                                n_test=args.n_test, seed=11)
        else:
            write_dataset(args.root, n_train=args.n_train, n_test=args.n_test,
                          seed=11, width=args.width, height=args.height,
                          n_rooms=args.n_rooms, symbols_per_room=(1, 3))

    eval_start = args.eval_start or max(args.epochs - 10, 1)
    cfg = Config(
        data_dir=args.root,
        batch_size=args.batch_size,
        total_epochs=args.epochs,
        eval_start=eval_start,
        lr=args.lr,
        data_aug=True,
        dropout=0.0,
        weight_decay=1e-5,
        bbox_sampling_step=args.step,
        root_dir=os.path.join(args.root, "log"),
        print_freq=20,
        dtype=args.dtype,
        scan_steps=args.scan_steps,
        arch=args.arch,
        do_mixup=args.mixup,
        n_devices=args.n_devices,
        iou_aware_loss=args.iou_aware,
        iou_aware_mode=args.iou_mode,
        pos_class_weight=args.pos_weight,
        pp_factored_prim=args.factored,
    )
    t0 = time.time()
    state, results = run_training(cfg)
    wall = time.time() - t0

    payload = {
        "map_50": results.get("map_50"),
        "map_all": results.get("map_all"),
        "top1_acc": results.get("top1_acc"),
        "best_value": results.get("best_value"),
        "map_per_th": results.get("map_per_th"),
        "wall_s": wall,
        "epochs": args.epochs,
        "arch": args.arch,
        "iou_aware": args.iou_aware,
        "iou_mode": args.iou_mode,
        "pos_weight": args.pos_weight,
        "factored": args.factored,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
