"""Proposal-coverage audit: for each GT box, does any swept proposal reach
IoU > 0.7 (the labeling threshold, graph_dict3.py:625-635)? Coverage is
the mAP ceiling of the whole detector — the sweep cannot detect what it
never proposes (VALIDATION.md "Proposal coverage sets the mAP ceiling").

Usage: python scripts/coverage_check.py [--step 10] [--n 12] [--width 2000]
       [--height 1500] [--n_rooms 6] [--root DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def dataset_coverage(root: str, step: int, partition: str = "train") -> dict:
    from yolat_tpu.data.dataset import SESYDDataset
    from yolat_tpu.geom.proposals import _iou_ios_many

    ds = SESYDDataset(root, partition, bbox_sampling_step=step, cache=False)
    covered = total = 0
    props = 0
    for i in range(len(ds)):
        pf, (gt, gt_labels), _ = ds.load(i)
        props += pf.n_proposals
        if not len(gt):
            continue
        iou, _ = _iou_ios_many(pf.bbox, gt)
        covered += int((iou.max(axis=0) > 0.7).sum())
        total += len(gt)
    return {
        "step": step,
        "images": len(ds),
        "gt_boxes": total,
        "coverage": covered / max(total, 1),
        "proposals_per_image": props / max(len(ds), 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--step", type=int, default=10)
    ap.add_argument("--n", type=int, default=12)
    ap.add_argument("--width", type=float, default=2000.0)
    ap.add_argument("--height", type=float, default=1500.0)
    ap.add_argument("--n_rooms", type=int, default=6)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--root", type=str, default="")
    args = ap.parse_args()

    from yolat_tpu.data.synthetic import write_dataset

    root = args.root or os.path.join(tempfile.gettempdir(), "yolat_coverage")
    if not os.path.exists(os.path.join(root, "train_list.txt")):
        os.makedirs(root, exist_ok=True)
        write_dataset(root, n_train=args.n, n_test=1, seed=args.seed,
                      width=args.width, height=args.height,
                      n_rooms=args.n_rooms, symbols_per_room=(1, 3))
    print(json.dumps(dataset_coverage(root, args.step)))


if __name__ == "__main__":
    main()
