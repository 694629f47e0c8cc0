"""Chart step-20 FALSE-POSITIVE composition probe (round 5).

The tail probe showed 226/232 GTs matched at IoU 0.5 yet mAP@0.5=0.619 —
recall is fine, PRECISION is the gap. This probe classifies every kept
detection at eval as:

  tp          matched an unclaimed same-class GT at IoU>=0.5
  dup         IoU>=0.5 with an ALREADY-CLAIMED same-class GT (an NMS
              survivor duplicating a detected GT — partial-span siblings
              of thin bars/axes can overlap the GT >=0.5 while overlapping
              each other <0.5, so IoU-NMS keeps both)
  misclass    IoU>=0.5 with some GT of a DIFFERENT class
  poor_loc    max same-class GT IoU in (0, 0.5)
  ghost       no GT overlap at all

and reports score-rank interleaving: how many FPs outrank the median TP.

Usage: python scripts/chart_fp_probe.py --exp <exp_dir> [--tag 120]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def iou_matrix(a, b):
    """+1-pixel IoU via the convention's home (ops/iou.box_iou_matrix)."""
    import numpy as _np

    from yolat_tpu.ops.iou import box_iou_matrix

    if len(a) == 0 or len(b) == 0:
        return _np.zeros((len(a), len(b)))
    return _np.asarray(box_iou_matrix(_np.asarray(a, _np.float64),
                                      _np.asarray(b, _np.float64),
                                      plus1=True))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--exp", type=str, required=True)
    p.add_argument("--arch", type=str, default="centernet3cc_rpn_gp_iter2")
    p.add_argument("--data_dir", type=str, default="/tmp/yolat_charts_r4")
    p.add_argument("--step", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--tag", type=str, default="120")
    p.add_argument("--out", type=str, default="/tmp/chart_fp_probe.json")
    args = p.parse_args()

    from yolat_tpu.cli.common import apply_platform_env

    apply_platform_env()
    import jax  # noqa: F401

    from yolat_tpu.cli.test import load_checkpoint
    from yolat_tpu.data.dataset import PackedLoader, SESYDDataset
    from yolat_tpu.eval.predict import make_predict_fn
    from yolat_tpu.train.config import Config

    ds = SESYDDataset(args.data_dir, "test", bbox_sampling_step=args.step)
    cfg = Config(data_dir=args.data_dir, arch=args.arch,
                 n_classes=ds.n_classes, batch_size=args.batch_size,
                 bbox_sampling_step=args.step,
                 pretrained_model=os.path.join(args.exp, "checkpoint"))
    loader = PackedLoader(ds, batch_size=args.batch_size, n_devices=1,
                          shuffle=False, dense=True)
    example = {k: v[0] for k, v in next(iter(loader)).items()}
    state, epoch, _ = load_checkpoint(cfg, example, tag=args.tag)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    predict = make_predict_fn(cfg)

    kinds = {"tp": 0, "dup": 0, "misclass": 0, "poor_loc": 0, "ghost": 0}
    scores_by_kind = {k: [] for k in kinds}
    n_gt = 0
    n_det = 0
    per_class = {}
    for stacked in loader:
        batch = {k: v[0] for k, v in stacked.items()}
        out = {k: np.asarray(v) for k, v in predict(variables, batch).items()}
        B = int(batch["n_images"])
        for img in range(B):
            w, h = np.asarray(batch["wh"][img])
            gmask = np.asarray(batch["gt_mask"][img])
            gt = np.asarray(batch["gt_bbox"][img])[gmask] * np.array(
                [w, h, w, h])
            gl = np.asarray(batch["gt_labels"][img])[gmask]
            n_gt += len(gt)
            valid = out["valid"][img]
            db = out["boxes"][img][valid]
            dsc = out["scores"][img][valid]
            dc = out["classes"][img][valid]
            order = np.argsort(-dsc)
            db, dsc, dc = db[order], dsc[order], dc[order]
            n_det += len(db)
            iou = iou_matrix(db, gt)
            claimed = np.zeros(len(gt), bool)
            for i in range(len(db)):
                same = dc[i] == gl
                cand = same & (iou[i] >= 0.5)
                free = cand & ~claimed
                if free.any():
                    j = np.argmax(np.where(free, iou[i], 0))
                    claimed[j] = True
                    kind = "tp"
                elif cand.any():
                    kind = "dup"
                elif ((iou[i] >= 0.5) & ~same).any():
                    kind = "misclass"
                elif (same & (iou[i] > 0)).any():
                    kind = "poor_loc"
                else:
                    kind = "ghost"
                kinds[kind] += 1
                scores_by_kind[kind].append(float(dsc[i]))
                if kind != "tp":
                    c = int(dc[i])
                    per_class[c] = per_class.get(c, 0) + 1

    tp_scores = np.array(scores_by_kind["tp"] or [0.0])
    med_tp = float(np.median(tp_scores))
    fp_scores = np.concatenate(
        [np.array(scores_by_kind[k] or [], dtype=float)
         for k in ("dup", "misclass", "poor_loc", "ghost")])
    res = {
        "exp": args.exp, "epoch": epoch, "n_gt": n_gt, "n_det": n_det,
        "kinds": kinds,
        "median_tp_score": round(med_tp, 4),
        "fps_above_median_tp": int((fp_scores > med_tp).sum()),
        "score_quartiles": {
            k: [round(float(q), 4)
                for q in np.percentile(np.array(v or [0.0]), [25, 50, 75])]
            for k, v in scores_by_kind.items()},
        "fp_per_class": per_class,
    }
    print(json.dumps(res, indent=1))
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
