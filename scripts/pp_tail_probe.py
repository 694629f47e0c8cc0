"""Diagnose the YOLaT++ high-IoU tail (round-4 queue / VALIDATION.md n32
gate): canonical stays flat at mAP@0.5 levels through IoU .90 while
yolat_pp decays from IoU .70. Both archs return PROPOSAL boxes (no box
regression), so the decay must be a RANKING effect: which proposal the
NMS keeps. This probe restores a trained checkpoint, runs predict over
the test split, and classifies every GT by what the kept detection was:

  exact-kept      kept box IoU >= 0.88 vs GT (proposal-exact: the x1.05
                  inflation caps an exactly-matching proposal at ~0.907)
  outranked       an exact proposal EXISTED and passed the keep mask, but
                  a lower-IoU same-class detection outranked or absorbed
                  it (score ordering / NMS suppression)
  keep-masked     an exact proposal existed but the two-pass keep mask
                  dropped it (non-root whose root predicted foreground)
  no-exact        the proposal set never contained an exact box (coverage)

Usage: python scripts/pp_tail_probe.py --exp <exp_dir> --arch yolat_pp
       [--data_dir /tmp/yolat_validation] [--step 10]
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
    p.add_argument("--arch", type=str, default="yolat_pp")
    p.add_argument("--data_dir", type=str, default="/tmp/yolat_validation")
    p.add_argument("--step", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--tag", type=str, default="best")
    p.add_argument("--exact_th", type=float, default=0.88)
    p.add_argument("--out", type=str, default="")
    args = p.parse_args()

    from yolat_tpu.cli.common import apply_platform_env

    apply_platform_env()
    import jax

    from yolat_tpu.cli.test import load_checkpoint
    from yolat_tpu.data.dataset import PackedLoader, SESYDDataset
    from yolat_tpu.eval.predict import make_predict_fn
    from yolat_tpu.train.config import Config

    ds = SESYDDataset(args.data_dir, "test",
                      bbox_sampling_step=args.step)
    cfg = Config(data_dir=args.data_dir, arch=args.arch,
                 n_classes=ds.n_classes, batch_size=args.batch_size,
                 bbox_sampling_step=args.step,
                 pretrained_model=os.path.join(args.exp, "checkpoint"))
    loader = PackedLoader(ds, batch_size=args.batch_size, n_devices=1,
                          shuffle=False, dense=True)
    example = {k: v[0] for k, v in next(iter(loader)).items()}
    state, epoch, best = load_checkpoint(cfg, example, tag=args.tag)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    predict = make_predict_fn(cfg)

    from yolat_tpu.eval.metrics import batch_statistics

    def consumed_sets(db, dsagg, dc, gt, gl, th):
        """GT indices consumed by the REAL greedy matcher at `th`, plus
        per-GT the detection index that consumed it."""
        tp, _, _ = batch_statistics(db, dsagg, dc, gt, gl, th)
        # rerun the greedy to recover det->gt assignment
        iou = iou_matrix(db, gt)
        cand = (np.asarray(dc)[:, None] == np.asarray(gl)[None, :]) & (
            iou >= th)
        ioz = np.where(cand, iou, 0.0)
        best = np.argmax(ioz, axis=1) if len(gt) else np.zeros(0, int)
        owner = {}
        consumed = np.zeros(len(gt), bool)
        for i in range(len(db)):
            if consumed.all():
                break
            j = best[i]
            if cand.any(axis=1)[i] and ioz[i, j] >= th and not consumed[j]:
                consumed[j] = True
                owner[j] = i
        assert consumed.sum() == tp.sum()
        return consumed, owner, iou

    tally = {"exact_kept": 0, "tail_loss": 0, "missed_at_50": 0}
    classify = {"outranked": 0, "keep_masked": 0, "no_exact": 0,
                "winner_took_my_gt": 0}
    examples = []
    n_gt_total = 0
    for stacked in loader:
        batch = {k: v[0] for k, v in stacked.items()}
        out = {k: np.asarray(v) for k, v in predict(variables, batch).items()}
        B = batch["gt_bbox"].shape[0]
        n_images = int(batch["n_images"])
        img_of = np.asarray(batch["image_id"])
        pmask = np.asarray(batch["proposal_mask"])
        is_root = np.asarray(batch["is_root"])
        kept = out["kept"] & pmask
        pb = out["prop_boxes"]          # pixel xyxy, inflated
        pscore = out["prop_obj"] * out["prop_cls"].max(axis=1)
        pcls = out["prop_cls"].argmax(axis=1)
        for img in range(min(B, n_images)):
            w, h = np.asarray(batch["wh"][img])
            gmask = np.asarray(batch["gt_mask"][img])
            gt = np.asarray(batch["gt_bbox"][img])[gmask] * np.array(
                [w, h, w, h])
            gl = np.asarray(batch["gt_labels"][img])[gmask]
            n_gt_total += len(gt)
            valid = out["valid"][img]
            db = out["boxes"][img][valid]
            dsagg = out["scores"][img][valid]
            dc = out["classes"][img][valid]
            c50, own50, iou_d = consumed_sets(db, dsagg, dc, gt, gl, 0.5)
            c85, _, _ = consumed_sets(db, dsagg, dc, gt, gl, 0.85)
            sel = img_of == img
            iou_p = iou_matrix(pb[sel], gt)
            kept_sel, root_sel = kept[sel], is_root[sel]
            sc_sel, cl_sel = pscore[sel], pcls[sel]
            for g in range(len(gt)):
                if not c50[g]:
                    tally["missed_at_50"] += 1
                    continue
                if c85[g]:
                    tally["exact_kept"] += 1
                    continue
                tally["tail_loss"] += 1
                j = own50[g]
                exact = iou_p[:, g] >= args.exact_th
                ex_kept = exact & kept_sel & (cl_sel == gl[g])
                # did the winner detection's box equal some OTHER gt's
                # exact proposal (adjacent-duplicate geometry)?
                other_exact = (iou_d[j].max() >= args.exact_th
                               and np.argmax(iou_d[j]) != g)
                k = (int(np.argmax(np.where(ex_kept, sc_sel, -1)))
                     if ex_kept.any() else -1)
                if ex_kept.any():
                    classify["outranked"] += 1
                elif exact.any():
                    classify["keep_masked"] += 1
                elif other_exact:
                    classify["winner_took_my_gt"] += 1
                else:
                    classify["no_exact"] += 1
                examples.append({
                    "img": img, "gt_cls": int(gl[g]),
                    "kept_iou": round(float(iou_d[j, g]), 3),
                    "kept_score": round(float(dsagg[j]), 4),
                    "winner_matches_other_gt": bool(other_exact),
                    "exact_prop_exists": bool(exact.any()),
                    "exact_prop_in_keepmask": bool(ex_kept.any()),
                    "exact_prop_score": (round(float(sc_sel[k]), 4)
                                         if k >= 0 else None),
                    "exact_prop_is_root": (bool(root_sel[
                        np.nonzero(ex_kept)[0][np.argmax(
                            sc_sel[ex_kept])]]) if ex_kept.any() else None),
                })

    res = {
        "exp": args.exp, "arch": args.arch, "epoch": epoch,
        "n_gt": n_gt_total, "tally": tally, "tail_classify": classify,
        "tail_examples": sorted(examples,
                                key=lambda e: e["kept_iou"])[:16],
    }
    print(json.dumps(res, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
