"""Badcase visualisation driver.

Counterpart of cad_recognition/detect_badcase.py: render only images with
false positives / false negatives — detections are greedily matched to GT
(same protocol as eval TP matching); unmatched detections draw red, missed
GT draw blue, matched pairs green."""

import os

import numpy as np

from yolat_tpu.cli.common import build_parser, config_from_args
from yolat_tpu.cli.test import load_checkpoint
from yolat_tpu.data.dataset import PackedLoader, SESYDDataset
from yolat_tpu.eval.metrics import batch_statistics
from yolat_tpu.eval.predict import make_predict_fn


def render_badcase(svg_path, width, height, det, gt, out_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.patches as patches
    import matplotlib.pyplot as plt

    from yolat_tpu.geom.bezier import shape_to_cubics
    from yolat_tpu.geom.svg_io import SVGDocument

    doc = SVGDocument.from_file(svg_path)
    fig, ax = plt.subplots(figsize=(12, 12 * height / width))
    for shape in doc.shapes:
        for seg in shape_to_cubics(shape):
            t = np.linspace(0, 1, 12)[:, None]
            pts = ((1 - t) ** 3 * seg[0] + 3 * (1 - t) ** 2 * t * seg[1]
                   + 3 * (1 - t) * t ** 2 * seg[2] + t ** 3 * seg[3])
            ax.plot(pts[:, 0], pts[:, 1], color="0.7", linewidth=0.8)

    def rect(box, color, label):
        ax.add_patch(patches.Rectangle(
            (box[0], box[1]), box[2] - box[0], box[3] - box[1],
            linewidth=2, edgecolor=color, facecolor="none"))
        ax.text(box[0], box[1], label, color=color, fontsize=8)

    for box, kind in det:
        rect(box, "green" if kind == "tp" else "red",
             "TP" if kind == "tp" else "FP")
    for box in gt:
        rect(box, "blue", "FN")
    ax.set_xlim(0, width)
    ax.set_ylim(height, 0)
    ax.axis("off")
    fig.savefig(out_path, bbox_inches="tight", dpi=120)
    plt.close(fig)


def main(argv=None):
    p = build_parser("yolat_tpu badcase visualisation")
    p.add_argument("--out_dir", default="output_badcase", type=str)
    p.add_argument("--conf_th", default=0.5, type=float)
    p.add_argument("--iou_th", default=0.5, type=float)
    p.add_argument("--max_images", default=0, type=int)
    args = p.parse_args(argv)
    cfg = config_from_args(args, argv)

    ds = SESYDDataset(cfg.data_dir, "test",
                      bbox_sampling_step=cfg.bbox_sampling_step)
    cfg = cfg.replace(n_classes=ds.n_classes)
    loader = PackedLoader(ds, batch_size=1, n_devices=1, shuffle=False)
    example = {k: v[0] for k, v in next(iter(loader)).items()}
    state, _, _ = load_checkpoint(cfg, example)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    predict = make_predict_fn(cfg, max_det=cfg.max_det)

    os.makedirs(args.out_dir, exist_ok=True)
    n_bad = 0
    for i, stacked in enumerate(loader):
        if args.max_images and i >= args.max_images:
            break
        batch = {k: v[0] for k, v in stacked.items()}
        out = {k: np.asarray(v) for k, v in predict(variables, batch).items()}
        valid = out["valid"][0] & (out["scores"][0] > args.conf_th)
        boxes = out["boxes"][0][valid]
        scores = out["scores"][0][valid]
        classes = out["classes"][0][valid]
        w, h = batch["wh"][0]
        gmask = batch["gt_mask"][0]
        gt_px = batch["gt_bbox"][0][gmask] * np.array([w, h, w, h])
        gt_labels = batch["gt_labels"][0][gmask]

        tp, _, _ = batch_statistics(boxes, scores, classes, gt_px, gt_labels,
                                    args.iou_th)
        det = [(b, "tp" if t else "fp") for b, t in zip(boxes, tp)]
        missed = gt_px[: 0]
        # FN: GT not covered by any TP of the right class
        covered = np.zeros(len(gt_px), bool)
        for b, t, c in zip(boxes, tp, classes):
            if not t:
                continue
            from yolat_tpu.eval.metrics import _iou_plus1

            iou = _iou_plus1(b, gt_px)
            j = int(np.argmax(np.where(gt_labels == c, iou, 0)))
            covered[j] = True
        missed = gt_px[~covered]

        if (tp == 0).any() or len(missed):
            n_bad += 1
            name = (os.path.basename(os.path.dirname(ds.files[i])) + "_"
                    + os.path.basename(ds.files[i]).replace(".svg", ".png"))
            render_badcase(ds.files[i], w, h, det, missed,
                           os.path.join(args.out_dir, name))
    print(f"rendered {n_bad} badcase images to {args.out_dir}")


if __name__ == "__main__":
    main()
