"""Detection + visualisation driver.

Counterpart of cad_recognition/detect.py: run the predictor over a
partition, time per-image inference, and render detection boxes over each
image (the reference overlays the sibling .tiff raster, detect.py:384-429;
SESYD rasters are not redistributable, so we rasterise the SVG primitives
ourselves before overlaying)."""

import os
import time

import numpy as np

from yolat_tpu.cli.common import build_parser, config_from_args
from yolat_tpu.cli.test import load_checkpoint
from yolat_tpu.data.dataset import PackedLoader, SESYDDataset
from yolat_tpu.eval.predict import make_predict_fn


def render_detections(svg_path, width, height, boxes, scores, classes,
                      class_names, out_path, score_th=0.75):
    """Matplotlib overlay: SVG primitives as lines + detection rectangles."""
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
            ax.plot(pts[:, 0], pts[:, 1], color="0.6", linewidth=0.8)

    cmap = plt.cm.get_cmap("tab20") if hasattr(plt.cm, "get_cmap") else plt.get_cmap("tab20")
    for box, score, cls in zip(boxes, scores, classes):
        if score < score_th:
            continue
        color = cmap(int(cls) % 20)
        ax.add_patch(
            patches.Rectangle(
                (box[0], box[1]), box[2] - box[0], box[3] - box[1],
                linewidth=2, edgecolor=color, facecolor="none",
            )
        )
        ax.text(box[0], box[1], f"{class_names[int(cls)]} {score:.2f}",
                color=color, fontsize=8)
    ax.set_xlim(0, width)
    ax.set_ylim(height, 0)
    ax.axis("off")
    fig.savefig(out_path, bbox_inches="tight", dpi=120)
    plt.close(fig)


def main(argv=None):
    p = build_parser("yolat_tpu detection + visualisation")
    p.add_argument("--out_dir", default="output_all", type=str)
    p.add_argument("--conf_th", default=0.75, type=float)
    p.add_argument("--max_images", default=0, type=int)
    p.add_argument("--merge_nms", action="store_true",
                   help="weighted-merge NMS on raw proposals (the reference "
                        "detect.py post-processing) instead of hard NMS")
    p.add_argument("--serve_mode", default="flax",
                   choices=("flax", "fast", "fast_bf16"),
                   help="flax = parity path; fast/fast_bf16 = folded-BN "
                        "serving engine (bf16 is the TPU serving default)")
    args = p.parse_args(argv)
    cfg = config_from_args(args, argv)

    ds = SESYDDataset(cfg.data_dir, "test",
                      bbox_sampling_step=cfg.bbox_sampling_step)
    cfg = cfg.replace(n_classes=ds.n_classes)
    from yolat_tpu.eval.fast_forward import extra_plans_for

    loader = PackedLoader(ds, batch_size=1, n_devices=1, shuffle=False,
                          dense=True, extra_plans=extra_plans_for(cfg))
    example = {k: v[0] for k, v in next(iter(loader)).items()}
    state, _, _ = load_checkpoint(cfg, example)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    fast = args.serve_mode in ("fast", "fast_bf16")
    folded = None
    if fast:
        from yolat_tpu.eval.fast_forward import fold_params_for

        folded = fold_params_for(cfg, variables)
    predict = make_predict_fn(cfg, max_det=cfg.max_det, fast=fast,
                              folded=folded, bf16=args.serve_mode == "fast_bf16")

    # param count (reference prints it at detect.py:211-212); the compiled
    # FLOPs print happens after the first batch so the already-warm jit
    # cache is reused instead of compiling the program twice
    import jax

    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(state.params))
    print(f"params: {n_params / 1e6:.3f} M")

    class_names = [""] * cfg.n_classes
    for k, v in ds.class_dict.items():
        class_names[v] = k

    os.makedirs(args.out_dir, exist_ok=True)
    times = []
    for i, stacked in enumerate(loader):
        if args.max_images and i >= args.max_images:
            break
        batch = {k: v[0] for k, v in stacked.items()}
        t0 = time.perf_counter()
        out = predict(variables, batch)
        out = {k: np.asarray(v) for k, v in out.items()}
        times.append(time.perf_counter() - t0)
        if i == 0:
            # XLA's own cost model, from the compilation the first call
            # just populated (thop/fvcore replacement)
            try:
                costs = predict.lower(variables, batch).compile(
                ).cost_analysis()
                if isinstance(costs, list):
                    costs = costs[0] if costs else {}
                if costs.get("flops"):
                    print(f"compiled forward flops: "
                          f"{costs['flops'] / 1e9:.2f} G")
            except Exception:
                pass

        svg_path = ds.files[i]
        name = os.path.basename(os.path.dirname(svg_path)) + "_" + \
            os.path.basename(svg_path).replace(".svg", ".png")
        w, h = batch["wh"][0]
        if args.merge_nms:
            from yolat_tpu.eval.merge_nms import merge_nms

            kept = out["kept"]
            m = merge_nms(out["prop_boxes"][kept], out["prop_obj"][kept],
                          out["prop_cls"][kept], conf_thres=args.conf_th,
                          nms_thres=0.4)
            det_boxes, det_scores, det_classes = (
                m["boxes"], m["obj_conf"] * m["cls_conf"], m["classes"]
            )
            score_th = 0.0
        else:
            valid = out["valid"][0]
            det_boxes = out["boxes"][0][valid]
            det_scores = out["scores"][0][valid]
            det_classes = out["classes"][0][valid]
            score_th = args.conf_th
        render_detections(
            svg_path, w, h, det_boxes, det_scores, det_classes, class_names,
            os.path.join(args.out_dir, name), score_th=score_th,
        )
        print(f"{svg_path}: {len(det_boxes)} detections")

    if len(times) > 1:
        # skip the first call (compile); the reference's "mean inference
        # time" (detect.py:373) is likewise a warm mean
        warm = times[1:]
        print(f"mean inference time: {1000 * sum(warm) / len(warm):.2f} ms")
    elif times:
        print(f"inference time: {1000 * times[0]:.2f} ms (single image, "
              "includes compilation)")


if __name__ == "__main__":
    main()
