"""Legacy dataset variants (graphs 'bezier', 'shape', 'bezier_edge_attr').

Counterparts of Datasets/svg.py, svg2.py, svg3.py — the on-the-fly
node-classification datasets that fed the reference's absent centernet-style
architectures (SURVEY.md: keep as registry entries). Provided for surface
completeness:

  * build_graph_v1: per-shape Bezier graphs merged, original stroke
    attributes kept (unlike the canonical offline build, which forces
    black/6 — build_graph_bbox.py:322-327), edge attrs truncated to the
    4-dim v1 layout [c1-start, c2-end] (svg_parser.py:557-561);
  * node_ground_truth: per-node GT box/class/object by point-in-gt-box test
    with 1e-3 slack, ties resolved by nearest top-left corner, control
    nodes inheriting from a control-edge endpoint neighbour
    (svg.py gen_y:131-212, graph_dict3.refine_gt:153-234);
  * strip_control_nodes: the svg3 variant (svg3.py:297-320);
  * shape_features: the svg2 per-primitive 17-dim feature table + proximity
    edges (SVGGraphBuilderShape, svg_parser.py:338-460).
"""

from __future__ import annotations

import numpy as np

from yolat_tpu.geom.bezier import shape_to_cubics
from yolat_tpu.geom.graph_build import cubics_to_graph, merge_nodes
from yolat_tpu.geom.svg_io import ARC, SVGDocument, parse_path_d


def build_graph_v1(doc: SVGDocument, v1_edge_attr: bool = True) -> dict:
    """Per-shape graphs concatenated then merged (buildGraph,
    svg_parser.py:303-336), without split_cross."""
    offset = 0
    all_pos, all_color, all_sw, all_ic = [], [], [], []
    all_shape, all_control, all_attr = [], [], []
    for shape in doc.shapes:
        cubics = shape_to_cubics(shape)
        g = cubics_to_graph(
            cubics, doc.width, doc.height,
            stroke=shape.get("stroke", "black"),
            stroke_width=float(shape.get("stroke-width", 3.0)),
        )
        n = len(g["pos"])
        all_pos.append(g["pos"])
        all_color.append(g["attr"]["color"])
        all_sw.append(g["attr"]["stroke_width"])
        all_ic.append(g["attr"]["is_control"])
        all_shape.append(g["edge"]["shape"] + offset)
        all_control.append(g["edge"]["control"] + offset)
        all_attr.append(g["edge_attr"]["shape"])
        offset += n

    raw = {
        "pos": np.concatenate(all_pos, axis=0),
        "attr": {
            "color": np.concatenate(all_color, axis=0),
            "stroke_width": np.concatenate(all_sw, axis=0),
            "is_control": np.concatenate(all_ic, axis=0),
        },
        "edge": {
            "shape": np.concatenate(all_shape, axis=0),
            "control": np.concatenate(all_control, axis=0),
        },
        "edge_attr": {"shape": np.concatenate(all_attr, axis=0)},
    }
    g = merge_nodes(raw)
    if v1_edge_attr:
        g["edge_attr"]["shape"] = g["edge_attr"]["shape"][:, 0:4]
    return g


def node_ground_truth(graph: dict, gt_bbox: np.ndarray, gt_labels: np.ndarray,
                      th: float = 1e-3):
    """Per-node (gt_box [N,4], gt_cls [N], gt_obj [N])."""
    pos = np.asarray(graph["pos"], dtype=np.float64)
    is_control = np.asarray(graph["attr"]["is_control"]).reshape(-1) > 0.5
    n = len(pos)

    gt_bb = np.zeros((n, 4))
    gt_cls = np.zeros(n, dtype=np.int64)
    gt_obj = np.zeros(n, dtype=np.int64)

    for i in range(n):
        if is_control[i]:
            continue
        p = pos[i]
        inside = (
            (p[0] - gt_bbox[:, 0] >= -th)
            & (p[1] - gt_bbox[:, 1] >= -th)
            & (p[0] - gt_bbox[:, 2] <= th)
            & (p[1] - gt_bbox[:, 3] <= th)
        )
        idx = np.where(inside)[0]
        if len(idx) == 0:
            raise ValueError(f"node {p} outside all ground-truth boxes")
        if len(idx) > 1:
            d = np.linalg.norm(gt_bbox[idx, 0:2] - p[None, :], axis=1)
            idx = idx[np.argsort(d, kind="stable")]
        gt_bb[i] = gt_bbox[idx[0]]
        gt_cls[i] = gt_labels[idx[0]]
        gt_obj[i] = idx[0]

    # control nodes inherit from a non-control neighbour over control edges
    owner = np.full(n, -1, dtype=np.int64)
    for a, b in np.asarray(graph["edge"]["control"], dtype=np.int64):
        if not is_control[a] and is_control[b] and owner[b] < 0:
            owner[b] = a
        elif not is_control[b] and is_control[a] and owner[a] < 0:
            owner[a] = b
    for i in np.where(is_control)[0]:
        if owner[i] >= 0:
            gt_bb[i] = gt_bb[owner[i]]
            gt_cls[i] = gt_cls[owner[i]]
            gt_obj[i] = gt_obj[owner[i]]
    return gt_bb, gt_cls, gt_obj


def strip_control_nodes(graph: dict):
    """Drop control nodes, reindex shape edges (svg3.py:297-320)."""
    is_control = np.asarray(graph["attr"]["is_control"]).reshape(-1) > 0.5
    o2n = np.cumsum(~is_control) - 1
    keep_edge = []
    for a, b in np.asarray(graph["edge"]["shape"], dtype=np.int64):
        if not is_control[a] and not is_control[b]:
            keep_edge.append([o2n[a], o2n[b]])
    out = {
        "pos": graph["pos"][~is_control],
        "attr": {k: np.asarray(v).reshape(len(is_control), -1)[~is_control]
                 for k, v in graph["attr"].items()},
        "edge": {"shape": np.asarray(keep_edge, dtype=np.int64).reshape(-1, 2)},
        "edge_attr": dict(graph["edge_attr"]),
    }
    return out, ~is_control


def shape_features(doc: SVGDocument):
    """Per-primitive 17-dim feature table + centre positions (the svg2
    'shape' graph; SVGGraphBuilderShape.buildGraph, svg_parser.py:377-460).

    Layout: [0:4] line x1 y1 x2 y2; [4:13] arc params; [13:17] circle
    cx cy rx ry — all normalised by image size.
    """
    feats, centers = [], []
    w, h = doc.width, doc.height
    for shape in doc.shapes:
        f = np.zeros(17)
        name = shape["shape_name"]
        if name == "line":
            x1, y1 = float(shape["x1"]) / w, float(shape["y1"]) / h
            x2, y2 = float(shape["x2"]) / w, float(shape["y2"]) / h
            f[0:4] = (x1, y1, x2, y2)
            centers.append(((x1 + x2) / 2, (y1 + y2) / 2))
        elif name == "circle":
            cx, cy = float(shape["cx"]) / w, float(shape["cy"]) / h
            r = float(shape["r"])
            f[13:17] = (cx, cy, r / w, r / h)
            centers.append((cx, cy))
        elif name == "path":
            segs = parse_path_d(shape["d"])
            placed = False
            for kind, p in segs:
                if kind == ARC:
                    x0, y0, x1, y1, rx, ry, rot, fa, fs = p
                    f[4:13] = (x0 / w, y0 / h, x1 / w, y1 / h,
                               rx / w, ry / h, rot, fa, fs)
                    centers.append(((x0 / w + x1 / w) / 2, (y0 / h + y1 / h) / 2))
                    placed = True
                    break
            if not placed:
                continue
        else:
            continue
        feats.append(f)
    return (np.asarray(feats).reshape(-1, 17),
            np.asarray(centers).reshape(-1, 2))


def proximity_edges(pos: np.ndarray, th: float = 5e-3):
    """Distance-thresholded edges with 1-dist weights row-normalised
    (buildPosEdge, svg_parser.py:348-375; includes the reference's
    self-loop-permitting semantics for the shape variant)."""
    d = np.linalg.norm(pos[:, None, :] - pos[None, :, :], axis=-1)
    edges, weights = [], []
    for i in range(len(pos)):
        close = np.where(d[i] < th)[0]
        ws = 1.0 - d[i, close]
        total = ws.sum()
        for j, wv in zip(close, ws):
            edges.append((i, int(j)))
            weights.append(wv / total if total > 0 else 0.0)
    return (np.asarray(edges, dtype=np.int64).reshape(-1, 2),
            np.asarray(weights))
