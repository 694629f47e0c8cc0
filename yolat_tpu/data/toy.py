"""In-memory toy fixtures.

Two generators:
  * toy_shape_dataset — the counterpart of the reference's only synthetic
    fixture (Datasets/toy_dataset.py): procedural circle/triangle/rectangle
    single-shape graphs with a per-shape class label.
  * random_packed_batch — a fabricated, structurally valid packed batch
    (random graphs + proposals) for compile checks and benchmarks that must
    not depend on files on disk.
"""

from __future__ import annotations

import numpy as np

from yolat_tpu.data.packing import PadSizes, pack_files
from yolat_tpu.geom.bezier import circle_to_cubics, line_to_cubic
from yolat_tpu.geom.graph_build import (
    cubics_to_graph,
    merge_connected_components,
    merge_nodes,
)
from yolat_tpu.geom.proposals import generate_proposals

TOY_CLASSES = {"circle": 0, "triangle": 1, "rectangle": 2}


def _toy_cubics(kind: str, rng: np.random.Generator) -> np.ndarray:
    if kind == "circle":
        r = rng.uniform(0.1, 0.45)
        return circle_to_cubics(0.5, 0.5, r)
    if kind == "rectangle":
        w, h = rng.uniform(0.2, 0.9, 2)
        return np.concatenate(
            [
                line_to_cubic(0, 0, w, 0),
                line_to_cubic(w, 0, w, h),
                line_to_cubic(w, h, 0, h),
                line_to_cubic(0, h, 0, 0),
            ]
        )
    if kind == "triangle":
        p = rng.uniform(0.05, 0.95, (3, 2))
        return np.concatenate(
            [
                line_to_cubic(*p[0], *p[1]),
                line_to_cubic(*p[1], *p[2]),
                line_to_cubic(*p[2], *p[0]),
            ]
        )
    raise ValueError(kind)


def toy_shape_sample(rng: np.random.Generator):
    """One toy graph + label, shapes in the unit square (width=height=1)."""
    kind = list(TOY_CLASSES)[int(rng.integers(len(TOY_CLASSES)))]
    cubics = _toy_cubics(kind, rng)
    graph = merge_nodes(cubics_to_graph(cubics, 1.0, 1.0, stroke_width=3.0))
    return graph, TOY_CLASSES[kind]


class ToyDataset:
    """Per-node shape-classification toy dataset (the reference's
    Datasets/toy_dataset.py: 2000 procedural circle/triangle/rectangle
    samples, control nodes stripped, every node labelled with the shape
    class). The canonical smoke-test fixture for conv layers."""

    def __init__(self, n_samples: int = 2000, seed: int = 0):
        self.n = n_samples
        self.seed = seed

    def __len__(self):
        return self.n

    def __getitem__(self, idx: int):
        rng = np.random.default_rng(self.seed * 100003 + idx)
        graph, label = toy_shape_sample(rng)
        is_control = graph["attr"]["is_control"].reshape(-1) > 0.5
        o2n = np.cumsum(~is_control) - 1
        edges = []
        for a, b in graph["edge"]["shape"]:
            if not is_control[a] and not is_control[b]:
                edges.append([o2n[a], o2n[b]])
        pos = graph["pos"][~is_control]
        return {
            "x": pos.astype(np.float32),
            "pos": pos.astype(np.float32),
            "edge": np.asarray(edges, dtype=np.int64).reshape(-1, 2),
            "labels": np.full(len(pos), label, dtype=np.int64),
            "label": label,
        }


def random_packed_batch(seed: int = 0, n_images: int = 2,
                        ccs_per_image: int = 3, n_classes: int = 17,
                        step: int = 4, pad: PadSizes | None = None):
    """A structurally valid packed batch built from random rectangle scenes
    through the real geometry + proposal pipeline."""
    rng = np.random.default_rng(seed)
    files, gts, whs = [], [], []
    for _ in range(n_images):
        cubics, boxes, labels = [], [], []
        for c in range(ccs_per_image):
            x0, y0 = rng.uniform(5, 60, 2)
            s = rng.uniform(15, 35)
            cubics.append(
                np.concatenate(
                    [
                        line_to_cubic(x0, y0, x0 + s, y0),
                        line_to_cubic(x0 + s, y0, x0 + s, y0 + s),
                        line_to_cubic(x0 + s, y0 + s, x0, y0 + s),
                        line_to_cubic(x0, y0 + s, x0, y0),
                        line_to_cubic(x0, y0, x0 + s, y0 + s),
                    ]
                )
            )
            boxes.append([x0 / 100, y0 / 100, (x0 + s) / 100, (y0 + s) / 100])
            labels.append(int(rng.integers(n_classes - 1)))
        g = merge_nodes(cubics_to_graph(np.concatenate(cubics), 100.0, 100.0))
        info = merge_connected_components(g)
        g["edge"]["super"] = np.concatenate(
            [info["shape_shape_edges"], info["cross_shape_edges"]], axis=0
        )
        g["edge_attr"]["super"] = np.concatenate(
            [info["shape_shape_attr"], info["cross_attr"]], axis=0
        )
        g["attr"]["is_super"] = np.zeros((len(g["pos"]), 1), bool)
        g["cc"] = info["cc"]
        gt_bbox = np.asarray(boxes)
        gt_labels = np.asarray(labels)
        pf = generate_proposals(g, gt_bbox, gt_labels, n_classes,
                                bbox_sampling_step=step)
        files.append(pf)
        gts.append((gt_bbox, gt_labels))
        whs.append((100.0, 100.0))

    if pad is None:
        pad = PadSizes.for_files(files, [len(g[0]) for g in gts], n_images,
                                 node_mult=256, edge_mult=256,
                                 super_mult=512, prop_mult=32)
    return pack_files(files, gts, whs, pad), pad
