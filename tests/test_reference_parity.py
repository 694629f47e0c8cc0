"""Direct golden-parity tests against the reference source.

Unlike the port-vs-port oracles elsewhere in the suite, these import the
reference's OWN modules from /root/reference and compare its outputs to
ours on identical inputs:

  utils/det_util.py      compute_ap / ap_per_class / get_batch_statistics /
                         bbox_iou (+1 convention) / bbox_iou_cpu /
                         bbox_iou_ios_cpu / greedy merge non_max_suppression
  Datasets/a2c.py        the arc->cubic-Bezier converter
  Datasets/graph_dict3.py  SESYDFloorPlan._get_proposal — the grid-sweep
                         proposal enumeration + labeling + stats, run under
                         sys.modules stubs for torch_geometric/svgpathtools
                         (its proposal walk is pure numpy/python,
                         graph_dict3.py:309-789)

All tests skip gracefully when /root/reference (or torch) is absent.
"""

from __future__ import annotations

import os
import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def ref():
    torch = pytest.importorskip("torch")

    # torch_geometric / svgpathtools are not installed here; the code paths
    # under test never touch them, so satisfy the imports with stubs
    if "torch_geometric" not in sys.modules:
        tg = types.ModuleType("torch_geometric")
        tgd = types.ModuleType("torch_geometric.data")

        class Data:
            def __init__(self, **kw):
                self.__dict__.update(kw)

        tgd.Data = Data
        tg.data = tgd
        sys.modules["torch_geometric"] = tg
        sys.modules["torch_geometric.data"] = tgd
    if "svgpathtools" not in sys.modules:
        sp = types.ModuleType("svgpathtools")

        class _Stub:
            def __init__(self, *a, **k):
                pass

        for name in ("parse_path", "wsvg", "Path", "Line", "QuadraticBezier",
                     "CubicBezier", "Arc"):
            setattr(sp, name, type(name, (_Stub,), {}))
        sys.modules["svgpathtools"] = sp

    if REF not in sys.path:
        sys.path.insert(0, REF)
    det_util = pytest.importorskip("utils.det_util")
    a2c = pytest.importorskip("Datasets.a2c")
    graph_dict3 = pytest.importorskip("Datasets.graph_dict3")
    return SimpleNamespace(det_util=det_util, a2c=a2c,
                           graph_dict3=graph_dict3, torch=torch)


# ---------------------------------------------------------------- det_util


def test_compute_ap_matches_reference(ref):
    rng = np.random.default_rng(10)
    from yolat_tpu.eval.metrics import average_precision

    for _ in range(50):
        n = int(rng.integers(1, 40))
        recall = np.sort(rng.random(n))
        precision = rng.random(n)
        ours = average_precision(recall, precision)
        theirs = float(ref.det_util.compute_ap(recall.copy(), precision.copy()))
        assert ours == pytest.approx(theirs, abs=1e-12)


def test_ap_per_class_matches_reference(ref):
    rng = np.random.default_rng(11)
    from yolat_tpu.eval.metrics import ap_per_class

    for trial in range(20):
        d = int(rng.integers(1, 60))
        tp = (rng.random(d) < 0.5).astype(np.float64)
        # distinct confidences: both sides argsort(-conf); ties would make
        # the comparison depend on sort stability, not on the math
        conf = rng.permutation(d) / d + rng.random() * 0.01
        pred_cls = rng.integers(0, 5, size=d).astype(np.float64)
        target_cls = rng.integers(0, 5, size=int(rng.integers(1, 30))).astype(
            np.float64
        )
        p0, r0, ap0, f10, c0 = ap_per_class(tp, conf, pred_cls, target_cls)
        p1, r1, ap1, f11, c1 = ref.det_util.ap_per_class(
            tp.copy(), conf.copy(), pred_cls.copy(), target_cls.copy()
        )
        np.testing.assert_allclose(ap0, ap1, atol=1e-12)
        np.testing.assert_allclose(p0, p1, atol=1e-12)
        np.testing.assert_allclose(r0, r1, atol=1e-12)
        np.testing.assert_array_equal(c0, c1.astype(np.int64))


def _random_boxes(rng, n, scale=100.0):
    xy = rng.random((n, 2)) * scale
    wh = rng.random((n, 2)) * scale * 0.3 + 1.0
    return np.concatenate([xy, xy + wh], axis=1)


def test_iou_conventions_match_reference(ref):
    rng = np.random.default_rng(12)
    from yolat_tpu.geom.proposals import _iou_ios
    from yolat_tpu.ops.iou import box_iou_pairwise

    import jax.numpy as jnp

    for _ in range(10):
        a = _random_boxes(rng, 7)
        b = _random_boxes(rng, 7)
        # +1-pixel convention (bbox_iou:214-244, torch)
        # jnp runs f32 here (device ops), the reference f64 — tolerance
        # reflects the dtype gap, not an algorithmic one
        ours = np.asarray(box_iou_pairwise(jnp.asarray(a), jnp.asarray(b),
                                           plus1=True))
        theirs = ref.det_util.bbox_iou(
            ref.torch.tensor(a), ref.torch.tensor(b)
        ).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-6)
        # no +1 convention (bbox_iou_cpu:279)
        ours2 = np.asarray(box_iou_pairwise(jnp.asarray(a), jnp.asarray(b)))
        theirs2 = ref.det_util.bbox_iou_cpu(a, b)
        np.testing.assert_allclose(ours2, theirs2, rtol=1e-4, atol=1e-6)
        # iou + intersection-over-smaller... actually over box2 area
        # (bbox_iou_ios_cpu:311-341 — used for proposal has_obj labeling)
        one = a[:1]
        iou_ref, ios_ref = ref.det_util.bbox_iou_ios_cpu(one, b)
        iou_ours, ios_ours = _iou_ios(one[0], b)
        np.testing.assert_allclose(iou_ours, iou_ref, rtol=1e-9)
        np.testing.assert_allclose(ios_ours, ios_ref, rtol=1e-9)


def test_batch_statistics_matches_reference(ref):
    rng = np.random.default_rng(13)
    from yolat_tpu.eval.metrics import batch_statistics

    torch = ref.torch
    for trial in range(25):
        d = int(rng.integers(0, 25))
        g = int(rng.integers(0, 8))
        det_boxes = _random_boxes(rng, d)
        det_scores = np.sort(rng.random(d))[::-1].copy()
        det_labels = rng.integers(0, 4, size=d).astype(np.float64)
        gt_boxes = _random_boxes(rng, g)
        # overlap some detections with GTs so TPs actually occur
        for i in range(min(d, g)):
            if rng.random() < 0.6:
                det_boxes[i] = gt_boxes[i] + rng.normal(0, 1.5, size=4)
        gt_labels = rng.integers(0, 4, size=g).astype(np.float64)
        th = float(rng.choice([0.5, 0.75, 0.95]))

        out = torch.tensor(
            np.concatenate(
                [det_boxes, det_scores[:, None], np.ones((d, 1)),
                 det_labels[:, None]], axis=1
            )
        )
        targets = torch.tensor(
            np.concatenate(
                [np.zeros((g, 1)), gt_labels[:, None], gt_boxes], axis=1
            )
        )
        theirs = ref.det_util.get_batch_statistics([out], targets, th)
        tp_ref = theirs[0][0]
        tp_ours, _, _ = batch_statistics(det_boxes, det_scores, det_labels,
                                         gt_boxes, gt_labels, th)
        np.testing.assert_array_equal(tp_ours, tp_ref)


def test_merge_nms_matches_reference(ref):
    rng = np.random.default_rng(14)
    from yolat_tpu.eval.merge_nms import merge_nms

    torch = ref.torch
    for trial in range(20):
        m = int(rng.integers(1, 40))
        k = 5
        boxes = _random_boxes(rng, m, scale=50.0)
        # clusters of near-duplicate boxes exercise the weighted merge.
        # Keep every box well-formed (x0<x1, y0<y1): on an INVERTED box the
        # reference's clamped +1 IoU gives self-IoU 0, its suppression set
        # goes empty, the weighted merge divides by zero and its while-loop
        # never terminates (det_util.py:386-409) — real pipeline boxes are
        # always well-formed, so parity is only defined there (our merge_nms
        # terminates either way).
        for i in range(1, m):
            if rng.random() < 0.5:
                b = boxes[i - 1] + rng.normal(0, 1.0, size=4)
                boxes[i, :2] = b[:2]
                boxes[i, 2:] = np.maximum(b[2:], b[:2] + 0.5)
        obj = rng.permutation(m) / m * 0.8 + 0.1
        cls_scores = rng.random((m, k))
        pred = torch.tensor(
            np.concatenate([boxes, obj[:, None], cls_scores], axis=1)
        )
        theirs = ref.det_util.non_max_suppression(
            [pred], conf_thres=0.5, nms_thres=0.4
        )[0].numpy()
        ours = merge_nms(boxes, obj, cls_scores, conf_thres=0.5,
                         nms_thres=0.4)
        assert len(ours["boxes"]) == len(theirs)
        np.testing.assert_allclose(ours["boxes"], theirs[:, :4], rtol=1e-6,
                                   atol=1e-8)
        # the reference casts through float32 (`class_confs.float()`)
        np.testing.assert_allclose(ours["obj_conf"], theirs[:, 4], rtol=1e-5)
        np.testing.assert_allclose(ours["cls_conf"], theirs[:, 5], rtol=1e-5)
        np.testing.assert_array_equal(ours["classes"], theirs[:, 6].astype(np.int64))


# -------------------------------------------------------------------- a2c


def test_a2c_matches_reference(ref):
    rng = np.random.default_rng(15)
    from yolat_tpu.geom.arc2bezier import arc_to_cubics

    cases = []
    for _ in range(60):
        x1, y1 = rng.normal(0, 50, size=2)
        x2, y2 = rng.normal(0, 50, size=2)
        rx, ry = rng.random(2) * 60 + 0.5
        phi = float(rng.uniform(-360, 360))
        fa = int(rng.integers(0, 2))
        fs = int(rng.integers(0, 2))
        cases.append((x1, y1, x2, y2, fa, fs, rx, ry, phi))
    # degenerate early-outs (a2c.py:129-135)
    cases += [(5.0, 5.0, 5.0, 5.0, 0, 0, 10.0, 10.0, 0.0),
              (0.0, 0.0, 10.0, 0.0, 0, 0, 0.0, 10.0, 0.0),
              # out-of-range radii -> lambda compensation (a2c.py:142-145)
              (0.0, 0.0, 100.0, 0.0, 1, 1, 5.0, 5.0, 30.0)]

    for (x1, y1, x2, y2, fa, fs, rx, ry, phi) in cases:
        theirs = ref.a2c.a2c(x1, y1, x2, y2, fa, fs, rx, ry, phi)
        ours = arc_to_cubics(x1, y1, x2, y2, rx, ry, phi, fa, fs)
        assert len(ours) == len(theirs)
        for k, curve in enumerate(theirs):
            ref_pts = np.array([[c.real, c.imag] for c in curve])
            # the radii-compensated case (lambda>1) drives the center
            # radicand to exactly 0 mathematically; both sides then take
            # sqrt of a rounding-level residual and diverge at ~1e-8
            np.testing.assert_allclose(ours[k], ref_pts, rtol=1e-6, atol=1e-6)


# -------------------------------------------------- graph_dict3 proposals


def _ref_schema_graph(g: dict) -> dict:
    """Re-nest our flat graph dict into the reference .pkl schema."""
    n = len(g["pos"])

    def col(x):
        return np.asarray(x).reshape(n, 1)

    return {
        "pos": {"spatial": np.asarray(g["pos"], dtype=np.float64)},
        "attr": {
            "is_control": col(np.asarray(g["attr"]["is_control"]).astype(np.float64)),
            "is_super": col(np.asarray(g["attr"]["is_super"]).astype(np.float64)),
        },
        "edge": {
            "shape": np.asarray(g["edge"]["shape"], dtype=np.int64).reshape(-1, 2),
            "super": np.asarray(g["edge"]["super"], dtype=np.int64).reshape(-1, 2),
        },
        "edge_attr": {
            "shape": np.asarray(g["edge_attr"]["shape"], dtype=np.float64),
            "super": np.asarray(g["edge_attr"]["super"], dtype=np.float64),
        },
        "img_width": g["img_width"],
        "img_height": g["img_height"],
        "cc": [list(map(int, c)) for c in g["cc"]],
    }


def _proposal_fingerprints(bbox, labels, has_obj, stat_feats, slice_pos,
                           slice_edge, slice_super, pos):
    """Order-independent per-proposal fingerprints.

    The reference's proposal order inside a CC comes from `list(set(...))`
    (graph_dict3.py:557) — arbitrary — so parity is a multiset property.
    """
    fps = []
    for i in range(len(labels)):
        p = pos[slice_pos[i]:slice_pos[i + 1]]
        pos_key = tuple(sorted(map(tuple, np.round(p, 9).tolist())))
        fps.append((
            tuple(np.round(bbox[i], 9).tolist()),
            int(labels[i]),
            int(has_obj[i]),
            int(slice_pos[i + 1] - slice_pos[i]),
            int(slice_edge[i + 1] - slice_edge[i]),
            int(slice_super[i + 1] - slice_super[i]),
            tuple(np.round(stat_feats[i], 7).tolist()),
            pos_key,
        ))
    return sorted(fps)


@pytest.mark.slow
def test_get_proposal_matches_reference(ref, tmp_path):
    """True golden parity for the trickiest contract in the repo: run the
    reference's _get_proposal on OUR graph dict and compare proposal sets,
    labels, has_obj flags, stats features, slice structure and root choice
    (fingerprint multisets — the reference's intra-CC order is a set walk).
    """
    from yolat_tpu.data.synthetic import FLOORPLAN_CLASSES, write_dataset
    from yolat_tpu.geom.graph_build import build_svg_graph
    from yolat_tpu.geom.proposals import generate_proposals
    from yolat_tpu.geom.svg_io import SVGDocument, read_ground_truth_boxes

    root = str(tmp_path / "mini")
    write_dataset(root, n_train=2, n_test=0, seed=3, width=700.0,
                  height=500.0, n_rooms=2, symbols_per_room=(1, 2))
    with open(os.path.join(root, "train_list.txt")) as f:
        files = [os.path.join(root, l.strip()) for l in f if l.strip()]

    # reference dataset object without __init__ (which wants stats.pkl +
    # torch Dataset machinery); _get_proposal reads only these attributes
    GD = ref.graph_dict3.SESYDFloorPlan
    obj = GD.__new__(GD)
    obj.do_mixup = False
    obj.normalize_bbox = True
    obj.n_classes = len(FLOORPLAN_CLASSES)

    step = 5
    checked = 0
    for path in files:
        doc = SVGDocument.from_file(path)
        g = build_svg_graph(doc, mode="floorplan")
        gt_bbox, gt_labels = read_ground_truth_boxes(
            path.replace(".svg", ".xml"), g["img_width"], g["img_height"],
            FLOORPLAN_CLASSES,
        )

        (pos_r, is_super_r, _, edge_r, edge_super_r, e_attr_r,
         e_attr_super_r, labels_r, bbox_idx_r, bbox_r, bbox_targets_r,
         stats_r, has_obj_r, roots_r) = obj._get_proposal(
            _ref_schema_graph(g), gt_bbox, gt_labels, bbox_sampling_step=step
        )

        pf = generate_proposals(g, gt_bbox, gt_labels,
                                len(FLOORPLAN_CLASSES),
                                bbox_sampling_step=step, do_mixup=False)

        assert pf.n_proposals == len(labels_r)
        assert len(pf.pos) == len(pos_r)
        assert len(pf.edge) == len(edge_r)
        assert len(pf.edge_super) == len(edge_super_r)

        # reconstruct the reference's per-proposal slices from bbox_idx
        # (contiguous by construction)
        bbox_idx_r = np.asarray(bbox_idx_r)
        P = len(labels_r)
        sp = np.searchsorted(bbox_idx_r, np.arange(P + 1))
        # edge slices: edges are emitted per proposal with node ids offset
        # into the flat pos array; recover ownership via slice_pos
        own_e = np.searchsorted(sp, np.asarray(edge_r)[:, 0], side="right") - 1
        se = np.searchsorted(own_e, np.arange(P + 1))
        own_s = (np.searchsorted(sp, np.asarray(edge_super_r)[:, 0], side="right") - 1
                 if len(edge_super_r) else np.zeros(0, np.int64))
        ss = np.searchsorted(own_s, np.arange(P + 1))

        fps_ref = _proposal_fingerprints(
            np.asarray(bbox_r), np.asarray(labels_r), np.asarray(has_obj_r),
            np.asarray(stats_r), sp, se, ss, np.asarray(pos_r),
        )
        fps_ours = _proposal_fingerprints(
            pf.bbox, pf.labels, pf.has_obj, pf.stat_feats, pf.slice_pos,
            pf.slice_edge, pf.slice_super, pf.pos,
        )
        assert fps_ref == fps_ours

        # root choice per CC: compare the multiset of root-proposal boxes
        root_boxes_ref = sorted(
            tuple(np.round(np.asarray(bbox_r)[r.value["idx_bbox"]], 9).tolist())
            for r in roots_r
        )
        root_boxes_ours = sorted(
            tuple(np.round(pf.bbox[i], 9).tolist()) for i in pf.root_of_cc
        )
        assert root_boxes_ref == root_boxes_ours
        checked += 1
    assert checked == len(files)


# --------------------------------------------- svg_parser graph builder


class _Cubic:
    """Stub of svgpathtools' CubicBezier: the reference builder only reads
    .start/.control1/.control2/.end as complex numbers."""

    def __init__(self, seg):
        self.start = complex(seg[0][0], seg[0][1])
        self.control1 = complex(seg[1][0], seg[1][1])
        self.control2 = complex(seg[2][0], seg[2][1])
        self.end = complex(seg[3][0], seg[3][1])


def _edge_fingerprints(pos, edges, attrs=None, nd=9):
    """Order/node-id-independent edge fingerprints: endpoint positions
    (lexicographically sorted), plus the pooled edge attr when given."""
    fps = []
    for i, e in enumerate(np.asarray(edges).reshape(-1, 2)):
        a = tuple(np.round(pos[e[0]], nd).tolist())
        b = tuple(np.round(pos[e[1]], nd).tolist())
        key = (min(a, b), max(a, b))
        if attrs is not None:
            fps.append(key + (tuple(np.round(attrs[i], nd).tolist()),))
        else:
            fps.append(key)
    return sorted(fps)


@pytest.mark.slow
def test_graph_builder_and_merge_match_reference(ref, tmp_path):
    """Golden parity for the Bezier->graph builder + node merge
    (SVGGraphBuilderBezier2.bezierPath2Graph + mergeNode,
    svg_parser.py:49-268) on our own synthetic scenes: same cubic
    segments in, same merged graph out (nodes, shape/control edges and
    mean-pooled shape-edge attributes compared as position-keyed
    multisets — node numbering is not semantically load-bearing)."""
    from yolat_tpu.data.synthetic import write_dataset
    from yolat_tpu.geom.graph_build import cubics_to_graph, merge_nodes
    from yolat_tpu.geom.bezier import primitives_to_cubics
    from yolat_tpu.geom.split_cross import split_cross
    from yolat_tpu.geom.svg_io import SVGDocument

    root = str(tmp_path / "gb")
    write_dataset(root, n_train=2, n_test=0, seed=21, width=600.0,
                  height=450.0, n_rooms=2, symbols_per_room=(1, 2))
    with open(os.path.join(root, "train_list.txt")) as f:
        files = [os.path.join(root, l.strip()) for l in f if l.strip()]

    GB = ref.graph_dict3.SVGGraphBuilderBezier  # = SVGGraphBuilderBezier2
    builder = GB()

    for path in files:
        doc = SVGDocument.from_file(path)
        cubics = primitives_to_cubics(split_cross(doc.shapes))

        # reference build on identical cubic segments
        node_dict = builder.bezierPath2Graph(
            [_Cubic(seg) for seg in cubics],
            {"width": doc.width, "height": doc.height, "stroke": "black",
             "stroke-width": 6},
        )
        for key in node_dict:  # the __main__'s list->array conversion
            for k in node_dict[key]:
                node_dict[key][k] = np.array(node_dict[key][k])
                if node_dict[key][k].ndim == 1:
                    node_dict[key][k] = node_dict[key][k][:, None]
        ref_g = builder.mergeNode(node_dict)
        ref_pos = np.asarray(ref_g["pos"]["spatial"])

        ours = merge_nodes(cubics_to_graph(cubics, doc.width, doc.height))
        our_pos = np.asarray(ours["pos"])

        assert len(our_pos) == len(ref_pos)
        # node multiset: (pos, is_control, color, stroke_width)
        def node_keys(pos, attr):
            cols = np.concatenate(
                [pos, np.asarray(attr["is_control"]).reshape(-1, 1),
                 np.asarray(attr["color"]).reshape(len(pos), -1),
                 np.asarray(attr["stroke_width"]).reshape(-1, 1)], axis=1)
            return sorted(map(tuple, np.round(cols, 9).tolist()))
        assert node_keys(our_pos, ours["attr"]) == node_keys(ref_pos, ref_g["attr"])

        # shape edges + mean-pooled attrs; control edges
        ref_fp = _edge_fingerprints(ref_pos, ref_g["edge"]["shape"],
                                    np.asarray(ref_g["edge_attr"]["shape"]))
        our_fp = _edge_fingerprints(our_pos, ours["edge"]["shape"],
                                    np.asarray(ours["edge_attr"]["shape"]))
        assert ref_fp == our_fp
        assert _edge_fingerprints(ref_pos, ref_g["edge"]["control"]) == \
            _edge_fingerprints(our_pos, ours["edge"]["control"])


@pytest.mark.slow
def test_merge_cc_matches_reference(ref, tmp_path):
    """Golden parity for the CC/super-edge builder (mergeCC +
    getConnnectedComponent, build_graph_bbox.py:53-213): run the
    reference's own function on OUR merged graph (identical node ids) and
    compare intra-CC cliques, cross-CC containment edges, their 6-dim
    attrs, and the transitively merged CC partition."""
    np.bool = np.bool_  # the reference predates numpy 2.0's removal
    import utils.svg_utils.build_graph_bbox as bgb

    from yolat_tpu.data.synthetic import write_dataset
    from yolat_tpu.geom.graph_build import (
        build_svg_graph,
        merge_connected_components,
        merge_nodes,
        cubics_to_graph,
    )
    from yolat_tpu.geom.bezier import primitives_to_cubics
    from yolat_tpu.geom.split_cross import split_cross
    from yolat_tpu.geom.svg_io import SVGDocument

    root = str(tmp_path / "cc")
    write_dataset(root, n_train=2, n_test=0, seed=33, width=700.0,
                  height=500.0, n_rooms=2, symbols_per_room=(1, 2))
    with open(os.path.join(root, "train_list.txt")) as f:
        files = [os.path.join(root, l.strip()) for l in f if l.strip()]

    for path in files:
        doc = SVGDocument.from_file(path)
        cubics = primitives_to_cubics(split_cross(doc.shapes))
        g = merge_nodes(cubics_to_graph(cubics, doc.width, doc.height))

        node_dict = {
            "pos": {"spatial": np.asarray(g["pos"], dtype=np.float64)},
            "attr": {
                "is_control": np.asarray(g["attr"]["is_control"]).reshape(-1, 1),
                "color": np.asarray(g["attr"]["color"]),
            },
            "edge": {"shape": np.asarray(g["edge"]["shape"]).reshape(-1, 2)},
        }
        bgb.width, bgb.height = doc.width, doc.height  # module globals the
        # reference __main__ sets implicitly
        (ss_ref, cross_ref, ss_attr_ref, cross_attr_ref, _paths,
         new_cc_ref) = bgb.mergeCC(node_dict)

        ours = merge_connected_components(g)

        def edge_attr_map(edges, attrs):
            edges = np.asarray(edges).reshape(-1, 2)
            return {tuple(sorted(map(int, e))): np.asarray(a)
                    for e, a in zip(edges, np.asarray(attrs).reshape(len(edges), -1))}

        for ref_e, ref_a, our_e, our_a in (
            (ss_ref, ss_attr_ref, ours["shape_shape_edges"], ours["shape_shape_attr"]),
            (cross_ref, cross_attr_ref, ours["cross_shape_edges"], ours["cross_attr"]),
        ):
            m_ref = edge_attr_map(ref_e, ref_a)
            m_our = edge_attr_map(our_e, our_a)
            assert set(m_ref) == set(m_our)
            for k in m_ref:
                np.testing.assert_allclose(m_our[k], m_ref[k], atol=1e-12)

        # Deliberate deviation: the reference's recursive CC merge
        # (get_all_neighboors, build_graph_bbox.py:164-188) marks the root
        # visited only AFTER recursion, so whenever >=2 CCs merge the root
        # CC's node ids are appended TWICE into the merged cluster — real
        # reference floorplan caches carry duplicated wall-CC ids, which
        # then duplicate nodes/edges inside that CC's proposals. We emit a
        # clean partition; compare after deduplication, and assert the
        # members agree exactly.
        assert sorted(
            sorted(set(map(int, c))) for c in new_cc_ref
        ) == sorted(sorted(map(int, c)) for c in ours["cc"])
        for c in ours["cc"]:
            assert len(set(c)) == len(c)  # ours stays duplicate-free


@pytest.mark.slow
def test_split_cross_matches_reference(ref, tmp_path):
    """Golden parity for the cross-point splitter (split_cross.py:323-389:
    circles split at incident line endpoints into arcs; lines split at
    points lying on them) on our synthetic scenes. The reference parses
    arc paths through svgpathtools; the stub's parse_path is replaced with
    a minimal 'M x y A rx ry rot fa fs x y' reader producing Arc stubs."""
    import re as _re

    sp = sys.modules["svgpathtools"]
    Arc = sp.Arc

    def _parse_path(d):
        m = _re.match(
            r"M\s*([-\d.eE]+)[ ,]\s*([-\d.eE]+)\s*A\s*([-\d.eE]+)[ ,]"
            r"\s*([-\d.eE]+)\s+([-\d.eE]+)\s+([01])\s+([01])\s+"
            r"([-\d.eE]+)[ ,]\s*([-\d.eE]+)", d)
        assert m, f"unexpected path d: {d}"
        x0, y0, rx, ry, rot, fa, fs, x1, y1 = map(float, m.groups())
        a = Arc()
        a.start = complex(x0, y0)
        a.end = complex(x1, y1)
        a.radius = complex(rx, ry)
        a.rotation = rot
        a.large_arc = int(fa)
        a.sweep = int(fs)
        return [a]

    old_parse = sp.parse_path
    sp.parse_path = _parse_path
    try:
        import utils.svg_utils.split_cross as ref_sc

        ref_sc.parse_path = _parse_path  # module already bound the old stub

        from yolat_tpu.data.synthetic import write_dataset
        from yolat_tpu.geom.split_cross import split_cross
        from yolat_tpu.geom.svg_io import SVGDocument

        root = str(tmp_path / "sc")
        write_dataset(root, n_train=3, n_test=0, seed=44, width=800.0,
                      height=600.0, n_rooms=3, symbols_per_room=(1, 2))
        with open(os.path.join(root, "train_list.txt")) as f:
            files = [os.path.join(root, l.strip()) for l in f if l.strip()]

        def rows(a, width):
            a = np.asarray(a, dtype=np.float64).reshape(-1, width)
            return sorted(map(tuple, np.round(a, 9).tolist()))

        for path in files:
            doc = SVGDocument.from_file(path)
            theirs = ref_sc.split_cross(doc.shapes)
            ours = split_cross(doc.shapes)

            assert rows(ours["lines"], 4) == rows(theirs["line"]["start_end"], 4)
            assert rows(ours["circles"], 3) == rows(theirs["circle"]["param"], 3)
            ref_arcs = (np.concatenate(
                [np.asarray(theirs["arc"]["start_end"], np.float64).reshape(-1, 4),
                 np.asarray(theirs["arc"]["param"], np.float64).reshape(-1, 5)],
                axis=1) if len(theirs["arc"]["start_end"]) else
                np.zeros((0, 9)))
            assert rows(ours["arcs"], 9) == rows(ref_arcs, 9)
    finally:
        sp.parse_path = old_parse


@pytest.mark.slow
def test_merge_cluster_diagram_matches_reference(ref, tmp_path):
    """Golden parity for the diagrams proximity CC grouping (mergeCluster,
    build_graph_bbox_diagram.py:110-176 with the 40px expansion at :198):
    expanded boxes clamp to the unit image and touching extents merge."""
    np.bool = np.bool_
    # mergeCluster's inner `from det_util import bbox_iou` expects to run
    # with the reference's utils/ on sys.path; alias the loaded module
    sys.modules.setdefault("det_util", ref.det_util)
    import utils.svg_utils.build_graph_bbox_diagram as bgd

    from yolat_tpu.data.synthetic import write_diagram_dataset
    from yolat_tpu.geom.graph_build import (
        connected_components,
        merge_cluster_diagram,
        merge_nodes,
        cubics_to_graph,
    )
    from yolat_tpu.geom.bezier import primitives_to_cubics
    from yolat_tpu.geom.split_cross import split_cross
    from yolat_tpu.geom.svg_io import SVGDocument

    root = str(tmp_path / "diag")
    write_diagram_dataset(root, n_train=3, n_test=0, seed=9)
    with open(os.path.join(root, "train_list.txt")) as f:
        files = [os.path.join(root, l.strip()) for l in f if l.strip()]

    for path in files:
        doc = SVGDocument.from_file(path)
        cubics = primitives_to_cubics(split_cross(doc.shapes))
        g = merge_nodes(cubics_to_graph(cubics, doc.width, doc.height))
        ccs = connected_components(g)
        pos = np.asarray(g["pos"], dtype=np.float64)

        bboxs = []
        for c in ccs:
            p = pos[c]
            bboxs.append((p[:, 0].min(), p[:, 1].min(),
                          p[:, 0].max(), p[:, 1].max()))
        ref_cc, _ref_boxes = bgd.mergeCluster(
            [list(c) for c in ccs], bboxs, ratio=None,
            expand_length=(40 / doc.width, 40 / doc.height),
        )
        ours = merge_cluster_diagram(pos, ccs, doc.width, doc.height)

        assert sorted(sorted(map(int, c)) for c in ref_cc) == \
            sorted(sorted(map(int, c)) for c in ours)
