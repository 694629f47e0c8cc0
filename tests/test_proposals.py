"""Proposal-generation tests, including a parity oracle for the rectangle
enumeration against the reference's index-walk semantics
(Datasets/graph_dict3.py:459-555)."""

import numpy as np
import pytest

from yolat_tpu.geom.bezier import line_to_cubic
from yolat_tpu.geom.graph_build import build_svg_graph, cubics_to_graph, merge_nodes
from yolat_tpu.geom.proposals import (
    ProposalFile,
    _enumerate_subclusters,
    generate_proposals,
    mixup,
)
from yolat_tpu.geom.svg_io import SVGDocument, read_ground_truth_boxes


def oracle_subclusters(pos_cluster, step_count):
    """Test oracle: the reference's grid walk, expressed directly.

    For each start grid boundary take the first value-index whose value is
    >= the boundary; for each later end boundary take the last value-index
    whose value is <= it; point sets come from inclusive index-rectangle
    membership; dedupe.
    """
    xv = np.unique(pos_cluster[:, 0])
    yv = np.unique(pos_cluster[:, 1])
    if len(xv) < 2 or len(yv) < 2:
        return set()

    def grids(vmin, vmax):
        step = (vmax - vmin) / step_count
        g = np.append(np.arange(vmin, vmax, step), vmax) if step > 0 else np.array([vmax])
        return g

    def walk(values, bounds):
        """(start_index, remaining bound list position) pairs via the
        sequential move_endpoint_close walk."""
        starts = []
        prev = -1
        for gi, g in enumerate(bounds):
            # first index >= g, searching from prev+1
            x = prev + 1
            while x < len(values) and values[x] < g:
                x += 1
            x0 = x - 1
            if x0 != len(values):
                x0 += 1
            if x0 == prev:
                continue
            prev = x0
            starts.append((x0, gi))
        return starts

    def ends_from(values, bounds, gi0, start):
        ends = []
        prev = start
        for g in bounds[gi0 + 1:]:
            x = prev + 1
            while x < len(values) and values[x] <= g:
                x += 1
            x1 = x - 1
            if x1 == prev:
                continue
            prev = x1
            ends.append(x1)
        return ends

    xg, yg = grids(xv[0], xv[-1]), grids(yv[0], yv[-1])
    xi = np.searchsorted(xv, pos_cluster[:, 0])
    yi = np.searchsorted(yv, pos_cluster[:, 1])

    out = set()
    for y0, giy in walk(yv, yg):
        if y0 >= len(yv):
            continue
        for x0, gix in walk(xv, xg):
            if x0 >= len(xv):
                continue
            for y1 in ends_from(yv, yg, giy, y0):
                for x1 in ends_from(xv, xg, gix, x0):
                    m = (xi >= x0) & (xi <= x1) & (yi >= y0) & (yi <= y1)
                    ids = tuple(np.where(m)[0])
                    if ids:
                        out.add(ids)
    return out


class TestEnumeration:
    @pytest.mark.parametrize("step", [2, 3, 5, 10])
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_reference_walk(self, step, seed):
        rng = np.random.default_rng(seed)
        # clustered coordinates with duplicates, like merged graph nodes
        base = rng.uniform(0, 1, size=(12, 2))
        pts = np.concatenate([base, base[rng.integers(0, 12, 8)]], axis=0)
        got = {tuple(ids) for ids in _enumerate_subclusters(pts, step)}
        want = oracle_subclusters(pts, step)
        assert got == want

    def test_degenerate_line_cluster(self):
        pts = np.array([[0.1, 0.5], [0.4, 0.5], [0.9, 0.5]])  # single y value
        assert _enumerate_subclusters(pts, 5) == []


def _square_graph(x0, y0, s, w=100.0, h=100.0):
    return np.concatenate(
        [
            line_to_cubic(x0, y0, x0 + s, y0),
            line_to_cubic(x0 + s, y0, x0 + s, y0 + s),
            line_to_cubic(x0 + s, y0 + s, x0, y0 + s),
            line_to_cubic(x0, y0 + s, x0, y0),
        ],
        axis=0,
    )


class TestGenerateProposals:
    def _graph(self):
        # a small square nested inside a big one: containment merging makes
        # one CC whose grid windows mix both symbols
        cubics = np.concatenate(
            [_square_graph(10, 10, 60), _square_graph(20, 20, 15)], axis=0
        )
        g = merge_nodes(cubics_to_graph(cubics, 100.0, 100.0))
        from yolat_tpu.geom.graph_build import merge_connected_components

        info = merge_connected_components(g)
        g["edge"]["super"] = np.concatenate(
            [info["shape_shape_edges"], info["cross_shape_edges"]], axis=0
        )
        g["edge_attr"]["super"] = np.concatenate(
            [info["shape_shape_attr"], info["cross_attr"]], axis=0
        )
        g["attr"]["is_super"] = np.zeros((len(g["pos"]), 1), dtype=bool)
        g["cc"] = info["cc"]
        return g

    def test_basic_invariants(self):
        g = self._graph()
        gt = np.array([[0.1, 0.1, 0.7, 0.7], [0.2, 0.2, 0.35, 0.35]])
        gt_labels = np.array([0, 1])
        pf = generate_proposals(g, gt, gt_labels, n_classes=3, bbox_sampling_step=4)

        P = pf.n_proposals
        assert P > 0
        assert len(pf.slice_pos) == P + 1
        assert pf.slice_pos[-1] == len(pf.pos)
        assert pf.slice_edge[-1] == len(pf.edge)
        assert pf.slice_super[-1] == len(pf.edge_super)
        assert len(pf.bbox_idx) == len(pf.pos)
        # bbox_idx consistent with slice_pos ranges
        for p in range(P):
            seg = pf.bbox_idx[pf.slice_pos[p] : pf.slice_pos[p + 1]]
            assert (seg == p).all()
        # edges stay within their proposal's node range
        for p in range(P):
            e = pf.edge[pf.slice_edge[p] : pf.slice_edge[p + 1]]
            assert (e >= pf.slice_pos[p]).all() and (e < pf.slice_pos[p + 1]).all()
        # normalised positions in unit box
        assert pf.pos.min() >= -1e-9 and pf.pos.max() <= 1 + 1e-9
        # stats width/height match raw proposal boxes
        np.testing.assert_allclose(pf.stat_feats[:, 5], pf.bbox[:, 2] - pf.bbox[:, 0])
        # roots are argmax-area proposals of their CC
        for c in range(len(pf.root_of_cc)):
            lo, hi = pf.cc_slice[c], pf.cc_slice[c + 1]
            areas = (pf.bbox[lo:hi, 2] - pf.bbox[lo:hi, 0]) * (
                pf.bbox[lo:hi, 3] - pf.bbox[lo:hi, 1]
            )
            assert pf.root_of_cc[c] == lo + np.argmax(areas)

    def test_labels_iou(self):
        g = self._graph()
        # GT exactly on the two squares (normalised by 100)
        gt = np.array([[0.1, 0.1, 0.7, 0.7], [0.2, 0.2, 0.35, 0.35]])
        gt_labels = np.array([0, 1])
        # canonical floorplans step (10): fine enough to isolate both squares
        pf = generate_proposals(g, gt, gt_labels, n_classes=3, bbox_sampling_step=10)
        # the full-square proposals must carry the right classes
        found = set()
        for p in range(pf.n_proposals):
            box = pf.bbox[p]
            for gi, gb in enumerate(gt):
                iou = _iou(box, gb)
                if iou > 0.99:
                    assert pf.labels[p] == gt_labels[gi]
                    assert pf.has_obj[p] == 1
                    found.add(gi)
        assert found == {0, 1}
        # background labels exist too (big window covering both squares)
        assert (pf.labels == 2).any()

    def test_roundtrip_dict(self):
        g = self._graph()
        gt = np.array([[0.1, 0.1, 0.4, 0.4]])
        pf = generate_proposals(g, gt, np.array([0]), n_classes=3, bbox_sampling_step=3)
        pf2 = ProposalFile.from_dict(pf.to_dict())
        np.testing.assert_array_equal(pf.pos, pf2.pos)


def _iou(a, b):
    ix0, iy0 = max(a[0], b[0]), max(a[1], b[1])
    ix1, iy1 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(ix1 - ix0, 0) * max(iy1 - iy0, 0)
    aa = (a[2] - a[0]) * (a[3] - a[1])
    ab = (b[2] - b[0]) * (b[3] - b[1])
    return inter / (aa + ab - inter + 1e-16)


class TestMixup:
    def test_mixup_doubles_ccs(self):
        rng = np.random.default_rng(0)
        pos = np.array([[0.0, 0.0], [1.0, 0.0], [5.0, 5.0], [6.0, 5.0]])
        cc = [[0, 1], [2, 3]]
        edge = np.array([[0, 1], [2, 3]])
        edge_super = np.array([[0, 1], [2, 3]])
        e_attr = np.random.rand(2, 6)
        e_attr_super = np.random.rand(2, 6)
        is_super = np.zeros(4, bool)
        out = mixup(cc, pos, edge, edge_super, e_attr, e_attr_super, is_super, rng)
        cc2, pos2, edge2, super2, ea2, eas2, is2 = out
        assert len(cc2) == 4
        assert len(pos2) == 4 + 8
        # bipartite super edges appended with zeroed attrs
        assert len(super2) > len(edge_super) + 4
        assert (eas2[2:] == 0).all()


class TestEndToEnd:
    def test_synthetic_file(self, synthetic_root):
        import os

        from yolat_tpu.data.synthetic import FLOORPLAN_CLASSES

        with open(os.path.join(synthetic_root, "train_list.txt")) as f:
            rel = f.readline().strip()
        path = os.path.join(synthetic_root, rel)
        doc = SVGDocument.from_file(path)
        g = build_svg_graph(doc)
        gt, gt_labels = read_ground_truth_boxes(
            path.replace(".svg", ".xml"), doc.width, doc.height, FLOORPLAN_CLASSES
        )
        pf = generate_proposals(
            g, gt, gt_labels, n_classes=17, bbox_sampling_step=10
        )
        assert pf.n_proposals > 10
        # every GT symbol should be recoverable by some positive proposal
        pos_labels = set(pf.labels[pf.labels != 16].tolist())
        assert len(pos_labels) >= 1
