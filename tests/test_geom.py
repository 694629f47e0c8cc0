"""Unit tests for the L0/L1 geometry kernel.

Mirrors the reference's implicit invariants (SURVEY.md section 4): a2c vs
analytic arcs, split_cross on synthetic crossings, merge idempotence, graph
schema integrity.
"""

import math

import numpy as np
import pytest

from yolat_tpu.geom.arc2bezier import arc_to_cubics
from yolat_tpu.geom.bezier import (
    KAPPA,
    circle_to_cubics,
    line_to_cubic,
    path_to_cubics,
)
from yolat_tpu.geom.graph_build import (
    build_svg_graph,
    connected_components,
    cubics_to_graph,
    merge_connected_components,
    merge_nodes,
)
from yolat_tpu.geom.split_cross import merge_close_points, split_cross, split_line
from yolat_tpu.geom.svg_io import SVGDocument, parse_path_d, read_ground_truth_boxes


def _eval_cubic(seg, t):
    """de Casteljau evaluation of one cubic [4, 2] at parameters t [T]."""
    t = np.asarray(t)[:, None]
    p0, p1, p2, p3 = seg
    return (
        (1 - t) ** 3 * p0
        + 3 * (1 - t) ** 2 * t * p1
        + 3 * (1 - t) * t**2 * p2
        + t**3 * p3
    )


class TestArcToCubics:
    def test_semicircle_points_on_circle(self):
        r = 10.0
        segs = arc_to_cubics(-r, 0, r, 0, r, r, 0.0, 0, 1)
        assert len(segs) == 2  # split into <=90 degree pieces
        for seg in segs:
            pts = _eval_cubic(seg, np.linspace(0, 1, 25))
            radii = np.linalg.norm(pts, axis=1)
            np.testing.assert_allclose(radii, r, rtol=3e-4)

    def test_endpoints_exact(self):
        segs = arc_to_cubics(3.0, 4.0, -4.0, 3.0, 5, 5, 0.0, 1, 0)
        np.testing.assert_array_equal(segs[0, 0], [3.0, 4.0])
        np.testing.assert_array_equal(segs[-1, 3], [-4.0, 3.0])

    def test_degenerate(self):
        assert arc_to_cubics(1, 1, 1, 1, 5, 5, 0, 0, 1).shape == (0, 4, 2)
        assert arc_to_cubics(0, 0, 1, 1, 0, 5, 0, 0, 1).shape == (0, 4, 2)

    def test_large_arc_flag_selects_long_way(self):
        r = 1.0
        short = arc_to_cubics(-r, 0, 0, r, r, r, 0, 0, 1)
        long = arc_to_cubics(-r, 0, 0, r, r, r, 0, 1, 1)
        assert len(long) > len(short)

    def test_out_of_range_radii_scaled(self):
        # radius too small for the endpoints: spec says scale up uniformly
        segs = arc_to_cubics(0, 0, 10, 0, 1, 1, 0, 0, 1)
        assert len(segs) >= 1
        np.testing.assert_allclose(segs[-1, 3], [10, 0], atol=1e-9)


class TestBezierShapes:
    def test_line_degenerate_cubic(self):
        seg = line_to_cubic(0, 0, 2, 4)
        np.testing.assert_array_equal(seg[0, 0], seg[0, 1])
        np.testing.assert_array_equal(seg[0, 2], seg[0, 3])

    def test_circle_four_quadrants(self):
        segs = circle_to_cubics(5, 5, 2)
        assert segs.shape == (4, 4, 2)
        np.testing.assert_array_equal(segs[0, 0], [5, 3])  # top start
        # closed loop
        np.testing.assert_array_equal(segs[-1, 3], segs[0, 0])
        # magic constant controls
        np.testing.assert_allclose(segs[0, 1], [5 + 2 * KAPPA, 3])
        # all sampled points near the circle
        for seg in segs:
            pts = _eval_cubic(seg, np.linspace(0, 1, 20))
            radii = np.linalg.norm(pts - [5, 5], axis=1)
            np.testing.assert_allclose(radii, 2, rtol=3e-4)

    def test_path_d_arc(self):
        segs = path_to_cubics("M 0 0 A 5 5 0 0 1 10 0")
        np.testing.assert_allclose(segs[0, 0], [0, 0])
        np.testing.assert_allclose(segs[-1, 3], [10, 0])


class TestPathParser:
    def test_relative_and_implicit(self):
        segs = parse_path_d("m 1 1 l 2 0 2 2 z")
        kinds = [k for k, _ in segs]
        assert kinds == ["line", "line", "line"]  # z closes back
        np.testing.assert_allclose(segs[-1][1], [5, 3, 1, 1])

    def test_hv(self):
        segs = parse_path_d("M 0 0 H 5 V 5 h -5 v -5")
        assert len(segs) == 4
        np.testing.assert_allclose(segs[1][1], [5, 0, 5, 5])

    def test_cubic_and_quad(self):
        segs = parse_path_d("M0 0 C 1 1 2 1 3 0 Q 4 -1 5 0")
        assert segs[0][0] == "cubic"
        assert segs[1][0] == "quad"


class TestSplitCross:
    def test_merge_close_points(self):
        pts = np.array([[0, 0], [0, 5e-5], [1, 1]])
        merged = merge_close_points(pts)
        assert merged.shape == (2, 2)
        np.testing.assert_allclose(merged[0], [0, 2.5e-5])

    def test_split_line_at_crossing(self):
        # a T-junction: endpoint of line B lies in the middle of line A
        lines = np.array([[0.0, 0.0, 100.0, 0.0], [50.0, 0.0, 50.0, 80.0]])
        pts = lines.reshape(-1, 2)
        out = split_line(pts, lines)
        # line A split in two, line B untouched
        assert out.shape == (3, 4)
        np.testing.assert_allclose(sorted(out[:, 0].tolist()), [0.0, 50.0, 50.0])

    def test_split_line_endpoint_not_split(self):
        # shared corner endpoints must NOT split
        lines = np.array([[0.0, 0.0, 100.0, 0.0], [100.0, 0.0, 100.0, 80.0]])
        out = split_line(lines.reshape(-1, 2), lines)
        assert out.shape == (2, 4)

    def test_split_circle_by_incident_line(self):
        shapes = [
            {"shape_name": "circle", "cx": "0", "cy": "0", "r": "50"},
            {"shape_name": "line", "x1": "-50", "y1": "0", "x2": "50", "y2": "0"},
        ]
        out = split_cross(shapes)
        assert len(out["circles"]) == 0  # circle fully split
        assert len(out["arcs"]) >= 2  # at least two arcs
        # arc endpoints are on the circle
        se = out["arcs"][:, 0:4].reshape(-1, 2)
        np.testing.assert_allclose(np.linalg.norm(se, axis=1), 50, atol=1e-3)

    def test_untouched_circle_kept(self):
        shapes = [
            {"shape_name": "circle", "cx": "0", "cy": "0", "r": "50"},
            {"shape_name": "line", "x1": "200", "y1": "0", "x2": "300", "y2": "0"},
        ]
        out = split_cross(shapes)
        assert len(out["circles"]) == 1
        assert len(out["arcs"]) == 0


class TestGraphBuild:
    def _tiny_graph(self):
        # two line segments sharing an endpoint (after merge: 3 shape nodes)
        cubics = np.concatenate(
            [line_to_cubic(0, 0, 10, 0), line_to_cubic(10, 0, 10, 10)], axis=0
        )
        return cubics_to_graph(cubics, 100.0, 100.0)

    def test_raw_schema(self):
        g = self._tiny_graph()
        assert g["pos"].shape == (8, 2)
        assert g["edge"]["shape"].shape == (2, 2)
        assert g["edge"]["control"].shape == (10, 2)
        assert g["edge_attr"]["shape"].shape == (2, 6)
        np.testing.assert_array_equal(
            g["attr"]["is_control"].reshape(-1), [0, 1, 1, 0] * 2
        )

    def test_edge_attr_values(self):
        g = self._tiny_graph()
        # first segment: start (0,0) end (.1,0): d2=.01, angle=-0.1/sqrt(.01)
        ea = g["edge_attr"]["shape"][0]
        np.testing.assert_allclose(ea[5], 0.01)
        np.testing.assert_allclose(ea[4], -0.1 / (0.1 + 1e-7), rtol=1e-5)
        # degenerate-cubic control offsets: c1-start=0, c2-end=0
        np.testing.assert_allclose(ea[0:4], 0)

    def test_merge_nodes(self):
        g = merge_nodes(self._tiny_graph())
        # 8 raw nodes -> shared endpoint merges -> 7; controls coincide with
        # endpoints but is_control differs so they never merge
        assert g["pos"].shape == (7, 2)
        assert g["edge"]["shape"].shape == (2, 2)
        # no self loops
        assert (g["edge"]["shape"][:, 0] != g["edge"]["shape"][:, 1]).all()
        assert (g["edge"]["control"][:, 0] != g["edge"]["control"][:, 1]).all()

    def test_merge_idempotent(self):
        g1 = merge_nodes(self._tiny_graph())
        g2 = merge_nodes({**g1, "edge_attr": g1["edge_attr"]})
        assert g2["pos"].shape == g1["pos"].shape
        np.testing.assert_allclose(
            np.sort(g2["pos"], axis=0), np.sort(g1["pos"], axis=0)
        )

    def test_connected_components(self):
        cubics = np.concatenate(
            [
                line_to_cubic(0, 0, 10, 0),
                line_to_cubic(10, 0, 10, 10),
                line_to_cubic(50, 50, 60, 50),
            ],
            axis=0,
        )
        g = merge_nodes(cubics_to_graph(cubics, 100.0, 100.0))
        ccs = connected_components(g)
        assert len(ccs) == 2
        sizes = sorted(len(c) for c in ccs)
        assert sizes == [2, 3]
        # control nodes excluded
        is_control = g["attr"]["is_control"].reshape(-1) > 0.5
        for cc in ccs:
            assert not is_control[cc].any()

    def test_merge_cc_containment(self):
        # a small square inside a large square -> merged into one cc with
        # bipartite cross edges
        def square(x0, y0, s):
            return np.concatenate(
                [
                    line_to_cubic(x0, y0, x0 + s, y0),
                    line_to_cubic(x0 + s, y0, x0 + s, y0 + s),
                    line_to_cubic(x0 + s, y0 + s, x0, y0 + s),
                    line_to_cubic(x0, y0 + s, x0, y0),
                ],
                axis=0,
            )

        cubics = np.concatenate([square(0, 0, 100), square(40, 40, 20)], axis=0)
        g = merge_nodes(cubics_to_graph(cubics, 100.0, 100.0))
        info = merge_connected_components(g)
        assert len(info["cc"]) == 1
        assert len(info["cross_shape_edges"]) == 4 * 4  # bipartite 4x4
        # super attrs: first 4 dims zero, angle/d2 tail
        assert info["shape_shape_attr"].shape[1] == 6
        np.testing.assert_array_equal(info["shape_shape_attr"][:, 0:4], 0)


class TestEndToEndDocument:
    def test_build_graph_from_synthetic(self, synthetic_root):
        import os

        with open(os.path.join(synthetic_root, "train_list.txt")) as f:
            rel = f.readline().strip()
        path = os.path.join(synthetic_root, rel)
        doc = SVGDocument.from_file(path)
        assert doc.width == 800.0 and doc.height == 600.0
        assert len(doc.shapes) > 10

        g = build_svg_graph(doc)
        n = len(g["pos"])
        assert n > 0
        for fam in ("shape", "control", "super"):
            e = g["edge"][fam]
            assert e.shape[1] == 2 and (e < n).all() and (e >= 0).all()
        assert g["edge_attr"]["shape"].shape == (len(g["edge"]["shape"]), 6)
        assert g["edge_attr"]["super"].shape == (len(g["edge"]["super"]), 6)
        # in floorplans the wall CC's bbox contains every symbol bbox, so
        # containment merging collapses everything into one CC — the same
        # behaviour as the reference mergeCC on real SESYD floorplans
        assert len(g["cc"]) >= 1
        n_in_ccs = sum(len(c) for c in g["cc"])
        is_control = g["attr"]["is_control"].reshape(-1) > 0.5
        assert n_in_ccs == int((~is_control).sum())
        # positions normalised
        assert (g["pos"] >= 0).all() and (g["pos"] <= 1).all()

        # GT reader
        from yolat_tpu.data.synthetic import FLOORPLAN_CLASSES

        boxes, labels = read_ground_truth_boxes(
            path.replace(".svg", ".xml"), doc.width, doc.height, FLOORPLAN_CLASSES
        )
        assert len(boxes) == len(labels) > 0
        assert (boxes >= 0).all() and (boxes <= 1).all()


class TestDegenerateSVGs:
    """Degenerate inputs must flow through the full preprocessor without
    crashing (the reference hard-exits only on unknown node types /
    unsupported shapes — SURVEY.md section 4)."""

    CASES = {
        "single_line": '<svg width="100" height="100">'
                       '<line x1="10" y1="10" x2="90" y2="90" stroke="black"/></svg>',
        "single_circle": '<svg width="100" height="100">'
                         '<circle cx="50" cy="50" r="20" stroke="black" fill="none"/></svg>',
        "zero_len_line": '<svg width="100" height="100">'
                         '<line x1="50" y1="50" x2="50" y2="50" stroke="black"/>'
                         '<line x1="10" y1="10" x2="90" y2="10" stroke="black"/></svg>',
    }

    @pytest.mark.parametrize("name", sorted(CASES))
    def test_full_preprocess_no_crash(self, name, tmp_path):
        from yolat_tpu.geom.graph_build import build_svg_graph
        from yolat_tpu.geom.proposals import generate_proposals
        from yolat_tpu.geom.svg_io import SVGDocument

        p = tmp_path / f"{name}.svg"
        p.write_text(self.CASES[name])
        doc = SVGDocument.from_file(str(p))
        g = build_svg_graph(doc)
        assert len(g["pos"]) > 0
        pf = generate_proposals(g, np.array([[0.0, 0.0, 1.0, 1.0]]),
                                np.array([0]), 3, bbox_sampling_step=5)
        assert pf.n_proposals >= 0  # 0 is legitimate (no angle pairs)
        # a lone circle always yields proposals (angles exist)
        if name == "single_circle":
            assert pf.n_proposals > 0


class TestGeometryFreeSVGs:
    """SVGs with no drawable geometry must flow through the whole offline
    pipeline as EMPTY graphs/proposal files (bulk inference over arbitrary
    directories must not crash on them)."""

    CASES = {
        "no_shapes": '<svg width="100" height="100"></svg>',
        "move_only_path": '<svg width="10" height="10"><path d="M 5 5"/></svg>',
        "zero_radius_arc":
            '<svg width="10" height="10"><path d="M 0 0 A 0 0 0 0 1 5 5"/></svg>',
    }

    @pytest.mark.parametrize("name", sorted(CASES))
    def test_empty_pipeline(self, name, tmp_path):
        from yolat_tpu.geom.graph_build import build_svg_graph
        from yolat_tpu.geom.proposals import generate_proposals
        from yolat_tpu.geom.svg_io import SVGDocument

        p = tmp_path / f"{name}.svg"
        p.write_text(self.CASES[name])
        doc = SVGDocument.from_file(str(p))
        g = build_svg_graph(doc)
        assert len(g["pos"]) == 0
        assert len(g["edge"]["shape"]) == 0 and len(g["cc"]) == 0
        pf = generate_proposals(g, np.zeros((0, 4)), np.zeros(0, np.int64),
                                17, bbox_sampling_step=5)
        assert pf.n_proposals == 0
