"""Diagrams-variant pipeline: proximity CC grouping (mergeCluster path),
diagram class dictionary, end-to-end proposals at step 5."""

import numpy as np
import pytest

from yolat_tpu.data.dataset import SESYDDataset
from yolat_tpu.data.synthetic import DIAGRAM_CLASSES, write_diagram_dataset
from yolat_tpu.geom.graph_build import (
    build_svg_graph,
    connected_components,
    merge_cluster_diagram,
)
from yolat_tpu.geom.svg_io import SVGDocument


@pytest.fixture(scope="module")
def diagram_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("sesyd_diag")
    write_diagram_dataset(str(root), n_train=2, n_test=1, seed=0,
                          width=900.0, height=600.0, n_symbols=4)
    return str(root)


class TestDiagramPipeline:
    def test_mode_autodetect(self, diagram_root):
        ds = SESYDDataset(diagram_root, "train", bbox_sampling_step=5)
        assert ds.mode == "diagram"
        assert ds.class_dict == DIAGRAM_CLASSES
        assert ds.n_classes == 22

    def test_merge_cluster_groups_nearby_strokes(self):
        # two strokes 20px apart in a 1000px image: separate CCs, one cluster
        from yolat_tpu.geom.bezier import line_to_cubic
        from yolat_tpu.geom.graph_build import cubics_to_graph, merge_nodes

        cubics = np.concatenate(
            [line_to_cubic(100, 100, 200, 100), line_to_cubic(100, 120, 200, 120),
             line_to_cubic(700, 700, 800, 700)]
        )
        g = merge_nodes(cubics_to_graph(cubics, 1000.0, 1000.0))
        ccs = connected_components(g)
        assert len(ccs) == 3
        merged = merge_cluster_diagram(g["pos"], ccs, 1000.0, 1000.0)
        assert len(merged) == 2

    def test_end_to_end_proposals(self, diagram_root):
        ds = SESYDDataset(diagram_root, "train", bbox_sampling_step=5)
        pf, (gt, gl), (w, h) = ds.load(0)
        assert pf.n_proposals > 0
        # each disconnected symbol forms its own proposal group with a root
        assert len(pf.root_of_cc) >= 1
        # positive labels exist (full-symbol windows hit IoU > 0.7)
        positives = pf.labels[pf.labels != ds.n_classes - 1]
        assert len(positives) > 0
        assert set(positives.tolist()) <= set(gl.tolist())
