"""Tests: hierarchical builder, legacy dataset variants, YOLaT++ model."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolat_tpu.data.legacy import (
    build_graph_v1,
    node_ground_truth,
    proximity_edges,
    shape_features,
    strip_control_nodes,
)
from yolat_tpu.data.packing import finalize_batch
from yolat_tpu.data.toy import random_packed_batch
from yolat_tpu.geom.graph_build import build_svg_graph
from yolat_tpu.geom.hierarchical import build_hierarchical_graph, transitive_reduction
from yolat_tpu.geom.svg_io import SVGDocument, read_ground_truth_boxes
from yolat_tpu.nn.model import detection_loss
from yolat_tpu.nn.yolat_pp import YOLaTPlusPlus, fourier_features


@pytest.fixture(scope="module")
def doc_and_gt(synthetic_root):
    from yolat_tpu.data.synthetic import FLOORPLAN_CLASSES

    with open(os.path.join(synthetic_root, "train_list.txt")) as f:
        rel = f.readline().strip()
    path = os.path.join(synthetic_root, rel)
    doc = SVGDocument.from_file(path)
    gt, labels = read_ground_truth_boxes(
        path.replace(".svg", ".xml"), doc.width, doc.height, FLOORPLAN_CLASSES
    )
    return doc, gt, labels


class TestHierarchical:
    def test_transitive_reduction(self):
        # 0 contains 1 contains 2: direct edges 0->1, 1->2 only
        c = np.zeros((3, 3), bool)
        c[0, 1] = c[1, 2] = c[0, 2] = True
        d = transitive_reduction(c)
        assert d[0, 1] and d[1, 2] and not d[0, 2]

    def test_build_hierarchy(self, doc_and_gt):
        doc, _, _ = doc_and_gt
        g = build_svg_graph(doc)
        h = build_hierarchical_graph(g)
        n, c = h["n_base_nodes"], h["n_super_nodes"]
        assert c == len(h["cc"])
        assert h["pos"].shape == (n + c, 2)
        assert h["attr"]["is_super"][n:].all()
        assert not h["attr"]["is_super"][:n].any()
        # every super-shape edge links a super node to one of its members
        for s, m in h["edge"]["super_shape"]:
            assert s >= n and m < n
            assert m in h["cc"][s - n]
        # super-super edges are between super nodes
        ss = h["edge"]["super_super"]
        if len(ss):
            assert (ss >= n).all()


class TestLegacyDatasets:
    def test_v1_graph(self, doc_and_gt):
        doc, _, _ = doc_and_gt
        g = build_graph_v1(doc)
        assert g["edge_attr"]["shape"].shape[1] == 4  # v1 layout
        assert len(g["pos"]) > 0

    def test_node_ground_truth_full_coverage(self):
        # synthetic floorplans have wall nodes outside GT symbols, so build
        # a self-contained case: one square symbol covering all nodes
        from yolat_tpu.geom.bezier import line_to_cubic
        from yolat_tpu.geom.graph_build import cubics_to_graph, merge_nodes

        cubics = np.concatenate(
            [
                line_to_cubic(10, 10, 40, 10),
                line_to_cubic(40, 10, 40, 40),
                line_to_cubic(40, 40, 10, 40),
                line_to_cubic(10, 40, 10, 10),
            ]
        )
        g = merge_nodes(cubics_to_graph(cubics, 100.0, 100.0))
        gt = np.array([[0.1, 0.1, 0.4, 0.4]])
        bb, cls, obj = node_ground_truth(g, gt, np.array([7]))
        is_control = g["attr"]["is_control"].reshape(-1) > 0.5
        assert (cls == 7).all()
        np.testing.assert_allclose(bb, np.tile(gt, (len(bb), 1)))

    def test_strip_control(self, doc_and_gt):
        doc, _, _ = doc_and_gt
        g = build_graph_v1(doc)
        stripped, keep = strip_control_nodes(g)
        assert len(stripped["pos"]) == int(keep.sum())
        assert (stripped["attr"]["is_control"] == 0).all()
        e = stripped["edge"]["shape"]
        assert (e < len(stripped["pos"])).all()

    def test_shape_features(self, doc_and_gt):
        doc, _, _ = doc_and_gt
        feats, centers = shape_features(doc)
        assert feats.shape[1] == 17
        assert len(feats) == len(centers)
        # lines fill the first 4 dims
        line_rows = feats[:, 0:4].any(axis=1)
        assert line_rows.any()

    def test_legacy_dataset_variants(self, synthetic_root):
        """LegacySVGDataset: all three reference graph variants load with
        consistent per-node targets (strict=False: uncovered strokes ->
        background)."""
        from yolat_tpu.data.legacy import LegacySVGDataset

        for graph in ("bezier", "bezier_edge_attr", "shape"):
            ds = LegacySVGDataset(synthetic_root, "train", graph=graph)
            item = ds[0]
            n = len(item["pos"])
            assert item["x"].shape[0] == n
            assert item["gt_cls"].shape == (n,)
            assert item["gt_bbox_node"].shape == (n, 4)
            if graph == "shape":
                assert item["x"].shape[1] == 17
                assert len(item["edge"]) == len(item["edge_weight"])
            else:
                assert item["e_attr"].shape == (len(item["edge"]), 4)
                assert (item["edge"] < n).all()
            if graph == "bezier_edge_attr":
                # control column is the last x feature; all stripped
                assert (item["x"][:, -1] == 0).all()
            # uncovered nodes got the background class, covered ones a
            # valid symbol class
            bg = ds.n_classes - 1
            assert ((item["gt_cls"] == bg) | (item["gt_obj"] >= 0)).all()

    def test_proximity_edges(self):
        pos = np.array([[0.0, 0.0], [0.001, 0.0], [0.5, 0.5]])
        edges, w = proximity_edges(pos, th=5e-3)
        # each point gets a self loop + close pairs (reference semantics)
        assert len(edges) == 2 + 2 + 1
        # weights row-normalised
        for i in range(3):
            rows = edges[:, 0] == i
            np.testing.assert_allclose(w[rows].sum(), 1.0)


class TestYOLaTPlusPlus:
    def test_fourier_features(self):
        pos = jnp.array([[0.0, 0.5], [1.0, 0.25]])
        f = fourier_features(pos, n_freqs=3)
        assert f.shape == (2, 12)
        assert not np.isnan(np.asarray(f)).any()

    def test_forward_and_learn(self):
        batch_np, _ = random_packed_batch(seed=7, n_images=2)
        batch = finalize_batch(jax.tree.map(jnp.asarray, batch_np))
        model = YOLaTPlusPlus(n_classes=17)
        variables = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            batch, train=True,
        )
        (logits, boxes), _ = model.apply(
            variables, batch, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(2)},
        )
        assert logits.shape == (batch_np["labels"].shape[0], 17)
        assert not np.isnan(np.asarray(logits)).any()

        # a couple of gradient steps reduce the loss
        import optax

        tx = optax.adam(1e-3)
        params = variables["params"]
        stats = variables.get("batch_stats", {})
        opt_state = tx.init(params)

        def loss_fn(p, st):
            (lg, _), mut = model.apply(
                {"params": p, "batch_stats": st}, batch, train=True,
                mutable=["batch_stats"], rngs={"dropout": jax.random.key(3)},
            )
            return detection_loss(lg, batch["labels"], batch["proposal_mask"])[
                "loss"
            ], mut["batch_stats"]

        losses = []
        for _ in range(8):
            (lv, stats), g = jax.value_and_grad(loss_fn, has_aux=True)(params, stats)
            upd, opt_state = tx.update(g, opt_state, params)
            params = optax.apply_updates(params, upd)
            losses.append(float(lv))
        assert losses[-1] < losses[0]

    def test_arch_registry(self):
        from yolat_tpu.train.config import Config
        from yolat_tpu.train.loop import build_model

        cfg = Config(n_classes=17, arch="yolat_pp")
        m = build_model(cfg)
        assert isinstance(m, YOLaTPlusPlus)
        cfg = Config(n_classes=17, arch="centernet3cc_rpn_gp_iter2")
        from yolat_tpu.nn.model import SparseCADGCN

        assert isinstance(build_model(cfg), SparseCADGCN)


class TestYOLaTPlusPlusCanonicalInit:
    def test_zero_gates_reproduce_canonical_logits(self):
        """The additive-ReZero design contract: with every gate at its zero
        init and the canonical submodules holding the canonical model's
        weights, YOLaT++'s eval forward IS SparseCADGCN's (VALIDATION.md
        "YOLaT++ redesign")."""
        from yolat_tpu.nn.model import SparseCADGCN

        batch_np, _ = random_packed_batch(seed=11, n_images=2)
        batch = finalize_batch(jax.tree.map(jnp.asarray, batch_np))

        canon = SparseCADGCN(n_classes=17)
        cv = canon.init({"params": jax.random.key(0)}, batch, train=True)
        pp = YOLaTPlusPlus(n_classes=17)
        pv = pp.init(
            {"params": jax.random.key(1), "dropout": jax.random.key(2)},
            batch, train=True,
        )

        # graft the canonical weights into the matching YOLaT++ submodules
        # (canonical nests the backbone under cls_net; YOLaT++ is flat)
        def graft(tree):
            canon_p = cv[tree]
            out = dict(pv[tree])
            for name, sub in canon_p.get("cls_net", {}).items():
                assert name in out, f"missing canonical module {name}"
                out[name] = sub
            for name in ("pred_0", "pred_1", "pred_2"):
                if name in canon_p:
                    out[name] = canon_p[name]
            return out

        grafted = {"params": graft("params"), "batch_stats": graft("batch_stats")}

        lc, _ = canon.apply(cv, batch, train=False)
        lp, _ = pp.apply(grafted, batch, train=False)
        np.testing.assert_allclose(np.asarray(lp), np.asarray(lc),
                                   rtol=1e-5, atol=1e-5)
