"""Small-surface parity tests: ToyDataset, get_anchor, viz helpers,
drop_edge, AverageMeter."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolat_tpu.data.packing import finalize_batch
from yolat_tpu.data.toy import TOY_CLASSES, ToyDataset, random_packed_batch
from yolat_tpu.utils.meters import AverageMeter
from yolat_tpu.utils.viz import plot_graph, plot_points


class TestToyDataset:
    def test_samples(self):
        ds = ToyDataset(n_samples=10, seed=0)
        assert len(ds) == 10
        labels = set()
        for i in range(10):
            s = ds[i]
            assert s["pos"].shape[1] == 2
            assert (s["labels"] == s["label"]).all()
            if len(s["edge"]):
                assert s["edge"].max() < len(s["pos"])
            labels.add(int(s["label"]))
        assert labels <= set(TOY_CLASSES.values())

    def test_deterministic(self):
        a = ToyDataset(seed=1)[3]
        b = ToyDataset(seed=1)[3]
        np.testing.assert_array_equal(a["pos"], b["pos"])


class TestGetAnchor:
    def test_stats(self, synthetic_root):
        from yolat_tpu.data.dataset import SESYDDataset

        ds = SESYDDataset(synthetic_root, "train", bbox_sampling_step=5)
        anchors = ds.get_anchor()
        assert len(anchors) >= 1
        for l, st in anchors.items():
            assert len(st["median"]) == 2
            assert st["count"] > 0


class TestViz:
    def test_plot_points_and_graph(self, tmp_path):
        pts = np.random.default_rng(0).random((20, 2))
        p1 = plot_points(pts, colors=np.arange(20) % 3,
                         out_path=str(tmp_path / "p.png"))
        assert os.path.exists(p1)
        edges = np.array([[0, 1], [1, 2], [2, 3]])
        p2 = plot_graph(pts, edges, out_path=str(tmp_path / "g.png"))
        assert os.path.exists(p2)

    def test_part_seg_comparison(self, tmp_path):
        """visualize_part_seg parity surface (reference utils/pc_viz.py:256):
        coloured-.obj parse + multi-panel render."""
        from yolat_tpu.utils.viz import (get_points_colors_from_obj,
                                         show_pointclouds,
                                         visualize_part_seg)

        rng = np.random.default_rng(1)
        for d in ("run_a", "run_b"):
            (tmp_path / d).mkdir()
            for name in ("pred.obj", "gt.obj"):
                lines = [
                    "v " + " ".join(f"{v:.4f}" for v in rng.random(3))
                    + " " + " ".join(f"{c:.2f}" for c in rng.random(3))
                    for _ in range(30)
                ]
                (tmp_path / d / name).write_text("\n".join(lines) + "\n")
        pts, cols = get_points_colors_from_obj(
            str(tmp_path / "run_a" / "pred.obj"))
        assert pts.shape == (30, 3) and cols.shape == (30, 3)
        out = visualize_part_seg(
            "pred.obj", "gt.obj",
            [str(tmp_path / "run_a"), str(tmp_path / "run_b")],
            text=["a", "b", "gt"], png_path=str(tmp_path / "cmp.png"))
        assert os.path.exists(out)
        out2 = show_pointclouds([pts, pts], [cols, cols], text=["x", "y"],
                                png_path=str(tmp_path / "pc.png"),
                                orientation="vertical")
        assert os.path.exists(out2)


class TestDropEdge:
    def test_dropout_masks_edges(self):
        batch, _ = random_packed_batch(seed=5, n_images=1)
        b = jax.tree.map(jnp.asarray, batch)
        out = finalize_batch(b, key=jax.random.key(0), drop_edge=0.5)
        kept = int(np.asarray(out["edge_mask"]).sum())
        orig = int(batch["edge_mask"].sum())
        assert kept < orig
        assert kept > 0
        # never un-masks padding
        assert not np.asarray(out["edge_mask"])[~batch["edge_mask"]].any()

    def test_zero_rate_noop(self):
        batch, _ = random_packed_batch(seed=5, n_images=1)
        b = jax.tree.map(jnp.asarray, batch)
        out = finalize_batch(b, key=jax.random.key(0), drop_edge=0.0)
        np.testing.assert_array_equal(
            np.asarray(out["edge_mask"]), batch["edge_mask"]
        )


class TestMeter:
    def test_average(self):
        m = AverageMeter()
        m.update(1.0)
        m.update(3.0)
        assert m.avg == 2.0
        m.reset()
        assert m.count == 0
