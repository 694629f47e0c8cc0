"""Eval-protocol tests: AP math against hand-computed values, greedy TP
matching, two-pass selection semantics, and an end-to-end train->eval smoke
test on the synthetic dataset."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolat_tpu.data.dataset import PackedLoader, SESYDDataset, stack_shards
from yolat_tpu.eval.metrics import (
    Evaluator,
    ap_per_class,
    average_precision,
    batch_statistics,
)
from yolat_tpu.eval.predict import make_predict_fn
from yolat_tpu.eval.runner import evaluate
from yolat_tpu.train.config import Config
from yolat_tpu.train.loop import create_state, make_train_step
from yolat_tpu.train.optim import make_optimizer


class TestAPMath:
    def test_perfect_detector(self):
        # 3 detections, 3 GT, all matched
        recall = np.array([1 / 3, 2 / 3, 1.0])
        precision = np.array([1.0, 1.0, 1.0])
        assert average_precision(recall, precision) == pytest.approx(1.0)

    def test_envelope(self):
        # precision dips then recovers: envelope takes the running max
        recall = np.array([0.5, 0.5, 1.0])
        precision = np.array([1.0, 0.5, 2 / 3])
        ap = average_precision(recall, precision)
        assert ap == pytest.approx(0.5 * 1.0 + 0.5 * (2 / 3))

    def test_ap_per_class_basic(self):
        tp = np.array([1.0, 1.0, 0.0])
        conf = np.array([0.9, 0.8, 0.7])
        pred = np.array([0, 0, 0])
        target = [0, 0]
        p, r, ap, f1, cls = ap_per_class(tp, conf, pred, target)
        assert cls.tolist() == [0]
        assert r[0] == pytest.approx(1.0)
        assert p[0] == pytest.approx(2 / 3)
        assert ap[0] == pytest.approx(1.0)

    def test_class_without_predictions(self):
        tp = np.array([1.0])
        conf = np.array([0.9])
        pred = np.array([0])
        target = [0, 1]
        _, _, ap, _, cls = ap_per_class(tp, conf, pred, target)
        assert cls.tolist() == [0, 1]
        assert ap[1] == 0.0


class TestBatchStatistics:
    def test_greedy_one_gt_once(self):
        gt = np.array([[0.0, 0.0, 10.0, 10.0]])
        gt_labels = np.array([3])
        det = np.array([[0, 0, 10, 10], [0.5, 0.5, 10, 10]], float)
        scores = np.array([0.9, 0.8])
        labels = np.array([3, 3])
        tp, _, _ = batch_statistics(det, scores, labels, gt, gt_labels, 0.5)
        assert tp.tolist() == [1.0, 0.0]  # second det can't reuse the GT

    def test_wrong_class_never_matches(self):
        gt = np.array([[0.0, 0.0, 10.0, 10.0]])
        gt_labels = np.array([3])
        det = np.array([[0, 0, 10, 10]], float)
        tp, _, _ = batch_statistics(det, np.array([0.9]), np.array([1]), gt,
                                    gt_labels, 0.5)
        assert tp.tolist() == [0.0]

    def test_iou_threshold(self):
        gt = np.array([[0.0, 0.0, 10.0, 10.0]])
        gt_labels = np.array([0])
        det = np.array([[8.0, 8.0, 18.0, 18.0]], float)  # low IoU
        tp, _, _ = batch_statistics(det, np.array([0.9]), np.array([0]), gt,
                                    gt_labels, 0.5)
        assert tp.tolist() == [0.0]


class TestEvaluator:
    def test_perfect_predictions_map1(self):
        ev = Evaluator(n_classes=3)
        gt = np.array([[0, 0, 50, 50], [100, 100, 160, 150]], float)
        gl = np.array([0, 1])
        ev.add_image(gt.copy(), np.array([0.9, 0.8]), gl.copy(), gt, gl)
        out = ev.compute()
        assert out["map_50"] == pytest.approx(1.0)
        assert out["map_all"] == pytest.approx(1.0)
        assert out["test_value"] == pytest.approx(1.0)

    def test_confusion_and_top1(self):
        ev = Evaluator(n_classes=3)
        ev.add_proposals(np.array([0, 1, 2, 2]), np.array([0, 1, 1, 2]))
        out = ev.compute()
        assert out["top1_acc"] == pytest.approx(0.75)
        assert out["confusion"][1, 2] == 1


class _TakeFiles:
    """Iterate the first N single-image steps of a loader."""

    def __init__(self, loader, n):
        self.loader, self.n = loader, n

    def __iter__(self):
        for i, b in enumerate(self.loader):
            if i >= self.n:
                return
            yield b


class TestEndToEnd:
    @pytest.mark.slow
    def test_train_then_eval(self, synthetic_root):
        """Minimum end-to-end slice: preprocess -> train a few steps ->
        evaluate; the pipeline must produce a finite mAP and better-than-
        random proposal accuracy on the training split."""
        ds = SESYDDataset(synthetic_root, "train", bbox_sampling_step=5)
        cfg = Config(n_classes=ds.n_classes, data_aug=False, dropout=0.0,
                     lr=2e-3, batch_size=3)
        loader = PackedLoader(ds, batch_size=3, n_devices=1, shuffle=True)

        tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
        example = next(iter(loader))
        single = {k: v[0] for k, v in example.items()}
        state = create_state(cfg, tx, single, jax.random.key(0))
        step = make_train_step(cfg, tx)

        key = jax.random.key(1)
        for epoch in range(30):
            for batch in loader:
                key, sub = jax.random.split(key)
                state, metrics = step(state, batch, sub)
        final_loss = float(metrics["loss"])
        assert final_loss < 1.5

        variables = {"params": state.params, "batch_stats": state.batch_stats}
        result = evaluate(cfg, variables, loader, max_det=64)
        assert np.isfinite(result["map_50"])
        assert result["top1_acc"] > 0.5

    def test_dp_evaluate_matches_single_device(self, synthetic_root):
        """Data-parallel evaluation over a 2-device mesh produces the same
        metrics as the single-device loop on the same images."""
        from jax.sharding import Mesh

        ds = SESYDDataset(synthetic_root, "train", bbox_sampling_step=5)
        cfg = Config(n_classes=ds.n_classes, data_aug=False)
        tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)

        loader1 = PackedLoader(ds, batch_size=1, n_devices=1, shuffle=False,
                               drop_last=True)
        loader2 = PackedLoader(ds, batch_size=1, n_devices=2, shuffle=False,
                               drop_last=True, pad=loader1.pad)

        batch = {k: v[0] for k, v in next(iter(loader1)).items()}
        state = create_state(cfg, tx, batch, jax.random.key(0))
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        r1 = evaluate(cfg, variables, loader1, max_det=32)
        mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
        r2 = evaluate(cfg, variables, loader2, max_det=32, mesh=mesh)
        # loader2 drops the odd file; restrict comparison to shared stats
        assert np.isfinite(r2["map_all"])
        np.testing.assert_allclose(r2["top1_acc"], r2["top1_acc"])
        # same images evaluated both ways must agree when counts match
        loader1b = PackedLoader(ds, batch_size=1, n_devices=1, shuffle=False,
                                drop_last=True, pad=loader1.pad)
        # first two files only (what loader2 covered)
        ev_imgs = 2
        r1b = evaluate(cfg, variables,
                       _TakeFiles(loader1b, ev_imgs), max_det=32)
        np.testing.assert_allclose(r2["map_50"], r1b["map_50"], rtol=1e-5)
        np.testing.assert_allclose(r2["top1_acc"], r1b["top1_acc"], rtol=1e-5)

    def test_two_pass_selection_mask(self, synthetic_root):
        """kept == is_root | (root predicted background), valid rows only."""
        ds = SESYDDataset(synthetic_root, "train", bbox_sampling_step=5)
        cfg = Config(n_classes=ds.n_classes, data_aug=False)
        loader = PackedLoader(ds, batch_size=2, n_devices=1, shuffle=False)
        batch = {k: v[0] for k, v in next(iter(loader)).items()}

        tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
        state = create_state(cfg, tx, batch, jax.random.key(0))
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        out = {k: np.asarray(v) for k, v in
               make_predict_fn(cfg, max_det=32)(variables, batch).items()}

        bg = cfg.n_classes - 1
        root_bg = out["pred_label"][batch["root_slot"]] == bg
        want = batch["proposal_mask"] & (batch["is_root"] | root_bg)
        np.testing.assert_array_equal(out["kept"], want)
        # roots always kept
        assert out["kept"][batch["is_root"] & batch["proposal_mask"]].all()


class TestSparseFastServe:
    def test_fast_serve_on_sparse_loader_matches_flax(self, synthetic_root):
        """evaluate(serve='fast') on a dense=False loader (no neighbour
        tables) produces the same metrics as the flax path — the
        dense-table-free serving mode."""
        ds = SESYDDataset(synthetic_root, "train", bbox_sampling_step=5)
        cfg = Config(n_classes=ds.n_classes, data_aug=False)
        loader = PackedLoader(ds, batch_size=3, n_devices=1, shuffle=False,
                              dense=False)
        tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
        example = next(iter(loader))
        single = {k: v[0] for k, v in example.items()}
        state = create_state(cfg, tx, single, jax.random.key(0))
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        a = evaluate(cfg, variables, loader, max_det=32)
        b = evaluate(cfg, variables, loader, max_det=32, serve="fast")
        assert np.isclose(a["map_50"], b["map_50"], atol=1e-6)
        assert np.isclose(a["top1_acc"], b["top1_acc"], atol=1e-6)


def test_batch_statistics_vectorized_matches_loop_oracle():
    """Fuzz the matrix-form greedy TP matcher against the per-detection
    loop transliteration (kept as batch_statistics_loop)."""
    from yolat_tpu.eval.metrics import batch_statistics, batch_statistics_loop

    rng = np.random.default_rng(77)
    for trial in range(200):
        d = int(rng.integers(0, 30))
        g = int(rng.integers(0, 10))
        xy = rng.random((d, 2)) * 80
        det_boxes = np.concatenate([xy, xy + rng.random((d, 2)) * 30 + 1], 1)
        gxy = rng.random((g, 2)) * 80
        gt_boxes = np.concatenate([gxy, gxy + rng.random((g, 2)) * 30 + 1], 1)
        # overlap clusters (duplicated GTs force consumed-argmax conflicts)
        for i in range(min(d, g)):
            if rng.random() < 0.7:
                det_boxes[i] = gt_boxes[i % max(g, 1)] + rng.normal(0, 2, 4)
        det_scores = np.sort(rng.random(d))[::-1].copy()
        det_labels = rng.integers(0, 3, d).astype(float)
        gt_labels = rng.integers(0, 3, g).astype(float)
        # th <= 0 exercises the class-presence skip, where the masked-zero
        # IoU fill would otherwise pass the >= test with no candidate
        th = float(rng.choice([0.0, 0.3, 0.5, 0.75]))
        tp_v, _, _ = batch_statistics(det_boxes, det_scores, det_labels,
                                      gt_boxes, gt_labels, th)
        tp_l, _, _ = batch_statistics_loop(det_boxes, det_scores, det_labels,
                                           gt_boxes, gt_labels, th)
        np.testing.assert_array_equal(tp_v, tp_l)
