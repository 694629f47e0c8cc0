"""Predictor path equivalence: flax vs folded fast path vs bf16, through
the full evaluate() protocol, on the dense layout."""

import jax
import numpy as np
import pytest

from yolat_tpu.data.dataset import PackedLoader, SESYDDataset
from yolat_tpu.eval.fast_forward import fold_params
from yolat_tpu.eval.predict import make_predict_fn
from yolat_tpu.eval.runner import evaluate
from yolat_tpu.train.config import Config
from yolat_tpu.train.loop import create_state
from yolat_tpu.train.optim import make_optimizer


@pytest.mark.slow
class TestPredictPathEquivalence:
    def test_fast_path_same_detections(self, synthetic_root):
        ds = SESYDDataset(synthetic_root, "train", bbox_sampling_step=5)
        cfg = Config(n_classes=ds.n_classes, data_aug=False)
        loader = PackedLoader(ds, batch_size=2, n_devices=1, shuffle=False,
                              dense=True)
        batch = {k: v[0] for k, v in next(iter(loader)).items()}

        tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
        state = create_state(cfg, tx, batch, jax.random.key(0))
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        folded = fold_params(variables, n_blocks=cfg.n_blocks)

        out_flax = {k: np.asarray(v) for k, v in
                    make_predict_fn(cfg, max_det=32)(variables, batch).items()}
        out_fast = {k: np.asarray(v) for k, v in
                    make_predict_fn(cfg, max_det=32, fast=True,
                                    folded=folded)(variables, batch).items()}
        out_bf16 = {k: np.asarray(v) for k, v in
                    make_predict_fn(cfg, max_det=32, fast=True, folded=folded,
                                    bf16=True)(variables, batch).items()}

        # identical kept sets and (for f32 fast path) near-identical boxes
        np.testing.assert_array_equal(out_flax["kept"], out_fast["kept"])
        np.testing.assert_array_equal(out_flax["valid"], out_fast["valid"])
        v = out_flax["valid"]
        np.testing.assert_allclose(out_fast["boxes"][v], out_flax["boxes"][v],
                                   rtol=1e-3, atol=1e-2)
        np.testing.assert_array_equal(out_fast["classes"][v],
                                      out_flax["classes"][v])
        # bf16: same predicted labels on valid detections
        assert (out_bf16["pred_label"] == out_flax["pred_label"]).mean() > 0.99

    @pytest.mark.parametrize("serve", ["flax", "fast", "fast_bf16"])
    def test_evaluate_with_fast_loader(self, synthetic_root, serve):
        ds = SESYDDataset(synthetic_root, "test", bbox_sampling_step=5)
        cfg = Config(n_classes=ds.n_classes, data_aug=False)
        loader = PackedLoader(ds, batch_size=2, n_devices=1, shuffle=False,
                              dense=True)
        batch = {k: v[0] for k, v in next(iter(loader)).items()}
        tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
        state = create_state(cfg, tx, batch, jax.random.key(0))
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        result = evaluate(cfg, variables, loader, max_det=32, serve=serve)
        assert np.isfinite(result["map_all"])


class TestClassfixNMSPath:
    def test_predict_with_classfix_matches_fixpoint(self):
        """End-to-end predict parity: the per-class exact NMS returns the
        same detections as the offset-matrix fixpoint on a real packed
        batch (topk never binds at toy scale, so both are exact)."""
        import jax
        import jax.numpy as jnp

        from yolat_tpu.data.toy import random_packed_batch
        from yolat_tpu.eval.predict import make_predict_fn
        from yolat_tpu.train.config import Config
        from yolat_tpu.train.loop import create_state
        from yolat_tpu.train.optim import make_optimizer

        batch_np, _ = random_packed_batch(seed=5, n_images=2)
        cfg = Config(n_classes=17, data_aug=False)
        tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
        state = create_state(cfg, tx, batch_np, jax.random.key(0))
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        batch = jax.tree.map(jnp.asarray, batch_np)

        outs = {}
        for alg in ("fixpoint", "classfix"):
            fn = make_predict_fn(cfg.replace(nms_algorithm=alg), max_det=64)
            outs[alg] = fn(variables, batch)
        va = np.asarray(outs["fixpoint"]["valid"])
        vb = np.asarray(outs["classfix"]["valid"])
        np.testing.assert_array_equal(va, vb)
        np.testing.assert_allclose(
            np.asarray(outs["fixpoint"]["scores"])[va],
            np.asarray(outs["classfix"]["scores"])[vb], rtol=1e-5)
        np.testing.assert_array_equal(
            np.asarray(outs["fixpoint"]["classes"])[va],
            np.asarray(outs["classfix"]["classes"])[vb])
