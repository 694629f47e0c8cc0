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


class TestImgSlotsLayout:
    def test_capped_layout_identical_detections(self):
        """img_slots (per-image NMS slot cap, eval/predict.py) is an EXACT
        layout shrink: with any cap >= the true per-image proposal max the
        detections are identical to the full [B, P] layout, row for row."""
        import jax
        import jax.numpy as jnp

        from yolat_tpu.data.toy import random_packed_batch
        from yolat_tpu.eval.predict import make_predict_fn
        from yolat_tpu.eval.runner import img_slot_cap
        from yolat_tpu.train.config import Config
        from yolat_tpu.train.loop import create_state
        from yolat_tpu.train.optim import make_optimizer

        batch_np, _ = random_packed_batch(seed=11, n_images=3)
        cfg = Config(n_classes=17, data_aug=False)
        tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
        state = create_state(cfg, tx, batch_np, jax.random.key(0))
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        batch = jax.tree.map(jnp.asarray, batch_np)

        cap = img_slot_cap({k: v[None] for k, v in batch_np.items()},
                           quantum=8)
        # the cap must actually bind for the test to mean anything
        assert cap < batch_np["labels"].shape[0]

        full = make_predict_fn(cfg, max_det=64)(variables, batch)
        capped = make_predict_fn(cfg, max_det=64, img_slots=cap)(
            variables, batch)
        va = np.asarray(full["valid"])
        np.testing.assert_array_equal(va, np.asarray(capped["valid"]))
        np.testing.assert_allclose(np.asarray(full["scores"])[va],
                                   np.asarray(capped["scores"])[va],
                                   rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(full["classes"])[va],
                                      np.asarray(capped["classes"])[va])
        np.testing.assert_allclose(np.asarray(full["boxes"])[va],
                                   np.asarray(capped["boxes"])[va],
                                   rtol=1e-6)


class TestDetectionsOnlyMode:
    def test_same_detections_smaller_output(self):
        """detections_only (serving mode) returns exactly the NMS outputs
        with values identical to the full eval-protocol program."""
        import jax
        import jax.numpy as jnp

        from yolat_tpu.data.toy import random_packed_batch
        from yolat_tpu.eval.predict import make_predict_fn
        from yolat_tpu.train.config import Config
        from yolat_tpu.train.loop import create_state
        from yolat_tpu.train.optim import make_optimizer

        batch_np, _ = random_packed_batch(seed=5, n_images=3)
        cfg = Config(n_classes=17, data_aug=False)
        tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
        state = create_state(cfg, tx, batch_np, jax.random.key(0))
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        batch = jax.tree.map(jnp.asarray, batch_np)

        full = make_predict_fn(cfg, max_det=64)(variables, batch)
        served = make_predict_fn(cfg, max_det=64, detections_only=True)(
            variables, batch)
        assert set(served) == {"boxes", "scores", "classes", "valid"}
        for k in served:
            np.testing.assert_array_equal(np.asarray(full[k]),
                                          np.asarray(served[k]))


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


class TestFusedServingFn:
    def test_serving_fn_matches_jit_path(self, synthetic_root):
        """make_serving_fn (kept-input discovery + single fused-buffer
        transfer + on-device bitcast unpack) returns detections
        bit-identical to the plain jitted predict on real packed
        batches."""
        import jax

        from yolat_tpu.data.dataset import PackedLoader, SESYDDataset
        from yolat_tpu.eval.fast_forward import fold_params
        from yolat_tpu.eval.predict import make_predict_fn, make_serving_fn
        from yolat_tpu.eval.runner import img_slot_cap
        from yolat_tpu.train.config import Config
        from yolat_tpu.train.loop import create_state
        from yolat_tpu.train.optim import make_optimizer

        ds = SESYDDataset(synthetic_root, "train", bbox_sampling_step=5)
        loader = PackedLoader(ds, batch_size=2, shuffle=False, dense=True)
        batches = list(loader)
        cfg = Config(n_classes=ds.n_classes, data_aug=False)
        tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
        b0 = {k: v[0] for k, v in batches[0].items()}
        state = create_state(cfg, tx, b0, jax.random.key(0))
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        folded = fold_params(variables, n_blocks=cfg.n_blocks)
        cap = max(img_slot_cap(st) for st in batches)
        kw = dict(max_det=64, fast=True, folded=folded, bf16=True,
                  img_slots=cap, detections_only=True)
        sfn = make_serving_fn(cfg, variables, b0, **kw)
        jfn = make_predict_fn(cfg, **kw)
        # the discovery must find a nontrivial pruned subset including the
        # bool and f32 leaves the bitcast unpack has to round-trip
        assert sfn.kept_batch_keys is not None
        assert {"pos", "node_mask", "bbox"} <= set(sfn.kept_batch_keys)
        assert "labels" not in sfn.kept_batch_keys  # eval never reads GT
        for st in batches:
            b = {k: v[0] for k, v in st.items()}
            o1 = {k: np.asarray(v) for k, v in sfn(variables, b).items()}
            o2 = {k: np.asarray(v) for k, v in jfn(variables, b).items()}
            for k in o1:
                np.testing.assert_array_equal(o1[k], o2[k], err_msg=k)

    def test_chunked_serving_matches_per_batch(self, synthetic_root):
        """chunk=K mode: one lax.map program over K packed rows returns
        per-row detections identical to per-batch calls, including a
        short final chunk (tail rows replayed + dropped)."""
        import jax

        from yolat_tpu.data.dataset import PackedLoader, SESYDDataset
        from yolat_tpu.eval.fast_forward import fold_params
        from yolat_tpu.eval.predict import make_predict_fn, make_serving_fn
        from yolat_tpu.eval.runner import img_slot_cap
        from yolat_tpu.train.config import Config
        from yolat_tpu.train.loop import create_state
        from yolat_tpu.train.optim import make_optimizer

        ds = SESYDDataset(synthetic_root, "train", bbox_sampling_step=5)
        loader = PackedLoader(ds, batch_size=2, shuffle=False, dense=True)
        batches = [{k: v[0] for k, v in st.items()} for st in loader]
        caps = [img_slot_cap(st) for st in loader]
        cfg = Config(n_classes=ds.n_classes, data_aug=False)
        tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
        state = create_state(cfg, tx, batches[0], jax.random.key(0))
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        folded = fold_params(variables, n_blocks=cfg.n_blocks)
        kw = dict(max_det=64, fast=True, folded=folded, bf16=True,
                  img_slots=max(caps), detections_only=True)
        cfn = make_serving_fn(cfg, variables, batches[0], chunk=3, **kw)
        jfn = make_predict_fn(cfg, **kw)
        take = batches[:2]  # short chunk exercises the tail-replay path
        stacked, nreal = cfn(variables, take)
        assert nreal == len(take)
        host = {k: np.asarray(v) for k, v in stacked.items()}
        for i, b in enumerate(take):
            ref = {k: np.asarray(v) for k, v in jfn(variables, b).items()}
            for k in ref:
                np.testing.assert_array_equal(host[k][i], ref[k],
                                              err_msg=f"{k}[{i}]")
