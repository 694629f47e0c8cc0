"""Model tests: forward shapes, padding invariance, overfit smoke test, and
data-parallel equivalence on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolat_tpu.data.dataset import PackedLoader, SESYDDataset, stack_shards
from yolat_tpu.data.packing import PadSizes, finalize_batch, pack_files
from yolat_tpu.geom.proposals import generate_proposals
from yolat_tpu.nn.model import SparseCADGCN, detection_loss
from yolat_tpu.train.config import Config
from yolat_tpu.train.loop import (
    create_state,
    make_dp_train_step,
    make_train_step,
)
from yolat_tpu.train.optim import make_optimizer


@pytest.fixture(scope="module")
def tiny_batch(synthetic_root):
    ds = SESYDDataset(synthetic_root, "train", bbox_sampling_step=5)
    loads = [ds.load(i) for i in range(2)]
    pad = PadSizes.for_files([l[0] for l in loads], [len(l[1][0]) for l in loads], 2,
                             node_mult=256, edge_mult=256, super_mult=512,
                             prop_mult=32)
    batch = pack_files([l[0] for l in loads], [l[1] for l in loads],
                       [l[2] for l in loads], pad)
    return batch, ds.n_classes


def _cfg(n_classes):
    return Config(n_classes=n_classes, data_aug=False, dropout=0.0)


class TestForward:
    def test_shapes_and_masking(self, tiny_batch):
        batch_np, n_classes = tiny_batch
        batch = finalize_batch(jax.tree.map(jnp.asarray, batch_np))
        model = SparseCADGCN(n_classes=n_classes)
        variables = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                               batch, train=True)
        (logits, boxes), _ = model.apply(
            variables, batch, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(2)},
        )
        P = batch["labels"].shape[0]
        assert logits.shape == (P, n_classes)
        assert boxes.shape == (P, 4)
        assert not np.isnan(np.asarray(logits)).any()

    def test_eval_mode_uses_running_stats(self, tiny_batch):
        batch_np, n_classes = tiny_batch
        batch = finalize_batch(jax.tree.map(jnp.asarray, batch_np))
        model = SparseCADGCN(n_classes=n_classes)
        variables = model.init({"params": jax.random.key(0)}, batch, train=True)
        logits1, _ = model.apply(variables, batch, train=False)
        logits2, _ = model.apply(variables, batch, train=False)
        np.testing.assert_allclose(np.asarray(logits1), np.asarray(logits2))

    def test_padding_invariance(self, tiny_batch):
        """Growing the padding must not change valid logits (train=False to
        rule out BN batch-stat effects, which are mask-correct separately)."""
        batch_np, n_classes = tiny_batch
        model = SparseCADGCN(n_classes=n_classes)
        b1 = finalize_batch(jax.tree.map(jnp.asarray, batch_np))
        variables = model.init({"params": jax.random.key(0)}, b1, train=True)
        out1, _ = model.apply(variables, b1, train=False)

        grown = dict(batch_np)
        pad_n, pad_e, pad_p = 128, 128, 32
        for k, extra in (
            ("pos", pad_n), ("node_mask", pad_n), ("bbox_idx", pad_n),
            ("edge", pad_e), ("e_attr", pad_e), ("edge_mask", pad_e),
            ("labels", pad_p), ("proposal_mask", pad_p), ("bbox", pad_p),
            ("stat_feats", pad_p), ("has_obj", pad_p), ("image_id", pad_p),
            ("is_root", pad_p),
        ):
            arr = grown[k]
            pad_shape = (extra,) + arr.shape[1:]
            grown[k] = np.concatenate([arr, np.zeros(pad_shape, arr.dtype)], axis=0)
        b2 = finalize_batch(jax.tree.map(jnp.asarray, grown))
        out2, _ = model.apply(variables, b2, train=False)

        m = batch_np["proposal_mask"]
        np.testing.assert_allclose(
            np.asarray(out1)[m], np.asarray(out2)[: len(m)][m], rtol=1e-4, atol=1e-5
        )

    def test_conv_registry_variants(self, tiny_batch):
        batch_np, n_classes = tiny_batch
        batch = finalize_batch(jax.tree.map(jnp.asarray, batch_np))
        for conv in ("attr_edge", "edge", "mr", "gin", "sage", "attr_edge_cf"):
            model = SparseCADGCN(n_classes=n_classes, conv=conv)
            variables = model.init({"params": jax.random.key(0)}, batch, train=True)
            logits, _ = model.apply(variables, batch, train=False)
            assert not np.isnan(np.asarray(logits)).any(), conv


class TestTraining:
    def test_loss_decreases(self, tiny_batch):
        batch_np, n_classes = tiny_batch
        cfg = _cfg(n_classes).replace(lr=1e-3)
        tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
        state = create_state(cfg, tx, batch_np, jax.random.key(0))
        step = make_train_step(cfg, tx)
        stacked = stack_shards([batch_np])

        losses = []
        for i in range(15):
            state, metrics = step(state, stacked, jax.random.key(i))
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0] * 0.7, losses

    def test_bf16_mixed_precision_training(self, tiny_batch):
        """dtype='bfloat16' trains with f32 master params/BN stats, bf16
        compute; loss decreases and the state stays f32."""
        batch_np, n_classes = tiny_batch
        cfg = _cfg(n_classes).replace(lr=1e-3, dtype="bfloat16")
        tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
        state = create_state(cfg, tx, batch_np, jax.random.key(0))
        step = make_train_step(cfg, tx)
        stacked = stack_shards([batch_np])

        losses = []
        for i in range(15):
            state, metrics = step(state, stacked, jax.random.key(i))
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0] * 0.7, losses
        assert np.isfinite(losses).all()
        for leaf in jax.tree.leaves(state.params):
            assert leaf.dtype == jnp.float32
        for leaf in jax.tree.leaves(state.batch_stats):
            assert leaf.dtype == jnp.float32

    def test_bf16_close_to_f32_first_step(self, tiny_batch):
        """One bf16 step lands near the f32 step (same data, same key)."""
        batch_np, n_classes = tiny_batch
        import optax

        tx = optax.sgd(1e-2)
        stacked = stack_shards([batch_np])
        outs = {}
        for dt in ("float32", "bfloat16"):
            cfg = _cfg(n_classes).replace(dtype=dt)
            state = create_state(cfg, tx, batch_np, jax.random.key(0))
            step = make_train_step(cfg, tx)
            _, metrics = step(state, stacked, jax.random.key(5))
            outs[dt] = float(metrics["loss"])
        np.testing.assert_allclose(outs["bfloat16"], outs["float32"], rtol=0.05)

    def test_dp_equivalence(self, tiny_batch):
        """8-way DP with identical shards == single-device step.

        SGD instead of Adam: Adam normalises by |g|, amplifying noise-level
        (1e-6) cross-device reduction-order differences on near-zero
        gradients into full +-lr sign flips; SGD keeps the comparison
        faithful to gradient agreement."""
        import optax
        from jax.sharding import Mesh

        batch_np, n_classes = tiny_batch
        cfg = _cfg(n_classes)
        tx = optax.sgd(1e-2)

        state1 = create_state(cfg, tx, batch_np, jax.random.key(0))
        step1 = make_train_step(cfg, tx)
        s1, m1 = step1(state1, stack_shards([batch_np]), jax.random.key(5))

        devices = np.array(jax.devices()[:8])
        mesh = Mesh(devices, ("data",))
        state8 = create_state(cfg, tx, batch_np, jax.random.key(0))
        step8 = make_dp_train_step(cfg, tx, mesh)
        stacked8 = stack_shards([batch_np] * 8)
        s8, m8 = step8(state8, stacked8, jax.random.key(5))

        np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
        l1 = jax.tree.leaves(s1.params)
        l8 = jax.tree.leaves(s8.params)
        for a, b in zip(l1, l8):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)

    def test_detection_loss_masking(self):
        logits = jnp.array([[2.0, -1.0], [0.0, 5.0], [9.0, 9.0]])
        labels = jnp.array([0, 1, 0])
        mask = jnp.array([True, True, False])
        full = detection_loss(logits, labels, jnp.ones(3, bool))["loss"]
        masked = detection_loss(logits, labels, mask)["loss"]
        # the masked-out row had a high loss contribution
        assert float(masked) != float(full)
        want = -(jax.nn.log_softmax(logits)[0, 0] + jax.nn.log_softmax(logits)[1, 1]) / 2
        np.testing.assert_allclose(float(masked), float(want), rtol=1e-6)

    def test_detection_loss_iou_aware(self):
        """label_iou soft targets (cfg.iou_aware_loss): q=1 positives (and
        background rows at any q) reduce to the hard CE; q<1 positives
        train toward {class: q, background: 1-q}."""
        logits = jnp.array([[2.0, -1.0, 0.3], [0.0, 5.0, -2.0],
                            [1.0, 0.5, 4.0]])
        labels = jnp.array([0, 1, 2])  # last = background (K-1)
        mask = jnp.ones(3, bool)
        hard = detection_loss(logits, labels, mask)["loss"]
        exact = detection_loss(logits, labels, mask,
                               label_iou=jnp.array([1.0, 1.0, 0.0]))["loss"]
        np.testing.assert_allclose(float(exact), float(hard), rtol=1e-6)

        q = jnp.array([0.73, 1.0, 0.0])
        soft = detection_loss(logits, labels, mask, label_iou=q)["loss"]
        logp = jax.nn.log_softmax(logits)
        want = -(0.73 * logp[0, 0] + 0.27 * logp[0, 2]
                 + logp[1, 1] + logp[2, 2]) / 3
        np.testing.assert_allclose(float(soft), float(want), rtol=1e-6)
        # the soft loss ORDERS quality: at equal logits, a q=0.73 row wants
        # lower class confidence than a q=1.0 row
        g = jax.grad(lambda lg: detection_loss(
            lg, labels, mask, label_iou=q)["loss"])(logits)
        gh = jax.grad(lambda lg: detection_loss(lg, labels, mask)["loss"])(
            logits)
        assert float(g[0, 2]) < float(gh[0, 2])  # bg channel pushed UP less hard

    def test_detection_loss_pos_weight(self):
        """pos_class_weight: positives' rows weigh `w` in a WEIGHTED mean
        (denominator includes the weights); w=1 is reference-exact."""
        logits = jnp.array([[2.0, -1.0, 0.3], [0.0, 5.0, -2.0],
                            [1.0, 0.5, 4.0]])
        labels = jnp.array([0, 1, 2])  # last = background (K-1)
        mask = jnp.ones(3, bool)
        base = detection_loss(logits, labels, mask)["loss"]
        same = detection_loss(logits, labels, mask, pos_weight=1.0)["loss"]
        np.testing.assert_allclose(float(base), float(same), rtol=1e-7)

        w = 16.0
        weighted = detection_loss(logits, labels, mask, pos_weight=w)["loss"]
        nll = -jax.nn.log_softmax(logits)[jnp.arange(3), labels]
        want = (w * nll[0] + w * nll[1] + nll[2]) / (2 * w + 1)
        np.testing.assert_allclose(float(weighted), float(want), rtol=1e-6)

        # the positive rows' gradient share grows accordingly
        gw = jax.grad(lambda lg: detection_loss(
            lg, labels, mask, pos_weight=w)["loss"])(logits)
        gb = jax.grad(lambda lg: detection_loss(lg, labels, mask)["loss"])(
            logits)
        pos_share = lambda g: float(jnp.abs(g[:2]).sum() / jnp.abs(g).sum())
        assert pos_share(gw) > pos_share(gb)
