"""Trainable edge-window ops: fwd parity vs a gather oracle and VJP parity
vs autodiff through the oracle (interpret mode — same kernels the TPU runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolat_tpu.data.toy import random_packed_batch
from yolat_tpu.ops.edge_window import ew_of
from yolat_tpu.ops.edge_window_train import (
    ew_pair_features,
    ew_window_segment_sum_n,
)


@pytest.fixture(scope="module")
def plan_batch():
    batch, _ = random_packed_batch(seed=7, n_images=2)
    assert "ew_src_rel" in batch, "toy batch should carry an edge-window plan"
    return batch


def _oracle_pair(x, ew):
    """Gather oracle in window layout (same clamped-halo band semantics)."""
    src_rel, dst_loc, _, _ = ew
    nw, eb = src_rel.shape
    n, ci = x.shape
    wn = n // nw
    ks = jnp.arange(nw)
    xw = x.reshape(nw, wn, ci)
    band = jnp.concatenate(
        [xw[jnp.maximum(ks - 1, 0)], xw, xw[jnp.minimum(ks + 1, nw - 1)]],
        axis=1)
    x_i = jnp.take_along_axis(xw, jnp.asarray(dst_loc)[..., None], axis=1)
    x_j = jnp.take_along_axis(band, jnp.asarray(src_rel)[..., None], axis=1)
    return jnp.concatenate([x_i, x_j - x_i], axis=-1).reshape(nw * eb, 2 * ci)


def _oracle_wsum(h, ew, n):
    src_rel, dst_loc, _, _ = ew
    nw, eb = dst_loc.shape
    wn = n // nw
    dst_glob = (jnp.asarray(dst_loc)
                + (jnp.arange(nw) * wn)[:, None]).reshape(-1)
    return jax.ops.segment_sum(h.astype(jnp.float32), dst_glob,
                               num_segments=n)


class TestPairFeatures:
    def test_forward_matches_oracle(self, plan_batch):
        ew = ew_of(plan_batch)
        n = plan_batch["pos"].shape[0]
        x = jnp.asarray(np.random.default_rng(0).normal(size=(n, 8)),
                        jnp.float32)
        got = ew_pair_features(x, ew, interpret=True)
        want = _oracle_pair(x, ew)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)

    def test_vjp_matches_oracle(self, plan_batch):
        ew = ew_of(plan_batch)
        maskf = jnp.asarray(plan_batch["ew_maskf"]).reshape(-1, 1)
        n = plan_batch["pos"].shape[0]
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(n, 8)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(16, 4)), jnp.float32)

        def loss_kernel(x):
            g = ew_pair_features(x, ew, interpret=True) * maskf
            return jnp.sum(jnp.tanh(g @ w))

        def loss_oracle(x):
            g = _oracle_pair(x, ew) * maskf
            return jnp.sum(jnp.tanh(g @ w))

        gk = jax.grad(loss_kernel)(x)
        go = jax.grad(loss_oracle)(x)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(go),
                                   rtol=1e-5, atol=1e-5)


class TestWindowSegmentSum:
    def test_forward_matches_oracle(self, plan_batch):
        ew = ew_of(plan_batch)
        n = plan_batch["pos"].shape[0]
        nw, eb = np.asarray(ew[0]).shape
        rng = np.random.default_rng(2)
        h = jnp.asarray(rng.normal(size=(nw * eb, 8)), jnp.float32)
        h = h * jnp.asarray(plan_batch["ew_maskf"]).reshape(-1, 1)
        got = ew_window_segment_sum_n(h, ew, n, interpret=True)
        want = _oracle_wsum(h, ew, n)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_vjp_matches_oracle(self, plan_batch):
        ew = ew_of(plan_batch)
        n = plan_batch["pos"].shape[0]
        nw, eb = np.asarray(ew[0]).shape
        rng = np.random.default_rng(3)
        h = jnp.asarray(rng.normal(size=(nw * eb, 8)), jnp.float32)
        m = jnp.asarray(plan_batch["ew_maskf"]).reshape(-1, 1)

        gk = jax.grad(lambda h: jnp.sum(jnp.sin(
            ew_window_segment_sum_n(h * m, ew, n, interpret=True))))(h)
        go = jax.grad(lambda h: jnp.sum(jnp.sin(
            _oracle_wsum(h * m, ew, n))))(h)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(go),
                                   rtol=1e-5, atol=1e-5)


class TestWindowLayoutConv:
    def test_conv_module_fwd_and_grads_match_sparse(self, plan_batch):
        """The SAME AttrEdgeGP2 module (identical params) through the
        window branch vs the sparse dst-sorted branch: equal outputs and
        equal grads wrt inputs AND params (the window kernels only
        re-route memory traffic). Tested at the conv level with healthy
        O(1) inputs — the full untrained toy model saturates its head
        (logits ~1e7), which amplifies f32 accumulation-order noise into
        the loss grads and would make a whole-model comparison test
        conditioning, not correctness."""
        from yolat_tpu.nn.conv import AttrEdgeGP2

        ew = ew_of(plan_batch)
        n = plan_batch["pos"].shape[0]
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(n, 8)), jnp.float32)
        conv = AttrEdgeGP2(in_channels=8, out_channels=8, sorted_edges=True)
        args = dict(edge=jnp.asarray(plan_batch["edge"]),
                    e_attr=jnp.asarray(plan_batch["e_attr"]),
                    edge_mask=jnp.asarray(plan_batch["edge_mask"]),
                    node_mask=jnp.asarray(plan_batch["node_mask"]),
                    dst_count=jnp.asarray(plan_batch["dst_count"]))
        variables = conv.init({"params": jax.random.key(0)}, x, x,
                              train=True, **args)

        def run(x, params, use_ew):
            (out, out_node), _ = conv.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, x, train=True, mutable=["batch_stats"],
                ew=ew if use_ew else None, **args)
            m = jnp.asarray(plan_batch["node_mask"])[:, None]
            return jnp.sum(jnp.tanh(out) * m) + jnp.sum(out_node * m)

        for argnum, tag in ((0, "dx"), (1, "dparams")):
            ga = jax.grad(run, argnums=argnum)(x, variables["params"], False)
            gb = jax.grad(run, argnums=argnum)(x, variables["params"], True)
            jax.tree_util.tree_map_with_path(
                lambda p, a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
                    err_msg=tag + jax.tree_util.keystr(p)),
                ga, gb)
        va = run(x, variables["params"], False)
        vb = run(x, variables["params"], True)
        np.testing.assert_allclose(float(va), float(vb), rtol=1e-5)

    def test_model_logits_match_sparse(self, plan_batch):
        """Whole-model forward parity: train_layout='window' produces the
        sparse branch's logits (relative tolerance — see conditioning note
        above)."""
        import optax

        from yolat_tpu.data.packing import finalize_batch
        from yolat_tpu.train.config import Config
        from yolat_tpu.train.loop import build_model, create_state

        n_classes = int(plan_batch["labels"].max()) + 2
        tx = optax.sgd(1e-2)
        logits = {}
        for name in ("sparse", "window"):
            cfg = Config(n_classes=n_classes, data_aug=False,
                         train_layout=name)
            model = build_model(cfg)
            state = create_state(cfg, tx, plan_batch, jax.random.key(0))
            b = finalize_batch(jax.tree.map(jnp.asarray, plan_batch))
            (lg, _), _ = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                b, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(1)})
            logits[name] = np.asarray(lg)
        np.testing.assert_allclose(logits["window"], logits["sparse"],
                                   rtol=2e-4, atol=2e-4)

    def test_train_step_runs_window_layout(self, plan_batch):
        """End-to-end jitted train step with train_layout='window'."""
        from yolat_tpu.data.dataset import stack_shards
        from yolat_tpu.train.config import Config
        from yolat_tpu.train.loop import create_state, make_train_step
        from yolat_tpu.train.optim import make_optimizer

        n_classes = int(plan_batch["labels"].max()) + 2
        cfg = Config(n_classes=n_classes, data_aug=True,
                     train_layout="window")
        tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
        state = create_state(cfg, tx, plan_batch, jax.random.key(0))
        step = make_train_step(cfg, tx)
        st, m = step(state, stack_shards([plan_batch]), jax.random.key(2))
        assert np.isfinite(float(m["loss"]))
