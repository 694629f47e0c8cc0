"""YOLaT++ folded serving engine (eval/fast_forward.fast_forward_pp):
logits parity with the flax model in eval mode, with every ReZero gate
opened so all three hierarchy levels are exercised."""

import jax
import jax.numpy as jnp
import numpy as np

from yolat_tpu.data.packing import finalize_batch
from yolat_tpu.data.toy import random_packed_batch
from yolat_tpu.eval.fast_forward import (PP_GATES, fast_forward_pp,
                                         fold_params_for, fold_params_pp)
from yolat_tpu.nn.yolat_pp import YOLaTPlusPlus


def _pp_setup(seed=3, n_images=4, open_gates=True):
    batch_np, _ = random_packed_batch(seed=seed, n_images=n_images)
    jb = finalize_batch(jax.tree.map(jnp.asarray, batch_np))
    model = YOLaTPlusPlus(n_classes=17, sorted_edges=True)
    var = model.init({"params": jax.random.key(0)}, jb, train=True)
    if open_gates:
        # gates init at zero (canonical-equivalent forward); open them so
        # the point/curve/primitive residual streams carry signal
        params = dict(var["params"])
        for i, g in enumerate(PP_GATES):
            assert g in params, g
            params[g] = jnp.asarray(0.3 + 0.1 * i, jnp.float32)
        var = {"params": params, "batch_stats": var["batch_stats"]}
    return model, var, jb


class TestFastForwardPP:
    def test_logits_match_flax_eval(self):
        model, var, jb = _pp_setup()
        want, wb = model.apply(var, jb, train=False)
        folded = fold_params_pp(var, n_blocks=2)
        got, gb = fast_forward_pp(folded, jb, edge_kernel=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(wb))

    def test_edge_kernel_route_matches(self):
        from yolat_tpu.ops.edge_window import edge_window_plan

        model, var, jb_base = _pp_setup(seed=5, n_images=16)
        batch_np, _ = random_packed_batch(seed=5, n_images=16)
        p = edge_window_plan(batch_np["edge"], batch_np["edge_mask"],
                             batch_np["e_attr"],
                             batch_np["pos"].shape[0], wn=128)
        assert p is not None
        jb = finalize_batch(jax.tree.map(jnp.asarray, {**batch_np, **p}))
        var = model.init({"params": jax.random.key(0)}, jb, train=True)
        params = dict(var["params"])
        for i, g in enumerate(PP_GATES):
            params[g] = jnp.asarray(0.3 + 0.1 * i, jnp.float32)
        var = {"params": params, "batch_stats": var["batch_stats"]}
        folded = fold_params_pp(var, n_blocks=2)
        a, _ = fast_forward_pp(folded, jb, edge_kernel=True, interpret=True)
        b, _ = fast_forward_pp(folded, jb, edge_kernel=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)

    def test_bf16_close(self):
        model, var, jb = _pp_setup(seed=7)
        folded = fold_params_pp(var, n_blocks=2)
        a, _ = fast_forward_pp(folded, jb, edge_kernel=False)
        b, _ = fast_forward_pp(folded, jb, edge_kernel=False, bf16=True)
        # rank agreement on valid proposals is what serving needs
        m = np.asarray(jb["proposal_mask"])
        pa = np.asarray(a).argmax(1)[m]
        pb = np.asarray(b, np.float32).argmax(1)[m]
        assert (pa == pb).mean() > 0.97

    def test_fold_dispatch(self):
        from yolat_tpu.train.config import Config

        model, var, jb = _pp_setup(seed=9)
        cfg = Config(n_classes=17, arch="yolat_pp")
        folded = fold_params_for(cfg, var)
        assert "gates" in folded and "super_node_mlp" in folded

    def test_runner_fast_mode_pp(self):
        """run_eval with serve='fast' on a yolat_pp config end-to-end."""
        from yolat_tpu.eval.predict import make_predict_fn
        from yolat_tpu.train.config import Config

        model, var, jb = _pp_setup(seed=11)
        cfg = Config(n_classes=17, arch="yolat_pp")
        folded = fold_params_for(cfg, var)
        predict = make_predict_fn(cfg, max_det=50, fast=True, folded=folded)
        out = predict(var, jb)
        assert out["boxes"].shape[1] == 50
        assert not np.isnan(np.asarray(out["scores"])).any()

    def test_factored_route_matches_flax(self):
        """A cfg.pp_factored_prim checkpoint serves through the folded
        engine with logits parity to the flax model in eval mode (the
        factored prim level replaces the per-edge clique level end to
        end — fold_params_pp folds super_fact_mlp, fast_forward_pp runs
        the prefix-sum aggregation)."""
        batch_np, _ = random_packed_batch(seed=13, n_images=4)
        jb = finalize_batch(jax.tree.map(jnp.asarray, batch_np))
        model = YOLaTPlusPlus(n_classes=17, sorted_edges=True,
                              factored_prim=True)
        var = model.init({"params": jax.random.key(0)}, jb, train=True)
        params = dict(var["params"])
        assert "super_fact_mlp" in params
        assert "super_edge_mlp" not in params
        for i, g in enumerate(PP_GATES):
            params[g] = jnp.asarray(0.3 + 0.1 * i, jnp.float32)
        var = {"params": params, "batch_stats": var["batch_stats"]}
        want, _ = model.apply(var, jb, train=False)
        folded = fold_params_pp(var, n_blocks=2)
        assert "super_fact_mlp" in folded
        got, _ = fast_forward_pp(folded, jb, edge_kernel=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_factored_checkpoint_foreign_batch_raises(self):
        """A factored checkpoint served with a batch lacking the factored
        pack fields fails with a descriptive error, not a KeyError on the
        absent super_edge_mlp (ADVICE round 4)."""
        import pytest

        batch_np, _ = random_packed_batch(seed=13, n_images=2)
        jb_full = finalize_batch(jax.tree.map(jnp.asarray, batch_np))
        model = YOLaTPlusPlus(n_classes=17, sorted_edges=True,
                              factored_prim=True)
        var = model.init({"params": jax.random.key(0)}, jb_full, train=True)
        folded = fold_params_pp(var, n_blocks=2)
        strip = {k: v for k, v in batch_np.items()
                 if k not in ("sup_member", "sup_rank", "sup_abar",
                              "prop_first_row")}
        jb = finalize_batch(jax.tree.map(jnp.asarray, strip))
        with pytest.raises(ValueError, match="factored pack fields"):
            fast_forward_pp(folded, jb, edge_kernel=False)

    def test_banded_route_matches(self):
        """Curve + prim levels through the ragged banded kernel
        (ops/banded_message.py, interpret) == the gather/segment route."""
        from yolat_tpu.ops.banded_message import banded_plan

        model, var, _ = _pp_setup(seed=11, n_images=16)
        batch_np, _ = random_packed_batch(seed=11, n_images=16)
        n = batch_np["pos"].shape[0]
        extras = {}
        for prefix, e, m, a, sb in (
                ("sew_", batch_np["edge_super"], batch_np["super_mask"],
                 batch_np["e_attr_super"], 1),
                ("cwd_", batch_np["edge"], batch_np["edge_mask"],
                 batch_np["e_attr"], 1),
                ("cws_", batch_np["edge"], batch_np["edge_mask"],
                 batch_np["e_attr"], 0)):
            p = banded_plan(e, m, a, n, wn=128, pad=64, eblk=128, sortby=sb)
            assert p is not None, prefix
            extras.update({prefix + k: v for k, v in p.items()})
        jb = finalize_batch(jax.tree.map(jnp.asarray, {**batch_np, **extras}))
        var = model.init({"params": jax.random.key(0)}, jb, train=True)
        params = dict(var["params"])
        for i, g in enumerate(PP_GATES):
            params[g] = jnp.asarray(0.3 + 0.1 * i, jnp.float32)
        var = {"params": params, "batch_stats": var["batch_stats"]}
        folded = fold_params_pp(var, n_blocks=2)
        a, _ = fast_forward_pp(folded, jb, edge_kernel=True, interpret=True)
        b, _ = fast_forward_pp(folded, jb, edge_kernel=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)
