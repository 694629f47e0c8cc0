"""Pallas kernel equivalence tests (interpreter mode on CPU) and folded
fast-forward parity against the flax eval path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolat_tpu.data.packing import add_dense_neighbors, finalize_batch
from yolat_tpu.data.toy import random_packed_batch
from yolat_tpu.eval.fast_forward import fast_forward, fold_params
from yolat_tpu.nn.model import SparseCADGCN
from yolat_tpu.ops.pallas_kernels import (
    fused_dense_message,
    fused_dense_message_reference,
)


def _random_kernel_inputs(seed=0, n=256, d=4, ci=64, co=64, a=4):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, ci)).astype(np.float32)
    nbr_idx = rng.integers(0, n, size=(n, d)).astype(np.int32)
    nbr_attr = rng.normal(size=(n, d, a)).astype(np.float32)
    nbr_mask = rng.random((n, d)) > 0.4
    w1 = rng.normal(size=(2 * ci + a, co)).astype(np.float32) * 0.1
    sc1 = np.stack([rng.uniform(0.5, 1.5, co), rng.normal(size=co)]).astype(np.float32)
    w2 = rng.normal(size=(co, co)).astype(np.float32) * 0.1
    sc2 = np.stack([rng.uniform(0.5, 1.5, co), rng.normal(size=co)]).astype(np.float32)
    wr = rng.normal(size=(ci, co)).astype(np.float32) * 0.1
    br = rng.normal(size=(co,)).astype(np.float32)
    return [jnp.asarray(v) for v in
            (x, nbr_idx, nbr_attr, nbr_mask, w1, sc1, w2, sc2, wr, br)]


class TestFusedKernel:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_reference(self, seed):
        args = _random_kernel_inputs(seed=seed)
        want = fused_dense_message_reference(*args)
        got = fused_dense_message(*args, block_n=128, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_small_input_channels(self):
        # conv1 consumes 5-channel inputs — exercises non-128-aligned dims
        args = _random_kernel_inputs(seed=2, ci=5)
        want = fused_dense_message_reference(*args)
        got = fused_dense_message(*args, block_n=64, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_isolated_nodes_get_skip_only(self):
        args = _random_kernel_inputs(seed=3)
        x, nbr_idx, nbr_attr, nbr_mask = args[:4]
        nbr_mask = jnp.zeros_like(nbr_mask)
        out = fused_dense_message(x, nbr_idx, nbr_attr, nbr_mask, *args[4:],
                                  block_n=128, interpret=True)
        want = x @ args[8] + args[9]
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


class TestFastForward:
    def test_parity_with_flax_eval(self):
        batch_np, _ = random_packed_batch(seed=4, n_images=2)
        dense_np = add_dense_neighbors(batch_np)
        batch = finalize_batch(jax.tree.map(jnp.asarray, dense_np))

        model = SparseCADGCN(n_classes=17)
        variables = model.init({"params": jax.random.key(0)}, batch, train=True)
        # run one train pass so batch_stats are non-trivial
        _, mutated = model.apply(variables, batch, train=True,
                                 mutable=["batch_stats"],
                                 rngs={"dropout": jax.random.key(1)})
        variables = {"params": variables["params"],
                     "batch_stats": mutated["batch_stats"]}

        want, _ = model.apply(variables, batch, train=False)
        folded = fold_params(variables, n_blocks=2)
        got, _ = fast_forward(folded, batch, use_pallas=False)
        m = batch_np["proposal_mask"]
        np.testing.assert_allclose(np.asarray(got)[m], np.asarray(want)[m],
                                   rtol=3e-4, atol=3e-4)

        got_pl, _ = fast_forward(folded, batch, use_pallas=True, interpret=True)
        np.testing.assert_allclose(np.asarray(got_pl)[m], np.asarray(want)[m],
                                   rtol=3e-4, atol=3e-4)


class TestSparseFastForward:
    def test_sparse_fast_matches_flax_eval(self):
        """Folded-BN serving on the sparse edge layout (no dense table)
        matches model.apply(train=False) logits."""
        import jax

        from yolat_tpu.data.packing import finalize_batch
        from yolat_tpu.data.toy import random_packed_batch
        from yolat_tpu.eval.fast_forward import fast_forward, fold_params
        from yolat_tpu.nn.model import SparseCADGCN
        from yolat_tpu.train.config import Config

        batch_np, _ = random_packed_batch(seed=4, n_images=2)
        cfg = Config(n_classes=17)
        model = SparseCADGCN(n_classes=17, sorted_edges=True)
        b = finalize_batch(jax.tree.map(jnp.asarray, batch_np))
        variables = model.init({"params": jax.random.key(0)}, b, train=True)
        # train one BN-stats update so folded stats are non-trivial
        _, mut = model.apply(variables, b, train=True,
                             mutable=["batch_stats"])
        variables = {"params": variables["params"],
                     "batch_stats": mut["batch_stats"]}
        want, _ = model.apply(variables, b, train=False)
        folded = fold_params(variables, n_blocks=cfg.n_blocks)
        got, _ = fast_forward(folded, b, use_pallas=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)
        # bf16 serving on the sparse layout (regression: used to KeyError
        # on the absent nbr_attr before the layout dispatch)
        got16, _ = fast_forward(folded, b, use_pallas=False, bf16=True)
        np.testing.assert_allclose(np.asarray(got16), np.asarray(want),
                                   rtol=0.1, atol=0.15)


class TestFoldedMlpBlockMax:
    def test_matches_jnp(self):
        from yolat_tpu.ops.pallas_kernels import folded_mlp_block_max

        rng = np.random.default_rng(0)
        n, ci, h, block = 1024, 24, 48, 8
        x = rng.normal(size=(n, ci)).astype(np.float32)
        w = (rng.normal(size=(ci, h)) * 0.3).astype(np.float32)
        sc = np.stack([rng.uniform(0.5, 1.5, h),
                       rng.normal(size=h) * 0.1]).astype(np.float32)
        mask = rng.random(n) < 0.8
        mask[:16] = False  # one fully-masked block
        got = folded_mlp_block_max(jnp.asarray(x),
                                   jnp.asarray(mask, np.float32)[:, None],
                                   jnp.asarray(w), jnp.asarray(sc),
                                   block=block, interpret=True)
        full = np.maximum((x @ w) * sc[0] + sc[1], 0.0)
        full = np.where(mask[:, None], full, -1e30)
        want = full.reshape(n // block, block, h).max(axis=1)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                                   atol=1e-5)

    def test_fast_forward_fused_pool_parity(self):
        """fused_pool=True (interpret) matches the two-stage path."""
        batch_np, _ = random_packed_batch(seed=9, n_images=2)
        batch = finalize_batch(jax.tree.map(jnp.asarray, batch_np))
        model = SparseCADGCN(n_classes=17, sorted_edges=True)
        variables = model.init({"params": jax.random.key(0)}, batch,
                               train=True)
        _, mutated = model.apply(variables, batch, train=True,
                                 mutable=["batch_stats"],
                                 rngs={"dropout": jax.random.key(1)})
        variables = {"params": variables["params"],
                     "batch_stats": mutated["batch_stats"]}
        folded = fold_params(variables, n_blocks=2)
        m = batch_np["proposal_mask"]
        base, _ = fast_forward(folded, batch, use_pallas=False,
                               fused_pool=False)
        got, _ = fast_forward(folded, batch, use_pallas=False,
                              interpret=True, fused_pool=True)
        np.testing.assert_allclose(np.asarray(got)[m], np.asarray(base)[m],
                                   rtol=3e-5, atol=3e-5)
