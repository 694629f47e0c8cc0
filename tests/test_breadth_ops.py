"""Tests for the extended op library: GEN aggregations, GAT, dynamic blocks,
the dense batched mirror, and auxiliary losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolat_tpu.nn.dense_graph import (
    DenseDynBlock2d,
    DynConv2d,
    EdgeConv2d,
    MRConv2d,
    ResDynBlock2d,
    batched_index_select,
    dense_knn,
)
from yolat_tpu.nn.dynamic import (
    DenseDynBlock,
    DynConv,
    GATConv,
    PlainDynBlock,
    ResDynBlock,
)
from yolat_tpu.nn.gen_conv import GenAggregation, GENConv, MsgNorm
from yolat_tpu.nn.losses import smooth_cross_entropy
from yolat_tpu.ops.segment import segment_softmax


def _graph(seed=0, n=32, e=64, c=16):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    edge = jnp.asarray(rng.integers(0, n, size=(e, 2)).astype(np.int32))
    mask = jnp.asarray(rng.random(e) > 0.2)
    nmask = jnp.ones(n, bool)
    return x, edge, mask, nmask


class TestGenAggregation:
    def test_softmax_weighted_sum(self):
        x, edge, mask, _ = _graph()
        msg = x[edge[:, 0]]
        agg = GenAggregation(aggr="softmax", t=1.0)
        out, _ = agg.init_with_output(jax.random.key(0), msg, edge[:, 1], 32,
                                      mask=mask)
        # hand-check one segment
        seg = np.asarray(edge[:, 1])
        m = np.asarray(mask)
        s = 3
        rows = (seg == s) & m
        if rows.any():
            mm = np.asarray(msg)[rows]
            w = np.exp(mm) / np.exp(mm).sum(axis=0)
            np.testing.assert_allclose(np.asarray(out)[s], (w * mm).sum(axis=0),
                                       rtol=1e-4, atol=1e-5)

    def test_power_mean(self):
        x, edge, mask, _ = _graph(1)
        msg = jnp.abs(x[edge[:, 0]]) + 0.1
        agg = GenAggregation(aggr="power", p=2.0)
        out, _ = agg.init_with_output(jax.random.key(0), msg, edge[:, 1], 32,
                                      mask=mask)
        seg = np.asarray(edge[:, 1])
        m = np.asarray(mask)
        s = int(seg[m][0])
        rows = (seg == s) & m
        mm = np.clip(np.asarray(msg)[rows], 1e-7, 1e1)
        want = np.clip((mm ** 2).mean(axis=0), 1e-7, 1e1) ** 0.5
        np.testing.assert_allclose(np.asarray(out)[s], want, rtol=1e-4)

    def test_gen_conv_runs(self):
        x, edge, mask, nmask = _graph(2)
        conv = GENConv(16, 16, aggr="softmax", learn_t=True, msg_norm=True)
        out, _ = conv.init_with_output(jax.random.key(0), x, edge,
                                       edge_mask=mask, node_mask=nmask)
        assert out.shape == (32, 16)
        assert not np.isnan(np.asarray(out)).any()

    def test_msg_norm(self):
        x = jnp.ones((4, 8))
        msg = jnp.full((4, 8), 3.0)
        out, _ = MsgNorm().init_with_output(jax.random.key(0), x, msg)
        # normalised message carries the feature norm
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=1),
            np.linalg.norm(np.asarray(x), axis=1), rtol=1e-5,
        )


class TestGAT:
    def test_attention_sums_to_one(self):
        x, edge, mask, nmask = _graph(3)
        conv = GATConv(16, 4, heads=2)
        out, _ = conv.init_with_output(jax.random.key(0), x, edge,
                                       edge_mask=mask, node_mask=nmask,
                                       train=False)
        assert out.shape == (32, 8)
        assert not np.isnan(np.asarray(out)).any()


class TestDynamicBlocks:
    def test_dyn_conv_and_blocks(self):
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(24, 8)).astype(np.float32))
        nmask = jnp.asarray(rng.random(24) > 0.1)
        for block in (
            DynConv(8, 8, kernel_size=4),
            PlainDynBlock(8, kernel_size=4),
            ResDynBlock(8, kernel_size=4),
        ):
            out, _ = block.init_with_output(jax.random.key(0), x, nmask,
                                            train=False)
            assert out.shape == (24, 8)
        dense = DenseDynBlock(8, 8, kernel_size=4)
        out, _ = dense.init_with_output(jax.random.key(0), x, nmask, train=False)
        assert out.shape == (24, 16)

    def test_res_block_multi_edge(self):
        """Multi-edge-family residual block: per-family conv + residual,
        max-pooled across families (torch_vertex.py:831-857)."""
        from yolat_tpu.nn.dynamic import ResBlockMultiEdge

        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(20, 8)).astype(np.float32))
        edges = [jnp.asarray(rng.integers(0, 20, size=(16, 2)).astype(np.int32))
                 for _ in range(3)]
        masks = [jnp.asarray(rng.random(16) > 0.2) for _ in range(3)]
        block = ResBlockMultiEdge(8, conv="edge", n_edges=3)
        out, _ = block.init_with_output(jax.random.key(0), x, edges,
                                        edge_masks=masks, train=False)
        assert out.shape == (20, 8)
        assert np.isfinite(np.asarray(out)).all()
        # max over families dominates each individual family's output
        params = block.init(jax.random.key(0), x, edges, edge_masks=masks,
                            train=False)
        single = block.apply(params, x, [edges[0]] * 3,
                             edge_masks=[masks[0]] * 3, train=False)
        assert (np.asarray(out) >= np.asarray(single) - 1e-5).any()


class TestDenseMirror:
    def test_batched_index_select(self):
        x = jnp.arange(2 * 5 * 3, dtype=jnp.float32).reshape(2, 5, 3)
        idx = jnp.array([[[0, 1], [2, 2]], [[4, 3], [0, 0]]])
        out = batched_index_select(x, idx)
        np.testing.assert_array_equal(np.asarray(out[1, 0, 0]), np.asarray(x[1, 4]))

    def test_dense_knn_masks(self):
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(2, 10, 3)).astype(np.float32))
        mask = jnp.ones((2, 10), bool).at[0, 7:].set(False)
        idx = dense_knn(x, 3, mask=mask)
        assert (np.asarray(idx[0]) < 7).all()

    def test_conv2d_variants(self):
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.normal(size=(2, 16, 8)).astype(np.float32))
        idx = dense_knn(x, 4)
        for mod in (EdgeConv2d(8, 12), MRConv2d(8, 12)):
            out, _ = mod.init_with_output(jax.random.key(0), x, idx, train=False)
            assert out.shape == (2, 16, 12)
        for mod in (DynConv2d(8, 12, kernel_size=4),):
            out, _ = mod.init_with_output(jax.random.key(0), x, train=False)
            assert out.shape == (2, 16, 12)
        out, _ = ResDynBlock2d(8, kernel_size=4).init_with_output(
            jax.random.key(0), x, train=False)
        assert out.shape == (2, 16, 8)
        out, _ = DenseDynBlock2d(8, 8, kernel_size=4).init_with_output(
            jax.random.key(0), x, train=False)
        assert out.shape == (2, 16, 16)


class TestLosses:
    def test_smooth_ce(self):
        logits = jnp.array([[10.0, -10.0], [-10.0, 10.0]])
        labels = jnp.array([0, 1])
        sharp = smooth_cross_entropy(logits, labels, smoothing=0.0)
        smooth = smooth_cross_entropy(logits, labels, smoothing=0.2)
        assert float(sharp) < float(smooth)
