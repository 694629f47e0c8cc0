"""Parallel helpers: partitioning, sharded segment reductions on the 8-CPU
mesh, profiling utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from yolat_tpu.parallel.mesh import make_mesh, replicate, shard_leading_axis
from yolat_tpu.parallel.partition import (
    edge_sharded_gp2_layer,
    generate_sub_graphs,
    random_partition_graph,
    sharded_segment_mean,
    sharded_segment_sum,
)
from yolat_tpu.utils.profiling import cost_analysis, timed


class TestPartition:
    def test_random_partition(self):
        parts = random_partition_graph(100, 10, np.random.default_rng(0))
        assert parts.shape == (100,)
        assert parts.max() < 10

    def test_generate_sub_graphs(self):
        rng = np.random.default_rng(1)
        edge = rng.integers(0, 50, size=(200, 2))
        parts = random_partition_graph(50, 4, rng)
        subs = generate_sub_graphs(edge, parts, cluster_number=4, batch_size=2)
        assert len(subs) == 2
        all_nodes = np.concatenate([s[0] for s in subs])
        assert sorted(all_nodes.tolist()) == list(range(50))
        for node_ids, local_edges in subs:
            if len(local_edges):
                assert local_edges.max() < len(node_ids)


class TestShardedSegment:
    def test_matches_global(self):
        mesh = make_mesh(8)
        rng = np.random.default_rng(2)
        E, C, S = 64, 4, 6
        data = rng.normal(size=(8, E, C)).astype(np.float32)
        seg = rng.integers(0, S, size=(8, E))
        mask = rng.random((8, E)) > 0.3

        def f(d, s, m):
            return sharded_segment_sum(d[0], s[0], S, "data", mask=m[0])

        out = jax.jit(
            jax.shard_map(
                f, mesh=mesh, in_specs=(P("data"), P("data"), P("data")),
                out_specs=P(), check_vma=False,
            )
        )(data, seg, mask)

        want = np.zeros((S, C), np.float32)
        for d in range(8):
            for e in range(E):
                if mask[d, e]:
                    want[seg[d, e]] += data[d, e]
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-5)

    def test_mean_matches_global(self):
        mesh = make_mesh(4)
        rng = np.random.default_rng(3)
        E, C, S = 32, 3, 5
        data = rng.normal(size=(4, E, C)).astype(np.float32)
        seg = rng.integers(0, S, size=(4, E))

        def f(d, s):
            return sharded_segment_mean(d[0], s[0], S, "data")

        out = jax.jit(
            jax.shard_map(f, mesh=mesh, in_specs=(P("data"), P("data")),
                          out_specs=P(), check_vma=False)
        )(data, seg)
        flat = data.reshape(-1, C)
        fseg = seg.reshape(-1)
        want = np.stack([
            flat[fseg == s].mean(axis=0) if (fseg == s).any() else np.zeros(C)
            for s in range(S)
        ])
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)


class TestEdgeShardedConv:
    def test_matches_single_device_eval_conv(self):
        """Giant-SVG path: canonical eval conv with edges sharded over the
        8-device mesh == the single-device folded conv (same math as
        eval/fast_forward's reference impl, flat-edge form)."""
        from yolat_tpu.ops.segment import segment_mean

        mesh = make_mesh(8)
        rng = np.random.default_rng(4)
        N, Ci, Co, A = 24, 5, 16, 4
        E = 64  # 8 per shard
        x = rng.normal(size=(N, Ci)).astype(np.float32)
        edge = rng.integers(0, N, size=(E, 2)).astype(np.int32)
        e_attr = rng.normal(size=(E, A)).astype(np.float32)
        edge_mask = rng.random(E) > 0.2

        conv = {
            "w1": rng.normal(size=(2 * Ci + A, Co)).astype(np.float32) * 0.3,
            "sc1": np.stack([np.ones(Co), np.zeros(Co)]).astype(np.float32),
            "w2": rng.normal(size=(Co, Co)).astype(np.float32) * 0.3,
            "sc2": np.stack([np.ones(Co), np.zeros(Co)]).astype(np.float32),
            "wr": rng.normal(size=(Ci, Co)).astype(np.float32) * 0.3,
            "br": rng.normal(size=(Co,)).astype(np.float32),
        }

        # single-device reference (flat edge list, folded eval math)
        x_i, x_j = x[edge[:, 1]], x[edge[:, 0]]
        f = np.concatenate([x_i, x_j - x_i, e_attr], axis=1)
        h = np.maximum(f @ conv["w1"], 0.0)
        h = np.maximum(h @ conv["w2"], 0.0)
        agg = np.asarray(segment_mean(jnp.asarray(h), jnp.asarray(edge[:, 1]),
                                      N, mask=jnp.asarray(edge_mask)))
        want = agg + x @ conv["wr"] + conv["br"]

        def fn(x, edge, e_attr, emask, conv):
            return edge_sharded_gp2_layer(conv, x, edge[0], e_attr[0],
                                          emask[0], "data")

        out = jax.jit(
            jax.shard_map(
                fn, mesh=mesh,
                in_specs=(P(), P("data"), P("data"), P("data"), P()),
                out_specs=P(), check_vma=False,
            )
        )(x, edge.reshape(8, E // 8, 2), e_attr.reshape(8, E // 8, A),
          edge_mask.reshape(8, E // 8), jax.tree.map(jnp.asarray, conv))

        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)


class TestMeshHelpers:
    def test_replicate_and_shard(self):
        mesh = make_mesh(8)
        x = np.arange(16.0).reshape(8, 2)
        r = replicate({"a": x}, mesh)
        s = shard_leading_axis({"a": x}, mesh)
        np.testing.assert_array_equal(np.asarray(r["a"]), x)
        np.testing.assert_array_equal(np.asarray(s["a"]), x)


class TestProfiling:
    def test_timed_and_cost(self):
        f = jax.jit(lambda x: (x @ x).sum())
        x = jnp.ones((64, 64))
        dt = timed(f, x, iters=3)
        assert dt > 0
        costs = cost_analysis(lambda x: x @ x, x)
        assert costs["flops"] is None or costs["flops"] > 0
