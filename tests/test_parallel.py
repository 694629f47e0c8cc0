"""Parallel helpers: partitioning, sharded segment reductions on the 8-CPU
mesh, profiling utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from yolat_tpu.parallel.mesh import make_mesh, replicate, shard_leading_axis
from yolat_tpu.parallel.partition import (
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
