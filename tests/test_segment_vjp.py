"""Custom segment-max VJP: gradient parity with XLA's native backward
(modulo tie-splitting) and tie handling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolat_tpu.ops.segment import segment_max


class TestSegmentMaxVJP:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_grad_matches_native(self, seed):
        rng = np.random.default_rng(seed)
        data = jnp.asarray(rng.normal(size=(60, 5)).astype(np.float32))
        seg = jnp.asarray(rng.integers(0, 8, 60))
        mask = jnp.asarray(rng.random(60) > 0.25)

        def custom(d):
            return (segment_max(d, seg, 10, mask=mask) ** 2).sum()

        def native(d):
            d2 = jnp.where(mask[:, None], d, -1e30)
            out = jax.ops.segment_max(d2, seg, num_segments=10)
            out = jnp.where(out <= -5e29, 0.0, out)
            return (out ** 2).sum()

        g1 = jax.jit(jax.grad(custom))(data)
        g2 = jax.grad(native)(data)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-5, atol=1e-6)

    def test_ties_send_grad_to_all_winners(self):
        # compare-based backward: every row achieving the segment max gets
        # the full cotangent (torch_scatter routes it to one winner; exact
        # ties only arise on duplicated rows / post-relu zeros — see
        # segment_max docstring). The non-max row must get none.
        data = jnp.array([[3.0], [3.0], [1.0]])
        seg = jnp.array([0, 0, 0])
        g = jax.grad(lambda d: segment_max(d, seg, 1).sum())(data)
        np.testing.assert_allclose(np.asarray(g), [[1.0], [1.0], [0.0]])

    def test_empty_segment_no_grad(self):
        data = jnp.array([[2.0], [4.0]])
        seg = jnp.array([0, 0])
        g = jax.grad(lambda d: segment_max(d, seg, 3).sum())(data)
        np.testing.assert_allclose(np.asarray(g), [[0.0], [1.0]])

    def test_fully_masked_no_grad(self):
        data = jnp.array([[2.0], [4.0]])
        seg = jnp.array([0, 0])
        mask = jnp.array([False, False])
        g = jax.grad(lambda d: segment_max(d, seg, 1, mask=mask).sum())(data)
        np.testing.assert_allclose(np.asarray(g), 0.0)


class TestPoolPlan:
    """Two-level contiguous-segment reductions (ops/segment.pool_plan)."""

    def _case(self, seed, S=23, C=5):
        rng = np.random.default_rng(seed)
        lens = rng.integers(0, 25, S)
        seg = np.repeat(np.arange(S), lens)
        n = ((len(seg) + 7) // 8) * 8 + 8 * int(rng.integers(0, 3))
        nv = int(lens.sum())
        seg = np.concatenate([seg, np.full(n - nv, S - 1)]).astype(np.int32)
        mask = np.zeros(n, bool)
        mask[:nv] = True
        x = rng.normal(size=(n, C)).astype(np.float32)
        from yolat_tpu.ops.segment import pool_plan

        plan = pool_plan(seg, S)
        pt = tuple(jnp.asarray(plan[k]) for k in
                   ("pool_blk_first", "pool_blk_full", "pool_bnd_rows",
                    "pool_bnd_seg", "pool_bnd_mask"))
        return jnp.asarray(x), jnp.asarray(seg), jnp.asarray(mask), S, pt

    def test_matches_scatter_path(self):
        from yolat_tpu.ops.segment import segment_max, segment_mean, segment_sum

        for seed in range(4):
            x, seg, mask, S, pt = self._case(seed)
            for fn in (segment_max, segment_mean, segment_sum):
                a = fn(x, seg, S, mask=mask, indices_are_sorted=True)
                b = fn(x, seg, S, mask=mask, plan=pt)
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-5, atol=1e-5)

    def test_max_grad_matches(self):
        from yolat_tpu.ops.segment import segment_max

        x, seg, mask, S, pt = self._case(7)
        g1 = jax.grad(lambda d: segment_max(d, seg, S, mask=mask).sum())(x)
        g2 = jax.grad(lambda d: segment_max(d, seg, S, mask=mask,
                                            plan=pt).sum())(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2))

    def test_packed_batch_carries_plan(self):
        from yolat_tpu.data.toy import random_packed_batch
        from yolat_tpu.ops.segment import plan_of, segment_max

        batch, _ = random_packed_batch()
        pt = plan_of(batch)
        assert pt is not None
        x = np.random.default_rng(0).normal(
            size=(batch["pos"].shape[0], 3)).astype(np.float32)
        P = batch["labels"].shape[0]
        a = segment_max(jnp.asarray(x), jnp.asarray(batch["bbox_idx"]), P,
                        mask=jnp.asarray(batch["node_mask"]),
                        indices_are_sorted=True)
        b = segment_max(jnp.asarray(x), jnp.asarray(batch["bbox_idx"]), P,
                        mask=jnp.asarray(batch["node_mask"]),
                        plan=tuple(jnp.asarray(v) for v in pt))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def _aligned_case(self, seed, S=23, C=5, block=8):
        """Block-ALIGNED layout (every segment run padded to `block`) with a
        cap=0 plan — the CompactFile packing contract."""
        rng = np.random.default_rng(seed)
        lens = rng.integers(1, 25, S)
        alens = ((lens + block - 1) // block) * block
        seg = np.repeat(np.arange(S), alens).astype(np.int32)
        mask = np.zeros(len(seg), bool)
        starts = np.concatenate([[0], np.cumsum(alens)[:-1]])
        for s in range(S):
            mask[starts[s] : starts[s] + lens[s]] = True
        x = rng.normal(size=(len(seg), C)).astype(np.float32)
        from yolat_tpu.ops.segment import pool_plan

        plan = pool_plan(seg, S, cap=0)
        assert plan["pool_bnd_rows"].shape == (0,)
        pt = tuple(jnp.asarray(plan[k]) for k in
                   ("pool_blk_first", "pool_blk_full", "pool_bnd_rows",
                    "pool_bnd_seg", "pool_bnd_mask"))
        return jnp.asarray(x), jnp.asarray(seg), jnp.asarray(mask), S, pt

    def test_aligned_plan_matches_scatter_path(self):
        from yolat_tpu.ops.segment import segment_max, segment_mean, segment_sum

        for seed in range(4):
            x, seg, mask, S, pt = self._aligned_case(seed)
            for fn in (segment_max, segment_mean, segment_sum):
                a = fn(x, seg, S, mask=mask, indices_are_sorted=True)
                b = fn(x, seg, S, mask=mask, plan=pt)
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-5, atol=1e-5)

    def test_aligned_plan_grads_match(self):
        """The boundary-free backward (block gather + broadcast) must equal
        the generic per-row gather backward for max, sum AND mean."""
        from yolat_tpu.ops.segment import segment_max, segment_mean, segment_sum

        for seed in (3, 9):
            x, seg, mask, S, pt = self._aligned_case(seed)
            for fn in (segment_max, segment_mean, segment_sum):
                g1 = jax.grad(lambda d: (fn(d, seg, S, mask=mask,
                                            indices_are_sorted=True)
                                         ** 2).sum())(x)
                g2 = jax.grad(lambda d: (fn(d, seg, S, mask=mask,
                                            plan=pt) ** 2).sum())(x)
                np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                           rtol=1e-5, atol=1e-5)

    def test_cap_zero_rejects_unaligned(self):
        from yolat_tpu.ops.segment import pool_plan

        seg = np.array([0, 0, 0, 0, 0, 1, 1, 1], np.int32)  # straddles
        with np.testing.assert_raises(AssertionError):
            pool_plan(seg, 2, cap=0)


class TestPrecomputedCounts:
    def test_segment_mean_counts_match_mask_counts(self):
        from yolat_tpu.ops.segment import segment_mean

        rng = np.random.default_rng(0)
        N, S, C = 200, 17, 5
        seg = np.sort(rng.integers(0, S, N)).astype(np.int32)
        mask = rng.random(N) < 0.7
        x = rng.normal(size=(N, C)).astype(np.float32)
        counts = np.bincount(seg[mask], minlength=S).astype(np.float32)
        a = segment_mean(jnp.asarray(x), jnp.asarray(seg), S,
                         mask=jnp.asarray(mask), indices_are_sorted=True)
        b = segment_mean(jnp.asarray(x), jnp.asarray(seg), S,
                         mask=jnp.asarray(mask), indices_are_sorted=True,
                         counts=jnp.asarray(counts))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)

    def test_model_logits_identical_with_and_without_counts(self):
        """Pack-time dst/src/super/prop counts are a pure optimisation: the
        canonical model's outputs must be bitwise-equal with the count keys
        stripped from the batch."""
        import jax

        from yolat_tpu.data.packing import finalize_batch
        from yolat_tpu.data.toy import random_packed_batch
        from yolat_tpu.nn.model import SparseCADGCN

        n_classes = 17
        batch, _ = random_packed_batch(seed=7, n_images=2,
                                       n_classes=n_classes)
        jb = finalize_batch(jax.tree.map(jnp.asarray, batch))
        count_keys = ("dst_count", "src_count", "super_dst_count",
                      "prop_count")
        assert all(k in jb for k in count_keys)
        nb = {k: v for k, v in jb.items() if k not in count_keys}
        model = SparseCADGCN(n_classes=n_classes, sorted_edges=True)
        var = model.init(jax.random.key(0), nb, train=False)
        (la, _), = [model.apply(var, jb, train=False)]
        (lb, _), = [model.apply(var, nb, train=False)]
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-6, atol=1e-6)
