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
