"""Guards for batch-norm statistic accumulation (VERDICT r3 item 7).

The pp route-parity work uncovered that train-mode BN amplifies f32
summation-order noise chaotically at toy scale (PERF.md round-3 tail), so
the one hard invariant the codebase relies on is that BN batch statistics
are ALWAYS accumulated in f32 regardless of the activation dtype. These
tests fail if a future change reintroduces bf16 stat accumulation or
low-precision running stats.

Reference counterpart: torch.nn.BatchNorm1d keeps running stats in f32
even under autocast (gcn_lib/sparse/torch_nn.py:50 uses it in every MLP).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolat_tpu.nn.layers import MaskedBatchNorm


def _apply_train(x, mask=None, momentum=0.1):
    bn = MaskedBatchNorm(features=x.shape[1], momentum=momentum)
    variables = bn.init(jax.random.key(0), x, mask, train=True)
    out, updates = bn.apply(variables, x, mask, train=True,
                            mutable=["batch_stats"])
    return out, updates["batch_stats"]


class TestBNF32Accumulation:
    def test_bf16_input_stats_match_f64_oracle(self):
        """Values near 1.0 with ~1e-3 structure: bf16 accumulation (or a
        bf16 mean) collapses the structure (bf16 has ~3 significant
        digits), so a 1e-5 agreement with the f64 oracle is only
        achievable if the stats are accumulated at f32+."""
        rng = np.random.default_rng(0)
        base = 1.0 + rng.normal(scale=1e-3, size=(4096, 32))
        x64 = base.astype(np.float64)
        x = jnp.asarray(base, jnp.bfloat16)

        _, stats = _apply_train(x)
        # oracle ON THE BF16-ROUNDED VALUES (the input rounding is allowed;
        # the ACCUMULATION must not be)
        xr = np.asarray(x, np.float64)
        mean = xr.mean(axis=0)
        var_unb = xr.var(axis=0, ddof=1)
        exp_mean = 0.1 * mean  # init running mean is 0
        exp_var = 0.9 * 1.0 + 0.1 * var_unb  # init running var is 1
        np.testing.assert_allclose(np.asarray(stats["mean"]), exp_mean,
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(stats["var"]), exp_var,
                                   rtol=1e-4)

    def test_running_stats_stay_f32(self):
        x = jnp.ones((64, 8), jnp.bfloat16)
        _, stats = _apply_train(x)
        assert stats["mean"].dtype == jnp.float32
        assert stats["var"].dtype == jnp.float32

    def test_masked_stats_ignore_padding_rows(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(256, 16)).astype(np.float32)
        mask = np.zeros(256, bool)
        mask[:100] = True
        x[100:] = 1e6  # poison the padding rows
        _, stats = _apply_train(jnp.asarray(x), jnp.asarray(mask))
        valid = x[:100].astype(np.float64)
        exp_mean = 0.1 * valid.mean(axis=0)
        np.testing.assert_allclose(np.asarray(stats["mean"]), exp_mean,
                                   rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_stat_update_permutation_stable(self, dtype):
        """Row permutation changes only the f32 summation order of the
        stat accumulation; at 20k rows the stats must agree to ~1e-5
        relative. (The chaotic amplification documented in PERF.md lives
        downstream of BN in deep train-mode compositions at toy scale —
        the stats themselves must stay order-stable.)"""
        rng = np.random.default_rng(2)
        x = rng.normal(size=(20480, 64)).astype(np.float32)
        perm = rng.permutation(len(x))
        _, s1 = _apply_train(jnp.asarray(x, dtype))
        _, s2 = _apply_train(jnp.asarray(x[perm], dtype))
        np.testing.assert_allclose(np.asarray(s1["mean"]),
                                   np.asarray(s2["mean"]),
                                   rtol=0, atol=2e-5)
        np.testing.assert_allclose(np.asarray(s1["var"]),
                                   np.asarray(s2["var"]),
                                   rtol=3e-5)
