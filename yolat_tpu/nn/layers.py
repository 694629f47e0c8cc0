"""Basic layers: masked BatchNorm and the reference-shaped MLP block.

Counterparts of gcn_lib/sparse/torch_nn.py (act_layer:9, norm_layer:23,
MLP:50). Differences forced by the TPU design:

  * every element axis (nodes/edges/proposals) is padded to a static size,
    so BatchNorm computes masked batch statistics — padding must not
    contaminate the moments;
  * BatchNorm optionally syncs its moments across the data-parallel mesh
    axis (`axis_name`), the correct multi-chip semantics for
    population-level norms (the reference is single-GPU and has no story
    here, SURVEY.md section 2.5).

Weight init matches the reference model_init: Kaiming-normal (fan_in,
ReLU gain) for kernels, zeros for biases
(cad_recognition/architecture3cc_rpn_gp_iter2.py:97-104).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

KAIMING = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def act_fn(name: Optional[str]):
    if name is None or name.lower() == "none":
        return lambda x: x
    name = name.lower()
    if name == "relu":
        return nn.relu
    if name == "leakyrelu":
        return lambda x: nn.leaky_relu(x, negative_slope=0.2)
    if name == "gelu":
        return nn.gelu
    raise NotImplementedError(f"activation {name} not found")


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over a padded element axis.

    Batch statistics are computed over mask-valid rows only; running stats
    follow the torch convention (momentum = weight of the new batch stat,
    default 0.1; unbiased variance in the running estimate, biased in the
    normalisation — torch.nn.BatchNorm1d semantics, relied on by every MLP
    in the reference). With `axis_name` set, moments are psum-synced across
    the mesh axis (sync-BN).
    """

    features: int
    momentum: float = 0.1
    epsilon: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask=None, train: bool = True):
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.features, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(self.features, jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        if train:
            xf = x.astype(jnp.float32)
            if mask is not None:
                m = mask.astype(jnp.float32)[:, None]
                count = jnp.sum(m)
                total = jnp.sum(xf * m, axis=0)
                total_sq = jnp.sum(xf * xf * m, axis=0)
            else:
                count = jnp.asarray(x.shape[0], jnp.float32)
                total = jnp.sum(xf, axis=0)
                total_sq = jnp.sum(xf * xf, axis=0)
            if self.axis_name is not None:
                count = jax.lax.psum(count, self.axis_name)
                total = jax.lax.psum(total, self.axis_name)
                total_sq = jax.lax.psum(total_sq, self.axis_name)
            count = jnp.maximum(count, 1.0)
            mean = total / count
            var = jnp.maximum(total_sq / count - mean * mean, 0.0)

            if not self.is_initializing():
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        return ((x - mean) * inv + bias).astype(x.dtype)


class SumEmbedding(nn.Module):
    """Sum of per-feature embeddings — the Atom/BondEncoder pattern of the
    reference (gcn_lib/sparse/torch_nn.py:74-113, OGB molecular inputs;
    unused by the CAD path but part of the op-library surface)."""

    feature_dims: tuple
    emb_dim: int

    @nn.compact
    def __call__(self, x):
        out = 0
        for i, dim in enumerate(self.feature_dims):
            emb = nn.Embed(dim, self.emb_dim,
                           embedding_init=nn.initializers.xavier_uniform(),
                           name=f"emb_{i}")
            out = out + emb(x[:, i])
        return out


class MLP(nn.Module):
    """Dense -> [BatchNorm] -> [act] -> [dropout] chain, one stage per
    channel transition (torch_nn.MLP:50-71, incl. the `last_lin` option that
    leaves the final stage bare)."""

    channels: Sequence[int]
    act: Optional[str] = "relu"
    norm: Optional[str] = None
    bias: bool = True
    drop: float = 0.0
    last_lin: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask=None, train: bool = True):
        a = act_fn(self.act)
        n_stage = len(self.channels) - 1
        for i in range(n_stage):
            x = nn.Dense(
                self.channels[i + 1],
                use_bias=self.bias,
                kernel_init=KAIMING,
                name=f"dense_{i}",
            )(x)
            if i == n_stage - 1 and self.last_lin:
                break
            if self.norm is not None and self.norm.lower() == "batch":
                x = MaskedBatchNorm(
                    self.channels[i + 1], axis_name=self.axis_name, name=f"bn_{i}"
                )(x, mask=mask, train=train)
            elif self.norm is not None and self.norm.lower() == "layer":
                x = nn.LayerNorm(name=f"ln_{i}")(x)
            if self.act is not None and self.act.lower() != "none":
                x = a(x)
            if self.drop > 0:
                x = nn.Dropout(self.drop, deterministic=not train)(x)
        return x


def maybe_remat_mlp(remat: bool):
    """MLP class, optionally wrapped in flax lifted rematerialisation.

    static_argnums=(3,) marks `train` (self=0, x=1, mask=2, train=3); call
    sites must pass (x, mask, train) positionally. Parameter names are
    preserved, so remat on/off checkpoints are interchangeable. Used to
    trade recompute for HBM on the wide fusion/message MLPs
    (jax.checkpoint — the standard TPU memory lever).
    """
    if remat:
        return nn.remat(MLP, static_argnums=(3,))
    return MLP


class _DenseParams(nn.Module):
    """Parameter holder matching nn.Dense's tree ({kernel, bias}) without
    applying it — the fused pool head consumes raw weights."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", KAIMING, (self.in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _BNParams(nn.Module):
    """Parameter/stat holder matching MaskedBatchNorm's tree."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros(self.features, jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones(self.features, jnp.float32))
        return scale, bias, ra_mean, ra_var


class FusedPoolFusion(nn.Module):
    """TRAIN-mode fusion MLP + proposal max-pool through
    ops/fused_pool_train (closed-form BN stats via the Gram matrix, the
    [N, H] activations confined to VMEM). Parameter/stat tree is
    IDENTICAL to MLP([cin, h], norm='batch') named the same way
    (dense_0 + bn_0), so fused-on and fused-off checkpoints are
    interchangeable; running stats update with MaskedBatchNorm's exact
    convention (torch momentum 0.1, unbiased running var)."""

    in_features: int
    features: int
    momentum: float = 0.1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, cat, node_mask, blk_first, n_prop: int,
                 interpret: bool = False):
        from yolat_tpu.ops.fused_pool_train import fused_pool_train

        k, b = _DenseParams(self.in_features, self.features,
                            name="dense_0")()
        scale, bias, ra_mean, ra_var = _BNParams(self.features,
                                                 name="bn_0")()
        maskf = node_mask.astype(jnp.float32)[:, None]
        pooled, mean, var, count = fused_pool_train(
            cat, maskf, k, b, scale, bias, blk_first, n_prop, interpret,
            self.axis_name)
        if not self.is_initializing():
            unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
            ra_mean.value = ((1 - self.momentum) * ra_mean.value
                             + self.momentum * mean)
            ra_var.value = ((1 - self.momentum) * ra_var.value
                            + self.momentum * unbiased)
        return pooled
