"""Batched fixed-shape GNN library (the reference's gcn_lib/dense mirror).

Counterparts of gcn_lib/dense/{torch_nn,torch_edge,torch_vertex}.py, which
operate on fixed [B, C, N, 1] tensors — already the right discipline for
TPU. Here the layout is [B, N, C] (feature-minor for the MXU), neighbour
indices are [B, N, K]:

  basic_conv / BasicConv      torch_nn.py:48 (Conv2d-1x1 stack == Dense)
  batched_index_select        torch_nn.py:75
  pairwise_distance/dense_knn torch_edge.py (xyz2 top-k)
  MRConv2d / EdgeConv2d       torch_vertex.py:8-35
  GraphConv2d / DynConv2d     torch_vertex.py:38-72
  Plain/Res/DenseDynBlock2d   torch_vertex.py:74-115
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolat_tpu.nn.layers import KAIMING, act_fn


class BasicConv(nn.Module):
    """Dense -> norm -> act stack over the channel axis of [B, N, C] (the
    1x1-Conv2d stack of the reference)."""

    channels: Sequence[int]
    act: Optional[str] = "relu"
    norm: Optional[str] = "batch"
    bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        for i, c in enumerate(self.channels[1:]):
            x = nn.Dense(c, use_bias=self.bias, kernel_init=KAIMING,
                         name=f"dense_{i}")(x)
            if self.norm == "batch":
                # batch norm over (B, N) positions per channel
                x = nn.BatchNorm(use_running_average=not train,
                                 axis=-1, name=f"bn_{i}")(x)
            if self.act is not None:
                x = act_fn(self.act)(x)
        return x


def batched_index_select(x, idx):
    """x [B, N, C], idx [B, M, K] -> [B, M, K, C]."""
    return jax.vmap(lambda xb, ib: xb[ib])(x, idx)


def pairwise_neg_sqdist(x):
    """[B, N, C] -> negative squared distances [B, N, N]."""
    x2 = jnp.sum(x * x, axis=-1)
    inner = jnp.einsum("bnc,bmc->bnm", x, x)
    return 2 * inner - x2[:, :, None] - x2[:, None, :]


def dense_knn(x, k: int, mask=None):
    """Batched kNN indices [B, N, K] (dense_knn_matrix, torch_edge.py:45)."""
    d = pairwise_neg_sqdist(x)
    n = x.shape[1]
    d = d - jnp.eye(n, dtype=x.dtype)[None] * 1e30
    if mask is not None:
        d = jnp.where(mask[:, None, :], d, -1e30)
    _, idx = jax.lax.top_k(d, k)
    return idx


class EdgeConv2d(nn.Module):
    """max_k MLP([x_i || x_k - x_i]) (torch_vertex.py:23-35)."""

    in_channels: int
    out_channels: int
    act: str = "relu"
    norm: Optional[str] = "batch"

    @nn.compact
    def __call__(self, x, idx, train: bool = True):
        x_k = batched_index_select(x, idx)          # [B, N, K, C]
        x_i = x[:, :, None, :]
        f = jnp.concatenate([jnp.broadcast_to(x_i, x_k.shape), x_k - x_i], axis=-1)
        h = BasicConv([self.in_channels * 2, self.out_channels], self.act,
                      self.norm, name="nn")(f, train=train)
        return h.max(axis=2)


class MRConv2d(nn.Module):
    """MLP([x || max_k(x_k - x_i)]) (torch_vertex.py:8-20)."""

    in_channels: int
    out_channels: int
    act: str = "relu"
    norm: Optional[str] = "batch"

    @nn.compact
    def __call__(self, x, idx, train: bool = True):
        x_k = batched_index_select(x, idx)
        rel = (x_k - x[:, :, None, :]).max(axis=2)
        f = jnp.concatenate([x, rel], axis=-1)
        return BasicConv([self.in_channels * 2, self.out_channels], self.act,
                         self.norm, name="nn")(f, train=train)


class GraphConv2d(nn.Module):
    """Dispatcher (torch_vertex.py:38-52)."""

    in_channels: int
    out_channels: int
    conv: str = "edge"
    act: str = "relu"
    norm: Optional[str] = "batch"

    @nn.compact
    def __call__(self, x, idx, train: bool = True):
        if self.conv == "edge":
            return EdgeConv2d(self.in_channels, self.out_channels, self.act,
                              self.norm, name="gconv")(x, idx, train=train)
        if self.conv == "mr":
            return MRConv2d(self.in_channels, self.out_channels, self.act,
                            self.norm, name="gconv")(x, idx, train=train)
        raise NotImplementedError(f"dense conv {self.conv}")


class DynConv2d(nn.Module):
    """kNN rebuilt from features each call (torch_vertex.py:55-72)."""

    in_channels: int
    out_channels: int
    kernel_size: int = 9
    dilation: int = 1
    conv: str = "edge"
    act: str = "relu"
    norm: Optional[str] = "batch"

    @nn.compact
    def __call__(self, x, mask=None, train: bool = True):
        idx = dense_knn(x, self.kernel_size * self.dilation, mask=mask)
        idx = idx[:, :, :: self.dilation]
        return GraphConv2d(self.in_channels, self.out_channels, self.conv,
                           self.act, self.norm, name="body")(x, idx, train=train)


class ResDynBlock2d(nn.Module):
    channels: int
    kernel_size: int = 9
    dilation: int = 1
    conv: str = "edge"
    res_scale: float = 1.0

    @nn.compact
    def __call__(self, x, mask=None, train: bool = True):
        return DynConv2d(self.channels, self.channels, self.kernel_size,
                         self.dilation, self.conv, name="body")(
            x, mask, train=train
        ) + x * self.res_scale


class DenseDynBlock2d(nn.Module):
    in_channels: int
    out_channels: int = 64
    kernel_size: int = 9
    dilation: int = 1
    conv: str = "edge"

    @nn.compact
    def __call__(self, x, mask=None, train: bool = True):
        out = DynConv2d(self.in_channels, self.out_channels, self.kernel_size,
                        self.dilation, self.conv, name="body")(
            x, mask, train=train
        )
        return jnp.concatenate([x, out], axis=-1)
