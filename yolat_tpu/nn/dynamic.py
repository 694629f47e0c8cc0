"""Dynamic-graph convolutions and composition blocks.

Counterparts of the reference's kNN-rebuilt graph machinery:
  DilatedKnn    gcn_lib/sparse/torch_edge.py:32-50 (kNN + dilated/stochastic
                edge subsampling)
  DynConv       torch_vertex.py:778-791 (rebuild the kNN graph, then conv)
  PlainDynBlock torch_vertex.py:794-806
  ResDynBlock   torch_vertex.py:859-871
  DenseDynBlock torch_vertex.py:874-885
  ResGraphBlock / DenseGraphBlock torch_vertex.py:888-911
  GATConv       torch_vertex.py:608-624 (attention conv + act/norm epilogue)

The kNN itself is ops/knn.knn_graph (dense top-k on the MXU). Everything is
masked/static-shape; the stochastic-dilation epsilon trick needs an rng key
at call time (training only).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolat_tpu.nn.conv import make_conv
from yolat_tpu.nn.layers import KAIMING, MaskedBatchNorm, act_fn
from yolat_tpu.ops.knn import dilated, knn_graph
from yolat_tpu.ops.segment import segment_softmax


class GATConv(nn.Module):
    """Multi-head graph attention + act/norm epilogue."""

    in_channels: int
    out_channels: int  # per-head
    heads: int = 8
    act: str = "relu"
    norm: Optional[str] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, edge, e_attr=None, edge_mask=None, node_mask=None,
                 train: bool = True):
        h = nn.Dense(self.out_channels * self.heads, use_bias=False,
                     kernel_init=KAIMING, name="lin")(x)
        h = h.reshape(x.shape[0], self.heads, self.out_channels)
        a_src = self.param("a_src", KAIMING, (1, self.heads, self.out_channels))
        a_dst = self.param("a_dst", KAIMING, (1, self.heads, self.out_channels))
        alpha_src = (h * a_src).sum(-1)  # [N, H]
        alpha_dst = (h * a_dst).sum(-1)

        src, dst = edge[:, 0], edge[:, 1]
        logits = nn.leaky_relu(alpha_src[src] + alpha_dst[dst], negative_slope=0.2)
        attn = segment_softmax(logits, dst, x.shape[0], mask=edge_mask)  # [E, H]
        msg = h[src] * attn[:, :, None]
        if edge_mask is not None:
            msg = jnp.where(edge_mask[:, None, None], msg, 0.0)
        out = jax.ops.segment_sum(
            msg.reshape(len(src), -1), dst, num_segments=x.shape[0]
        )
        bias = self.param("bias", nn.initializers.zeros,
                          (self.heads * self.out_channels,))
        out = out + bias
        out = act_fn(self.act)(out)
        if self.norm is not None and self.norm.lower() == "batch":
            out = MaskedBatchNorm(self.heads * self.out_channels,
                                  axis_name=self.axis_name, name="bn")(
                out, mask=node_mask, train=train
            )
        return out


class DynConv(nn.Module):
    """Rebuild a kNN graph from the features each call, then apply a conv
    from the registry."""

    in_channels: int
    out_channels: int
    kernel_size: int = 9
    dilation: int = 1
    conv: str = "edge"
    act: str = "relu"
    norm: Optional[str] = None
    stochastic: bool = False
    epsilon: float = 0.2
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, node_mask=None, train: bool = True, rng=None):
        edge_index, edge_mask = knn_graph(
            x, self.kernel_size * self.dilation, mask=node_mask
        )
        edge_index, edge_mask = dilated(
            edge_index, edge_mask, self.kernel_size, self.dilation,
            stochastic=self.stochastic and train, epsilon=self.epsilon, key=rng,
        )
        edge = edge_index.T  # [E, 2] (src, dst)
        # knn_graph emits dst = repeat(arange(n), k) and dilated() keeps
        # per-centre grouping, so the edge list is dst-sorted by construction
        body = make_conv(self.conv, self.in_channels, self.out_channels,
                         act=self.act, norm=self.norm,
                         axis_name=self.axis_name, sorted_edges=True)
        return body(x, edge, None, edge_mask, node_mask, train=train)


class PlainDynBlock(nn.Module):
    channels: int
    kernel_size: int = 9
    dilation: int = 1
    conv: str = "edge"
    act: str = "relu"
    norm: Optional[str] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, node_mask=None, train: bool = True, rng=None):
        return DynConv(self.channels, self.channels, self.kernel_size,
                       self.dilation, self.conv, self.act, self.norm,
                       axis_name=self.axis_name, name="body")(
            x, node_mask, train=train, rng=rng
        )


class ResDynBlock(nn.Module):
    channels: int
    kernel_size: int = 9
    dilation: int = 1
    conv: str = "edge"
    act: str = "relu"
    norm: Optional[str] = None
    res_scale: float = 1.0
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, node_mask=None, train: bool = True, rng=None):
        out = DynConv(self.channels, self.channels, self.kernel_size,
                      self.dilation, self.conv, self.act, self.norm,
                      axis_name=self.axis_name, name="body")(
            x, node_mask, train=train, rng=rng
        )
        return out + x * self.res_scale


class DenseDynBlock(nn.Module):
    in_channels: int
    out_channels: int = 64
    kernel_size: int = 9
    dilation: int = 1
    conv: str = "edge"
    act: str = "relu"
    norm: Optional[str] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, node_mask=None, train: bool = True, rng=None):
        out = DynConv(self.in_channels, self.out_channels, self.kernel_size,
                      self.dilation, self.conv, self.act, self.norm,
                      axis_name=self.axis_name, name="body")(
            x, node_mask, train=train, rng=rng
        )
        return jnp.concatenate([x, out], axis=1)


class ResGraphBlock(nn.Module):
    channels: int
    conv: str = "edge"
    act: str = "relu"
    norm: Optional[str] = None
    res_scale: float = 1.0
    axis_name: Optional[str] = None
    sorted_edges: bool = False

    @nn.compact
    def __call__(self, x, edge, e_attr=None, edge_mask=None, node_mask=None,
                 train: bool = True):
        body = make_conv(self.conv, self.channels, self.channels, act=self.act,
                         norm=self.norm, axis_name=self.axis_name,
                         sorted_edges=self.sorted_edges)
        return body(x, edge, e_attr, edge_mask, node_mask, train=train) \
            + x * self.res_scale


class DenseGraphBlock(nn.Module):
    in_channels: int
    out_channels: int
    conv: str = "edge"
    act: str = "relu"
    norm: Optional[str] = None
    axis_name: Optional[str] = None
    sorted_edges: bool = False  # caller-supplied edges: opt in explicitly

    @nn.compact
    def __call__(self, x, edge, e_attr=None, edge_mask=None, node_mask=None,
                 train: bool = True):
        body = make_conv(self.conv, self.in_channels, self.out_channels,
                         act=self.act, norm=self.norm,
                         axis_name=self.axis_name,
                         sorted_edges=self.sorted_edges)
        out = body(x, edge, e_attr, edge_mask, node_mask, train=train)
        return jnp.concatenate([x, out], axis=1)


class ResBlockMultiEdge(nn.Module):
    """ResBlockMultiEdge (torch_vertex.py:831-857): one residual conv per
    edge FAMILY (e.g. shape / super / control), features max-pooled across
    the family axis — the reference's multi-relation composition block."""

    channels: int
    conv: str = "edge"
    n_edges: int = 3
    act: str = "relu"
    norm: Optional[str] = None
    res_scale: float = 1.0
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, edges, e_attrs=None, edge_masks=None,
                 node_mask=None, train: bool = True):
        """edges: sequence of [E_i, 2]; e_attrs/edge_masks: matching
        sequences (or None)."""
        feats = []
        for i in range(self.n_edges):
            body = make_conv(self.conv, self.channels, self.channels,
                             act=self.act, norm=self.norm,
                             axis_name=self.axis_name)
            out = body(
                x, edges[i],
                None if e_attrs is None else e_attrs[i],
                None if edge_masks is None else edge_masks[i],
                node_mask, train=train,
            )
            feats.append(out + x * self.res_scale)
        return jnp.stack(feats, axis=-1).max(axis=-1)
