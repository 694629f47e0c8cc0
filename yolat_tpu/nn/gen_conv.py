"""Generalized aggregation conv (DeeperGCN) + message normalisation.

Counterpart of gcn_lib/sparse/torch_message.py (GenMessagePassing:8-85,
MsgNorm:88-99) and the GENConv wrapper (torch_vertex.py:16-94): softmax /
softmax_sum / power / power_sum aggregations with learnable temperature t,
power p and scale y, implemented over masked padded edge lists with
segment_softmax (the torch_scatter.scatter_softmax replacement).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from yolat_tpu.nn.layers import MLP
from yolat_tpu.ops.segment import segment_mean, segment_softmax, segment_sum


class GenAggregation(nn.Module):
    """softmax[_sum] / power[_sum] segment aggregation with learnable
    t / p / y parameters (torch_message.py:8-85)."""

    aggr: str = "softmax"
    t: float = 1.0
    p: float = 1.0
    y: float = 0.0
    learn_t: bool = False
    learn_p: bool = False
    learn_y: bool = False
    sorted_edges: bool = False

    @nn.compact
    def __call__(self, msg, seg, num_segments: int, mask=None):
        if self.aggr in ("softmax", "softmax_sg", "softmax_sum"):
            t = (
                self.param("t", lambda k: jnp.asarray(self.t))
                if self.learn_t
                else self.t
            )
            w = segment_softmax(msg * t, seg, num_segments, mask=mask,
                                indices_are_sorted=self.sorted_edges)
            out = segment_sum(msg * w, seg, num_segments, mask=mask,
                              indices_are_sorted=self.sorted_edges)
            if self.aggr == "softmax_sum":
                y = (
                    self.param("y", lambda k: jnp.asarray(self.y))
                    if self.learn_y
                    else self.y
                )
                ones = jnp.ones(msg.shape[0], msg.dtype)
                deg = segment_sum(ones, seg, num_segments, mask=mask)
                out = out * jnp.power(jnp.maximum(deg, 1.0), jnp.asarray(y))[:, None]
            return out
        if self.aggr in ("power", "power_sum"):
            p = (
                self.param("p", lambda k: jnp.asarray(self.p))
                if self.learn_p
                else self.p
            )
            lo, hi = 1e-7, 1e1
            clamped = jnp.clip(msg, lo, hi)
            out = segment_mean(jnp.power(clamped, p), seg, num_segments, mask=mask)
            out = jnp.power(jnp.clip(out, lo, hi), 1.0 / p)
            if self.aggr == "power_sum":
                y = (
                    self.param("y", lambda k: jnp.asarray(self.y))
                    if self.learn_y
                    else self.y
                )
                ones = jnp.ones(msg.shape[0], msg.dtype)
                deg = segment_sum(ones, seg, num_segments, mask=mask)
                out = out * jnp.power(jnp.maximum(deg, 1.0), jnp.asarray(y))[:, None]
            return out
        raise NotImplementedError(f"aggregation {self.aggr}")


class MsgNorm(nn.Module):
    """Message normalisation (torch_message.py:88-99): rescale the
    aggregated message to the feature norm with a (learnable) scale."""

    learn_scale: bool = False

    @nn.compact
    def __call__(self, x, msg):
        s = (
            self.param("scale", nn.initializers.ones, (1,))
            if self.learn_scale
            else 1.0
        )
        msg = msg / jnp.maximum(jnp.linalg.norm(msg, axis=-1, keepdims=True), 1e-12)
        return msg * jnp.linalg.norm(x, axis=-1, keepdims=True) * s


class GENConv(nn.Module):
    """GENConv (torch_vertex.py:16-94): message = relu(x_j [+ e_attr]) + eps,
    generalized aggregation, optional MsgNorm, update MLP on [x || m]."""

    in_channels: int
    out_channels: int
    aggr: str = "softmax"
    learn_t: bool = True
    learn_p: bool = False
    msg_norm: bool = False
    mlp_layers: int = 1
    eps: float = 1e-7
    axis_name: Optional[str] = None
    sorted_edges: bool = False

    @nn.compact
    def __call__(self, x, edge, e_attr=None, edge_mask=None, node_mask=None,
                 train: bool = True):
        x_j = x[edge[:, 0]]
        if e_attr is not None and e_attr.shape[-1] == x.shape[-1]:
            x_j = x_j + e_attr
        msg = jnp.maximum(x_j, 0.0) + self.eps
        agg = GenAggregation(aggr=self.aggr, learn_t=self.learn_t,
                             learn_p=self.learn_p,
                             sorted_edges=self.sorted_edges, name="aggr")(
            msg, edge[:, 1], x.shape[0], mask=edge_mask
        )
        if self.msg_norm:
            agg = MsgNorm(learn_scale=True, name="msg_norm")(x, agg)
        h = x + agg
        dims = [self.in_channels] + [self.out_channels] * max(self.mlp_layers, 1)
        return MLP(dims, act="relu", norm=None, axis_name=self.axis_name,
                   name="mlp")(h, mask=node_mask, train=train)
