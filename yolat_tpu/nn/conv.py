"""Graph convolution registry over padded flat edge lists.

TPU-native re-designs of the reference conv zoo
(gcn_lib/sparse/torch_vertex.py; registry GraphConv.__init__:730-763).
Instead of PyG MessagePassing object machinery, every conv is a pure
gather -> message-MLP -> masked segment-reduce composition over statically
shaped arrays; XLA fuses the elementwise stages into the matmuls.

Edge direction convention preserved from PyG: an edge row (a, b) sends a
message from source j=a to target i=b; aggregation is a masked mean over
incoming edges at the target (empty targets get 0), plus the lin_r skip.

Convs implemented (reference lines in parens):
  attr_edge_gp2     AttrRelativeEdgeConvGlobalPool2 (:288-341) — canonical;
                    message MLP([2C+4 -> C -> C], relu+BN) on
                    [x_i || x_j-x_i || e_attr], mean agg + lin_r(x), plus a
                    propagation-free node stream MLP.
  attr_edge         AttrRelativeEdgeConv via AttrEdgConv (:219-286, 560-573):
                    MLP([C+4 -> C]) on [x_j-x_i || e_attr], mean agg + lin_r.
  multilayer_edge   same with 2-layer MLP (:593-605).
  attr_edge_gp      AttrRelativeEdgeConvGlobalPool via EdgConvGlobalPool
                    (:343-425, 575-590): x carries [features || root-features];
                    message on [x_i || x_j-x_i || e_attr] over the feature
                    half; out += lin_r(x_feat) + mlp(x_root).
  attr_edge_cf      AttrEdgeConvCF (:125-216): 8 direction-conditioned MLPs
                    selected per edge by the octant of pos_j - pos_i.
  edge              WeightedRelativeEdgeConv via EdgConv (:427-484, 546-557):
                    MLP([2C -> C]) on [x_j-x_i || x_i], mean agg + lin_r.
  mr                MRConv (:97-109): max-relative aggregation then
                    MLP([2C -> C]) on [x || max_j(x_j - x_i)].
  gcn               SemiGCNConv (:699-716): symmetric-normalised propagation
                    with self-loops, then act+norm.
  gin               GinConv (:719-724): (1+eps)*x + sum_j x_j through MLP.
  sage / rsage      SAGEConv/RSAGEConv (:627-696): mean of W x_j (or
                    W (x_j - x_i)), update MLP([C_in+C_out -> C]),
                    L2-normalised.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from yolat_tpu.nn.layers import KAIMING, MLP, act_fn, maybe_remat_mlp
from yolat_tpu.ops.segment import segment_max, segment_mean, segment_sum


def _gather_ij(x, edge, sorted_dst: bool = False):
    """x_i = target features, x_j = source features for each edge row.

    sorted_dst marks the dst ids as sorted (the pack_files contract): the
    flag rides the gather primitive into its TRANSPOSE, so the backward
    scatter-add of the x_i gather also takes XLA's sorted-scatter path."""
    if sorted_dst:
        x_i = x.at[edge[:, 1]].get(indices_are_sorted=True)
    else:
        x_i = x[edge[:, 1]]
    return x_i, x[edge[:, 0]]


def _dense_mean(msg_mlp, f, nbr_mask, out_channels: int, train: bool):
    """Apply a message MLP over the dense neighbour axis and masked-mean it.

    f: [N, D, F] per-(node, neighbour-slot) message inputs. The MLP runs on
    the flattened [N*D, F] (BatchNorm batch stats over masked edge rows,
    same population as the sparse path); empty rows contribute 0 and empty
    nodes aggregate to 0 (torch_scatter convention).
    """
    N, D = f.shape[0], f.shape[1]
    msg = msg_mlp(f.reshape(N * D, -1), nbr_mask.reshape(N * D),
                  train).reshape(N, D, out_channels)
    m = nbr_mask[..., None].astype(msg.dtype)
    return (msg * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)


class AttrEdgeGP2(nn.Module):
    """Canonical conv: dual-stream attr edge conv with global-pool stream.

    Two input layouts with identical math and identical parameters:
      * sparse: flat edge list [E, 2] + segment-mean aggregation;
      * dense: per-node neighbour table nbr_idx [N, D] + masked mean over
        the D axis — the TPU-preferred layout (no scatter in the hot path;
        see data/packing.add_dense_neighbors). A checkpoint trained in one
        layout evaluates in the other.
    """

    in_channels: int
    out_channels: int
    remat: bool = False
    axis_name: Optional[str] = None
    sorted_edges: bool = False  # batch contract: edge rows dst-sorted

    @nn.compact
    def __call__(self, x, x_node, edge, e_attr, edge_mask, node_mask,
                 train: bool = True, nbr_idx=None, nbr_attr=None,
                 nbr_mask=None, dst_count=None, ew=None):
        msg_mlp = maybe_remat_mlp(self.remat)(
            [self.in_channels * 2 + 4, self.out_channels, self.out_channels],
            act="relu",
            norm="batch",
            axis_name=self.axis_name,
            name="nn",
        )
        lin_r = nn.Dense(self.out_channels, kernel_init=KAIMING, name="lin_r")

        if ew is not None:
            # window layout (train_layout='window'): the pack-time banded
            # plan turns the gathers AND their backward scatter-adds into
            # in-VMEM one-hot MXU contractions (ops/edge_window_train.py,
            # custom VJPs). Same parameters, same masked edge population
            # through the MLP/BN, same masked mean — a checkpoint moves
            # freely between layouts (tests/test_edge_window_train.py).
            from yolat_tpu.ops.edge_window_train import (
                ew_pair_features, ew_window_segment_sum_n)

            maskw = ew[3].reshape(-1) > 0
            g = ew_pair_features(x, ew)
            f = jnp.concatenate([g, ew[2].reshape(-1, 4).astype(x.dtype)],
                                axis=1)
            msg = msg_mlp(f, maskw, train)
            msgm = msg * maskw[:, None].astype(msg.dtype)
            s = ew_window_segment_sum_n(msgm, ew, x.shape[0])
            if dst_count is None:
                dst_count = ew_window_segment_sum_n(
                    ew[3].reshape(-1, 1), ew, x.shape[0])[:, 0]
            agg = (s / jnp.maximum(dst_count, 1.0)[:, None]).astype(x.dtype)
        elif nbr_idx is not None:
            x_nbr = x[nbr_idx]                        # [N, D, C]
            x_i = jnp.broadcast_to(x[:, None, :], x_nbr.shape)
            f = jnp.concatenate([x_i, x_nbr - x_i, nbr_attr], axis=-1)
            agg = _dense_mean(msg_mlp, f, nbr_mask, self.out_channels, train)
        else:
            x_i, x_j = _gather_ij(x, edge, self.sorted_edges)
            f = jnp.concatenate([x_i, x_j - x_i, e_attr], axis=1)
            msg = msg_mlp(f, edge_mask, train)
            agg = segment_mean(msg, edge[:, 1], x.shape[0], mask=edge_mask,
                               indices_are_sorted=self.sorted_edges,
                               counts=dst_count)

        out = agg + lin_r(x)
        x_node = MLP(
            [self.in_channels, self.out_channels],
            act="relu",
            norm="batch",
            axis_name=self.axis_name,
            name="mlp_node",
        )(x_node, mask=node_mask, train=train)
        return out, x_node


class AttrEdgeConv(nn.Module):
    """attr_edge / multilayer_edge: message on [x_j - x_i || e_attr]."""

    in_channels: int
    out_channels: int
    layers: int = 1  # 2 for multilayer_edge
    act: str = "relu"
    norm: Optional[str] = None
    axis_name: Optional[str] = None
    sorted_edges: bool = False

    @nn.compact
    def __call__(self, x, edge, e_attr, edge_mask, node_mask=None,
                 train: bool = True, nbr_idx=None, nbr_attr=None,
                 nbr_mask=None):
        dims = [self.in_channels + 4] + [self.out_channels] * self.layers
        mlp = MLP(dims, act=self.act, norm=self.norm,
                  axis_name=self.axis_name, name="nn")
        if nbr_idx is not None:
            f = jnp.concatenate(
                [x[nbr_idx] - x[:, None, :], nbr_attr], axis=-1
            )
            agg = _dense_mean(mlp, f, nbr_mask, self.out_channels, train)
        else:
            x_i, x_j = _gather_ij(x, edge, self.sorted_edges)
            f = jnp.concatenate([x_j - x_i, e_attr], axis=1)
            msg = mlp(f, mask=edge_mask, train=train)
            agg = segment_mean(msg, edge[:, 1], x.shape[0], mask=edge_mask,
                               indices_are_sorted=self.sorted_edges)
        return agg + nn.Dense(self.out_channels, kernel_init=KAIMING, name="lin_r")(x)


class AttrEdgeGP(nn.Module):
    """attr_edge_gp: x is [features || root-features] concatenated; the
    message uses the feature half, the root half feeds a separate MLP."""

    in_channels: int
    out_channels: int
    act: str = "relu"
    norm: Optional[str] = None
    axis_name: Optional[str] = None
    sorted_edges: bool = False

    @nn.compact
    def __call__(self, x, edge, e_attr, edge_mask, node_mask=None,
                 train: bool = True, nbr_idx=None, nbr_attr=None,
                 nbr_mask=None):
        c = self.in_channels
        x_feat, x_root = x[:, :c], x[:, c:]
        mlp = MLP([2 * c + 4, self.out_channels], act=self.act, norm=self.norm,
                  axis_name=self.axis_name, name="nn")
        if nbr_idx is not None:
            x_nbr = x_feat[nbr_idx]
            x_i = jnp.broadcast_to(x_feat[:, None, :], x_nbr.shape)
            f = jnp.concatenate([x_i, x_nbr - x_i, nbr_attr], axis=-1)
            agg = _dense_mean(mlp, f, nbr_mask, self.out_channels, train)
        else:
            x_i, x_j = _gather_ij(x_feat, edge, self.sorted_edges)
            f = jnp.concatenate([x_i, x_j - x_i, e_attr], axis=1)
            msg = mlp(f, mask=edge_mask, train=train)
            agg = segment_mean(msg, edge[:, 1], x.shape[0], mask=edge_mask,
                               indices_are_sorted=self.sorted_edges)
        out = agg + nn.Dense(self.out_channels, kernel_init=KAIMING, name="lin_r")(x_feat)
        out = out + MLP([x_root.shape[1], self.out_channels], act=self.act,
                        norm=self.norm, axis_name=self.axis_name, name="mlp")(
            x_root, mask=node_mask, train=train
        )
        return out


class AttrEdgeConvCF(nn.Module):
    """attr_edge_cf: 8 direction-conditioned message MLPs, selected per edge
    by octant(sign dx, sign dy, sign(|dx|-|dy|)). The 8 MLPs are evaluated
    batched and gathered — on TPU one [E, 8, C] select beats 8 ragged
    partitions."""

    in_channels: int
    out_channels: int
    act: str = "relu"
    norm: Optional[str] = None
    axis_name: Optional[str] = None
    sorted_edges: bool = False

    @nn.compact
    def __call__(self, x, pos, edge, e_attr, edge_mask, node_mask=None,
                 train: bool = True, nbr_idx=None, nbr_attr=None,
                 nbr_mask=None):
        dense = nbr_idx is not None
        if dense:
            N, D = nbr_idx.shape
            x_nbr = x[nbr_idx]
            x_i3 = jnp.broadcast_to(x[:, None, :], x_nbr.shape)
            diff = (pos[nbr_idx] - pos[:, None, :]).reshape(N * D, 2)
            f = jnp.concatenate([x_nbr - x_i3, nbr_attr],
                                axis=-1).reshape(N * D, -1)
            emask = nbr_mask.reshape(N * D)
        else:
            x_i, x_j = _gather_ij(x, edge, self.sorted_edges)
            p_i, p_j = _gather_ij(pos, edge, self.sorted_edges)
            diff = p_j - p_i
            f = jnp.concatenate([x_j - x_i, e_attr], axis=1)
            emask = edge_mask
        con0 = (diff[:, 0] > 0).astype(jnp.int32)
        con1 = (diff[:, 1] > 0).astype(jnp.int32)
        con2 = (jnp.abs(diff[:, 0]) - jnp.abs(diff[:, 1]) > 0).astype(jnp.int32)
        octant = con0 + con1 * 2 + con2 * 4

        branches = []
        for b in range(8):
            branches.append(
                MLP([self.in_channels + 4, self.out_channels, self.out_channels],
                    act=self.act, norm=self.norm, axis_name=self.axis_name,
                    name=f"mlp_{b}")(f, mask=emask, train=train)
            )
        stacked = jnp.stack(branches, axis=1)  # [E, 8, C]
        msg = jnp.take_along_axis(stacked, octant[:, None, None], axis=1)[:, 0]
        if dense:
            msg = msg.reshape(N, D, self.out_channels)
            m = nbr_mask[..., None].astype(msg.dtype)
            agg = (msg * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)
        else:
            agg = segment_mean(msg, edge[:, 1], x.shape[0], mask=edge_mask,
                               indices_are_sorted=self.sorted_edges)
        return agg + nn.Dense(self.out_channels, kernel_init=KAIMING, name="lin_r")(x)


class EdgeConv(nn.Module):
    """edge: weighted relative EdgeConv, message on [x_j - x_i || x_i]."""

    in_channels: int
    out_channels: int
    act: str = "relu"
    norm: Optional[str] = None
    axis_name: Optional[str] = None
    sorted_edges: bool = False

    @nn.compact
    def __call__(self, x, edge, e_attr=None, edge_mask=None, node_mask=None,
                 edge_weight=None, train: bool = True, nbr_idx=None,
                 nbr_attr=None, nbr_mask=None):
        mlp = MLP([self.in_channels * 2, self.out_channels], act=self.act,
                  norm=self.norm, axis_name=self.axis_name, name="nn")
        if nbr_idx is not None and edge_weight is None:
            x_nbr = x[nbr_idx]
            x_i = jnp.broadcast_to(x[:, None, :], x_nbr.shape)
            f = jnp.concatenate([x_nbr - x_i, x_i], axis=-1)
            agg = _dense_mean(mlp, f, nbr_mask, self.out_channels, train)
        else:
            x_i, x_j = _gather_ij(x, edge, self.sorted_edges)
            f = jnp.concatenate([x_j - x_i, x_i], axis=1)
            msg = mlp(f, mask=edge_mask, train=train)
            if edge_weight is not None:
                msg = msg * edge_weight[:, None]
            agg = segment_mean(msg, edge[:, 1], x.shape[0], mask=edge_mask,
                               indices_are_sorted=self.sorted_edges)
        return agg + nn.Dense(self.out_channels, kernel_init=KAIMING, name="lin_r")(x)


class MRConv(nn.Module):
    """mr: max-relative conv, MLP([x || max_j(x_j - x_i)])."""

    in_channels: int
    out_channels: int
    act: str = "relu"
    norm: Optional[str] = None
    axis_name: Optional[str] = None
    sorted_edges: bool = False

    @nn.compact
    def __call__(self, x, edge, e_attr=None, edge_mask=None, node_mask=None,
                 train: bool = True, nbr_idx=None, nbr_attr=None,
                 nbr_mask=None):
        if nbr_idx is not None:
            diff = x[nbr_idx] - x[:, None, :]
            m = nbr_mask[..., None]
            rel = jnp.where(m, diff, -1e30).max(axis=1)
            rel = jnp.where(rel <= -1e29, 0.0, rel)
        else:
            x_i, x_j = _gather_ij(x, edge, self.sorted_edges)
            rel = segment_max(x_j - x_i, edge[:, 1], x.shape[0], mask=edge_mask,
                              indices_are_sorted=self.sorted_edges)
        return MLP([self.in_channels * 2, self.out_channels], act=self.act,
                   norm=self.norm, axis_name=self.axis_name, name="nn")(
            jnp.concatenate([x, rel], axis=1), mask=node_mask, train=train
        )


class GCNConv(nn.Module):
    """gcn: Kipf-Welling propagation with self loops + act/norm epilogue."""

    in_channels: int
    out_channels: int
    act: str = "relu"
    norm: Optional[str] = None
    axis_name: Optional[str] = None
    sorted_edges: bool = False

    @nn.compact
    def __call__(self, x, edge, e_attr=None, edge_mask=None, node_mask=None,
                 train: bool = True):
        n = x.shape[0]
        h = nn.Dense(self.out_channels, kernel_init=KAIMING, name="lin")(x)
        ones = edge_mask.astype(x.dtype) if edge_mask is not None else jnp.ones(edge.shape[0], x.dtype)
        deg = (
            segment_sum(ones, edge[:, 1], n)
            + segment_sum(ones, edge[:, 0], n)
            + 1.0
        )
        inv_sqrt = 1.0 / jnp.sqrt(deg)
        # symmetric-normalised message both directions + self loop
        w_fwd = inv_sqrt[edge[:, 0]] * inv_sqrt[edge[:, 1]] * ones
        out = segment_sum(h[edge[:, 0]] * w_fwd[:, None], edge[:, 1], n,
                          indices_are_sorted=self.sorted_edges)
        out = out + segment_sum(h[edge[:, 1]] * w_fwd[:, None], edge[:, 0], n)
        out = out + h * (inv_sqrt * inv_sqrt)[:, None]
        out = act_fn(self.act)(out)
        if self.norm is not None and self.norm.lower() == "batch":
            from yolat_tpu.nn.layers import MaskedBatchNorm

            out = MaskedBatchNorm(self.out_channels, axis_name=self.axis_name,
                                  name="bn")(out, mask=node_mask, train=train)
        return out


class GINConv(nn.Module):
    """gin: MLP((1+eps) x + sum_j x_j)."""

    in_channels: int
    out_channels: int
    act: str = "relu"
    norm: Optional[str] = None
    axis_name: Optional[str] = None
    sorted_edges: bool = False

    @nn.compact
    def __call__(self, x, edge, e_attr=None, edge_mask=None, node_mask=None,
                 train: bool = True):
        eps = self.param("eps", nn.initializers.zeros, ())
        agg = segment_sum(x[edge[:, 0]], edge[:, 1], x.shape[0],
                          mask=edge_mask,
                          indices_are_sorted=self.sorted_edges)
        h = (1.0 + eps) * x + agg
        return MLP([self.in_channels, self.out_channels], act=self.act,
                   norm=self.norm, axis_name=self.axis_name, name="nn")(
            h, mask=node_mask, train=train
        )


class SAGEConv(nn.Module):
    """sage / rsage: mean-aggregated W x_j (or W (x_j - x_i)), update
    MLP([x || agg]), L2 normalised output."""

    in_channels: int
    out_channels: int
    relative: bool = False
    act: str = "relu"
    norm: Optional[str] = None
    axis_name: Optional[str] = None
    sorted_edges: bool = False

    @nn.compact
    def __call__(self, x, edge, e_attr=None, edge_mask=None, node_mask=None,
                 train: bool = True):
        x_i, x_j = _gather_ij(x, edge, self.sorted_edges)
        src = x_j - x_i if self.relative else x_j
        h = nn.Dense(self.out_channels, use_bias=False, kernel_init=KAIMING,
                     name="weight")(src)
        agg = segment_mean(h, edge[:, 1], x.shape[0], mask=edge_mask,
                           indices_are_sorted=self.sorted_edges)
        out = MLP([self.in_channels + self.out_channels, self.out_channels],
                  act=self.act, norm=self.norm, axis_name=self.axis_name,
                  name="nn")(jnp.concatenate([x, agg], axis=1),
                             mask=node_mask, train=train)
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        out = out + bias
        return out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)


def _registry():
    from yolat_tpu.nn.dynamic import GATConv
    from yolat_tpu.nn.gen_conv import GENConv

    return {
        "attr_edge_gp2": AttrEdgeGP2,
        "attr_edge": AttrEdgeConv,
        "multilayer_edge": AttrEdgeConv,
        "attr_edge_gp": AttrEdgeGP,
        "attr_edge_cf": AttrEdgeConvCF,
        "edge": EdgeConv,
        "mr": MRConv,
        "gcn": GCNConv,
        "gin": GINConv,
        "sage": SAGEConv,
        "rsage": SAGEConv,
        "gat": GATConv,
        "gen": GENConv,
    }


class _LazyRegistry(dict):
    def __missing__(self, key):
        self.update(_registry())
        return dict.__getitem__(self, key)

    def __contains__(self, key):
        self.update(_registry())
        return dict.__contains__(self, key)


CONV_REGISTRY = _LazyRegistry()


def make_conv(name: str, in_channels: int, out_channels: int,
              act: str = "relu", norm: Optional[str] = "batch",
              axis_name: Optional[str] = None, heads: int = 8,
              remat: bool = False, sorted_edges: bool = False, **kw):
    """Conv factory mirroring the reference GraphConv dispatcher
    (torch_vertex.py:730-763). sorted_edges promises dst-sorted edge rows
    (the pack_files contract) so dst-segment reductions take the sorted
    scatter path; leave False for ad-hoc edge lists (dynamic kNN blocks)."""
    name = name.lower()
    if name not in CONV_REGISTRY:
        raise NotImplementedError(f"conv {name} is not implemented")
    cls = CONV_REGISTRY[name]
    kwargs = dict(in_channels=in_channels, out_channels=out_channels, **kw)
    if name == "attr_edge_gp2":
        return cls(axis_name=axis_name, remat=remat,
                   sorted_edges=sorted_edges, **kwargs)
    if name == "multilayer_edge":
        kwargs["layers"] = 2
    if name == "rsage":
        kwargs["relative"] = True
    if name == "gat":
        # heads split the output width like the reference dispatcher
        # (torch_vertex.py:753: out_channels // heads per head)
        kwargs["out_channels"] = out_channels // heads
        kwargs["heads"] = heads
    if name == "gen":
        return cls(in_channels=in_channels, out_channels=out_channels,
                   axis_name=axis_name, sorted_edges=sorted_edges)
    if name != "gat":
        kwargs["sorted_edges"] = sorted_edges
    return cls(act=act, norm=norm, axis_name=axis_name, **kwargs)
