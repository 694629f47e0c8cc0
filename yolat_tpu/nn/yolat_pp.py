"""YOLaT++: hierarchical primitive/curve/point detection model.

The reference repo describes YOLaT++ (TPAMI 2024) but ships no model code —
only the hierarchical graph builder (build_graph_hierarchical.py; see
geom/hierarchical.py) and the README description (README.md:55-59):
"a hierarchical structure designed for VGs, spanning three levels:
Primitive, Curve, and Point ... a position-aware enhancement strategy to
effectively differentiate similar primitives."

This implementation realises that design over the packed batch:

  Point level      position-aware enhancement (Fourier features of the
                   proposal-normalised coordinates) concatenated to the node
                   input, then the canonical dual-stream conv stack.
  Curve level      one token per Bezier/shape edge built from
                   [e_attr || x_src || x_dst], MLP-encoded, mean-scattered
                   to both endpoints — curve evidence flows into points.
  Primitive level  (a) super-edge propagation: one relative-attr conv pass
                   over the packed `edge_super` family — the intra-CC clique
                   + cross-CC containment edges the offline builder emits
                   (build_graph_bbox.py:109-160; carried by the canonical
                   batch but unused by the canonical model,
                   architecture3cc_rpn_gp_iter2.py:196-216) — so every point
                   sees its primitive's full-clique context; (b) REAL
                   super-node tokens, the packed realisation of
                   geom/hierarchical.py's getSuperNode
                   (build_graph_hierarchical.py:177-286): per-proposal
                   centroid Fourier features + member-mean aggregation
                   (super_shape member->super), parent links through
                   root_slot (super_super parent->child), and a
                   super->member broadcast; (c) per-proposal pooling (as
                   the canonical head) plus the root proposal's pooled
                   feature and super tokens concatenated into the head.

All three hierarchy streams enter through ReZero-style scalar gates
initialised at ZERO: optimisation starts from canonical-equivalent
behaviour (the ungated variant converged ~2x slower to a lower mAP on the
synthetic gate — VALIDATION.md) and wakes the hierarchy levels gradually.

Head and loss match the canonical SparseCADGCN so YOLaT++ drops into the
same train/eval pipeline (arch registry key 'yolat_pp').
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolat_tpu.nn.conv import make_conv
from yolat_tpu.nn.layers import MLP
from yolat_tpu.ops.segment import plan_of, segment_max, segment_mean


def fourier_features(pos, n_freqs: int = 4):
    """[N, 2] -> [N, 4*n_freqs] sin/cos features."""
    freqs = 2.0 ** jnp.arange(n_freqs) * jnp.pi
    ang = pos[:, :, None] * freqs[None, None, :]  # [N, 2, F]
    feats = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return feats.reshape(pos.shape[0], -1)


class YOLaTPlusPlus(nn.Module):
    n_classes: int
    in_channels: int = 5
    channels: int = 64
    n_blocks: int = 2
    n_blocks_out: int = 2
    n_freqs: int = 4
    act: str = "relu"
    norm: str = "batch"
    dropout: float = 0.0
    classifier: str = "softmax"
    remat: bool = False
    axis_name: Optional[str] = None
    sorted_edges: bool = False

    @nn.compact
    def __call__(self, batch: dict, train: bool = True):
        n_prop = batch["labels"].shape[0]
        node_mask = batch["node_mask"]
        edge = batch["edge"]
        edge_mask = batch["edge_mask"]
        bbox_idx = batch["bbox_idx"]

        # ---- point level: position-aware enhancement --------------------
        pe = fourier_features(batch["pos"], self.n_freqs)
        x = jnp.concatenate([batch["x"], pe], axis=1)
        x = jnp.where(node_mask[:, None], x, 0.0)
        c_in = self.in_channels + 4 * self.n_freqs

        f, s = x, x
        feats, feats_super = [], []
        for i in range(self.n_blocks):
            conv = make_conv("attr_edge_gp2", c_in if i == 0 else self.channels,
                             self.channels, act=self.act, norm=self.norm,
                             axis_name=self.axis_name,
                             sorted_edges=self.sorted_edges)
            f, s = conv(f, s, edge, batch["e_attr"], edge_mask, node_mask,
                        train=train, nbr_idx=batch.get("nbr_idx"),
                        nbr_attr=batch.get("nbr_attr"),
                        nbr_mask=batch.get("nbr_mask"))
            feats.append(f)
            feats_super.append(s)

        # ---- curve level: per-edge tokens scattered to endpoints --------
        x_src = feats[-1][edge[:, 0]]
        x_dst = feats[-1][edge[:, 1]]
        curve_in = jnp.concatenate([batch["e_attr"], x_src, x_dst], axis=1)
        curve_tok = MLP([4 + 2 * self.channels, self.channels], act=self.act,
                        norm=self.norm, axis_name=self.axis_name,
                        name="curve_mlp")(curve_in, mask=edge_mask, train=train)
        curve_at_node = segment_mean(
            curve_tok, edge[:, 1], x.shape[0], mask=edge_mask,
            indices_are_sorted=self.sorted_edges,
        ) + segment_mean(curve_tok, edge[:, 0], x.shape[0], mask=edge_mask)
        # ReZero-style gates: the hierarchy streams enter at zero weight so
        # optimisation starts from canonical-equivalent behaviour and wakes
        # the extra levels gradually (the ungated model converged ~2x
        # slower to a lower mAP on the synthetic gate)
        g_curve = self.param("gate_curve", nn.initializers.zeros, ())
        curve_at_node = curve_at_node * g_curve

        # ---- primitive level (a): super-edge clique propagation ---------
        es = batch["edge_super"]
        es_mask = batch["super_mask"]
        s_i = feats[-1][es[:, 1]]
        s_j = feats[-1][es[:, 0]]
        prim_in = jnp.concatenate([s_i, s_j - s_i, batch["e_attr_super"]],
                                  axis=1)
        prim_tok = MLP([2 * self.channels + 4, self.channels], act=self.act,
                       norm=self.norm, axis_name=self.axis_name,
                       name="super_edge_mlp")(prim_in, mask=es_mask,
                                              train=train)
        prim_at_node = segment_mean(prim_tok, es[:, 1], x.shape[0],
                                    mask=es_mask,
                                    indices_are_sorted=self.sorted_edges)
        g_prim = self.param("gate_prim", nn.initializers.zeros, ())
        prim_at_node = prim_at_node * g_prim

        # ---- primitive level (b): REAL super-node tokens ----------------
        # The hierarchical builder (geom/hierarchical.py, mirroring
        # build_graph_hierarchical.py:getSuperNode:177-286) materialises one
        # super node per component: centroid position, member-mean features,
        # super_shape (super <-> member) edges and super_super
        # (parent -> direct child) links. On the packed proposal batch those
        # map exactly to static index structures already present:
        #   centroid      = segment_mean(pos, bbox_idx)       [super pos]
        #   member mean   = segment_mean(node feats, bbox_idx) [super_shape
        #                   member -> super aggregation]
        #   parent link   = root_slot gather                   [super_super]
        #   super -> member broadcast = token[bbox_idx]
        pool = plan_of(batch)
        centroid = segment_mean(batch["pos"], bbox_idx, n_prop,
                                mask=node_mask, indices_are_sorted=True,
                                plan=pool)
        member_mean = segment_mean(feats[-1], bbox_idx, n_prop,
                                   mask=node_mask, indices_are_sorted=True,
                                   plan=pool)
        sup_in = jnp.concatenate(
            [fourier_features(centroid, self.n_freqs), member_mean,
             member_mean[batch["root_slot"]]], axis=1)
        super_tok = MLP([4 * self.n_freqs + 2 * self.channels, self.channels],
                        act=self.act, norm=self.norm,
                        axis_name=self.axis_name, name="super_node_mlp")(
            sup_in, mask=batch["proposal_mask"], train=train
        )
        g_sup = self.param("gate_super", nn.initializers.zeros, ())
        super_tok = super_tok * g_sup
        sup_at_node = super_tok[bbox_idx]  # super -> member broadcast

        lo = self.n_blocks - self.n_blocks_out
        cat = jnp.concatenate(
            feats[lo:] + [curve_at_node, prim_at_node, sup_at_node], axis=1)
        fusion_dims = self.channels * self.n_blocks_out + 3 * self.channels
        fusion = MLP([fusion_dims, 1024], act=self.act, norm=self.norm,
                     axis_name=self.axis_name, name="fusion_block")(
            cat, mask=node_mask, train=train
        )
        out_feat = jnp.concatenate([fusion, cat], axis=1)

        cat_super = jnp.concatenate(feats_super[lo:], axis=1)
        pooled_super = segment_mean(cat_super, bbox_idx, n_prop,
                                    mask=node_mask, indices_are_sorted=True,
                                    plan=pool)
        fusion_super = MLP([self.channels * self.n_blocks_out, 1024],
                           act=self.act, norm=self.norm,
                           axis_name=self.axis_name, name="fusion_block_super")(
            pooled_super, mask=batch["proposal_mask"], train=train
        )
        out_super = jnp.concatenate([fusion_super, pooled_super], axis=1)

        # ---- primitive level: per-proposal pooling + CC-root context ----
        pooled = segment_max(out_feat, bbox_idx, n_prop, mask=node_mask,
                             indices_are_sorted=True)
        # parent context: pooled root features plus the proposal's own super
        # token and its parent's (the super_super parent -> child message)
        primitive_ctx = jnp.concatenate(
            [pooled[batch["root_slot"]], super_tok,
             super_tok[batch["root_slot"]]], axis=1)
        prim = MLP([pooled.shape[1] + 2 * self.channels, 256], act=self.act,
                   norm=self.norm, axis_name=self.axis_name,
                   name="primitive_mlp")(
            primitive_ctx, mask=batch["proposal_mask"], train=train
        )

        h = jnp.concatenate([pooled, out_super, prim], axis=1)
        h = MLP([h.shape[1], 512], act=self.act, norm=self.norm,
                axis_name=self.axis_name, name="pred_0")(
            h, mask=batch["proposal_mask"], train=train
        )
        h = MLP([512, 256], act=self.act, norm=self.norm, drop=self.dropout,
                axis_name=self.axis_name, name="pred_1")(
            h, mask=batch["proposal_mask"], train=train
        )
        logits = MLP([256, self.n_classes], act=None, norm=None,
                     name="pred_2")(h, train=train)
        if self.classifier != "softmax":
            logits = jax.nn.sigmoid(logits)
        return logits, batch["bbox"]
