"""YOLaT detection model: Backbone + SparseCADGCN head + loss.

Counterpart of cad_recognition/architecture3cc_rpn_gp_iter2.py, re-designed
over statically-shaped packed batches (see yolat_tpu/data/packing.py for the
batch contract):

  Backbone (:15-71): head conv (in_channels -> 64, conv 'attr_edge_gp2'
  hardcoded at :22), n_blocks-1 residual blocks (residual add disabled for
  gp2, gcn_lib/sparse/torch_vertex.py:823-827), fusion of the last
  n_blocks_out per-stream features through MLP(->1024) with the raw features
  re-concatenated; the super stream is scatter-mean'ed over bbox_idx before
  its fusion MLP.

  SparseCADGCN (:73-137): scatter-max node features per proposal, concat
  with the super-stream features, 2304 -> 512 -> 256 -> n_classes MLP chain
  (dropout on the 256 stage), softmax or sigmoid per the classifier flag.

  DetectionLoss (:358-379): cross-entropy over proposal class logits only
  (boxes come from proposal geometry, not regression), masked over padding.

The stat_feats input is carried but unused (dim_stat=0 at reference :87).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolat_tpu.nn.conv import make_conv
from yolat_tpu.nn.layers import MLP, FusedPoolFusion, maybe_remat_mlp
from yolat_tpu.ops.fused_pool_train import fused_pool_available
from yolat_tpu.ops.segment import (plan_of, segment_max,
                                    segment_max_concat, segment_mean)


class Backbone(nn.Module):
    in_channels: int = 5
    channels: int = 64
    n_blocks: int = 2
    n_blocks_out: int = 2
    conv: str = "attr_edge_gp2"
    act: str = "relu"
    norm: str = "batch"
    remat: bool = False
    axis_name: Optional[str] = None
    sorted_edges: bool = False  # pack_files batches are dst-sorted
    # train-mode fused pool head (cfg.fused_head_train): the fusion MLP's
    # BN statistics come from the closed-form Gram moments and the [N, H]
    # activations never touch HBM (ops/fused_pool_train.py); applies when
    # an aligned pool plan rides the batch, else falls back to the MLP +
    # segment_max_concat path. Checkpoint-compatible either way.
    fused_pool: bool = False

    @property
    def fusion_dims(self) -> int:
        return self.channels * self.n_blocks_out

    @nn.compact
    def __call__(self, x, edge, e_attr, edge_mask, node_mask, bbox_idx,
                 proposal_mask, n_proposals: int, train: bool = True, pos=None,
                 nbr_idx=None, nbr_attr=None, nbr_mask=None, pool_plan=None,
                 dst_count=None, prop_count=None, ew=None):
        dual = self.conv == "attr_edge_gp2"

        # convs with a dense neighbour-table branch (reverse-propagation
        # convs — gcn/gin/sage/gat/gen — would need an out-neighbour table
        # and stay on the sparse path)
        dense_capable = {"attr_edge", "multilayer_edge", "attr_edge_gp",
                         "attr_edge_cf", "edge", "mr"}
        nbr_kw = (
            dict(nbr_idx=nbr_idx, nbr_attr=nbr_attr, nbr_mask=nbr_mask)
            if nbr_idx is not None and self.conv in dense_capable
            else {}
        )

        def apply_conv(layer, f, f_super):
            if dual:
                return layer(f, f_super, edge, e_attr, edge_mask, node_mask,
                             train=train, nbr_idx=nbr_idx, nbr_attr=nbr_attr,
                             nbr_mask=nbr_mask, dst_count=dst_count, ew=ew)
            if self.conv == "attr_edge_cf":
                out = layer(f, pos, edge, e_attr, edge_mask, node_mask,
                            train=train, **nbr_kw)
            elif self.conv == "attr_edge_gp":
                # gp carries [features || root-features] through x
                # (EdgConvGlobalPool, torch_vertex.py:343-425): the root half
                # is the proposal-pooled feature gathered back to its nodes
                root = segment_mean(f, bbox_idx, n_proposals, mask=node_mask,
                                    indices_are_sorted=True, plan=pool_plan,
                                    counts=prop_count)[bbox_idx]
                out = layer(jnp.concatenate([f, root], axis=1), edge, e_attr,
                            edge_mask, node_mask, train=train, **nbr_kw)
            else:
                out = layer(f, edge, e_attr, edge_mask, node_mask, train=train,
                            **nbr_kw)
            return out, out

        f, f_super = apply_conv(
            make_conv(self.conv, self.in_channels, self.channels, act=self.act,
                      norm=self.norm, axis_name=self.axis_name,
                      remat=self.remat, sorted_edges=self.sorted_edges), x, x
        )
        feats, feats_super = [f], [f_super]
        for _ in range(self.n_blocks - 1):
            layer = make_conv(self.conv, self.channels, self.channels,
                              act=self.act, norm=self.norm,
                              axis_name=self.axis_name, remat=self.remat,
                              sorted_edges=self.sorted_edges)
            f, f_super = apply_conv(layer, feats[-1], feats_super[-1])
            if not dual:
                # ResBlock residual (torch_vertex.py:829); disabled for gp2
                f = f + feats[-1]
                f_super = f
            feats.append(f)
            feats_super.append(f_super)

        lo = self.n_blocks - self.n_blocks_out
        cat = jnp.concatenate(feats[lo:], axis=1)
        mlp_cls = maybe_remat_mlp(self.remat)
        use_fused = (self.fused_pool and train
                     and fused_pool_available({"pos": cat}, pool_plan))
        if use_fused:
            interp = jax.default_backend() != "tpu"
            pooled_fusion = FusedPoolFusion(
                self.fusion_dims, 1024, axis_name=self.axis_name,
                name="fusion_block")(cat, node_mask, pool_plan[0],
                                     n_proposals, interp)
            pooled_cat = segment_max(cat, bbox_idx, n_proposals,
                                     mask=node_mask,
                                     indices_are_sorted=True,
                                     plan=pool_plan)
            # ALREADY POOLED: [fusion-pool | cat-pool], the order
            # segment_max_concat produces on the unfused path
            out_parts = jnp.concatenate(
                [pooled_fusion, pooled_cat.astype(pooled_fusion.dtype)],
                axis=1)
        else:
            fusion = mlp_cls([self.fusion_dims, 1024], act=self.act,
                             norm=self.norm, axis_name=self.axis_name,
                             name="fusion_block")(cat, node_mask, train)
            # out_feat = [fusion | cat] is returned as PARTS: its only
            # consumer is a segment max, and per-column max commutes with
            # column concat (ops/segment.segment_max_concat) — the
            # [N, 1152] node-level concat never needs to materialise
            out_parts = (fusion, cat)
        cat_super = jnp.concatenate(feats_super[lo:], axis=1)
        pooled = segment_mean(cat_super, bbox_idx, n_proposals, mask=node_mask,
                              indices_are_sorted=True, plan=pool_plan,
                              counts=prop_count)
        fusion_super = mlp_cls([self.fusion_dims, 1024], act=self.act,
                               norm=self.norm, axis_name=self.axis_name,
                               name="fusion_block_super")(
            pooled, proposal_mask, train
        )
        out_feat_super = jnp.concatenate([fusion_super, pooled], axis=1)
        return out_parts, out_feat_super


class SparseCADGCN(nn.Module):
    n_classes: int
    in_channels: int = 5
    channels: int = 64
    n_blocks: int = 2
    n_blocks_out: int = 2
    conv: str = "attr_edge_gp2"
    act: str = "relu"
    norm: str = "batch"
    dropout: float = 0.0
    classifier: str = "softmax"
    remat: bool = False
    axis_name: Optional[str] = None
    sorted_edges: bool = False
    # 'window': conv message gathers/scatters run as banded one-hot MXU
    # contractions over the pack-time edge-window plan (custom VJPs,
    # ops/edge_window_train.py) — falls back to the sparse branch when a
    # batch carries no plan (e.g. drop_edge stripped it)
    window_edges: bool = False
    # train-mode fused pool head (see Backbone.fused_pool)
    fused_pool: bool = False

    @nn.compact
    def __call__(self, batch: dict, train: bool = True):
        """batch: packed-batch dict (data/packing.py). Returns
        (pred_cls [P, n_classes], pred_bbox [P, 4])."""
        n_proposals = batch["labels"].shape[0]
        ew = None
        if self.window_edges and self.conv == "attr_edge_gp2":
            from yolat_tpu.ops.edge_window import ew_of

            ew = ew_of(batch)
        cls_net = Backbone(
            in_channels=self.in_channels, channels=self.channels,
            n_blocks=self.n_blocks, n_blocks_out=self.n_blocks_out,
            conv=self.conv, act=self.act, norm=self.norm,
            remat=self.remat, axis_name=self.axis_name,
            sorted_edges=self.sorted_edges, fused_pool=self.fused_pool,
            name="cls_net",
        )
        out_feat_parts, out_feat_super = cls_net(
            batch["x"], batch["edge"], batch["e_attr"], batch["edge_mask"],
            batch["node_mask"], batch["bbox_idx"], batch["proposal_mask"],
            n_proposals, train=train, pos=batch.get("pos"),
            nbr_idx=batch.get("nbr_idx"), nbr_attr=batch.get("nbr_attr"),
            nbr_mask=batch.get("nbr_mask"), pool_plan=plan_of(batch),
            dst_count=batch.get("dst_count"),
            prop_count=batch.get("prop_count"), ew=ew,
        )
        if isinstance(out_feat_parts, tuple):
            pooled = segment_max_concat(out_feat_parts, batch["bbox_idx"],
                                        n_proposals, mask=batch["node_mask"],
                                        indices_are_sorted=True,
                                        plan=plan_of(batch))
        else:  # fused pool head: Backbone already pooled (static branch)
            pooled = out_feat_parts
        h = jnp.concatenate([pooled, out_feat_super], axis=1)

        fusion_out = cls_net.fusion_dims + 1024
        h = MLP([fusion_out * 2, 512], act=self.act, norm=self.norm,
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


def detection_loss(pred_cls, labels, proposal_mask, classifier: str = "softmax",
                   label_iou=None, pos_weight: float = 1.0):
    """Masked classification loss over proposals (DetectionLoss,
    architecture3cc_rpn_gp_iter2.py:358-379). Returns a dict
    {'loss', 'loss_cls'} like the reference. Logits are upcast to f32 so the
    log-softmax/NLL is stable under bf16 mixed-precision training.

    label_iou (optional, cfg.iou_aware_loss): per-proposal quality
    q = IoU(proposal box, matched GT) packed by the loader. The hard
    positive target becomes the soft pair {class: q, background: 1-q}, so
    trained confidence tracks localisation quality. Rationale (measured,
    scripts/pp_tail_probe.py): the labeler marks any proposal with
    IoU > 0.7 positive (geom/proposals.py IOU_LABEL_TH, reference parity),
    so a 0.73-IoU sibling and the exact box train toward the SAME hard
    target — nothing orders them at NMS time, and YOLaT++'s hierarchy makes
    sibling scores near-identical (6/192 GTs kept a 0.66-0.73 box over an
    available exact one at margins <3e-3 on the n32 gate). Goes beyond the
    reference (quality-focal-style soft label); off by default.

    pos_weight (cfg.pos_class_weight, round 5): multiply positive rows'
    loss by this factor. On dense sweeps positives are a sliver of the
    masked mean (chart step-20: ~0.5% of 7.2k proposals/image), so the
    trained positive confidence is starved — median TP score 0.058 with
    95 FPs outranking it (scripts/chart_fp_probe.py) — and mAP@0.5 pays
    in precision-at-rank. Weighted mean (denominator includes the
    weights) keeps the loss scale lr-compatible. 1.0 = reference-exact."""
    pred_cls = pred_cls.astype(jnp.float32)
    m = proposal_mask.astype(pred_cls.dtype)
    if pos_weight != 1.0:
        background_id = pred_cls.shape[-1] - 1
        m = m * jnp.where(labels != background_id, pos_weight, 1.0)
    denom = jnp.maximum(m.sum(), 1.0)
    k = pred_cls.shape[-1]
    background = k - 1
    onehot = jax.nn.one_hot(labels, k, dtype=pred_cls.dtype)
    if label_iou is not None:
        q = jnp.where(labels == background, 1.0,
                      label_iou.astype(pred_cls.dtype))[:, None]
        bg = jax.nn.one_hot(jnp.full_like(labels, background), k,
                            dtype=pred_cls.dtype)
        target = onehot * q + bg * (1.0 - q)
    else:
        target = onehot
    if classifier == "softmax":
        logp = jax.nn.log_softmax(pred_cls, axis=-1)
        nll = -(target * logp).sum(axis=-1)
        loss = (nll * m).sum() / denom
    else:
        p = jnp.clip(pred_cls, 1e-7, 1 - 1e-7)
        bce = -(target * jnp.log(p) + (1 - target) * jnp.log(1 - p)).mean(axis=-1)
        loss = (bce * m).sum() / denom
    return {"loss": loss, "loss_cls": loss}
