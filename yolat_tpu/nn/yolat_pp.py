"""YOLaT++: hierarchical primitive/curve/point detection model.

The reference repo describes YOLaT++ (TPAMI 2024) but ships no model code —
only the hierarchical graph builder (build_graph_hierarchical.py; see
geom/hierarchical.py) and the README description (README.md:55-59):
"a hierarchical structure designed for VGs, spanning three levels:
Primitive, Curve, and Point ... a position-aware enhancement strategy to
effectively differentiate similar primitives."

This implementation realises that design over the packed batch as a set of
STRICTLY ADDITIVE, ReZero-gated residuals on the canonical SparseCADGCN:
at initialisation every gate is zero and the forward pass is bitwise the
canonical model (same dims, same wiring — nn/model.py), so optimisation
starts from the proven detector and wakes each hierarchy level only as its
gate learns to open. (Two earlier variants measured worse: the ungated
hierarchy converged ~2x slower to a lower mAP, and a gated variant that
CONCATENATED the hierarchy streams — changing the fusion/head dimensions
even at gate zero — still lagged canonical 0.28 vs 0.51 mAP@0.5 at equal
epochs on the small CPU gate. Additive gating is the fix: canonical
behaviour is the exact init, hierarchy strictly residual.)

The three levels and where they inject:

  Point level      position-aware enhancement: Fourier features of the
                   proposal-normalised coordinates, MLP-encoded, added to
                   the first conv's local stream (gate_point).
  Curve level      one token per Bezier/shape edge from
                   [e_attr || x_src || x_dst], MLP-encoded, mean-scattered
                   to both endpoints, added to the last block's features
                   before fusion (gate_curve).
  Primitive level  (a) super-edge clique propagation over the packed
                   `edge_super` family (the intra-CC clique + cross-CC
                   containment edges of build_graph_bbox.py:109-160,
                   carried by the canonical batch but unused by the
                   canonical model) added alongside the curve residual
                   (gate_prim); (b) REAL super-node tokens — the packed
                   realisation of geom/hierarchical.py's getSuperNode
                   (build_graph_hierarchical.py:177-286): per-proposal
                   centroid Fourier features + member-mean aggregation
                   (super_shape member->super) + parent link via root_slot
                   (super_super parent->child) — MLP-encoded and added to
                   the 512-d head feature (gate_super).

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
from yolat_tpu.ops.banded_message import bm_of
from yolat_tpu.ops.banded_train import banded_gather, banded_scatter_own
from yolat_tpu.ops.segment import (plan_of, segment_broadcast, segment_max,
                                    segment_max_concat, segment_mean,
                                    sup_plan_of)


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
    # route the super-edge clique family through the custom-VJP banded
    # primitives when a sew_ plan rides the batch (cfg.pp_banded_super;
    # training perf — ops/banded_train.py)
    banded_super: bool = False
    # v2 primitive level (cfg.pp_factored_prim): aggregate-then-activate.
    # The clique family is lower-triangular all-pairs per proposal, so
    # mean-over-neighbours of the LINEAR part factors through a per-node
    # prefix sum — the 372k-row per-edge MLP/BN and both endpoint
    # gather/scatter pairs vanish (the prim level was 61% of the pp train
    # step, scripts/pp_train_decomp.py). DIFFERENT function family from
    # the per-edge level (GCN-style: nonlinearity after aggregation), so
    # it is quality-gated, not parity-tested, against the sparse route.
    factored_prim: bool = False
    # train-mode fused pool head (cfg.fused_head_train): closed-form BN
    # stats + VMEM-confined fusion activations (ops/fused_pool_train.py)
    fused_pool: bool = False

    @nn.compact
    def __call__(self, batch: dict, train: bool = True):
        n_prop = batch["labels"].shape[0]
        node_mask = batch["node_mask"]
        edge = batch["edge"]
        edge_mask = batch["edge_mask"]
        bbox_idx = batch["bbox_idx"]
        C = self.channels

        def gate(name):
            return self.param(name, nn.initializers.zeros, ())

        x = jnp.where(node_mask[:, None], batch["x"], 0.0)

        # ---- canonical dual-stream conv stack, with the point-level
        # position-aware enhancement as a zero-gated residual on block 0
        pe = fourier_features(batch["pos"], self.n_freqs)
        pe_tok = MLP([4 * self.n_freqs, C], act=self.act, norm=self.norm,
                     axis_name=self.axis_name, name="point_pe_mlp")(
            pe, mask=node_mask, train=train
        )

        self.sow("probe", "pe", pe_tok)

        f, s = x, x
        feats, feats_super = [], []
        for i in range(self.n_blocks):
            conv = make_conv("attr_edge_gp2", self.in_channels if i == 0 else C,
                             C, act=self.act, norm=self.norm,
                             axis_name=self.axis_name,
                             sorted_edges=self.sorted_edges)
            f, s = conv(f, s, edge, batch["e_attr"], edge_mask, node_mask,
                        train=train, nbr_idx=batch.get("nbr_idx"),
                        nbr_attr=batch.get("nbr_attr"),
                        nbr_mask=batch.get("nbr_mask"),
                        dst_count=batch.get("dst_count"))
            if i == 0:
                f = f + gate("gate_point") * pe_tok
            feats.append(f)
            feats_super.append(s)
            self.sow("probe", f"conv{i + 1}_f", f)
            self.sow("probe", f"conv{i + 1}_s", s)

        # ---- curve level: per-edge tokens scattered to endpoints ---------
        # dst gathers ride the pack contract's dst-sortedness so their
        # BACKWARD scatter-adds take XLA's sorted path (measured -2.5 ms on
        # the prim level alone, scripts/pp_prim_decomp.py `sorted_i`). The
        # src side stays a plain gather: rewriting its backward through a
        # pack-time src-sort permutation measured NEUTRAL at full-step
        # level (scripts/pp_srcperm_ab.py, PERF.md round 4 — the permute
        # gather costs what the unsorted scatter saved)
        x_src = feats[-1][edge[:, 0]]
        if self.sorted_edges:
            x_dst = feats[-1].at[edge[:, 1]].get(indices_are_sorted=True)
        else:
            x_dst = feats[-1][edge[:, 1]]
        curve_in = jnp.concatenate([batch["e_attr"], x_src, x_dst], axis=1)
        curve_tok = MLP([4 + 2 * C, C], act=self.act, norm=self.norm,
                        axis_name=self.axis_name, name="curve_mlp")(
            curve_in, mask=edge_mask, train=train)
        curve_at_node = segment_mean(
            curve_tok, edge[:, 1], x.shape[0], mask=edge_mask,
            indices_are_sorted=self.sorted_edges,
            counts=batch.get("dst_count"),
        ) + segment_mean(curve_tok, edge[:, 0], x.shape[0], mask=edge_mask,
                         counts=batch.get("src_count"))
        self.sow("probe", "curve", curve_at_node)

        # ---- primitive level (a): super-edge clique propagation ----------
        # banded TRAINING route (opt-in, cfg.pp_banded_super): the clique
        # family's gathers/scatters become custom-VJP banded one-hot MXU
        # contractions (ops/banded_train.py — measured -26% on this family
        # at bf16, PERF.md round 3) while the MLP/BN runs over the plan's
        # block layout; masked BN stats over plan rows equal stats over the
        # real edge set, so parameters stay interchangeable with the
        # sparse route (same "super_edge_mlp" name and shapes)
        bm = (bm_of(batch, "sew_") if self.banded_super else None)
        if self.factored_prim and "sup_rank" not in batch:
            # silently taking the per-edge route here would create
            # super_edge_mlp params — an architecture switch that makes the
            # param tree batch-dependent (confusing flax apply errors later)
            raise ValueError(
                "pp_factored_prim=True but the batch has no factored pack "
                "fields ('sup_rank'): pack with PackedLoader over "
                "hierarchical sidecars (cli/preprocess --hierarchical), or "
                "set pp_factored_prim=False")
        if self.factored_prim and "sup_rank" in batch:
            # ---- factored (v2) primitive level ---------------------------
            # m_i = mean of preceding member features within the proposal,
            # via one exclusive prefix sum + per-proposal rebase: the
            # cumsum runs in f32 (sums grow to ~1e4-1e5 at bench scale;
            # rebase cancellation stays ~1e-3 relative to one feature)
            s_f = feats[-1]
            member = batch["sup_member"]
            rank = batch["sup_rank"]
            sm_rows = jnp.where(member[:, None], s_f, 0).astype(jnp.float32)
            pref = jnp.cumsum(sm_rows, axis=0) - sm_rows  # exclusive
            base = pref[batch["prop_first_row"]]  # [P, C]
            base_n = segment_broadcast(base, bbox_idx, s_f.shape[0],
                                       plan=plan_of(batch))
            m = ((pref - base_n)
                 / jnp.maximum(rank, 1.0)[:, None]).astype(s_f.dtype)
            valid = member & (rank > 0)  # first member receives nothing,
            # matching the sparse route (dst is always the larger index)
            prim_in = jnp.concatenate([s_f, m - s_f, batch["sup_abar"]],
                                      axis=1)
            prim_tok = MLP([2 * C + 4, C], act=self.act, norm=self.norm,
                           axis_name=self.axis_name, name="super_fact_mlp")(
                prim_in, mask=valid, train=train)
            prim_at_node = jnp.where(valid[:, None], prim_tok, 0)
        elif bm is not None and batch.get("super_dst_count") is not None:
            interp = jax.default_backend() != "tpu"
            x_own, x_oth = banded_gather(feats[-1], bm, interp)
            x_own = x_own.astype(feats[-1].dtype)
            x_oth = x_oth.astype(feats[-1].dtype)
            na = batch["e_attr_super"].shape[1]
            attr_p = batch["sew_bm_attr"].reshape(-1, na).astype(x_own.dtype)
            rows_mask = batch["sew_bm_maskf"].reshape(-1) > 0
            prim_in = jnp.concatenate([x_own, x_oth - x_own, attr_p], axis=1)
            prim_tok = MLP([2 * C + na, C], act=self.act, norm=self.norm,
                           axis_name=self.axis_name, name="super_edge_mlp")(
                prim_in, mask=rows_mask, train=train)
            prim_sum = banded_scatter_own(prim_tok, bm, x.shape[0], interp)
            prim_at_node = (prim_sum / jnp.maximum(
                batch["super_dst_count"].astype(jnp.float32), 1.0)[:, None]
            ).astype(feats[-1].dtype)
        else:
            es = batch["edge_super"]
            es_mask = batch["super_mask"]
            sup = sup_plan_of(batch)
            if sup is not None:
                # dst runs are SUPER_BLOCK-aligned: the gather shrinks 4x
                # (block owners + in-register broadcast) and its backward
                # becomes a dense block-sum + a 4x smaller scatter — no
                # full-width scatter-add at all. Together with the sorted
                # dst gathers this measured 126.6 -> ~147 img/s bf16 on
                # the full pp train step (scripts/pp_srcperm_ab.py)
                s_i = segment_broadcast(feats[-1], es[:, 1], es.shape[0],
                                        plan=sup)
            elif self.sorted_edges:
                s_i = feats[-1].at[es[:, 1]].get(indices_are_sorted=True)
            else:
                s_i = feats[-1][es[:, 1]]
            s_j = feats[-1][es[:, 0]]
            prim_in = jnp.concatenate([s_i, s_j - s_i,
                                       batch["e_attr_super"]], axis=1)
            prim_tok = MLP([2 * C + 4, C], act=self.act, norm=self.norm,
                           axis_name=self.axis_name, name="super_edge_mlp")(
                prim_in, mask=es_mask, train=train)
            prim_at_node = segment_mean(prim_tok, es[:, 1], x.shape[0],
                                        mask=es_mask,
                                        indices_are_sorted=self.sorted_edges,
                                        plan=sup,
                                        counts=batch.get("super_dst_count"))

        # route-parity probe: the banded and sparse clique routes differ
        # only by f32 summation order, but the toy-scale train-mode BN
        # downstream amplifies reorder noise chaotically (a super-edge
        # PERMUTATION under the sparse route moves logits by 100% of
        # scale) — tests compare here, before the amplifier
        self.sow("intermediates", "prim_at_node", prim_at_node)
        self.sow("probe", "prim", prim_at_node)

        # curve + clique evidence enter the LAST block's features as
        # residuals, so the canonical fusion keeps its exact dimensions
        feats[-1] = (feats[-1]
                     + gate("gate_curve") * curve_at_node
                     + gate("gate_prim") * prim_at_node)

        # ---- canonical fusion (dims identical to nn/model.Backbone) ------
        lo = self.n_blocks - self.n_blocks_out
        pool = plan_of(batch)
        cat = jnp.concatenate(feats[lo:], axis=1)
        fusion_dims = C * self.n_blocks_out
        from yolat_tpu.ops.fused_pool_train import fused_pool_available

        use_fused = (self.fused_pool and train
                     and fused_pool_available({"pos": cat}, pool))
        if use_fused:
            from yolat_tpu.nn.layers import FusedPoolFusion

            interp = jax.default_backend() != "tpu"
            fused_pooled = jnp.concatenate([
                FusedPoolFusion(fusion_dims, 1024,
                                axis_name=self.axis_name,
                                name="fusion_block")(
                    cat, node_mask, pool[0], n_prop, interp),
                segment_max(cat, bbox_idx, n_prop, mask=node_mask,
                            indices_are_sorted=True, plan=pool,
                            ).astype(cat.dtype)], axis=1)
        else:
            fusion = MLP([fusion_dims, 1024], act=self.act, norm=self.norm,
                         axis_name=self.axis_name, name="fusion_block")(
                cat, mask=node_mask, train=train
            )
        # [fusion | cat] is pooled as PARTS (segment_max_concat): the
        # node-level [N, 1152] concat never materialises
        cat_super = jnp.concatenate(feats_super[lo:], axis=1)
        pooled_super = segment_mean(cat_super, bbox_idx, n_prop,
                                    mask=node_mask, indices_are_sorted=True,
                                    plan=pool,
                                    counts=batch.get("prop_count"))
        fusion_super = MLP([fusion_dims, 1024], act=self.act, norm=self.norm,
                           axis_name=self.axis_name, name="fusion_block_super")(
            pooled_super, mask=batch["proposal_mask"], train=train
        )
        out_super = jnp.concatenate([fusion_super, pooled_super], axis=1)
        self.sow("probe", "node_stream", out_super)

        # ---- primitive level (b): REAL super-node tokens -----------------
        # geom/hierarchical.py getSuperNode parity on the packed batch:
        #   centroid        = segment_mean(pos, bbox_idx)      [super pos]
        #   member mean     = segment_mean(node feats, bbox_idx)
        #                     [super_shape member -> super aggregation]
        #   parent link     = root_slot gather                 [super_super]
        centroid = segment_mean(batch["pos"], bbox_idx, n_prop,
                                mask=node_mask, indices_are_sorted=True,
                                plan=pool, counts=batch.get("prop_count"))
        member_mean = segment_mean(feats[-1], bbox_idx, n_prop,
                                   mask=node_mask, indices_are_sorted=True,
                                   plan=pool,
                                   counts=batch.get("prop_count"))
        sup_in = jnp.concatenate(
            [fourier_features(centroid, self.n_freqs), member_mean,
             member_mean[batch["root_slot"]]], axis=1)
        super_tok = MLP([4 * self.n_freqs + 2 * C, 512],
                        act=self.act, norm=self.norm,
                        axis_name=self.axis_name, name="super_node_mlp")(
            sup_in, mask=batch["proposal_mask"], train=train
        )
        self.sow("probe", "super_tok", super_tok)

        # ---- canonical head, super tokens as a 512-d gated residual ------
        if use_fused:
            pooled = fused_pooled
        else:
            pooled = segment_max_concat((fusion, cat), bbox_idx, n_prop,
                                        mask=node_mask,
                                        indices_are_sorted=True, plan=pool)
        self.sow("probe", "pool_head", pooled)
        h = jnp.concatenate([pooled, out_super], axis=1)
        h = MLP([(fusion_dims + 1024) * 2, 512], act=self.act, norm=self.norm,
                axis_name=self.axis_name, name="pred_0")(
            h, mask=batch["proposal_mask"], train=train
        )
        h = h + gate("gate_super") * super_tok
        h = MLP([512, 256], act=self.act, norm=self.norm, drop=self.dropout,
                axis_name=self.axis_name, name="pred_1")(
            h, mask=batch["proposal_mask"], train=train
        )
        logits = MLP([256, self.n_classes], act=None, norm=None,
                     name="pred_2")(h, train=train)
        self.sow("probe", "pred", logits)
        if self.classifier != "softmax":
            logits = jax.nn.sigmoid(logits)
        return logits, batch["bbox"]
