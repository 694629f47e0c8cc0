"""Folded-BatchNorm inference engine for the canonical detector.

Serving-path counterpart of SparseCADGCN.forward in eval mode: BatchNorm
running statistics and Dense biases are pre-folded into per-channel
scale/shift pairs, and the conv message pipeline runs through the fused
Pallas kernel (ops/pallas_kernels.py) on the dense neighbour layout.
Produces logits identical (to float tolerance) to
model.apply(variables, batch, train=False) — asserted in
tests/test_pallas.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from yolat_tpu.ops.pallas_kernels import (
    fused_dense_message,
    fused_dense_message_reference,
)
from yolat_tpu.ops.segment import (plan_of, segment_max,
                                    segment_max_concat, segment_mean)

BN_EPS = 1e-5


def _fold_stage(dense, bn, bn_stats):
    """(W, scale, shift) for y = relu((x @ W + b) |> BN)."""
    w = np.asarray(dense["kernel"])
    b = np.asarray(dense.get("bias", np.zeros(w.shape[1])))
    gamma = np.asarray(bn["scale"])
    beta = np.asarray(bn["bias"])
    mean = np.asarray(bn_stats["mean"])
    var = np.asarray(bn_stats["var"])
    s = gamma / np.sqrt(var + BN_EPS)
    shift = b * s + beta - mean * s
    return w, np.stack([s, shift], axis=0)


def fold_params(variables, n_blocks: int = 2) -> dict:
    """Fold a trained SparseCADGCN's variables into the inference layout."""
    p = variables["params"]
    st = variables["batch_stats"]
    out = {"convs": [], "n_blocks": n_blocks}

    for i in range(n_blocks):
        cp = p["cls_net"][f"AttrEdgeGP2_{i}"]
        cs = st["cls_net"][f"AttrEdgeGP2_{i}"]
        w1, sc1 = _fold_stage(cp["nn"]["dense_0"], cp["nn"]["bn_0"], cs["nn"]["bn_0"])
        w2, sc2 = _fold_stage(cp["nn"]["dense_1"], cp["nn"]["bn_1"], cs["nn"]["bn_1"])
        wr = np.asarray(cp["lin_r"]["kernel"])
        br = np.asarray(cp["lin_r"]["bias"])
        wn, scn = _fold_stage(cp["mlp_node"]["dense_0"], cp["mlp_node"]["bn_0"],
                              cs["mlp_node"]["bn_0"])
        out["convs"].append(
            dict(w1=w1, sc1=sc1, w2=w2, sc2=sc2, wr=wr, br=br, wn=wn, scn=scn)
        )

    for name in ("fusion_block", "fusion_block_super"):
        w, sc = _fold_stage(p["cls_net"][name]["dense_0"], p["cls_net"][name]["bn_0"],
                            st["cls_net"][name]["bn_0"])
        out[name] = (w, sc)
    for name in ("pred_0", "pred_1"):
        w, sc = _fold_stage(p[name]["dense_0"], p[name]["bn_0"], st[name]["bn_0"])
        out[name] = (w, sc)
    out["pred_2"] = (
        np.asarray(p["pred_2"]["dense_0"]["kernel"]),
        np.asarray(p["pred_2"]["dense_0"]["bias"]),
    )
    return jax.tree.map(jnp.asarray, out)


def _folded(x, w_sc):
    w, sc = w_sc
    return jnp.maximum((x @ w) * sc[0] + sc[1], 0.0)


def _sparse_message(x, edge, e_attr, edge_mask, c, dst_count=None):
    """Folded-BN canonical conv over the sparse dst-sorted edge list —
    the dense-table-free serving path (same math as AttrEdgeGP2's sparse
    branch with eval-mode BN folded into scale/shift)."""
    x_i = x.at[edge[:, 1]].get(indices_are_sorted=True)
    x_j = x[edge[:, 0]]
    f = jnp.concatenate([x_i, x_j - x_i, e_attr.astype(x.dtype)], axis=1)
    h = jnp.maximum((f @ c["w1"]) * c["sc1"][0] + c["sc1"][1], 0.0)
    h = jnp.maximum((h.astype(x.dtype) @ c["w2"]) * c["sc2"][0]
                    + c["sc2"][1], 0.0)
    agg = segment_mean(h, edge[:, 1], x.shape[0], mask=edge_mask,
                       indices_are_sorted=True, counts=dst_count)
    return agg.astype(x.dtype) + x @ c["wr"] + c["br"].reshape(1, -1)


@partial(jax.jit,
         static_argnames=("n_blocks_out", "use_pallas", "interpret", "bf16",
                          "edge_kernel"))
def fast_forward(folded: dict, batch: dict, n_blocks_out: int = 2,
                 use_pallas: bool = True, interpret: bool = False,
                 bf16: bool = False, edge_kernel: bool | None = None):
    """Eval forward on a finalized dense-layout batch -> (logits, boxes).

    bf16=True runs the jnp path with bfloat16 activations/weights (f32
    accumulation on the MXU) — the serving precision mode; logits cast back
    to f32. Detection scores tolerate bf16 comfortably (the score rewrite
    and NMS ordering are rank-stable at ~2-3 decimal digits).
    """
    x = batch["x"]
    node_mask = batch["node_mask"]
    bbox_idx = batch["bbox_idx"]
    n_prop = batch["labels"].shape[0]

    conv_params = folded["convs"]
    if bf16:
        folded = jax.tree.map(
            lambda v: v.astype(jnp.bfloat16)
            if hasattr(v, "dtype") and v.dtype == jnp.float32 else v,
            folded,
        )
        x = x.astype(jnp.bfloat16)
        if "nbr_attr" in batch:
            batch = {**batch,
                     "nbr_attr": batch["nbr_attr"].astype(jnp.bfloat16)}
        # default to the XLA path at bf16: the kernel's 0/1 expansion
        # matmuls (expand + neighbour-sum) cost ~4x the useful message
        # FLOPs at D=8, and XLA's own bf16 gather+reduce fusion measures
        # faster (193 vs 165 img/s on v5e). The kernel still supports
        # bf16 (tests/test_pallas.py) for D<=4 workloads where the
        # expansion overhead halves.

    dense_layout = "nbr_idx" in batch
    message = (
        partial(fused_dense_message, interpret=interpret, bf16=bf16)
        if use_pallas and dense_layout
        else fused_dense_message_reference
    )

    # edge-window Pallas route (ops/edge_window.py): the message gathers
    # become in-VMEM one-hot MXU contractions over a banded x window —
    # replaces the row-serialized HBM gathers that dominate the serving
    # step. Needs the pack-time window plan + in-degree counts; auto on
    # TPU (or in interpreter tests), overridable for A/B measurement.
    from yolat_tpu.ops.edge_window import edge_window_message_sum, ew_of

    ew = ew_of(batch)
    if ew is not None and batch.get("dst_count") is None:
        ew = None
    if edge_kernel is False or (
            edge_kernel is None and not interpret
            and jax.default_backend() != "tpu"):
        ew = None

    f, s = x, x
    feats, feats_super = [], []
    for i, conv in enumerate(conv_params):
        if ew is not None:
            c = folded["convs"][i]
            agg = edge_window_message_sum(f, ew, c["w1"], c["sc1"],
                                          c["w2"], c["sc2"],
                                          interpret=interpret)
            cnt = jnp.maximum(batch["dst_count"].astype(jnp.float32), 1.0)
            f = ((agg / cnt[:, None]).astype(f.dtype)
                 + f @ c["wr"] + c["br"].reshape(1, -1))
        elif dense_layout:
            c = conv if use_pallas else folded["convs"][i]
            f = message(f, batch["nbr_idx"], batch["nbr_attr"],
                        batch["nbr_mask"], c["w1"], c["sc1"], c["w2"],
                        c["sc2"], c["wr"], c["br"])
            if use_pallas and bf16:
                f = f.astype(jnp.bfloat16)
        else:
            f = _sparse_message(f, batch["edge"], batch["e_attr"],
                                batch["edge_mask"], folded["convs"][i],
                                dst_count=batch.get("dst_count"))
        s = _folded(s, (folded["convs"][i]["wn"], folded["convs"][i]["scn"]))
        feats.append(f)
        feats_super.append(s)

    n_blocks = len(folded["convs"])
    lo = n_blocks - n_blocks_out
    cat = jnp.concatenate(feats[lo:], axis=1)
    fusion = _folded(cat, folded["fusion_block"])

    cat_super = jnp.concatenate(feats_super[lo:], axis=1)
    pooled = segment_mean(cat_super, bbox_idx, n_prop, mask=node_mask,
                          indices_are_sorted=True, plan=plan_of(batch),
                          counts=batch.get("prop_count"))
    fusion_super = _folded(pooled, folded["fusion_block_super"])
    out_super = jnp.concatenate([fusion_super, pooled], axis=1)

    pmax = segment_max_concat((fusion, cat), bbox_idx, n_prop,
                              mask=node_mask, indices_are_sorted=True,
                              plan=plan_of(batch))
    h = jnp.concatenate([pmax, out_super], axis=1)
    h = _folded(h, folded["pred_0"])
    h = _folded(h, folded["pred_1"])
    w2, b2 = folded["pred_2"]
    logits = (h @ w2 + b2).astype(jnp.float32)
    return logits, batch["bbox"]
