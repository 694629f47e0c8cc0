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
from yolat_tpu.ops.segment import (POOL_BLOCK, _plan_aligned, plan_of,
                                    segment_max, segment_max_concat,
                                    segment_mean, sup_plan_of)

BN_EPS = 1e-5


def _pmax_fused(cat, fusion_wsc, batch, pool, n_prop: int, interpret: bool,
                enabled: bool | None):
    """Fusion-MLP + proposal max-pool WITHOUT materialising the [N, 1024]
    MLP output (ops/pallas_kernels.folded_mlp_block_max2): the serving
    head's largest HBM round-trip (~750 us of the 3.4 ms bf16 step on
    v5e — xprof fusion.113 write + fusion.22 read). The kernel also emits
    the per-block max of `cat` itself, so the raw-cat pool no longer
    re-reads [N, 1152] through the plan block reduce. Returns the full
    pooled head input [P, H + Cin] ([fusion-pool | cat-pool], the order
    architecture3cc_rpn_gp_iter2.py:122 concatenates), or None when the
    fused route doesn't apply (no aligned pool plan / rows untiled /
    non-TPU backend)."""
    if enabled is False:
        return None
    if pool is None or not _plan_aligned(pool):
        return None
    if cat.shape[0] % 512 != 0:
        return None
    if enabled is None and not interpret and jax.default_backend() != "tpu":
        return None
    from yolat_tpu.ops.pallas_kernels import folded_mlp_block_max2

    w, sc = fusion_wsc
    maskf = batch["node_mask"].astype(jnp.float32)[:, None]
    bh, bx = folded_mlp_block_max2(cat, maskf, w, sc, block=POOL_BLOCK,
                                   interpret=interpret)
    bred = jnp.concatenate([bh, bx], axis=1)
    out = jax.ops.segment_max(bred, pool[0], num_segments=n_prop,
                              indices_are_sorted=True)
    return jnp.where(out <= -1e30 / 2, 0.0, out)


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
                          "edge_kernel", "fused_pool"))
def fast_forward(folded: dict, batch: dict, n_blocks_out: int = 2,
                 use_pallas: bool = True, interpret: bool = False,
                 bf16: bool = False, edge_kernel: bool | None = None,
                 fused_pool: bool | None = None):
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
    pool = plan_of(batch)

    cat_super = jnp.concatenate(feats_super[lo:], axis=1)
    pooled = segment_mean(cat_super, bbox_idx, n_prop, mask=node_mask,
                          indices_are_sorted=True, plan=pool,
                          counts=batch.get("prop_count"))
    fusion_super = _folded(pooled, folded["fusion_block_super"])
    out_super = jnp.concatenate([fusion_super, pooled], axis=1)

    pmax = _pmax_fused(cat, folded["fusion_block"], batch, pool, n_prop,
                       interpret, fused_pool)
    if pmax is None:
        fusion = _folded(cat, folded["fusion_block"])
        pmax = segment_max_concat((fusion, cat), bbox_idx, n_prop,
                                  mask=node_mask, indices_are_sorted=True,
                                  plan=pool)
    h = jnp.concatenate([pmax, out_super], axis=1)
    h = _folded(h, folded["pred_0"])
    h = _folded(h, folded["pred_1"])
    w2, b2 = folded["pred_2"]
    logits = (h @ w2 + b2).astype(jnp.float32)
    return logits, batch["bbox"]


# ---------------------------------------------------------------------------
# YOLaT++ folded serving engine (nn/yolat_pp.YOLaTPlusPlus eval math)
# ---------------------------------------------------------------------------

PP_ARCHS = ("yolat_pp", "yolat++", "hierarchical")
PP_GATES = ("gate_point", "gate_curve", "gate_prim", "gate_super")


def fold_params_pp(variables, n_blocks: int = 2, n_freqs: int = 4) -> dict:
    """Fold a trained YOLaTPlusPlus's variables into the inference layout.

    Same per-stage folding as fold_params; the hierarchy MLPs
    (point_pe_mlp / curve_mlp / super_edge_mlp / super_node_mlp) are all
    single Dense->BN->relu stages and the four ReZero gates come through
    as raw scalars."""
    del n_freqs  # static wiring: pass n_freqs to fast_forward_pp instead
    p = variables["params"]
    st = variables["batch_stats"]
    out = {"convs": []}

    for i in range(n_blocks):
        cp = p[f"AttrEdgeGP2_{i}"]
        cs = st[f"AttrEdgeGP2_{i}"]
        w1, sc1 = _fold_stage(cp["nn"]["dense_0"], cp["nn"]["bn_0"],
                              cs["nn"]["bn_0"])
        w2, sc2 = _fold_stage(cp["nn"]["dense_1"], cp["nn"]["bn_1"],
                              cs["nn"]["bn_1"])
        wr = np.asarray(cp["lin_r"]["kernel"])
        br = np.asarray(cp["lin_r"]["bias"])
        wn, scn = _fold_stage(cp["mlp_node"]["dense_0"],
                              cp["mlp_node"]["bn_0"],
                              cs["mlp_node"]["bn_0"])
        out["convs"].append(
            dict(w1=w1, sc1=sc1, w2=w2, sc2=sc2, wr=wr, br=br, wn=wn,
                 scn=scn)
        )

    # a checkpoint carries EITHER super_edge_mlp (per-edge clique level)
    # OR super_fact_mlp (factored v2 level, cfg.pp_factored_prim) — fold
    # whichever exists so both train routes serve through this engine
    names = ["fusion_block", "fusion_block_super", "pred_0", "pred_1",
             "point_pe_mlp", "curve_mlp", "super_node_mlp"]
    names += [n for n in ("super_edge_mlp", "super_fact_mlp") if n in p]
    for name in names:
        w, sc = _fold_stage(p[name]["dense_0"], p[name]["bn_0"],
                            st[name]["bn_0"])
        out[name] = (w, sc)
    out["pred_2"] = (
        np.asarray(p["pred_2"]["dense_0"]["kernel"]),
        np.asarray(p["pred_2"]["dense_0"]["bias"]),
    )
    out["gates"] = {g: np.asarray(p[g]) for g in PP_GATES}
    return jax.tree.map(jnp.asarray, out)


def fold_params_for(cfg, variables):
    """Arch-aware fold dispatch (canonical vs YOLaT++)."""
    if getattr(cfg, "arch", "") in PP_ARCHS:
        return fold_params_pp(variables, n_blocks=cfg.n_blocks)
    return fold_params(variables, n_blocks=cfg.n_blocks)


def extra_plans_for(cfg) -> tuple:
    """Pack-time plan families the arch's serving path can exploit
    (PackedLoader(extra_plans=...)): YOLaT++ routes its curve/prim levels
    through the ragged banded kernel when sew_/cwd_/cws_ plans ride the
    batch (ops/banded_message.py)."""
    return (("super", "curve")
            if getattr(cfg, "arch", "") in PP_ARCHS else ())


def _fourier(pos, n_freqs: int):
    freqs = 2.0 ** jnp.arange(n_freqs, dtype=pos.dtype) * jnp.pi
    ang = pos[:, :, None] * freqs[None, None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)],
                           axis=-1).reshape(pos.shape[0], -1)


@partial(jax.jit,
         static_argnames=("n_blocks_out", "interpret", "bf16",
                          "edge_kernel", "n_freqs", "fused_pool",
                          "curve_fused"))
def fast_forward_pp(folded: dict, batch: dict, n_blocks_out: int = 2,
                    interpret: bool = False, bf16: bool = False,
                    edge_kernel: bool | None = None, n_freqs: int = 4,
                    fused_pool: bool | None = None,
                    curve_fused: bool | None = None):
    """Folded-BN eval forward of YOLaTPlusPlus -> (logits, boxes).

    Mirrors nn/yolat_pp.py's eval math: canonical dual-stream convs
    (sparse dst-sorted route or the edge-window Pallas kernel) plus the
    point / curve / primitive hierarchy residuals behind their ReZero
    gates. Logits match model.apply(variables, batch, train=False) to
    float tolerance (tests/test_fast_pp.py)."""
    from yolat_tpu.ops.edge_window import edge_window_message_sum, ew_of

    node_mask = batch["node_mask"]
    bbox_idx = batch["bbox_idx"]
    n_prop = batch["labels"].shape[0]
    edge = batch["edge"]
    edge_mask = batch["edge_mask"]
    pool = plan_of(batch)
    prop_count = batch.get("prop_count")

    x = jnp.where(node_mask[:, None], batch["x"], 0.0)
    if bf16:
        folded = jax.tree.map(
            lambda v: v.astype(jnp.bfloat16)
            if hasattr(v, "dtype") and v.dtype == jnp.float32 else v,
            folded,
        )
        x = x.astype(jnp.bfloat16)

    ew = ew_of(batch)
    if ew is not None and batch.get("dst_count") is None:
        ew = None
    if edge_kernel is False or (
            edge_kernel is None and not interpret
            and jax.default_backend() != "tpu"):
        ew = None

    g = folded["gates"]
    pe_tok = _folded(_fourier(batch["pos"].astype(x.dtype), n_freqs),
                     folded["point_pe_mlp"])

    f, s = x, x
    feats, feats_super = [], []
    for i, c in enumerate(folded["convs"]):
        if ew is not None:
            agg = edge_window_message_sum(f, ew, c["w1"], c["sc1"],
                                          c["w2"], c["sc2"],
                                          interpret=interpret)
            cnt = jnp.maximum(batch["dst_count"].astype(jnp.float32), 1.0)
            f = ((agg / cnt[:, None]).astype(f.dtype)
                 + f @ c["wr"] + c["br"].reshape(1, -1))
        else:
            f = _sparse_message(f, edge, batch["e_attr"], edge_mask, c,
                                dst_count=batch.get("dst_count"))
        if i == 0:
            f = f + g["gate_point"] * pe_tok
        s = _folded(s, (c["wn"], c["scn"]))
        feats.append(f)
        feats_super.append(s)

    # the curve/prim levels' row-serialized gathers + aggregations are
    # 5.2 ms of the 8.8 ms pp step (serve_decomp 2026-08-19) — route them
    # through the ragged banded kernel when pack-time plans are present
    # (PackedLoader(extra_plans=("super", "curve")), serving paths only)
    from yolat_tpu.ops.banded_message import (banded_message_sum,
                                              banded_message_sum_both, bm_of)

    use_banded = not (edge_kernel is False or (
        edge_kernel is None and not interpret
        and jax.default_backend() != "tpu"))
    cf = feats[-1].shape[1]

    # curve level: per-edge tokens mean-scattered to both endpoints.
    # curve_in = [attr || x_src || x_dst] @ W splits by W's input rows
    # into per-endpoint projections the banded kernel gathers pre-projected
    cw, csc = folded["curve_mlp"]
    na = batch["e_attr"].shape[1]
    cwd = bm_of(batch, "cwd_") if use_banded else None
    cws = bm_of(batch, "cws_") if use_banded else None
    if cwd is not None and curve_fused is not False:
        # fused both-endpoint pass: the curve token is symmetric (the same
        # per-edge h scatters to src AND dst), so one kernel pass over the
        # dst-sorted plan computes h once and emits both endpoint sums —
        # half the plan rows + shared gather one-hots vs the two-pass
        # route below (banded_message_sum_both)
        w_attr, w_src, w_dst = cw[:na], cw[na:na + cf], cw[na + cf:]
        dst_sum, src_sum = banded_message_sum_both(
            feats[-1], cwd, w_dst, w_src, w_attr, csc, interpret=interpret)
        dcnt = jnp.maximum(batch["dst_count"], 1.0)
        scnt = jnp.maximum(batch["src_count"], 1.0)
        curve_at_node = dst_sum / dcnt[:, None] + src_sum / scnt[:, None]
    elif cwd is not None and cws is not None:
        w_attr, w_src, w_dst = cw[:na], cw[na:na + cf], cw[na + cf:]
        dst_sum = banded_message_sum(feats[-1], cwd, w_dst, w_src, w_attr,
                                     csc, interpret=interpret)
        src_sum = banded_message_sum(feats[-1], cws, w_src, w_dst, w_attr,
                                     csc, interpret=interpret)
        dcnt = jnp.maximum(batch["dst_count"], 1.0)
        scnt = jnp.maximum(batch["src_count"], 1.0)
        curve_at_node = dst_sum / dcnt[:, None] + src_sum / scnt[:, None]
    else:
        x_src = feats[-1][edge[:, 0]]
        x_dst = feats[-1].at[edge[:, 1]].get(indices_are_sorted=True)
        curve_in = jnp.concatenate(
            [batch["e_attr"].astype(x.dtype), x_src, x_dst], axis=1)
        curve_tok = _folded(curve_in, (cw, csc))
        curve_at_node = segment_mean(
            curve_tok, edge[:, 1], x.shape[0], mask=edge_mask,
            indices_are_sorted=True, counts=batch.get("dst_count"),
        ) + segment_mean(curve_tok, edge[:, 0], x.shape[0], mask=edge_mask,
                         counts=batch.get("src_count"))

    # primitive level (a): super-edge clique propagation.
    # factored (v2) route: serve a cfg.pp_factored_prim checkpoint with the
    # same prefix-sum aggregation it trained with (nn/yolat_pp.py
    # factored_prim) — no per-edge work at all, the cheapest prim level
    sew = bm_of(batch, "sew_") if use_banded else None
    if "super_fact_mlp" in folded and "sup_rank" not in batch:
        # a factored checkpoint has no super_edge_mlp — falling through to
        # the per-edge branches below would die on a KeyError; say why
        raise ValueError(
            "factored checkpoint (folded 'super_fact_mlp') requires the "
            "factored pack fields ('sup_rank'/'sup_member'/'sup_abar') in "
            "the batch: repack with the hierarchical sidecars "
            "(cli/preprocess --hierarchical + PackedLoader), or serve a "
            "non-factored checkpoint")
    if "super_fact_mlp" in folded and "sup_rank" in batch:
        from yolat_tpu.ops.segment import segment_broadcast

        s_f = feats[-1]
        member = batch["sup_member"]
        rank = batch["sup_rank"]
        sm_rows = jnp.where(member[:, None], s_f, 0).astype(jnp.float32)
        pref = jnp.cumsum(sm_rows, axis=0) - sm_rows  # exclusive
        base_n = segment_broadcast(pref[batch["prop_first_row"]], bbox_idx,
                                   s_f.shape[0], plan=pool)
        m = ((pref - base_n)
             / jnp.maximum(rank, 1.0)[:, None]).astype(s_f.dtype)
        valid = member & (rank > 0)
        prim_in = jnp.concatenate(
            [s_f, m - s_f, batch["sup_abar"].astype(x.dtype)], axis=1)
        prim_tok = _folded(prim_in, folded["super_fact_mlp"])
        prim_at_node = jnp.where(valid[:, None], prim_tok, 0)
    elif sew is not None and batch.get("super_dst_count") is not None:
        sw, ssc = folded["super_edge_mlp"]
        wa, wb, wc = sw[:cf], sw[cf:2 * cf], sw[2 * cf:]
        prim_sum = banded_message_sum(feats[-1], sew, wa - wb, wb, wc,
                                      ssc, interpret=interpret)
        prim_at_node = prim_sum / jnp.maximum(
            batch["super_dst_count"], 1.0)[:, None]
    else:
        sw, ssc = folded["super_edge_mlp"]
        es = batch["edge_super"]
        es_mask = batch["super_mask"]
        s_i = feats[-1].at[es[:, 1]].get(indices_are_sorted=True)
        s_j = feats[-1][es[:, 0]]
        prim_in = jnp.concatenate(
            [s_i, s_j - s_i, batch["e_attr_super"].astype(x.dtype)], axis=1)
        prim_tok = _folded(prim_in, (sw, ssc))
        prim_at_node = segment_mean(prim_tok, es[:, 1], x.shape[0],
                                    mask=es_mask, indices_are_sorted=True,
                                    plan=sup_plan_of(batch),
                                    counts=batch.get("super_dst_count"))

    feats[-1] = (feats[-1]
                 + g["gate_curve"] * curve_at_node.astype(x.dtype)
                 + g["gate_prim"] * prim_at_node.astype(x.dtype))

    n_blocks = len(folded["convs"])
    lo = n_blocks - n_blocks_out
    cat = jnp.concatenate(feats[lo:], axis=1)

    cat_super = jnp.concatenate(feats_super[lo:], axis=1)
    pooled_super = segment_mean(cat_super, bbox_idx, n_prop,
                                mask=node_mask, indices_are_sorted=True,
                                plan=pool, counts=prop_count)
    fusion_super = _folded(pooled_super, folded["fusion_block_super"])
    out_super = jnp.concatenate([fusion_super, pooled_super], axis=1)

    # primitive level (b): real super-node tokens
    centroid = segment_mean(batch["pos"].astype(x.dtype), bbox_idx, n_prop,
                            mask=node_mask, indices_are_sorted=True,
                            plan=pool, counts=prop_count)
    member_mean = segment_mean(feats[-1], bbox_idx, n_prop,
                               mask=node_mask, indices_are_sorted=True,
                               plan=pool, counts=prop_count)
    sup_in = jnp.concatenate(
        [_fourier(centroid, n_freqs), member_mean,
         member_mean[batch["root_slot"]]], axis=1)
    super_tok = _folded(sup_in, folded["super_node_mlp"])

    pmax = _pmax_fused(cat, folded["fusion_block"], batch, pool, n_prop,
                       interpret, fused_pool)
    if pmax is None:
        fusion = _folded(cat, folded["fusion_block"])
        pmax = segment_max_concat((fusion, cat), bbox_idx, n_prop,
                                  mask=node_mask, indices_are_sorted=True,
                                  plan=pool)
    h = jnp.concatenate([pmax, out_super], axis=1)
    h = _folded(h, folded["pred_0"])
    h = h + g["gate_super"] * super_tok
    h = _folded(h, folded["pred_1"])
    w2, b2 = folded["pred_2"]
    logits = (h @ w2 + b2).astype(jnp.float32)
    return logits, batch["bbox"]
