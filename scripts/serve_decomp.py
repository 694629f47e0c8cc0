"""Differential per-op-group decomposition of the bf16 serving step.

xprof through the axon tunnel is session-flaky (PERF.md 2026-08-19), so
this applies the scan-chain methodology bench.py already trusts to CUMULATIVE
PREFIXES of the serving pipeline: prefix k computes op-groups 1..k and
consumes every live intermediate into the scan carry (no DCE); adjacent
prefix deltas attribute the step time per group. Deltas are approximate
(prefix programs fuse slightly differently than the full program), but they
sum to the full step by construction — the closure row reports the gap.

Reference counterpart: the torch.cuda.synchronize timing discipline of
cad_recognition/detect.py:264-269, applied per op-group instead of per image.

Usage: python scripts/serve_decomp.py [--arch yolat_pp] [--iters N]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="centernet3cc_rpn_gp_iter2", type=str)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--no_bf16", action="store_true")
    args = ap.parse_args()
    bf16 = not args.no_bf16

    import jax
    import jax.numpy as jnp

    from bench import build_workload
    from yolat_tpu.data.packing import finalize_batch
    from yolat_tpu.eval.fast_forward import (
        _folded, _pmax_fused, _sparse_message, _fourier, extra_plans_for,
        fold_params_for)
    from yolat_tpu.ops.banded_message import banded_message_sum, bm_of
    from yolat_tpu.eval.predict import make_predict_core
    from yolat_tpu.ops.edge_window import edge_window_message_sum, ew_of
    from yolat_tpu.ops.iou import inflate_boxes
    from yolat_tpu.ops.segment import (plan_of, segment_max_concat,
                                       segment_mean, sup_plan_of)
    from yolat_tpu.train.config import Config
    from yolat_tpu.train.loop import create_state
    from yolat_tpu.train.optim import make_optimizer

    cfg0 = Config(n_classes=17, arch=args.arch)
    ds, batches, _ = build_workload(extra_plans=extra_plans_for(cfg0))
    cfg = Config(n_classes=ds.n_classes, arch=args.arch)
    tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
    single = {k: v[0] for k, v in batches[0].items()}
    state = create_state(cfg, tx, single, jax.random.key(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    folded0 = fold_params_for(cfg, variables)
    is_pp = args.arch in ("yolat_pp", "yolat++", "hierarchical")
    n_img = int(single["n_images"])
    background = cfg.n_classes - 1

    sb = {k: jnp.asarray(v) for k, v in single.items()}

    def cast16(t):
        return jax.tree.map(
            lambda v: v.astype(jnp.bfloat16)
            if hasattr(v, "dtype") and v.dtype == jnp.float32 else v, t)

    # ---- the pipeline as resumable op-groups ------------------------------
    # Each group fn(st) mutates a state dict and returns tensors to consume.
    # Group order mirrors fast_forward / fast_forward_pp exactly.

    def partial_forward(folded, batch, upto: str, groups):
        st = {"batch": batch, "folded": folded, "live": []}
        x = batch["x"]
        if bf16:
            st["folded"] = cast16(folded)
            x = x.astype(jnp.bfloat16)
        if is_pp:
            x = jnp.where(batch["node_mask"][:, None], x, 0.0)
        st["x"] = x
        st["f"] = x
        st["s"] = x
        st["feats"] = []
        st["feats_super"] = []
        st["pool"] = plan_of(batch)
        st["ew"] = ew_of(batch)
        for name, fn in groups:
            fn(st)
            if name == upto:
                break
        # consume EVERY tensor later groups would read, not just the last
        # group's outputs — else XLA DCEs earlier groups out of the prefix
        # (observed: the node_stream prefix measured BELOW the conv2 prefix
        # because consuming only out_super dropped the conv layers)
        live = list(st["feats"]) + list(st["feats_super"]) + list(st["live"])
        for key in ("out_super", "curve_at_node", "prim_at_node",
                    "super_tok", "pmax", "logits"):
            if key in st:
                live.append(st[key])
        acc = jnp.float32(0.0)
        for t in live:
            acc = acc + t.astype(jnp.float32).sum()
        return acc

    def conv_layer(i):
        def fn(st):
            b, c = st["batch"], st["folded"]["convs"][i]
            f = st["f"]
            if st["ew"] is not None:
                agg = edge_window_message_sum(f, st["ew"], c["w1"], c["sc1"],
                                              c["w2"], c["sc2"])
                cnt = jnp.maximum(b["dst_count"].astype(jnp.float32), 1.0)
                f = ((agg / cnt[:, None]).astype(f.dtype)
                     + f @ c["wr"] + c["br"].reshape(1, -1))
            else:
                f = _sparse_message(f, b["edge"], b["e_attr"], b["edge_mask"],
                                    c, dst_count=b.get("dst_count"))
            st["f"] = f
            st["feats"].append(f)
            st["live"] = [f]
        return fn

    def pe_gate(st):  # pp only, applied after conv 0
        b, fd = st["batch"], st["folded"]
        pe_tok = _folded(_fourier(b["pos"].astype(st["x"].dtype), 4),
                         fd["point_pe_mlp"])
        st["f"] = st["f"] + fd["gates"]["gate_point"] * pe_tok
        st["feats"][-1] = st["f"]
        st["live"] = [st["f"]]

    def node_stream(st):
        b, fd = st["batch"], st["folded"]
        for i in range(len(fd["convs"])):
            st["s"] = _folded(st["s"], (fd["convs"][i]["wn"],
                                        fd["convs"][i]["scn"]))
            st["feats_super"].append(st["s"])
        n_prop = b["labels"].shape[0]
        cat_super = jnp.concatenate(st["feats_super"][-cfg.n_blocks_out:],
                                    axis=1)
        pooled = segment_mean(cat_super, b["bbox_idx"], n_prop,
                              mask=b["node_mask"], indices_are_sorted=True,
                              plan=st["pool"], counts=b.get("prop_count"))
        st["out_super"] = jnp.concatenate(
            [_folded(pooled, fd["fusion_block_super"]), pooled], axis=1)
        st["live"] = [st["out_super"]]

    def curve_level(st):  # pp (banded route when cwd_/cws_ plans ride)
        b, fd, x = st["batch"], st["folded"], st["x"]
        edge, em = b["edge"], b["edge_mask"]
        last = st["feats"][-1]
        cw, csc = fd["curve_mlp"]
        cwd, cws = bm_of(b, "cwd_"), bm_of(b, "cws_")
        if cwd is not None and cws is not None:
            cf = last.shape[1]
            na = b["e_attr"].shape[1]
            w_attr, w_src, w_dst = cw[:na], cw[na:na + cf], cw[na + cf:]
            ds_ = banded_message_sum(last, cwd, w_dst, w_src, w_attr, csc)
            ss_ = banded_message_sum(last, cws, w_src, w_dst, w_attr, csc)
            can = (ds_ / jnp.maximum(b["dst_count"], 1.0)[:, None]
                   + ss_ / jnp.maximum(b["src_count"], 1.0)[:, None])
        else:
            x_src = last[edge[:, 0]]
            x_dst = last.at[edge[:, 1]].get(indices_are_sorted=True)
            curve_in = jnp.concatenate(
                [b["e_attr"].astype(x.dtype), x_src, x_dst], axis=1)
            curve_tok = _folded(curve_in, (cw, csc))
            can = segment_mean(curve_tok, edge[:, 1], x.shape[0], mask=em,
                               indices_are_sorted=True,
                               counts=b.get("dst_count")) \
                + segment_mean(curve_tok, edge[:, 0], x.shape[0], mask=em,
                               counts=b.get("src_count"))
        st["curve_at_node"] = can
        st["live"] = [can]

    def prim_level(st):  # pp (banded route when the sew_ plan rides)
        b, fd, x = st["batch"], st["folded"], st["x"]
        es, esm = b["edge_super"], b["super_mask"]
        last = st["feats"][-1]
        sw, ssc = fd["super_edge_mlp"]
        sew = bm_of(b, "sew_")
        if sew is not None:
            cf = last.shape[1]
            wa, wb, wc = sw[:cf], sw[cf:2 * cf], sw[2 * cf:]
            ps = banded_message_sum(last, sew, wa - wb, wb, wc, ssc)
            pan = ps / jnp.maximum(b["super_dst_count"], 1.0)[:, None]
        else:
            s_i = last.at[es[:, 1]].get(indices_are_sorted=True)
            s_j = last[es[:, 0]]
            prim_in = jnp.concatenate(
                [s_i, s_j - s_i, b["e_attr_super"].astype(x.dtype)], axis=1)
            prim_tok = _folded(prim_in, (sw, ssc))
            pan = segment_mean(prim_tok, es[:, 1], x.shape[0], mask=esm,
                               indices_are_sorted=True, plan=sup_plan_of(b),
                               counts=b.get("super_dst_count"))
        st["prim_at_node"] = pan
        st["live"] = [pan]

    def pp_residuals(st):  # fold curve/prim into feats[-1] (cheap adds)
        g = st["folded"]["gates"]
        st["feats"][-1] = (st["feats"][-1]
                           + g["gate_curve"]
                           * st["curve_at_node"].astype(st["x"].dtype)
                           + g["gate_prim"]
                           * st["prim_at_node"].astype(st["x"].dtype))
        st["live"] = [st["feats"][-1]]

    def super_tokens(st):  # pp
        b, fd, x = st["batch"], st["folded"], st["x"]
        n_prop = b["labels"].shape[0]
        centroid = segment_mean(b["pos"].astype(x.dtype), b["bbox_idx"],
                                n_prop, mask=b["node_mask"],
                                indices_are_sorted=True, plan=st["pool"],
                                counts=b.get("prop_count"))
        member_mean = segment_mean(st["feats"][-1], b["bbox_idx"], n_prop,
                                   mask=b["node_mask"],
                                   indices_are_sorted=True, plan=st["pool"],
                                   counts=b.get("prop_count"))
        sup_in = jnp.concatenate(
            [_fourier(centroid, 4), member_mean,
             member_mean[b["root_slot"]]], axis=1)
        st["super_tok"] = _folded(sup_in, fd["super_node_mlp"])
        st["live"] = [st["super_tok"]]

    def pool_head(st):
        b, fd = st["batch"], st["folded"]
        n_prop = b["labels"].shape[0]
        cat = jnp.concatenate(st["feats"][-cfg.n_blocks_out:], axis=1)
        pmax = _pmax_fused(cat, fd["fusion_block"], b, st["pool"], n_prop,
                           False, None)
        if pmax is None:
            fusion = _folded(cat, fd["fusion_block"])
            pmax = segment_max_concat((fusion, cat), b["bbox_idx"], n_prop,
                                      mask=b["node_mask"],
                                      indices_are_sorted=True,
                                      plan=st["pool"])
        st["pmax"] = pmax
        st["live"] = [pmax]

    def pred_mlps(st):
        fd = st["folded"]
        h = jnp.concatenate([st["pmax"], st["out_super"]], axis=1)
        h = _folded(h, fd["pred_0"])
        if is_pp:
            h = h + fd["gates"]["gate_super"] * st["super_tok"]
        h = _folded(h, fd["pred_1"])
        w2, b2 = fd["pred_2"]
        st["logits"] = (h @ w2 + b2).astype(jnp.float32)
        st["live"] = [st["logits"]]

    def postproc(st):
        b = st["batch"]
        logits = st["logits"]
        pred_label = jnp.argmax(logits, axis=1)
        root_is_bg = pred_label[b["root_slot"]] == background
        kept = b["proposal_mask"] & (b["is_root"] | root_is_bg)
        boxes = inflate_boxes(b["bbox"], 1.05)
        probs = jax.nn.softmax(logits, axis=1)
        obj = 1.0 - probs[:, background]
        cls_scores = probs[:, :background]
        wh = b["wh"][b["image_id"]]
        boxes = boxes * jnp.concatenate([wh, wh], axis=1)
        P = logits.shape[0]
        B = b["gt_bbox"].shape[0]
        arange = jnp.arange(P, dtype=jnp.int32)
        seg_start = jax.ops.segment_min(
            jnp.where(b["proposal_mask"], arange, jnp.int32(P)),
            b["image_id"], num_segments=B)
        idx_in_img = arange - seg_start[b["image_id"]]
        flat_slot = b["image_id"] * P + jnp.clip(idx_in_img, 0, P - 1)

        def scatter(v, fill=0.0):
            out = jnp.full((B * P,) + v.shape[1:], fill, v.dtype)
            return out.at[flat_slot].set(jnp.where(
                kept.reshape(kept.shape + (1,) * (v.ndim - 1)), v,
                jnp.asarray(fill, v.dtype)))

        st["live"] = [scatter(boxes), scatter(cls_scores), scatter(obj),
                      scatter(kept)]

    if is_pp:
        groups = [("conv1", conv_layer(0)), ("pe", pe_gate),
                  ("conv2", conv_layer(1)), ("curve", curve_level),
                  ("prim", prim_level), ("resid", pp_residuals),
                  ("node_stream", node_stream), ("super_tok", super_tokens),
                  ("pool_head", pool_head), ("pred", pred_mlps),
                  ("postproc", postproc)]
    else:
        groups = [("conv1", conv_layer(0)), ("conv2", conv_layer(1)),
                  ("node_stream", node_stream), ("pool_head", pool_head),
                  ("pred", pred_mlps), ("postproc", postproc)]

    # ---- scan-chain timing -------------------------------------------------
    def time_chain(body_fn):
        n = args.iters

        @jax.jit
        def run(stack):
            def body(carry, i):
                b = dict(stack)
                b["pos"] = b["pos"] + (carry * 1e-30).astype(b["pos"].dtype)
                out = body_fn(b)
                return out, out

            _, outs = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
            return outs

        outs = run(sb)
        np.asarray(outs)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(sb))
            best = min(best, time.perf_counter() - t0)
        return best / n

    res = {"arch": args.arch or "canonical", "bf16": bf16,
           "n_images_per_step": n_img}

    def fin(b):
        return finalize_batch(b)

    base = time_chain(lambda b: fin(b)["pos"].astype(jnp.float32).sum())
    res["base_ms"] = round(base * 1e3, 3)
    prev = base
    rows = {}
    for name, _ in groups:
        s = time_chain(functools.partial(
            lambda b, nm: partial_forward(folded0, fin(b), nm, groups),
            nm=name))
        rows[name] = {"cum_ms": round(s * 1e3, 3),
                      "delta_ms": round((s - prev) * 1e3, 3)}
        prev = s

    # full core (adds NMS on top of postproc) — the CURRENT headline
    # program: per-image slot cap + detections_only (round 5)
    from yolat_tpu.eval.runner import img_slot_cap

    cap = img_slot_cap({k: v[None] for k, v in single.items()})
    core = make_predict_core(cfg, max_det=300, fast=True, folded=folded0,
                             bf16=bf16, img_slots=cap,
                             detections_only=True)

    def full(b):
        out = core(variables, b)
        return out["scores"].astype(jnp.float32).sum()

    s_full = time_chain(full)
    rows["nms+stack"] = {"cum_ms": round(s_full * 1e3, 3),
                         "delta_ms": round((s_full - prev) * 1e3, 3)}
    res["groups"] = rows
    res["full_ms_per_step"] = round(s_full * 1e3, 3)
    res["img_per_s"] = round(n_img / s_full, 1)
    res["device"] = str(jax.devices()[0])
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
