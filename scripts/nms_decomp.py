"""Differential decomposition of the serving NMS (ops/nms.py fixpoint).

serve_decomp.py attributes the whole serving step and reads NMS+stack at
~0.77 ms (24% of the canonical bf16 step) — the top serving cost. This
script splits THAT number into its stages with the same cumulative-prefix
scan-chain methodology, on the real bench layout and score distribution:

  conf      [S, K] conf = cls*obj, mask, flatten, class-offset boxes
  topk      lax.top_k over S*K -> C candidates + gathers
  iou       the [C, C] offset-box IoU matrix + suppression mask
  fixpoint  the while_loop suppression sweeps
  select    rank/slot scatter epilogue to max_det rows

Also A/Bs the img_slots layout cap (eval/predict.py): per-image slot
width S = padded batch width P (the pre-round-4 layout) vs the exact
per-image cap from eval/runner.img_slot_cap — the cap shrinks conf+topk
work ~batch_size x with identical detections (tests/test_predict_paths.py
TestImgSlotsLayout).

Scores: by default the UNTRAINED model's near-flat softmax (worst case
for suppression-chain depth); --sharpen T multiplies logits by T to
emulate a trained peaked distribution (sweep-count sensitivity).

Usage: python scripts/nms_decomp.py [--iters N] [--sharpen T]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=128)
    ap.add_argument("--sharpen", type=float, default=1.0)
    ap.add_argument("--topk", type=int, default=1024)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_workload
    from yolat_tpu.data.packing import finalize_batch
    from yolat_tpu.eval.fast_forward import fold_params_for
    from yolat_tpu.eval.predict import make_predict_core
    from yolat_tpu.eval.runner import img_slot_cap
    from yolat_tpu.ops.nms import MAX_WH
    from yolat_tpu.train.config import Config
    from yolat_tpu.train.loop import create_state
    from yolat_tpu.train.optim import make_optimizer

    ds, batches, _ = build_workload()
    cfg = Config(n_classes=ds.n_classes)
    tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
    single = {k: v[0] for k, v in batches[0].items()}
    state = create_state(cfg, tx, single, jax.random.key(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    folded = fold_params_for(cfg, variables)
    cap = img_slot_cap(batches[0])
    n_img = int(single["n_images"])
    C = args.topk
    iou_th = cfg.nms_iou
    max_det = 300

    sb = {k: jnp.asarray(v) for k, v in single.items()}

    # ---- produce the REAL per-image NMS inputs once (host-side), so the
    # chained NMS prefixes run on the actual score/box distribution -------
    def nms_inputs(img_slots):
        core = make_predict_core(cfg, max_det=max_det, fast=True,
                                 folded=folded, bf16=True,
                                 img_slots=img_slots)
        # reproduce predict's internals up to the vmap'd NMS by calling the
        # core and re-deriving inputs from its raw per-proposal outputs
        out = jax.jit(core)(variables, sb)
        b = finalize_batch(jax.tree.map(jnp.asarray, dict(sb)))
        P = out["prop_boxes"].shape[0]
        B = b["gt_bbox"].shape[0]
        kept = out["kept"]
        logits_sharp = args.sharpen
        obj = out["prop_obj"]
        cls = out["prop_cls"]
        if logits_sharp != 1.0:
            # emulate a trained peaked softmax: p^T renormalised
            background = cfg.n_classes - 1
            full = jnp.concatenate([cls, (1.0 - obj)[:, None]], axis=1)
            full = full ** logits_sharp
            full = full / jnp.maximum(full.sum(1, keepdims=True), 1e-20)
            obj = 1.0 - full[:, background]
            cls = full[:, :background]
        arange = jnp.arange(P, dtype=jnp.int32)
        seg_start = jax.ops.segment_min(
            jnp.where(b["proposal_mask"], arange, jnp.int32(P)),
            b["image_id"], num_segments=B)
        idx = arange - seg_start[b["image_id"]]
        S = P if img_slots is None else min(img_slots, P)
        ok = kept & (idx < S)
        slot = jnp.where(ok, b["image_id"] * S + jnp.clip(idx, 0, S - 1),
                         B * S)

        def scat(x, fill=0.0):
            o = jnp.full((B * S + 1,) + x.shape[1:], fill, x.dtype)
            return o.at[slot].set(jnp.where(
                ok.reshape(ok.shape + (1,) * (x.ndim - 1)), x,
                jnp.asarray(fill, x.dtype)))[: B * S]

        return (np.asarray(scat(out["prop_boxes"])).reshape(B, S, 4),
                np.asarray(scat(cls)).reshape(B, S, -1),
                np.asarray(scat(obj)).reshape(B, S),
                np.asarray(scat(kept)).reshape(B, S))

    # ---- the fixpoint NMS as resumable stages (mirrors ops/nms.py) ------
    def nms_prefix(boxes, cls_scores, obj_scores, valid, upto):
        M, K = cls_scores.shape
        conf = cls_scores * obj_scores[:, None]
        conf = jnp.where(valid[:, None], conf, -1.0)
        cand_valid = (conf > cfg.nms_conf).reshape(M * K)
        flat_conf = conf.reshape(M * K)
        classes = jnp.tile(jnp.arange(K, dtype=jnp.int32), (M,))
        box_rep = jnp.repeat(boxes, K, axis=0)
        offset_boxes = box_rep + (classes[:, None].astype(boxes.dtype)
                                  * MAX_WH)
        if upto == "conf":
            return [flat_conf, cand_valid, offset_boxes]
        Cc = min(C, M * K)
        scores = jnp.where(cand_valid, flat_conf, -jnp.inf)
        top_scores, top_idx = jax.lax.top_k(scores, Cc)
        tvalid = cand_valid[top_idx]
        ob = offset_boxes[top_idx]
        bx = box_rep[top_idx]
        cl = classes[top_idx]
        if upto == "topk":
            return [top_scores, tvalid, ob, bx, cl]
        ix0 = jnp.maximum(ob[:, None, 0], ob[None, :, 0])
        iy0 = jnp.maximum(ob[:, None, 1], ob[None, :, 1])
        ix1 = jnp.minimum(ob[:, None, 2], ob[None, :, 2])
        iy1 = jnp.minimum(ob[:, None, 3], ob[None, :, 3])
        inter = jnp.clip(ix1 - ix0, 0, None) * jnp.clip(iy1 - iy0, 0, None)
        area = (ob[:, 2] - ob[:, 0]) * (ob[:, 3] - ob[:, 1])
        iou = inter / (area[:, None] + area[None, :] - inter + 1e-16)
        sup = (iou > iou_th) & (jnp.arange(Cc)[None, :]
                                < jnp.arange(Cc)[:, None])
        if upto == "iou":
            return [sup, top_scores, tvalid, bx, cl]

        def step(kept):
            return tvalid & ~jnp.any(sup & kept[None, :], axis=1)

        kept, _ = jax.lax.while_loop(
            lambda st: jnp.any(st[0] != st[1]),
            lambda st: (step(st[0]), st[0]),
            (step(tvalid), tvalid))
        if upto == "fixpoint":
            return [kept, top_scores, bx, cl]
        rank = jnp.cumsum(kept) - 1
        sel = kept & (rank < max_det)
        slot = jnp.where(sel, rank, max_det)
        det_boxes = jnp.zeros((max_det + 1, 4), bx.dtype).at[slot].set(
            jnp.where(sel[:, None], bx, 0.0))[:max_det]
        det_scores = jnp.zeros((max_det + 1,), top_scores.dtype).at[slot].set(
            jnp.where(sel, top_scores, 0.0))[:max_det]
        det_classes = jnp.full((max_det + 1,), -1, jnp.int32).at[slot].set(
            jnp.where(sel, cl, -1))[:max_det]
        return [det_boxes, det_scores, det_classes]

    def time_chain(fn, inputs):
        n = args.iters

        @jax.jit
        def run(inp):
            def body(carry, i):
                bx = inp[0] + (carry * 1e-30).astype(inp[0].dtype)
                outs = jax.vmap(lambda b, c, o, v: fn(b, c, o, v))(
                    bx, *inp[1:])
                acc = jnp.float32(0.0)
                for t in jax.tree.leaves(outs):
                    acc = acc + t.astype(jnp.float32).sum()
                return acc, acc

            _, outs = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
            return outs

        outs = run(inputs)
        np.asarray(outs)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(inputs))
            best = min(best, time.perf_counter() - t0)
        return best / n

    res = {"device": str(jax.devices()[0]), "topk": C,
           "sharpen": args.sharpen, "n_images": n_img}
    for tag, slots in (("fullP", None), ("capped", cap)):
        inp = tuple(jnp.asarray(v) for v in nms_inputs(slots))
        S = inp[0].shape[1]
        rows = {}
        prev = 0.0
        for stage in ("conf", "topk", "iou", "fixpoint", "select"):
            s = time_chain(
                lambda b, c, o, v, st=stage: nms_prefix(b, c, o, v, st), inp)
            rows[stage] = {"cum_ms": round(s * 1e3, 3),
                           "delta_ms": round((s - prev) * 1e3, 3)}
            prev = s
        res[tag] = {"img_slots": S, "flat_candidates": S * inp[1].shape[2],
                    "stages": rows,
                    "nms_ms_total": rows["select"]["cum_ms"]}
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
