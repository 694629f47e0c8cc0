"""Micro-decomposition of the YOLaT++ prim (super-edge clique) level's
TRAIN cost — 19.0 ms of the 31.4 ms pp step (scripts/pp_train_decomp.py,
v5e bf16, 2026-08-20). Isolates the level at bench shapes and times
variants that each delete one cost mechanism, so the 19 ms can be
assigned to gathers / backward scatters / MLP+BN / aggregation.

Variants (all fwd+bwd via jax.grad wrt x AND params, scan chains):
  full          the sparse route exactly as nn/yolat_pp.py runs it
  sorted_i      s_i gathered with indices_are_sorted=True (dst-sorted
                pack contract -> backward scatter takes the sorted path)
  sg_j          stop_gradient(s_j): no unsorted src backward scatter
  sg_ij         stop_gradient on both gathers: no backward scatters
  eval_bn       train=False BN (no batch-stat reductions)
  no_mean       skip the segment mean (consume prim_tok directly)
  banded        the custom-VJP banded route (ops/banded_train.py)

Reference counterpart: fwd+bwd of the clique propagation the reference
would run through torch_scatter (gcn_lib/sparse/torch_vertex.py:330-337).

Usage: python scripts/pp_prim_decomp.py [--iters N] [--dtype bfloat16]
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
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--dtype", type=str, default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn_flax

    from bench import build_workload
    from yolat_tpu.data.packing import finalize_batch
    from yolat_tpu.nn.layers import MLP
    from yolat_tpu.ops.banded_message import bm_of
    from yolat_tpu.ops.banded_train import banded_gather, banded_scatter_own
    from yolat_tpu.ops.segment import segment_mean, sup_plan_of

    ds, batches, _ = build_workload(extra_plans=("super",))
    single = {k: jnp.asarray(v[0]) for k, v in batches[0].items()}
    b = finalize_batch(single)
    cdt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    C = 64
    N = b["pos"].shape[0]
    es = b["edge_super"]
    es_mask = b["super_mask"]
    n_real = int(np.asarray(es_mask).sum())
    feats0 = jnp.asarray(
        np.random.default_rng(0).normal(size=(N, C)), cdt)

    class PrimLevel(nn_flax.Module):
        mode: str = "full"

        @nn_flax.compact
        def __call__(self, feats, batch, train=True):
            mode = self.mode
            if mode == "banded":
                bm = bm_of(batch, "sew_")
                assert bm is not None
                interp = jax.default_backend() != "tpu"
                x_own, x_oth = banded_gather(feats, bm, interp)
                x_own = x_own.astype(feats.dtype)
                x_oth = x_oth.astype(feats.dtype)
                na = batch["e_attr_super"].shape[1]
                attr_p = batch["sew_bm_attr"].reshape(-1, na).astype(
                    x_own.dtype)
                rows_mask = batch["sew_bm_maskf"].reshape(-1) > 0
                prim_in = jnp.concatenate(
                    [x_own, x_oth - x_own, attr_p], axis=1)
                prim_tok = MLP([2 * C + na, C], act="relu", norm="batch",
                               name="super_edge_mlp")(
                    prim_in, mask=rows_mask, train=train)
                prim_sum = banded_scatter_own(prim_tok, bm, feats.shape[0],
                                              interp)
                return (prim_sum / jnp.maximum(
                    batch["super_dst_count"].astype(jnp.float32),
                    1.0)[:, None]).astype(feats.dtype)

            esl = batch["edge_super"]
            m = batch["super_mask"]
            if mode in ("sorted_i",):
                s_i = feats.at[esl[:, 1]].get(indices_are_sorted=True)
            else:
                s_i = feats[esl[:, 1]]
            s_j = feats[esl[:, 0]]
            if mode == "sg_j":
                s_j = jax.lax.stop_gradient(s_j)
            if mode == "sg_ij":
                s_i = jax.lax.stop_gradient(s_i)
                s_j = jax.lax.stop_gradient(s_j)
            prim_in = jnp.concatenate(
                [s_i, s_j - s_i, batch["e_attr_super"].astype(feats.dtype)],
                axis=1)
            prim_tok = MLP([2 * C + 4, C], act="relu", norm="batch",
                           name="super_edge_mlp")(
                prim_in, mask=m, train=(train and mode != "eval_bn"))
            if mode == "no_mean":
                return prim_tok[: feats.shape[0]]
            return segment_mean(prim_tok, esl[:, 1], feats.shape[0],
                                mask=m, indices_are_sorted=True,
                                plan=sup_plan_of(batch),
                                counts=batch.get("super_dst_count"))

    dev_b = {k: (v.astype(cdt)
                 if hasattr(v, "dtype") and v.dtype == jnp.float32
                 and k in ("e_attr_super", "sew_bm_attr") else v)
             for k, v in b.items()}

    res = {"device": str(jax.devices()[0]), "dtype": args.dtype,
           "n_super_rows_real": n_real,
           "n_super_rows_padded": int(np.asarray(es_mask).shape[0])}

    for mode in ("full", "sorted_i", "sg_j", "sg_ij", "eval_bn",
                 "no_mean", "banded"):
        mod = PrimLevel(mode=mode)
        variables = mod.init(jax.random.key(0), feats0, dev_b)

        def loss_fn(params, feats, stats):
            out, mut = mod.apply(
                {"params": params, "batch_stats": stats}, feats, dev_b,
                mutable=["batch_stats"])
            return out.astype(jnp.float32).sum(), mut["batch_stats"]

        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)

        @jax.jit
        def chain(params, feats, stats):
            def body(carry, _):
                f, st = carry
                (l, st2), (gp, gf) = grad_fn(params, f, st)
                # thread grads into the carry so nothing is DCE'd/hoisted
                return (f + (l * 1e-30).astype(f.dtype) + gf * 1e-30,
                        st2), l

            (f, st), ls = jax.lax.scan(
                body, (feats, stats["batch_stats"]
                       if "batch_stats" in stats else stats),
                jnp.arange(args.iters))
            return ls

        stats0 = variables.get("batch_stats", {})
        ls = chain(variables["params"], feats0, stats0)
        np.asarray(ls)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(chain(variables["params"], feats0, stats0))
            best = min(best, time.perf_counter() - t0)
        res[mode + "_ms"] = round(best / args.iters * 1e3, 3)
        print(f"{mode}: {res[mode + '_ms']} ms", file=sys.stderr)

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()