"""Micro-decomposition of the YOLaT++ curve level's TRAIN cost — 3.05 ms
of the 14.2 ms factored pp step (scripts/pp_train_decomp.py, v5e bf16,
2026-08-20; ROADMAP round-5 queue). Isolates the level at bench shapes
and times variants that each delete one cost mechanism.

The level (nn/yolat_pp.py): per-edge tokens from [e_attr | x_src | x_dst]
through MLP+BN+relu, then segment-means scattered to BOTH endpoints.

Variants (fwd+bwd wrt x AND params, scan chains):
  full        the sparse route exactly as nn/yolat_pp.py runs it
  sg_j        stop_gradient(x_src): no unsorted src backward scatter
  sg_ij       stop both gathers' backwards
  eval_bn     train=False BN (no batch-stat reductions)
  no_srcmean  drop the src-direction mean (unsorted forward scatter +
              its backward gather)
  preproj     EXACT linear reassociation: h = attr@Wa + (x@Ws)[src]
              + (x@Wd)[dst] — the [E, 4+2C] concat and its 132-wide
              matmul (fwd + dW + dx) shrink to node-level projections
              + an [E,4] attr matmul; gather volume unchanged
  factored    aggregate-then-activate (the factored-prim trick applied
              to the curve level): per-direction pre-activation means of
              h, BN+relu at NODE level — the E-row MLP/BN vanishes; the
              dst-side q term and src-side p term need no gather at all
              (constant per run). DIFFERENT function family — would need
              a quality gate before landing (factored_prim precedent).

Usage: python scripts/pp_curve_decomp.py [--iters N] [--dtype bfloat16]
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

    from yolat_tpu.cli.common import apply_platform_env

    apply_platform_env()  # honor JAX_PLATFORMS (the axon plugin ignores it)

    import jax
    import jax.numpy as jnp
    from flax import linen as nn_flax

    from bench import build_workload
    from yolat_tpu.data.packing import finalize_batch
    from yolat_tpu.nn.layers import MLP, MaskedBatchNorm
    from yolat_tpu.ops.segment import segment_mean

    ds, batches, _ = build_workload()
    single = {k: jnp.asarray(v[0]) for k, v in batches[0].items()}
    b = finalize_batch(single)
    cdt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    C = 64
    N = b["pos"].shape[0]
    edge = b["edge"]
    emask = b["edge_mask"]
    n_real = int(np.asarray(emask).sum())
    feats0 = jnp.asarray(np.random.default_rng(0).normal(size=(N, C)), cdt)

    class CurveLevel(nn_flax.Module):
        mode: str = "full"

        @nn_flax.compact
        def __call__(self, feats, batch, train=True):
            mode = self.mode
            e = batch["edge"]
            m = batch["edge_mask"]
            attr = batch["e_attr"].astype(feats.dtype)
            bn_train = train and mode != "eval_bn"

            if mode == "preproj":
                # exact reassociation of the concat matmul: same function
                # to float tolerance, 132-wide rows never materialise
                wa = self.param("w_attr", nn_flax.initializers.lecun_normal(),
                                (4, C), jnp.float32)
                ws = self.param("w_src", nn_flax.initializers.lecun_normal(),
                                (C, C), jnp.float32)
                wd = self.param("w_dst", nn_flax.initializers.lecun_normal(),
                                (C, C), jnp.float32)
                p = feats @ ws.astype(feats.dtype)
                q = feats @ wd.astype(feats.dtype)
                h = (attr @ wa.astype(feats.dtype)
                     + p[e[:, 0]]
                     + q.at[e[:, 1]].get(indices_are_sorted=True))
                h = MaskedBatchNorm(C, name="bn")(h, mask=m, train=bn_train)
                tok = nn_flax.relu(h)
                return segment_mean(tok, e[:, 1], feats.shape[0], mask=m,
                                    indices_are_sorted=True,
                                    counts=batch.get("dst_count")) + \
                    segment_mean(tok, e[:, 0], feats.shape[0], mask=m,
                                 counts=batch.get("src_count"))

            if mode == "factored":
                # aggregate-then-activate: pre-activation h aggregates by
                # linearity — mean_{dst=i} h = mean(attr_tok + p[src]) + q_i
                # and mean_{src=j} h = mean(attr_tok + q[dst]) + p_j; the
                # E-row BN/relu moves to the node level (2N rows)
                wa = self.param("w_attr", nn_flax.initializers.lecun_normal(),
                                (4, C), jnp.float32)
                ws = self.param("w_src", nn_flax.initializers.lecun_normal(),
                                (C, C), jnp.float32)
                wd = self.param("w_dst", nn_flax.initializers.lecun_normal(),
                                (C, C), jnp.float32)
                p = feats @ ws.astype(feats.dtype)
                q = feats @ wd.astype(feats.dtype)
                at = attr @ wa.astype(feats.dtype)
                agg_d = segment_mean(at + p[e[:, 0]], e[:, 1],
                                     feats.shape[0], mask=m,
                                     indices_are_sorted=True,
                                     counts=batch.get("dst_count")) + q
                agg_s = segment_mean(
                    at + q.at[e[:, 1]].get(indices_are_sorted=True),
                    e[:, 0], feats.shape[0], mask=m,
                    counts=batch.get("src_count")) + p
                nm = batch["node_mask"]
                out_d = nn_flax.relu(MaskedBatchNorm(C, name="bn_d")(
                    agg_d, mask=nm, train=bn_train))
                out_s = nn_flax.relu(MaskedBatchNorm(C, name="bn_s")(
                    agg_s, mask=nm, train=bn_train))
                return out_d + out_s

            x_src = feats[e[:, 0]]
            x_dst = feats.at[e[:, 1]].get(indices_are_sorted=True)
            if mode == "sg_j":
                x_src = jax.lax.stop_gradient(x_src)
            if mode == "sg_ij":
                x_src = jax.lax.stop_gradient(x_src)
                x_dst = jax.lax.stop_gradient(x_dst)
            curve_in = jnp.concatenate([attr, x_src, x_dst], axis=1)
            tok = MLP([4 + 2 * C, C], act="relu", norm="batch",
                      name="curve_mlp")(curve_in, mask=m, train=bn_train)
            out = segment_mean(tok, e[:, 1], feats.shape[0], mask=m,
                               indices_are_sorted=True,
                               counts=batch.get("dst_count"))
            if mode == "no_srcmean":
                return out
            return out + segment_mean(tok, e[:, 0], feats.shape[0], mask=m,
                                      counts=batch.get("src_count"))

    dev_b = {k: (v.astype(cdt)
                 if hasattr(v, "dtype") and v.dtype == jnp.float32
                 and k == "e_attr" else v)
             for k, v in b.items()}

    res = {"device": str(jax.devices()[0]), "dtype": args.dtype,
           "n_edge_rows_real": n_real,
           "n_edge_rows_padded": int(np.asarray(emask).shape[0])}

    for mode in ("full", "sg_j", "sg_ij", "eval_bn", "no_srcmean",
                 "preproj", "factored"):
        mod = CurveLevel(mode=mode)
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
                return (f + (l * 1e-30).astype(f.dtype) + gf * 1e-30,
                        st2), l

            (f, st), ls = jax.lax.scan(
                body, (feats, stats), jnp.arange(args.iters))
            return ls

        stats0 = variables.get("batch_stats", {})
        print(f"{mode}: compiling ...", file=sys.stderr, flush=True)
        ls = chain(variables["params"], feats0, stats0)
        np.asarray(ls)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(chain(variables["params"], feats0, stats0))
            best = min(best, time.perf_counter() - t0)
        res[mode + "_ms"] = round(best / args.iters * 1e3, 3)
        print(f"{mode}: {res[mode + '_ms']} ms", file=sys.stderr, flush=True)

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
