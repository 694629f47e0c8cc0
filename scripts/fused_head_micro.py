"""Isolated on-chip A/B of the pool head alone (fwd+bwd wrt x and params)
at bench shapes: unfused composition (Dense -> masked BN -> relu ->
segment_max_concat over [fusion|cat]) vs the fused op + raw-cat pool.

Separates kernel-level performance from full-step fusion context.
Usage: python scripts/fused_head_micro.py [--iters N] [--dtype bfloat16]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--dtype", type=str, default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_workload
    from yolat_tpu.ops.fused_pool_train import BN_EPS, fused_pool_train
    from yolat_tpu.ops.segment import plan_of, segment_max, segment_max_concat

    ds, batches, _ = build_workload()
    b = {k: jnp.asarray(v[0]) for k, v in batches[0].items()}
    plan = plan_of(b)
    n = b["pos"].shape[0]
    n_prop = b["labels"].shape[0]
    ci, h = 128, 1024
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rng = np.random.default_rng(0)
    cat = jnp.asarray(rng.normal(size=(n, ci)), dt)
    w = jnp.asarray(rng.normal(size=(ci, h)) / np.sqrt(ci), dt)
    bb = jnp.zeros(h, jnp.float32)
    gamma = jnp.ones(h, jnp.float32)
    beta = jnp.zeros(h, jnp.float32)
    cot = jnp.asarray(rng.normal(size=(n_prop, h + ci)), jnp.float32)
    mask = b["node_mask"]
    maskf = mask.astype(jnp.float32)[:, None]
    blk_first = plan[0]

    def unfused(cat, w):
        z = cat @ w + bb
        zf = z.astype(jnp.float32)
        count = jnp.maximum(maskf.sum(), 1.0)
        mean = (zf * maskf).sum(axis=0) / count
        var = jnp.maximum((zf * zf * maskf).sum(axis=0) / count
                          - mean * mean, 0.0)
        y = (zf - mean) * jax.lax.rsqrt(var + BN_EPS) * gamma + beta
        fusion = jnp.maximum(y, 0.0).astype(cat.dtype)
        pooled = segment_max_concat((fusion, cat), b["bbox_idx"], n_prop,
                                    mask=mask, indices_are_sorted=True,
                                    plan=plan)
        return jnp.sum(pooled.astype(jnp.float32) * cot)

    def fused(cat, w):
        pooled, _, _, _ = fused_pool_train(cat, maskf, w, bb, gamma, beta,
                                           blk_first, n_prop, False)
        pc = segment_max(cat, b["bbox_idx"], n_prop, mask=mask,
                         indices_are_sorted=True, plan=plan)
        both = jnp.concatenate([pooled.astype(jnp.float32),
                                pc.astype(jnp.float32)], axis=1)
        return jnp.sum(both * cot)

    res = {"device": str(jax.devices()[0]), "dtype": args.dtype, "n": n}
    for tag, fn in (("unfused", unfused), ("fused", fused)):
        g = jax.grad(fn, argnums=(0, 1))

        @jax.jit
        def run(cat, w):
            def body(carry, i):
                c = cat + (carry * 1e-30).astype(cat.dtype)
                gx, gw = g(c, w)
                return gx.astype(jnp.float32).sum(), gw.astype(
                    jnp.float32).sum()

            _, outs = jax.lax.scan(body, jnp.float32(0.0),
                                   jnp.arange(args.iters))
            return outs

        np.asarray(run(cat, w))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(cat, w))
            best = min(best, time.perf_counter() - t0)
        res[tag + "_ms"] = round(best / args.iters * 1e3, 3)
        print(f"# {tag}: {res[tag + '_ms']} ms", flush=True)
    res["speedup"] = round(res["unfused_ms"] / res["fused_ms"], 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
