"""Differential per-op-group decomposition of the YOLaT++ TRAIN step.

Round-4 queue item: pp trains at ~124-126 img/s bf16 vs canonical 563 —
a 4.5x gap with no per-op attribution. This applies the serve_decomp
methodology (PERF.md round 3) to the TRAIN step: the full flax model sows
each stage's output into a "probe" collection (nn/yolat_pp.py), and prefix
k's loss consumes the sown tensors of groups 1..k only — XLA dead-code
eliminates everything downstream INCLUDING its backward, so adjacent
prefix deltas attribute fwd+bwd(+their BN stat updates) per group. Group
boundaries are dependency-based, not source-order-based: e.g. the
node_stream prefix keeps the convs' s-stream but DCEs the fusion_block MLP.

Executed-module BN stats ride the scan carry (like the real step); stats
of DCE'd modules are frozen at their initial value so they cannot keep the
dead forward alive. Adam updates the full (mostly-zero-grad) param tree in
every prefix, so the optimizer cost sits in the base row, not the deltas.
The closure row runs the REAL train step (make_train_step: detection_loss
+ full backward) — its delta over the last prefix is loss+harness.

Reference counterpart: the per-stage timing discipline of
cad_recognition/detect.py:264-269 applied to train (train.py:212-260).

Usage: python scripts/pp_train_decomp.py [--iters N] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# group -> (probe names consumed, top-level batch_stats modules it executes)
GROUPS = [
    ("pe", ["pe"], ["point_pe_mlp"]),
    ("conv1", ["conv1_f", "conv1_s"], ["AttrEdgeGP2_0"]),
    ("conv2", ["conv2_f", "conv2_s"], ["AttrEdgeGP2_1"]),
    ("curve", ["curve"], ["curve_mlp"]),
    ("prim", ["prim"], ["super_edge_mlp"]),
    ("node_stream", ["node_stream"], ["fusion_block_super"]),
    ("super_tok", ["super_tok"], ["super_node_mlp"]),
    ("pool_head", ["pool_head"], ["fusion_block"]),
    ("pred", ["pred"], ["pred_0", "pred_1"]),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--dtype", type=str, default="bfloat16")
    ap.add_argument("--arch", type=str, default="yolat_pp")
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated group names: measure only those "
                         "prefixes (plus base + closure) — cuts compile "
                         "count; deltas are vs the previous MEASURED "
                         "prefix, so pass adjacent groups for clean "
                         "single-group deltas")
    ap.add_argument("--skip_base", action="store_true",
                    help="skip the base prefix (saves one compile; the "
                         "first measured row's delta is then cumulative)")
    ap.add_argument("--banded", action="store_true",
                    help="attribute the pp_banded_super arm (sew_ plan "
                         "rides the batch, clique level on the custom-VJP "
                         "banded primitives)")
    ap.add_argument("--factored", action="store_true",
                    help="attribute the cfg.pp_factored_prim arm (v2 "
                         "prefix-sum prim level, super_fact_mlp)")
    args = ap.parse_args()
    if args.factored:
        GROUPS[4] = ("prim", ["prim"], ["super_fact_mlp"])

    import jax
    import jax.numpy as jnp

    from bench import build_workload, time_train
    from yolat_tpu.data.packing import finalize_batch
    from yolat_tpu.train.config import Config
    from yolat_tpu.train.loop import (_DENSE_KEYS, build_model,
                                      compute_dtype_of, create_state)
    from yolat_tpu.train.optim import make_optimizer

    ds, batches, _ = build_workload(
        extra_plans=("super",) if args.banded else ())
    cfg = Config(n_classes=ds.n_classes, arch=args.arch, data_aug=True,
                 dtype=args.dtype, pp_banded_super=args.banded,
                 pp_factored_prim=args.factored)
    tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
    single = {k: v[0] for k, v in batches[0].items()}
    state = create_state(cfg, tx, single, jax.random.key(0))
    model = build_model(cfg, axis_name=None)
    cdtype = compute_dtype_of(cfg)

    known = {m for _, _, mods in GROUPS for m in mods}
    extra = set(state.batch_stats) - known
    if extra:
        raise SystemExit(f"unassigned batch_stats modules: {sorted(extra)} "
                         f"(have {sorted(state.batch_stats)})")

    def prep(batch, key):
        # strip the [1, ...] device axis (same as make_train_step)
        batch = jax.tree.map(
            lambda x: x[0] if hasattr(x, "ndim") and x.ndim > 0 else x,
            batch)
        batch = {k: v for k, v in batch.items() if k not in _DENSE_KEYS}
        batch = finalize_batch(batch, key=key, data_aug=cfg.data_aug)
        if cdtype is not None:
            from yolat_tpu.train.loop import _COMPUTE_KEYS
            batch = {k: (v.astype(cdtype) if k in _COMPUTE_KEYS else v)
                     for k, v in batch.items()}
        return batch

    def make_prefix_step(upto: int):
        names = [n for _, ns, _ in GROUPS[: upto + 1] for n in ns]
        live_mods = {m for _, _, ms in GROUPS[: upto + 1] for m in ms}

        def step(state, batch, key):
            batch = prep(batch, key)

            def loss_fn(params):
                p = params
                if cdtype is not None:
                    p = jax.tree.map(
                        lambda a: a.astype(cdtype)
                        if hasattr(a, "dtype") and a.dtype == jnp.float32
                        else a, params)
                if upto < 0:
                    # base: finalize + Adam + dispatch floor, zero grads
                    return batch["x"].astype(jnp.float32).sum() * 0.0, \
                        state.batch_stats
                _, mut = model.apply(
                    {"params": p, "batch_stats": state.batch_stats},
                    batch, train=True, mutable=["batch_stats", "probe"],
                    rngs={"dropout": key})
                probe = mut["probe"]
                acc = jnp.float32(0.0)
                for n in names:
                    for t in probe[n]:
                        acc = acc + t.astype(jnp.float32).sum()
                # executed modules carry their real updated stats; DCE'd
                # modules stay frozen so their forward stays dead
                stats = {
                    m: (mut["batch_stats"][m] if m in live_mods
                        else state.batch_stats[m])
                    for m in state.batch_stats
                }
                return acc, stats

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = jax.tree.map(lambda a, u: a + u, state.params,
                                      updates)
            new_state = state.replace(step=state.step + 1, params=new_params,
                                      batch_stats=new_stats,
                                      opt_state=new_opt)
            return new_state, loss

        return step

    stack = {k: jnp.asarray(np.stack([b[k] for b in batches]))
             for k in batches[0]}
    S = len(batches)
    n_steps = args.iters * S
    n_images = sum(int(b["n_images"][0]) for b in batches)

    def time_chain(step):
        @jax.jit
        def run(state, stack, key):
            def body(carry, i):
                st, k = carry
                k, sub = jax.random.split(k)
                b = jax.tree.map(lambda a: a[i % S], stack)
                st, loss = step(st, b, sub)
                return (st, k), loss

            (st, _), losses = jax.lax.scan(body, (state, key),
                                           jnp.arange(n_steps))
            return st, losses

        _, losses = run(state, stack, jax.random.key(0))
        np.asarray(losses)
        best = float("inf")
        for seed in (1, 2, 3):
            t0 = time.perf_counter()
            _, losses = run(state, stack, jax.random.key(seed))
            np.asarray(losses)
            best = min(best, time.perf_counter() - t0)
        return best / n_steps

    res = {"arch": args.arch, "dtype": args.dtype,
           "n_images_per_step": n_images // S,
           "device": str(jax.devices()[0])}
    rows = {}
    only = (set(args.only.split(",")) if args.only else
            {g[0] for g in GROUPS})
    unknown = only - {g[0] for g in GROUPS}
    if unknown:
        raise SystemExit(f"unknown groups: {sorted(unknown)}")
    if args.skip_base:
        prev = 0.0
    else:
        prev = time_chain(make_prefix_step(-1))
        res["base_ms"] = round(prev * 1e3, 3)
    for k in range(len(GROUPS)):
        if GROUPS[k][0] not in only:
            continue
        s = time_chain(make_prefix_step(k))
        rows[GROUPS[k][0]] = {"cum_ms": round(s * 1e3, 3),
                              "delta_ms": round((s - prev) * 1e3, 3)}
        prev = s

    # closure: the REAL train step (detection_loss + full backward + Adam)
    img_s = time_train(cfg, state, batches, iters=args.iters)
    full = (n_images // S) / img_s / 1e-3
    rows["loss+real_step"] = {"cum_ms": round(full, 3),
                              "delta_ms": round(full - prev * 1e3, 3)}
    res["groups"] = rows
    res["full_ms_per_step"] = round(full, 3)
    res["img_per_s"] = round(img_s, 1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
