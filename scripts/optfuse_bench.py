"""On-chip A/B: per-leaf optax Adam chain vs optax.flatten-wrapped chain.

The train-step decomposition (scripts/train_profile.py) shows the optimizer
update adds ~2.3 ms/step — for a ~1.2M-param model that is kernel-launch
overhead over ~300 leaves, not bandwidth. optax.flatten runs the Adam math
on one [P] vector.

Methodology matches bench.py: one carry-threaded lax.scan chain per
variant, host fetch as the completion barrier.

Usage: python scripts/optfuse_bench.py [--iters N]
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
    ap.add_argument("--iters", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from bench import build_workload
    from yolat_tpu.train.config import Config
    from yolat_tpu.train.loop import build_model, create_state
    from yolat_tpu.train.optim import make_optimizer

    ds, batches, _ = build_workload()
    cfg = Config(n_classes=ds.n_classes, data_aug=True, dtype="bfloat16")
    tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
    single = {k: v[0] for k, v in batches[0].items()}
    state = create_state(cfg, tx, single, jax.random.key(0))
    build_model(cfg)

    params = state.params
    n_leaves = len(jax.tree_util.tree_leaves(params))
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(params))
    # synthetic grads with the param structure (values irrelevant to cost)
    grads0 = jax.tree.map(lambda p: jnp.ones_like(p) * 1e-3, params)

    def chain(tx_v, n):
        opt0 = tx_v.init(params)

        @jax.jit
        def run(p, opt, g):
            def body(carry, _):
                p, opt, g = carry
                # thread the carry into the grads so XLA cannot hoist
                g = jax.tree.map(lambda a, b: a + b * 1e-30, g, p)
                upd, opt = tx_v.update(g, opt, p)
                p = optax.apply_updates(p, upd)
                return (p, opt, g), jnp.float32(0.0)

            (p, opt, _), _ = jax.lax.scan(body, (p, opt, g),
                                          jnp.arange(n))
            return p, opt

        out = run(params, opt0, grads0)
        np.asarray(jax.tree_util.tree_leaves(out[0])[0])
        t0 = time.perf_counter()
        out = run(params, opt0, grads0)
        np.asarray(jax.tree_util.tree_leaves(out[0])[0])
        return (time.perf_counter() - t0) / n

    res = {"n_leaves": n_leaves, "n_params": n_params}
    res["per_leaf_ms"] = round(chain(tx, args.iters) * 1e3, 3)
    res["flat_ms"] = round(chain(optax.flatten(tx), args.iters) * 1e3, 3)

    # numeric equivalence of one update
    o1 = tx.init(params)
    o2 = optax.flatten(tx).init(params)
    u1, _ = tx.update(grads0, o1, params)
    u2, _ = optax.flatten(tx).update(grads0, o2, params)
    err = max(float(jnp.abs(a - b).max())
              for a, b in zip(jax.tree_util.tree_leaves(u1),
                              jax.tree_util.tree_leaves(u2)))
    res["max_update_diff"] = err
    res["device"] = str(jax.devices()[0])
    print(json.dumps(res))


if __name__ == "__main__":
    main()
