"""On-chip A/B: one conv layer's TRAIN fwd+bwd (gather -> masked-BN MLP ->
segment-mean + skip, jax.grad over x and weights) through

  (a) the sparse dst-sorted XLA path (the production training route), vs
  (b) the custom-VJP banded gather/scatter primitives
      (ops/banded_train.py) with identical math in plan layout.

VERDICT r2 item 4: "custom-VJP edge-window training layer ... a measured
number either way". Runs both the shape-edge family (canonical conv) and
the super-edge clique family (yolat_pp prim level) at bench shapes.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_workload
    from yolat_tpu.ops.banded_message import banded_plan, bm_of
    from yolat_tpu.ops.banded_train import banded_gather, banded_scatter_own

    ds, batches, _ = build_workload()
    b = {k: np.asarray(v[0]) for k, v in batches[0].items()}
    n = b["pos"].shape[0]
    rng = np.random.default_rng(0)
    res = {"n_nodes": int(n)}

    def masked_norm(pre, mkf):
        # train-mode BN core: masked batch stats over edge rows (the part
        # that forces materialisation — PERF.md finding 4)
        m = mkf[:, None]
        cnt = jnp.maximum(mkf.sum(), 1.0)
        mean = (pre * m).sum(0) / cnt
        var = (((pre - mean) ** 2) * m).sum(0) / cnt
        return (pre - mean) * jax.lax.rsqrt(var + 1e-5)

    def chain_grad(loss_fn, params, x, iters=32):
        g_fn = jax.grad(loss_fn, argnums=(0, 1))

        @jax.jit
        def run(params, x):
            def body(carry, _):
                xx = x + (carry * 1e-30).astype(x.dtype)
                gp, gx = g_fn(params, xx)
                c = gx.astype(jnp.float32).sum()
                for t in jax.tree.leaves(gp):
                    c = c + t.astype(jnp.float32).sum()
                return c, c

            _, outs = jax.lax.scan(body, jnp.float32(0.0),
                                   jnp.arange(iters))
            return outs

        np.asarray(run(params, x))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(params, x))
            best = min(best, time.perf_counter() - t0)
        return best / iters

    dtype = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32
    for fam, ekey, mkey, akey, wn, eblk in (
            ("shape", "edge", "edge_mask", "e_attr", 1024, 1024),
            ("super", "edge_super", "super_mask", "e_attr_super", 512, 512)):
        edge = b[ekey]
        em = np.asarray(b[mkey], bool)
        attr = np.asarray(b[akey], np.float32)
        cnt = np.zeros(n, np.float32)
        np.add.at(cnt, edge[em][:, 1], 1.0)
        cntj = jnp.asarray(np.maximum(cnt, 1.0))

        plan = banded_plan(edge, em, attr, n, sortby=1, wn=wn, eblk=eblk)
        if plan is None:
            res[fam] = "plan=None"
            continue
        bm = bm_of({**{k: jnp.asarray(v) for k, v in plan.items()},
                    "pos": jnp.zeros((n, 2))}, "")
        # plan-layout attrs/mask for the banded chain
        attr_p = jnp.asarray(plan["bm_attr"].reshape(-1, attr.shape[1]),
                             dtype)
        mkf_p = jnp.asarray(plan["bm_maskf"].reshape(-1))
        # edge-layout for the sparse chain
        edge_j = jnp.asarray(edge)
        attr_j = jnp.asarray(attr, dtype)
        mkf_j = jnp.asarray(em, jnp.float32)

        c = 64
        x = jnp.asarray(rng.normal(size=(n, c)), dtype)
        w1 = jnp.asarray(rng.normal(size=(2 * c + attr.shape[1], 32)) * 0.1,
                         dtype)
        wr = jnp.asarray(rng.normal(size=(c, 32)) * 0.1, dtype)
        params = (w1, wr)

        def loss_sparse(params, x):
            w1, wr = params
            x_i = x.at[edge_j[:, 1]].get(indices_are_sorted=True)
            x_j = x[edge_j[:, 0]]
            f = jnp.concatenate([x_i, x_j - x_i, attr_j], axis=1)
            h = jnp.maximum(masked_norm(f @ w1, mkf_j), 0.0) * mkf_j[:, None]
            s = jax.ops.segment_sum(h, edge_j[:, 1], num_segments=n,
                                    indices_are_sorted=True)
            return jnp.tanh(s / cntj[:, None] + x @ wr).sum()

        def loss_banded(params, x):
            w1, wr = params
            x_i, x_j = banded_gather(x, bm)
            x_i, x_j = x_i.astype(x.dtype), x_j.astype(x.dtype)
            f = jnp.concatenate([x_i, x_j - x_i, attr_p], axis=1)
            h = jnp.maximum(masked_norm(f @ w1, mkf_p), 0.0) * mkf_p[:, None]
            s = banded_scatter_own(h, bm, n).astype(x.dtype)
            return jnp.tanh(s / cntj[:, None] + x @ wr)\
                .astype(jnp.float32).sum()

        # numerical agreement first (same math, different layout)
        ga = jax.grad(loss_sparse, argnums=1)(params, x)
        gb = jax.grad(loss_banded, argnums=1)(params, x)
        agree = float(jnp.abs(ga - gb).max())

        t_sparse = chain_grad(loss_sparse, params, x)
        t_banded = chain_grad(loss_banded, params, x)
        res[fam] = {
            "rows": int(em.sum()),
            "plan_rows": int(plan["bm_maskf"].size),
            "sparse_ms": round(t_sparse * 1e3, 3),
            "banded_ms": round(t_banded * 1e3, 3),
            "grad_max_diff": agree,
        }
    res["dtype"] = str(dtype.__name__)
    res["device"] = str(jax.devices()[0])
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
