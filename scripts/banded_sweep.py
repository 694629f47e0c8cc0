"""On-chip (wn, eblk, ech) sweep for the ragged banded kernel on the
bench workload's super-edge family (ops/banded_message.py).

The kernel is grid-step-overhead-bound at SESYD scale (~2.4 us/step fixed
pipeline cost), so fewer/bigger edge blocks trade padding-compute for
step count; wn sets the one-hot contraction width (band = wn + 2*pad).
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
    from yolat_tpu.ops.banded_message import (banded_message_sum,
                                              banded_plan, bm_of)

    ds, batches, _ = build_workload()
    b = {k: np.asarray(v[0]) for k, v in batches[0].items()}
    n = b["pos"].shape[0]
    rng = np.random.default_rng(0)
    x16 = jnp.asarray(rng.normal(size=(n, 64)), jnp.bfloat16)
    w = lambda s: jnp.asarray(rng.normal(size=s) * 0.1, jnp.bfloat16)
    w_own, w_halo, w_attr = w((64, 64)), w((64, 64)), w((4, 64))
    sc1 = jnp.asarray(np.stack([np.ones(64), np.zeros(64)]), jnp.float32)

    def chain(fn, x, iters=64):
        @jax.jit
        def run(x):
            def body(carry, _):
                xx = x + (carry * 1e-30).astype(x.dtype)
                out = fn(xx)
                return out.sum(), out.sum()

            _, outs = jax.lax.scan(body, jnp.float32(0.0),
                                   jnp.arange(iters))
            return outs

        np.asarray(run(x))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(x))
            best = min(best, time.perf_counter() - t0)
        return best / iters

    res = {"n_nodes": int(n),
           "n_super_edges": int(np.asarray(b["super_mask"]).sum())}
    for wn, eblk, ech in ((1024, 1024, 512), (512, 1024, 512),
                          (512, 512, 512), (256, 512, 512),
                          (512, 1024, 256), (256, 1024, 512)):
        p = banded_plan(b["edge_super"], b["super_mask"],
                        b["e_attr_super"], n, sortby=1, wn=wn, eblk=eblk)
        if p is None:
            res[f"wn{wn}_eb{eblk}_ech{ech}"] = "plan=None"
            continue
        bm = bm_of({**{k: jnp.asarray(v) for k, v in p.items()},
                    "pos": jnp.zeros((n, 2))}, "")
        try:
            t = chain(lambda xx, bm=bm, ech=ech: banded_message_sum(
                xx, bm, w_own, w_halo, w_attr, sc1, ech=ech), x16)
            res[f"wn{wn}_eb{eblk}_ech{ech}"] = {
                "ms": round(t * 1e3, 3),
                "blocks": int(p["bm_win"].shape[0]),
                "active": int(p["bm_active"].sum())}
        except Exception as e:
            res[f"wn{wn}_eb{eblk}_ech{ech}"] = f"{type(e).__name__}"
    res["device"] = str(jax.devices()[0])
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
