"""Isolate the conv1 anomaly: edge_window_message_sum at Ci=5 vs Ci=64.

serve_decomp attributes 0.68 ms to conv1 (Ci=5) vs 0.25 ms to conv2
(Ci=64) on identical window plans — this times the kernel alone at both
widths, plus a pre-projected variant (x @ W1d / x @ W1b computed OUTSIDE
the kernel so the banded arrays are 64-lane aligned).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_chain(fn, stack, iters=48):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(s):
        def body(carry, _):
            x = s["x"] + (carry * 1e-30).astype(s["x"].dtype)
            out = fn({**s, "x": x})
            return out, out

        _, outs = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(iters))
        return outs

    np.asarray(run(stack))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(stack))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_workload
    from yolat_tpu.data.packing import finalize_batch
    from yolat_tpu.ops.edge_window import edge_window_message_sum, ew_of

    ds, batches, _ = build_workload()
    single = {k: jnp.asarray(v[0]) for k, v in batches[0].items()}
    b = finalize_batch(single)
    ew = ew_of(b)
    assert ew is not None
    n = b["x"].shape[0]
    rng = np.random.default_rng(0)
    res = {"n_nodes": int(n), "dtype": "bf16"}

    for ci in (5, 8, 16, 64):
        h = 64
        w1 = jnp.asarray(rng.normal(size=(2 * ci + 4, h)) * 0.1, jnp.bfloat16)
        sc1 = jnp.asarray(np.stack([np.ones(h), np.zeros(h)]), jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(h, h)) * 0.1, jnp.bfloat16)
        x = jnp.asarray(rng.normal(size=(n, ci)), jnp.bfloat16)

        def kern(s, w1=w1, w2=w2, sc1=sc1, ci=ci):
            return edge_window_message_sum(
                s["x"], ew, w1, sc1, w2, sc1).astype(jnp.float32).sum()

        t = time_chain(kern, {"x": x})
        res[f"kernel_ci{ci}_ms"] = round(t * 1e3, 3)

    # base: consume x only
    x5 = jnp.asarray(rng.normal(size=(n, 5)), jnp.bfloat16)
    res["base_ms"] = round(
        time_chain(lambda s: s["x"].astype(jnp.float32).sum(),
                   {"x": x5}) * 1e3, 3)
    res["device"] = str(jax.devices()[0])
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
