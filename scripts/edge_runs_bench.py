"""On-chip A/B for the dst-sorted edge reduction (E msgs -> N nodes).

The xprof HLO profile (scripts/xprof_hlo.py) shows the sparse train step
spends ~2.3 ms/step in XLA scatters around the AttrEdgeGP2 layers at
[E=56k -> N=72k, C=64]: scatters are row-serialised (~7-11 ns/row,
"VMEM Write" bound) while same-shape gathers run ~6x faster. Candidates:

  a) segment_sum (sorted scatter)            — current forward
  b) run-window gather: vmap(dynamic_slice)  — [N, W, C] windows, W=4
  c) slot-map row gather                     — [N*W] precomputed edge ids
  d) unsorted scatter-add                    — current x[src] transpose
  e) src-perm gather + window sum            — candidate transpose

Usage: python scripts/edge_runs_bench.py [--iters 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain(fn, args_tuple, n):
    import jax
    import jax.numpy as jnp

    # measurement hygiene (PERF.md): the carry feeds the INPUT so XLA
    # cannot hoist the body out of the scan; the carry/fetch consume a
    # NON-LINEAR reduction of the full output (sum(out^2)) so the
    # algebraic simplifier cannot fold reduce(scatter-add(u)) -> reduce(u)
    # and narrow the op away; the host fetch is ONE scalar (fetching the
    # [N, C] result through the tunnel costs ~3 ms/iter amortised and
    # swamps the op being measured).
    @jax.jit
    def run2(args):
        def body(carry, _):
            a0 = args[0] + (carry * 1e-30).astype(args[0].dtype)
            out = fn(*((a0,) + args[1:]))
            c = (out.astype(jnp.float32) ** 2).sum()
            return c, jnp.float32(0.0)

        c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
        return c

    out = run2(args_tuple)
    np.asarray(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run2(args_tuple)
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    return best / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--channels", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_workload

    ds, batches, _ = build_workload()
    b = {k: v[0] for k, v in batches[0].items()}
    edge = np.asarray(b["edge"])
    emask = np.asarray(b["edge_mask"])
    N = b["pos"].shape[0]
    E = edge.shape[0]
    C = args.channels

    dst = edge[:, 1].astype(np.int32)
    src = edge[:, 0].astype(np.int32)
    # real edges only for degree stats; masked rows keep their (sorted) ids
    deg = np.bincount(dst[emask], minlength=N)
    W = 1 << int(np.ceil(np.log2(max(deg.max(), 1))))
    # run starts in the dst-sorted buffer: first row with this dst (masked
    # rows included in the buffer — searchsorted over the sorted dst ids)
    starts = np.searchsorted(dst, np.arange(N)).astype(np.int32)
    counts = np.add.reduceat(emask.astype(np.int32),
                             np.minimum(starts, E - 1))
    counts = deg.astype(np.int32)  # authoritative

    # slot map: edge row feeding (node, slot), E (pad row) where empty
    slot_map = np.full((N, W), E, np.int32)
    fill = np.zeros(N, np.int64)
    for e in np.nonzero(emask)[0]:
        n = dst[e]
        slot_map[n, fill[n]] = e
        fill[n] += 1

    # src-sorted permutation + runs
    sperm = np.argsort(src[emask], kind="stable").astype(np.int32)
    real = np.nonzero(emask)[0].astype(np.int32)
    sperm = real[sperm]
    ssorted = src[sperm]
    sstarts = np.searchsorted(ssorted, np.arange(N)).astype(np.int32)
    scounts = np.bincount(src[emask], minlength=N).astype(np.int32)

    rng = np.random.default_rng(0)
    msg = jnp.asarray(rng.normal(size=(E, C)), jnp.bfloat16)
    em = jnp.asarray(emask)
    dstj = jnp.asarray(dst)
    srcj = jnp.asarray(src)
    startsj = jnp.asarray(starts)
    countsj = jnp.asarray(counts)
    slotj = jnp.asarray(slot_map.reshape(-1))
    spermj = jnp.asarray(sperm)
    sstartsj = jnp.asarray(sstarts)
    scountsj = jnp.asarray(scounts)

    def a_scatter(m):
        mm = jnp.where(em[:, None], m, 0)
        return jax.ops.segment_sum(mm, dstj, num_segments=N,
                                   indices_are_sorted=True)

    def b_window(m):
        mp = jnp.concatenate([jnp.where(em[:, None], m, 0),
                              jnp.zeros((W, C), m.dtype)])
        win = jax.vmap(
            lambda s: jax.lax.dynamic_slice(mp, (s, 0), (W, C)))(startsj)
        slot = jnp.arange(W)[None, :] < countsj[:, None]
        return jnp.where(slot[..., None], win, 0).sum(1)

    def c_slotmap(m):
        mp = jnp.concatenate([jnp.where(em[:, None], m, 0),
                              jnp.zeros((1, C), m.dtype)])
        idx = jnp.minimum(slotj, E)
        rows = mp[idx].reshape(N, W, C)
        return rows.sum(1)

    def d_unsorted_scatter(m):
        mm = jnp.where(em[:, None], m, 0)
        return jax.ops.segment_sum(mm, srcj, num_segments=N)

    def e_perm_window(m):
        mm = jnp.where(em[:, None], m, 0)[spermj]
        mp = jnp.concatenate([mm, jnp.zeros((W, C), m.dtype)])
        win = jax.vmap(
            lambda s: jax.lax.dynamic_slice(mp, (s, 0), (W, C)))(sstartsj)
        slot = jnp.arange(W)[None, :] < scountsj[:, None]
        return jnp.where(slot[..., None], win, 0).sum(1)

    # correctness vs (a)
    ref = np.asarray(a_scatter(msg), np.float32)
    for name, fn in (("b", b_window), ("c", c_slotmap)):
        got = np.asarray(fn(msg), np.float32)
        err = np.abs(ref - got).max()
        assert err < 1e-2, (name, err)
    refs = np.asarray(d_unsorted_scatter(msg), np.float32)
    gots = np.asarray(e_perm_window(msg), np.float32)
    assert np.abs(refs - gots).max() < 1e-2

    res = {"N": int(N), "E": int(E), "C": C, "W": int(W),
           "max_deg": int(deg.max())}
    for name, fn in (("a_sorted_scatter", a_scatter),
                     ("b_window_gather", b_window),
                     ("c_slotmap_gather", c_slotmap),
                     ("d_unsorted_scatter", d_unsorted_scatter),
                     ("e_perm_window", e_perm_window)):
        res[name + "_us"] = round(chain(fn, (msg,), args.iters) * 1e6, 1)
    res["device"] = str(jax.devices()[0])
    print(json.dumps(res))


if __name__ == "__main__":
    main()
