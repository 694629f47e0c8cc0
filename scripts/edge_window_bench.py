"""On-chip A/B: edge-window Pallas message kernel vs the XLA serving routes.

Measures one conv layer at bench scale (N=72704, C=64 bf16) and the full
fast_forward in both routings. Carry-threaded scan chain + host fetch
(PERF.md measurement hygiene)."""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain(fn, args_tuple, n=32):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(args):
        def body(carry, _):
            a0 = args[0] + (carry * 1e-30).astype(args[0].dtype)
            out = fn(*((a0,) + args[1:]))
            return (out.astype(jnp.float32) ** 2).sum(), jnp.float32(0.0)

        c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
        return c

    np.asarray(run(args_tuple))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(args_tuple))
        best = min(best, time.perf_counter() - t0)
    return best / n


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_workload
    from yolat_tpu.data.packing import finalize_batch
    from yolat_tpu.eval.fast_forward import (_sparse_message, fold_params,
                                             fused_dense_message_reference)
    from yolat_tpu.nn.model import SparseCADGCN
    from yolat_tpu.ops.edge_window import edge_window_message_sum, ew_of
    from yolat_tpu.train.config import Config

    ds, batches, _ = build_workload()
    cfg = Config(n_classes=ds.n_classes)
    b = finalize_batch(jax.tree.map(jnp.asarray, {k: v[0] for k, v in batches[0].items()}))
    model = SparseCADGCN(n_classes=ds.n_classes, sorted_edges=True)
    var = model.init(jax.random.key(0), b, train=False)
    folded = fold_params(var, n_blocks=cfg.n_blocks)
    folded16 = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16)
        if hasattr(v, "dtype") and v.dtype == jnp.float32 else v, folded)

    ew = ew_of(b)
    assert ew is not None, "bench batch must carry the window plan"
    x = b["x"].astype(jnp.bfloat16)
    c = folded16["convs"][0]
    cnt = jnp.maximum(b["dst_count"].astype(jnp.float32), 1.0)

    res = {"N": int(x.shape[0]), "E": int(b["edge"].shape[0])}

    def layer_ew(x):
        agg = edge_window_message_sum(x, ew, c["w1"], c["sc1"], c["w2"], c["sc2"])
        return (agg / cnt[:, None]).astype(x.dtype) + x @ c["wr"] + c["br"].reshape(1, -1)

    def layer_dense(x):
        return fused_dense_message_reference(
            x, b["nbr_idx"], b["nbr_attr"].astype(jnp.bfloat16), b["nbr_mask"],
            c["w1"], c["sc1"], c["w2"], c["sc2"], c["wr"], c["br"])

    def layer_sparse(x):
        return _sparse_message(x, b["edge"], b["e_attr"], b["edge_mask"], c,
                               dst_count=b["dst_count"])

    # correctness on-chip vs the sparse route
    ref = np.asarray(layer_sparse(x), np.float32)
    got = np.asarray(layer_ew(x), np.float32)
    err = np.abs(ref - got).max() / max(np.abs(ref).max(), 1e-6)
    res["rel_err_vs_sparse"] = float(err)

    # (wn, group) sweep: smaller windows shrink the one-hot contraction
    # dims; grouping amortizes the per-grid-step overhead
    from yolat_tpu.ops.edge_window import EW_KEYS, edge_window_plan

    for wn, grp in ((64, 16), (64, 32), (128, 8), (128, 16), (256, 4),
                    (256, 8), (512, 2)):
        p = edge_window_plan(np.asarray(b["edge"]), np.asarray(b["edge_mask"]),
                             np.asarray(b["e_attr"]), int(x.shape[0]), wn=wn)
        tag = f"wn{wn}g{grp}"
        nw = int(x.shape[0]) // wn
        if p is None or nw % grp:
            res[tag + "_us"] = None
            continue
        ewk = tuple(jnp.asarray(p[k]) for k in EW_KEYS)

        def layer_wn(x, ewk=ewk, grp=grp):
            agg = edge_window_message_sum(x, ewk, c["w1"], c["sc1"],
                                          c["w2"], c["sc2"], group=grp)
            return (agg / cnt[:, None]).astype(x.dtype) \
                + x @ c["wr"] + c["br"].reshape(1, -1)

        err = np.abs(np.asarray(layer_wn(x), np.float32) - ref).max()
        res[tag + "_us"] = round(chain(layer_wn, (x,)) * 1e6, 1)
        res[tag + "_eb"] = int(p["ew_src_rel"].shape[1])
        res[tag + "_err"] = float(err / max(np.abs(ref).max(), 1e-6))

    res["layer_ew_us"] = round(chain(layer_ew, (x,)) * 1e6, 1)
    res["layer_dense_us"] = round(chain(layer_dense, (x,)) * 1e6, 1)
    res["layer_sparse_us"] = round(chain(layer_sparse, (x,)) * 1e6, 1)
    res["device"] = str(jax.devices()[0])
    print(json.dumps(res))


if __name__ == "__main__":
    main()
