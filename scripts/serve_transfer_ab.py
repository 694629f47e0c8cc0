"""A/B: per-batch serving dispatch from HOST batches through the tunnel.

Arms (canonical bf16 dense program, bench workload, batch 4):
  jit lazy      make_predict_fn, transfers issued lazily at call time
  AOT kept      make_serving_fn, one async device_put of the kept leaves
each serial (fetch before next dispatch) and one-deep pipelined.

This is the e2e pipeline's device step (cli/infer.py); the scan-chain
bench headline is NOT this path (it measures the program, not per-batch
host dispatch). Writes artifacts_r5/serve_transfer_ab.json.
"""
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from yolat_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()  # tunnel flaps: reuse compiles across retries

    from yolat_tpu.data.dataset import PackedLoader, SESYDDataset
    from yolat_tpu.eval.fast_forward import fold_params
    from yolat_tpu.eval.predict import make_predict_fn, make_serving_fn
    from yolat_tpu.eval.runner import img_slot_cap
    from yolat_tpu.train.config import Config
    from yolat_tpu.train.loop import create_state
    from yolat_tpu.train.optim import make_optimizer

    root = os.path.join(tempfile.gettempdir(), "yolat_bench_v1")
    ds = SESYDDataset(root, "train", bbox_sampling_step=10, cache=False)
    loader = PackedLoader(ds, batch_size=4, n_devices=1, shuffle=False,
                          dense=True, cache_files=True, preproc_workers=0,
                          edge_window=False)
    batches = list(loader)
    cfg = Config(n_classes=ds.n_classes, data_aug=False)
    tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
    single = {k: v[0] for k, v in batches[0].items()}
    state = create_state(cfg, tx, single, jax.random.key(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    folded = fold_params(variables, n_blocks=cfg.n_blocks)
    dev = jax.devices()[0]
    dev_vars = jax.device_put(variables, dev)

    def kwargs(cap):
        return dict(max_det=300, fast=True, folded=folded, bf16=True,
                    img_slots=cap, detections_only=True)

    jfns, sfns = {}, {}
    for st in batches:
        cap = img_slot_cap(st)
        b = {k: v[0] for k, v in st.items()}
        if cap not in jfns:
            jfns[cap] = make_predict_fn(cfg, **kwargs(cap))
            sfns[cap] = make_serving_fn(cfg, dev_vars, b, device=dev,
                                        **kwargs(cap))
        np.asarray(jfns[cap](dev_vars, b)["scores"])
        np.asarray(sfns[cap](dev_vars, b)["scores"])
    print("kept:", next(iter(sfns.values())).kept_batch_keys, flush=True)

    out = {}

    from collections import deque

    def run(fns, label, depth, iters=12):
        n = 0
        pending = deque()
        t0 = time.perf_counter()
        for _ in range(iters):
            for st in batches:
                b = {k: v[0] for k, v in st.items()}
                o = fns[img_slot_cap(st)](dev_vars, b)
                pending.append(o)
                while len(pending) > depth:
                    np.asarray(pending.popleft()["scores"])
                n += int(b["n_images"])
        while pending:
            np.asarray(pending.popleft()["scores"])
        dt = time.perf_counter() - t0
        out[label] = {"ms_per_batch": round(dt / (iters * len(batches))
                                            * 1000, 2),
                      "img_per_s": round(n / dt, 1)}
        print(label, out[label], flush=True)
        os.makedirs("artifacts_r5", exist_ok=True)
        with open("artifacts_r5/serve_transfer_ab.json", "w") as f:
            json.dump(out, f, indent=1)

    # same-session tunnel baselines: dispatch/transfer costs vary with
    # tunnel health, so arms are only comparable against these
    dev_batches = [jax.device_put({k: v[0] for k, v in st.items()}, dev)
                   for st in batches]
    for db in dev_batches:
        jax.block_until_ready(db)
    for st, db in zip(batches, dev_batches):  # warm any relayout
        np.asarray(jfns[img_slot_cap(st)](dev_vars, db)["scores"])
    t0 = time.perf_counter()
    for _ in range(24):
        for st, db in zip(batches, dev_batches):
            np.asarray(jfns[img_slot_cap(st)](dev_vars, db)["scores"])
    out["program_only_prestaged"] = {
        "ms_per_batch": round((time.perf_counter() - t0) / (24 * len(batches))
                              * 1000, 2)}
    for mb in (1, 8):
        a = np.empty(mb * 1_000_000, np.uint8)
        jax.block_until_ready(jax.device_put(a, dev))
        t0 = time.perf_counter()
        for _ in range(6):
            jax.block_until_ready(jax.device_put(a, dev))
        out[f"device_put_{mb}MB_ms"] = round(
            (time.perf_counter() - t0) / 6 * 1000, 2)
    print({k: v for k, v in out.items() if "device_put" in k or
           "program" in k}, flush=True)

    run(jfns, "jit_lazy_serial", 0)
    run(jfns, "jit_lazy_depth1", 1)
    run(jfns, "jit_lazy_depth3", 3)
    run(sfns, "fused_buf_serial", 0)
    run(sfns, "fused_buf_depth1", 1)
    run(sfns, "fused_buf_depth3", 3)

    # chunked scan serving (the cli/infer.py default): K batches per
    # dispatch, one fetch per chunk
    for K in (4, 8):
        cap = max(img_slot_cap(st) for st in batches)
        b0 = {k: v[0] for k, v in batches[0].items()}
        cfn = make_serving_fn(cfg, dev_vars, b0, device=dev, chunk=K,
                              **kwargs(cap))
        bs = [{k: v[0] for k, v in st.items()} for st in batches]
        np.asarray(cfn(dev_vars, bs[:K])[0]["scores"])  # warm
        n = 0
        t0 = time.perf_counter()
        pend = None
        for _ in range(12):
            for i in range(0, len(bs), K):
                chunk_b = (bs + bs)[i:i + K]  # wrap to K
                o, _ = cfn(dev_vars, chunk_b)
                if pend is not None:
                    np.asarray(pend["scores"])
                pend = o
                n += sum(int(b["n_images"]) for b in chunk_b)
        np.asarray(pend["scores"])
        dt = time.perf_counter() - t0
        out[f"chunked_k{K}"] = {
            "ms_per_batch": round(dt / (n / 4) * 1000, 2),
            "img_per_s": round(n / dt, 1)}
        print(f"chunked_k{K}", out[f"chunked_k{K}"], flush=True)
        with open("artifacts_r5/serve_transfer_ab.json", "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
