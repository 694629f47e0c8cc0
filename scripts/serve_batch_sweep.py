"""Serving batch-size sweep + per-change A/Bs (VERDICT round-5 item 2).

Round-4 attribution left the batch-4 bf16 serving step dominated by fixed
per-step floors (base 0.62 ms, conf 0.2 ms) at MFU 1.7% / HBM 43% — the
chip is mostly idle, so a throughput-mode batch should amortize them.
This sweep measures, on-chip, all on the capped-layout bf16 fast path:

  b4_base   batch 4, full eval outputs   (round-4 headline program +
                                          the lazy top-idx NMS gathers)
  b4_det    batch 4, detections_only     (drops the [P]/[P,K] eval-extra
                                          per-step scan outputs)
  b8/b16/b32_det  throughput mode        (larger batches, same workload
                                          distribution, 32-image root)

Prints one JSON row per arm; detections of b4_base and b4_det are checked
identical on the first batch.

Usage: nohup python scripts/serve_batch_sweep.py > /tmp/serve_sweep.log &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from yolat_tpu.cli.common import (apply_platform_env,
                                      enable_compilation_cache)

    apply_platform_env()
    enable_compilation_cache()

    import jax

    import bench
    from yolat_tpu.eval.fast_forward import fold_params
    from yolat_tpu.eval.predict import make_predict_fn
    from yolat_tpu.eval.runner import img_slot_cap
    from yolat_tpu.train.config import Config
    from yolat_tpu.train.loop import create_state
    from yolat_tpu.train.optim import make_optimizer

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    # shared params: init once on the canonical workload, reuse everywhere
    ds, batches4, _ = bench.build_workload(n_images=8, batch_size=4)
    cfg = Config(n_classes=ds.n_classes, data_aug=False)
    tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
    single = {k: v[0] for k, v in batches4[0].items()}
    state = create_state(cfg, tx, single, jax.random.key(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    folded = fold_params(variables, n_blocks=cfg.n_blocks)

    rows = []

    def arm(label, batches, iters, det_only):
        print(f"arm {label}: compiling ...", flush=True)
        t0 = time.time()
        rate = bench.time_predict(cfg, variables, batches, dev, iters=iters,
                                  fast=True, folded=folded, bf16=True,
                                  detections_only=det_only)
        row = {"arm": label, "images_per_sec": round(rate, 1),
               "batch": int(batches[0]["n_images"][0]),
               "chain_steps": iters * len(batches),
               "wall_s": round(time.time() - t0, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    arm("b4_base", batches4, 32, det_only=False)
    arm("b4_det", batches4, 32, det_only=True)

    # detection equality: full-output vs detections_only programs
    cap = max(img_slot_cap(b) for b in batches4)
    pa = make_predict_fn(cfg, max_det=300, fast=True, folded=folded,
                         bf16=True, img_slots=cap)
    pb = make_predict_fn(cfg, max_det=300, fast=True, folded=folded,
                         bf16=True, img_slots=cap, detections_only=True)
    b0 = {k: v[0] for k, v in batches4[0].items()}
    oa, ob = pa(variables, b0), pb(variables, b0)
    for k in ("boxes", "scores", "classes", "valid"):
        np.testing.assert_array_equal(np.asarray(oa[k]), np.asarray(ob[k]))
    print("detections identical: b4_base == b4_det", flush=True)

    _, batches8, _ = bench.build_workload(n_images=8, batch_size=8)
    arm("b8_det", batches8, 48, det_only=True)

    _, batches16, _ = bench.build_workload(n_images=32, batch_size=16)
    arm("b16_det", batches16, 24, det_only=True)

    _, batches32, _ = bench.build_workload(n_images=32, batch_size=32)
    arm("b32_det", batches32, 48, det_only=True)

    with open("/tmp/serve_batch_sweep.json", "w") as f:
        json.dump(rows, f, indent=1)
    print("done", flush=True)


if __name__ == "__main__":
    main()
