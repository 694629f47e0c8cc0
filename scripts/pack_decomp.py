"""Host pack-stage decomposition (round-5 cont.): where do the
~25 ms/image of post-load host work in the cold e2e pipeline go?

Stages timed per batch over the bench workload (8 SESYD-style floorplan
images, step 10, batch 4 — the same root bench.measure_e2e_pipeline
uses):
  load       SESYDDataset.load (parse -> graph -> proposals), cold
  compact    CompactFile conversion (dtype + dst-sort + block align)
  pack_core  pack_files with everything below disabled (buffer + copies)
  pool_plan  node->proposal two-level plan + bincount populations
  sup_fields factored clique fields (sup_member/rank/abar)
  ew_plan    edge-window plan
  dense      add_dense_neighbors
Prints JSON {stage: ms_per_image}.
"""
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolat_tpu.data.dataset import SESYDDataset
from yolat_tpu.data.packing import (CompactFile, PadSizes,
                                    add_dense_neighbors, pack_files)


def main():
    root = os.path.join(tempfile.gettempdir(), "yolat_bench_v1")
    if not os.path.exists(os.path.join(root, "train_list.txt")):
        from yolat_tpu.data.synthetic import write_floorplan_dataset
        os.makedirs(root, exist_ok=True)
        write_floorplan_dataset(root, n_train=8, n_test=1, seed=0)
    ds = SESYDDataset(root, "train", bbox_sampling_step=10, cache=False)
    n = len(ds)
    reps = 6
    t = {}

    def clock(name, fn, per_call_images):
        best = min(_time(fn) for _ in range(reps))
        t[name] = best / per_call_images * 1000.0

    def _time(fn):
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    # --- load (cold parse -> graph -> proposals) ---
    files = gts = whs = None

    def do_load():
        nonlocal files, gts, whs
        files, gts, whs = [], [], []
        for i in range(n):
            f, gt, wh = ds.load(i)
            files.append(f)
            gts.append(gt)
            whs.append(wh)

    clock("load", do_load, n)

    compacts = None

    def do_compact():
        nonlocal compacts
        compacts = [CompactFile(f, n_classes=ds.n_classes) for f in files]

    clock("compact", do_compact, n)

    B = 4
    chunks = [(compacts[i:i + B], gts[i:i + B], whs[i:i + B])
              for i in range(0, n, B)]
    pads = [PadSizes.for_files(fs, [len(g[0]) for g in gs], B)
            for fs, gs, _ in chunks]

    # --- full pack (as the loader runs it) ---
    def do_pack_full():
        for (fs, gs, ws), pad in zip(chunks, pads):
            pack_files(fs, gs, ws, pad)

    clock("pack_full", do_pack_full, n)

    # --- stage-isolated timings via monkeypatching the helpers ---
    import yolat_tpu.data.packing as P
    import yolat_tpu.ops.edge_window as EW
    import yolat_tpu.ops.segment as SEG

    real_pool_plan = SEG.pool_plan
    real_ew = EW.edge_window_plan

    stage_acc = {"pool_plan": 0.0, "ew_plan": 0.0}

    def timed_pool_plan(*a, **k):
        t0 = time.perf_counter()
        r = real_pool_plan(*a, **k)
        stage_acc["pool_plan"] += time.perf_counter() - t0
        return r

    def timed_ew(*a, **k):
        t0 = time.perf_counter()
        r = real_ew(*a, **k)
        stage_acc["ew_plan"] += time.perf_counter() - t0
        return r

    SEG.pool_plan = timed_pool_plan
    EW.edge_window_plan = timed_ew
    try:
        best = None
        for _ in range(reps):
            for k in stage_acc:
                stage_acc[k] = 0.0
            el = _time(do_pack_full)
            if best is None or el < best[0]:
                best = (el, dict(stage_acc))
    finally:
        SEG.pool_plan = real_pool_plan
        EW.edge_window_plan = real_ew
    t["pack_pool_plan"] = best[1]["pool_plan"] / n * 1000.0
    t["pack_ew_plan"] = best[1]["ew_plan"] / n * 1000.0
    t["pack_body"] = t["pack_full"] - t["pack_pool_plan"] - t["pack_ew_plan"]

    batches = [pack_files(fs, gs, ws, pad)
               for (fs, gs, ws), pad in zip(chunks, pads)]

    def do_dense():
        for b, (fs, _, _) in zip(batches, chunks):
            for f in fs:
                f._dense = None  # cold: rebuild per-file tables
            add_dense_neighbors(dict(b), d_max=8, files=fs)

    clock("dense", do_dense, n)

    tot = t["load"] + t["compact"] + t["pack_full"] + t["dense"]
    t["total_per_image_ms"] = tot
    t["implied_svgs_per_sec"] = 1000.0 / tot
    print(json.dumps({k: round(v, 3) for k, v in t.items()}, indent=1))


if __name__ == "__main__":
    main()
