"""Bulk inference driver: SVGs in, detections out, at sustained throughput.

The production serving path the reference lacks (its detect.py renders
matplotlib overlays one image at a time): glob or manifest of SVGs —
annotation sidecars NOT required — through the cached geometry kernel,
packed batches, the folded-BN bf16 serving engine and on-device NMS, to
one JSON line per image:

  {"file": ..., "width": ..., "height": ...,
   "detections": [{"box": [x0, y0, x1, y1], "score": s, "class": name}]}

Host preprocessing overlaps device inference through the loader's
prefetch thread; throughput (SVGs/sec end-to-end, plus the blocking
result-fetch wait — with the pipelined dispatch a near-zero wait means
the host, not the device, was the bound) prints at the end. Works on any backend; on TPU the serving default is
--serve_mode fast_bf16.

Usage:
  python -m yolat_tpu.cli.infer --input_dir DIR --pretrained_model CKPT \
      [--out detections.jsonl] [--conf_th 0.5] [--serve_mode fast_bf16]
  python -m yolat_tpu.cli.infer --data_dir ROOT --phase test ...
"""

from __future__ import annotations

import glob
import json
import os
import time

import numpy as np

from yolat_tpu.cli.common import build_parser, config_from_args
from yolat_tpu.data.dataset import PackedLoader, SESYDDataset

_PROBE_DS = None


def _probe_init(ctor_kwargs):
    global _PROBE_DS
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    _PROBE_DS = SESYDDataset(**ctor_kwargs)


def _probe_load(i):
    try:
        _PROBE_DS.load(i)
        return i, None
    except Exception as e:
        return i, f"{type(e).__name__}: {e}"


def _validate_files(probe: SESYDDataset, workers: int):
    """One preprocessing pass per file (warms the on-disk graph/proposal
    caches the loader reuses); failures become error records instead of
    aborting the batch job. With workers > 1 the pass runs in a spawn
    process pool — the cold parse->graph->proposal work is the host bound
    of the whole job (PERF.md: ~7 ms/image single core)."""
    good, bad = [], []
    if workers > 1:
        import multiprocessing as mp

        ctx = mp.get_context("spawn")
        with ctx.Pool(workers, initializer=_probe_init,
                      initargs=(probe.ctor_kwargs(),)) as pool:
            results = pool.map(_probe_load, range(len(probe.files)))
    else:
        _probe_init(probe.ctor_kwargs())
        results = [_probe_load(i) for i in range(len(probe.files))]
    for i, err in results:
        if err is None:
            good.append(probe.files[i])
        else:
            bad.append((probe.files[i], err))
    return good, bad


def main(argv=None):
    p = build_parser("yolat_tpu bulk inference")
    p.add_argument("--input_dir", default="", type=str,
                   help="directory of *.svg (recursive); overrides "
                        "--data_dir manifests; GT sidecars not required")
    p.add_argument("--mode", default=None, choices=(None, "floorplan", "diagram", "chart"),
                   help="class vocabulary when --input_dir is used "
                        "(default: floorplan unless the path says diagram)")
    p.add_argument("--out", default="detections.jsonl", type=str)
    p.add_argument("--conf_th", default=0.5, type=float)
    p.add_argument("--serve_mode", default="fast_bf16",
                   choices=("flax", "fast", "fast_bf16"))
    p.add_argument("--preproc_workers", default=0, type=int,
                   help="host preprocessing processes (0 = in-process); "
                        "the multi-core counterpart of the reference's "
                        "DataLoader(num_workers=8), train.py:181")
    p.add_argument("--chunk", default=8, type=int,
                   help="loader batches per device dispatch (lax.map scan "
                        "chunk): amortizes the per-call dispatch round "
                        "trip of a remote-attached device /chunk; 1 = "
                        "per-batch dispatch")
    import argparse

    p.add_argument("--skip_errors", default=True,
                   action=argparse.BooleanOptionalAction,
                   help="unparseable/unsupported SVGs become {'error': ...} "
                        "records instead of aborting the whole run "
                        "(--input_dir mode only)")
    args = p.parse_args(argv)
    cfg = config_from_args(args, argv)

    import jax

    from yolat_tpu.cli.test import load_checkpoint
    from yolat_tpu.eval.fast_forward import fold_params_for

    bad: list = []
    if args.input_dir:
        files = sorted(glob.glob(os.path.join(args.input_dir, "**", "*.svg"),
                                 recursive=True))
        if not files:
            raise FileNotFoundError(f"no .svg files under {args.input_dir}")
        if args.skip_errors:
            probe = SESYDDataset(args.input_dir, files=files, mode=args.mode,
                                 bbox_sampling_step=cfg.bbox_sampling_step,
                                 require_gt=False)
            files, bad = _validate_files(probe, args.preproc_workers)
            if not files:
                with open(args.out, "w") as f:
                    for path, err in bad:
                        f.write(json.dumps({
                            "file": os.path.relpath(path, args.input_dir),
                            "error": err, "detections": [],
                        }) + "\n")
                print(f"0 of {len(bad)} SVGs preprocessable -> {args.out}")
                return
        ds = SESYDDataset(args.input_dir, files=files, mode=args.mode,
                          bbox_sampling_step=cfg.bbox_sampling_step,
                          require_gt=False)
    else:
        partition = cfg.phase if cfg.phase in ("train", "test", "val") else "test"
        ds = SESYDDataset(cfg.data_dir, partition,
                          bbox_sampling_step=cfg.bbox_sampling_step,
                          require_gt=False)
    cfg = cfg.replace(n_classes=ds.n_classes)
    id2name = [""] * (ds.n_classes - 1)
    for name, cid in ds.class_dict.items():
        if cid < len(id2name):
            id2name[cid] = name

    t_start = time.perf_counter()
    # cache_files=False: single-pass bulk inference must STREAM — the
    # unshuffled epoch cache would pack the whole manifest into RAM before
    # the first batch (it only pays off for loaders iterated repeatedly)
    from yolat_tpu.eval.fast_forward import extra_plans_for

    loader = PackedLoader(ds, batch_size=cfg.batch_size,
                          n_devices=1, shuffle=False, dense=True,
                          cache_files=False,
                          preproc_workers=args.preproc_workers,
                          extra_plans=extra_plans_for(cfg),
                          # the bf16 engine routes messages through XLA
                          # and never reads ew_* — skip the plan build
                          edge_window=args.serve_mode != "fast_bf16")

    if not cfg.pretrained_model:
        raise SystemExit("--pretrained_model is required for inference")
    # serving restores the LATEST epoch by default: the reference's "best"
    # key is AP@0.95 (train.py:508), which is ~always 0 for point-extent
    # proposal boxes, so ckpt_best stays the untrained first epoch. An
    # explicit <dir>/ckpt_<tag> path overrides.
    from yolat_tpu.train.checkpoint import CheckpointManager

    path = cfg.pretrained_model.rstrip("/")
    if path.endswith(".pth"):
        ckpt_dir, tag = path, "best"  # reference .pth: loaded directly
    elif os.path.basename(path).startswith("ckpt_"):
        ckpt_dir, tag = os.path.dirname(path), os.path.basename(path)[5:]
    else:
        ckpt_dir = path
        latest = CheckpointManager(ckpt_dir).latest_epoch()
        tag = str(latest) if latest is not None else "best"
    cfg = cfg.replace(pretrained_model=ckpt_dir)

    example = {k: v[0] for k, v in next(iter(loader)).items()}
    state, epoch, _best = load_checkpoint(cfg, example, tag=tag)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    fast = args.serve_mode in ("fast", "fast_bf16")
    folded = fold_params_for(cfg, variables) if fast else None
    # detections_only: bulk serving never reads the eval-protocol extras
    # (pred_label/kept/prop_*), so skip their per-batch HBM writes + fetch.
    # img_slots: the exact per-image NMS slot cap (+16% detect, PERF.md
    # round 4) — computed per batch from real per-image counts and
    # 256-quantized, so the predict program is memoized per cap value and
    # recompiles only when a batch's cap bucket changes
    from yolat_tpu.eval.runner import img_slot_cap

    predict_by_cap: dict = {}
    chunk = max(1, args.chunk)

    def batch_sig(batch):
        # the fused pack spec is bound to the batch's KEY SET and shapes
        # (plan keys like ew_*/sew_* are per-batch-optional and
        # content-shaped) — programs memoize per (cap, signature) and
        # chunks never mix signatures
        return tuple(sorted((k, np.shape(v)) for k, v in batch.items()))

    def get_predict(cap, batch):
        key = (cap, batch_sig(batch))
        fn = predict_by_cap.get(key)
        if fn is None:
            # chunked fused-transfer serving (make_serving_fn chunk=K):
            # K loader batches pack into one [K, total] buffer and run as
            # one lax.map program — one dispatch + one fetch per chunk
            from yolat_tpu.eval.predict import make_serving_fn

            fn = make_serving_fn(cfg, variables, batch,
                                 chunk=chunk if chunk > 1 else None,
                                 max_det=cfg.max_det, fast=fast,
                                 folded=folded,
                                 bf16=args.serve_mode == "fast_bf16",
                                 img_slots=cap, detections_only=True)
            predict_by_cap[key] = fn
        return fn

    n_images = 0
    device_s = 0.0
    file_pos = 0
    with open(args.out, "w") as f:
        for path, err in bad:  # error records first (known before streaming)
            f.write(json.dumps({
                "file": os.path.relpath(path, args.input_dir),
                "error": err, "detections": [],
            }) + "\n")

        def write_rows(out, batch):
            """Write one batch's JSON records from host detection arrays."""
            nonlocal n_images, file_pos
            B = int(batch["n_images"])
            for img in range(B):
                path = ds.files[file_pos]
                file_pos += 1
                n_images += 1
                valid = out["valid"][img] & (out["scores"][img] >= args.conf_th)
                dets = [
                    {
                        "box": [round(float(c), 2) for c in out["boxes"][img][d]],
                        "score": round(float(out["scores"][img][d]), 4),
                        "class": id2name[int(out["classes"][img][d])],
                    }
                    for d in np.where(valid)[0]
                ]
                w, h = batch["wh"][img]
                f.write(json.dumps({
                    "file": os.path.relpath(path, ds.root) if ds.root else path,
                    "width": float(w), "height": float(h),
                    "detections": dets,
                }) + "\n")

        def consume(out_dev, chunk_batches):
            """Fetch one in-flight chunk's detections and write its JSON
            records. Called AFTER the next chunk's async dispatch, so the
            fetch round-trip + host formatting overlap the device compute
            (one-deep result pipeline)."""
            nonlocal device_s
            t0 = time.perf_counter()
            out = {k: np.asarray(v) for k, v in out_dev.items()}
            device_s += time.perf_counter() - t0
            if len(np.shape(out["scores"])) == 3:  # chunked: [K, B, D]
                for i, b in enumerate(chunk_batches):
                    write_rows({k: v[i] for k, v in out.items()}, b)
            else:
                write_rows(out, chunk_batches[0])

        from collections import deque

        pending: deque = deque()
        chunk_buf: list = []
        chunk_caps: list = []
        chunk_sig: list = []

        def flush():
            if not chunk_buf:
                return
            fn = get_predict(max(chunk_caps), chunk_buf[0])
            if getattr(fn, "chunk", None):
                out_dev, _ = fn(variables, list(chunk_buf))
                pending.append((out_dev, list(chunk_buf)))
            else:
                # fallback (no fused spec): dispatch each batch alone so
                # every buffered batch is still predicted and written
                for b in chunk_buf:
                    pending.append((fn(variables, b), [b]))
            chunk_buf.clear()
            chunk_caps.clear()
            chunk_sig.clear()
            while len(pending) > 1:
                consume(*pending.popleft())

        for stacked in loader:
            b = {k: v[0] for k, v in stacked.items()}
            sig = batch_sig(b)
            if chunk_sig and sig != chunk_sig[0]:
                flush()  # chunks never mix pack signatures
            chunk_buf.append(b)
            chunk_caps.append(img_slot_cap(stacked))
            if not chunk_sig:
                chunk_sig.append(sig)
            if len(chunk_buf) >= chunk:
                flush()
        flush()
        while pending:
            consume(*pending.popleft())

    wall = time.perf_counter() - t_start
    skipped = f", {len(bad)} skipped with errors" if bad else ""
    print(
        f"{n_images} SVGs -> {args.out}: "
        f"{n_images / wall:.2f} SVGs/sec end-to-end "
        f"(result-fetch wait {device_s:.2f}s, "
        f"ckpt epoch {epoch}{skipped})"
    )


if __name__ == "__main__":
    main()
