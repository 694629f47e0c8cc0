"""On-chip HLO op profile of the real train / serving steps via xprof.

jax.profiler traces DO work through the axon tunnel, and the installed
xprof converts the xplane into a per-HLO table with self time, measured
HBM bandwidth and a bound-by classification — ground truth that replaces
the pre-fusion cost-analysis proxy everywhere it matters.

Usage:
  python scripts/xprof_hlo.py [--mode train|detect] [--steps 8] [--top 30]
Prints one JSON line: top ops by total self time.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _trace(fn, steps, outdir):
    import jax

    fn()  # compile + warm
    shutil.rmtree(outdir, ignore_errors=True)
    with jax.profiler.trace(outdir):
        for _ in range(steps):
            fn()


def _hlo_table(outdir, top):
    from xprof.convert import raw_to_tool_data as r2t

    fs = sorted(glob.glob(os.path.join(outdir, "plugins/profile/*/*.xplane.pb")))
    data, _ = r2t.xspace_to_tool_data(fs, "hlo_stats", {})
    tab = json.loads(data.decode() if isinstance(data, bytes) else data)
    cols = [c["id"] for c in tab["cols"]]
    rows = []
    for r in tab["rows"]:
        d = dict(zip(cols, [c.get("v") for c in r["c"]]))
        rows.append(d)
    rows.sort(key=lambda d: -(d.get("total_self_time") or 0))
    keep = ("category", "hlo_op_name", "occurrences", "total_self_time",
            "avg_self_time", "total_self_time_percent", "hbm_bw",
            "operational_intensity", "bound_by", "tf_op_name")
    out = []
    for d in rows[:top]:
        e = {k: d.get(k) for k in keep}
        expr = (d.get("hlo_op_expression") or "")[:160]
        e["expr"] = expr
        out.append(e)
    total = sum((d.get("total_self_time") or 0) for d in rows)
    return out, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="train", choices=["train", "detect"])
    ap.add_argument("--arch", default="centernet3cc_rpn_gp_iter2")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--keep", action="store_true",
                    help="keep the raw trace directory")
    ap.add_argument("--banded", action="store_true",
                    help="pp_banded_super arm (use with --arch yolat_pp)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_workload
    from yolat_tpu.train.config import Config

    ds, batches, _ = build_workload(
        extra_plans=("super",) if args.banded else ())
    outdir = f"/tmp/xprof_{args.mode}"

    from yolat_tpu.train.loop import create_state, make_train_step
    from yolat_tpu.train.optim import make_optimizer

    if args.mode == "train":
        cfg = Config(n_classes=ds.n_classes, data_aug=True, dtype="bfloat16",
                     arch=args.arch, pp_banded_super=args.banded)
        tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
        single = {k: v[0] for k, v in batches[0].items()}
        state = create_state(cfg, tx, single, jax.random.key(0))
        step = make_train_step(cfg, tx)
        sb = {k: jnp.asarray(v) for k, v in batches[0].items()}
        key = jax.random.key(1)

        def run():
            nonlocal state
            state, metrics = step(state, sb, key)
            np.asarray(metrics["loss"])
    else:
        from yolat_tpu.eval.fast_forward import fold_params_for
        from yolat_tpu.eval.predict import make_predict_fn

        cfg = Config(n_classes=ds.n_classes, arch=args.arch)
        tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
        single = {k: v[0] for k, v in batches[0].items()}
        state = create_state(cfg, tx, single, jax.random.key(0))
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        folded = fold_params_for(cfg, variables)
        predict = make_predict_fn(cfg, max_det=300, fast=True, folded=folded,
                                  bf16=True)
        sb = {k: jnp.asarray(v[0]) for k, v in batches[0].items()}

        def run():
            out = predict(variables, sb)
            np.asarray(out["scores"])

    _trace(run, args.steps, outdir)
    rows, total_us = _hlo_table(outdir, args.top)
    print(json.dumps({"mode": args.mode, "steps": args.steps,
                      "total_self_us": total_us,
                      "us_per_step": round(total_us / args.steps, 1),
                      "top": rows}, indent=1))
    if not args.keep:
        shutil.rmtree(outdir, ignore_errors=True)


if __name__ == "__main__":
    main()
