"""Standalone pipelined-e2e measurement (the bench e2e row) — relaunch
whenever the tunnel is healthy; writes artifacts_r5/e2e_measure.json."""
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import numpy as np  # noqa: F401

    import bench
    from yolat_tpu.cli.common import enable_compilation_cache
    from yolat_tpu.eval.fast_forward import fold_params
    from yolat_tpu.train.config import Config
    from yolat_tpu.train.loop import create_state
    from yolat_tpu.train.optim import make_optimizer

    enable_compilation_cache()
    ds, batches, _ = bench.build_workload()
    cfg = Config(n_classes=ds.n_classes, data_aug=False)
    tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
    single = {k: v[0] for k, v in batches[0].items()}
    state = create_state(cfg, tx, single, jax.random.key(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    folded = fold_params(variables, n_blocks=cfg.n_blocks)
    root = os.path.join(tempfile.gettempdir(), "yolat_bench_v1")
    r = bench.measure_e2e_pipeline(root, 10, cfg, variables, folded,
                                   jax.devices()[0], n_epochs=6)
    out = {"e2e_svgs_per_sec_pipelined_chunked": round(r, 2)}
    print(out, flush=True)
    os.makedirs("artifacts_r5", exist_ok=True)
    with open("artifacts_r5/e2e_measure.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
