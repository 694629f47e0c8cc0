"""Test driver (counterpart of cad_recognition/test.py): restore a
checkpoint and run the full eval protocol on a partition."""

import jax

from yolat_tpu.cli.common import build_parser, config_from_args
from yolat_tpu.data.dataset import PackedLoader, SESYDDataset
from yolat_tpu.eval.metrics import format_confusion
from yolat_tpu.eval.runner import evaluate
from yolat_tpu.train.checkpoint import CheckpointManager
from yolat_tpu.train.loop import create_state
from yolat_tpu.train.optim import make_optimizer


def load_checkpoint(cfg, example_batch, tag: str = "best"):
    tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
    state = create_state(cfg, tx, example_batch, jax.random.key(cfg.seed))
    if cfg.pretrained_model.endswith(".pth"):
        # a reference torch checkpoint: migrate its weights
        # (train/import_reference.py)
        from yolat_tpu.train.import_reference import state_from_pth

        return state_from_pth(state, cfg.pretrained_model,
                              n_blocks=cfg.n_blocks), 0, float("nan")
    ckpt = CheckpointManager(cfg.pretrained_model)
    state, epoch, best = ckpt.restore(state, tag=tag)
    return state, epoch, best


def main(argv=None):
    p = build_parser("yolat_tpu evaluation")
    p.add_argument("--serve_mode", default="flax",
                   choices=("flax", "fast", "fast_bf16"),
                   help="flax = parity path; fast/fast_bf16 = folded-BN "
                        "serving engine (bf16 is the TPU serving default)")
    args = p.parse_args(argv)
    cfg = config_from_args(args, argv)
    partition = cfg.phase if cfg.phase in ("train", "test", "val") else "test"

    ds = SESYDDataset(cfg.data_dir, partition,
                      bbox_sampling_step=cfg.bbox_sampling_step)
    cfg = cfg.replace(n_classes=ds.n_classes)
    from yolat_tpu.eval.fast_forward import extra_plans_for

    loader = PackedLoader(ds, batch_size=cfg.batch_size,
                          n_devices=cfg.n_devices, shuffle=False, dense=True,
                          extra_plans=extra_plans_for(cfg))

    example = {k: v[0] for k, v in next(iter(loader)).items()}
    state, epoch, best = load_checkpoint(cfg, example)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    mesh = None
    if cfg.n_devices > 1:
        import numpy as np
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()[: cfg.n_devices]), ("data",))
    results = evaluate(cfg, variables, loader, verbose=True,
                       serve=args.serve_mode, mesh=mesh)
    print(format_confusion(results["confusion"], ds.class_dict))
    print(f"checkpoint epoch={epoch} best={best:.4f}")


if __name__ == "__main__":
    main()
