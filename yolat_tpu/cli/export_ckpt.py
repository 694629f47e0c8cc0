"""Export a trained checkpoint to the reference's torch .pth format.

The inverse of the `--pretrained_model foo.pth` migration path: a model
trained here can be handed back to the reference's own drivers
(cad_recognition/test.py restores `{postname}_{epoch}.pth` /
`_best.pth` dicts, utils/ckpt_util.py:27-111).

    python -m yolat_tpu.cli.export_ckpt --pretrained_model <ckpt_dir> \
        --n_classes 17 --out exported_best.pth

Needs no dataset: the parameter structure is instantiated from a
structure-only toy batch, then overwritten by the restored checkpoint.
"""

import jax

from yolat_tpu.cli.common import build_parser, config_from_args
from yolat_tpu.data.toy import random_packed_batch
from yolat_tpu.train.checkpoint import CheckpointManager
from yolat_tpu.train.import_reference import save_reference_checkpoint
from yolat_tpu.train.loop import create_state
from yolat_tpu.train.optim import make_optimizer


def main(argv=None):
    p = build_parser("export a checkpoint to reference .pth format")
    p.add_argument("--out", required=True, type=str,
                   help="output .pth path")
    p.add_argument("--n_classes", default=17, type=int,
                   help="classes incl. background (17 floorplans / "
                        "22 diagrams)")
    p.add_argument("--tag", default="best", type=str,
                   help="checkpoint tag to restore (best / an epoch number)")
    args = p.parse_args(argv)
    cfg = config_from_args(args, argv).replace(n_classes=args.n_classes,
                                         data_aug=False)

    batch, _ = random_packed_batch(seed=0, n_images=1, ccs_per_image=2,
                                   n_classes=cfg.n_classes, step=4)
    tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
    state = create_state(cfg, tx, batch, jax.random.key(cfg.seed))
    state, epoch, best = CheckpointManager(cfg.pretrained_model).restore(
        state, tag=args.tag
    )
    variables = jax.device_get(
        {"params": state.params, "batch_stats": state.batch_stats}
    )
    save_reference_checkpoint(variables, args.out, n_blocks=cfg.n_blocks,
                              epoch=epoch)
    print(f"exported {cfg.pretrained_model} (tag {args.tag}, epoch {epoch}, "
          f"best {best:.4f}) -> {args.out}")


if __name__ == "__main__":
    main()
