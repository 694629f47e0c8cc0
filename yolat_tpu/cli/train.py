"""Train driver (counterpart of cad_recognition/train.py main)."""

from yolat_tpu.cli.common import build_parser, config_from_args
from yolat_tpu.train.trainer import run_training


def main(argv=None):
    args = build_parser("yolat_tpu training").parse_args(argv)
    cfg = config_from_args(args, argv).replace(phase="train")
    _, results = run_training(cfg)
    print(
        f"best test_value={results.get('best_value', 0):.4f} "
        f"MAP@0.5={results.get('map_50', 0):.4f} exp_dir={results.get('exp_dir')}"
    )


if __name__ == "__main__":
    main()
