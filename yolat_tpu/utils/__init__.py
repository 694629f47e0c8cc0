"""Shared utilities: meters, experiment directories, logging."""

from yolat_tpu.utils.meters import AverageMeter
from yolat_tpu.utils.experiment import make_experiment_dir, configure_logger
