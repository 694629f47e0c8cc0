"""Experiment directory + logging.

Counterpart of OptInit._generate_exp_directory / _configure_logger
(cad_recognition/config.py:112-172): timestamped+uuid experiment dir with a
source-code snapshot, file+stdout logging, and a scalar writer (TensorBoard
when available, JSONL always — TB is an optional dependency here).
"""

from __future__ import annotations

import glob
import json
import logging
import os
import shutil
import sys
import time
import uuid


def make_experiment_dir(root_dir: str, jobname: str, snapshot_globs=("*.py",)) -> dict:
    stamp = time.strftime("%Y%m%d-%H%M%S")
    exp_dir = os.path.join(root_dir, f"{jobname}_{stamp}_{uuid.uuid4()}")
    ckpt_dir = os.path.join(exp_dir, "checkpoint")
    code_dir = os.path.join(exp_dir, "code")
    for d in (exp_dir, ckpt_dir, code_dir):
        os.makedirs(d, exist_ok=True)
    for pattern in snapshot_globs:
        for script in glob.glob(pattern):
            if os.path.isfile(script):
                shutil.copyfile(script, os.path.join(code_dir, os.path.basename(script)))
    return {"exp_dir": exp_dir, "ckpt_dir": ckpt_dir, "code_dir": code_dir}


def configure_logger(exp_dir: str, level: str = "info") -> None:
    logger = logging.getLogger()
    logger.setLevel(getattr(logging, level.upper()))
    fmt = logging.Formatter("%(asctime)s %(message)s")
    for handler in list(logger.handlers):
        logger.removeHandler(handler)
    fh = logging.FileHandler(
        os.path.join(exp_dir, os.path.basename(exp_dir) + ".log")
    )
    fh.setFormatter(fmt)
    logger.addHandler(fh)
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)


class ScalarWriter:
    """Scalar metrics sink: JSONL always; TensorBoard when importable
    (the reference logs every loss key + lr + test_value per iteration,
    train.py:297-305)."""

    def __init__(self, exp_dir: str, use_tensorboard: bool = True):
        self._jsonl = open(os.path.join(exp_dir, "scalars.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=exp_dir)
            except Exception:
                self._tb = None

    def add_scalar(self, tag: str, value, step: int):
        value = float(value)
        self._jsonl.write(json.dumps({"tag": tag, "value": value, "step": step}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def flush(self):
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
