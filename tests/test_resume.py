"""Checkpoint resume + mixup training + YOLaT++ end-to-end smoke tests."""

import os

import jax
import numpy as np
import pytest

from yolat_tpu.train.config import Config
from yolat_tpu.train.trainer import run_training


@pytest.mark.slow
class TestResume:
    def test_resume_continues_epochs(self, synthetic_root, tmp_path):
        cfg = Config(
            data_dir=synthetic_root, batch_size=3, bbox_sampling_step=5,
            total_epochs=2, eval_start=99, data_aug=False, lr=1e-3,
            root_dir=str(tmp_path / "log1"), print_freq=100,
        )
        state1, res1 = run_training(cfg)
        ckpt_dir = os.path.join(res1["exp_dir"], "checkpoint")
        assert os.path.isdir(os.path.join(ckpt_dir, "ckpt_2"))

        cfg2 = cfg.replace(total_epochs=3, pretrained_model=ckpt_dir,
                           root_dir=str(tmp_path / "log2"))
        state2, res2 = run_training(cfg2)
        # resumed from epoch 2 -> exactly one more epoch of steps
        assert int(state2.step) > int(state1.step)
        assert int(state2.step) - int(state1.step) <= int(state1.step)


@pytest.mark.slow
class TestMixupTraining:
    def test_mixup_loader_trains(self, synthetic_root):
        from yolat_tpu.data.dataset import PackedLoader, SESYDDataset
        from yolat_tpu.train.loop import create_state, make_train_step
        from yolat_tpu.train.optim import make_optimizer

        ds = SESYDDataset(synthetic_root, "train", bbox_sampling_step=4,
                          do_mixup=True, cache=True)
        cfg = Config(n_classes=ds.n_classes, data_aug=False)
        loader = PackedLoader(ds, batch_size=2, n_devices=1, shuffle=False)
        batch = next(iter(loader))
        tx = make_optimizer("adam", 1e-3)
        state = create_state(cfg, tx, {k: v[0] for k, v in batch.items()},
                             jax.random.key(0))
        step = make_train_step(cfg, tx)
        state, metrics = step(state, batch, jax.random.key(1))
        assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
class TestYOLaTPPTrainer:
    def test_yolat_pp_through_trainer(self, synthetic_root, tmp_path):
        cfg = Config(
            data_dir=synthetic_root, batch_size=3, bbox_sampling_step=5,
            total_epochs=1, eval_start=1, data_aug=False, lr=1e-3,
            arch="yolat_pp", root_dir=str(tmp_path / "logpp"), print_freq=100,
        )
        state, results = run_training(cfg)
        assert np.isfinite(results["map_50"])
