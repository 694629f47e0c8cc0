"""CLI + trainer + checkpoint round-trip tests on the synthetic dataset."""

import json
import os
import shutil

import numpy as np
import pytest

from yolat_tpu.cli import detect as cli_detect
from yolat_tpu.cli import preprocess as cli_preprocess
from yolat_tpu.cli import test as cli_test
from yolat_tpu.cli import train as cli_train


class TestPreprocessOptions:
    def test_parallel_and_hierarchical(self, synthetic_root):
        """--workers and --hierarchical: same stats.pkl as serial, plus the
        YOLaT++ hierarchical graph sidecars."""
        import pickle

        cli_preprocess.main(
            ["--data_dir", synthetic_root, "--bbox_sampling_step", "5",
             "--workers", "2", "--hierarchical"]
        )
        with open(os.path.join(synthetic_root, "stats.pkl"), "rb") as f:
            stats_par = pickle.load(f)
        cli_preprocess.main(
            ["--data_dir", synthetic_root, "--bbox_sampling_step", "5"]
        )
        with open(os.path.join(synthetic_root, "stats.pkl"), "rb") as f:
            stats_ser = pickle.load(f)
        assert stats_par == stats_ser

        hier = [
            f
            for f in os.listdir(os.path.join(synthetic_root, "floorplans-syn"))
            if ".hier." in f and f.endswith(".pkl")
        ]
        assert len(hier) == 5
        with open(os.path.join(synthetic_root, "floorplans-syn", hier[0]),
                  "rb") as f:
            g = pickle.load(f)
        assert g["n_super_nodes"] == len(g["cc"])
        assert "super_shape" in g["edge"] and "super_super" in g["edge"]


class TestProfileFlag:
    """--profile yolat_pp_fast: the flagship bundle (VALIDATION.md rounds
    4-5) with the chart exception and explicit-flag precedence."""

    @staticmethod
    def _cfg(argv):
        from yolat_tpu.cli.common import build_parser, config_from_args

        return config_from_args(build_parser("t").parse_args(argv), argv)

    def test_bundle_applied(self):
        cfg = self._cfg(["--profile", "yolat_pp_fast",
                         "--data_dir", "data/FloorPlansGraph5_iter"])
        assert cfg.arch == "yolat_pp"
        assert cfg.pp_factored_prim is True
        assert cfg.iou_aware_loss is True

    def test_explicit_flag_wins(self):
        # even when the explicit value equals the parser default
        cfg = self._cfg(["--profile", "yolat_pp_fast",
                         "--iou_aware_loss", "false"])
        assert cfg.arch == "yolat_pp"
        assert cfg.iou_aware_loss is False
        cfg = self._cfg(["--profile", "yolat_pp_fast",
                         "--arch", "centernet3cc_rpn_gp_iter2"])
        assert cfg.arch == "centernet3cc_rpn_gp_iter2"
        assert cfg.pp_factored_prim is True

    def test_chart_recipe(self):
        # dense-sweep chart datasets get the measured-best round-5 recipe
        # (VALIDATION.md "Chart-VG at step 20": 0.619 -> 0.861 mAP@0.5)
        # instead of the floorplans abs-IoU target that lost there
        cfg = self._cfg(["--profile", "yolat_pp_fast",
                         "--data_dir", "data/charts-syn"])
        assert cfg.arch == "yolat_pp"
        assert cfg.pp_factored_prim is True
        assert cfg.iou_aware_loss is True
        assert cfg.iou_aware_mode == "rel"
        assert cfg.pos_class_weight == 16.0
        # non-chart data keeps the reference-exact loss weighting; the
        # quality-target mode is rel everywhere (bit-identical to abs on
        # floorplans — VALIDATION.md round 5)
        cfg = self._cfg(["--profile", "yolat_pp_fast"])
        assert cfg.pos_class_weight == 1.0
        assert cfg.iou_aware_mode == "rel"

    def test_chart_detection_scoped_to_dataset_name(self):
        # 'chart' in a PARENT directory (e.g. a user named chartrand) must
        # not silently switch training hyperparameters (review round 5)
        cfg = self._cfg(["--profile", "yolat_pp_fast",
                         "--data_dir", "/home/chartrand/FloorPlansGraph5"])
        assert cfg.pos_class_weight == 1.0
        assert cfg.iou_aware_loss is True  # the non-chart bundle applied
        # trailing slash on a real chart dir still detects
        cfg = self._cfg(["--profile", "yolat_pp_fast",
                         "--data_dir", "data/charts-syn/"])
        assert cfg.pos_class_weight == 16.0

    def test_no_profile_is_reference_faithful(self):
        cfg = self._cfg(["--data_dir", "data/FloorPlansGraph5_iter"])
        assert cfg.arch == "centernet3cc_rpn_gp_iter2"
        assert cfg.pp_factored_prim is False
        assert cfg.iou_aware_loss is False


class TestBucketedScanTraining:
    def test_buckets_with_scan_steps(self, synthetic_root, tmp_path):
        """buckets=2 + scan_steps=2: chunks group by full shape signature
        (mixing bucket shapes in one stack would raise in np.stack)."""
        from yolat_tpu.train.config import Config
        from yolat_tpu.train.trainer import run_training

        cfg = Config(
            data_dir=synthetic_root, batch_size=1, total_epochs=2,
            eval_start=99, lr=1e-3, data_aug=False, print_freq=1,
            bbox_sampling_step=5, root_dir=str(tmp_path / "log"),
            scan_steps=2, buckets=2,
        )
        _, results = run_training(cfg)
        assert "best_value" in results


class TestDPTrainer:
    def test_n_devices_2_end_to_end(self, synthetic_root, tmp_path):
        """run_training with n_devices=2 on the virtual mesh: DP train step
        + DP shard_map evaluation produce finite metrics."""
        from yolat_tpu.train.config import Config
        from yolat_tpu.train.trainer import run_training

        cfg = Config(
            data_dir=synthetic_root, batch_size=1, n_devices=2,
            total_epochs=1, eval_start=1, lr=1e-3, data_aug=False,
            print_freq=1, bbox_sampling_step=5,
            root_dir=str(tmp_path / "log"),
        )
        _, results = run_training(cfg)
        import numpy as np

        assert np.isfinite(results["map_all"])
        assert 0.0 <= results["top1_acc"] <= 1.0


class TestScannedTraining:
    def test_scan_steps_trains_and_logs(self, synthetic_root, tmp_path):
        """scan_steps>1: multi-step lax.scan dispatch path trains (loss
        decreases) and logs one scalar per step, remainder handled."""
        import json

        from yolat_tpu.train.config import Config
        from yolat_tpu.train.trainer import run_training

        cfg = Config(
            data_dir=synthetic_root, batch_size=1, total_epochs=2,
            eval_start=99, lr=1e-3, data_aug=False, print_freq=2,
            bbox_sampling_step=5, root_dir=str(tmp_path / "log"),
            scan_steps=2,
        )
        _, results = run_training(cfg)
        with open(os.path.join(results["exp_dir"], "scalars.jsonl")) as f:
            rows = [json.loads(line) for line in f]
        losses = [r["value"] for r in rows if r["tag"] == "loss"]
        # 3 train files x batch 1 x 2 epochs = 6 steps, all logged
        assert len(losses) == 6
        assert losses[-1] < losses[0]


@pytest.mark.slow
class TestCLIPipeline:
    def test_full_pipeline(self, synthetic_root, tmp_path):
        # 1. preprocess: caches graphs/proposals + writes stats.pkl
        cli_preprocess.main(
            ["--data_dir", synthetic_root, "--bbox_sampling_step", "5"]
        )
        assert os.path.exists(os.path.join(synthetic_root, "stats.pkl"))
        cached = [
            f
            for f in os.listdir(os.path.join(synthetic_root, "floorplans-syn"))
            if ".props5." in f and f.endswith(".pkl")
        ]
        assert len(cached) == 5  # 3 train + 2 test

        # 2. train two epochs with eval from epoch 1
        root_dir = str(tmp_path / "log")
        cli_train.main(
            [
                "--data_dir", synthetic_root,
                "--bbox_sampling_step", "5",
                "--batch_size", "3",
                "--total_epochs", "2",
                "--eval_start", "1",
                "--data_aug", "true",
                "--lr", "1e-3",
                "--root_dir", root_dir,
                "--print_freq", "1",
            ]
        )
        exp_dirs = os.listdir(root_dir)
        assert len(exp_dirs) == 1
        exp = os.path.join(root_dir, exp_dirs[0])
        ckpt_dir = os.path.join(exp, "checkpoint")
        assert os.path.isdir(os.path.join(ckpt_dir, "ckpt_best"))
        assert os.path.exists(os.path.join(exp, "scalars.jsonl"))
        with open(os.path.join(exp, "scalars.jsonl")) as f:
            tags = {json.loads(line)["tag"] for line in f}
        assert "loss" in tags

        # 3. test: restores best checkpoint and prints the metric table
        cli_test.main(
            [
                "--data_dir", synthetic_root,
                "--bbox_sampling_step", "5",
                "--batch_size", "2",
                "--pretrained_model", ckpt_dir,
                "--phase", "test",
            ]
        )

        # 4. detect: renders overlays
        out_dir = str(tmp_path / "det")
        cli_detect.main(
            [
                "--data_dir", synthetic_root,
                "--bbox_sampling_step", "5",
                "--pretrained_model", ckpt_dir,
                "--out_dir", out_dir,
                "--max_images", "1",
                "--conf_th", "0.0",
            ]
        )
        pngs = [f for f in os.listdir(out_dir) if f.endswith(".png")]
        assert len(pngs) == 1

        # 5. badcase renders (TP/FP/FN overlays)
        from yolat_tpu.cli import detect_badcase as cli_badcase

        bad_dir = str(tmp_path / "bad")
        cli_badcase.main(
            [
                "--data_dir", synthetic_root,
                "--bbox_sampling_step", "5",
                "--pretrained_model", ckpt_dir,
                "--out_dir", bad_dir,
                "--max_images", "1",
                "--conf_th", "0.0",
            ]
        )
        assert os.path.isdir(bad_dir)

        # 6. graph debug render + packing stats
        from yolat_tpu.cli import draw_graph as cli_draw

        g_dir = str(tmp_path / "graphs")
        cli_draw.main(
            ["--data_dir", synthetic_root, "--out_dir", g_dir,
             "--max_images", "1"]
        )
        assert any(f.endswith(".png") for f in os.listdir(g_dir))

        # 7. bulk inference: unannotated SVG dir -> detections JSONL
        # (restores the LATEST epoch; GT sidecars exist here but are not
        # required — require_gt=False path)
        from yolat_tpu.cli import infer as cli_infer

        out_jsonl = str(tmp_path / "dets.jsonl")
        cli_infer.main(
            [
                "--input_dir", os.path.join(synthetic_root, "floorplans-syn"),
                "--bbox_sampling_step", "5",
                "--batch_size", "3",
                "--pretrained_model", ckpt_dir,
                "--out", out_jsonl,
                "--conf_th", "0.0",
            ]
        )
        with open(out_jsonl) as f:
            lines = [json.loads(line) for line in f]
        assert len(lines) == 5  # all SVGs under the dir
        assert all("detections" in d and "file" in d for d in lines)

        # 8. infer from a reference .pth checkpoint (export -> serve): the
        # .pth form must be handled before any CheckpointManager touch
        from yolat_tpu.cli import export_ckpt as cli_export

        pth_path = str(tmp_path / "exported.pth")
        cli_export.main(
            ["--pretrained_model", ckpt_dir, "--out", pth_path,
             "--n_classes", "17", "--tag", "1"]
        )
        # mixed dir: one good SVG + one malformed one — --skip_errors
        # (default) must emit an error record and keep serving
        mix_dir = tmp_path / "mixed"
        mix_dir.mkdir()
        src = [f for f in os.listdir(os.path.join(synthetic_root,
                                                  "floorplans-syn"))
               if f.endswith(".svg")][0]
        shutil.copy(os.path.join(synthetic_root, "floorplans-syn", src),
                    mix_dir / "good.svg")
        (mix_dir / "bad.svg").write_text(
            '<svg width="10" height="10"><path d="XYZ 1 2"/></svg>')
        out_jsonl2 = str(tmp_path / "dets_pth.jsonl")
        cli_infer.main(
            [
                "--input_dir", str(mix_dir),
                "--bbox_sampling_step", "5",
                "--batch_size", "2",
                "--pretrained_model", pth_path,
                "--out", out_jsonl2,
                "--conf_th", "0.0",
            ]
        )
        with open(out_jsonl2) as f:
            recs = {json.loads(line)["file"]: json.loads(line)
                    for line in f}
        assert "error" in recs["bad.svg"]
        assert "detections" in recs["good.svg"]
