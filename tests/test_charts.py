"""Chart-VG config (BASELINE.json configs[5]): synthetic chart generator,
class vocabulary, end-to-end proposals, and the large-batch ICI-DP
training gate on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from yolat_tpu.data.dataset import PackedLoader, SESYDDataset
from yolat_tpu.data.synthetic import CHART_CLASSES, generate_chart, write_chart_dataset


@pytest.fixture(scope="module")
def chart_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("sesyd_chart")
    write_chart_dataset(str(root), n_train=8, n_test=2, seed=3,
                        width=900.0, height=700.0, n_series=1,
                        points_per_series=4)
    return str(root)


class TestChartPipeline:
    def test_mode_autodetect(self, chart_root):
        ds = SESYDDataset(chart_root, "train", bbox_sampling_step=10)
        assert ds.mode == "chart"
        assert ds.class_dict == CHART_CLASSES
        assert ds.n_classes == 7

    def test_generator_schema(self):
        rng = np.random.default_rng(0)
        svg, xml, gt, gl = generate_chart(rng, n_bars=4)
        assert "<svg" in svg and "<line" in svg
        assert len(gt) == len(gl) > 4
        # bars + legend + markers all present
        assert CHART_CLASSES["bar"] in gl
        assert CHART_CLASSES["legend-box"] in gl
        assert (gl < CHART_CLASSES["bar"]).any()  # some marker class
        # boxes well-formed
        assert (gt[:, 2] > gt[:, 0]).all() and (gt[:, 3] > gt[:, 1]).all()

    def test_proposals_cover_ground_truth(self, chart_root):
        """The proposal sweep must label at least one proposal per GT class
        present (the detectability precondition for the quality gate)."""
        ds = SESYDDataset(chart_root, "train", bbox_sampling_step=10)
        hit, want = set(), set()
        for i in range(4):
            pf, (gt, gl), _ = ds.load(i)
            want |= set(np.asarray(gl).tolist())
            labels = np.asarray(pf.labels)
            hit |= set(labels[labels != ds.n_classes - 1].tolist())
        missing = want - hit
        # markers and legend must always be coverable; bars are attached to
        # the axis skeleton and isolated by the sweep
        assert not missing, f"GT classes with no positive proposal: {missing}"


class TestChartDPGate:
    def test_large_batch_dp_training_step(self, chart_root):
        """Large-batch ICI data-parallel training on charts: global batch 8
        over the 8-device mesh, sync-BN + pmean grads; loss finite and
        params move identically to the semantics tested in test_model."""
        from jax.sharding import Mesh

        from yolat_tpu.data.dataset import stack_shards
        from yolat_tpu.train.config import Config
        from yolat_tpu.train.loop import create_state, make_dp_train_step
        from yolat_tpu.train.optim import make_optimizer

        ds = SESYDDataset(chart_root, "train", bbox_sampling_step=10)
        loader = PackedLoader(ds, batch_size=1, n_devices=8, shuffle=False,
                              dense=True)
        stacked = next(iter(loader))
        assert stacked["pos"].shape[0] == 8  # one shard per device

        cfg = Config(n_classes=ds.n_classes, data_aug=True)
        tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.weight_decay)
        single = {k: v[0] for k, v in stacked.items()}
        state = create_state(cfg, tx, single, jax.random.key(0))
        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        step = make_dp_train_step(cfg, tx, mesh)

        losses = []
        for it in range(12):
            state, m = step(state, stacked, jax.random.key(it))
            losses.append(float(m["loss"]))
        assert all(np.isfinite(losses)), losses
        # the model must actually be LEARNING the chart vocabulary: a real
        # decrease over 12 repeated-batch steps (any healthy model
        # overfits one batch fast; a frozen/broken one cannot pass this)
        assert min(losses[-3:]) < losses[0] * 0.8, losses
