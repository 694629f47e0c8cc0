"""Sibling-ordering guard for the IoU-aware loss (VALIDATION.md rounds 4-5).

The labeler marks ANY proposal with IoU > 0.7 positive (geom/proposals.py
IOU_LABEL_TH, parity with Datasets/graph_dict3.py:625-641), so several
"sibling" proposals of one GT train toward the same hard target and
nothing orders them at NMS time. The quality-focal soft target
{class: IoU, background: 1-IoU} (nn/model.detection_loss label_iou) fixes
the ordering — but the two measured gates point opposite directions:

  floorplans n32 (sibling IoU spread ~0.2):   +both metrics
  charts step-20 (spread ~0.02, IoU~0.5 thin boxes): -both metrics

This test pins the MECHANISM of both results at the loss level, by
optimizing free per-proposal logits through the real detection_loss to
its fixed point (the per-proposal optimum a capacity-rich model trains
toward) and comparing the orderings/margins the two losses induce. It
fails if a loss change regresses sibling ordering in the wide-spread
regime, or silently changes the positive-score starvation trade in the
flat-spread regime.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from yolat_tpu.nn.model import detection_loss

K = 4  # 3 foreground classes + background
BG = K - 1


def _fixed_point_probs(labels, label_iou, steps=600, lr=0.2):
    """Optimize free logits under detection_loss; return softmax probs."""
    labels = jnp.asarray(labels, jnp.int32)
    n = labels.shape[0]
    mask = jnp.ones((n,), bool)
    liou = None if label_iou is None else jnp.asarray(label_iou, jnp.float32)
    tx = optax.adam(lr)

    def loss_fn(lg):
        return detection_loss(lg, labels, mask, label_iou=liou)["loss"]

    @jax.jit
    def step(lg, opt):
        g = jax.grad(loss_fn)(lg)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(lg, up), opt

    logits = jnp.zeros((n, K), jnp.float32)
    opt = tx.init(logits)
    for _ in range(steps):
        logits, opt = step(logits, opt)
    return np.asarray(jax.nn.softmax(logits, axis=-1))


class TestWideSpreadRegime:
    """Floorplans-like siblings: IoUs [0.95, 0.80, 0.72] of one GT."""

    IOUS = [0.95, 0.80, 0.72]

    def _scores(self, iou_aware):
        labels = [0] * len(self.IOUS) + [BG]
        liou = self.IOUS + [1.0] if iou_aware else None
        p = _fixed_point_probs(labels, liou)
        return p[: len(self.IOUS), 0]

    def test_hard_ce_cannot_order_siblings(self):
        s = self._scores(iou_aware=False)
        # all siblings share the target -> scores tie; NMS picks on noise
        assert float(np.ptp(s)) < 1e-3

    def test_iou_aware_orders_siblings_by_quality(self):
        s = self._scores(iou_aware=True)
        assert (np.diff(s) < 0).all(), f"not IoU-ordered: {s}"
        # margins track the IoU gaps — comfortably above NMS jitter
        assert float(s[0] - s[1]) > 0.05 and float(s[1] - s[2]) > 0.03

    def test_iou_aware_margin_beats_hard_ce(self):
        hard = self._scores(iou_aware=False)
        soft = self._scores(iou_aware=True)
        assert float(soft[0] - soft[-1]) > 10 * float(abs(hard[0] - hard[-1]))


class TestFlatSpreadRegime:
    """Charts-like siblings: thin boxes at IoU [0.52, 0.50] — the regime
    where the step-20 gate measured the flag NEGATIVE on both metrics."""

    IOUS = [0.52, 0.50]

    def _probs(self, iou_aware):
        labels = [0] * len(self.IOUS) + [BG]
        liou = self.IOUS + [1.0] if iou_aware else None
        return _fixed_point_probs(labels, liou)

    def test_ordering_signal_is_negligible(self):
        p = self._probs(iou_aware=True)
        s = p[: len(self.IOUS), 0]
        # the spread buys <0.03 of ordering margin...
        assert float(s[0] - s[1]) < 0.03

    def test_positive_score_starvation(self):
        # ...while costing ~half the positive's absolute confidence: a
        # low-IoU positive trains toward {class: q~0.5, background: 0.5},
        # so its kept score drops far below the hard-CE fixed point and
        # TPs rank below other images' confident FPs in the AP sweep.
        hard = self._probs(iou_aware=False)[0, 0]
        soft = self._probs(iou_aware=True)[0, 0]
        assert float(hard) > 0.95
        assert float(soft) < 0.60
        assert float(hard - soft) > 0.3

    def test_trade_documented_in_validation(self):
        """The regression row and the domain-conditional guidance must
        stay recorded (VERDICT round-4 ledger defect guard)."""
        import os

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(root, "VALIDATION.md")) as f:
            text = f.read()
        assert "step 20 + iou_aware" in text
        assert "0.5839" in text  # the negative result's mAP@0.5


class TestRelativeMode:
    """cfg.iou_aware_mode='rel' (round 5): the sibling-RELATIVE quality
    target q_rel = IoU / best-sibling-IoU keeps the best sibling at the
    full hard target while preserving the ordering — designed to combine
    the wide-spread win with no flat-spread starvation."""

    def _probs(self, ious):
        best = max(ious)
        labels = [0] * len(ious) + [BG]
        q_rel = [q / best for q in ious] + [1.0]
        return _fixed_point_probs(labels, q_rel)

    def test_no_starvation_flat_regime(self):
        # charts-like: [0.52, 0.50] -> best sibling trains toward 1.0,
        # unlike absolute mode's ~0.5 (TestFlatSpreadRegime)
        p = self._probs([0.52, 0.50])
        assert float(p[0, 0]) > 0.9

    def test_ordering_preserved_wide_regime(self):
        # floorplans-like: ordering margins survive the normalisation
        p = self._probs([0.95, 0.80, 0.72])
        s = p[:3, 0]
        assert (np.diff(s) < 0).all(), f"not IoU-ordered: {s}"
        assert float(s[0] - s[1]) > 0.05 and float(s[1] - s[2]) > 0.03
        assert float(s[0]) > 0.9  # and the best sibling is unstarved


class TestSpreadThreshold:
    """The flag's domain of validity as a measurable property: ordering
    margin grows with sibling IoU spread; the crossover where margin
    exceeds NMS-jitter scale (~0.03) sits between the charts (~0.02) and
    floorplans (~0.2) spreads."""

    @pytest.mark.parametrize("spread,helps", [(0.02, False), (0.15, True)])
    def test_margin_vs_spread(self, spread, helps):
        ious = [0.70 + spread, 0.70]
        labels = [0, 0, BG]
        p = _fixed_point_probs(labels, ious + [1.0])
        margin = float(p[0, 0] - p[1, 0])
        assert (margin > 0.05) == helps, (spread, margin)
