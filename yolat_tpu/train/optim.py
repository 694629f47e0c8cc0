"""Optimizers and LR schedule.

Counterpart of the reference's optimizer setup: torch.optim.Adam with
coupled L2 weight decay + StepLR (cad_recognition/train.py:212-214), plus
the RAdam / AdamW variants shipped in utils/optim.py:6-207 (unused by the
canonical path but part of the surface).

torch Adam's `weight_decay` adds wd*param to the gradient *before* the
moment updates — in optax terms add_decayed_weights must precede
scale_by_adam (optax.adamw would decouple it, which is a different
optimizer).
"""

from __future__ import annotations

import optax


def steplr(base_lr: float, adjust_freq: int, decay_rate: float, steps_per_epoch: int):
    """StepLR(epoch-granular): lr * decay^(epoch // adjust_freq). The
    canonical config passes adjust_freq ~ 1e34 so this is constant in
    practice (README.md:47)."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return base_lr * (decay_rate ** (epoch // adjust_freq))

    return schedule


def make_optimizer(name: str, lr, weight_decay: float = 0.0,
                   b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """lr may be a float or an optax schedule."""
    name = name.lower()
    if name == "adam":
        parts = []
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        parts += [optax.scale_by_adam(b1=b1, b2=b2, eps=eps)]
        parts += [_scale_by_neg_lr(lr)]
        return optax.chain(*parts)
    if name == "adamw":
        return optax.adamw(lr, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay)
    if name == "radam":
        parts = []
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        parts += [optax.scale_by_radam(b1=b1, b2=b2, eps=eps), _scale_by_neg_lr(lr)]
        return optax.chain(*parts)
    raise NotImplementedError(f"optimizer {name}")


def _scale_by_neg_lr(lr):
    # always a schedule so the optimizer-state structure (and therefore the
    # checkpoint layout) is identical for constant and scheduled LR
    if callable(lr):
        return optax.scale_by_schedule(lambda step: -lr(step))
    return optax.scale_by_schedule(lambda step: -lr)
