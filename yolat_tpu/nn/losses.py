"""Auxiliary losses.

SmoothCrossEntropy: label-smoothed CE (utils/loss.py:5-24 in the reference —
shipped but unused by the canonical path; kept for surface parity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_cross_entropy(logits, labels, smoothing: float = 0.2, mask=None):
    """Label-smoothed cross entropy over [P, K] logits."""
    k = logits.shape[-1]
    on = 1.0 - smoothing
    off = smoothing / (k - 1)
    target = jax.nn.one_hot(labels, k) * (on - off) + off
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -(target * logp).sum(axis=-1)
    if mask is not None:
        m = mask.astype(nll.dtype)
        return (nll * m).sum() / jnp.maximum(m.sum(), 1.0)
    return nll.mean()
