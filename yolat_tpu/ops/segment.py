"""Masked segment reductions over padded, flat-packed graphs.

The TPU-native replacement for torch_scatter's scatter sum/mean/max and
scatter_softmax (used by the reference at
cad_recognition/architecture3cc_rpn_gp_iter2.py:67,122 and
gcn_lib/sparse/torch_message.py:52-58). Semantics preserved:

  * mean over an empty segment yields 0 (torch_scatter divides by
    clamp(count, min=1));
  * max over an empty segment yields 0 (torch_scatter initialises the
    output with zeros);
  * padded elements (mask == 0) contribute nothing.

All shapes are static; `num_segments` must be a Python int so the ops stay
jit-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def segment_sum(data, segment_ids, num_segments: int, mask=None,
                indices_are_sorted: bool = False):
    if mask is not None:
        data = jnp.where(_expand(mask, data), data, 0)
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments,
                               indices_are_sorted=indices_are_sorted)


def segment_mean(data, segment_ids, num_segments: int, mask=None,
                 indices_are_sorted: bool = False):
    if mask is not None:
        m = _expand(mask, data)
        data = jnp.where(m, data, 0)
        ones = jnp.where(mask, 1.0, 0.0)
    else:
        ones = jnp.ones(data.shape[0], dtype=data.dtype)
    total = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments,
                                indices_are_sorted=indices_are_sorted)
    count = jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments,
                                indices_are_sorted=indices_are_sorted)
    count = jnp.maximum(count, 1.0)
    return total / _expand_count(count, total)


def segment_max(data, segment_ids, num_segments: int, mask=None,
                indices_are_sorted: bool = False):
    """Max-reduce; empty segments produce 0 (torch_scatter convention)."""
    if mask is not None:
        data = jnp.where(_expand(mask, data), data, _NEG_INF)
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments,
                              indices_are_sorted=indices_are_sorted)
    return jnp.where(out <= _NEG_INF / 2, 0.0, out)


def segment_softmax(data, segment_ids, num_segments: int, mask=None):
    """Per-segment softmax along axis 0 (torch_scatter scatter_softmax)."""
    if mask is not None:
        data = jnp.where(_expand(mask, data), data, _NEG_INF)
    seg_max = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    seg_max = jnp.where(seg_max <= _NEG_INF / 2, 0.0, seg_max)
    shifted = data - seg_max[segment_ids]
    e = jnp.exp(shifted)
    if mask is not None:
        e = jnp.where(_expand(mask, data), e, 0.0)
    denom = jax.ops.segment_sum(e, segment_ids, num_segments=num_segments)
    denom = jnp.maximum(denom, 1e-16)
    return e / denom[segment_ids]


def _expand(mask, data):
    """Broadcast a [E] mask against [E, ...] data."""
    return mask.reshape(mask.shape + (1,) * (data.ndim - mask.ndim)).astype(bool)


def _expand_count(count, data):
    return count.reshape(count.shape + (1,) * (data.ndim - count.ndim))
