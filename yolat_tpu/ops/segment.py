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

import functools

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def _acc_dtype(data):
    """Accumulate low-precision floats (bf16/f16) in f32; segments can span
    hundreds of rows and narrow-float running sums drift."""
    if jnp.issubdtype(data.dtype, jnp.floating) and data.dtype != jnp.float64:
        return jnp.float32
    return data.dtype


def segment_sum(data, segment_ids, num_segments: int, mask=None,
                indices_are_sorted: bool = False):
    if mask is not None:
        data = jnp.where(_expand(mask, data), data, 0)
    out = jax.ops.segment_sum(
        data.astype(_acc_dtype(data)), segment_ids,
        num_segments=num_segments, indices_are_sorted=indices_are_sorted,
    )
    return out.astype(data.dtype)


def segment_mean(data, segment_ids, num_segments: int, mask=None,
                 indices_are_sorted: bool = False):
    acc = _acc_dtype(data)
    if mask is not None:
        m = _expand(mask, data)
        data = jnp.where(m, data, 0)
        ones = jnp.where(mask, 1.0, 0.0).astype(acc)
    else:
        ones = jnp.ones(data.shape[0], dtype=acc)
    total = jax.ops.segment_sum(data.astype(acc), segment_ids,
                                num_segments=num_segments,
                                indices_are_sorted=indices_are_sorted)
    count = jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments,
                                indices_are_sorted=indices_are_sorted)
    count = jnp.maximum(count, 1.0)
    return (total / _expand_count(count, total)).astype(data.dtype)


def segment_max(data, segment_ids, num_segments: int, mask=None,
                indices_are_sorted: bool = False):
    """Max-reduce; empty segments produce 0 (torch_scatter convention).

    Uses a custom VJP with a compare-based backward:
    dx[n, c] = g[seg[n], c] iff data[n, c] equals its segment's max (pure
    gathers + one compare over [N, C]). Two rejected alternatives, both
    measured at [137k nodes, 1152 ch] detection scale on v5e:
      * XLA scatter backward (.at[rows, cols].add): serializes, ~25x slower;
      * saved-argmax single-winner backward (previous implementation): the
        per-(segment, column) argmax is a segment-min over an [N, C] int32
        iota that XLA defers into the backward — 13.7ms fwd+bwd vs 9.0ms
        for the compare form.
    Tie convention: ALL rows achieving the max receive the full cotangent
    (torch_scatter sends it to one winner). Exact float ties occur only on
    duplicated rows and post-relu zeros; relu'(z<0) = 0 kills the latter's
    leaked gradient upstream, and the training quality gate
    (scripts/validate_training.py) re-validated mAP under this convention.
    """
    if mask is None:
        mask = jnp.ones(data.shape[0], dtype=bool)
    return _segment_max_core(data, mask, segment_ids, num_segments,
                             indices_are_sorted)


def _masked_max(data, mask, segment_ids, num_segments, indices_are_sorted):
    masked = jnp.where(_expand(mask, data), data, _NEG_INF)
    raw = jax.ops.segment_max(masked, segment_ids, num_segments=num_segments,
                              indices_are_sorted=indices_are_sorted)
    return masked, raw


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _segment_max_core(data, mask, segment_ids, num_segments,
                      indices_are_sorted):
    _, raw = _masked_max(data, mask, segment_ids, num_segments,
                         indices_are_sorted)
    return jnp.where(raw <= _NEG_INF / 2, 0.0, raw)


def _segment_max_fwd(data, mask, segment_ids, num_segments,
                     indices_are_sorted):
    _, raw = _masked_max(data, mask, segment_ids, num_segments,
                         indices_are_sorted)
    out = jnp.where(raw <= _NEG_INF / 2, 0.0, raw)
    return out, (data, mask, raw, segment_ids)


def _segment_max_bwd(num_segments, indices_are_sorted, res, g):
    data, mask, raw, segment_ids = res
    # empty segments have raw = -inf, which no valid (masked) row equals,
    # so their cotangent is dropped without an explicit `empty` select
    hit = (data == raw[segment_ids]) & _expand(mask, data)
    dx = jnp.where(hit, g[segment_ids], 0).astype(data.dtype)
    return dx, None, None


_segment_max_core.defvjp(_segment_max_fwd, _segment_max_bwd)


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
