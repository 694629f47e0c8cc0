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
import numpy as np

_NEG_INF = -1e30
POOL_BLOCK = 8
# super-edge clique runs align to a smaller block: runs average ~4.5 rows,
# so block-8 alignment inflated the buffer 2.45x (280k -> 510k at bench
# scale) and the extra MLP/gather rows ate the scatter savings; block 4
# keeps inflation ~1.5x while the aggregation scatter still shrinks 4x
SUPER_BLOCK = 4


# ---------------------------------------------------------------------------
# two-level pooling plan for CONTIGUOUS sorted segments (node -> proposal
# pools: bbox_idx runs average ~32 rows). XLA's TPU scatter runs far below
# HBM bandwidth (4.7 ms for a [137k, 1152] bf16 segment-max vs a 0.4 ms
# read pass, measured on v5e); a masked block-reduce (dense reshape-max at
# full bandwidth) followed by a ~2.6x smaller scatter over full-block owners
# + boundary rows recovers most of it. The plan depends only on the segment
# ids, is numpy-computed once per packed batch on the host, and keeps every
# device shape static.
# ---------------------------------------------------------------------------


def pool_plan(segment_ids: np.ndarray, num_segments: int,
              block: int = POOL_BLOCK, cap: int | None = None) -> dict:
    """Host-side plan for two-level segment reductions over sorted,
    contiguous ids. Returns arrays (prefix `pool_`):

      blk_first [NB] i32   segment id of each block's first row (sorted)
      blk_full  [NB] bool  block lies entirely in one segment
      bnd_rows  [CAP] i32  rows of non-full blocks, padded with 0
      bnd_seg   [CAP] i32  their segment ids, padded with num_segments - 1
      bnd_mask  [CAP] bool

    CAP defaults to min(NB, num_segments) * block — a static worst case:
    every non-full block contains at least one segment boundary, and there
    are at most num_segments - 1 of those. Callers that guarantee block-
    aligned segment runs (CompactFile packing) pass a tiny explicit cap;
    an AssertionError here means that guarantee was broken.

    Pass cap=0 to assert FULL block alignment (zero straddling blocks):
    the boundary arrays come out 0-length, a static shape property that
    routes both the forward (_two_level) and the custom VJPs through the
    boundary-free fast path (block gather + broadcast instead of per-row
    [N, C] gathers — the segment-max backward's two [N, 1152] gathers and
    their layout copies were ~20% of the bf16 train step on v5e).
    """
    seg = np.asarray(segment_ids, np.int32)
    n = seg.shape[0]
    assert n % block == 0, f"n={n} not divisible by block={block}"
    nb = n // block
    s2 = seg.reshape(nb, block)
    blk_first = s2[:, 0].copy()
    blk_full = s2[:, 0] == s2[:, -1]
    if cap is None:
        cap = min(nb, num_segments) * block
    rows = np.nonzero(np.repeat(~blk_full, block))[0].astype(np.int32)
    assert len(rows) <= cap, (len(rows), cap)
    bnd_rows = np.zeros(cap, np.int32)
    bnd_seg = np.full(cap, num_segments - 1, np.int32)
    bnd_mask = np.zeros(cap, bool)
    bnd_rows[: len(rows)] = rows
    bnd_seg[: len(rows)] = seg[rows]
    bnd_mask[: len(rows)] = True
    return {
        "pool_blk_first": blk_first,
        "pool_blk_full": blk_full,
        "pool_bnd_rows": bnd_rows,
        "pool_bnd_seg": bnd_seg,
        "pool_bnd_mask": bnd_mask,
    }



def plan_of(batch: dict):
    """Extract the pool plan tuple from a packed batch, or None.

    Returns None when the plan is absent or stale (node count no longer
    matches NB * POOL_BLOCK — e.g. a batch re-padded after pack time), so
    callers fall back to the plain scatter path."""
    if "pool_blk_first" not in batch:
        return None
    n = batch["pos"].shape[0]
    if batch["pool_blk_first"].shape[0] * POOL_BLOCK != n:
        return None
    return (batch["pool_blk_first"], batch["pool_blk_full"],
            batch["pool_bnd_rows"], batch["pool_bnd_seg"],
            batch["pool_bnd_mask"])


def sup_plan_of(batch: dict):
    """Extract the SUPER-edge pool plan (sup_pool_* keys — the 8-aligned
    clique-run plan built by data/packing) from a batch, or None when
    absent or stale, same contract as plan_of."""
    if "sup_pool_blk_first" not in batch:
        return None
    s = batch["edge_super"].shape[0]
    if batch["sup_pool_blk_first"].shape[0] * SUPER_BLOCK != s:
        return None
    return (batch["sup_pool_blk_first"], batch["sup_pool_blk_full"],
            batch["sup_pool_bnd_rows"], batch["sup_pool_bnd_seg"],
            batch["sup_pool_bnd_mask"])


def _plan_aligned(plan) -> bool:
    """True for plans built with cap=0 (every block lies in one segment) —
    a STATIC shape property, so jit can branch on it."""
    return plan[2].shape[0] == 0


def _block_rows(a, plan, n):
    """Per-segment array [S, ...] -> per-row [n, ...] via block gather +
    in-register broadcast. Valid ONLY for aligned plans (uniform segment id
    within each block): replaces an [n, C] row gather with an 8x smaller
    [NB, C] gather whose broadcast fuses into the consumer."""
    blk_first = plan[0]
    nb = blk_first.shape[0]
    b = n // nb
    blk = a[blk_first]
    return jnp.broadcast_to(
        blk[:, None], (nb, b) + a.shape[1:]
    ).reshape((n,) + a.shape[1:])


def segment_broadcast(values, segment_ids, n: int, plan=None):
    """Per-segment values [S, ...] -> per-row [n, ...] (values[segment_ids]).

    With an ALIGNED plan (pool_plan cap=0) this routes through the block
    gather + in-register broadcast instead of an n-row gather: XLA row
    gathers cost ~7 ns/row regardless of row bytes, so an s32[72704]
    per-node gather measures ~0.5 ms on v5e while the [NB]=n/8 block
    form is ~8x cheaper and the broadcast fuses into the consumer."""
    if plan is not None and _plan_aligned(plan):
        return _block_rows(values, plan, n)
    return values[segment_ids]


def _two_level(data, mask, plan, num_segments: int, op, neutral):
    """Reduce `data` (rows where ~mask treated as `neutral`) per segment via
    the block plan. op in {'max', 'sum'}.

    The mask is applied independently inside each consumer (block reduce,
    boundary gather) instead of materialising a masked [N, C] copy: with
    two consumers XLA would have to write the select result to HBM — an
    extra full read+write at pool scale."""
    blk_first, blk_full, bnd_rows, bnd_seg, bnd_mask = plan
    n = data.shape[0]
    nb = blk_first.shape[0]
    b = n // nb
    tail = (1,) * (data.ndim - 1)
    blocks = data.reshape((nb, b) + data.shape[1:])
    bmask = _expand(mask, data).reshape((nb, b) + tail)
    aligned = _plan_aligned(plan)
    if op == "max":
        bred = jnp.where(bmask, blocks, neutral).max(axis=1)
        if aligned:  # no straddling blocks: one sorted scatter, no patch-up
            return jax.ops.segment_max(bred, blk_first,
                                       num_segments=num_segments,
                                       indices_are_sorted=True)
        fullm = blk_full.reshape((nb,) + tail)
        bred = jnp.where(fullm, bred, neutral)
        bnd = data[bnd_rows]
        bndm = (bnd_mask & mask[bnd_rows]).reshape((-1,) + tail)
        bnd = jnp.where(bndm, bnd, neutral)
        out = jax.ops.segment_max(bred, blk_first, num_segments=num_segments,
                                  indices_are_sorted=True)
        out2 = jax.ops.segment_max(bnd, bnd_seg, num_segments=num_segments,
                                   indices_are_sorted=True)
        return jnp.maximum(out, out2)
    bred = jnp.where(bmask, blocks, 0.0).sum(axis=1)
    if aligned:
        return jax.ops.segment_sum(bred, blk_first,
                                   num_segments=num_segments,
                                   indices_are_sorted=True)
    fullm = blk_full.reshape((nb,) + tail)
    bred = jnp.where(fullm, bred, 0.0)
    bnd = data[bnd_rows]
    bndm = (bnd_mask & mask[bnd_rows]).reshape((-1,) + tail)
    bnd = jnp.where(bndm, bnd, 0.0)
    out = jax.ops.segment_sum(bred, blk_first, num_segments=num_segments,
                              indices_are_sorted=True)
    out2 = jax.ops.segment_sum(bnd, bnd_seg, num_segments=num_segments,
                               indices_are_sorted=True)
    return out + out2


def _acc_dtype(data):
    """Accumulate low-precision floats (bf16/f16) in f32; segments can span
    hundreds of rows and narrow-float running sums drift."""
    if jnp.issubdtype(data.dtype, jnp.floating) and data.dtype != jnp.float64:
        return jnp.float32
    return data.dtype


def segment_sum(data, segment_ids, num_segments: int, mask=None,
                indices_are_sorted: bool = False, plan=None):
    orig_dtype = data.dtype
    if plan is not None:
        if mask is None:
            mask = jnp.ones(data.shape[0], dtype=bool)
        out = _plan_sum_vjp(data.astype(_acc_dtype(data)), mask,
                            segment_ids, plan, num_segments)
        return out.astype(orig_dtype)
    if mask is not None:
        data = jnp.where(_expand(mask, data), data, 0)
    out = jax.ops.segment_sum(
        data.astype(_acc_dtype(data)), segment_ids,
        num_segments=num_segments, indices_are_sorted=indices_are_sorted,
    )
    return out.astype(orig_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _plan_sum_vjp(data, mask, segment_ids, plan, num_segments):
    """Two-level masked sum with a custom VJP: the derivative of a segment
    sum is a plain row gather of the cotangent — independent of the
    forward's block/boundary decomposition, whose autodiff transpose would
    otherwise reintroduce scatters (measured 0.9 -> 7.4 ms fwd+bwd at
    [137k, 128] on v5e)."""
    return _two_level(data, mask, plan, num_segments, "sum", 0.0)


def _plan_sum_vjp_fwd(data, mask, segment_ids, plan, num_segments):
    out = _plan_sum_vjp(data, mask, segment_ids, plan, num_segments)
    return out, (mask, segment_ids, plan)


def _plan_sum_vjp_bwd(num_segments, res, g):
    mask, segment_ids, plan = res
    n = segment_ids.shape[0]
    if _plan_aligned(plan):
        rows = _block_rows(g, plan, n)  # 8x smaller gather, fused broadcast
    else:
        rows = g[segment_ids]
    dx = jnp.where(_expand(mask, rows), rows, 0)
    return dx, None, None, None


_plan_sum_vjp.defvjp(_plan_sum_vjp_fwd, _plan_sum_vjp_bwd)


def segment_mean(data, segment_ids, num_segments: int, mask=None,
                 indices_are_sorted: bool = False, plan=None, counts=None):
    """counts: optional precomputed per-segment row count [num_segments]
    (the number of mask-True rows per segment). Segment populations are
    static per batch, so pack time can provide them for free — the
    on-device count is itself a full-width scatter (~0.5 ms/step at
    [56k -> 72k] on v5e, the single largest forward scatter in the bf16
    train step). The caller owns consistency: pass counts=None whenever
    the mask is modified on-device (e.g. drop_edge)."""
    acc = _acc_dtype(data)
    if counts is not None and counts.shape[0] != num_segments:
        # stale pack-time counts (batch re-padded after pack time) — same
        # graceful fallback as plan_of for stale pool plans
        counts = None
    if plan is not None:
        if mask is None:
            mask = jnp.ones(data.shape[0], dtype=bool)
        total = _plan_sum_vjp(data.astype(acc), mask, segment_ids, plan,
                              num_segments)
        if counts is None:
            counts = jax.lax.stop_gradient(
                _two_level(jnp.ones(data.shape[0], acc), mask, plan,
                           num_segments, "sum", 0.0))
        count = jnp.maximum(counts.astype(acc), 1.0)
        return (total / _expand_count(count, total)).astype(data.dtype)
    if mask is not None:
        m = _expand(mask, data)
        data = jnp.where(m, data, 0)
        ones = jnp.where(mask, 1.0, 0.0).astype(acc)
    else:
        ones = jnp.ones(data.shape[0], dtype=acc)
    total = jax.ops.segment_sum(data.astype(acc), segment_ids,
                                num_segments=num_segments,
                                indices_are_sorted=indices_are_sorted)
    if counts is None:
        counts = jax.ops.segment_sum(ones, segment_ids,
                                     num_segments=num_segments,
                                     indices_are_sorted=indices_are_sorted)
    count = jnp.maximum(counts.astype(acc), 1.0)
    return (total / _expand_count(count, total)).astype(data.dtype)


def segment_max(data, segment_ids, num_segments: int, mask=None,
                indices_are_sorted: bool = False, plan=None):
    """Max-reduce; empty segments produce 0 (torch_scatter convention).

    `plan` (from pool_plan / plan_of) activates the two-level contiguous
    reduction — valid ONLY when segment_ids are sorted and contiguous (the
    bbox_idx contract).

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
    return _segment_max_core(data, mask, segment_ids, plan, num_segments,
                             indices_are_sorted)


# A scatter-free sorted segmented-max Pallas kernel lived here through
# round 2 (quarantined behind USE_SORTED_MAX_KERNEL=False). Re-measured
# decisively slower than the XLA scatter on the current toolchain
# (10.6 vs 4.6 ms at [131k, 1152] bf16 on v5e) and removed in round 3;
# the measurement record is in PERF.md ("On-chip measurement queue",
# graveyard note). The hot-path win against scatter remains the
# compare-based backward below, which works with any forward.


def _masked_max(data, mask, segment_ids, plan, num_segments,
                indices_are_sorted):
    if plan is not None:
        return None, _two_level(data, mask, plan, num_segments, "max",
                                _NEG_INF)
    masked = jnp.where(_expand(mask, data), data, _NEG_INF)
    raw = jax.ops.segment_max(masked, segment_ids,
                              num_segments=num_segments,
                              indices_are_sorted=indices_are_sorted)
    return masked, raw


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _segment_max_core(data, mask, segment_ids, plan, num_segments,
                      indices_are_sorted):
    _, raw = _masked_max(data, mask, segment_ids, plan, num_segments,
                         indices_are_sorted)
    return jnp.where(raw <= _NEG_INF / 2, 0.0, raw)


def _segment_max_fwd(data, mask, segment_ids, plan, num_segments,
                     indices_are_sorted):
    _, raw = _masked_max(data, mask, segment_ids, plan, num_segments,
                         indices_are_sorted)
    out = jnp.where(raw <= _NEG_INF / 2, 0.0, raw)
    return out, (data, mask, raw, segment_ids, plan)


def _segment_max_bwd(num_segments, indices_are_sorted, res, g):
    data, mask, raw, segment_ids, plan = res
    n = data.shape[0]
    if plan is not None and _plan_aligned(plan):
        # segment ids are uniform within each block: gather the per-block
        # owner rows ([NB, C], 8x smaller) and broadcast in-fusion instead
        # of materialising two [N, C] row gathers (+ their layout copies —
        # ~20% of the bf16 train step at [72k, 1152] on v5e)
        raw_rows = _block_rows(raw, plan, n)
        g_rows = _block_rows(g, plan, n)
    else:
        raw_rows = raw[segment_ids]
        g_rows = g[segment_ids]
    # empty segments have raw = -inf, which no valid (masked) row equals,
    # so their cotangent is dropped without an explicit `empty` select
    hit = (data == raw_rows) & _expand(mask, data)
    dx = jnp.where(hit, g_rows, 0).astype(data.dtype)
    return dx, None, None, None


_segment_max_core.defvjp(_segment_max_fwd, _segment_max_bwd)


def segment_max_concat(parts, segment_ids, num_segments: int, mask=None,
                       indices_are_sorted: bool = False, plan=None):
    """segment_max(concat(parts, axis=1)) WITHOUT the node-level concat:
    per-column max commutes with column concatenation, so pooling each part
    where it was produced and concatenating at segment granularity is
    exact — and skips materialising (and layout-copying) the [N, sum(C)]
    concat, which was ~1 ms/step of the bf16 train forward+backward at
    [72k, 1152] on v5e."""
    return jnp.concatenate(
        [segment_max(p, segment_ids, num_segments, mask=mask,
                     indices_are_sorted=indices_are_sorted, plan=plan)
         for p in parts], axis=1)


def segment_softmax(data, segment_ids, num_segments: int, mask=None,
                    indices_are_sorted: bool = False):
    """Per-segment softmax along axis 0 (torch_scatter scatter_softmax)."""
    if mask is not None:
        data = jnp.where(_expand(mask, data), data, _NEG_INF)
    seg_max = jax.ops.segment_max(data, segment_ids,
                                  num_segments=num_segments,
                                  indices_are_sorted=indices_are_sorted)
    seg_max = jnp.where(seg_max <= _NEG_INF / 2, 0.0, seg_max)
    shifted = data - seg_max[segment_ids]
    e = jnp.exp(shifted)
    if mask is not None:
        e = jnp.where(_expand(mask, data), e, 0.0)
    denom = jax.ops.segment_sum(e, segment_ids, num_segments=num_segments,
                                indices_are_sorted=indices_are_sorted)
    denom = jnp.maximum(denom, 1e-16)
    return e / denom[segment_ids]


def _expand(mask, data):
    """Broadcast a [E] mask against [E, ...] data."""
    return mask.reshape(mask.shape + (1,) * (data.ndim - mask.ndim)).astype(bool)


def _expand_count(count, data):
    return count.reshape(count.shape + (1,) * (data.ndim - count.ndim))
