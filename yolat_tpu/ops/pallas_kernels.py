"""Pallas TPU kernels for the hot conv path.

The canonical conv's inference pipeline per layer is

    f   = [x_i || x_j - x_i || e_attr]          [E, 2C+4]
    h1  = relu(BN(f @ W1 + b1))                 [E, C]
    h2  = relu(BN(h1 @ W2 + b2))                [E, C]
    agg = masked-mean over incoming edges       [N, C]
    out = agg + x @ Wr + br

On the dense neighbour layout (E = N*D) XLA materialises f, h1 and h2 in
HBM between the matmuls — at SESYD scale that is ~600MB of traffic per
layer against ~180MB of true input/output. The fused kernel below keeps the
whole per-block pipeline in VMEM: one read of x / x_nbr / attrs, one write
of out. BatchNorm is eval-mode (running stats) and pre-folded into
per-channel scale/shift (see eval/fast_forward.fold_mlp).

The fused message kernel is inference-only by design: training keeps the
jnp path (XLA's backward fusion + masked batch stats). The sorted
segmented-max kernel below serves BOTH training and serving forwards when
routed (ops/segment.USE_SORTED_MAX_KERNEL): the compare-based backward in
ops/segment.py only needs the forward maxima, so any forward
implementation slots in. Equivalence is tested in interpreter mode in
tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fused_message_kernel(x_ref, xnbr_ref, attr_ref, maskf_ref, invcnt_ref,
                          exp_ref, w1d_ref, w1b_ref, w1c_ref, sc1_ref,
                          w2_ref, sc2_ref, wr_ref, br_ref, out_ref):
    """One node block: message MLP + masked mean + skip, all in VMEM.

    Mosaic's vector layout engine rejects interleaved row-repeats and
    [Bn*D, Co] <-> [Bn, D*Co] shape casts, so the kernel is written purely
    in matmuls + elementwise ops:

      * the message input [x_i || x_nbr - x_i || attr] @ W1 is algebraically
        split: x_nbr @ W1b + attr @ W1c + expand(x @ (W1a - W1b)), where W1
        = [W1a; W1b; W1c] by input rows;
      * expand (per-node vector -> its D edge rows) and the neighbour-axis
        sum are one constant 0/1 matrix E [Bn*D, Bn] and its transpose,
        contracted on the MXU.

    Shapes (Bn node block, D neighbour slots, Ci/Co channels, A attr dims):
      x [Bn,Ci]  xnbr [Bn*D,Ci]  attr [Bn*D,A]  maskf [Bn*D,1]
      invcnt [Bn,1]  exp [Bn*D,Bn]  w1d [Ci,Co]  w1b [Ci,Co]  w1c [A,Co]
      sc1/sc2 [2,Co]  w2 [Co,Co]  wr [Ci,Co]  br [1,Co]  out [Bn,Co]
    """
    x = x_ref[:]
    e = exp_ref[:]
    cdt = x.dtype  # f32 or bf16 operands; every dot accumulates in f32

    s_i = jnp.dot(x, w1d_ref[:], preferred_element_type=jnp.float32)
    h = (
        jnp.dot(xnbr_ref[:], w1b_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(attr_ref[:], w1c_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(e, s_i.astype(cdt), preferred_element_type=jnp.float32)
    )
    h = jnp.maximum(h * sc1_ref[0, :] + sc1_ref[1, :], 0.0)
    h = jnp.dot(h.astype(cdt), w2_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h * sc2_ref[0, :] + sc2_ref[1, :], 0.0)

    h = h * maskf_ref[:]
    summed = jnp.dot(e.T, h.astype(cdt), preferred_element_type=jnp.float32)
    agg = summed * invcnt_ref[:]

    skip = jnp.dot(x, wr_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = agg + skip + br_ref[0, :]


@functools.partial(jax.jit, static_argnames=("block_n", "interpret", "bf16"))
def fused_dense_message(x, nbr_idx, nbr_attr, nbr_mask,
                        w1, sc1, w2, sc2, wr, br,
                        block_n: int = 256, interpret: bool = False,
                        bf16: bool = False):
    """Fused eval-mode canonical conv over the dense neighbour layout.

    Args:
      x        [N, Ci] node features (N multiple of block_n).
      nbr_idx  [N, D] int32, nbr_attr [N, D, A], nbr_mask [N, D].
      w1 [2Ci+A, Co]; sc1 [2, Co] folded BN (scale row 0, shift row 1 —
      shift already includes the Dense bias); w2 [Co, Co]; sc2 [2, Co];
      wr [Ci, Co]; br [1, Co].
      bf16     serve in bfloat16: matmul operands bf16 (half the HBM
               traffic, double MXU rate), every accumulation and the
               BN-scale epilogues in f32; output f32.

    Returns [N, Co].
    """
    n, ci = x.shape
    d = nbr_idx.shape[1]
    co = w1.shape[1]
    block_n = min(block_n, n)
    cdt = jnp.bfloat16 if bf16 else jnp.float32
    if n % block_n != 0:
        # pad sizes are multiples of 256/512 in practice; odd sizes take the
        # jnp reference path rather than a partial-block kernel
        return fused_dense_message_reference(
            x.astype(cdt), nbr_idx, nbr_attr.astype(cdt), nbr_mask,
            w1.astype(cdt), sc1, w2.astype(cdt), sc2, wr.astype(cdt), br
        ).astype(jnp.float32)

    x = x.astype(cdt)
    x_nbr = x[nbr_idx.reshape(-1)]  # XLA gather; [N*D, Ci]
    attr = nbr_attr.reshape(n * d, -1).astype(cdt)
    maskf = nbr_mask.reshape(n * d, 1).astype(jnp.float32)
    inv_cnt = 1.0 / jnp.maximum(
        nbr_mask.astype(jnp.float32).sum(axis=1, keepdims=True), 1.0
    )
    # weight split by input rows of W1 = [W1a; W1b; W1c]
    w1 = w1.astype(jnp.float32)
    w1a, w1b, w1c = w1[:ci], w1[ci : 2 * ci], w1[2 * ci :]
    w1d = w1a - w1b
    # expansion matrix: edge row (i*D + k) <- node row i
    exp_mat = jnp.repeat(jnp.eye(block_n, dtype=cdt), d, axis=0)

    grid = (n // block_n,)
    bd = block_n * d

    out = pl.pallas_call(
        _fused_message_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, ci), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bd, ci), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bd, attr.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bd, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bd, block_n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ci, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ci, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((attr.shape[1], co), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((co, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ci, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, co), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, co), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d * (w1.shape[0] * co + co * co) + 2 * n * ci * co,
            bytes_accessed=4 * (n * ci + n * d * ci + n * d * attr.shape[1] + n * co),
            transcendentals=0,
        ),
    )(
        x,
        x_nbr,
        attr,
        maskf,
        inv_cnt,
        exp_mat,
        w1d.astype(cdt), w1b.astype(cdt), w1c.astype(cdt),
        sc1.astype(jnp.float32),
        w2.astype(cdt), sc2.astype(jnp.float32),
        wr.astype(cdt), br.reshape(1, -1).astype(jnp.float32),
    )
    return out


_SEG_BIG = -1e30


def _segment_max_kernel(p0_ref, x_ref, ids_ref, mask_ref, rows_ref, out_ref,
                        *, block_n: int, ms: int):
    """One (column-tile, node-block) step of the sorted segmented max.

    Within the block: log-shift suffix-max constrained to equal segment ids
    (VMEM-local, log2(Bn) sweeps). The per-segment block maxima live at each
    segment's first row; they are gathered into a dense [Bn] local-segment
    tile with a 0/1 selection MATMUL built from an iota==rows compare (no
    per-row dynamic addressing), then combined into the resident output with
    one dynamic-slice read-modify-max at this block's first segment id.
    """
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        out_ref[:] = jnp.full_like(out_ref, _SEG_BIG)

    v = jnp.where(mask_ref[:] != 0, x_ref[:], jnp.asarray(_SEG_BIG, x_ref.dtype))
    ids = ids_ref[:]  # [Bn, 1] int32

    k = 1
    while k < block_n:
        pad_v = jnp.full((k, v.shape[1]), _SEG_BIG, v.dtype)
        pad_i = jnp.full((k, 1), -1, ids.dtype)
        v_shift = jnp.concatenate([v[k:], pad_v], axis=0)
        ids_shift = jnp.concatenate([ids[k:], pad_i], axis=0)
        v = jnp.where(ids_shift == ids, jnp.maximum(v, v_shift), v)
        k *= 2

    _rmw_segment_tile(p0_ref, rows_ref, out_ref, v, block_n, ms, i)


def _rmw_segment_tile(p0_ref, rows_ref, out_ref, v, block_n, ms, i):
    """Shared tail: gather per-segment block maxima (at segment-start rows)
    into a dense local tile via a 0/1 selection matmul, then one
    dynamic-slice read-modify-max into the resident output."""
    rows = rows_ref[0, 0, :]  # [MS] int32, -1 = no segment q starts here
    iota = jax.lax.broadcasted_iota(jnp.int32, (block_n, ms), 0)
    # one-hot COPY dots: must be bit-exact for the compare-based backward,
    # and run on f32 operands — the current Mosaic toolchain rejects bf16
    # matmuls whose internal tiling produces sub-128-row bf16 operand
    # tiles ("Bad lhs type"), and f32 represents every bf16 payload
    # exactly
    sel = (iota == rows[None, :]).astype(jnp.float32)  # [Bn rows, MS q]
    w = jnp.dot(sel.T, v.astype(jnp.float32),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST).astype(v.dtype)
    # q validity as a [MS, 1] column without any 1-bit reshape (Mosaic
    # rejects i1 minor-dim insertion): sel's column sum is 1 iff q starts
    valid_col = jnp.dot(sel.T, jnp.ones((block_n, 1), jnp.float32),
                        preferred_element_type=jnp.float32)
    w = jnp.where(valid_col > 0.5, w, jnp.asarray(_SEG_BIG, v.dtype))

    # p0 is pre-aligned to 8 on host (Mosaic requires 8-aligned dynamic
    # sublane starts); q indices already carry the alignment offset
    p0 = pl.multiple_of(p0_ref[i], 8)
    cur = out_ref[pl.ds(p0, ms), :]
    out_ref[pl.ds(p0, ms), :] = jnp.maximum(cur, w)


_MINI = 8


def _segment_max_kernel_2l(p0_ref, x_ref, ids_ref, mask_ref, rows_ref,
                           out_ref, *, block_n: int, ms: int):
    """Two-level in-block segmented suffix max.

    The flat log-shift sweep (log2(Bn) = 9 full-block compare passes) is
    VPU-bound; with contiguous runs it decomposes into
      1. 3 sweeps confined to 8-row mini-blocks (strides 1, 2, 4 with a
         mini-boundary gate),
      2. an MXU one-hot compaction of the 64 mini leaders,
      3. 6 sweeps over the [64, Ct] leader tile (1/8 the rows),
      4. a one-hot broadcast of each NEXT mini's leader suffix back to rows,
         id-gated, max-combined.
    Same per-segment block maxima at segment-start rows as the flat sweep —
    ~45% of its VPU element-ops.
    """
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        out_ref[:] = jnp.full_like(out_ref, _SEG_BIG)

    v = jnp.where(mask_ref[:] != 0, x_ref[:], jnp.asarray(_SEG_BIG, x_ref.dtype))
    ids = ids_ref[:]                       # [Bn, 1] int32
    neg = jnp.asarray(_SEG_BIG, v.dtype)

    row = jax.lax.broadcasted_iota(jnp.int32, (block_n, 1), 0)
    row_in_mini = jax.lax.rem(row, _MINI)

    # 1. intra-mini segmented suffix max (strides 1, 2, 4)
    for k in (1, 2, 4):
        v_shift = jnp.concatenate(
            [v[k:], jnp.full((k, v.shape[1]), _SEG_BIG, v.dtype)], axis=0)
        ids_shift = jnp.concatenate(
            [ids[k:], jnp.full((k, 1), -1, ids.dtype)], axis=0)
        ok = (ids_shift == ids) & (row_in_mini < _MINI - k)
        v = jnp.where(ok, jnp.maximum(v, v_shift), v)

    # 2. leader compaction: rows 0, 8, 16, ... are exactly
    # reshape(Bn, Ct) -> (NM, MINI, Ct) [:, 0, :] — a pure sublane
    # relayout, bit-exact by construction. (This replaced one-hot
    # compaction MATMULS: the current Mosaic toolchain rejects bf16
    # matmul tiles with sub-128-row operands — "Bad lhs type" on the
    # [NM=64, Bn] lhs — and the f32 fallback pushed the ct=384 config
    # over the 16 MB scoped-VMEM limit.)
    nm = block_n // _MINI
    ct = v.shape[1]
    lead = v.reshape(nm, _MINI, ct)[:, 0, :]           # [NM, Ct]
    lid = ids.reshape(nm, _MINI, 1)[:, 0, :]           # [NM, 1] int32

    # 3. segmented suffix max over leaders
    k = 1
    while k < nm:
        l_shift = jnp.concatenate(
            [lead[k:], jnp.full((k, lead.shape[1]), _SEG_BIG, lead.dtype)],
            axis=0)
        lid_shift = jnp.concatenate(
            [lid[k:], jnp.full((k, 1), -1, lid.dtype)], axis=0)
        lead = jnp.where(lid_shift == lid, jnp.maximum(lead, l_shift), lead)
        k *= 2

    # 4. broadcast each NEXT mini's leader suffix back to its rows:
    # row r needs lead[r // MINI + 1] — shift leaders up by one mini,
    # then expand each leader row MINI-fold with the inverse reshape
    lead_next = jnp.concatenate(
        [lead[1:], jnp.full((1, ct), _SEG_BIG, lead.dtype)], axis=0)
    lid_next = jnp.concatenate(
        [lid[1:], jnp.full((1, 1), -1, lid.dtype)], axis=0)
    bc = jnp.broadcast_to(lead_next[:, None, :],
                          (nm, _MINI, ct)).reshape(block_n, ct)
    nextid = jnp.broadcast_to(lid_next[:, None, :],
                              (nm, _MINI, 1)).reshape(block_n, 1)
    gate = nextid == ids
    v = jnp.maximum(v, jnp.where(gate, bc, neg))

    _rmw_segment_tile(p0_ref, rows_ref, out_ref, v, block_n, ms, i)


@functools.partial(jax.jit,
                   static_argnames=("num_segments", "block_n", "col_tile",
                                    "interpret", "ids_are_dense",
                                    "two_level", "keep_neg_inf"))
def segment_max_sorted_pallas(x, segment_ids, mask, num_segments: int,
                              block_n: int = 512, col_tile: int = 384,
                              interpret: bool = False,
                              ids_are_dense: bool = False,
                              two_level: bool = True,
                              keep_neg_inf: bool = False):
    """Masked segment max over SORTED segment ids, scatter-free.

    XLA lowers jax.ops.segment_max to a scatter-max that runs ~15x below
    HBM bandwidth at detection scale ([137k, 1152]: 4.8ms vs a 1.3ms read
    pass, measured on v5e). Sorted ids make the reduction a sequential-grid
    streaming problem: per node block, a VMEM suffix-max + one one-hot
    gather matmul + one dynamic-slice RMW into the resident output tile.

    MEASURED OUTCOME (v5e, [131k, 1152], mean run 32, 2026-08-17
    toolchain): bf16 ct=384 10.6ms (flat) / 11.3ms (two-level) vs XLA
    scatter 4.6ms; f32 ct=384 exceeds the 16MB scoped-VMEM limit (the
    one-hot copy dots must run on f32 operands — this Mosaic version
    rejects bf16 matmuls whose tiling yields sub-128-row bf16 tiles,
    "Bad lhs type"). An earlier toolchain measured the same kernel at
    scatter parity (f32 5.1 vs 5.3ms). Kept as an interpreter-verified
    alternative, NOT routed into the hot path (ops/segment.py
    USE_SORTED_MAX_KERNEL=False); the hot-path win against scatter came
    from the gather-compare backward there instead.

    Empty segments return 0 (torch_scatter convention). Falls back to the
    XLA path for shapes that don't tile. Sorted-but-GAPPED ids (interior
    empty segments) would overflow a block's local-id window, so ids are
    rank-densified first and results scattered back to the original slots;
    ids_are_dense=True (e.g. flat-packed proposal batches, whose ids are
    consecutive by construction) skips that remap.
    """
    n, c = x.shape
    if n % block_n != 0 or c % col_tile != 0:
        from yolat_tpu.ops.segment import segment_max

        return segment_max(x, segment_ids, num_segments, mask=mask,
                           indices_are_sorted=True)
    nb = n // block_n
    orig_ids = segment_ids.astype(jnp.int32)
    if ids_are_dense:
        ids = orig_ids
    else:
        change = jnp.concatenate(
            [jnp.ones(1, bool), orig_ids[1:] != orig_ids[:-1]]
        )
        ids = (jnp.cumsum(change) - 1).astype(jnp.int32)

    # per-block tables (tiny XLA scatter over int rows):
    #   p0[i] = first segment id of block i
    #   rows_by_q[i, q] = row-in-block where local segment q = pid - p0
    #   starts (-1 where q has no start in the block). q < block_n always:
    #   ids are sorted, so the id span within a block is bounded by the
    #   number of id changes, which is < block_n.
    ms = block_n + 128  # local-pid span + 8-alignment slack, 128-tiled
    row_in_blk = jnp.arange(n, dtype=jnp.int32) % block_n
    blk = jnp.arange(n, dtype=jnp.int32) // block_n
    prev = jnp.concatenate([ids[:1] - 1, ids[:-1]])
    start = (row_in_blk == 0) | (ids != prev)
    p0 = (ids[::block_n] // 8) * 8  # aligned dynamic-slice starts
    q = ids - p0[blk]               # < block_n + 8 <= ms
    rows_by_q = jnp.full((nb, ms), -1, jnp.int32).at[blk, q].max(
        jnp.where(start, row_in_blk, -1)
    )
    # Mosaic block-shape rule: last two dims of a VMEM block must be
    # (8k, 128k)-divisible — carry the table as [Nb, 8, MS] (row 0 used)
    rows_by_q = jnp.broadcast_to(rows_by_q[:, None, :], (nb, 8, ms))

    maskf = mask.astype(jnp.int32).reshape(n, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # p0 [Nb]
        grid=(c // col_tile, nb),
        in_specs=[
            pl.BlockSpec((block_n, col_tile), lambda j, i, p0: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda j, i, p0: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda j, i, p0: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, ms), lambda j, i, p0: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((num_segments + ms, col_tile),
                               lambda j, i, p0: (0, j),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(
            _segment_max_kernel_2l if two_level else _segment_max_kernel,
            block_n=block_n, ms=ms),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_segments + ms, c), x.dtype),
        interpret=interpret,
    )(p0, x, ids.reshape(n, 1), maskf, rows_by_q)
    out = out[:num_segments]
    # keep_neg_inf: leave empty segments at ~-1e30 so a caller's custom VJP
    # can distinguish an exact-zero maximum from an empty segment (the
    # compare backward matches data against raw; rewriting real zeros would
    # silently drop their gradients)
    empty_fill = jnp.asarray(_SEG_BIG if keep_neg_inf else 0.0, out.dtype)
    if not keep_neg_inf:
        out = jnp.where(out <= _SEG_BIG / 2, 0.0, out)
    if not ids_are_dense:
        # scatter rank rows back to their original (possibly gapped) ids;
        # unused rank slots target the dropped sentinel row
        orig_of_rank = jnp.full((num_segments,), num_segments,
                                jnp.int32).at[ids].min(orig_ids)
        tgt = jnp.where(orig_of_rank < num_segments, orig_of_rank,
                        num_segments)
        out = jnp.full((num_segments + 1, c), empty_fill, out.dtype).at[
            tgt].set(out)[:num_segments]
    return out


def fused_dense_message_reference(x, nbr_idx, nbr_attr, nbr_mask,
                                  w1, sc1, w2, sc2, wr, br):
    """jnp implementation (XLA-scheduled), with the stage-1 matmul split
    algebraically by W1's input rows: [x_i || x_nbr-x_i || attr] @ W1 =
    (x @ (W1a-W1b))_i + (x @ W1b)_nbr + attr @ W1c. The x-side matmuls run
    per NODE instead of per (node, neighbour) row — D-fold fewer MACs and
    no [N*D, 2Ci+A] concat materialisation; the gather moves AFTER the
    matmul (same bytes for Ci=Co, strictly fewer for Ci<Co)."""
    ci = x.shape[1]
    w1a, w1b, w1c = w1[:ci], w1[ci : 2 * ci], w1[2 * ci :]
    s_i = x @ (w1a - w1b)          # [N, Co]
    s_nbr = x @ w1b                # [N, Co]
    pre = s_nbr[nbr_idx] + nbr_attr @ w1c + s_i[:, None, :]
    h = jnp.maximum(pre * sc1[0] + sc1[1], 0.0)
    h = jnp.maximum(h @ w2 * sc2[0] + sc2[1], 0.0)
    m = nbr_mask[..., None].astype(h.dtype)
    agg = (h * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)
    return agg + x @ wr + br.reshape(1, -1)


# ---------------------------------------------------------------------------
# fused folded-MLP + block-max pool (serving head)
# ---------------------------------------------------------------------------


def _folded_mlp_block_max_kernel(x_ref, maskf_ref, w_ref, sc_ref, out_ref, *,
                                 block: int):
    x = x_ref[:]
    w = w_ref[:].astype(x.dtype)
    sc = sc_ref[:].astype(jnp.float32)
    m = maskf_ref[:]  # [R, 1] f32
    h = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = jnp.maximum(h * sc[0] + sc[1], 0.0)
    h = jnp.where(m > 0.0, h, -1e30)
    r = h.shape[0]
    out_ref[:] = h.reshape(r // block, block, -1).max(axis=1).astype(
        out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def folded_mlp_block_max(x, node_maskf, w, sc, block: int = 8,
                         interpret: bool = False):
    """relu((x @ w) * sc[0] + sc[1]) -> masked max over consecutive
    `block`-row groups, WITHOUT materialising the [N, H] MLP output.

    The serving head's fusion MLP (128 -> 1024 at ~73k rows) wrote a
    [N, 1024] bf16 array to HBM only for the aligned pool plan's block
    reduce to read it straight back (~750 us of the 3.4 ms serving step on
    v5e, xprof). This kernel keeps the MLP output in VMEM and writes the
    per-block maxima [N/block, H] — 1/block of the bytes. Fully-masked
    blocks come out at -1e30; the caller's segment_max + neutral fixup
    turns them into the torch_scatter empty convention (0), exactly like
    ops/segment._two_level.

    x [N, Cin] (f32/bf16), node_maskf [N, 1] f32, w [Cin, H],
    sc [2, H] (fold layout). Returns [N/block, H] in x.dtype.
    Reference counterpart: architecture3cc_rpn_gp_iter2.py:60-69,122.
    """
    n, ci = x.shape
    h = w.shape[1]
    r = 512
    assert n % r == 0 and r % block == 0, (n, r, block)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n // r,),
        in_specs=[
            pl.BlockSpec((r, ci), lambda g: (g, 0)),
            pl.BlockSpec((r, 1), lambda g: (g, 0)),
            pl.BlockSpec(w.shape, lambda g: (0, 0)),
            pl.BlockSpec(sc.shape, lambda g: (0, 0)),
        ],
        out_specs=pl.BlockSpec((r // block, h), lambda g: (g, 0)),
    )
    kern = functools.partial(_folded_mlp_block_max_kernel, block=block)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n // block, h), x.dtype),
        interpret=interpret,
    )(x, node_maskf, w, sc)


def _folded_mlp_block_max2_kernel(x_ref, maskf_ref, w_ref, sc_ref,
                                  outh_ref, outx_ref, *, block: int):
    x = x_ref[:]
    w = w_ref[:].astype(x.dtype)
    sc = sc_ref[:].astype(jnp.float32)
    m = maskf_ref[:]  # [R, 1] f32
    h = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = jnp.maximum(h * sc[0] + sc[1], 0.0)
    h = jnp.where(m > 0.0, h, -1e30)
    r = h.shape[0]
    outh_ref[:] = h.reshape(r // block, block, -1).max(axis=1).astype(
        outh_ref.dtype)
    xm = jnp.where(m > 0.0, x, jnp.asarray(-1e30, x.dtype))
    outx_ref[:] = xm.reshape(r // block, block, -1).max(axis=1).astype(
        outx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def folded_mlp_block_max2(x, node_maskf, w, sc, block: int = 8,
                          interpret: bool = False):
    """folded_mlp_block_max PLUS the per-block masked max of `x` itself.

    The serving head needs both pools of the same `cat` features: the
    fusion-MLP max (handled by folded_mlp_block_max) AND the raw-cat max
    (architecture3cc_rpn_gp_iter2.py:122 concatenates fusion(cat)-pool
    with cat-pool). The single-output kernel left the raw-cat pool as a
    second full [N, Cin] HBM read through the plan block reduce; this
    variant emits both per-block maxima from ONE read of `cat` —
    [N/block, H] and [N/block, Cin]. Same -1e30 masked-block convention;
    the caller's segment_max + neutral fixup applies to both halves.
    """
    n, ci = x.shape
    h = w.shape[1]
    r = 512
    assert n % r == 0 and r % block == 0, (n, r, block)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n // r,),
        in_specs=[
            pl.BlockSpec((r, ci), lambda g: (g, 0)),
            pl.BlockSpec((r, 1), lambda g: (g, 0)),
            pl.BlockSpec(w.shape, lambda g: (0, 0)),
            pl.BlockSpec(sc.shape, lambda g: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((r // block, h), lambda g: (g, 0)),
            pl.BlockSpec((r // block, ci), lambda g: (g, 0)),
        ],
    )
    kern = functools.partial(_folded_mlp_block_max2_kernel, block=block)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n // block, h), x.dtype),
                   jax.ShapeDtypeStruct((n // block, ci), x.dtype)),
        interpret=interpret,
    )(x, node_maskf, w, sc)
