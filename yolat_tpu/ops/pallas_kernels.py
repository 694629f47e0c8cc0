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
jnp path (XLA's backward fusion + masked batch stats). Equivalence is
tested in interpreter mode in tests/test_pallas.py.

(A scatter-free sorted segmented-max kernel lived here through round 2,
quarantined; it re-measured decisively slower than the XLA scatter on the
current toolchain — 10.6 vs 4.6 ms at [131k, 1152] bf16 — and was removed
in round 3. PERF.md keeps the measurement record.)
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
