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

The kernel is inference-only by design: training keeps the jnp path (XLA's
backward fusion + masked batch stats), serving uses this. Equivalence is
tested in interpreter mode in tests/test_pallas.py.
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
    """jnp reference implementation (same math, XLA-scheduled)."""
    n, d = nbr_idx.shape
    x_nbr = x[nbr_idx]  # [N, D, Ci]
    x_i = jnp.broadcast_to(x[:, None, :], x_nbr.shape)
    f = jnp.concatenate([x_i, x_nbr - x_i, nbr_attr], axis=-1)
    h = jnp.maximum(f @ w1 * sc1[0] + sc1[1], 0.0)
    h = jnp.maximum(h @ w2 * sc2[0] + sc2[1], 0.0)
    m = nbr_mask[..., None].astype(h.dtype)
    agg = (h * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)
    return agg + x @ wr + br.reshape(1, -1)
