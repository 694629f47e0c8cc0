"""Fused TRAINING pool head: Dense -> masked BatchNorm(train) -> relu ->
per-proposal segment-max, with no [N, H] HBM round-trips.

The pool head (fusion MLP [N, Cin=128] -> [N, H=1024] + proposal max,
architecture3cc_rpn_gp_iter2.py:60-69,122) is the largest remaining cost
of both train steps after the factored prim level (pp train decomp:
~4 ms/step, dominated by [N, 1024] HBM traffic — the forward writes the
MLP output, the BN stats pass re-reads it, and the backward re-reads it
twice more). This op removes every [N, H] materialisation:

FORWARD
  * BN train statistics in CLOSED FORM from the Gram matrix — for
    z = x@W + b over mask-valid rows (invalid rows zeroed):
        sum(z)     = (sum x)@W + n*b
        sum(z^2)_c = W_c^T (x^T x) W_c + 2 b_c ((sum x)@W)_c + n b_c^2
    so mean/var need one [Cin, Cin] Gram + two [Cin, H]-sized
    contractions in f32 — never an [N, H] pass. (MaskedBatchNorm computes
    the same E[z^2]-E[z]^2 moments in f32; the Gram form is the same f32
    accumulation, so the BN f32-stat guard holds.)
  * Normalisation + relu + block-max through the SERVING kernel
    (ops/pallas_kernels.folded_mlp_block_max) with runtime scale/shift
    [gamma/sigma, beta - mean*gamma/sigma + b*gamma/sigma] — the [N, H]
    activations live only in VMEM; HBM sees [N/8, H] block maxima,
    reduced by the aligned pool plan's sorted segment-max.

BACKWARD (custom VJP; cotangent gp [P, H] on the pooled output)
  Let sigma = sqrt(var+eps), z = x@W + b, xhat = (z-mean)/sigma,
  y = gamma*xhat + beta, a = relu(y). Segment-max ties follow
  ops/segment.segment_max: ALL rows achieving the segment max receive the
  cotangent. The kernel forms the gamma-free sparse row term
      u_i = winner_i * 1[y_i > 0] * gp[seg_i]            (u_i == dy_i)
  and the BN chain rule makes dz affine in z given per-channel sums:
      s_i  = u_i * gamma/sigma
      dz_i = s_i + mask_i * (c1 + c2 .* z_i)
      szc  = (sum(s*z) - mean*sum(s)) / sigma^2
      c2   = -szc/n,   c1 = -sum(s)/n - mean*c2
  so every dense contraction collapses to closed form:
      dW   = x^T s + sx (x) (c1 + b.*c2) + (S@W) diag(c2)
      db   = sum(s) + n*c1 + c2 .* sum(z)
      dx_i = s_i@W^T + mask_i*((c1 + b.*c2)@W^T) + x_i@(W diag(c2) W^T)
      dgamma = (sum(u*z) - mean*sum(u)) / sigma,  dbeta = sum(u)
  where sx = sum of masked x rows and S = x^T x ([Cin, Cin]). The only
  [N, H]-shaped work left — forming u/s, x^T s, s@W^T and the u-sums —
  streams through ONE Pallas kernel that recomputes z tile-by-tile in
  VMEM (recompute costs tiny MXU FLOPs; saving z would cost the very HBM
  traffic this op removes).

The pooled-output epilogue matches ops/segment.segment_max: empty
segments (all rows masked) produce 0. Requires an ALIGNED pool plan
(pool_plan cap=0 — the CompactFile packing guarantee) and N % 512 == 0;
callers fall back to the unfused path otherwise
(fused_pool_available()).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from yolat_tpu.ops.pallas_kernels import folded_mlp_block_max
from yolat_tpu.ops.segment import POOL_BLOCK, _plan_aligned

BN_EPS = 1e-5
_TILE = 512


def _stats(xm, maskf, w, b, axis_name=None):
    """Closed-form masked BN train moments of z = x@W + b (f32). With
    axis_name, the moments sync across the mesh axis (sync-BN — the exact
    psum set MaskedBatchNorm uses: count, sum z, sum z^2)."""
    xf = xm.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    n = maskf.sum()
    sx = xf.sum(axis=0)                       # [Cin] (LOCAL: row sums)
    sxw = sx @ wf                             # [H]
    gram = xf.T @ xf                          # [Cin, Cin] (LOCAL)
    zsum = sxw + n * bf
    zsq = ((wf * (gram @ wf)).sum(axis=0) + 2.0 * bf * sxw + n * bf * bf)
    if axis_name is not None:
        n = jax.lax.psum(n, axis_name)
        zsum = jax.lax.psum(zsum, axis_name)
        zsq = jax.lax.psum(zsq, axis_name)
    n = jnp.maximum(n, 1.0)
    mean = zsum / n
    var = jnp.maximum(zsq / n - mean * mean, 0.0)
    return mean, var, n, sx, gram


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_pool_train(x, maskf, w, b, gamma, beta, blk_first, n_prop: int,
                     interpret: bool = False, axis_name=None):
    """(x [N, Cin], maskf [N, 1] f32, Dense W [Cin, H] / b [H],
    BN gamma/beta [H], blk_first [N/8] i32 sorted block owners) ->
      pooled [P, H] (x.dtype), mean [H] f32, var [H] f32 (biased),
      count (f32 scalar — mask rows, psum'd under axis_name).

    mean/var/count are returned so the caller updates BN running
    statistics with MaskedBatchNorm's exact convention; they carry no
    gradient. axis_name syncs the batch moments (and the backward's
    global sums) across the mesh axis — the sync-BN DP semantics."""
    out, _ = _fwd(x, maskf, w, b, gamma, beta, blk_first, n_prop, interpret,
                  axis_name)
    return out


def _fwd(x, maskf, w, b, gamma, beta, blk_first, n_prop, interpret,
         axis_name):
    xm = x * maskf.astype(x.dtype)
    mean, var, n, sx, gram = _stats(xm, maskf, w, b, axis_name)
    inv = jax.lax.rsqrt(var + BN_EPS) * gamma.astype(jnp.float32)
    # gamma*(z-mean)/sigma + beta with the Dense bias folded:
    # (x@W)*inv + (b*inv + beta - mean*inv)
    sc = jnp.stack(
        [inv, b.astype(jnp.float32) * inv
         + beta.astype(jnp.float32) - mean * inv], axis=0)
    bred = folded_mlp_block_max(xm, maskf, w, sc, block=POOL_BLOCK,
                                interpret=interpret)
    raw = jax.ops.segment_max(bred.astype(jnp.float32), blk_first,
                              num_segments=n_prop, indices_are_sorted=True)
    pooled = jnp.where(raw <= -1e30 / 2, 0.0, raw).astype(x.dtype)
    res = (xm, maskf, w, b, gamma, beta, blk_first, mean, var, n, sx, gram,
           pooled)
    return (pooled, mean, var, n), res


def _bwd(n_prop, interpret, axis_name, res, cts):
    gp, _, _, _ = cts  # mean/var/count are stat outputs: no gradient path
    (xm, maskf, w, b, gamma, beta, blk_first, mean, var, n, sx, gram,
     pooled) = res
    gammaf = gamma.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    inv_sig = jax.lax.rsqrt(var + BN_EPS)
    inv = inv_sig * gammaf
    sc = jnp.stack(
        [inv, bf * inv + beta.astype(jnp.float32) - mean * inv], axis=0)

    # per-8-block rows of the pooled output + cotangent ([N/8, H] gathers
    # — 1/8 of N, the size class the two-level max backward already pays).
    # pooled stays in its STORED dtype: the kernel recomputes activations
    # in f32 and must compare at the precision the forward stored (bf16
    # winner detection would otherwise never fire — f32 recompute vs bf16
    # store differ in the rounded-away bits)
    pooled_b = pooled[blk_first]
    gp_b = jnp.asarray(gp, jnp.float32)[blk_first]

    dw_u, dx_s, usum_l, uzraw_l = _bwd_kernel_call(
        xm, maskf, w, sc, pooled_b, gp_b, interpret)
    # kernel emits gamma-free LOCAL u-sums with z' = x@W (no bias):
    #   usum = sum u,  uzraw = sum u*(x@W)  ->  sum u*z adds b*usum
    # and the gamma-folded LOCAL row contractions:
    #   dw_u = x^T (u*inv),  dx_s = (u*inv)@W^T
    if axis_name is not None:
        # mean/var are GLOBAL, so the BN backward's coupling constants
        # (c1/c2) come from GLOBAL sums (AD-of-psum semantics of the flax
        # composition); the param-grad partials (dW/db/dgamma/dbeta) stay
        # LOCAL — the DP loop pmeans them, exactly like every other param
        usum_g = jax.lax.psum(usum_l, axis_name)
        uzraw_g = jax.lax.psum(uzraw_l, axis_name)
    else:
        usum_g, uzraw_g = usum_l, uzraw_l
    uzsum_g = uzraw_g + bf * usum_g
    ssum_g = usum_g * inv
    szsum_g = uzsum_g * inv
    szc = (szsum_g - mean * ssum_g) / (var + BN_EPS)
    c2 = -szc / n
    c1 = -(ssum_g / n) - mean * c2

    n_l = jnp.maximum(maskf.sum(), 1.0)  # LOCAL mask count (db term)
    uzsum_l = uzraw_l + bf * usum_l
    dw = (dw_u
          + sx[:, None] * (c1 + bf * c2)[None, :]
          + (gram @ wf) * c2[None, :])
    db = usum_l * inv + n_l * c1 + c2 * (sx @ wf + n_l * bf)
    dgamma = (uzsum_l - mean * usum_l) * inv_sig
    dbeta = usum_l

    m2 = (wf * c2[None, :]) @ wf.T                  # [Cin, Cin]
    mrow = maskf.astype(jnp.float32)
    dx = (dx_s.astype(jnp.float32)
          + mrow * ((c1 + bf * c2) @ wf.T)[None, :]
          + xm.astype(jnp.float32) @ m2)
    # rows enter as xm = x*mask, so only masked rows' grads leave
    dx = (dx * mrow).astype(xm.dtype)
    dmaskf = jnp.zeros_like(maskf)
    return (dx, dmaskf, dw.astype(w.dtype), db.astype(b.dtype),
            dgamma.astype(gamma.dtype), dbeta.astype(beta.dtype), None)


fused_pool_train.defvjp(_fwd, _bwd)


def _bwd_kernel(x_ref, maskf_ref, w_ref, sc_ref, pooled_ref, gp_ref,
                dw_ref, dx_ref, acc_ref, *, block: int):
    g = pl.program_id(0)
    x = x_ref[:]                                   # [T, Cin]
    w = w_ref[:].astype(x.dtype)                   # [Cin, H]
    sc = sc_ref[:].astype(jnp.float32)             # [2, H]
    m = maskf_ref[:]                               # [T, 1] f32
    t = x.shape[0]
    nb = pooled_ref.shape[0]
    h = pooled_ref.shape[1]

    zraw = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    y = zraw * sc[0] + sc[1]
    a = jnp.maximum(y, 0.0)
    a = jnp.where(m > 0.0, a, -1e30)
    # winner compare happens at the FORWARD's stored precision: the f32
    # recompute must be rounded the way the forward kernel rounded before
    # the cross-block max, or bf16 winners never match. The compare
    # itself runs in f32 (Mosaic rejects bf16 equality on this target);
    # upcasting the two ROUNDED values is exact, so f32 equality of them
    # is equivalent to comparing in the stored dtype.
    aq = a.astype(pooled_ref.dtype).astype(jnp.float32)
    pr = jnp.broadcast_to(
        pooled_ref[:].astype(jnp.float32)[:, None, :],
        (nb, block, h)).reshape(t, h)
    gr = jnp.broadcast_to(gp_ref[:][:, None, :],
                          (nb, block, h)).reshape(t, h)
    u = jnp.where((aq == pr) & (y > 0.0), gr, 0.0)  # [T, H] f32 (== dy)
    s = (u * sc[0]).astype(x.dtype)

    dw_tile = jax.lax.dot_general(x, s, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    dx_ref[:] = jax.lax.dot_general(
        s, w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dx_ref.dtype)
    ones4 = jnp.ones((4, t), jnp.float32)
    u_sum4 = jax.lax.dot_general(ones4, u, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    uz_sum4 = jax.lax.dot_general(ones4, u * zraw, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    acc_tile = jnp.concatenate([u_sum4, uz_sum4], axis=0)  # [8, H]

    @pl.when(g == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    dw_ref[:] += dw_tile
    acc_ref[:] += acc_tile


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bwd_kernel_call(xm, maskf, w, sc, pooled_b, gp_b, interpret):
    nrows, ci = xm.shape
    h = w.shape[1]
    t = _TILE
    assert nrows % t == 0, (nrows, t)
    nb_pt = t // POOL_BLOCK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nrows // t,),
        in_specs=[
            pl.BlockSpec((t, ci), lambda g: (g, 0)),
            pl.BlockSpec((t, 1), lambda g: (g, 0)),
            pl.BlockSpec(w.shape, lambda g: (0, 0)),
            pl.BlockSpec(sc.shape, lambda g: (0, 0)),
            pl.BlockSpec((nb_pt, h), lambda g: (g, 0)),
            pl.BlockSpec((nb_pt, h), lambda g: (g, 0)),
        ],
        out_specs=[
            pl.BlockSpec((ci, h), lambda g: (0, 0)),
            pl.BlockSpec((t, ci), lambda g: (g, 0)),
            pl.BlockSpec((8, h), lambda g: (0, 0)),
        ],
    )
    kern = functools.partial(_bwd_kernel, block=POOL_BLOCK)
    dw_u, dx_s, acc = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((ci, h), jnp.float32),
                   jax.ShapeDtypeStruct((nrows, ci), xm.dtype),
                   jax.ShapeDtypeStruct((8, h), jnp.float32)),
        interpret=interpret,
    )(xm, maskf, w, sc, pooled_b, gp_b)
    return dw_u, dx_s, acc[0], acc[4]


def fused_pool_available(batch, plan) -> bool:
    """Static routing predicate: aligned pool plan + 512-divisible rows."""
    if plan is None or not _plan_aligned(plan):
        return False
    return batch["pos"].shape[0] % _TILE == 0
