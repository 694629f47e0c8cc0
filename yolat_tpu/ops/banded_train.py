"""Custom-VJP banded gather/scatter primitives (training path experiment).

Serving fuses message+aggregation in VMEM (ops/banded_message.py) because
eval-mode BN folds into scale/shift. Training cannot fuse: train-mode
BatchNorm needs batch statistics over the materialised per-edge
pre-activations (PERF.md finding 4 — why training stayed on XLA). What
training CAN reuse is the banded structure for the expensive endpoints:

  * the forward x-gathers ([E, C] rows at ~9 ns/row row-serialised on
    v5e) become one-hot MXU contractions against the banded x window;
  * the backward scatters (the transpose of those gathers, plus the
    aggregation's transpose) are the SAME banded contraction transposed —
    including the halo side, which decomposes into three window-aligned
    accumulators (own window + pad-row spill tiles into each neighbour).

Edge tensors live in the PLAN's block layout ([n_eb * eblk, C], padded
rows masked) end-to-end, so no permutations are needed between the
primitives and the elementwise MLP/BN stages; masked BN statistics over
plan-layout rows equal statistics over the real edge set.

  banded_gather(x, bm)        -> (x_own, x_oth)   VJP: banded scatters
  banded_scatter_own(rows, bm)-> [N, H] sums      VJP: banded own-gather

Reference counterpart: the gather/scatter machinery inside PyG
MessagePassing.propagate (gcn_lib/sparse/torch_vertex.py), fwd AND bwd.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _zero_plan_ct(bm):
    """Cotangent for the (non-differentiable) plan tuple: float0 for
    integer/bool leaves, zeros for float leaves (maskf, attr)."""
    import numpy as np

    def z(a):
        if jnp.issubdtype(a.dtype, jnp.floating):
            return jnp.zeros_like(a)
        return np.zeros(a.shape, jax.dtypes.float0)

    return jax.tree.map(z, bm)


def _prec(cdt):
    # one-hot copy dots: exact for bf16 at DEFAULT (unit coefficient, f32
    # accumulation); f32 payloads need HIGHEST (default f32 MXU rounds
    # through bf16 passes); Mosaic rejects HIGHEST on bf16 matmuls.
    return (jax.lax.Precision.HIGHEST if cdt == jnp.float32 else
            jax.lax.Precision.DEFAULT)


# --------------------------------------------------------------------------
# gather kernel: block-layout rows of x at the own / other endpoints
# --------------------------------------------------------------------------


def _gather_kernel(win_ref, first_ref, act_ref, xpre_ref, xmain_ref,
                   xpost_ref, own_ref, oth_ref, mkf_ref, own_out_ref,
                   oth_out_ref=None, *, wn, pad, eblk, ech,
                   own_only=False):
    g = pl.program_id(0)

    @pl.when(act_ref[g] == 0)
    def _zero():  # inactive blocks must not leak uninitialised HBM rows
        own_out_ref[:] = jnp.zeros_like(own_out_ref)
        if not own_only:
            oth_out_ref[:] = jnp.zeros_like(oth_out_ref)

    @pl.when(act_ref[g] == 1)
    def _body():
        xm = xmain_ref[:]
        cdt = xm.dtype
        bn = wn + 2 * pad
        hp = _prec(cdt)
        own_all = own_ref[0, 0]
        oth_all = oth_ref[0, 0]
        mk_all = mkf_ref[0, 0]
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (ech, wn), 1)
        dn = (((1,), (0,)), ((), ()))
        if not own_only:
            # the oth endpoint reads the full (wn + 2*pad) band; own-only
            # callers (banded_scatter_own's backward) skip the concat and
            # the wide contraction entirely — it doubles the kernel cost
            band = jnp.concatenate(
                [xpre_ref[:], xmain_ref[:], xpost_ref[:]], axis=0)
            iota_b = jax.lax.broadcasted_iota(jnp.int32, (ech, bn), 1)
        for c in range(eblk // ech):
            sl = slice(c * ech, (c + 1) * ech)
            mk = mk_all[sl][:, None].astype(jnp.float32)
            oh_own = (own_all[sl][:, None] == iota_w).astype(cdt)
            own_out_ref[sl, :] = jax.lax.dot_general(
                oh_own, xm, dn, precision=hp,
                preferred_element_type=jnp.float32) * mk
            if not own_only:
                oh_oth = (oth_all[sl][:, None] == iota_b).astype(cdt)
                oth_out_ref[sl, :] = jax.lax.dot_general(
                    oh_oth, band, dn, precision=hp,
                    preferred_element_type=jnp.float32) * mk


def _gather_impl(x, bm, interpret, ech, own_only=False):
    win, first, active, own, oth, attr, maskf, wn_tag, pad_tag = bm
    del attr
    wn, pad = wn_tag.shape[0], pad_tag.shape[0]
    n, c = x.shape
    n_eb, eblk = own.shape
    if eblk % min(ech, eblk) != 0:
        raise ValueError(
            f"plan eblk={eblk} must be a multiple of ech={min(ech, eblk)}: "
            "the kernel chunk loop would silently drop trailing edge rows")
    r = wn // pad
    npb = n // pad
    own3 = own.reshape(n_eb, 1, eblk)
    oth3 = oth.reshape(n_eb, 1, eblk)
    mk3 = maskf.reshape(n_eb, 1, eblk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_eb,),
        in_specs=[
            pl.BlockSpec((pad, c),
                         lambda g, w, f, a: (jnp.maximum(w[g] * r - 1, 0), 0)),
            pl.BlockSpec((wn, c), lambda g, w, f, a: (w[g], 0)),
            pl.BlockSpec((pad, c),
                         lambda g, w, f, a: (jnp.minimum(w[g] * r + r,
                                                         npb - 1), 0)),
            pl.BlockSpec((1, 1, eblk), lambda g, w, f, a: (g, 0, 0)),
            pl.BlockSpec((1, 1, eblk), lambda g, w, f, a: (g, 0, 0)),
            pl.BlockSpec((1, 1, eblk), lambda g, w, f, a: (g, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((eblk, c), lambda g, w, f, a: (g, 0))] * (
            1 if own_only else 2),
    )
    kern = functools.partial(_gather_kernel, wn=wn, pad=pad, eblk=eblk,
                             ech=min(ech, eblk), own_only=own_only)
    rows = n_eb * eblk
    out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((rows, c), jnp.float32)] * (
            1 if own_only else 2),
        interpret=interpret,
    )(win, first, active, x, x, x, own3, oth3, mk3)
    return out[0] if own_only else out


# --------------------------------------------------------------------------
# scatter kernels: block-layout rows -> per-node sums
# --------------------------------------------------------------------------


def _scatter_kernel(win_ref, first_ref, act_ref, rows_ref, own_ref,
                    oth_ref, mkf_ref, mid_ref, lo_ref=None, hi_ref=None, *,
                    wn, pad, eblk, ech, target_oth):
    g = pl.program_id(0)

    @pl.when(act_ref[g] == 1)
    def _body():
        rows = rows_ref[:]
        cdt = rows.dtype
        bn = wn + 2 * pad
        hp = _prec(cdt)
        h_dim = rows.shape[1]
        own_all = own_ref[0, 0]
        oth_all = oth_ref[0, 0]
        mk_all = mkf_ref[0, 0]
        acc_mid = jnp.zeros((wn, h_dim), jnp.float32)
        if target_oth:
            acc_lo = jnp.zeros((pad, h_dim), jnp.float32)
            acc_hi = jnp.zeros((pad, h_dim), jnp.float32)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (ech, wn), 1)
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (ech, bn), 1)
        dt = (((0,), (0,)), ((), ()))
        for c in range(eblk // ech):
            sl = slice(c * ech, (c + 1) * ech)
            v = (rows[sl] * mk_all[sl][:, None].astype(cdt)).astype(cdt)
            if target_oth:
                oh = (oth_all[sl][:, None] == iota_b).astype(cdt)
                acc_lo = acc_lo + jax.lax.dot_general(
                    oh[:, :pad], v, dt, precision=hp,
                    preferred_element_type=jnp.float32)
                acc_mid = acc_mid + jax.lax.dot_general(
                    oh[:, pad:pad + wn], v, dt, precision=hp,
                    preferred_element_type=jnp.float32)
                acc_hi = acc_hi + jax.lax.dot_general(
                    oh[:, pad + wn:], v, dt, precision=hp,
                    preferred_element_type=jnp.float32)
            else:
                oh = (own_all[sl][:, None] == iota_w).astype(cdt)
                acc_mid = acc_mid + jax.lax.dot_general(
                    oh, v, dt, precision=hp,
                    preferred_element_type=jnp.float32)

        first = first_ref[g]

        @pl.when(first == 1)
        def _init():
            mid_ref[:] = acc_mid
            if target_oth:
                lo_ref[0] = acc_lo
                hi_ref[0] = acc_hi

        @pl.when(first == 0)
        def _accum():
            mid_ref[:] = mid_ref[:] + acc_mid
            if target_oth:
                lo_ref[0] = lo_ref[0] + acc_lo
                hi_ref[0] = hi_ref[0] + acc_hi


def _scatter_call(rows, bm, n, target_oth, interpret, ech):
    win, first, active, own, oth, attr, maskf, wn_tag, pad_tag = bm
    del attr
    wn, pad = wn_tag.shape[0], pad_tag.shape[0]
    n_eb, eblk = own.shape
    if eblk % min(ech, eblk) != 0:
        raise ValueError(
            f"plan eblk={eblk} must be a multiple of ech={min(ech, eblk)}: "
            "the kernel chunk loop would silently drop trailing edge rows")
    h_dim = rows.shape[1]
    nw = n // wn
    own3 = own.reshape(n_eb, 1, eblk)
    oth3 = oth.reshape(n_eb, 1, eblk)
    mk3 = maskf.reshape(n_eb, 1, eblk)
    # own-side scatters land only inside their window: the lo/hi spill
    # outputs exist only in target_oth mode (a mid-only signature avoids
    # two dead uninitialised HBM allocations on the hot own path)
    out_specs = [pl.BlockSpec((wn, h_dim), lambda g, w, f, a: (w[g], 0))]
    out_shape = [jax.ShapeDtypeStruct((n, h_dim), jnp.float32)]
    if target_oth:
        out_specs += [
            pl.BlockSpec((1, pad, h_dim), lambda g, w, f, a: (w[g], 0, 0)),
            pl.BlockSpec((1, pad, h_dim), lambda g, w, f, a: (w[g], 0, 0)),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((nw, pad, h_dim), jnp.float32),
            jax.ShapeDtypeStruct((nw, pad, h_dim), jnp.float32),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_eb,),
        in_specs=[
            pl.BlockSpec((eblk, h_dim), lambda g, w, f, a: (g, 0)),
            pl.BlockSpec((1, 1, eblk), lambda g, w, f, a: (g, 0, 0)),
            pl.BlockSpec((1, 1, eblk), lambda g, w, f, a: (g, 0, 0)),
            pl.BlockSpec((1, 1, eblk), lambda g, w, f, a: (g, 0, 0)),
        ],
        out_specs=out_specs,
    )
    kern = functools.partial(_scatter_kernel, wn=wn, pad=pad, eblk=eblk,
                             ech=min(ech, eblk), target_oth=target_oth)
    out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(win, first, active, rows, own3, oth3, mk3)
    if not target_oth:
        return out[0]
    mid, lo, hi = out
    # spill tiles: lo[k] lands on the tail pad rows of window k-1, hi[k]
    # on the head pad rows of window k+1 — window-aligned adds, no scatter
    grid = mid.reshape(nw, wn, h_dim)
    lo_add = jnp.zeros_like(grid).at[:, wn - pad:, :].set(
        jnp.concatenate([lo[1:], jnp.zeros_like(lo[:1])], axis=0))
    hi_add = jnp.zeros_like(grid).at[:, :pad, :].set(
        jnp.concatenate([jnp.zeros_like(hi[:1]), hi[:-1]], axis=0))
    return (grid + lo_add + hi_add).reshape(n, h_dim)


# --------------------------------------------------------------------------
# public custom-VJP primitives
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def banded_gather(x, bm, interpret: bool = False, ech: int = 512):
    """(x_own, x_oth) [n_eb*eblk, C] f32 in the plan's block layout;
    padded/inactive rows are zero. Differentiable in x."""
    return tuple(_gather_impl(x, bm, interpret, ech))


def _gather_fwd(x, bm, interpret, ech):
    # dtype rides the residuals as a 0-sized sentinel (raw dtypes are not
    # JAX types); n rides as x.shape[0] via the sentinel's metadata too
    return tuple(_gather_impl(x, bm, interpret, ech)), (
        bm, jnp.zeros((x.shape[0], 0), x.dtype))


def _gather_bwd(interpret, ech, res, g):
    bm, sentinel = res
    n, dtype = sentinel.shape[0], sentinel.dtype
    g_own, g_oth = g
    dx = (_scatter_call(g_own.astype(dtype), bm, n, False, interpret, ech)
          + _scatter_call(g_oth.astype(dtype), bm, n, True, interpret, ech))
    return (dx.astype(dtype), _zero_plan_ct(bm))


banded_gather.defvjp(_gather_fwd, _gather_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def banded_scatter_own(rows, bm, n: int, interpret: bool = False,
                       ech: int = 512):
    """Per-node SUM of block-layout edge rows at the plan's own endpoint
    (masked). Differentiable in rows."""
    return _scatter_call(rows, bm, n, False, interpret, ech)


def _scatter_own_fwd(rows, bm, n, interpret, ech):
    return _scatter_call(rows, bm, n, False, interpret, ech), (
        bm, jnp.zeros((0,), rows.dtype))


def _scatter_own_bwd(n, interpret, ech, res, g):
    bm, sentinel = res
    dtype = sentinel.dtype
    # own-only: the oth gather's (wn+2*pad)-wide band contraction would
    # roughly double the backward cost for a discarded output
    g_rows = _gather_impl(g.astype(dtype), bm, interpret, ech,
                          own_only=True)
    return (g_rows.astype(dtype), _zero_plan_ct(bm))


banded_scatter_own.defvjp(_scatter_own_fwd, _scatter_own_bwd)


# --------------------------------------------------------------------------
# jnp oracles (tests)
# --------------------------------------------------------------------------


def _plan_indices(bm, n):
    win, first, active, own, oth = (jnp.asarray(a) for a in bm[:5])
    maskf = jnp.asarray(bm[6])
    wn, pad = bm[7].shape[0], bm[8].shape[0]
    base = win.astype(jnp.int32) * wn
    own_g = jnp.clip(base[:, None] + own, 0, n - 1)
    oth_g = jnp.clip(base[:, None] + oth - pad, 0, n - 1)
    m = maskf * active[:, None].astype(jnp.float32)
    return own_g.reshape(-1), oth_g.reshape(-1), m.reshape(-1)


def banded_gather_reference(x, bm):
    own_g, oth_g, m = _plan_indices(bm, x.shape[0])
    mm = m[:, None]
    return (x[own_g].astype(jnp.float32) * mm,
            x[oth_g].astype(jnp.float32) * mm)


def banded_scatter_reference(rows, bm, n, target_oth=False):
    own_g, oth_g, m = _plan_indices(bm, n)
    tgt = oth_g if target_oth else own_g
    return jax.ops.segment_sum(rows.astype(jnp.float32) * m[:, None], tgt,
                               num_segments=n)
