"""Trainable edge-window ops: banded one-hot gather/scatter with custom VJPs.

The serving edge-window kernel (ops/edge_window.py) fuses the whole folded-BN
message pipeline, which only exists in eval mode — training BatchNorm needs
batch statistics over the live edge population mid-MLP, so the MLP/BN must
stay in XLA. What CAN move into kernels for training is the memory system
around the MLP: the per-edge x gathers (row-serialized HBM reads, ~3.8 ns/row
on v5e), their transpose (a row-serialized scatter-add, the dominant backward
op — PERF.md finding 2), and the per-dst aggregation pair. Each becomes an
in-VMEM one-hot MXU contraction over the pack-time banded window plan
(edge_window_plan), with the BACKWARD also a banded contraction: the
transpose of a windowed one-hot gather is the transposed one-hot contraction
into per-window band slabs, summed with three shifted slice-adds — no
scatter anywhere in fwd or bwd.

Layout contract: edge-level tensors use the plan's window layout
[NW * EB, ...] (row w*EB+e = slot e of window w; ew_maskf marks real rows).
BatchNorm over ew_maskf rows sees exactly the same edge population as the
sparse dst-sorted branch, so the window-layout conv is numerically the same
module (tests/test_edge_window_train.py asserts logits AND grads).

Reference counterpart: the fwd+bwd of the message hot loop,
gcn_lib/sparse/torch_vertex.py:330-337 (VERDICT r2 item 4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from yolat_tpu.ops.edge_window import EW_KEYS, ew_of  # noqa: F401 (re-export)


def _group_of(nw: int) -> int:
    return next(g for g in (16, 8, 4, 2, 1) if nw % g == 0)


def _vec_specs(ngr, gsz, eb):
    return pl.BlockSpec((1, 1, gsz * eb), lambda g: (g, 0, 0))


def _reshape_vec(a, ngr, gsz, eb):
    return a.reshape(ngr, 1, gsz * eb)


# ---------------------------------------------------------------------------
# pair-feature gather: g = [x_i || x_j - x_i] in window layout
# ---------------------------------------------------------------------------


def _pair_fwd_kernel(x0_ref, x1_ref, x2_ref, sr_ref, dl_ref, out_ref, *,
                     wn: int, eb: int, gsz: int):
    xw = jnp.concatenate([x0_ref[:], x1_ref[:], x2_ref[:]], axis=0)
    cdt = xw.dtype
    sr_all = sr_ref[0, 0]
    dl_all = dl_ref[0, 0]
    band = jax.lax.broadcasted_iota(jnp.int32, (eb, 3 * wn), 1)
    own = jax.lax.broadcasted_iota(jnp.int32, (eb, wn), 1)
    dn = (((1,), (0,)), ((), ()))
    ci = x1_ref.shape[1]
    for j in range(gsz):
        sl = slice(j * eb, (j + 1) * eb)
        sub = xw[(gsz + j - 1) * wn:(gsz + j + 2) * wn]
        xown = x1_ref[j * wn:(j + 1) * wn]
        ohl = (dl_all[sl][:, None] == own).astype(cdt)
        ohs = (sr_all[sl][:, None] == band).astype(cdt)
        x_i = jax.lax.dot_general(
            ohl, xown, dn, preferred_element_type=jnp.float32).astype(cdt)
        x_j = jax.lax.dot_general(
            ohs, sub, dn, preferred_element_type=jnp.float32).astype(cdt)
        out_ref[sl, :ci] = x_i
        out_ref[sl, ci:] = x_j - x_i


def _pair_bwd_kernel(df_ref, sr_ref, dl_ref, parts_ref, *,
                     wn: int, eb: int, gsz: int, ci: int):
    cdt = df_ref.dtype
    sr_all = sr_ref[0, 0]
    dl_all = dl_ref[0, 0]
    band = jax.lax.broadcasted_iota(jnp.int32, (eb, 3 * wn), 1)
    own = jax.lax.broadcasted_iota(jnp.int32, (eb, wn), 1)
    dn_t = (((0,), (0,)), ((), ()))
    for j in range(gsz):
        sl = slice(j * eb, (j + 1) * eb)
        df = df_ref[sl, :]
        # g = [x_i || x_j - x_i]  =>  d_xi = df0 - df1, d_xj = df1
        d_xi = df[:, :ci] - df[:, ci:]
        d_xj = df[:, ci:]
        ohl = (dl_all[sl][:, None] == own).astype(cdt)
        ohs = (sr_all[sl][:, None] == band).astype(cdt)
        mid = jax.lax.dot_general(ohl, d_xi, dn_t,
                                  preferred_element_type=jnp.float32)
        full = jax.lax.dot_general(ohs, d_xj, dn_t,
                                   preferred_element_type=jnp.float32)
        full = jnp.concatenate(
            [full[:wn], full[wn:2 * wn] + mid, full[2 * wn:]], axis=0)
        parts_ref[j] = full


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pair_fwd(x, src_rel, dst_loc, interpret: bool = False):
    nw, eb = src_rel.shape
    n, ci = x.shape
    wn = n // nw
    gsz = _group_of(nw)
    ngr = nw // gsz
    sr = _reshape_vec(src_rel, ngr, gsz, eb)
    dl = _reshape_vec(dst_loc, ngr, gsz, eb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(ngr,),
        in_specs=[
            pl.BlockSpec((gsz * wn, ci), lambda g: (jnp.maximum(g - 1, 0), 0)),
            pl.BlockSpec((gsz * wn, ci), lambda g: (g, 0)),
            pl.BlockSpec((gsz * wn, ci),
                         lambda g: (jnp.minimum(g + 1, ngr - 1), 0)),
            _vec_specs(ngr, gsz, eb),
            _vec_specs(ngr, gsz, eb),
        ],
        out_specs=pl.BlockSpec((gsz * eb, 2 * ci), lambda g: (g, 0)),
    )
    kern = functools.partial(_pair_fwd_kernel, wn=wn, eb=eb, gsz=gsz)
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nw * eb, 2 * ci), x.dtype),
        interpret=interpret,
    )(x, x, x, sr, dl)


@functools.partial(jax.jit, static_argnames=("wn", "interpret"))
def _pair_bwd(df, src_rel, dst_loc, wn: int, interpret: bool = False):
    nw, eb = src_rel.shape
    ci = df.shape[1] // 2
    gsz = _group_of(nw)
    ngr = nw // gsz
    sr = _reshape_vec(src_rel, ngr, gsz, eb)
    dl = _reshape_vec(dst_loc, ngr, gsz, eb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(ngr,),
        in_specs=[
            pl.BlockSpec((gsz * eb, 2 * ci), lambda g: (g, 0)),
            _vec_specs(ngr, gsz, eb),
            _vec_specs(ngr, gsz, eb),
        ],
        out_specs=pl.BlockSpec((gsz, 3 * wn, ci), lambda g: (g, 0, 0)),
    )
    kern = functools.partial(_pair_bwd_kernel, wn=wn, eb=eb, gsz=gsz, ci=ci)
    parts = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nw, 3 * wn, ci), jnp.float32),
        interpret=interpret,
    )(df, sr, dl)
    # parts[k] = dL/d(band of window k): thirds map to windows k-1, k, k+1.
    # The plan guarantees no src points into the clamped duplicate thirds
    # at k=0 / k=NW-1, so those slabs are exactly zero and dropping them is
    # lossless.
    own = parts[:, wn:2 * wn]
    dx = own.at[:-1].add(parts[1:, :wn]).at[1:].add(parts[:-1, 2 * wn:])
    return dx.reshape(nw * wn, ci)


def ew_pair_features(x, ew, interpret: bool | None = None):
    """g[w*EB+e] = [x_i || x_j - x_i] for edge slot e of window w.

    Padding rows gather window row 0 (their dst_loc/src_rel are 0) — callers
    mask them in the MLP/BN and the aggregation, so their cotangent is zero
    and the backward stays exact vs the sparse branch.

    interpret=None compiles on TPU and interprets elsewhere (the CPU test
    mesh runs the same kernel code through the Pallas interpreter)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    src_rel, dst_loc = ew[0], ew[1]
    n = x.shape[0]
    wn = n // src_rel.shape[0]
    xdt = x.dtype  # closed over: custom_vjp residuals must be JAX arrays

    @jax.custom_vjp
    def op(x):
        return _pair_fwd(x, src_rel, dst_loc, interpret=interpret)

    def fwd(x):
        return op(x), None

    def bwd(_, dg):
        dx = _pair_bwd(dg, src_rel, dst_loc, wn=wn, interpret=interpret)
        return (dx.astype(xdt),)

    op.defvjp(fwd, bwd)
    return op(x)


# ---------------------------------------------------------------------------
# per-dst window segment sum (and its transpose, a banded broadcast-gather)
# ---------------------------------------------------------------------------


def _wsum_fwd_kernel(h_ref, dl_ref, out_ref, *, wn: int, eb: int, gsz: int):
    cdt = h_ref.dtype
    dl_all = dl_ref[0, 0]
    own = jax.lax.broadcasted_iota(jnp.int32, (eb, wn), 1)
    dn_t = (((0,), (0,)), ((), ()))
    for j in range(gsz):
        sl = slice(j * eb, (j + 1) * eb)
        ohl = (dl_all[sl][:, None] == own).astype(cdt)
        out_ref[j * wn:(j + 1) * wn, :] = jax.lax.dot_general(
            ohl, h_ref[sl, :], dn_t, preferred_element_type=jnp.float32)


def _wsum_bwd_kernel(g_ref, dl_ref, out_ref, *, wn: int, eb: int, gsz: int):
    cdt = g_ref.dtype
    dl_all = dl_ref[0, 0]
    own = jax.lax.broadcasted_iota(jnp.int32, (eb, wn), 1)
    dn = (((1,), (0,)), ((), ()))
    for j in range(gsz):
        sl = slice(j * eb, (j + 1) * eb)
        ohl = (dl_all[sl][:, None] == own).astype(cdt)
        out_ref[sl, :] = jax.lax.dot_general(
            ohl, g_ref[j * wn:(j + 1) * wn], dn,
            preferred_element_type=jnp.float32).astype(cdt)


@functools.partial(jax.jit, static_argnames=("wn", "interpret"))
def _wsum_fwd(h, dst_loc, wn: int, interpret: bool = False):
    nw, eb = dst_loc.shape
    c = h.shape[1]
    gsz = _group_of(nw)
    ngr = nw // gsz
    dl = _reshape_vec(dst_loc, ngr, gsz, eb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(ngr,),
        in_specs=[
            pl.BlockSpec((gsz * eb, c), lambda g: (g, 0)),
            _vec_specs(ngr, gsz, eb),
        ],
        out_specs=pl.BlockSpec((gsz * wn, c), lambda g: (g, 0)),
    )
    kern = functools.partial(_wsum_fwd_kernel, wn=wn, eb=eb, gsz=gsz)
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nw * wn, c), jnp.float32),
        interpret=interpret,
    )(h, dl)


@functools.partial(jax.jit, static_argnames=("eb", "interpret"))
def _wsum_bwd(g, dst_loc, eb: int, interpret: bool = False):
    nw = dst_loc.shape[0]
    n, c = g.shape
    wn = n // nw
    gsz = _group_of(nw)
    ngr = nw // gsz
    dl = _reshape_vec(dst_loc, ngr, gsz, eb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(ngr,),
        in_specs=[
            pl.BlockSpec((gsz * wn, c), lambda g: (g, 0)),
            _vec_specs(ngr, gsz, eb),
        ],
        out_specs=pl.BlockSpec((gsz * eb, c), lambda g: (g, 0)),
    )
    kern = functools.partial(_wsum_bwd_kernel, wn=wn, eb=eb, gsz=gsz)
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nw * eb, c), g.dtype),
        interpret=interpret,
    )(g, dl)


def ew_window_segment_sum_n(h, ew, n_nodes: int,
                            interpret: bool | None = None):
    """Per-dst-node SUM of window-layout rows h [NW*EB, C] -> [N, C] f32.

    Rows must already be masked (multiplied by ew_maskf): padding rows carry
    dst_loc 0 and would otherwise pollute each window's first node. The
    backward is the banded broadcast-gather (dh[row] = g[dst of row]) — the
    exact transpose, also scatter-free."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dst_loc = ew[1]
    nw, eb = dst_loc.shape
    wn = n_nodes // nw
    hdt = h.dtype

    @jax.custom_vjp
    def op(h):
        return _wsum_fwd(h, dst_loc, wn=wn, interpret=interpret)

    def fwd(h):
        return op(h), None

    def bwd(_, g):
        dh = _wsum_bwd(g.astype(hdt), dst_loc, eb=eb, interpret=interpret)
        return (dh,)

    op.defvjp(fwd, bwd)
    return op(h)
