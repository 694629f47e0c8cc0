"""Windowed sparse-message kernel: the canonical conv's edge pipeline as
one VMEM-resident Pallas pass.

The serving bottleneck is row-serialized HBM gather/scatter around the
message MLP (two ~0.5 ms gathers per bf16 serving step at E=56k, C=64 on
v5e — xprof `scripts/xprof_hlo.py`). The graph has strong index locality
by construction (nodes are numbered along strokes as the splitter walks
each path — reference counterpart `Datasets/svg_parser.py` builds edges
between consecutive curve endpoints): on SESYD-scale batches
max |src - dst| is ~34 rows. This kernel exploits that:

  * nodes are partitioned into fixed windows of WN rows; the dst-sorted
    edge list is re-bucketed per window at pack time (edge_window_plan),
    padded to a fixed EB capacity per window;
  * window k's x rows load as THREE consecutive (WN, C) blocks (a banded
    halo: src/dst of window k's edges provably lie inside it — the plan
    builder verifies and returns None otherwise, routing callers to the
    XLA fallback);
  * the per-edge x gathers become one-hot compare matrices contracted on
    the MXU against the in-VMEM band — gathers never touch HBM, and the
    0/1 matmul is exact in bf16 (single unit coefficient per row, f32
    accumulation);
  * the two folded-BN MLP stages and the masked per-node sum aggregation
    (the transposed one-hot contraction) all stay in VMEM.

HBM traffic per layer: x read 3x (band overlap), plan ints, one [N, H]
f32 write — ~50 MB vs ~2 GB of row-serialized gather/scatter equivalents.

Reference counterpart: gcn_lib/sparse/torch_vertex.py (EdgConv's
message+aggregate), re-laid-out for the TPU memory system.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EW_KEYS = ("ew_src_rel", "ew_dst_loc", "ew_attr", "ew_maskf")
# ew_wn_tag is a zeros[(wn,)] marker whose SHAPE records the window size —
# values of batch arrays are traced under jit, but shapes are static, so
# ew_of can detect a re-padded (stale) batch at trace time.
EW_BATCH_KEYS = EW_KEYS + ("ew_wn_tag",)

WN_DEFAULT = 256  # on-chip sweep (scripts/edge_window_bench.py): wn=256
#                   1134 us vs wn=512 1208 / wn=128 1191 / wn=64 1636
EB_EXTRA = 256  # fixed capacity slack over WN: empirical max edges per
#                 256-node window is ~WN+14 at SESYD density (in-degree
#                 <=3, mean ~0.8); a window exceeding WN+EB_EXTRA voids
#                 the plan


def edge_window_plan(edge, edge_mask, e_attr, n_nodes: int,
                     wn: int = WN_DEFAULT, eb: int | None = None):
    """Host-side (numpy) window re-bucketing of a dst-sorted edge list.

    Returns a dict of `ew_*` batch arrays, or None when the batch cannot
    be windowed (node count not a multiple of wn, a window over EB
    capacity, or an edge whose src falls outside its window's 3-window
    band) — callers fall back to the XLA path.

      ew_src_rel [NW, EB] i32  src - (k-1)*wn (index into the 3WN band)
      ew_dst_loc [NW, EB] i32  dst - k*wn     (index into the own window)
      ew_attr    [NW, EB, 4] f32
      ew_maskf   [NW, EB] f32  1.0 for real edges

    The band for window k is windows (k-1, k, k+1) with the HALO loads
    clamped into [0, NW-1] — a clamped halo duplicates an edge window's
    rows, but src_rel never points into the duplicated third (src >= 0
    forces rel >= wn at k=0; src < N forces rel < 2wn at k=NW-1), so
    coordinates stay consistent and any NW >= 1 windows.
    """
    edge = np.asarray(edge)
    em = np.asarray(edge_mask, bool)
    e_attr = np.asarray(e_attr, np.float32)
    if n_nodes % wn != 0:
        return None
    nw = n_nodes // wn
    eb = int(eb) if eb is not None else wn + EB_EXTRA

    dst = edge[:, 1].astype(np.int64)
    src = edge[:, 0].astype(np.int64)
    idx = np.nonzero(em)[0]  # dst-sorted => window-sorted
    kk = dst[idx] // wn
    cnt = np.bincount(kk, minlength=nw)
    if cnt.max(initial=0) > eb:
        return None
    s_rel = src[idx] - (kk - 1) * wn
    if len(idx) and (s_rel.min() < 0 or s_rel.max() >= 3 * wn):
        return None

    starts = np.concatenate([[0], np.cumsum(cnt)[:-1]])
    offs = (np.arange(len(idx)) - starts[kk]).astype(np.int64)

    src_rel = np.zeros((nw, eb), np.int32)
    dst_loc = np.zeros((nw, eb), np.int32)
    attr = np.zeros((nw, eb, e_attr.shape[1]), np.float32)
    maskf = np.zeros((nw, eb), np.float32)
    src_rel[kk, offs] = s_rel
    dst_loc[kk, offs] = dst[idx] - kk * wn
    attr[kk, offs] = e_attr[idx]
    maskf[kk, offs] = 1.0
    return {"ew_src_rel": src_rel, "ew_dst_loc": dst_loc, "ew_attr": attr,
            "ew_maskf": maskf, "ew_wn_tag": np.zeros((wn,), np.int8)}


def ew_of(batch: dict):
    """Extract the edge-window plan arrays from a batch, or None. Stale
    plans (node count no longer NW*WN — a batch re-padded after pack
    time) return None, same contract as segment.plan_of."""
    if "ew_src_rel" not in batch or "ew_wn_tag" not in batch:
        return None
    n = batch["pos"].shape[0] if "pos" in batch else batch["x"].shape[0]
    nw = batch["ew_src_rel"].shape[0]
    wn = batch["ew_wn_tag"].shape[0]
    if nw * wn != n:
        return None
    return tuple(batch[k] for k in EW_KEYS)


def _kernel(x0_ref, x1_ref, x2_ref, sr_ref, dl_ref, attr_ref,
            maskf_ref, w1_ref, sc1_ref, w2_ref, sc2_ref, out_ref, *,
            wn: int, eb: int, ci: int, gsz: int):
    """One grid step = GSZ consecutive windows, unrolled: one set of DMAs
    amortizes over gsz windows (the per-grid-step overhead, ~2.4 us, was
    the whole cost at small wn — the one-hot contractions themselves are
    sub-microsecond)."""
    xw = jnp.concatenate([x0_ref[:], x1_ref[:], x2_ref[:]], axis=0)
    cdt = xw.dtype
    sr_all = sr_ref[0, 0]
    dl_all = dl_ref[0, 0]
    mk_all = maskf_ref[0, 0]
    at_all = attr_ref[0].astype(cdt)
    w1 = w1_ref[:]
    w1a, w1b, w1c = w1[:ci], w1[ci:2 * ci], w1[2 * ci:]
    w1d = w1a - w1b
    w2 = w2_ref[:]
    sc1 = sc1_ref[:].astype(jnp.float32)
    sc2 = sc2_ref[:].astype(jnp.float32)
    band = jax.lax.broadcasted_iota(jnp.int32, (eb, 3 * wn), 1)
    own = jax.lax.broadcasted_iota(jnp.int32, (eb, wn), 1)
    dn = (((1,), (0,)), ((), ()))

    for j in range(gsz):
        sl = slice(j * eb, (j + 1) * eb)
        # window gG+j's 3wn band sits at static offset (gsz+j-1)*wn of
        # the loaded 3*gsz*wn buffer; its own window at j*wn of x1
        sub = xw[(gsz + j - 1) * wn:(gsz + j + 2) * wn]
        xown = x1_ref[j * wn:(j + 1) * wn]
        dl = dl_all[sl]
        sr = sr_all[sl]
        # exact gathers: one unit coefficient per row, f32 accumulation.
        # dst lies in the OWN window by construction, so x_i contracts
        # over wn — only x_j (src, the halo) pays for the 3wn band.
        ohl = (dl[:, None] == own).astype(cdt)
        ohs = (sr[:, None] == band).astype(cdt)
        x_i = jax.lax.dot_general(
            ohl, xown, dn, preferred_element_type=jnp.float32).astype(cdt)
        x_j = jax.lax.dot_general(
            ohs, sub, dn, preferred_element_type=jnp.float32).astype(cdt)

        h = (jax.lax.dot_general(x_i, w1d, dn,
                                 preferred_element_type=jnp.float32)
             + jax.lax.dot_general(x_j, w1b, dn,
                                   preferred_element_type=jnp.float32)
             + jax.lax.dot_general(at_all[sl], w1c, dn,
                                   preferred_element_type=jnp.float32))
        h = jnp.maximum(h * sc1[0] + sc1[1], 0.0).astype(cdt)
        h = jax.lax.dot_general(h, w2, dn,
                                preferred_element_type=jnp.float32)
        h = jnp.maximum(h * sc2[0] + sc2[1], 0.0).astype(cdt)
        h = h * mk_all[sl][:, None].astype(cdt)

        # transposed one-hot contraction = per-node masked SUM
        out_ref[j * wn:(j + 1) * wn, :] = jax.lax.dot_general(
            ohl, h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret", "group"))
def edge_window_message_sum(x, ew, w1, sc1, w2, sc2, interpret: bool = False,
                            group: int | None = None):
    """Per-node SUM of the folded-BN message MLP over incoming edges.

    x [N, C] (f32 or bf16), ew = tuple from ew_of/edge_window_plan,
    w1 [2C+4, H], sc1 [2, H], w2 [H, H], sc2 [2, H] (fold_params layout).
    Returns [N, H] f32. Divide by the in-degree and add the root term
    outside (both fuse in XLA).
    """
    src_rel, dst_loc, attr, maskf = ew
    nw, eb = src_rel.shape
    n, ci = x.shape
    wn = n // nw
    h = w2.shape[-1]
    w1 = w1.astype(x.dtype)
    w2 = w2.astype(x.dtype)
    if group is None:  # largest group that divides the window count
        group = next(g for g in (16, 8, 4, 2, 1) if nw % g == 0)
    gsz = group
    ngr = nw // gsz
    na = attr.shape[-1]
    # Mosaic block-shape rule: the last two dims of a block must be
    # (8, 128)-divisible or span the whole array — the per-window vectors
    # ride a singleton middle axis as [NGR, 1, GSZ*EB] blocks
    src_rel = src_rel.reshape(ngr, 1, gsz * eb)
    dst_loc = dst_loc.reshape(ngr, 1, gsz * eb)
    maskf = maskf.reshape(ngr, 1, gsz * eb)
    attr = attr.reshape(ngr, gsz * eb, na)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(ngr,),
        in_specs=[
            pl.BlockSpec((gsz * wn, ci), lambda g: (jnp.maximum(g - 1, 0), 0)),
            pl.BlockSpec((gsz * wn, ci), lambda g: (g, 0)),
            pl.BlockSpec((gsz * wn, ci),
                         lambda g: (jnp.minimum(g + 1, ngr - 1), 0)),
            pl.BlockSpec((1, 1, gsz * eb), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 1, gsz * eb), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, gsz * eb, na), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 1, gsz * eb), lambda g: (g, 0, 0)),
            pl.BlockSpec(w1.shape, lambda g: (0, 0)),
            pl.BlockSpec(sc1.shape, lambda g: (0, 0)),
            pl.BlockSpec(w2.shape, lambda g: (0, 0)),
            pl.BlockSpec(sc2.shape, lambda g: (0, 0)),
        ],
        out_specs=pl.BlockSpec((gsz * wn, h), lambda g: (g, 0)),
    )
    kern = functools.partial(_kernel, wn=wn, eb=eb, ci=ci, gsz=gsz)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, h), jnp.float32),
        interpret=interpret,
    )(x, x, x, src_rel, dst_loc, attr, maskf, w1, sc1, w2, sc2)


def edge_window_message_sum_reference(x, ew, w1, sc1, w2, sc2):
    """jnp oracle for the kernel — identical windowed math, XLA-scheduled
    (bandwidth-naive: materialises per-window bands; tests only)."""
    src_rel, dst_loc, attr, maskf = (jnp.asarray(a) for a in ew)
    nw, eb = src_rel.shape
    n, ci = x.shape
    wn = n // nw
    ks = jnp.arange(nw)
    xw = x.reshape(nw, wn, ci)
    band = jnp.concatenate(
        [xw[jnp.maximum(ks - 1, 0)], xw, xw[jnp.minimum(ks + 1, nw - 1)]],
        axis=1)  # [NW, 3WN, C]
    x_i = jnp.take_along_axis(xw, dst_loc[..., None], axis=1)
    x_j = jnp.take_along_axis(band, src_rel[..., None], axis=1)
    f = jnp.concatenate([x_i, x_j - x_i, attr.astype(x.dtype)], axis=-1)
    h = jnp.maximum((f @ w1.astype(x.dtype)).astype(jnp.float32)
                    * sc1[0] + sc1[1], 0.0).astype(x.dtype)
    h = jnp.maximum((h @ w2.astype(x.dtype)).astype(jnp.float32)
                    * sc2[0] + sc2[1], 0.0)
    h = h * maskf[..., None]
    oh = jax.nn.one_hot(dst_loc, wn, dtype=h.dtype, axis=1)  # [NW, WN, EB]
    out = jnp.einsum("kwe,keh->kwh", oh, h)
    return out.reshape(n, -1)
