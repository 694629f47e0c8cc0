"""Ragged banded segment-message kernel (general edge families).

ops/edge_window.py handles the canonical conv's shape-edge family with a
fixed per-window edge capacity — fine there because shape-edge density is
near-uniform (in-degree <= 3). YOLaT++'s super-edge CLIQUE family is 5x
larger and heavily skewed (dense per-CC cliques next to empty windows): a
fixed capacity inflates the padded edge count ~6.6x at SESYD scale, and
its per-node mean through plain gathers + segment-sum is the single
largest group of the pp serving step (3.88 ms of 8.8 — serve_decomp,
2026-08-19: two row-serialized 280k-row gathers plus the aggregation).

This kernel removes both problems:

  * the grid runs over RAGGED EDGE BLOCKS of a fixed EBLK rows, assigned
    to node windows at pack time — padded edge rows are bounded by one
    partial block per occupied window (~1.15-1.3x at SESYD scale,
    measured) regardless of skew;
  * each block's node window index rides a scalar-prefetch array, so the
    x band (own window + PAD-row halos on both sides — cliques live
    inside CCs whose nodes are contiguous, max |src-dst| ~ 70 rows) and
    the output tile are picked per block at run time;
  * blocks of the same window are consecutive, so the output tile stays
    VMEM-resident across them and accumulates in place (first block
    initialises, followers add — the Pallas revisiting contract);
  * per-edge gathers are one-hot compare matrices contracted on the MXU
    against PRE-PROJECTED band features (band @ W happens once per block,
    then the one-hot dot gathers H-wide rows) — gathers never touch HBM.

The message is the general bilinear-endpoints form

    h = relu(sc1 . (x_own @ W_own + x_other @ W_halo + attr @ W_attr))
    [optional second folded stage: h = relu(sc2 . (h @ W2))]
    out[own] += h * mask          (sum over the sorted endpoint)

which covers the canonical conv ([x_i || x_j - x_i || attr] with
W_own = W1a - W1b, W_halo = W1b), YOLaT++'s super-edge clique level
([s_i || s_j - s_i || attr]), and both directions of its curve level
([attr || x_src || x_dst]). Divide by the endpoint population outside
(pack-time counts) for means.

Reference counterpart: the message+aggregate of
gcn_lib/sparse/torch_vertex.py (PyG MessagePassing.propagate), re-laid
out for the TPU memory system; the ragged blocking is the megablocks-
style grouped-contraction pattern.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BM_KEYS = ("bm_win", "bm_first", "bm_active", "bm_own", "bm_oth",
           "bm_attr", "bm_maskf")
# tag arrays whose SHAPES carry the static plan geometry (values of batch
# arrays are traced under jit; shapes are static) — same trick as
# edge_window.EW_BATCH_KEYS
BM_TAGS = ("bm_wn_tag", "bm_pad_tag", "bm_nw_tag")
BM_BATCH_KEYS = BM_KEYS + BM_TAGS

# on-chip sweep (scripts/banded_sweep.py, v5e 2026-08-19, super family):
# wn512/eb512 1.90 ms < wn512/eb1024 2.01 < wn256/eb512 1.97 <
# wn1024/eb1024 2.34 (standalone chain incl. ~0.6 ms floor) — the one-hot
# contraction width (wn + 2*pad) prices every edge row, so small windows
# win despite more grid steps
WN_DEFAULT = 512
PAD_DEFAULT = 128
EBLK_DEFAULT = 512


def banded_plan(edge, mask, attr, n_nodes: int, sortby: int = 1,
                wn: int = WN_DEFAULT, pad: int = PAD_DEFAULT,
                eblk: int = EBLK_DEFAULT, n_eb: int | None = None):
    """Host-side (numpy) ragged-block plan for one edge family.

    Args:
      edge [E, 2] int, mask [E] bool, attr [E, A] float; E is the PADDED
      buffer length — the default n_eb derives from it, so every batch
      padded to the same sizes gets the same (static) plan shapes.
      sortby: which endpoint is the aggregation target (1 = dst). The
      edges need NOT be pre-sorted by it; the plan sorts internally.

    Returns a dict of bm_* arrays, or None when the family cannot be
    banded (n_nodes not a multiple of wn, wn not a multiple of pad, an
    other-endpoint outside the [own_window - pad, own_window_end + pad)
    band, or the block count over the static cap).

    Every node window gets at least one ACTIVE block (zero-edge windows
    get an all-masked one) so every output tile is written; trailing
    INACTIVE blocks (win pinned to the last window, no writes) pad the
    block axis to the static n_eb.
    """
    edge = np.asarray(edge)
    em = np.asarray(mask, bool)
    attr = np.asarray(attr, np.float32)
    if n_nodes % wn != 0:
        # same pad sizes -> same n -> same pick, so one loader's batches
        # share plan shapes (no recompiles)
        wn = next((w for w in (512, 1024, 256, 2048, 128)
                   if n_nodes % w == 0 and w % pad == 0), 0)
        if not wn:
            return None
    if wn % pad != 0:
        return None
    nw = n_nodes // wn
    cap = int(n_eb) if n_eb is not None else nw + -(-edge.shape[0] // eblk)

    idx = np.nonzero(em)[0]
    key = edge[idx, sortby].astype(np.int64)
    oth = edge[idx, 1 - sortby].astype(np.int64)
    order = np.argsort(key, kind="stable")
    key, oth, idx = key[order], oth[order], idx[order]

    kk = key // wn
    oth_rel = oth - (kk * wn - pad)
    if len(idx) and (oth_rel.min() < 0 or oth_rel.max() >= wn + 2 * pad):
        return None

    cnt = np.bincount(kk, minlength=nw)
    blocks_per_win = np.maximum(1, -(-cnt // eblk))
    n_active = int(blocks_per_win.sum())
    if n_active > cap:
        return None

    win = np.full(cap, nw - 1, np.int32)
    first = np.zeros(cap, np.int32)
    active = np.zeros(cap, np.int32)
    win[:n_active] = np.repeat(np.arange(nw, dtype=np.int32),
                               blocks_per_win)
    starts = np.concatenate([[0], np.cumsum(blocks_per_win)[:-1]])
    first[starts] = 1
    active[:n_active] = 1
    # inactive tail keeps the LAST window resident (no index-map jumps)
    win[n_active:] = win[n_active - 1] if n_active else 0

    own_loc = np.zeros((cap, eblk), np.int32)
    oth_loc = np.zeros((cap, eblk), np.int32)
    attr_b = np.zeros((cap, eblk, attr.shape[1]), np.float32)
    maskf = np.zeros((cap, eblk), np.float32)
    if len(idx):
        # row placement: edges of window k fill its block range in order
        edge_starts = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        within = np.arange(len(idx)) - edge_starts[kk]
        blk = starts[kk] + within // eblk
        col = within % eblk
        own_loc[blk, col] = (key - kk * wn).astype(np.int32)
        oth_loc[blk, col] = oth_rel.astype(np.int32)
        attr_b[blk, col] = attr[idx]
        maskf[blk, col] = 1.0

    return {"bm_win": win, "bm_first": first, "bm_active": active,
            "bm_own": own_loc, "bm_oth": oth_loc, "bm_attr": attr_b,
            "bm_maskf": maskf,
            "bm_wn_tag": np.zeros((wn,), np.int8),
            "bm_pad_tag": np.zeros((pad,), np.int8),
            "bm_nw_tag": np.zeros((nw,), np.int8)}


def bm_of(batch: dict, prefix: str):
    """Extract a banded plan (as the kernel's arg tuple) from a batch, or
    None. Stale plans (node count no longer matching the plan's nw*wn —
    a batch re-padded after pack time) return None."""
    if f"{prefix}bm_win" not in batch or f"{prefix}bm_nw_tag" not in batch:
        return None
    n = batch["pos"].shape[0] if "pos" in batch else batch["x"].shape[0]
    wn = batch[f"{prefix}bm_wn_tag"].shape[0]
    nw = batch[f"{prefix}bm_nw_tag"].shape[0]
    pad = batch[f"{prefix}bm_pad_tag"].shape[0]
    if nw * wn != n:
        return None
    # geometry rides as TAG ARRAYS (shapes are static under jit; ints in
    # the tuple would be traced)
    return tuple(batch[f"{prefix}{k}"] for k in BM_KEYS) + (
        batch[f"{prefix}bm_wn_tag"], batch[f"{prefix}bm_pad_tag"])


def _kernel(win_ref, first_ref, act_ref, xpre_ref, xmain_ref, xpost_ref,
            own_ref, oth_ref, attr_ref, mkf_ref, w_own_ref, w_halo_ref,
            w_attr_ref, sc1_ref, w2_ref, sc2_ref, out_ref, *,
            wn: int, pad: int, eblk: int, ech: int, two_stage: bool):
    g = pl.program_id(0)

    @pl.when(act_ref[g] == 1)
    def _body():
        band = jnp.concatenate(
            [xpre_ref[:], xmain_ref[:], xpost_ref[:]], axis=0)
        cdt = band.dtype
        bn = wn + 2 * pad
        # pre-projection: gathers commute with the linear stage, so the
        # band projects ONCE per block and the one-hot dots gather H-wide
        # rows (D-fold fewer MACs than gather-then-project at high edge
        # density). The OWN endpoint lies inside the window by
        # construction, so its projection and one-hots span only wn rows
        # (the halo side pays the full band).
        p_own = jax.lax.dot_general(
            xmain_ref[:], w_own_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(cdt)
        p_oth = jax.lax.dot_general(
            band, w_halo_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(cdt)
        sc1 = sc1_ref[:].astype(jnp.float32)
        if two_stage:
            w2 = w2_ref[:]
            sc2 = sc2_ref[:].astype(jnp.float32)
        h_dim = p_own.shape[1]
        acc = jnp.zeros((wn, h_dim), jnp.float32)
        own_all = own_ref[0, 0]
        oth_all = oth_ref[0, 0]
        mk_all = mkf_ref[0, 0]
        at_all = attr_ref[0].astype(cdt)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (ech, wn), 1)
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (ech, bn), 1)
        dn = (((1,), (0,)), ((), ()))
        # one-hot COPY dots must be exact: a single unit coefficient per
        # row with f32 accumulation copies bf16 payloads bit-exactly, but
        # the MXU's DEFAULT f32 matmul rounds f32 payloads through bf16
        # passes — HIGHEST keeps the copy exact in f32 mode. bf16 operands
        # must stay at default: this Mosaic toolchain rejects fp32
        # contract_precision on bf16 matmuls ("Bad lhs type"), and the
        # copy is already exact there.
        hp = (jax.lax.Precision.HIGHEST if cdt == jnp.float32 else
              jax.lax.Precision.DEFAULT)
        for c in range(eblk // ech):
            sl = slice(c * ech, (c + 1) * ech)
            own = own_all[sl]
            oh_own = (own[:, None] == iota_w).astype(cdt)
            oh_oth = (oth_all[sl][:, None] == iota_b).astype(cdt)
            pre = (jax.lax.dot_general(oh_own, p_own, dn, precision=hp,
                                       preferred_element_type=jnp.float32)
                   + jax.lax.dot_general(oh_oth, p_oth, dn, precision=hp,
                                         preferred_element_type=jnp.float32)
                   + jax.lax.dot_general(at_all[sl], w_attr_ref[:], dn,
                                         preferred_element_type=jnp.float32))
            h = jnp.maximum(pre * sc1[0] + sc1[1], 0.0)
            if two_stage:
                h = jax.lax.dot_general(h.astype(cdt), w2, dn,
                                        preferred_element_type=jnp.float32)
                h = jnp.maximum(h * sc2[0] + sc2[1], 0.0)
            h = h * mk_all[sl][:, None].astype(jnp.float32)
            # transposed one-hot contraction = masked per-node SUM into
            # the own window (static slice of the band one-hot)
            acc = acc + jax.lax.dot_general(
                oh_own, h.astype(cdt),
                (((0,), (0,)), ((), ())), precision=hp,
                preferred_element_type=jnp.float32)

        @pl.when(first_ref[g] == 1)
        def _init():
            out_ref[:] = acc

        @pl.when(first_ref[g] == 0)
        def _accum():
            out_ref[:] = out_ref[:] + acc


@functools.partial(jax.jit,
                   static_argnames=("interpret", "ech"))
def banded_message_sum(x, bm, w_own, w_halo, w_attr, sc1, w2=None,
                       sc2=None, interpret: bool = False, ech: int = 512):
    """Per-node SUM of the folded message MLP over one banded edge family.

    x [N, C] (f32 or bf16); bm from bm_of/banded_plan;
    w_own [C, H], w_halo [C, H], w_attr [A, H], sc1 [2, H]; optional
    second stage w2 [H, H], sc2 [2, H]. Returns [N, H] f32. Divide by the
    endpoint population outside for a mean.
    """
    win, first, active, own, oth, attr, maskf, wn_tag, pad_tag = bm
    wn, pad = wn_tag.shape[0], pad_tag.shape[0]
    n, _ = x.shape
    n_eb, eblk = own.shape
    if eblk % min(ech, eblk) != 0:
        raise ValueError(
            f"plan eblk={eblk} must be a multiple of ech={min(ech, eblk)}: "
            "the kernel chunk loop would silently drop trailing edge rows")
    h_dim = w_own.shape[1]
    na = attr.shape[-1]
    nw = n // wn
    npb = n // pad
    w_own = w_own.astype(x.dtype)
    w_halo = w_halo.astype(x.dtype)
    w_attr = w_attr.astype(x.dtype)
    two_stage = w2 is not None
    if not two_stage:  # placeholder operands keep the arg list static
        w2 = jnp.zeros((h_dim, h_dim), x.dtype)
        sc2 = jnp.zeros((2, h_dim), jnp.float32)
    else:
        w2 = w2.astype(x.dtype)
    r = wn // pad
    # Mosaic block-shape rule: the last two dims of a block must be
    # (8, 128)-divisible or span the whole array — the per-block vectors
    # ride a singleton middle axis as [n_eb, 1, eblk] blocks
    own = own.reshape(n_eb, 1, eblk)
    oth = oth.reshape(n_eb, 1, eblk)
    maskf = maskf.reshape(n_eb, 1, eblk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # win, first, active
        grid=(n_eb,),
        in_specs=[
            pl.BlockSpec((pad, x.shape[1]),
                         lambda g, w, f, a: (jnp.maximum(w[g] * r - 1, 0), 0)),
            pl.BlockSpec((wn, x.shape[1]), lambda g, w, f, a: (w[g], 0)),
            pl.BlockSpec((pad, x.shape[1]),
                         lambda g, w, f, a: (jnp.minimum(w[g] * r + r,
                                                         npb - 1), 0)),
            pl.BlockSpec((1, 1, eblk), lambda g, w, f, a: (g, 0, 0)),
            pl.BlockSpec((1, 1, eblk), lambda g, w, f, a: (g, 0, 0)),
            pl.BlockSpec((1, eblk, na), lambda g, w, f, a: (g, 0, 0)),
            pl.BlockSpec((1, 1, eblk), lambda g, w, f, a: (g, 0, 0)),
            pl.BlockSpec(w_own.shape, lambda g, w, f, a: (0, 0)),
            pl.BlockSpec(w_halo.shape, lambda g, w, f, a: (0, 0)),
            pl.BlockSpec(w_attr.shape, lambda g, w, f, a: (0, 0)),
            pl.BlockSpec(sc1.shape, lambda g, w, f, a: (0, 0)),
            pl.BlockSpec(w2.shape, lambda g, w, f, a: (0, 0)),
            pl.BlockSpec(sc2.shape, lambda g, w, f, a: (0, 0)),
        ],
        out_specs=pl.BlockSpec((wn, h_dim), lambda g, w, f, a: (w[g], 0)),
    )
    kern = functools.partial(_kernel, wn=wn, pad=pad, eblk=eblk,
                             ech=min(ech, eblk), two_stage=two_stage)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, h_dim), jnp.float32),
        interpret=interpret,
    )(win, first, active, x, x, x, own, oth, attr, maskf,
      w_own, w_halo, w_attr, sc1.astype(jnp.float32), w2,
      sc2.astype(jnp.float32))


def _kernel_both(win_ref, first_ref, act_ref, xpre_ref, xmain_ref,
                 xpost_ref, own_ref, oth_ref, attr_ref, mkf_ref, w_own_ref,
                 w_halo_ref, w_attr_ref, sc1_ref, own_out_ref, mid_ref,
                 lo_ref, hi_ref, *, wn: int, pad: int, eblk: int, ech: int):
    """One pass, BOTH endpoints: the per-edge message h is computed once
    and scattered to the own window (like _kernel) AND to the other
    endpoint — decomposed into three window-aligned accumulators (the band
    mid rows plus one spill tile into each neighbour window, the same
    decomposition as ops/banded_train._scatter_kernel). Saves one full
    kernel pass for symmetric aggregations (YOLaT++'s curve level scatters
    the same token to src and dst: nn/yolat_pp.py curve_at_node)."""
    g = pl.program_id(0)

    @pl.when(act_ref[g] == 1)
    def _body():
        band = jnp.concatenate(
            [xpre_ref[:], xmain_ref[:], xpost_ref[:]], axis=0)
        cdt = band.dtype
        bn = wn + 2 * pad
        p_own = jax.lax.dot_general(
            xmain_ref[:], w_own_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(cdt)
        p_oth = jax.lax.dot_general(
            band, w_halo_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(cdt)
        sc1 = sc1_ref[:].astype(jnp.float32)
        h_dim = p_own.shape[1]
        acc_own = jnp.zeros((wn, h_dim), jnp.float32)
        acc_mid = jnp.zeros((wn, h_dim), jnp.float32)
        acc_lo = jnp.zeros((pad, h_dim), jnp.float32)
        acc_hi = jnp.zeros((pad, h_dim), jnp.float32)
        own_all = own_ref[0, 0]
        oth_all = oth_ref[0, 0]
        mk_all = mkf_ref[0, 0]
        at_all = attr_ref[0].astype(cdt)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (ech, wn), 1)
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (ech, bn), 1)
        dn = (((1,), (0,)), ((), ()))
        dt = (((0,), (0,)), ((), ()))
        hp = (jax.lax.Precision.HIGHEST if cdt == jnp.float32 else
              jax.lax.Precision.DEFAULT)
        for c in range(eblk // ech):
            sl = slice(c * ech, (c + 1) * ech)
            oh_own = (own_all[sl][:, None] == iota_w).astype(cdt)
            oh_oth = (oth_all[sl][:, None] == iota_b).astype(cdt)
            pre = (jax.lax.dot_general(oh_own, p_own, dn, precision=hp,
                                       preferred_element_type=jnp.float32)
                   + jax.lax.dot_general(oh_oth, p_oth, dn, precision=hp,
                                         preferred_element_type=jnp.float32)
                   + jax.lax.dot_general(at_all[sl], w_attr_ref[:], dn,
                                         preferred_element_type=jnp.float32))
            h = jnp.maximum(pre * sc1[0] + sc1[1], 0.0)
            hc = (h * mk_all[sl][:, None].astype(jnp.float32)).astype(cdt)
            acc_own = acc_own + jax.lax.dot_general(
                oh_own, hc, dt, precision=hp,
                preferred_element_type=jnp.float32)
            acc_lo = acc_lo + jax.lax.dot_general(
                oh_oth[:, :pad], hc, dt, precision=hp,
                preferred_element_type=jnp.float32)
            acc_mid = acc_mid + jax.lax.dot_general(
                oh_oth[:, pad:pad + wn], hc, dt, precision=hp,
                preferred_element_type=jnp.float32)
            acc_hi = acc_hi + jax.lax.dot_general(
                oh_oth[:, pad + wn:], hc, dt, precision=hp,
                preferred_element_type=jnp.float32)

        @pl.when(first_ref[g] == 1)
        def _init():
            own_out_ref[:] = acc_own
            mid_ref[:] = acc_mid
            lo_ref[0] = acc_lo
            hi_ref[0] = acc_hi

        @pl.when(first_ref[g] == 0)
        def _accum():
            own_out_ref[:] = own_out_ref[:] + acc_own
            mid_ref[:] = mid_ref[:] + acc_mid
            lo_ref[0] = lo_ref[0] + acc_lo
            hi_ref[0] = hi_ref[0] + acc_hi


@functools.partial(jax.jit, static_argnames=("interpret", "ech"))
def banded_message_sum_both(x, bm, w_own, w_halo, w_attr, sc1,
                            interpret: bool = False, ech: int = 512):
    """Per-node SUMS of the folded message at BOTH endpoints in one pass.

    Returns (own_sum, oth_sum), each [N, H] f32: the message
    h = relu(sc1 . (x_own @ W_own + x_oth @ W_halo + attr @ W_attr))
    summed over edges at the plan's own (sorted) endpoint and at the other
    endpoint. vs two banded_message_sum calls over mirror plans this
    computes h once, runs one plan's edge rows once, and reuses the
    gather one-hots for the scatters — the curve level's symmetric
    src+dst aggregation is the consumer (eval/fast_forward.fast_forward_pp).
    Single-stage messages only (the curve MLP is Dense->BN->relu)."""
    win, first, active, own, oth, attr, maskf, wn_tag, pad_tag = bm
    wn, pad = wn_tag.shape[0], pad_tag.shape[0]
    n, _ = x.shape
    n_eb, eblk = own.shape
    if eblk % min(ech, eblk) != 0:
        raise ValueError(
            f"plan eblk={eblk} must be a multiple of ech={min(ech, eblk)}: "
            "the kernel chunk loop would silently drop trailing edge rows")
    h_dim = w_own.shape[1]
    na = attr.shape[-1]
    nw = n // wn
    npb = n // pad
    w_own = w_own.astype(x.dtype)
    w_halo = w_halo.astype(x.dtype)
    w_attr = w_attr.astype(x.dtype)
    r = wn // pad
    own = own.reshape(n_eb, 1, eblk)
    oth = oth.reshape(n_eb, 1, eblk)
    maskf = maskf.reshape(n_eb, 1, eblk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_eb,),
        in_specs=[
            pl.BlockSpec((pad, x.shape[1]),
                         lambda g, w, f, a: (jnp.maximum(w[g] * r - 1, 0), 0)),
            pl.BlockSpec((wn, x.shape[1]), lambda g, w, f, a: (w[g], 0)),
            pl.BlockSpec((pad, x.shape[1]),
                         lambda g, w, f, a: (jnp.minimum(w[g] * r + r,
                                                         npb - 1), 0)),
            pl.BlockSpec((1, 1, eblk), lambda g, w, f, a: (g, 0, 0)),
            pl.BlockSpec((1, 1, eblk), lambda g, w, f, a: (g, 0, 0)),
            pl.BlockSpec((1, eblk, na), lambda g, w, f, a: (g, 0, 0)),
            pl.BlockSpec((1, 1, eblk), lambda g, w, f, a: (g, 0, 0)),
            pl.BlockSpec(w_own.shape, lambda g, w, f, a: (0, 0)),
            pl.BlockSpec(w_halo.shape, lambda g, w, f, a: (0, 0)),
            pl.BlockSpec(w_attr.shape, lambda g, w, f, a: (0, 0)),
            pl.BlockSpec(sc1.shape, lambda g, w, f, a: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((wn, h_dim), lambda g, w, f, a: (w[g], 0)),
            pl.BlockSpec((wn, h_dim), lambda g, w, f, a: (w[g], 0)),
            pl.BlockSpec((1, pad, h_dim), lambda g, w, f, a: (w[g], 0, 0)),
            pl.BlockSpec((1, pad, h_dim), lambda g, w, f, a: (w[g], 0, 0)),
        ],
    )
    kern = functools.partial(_kernel_both, wn=wn, pad=pad, eblk=eblk,
                             ech=min(ech, eblk))
    own_sum, mid, lo, hi = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n, h_dim), jnp.float32),
                   jax.ShapeDtypeStruct((n, h_dim), jnp.float32),
                   jax.ShapeDtypeStruct((nw, pad, h_dim), jnp.float32),
                   jax.ShapeDtypeStruct((nw, pad, h_dim), jnp.float32)],
        interpret=interpret,
    )(win, first, active, x, x, x, own, oth, attr, maskf,
      w_own, w_halo, w_attr, sc1.astype(jnp.float32))
    # spill tiles: lo[k] lands on the tail pad rows of window k-1, hi[k]
    # on the head pad rows of window k+1 — window-aligned adds, no scatter
    # (ops/banded_train._scatter_call's combination)
    grid = mid.reshape(nw, wn, h_dim)
    lo_add = jnp.zeros_like(grid).at[:, wn - pad:, :].set(
        jnp.concatenate([lo[1:], jnp.zeros_like(lo[:1])], axis=0))
    hi_add = jnp.zeros_like(grid).at[:, :pad, :].set(
        jnp.concatenate([jnp.zeros_like(hi[:1]), hi[:-1]], axis=0))
    oth_sum = (grid + lo_add + hi_add).reshape(n, h_dim)
    return own_sum, oth_sum


def banded_message_sum_both_reference(x, bm, w_own, w_halo, w_attr, sc1):
    """jnp oracle for banded_message_sum_both (tests only)."""
    win, first, active, own, oth, attr, maskf = (
        jnp.asarray(a) for a in bm[:7])
    wn, pad = bm[7].shape[0], bm[8].shape[0]
    n, _ = x.shape
    base = win.astype(jnp.int32) * wn
    own_g = jnp.clip(base[:, None] + own, 0, n - 1)
    oth_g = jnp.clip(base[:, None] + oth - pad, 0, n - 1)
    pre = (x[own_g] @ w_own.astype(x.dtype)
           + x[oth_g] @ w_halo.astype(x.dtype)
           + attr.astype(x.dtype) @ w_attr.astype(x.dtype))
    h = jnp.maximum(pre.astype(jnp.float32) * sc1[0] + sc1[1], 0.0)
    h = h * maskf[..., None] * active[:, None, None]
    flat = h.reshape(-1, h.shape[-1])
    return (jax.ops.segment_sum(flat, own_g.reshape(-1), num_segments=n),
            jax.ops.segment_sum(flat, oth_g.reshape(-1), num_segments=n))


def banded_message_sum_reference(x, bm, w_own, w_halo, w_attr, sc1,
                                 w2=None, sc2=None):
    """jnp oracle — identical banded math, XLA-scheduled (tests only)."""
    win, first, active, own, oth, attr, maskf = (
        jnp.asarray(a) for a in bm[:7])
    wn, pad = bm[7].shape[0], bm[8].shape[0]
    n, _ = x.shape
    base = win.astype(jnp.int32) * wn
    own_g = jnp.clip(base[:, None] + own, 0, n - 1)           # [n_eb, eblk]
    oth_g = jnp.clip(base[:, None] + oth - pad, 0, n - 1)
    x_own = x[own_g]
    x_oth = x[oth_g]
    pre = (x_own @ w_own.astype(x.dtype)
           + x_oth @ w_halo.astype(x.dtype)
           + attr.astype(x.dtype) @ w_attr.astype(x.dtype))
    h = jnp.maximum(pre.astype(jnp.float32) * sc1[0] + sc1[1], 0.0)
    if w2 is not None:
        h = jnp.maximum((h.astype(x.dtype) @ w2.astype(x.dtype))
                        .astype(jnp.float32) * sc2[0] + sc2[1], 0.0)
    h = h * maskf[..., None] * active[:, None, None]
    flat = h.reshape(-1, h.shape[-1])
    ids = own_g.reshape(-1)
    return jax.ops.segment_sum(flat, ids, num_segments=n)
