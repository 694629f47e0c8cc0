"""Flat-packed, statically-shaped batches.

The TPU-native replacement for the reference's PyG-style collate
(cad_recognition/train.py:123-171) plus its slice-offset fixup loops
(train.py:238-258): a batch is ONE flat graph — nodes/edges/proposals of all
images concatenated with id offsets applied at pack time — padded to static
bucket sizes so a single compiled program serves every batch of the same
bucket.

Batch dict contract (all jnp-compatible numpy arrays):
  pos           [N, 2] f32   proposal-normalised node positions
  node_mask     [N]    bool
  bbox_idx      [N]    i32   node -> proposal slot, sorted ascending
                             (padding rows point at the last slot)
  edge          [E, 2] i32   (src, dst) global node ids (0 for padding),
                             rows sorted ascending by dst: segment
                             reductions over edge[:, 1] may pass
                             indices_are_sorted=True (the fast TPU scatter
                             path; padding rows sort to the front at dst 0
                             and are masked out)
  e_attr        [E, 4] f32   first 4 edge-attr dims (graph_dict3.py:971)
  edge_mask     [E]    bool
  edge_super    [S, 2] i32   sorted by dst like `edge`; carried for parity
  e_attr_super  [S, 4] f32   (unused by the canonical model,
  super_mask    [S]    bool  architecture...py:196-216) but fed to YOLaT++
  labels        [P]    i32
  proposal_mask [P]    bool
  bbox          [P, 4] f32   proposal geometry boxes (normalised)
  stat_feats    [P,13] f32   carried, unused (dim_stat=0)
  has_obj       [P]    i32
  image_id      [P]    i32   proposal -> image index in batch
  is_root       [P]    bool  CC-root proposals (two-pass inference)
  n_images      scalar i32
  (per image, for eval)
  gt_bbox       [B, G, 4] f32, gt_labels [B, G] i32, gt_mask [B, G] bool
  wh            [B, 2] f32 image pixel size

`finalize_batch` is the jit-able device-side epilogue: optional train-time
augmentation (random_transfer, graph_dict3.py:236-298), proposal-box
recomputation from transformed positions (update_bbox, :934-955), and the
x = [0,0,0 | pos] feature build (:966-969).
"""

from __future__ import annotations

import numpy as np


def round_up(x: int, m: int) -> int:
    return ((max(x, 1) + m - 1) // m) * m


class PadSizes:
    """Static bucket sizes for one batch shape."""

    def __init__(self, n_nodes, n_edges, n_super, n_proposals, n_gt, n_images):
        self.n_nodes = n_nodes
        self.n_edges = n_edges
        self.n_super = n_super
        self.n_proposals = n_proposals
        self.n_gt = n_gt
        self.n_images = n_images

    @classmethod
    def for_files(cls, files, gt_counts, n_images, node_mult=512, edge_mult=512,
                  super_mult=2048, prop_mult=64, gt_mult=16):
        return cls(
            round_up(sum(_aligned_node_count(f) for f in files), node_mult),
            round_up(sum(len(f.edge) for f in files), edge_mult),
            round_up(sum(_aligned_super_count(f) for f in files),
                     super_mult),
            round_up(sum(f.n_proposals for f in files), prop_mult),
            round_up(max(gt_counts) if gt_counts else 1, gt_mult),
            n_images,
        )

    def key(self):
        return (self.n_nodes, self.n_edges, self.n_super, self.n_proposals,
                self.n_gt, self.n_images)


def _aligned_node_count(f) -> int:
    """Node count of `f` AFTER CompactFile block alignment. CompactFiles
    are already aligned; for raw ProposalFiles, predict the per-proposal
    round-up so PadSizes computed from raw files still dominate the packed
    totals."""
    if isinstance(f, CompactFile):
        return len(f.pos)
    from yolat_tpu.ops.segment import POOL_BLOCK

    n_prop = len(np.asarray(f.labels))
    counts = np.bincount(np.asarray(f.bbox_idx, np.int64), minlength=n_prop)
    aligned = ((counts + POOL_BLOCK - 1) // POOL_BLOCK) * POOL_BLOCK
    aligned[counts == 0] = 0
    return int(aligned.sum())


class CompactFile:
    """A ProposalFile pre-converted to the packed-batch dtypes, with both
    edge families dst-sorted, per-proposal node runs BLOCK-ALIGNED, and the
    per-proposal root pointer materialised.

    This is the load-once form: converting float64 proposal caches to f32
    on every batch assignment and dst-sorting ~130k edges per batch were
    the two dominant pack_files costs (~5x the pure-copy time). The loader
    caches CompactFiles in memory across epochs (PackedLoader
    cache_files), so steady-state packing is same-dtype slice copies with
    NO per-batch sort: per-file dst-sorted edge lists concatenate into a
    globally dst-sorted batch because node-id offsets increase with file
    position (padding rows keep dst 0 at the front).

    Block alignment: every proposal's node run is padded (node_mask=False
    rows carrying the run's bbox_idx) to a multiple of ops.segment
    POOL_BLOCK. No POOL_BLOCK-row block then straddles a proposal
    boundary, so the node->proposal pools reduce as one dense
    reshape-max/sum plus a ~block-count scatter with ZERO boundary rows —
    the XLA scatter was the largest single op of the serving forward
    (2.56 ms of 5.8 at [62k, 1152] bf16 on v5e; ~41 ns/row serialisation,
    PERF.md finding 2). The ~15-25% extra masked node rows ride the
    bandwidth-cheap MLP path, which is far below the scatter's cost.
    """

    __slots__ = ("pos", "node_mask", "bbox_idx", "edge", "e_attr",
                 "edge_super", "e_attr_super", "super_valid", "labels",
                 "bbox", "stat_feats", "has_obj", "label_iou",
                 "label_iou_rel", "is_root_mask", "root_slot_local",
                 "n_proposals", "dst_count", "src_count", "super_dst_count",
                 "prop_count", "sup_member", "sup_rank", "sup_abar",
                 "prop_first", "_dense")

    def __init__(self, f, n_classes=None):
        from yolat_tpu.ops.segment import POOL_BLOCK

        bbox_idx = np.asarray(f.bbox_idx, np.int64)
        pos = np.asarray(f.pos, np.float32)
        n_prop = len(np.asarray(f.labels))
        counts = np.bincount(bbox_idx, minlength=n_prop)
        new_counts = ((counts + POOL_BLOCK - 1) // POOL_BLOCK) * POOL_BLOCK
        new_counts[counts == 0] = 0
        old_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        new_starts = np.concatenate([[0], np.cumsum(new_counts)[:-1]])
        old2new = (new_starts[bbox_idx]
                   + (np.arange(len(bbox_idx)) - old_starts[bbox_idx]))
        n2 = int(new_counts.sum())
        self.pos = np.zeros((n2, 2), np.float32)
        self.pos[old2new] = pos
        self.node_mask = np.zeros(n2, bool)
        self.node_mask[old2new] = True
        self.bbox_idx = np.repeat(
            np.arange(n_prop, dtype=np.int32), new_counts)
        # old2new is strictly increasing, so dst-sorted edge lists stay
        # dst-sorted after the endpoint remap
        # edge families: stable dst sort + endpoint remap (+ run alignment
        # below) — the native kernel (csrc compact_sort_align, counting
        # sort) does each family in one pass; the numpy path is the
        # fallback and equivalence oracle (tests/test_native.py)
        from yolat_tpu.geom._native import compact_sort_align_stats_native

        # per-file segment populations + factored clique fields ride the
        # same native pass (csrc compact_sort_align_stats): precomputing
        # them here makes pack_files pure offset copies — the global
        # masked-bincount/reduceat versions were ~6 ms/image of the pack
        # stage (scripts/pack_decomp.py), and for cached files (PackedLoader
        # cache_files) the per-file cost amortises to zero across epochs
        nat_e = compact_sort_align_stats_native(
            np.asarray(f.edge, np.int64), np.asarray(f.e_attr, np.float32),
            old2new, 1, n2)
        if nat_e is not None:
            (self.edge, self.e_attr, _, self.dst_count, self.src_count,
             _, _) = nat_e
        else:
            eo = np.argsort(np.asarray(f.edge)[:, 1], kind="stable")
            self.edge = np.ascontiguousarray(
                old2new[np.asarray(f.edge, np.int64)[eo]], np.int32)
            self.e_attr = np.ascontiguousarray(
                np.asarray(f.e_attr)[eo, 0:4], np.float32)
            self.dst_count = np.bincount(
                self.edge[:, 1], minlength=n2).astype(np.float32)
            self.src_count = np.bincount(
                self.edge[:, 0], minlength=n2).astype(np.float32)
        # SUPER_BLOCK-align each dst node's super-edge run (pad rows keep
        # the run's dst so sortedness holds; src=dst, attr=0,
        # super_valid=False): the clique family is 5x the regular edge
        # count at SESYD scale and its per-node mean was a 2.3 ms/step
        # row-serialized scatter in YOLaT++ serving — aligned runs route
        # it through the boundary-free two-level pool plan (block reduce +
        # NB-row scatter), the same trick CompactFile already plays for
        # proposal node runs. The native kernel sorts AND aligns in the
        # same pass (block=SUPER_BLOCK).
        from yolat_tpu.ops.segment import SUPER_BLOCK

        nat_s = compact_sort_align_stats_native(
            np.asarray(f.edge_super, np.int64),
            np.asarray(f.e_attr_super, np.float32), old2new, SUPER_BLOCK, n2)
        if nat_s is not None:
            (self.edge_super, self.e_attr_super, self.super_valid,
             self.super_dst_count, _, self.sup_abar, self.sup_member) = nat_s
        else:
            so = np.argsort(np.asarray(f.edge_super)[:, 1], kind="stable")
            es = np.ascontiguousarray(
                old2new[np.asarray(f.edge_super, np.int64)[so]], np.int32)
            ea = np.ascontiguousarray(
                np.asarray(f.e_attr_super)[so, 0:4], np.float32)
            self.edge_super, self.e_attr_super, self.super_valid = \
                _align_runs(es, ea, SUPER_BLOCK)
            self.super_dst_count = np.bincount(
                es[:, 1], minlength=n2).astype(np.float32)
            member = np.zeros(n2, bool)
            member[es[:, 0]] = True
            member[es[:, 1]] = True
            self.sup_member = member
            abar = np.zeros((n2, 4), np.float32)
            if len(es):
                dst_r = es[:, 1].astype(np.int64)
                first = np.r_[0, np.flatnonzero(np.diff(dst_r)) + 1]
                cnts = np.diff(np.r_[first, len(dst_r)])
                sums = np.add.reduceat(ea, first, axis=0)
                abar[dst_r[first]] = sums / cnts[:, None]
            self.sup_abar = abar
        # rank of each member node among the PRECEDING members of its
        # proposal (nn/yolat_pp.py factored_prim) — file-local: proposals
        # never span files, so pack_files just copies it
        mem_idx = np.flatnonzero(self.sup_member)
        rank = np.zeros(n2, np.float32)
        if len(mem_idx):
            grp = self.bbox_idx[mem_idx]
            starts = np.r_[0, np.flatnonzero(np.diff(grp)) + 1]
            lens = np.diff(np.r_[starts, len(mem_idx)])
            rank[mem_idx] = (np.arange(len(mem_idx))
                             - np.repeat(starts, lens)).astype(np.float32)
        self.sup_rank = rank
        self.prop_count = counts.astype(np.float32)
        # searchsorted(bbox_idx, p) == new_starts[p] for the repeat
        # construction above — the per-proposal first node row for free
        self.prop_first = new_starts.astype(np.int32)
        self.labels = np.ascontiguousarray(f.labels, np.int32)
        self.bbox = np.ascontiguousarray(f.bbox, np.float32)
        self.stat_feats = np.ascontiguousarray(f.stat_feats, np.float32)
        self.has_obj = np.ascontiguousarray(f.has_obj, np.int32)
        # per-proposal label quality: IoU(proposal box, matched GT box) for
        # positive labels, 0 for background — the soft target of the
        # IoU-aware classification loss (cfg.iou_aware_loss; computed from
        # the labeler's stored bbox_targets, geom/proposals.py:448, so no
        # preprocessed-file format change)
        tgt = np.asarray(f.bbox_targets, np.float64)
        box = np.asarray(f.bbox, np.float64)
        if n_classes is not None:
            # positivity from the stored label (background = n_classes-1,
            # geom/proposals.py:452); a degenerate all-zero GT box row
            # then still counts as positive (label_iou 0) instead of
            # silently training as background
            pos_lbl = self.labels != (n_classes - 1)
        else:
            pos_lbl = tgt.any(axis=1)
        ix0 = np.maximum(box[:, 0], tgt[:, 0])
        iy0 = np.maximum(box[:, 1], tgt[:, 1])
        ix1 = np.minimum(box[:, 2], tgt[:, 2])
        iy1 = np.minimum(box[:, 3], tgt[:, 3])
        inter = np.clip(ix1 - ix0, 0, None) * np.clip(iy1 - iy0, 0, None)
        ab = (box[:, 2] - box[:, 0]) * (box[:, 3] - box[:, 1])
        at = (tgt[:, 2] - tgt[:, 0]) * (tgt[:, 3] - tgt[:, 1])
        iou = inter / np.maximum(ab + at - inter, 1e-12)
        self.label_iou = np.where(pos_lbl, iou, 0.0).astype(np.float32)
        # sibling-RELATIVE quality (cfg.iou_aware_mode='rel'): IoU
        # normalised within each matched-GT sibling group, so the best
        # sibling keeps the FULL hard target (q_rel=1: no positive-score
        # starvation — the mechanism that lost both chart step-20 metrics
        # under absolute-IoU targets, VALIDATION.md round 5) while worse
        # siblings still order below it. Groups key on the stored GT
        # box + label (bbox_targets rows identify the matched GT).
        rel = np.zeros_like(iou)
        if pos_lbl.any():
            keys = np.concatenate(
                [tgt[pos_lbl].round(9),
                 self.labels[pos_lbl][:, None].astype(np.float64)], axis=1)
            _, grp = np.unique(keys, axis=0, return_inverse=True)
            gmax = np.zeros(int(grp.max()) + 1)
            np.maximum.at(gmax, grp, iou[pos_lbl])
            rel[pos_lbl] = iou[pos_lbl] / np.maximum(gmax[grp], 1e-12)
        self.label_iou_rel = np.where(pos_lbl, rel, 0.0).astype(np.float32)
        P = len(self.labels)
        self.n_proposals = P
        self.is_root_mask = np.zeros(P, bool)
        self.is_root_mask[np.asarray(f.root_of_cc, np.int64)] = True
        self.root_slot_local = np.repeat(
            np.asarray(f.root_of_cc, np.int32),
            np.diff(np.asarray(f.cc_slice)),
        )
        self._dense = None

    def dense_table(self, d_max: int):
        """File-local dense neighbour table (see add_dense_neighbors), built
        WITHOUT an argsort: the edge family is already dst-sorted, so the
        position within each dst run falls out of the per-node in-degree
        prefix. Cached per (d_max); the loader reuses it across epochs."""
        if self._dense is not None and self._dense[0] == d_max:
            return self._dense[1]
        E = len(self.edge)
        n = len(self.pos)
        dst = self.edge[:, 1].astype(np.int64)
        indeg = self.dst_count.astype(np.int64)
        need = int(indeg.max()) if E else 1
        if need > d_max:
            raise ValueError(f"d_max={d_max} < max in-degree {need}")
        run_start = np.concatenate([[0], np.cumsum(indeg)[:-1]])
        pos_in_run = np.arange(E) - run_start[dst]
        nbr_idx = np.zeros((n, d_max), np.int32)
        nbr_attr = np.zeros((n, d_max, self.e_attr.shape[1]), np.float32)
        nbr_mask = np.zeros((n, d_max), bool)
        nbr_idx[dst, pos_in_run] = self.edge[:, 0]
        nbr_attr[dst, pos_in_run] = self.e_attr
        nbr_mask[dst, pos_in_run] = True
        self._dense = (d_max, (nbr_idx, nbr_attr, nbr_mask))
        return self._dense[1]


def _align_runs(edge: np.ndarray, attr: np.ndarray, block: int):
    """Pad a dst-sorted edge list so every dst run's length is a multiple
    of `block`. Pad rows carry the run's dst (sortedness preserved),
    src = dst, zero attrs, valid=False. Returns (edge2, attr2, valid)."""
    s = len(edge)
    if s == 0:
        return edge, attr, np.zeros(0, bool)
    dst = edge[:, 1].astype(np.int64)
    # dst is sorted: run boundaries come from diff, no O(S log S) unique
    first = np.empty(s, bool)
    first[0] = True
    np.not_equal(dst[1:], dst[:-1], out=first[1:])
    starts = np.flatnonzero(first)
    uniq = dst[starts]
    cnts = np.diff(np.append(starts, s))
    acnt = ((cnts + block - 1) // block) * block
    s2 = int(acnt.sum())
    new_starts = np.concatenate([[0], np.cumsum(acnt)[:-1]])
    run = np.cumsum(first) - 1
    new_row = new_starts[run] + (np.arange(s) - starts[run])
    edge2 = np.empty((s2, 2), np.int32)
    edge2[:, 1] = np.repeat(uniq, acnt).astype(np.int32)
    edge2[:, 0] = edge2[:, 1]
    attr2 = np.zeros((s2, attr.shape[1]), attr.dtype)
    valid = np.zeros(s2, bool)
    edge2[new_row] = edge
    attr2[new_row] = attr
    valid[new_row] = True
    return edge2, attr2, valid


def _aligned_super_count(f) -> int:
    """Super-edge count of `f` AFTER CompactFile run alignment."""
    if isinstance(f, CompactFile):
        return len(f.edge_super)
    from yolat_tpu.ops.segment import SUPER_BLOCK

    dst = np.asarray(f.edge_super)[:, 1]
    if len(dst) == 0:
        return 0
    cnts = np.unique(dst, return_counts=True)[1]
    return int((((cnts + SUPER_BLOCK - 1) // SUPER_BLOCK)
                * SUPER_BLOCK).sum())


def pack_files(files: list, gts: list, whs: list, pad: PadSizes,
               extra_plans: tuple = (), edge_window: bool = True) -> dict:
    """Concatenate per-file proposal arrays into one padded flat batch.

    Args:
      files: list of ProposalFile or CompactFile (ProposalFiles are
             compacted on the fly; pass CompactFiles to amortise the
             conversion+sort across batches — see CompactFile).
      gts:   list of (gt_bbox [G,4], gt_labels [G]) per file.
      whs:   list of (width, height) per file.
      pad:   PadSizes; must dominate the actual totals.
      extra_plans: opt-in ragged banded-message plans (~25-30 ms/batch of
             host work + ~20 MB, so serving paths request them, training
             doesn't): "super" attaches sew_* (the YOLaT++ clique level),
             "curve" attaches cwd_*/cws_* (its curve level, both
             aggregation directions). ops/banded_message.py.
    """
    B = pad.n_images
    assert len(files) <= B
    files = [f if isinstance(f, CompactFile) else CompactFile(f)
             for f in files]

    batch = {
        "pos": np.zeros((pad.n_nodes, 2), np.float32),
        "node_mask": np.zeros(pad.n_nodes, bool),
        # padding nodes point at the LAST proposal slot so bbox_idx stays
        # sorted ascending (enables indices_are_sorted segment reductions);
        # their contributions are masked out by node_mask
        "bbox_idx": np.full(pad.n_nodes, pad.n_proposals - 1, np.int32),
        "edge": np.zeros((pad.n_edges, 2), np.int32),
        "e_attr": np.zeros((pad.n_edges, 4), np.float32),
        "edge_mask": np.zeros(pad.n_edges, bool),
        "edge_super": np.zeros((pad.n_super, 2), np.int32),
        "e_attr_super": np.zeros((pad.n_super, 4), np.float32),
        "super_mask": np.zeros(pad.n_super, bool),
        "labels": np.zeros(pad.n_proposals, np.int32),
        "proposal_mask": np.zeros(pad.n_proposals, bool),
        "bbox": np.zeros((pad.n_proposals, 4), np.float32),
        "stat_feats": np.zeros((pad.n_proposals, 13), np.float32),
        "has_obj": np.zeros(pad.n_proposals, np.int32),
        "label_iou": np.zeros(pad.n_proposals, np.float32),
        "label_iou_rel": np.zeros(pad.n_proposals, np.float32),
        "image_id": np.zeros(pad.n_proposals, np.int32),
        "is_root": np.zeros(pad.n_proposals, bool),
        "root_slot": np.zeros(pad.n_proposals, np.int32),
        "gt_bbox": np.zeros((B, pad.n_gt, 4), np.float32),
        "gt_labels": np.zeros((B, pad.n_gt), np.int32),
        "gt_mask": np.zeros((B, pad.n_gt), bool),
        "wh": np.ones((B, 2), np.float32),
        "n_images": np.int32(len(files)),
        # per-file precomputed segment populations + factored clique fields
        # (CompactFile) — assembled by offset copies in the loop below; the
        # global masked-bincount/reduceat formulations they replace were
        # ~6 ms/image of host pack time (scripts/pack_decomp.py)
        "dst_count": np.zeros(pad.n_nodes, np.float32),
        "src_count": np.zeros(pad.n_nodes, np.float32),
        "super_dst_count": np.zeros(pad.n_nodes, np.float32),
        "prop_count": np.zeros(pad.n_proposals, np.float32),
        "sup_member": np.zeros(pad.n_nodes, bool),
        "sup_rank": np.zeros(pad.n_nodes, np.float32),
        "sup_abar": np.zeros((pad.n_nodes, 4), np.float32),
        "prop_first_row": np.zeros(pad.n_proposals, np.int32),
    }

    # Both edge families must end up sorted by dst: sorted segment ids turn
    # the aggregation scatter into XLA's sorted-scatter fast path —
    # measured 3x on the conv message pipeline at [137k nodes, 133k edges]
    # on v5e. CompactFiles are dst-sorted per file and node-id offsets grow
    # with file position, so filling real rows at the END of the buffer
    # (padding rows keep dst 0 at the front, masked out) yields a globally
    # dst-sorted batch with NO per-batch argsort.
    E_tot = sum(len(f.edge) for f in files)
    S_tot = sum(len(f.edge_super) for f in files)
    N_tot = sum(len(f.pos) for f in files)
    P_tot = sum(f.n_proposals for f in files)
    if (N_tot > pad.n_nodes or E_tot > pad.n_edges or S_tot > pad.n_super
            or P_tot > pad.n_proposals):
        raise ValueError("pad sizes too small for batch contents")

    n_off = p_off = 0
    e_off = pad.n_edges - E_tot
    s_off = pad.n_super - S_tot
    for img, (f, (gt_bbox, gt_labels), wh) in enumerate(zip(files, gts, whs)):
        n, e, s, p = len(f.pos), len(f.edge), len(f.edge_super), f.n_proposals

        batch["pos"][n_off : n_off + n] = f.pos
        batch["node_mask"][n_off : n_off + n] = f.node_mask
        np.add(f.bbox_idx, np.int32(p_off),
               out=batch["bbox_idx"][n_off : n_off + n])
        np.add(f.edge, np.int32(n_off), out=batch["edge"][e_off : e_off + e])
        batch["e_attr"][e_off : e_off + e] = f.e_attr
        batch["edge_mask"][e_off : e_off + e] = True
        np.add(f.edge_super, np.int32(n_off),
               out=batch["edge_super"][s_off : s_off + s])
        batch["e_attr_super"][s_off : s_off + s] = f.e_attr_super
        batch["super_mask"][s_off : s_off + s] = f.super_valid
        batch["labels"][p_off : p_off + p] = f.labels
        batch["proposal_mask"][p_off : p_off + p] = True
        batch["bbox"][p_off : p_off + p] = f.bbox
        batch["stat_feats"][p_off : p_off + p] = f.stat_feats
        batch["has_obj"][p_off : p_off + p] = f.has_obj
        batch["label_iou"][p_off : p_off + p] = f.label_iou
        batch["label_iou_rel"][p_off : p_off + p] = f.label_iou_rel
        batch["image_id"][p_off : p_off + p] = img
        batch["is_root"][p_off : p_off + p] = f.is_root_mask
        # per-proposal pointer to its CC's root proposal (two-pass inference)
        np.add(f.root_slot_local, np.int32(p_off),
               out=batch["root_slot"][p_off : p_off + p])
        batch["dst_count"][n_off : n_off + n] = f.dst_count
        batch["src_count"][n_off : n_off + n] = f.src_count
        batch["super_dst_count"][n_off : n_off + n] = f.super_dst_count
        batch["prop_count"][p_off : p_off + p] = f.prop_count
        batch["sup_member"][n_off : n_off + n] = f.sup_member
        batch["sup_rank"][n_off : n_off + n] = f.sup_rank
        batch["sup_abar"][n_off : n_off + n] = f.sup_abar
        np.add(f.prop_first, np.int32(n_off),
               out=batch["prop_first_row"][p_off : p_off + p])

        g = len(gt_bbox)
        batch["gt_bbox"][img, :g] = gt_bbox
        batch["gt_labels"][img, :g] = gt_labels
        batch["gt_mask"][img, :g] = True
        batch["wh"][img] = wh

        n_off += n
        e_off += e
        s_off += s
        p_off += p

    # two-level pooling plan for the node -> proposal reductions (bbox_idx
    # runs are contiguous by construction). CompactFile block-aligns every
    # proposal run, so NO block straddles a segment boundary: cap=0 emits
    # 0-length boundary arrays, a static shape that routes the pools (and
    # their custom VJPs) through the boundary-free fast path — no boundary
    # scatter, and 8x smaller backward gathers (ops/segment.pool_plan).
    from yolat_tpu.ops.segment import pool_plan

    batch.update(pool_plan(batch["bbox_idx"], pad.n_proposals, cap=0))

    # pack-time segment populations (dst/src/super_dst/prop counts): the
    # edge sets are static per batch, so the per-node in/out-degrees that
    # segment_mean otherwise computes with a full-width on-device scatter
    # (~0.5 ms/step at [56k -> 72k] on v5e, the largest forward scatter in
    # the bf16 train step) are free here — copied per file above.
    # Consumers must drop these whenever the masks change on-device
    # (train/loop strips them when drop_edge > 0).
    # padding proposal slots' first-row pointer = the first padding node
    # row (the old global searchsorted semantics), clamped in range
    batch["prop_first_row"][p_off:] = n_off
    np.minimum(batch["prop_first_row"], pad.n_nodes - 1,
               out=batch["prop_first_row"])
    em = batch["edge_mask"]

    # boundary-free pool plan over the 8-aligned super-edge runs: routes
    # YOLaT++'s clique aggregation (the largest single op of its serving
    # step, a 2.3 ms row-serialized scatter at 280k super edges) through
    # the block-reduce + NB-row scatter path. Front pad rows carry dst 0
    # and per-file regions are 8-multiples, so the whole buffer is
    # block-aligned by construction.
    from yolat_tpu.ops.segment import SUPER_BLOCK, pool_plan

    try:
        sup = pool_plan(batch["edge_super"][:, 1], pad.n_nodes,
                        block=SUPER_BLOCK, cap=0)
        batch.update({"sup_" + k: v for k, v in sup.items()})
    except AssertionError:
        pass  # unaligned runs (foreign packer) — consumers fall back

    # factored clique-level fields (nn/yolat_pp.py factored_prim — the
    # aggregate-then-activate v2 primitive level): the clique family is
    # lower-triangular all-pairs per proposal (src < dst, one direction —
    # the reference's i<j enumeration, build_graph_bbox.py:109-112), so
    # "mean over incoming super neighbours" = "mean over PRECEDING member
    # nodes of the proposal" and the whole per-edge level collapses to a
    # per-node prefix sum. The static structure (sup_member [N] bool,
    # sup_rank [N] f32, sup_abar [N,4] f32, prop_first_row [P] i32) is
    # file-local and precomputed in CompactFile — copied in the loop above.

    # edge-window plan for the VMEM-resident message kernel (serving).
    # None (batch too small / a window over capacity / locality violated)
    # simply omits the keys — consumers fall back to the XLA path. Stale
    # under on-device edge_mask edits: train/loop strips ew_* alongside
    # the counts when drop_edge > 0. edge_window=False skips the build
    # (~1.3 ms/image, scripts/pack_decomp.py) for consumers whose program
    # never reads ew_* (the bf16 serving engine routes through XLA).
    if edge_window:
        from yolat_tpu.ops.edge_window import edge_window_plan

        ewp = edge_window_plan(batch["edge"], em, batch["e_attr"],
                               pad.n_nodes)
        if ewp is not None:
            batch.update(ewp)

    # ragged banded plans (ops/banded_message.py) — None (band/geometry
    # violation) just omits the keys; consumers fall back to the XLA path
    if extra_plans:
        from yolat_tpu.ops.banded_message import banded_plan

        # per-family geometry (on-chip sweeps, PERF.md round 3): the dense
        # skewed clique family wants small windows (one-hot width prices
        # every edge row); the sparse near-uniform shape-edge family wants
        # bigger blocks (fewer grid steps, padding stays ~1.3x)
        want = []
        if "super" in extra_plans:
            want.append(("sew_", batch["edge_super"], batch["super_mask"],
                         batch["e_attr_super"], 1, 512, 512))
        if "curve" in extra_plans:
            want.append(("cwd_", batch["edge"], em, batch["e_attr"], 1,
                         1024, 1024))
            want.append(("cws_", batch["edge"], em, batch["e_attr"], 0,
                         1024, 1024))
        for prefix, e, m, a, sortby, wn, eblk in want:
            p = banded_plan(e, m, a, pad.n_nodes, sortby=sortby, wn=wn,
                            eblk=eblk)
            if p is not None:
                batch.update({prefix + k: v for k, v in p.items()})

    return batch


# ---------------------------------------------------------------------------
# device-side epilogue: augmentation + feature build
# ---------------------------------------------------------------------------


def finalize_batch(batch: dict, key=None, data_aug: bool = False,
                   drop_edge: float = 0.0):
    """Jit-able batch epilogue.

    With data_aug: per-image random flip/rotate/scale/translate of the
    proposal-normalised positions (random_transfer, graph_dict3.py:283-298 —
    scale 1±0.6, rotation U[0,2pi), translate ±0.1, independent axis flips),
    then proposal boxes recomputed from transformed positions (update_bbox,
    :934-955) as masked per-proposal coordinate min/max. Always: the model
    input x = [0,0,0 | pos] (:966-969).

    One deliberate deviation: the reference resamples its axis flips on
    every __transform__ call, so positions and GT boxes flip independently —
    a latent bug with no training-path consequence (GT boxes are not used in
    the loss and eval runs without aug). Here flips are sampled once per
    image.
    """
    import jax
    import jax.numpy as jnp

    pos = batch["pos"]
    if drop_edge > 0.0 and key is not None:
        # train-time random edge dropout. The reference *accepts* a
        # --drop_edge flag but never applies it (graph_dict3.py takes the
        # parameter and drops it); here it is functional.
        key, k_drop = jax.random.split(key)
        keep = jax.random.bernoulli(k_drop, 1.0 - drop_edge,
                                    batch["edge_mask"].shape)
        batch = {**batch, "edge_mask": batch["edge_mask"] & keep}
        if "nbr_mask" in batch:
            key, k_drop2 = jax.random.split(key)
            keep2 = jax.random.bernoulli(k_drop2, 1.0 - drop_edge,
                                         batch["nbr_mask"].shape)
            batch = {**batch, "nbr_mask": batch["nbr_mask"] & keep2}
    if data_aug:
        assert key is not None
        B = batch["gt_bbox"].shape[0]
        k_scale, k_angle, k_trans, k_flip = jax.random.split(key, 4)
        scale = jax.random.uniform(k_scale, (B,), minval=-1.0, maxval=1.0) * 0.6 + 1.0
        angle = jax.random.uniform(k_angle, (B,)) * 2.0 * jnp.pi
        translate = jax.random.uniform(k_trans, (B, 2), minval=-1.0, maxval=1.0) * 0.1
        flips = jax.random.bernoulli(k_flip, 0.5, (B, 2))

        from yolat_tpu.ops.segment import plan_of, segment_broadcast

        pp = plan_of(batch)
        N = pos.shape[0]
        bidx = batch["bbox_idx"]
        # per-image aug params reach the nodes via proposal granularity:
        # [B] -> [P] tiny gathers, then one blockwise proposal -> node
        # broadcast (segment_broadcast) — the per-NODE s32/f32 gathers this
        # replaces were ~0.75 ms/step on v5e (~7 ns/row regardless of row
        # bytes)
        img = batch["image_id"]
        s = segment_broadcast(scale[img], bidx, N, pp)[:, None]
        a = segment_broadcast(angle[img], bidx, N, pp)
        t = segment_broadcast(translate[img], bidx, N, pp)
        fl = segment_broadcast(flips[img], bidx, N, pp)

        p = pos - 0.5
        p = jnp.where(fl, -p, p)
        cos, sin = jnp.cos(a), jnp.sin(a)
        # matches pos @ [[cos, sin], [-sin, cos]] (graph_dict3.py:241-254)
        p = jnp.stack(
            [p[:, 0] * cos - p[:, 1] * sin, p[:, 0] * sin + p[:, 1] * cos], axis=1
        )
        p = (p + 0.5 + t) * s
        pos = jnp.where(batch["node_mask"][:, None], p, 0.0)

        n_prop = batch["labels"].shape[0]
        big = 1e30
        # one 4-column reduction instead of four 1-column scatters (XLA
        # scatter carries a per-call fixed cost, PERF.md finding 2)
        vals = jnp.stack([pos[:, 0], pos[:, 1], -pos[:, 0], -pos[:, 1]],
                         axis=1)
        mins = _seg_min(vals, batch["bbox_idx"], n_prop,
                        batch["node_mask"], big, pp)
        bbox = jnp.stack([mins[:, 0], mins[:, 1], -mins[:, 2], -mins[:, 3]],
                         axis=1)
        bbox = jnp.where(batch["proposal_mask"][:, None], bbox, 0.0)
        batch = {**batch, "pos": pos, "bbox": bbox}

    x = jnp.concatenate([jnp.zeros(pos.shape[:1] + (3,), pos.dtype), pos], axis=1)
    return {**batch, "x": x}


def add_dense_neighbors(batch: dict, d_max: int | None = None,
                        files: list | None = None) -> dict:
    """Regularise the edge list into a per-node neighbour table.

    TPU-first re-layout (the shape-discipline of the reference's dense
    gcn_lib mirror, gcn_lib/dense/torch_edge.py:45 / torch_vertex.py): the
    conv's gather -> message -> segment-mean over a ragged edge list becomes
    a dense [N, D] gather + masked mean over a fixed neighbour axis — no
    scatter in the hot path, everything MXU/VPU-regular.

    Direction preserved from the sparse path: the neighbours of node i are
    the sources j of edges (j, i); max in-degree in SESYD-style graphs is
    tiny (<=3 for shape edges), so D is 4 by default.

    Adds keys: nbr_idx [N, D] int32, nbr_attr [N, D, 4] f32,
    nbr_mask [N, D] bool.

    With `files` (the CompactFiles the batch was packed from, in pack
    order) and an explicit d_max, the table is assembled from per-file
    cached tables by offset copies — no per-batch argsort or boolean
    extraction (~2 ms/image, scripts/pack_decomp.py), and cached files
    amortise the build across epochs.
    """
    if (files is not None and d_max is not None and len(files)
            and all(isinstance(f, CompactFile) for f in files)):
        N = batch["pos"].shape[0]
        a_dim = batch["e_attr"].shape[1]
        nbr_idx = np.zeros((N, d_max), np.int32)
        nbr_attr = np.zeros((N, d_max, a_dim), np.float32)
        nbr_mask = np.zeros((N, d_max), bool)
        n_off = 0
        for f in files:
            n = len(f.pos)
            ti, ta, tm = f.dense_table(d_max)
            # masked slots stay 0 (bit-parity with the batch-level build)
            np.multiply(ti + np.int32(n_off), tm,
                        out=nbr_idx[n_off:n_off + n], casting="unsafe")
            nbr_attr[n_off:n_off + n] = ta
            nbr_mask[n_off:n_off + n] = tm
            n_off += n
        return {**batch, "nbr_idx": nbr_idx, "nbr_attr": nbr_attr,
                "nbr_mask": nbr_mask}

    edge = batch["edge"]
    emask = batch["edge_mask"]
    N = batch["pos"].shape[0]
    dst = edge[emask][:, 1]
    src = edge[emask][:, 0]
    attr = batch["e_attr"][emask]

    indeg = np.bincount(dst, minlength=N)
    need = int(indeg.max()) if len(dst) else 1
    if d_max is None:
        d_max = max(4, int(2 ** np.ceil(np.log2(max(need, 1)))))
    elif need > d_max:
        raise ValueError(f"d_max={d_max} < max in-degree {need}")

    order = np.argsort(dst, kind="stable")
    dst_s, src_s, attr_s = dst[order], src[order], attr[order]
    # position within each dst run
    starts = np.concatenate([[0], np.cumsum(indeg)[:-1]])
    pos_in_run = np.arange(len(dst_s)) - starts[dst_s]

    nbr_idx = np.zeros((N, d_max), np.int32)
    nbr_attr = np.zeros((N, d_max, attr.shape[1]), np.float32)
    nbr_mask = np.zeros((N, d_max), bool)
    nbr_idx[dst_s, pos_in_run] = src_s
    nbr_attr[dst_s, pos_in_run] = attr_s
    nbr_mask[dst_s, pos_in_run] = True

    return {**batch, "nbr_idx": nbr_idx, "nbr_attr": nbr_attr,
            "nbr_mask": nbr_mask}


def _seg_min(vals, seg, n, mask, big, plan=None):
    """Masked segment min; `mask` is 1-D [N], vals [N] or [N, C]."""
    import jax
    import jax.numpy as jnp

    if plan is not None:
        from yolat_tpu.ops.segment import _two_level

        out = -_two_level(-vals, mask, plan, n, "max", -big)
    else:
        m = mask if vals.ndim == mask.ndim else mask[:, None]
        vals = jnp.where(m, vals, big)
        out = jax.ops.segment_min(vals, seg, num_segments=n,
                                  indices_are_sorted=True)
    return jnp.where(out >= big / 2, 0.0, out)
