"""ctypes binding for the native geometry kernel (csrc/geomcore.cpp).

Compiled lazily with the system C++ compiler and cached next to the source;
every entry point has a numpy fallback, so the package works without a
toolchain (pure-Python wheel semantics).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False


def _csrc_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "csrc")


def load_library():
    """Compile (once) and load libgeomcore.so; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        src = os.path.join(_csrc_dir(), "geomcore.cpp")
        so = os.path.join(_csrc_dir(), "libgeomcore.so")
        try:
            if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
                # -ffp-contract=off: no FMA contraction, so float-threshold
                # decisions (split distances, IoU labels) match numpy's
                # un-contracted arithmetic bit for bit
                # -march=native is safe: the .so is lazily compiled on the
                # host that runs it (gitignored, rebuilt on mtime change)
                cmd = ["g++", "-O3", "-march=native", "-ffp-contract=off",
                       "-shared", "-fPIC", "-o", so, src]
                r = subprocess.run(cmd, capture_output=True)
                if r.returncode != 0:  # old toolchains: retry portable
                    cmd.remove("-march=native")
                    subprocess.run(cmd, check=True, capture_output=True)
            lib = ctypes.CDLL(so)
            lib.angle_stats.restype = ctypes.c_long
            lib.angle_stats.argtypes = [
                ctypes.POINTER(ctypes.c_int64), ctypes.c_long,
                ctypes.POINTER(ctypes.c_double), ctypes.c_long,
                ctypes.c_double, ctypes.POINTER(ctypes.c_double),
            ]
            lib.rect_membership.restype = None
            lib.rect_membership.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.c_long, ctypes.POINTER(ctypes.c_int32), ctypes.c_long,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.enumerate_rect_sets.restype = ctypes.c_long
            lib.enumerate_rect_sets.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.c_long, ctypes.POINTER(ctypes.c_int32), ctypes.c_long,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_long,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_long,
            ]
            i64p = ctypes.POINTER(ctypes.c_int64)
            lib.build_rect_proposals.restype = ctypes.c_long
            lib.build_rect_proposals.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.c_long, ctypes.POINTER(ctypes.c_int32), ctypes.c_long,
                i64p, i64p, ctypes.c_long,
                i64p, i64p, ctypes.c_long,
                i64p, ctypes.c_long, i64p,
                i64p, ctypes.c_long, i64p,
                i64p, ctypes.c_long, i64p, ctypes.c_long,
            ]
            f64p = ctypes.POINTER(ctypes.c_double)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            lib.window_pipeline.restype = ctypes.c_long
            lib.window_pipeline.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.c_long, f64p,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_long,
                i64p, i64p, ctypes.c_long, f64p,
                i64p, i64p, ctypes.c_long, f64p, u8p,
                f64p, i64p, ctypes.c_long,
                ctypes.c_long, ctypes.c_double, ctypes.c_double,
                ctypes.c_double, ctypes.c_double,
                i64p, ctypes.c_long, i64p,
                i64p, ctypes.c_long, i64p, i64p,
                i64p, ctypes.c_long, i64p, i64p,
                f64p, ctypes.c_long, i64p,
                ctypes.c_int, f64p,
                f64p, f64p, u8p, i64p, f64p, i64p,
                i64p,
            ]
            lib.merge_cc.restype = ctypes.c_long
            lib.merge_cc.argtypes = [
                f64p, ctypes.c_long, i64p, ctypes.c_long, u8p,
                ctypes.c_double,
                i64p, ctypes.c_long, i64p, ctypes.c_long,
                f64p, f64p,
                i64p, ctypes.c_long, i64p, ctypes.c_long,
                i64p,
            ]
            lib.sweep_rects.restype = ctypes.c_long
            lib.sweep_rects.argtypes = [
                f64p, ctypes.c_long, f64p, ctypes.c_long,
                f64p, ctypes.c_long, f64p, ctypes.c_long,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_long,
            ]
            lib.split_lines.restype = ctypes.c_long
            lib.split_lines.argtypes = [
                f64p, ctypes.c_long, f64p, ctypes.c_long,
                ctypes.c_double, ctypes.c_double,
                f64p, ctypes.c_long,
            ]
            i64p = ctypes.POINTER(ctypes.c_int64)
            lib.compact_sort_align.restype = ctypes.c_long
            lib.compact_sort_align.argtypes = [
                i64p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_long, ctypes.c_long,
                i64p, ctypes.c_long, ctypes.c_long,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ]
            lib.compact_sort_align_stats.restype = ctypes.c_long
            lib.compact_sort_align_stats.argtypes = [
                i64p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_long, ctypes.c_long,
                i64p, ctypes.c_long, ctypes.c_long,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
                ctypes.c_long,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_uint8),
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def merge_cc_native(pos: np.ndarray, edges: np.ndarray,
                    is_control: np.ndarray, contain_th: float):
    """Full mergeCC in C++: returns the merge_connected_components dict, or
    None (library unavailable / capacity retry exhausted)."""
    lib = load_library()
    if lib is None:
        return None
    pos = np.ascontiguousarray(pos, dtype=np.float64)
    edges = np.ascontiguousarray(edges, dtype=np.int64).reshape(-1, 2)
    ctrl = np.ascontiguousarray(is_control, dtype=np.uint8)
    n = len(pos)

    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)

    cap_clique = max(n * 64, 1 << 14)
    cap_cross = max(n * 16, 1 << 14)
    for _ in range(3):
        out_clique = np.empty((cap_clique, 2), np.int64)
        out_cross = np.empty((cap_cross, 2), np.int64)
        clique_attr = np.empty((cap_clique, 6), np.float64)
        cross_attr = np.empty((cap_cross, 6), np.float64)
        cc_ids = np.empty(max(n, 1), np.int64)
        cc_off = np.empty(n + 2, np.int64)
        counts = np.zeros(3, np.int64)
        rc = lib.merge_cc(
            pos.ctypes.data_as(f64p), n,
            edges.ctypes.data_as(i64p), len(edges),
            ctrl.ctypes.data_as(u8p), float(contain_th),
            out_clique.ctypes.data_as(i64p), cap_clique,
            out_cross.ctypes.data_as(i64p), cap_cross,
            clique_attr.ctypes.data_as(f64p), cross_attr.ctypes.data_as(f64p),
            cc_ids.ctypes.data_as(i64p), len(cc_ids),
            cc_off.ctypes.data_as(i64p), n + 1,
            counts.ctypes.data_as(i64p),
        )
        if rc == 0:
            nq, nx, nc = (int(c) for c in counts)
            return {
                "shape_shape_edges": out_clique[:nq].copy(),
                "cross_shape_edges": out_cross[:nx].copy(),
                "shape_shape_attr": clique_attr[:nq].copy(),
                "cross_attr": cross_attr[:nx].copy(),
                "cc": [cc_ids[cc_off[i]:cc_off[i + 1]].tolist()
                       for i in range(nc)],
            }
        cap_clique *= 4
        cap_cross *= 4
    return None


def sweep_rects_native(x_values, y_values, x_grids, y_grids):
    """Walk-order rectangle enumeration in C++; [n, 4] int32 rects (possibly
    empty) or None when the library is unavailable."""
    lib = load_library()
    if lib is None:
        return None
    xv = np.ascontiguousarray(x_values, dtype=np.float64)
    yv = np.ascontiguousarray(y_values, dtype=np.float64)
    xg = np.ascontiguousarray(x_grids, dtype=np.float64)
    yg = np.ascontiguousarray(y_grids, dtype=np.float64)
    f64p = ctypes.POINTER(ctypes.c_double)
    # exact bound: <= ngx^2 * ngy^2 rects (starts/ends are grid-bounded)
    cap = max((len(xg) * len(yg)) ** 2, 64)
    out = np.empty((cap, 4), np.int32)
    n = lib.sweep_rects(
        xv.ctypes.data_as(f64p), len(xv), yv.ctypes.data_as(f64p), len(yv),
        xg.ctypes.data_as(f64p), len(xg), yg.ctypes.data_as(f64p), len(yg),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap,
    )
    if n < 0:
        return None
    return out[:n].copy()


def enumerate_rect_sets_native(xi: np.ndarray, yi: np.ndarray,
                               rects: np.ndarray):
    """Distinct rectangle point-sets as a list of int64 arrays, or None if
    the library is unavailable / capacity was exceeded."""
    lib = load_library()
    if lib is None or len(rects) == 0:
        return None
    xi = np.ascontiguousarray(xi, dtype=np.int32)
    yi = np.ascontiguousarray(yi, dtype=np.int32)
    rects = np.ascontiguousarray(rects, dtype=np.int32)
    max_sets = len(rects)
    # average set size is bounded by the point count; cap generously
    max_total = max(len(xi) * 64, len(rects) * 8)
    out_ids = np.empty(max_total, dtype=np.int64)
    out_offsets = np.empty(max_sets + 1, dtype=np.int64)
    n = lib.enumerate_rect_sets(
        xi.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        yi.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(xi),
        rects.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(rects),
        out_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), max_total,
        out_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), max_sets,
    )
    if n < 0:
        return None
    return [out_ids[out_offsets[i]:out_offsets[i + 1]].copy() for i in range(n)]


def build_rect_proposals_native(xi, yi, rects, edges_cl, supers_cl):
    """One-pass proposal cores: list of (point_ids, edge_rows, super_rows)
    per distinct window, or None (library unavailable / capacity retry
    exhausted)."""
    lib = load_library()
    if lib is None or len(rects) == 0:
        return None
    xi = np.ascontiguousarray(xi, dtype=np.int32)
    yi = np.ascontiguousarray(yi, dtype=np.int32)
    rects = np.ascontiguousarray(rects, dtype=np.int32)
    edges_cl = np.ascontiguousarray(edges_cl, dtype=np.int64).reshape(-1, 2)
    supers_cl = np.ascontiguousarray(supers_cl, dtype=np.int64).reshape(-1, 2)
    eu = np.ascontiguousarray(edges_cl[:, 0])
    ev = np.ascontiguousarray(edges_cl[:, 1])
    su = np.ascontiguousarray(supers_cl[:, 0])
    sv = np.ascontiguousarray(supers_cl[:, 1])

    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    max_sets = len(rects)

    cap_ids = max(len(xi) * 64, 1 << 16)
    cap_eids = max(len(eu) * 64, 1 << 16)
    cap_sids = max(len(su) * 64, 1 << 16)
    for _ in range(3):  # grow capacity on exhaustion
        out_ids = np.empty(cap_ids, np.int64)
        out_id_off = np.empty(max_sets + 1, np.int64)
        out_eids = np.empty(cap_eids, np.int64)
        out_eid_off = np.empty(max_sets + 1, np.int64)
        out_sids = np.empty(cap_sids, np.int64)
        out_sid_off = np.empty(max_sets + 1, np.int64)
        n = lib.build_rect_proposals(
            xi.ctypes.data_as(i32p), yi.ctypes.data_as(i32p), len(xi),
            rects.ctypes.data_as(i32p), len(rects),
            eu.ctypes.data_as(i64p), ev.ctypes.data_as(i64p), len(eu),
            su.ctypes.data_as(i64p), sv.ctypes.data_as(i64p), len(su),
            out_ids.ctypes.data_as(i64p), cap_ids, out_id_off.ctypes.data_as(i64p),
            out_eids.ctypes.data_as(i64p), cap_eids, out_eid_off.ctypes.data_as(i64p),
            out_sids.ctypes.data_as(i64p), cap_sids, out_sid_off.ctypes.data_as(i64p),
            max_sets,
        )
        if n >= 0:
            return [
                (
                    out_ids[out_id_off[i]:out_id_off[i + 1]].copy(),
                    out_eids[out_eid_off[i]:out_eid_off[i + 1]].copy(),
                    out_sids[out_sid_off[i]:out_sid_off[i + 1]].copy(),
                )
                for i in range(n)
            ]
        cap_ids *= 4
        cap_eids *= 4
        cap_sids *= 4
    return None


def window_pipeline_native(xi, yi, pos_cluster, rects, edges_cl, supers_cl,
                           attr_e, attr_s, issuper_cluster,
                           gt_boxes, gt_label_vals, bg_label,
                           iou_th, ios_th, angle_th, min_extent,
                           normalize_pos: bool = False,
                           initial_caps=None):
    """Full per-CC window pipeline (enumeration + dedup + filters + features
    + GT labelling + attribute-row gathers) in C++. Returns a dict of flat
    CSR arrays, or None (library unavailable / capacity retry exhausted):
      n_w, n_distinct, ids [T], id_off [n_w+1], eids [Te], eid_off, eloc
      [Te,2] (CC-LOCAL member-row endpoints), sids [Ts], sid_off, sloc
      [Ts,2], feats [n_w, 17] = box(4) + stat_feat(13), pos [T, 2]
      per-member positions (normalised to each window box when
      normalize_pos), issuper [T] bool, eattr [Te,6], sattr [Ts,6],
      labels [n_w], targets [n_w,4], hasobj [n_w].
    """
    lib = load_library()
    if lib is None or len(rects) == 0:
        return None
    xi = np.ascontiguousarray(xi, dtype=np.int32)
    yi = np.ascontiguousarray(yi, dtype=np.int32)
    pos = np.ascontiguousarray(pos_cluster, dtype=np.float64)
    rects = np.ascontiguousarray(rects, dtype=np.int32)
    edges_cl = np.ascontiguousarray(edges_cl, dtype=np.int64).reshape(-1, 2)
    supers_cl = np.ascontiguousarray(supers_cl, dtype=np.int64).reshape(-1, 2)
    eu = np.ascontiguousarray(edges_cl[:, 0])
    ev = np.ascontiguousarray(edges_cl[:, 1])
    su = np.ascontiguousarray(supers_cl[:, 0])
    sv = np.ascontiguousarray(supers_cl[:, 1])
    attr_e = np.ascontiguousarray(attr_e, dtype=np.float64).reshape(-1, 6)
    attr_s = np.ascontiguousarray(attr_s, dtype=np.float64).reshape(-1, 6)
    issuper = np.ascontiguousarray(issuper_cluster, dtype=np.uint8)
    gtb = np.ascontiguousarray(gt_boxes, dtype=np.float64).reshape(-1, 4)
    gt_lab = np.ascontiguousarray(gt_label_vals, dtype=np.int64)

    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    max_sets = len(rects)

    # totals scale with windows x members-per-window (n_rects bounds the
    # window count), NOT with the input sizes — a 101-point CC routinely
    # emits ~30k member rows and ~130k super rows. Over-allocation is
    # virtual-memory only (np.empty pages fault on write, and only the
    # filled prefix is written); an overflow costs one extra counting pass
    # (return -2 reports the exact totals for the single retry).
    if initial_caps is not None:  # test hook: force the counting retry
        cap_ids, cap_eids, cap_sids = initial_caps
    else:
        cap_ids = max(len(rects) * 64, len(xi) * 64, 1 << 16)
        cap_eids = max(len(rects) * 64, len(eu) * 64, 1 << 16)
        cap_sids = max(len(rects) * 128, len(su) * 64, 1 << 16)
    for _ in range(2):
        out_ids = np.empty(cap_ids, np.int64)
        out_id_off = np.empty(max_sets + 1, np.int64)
        out_eids = np.empty(cap_eids, np.int64)
        out_eid_off = np.empty(max_sets + 1, np.int64)
        out_eloc = np.empty((cap_eids, 2), np.int64)
        out_sids = np.empty(cap_sids, np.int64)
        out_sid_off = np.empty(max_sets + 1, np.int64)
        out_sloc = np.empty((cap_sids, 2), np.int64)
        out_feats = np.empty((max_sets, 17), np.float64)
        out_pos = np.empty((cap_ids, 2), np.float64)
        out_eattr = np.empty((cap_eids, 6), np.float64)
        out_sattr = np.empty((cap_sids, 6), np.float64)
        out_issuper = np.empty(cap_ids, np.uint8)
        out_labels = np.empty(max_sets, np.int64)
        out_targets = np.empty((max_sets, 4), np.float64)
        out_hasobj = np.empty(max_sets, np.int64)
        n_distinct = np.zeros(1, np.int64)
        req = np.zeros(3, np.int64)
        n = lib.window_pipeline(
            xi.ctypes.data_as(i32p), yi.ctypes.data_as(i32p), len(xi),
            pos.ctypes.data_as(f64p),
            rects.ctypes.data_as(i32p), len(rects),
            eu.ctypes.data_as(i64p), ev.ctypes.data_as(i64p), len(eu),
            attr_e.ctypes.data_as(f64p),
            su.ctypes.data_as(i64p), sv.ctypes.data_as(i64p), len(su),
            attr_s.ctypes.data_as(f64p), issuper.ctypes.data_as(u8p),
            gtb.ctypes.data_as(f64p), gt_lab.ctypes.data_as(i64p), len(gtb),
            int(bg_label), float(iou_th), float(ios_th),
            float(angle_th), float(min_extent),
            out_ids.ctypes.data_as(i64p), cap_ids,
            out_id_off.ctypes.data_as(i64p),
            out_eids.ctypes.data_as(i64p), cap_eids,
            out_eid_off.ctypes.data_as(i64p), out_eloc.ctypes.data_as(i64p),
            out_sids.ctypes.data_as(i64p), cap_sids,
            out_sid_off.ctypes.data_as(i64p), out_sloc.ctypes.data_as(i64p),
            out_feats.ctypes.data_as(f64p), max_sets,
            n_distinct.ctypes.data_as(i64p),
            ctypes.c_int(1 if normalize_pos else 0),
            out_pos.ctypes.data_as(f64p),
            out_eattr.ctypes.data_as(f64p), out_sattr.ctypes.data_as(f64p),
            out_issuper.ctypes.data_as(u8p),
            out_labels.ctypes.data_as(i64p),
            out_targets.ctypes.data_as(f64p),
            out_hasobj.ctypes.data_as(i64p),
            req.ctypes.data_as(i64p),
        )
        if n >= 0:
            t = int(out_id_off[n])
            te, ts = int(out_eid_off[n]), int(out_sid_off[n])
            # views, not copies: every consumer either re-offsets the rows
            # (add_cc_bulk's eloc/sloc + offset) or block-copies them into
            # the accumulator's finish() concatenation — trimming here was
            # a redundant third pass (~7 ms/image at bench scale). NOTE:
            # for single-CC files finish()'s single-part cat keeps these
            # views, so the cap-sized base buffers stay pinned as long as
            # the ProposalFile is held — acceptable because ProposalFiles
            # are transient (pickled to the dataset cache / converted to
            # CompactFiles, both of which materialise compact copies).
            return {
                "n_w": int(n),
                "n_distinct": int(n_distinct[0]),
                "ids": out_ids[:t],
                "id_off": out_id_off[: n + 1],
                "eids": out_eids[:te],
                "eid_off": out_eid_off[: n + 1],
                "eloc": out_eloc[:te],
                "sids": out_sids[:ts],
                "sid_off": out_sid_off[: n + 1],
                "sloc": out_sloc[:ts],
                "feats": out_feats[:n],
                "pos": out_pos[:t],
                "issuper": out_issuper[:t].astype(bool),
                "eattr": out_eattr[:te],
                "sattr": out_sattr[:ts],
                "labels": out_labels[:n],
                "targets": out_targets[:n],
                "hasobj": out_hasobj[:n],
            }
        if n != -2:  # -1 = degenerate grid: use the numpy fallback
            return None
        # capacity overflow: the counting pass reported the EXACT totals —
        # one re-run with right-sized buffers (no blind multiply-retry)
        cap_ids = max(int(req[0]), 1)
        cap_eids = max(int(req[1]), 1)
        cap_sids = max(int(req[2]), 1)
    return None


def split_lines_native(lines: np.ndarray, points: np.ndarray,
                       line_th: float, merge_th: float):
    """Native split_line (endpoint-split of lines at incident points);
    returns the [L', 4] line array or None (library unavailable /
    capacity retry exhausted)."""
    lib = load_library()
    if lib is None:
        return None
    lines = np.ascontiguousarray(lines, dtype=np.float64).reshape(-1, 4)
    points = np.ascontiguousarray(points, dtype=np.float64).reshape(-1, 2)
    f64p = ctypes.POINTER(ctypes.c_double)
    cap = max(len(lines) * 8 + len(points) * 2, 1 << 10)
    for _ in range(3):
        out = np.empty((cap, 4), np.float64)
        n = lib.split_lines(
            lines.ctypes.data_as(f64p), len(lines),
            points.ctypes.data_as(f64p), len(points),
            float(line_th), float(merge_th),
            out.ctypes.data_as(f64p), cap,
        )
        if n >= 0:
            return out[:n].copy()
        cap *= 4
    return None


def angle_stats_native(edges_local: np.ndarray, pos_local: np.ndarray,
                       th: float):
    """Returns the stats dict of proposals._angle_stats or None (no pairs /
    library unavailable -> caller falls back)."""
    lib = load_library()
    if lib is None:
        return None
    edges = np.ascontiguousarray(edges_local, dtype=np.int64)
    pos = np.ascontiguousarray(pos_local, dtype=np.float64)
    out = np.zeros(7, dtype=np.float64)
    n = lib.angle_stats(
        edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(edges),
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(pos),
        float(th), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if n == 0:
        return {"empty": True}
    return dict(
        n_90=int(out[0]), n_less90=int(out[1]), n_more90=int(out[2]),
        mean=out[3], max=out[4], min=out[5], std=out[6],
    )


def compact_sort_align_native(edge: np.ndarray, attr: np.ndarray,
                              old2new: np.ndarray, block: int):
    """CompactFile edge transform in C++ (csrc compact_sort_align): stable
    dst counting-sort + endpoint remap + run alignment to `block`.
    Returns (edge2 [S2,2] int32, attr2 [S2,4] float32, valid [S2] bool) or
    None (library unavailable). block=1 -> valid is all-True."""
    lib = load_library()
    if lib is None:
        return None
    edge = np.ascontiguousarray(edge, dtype=np.int64).reshape(-1, 2)
    # f32 by API: attrs are stored/emitted f32, and a single f64->f32
    # rounding here equals the kernel's old (float) cast of a double —
    # while halving the conversion copy on the per-file hot path
    attr = np.ascontiguousarray(attr, dtype=np.float32)
    if attr.ndim == 1:
        attr = attr.reshape(len(edge), -1)
    old2new = np.ascontiguousarray(old2new, dtype=np.int64)
    S = len(edge)
    adim = attr.shape[1] if S else 4

    i64p = ctypes.POINTER(ctypes.c_int64)
    e_p = edge.ctypes.data_as(i64p)
    a_p = attr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    o_p = old2new.ctypes.data_as(i64p)
    null_i32 = ctypes.POINTER(ctypes.c_int32)()
    null_f32 = ctypes.POINTER(ctypes.c_float)()
    null_u8 = ctypes.POINTER(ctypes.c_uint8)()
    s2 = lib.compact_sort_align(e_p, a_p, S, adim, o_p, len(old2new),
                                block, null_i32, null_f32, null_u8, 0)
    edge2 = np.empty((s2, 2), np.int32)
    attr2 = np.empty((s2, 4), np.float32)
    valid = np.empty(s2, np.uint8)
    got = lib.compact_sort_align(
        e_p, a_p, S, adim, o_p, len(old2new), block,
        edge2.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        attr2.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), s2)
    if got != s2:
        return None
    return edge2, attr2, valid.astype(bool)


def compact_sort_align_stats_native(edge: np.ndarray, attr: np.ndarray,
                                    old2new: np.ndarray, block: int,
                                    n_new: int):
    """compact_sort_align + the pack-time per-node segment populations over
    the REAL rows, emitted in the same native pass (csrc
    compact_sort_align_stats): in-degree, out-degree, incoming-attr mean
    (the factored clique level's sup_abar) and edge-endpoint membership
    (sup_member). Precomputing these per file is what lets pack_files be
    pure offset copies (data/packing.py).

    Returns (edge2 [S2,2] int32, attr2 [S2,4] f32, valid [S2] bool,
    dst_count [n_new] f32, src_count [n_new] f32, abar [n_new,4] f32,
    member [n_new] bool) or None (library unavailable)."""
    lib = load_library()
    if lib is None or not hasattr(lib, "compact_sort_align_stats"):
        return None
    edge = np.ascontiguousarray(edge, dtype=np.int64).reshape(-1, 2)
    attr = np.ascontiguousarray(attr, dtype=np.float32)
    if attr.ndim == 1:
        attr = attr.reshape(len(edge), -1)
    old2new = np.ascontiguousarray(old2new, dtype=np.int64)
    S = len(edge)
    adim = attr.shape[1] if S else 4

    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    e_p = edge.ctypes.data_as(i64p)
    a_p = attr.ctypes.data_as(f32p)
    o_p = old2new.ctypes.data_as(i64p)
    s2 = lib.compact_sort_align(e_p, a_p, S, adim, o_p, len(old2new), block,
                                ctypes.POINTER(ctypes.c_int32)(), f32p(),
                                ctypes.POINTER(ctypes.c_uint8)(), 0)
    edge2 = np.empty((s2, 2), np.int32)
    attr2 = np.empty((s2, 4), np.float32)
    valid = np.empty(s2, np.uint8)
    dst_count = np.empty(n_new, np.float32)
    src_count = np.empty(n_new, np.float32)
    abar = np.empty((n_new, 4), np.float32)
    member = np.empty(n_new, np.uint8)
    got = lib.compact_sort_align_stats(
        e_p, a_p, S, adim, o_p, len(old2new), block,
        edge2.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        attr2.ctypes.data_as(f32p),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), s2,
        n_new, dst_count.ctypes.data_as(f32p),
        src_count.ctypes.data_as(f32p), abar.ctypes.data_as(f32p),
        member.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if got != s2:
        return None
    return (edge2, attr2, valid.astype(bool), dst_count, src_count, abar,
            member.astype(bool))
