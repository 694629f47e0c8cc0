"""Native geometry kernel: build + parity with the Python oracle."""

import numpy as np
import pytest

from yolat_tpu.geom import _native
from yolat_tpu.geom.proposals import ANGLE_TH


def python_angle_stats(n_local, edges_local, pos_local, th):
    """The pure-Python oracle (same as proposals._angle_stats fallback)."""
    neighbors = [set() for _ in range(n_local)]
    for a, b in edges_local:
        neighbors[a].add(b)
        neighbors[b].add(a)
    dots = []
    n_less = n_90 = n_more = 0
    for anchor, ns in enumerate(neighbors):
        ns = list(ns)
        pa = pos_local[anchor]
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                v0 = pos_local[ns[i]] - pa
                v1 = pos_local[ns[j]] - pa
                dot = v0[0] * v1[0] + v0[1] * v1[1]
                if dot <= -th:
                    n_more += 1
                elif dot >= th:
                    n_less += 1
                elif abs(dot) < th:
                    n_90 += 1
                dots.append(dot)
    if not dots:
        return None
    d = np.asarray(dots)
    return dict(n_90=n_90, n_less90=n_less, n_more90=n_more,
                mean=d.mean(), max=d.max(), min=d.min(), std=d.std())


@pytest.fixture(scope="module")
def lib():
    lib = _native.load_library()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


class TestAngleStats:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_matches_python(self, lib, seed):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(4, 30))
        e = int(rng.integers(2, 60))
        pos = rng.uniform(0, 1, size=(n, 2))
        edges = rng.integers(0, n, size=(e, 2)).astype(np.int64)
        edges = edges[edges[:, 0] != edges[:, 1]]

        want = python_angle_stats(n, edges, pos, ANGLE_TH)
        got = _native.angle_stats_native(edges, pos, ANGLE_TH)
        if want is None:
            assert got.get("empty")
            return
        for k in ("n_90", "n_less90", "n_more90"):
            assert got[k] == want[k], k
        for k in ("mean", "max", "min", "std"):
            np.testing.assert_allclose(got[k], want[k], rtol=1e-10, atol=1e-12)

    def test_no_pairs(self, lib):
        pos = np.array([[0.0, 0.0], [1.0, 0.0]])
        edges = np.array([[0, 1]], dtype=np.int64)
        got = _native.angle_stats_native(edges, pos, ANGLE_TH)
        assert got.get("empty")

    def test_window_pipeline_matches_python_path(self, lib, synthetic_root,
                                                 monkeypatch):
        """Full-file parity: generate_proposals through the native window
        pipeline == the pure per-proposal Python loop (std features allowed
        one-pass-variance float noise)."""
        from yolat_tpu.data.dataset import SESYDDataset

        ds = SESYDDataset(synthetic_root, "train", bbox_sampling_step=5,
                          cache=False)
        pf_native, _, _ = ds.load(0)

        import yolat_tpu.geom._native as native_mod

        monkeypatch.setattr(native_mod, "window_pipeline_native",
                            lambda *a, **k: None)
        monkeypatch.setattr(native_mod, "build_rect_proposals_native",
                            lambda *a, **k: None)
        monkeypatch.setattr(native_mod, "enumerate_rect_sets_native",
                            lambda *a, **k: None)
        monkeypatch.setattr(native_mod, "angle_stats_native",
                            lambda *a, **k: None)
        pf_py, _, _ = ds.load(0)

        d1, d2 = pf_native.to_dict(), pf_py.to_dict()
        for k in d1:
            a, b = np.asarray(d1[k], np.float64), np.asarray(d2[k], np.float64)
            assert a.shape == b.shape, k
            np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-8, err_msg=k)

    def test_window_pipeline_capacity_retry_exact(self, lib, synthetic_root,
                                                  monkeypatch):
        """Undersized initial buffers trip the C++ counting mode (-2); the
        reported exact capacities must make the single retry succeed with
        output identical to a generously-capped run."""
        from yolat_tpu.data.dataset import SESYDDataset

        import yolat_tpu.geom._native as native_mod

        calls = []
        orig = native_mod.window_pipeline_native

        def spy(*a, **k):
            calls.append((a, k))
            return orig(*a, **k)

        monkeypatch.setattr(native_mod, "window_pipeline_native", spy)
        ds = SESYDDataset(synthetic_root, "train", bbox_sampling_step=5,
                          cache=False)
        ds.load(0)
        monkeypatch.undo()
        assert calls, "native pipeline was never invoked"

        a, k = calls[0]
        want = native_mod.window_pipeline_native(*a, **k)
        assert want is not None and want["n_w"] > 0
        # tiny caps: first attempt must overflow into counting mode, and
        # the exact-capacity retry must reproduce the full result
        got = native_mod.window_pipeline_native(
            *a, **k, initial_caps=(8, 8, 8))
        assert got is not None
        for key in want:
            np.testing.assert_array_equal(np.asarray(want[key]),
                                          np.asarray(got[key]), err_msg=key)

    def test_duplicate_edges_deduped(self, lib):
        # parallel edges must not create duplicate neighbour pairs (the
        # reference uses neighbour *sets*, graph_dict3.py:652-656)
        pos = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
        edges = np.array([[0, 1], [0, 1], [0, 2]], dtype=np.int64)
        got = _native.angle_stats_native(edges, pos, ANGLE_TH)
        want = python_angle_stats(3, edges, pos, ANGLE_TH)
        assert got["n_90"] + got["n_less90"] + got["n_more90"] == \
            want["n_90"] + want["n_less90"] + want["n_more90"] == 1


def _random_graph(rng, n_ccs=4, degenerate=False):
    """Random multi-CC graph dict with optional zero-extent CCs (exercises
    the degenerate containment conventions, build_graph_bbox.py:130-160)."""
    pos, edges, ctrl = [], [], []
    base = 0
    for c in range(n_ccs):
        k = int(rng.integers(3, 9))
        center = rng.uniform(0.1, 0.9, 2)
        scale = rng.uniform(0.02, 0.3)
        pts = center + scale * rng.uniform(-1, 1, (k, 2))
        if degenerate and c % 3 == 1:
            pts[:, 0] = pts[0, 0]  # zero-width CC
        if degenerate and c % 3 == 2:
            pts[:, 1] = pts[0, 1]  # zero-height CC
        pos.append(pts)
        # chain edges keep the CC connected; some controls sprinkled in
        for i in range(k - 1):
            edges.append([base + i, base + i + 1])
        is_c = np.zeros(k, dtype=np.float64)
        if k > 4:
            is_c[rng.integers(1, k - 1)] = 1.0
        ctrl.append(is_c)
        base += k
    return {
        "pos": np.concatenate(pos, axis=0),
        "edge": {"shape": np.asarray(edges, dtype=np.int64)},
        "attr": {"is_control": np.concatenate(ctrl).reshape(-1, 1)},
    }


class TestMergeCCNative:
    @pytest.mark.parametrize("seed", range(8))
    def test_matches_python(self, lib, seed):
        from yolat_tpu.geom import graph_build as gb

        rng = np.random.default_rng(seed)
        g = _random_graph(rng, n_ccs=3 + seed % 4, degenerate=seed % 2 == 1)
        want = gb._merge_connected_components_py(g)
        got = _native.merge_cc_native(
            g["pos"], g["edge"]["shape"],
            np.asarray(g["attr"]["is_control"]).reshape(-1) > 0.5,
            gb.CONTAIN_TH,
        )
        assert got is not None
        np.testing.assert_array_equal(got["shape_shape_edges"],
                                      want["shape_shape_edges"])
        np.testing.assert_array_equal(got["cross_shape_edges"],
                                      want["cross_shape_edges"])
        np.testing.assert_allclose(got["shape_shape_attr"],
                                   want["shape_shape_attr"], rtol=0, atol=0)
        np.testing.assert_allclose(got["cross_attr"], want["cross_attr"],
                                   rtol=0, atol=0)
        assert got["cc"] == want["cc"]

    def test_nested_boxes_merge(self, lib):
        # a CC fully inside another must produce cross edges + one merged CC
        from yolat_tpu.geom import graph_build as gb

        outer = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
        inner = np.array([[0.4, 0.4], [0.6, 0.4], [0.6, 0.6]])
        g = {
            "pos": np.concatenate([outer, inner]),
            "edge": {"shape": np.array(
                [[0, 1], [1, 2], [2, 3], [3, 0], [4, 5], [5, 6]],
                dtype=np.int64)},
            "attr": {"is_control": np.zeros((7, 1))},
        }
        want = gb._merge_connected_components_py(g)
        got = gb.merge_connected_components(g)
        assert len(got["cross_shape_edges"]) == 12  # 4 x 3 bipartite
        np.testing.assert_array_equal(got["cross_shape_edges"],
                                      want["cross_shape_edges"])
        assert got["cc"] == want["cc"] == [list(range(7))]


class TestSweepRectsNative:
    @pytest.mark.parametrize("seed", range(6))
    def test_matches_python_walk(self, lib, seed):
        from yolat_tpu.geom import proposals as pr

        rng = np.random.default_rng(100 + seed)
        n = int(rng.integers(4, 40))
        pts = rng.uniform(0, 1, (n, 2))
        if seed % 3 == 0:  # duplicated coordinate values stress the walks
            pts[:, 0] = np.round(pts[:, 0] * 7) / 7
            pts[:, 1] = np.round(pts[:, 1] * 5) / 5
        step = [1, 3, 10][seed % 3]

        x_values = np.unique(pts[:, 0])
        y_values = np.unique(pts[:, 1])
        if len(x_values) < 2 or len(y_values) < 2:
            pytest.skip("degenerate scene")
        xg = pr._grid_boundaries(x_values[0], x_values[-1], step)
        yg = pr._grid_boundaries(y_values[0], y_values[-1], step)

        got = _native.sweep_rects_native(x_values, y_values, xg, yg)
        assert got is not None

        x_starts = pr._walk_starts(x_values, xg)
        y_starts = pr._walk_starts(y_values, yg)
        x_ends = {(x0, gi): pr._walk_ends(x_values, xg, gi, x0)
                  for x0, gi in x_starts}
        y_ends = {(y0, gi): pr._walk_ends(y_values, yg, gi, y0)
                  for y0, gi in y_starts}
        want = [(x0, x1, y0, y1)
                for y0, giy in y_starts
                for x0, gix in x_starts
                for y1 in y_ends[(y0, giy)]
                for x1 in x_ends[(x0, gix)]]
        np.testing.assert_array_equal(
            got, np.asarray(want, dtype=np.int32).reshape(-1, 4))


class TestSplitLinesNative:
    """Native split_lines == the numpy split_line fallback on fuzzed
    scenes (epsilon-threshold decisions, greedy point merging, dominant-
    axis stable ordering)."""

    @pytest.mark.parametrize("seed", range(20))
    def test_matches_python(self, lib, seed, monkeypatch):
        import importlib

        sc = importlib.import_module("yolat_tpu.geom.split_cross")

        rng = np.random.default_rng(300 + seed)
        n_l = int(rng.integers(2, 30))
        # integer-ish endpoints (SESYD lines are pixel-valued) plus a few
        # exact duplicates and shared endpoints to stress the 1px boxes
        lines = rng.integers(0, 80, (n_l, 4)).astype(np.float64)
        if seed % 2:
            lines[:: 3, 2] = lines[:: 3, 0]  # vertical lines
        if seed % 3 == 0 and n_l > 2:
            lines[1] = lines[0]
        pts = lines.reshape(-1, 2)
        # near-collinear jitter points exercise the 3px distance band
        extra = pts[: max(1, len(pts) // 3)] + rng.normal(0, 2.0, 1)
        pts = np.concatenate([pts, extra], axis=0)

        got = _native.split_lines_native(pts_lines := lines, pts,
                                         sc.LINE_TH, sc.MERGE_TH)
        assert got is not None
        monkeypatch.setattr(_native, "split_lines_native",
                            lambda *a, **k: None)
        want = sc.split_line(pts, pts_lines)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


class TestCompactSortAlignNative:
    """csrc compact_sort_align vs the numpy CompactFile transform."""

    @pytest.fixture
    def lib(self):
        lib = _native.load_library()
        if lib is None:
            pytest.skip("native library unavailable")
        return lib

    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("block", [1, 8])
    def test_matches_numpy_oracle(self, lib, seed, block):
        from yolat_tpu.data.packing import _align_runs

        rng = np.random.default_rng(seed)
        n_old = 50
        S = 400
        edge = rng.integers(0, n_old, size=(S, 2)).astype(np.int64)
        attr = rng.normal(size=(S, 6))  # >4 cols: first 4 are taken
        # strictly increasing remap with gaps (the pool-aligned old2new)
        old2new = np.cumsum(rng.integers(1, 4, size=n_old)).astype(np.int64)

        got = _native.compact_sort_align_native(edge, attr, old2new, block)
        assert got is not None
        ge, ga, gv = got

        eo = np.argsort(edge[:, 1], kind="stable")
        we = old2new[edge[eo]].astype(np.int32)
        wa = attr[eo, 0:4].astype(np.float32)
        if block == 1:
            np.testing.assert_array_equal(ge, we)
            np.testing.assert_array_equal(ga, wa)
            assert gv.all()
        else:
            we2, wa2, wv = _align_runs(we, wa, block)
            np.testing.assert_array_equal(ge, we2)
            np.testing.assert_array_equal(ga, wa2)
            np.testing.assert_array_equal(gv, wv)

    def test_empty(self, lib):
        got = _native.compact_sort_align_native(
            np.zeros((0, 2), np.int64), np.zeros((0, 4)),
            np.arange(5, dtype=np.int64), 8)
        assert got is not None
        assert got[0].shape == (0, 2) and got[2].shape == (0,)

    @pytest.mark.parametrize("seed", [0, 3])
    @pytest.mark.parametrize("block", [1, 8])
    def test_stats_match_numpy_oracle(self, lib, seed, block):
        """The in-pass segment populations (dst/src counts, attr mean,
        membership) equal their bincount/reduceat formulations over the
        REAL rows."""
        rng = np.random.default_rng(seed)
        n_old = 40
        S = 300
        edge = rng.integers(0, n_old, size=(S, 2)).astype(np.int64)
        attr = rng.normal(size=(S, 4))
        old2new = np.cumsum(rng.integers(1, 3, size=n_old)).astype(np.int64)
        n_new = int(old2new[-1]) + 1

        got = _native.compact_sort_align_stats_native(
            edge, attr, old2new, block, n_new)
        assert got is not None
        ge, ga, gv, dstc, srcc, abar, member = got

        re_ = old2new[edge]
        want_dst = np.bincount(re_[:, 1], minlength=n_new).astype(np.float32)
        want_src = np.bincount(re_[:, 0], minlength=n_new).astype(np.float32)
        np.testing.assert_array_equal(dstc, want_dst)
        np.testing.assert_array_equal(srcc, want_src)
        want_member = np.zeros(n_new, bool)
        want_member[re_.ravel()] = True
        np.testing.assert_array_equal(member, want_member)
        want_abar = np.zeros((n_new, 4), np.float32)
        np.add.at(want_abar, re_[:, 1], attr.astype(np.float32))
        nz = want_dst > 0
        want_abar[nz] /= want_dst[nz, None]
        np.testing.assert_allclose(abar, want_abar, rtol=1e-5, atol=1e-6)
        # the sorted/aligned outputs are unchanged by the stats request
        base = _native.compact_sort_align_native(edge, attr, old2new, block)
        np.testing.assert_array_equal(ge, base[0])
        np.testing.assert_array_equal(ga, base[1])
        np.testing.assert_array_equal(gv, base[2])
