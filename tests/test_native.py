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

    def test_duplicate_edges_deduped(self, lib):
        # parallel edges must not create duplicate neighbour pairs (the
        # reference uses neighbour *sets*, graph_dict3.py:652-656)
        pos = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
        edges = np.array([[0, 1], [0, 1], [0, 2]], dtype=np.int64)
        got = _native.angle_stats_native(edges, pos, ANGLE_TH)
        want = python_angle_stats(3, edges, pos, ANGLE_TH)
        assert got["n_90"] + got["n_less90"] + got["n_more90"] == \
            want["n_90"] + want["n_less90"] + want["n_more90"] == 1
