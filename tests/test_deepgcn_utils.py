"""DeepGCN auxiliary utils (reference utils/data_util.py parity)."""

import numpy as np
import pytest

from yolat_tpu.data import deepgcn_utils as du


class TestHelpers:
    def test_intersection_and_indexes(self):
        assert sorted(du.intersection([1, 2, 3], [2, 3, 4])) == [2, 3]
        # reference semantics: position of each sorted id in the original
        assert du.process_indexes([3, 1, 2]) == [1, 2, 0]

    def test_extract_node_feature_matches_loops(self):
        rng = np.random.default_rng(0)
        src = rng.integers(0, 5, 20)
        attr = rng.normal(size=(20, 3))
        for reduce in ("add", "mean", "max"):
            got = du.extract_node_feature(attr, src, 5, reduce)
            want = np.zeros((5, 3))
            for n in range(5):
                rows = attr[src == n]
                if len(rows):
                    want[n] = {"add": rows.sum(0), "mean": rows.mean(0),
                               "max": rows.max(0)}[reduce]
            np.testing.assert_allclose(got, want, rtol=1e-6)
        with pytest.raises(ValueError):
            du.extract_node_feature(attr, src, 5, "median")


class TestGraphPartition:
    def test_subgraphs_cover_and_relabel(self):
        import scipy.sparse as sp

        rng = np.random.default_rng(1)
        n = 40
        parts = du.random_partition_graph(n, cluster_number=4, rng=2)
        assert parts.shape == (n,) and parts.max() < 4
        row = rng.integers(0, n, 120)
        col = rng.integers(0, n, 120)
        adj = sp.csr_matrix((np.ones(120), (row, col)), shape=(n, n))
        sg_nodes, sg_edges = du.generate_sub_graphs(adj, parts, 4)
        assert sorted(np.concatenate(sg_nodes).tolist()) == list(range(n))
        for nodes, edges in zip(sg_nodes, sg_edges):
            assert edges.shape[0] == 2
            if edges.size:
                assert edges.max() < len(nodes)  # locally relabeled
                # every local edge is a real global edge
                ga, gb = nodes[edges[0]], nodes[edges[1]]
                for a, b in zip(ga, gb):
                    assert adj[a, b] != 0


class TestPointcloudAugs:
    def test_rotate_preserves_norms(self):
        pts = np.random.default_rng(3).normal(size=(50, 3)).astype(np.float32)
        out = du.random_rotate(pts, rng=4)
        np.testing.assert_allclose(
            np.linalg.norm(out[:, :2], axis=1),
            np.linalg.norm(pts[:, :2], axis=1), rtol=1e-5)
        np.testing.assert_allclose(out[:, 2], pts[:, 2])

    def test_translate_and_scale_shapes(self):
        pts = np.zeros((2, 10, 3), np.float32)
        out = du.random_translate(pts, std=0.02, rng=5)
        assert out.shape == pts.shape and np.abs(out).max() < 0.2
        out = du.scale_translate_pointcloud(pts, rng=6)
        assert out.shape == pts.shape


class TestOGBVocab:
    def test_dims_match_reference_vocab(self):
        # the public OGB data contract (utils/data_util.py:248-282)
        assert du.get_atom_feature_dims() == [119, 4, 12, 12, 10, 6, 6, 2, 2]
        assert du.get_bond_feature_dims() == [5, 6, 2]

    def test_atom_bond_roundtrip_ducktyped(self):
        class FakeAtom:
            def GetAtomicNum(self): return 6
            def GetChiralTag(self): return "CHI_UNSPECIFIED"
            def GetTotalDegree(self): return 4
            def GetFormalCharge(self): return 0
            def GetTotalNumHs(self): return 1
            def GetNumRadicalElectrons(self): return 0
            def GetHybridization(self): return "SP3"
            def GetIsAromatic(self): return False
            def IsInRing(self): return True

        class FakeBond:
            def GetBondType(self): return "DOUBLE"
            def GetStereo(self): return "STEREONONE"
            def GetIsConjugated(self): return True

        av = du.atom_to_feature_vector(FakeAtom())
        d = du.atom_feature_vector_to_dict(av)
        assert d["atomic_num"] == 6 and d["hybridization"] == "SP3"
        assert d["is_in_ring"] is True
        bv = du.bond_to_feature_vector(FakeBond())
        d = du.bond_feature_vector_to_dict(bv)
        assert d["bond_type"] == "DOUBLE" and d["is_conjugated"] is True
        # unknown values land on 'misc' (safe_index semantics)
        class WeirdAtom(FakeAtom):
            def GetAtomicNum(self): return 999
        assert du.atom_to_feature_vector(WeirdAtom())[0] == 118

    def test_sum_embedding_consumes_vocab_dims(self):
        """The Atom/BondEncoder pattern: nn/layers.SumEmbedding over the
        vocab dims (torch_nn.py:74-116)."""
        import jax
        import jax.numpy as jnp

        from yolat_tpu.nn.layers import SumEmbedding

        dims = du.get_atom_feature_dims()
        mod = SumEmbedding(dims, 16)
        x = jnp.zeros((7, len(dims)), jnp.int32)
        var = mod.init(jax.random.key(0), x)
        out = mod.apply(var, x)
        assert out.shape == (7, 16)


class TestPartNet:
    def test_reads_sem_seg_h5(self, tmp_path):
        h5py = pytest.importorskip("h5py")
        folder = tmp_path / "raw" / "sem_seg_h5" / "Bed-3"
        folder.mkdir(parents=True)
        rng = np.random.default_rng(7)
        for i in range(2):
            with h5py.File(folder / f"train-{i:02d}.h5", "w") as f:
                f["data"] = rng.normal(size=(3, 64, 3)).astype(np.float32)
                f["label_seg"] = rng.integers(0, 5, (3, 64))
        ds = du.PartNetDataset(str(tmp_path), obj_category="Bed", level=3,
                               phase="train")
        assert len(ds) == 6
        pts, seg = ds[0]
        assert pts.shape == (64, 3) and seg.shape == (64,)
        assert pts.dtype == np.float32 and seg.dtype == np.int32
        with pytest.raises(FileNotFoundError, match="application"):
            du.PartNetDataset(str(tmp_path), obj_category="Chair", level=3)
