"""Dense neighbour-table layout: construction correctness + sparse/dense
model equivalence with shared parameters."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolat_tpu.data.packing import add_dense_neighbors, finalize_batch
from yolat_tpu.data.toy import random_packed_batch
from yolat_tpu.nn.model import SparseCADGCN


class TestNeighborTable:
    def test_construction(self):
        batch, _ = random_packed_batch(seed=0, n_images=2)
        dense = add_dense_neighbors(batch)
        N = batch["pos"].shape[0]
        assert dense["nbr_idx"].shape[0] == N
        # every valid edge appears exactly once as (src in dst's row)
        edge = batch["edge"][batch["edge_mask"]]
        want = {}
        for s, d in edge:
            want.setdefault(int(d), []).append(int(s))
        got = {}
        for i in range(N):
            srcs = dense["nbr_idx"][i][dense["nbr_mask"][i]]
            if len(srcs):
                got[i] = sorted(srcs.tolist())
        assert got == {k: sorted(v) for k, v in want.items()}

    def test_attrs_follow_edges(self):
        batch, _ = random_packed_batch(seed=1, n_images=1)
        dense = add_dense_neighbors(batch)
        edge = batch["edge"][batch["edge_mask"]]
        attr = batch["e_attr"][batch["edge_mask"]]
        for (s, d), a in zip(edge, attr):
            row_srcs = dense["nbr_idx"][d][dense["nbr_mask"][d]]
            row_attrs = dense["nbr_attr"][d][dense["nbr_mask"][d]]
            hit = [
                np.allclose(row_attrs[j], a)
                for j in range(len(row_srcs))
                if row_srcs[j] == s
            ]
            assert any(hit)


class TestModelEquivalence:
    @pytest.mark.parametrize("train", [False, True])
    def test_sparse_dense_same_logits(self, train):
        batch_np, _ = random_packed_batch(seed=2, n_images=2)
        model = SparseCADGCN(n_classes=17)

        sparse = finalize_batch(jax.tree.map(jnp.asarray, batch_np))
        variables = model.init({"params": jax.random.key(0)}, sparse, train=True)

        dense_np = add_dense_neighbors(batch_np)
        dense = finalize_batch(jax.tree.map(jnp.asarray, dense_np))

        if train:
            (l1, _), _ = model.apply(variables, sparse, train=True,
                                     mutable=["batch_stats"],
                                     rngs={"dropout": jax.random.key(1)})
            (l2, _), _ = model.apply(variables, dense, train=True,
                                     mutable=["batch_stats"],
                                     rngs={"dropout": jax.random.key(1)})
        else:
            l1, _ = model.apply(variables, sparse, train=False)
            l2, _ = model.apply(variables, dense, train=False)

        m = batch_np["proposal_mask"]
        np.testing.assert_allclose(
            np.asarray(l1)[m], np.asarray(l2)[m], rtol=2e-4, atol=2e-5
        )

    @pytest.mark.parametrize(
        "conv", ["attr_edge", "multilayer_edge", "attr_edge_gp",
                 "attr_edge_cf", "edge", "mr"]
    )
    def test_registry_convs_sparse_dense_same_logits(self, conv):
        """Every dense-capable registry conv: same params, same logits in
        both layouts (eval mode — BN batch-stat populations match too, but
        eval isolates the layout math)."""
        batch_np, _ = random_packed_batch(seed=3, n_images=2)
        model = SparseCADGCN(n_classes=17, conv=conv)

        sparse = finalize_batch(jax.tree.map(jnp.asarray, batch_np))
        variables = model.init({"params": jax.random.key(0)}, sparse, train=True)

        dense_np = add_dense_neighbors(batch_np)
        dense = finalize_batch(jax.tree.map(jnp.asarray, dense_np))

        l1, _ = model.apply(variables, sparse, train=False)
        l2, _ = model.apply(variables, dense, train=False)
        m = batch_np["proposal_mask"]
        np.testing.assert_allclose(
            np.asarray(l1)[m], np.asarray(l2)[m], rtol=2e-4, atol=2e-5
        )


class TestPerFileDenseTable:
    def test_files_path_matches_batch_path(self, synthetic_root):
        """add_dense_neighbors(files=...) (per-file cached tables, offset
        copies) is bit-identical to the batch-level build."""
        from yolat_tpu.data.dataset import SESYDDataset
        from yolat_tpu.data.packing import CompactFile, PadSizes, pack_files

        ds = SESYDDataset(synthetic_root, "train", bbox_sampling_step=5)
        files, gts, whs = [], [], []
        for i in range(min(3, len(ds))):
            f, gt, wh = ds.load(i)
            files.append(CompactFile(f, n_classes=ds.n_classes))
            gts.append(gt)
            whs.append(wh)
        pad = PadSizes.for_files(files, [len(g[0]) for g in gts], 3)
        b = pack_files(files, gts, whs, pad)
        d_max = 8
        via_batch = add_dense_neighbors(b, d_max=d_max)
        via_files = add_dense_neighbors(b, d_max=d_max, files=files)
        for k in ("nbr_idx", "nbr_attr", "nbr_mask"):
            np.testing.assert_array_equal(via_batch[k], via_files[k],
                                          err_msg=k)
        # cached second call returns the same table
        again = add_dense_neighbors(b, d_max=d_max, files=files)
        np.testing.assert_array_equal(via_files["nbr_idx"], again["nbr_idx"])
