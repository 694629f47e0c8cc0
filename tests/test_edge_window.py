"""Edge-window message kernel (ops/edge_window.py): plan builder
invariants + interpreter-mode equivalence against the sparse XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolat_tpu.ops.edge_window import (EW_KEYS, edge_window_message_sum,
                                       edge_window_message_sum_reference,
                                       edge_window_plan, ew_of)


def _random_local_graph(seed, n=512, e=700, span=30, wn=128):
    """Sorted-dst edge list with bounded |src - dst| locality."""
    rng = np.random.default_rng(seed)
    dst = np.sort(rng.integers(0, n, e)).astype(np.int32)
    src = np.clip(dst + rng.integers(-span, span + 1, e), 0, n - 1)
    src = src.astype(np.int32)
    edge = np.stack([src, dst], axis=1)
    mask = rng.random(e) < 0.85
    attr = rng.normal(size=(e, 4)).astype(np.float32)
    return edge, mask, attr


def _folded_conv(seed, ci=16, h=16):
    rng = np.random.default_rng(seed)
    return {
        "w1": rng.normal(size=(2 * ci + 4, h)).astype(np.float32) * 0.3,
        "sc1": np.stack([rng.uniform(0.5, 1.5, h), rng.normal(size=h) * 0.1]
                        ).astype(np.float32),
        "w2": rng.normal(size=(h, h)).astype(np.float32) * 0.3,
        "sc2": np.stack([rng.uniform(0.5, 1.5, h), rng.normal(size=h) * 0.1]
                        ).astype(np.float32),
        "wr": rng.normal(size=(ci, h)).astype(np.float32) * 0.3,
        "br": rng.normal(size=(h,)).astype(np.float32) * 0.1,
    }


class TestPlanBuilder:
    def test_roundtrip_contents(self):
        edge, mask, attr = _random_local_graph(0)
        p = edge_window_plan(edge, mask, attr, 512, wn=128)
        assert p is not None
        from yolat_tpu.ops.edge_window import EW_BATCH_KEYS

        assert set(p) == set(EW_BATCH_KEYS)
        nw, eb = p["ew_src_rel"].shape
        assert nw == 4
        # every real edge appears exactly once with consistent indices
        assert p["ew_maskf"].sum() == mask.sum()
        for k in range(nw):
            m = p["ew_maskf"][k] > 0
            dl = p["ew_dst_loc"][k][m] + k * 128
            sr = p["ew_src_rel"][k][m] + (k - 1) * 128
            assert (dl // 128 == k).all()
            got = set(zip(sr.tolist(), dl.tolist()))
            want_rows = mask & (edge[:, 1] // 128 == k)
            want = set(map(tuple, edge[want_rows].tolist()))
            assert got == want

    def test_rejections(self):
        edge, mask, attr = _random_local_graph(1)
        # node count not a multiple of the window
        assert edge_window_plan(edge, mask, attr, 500, wn=128) is None
        # two windows is fine (clamped halo)
        assert edge_window_plan(edge, mask, attr, 512, wn=256) is not None
        # capacity violation
        assert edge_window_plan(edge, mask, attr, 512, wn=128, eb=8) is None
        # locality violation: one edge spanning the whole graph
        bad = edge.copy()
        r = np.nonzero(mask & (edge[:, 1] >= 384))[0][0]
        bad[r, 0] = 0
        assert edge_window_plan(bad, mask, attr, 512, wn=128) is None

    def test_ew_of_stale_shape(self):
        edge, mask, attr = _random_local_graph(2)
        p = edge_window_plan(edge, mask, attr, 512, wn=128)
        batch = {"pos": np.zeros((512, 2)), **p}
        assert ew_of(batch) is not None
        batch["pos"] = np.zeros((640, 2))  # re-padded after pack time
        assert ew_of(batch) is None


class TestKernelEquivalence:
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_matches_sparse_message(self, dtype):
        from yolat_tpu.eval.fast_forward import _sparse_message
        from yolat_tpu.ops.segment import segment_mean

        edge, mask, attr = _random_local_graph(3)
        n, ci, h = 512, 16, 16
        c = _folded_conv(4, ci, h)
        p = edge_window_plan(edge, mask, attr, n, wn=128)
        assert p is not None
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(n, ci)), dtype)
        ew = tuple(jnp.asarray(p[k]) for k in EW_KEYS)
        cj = {k: jnp.asarray(v).astype(dtype) if k in
              ("w1", "w2", "wr", "br") else jnp.asarray(v)
              for k, v in c.items()}

        agg = edge_window_message_sum(x, ew, cj["w1"], cj["sc1"],
                                      cj["w2"], cj["sc2"], interpret=True)
        cnt = np.bincount(edge[mask, 1], minlength=n).astype(np.float32)
        got = (agg / np.maximum(cnt, 1.0)[:, None]).astype(dtype) \
            + x @ cj["wr"] + cj["br"].reshape(1, -1)

        want = _sparse_message(x, jnp.asarray(edge), jnp.asarray(attr),
                               jnp.asarray(mask), cj)
        tol = 1e-5 if dtype == jnp.float32 else 5e-2
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=tol, atol=tol)

    def test_kernel_matches_jnp_reference(self):
        edge, mask, attr = _random_local_graph(6)
        n, ci, h = 512, 16, 16
        c = _folded_conv(7, ci, h)
        p = edge_window_plan(edge, mask, attr, n, wn=128)
        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.normal(size=(n, ci)), jnp.float32)
        ew = tuple(jnp.asarray(p[k]) for k in EW_KEYS)
        a = edge_window_message_sum(x, ew, c["w1"], c["sc1"], c["w2"],
                                    c["sc2"], interpret=True)
        b = edge_window_message_sum_reference(x, ew, c["w1"], c["sc1"],
                                              c["w2"], c["sc2"])
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


class TestFastForwardRoute:
    def test_logits_match_without_plan(self):
        """fast_forward with the injected window plan (edge_kernel=True,
        interpreter) must match the plan-free sparse route."""
        from yolat_tpu.data.packing import finalize_batch
        from yolat_tpu.data.toy import random_packed_batch
        from yolat_tpu.eval.fast_forward import fast_forward, fold_params
        from yolat_tpu.nn.model import SparseCADGCN

        batch_np, _ = random_packed_batch(seed=9, n_images=16)
        n = batch_np["pos"].shape[0]
        p = edge_window_plan(batch_np["edge"], batch_np["edge_mask"],
                             batch_np["e_attr"], n, wn=128)
        assert p is not None, "toy batch should window at wn=128"
        batch_np = {**batch_np, **p}
        # strip the dense table so the fallback is the sparse route
        batch_np = {k: v for k, v in batch_np.items()
                    if not k.startswith("nbr_")}
        jb = finalize_batch(jax.tree.map(jnp.asarray, batch_np))

        model = SparseCADGCN(n_classes=17, sorted_edges=True)
        var = model.init(jax.random.key(0), jb, train=False)
        folded = fold_params(var, n_blocks=2)

        la, ba = fast_forward(folded, jb, edge_kernel=True, interpret=True)
        lb, bb = fast_forward(folded, jb, edge_kernel=False)
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(ba), np.asarray(bb))
