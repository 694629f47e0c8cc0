"""Custom-VJP banded gather/scatter primitives (ops/banded_train.py):
interpret-mode forward parity vs plain gather/segment-sum oracles, and
gradient parity via jax.grad on scalar losses through each primitive."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolat_tpu.ops.banded_message import banded_plan, bm_of
from yolat_tpu.ops.banded_train import (banded_gather,
                                        banded_gather_reference,
                                        banded_scatter_own,
                                        banded_scatter_reference)
from tests.test_banded import _clique_family


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    n, wn, pad, eblk = 2048, 512, 128, 256
    edge, mask, attr = _clique_family(rng, n, wn, pad_e=6144)
    plan = banded_plan(edge, mask, attr, n, sortby=1, wn=wn, pad=pad,
                       eblk=eblk)
    assert plan is not None
    bm = bm_of({**{k: jnp.asarray(v) for k, v in plan.items()},
                "pos": jnp.zeros((n, 2))}, "")
    x = jnp.asarray(rng.normal(size=(n, 64)), jnp.float32)
    return bm, x, n, edge, mask


def test_gather_forward(setup):
    bm, x, n, edge, mask = setup
    got_own, got_oth = banded_gather(x, bm, True)
    want_own, want_oth = banded_gather_reference(x, bm)
    np.testing.assert_allclose(np.asarray(got_own), np.asarray(want_own),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_oth), np.asarray(want_oth),
                               rtol=1e-6, atol=1e-6)


def test_scatter_own_forward(setup):
    bm, x, n, edge, mask = setup
    rows = jnp.asarray(
        np.random.default_rng(1).normal(size=(bm[3].size, 64)), jnp.float32)
    got = banded_scatter_own(rows, bm, n, True)
    want = banded_scatter_reference(rows, bm, n, target_oth=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gather_grad(setup):
    """grad through banded_gather == grad through the oracle (exercises
    BOTH scatter directions incl. the halo spill tiles)."""
    bm, x, n, edge, mask = setup
    w = jnp.asarray(
        np.random.default_rng(2).normal(size=(64, 8)) * 0.1, jnp.float32)

    def loss_kernel(x):
        o, t = banded_gather(x, bm, True)
        return jnp.sum(jnp.tanh(o @ w)) + jnp.sum(jnp.tanh((t - o) @ w))

    def loss_oracle(x):
        o, t = banded_gather_reference(x, bm)
        return jnp.sum(jnp.tanh(o @ w)) + jnp.sum(jnp.tanh((t - o) @ w))

    g_k = jax.grad(loss_kernel)(x)
    g_o = jax.grad(loss_oracle)(x)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_o),
                               rtol=2e-4, atol=2e-4)


def test_scatter_own_grad(setup):
    bm, x, n, edge, mask = setup
    rows = jnp.asarray(
        np.random.default_rng(3).normal(size=(bm[3].size, 64)), jnp.float32)

    def loss_kernel(r):
        return jnp.sum(jnp.tanh(banded_scatter_own(r, bm, n, True)))

    def loss_oracle(r):
        return jnp.sum(jnp.tanh(banded_scatter_reference(r, bm, n)))

    g_k = jax.grad(loss_kernel)(rows)
    g_o = jax.grad(loss_oracle)(rows)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_o),
                               rtol=2e-4, atol=2e-4)


def test_end_to_end_conv_grad(setup):
    """A full message+mean conv slice in plan layout: gather -> MLP ->
    scatter -> mean + skip; grads wrt x and W match the oracle chain."""
    bm, x, n, edge, mask = setup
    rng = np.random.default_rng(4)
    w1 = jnp.asarray(rng.normal(size=(128, 32)) * 0.1, jnp.float32)
    wr = jnp.asarray(rng.normal(size=(64, 32)) * 0.1, jnp.float32)
    cnt = np.zeros(n, np.float32)
    np.add.at(cnt, edge[mask][:, 1], 1.0)
    cntj = jnp.asarray(np.maximum(cnt, 1.0))

    def net(params, gather, scatter):
        w1, wr = params
        o, t = gather(x)
        h = jnp.maximum(jnp.concatenate([o, t - o], axis=1) @ w1, 0.0)
        s = scatter(h)
        return jnp.sum(jnp.tanh(s / cntj[:, None] + x @ wr))

    p = (w1, wr)
    g_k = jax.grad(net)(p, lambda x: banded_gather(x, bm, True),
                        lambda h: banded_scatter_own(h, bm, n, True))
    g_o = jax.grad(net)(p, lambda x: banded_gather_reference(x, bm),
                        lambda h: banded_scatter_reference(h, bm, n))
    for a, b in zip(g_k, g_o):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)


def test_yolat_pp_banded_super_route_matches_sparse():
    """YOLaTPlusPlus(banded_super=True) with a sew_ plan on the batch ==
    the sparse route (the cfg.pp_banded_super training route).

    The two routes differ only by f32 summation ORDER, and the toy-scale
    train-mode BatchNorms downstream amplify reorder noise chaotically
    (measured: a super-edge PERMUTATION under the sparse route alone
    moves logits by 100% of scale; the banded route moves them 0.9%). So
    parity is asserted where it is well-posed: eval-mode logits (running
    BN stats — bit-exact), the sown prim_at_node (the tensor the route
    replaces), super_edge_mlp's BN stat updates, and param grads through
    a loss read off prim_at_node (exercises the custom VJPs through the
    real module, before the amplifier)."""
    from yolat_tpu.data.packing import finalize_batch
    from yolat_tpu.data.toy import random_packed_batch
    from yolat_tpu.nn.yolat_pp import YOLaTPlusPlus

    batch_np, _ = random_packed_batch(seed=3, n_images=4)
    n = batch_np["pos"].shape[0]
    plan = banded_plan(batch_np["edge_super"], batch_np["super_mask"],
                       batch_np["e_attr_super"], n, sortby=1)
    assert plan is not None, "super family must band on the toy batch"
    jb = finalize_batch(jax.tree.map(
        jnp.asarray, {**batch_np, **{f"sew_{k}": v for k, v in plan.items()}}))
    assert jb.get("super_dst_count") is not None

    sparse = YOLaTPlusPlus(n_classes=17, sorted_edges=True)
    banded = YOLaTPlusPlus(n_classes=17, sorted_edges=True,
                           banded_super=True)
    var = sparse.init({"params": jax.random.key(0)}, jb, train=True)
    params = dict(var["params"])
    for i, g in enumerate(("gate_point", "gate_curve", "gate_prim",
                           "gate_super")):
        params[g] = jnp.asarray(0.3 + 0.1 * i, jnp.float32)
    var = {"params": params, "batch_stats": var["batch_stats"]}

    # eval-mode end-to-end: running BN stats, no amplifier
    le = sparse.apply(var, jb, train=False)[0]
    lb_e = banded.apply(var, jb, train=False)[0]
    np.testing.assert_allclose(np.asarray(lb_e), np.asarray(le),
                               rtol=1e-5, atol=1e-5)

    def run(model):
        (logits, _), upd = model.apply(
            var, jb, train=True, mutable=["batch_stats", "intermediates"])
        return (upd["intermediates"]["prim_at_node"][0],
                upd["batch_stats"]["super_edge_mlp"])

    pa, sa = run(sparse)
    pb, sb = run(banded)
    scale = float(jnp.abs(pa).max())
    np.testing.assert_allclose(np.asarray(pb), np.asarray(pa),
                               rtol=1e-4, atol=1e-4 * scale)
    for va, vb in zip(jax.tree.leaves(sa), jax.tree.leaves(sb)):
        np.testing.assert_allclose(np.asarray(vb), np.asarray(va),
                                   rtol=1e-4, atol=1e-4)

    # grads through the sown prim_at_node: upstream conv/MLP params get
    # cotangents through banded_gather/banded_scatter_own's custom VJPs
    def loss(model):
        def f(params):
            _, upd = model.apply(
                {"params": params, "batch_stats": var["batch_stats"]}, jb,
                train=True, mutable=["batch_stats", "intermediates"])
            p = upd["intermediates"]["prim_at_node"][0]
            return jnp.tanh(p / 10.0).sum()
        return f

    ga = jax.grad(loss(sparse))(var["params"])
    gb = jax.grad(loss(banded))(var["params"])
    flat_a = jax.tree.flatten_with_path(ga)[0]
    flat_b = jax.tree.flatten_with_path(gb)[0]
    gscale = max(float(jnp.abs(v).max()) for _, v in flat_a)
    assert gscale > 1e-3  # the loss must actually reach parameters
    for (ka, va), (kb, vb) in zip(flat_a, flat_b):
        assert ka == kb
        # atol floor rides the GLOBAL grad scale: deep-upstream leaves
        # carry ~1e-7 cancellation noise that differs by summation order
        np.testing.assert_allclose(
            np.asarray(vb), np.asarray(va), rtol=1e-3,
            atol=1e-4 * gscale, err_msg=str(ka))
