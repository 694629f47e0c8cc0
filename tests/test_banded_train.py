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
